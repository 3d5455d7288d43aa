"""Pure-stdlib MP4 (ISO BMFF) muxer/demuxer carrying Motion-JPEG video
samples — the last video-container stub made real (round 6; the BMP →
PNG → WAV → AVI → JPEG progression, NEXT.md item 4). Mirrors the
reference's treatment of media payloads as opaque S3 blobs
(crawler_node.py stores fetched bytes; no media lib there either) while
making the Spark-side plumbing decode REAL bytes.

Writer layout: ``ftyp`` + ``mdat`` (concatenated baseline-JFIF samples
from operators/jpeg.py) + ``moov`` with a single video ``trak`` whose
``stbl`` indexes the samples (stsd 'jpeg' VisualSampleEntry, stts one
run, stsc one chunk, stsz per-sample sizes, stco one offset). ``mdat``
precedes ``moov`` so chunk offsets are fixed when the index is built —
the classic non-faststart layout.

Reader: a strict box walk (64-bit and to-end sizes handled, every size
bounds-checked) down ftyp → moov → trak(vide) → stbl, then sample byte
ranges reconstructed from the full stsc chunk-run table (not just the
single-chunk shape the writer emits) and decoded by decode_jpeg.
Returns None — never raises — on anything that isn't a well-formed
MJPEG MP4, so the decode dispatch can fall through."""

from __future__ import annotations

import struct

from .jpeg import decode_jpeg, make_jpeg

_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def _box(kind: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + kind + body


def _full(kind: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(kind, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


def make_mp4(
    width: int,
    height: int,
    frame_fns: list,
    fps: int = 10,
    quality: int = 90,
) -> bytes:
    """Encode a REAL MJPEG-in-MP4: each ``frame_fns[i](x, y) -> (b, g,
    r)`` becomes one baseline-JFIF sample (make_jpeg at ``quality``),
    indexed by a single-track moov. Deterministic: same frames → same
    bytes (the jpeg encoder is deterministic and every box field is
    fixed or derived)."""
    if not frame_fns:
        raise ValueError("MP4 needs at least one frame")
    samples = [make_jpeg(width, height, fn, quality=quality) for fn in frame_fns]
    n = len(samples)
    timescale = fps
    duration = n  # one timescale tick per frame

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom" + b"mp42")
    mdat = _box(b"mdat", b"".join(samples))
    first_sample_off = len(ftyp) + 8  # into mdat's payload

    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iHH8x", 0x00010000, 0x0100, 0)
        + _MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd",
        0,
        7,  # enabled | in-movie | in-preview
        struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I8xHHHH", duration, 0, 0, 0, 0)
        + _MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0)
    )
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00")
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(
        b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")
    )
    dinf = _box(b"dinf", dref)

    entry = (
        struct.pack(">I", 86)
        + b"jpeg"
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data reference index
        + struct.pack(">HH", 0, 0)
        + b"\x00" * 12
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame count per sample
        + struct.pack(">B", 4) + b"mjpg" + b"\x00" * 27  # compressor name
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, first_sample_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in [start, end);
    stops (without raising) at the first malformed header."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        kind = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 0:
            box_end = end
        elif size == 1:
            if pos + 16 > end:
                return
            (size64,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
            box_end = pos + size64
        else:
            box_end = pos + size
        if box_end < body or box_end > end:
            return
        yield kind, body, box_end
        if box_end <= pos:
            return
        pos = box_end


def _find(data: bytes, start: int, end: int, kind: bytes):
    for k, b, e in _boxes(data, start, end):
        if k == kind:
            return b, e
    return None


def _sample_ranges(stsc_runs, chunk_offsets, sizes):
    """Flatten the stsc chunk-run table + stco offsets + stsz sizes into
    absolute (offset, size) per sample — the general ISO 14496-12 walk,
    not just the writer's single-chunk shape."""
    n = len(sizes)
    out = []
    si = 0
    for run_idx, (first_chunk, per_chunk, _desc) in enumerate(stsc_runs):
        last_chunk = (
            stsc_runs[run_idx + 1][0] - 1
            if run_idx + 1 < len(stsc_runs)
            else len(chunk_offsets)
        )
        for chunk in range(first_chunk, last_chunk + 1):
            if chunk - 1 >= len(chunk_offsets):
                return None
            off = chunk_offsets[chunk - 1]
            for _ in range(per_chunk):
                if si >= n:
                    return out
                out.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    return out if si >= n else None


def decode_mp4(payload: bytes) -> dict | None:
    """Demux + decode an MJPEG MP4: {width, height, n_frames, frames
    (decoded (b,g,r) pixel grids), raw_samples (the exact JFIF bytes of
    each sample), timescale}. None for anything else."""
    if len(payload) < 16 or payload[4:8] != b"ftyp":
        return None
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        return None
    for kind, tb, te in _boxes(payload, *moov):
        if kind != b"trak":
            continue
        mdia = _find(payload, tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, *mdia, b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(payload, *mdia, b"mdhd")
        timescale = (
            struct.unpack_from(">I", payload, mdhd[0] + 12)[0] if mdhd else 0
        )
        minf = _find(payload, *mdia, b"minf")
        if minf is None:
            continue
        stbl = _find(payload, *minf, b"stbl")
        if stbl is None:
            continue
        stsd = _find(payload, *stbl, b"stsd")
        stsz = _find(payload, *stbl, b"stsz")
        stco = _find(payload, *stbl, b"stco")
        stsc = _find(payload, *stbl, b"stsc")
        if None in (stsd, stsz, stco, stsc):
            return None
        # stsd: entry 0 must be a 'jpeg' visual sample entry
        sb = stsd[0]
        if struct.unpack_from(">I", payload, sb + 4)[0] < 1:
            return None
        # entry: size(4) format(4) reserved(6) dref(2) pre(2) res(2)
        # pre(12) width(2) height(2) ...
        ent = sb + 8
        fmt = payload[ent + 4 : ent + 8]
        if fmt != b"jpeg":
            return None
        width, height = struct.unpack_from(">HH", payload, ent + 32)
        # stsz
        zb = stsz[0]
        fixed, count = struct.unpack_from(">II", payload, zb + 4)
        if zb + 12 + (0 if fixed else 4 * count) > stsz[1]:
            return None
        sizes = (
            [fixed] * count
            if fixed
            else list(struct.unpack_from(f">{count}I", payload, zb + 12))
        )
        # stco
        cb = stco[0]
        (n_chunks,) = struct.unpack_from(">I", payload, cb + 4)
        if cb + 8 + 4 * n_chunks > stco[1]:
            return None
        offsets = list(struct.unpack_from(f">{n_chunks}I", payload, cb + 8))
        # stsc
        xb = stsc[0]
        (n_runs,) = struct.unpack_from(">I", payload, xb + 4)
        if xb + 8 + 12 * n_runs > stsc[1]:
            return None
        runs = [
            struct.unpack_from(">III", payload, xb + 8 + 12 * i)
            for i in range(n_runs)
        ]
        ranges = _sample_ranges(runs, offsets, sizes)
        if ranges is None:
            return None
        raw, frames = [], []
        for off, size in ranges:
            if off + size > len(payload):
                return None
            sample = payload[off : off + size]
            d = decode_jpeg(sample)
            if d is None or d["width"] != width or d["height"] != height:
                return None
            raw.append(sample)
            frames.append(d["pixels"])
        return {
            "width": int(width),
            "height": int(height),
            "n_frames": len(frames),
            "frames": frames,
            "raw_samples": raw,
            "timescale": int(timescale),
        }
    return None
