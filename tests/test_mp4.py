"""MJPEG-in-MP4 codec (operators/mp4.py): round trip, box-walk
robustness, and the Spark decode/frame-sample/resize paths driving a
user-supplied MP4 payload end-to-end."""

from __future__ import annotations

import hashlib
import struct

from distributed_crawler_spark.operators import multimodal
from distributed_crawler_spark.operators.jpeg import make_jpeg
from distributed_crawler_spark.operators.mp4 import (
    _sample_ranges,
    decode_mp4,
    make_mp4,
)

FLAT = [(200, 30, 90), (10, 120, 250), (64, 64, 64)]


def _flat_fns():
    return [lambda x, y, c=c: c for c in FLAT]


def test_round_trip_flat_exact():
    b = make_mp4(24, 16, _flat_fns(), fps=5, quality=90)
    d = decode_mp4(b)
    assert d is not None
    assert (d["width"], d["height"], d["n_frames"], d["timescale"]) == (24, 16, 3, 5)
    for i, col in enumerate(FLAT):
        assert all(p == col for row in d["frames"][i] for p in row)


def test_samples_are_byte_identical_standalone_jpegs():
    # deterministic encoder + correct stsz/stco demux => each extracted
    # sample equals an independent make_jpeg of the same frame
    b = make_mp4(24, 16, _flat_fns(), quality=90)
    d = decode_mp4(b)
    for i, fn in enumerate(_flat_fns()):
        assert d["raw_samples"][i] == make_jpeg(24, 16, fn, quality=90)


def test_gradient_within_quant_error():
    def grad(x, y):
        return (x * 16, y * 16, (x + y) * 8)

    d = decode_mp4(make_mp4(16, 16, [grad], quality=90))
    assert d is not None
    err = max(
        abs(a - b)
        for yy in range(16)
        for xx in range(16)
        for a, b in zip(grad(xx, yy), d["frames"][0][yy][xx])
    )
    assert err <= 12


def test_rejections():
    b = make_mp4(8, 8, _flat_fns()[:1])
    assert decode_mp4(b[:40]) is None          # truncated mid-mdat
    assert decode_mp4(b"\x00" * 32) is None    # not ISO BMFF
    assert decode_mp4(b"") is None
    assert decode_mp4(b.replace(b"jpeg", b"avc1", 1)) is None  # non-MJPEG
    # corrupt a sample size so the stsd-dims check fails
    assert decode_mp4(b[: len(b) // 2] + b"\xff" * (len(b) - len(b) // 2)) is None
    # AVI/WAV bytes must not be claimed
    assert decode_mp4(multimodal.synth_avi(2)) is None


def test_multi_chunk_sample_ranges():
    # general stsc walk: 2 runs — chunks 1-2 carry 2 samples each,
    # chunk 3 carries 1
    runs = [(1, 2, 1), (3, 1, 1)]
    offsets = [100, 300, 700]
    sizes = [10, 20, 30, 40, 50]
    got = _sample_ranges(runs, offsets, sizes)
    assert got == [(100, 10), (110, 20), (300, 30), (330, 40), (700, 50)]
    # inconsistent tables refuse instead of mis-slicing
    assert _sample_ranges([(1, 2, 1)], [100], sizes) is None


def test_spark_decode_and_frame_sampling(spark):
    payload = make_mp4(24, 16, _flat_fns(), fps=5, quality=90)
    media = spark.createDataFrame(
        [(0, "video", bytearray(payload))],
        "media_id long, kind string, payload binary",
    )
    feat = multimodal.decode_features(media).collect()
    assert len(feat) == 1
    assert (feat[0]["width"], feat[0]["height"]) == (24, 16)

    frames = multimodal.sample_frames(media, every_k=2).collect()
    d = decode_mp4(payload)
    assert sorted(r["frame_idx"] for r in frames) == [0, 2]
    for r in frames:
        sample = d["raw_samples"][r["frame_idx"]]
        assert r["frame_bytes"] == len(sample)
        assert r["frame_md5"] == hashlib.md5(sample).hexdigest()


def test_spark_resize_reencodes_mp4(spark):
    payload = make_mp4(24, 16, _flat_fns(), fps=5, quality=90)
    media = spark.createDataFrame(
        [(0, "video", bytearray(payload))],
        "media_id long, kind string, payload binary",
    )
    out = multimodal.resize_media(media, target_w=12, target_h=8).collect()
    assert len(out) == 1
    d = decode_mp4(bytes(out[0]["payload"]))
    assert d is not None
    assert (d["width"], d["height"], d["n_frames"]) == (12, 8, 3)
    # flat frames survive the resize+re-encode pixel-exact
    for i, col in enumerate(FLAT):
        assert all(p == col for row in d["frames"][i] for p in row)
