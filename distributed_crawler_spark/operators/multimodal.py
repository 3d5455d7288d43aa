"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side structure is real and tested — schemas, Arrow batch shape,
``mapInPandas`` partition flow, partitioning — while the actual media
decode is stubbed (this container has no image/audio libraries): the
decoder is a clearly-marked deterministic fake keyed on the bytes, so the
pipeline is verifiable end-to-end and swapping in PIL/ffmpeg later only
replaces ``_fake_decode``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def synthesize_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build an opaque-binary media table from the documents table:
    payload = utf-8 bytes of the text (a deterministic stand-in for real
    image bytes), kind round-robins image/audio/video."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.col(text_col).cast("binary").alias("payload"),
    )


def _fake_decode(payload: bytes, media_id: int) -> dict:
    """STUB: deterministic fake decode. A real deployment replaces this
    with PIL.Image.open / soundfile / pyav frame sampling. Raises nothing;
    produces metadata + an 8-dim feature derived from the bytes."""
    n = len(payload)
    width = 32 * (1 + media_id % 16)
    height = 32 * (1 + (media_id // 16) % 16)
    feature = [float((payload[i % n] if n else 0) + i) for i in range(8)]
    return {"n_bytes": n, "width": width, "height": height, "feature": feature}


def decode_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas decode: binary payload → typed metadata + feature
    vector. Partition-streaming (never materializes the binary column on
    the driver); Arrow moves the bytes in batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                d = _fake_decode(bytes(payload) if payload is not None else b"", int(mid))
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "n_bytes": d["n_bytes"],
                        "width": d["width"],
                        "height": d["height"],
                        "feature": d["feature"],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def media_summary(features: DataFrame) -> DataFrame:
    """Typed-metadata aggregate over the decoded table (native)."""
    return (
        features.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("width"), 4).alias("avg_width"),
        )
        .orderBy("kind")
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_media(media: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """STUB-decode resize: real Spark plumbing (mapInPandas over binary
    payloads, typed output schema), deterministic fake transform (payload
    truncated/tiled to the target pixel budget). A real deployment swaps
    the body for PIL.Image.resize — the dataflow is unchanged."""

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                budget = target_w * target_h
                resized = (raw * (budget // max(len(raw), 1) + 1))[:budget]
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "width": target_w,
                        "height": target_h,
                        "payload": resized,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(media: DataFrame, frame_size: int = 32, every_k: int = 4) -> DataFrame:
    """STUB frame sampling for video payloads: the payload is treated as a
    concatenation of fixed-size frames; every k-th frame is emitted as a
    row (one-to-many mapInPandas — the UDTF shape a real pyav frame
    sampler would use)."""
    import hashlib

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "video" or payload is None:
                    continue
                raw = bytes(payload)
                n_frames = max(len(raw) // frame_size, 1)
                for i in range(0, n_frames, every_k):
                    chunk = raw[i * frame_size : (i + 1) * frame_size]
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": i,
                            "frame_bytes": len(chunk),
                            "frame_md5": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "frame_bytes", "frame_md5"],
            )

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)
