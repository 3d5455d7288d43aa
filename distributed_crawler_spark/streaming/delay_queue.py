"""Per-host crawl-delay slot assignment as an ARBITRARY-STATEFUL
Structured Streaming operator — the engine's applyInPandasWithState
surface (SURVEY custom-stateful-operator box; until now every streaming
piece was foreachBatch or a windowed aggregate).

The reference throttles with one global sleep in the fetch loop
(config.py CRAWLER_DOWNLOAD_DELAY); the batch rebuild schedules whole
frontiers at once (politeness.crawl_delay_schedule — a prefix-sum over
canonical order).  A LIVE crawler admits URLs continuously, and the
next free fetch slot of a host is genuine UNBOUNDED KEYED STATE: it
must survive micro-batches and restarts, which is exactly what
GroupState gives and a windowed aggregate cannot.

Semantics (deterministic, replay-stable): per host, URLs are slotted in
(micro-batch sequence, url) order — within one micro-batch a host's
URLs sort by url; the host's state carries ``next_slot`` so batch N+1
continues where batch N stopped, including across a query restart from
the checkpoint.  Slot -> time is the caller's affine map (slot *
crawl_delay), kept OUT of the stateful operator so the state is one
long per host.

Exactly-once: the slot assignment is a pure function of (state, batch
contents), and state updates commit with the epoch in the checkpoint —
a replayed epoch recomputes the same slots from the same restored
state (pytest drives a restart to prove slots neither skip nor
repeat)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SLOT_OUTPUT_SCHEMA = "host STRING, url STRING, slot LONG"
_STATE_SCHEMA = "next_slot LONG"


def _assign_slots(key, pdf_iter, state: GroupState):
    import pandas as pd

    (host,) = key
    nxt = state.get[0] if state.exists else 0
    frames = [pdf for pdf in pdf_iter]
    if frames:
        batch = pd.concat(frames).sort_values("url").reset_index(drop=True)
        batch = pd.DataFrame(
            {
                "host": host,
                "url": batch["url"],
                "slot": range(nxt, nxt + len(batch)),
            }
        )
        nxt += len(batch)
        yield batch
    state.update((nxt,))


def delay_slots(stream: DataFrame) -> DataFrame:
    """(host, url) stream -> (host, url, slot) with per-host slots
    continuing across micro-batches and restarts.  Works on a batch
    DataFrame too (one 'batch', state discarded) — used by the parity
    test to pin the within-batch ordering contract."""
    return stream.groupBy("host").applyInPandasWithState(
        _assign_slots,
        outputStructType=SLOT_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_delay_scheduler(
    spark: SparkSession,
    in_glob: str,
    out_dir: str,
    checkpoint_dir: str,
    delay_ms: int = 1000,
    max_files_per_trigger: int = 1,
):
    """File-fed scheduler: each parquet file under ``in_glob`` is one
    admission wave (maxFilesPerTrigger=1 -> one micro-batch per file),
    output parquet rows (host, url, slot, fetch_offset_ms)."""
    stream = (
        spark.readStream.schema("host STRING, url STRING")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(in_glob)
    )
    slotted = delay_slots(stream).withColumn(
        "fetch_offset_ms", (F.col("slot") * F.lit(int(delay_ms))).cast("long")
    )
    return (
        slotted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
