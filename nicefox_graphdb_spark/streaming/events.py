"""Structured Streaming over the `events` feed.

Net-new surface relative to the reference (which has no streaming at all,
SURVEY.md §2.9): event-time windowed aggregation with watermarks, session
windows, streaming dedup, and a custom stateful per-user operator via
`applyInPandasWithState`.

Design notes:
- Sources are directory streams (`readStream.parquet`), the shape a
  100 TB ingest actually uses (files landing from Kafka→object-store
  sinks); `Trigger.AvailableNow` gives deterministic batch-parity runs, so
  every streaming op here is testable against its batch equivalent.
- Watermarks bound state: windowed aggs and dedup both declare how late
  data may arrive; state older than the watermark is dropped — that is THE
  knob that keeps unbounded streams in bounded memory on a cluster.
"""

from __future__ import annotations

import shutil
import tempfile
import threading
import uuid
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def event_stream_from_dir(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based event stream with the canonical event schema."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(source_dir)


_STAGED: dict[tuple, str] = {}


def stage_events_as_stream_source(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4
) -> str:
    """Re-stage the driver's events parquet as N files in a temp dir, so a
    directory stream sees multiple micro-batches. Returns the dir path
    (memoized per (sf_dir, n_chunks) — staging is input prep, not part of
    the streaming work being measured)."""
    from nicefox_graphdb_spark.sources.tpch import read_tables

    key = (sf_dir, n_chunks)
    if key in _STAGED:
        return _STAGED[key]
    out_dir = tempfile.mkdtemp(prefix="nicefox_stream_")
    events = read_tables(spark, sf_dir)["events"]
    events.repartition(n_chunks).write.mode("overwrite").parquet(out_dir)
    _STAGED[key] = out_dir
    return out_dir


# -- streaming transformations --------------------------------------------
def hourly_rollup(
    stream: DataFrame, watermark: str = "2 hours", window: str = "1 hour"
) -> DataFrame:
    """Tumbling event-time window: count + value sum per (window, type)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("event_type"),
            F.col("cnt"),
            F.col("total_value"),
        )
    )


def sliding_rollup(
    stream: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Sliding event-time window (overlapping buckets)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("window.start").alias("window_start"), F.col("cnt"))
    )


def sessionize(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: a session closes after `gap` of silence."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            F.col("user_id"),
            F.col("n_events"),
            F.col("total"),
        )
    )


def stream_dedup(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once by event_id within the watermark horizon."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


USER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


def user_running_stats(stream: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running counters via
    applyInPandasWithState (the reference has no stateful operator concept;
    this is the Spark-native extension point for arbitrary per-key state).
    """

    def update(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        n, total, mx = (state.get if state.exists else (0, 0.0, float("-inf")))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "max_value": [mx],
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- execution helper ------------------------------------------------------
_MEM_VIEWS: list[str] = []
_MEM_VIEWS_LOCK = threading.Lock()
# how many recently-returned memory-sink views stay readable; callers that
# batch more streaming results than this before collecting should raise it
MEM_VIEW_KEEP = 8


def run_to_memory(
    result: DataFrame,
    output_mode: str = "complete",
    timeout: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow) into an
    in-memory table; returns the final table as a batch DataFrame.

    Resource bounds for repeated runs (a bench loop, a notebook): each
    call drops the in-memory tables of PREVIOUS calls (memory-sink views
    are never dropped by Spark itself) and deletes its checkpoint dir on
    termination — without this, every run leaks a temp view + a
    checkpoint directory and a long session grows without bound.

    ``state_partitions`` sizes the streaming STATE STORE partition count
    (captured from ``spark.sql.shuffle.partitions`` at query start, then
    pinned in the checkpoint forever): per-micro-batch fixed cost is
    proportional to it, so small rollups want far fewer than a batch
    shuffle would use, while a 100 TB ingest sizes it to executor count.
    """
    spark = result.sparkSession
    # older calls' results are consumed by now — free them (keep a small
    # tail, MEM_VIEW_KEEP, so recently-returned DataFrames stay readable by
    # callers that batch up several streaming results before collecting)
    with _MEM_VIEWS_LOCK:
        stale = _MEM_VIEWS[: max(0, len(_MEM_VIEWS) - MEM_VIEW_KEEP)]
        del _MEM_VIEWS[: len(stale)]
    for old in stale:
        spark.catalog.dropTempView(old)
    name = f"mem_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="nicefox_ckpt_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    q = None
    try:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(timeout)
        if not finished:
            # still running: stop it BEFORE the checkpoint dir is deleted
            # (an async micro-batch against a deleted checkpoint fails) and
            # refuse to return a partial in-memory table silently.
            q.stop()
            raise TimeoutError(
                f"streaming query {name!r} did not finish within {timeout}s"
            )
    except BaseException:
        if q is not None and q.isActive:
            q.stop()
        raise
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(ckpt, ignore_errors=True)
    with _MEM_VIEWS_LOCK:
        _MEM_VIEWS.append(name)
    return spark.table(name)


def cleanup_dir(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)
