"""Structured Streaming tests: every streaming op is checked for parity
against its batch equivalent using Trigger.AvailableNow."""

import pytest
from pyspark.sql import functions as F

from nicefox_graphdb_spark import streaming as st
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def stream_dir(spark):
    d = st.stage_events_as_stream_source(spark, SF_DIR, n_chunks=4)
    yield d
    st.cleanup_dir(d)


@pytest.fixture(scope="module")
def batch_events(spark, stream_dir):
    return spark.read.parquet(stream_dir)


def rows_set(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_hourly_rollup_batch_parity(spark, stream_dir, batch_events):
    stream = st.event_stream_from_dir(spark, stream_dir, max_files_per_trigger=1)
    result = st.run_to_memory(st.hourly_rollup(stream), output_mode="complete")
    expected = (
        batch_events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )
    cols = ["window_start", "event_type", "cnt", "total_value"]
    assert rows_set(result, cols) == rows_set(expected, cols)
    assert result.count() > 0


def test_sliding_rollup_overlap(spark, stream_dir, batch_events):
    stream = st.event_stream_from_dir(spark, stream_dir)
    result = st.run_to_memory(st.sliding_rollup(stream), output_mode="complete")
    tumbling = st.run_to_memory(
        st.hourly_rollup(st.event_stream_from_dir(spark, stream_dir)),
        output_mode="complete",
    )
    # sliding windows (1h every 30min) produce ~2x the distinct buckets
    assert result.count() > tumbling.select("window_start").distinct().count()


def test_sessionize_batch_parity(spark, stream_dir, batch_events):
    stream = st.event_stream_from_dir(spark, stream_dir)
    result = st.run_to_memory(
        st.sessionize(stream, gap="30 minutes"), output_mode="complete"
    )
    expected = (
        batch_events.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", "n_events")
    )
    assert (
        result.groupBy().sum("n_events").collect()[0][0]
        == batch_events.count()
    )
    assert rows_set(result, ["user_id", "n_events"]) == rows_set(
        expected, ["user_id", "n_events"]
    )


def test_stream_dedup(spark, stream_dir, batch_events, tmp_path):
    # duplicate every file's contents once
    dup_dir = str(tmp_path / "dup")
    batch_events.unionByName(batch_events).repartition(4).write.mode(
        "overwrite"
    ).parquet(dup_dir)
    stream = st.event_stream_from_dir(spark, dup_dir)
    deduped = st.run_to_memory(st.stream_dedup(stream), output_mode="append")
    assert deduped.select("event_id").distinct().count() == batch_events.count()
    assert deduped.count() == batch_events.count()


def test_user_running_stats_stateful(spark, stream_dir, batch_events):
    stream = st.event_stream_from_dir(spark, stream_dir, max_files_per_trigger=1)
    out = st.run_to_memory(st.user_running_stats(stream), output_mode="update")
    # final state per user = row with the max n_events
    final = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    expected = batch_events.groupBy("user_id").agg(F.count("*").alias("n_events"))
    assert rows_set(final, ["user_id", "n_events"]) == rows_set(
        expected, ["user_id", "n_events"]
    )
