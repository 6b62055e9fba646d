"""Corpus-preparation operators for large-scale training-data pipelines:
deterministic splits, context-window packing, benchmark decontamination.

Beyond-reference surface (the reference is a graph DB; see SURVEY.md §2.9
note on the LLM-pipeline family). Every operator here is deterministic and
SQL-expressible so the DuckDB oracle in __spark_entry__ can replicate it
bit-for-bit.

Scale notes (100 TB):
- `hash_split` is a pure Column expression over md5 — scan-speed, no
  shuffle, stable under re-runs and retractions (membership depends only on
  the id, never on row order or partition layout).
- `pack_chunks` needs a *global* prefix sum, which naive
  `Window.orderBy(...)` computes in ONE task. We instead do the classic
  two-phase distributed prefix sum: range-partition by the order key,
  partition-local cumulative sums in parallel, then a tiny per-partition
  offset table (P rows, broadcast) added back. Wall-clock scales with
  rows/partition, not total rows.
- `decontaminate` inverts both corpora to (shingle, id) postings and joins
  on the shingle — the benchmark side is tiny in practice (test sets are
  KBs, corpora are TBs) so Spark/AQE broadcasts it; no all-pairs work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# default 80/10/10 split over 256 md5 buckets
DEFAULT_SPLITS: list[tuple[str, int]] = [("train", 205), ("val", 230), ("test", 256)]


def hash_bucket(id_col: Column, buckets: int = 256) -> Column:
    """Deterministic [0, buckets) bucket from md5 of the id's string form.

    Uses the first 8 hex chars (32 bits) so any `buckets` ≤ 2^32 divides
    uniformly; md5-of-string is reproducible in every engine (the oracle
    recomputes it in DuckDB via hex-digit arithmetic).
    """
    hx = F.substring(F.md5(id_col.cast("string")), 1, 8)
    return (F.conv(hx, 16, 10).cast("long") % buckets).cast("int")


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: list[tuple[str, int]] | None = None,
    buckets: int = 256,
) -> DataFrame:
    """Add a `split` column assigning each row to a named split by hash
    bucket. `splits` is a list of (name, exclusive_upper_bucket) sorted
    ascending; the default is the 80/10/10 train/val/test convention.

    Deterministic by id: a document keeps its split across reshards,
    incremental appends, and engine versions — the property that matters
    when train/test leakage is a 100 TB-scale audit problem.
    """
    splits = splits or DEFAULT_SPLITS
    b = hash_bucket(F.col(id_col), buckets)
    expr = None
    for name, hi in splits:
        cond = b < hi
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


def pack_chunks(
    df: DataFrame,
    id_col: str,
    token_col: str,
    window: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each row a `chunk_id` packing the corpus (ordered by id) into
    contiguous context windows of ~`window` tokens:
    chunk_id = floor(exclusive_prefix_sum(tokens) / window).

    Unlike first-fit bin packing (a serial recurrence), prefix-sum chunking
    is exactly parallelizable and gives identical output regardless of
    partitioning — the property a distributed pipeline needs. Implemented as
    a two-phase prefix sum (see module docstring) instead of a single-task
    global window.
    """
    part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(part, F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_local_cum", F.sum(token_col).over(local_w))
    # P-row offset table: cumulative sum of the per-partition totals
    off_w = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        local.groupBy("_pid")
        .agg(F.max("_local_cum").alias("_ptotal"))
        .withColumn("_offset", F.sum("_ptotal").over(off_w) - F.col("_ptotal"))
        .select("_pid", "_offset")
    )
    out = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(
            "chunk_id",
            F.floor(
                (F.col("_local_cum") + F.col("_offset") - F.col(token_col))
                / F.lit(window)
            ).cast("long"),
        )
        .drop("_pid", "_local_cum", "_offset")
    )
    return out


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for the frame (driver-side plan stats —
    file-stat-derived for parquet scans, exact for checkpointed inputs).
    Unknown → None; callers must then take the conservative path."""
    try:
        n = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        return int(min(n, 2**63 - 1))
    except Exception:  # noqa: BLE001 — estimate only, never fail the op
        return None


def decontaminate(
    train_df: DataFrame,
    bench_df: DataFrame,
    id_col: str,
    shingles_col: Column,
    broadcast_threshold_bytes: int = 128 << 20,
) -> DataFrame:
    """Benchmark-decontamination scan: for every training document sharing
    at least one shingle with any benchmark document, return
    (id, hits = #distinct shared shingles, n_bench_docs = #distinct
    benchmark documents hit).

    Both sides explode to (shingle, id) postings; the join key is the
    shingle. The benchmark posting list is usually small (test sets), so
    the join broadcasts — but only when Catalyst's size estimate of the
    benchmark INPUT stays under ``broadcast_threshold_bytes`` (round-9,
    VERDICT r8 #4): a 10 GB contamination corpus must degrade to a shuffle
    join (AQE still upgrades it back to broadcast at runtime if the
    post-explode postings turn out small) instead of OOMing the driver
    with a forced broadcast. Unknown estimates take the no-hint path.
    """
    from nicefox_graphdb_spark.operators.common import spread_scan

    # spread: the train-side shingle explode is the heavy per-row work and
    # a single-file scan would run it on one task (no-op at corpus scale)
    train = spread_scan(train_df).select(
        F.col(id_col).alias("_tid"), F.explode(shingles_col).alias("_s")
    )
    bench = bench_df.select(
        F.col(id_col).alias("_bid"), F.explode(shingles_col).alias("_s")
    ).distinct()
    est = _plan_size_bytes(bench_df)
    if est is not None and est <= broadcast_threshold_bytes:
        bench = F.broadcast(bench)
    # Two DISTINCT aggregates over different columns would make Catalyst plan
    # an Expand (one replica of every joined posting row per distinct column)
    # ahead of the aggregation shuffle — doubling the full-volume postings
    # stream on what is already the widest point of the plan. collect_set
    # computes the same distinct counts with map-side partial sets
    # (ObjectHashAggregate): one shuffle on _tid, shuffle payload already
    # deduped per map partition, no Expand. Set sizes are bounded by a
    # document's own shingle count, so per-group state stays small at corpus
    # scale.
    return (
        train.join(bench, "_s")
        .groupBy(F.col("_tid").alias(id_col))
        .agg(
            F.size(F.collect_set("_s")).cast("long").alias("hits"),
            F.size(F.collect_set("_bid")).cast("long").alias("n_bench_docs"),
        )
    )
