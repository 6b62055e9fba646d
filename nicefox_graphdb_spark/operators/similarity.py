"""Similarity search over embedding columns (ARRAY<FLOAT>).

Two tiers, as any 100 TB pipeline needs:
- **Brute-force cosine top-k** — exact; one scan, a zip_with/aggregate dot
  product per row (JVM codegen — no Python), then TakeOrderedAndProject.
  Right answer for a single query vector or a small probe set.
- **Random-hyperplane LSH ANN** — corpus-scale: r sign-bits bucket the
  vectors; candidate pairs/queries only meet within a bucket (optionally
  multi-probe across several independent tables). Turns the O(N·Q) scan into
  bucket-local work; the planes are seeded literals so results are
  deterministic and replayable.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order double-precision dot product (oracle-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Single-pass cosine: ONE fold accumulates (a·b, a·a, b·b) — the dot
    and both squared norms ride the same sequential left fold, so each sum
    is bit-identical to the dot()/norm() composition (DuckDB
    list_inner_product parity preserved) at a third of the higher-order-
    function evaluation cost. The division happens in the aggregate's
    finish lambda: one expression, one evaluation — extracting struct
    fields outside would inline a full copy of the fold per field."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.struct(
                x.cast("double").alias("x"), y.cast("double").alias("y")
            ),
        ),
        F.struct(
            F.lit(0.0).alias("xy"), F.lit(0.0).alias("xx"), F.lit(0.0).alias("yy")
        ),
        lambda s, v: F.struct(
            (s["xy"] + v["x"] * v["y"]).alias("xy"),
            (s["xx"] + v["x"] * v["x"]).alias("xx"),
            (s["yy"] + v["y"] * v["y"]).alias("yy"),
        ),
        lambda s: s["xy"] / (F.sqrt(s["xx"]) * F.sqrt(s["yy"])),
    )


def cosine_prenormed(a: Column, b: Column, b_norm: Column) -> Column:
    """Cosine when b's norm is already known (query vectors, IVF rows):
    one fold accumulates (a·b, a·a) in the same sequential order; the
    finish lambda captures the outer b_norm column."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.struct(
                x.cast("double").alias("x"), y.cast("double").alias("y")
            ),
        ),
        F.struct(F.lit(0.0).alias("xy"), F.lit(0.0).alias("xx")),
        lambda s, v: F.struct(
            (s["xy"] + v["x"] * v["y"]).alias("xy"),
            (s["xx"] + v["x"] * v["x"]).alias("xx"),
        ),
        lambda s: s["xy"] / (F.sqrt(s["xx"]) * b_norm),
    )


def topk_cosine(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: Column,
    k: int = 10,
    exclude_id=None,
) -> DataFrame:
    """Exact top-k by cosine against one query vector.

    Output: id, cosine (rounded 6dp) — ordered desc, ties by id.
    """
    out = df.select(
        F.col(id_col).alias("id"),
        # fused single-fold cosine (dot + both norms share the pass)
        F.round(cosine(F.col(vec_col), query_vec), 6).alias("cosine"),
    )
    if exclude_id is not None:
        out = out.where(F.col("id") != exclude_id)
    return out.orderBy(F.col("cosine").desc(), F.col("id").asc()).limit(k)


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (python-side literals)."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id (LONG) from dot products against seeded planes."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(vec_col, plane_col) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def _assign_clusters(base: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """id → nearest-centroid cluster via a broadcast cross-join against the
    k-row centroid table + min_by argmin. ONE distance lambda in the plan —
    inlining k centroid-literal expressions explodes codegen compile time
    (measured: minutes for k=16, d=64)."""
    spark = base.sparkSession
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cluster int, c array<double>"
    )
    d = F.aggregate(
        F.zip_with(
            F.col("v"), F.col("c"), lambda a, b: (a.cast("double") - b) ** 2
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        base.crossJoin(F.broadcast(cdf))
        .withColumn("dist", d)
        .groupBy("id")
        .agg(F.min_by("cluster", "dist").alias("cluster"))
    )


def _kmeans_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_clusters: int,
    n_iter: int = 5,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means over the embedding column.

    Init = rows with the smallest xxhash64(id) (seedless determinism);
    assignment = broadcast cross-join + min_by; update = per-dimension avg.
    Centroids (k·dim floats) live on the driver — the distributed work is
    one scan per iteration, which is how IVF training runs at corpus scale.
    """
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    seed_rows = (
        base.orderBy(F.xxhash64(F.col("id").cast("string")))
        .limit(n_clusters)
        .collect()
    )
    centroids = [[float(x) for x in r["v"]] for r in seed_rows]
    for _ in range(n_iter):
        assigned = base.join(
            _assign_clusters(base, centroids), on="id"
        )
        stats = assigned.groupBy("cluster").agg(
            *[
                F.avg(F.element_at(F.col("v"), i + 1)).alias(f"d{i}")
                for i in range(dim)
            ],
        )
        new = {
            r["cluster"]: [r[f"d{i}"] for i in range(dim)]
            for r in stats.collect()
        }
        centroids = [
            new.get(c, centroids[c]) for c in range(len(centroids))
        ]
    return centroids


class IvfIndex:
    """A built IVF index: trained centroids + the corpus with persisted
    cluster assignments (plus precomputed norms). Build ONCE per corpus
    (`build_ivf_index`), then serve any number of queries (`query`) — each
    query scans only its probed clusters, never re-trains or re-assigns
    (training per query was the round-1 anti-pattern)."""

    def __init__(
        self,
        centroids: list[list[float]],
        assigned: DataFrame,
        path: str | None = None,
    ):
        self.centroids = centroids
        self.assigned = assigned  # id, v, nrm, cluster (persisted or on disk)
        self.path = path  # non-None: assigned is a cluster-partitioned scan

    @classmethod
    def load(cls, spark, path: str) -> "IvfIndex":
        """Reopen a deployed index: centroids from the tiny json sidecar,
        corpus from the cluster-partitioned parquet — probe queries prune
        cluster= directories at the file listing, so a 4-probe query over a
        64-cluster corpus touches ~1/16 of the files on disk."""
        import json

        row = spark.read.text(f"{path}/centroids").collect()[0]
        centroids = json.loads(row["value"])
        assigned = spark.read.parquet(f"{path}/assigned")
        return cls(centroids, assigned, path=path)

    def query(
        self,
        query_vec: list[float],
        k: int = 10,
        n_probe: int = 4,
        exclude_id=None,
    ) -> DataFrame:
        import math

        qnorm = math.sqrt(sum(x * x for x in query_vec))

        def dist2(c):
            return sum((a - b) ** 2 for a, b in zip(query_vec, c))

        probe = sorted(
            range(len(self.centroids)), key=lambda i: dist2(self.centroids[i])
        )[:n_probe]
        cand = self.assigned.where(F.col("cluster").isin(probe))
        if exclude_id is not None:
            cand = cand.where(F.col("id") != exclude_id)
        q_col = F.array(*[F.lit(float(x)) for x in query_vec])
        out = cand.select(
            "id",
            F.round(
                dot(F.col("v"), q_col) / (F.col("nrm") * F.lit(qnorm)), 6
            ).alias("cosine"),
        )
        return out.orderBy(F.col("cosine").desc(), F.col("id")).limit(k)

    def unpersist(self) -> None:
        self.assigned.unpersist()


def build_ivf_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_clusters: int = 16,
    n_iter: int = 5,
    path: str | None = None,
) -> IvfIndex:
    """Train the coarse quantizer and persist cluster assignments + norms.
    Deterministic: same data → same centroids → same index.

    ``path=None`` keeps the assigned frame in executor memory (iterating /
    single session). With ``path`` the index is DEPLOYED: the assigned
    frame is written partitioned by ``cluster`` so every probe query prunes
    cluster= directories at the parquet file listing (no full-corpus scan,
    no cache warm-up), and ``IvfIndex.load`` reopens it in any session.
    """
    import json

    centroids = _kmeans_centroids(df, id_col, vec_col, dim, n_clusters, n_iter)
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    assigned = base.join(_assign_clusters(base, centroids), on="id").withColumn(
        "nrm", norm(F.col("v"))
    )
    if path is not None:
        spark = df.sparkSession
        (
            assigned.repartition("cluster")
            .write.mode("overwrite")
            .partitionBy("cluster")
            .parquet(f"{path}/assigned")
        )
        # centroids sidecar rides the same filesystem as the data (works on
        # object stores too — no driver-local fs assumption)
        spark.createDataFrame(
            [(json.dumps(centroids),)], "value string"
        ).coalesce(1).write.mode("overwrite").text(f"{path}/centroids")
        return IvfIndex.load(spark, path)
    return IvfIndex(centroids, assigned.persist(), path=None)


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    exclude_id=None,
    index: IvfIndex | None = None,
) -> DataFrame:
    """IVF approximate nearest neighbors: probe the n_probe clusters nearest
    the query, exact cosine inside them (~n_probe/n_clusters of the corpus
    scanned; recall grows with n_probe). Pass a prebuilt ``index`` to serve
    repeated queries; otherwise one is built ad hoc."""
    if index is None:
        index = build_ivf_index(df, id_col, vec_col, dim, n_clusters)
    return index.query(query_vec, k=k, n_probe=n_probe, exclude_id=exclude_id)


def ann_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 6,
    n_tables: int = 10,
    threshold: float = 0.9,
    seed: int = 42,
) -> DataFrame:
    """Multi-table LSH near-dup pairs: candidates share a bucket in ANY of
    the `n_tables` independent hash tables, then are verified by exact
    cosine (precision 1 by construction; recall ≈
    1 - (1 - p^n_planes)^n_tables with p = 1 - θ/π).

    The bits/tables dials trade candidate volume against recall: more bits →
    smaller buckets (cheaper join), more tables → higher recall. At corpus
    scale, n_planes should grow ~log2(N / target_bucket_size)."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    bucket_structs = []
    for t_idx in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed + 1000 * t_idx)
        bucket_structs.append(
            F.struct(
                F.lit(t_idx).alias("table"),
                lsh_bucket(F.col("v"), planes).alias("bucket"),
            )
        )
    # (id, table, bucket) only through the bucket join + pair dedup; the
    # vectors are re-attached per candidate (no tables-fold payload
    # amplification through the shuffle)
    bucketed = base.select(
        "id", F.explode(F.array(*bucket_structs)).alias("tb")
    ).select("id", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))
    a = bucketed.select(F.col("id").alias("id_a"), "table", "bucket")
    b = bucketed.select(F.col("id").alias("id_b"), "table", "bucket")
    cands = (
        a.join(b, on=["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    full_a = base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    full_b = base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    verified = cands.join(full_a, on="id_a").join(full_b, on="id_b")
    return (
        verified.withColumn("cosine", F.round(cosine(F.col("v_a"), F.col("v_b")), 6))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
