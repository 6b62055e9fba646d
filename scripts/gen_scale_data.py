"""Generate a ~10x scale-up of the driver testdata for the scale-cliff
validation run (VERDICT r6 ask #6).

Reads /root/testdata/sf0.1 and writes <out>/(events|documents|embeddings)
.parquet at FACTOR copies, each copy living in a DISJOINT id/user/token
space so the workload grows linearly (no artificial cross-copy near-dups
or component merges — the run measures engine scaling, not output
explosion). The remaining TPC-H tables are symlinked unchanged.

Usage: python scripts/gen_scale_data.py [out_dir] [factor]
"""

import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.1")
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"
)
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10

LINKED = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW copies AS SELECT range AS i FROM range({FACTOR})")

    # events: disjoint event_id and user_id spaces per copy; timestamps kept
    # (the hourly rollup keeps its window count, each window 10x heavier)
    con.execute(
        f"""
        COPY (
          SELECT e.event_id + i * 10000000 AS event_id,
                 e.ts,
                 e.user_id + i * 10000000 AS user_id,
                 e.event_type, e.value, e.props
          FROM '{SRC}/events.parquet' e CROSS JOIN copies
          ORDER BY i, e.event_id
        ) TO '{OUT}/events.parquet' (FORMAT parquet)
        """
    )

    # documents: disjoint doc_id space; every token salted per copy so
    # cross-copy shingle overlap is ZERO (near-dup structure per copy
    # matches sf0.1 exactly, scaled linearly)
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + i * 10000000 AS doc_id,
                 CASE WHEN i = 0 THEN d.text
                      ELSE array_to_string(
                        list_transform(string_split(d.text, ' '),
                                       x -> x || 'x' || CAST(i AS VARCHAR)),
                        ' ')
                 END AS text,
                 d.lang, d.source, d.n_chars
          FROM '{SRC}/documents.parquet' d CROSS JOIN copies
          ORDER BY i, d.doc_id
        ) TO '{OUT}/documents.parquet' (FORMAT parquet)
        """
    )

    # embeddings: disjoint vec_id space; copy i applies a DETERMINISTIC
    # per-(copy, component) sign pattern — norms and per-cluster geometry
    # are preserved within a copy, while cross-copy cosines average ~0, so
    # the near-dup pair count scales LINEARLY with the corpus (a constant
    # shift would leave copies near-parallel and explode the output
    # quadratically in the copy count, measuring data artifacts instead of
    # engine scaling). Copy 0 is the original (vec_id 0 query preserved).
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src_tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_ids = src_tbl["vec_id"].to_numpy()
    labels = src_tbl["label"].to_numpy()
    mat = np.asarray(src_tbl["embedding"].to_pylist(), dtype=np.float32)
    dim = mat.shape[1]
    parts = []
    for i in range(FACTOR):
        if i == 0:
            m = mat
        else:
            # seeded random ORTHOGONAL rotation per copy: within-copy
            # pairwise cosines are exactly preserved, cross-copy cosines
            # concentrate near 0 (no artificial cross-copy near-dups)
            rng = np.random.RandomState(1000 + i)
            q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
            m = (mat @ q.astype(np.float32)).astype(np.float32)
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(vec_ids + i * 10000000, pa.int64()),
                    "embedding": pa.array(m.tolist(), pa.list_(pa.float32())),
                    "label": pa.array(labels, pa.int32()),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{OUT}/embeddings.parquet")

    for t in LINKED:
        dst = os.path.join(OUT, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)

    for t in ("events", "documents", "embeddings"):
        n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"wrote {OUT} at factor {FACTOR}")


if __name__ == "__main__":
    main()
