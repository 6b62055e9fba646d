#!/usr/bin/env python
"""Dump .explain("formatted") for declared queries to plans/<tag>/<name>_<suffix>.txt.

Usage:
    python scripts/dump_plans.py r11 before [q_name ...]
    python scripts/dump_plans.py r11 after  [q_name ...]

Streaming gates (q_stream_*) and write gates (q_write_*) run side-effecting
pipelines whose result is a collected/in-memory frame; their "plan" is the
plan of the returned batch frame, still useful for the read side.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from nicefox_graphdb_spark import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            text = f"EXPLAIN FAILED: {e!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"{name}: {len(text)} bytes")


if __name__ == "__main__":
    main()
