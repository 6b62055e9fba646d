"""Command-line interface — reference surface parity (src/cli.ts commands:
serve / query / list / backup; the SQLite-project admin verbs map onto
snapshot-directory operations here).

    python -m nicefox_graphdb_spark.cli query --sf-dir /data 'MATCH ...'
    python -m nicefox_graphdb_spark.cli serve --port 3000
    python -m nicefox_graphdb_spark.cli backup --dir ./backups --sf-dir /data
    python -m nicefox_graphdb_spark.cli backups --dir ./backups
"""

from __future__ import annotations

import argparse
import json
import sys


def _get_engine(sf_dir: str | None):
    from nicefox_graphdb_spark import CypherEngine, get_spark
    from nicefox_graphdb_spark.catalog import GraphCatalog

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if sf_dir:
        from nicefox_graphdb_spark.sources import load_tpch_graph

        return CypherEngine(spark, load_tpch_graph(spark, sf_dir))
    return CypherEngine(spark, GraphCatalog(spark), mutable=True)


def _format_table(rows: list[dict]) -> str:
    """Aligned text table (reference cli-helpers formatTableRow)."""
    if not rows:
        return "(no rows)"
    cols = list(rows[0].keys())
    cells = [[str(r.get(c)) for c in cols] for r in rows]
    widths = [
        max(len(c), *(len(row[i]) for row in cells)) for i, c in enumerate(cols)
    ]
    lines = [
        " | ".join(c.ljust(w) for c, w in zip(cols, widths)),
        "-+-".join("-" * w for w in widths),
    ]
    lines += [" | ".join(v.ljust(w) for v, w in zip(row, widths)) for row in cells]
    return "\n".join(lines)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="nicefox-graphdb-spark",
        description="PySpark-native graph analytics engine (Cypher surface)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query", help="run one Cypher query and print rows")
    q.add_argument("cypher")
    q.add_argument("--sf-dir", help="TPC-H-ish parquet dir to load as the graph")
    q.add_argument("--params", help="JSON object of query parameters")
    q.add_argument(
        "--json", action="store_true", help="print a QueryResponse JSON envelope"
    )
    q.add_argument(
        "--url", help="query a remote server instead of an in-process engine"
    )
    q.add_argument("--project", default="default", help="remote project name")
    q.add_argument("--api-key", help="remote Bearer API key")

    s = sub.add_parser("serve", help="start the HTTP server")
    s.add_argument("--port", type=int, default=3000)
    s.add_argument("--host", default="localhost")
    s.add_argument("--api-key", action="append", default=[])

    b = sub.add_parser("backup", help="write a versioned snapshot")
    b.add_argument("--dir", required=True)
    b.add_argument("--sf-dir", required=True)
    b.add_argument("--keep", type=int)

    ls = sub.add_parser("backups", help="list snapshots (newest first)")
    ls.add_argument("--dir", required=True)

    args = p.parse_args(argv)

    if args.cmd == "query":
        if args.url:
            # remote transport (reference src/remote.ts; no SparkSession
            # in the client process)
            from nicefox_graphdb_spark.remote import RemoteEngine

            eng = RemoteEngine(
                args.url, project=args.project, api_key=args.api_key
            )
        else:
            eng = _get_engine(args.sf_dir)
        params = json.loads(args.params) if args.params else None
        if args.json:
            print(json.dumps(eng.query_response(args.cypher, params), default=str))
            return 0
        resp = eng.query_response(args.cypher, params)
        if not resp["success"]:
            print(f"error: {resp['error']['message']}", file=sys.stderr)
            return 1
        print(_format_table(resp["data"]))
        print(f"({resp['meta']['count']} rows, {resp['meta']['time_ms']} ms)")
        return 0

    if args.cmd == "serve":
        from nicefox_graphdb_spark import get_spark
        from nicefox_graphdb_spark.server import serve

        spark = get_spark()
        spark.sparkContext.setLogLevel("ERROR")
        print(f"listening on http://{args.host}:{args.port}")
        serve(spark, args.host, args.port, set(args.api_key) or None)
        return 0

    if args.cmd == "backup":
        from nicefox_graphdb_spark import get_spark
        from nicefox_graphdb_spark.sources import load_tpch_graph, snapshot_graph

        spark = get_spark()
        spark.sparkContext.setLogLevel("ERROR")
        cat = load_tpch_graph(spark, args.sf_dir)
        res = snapshot_graph(cat, args.dir, keep=args.keep)
        print(json.dumps(res.__dict__))
        return 0 if res.success else 1

    if args.cmd == "backups":
        from nicefox_graphdb_spark.sources import list_snapshots

        for name in list_snapshots(args.dir):
            print(name)
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
