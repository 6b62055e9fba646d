"""Command-line interface — reference surface parity (src/cli.ts commands:
serve / query / create / delete / list / wipe / clone / apikey / backup;
projects are durable-store directories under --data, API keys live in
api-keys.json — the reference's one-SQLite-file-per-project layout).

    python -m nicefox_graphdb_spark.cli query --sf-dir /data 'MATCH ...'
    python -m nicefox_graphdb_spark.cli serve --port 3000 --data ./projects
    python -m nicefox_graphdb_spark.cli create myproj --data ./projects
    python -m nicefox_graphdb_spark.cli apikey add myproj --data ./projects
    python -m nicefox_graphdb_spark.cli backup --dir ./backups --sf-dir /data
    python -m nicefox_graphdb_spark.cli backups --dir ./backups

The reference's `migrate` (SQLite schema upgrades, cli.ts:388+) has no
equivalent here: durable-store manifests are self-describing and versioned,
so there is no out-of-band schema to migrate.
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
    s.add_argument(
        "--data",
        help="project data directory: per-project durable stores + "
        "api-keys.json auth (reference cli.ts serve --data)",
    )

    # -- project admin (reference cli.ts create/delete/list/wipe/clone) ----
    c = sub.add_parser("create", help="create a project (+ API key)")
    c.add_argument("project")
    c.add_argument("--data", required=True)
    c.add_argument("--no-key", action="store_true")

    d = sub.add_parser("delete", help="delete a project and its API keys")
    d.add_argument("project")
    d.add_argument("--data", required=True)

    l2 = sub.add_parser("list", help="list projects in a data directory")
    l2.add_argument("--data", required=True)

    w = sub.add_parser("wipe", help="clear a project's data, keep the project")
    w.add_argument("project")
    w.add_argument("--data", required=True)

    cl = sub.add_parser("clone", help="copy a project's store to a new name")
    cl.add_argument("source")
    cl.add_argument("target")
    cl.add_argument("--data", required=True)

    ak = sub.add_parser("apikey", help="manage API keys")
    aksub = ak.add_subparsers(dest="akcmd", required=True)
    aka = aksub.add_parser("add", help="generate a key for a project")
    aka.add_argument("project")
    aka.add_argument("--data", required=True)
    aka.add_argument(
        "--all-projects", action="store_true",
        help="key reaches every project (no restriction)",
    )
    akl = aksub.add_parser("list", help="list keys (prefixes only)")
    akl.add_argument("--data", required=True)
    akr = aksub.add_parser("remove", help="remove keys by prefix")
    akr.add_argument("prefix")
    akr.add_argument("--data", required=True)

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
        keys: "set | dict | None" = set(args.api_key) or None
        if args.data:
            from nicefox_graphdb_spark import projects as pj

            file_keys = pj.load_api_keys(args.data)
            if file_keys:
                # per-project restrictions from api-keys.json; --api-key
                # flags become unrestricted keys
                keys = {**file_keys, **{k: {"project": None} for k in (keys or ())}}
        print(f"listening on http://{args.host}:{args.port}")
        serve(spark, args.host, args.port, keys, data_dir=args.data)
        return 0

    if args.cmd in ("create", "delete", "list", "wipe", "clone", "apikey"):
        from nicefox_graphdb_spark import projects as pj

        if args.cmd == "create":
            made = pj.create_project(args.data, args.project)
            if not made:
                print(f"Project '{args.project}' already exists.")
                return 1
            print(f"[created] {args.project}")
            if not args.no_key:
                print(f"API Key: {pj.add_api_key(args.data, args.project)}")
            return 0
        if args.cmd == "delete":
            if not pj.delete_project(args.data, args.project):
                print(f"Project '{args.project}' does not exist.", file=sys.stderr)
                return 1
            print(f"[deleted] {args.project}")
            return 0
        if args.cmd == "list":
            for info in pj.list_projects(args.data):
                print(f"{info.name}\t{info.size_bytes} B\t{info.n_files} files")
            return 0
        if args.cmd == "wipe":
            if not pj.wipe_project(args.data, args.project):
                print(f"Project '{args.project}' does not exist.", file=sys.stderr)
                return 1
            print(f"[wiped] {args.project}")
            return 0
        if args.cmd == "clone":
            pj.clone_project(args.data, args.source, args.target)
            print(f"[cloned] {args.source} -> {args.target}")
            return 0
        # apikey
        if args.akcmd == "add":
            key = pj.add_api_key(
                args.data, None if args.all_projects else args.project
            )
            print(f"API Key: {key}")
            return 0
        if args.akcmd == "list":
            for key, cfg in sorted(pj.load_api_keys(args.data).items()):
                scope = cfg.get("project") or "*"
                print(f"{key[:8]}...\t{scope}")
            return 0
        if args.akcmd == "remove":
            n = pj.remove_api_keys(args.data, args.prefix)
            print(f"removed {n} key(s)")
            return 0 if n else 1

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
