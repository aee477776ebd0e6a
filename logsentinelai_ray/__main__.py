"""Console entry point — the analog of the reference's console scripts
(reference pyproject.toml [project.scripts]; each analyzer exposes a
``main()`` that parses args and runs the generic pipeline, e.g.
analyzers/httpd_access.py:64-117).

Usage (a subcommand initializes Ray only when no session exists, and
shuts down only a session it created — embedding callers keep theirs):

  python -m logsentinelai_ray build  --corpus DIR --index DIR [--tag T]
                                     [--partitions N] [--salts S]
  python -m logsentinelai_ray update --corpus DIR --index DIR [--tag T]
  python -m logsentinelai_ray watch  --corpus DIR --index DIR
                                     [--interval S] [--max-batch-files N]
                                     [--max-rounds R] [--idle-rounds I]
  python -m logsentinelai_ray search --index DIR "query text" [-k K]
                                     [--filter lang=python] [--strategy s]
                                     [--query-string | --phrase]
  python -m logsentinelai_ray explain  --index DIR "query text" DOC_ID
  python -m logsentinelai_ray snapshot --index DIR --out DIR
  python -m logsentinelai_ray gen    --out DIR --docs N [--seed S]
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    """Returns (ray, owns_session): ``owns_session`` is True only when
    THIS call initialized Ray — a pre-existing session (pytest fixture,
    the driver, an embedding application) must never be shut down by a
    CLI subcommand (doing so kills the caller's live actors)."""
    import logging
    import os
    import warnings

    warnings.filterwarnings("ignore")
    import ray

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    if ray.is_initialized():
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        return ray, False
    # honor a cluster address when one is set (the `ray job submit`
    # path: RAY_ADDRESS=auto/host:port joins the running cluster);
    # default to a fresh local instance otherwise
    address = os.environ.get("RAY_ADDRESS", "local")
    kwargs = {"address": address, "logging_level": logging.ERROR}
    if address == "local":
        kwargs["include_dashboard"] = False
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
    ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray, True


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="logsentinelai_ray")
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", parents=[common],
                       help="build an index from a parquet corpus")
    b.add_argument("--corpus", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--tag", default="cli")
    b.add_argument("--partitions", type=int, default=32)
    b.add_argument("--salts", type=int, default=4)
    b.add_argument("--positions", action="store_true",
                   help="build the positional sidecar (phrase queries)")
    b.add_argument("--path-field", action="store_true",
                   help="index path as a scored field (multi-field)")

    u = sub.add_parser("update", parents=[common],
                       help="append new corpus files to an index (the "
                            "index-shape config derives from stats.json)")
    u.add_argument("--corpus", required=True)
    u.add_argument("--index", required=True)
    u.add_argument("--tag", default="cli-delta")

    w = sub.add_parser("watch", parents=[common],
                       help="poll a corpus dir and ingest new parquet "
                            "files (realtime-monitor analog)")
    w.add_argument("--corpus", required=True)
    w.add_argument("--index", required=True)
    w.add_argument("--interval", type=float, default=2.0)
    w.add_argument("--max-batch-files", type=int, default=None)
    w.add_argument("--max-rounds", type=int, default=None)
    w.add_argument("--idle-rounds", type=int, default=None,
                   help="stop after this many consecutive empty polls")

    s = sub.add_parser("search", parents=[common],
                       help="BM25 top-k query")
    s.add_argument("--index", required=True)
    s.add_argument("text")
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--filter", action="append", default=[],
                   metavar="FIELD=VALUE[,VALUE...]",
                   help="keyword filter; comma-separated values form an "
                        "ES terms query (match any)")
    s.add_argument("--strategy", choices=["taat", "wand"], default=None)
    s.add_argument("--phrase", action="store_true",
                   help="treat the text as an exact phrase (positional)")
    s.add_argument("--path-query", default="",
                   help="additional scored path-field query terms")
    s.add_argument("--path-boost", type=float, default=1.0)
    s.add_argument("--query-string", action="store_true",
                   help="parse the text as the ES query_string "
                        "mini-language (field:value, \"phrase\", "
                        "+must, -must_not)")
    s.add_argument("--kql", action="store_true",
                   help="parse the text as KQL (the Kibana search-bar "
                        "language: and/or/not, field:value, "
                        "field:(a or b), \"phrase\", wildcard*)")

    e = sub.add_parser("explain", parents=[common],
                       help="per-term BM25 contribution breakdown of "
                            "one doc for a query (_explain analog)")
    e.add_argument("--index", required=True)
    e.add_argument("text")
    e.add_argument("doc_id", type=int)

    sn = sub.add_parser("snapshot", parents=[common],
                        help="copy the index and verify the restored "
                             "segments against the manifest lineage")
    sn.add_argument("--index", required=True)
    sn.add_argument("--out", required=True)

    d = sub.add_parser("delete", parents=[common],
                       help="tombstone documents by doc id, or by match "
                            "query (ES _delete_by_query analog)")
    d.add_argument("--index", required=True)
    d.add_argument("--query", default=None,
                   help="tombstone every doc matching this query text")
    d.add_argument("doc_ids", nargs="*", type=int)

    c = sub.add_parser("compact", parents=[common],
                       help="force-merge: rebuild without tombstoned "
                            "docs (stats recomputed)")
    c.add_argument("--index", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--tag", default="cli-compact")

    r = sub.add_parser("rollover", parents=[common],
                       help="ingest a parquet corpus into a rollover "
                            "alias (generations seal at --max-docs; "
                            "ES _rollover analog)")
    r.add_argument("--corpus", required=True)
    r.add_argument("--alias-dir", required=True)
    r.add_argument("--alias", default="logs")
    r.add_argument("--max-docs", type=int, default=1_000_000)
    r.add_argument("--tag", default="cli-roll")
    r.add_argument("--partitions", type=int, default=32)
    r.add_argument("--salts", type=int, default=4)

    asr = sub.add_parser("alias-search", parents=[common],
                         help="federated BM25 top-k across a rollover "
                              "alias's generations (bit-identical to "
                              "one merged index)")
    asr.add_argument("--alias-dir", required=True)
    asr.add_argument("--alias", default="logs")
    asr.add_argument("text")
    asr.add_argument("-k", type=int, default=10)
    asr.add_argument("--strategy", choices=["taat", "wand"],
                     default=None)

    eq = sub.add_parser("esql", parents=[common],
                        help="run an ES|QL pipeline over a parquet "
                             "table dir (FROM t | WHERE ... | STATS "
                             "... BY ... | SORT | LIMIT ...)")
    eq.add_argument("query")
    eq.add_argument("--sf-dir", required=True,
                    help="directory holding <table>.parquet files")

    al = sub.add_parser("alias", parents=[common],
                        help="filtered index aliases (_aliases API): "
                             "put/list/delete/query")
    al.add_argument("action", choices=["put", "list", "delete",
                                       "query"])
    al.add_argument("--registry", required=True,
                    help="alias registry JSON path")
    al.add_argument("--name", default=None)
    al.add_argument("--member", action="append", default=[],
                    metavar="INDEX_DIR[:FIELD=VALUE[,VALUE...]]",
                    help="for put: index dir with an optional filter")
    al.add_argument("--text", default=None, help="for query")
    al.add_argument("-k", type=int, default=10)

    tf = sub.add_parser("transform", parents=[common],
                        help="continuous pivot transform (ES Transform "
                             "API analog): build the per-user rollup "
                             "from an events parquet, or run one "
                             "checkpointed continuation round")
    tf.add_argument("--events", required=True,
                    help="events parquet file/dir (ts, user_id, "
                         "event_type, value)")
    tf.add_argument("--dest", required=True)
    tf.add_argument("--continue", dest="cont", action="store_true",
                    help="run one continuation round from the dest "
                         "manifest's checkpoint instead of building")
    tf.add_argument("--partitions", type=int, default=16)

    an = sub.add_parser(
        "analyze", parents=[common],
        help="run a reference analyzer type over raw log files "
             "(the logsentinelai-httpd-access / httpd-server / "
             "linux-system / general-log console-script analog)")
    an.add_argument("--type", required=True,
                    choices=["httpd_access", "httpd_server",
                             "linux_system", "general_log",
                             "categorize"])
    an.add_argument("--top", type=int, default=20,
                    help="categorize: number of top templates")
    an.add_argument("files", nargs="+")

    g = sub.add_parser("gen", parents=[common],
                       help="write a deterministic synthetic corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--docs", type=int, default=5000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--files", type=int, default=8)

    args = ap.parse_args(argv)

    if args.cmd == "gen":
        from .config import CorpusConfig
        from .corpus import write_corpus

        write_corpus(args.out, CorpusConfig(n_docs=args.docs,
                                            seed=args.seed),
                     num_files=args.files)
        print(json.dumps({"written": args.out, "docs": args.docs}))
        return 0

    ray, owns_session = _ray_session(args.num_cpus)
    try:
        if args.cmd == "analyze":
            if args.type == "categorize":
                from .analyze import categorize_files

                print(json.dumps(categorize_files(args.files,
                                                  top=args.top)))
            else:
                from .analyze import analyze_files

                print(json.dumps(analyze_files(args.type, args.files)))
        elif args.cmd == "build":
            from .config import IndexConfig
            from .index.build import build_index

            cfg = IndexConfig(num_partitions=args.partitions,
                              salt_buckets=args.salts,
                              store_positions=args.positions,
                              index_path_field=args.path_field)
            meta = build_index(args.corpus, args.index, cfg,
                               corpus_tag=args.tag)
            print(json.dumps({"n_docs": meta["n_docs"],
                              "timings": meta["timings"],
                              "total_s": meta["total_s"]}))
        elif args.cmd == "update":
            from .index.update import update_index

            # cfg=None derives num_partitions/salts/etc from the index's
            # own stats.json — a CLI default can't mis-route postings
            res = update_index(args.corpus, args.index, None,
                               delta_tag=args.tag)
            print(json.dumps(res))
        elif args.cmd == "watch":
            from .index.watch import CorpusWatcher

            watcher = CorpusWatcher(args.corpus, args.index, None,
                                    max_batch_files=args.max_batch_files)
            results = watcher.run(poll_interval=args.interval,
                                  max_rounds=args.max_rounds,
                                  idle_rounds=args.idle_rounds)
            print(json.dumps({"rounds_ingested": len(results),
                              "results": results}))
        elif args.cmd == "search":
            from .query.shards import SearchEngine

            filters = {}
            for fv in args.filter:
                field, value = fv.split("=", 1)
                vals = value.split(",")
                filters[field] = vals if len(vals) > 1 else vals[0]
            filters = filters or None
            eng = SearchEngine(args.index)
            if args.kql:
                res = eng.kql_search(args.text, k=args.k,
                                     with_meta=True)
            elif args.query_string:
                res = eng.query_string(args.text, k=args.k)
            elif args.phrase:
                res = eng.phrase_topk(args.text, k=args.k,
                                      with_meta=True)
            elif args.path_query:
                res = eng.search_fields(args.text, args.path_query,
                                        path_boost=args.path_boost,
                                        k=args.k, with_meta=True)
            else:
                res = eng.search(args.text, k=args.k, filters=filters,
                                 strategy=args.strategy)
            for row in res.to_pylist():
                print(json.dumps(row))
            eng.shutdown()
        elif args.cmd == "explain":
            from .query.shards import SearchEngine

            eng = SearchEngine(args.index)
            exp = eng.explain(args.text, args.doc_id)
            for row in exp.to_pylist():
                print(json.dumps(row))
            eng.shutdown()
        elif args.cmd == "snapshot":
            from .index.snapshot import snapshot_index

            report = snapshot_index(args.index, args.out)
            print(json.dumps(report))
        elif args.cmd == "delete":
            if args.query is not None:
                from .query.shards import SearchEngine

                eng = SearchEngine(args.index)
                try:
                    n = eng.delete_by_query(args.query)
                finally:
                    eng.shutdown()
                print(json.dumps({"deleted": n}))
            else:
                if not args.doc_ids:
                    raise SystemExit("delete: need doc_ids or --query")
                from .index.delete import delete_docs

                n = delete_docs(args.index, args.doc_ids)
                print(json.dumps({"tombstones": n}))
        elif args.cmd == "transform":
            import ray.data as rd

            from .stages.transform import (build_transform,
                                           continue_transform,
                                           read_transform)

            cols = ["ts", "user_id", "event_type", "value"]
            if args.cont:
                import pyarrow as pa
                import pyarrow.compute as pc

                def read_delta(ckpt_us: int):
                    ts_scalar = pa.scalar(ckpt_us) \
                        .cast(pa.timestamp("us"))
                    return rd.read_parquet(
                        args.events, columns=cols,
                        filter=(pc.field("ts") > ts_scalar))

                man = continue_transform(read_delta, args.dest)
            else:
                man = build_transform(
                    rd.read_parquet(args.events, columns=cols),
                    args.dest, num_partitions=args.partitions)
            print(json.dumps({"gen": man["gen"],
                              "max_ts_us": man["max_ts_us"],
                              "partitions": len(man["parts"]),
                              "rows": read_transform(args.dest)
                              .num_rows}))
        elif args.cmd == "rollover":
            from .config import IndexConfig
            from .index.rollover import RolloverIndex

            roll = RolloverIndex(
                args.alias_dir,
                IndexConfig(num_partitions=args.partitions,
                            salt_buckets=args.salts),
                max_docs=args.max_docs, alias=args.alias)
            entry = roll.ingest(args.corpus, tag=args.tag)
            print(json.dumps({"generation": entry,
                              "generations": len(
                                  roll.meta["generations"])}))
        elif args.cmd == "alias-search":
            from .index.rollover import RolloverIndex

            roll = RolloverIndex(args.alias_dir, alias=args.alias)
            res = roll.search(args.text, k=args.k,
                              strategy=args.strategy)
            for row in res.to_pylist():
                print(json.dumps(row))
            roll.shutdown()
        elif args.cmd == "esql":
            from .query.esql import execute_esql

            out = execute_esql(args.query, args.sf_dir)
            for row in out.to_pylist():
                print(json.dumps(row, default=str))
        elif args.cmd == "alias":
            from .index import aliases as alia

            if args.action == "list":
                print(json.dumps(alia.list_aliases(args.registry)))
            elif args.action == "delete":
                alia.delete_alias(args.registry, args.name)
                print(json.dumps({"deleted": args.name}))
            elif args.action == "put":
                members = []
                for spec in args.member:
                    idx, _, fspec = spec.partition(":")
                    flt = None
                    if fspec:
                        field, value = fspec.split("=", 1)
                        vals = value.split(",")
                        flt = {field: vals if len(vals) > 1
                               else vals[0]}
                    members.append({"index": idx, "filter": flt})
                alia.put_alias(args.registry, args.name, members)
                print(json.dumps({"alias": args.name,
                                  "members": len(members)}))
            else:  # query
                res = alia.alias_search(args.registry, args.name,
                                        args.text, k=args.k)
                for row in res.to_pylist():
                    print(json.dumps(row))
        elif args.cmd == "compact":
            from .index.delete import compact_index

            meta = compact_index(args.index, args.out,
                                 corpus_tag=args.tag)
            print(json.dumps({"n_docs": meta["n_docs"],
                              "total_s": meta["total_s"]}))
    finally:
        if owns_session:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
