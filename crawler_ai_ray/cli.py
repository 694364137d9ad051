"""CLI entrypoint — the `ray job submit` surface.

::

    python -m crawler_ai_ray.cli crawl  --corpus DIR --out DIR [--resume]
        [--buckets N] [--seen-shards N] [--store-shards N]
        [--obey-robots] [--max-rounds N] [--approximate-seen]
    python -m crawler_ai_ray.cli extract --pages FILE --out DIR
        [--op pages] [--batch-size N]
    python -m crawler_ai_ray.cli curate  --docs FILE --out DIR
        [--buckets N] [--threshold T]
    python -m crawler_ai_ray.cli export-jsonl --docs FILE --out DIR
    python -m crawler_ai_ray.cli export-parquet --docs FILE --out DIR \\
        --key doc_id --partitions 32 --resume
        [--columns a,b,c] [--resume]

Owns its Ray session (guarded init) — library code never calls
``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="crawler_ai_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the frontier crawl loop")
    c.add_argument("--corpus", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--buckets", type=int, default=32)
    c.add_argument("--seen-shards", type=int, default=8)
    c.add_argument("--store-shards", type=int, default=8)
    c.add_argument("--max-rounds", type=int, default=200)
    c.add_argument("--obey-robots", action="store_true")
    c.add_argument(
        "--approximate-seen", action="store_true",
        help="cuckoo-filter-only URL-seen (the 10^10-frontier mode)",
    )

    e = sub.add_parser("extract", help="run a registered extractor")
    e.add_argument("--pages", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--op", default="pages")
    e.add_argument("--batch-size", type=int, default=None)

    cu = sub.add_parser(
        "curate", help="run the corpus-curation chain over documents"
    )
    cu.add_argument("--docs", required=True)
    cu.add_argument("--out", required=True)
    cu.add_argument("--buckets", type=int, default=64)
    cu.add_argument("--threshold", type=float, default=0.8)

    dd = sub.add_parser(
        "dedup", help="run a dedup operator over a documents parquet"
    )
    dd.add_argument("--docs", required=True)
    dd.add_argument("--out", required=True)
    dd.add_argument(
        "--method", default="exact",
        choices=["exact", "minhash", "simhash", "winnow",
                 "segments", "spans"],
    )
    dd.add_argument("--buckets", type=int, default=64)

    gr = sub.add_parser(
        "graph", help="run a host-graph kernel over a pages parquet"
    )
    gr.add_argument("--pages", required=True)
    gr.add_argument("--out", required=True)
    gr.add_argument(
        "--method", default="pagerank",
        choices=["pagerank", "ppr", "trustrank", "opic", "hits",
                 "components", "degrees", "bfs", "communities",
                 "triangles", "kcore", "linkpred", "hyperball",
                 "neighborhood", "reciprocity", "assortativity",
                 "salsa", "modularity", "bowtie"],
    )
    gr.add_argument(
        "--seeds", default=None,
        help="comma-separated seed hosts (ppr/trustrank/bfs)",
    )

    ex = sub.add_parser(
        "export-jsonl", help="export a parquet corpus as sharded JSONL"
    )
    ex.add_argument("--docs", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--columns", default=None,
                    help="comma-separated column subset")
    ex.add_argument("--resume", action="store_true")

    xp = sub.add_parser(
        "export-parquet",
        help="export a parquet corpus as hash-partitioned parquet "
             "with per-partition resume markers",
    )
    xp.add_argument("--docs", required=True)
    xp.add_argument("--out", required=True)
    xp.add_argument("--key", default="doc_id")
    xp.add_argument("--partitions", type=int, default=32)
    xp.add_argument("--columns", default=None,
                    help="comma-separated column subset")
    xp.add_argument("--resume", action="store_true")

    args = p.parse_args(argv)
    _init_ray()
    try:
        if args.cmd == "curate":
            from .api import curate

            funnel = curate(
                args.docs,
                args.out,
                num_buckets=args.buckets,
                threshold=args.threshold,
            )
            print(json.dumps(funnel))
        elif args.cmd == "crawl":
            from .api import crawl

            totals = crawl(
                args.corpus,
                args.out,
                resume=args.resume,
                buckets=args.buckets,
                seen_shards=args.seen_shards,
                store_shards=args.store_shards,
                max_rounds=args.max_rounds,
                exact_seen=not args.approximate_seen,
                obey_robots=args.obey_robots,
            )
            print(json.dumps(totals))
        elif args.cmd == "dedup":
            from .api import dedup

            print(json.dumps(dedup(
                args.docs, args.out,
                method=args.method, num_buckets=args.buckets,
            )))
        elif args.cmd == "graph":
            from .api import graph

            print(json.dumps(graph(
                args.pages, args.out, method=args.method,
                seeds=args.seeds.split(",") if args.seeds else None,
            )))
        elif args.cmd == "export-parquet":
            from .api import export_parquet_partitioned

            print(json.dumps(export_parquet_partitioned(
                args.docs,
                args.out,
                key_col=args.key,
                num_partitions=args.partitions,
                columns=args.columns.split(",") if args.columns else None,
                resume=args.resume,
            )))
        elif args.cmd == "export-jsonl":
            from .api import export_jsonl

            manifest = export_jsonl(
                args.docs,
                args.out,
                columns=args.columns.split(",") if args.columns else None,
                resume=args.resume,
            )
            print(json.dumps(manifest))
        else:
            from .api import PagesPipeline

            kwargs = (
                {"batch_size": args.batch_size} if args.batch_size else {}
            )
            PagesPipeline(args.pages).extract(args.op, **kwargs).write(
                args.out
            )
        return 0
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
