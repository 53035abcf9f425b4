"""CLI entrypoints — the shape a ``ray job submit`` deployment invokes:

    ray job submit -- python -m fluent_plugin_kubernetes_metadata_filter_ray.cli \
        run --sf-dir /data/transcripts --out /sinks/run1

Commands:
    run      flagship parse → enrich → route → per-sink counts
    resume   checkpointed shard-by-shard run (skips committed shards)
    analyze  run any registered query (see ``analyze --list``) over an
             sf-dir and print the head of its result

Owns a Ray session only when standalone (guarded init; the driver contract
in __ray_entry__ never goes through here)."""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    """Returns (ray, owns_session): only shut down what we started."""
    import ray

    if ray.is_initialized():
        return ray, False
    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    return ray, True


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="fluent_plugin_kubernetes_metadata_filter_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="flagship pipeline")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    runp.add_argument("--out", default=None,
                      help="sink dir, CLEARED before write (omit: counts only)")
    runp.add_argument("--rep", type=int, default=1)

    resp = sub.add_parser("resume", help="checkpointed resumable run")
    resp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    resp.add_argument("--out", required=True)
    resp.add_argument("--rep", type=int, default=1)
    resp.add_argument("--files-per-shard", type=int, default=4)

    anap = sub.add_parser("analyze", help="run a registered query")
    anap.add_argument("query", nargs="?", help="query name (e.g. q_log_templates)")
    anap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    anap.add_argument("--limit", type=int, default=20)
    anap.add_argument("--list", action="store_true", help="list query names")

    args = p.parse_args(argv)
    ray, owns = _ensure_ray()
    try:
        if args.cmd == "run":
            from .pipelines.flagship import run_flagship

            counts = run_flagship(args.sf_dir, out_dir=args.out, rep=args.rep).to_pandas()
            print(counts.sort_values("role").to_string(index=False))
        elif args.cmd == "resume":
            from .state.checkpoint import run_resumable

            summary = run_resumable(
                args.sf_dir, args.out, rep=args.rep, files_per_shard=args.files_per_shard
            )
            print(json.dumps(summary, indent=1))
        elif args.cmd == "analyze":
            from . import queries as q

            reg = q.queries()
            if args.list or not args.query:
                print("\n".join(sorted(reg)))
                return 0
            if args.query not in reg:
                print(f"unknown query {args.query!r}; use --list", file=sys.stderr)
                return 2
            res = reg[args.query](args.sf_dir)
            if hasattr(res, "limit"):  # Dataset: stream only the head
                res = res.limit(args.limit).to_pandas()
            else:
                res = res.head(args.limit)
            print(res.to_string(index=False))
    finally:
        if owns:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
