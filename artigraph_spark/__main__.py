"""CLI: run/list/explain the declared queries, run the bench, run demos.

    python -m artigraph_spark list
    python -m artigraph_spark run agg_pricing_summary --sf-dir /root/testdata/sf0.01
    python -m artigraph_spark explain join_star_broadcast --mode formatted
    python -m artigraph_spark bench
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="artigraph_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list declared queries")
    p_list.add_argument("--bench-only", action="store_true")

    p_run = sub.add_parser("run", help="run a query and show rows")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_run.add_argument("--limit", type=int, default=20)

    p_explain = sub.add_parser("explain", help="show a query's physical plan")
    p_explain.add_argument("query")
    p_explain.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_explain.add_argument("--mode", default="formatted", choices=["simple", "extended", "formatted", "cost", "codegen"])

    sub.add_parser("bench", help="run the headline benchmark (one JSON line)")

    p_audit = sub.add_parser(
        "audit", help="plan-audit queries (fails on cartesian / row-Python-UDF)"
    )
    p_audit.add_argument("queries", nargs="*", help="default: every registered query")
    p_audit.add_argument("--sf-dir", default="/root/testdata/sf0.001")

    args = parser.parse_args(argv)

    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    if args.cmd == "audit":
        from tools.plan_audit import main as audit_main

        sys.argv = ["plan_audit", args.sf_dir, *args.queries]
        return audit_main()

    from artigraph_spark.queries import REGISTRY, queries

    qs = queries()
    if args.cmd == "list":
        for name in sorted(qs):
            qd = REGISTRY[name]
            if args.bench_only and not qd.bench:
                continue
            oracle = "oracle" if qd.oracle else "rows-only"
            bench_flag = " [bench]" if qd.bench else ""
            doc = (qd.fn.__doc__ or "").strip().splitlines()[0] if qd.fn.__doc__ else ""
            print(f"{name:28s} {oracle:9s}{bench_flag:8s} {doc}")
        return 0

    if args.query not in qs:
        print(f"unknown query {args.query!r}; `list` shows the inventory", file=sys.stderr)
        return 2

    from artigraph_spark.session import get_spark

    spark = get_spark(f"cli:{args.cmd}:{args.query}")
    df = qs[args.query](spark, args.sf_dir)
    if args.cmd == "run":
        df.show(args.limit, truncate=False)
        print(f"({df.count()} rows total)")
    else:
        from artigraph_spark.plans import physical_plan

        print(physical_plan(df, args.mode))
    return 0


if __name__ == "__main__":
    sys.exit(main())
