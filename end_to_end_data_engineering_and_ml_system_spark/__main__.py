"""CLI — the engine's equivalent of the reference's ``main.py`` entry point
(/root/reference/main.py:29-107), reshaped around the query registry:

    python -m end_to_end_data_engineering_and_ml_system_spark list
    python -m end_to_end_data_engineering_and_ml_system_spark run <query> [--sf-dir DIR] [--explain] [--show N]
    python -m end_to_end_data_engineering_and_ml_system_spark oracle <query>
    python -m end_to_end_data_engineering_and_ml_system_spark bench
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="end_to_end_data_engineering_and_ml_system_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    runp = sub.add_parser("run", help="run a registered query")
    runp.add_argument("query")
    runp.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    runp.add_argument("--explain", action="store_true", help="print the formatted plan")
    runp.add_argument("--show", type=int, default=20, help="rows to display")

    op = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    op.add_argument("query")

    sub.add_parser("bench", help="run the headline benchmark (same as bench.py)")

    args = p.parse_args(argv)
    from .plans.registry import all_queries

    queries = all_queries()

    if args.cmd == "list":
        w = max(len(n) for n in queries)
        for name, q in sorted(queries.items()):
            kind = "oracle   " if q.oracle else "rows-only"
            bench = " bench" if q.bench else ""
            print(f"{name:{w}s}  {kind}{bench}  {q.description}")
        return 0

    if args.cmd == "oracle":
        q = queries.get(args.query)
        if q is None:
            print(f"unknown query: {args.query}", file=sys.stderr)
            return 2
        print(q.oracle.strip() if q.oracle else "-- rows-only (no SQL oracle)")
        return 0

    if args.cmd == "bench":
        import subprocess

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        return subprocess.call([sys.executable, os.path.join(root, "bench.py")])

    # run
    q = queries.get(args.query)
    if q is None:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2
    from .session import get_spark

    spark = get_spark(app_name=f"cli-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    df = q.build(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.show, truncate=False)
    n = df.count()
    print(f"{args.query}: {n} rows in {time.time() - t0:.2f}s ({args.sf_dir})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
