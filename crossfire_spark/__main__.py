"""CLI facade: run any declared query (or ad-hoc SQL) from a shell.

    python -m crossfire_spark list
    python -m crossfire_spark run q06 [--sf-dir DIR] [--limit N] [--explain]
    python -m crossfire_spark sql "SELECT ..." [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="crossfire_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list declared queries")

    runp = sub.add_parser("run", help="run a declared query")
    runp.add_argument("name")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument("--explain", action="store_true")

    sqlp = sub.add_parser("sql", help="run ad-hoc SQL over the testdata views")
    sqlp.add_argument("query")
    sqlp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sqlp.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    from crossfire_spark.registry import all_oracle_sql, all_queries

    if args.cmd == "list":
        oracled = all_oracle_sql()
        for name in sorted(all_queries()):
            print(f"{name:24s} {'oracle' if name in oracled else 'rows-only'}")
        return 0

    from crossfire_spark import get_spark

    spark = get_spark(app_name="crossfire-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "run":
        qs = all_queries()
        if args.name not in qs:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        df = qs[args.name](spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        df.show(args.limit, truncate=False)
        return 0

    from crossfire_spark.sql import sql as run_sql

    run_sql(spark, args.query, args.sf_dir).show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
