"""Engine CLI: list and run catalog queries from the shell.

    python -m onechronos_etl_takehome_spark list
    python -m onechronos_etl_takehome_spark run q01_pricing_summary \
        --sf-dir /root/testdata/sf0.01 --limit 10
    python -m onechronos_etl_takehome_spark run d03_capped_minhash_dedup \
        --explain

`run` prints the result as Spark's tabular `show()` (bounded by
--limit; --json emits one JSON object per row instead) and, with
--explain, the formatted physical plan — the same surface
tools/gen_plans.py fingerprints.  The trade-reconciliation pipeline has
its own entrypoint: ``python -m onechronos_etl_takehome_spark.pipeline``.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="onechronos_etl_takehome_spark",
        description="PySpark analytics engine — catalog query runner",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list catalog queries (+oracle status)")
    run = sub.add_parser("run", help="execute one catalog query")
    run.add_argument("name", help="catalog query name (see `list`)")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--limit", type=int, default=20, help="rows to show")
    run.add_argument("--json", action="store_true", help="JSON lines output")
    run.add_argument(
        "--explain", action="store_true", help="print the formatted plan"
    )
    return ap


def main(argv: list[str] | None = None, spark=None) -> int:
    from .plans import ORACLES, QUERIES

    args = build_parser().parse_args(argv)
    if args.cmd == "list":
        for name in QUERIES:
            kind = "oracled" if name in ORACLES else "rows-only"
            print(f"{name}\t{kind}")
        return 0

    if args.name not in QUERIES:
        print(f"unknown query: {args.name} (try `list`)", file=sys.stderr)
        return 2
    owns_session = spark is None
    if owns_session:
        from .session import get_spark

        spark = get_spark("cli")
        spark.sparkContext.setLogLevel("ERROR")
    try:
        df = QUERIES[args.name](spark, args.sf_dir)
        if args.explain:
            print(
                df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            )
        if args.json:
            for line in df.limit(args.limit).toJSON().collect():
                print(line)
        else:
            df.show(args.limit, truncate=False)
    finally:
        if owns_session:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
