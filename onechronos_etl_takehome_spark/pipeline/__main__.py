"""CLI: python -m onechronos_etl_takehome_spark.pipeline

Runs the trade-reconciliation pipeline (the reference's
`python etl_pipeline.py` equivalent) with engine defaults.
"""

from __future__ import annotations

import argparse
import json
import sys

from ..session import get_spark
from .etl import ReconciliationPipeline, default_config, load_config


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="trade reconciliation ETL")
    ap.add_argument("--input-dir", default=".", help="dir with trades.csv etc.")
    ap.add_argument("--output-dir", default=".", help="dir for JSON outputs")
    ap.add_argument("--config", default=None, help="YAML config path")
    ap.add_argument(
        "--session-tz",
        default="UTC",
        help="timestamp rendering TZ (goldens used America/New_York)",
    )
    args = ap.parse_args(argv)

    import os

    os.makedirs(args.output_dir, exist_ok=True)
    config = load_config(args.config) if args.config else default_config()
    spark = get_spark("reconciliation-etl")
    spark.sparkContext.setLogLevel("WARN")
    try:
        pipe = ReconciliationPipeline(
            spark, config, input_dir=args.input_dir, session_tz=args.session_tz
        )
        metrics = pipe.run(args.output_dir)
        print(json.dumps(metrics))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
