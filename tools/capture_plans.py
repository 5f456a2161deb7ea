"""Capture .explain("formatted") for a list of catalog queries.

Usage: python tools/capture_plans.py <out_dir> <suffix> <name> [<name>...]

Writes <out_dir>/<name>_<suffix>.txt for each query. Imports the
engine from the repo this script lives in (so running it from a
pristine clone captures BEFORE plans, from the working tree AFTER
plans). Queries that eagerly materialize intermediates
(truncate_lineage) execute those stages at build time — capture is
therefore not free, but it is exactly the plan the bench times.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onechronos_etl_takehome_spark.plans import QUERIES  # noqa: E402
from onechronos_etl_takehome_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        "capture_plans", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spark.sparkContext.setJobDescription(f"plan: {name}")
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        stdout = sys.stdout
        sys.stdout = buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"captured {name}")
    spark.stop()


if __name__ == "__main__":
    main()
