"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q01_...": sec, ...}, "sf": <sf>}

Each query is forced end-to-end with a noop sink (full materialization,
no disk-write noise). JVM/session startup is excluded from per-query
times but the total includes everything after session-ready, matching
how a resident cluster would serve queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

from onechronos_etl_takehome_spark.plans import QUERIES
from onechronos_etl_takehome_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_top_revenue_orders",
    "q04_order_priority_late",
    "q05_top_orders_per_customer",
    "q06_promo_revenue",
    "q07_customer_order_distribution",
    "q08_rollup_returns",
    "q12_monthly_order_volume",
    "q13_json_props",
    "q17_shipments_within_60d",
    "q18_user_sessions",
    "q19_purchase_last_view_asof",
    "q20_cube_order_stats",
    "q25_rolling_customer_spend",
    "q31_small_quantity_revenue",
    "q32_large_volume_orders",
    "q33_user_event_extremes",
    "v01_validate_lineitem",
    "t05_token_estimates",
    "d01_dedup_exact",
    "d02_ngram_jaccard_pairs",
    "d03_minhash_dedup_pairs",
    "s01_cosine_topk",
    "s04_cosine_topk_numpy",
    "t01_text_quality",
    "e01_hourly_event_windows",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Untimed warmup: JVM/codegen spin-up shouldn't be charged to the
    # first query (a resident cluster serves queries warm).
    from onechronos_etl_takehome_spark.sources.tables import load_table

    load_table(spark, sf_dir, "lineitem").count()

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # The reference's own workload: its trade-reconciliation pipeline
    # end-to-end on its committed CSVs (BASELINE.md: 114.3 s incl. JVM
    # start; our session is warm, its 14-action lineage re-execution
    # is the dominant cost either way).
    import tempfile

    from onechronos_etl_takehome_spark.pipeline import ReconciliationPipeline

    t0 = time.perf_counter()
    ReconciliationPipeline(spark, input_dir="/root/reference").run(
        tempfile.mkdtemp(prefix="bench_etl_")
    )
    timings["etl_reference_pipeline"] = round(time.perf_counter() - t0, 3)
    total = round(time.perf_counter() - t_all, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
