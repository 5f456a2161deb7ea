"""Bucketed join must run without a shuffle (no Exchange under the
join) and produce the same result as the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.sources.bucketing import (
    read_bucketed,
    write_bucketed,
)
from onechronos_etl_takehome_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_skips_exchange(spark):
    l = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    write_bucketed(l, "li_bucketed", bucket_by=["l_orderkey"], n_buckets=8)
    write_bucketed(o, "ord_bucketed", bucket_by=["o_orderkey"], n_buckets=8)
    try:
        lb, ob = read_bucketed(spark, "li_bucketed"), read_bucketed(
            spark, "ord_bucketed"
        )
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))

        # disable broadcast so the join strategy decision is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
            join_part = plan.split("SortMergeJoin")[-1]
            # no shuffle below the join: buckets are co-located
            assert "Exchange hashpartitioning" not in join_part
            expected = (
                l.join(o, l.l_orderkey == o.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            assert sorted(map(tuple, joined.collect())) == sorted(
                map(tuple, expected.collect())
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS ord_bucketed")
