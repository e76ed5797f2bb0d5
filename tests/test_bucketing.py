"""Bucketed-table co-located join: pre-bucketing both sides of a
recurring join key eliminates the shuffle entirely — the biggest
single lever for repeated fact-fact joins at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from crossfire_spark.catalog import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("orders_bucketed")
    )
    (
        c.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("customer_bucketed")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a sort-merge join so the bucketing (not a broadcast)
        # is what avoids the exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob = spark.table("orders_bucketed")
        cb = spark.table("customer_bucketed")
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey).groupBy(
            "c_mktsegment"
        ).agg(F.count(F.lit(1)).alias("c"))
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        # both scans read bucketed layouts...
        assert plan.count("Bucketed: true") == 2, plan[:1500]
        # ...and the ONLY exchange is the post-join groupBy — nothing
        # shuffles into the join itself (tree prints root-first, so
        # count exchanges rather than slicing the tree).
        tree = plan.split("\n\n")[0]
        assert tree.count("Exchange") == 1, (
            "bucketed join must not shuffle either side:\n" + tree
        )
        # and it still returns the right answer
        expect = (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, expect.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS customer_bucketed")
