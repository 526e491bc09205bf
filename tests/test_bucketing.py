"""Co-located joins via bucketed tables: the join plan must contain no
shuffle (Exchange) when both sides are bucketed on the join key."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from textcleaning_spark.operators.bucketing import bucketed_join, write_bucketed
from textcleaning_spark.sources.registry import load_table
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, SF_ORACLE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF_ORACLE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    write_bucketed(li, "b_lineitem", ["l_orderkey"], n_buckets=8)
    write_bucketed(o, "b_orders", ["l_orderkey"], n_buckets=8)
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # at sf0.01 the planner would broadcast (and rightly so); force the
    # sort-merge path to demonstrate the at-scale plan, where neither
    # fact side fits the broadcast threshold
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, ["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and the result is right: every lineitem row finds its order
        n_li = load_table(spark, SF_ORACLE, "lineitem").count()
        assert joined.count() == n_li
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_no_shuffle(spark, bucketed_tables):
    """Aggregation on the bucket key also reuses the clustering."""
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
