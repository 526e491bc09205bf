"""Range-join operator: bucketized plan must be row-identical to the
naive key+residual join."""

from __future__ import annotations

from pyspark.sql import functions as F

from textcleaning_spark.operators.ranges import range_join_point_in_interval
from textcleaning_spark.sources.registry import load_table
from tests.conftest import SF_ORACLE


def test_range_join_matches_naive(spark):
    ev = load_table(spark, SF_ORACLE, "events")
    points = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    windows = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
    )
    naive = points.join(
        windows,
        (points.user_id == windows.user_id)
        & (points.ts >= windows.w_start)
        & (points.ts < windows.w_end),
    ).select(points.event_id, windows.window_id)
    fast = range_join_point_in_interval(
        points, windows, key="user_id", ts="ts", start="w_start", end="w_end",
        bucket_seconds=1800,  # deliberately smaller than the window:
        # intervals span multiple buckets, exercising the replication path
    ).select("event_id", "window_id")
    n_naive = naive.count()
    assert n_naive > 0, "fixture mismatch: no event falls in any window"
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, naive.collect()))
