"""Bucketed (pre-shuffled) tables for co-located joins and aggs.

At 100 TB the dominant cost of a fact-fact join is the shuffle. When
the same key joins repeatedly (url→url, orderkey→orderkey across
pipeline stages), bucketing pays the shuffle ONCE at write time:
``bucketBy(n, key)`` + ``sortBy(key)`` writes hash-clustered,
key-sorted files, and every later sort-merge join / aggregation on
that key runs with NO Exchange (verified in tests/test_bucketing.py
by asserting the physical plan is exchange-free).

Reference analogue: the pickle checkpoints (text_process_v5.py:29-33)
also pay write-time cost to skip later recomputation — bucketing is
the shuffle-shaped version of that trade.

Note bucketed tables need the session catalog (``saveAsTable``); plain
``.parquet(path)`` writes cannot carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-clustered on ``keys`` into ``n_buckets``
    files per partition; ``sort=True`` additionally orders rows within
    each bucket so downstream sort-merge joins skip their Sort too."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket keys: the
    planner sees matching hash distributions and emits a sort-merge
    join with zero Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on)
