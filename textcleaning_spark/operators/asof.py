"""As-of (nearest-preceding-event) join — a custom operator Spark has
no primitive for, built as a composition of existing DataFrame ops
(union + tagged window), per the engine's custom-operator policy:
compose before dropping to pandas UDFs.

Semantics: for each left row, attach the latest right row with the same
key whose timestamp is <= the left timestamp (backward as-of,
inclusive). Implementation: tag both sides, union, sort within each key
by (ts, side, tiebreak) and carry the last non-null right payload
forward with an IGNORE NULLS window — one shuffle on the key, no
range-explosion, skew handled by AQE exactly like any window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: str,
    left_tiebreak: str,
) -> DataFrame:
    """Backward-inclusive as-of join.

    Returns all ``left`` columns plus ``asof_<right_payload>`` (null
    when no right row precedes). ``left_tiebreak`` and the right
    payload column make the within-timestamp ordering deterministic.
    """
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__lrow"),
        F.lit(None).cast(dict(right.dtypes)[right_payload]).alias("__rpay"),
        F.col(left_tiebreak).cast("long").alias("__tie"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tagged.schema["__lrow"].dataType).alias("__lrow"),
        F.col(right_payload).alias("__rpay"),
        F.col(right_payload).cast("long").alias("__tie"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts"), F.col("__is_left"), F.col("__tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__asof", F.last(F.col("__rpay"), ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )
    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    return joined.select(*out_cols, F.col("__asof").alias(f"asof_{right_payload}"))
