"""Skew & partitioning helpers (north_rule: salted repartitioning +
explicit length-bucketed partitions for giant documents).

AQE's skew-join splitting handles runtime skew inside joins; these
helpers handle the cases AQE can't see:
* giant-document stragglers inside pandas-UDF stages (one 500 MB HTML
  page serializes a whole Arrow batch) → length buckets;
* hot keys in explicit aggregations → two-phase salted aggregation;
* hot keys in the co-occurrence self-join → cap + salt-replicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# byte-length bucket boundaries: tiny/small/medium/large/giant
DEFAULT_LENGTH_BOUNDS = (1_000, 10_000, 100_000, 1_000_000)


def length_bucket(col_name: str, bounds: tuple[int, ...] = DEFAULT_LENGTH_BOUNDS) -> Column:
    """Monotone bucket id for a length column: number of bounds ≤ value
    (0 = tiny … len(bounds) = giant). Native, codegen-friendly."""
    out = F.lit(0)
    for b in bounds:
        out = out + F.when(F.col(col_name) >= F.lit(b), 1).otherwise(0)
    return out.cast("int")


def repartition_by_length(
    df: DataFrame,
    length_col: str,
    n_partitions: int,
    bounds: tuple[int, ...] = DEFAULT_LENGTH_BOUNDS,
) -> DataFrame:
    """Repartition so each partition holds docs of similar size: the
    bucket joins the hash key, so giant docs spread across partitions
    instead of all landing wherever their url hashes. Keeps Arrow
    batches in pandas-UDF stages homogeneous (no straggler batches)."""
    bucket = length_bucket(length_col, bounds).alias("__len_bucket")
    salted = df.withColumn("__len_bucket", bucket).withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_partitions))
    )
    return salted.repartition(n_partitions, "__len_bucket", "__salt").drop(
        "__len_bucket", "__salt"
    )


def salted_group_count(
    df: DataFrame, key_cols: list[str], salt_mod: int = 16
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys: partial count on
    (key, salt) then final on key. Spark's hash agg already does
    map-side partial combine; explicit salting additionally splits a
    hot key across REDUCE tasks, which partial combine cannot."""
    # salt from row identity — uniform spread, no stability needed
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_mod))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("__c").cast("bigint").alias("cnt"))


def salted_join_small_right(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_mod: int = 8,
) -> DataFrame:
    """Skewed equi-join: salt the big side, replicate the small side
    ``salt_mod``× with an exploded salt column, join on (key, salt).
    Use when the small side is too big to broadcast but the big side
    has hot keys; otherwise prefer broadcast or AQE skew join."""
    big_s = big.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_mod)).cast("int")
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_mod - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return big_s.join(small_s, [key, "__salt"]).drop("__salt")
