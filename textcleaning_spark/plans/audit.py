"""Checkpoint / lineage / resume (north_rule; SURVEY.md §7.2 step 7).

Reference analogue: incremental pickle dumps every 10,000 docs
(sna_analysis.py:78-81) and cache-or-compute pickle memoization
(text_process_v5.py:29-33). Here the unit of work is a STABLE lineage
bucket (xxhash64(url) % N — invariant across runs and cluster sizes),
and each completed bucket writes one audit row. A killed job resumes
by anti-joining pending buckets against the audit table — no
recomputation of completed work, no reliance on task-level state.

Iceberg note: the layout is Iceberg-table-shaped (append-only audit +
partitioned data); in-sandbox it's plain parquet directories with
identical semantics (SURVEY.md §7.4 risk 5). ``partitionBy(
lineage_bucket)`` makes resume a partition-pruned read on both sides.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def completed_buckets(spark: SparkSession, audit_path: str, stage: str) -> DataFrame:
    """Buckets already finished for ``stage`` (empty DF if no audit yet)."""
    if not os.path.exists(audit_path):
        return spark.range(0).select(F.col("id").cast("int").alias("lineage_bucket"))
    audit = spark.read.parquet(audit_path)
    return (
        audit.filter(F.col("stage") == stage)
        .select("lineage_bucket")
        .distinct()
    )


def pending(df: DataFrame, spark: SparkSession, audit_path: str, stage: str) -> DataFrame:
    """Resume predicate: keep only rows whose bucket has no audit row.
    Broadcast anti-join — the audit side is ≤ N_LINEAGE_BUCKETS rows."""
    done = completed_buckets(spark, audit_path, stage)
    return df.join(F.broadcast(done), "lineage_bucket", "left_anti")


def write_stage(
    scored: DataFrame,
    spark: SparkSession,
    out_path: str,
    audit_path: str,
    stage: str,
    metrics: DataFrame | None = None,
) -> None:
    """Write stage output partitioned by lineage bucket, then append
    one audit row per bucket (with rule-hit metrics when provided).

    The audit append happens AFTER the data write commits, so a crash
    between the two re-runs the bucket (at-least-once, idempotent
    because the data write is per-bucket overwrite)."""
    (
        scored.write.mode("overwrite")
        # only replace the buckets present in THIS write — completed
        # buckets from previous (partial) runs stay untouched
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lineage_bucket")
        .parquet(out_path)
    )
    if metrics is None:
        metrics = scored.groupBy("lineage_bucket").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs")
        )
    audit_rows = metrics.withColumn("stage", F.lit(stage)).withColumn(
        "completed_at", F.current_timestamp()
    )
    audit_rows.write.mode("append").parquet(audit_path)


def run_resumable(
    df_pages_scored: DataFrame,
    spark: SparkSession,
    out_path: str,
    audit_path: str,
    stage: str = "quality_filter",
) -> int:
    """Process only pending buckets; returns how many rows were newly
    processed (0 == nothing to do, fully resumed)."""
    todo = pending(df_pages_scored, spark, audit_path, stage)
    n = todo.count()
    if n > 0:
        write_stage(todo, spark, out_path, audit_path, stage)
    return n
