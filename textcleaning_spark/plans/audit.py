"""Checkpoint / lineage / resume (north_rule; SURVEY.md §7.2 step 7).

Reference analogue: incremental pickle dumps every 10,000 docs
(sna_analysis.py:78-81) and cache-or-compute pickle memoization
(text_process_v5.py:29-33). Here the unit of work is a STABLE lineage
bucket (xxhash64(url) % N — invariant across runs and cluster sizes),
and each completed bucket writes one audit row. A killed job resumes
by anti-joining pending buckets against the audit table — no
recomputation of completed work, no reliance on task-level state.

Iceberg note (round 3: capability-probed, not assumed): the layout is
Iceberg-table-shaped (append-only audit + partitioned data). When the
Iceberg Spark runtime jar is on the classpath, :func:`storage_format`
resolves to ``iceberg`` and every read/write below goes through
``format("iceberg")``; otherwise it resolves to the plain-parquet
stand-in with identical audit/resume semantics (SURVEY.md §7.4 risk 5
allows this when the jar is absent — in this sandbox it is). The
contract itself (stable buckets, dynamic partition overwrite,
audit-after-data ordering) is format-independent and tested in both
modes (tests/test_audit_resume.py; the Iceberg leg skips without the
jar). ``partitionBy(lineage_bucket)`` makes resume a partition-pruned
read on both sides.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ICEBERG_PROBE_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is loadable in THIS JVM.

    A classpath probe, not a config guess: ``Class.forName`` on the
    Iceberg SparkCatalog entry point. No jar → ClassNotFoundException →
    False (the parquet stand-in runs)."""
    try:
        spark._jvm.java.lang.Class.forName(_ICEBERG_PROBE_CLASS)
        return True
    except Exception:
        return False


def storage_format(spark: SparkSession) -> str:
    """Checkpoint/audit table format: ``iceberg`` when the runtime jar
    is present, else ``parquet`` (explicit capability check — the
    decision is visible in logs/plans rather than implicit)."""
    return "iceberg" if iceberg_available(spark) else "parquet"


def completed_buckets(
    spark: SparkSession, audit_path: str, stage: str, fmt: str | None = None
) -> DataFrame:
    """Buckets already finished for ``stage`` (empty DF if no audit yet)."""
    fmt = fmt or storage_format(spark)
    if not os.path.exists(audit_path):
        return spark.range(0).select(F.col("id").cast("int").alias("lineage_bucket"))
    audit = spark.read.format(fmt).load(audit_path)
    return (
        audit.filter(F.col("stage") == stage)
        .select("lineage_bucket")
        .distinct()
    )


def pending(
    df: DataFrame,
    spark: SparkSession,
    audit_path: str,
    stage: str,
    fmt: str | None = None,
) -> DataFrame:
    """Resume predicate: keep only rows whose bucket has no audit row.
    Broadcast anti-join — the audit side is ≤ N_LINEAGE_BUCKETS rows."""
    done = completed_buckets(spark, audit_path, stage, fmt)
    return df.join(F.broadcast(done), "lineage_bucket", "left_anti")


def write_stage(
    scored: DataFrame,
    spark: SparkSession,
    out_path: str,
    audit_path: str,
    stage: str,
    metrics: DataFrame | None = None,
    fmt: str | None = None,
) -> None:
    """Write stage output partitioned by lineage bucket, then append
    one audit row per bucket (with rule-hit metrics when provided).

    ``fmt`` defaults to :func:`storage_format` — ``iceberg`` when the
    runtime jar is present, else ``parquet``. Both legs use dynamic
    partition overwrite so only the buckets present in THIS write are
    replaced; the audit append happens AFTER the data write commits, so
    a crash between the two re-runs the bucket (at-least-once,
    idempotent because the data write is per-bucket overwrite)."""
    fmt = fmt or storage_format(spark)
    (
        scored.write.format(fmt).mode("overwrite")
        # only replace the buckets present in THIS write — completed
        # buckets from previous (partial) runs stay untouched
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lineage_bucket")
        .save(out_path)
    )
    if metrics is None:
        metrics = scored.groupBy("lineage_bucket").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs")
        )
    audit_rows = metrics.withColumn("stage", F.lit(stage)).withColumn(
        "completed_at", F.current_timestamp()
    )
    audit_rows.write.format(fmt).mode("append").save(audit_path)


def run_resumable(
    df_pages_scored: DataFrame,
    spark: SparkSession,
    out_path: str,
    audit_path: str,
    stage: str = "quality_filter",
    fmt: str | None = None,
) -> int:
    """Process only pending buckets; returns how many rows were newly
    processed (0 == nothing to do, fully resumed)."""
    fmt = fmt or storage_format(spark)
    todo = pending(df_pages_scored, spark, audit_path, stage, fmt)
    n = todo.count()
    if n > 0:
        write_stage(todo, spark, out_path, audit_path, stage, fmt=fmt)
    return n
