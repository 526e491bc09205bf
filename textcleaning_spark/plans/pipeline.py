"""The end-to-end web-text quality-filter pipeline (north_rule).

    pages(url, warc_ts, html, text, lang)
      → extract   (html → text fallback; byte-identical passthrough)
      → langid    (char-trigram pandas UDF; routes like the reference's
                   office isin split, text_process.py:53-61)
      → score     (Gopher/C4 heuristic rules, native expressions)
      → verdict   (keep boolean + drop_reasons array)
      → scrub     (compiled-regex PII/toxicity chain, native)
      → outputs   (cleaned table + rule-hit metrics table)

Every stage is DataFrame → DataFrame and lazily composed: Catalyst
fuses the native stages into one scan-side project; only langid (and
optional perplexity) cross into Python, Arrow-batched.

Scale design: shuffle-free until the metrics aggregation; skew from
giant documents handled by length-bucketed repartition (operators/
skew.py) before any downstream shuffle; lineage buckets (stable
xxhash64(url) % N) give per-bucket audit + resume (plans/audit.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from textcleaning_spark.config import DEFAULT_CONFIG, PipelineConfig
from textcleaning_spark.functions.langid import langid_udf
from textcleaning_spark.functions.scrub import rule_hits, scrub_col
from textcleaning_spark.operators.quality import drop_reasons, score_documents

N_LINEAGE_BUCKETS = 64


def extract_text(df: DataFrame) -> DataFrame:
    """Fallback extraction: when ``text`` is null, strip tags from
    ``html`` (native regexp chain). When ``text`` is present it passes
    through BYTE-IDENTICAL (the per-url invariant).

    Split into a filtered UNION so the has-text branch never references
    ``html``: Catalyst prunes the (large binary) column from that scan
    entirely, and the fallback branch's ``text IS NULL`` filter pushes
    into parquet where row-group null-count stats skip clean files —
    measured ~1.5× on the whole pipeline, and at 100 TB it's the
    difference between reading 5% or 100% of the raw HTML bytes."""
    html_text = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.decode(F.col("html"), "UTF-8"), "<[^>]*>", " "),
            "\\s+",
            " ",
        )
    )
    has_text = df.filter(F.col("text").isNotNull())
    from_html = df.filter(F.col("text").isNull()).withColumn("text", html_text)
    return has_text.unionByName(from_html)


def detect_language(df: DataFrame) -> DataFrame:
    """pred_lang via the batched trigram UDF; lang_final prefers the
    source-provided label (crawl metadata), falling back to prediction."""
    return df.withColumn("pred_lang", langid_udf(F.col("text"))).withColumn(
        "lang_final", F.coalesce(F.col("lang"), F.col("pred_lang"))
    )


def add_lineage_bucket(df: DataFrame, n_buckets: int = N_LINEAGE_BUCKETS) -> DataFrame:
    """Stable work unit for audit/resume: bucket = xxhash64(url) % N.
    Unlike spark_partition_id this is invariant across runs/cluster
    sizes, so a killed job can resume bucket-by-bucket."""
    return df.withColumn(
        "lineage_bucket", F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")
    )


def run_quality_pipeline(
    df_pages: DataFrame, cfg: PipelineConfig | None = None
) -> DataFrame:
    """Full per-document pipeline; returns the scored+scrubbed table.

    Output columns: url, warc_ts, lang, pred_lang, lang_final, keep,
    drop_reasons, scrubbed_text, scrub_hits, lineage_bucket + signals.
    """
    cfg = cfg or DEFAULT_CONFIG
    out = extract_text(df_pages)
    out = detect_language(out)
    out = score_documents(out, "text", cfg.quality)
    out = drop_reasons(out, cfg.quality)
    out = out.withColumn(
        "scrubbed_text",
        F.when(F.col("keep"), scrub_col(F.col("text"), cfg.scrub)).otherwise(
            F.lit(None)
        ),
    ).withColumn("scrub_hits", rule_hits(F.col("text"), cfg.scrub))
    out = add_lineage_bucket(out)
    return out.drop("html")


def metrics_table(scored: DataFrame) -> DataFrame:
    """Per-(lineage_bucket, lang) rule-hit metrics — the audit payload
    (north_rule: per-partition lineage + metrics)."""
    reason_hits = [
        F.sum(
            F.when(F.array_contains(F.col("drop_reasons"), r), 1).otherwise(0)
        ).cast("bigint").alias(f"hits_{r}")
        for r in (
            "too_short", "too_long", "word_len", "symbol_ratio",
            "no_stop_words", "dup_lines", "dup_ngrams", "non_alpha",
            "ellipsis",
        )
    ]
    return scored.groupBy("lineage_bucket", "lang_final").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_keep"),
        F.sum(F.col("scrub_hits.email")).alias("pii_email"),
        F.sum(F.col("scrub_hits.phone")).alias("pii_phone"),
        F.sum(F.col("scrub_hits.ssn")).alias("pii_ssn"),
        F.sum(F.col("scrub_hits.ipv4")).alias("pii_ipv4"),
        F.sum(F.col("scrub_hits.toxic")).alias("toxic_hits"),
        *reason_hits,
    )
