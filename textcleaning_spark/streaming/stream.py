"""Structured Streaming variants of the batch stages (SURVEY.md §2.9).

The reference's streaming-shaped pattern — generator source + dict agg
+ pickle checkpoint every 10k docs (sna_analysis.py:69-86) — maps to:
``readStream`` file source → the SAME stateless quality/scrub
expressions (they are plan fragments, batch/stream agnostic) →
``writeStream`` with ``checkpointLocation`` for exactly-once resume,
plus watermarked sliding-window aggregations for the event-time stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from textcleaning_spark.config import DEFAULT_CONFIG, PipelineConfig
from textcleaning_spark.sources.pages import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, path: str, max_files: int = 8) -> DataFrame:
    """Unbounded pages source: each new parquet file under ``path`` is
    a micro-batch (maxFilesPerTrigger bounds batch size — the streaming
    twin of the reference's 10k-doc checkpoint cadence)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def quality_filter_stream(pages: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """The full stateless pipeline applied to a streaming DataFrame —
    identical plan fragments as batch (score, verdict, scrub)."""
    from textcleaning_spark.plans.pipeline import run_quality_pipeline

    return run_quality_pipeline(pages, cfg or DEFAULT_CONFIG)


def windowed_lang_counts(
    pages: DataFrame, window: str = "1 hour", slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked (sliding) event-time window counts per language —
    late data beyond ``watermark`` is dropped, state is bounded."""
    w = (
        F.window(F.col("warc_ts"), window, slide)
        if slide
        else F.window(F.col("warc_ts"), window)
    )
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(w.alias("win"), F.col("lang"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "lang",
            "n_docs",
        )
    )


def dedup_stream(
    pages: DataFrame,
    key_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: first-seen wins per content hash, with
    state bounded by the event-time watermark
    (``dropDuplicatesWithinWatermark``): two pages whose event times
    fall within the watermark window dedup against each other; state
    for hashes older than the watermark is evicted, so memory is
    O(docs-per-watermark-window), not O(corpus). That is the right
    semantics for a crawl feed — recrawl duplicates cluster in time —
    while historical dedup stays the batch job (operators/dedup).

    The dedup key is xxhash64(md5(text)) packed next to the 128-bit
    digest — state stores the tiny key pair, never the text.
    """
    keyed = pages.withColumn(
        "__h", F.md5(F.encode(F.col(key_col), "UTF-8"))
    ).withColumn("__h64", F.xxhash64(F.col("__h")))
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__h64", "__h"])
        .drop("__h64", "__h")
    )


def write_stream_parquet(
    df: DataFrame, out_path: str, checkpoint: str, available_now: bool = True
):
    """Sink with checkpointed offsets: a killed stream resumes from the
    last committed micro-batch (streaming twin of plans/audit.py)."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_quality_stream_once(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    cfg: PipelineConfig | None = None,
    timeout_s: int = 120,
) -> None:
    """Process all currently-available files then stop (availableNow) —
    drains the backlog with streaming semantics + checkpoint."""
    pages = read_pages_stream(spark, in_path)
    scored = quality_filter_stream(pages, cfg)
    q = write_stream_parquet(scored, out_path, checkpoint, available_now=True)
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
