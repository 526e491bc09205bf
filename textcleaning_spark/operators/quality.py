"""Document-level quality scoring + keep/drop verdict.

This is the engine's flagship stage: the reference's word-level
keep/drop machinery (idf_rank >= K ∧ major_pos ∈ pass set,
text_process_v5.py:164-169) generalized to Gopher/C4-style document
filtering, entirely with native expressions (no Python in the hot
path) so the whole stage is whole-stage-codegen'd and pushdown-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from textcleaning_spark.config import QualityConfig
from textcleaning_spark.functions import text as T


def score_documents(
    df: DataFrame, text_col: str = "text", cfg: QualityConfig | None = None
) -> DataFrame:
    """Append per-document quality signals and the ``keep`` verdict.

    All signals are O(len) native expressions evaluated in one pass over
    the scan — Catalyst collapses them into a single project, so at
    100 TB this stage is scan-bound, shuffle-free, and partition-local.
    """
    cfg = cfg or QualityConfig()
    c = text_col
    return (
        df.withColumn("n_words", T.n_words(c))
        .withColumn("mean_word_len", F.round(T.mean_word_len(c), 6))
        .withColumn("stop_word_count", T.stop_word_count(c))
        .withColumn("symbol_ratio", F.round(T.symbol_to_word_ratio(c), 6))
        .withColumn("alpha_word_frac", F.round(T.alpha_word_frac(c), 6))
        .withColumn("dup_line_frac", F.round(T.dup_line_frac(c), 6))
        .withColumn("ellipsis_line_frac", F.round(T.ellipsis_line_frac(c), 6))
        .withColumn("keep", T.keep_expr(c, cfg))
    )


def drop_reasons(df_scored: DataFrame, cfg: QualityConfig | None = None) -> DataFrame:
    """Append ``drop_reasons: array<string>`` naming every failed rule —
    the audit/metrics payload (north_rule per-partition rule-hit
    metrics are aggregations over this column)."""
    cfg = cfg or QualityConfig()
    reasons = F.array_compact(
        F.array(
            F.when(F.col("n_words") < cfg.min_words, F.lit("too_short")),
            F.when(F.col("n_words") > cfg.max_words, F.lit("too_long")),
            F.when(
                (F.col("mean_word_len") < cfg.min_mean_word_len)
                | (F.col("mean_word_len") > cfg.max_mean_word_len),
                F.lit("word_len"),
            ),
            F.when(
                F.col("symbol_ratio") > cfg.max_symbol_to_word_ratio,
                F.lit("symbol_ratio"),
            ),
            F.when(
                F.col("stop_word_count") < cfg.min_stop_word_count,
                F.lit("no_stop_words"),
            ),
            F.when(
                F.col("dup_line_frac") > cfg.max_dup_line_frac, F.lit("dup_lines")
            ),
            F.when(
                F.col("alpha_word_frac") < cfg.min_alpha_word_frac,
                F.lit("non_alpha"),
            ),
            F.when(
                F.col("ellipsis_line_frac") > cfg.max_ellipsis_line_frac,
                F.lit("ellipsis"),
            ),
        )
    )
    return df_scored.withColumn("drop_reasons", reasons)


def quality_profile(df_scored: DataFrame, *group_cols: str) -> DataFrame:
    """Aggregate keep/drop counts + mean signals per group — the
    flagship reporting query (rule-hit metrics table)."""
    cols = list(group_cols) or ["lang"]
    return (
        df_scored.groupBy(*cols, "keep")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_words"), 4).alias("avg_words"),
            F.round(F.avg("mean_word_len"), 4).alias("avg_word_len"),
            F.round(F.avg("stop_word_count"), 4).alias("avg_stop_words"),
        )
    )
