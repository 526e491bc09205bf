"""Query registry: every implemented operator as a (Spark, oracle-SQL) pair.

Each entry is a named query ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) the equivalent DuckDB SQL over the driver's
pre-registered views. The driver compares row-count + schema +
order-insensitive value hash at sf=0.01 — so:

* every computed column is explicitly aliased identically on both sides;
* integer-derived values are cast to BIGINT on both sides;
* doubles are either exact-by-construction (integer ratios, halves) or
  produced by exact DECIMAL sums cast to double, or rounded;
* deterministic tie-breaks on every top-k / row_number.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from textcleaning_spark.config import CorpusStatsConfig, QualityConfig, stop_pos
from textcleaning_spark.functions import text as T
from textcleaning_spark.functions import tagger
from textcleaning_spark.operators import cooccurrence as co
from textcleaning_spark.operators import corpus_stats as cs
from textcleaning_spark.operators import quality as q
from textcleaning_spark.sources.registry import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLE[name] = sql
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)


# ---------------------------------------------------------------------------
# shared SQL fragments (generated from the same specs as the Spark side)
# ---------------------------------------------------------------------------
_TOK = T.tokens_sql("text")
_DOC_TOKENS_CTE = f"""
tok AS (
    SELECT doc_id, unnest({_TOK}) AS word FROM documents
)
"""


# ---------------------------------------------------------------------------
# 1. Language routing (P2) — the reference's isin office split
# ---------------------------------------------------------------------------
@register(
    "lang_route_counts",
    """
    SELECT lang,
           (lang IN ('en')) AS latin_route,
           count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS total_chars
    FROM documents
    GROUP BY lang
    """,
)
def lang_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: dictionary routing by language + per-route sizes."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    ).withColumn("latin_route", F.col("lang").isin("en"))


# ---------------------------------------------------------------------------
# 2. TF / DF / IDF (A4-A7)
# ---------------------------------------------------------------------------
@register(
    "tf_df_idf",
    f"""
    WITH {_DOC_TOKENS_CTE}
    SELECT word,
           count(*)::BIGINT AS tf,
           count(DISTINCT doc_id)::BIGINT AS df,
           round(ln((SELECT count(*) FROM documents)::DOUBLE
                    / (count(DISTINCT doc_id) + 1)), 6) AS idf
    FROM tok
    GROUP BY word
    """,
)
def tf_df_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+A7: one explode + one aggregation; idf = ln(N/(df+1))."""
    docs = load_table(spark, sf_dir, "documents")
    tok = cs.explode_tokens(docs, "doc_id", "text")
    stats = cs.tf_df(tok, "doc_id")
    n = docs.agg(F.count(F.lit(1)).alias("__n"))
    return (
        stats.crossJoin(F.broadcast(n))
        .withColumn("idf", F.round(F.log(F.col("__n").cast("double") / (F.col("df") + 1)), 6))
        .drop("__n")
    )


# ---------------------------------------------------------------------------
# 3. pandas-style average rank over idf (W2)
# ---------------------------------------------------------------------------
@register(
    "idf_average_rank",
    f"""
    WITH {_DOC_TOKENS_CTE},
    stats AS (
        SELECT word,
               count(DISTINCT doc_id)::BIGINT AS df,
               round(ln((SELECT count(*) FROM documents)::DOUBLE
                        / (count(DISTINCT doc_id) + 1)), 6) AS idf
        FROM tok GROUP BY word
    )
    SELECT word, idf, {cs.average_rank_sql('idf')}
    FROM stats
    """,
)
def idf_average_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: tied idf values get the MEAN of their ordinal ranks
    (pandas ``Series.rank()`` semantics, text_process_v5.py:157)."""
    df = tf_df_idf(spark, sf_dir).select("word", "idf")
    return cs.average_rank(df, "idf")


# ---------------------------------------------------------------------------
# 4. Top-k vocabulary with rank ids (O3)
# ---------------------------------------------------------------------------
_VOCAB_CFG = CorpusStatsConfig(vocab_top_n=30, vocab_min_freq=3)


@register(
    "vocab_topk",
    f"""
    WITH utok AS (
        SELECT doc_id, upper(unnest({_TOK})) AS word FROM documents
    ),
    freq AS (
        SELECT word, count(*)::BIGINT AS tf FROM utok GROUP BY word
    ),
    ranked AS (
        SELECT word, tf,
               row_number() OVER (ORDER BY tf DESC, word ASC)::BIGINT AS rank_id
        FROM freq WHERE tf >= {_VOCAB_CFG.vocab_min_freq}
    )
    SELECT word, tf, rank_id FROM ranked
    WHERE rank_id <= {_VOCAB_CFG.vocab_top_n}
    """,
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: upper-cased tokens (sna_analysis.py:74) → top-n by frequency
    with deterministic tie-break; TakeOrderedAndProject, no full sort."""
    docs = load_table(spark, sf_dir, "documents")
    tok = cs.explode_tokens(docs, "doc_id", "text", upper=True)
    freq = tok.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    return cs.vocabulary(
        freq, top_n=_VOCAB_CFG.vocab_top_n, min_freq=_VOCAB_CFG.vocab_min_freq
    )


# ---------------------------------------------------------------------------
# 5. IDF quantile cutoff × alpha (A11) — the stop-word discovery rule
# ---------------------------------------------------------------------------
_STATS_CFG = CorpusStatsConfig()


@register(
    "idf_quantile_cutoff",
    f"""
    WITH {_DOC_TOKENS_CTE},
    stats AS (
        SELECT word,
               round(ln((SELECT count(*) FROM documents)::DOUBLE
                        / (count(DISTINCT doc_id) + 1)), 6) AS idf
        FROM tok GROUP BY word
    ),
    cut AS (
        SELECT quantile_cont(idf, {_STATS_CFG.quantile_q}) * {_STATS_CFG.alpha} AS cutoff
        FROM stats
    )
    SELECT round(cut.cutoff, 6) AS cutoff,
           count(*) FILTER (WHERE stats.idf >= cut.cutoff)::BIGINT AS n_survivors
    FROM stats, cut
    GROUP BY cut.cutoff
    """,
)
def idf_quantile_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: exact interpolated percentile(0.25) × alpha=0.9
    (sna_analysis.py:174-184) + surviving-word count."""
    stats = tf_df_idf(spark, sf_dir).select("idf")
    cut = cs.quantile_cutoff(stats, "idf", _STATS_CFG.quantile_q, _STATS_CFG.alpha)
    return (
        stats.crossJoin(F.broadcast(cut))
        .groupBy("cutoff")
        .agg(
            F.count(F.when(F.col("idf") >= F.col("cutoff"), 1)).cast("bigint").alias("n_survivors")
        )
        .select(F.round("cutoff", 6).alias("cutoff"), "n_survivors")
    )


# ---------------------------------------------------------------------------
# 6. Major POS per word (A8/W1) via the deterministic rule tagger
# ---------------------------------------------------------------------------
@register(
    "major_pos",
    f"""
    WITH {_DOC_TOKENS_CTE},
    tagged AS (
        SELECT word, {tagger.tag_word_sql('word')} AS tag FROM tok
    ),
    counted AS (
        SELECT word, tag, count(*)::BIGINT AS cnt FROM tagged GROUP BY word, tag
    )
    SELECT word, tag AS major_pos, cnt FROM (
        SELECT word, tag, cnt,
               row_number() OVER (PARTITION BY word ORDER BY cnt DESC, tag ASC) AS rn
        FROM counted
    ) WHERE rn = 1
    """,
)
def major_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: argmax POS tag per word (text_process_v5.py:98-119)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = cs.explode_tokens(docs, "doc_id", "text")
    tagged = tok.withColumn("tag", tagger.tag_word(F.col("word")))
    return cs.major_tag(tagged)


# ---------------------------------------------------------------------------
# 7. Word-level keep/drop verdict — the reference's core rule
#    keep ⇔ idf_rank >= K ∧ major_pos ∉ stop_pos ∧ len(word) > 1
# ---------------------------------------------------------------------------
_KEEP_K = 10.0  # text_process_v6.py:168 variant (v5 uses 100)
_STOP3_SQL = ", ".join(f"'{t}'" for t in stop_pos(3))


@register(
    "word_keep_verdict",
    f"""
    WITH {_DOC_TOKENS_CTE},
    stats AS (
        SELECT word,
               round(ln((SELECT count(*) FROM documents)::DOUBLE
                        / (count(DISTINCT doc_id) + 1)), 6) AS idf
        FROM tok GROUP BY word
    ),
    ranked AS (
        SELECT word, idf, {cs.average_rank_sql('idf')} FROM stats
    ),
    tagged AS (
        SELECT word, {tagger.tag_word_sql('word')} AS tag FROM tok
    ),
    majorp AS (
        SELECT word, tag AS major_pos FROM (
            SELECT word, tag,
                   row_number() OVER (PARTITION BY word
                                      ORDER BY count(*) DESC, tag ASC) AS rn
            FROM tagged GROUP BY word, tag
        ) WHERE rn = 1
    )
    SELECT r.word, r.idf, r.idf_rank, m.major_pos,
           (r.idf_rank >= {_KEEP_K}
            AND m.major_pos NOT IN ({_STOP3_SQL})
            AND length(r.word) > 1) AS keep
    FROM ranked r JOIN majorp m ON r.word = m.word
    """,
)
def word_keep_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's quality filter (text_process_v5.py:164-169 +
    P7 length rule): word survives iff rank, POS and length rules pass."""
    ranked = idf_average_rank(spark, sf_dir)
    mp = major_pos(spark, sf_dir).select("word", "major_pos")
    joined = ranked.join(mp, "word")
    keep = (
        (F.col("idf_rank") >= F.lit(_KEEP_K))
        & ~F.col("major_pos").isin(*stop_pos(3))
        & (F.length("word") > 1)
    )
    return joined.select("word", "idf", "idf_rank", "major_pos", keep.alias("keep"))


# ---------------------------------------------------------------------------
# 8. Document quality profile — flagship Gopher/C4 keep/drop rollup
# ---------------------------------------------------------------------------
_QCFG = QualityConfig()


@register(
    "doc_quality_profile",
    f"""
    WITH scored AS (
        SELECT lang,
               {T.n_words_sql('text')} AS n_words,
               {T.char_count_no_spaces_sql('text')} AS n_token_chars,
               {T.stop_word_count_sql('text')} AS stop_word_count,
               {T.keep_expr_sql('text')} AS keep
        FROM documents
    )
    SELECT lang, keep,
           count(*)::BIGINT AS n_docs,
           round(avg(n_words), 4) AS avg_words,
           round(sum(n_token_chars)::DOUBLE / sum(n_words), 4) AS avg_word_len,
           round(avg(stop_word_count), 4) AS avg_stop_words
    FROM scored
    GROUP BY lang, keep
    """,
)
def doc_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: per-(lang, keep) document counts + integer-exact means."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "lang",
        T.n_words("text").alias("n_words"),
        T.char_count_no_spaces("text").alias("n_token_chars"),
        T.stop_word_count("text").alias("stop_word_count"),
        T.keep_expr("text", _QCFG).alias("keep"),
    )
    return scored.groupBy("lang", "keep").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg("n_words"), 4).alias("avg_words"),
        F.round(F.sum("n_token_chars").cast("double") / F.sum("n_words"), 4).alias(
            "avg_word_len"
        ),
        F.round(F.avg("stop_word_count"), 4).alias("avg_stop_words"),
    )


# ---------------------------------------------------------------------------
# 9/10. Co-occurrence edges + nodes (J1/P3/P4/P11/P12/A2/A3)
# ---------------------------------------------------------------------------
@register(
    "cooccurrence_edges",
    f"""
    WITH tok AS (
        SELECT lang AS ts, source AS actor, unnest({_TOK}) AS word
        FROM documents
    ),
    w AS (
        SELECT ts, actor, word, count(*)::BIGINT AS weight
        FROM tok GROUP BY ts, actor, word
    )
    SELECT a.ts, a.actor AS src, b.actor AS dst,
           round(sum((a.weight + b.weight) / 2.0), 4) AS weight
    FROM w a JOIN w b
      ON a.word = b.word AND a.ts = b.ts AND a.actor <> b.actor
    GROUP BY a.ts, a.actor, b.actor
    """,
)
def cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 flagship self-join: actors (sources) sharing words within a
    ts bucket (lang), edge weight (w_a+w_b)/2 summed per pair."""
    docs = load_table(spark, sf_dir, "documents")
    w = co.actor_word_weights(docs, "lang", "source", "text", "doc_id")
    return co.cooccurrence_edges(w)


@register(
    "cooccurrence_nodes",
    f"""
    WITH tok AS (
        SELECT lang AS ts, source AS actor, unnest({_TOK}) AS word
        FROM documents
    ),
    w AS (
        SELECT ts, actor, word FROM tok GROUP BY ts, actor, word
    )
    SELECT actor AS id, count(*)::BIGINT AS cnt FROM w GROUP BY actor
    """,
)
def cooccurrence_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: node table — distinct (ts, word) rows per actor."""
    docs = load_table(spark, sf_dir, "documents")
    w = co.actor_word_weights(docs, "lang", "source", "text", "doc_id")
    return co.node_table(w)
