"""In-plan Bernoulli-Naive-Bayes quality classifier distilled from the
rule verdict.

The fastText-style move real pipelines make (CCNet, DSIR, Llama/Gopher
data work — all public): heuristic rules label a corpus, a cheap linear
classifier is trained on those labels, and the classifier generalizes
the verdict to text the rules were not tuned on. Here BOTH phases are
single Spark plans — no model file, no Python loop:

* TRAIN: one token explode + one aggregation computes per-token
  keep/drop document frequencies; Laplace-smoothed log-probabilities
  per token for both the present and the absent case.
* SCORE: full Bernoulli NB, absent-token mass included, via the exact
  rearrangement ``score(doc) = prior + Σ_vocab absent(w) +
  Σ_{w∈doc} (present(w) − absent(w))`` — the vocabulary-wide constant
  is one integer sum over the (bounded) log-odds table, and the
  per-document part is a broadcast join + integer sum. Without the
  absent mass the classifier collapses to the class prior under a
  skewed keep rate (measured: 90% keep → predicts keep always).

Determinism across engines (the DuckDB oracle must value-match): a
floating sum over tokens is order-dependent and ln() may differ in the
last ulp between engines, so each per-token term is ROUNDED to 6
decimals and lifted to exact integer micro-units (×10⁶ BIGINT — round
again before the cast: Spark's double→bigint cast truncates while
DuckDB's rounds, so the ±1-ulp residue of ``round(x,6)*1e6`` must be
squashed first); every downstream sum is then an integer sum
(order-free) and the keep prediction is an integer sign test. This is
the repo-wide round-any-transcendental rule applied to a model.

Scale shape: the distinct (doc, word) pairs are built ONCE
(``doc_tokens``) and shared by train and score; train is one shuffle
on word, the log-odds table is vocabulary-sized (bounded, Zipf) and
broadcast for scoring, so scoring is a shuffle-free map over the token
pairs plus one groupBy(doc). Reference analogue: the reference's
keep/drop rule chain is the teacher (text_process_v5.py:164-169); the
classifier is the engine's own generalization layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from textcleaning_spark.functions.text import tokens


def _micro(col) -> F.Column:
    """Exact integer micro-units of an already-round(x, 6) double."""
    return F.round(col * 1_000_000, 0).cast("bigint")


def doc_tokens(
    labeled: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "keep",
) -> DataFrame:
    """Distinct (doc, word) pairs with the rule label — the Bernoulli NB
    event model's input, materialized once and shared by train + score
    (the CLAUDE.md single-materialization invariant). Empty documents
    drop out here; scoring restores them via a left join."""
    return labeled.select(
        doc_col,
        label_col,
        F.explode(F.array_distinct(tokens(text_col))).alias("word"),
    )


def train_log_odds(
    tok: DataFrame, labeled: DataFrame, label_col: str = "keep"
) -> DataFrame:
    """Per-token Bernoulli log-odds terms in integer micro-units.

    With ``p_k(w) = (nk+1)/(nkeep+2)`` and ``p_d(w) = (nd+1)/(ndrop+2)``
    (Laplace), emits ``present_micro = round(ln(p_k) − ln(p_d), 6)·10⁶``
    and ``absent_micro = round(ln(1−p_k) − ln(1−p_d), 6)·10⁶``; nk/nd
    are the number of keep/drop documents containing w and nkeep/ndrop
    the class document totals (carried on every row so scoring needs no
    second pass over the corpus)."""
    counts = tok.groupBy("word").agg(
        F.sum(F.when(F.col(label_col), 1).otherwise(0)).alias("nk"),
        F.sum(F.when(F.col(label_col), 0).otherwise(1)).alias("nd"),
    )
    totals = labeled.agg(
        F.sum(F.when(F.col(label_col), 1).otherwise(0)).alias("nkeep"),
        F.sum(F.when(F.col(label_col), 0).otherwise(1)).alias("ndrop"),
    )
    present = F.round(
        F.log((F.col("nk") + 1) / (F.col("nkeep") + 2))
        - F.log((F.col("nd") + 1) / (F.col("ndrop") + 2)),
        6,
    )
    absent = F.round(
        F.log((F.col("nkeep") + 1 - F.col("nk")) / (F.col("nkeep") + 2))
        - F.log((F.col("ndrop") + 1 - F.col("nd")) / (F.col("ndrop") + 2)),
        6,
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "word",
        _micro(present).alias("present_micro"),
        _micro(absent).alias("absent_micro"),
        "nkeep",
        "ndrop",
    )


def score_documents_nb(
    labeled: DataFrame,
    tok: DataFrame,
    log_odds: DataFrame,
    doc_col: str = "doc_id",
    label_col: str = "keep",
) -> DataFrame:
    """Posterior integer log-odds per document under full Bernoulli NB:
    ``const + Σ_{w∈doc} (present_micro − absent_micro)`` where ``const``
    is the class prior plus the vocabulary-wide absent mass (both exact
    integer sums over the bounded log-odds table); ``nb_keep`` is the
    sign test. Tokens unseen at train time contribute 0 (the inner join
    drops them, keeping the score a pure function of the trained
    table); docs with no trained token score ``const`` alone."""
    scored = (
        tok.join(
            F.broadcast(
                log_odds.select(
                    "word",
                    (F.col("present_micro") - F.col("absent_micro")).alias(
                        "w_micro"
                    ),
                )
            ),
            "word",
        )
        .groupBy(doc_col)
        .agg(F.sum("w_micro").alias("tok_micro"))
    )
    prior = (
        log_odds.select(
            _micro(
                F.round(F.log((F.col("nkeep") + 1) / (F.col("ndrop") + 1)), 6)
            ).alias("prior_micro")
        )
        .limit(1)
    )
    base = log_odds.agg(F.sum("absent_micro").alias("base_micro"))
    const = prior.crossJoin(F.broadcast(base)).select(
        (F.col("prior_micro") + F.col("base_micro")).alias("const_micro")
    )
    docs = labeled.select(doc_col, F.col(label_col).alias("rule_keep"))
    score = F.coalesce(F.col("tok_micro"), F.lit(0).cast("bigint")) + F.col(
        "const_micro"
    )
    return (
        docs.crossJoin(F.broadcast(const))
        .join(scored, doc_col, "left")
        .select(
            F.col(doc_col),
            "rule_keep",
            score.alias("score_micro"),
            (score > 0).alias("nb_keep"),
        )
    )
