"""Bernoulli-NB quality classifier: semantic properties beyond the
oracle hash (tests/test_oracle_queries.py covers value parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from textcleaning_spark.config import QualityConfig
from textcleaning_spark.operators import classifier as clf
from textcleaning_spark.operators import quality as q
from textcleaning_spark.sources.registry import load_table


def _scored(spark):
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    labeled = q.score_documents(docs, "text", QualityConfig()).select(
        "doc_id", "text", "keep"
    )
    tok = clf.doc_tokens(labeled)
    lo = clf.train_log_odds(tok, labeled)
    return clf.score_documents_nb(labeled, tok, lo)


def test_classifier_learns_the_rule_verdict(spark):
    """Trained on its own labels, full Bernoulli NB (absent-token mass
    included) must beat both trivial baselines: ≥85% agreement with the
    teacher AND both classes actually predicted — a prior-only or
    present-terms-only scorer predicts keep always at the corpus's 91%
    keep rate (the round-3 regression this test pins)."""
    agg = (
        _scored(spark)
        .groupBy("rule_keep", "nb_keep")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    cells = {(r.rule_keep, r.nb_keep): r.n for r in agg}
    total = sum(cells.values())
    agree = cells.get((True, True), 0) + cells.get((False, False), 0)
    assert total == 500
    assert agree / total >= 0.85
    n_pred_drop = cells.get((True, False), 0) + cells.get((False, False), 0)
    assert n_pred_drop > 0, "degenerate classifier: never predicts drop"


def test_every_document_scored_exactly_once(spark):
    """The left join restores token-less docs and duplicates none."""
    scored = _scored(spark)
    assert scored.count() == 500
    assert scored.select("doc_id").distinct().count() == 500
    assert scored.filter(F.col("score_micro").isNull()).count() == 0


def test_holdout_generalization(spark):
    """Trained on the deterministic 10% split, the classifier must
    still beat the trivial always-keep baseline on the 90% holdout:
    ≥80% agreement and a non-empty predicted-drop class."""
    from textcleaning_spark.queries import queries

    agg = (
        queries()["nb_holdout_confusion"](spark, SF_ORACLE)
        .collect()
    )
    cells = {(r.rule_keep, r.nb_keep): r.n_docs for r in agg}
    total = sum(cells.values())
    agree = cells.get((True, True), 0) + cells.get((False, False), 0)
    assert 400 <= total < 500  # the holdout, not the full corpus
    assert agree / total >= 0.80
    assert cells.get((False, False), 0) > 0
