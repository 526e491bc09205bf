"""Golden tests for the end-to-end quality-filter pipeline: keep/drop
F1 vs an independent sequential-pandas implementation and BYTE-IDENTICAL
scrubbed text per url (north_rule contract)."""

from __future__ import annotations

import re

import pandas as pd
import pytest

from textcleaning_spark.config import DEFAULT_CONFIG, STOP_WORDS, QualityConfig
from textcleaning_spark.functions.scrub import scrub_py
from textcleaning_spark.plans.pipeline import metrics_table, run_quality_pipeline
from textcleaning_spark.sources.pages import generate_pages, generate_pages_pdf

N = 400
SEED = 7


# ---------------------------------------------------------------------------
# independent golden implementation (sequential pandas/python)
# ---------------------------------------------------------------------------
def golden_keep(text: str, cfg: QualityConfig) -> bool:
    toks = [t for t in text.split(" ") if t != ""]
    nw = len(toks)
    if nw == 0:
        return False
    mean_len = len(text.replace(" ", "")) / nw
    syms = (text.count("#") + text.count("...")) / nw
    stop_cnt = sum(1 for t in toks if t.lower() in STOP_WORDS)
    # [^\W\d_] ≡ any Unicode letter in Python re — mirrors \p{L} on
    # the Spark/DuckDB side
    alpha = sum(1 for t in toks if re.search(r"[^\W\d_]", t)) / nw
    lines = [l for l in text.split("\n") if l != ""]
    dup = (len(lines) - len(set(lines))) / len(lines) if lines else 0.0
    grams = [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
    dupg = (len(grams) - len(set(grams))) / len(grams) if grams else 0.0
    ell = (
        sum(1 for l in lines if l.endswith("...")) / len(lines) if lines else 0.0
    )
    return (
        cfg.min_words <= nw <= cfg.max_words
        and cfg.min_mean_word_len <= mean_len <= cfg.max_mean_word_len
        and syms <= cfg.max_symbol_to_word_ratio
        and stop_cnt >= cfg.min_stop_word_count
        and dup <= cfg.max_dup_line_frac
        and dupg <= cfg.max_dup_ngram_frac
        and alpha >= cfg.min_alpha_word_frac
        and ell <= cfg.max_ellipsis_line_frac
    )


@pytest.fixture(scope="module")
def golden() -> pd.DataFrame:
    pdf = generate_pages_pdf(N, SEED)
    cfg = DEFAULT_CONFIG
    pdf["keep"] = pdf["text"].map(lambda t: golden_keep(t, cfg.quality))
    pdf["scrubbed_text"] = pdf.apply(
        lambda r: scrub_py(r["text"], cfg.scrub) if r["keep"] else None, axis=1
    )
    return pdf


@pytest.fixture(scope="module")
def pipeline_out(spark) -> pd.DataFrame:
    pages = generate_pages(spark, N, SEED, partitions=8)
    return run_quality_pipeline(pages).toPandas()


def test_generator_covers_all_classes(golden):
    # both verdicts must be exercised, with a realistic keep majority
    n_keep = int(golden["keep"].sum())
    assert 0 < n_keep < N
    assert n_keep > N * 0.5


def test_keep_f1_against_golden(golden, pipeline_out):
    merged = golden[["url", "keep"]].merge(
        pipeline_out[["url", "keep"]], on="url", suffixes=("_g", "_s")
    )
    assert len(merged) == N
    tp = int(((merged.keep_g) & (merged.keep_s)).sum())
    fp = int((~merged.keep_g & merged.keep_s).sum())
    fn = int((merged.keep_g & ~merged.keep_s).sum())
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f"keep/drop F1 {f1} (fp={fp}, fn={fn})"


def test_scrubbed_text_byte_identical(golden, pipeline_out):
    merged = golden[["url", "scrubbed_text"]].merge(
        pipeline_out[["url", "scrubbed_text"]], on="url", suffixes=("_g", "_s")
    )
    kept = merged[merged.scrubbed_text_g.notna()]
    assert len(kept) > 0
    mismatch = kept[kept.scrubbed_text_g != kept.scrubbed_text_s]
    assert len(mismatch) == 0, mismatch.head(3).to_dict("records")


def test_scrub_removes_all_pii(pipeline_out):
    kept = pipeline_out[pipeline_out.keep]
    pii_pat = re.compile(
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
        r"|\b\d{3}-\d{2}-\d{4}\b"
        r"|\b(?:\d{1,3}\.){3}\d{1,3}\b"
    )
    bad = kept[kept.scrubbed_text.map(lambda t: bool(pii_pat.search(t or "")))]
    assert len(bad) == 0, bad[["url", "scrubbed_text"]].head(3).to_dict("records")


def test_langid_on_clean_docs(pipeline_out):
    clean = pipeline_out[pipeline_out.keep & (pipeline_out.n_words >= 20)]
    acc = (clean.pred_lang == clean.lang).mean()
    assert acc >= 0.9, f"langid accuracy {acc}"


def test_metrics_table(spark, pipeline_out):
    pages = generate_pages(spark, N, SEED, partitions=8)
    scored = run_quality_pipeline(pages)
    m = metrics_table(scored).toPandas()
    assert int(m.n_docs.sum()) == N
    assert int(m.n_keep.sum()) == int(pipeline_out.keep.sum())
    # planted PII (class 8) must be visible in the metrics
    assert int(m.pii_email.sum() + m.pii_phone.sum() + m.pii_ssn.sum() + m.pii_ipv4.sum()) > 0


def test_repetition_ngram_rule(spark):
    """Gopher repetition rule: phrase-level boilerplate INSIDE one line
    (invisible to line dedup) must drop with reason dup_ngrams."""
    from textcleaning_spark.operators.quality import drop_reasons, score_documents

    spam = ("buy cheap now " * 30).strip() + " the end"
    clean = "the stream filter window shows a quality table for each document"
    df = spark.createDataFrame([(1, spam), (2, clean)], ["doc_id", "text"])
    out = drop_reasons(score_documents(df, "text")).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert not by_id[1]["keep"] and "dup_ngrams" in by_id[1]["drop_reasons"]
    assert by_id[2]["keep"]
    assert by_id[1]["dup_ngram_frac"] > 0.9


def test_keep_iff_no_drop_reasons(spark):
    """keep (computed from UNROUNDED ratios) and drop_reasons (computed
    from the published 6-decimal-rounded signals) must agree on every
    document: keep == (no rule fired). The two paths could diverge only
    for a ratio within 5e-7 of a threshold; this corpus-wide check on
    both synthetic corpora documents that the invariant holds and
    catches any future rule added to one path but not the other."""
    from textcleaning_spark.operators.quality import drop_reasons, score_documents
    from textcleaning_spark.sources.pages import generate_pages
    from pyspark.sql import functions as F

    for df in (
        generate_pages(spark, 2000, seed=77, partitions=4),
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet"),
    ):
        out = drop_reasons(score_documents(df, "text"))
        n_bad = out.filter(
            F.col("keep") != (F.size("drop_reasons") == 0)
        ).count()
        assert n_bad == 0
