"""Winnowing fingerprint selection (operators/dedup.winnow_fingerprints).

Pins the Schleimer et al. guarantee the operator's docstring claims:
with k-gram size k and window w, any two documents sharing a token run
of >= k + w - 1 tokens share at least one selected (position-free)
fingerprint hash — so an fp equi-join finds every long-enough overlap.
"""

from __future__ import annotations

from textcleaning_spark.operators import dedup as dd

K, W = 3, 4
GUARANTEE = K + W - 1  # 6 tokens


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = dd.winnow_fingerprints(df, "doc_id", "text", k=K, w=W).collect()
    by_doc: dict[int, set[int]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    return by_doc


def test_shared_run_shares_fingerprint(spark):
    """Two docs sharing a 6-token run (k+w-1) must share a fingerprint
    even when everything around the run differs."""
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"one two three {shared} four five"),
        (2, f"red green {shared} blue yellow purple orange"),
    ]
    fps = _fps(spark, rows)
    assert fps[1] & fps[2], "guaranteed shared fingerprint missing"


def test_disjoint_vocab_no_shared_fingerprint(spark):
    rows = [
        (1, "aa bb cc dd ee ff gg hh"),
        (2, "qq ww rr tt yy uu ii oo"),
    ]
    fps = _fps(spark, rows)
    assert not (fps[1] & fps[2])


def test_short_doc_edges(spark):
    """< k tokens -> no grams -> no fingerprints; k <= tokens < k+w-1
    -> one whole-list window -> exactly one selected fingerprint."""
    rows = [(1, "only two"), (2, "three little words here")]
    fps = _fps(spark, rows)
    assert 1 not in fps
    assert len(fps[2]) == 1  # 2 grams, single clamped window, one min


def test_density_bound(spark):
    """Selected positions are a strict subset of gram positions: at
    most one new selection per window (n - w + 1 windows)."""
    import pyspark.sql.functions as F

    toks = [f"t{i % 17}x{i % 5}" for i in range(60)]
    df = spark.createDataFrame(
        [(1, " ".join(toks))], "doc_id bigint, text string"
    )
    n = (
        dd.winnow_fingerprints(df, "doc_id", "text", k=K, w=W)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()[0]["n"]
    )
    n_grams = 60 - (K - 1)
    n_windows = n_grams - W + 1
    assert 0 < n <= n_windows
