"""Behavioral gates for the round-4 monitoring queries.

Value-parity with DuckDB is covered by test_oracle_queries (both are
oracle-backed); these assert the SEMANTICS the oracle can't state:
the recall gate's vanish-on-regression contract and PSI's invariants.
"""

from __future__ import annotations

from textcleaning_spark import queries as Q

SF = "/root/testdata/sf0.01"


def test_minhash_lsh_recall_gate_row_present(spark):
    """At the 0.96 Jaccard threshold the 4x2 banding collides with
    p=1-(1-s^2)^4 > 0.9999, so the gate row must exist with recall
    ~1.0 and a candidate set at least as large as the truth set."""
    rows = Q.queries()["minhash_lsh_recall"](spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.recall >= 0.9  # the in-query gate bound
    assert r.n_hits <= r.n_truth <= r.n_candidates


def test_quality_drift_psi_invariants(spark):
    """PSI is a sum of (p-q)ln(p/q) terms, each nonnegative; every
    (signal, source) cell of the grid must be present and each
    source's n_docs equals the corpus slice."""
    rows = Q.queries()["quality_drift_psi"](spark, SF).collect()
    by_sig = {}
    for r in rows:
        assert r.psi >= 0.0, (r.signal, r.source, r.psi)
        by_sig.setdefault(r.signal, set()).add(r.source)
    assert set(by_sig) == {"log2_tokens", "mean_word_len", "stop_frac"}
    n_sources = len(next(iter(by_sig.values())))
    assert all(len(s) == n_sources for s in by_sig.values())
    # synthetic sf0.01 slices the corpus evenly across 20 sources
    assert {r.n_docs for r in rows} == {25}


def test_vocab_hll_audit_gate_row_present(spark):
    """HLL++ at rsd=0.01 must sit well inside the 5% in-query gate on
    the bigram vocabulary; the row carries the measured error."""
    rows = Q.queries()["vocab_hll_audit"](spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.exact_distinct > 0
    assert abs(r.hll_distinct - r.exact_distinct) * 100 <= r.exact_distinct * 5
    assert r.rel_error <= 0.05
