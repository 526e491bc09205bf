"""ANN quality: hyperplane-LSH top-k recall vs the brute-force oracle.

Note: the synthetic embeddings are unclustered uniform vectors (mean
same-label cosine ≈ 0.002) — the hardest case for LSH. Recall numbers
here validate the probability math (p_collide = (1-θ/π)^planes per
table), not production tuning; with real clustered embeddings the same
code gets high recall with far fewer comparisons.
"""

from __future__ import annotations

from textcleaning_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signature,
    token_jaccard_pairs,
)
from textcleaning_spark.operators.similarity import (
    cosine_topk_bruteforce,
    hyperplane_lsh_topk,
)
from textcleaning_spark.sources.registry import load_table
from tests.conftest import SF_ORACLE


def test_lsh_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    exact = cosine_topk_bruteforce(emb, k=5).collect()
    approx = hyperplane_lsh_topk(emb, k=5, n_planes=4, n_tables=8).collect()
    truth = {(r["query_id"], r["item_id"]) for r in exact}
    found = {(r["query_id"], r["item_id"]) for r in approx}
    recall = len(truth & found) / len(truth)
    # top-5 neighbors in this cloud sit at cos≈0.4-0.5 (θ≈62°):
    # p ≈ 1-(1-(1-θ/π)^4)^8 ≈ 0.75 — assert comfortably below that
    assert recall >= 0.5, f"LSH recall {recall}"
    # approx scores must be a subset of true cosine values (no made-up
    # similarities — only candidate pruning)
    exact_scores = {(r["query_id"], r["item_id"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["item_id"])
        if key in exact_scores:
            assert abs(r["cosine"] - exact_scores[key]) < 1e-9


def test_minhash_lsh_finds_true_near_dups(spark):
    """Candidate generation must recall (nearly) all true near-dup
    pairs: P(collide) = 1-(1-j^2)^bands ≈ 1.0 at j ≥ 0.96."""
    docs = load_table(spark, SF_ORACLE, "documents")
    true_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in token_jaccard_pairs(docs, "doc_id", "text", 0.96).collect()
    }
    sigs = minhash_signature(docs, "doc_id", "text", k=8)
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(sigs, "doc_id", k=8, bands=4).collect()
    }
    assert true_pairs, "fixture should contain near-dup pairs"
    recall = len(true_pairs & cands) / len(true_pairs)
    assert recall >= 0.9, f"near-dup candidate recall {recall}"
    n = docs.count()
    assert len(cands) < n * (n - 1) / 2  # strictly prunes the pair space


def test_near_dup_blocked_matches_exact(spark):
    """GEMM path finds the same pairs with the same cosines (±1 ulp at
    the 6th decimal) as the oracle-exact sequential fold."""
    from tests.conftest import SF_ORACLE
    from textcleaning_spark.operators import similarity as sim
    from textcleaning_spark.sources.registry import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings")
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in sim.cosine_near_dup_pairs(emb, threshold=0.35).collect()
    }
    fast = {
        (r.id_a, r.id_b): r.cosine
        for r in sim.cosine_near_dup_blocked(emb, threshold=0.35).collect()
    }
    assert exact, "threshold too high — empty comparison"
    # identical key sets except possible boundary pairs within 1e-6
    only_exact = {k for k in exact if k not in fast}
    only_fast = {k for k in fast if k not in exact}
    for k in only_exact:
        assert abs(exact[k] - 0.35) < 2e-6, (k, exact[k])
    for k in only_fast:
        assert abs(fast[k] - 0.35) < 2e-6, (k, fast[k])
    for k in set(exact) & set(fast):
        assert abs(exact[k] - fast[k]) <= 1e-6, (k, exact[k], fast[k])


def test_near_dup_blocked_byte_budget_routes_high_dim(spark):
    """Round-3 verdict fix: the broadcast gate is sized in BYTES, not
    vectors. A frame that passes the vector-count cap but exceeds the
    byte budget (n × dim × 8) must route to the IVF-cell path — i.e.
    results equal the forced-IVF run, not the broadcast run's exact
    pair set."""
    from textcleaning_spark.operators import similarity as sim

    emb = load_table(spark, SF_ORACLE, "embeddings")
    n = emb.count()
    dim = len(emb.select("embedding").first()["embedding"])
    # budget one byte below the actual matrix size: count gate passes,
    # byte gate must fire
    tight = n * dim * 8 - 1
    routed = {
        (r.id_a, r.id_b): r.cosine
        for r in sim.cosine_near_dup_blocked(
            emb, threshold=0.35, broadcast_max_bytes=tight
        ).collect()
    }
    forced_ivf = {
        (r.id_a, r.id_b): r.cosine
        for r in sim.cosine_near_dup_blocked(
            emb, threshold=0.35, broadcast_max_vectors=0
        ).collect()
    }
    assert routed == forced_ivf
    # and with the budget exactly at the matrix size the broadcast path
    # runs (superset of IVF recall: broadcast is exact)
    exact = {
        (r.id_a, r.id_b)
        for r in sim.cosine_near_dup_blocked(
            emb, threshold=0.35, broadcast_max_bytes=n * dim * 8
        ).collect()
    }
    assert set(forced_ivf) <= exact


def test_lsh_hot_bucket_cap_bounds_degenerate_corpus(spark):
    """Adversarial constant-vector corpus: every row lands in ONE
    bucket per table (identical sign pattern), where widening n_planes
    cannot help — the per-bucket cap must bound the GEMM. With cap C,
    each bucket scores only its C lowest ids, so no O(N²) task runs and
    only those ids can appear as queries."""
    from textcleaning_spark.operators.similarity import hyperplane_lsh_topk

    n, cap = 500, 50
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = hyperplane_lsh_topk(
        emb, k=3, n_planes=4, n_tables=2, dim=4, bucket_cap=cap
    ).collect()
    qids = {r["query_id"] for r in out}
    iids = {r["item_id"] for r in out}
    assert qids <= set(range(cap)), f"scored beyond the cap: {sorted(qids)[-5:]}"
    assert iids <= set(range(cap))
    assert len(qids) == cap  # the kept ids all got neighbors (cos=1)
    for r in out:
        assert abs(r["cosine"] - 1.0) < 1e-9


def test_lsh_auto_n_planes_targets_bucket_size(spark):
    """n_planes=None derives ceil(log2(N / target)) and still returns
    valid top-k rows (subset-of-true-cosines property)."""
    from textcleaning_spark.operators.similarity import hyperplane_lsh_topk

    emb = load_table(spark, SF_ORACLE, "embeddings")
    out = hyperplane_lsh_topk(
        emb, k=3, n_planes=None, n_tables=4, target_bucket_rows=64
    )
    rows = out.collect()
    assert rows
    w = {}
    for r in rows:
        w.setdefault(r["query_id"], []).append(r["rn"])
    for q, rns in w.items():
        assert sorted(rns) == list(range(1, len(rns) + 1)), q


def test_near_dup_blocked_gate_routes_to_ivf_cells(spark):
    """Above the broadcast budget the GEMM near-dup must NOT collect
    the corpus: it routes through per-IVF-cell scoring. Recall vs the
    exact pair set stays high (near-dup pairs land in co-probed cells)
    and every reported cosine is a true cosine (pruning-only error)."""
    from textcleaning_spark.operators import similarity as sim

    emb = load_table(spark, SF_ORACLE, "embeddings")
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in sim.cosine_near_dup_pairs(emb, threshold=0.35).collect()
    }
    routed = {
        (r.id_a, r.id_b): r.cosine
        for r in sim.cosine_near_dup_blocked(
            emb, threshold=0.35, broadcast_max_vectors=0
        ).collect()
    }
    assert exact
    found = set(exact) & set(routed)
    recall = len(found) / len(exact)
    assert recall >= 0.6, f"IVF-cell near-dup recall {recall}"
    for k in routed:
        if k in exact:
            assert abs(routed[k] - exact[k]) <= 1e-6
        else:
            # boundary-only novelty: GEMM rounding at the threshold
            assert abs(routed[k] - 0.35) < 2e-6, (k, routed[k])


def test_ann_recall_gate_both_rows_survive(spark):
    """The in-query recall gate (round 3): both method rows must clear
    recall@5 >= 0.9 and therefore survive the filter — the driver's
    rows-only count of 2 IS the gate."""
    from textcleaning_spark.queries import ann_recall_vs_bruteforce

    rows = ann_recall_vs_bruteforce(spark, SF_ORACLE).collect()
    assert {r["method"] for r in rows} == {"lsh", "ivf"}
    for r in rows:
        assert r["recall_at_5"] >= 0.9, r
