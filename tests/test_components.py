"""connected_components: min-label propagation fixpoint semantics."""

from __future__ import annotations

from textcleaning_spark.operators.dedup import connected_components


import pytest


def test_default_threshold_comes_from_config(spark, monkeypatch):
    """driver_threshold defaults to config.CC_DRIVER_THRESHOLD; pinning
    the config to 0 forces the distributed min-label path (observable:
    createDataFrame output of the union-find has exactly 1 partition
    is NOT relied on — instead we assert via the non-convergence guard,
    which only the distributed loop has)."""
    import textcleaning_spark.config as cfg

    monkeypatch.setattr(cfg, "CC_DRIVER_THRESHOLD", 0)
    # long chain + max_iter=1: the distributed loop cannot converge in
    # one round and must RAISE (the driver union-find would succeed) —
    # proving both the config hookup and the convergence guard.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7)],
        "doc_a long, doc_b long",
    )
    with pytest.raises(Exception, match="did not converge"):
        connected_components(pairs, "doc_a", "doc_b", max_iter=1).collect()


def test_nonconvergence_raises(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8)],
        "doc_a long, doc_b long",
    )
    with pytest.raises(Exception, match="did not converge"):
        connected_components(
            pairs, "doc_a", "doc_b", max_iter=1, driver_threshold=0
        ).collect()


@pytest.mark.parametrize("driver_threshold", [1_000_000, 0])
def test_components_chain_triangle_pair(spark, driver_threshold):
    # chain 1-2-3-4-5 (forces multi-round propagation), triangle
    # 10-11-12 (+ redundant edge), isolated pair 20-21
    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4), (4, 5),
            (10, 11), (11, 12), (10, 12),
            (20, 21),
        ],
        "doc_a long, doc_b long",
    )
    got = {
        (r["node"], r["comp"])
        for r in connected_components(
            pairs, "doc_a", "doc_b", driver_threshold=driver_threshold
        ).collect()
    }
    want = {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }
    assert got == want
