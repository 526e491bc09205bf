"""connected_components: min-label propagation fixpoint semantics."""

from __future__ import annotations

from textcleaning_spark.operators.dedup import connected_components


import pytest


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
