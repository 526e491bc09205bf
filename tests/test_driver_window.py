"""Driver-window invariants (no Spark session needed).

The round driver records correctness rows for only the FIRST 50
entries of queries() in iteration order. These tests pin the rotation
so a future registration can't silently push a not-yet-driver-verified
query out of the window.
"""

from __future__ import annotations

from textcleaning_spark import queries as Q

# Oracle-backed queries with no CORRECTNESS_r01/r02 row (VERDICT r2
# item 1) plus everything added in round 3 — all must receive their
# first driver row this round.
MUST_BE_IN_WINDOW = [
    "volume_shipping",
    "priority_class_by_returnflag",
    "small_quantity_revenue",
    "incremental_upsert",
    "near_dup_clusters",
    "events_in_purchase_windows",
    "deterministic_sample",
    "curriculum_selection",
    "boilerplate_line_scrub",
    "rule_hit_profile",
    "sole_late_supplier",
    "span_contamination",
    "media_feature_profile",
    # round 3
    "source_quality_filter",
    "nb_quality_confusion",
    "nb_holdout_confusion",
    "stratified_sample",
    "training_mix_report",
    "sequence_packing",
    "dedup_keep_verdict",
    "lang_sampling_weights",
    "url_canonical_dedup",
    "token_count_histogram",
    "top_supplier_revenue",
    "promo_brand_revenue",
    "returned_item_customers",
    "discount_revenue_forecast",
    "ppl_tertile_routing",
    "benchmark_decontam",
    "nation_market_share",
    "host_keep_profile",
    "vocab_growth_curve",
]


def test_unverified_queries_inside_driver_window():
    first50 = list(Q.queries())[:50]
    missing = [n for n in MUST_BE_IN_WINDOW if n not in first50]
    assert not missing, f"pushed out of the driver's 50-entry window: {missing}"


def test_queries_and_oracles_consistent():
    qs, osql = Q.queries(), Q.oracle_sql()
    # every oracle belongs to a registered query, same relative order
    assert set(osql) <= set(qs)
    q_order = [n for n in qs if n in osql]
    assert q_order == list(osql)
    # rows-only entries are the known approximations, nothing else
    rows_only = sorted(set(qs) - set(osql))
    assert rows_only == [
        "ann_ivf_topk",
        "ann_lsh_topk",
        "ann_recall_vs_bruteforce",
        "embedding_near_dup_fast",
        "media_feature_profile",
    ]


def test_window_lists_name_real_queries():
    qs = set(Q.queries())
    for n in Q._WINDOW_FRONT + Q._WINDOW_BACK:
        assert n in qs, f"window rotation names unknown query {n}"
