"""Driver-window invariants (no Spark session needed).

The round driver records correctness rows for only the FIRST 50
entries of queries() in iteration order. These tests pin the rotation
so a future registration can't silently push a stale (least-recently
driver-verified) query out of the window.
"""

from __future__ import annotations

from textcleaning_spark import queries as Q

# Round-5 window: the 11 late-r4 entries that have NEVER had a driver
# row lead (VERDICT r4 item 1), then every entry whose last driver row
# is r3 (the r4 back list — queries.py has grown thousands of lines
# since r3 HEAD), then the one query new in round 5.
MUST_BE_IN_WINDOW = [
    # late-r4 registry entries awaiting their FIRST driver row
    "host_link_graph",
    "host_pagerank",
    "tokenizer_fertility",
    "script_mix_profile",
    "host_harmonic_exact",
    "cms_heavy_hitters",
    "decontam_bloom_prefilter",
    "token_budget_allocation",
    "hyperball_centrality_audit",
    "bpe_merge_table",
    "bpe_fertility",
    # last driver-verified at r3 HEAD (the r4 back list)
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
    "simhash_near_dup",
    "revenue_share_suppliers",
    "winnow_fingerprints",
    "source_quality_filter",
    "nb_quality_confusion",
    "customer_order_distribution",
    "large_volume_orders",
    "dormant_high_balance",
    "sequence_packing",
    "nb_holdout_confusion",
    "stratified_sample",
    "training_mix_report",
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
    # new in round 5
    "noindex_politeness_filter",
]


def test_registry_size():
    # The rotation comment in queries.py reasons about window budgets
    # from this number — pin it so the comment can't drift (ADVICE r3).
    # 110 at the r4 HEAD + noindex_politeness_filter,
    # robots_longest_match, cc_luhn_scrub_audit (round 5).
    assert len(Q.queries()) == 113


def test_window_is_exactly_the_front_50():
    assert len(MUST_BE_IN_WINDOW) == 50
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
    # (frozen per VERDICT r4 item 8 — grow only with a documented
    # structural justification: Spark-internal hashing, GK sketches,
    # iterative training, numpy codecs)
    rows_only = sorted(set(qs) - set(osql))
    assert rows_only == [
        "ann_ivf_topk",
        "ann_lsh_topk",
        "ann_recall_vs_bruteforce",
        "bpe_fertility",
        "bpe_merge_table",
        "embedding_near_dup_fast",
        "hyperball_centrality_audit",
        "media_feature_profile",
        "ppl_cutoff_routing",
        "vocab_hll_audit",
    ]


def test_window_lists_name_real_queries():
    qs = set(Q.queries())
    for n in Q._WINDOW_FRONT + Q._WINDOW_BACK:
        assert n in qs, f"window rotation names unknown query {n}"
