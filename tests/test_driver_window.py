"""Driver-window invariants (no Spark session needed).

The round driver records correctness rows for only the FIRST 50
entries of queries() in iteration order. These tests pin the rotation
so a future registration can't silently push a stale (least-recently
driver-verified) query out of the window.
"""

from __future__ import annotations

from textcleaning_spark import queries as Q

# Round-4 window: every entry whose last driver row predates round 3
# (the 21 oracle-backed entries rotated out in r3, the 13 mid entries
# past the r3 cutoff, the 4 rows-only ANN approximations) plus every
# query new in round 4 — all must receive a driver row this round.
MUST_BE_IN_WINDOW = [
    # oracle-backed, last driver-verified r1/r2 (old back list)
    "char_bigram_ppl",
    "rollup_revenue",
    "langid_marker_confusion",
    "shipping_priority",
    "late_shipment_priorities",
    "shingle_near_dup",
    "doc_fingerprints",
    "embedding_near_dup",
    "lang_route_counts",
    "vocab_topk",
    "event_day_labels",
    "event_props_stats",
    "keyword_hits",
    "vocab_setops",
    "subtoken_counts",
    "doc_length_deciles",
    "events_lead_lag",
    "routed_union_profile",
    "idf_descriptive_stats",
    "idf_quantile_cutoff",
    "major_pos",
    # oracle-backed mid entries that fell past the r3 cutoff
    "near_dup_jaccard",
    "embedding_topk",
    "cube_profile",
    "scrub_parity",
    "stem_surface_forms",
    "cleaned_text",
    "vocab_semijoin_counts",
    "stopword_antijoin_counts",
    "simhash_fingerprints",
    "lsh_candidate_pairs",
    "nlp_tag_distribution",
    "idf_alpha_sweep",
    "asof_event_orders",
    # rows-only ANN approximations, last driver-seen r1/r2
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_recall_vs_bruteforce",
    "embedding_near_dup_fast",
    # new in round 4
    "ppl_cutoff_routing",
    "incremental_crawl_dedup",
    "dsir_selection",
    "semdedup_keep",
    "pipeline_funnel",
    "minhash_lsh_recall",
    "quality_drift_psi",
    "nb_calibration",
    "vocab_hll_audit",
    "rule_ablation",
    "span_novelty",
]


def test_registry_size():
    # The rotation comment in queries.py reasons about window budgets
    # from this number — pin it so the comment can't drift (ADVICE r3).
    # 99 at the r4 window rotation + the late-r4 mid-zone additions
    # (link graph, pagerank, fertility, script mix, harmonic exact +
    # hyperball audit, BPE merge table + fertility, CMS heavy hitters,
    # bloom-prefiltered decontam, token-budget water-filling), awaiting
    # the round-5 rotation.
    assert len(Q.queries()) == 110


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
