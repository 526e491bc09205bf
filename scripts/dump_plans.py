#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for flagship queries.

The point of the artifact: show, per query, that the plan is the one
you'd want at 100 TB — filters pushed to the scan, columns pruned,
dims broadcast, aggregation partial+final, Python confined to declared
Arrow stages. tests/test_plans.py asserts the load-bearing properties;
this file makes them reviewable.
"""

from __future__ import annotations

import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from textcleaning_spark import queries as Q  # noqa: E402
from textcleaning_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

FLAGSHIP = [
    ("doc_quality_profile", "keep/drop rollup — all-native signals, one scan"),
    ("tf_df_idf", "corpus stats — one explode + one agg (partial+final)"),
    ("cleaned_text", "scrub + array_join — pruned scan, zero shuffle"),
    ("revenue_by_nation", "star join — all dims broadcast, fact never pre-shuffles"),
    ("shipping_priority", "Q3 shape — 3 pushed filters + TakeOrderedAndProject"),
    ("cooccurrence_edges", "self-join — hot-key guard before the quadratic join"),
    ("rollup_revenue", "ROLLUP — Expand + single shuffle"),
    ("char_bigram_ppl", "LM train+score — model joins broadcast"),
    ("word_keep_verdict", "keep rule — one corpus pass, tag projected (functional dep), broadcast rank-back"),
    ("events_in_purchase_windows", "range join — (key, time-bucket) equi join + residual, no per-key blowup"),
    ("volume_shipping", "Q7 — bounded dims (nation aliases) broadcast; orders/customer/supplier left to AQE size stats (forced broadcast OOMs at 100x)"),
    ("incremental_upsert", "MERGE shape — full-outer join, one shuffle per side"),
    ("boilerplate_line_scrub", "CCNet cross-doc line dedup — 8-byte hash count shuffle, dup set broadcast back"),
    ("nb_quality_confusion", "NB distillation — labeled frame checkpointed once, vocab log-odds broadcast, integer sums"),
    ("sequence_packing", "concat-and-chunk packing — (lang, shard) window partitioning reused by the pack agg: ONE Exchange"),
    ("large_volume_orders", "Q18 — HAVING-derived semi-join, all stages hash on the orderkey family (AQE plans the joins)"),
    ("dormant_high_balance", "Q22 — 1-row scalar broadcast (exact-decimal threshold), anti-join on filtered orders"),
    ("dedup_keep_verdict", "per-doc dedup verdict — components frame stays pair-sized, corpus back-join left to AQE (broadcasts at runtime)"),
    ("lang_sampling_weights", "temperature data mix — tiny lang agg + 1-row scalar broadcast"),
    ("url_canonical_dedup", "url dedup — scan-side canonical regexp chain, textbook two-phase distinct agg (partial before each Exchange)"),
    ("token_count_histogram", "token-budget histogram — one corpus pass, windows run on the ≤64-row bucket frame only"),
    ("top_supplier_revenue", "Q15 — grouped revenue + global max from ONE fact scan (window over the grouped relation, exact-decimal equality)"),
    ("promo_brand_revenue", "Q19 — cross-table OR with explicit per-side implications pushed into BOTH scans"),
    ("returned_item_customers", "Q10 — pushed returnflag/date filters, nation-only broadcast, exact-decimal TakeOrderedAndProject top-20"),
    ("discount_revenue_forecast", "Q6 — all four predicates reach the parquet reader; partial agg then one exchange"),
    ("ppl_tertile_routing", "CCNet routing — LM model joins broadcast; per-lang ntile window (approx-cutoff scale path documented in the query)"),
    ("benchmark_decontam", "eval decontam — eval-span table broadcast, training spans never shuffle before the per-doc agg"),
    ("nation_market_share", "Q8 — numerator CASE inside the same agg as the denominator: one pass, one shuffle; bounded dims broadcast"),
    ("host_keep_profile", "domain blocklist feed — canonicalize+host fused into the scoring project, one host-keyed agg with map-side partials"),
    ("vocab_growth_curve", "Heaps' law — first-occurrence argmin instead of quadratic prefix-distinct; 1-row scalar broadcast, <=10-row window"),
    ("dsir_selection", "DSIR — one conditional bucket agg (raw+target), 256-row weight broadcast, integer-sum doc agg, TakeOrderedAndProject"),
    ("semdedup_keep", "SemDedup — shuffle-free literal-centroid assignment; pair join keyed on cluster_id, size-decided build sides"),
    ("pipeline_funnel", "retention funnel — one scan, verdict+tokens scan-side, one md5-key shuffle, 4-stage explode of one 1-row aggregate"),
    ("minhash_lsh_recall", "LSH recall audit — PPJoin-bounded truth pairs vs banded candidates; three scalar aggs crossed, gate filter in integer arithmetic"),
    ("quality_drift_psi", "drift monitor — single-tokenize scan + x3 explode collapse to ONE (signal,source,bucket) shuffle; PSI math on the tiny checkpointed frame"),
    ("nb_calibration", "NB reliability table — same scored chain as the confusion (vocab broadcast, one doc shuffle) + a <=21-key bin agg"),
    ("rule_ablation", "rule ablation — one scoring scan + count-star footer scan; sole-ness decided before the explode, <=9-key agg"),
    ("span_novelty", "novelty curve — first-occurrence linear form: span-keyed min + back-join on the same key, <=10-row decile agg, no forced broadcast"),
    ("host_link_graph", "host edge list — scan-side md5 derivation, one (src,dst)-keyed count agg with map-side partials"),
    ("host_pagerank", "nano-unit PageRank — edge list checkpointed once; per-round: one dst-keyed partial+final agg, host-sized rank frames (final plan reads the round-3 checkpoint)"),
    ("host_harmonic_exact", "exact truncated harmonic — frontier anti-joins keep the pair frame minimal; nano-snapped 1/d integer sums"),
    ("tokenizer_fertility", "fertility — per-row native byte/char/token arithmetic in the scan project, one lang-keyed agg"),
    ("script_mix_profile", "script census — three codegen'd regexp passes scan-side, one lang-keyed agg"),
    ("cms_heavy_hitters", "CMS audit — fixed 3x256 sketch agg + TakeOrderedAndProject top-k, estimates via broadcast join against the 768-row sketch"),
    ("decontam_bloom_prefilter", "bloom prefilter — bitmap constant-folded to ONE array literal, 5 xxhash64+bit tests scan-side before the exact semi-join"),
    ("robots_longest_match", "robots.txt politeness — per-host rule arrays broadcast, RFC 9309 longest-match decided by a per-row HOF fold (no explode), one (lang,bool) shuffle"),
    ("cc_luhn_scrub_audit", "Luhn PII audit — candidate extraction + checksum fold fused into one shuffle-free codegen'd project; single lang-keyed agg"),
]


def main() -> None:
    spark = get_spark("plans", cores=8)
    out = io.StringIO()
    out.write(
        "# PLANS — formatted physical plans for flagship queries\n\n"
        "Generated by `python scripts/dump_plans.py` (sf0.01). The\n"
        "properties that matter are asserted in tests/test_plans.py;\n"
        "this file is the human-readable evidence.\n"
    )
    qs = Q.queries()
    for name, why in FLAGSHIP:
        df = qs[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        out.write(f"\n## {name}\n\n*{why}*\n\n```\n{plan}\n```\n")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write(out.getvalue())
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
