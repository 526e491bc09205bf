"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` — in fresh-JVM
groups of ``$BENCH_GROUP_SIZE`` (default 15; 0 = one session) so
late-session JIT/GC pressure can't skew per-query numbers across
rounds — and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ...,
     "pipeline": {"docs_per_sec": ..., "n_docs": ...}}

``python bench.py --scaling`` additionally runs the full quality-filter
pipeline job at two parallelism levels (local[8] vs local[32]) on the
SAME input and writes throughput + scaling efficiency to
``BENCH/BASELINE.md`` (the sandbox evidence for the north_rule's
N→4N-executor ≥0.8 efficiency criterion).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from textcleaning_spark import queries as Q  # noqa: E402
from textcleaning_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "doc_quality_profile",
    "tf_df_idf",
    "word_keep_verdict",
    "vocab_topk",
    "idf_quantile_cutoff",
    "major_pos",
    "cleaned_text",
    "cooccurrence_edges",
    "pricing_summary",
    "revenue_by_nation",
    "sliding_window_events",
    "user_sessions",
    "exact_dedup",
    "minhash_signatures",
    "scrub_parity",
    "cube_profile",
    "stem_surface_forms",
    "ann_lsh_topk",
    "shipping_priority",
    "late_shipment_priorities",
    "rollup_revenue",
    "events_lead_lag",
    "embedding_near_dup_fast",
    "volume_shipping",
    "priority_class_by_returnflag",
    "events_in_purchase_windows",
    "asof_event_orders",
    "near_dup_clusters",
    "deterministic_sample",
    "curriculum_selection",
    "incremental_upsert",
    "boilerplate_line_scrub",
    "rule_hit_profile",
    "sole_late_supplier",
    "span_contamination",
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
    "incremental_crawl_dedup",
]

PIPELINE_DOCS = int(os.environ.get("BENCH_PIPELINE_DOCS", "200000"))


def _consume(df) -> int:
    """Force full execution without driver-side materialization cost."""
    return df.write.format("noop").mode("overwrite").save() or df.count()


def run_queries(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, float]:
    qs = Q.queries()
    # warmup: JVM/codegen/noop-sink initialization outside any timing
    spark.range(1000).write.format("noop").mode("overwrite").save()
    out: dict[str, float] = {}
    for name in names if names is not None else HEADLINE:
        fn = qs[name]
        # steady state per query: first run compiles that plan's
        # whole-stage codegen (JIT, driver-side only); timed runs
        # measure engine throughput. Same methodology as the pipeline
        # timing (warmup + best-of).
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        out[name] = round(min(times), 3)
    return out


def write_pages_corpus(spark, n_docs: int, path: str, n_files: int = 64) -> None:
    """Materialize the benchmark input ONCE with a fixed file layout so
    every parallelism level reads the identical bytes."""
    from textcleaning_spark.sources.pages import generate_pages

    generate_pages(spark, n_docs, seed=1234, partitions=n_files).write.parquet(path)


def timed_pipeline(
    spark, src: str, n_docs: int, iterations: int = 3, warmups: int = 1
) -> dict:
    """Time read→pipeline→noop-write on a pre-written corpus. Warmup
    passes first (spawn/reuse Python UDF workers, compile codegen, let
    JIT C2 reach steady state — at 32 task threads the compiler
    threads compete with tasks, so one pass is NOT enough); then the
    MEDIAN over ``iterations`` steady-state runs. Median, not min: on
    a shared VM with ±15-40% ambient noise, min-of-N picks the one
    lucky-quiet rep and distorts any cross-config ratio; the median is
    robust and is applied identically to every parallelism level."""
    from textcleaning_spark.plans.pipeline import run_quality_pipeline

    # plan built ONCE (py4j plan construction is driver-side fixed cost,
    # not engine throughput); warmup passes spawn/reuse UDF workers and
    # compile codegen before any timing
    scored = run_quality_pipeline(spark.read.parquet(src))
    for _ in range(max(warmups, 1)):
        scored.write.format("noop").mode("overwrite").save()
    times = []
    for _ in range(iterations):
        t0 = time.perf_counter()
        scored.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2] if len(times) % 2 else (
        times[len(times) // 2 - 1] + times[len(times) // 2]
    ) / 2
    return {
        "n_docs": n_docs,
        "sec": round(med, 3),
        "docs_per_sec": round(n_docs / med, 1),
        "runs": [round(t, 3) for t in times],
    }


def pipeline_throughput(spark, n_docs: int, parallelism: int) -> dict:
    """One-session convenience wrapper used by the default bench."""
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "pages")
        write_pages_corpus(spark, n_docs, src)
        return timed_pipeline(spark, src, n_docs)


# Queries per fresh JVM (0 = everything in one session). A 60-query
# session accumulates JIT/code-cache/GC pressure that lands on whichever
# queries run LAST — round 3's cross-round per-query comparison was
# dominated by exactly that, not by plan changes. Bounded groups keep
# per-query numbers comparable across rounds as the registry grows.
BENCH_GROUP_SIZE = int(os.environ.get("BENCH_GROUP_SIZE", "15"))


def _bench_group(sf_dir: str, cpus, names: list[str]) -> None:
    """Subprocess entry: time one group of headline queries in a fresh
    JVM and print them as a marker line for the parent to collect."""
    spark = get_spark("bench", cores=cpus)
    try:
        out = run_queries(spark, sf_dir, names)
    finally:
        spark.stop()
    print("BENCH_GROUP_JSON " + json.dumps(out))


def _run_grouped_queries(sf_dir: str, cpus) -> dict[str, float]:
    import subprocess

    queries: dict[str, float] = {}
    for gi in range(0, len(HEADLINE), BENCH_GROUP_SIZE):
        group = HEADLINE[gi : gi + BENCH_GROUP_SIZE]
        code = (
            "import sys; sys.path.insert(0, %r); "
            "from bench import _bench_group; _bench_group(%r, %r, %r)"
            % (REPO, sf_dir, cpus, group)
        )
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=1800,
        )
        line = [
            l for l in out.stdout.splitlines()
            if l.startswith("BENCH_GROUP_JSON ")
        ]
        if not line:
            raise RuntimeError(
                f"bench group {group[0]}.. failed:\n{out.stderr[-2000:]}"
            )
        queries.update(json.loads(line[0].split(" ", 1)[1]))
    return queries


def run_bench(sf_dir: str, cpus: int | str) -> dict:
    try:
        n_cores = int(cpus)
    except (TypeError, ValueError):
        n_cores = os.cpu_count() or 8
    if BENCH_GROUP_SIZE > 0:
        queries = _run_grouped_queries(sf_dir, cpus)
        spark = get_spark("bench", cores=cpus)
        try:
            pipe = pipeline_throughput(spark, PIPELINE_DOCS, n_cores)
        finally:
            spark.stop()
    else:
        spark = get_spark("bench", cores=cpus)
        try:
            queries = run_queries(spark, sf_dir)
            pipe = pipeline_throughput(spark, PIPELINE_DOCS, n_cores)
        finally:
            spark.stop()
    total = round(sum(queries.values()), 3)
    return {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "pipeline": pipe,
        "cpus": n_cores,
    }


SCALING_DOCS = int(os.environ.get("BENCH_SCALING_DOCS", "2000000"))


def run_scaling(sf_dir: str, out_md: str) -> None:
    """Same pipeline job on the SAME pre-written input at local[8] vs
    local[32] (fresh JVM each); efficiency = (T_8 / T_32) / 4."""
    import shutil
    import subprocess

    tmp = tempfile.mkdtemp(prefix="scaling_")
    src = os.path.join(tmp, "pages")
    gen = get_spark("scaling-gen", cores=32)
    write_pages_corpus(gen, SCALING_DOCS, src)
    gen.stop()

    # cpu sets: the 8-core run stays off core 0 (it absorbs host/IRQ
    # noise, which would inflate T_8 and flatter the efficiency number)
    cpu_sets = {8: "24-31", 32: "0-31"}

    def one_run(cores: int) -> dict:
        code = (
            "import sys, json; sys.path.insert(0, %r); "
            "from bench import timed_pipeline; "
            "from textcleaning_spark.session import get_spark; "
            "s = get_spark('scaling', cores=%d); "
            "r = timed_pipeline(s, %r, %d, iterations=5, warmups=2); "
            "s.stop(); "
            "print('SCALING_JSON ' + json.dumps(r))"
            % (REPO, cores, src, SCALING_DOCS)
        )
        # pin the WHOLE process tree (JVM task threads + Python UDF
        # workers) to exactly `cores` CPUs — without this, a local[8]
        # JVM offloads its Python workers onto the other 24 cores and
        # the "8-core" run silently uses ~16.
        out = subprocess.run(
            ["taskset", "-c", cpu_sets[cores], sys.executable, "-c", code],
            capture_output=True, text=True, timeout=1800,
        )
        line = [
            l for l in out.stdout.splitlines()
            if l.startswith("SCALING_JSON ")
        ]
        if not line:
            raise RuntimeError(
                f"scaling run at {cores} cores failed:\n{out.stderr[-2000:]}"
            )
        return json.loads(line[0].split(" ", 1)[1])

    # PAIRED attempts, 8-core and 32-core back-to-back: this VM's
    # ambient throughput drifts ±15-40% over minutes, so running all
    # N-core attempts then all 4N-core attempts (the old layout) puts
    # the drift directly into the ratio — measured swings of t8
    # 45→68 s on IDENTICAL code within one session. Efficiency is
    # computed per adjacent pair (both legs inside one drift window)
    # and summarized as the MEDIAN pair, the same robustness argument
    # as the median-of-5 reps inside each leg.
    pairs: list[dict] = []
    try:
        n_attempts = int(os.environ.get("BENCH_SCALING_ATTEMPTS", "2"))
        for _ in range(max(n_attempts, 1)):
            r8 = one_run(8)
            r32 = one_run(32)
            pairs.append(
                {"r8": r8, "r32": r32,
                 "eff": (r8["sec"] / r32["sec"]) / 4.0}
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    pairs.sort(key=lambda p: p["eff"])
    mid = pairs[(len(pairs) - 1) // 2]
    results = {8: mid["r8"], 32: mid["r32"]}
    t8, t32 = results[8]["sec"], results[32]["sec"]
    eff = mid["eff"]
    pair_lines = "".join(
        f"| {i + 1} | {p['r8']['sec']} | {p['r32']['sec']} | {p['eff']:.3f} |\n"
        for i, p in enumerate(sorted(pairs, key=lambda p: p["r8"]["sec"]))
    )
    os.makedirs(os.path.dirname(out_md), exist_ok=True)
    with open(out_md, "w") as f:
        f.write(
            "# BENCH — scaling evidence (N vs 4N parallelism)\n\n"
            "Same quality-filter pipeline job (read parquet pages → langid →\n"
            "heuristic rules → keep/drop → PII scrub → noop write) on the SAME\n"
            f"{results[8]['n_docs']}-doc input at two parallelism levels\n"
            "(sandbox stand-in for N- vs 4N-executor clusters per BASELINE.md).\n\n"
            "| cores | wall sec | docs/sec |\n|---|---|---|\n"
            f"| 8 (N) | {t8} | {results[8]['docs_per_sec']} |\n"
            f"| 32 (4N) | {t32} | {results[32]['docs_per_sec']} |\n\n"
            f"**Speedup 8→32:** {t8 / t32:.2f}×  \n"
            f"**Scaling efficiency:** (T_8/T_32)/4 = **{eff:.3f}** "
            f"(target ≥ 0.8; median of {len(pairs)} paired attempts)\n\n"
            "All paired attempts (each pair = one 8-core + one 32-core\n"
            "run back-to-back inside one ambient-drift window):\n\n"
            "| pair | t8 | t32 | efficiency |\n|---|---|---|---|\n"
            f"{pair_lines}\n"
            "## Methodology\n\n"
            "- Attempts are PAIRED in time (8-core leg immediately\n"
            "  followed by its 32-core leg): this VM's ambient\n"
            "  throughput drifts ±15-40% over minutes (t8 measured\n"
            "  45→68 s on identical code in one session), and the old\n"
            "  all-N-then-all-4N layout put that drift straight into\n"
            "  the ratio. The reported number is the MEDIAN pair.\n"
            "- Each level runs in a fresh JVM pinned with `taskset -c` to\n"
            "  exactly N CPUs — pinning covers JVM task threads AND Python\n"
            "  UDF workers (unpinned, a local[8] JVM silently offloads its\n"
            "  Python workers onto the idle 24 cores and under-reports N-core\n"
            "  time by ~30%).\n"
            "- Input parquet is written once with a fixed 64-file layout;\n"
            "  both levels read identical bytes (page-cache warmed by the\n"
            "  untimed warmup pass). Timing = median of 5 steady-state runs\n"
            "  after 2 warmups (median, not min: robust to this VM's\n"
            "  ±15-40% ambient noise; applied identically to both levels) of\n"
            "  read→pipeline→noop-write; plan construction excluded.\n"
            "- Hardware control: a pure-Python multiprocessing md5 benchmark\n"
            "  (no Spark) on this box scales at ~0.88 efficiency from 8→32\n"
            "  pinned cores (shared-VM frequency/membw ceiling), so ~0.88 is\n"
            "  the attainable ceiling for any engine here. Wall-clock\n"
            "  variance between identical runs on this VM is ~±15%.\n"
        )
    print(json.dumps({"scaling_efficiency": round(eff, 3), "t8": t8, "t32": t32}))


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if "--scaling" in sys.argv:
        run_scaling(sf_dir, os.path.join(REPO, "BENCH", "BASELINE.md"))
    else:
        print(json.dumps(run_bench(sf_dir, cpus)))
