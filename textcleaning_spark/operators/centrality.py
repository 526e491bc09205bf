"""Host centrality: exact truncated harmonic + HyperBall sketch.

Harmonic centrality ``H(v) = Σ_{u≠v} 1/d(u,v)`` is the second
host-reputation rank real crawls publish next to PageRank (Common
Crawl's host-level webgraph ships harmonic centrality, computed with
HyperBall). Two implementations, by design:

- :func:`truncated_harmonic` — EXACT, radius-truncated: materialize
  the distinct reachable (u, v, min-dist) pairs by ``radius`` rounds
  of distinct joins. 1/d terms are snapped to integer nano-units
  before summing, so the result is order-independent and replayable
  in the DuckDB oracle. This is the truth twin — the pair frame is
  O(nodes²) at full connectivity, exactly the thing a 10⁸-host graph
  cannot afford.
- :func:`hyperball_harmonic` — the scale path: HyperBall (Boldi &
  Vigna, "In-Core Computation of Geometric Centralities with
  HyperBall", 2013). Each node carries an ``m``-register HyperLogLog
  counter of its in-ball; one round of register-wise max-merge along
  edges grows every ball by one hop; per-round ball-size estimates
  telescope into ``H(v) ≈ Σ_r (|B(v,r)|-|B(v,r-1)|)/r``. Registers
  live as RELATIONAL rows ``(node, idx, val)`` — zero registers are
  simply absent — so each round is one join + one (node, idx)-keyed
  max-aggregate: E×m shuffled rows per round, 10-byte keys, map-side
  partials, no arrays, no Python, no driver state. Counters only
  grow, so per-round estimates are monotone and the telescoping
  differences are non-negative by construction.

Determinism: register placement is Spark's seed-fixed ``xxhash64``,
and the HLL estimate is fixed double math over integers — the sketch
is a pure function of the edge set (same rows every run, any
partitioning), even though no SQL oracle can replay Spark's hash.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NANO = 1_000_000_000


def _edges(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    return edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))


def truncated_harmonic(
    edges: DataFrame,
    radius: int = 3,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Exact harmonic centrality truncated at ``radius`` hops.

    Returns ``(host, n_reaching bigint, harmonic_nano bigint,
    harmonic double)`` — ``harmonic_nano = Σ_u floor(1e9 / d(u,host))``
    over nodes ``u ≠ host`` with ``d(u,host) ≤ radius``; nodes with no
    in-paths get 0 via the node frame. Exact-integer sums ⇒
    order-independent ⇒ oracle-replayable (same discipline as
    operators/linkgraph.pagerank)."""
    e = _edges(edges, src_col, dst_col).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    # frontier r: pairs first REACHED at distance r (set difference
    # against all shorter-distance pairs keeps the frame minimal and
    # the min-dist semantics exact)
    seen = e.select(F.col("src").alias("u"), F.col("dst").alias("v")).distinct()
    seen = seen.filter(F.col("u") != F.col("v")).localCheckpoint(eager=False)
    frontier = seen
    dist_frames = [frontier.withColumn("dist", F.lit(1).cast("bigint"))]
    for r in range(2, radius + 1):
        nxt = (
            frontier.join(e, frontier.v == e.src)
            .select("u", F.col("dst").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .join(seen, ["u", "v"], "left_anti")
            .localCheckpoint(eager=False)
        )
        dist_frames.append(nxt.withColumn("dist", F.lit(r).cast("bigint")))
        seen = seen.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    pairs = dist_frames[0]
    for fr in dist_frames[1:]:
        pairs = pairs.unionByName(fr)
    per_v = pairs.groupBy(F.col("v").alias("host")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reaching"),
        F.sum(F.floor(F.lit(float(NANO)) / F.col("dist")).cast("bigint"))
        .cast("bigint")
        .alias("harmonic_nano"),
    )
    return nodes.join(per_v, "host", "left").select(
        "host",
        F.coalesce("n_reaching", F.lit(0)).cast("bigint").alias("n_reaching"),
        F.coalesce("harmonic_nano", F.lit(0)).cast("bigint").alias("harmonic_nano"),
        (
            F.coalesce("harmonic_nano", F.lit(0)).cast("double")
            / F.lit(float(NANO))
        ).alias("harmonic"),
    )


def truncated_harmonic_targets(
    edges: DataFrame,
    targets: DataFrame,
    radius: int = 3,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Exact truncated harmonic centrality for a SUBSET of target
    hosts — the audit-side cost cutter: ``H(v) = Σ_u 1/d(u,v)`` needs
    the distance from every u to v, so a BFS over REVERSED edges
    seeded only at the targets materializes exactly the
    (target, reached-u, min-dist) frame — O(|targets| × nodes), never
    the full O(nodes²) pair space. ``targets`` is a 1-column
    ``host`` frame; output schema and integer nano-unit math are
    identical to :func:`truncated_harmonic` restricted to the targets
    (differential-tested, tests/test_centrality.py), so the HyperBall
    audit's gate semantics are unchanged by sampling."""
    e = _edges(edges, src_col, dst_col).localCheckpoint(eager=False)
    rev = e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    seeds = targets.select(F.col("host").alias("u")).distinct()
    # (u = target, v = node whose out-path reaches u) at min distance
    seen = (
        rev.join(seeds, "u")
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    frontier = seen
    dist_frames = [frontier.withColumn("dist", F.lit(1).cast("bigint"))]
    for r in range(2, radius + 1):
        nxt = (
            frontier.join(
                e, frontier.v == e.dst
            )  # reversed expansion: v ← its in-neighbors
            .select("u", F.col("src").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .join(seen, ["u", "v"], "left_anti")
            .localCheckpoint(eager=False)
        )
        dist_frames.append(nxt.withColumn("dist", F.lit(r).cast("bigint")))
        seen = seen.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    pairs = dist_frames[0]
    for fr in dist_frames[1:]:
        pairs = pairs.unionByName(fr)
    per_u = pairs.groupBy(F.col("u").alias("host")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reaching"),
        F.sum(F.floor(F.lit(float(NANO)) / F.col("dist")).cast("bigint"))
        .cast("bigint")
        .alias("harmonic_nano"),
    )
    return seeds.select(F.col("u").alias("host")).join(per_u, "host", "left").select(
        "host",
        F.coalesce("n_reaching", F.lit(0)).cast("bigint").alias("n_reaching"),
        F.coalesce("harmonic_nano", F.lit(0)).cast("bigint").alias("harmonic_nano"),
        (
            F.coalesce("harmonic_nano", F.lit(0)).cast("double")
            / F.lit(float(NANO))
        ).alias("harmonic"),
    )


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _init_registers(nodes: DataFrame, log2m: int) -> DataFrame:
    """One seed register per node: idx = low hash bits, val = ρ of the
    remaining bits (position of the lowest set bit + 1, the HLL rank).
    ρ is computed natively: ``w & -w`` isolates the lowest set bit (an
    exact power of two, so log2 over double is exact)."""
    h = F.xxhash64(F.col("host"))
    w = F.expr(f"shiftrightunsigned(xxhash64(host), {log2m})")
    low = w.bitwiseAND(-w)
    rho = (
        F.when(w == 0, F.lit(65 - log2m))
        .otherwise(F.log2(low.cast("double")).cast("int") + 1)
        .cast("int")
    )
    m = 1 << log2m
    return nodes.select(
        "host",
        (F.pmod(h, F.lit(m))).cast("int").alias("idx"),
        rho.alias("val"),
    )


def _estimate(registers: DataFrame, log2m: int) -> DataFrame:
    """Standard HLL estimate per node from present (idx, val) rows —
    absent registers are zeros. Small-range (linear counting)
    correction applies whenever zeros exist and the raw estimate is
    under 2.5m, exactly the Flajolet et al. 2007 recipe."""
    m = 1 << log2m
    alpha = _alpha(m)
    per = registers.groupBy("host").agg(
        F.count(F.lit(1)).cast("int").alias("nz"),
        F.sum(F.pow(F.lit(2.0), -F.col("val").cast("double"))).alias("s_nz"),
    )
    zeros = (F.lit(m) - F.col("nz")).cast("double")
    raw = F.lit(alpha * m * m) / (F.col("s_nz") + zeros)
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((zeros > 0) & (raw <= F.lit(2.5 * m)), lc).otherwise(raw)
    return per.select("host", est.alias("est"))


def hyperball_harmonic(
    edges: DataFrame,
    radius: int = 3,
    log2m: int = 6,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """HyperBall harmonic centrality (Boldi & Vigna 2013), truncated at
    ``radius`` hops, ``m = 2^log2m`` registers per node.

    Returns ``(host, harmonic_est double)``. Scale shape: per round,
    ONE join (edges ⋈ registers on src — at most E×m rows, 10-byte
    keys) and ONE (node, idx)-keyed max-aggregate with map-side
    partials; per-round estimates are node-sized frames. The register
    table is localCheckpoint'ed each round (constant plan size,
    connected_components discipline). No arrays, no Python, no
    collect — a 10⁸-host graph streams through ordinary shuffles."""
    e = _edges(edges, src_col, dst_col).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    regs = _init_registers(nodes, log2m).localCheckpoint(eager=False)
    prev_est = _estimate(regs, log2m)
    # r = 0 ball is {self}: telescoping starts from est_0
    harm = nodes.select("host", F.lit(0.0).alias("h"))
    for r in range(1, radius + 1):
        flowed = (
            e.join(regs, e.src == regs.host)
            .select(F.col("dst").alias("host"), "idx", "val")
        )
        regs = (
            regs.unionByName(flowed)
            .groupBy("host", "idx")
            .agg(F.max("val").alias("val"))
            .localCheckpoint(eager=False)
        )
        est = _estimate(regs, log2m)
        growth = (
            est.withColumnRenamed("est", "est_r")
            .join(prev_est.withColumnRenamed("est", "est_prev"), "host")
            .select(
                "host",
                (
                    F.greatest(
                        F.col("est_r") - F.col("est_prev"), F.lit(0.0)
                    )
                    / F.lit(float(r))
                ).alias("dh"),
            )
        )
        harm = (
            harm.join(growth, "host", "left")
            .select(
                "host",
                (F.col("h") + F.coalesce("dh", F.lit(0.0))).alias("h"),
            )
            .localCheckpoint(eager=False)
        )
        prev_est = est
    return harm.select("host", F.col("h").alias("harmonic_est"))
