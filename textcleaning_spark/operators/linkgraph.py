"""Host-level link graph + PageRank — crawl-reputation priors.

Every production web pipeline keeps a host-level view of the crawl's
link structure: Common Crawl publishes host/domain webgraph ranks, and
crawl schedulers + quality filters consume host centrality as a prior
(a host nothing links to is far more likely to be spam/SEO chaff).
The reference corpus has no hyperlinks (patent metadata,
text_process.py:39-41); this module is part of the engine's web-scale
layer, fed by functions/links.py extraction over the raw ``html``
column of the canonical ``pages`` table.

Determinism contract: :func:`pagerank` does ALL mass arithmetic in
integer **nano-units** (rank × 10⁹ as BIGINT). Every division is a
``floor`` of an IEEE-double quotient of exact-in-double integers, and
every SUM is over BIGINT — so the result is bit-identical regardless
of partitioning, parallelism, or engine (the DuckDB oracle unrolls the
same recurrence; same trick as quality_drift_psi's PSI terms).

Recurrence (damping ``d``, ``N`` hosts, ranks in nano-units):

    r0(v)   = floor(1e9 / N)
    contrib(v) = Σ_{(s→v,w)} floor(r(s)·w / out_w(s))       (per-edge floor)
    dang       = Σ_{s: out_w(s) absent} r(s)
    r'(v)  = floor((1-d)·1e9 / N) + floor(d·(contrib(v) + floor(dang/N)))

Total mass drifts below 1e9 by the flooring (≤ 1 nano-unit per term);
PageRank consumers order by rank, so the bounded deficit is harmless
and determinism is worth far more at audit time.

Scale shape: each iteration shuffles (a) edge contributions keyed on
dst (map-side partial SUM — the groupBy is a real aggregate, so a hub
host that half the web links to is combined per-partition before the
exchange) and (b) nothing else of corpus size: the rank table is one
row per HOST (~10⁸ rows at full-crawl scale, KB–GB not TB) and the
edge list is static — ``localCheckpoint``ed once so no iteration
re-derives it, with per-round checkpoints truncating the growing
lineage exactly like operators/dedup.connected_components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from textcleaning_spark.functions.links import outlink_hrefs, resolve_host
from textcleaning_spark.functions.urls import canonical_url, host

NANO = 1_000_000_000


def host_edges(pages: DataFrame) -> DataFrame:
    """``pages(url, html, …) → (src_host, dst_host, weight)``.

    One scan: canonicalize the page url to its host, extract+resolve
    every outlink (functions/links.py), drop intra-host navigation
    (self-edges) and unresolvable schemes, then ONE shuffle on
    (src_host, dst_host) counting link multiplicity into ``weight``.
    The html bytes never shuffle — only (src_host, href) survive the
    explode, and the aggregate's map-side partials bound hub keys."""
    src = host(canonical_url(F.col("url"))).alias("src_host")
    exploded = (
        pages.select(src, F.explode(outlink_hrefs(F.col("html"))).alias("href"))
        .select("src_host", resolve_host(F.col("href"), F.col("src_host")).alias("dst_host"))
        .filter(F.col("dst_host").isNotNull() & (F.col("dst_host") != F.col("src_host")))
    )
    return exploded.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).cast("bigint").alias("weight")
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str = "weight",
) -> DataFrame:
    """Weighted PageRank with uniform dangling-mass redistribution,
    exact in integer nano-units (module docstring has the recurrence).

    Returns ``(host, rank_nano bigint, rank double)`` — one row per
    host appearing as source or target. ``rank = rank_nano / 1e9``
    exactly (both engines divide the same integer)."""
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("bigint").alias("w"),
    ).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()  # one job; the node table is host-sized, tiny
    if n == 0:
        raise ValueError("pagerank: empty edge list")
    outw = e.groupBy("src").agg(F.sum("w").alias("ow")).localCheckpoint(eager=False)

    # round() first so the numerator is the exact integer (1-d)·1e9 —
    # the oracle divides the same integer literal, same IEEE quotient
    base = int(round((1.0 - damping) * NANO) / n)
    ranks = nodes.select("host", F.lit(int(NANO / n)).cast("bigint").alias("rn"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e.src == ranks.host)
            .join(outw, "src")
            .select(
                F.col("dst").alias("host"),
                F.floor((F.col("rn") * F.col("w")).cast("double") / F.col("ow"))
                .cast("bigint")
                .alias("cn"),
            )
            .groupBy("host")
            .agg(F.sum("cn").alias("cn"))
        )
        dang_share = (
            ranks.join(outw, ranks.host == outw.src, "left_anti")
            .agg(
                F.floor(
                    F.coalesce(F.sum("rn"), F.lit(0)).cast("double") / F.lit(n)
                )
                .cast("bigint")
                .alias("ds")
            )
        )
        ranks = (
            nodes.join(contrib, "host", "left")
            .crossJoin(dang_share)  # one-row frame; broadcast NL join
            .select(
                "host",
                (
                    F.lit(base).cast("bigint")
                    + F.floor(
                        F.lit(damping)
                        * (F.coalesce(F.col("cn"), F.lit(0)) + F.col("ds")).cast(
                            "double"
                        )
                    ).cast("bigint")
                ).alias("rn"),
            )
            .localCheckpoint(eager=False)  # constant-size plan per round
        )
    return ranks.select(
        "host",
        F.col("rn").alias("rank_nano"),
        (F.col("rn").cast("double") / F.lit(float(NANO))).alias("rank"),
    )
