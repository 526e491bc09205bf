"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), MinHash signatures + LSH banding, token-set
Jaccard, SimHash, and n-gram shingling. The reference only ever
deduplicates implicitly (``set(doc)`` per document, A5) — these are the
web-scale generalizations the north-star pipeline needs.

Scale notes:
* Exact dedup shuffles (hash, doc) pairs — the text itself never
  shuffles (hash first, group on the 128-bit digest).
* MinHash/LSH: signatures are computed scan-side (native expressions,
  no Python); candidate generation joins on (band_id, band_hash) so the
  shuffle volume is O(docs × bands), never O(docs²). The verify step
  runs only on bucket collisions.
* All-pairs token-set Jaccard is provided for oracle-checkable small
  scale; at 100 TB only the LSH path is used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from textcleaning_spark.functions.text import tokens


def text_hash(col):
    """128-bit content hash (md5 over UTF-8) — exact-dedup key."""
    return F.md5(F.encode(col, "UTF-8"))


def exact_duplicates(df: DataFrame, doc_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with the
    keeper (min doc id) and the copy count."""
    return (
        df.select(F.col(doc_col), text_hash(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.min(doc_col).alias("keeper"),
        )
    )


def minhash_signature(df: DataFrame, doc_col: str, text_col: str, k: int = 8) -> DataFrame:
    """k-permutation MinHash over the distinct-token set, as native
    expressions: permutation i = md5("<i>|" + token), signature =
    lexicographic min. Deterministic and engine-portable (md5 is md5).
    """
    toks = F.array_distinct(tokens(text_col))
    sig_cols = [
        F.array_min(
            F.transform(toks, lambda t: F.md5(F.encode(F.concat(F.lit(f"{i}|"), t), "UTF-8")))
        ).alias(f"sig_{i}")
        for i in range(k)
    ]
    return df.select(F.col(doc_col), *sig_cols)


def minhash_signature_sql(text_col: str, k: int = 8) -> list[str]:
    """DuckDB SELECT-list fragments matching :func:`minhash_signature`."""
    toks = f"list_distinct(list_filter(string_split({text_col}, ' '), x -> x <> ''))"
    return [
        f"list_min(list_transform({toks}, t -> md5('{i}|' || t))) AS sig_{i}"
        for i in range(k)
    ]


def lsh_candidate_pairs(
    signatures: DataFrame, doc_col: str, k: int = 8, bands: int = 4
) -> DataFrame:
    """LSH banding: hash each band of k/bands signature values; docs
    colliding in ANY band become a candidate pair (doc_a < doc_b).

    This is the scale path: shuffle on (band_id, band_hash) buckets —
    near-linear — instead of the quadratic all-pairs join.
    """
    rows_per_band = k // bands
    banded = signatures.select(
        F.col(doc_col),
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.encode(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"sig_{b * rows_per_band + r}")
                                    for r in range(rows_per_band)
                                ],
                            ),
                            "UTF-8",
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_id", "band_hash"),
    )
    a = banded.select(
        F.col(doc_col).alias("doc_a"), "band_id", "band_hash"
    )
    b = banded.select(
        F.col(doc_col).alias("doc_b"), F.col("band_id").alias("band_id_b"),
        F.col("band_hash").alias("band_hash_b"),
    )
    return (
        a.join(
            b,
            (a.band_id == b.band_id_b)
            & (a.band_hash == b.band_hash_b)
            & (a.doc_a < b.doc_b),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def token_jaccard_pairs(
    df: DataFrame, doc_col: str, text_col: str, threshold: float = 0.8
) -> DataFrame:
    """All-pairs token-set Jaccard ≥ threshold (small-scale oracle path;
    the LSH pipeline above replaces it at web scale)."""
    tok = df.select(
        F.col(doc_col).alias("doc"), F.explode(F.array_distinct(tokens(text_col))).alias("word")
    )
    sizes = tok.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a = tok.select(F.col("doc").alias("doc_a"), "word")
    b = tok.select(F.col("doc").alias("doc_b"), F.col("word").alias("word_b"))
    common = (
        a.join(b, (a.word == b.word_b) & (a.doc_a < b.doc_b))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash16(df: DataFrame, doc_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash over distinct tokens, as native expressions.

    Each token votes ±1 per bit position using bits of md5(token);
    the fingerprint bit is 1 iff the vote sum is positive. 16 bits
    keeps the arithmetic in engine-portable integer ranges.
    """
    toks = F.array_distinct(tokens(text_col))
    # per-token 16-bit hash: first 4 hex chars of md5
    th = lambda t: F.conv(F.substring(F.md5(F.encode(t, "UTF-8")), 1, 4), 16, 10).cast("bigint")  # noqa: E731
    def _vote_merge(mask: int):
        # closure (not default-arg) so the lambda arity stays (acc, t)
        return lambda acc, t: acc + F.when(
            th(t).bitwiseAND(F.lit(mask)) > 0, F.lit(1)
        ).otherwise(F.lit(-1))

    bit_cols = []
    for bit in range(16):
        mask = 1 << bit
        vote = F.aggregate(toks, F.lit(0).cast("bigint"), _vote_merge(mask))
        bit_cols.append(F.when(vote > 0, F.lit(mask)).otherwise(F.lit(0)))
    fp = bit_cols[0]
    for c in bit_cols[1:]:
        fp = fp + c
    return df.select(F.col(doc_col), fp.cast("bigint").alias("simhash"))


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over an undirected pair graph — the
    clustering step that turns near-dup PAIRS into dedup GROUPS
    (cluster id = smallest member id, the canonical keeper).

    Min-label propagation: every node starts labeled with itself; each
    round, labels flow across edges and each node keeps the minimum;
    fixpoint in O(graph diameter) rounds. Near-dup graphs are
    short-diameter (clusters of mutual near-copies), so this converges
    in a handful of shuffles even at web scale; each round shuffles the
    edge list once (join) + the label table once (groupBy min).
    ``localCheckpoint`` after every round truncates the lineage so plan
    size stays constant instead of growing per iteration.

    Returns (node, comp): one row per node that appears in ``pairs``.
    """
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh = edges.join(labels, edges["dst"] == labels["node"]).select(
            edges["src"].alias("node"),
            labels["comp"],
            F.lit(None).cast("long").alias("own"),
        )
        own = labels.select("node", "comp", F.col("comp").alias("own"))
        # convergence detection rides the SAME aggregation: each node's
        # previous label travels as `own` (min ignores the neighbor
        # rows' NULLs), so "did anything change" is a cheap scan of the
        # checkpointed result — no extra join round-trip per iteration
        new_labels = (
            own.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"), F.min("own").alias("own"))
            .localCheckpoint()
        )
        changed = (
            new_labels.filter(F.col("comp") != F.col("own")).limit(1).count()
        )
        labels = new_labels.select("node", "comp")
        if changed == 0:
            break
    return labels
