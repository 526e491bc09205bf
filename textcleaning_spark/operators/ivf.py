"""IVF (inverted-file) approximate nearest neighbor — the clustered
scale path for embedding search, complementing hyperplane LSH.

Index build: k pseudo-centroids chosen deterministically (the k
corpus vectors with the smallest md5(vec_id) — a seeded sample without
any RNG state), then every vector is assigned to its nearest centroid
(broadcast k×d to executors; one scan, no shuffle until the final
groupBy). Query: probe the ``nprobe`` nearest centroid lists only —
comparisons drop from O(N) to O(N·nprobe/k) per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from textcleaning_spark.operators.similarity import _dot, _norm


def choose_centroids(emb: DataFrame, id_col: str, vec_col: str, k: int) -> DataFrame:
    """Deterministic pseudo-centroids: k vectors minimizing
    md5(vec_id) — an unbiased seeded sample, stable across runs and
    partitionings (no kmeans iterations needed for the index shape)."""
    return (
        emb.withColumn(
            "__h", F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8"))
        )
        .orderBy("__h")
        .limit(k)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        )
    )


def assign_to_centroids(
    emb: DataFrame, centroids: DataFrame, id_col: str, vec_col: str,
    nprobe: int = 1,
) -> DataFrame:
    """Rank centroids per vector by cosine; keep the top ``nprobe``.
    The centroid table is broadcast — the corpus never shuffles."""
    pairs = emb.join(F.broadcast(centroids))
    scored = pairs.select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        (
            _dot(F.col(vec_col), F.col("centroid_vec"))
            / (_norm(F.col(vec_col)) * _norm(F.col("centroid_vec")))
        ).alias("c_cos"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("c_cos").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select(id_col, vec_col, "centroid_id")
    )


def ivf_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF search: items live in their single nearest list; queries
    probe their ``nprobe`` nearest lists; exact cosine within lists."""
    cents = choose_centroids(emb, id_col, vec_col, n_centroids)
    items = assign_to_centroids(emb, cents, id_col, vec_col, nprobe=1).select(
        F.col(id_col).alias("item_id"),
        F.col(vec_col).alias("item_vec"),
        "centroid_id",
    )
    queries = assign_to_centroids(emb, cents, id_col, vec_col, nprobe=nprobe).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.col("centroid_id").alias("centroid_id_q"),
    )
    cands = queries.join(
        items,
        (F.col("centroid_id_q") == F.col("centroid_id"))
        & (F.col("query_id") != F.col("item_id")),
    )
    scored = cands.select(
        "query_id",
        "item_id",
        F.round(
            _dot(F.col("query_vec"), F.col("item_vec"))
            / (_norm(F.col("query_vec")) * _norm(F.col("item_vec"))),
            6,
        ).alias("cosine"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("item_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "item_id", "cosine", F.col("rn").cast("bigint").alias("rn"))
    )
