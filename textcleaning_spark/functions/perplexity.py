"""KenLM-style n-gram perplexity as a vectorized pandas UDF.

The north-star scores documents with a KenLM n-gram LM; that binary
isn't shippable here, so the engine trains its own character-bigram
model WITH SPARK (explode + groupBy over a reference corpus — the
model-building is itself a distributed aggregation), broadcasts the
count table (tiny: |charset|² entries), and scores with an
Arrow-batched pandas UDF. The UDF shape (broadcast model, Series →
Series, add-one smoothing, ppl = exp(-mean log p)) is exactly the
KenLM integration pattern.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

BOS = "\x02"


def train_char_bigram(df: DataFrame, text_col: str = "text") -> dict[str, int]:
    """Distributed training pass: one row per character bigram →
    hash-aggregated counts. Returns the (small) count dict; the unigram
    context counts are derivable (key[0] marginal)."""
    lowered = F.lower(F.col(text_col))
    padded = F.concat(F.lit(BOS), lowered)
    # bigram i = substring(i, 2); sequence over the string length
    bigrams = F.expr(
        f"transform(sequence(1, length({BOS!r} || lower({text_col})) - 1), "
        f"i -> substring({BOS!r} || lower({text_col}), i, 2))"
    )
    counts = (
        df.select(F.explode(bigrams).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    return {r["bg"]: int(r["cnt"]) for r in counts}


class BigramModel:
    """Add-one-smoothed char bigram LM built from a count dict."""

    def __init__(self, counts: dict[str, int]):
        self.counts = counts
        self.context: dict[str, int] = {}
        charset = set()
        for bg, c in counts.items():
            self.context[bg[0]] = self.context.get(bg[0], 0) + c
            charset.update(bg)
        self.v = max(len(charset), 1)

    def log_prob(self, prev: str, ch: str) -> float:
        num = self.counts.get(prev + ch, 0) + 1
        den = self.context.get(prev, 0) + self.v
        return math.log(num / den)

    def perplexity(self, text: str) -> float:
        t = (text or "").lower()
        if not t:
            return float("inf")
        lp = 0.0
        prev = BOS
        for ch in t:
            lp += self.log_prob(prev, ch)
            prev = ch
        return math.exp(-lp / len(t))


def perplexity_udf(spark, counts: dict[str, int]):
    """Build the scoring UDF with the model shipped via Spark broadcast
    (one deserialization per executor, shared across batches)."""
    bc = spark.sparkContext.broadcast(counts)

    @pandas_udf("double")
    def _ppl(texts: pd.Series) -> pd.Series:
        model = BigramModel(bc.value)
        return texts.map(lambda t: round(model.perplexity(t), 6))

    return _ppl


def with_perplexity(
    spark, df: DataFrame, counts: dict[str, int], text_col: str = "text",
    out_col: str = "ppl",
) -> DataFrame:
    return df.withColumn(out_col, perplexity_udf(spark, counts)(F.col(text_col)))
