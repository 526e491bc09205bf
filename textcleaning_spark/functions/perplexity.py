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
    # The BOS pad goes through F.lit, NEVER a SQL string literal: Spark
    # SQL does not understand Python's \xNN escapes, so an interpolated
    # repr('\x02') silently becomes the 3-char string "x02" and pollutes
    # the model with phantom bigrams (caught by the whole-batch
    # differential test). The padded string is materialized as a column
    # so the transform lambda references it by NAME only.
    padded = F.concat(F.lit(BOS), F.lower(F.col(text_col)))
    # empty text → padded is just BOS → sequence(1, 0) would default to
    # step -1 and emit phantom rows; guard the bound
    bigrams = F.expr(
        "CASE WHEN length(__padded) > 1 THEN "
        "transform(sequence(1, length(__padded) - 1), "
        "i -> substring(__padded, i, 2)) ELSE array() END"
    )
    counts = (
        df.select(padded.alias("__padded"))
        .select(F.explode(bigrams).alias("bg"))
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


class _VectorBigramModel:
    """Vectorized twin of :class:`BigramModel`: a char-id LUT plus a
    dense (K+1)² log-prob matrix (row 0 / col 0 = any character outside
    the training charset — its add-one-smoothed probability depends
    only on the known context counts, so one shared id is exact).
    Scores a whole pandas batch with numpy gathers + one
    weighted bincount per chunk; per-row log-prob sums accumulate in
    the same left-to-right order as the scalar loop, so doubles match
    bit-for-bit (differential-tested in tests/test_nlp_kernels.py).
    """

    _CHUNK_ROWS = 512  # cache-resident temporaries (see langid.py)

    def __init__(self, counts: dict[str, int]):
        import math

        import numpy as np

        scalar = BigramModel(counts)
        chars = sorted({c for bg in counts for c in bg})
        # BOS always gets its OWN id: if it fell into the shared
        # out-of-charset id 0, the row-separator zeroing below would
        # also zero transitions into every unknown character.
        if BOS not in chars:
            chars.append(BOS)
        self.lut = np.zeros(0x110000, dtype=np.uint16)
        for i, ch in enumerate(chars, start=1):
            self.lut[ord(ch)] = i
        k = len(chars) + 1
        self.logp = np.empty((k, k), dtype=np.float64)
        rev = [None] + chars  # id -> char; id 0 = out-of-charset
        for i in range(k):
            prev = rev[i] if i else "\x00"
            for j in range(k):
                ch = rev[j] if j else "\x00"
                self.logp[i, j] = scalar.log_prob(prev, ch)
        self.bos_id = int(self.lut[ord(BOS)])
        assert self.bos_id != 0

    def score_batch(self, texts: pd.Series) -> pd.Series:
        import numpy as np

        out = np.empty(len(texts), dtype=np.float64)
        vals = texts.fillna("").astype(str).str.lower()
        for lo in range(0, len(texts), self._CHUNK_ROWS):
            chunk = vals.iloc[lo : lo + self._CHUNK_ROWS].tolist()
            n = len(chunk)
            lens = np.fromiter((len(s) for s in chunk), dtype=np.int64, count=n)
            joined = (BOS + BOS.join(chunk)).encode("utf-32-le")
            cp = np.frombuffer(joined, dtype=np.uint32)
            ids = self.lut[cp]
            lp = self.logp[ids[:-1], ids[1:]]
            # transition p predicts char at p+1; transitions INTO a BOS
            # (row separator) belong to no row — zero their weight
            w = np.where(ids[1:] == self.bos_id, 0.0, lp)
            row = np.repeat(np.arange(n, dtype=np.int64), lens + 1)[1:]
            sums = np.bincount(row, weights=w, minlength=n)
            with np.errstate(divide="ignore"):
                out[lo : lo + n] = np.where(
                    lens > 0, np.exp(-sums / np.maximum(lens, 1)), np.inf
                )
        return pd.Series(np.round(out, 6), index=texts.index)


def perplexity_udf(spark, counts: dict[str, int]):
    """Build the scoring UDF with the model shipped via Spark broadcast
    (one deserialization per executor, shared across batches). Scoring
    is whole-batch numpy (north_rule: no per-row Python)."""
    bc = spark.sparkContext.broadcast(counts)
    state: dict[str, _VectorBigramModel] = {}

    @pandas_udf("double")
    def _ppl(texts: pd.Series) -> pd.Series:
        if "m" not in state:
            state["m"] = _VectorBigramModel(bc.value)
        return state["m"].score_batch(texts)

    return _ppl


def with_perplexity(
    spark, df: DataFrame, counts: dict[str, int], text_col: str = "text",
    out_col: str = "ppl",
) -> DataFrame:
    return df.withColumn(out_col, perplexity_udf(spark, counts)(F.col(text_col)))
