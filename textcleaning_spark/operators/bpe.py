"""Distributed BPE subword tokenizer: train on the corpus, apply at scale.

Byte-pair encoding (Sennrich, Haddow & Birch, ACL 2016 — the public
algorithm behind GPT-2/RoBERTa vocabularies) trained the way the
original paper does: over the **distinct-word frequency table**, not
the raw corpus. That separation is the whole scale story:

- ``word_vocab``: ONE corpus scan → (word, cnt). The corpus never
  participates again; at 10¹² documents the vocab table is ~10⁸ rows
  (Heaps' law), thousands of times smaller than the corpus.
- ``train_bpe``: per merge round, one vocab-sized aggregation
  (adjacent symbol pairs weighted by word count → global argmax) and
  one vocab-sized rewrite applying the winning merge. The argmax
  collects ONE row to the driver; rewrites are native fold
  expressions (no Python); the vocab frame is localCheckpoint'ed per
  round so plan size stays constant (connected_components
  discipline). k merges = k small shuffles over the shrinking-symbol
  vocab table.
- ``bpe_tokens_udf``: inference is the fast path real tokenizers use
  — the learned merge list broadcasts as a rank table inside an
  Arrow-batched pandas UDF; each batch applies merges greedily by
  rank. Corpus-sized work crosses into Python exactly once,
  vectorized, like functions/langid.py.

Determinism: the winning pair each round is (max summed count, then
lexicographically smallest pair) — a total order, so training is a
pure function of the vocab table. ``train_bpe_py`` is the sequential
twin (same tie-breaks), differential-tested in tests/test_bpe.py.

Reference analogue: the reference tokenizes at word granularity only
(word_tokenize, text_process.py:259); subword vocabularies are the
engine's LLM-pipeline extension (token budgeting, fertility planning).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from textcleaning_spark.functions import text as T

END = "</w>"  # word-end marker, its own symbol (Sennrich et al. §3.2)


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the corpus — one scan, one shuffle on word."""
    return (
        docs.select(F.explode(T.tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _symbolize(vocab: DataFrame) -> DataFrame:
    """word → array of single-char symbols + the END symbol.
    (expr form: F.substring needs a literal start, substr(word, i, 1)
    with a lambda-bound i does not.)"""
    chars = F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))")
    return vocab.select(
        "word", "cnt", F.concat(chars, F.array(F.lit(END))).alias("syms")
    )


def _adjacent_pairs(syms: Column) -> Column:
    """Adjacent (a, b) symbol pairs as structs — the arrays_zip-on-
    slices idiom (one pass, no per-position slicing)."""
    n = F.size(syms)
    return F.arrays_zip(
        F.slice(syms, 1, n - 1).alias("a"),
        F.slice(syms, 2, n - 1).alias("b"),
    )


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy leftmost fold replacing adjacent (a, b) with a+b —
    native aggregate expression, the exact sequential-semantics twin
    of the paper's merge step (handles overlaps: 'aaa' + (a,a) →
    ['aa','a'])."""
    return F.aggregate(
        syms,
        F.array().cast(ArrayType(StringType())),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(
    vocab: DataFrame, n_merges: int = 32, min_count: int = 2
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` merges; returns [(a, b, support)] in
    rank order. Stops early when the best pair's summed count drops
    below ``min_count`` (nothing left worth merging)."""
    cur = _symbolize(vocab).localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            cur.select("cnt", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").cast("bigint").alias("support"))
            .orderBy(F.desc("support"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0]["support"] < min_count:
            break
        a, b, support = best[0]["a"], best[0]["b"], int(best[0]["support"])
        merges.append((a, b, support))
        cur = cur.select(
            "word", "cnt", _apply_merge(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=False)
    return merges


def train_bpe_py(
    word_counts: dict[str, int], n_merges: int = 32, min_count: int = 2
) -> list[tuple[str, str, int]]:
    """Sequential twin of :func:`train_bpe` — same tie-breaks, used as
    the differential truth in tests."""
    vocab = {w: list(w) + [END] for w in word_counts}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # max support, ties to the lexicographically smallest (a, b) —
        # the same total order as train_bpe's orderBy
        top = max(pairs.values())
        if top < min_count:
            break
        a, b = min(p for p, c in pairs.items() if c == top)
        merges.append((a, b, int(top)))
        merged = a + b
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def apply_merges_py(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-order application (the GPT-2 inference loop)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def detok_udf(merges: list[tuple[str, str, int]]):
    """word → its BPE symbols re-joined: the reconstruction-identity
    probe (must equal word + END for every vocabulary word)."""
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}

    @F.pandas_udf("string")
    def detok(words: pd.Series) -> pd.Series:
        return words.map(lambda w: "".join(apply_merges_py(w, ranks)))

    return detok


def bpe_tokens_udf(merges: list[tuple[str, str, int]]):
    """Arrow-batched tokenizer: tokens array → BPE symbol count per
    document. The merge table rides the closure (broadcast-by-
    serialization — a few KB), so the corpus-sized pass is one
    vectorized Python stage."""
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}

    @F.pandas_udf("bigint")
    def n_bpe_tokens(tokens: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def count(toks):
            total = 0
            for w in toks:
                n = cache.get(w)
                if n is None:
                    n = len(apply_merges_py(w, ranks))
                    cache[w] = n
                total += n
            return total

        return tokens.map(count)

    return n_bpe_tokens
