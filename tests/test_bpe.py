"""BPE trainer/tokenizer: distributed-vs-sequential differential,
merge-fold overlap semantics, reconstruction identity, early stop."""

from __future__ import annotations

from pyspark.sql import functions as F

from textcleaning_spark.operators.bpe import (
    END,
    _apply_merge,
    apply_merges_py,
    bpe_tokens_udf,
    train_bpe,
    train_bpe_py,
    word_vocab,
)
from textcleaning_spark.sources.registry import load_table


def _vocab_df(spark, counts: dict[str, int]):
    return spark.createDataFrame(
        [(w, c) for w, c in counts.items()], "word string, cnt bigint"
    )


def test_trainer_differential_toy(spark):
    counts = {"lower": 5, "lowest": 3, "newer": 6, "wider": 2, "new": 4}
    got = train_bpe(_vocab_df(spark, counts), n_merges=12)
    want = train_bpe_py(counts, n_merges=12)
    assert got == want


def test_trainer_differential_corpus(spark):
    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select("text")
    vocab = word_vocab(docs).localCheckpoint()
    counts = {r["word"]: r["cnt"] for r in vocab.collect()}
    got = train_bpe(vocab, n_merges=10)
    assert got == train_bpe_py(counts, n_merges=10)
    assert len(got) == 10 and all(s >= 2 for _, _, s in got)


def test_merge_fold_overlap_semantics(spark):
    """'aaaa' + (a,a) → [aa, aa]; 'aaa' → [aa, a] (greedy leftmost)."""
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["b", "a"],)],
        "syms array<string>",
    )
    out = [r["m"] for r in df.select(_apply_merge(F.col("syms"), "a", "a").alias("m")).collect()]
    assert out == [["aa", "a"], ["aa", "aa"], ["b", "a"]]


def test_reconstruction_identity(spark):
    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select("text")
    vocab = word_vocab(docs).localCheckpoint()
    merges = train_bpe(vocab, n_merges=16)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    for r in vocab.collect():
        w = r["word"]
        assert "".join(apply_merges_py(w, ranks)) == w + END, w


def test_tokens_udf_matches_python(spark):
    counts = {"stream": 3, "streams": 2, "steam": 1}
    merges = train_bpe_py(counts, n_merges=6)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    df = spark.createDataFrame(
        [(["stream", "steam"],), (["streams", "streams", "stream"],)],
        "toks array<string>",
    )
    got = [r["n"] for r in df.select(bpe_tokens_udf(merges)(F.col("toks")).alias("n")).collect()]
    want = [
        sum(len(apply_merges_py(w, ranks)) for w in toks)
        for toks in (["stream", "steam"], ["streams", "streams", "stream"])
    ]
    assert got == want


def test_early_stop_min_count(spark):
    # every pair unique ⇒ best support 1 < min_count ⇒ no merges
    got = train_bpe(_vocab_df(spark, {"abc": 1, "xyz": 1}), n_merges=8, min_count=2)
    assert got == []
