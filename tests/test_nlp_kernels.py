"""Unit tests for the Python kernels: NLP annotation struct, langid,
perplexity, tagger/stemmer golden chains (reference-style golden
examples, cf. text_process_v5.py:341-388)."""

from __future__ import annotations

from pyspark.sql import functions as F

from textcleaning_spark.functions.langid import predict_lang_py
from textcleaning_spark.functions.nlp import (
    annotate_py,
    lemmatize_py,
    tokenize_py,
    with_annotations,
)
from textcleaning_spark.functions.perplexity import (
    BigramModel,
    train_char_bigram,
    with_perplexity,
)
from textcleaning_spark.functions.stemmer import stem_word_py
from textcleaning_spark.functions.tagger import tag_word_py
from textcleaning_spark.sources.pages import generate_pages


def test_tokenizer_golden():
    assert tokenize_py("Shape-memory alloy (nitinol).") == [
        "Shape", "-", "memory", "alloy", "(", "nitinol", ")", ".",
    ]


def test_tagger_golden_chains():
    # suffix rules
    assert tag_word_py("cleaning") == "VBG"
    assert tag_word_py("filtered") == "VBD"
    assert tag_word_py("quickly") == "RB"
    assert tag_word_py("alloys") == "NNS"
    assert tag_word_py("42") == "CD"
    # lexicon beats suffix ("the" before any suffix rule)
    assert tag_word_py("the") == "DT"
    assert tag_word_py("is") == "VB"
    assert tag_word_py("memory") == "NN"


def test_stemmer_golden_chains():
    assert stem_word_py("alloys") == "alloy"
    assert stem_word_py("bodies") == "body"
    assert stem_word_py("classes") == "classe"  # -es rule drops one char
    assert stem_word_py("glass") == "glass"  # -ss protected
    assert stem_word_py("virus") == "virus"  # -us protected
    assert stem_word_py("gas") == "gas"  # len<4 untouched


def test_lemmatizer_pos_aware():
    assert lemmatize_py("cleaning", "VBG") == "clean"
    assert lemmatize_py("filtered", "VBD") == "filter"
    assert lemmatize_py("alloys", "NNS") == "alloy"
    assert lemmatize_py("quickly", "RB") == "quick"


def test_annotate_struct_aligned():
    out = annotate_py("The alloys are cleaning quickly")
    n = len(out["tokens"])
    assert n == 5
    assert len(out["tags"]) == len(out["lemmas"]) == len(out["stems"]) == n


def test_annotate_batch_matches_scalar_whole_corpus(spark):
    """Whole-batch differential: the vectorized factorize+gather kernel
    vs the scalar twin over the synthetic corpus + edge rows."""
    import pandas as pd

    from textcleaning_spark.functions.nlp import annotate_batch

    texts = [
        r["text"]
        for r in generate_pages(spark, 200, seed=17, partitions=4)
        .select("text")
        .collect()
    ] + ["", None, ",", "The Devices ARE cleaning; 42 naïve 한국어!"]
    out = annotate_batch(pd.Series(texts, dtype="object"))
    for i, t in enumerate(texts):
        want = annotate_py(t or "")
        for k in ("tokens", "tags", "lemmas", "stems"):
            assert list(out.iloc[i][k]) == want[k], (i, k)


def test_annotate_udf_matches_py(spark):
    pages = generate_pages(spark, 50, seed=3, partitions=4)
    rows = (
        with_annotations(pages, "text")
        .select("text", "nlp")
        .collect()
    )
    for r in rows:
        want = annotate_py(r["text"])
        assert list(r["nlp"]["tokens"]) == want["tokens"]
        assert list(r["nlp"]["tags"]) == want["tags"]
        assert list(r["nlp"]["lemmas"]) == want["lemmas"]
        assert list(r["nlp"]["stems"]) == want["stems"]


def test_langid_distinguishes_languages():
    assert predict_lang_py("the stream filter window quality table") == "en"
    assert predict_lang_py("strom fenster tabelle dokument qualitaet") == "de"
    assert predict_lang_py("flux fenetre tableau document qualite") == "fr"
    assert predict_lang_py("") == "und"


_EDGE_TEXTS = [
    "", " ", "a", "zz", None, "the stream filter window quality table",
    "flux fenetre tableau document qualite", "ZZQQ ### $$$",
    "naïve café Straße — 한국어 특허 문서",  # multi-byte codepoints
    "x" * 3000,
]


def test_langid_batch_matches_scalar_whole_corpus(spark):
    """Whole-batch differential: predict_lang_batch vs the scalar twin
    over the synthetic corpus + adversarial edge rows (the guarantee
    langid.py's docstring states)."""
    import pandas as pd

    from textcleaning_spark.functions.langid import predict_lang_batch

    texts = [r["text"] for r in generate_pages(spark, 300, seed=11, partitions=4)
             .select("text").collect()] + _EDGE_TEXTS
    got = predict_lang_batch(pd.Series(texts, dtype="object")).tolist()
    want = [predict_lang_py(t or "") for t in texts]
    assert got == want


def test_perplexity_batch_matches_scalar_whole_corpus(spark):
    """Whole-batch differential: _VectorBigramModel.score_batch vs the
    scalar BigramModel over the synthetic corpus + edge rows
    (perplexity.py's stated bit-for-bit guarantee, visible through the
    round-6 output contract)."""
    import math

    import pandas as pd

    from textcleaning_spark.functions.perplexity import _VectorBigramModel

    pages = generate_pages(spark, 200, seed=13, partitions=4)
    counts = train_char_bigram(pages.limit(80), "text")
    scalar = BigramModel(counts)
    vec = _VectorBigramModel(counts)
    texts = [r["text"] for r in pages.select("text").collect()] + _EDGE_TEXTS
    got = vec.score_batch(pd.Series(texts, dtype="object")).tolist()
    for g, t in zip(got, texts):
        w = scalar.perplexity(t or "")
        if math.isinf(w):
            assert math.isinf(g)
        else:
            assert g == round(w, 6), (t, g, w)


def test_perplexity_clean_below_junk(spark):
    pages = generate_pages(spark, 100, seed=5, partitions=4)
    counts = train_char_bigram(pages.limit(50), "text")
    assert len(counts) > 10
    model = BigramModel(counts)
    clean = model.perplexity("the stream filter window quality table document")
    junk = model.perplexity("zzqq ### $$$ ^^^ @@@@ ~~~~~ %%%%")
    assert clean < junk
    scored = with_perplexity(spark, pages, counts, "text").select("text", "ppl")
    row = scored.first()
    assert abs(row["ppl"] - round(model.perplexity(row["text"]), 6)) < 1e-9
