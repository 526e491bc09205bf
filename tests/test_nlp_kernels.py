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
