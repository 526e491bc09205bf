"""Vectorized NLP annotation kernel (SURVEY.md §2.8 F3-F6, §7.2 step 5).

The reference runs NLTK word_tokenize / PerceptronTagger / WordNet
lemmatizer / Snowball stemmer row-by-row (text_process_v5.py:48-69).
Here ONE Arrow-batched pandas UDF returns a struct of aligned arrays
(tokens, tags, lemmas, stems) per document — one Python round-trip per
batch instead of four per row, with deterministic rule-based models
(tagger: functions/tagger.py; stemmer: functions/stemmer.py; lemmatizer
below) so golden chains are byte-stable.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from textcleaning_spark.functions.stemmer import stem_word_py
from textcleaning_spark.functions.tagger import tag_word_py

# Penn-Treebank-ish tokenizer: word chars (incl. digits) or single
# non-space symbols (quotes, punctuation) — deterministic regex.
_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)

ANNOTATION_SCHEMA = StructType(
    [
        StructField("tokens", ArrayType(StringType())),
        StructField("tags", ArrayType(StringType())),
        StructField("lemmas", ArrayType(StringType())),
        StructField("stems", ArrayType(StringType())),
    ]
)


def tokenize_py(text: str) -> list[str]:
    return _TOKEN_RE.findall(text or "")


def lemmatize_py(word: str, tag: str) -> str:
    """POS-aware rule lemmatizer (get_wordnet_pos mapping semantics,
    utils.py:35-46: J→adj, V→verb, N→noun, R→adv, default noun)."""
    w = word.lower()
    if tag.startswith("V"):
        if w.endswith("ing") and len(w) > 5:
            return w[:-3]
        if w.endswith("ed") and len(w) > 4:
            return w[:-2]
        if w.endswith("s") and not w.endswith("ss") and len(w) > 3:
            return w[:-1]
        return w
    if tag.startswith("N"):
        return stem_word_py(w)  # S-stemmer handles plural nouns
    if tag.startswith("R") and w.endswith("ly") and len(w) > 4:
        return w[:-2]
    return w


_WORD_CACHE: dict[str, tuple[str, str, str]] = {}
_WORD_CACHE_MAX = 1_000_000  # all three kernels are pure functions of
# the token, and real text is Zipfian — a per-executor memo turns the
# per-token work into a dict hit for all but first occurrences


def annotate_py(text: str) -> dict:
    toks = tokenize_py(text)
    tags, lemmas, stems = [], [], []
    for t in toks:
        e = _WORD_CACHE.get(t)
        if e is None:
            g = tag_word_py(t)
            e = (g, lemmatize_py(t, g), stem_word_py(t))
            if len(_WORD_CACHE) < _WORD_CACHE_MAX:
                _WORD_CACHE[t] = e
        tags.append(e[0])
        lemmas.append(e[1])
        stems.append(e[2])
    return {"tokens": toks, "tags": tags, "lemmas": lemmas, "stems": stems}


@pandas_udf(ANNOTATION_SCHEMA)
def annotate_udf(texts: pd.Series) -> pd.DataFrame:
    rows = [annotate_py(t) for t in texts]
    return pd.DataFrame(rows)


def with_annotations(df, text_col: str = "text", out_col: str = "nlp"):
    """df + nlp struct column; downstream stages use nlp.tokens etc.
    (explode stays native — only the kernel crosses into Python)."""
    return df.withColumn(out_col, annotate_udf(F.col(text_col)))
