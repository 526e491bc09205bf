"""Deterministic rule-based POS tagger, defined once for both engines.

The reference tags with NLTK's PerceptronTagger (text_process.py:261,
text_process_v5.py:25). That model isn't available here and a learned
tagger isn't SQL-checkable, so the engine ships a deterministic
suffix/lexicon tagger in the style of NLTK's classic RegexpTagger
(public pattern set): an ordered rule list compiled to ONE native CASE
expression — pure JVM codegen in Spark, and the identical CASE in the
DuckDB oracle. Tags are Penn-Treebank so the reference's stop-POS
levels (utils.py:230-243) apply unchanged.

Rules are data (ordered, first match wins); both engine forms are
generated from the same table, so they cannot diverge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# punctuation rules FIRST (exact, case-sensitive on the raw token):
# Penn-Treebank punctuation classes — measured against the reference's
# recorded PerceptronTagger outputs (text_process_v5.py:358-388), which
# tag ',' as ',' etc.; these tags are in the stop-POS lists, so getting
# them wrong flips keep/drop on punctuation tokens.
PUNCT: tuple[tuple[tuple[str, ...], str], ...] = (
    ((",",), ","),
    ((".", "!", "?"), "."),
    ((":", ";", "--"), ":"),
    (("(", "["), "("),
    ((")", "]"), ")"),
    (("$",), "$"),
    (("#",), "#"),
    (("``",), "``"),
    (("''", '"'), "''"),
)

# NNP rules (the reference's tagger tags unknown capitalized words and
# all-caps acronyms/headline words NNP — see the golden chains where
# an ALL-CAPS title is tagged NNP throughout, including 'AND'):
# all-caps fires BEFORE the lexicon ('AND' → NNP, not CC); first-letter
# capitalization fires AFTER it ('The' stays DT).
ALLCAPS_RE = "^[A-Z]{2,}$"
CAPITALIZED_RE = "^[A-Z]"

# lexicon rules: exact lowercase word -> tag (first match wins)
LEXICON: tuple[tuple[tuple[str, ...], str], ...] = (
    (("a", "an", "the"), "DT"),
    (("and", "or", "but", "nor"), "CC"),
    (("of", "in", "on", "for", "with", "at", "by", "from", "as",
      "into", "through", "during", "before", "after", "above", "below",
      "under", "over", "about", "between"), "IN"),
    (("to",), "TO"),
    (("is", "are", "was", "were", "be", "been", "being", "am"), "VB"),
    (("he", "she", "it", "they", "we", "you", "i", "them", "him", "her",
      "us", "me"), "PRP"),
    (("his", "its", "their", "our", "your", "my"), "PRP$"),
    (("can", "will", "may", "must", "shall", "would", "could", "should",
      "might"), "MD"),
    (("not", "very", "too", "so", "just", "also", "there", "then", "now"),
     "RB"),
    (("what", "which", "who", "whom"), "WP"),
    (("when", "where", "why", "how"), "WRB"),
    (("this", "that", "these", "those", "all", "any", "both", "each",
      "some", "such", "no"), "DT"),
)

# suffix rules applied after the lexicon: (suffix, min_word_len, tag)
SUFFIXES: tuple[tuple[str, int, str], ...] = (
    ("ing", 5, "VBG"),
    ("ed", 4, "VBD"),
    ("ly", 4, "RB"),
    ("est", 5, "JJS"),
    ("ous", 4, "JJ"),
    ("ful", 4, "JJ"),
    ("less", 5, "JJ"),
    ("ive", 4, "JJ"),
    ("able", 5, "JJ"),
    ("ible", 5, "JJ"),
    ("ical", 5, "JJ"),
    ("ment", 5, "NN"),
    ("ness", 5, "NN"),
    ("tion", 5, "NN"),
    ("sion", 5, "NN"),
    ("er", 4, "NN"),
    ("or", 4, "NN"),
    ("s", 4, "NNS"),
)

NUMBER_RE = "^[0-9]+([.,][0-9]+)*$"
DEFAULT_TAG = "NN"

# Context rule (round 3, REFERENCE_PARITY.md): a SINGLE capital letter is
# lexically ambiguous — bare it is the article ('A quick fox' → DT), but
# inside an all-caps span it follows the span's NNP treatment (the
# reference's PerceptronTagger tags 'A' in an ALL-CAPS title NNP,
# text_process_v5.py:341-388 goldens — the one keep/drop disagreement in
# round 2). Word-level rules can't see the span, so this is a sequence
# rule: single capital letter whose previous OR next token is all-caps
# (>=2 letters) → NNP. Applied by tag_tokens_py / the batch kernel /
# the SQL ctx form — all generated from these two regexes.
SINGLE_CAP_RE = "^[A-Z]$"


def tag_tokens_py(tokens: list[str]) -> list[str]:
    """Sequence-level tagging: word-level CASE + the all-caps-span
    context rule. Python twin of nlp.annotate_batch's vectorized form
    and of tag_word_ctx_sql."""
    import re

    tags = [tag_word_py(t) for t in tokens]
    allcaps = [re.match(ALLCAPS_RE, t) is not None for t in tokens]
    for i, t in enumerate(tokens):
        if re.match(SINGLE_CAP_RE, t) and (
            (i > 0 and allcaps[i - 1])
            or (i + 1 < len(tokens) and allcaps[i + 1])
        ):
            tags[i] = "NNP"
    return tags


def tag_word_ctx_sql(word: str, prev_w: str, next_w: str) -> str:
    """DuckDB CASE for sequence-level tagging: ``word``/``prev_w``/
    ``next_w`` are SQL expressions (prev/next may be NULL at row edges).
    Identical semantics to tag_tokens_py."""
    return (
        f"CASE WHEN regexp_matches({word}, '{SINGLE_CAP_RE}') AND ("
        f"regexp_matches(coalesce({prev_w}, ''), '{ALLCAPS_RE}') OR "
        f"regexp_matches(coalesce({next_w}, ''), '{ALLCAPS_RE}')) "
        f"THEN 'NNP' ELSE {tag_word_sql(word)} END"
    )


def tag_word(word: Column) -> Column:
    """Spark CASE expression tagging one (already tokenized) word."""
    low = F.lower(word)
    out = None

    def _chain(prev, cond, tag):
        return F.when(cond, F.lit(tag)) if prev is None else prev.when(cond, F.lit(tag))

    for words, tag in PUNCT:
        out = _chain(out, word.isin(*words), tag)
    out = out.when(word.rlike(ALLCAPS_RE), F.lit("NNP"))
    for words, tag in LEXICON:
        out = out.when(low.isin(*words), F.lit(tag))
    out = out.when(low.rlike(NUMBER_RE), F.lit("CD"))
    out = out.when(word.rlike(CAPITALIZED_RE), F.lit("NNP"))
    for suf, min_len, tag in SUFFIXES:
        out = out.when(
            low.endswith(suf) & (F.length(word) >= min_len), F.lit(tag)
        )
    return out.otherwise(F.lit(DEFAULT_TAG))


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def tag_word_sql(word: str) -> str:
    """Identical CASE expression as DuckDB SQL over expression ``word``."""
    low = f"lower({word})"
    parts = ["CASE"]
    for words, tag in PUNCT:
        inlist = ", ".join(_sql_str(w) for w in words)
        parts.append(f"WHEN {word} IN ({inlist}) THEN {_sql_str(tag)}")
    parts.append(f"WHEN regexp_matches({word}, '{ALLCAPS_RE}') THEN 'NNP'")
    for words, tag in LEXICON:
        inlist = ", ".join(_sql_str(w) for w in words)
        parts.append(f"WHEN {low} IN ({inlist}) THEN '{tag}'")
    parts.append(f"WHEN regexp_matches({low}, '{NUMBER_RE}') THEN 'CD'")
    parts.append(f"WHEN regexp_matches({word}, '{CAPITALIZED_RE}') THEN 'NNP'")
    for suf, min_len, tag in SUFFIXES:
        parts.append(
            f"WHEN suffix({low}, '{suf}') AND length({word}) >= {min_len} "
            f"THEN '{tag}'"
        )
    parts.append(f"ELSE '{DEFAULT_TAG}' END")
    return " ".join(parts)


def tag_word_py(word: str) -> str:
    """Pure-Python twin (used by the golden pandas oracle in tests)."""
    import re

    for words, tag in PUNCT:
        if word in words:
            return tag
    if re.match(ALLCAPS_RE, word):
        return "NNP"
    low = word.lower()
    for words, tag in LEXICON:
        if low in words:
            return tag
    if re.match(NUMBER_RE, low):
        return "CD"
    if re.match(CAPITALIZED_RE, word):
        return "NNP"
    for suf, min_len, tag in SUFFIXES:
        if low.endswith(suf) and len(word) >= min_len:
            return tag
    return DEFAULT_TAG
