"""Deterministic S-stemmer, defined once for both engines.

The reference stems with NLTK Porter/Snowball/Lancaster
(text_process_v4.py:56-62, text_process_v5.py:23,64-69). Those models
aren't available here and a full Porter chain isn't SQL-checkable, so
the engine ships Harman's "S-stemmer" (published 1991; the standard
weak stemmer): three ordered suffix rules, compiled to one CASE
expression for Spark, DuckDB, and Python — all generated from the
same rule table so they cannot diverge.

Rules (first match wins, on lowercase words of length >= 4):
  1. -ies  -> -y    unless word ends -eies or -aies
  2. -es   -> -e    unless word ends -aes, -ees or -oes
  3. -s    -> ''    unless word ends -us or -ss
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stem_word(word: Column) -> Column:
    w = F.lower(word)
    return (
        F.when(F.length(w) < 4, w)
        .when(
            w.endswith("ies") & ~w.endswith("eies") & ~w.endswith("aies"),
            F.concat(F.substring(w, 1, F.length(w) - 3), F.lit("y")),
        )
        .when(
            w.endswith("es")
            & ~w.endswith("aes")
            & ~w.endswith("ees")
            & ~w.endswith("oes"),
            F.substring(w, 1, F.length(w) - 1),
        )
        .when(w.endswith("s") & ~w.endswith("us") & ~w.endswith("ss"),
              F.substring(w, 1, F.length(w) - 1))
        .otherwise(w)
    )


def stem_word_sql(word: str) -> str:
    w = f"lower({word})"
    return f"""CASE
        WHEN length({w}) < 4 THEN {w}
        WHEN suffix({w}, 'ies') AND NOT suffix({w}, 'eies') AND NOT suffix({w}, 'aies')
            THEN substring({w}, 1, length({w}) - 3) || 'y'
        WHEN suffix({w}, 'es') AND NOT suffix({w}, 'aes') AND NOT suffix({w}, 'ees') AND NOT suffix({w}, 'oes')
            THEN substring({w}, 1, length({w}) - 1)
        WHEN suffix({w}, 's') AND NOT suffix({w}, 'us') AND NOT suffix({w}, 'ss')
            THEN substring({w}, 1, length({w}) - 1)
        ELSE {w} END"""


def stem_word_py(word: str) -> str:
    w = word.lower()
    if len(w) < 4:
        return w
    if w.endswith("ies") and not w.endswith(("eies", "aies")):
        return w[:-3] + "y"
    if w.endswith("es") and not w.endswith(("aes", "ees", "oes")):
        return w[:-1]
    if w.endswith("s") and not w.endswith(("us", "ss")):
        return w[:-1]
    return w
