"""PII / toxicity scrub (north_rule; F9 generalized).

The scrub chain is NATIVE ``regexp_replace`` — it runs inside
whole-stage codegen, not Python. The pure-Python twin exists only for
the golden byte-identity tests (Python ``re`` and Java regex agree on
this portable pattern subset: no lookbehind, no backrefs).

Byte contract: documents that hit no rule pass through byte-identical
(SURVEY.md §7.4 risk 1).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from textcleaning_spark.config import ScrubConfig


def _toxic_pattern(term: str) -> str:
    return rf"\b{re.escape(term)}\b"


def scrub_col(col: Column, cfg: ScrubConfig | None = None) -> Column:
    """Apply the full ordered scrub chain as native expressions."""
    cfg = cfg or ScrubConfig()
    out = col
    for _name, pat, rep in cfg.rules:
        out = F.regexp_replace(out, pat, rep)
    for term in cfg.toxic_terms:
        out = F.regexp_replace(out, _toxic_pattern(term), cfg.toxic_replacement)
    return out


def scrub_py(text: str, cfg: ScrubConfig | None = None) -> str:
    """Golden twin (sequential Python re) — must be byte-identical."""
    cfg = cfg or ScrubConfig()
    out = text
    for _name, pat, rep in cfg.rules:
        out = re.sub(pat, rep, out)
    for term in cfg.toxic_terms:
        out = re.sub(_toxic_pattern(term), cfg.toxic_replacement, out)
    return out


def rule_hits(col: Column, cfg: ScrubConfig | None = None) -> Column:
    """Struct of per-rule hit counts (native regexp_count) — feeds the
    audit/metrics table."""
    cfg = cfg or ScrubConfig()
    fields = [
        F.regexp_count(col, F.lit(pat)).cast("bigint").alias(name)
        for name, pat, _rep in cfg.rules
    ]
    tox = None
    for term in cfg.toxic_terms:
        c = F.regexp_count(col, F.lit(_toxic_pattern(term)))
        tox = c if tox is None else tox + c
    fields.append((tox if tox is not None else F.lit(0)).cast("bigint").alias("toxic"))
    return F.struct(*fields)
