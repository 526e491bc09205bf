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


def _combined_pattern(cfg: ScrubConfig) -> str:
    """Alternation of every rule + toxic pattern (detection only)."""
    pats = [pat for _name, pat, _rep in cfg.rules]
    pats += [_toxic_pattern(t) for t in cfg.toxic_terms]
    return "|".join(f"(?:{p})" for p in pats)


def scrub_col(col: Column, cfg: ScrubConfig | None = None) -> Column:
    """Apply the full ordered scrub chain as native expressions.

    The chain is GATED on one ``rlike`` over the alternation of all
    rule patterns: a document that matches no rule returns the input
    column untouched (byte-identical by construction — each
    ``regexp_replace`` with zero matches is already the identity, so
    the gate changes no value). On web corpora the overwhelming
    majority of documents carry no PII/toxic span, and ungated they
    still paid N_rules full-document copies per row — the hot path is
    allocation-bound at 32 threads, and ``rlike`` stops at the first
    match without materializing anything. Callers pass a plain column
    reference, so its three appearances here cost nothing.
    """
    cfg = cfg or ScrubConfig()
    out = col
    for _name, pat, rep in cfg.rules:
        out = F.regexp_replace(out, pat, rep)
    for term in cfg.toxic_terms:
        out = F.regexp_replace(out, _toxic_pattern(term), cfg.toxic_replacement)
    return F.when(col.rlike(_combined_pattern(cfg)), out).otherwise(col)


def scrub_py(text: str, cfg: ScrubConfig | None = None) -> str:
    """Golden twin (sequential Python re) — must be byte-identical."""
    cfg = cfg or ScrubConfig()
    out = text
    for _name, pat, rep in cfg.rules:
        out = re.sub(pat, rep, out)
    for term in cfg.toxic_terms:
        out = re.sub(_toxic_pattern(term), cfg.toxic_replacement, out)
    return out


def luhn_valid(cand: Column) -> Column:
    """Luhn mod-10 validity of a digit-only string — native HOFs only.

    Real pipelines gate credit-card PII scrubbing on the Luhn checksum
    (ISO/IEC 7812) to cut regex false positives: a 13-19-digit run is
    only treated as a card number when the check digit verifies. The
    whole test runs JVM-side (sequence → transform → aggregate), no
    Python. From the RIGHT, every second digit doubles (−9 when >9);
    the doubled-digit sum must be ≡ 0 (mod 10). NULL in → NULL out;
    the caller guarantees ``cand`` is a non-empty digit run (the
    ``\\d{13,19}`` extraction upstream).
    """
    n = F.length(cand)
    terms = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.when(
            (n - i) % 2 == 1,
            F.when(
                (F.ascii(F.substr(cand, i, F.lit(1))) - 48) * 2 > 9,
                (F.ascii(F.substr(cand, i, F.lit(1))) - 48) * 2 - 9,
            ).otherwise((F.ascii(F.substr(cand, i, F.lit(1))) - 48) * 2),
        ).otherwise(F.ascii(F.substr(cand, i, F.lit(1))) - 48),
    )
    return F.aggregate(terms, F.lit(0), lambda a, x: a + x) % 10 == 0


def luhn_valid_py(s: str) -> bool:
    """Sequential Python twin of :func:`luhn_valid` (differential tests)."""
    total = 0
    for i, ch in enumerate(reversed(s)):
        d = ord(ch) - 48
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


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
