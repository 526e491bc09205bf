"""Property-based tests (hypothesis) over the pure-Python golden twins.

Each Spark kernel has a sequential twin (scrub_py, stem_word_py,
predict_lang_py, golden keep) used by the byte-identity golden tests;
these properties pin the twins' algebraic contracts, which therefore
also constrain the Spark expressions that must match them byte-for-
byte. Driver-side only — no SparkSession, so they run in milliseconds.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from textcleaning_spark.config import ScrubConfig
from textcleaning_spark.functions.langid import predict_lang_py
from textcleaning_spark.functions.scrub import scrub_py
from textcleaning_spark.functions.stemmer import stem_word_py

CFG = ScrubConfig(toxic_terms=("badword",))

text_strategy = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=400,
)


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_scrub_idempotent(t):
    """Scrubbing an already-scrubbed text changes nothing — replacement
    tokens must never re-match any rule."""
    once = scrub_py(t, CFG)
    assert scrub_py(once, CFG) == once


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_scrub_removes_all_pii(t):
    """No rule pattern survives in the output."""
    out = scrub_py(t, CFG)
    for _name, pat, _rep in CFG.rules:
        assert re.search(pat, out) is None, (pat, out)


_LOCAL = st.text(
    alphabet=st.sampled_from("abcdefABCDEF0123456789._%+-"), min_size=1, max_size=30
)
_DOMAIN = st.text(
    alphabet=st.sampled_from("abcdefABCDEF0123456789-"), min_size=1, max_size=20
)


@settings(max_examples=200, deadline=None)
@given(_LOCAL, _DOMAIN, st.sampled_from(["com", "org", "co", "io", "museum"]))
def test_scrub_catches_emails(local, dom, tld):
    """Every common-shape email is caught. (Deliberately NOT st.emails():
    the C4-style scrub targets the common shape, not full RFC 5321 —
    quoted/brace local parts are out of contract.)"""
    addr = f"{local}@{dom}.{tld}"
    out = scrub_py(f"contact {addr} now", CFG)
    assert addr not in out


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz"), min_size=1, max_size=20))
def test_stemmer_idempotent_and_prefix(w):
    """S-stemmer: applying twice == once, and the stem is a prefix of
    the word (it only strips suffixes)."""
    s = stem_word_py(w)
    assert stem_word_py(s) == s or len(s) <= 3
    assert w.startswith(s) or s == w


@settings(max_examples=100, deadline=None)
@given(text_strategy)
def test_langid_total_function(t):
    """Language ID never raises and always returns a known label."""
    lang = predict_lang_py(t)
    assert isinstance(lang, str) and lang != ""


# ---------------------------------------------------------------------------
# PPJoin prefix + length bounds (operators/dedup.py) — the losslessness
# claim, pinned over random set corpora and thresholds. The Spark side
# uses EXACTLY these formulas (rn <= sz - ceil(t*sz) + 1 under the
# (df asc, element asc) order; t*sz_a <= sz_b length bound) with t as a
# Decimal literal; a counterexample here would be a silently dropped
# near-dup pair at 100 TB.
# ---------------------------------------------------------------------------
_sets_strategy = st.lists(
    st.frozensets(st.integers(0, 25), min_size=1, max_size=12),
    min_size=2,
    max_size=8,
)


@settings(max_examples=500, deadline=None)
@given(_sets_strategy, st.sampled_from(["0.5", "0.6", "0.75", "0.8", "0.9", "0.96", "1.0"]))
def test_ppjoin_bounds_lossless(sets, t_str):
    """Every pair with Jaccard >= t (exact rational compare) must pass
    the length bound AND share at least one element inside both
    prefixes — for any document-frequency distribution the corpus
    induces, including ties."""
    import math
    from collections import Counter
    from decimal import Decimal
    from fractions import Fraction

    t = Decimal(t_str)
    t_frac = Fraction(t)
    df = Counter(e for s in sets for e in s)

    def prefix(s):
        sz = len(s)
        plen = sz - math.ceil(t * sz) + 1
        return set(sorted(s, key=lambda e: (df[e], e))[:plen])

    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            jac = Fraction(len(a & b), len(a | b))
            if jac < t_frac:
                continue
            sza, szb = len(a), len(b)
            assert Decimal(szb) >= t * sza and Decimal(sza) >= t * szb
            assert prefix(a) & prefix(b), (sorted(a), sorted(b), t_str)
