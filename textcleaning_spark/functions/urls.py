"""URL canonicalization, defined for BOTH engines.

Common-Crawl-style corpora key documents by url (BASELINE.json
input_hint), and the same page is recrawled under many surface forms:
scheme variants, ``www.`` prefixes, tracking query parameters
(``utm_*``/``fbclid``/``gclid``), fragments, trailing slashes, mixed
case. Canonicalizing BEFORE url-level dedup is the first dedup stage of
every web pipeline (the reference keys its corpus per document file —
text_process.py:41-47 — so url identity is the engine's own addition,
required by the north-star's "byte-identical text per url" contract).

One spec, two emitters: :func:`canonical_url` returns the Spark Column,
:func:`canonical_url_sql` the DuckDB fragment. The steps are ordered so
each regex is anchored or globally applied identically in both engines
(Spark ``regexp_replace`` is always-global; DuckDB needs the ``'g'``
flag on the one unanchored step). Patterns are RE2-safe (no
lookaround/backrefs) so Java regex and RE2 agree.

Steps, in order:

1. lowercase (hosts are case-insensitive; path case-folding is the
   standard aggressive-canonicalizer choice, e.g. BUbiNG/Heritrix).
2. drop the fragment (``#...`` — never sent to the server).
3. drop the scheme (``http://`` vs ``https://`` recrawl identically).
4. drop a leading ``www.``.
5. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``) while
   preserving all other query parameters.
6. strip a now-dangling ``?``/``&`` and any trailing slashes.

All native ``lower``/``regexp_replace`` — whole-stage codegen'd, no
Python. At 100 TB this runs scan-side before the dedup shuffle, so the
shuffle keys on the (shorter) canonical string — or better, on
``xxhash64(canonical)`` as the dedup operators do.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, needs_global) — applied in order to the lowercased input.
_STEPS: tuple[tuple[str, bool], ...] = (
    (r"#.*$", False),          # fragment (first match == only match: anchored tail)
    (r"^https?://", False),    # scheme
    (r"^www\.", False),        # www prefix
    # tracking params with their own separator; next param (if any)
    # slides left onto the surviving '?'/'&'. Unanchored -> global.
    (r"(utm_[a-z0-9]+|fbclid|gclid)=[^&#]*&?", True),
    (r"[?&]+$", False),        # dangling separator left by step 4
    (r"/+$", False),           # trailing slashes
)


def canonical_url(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    out = F.lower(c)
    for pat, _ in _STEPS:
        out = F.regexp_replace(out, pat, "")
    return out


def canonical_url_sql(col: str) -> str:
    out = f"lower({col})"
    for pat, is_global in _STEPS:
        flag = ", 'g'" if is_global else ""
        # standard SQL literals: '' escapes a quote; backslashes pass
        # through verbatim (DuckDB does NOT process \-escapes), so the
        # Java-regex pattern string is reused as-is for RE2
        sql_pat = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', ''{flag})"
    return out


def host(canonical: Column) -> Column:
    """Host of a CANONICAL url (everything before the first ``/`` or
    ``?``). Domain-level policy — C4's badlist, RefinedWeb's blocklist,
    per-host keep-rate reports — keys on this, not the full url.
    Feed it :func:`canonical_url` output (scheme/www/case already
    normalized); on a raw url the scheme would swallow the host."""
    return F.regexp_extract(canonical, r"^[^/?]+", 0)


def host_sql(canonical: str) -> str:
    """DuckDB twin of :func:`host` over a canonical-url SQL fragment."""
    return f"regexp_extract({canonical}, '^[^/?]+')"
