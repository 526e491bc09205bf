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
   preserving all other query parameters. Each tracking param is
   anchored at its OWN separator so substrings of longer names never
   match (``?xutm_foo=bar`` and ``&myfbclid=keep`` survive): the single
   query ``?`` is first normalized to ``&`` (anchored first-match), the
   strip consumes ``&name=value`` whole (consecutive tracking params
   each carry their own ``&``), and the first surviving ``&`` is
   restored to ``?``. The ``=`` right-anchors ``fbclid``/``gclid``
   (``?fbclidx=1`` survives).
6. strip a now-dangling ``?``/``&`` and any trailing slashes.

All native ``lower``/``regexp_replace`` — whole-stage codegen'd, no
Python. At 100 TB this runs scan-side before the dedup shuffle, so the
shuffle keys on the (shorter) canonical string — or better, on
``xxhash64(canonical)`` as the dedup operators do.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, spark_repl, duck_repl, needs_global) — applied in order to
# the lowercased input. Replacement group syntax differs per engine
# (Java Matcher `$1` vs RE2 `\1`); the PATTERNS are shared verbatim.
_STEPS: tuple[tuple[str, str, str, bool], ...] = (
    (r"#.*$", "", "", False),        # fragment (anchored tail: first == only)
    (r"^https?://", "", "", False),  # scheme
    (r"^www\.", "", "", False),      # www prefix
    # query-start normalized to '&' (anchored -> first '?' only), so
    # every param — including the first — owns a leading '&'
    (r"^([^?]*)\?", "$1&", r"\1&", False),
    # tracking param stripped WITH its own separator: the '&' left-
    # anchors the name (no substring matches inside longer names) and
    # '=' right-anchors fbclid/gclid; consecutive tracking params each
    # match independently. Unanchored -> global.
    (r"&(utm_[a-z0-9]+|fbclid|gclid)=[^&#]*", "", "", True),
    (r"^([^&]*)&", "$1?", r"\1?", False),  # restore query start
    (r"[?&]+$", "", "", False),      # dangling separator (empty query)
    (r"/+$", "", "", False),         # trailing slashes
)


def canonical_url(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    out = F.lower(c)
    for pat, repl, _, _ in _STEPS:
        out = F.regexp_replace(out, pat, repl)
    return out


def canonical_url_sql(col: str) -> str:
    out = f"lower({col})"
    for pat, _, repl, is_global in _STEPS:
        flag = ", 'g'" if is_global else ""
        # standard SQL literals: '' escapes a quote; backslashes pass
        # through verbatim (DuckDB does NOT process \-escapes), so the
        # Java-regex pattern string is reused as-is for RE2, and the
        # RE2 replacement's \1 survives as-is too
        sql_pat = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{repl}'{flag})"
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
