"""URL canonicalization + url-level dedup.

Differential gate: the Spark Column and DuckDB SQL emitted from the ONE
spec in functions/urls.py must agree byte-for-byte on adversarial
surface forms (the oracle harness only ever sees the synthesized urls
of `url_canonical_dedup`; this test pins the tricky cases directly).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from textcleaning_spark.functions.urls import canonical_url, canonical_url_sql
from textcleaning_spark.operators.dedup import url_dedup
from textcleaning_spark.sources.pages import generate_pages

CASES = [
    # (raw, expected canonical)
    ("HTTPS://WWW.Example.COM/Articles/42/?utm_source=feed&ref=en#sec",
     "example.com/articles/42/?ref=en"),
    ("http://example.com/articles/42?ref=en", "example.com/articles/42?ref=en"),
    ("https://example.com/articles/42/", "example.com/articles/42"),
    ("http://www.example.com/a?utm_a=1&utm_b=2", "example.com/a"),
    ("https://example.com/a?id=3&utm_source=x", "example.com/a?id=3"),
    ("https://example.com/", "example.com"),
    ("example.com/p//", "example.com/p"),
    # non-tracking params survive even sandwiched between tracking ones
    ("https://sub.www-site.org/p?gclid=abc&q=1&fbclid=z",
     "sub.www-site.org/p?q=1"),
    # utm_ needs at least one [a-z0-9] char; bare 'utm_=' is kept
    ("https://example.com/p?utm_=x&z=2", "example.com/p?utm_=x&z=2"),
    # separator-anchored: substrings of LONGER param names never match
    ("https://example.com/p?xutm_foo=bar&q=1",
     "example.com/p?xutm_foo=bar&q=1"),
    ("https://example.com/p?page=1&myfbclid=keep",
     "example.com/p?page=1&myfbclid=keep"),
    # '=' right-anchors fbclid/gclid; longer names survive whole
    ("https://example.com/p?fbclidx=1", "example.com/p?fbclidx=1"),
    # tracking params stripped around a surviving impostor
    ("https://example.com/p?utm_a=1&xgclid=2&utm_b=3",
     "example.com/p?xgclid=2"),
]


def test_canonical_url_cases_and_engines_agree(spark):
    raw = [c for c, _ in CASES]
    want = [e for _, e in CASES]
    sdf = spark.createDataFrame([(c,) for c in raw], "u string")
    got_spark = [r["c"] for r in sdf.select(canonical_url("u").alias("c")).collect()]
    got_duck = [
        r[0]
        for r in duckdb.execute(
            f"SELECT {canonical_url_sql('u')} FROM (SELECT unnest(?) AS u)", [raw]
        ).fetchall()
    ]
    assert got_spark == want
    assert got_duck == want


def test_canonical_url_idempotent(spark):
    """canonical is a fixpoint: applying it twice changes nothing."""
    sdf = spark.createDataFrame([(c,) for c, _ in CASES], "u string")
    once = sdf.select(canonical_url("u").alias("c"))
    diff = once.select(
        (canonical_url("c") == F.col("c")).alias("same")
    ).filter(~F.col("same"))
    assert diff.count() == 0


def test_url_dedup_keeps_latest_crawl(spark):
    """Recrawl variants of the same page collapse to ONE row: the one
    with the max warc_ts (tie-break raw url asc)."""
    pages = generate_pages(spark, 40, seed=7).limit(40)
    # re-crawl every page under a noisier surface form, one day later
    recrawl = pages.select(
        F.concat(
            F.lit("http://www."),
            F.regexp_replace("url", "^https://", ""),
            F.lit("?utm_source=recrawl#top"),
        ).alias("url"),
        (F.col("warc_ts") + F.expr("INTERVAL 1 DAY")).alias("warc_ts"),
        "html",
        F.concat(F.col("text"), F.lit(" v2")).alias("text"),
        "lang",
    )
    both = pages.unionByName(recrawl)
    kept = url_dedup(both).cache()
    try:
        assert kept.count() == 40  # one per canonical url
        # every keeper is the later (recrawled) row
        assert kept.filter(~F.col("text").endswith(" v2")).count() == 0
        # canonical form has no scheme/www/tracking noise
        bad = kept.filter(
            F.col("canonical_url").rlike("^(https?://|www\\.)|utm_|#")
        )
        assert bad.count() == 0
    finally:
        kept.unpersist()


def test_url_dedup_tie_breaks_deterministically(spark):
    rows = [
        ("https://a.com/p", "2024-01-01 00:00:00", "x"),
        ("http://a.com/p/", "2024-01-01 00:00:00", "y"),  # same ts, same canonical
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts string, text string").select(
        "url", F.col("warc_ts").cast("timestamp").alias("warc_ts"), "text"
    )
    kept = url_dedup(df).collect()
    assert len(kept) == 1
    assert kept[0]["url"] == "http://a.com/p/"  # min raw url on equal ts


def test_host_engines_agree(spark):
    """host() (Spark) and host_sql() (DuckDB) must agree on the
    canonical forms of every pinned case, and never include a path,
    query, or scheme fragment."""
    import duckdb

    from textcleaning_spark.functions.urls import (
        canonical_url,
        canonical_url_sql,
        host,
        host_sql,
    )

    raw = [c for c, _ in CASES]
    sdf = spark.createDataFrame([(c,) for c in raw], "u string")
    got_spark = [
        r.h for r in sdf.select(host(canonical_url("u")).alias("h")).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ",".join(f"('{c}')" for c in raw) + ") v(u)")
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {host_sql(canonical_url_sql('u'))} FROM t"
        ).fetchall()
    ]
    assert got_spark == got_duck
    for h in got_spark:
        assert h and "/" not in h and "?" not in h and "#" not in h
        assert not h.startswith("http") and not h.startswith("www.")
