"""WARC source: framing correctness, gzip members, round-trip through
the pages schema, and e2e into the quality pipeline's html-extraction
branch (the fresh-crawl entry path)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from textcleaning_spark.plans.pipeline import extract_text, html_to_text_py
from textcleaning_spark.sources.pages import generate_pages_pdf
from textcleaning_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc,
)

N = 60


def _pages():
    pdf = generate_pages_pdf(N, seed=21)
    return [(r["url"], r["warc_ts"], r["html"]) for _, r in pdf.iterrows()]


def test_roundtrip_plain_and_gzip(tmp_path):
    pages = _pages()
    for compress, name in ((False, "a.warc"), (True, "a.warc.gz")):
        p = os.path.join(tmp_path, name)
        write_warc(p, pages, compress=compress)
        got = list(parse_warc_bytes(open(p, "rb").read()))
        assert got == pages, name  # url, ts and html all byte-identical


def test_framing_survives_warc_like_payload(tmp_path):
    """Content-Length framing: a payload CONTAINING 'WARC/1.0\\r\\n'
    must not desynchronize the parser (naive boundary splitting would)."""
    from datetime import datetime

    evil = b"<html><body>WARC/1.0\r\nWARC-Type: response\r\n\r\nfake</body></html>"
    pages = [
        ("https://a.test/1", datetime(2024, 1, 1), evil),
        ("https://a.test/2", datetime(2024, 1, 2), b"<p>after</p>"),
    ]
    p = os.path.join(tmp_path, "evil.warc")
    write_warc(p, pages)
    got = list(parse_warc_bytes(open(p, "rb").read()))
    assert got == pages


def test_non_response_records_skipped(tmp_path):
    raw = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x.test/\r\n"
        b"WARC-Date: 2024-06-01T00:00:00Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: 46\r\n\r\n"
        b"HTTP/1.1 200 OK\r\nContent-Length: 8\r\n\r\n<p>x</p>\r\n\r\n"
    )
    got = list(parse_warc_bytes(raw))
    assert len(got) == 1 and got[0][0] == "https://x.test/"
    assert got[0][2] == b"<p>x</p>"


def test_read_warc_spark_and_pipeline_extraction(spark, tmp_path):
    """Two archives (one gzipped) → read_warc glob → NULL-text pages →
    extract_text's html branch reproduces the Python golden per url."""
    pages = _pages()
    write_warc(os.path.join(tmp_path, "seg-0.warc"), pages[: N // 2])
    write_warc(
        os.path.join(tmp_path, "seg-1.warc.gz"), pages[N // 2 :], compress=True
    )
    df = read_warc(spark, os.path.join(tmp_path, "seg-*"))
    assert df.schema["html"].dataType.typeName() == "binary"
    got = {r["url"]: r for r in df.collect()}
    assert set(got) == {u for u, _, _ in pages}
    for url, ts, html in pages:
        assert got[url]["warc_ts"] == ts and bytes(got[url]["html"]) == html
        assert got[url]["text"] is None and got[url]["lang"] is None
    extracted = {
        r["url"]: r["text"]
        for r in extract_text(read_warc(spark, os.path.join(tmp_path, "seg-*")))
        .select("url", "text")
        .collect()
    }
    for url, _, html in pages:
        assert extracted[url] == html_to_text_py(html), url


def test_read_warc_parallelizes_per_file(spark, tmp_path):
    pages = _pages()
    for i in range(4):
        write_warc(os.path.join(tmp_path, f"s{i}.warc"), pages[i::4])
    df = read_warc(spark, os.path.join(tmp_path, "s*.warc"))
    assert df.rdd.getNumPartitions() >= 2  # files are the task unit
    assert df.count() == N
