"""Deterministic synthetic Common-Crawl-style ``pages`` generator.

Canonical engine input per BASELINE.json ``input_hint``:

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Content is a pure function of (seed, row index) — so the SAME corpus can
be generated as a pandas DataFrame (golden tests), or distributed via
``mapInPandas`` over ``spark.range`` with any partitioning (no driver
bottleneck, no shared RNG; this is how the 100 TB-scale synthetic soak
would be produced).

Mixture classes (i % 10) each exercise one keep/drop rule
(FIXTURES.md §1):
    0-5 clean prose (keep)     6 boilerplate dup lines (drop: dup_lines)
    7 too short (drop)         8 clean prose + planted PII (keep, scrub)
    9 symbol/no-stopword junk (drop)
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

_LANGS = ("en", "en", "en", "en", "en", "en", "de", "fr", "ko", "zh")

# per-language content words (fake but language-flavored — gives the
# n-gram langid model a real signal)
_WORDS = {
    "en": ("stream", "filter", "window", "quality", "table", "document",
           "cluster", "shuffle", "partition", "vector", "token", "merge"),
    "de": ("strom", "fenster", "tabelle", "dokument", "qualitaet", "gruppe",
           "schluessel", "verteilung", "zeichen", "wort", "menge", "wert"),
    "fr": ("flux", "fenetre", "tableau", "document", "qualite", "groupe",
           "cle", "repartition", "caractere", "mot", "ensemble", "valeur"),
    # REAL multi-byte scripts (round-1 verdict gap #4): Hangul
    # syllables and Han characters, so tokenize/scrub/langid/quality
    # are exercised on the codepoints the north-star sees on day one
    # (reference's KIPO/JPO route, text_process.py:53-59). Words are
    # 3-4 chars so clean CJK prose passes the mean-word-length rule.
    "ko": ("데이터", "문서처리", "품질관리", "창문구조", "테이블", "분산처리",
           "연산장치", "집계분석", "토큰변환", "구간분할", "정렬방식", "언어모형"),
    "zh": ("文本处理", "窗口机制", "表格结构", "文档系统", "质量控制", "分组统计",
           "键值存储", "分布计算", "字符编码", "词汇统计", "集合运算", "数值分析"),
}
_STOPS = ("the", "a", "of", "in", "to", "and", "is", "for", "with", "on")

_PII = (
    "contact john.doe{i}@example.com now",
    "call +1 (555) 123-4567 today",
    "ssn 123-45-6789 leaked",
    "server at 192.168.1.{m} responded",
)


def _rng(seed: int, i: int, salt: str) -> int:
    h = hashlib.md5(f"{seed}:{i}:{salt}".encode()).digest()
    return int.from_bytes(h[:8], "big")


def _sentence(seed: int, i: int, j: int, lang: str) -> str:
    words = _WORDS[lang]
    out = []
    for k in range(9):
        r = _rng(seed, i, f"s{j}w{k}")
        # interleave stop words so clean docs pass the stop-word rule
        if k % 3 == 1:
            out.append(_STOPS[r % len(_STOPS)])
        else:
            out.append(words[r % len(words)])
    return " ".join(out)


def make_page(seed: int, i: int) -> tuple[str, datetime, bytes, str, str]:
    """One deterministic page row."""
    cls = i % 10
    lang = _LANGS[_rng(seed, i, "lang") % len(_LANGS)]
    url = f"https://example-{_rng(seed, i, 'host') % 10_000:04d}.test/p/{i}"
    ts = datetime(2024, 1, 1, tzinfo=timezone.utc) + timedelta(
        seconds=int(_rng(seed, i, "ts") % (365 * 24 * 3600))
    )
    ts = ts.replace(tzinfo=None)  # TIMESTAMP_NTZ semantics end-to-end

    if cls == 7:  # too short
        text = _sentence(seed, i, 0, lang).rsplit(" ", 6)[0]
        text = " ".join(text.split(" ")[:3])
    elif cls == 6:  # boilerplate: one line repeated
        line = _sentence(seed, i, 0, lang)
        text = "\n".join([line] * 6 + [_sentence(seed, i, 1, lang)])
    elif cls == 9:  # symbol junk without stop words
        base = " ".join(
            _WORDS[lang][_rng(seed, i, f"j{k}") % len(_WORDS[lang])] for k in range(8)
        )
        text = base + " ### ### ### ... ... “quoted” x y z"
    elif cls == 8:  # clean + planted PII
        pii = _PII[_rng(seed, i, "pii") % len(_PII)].format(i=i, m=i % 255)
        text = "\n".join(
            [_sentence(seed, i, 0, lang), pii, _sentence(seed, i, 1, lang),
             _sentence(seed, i, 2, lang)]
        )
    else:  # clean prose
        n_sent = 3 + _rng(seed, i, "n") % 4
        text = "\n".join(_sentence(seed, i, j, lang) for j in range(n_sent))

    # deterministic outlinks: EMPTY anchors, so tag-stripping extraction
    # (plans/pipeline.html_to_text_col) leaves the text byte-identical.
    # 2-4 absolute links into the same 10k-host space as the urls (a
    # real host graph), one path-relative link (resolves to own host),
    # one mailto (dropped by links.resolve_host).
    n_links = 2 + _rng(seed, i, "nl") % 3
    nav = "".join(
        f'<a href="https://example-{_rng(seed, i, f"l{j}") % 10_000:04d}'
        f'.test/p/{j}"></a>'
        for j in range(n_links)
    ) + '<a href="/about"></a><a href="mailto:ops@example.test"></a>'
    # deterministic ~10% of pages carry <meta robots noindex> — the
    # crawl-politeness signal links.meta_noindex extracts; hash-gated
    # independently of cls so keep/drop class semantics are untouched
    # (meta tags strip to nothing, text stays byte-identical)
    robots = (
        '<meta name="robots" content="noindex,nofollow">'
        if _rng(seed, i, "rb") % 10 == 0
        else ""
    )
    html = (
        f"<html><head><title>p{i}</title>{robots}</head><body>{nav}<p>"
        + text.replace("\n", "</p><p>")
        + "</p></body></html>"
    ).encode("utf-8")
    return url, ts, html, text, lang


def generate_pages_pdf(n: int, seed: int = 42, start: int = 0) -> pd.DataFrame:
    rows = [make_page(seed, i) for i in range(start, start + n)]
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def generate_pages(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed generation: mapInPandas over spark.range — each
    partition materializes only its own rows (Arrow-batched, no driver
    collect, deterministic under any partitioning)."""

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            rows = [make_page(seed, int(i)) for i in idx]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, PAGES_SCHEMA)
