"""Reference-semantics parity on a patents-shaped corpus (FIXTURES.md §3).

Generates the reference's five consumed columns (pub_no, office,
app_year, applicant, title), runs the engine's clean_text chain + SNA
edge pipeline, and compares against an independent sequential-pandas
implementation that mirrors the reference's program order
(text_process.py:253-353): tokenize → POS tag → stop-POS filter →
len>1 filter → ' '.join; explode → groupby count → self-merge →
θ-filters → edge sum. Cleaned titles must be byte-identical and edge
weights exact."""

from __future__ import annotations

import hashlib
import itertools

import pandas as pd
import pytest

from pyspark.sql import functions as F

from textcleaning_spark.config import stop_pos
from textcleaning_spark.functions.tagger import tag_word, tag_word_py
from textcleaning_spark.functions.text import tokens
from textcleaning_spark.operators.cooccurrence import (
    actor_word_weights,
    cooccurrence_edges,
    node_table,
)

OFFICES = ("USPTO", "EPO", "CNIPA", "KIPO", "JPO")
APPLICANTS = tuple(f"corp_{i}" for i in range(12))
TITLE_WORDS = (
    "alloy", "memory", "shape", "device", "method", "system", "process",
    "the", "a", "of", "for", "cleaning", "filtered", "quickly", "alloys",
    "x", "control", "sensors", "heating", "coated",
)


def _rng(seed, i, salt):
    return int.from_bytes(
        hashlib.md5(f"{seed}:{i}:{salt}".encode()).digest()[:8], "big"
    )


def make_patents(n=300, seed=13) -> pd.DataFrame:
    rows = []
    for i in range(n):
        title = " ".join(
            TITLE_WORDS[_rng(seed, i, f"w{k}") % len(TITLE_WORDS)]
            for k in range(5 + _rng(seed, i, "len") % 6)
        )
        rows.append(
            {
                "pub_no": f"P{i:06d}",
                "office": OFFICES[_rng(seed, i, "o") % len(OFFICES)],
                "app_year": 2010.0 + _rng(seed, i, "y") % 10,
                "applicant": APPLICANTS[_rng(seed, i, "a") % len(APPLICANTS)],
                "title": title,
            }
        )
    return pd.DataFrame(rows)


def clean_title_py(title: str, level: int = 3) -> str:
    """Reference clean_text PROGRAM ORDER (text_process.py:259-267),
    sequential-pandas mirror. This test validates that the distributed
    plan equals the sequential semantics; MODEL parity vs NLTK's own
    recorded outputs is measured separately (non-circularly) in
    tests/test_reference_golden_chains.py + REFERENCE_PARITY.md."""
    stops = set(stop_pos(level))
    toks = [t for t in title.split(" ") if t != ""]
    kept = [w for w in toks if tag_word_py(w) not in stops]
    kept = [w for w in kept if len(w) > 1]
    return " ".join(kept)


@pytest.fixture(scope="module")
def patents(spark):
    pdf = make_patents()
    return pdf, spark.createDataFrame(pdf)


def test_cleaned_title_byte_identical(spark, patents):
    pdf, sdf = patents
    stops = list(stop_pos(3))
    kept = F.filter(
        tokens("title"),
        lambda t: ~tag_word(t).isin(*stops) & (F.length(t) > 1),
    )
    got = {
        r["pub_no"]: r["clean"]
        for r in sdf.select(
            "pub_no", F.array_join(kept, " ").alias("clean")
        ).collect()
    }
    for _, row in pdf.iterrows():
        assert got[row.pub_no] == clean_title_py(row.title), row.title


def test_sna_edges_match_pandas_reference(spark, patents):
    pdf, sdf = patents
    # --- engine ---
    w = actor_word_weights(sdf, "app_year", "applicant", "title", "pub_no")
    got = {
        (r["ts"], r["src"], r["dst"]): r["weight"]
        for r in cooccurrence_edges(w).collect()
    }
    nodes = {r["id"]: r["cnt"] for r in node_table(w).collect()}

    # --- independent pandas mirror of text_process.py:309-350 ---
    rows = []
    for _, r in pdf.iterrows():
        for word in [t for t in r.title.split(" ") if t]:
            rows.append((r.app_year, r.applicant, word))
    df = pd.DataFrame(rows, columns=["ts", "actor", "word"])
    wt = df.groupby(["ts", "actor", "word"]).size().reset_index(name="weight")
    merged = wt.merge(wt, on="word")
    merged = merged[
        (merged.ts_x == merged.ts_y) & (merged.actor_x != merged.actor_y)
    ]
    merged["edge"] = (merged.weight_x + merged.weight_y) / 2
    want = (
        merged.groupby(["ts_x", "actor_x", "actor_y"])["edge"].sum().to_dict()
    )
    assert len(got) == len(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, k
    want_nodes = wt.groupby("actor").size().to_dict()
    assert nodes == want_nodes
