"""Non-circular reference parity: engine kernels vs the reference's
OWN recorded NLTK outputs (transcribed verbatim into
tests/fixtures/reference_golden_chains.py from text_process_v5.py:341-388).

Replaces the round-1 circular check (engine tagger vs itself). Gated
rates mirror REFERENCE_PARITY.md; if a kernel change moves a rate,
update both.
"""

from __future__ import annotations

import pytest

from tests.fixtures.reference_golden_chains import (
    CHAINS_LEMMA_STEM,
    CHAINS_TAGGED,
)
from textcleaning_spark.config import stop_pos
from textcleaning_spark.functions.nlp import lemmatize_py, tokenize_py
from textcleaning_spark.functions.porter2 import stem as porter2_stem
from textcleaning_spark.functions.tagger import tag_tokens_py, tag_word_py


def test_tokens_match_nltk_word_tokenize_exactly():
    for a, b in zip(CHAINS_LEMMA_STEM, CHAINS_TAGGED):
        got = tokenize_py(b["title"])
        assert got == a["tokens"] == b["tokens"], b["title"]


def test_stems_match_snowball_exactly():
    """Porter2 == SnowballStemmer('english'): 51/51 on the reference's
    recorded stems (both blocks agree)."""
    for c in CHAINS_LEMMA_STEM:
        got = [porter2_stem(t) for t in c["tokens"]]
        assert got == c["stems"], c["tokens"]


def test_noun_mode_lemmas_match_wordnet():
    """Block A is lemmatize-only (WordNet, default noun POS): the
    engine's noun-mode rule lemmatizer matches 51/51 on the goldens."""
    for c in CHAINS_LEMMA_STEM:
        got = [lemmatize_py(t, "NN") for t in c["tokens"]]
        assert got == c["lemmas"], c["tokens"]


def test_tag_agreement_rate_vs_perceptron():
    """The sequence rule tagger (word CASE + all-caps-span context
    rule, round 3) vs PerceptronTagger's recorded tags. A learned,
    context-sensitive model can't be fully replicated by rules —
    measured 43/50 (0.86); the remaining divergences are JJ/NN
    confusions on unknown adjectives (mobile, new, stale) and
    sentence-position NNP/NN (System, Detection), none of which flip
    keep/drop. Gate at the measured floor so regressions surface."""
    ok = n = 0
    misses = []
    for c in CHAINS_TAGGED:
        tags = tag_tokens_py(c["tokens"])
        for t, got, want in zip(c["tokens"], tags, c["tags"]):
            if want is None:  # truncated in the reference source
                continue
            n += 1
            ok += got == want
            if got != want:
                misses.append((t, got, want))
    rate = ok / n
    assert rate >= 0.86, (rate, misses)


def test_keep_drop_f1_vs_reference_tags():
    """Keep/drop (token survives the stop-POS filter) computed from the
    engine's tags vs the reference's recorded tags. Round 2 measured
    F1 0.9867 with one fn (bare 'A' in the all-caps title, DT vs NNP);
    the round-3 context rule closes it — F1 = 1.0 on the recorded
    goldens. Gate at the north-rule target 0.99."""
    stops = set(stop_pos(1))
    tp = fp = fn = 0
    disagreements = []
    for c in CHAINS_TAGGED:
        tags = tag_tokens_py(c["tokens"])
        for t, etag, tag in zip(c["tokens"], tags, c["tags"]):
            if tag is None:
                continue
            rk = tag not in stops
            ek = etag not in stops
            tp += rk and ek
            fn += rk and not ek
            fp += (not rk) and ek
            if rk != ek:
                disagreements.append((t, etag, tag))
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f"keep/drop F1 {f1}: {disagreements}"
    assert disagreements == [], disagreements


def test_filtered_stem_chain_agreement():
    """End-to-end chain on block B: tokens the REFERENCE kept (its tags
    ∉ stop set) → engine Porter2 stems must equal the reference's
    recorded filtered stems wherever the engine also keeps the token."""
    stops = set(stop_pos(1))
    for c in CHAINS_TAGGED:
        ref_kept_stems = list(c["stems_kept"])
        got = [
            porter2_stem(t)
            for t, tag in zip(c["tokens"], c["tags"])
            if tag is not None and tag not in stops
        ]
        # block B sentence 3 has one None-tag token (kept by reference)
        missing = len(ref_kept_stems) - len(got)
        assert 0 <= missing <= 1
        assert got == ref_kept_stems[: len(got)], c["title"]
