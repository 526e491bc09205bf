"""English Porter2 ("Snowball English") stemmer — pure Python, exact.

The reference stems with NLTK's SnowballStemmer("english")
(text_process_v5.py:24, 64-66); its golden chains
(text_process_v5.py:341-388) show Snowball outputs (collaborating →
collabor, policy → polici, device → devic). The Porter2 algorithm is
public (M.F. Porter, snowballstem.org, "The English (Porter2) stemming
algorithm") — this file implements that published specification
directly; it is used by the NLP annotation kernel
(functions/nlp.py) for reference-parity stems. The simpler Harman
S-stemmer (functions/stemmer.py) remains the engine's SQL-expressible
twin for oracle-checked queries.

Validated against the transcribed reference golden chains
(tests/fixtures/reference_golden_chains.py) in
tests/test_reference_golden_chains.py.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXCEPTIONS_1A = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)


def _is_vowel(w: str, i: int) -> bool:
    return w[i] in _VOWELS


def _regions(w: str) -> tuple[int, int]:
    """(r1, r2) start offsets per the spec; special prefixes gener-,
    commun-, arsen- pin R1 after the prefix."""
    r1 = len(w)
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, len(w)):
            if not _is_vowel(w, i) and _is_vowel(w, i - 1):
                r1 = i + 1
                break
    r2 = len(w)
    for i in range(r1 + 1, len(w)):
        if not _is_vowel(w, i) and _is_vowel(w, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(w: str, length: int) -> bool:
    """True if w[:length] ends in a short syllable."""
    if length == 2:
        return _is_vowel(w, 0) and not _is_vowel(w, 1)
    if length >= 3:
        # non-vowel, vowel, non-vowel other than w/x/Y
        c = w[length - 1]
        return (
            not _is_vowel(w, length - 1)
            and c not in "wxY"
            and _is_vowel(w, length - 2)
            and not _is_vowel(w, length - 3)
        )
    return False


def stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    if w[0] == "'":
        w = w[1:]
    if w in _EXCEPTIONS:
        return _EXCEPTIONS[w]
    if len(w) <= 2:
        return w

    # mark consonant-y: initial y, or y after a vowel
    if w[0] == "y":
        w = "Y" + w[1:]
    w = "".join(
        "Y" if ch == "y" and _is_vowel(w, i - 1) else ch
        for i, ch in enumerate(w)
    )

    r1, r2 = _regions(w)

    # Step 0: 's / ' / 's'
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        # delete if the preceding word part contains a vowel not
        # immediately before the s
        if any(_is_vowel(w, i) for i in range(len(w) - 2)):
            w = w[:-1]

    if w in _EXCEPTIONS_1A:
        return w.replace("Y", "y")

    # Step 1b
    step1b_done = False
    if w.endswith("eedly"):
        if len(w) - 5 >= r1:
            w = w[:-3]
        step1b_done = True
    elif w.endswith("eed"):
        if len(w) - 3 >= r1:
            w = w[:-1]
        step1b_done = True
    if not step1b_done:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem_part = w[: -len(suf)]
                if any(ch in _VOWELS for ch in stem_part):
                    w = stem_part
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_DOUBLES):
                        w = w[:-1]
                    elif r1 >= len(w) and _ends_short_syllable(w, len(w)):
                        w += "e"
                break

    # Step 1c: y/Y → i after a non-vowel that is not the first letter
    if (
        len(w) > 2
        and w[-1] in "yY"
        and not _is_vowel(w, len(w) - 2)
    ):
        w = w[:-1] + "i"

    # Step 2 (longest suffix, act only if entirely in R1)
    step2 = (
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"),
    )
    for suf, rep in step2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + rep
            break
    else:
        if w.endswith("ogi"):
            if len(w) - 3 >= r1 and len(w) >= 4 and w[-4] == "l":
                w = w[:-1]
        elif w.endswith("li"):
            if len(w) - 2 >= r1 and w[-3] in _LI_ENDING:
                w = w[:-2]

    # Step 3
    step3 = (
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
        ("ness", ""), ("ful", ""),
    )
    for suf, rep in step3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + rep
            break
    else:
        if w.endswith("ative") and len(w) - 5 >= r2:
            w = w[:-5]

    # Step 4 (delete if in R2)
    step4 = (
        "ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "al", "er", "ic",
    )
    for suf in step4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and len(w) - 3 >= r2 and w[-4] in "st":
            w = w[:-3]

    # Step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _ends_short_syllable(w, len(w) - 1)
        ):
            w = w[:-1]
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) >= 2 and w[-2] == "l":
        w = w[:-1]

    return w.replace("Y", "y")
