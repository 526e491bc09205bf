"""Reference golden chains, transcribed VERBATIM from the reference's
own recorded outputs (comment blocks at text_process_v5.py:341-388,
duplicated at text_process_v6.py:435-482). These are outputs of the
reference's actual models — NLTK word_tokenize, PerceptronTagger,
WordNet lemmatizer, SnowballStemmer("english") — captured by the
reference author on five patent titles. They are the non-circular
parity oracle for this engine's deterministic kernels
(tests/test_reference_golden_chains.py measures and gates agreement).

Block A (v5:341-356): tokens → lemmatize-only (WordNet, default noun
POS, lowercased) → Snowball stems, UNFILTERED.

Block B (v5:358-388): title → tokens → (token, PerceptronTagger tag)
pairs → POS-aware lemmas AFTER stop-POS filtering → Snowball stems of
the filtered lemmas.
"""

# --- Block A: tokens / lemmatized_tokens / stem_tokens (verbatim) ---
CHAINS_LEMMA_STEM = [
    {
        "tokens": ["Interactive", "ID", "system", "using", "mobile", "devices"],
        "lemmas": ["interactive", "id", "system", "using", "mobile", "device"],
        "stems": ["interact", "id", "system", "use", "mobil", "devic"],
    },
    {
        "tokens": ["Method", "for", "monitoring", "by", "collaborating",
                   "between", "MTC", "devices", ",", "related", "device",
                   "and", "system"],
        "lemmas": ["method", "for", "monitoring", "by", "collaborating",
                   "between", "mtc", "device", ",", "related", "device",
                   "and", "system"],
        "stems": ["method", "for", "monitor", "by", "collabor", "between",
                  "mtc", "devic", ",", "relat", "devic", "and", "system"],
    },
    {
        "tokens": ["System", "and", "method", "for", "connecting", ",",
                   "configuring", "and", "testing", "new", "wireless",
                   "devices", "and", "applications"],
        "lemmas": ["system", "and", "method", "for", "connecting", ",",
                   "configuring", "and", "testing", "new", "wireless",
                   "device", "and", "application"],
        "stems": ["system", "and", "method", "for", "connect", ",",
                  "configur", "and", "test", "new", "wireless", "devic",
                  "and", "applic"],
    },
    {
        "tokens": ["Detection", "of", "stale", "encryption", "policy",
                   "by", "group", "members"],
        "lemmas": ["detection", "of", "stale", "encryption", "policy",
                   "by", "group", "member"],
        "stems": ["detect", "of", "stale", "encrypt", "polici", "by",
                  "group", "member"],
    },
    {
        "tokens": ["INTEGRATED", "PHYSICAL", "AND", "LOGICAL", "SECURITY",
                   "MANAGEMENT", "VIA", "A", "PORTABLE", "DEVICE"],
        "lemmas": ["integrated", "physical", "and", "logical", "security",
                   "management", "via", "a", "portable", "device"],
        "stems": ["integr", "physic", "and", "logic", "secur", "manag",
                  "via", "a", "portabl", "devic"],
    },
]

# --- Block B: title / tokens / (token, tag) / filtered lemmas /
#     filtered stems (verbatim; tags are PerceptronTagger outputs).
#     Sentence 3's tag line is TRUNCATED in the reference source
#     ("(applications, N...") — the cut tag is transcribed as None and
#     excluded from tag scoring. ---
CHAINS_TAGGED = [
    {
        "title": "Interactive ID system using mobile devices",
        "tokens": ["Interactive", "ID", "system", "using", "mobile",
                   "devices"],
        "tags": ["NNP", "NNP", "NN", "VBG", "JJ", "NNS"],
        "lemmas_kept": ["interactive", "id", "system", "use", "mobile",
                        "device"],
        "stems_kept": ["interact", "id", "system", "use", "mobil", "devic"],
    },
    {
        "title": ("Method for monitoring by collaborating between MTC "
                  "devices, related device and system"),
        "tokens": ["Method", "for", "monitoring", "by", "collaborating",
                   "between", "MTC", "devices", ",", "related", "device",
                   "and", "system"],
        "tags": ["NNP", "IN", "NN", "IN", "VBG", "IN", "NNP", "NNS", ",",
                 "JJ", "NN", "CC", "NN"],
        "lemmas_kept": ["method", "monitoring", "collaborate", "mtc",
                        "device", "related", "device", "system"],
        "stems_kept": ["method", "monitor", "collabor", "mtc", "devic",
                       "relat", "devic", "system"],
    },
    {
        "title": ("System and method for connecting, configuring and "
                  "testing new wireless devices and applications"),
        "tokens": ["System", "and", "method", "for", "connecting", ",",
                   "configuring", "and", "testing", "new", "wireless",
                   "devices", "and", "applications"],
        "tags": ["NN", "CC", "NN", "IN", "VBG", ",", "VBG", "CC", "VBG",
                 "JJ", "JJ", "NNS", "CC", None],
        "lemmas_kept": ["system", "method", "connect", "configure", "test",
                        "new", "wireless", "device", "application"],
        "stems_kept": ["system", "method", "connect", "configur", "test",
                       "new", "wireless", "devic", "applic"],
    },
    {
        "title": "Detection of stale encryption policy by group members",
        "tokens": ["Detection", "of", "stale", "encryption", "policy",
                   "by", "group", "members"],
        "tags": ["NN", "IN", "JJ", "NN", "NN", "IN", "NN", "NNS"],
        "lemmas_kept": ["detection", "stale", "encryption", "policy",
                        "group", "member"],
        "stems_kept": ["detect", "stale", "encrypt", "polici", "group",
                       "member"],
    },
    {
        "title": ("INTEGRATED PHYSICAL AND LOGICAL SECURITY MANAGEMENT "
                  "VIA A PORTABLE DEVICE"),
        "tokens": ["INTEGRATED", "PHYSICAL", "AND", "LOGICAL", "SECURITY",
                   "MANAGEMENT", "VIA", "A", "PORTABLE", "DEVICE"],
        "tags": ["NNP", "NNP", "NNP", "NNP", "NNP", "NNP", "NNP", "NNP",
                 "NNP", "NNP"],
        "lemmas_kept": ["integrated", "physical", "and", "logical",
                        "security", "management", "via", "a", "portable",
                        "device"],
        "stems_kept": ["integr", "physic", "and", "logic", "secur",
                       "manag", "via", "a", "portabl", "devic"],
    },
]
