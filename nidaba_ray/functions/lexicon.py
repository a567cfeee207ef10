"""Deterministic per-language lexicons — the nidaba ``lang_dicts``
analog (nidaba/config.py + nidaba/lex.py, UNVERIFIED per SURVEY.md §0).

nidaba configures per-language word lists + precomputed symmetric-delete
indices on the shared FS; here the lexicon is generated in-process
(seeded, no external data per the sandbox contract) and each SpellFilter
actor builds/caches the deletion index once per language on first use.
"""

from __future__ import annotations

from functools import lru_cache

from nidaba_ray.algorithms.strings import strings_by_deletion

# Shared synthetic corpus vocabulary: the word soup the driver's
# `documents` table is built from, plus the standalone synth vocab.
_CORE_WORDS = (
    "the a big small fast slow data table row column key value batch stream "
    "query filter sort merge join group agg window hash scan part order line "
    "customer spark vector dup"
).split()

_LANG_EXTRA = {
    "en": ["and", "of", "to", "in", "is", "for", "with", "on"],
    "de": ["und", "der", "die", "das", "ist", "mit", "von", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por"],
    "fr": ["le", "la", "de", "et", "un", "une", "dans", "pour"],
    "zh": ["de", "shi", "bu", "le", "ren", "wo", "you", "ta"],
}


@lru_cache(maxsize=16)
def wordlist(lang: str) -> frozenset[str]:
    words = set(_CORE_WORDS)
    words.update(_LANG_EXTRA.get(lang, ()))
    words.update(f"word{i:03d}" for i in range(200))  # synth.pages_table vocab
    return frozenset(words)


@lru_cache(maxsize=16)
def deletion_index(lang: str, max_dist: int = 1) -> dict[str, tuple[str, ...]]:
    """key (deletion form) → dictionary words; the SymSpell index."""
    idx: dict[str, list[str]] = {}
    for w in sorted(wordlist(lang)):
        for key in strings_by_deletion(w, max_dist):
            idx.setdefault(key, []).append(w)
    return {k: tuple(v) for k, v in idx.items()}
