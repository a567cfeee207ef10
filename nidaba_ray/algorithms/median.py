"""Approximate median string — analog of nidaba/algorithms/median.py
(approximate_median + improve_median; UNVERIFIED citations, SURVEY.md §0).

Used by the merge/vote stage when ≥3 candidate extractions disagree and
no pairwise agreement exists (SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Sequence

from nidaba_ray.algorithms.strings import edit_distance

__all__ = ["approximate_median", "improve_median"]


def _total_distance(s: Sequence, candidates: Sequence[Sequence]) -> int:
    return sum(edit_distance(s, c) for c in candidates)


def approximate_median(candidates: Sequence[str]) -> str:
    """Greedy approximate median: the candidate minimizing the sum of
    edit distances to all others (set-median), deterministic tie-break
    by lexicographic order. nidaba's greedy builder is character-wise;
    the set-median start point matches its seeding step and is what
    improve_median refines.
    """
    cands = list(candidates)
    if not cands:
        return ""
    best = min(cands, key=lambda s: (_total_distance(s, cands), s))
    return best


def improve_median(median: str, candidates: Sequence[str]) -> str:
    """One pass of single-edit hill-climbing over the median string:
    try deleting/substituting/inserting one character at each position
    with characters drawn from the candidate alphabet; keep the first
    strict improvement per position (deterministic scan order).
    """
    cands = list(candidates)
    alphabet = sorted({ch for c in cands for ch in c})
    best = median
    best_d = _total_distance(best, cands)
    i = 0
    while i <= len(best):
        improved = False
        trials = []
        if i < len(best):
            trials.append(best[:i] + best[i + 1 :])  # deletion
            trials.extend(best[:i] + a + best[i + 1 :] for a in alphabet)  # substitution
        trials.extend(best[:i] + a + best[i:] for a in alphabet)  # insertion
        for t in trials:
            d = _total_distance(t, cands)
            if d < best_d:
                best, best_d = t, d
                improved = True
                break
        if not improved:
            i += 1
    return best
