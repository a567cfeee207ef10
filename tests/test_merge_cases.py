"""Merge/vote fixture cases — nidaba tests/test_merge_hocr analog
(FIXTURES.md F2): K candidate extractions of one page → align/vote →
golden canonical text, byte-identical. No Ray required."""

from nidaba_ray.algorithms.strings import align_vote
from nidaba_ray.record import SPAN_SEP

GOLDEN = "the quick brown fox jumps over the lazy dog again and again"


def toks(s):
    return s.split(SPAN_SEP)


def vote(cands, scores=None):
    return SPAN_SEP.join(align_vote([toks(c) for c in cands], scores=scores))


def test_identical_candidates():
    assert vote([GOLDEN, GOLDEN, GOLDEN]) == GOLDEN


def test_one_candidate_missing_block():
    # candidate B lost a run of tokens (a dropped block); A and C agree
    missing = GOLDEN.replace(" jumps over the", "")
    assert vote([GOLDEN, missing, GOLDEN], scores=[3.0, 2.0, 1.0]) == GOLDEN


def test_majority_restores_block_backbone_dropped():
    # the BACKBONE lost the block; both others carry it → restored
    missing = GOLDEN.replace(" jumps over the", "")
    got = vote([missing, GOLDEN, GOLDEN], scores=[3.0, 2.0, 1.0])
    assert got == GOLDEN


def test_token_disagreement_majority():
    noisy = GOLDEN.replace("quick", "quack")
    assert vote([GOLDEN, GOLDEN, noisy], scores=[3.0, 2.0, 1.0]) == GOLDEN
    # two agreeing non-backbone candidates outvote the backbone token
    assert vote([noisy, GOLDEN, GOLDEN], scores=[3.0, 2.0, 1.0]) == GOLDEN


def test_tie_break_determinism():
    # two candidates, equal counts at one position → backbone wins,
    # and the result is stable across repeated calls and orderings
    a, b = GOLDEN, GOLDEN.replace("fox", "fax")
    r1 = vote([a, b], scores=[2.0, 1.0])
    r2 = vote([a, b], scores=[2.0, 1.0])
    assert r1 == r2 == GOLDEN
    # swapped priority: the other candidate becomes backbone
    assert vote([b, a], scores=[2.0, 1.0]) == b


def test_single_candidate_passthrough():
    assert vote([GOLDEN]) == GOLDEN


def test_empty_candidates():
    assert vote(["", "", ""]) == ""
