"""Alignment/string/median kernel tests — analog of nidaba's
tests/test_algorithms* (FIXTURES.md F3). No Ray required."""

import unicodedata

import pytest

from nidaba_ray.algorithms import (
    align_vote,
    approximate_median,
    edit_distance,
    full_edit_distance,
    improve_median,
    lcs_align,
    sanitize,
    strings_by_deletion,
    sym_suggest,
)

KNOWN_DISTANCES = [
    ("kitten", "sitting", 3),
    ("flaw", "lawn", 2),
    ("", "", 0),
    ("abc", "", 3),
    ("", "abc", 3),
    ("same", "same", 0),
    ("a", "b", 1),
    ("abcdef", "azced", 3),
]


@pytest.mark.parametrize("a,b,d", KNOWN_DISTANCES)
def test_edit_distance_known(a, b, d):
    assert edit_distance(a, b) == d


@pytest.mark.parametrize("a,b,d", KNOWN_DISTANCES)
def test_edit_distance_symmetry(a, b, d):
    assert edit_distance(a, b) == edit_distance(b, a)


def test_edit_distance_tokens():
    assert edit_distance(["a", "b", "c"], ["a", "x", "c"]) == 1
    assert edit_distance(["a", "b"], ["a", "b", "c", "d"]) == 2


def test_full_edit_distance_ops():
    d, ops = full_edit_distance("kitten", "sitting")
    assert d == 3
    assert ops.count("S") + ops.count("I") + ops.count("D") == 3
    assert len(ops.replace("I", "")) == len("kitten")
    d2, ops2 = full_edit_distance("abc", "abc")
    assert d2 == 0 and ops2 == "MMM"


def test_full_edit_distance_matches_edit_distance():
    cases = [("abcdef", "azced"), ("hello", "help"), ("xy", "yx")]
    for a, b in cases:
        assert full_edit_distance(a, b)[0] == edit_distance(a, b)


def test_lcs_align_basic():
    pairs = lcs_align(["a", "b", "c"], ["a", "x", "b", "c"])
    matched = [(i, j) for i, j in pairs if i is not None and j is not None]
    assert (0, 0) in matched and (1, 2) in matched and (2, 3) in matched
    # alignment covers every index of both sequences exactly once
    assert [i for i, _ in pairs if i is not None] == [0, 1, 2]
    assert [j for _, j in pairs if j is not None] == [0, 1, 2, 3]


def test_align_vote_majority():
    assert align_vote([["a", "b"], ["a", "b"], ["a", "z"]]) == ["a", "b"]
    # substitution needs a majority against the backbone
    assert align_vote([["a", "b"], ["a", "z"], ["a", "z"]]) == ["a", "z"]


def test_align_vote_insertion_run_order():
    # two candidates insert the same multi-token run → kept, in order
    got = align_vote(
        [["a", "d"], ["a", "x", "y", "z", "d"], ["a", "x", "y", "z", "d"]],
        scores=[2.0, 1.5, 1.0],
    )
    assert got == ["a", "x", "y", "z", "d"]


def test_align_vote_minority_insertion_dropped():
    got = align_vote(
        [["a", "b", "c"], ["JUNK", "a", "b", "c"], ["a", "b", "c"]],
        scores=[2.0, 1.5, 1.0],
    )
    assert got == ["a", "b", "c"]


def test_align_vote_tie_prefers_backbone():
    # one noisy candidate may not displace the backbone token
    got = align_vote([["a", "b"], ["a", "q"]], scores=[2.0, 1.0])
    assert got == ["a", "b"]


def test_align_vote_deterministic_order_independence():
    # same candidates, same scores → same result regardless of list order
    c1 = align_vote([["a", "b"], ["a", "c"], ["a", "c"]], scores=[2.0, 1.5, 1.0])
    assert c1 == ["a", "c"]


def test_sanitize_nfc():
    nfd = unicodedata.normalize("NFD", "café")
    assert sanitize(nfd) == "café"
    assert sanitize("  x  ") == "x"
    assert sanitize(b"caf\xc3\xa9") == "café"
    # NFC vs NFD forms compare equal after sanitize (FIXTURES.md F3)
    assert sanitize(unicodedata.normalize("NFD", "über")) == sanitize("über")


def test_strings_by_deletion():
    keys = strings_by_deletion("abc", 1)
    assert keys == {"abc", "bc", "ac", "ab"}
    assert "a" in strings_by_deletion("abc", 2)


def test_sym_suggest():
    words = ["hello", "help", "hell", "shell"]
    index: dict[str, tuple[str, ...]] = {}
    for w in words:
        for k in strings_by_deletion(w, 1):
            index.setdefault(k, ())
            index[k] = index[k] + (w,)
    got = sym_suggest("helo", index, 1)
    assert "hello" in got or "hell" in got
    assert got == sorted(got, key=lambda w: (edit_distance("helo", w), w))


def test_approximate_median():
    assert approximate_median(["abc", "abd", "abe"]) == "abc"  # tie → lexicographic
    assert approximate_median(["xxx", "abc", "abd"]) in ("abc", "abd")
    assert approximate_median([]) == ""


def test_improve_median():
    cands = ["abcd", "abce", "abcf"]
    m = improve_median("zzzz", cands)
    total = lambda s: sum(edit_distance(s, c) for c in cands)  # noqa: E731
    assert total(m) <= total("zzzz")
    assert total(m) <= total(approximate_median(cands))
