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


# ---------------------------------------------------------------------------
# Round-4: charmatrix-weighted edit distance (reference full_edit_distance
# per-pair substitution weights, SURVEY.md §2.5)
# ---------------------------------------------------------------------------


def test_charmatrix_reduces_to_flat():
    from nidaba_ray.algorithms.strings import full_edit_distance

    for a, b in [("kitten", "sitting"), ("abc", ""), ("", ""),
                 ("same", "same"), ("ab", "ba")]:
        flat = full_edit_distance(a, b)
        empty = full_edit_distance(a, b, charmatrix={})
        none = full_edit_distance(a, b, charmatrix=None)
        assert flat == none
        assert empty[1] == flat[1] and float(empty[0]) == float(flat[0])
        assert isinstance(flat[0], int)  # int contract preserved


def test_charmatrix_ocr_confusion_weighting():
    """Cheap OCR confusions must make the confused reading CLOSER than
    an arbitrary corruption — the vote-scoring use case."""
    from nidaba_ray.algorithms.strings import full_edit_distance

    confusions = {("1", "l"): 0.25, ("l", "1"): 0.25,
                  ("0", "o"): 0.25, ("o", "0"): 0.25}
    truth = "hello world"
    ocr = "he1lo wor1d"     # two l→1 confusions
    noise = "hexlo worxd"   # two arbitrary corruptions
    d_ocr, ops = full_edit_distance(ocr, truth, charmatrix=confusions)
    d_noise, _ = full_edit_distance(noise, truth, charmatrix=confusions)
    assert d_ocr == 0.5 and isinstance(d_ocr, float)
    assert d_noise == 2
    assert ops.count("S") == 2 and ops.count("M") == len(truth) - 2
    # weighted matches are expressible too (per-pair semantics)
    d_pen, _ = full_edit_distance("aa", "aa", charmatrix={("a", "a"): 0.1})
    assert d_pen == 0.2


def test_charmatrix_metric_axioms():
    """Axioms on a symmetric confusion matrix: identity, symmetry,
    non-negativity, and the triangle inequality (holds when the
    substitution weights themselves satisfy it, as 0.25-flat ones do)."""
    import itertools

    from nidaba_ray.algorithms.strings import full_edit_distance

    cm = {}
    for x, y in [("1", "l"), ("0", "o"), ("5", "s")]:
        cm[(x, y)] = cm[(y, x)] = 0.25
    words = ["s0lo", "solo", "5olo", "sill", "10l5"]
    d = {(a, b): full_edit_distance(a, b, charmatrix=cm)[0]
         for a in words for b in words}
    for a in words:
        assert d[(a, a)] == 0
    for a, b in itertools.permutations(words, 2):
        assert d[(a, b)] == d[(b, a)]
        assert d[(a, b)] > 0
    for a, b, c in itertools.permutations(words, 3):
        assert d[(a, c)] <= d[(a, b)] + d[(b, c)] + 1e-9


def test_charmatrix_in_vote_scoring():
    """_dict_ratio-style candidate scoring via weighted distance: with
    confusion weights, the OCR-confused candidate outranks (is closer
    to the lexicon word than) the arbitrarily corrupted one, flipping
    the flat-distance tie."""
    from nidaba_ray.algorithms.strings import full_edit_distance

    cm = {("1", "l"): 0.2, ("l", "1"): 0.2}
    lexicon_word = "hello"
    cands = ["he1lo", "hexlo"]
    flat = [full_edit_distance(c, lexicon_word)[0] for c in cands]
    assert flat[0] == flat[1]  # flat distance cannot separate them
    weighted = [full_edit_distance(c, lexicon_word, charmatrix=cm)[0]
                for c in cands]
    best = min(range(2), key=lambda i: (weighted[i], cands[i]))
    assert best == 0 and weighted[0] < weighted[1]
