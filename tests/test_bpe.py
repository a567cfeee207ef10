"""BPE tokenizer pins — hand-computed Sennrich merges, an independent
apply-in-order encoding reference, histogram-order invariance, and the
distributed count query."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from nidaba_ray.functions.bpe import (
    END,
    _word_symbols,
    encode_word,
    train_bpe,
    train_merges,
)

SF = "/root/testdata/sf0.001"

# the classic corpus from the BPE paper's worked example
SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_trained_merge_sequence_hand_computed():
    """First merges over the paper corpus, derived by hand:
    ('e','s') 9 > all; then ('es','t') 9 ties ('t','</w>') 9 and wins
    lexicographically; then ('est','</w>') 9; then ('l','o') 7 ties
    ('lo','w') — ('l','o') is smaller; then ('lo','w') 7."""
    merges = train_merges(SENNRICH, 5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", END),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_encode_matches_learned_segments():
    merges = train_merges(SENNRICH, 10)
    ranks = {p: r for r, p in enumerate(merges)}
    # after enough merges the training words encode to single units
    assert encode_word("newest", ranks) == ["newest" + END]
    # an unseen word decomposes into learned units + raw chars
    toks = encode_word("lowest", ranks)
    assert "".join(toks) == "lowest" + END
    assert "est" + END in toks or "lowest" + END in toks


def _encode_by_merge_order(word: str, merges) -> list[str]:
    """Independent reference: apply each merge in LEARNED ORDER over
    the whole word (provably equal to the production lowest-rank-first
    greedy; a distinct formulation, not shared code)."""
    syms = list(_word_symbols(word))
    for a, b in merges:
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


@pytest.mark.parametrize(
    "word",
    ["low", "lower", "newest", "widest", "lowest", "news", "wide",
     "sstt", "", "e", "xyz", "wewewe", "estestest"],
)
def test_greedy_equals_apply_in_order(word):
    merges = train_merges(SENNRICH, 10)
    ranks = {p: r for r, p in enumerate(merges)}
    assert encode_word(word, ranks) == _encode_by_merge_order(word, merges)
    # lossless: tokens concatenate back to the word + marker
    assert "".join(encode_word(word, ranks)) == word + END


def test_training_is_histogram_order_invariant():
    fwd = train_merges(dict(sorted(SENNRICH.items())), 8)
    rev = train_merges(dict(sorted(SENNRICH.items(), reverse=True)), 8)
    assert fwd == rev


def test_repeated_pair_merges_left_to_right():
    # merging ('a','a') over 'aaaa' must give 'aa','aa' not 'a','aa','a'
    merges = [("a", "a")]
    ranks = {("a", "a"): 0}
    assert encode_word("aaaa", ranks)[:2] == ["aa", "aa"]
    assert _encode_by_merge_order("aaaa", merges)[:2] == ["aa", "aa"]


def test_bpe_token_count_distributed(ray_session):
    from nidaba_ray.functions.bpe import BPEEncoder, bpe_token_count

    out = bpe_token_count(SF, n_merges=64).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    assert len(out) == docs.num_rows
    assert (out["n_bpe_tokens"] > 0).all()
    # driver-side replay with the same merges (memoized, so identical
    # training): per-doc counts must match a direct scalar encode
    merges = train_bpe(SF, 64)
    enc = BPEEncoder(merges)
    got = dict(zip(out["doc_id"], out["n_bpe_tokens"]))
    for did, text in zip(docs["doc_id"].to_pylist()[:50],
                         docs["text"].to_pylist()[:50]):
        expect = sum(len(encode_word(w, enc.ranks)) for w in text.split())
        assert got[did] == expect
    # trained BPE compresses: fewer tokens than characters
    n_chars = sum(len(t) for t in docs["text"].to_pylist())
    assert out["n_bpe_tokens"].sum() < n_chars
