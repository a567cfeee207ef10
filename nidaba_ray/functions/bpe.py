"""From-scratch byte-pair-encoding tokenizer — train + encode (Sennrich,
Haddow & Birch, "Neural Machine Translation of Rare Words with Subword
Units", ACL 2016 — the public BPE recipe every modern LLM tokenizer
descends from). Replaces the regex token ESTIMATE
(`textops.subword_token_count`) with a real trained subword vocabulary
for corpus budgeting / packing.

Ray-Data shape (the 100-TB story):

- **Training is sample-bounded** (the CCNet/charlm precedent,
  `lm.train_charlm`): one pushdown-bounded read (`doc_id <
  sample_docs`) feeds a (word, n) partial-agg shuffle; the driver sees
  the word-TYPE table of the sample — bounded by construction — never
  the corpus. The merge loop runs on that histogram alone (classic
  Sennrich trains on exactly this), so corpus size never touches
  training cost.
- **Encoding is an actor-pool stage**: the merge table is broadcast
  once via ``ray.put``; each actor builds its rank dict in
  ``__init__`` and keeps a per-actor word→tokens memo, so per-batch
  cost is proportional to NEW word types, not words (Zipf does the
  rest). The corpus streams through one ``map_batches`` with no
  shuffle.

Determinism contract: training is a pure function of the word-count
histogram — pair selection is (count desc, pair lexicographically asc),
a total order, so merges are byte-identical across runs, block layouts
and parallelism levels; encoding applies merges in learned order
(provably equal to lowest-rank-first greedy), so token sequences are a
pure function of (merges, text).
"""

from __future__ import annotations

import os
from collections import Counter

import pyarrow as pa
import ray
import ray.data as rd

SAMPLE_DOCS = 2048
"""Training-sample bound (docs with doc_id < SAMPLE_DOCS) — the same
pushdown-bounded-fit convention as the char-LM."""

END = "</w>"
"""End-of-word marker symbol (the Sennrich formulation with a separate
trailing symbol, so merges can learn word-final units)."""


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (END,)


def train_merges(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """The Sennrich merge loop over a word-type histogram.

    Each round counts adjacent symbol pairs weighted by word frequency,
    merges the (count desc, pair asc) winner everywhere, and records
    it. Stops early when no pair remains (every word fully merged).
    Pure function of the histogram — input dict order is irrelevant
    (pinned in tests)."""
    vocab: dict[tuple[str, ...], int] = {
        _word_symbols(w): n for w, n in sorted(word_counts.items())
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge of one word (the standard BPE
    inference loop — equivalent to applying merges in learned order,
    which the tests' independent reference does instead)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


_MERGES_MEMO: dict = {}


def train_bpe(
    sf_dir: str, n_merges: int = 200, sample_docs: int = SAMPLE_DOCS
) -> list[tuple[str, str]]:
    """Fit the merge table from a bounded corpus sample (memoized per
    corpus content, the charlm convention). The distributed part is
    ONE (word, n) partial-agg shuffle over the sample; the merge loop
    runs on the driver over the bounded word-type histogram."""
    from ray.data.aggregate import Sum

    import pyarrow.dataset as pads

    from nidaba_ray.functions.dedup import _corpus_fingerprint

    key = (os.path.realpath(sf_dir), _corpus_fingerprint(sf_dir),
           n_merges, sample_docs)
    hit = _MERGES_MEMO.get(key)
    if hit is not None:
        return hit

    def partials(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            c.update(t.split())
        words = sorted(c)
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "n": pa.array([c[w] for w in words], pa.int64()),
            }
        )

    counts = (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
            filter=(pads.field("doc_id") < sample_docs),
        )
        .map_batches(partials, batch_format="pyarrow")
        .groupby("word").aggregate(Sum("n", alias_name="n"))
    )
    hist: dict[str, int] = {}
    for b in counts.iter_batches(batch_format="pyarrow"):
        for w, n in zip(b["word"].to_pylist(), b["n"].to_pylist()):
            hist[w] = hist.get(w, 0) + int(n)
    merges = train_merges(hist, n_merges)
    _MERGES_MEMO[key] = merges
    return merges


class BPEEncoder:
    """Actor-pool stage: merge table fetched from the broadcast ref
    once per actor; per-actor word→tokens memo so repeated types are
    dict hits. Emits per-doc subword token counts."""

    def __init__(self, merges_ref) -> None:
        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) \
            else merges_ref
        self.ranks = {pair: r for r, pair in enumerate(merges)}
        self.memo: dict[str, int] = {}

    def _count_word(self, w: str) -> int:
        n = self.memo.get(w)
        if n is None:
            n = len(encode_word(w, self.ranks))
            self.memo[w] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns = [
            sum(self._count_word(w) for w in t.split())
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": pa.array(ns, pa.int64()),
            }
        )


def bpe_token_count(
    sf_dir: str, n_merges: int = 200, concurrency: int = 4
) -> rd.Dataset:
    """Per-doc trained-BPE token counts over the documents table — the
    real-tokenizer upgrade of ``subword_token_count`` (one streaming
    pass, broadcast merges, no shuffle)."""
    merges_ref = ray.put(train_bpe(sf_dir, n_merges))
    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        BPEEncoder,
        fn_constructor_args=(merges_ref,),
        batch_format="pyarrow",
        # autoscaling tuple, never a fixed pool: a fixed pool equal to
        # the CPU count starves the upstream read task and livelocks
        # the streaming executor (CLAUDE.md resource-livelock invariant)
        concurrency=(1, concurrency),
    )
