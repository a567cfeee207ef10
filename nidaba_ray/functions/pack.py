"""Sequence packing — group documents into fixed token-budget chunks
(the batch-construction step of an LLM training-data pipeline: concat
short docs up to ``budget`` tokens per training sequence; oversize
docs get a chunk of their own for downstream splitting).

Determinism / scale design:

* packing is inherently sequential, so global greedy packing cannot
  be parallel. The standard distributed shape: partition the corpus
  into FIXED doc-id-range buckets (``bucket = doc_id // group_size``
  — a pure function of the data, independent of block layout) and
  pack each bucket independently in doc_id order. Cross-bucket waste
  is at most one partially-filled chunk per bucket, bounded and
  documented; results are bit-identical across parallelism levels
  (pinned in tests/test_pack.py).
* only (doc_id, lang, n_tokens, bucket) rows shuffle — token counts
  are computed per batch BEFORE the exchange; document text never
  moves.
* one range shuffle on ``bucket`` (sorted_partition_apply — complete
  buckets per partition), then per-bucket packing runs a loop over
  CHUNKS, not rows: each chunk boundary is one ``np.searchsorted``
  into the bucket's token cumsum (greedy first-fit over a sorted
  order ≡ "largest j with cumsum[j] − cumsum[start−1] ≤ budget").

Output: one row per document — (doc_id, lang, n_tokens, bucket,
chunk_no, chunk_pos, chunk_id) with ``chunk_id = bucket:chunk_no``
stable across runs. Invariants (each doc exactly once; chunk token
sums ≤ budget unless single-doc; greedy maximality) are pinned in
tests; no SQL oracle (greedy packing needs a recursive scan DuckDB
can't express cleanly — rows-only by design).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["pack_sequences", "pack_sequences_bpe", "DEFAULT_BUDGET", "DEFAULT_GROUP"]

DEFAULT_BUDGET = 512   # tokens per packed chunk
DEFAULT_GROUP = 4096   # docs per packing bucket (doc_id range)

_EMPTY = pd.DataFrame(
    {"doc_id": pd.Series([], dtype="int64"),
     "lang": pd.Series([], dtype="string"),
     "n_tokens": pd.Series([], dtype="int64"),
     "bucket": pd.Series([], dtype="int64"),
     "chunk_no": pd.Series([], dtype="int64"),
     "chunk_pos": pd.Series([], dtype="int64"),
     "chunk_id": pd.Series([], dtype="string")}
)


def _pack_bucket(tokens: np.ndarray, budget: int) -> tuple[np.ndarray, np.ndarray]:
    """Greedy first-fit over an ordered token-count array: returns
    (chunk_no, chunk_pos) per element. Loop iterations = number of
    chunks produced, each a binary search on the cumsum."""
    n = len(tokens)
    cum = np.cumsum(tokens)
    chunk_no = np.empty(n, dtype=np.int64)
    chunk_pos = np.empty(n, dtype=np.int64)
    start = 0
    c = 0
    while start < n:
        base = cum[start - 1] if start else 0
        end = int(np.searchsorted(cum, base + budget, side="right"))
        if end == start:  # single doc longer than the budget
            end = start + 1
        chunk_no[start:end] = c
        chunk_pos[start:end] = np.arange(end - start)
        start = end
        c += 1
    return chunk_no, chunk_pos


def pack_sequences(sf_dir: str, budget: int = DEFAULT_BUDGET,
                   group_size: int = DEFAULT_GROUP,
                   n_tokens_fn=None) -> rd.Dataset:
    """See module docstring. ``sf_dir`` supplies the documents table.

    ``n_tokens_fn`` (optional): per-batch token counter — a callable
    ``pd.Series[str] -> array[int64]`` replacing the default
    whitespace count (see :func:`pack_sequences_bpe` for the
    trained-tokenizer variant). Lengths are the ONLY thing it changes;
    bucketing, greedy order and chunk-id layout stay identical."""
    from nidaba_ray.relational.windows import sorted_partition_apply

    def counts(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if n_tokens_fn is not None:
            n_tok = pd.Series(
                np.asarray(n_tokens_fn(df["text"]), dtype=np.int64),
                index=df.index,
            )
        else:
            # == len(text.split(" ")) for every string incl. "" (both
            # 1), without materializing token lists on the ingest path
            n_tok = (df["text"].str.count(" ") + 1).astype("int64")
        return pa.Table.from_pandas(
            pd.DataFrame(
                {"doc_id": df["doc_id"].astype("int64"),
                 "lang": df["lang"].astype("string"),
                 "n_tokens": n_tok,
                 "bucket": (df["doc_id"] // group_size).astype("int64")}
            ),
            preserve_index=False,
        )

    def pack_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bucket", "doc_id"], kind="mergesort")
        outs = []
        for b, bg in g.groupby("bucket", sort=True):
            chunk_no, chunk_pos = _pack_bucket(
                bg["n_tokens"].to_numpy(), budget
            )
            outs.append(bg.assign(chunk_no=chunk_no, chunk_pos=chunk_pos))
        out = pd.concat(outs, ignore_index=True)
        out["chunk_id"] = (
            out["bucket"].astype(str) + ":" + out["chunk_no"].astype(str)
        ).astype("string")
        return out[list(_EMPTY.columns)].astype(
            {c: str(t) for c, t in _EMPTY.dtypes.items()}
        )

    narrow = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "lang", "text"])
        .map_batches(counts, batch_format="pyarrow")
    )
    return sorted_partition_apply(narrow, ["bucket"], pack_part, _EMPTY)


def pack_sequences_bpe(sf_dir: str, budget: int = DEFAULT_BUDGET,
                       group_size: int = DEFAULT_GROUP,
                       n_merges: int = 200) -> rd.Dataset:
    """Sequence packing with TRAINED-tokenizer lengths: chunk budgets
    are counted in BPE subword tokens (the unit a training run
    actually consumes), not whitespace words. The merge table is the
    memoized sample-bounded fit (`bpe.train_bpe`); each counting task
    captures the small ranks dict and memoizes word types per batch —
    Zipf makes repeated types dict hits, exactly the BPEEncoder
    convention."""
    from nidaba_ray.functions.bpe import encode_word, train_bpe

    ranks = {p: r for r, p in enumerate(train_bpe(sf_dir, n_merges))}

    def bpe_counts(texts: pd.Series) -> np.ndarray:
        memo: dict[str, int] = {}
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            n = 0
            for w in (t or "").split():
                c = memo.get(w)
                if c is None:
                    c = len(encode_word(w, ranks))
                    memo[w] = c
                n += c
            out[i] = n
        return out

    return pack_sequences(sf_dir, budget=budget, group_size=group_size,
                          n_tokens_fn=bpe_counts)
