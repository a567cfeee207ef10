"""Sequence packing (functions/pack.py) — invariants and layout
invariance. No SQL oracle (greedy packing is a sequential recursion);
rows-only by design, pinned here instead."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"


def test_pack_bucket_kernel():
    from nidaba_ray.functions.pack import _pack_bucket

    tokens = np.array([100, 200, 150, 600, 50, 50, 50], dtype=np.int64)
    chunk_no, chunk_pos = _pack_bucket(tokens, budget=500)
    # [100,200,150]=450 fits; 600 alone (oversize); [50,50,50] fits
    assert list(chunk_no) == [0, 0, 0, 1, 2, 2, 2]
    assert list(chunk_pos) == [0, 1, 2, 0, 0, 1, 2]
    # degenerate: every doc oversize
    cn, _ = _pack_bucket(np.array([900, 900], dtype=np.int64), budget=500)
    assert list(cn) == [0, 1]
    # empty bucket
    cn, cp = _pack_bucket(np.array([], dtype=np.int64), budget=500)
    assert len(cn) == len(cp) == 0


def _invariants(df: pd.DataFrame, budget: int) -> None:
    sums = df.groupby("chunk_id").agg(
        tot=("n_tokens", "sum"), n=("n_tokens", "size")
    )
    over = sums[sums["tot"] > budget]
    assert (over["n"] == 1).all()  # only single-doc chunks exceed
    # greedy maximality: within a bucket, chunk c's first doc would
    # not have fit into chunk c-1
    for _, bg in df.groupby("bucket"):
        bg = bg.sort_values(["chunk_no", "chunk_pos"])
        tots = bg.groupby("chunk_no")["n_tokens"].sum()
        firsts = bg[bg["chunk_pos"] == 0].set_index("chunk_no")["n_tokens"]
        for c in range(1, int(bg["chunk_no"].max()) + 1):
            assert tots[c - 1] + firsts[c] > budget


def test_pack_sequences_invariants(ray_session):
    import duckdb

    from nidaba_ray.functions.pack import pack_sequences

    out = pack_sequences(SF, budget=512).to_pandas()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert len(out) == n_docs                      # every doc exactly once
    assert out["doc_id"].nunique() == n_docs
    # token counts match the whitespace convention
    want = duckdb.sql(f"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM read_parquet('{SF}/documents.parquet')
    """).df().sort_values("doc_id").reset_index(drop=True)
    got = out[["doc_id", "n_tokens"]].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    _invariants(out, budget=512)
    # chunks fill reasonably: mean utilization above half the budget
    sums = out.groupby("chunk_id")["n_tokens"].sum()
    assert sums.mean() > 256


def test_pack_layout_invariant(ray_session):
    import ray.data as rd

    from nidaba_ray.functions.pack import pack_sequences

    a = (
        pack_sequences(SF).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    ctx = rd.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 64 * 1024  # force many small blocks
        b = (
            pack_sequences(SF).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
    finally:
        ctx.target_max_block_size = old
    pd.testing.assert_frame_equal(a, b)


def test_pack_sequences_bpe_budgets_and_counts(ray_session):
    """BPE-packed chunks: per-doc lengths equal the trained-tokenizer
    counts, every doc appears exactly once, and each chunk's token sum
    respects the budget unless it is a single oversize doc."""
    import pyarrow.parquet as pq

    from nidaba_ray.functions.bpe import encode_word, train_bpe
    from nidaba_ray.functions.pack import pack_sequences_bpe

    sf = "/root/testdata/sf0.001"
    budget = 256
    out = pack_sequences_bpe(sf, budget=budget).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    assert sorted(out["doc_id"]) == sorted(docs["doc_id"])
    ranks = {p: r for r, p in enumerate(train_bpe(sf, 200))}
    want = {
        int(r.doc_id): sum(len(encode_word(w, ranks))
                           for w in r.text.split())
        for r in docs.itertuples()
    }
    got = dict(zip(out["doc_id"], out["n_tokens"]))
    assert got == want
    sums = out.groupby("chunk_id").agg(n=("n_tokens", "sum"),
                                       k=("doc_id", "count"))
    over = sums[sums["n"] > budget]
    assert (over["k"] == 1).all()  # only oversize singletons exceed
