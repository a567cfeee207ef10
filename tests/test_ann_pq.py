"""PQ-ADC approximate top-k (functions/ann.py ann_topk_pq) — recall
vs the exact baseline, layout-invariance (the global ADC-top-R trim
makes the result a pure function of the data), and the compression
contract (uint8 codes)."""

from __future__ import annotations

import numpy as np
import pytest

SF = "/root/testdata/sf0.01"


def test_pq_recall_vs_bruteforce(ray_session):
    from nidaba_ray.functions.ann import ann_topk_bruteforce, ann_topk_pq

    exact = set(ann_topk_bruteforce(SF, k=10).to_pandas()["vec_id"])
    approx = set(ann_topk_pq(SF, k=10).to_pandas()["vec_id"])
    recall = len(exact & approx) / 10
    assert recall >= 0.8, recall


def test_pq_rerank_full_is_exact(ray_session):
    """With rerank == corpus size the ADC stage is only candidate
    ordering; the exact rerank must reproduce the brute-force answer
    bit-for-bit (same rounding contract)."""
    from nidaba_ray.functions.ann import ann_topk_bruteforce, ann_topk_pq

    exact = ann_topk_bruteforce(SF, k=10).to_pandas()
    full = ann_topk_pq(SF, k=10, rerank=10_000).to_pandas()
    assert list(full["vec_id"]) == list(exact["vec_id"])
    assert np.allclose(full["cos_sim"], exact["cos_sim"])


def test_pq_layout_invariant(ray_session):
    """Same result regardless of block layout — the per-batch partial
    top-R union is trimmed to the global ADC top-R before rerank."""
    import ray.data as rd

    from nidaba_ray.functions.ann import ann_topk_pq

    base = ann_topk_pq(SF, k=10).to_pandas()
    ctx = rd.DataContext.get_current()
    old = ctx.read_op_min_num_blocks
    try:
        ctx.read_op_min_num_blocks = 37  # force a different layout
        alt = ann_topk_pq(SF, k=10).to_pandas()
    finally:
        ctx.read_op_min_num_blocks = old
    assert list(base["vec_id"]) == list(alt["vec_id"])
    assert np.allclose(base["cos_sim"], alt["cos_sim"])


def test_pq_codebooks_and_codes_shapes():
    from nidaba_ray.functions.ann import _pq_encode, _pq_train_codebooks

    rng = np.random.default_rng(7)
    sample = rng.normal(size=(300, 64))
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)
    books = _pq_train_codebooks(sample, m_sub=8, ks=16)
    assert books.shape == (8, 16, 8)
    codes = _pq_encode(sample, books)
    assert codes.dtype == np.uint8 and codes.shape == (300, 8)
    assert codes.max() < 16
    # encoding is the argmin of the trained books — re-encoding the
    # codebook centroids themselves is the identity
    centroid_rows = np.concatenate(
        [books[:, c, :].reshape(1, -1) for c in range(16)]
    )
    cc = _pq_encode(centroid_rows, books)
    assert (cc == np.arange(16)[:, None]).all()


def test_pq_training_deterministic():
    from nidaba_ray.functions.ann import _pq_train_codebooks

    rng = np.random.default_rng(11)
    sample = rng.normal(size=(200, 64))
    a = _pq_train_codebooks(sample, 8, 16)
    b = _pq_train_codebooks(sample.copy(), 8, 16)
    assert (a == b).all()
