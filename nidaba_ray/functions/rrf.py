"""Reciprocal-rank fusion — the standard way to combine heterogeneous
retrieval rankings (sparse BM25 + dense ANN, the hybrid-search shape)
without score calibration: fused(d) = Σ_r 1/(K + rank_r(d)).

ALL-INTEGER: each contribution is ``RRF_SCALE // (K + rank)`` (exact
floor division), so fusion scores are order-independent sums,
bit-identical across layouts, and the whole hybrid pipeline — BM25
ranking, exact-cosine ANN ranking, fusion — replays in one DuckDB
query (``hybrid_sql`` composes ``bm25_sql`` and ``ann_topk_sql`` as
CTEs). Ties break (score desc, doc_id asc).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

__all__ = ["RRF_K", "RRF_SCALE", "rrf_fuse", "hybrid_topk", "hybrid_sql"]

RRF_K = 60
RRF_SCALE = 10**9
HYBRID_TOPK = 10


def rrf_fuse(rankings: list[pa.Table], rrf_k: int = RRF_K,
             topk: int = HYBRID_TOPK) -> pa.Table:
    """Fuse rank lists (each with columns ``doc_id``, ``rank``;
    rank 1-based) → (rank, doc_id, fused_micro)."""
    scores: dict[int, int] = {}
    for t in rankings:
        for doc_id, rank in zip(t["doc_id"].to_pylist(),
                                t["rank"].to_pylist()):
            scores[int(doc_id)] = scores.get(int(doc_id), 0) \
                + RRF_SCALE // (rrf_k + int(rank))
    ordered = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:topk]
    return pa.table({
        "rank": pa.array(range(1, len(ordered) + 1), pa.int64()),
        "doc_id": pa.array([d for d, _ in ordered], pa.int64()),
        "fused_micro": pa.array([s for _, s in ordered], pa.int64()),
    })


def hybrid_topk(sf_dir: str, qid: str = "q_join",
                query_vec_id: int = 0, topk: int = HYBRID_TOPK
                ) -> pa.Table:
    """Hybrid sparse+dense retrieval: the BM25 ranking for one text
    query fused with the exact-cosine ANN ranking for one query
    vector (vec_id ≡ doc_id in the corpus), 2·topk candidates from
    each side. Both inputs are distributed operators; the fusion
    itself is a (2·topk)-row driver step by construction."""
    from nidaba_ray.functions.ann import ann_topk_bruteforce
    from nidaba_ray.functions.bm25 import bm25_topk

    sparse_all = bm25_topk(sf_dir, k=2 * topk).to_pandas()
    sparse = pa.Table.from_pandas(
        sparse_all[sparse_all["qid"] == qid][["doc_id", "rank"]]
        .reset_index(drop=True), preserve_index=False)
    dense_df = ann_topk_bruteforce(
        sf_dir, k=2 * topk, query_vec_id=query_vec_id).to_pandas()
    dense = pa.table({
        "doc_id": pa.array(dense_df["vec_id"].astype(int), pa.int64()),
        "rank": pa.array(range(1, len(dense_df) + 1), pa.int64()),
    })
    return rrf_fuse([sparse, dense], topk=topk)


def hybrid_sql(qid: str = "q_join", query_vec_id: int = 0,
               topk: int = HYBRID_TOPK) -> str:
    """The full hybrid replay: bm25_sql and ann_topk_sql as CTE
    sources, integer RRF on top."""
    from nidaba_ray.functions.ann import ann_topk_sql
    from nidaba_ray.functions.bm25 import bm25_sql

    return f"""
WITH sparse AS (
  SELECT doc_id, rank FROM ({bm25_sql(k=2 * topk)})
  WHERE qid = '{qid}'
),
dense AS (
  SELECT vec_id AS doc_id,
         ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM ({ann_topk_sql(k=2 * topk, query_vec_id=query_vec_id)})
),
contrib AS (
  SELECT doc_id, {RRF_SCALE}::BIGINT // ({RRF_K} + rank) AS c FROM sparse
  UNION ALL
  SELECT doc_id, {RRF_SCALE}::BIGINT // ({RRF_K} + rank) AS c FROM dense
),
fused AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS fused_micro
  FROM contrib GROUP BY doc_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY fused_micro DESC, doc_id ASC)
            AS BIGINT) AS rank,
       doc_id, fused_micro
FROM fused
ORDER BY fused_micro DESC, doc_id ASC
LIMIT {topk}
"""
