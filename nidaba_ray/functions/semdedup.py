"""SemDeDup — semantic deduplication by embedding-cluster pruning
(Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", arXiv:2303.09540, 2023 — public method).

The published recipe: k-means-cluster the embedding space, then inside
each cluster find groups of semantic duplicates (pairwise cosine above
a threshold) and keep ONE representative per group — the paper keeps
the example with the LOWEST cosine similarity to its cluster centroid
(the most atypical member), which we realize as a deterministic greedy
scan in (centroid_cos asc, vec_id asc) order: a vector is kept unless
it is a near-duplicate of an already-kept vector in the same cluster.

Ray-Data shape (the 100-TB story):

- **Clusters come from the cached IVF index** (`ann._resolve_ivf_index`)
  — the SAME fixed-point-trained coarse quantizer that serves
  ann_topk_ivf_partitioned, already content-addressed, versioned and
  list-partitioned on disk. Training is SQL-replayable (ann_ivf_sql)
  and costs nothing here when the index is warm.
- **No shuffle at all.** The corpus is already partitioned by cluster
  on disk, so the per-cluster pass is a Dataset of cluster ids mapped
  over with ``map_batches`` — each task reads ONLY its own cluster's
  partition files (whole-file pruning, the ann_topk_ivf_partitioned
  read pattern) and emits per-vector verdicts. Work parallelism equals
  the cluster count; nothing corpus-sized ever reaches the driver.
- **Per-cluster cost is quadratic by design** — that is the published
  algorithm's contract, made safe by sizing k so clusters stay small
  (the paper uses k ≈ N/10⁴; our default ties k to the IVF list count).
  The greedy kernel is chunked (one (chunk × kept) matmul per step) so
  peak memory is O(cluster × dim), never O(cluster²) beyond one
  chunk-width stripe.

Determinism contract (repo invariants): every keep/drop decision
compares a 6-decimal-ROUNDED cosine (`round_like_sql`, the
_pair_cos6 convention shared by both embedding near-dup variants), the
scan order is the total order (centroid_cos6 asc, vec_id asc), and the
centroid used for ranking is the trained fixed-point centroid
(int64 grid / FIXED_SCALE) — so the verdict column is byte-identical
across runs, block layouts and parallelism levels, and the whole
decision chain is replayable in SQL (see tests/test_semdedup.py for
the recursive-CTE DuckDB replay).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from nidaba_ray.functions.ann import FIXED_SCALE, _embedding_matrix, _resolve_ivf_index
from nidaba_ray.functions.compat import round_like_sql

_VERDICT_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("cluster", pa.int64()),
        ("centroid_cos6", pa.float64()),
        ("kept", pa.bool_()),
    ]
)

_GREEDY_CHUNK = 1024
"""Candidate rows scanned per matmul stripe in the greedy kernel —
bounds the densest temporary at chunk × max(chunk, kept) float64."""


def _unit_rows(m: np.ndarray) -> np.ndarray:
    """Row-normalize with the repo's zero-norm guard (zero vectors stay
    zero, so their cosine with anything is 0 — never a near-dup)."""
    n = np.linalg.norm(m, axis=1)
    return m / np.where(n[:, None] > 0, n[:, None], 1.0)


def _greedy_verdicts(
    ids: np.ndarray, mn: np.ndarray, cent_cos: np.ndarray, threshold: float
) -> np.ndarray:
    """Deterministic SemDeDup greedy over ONE cluster.

    Scan in (centroid_cos6 asc, vec_id asc) order — most-atypical
    first, the paper's keep rule — dropping any vector whose 6-dp
    cosine with an already-KEPT vector reaches ``threshold``. Returns
    a bool verdict aligned to the INPUT row order (layout-invariant:
    the internal sort makes the result independent of how the cluster
    arrived). Chunked: cross-similarities against the kept set are one
    matmul per stripe; within-stripe order dependence is a short
    (≤ _GREEDY_CHUNK) indexed loop over rows that survived the cross
    test — the matmuls, not the loop, dominate."""
    n = len(ids)
    kept = np.zeros(n, dtype=bool)
    if n == 0:
        return kept
    order = np.lexsort((ids, cent_cos))  # cent_cos asc, vec_id asc
    mo = mn[order]
    kept_rows: list[np.ndarray] = []
    n_kept = 0
    kept_mat = np.empty((0, mn.shape[1]))
    for s in range(0, n, _GREEDY_CHUNK):
        ch = mo[s : s + _GREEDY_CHUNK]
        if n_kept:
            cross = round_like_sql(ch @ kept_mat.T, 6)
            cross_hit = (cross >= threshold).any(axis=1)
        else:
            cross_hit = np.zeros(len(ch), dtype=bool)
        inner = round_like_sql(ch @ ch.T, 6)
        local: list[int] = []
        for i in np.flatnonzero(~cross_hit):
            if local and inner[i, local].max() >= threshold:
                continue
            local.append(int(i))
            kept[order[s + i]] = True
        if local:
            kept_rows.append(ch[local])
            kept_mat = np.concatenate(kept_rows, axis=0)
            n_kept = len(kept_mat)
    return kept


def semdedup(
    sf_dir: str, n_clusters: int = 16, threshold: float = 0.95
) -> rd.Dataset:
    """Per-vector SemDeDup verdicts over the embeddings table.

    Returns a streaming Dataset with one row per vector:
    (vec_id, cluster, centroid_cos6, kept). ``kept`` is the paper's
    prune decision at cosine ``threshold``; downstream corpus
    construction joins/filters on it (see :func:`semdedup_kept`).

    ``n_clusters`` doubles as the IVF list count, so the clustering is
    the SAME cached artifact the ANN queries probe — one ingest-time
    k-means serves both retrieval and dedup."""
    idx = _resolve_ivf_index(sf_dir, n_clusters)
    centroids = np.load(os.path.join(idx, "centroids.npy"))
    cfloat = centroids.astype(np.float64) / float(FIXED_SCALE)
    cunit = _unit_rows(cfloat)

    # one row per cluster; each task gets its OWN centroid row inline
    # (no broadcast object at all — at k=10^6 clusters the per-task
    # payload is still just one 64-float list)
    clusters = rd.from_items(
        [
            {"list_id": int(l), "centroid": [float(x) for x in cunit[l]]}
            for l in range(n_clusters)
        ]
    )

    def dedup_lists(batch: pa.Table) -> pa.Table:
        outs: list[pa.Table] = []
        cents = batch["centroid"].to_pylist()
        for lid, cent in zip(batch["list_id"].to_pylist(), cents):
            files = sorted(
                glob.glob(os.path.join(idx, f"list_id={lid}", "*.parquet"))
            )
            if not files:
                continue
            t = pq.read_table(files, columns=["vec_id", "embedding"])
            ids = np.asarray(t["vec_id"], dtype=np.int64)
            mn = _unit_rows(_embedding_matrix(t["embedding"]))
            cent_cos = round_like_sql(mn @ np.asarray(cent, np.float64), 6)
            kept = _greedy_verdicts(ids, mn, cent_cos, threshold)
            o = np.argsort(ids, kind="stable")
            outs.append(
                pa.table(
                    {
                        "vec_id": pa.array(ids[o], pa.int64()),
                        "cluster": pa.array(
                            np.full(len(ids), lid, np.int64), pa.int64()
                        ),
                        "centroid_cos6": pa.array(cent_cos[o], pa.float64()),
                        "kept": pa.array(kept[o], pa.bool_()),
                    }
                )
            )
        if not outs:
            return _VERDICT_SCHEMA.empty_table()
        return pa.concat_tables(outs)

    # batch_size=1 → one task per cluster: parallelism equals the
    # cluster count and every read is partition-local (zero shuffle)
    return clusters.map_batches(
        dedup_lists, batch_format="pyarrow", batch_size=1
    )


def semdedup_corpus(
    sf_dir: str, n_clusters: int = 16, threshold: float = 0.95
) -> rd.Dataset:
    """The curated documents table: drop every document whose
    embedding SemDeDup pruned; documents WITHOUT an embedding row are
    retained (no evidence against them — embeddings may cover only a
    scored subset of the corpus, as the sf0.1 test tables do).

    Shape: the dropped-id set streams out of :func:`semdedup` as a
    narrow int64 column and the document filter is the repo's
    broadcast anti join (``pc.is_in`` under the broadcast bound, a
    Bloom front + verify joins above it — `relational.queries`); the
    documents table itself never shuffles."""
    from nidaba_ray.relational.queries import _semi_anti_join

    dropped = semdedup(
        sf_dir, n_clusters=n_clusters, threshold=threshold
    ).map_batches(
        lambda t: t.filter(pc.invert(t["kept"])).select(["vec_id"]),
        batch_format="pyarrow",
    ).materialize()  # narrow int64 column (ids of pruned docs only)
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return _semi_anti_join(docs, "doc_id", dropped, "vec_id", negate=True)


def semdedup_kept(
    sf_dir: str, n_clusters: int = 16, threshold: float = 0.95
) -> pa.Table:
    """Kept-set view of :func:`semdedup` (the training-corpus filter),
    sorted by vec_id — verdict rows are per-vector small, so the
    driver-side table here is id+flag width, never the vectors."""
    verdicts = semdedup(sf_dir, n_clusters=n_clusters, threshold=threshold)
    df = verdicts.to_pandas()
    if df.empty:
        return _VERDICT_SCHEMA.empty_table()
    df = df.sort_values("vec_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)
