"""SemDeDup (embedding-cluster semantic dedup) — correctness pins.

Three independent checks on the same frozen corpus:

1. a naive pure-Python reference (per-pair scalar cosines, O(n²)
   double loop — no shared kernel with the chunked production code);
2. a FULL DuckDB replay — ranking, the within-cluster similarity
   graph AND the sequential greedy itself (as a recursive CTE that
   carries the kept set per cluster), over the very parquet partitions
   the production pass reads;
3. structural edges: thresholds beyond the cosine range, determinism
   across runs.

Cluster assignments come from the cached fixed-point IVF index, whose
training + assignment already carry a DRIVER-level SQL oracle
(ann_ivf_sql), so these tests take the partition layout as input and
pin everything SemDeDup adds on top.
"""

from __future__ import annotations

import glob
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nidaba_ray.functions.ann import FIXED_SCALE, _resolve_ivf_index
from nidaba_ray.functions.compat import round_like_sql
from nidaba_ray.functions.semdedup import semdedup_kept

SF = "/root/testdata/sf0.001"
THR = 0.25  # the synthetic embeddings are near-uniform (max pair
# cosine ≈ 0.41), so the production 0.95 default would be a vacuous
# all-kept check; the permissive threshold exercises real drops.


def _index_clusters(n_clusters: int = 16):
    """Read back the partitioned index: {cluster: (ids, vectors)} plus
    the trained centroids on the exact fixed-point grid."""
    idx = _resolve_ivf_index(SF, n_clusters)
    cents = np.load(os.path.join(idx, "centroids.npy")).astype(np.float64)
    cents /= float(FIXED_SCALE)
    out = {}
    for lid in range(n_clusters):
        files = sorted(glob.glob(os.path.join(idx, f"list_id={lid}", "*.parquet")))
        if not files:
            continue
        t = pq.read_table(files, columns=["vec_id", "embedding"])
        ids = t["vec_id"].to_pylist()
        vecs = [list(map(float, v)) for v in t["embedding"].to_pylist()]
        out[lid] = (ids, vecs)
    return idx, cents, out


def _cos6(a, b) -> float:
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    if na == 0 or nb == 0:
        return 0.0
    d = sum(x * y for x, y in zip(a, b))
    return float(round_like_sql(np.array([d / (na * nb)]), 6)[0])


def _naive_semdedup(threshold: float, n_clusters: int = 16):
    """Independent reference: scalar cosines, explicit greedy."""
    _, cents, clusters = _index_clusters(n_clusters)
    verdicts = {}
    for lid, (ids, vecs) in clusters.items():
        ranked = sorted(
            range(len(ids)), key=lambda i: (_cos6(vecs[i], cents[lid]), ids[i])
        )
        kept_idx: list[int] = []
        for i in ranked:
            if any(_cos6(vecs[i], vecs[j]) >= threshold for j in kept_idx):
                verdicts[ids[i]] = (lid, _cos6(vecs[i], cents[lid]), False)
            else:
                kept_idx.append(i)
                verdicts[ids[i]] = (lid, _cos6(vecs[i], cents[lid]), True)
    return verdicts


@pytest.fixture(scope="module")
def prod_verdicts(ray_session):
    return semdedup_kept(SF, threshold=THR).to_pandas()


def test_semdedup_matches_naive_reference(prod_verdicts):
    ref = _naive_semdedup(THR)
    assert len(prod_verdicts) == len(ref) == 500
    for row in prod_verdicts.itertuples():
        lid, cc, kept = ref[row.vec_id]
        assert row.cluster == lid
        assert row.centroid_cos6 == pytest.approx(cc, abs=0)
        assert bool(row.kept) is kept, f"vec {row.vec_id}"
    # and the permissive threshold actually drops something
    assert 0 < prod_verdicts.kept.sum() < len(prod_verdicts)


def test_semdedup_duckdb_recursive_replay(prod_verdicts):
    """Replay ranking + pair graph + the greedy itself in SQL. The
    recursive CTE advances every cluster one rank per iteration,
    carrying the kept-id list; a row is appended unless a
    similar-enough earlier KEPT row exists."""
    import duckdb

    idx, cents, _ = _index_clusters()
    cent_rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(
            l, ", ".join(repr(float(x)) for x in cents[l])
        )
        for l in range(len(cents))
    )
    q = f"""
WITH RECURSIVE cents(cluster, c) AS (VALUES {cent_rows}),
emb AS (
  SELECT vec_id, CAST(list_id AS BIGINT) AS cluster,
         CAST(embedding AS DOUBLE[]) AS e
  FROM parquet_scan('{idx}/*/*.parquet', hive_partitioning=1)
),
ranked AS (
  SELECT vec_id, cluster,
         ROUND(list_cosine_similarity(e, c), 6) AS cc, e,
         ROW_NUMBER() OVER (
           PARTITION BY cluster
           ORDER BY ROUND(list_cosine_similarity(e, c), 6), vec_id
         ) AS r
  FROM emb JOIN cents USING (cluster)
),
sim AS (
  SELECT a.cluster, a.vec_id AS va, b.vec_id AS vb
  FROM ranked a JOIN ranked b
    ON a.cluster = b.cluster AND a.r < b.r
   AND ROUND(list_cosine_similarity(a.e, b.e), 6) >= {THR}
),
st(cluster, r, kept_ids) AS (
  SELECT cluster, 0, []::BIGINT[] FROM (SELECT DISTINCT cluster FROM ranked)
  UNION ALL
  SELECT st.cluster, st.r + 1,
         CASE WHEN EXISTS (
                SELECT 1 FROM sim s
                WHERE s.cluster = st.cluster AND s.vb = rk.vec_id
                  AND list_contains(st.kept_ids, s.va))
              THEN st.kept_ids
              ELSE list_append(st.kept_ids, rk.vec_id) END
  FROM st JOIN ranked rk ON rk.cluster = st.cluster AND rk.r = st.r + 1
),
final AS (
  SELECT cluster, kept_ids,
         ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY r DESC) AS rn
  FROM st
)
SELECT rk.vec_id, rk.cluster, rk.cc AS centroid_cos6,
       list_contains(f.kept_ids, rk.vec_id) AS kept
FROM ranked rk JOIN final f ON f.cluster = rk.cluster AND f.rn = 1
ORDER BY vec_id
"""
    oracle = duckdb.sql(q).df()
    assert len(oracle) == len(prod_verdicts)
    got = prod_verdicts.sort_values("vec_id").reset_index(drop=True)
    assert got["vec_id"].tolist() == oracle["vec_id"].tolist()
    assert got["cluster"].tolist() == oracle["cluster"].tolist()
    assert got["kept"].tolist() == oracle["kept"].tolist()
    assert np.allclose(
        got["centroid_cos6"].to_numpy(), oracle["centroid_cos6"].to_numpy(),
        atol=0, rtol=0,
    )


def test_semdedup_threshold_edges(ray_session):
    above = semdedup_kept(SF, threshold=1.01).to_pandas()
    assert above.kept.all()  # cosine never reaches 1.01
    floor = semdedup_kept(SF, threshold=-1.0).to_pandas()
    per_cluster = floor.groupby("cluster").kept.sum()
    assert (per_cluster == 1).all()  # everything similar → one survivor
    # the survivor is the paper's pick: the most atypical member
    for lid, grp in floor.groupby("cluster"):
        winner = grp[grp.kept]
        ranked = grp.sort_values(["centroid_cos6", "vec_id"])
        assert winner.vec_id.iloc[0] == ranked.vec_id.iloc[0]


def test_semdedup_deterministic(prod_verdicts, ray_session):
    again = semdedup_kept(SF, threshold=THR).to_pandas()
    assert again.equals(prod_verdicts)


def test_semdedup_corpus_composition(prod_verdicts, ray_session):
    """The curated documents table keeps exactly the kept vec_ids
    (full-coverage corpus: every doc has an embedding here)."""
    from nidaba_ray.functions.semdedup import semdedup_corpus

    docs = semdedup_corpus(SF, threshold=THR).to_pandas()
    kept_ids = set(prod_verdicts[prod_verdicts.kept].vec_id)
    assert set(docs.doc_id) == kept_ids
    assert set(docs.columns) == {"doc_id", "text", "lang"}


def test_semdedup_corpus_keeps_unscored_docs(ray_session):
    """sf0.1 has 5000 docs but only 2000 embeddings: documents without
    an embedding row carry no verdict and must be retained."""
    from nidaba_ray.functions.semdedup import semdedup, semdedup_corpus

    sf = "/root/testdata/sf0.1"
    v = semdedup(sf, threshold=THR).to_pandas()
    docs = semdedup_corpus(sf, threshold=THR).to_pandas()
    scored = set(v.vec_id)
    kept_scored = set(v[v.kept].vec_id)
    import pyarrow.parquet as _pq

    all_ids = set(
        _pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])
        ["doc_id"].to_pylist()
    )
    expect = (all_ids - scored) | (kept_scored & all_ids)
    assert set(docs.doc_id) == expect
    assert len(all_ids - scored) > 0  # the shape this test exists for
