"""Incremental cross-crawl near-dup (functions/crossdedup.py):
prior_pairs ∪ probe_pairs must equal full re-mining of the union —
candidate generation uses the SAME permutations and band hashing, so
the equality is exact, not approximate."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nidaba_ray.functions.crossdedup import (
    build_band_index,
    incremental_minhash_pairs,
)
from nidaba_ray.functions.dedup import clear_pair_memo, minhash_dedup_pairs

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def two_crawls(tmp_path):
    """prior = the sf0.001 documents; new = a disjoint-id crawl with
    (a) near-dup rewrites of prior docs (one token appended — high
    Jaccard), (b) mutual near-dups inside the new crawl, (c) fresh
    unique docs. Returns (prior_dir, new_dir, union_dir)."""
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') "
        "ORDER BY doc_id"
    ).fetch_arrow_table()
    prior = tmp_path / "prior"
    prior.mkdir()
    pq.write_table(docs, prior / "documents.parquet")

    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    base = max(ids) + 1
    new_rows = []
    for j, (i, t) in enumerate(zip(ids[:12], texts[:12])):
        new_rows.append((base + j, t + " recrawled"))     # cross near-dup
    twin = texts[20] + " zz"
    new_rows.append((base + 100, twin))                   # new-new pair
    new_rows.append((base + 101, twin + " yy"))
    for j in range(6):                                    # fresh uniques
        new_rows.append((base + 200 + j,
                         " ".join(f"fresh{j}w{k}" for k in range(40))))
    new_tbl = pa.table({
        "doc_id": pa.array([r[0] for r in new_rows], pa.int64()),
        "text": pa.array([r[1] for r in new_rows], pa.string()),
    })
    new = tmp_path / "new"
    new.mkdir()
    pq.write_table(new_tbl, new / "documents.parquet")

    union = tmp_path / "union"
    union.mkdir()
    pq.write_table(
        pa.concat_tables([docs, new_tbl]), union / "documents.parquet"
    )
    return str(prior), str(new), str(union)


def test_incremental_equals_full_remining(ray_session, tmp_path, two_crawls):
    prior, new, union = two_crawls
    clear_pair_memo()
    idx = str(tmp_path / "bands")
    build_band_index(prior, idx)

    probe = incremental_minhash_pairs(new, prior, index_dir=idx).to_pandas()
    prior_pairs = minhash_dedup_pairs(prior).to_pandas()
    full = minhash_dedup_pairs(union).to_pandas()

    merged = (
        pd.concat([prior_pairs, probe])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    full = full.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert merged.equals(full), (
        f"merged {len(merged)} rows != full {len(full)} rows"
    )
    # the probe actually found BOTH shapes it exists for
    new_min = probe[["doc_a", "doc_b"]].min().min()
    assert len(probe) > 0
    prior_ids = set(prior_pairs["doc_a"]) | set(prior_pairs["doc_b"])
    assert any(a <= max(prior_ids | {new_min}) and b > max(prior_ids)
               for a, b in zip(probe["doc_a"], probe["doc_b"]))
    # disjointness: no prior-prior pair leaked into the probe result
    new_ids = set(
        pq.read_table(f"{new}/documents.parquet")["doc_id"].to_pylist()
    )
    assert all(a in new_ids or b in new_ids
               for a, b in zip(probe["doc_a"], probe["doc_b"]))


def test_probe_cross_and_self_shapes(ray_session, tmp_path, two_crawls):
    """Hand-checkable pins: the recrawled docs pair with their prior
    originals; the in-crawl twins pair with each other."""
    prior, new, union = two_crawls
    clear_pair_memo()
    probe = incremental_minhash_pairs(new, prior).to_pandas()
    pairs = set(zip(probe["doc_a"], probe["doc_b"]))
    n_docs = len(pq.read_table(f"{prior}/documents.parquet"))
    base = n_docs  # prior ids are 0..n-1 in the sf0.001 table
    # cross: doc 0's recrawl (base+0) pairs with doc 0
    assert (0, base) in pairs
    # self: the two twins pair with each other
    assert (base + 100, base + 101) in pairs
    # jaccard values are verified-exact and above threshold
    assert (probe["jaccard"] >= 0.7).all()


def test_index_cache_resolves_and_rebuilds(ray_session, tmp_path, two_crawls):
    """The content-addressed cache reuses a fresh index and rebuilds a
    stale one (the _resolve_ivf_index contract)."""
    import nidaba_ray.functions.crossdedup as cd

    prior, new, union = two_crawls
    idx1 = cd._resolve_band_index(prior)
    idx2 = cd._resolve_band_index(prior)
    assert idx1 == idx2
    # touching the corpus invalidates (fingerprint includes mtime)
    import os
    import time

    t = time.time() + 2
    os.utime(f"{prior}/documents.parquet", (t, t))
    idx3 = cd._resolve_band_index(prior)
    assert os.path.isfile(os.path.join(idx3, "_BAND_DONE"))
