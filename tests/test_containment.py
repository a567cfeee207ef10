"""Exact n-gram containment join (functions/dedup.py
ngram_containment_pairs): one-sided prefix-filter losslessness vs
brute force, directionality, and DuckDB oracle parity."""

from __future__ import annotations

import itertools

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nidaba_ray.functions.dedup import (
    ngram_containment_pairs,
    ngram_containment_sql,
    shingle_hashes,
)


def _corpus(tmp_path):
    base = " ".join(f"tok{i}" for i in range(60))
    snippet = " ".join(f"tok{i}" for i in range(10, 25))  # ⊂ base
    near = " ".join(f"tok{i}" for i in range(10, 25)) + " oddball"
    other = " ".join(f"zz{i}" for i in range(30))
    texts = [base, snippet, near, other, base]  # 4 dups base/4
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    return str(d), texts


def _brute(texts, thr):
    sets = [set(shingle_hashes(t).tolist()) for t in texts]
    want = set()
    for a, b in itertools.permutations(range(len(texts)), 2):
        if len(sets[a] & sets[b]) / len(sets[a]) >= thr:
            want.add((a, b))
    return want


@pytest.mark.parametrize("thr", [0.6, 0.8, 1.0])
def test_containment_lossless_vs_brute_force(ray_session, tmp_path, thr):
    d, texts = _corpus(tmp_path)
    got = ngram_containment_pairs(d, threshold=thr).to_pandas()
    assert set(zip(got["doc_a"], got["doc_b"])) == _brute(texts, thr)


def test_containment_directionality(ray_session, tmp_path):
    d, texts = _corpus(tmp_path)
    got = ngram_containment_pairs(d, threshold=0.9).to_pandas()
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    # snippet (1) is fully contained in base (0) — but not vice versa
    assert (1, 0) in pairs and (0, 1) not in pairs
    # exact dups (0, 4) contain each other, both directions
    assert (0, 4) in pairs and (4, 0) in pairs
    by = got.set_index(["doc_a", "doc_b"])["containment"]
    assert by[(1, 0)] == 1.0 and by[(0, 4)] == 1.0


def test_containment_duckdb_parity(ray_session, tmp_path):
    d, texts = _corpus(tmp_path)
    got = (ngram_containment_pairs(d, threshold=0.6).to_pandas()
           .reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"""CREATE VIEW documents AS
        SELECT * FROM read_parquet('{d}/documents.parquet')""")
    want = con.execute(ngram_containment_sql(0.6)).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_containment_on_test_corpus(ray_session):
    """sf0.001 corpus: parity with the SQL oracle end-to-end (the
    corpus carries exact duplicates, so the result is non-empty)."""
    sf = "/root/testdata/sf0.001"
    got = ngram_containment_pairs(sf, threshold=0.9).to_pandas()
    con = duckdb.connect()
    con.execute(f"""CREATE VIEW documents AS
        SELECT * FROM read_parquet('{sf}/documents.parquet')""")
    want = con.execute(ngram_containment_sql(0.9)).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.astype(got.dtypes.to_dict()))
    assert len(got) > 0
