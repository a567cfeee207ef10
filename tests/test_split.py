"""Deterministic train/val/test split (pipelines/curate.py
split_assign): DuckDB parity, exhaustive/disjoint assignment, layout
invariance, and quota-growth monotonicity (no eval contamination on
retune)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from nidaba_ray.pipelines.curate import (
    split_assign,
    split_counts,
    split_counts_sql,
    split_sql,
)

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(f"""CREATE VIEW documents AS
        SELECT * FROM read_parquet('{SF}/documents.parquet')""")
    return con


def test_split_duckdb_parity(ray_session):
    got = (split_assign(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = _con().execute(
        split_sql() + " ORDER BY doc_id").df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    assert set(got["split"].unique()) <= {"train", "val", "test"}
    # every doc assigned exactly once
    assert got["doc_id"].is_unique and len(got) == 500


def test_split_counts_parity(ray_session):
    pm = {"test": 1000, "val": 500}
    got = split_counts(SF, pm).to_pandas()
    want = _con().execute(split_counts_sql(pm)).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    by = got.groupby("split")["n_docs"].sum()
    # ~10% test / ~5% val of 500 docs (hashed, so approximate)
    assert 25 <= by.get("test", 0) <= 85
    assert by.get("train", 0) > 350


def test_split_layout_invariance(ray_session):
    a = (split_assign(SF).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (split_assign(SF).repartition(7).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_split_quota_growth_is_monotone(ray_session):
    """Raising quotas only moves TRAIN docs into holdouts — a doc
    already in test (or test∪val) never flips back (the ordered-bucket
    property that prevents eval contamination on retune)."""
    small = split_assign(SF, {"test": 100, "val": 100}).to_pandas()
    big = split_assign(SF, {"test": 400, "val": 300}).to_pandas()
    s = small.set_index("doc_id")["split"]
    b = big.set_index("doc_id")["split"]
    assert (b[s[s == "test"].index] == "test").all()
    # test∪val is a superset after growth
    small_hold = set(s[s != "train"].index)
    big_hold = set(b[b != "train"].index)
    assert small_hold <= big_hold
