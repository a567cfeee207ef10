"""Source-reputation curation (pipelines/curate.py round 5): the
group-level gate — per-source aggregates decide, per-row filter
applies. DuckDB parity on the real corpus AND a crafted corpus where
both flag rules fire."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nidaba_ray.pipelines.curate import (
    CURATED_BY_SOURCE_SQL,
    SOURCE_REPUTATION_SQL,
    curated_by_source,
    source_reputation,
)

SF = "/root/testdata/sf0.001"


def _crafted(tmp_path) -> str:
    """Three sources: 'dupfarm' serves the same page over and over
    (dup rule), 'stubs' serves ultra-short pages (mean-token rule),
    'good' serves normal unique prose."""
    rows = []
    for i in range(20):
        rows.append((i, "exactly the same mirrored article body "
                        "repeated verbatim on every page " * 3, "en",
                     "dupfarm"))
    for i in range(20, 40):
        rows.append((i, f"tiny {i}", "en", "stubs"))
    for i in range(40, 60):
        rows.append((i, f"article {i} " + " ".join(
            f"word{i}x{j}" for j in range(60)), "en", "good"))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
    })
    d = os.path.join(tmp_path, "crafted")
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    return d


def _parity(sf_dir: str, ray_table: pa.Table, sql: str,
            sort_cols: list[str]) -> None:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(sql).fetchdf().sort_values(
        sort_cols).reset_index(drop=True)
    got = ray_table.to_pandas().sort_values(
        sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_reputation_parity_real(ray_session):
    _parity(SF, source_reputation(SF), SOURCE_REPUTATION_SQL, ["source"])


def test_reputation_parity_and_rules_crafted(ray_session, tmp_path):
    d = _crafted(tmp_path)
    rep = source_reputation(d).to_pandas().set_index("source")
    assert bool(rep.loc["dupfarm", "flagged"])   # dup-share rule
    assert bool(rep.loc["stubs", "flagged"])     # mean-token rule
    assert not bool(rep.loc["good", "flagged"])
    _parity(d, source_reputation(d), SOURCE_REPUTATION_SQL, ["source"])


def test_curated_by_source_parity_crafted(ray_session, tmp_path):
    d = _crafted(tmp_path)
    got = pa.Table.from_pandas(curated_by_source(d).to_pandas(),
                               preserve_index=False)
    _parity(d, got, CURATED_BY_SOURCE_SQL, ["doc_id"])
    # only the healthy source survives
    assert set(got["source"].to_pylist()) == {"good"}


def test_curated_by_source_keeps_everything_on_clean_corpus(ray_session):
    """The synthetic corpus has no dup farms and no stub sources —
    the gate must be a no-op there (and SQL agrees)."""
    got = curated_by_source(SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    n_all = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert len(got) == n_all
