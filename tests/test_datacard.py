"""Corpus data card (pipelines/report.py round 5): one-query DuckDB
parity on the real corpus and on a crafted corpus where every column
moves (duplicates, gopher-passing prose, negative Flesch)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from nidaba_ray.pipelines.report import DATACARD_SQL, corpus_datacard

SF = "/root/testdata/sf0.001"


def _parity(sf_dir: str) -> pd.DataFrame:
    got = corpus_datacard(sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    want = con.execute(DATACARD_SQL).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    return got


def test_datacard_parity_real(ray_session):
    got = _parity(SF)
    assert set(got["lang"]) == {"en", "de", "es", "fr", "zh"}
    assert (got["n_uniq_texts"] <= got["n_docs"]).all()
    # the synthetic corpus is punctuation-free → gopher stopword/
    # symbol rules fail → pass fraction 0 (the c4_filtered note)
    assert (got["gopher_pass_frac"] == 0.0).all()


def test_datacard_parity_crafted(ray_session, tmp_path):
    prose = ("The crew have sailed out of the harbor with the tide "
             "and that departure was timed to the minute. " * 3
             + "They will be back with the evening flood, and the "
             "log will show a clean run to the island and home.")
    rows = [
        # 3 copies of one doc + 1 unique → dup_frac 0.5 for 'en'
        (0, prose, "en"), (1, prose, "en"), (2, prose, "en"),
        (3, prose + " Nothing repeats here be that as it may.", "en"),
        # de: short punctuation-free soup (fails gopher, low flesch
        # variance)
        (4, "kurz und klein", "de"),
        (5, "noch ein kurzer text", "de"),
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    d = os.path.join(tmp_path, "card")
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    got = _parity(d).set_index("lang")
    assert got.loc["en", "n_docs"] == 4
    assert got.loc["en", "n_uniq_texts"] == 2
    assert got.loc["en", "dup_frac"] == 0.5
    # the prose passes all six SQL-able gopher document rules
    assert got.loc["en", "gopher_pass_frac"] == 1.0
    assert got.loc["de", "gopher_pass_frac"] == 0.0
