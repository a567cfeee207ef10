"""Boilerplate-line mining (report.boilerplate_top) and line-break
dehyphenation (functions/dehyphen.py): DuckDB parity and the
conservative-rule pins."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data as rd

from nidaba_ray.functions.dehyphen import (
    dehyphen_sql_expr,
    dehyphenate,
    dehyphenate_batch,
)
from nidaba_ray.pipelines.report import boilerplate_top, boilerplate_top_sql


def _docs() -> pa.Table:
    footer = "Subscribe to our newsletter for weekly harbor updates"
    cookie = "We use cookies to improve your experience"
    return pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([
            f"Article one body text.\n{footer}\n{cookie}",
            f"Another article entirely.\n{footer}\n{cookie}",
            f"Third piece of writing.\n{footer}",
            # the footer twice in ONE doc still counts df once
            f"{footer}\nFourth piece.\n{footer}",
            "Unique content with no repeated furniture at all.",
            f"Fifth article.\n{cookie}",
        ], pa.string()),
    })


def test_boilerplate_top_duckdb_parity(ray_session):
    t = _docs()
    got = boilerplate_top(rd.from_arrow(t), k=5, min_df=2).to_pandas()
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(boilerplate_top_sql(k=5, min_df=2)).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    by = got.set_index("line")["df"]
    assert by["Subscribe to our newsletter for weekly harbor updates"] == 4
    assert by["We use cookies to improve your experience"] == 3
    # unique lines are below min_df
    assert "Article one body text." not in by.index


def test_boilerplate_layout_invariance(ray_session):
    t = _docs()
    a = boilerplate_top(rd.from_arrow(t), k=5).to_pandas()
    b = boilerplate_top(rd.from_arrow(t).repartition(5), k=5).to_pandas()
    pd.testing.assert_frame_equal(a, b)


DEHYPHEN_SAMPLES = [
    "the exam-\nple continues on the next line",
    "hyphen at page edge: naviga-\n  tion lights",
    "Boat-\nBuilding stays (capital continuation)",
    "numeric range 3-\n4 stays",
    "a real compound well-known stays inline",
    "plain text without any of it",
    "",
]


def test_dehyphenate_duckdb_parity():
    con = duckdb.connect()
    con.register("t", pa.table({"text": pa.array(DEHYPHEN_SAMPLES)}))
    want = [r[0] for r in con.execute(
        f"SELECT {dehyphen_sql_expr('text')} FROM t").fetchall()]
    got = [dehyphenate(s) for s in DEHYPHEN_SAMPLES]
    assert got == want
    assert got[0] == "the example continues on the next line"
    assert got[1] == "hyphen at page edge: navigation lights"
    assert got[2] == DEHYPHEN_SAMPLES[2]  # conservative: untouched
    assert got[3] == DEHYPHEN_SAMPLES[3]
    assert got[4] == DEHYPHEN_SAMPLES[4]


def test_dehyphenate_batch_and_registry():
    from nidaba_ray.stages.registry import list_stages

    assert "clean.dehyphenate" in list_stages()
    b = pa.table({"text": pa.array(DEHYPHEN_SAMPLES[:2])})
    out = dehyphenate_batch(b)
    assert out["text"].to_pylist() == [
        "the example continues on the next line",
        "hyphen at page edge: navigation lights"]
