"""Anchor-text aggregation (functions/linkgraph.py host_anchors /
top_anchor_per_host) and the hot-key skew audit (pipelines/report.py
key_skew): DuckDB byte-parity on both, plus the integer-ppm and
tie-break contracts."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data as rd

from nidaba_ray.functions.linkgraph import (
    host_anchors,
    host_anchors_sql,
    top_anchor_per_host,
    top_anchor_sql,
)
from nidaba_ray.pipelines.report import key_skew, key_skew_sql


def _pages() -> pa.Table:
    return pa.table({
        "url": pa.array([
            "https://a.example.com/1",
            "https://b.example.com/2",
            "https://c.example.com/3",
        ], pa.string()),
        "html": pa.array([
            '<a href="https://t.example.net/x">Home Page</a>'
            '<a href="https://t.example.net/y">Docs</a>'
            '<a href="https://t.example.net/z"><img src=i.png></a>',
            '<a href="https://t.example.net/x">Home Page</a>'
            '<a href="https://other.net/q">Other Site</a>',
            '<a href="https://t.example.net/x">home page</a>'
            '<a href="https://other.net/q">Aardvark</a>'
            '<a href="https://other.net/r">Aardvark</a>',
        ], pa.string()),
    })


def test_host_anchors_duckdb_parity(ray_session):
    pages = _pages()
    got = (host_anchors(rd.from_arrow(pages)).to_pandas()
           .sort_values(["dst_host", "anchor"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("pages", pages)
    want = con.execute(host_anchors_sql()).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # empty anchors (image-only links) dropped
    assert (got["anchor"] != "").all()
    # case-sensitive anchors count separately
    t = got[got["dst_host"] == "t.example.net"].set_index("anchor")
    assert t.loc["Home Page", "n_links"] == 2
    assert t.loc["home page", "n_links"] == 1


def test_top_anchor_duckdb_parity(ray_session):
    pages = _pages()
    got = (top_anchor_per_host(rd.from_arrow(pages)).to_pandas()
           .sort_values("dst_host").reset_index(drop=True))
    con = duckdb.connect()
    con.register("pages", pages)
    want = con.execute(top_anchor_sql()).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    by = got.set_index("dst_host")
    assert by.loc["t.example.net", "anchor"] == "Home Page"
    # tie on other.net (Aardvark×2 vs Other Site×1) → count wins;
    # craft an exact tie elsewhere to pin anchor-asc tie-break
    assert by.loc["other.net", "anchor"] == "Aardvark"


def test_top_anchor_tie_breaks_anchor_asc(ray_session):
    pages = pa.table({
        "url": pa.array(["https://s.com/1"], pa.string()),
        "html": pa.array([
            '<a href="https://t.com/a">zebra</a>'
            '<a href="https://t.com/b">apple</a>',
        ], pa.string()),
    })
    got = top_anchor_per_host(rd.from_arrow(pages)).to_pandas()
    assert got.loc[0, "anchor"] == "apple"


def test_key_skew_duckdb_parity(ray_session):
    # 60% hot key, a 20% warm key, a tail — over enough rows for ppm
    langs = (["en"] * 60 + ["de"] * 20 + ["fr"] * 10
             + ["it"] * 6 + ["ja"] * 4)
    t = pa.table({"lang": pa.array(langs, pa.string()),
                  "x": pa.array(range(len(langs)), pa.int64())})
    got = key_skew(rd.from_arrow(t), "lang", k=3,
                   hot_ppm=150_000).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(key_skew_sql("t", "lang", k=3,
                                    hot_ppm=150_000)).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    assert list(got["lang"]) == ["en", "de", "fr"]
    assert list(got["share_ppm"]) == [600_000, 200_000, 100_000]
    assert list(got["is_hot"]) == [1, 1, 0]


def test_key_skew_count_tie_breaks_key_asc(ray_session):
    t = pa.table({"k": pa.array(["b", "a", "b", "a", "c"], pa.string())})
    got = key_skew(rd.from_arrow(t), "k", k=2).to_pandas()
    assert list(got["k"]) == ["a", "b"]


def test_key_skew_layout_invariance(ray_session):
    langs = ["en"] * 30 + ["de"] * 12 + ["fr"] * 7
    t = pa.table({"lang": pa.array(langs, pa.string())})
    a = key_skew(rd.from_arrow(t), "lang", k=3).to_pandas()
    b = key_skew(rd.from_arrow(t).repartition(7), "lang", k=3).to_pandas()
    pd.testing.assert_frame_equal(a, b)
