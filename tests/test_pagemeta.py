"""Page-head metadata harvest (functions/pagemeta.py): DuckDB byte
parity on crafted pages and the full fixture corpus, attribute-order
freedom, first-match-wins."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from nidaba_ray.functions.pagemeta import page_meta_batch, page_meta_sql


def _pages() -> pa.Table:
    return pa.table({
        "url": pa.array([
            "https://a.com/1", "https://b.com/2", "https://c.com/3",
        ], pa.string()),
        "html": pa.array([
            # content BEFORE name; single quotes; og tags; whitespace
            '<html><head><title> Harbor \n News </title>'
            '<meta content="Daily harbor reporting &amp; tides" '
            'name="description">'
            "<link rel='canonical' href='https://a.com/one'/>"
            '<meta property="og:title" content="Harbor News (OG)">'
            '<meta property="og:description" content=\'OG desc\'>'
            '</head><body><p>x</p></body></html>',
            # two descriptions: first wins; no canonical/og
            '<head><TITLE>Second</TITLE>'
            '<meta name="description" content="first desc">'
            '<meta name="description" content="second desc"></head>',
            # nothing at all
            '<html><body><p>bare page</p></body></html>',
        ], pa.string()),
    })


def test_duckdb_parity_crafted():
    pages = _pages()
    got = (page_meta_batch(pages).to_pandas()
           .sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.register("pages", pages)
    want = con.execute(page_meta_sql()).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    row = got.set_index("url").loc["https://a.com/1"]
    assert row["title"] == "Harbor News"
    assert row["description"] == "Daily harbor reporting &amp; tides"
    assert row["canonical"] == "https://a.com/one"
    assert row["og_title"] == "Harbor News (OG)"
    assert row["og_description"] == "OG desc"
    second = got.set_index("url").loc["https://b.com/2"]
    assert second["description"] == "first desc"
    bare = got.set_index("url").loc["https://c.com/3"]
    assert (bare[["title", "description", "canonical",
                  "og_title", "og_description"]] == "").all()


def test_duckdb_parity_fixture_corpus():
    from nidaba_ray.realpages import FIXTURES

    pages = pa.table({
        "url": pa.array([f"fixture://{f['name']}" for f in FIXTURES]),
        "html": pa.array([
            f["html"].encode("utf-8").decode("latin-1")
            for f in FIXTURES]),
    })
    got = (page_meta_batch(pages).to_pandas()
           .sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.register("pages", pages)
    want = con.execute(page_meta_sql()).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_bytes_input_decodes_latin1():
    pages = pa.table({
        "url": pa.array(["https://x"]),
        "html": pa.array([b"<title>caf\xe9 page</title>"], pa.binary()),
    })
    got = page_meta_batch(pages)
    assert got["title"].to_pylist() == ["caf\xe9 page"]


def test_registered():
    from nidaba_ray.stages.registry import list_stages

    assert "extract.meta" in list_stages()


def test_index_metadata_example_spec(ray_session):
    import ray.data as rd

    from nidaba_ray.stages import registry

    spec = registry.load_spec("examples/index_metadata.yaml")
    t = pa.table({
        "url": pa.array(["https://a.com/1"]),
        "html": pa.array(
            [b"<head><title>One</title>"
             b'<meta name="description" content="d1"></head>'],
            pa.binary()),
    })
    out = registry.compile_pipeline(rd.from_arrow(t), spec).to_pandas()
    assert out.loc[0, "title"] == "One"
    assert out.loc[0, "description"] == "d1"
