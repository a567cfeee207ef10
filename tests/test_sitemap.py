"""Sitemap parsing: urlset/index dispatch, gzip members, DuckDB
parity of the shared patterns, and the flat-map shape."""
from __future__ import annotations

import gzip
import random

import duckdb
import pyarrow as pa
import pytest

from nidaba_ray.functions.sitemap import (
    parse_sitemap,
    sitemap_entries,
    sitemap_entries_batch,
    sitemap_sql,
)

URLSET = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://x.example/a</loc><lastmod>2024-01-02</lastmod></url>
  <url>
    <loc>
      https://x.example/b
    </loc>
  </url>
  <url><lastmod>2024-05-05</lastmod></url>
  <URL><LOC>https://x.example/c</LOC></URL>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://x.example/s1.xml.gz</loc>
  <lastmod>2023-12-31</lastmod></sitemap>
  <sitemap><loc>https://x.example/s2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_pins():
    kind, entries = parse_sitemap(URLSET.encode())
    assert kind == "urlset"
    assert entries == [("https://x.example/a", "2024-01-02"),
                       ("https://x.example/b", ""),
                       ("https://x.example/c", "")]
    kind, entries = parse_sitemap(INDEX.encode())
    assert kind == "index"
    assert entries == [("https://x.example/s1.xml.gz", "2023-12-31"),
                       ("https://x.example/s2.xml", "")]
    # .xml.gz convention inflates transparently
    kind, entries = parse_sitemap(gzip.compress(URLSET.encode()))
    assert kind == "urlset" and len(entries) == 3
    with pytest.raises(ValueError):
        parse_sitemap(b"\x1f\x8b corrupt")
    assert parse_sitemap(b"not xml at all") == ("urlset", [])


def test_duckdb_parity():
    rng = random.Random(404)
    pieces = ["<url>", "</url>", "<loc>", "</loc>", "<lastmod>",
              "</lastmod>", "https://y/", "2024-02-0", "<sitemap>",
              "</sitemap>", " ", "\n", "x<", ">&"]
    docs = [("d0", URLSET), ("d1", INDEX), ("d2", "plain text"),
            ("d3", "<url><loc></loc></url>")]
    for i in range(100):
        docs.append((f"f{i:03d}", "".join(
            rng.choice(pieces) for _ in range(rng.randrange(1, 14)))))
    t = pa.table({"url": pa.array([d[0] for d in docs]),
                  "xml": pa.array([d[1] for d in docs])})
    got = (sitemap_entries_batch(t).to_pandas()
           .sort_values(["url", "entry_idx"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("sitemaps", t)
    want = con.execute(sitemap_sql()).fetchdf()
    for col in ("url", "entry_idx", "kind", "loc", "lastmod"):
        assert got[col].tolist() == want[col].tolist(), col


def test_flat_map_shape(ray_session):
    import ray.data as rd

    t = pa.table({"url": pa.array(["s1", "s2"]),
                  "xml": pa.array([gzip.compress(URLSET.encode()),
                                   b"<x/>"], pa.binary())})
    out = sitemap_entries(rd.from_arrow(t)).to_pandas()
    assert len(out) == 3 and set(out["url"]) == {"s1"}
