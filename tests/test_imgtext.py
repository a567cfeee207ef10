"""Image–text pair harvest: DuckDB byte parity of the shared patterns
(identical regex bytes on both engines), adversarial + fuzz corpora,
the real-page fixture corpus, and the distributed flat-map shape."""
from __future__ import annotations

import random

import duckdb
import pyarrow as pa

from nidaba_ray.functions.imgtext import (
    harvest_img_batch,
    image_text_pairs,
    image_text_sql,
)


def _parity(pages: list[tuple[str, str]]):
    t = pa.table({
        "url": pa.array([p[0] for p in pages], pa.string()),
        "html": pa.array([p[1].encode() for p in pages], pa.binary()),
    })
    got = (harvest_img_batch(t).to_pandas()
           .sort_values(["url", "pair_idx"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("pages", pa.table({
        "url": pa.array([p[0] for p in pages], pa.string()),
        "html": pa.array([p[1] for p in pages], pa.string()),
    }))
    want = con.execute(image_text_sql()).fetchdf()
    assert got["url"].tolist() == want["url"].tolist()
    assert got["pair_idx"].tolist() == want["pair_idx"].tolist()
    assert got["img_src"].tolist() == want["img_src"].tolist()
    assert got["alt_text"].tolist() == want["alt_text"].tolist()
    return got


def test_harvest_pins_and_parity():
    got = _parity([
        ("u1", '<p>x</p><img src="a.png" alt="A cat"> <img alt=\'no src\'> '
               '<IMG SRC=\'b.jpg\'   ALT = "two  words" /> <imgx src="n.png">'),
        ("u2", '<img\nsrc="c.webp"\nalt="line\nbreak"><img src="">'),
        ("u3", "plain text, no images at all"),
        ("u4", "<img data-src=\"lazy.png\" src='d.gif'>"),  # data-src ≠ src
        ("u5", "<img src=unquoted.png alt='x'>"),  # unquoted src skipped
    ])
    assert got["img_src"].tolist() == ["a.png", "b.jpg", "c.webp", "d.gif"]
    assert got["alt_text"].tolist() == ["A cat", "two  words",
                                        "line\nbreak", ""]


def test_harvest_fuzz_parity():
    rng = random.Random(910)
    pieces = ['<img src="', '<img alt="', '" alt="', '">', "'>", "<img ",
              "img", "src=", "alt=", "x.png", " ", "<", ">", '"', "'",
              "~%|", "src = 'q.jpg'", "\n", "/>"]
    pages = []
    for i in range(120):
        pages.append((f"u{i:03d}", "".join(
            rng.choice(pieces) for _ in range(rng.randrange(1, 12)))))
    _parity(pages)


def test_over_fixture_corpus():
    """The real-page fixtures (AMP figure, photo essay, lazy-load …)
    carry genuine <img> tags — both engines must agree on all 130+."""
    from nidaba_ray.realpages import FIXTURES

    pages = [(f["name"], f["html"]) for f in FIXTURES]
    got = _parity(pages)
    assert len(got) >= 5  # the corpus genuinely contains img tags


def test_distributed_flat_map(ray_session):
    import ray.data as rd

    t = pa.table({
        "url": pa.array(["a", "b"], pa.string()),
        "html": pa.array(
            [b'<img src="1.png" alt="one"><img src="2.png">',
             b"none"], pa.binary()),
    })
    out = image_text_pairs(rd.from_arrow(t)).to_pandas()
    assert len(out) == 2
    assert out["pair_idx"].tolist() == [0, 1]
