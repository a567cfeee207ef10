"""Real-page fixture goldens — the hedge against the synthetic
corpus's extraction-as-identity circularity (VERDICT r1 item 1).

Every hand-authored fixture in nidaba_ray/realpages.py must extract to
its hand-labelled expected main text byte-exactly, both through the
row kernels (fast iteration) and through the real distributed pipeline
(extract_golden_real). These labels are FROZEN: a segmenter or scorer
change that flips any fixture is a regression, not a re-label."""

import numpy as np
import pytest

from nidaba_ray.realpages import FIXTURES
from nidaba_ray.stages.extract import extract_row
from nidaba_ray.stages.merge import vote_row
from nidaba_ray.stages.score import suppress_isolated


@pytest.mark.parametrize("fx", FIXTURES, ids=[f["name"] for f in FIXTURES])
def test_fixture_extracts_to_label(fx):
    kind, spans, err = extract_row(fx["html"].encode("utf-8"))
    assert err == "", fx["name"]
    final, kept, prov, n_blocks, n_kept = vote_row(
        spans, None, kind, fx.get("lang", "en")
    )
    assert final == fx["expected"], fx["name"]
    # kept spans carry offsets into the final text (reading order)
    offs = [(s["start"], s["end"]) for s in kept if s["start"] >= 0]
    assert offs == sorted(offs)


def test_fixture_names_unique():
    names = [f["name"] for f in FIXTURES]
    assert len(names) == len(set(names))
    assert len(names) >= 25  # the corpus must not silently shrink


def test_extract_golden_real_through_ray(ray_session):
    import hashlib

    from nidaba_ray.realpages import extract_golden_real

    t = extract_golden_real("/root/testdata/sf0.001").to_pandas()
    assert len(t) == len(FIXTURES)
    expected = {
        f["name"]: hashlib.md5(f["expected"].encode("utf-8")).hexdigest()
        for f in FIXTURES
    }
    bad = [n for n, h in zip(t["name"], t["text_md5"]) if expected[n] != h]
    assert not bad, bad


def test_suppress_isolated_keeps_max_run():
    # weak isolated run zeroed; run containing the max untouched
    raw = np.array([200.0, 180.0, 0.0, 20.0, 1.0])
    sm = raw.copy()
    out = suppress_isolated(raw, sm)
    assert out[0] == 200.0 and out[1] == 180.0
    assert out[3] == 0.0 and out[4] == 0.0


def test_suppress_isolated_spares_internal_structure():
    # weak blocks contiguous with the strong run survive (table cells)
    raw = np.array([200.0, 10.0, 6.0, 19.0, 180.0])
    out = suppress_isolated(raw, raw.copy())
    assert (out == raw).all()


def test_suppress_isolated_degenerate():
    one = np.array([5.0])
    assert (suppress_isolated(one, one.copy()) == one).all()
    empty = np.zeros(0)
    assert len(suppress_isolated(empty, empty)) == 0


def test_js_skeleton_page_quarantines():
    """A JS-framework skeleton (empty #root + noscript fallback) has
    no extractable main text: noscript is a SKIP tag (its content
    renders only without JS), so the page takes the quarantine path
    with the documented error instead of emitting fallback chrome."""
    from nidaba_ray.stages.extract import extract_row
    from nidaba_ray.stages.merge import vote_row

    html = (
        b'<html><head><script src="/app.js"></script></head><body>'
        b'<div id="root"></div>'
        b"<noscript><p>This application requires JavaScript. Please "
        b"enable it to continue.</p></noscript></body></html>"
    )
    kind, spans, err = extract_row(html)
    assert kind == "html" and err == "html: no text blocks"
    assert spans == []
    final, kept, prov, n_blocks, n_kept = vote_row(spans, None, kind, "en")
    assert final == "" and n_blocks == 0 and n_kept == 0
