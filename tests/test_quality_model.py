"""Block-quality classifier: training determinism, held-out accuracy,
and the Ray-served rollup."""

import numpy as np

from nidaba_ray.stages.quality import (
    QualityScorer,
    block_quality_scores,
    span_features,
    train_logistic,
    training_blocks,
)


def test_training_deterministic_and_accurate():
    x, y = training_blocks(n_pages=250)
    assert len(x) == len(y) and y.sum() > 50 and (1 - y).sum() > 50
    w1 = train_logistic(x, y)
    w2 = train_logistic(x, y)
    assert np.array_equal(w1, w2)
    # held-out pages (disjoint shapes come from different doc_ids)
    from nidaba_ray import synth
    from nidaba_ray.stages.extract import extract_row

    t = synth.pages_table(n=400)
    xs, ys = [], []
    for doc_id, html, golden in zip(
        t["doc_id"].to_pylist(), t["html"].to_pylist(), t["golden"].to_pylist()
    ):
        if doc_id < 250:  # training ids
            continue
        kind, spans, err = extract_row(html or b"")
        if err or kind != "html":
            continue
        for s in spans:
            xs.append(span_features(s))
            ys.append(1.0 if s["text"] and s["text"] in golden else 0.0)
    xb = np.concatenate([np.stack(xs), np.ones((len(xs), 1))], axis=1)
    pred = (1.0 / (1.0 + np.exp(-(xb @ w1)))) >= 0.5
    acc = float((pred == (np.array(ys) > 0.5)).mean())
    assert acc >= 0.95, acc


def test_scorer_stage_shape():
    import pyarrow as pa

    from nidaba_ray.record import SPAN_TYPE

    spans = [
        {"block_id": 0, "kind": "p", "depth": 3, "text_density": 80.0,
         "link_density": 0.0, "score": 80.0,
         "text": "a long content paragraph " * 4, "start": 0, "end": 10},
        {"block_id": 1, "kind": "li", "depth": 4, "text_density": 4.0,
         "link_density": 1.0, "score": 0.0, "text": "Home", "start": -1,
         "end": -1},
    ]
    batch = pa.table({
        "url": pa.array(["u"], pa.string()),
        "spans": pa.array([spans], SPAN_TYPE),
    })
    out = QualityScorer(train_pages=120)(batch)
    q = out["block_quality"].to_pylist()[0]
    assert len(q) == 2 and q[0] > 0.5 > q[1]
    assert out["n_content_blocks"].to_pylist() == [1]


def test_block_quality_rollup_through_ray(ray_session):
    t = block_quality_scores("/root/testdata/sf0.001").to_pandas()
    assert t["n_docs"].sum() == 494  # quarantined rows excluded
    assert (t["n_content"] <= t["n_blocks"]).all()
    # the scorer audits the KEPT spans (post-threshold), so the
    # classifier should endorse most of them — but not all (the blocks
    # it flags are the audit signal)
    frac = t["n_content"] / t["n_blocks"]
    assert (frac > 0.8).all() and (frac < 1.0).all()
    again = block_quality_scores("/root/testdata/sf0.001").to_pandas()
    assert t.equals(again)
