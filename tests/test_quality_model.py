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


def test_real_training_deterministic_and_accurate():
    """Fixture-label training (round-5): exact span labels come from
    the kept-set of the byte-pinned extraction chain; held-out split
    by fixture name (even/odd over the sorted list)."""
    import numpy as np

    from nidaba_ray.realpages import FIXTURES
    from nidaba_ray.stages.extract import extract_row
    from nidaba_ray.stages.merge import vote_row
    from nidaba_ray.stages.quality import (
        span_features,
        train_logistic,
        training_blocks_real,
    )

    x, y = training_blocks_real()
    assert len(x) == len(y) and y.sum() > 300 and (1 - y).sum() > 300
    w1 = train_logistic(x, y)
    w2 = train_logistic(x, y)
    assert np.array_equal(w1, w2)

    # leave-half-out by fixture name: train on even-indexed names,
    # score on odd-indexed names
    xs, ys, page = [], [], []
    for fx in FIXTURES:
        kind, spans, err = extract_row(fx["html"].encode("utf-8"))
        if err or kind != "html":
            continue
        _f, kept, _p, _nb, _nk = vote_row(
            spans, None, kind, fx.get("lang", "en")
        )
        kept_ids = {s["block_id"] for s in kept}
        for s in spans:
            xs.append(span_features(s))
            ys.append(1.0 if s["block_id"] in kept_ids else 0.0)
            page.append(fx["name"])
    X, Y, P = np.stack(xs), np.array(ys), np.array(page)
    names = sorted(set(P))
    test = ~np.isin(P, names[::2])
    w = train_logistic(X[~test], Y[~test])
    xb = np.concatenate([X, np.ones((len(X), 1))], axis=1)
    pred = (1.0 / (1.0 + np.exp(-(xb @ w)))) >= 0.5
    holdout = float((pred[test] == (Y[test] > 0.5)).mean())
    assert holdout >= 0.93, holdout


def test_real_weights_beat_synth_on_real_pages():
    """The point of the fixture training: on realistic markup the
    fixture-trained weights must clearly outscore the synth-trained
    ones (measured gap ~0.96 vs ~0.85 at authoring time)."""
    import numpy as np

    from nidaba_ray.stages.quality import (
        default_weights,
        real_weights,
        training_blocks_real,
    )

    x, y = training_blocks_real()
    xb = np.concatenate([x, np.ones((len(x), 1))], axis=1)

    def acc(w):
        pred = (1.0 / (1.0 + np.exp(-(xb @ w)))) >= 0.5
        return float((pred == (y > 0.5)).mean())

    a_real, a_synth = acc(real_weights()), acc(default_weights(200))
    assert a_real >= a_synth + 0.05, (a_real, a_synth)
    assert a_real >= 0.93, a_real


def test_real_scorer_stage_registered():
    from nidaba_ray.stages.quality import RealQualityScorer
    from nidaba_ray.stages.registry import get_stage

    spec = get_stage("postprocess.quality_real")
    assert spec is not None and spec.fn is RealQualityScorer
