"""Block-level quality classifier — the model-serving shape on Ray
Data (docs/NEXT.md item 5): a tiny logistic scorer over the span's
structural features, trained on the synthetic ground truth, served as
an actor-pool ``map_batches`` stage (weights loaded once per actor in
``__init__`` — the model-load analog of the heavy OCR recognizers).

Training is deterministic (full-batch gradient descent, fixed epochs,
zero init) and cheap enough to run at query time, so there are no
frozen weights to drift when the synthetic generator changes: the
train→broadcast→serve loop is the demonstrated pattern. A real
deployment would load real weights from a checkpoint path instead —
the ``QualityScorer`` signature already takes them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "span_features",
    "train_logistic",
    "training_blocks",
    "training_blocks_real",
    "default_weights",
    "real_weights",
    "QualityScorer",
    "RealQualityScorer",
    "block_quality_scores",
    "block_quality_sql",
]

def _weights_fingerprint() -> str:
    """Content fingerprint for the weight cache key: md5 of the source
    bytes of EVERY module the training labels depend on — this module,
    the synth generator, and the extraction chain that
    ``training_blocks`` drives (extract → segment/fastsegment →
    score). A segmenter or scorer change alters the training matrix,
    so it must invalidate cached weights too, or a machine holding a
    cache from an older checkout would serve stale weights and break
    byte-identity across machines (round-2 ADVICE item 1)."""
    import hashlib

    from nidaba_ray import synth as _synth
    from nidaba_ray.stages import extract as _extract
    from nidaba_ray.stages import fastsegment as _fastsegment
    from nidaba_ray.stages import score as _score
    from nidaba_ray.stages import segment as _segment

    h = hashlib.md5()
    for mod in (None, _synth, _extract, _segment, _fastsegment, _score):
        mod_file = __file__ if mod is None else mod.__file__
        with open(mod_file, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:12]


def default_weights(train_pages: int = 200) -> np.ndarray:
    """Deterministic trained weights with a per-user tmpdir cache:
    training is deterministic, so at most one actor/process per
    machine pays the 200-page training; everyone else loads the
    atomically-written cache file. This keeps registry-spawned
    QualityScorer actors (which get no explicit weights) from each
    redoing the identical training in ``__init__``."""
    import os
    import tempfile

    cache_dir = os.path.join(tempfile.gettempdir(),
                             f"nidaba_ray_quality_{os.getuid()}")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(
        cache_dir, f"logistic_{_weights_fingerprint()}_p{train_pages}.npy"
    )
    if os.path.isfile(path):
        try:
            return np.load(path)
        except (OSError, ValueError):
            pass  # torn write from a crashed process — retrain
    w = train_logistic(*training_blocks(train_pages))
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        np.save(f, w)
    os.replace(tmp, path)
    return w

_KINDS = ("p", "li", "td", "pre", "div")


def span_features(span: dict) -> np.ndarray:
    """Structural features only — deliberately excludes the heuristic
    ``score`` (the classifier must be an independent signal, not a
    rescaling of the ensemble it might vote against)."""
    kind = span["kind"]
    is_heading = kind in ("h1", "h2", "h3", "h4", "h5", "h6")
    return np.array(
        [
            np.log1p(len(span["text"])),
            span["link_density"],
            np.log1p(max(span["text_density"], 0.0)),
            float(span["depth"]),
            *[1.0 if kind == k else 0.0 for k in _KINDS],
            1.0 if is_heading else 0.0,
        ],
        dtype=np.float64,
    )


def train_logistic(
    x: np.ndarray, y: np.ndarray, lr: float = 0.5, epochs: int = 300,
    l2: float = 1e-3,
) -> np.ndarray:
    """Full-batch gradient descent, zero init — deterministic for a
    given (x, y). Returns weights incl. bias (append 1s column)."""
    xb = np.concatenate([x, np.ones((len(x), 1))], axis=1)
    # standardize non-flag columns for conditioning (affine fold-back)
    mu = xb.mean(axis=0)
    sd = np.where(xb.std(axis=0) > 0, xb.std(axis=0), 1.0)
    mu[-1], sd[-1] = 0.0, 1.0  # leave the bias column alone
    xs = (xb - mu) / sd
    w = np.zeros(xs.shape[1])
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-(xs @ w)))
        grad = xs.T @ (p - y) / len(y) + l2 * w
        w -= lr * grad
    # fold standardization back into raw-space weights
    raw = w / sd
    raw[-1] = w[-1] - float((w[:-1] * mu[:-1] / sd[:-1]).sum())
    return raw


def training_blocks(n_pages: int = 300) -> tuple[np.ndarray, np.ndarray]:
    """Labeled block set from the synthetic corpus: a block is content
    iff its text occurs in the page's golden main text (true by
    construction for paragraph blocks; chrome strings never collide
    with the word-soup goldens)."""
    from nidaba_ray import synth
    from nidaba_ray.stages.extract import extract_row

    t = synth.pages_table(n=n_pages)
    xs, ys = [], []
    for html, golden in zip(t["html"].to_pylist(), t["golden"].to_pylist()):
        kind, spans, err = extract_row(html or b"")
        if err or kind != "html":
            continue
        for s in spans:
            xs.append(span_features(s))
            ys.append(1.0 if s["text"] and s["text"] in golden else 0.0)
    return np.stack(xs), np.array(ys)


def training_blocks_real() -> tuple[np.ndarray, np.ndarray]:
    """Labeled block set from the HAND-LABELLED fixture corpus
    (``nidaba_ray/realpages.py``): a block is content iff the pinned
    per-row extraction chain keeps it. The chain's output is frozen
    byte-exact to the hand labels (tests/test_realpages.py), so the
    kept-span set IS the hand-labelled content set — exact span-level
    labels over realistic markup, where the synthetic labels only
    cover templated shapes. Measured: weights trained here score
    ~0.96 on held-out fixture pages where the synth-trained weights
    score ~0.85 (tests/test_quality_model.py pins the gap)."""
    from nidaba_ray.realpages import FIXTURES
    from nidaba_ray.stages.extract import extract_row
    from nidaba_ray.stages.merge import vote_row

    xs, ys = [], []
    for fx in FIXTURES:
        kind, spans, err = extract_row(fx["html"].encode("utf-8"))
        if err or kind != "html":
            continue
        _final, kept, _prov, _nb, _nk = vote_row(
            spans, None, kind, fx.get("lang", "en")
        )
        kept_ids = {s["block_id"] for s in kept}
        for s in spans:
            xs.append(span_features(s))
            ys.append(1.0 if s["block_id"] in kept_ids else 0.0)
    return np.stack(xs), np.array(ys)


def _real_weights_fingerprint() -> str:
    """Cache key for the fixture-trained weights: the fixture corpus
    and every module in the labelling chain (extract → segment →
    score → merge). Growing the fixture corpus or changing the
    extractor retrains automatically."""
    import hashlib

    from nidaba_ray import realpages as _realpages
    from nidaba_ray.stages import extract as _extract
    from nidaba_ray.stages import fastsegment as _fastsegment
    from nidaba_ray.stages import merge as _merge
    from nidaba_ray.stages import score as _score
    from nidaba_ray.stages import segment as _segment

    h = hashlib.md5()
    for mod in (None, _realpages, _extract, _segment, _fastsegment,
                _score, _merge):
        mod_file = __file__ if mod is None else mod.__file__
        with open(mod_file, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:12]


def real_weights() -> np.ndarray:
    """Deterministic weights trained on the fixture-corpus labels,
    with the same atomic tmpdir cache as :func:`default_weights`."""
    import os
    import tempfile

    cache_dir = os.path.join(tempfile.gettempdir(),
                             f"nidaba_ray_quality_{os.getuid()}")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(
        cache_dir, f"logistic_real_{_real_weights_fingerprint()}.npy"
    )
    if os.path.isfile(path):
        try:
            return np.load(path)
        except (OSError, ValueError):
            pass  # torn write from a crashed process — retrain
    w = train_logistic(*training_blocks_real())
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        np.save(f, w)
    os.replace(tmp, path)
    return w


class QualityScorer:
    """Actor-pool stage: per-span content probability (quantized to 6
    decimals so downstream sums are exact in micro-units), plus the
    per-row content-block count under a 0.5 decision threshold.

    Weights are built once per actor in ``__init__`` (trained on the
    synthetic ground truth when none are passed — a real deployment
    passes checkpoint weights)."""

    def __init__(self, weights: np.ndarray | None = None,
                 train_pages: int = 200) -> None:
        self.w = (np.asarray(weights, dtype=np.float64) if weights is not None
                  else default_weights(train_pages))

    def _prob(self, span: dict) -> float:
        from nidaba_ray.functions.compat import round_like_sql

        f = np.append(span_features(span), 1.0)
        return round_like_sql(float(1.0 / (1.0 + np.exp(-(f @ self.w)))), 6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col = batch["spans"].to_pylist()
        probs, n_content = [], []
        for spans in spans_col:
            p = [self._prob(s) for s in (spans or [])]
            probs.append(p)
            n_content.append(sum(1 for x in p if x >= 0.5))
        return batch.append_column(
            "block_quality", pa.array(probs, pa.list_(pa.float64()))
        ).append_column("n_content_blocks", pa.array(n_content, pa.int32()))


class RealQualityScorer(QualityScorer):
    """Registry-served variant (``postprocess.quality_real``): the
    same serving stage loading the fixture-trained weights — the
    production choice for realistic markup (the synth-trained weights
    underfit real page shapes by ~10 accuracy points)."""

    def __init__(self) -> None:
        super().__init__(weights=real_weights())


def block_quality_scores(sf_dir: str) -> pa.Table:
    """queries() entry (rows check): extraction → QualityScorer over
    the synthetic pages, rolled up per lang — an independent AUDIT of
    the kept spans (the pipeline output carries post-threshold blocks,
    so a healthy corpus scores a high-but-not-perfect content
    fraction; the flagged remainder is the review queue). Sums run in
    integer micro-units (order-independent, deterministic across
    parallelism). Classifier accuracy vs ground truth is pinned in
    tests/test_quality_model.py."""
    import ray.data as rd

    from ray.data.aggregate import Sum

    from nidaba_ray.pipelines.extract import extract_pipeline
    from nidaba_ray.synth import pages_dataset_from_documents

    pages = pages_dataset_from_documents(sf_dir)
    extracted = extract_pipeline(pages, spell=False)
    # train ONCE on the driver (tmpdir-cached across invocations);
    # every actor receives the ready weights
    weights = default_weights(200)
    scored = extracted.map_batches(
        QualityScorer, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4), num_cpus=1,
        fn_constructor_kwargs={"weights": weights},
    )

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        quals = batch["block_quality"].to_pylist()
        ncs = batch["n_content_blocks"].to_pylist()
        errs = batch["error"].to_pylist()
        out: dict[str, list] = {"lang": [], "n_docs": [], "n_blocks": [],
                                "n_content": [], "prob_micro": []}
        agg: dict[str, list] = {}
        for l, q, nc, e in zip(langs, quals, ncs, errs):
            if e:
                continue
            row = agg.setdefault(l, [0, 0, 0, 0])
            row[0] += 1
            row[1] += len(q or [])
            row[2] += int(nc)
            row[3] += sum(int(round(x * 1_000_000)) for x in (q or []))
        for l in sorted(agg):
            out["lang"].append(l)
            out["n_docs"].append(agg[l][0])
            out["n_blocks"].append(agg[l][1])
            out["n_content"].append(agg[l][2])
            out["prob_micro"].append(agg[l][3])
        return pa.table(
            {
                "lang": pa.array(out["lang"], pa.string()),
                "n_docs": pa.array(out["n_docs"], pa.int64()),
                "n_blocks": pa.array(out["n_blocks"], pa.int64()),
                "n_content": pa.array(out["n_content"], pa.int64()),
                "prob_micro": pa.array(out["prob_micro"], pa.int64()),
            }
        )

    g = (
        scored.map_batches(partial, batch_format="pyarrow")
        # partials are ≤ n_langs rows per batch — coalesce them to ONE
        # block before the final rollup so the grouped aggregate has no
        # empty reduce partitions (which emit schema-less RefBundles,
        # the round-2 bench-tail warning). The tree reduce is still
        # 2-level: batch-local combine above, one small merge task here.
        .repartition(1)
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_blocks", alias_name="n_blocks"),
                   Sum("n_content", alias_name="n_content"),
                   Sum("prob_micro", alias_name="prob_micro"))
        .to_pandas()  # ≤ n_langs rows
        .sort_values("lang")
        .reset_index(drop=True)
    )
    from nidaba_ray.functions.compat import round_like_sql

    g["mean_prob"] = round_like_sql(g["prob_micro"] / g["n_blocks"] / 1_000_000, 4)
    g = g.drop(columns=["prob_micro"]).astype(
        {"lang": "string", "n_docs": "int64", "n_blocks": "int64",
         "n_content": "int64"}
    )
    return pa.Table.from_pandas(g, preserve_index=False)


def block_quality_sql() -> str:
    """Driver oracle for :func:`block_quality_scores` (promoted round
    5): the logistic is REPLAYED in SQL over the synthetic corpus's
    known span geometry. The generator's page layout is fixed
    (synth.make_html: every kept content span is a ``<p>`` at depth 4
    with link_density 0 and text_density == len; synth.make_pdf: kind
    ``pdf`` at depth 0), so each span's feature vector — and therefore
    its sigmoid score — is a pure function of its paragraph's char
    length, which SQL reconstructs from ``documents.text`` with the
    ``paragraphs_for`` word-chunk arithmetic (chunk = 20 + doc_id%5 *
    10). Weights come from the SAME deterministic ``default_weights``
    training the Ray side uses, inlined as round-trip float literals —
    the two sides cannot drift. Per-span probs are quantized to 6
    decimals on both sides before the integer micro-unit sums, so the
    rollup is ulp-robust (the quantized-cosine precedent,
    ann.embedding_near_dup_sql)."""
    w = default_weights(200)
    W = {k: repr(float(v)) for k, v in zip(
        ["len", "ld", "td", "depth", "p", "li", "tdk", "pre", "div",
         "head", "bias"], w)}
    return f"""
WITH d AS (
  SELECT doc_id, lang, string_split(text, ' ') AS w,
         20 + (doc_id % 5) * 10 AS chunk,
         (doc_id % 29 = 7) AS is_pdf
  FROM documents WHERE doc_id % 97 <> 13
),
plen AS (
  SELECT doc_id, lang, is_pdf,
         unnest(list_transform(range(0, len(w), chunk),
            i -> len(array_to_string(list_slice(w, i+1, i+chunk), ' ')))) AS L
  FROM d
),
probs AS (
  SELECT doc_id, lang,
         ROUND(1.0 / (1.0 + EXP(-(
           CASE WHEN is_pdf
             THEN {W['len']}*LN(1.0+L) + {W['td']}*LN(1.0+L) + {W['bias']}
             ELSE {W['len']}*LN(1.0+L) + {W['td']}*LN(1.0+L)
                  + {W['depth']}*4.0 + {W['p']} + {W['bias']}
           END))), 6) AS p
  FROM plen
)
SELECT lang,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(COUNT(*) FILTER (WHERE p >= 0.5) AS BIGINT) AS n_content,
       ROUND(CAST(SUM(CAST(ROUND(p*1000000.0, 0) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 1000000.0, 4) AS mean_prob
FROM probs GROUP BY lang ORDER BY lang
"""
