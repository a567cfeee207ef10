"""Character n-gram language-model perplexity — the CCNet-style
corpus quality signal (public recipe: Wenzek et al., "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data",
LREC 2020 scores each document with a per-language LM and filters by
perplexity percentile; this module re-expresses the idea as a
from-scratch per-language char-trigram model with Laplace smoothing —
no external model files, no new dependencies).

Scale shape:

* **Training** reads a pushdown-bounded sample (``doc_id <
  SAMPLE_DOCS`` — a parquet row filter, so the training pass touches
  a fixed number of rows no matter the corpus size) and shuffles only
  per-batch pre-counted ``(lang, trigram, n)`` partials through one
  ``groupby.sum`` — the aggregate is vocabulary-sized (langs ×
  observed trigrams of the bounded sample), never corpus-sized. The
  fitted model is memoized per corpus content and broadcast once via
  ``ray.put``.
* **Scoring** is an actor-pool ``map_batches`` stage: codepoints via
  one ``utf-32`` decode per doc, trigram/bigram keys by vectorized
  shifts, ONE ``searchsorted`` per batch over the concatenated keys,
  per-doc log-prob sums via pairwise ``np.sum`` over slices. No
  Python loop over characters anywhere.

Determinism: counts are integers, the probability is a ratio of
integers evaluated identically everywhere, and the reported
perplexity is quantized with ``round_like_sql`` (repo float
invariant). Key packing uses 21 bits per codepoint (max U+10FFFF),
so a trigram fits int64 exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from nidaba_ray.functions.compat import round_like_sql

__all__ = ["train_charlm", "CharLMScorer", "charlm_perplexity",
           "curate_by_perplexity", "perplexity_reference"]

SAMPLE_DOCS = 4096  # training-sample bound (pushdown row filter)
_SHIFT = 21         # bits per codepoint in packed keys


def _pack3(c: np.ndarray) -> np.ndarray:
    """codepoints (uint32) → int64 trigram keys, vectorized."""
    a = c.astype(np.int64)
    return (a[:-2] << (2 * _SHIFT)) | (a[1:-1] << _SHIFT) | a[2:]


def _codes(text: str) -> np.ndarray:
    """Unicode codepoints as uint32 — one C-level decode, no loop."""
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


class _LangModel:
    """Per-language trigram table: sorted key arrays + counts."""

    __slots__ = ("tri_keys", "tri_counts", "bi_keys", "bi_totals", "v")

    def __init__(self, tri_keys: np.ndarray, tri_counts: np.ndarray) -> None:
        order = np.argsort(tri_keys)
        self.tri_keys = tri_keys[order]
        self.tri_counts = tri_counts[order].astype(np.float64)
        bi = self.tri_keys >> _SHIFT
        # trigram keys sorted ⇒ bigram prefixes sorted ⇒ groupwise sums
        starts = np.concatenate(([True], bi[1:] != bi[:-1]))
        self.bi_keys = bi[starts]
        self.bi_totals = np.add.reduceat(
            self.tri_counts, np.nonzero(starts)[0]
        )
        chars = np.unique(np.concatenate([
            self.tri_keys & ((1 << _SHIFT) - 1),
            (self.tri_keys >> _SHIFT) & ((1 << _SHIFT) - 1),
            self.tri_keys >> (2 * _SHIFT),
        ]))
        self.v = max(1, len(chars))

    def _lookup(self, keys: np.ndarray, table: np.ndarray,
                vals: np.ndarray) -> np.ndarray:
        if len(table) == 0:
            return np.zeros(len(keys), dtype=np.float64)
        idx = np.minimum(np.searchsorted(table, keys), len(table) - 1)
        return np.where(table[idx] == keys, vals[idx], 0.0)

    def logprobs(self, tri: np.ndarray) -> np.ndarray:
        """Laplace-smoothed log P(c3 | c1 c2) for packed trigram keys."""
        cnt = self._lookup(tri, self.tri_keys, self.tri_counts)
        tot = self._lookup(tri >> _SHIFT, self.bi_keys, self.bi_totals)
        return np.log(cnt + 1.0) - np.log(tot + self.v)


def _count_partials(batch: pa.Table) -> pa.Table:
    """Per-batch pre-counted (lang, trigram key, n) rows — the
    combiner that keeps the training shuffle vocabulary-sized.
    Per-lang key arrays are concatenated and uniq-counted ONCE per
    batch (no per-trigram Python dict work)."""
    per_lang: dict[str, list[np.ndarray]] = {}
    for lang, text in zip(batch["lang"].to_pylist(),
                          batch["text"].to_pylist()):
        c = _codes(text)
        if len(c) >= 3:
            per_lang.setdefault(lang, []).append(_pack3(c))
    langs_out, tris_out, ns_out = [], [], []
    for lang in sorted(per_lang):
        keys, ns = np.unique(np.concatenate(per_lang[lang]),
                             return_counts=True)
        langs_out.extend([lang] * len(keys))
        tris_out.append(keys)
        ns_out.append(ns)
    return pa.table({
        "lang": pa.array(langs_out, pa.string()),
        "tri": pa.array(np.concatenate(tris_out) if tris_out
                        else np.array([], dtype=np.int64)),
        "n": pa.array(np.concatenate(ns_out).astype(np.int64) if ns_out
                      else np.array([], dtype=np.int64)),
    })


_MODEL_MEMO: dict = {}


def train_charlm(sf_dir: str,
                 sample_docs: int = SAMPLE_DOCS) -> dict[str, _LangModel]:
    """Fit the per-language trigram tables from a bounded sample.

    Memoized per corpus content (same size:mtime fingerprint as the
    dedup memos) so the scoring queries never retrain in-process."""
    from nidaba_ray.functions.dedup import _corpus_fingerprint

    key = (os.path.realpath(sf_dir), _corpus_fingerprint(sf_dir), sample_docs)
    hit = _MODEL_MEMO.get(key)
    if hit is not None:
        return hit
    from ray.data.aggregate import Sum

    import pyarrow.dataset as pads

    counts = (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "text"],
            filter=(pads.field("doc_id") < sample_docs),
        )
        .map_batches(_count_partials, batch_format="pyarrow")
        .groupby(["lang", "tri"]).aggregate(Sum("n", alias_name="n"))
    )
    by_lang: dict[str, list] = {}
    for b in counts.iter_batches(batch_format="pyarrow"):
        for lang, tri, n in zip(b["lang"].to_pylist(), b["tri"].to_pylist(),
                                b["n"].to_pylist()):
            by_lang.setdefault(lang, []).append((tri, n))
    models = {}
    for lang, rows in by_lang.items():
        rows.sort()
        tri = np.array([r[0] for r in rows], dtype=np.int64)
        cnt = np.array([r[1] for r in rows], dtype=np.int64)
        models[lang] = _LangModel(tri, cnt)
    _MODEL_MEMO[key] = models
    return models


class CharLMScorer:
    """Actor-pool stage: model fetched from the broadcast ref once per
    actor; scoring is one searchsorted + reduceat per (batch, lang)."""

    def __init__(self, model_ref) -> None:
        self.models: dict[str, _LangModel] = ray.get(model_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        texts = batch["text"].to_pylist()
        ppl = np.zeros(len(texts), dtype=np.float64)
        by_lang: dict[str, list[int]] = {}
        for i, lang in enumerate(langs):
            by_lang.setdefault(lang, []).append(i)
        for lang, idxs in by_lang.items():
            model = self.models.get(lang)
            keys, offsets, rows = [], [0], []
            for i in idxs:
                c = _codes(texts[i])
                if model is None or len(c) < 3:
                    # <3 chars: uniform bound over the charset. No model
                    # for the language (it never appeared in the bounded
                    # training sample): +inf — quality is un-attestable,
                    # so the percentile gate drops such docs rather than
                    # silently passing them (0.0 would read as 'perfect')
                    ppl[i] = float(model.v) if model is not None else (
                        float("inf"))
                    continue
                keys.append(_pack3(c))
                offsets.append(offsets[-1] + len(keys[-1]))
                rows.append(i)
            if not keys:
                continue
            lp = model.logprobs(np.concatenate(keys))
            # per-doc slice sums via np.sum (pairwise summation), NOT
            # reduceat (sequential): the scalar reference uses np.mean,
            # and the two algorithms differ in the last ulp on ~half of
            # realistic inputs — same-algorithm summation keeps the
            # 4-decimal quantized ppl bit-identical between paths
            for r, a, b in zip(rows, offsets[:-1], offsets[1:]):
                s = lp[a:b]
                ppl[r] = float(np.exp(-(s.sum() / len(s))))
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "ppl": pa.array([round_like_sql(p, 4) for p in ppl],
                            pa.float64()),
        })


def charlm_perplexity(sf_dir: str) -> rd.Dataset:
    """(doc_id, lang, ppl) — per-doc char-trigram perplexity under the
    per-language model fitted on the bounded corpus sample. Low =
    looks like the language; high = noise/boilerplate/wrong-language
    (the CCNet filter signal). Deterministic and layout-invariant
    (pinned in tests/test_charlm.py against a scalar reference)."""
    model_ref = ray.put(train_charlm(sf_dir))
    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).map_batches(
        CharLMScorer, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 8), fn_constructor_kwargs={"model_ref": model_ref},
    )


def perplexity_reference(text: str, model: _LangModel) -> float:
    """Scalar reference for tests: trigram keys built by a per-char
    Python loop (independent of ``_pack3``'s vectorized shifts), then
    the same ``logprobs`` kernel and the same pairwise ``np.sum`` /
    ``np.exp`` as the scorer — per-key lookup and summation algorithm
    must match or the 4-decimal quantized ppl can differ in the last
    ulp (np.log SIMD vs math.log, reduceat vs pairwise)."""
    c = _codes(text)
    if len(c) < 3:
        return float(model.v)
    keys = np.array(
        [(int(c[i]) << (2 * _SHIFT)) | (int(c[i + 1]) << _SHIFT)
         | int(c[i + 2]) for i in range(len(c) - 2)],
        dtype=np.int64,
    )
    lp = model.logprobs(keys)
    return float(np.exp(-(lp.sum() / len(lp))))


PPL_DROP = 0.10  # drop the worst (highest-perplexity) decile per lang


def curate_by_perplexity(sf_dir: str, p: float = PPL_DROP) -> rd.Dataset:
    """The CCNet filter step: keep documents whose perplexity is
    STRICTLY below their language's (1−p) discrete percentile —
    i.e. drop the worst-``p`` tail, with the threshold derived from
    the corpus itself.

    Scale shape mirrors ``curated_by_percentile``: the scored table is
    narrow (doc_id, lang, ppl — ~24 B/row) and materialized once so
    scoring runs a single time; perplexities are quantized to 4
    decimals, so the per-batch (lang, ppl) histogram partials merge to
    a bounded-cardinality aggregate (langs × distinct quantized
    values) and the per-lang threshold falls out of a cumulative sum
    on the driver. Zero sorts; the gate is a second pass over the
    narrow table. Threshold rule = DuckDB ``quantile_disc`` (sorted
    0-indexed position ``ceil(q·n) − 1``), pinned by the DuckDB-gate
    test in tests/test_charlm.py."""
    import math

    from ray.data.aggregate import Sum

    scored = charlm_perplexity(sf_dir).materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        return (batch.select(["lang", "ppl"])
                .group_by(["lang", "ppl"]).aggregate([("ppl", "count")])
                .rename_columns(["lang", "ppl", "n"]))

    hist = (
        scored.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["lang", "ppl"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # (langs × distinct quantized ppl) — bounded
    )
    q = 1.0 - p
    thresholds: dict[str, float] = {}
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("ppl")
        counts = g["n"].to_numpy()
        total = int(counts.sum())
        # quantile_disc rule in IEEE doubles (same deliberate choice,
        # and caveat, as pipelines.curate.curated_by_percentile)
        target = max(0, math.ceil(q * total) - 1)
        cum = counts.cumsum()
        idx = int((cum <= target).sum())
        thresholds[lang] = float(g["ppl"].to_numpy()[idx])

    def gate(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        thr = df["lang"].map(thresholds).astype("float64")
        return pa.Table.from_pandas(
            df[(df["ppl"] < thr).to_numpy()], preserve_index=False
        )

    return scored.map_batches(gate, batch_format="pyarrow")
