"""Accuracy / diff metrics — the nidaba stats task analog
(stats.text_diff_ratio pairs a page with its ground-truth file and
records an edit-distance ratio; nidaba/tasks/stats.py, UNVERIFIED per
SURVEY.md §0).

Ours: a per-url conformance join of pipeline output against a golden
table, then a vectorized ratio — the join is Ray Data's hash join
(both sides large) or a broadcast lookup (golden small)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from nidaba_ray.algorithms.strings import edit_distance
from nidaba_ray.functions.compat import round_like_sql

__all__ = ["text_diff_ratio", "accuracy_vs_golden"]


def text_diff_ratio(a: str, b: str) -> float:
    """Similarity ratio in [0,1] on token sequences:
    1 − dist/max(len) (1.0 = identical) — the difflib-ratio analog
    with edit-distance semantics."""
    ta, tb = a.split(" ") if a else [], b.split(" ") if b else []
    if not ta and not tb:
        return 1.0
    d = edit_distance(ta, tb)
    return round_like_sql(1.0 - d / max(len(ta), len(tb)), 6)


def accuracy_vs_golden(extracted: rd.Dataset, golden_path: str) -> pa.Table:
    """Per-url diff ratio + corpus rollup vs a golden(url, golden)
    parquet. The golden map ships once via ray.put (golden ≪ corpus);
    if the golden side ever rivals the corpus, switch to a
    ``Dataset.join`` on url (same shape as relational/queries
    join_lineitem_orders)."""
    g = pd.read_parquet(golden_path, columns=["url", "golden"])
    ref = ray.put(dict(zip(g["url"], g["golden"])))

    def fn(batch: pa.Table) -> pa.Table:
        gold = ray.get(ref)
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        ratios, exact = [], []
        for u, t in zip(urls, texts):
            gt = gold.get(u)
            if gt is None:
                ratios.append(None)
                exact.append(None)
            else:
                ratios.append(text_diff_ratio(t or "", gt))
                exact.append((t or "") == gt)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "ratio": pa.array(ratios, pa.float64()),
                "exact": pa.array(exact, pa.bool_()),
            }
        )

    per_url = extracted.map_batches(fn, batch_format="pyarrow").to_pandas()
    matched = per_url.dropna(subset=["ratio"])
    rollup = pa.table(
        {
            "n_urls": pa.array([len(per_url)], pa.int64()),
            "n_matched": pa.array([len(matched)], pa.int64()),
            "n_exact": pa.array([int(matched["exact"].sum())], pa.int64()),
            "mean_ratio": pa.array(
                [round_like_sql(float(matched["ratio"].mean()), 6)], pa.float64()
            ),
        }
    )
    return rollup
