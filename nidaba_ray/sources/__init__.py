"""Source readers (SURVEY.md §2.1).

The engine's canonical source is the Common-Crawl-style pages parquet
(BASELINE.json:input_hint); `read_pages` prunes to the pipeline's
columns at the read. `read_quarantine` / `read_extracted` are views
over a runner job's bucketed output (the quarantine view is a filter
over the written parquet, not a second pipeline branch — see
pipelines/extract.py module docstring for why)."""

from __future__ import annotations

import os

import pyarrow.compute as pc
import ray.data as rd

from nidaba_ray.pipelines.extract import PAGES_COLUMNS, read_pages  # noqa: F401

__all__ = ["read_pages", "read_extracted", "read_quarantine", "PAGES_COLUMNS"]


def _filtered(out_dir: str, columns: list[str] | None, keep_ok: bool) -> rd.Dataset:
    cols = columns
    drop_error = False
    if cols is not None and "error" not in cols:
        cols = list(cols) + ["error"]  # the filter needs it
        drop_error = True

    def fn(t):
        mask = pc.equal(t["error"], "")
        if not keep_ok:
            mask = pc.invert(mask)
        t = t.filter(mask)
        return t.drop_columns(["error"]) if drop_error else t

    ds = rd.read_parquet(os.path.join(out_dir, "data"), columns=cols)
    return ds.map_batches(fn, batch_format="pyarrow")


def read_extracted(out_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    """Successfully extracted rows of a runner job's output."""
    return _filtered(out_dir, columns, keep_ok=True)


def read_quarantine(out_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    """Quarantined rows (undecodable payloads) with their error strings."""
    return _filtered(out_dir, columns, keep_ok=False)
