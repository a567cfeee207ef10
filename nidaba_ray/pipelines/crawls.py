"""Multi-crawl merge — the only url-keyed shuffle in the engine
(SURVEY.md §2.5/§4.2): when the same url appears in several crawl
snapshots, collapse to one canonical row per url.

Skew handling (north_rule: "salted keys to defuse host-level skew"):
a hot url (or a hot host's many re-crawls landing in one reducer) is
defused by a two-phase reduce — phase 1 groups by (url, salt) where
``salt = md5(url ‖ warc_ts) % S`` splits one key's rows across S
reducers and keeps at most one row per (url, salt); phase 2 groups the
≤S survivors per url. No reducer ever sees more than ~|rows|/S of a
hot key. For vote mode the per-batch combiner also pre-collapses
duplicates before any shuffle.

Modes:
    latest  keep the row with max (warc_ts) — re-crawl dedup (§2.7)
    vote    align/vote the K crawl texts (recency-prioritized) —
            the cross-crawl blend_hocr analog
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import ray.data as rd

from nidaba_ray.algorithms.strings import align_vote
from nidaba_ray.record import SPAN_SEP

__all__ = ["merge_crawls"]

DEFAULT_SALT = 8


def _add_salt(batch: pa.Table, n_salt: int) -> pa.Table:
    salts = [
        int.from_bytes(
            hashlib.md5(f"{u}\x00{t}".encode()).digest()[:4], "big"
        ) % n_salt
        for u, t in zip(batch["url"].to_pylist(), batch["warc_ts"].to_pylist())
    ]
    return batch.append_column("salt", pa.array(salts, pa.int32()))


def _keep_latest(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["warc_ts", "url"], ascending=[False, True])
    return g.head(1)


def _prereduce_latest(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: collapse duplicate urls inside the batch
    before the shuffle (bounds hot-key fan-in)."""
    df = batch.to_pandas()
    df = df.sort_values(["url", "warc_ts"], ascending=[True, False])
    return pa.Table.from_pandas(
        df.drop_duplicates("url", keep="first"), preserve_index=False
    )


def merge_crawls(
    extracted: rd.Dataset,
    mode: str = "latest",
    n_salt: int = DEFAULT_SALT,
) -> rd.Dataset:
    """extracted (≥1 row per url) → exactly one row per url."""
    if mode == "latest":
        pre = extracted.map_batches(_prereduce_latest, batch_format="pyarrow")
        salted = pre.map_batches(
            lambda b: _add_salt(b, n_salt), batch_format="pyarrow"
        )
        phase1 = salted.groupby(["url", "salt"]).map_groups(
            _keep_latest, batch_format="pandas"
        )
        phase2 = phase1.groupby("url").map_groups(
            _keep_latest, batch_format="pandas"
        )
        return phase2.drop_columns(["salt"])

    if mode == "vote":

        def vote_group(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["warc_ts", "url"], ascending=[False, True])
            texts = [t for t in g["text"] if t]
            out = g.head(1).copy()
            if len(texts) > 1:
                toks = [t.split(SPAN_SEP) for t in texts]
                # recency priority: newest crawl is the backbone
                voted = align_vote(
                    toks, scores=[float(len(toks) - i) for i in range(len(toks))]
                )
                out["text"] = SPAN_SEP.join(voted)
            return out

        return extracted.groupby("url").map_groups(
            vote_group, batch_format="pandas"
        )

    raise ValueError(f"unknown merge_crawls mode {mode!r}")
