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


def _latest_per_url(batch: pa.Table) -> pa.Table:
    """Keep the max-warc_ts row per url — pure Arrow/numpy (the
    extracted schema carries nested list<struct> columns that do NOT
    survive a pandas round-trip; ray_guide pitfall)."""
    import numpy as np

    urls = np.asarray(batch["url"].to_pylist(), dtype=object)
    ts = batch["warc_ts"].to_numpy(zero_copy_only=False)
    # stable sort: url asc, ts desc → first row of each url run wins
    order = np.lexsort((-ts.astype("datetime64[us]").astype(np.int64), urls))
    sorted_urls = urls[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = sorted_urls[1:] != sorted_urls[:-1]
    return batch.take(pa.array(order[first]))


def _keep_latest(g: pa.Table) -> pa.Table:
    return _latest_per_url(g)


def _prereduce_latest(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: collapse duplicate urls inside the batch
    before the shuffle (bounds hot-key fan-in)."""
    return _latest_per_url(batch)


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
            _keep_latest, batch_format="pyarrow"
        )
        phase2 = phase1.groupby("url").map_groups(
            _keep_latest, batch_format="pyarrow"
        )
        return phase2.drop_columns(["salt"])

    if mode == "vote":

        def vote_group(g: pa.Table) -> pa.Table:
            import numpy as np

            ts = g["warc_ts"].to_numpy(zero_copy_only=False)
            order = np.argsort(-ts.astype("datetime64[us]").astype(np.int64),
                               kind="stable")
            g = g.take(pa.array(order))
            texts = [t for t in g["text"].to_pylist() if t]
            out = g.slice(0, 1)
            if len(texts) > 1:
                toks = [t.split(SPAN_SEP) for t in texts]
                # recency priority: newest crawl is the backbone
                voted = align_vote(
                    toks, scores=[float(len(toks) - i) for i in range(len(toks))]
                )
                out = out.set_column(
                    out.schema.get_field_index("text"),
                    "text",
                    pa.array([SPAN_SEP.join(voted)], pa.string()),
                )
            return out

        return extracted.groupby("url").map_groups(
            vote_group, batch_format="pyarrow"
        )

    raise ValueError(f"unknown merge_crawls mode {mode!r}")


def host_stats(extracted: rd.Dataset, n_salt: int = DEFAULT_SALT) -> rd.Dataset:
    """Per-host rollup (pages, tokens, quarantine) with salted two-phase
    aggregation — the north_rule's host-skew case: hosts are zipfian
    (a few hosts own most urls), so a single groupby('host') sends a
    hot host's every row to one reducer. Phase 1 aggregates per
    (host, salt) — at most 1/S of a hot host's rows per reducer —
    phase 2 merges the ≤S partials per host. Both phases move partial
    sums, not rows (per-batch combiner first, as always)."""
    import numpy as np

    from nidaba_ray.functions.scalar import url_host_column

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        host = url_host_column(batch["url"])
        df = pd.DataFrame(
            {
                "host": host.to_pandas(),
                "n_tokens": (
                    batch["n_tokens"].to_pandas()
                    if "n_tokens" in batch.column_names
                    else pd.Series([t.count(" ") + 1 if t else 0
                                    for t in batch["text"].to_pylist()])
                ),
                "quarantined": [e != "" for e in batch["error"].to_pylist()],
            }
        )
        g = df.groupby("host", as_index=False).agg(
            n_pages=("n_tokens", "size"),
            total_tokens=("n_tokens", "sum"),
            n_quarantined=("quarantined", "sum"),
        )
        # salt assigned AFTER the combiner: deterministic spread of each
        # host's partials over reducers
        g["salt"] = np.fromiter(
            (
                int.from_bytes(hashlib.md5(f"{h}\x01{i}".encode()).digest()[:4], "big")
                % n_salt
                for i, h in enumerate(g["host"])
            ),
            dtype=np.int64,
            count=len(g),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    phase1 = (
        extracted.map_batches(partial, batch_format="pyarrow")
        .groupby(["host", "salt"])
        .aggregate(Sum("n_pages", alias_name="n_pages"),
                   Sum("total_tokens", alias_name="total_tokens"),
                   Sum("n_quarantined", alias_name="n_quarantined"))
    )
    return (
        phase1.groupby("host")
        .aggregate(Sum("n_pages", alias_name="n_pages"),
                   Sum("total_tokens", alias_name="total_tokens"),
                   Sum("n_quarantined", alias_name="n_quarantined"))
    )
