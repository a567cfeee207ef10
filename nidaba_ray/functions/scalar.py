"""Scalar column functions — SURVEY.md §2.8 (url/date/JSON helpers
the reference lacks but a web corpus needs). All operate on whole
Arrow arrays inside ``map_batches``; the pure-python kernels exist for
tests and per-row callers."""

from __future__ import annotations

import json
import re

import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "url_host", "url_path", "registrable_domain",
    "url_host_column", "json_field_column", "ts_bucket_column",
]

_URL = re.compile(r"^[a-z][a-z0-9+.-]*://(?:[^@/]*@)?([^/:?#]+)")
# multi-label public suffixes we special-case without a suffix list
_TWO_LABEL_TLDS = {"co.uk", "com.au", "co.jp", "com.br", "co.in", "org.uk"}


def url_host(url: str) -> str:
    m = _URL.match(url or "")
    return m.group(1).lower() if m else ""


def url_path(url: str) -> str:
    m = _URL.match(url or "")
    if not m:
        return ""
    rest = url[m.end() :]
    return rest.split("?", 1)[0].split("#", 1)[0] or "/"


def registrable_domain(url: str) -> str:
    """eTLD+1 approximation (a real deployment ships the public
    suffix list as broadcast state)."""
    host = url_host(url)
    parts = host.split(".")
    if len(parts) <= 2:
        return host
    if ".".join(parts[-2:]) in _TWO_LABEL_TLDS or (
        len(parts) >= 3 and ".".join(parts[-2:]) in _TWO_LABEL_TLDS
    ):
        return ".".join(parts[-3:])
    return ".".join(parts[-2:])


def url_host_column(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized host extraction (pyarrow regex kernel)."""
    ex = pc.extract_regex(urls, pattern=r"^[a-z][a-z0-9+.-]*://(?:[^@/]*@)?(?P<host>[^/:?#]+)")
    host = pc.struct_field(ex, "host")
    return pc.utf8_lower(pc.fill_null(host, ""))


def json_field_column(col: pa.ChunkedArray | pa.Array, field: str) -> pa.Array:
    """Per-batch JSON field extraction (events.props-style columns)."""
    vals = [
        (json.loads(v).get(field) if v else None) for v in col.to_pylist()
    ]
    return pa.array(vals)


def ts_bucket_column(ts: pa.ChunkedArray | pa.Array, unit: str = "hour") -> pa.Array:
    """Truncate timestamps (tumbling-window key)."""
    out = pc.floor_temporal(ts, unit=unit)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
