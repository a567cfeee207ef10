"""Resumable bucketed output + per-partition manifests.

Layout (the storage.py analog — path-safe, atomic, resumable):

    <out_dir>/
      data/bucket=<b>/*.parquet      one directory per url-hash bucket
      manifest/part-<b>.json         written atomically AFTER the
                                     bucket's data is durable

Manifest record: bucket id, row count, per-bucket counters (quarantine
count, token totals), input fingerprint, config hash, engine version.
Resume = read the manifest dir, prune finished buckets from the input
at the READ (a cheap vectorized filter — no shuffle), process the
rest, append new manifests. A crashed run leaves at most torn *data*
files in unfinished buckets, which are overwritten on retry; manifests
are written via tmp-file + rename (atomic on POSIX).

Path safety (nidaba tests/test_storage.py analog): bucket ids are
validated against [0, n_buckets); manifest names are derived, never
taken from data.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "ManifestError",
    "BucketManifest",
    "bucket_of",
    "add_bucket_column",
    "done_buckets",
    "write_manifest",
    "read_manifest",
    "prune_done",
]

ENGINE_VERSION = "nidaba_ray-0.1"


class ManifestError(ValueError):
    """Corrupt, path-violating or out-of-range manifest access — the
    NidabaStorageViolationException analog."""


@dataclass
class BucketManifest:
    bucket: int
    n_rows: int
    n_quarantined: int
    counters: dict
    input_fingerprint: str
    config_hash: str
    engine_version: str = ENGINE_VERSION


def bucket_of(urls, n_buckets: int) -> np.ndarray:
    """Deterministic url-hash bucket (md5, not builtin hash — stable
    across processes). Vectorized enough for the hot path: one md5 per
    row over short strings."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(u.encode("utf-8")).digest()[:8], "big")
            % n_buckets
            for u in urls
        ),
        dtype=np.int64,
        count=len(urls),
    )


def add_bucket_column(batch: pa.Table, n_buckets: int, key: str = "url") -> pa.Table:
    """Recompute is authoritative: an existing ``bucket`` column (e.g.
    hive-partition re-injection when reading a bucketed dataset) is
    REPLACED, never duplicated — and its dtype normalizes to int64."""
    b = bucket_of(batch[key].to_pylist(), n_buckets)
    arr = pa.array(b, pa.int64())
    if "bucket" in batch.column_names:
        return batch.set_column(
            batch.column_names.index("bucket"), "bucket", arr
        )
    return batch.append_column("bucket", arr)


def _manifest_path(out_dir: str, bucket: int, n_buckets: int) -> str:
    if not isinstance(bucket, (int, np.integer)) or not 0 <= bucket < n_buckets:
        raise ManifestError(f"bucket id {bucket!r} outside [0, {n_buckets})")
    return os.path.join(out_dir, "manifest", f"part-{int(bucket):05d}.json")


def write_manifest(out_dir: str, m: BucketManifest, n_buckets: int) -> str:
    """Atomic: write tmp in the same directory, fsync, rename."""
    path = _manifest_path(out_dir, m.bucket, n_buckets)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(m), f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def read_manifest(out_dir: str, bucket: int, n_buckets: int) -> BucketManifest:
    path = _manifest_path(out_dir, bucket, n_buckets)
    try:
        with open(path) as f:
            d = json.load(f)
        return BucketManifest(**d)
    except FileNotFoundError:
        raise
    except (json.JSONDecodeError, TypeError, KeyError) as e:
        raise ManifestError(f"corrupt manifest {path}: {e}") from e


def done_buckets(out_dir: str, n_buckets: int, config_hash: str) -> set[int]:
    """Buckets with a valid manifest matching this config. A manifest
    from a different config (changed pipeline params) does NOT count
    as done — the bucket reruns. Corrupt manifests are ignored (the
    bucket reruns), never trusted."""
    mdir = os.path.join(out_dir, "manifest")
    if not os.path.isdir(mdir):
        return set()
    done: set[int] = set()
    for name in os.listdir(mdir):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        try:
            b = int(name[len("part-") : -len(".json")])
            m = read_manifest(out_dir, b, n_buckets)
        except (ValueError, ManifestError, FileNotFoundError):
            continue
        if m.config_hash == config_hash:
            done.add(m.bucket)
    return done


def prune_done(batch: pa.Table, done: frozenset[int]) -> pa.Table:
    """Read-side filter dropping rows of finished buckets (resume)."""
    if not done:
        return batch
    mask = pc.invert(pc.is_in(batch["bucket"], value_set=pa.array(list(done), pa.int64())))
    return batch.filter(mask)


def config_fingerprint(config: dict) -> str:
    return hashlib.md5(
        json.dumps(config, sort_keys=True).encode("utf-8")
    ).hexdigest()[:16]


BUCKETING_MARKER = "_BUCKETING.json"
BUCKETING_SCHEME = "md5_url_mod"  # bucket_of(): md5(url) % n_buckets


def write_bucketing_marker(data_dir: str, n_buckets: int) -> None:
    """Stamp a bucket-partitioned dataset with its bucketing config so
    a later run can prune whole FILES on resume (path-level pruning is
    only valid when the input's bucket ids were produced by the same
    (scheme, n_buckets) — the marker is the proof)."""
    import json

    with open(os.path.join(data_dir, BUCKETING_MARKER), "w") as f:
        json.dump({"scheme": BUCKETING_SCHEME, "n_buckets": n_buckets}, f)


def prunable_bucket_dirs(
    input_path: str, done: frozenset[int], n_buckets: int
) -> list[str] | None:
    """If ``input_path`` is a bucket-partitioned directory stamped with
    a matching bucketing marker, return the parquet files of
    UNFINISHED buckets only (read-side file pruning — finished buckets'
    bytes never leave storage). Returns None when the layout or the
    marker doesn't match — callers fall back to the row-level prune."""
    import json

    marker = os.path.join(input_path, BUCKETING_MARKER)
    if not os.path.isfile(marker):
        return None
    try:
        with open(marker) as f:
            m = json.load(f)
    except json.JSONDecodeError:
        return None
    if m.get("scheme") != BUCKETING_SCHEME or m.get("n_buckets") != n_buckets:
        return None
    import glob

    files = []
    for b in range(n_buckets):
        d = os.path.join(input_path, f"bucket={b}")
        if b not in done and os.path.isdir(d):
            # expand to files: Dataset readers take file paths in lists
            files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    return files
