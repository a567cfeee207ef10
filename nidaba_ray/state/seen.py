"""Sharded streaming "seen" index — exact first-arrival dedup for an
unbounded crawl ingest (the crawl-frontier / URL-seen set every web
pipeline carries; CCNet/RefinedWeb-style exact dedup applied online).

This is the ONE operator family that genuinely cannot be a Dataset
transform: admission is a point lookup+insert against state SHARED by
every concurrently-running batch task, so it lives in raw
``@ray.remote`` actors (the brief's "shared mutable index" carve-out).
Everything around it stays Ray Data: the pages flow through
``map_batches`` and only 16-byte md5 keys travel to the index.

Scale design (100 TB):

* keys are md5 digests (16 bytes) of the dedup key column — the
  index never sees page bytes; shipping 1 M keys is 16 MB.
* the key space is hash-partitioned over ``n_shards`` actors
  (``shard = key[0:8] % n_shards``); each admit() call batches all of
  a Ray Data batch's keys for one shard into ONE message, so actor
  traffic is O(batches × shards), not O(rows).
* shards tier their memory: a bounded mutable ``set`` freezes into
  immutable sorted uint64-pair runs (16 B/key, ~5× denser than a
  Python set, binary-searched) that periodically merge — the LSM
  shape. 1 G keys ≈ 16 GB/shard at the dense tier; at real scale you
  raise ``n_shards`` so each fits a node, and a production build adds
  a Bloom front + disk spill for the frozen runs behind the same
  ``admit`` contract.
* index actors are ``num_cpus=0``: admission is memory-bound lookup
  work that must never reserve CPUs away from the extraction pool
  (the repo's fixed-pool livelock invariant, CLAUDE.md).

Determinism contract (weaker than batch ``exact_dedup`` — documented,
not hidden): the admitted KEY SET is always exactly the distinct key
set of the input (deterministic), but WHICH duplicate row represents
its key follows arrival order, which varies with parallelism. Batch
``functions/dedup.exact_dedup`` remains the keep-latest deterministic
path; this is the online path where "first arrival wins" is the
semantic (a crawler cannot know a later duplicate is coming).
``tests/test_seen_index.py`` pins: admitted set == DuckDB
``count(distinct)``, one representative per key, and hit counters
consistent across parallelism levels.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray

__all__ = ["SeenShard", "seen_index", "admit_first_arrival",
           "index_stats"]


@ray.remote(num_cpus=0)
class SeenShard:
    """One hash-partition of the seen set. ``admit`` is atomic per
    message (actor mailbox serializes callers), which is exactly the
    property the Dataset API cannot express.

    Memory tiering (the production path, implemented): the mutable
    tier is a plain ``set``; when it exceeds ``max_mem_keys`` it is
    FROZEN into an immutable sorted array of big-endian uint64 PAIRS
    (16 bytes/key, ~5× denser than set-of-bytes and binary-searchable)
    and a fresh mutable set starts. Periodically (every ``merge_every`` freezes)
    the frozen runs merge into one — the classic LSM shape. Lookups
    check the mutable set, then each frozen run via
    ``np.searchsorted`` on the 128-bit keys viewed as two uint64
    columns. Default ``max_mem_keys=None`` keeps the flat-set
    behavior; tiering is pinned equivalent in tests/test_seen_index.py.

    Disk tier: with ``spill_dir`` set, frozen runs live as ``.npy``
    files opened through ``np.load(mmap_mode="r")`` — the actor's
    resident footprint is the mutable set plus the OS page cache's
    working set of run pages, so a shard's key capacity is bounded by
    DISK, not heap. Binary search over a memmap touches O(log n)
    pages per probe; merges of spilled runs STREAM through the new
    file in bounded chunks (vectorized k-way merge, peak heap
    O(runs × chunk) — see ``_merge_runs_streaming``) and delete the
    inputs. Same ``admit`` contract, pinned equivalent in tests.

    Crash recovery (spill tier only): each freeze atomically rewrites
    a per-shard ``MANIFEST.json`` (run list, frozen-key count, hit
    counter) and admitted-but-unfrozen keys append to a WAL segment
    (16 raw bytes/key, deleted once its keys freeze into a run). A
    replacement actor pointed at the same ``spill_dir`` reloads the
    manifest runs, replays the WAL into the mutable set, and rebuilds
    the Bloom front — the admitted key set survives the crash
    exactly. Best-effort after recovery: duplicate-hit counts since
    the last freeze (not WAL'd).

    Idempotent admits (exactly-once under task retry): ``admit``
    accepts an optional ``batch_id``; the shard memoizes the reply
    per id (bounded LRU) and a retried task — Ray re-executing a
    ``map_batches`` task after a worker loss re-sends the SAME batch
    — replays the stored flags instead of double-admitting, so the
    retried task keeps exactly the rows the original run admitted.
    The memo is in-memory: a task retry that races an ACTOR crash
    (double failure) degrades to at-most-once for that batch's fresh
    keys (they re-probe as already-seen after WAL recovery and the
    rows drop) — never duplicates. ``admit_first_arrival`` derives
    the id from an id column + the key digests, so only byte-equal
    retries of the same rows replay.

    Bloom front: when tiering is on, a per-shard Bloom filter over
    all frozen keys gates the run probes — a fresh key (the common
    case in a crawl) short-circuits on in-RAM bit tests instead of
    touching O(runs · log n) memmap pages. The double hash comes
    straight from the md5 digest the key already IS (no re-hashing;
    md5-only invariant holds). False positives only cost a run probe
    — never correctness; the filter accumulates (merges don't remove
    keys) and saturation never costs correctness.

    Bloom resize: the front targets ~8 bits per frozen key. When a
    freeze pushes ``n_frozen`` past the current capacity the filter
    is REBUILT from the frozen runs at the next power-of-two size
    (vectorized over the run arrays) — geometric doubling keeps total
    rebuild work O(n_frozen), and the size is derived purely from
    ``n_frozen`` so recovery recomputes it without a manifest field.
    Sizes are powers of two ON PURPOSE: ``(h1 + i*h2) mod 2**m`` is
    identical under exact Python ints and wrapping uint64 arithmetic
    (2**m divides 2**64), so the scalar probe path and the vectorized
    rebuild path compute the same positions — pinned in tests."""

    _BLOOM_MIN_BITS = 1 << 23  # 1 MiB of bits per shard (~8 bits/key at 1M)
    _BLOOM_K = 6

    def __init__(self, max_mem_keys: int | None = None,
                 merge_every: int = 8,
                 spill_dir: str | None = None) -> None:
        import numpy as np

        self._np = np
        self._seen: set[bytes] = set()
        self._hits = 0  # duplicate keys rejected (lifetime)
        self._max_mem = max_mem_keys
        self._merge_every = merge_every
        self._runs: list = []   # sorted (n, 2) uint64 arrays (or memmaps)
        self._n_frozen = 0
        self._spill_dir = spill_dir
        self._spill_seq = 0
        self._run_paths: list = []  # parallel to _runs when spilling
        self._bloom_bits = self._BLOOM_MIN_BITS
        self._bloom = (
            np.zeros(self._bloom_bits // 64, dtype=np.uint64)
            if max_mem_keys is not None else None
        )
        self._wal = None       # open append handle for the current segment
        self._wal_paths: list = []  # segments holding the mutable tier
        self._wal_seq = 0
        from collections import OrderedDict

        # batch_id → reply memo for idempotent admits (task retry)
        self._replies: "OrderedDict[bytes, list[bool]]" = OrderedDict()
        if spill_dir is not None:
            import os

            os.makedirs(spill_dir, exist_ok=True)
            if os.path.isfile(os.path.join(spill_dir, "MANIFEST.json")):
                self._recover()
            else:
                # no manifest = nothing recoverable: wipe stale
                # orphans from a previous index reusing this dir
                # (disk-leak hazard otherwise)
                for f in os.listdir(spill_dir):
                    if f.startswith(("run-", "wal-")):
                        try:
                            os.unlink(os.path.join(spill_dir, f))
                        except OSError:
                            pass
            self._open_wal()

    # -- durability -------------------------------------------------------

    def _manifest_path(self) -> str:
        import os

        return os.path.join(self._spill_dir, "MANIFEST.json")

    def _write_manifest(self) -> None:
        """Atomic (tmp + os.replace) snapshot of the frozen state."""
        import json
        import os

        doc = {
            "runs": [os.path.basename(p) for p in self._run_paths],
            "n_frozen": self._n_frozen,
            "hits": self._hits,
            "spill_seq": self._spill_seq,
            "wal_seq": self._wal_seq,
        }
        tmp = self._manifest_path() + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, self._manifest_path())

    def _open_wal(self) -> None:
        import os

        path = os.path.join(self._spill_dir, f"wal-{self._wal_seq:08d}.bin")
        self._wal_seq += 1
        self._wal = open(path, "ab")
        self._wal_paths.append(path)

    def _recover(self) -> None:
        """Reload frozen runs + manifest counters, replay the WAL into
        the mutable set, rebuild the Bloom front. Keys present in both
        a run and a trailing WAL segment (crash between run store and
        WAL cleanup) are harmless: the mutable set is checked first."""
        import json
        import os

        np = self._np
        with open(self._manifest_path()) as f:
            doc = json.load(f)
        self._run_paths = [os.path.join(self._spill_dir, r)
                           for r in doc["runs"]]
        self._runs = [np.load(p, mmap_mode="r") for p in self._run_paths]
        self._n_frozen = int(doc["n_frozen"])
        self._hits = int(doc["hits"])
        self._spill_seq = int(doc["spill_seq"])
        self._wal_seq = int(doc["wal_seq"])
        listed = set(doc["runs"])
        for f_ in os.listdir(self._spill_dir):
            # a crash between run store and manifest write leaves an
            # orphan run file; its keys are still in the WAL, so drop it
            if f_.startswith("run-") and f_ not in listed:
                try:
                    os.unlink(os.path.join(self._spill_dir, f_))
                except OSError:
                    pass
        for f_ in sorted(os.listdir(self._spill_dir)):
            if not f_.startswith("wal-"):
                continue
            with open(os.path.join(self._spill_dir, f_), "rb") as fh:
                blob = fh.read()
            blob = blob[: len(blob) - (len(blob) % 16)]  # torn tail write
            for i in range(0, len(blob), 16):
                self._seen.add(blob[i:i + 16])
            self._wal_paths.append(os.path.join(self._spill_dir, f_))
        if self._bloom is not None:
            self._rebuild_bloom()

    def _bloom_target_bits(self, n_keys: int) -> int:
        """Next power-of-two size giving ≥8 bits/key (min 1 MiB)."""
        bits = self._BLOOM_MIN_BITS
        while bits < 8 * n_keys:
            bits <<= 1
        return bits

    def _rebuild_bloom(self) -> None:
        """Re-derive the front from the frozen runs at the size
        ``n_frozen`` dictates — used after recovery and when a freeze
        outgrows the current capacity. Vectorized: power-of-two sizes
        make wrapping uint64 arithmetic exact (see class docstring)."""
        np = self._np
        self._bloom_bits = self._bloom_target_bits(self._n_frozen)
        bloom = np.zeros(self._bloom_bits // 64, dtype=np.uint64)
        mask = np.uint64(self._bloom_bits - 1)
        for run in self._runs:
            arr = np.asarray(run).astype(np.uint64)  # >u8 → native values
            h1 = arr[:, 0]
            h2 = arr[:, 1] | np.uint64(1)
            for i in range(self._BLOOM_K):
                with np.errstate(over="ignore"):
                    p = (h1 + np.uint64(i) * h2) & mask
                np.bitwise_or.at(
                    bloom, (p >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (p & np.uint64(63)))
        self._bloom = bloom

    def _bloom_positions(self, k: bytes) -> list[int]:
        h1 = int.from_bytes(k[:8], "big")
        h2 = int.from_bytes(k[8:], "big") | 1
        return [(h1 + i * h2) % self._bloom_bits
                for i in range(self._BLOOM_K)]

    def _bloom_add(self, k: bytes) -> None:
        bits = self._bloom
        for p in self._bloom_positions(k):
            bits[p >> 6] |= self._np.uint64(1 << (p & 63))

    def _bloom_maybe(self, k: bytes) -> bool:
        bits = self._bloom
        one = 1
        for p in self._bloom_positions(k):
            if not (int(bits[p >> 6]) >> (p & 63)) & one:
                return False
        return True

    def _store_run(self, arr) -> None:
        """Keep a sorted run in RAM, or spill it and hold a memmap."""
        np = self._np
        if self._spill_dir is None:
            self._runs.append(arr)
            return
        import os

        path = os.path.join(self._spill_dir,
                            f"run-{os.getpid()}-{self._spill_seq}.npy")
        self._spill_seq += 1
        # big-endian dtype round-trips through .npy byte-exactly
        np.save(path, np.ascontiguousarray(arr))
        self._runs.append(np.load(path, mmap_mode="r"))
        self._run_paths.append(path)

    def _drop_runs(self) -> None:
        if self._spill_dir is not None:
            import os

            for p in self._run_paths:
                try:
                    os.unlink(p)
                except OSError:
                    pass
            self._run_paths = []
        self._runs = []

    def _wal_write(self, ks: list[bytes]) -> None:
        if self._wal is not None and ks:
            self._wal.write(b"".join(ks))
            self._wal.flush()  # survives actor-process death

    def _rotate_wal(self) -> None:
        """The mutable tier just froze into a run recorded by the
        manifest — its WAL segments are obsolete; start a fresh one."""
        import os

        if self._wal is not None:
            self._wal.close()
        for p in self._wal_paths:
            try:
                os.unlink(p)
            except OSError:
                pass
        self._wal_paths = []
        self._open_wal()

    def _merge_spilled(self, buf) -> None:
        """Streaming k-way merge of the spilled runs + ``buf`` into a
        new .npy: bounded chunks per source, write-through — peak heap
        is O(runs × chunk), never the shard's total frozen keys. Per
        output block the cutoff key is the smallest last-key of any
        source's next window, so everything ≤ cutoff across all
        sources is globally ordered before everything after it."""
        import os

        np = self._np
        sources = [*self._runs, buf]
        total = sum(len(s) for s in sources)
        path = os.path.join(self._spill_dir,
                            f"run-{os.getpid()}-{self._spill_seq}.npy")
        self._spill_seq += 1
        chunk = 1 << 16
        with open(path, "wb") as f:
            np.lib.format.write_array_header_1_0(
                f, {"descr": ">u8", "fortran_order": False,
                    "shape": (total, 2)},
            )
            cursors = [0] * len(sources)
            while True:
                best = None
                for s, c in zip(sources, cursors):
                    if c >= len(s):
                        continue
                    end = min(c + chunk, len(s)) - 1
                    key = (int(s[end, 0]), int(s[end, 1]))
                    if best is None or key < best:
                        best = key
                if best is None:
                    break
                parts = []
                for idx, s in enumerate(sources):
                    c = cursors[idx]
                    if c >= len(s):
                        continue
                    hi = int(np.searchsorted(s[c:, 0], best[0],
                                             side="right")) + c
                    lo_edge = int(np.searchsorted(s[c:, 0], best[0],
                                                  side="left")) + c
                    cut = lo_edge + int(np.searchsorted(
                        s[lo_edge:hi, 1], best[1], side="right"))
                    if cut > c:
                        parts.append(np.asarray(s[c:cut]))
                        cursors[idx] = cut
                block = np.concatenate(parts)
                order = np.lexsort((block[:, 1], block[:, 0]))
                # np.concatenate silently converts >u8 to NATIVE
                # uint64 — cast back so the bytes match the big-endian
                # header (caught by the crash-recovery test: a merged
                # run read back byte-swapped)
                f.write(block[order].astype(">u8", copy=False).tobytes())
        self._drop_runs()
        self._runs.append(np.load(path, mmap_mode="r"))
        self._run_paths.append(path)

    def _freeze(self) -> None:
        np = self._np
        if not self._seen:
            return
        buf = np.frombuffer(b"".join(sorted(self._seen)),
                            dtype=">u8").reshape(-1, 2)
        # big-endian view sorts identically to the byte sort above
        for k in self._seen:
            self._bloom_add(k)
        n_new = len(self._seen)
        self._seen = set()
        self._n_frozen += n_new
        if len(self._runs) + 1 >= self._merge_every:
            if self._spill_dir is not None:
                self._merge_spilled(buf)
            else:
                merged = np.concatenate([np.asarray(r) for r in self._runs]
                                        + [buf])
                order = np.lexsort((merged[:, 1], merged[:, 0]))
                merged = merged[order]
                self._drop_runs()
                self._store_run(merged)
        else:
            self._store_run(buf)
        if self._bloom is not None and 8 * self._n_frozen > self._bloom_bits:
            # outgrew ~8 bits/key: double (geometrically) and re-derive
            # from the runs — every frozen key is in exactly the runs
            # at this point (the mutable set just emptied into one)
            self._rebuild_bloom()
        if self._spill_dir is not None:
            # run durable first, THEN retire the WAL: a crash between
            # the two replays keys that are also in the new run —
            # harmless (mutable set is probed before the runs)
            self._write_manifest()
            self._rotate_wal()

    def _in_runs(self, k: bytes) -> bool:
        np = self._np
        kk = np.frombuffer(k, dtype=">u8")
        for run in self._runs:
            # binary search on the high word, then scan the tiny
            # equal-high slice for the low word
            lo = np.searchsorted(run[:, 0], kk[0], side="left")
            hi = np.searchsorted(run[:, 0], kk[0], side="right")
            if lo < hi and kk[1] in run[lo:hi, 1]:
                return True
        return False

    _REPLY_MEMO_MAX = 4096  # retried batches arrive soon after the loss

    def admit(self, keys: list[bytes],
              batch_id: bytes | None = None) -> list[bool]:
        if batch_id is not None:
            memo = self._replies.get(batch_id)
            if memo is not None:
                self._replies.move_to_end(batch_id)
                return memo
        out = self._admit_new(keys)
        if batch_id is not None:
            self._replies[batch_id] = out
            while len(self._replies) > self._REPLY_MEMO_MAX:
                self._replies.popitem(last=False)
        return out

    def _admit_new(self, keys: list[bytes]) -> list[bool]:
        out = []
        hits = 0
        fresh: list[bytes] = []  # admitted this message, not yet WAL'd
        for k in keys:
            if k in self._seen or (
                self._runs and self._bloom_maybe(k) and self._in_runs(k)
            ):
                out.append(False)
                hits += 1
            else:
                self._seen.add(k)
                out.append(True)
                fresh.append(k)
                if self._max_mem is not None and len(self._seen) >= self._max_mem:
                    self._wal_write(fresh)  # freeze consumes the WAL
                    fresh = []
                    self._freeze()
        self._wal_write(fresh)
        self._hits += hits
        return out

    def stats(self) -> tuple[int, int]:
        return len(self._seen) + self._n_frozen, self._hits


def seen_index(n_shards: int = 4, max_mem_keys: int | None = None,
               merge_every: int = 8,
               spill_dir: str | None = None) -> list["ray.actor.ActorHandle"]:
    """Create a fresh sharded index (handles are serializable — Ray
    Data tasks capture them through the map-fn closure).
    ``max_mem_keys`` bounds each shard's mutable set; beyond it keys
    freeze into dense sorted runs, which merge every ``merge_every``
    freezes; with ``spill_dir`` the frozen runs live on disk behind
    memmaps, one subdirectory per shard (see SeenShard)."""
    import os

    return [
        SeenShard.remote(
            max_mem_keys, merge_every,
            None if spill_dir is None
            else os.path.join(spill_dir, f"shard-{i}"),
        )
        for i in range(n_shards)
    ]


def _shard_of(digest: bytes, n_shards: int) -> int:
    # first 8 digest bytes as big-endian int — uniform, md5-only
    # (repo invariant: never builtin hash())
    return int.from_bytes(digest[:8], "big") % n_shards


def admit_first_arrival(ds: "ray.data.Dataset",
                        shards: list["ray.actor.ActorHandle"],
                        key_col: str = "text",
                        idempotency_col: str | None = None,
                        ) -> "ray.data.Dataset":
    """Filter ``ds`` to first-arrival rows per distinct ``key_col``
    value, consulting the shared index. Streaming-safe: each batch
    sends one admit() message per touched shard and keeps only
    admitted rows; nothing corpus-sized accumulates anywhere except
    the (keys-only) index itself.

    ``idempotency_col`` (a unique row-id column, e.g. ``doc_id`` or
    ``url``) turns on exactly-once admission under Ray task retry:
    each per-shard message carries a batch id — md5 over that shard's
    row ids + key digests — and the shard replays its memoized reply
    for a byte-equal resend (see SeenShard). Without it a retried
    task would re-probe keys its first attempt admitted, see them as
    duplicates, and drop the rows. The id column must not repeat
    across rows, or distinct identical batches could alias."""
    n_shards = len(shards)

    def admit_batch(batch: pa.Table) -> pa.Table:
        vals = batch[key_col].to_pylist()
        digests = [
            hashlib.md5(
                v if isinstance(v, bytes)
                else b"" if v is None
                else v.encode("utf-8")
            ).digest()
            for v in vals
        ]
        row_ids = (
            batch[idempotency_col].to_pylist()
            if idempotency_col is not None else None
        )
        by_shard: dict[int, list[int]] = {}
        for i, d in enumerate(digests):
            by_shard.setdefault(_shard_of(d, n_shards), []).append(i)
        order = sorted(by_shard)
        refs = []
        for s in order:
            ks = [digests[i] for i in by_shard[s]]
            if row_ids is None:
                refs.append(shards[s].admit.remote(ks))
            else:
                h = hashlib.md5()
                for i in by_shard[s]:
                    h.update(repr(row_ids[i]).encode("utf-8"))
                for k in ks:
                    h.update(k)
                refs.append(shards[s].admit.remote(ks, h.digest()))
        keep = [False] * len(digests)
        for s, flags in zip(order, ray.get(refs)):
            for i, ok in zip(by_shard[s], flags):
                keep[i] = ok
        return batch.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(admit_batch, batch_format="pyarrow")


def index_stats(shards: list["ray.actor.ActorHandle"]) -> pa.Table:
    """Per-shard (n_keys, n_hits) rollup — the job-level counters a
    long-running ingest reports."""
    stats = ray.get([s.stats.remote() for s in shards])
    return pa.table(
        {
            "shard": pa.array(range(len(shards)), pa.int64()),
            "n_keys": pa.array([s[0] for s in stats], pa.int64()),
            "n_hits": pa.array([s[1] for s in stats], pa.int64()),
        }
    )
