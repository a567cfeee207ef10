"""Incremental cross-crawl near-dup — dedup a NEW crawl against a
FROZEN prior corpus in one pass over the new data (round-4 verdict
item 8: the recurring 100 TB operation; re-mining the union from
scratch repays the whole prior corpus's signature cost on every
crawl).

Composition of two existing components: the MinHash-LSH band keys
(:mod:`nidaba_ray.functions.dedup` — same permutations, same band
hashing, so candidate generation is EXACTLY the band self-join's)
probed against a persisted band-key index of the prior corpus (the
ingest-once/query-many layout :func:`ann.build_ivf_index`
established).

Scale shape — what moves is proportional to the NEW crawl, never the
prior text:

1. *index build* (once per prior corpus, cached): one signature pass
   over the prior text → a (band_id, band_hash, doc_id) parquet table
   (~16 narrow rows per doc), bucketed by ``band_hash`` so a probing
   join co-partitions without re-sharding the index.
2. *probe* (per new crawl): one signature pass over the NEW text;
   new-vs-index candidates come from a hash join of the new
   signatures against the index (signature-sized on both sides);
   new-vs-new candidates from the standard band self-join of the new
   signatures alone.
3. *verify*: exact n-gram Jaccard via ``dedup._verify_jaccard_pairs``
   over new-crawl docs ∪ the prior docs POSITIONALLY READ by candidate
   id (parquet ``in`` pushdown — prior text leaves storage only for
   the pairs-sized candidate set).

Equivalence: band keys are doc-independent, so
``prior_pairs ∪ probe_pairs == minhash_dedup_pairs(prior ∪ new)``
exactly (pinned in tests/test_crossdedup.py). Requires disjoint
doc_id spaces across crawls — the natural contract when doc ids are
(crawl_id, record) encodings."""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from nidaba_ray.functions.dedup import (
    _PAIRS_SCHEMA,
    _corpus_fingerprint,
    _docs,
    _verify_jaccard_pairs,
    MinHasher,
)
from nidaba_ray.util import join_partitions

__all__ = ["build_band_index", "incremental_minhash_pairs"]

_N_BUCKETS = 16  # band_hash % _N_BUCKETS partition dirs in the index

# prior ids are parquet-pushdown-read when the candidate set is small;
# beyond this we stream the prior corpus with the broadcast id filter
# (the verifier's own only_candidates pre-filter) instead of building
# a giant `in` expression
_PUSHDOWN_MAX_IDS = 100_000


def _signatures(docs: rd.Dataset) -> rd.Dataset:
    """(band_id, band_hash, doc_id) rows — the exact MinHasher stage
    minhash_candidates uses, over an arbitrary docs Dataset."""
    return docs.map_batches(
        MinHasher, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 8),
    )


def build_band_index(prior_sf_dir: str, index_dir: str) -> None:
    """One signature pass over the prior corpus → band-key parquet,
    partitioned by ``bucket = band_hash % _N_BUCKETS`` (whole-file
    pruning / co-partitioned probes at scale) with a completion
    sidecar for crash-safe resolve."""
    sigs = _signatures(_docs(prior_sf_dir, ["doc_id", "text"]))

    def add_bucket(batch: pa.Table) -> pa.Table:
        bucket = (np.asarray(batch["band_hash"]) % _N_BUCKETS).astype(np.int32)
        return batch.append_column("bucket", pa.array(bucket))

    sigs.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"]
    )
    with open(os.path.join(index_dir, "_BAND_DONE"), "w") as f:
        json.dump({"src": _corpus_fingerprint(prior_sf_dir)}, f)


def _resolve_band_index(prior_sf_dir: str) -> str:
    """Content-addressed per-uid cache of the prior corpus's band
    index (the _resolve_ivf_index pattern, simplified: the index is
    derived purely from frozen content, so a stale dir is just
    rebuilt)."""
    tag = hashlib.md5(
        os.path.realpath(prior_sf_dir).encode("utf-8")
    ).hexdigest()[:16]
    base = os.path.join(tempfile.gettempdir(),
                        f"nidaba_ray_bands_{os.getuid()}")
    idx = os.path.join(base, tag)
    done = os.path.join(idx, "_BAND_DONE")
    want = _corpus_fingerprint(prior_sf_dir)
    if os.path.isfile(done):
        try:
            with open(done) as f:
                if json.load(f).get("src") == want:
                    return idx
        except (json.JSONDecodeError, OSError):
            pass
    import shutil

    shutil.rmtree(idx, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    build_band_index(prior_sf_dir, idx)
    return idx


def _prior_candidate_docs(prior_sf_dir: str, old_ids: list[int]) -> rd.Dataset:
    """Prior-corpus text for exactly the candidate ids — pushdown read
    when the set is small, streamed otherwise (the verifier's own
    broadcast filter then drops non-candidates)."""
    if 0 < len(old_ids) <= _PUSHDOWN_MAX_IDS:
        t = pq.read_table(
            f"{prior_sf_dir}/documents.parquet", columns=["doc_id", "text"],
            filters=[("doc_id", "in", sorted(old_ids))],
        )
        return rd.from_arrow(t)
    return _docs(prior_sf_dir, ["doc_id", "text"])


def incremental_minhash_pairs(
    new_sf_dir: str, prior_sf_dir: str, threshold: float = 0.7,
    index_dir: str | None = None,
) -> pa.Table:
    """All near-dup pairs INVOLVING the new crawl — (new, new) and
    (new, prior) — with exact Jaccard verification. Union with the
    prior corpus's own mined pairs equals full re-mining of the union
    (pinned); doc_id spaces must be disjoint across crawls."""
    from ray.data.aggregate import Count

    idx = index_dir or _resolve_band_index(prior_sf_dir)
    new_docs = _docs(new_sf_dir, ["doc_id", "text"])
    new_sigs = _signatures(new_docs).materialize()
    n_sig = max(1, new_sigs.count())

    index = rd.read_parquet(idx, columns=["band_id", "band_hash", "doc_id"])
    n_idx = max(1, index.count())

    # new-vs-prior: hash join new signatures against the index (both
    # sides signature-sized; prior TEXT never enters this join)
    cross = new_sigs.repartition(min(join_partitions(8), n_sig)).join(
        index.repartition(min(join_partitions(8), n_idx)),
        "inner", join_partitions(8), on=("band_id", "band_hash"),
        left_suffix="_new", right_suffix="_old",
    )

    def cross_pairs(batch: pa.Table) -> pa.Table:
        # prior doc is canonically doc_a iff smaller — disjoint id
        # spaces make (min, max) the same normalization the self-join
        # a<b filter produces on the union
        a = pc.min_element_wise(batch["doc_id_new"], batch["doc_id_old"])
        b = pc.max_element_wise(batch["doc_id_new"], batch["doc_id_old"])
        keep = pc.not_equal(a, b)
        return pa.table({"doc_a": pc.filter(a, keep),
                         "doc_b": pc.filter(b, keep)})

    # new-vs-new: the standard band self-join over new signatures only
    selfj = new_sigs.repartition(min(join_partitions(8), n_sig)).join(
        new_sigs.repartition(min(join_partitions(8), n_sig)),
        "inner", join_partitions(8), on=("band_id", "band_hash"),
        left_suffix="_a", right_suffix="_b",
    )

    def self_pairs(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.less(batch["doc_id_a"], batch["doc_id_b"]))
        return pa.table({"doc_a": b["doc_id_a"], "doc_b": b["doc_id_b"]})

    uniq = (
        cross.map_batches(cross_pairs, batch_format="pyarrow")
        .union(selfj.map_batches(self_pairs, batch_format="pyarrow"))
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(lambda t: t.select(["doc_a", "doc_b"]),
                     batch_format="pyarrow")
        .materialize()
    )
    if uniq.count() == 0:
        return _PAIRS_SCHEMA.empty_table()

    # candidate ids (pairs-sized), split by membership in the new
    # crawl — prior ids are what the pushdown read must surface
    cand_ids: set[int] = set()
    for b in uniq.iter_batches(batch_format="pyarrow"):
        cand_ids.update(b["doc_a"].to_pylist())
        cand_ids.update(b["doc_b"].to_pylist())
    new_ids: set[int] = set()
    for b in _docs(new_sf_dir, ["doc_id"]).iter_batches(
            batch_format="pyarrow"):
        new_ids.update(b["doc_id"].to_pylist())
    prior_cand = sorted(cand_ids - new_ids)
    docs = new_docs.union(_prior_candidate_docs(prior_sf_dir, prior_cand))
    return _verify_jaccard_pairs(uniq, new_sf_dir, threshold, docs=docs)
