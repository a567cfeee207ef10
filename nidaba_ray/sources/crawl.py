"""Streaming crawl-shard source — the WARC-reader ingest shape
(docs/NEXT.md item 8) as a real Ray Data ``Datasource``.

One ``ReadTask`` per shard (the "one task per WARC file" layout); each
task ITERATES its shard in fixed-size record chunks, yielding Arrow
tables incrementally — the streaming executor schedules shards across
the cluster and applies backpressure per chunk, exactly how an
unbounded archive read behaves. Against real storage the synthesizer
body becomes a WARC record iterator behind the same generator contract;
everything else (metadata, shard fan-out, downstream pipeline) stays.

Pages are synthesized deterministically (same generator as
synth.pages_table, seeded per doc id) so the output — and the
extraction goldens — are byte-stable for tests.
"""

from __future__ import annotations

import random

import pyarrow as pa
import ray.data as rd
from ray.data.block import BlockMetadata
from ray.data.datasource import Datasource, ReadTask

from nidaba_ray import synth

__all__ = ["SyntheticCrawlDatasource", "read_crawl",
           "streaming_extract_stats", "streaming_stats_sql"]

CHUNK_ROWS = 128  # records yielded per iterator step (backpressure unit)
_LANGS = ["en", "de", "es", "fr", "zh"]


def _shard_pages(lo: int, hi: int) -> "pa.Table":
    """Synthesize pages for doc ids [lo, hi) — deterministic per id."""
    rows = []
    for doc_id in range(lo, hi):
        rng = random.Random(f"crawl-{synth.SEED}-{doc_id}")
        vocab = [f"word{i:03d}" for i in range(200)]
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(12, 160)))
        lang = _LANGS[doc_id % len(_LANGS)]
        rows.append(synth.make_page(doc_id, text, lang) | {"doc_id": doc_id,
                                                           "golden": text})
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "golden": pa.array([r["golden"] for r in rows], pa.string()),
        }
    )


class SyntheticCrawlDatasource(Datasource):
    """``n_shards`` read tasks, each streaming its id range in
    CHUNK_ROWS-sized Arrow tables."""

    def __init__(self, n_shards: int, pages_per_shard: int,
                 start_doc_id: int = 0) -> None:
        self.n_shards = n_shards
        self.pages_per_shard = pages_per_shard
        self.start = start_doc_id

    def estimate_inmemory_data_size(self):
        # ~2 KB/page synthesized; advisory only (drives initial splits)
        return self.n_shards * self.pages_per_shard * 2048

    def get_name(self) -> str:
        return "SyntheticCrawl"

    def get_read_tasks(self, parallelism: int) -> list[ReadTask]:
        tasks = []
        for shard in range(self.n_shards):
            lo = self.start + shard * self.pages_per_shard
            hi = lo + self.pages_per_shard

            def read_fn(lo: int = lo, hi: int = hi):
                for chunk_lo in range(lo, hi, CHUNK_ROWS):
                    yield _shard_pages(chunk_lo, min(chunk_lo + CHUNK_ROWS, hi))

            meta = BlockMetadata(
                num_rows=hi - lo,
                size_bytes=None,
                exec_stats=None,
                input_files=[f"warc://crawl/shard-{shard:05d}.warc.gz"],
            )
            tasks.append(ReadTask(read_fn, meta))
        return tasks


def read_crawl(n_shards: int = 8, pages_per_shard: int = 64,
               start_doc_id: int = 0) -> rd.Dataset:
    """Streaming pages Dataset from the shard source."""
    return rd.read_datasource(
        SyntheticCrawlDatasource(n_shards, pages_per_shard, start_doc_id)
    )


def streaming_extract_stats(sf_dir: str) -> pa.Table:
    """queries() entry (rows check): the full flagship pipeline fed by
    the streaming shard source instead of parquet — per-shard rollup
    (shard id recovered from doc_id range). ``sf_dir`` is unused (the
    source is synthetic by design); signature matches the contract."""
    from ray.data.aggregate import Sum

    from nidaba_ray.pipelines.extract import extract_pipeline

    n_shards, pps = 8, 64
    pages = read_crawl(n_shards, pps).drop_columns(["golden"])
    out = extract_pipeline(pages)

    def partial(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        errs = batch["error"].to_pylist()
        toks = batch["n_tokens"].to_pylist()
        agg: dict[int, list[int]] = {}
        for d, e, t in zip(doc_ids, errs, toks):
            row = agg.setdefault(d // pps, [0, 0, 0, 0])
            row[0] += 1
            row[1] += 0 if e else 1
            row[2] += 1 if e else 0
            row[3] += int(t or 0) if not e else 0
        shards = sorted(agg)
        return pa.table(
            {
                "shard": pa.array(shards, pa.int64()),
                "n_pages": pa.array([agg[s][0] for s in shards], pa.int64()),
                "n_ok": pa.array([agg[s][1] for s in shards], pa.int64()),
                "n_quarantined": pa.array([agg[s][2] for s in shards], pa.int64()),
                "total_tokens": pa.array([agg[s][3] for s in shards], pa.int64()),
            }
        )

    g = (
        out.map_batches(partial, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(Sum("n_pages", alias_name="n_pages"),
                   Sum("n_ok", alias_name="n_ok"),
                   Sum("n_quarantined", alias_name="n_quarantined"),
                   Sum("total_tokens", alias_name="total_tokens"))
        .to_pandas()
        .sort_values("shard")
        .reset_index(drop=True)
        .astype({"shard": "int64", "n_pages": "int64", "n_ok": "int64",
                 "n_quarantined": "int64", "total_tokens": "int64"})
    )
    return pa.Table.from_pandas(g, preserve_index=False)


def streaming_stats_sql() -> str:
    """Driver oracle for :func:`streaming_extract_stats` (promoted
    round 5): the expected per-shard rollup, inlined as a VALUES list
    built by replaying ONLY the deterministic source generator — never
    the extraction code, so the check is not circular. Extraction is
    byte-identity on the synthesized text (the flagship contract), so
    each ok doc's expected ``n_tokens`` is its word count, which IS
    the generator's first ``randint(12, 160)`` draw (the text is that
    many vocab choices joined by spaces); quarantined docs are exactly
    the invalid-payload ids (``synth.payload_kind``). Any extractor or
    tokenizer regression through the streaming path now fails the
    driver's rows+schema+hash check, not just pytest."""
    import random

    n_shards, pps = 8, 64
    agg: dict[int, list[int]] = {}
    for doc_id in range(n_shards * pps):
        rng = random.Random(f"crawl-{synth.SEED}-{doc_id}")
        n_tok = rng.randint(12, 160)  # == len(text.split(" "))
        bad = synth.payload_kind(doc_id) == "invalid"
        row = agg.setdefault(doc_id // pps, [0, 0, 0, 0])
        row[0] += 1
        row[1] += 0 if bad else 1
        row[2] += 1 if bad else 0
        row[3] += 0 if bad else n_tok
    vals = ", ".join(
        f"({s}, {a[0]}, {a[1]}, {a[2]}, {a[3]})"
        for s, a in sorted(agg.items())
    )
    return (
        "SELECT CAST(shard AS BIGINT) AS shard, "
        "CAST(n_pages AS BIGINT) AS n_pages, "
        "CAST(n_ok AS BIGINT) AS n_ok, "
        "CAST(n_quarantined AS BIGINT) AS n_quarantined, "
        "CAST(total_tokens AS BIGINT) AS total_tokens "
        f"FROM (VALUES {vals}) AS t(shard, n_pages, n_ok, "
        "n_quarantined, total_tokens)"
    )
