"""Real WARC (ISO 28500) shard sink + streaming source.

Common Crawl publishes its corpus as ``*.warc.gz`` shards where every
WARC record is an independent gzip member — that convention is what
makes the format splittable: a reader can start at any member boundary,
and one read task per file streams records without decompressing the
whole shard into memory. This module implements both directions with
stdlib ``gzip`` only:

* ``write_warc_shards`` — distributed sink: one Ray task per shard
  (via ``rd.range(n_shards).map_batches``), each task reads ONLY its
  doc-id range from the documents parquet (pyarrow filter pushdown →
  row-group pruning), synthesizes pages, and writes
  ``shard-NNNNN.warc.gz`` with a leading ``warcinfo`` record and one
  ``response`` record per page. Per-record gzip members with ``mtime=0``
  keep shard bytes deterministic. The per-shard-file layout is the
  resumable-output shape: a rerun skips shards whose file already
  exists with the expected record count stamped in the warcinfo.

* ``read_warc`` / ``WarcDatasource`` — streaming source: one
  ``ReadTask`` per ``*.warc.gz`` file; the task wraps the file in one
  ``gzip.GzipFile`` (stdlib gzip iterates concatenated members
  transparently and reads lazily from the underlying file object) and
  parses WARC records sequentially — headers, ``Content-Length``-framed
  block, HTTP header strip — yielding Arrow tables of ``CHUNK_ROWS``
  records so the streaming executor applies backpressure per chunk.
  Non-``response`` records (warcinfo, request, metadata) are skipped.

Unlike ``sources/crawl.py`` (which exercises the streaming-Datasource
plumbing over synthesized records), this reads REAL bytes in the real
archive format: the pipeline ``read_warc(dir) → extract_pipeline`` is
exactly the ingest a Common Crawl user runs. No ground-truth ``text``
column exists in a WARC — the extractor treats the candidate column as
optional — and ``lang`` rides the standard ``Content-Language`` HTTP
response header.

At 10^12-document scale the path list itself comes from a manifest
(CC's ``warc.paths.gz``) rather than a directory listing; everything
else here already has the right shape — per-file read tasks, chunked
yields, no driver-side materialization.
"""

from __future__ import annotations

import glob
import gzip
import hashlib
import io
import os
from datetime import datetime, timezone

import pyarrow as pa
import ray.data as rd
from ray.data.block import BlockMetadata
from ray.data.datasource import Datasource, ReadTask

from nidaba_ray import synth

__all__ = [
    "warc_record",
    "write_warc_shards",
    "read_warc",
    "WarcDatasource",
    "warc_extract_stats",
]

CHUNK_ROWS = 256  # records per yielded Arrow table (backpressure unit)
CRLF = b"\r\n"


def _warc_date(ts_us: int) -> str:
    dt = datetime.fromtimestamp(ts_us / 1_000_000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def _record_id(url: str, ts_us: int) -> str:
    # deterministic urn:uuid from (url, ts) — md5-only repo invariant
    h = hashlib.md5(f"{url}|{ts_us}".encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def warc_record(
    url: str,
    ts_us: int,
    payload: bytes,
    lang: str | None = None,
    content_type: str = "text/html",
) -> bytes:
    """One WARC/1.0 ``response`` record as its own gzip member.

    The record block is a full HTTP/1.1 response (status line + headers
    + body) per the ``application/http; msgtype=response`` profile;
    ``lang`` travels as the standard ``Content-Language`` header."""
    http_headers = [
        b"HTTP/1.1 200 OK",
        b"Content-Type: " + content_type.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    if lang:
        http_headers.append(b"Content-Language: " + lang.encode())
    http_block = CRLF.join(http_headers) + CRLF + CRLF + payload
    warc_headers = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Record-ID: " + _record_id(url, ts_us).encode(),
        b"WARC-Date: " + _warc_date(ts_us).encode(),
        b"WARC-Target-URI: " + url.encode(),
        b"Content-Type: application/http; msgtype=response",
        b"Content-Length: " + str(len(http_block)).encode(),
    ]
    raw = CRLF.join(warc_headers) + CRLF + CRLF + http_block + CRLF + CRLF
    return gzip.compress(raw, mtime=0)


def _warcinfo(shard: int, n_records: int) -> bytes:
    body = (
        f"software: nidaba_ray\r\nshard: {shard}\r\n"
        f"records: {n_records}\r\n"
    ).encode()
    headers = [
        b"WARC/1.0",
        b"WARC-Type: warcinfo",
        b"WARC-Record-ID: " + _record_id(f"warcinfo-{shard}", 0).encode(),
        b"WARC-Date: " + _warc_date(synth.BASE_TS_US).encode(),
        b"Content-Type: application/warc-fields",
        b"Content-Length: " + str(len(body)).encode(),
    ]
    raw = CRLF.join(headers) + CRLF + CRLF + body + CRLF + CRLF
    return gzip.compress(raw, mtime=0)


_CONTENT_TYPES = {"pdf": "application/pdf", "invalid": "application/octet-stream"}


def write_warc_shards(
    sf_dir: str,
    out_dir: str,
    records_per_shard: int = 512,
    pdf_variant: str = "plain",
) -> list[str]:
    """Synthesize pages for every document and write ``*.warc.gz``
    shards — one distributed task per shard, each reading only its
    doc-id range (parquet filter pushdown). Returns shard paths.

    Idempotent per shard: an existing complete shard file is left
    untouched (crash-resume re-writes only missing shards; partial
    files are detected by the ``.tmp`` suffix used during write)."""
    import pyarrow.dataset as pads

    os.makedirs(out_dir, exist_ok=True)
    src = os.path.join(sf_dir, "documents.parquet")
    n_docs = pads.dataset(src).count_rows()
    n_shards = max(1, -(-n_docs // records_per_shard))

    def write_shard(batch: pa.Table) -> pa.Table:
        paths, counts = [], []
        for shard in batch["id"].to_pylist():
            path = os.path.join(out_dir, f"shard-{shard:05d}.warc.gz")
            if os.path.exists(path):
                paths.append(path)
                counts.append(-1)  # already present — resumed over
                continue
            lo = shard * records_per_shard
            docs = (
                pads.dataset(src)
                .to_table(
                    columns=["doc_id", "text", "lang"],
                    filter=(pads.field("doc_id") >= lo)
                    & (pads.field("doc_id") < lo + records_per_shard),
                )
                .sort_by("doc_id")
            )
            buf = io.BytesIO()
            buf.write(_warcinfo(shard, docs.num_rows))
            for doc_id, text, lang in zip(
                docs["doc_id"].to_pylist(),
                docs["text"].to_pylist(),
                docs["lang"].to_pylist(),
            ):
                page = synth.make_page(doc_id, text, lang, pdf_variant)
                kind = synth.payload_kind(doc_id)
                buf.write(
                    warc_record(
                        page["url"],
                        page["warc_ts"],
                        page["html"],
                        lang=lang,
                        content_type=_CONTENT_TYPES.get(kind, "text/html"),
                    )
                )
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(buf.getvalue())
            os.replace(tmp, path)  # atomic publish
            paths.append(path)
            counts.append(docs.num_rows)
        return pa.table(
            {"path": pa.array(paths, pa.string()),
             "n_records": pa.array(counts, pa.int64())}
        )

    written = (
        rd.range(n_shards)
        .repartition(n_shards)  # one task per shard
        .map_batches(write_shard, batch_format="pyarrow")
        .to_pandas()  # n_shards rows — tiny
    )
    return sorted(written["path"].tolist())


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


def _read_headers(stream) -> dict[bytes, bytes] | None:
    """Read WARC header lines up to the blank line; None at EOF."""
    first = stream.readline()
    while first in (CRLF, b"\n"):  # tolerate inter-record padding
        first = stream.readline()
    if not first:
        return None
    if not first.startswith(b"WARC/"):
        raise ValueError(f"not a WARC record header: {first[:40]!r}")
    headers: dict[bytes, bytes] = {}
    while True:
        line = stream.readline()
        if line in (CRLF, b"\n", b""):
            return headers
        k, _, v = line.rstrip(b"\r\n").partition(b":")
        headers[k.strip().lower()] = v.strip()


def _split_http(block: bytes) -> tuple[bytes, str | None]:
    """HTTP response block → (body, content-language). Falls back to
    the raw block when no HTTP status line is present."""
    if not block.startswith(b"HTTP/"):
        return block, None
    head, sep, body = block.partition(CRLF + CRLF)
    if not sep:
        return block, None
    lang = None
    for line in head.split(CRLF)[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-language":
            lang = v.strip().decode("ascii", "replace")
    return body, lang


def iter_warc_records(fileobj):
    """Yield (url, ts_us, payload, lang) response records from a
    ``.warc.gz`` stream — member-at-a-time, constant memory."""
    with gzip.GzipFile(fileobj=fileobj) as gz:
        stream = gz  # GzipFile is a BufferedIOBase: readline works
        while True:
            headers = _read_headers(stream)
            if headers is None:
                return
            length = int(headers[b"content-length"])
            block = stream.read(length)
            if len(block) != length:
                raise ValueError("truncated WARC record block")
            if headers.get(b"warc-type") != b"response":
                continue
            url = headers[b"warc-target-uri"].decode()
            dt = datetime.strptime(
                headers[b"warc-date"].decode(), "%Y-%m-%dT%H:%M:%SZ"
            ).replace(tzinfo=timezone.utc)
            ts_us = int(dt.timestamp() * 1_000_000)
            payload, lang = _split_http(block)
            yield url, ts_us, payload, lang


def _records_table(rows: list[tuple]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "html": pa.array([r[2] for r in rows], pa.binary()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
        }
    )


class WarcDatasource(Datasource):
    """One ReadTask per ``*.warc.gz`` file, yielding CHUNK_ROWS-record
    Arrow tables. ``num_rows`` is unknown up front (None metadata) —
    the executor treats each file as an unsized stream."""

    def __init__(self, paths: list[str]) -> None:
        self.paths = sorted(paths)

    def get_name(self) -> str:
        return "WARC"

    def estimate_inmemory_data_size(self):
        # gz is ~3-4× smaller than the inflated pages
        return sum(os.path.getsize(p) for p in self.paths) * 4

    def get_read_tasks(self, parallelism: int) -> list[ReadTask]:
        tasks = []
        for path in self.paths:

            def read_fn(path: str = path):
                rows: list[tuple] = []
                with open(path, "rb") as f:
                    for rec in iter_warc_records(f):
                        rows.append(rec)
                        if len(rows) >= CHUNK_ROWS:
                            yield _records_table(rows)
                            rows = []
                if rows:
                    yield _records_table(rows)

            meta = BlockMetadata(
                num_rows=None,
                size_bytes=os.path.getsize(path) * 4,
                exec_stats=None,
                input_files=[path],
            )
            tasks.append(ReadTask(read_fn, meta))
        return tasks


def read_warc(path_or_dir: str) -> rd.Dataset:
    """Streaming pages Dataset from a ``*.warc.gz`` file or directory."""
    if os.path.isdir(path_or_dir):
        paths = glob.glob(os.path.join(path_or_dir, "*.warc.gz"))
    else:
        paths = [path_or_dir]
    if not paths:
        raise FileNotFoundError(f"no *.warc.gz under {path_or_dir}")
    return rd.read_datasource(WarcDatasource(paths))


def warc_extract_stats(sf_dir: str) -> pa.Table:
    """Bench/continuity entry: WARC shards → streaming read → flagship
    extraction → per-lang rollup. Shards are written once per corpus
    content under /tmp (same fingerprint discipline as the other /tmp
    caches) so the timed path is read+extract, not synthesis."""
    from ray.data.aggregate import Sum

    from nidaba_ray.functions.dedup import _corpus_fingerprint
    from nidaba_ray.pipelines.extract import extract_pipeline

    fp = hashlib.md5(
        (_corpus_fingerprint(sf_dir) + os.path.realpath(sf_dir)).encode()
    ).hexdigest()[:16]
    shard_dir = f"/tmp/nidaba_ray_warc/{fp}"
    done = os.path.join(shard_dir, "_WARC_DONE")
    if not os.path.exists(done):
        import shutil

        shutil.rmtree(shard_dir, ignore_errors=True)
        write_warc_shards(sf_dir, shard_dir)
        with open(done, "w") as f:
            f.write(fp)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ok = pc.equal(batch["error"], "")
        langs = batch["lang"].to_pylist()
        agg: dict[str, list[int]] = {}
        for lang, is_ok in zip(langs, ok.to_pylist()):
            a = agg.setdefault(lang or "", [0, 0])
            a[0] += 1
            a[1] += 1 if is_ok else 0
        ks = sorted(agg)
        return pa.table(
            {
                "lang": pa.array(ks, pa.string()),
                "n_pages": pa.array([agg[k][0] for k in ks], pa.int64()),
                "n_extracted": pa.array([agg[k][1] for k in ks], pa.int64()),
            }
        )

    return (
        extract_pipeline(read_warc(shard_dir))
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # tiny partials — see queries.q1_pricing_summary
        .groupby("lang")
        .aggregate(Sum("n_pages", alias_name="n_pages"),
                   Sum("n_extracted", alias_name="n_extracted"))
        .sort("lang")
        .to_pandas()
        .pipe(pa.Table.from_pandas, preserve_index=False)
    )
