"""WARC sink/source: record roundtrip, shard streaming, resume, and
byte-identity of extraction over the real archive format."""

from __future__ import annotations

import gzip
import io
import re

import pyarrow as pa
import pytest

from nidaba_ray import synth
from nidaba_ray.sources import warc

SF = "/root/testdata/sf0.001"


def test_record_roundtrip_unit():
    payload = "<html><body><p>hello wörld</p></body></html>".encode()
    rec = warc.warc_record(
        "https://example.org/doc-7", synth.BASE_TS_US + 7_000_000,
        payload, lang="de",
    )
    # independently-valid gzip member
    assert gzip.decompress(rec).startswith(b"WARC/1.0\r\n")
    got = list(warc.iter_warc_records(io.BytesIO(rec)))
    assert got == [
        ("https://example.org/doc-7", synth.BASE_TS_US + 7_000_000,
         payload, "de")
    ]


def test_member_concatenation_and_warcinfo_skip():
    recs = [
        warc._warcinfo(0, 2),
        warc.warc_record("https://a/doc-1", synth.BASE_TS_US, b"<p>a</p>"),
        warc.warc_record("https://a/doc-2", synth.BASE_TS_US, b"<p>b</p>",
                         lang="en"),
    ]
    got = list(warc.iter_warc_records(io.BytesIO(b"".join(recs))))
    assert [g[0] for g in got] == ["https://a/doc-1", "https://a/doc-2"]
    assert got[0][3] is None and got[1][3] == "en"


def test_truncated_record_raises():
    rec = warc.warc_record("https://a/doc-1", synth.BASE_TS_US, b"x" * 100)
    raw = gzip.decompress(rec)[:-60]  # cut into the block
    with pytest.raises(ValueError):
        list(warc.iter_warc_records(io.BytesIO(gzip.compress(raw))))


@pytest.fixture(scope="module")
def shard_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    paths = warc.write_warc_shards(SF, str(d), records_per_shard=300)
    assert len(paths) == 2  # 500 docs / 300
    return d


def test_shard_write_deterministic_and_resumable(shard_dir, ray_session):
    p0 = shard_dir / "shard-00000.warc.gz"
    before = p0.read_bytes()
    p0.unlink()
    paths = warc.write_warc_shards(SF, str(shard_dir), records_per_shard=300)
    assert len(paths) == 2
    assert p0.read_bytes() == before  # rewrite is byte-identical
    # untouched shards were resumed over, not rewritten
    assert (shard_dir / "shard-00001.warc.gz").read_bytes() != b""


def test_read_streams_in_chunks(shard_dir):
    task = warc.WarcDatasource(
        [str(shard_dir / "shard-00000.warc.gz")]
    ).get_read_tasks(1)[0]
    chunks = list(task.read_fn())
    assert len(chunks) == 2  # 300 records / CHUNK_ROWS=256
    assert sum(c.num_rows for c in chunks) == 300
    assert chunks[0].schema.names == ["url", "warc_ts", "html", "lang"]


def test_warc_extraction_byte_identity(shard_dir, ray_session):
    """read_warc → extract_pipeline reproduces documents.text
    byte-identically per url — with NO ground-truth text column in the
    archive (the real-ingest condition)."""
    import duckdb

    from nidaba_ray.pipelines.extract import extract_pipeline

    def with_doc_id(batch: pa.Table) -> pa.Table:
        ids = [int(re.search(r"/doc-(\d+)$", u).group(1))
               for u in batch["url"].to_pylist()]
        return batch.append_column("doc_id", pa.array(ids, pa.int64()))

    out = (
        extract_pipeline(warc.read_warc(str(shard_dir)))
        .map_batches(with_doc_id, batch_format="pyarrow")
        .to_pandas()[["doc_id", "text", "error", "lang"]]
    )
    con = duckdb.connect()
    con.register("r", out)
    mism, quar, n = con.execute(
        """
        SELECT count(*) FILTER (WHERE r.error='' AND r.text<>d.text),
               count(*) FILTER (WHERE r.error<>''),
               count(*)
        FROM r JOIN read_parquet($p) d USING (doc_id)
        """,
        {"p": f"{SF}/documents.parquet"},
    ).fetchone()
    assert n == 500
    assert mism == 0
    assert quar == sum(1 for i in range(500) if i % 97 == 13)
    # Content-Language header round-trips into the lang passthrough
    assert set(out["lang"].unique()) == {"en", "de", "es", "fr", "zh"}


def test_warc_extract_stats_rollup(shard_dir, ray_session, monkeypatch):
    # point the /tmp cache at the already-written fixture shards
    monkeypatch.setattr(
        warc, "write_warc_shards",
        lambda *a, **k: pytest.fail("cache miss: shards re-synthesized"),
    )
    import os
    import shutil

    import hashlib as _h

    from nidaba_ray.functions.dedup import _corpus_fingerprint

    fp = _h.md5(
        (_corpus_fingerprint(SF) + os.path.realpath(SF)).encode()
    ).hexdigest()[:16]
    cache = f"/tmp/nidaba_ray_warc/{fp}"
    shutil.rmtree(cache, ignore_errors=True)
    os.makedirs(cache)
    for p in shard_dir.glob("*.warc.gz"):
        shutil.copy(p, cache)
    with open(f"{cache}/_WARC_DONE", "w") as f:
        f.write(fp)
    t = warc.warc_extract_stats(SF)
    assert t.column_names == ["lang", "n_pages", "n_extracted"]
    assert sum(t["n_pages"].to_pylist()) == 500
    # quarantined rows are counted but not extracted
    assert sum(t["n_extracted"].to_pylist()) == 500 - sum(
        1 for i in range(500) if i % 97 == 13
    )
