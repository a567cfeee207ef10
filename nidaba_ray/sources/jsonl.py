"""JSONL extracted-record source — the read side of the
``output.jsonl`` serializer (stages/serialize.to_jsonl_rows), closing
the sink/source duality: a pipeline can consume a previous run's JSONL
export exactly like its parquet output.

Shape: ``ray.data.read_json`` streams the files; a vectorized
``map_batches`` parses each record string back into the canonical
columns (url, lang, text, spans, provenance) with the same Arrow
schema the pipeline emits — so any downstream stage (serializers,
quality scorer, host stats) runs unchanged on re-ingested data.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data as rd

from nidaba_ray.record import PROVENANCE_STRUCT, SPAN_SEP, SPAN_TYPE

__all__ = ["records_from_json_column", "read_extracted_jsonl"]


def records_from_json_column(batch: pa.Table, column: str = "json") -> pa.Table:
    """Parse serialized record strings back into canonical columns.
    The ``text`` column is reconstructed from the kept spans (the
    reading-order join the pipeline itself produces); ``warc_ts`` is
    restored (null for records serialized without one) so downstream
    keep-latest logic still works on re-ingested data."""
    urls, langs, texts, spans_col, provs, tss = [], [], [], [], [], []
    for line in batch[column].to_pylist():
        d = json.loads(line)
        urls.append(d["url"])
        langs.append(d.get("lang", ""))
        spans = d.get("spans") or []
        spans_col.append(spans)
        texts.append(SPAN_SEP.join(s["text"] for s in spans))
        provs.append(d.get("provenance") or [])
        tss.append(d.get("warc_ts_us"))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
            "lang": pa.array(langs, pa.string()),
            "text": pa.array(texts, pa.string()),
            "spans": pa.array(spans_col, SPAN_TYPE),
            "provenance": pa.array(provs, pa.list_(PROVENANCE_STRUCT)),
        }
    )


def read_extracted_jsonl(path: str) -> rd.Dataset:
    """Stream a JSONL export back as a canonical extracted Dataset."""
    return rd.read_json(path).map_batches(
        records_from_json_column, batch_format="pyarrow"
    )
