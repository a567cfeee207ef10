"""Span-record build + serialize roundtrip — analog of nidaba's
tests/test_tei.py (FIXTURES.md F4). No Ray required."""

import json

import pyarrow as pa

from nidaba_ray.record import (
    EXTRACTED_SCHEMA,
    SPAN_SEP,
    SPAN_TYPE,
    SpanRecord,
    assign_offsets,
    record_from_jsonl,
    spans_to_text,
)


def build_record(lang="en"):
    rec = SpanRecord(url="https://x.example.com/doc-1", lang=lang)
    rec.add_span("h1", 2, "Title text")
    rec.add_span("p", 3, "First paragraph of content.")
    rec.add_span("p", 3, "Second paragraph.")
    rec.add_respstmt("extract", "html")
    rec.add_respstmt("threshold", "otsu")
    return rec


def test_text_serialization_reading_order():
    rec = build_record()
    assert rec.text() == (
        "Title text" + SPAN_SEP + "First paragraph of content." + SPAN_SEP + "Second paragraph."
    )


def test_jsonl_roundtrip_identical():
    rec = build_record()
    from dataclasses import asdict

    spans = assign_offsets([asdict(s) for s in rec.spans])
    for s, d in zip(rec.spans, spans):
        s.start, s.end = d["start"], d["end"]
    line = rec.to_jsonl()
    back = record_from_jsonl(line)
    assert back.url == rec.url and back.lang == rec.lang
    assert back.provenance == rec.provenance
    assert [s.text for s in back.spans] == [s.text for s in rec.spans]
    assert back.to_jsonl() == line  # byte-identical roundtrip


def test_assign_offsets_slice_back():
    from dataclasses import asdict

    rec = build_record()
    spans = assign_offsets([asdict(s) for s in rec.spans])
    text = spans_to_text(spans)
    for s in spans:
        assert text[s["start"] : s["end"]] == s["text"]


def test_arrow_schema_roundtrip():
    from dataclasses import asdict

    rec = build_record()
    spans = assign_offsets([asdict(s) for s in rec.spans])
    t = pa.table(
        {
            "url": pa.array([rec.url]),
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "lang": pa.array([rec.lang]),
            "spans": pa.array([spans], SPAN_TYPE),
            "text": pa.array([spans_to_text(spans)]),
            "provenance": pa.array(
                [[{"stage": s, "variant": v} for s, v in rec.provenance]],
                EXTRACTED_SCHEMA.field("provenance").type,
            ),
        }
    )
    assert t.schema.equals(EXTRACTED_SCHEMA)
    got = t["spans"].to_pylist()[0]
    assert [s["text"] for s in got] == [s.text for s in rec.spans]


def test_jsonl_deterministic():
    a, b = build_record(), build_record()
    assert a.to_jsonl() == b.to_jsonl()
    d = json.loads(a.to_jsonl())
    assert list(d) == sorted(d)  # sorted keys → stable bytes
