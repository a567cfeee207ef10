"""Span-record data model + serializers — the OCRRecord / tei.py analog.

nidaba's central structured intermediate is an lxml tree
page → zones → lines → segments → graphemes with per-node bbox, text,
confidence and responsibility statements (nidaba/tei.py:≈1-1400,
UNVERIFIED per SURVEY.md §0). Ours is columnar: one row per page, the
hierarchy flattened into an Arrow ``list<struct>`` spans column whose
intrinsic order is DOM reading order, plus a ``provenance``
list<struct> column (the respstmt analog).

Serializers (the write_tei/write_hocr/write_text analogs):
    spans_to_text   canonical plain-text concatenation (reading order)
    spans_to_jsonl  JSON dump of the span list (debug/interop sink)
    record round-trip: build → serialize → parse → identical (tests).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, asdict

import pyarrow as pa

__all__ = [
    "SPAN_STRUCT",
    "SPAN_TYPE",
    "PROVENANCE_STRUCT",
    "EXTRACTED_SCHEMA",
    "Span",
    "SpanRecord",
    "spans_to_text",
    "spans_to_jsonl",
    "record_from_jsonl",
]

# Arrow types — fixed schema, no inference (the XML-dialect analog).
SPAN_STRUCT = pa.struct(
    [
        ("block_id", pa.int32()),
        ("kind", pa.string()),          # p / h1..h6 / li / td / pre / div / pdf
        ("depth", pa.int32()),          # DOM depth (bbox-geometry analog)
        ("text_density", pa.float32()),
        ("link_density", pa.float32()),
        ("score", pa.float32()),
        ("text", pa.string()),
        ("start", pa.int64()),          # char offsets into the canonical text
        ("end", pa.int64()),
    ]
)
SPAN_TYPE = pa.list_(SPAN_STRUCT)

PROVENANCE_STRUCT = pa.struct([("stage", pa.string()), ("variant", pa.string())])

# The `extracted` intermediate table (SURVEY.md §1.2).
EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("spans", SPAN_TYPE),
        ("text", pa.string()),
        ("provenance", pa.list_(PROVENANCE_STRUCT)),
    ]
)

# Canonical separator between kept spans in the serialized text. A single
# space keeps byte-identity trivially checkable against sources whose
# ground truth is single-space tokenized; reading order is the span order.
SPAN_SEP = " "


@dataclass
class Span:
    block_id: int
    kind: str
    depth: int
    text: str
    text_density: float = 0.0
    link_density: float = 0.0
    score: float = 0.0
    start: int = -1
    end: int = -1


@dataclass
class SpanRecord:
    """Python-side record builder (tests / small fixtures); the hot path
    never materializes these — stages operate on Arrow columns directly.
    """

    url: str
    lang: str = ""
    warc_ts: int = 0  # microseconds since epoch
    spans: list[Span] = field(default_factory=list)
    provenance: list[tuple[str, str]] = field(default_factory=list)

    def add_span(self, kind: str, depth: int, text: str, **kw) -> Span:
        s = Span(block_id=len(self.spans), kind=kind, depth=depth, text=text, **kw)
        self.spans.append(s)
        return s

    def add_respstmt(self, stage: str, variant: str) -> None:
        """Responsibility statement — lineage of which stage/variant
        produced this record (nidaba tei.add_respstmt analog)."""
        self.provenance.append((stage, variant))

    def text(self) -> str:
        return spans_to_text([asdict(s) for s in self.spans])

    def to_jsonl(self) -> str:
        return spans_to_jsonl(self.url, self.lang, [asdict(s) for s in self.spans],
                              [{"stage": s, "variant": v} for s, v in self.provenance])


def spans_to_text(spans: list[dict]) -> str:
    """Canonical serialization: kept spans joined in reading order.

    Analog of output.tei2txt (reading-order concatenation)."""
    return SPAN_SEP.join(s["text"] for s in spans)


def assign_offsets(spans: list[dict]) -> list[dict]:
    """Fill start/end char offsets of each span inside the canonical
    text produced by :func:`spans_to_text` (the bbox analog)."""
    pos = 0
    for s in spans:
        s["start"] = pos
        s["end"] = pos + len(s["text"])
        pos = s["end"] + len(SPAN_SEP)
    return spans


def spans_to_jsonl(url: str, lang: str, spans: list[dict],
                   provenance: list[dict],
                   warc_ts_us: int | None = None) -> str:
    """One JSON object per record — the hOCR/ALTO-dialect analog sink.
    ``warc_ts_us`` (epoch microseconds) rides along when the source
    carried a crawl timestamp, so a JSONL re-ingest keeps the
    keep-latest tie-break usable."""
    d = {"url": url, "lang": lang, "spans": spans, "provenance": provenance}
    if warc_ts_us is not None:
        d["warc_ts_us"] = int(warc_ts_us)
    return json.dumps(
        d, sort_keys=True, ensure_ascii=False, separators=(",", ":"),
    )


def record_from_jsonl(line: str) -> SpanRecord:
    d = json.loads(line)
    rec = SpanRecord(url=d["url"], lang=d["lang"])
    for s in d["spans"]:
        rec.spans.append(Span(**{k: s[k] for k in (
            "block_id", "kind", "depth", "text", "text_density",
            "link_density", "score", "start", "end")}))
    rec.provenance = [(p["stage"], p["variant"]) for p in d["provenance"]]
    return rec
