"""PDF text extraction — the heavy-recognizer analog (ocr.kraken,
nidaba/plugins/kraken.py, UNVERIFIED per SURVEY.md §0).

The sandbox has no PDF library (SURVEY.md env pins), so the decoder
handles exactly the deterministic subset emitted by
``synth.make_pdf`` — `(..) Tj` show-text operators with standard PDF
string escapes. The Ray-side plumbing (magic sniff, actor-pool stage,
schema, error isolation) is real; a production build swaps
``extract_pdf_text`` for a real parser behind the same contract.
"""

from __future__ import annotations

import re

__all__ = ["is_pdf", "extract_pdf_blocks", "PDF_MAGIC"]

PDF_MAGIC = b"%PDF-"

# (string) Tj — PDF literal string with \-escapes, non-greedy balanced-free
_TJ = re.compile(rb"\(((?:\\.|[^()\\])*)\)\s*Tj")
_UNESC = re.compile(rb"\\(.)")


def is_pdf(payload: bytes) -> bool:
    return payload[: len(PDF_MAGIC)] == PDF_MAGIC


def _unescape(m: re.Match) -> bytes:
    return m.group(1)


def extract_pdf_blocks(payload: bytes) -> list[str]:
    """All show-text strings in stream order (one block per Tj op)."""
    out = []
    for m in _TJ.finditer(payload):
        raw = _UNESC.sub(_unescape, m.group(1))
        out.append(raw.decode("utf-8", errors="replace"))
    return out
