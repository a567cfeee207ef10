"""Typography normalization — the ASCII-punctuation canonicalization
every tokenizer-facing pipeline runs (curly quotes, typographic
dashes, ellipsis, exotic spaces): rendered text keeps its meaning,
token statistics stop fragmenting on Unicode punctuation variants.

Parity contract: the mapping is ONE explicit table shared by the
Python kernel and the DuckDB replay (chained ``replace`` calls built
from the same constant — the scrub_pii idiom), so the sides cannot
drift. Multi-char expansions (ellipsis → three dots, em-dash → comma
dash? no — em-dash stays a plain dash) are plain str.replace, applied
in the table's fixed order. NFC is untouched: every source char here
is its own NFC form, so the sanitize invariant (Unicode pinned to
NFC) still holds after rewriting.

Deliberately NOT included: single ASCII apostrophe vs prime
disambiguation (needs language context) and full-width CJK forms
(meaningful in CJK text — folding them would damage zh/ja documents).
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["TYPOGRAPHY_MAP", "normalize_typography",
           "typography_batch", "typography_sql_expr"]

# (source, replacement) in application order. Sources are single
# chars except the ellipsis handling; replacements are ASCII.
TYPOGRAPHY_MAP: tuple[tuple[str, str], ...] = (
    ("‘", "'"),   # left single quote
    ("’", "'"),   # right single quote / apostrophe
    ("‚", "'"),   # low-9 single quote
    ("“", '"'),   # left double quote
    ("”", '"'),   # right double quote
    ("„", '"'),   # low-9 double quote
    ("«", '"'),   # «
    ("»", '"'),   # »
    ("‹", "'"),   # ‹
    ("›", "'"),   # ›
    ("–", "-"),   # en dash
    ("—", "-"),   # em dash
    ("―", "-"),   # horizontal bar
    ("−", "-"),   # minus sign
    ("…", "..."),  # ellipsis
    (" ", " "),   # no-break space
    (" ", " "),   # thin space
    (" ", " "),   # narrow no-break space
    ("​", ""),    # zero-width space
    ("﻿", ""),    # zero-width no-break space / stray BOM
)


def normalize_typography(text: str) -> str:
    for src, dst in TYPOGRAPHY_MAP:
        if src in text:
            text = text.replace(src, dst)
    return text


def typography_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Registry stage (``clean.typography``): rewrite ``column`` in
    place. A vectorized non-ASCII prescreen (the mojibake idiom) makes
    pure-ASCII rows free."""
    import pyarrow.compute as pc

    texts = batch[column]
    if batch.num_rows and pc.min(
        pc.equal(pc.utf8_length(texts), pc.binary_length(texts))
    ).as_py():
        return batch  # pure-ASCII batch: nothing to rewrite
    out = [normalize_typography(t) if t is not None else None
           for t in texts.to_pylist()]
    idx = batch.column_names.index(column)
    return batch.set_column(idx, column, pa.array(out, pa.string()))


def typography_sql_expr(column: str = "text") -> str:
    """The SAME table as chained DuckDB replace() calls (byte
    parity)."""
    expr = column
    for src, dst in TYPOGRAPHY_MAP:
        s = src.replace("'", "''")
        d = dst.replace("'", "''")
        expr = f"replace({expr}, '{s}', '{d}')"
    return expr
