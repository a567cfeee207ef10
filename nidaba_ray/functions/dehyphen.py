"""Line-break dehyphenation — the PDF-corpus fixup (print layouts
hyphenate at column edges; naive text extraction keeps ``exam-\\nple``
as two tokens and wrecks token statistics downstream).

Parity contract: ONE pattern, identical bytes on both engines
(Python ``re.sub`` and DuckDB ``regexp_replace(..., 'g')`` — RE2-safe,
no lookbehind). The rule is deliberately conservative: join only when
a lowercase letter precedes ``-`` + newline (optional spaces) + a
lowercase letter follows — "Boat-\\nbuilding" (capital continuation,
likely a true compound or a proper noun) and numeric ranges are left
alone. Words hyphenated ACROSS pages or soft-hyphen codepoints are a
different fixup and out of scope here."""

from __future__ import annotations

import re

import pyarrow as pa

__all__ = ["DEHYPHEN_PATTERN", "dehyphenate", "dehyphenate_batch",
           "dehyphen_sql_expr"]

DEHYPHEN_PATTERN = r"([a-z])-\n[ \t]*([a-z])"

_DEHYPHEN_RE = re.compile(DEHYPHEN_PATTERN)


def dehyphenate(text: str) -> str:
    return _DEHYPHEN_RE.sub(r"\1\2", text)


def dehyphenate_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Registry stage (``clean.dehyphenate``): rewrite ``column`` in
    place; rows without a newline-adjacent hyphen are untouched."""
    texts = batch[column].to_pylist()
    out = [dehyphenate(t) if t is not None and "-\n" in t else t
           for t in texts]
    idx = batch.column_names.index(column)
    return batch.set_column(idx, column, pa.array(out, pa.string()))


def dehyphen_sql_expr(column: str = "text") -> str:
    pat = DEHYPHEN_PATTERN.replace("'", "''").replace("\n", "\\n")
    return f"regexp_replace({column}, '{pat}', '\\1\\2', 'g')"
