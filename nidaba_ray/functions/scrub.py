"""PII scrubbing — replace emails / IPv4 addresses / phone numbers
with placeholder tokens (driver instruction: training-data-pipeline
ops are first-class; the redact-with-placeholder approach and these
three categories follow the public C4/CCNet/Dolma cleaning recipes).

Scale notes: pure per-batch Arrow RE2 kernels
(``pc.replace_substring_regex``) — no Python per-row loop, no state,
no shuffle; the stage streams. DuckDB's ``regexp_replace`` is also
RE2, so the pytest oracle (tests/test_scrub_paradedup.py) checks
byte parity of the exact same pattern list on both engines.

Pattern order is part of the contract: emails first (so the
user@host digits are gone before the phone pattern runs), then IPv4
(so dotted quads don't half-match as phones), then phones.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# (pattern, replacement) in application order. RE2-safe: no
# backrefs/lookaround, identical semantics in Arrow and DuckDB.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\-() ]{6,}\d", "<PHONE>"),
)


def scrub_text_column(col: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    """Apply the PII pattern list to one string column (Arrow RE2)."""
    for pattern, repl in PII_PATTERNS:
        col = pc.replace_substring_regex(col, pattern=pattern, replacement=repl)
    return col


def scrub_pii_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """map_batches kernel: replace ``column`` with its scrubbed form."""
    return batch.set_column(
        batch.schema.get_field_index(column), column,
        scrub_text_column(batch[column]),
    )


def scrub_pii(sf_dir: str) -> rd.Dataset:
    """(doc_id, text) with PII placeholders substituted."""
    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(scrub_pii_batch, batch_format="pyarrow")


def scrub_sql_expr(column: str = "text") -> str:
    """The DuckDB expression equivalent to ``scrub_text_column`` —
    built from the SAME pattern list so the two sides cannot drift."""
    expr = column
    for pattern, repl in PII_PATTERNS:
        p = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return expr
