"""Typography normalization (functions/typography.py): byte parity
with the DuckDB chained-replace replay, NFC preservation, ASCII
fast path, CJK non-folding."""

from __future__ import annotations

import unicodedata

import duckdb
import pyarrow as pa

from nidaba_ray.functions.typography import (
    TYPOGRAPHY_MAP,
    normalize_typography,
    typography_batch,
    typography_sql_expr,
)

SAMPLES = [
    "“Smart quotes” and ‘singles’ — with an em—dash and ellipsis…",
    "Temperature range −5 to 12 °C – see the notes.",
    "Zero​width and ﻿BOM chars vanish; «guillemets» fold.",
    "Plain ASCII stays byte-identical, naturally.",
    "全角はそのまま：「こう」です。",  # CJK quotes untouched
    "",
]


def test_duckdb_parity():
    con = duckdb.connect()
    con.register("t", pa.table({"text": pa.array(SAMPLES, pa.string())}))
    want = [r[0] for r in con.execute(
        f"SELECT {typography_sql_expr('text')} FROM t").fetchall()]
    got = [normalize_typography(s) for s in SAMPLES]
    assert got == want


def test_expected_rewrites():
    out = normalize_typography(SAMPLES[0])
    assert out == ('"Smart quotes" and \'singles\' - with an em-dash '
                   'and ellipsis...')
    assert normalize_typography("a b c") == "a b c"
    assert normalize_typography("x​y") == "xy"  # zero-width dropped


def test_nfc_preserved():
    for s in SAMPLES:
        out = normalize_typography(s)
        assert unicodedata.normalize("NFC", out) == out


def test_cjk_untouched():
    assert normalize_typography(SAMPLES[4]) == SAMPLES[4]


def test_batch_stage_and_ascii_fast_path():
    b = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["plain ascii", "curly “x”"])})
    out = typography_batch(b)
    assert out["text"].to_pylist() == ["plain ascii", 'curly "x"']
    assert out["doc_id"].to_pylist() == [0, 1]
    # pure-ASCII batch returns the input table object untouched
    b2 = pa.table({"text": pa.array(["abc", "def"])})
    assert typography_batch(b2) is b2


def test_registered():
    from nidaba_ray.stages.registry import list_stages

    assert "clean.typography" in list_stages()
