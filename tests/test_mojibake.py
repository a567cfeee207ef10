"""Mojibake repair pins: synthesized-corruption reversal (single and
double encoding, hypothesis fuzz), sloppy-codec inverse property,
ASCII fast path, non-reversible text untouched, and the registry
stage."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from nidaba_ray.functions.mojibake import (
    _sloppy_decode,
    _sloppy_encode,
    fix_mojibake,
    fix_mojibake_column,
    mojibake_fix_batch,
)


def test_classic_sequences():
    assert fix_mojibake("cafÃ©") == "café"
    assert fix_mojibake("donâ€™t") == "don’t"
    assert fix_mojibake("naÃ¯ve rÃ©sumÃ©") == "naïve résumé"


def test_sloppy_codec_is_inverse_on_all_bytes():
    allb = bytes(range(256))
    assert _sloppy_encode(_sloppy_decode(allb)) == allb


def test_double_encoding_repairs_in_two_rounds():
    orig = "héllo — “quoted” …"
    once = _sloppy_decode(orig.encode("utf-8"))
    twice = _sloppy_decode(once.encode("utf-8"))
    assert fix_mojibake(once) == orig
    assert fix_mojibake(twice) == orig


def test_untouchable_text_passes_through():
    # pure ASCII: prescreen short-circuits
    assert fix_mojibake("plain ascii text") == "plain ascii text"
    # CJK / astral codepoints can't be cp1252 bytes — no rewrite
    assert fix_mojibake("日本語テキスト") == "日本語テキスト"
    assert fix_mojibake("emoji 🙂 stays") == "emoji 🙂 stays"
    # Latin-1 text that is NOT valid UTF-8 stays (ö alone = 0xF6)
    assert fix_mojibake("schön") == "schön"
    # genuine C1 controls are NOT encodable in sloppy-cp1252 (only the
    # five holes are): 'Â'+NEL must not collapse to a bare NEL
    # (review finding, session 4 — a blanket Latin-1 fallback would)
    assert fix_mojibake("Â") == "Â"


def test_idempotent_on_fixed_output():
    orig = "héllo — “quoted” …"
    fixed = fix_mojibake(_sloppy_decode(orig.encode("utf-8")))
    assert fix_mojibake(fixed) == fixed


_texty = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "S", "Z")
    ),
    max_size=40,
)


@settings(max_examples=300, deadline=None)
@given(_texty)
def test_fuzz_corruption_reverses(orig):
    """Single-round reversal is EXACT for any synthesized corruption.
    (At the default max_rounds=2 an original that itself reads as
    mojibake — e.g. a page ABOUT mojibake containing "Ã©" — would be
    over-fixed; that ambiguity is inherent to double-encoding repair
    and documented in the module docstring, so the fuzz pins the
    one-round contract.)"""
    corrupt = _sloppy_decode(orig.encode("utf-8"))
    assert fix_mojibake(corrupt, max_rounds=1) == orig


def test_column_and_stage():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["cafÃ©", "plain", None], pa.string()),
        }
    )
    out = mojibake_fix_batch(batch)
    assert out["text"].to_pylist() == ["café", "plain", None]
    assert out.column_names == batch.column_names
    col = fix_mojibake_column(pa.chunked_array([["Ã©"], ["ok"]]))
    assert col.to_pylist() == ["é", "ok"]


def test_registered_stage_compiles():
    from nidaba_ray.stages.registry import get_stage

    assert get_stage("clean.mojibake").fn is mojibake_fix_batch
