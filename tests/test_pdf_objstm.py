"""PDF object-stream expansion (stages/pdf.py round 5): font dicts
compressed into /Type /ObjStm resolve per-font; /Type /XRef streams
are structure, never content; malformed object streams degrade
gracefully."""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nidaba_ray import synth
from nidaba_ray.stages import pdf as P


@given(st.lists(st.sampled_from(
    [f"w{i}" for i in range(30)]
    + ["(p)", ")q(", "a\\b", "ü", "—", "€", "北京", "😀", "café"]
), min_size=1, max_size=120))
@settings(max_examples=40, deadline=None)
def test_objstm_twofont_roundtrip_property(tokens):
    """The two-overlapping-fonts document with its font dicts packed
    in an ObjStm round-trips byte-exactly — only possible when the
    expansion recovers the per-font structure."""
    text = " ".join(tokens)
    got = " ".join(P.extract_pdf_blocks(synth.make_pdf_objstm(7, text)))
    assert got == text


def test_objstm_expansion_is_load_bearing(monkeypatch):
    """Without expansion the overlapping code spaces collide under the
    merged document-level fallback — proves the ObjStm path does real
    work, not incidental parsing."""
    text = "mixed fonts: café — 北京 ü €uro abcdef"
    doc = synth.make_pdf_objstm(7, text)
    assert " ".join(P.extract_pdf_blocks(doc)) == text
    monkeypatch.setattr(P, "_expand_object_streams", lambda p: p)
    assert " ".join(P.extract_pdf_blocks(doc)) != text


def test_xref_stream_never_leaks_into_content():
    """make_pdf_objstm's cross-reference stream deliberately inflates
    to bytes that LOOK like a text object; /Type /XRef must keep it
    out of the content pass."""
    doc = synth.make_pdf_objstm(3, "only real content")
    got = " ".join(P.extract_pdf_blocks(doc))
    assert "xref soup" not in got
    assert got == "only real content"


def test_objstm_body_never_parsed_as_content():
    """An ObjStm whose dict strings contain content-operator lookalikes
    stays out of the content pass (it is expanded, not parsed)."""
    inner = b"<< /Fake (BT (objstm soup) Tj ET) >>"
    header = b"5 0 "
    body = header + inner
    comp = zlib.compress(body)
    doc = (
        b"%PDF-1.5\n"
        b"20 0 obj << /Type /ObjStm /N 1 /First "
        + str(len(header)).encode() + b" /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode >> stream\n" + comp
        + b"\nendstream endobj\n"
        b"3 0 obj << /Length 20 >> stream\nBT (real text) Tj ET\n"
        b"endstream endobj\n%%EOF\n"
    )
    assert P.extract_pdf_blocks(doc) == ["real text"]


@pytest.mark.parametrize("dict_src", [
    b"/Type /ObjStm /First 4",                      # missing /N
    b"/Type /ObjStm /N 2",                          # missing /First
    b"/Type /ObjStm /N 9 /First 4",                 # header too short
    b"/Type /ObjStm /N 1 /First 99999",             # /First beyond body
])
def test_malformed_objstm_degrades(dict_src):
    comp = zlib.compress(b"5 0 << /X 1 >>")
    doc = (
        b"%PDF-1.5\n20 0 obj << " + dict_src
        + b" /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode >> stream\n" + comp
        + b"\nendstream endobj\n"
        b"3 0 obj << /Length 18 >> stream\nBT (content) Tj ET\n"
        b"endstream endobj\n%%EOF\n"
    )
    # never raises; the real content still extracts
    assert P.extract_pdf_blocks(doc) == ["content"]


def test_objstm_nonint_header_degrades():
    comp = zlib.compress(b"x y << /A 1 >>")
    doc = (
        b"%PDF-1.5\n20 0 obj << /Type /ObjStm /N 1 /First 4 /Length "
        + str(len(comp)).encode()
        + b" /Filter /FlateDecode >> stream\n" + comp
        + b"\nendstream endobj\n%%EOF\n"
    )
    assert P.extract_pdf_blocks(doc) == []


def test_expand_noop_fast_path():
    doc = b"%PDF-1.4 no object streams here"
    assert P._expand_object_streams(doc) is doc
