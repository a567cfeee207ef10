"""BOM and UTF-16 payload decode (stages/extract.py round-5 session-7):
UTF-8 BOM strips, UTF-16 LE/BE BOM decode, BOM-less UTF-16 via the
NUL-stripe heuristic (gated on html structure), UTF-32 quarantines."""

from __future__ import annotations

from nidaba_ray.stages.extract import extract_row

PAGE = ("<html><head><title>t</title></head><body>"
        "<p>Byte order marks should never change the extracted text "
        "of a page, only how its bytes decode.</p>"
        "<p>Zwölf Boxkämpfer jagen Viktor quer über den Sylter Deich "
        "— ützliche Prüfung für Umlaute.</p>"
        "</body></html>")


def _texts(payload: bytes):
    kind, spans, err = extract_row(payload)
    assert err == "" and kind == "html", (kind, err)
    return [s["text"] for s in spans]


def test_utf8_bom_strips():
    base = _texts(PAGE.encode("utf-8"))
    assert _texts(b"\xef\xbb\xbf" + PAGE.encode("utf-8")) == base
    assert base  # non-empty


def test_utf16_le_be_bom_decode():
    base = _texts(PAGE.encode("utf-8"))
    # encode('utf-16') emits a LE BOM; build BE explicitly
    assert _texts(PAGE.encode("utf-16")) == base
    assert _texts(b"\xfe\xff" + PAGE.encode("utf-16-be")) == base


def test_bomless_utf16_both_endians():
    base = _texts(PAGE.encode("utf-8"))
    assert _texts(PAGE.encode("utf-16-le")) == base
    assert _texts(PAGE.encode("utf-16-be")) == base


def test_bomless_utf16_without_html_marker_quarantines():
    # NUL-dense but no html structure after decode → not sniffed
    kind, spans, err = extract_row("just some words".encode("utf-16-le"))
    assert kind == "invalid"


def test_utf32_quarantines():
    # 'utf-32' emits the FF FE 00 00 BOM → named quarantine reason
    kind, spans, err = extract_row(PAGE.encode("utf-32"))
    assert kind == "invalid" and "utf-32" in err
    # BOM-less utf-32-le quarantines through the generic gate
    kind, spans, err = extract_row(PAGE.encode("utf-32-le"))
    assert kind == "invalid"


def test_corrupt_utf16_quarantines():
    payload = b"\xff\xfe" + b"\x41\x00\x42"  # odd tail byte
    kind, spans, err = extract_row(payload)
    assert kind == "invalid" and "utf-16" in err


def test_utf16_feed_decodes_too():
    feed = ("<?xml version='1.0'?><rss version='2.0'><channel>"
            "<title>Chan</title><item><title>Item one</title>"
            "<description>Body text here.</description></item>"
            "</channel></rss>")
    kind, spans, err = extract_row(feed.encode("utf-16"))
    assert kind == "feed" and [s["text"] for s in spans] == [
        "Chan", "Item one", "Body text here."]
