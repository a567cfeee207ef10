"""DOM segmentation + scoring/threshold kernels (the binarize/segment
analogs). No Ray required."""

import numpy as np

from nidaba_ray.stages.score import (
    block_features,
    block_scores,
    keep_global_otsu,
    keep_local_sauvola,
    otsu_threshold,
    smooth_scores,
)
from nidaba_ray.stages.segment import segment_html
from nidaba_ray.stages.pdf import extract_pdf_blocks, is_pdf
from nidaba_ray import synth


HTML = (
    "<html><head><title>t</title><style>p{color:red}</style></head><body>"
    '<header><nav><ul><li><a href="/">Home</a></li><li><a href="/b">Blog</a></li></ul></nav></header>'
    "<main><p>Main content paragraph with plenty of words in it for scoring.</p>"
    "<p>Another solid paragraph of real content text right here.</p></main>"
    '<aside><ul><li><a href="/t">Trending 9</a></li></ul></aside>'
    '<footer><p><a href="/p">Privacy</a> © 2024</p></footer></body></html>'
)


def test_segment_blocks_reading_order():
    blocks = segment_html(HTML)
    texts = [b.text for b in blocks]
    assert "Home" in texts and "Blog" in texts
    i_main = texts.index("Main content paragraph with plenty of words in it for scoring.")
    i_other = texts.index("Another solid paragraph of real content text right here.")
    assert i_main < i_other  # reading order preserved
    assert "t" not in texts  # <title> inside head skipped
    assert not any("color:red" in t for t in texts)  # style skipped


def test_segment_chrome_and_anchors():
    blocks = segment_html(HTML)
    by_text = {b.text: b for b in blocks}
    assert by_text["Home"].in_chrome
    assert by_text["Home"].anchor_chars == len("Home")
    main = by_text["Main content paragraph with plenty of words in it for scoring."]
    assert not main.in_chrome and main.anchor_chars == 0


def test_segment_tag_soup_does_not_raise():
    blocks = segment_html("<p>unclosed <b>bold <p>next</i> para</div>")
    assert any("unclosed" in b.text for b in blocks)
    assert any("next" in b.text for b in blocks)


def test_segment_entities_and_whitespace():
    blocks = segment_html("<p>a &amp; b\n\n   c</p>")
    assert blocks[0].text == "a & b c"


def test_scores_separate_content_from_chrome():
    blocks = segment_html(HTML)
    feat = block_features(blocks)
    scores = smooth_scores(block_scores(feat), feat)
    content = [b.text.startswith(("Main", "Another")) for b in blocks]
    keep = keep_global_otsu(scores)
    assert list(keep) == content


def test_otsu_threshold_bimodal():
    s = np.array([0.0, 0.5, 0.2, 100.0, 120.0, 90.0])
    t = otsu_threshold(s)
    assert 0.5 < t < 90.0


def test_otsu_degenerate_uniform():
    s = np.array([5.0, 5.0, 5.0])
    assert keep_global_otsu(s).all()


def test_otsu_unimodal_guard_keeps_all():
    # all-content page (PDF-like): similar positive scores, no real
    # boilerplate class — nothing should be cut
    s = np.array([300.0, 310.0, 320.0, 150.0])
    assert keep_global_otsu(s).all()


def test_sauvola_local_floor():
    s = np.array([0.0, 2.0, 0.0, 400.0, 380.0, 390.0, 0.0])
    keep = keep_local_sauvola(s)
    assert list(keep) == [False, False, False, True, True, True, False]


def test_pdf_parse_roundtrip():
    text = "alpha beta gamma " * 30
    pdf = synth.make_pdf(123, text.strip())
    assert is_pdf(pdf)
    blocks = extract_pdf_blocks(pdf)
    assert " ".join(blocks) == text.strip()


def test_pdf_escapes():
    pdf = synth.make_pdf(5, "has (parens) and \\backslash")
    assert extract_pdf_blocks(pdf) == ["has (parens) and \\backslash"]


def test_pdf_flate_roundtrip():
    import random

    pdf_synth_rng = random.Random(11)
    vocab = [f"word{i:03d}" for i in range(80)] + ["(parens)", "a\\b", "ü&é"]
    for doc_id in (7, 36, 65, 94):  # %29==7 pdf ids
        text = " ".join(
            pdf_synth_rng.choice(vocab)
            for _ in range(pdf_synth_rng.randint(3, 180))
        )
        pdf = synth.make_pdf_flate(doc_id, text)
        assert is_pdf(pdf)
        assert b"FlateDecode" in pdf
        assert " ".join(extract_pdf_blocks(pdf)) == text


def test_pdf_operator_semantics():
    from nidaba_ray.stages.pdf import _parse_content

    # nested parens + escapes inside a literal string
    assert _parse_content(b"BT (a\\(b\\)c (nested) d) Tj ET") == ["a(b)c (nested) d"]
    # hex strings, odd-length padding
    assert _parse_content(b"BT <48656C6C6F> Tj ET") == ["Hello"]
    assert _parse_content(b"BT <417> Tj ET") == ["Ap"]
    # octal escape and backslash line continuation
    assert _parse_content(b"BT (oct\\101al) Tj ET") == ["octAal"]
    # TJ array concatenates shows across kerning numbers (no space)
    assert _parse_content(b"BT [(He) -20 (llo)] TJ ET") == ["Hello"]
    # ' moves to the next line; lines join with one space
    assert _parse_content(b"BT (one) Tj (two) ' ET") == ["one two"]
    # Td with ty!=0 is a newline; ty==0 is not
    assert _parse_content(b"BT (a) Tj 0 -13 Td (b) Tj ET") == ["a b"]
    assert _parse_content(b"BT (a) Tj 5 0 Td (b) Tj ET") == ["ab"]
    # one block per BT...ET
    assert _parse_content(b"BT (x) Tj ET BT (y) Tj ET") == ["x", "y"]


def test_pdf_corrupt_stream_isolated():
    import zlib

    good = zlib.compress(b"BT (ok) Tj ET")
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Length 5 /Filter /FlateDecode >> stream\n"
        b"zzzzz\nendstream endobj\n"
        b"2 0 obj << /Length " + str(len(good)).encode()
        + b" /Filter /FlateDecode >> stream\n" + good
        + b"\nendstream endobj\n%%EOF\n"
    )
    # the corrupt stream is skipped, the good one still extracts
    assert extract_pdf_blocks(pdf) == ["ok"]


def test_pdf_length_regex_indirect_refs():
    from nidaba_ray.stages.pdf import _LENGTH_RE

    # direct length → full integer captured
    assert _LENGTH_RE.search(b"<< /Length 1234 /Filter /FlateDecode >>").group(1) == b"1234"
    # indirect reference (multi-digit object number) → NO capture; a
    # backtracking bug used to capture the digit prefix b"1"
    assert _LENGTH_RE.search(b"<< /Length 15 0 R /Filter /FlateDecode >>") is None
    assert _LENGTH_RE.search(b"<< /Length 7 0 R >>") is None


def test_declared_charset_decode():
    from nidaba_ray.stages.extract import extract_row

    """Legacy-encoding pages that declare their charset decode through
    it (round 5): cp1251 Cyrillic, Shift-JIS Japanese; an unlisted or
    lying declaration falls back to the latin-1 marker gate."""
    ru = ("<html><head><meta charset=windows-1251></head><body>"
          "<p>Совет одобрил новый бюджет после долгих прений в зале "
          "у гавани сегодня вечером.</p></body></html>").encode("cp1251")
    kind, spans, err = extract_row(ru)
    assert (kind, err) == ("html", "")
    assert any("Совет одобрил" in s["text"] for s in spans)

    ja = ('<html><head><meta http-equiv="Content-Type" '
          'content="text/html; charset=Shift_JIS"></head><body>'
          "<p>議会は火曜日に新しい予算を承認した。</p></body></html>"
          ).encode("shift_jis")
    kind, spans, err = extract_row(ja)
    assert (kind, err) == ("html", "")
    assert any("議会は火曜日" in s["text"] for s in spans)

    # a declared charset that can't decode the bytes: falls through to
    # the latin-1 gate, which the <html marker satisfies
    lying = (b"<html><head><meta charset=shift_jis></head><body><p>"
             b"caf\xe9 fa\xe7ade</p></body></html>")
    kind, spans, err = extract_row(lying)
    assert kind == "html" and err == ""
    # an UNLISTED codec name is never looked up (no decode escape)
    evil = (b"<html><meta charset=unicode_escape><body><p>x\xff</p>"
            b"</body></html>")
    kind, _, err = extract_row(evil)
    assert kind == "html"  # latin-1 marker gate, not the evil codec
    # binary with a charset-like string but no html: still quarantined
    kind, _, err = extract_row(b"charset=cp1251 \xff\xfe\x00 garbage")
    assert kind == "invalid"


def test_plain_text_payloads_extract():
    """text/plain crawl payloads (round 5): blank-line paragraphs,
    newline collapse; the conservative gate keeps binary junk and the
    synth invalid docs quarantined."""
    from nidaba_ray.stages.extract import extract_row
    from nidaba_ray.stages.merge import vote_row

    body = ("The harbor office publishes its winter schedule today, and\n"
            "every slip holder should read the dredging notice closely.\n"
            "\n"
            "Second paragraph covers the haul-out calendar, which moves\n"
            "two weeks earlier because the travel lift needs new cables.\n")
    body += "Filler sentence to cross the length gate comfortably. " * 2
    kind, spans, err = extract_row(body.encode())
    assert (kind, err) == ("text", "")
    assert len(spans) == 2
    assert spans[0]["text"].startswith("The harbor office")
    assert "\n" not in spans[0]["text"]
    final, _k, _p, nb, nk = vote_row(spans, None, kind, "en")
    assert nb == nk == 2 and "dredging notice closely. Second" in final
    # short plain text still quarantines (the synth invalid contract)
    kind, _, err = extract_row(b"just a few words")
    assert kind == "invalid"
    # low-printable junk quarantines even when long
    junk = (b"x" * 100 + bytes(range(1, 32)) * 8)
    kind, _, err = extract_row(junk)
    assert kind == "invalid"
