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
