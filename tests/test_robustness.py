"""Robustness of the byte-identity invariant: special characters,
Unicode normalization semantics, cross-parallelism determinism inside
one session."""

import unicodedata

import pyarrow.parquet as pq

from nidaba_ray import synth
from nidaba_ray.stages.extract import extract_row
from nidaba_ray.stages.merge import vote_row


def extract_text(doc_id: int, text: str, lang: str = "en") -> str:
    page = synth.make_page(doc_id, text, lang)
    kind, spans, err = extract_row(page["html"])
    assert not err, err
    final, *_ = vote_row(spans, page["text"], kind, lang)
    return final


def test_html_specials_roundtrip():
    # '&', '<', '>' and quotes in content must survive escape→unescape
    text = "a & b < c > d \"quoted\" 'single' & <tag-like> end"
    # doc_id 1 → html payload kind
    got = extract_text(1, text)
    assert got == text


def test_unicode_nfc_semantics():
    # the pipeline normalizes to NFC (pinned, SURVEY §7): NFD input
    # extracts as its NFC form — equal under normalization, and stable
    nfd = unicodedata.normalize("NFD", "café über naïve – déjà vu")
    got = extract_text(2, nfd)
    assert got == unicodedata.normalize("NFC", nfd)
    assert extract_text(2, nfd) == got  # deterministic


def test_cjk_and_emoji():
    text = "汉语 测试 日本語 テスト 한국어 🚀 mixed ascii"
    assert extract_text(3, text) == text


def test_pdf_specials_roundtrip():
    text = "parens (inside) and \\ backslash content words here"
    # doc_id 7 → pdf payload kind (7 % 29 == 7)
    assert synth.payload_kind(7) == "pdf"
    assert extract_text(7, text) == text


def test_cross_parallelism_block_layout(ray_session, tmp_path):
    """Same input at different block counts → byte-identical output
    (the in-suite version of the bench --scaling identity check)."""
    import ray.data as rd

    from nidaba_ray.pipelines.extract import extract_pipeline

    t = synth.pages_table(n=120)
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t.drop_columns(["golden", "doc_id"]), p)
    outs = []
    for nb in (2, 16):
        ds = rd.read_parquet(p, override_num_blocks=nb)
        df = extract_pipeline(
            ds, extract_batch_size=16, extract_concurrency=(1, 2)
        ).to_pandas()
        outs.append(
            dict(zip(zip(df["url"], df["warc_ts"]), df["text"]))
        )
    assert outs[0] == outs[1]
