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


def test_gzip_payload_inflated():
    import gzip

    from nidaba_ray.stages.extract import extract_row

    html = b"<html><body><p>gzipped page body with enough words to "\
           b"score as the single content block here</p></body></html>"
    kind, spans, err = extract_row(gzip.compress(html, mtime=0))
    assert kind == "html" and err == ""
    assert any("gzipped page body" in s["text"] for s in spans)
    # corrupt gzip member → quarantine, not a crash
    kind, spans, err = extract_row(b"\x1f\x8b" + b"\x00" * 20)
    assert kind == "invalid" and "gzip" in err


def test_latin1_fallback_requires_html_marker():
    from nidaba_ray.stages.extract import extract_row

    # latin-1 page with a non-utf8 byte (é = 0xe9) and an <html> marker
    page = ("<html><body><p>caf\xe9 culture thrives in the old town "
            "and the article continues for a while</p></body></html>"
            ).encode("latin-1")
    kind, spans, err = extract_row(page)
    assert kind == "html" and err == ""
    assert any("café culture" in s["text"] for s in spans)
    # non-utf8 bytes WITHOUT html structure stay quarantined
    kind, spans, err = extract_row(b"\xe9\xfa\xfb random binary <p not html")
    assert kind == "invalid"


def test_gzip_identity_through_pipeline(ray_session):
    import duckdb

    from nidaba_ray.pipelines.conformance import extract_documents_gzip

    sf = "/root/testdata/sf0.001"
    out = extract_documents_gzip(sf).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    ora = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet') "
        f"WHERE doc_id % 97 <> 13 ORDER BY doc_id"
    ).df()
    assert out.equals(ora)


def test_lang_id_discriminates_distinct_vocab():
    """The Cavnar-Trenkle profile classifier must pick the right
    language when the text is dominated by that language's
    DISTINCTIVE lexicon words (the shared synth-core vocabulary is
    deliberately excluded — on generic tokens every profile ties, which
    is why corpus-level accuracy on the synthetic documents table is
    uninformative; this pins the classifier mechanics instead)."""
    import pyarrow as pa

    from nidaba_ray.functions.lexicon import wordlist
    from nidaba_ray.functions.textops import LangId

    langs = ("en", "de", "es", "fr", "zh")
    all_sets = {l: wordlist(l) for l in langs}
    texts, want = [], []
    for lang in langs:
        others = set().union(*(all_sets[o] for o in langs if o != lang))
        distinct = sorted(all_sets[lang] - others)
        assert len(distinct) >= 3, (lang, distinct)
        texts.append(" ".join((distinct * 4)[:12]))
        want.append(lang)
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(want),
    })
    out = LangId()(batch)
    assert out["pred_lang"].to_pylist() == want


def test_bz2_and_xz_payloads_inflated():
    """Round-5 dialects: bzip2 and xz members inflate transparently
    (dump-mirror payloads); corrupt members quarantine."""
    import bz2
    import lzma

    from nidaba_ray.stages.extract import extract_row

    html = b"<html><body><p>compressed page body with enough words " \
           b"to score as the single content block here</p></body></html>"
    for comp, magic, tag in (
        (bz2.compress(html), b"BZh", "bzip2"),
        (lzma.compress(html, format=lzma.FORMAT_XZ), b"\xfd7zXZ\x00",
         "xz"),
    ):
        assert comp.startswith(magic)
        kind, spans, err = extract_row(comp)
        assert kind == "html" and err == "", tag
        assert any("compressed page body" in s["text"] for s in spans)
        kind, _spans, err = extract_row(magic + b"\x00" * 20)
        assert kind == "invalid" and tag in err
    # a compressed PDF payload rides the same sniff chain
    from nidaba_ray import synth

    pdf = synth.make_pdf_diff(7, "tiny compressed pdf body")
    kind, spans, err = extract_row(bz2.compress(pdf))
    assert kind == "pdf" and err == ""
