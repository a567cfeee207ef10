"""Extraction-pipeline conformance queries.

The synthetic pages table wraps ``documents.text`` in boilerplate
HTML / PDF payloads (nidaba_ray.synth), so a correct extraction is an
*identity* on ``documents.text`` — which makes the whole flagship
pipeline (parse → segment → score → threshold → align/vote →
serialize) checkable against a trivial DuckDB oracle. Payload kinds
are keyed on doc_id (synth.payload_kind): %97==13 invalid (quarantine),
%29==7 PDF, else HTML.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from nidaba_ray.pipelines.extract import extract_pipeline
from nidaba_ray.synth import pages_dataset_from_documents


def _extracted(sf_dir: str, spell: bool = False) -> rd.Dataset:
    pages = pages_dataset_from_documents(sf_dir)
    return extract_pipeline(pages, spell=spell)


def _project_identity(batch: pa.Table) -> pa.Table:
    """Non-quarantined (doc_id, text) rows — the identity-gate
    projection shared by every extraction-dialect query."""
    import pyarrow.compute as pc

    b = batch.filter(pc.equal(batch["error"], ""))
    return b.select(["doc_id", "text"])


def extract_documents(sf_dir: str) -> rd.Dataset:
    """Full pipeline; returns (doc_id, text) for non-quarantined rows.
    Byte-identity gate: text must equal documents.text exactly."""
    return _extracted(sf_dir).map_batches(
        _project_identity, batch_format="pyarrow"
    )


EXTRACT_SQL = "SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 13"


def extract_documents_pdf2(sf_dir: str) -> rd.Dataset:
    """Same byte-identity gate, with the PDF payloads synthesized in
    the compressed-stream variant (FlateDecode + TJ arrays + Td/T*/'
    line operators, synth.make_pdf_flate) — proves the real PDF subset
    parser (stages/pdf.py) preserves the identity, not just the plain
    ``(..) Tj`` dialect."""
    pages = pages_dataset_from_documents(sf_dir, pdf_variant="flate")
    return extract_pipeline(pages, spell=False).map_batches(
        _project_identity, batch_format="pyarrow"
    )


def extract_documents_pdf3(sf_dir: str) -> rd.Dataset:
    """Same byte-identity gate, with PDF payloads in the composite-font
    dialect (synth.make_pdf_utf16): 2-byte show codes through a
    ToUnicode CMap (bfchar + both bfrange forms) plus BOM'd UTF-16BE
    literal strings — proves the non-Latin decode paths in
    stages/pdf.py preserve the identity (round-2 verdict item 6)."""
    pages = pages_dataset_from_documents(sf_dir, pdf_variant="utf16")
    return extract_pipeline(pages, spell=False).map_batches(
        _project_identity, batch_format="pyarrow"
    )


def extract_documents_pdf4(sf_dir: str) -> rd.Dataset:
    """Same byte-identity gate, with PDF payloads RC4-encrypted under
    the standard security handler (synth.make_pdf_rc4: V2/R3 128-bit,
    empty user password) — proves the spec §7.6.3 decryption pre-pass
    in stages/pdf.py preserves the identity. Off the 50-entry driver
    surface; pinned against EXTRACT_SQL in
    tests/test_oracle_conformance.py."""
    pages = pages_dataset_from_documents(sf_dir, pdf_variant="rc4")
    return extract_pipeline(pages, spell=False).map_batches(
        _project_identity, batch_format="pyarrow"
    )


def extract_documents_pdf5(sf_dir: str) -> rd.Dataset:
    """Same byte-identity gate, with PDF payloads AES-128-CBC-encrypted
    (synth.make_pdf_aes: /V 4 /R 4, /CFM /AESV2 crypt filter, empty
    user password) — proves the §7.6.2 AES pre-pass (object-key sAlT
    derivation, IV-prefixed CBC streams, /Length-rewriting rebuild) in
    stages/pdf.py preserves the identity. Off the 50-entry driver
    surface; pinned against EXTRACT_SQL in
    tests/test_oracle_conformance.py."""
    pages = pages_dataset_from_documents(sf_dir, pdf_variant="aes")
    return extract_pipeline(pages, spell=False).map_batches(
        _project_identity, batch_format="pyarrow"
    )


def extract_documents_pdf6(sf_dir: str) -> rd.Dataset:
    """Same byte-identity gate, with PDF payloads AES-256-encrypted
    (synth.make_pdf_aes256 rev=5: /V 5, /CFM /AESV3, the draft
    single-SHA-256 KDF — rev=6's hardened Algorithm-2.B hash is
    exercised by a single-doc unit test instead, it costs ~1s/doc by
    design). Off the 50-entry driver surface; pinned in
    tests/test_oracle_conformance.py."""
    pages = pages_dataset_from_documents(sf_dir, pdf_variant="aes256r5")
    return extract_pipeline(pages, spell=False).map_batches(
        _project_identity, batch_format="pyarrow"
    )


def extract_documents_docx(sf_dir: str) -> rd.Dataset:
    """Same byte-identity gate with the dialect-slot docs packaged as
    DOCX (synth.make_docx: WordprocessingML runs with preserved
    spaces) — proves the zip-container extraction (stages/office.py)
    preserves the identity. Off the 50-entry driver surface; pinned
    against EXTRACT_SQL in tests/test_oracle_conformance.py."""
    pages = pages_dataset_from_documents(sf_dir, pdf_variant="docx")
    return extract_pipeline(pages, spell=False).map_batches(
        _project_identity, batch_format="pyarrow"
    )


def extract_documents_epub(sf_dir: str) -> rd.Dataset:
    """Same byte-identity gate with the dialect-slot docs packaged as
    EPUB (synth.make_epub: multi-chapter spine, chrome-wrapped
    chapters) — the chapters flow through the html segment+score
    chain, so this also proves publisher chrome drops without
    touching content. Off the 50-entry driver surface; pinned against
    EXTRACT_SQL in tests/test_oracle_conformance.py."""
    pages = pages_dataset_from_documents(sf_dir, pdf_variant="epub")
    return extract_pipeline(pages, spell=False).map_batches(
        _project_identity, batch_format="pyarrow"
    )


def extract_documents_gzip(sf_dir: str) -> rd.Dataset:
    """Same byte-identity gate with HTML payloads per-record gzipped
    (the CC WARC convention) — proves the transparent-inflate sniff in
    ``extract_row`` preserves the identity."""
    pages = pages_dataset_from_documents(sf_dir, html_variant="gzip")
    return extract_pipeline(pages, spell=False).map_batches(
        _project_identity, batch_format="pyarrow"
    )


def extract_stats(sf_dir: str) -> pa.Table:
    """Per-lang corpus stats of the extraction output (counts must
    match the oracle computed from the source texts)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = batch.filter(pc.equal(batch["error"], ""))
        df = pa.table({"lang": b["lang"], "n_tokens": b["n_tokens"]}).to_pandas()
        g = df.groupby("lang", as_index=False).agg(
            n_docs=("n_tokens", "size"), total_tokens=("n_tokens", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        _extracted(sf_dir, spell=True)
        .map_batches(partial, batch_format="pyarrow")
        # tiny per-batch partials → one merge block (no empty reduce
        # partitions; see queries.q1_pricing_summary)
        .repartition(1)
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("total_tokens", alias_name="total_tokens"))
        .to_pandas()
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["total_tokens"] = out["total_tokens"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRACT_STATS_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS total_tokens
FROM documents WHERE doc_id % 97 <> 13
GROUP BY lang
"""


def extract_quarantine(sf_dir: str) -> rd.Dataset:
    """Quarantined doc ids (undecodable payloads) — per-row error
    isolation must catch exactly the corrupted rows, no more."""

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = batch.filter(pc.invert(pc.equal(batch["error"], "")))
        return b.select(["doc_id"])

    return _extracted(sf_dir).map_batches(project, batch_format="pyarrow")


EXTRACT_QUARANTINE_SQL = "SELECT doc_id FROM documents WHERE doc_id % 97 = 13"
