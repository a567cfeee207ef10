"""Output serializers — the tei2txt / tei2hocr / write_alto sink
analogs (nidaba/tasks/output.py + tei.py serializers, UNVERIFIED per
SURVEY.md §0).

The canonical sink is parquet (``Dataset.write_parquet`` keeps the
full span structure); these stages provide the alternate dialects:
JSONL span dumps (hOCR/ALTO analog) and plain-text rows (tei2txt
analog). Each is a stateless ``map_batches`` projection feeding
``write_json`` / ``write_csv``.
"""

from __future__ import annotations

import pyarrow as pa

from nidaba_ray.record import spans_to_jsonl

__all__ = ["to_jsonl_rows", "to_text_rows", "explode_spans",
           "to_tei_rows", "to_hocr_rows", "to_alto_rows", "to_abbyy_rows",
           "load_tei_rows", "load_hocr_rows", "load_alto_rows",
           "load_abbyy_rows", "tei_metadata_rows", "TEI_HEADER_FIELDS",
           "to_markdown_rows", "load_markdown_rows"]


def to_jsonl_rows(batch: pa.Table) -> pa.Table:
    """One JSON document per row (url, lang, spans, provenance, and
    warc_ts when the source carries it) — the structured-dialect
    serialization."""
    import pyarrow.compute as pc

    urls = batch["url"].to_pylist()
    langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [""] * len(urls)
    spans = batch["spans"].to_pylist()
    provs = (
        batch["provenance"].to_pylist()
        if "provenance" in batch.column_names
        else [[] for _ in urls]
    )
    if "warc_ts" in batch.column_names:
        ts_us = pc.cast(batch["warc_ts"], pa.int64()).to_pylist()
    else:
        ts_us = [None] * len(urls)
    lines = [
        spans_to_jsonl(u, l or "", s or [], p or [], t)
        for u, l, s, p, t in zip(urls, langs, spans, provs, ts_us)
    ]
    return pa.table({"json": pa.array(lines, pa.string())})


def to_text_rows(batch: pa.Table) -> pa.Table:
    """(url, text) rows — the plain-text serialization (tei2txt)."""
    return batch.select(["url", "text"])


def explode_spans(batch: pa.Table) -> pa.Table:
    """One row per span (url, block_id, kind, depth, score, text,
    start, end) — the UZN zone-file debug dump analog (nidaba/uzn.py);
    feed to write_csv for inspection."""
    urls, rows = batch["url"].to_pylist(), batch["spans"].to_pylist()
    out = {k: [] for k in ("url", "block_id", "kind", "depth", "score",
                           "text", "start", "end")}
    for u, spans in zip(urls, rows):
        for s in spans or []:
            out["url"].append(u)
            out["block_id"].append(s["block_id"])
            out["kind"].append(s["kind"])
            out["depth"].append(s["depth"])
            out["score"].append(s["score"])
            out["text"].append(s["text"])
            out["start"].append(s["start"])
            out["end"].append(s["end"])
    return pa.table(
        {
            "url": pa.array(out["url"], pa.string()),
            "block_id": pa.array(out["block_id"], pa.int32()),
            "kind": pa.array(out["kind"], pa.string()),
            "depth": pa.array(out["depth"], pa.int32()),
            "score": pa.array(out["score"], pa.float32()),
            "text": pa.array(out["text"], pa.string()),
            "start": pa.array(out["start"], pa.int64()),
            "end": pa.array(out["end"], pa.int64()),
        }
    )


def to_tei_rows(batch: pa.Table) -> pa.Table:
    """One TEI-flavored XML document per row — the write_tei analog
    (nidaba tei.py serializes page→zone→line with respStmt lineage;
    our spans map to zones, provenance to respStmts). Built with
    ElementTree (no lxml in the sandbox); parse-roundtrip tested."""
    import xml.etree.ElementTree as ET

    urls = batch["url"].to_pylist()
    langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [""] * len(urls)
    texts = batch["text"].to_pylist()
    spans = batch["spans"].to_pylist()
    provs = (
        batch["provenance"].to_pylist()
        if "provenance" in batch.column_names
        else [[] for _ in urls]
    )
    docs = []
    for u, l, t, ss, ps in zip(urls, langs, texts, spans, provs):
        root = ET.Element("TEI", {"url": u, "lang": l or ""})
        hdr = ET.SubElement(root, "teiHeader")
        for p in ps or []:
            ET.SubElement(hdr, "respStmt",
                          {"stage": p["stage"], "variant": p["variant"]})
        body = ET.SubElement(ET.SubElement(root, "text"), "body")
        for s in ss or []:
            zone = ET.SubElement(
                body, "zone",
                {"n": str(s["block_id"]), "type": s["kind"],
                 "depth": str(s["depth"]),
                 "start": str(s["start"]), "end": str(s["end"])},
            )
            zone.text = s["text"]
        canonical = ET.SubElement(root, "ab", {"type": "canonical"})
        canonical.text = t or ""
        docs.append(ET.tostring(root, encoding="unicode"))
    return pa.table({"url": pa.array(urls, pa.string()),
                     "tei": pa.array(docs, pa.string())})


def to_hocr_rows(batch: pa.Table) -> pa.Table:
    """One hOCR document per row — the tei2hocr / write_hocr analog
    (nidaba output.tei2hocr, UNVERIFIED per SURVEY.md §0; hOCR is a
    public spec: XHTML with ocr_* classes and a ``title`` property
    string). Page geometry doesn't exist for web text, so the bbox
    slot carries the canonical-text char offsets (``x_offsets``) and
    the block kind — the same lossless span info as the TEI dialect,
    in the hOCR container. Parse-roundtrip tested."""
    import xml.etree.ElementTree as ET

    urls = batch["url"].to_pylist()
    langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [""] * len(urls)
    spans = batch["spans"].to_pylist()
    docs = []
    for u, l, ss in zip(urls, langs, spans):
        html = ET.Element("html")
        head = ET.SubElement(html, "head")
        ET.SubElement(head, "meta", {"name": "ocr-system",
                                     "content": "nidaba_ray"})
        ET.SubElement(head, "meta", {"name": "ocr-capabilities",
                                     "content": "ocr_page ocr_carea ocr_line"})
        body = ET.SubElement(html, "body")
        page = ET.SubElement(
            body, "div",
            {"class": "ocr_page", "id": "page_1",
             "title": f'image "{u}"', "lang": l or ""},
        )
        for s in ss or []:
            area = ET.SubElement(
                page, "div",
                {"class": "ocr_carea", "id": f"block_{s['block_id']}",
                 "title": f"x_kind {s['kind']}; x_depth {s['depth']}; "
                          f"x_offsets {s['start']} {s['end']}"},
            )
            line = ET.SubElement(
                ET.SubElement(area, "p", {"class": "ocr_par"}),
                "span", {"class": "ocr_line"},
            )
            line.text = s["text"]
        docs.append(ET.tostring(html, encoding="unicode"))
    return pa.table({"url": pa.array(urls, pa.string()),
                     "hocr": pa.array(docs, pa.string())})


def to_alto_rows(batch: pa.Table) -> pa.Table:
    """One ALTO-flavored XML document per row — the write_alto analog
    (nidaba output layer; ALTO is a public LoC schema: Layout → Page →
    PrintSpace → TextBlock → TextLine → String@CONTENT). Geometry
    slots (HPOS/VPOS) carry the canonical-text char offsets, same
    lossless convention as the hOCR dialect. Parse-roundtrip tested."""
    import xml.etree.ElementTree as ET

    urls = batch["url"].to_pylist()
    spans = batch["spans"].to_pylist()
    docs = []
    for u, ss in zip(urls, spans):
        alto = ET.Element("alto")
        desc = ET.SubElement(alto, "Description")
        ET.SubElement(desc, "sourceImageInformation").append(
            ET.Element("fileName")
        )
        desc.find("sourceImageInformation/fileName").text = u
        space = ET.SubElement(
            ET.SubElement(ET.SubElement(alto, "Layout"), "Page", {"ID": "p1"}),
            "PrintSpace",
        )
        for s in ss or []:
            block = ET.SubElement(
                space, "TextBlock",
                {"ID": f"b{s['block_id']}", "STYLEREFS": s["kind"]},
            )
            line = ET.SubElement(block, "TextLine")
            ET.SubElement(
                line, "String",
                {"CONTENT": s["text"], "HPOS": str(s["start"]),
                 "VPOS": str(s["end"])},
            )
        docs.append(ET.tostring(alto, encoding="unicode"))
    return pa.table({"url": pa.array(urls, pa.string()),
                     "alto": pa.array(docs, pa.string())})


def to_abbyy_rows(batch: pa.Table) -> pa.Table:
    """One ABBYY-FineReader-flavored XML document per row — the last
    §2.1 output dialect (ABBYY XML is a public schema: document →
    page → block@blockType → text → par → line → formatting, with
    l/t/r/b box attributes). As with the hOCR/ALTO dialects, web text
    has no page geometry, so l/r carry the canonical-text char offsets
    (t = block depth) — the same lossless span info in the ABBYY
    container. Parse-roundtrip tested."""
    import xml.etree.ElementTree as ET

    urls = batch["url"].to_pylist()
    langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [""] * len(urls)
    spans = batch["spans"].to_pylist()
    docs = []
    for u, l, ss in zip(urls, langs, spans):
        doc = ET.Element("document", {"producer": "nidaba_ray", "source": u})
        page = ET.SubElement(doc, "page", {"width": "0", "height": "0",
                                           "resolution": "0"})
        for s in ss or []:
            block = ET.SubElement(
                page, "block",
                {"blockType": "Text", "blockName": f"b{s['block_id']}",
                 "x_kind": s["kind"],
                 "l": str(s["start"]), "t": str(s["depth"]),
                 "r": str(s["end"]), "b": str(s["depth"])},
            )
            line = ET.SubElement(
                ET.SubElement(ET.SubElement(block, "text"), "par"),
                "line",
                {"l": str(s["start"]), "r": str(s["end"])},
            )
            fmt = ET.SubElement(line, "formatting", {"lang": l or ""})
            fmt.text = s["text"]
        docs.append(ET.tostring(doc, encoding="unicode"))
    return pa.table({"url": pa.array(urls, pa.string()),
                     "abbyy": pa.array(docs, pa.string())})


# ---------------------------------------------------------------------------
# Load paths — the OCRRecord.load_tei / load_hocr analogs (nidaba
# tei.py readers, UNVERIFIED per SURVEY.md §0): parse each output
# dialect back into the spans schema so foreign OCR/extraction output
# can enter the merge/vote stage (round-3 verdict item 4). Each loader
# is a stateless map_batches stage over a one-string-column table.
#
# Lossy-field contract: the XML dialects never serialize
# text_density / link_density / score, so loaded spans carry 0.0
# there; every field a dialect DOES carry round-trips byte-identically
# (serialize ∘ load ≡ id on the XML side — property-tested).
# ---------------------------------------------------------------------------


def _span(block_id: int, kind: str, depth: int, text: str,
          start: int, end: int) -> dict:
    return {
        "block_id": block_id, "kind": kind, "depth": depth,
        "text_density": 0.0, "link_density": 0.0, "score": 0.0,
        "text": text, "start": start, "end": end,
    }


def _loaded_table(urls: list, langs: list, spans: list,
                  texts: list, provs: list) -> pa.Table:
    from nidaba_ray.record import PROVENANCE_STRUCT, SPAN_TYPE

    return pa.table({
        "url": pa.array(urls, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "spans": pa.array(spans, SPAN_TYPE),
        "text": pa.array(texts, pa.string()),
        "provenance": pa.array(provs, pa.list_(PROVENANCE_STRUCT)),
    })


def load_tei_rows(batch: pa.Table, column: str = "tei") -> pa.Table:
    """Parse the repo's TEI dialect back into the spans schema (url,
    lang, spans, text, provenance). The canonical text comes from the
    <ab type="canonical"> element; respStmts become provenance."""
    import xml.etree.ElementTree as ET

    urls, langs, spans, texts, provs = [], [], [], [], []
    for doc in batch[column].to_pylist():
        root = ET.fromstring(doc)
        urls.append(root.get("url", ""))
        langs.append(root.get("lang", ""))
        provs.append([
            {"stage": r.get("stage", ""), "variant": r.get("variant", "")}
            for r in root.findall("teiHeader/respStmt")
        ])
        spans.append([
            _span(int(z.get("n")), z.get("type", ""), int(z.get("depth")),
                  z.text or "", int(z.get("start")), int(z.get("end")))
            for z in root.findall("text/body/zone")
        ])
        ab = root.find("ab[@type='canonical']")
        texts.append((ab.text or "") if ab is not None else "")
    return _loaded_table(urls, langs, spans, texts, provs)


def load_hocr_rows(batch: pa.Table, column: str = "hocr") -> pa.Table:
    """Parse the repo's hOCR dialect (ocr_page / ocr_carea / ocr_line
    with x_kind / x_depth / x_offsets title properties). hOCR stores
    no canonical text, so it is reconstructed from the spans in
    reading order (spans_to_text)."""
    import xml.etree.ElementTree as ET

    from nidaba_ray.record import spans_to_text

    urls, langs, spans, texts, provs = [], [], [], [], []
    for doc in batch[column].to_pylist():
        root = ET.fromstring(doc)
        page = root.find("body/div[@class='ocr_page']")
        title = page.get("title", "") if page is not None else ""
        url = title.split('"')[1] if '"' in title else ""
        urls.append(url)
        langs.append(page.get("lang", "") if page is not None else "")
        provs.append([])
        ss = []
        for area in (page.findall("div[@class='ocr_carea']")
                     if page is not None else []):
            props = {}
            for part in area.get("title", "").split(";"):
                fields = part.strip().split(" ")
                if fields and fields[0]:
                    props[fields[0]] = fields[1:]
            line = area.find("p/span[@class='ocr_line']")
            start, end = (int(v) for v in props.get("x_offsets", ["0", "0"]))
            ss.append(_span(
                int(area.get("id", "block_0").split("_")[1]),
                props.get("x_kind", [""])[0],
                int(props.get("x_depth", ["0"])[0]),
                (line.text or "") if line is not None else "",
                start, end,
            ))
        spans.append(ss)
        texts.append(spans_to_text(ss))
    return _loaded_table(urls, langs, spans, texts, provs)


def load_alto_rows(batch: pa.Table, column: str = "alto") -> pa.Table:
    """Parse the repo's ALTO dialect (TextBlock@STYLEREFS → kind,
    String@HPOS/VPOS → start/end offsets). ALTO stores neither lang
    nor depth in this dialect; depth loads as 0."""
    import xml.etree.ElementTree as ET

    from nidaba_ray.record import spans_to_text

    urls, langs, spans, texts, provs = [], [], [], [], []
    for doc in batch[column].to_pylist():
        root = ET.fromstring(doc)
        fn = root.find("Description/sourceImageInformation/fileName")
        urls.append((fn.text or "") if fn is not None else "")
        langs.append("")
        provs.append([])
        ss = []
        for block in root.findall("Layout/Page/PrintSpace/TextBlock"):
            s = block.find("TextLine/String")
            if s is None:
                continue
            ss.append(_span(
                int(block.get("ID", "b0")[1:]), block.get("STYLEREFS", ""),
                0, s.get("CONTENT", ""),
                int(s.get("HPOS", "0")), int(s.get("VPOS", "0")),
            ))
        spans.append(ss)
        texts.append(spans_to_text(ss))
    return _loaded_table(urls, langs, spans, texts, provs)


def load_abbyy_rows(batch: pa.Table, column: str = "abbyy") -> pa.Table:
    """Parse the repo's ABBYY dialect (block@x_kind/l/t/r → kind,
    start, depth, end; formatting@lang → lang; formatting text)."""
    import xml.etree.ElementTree as ET

    from nidaba_ray.record import spans_to_text

    urls, langs, spans, texts, provs = [], [], [], [], []
    for doc in batch[column].to_pylist():
        root = ET.fromstring(doc)
        urls.append(root.get("source", ""))
        provs.append([])
        lang = ""
        ss = []
        for block in root.findall("page/block"):
            fmt = block.find("text/par/line/formatting")
            if fmt is not None and not lang:
                lang = fmt.get("lang", "")
            ss.append(_span(
                int(block.get("blockName", "b0")[1:]),
                block.get("x_kind", ""),
                int(block.get("t", "0")),
                (fmt.text or "") if fmt is not None else "",
                int(block.get("l", "0")), int(block.get("r", "0")),
            ))
        langs.append(lang)
        spans.append(ss)
        texts.append(spans_to_text(ss))
    return _loaded_table(urls, langs, spans, texts, provs)


# ---------------------------------------------------------------------------
# Markdown dialect (round-5 session 7) — the training-data-friendly
# human-readable serialization. Unlike the XML dialects the container
# has no attribute slots, so each block is preceded by one
# ``<!-- nb:block ... -->`` comment carrying the lossless span fields,
# and the block text renders as real markdown by kind (headings →
# ``#``, li → ``- ``, blockquote → ``> ``, pre → fenced code; other
# kinds render as plain paragraphs — the kind still round-trips via
# the comment). Escaping contract (all invertible, property-tested):
# comment fields HTML-escape ``& " >``; any content line that would
# read as an nb: comment gains one leading backslash.
# ---------------------------------------------------------------------------

_MD_HEADING_LEVEL = {f"h{i}": i for i in range(1, 7)}


def _md_attr_escape(v: str) -> str:
    return (v.replace("&", "&amp;").replace('"', "&quot;")
             .replace(">", "&gt;"))


def _md_attr_unescape(v: str) -> str:
    return (v.replace("&gt;", ">").replace("&quot;", '"')
             .replace("&amp;", "&"))


def _md_escape_lines(text: str) -> list[str]:
    out = []
    for ln in text.split("\n"):
        if ln.lstrip("\\").startswith("<!-- nb:"):
            ln = "\\" + ln
        out.append(ln)
    return out


def _md_unescape_lines(lines: list[str]) -> str:
    out = []
    for ln in lines:
        if ln.startswith("\\") and ln.lstrip("\\").startswith("<!-- nb:"):
            ln = ln[1:]
        out.append(ln)
    return "\n".join(out)


def _md_render_block(s: dict) -> str:
    hdr = (f'<!-- nb:block id={s["block_id"]} '
           f'kind="{_md_attr_escape(s["kind"])}" depth={s["depth"]} '
           f'start={s["start"]} end={s["end"]} -->')
    lines = _md_escape_lines(s["text"])
    kind = s["kind"]
    if kind in _MD_HEADING_LEVEL:
        lines[0] = "#" * _MD_HEADING_LEVEL[kind] + " " + lines[0]
    elif kind == "li":
        lines = ["- " + lines[0]] + ["  " + ln for ln in lines[1:]]
    elif kind == "blockquote":
        lines = ["> " + ln for ln in lines]
    elif kind == "pre":
        runs = _re_mod.findall(r"`+", s["text"])
        fence = "`" * max(3, max((len(r) for r in runs), default=0) + 1)
        lines = [fence] + lines + [fence]
    return hdr + "\n" + "\n".join(lines) + "\n\n"


def _md_parse_block(kind: str, chunk: str) -> str:
    if chunk.endswith("\n\n"):
        chunk = chunk[:-2]
    lines = chunk.split("\n")
    if kind in _MD_HEADING_LEVEL:
        prefix = "#" * _MD_HEADING_LEVEL[kind] + " "
        lines[0] = lines[0][len(prefix):]
    elif kind == "li":
        lines = [lines[0][2:]] + [ln[2:] for ln in lines[1:]]
    elif kind == "blockquote":
        lines = [ln[2:] for ln in lines]
    elif kind == "pre":
        lines = lines[1:-1]
    return _md_unescape_lines(lines)


import re as _re_mod

_MD_DOC_RE = _re_mod.compile(
    r'^<!-- nb:doc url="(.*?)" lang="(.*?)" -->$', _re_mod.M)
_MD_BLOCK_RE = _re_mod.compile(
    r'^<!-- nb:block id=(\d+) kind="(.*?)" depth=(-?\d+) '
    r'start=(-?\d+) end=(-?\d+) -->\n', _re_mod.M)


def to_markdown_rows(batch: pa.Table) -> pa.Table:
    """One markdown document per row (url, markdown) — see the dialect
    note above. Stateless ``map_batches`` projection; feed to
    ``write_csv``/``write_parquet`` or the jsonl sink."""
    urls = batch["url"].to_pylist()
    langs = (batch["lang"].to_pylist()
             if "lang" in batch.column_names else [""] * len(urls))
    spans = batch["spans"].to_pylist()
    docs = []
    for u, l, ss in zip(urls, langs, spans):
        parts = [f'<!-- nb:doc url="{_md_attr_escape(u)}" '
                 f'lang="{_md_attr_escape(l or "")}" -->\n\n']
        parts.extend(_md_render_block(s) for s in ss or [])
        docs.append("".join(parts))
    return pa.table({"url": pa.array(urls, pa.string()),
                     "markdown": pa.array(docs, pa.string())})


def load_markdown_rows(batch: pa.Table, column: str = "markdown") -> pa.Table:
    """Parse the repo's markdown dialect back into the spans schema.
    Markdown stores no provenance; the canonical text is reconstructed
    from the spans in reading order (the hOCR-loader convention)."""
    from nidaba_ray.record import spans_to_text

    urls, langs, spans, texts, provs = [], [], [], [], []
    for doc in batch[column].to_pylist():
        dm = _MD_DOC_RE.search(doc)
        urls.append(_md_attr_unescape(dm.group(1)) if dm else "")
        langs.append(_md_attr_unescape(dm.group(2)) if dm else "")
        provs.append([])
        ss = []
        matches = list(_MD_BLOCK_RE.finditer(doc))
        for i, m in enumerate(matches):
            nxt = matches[i + 1].start() if i + 1 < len(matches) else len(doc)
            kind = _md_attr_unescape(m.group(2))
            ss.append(_span(
                int(m.group(1)), kind, int(m.group(3)),
                _md_parse_block(kind, doc[m.end():nxt]),
                int(m.group(4)), int(m.group(5)),
            ))
        spans.append(ss)
        texts.append(spans_to_text(ss))
    return _loaded_table(urls, langs, spans, texts, provs)


# TEI header fields the metadata merge accepts under validate=True —
# the TEI-P5 fileDesc vocabulary subset nidaba's metadata YAML uses
# (nidaba/tasks/output.py tei_metadata, UNVERIFIED per SURVEY.md §0;
# field names are the public TEI P5 header elements).
TEI_HEADER_FIELDS = frozenset({
    "title", "author", "editor", "publisher", "pubPlace", "licence",
    "sourceDesc", "distributor", "funder", "idno", "date", "language",
    "notes",
})


def tei_metadata_rows(batch: pa.Table, metadata=(), validate: bool = False,
                      column: str = "tei") -> pa.Table:
    """Merge user metadata into each TEI document's header — the
    ``output.tei_metadata`` analog (nidaba/tasks/output.py
    ``(doc, method, metadata=tuple, validate=False)``, UNVERIFIED per
    SURVEY.md §0).

    ``metadata`` is a tuple of YAML documents (strings) and/or
    mappings, merged left-to-right (later keys override earlier —
    nidaba merges its metadata files the same way). Each resulting
    key becomes a child of ``teiHeader/fileDesc``; keys must be
    scalars or lists of scalars (lists emit one element per item,
    e.g. multiple authors). Under ``validate=True`` a key outside
    :data:`TEI_HEADER_FIELDS` raises ``ValueError`` (the schema-
    validation analog — no RelaxNG in the sandbox); under
    ``validate=False`` unknown keys are carried as
    ``<note type="key">``.

    Idempotent per key: re-merging replaces any existing fileDesc
    element of the same tag instead of duplicating it. Stateless
    ``map_batches`` projection — bind metadata with
    ``functools.partial`` (KB-sized, ships in the closure).
    """
    import xml.etree.ElementTree as ET

    import yaml

    merged: dict = {}
    if isinstance(metadata, (str, dict)):
        metadata = (metadata,)
    for doc in metadata:
        part = yaml.safe_load(doc) if isinstance(doc, str) else doc
        if part is None:
            continue
        if not isinstance(part, dict):
            raise ValueError(f"metadata document is not a mapping: {part!r}")
        merged.update(part)
    if validate:
        unknown = sorted(set(merged) - TEI_HEADER_FIELDS)
        if unknown:
            raise ValueError(f"unknown TEI header fields: {unknown}")

    out = []
    for doc in batch[column].to_pylist():
        root = ET.fromstring(doc)
        hdr = root.find("teiHeader")
        if hdr is None:
            hdr = ET.Element("teiHeader")
            root.insert(0, hdr)
        fdesc = hdr.find("fileDesc")
        if fdesc is None:
            fdesc = ET.Element("fileDesc")
            hdr.insert(0, fdesc)
        for key in sorted(merged):
            vals = merged[key]
            if not isinstance(vals, (list, tuple)):
                vals = [vals]
            tag = key if key in TEI_HEADER_FIELDS else "note"
            for el in list(fdesc):
                if el.tag == tag and (tag != "note" or el.get("type") == key):
                    fdesc.remove(el)
            for v in vals:
                el = ET.SubElement(fdesc, tag)
                if tag == "note":
                    el.set("type", key)
                el.text = "" if v is None else str(v)
        out.append(ET.tostring(root, encoding="unicode"))
    res = batch.set_column(
        batch.column_names.index(column), column, pa.array(out, pa.string()))
    return res
