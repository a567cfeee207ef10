"""Deterministic synthetic Common-Crawl-style pages table (seed=42).

This is the in-repo substitute for the absent reference corpus
(SURVEY.md §0): every page's ground-truth main content is known by
construction, so "byte-identical extracted text per url"
(BASELINE.json:input_hint) is checkable both against frozen goldens and
— for pages derived from the driver's ``documents`` table — against a
DuckDB oracle (extraction is an identity on ``documents.text``).

Schema (authoritative, BASELINE.json:input_hint):
    pages(url: string, warc_ts: timestamp[us], html: binary,
          text: string, lang: string)

Payload kinds are keyed on deterministic doc_id rules so the oracle SQL
can express them (tests + __ray_entry__ contract):
    doc_id % 29 == 7   → PDF payload (%PDF magic, text in `(..) Tj` ops)
    doc_id % 97 == 13  → invalid payload (quarantine path)
    otherwise          → HTML payload with nav/aside/footer boilerplate

The ``text`` column is a character-noised candidate extraction (the
"other OCR engine" for the merge/vote stage, FIXTURES.md F1).
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pyarrow as pa

SEED = 42
PDF_MOD, PDF_REM = 29, 7
INVALID_MOD, INVALID_REM = 97, 13
BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

# ~50 hosts, zipfian-hot (FIXTURES.md F1) to exercise salted-key skew.
_HOSTS = [f"site{i:02d}.example.{'com' if i % 3 else 'org'}" for i in range(50)]
_ZIPF_S = 1.2

_NAV_WORDS = ["Home", "About", "Products", "Blog", "Contact", "Careers", "Pricing", "Docs"]
_ASIDE_WORDS = ["Trending", "Related", "Sponsored", "Popular", "Archive", "Newsletter",
                "Subscribe", "Promo", "Deals", "Partners"]


def host_for(doc_id: int) -> str:
    """Deterministic zipfian host assignment (hot hosts get most urls)."""
    h = int(hashlib.md5(f"host-{SEED}-{doc_id}".encode()).hexdigest()[:8], 16)
    u = (h % 10_000_000) / 10_000_000.0
    ranks = np.arange(1, len(_HOSTS) + 1, dtype=np.float64)
    w = ranks ** (-_ZIPF_S)
    cdf = np.cumsum(w / w.sum())
    return _HOSTS[int(np.searchsorted(cdf, u))]


def url_for(doc_id: int) -> str:
    return f"https://{host_for(doc_id)}/doc-{doc_id}"


def paragraphs_for(doc_id: int, text: str) -> list[str]:
    """Split a document's text into paragraphs at deterministic word
    boundaries (chunk size varies by doc_id). Joining the paragraphs
    back with a single space reproduces the text byte-identically."""
    words = text.split(" ")
    chunk = 20 + (doc_id % 5) * 10
    return [" ".join(words[i : i + chunk]) for i in range(0, len(words), chunk)]


def _chrome(rng: random.Random, host: str) -> tuple[str, str, str]:
    """Boilerplate: header+nav, aside link farm, footer — high link
    density, the stuff the extractor must classify out."""
    nav_items = "".join(
        f'<li><a href="/{w.lower()}">{w}</a></li>'
        for w in rng.sample(_NAV_WORDS, k=5)
    )
    header = (
        f"<header><h1>{host} portal</h1>"
        f"<nav><ul>{nav_items}</ul></nav></header>"
    )
    aside_items = "".join(
        f'<li><a href="/t/{w.lower()}">{w} {rng.randint(1, 99)}</a></li>'
        for w in rng.sample(_ASIDE_WORDS, k=6)
    )
    aside = f'<aside class="sidebar"><h3>More</h3><ul>{aside_items}</ul></aside>'
    footer = (
        '<footer><p><a href="/privacy">Privacy</a> <a href="/terms">Terms</a> '
        f"© 2024 {host}</p></footer>"
    )
    return header, aside, footer


def make_html(doc_id: int, text: str, lang: str) -> bytes:
    """Templated page: known main content wrapped in boilerplate.

    Paragraph text is entity-escaped (as any real generator would) and
    the extractor's parser unescapes — so byte-identity holds for
    content containing ``& < >`` etc., not just word-soup."""
    import html as _html

    rng = random.Random(f"html-{SEED}-{doc_id}")
    host = host_for(doc_id)
    header, aside, footer = _chrome(rng, host)
    paras = "".join(
        f"<p>{_html.escape(p)}</p>" for p in paragraphs_for(doc_id, text)
    )
    return (
        f'<!DOCTYPE html><html lang="{lang}"><head><meta charset="utf-8">'
        f"<title>doc {doc_id}</title></head><body>{header}"
        f"<main><article>{paras}</article></main>{aside}{footer}</body></html>"
    ).encode("utf-8")


def _zip_add(z, name: str, data: bytes, stored: bool = False) -> None:
    """Deterministic zip member (fixed timestamp — zipfile stamps
    NOW() by default, which would break byte-identity across runs)."""
    import zipfile

    info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
    info.compress_type = (zipfile.ZIP_STORED if stored
                          else zipfile.ZIP_DEFLATED)
    z.writestr(info, data)


def make_docx(doc_id: int, text: str) -> bytes:
    """OOXML WordprocessingML container: one ``<w:p>`` per paragraph,
    text split into 1-3 ``<w:t xml:space="preserve">`` runs at
    deterministic word boundaries (trailing spaces ride the runs), so
    extraction is the identity on ``text``."""
    import html as _html
    import io
    import zipfile

    parts = []
    for i, p in enumerate(paragraphs_for(doc_id, text)):
        words = p.split(" ")
        k = 1 + (doc_id + i) % 3
        step = max(1, -(-len(words) // k))
        runs = [" ".join(words[j:j + step])
                for j in range(0, len(words), step)]
        xml_runs = []
        for r_i, r in enumerate(runs):
            t = _html.escape(r + (" " if r_i < len(runs) - 1 else ""))
            xml_runs.append(
                f'<w:r><w:t xml:space="preserve">{t}</w:t></w:r>')
        parts.append("<w:p>" + "".join(xml_runs) + "</w:p>")
    doc = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           '<w:document xmlns:w="http://schemas.openxmlformats.org/'
           'wordprocessingml/2006/main"><w:body>'
           + "".join(parts) + "</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        _zip_add(z, "[Content_Types].xml", b"<Types/>")
        _zip_add(z, "word/document.xml", doc.encode("utf-8"))
    return buf.getvalue()


def make_epub(doc_id: int, text: str, lang: str = "en") -> bytes:
    """EPUB/OCF container: the paragraphs split across 1-3 spine
    chapters, each chapter the SAME chrome-wrapped page template as
    make_html (publisher nav/footer must drop like site chrome), so
    extraction is the identity on ``text``."""
    import html as _html
    import io
    import zipfile

    paras = paragraphs_for(doc_id, text)
    n_ch = min(1 + doc_id % 3, len(paras)) or 1
    per = -(-len(paras) // n_ch)
    chapters = [paras[i:i + per] for i in range(0, len(paras), per)]
    items, refs, files = [], [], []
    for c, ch_paras in enumerate(chapters):
        rng = random.Random(f"epub-{SEED}-{doc_id}-{c}")
        header, aside, footer = _chrome(rng, host_for(doc_id))
        body = "".join(f"<p>{_html.escape(p)}</p>" for p in ch_paras)
        html = (f'<!DOCTYPE html><html lang="{lang}"><head>'
                f"<title>ch {c}</title></head><body>{header}"
                f"<main><article>{body}</article></main>{aside}{footer}"
                "</body></html>")
        items.append(f'<item id="c{c}" href="c{c}.xhtml" '
                     'media-type="application/xhtml+xml"/>')
        refs.append(f'<itemref idref="c{c}"/>')
        files.append((f"OEBPS/c{c}.xhtml", html.encode("utf-8")))
    opf = ('<?xml version="1.0"?><package xmlns="http://www.idpf.org/'
           f'2007/opf"><manifest>{"".join(items)}</manifest>'
           f'<spine>{"".join(refs)}</spine></package>')
    container = ('<?xml version="1.0"?><container><rootfiles>'
                 '<rootfile full-path="OEBPS/content.opf" '
                 'media-type="application/oebps-package+xml"/>'
                 "</rootfiles></container>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        _zip_add(z, "mimetype", b"application/epub+zip", stored=True)
        _zip_add(z, "META-INF/container.xml", container.encode())
        _zip_add(z, "OEBPS/content.opf", opf.encode())
        for name, data in files:
            _zip_add(z, name, data)
    return buf.getvalue()


def pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(doc_id: int, text: str) -> bytes:
    """Minimal deterministic PDF-like payload: real `%PDF` magic and
    text in `(..) Tj` operators. The in-repo PdfExtractor parses exactly
    this subset; real-world decode would swap in a pdf library behind
    the same actor interface (SURVEY.md §2.2 ocr.kraken analog)."""
    body = "\n".join(f"BT /F1 12 Tf 72 {700 - 14 * i} Td ({pdf_escape(p)}) Tj ET"
                     for i, p in enumerate(paragraphs_for(doc_id, text)))
    # /Length counts BYTES (spec) — identical to len(body) for ASCII
    # content, so the frozen goldens (ASCII vocab) are unaffected
    n_bytes = len(body.encode("utf-8"))
    return (
        "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        "2 0 obj << /Type /Pages /Count 1 >> endobj\n"
        f"3 0 obj << /Length {n_bytes} >> stream\n{body}\nendstream endobj\n"
        "trailer << /Root 1 0 R >>\n%%EOF\n"
    ).encode("utf-8")


def make_pdf_inline_img(doc_id: int, text: str) -> bytes:
    """make_pdf variant with an inline image (spec §8.9.7) embedded in
    the content stream between text objects. The binary payload is
    ADVERSARIAL on purpose: it contains ``(DECOY) Tj``, an unbalanced
    ``(``, and a bare ``BT`` — bytes that would corrupt extraction if
    the parser tokenized through the image instead of skipping the
    whole BI…ID…EI span. Extraction must equal make_pdf's exactly."""
    rng = random.Random(f"pdf-inline-{SEED}-{doc_id}")
    payload = bytes(rng.randrange(256) for _ in range(48))
    # no accidental EI terminator anywhere inside the decoy bytes
    decoy = b"(DECOY) Tj ( BT " + payload.replace(b"EI", b"E_")
    img = (
        b"BI /W 8 /H 8 /BPC 8 /CS /RGB /F /AHx ID " + decoy + b"\nEI\n"
    )
    paras = paragraphs_for(doc_id, text)
    parts: list[bytes] = []
    for i, p in enumerate(paras):
        parts.append(
            f"BT /F1 12 Tf 72 {700 - 14 * i} Td ({pdf_escape(p)}) Tj ET"
            .encode("utf-8")
        )
        if i == 0:
            parts.append(img)
    body = b"\n".join(parts)
    return (
        b"%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Count 1 >> endobj\n"
        b"3 0 obj << /Length " + str(len(body)).encode() + b" >> stream\n"
        + body + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )


def make_pdf_flate(doc_id: int, text: str) -> bytes:
    """Compressed-stream PDF variant: FlateDecode content stream with
    the fuller operator set — TJ arrays (mid-line splits with kerning
    numbers), ``'`` next-line shows, ``T*``/``Td`` line advances, Tm
    positioning. One BT…ET text object per paragraph; stages/pdf.py
    reassembles lines with spaces, so extraction remains the identity
    on ``text``. The plain variant (make_pdf) stays the default —
    frozen goldens depend on it."""
    import zlib

    paras = paragraphs_for(doc_id, text)
    ops: list[str] = []
    y = 720
    for i, p in enumerate(paras):
        words = p.split(" ")
        lines = [" ".join(words[j : j + 8]) for j in range(0, len(words), 8)]
        ops += ["BT", "/F1 11 Tf", f"1 0 0 1 72 {y} Tm", "13 TL"]
        for k, ln in enumerate(lines):
            mode = (doc_id + i + k) % 3
            if k == 0:
                h = max(1, len(ln) // 2)  # split mid-line: TJ concatenates
                ops.append(
                    f"[({pdf_escape(ln[:h])}) -18 ({pdf_escape(ln[h:])})] TJ"
                )
            elif mode == 0:
                ops.append(f"({pdf_escape(ln)}) '")
            elif mode == 1:
                ops += ["T*", f"({pdf_escape(ln)}) Tj"]
            else:
                ops.append(f"0 -13 Td ({pdf_escape(ln)}) Tj")
        ops.append("ET")
        y -= 13 * (len(lines) + 1)
    comp = zlib.compress("\n".join(ops).encode("utf-8"))
    return (
        b"%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Count 1 >> endobj\n"
        b"3 0 obj << /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode >> stream\n" + comp
        + b"\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"
    )


def pdf_escape_bytes(b: bytes) -> bytes:
    """Literal-string escaping for BINARY content (UTF-16BE code
    units): parens/backslash plus every byte < 0x20 as \\ooo octal —
    raw CR/LF inside a literal string would be EOL-normalized by a
    conforming reader (spec §7.3.4.2), corrupting code units."""
    out = bytearray()
    for x in b:
        if x in (0x28, 0x29, 0x5C) or x < 0x20:
            out += b"\\%03o" % x
        else:
            out.append(x)
    return bytes(out)


def make_pdf_utf16(doc_id: int, text: str) -> bytes:
    """Composite-font-style variant (the non-Latin PDF shape): a
    ToUnicode CMap object maps deterministic 2-byte codes to the
    document's characters, content shows hex strings of those codes,
    and every third line is instead a BOM'd UTF-16BE literal string
    (spec §7.9.2.2) — so one payload exercises bfchar, both bfrange
    forms AND the BOM path. Extraction remains the identity on
    ``text``."""
    import zlib as _zlib

    # --- deterministic code assignment: maximal runs of consecutive
    # ordinals become incrementing bfranges, pairs become array-form
    # bfranges, singletons become bfchar entries
    def u16hex(c: str) -> str:
        # UTF-16BE hex destination — 4 digits in the BMP, 8 (surrogate
        # pair) beyond it
        return c.encode("utf-16-be").hex().upper()

    chars = sorted(set(text))
    runs: list[list[str]] = [[chars[0]]]
    for c in chars[1:]:
        # consecutive-ordinal runs only within the BMP: the
        # incrementing bfrange form advances a single code unit
        if ord(c) == ord(runs[-1][-1]) + 1 and ord(c) <= 0xFFFF:
            runs[-1].append(c)
        else:
            runs.append([c])
    code: dict[str, int] = {}
    bfchar, bfrange = [], []
    nxt = 0x0020
    for run in runs:
        lo = nxt
        for j, c in enumerate(run):
            code[c] = lo + j
        nxt += len(run)
        if len(run) >= 3:
            bfrange.append(f"<{lo:04X}> <{lo + len(run) - 1:04X}> "
                           f"<{u16hex(run[0])}>")
        elif len(run) == 2:
            bfrange.append(
                f"<{lo:04X}> <{lo + 1:04X}> "
                f"[<{u16hex(run[0])}> <{u16hex(run[1])}>]"
            )
        else:
            bfchar.append(f"<{lo:04X}> <{u16hex(run[0])}>")
    cmap_src = "\n".join(
        [
            "/CIDInit /ProcSet findresource begin",
            "12 dict begin",
            "begincmap",
            "1 begincodespacerange <0000> <FFFF> endcodespacerange",
            f"{len(bfchar)} beginbfchar",
            *bfchar,
            "endbfchar",
            f"{len(bfrange)} beginbfrange",
            *bfrange,
            "endbfrange",
            "endcmap",
            "end end",
        ]
    ).encode("ascii")
    cmap_comp = _zlib.compress(cmap_src)

    def hexshow(s: str) -> str:
        return "<" + "".join(f"{code[c]:04X}" for c in s) + ">"

    ops: list[str] = []
    y = 720
    for i, p in enumerate(paragraphs_for(doc_id, text)):
        words = p.split(" ")
        lines = [" ".join(words[j : j + 8]) for j in range(0, len(words), 8)]
        ops += ["BT", "/F1 11 Tf", f"1 0 0 1 72 {y} Tm", "13 TL"]
        for k, ln in enumerate(lines):
            if k and k % 3 == 0:  # BOM'd UTF-16BE literal string
                esc = pdf_escape_bytes(
                    b"\xfe\xff" + ln.encode("utf-16-be")
                ).decode("latin-1")
                ops.append(f"T* ({esc}) Tj")
            elif k == 0:
                h = max(1, len(ln) // 2)  # TJ concatenates around kerning
                ops.append(f"[{hexshow(ln[:h])} -18 {hexshow(ln[h:])}] TJ")
            else:
                ops.append(f"T* {hexshow(ln)} Tj")
        ops.append("ET")
        y -= 13 * (len(lines) + 1)
    body = _zlib.compress("\n".join(ops).encode("latin-1"))
    return (
        b"%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Count 1 >> endobj\n"
        b"4 0 obj << /Length " + str(len(cmap_comp)).encode()
        + b" /Filter /FlateDecode >> stream\n" + cmap_comp
        + b"\nendstream endobj\n"
        b"3 0 obj << /Length " + str(len(body)).encode()
        + b" /Filter /FlateDecode >> stream\n" + body
        + b"\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"
    )


def make_pdf_twofont(doc_id: int, text: str) -> bytes:
    """Two composite fonts with OVERLAPPING 2-byte code spaces (both
    start at 0x0020), each with its own ToUnicode CMap, referenced
    from a /Font resource dict and switched with ``Tf`` mid-line —
    decodable ONLY by per-font CMap resolution (a merged
    document-level map would collide on the shared codes). Char set
    split: even-indexed unique chars → /F1, odd → /F2."""
    import zlib as _zlib

    chars = sorted(set(text))
    halves = (chars[0::2], chars[1::2])
    codes: list[dict[str, int]] = []
    cmaps: list[bytes] = []
    for half in halves:
        cm = {c: 0x20 + i for i, c in enumerate(half)}
        codes.append(cm)
        entries = "\n".join(
            f"<{v:04X}> <{c.encode('utf-16-be').hex().upper()}>"
            for c, v in cm.items()
        )
        cmaps.append(_zlib.compress((
            "begincmap\n1 begincodespacerange <0000> <FFFF> "
            f"endcodespacerange\n{len(cm)} beginbfchar\n{entries}\n"
            "endbfchar\nendcmap"
        ).encode("ascii")))
    font_of = {c: (0 if c in codes[0] else 1) for c in chars}

    ops: list[str] = ["BT", "13 TL"]
    first = True
    for p in paragraphs_for(doc_id, text):
        if not first:
            ops.append("T*")
        first = False
        # runs of same-font chars → Tf switch + hex show per run
        run_font, run = font_of[p[0]], []
        for c in p:
            f = font_of[c]
            if f != run_font:
                ops.append(f"/F{run_font + 1} 11 Tf")
                ops.append(
                    "<" + "".join(f"{codes[run_font][x]:04X}" for x in run)
                    + "> Tj")
                run_font, run = f, []
            run.append(c)
        ops.append(f"/F{run_font + 1} 11 Tf")
        ops.append("<" + "".join(f"{codes[run_font][x]:04X}" for x in run)
                   + "> Tj")
    ops.append("ET")
    body = _zlib.compress("\n".join(ops).encode("ascii"))

    def stream_obj(num: int, comp: bytes) -> bytes:
        return (f"{num} 0 obj << /Length {len(comp)} /Filter /FlateDecode "
                ">> stream\n").encode() + comp + b"\nendstream endobj\n"

    return (
        b"%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Count 1 >> endobj\n"
        b"4 0 obj << /Type /Page /Resources << /Font "
        b"<< /F1 10 0 R /F2 11 0 R >> >> /Contents 3 0 R >> endobj\n"
        b"10 0 obj << /Type /Font /Subtype /Type0 /ToUnicode 12 0 R >> endobj\n"
        b"11 0 obj << /Type /Font /Subtype /Type0 /ToUnicode 13 0 R >> endobj\n"
        + stream_obj(12, cmaps[0]) + stream_obj(13, cmaps[1])
        + stream_obj(3, body)
        + b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )


def make_xlsx(doc_id: int, text: str) -> bytes:
    """OOXML SpreadsheetML container: one sheet row per paragraph,
    the paragraph split into 1-3 shared-string cells at deterministic
    word boundaries; extraction (cells joined with single spaces) is
    the identity on ``text``."""
    import html as _html
    import io
    import zipfile

    shared: list[str] = []
    rows_xml: list[str] = []
    for i, p in enumerate(paragraphs_for(doc_id, text)):
        words = p.split(" ")
        k = 1 + (doc_id + i) % 3
        step = max(1, -(-len(words) // k))
        cells = []
        for j in range(0, len(words), step):
            cells.append(
                f'<c r="X{i}" t="s"><v>{len(shared)}</v></c>')
            shared.append(" ".join(words[j:j + step]))
        rows_xml.append(f'<row r="{i + 1}">' + "".join(cells) + "</row>")
    sst = "<sst>" + "".join(
        f'<si><t xml:space="preserve">{_html.escape(s)}</t></si>'
        for s in shared) + "</sst>"
    sheet = ("<worksheet><sheetData>" + "".join(rows_xml)
             + "</sheetData></worksheet>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        _zip_add(z, "[Content_Types].xml", b"<Types/>")
        _zip_add(z, "xl/workbook.xml", b"<workbook/>")
        _zip_add(z, "xl/sharedStrings.xml", sst.encode("utf-8"))
        _zip_add(z, "xl/worksheets/sheet1.xml", sheet.encode("utf-8"))
    return buf.getvalue()


def make_pdf_objstm(doc_id: int, text: str) -> bytes:
    """The :func:`make_pdf_twofont` document restructured the way
    modern writers (PDF 1.5+) emit it: the page dict and BOTH font
    dicts live inside a ``/Type /ObjStm`` object stream, and a
    ``/Type /XRef`` cross-reference stream replaces the trailer. The
    overlapping code spaces make the document decodable ONLY when the
    reader expands the object stream (per-font CMap resolution needs
    the font dicts) — the merged document-level fallback collides."""
    import zlib as _zlib

    base = make_pdf_twofont(doc_id, text)
    # lift the three non-stream objects out of the flat layout
    packed_objs = [
        (4, b"<< /Type /Page /Resources << /Font "
            b"<< /F1 10 0 R /F2 11 0 R >> >> /Contents 3 0 R >>"),
        (10, b"<< /Type /Font /Subtype /Type0 /ToUnicode 12 0 R >>"),
        (11, b"<< /Type /Font /Subtype /Type0 /ToUnicode 13 0 R >>"),
    ]
    header = " ".join(f"{num} {off}" for num, off in zip(
        [n for n, _ in packed_objs],
        # offsets relative to /First
        np.cumsum([0] + [len(b) + 1 for _, b in packed_objs[:-1]]),
    )).encode("ascii") + b" "
    body = header + b" ".join(b for _, b in packed_objs)
    comp = _zlib.compress(body)
    objstm = (
        f"20 0 obj << /Type /ObjStm /N {len(packed_objs)} "
        f"/First {len(header)} /Length {len(comp)} "
        f"/Filter /FlateDecode >> stream\n".encode() + comp
        + b"\nendstream endobj\n"
    )
    # a (fake-entry) cross-reference stream: binary rows that would be
    # mis-tokenized as content if the reader didn't skip /Type /XRef
    xref_rows = _zlib.compress(b"BT (xref soup) Tj ET" + bytes(40))
    xrefstm = (
        f"21 0 obj << /Type /XRef /W [1 2 1] /Size 22 "
        f"/Length {len(xref_rows)} /Filter /FlateDecode >> stream\n"
        .encode() + xref_rows + b"\nendstream endobj\n"
    )
    # strip the flat copies of objects 4/10/11 from the base document
    out = []
    for line in base.split(b"\n"):
        if line.startswith((b"4 0 obj", b"10 0 obj", b"11 0 obj",
                            b"trailer")):
            continue
        out.append(line)
    doc = b"\n".join(out)
    return doc.replace(
        b"%%EOF\n", b""
    ) + objstm + xrefstm + b"trailer << /Root 1 0 R >>\n%%EOF\n"


def make_pdf_diff(doc_id: int, text: str) -> bytes:
    """Simple-font /Differences variant (the accented-Latin PDF
    shape): non-ASCII characters are assigned byte codes 128-255 and a
    font object's ``/Encoding << /Differences [...] >>`` maps them
    back via ``uniXXXX`` glyph names; ASCII passes through. Raises if
    the text needs more than 128 distinct non-ASCII characters (the
    single-byte code space — real generators switch to composite
    fonts there, i.e. :func:`make_pdf_utf16`)."""
    non_ascii = sorted({c for c in text if ord(c) > 0x7F})
    if len(non_ascii) > 128:
        raise ValueError("needs a composite font (make_pdf_utf16)")
    code = {c: 128 + i for i, c in enumerate(non_ascii)}
    diff_entries = " ".join(
        f"{128 + i} /uni{_u16cu(c)}" for i, c in enumerate(non_ascii)
    )
    font_obj = (
        "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica\n"
        f"/Encoding << /Type /Encoding /Differences [ {diff_entries} ] >>\n"
        ">> endobj\n"
    )

    def enc(s: str) -> str:
        out = []
        for c in s:
            if c in code:
                out.append(f"\\{code[c]:03o}")
            elif c in "()\\":
                out.append("\\" + c)
            else:
                out.append(c)
        return "".join(out)

    body = "\n".join(
        f"BT /F1 12 Tf 72 {700 - 14 * i} Td ({enc(p)}) Tj ET"
        for i, p in enumerate(paragraphs_for(doc_id, text))
    )
    n_bytes = len(body.encode("latin-1"))
    return (
        "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        "2 0 obj << /Type /Pages /Count 1 >> endobj\n"
        + font_obj
        + f"3 0 obj << /Length {n_bytes} >> stream\n{body}\nendstream endobj\n"
        "trailer << /Root 1 0 R >>\n%%EOF\n"
    ).encode("latin-1")


def _u16cu(c: str) -> str:
    """uniXXXX glyph-name payload: UTF-16 code units of one char
    (surrogate pair beyond the BMP)."""
    return c.encode("utf-16-be").hex().upper()


def make_pdf_rc4(doc_id: int, text: str, rev: int = 3) -> bytes:
    """RC4-encrypted variant of :func:`make_pdf` (standard security
    handler, empty owner+user passwords — the common
    "owner-password-only" shape). ``rev=3`` writes /V 2 /R 3 with a
    128-bit key; ``rev=2`` writes /V 1 /R 2 (40-bit). /O, /U and the
    file key follow spec §7.6.3 Algorithms 2/3/5; the single content
    stream is RC4'd with the Algorithm-1 per-object key (obj 3 gen 0).
    RC4 is length-preserving, so the plain variant's /Length is
    reused unchanged."""
    import hashlib as _hl

    from nidaba_ray.stages.pdf import _obj_key, _rc4, _std_file_key, _PAD

    if rev not in (2, 3):
        raise ValueError("rev must be 2 or 3")
    plain = make_pdf(doc_id, text)
    head, rest = plain.split(b"stream\n", 1)
    body = rest.split(b"\nendstream", 1)[0]

    id0 = _hl.md5(f"rc4-id-{SEED}-{doc_id}".encode()).digest()
    P = -44
    n = 16 if rev == 3 else 5
    # /O (Algorithm 3): empty owner password falls back to the (empty)
    # user password; both sides are the spec pad
    okey = _hl.md5(_PAD).digest()
    if rev == 3:
        for _ in range(50):
            okey = _hl.md5(okey[:n]).digest()
    okey = okey[:n]
    O = _rc4(okey, _PAD)
    if rev == 3:
        for i in range(1, 20):
            O = _rc4(bytes(b ^ i for b in okey), O)
    key = _std_file_key(O, P, id0, rev, 8 * n)
    # /U (Algorithm 4 for R2, Algorithm 5 for R3)
    if rev == 2:
        U = _rc4(key, _PAD)
    else:
        x = _rc4(key, _hl.md5(_PAD + id0).digest())
        for i in range(1, 20):
            x = _rc4(bytes(b ^ i for b in key), x)
        U = x + b"\x00" * 16
    enc_body = _rc4(_obj_key(key, 3, 0), body)
    vr = b"/V 2 /R 3 /Length 128" if rev == 3 else b"/V 1 /R 2"
    return (
        head + b"stream\n" + enc_body + b"\nendstream endobj\n"
        + b"4 0 obj << /Filter /Standard " + vr
        + b" /P -44 /O <" + O.hex().encode() + b"> /U <" + U.hex().encode()
        + b"> >> endobj\n"
        + b"trailer << /Root 1 0 R /Encrypt 4 0 R /ID [ <"
        + id0.hex().encode() + b"> <" + id0.hex().encode() + b"> ] >>\n%%EOF\n"
    )


def _length_rewritten(head: bytes, n: int) -> bytes:
    """Rewrite the content stream's direct /Length (AES bodies grow:
    16-byte IV prefix + CBC padding)."""
    from nidaba_ray.stages.pdf import _LENGTH_RE

    out = _LENGTH_RE.sub(b"/Length " + str(n).encode(), head, count=1)
    assert out != head, "plain head lost its /Length"
    return out


def make_pdf_aes(doc_id: int, text: str) -> bytes:
    """AES-128 encrypted variant (/V 4 /R 4, crypt filter /CFM /AESV2,
    empty owner+user passwords). /O, /U and the file key follow the
    same §7.6.3 algorithms as R 3; the content stream is AES-128-CBC
    with the Algorithm-1 "sAlT" object key, a deterministic IV, and
    RFC 2898 padding."""
    import hashlib as _hl

    from nidaba_ray.algorithms import aes as _aes
    from nidaba_ray.stages.pdf import _aes_obj_key, _rc4, _std_file_key, _PAD

    plain = make_pdf(doc_id, text)
    head, rest = plain.split(b"stream\n", 1)
    body = rest.split(b"\nendstream", 1)[0]

    id0 = _hl.md5(f"aes-id-{SEED}-{doc_id}".encode()).digest()
    P, n = -44, 16
    okey = _hl.md5(_PAD).digest()
    for _ in range(50):
        okey = _hl.md5(okey[:n]).digest()
    okey = okey[:n]
    O = _rc4(okey, _PAD)
    for i in range(1, 20):
        O = _rc4(bytes(b ^ i for b in okey), O)
    key = _std_file_key(O, P, id0, 4, 128)
    x = _rc4(key, _hl.md5(_PAD + id0).digest())
    for i in range(1, 20):
        x = _rc4(bytes(b ^ i for b in key), x)
    U = x + b"\x00" * 16
    iv = _hl.md5(f"aes-iv-{SEED}-{doc_id}".encode()).digest()
    enc_body = iv + _aes.encrypt_cbc(
        _aes_obj_key(key, 3, 0), iv, _aes.pad16(body)
    )
    return (
        _length_rewritten(head, len(enc_body))
        + b"stream\n" + enc_body + b"\nendstream endobj\n"
        + b"4 0 obj << /Filter /Standard /V 4 /R 4 /Length 128"
        + b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
        + b" /StmF /StdCF /StrF /StdCF"
        + b" /P -44 /O <" + O.hex().encode() + b"> /U <" + U.hex().encode()
        + b"> >> endobj\n"
        + b"trailer << /Root 1 0 R /Encrypt 4 0 R /ID [ <"
        + id0.hex().encode() + b"> <" + id0.hex().encode() + b"> ] >>\n%%EOF\n"
    )


def make_pdf_aes256(doc_id: int, text: str, rev: int = 6) -> bytes:
    """AES-256 encrypted variant (/V 5, /CFM /AESV3): ``rev=6`` derives
    keys with the ISO 32000-2 Algorithm-2.B hardened hash, ``rev=5``
    with the deprecated single-SHA-256 draft scheme. Salts, the file
    key and the IV are deterministic (md5 of doc_id); /O and /OE are
    computed properly over /U so external tools validate too."""
    import hashlib as _hl

    from nidaba_ray.algorithms import aes as _aes
    from nidaba_ray.stages.pdf import _hash_2b

    if rev not in (5, 6):
        raise ValueError("rev must be 5 or 6")
    plain = make_pdf(doc_id, text)
    head, rest = plain.split(b"stream\n", 1)
    body = rest.split(b"\nendstream", 1)[0]

    seed = f"aes256-{SEED}-{doc_id}".encode()
    fkey = _hl.md5(seed + b"k0").digest() + _hl.md5(seed + b"k1").digest()
    vsalt = _hl.md5(seed + b"vs").digest()[:8]
    ksalt = _hl.md5(seed + b"ks").digest()[:8]
    if rev == 6:
        U = _hash_2b(b"", vsalt) + vsalt + ksalt
        ik = _hash_2b(b"", ksalt)
    else:
        U = _hl.sha256(vsalt).digest() + vsalt + ksalt
        ik = _hl.sha256(ksalt).digest()
    UE = _aes.encrypt_cbc(ik, bytes(16), fkey)
    ovs = _hl.md5(seed + b"ov").digest()[:8]
    oks = _hl.md5(seed + b"ok").digest()[:8]
    if rev == 6:
        O = _hash_2b(b"", ovs, U[:48]) + ovs + oks
        OE = _aes.encrypt_cbc(_hash_2b(b"", oks, U[:48]), bytes(16), fkey)
    else:
        O = _hl.sha256(ovs + U[:48]).digest() + ovs + oks
        OE = _aes.encrypt_cbc(
            _hl.sha256(oks + U[:48]).digest(), bytes(16), fkey
        )
    iv = _hl.md5(seed + b"iv").digest()
    enc_body = iv + _aes.encrypt_cbc(fkey, iv, _aes.pad16(body))
    return (
        _length_rewritten(head, len(enc_body))
        + b"stream\n" + enc_body + b"\nendstream endobj\n"
        + b"4 0 obj << /Filter /Standard /V 5 /R " + str(rev).encode()
        + b" /Length 256 /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
        + b" /StmF /StdCF /StrF /StdCF /P -44"
        + b" /O <" + O.hex().encode() + b"> /U <" + U.hex().encode()
        + b"> /OE <" + OE.hex().encode() + b"> /UE <" + UE.hex().encode()
        + b"> >> endobj\n"
        + b"trailer << /Root 1 0 R /Encrypt 4 0 R >>\n%%EOF\n"
    )


def make_invalid(doc_id: int) -> bytes:
    rng = random.Random(f"bad-{SEED}-{doc_id}")
    return bytes([rng.randint(0, 255) for _ in range(rng.randint(5, 64))])


def noisy_text(doc_id: int, text: str, rate: float = 0.02) -> str:
    """Character-noised candidate extraction (the third voter)."""
    rng = random.Random(f"noise-{SEED}-{doc_id}")
    chars = list(text)
    n = max(1, int(len(chars) * rate))
    for _ in range(n):
        i = rng.randrange(len(chars))
        if chars[i] != " ":
            chars[i] = chr(ord("a") + rng.randrange(26))
    return "".join(chars)


def payload_kind(doc_id: int) -> str:
    if doc_id % INVALID_MOD == INVALID_REM:
        return "invalid"
    if doc_id % PDF_MOD == PDF_REM:
        return "pdf"
    return "html"


def make_page(doc_id: int, text: str, lang: str,
              pdf_variant: str = "plain",
              html_variant: str = "plain") -> dict:
    kind = payload_kind(doc_id)
    if kind == "invalid":
        html = make_invalid(doc_id)
    elif kind == "pdf":
        html = {"plain": make_pdf, "flate": make_pdf_flate,
                "utf16": make_pdf_utf16,
                "diff": make_pdf_diff,
                "twofont": make_pdf_twofont,
                "rc4": make_pdf_rc4,
                "aes": make_pdf_aes,
                "aes256": make_pdf_aes256,
                # R5 is the fast draft KDF — corpus-sized tests use it;
                # R6's Algorithm-2.B hash is intentionally ~1s/doc and
                # stays a single-doc unit test
                "aes256r5": lambda d, t: make_pdf_aes256(d, t, rev=5),
                # the zip-container document formats ride the same
                # dialect slot (round-5: DOCX/EPUB extraction)
                "docx": make_docx,
                "epub": make_epub,
                }[pdf_variant](doc_id, text)
    else:
        html = make_html(doc_id, text, lang)
        if html_variant == "gzip":
            # per-record gzip (CC WARC convention); mtime=0 keeps the
            # member bytes deterministic
            import gzip

            html = gzip.compress(html, mtime=0)
    return {
        "url": url_for(doc_id),
        "warc_ts": BASE_TS_US + doc_id * 1_000_000,
        "html": html,
        "text": noisy_text(doc_id, text),
        "lang": lang,
    }


def pages_batch_from_documents(batch: pa.Table,
                               pdf_variant: str = "plain",
                               html_variant: str = "plain") -> pa.Table:
    """Vectorizable wrapper: a documents batch → a pages batch.

    Runs inside ``map_batches`` so page synthesis is itself distributed
    (no driver-side loop; sf0.1 = 5e4 pages, 100 TB-scale would stream).
    doc_id is carried through for oracle joins."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    rows = [make_page(d, t, l, pdf_variant, html_variant)
            for d, t, l in zip(doc_ids, texts, langs)]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )


def pages_dataset_from_documents(sf_dir: str, pdf_variant: str = "plain",
                                 html_variant: str = "plain"):
    """documents.parquet → Dataset of pages (distributed synthesis)."""
    import ray.data as rd

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    if pdf_variant == "plain" and html_variant == "plain":
        return docs.map_batches(
            pages_batch_from_documents, batch_format="pyarrow"
        )
    return docs.map_batches(
        lambda b: pages_batch_from_documents(b, pdf_variant, html_variant),
        batch_format="pyarrow",
    )


def pages_table(n: int = 500, dup_frac: float = 0.05) -> pa.Table:
    """Standalone small pages table for unit/golden tests: n synthetic
    docs with seeded token text, plus ``dup_frac`` re-crawls (same url,
    later warc_ts, same content) for dedup keep-latest tests."""
    rng = random.Random(f"pages-{SEED}")
    vocab = [f"word{i:03d}" for i in range(200)]
    langs = ["en", "de", "es", "fr", "zh"]
    rows = []
    for doc_id in range(n):
        nw = rng.randint(12, 160)
        text = " ".join(rng.choice(vocab) for _ in range(nw))
        lang = langs[doc_id % len(langs)]
        rows.append(make_page(doc_id, text, lang) | {"doc_id": doc_id, "golden": text})
    n_dup = int(n * dup_frac)
    for doc_id in range(n_dup):  # re-crawl of the first n_dup docs
        r = dict(rows[doc_id])
        r["warc_ts"] = r["warc_ts"] + 86_400_000_000  # +1 day
        rows.append(r)
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "golden": pa.array([r["golden"] for r in rows], pa.string()),
        }
    )
