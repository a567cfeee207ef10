"""Office/ebook container extraction — DOCX (OOXML WordprocessingML)
and EPUB (OCF), the two zip-packaged document formats a web crawl
actually carries in volume beside PDF. Stdlib ``zipfile`` only; the
XML inside is scanned with compiled patterns (the same
regex-over-known-grammar approach as the PDF content tokenizer —
both formats pin their part layout in public specs: ECMA-376 for
``word/document.xml``, the EPUB OCF spec for
``META-INF/container.xml`` → OPF → spine).

* DOCX: paragraphs are ``<w:p>`` elements; visible text is the
  concatenation of their ``<w:t>`` runs (entity-decoded;
  ``<w:tab/>``/``<w:br/>`` contribute a space). A document body is
  content by construction (no site chrome), so spans take the PDF
  convention: score = text length, depth 0.
* EPUB: ``container.xml`` names the OPF; the OPF's manifest maps ids
  to hrefs and the spine orders the content documents; each chapter
  is XHTML and flows through the SAME html segmenter + scorer as web
  pages (chrome handling comes free for publisher boilerplate).

Malformed containers raise ValueError — extract_row's per-row
quarantine contract."""

from __future__ import annotations

import io
import posixpath
import re
import zipfile
from html import unescape

__all__ = ["ZIP_MAGIC", "sniff_office", "extract_docx_paragraphs",
           "epub_chapters"]

ZIP_MAGIC = b"PK\x03\x04"

_WP_RE = re.compile(rb"<w:p[ >].*?</w:p>|<w:p/>", re.S)
_WT_RE = re.compile(rb"<w:t(?: [^>]*)?>(.*?)</w:t>|<w:(?:tab|br)\s*/>",
                    re.S)
_ROOTFILE_RE = re.compile(rb'full-path\s*=\s*["\']([^"\']+)["\']')
_ITEM_RE = re.compile(rb"<(?:[A-Za-z0-9]+:)?item\s[^>]*>")
_IDREF_RE = re.compile(
    rb"<(?:[A-Za-z0-9]+:)?itemref\s[^>]*idref\s*=\s*[\"']([^\"']+)[\"']")
_ATTR_ID_RE = re.compile(rb"(?:^|\s)id\s*=\s*[\"']([^\"']+)[\"']")
_ATTR_HREF_RE = re.compile(rb"(?:^|\s)href\s*=\s*[\"']([^\"']+)[\"']")


def sniff_office(payload: bytes) -> str | None:
    """"docx" / "epub" / None — cheap: the zip central directory only
    (no part decompression)."""
    if payload[:4] != ZIP_MAGIC:
        return None
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as z:
            names = set(z.namelist())
    except (zipfile.BadZipFile, OSError, ValueError):
        return None
    if "word/document.xml" in names:
        return "docx"
    if "META-INF/container.xml" in names:
        return "epub"
    return None


def extract_docx_paragraphs(payload: bytes) -> list[str]:
    """DOCX bytes → visible paragraph texts in document order."""
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as z:
            doc = z.read("word/document.xml")
    except (zipfile.BadZipFile, KeyError, OSError, ValueError) as e:
        raise ValueError(f"docx: {e}") from None
    out = []
    for pm in _WP_RE.finditer(doc):
        runs = []
        for m in _WT_RE.finditer(pm.group(0)):
            if m.group(1) is None:      # <w:tab/> / <w:br/>
                runs.append(" ")
            else:
                runs.append(unescape(m.group(1).decode("utf-8", "strict")))
        text = "".join(runs).strip()
        if text:
            out.append(text)
    return out


def epub_chapters(payload: bytes) -> list[bytes]:
    """EPUB bytes → content-document (XHTML) bytes in spine order."""
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as z:
            container = z.read("META-INF/container.xml")
            m = _ROOTFILE_RE.search(container)
            if not m:
                raise ValueError("epub: container.xml has no rootfile")
            opf_path = m.group(1).decode("utf-8")
            opf = z.read(opf_path)
            base = posixpath.dirname(opf_path)
            hrefs: dict[bytes, bytes] = {}
            for im in _ITEM_RE.finditer(opf):
                tag = im.group(0)
                mid = _ATTR_ID_RE.search(tag)
                mhref = _ATTR_HREF_RE.search(tag)
                if mid and mhref:
                    hrefs[mid.group(1)] = mhref.group(1)
            chapters = []
            for rm in _IDREF_RE.finditer(opf):
                href = hrefs.get(rm.group(1))
                if href is None:
                    continue
                path = posixpath.normpath(posixpath.join(
                    base, unescape(href.decode("utf-8"))))
                chapters.append(z.read(path))
            if not chapters:
                raise ValueError("epub: empty spine")
            return chapters
    except (zipfile.BadZipFile, KeyError, OSError) as e:
        raise ValueError(f"epub: {e}") from None
