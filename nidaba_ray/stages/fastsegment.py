"""Regex-scanner HTML segmenter — a drop-in, faster implementation of
``segment.segment_html``'s block contract.

The stdlib ``html.parser`` is ~50% of flagship per-row cost (profiled,
BASELINE.md). This scanner tokenizes with one compiled regex and runs
the same stack machine (block tags / chrome / skip / void / anchors /
implicit blocks). Determinism requires every worker to run the SAME
segmenter, so the default is switched in ``segment.segment_html`` only
because the two implementations are verified block-identical on the
full test corpus + a tag-soup fuzz (tests/test_fastsegment.py); if you
change either, re-run that equivalence suite.

Intentional scope (same as the html.parser path needs):
  * entities decoded in text nodes (html.unescape);
  * <script>/<style> content treated as raw data until the closing tag;
  * comments / doctype / CDATA skipped;
  * tag-soup tolerant (stray ``<`` is text; unclosed tags pop leniently).
"""

from __future__ import annotations

import re
from html import unescape

from nidaba_ray.stages.segment import (
    BLOCK_TAGS,
    CHROME_TAGS,
    SKIP_TAGS,
    VOID_TAGS,
    Block,
)

__all__ = ["segment_html_fast"]

_TOKEN = re.compile(
    r"<!--.*?(?:-->|$)"                 # comments
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"       # CDATA
    r"|<![^>]*>"                        # doctype / other declarations
    r"|<\?[^>]*>"                       # processing instructions
    r"|</\s*([a-zA-Z][a-zA-Z0-9-]*)[^>]*>"   # end tag   (group 1)
    r"|<([a-zA-Z][a-zA-Z0-9-]*)"             # start tag (group 2)
    r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>",   # attrs: quote-aware (group 3)
    re.S,
)
_RAWDATA_END = {
    "script": re.compile(r"</script[^>]*>", re.I),
    "style": re.compile(r"</style[^>]*>", re.I),
}
_WS = re.compile(r"\s+")
_HAS_ENTITY = re.compile(r"&[#a-zA-Z]")


class _FastSegmenter:
    __slots__ = ("stack", "blocks", "cur", "cur_parts", "chrome_depth",
                 "anchor_depth", "skip_depth")

    def __init__(self) -> None:
        self.stack: list[str] = []
        self.blocks: list[Block] = []
        self.cur: Block | None = None
        self.cur_parts: list[str] = []
        self.chrome_depth = 0
        self.anchor_depth = 0
        self.skip_depth = 0

    def _flush(self) -> None:
        if self.cur is not None:
            text = _WS.sub(" ", "".join(self.cur_parts)).strip()
            self.cur.text = text
            if text:
                self.blocks.append(self.cur)
            self.cur = None
            self.cur_parts = []

    def start(self, tag: str) -> None:
        if tag in VOID_TAGS:
            if self.cur is not None and tag == "br":
                self.cur_parts.append(" ")
            return
        if tag in SKIP_TAGS:
            self.skip_depth += 1
        if tag in CHROME_TAGS:
            self.chrome_depth += 1
        if tag == "a":
            self.anchor_depth += 1
        if tag in BLOCK_TAGS and self.skip_depth == 0:
            self._flush()
            self.cur = Block(tag, len(self.stack), self.chrome_depth > 0)
        elif self.cur is not None:
            self.cur.n_tags += 1
        self.stack.append(tag)

    def end(self, tag: str) -> None:
        if tag in VOID_TAGS:
            return
        if tag in self.stack:
            while self.stack:
                t = self.stack.pop()
                if t in SKIP_TAGS:
                    self.skip_depth = max(0, self.skip_depth - 1)
                if t in CHROME_TAGS:
                    self.chrome_depth = max(0, self.chrome_depth - 1)
                if t == "a":
                    self.anchor_depth = max(0, self.anchor_depth - 1)
                if t in BLOCK_TAGS and self.cur is not None and t == self.cur.kind:
                    self._flush()
                if t == tag:
                    break

    def data(self, raw: str) -> None:
        if self.skip_depth or not raw:
            return
        text = unescape(raw) if _HAS_ENTITY.search(raw) else raw
        if self.cur is None:
            if text.strip():
                parent = self.stack[-1] if self.stack else "body"
                self.cur = Block(
                    "div" if parent not in BLOCK_TAGS else parent,
                    len(self.stack), self.chrome_depth > 0,
                )
            else:
                return
        self.cur_parts.append(text)
        if self.anchor_depth:
            self.cur.anchor_chars += len(_WS.sub(" ", text).strip())


def segment_html_fast(html_text: str) -> list[Block]:
    seg = _FastSegmenter()
    pos = 0
    n = len(html_text)
    while pos < n:
        lt = html_text.find("<", pos)
        if lt == -1:
            seg.data(html_text[pos:])
            break
        if lt > pos:
            seg.data(html_text[pos:lt])
        m = _TOKEN.match(html_text, lt)
        if m is None:
            seg.data("<")  # stray '<' is text (lenient, like html.parser)
            pos = lt + 1
            continue
        end_tag, start_tag = m.group(1), m.group(2)
        pos = m.end()
        if start_tag is not None:
            tag = start_tag.lower()
            attrs = m.group(3) or ""
            self_closing = attrs.rstrip().endswith("/")
            if tag in _RAWDATA_END:
                # raw content until the matching close tag
                seg.start(tag)
                m2 = _RAWDATA_END[tag].search(html_text, pos)
                if m2 is None:
                    pos = n
                    seg.end(tag)
                else:
                    pos = m2.end()
                    seg.end(tag)
                continue
            seg.start(tag)
            if self_closing and tag not in VOID_TAGS:
                seg.end(tag)
        elif end_tag is not None:
            seg.end(end_tag.lower())
        # comments / doctype / CDATA / PI: skipped
    seg._flush()
    return seg.blocks
