"""DOM → block segmentation — the layout-analysis analog.

nidaba's segmentation.tesseract/kraken produce page zones + lines
(nidaba/tasks/segmentation.py, UNVERIFIED per SURVEY.md §0); here a
lenient HTML parse produces a flat block list (p/h*/li/td/pre/...)
with DOM depth, tag kind, text length and anchor-text length — the
inputs to main-content scoring (the binarization analog).

Pure Python (stdlib ``html.parser``), deterministic; constructed once
per actor in the extraction stage. At real 100 TB scale the parser
implementation is swappable behind the same block-list contract (e.g.
a C parser) — determinism requires every worker to run the same one.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

__all__ = ["segment_html", "Block"]

# Tags whose text forms its own block (reading-order leaf zones).
BLOCK_TAGS = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th", "pre",
    "blockquote", "dd", "dt", "figcaption", "caption",
}
# Containers that mark "page chrome" (site furniture) — the prior that
# lowers a block's score, analog of layout zones labeled non-text.
CHROME_TAGS = {"nav", "aside", "footer", "header"}
# Elements whose content is never text.
SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "head"}
# Void elements (never pushed on the open-tag stack).
VOID_TAGS = {"br", "hr", "img", "input", "meta", "link", "area", "base",
             "col", "embed", "source", "track", "wbr"}

_WS = re.compile(r"\s+")


class Block:
    __slots__ = ("kind", "depth", "text", "anchor_chars", "in_chrome", "n_tags")

    def __init__(self, kind: str, depth: int, in_chrome: bool):
        self.kind = kind
        self.depth = depth
        self.in_chrome = in_chrome
        self.text = ""
        self.anchor_chars = 0
        self.n_tags = 0


class _Segmenter(HTMLParser):
    """One pass over the document; emits blocks in reading order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[str] = []
        self.blocks: list[Block] = []
        self.cur: Block | None = None
        self.cur_parts: list[str] = []
        self.skip_depth = 0
        self.chrome_depth = 0
        self.anchor_depth = 0

    def _flush(self) -> None:
        if self.cur is not None:
            text = _WS.sub(" ", "".join(self.cur_parts)).strip()
            self.cur.text = text
            if text:
                self.blocks.append(self.cur)
            self.cur = None
            self.cur_parts = []

    def handle_starttag(self, tag: str, attrs) -> None:
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

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_TAGS:
            return
        # lenient: pop to the nearest matching open tag (tag soup safe)
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

    def handle_data(self, data: str) -> None:
        if self.skip_depth or not data:
            return
        if self.cur is None:
            # bare text directly under a container (leaf-div case):
            # open an implicit block so no text is lost.
            if data.strip():
                parent = self.stack[-1] if self.stack else "body"
                self.cur = Block("div" if parent not in BLOCK_TAGS else parent,
                                 len(self.stack), self.chrome_depth > 0)
            else:
                return
        self.cur_parts.append(data)
        if self.anchor_depth:
            self.cur.anchor_chars += len(_WS.sub(" ", data).strip())

    def close(self) -> None:  # flush trailing block
        super().close()
        self._flush()


def segment_html_stdlib(html_text: str) -> list[Block]:
    """Reference implementation over stdlib html.parser — kept as the
    equivalence oracle for the fast scanner (tests/test_fastsegment.py
    asserts block-identical output; both must change together)."""
    seg = _Segmenter()
    seg.feed(html_text)
    seg.close()
    return seg.blocks


def segment_html(html_text: str) -> list[Block]:
    """Parse an HTML document into reading-order blocks.

    Never raises on tag soup (per-row error isolation happens one level
    up, on decode failures). Dispatches to the regex-scanner
    implementation (~2× faster; html.parser was 50% of flagship
    per-row cost) — verified block-identical to the stdlib path."""
    from nidaba_ray.stages.fastsegment import segment_html_fast

    return segment_html_fast(html_text)
