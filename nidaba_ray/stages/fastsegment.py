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
    # tag-name charsets mirror html.parser's tolerant regexes exactly
    # (tagfind_tolerant / endtagfind): start names run to whitespace,
    # '/', '>' or NUL (so '<p.x>' and even '<b<em>' are tag names);
    # end names use the letter/digit/-.:_ charset with attrs ignored.
    r"<!--.*?(?:-->|$)"                 # comments
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"       # CDATA
    r"|<![^>]*>"                        # doctype / other declarations
    r"|<\?[^>]*>"                       # processing instructions
    r"|</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)[^>]*>"  # end tag   (group 1)
    r"|</[^>]*>",                       # bogus end tag → skipped (</>, </123>)
    re.S,
)
_TAGNAME = re.compile(r"[a-zA-Z][^\t\n\r\f />\x00]*")
_RAWDATA_END = {
    # lookahead mirrors set_cdata_mode: '</scripty>' must NOT close
    "script": re.compile(r"</script(?=[\s/>])[^>]*>|</script>", re.I),
    "style": re.compile(r"</style(?=[\s/>])[^>]*>|</style>", re.I),
}
_WS = re.compile(r"\s+")
_HAS_ENTITY = re.compile(r"&[#a-zA-Z]")

# Start tags are parsed with html.parser's OWN compiled regexes and a
# faithful transcription of parse_starttag/check_for_whole_start_tag —
# parity with the stdlib reference implementation by construction
# (verified by the equivalence fuzz suite). All three are C-backed
# compiled patterns; the walk runs once per tag.
from html.parser import attrfind_tolerant as _ATTRFIND
from html.parser import locatestarttagend_tolerant as _STDLIB_TAGEND
from html.parser import tagfind_tolerant as _TAGFIND

_LETTERS_EQ_SLASH = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=/"
)


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
        nxt = html_text[lt + 1] if lt + 1 < n else ""
        if nxt.isalpha():
            # faithful check_for_whole_start_tag
            m2 = _STDLIB_TAGEND.match(html_text, lt)
            j = m2.end()
            nxtc = html_text[j : j + 1]
            if nxtc == ">":
                endpos = j + 1
            elif nxtc == "/":
                if html_text.startswith("/>", j):
                    endpos = j + 2
                elif j + 1 >= n:
                    endpos = -1  # buffer boundary → incomplete at EOF
                else:
                    endpos = j if j > lt else lt + 1
            elif nxtc == "" or nxtc in _LETTERS_EQ_SLASH:
                endpos = -1  # end of input mid-tag
            else:
                endpos = j if j > lt else lt + 1
            if endpos < 0:
                # goahead's EOF recovery: data up to and including the
                # next '>', else up to the next '<', else just '<'
                gt = html_text.find(">", lt + 1)
                if gt >= 0:
                    k2 = gt + 1
                else:
                    lt2 = html_text.find("<", lt + 1)
                    k2 = lt2 if lt2 >= 0 else lt + 1
                seg.data(html_text[lt:k2])
                pos = k2
                continue
            # faithful parse_starttag: name + attr walk decide whether
            # the trailing text is '>', '/>' or junk (→ data)
            tm = _TAGFIND.match(html_text, lt + 1)
            name = tm.group(1).lower()
            k = tm.end()
            while k < endpos:
                am = _ATTRFIND.match(html_text, k)
                if not am:
                    break
                k = am.end()
            end = html_text[k:endpos].strip()
            if end not in (">", "/>"):
                seg.data(html_text[lt:endpos])  # malformed slice → text
                pos = endpos
                continue
            if name in _RAWDATA_END and end == ">":
                seg.start(name)
                m3 = _RAWDATA_END[name].search(html_text, endpos)
                pos = n if m3 is None else m3.end()
                seg.end(name)
                continue
            seg.start(name)
            if end == "/>" and name not in VOID_TAGS:
                seg.end(name)
            pos = endpos
            continue
        m = _TOKEN.match(html_text, lt)
        if m is None:
            seg.data("<")  # stray '<' is text (lenient, like html.parser)
            pos = lt + 1
            continue
        end_tag = m.group(1)
        pos = m.end()
        if end_tag is not None:
            seg.end(end_tag.lower())
        # comments / doctype / CDATA / PI / bogus end tags: skipped
    seg._flush()
    return seg.blocks
