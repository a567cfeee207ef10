"""Regex-scanner HTML segmenter — a drop-in, faster implementation of
``segment.segment_html``'s block contract.

The stdlib ``html.parser`` is ~50% of flagship per-row cost (profiled,
BASELINE.md). This scanner tokenizes with one compiled regex and feeds
the SAME ``segment.BlockMachine`` the stdlib front drives — the block
semantics (block tags / containers / chrome / hidden / void / anchors /
implicit blocks) live in one shared class, so the two implementations
can only diverge in tokenization. Determinism requires every worker to
run the SAME segmenter; the default is switched in
``segment.segment_html`` only because the two fronts are verified
block-identical on the full test corpus + a tag-soup fuzz
(tests/test_fastsegment.py); if you change either, re-run that suite.

Intentional scope (same as the html.parser path needs):
  * entities decoded in text nodes (html.unescape) and attr values;
  * <script>/<style> content treated as raw data until the closing tag;
  * comments / doctype / CDATA skipped;
  * tag-soup tolerant (stray ``<`` is text; unclosed tags pop leniently).
"""

from __future__ import annotations

import re
from html import unescape

from nidaba_ray.stages.segment import (
    VOID_TAGS,
    Block,
    BlockMachine,
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

# Only these attributes influence block semantics (segment.py machine);
# values of all others are skipped without group extraction.
_INTEREST_ATTRS = frozenset(
    ("class", "id", "role", "hidden", "aria-hidden", "style")
)
# Cheap pre-check on the raw tag slice: when none of the interesting
# attr names can occur, the attr walk skips all group extraction (the
# common case — most tags carry only href/src; false positives from
# substrings in values just take the slower exact path).
_HAS_INTEREST = re.compile(r"class|id|role|hidden|style", re.I)


class _FastFront:
    """Tokenizer state: wraps the shared machine with the fast data
    path (entity decode only when an entity is present)."""

    __slots__ = ("m",)

    def __init__(self) -> None:
        self.m = BlockMachine()

    def data(self, raw: str) -> None:
        if self.m.skip_depth or not raw:
            return
        self.m.data(unescape(raw) if _HAS_ENTITY.search(raw) else raw)


def segment_html_fast(html_text: str) -> list[Block]:
    seg = _FastFront()
    m_start = seg.m.start
    m_end = seg.m.end
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
            # the trailing text is '>', '/>' or junk (→ data); attrs of
            # interest are extracted exactly as parse_starttag does
            # (lowercased name, quote-stripped + unescaped value).
            tm = _TAGFIND.match(html_text, lt + 1)
            name = tm.group(1).lower()
            k = tm.end()
            attrs: list[tuple[str, str | None]] = []
            if _HAS_INTEREST.search(html_text, k, endpos) is None:
                while k < endpos:  # fast path: no group extraction
                    am = _ATTRFIND.match(html_text, k)
                    if not am:
                        break
                    k = am.end()
            else:
                while k < endpos:
                    am = _ATTRFIND.match(html_text, k)
                    if not am:
                        break
                    aname = am.group(1).lower()
                    if aname in _INTEREST_ATTRS:
                        rest, avalue = am.group(2), am.group(3)
                        if not rest:
                            avalue = None
                        elif avalue[:1] == "'" == avalue[-1:] or \
                                avalue[:1] == '"' == avalue[-1:]:
                            avalue = avalue[1:-1]
                        if avalue:
                            avalue = unescape(avalue)
                        attrs.append((aname, avalue))
                    k = am.end()
            end = html_text[k:endpos].strip()
            if end not in (">", "/>"):
                seg.data(html_text[lt:endpos])  # malformed slice → text
                pos = endpos
                continue
            if name in _RAWDATA_END and end == ">":
                m_start(name, attrs)
                m3 = _RAWDATA_END[name].search(html_text, endpos)
                pos = n if m3 is None else m3.end()
                m_end(name)
                continue
            m_start(name, attrs)
            if end == "/>" and name not in VOID_TAGS:
                m_end(name)
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
            m_end(end_tag.lower())
        # comments / doctype / CDATA / PI / bogus end tags: skipped
    seg.m._flush()
    return seg.m.blocks
