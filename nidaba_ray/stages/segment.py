"""DOM → block segmentation — the layout-analysis analog.

nidaba's segmentation.tesseract/kraken produce page zones + lines
(nidaba/tasks/segmentation.py, UNVERIFIED per SURVEY.md §0); here a
lenient HTML parse produces a flat block list (p/h*/li/td/pre/...)
with DOM depth, tag kind, text length and anchor-text length — the
inputs to main-content scoring (the binarization analog).

The block *machine* (stack semantics: block/container/chrome/skip/
anchor handling) lives in ONE class, ``BlockMachine``, driven by two
parse fronts: the stdlib ``html.parser`` (reference) and the regex
scanner in ``fastsegment.py`` (default, ~2× faster). Sharing the
machine means the two fronts can only diverge in *tokenization*, which
is exactly what the equivalence fuzz suite (tests/test_fastsegment.py)
gates.

Real-page semantics (beyond the synthetic corpus):
  * structural containers (div/section/ul/table/...) are block
    BOUNDARIES — sibling ``<div>A</div><div>B</div>`` texts become two
    blocks, not one (div-soup articles segment correctly);
  * chrome is detected by tag (nav/aside/...), by ``class``/``id``
    token (cookie banners, share bars, comment threads, related-link
    grids...), and by ``role`` (navigation/banner/contentinfo/...);
  * hidden subtrees (``hidden``, ``aria-hidden="true"``,
    ``style="display:none"``) contribute no text at all.

Pure Python, deterministic; constructed once per actor in the
extraction stage. At real 100 TB scale the parser implementation is
swappable behind the same block-list contract (e.g. a C parser) —
determinism requires every worker to run the same one.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

__all__ = ["segment_html", "Block", "BlockMachine"]

# Tags whose text forms its own block (reading-order leaf zones).
BLOCK_TAGS = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th", "pre",
    "blockquote", "dd", "dt", "figcaption", "caption", "summary",
}
# Containers that mark "page chrome" (site furniture) — the prior that
# lowers a block's score, analog of layout zones labeled non-text.
CHROME_TAGS = {"nav", "aside", "footer", "header"}
# Structural containers: opening or closing one is a block boundary
# (an implicit div-text block never spans sibling containers). Chrome
# tags are containers too — the flush set is the union.
CONTAINER_TAGS = {
    "div", "section", "article", "main", "body", "ul", "ol", "dl",
    "table", "thead", "tbody", "tfoot", "tr", "form", "fieldset",
    "figure", "details", "address", "hgroup",
}
_FLUSH_TAGS = CONTAINER_TAGS | CHROME_TAGS
# Elements whose content is never page text: executable/styling
# payloads, the head, vector graphics (svg <text> labels are drawing
# instructions), MathML (glyph runs carry no inter-element spacing —
# formula markup is noise for a text corpus), and iframe inner markup
# (legacy fallback rendered only by frameless browsers; the framed
# document itself is a separate fetch).
SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "head",
             "math", "iframe"}
# Void elements (never pushed on the open-tag stack).
VOID_TAGS = {"br", "hr", "img", "input", "meta", "link", "area", "base",
             "col", "embed", "source", "track", "wbr"}

_WS = re.compile(r"\s+")

# class/id tokens that mark site furniture on otherwise-neutral tags
# (a <div class="cookie-banner">, <section id="comments">, ...).
# Matched per whitespace-separated token, with -/_ as sub-separators:
# "site-header" and "main_nav" hit; "content" and "navigate" don't.
_CHROME_WORDS = (
    "nav|navbar|menu|sidebar|aside|footer|header|banner|breadcrumbs?|"
    "cookie|consent|gdpr|promo|ads?|advert|advertisement|sponsored?|"
    "share|sharing|social|related|recommended|recommendations|widget|"
    "newsletter|subscribe|signup|modal|popup|overlay|paywall|"
    "comments?|disqus|pagination|pager|toolbar|masthead|byline|meta|"
    "infobox|reply|replies|feedback"
)
_CHROME_CLASS = re.compile(
    rf"(?:^|[-_])(?:{_CHROME_WORDS})(?:[-_]|$)", re.IGNORECASE
)
_CHROME_ROLES = {"navigation", "banner", "contentinfo", "complementary",
                 "search"}
_HIDDEN_STYLE = re.compile(r"display\s*:\s*none|visibility\s*:\s*hidden",
                           re.IGNORECASE)


def _attrs_mark_chrome(attrs) -> bool:
    """True if class/id/role attributes mark this element as chrome."""
    for name, value in attrs:
        if not value:
            continue
        if name in ("class", "id"):
            for tok in value.split():
                if _CHROME_CLASS.search(tok):
                    return True
        elif name == "role" and value.strip().lower() in _CHROME_ROLES:
            return True
    return False


_MODAL_ROLES = {"dialog", "alertdialog"}


def _attrs_mark_hidden(attrs) -> bool:
    """True if the element is hidden (content contributes no text).

    Modal dialogs (``role="dialog"``/``"alertdialog"``, or
    ``aria-modal="true"``) count as hidden: a dialog overlays the
    document rather than being part of it — consent walls, paywall
    prompts, login modals — so its text is interaction UI, never page
    text (same rationale as iframe fallbacks). Class-marked walls
    without ARIA roles are handled by the chrome score damping
    instead (fixture ``consent_wall_classonly``)."""
    for name, value in attrs:
        if name == "hidden":
            return True
        if name == "aria-hidden" and value and value.strip().lower() == "true":
            return True
        if name == "aria-modal" and value and value.strip().lower() == "true":
            return True
        if name == "role" and value and value.strip().lower() in _MODAL_ROLES:
            return True
        if name == "style" and value and _HIDDEN_STYLE.search(value):
            return True
    return False


class Block:
    __slots__ = ("kind", "depth", "text", "anchor_chars", "in_chrome", "n_tags")

    def __init__(self, kind: str, depth: int, in_chrome: bool):
        self.kind = kind
        self.depth = depth
        self.in_chrome = in_chrome
        self.text = ""
        self.anchor_chars = 0
        self.n_tags = 0


class BlockMachine:
    """The shared stack machine: ``start``/``end``/``data`` events in,
    reading-order blocks out. Both parse fronts drive this one class —
    block semantics cannot diverge between them."""

    __slots__ = ("stack", "skip_flags", "chrome_flags", "blocks", "cur",
                 "cur_parts", "skip_depth", "chrome_depth", "anchor_depth")

    def __init__(self) -> None:
        self.stack: list[str] = []
        self.skip_flags: list[bool] = []
        self.chrome_flags: list[bool] = []
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

    def start(self, tag: str, attrs=()) -> None:
        if tag in VOID_TAGS:
            if self.cur is not None and tag == "br":
                self.cur_parts.append(" ")
            return
        skip_inc = tag in SKIP_TAGS or (bool(attrs) and _attrs_mark_hidden(attrs))
        chrome_inc = tag in CHROME_TAGS or (
            not skip_inc and bool(attrs) and _attrs_mark_chrome(attrs)
        )
        if skip_inc:
            self.skip_depth += 1
        if chrome_inc:
            self.chrome_depth += 1
        if tag == "a":
            self.anchor_depth += 1
        entered_skip = skip_inc and self.skip_depth == 1
        if self.skip_depth == 0:
            if tag in BLOCK_TAGS:
                self._flush()
                self.cur = Block(tag, len(self.stack), self.chrome_depth > 0)
            elif tag in _FLUSH_TAGS:
                self._flush()
            elif self.cur is not None:
                self.cur.n_tags += 1
        elif entered_skip and (tag in BLOCK_TAGS or tag in _FLUSH_TAGS):
            # a newly-hidden subtree is still a block boundary
            self._flush()
        elif self.cur is not None:
            self.cur.n_tags += 1
        self.stack.append(tag)
        self.skip_flags.append(skip_inc)
        self.chrome_flags.append(chrome_inc)

    def end(self, tag: str) -> None:
        if tag in VOID_TAGS:
            return
        # lenient: pop to the nearest matching open tag (tag soup safe)
        if tag in self.stack:
            while self.stack:
                t = self.stack.pop()
                if self.skip_flags.pop():
                    self.skip_depth = max(0, self.skip_depth - 1)
                if self.chrome_flags.pop():
                    self.chrome_depth = max(0, self.chrome_depth - 1)
                if t == "a":
                    self.anchor_depth = max(0, self.anchor_depth - 1)
                if t in BLOCK_TAGS and self.cur is not None and t == self.cur.kind:
                    self._flush()
                elif t in _FLUSH_TAGS and self.skip_depth == 0:
                    self._flush()
                if t == tag:
                    break

    def data(self, text: str) -> None:
        """``text`` is already entity-decoded (both fronts decode)."""
        if self.skip_depth or not text:
            return
        if self.cur is None:
            # bare text directly under a container (leaf-div case):
            # open an implicit block so no text is lost.
            if text.strip():
                parent = self.stack[-1] if self.stack else "body"
                self.cur = Block("div" if parent not in BLOCK_TAGS else parent,
                                 len(self.stack), self.chrome_depth > 0)
            else:
                return
        self.cur_parts.append(text)
        if self.anchor_depth:
            self.cur.anchor_chars += len(_WS.sub(" ", text).strip())


class _Segmenter(HTMLParser):
    """stdlib parse front: one pass over the document, machine events
    out. Reference implementation for the equivalence suite."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.m = BlockMachine()

    def handle_starttag(self, tag: str, attrs) -> None:
        self.m.start(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        self.m.end(tag)

    def handle_data(self, data: str) -> None:
        self.m.data(data)

    def close(self) -> None:  # flush trailing block
        super().close()
        self.m._flush()


def segment_html_stdlib(html_text: str) -> list[Block]:
    """Reference implementation over stdlib html.parser — kept as the
    equivalence oracle for the fast scanner (tests/test_fastsegment.py
    asserts block-identical output; both must change together)."""
    seg = _Segmenter()
    seg.feed(html_text)
    seg.close()
    return seg.m.blocks


def segment_html(html_text: str) -> list[Block]:
    """Parse an HTML document into reading-order blocks.

    Never raises on tag soup (per-row error isolation happens one level
    up, on decode failures). Dispatches to the regex-scanner
    implementation (~2× faster; html.parser was 50% of flagship
    per-row cost) — verified block-identical to the stdlib path."""
    from nidaba_ray.stages.fastsegment import segment_html_fast

    return segment_html_fast(html_text)
