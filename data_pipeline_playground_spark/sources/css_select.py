"""Minimal CSS-selector engine on stdlib html.parser (S6 css_extract).

The reference extracts article bodies with pyquery selectors of exactly
four shapes (news_parsers.py:16-51): ``tag.class``, ``tag#id``,
``tag[attr="value"]`` and ``tag[attr^="prefix"]`` — no combinators, no
pseudo-classes. The container ships neither lxml nor bs4, so this module
implements that subset on the stdlib parser with the reference's
semantics (gen_parser, news_parsers.py:1-13):

- find ALL elements matching the selector anywhere in the document;
- if the match count != 1 → None (ambiguous page layout = no text);
- else return the single element's text with <script>/<style> subtrees
  removed and whitespace normalized (pyquery ``.text()`` analog).

This runs inside Arrow-batched mapInPandas on executors — pure Python
per page is the unavoidable cost of HTML; the Spark-side plumbing keeps
it off the driver and batched.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# HTML void elements never get a closing tag; treat them as leaves.
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

_SELECTOR_RE = re.compile(
    r"""^(?P<tag>[a-zA-Z][a-zA-Z0-9-]*)
        (?:
            \.(?P<cls>[\w-]+)
          | \#(?P<id>[\w-]+)
          | \[(?P<attr>[\w-]+)(?P<op>\^?=)["'](?P<val>[^"']*)["']\]
        )?$""",
    re.VERBOSE,
)


class Element:
    """One DOM node: tag, attrs dict, ordered children (Element | str)."""

    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list["Element | str"] = []

    def iter_elements(self):
        """Depth-first over descendant elements, self included."""
        yield self
        for c in self.children:
            if isinstance(c, Element):
                yield from c.iter_elements()


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]", {})
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(tag, {k: (v or "") for k, v in attrs})
        self._stack[-1].children.append(el)
        if tag not in _VOID:
            self._stack.append(el)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].children.append(
            Element(tag, {k: (v or "") for k, v in attrs})
        )

    def handle_endtag(self, tag):
        # close the nearest open element of this tag; tolerate strays
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        if not data:
            return
        kids = self._stack[-1].children
        # merge adjacent text (incremental feed() splits one text node
        # across chunk boundaries; the DOM has a single node there)
        if kids and isinstance(kids[-1], str):
            kids[-1] += data
        else:
            kids.append(data)


def parse_html(html: str) -> Element:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


def parse_html_chunks(chunks) -> Element:
    """Incremental parse from an iterable of string chunks (reference
    R2, realtimeapi.py:65-82: the aiohttp handler feeds the DOM parser
    4 KB at a time instead of buffering the page). stdlib HTMLParser is
    natively incremental — feed() may split tags across chunk
    boundaries and the builder resumes mid-tag — so a streaming HTTP
    body never needs to materialize whole in executor memory."""
    builder = _TreeBuilder()
    for chunk in chunks:
        builder.feed(chunk)
    builder.close()
    return builder.root


def _matches(el: Element, tag: str, m: "re.Match") -> bool:
    if el.tag != tag:
        return False
    if m["cls"] is not None:
        return m["cls"] in (el.attrs.get("class") or "").split()
    if m["id"] is not None:
        return el.attrs.get("id") == m["id"]
    if m["attr"] is not None:
        got = el.attrs.get(m["attr"])
        if got is None:
            return False
        return got.startswith(m["val"]) if m["op"] == "^=" else got == m["val"]
    return True  # bare tag selector


def select(root: Element, selector: str) -> list[Element]:
    """All elements under ``root`` matching the (single-step) selector.

    Raises ValueError on selector shapes outside the supported subset,
    so an unsupported registry entry fails loudly at build time instead
    of silently matching nothing.
    """
    m = _SELECTOR_RE.match(selector.strip())
    if m is None:
        raise ValueError(f"unsupported CSS selector: {selector!r}")
    tag = m["tag"].lower()
    return [el for el in root.iter_elements()
            if el is not root and _matches(el, tag, m)]


def element_text(el: Element) -> str:
    """Concatenated descendant text, script/style subtrees removed,
    whitespace collapsed (pyquery .text() analog)."""
    parts: list[str] = []

    def walk(node: Element) -> None:
        for c in node.children:
            if isinstance(c, Element):
                if c.tag not in ("script", "style"):
                    walk(c)
            else:
                parts.append(c)

    walk(el)
    # pyquery .text(): each text node contributes its whitespace-
    # collapsed content; nodes are joined with single spaces
    return " ".join(" ".join(p.split()) for p in parts if p.strip())


def extract_one(html: str, selector: str) -> str | None:
    """Reference gen_parser semantics (news_parsers.py:1-13): text of
    the UNIQUE selector match, else None (zero or multiple matches —
    ambiguous layouts yield no article)."""
    matches = select(parse_html(html), selector)
    if len(matches) != 1:
        return None
    text = element_text(matches[0])
    return text or None


# Ship this module by value: the mapInPandas closure in http_sources
# calls extract_one on executors, whose Python workers do not
# necessarily have this package on sys.path.
import sys as _sys

from pyspark.cloudpickle import register_pickle_by_value as _by_value

_by_value(_sys.modules[__name__])
