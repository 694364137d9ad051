"""Oracle text extractor — a DOM-building implementation of the pinned
jobdetail / crawldata text semantics (see functions/htmltext.py module
docstring for the spec and the reference citations
``job_extraction_service.py:1722-1737`` / ``routes.py:205``).

Deliberately different code from the engine's single-pass streaming
parser: this one builds an element tree with stdlib HTMLParser, then
*removes* excluded subtrees (mirroring bs4 ``decompose``) and recursively
collects text.  Tests assert byte equality of both implementations over
the whole synthetic corpus; agreement of two independent walkers is the
in-sandbox stand-in for byte-identity with the (uninstallable) bs4-based
reference extractor.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_WS = re.compile(r"\s+")

_EXCLUDE = {"script", "style", "nav", "header", "footer", "aside", "noscript"}
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _Node:
    __slots__ = ("tag", "children")

    def __init__(self, tag: str) -> None:
        self.tag = tag
        self.children: list = []  # str (text) or _Node


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        if tag in _VOID:
            self.stack[-1].children.append(_Node(tag))
            return
        node = _Node(tag)
        self.stack[-1].children.append(node)
        self.stack.append(node)

    def handle_endtag(self, tag):
        if tag in _VOID:
            return
        # close the innermost matching open tag (HTMLParser-style recovery)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        self.stack[-1].children.append(data)


def _build(html: str) -> _Node:
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


def _collect(node: _Node, out: list[str], *, drop_excluded: bool) -> None:
    for child in node.children:
        if isinstance(child, str):
            out.append(child)
        else:
            if drop_excluded and child.tag in _EXCLUDE:
                continue
            _collect(child, out, drop_excluded=drop_excluded)


def oracle_text_jobdetail(html: str) -> str:
    """decompose-excluded get_text() → \\s+ collapse → len gate → [:5000]."""
    pieces: list[str] = []
    _collect(_build(html), pieces, drop_excluded=True)
    text = _WS.sub(" ", "".join(pieces)).strip()
    return text[:5000] if len(text) > 50 else ""


def oracle_text_crawldata(html: str) -> str:
    """get_text(separator=' ', strip=True) — no exclusion."""
    pieces: list[str] = []
    _collect(_build(html), pieces, drop_excluded=False)
    stripped = (p.strip() for p in pieces)
    return " ".join(p for p in stripped if p)
