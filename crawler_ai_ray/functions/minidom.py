"""Minimal DOM for the tree-walking operators (M29 container
extraction, M30 job-card scan, M39 element checker).

The streaming :mod:`htmltext` fact parser covers the flat extractors;
these three reference operators walk ancestors / query subtrees, so
they need an actual tree.  This is a ~100-line document tree built with
the stdlib ``HTMLParser`` — NOT a bs4 reimplementation: only the
accessors the ported operators use (``get_text``, ``find``/``find_all``
by tag/class, text-node search, ``parent``) exist.
"""

from __future__ import annotations

from html.parser import HTMLParser

__all__ = ["Node", "build_tree", "find_text_parents"]

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict, parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent

    # -- text ---------------------------------------------------------
    def _collect(self, out: list[str]) -> None:
        for c in self.children:
            if isinstance(c, str):
                out.append(c)
            else:
                c._collect(out)

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        """bs4 ``get_text(separator, strip)`` semantics: with ``strip``,
        each text node is stripped and empty pieces dropped BEFORE
        joining with ``separator`` — digits in adjacent elements must not
        concatenate when the caller passes ``" "``."""
        out: list[str] = []
        self._collect(out)
        if strip:
            pieces = [p for p in (s.strip() for s in out) if p]
        else:
            pieces = out
        return separator.join(pieces)

    # -- queries (document order) --------------------------------------
    def iter_elements(self):
        for c in self.children:
            if isinstance(c, Node):
                yield c
                yield from c.iter_elements()

    def find(self, tag: str) -> "Node | None":
        for el in self.iter_elements():
            if el.tag == tag:
                return el
        return None

    def find_all(self, tag: str) -> "list[Node]":
        return [el for el in self.iter_elements() if el.tag == tag]

    def find_by_class(self, pred) -> "Node | None":
        for el in self.iter_elements():
            cls = el.attrs.get("class")
            if cls is not None and pred(cls):
                return el
        return None

    def class_tokens(self) -> list[str]:
        return (self.attrs.get("class") or "").split()


class _Builder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]", {}, None)
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self._stack[-1])
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].children.append(
            Node(tag, dict(attrs), self._stack[-1])
        )

    def handle_endtag(self, tag):
        if tag in _VOID:
            return
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        self._stack[-1].children.append(data)


def build_tree(html: str) -> Node:
    b = _Builder()
    b.feed(html or "")
    return b.root


def find_text_parents(root: Node, pred) -> list[Node]:
    """Parents of text nodes matching ``pred`` — the
    ``soup.find_all(text=...)`` + ``.parent`` idiom, document order."""
    out: list[Node] = []

    def walk(node: Node) -> None:
        for c in node.children:
            if isinstance(c, str):
                if pred(c):
                    out.append(node)
            else:
                walk(c)

    walk(root)
    return out
