"""DOM-tree construction with fixed malformed-markup recovery rules.

The hierarchy page -> block -> span mirrors the reference's explicit
Parasha -> Mila -> Ot containment (/root/reference/overflow/tefilin.py:2-15);
tree building from a flat token stream is the analog of line segmentation
grouping ink rows into intervals (/root/reference/utils.py:47-127).

Recovery rules are the SPEC (oracle and UDF share this code), but they are
chosen to be sensible and — critically — total and deterministic:
  * void elements never push onto the open stack;
  * a small fixed implicit-close table (e.g. <p> closes an open <p>);
  * an end tag pops to the nearest matching open element, emitting implicit
    closes on the way; with no match it is ignored;
  * EOF closes everything still open.
No dict/set iteration order is observable in the output (SURVEY.md §7
"Hard parts: determinism").
"""

from __future__ import annotations

VOID_TAGS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
})

# tag -> set of open tags it implicitly closes (nearest first)
_IMPLICIT_CLOSE = {
    "p": frozenset({"p"}),
    "li": frozenset({"li"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dt", "dd"}),
    "tr": frozenset({"tr", "td", "th"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
    "option": frozenset({"option"}),
    "optgroup": frozenset({"option", "optgroup"}),
    "thead": frozenset({"thead", "tbody", "tfoot"}),
    "tbody": frozenset({"thead", "tbody", "tfoot"}),
    "tfoot": frozenset({"thead", "tbody", "tfoot"}),
}

# Block-level elements also act as a boundary that an implicit close will
# not cross (e.g. <p> inside <div> does not close a <p> outside the div).
_SCOPE_TAGS = frozenset({
    "html", "body", "div", "section", "article", "aside", "nav", "header",
    "footer", "main", "table", "td", "th", "blockquote", "figure", "ul",
    "ol", "li", "form",
})


class Node:
    """One element or text node. Children ordered; ids are preorder.

    Attributes parse LAZILY from the raw source slice the tokenizer
    carries (tokenizer.py module docstring): the extraction hot path
    never reads them, so the parse runs only for consumers that actually
    call .attr()/.attrs, and only once per node.
    """

    __slots__ = ("node_id", "tag", "parent", "depth", "children",
                 "_attr_src", "_attrs", "text")

    def __init__(self, node_id: int, tag: str, parent: "Node | None",
                 attr_src: str = "",
                 text: str | None = None) -> None:
        self.node_id = node_id
        self.tag = tag  # "#text" for text nodes
        self.parent = parent
        self.depth = 0 if parent is None else parent.depth + 1
        self.children: list[Node] = []
        self._attr_src = attr_src
        self._attrs: list[tuple[str, str]] | None = None
        self.text = text

    @property
    def attrs(self) -> list[tuple[str, str]]:
        if self._attrs is None:
            from ocr_spark.core.tokenizer import _parse_attrs
            self._attrs = _parse_attrs(self._attr_src)
        return self._attrs

    def attr(self, name: str) -> str | None:
        for k, v in self.attrs:  # first occurrence wins
            if k == name:
                return v
        return None

    def iter_preorder(self):
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(node.children))


def build_dom(tokens: list[tuple]) -> Node:
    """Token stream -> document tree rooted at a synthetic '#document'."""
    next_id = 0
    root = Node(next_id, "#document", None)
    next_id += 1
    open_stack: list[Node] = [root]

    for tok in tokens:
        kind = tok[0]
        if kind == "text":
            data = tok[1]
            if not data:
                continue
            parent = open_stack[-1]
            node = Node(next_id, "#text", parent, text=data)
            next_id += 1
            parent.children.append(node)
        elif kind == "start":
            tag, attr_src, self_closing = tok[1], tok[2], tok[3]
            closes = _IMPLICIT_CLOSE.get(tag)
            if closes is not None:
                # Search up the open stack for an implicitly-closeable
                # element, without crossing a scope boundary; pop down to
                # and including it if found.
                idx = None
                for k in range(len(open_stack) - 1, 0, -1):
                    t = open_stack[k].tag
                    if t in closes:
                        idx = k
                        break
                    if t in _SCOPE_TAGS:
                        break
                if idx is not None:
                    del open_stack[idx:]
            parent = open_stack[-1]
            node = Node(next_id, tag, parent, attr_src=attr_src)
            next_id += 1
            parent.children.append(node)
            if tag not in VOID_TAGS and not self_closing:
                open_stack.append(node)
        elif kind == "end":
            tag = tok[1]
            if tag in VOID_TAGS:
                continue  # </br> etc: ignored
            # Find nearest matching open element (never pop the root:
            # the scan stops above index 0; stray end tags are ignored).
            idx = None
            for k in range(len(open_stack) - 1, 0, -1):
                if open_stack[k].tag == tag:
                    idx = k
                    break
            if idx is None:
                continue
            del open_stack[idx:]
        # comments/doctypes contribute nothing to the tree

    return root
