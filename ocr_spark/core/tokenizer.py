"""Streaming HTML tokenizer — a total, deterministic state machine.

Written from scratch (no bs4/lxml/html5lib in the environment, and the
north rule demands from-scratch). The design is the analog of the
reference's sliding-window ink scan (/root/reference/overflow/
test_sliding_window.py:37-92): a single forward pass with explicit open/
close state transitions, emitting interval-shaped tokens.

Scanning is `str.find`-based rather than per-character so a 10 MB document
costs O(#tags) Python-level iterations, not O(#chars) — the hot inner work
stays in C string primitives (the "vectorized inner math" discipline of
BASELINE.json:6).

Token kinds: ("start", tag, attr_src, self_closing), ("end", tag),
("text", data), ("comment", data), ("doctype", data).

attr_src is the RAW attribute soup (the exact source slice between the
tag name and '>'), parsed on demand via _parse_attrs: nothing in the
extraction hot path ever reads attributes (block segmentation and link
density key off tag names alone), so eager per-tag attribute parsing was
pure overhead — measured ~8% of tokenize+DOM time on the bench mix.
Consumers that need attributes call Node.attr()/Node.attrs, which parse
lazily and cache.

Totality: malformed input NEVER raises. Unterminated constructs at EOF are
consumed silently (dropped); a lone '<' that opens no construct is literal
text. Recovery events are counted in TokenStream.recoveries for the
metrics table.
"""

from __future__ import annotations

import re

# RAWTEXT elements: content is character data until the matching close tag.
RAWTEXT_TAGS = frozenset({"script", "style", "textarea", "title", "xmp"})

# ASCII-case-insensitive close-tag search per rawtext tag (HTML5 matches
# '</script' ASCII-case-insensitively). Searching a lowercased COPY of the
# document is wrong: str.lower() can change string length ('İ' U+0130
# lowercases to TWO code points), silently misaligning every rawtext slice
# after such a character — a Turkish page with İ before a <script> leaked
# the close tag into the script text and swallowed following content.
# re.ASCII restricts IGNORECASE to ASCII folding (no 'ſ' matching 's').
_RAWTEXT_CLOSE_RE = {t: re.compile("</" + t, re.IGNORECASE | re.ASCII)
                     for t in RAWTEXT_TAGS}

_TAG_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9:_\-]*")
_END_TAG_RE = re.compile(r"</\s*([a-zA-Z][a-zA-Z0-9:_\-]*)[^>]*>")
_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][a-zA-Z0-9_:.\-]*)"""
    r"""(?:\s*=\s*("([^"]*)"|'([^']*)'|[^\s>]*))?"""
)
# A start tag: name then attribute soup where quoted values may contain '>'.
# The soup group is LAZY so a '/' immediately before '>' is captured as the
# self-closing marker (fixed rule: trailing '/' is a marker, not part of an
# unquoted attribute value).
_START_TAG_RE = re.compile(
    r"""<([a-zA-Z][a-zA-Z0-9:_\-]*)"""
    r"""((?:"[^"]*"|'[^']*'|[^>"'])*?)"""
    r"""\s*(/?)>"""
)


class TokenStream:
    """Result of tokenize(): the token list plus recovery diagnostics."""

    __slots__ = ("tokens", "recoveries")

    def __init__(self, tokens: list[tuple], recoveries: int) -> None:
        self.tokens = tokens
        self.recoveries = recoveries


def _parse_attrs(attr_src: str) -> list[tuple[str, str]]:
    """Attribute soup -> ordered [(name, value)] list, first occurrence wins
    downstream. Unquoted / valueless attributes handled; order preserved so
    consumers are deterministic."""
    if not attr_src or attr_src.isspace():
        return []
    attrs: list[tuple[str, str]] = []
    for m in _ATTR_RE.finditer(attr_src):
        name = m.group(1).lower()
        if m.group(3) is not None:
            value = m.group(3)
        elif m.group(4) is not None:
            value = m.group(4)
        elif m.group(2):
            value = m.group(2)
        else:
            value = ""
        attrs.append((name, value))
    return attrs


def tokenize(html: str) -> TokenStream:
    """One forward pass over the document; returns TokenStream. Total."""
    tokens: list[tuple] = []
    recoveries = 0
    n = len(html)
    i = 0
    # hot loop: bind the two per-iteration attribute lookups once
    find = html.find
    append = tokens.append

    while i < n:
        lt = find("<", i)
        if lt < 0:
            if i < n:
                append(("text", html[i:]))
            break
        if lt > i:
            append(("text", html[i:lt]))

        # Dispatch on the character after '<' (single index op instead of
        # a chain of startswith probes — this loop runs once per tag).
        nxt_c = html[lt + 1] if lt + 1 < n else ""

        if nxt_c == "!" or nxt_c == "?":
            # Comment
            if html.startswith("<!--", lt):
                end = find("-->", lt + 4)
                if end < 0:  # unterminated comment: swallow to EOF
                    recoveries += 1
                    break
                append(("comment", html[lt + 4 : end]))
                i = end + 3
                continue

            # CDATA (emitted as text per the XML-ish convention)
            if html.startswith("<![CDATA[", lt):
                end = find("]]>", lt + 9)
                if end < 0:
                    recoveries += 1
                    break
                append(("text", html[lt + 9 : end]))
                i = end + 3
                continue

            # Doctype / bogus markup declaration
            end = find(">", lt + 2)
            if end < 0:
                recoveries += 1
                break
            append(("doctype", html[lt + 2 : end]))
            i = end + 1
            continue

        # End tag
        if nxt_c == "/":
            m = _END_TAG_RE.match(html, lt)
            if m is None:
                # "</" followed by non-letter: HTML5 calls this a bogus
                # comment; consume to '>' (or EOF).
                end = find(">", lt + 2)
                recoveries += 1
                if end < 0:
                    break
                i = end + 1
                continue
            append(("end", m.group(1).lower()))
            i = m.end()
            continue

        # Start tag
        m = _START_TAG_RE.match(html, lt)
        if m is None:
            nxt = html[lt + 1 : lt + 2]
            if nxt and _TAG_NAME_RE.match(nxt):
                # Looks like a tag but unterminated at EOF: drop remainder.
                recoveries += 1
                break
            # Literal '<' in text.
            append(("text", "<"))
            i = lt + 1
            continue

        tag, attr_src, slash = m.group(1, 2, 3)  # one C call, not three
        tag = tag.lower()
        self_closing = slash == "/"
        append(("start", tag, attr_src, self_closing))
        i = m.end()

        # RAWTEXT mode: consume verbatim until the matching close tag.
        if tag in RAWTEXT_TAGS and not self_closing:
            cm = _RAWTEXT_CLOSE_RE[tag].search(html, i)
            close = cm.start() if cm else -1
            if close < 0:
                # Unterminated rawtext: content runs to EOF, no close token.
                recoveries += 1
                append(("text", html[i:]))
                append(("end", tag))
                break
            append(("text", html[i:close]))
            gt = find(">", close)
            append(("end", tag))
            i = (gt + 1) if gt >= 0 else n
            continue

    return TokenStream(tokens, recoveries)
