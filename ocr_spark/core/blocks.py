"""Hierarchical block segmentation + text-density boilerplate classification.

Reference analog: line segmentation by horizontal projection profile
(/root/reference/utils.py:47-127) followed by per-character CNN
classification (/root/reference/ocr_project/ocr_app/services/func.py:19-31).
Here the "lines" are DOM text blocks delimited by block-level elements and
the "classifier" is a deterministic shallow-text-feature rule in the style
of Boilerpipe's NumWordsRulesClassifier (Kohlschütter et al., "Boilerplate
Detection using Shallow Text Features", WSDM 2010 — public method).

All thresholds are fixed constants; classification is pure and total.
"""

from __future__ import annotations

import html as _htmlmod
import re
from dataclasses import dataclass

from ocr_spark.core.dom import _IMPLICIT_CLOSE, _SCOPE_TAGS, VOID_TAGS, Node
from ocr_spark.core.tokenizer import (
    _MASTER_RE, _RAWTEXT_CLOSE_RE, _TAG_NAME_RE)

# Elements whose subtree contributes no visible text.
SKIP_TAGS = frozenset({
    "script", "style", "noscript", "template", "head", "svg", "math",
    "iframe", "object", "select", "datalist", "title", "textarea",
})

# Elements that open a new text block.
BLOCK_TAGS = frozenset({
    "html", "body", "div", "main", "section", "article", "aside", "nav",
    "header", "footer", "p", "h1", "h2", "h3", "h4", "h5", "h6", "li",
    "dt", "dd", "td", "th", "tr", "table", "thead", "tbody", "tfoot",
    "ul", "ol", "dl", "blockquote", "pre", "figure", "figcaption",
    "form", "fieldset", "address", "center", "caption", "summary",
    "details", "hr", "br",
})

# Ancestor tags that force a block to boilerplate.
BOILER_CONTAINERS = frozenset({"nav", "header", "footer", "aside", "form"})

HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# Canonical whitespace normalization: explicit ASCII class so the exact
# semantics are reproducible in Spark/DuckDB regexes (SURVEY.md §7).
_WS_RE = re.compile(r"[ \t\n\r\f\v]+")

# Classifier constants (NumWordsRulesClassifier).
MAX_LINK_DENSITY = 1.0 / 3.0
PREV_LINK_DENSITY_HIGH = 0.555556
CURR_WORDS_HIGH = 40
NEXT_WORDS_HIGH_AFTER_LINKY = 17
CURR_WORDS_MIN = 16
NEXT_WORDS_MIN = 15
PREV_WORDS_MIN = 4


_WS_TRANS = str.maketrans({c: " " for c in "\t\n\r\f\v"})


def normalize_ws(text: str) -> str:
    """Collapse runs of ASCII whitespace to single spaces and strip.

    Hot path (every flushed block runs through here): translate + a
    split/join collapse is ~3x faster than the regex it replaces and
    BYTE-IDENTICAL to `_WS_RE.sub(" ", text).strip()` — verified over
    adversarial fuzz including the Unicode-whitespace edge (the final
    unguarded `.strip()` removes unicode ws at the ENDS in both
    spellings, while interior `\\xa0`/`\\x1c` stay untouched in both);
    the double-space guard skips the collapse for the common
    already-collapsed fragment. ~16% end-to-end extraction throughput.
    """
    s = text.translate(_WS_TRANS)
    if "  " in s:
        s = " ".join([p for p in s.split(" ") if p])
    return s.strip()


@dataclass(slots=True)
class Block:
    """One segmented text block with shallow features.

    Analog of the reference's character-candidate record
    {mask,x,y,w,h,area,centroid} (/root/reference/utils.py:164-172):
    a span plus the statistics the classifier consumes.
    """

    block_id: int
    tag: str            # nearest enclosing block-level tag
    depth: int          # DOM depth of that element
    text: str           # whitespace-normalized, entity-unescaped
    n_chars: int
    n_words: int
    anchor_words: int
    link_density: float
    in_boiler_container: bool
    is_content: bool = False


def _words(text: str) -> int:
    return len(text.split()) if text else 0


def segment_blocks(root: Node) -> list[Block]:
    """Walk the DOM emitting text blocks in document order.

    A block accumulates inline text between block-level boundaries. Text
    under <a> is tallied separately for link density. Subtrees under
    SKIP_TAGS are excluded entirely (analog: morphological noise removal,
    /root/reference/hebrew-letter-segmentation.py:30-31).
    """
    blocks: list[Block] = []
    frags: list[str] = []          # raw fragments of the current block
    anchor_frags: list[str] = []   # subset that sits under an <a>
    # block-context stack: (tag, depth, boiler); base covers stray text
    ctx: list[tuple[str, int, bool]] = [("body", 0, False)]

    def flush() -> None:
        nonlocal frags, anchor_frags
        if frags:
            raw = "".join(frags)
            text = normalize_ws(raw)
            if text:
                tag, depth, boiler = ctx[-1]
                n_words = _words(text)
                # most blocks carry no anchors — skip the second split
                # entirely for them. For the rest, len(raw.split()) ==
                # _words(normalize_ws(raw)): translate/collapse/strip maps
                # ws to ws and never merges or splits a maximal non-ws
                # run, and .split() already splits on every Unicode ws.
                a_words = (min(len("".join(anchor_frags).split()), n_words)
                           if anchor_frags else 0)
                blocks.append(Block(
                    block_id=len(blocks),
                    tag=tag,
                    depth=depth,
                    text=text,
                    n_chars=len(text),
                    n_words=n_words,
                    anchor_words=a_words,
                    link_density=(a_words / n_words) if n_words else 0.0,
                    in_boiler_container=boiler,
                ))
        frags = []
        anchor_frags = []

    # Iterative DFS with explicit enter/exit events; recursion would blow
    # the Python stack on nested-div-soup fixtures (FIXTURES.md template 3).
    events: list[tuple[str, Node, int, bool]] = [("enter", root, 0, False)]
    # hot loop: ~60 boundary events per document are flushes of an EMPTY
    # fragment list — guard at the call sites to skip the call entirely
    # (safe: anchor_frags only ever grows in lockstep with frags, so
    # empty frags implies empty anchor_frags)
    while events:
        ev, node, anchor_depth, boiler = events.pop()
        if ev == "exit":
            if frags:
                flush()
            ctx.pop()
            continue
        tag = node.tag
        if tag == "#text":
            data = _htmlmod.unescape(node.text or "")
            if data:
                frags.append(data)
                if anchor_depth > 0:
                    anchor_frags.append(data)
            continue
        if tag in SKIP_TAGS:
            continue
        child_boiler = boiler or (tag in BOILER_CONTAINERS)
        child_anchor = anchor_depth + (1 if tag == "a" else 0)
        if tag in ("br", "hr"):
            if frags:
                flush()  # pure separators (void, no subtree)
            continue
        if tag in BLOCK_TAGS:
            if frags:
                flush()
            ctx.append((tag, node.depth, child_boiler))
            events.append(("exit", node, 0, False))
        for child in reversed(node.children):
            events.append(("enter", child, child_anchor, child_boiler))

    if frags:
        flush()
    return blocks


def segment_blocks_stream(tokens: list[tuple]) -> list[Block]:
    """Single-pass block segmentation straight off the token stream —
    byte-identical to ``segment_blocks(build_dom(tokens))`` by
    construction, without materializing the tree.

    The hot path built ~75 Node objects per kB of HTML (measured 215k
    allocations over a 3k-doc bench mix) only to DFS them back into the
    order the token stream already has. This spelling simulates
    ``build_dom``'s exact open-stack rules (dom.py: implicit-close table
    bounded by scope tags, nearest-match end-tag popping, void /
    self-closing never pushed, EOF closes all) while segmenting, so
    every flush fires at the same point with the same (tag, depth,
    boiler) context as the tree walk. Depth falls out of the stack:
    an element created when the open stack holds k ancestors (root
    excluded) has DOM depth k+1.

    SKIP_TAGS subtrees contribute nothing, but their elements still
    occupy the open stack (exactly as in build_dom) so end tags that pop
    THROUGH a skipped subtree close the same outer elements.

    ``segment_blocks`` stays as the independently-readable reference
    spelling; `test_segment_blocks_stream_matches_dom_reference` pins
    equality over the synthetic corpus, the adversarial templates, and
    hypothesis soup.
    """
    blocks: list[Block] = []
    frags: list[str] = []
    anchor_frags: list[str] = []
    ctx: list[tuple[str, int, bool]] = [("body", 0, False)]
    # open-element stack, root excluded: (tag, pushed_ctx, anchor_inc,
    # boiler inside this element)
    stack: list[tuple[str, bool, int, bool]] = []
    skip_from: int | None = None   # stack index of the skip-subtree root
    anchor = 0                     # enclosing-<a> count (active path)
    unescape = _htmlmod.unescape

    def flush() -> None:
        nonlocal frags, anchor_frags
        raw = "".join(frags)
        text = normalize_ws(raw)
        if text:
            tag, depth, boiler = ctx[-1]
            n_words = _words(text)
            # len(raw.split()) == _words(normalize_ws(raw)) — see the
            # reference spelling's flush for the invariance argument.
            a_words = (min(len("".join(anchor_frags).split()), n_words)
                       if anchor_frags else 0)
            blocks.append(Block(
                block_id=len(blocks),
                tag=tag,
                depth=depth,
                text=text,
                n_chars=len(text),
                n_words=n_words,
                anchor_words=a_words,
                link_density=(a_words / n_words) if n_words else 0.0,
                in_boiler_container=boiler,
            ))
        frags = []
        anchor_frags = []

    def pop_to(idx: int) -> None:
        """Close stack[idx:] innermost-first — each closed block element
        flushes under ITS context then pops it, exactly the tree walk's
        exit-event order."""
        nonlocal skip_from, anchor
        if idx == len(stack) - 1:           # the overwhelmingly common
            _t, pushed, a_inc, _b = stack.pop()  # case: one entry pops
            anchor -= a_inc
            if pushed:
                if frags:
                    flush()
                ctx.pop()
        else:
            for _t, pushed, a_inc, _b in reversed(stack[idx:]):
                anchor -= a_inc
                if pushed:
                    if frags:
                        flush()
                    ctx.pop()
            del stack[idx:]
        if skip_from is not None and len(stack) <= skip_from:
            skip_from = None

    for tok in tokens:
        kind = tok[0]
        if kind == "text":
            if skip_from is not None:
                continue
            data = unescape(tok[1])
            if data:
                frags.append(data)
                if anchor > 0:
                    anchor_frags.append(data)
        elif kind == "start":
            tag = tok[1]
            self_closing = tok[3]
            closes = _IMPLICIT_CLOSE.get(tag)
            if closes is not None:
                idx = None
                for k in range(len(stack) - 1, -1, -1):
                    t = stack[k][0]
                    if t in closes:
                        idx = k
                        break
                    if t in _SCOPE_TAGS:
                        break
                if idx is not None:
                    pop_to(idx)
            real = tag not in VOID_TAGS and not self_closing
            if skip_from is not None:
                if real:
                    stack.append((tag, False, 0, False))
                continue
            boiler = stack[-1][3] if stack else False
            if tag in SKIP_TAGS:
                if real:
                    stack.append((tag, False, 0, boiler))
                    skip_from = len(stack) - 1
                continue
            if tag == "br" or tag == "hr":
                if frags:
                    flush()
                continue
            child_boiler = boiler or (tag in BOILER_CONTAINERS)
            pushed = False
            if tag in BLOCK_TAGS:
                if frags:
                    flush()
                ctx.append((tag, len(stack) + 1, child_boiler))
                pushed = True
            if real:
                a_inc = 1 if tag == "a" else 0
                anchor += a_inc
                stack.append((tag, pushed, a_inc, child_boiler))
            elif pushed:
                # self-closing block element: enter+exit back to back
                if frags:
                    flush()
                ctx.pop()
        elif kind == "end":
            tag = tok[1]
            if tag in VOID_TAGS:
                continue
            if stack and stack[-1][0] == tag:   # well-nested close: the
                pop_to(len(stack) - 1)          # overwhelmingly common case
                continue
            idx = None
            for k in range(len(stack) - 2, -1, -1):
                if stack[k][0] == tag:
                    idx = k
                    break
            if idx is not None:
                pop_to(idx)
        # comments/doctypes contribute nothing

    pop_to(0)
    if frags:
        flush()
    return blocks


def segment_html(html: str) -> tuple[list[Block], int]:
    """Fused tokenize + segment: one pass from the decoded document
    straight to blocks, byte-identical to
    ``segment_blocks_stream(tokenize(html).tokens)`` (and therefore to
    the DOM reference spelling) by construction — without materializing
    the token list.

    Hot-path pass #5: the master-regex tokenizer built ~75 token tuples
    per kB only for :func:`segment_blocks_stream` to unpack them again
    (``tok[0]``/``tok[1]`` per token, one list append + one tuple
    allocation each). This spelling feeds each master-regex match
    directly into the segmentation state machine: the tokenizer's
    dispatch (branch order, recovery counting, rawtext mode, EOF
    truncation — tokenizer.py master-loop semantics) is interleaved with
    the segmenter's open-stack simulation (implicit closes, skip
    subtrees, anchor depth — :func:`segment_blocks_stream` semantics),
    both copied construct-for-construct from their pinned spellings.
    Returns ``(blocks, recoveries)``; blocks are unclassified (callers
    run :func:`classify_blocks`).

    ``tokenize`` + ``segment_blocks_stream`` stay as the equality
    oracle; `test_segment_html_matches_stream_reference` pins
    field-identity + recovery-count identity over hypothesis soup, the
    targeted edge lists of BOTH ancestors, and the synthetic corpus.
    """
    blocks: list[Block] = []
    frags: list[str] = []
    anchor_frags: list[str] = []
    ctx: list[tuple[str, int, bool]] = [("body", 0, False)]
    stack: list[tuple[str, bool, int, bool]] = []
    skip_from: int | None = None
    anchor = 0
    recoveries = 0
    n = len(html)
    i = 0
    find = html.find
    search = _MASTER_RE.search
    unescape = _htmlmod.unescape

    def flush() -> None:
        nonlocal frags, anchor_frags
        raw = "".join(frags)
        text = normalize_ws(raw)
        if text:
            tag, depth, boiler = ctx[-1]
            n_words = _words(text)
            a_words = (min(len("".join(anchor_frags).split()), n_words)
                       if anchor_frags else 0)
            blocks.append(Block(
                block_id=len(blocks),
                tag=tag,
                depth=depth,
                text=text,
                n_chars=len(text),
                n_words=n_words,
                anchor_words=a_words,
                link_density=(a_words / n_words) if n_words else 0.0,
                in_boiler_container=boiler,
            ))
        frags = []
        anchor_frags = []

    def pop_to(idx: int) -> None:
        nonlocal skip_from, anchor
        if idx == len(stack) - 1:
            _t, pushed, a_inc, _b = stack.pop()
            anchor -= a_inc
            if pushed:
                if frags:
                    flush()
                ctx.pop()
        else:
            for _t, pushed, a_inc, _b in reversed(stack[idx:]):
                anchor -= a_inc
                if pushed:
                    if frags:
                        flush()
                    ctx.pop()
            del stack[idx:]
        if skip_from is not None and len(stack) <= skip_from:
            skip_from = None

    def on_end(tag: str) -> None:
        """The stream segmenter's "end" branch (void filter at call
        sites where statically known); the well-nested close — the
        overwhelmingly common case — pops inline instead of delegating
        to pop_to (same body as pop_to's single-entry fast path)."""
        nonlocal skip_from, anchor
        if stack and stack[-1][0] == tag:
            _t, pushed, a_inc, _b = stack.pop()
            anchor -= a_inc
            if pushed:
                if frags:
                    flush()
                ctx.pop()
            if skip_from is not None and len(stack) <= skip_from:
                skip_from = None
            return
        for k in range(len(stack) - 2, -1, -1):
            if stack[k][0] == tag:
                pop_to(k)
                return

    while True:
        m = search(html, i)
        if m is None:
            if i < n and skip_from is None:
                data = unescape(html[i:])
                if data:
                    frags.append(data)
                    if anchor > 0:
                        anchor_frags.append(data)
            break
        lt = m.start()
        if lt > i and skip_from is None:
            data = unescape(html[i:lt])
            if data:
                frags.append(data)
                if anchor > 0:
                    anchor_frags.append(data)
        g = m.lastindex

        if g == 4:  # start tag (groups 2=name, 3=soup, 4=slash)
            tag, slash = m.group(2, 4)
            tag = tag.lower()
            self_closing = slash == "/"
            i = m.end()

            # --- segmentation "start" transitions (stream spelling) ---
            closes = _IMPLICIT_CLOSE.get(tag)
            if closes is not None:
                idx = None
                for k in range(len(stack) - 1, -1, -1):
                    t = stack[k][0]
                    if t in closes:
                        idx = k
                        break
                    if t in _SCOPE_TAGS:
                        break
                if idx is not None:
                    pop_to(idx)
            real = tag not in VOID_TAGS and not self_closing
            if skip_from is not None:
                if real:
                    stack.append((tag, False, 0, False))
            elif tag in SKIP_TAGS:
                if real:
                    stack.append((tag, False, 0,
                                  stack[-1][3] if stack else False))
                    skip_from = len(stack) - 1
            elif tag == "br" or tag == "hr":
                if frags:
                    flush()
            else:
                boiler = stack[-1][3] if stack else False
                child_boiler = boiler or (tag in BOILER_CONTAINERS)
                pushed = False
                if tag in BLOCK_TAGS:
                    if frags:
                        flush()
                    ctx.append((tag, len(stack) + 1, child_boiler))
                    pushed = True
                if real:
                    a_inc = 1 if tag == "a" else 0
                    anchor += a_inc
                    stack.append((tag, pushed, a_inc, child_boiler))
                elif pushed:
                    if frags:
                        flush()
                    ctx.pop()

            # --- rawtext mode (tokenizer spelling, fed straight in) ---
            if tag in _RAWTEXT_CLOSE_RE and not self_closing:
                cm = _RAWTEXT_CLOSE_RE[tag].search(html, i)
                close = cm.start() if cm else -1
                if close < 0:
                    recoveries += 1
                    if skip_from is None:
                        data = unescape(html[i:])
                        if data:
                            frags.append(data)
                            if anchor > 0:
                                anchor_frags.append(data)
                    on_end(tag)  # rawtext tags are never void
                    break
                if skip_from is None:
                    data = unescape(html[i:close])
                    if data:
                        frags.append(data)
                        if anchor > 0:
                            anchor_frags.append(data)
                gt = find(">", close)
                on_end(tag)
                i = (gt + 1) if gt >= 0 else n
            continue

        if g == 1:  # end tag
            tag = m.group(1).lower()
            i = m.end()
            if tag not in VOID_TAGS:
                on_end(tag)
            continue

        if g == 5:  # comment — contributes nothing
            end = find("-->", m.end())
            if end < 0:
                recoveries += 1
                break
            i = end + 3
            continue

        if g == 6:  # CDATA: emitted as text
            end = find("]]>", m.end())
            if end < 0:
                recoveries += 1
                break
            if skip_from is None:
                data = unescape(html[m.end():end])
                if data:
                    frags.append(data)
                    if anchor > 0:
                        anchor_frags.append(data)
            i = end + 3
            continue

        if g == 7:  # doctype / bogus markup decl — contributes nothing
            end = find(">", m.end())
            if end < 0:
                recoveries += 1
                break
            i = end + 1
            continue

        if g == 8:  # bogus end tag: consume to '>'
            end = find(">", m.end())
            recoveries += 1
            if end < 0:
                break
            i = end + 1
            continue

        # g == 9: nothing tag-shaped completed at this '<'.
        nxt = html[lt + 1: lt + 2]
        if nxt and _TAG_NAME_RE.match(nxt):
            recoveries += 1
            break
        if skip_from is None:
            frags.append("<")
            if anchor > 0:
                anchor_frags.append("<")
        i = lt + 1

    pop_to(0)
    if frags:
        flush()
    return blocks, recoveries


def classify_blocks(blocks: list[Block]) -> list[Block]:
    """Mark each block content/boilerplate in place and return the list.

    Rule set (fixed, order matters):
      1. block in a nav/header/footer/aside/form subtree -> boilerplate;
      2. link_density > 1/3 -> boilerplate;
      3. context rule over (prev, curr, next) word counts as in
         NumWordsRulesClassifier;
      4. heading promotion: a heading block otherwise rejected by rule 3
         becomes content if the next block is content (title attaches to
         its article — analog of line-offset rebasing,
         /root/reference/hebrew-letter-segmentation.py:164-166).
    """
    n = len(blocks)
    # Context sequence excludes boiler-container blocks: a <nav> must not
    # poison the prev/next features of the adjacent article text.
    cand = [i for i, b in enumerate(blocks) if not b.in_boiler_container]
    pos_in_cand = {bi: j for j, bi in enumerate(cand)}
    for i, b in enumerate(blocks):
        if b.in_boiler_container:
            b.is_content = False
            continue
        j = pos_in_cand[i]
        prev_b = blocks[cand[j - 1]] if j > 0 else None
        next_b = blocks[cand[j + 1]] if j + 1 < len(cand) else None
        if b.link_density > MAX_LINK_DENSITY:
            b.is_content = False
            continue
        prev_ld = prev_b.link_density if prev_b else 0.0
        prev_w = prev_b.n_words if prev_b else 0
        next_w = next_b.n_words if next_b else 0
        if prev_ld > PREV_LINK_DENSITY_HIGH:
            b.is_content = (b.n_words > CURR_WORDS_HIGH
                            or next_w > NEXT_WORDS_HIGH_AFTER_LINKY)
        else:
            b.is_content = (b.n_words > CURR_WORDS_MIN
                            or next_w > NEXT_WORDS_MIN
                            or prev_w > PREV_WORDS_MIN)

    # Heading promotion pass (right-to-left so chains of headings resolve).
    for i in range(n - 2, -1, -1):
        b = blocks[i]
        if (not b.is_content and b.tag in HEADING_TAGS
                and not b.in_boiler_container
                and b.link_density <= MAX_LINK_DENSITY
                and blocks[i + 1].is_content):
            b.is_content = True
    return blocks
