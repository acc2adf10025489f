"""Outlink extraction — tokenizer-level, no DOM build needed.

The link graph is the other half of a web corpus (in-degree is a
classic quality/spam prior; host edges drive crawl scheduling). Reuses
the streaming tokenizer's one forward pass: hrefs come straight off the
``("start", "a", attr_src, _)`` tokens, so a page that never needs its
DOM for text extraction still yields its edges in O(bytes).

Total like the rest of core: malformed HTML never raises, anchors
without an href are skipped, the first href attribute wins (duplicate
attributes follow Node.attr's first-occurrence rule).
"""

from __future__ import annotations

from ocr_spark.core.tokenizer import _parse_attrs, tokenize


def outlinks(html: str) -> list[str]:
    """Raw href values of <a> start tags, in document order. Total."""
    out: list[str] = []
    for tok in tokenize(html).tokens:
        if tok[0] == "start" and tok[1] == "a":
            for k, v in _parse_attrs(tok[2]):
                if k == "href":
                    if v:
                        out.append(v)
                    break
    return out
