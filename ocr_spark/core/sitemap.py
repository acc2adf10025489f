"""sitemap.xml parsing — from scratch, sitemaps.org protocol core.

The third leg of crawl discovery (WARC replay + robots gate + sitemap
URL lists): a host's sitemap enumerates the URLs it WANTS crawled,
with the 50,000-URL / 50 MB per-file limits pushing large sites to a
``<sitemapindex>`` of child sitemaps. Reuses the streaming HTML
tokenizer (XML start/end/text tokens parse identically for this
element subset); total — malformed input never raises.

Scope: ``<loc>`` URL texts inside ``<urlset>``/``<url>`` entries and
``<sitemapindex>``/``<sitemap>`` child pointers, plus ``<lastmod>``
when present. Entities stay raw; gzip transport is the WARC source's
concern, not the parser's.
"""

from __future__ import annotations

from ocr_spark.core.tokenizer import tokenize


def sitemap_locs(xml: str) -> list[tuple[str, str | None]]:
    """(loc, lastmod) pairs in document order — for a ``<urlset>``
    these are page URLs; for a ``<sitemapindex>`` they are child
    sitemap URLs (same shape, callers recurse at fetch time). A
    ``<loc>`` with no enclosing entry still counts (lenient);
    ``lastmod`` applies to the entry whose ``<loc>`` preceded it.
    """
    out: list[tuple[str, str | None]] = []
    field: str | None = None
    buf: list[str] = []
    attach_ok = False  # did the CURRENT entry already yield its <loc>?
    for tok in tokenize(xml).tokens:
        kind = tok[0]
        if kind == "start" and tok[1] in ("url", "sitemap"):
            attach_ok = False  # entry boundary: orphan lastmod must
            # not attach to the previous entry's loc
        elif kind == "start" and tok[1] in ("loc", "lastmod"):
            field, buf = tok[1], []
        elif kind == "end" and tok[1] in ("loc", "lastmod"):
            text = "".join(buf).strip()
            if tok[1] == "loc" and field == "loc" and text:
                out.append((text, None))
                attach_ok = True
            elif (tok[1] == "lastmod" and field == "lastmod"
                  and attach_ok and out and out[-1][1] is None and text):
                out[-1] = (out[-1][0], text)
            field = None
        elif kind == "text" and field is not None:
            buf.append(tok[1])
    return out
