"""Link-graph operators: outlink extraction, URL resolution, host edges.

Spark shape (100 TB):
  * `outlinks_udf` is an Arrow-batched pandas UDF over the page bytes —
    the same narrow one-pass-per-page slot the extraction UDF occupies
    (tokenizer reuse, ocr_spark/core/links.py); pages never shuffle.
  * `resolve_links` is a pure higher-order-array expression (codegen'd,
    oracle-mirrorable) — no second UDF for the common resolution cases.
  * `host_edges` explodes to (src_host, dst_host) AFTER hosts are cut
    down from full URLs, so the exploded edge rows carry two short
    strings; the distinct is one partial-aggregated shuffle.
  * `host_indegree` is the classic spam/quality prior: count of distinct
    referring hosts per destination host — partial-agg groupBy over the
    already-distinct edge list.

Resolution model (RFC 3986 §5 as pure expressions, r4): absolute
http(s) kept as-is; protocol-relative '//h/p' gets the base scheme;
root-relative '/p' joins the base origin; RELATIVE refs merge with the
base path's directory (§5.3) — and both of the last two run
remove_dot_segments (§5.2.4: './' dropped, '../' pops a segment,
floored at root, trailing dot segments leave a trailing slash), so
'../a' from '/sec/idx' resolves to '/a', not '/../a'. Documented
simplifications: dot-segment removal applies to the whole merged
string (a query/fragment containing '/./' or '/../' would be
normalized too — not a shape real hrefs take), and absolute refs are
NOT re-normalized (a crawl frontier canonicalizes those with
`ocr_spark.operators.urls.canonicalize_url`).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.bucketing import host_of


def outlinks_udf(html: Column) -> Column:
    """array<string> of raw hrefs per page (binary html column)."""
    from ocr_spark.core.encoding import decode_bytes
    from ocr_spark.core.links import outlinks

    @F.pandas_udf("array<string>")
    def _links(pages: pd.Series) -> pd.Series:
        out = []
        for blob in pages:
            if blob is None:
                out.append([])
                continue
            text, _ = decode_bytes(bytes(blob))
            out.append(outlinks(text))
        return pd.Series(out)

    return _links(html)


def remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 over a path column that starts with '/': one
    fold over the split segments — '.' dropped, '..' pops the last kept
    segment (never the leading root), a TRAILING '.'/'..' leaves a
    trailing slash, '//' runs preserved. Pure codegen'd expressions,
    oracle-mirrorable as the same list fold."""
    segs = F.split(path, "/", -1)  # leading "" = the root anchor
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: (
            F.when(s == ".", acc)
             .when(s == "..",
                   F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(1))))
             .otherwise(F.concat(acc, F.array(s)))))
    last = F.element_at(segs, -1)
    out = F.when(last.isin(".", ".."),
                 F.concat(folded, F.array(F.lit("")))).otherwise(folded)
    return F.array_join(out, "/")


def resolve_links(links: Column, base_url: Column) -> Column:
    """Resolve raw hrefs against the page URL — pure expressions (see
    the module docstring for the RFC 3986 mapping)."""
    scheme = F.regexp_extract(base_url, "^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    origin = F.regexp_extract(base_url, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)",
                              1)
    # base path's directory (§5.3 merge): path up to the last '/', '/'
    # when the base has no path beyond the authority
    base_path = F.regexp_extract(base_url,
                                 "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/[^?#]*)?",
                                 1)
    base_dir = F.regexp_extract(base_path, "^(.*/)", 1)
    base_dir = F.when(base_dir == "", F.lit("/")).otherwise(base_dir)

    def one(l: Column) -> Column:
        return (F.when(l.startswith("http://") | l.startswith("https://"), l)
                .when(l.startswith("//"), F.concat(scheme, F.lit(":"), l))
                .when(l.startswith("/"),
                      F.concat(origin, remove_dot_segments(l)))
                .otherwise(F.concat(
                    origin, remove_dot_segments(F.concat(base_dir, l)))))

    return F.transform(links, one)


def host_edges(df: DataFrame, url_col: str, links_col: str) -> DataFrame:
    """Distinct (src_host, dst_host) edges; self-edges dropped."""
    e = df.select(
        host_of(F.col(url_col)).alias("src_host"),
        F.explode(resolve_links(F.col(links_col), F.col(url_col)))
        .alias("_l"))
    e = e.select("src_host", host_of(F.col("_l")).alias("dst_host"))
    return (e.where(F.col("dst_host").isNotNull()
                    & (F.col("dst_host") != F.col("src_host")))
            .distinct())


def host_indegree(edges: DataFrame) -> DataFrame:
    """Distinct referring hosts per destination host (quality prior)."""
    return (edges.groupBy("dst_host")
            .agg(F.count(F.lit(1)).alias("n_ref_hosts")))


def host_pagerank(edges: DataFrame, n_iters: int = 3,
                  damping: float = 0.85) -> DataFrame:
    """Fixed-iteration PageRank over the distinct host edge list.

    Variant (documented, oracle-mirrorable): dangling hosts keep the
    base (1-d)/N mass and their rank is NOT redistributed — the usual
    web-graph shortcut when ranks feed a quality prior rather than a
    probability distribution. Deterministic for a fixed n_iters, so the
    DuckDB oracle can unroll the iterations and verify VALUES.

    Scale shape: per iteration ONE equi-join of the rank vector with the
    edge list on src_host + ONE partial-aggregated groupBy on dst_host —
    both shuffle (host, double) pairs only. Hot hosts are real here
    (everyone links to wikipedia): AQE skew-join splits the probe side;
    ranks and degrees are host-grain (millions of rows at web scale, not
    trillions), so iterations are cheap relative to the edge join. For
    long chains (n_iters >> 5) interpose localCheckpoint every few
    rounds as dedup_components does; at the default 3 the lineage is
    shallow enough to leave intact.
    """
    # The working set is host-grain (millions of rows at web scale, not
    # trillions) — cache it, or every iteration re-derives edges/hosts/
    # degrees from the underlying corpus scan (captured before the fix:
    # a 179-node static plan re-scanning documents ~10x).
    edges = edges.cache()
    hosts = (edges.select(F.col("src_host").alias("host"))
             .union(edges.select("dst_host")).distinct().cache())
    n = hosts.count()
    base = (1.0 - damping) / n
    deg = (edges.groupBy("src_host").agg(F.count(F.lit(1)).alias("deg"))
           .cache())
    p = hosts.withColumn("pr", F.lit(1.0 / n))
    for _ in range(n_iters):
        contrib = (p.join(edges, p["host"] == edges["src_host"])
                   .join(deg, "src_host")
                   .groupBy("dst_host")
                   .agg(F.sum(F.col("pr") / F.col("deg")).alias("c")))
        p = (hosts.join(contrib, hosts["host"] == contrib["dst_host"],
                        "left")
             .select("host",
                     (F.lit(base) + F.lit(damping)
                      * F.coalesce(F.col("c"), F.lit(0.0))).alias("pr")))
    return p


def head_meta_udf(html: Column) -> Column:
    """struct<noindex boolean, canonical string, title string> per page —
    the pre-spend gate (robots compliance + the site's own canonical
    dedup key + title). Early-exit head-only tokenization
    (core/headmeta.py); one narrow Arrow UDF, pages never shuffle."""
    from ocr_spark.core.encoding import decode_bytes
    from ocr_spark.core.headmeta import head_meta

    @F.pandas_udf("noindex boolean, canonical string, title string")
    def _meta(pages: pd.Series) -> pd.DataFrame:
        rows = []
        for blob in pages:
            if blob is None:
                rows.append((False, None, None))
                continue
            text, _ = decode_bytes(bytes(blob))
            rows.append(head_meta(text))
        return pd.DataFrame(rows,
                            columns=["noindex", "canonical", "title"])

    return _meta(html)


def anchored_outlinks_udf(html: Column) -> Column:
    """array<struct<href,anchor>> per page — same single tokenizer pass
    as ``outlinks_udf`` but carrying the anchor text (the classic
    inbound-anchor document signal, Craswell et al. 2001); hrefs come
    out in identical order, so callers needing both take ONE UDF and
    project `transform(x -> x.href)`."""
    from ocr_spark.core.encoding import decode_bytes
    from ocr_spark.core.links import anchored_outlinks

    @F.pandas_udf("array<struct<href: string, anchor: string>>")
    def _pairs(pages: pd.Series) -> pd.Series:
        out = []
        for blob in pages:
            if blob is None:
                out.append([])
                continue
            text, _ = decode_bytes(bytes(blob))
            out.append(anchored_outlinks(text))
        return pd.Series(out)

    return _pairs(html)


def host_anchor_summary(pairs: DataFrame, host_col: str,
                        anchor_col: str) -> DataFrame:
    """Inbound-anchor aggregation per destination host: how the web
    describes each host — (host, n_inbound, n_anchors, top_anchor). Top
    anchor = most frequent inbound anchor text, tie broken to the
    lexicographically LAST anchor (max of a (cnt, anchor) struct — the
    deterministic rule both engines share).

    Scale shape (100 TB): aggregate at (host, anchor) grain FIRST —
    partial agg collapses the everyone-says-'click here' hot pairs
    map-side — then ONE host-grain groupBy carries a small struct per
    distinct anchor; no window, no global sort, anchors never ride a
    row-per-link shuffle twice.
    """
    ha = (pairs.groupBy(host_col, anchor_col)
          .agg(F.count(F.lit(1)).alias("_c")))
    return (ha.groupBy(host_col).agg(
        F.sum("_c").alias("n_inbound"),
        F.count(F.lit(1)).alias("n_anchors"),
        F.max(F.struct(F.col("_c").alias("c"),
                       F.col(anchor_col).alias("a"))).alias("_m"))
        .select(F.col(host_col), "n_inbound", "n_anchors",
                F.col("_m.a").alias("top_anchor")))


def sitemap_locs_udf(xml: Column) -> Column:
    """array<struct<loc,lastmod>> per sitemap document (string column) —
    page URLs for a <urlset>, child pointers for a <sitemapindex>.
    One narrow Arrow UDF over the (tiny: <= 50k URLs / 50 MB by
    protocol) sitemap bodies; the corpus-side join against discovered
    URLs happens relationally afterwards."""
    from ocr_spark.core.sitemap import sitemap_locs

    @F.pandas_udf("array<struct<loc: string, lastmod: string>>")
    def _locs(bodies: pd.Series) -> pd.Series:
        return pd.Series([[] if b is None else sitemap_locs(b)
                          for b in bodies])

    return _locs(xml)
