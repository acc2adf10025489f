"""Relational operator inventory over the driver testdata tables.

One QuerySpec per SURVEY.md §2 row OR per composite suite covering
several rows (round-3 consolidation, VERDICT r2 #1: the driver's
correctness gate checks only the first 50 registered queries, so the 30
single-primitive micro-queries of rounds 1-2 are folded into multi-column
composites — every §2 row still maps to a NAMED OUTPUT COLUMN, listed in
each query's note and in SURVEY.md §2). The Spark side is DataFrame API
(declarative — Catalyst does pushdown/pruning/reordering); the SQL side
is the DuckDB oracle.

Determinism rules applied throughout:
  * every aggregate/computed column aliased identically on both sides;
  * floats rounded to fixed decimals on both sides;
  * ordered aggregations carry explicit tie-breaks (event_id, keys);
  * scalar thresholds (avg+stddev) rounded before comparison so boundary
    rows cannot flip between engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ocr_spark.queries import QuerySpec, load

QUERIES: list[QuerySpec] = []


def q(name: str, sql: str | None, note: str = ""):
    def deco(fn):
        QUERIES.append(QuerySpec(name, fn, sql, note))
        return fn
    return deco


# ------------------------------------------------------- composite suites

# Deterministic raw-URL construction for the URL-canonicalization fold:
# documents carry no url column, so one is synthesized from
# (doc_id, source, lang) with every noise class the canonicalizer must
# erase — scheme/host case, explicit default port, tracking params,
# param order, fragment, trailing slash (same pattern as roundtrip.py's
# HTML template: the oracle mirrors the construction string-for-string).
_URL_SQL = (
    "(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END || '://' || "
    "CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END || "
    "'.example.com' || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END || "
    "'/' || lang || '/page-' || CAST(doc_id % 50 AS VARCHAR) || "
    "CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END || "
    "CASE WHEN doc_id % 2 = 0 THEN "
    "'?b=2&utm_source=feed&a=' || CAST(doc_id % 100 AS VARCHAR) "
    "ELSE '?a=' || CAST(doc_id % 100 AS VARCHAR) || '&gclid=xyz&b=2' END "
    "|| '#sec')")


def _url_expr():
    did = F.col("doc_id")
    return F.concat(
        F.when(did % 2 == 0, "HTTPS").otherwise("https"), F.lit("://"),
        F.when(did % 3 == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".example.com"),
        F.when(did % 5 == 0, ":443").otherwise(""),
        F.lit("/"), F.col("lang"), F.lit("/page-"),
        (did % 50).cast("string"),
        F.when(did % 4 == 0, "/").otherwise(""),
        F.when(did % 2 == 0,
               F.concat(F.lit("?b=2&utm_source=feed&a="),
                        (did % 100).cast("string")))
        .otherwise(F.concat(F.lit("?a="), (did % 100).cast("string"),
                            F.lit("&gclid=xyz&b=2"))),
        F.lit("#sec"))


# Host graph for the PageRank fold: each doc's host links to one of 7
# external hosts (doc_id % 7), mirroring the roundtrip query's outlink
# construction. The oracle unrolls host_pagerank's exact arithmetic
# (damping 0.85, dangling hosts keep base mass) for 3 iterations.
_EXT_HOST_SQL = "('out' || CAST(doc_id % 7 AS VARCHAR) || '.example.net')"

# robots rule model shared by the Spark side and the oracle: (pattern,
# allow); the third rule carries RFC 9309 wildcards. rx strings are the
# pattern_re translation, valid in Java regex AND RE2.
def _robots_rules() -> list[tuple[str, bool]]:
    return [("/de", False), ("/de/page-1", True), ("/*/page-3$", False)]


def _robots_values() -> str:
    from ocr_spark.core.robots import pattern_re
    return ", ".join(
        f"('{p}', {'true' if a else 'false'}, '{pattern_re(p)}')"
        for p, a in _robots_rules())


_ROBOTS_VALUES = _robots_values()
_PR_CTES = (
    ", eh AS (SELECT DISTINCT lower(source) || '.example.com' AS s, "
    f"{_EXT_HOST_SQL} AS t FROM documents), "
    "hosts AS (SELECT s AS h FROM eh UNION SELECT t FROM eh), "
    "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM hosts), "
    "dg AS (SELECT s, count(*) AS deg FROM eh GROUP BY s), "
    "p0 AS (SELECT h, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS pr "
    "FROM hosts), "
    + " ".join(
        f"c{i} AS (SELECT eh.t AS h, sum(p{i-1}.pr / dg.deg) AS c FROM eh "
        f"JOIN p{i-1} ON p{i-1}.h = eh.s JOIN dg ON dg.s = eh.s "
        "GROUP BY eh.t), "
        f"p{i} AS (SELECT hosts.h, (CAST(1 AS DOUBLE) - CAST(0.85 AS "
        "DOUBLE)) / (SELECT n FROM nn) + CAST(0.85 AS DOUBLE) * "
        f"coalesce(c{i}.c, CAST(0 AS DOUBLE)) AS pr "
        f"FROM hosts LEFT JOIN c{i} ON c{i}.h = hosts.h),"
        for i in (1, 2, 3)).rstrip(","))


def _documents_enriched_sql():
    from ocr_spark.operators.urls import oracle_canon_sql
    canon = oracle_canon_sql(_URL_SQL)
    return (
        "WITH c AS (SELECT doc_id, lang, source, n_chars, text, "
        f"{canon} AS url_canon, {_EXT_HOST_SQL} AS eh FROM documents)"
        + _PR_CTES +
        # inbound-anchor model: every doc sends anchor 'more-<doc_id%9>'
        # to its external host; top anchor = (cnt desc, anchor desc)
        ", ap AS (SELECT eh, 'more-' || CAST(doc_id % 9 AS VARCHAR) "
        "AS a FROM c), "
        "ac AS (SELECT eh, a, count(*) AS cnt FROM ap GROUP BY 1, 2), "
        "tp AS (SELECT eh, a, ROW_NUMBER() OVER (PARTITION BY eh "
        "ORDER BY cnt DESC, a DESC) AS rn FROM ac), "
        "ti AS (SELECT eh, CAST(sum(cnt) AS BIGINT) AS n_in "
        "FROM ac GROUP BY 1), "
        # robots model: per-host '/de' disallow, '/de/page-1' allow
        # override, and the RFC 9309 wildcard rule '/*/page-3$' (both
        # `*` and the `$` anchor exercised — page-30..39 must NOT
        # match); most specific (longest rule string) wins, allow wins
        # a same-length tie. rx literals come from the SAME pattern_re
        # translation the Spark side broadcasts.
        "rb AS (SELECT rhost, prefix, allow, rx FROM "
        "(SELECT DISTINCT lower(source) || '.example.com' AS rhost "
        "FROM documents) "
        f"CROSS JOIN (VALUES {_ROBOTS_VALUES}) "
        "rr(prefix, allow, rx)), "
        "pp AS (SELECT doc_id, lower(source) || '.example.com' AS chost, "
        "COALESCE(NULLIF(regexp_extract(url_canon, "
        "'^[A-Za-z+.-]+://[^/]*(/.*)$', 1), ''), '/') AS pth FROM c), "
        "rm AS (SELECT pp.doc_id, rb.prefix, rb.allow FROM pp "
        "JOIN rb ON rb.rhost = pp.chost "
        "AND regexp_matches(pp.pth, rb.rx)), "
        "rv AS (SELECT doc_id, allow, ROW_NUMBER() OVER (PARTITION BY "
        "doc_id ORDER BY length(prefix) DESC, allow DESC) AS rn "
        "FROM rm) "
        "SELECT doc_id, lang, source, n_chars, "
        "concat(lang, ':', reverse(substr(text, 1, 20))) AS tag, "
        "length(trim(text)) AS n_trim, "
        "CAST(contains(text, 'data') AS INT) AS has_marker, "
        "regexp_replace(text, '[^a-z ]', '', 'g') AS clean, "
        "url_canon, "
        # ts is epoch + doc_id seconds (monotone, distinct) so the
        # keep-latest keeper inside a canonical group is max(doc_id)
        "CAST(doc_id = max(doc_id) OVER (PARTITION BY url_canon) AS INT) "
        "AS is_latest, "
        "ROUND((SELECT pr FROM p3 WHERE p3.h = c.eh), 6) AS ext_pr3, "
        "(SELECT a FROM tp WHERE tp.eh = c.eh AND rn = 1) "
        "AS ext_top_anchor, "
        "(SELECT n_in FROM ti WHERE ti.eh = c.eh) AS ext_n_inbound, "
        "CAST(COALESCE((SELECT allow FROM rv "
        "WHERE rv.doc_id = c.doc_id AND rn = 1), TRUE) AS INT) "
        "AS robots_ok "
        "FROM c")


@q("documents_enriched",
   _documents_enriched_sql(),
   "composite: S1 full scan + P1 projection + P8 char whitelist + "
   "F1 concat/reverse + F2 trim/length + F3 substring membership + r3 "
   "URL canonicalization / recrawl keep-latest (operators/urls.py: "
   "url_canon is a pure codegen'd expression erasing scheme/host case, "
   "default port, trackers, param order, fragment, trailing slash; "
   "is_latest joins dedup_latest_capture's one partial-agg groupBy — "
   "newest capture per canonical URL wins; ext_pr3 is host_pagerank "
   "(operators/weblinks.py, 3 fixed iterations, damping 0.85, VALUES "
   "verified against the oracle's unrolled iterations) of each doc's "
   "external destination host) — one narrow pass over documents, one "
   "named column per §2 row. Late fold: inbound-anchor aggregation "
   "(host_anchor_summary — ext_top_anchor = the most frequent anchor "
   "text pointing at the doc's external host, tie -> lexicographically "
   "last; ext_n_inbound = that host's inbound link count; anchor "
   "EXTRACTION from real HTML is verified by extract_html_roundtrip's "
   "anchors_csv, this verifies the host-grain aggregation). Late fold: "
   "robots.txt gating (apply_robots, RFC 9309 most-specific-match "
   "with allow-wins-tie over a broadcast per-host rule table; rule "
   "PARSING from robots.txt text is core/robots.py, pytest-covered — "
   "robots_ok verifies the distributed evaluation: '/de' disallow + "
   "'/de/page-1' allow override + the '/*/page-3$' wildcard rule, "
   "whose $ anchor must NOT catch page-30..39; both engines match the "
   "same pattern_re regex translation)")
def documents_enriched(spark, sf):
    from ocr_spark.functions.bucketing import host_of
    from ocr_spark.operators.urls import (
        apply_robots, canonicalize_url, dedup_latest_capture)
    from ocr_spark.operators.weblinks import (
        host_anchor_summary, host_pagerank)
    d = load(spark, sf, "documents").withColumn("url", _url_expr())
    # capture ts: epoch + doc_id seconds — distinct and monotone, the
    # recrawl simulation (newer doc_id = newer capture of the same page)
    d = d.withColumn("capture_ts",
                     F.timestamp_seconds(F.col("doc_id") + F.lit(1)))
    keepers = dedup_latest_capture(d, "url", "capture_ts", "doc_id")
    enriched = d.select(
        "doc_id", "lang", "source", "n_chars",
        F.concat(F.col("lang"), F.lit(":"),
                 F.reverse(F.substring("text", 1, 20))).alias("tag"),
        F.length(F.trim(F.col("text"))).alias("n_trim"),
        F.col("text").contains("data").cast("int").alias("has_marker"),
        F.regexp_replace("text", "[^a-z ]", "").alias("clean"),
        canonicalize_url(F.col("url")).alias("url_canon"))
    ext_host = F.concat(F.lit("out"), (F.col("doc_id") % 7).cast("string"),
                        F.lit(".example.net"))
    edges = (d.select(
        host_of(canonicalize_url(F.col("url"))).alias("src_host"),
        ext_host.alias("dst_host")).distinct())
    pr = host_pagerank(edges, n_iters=3).withColumnRenamed("host",
                                                           "ext_host")
    anchors = (d.select(
        ext_host.alias("ext_host"),
        F.concat(F.lit("more-"),
                 (F.col("doc_id") % 9).cast("string")).alias("anchor")))
    asum = host_anchor_summary(anchors, "ext_host", "anchor")
    from ocr_spark.operators.urls import robots_pattern_table
    rules = (d.select(F.concat(F.lower("source"), F.lit(".example.com"))
                      .alias("host")).distinct()
             .crossJoin(robots_pattern_table(spark, _robots_rules())))
    robots = apply_robots(
        d.select("doc_id", canonicalize_url(F.col("url")).alias("_uc")),
        "doc_id", "_uc", rules)
    return (enriched.join(keepers.select("url_canon", "keeper_id"),
                          "url_canon")
            .withColumn("is_latest",
                        (F.col("doc_id") == F.col("keeper_id")).cast("int"))
            .withColumn("ext_host", ext_host)
            .join(F.broadcast(pr), "ext_host")
            .withColumn("ext_pr3", F.round("pr", 6))
            .join(F.broadcast(asum.select(
                "ext_host", F.col("top_anchor").alias("ext_top_anchor"),
                F.col("n_inbound").alias("ext_n_inbound"))), "ext_host")
            .join(robots.select(
                "doc_id", F.col("robots_ok").cast("int")
                .alias("robots_ok")), "doc_id")
            .drop("keeper_id", "ext_host", "pr"))


def _z18_sql() -> str:
    from ocr_spark.functions.bucketing import zorder_sql
    return zorder_sql(["CAST(FLOOR(value) AS BIGINT)", "user_id"],
                      bits=9)


_Z18_SQL = _z18_sql()


@q("events_enriched",
   "WITH g AS (SELECT max(value) AS mx, "
   "ROUND(avg(value) + stddev_samp(value) * 0.7, 6) AS thr FROM events) "
   "SELECT event_id, "
   "ROUND(abs(value - 50.0), 4) AS dist, "
   "CAST(FLOOR(value / 10) AS BIGINT) AS decile, "
   "ROUND(GREATEST(5.0, LEAST(95.0, value)), 4) AS clamped, "
   "ROUND(value / 255.0, 6) AS norm255, "
   "ROUND(value / (SELECT mx FROM g), 6) AS norm_max, "
   "CASE WHEN value < 60 THEN 'low' ELSE 'ok' END AS conf_class, "
   "CAST(value > (SELECT thr FROM g) AS INT) AS is_outlier, "
   "ROUND(value - lag(value) OVER "
   "(PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta, "
   "ROUND(value - min(value) OVER (PARTITION BY user_id), 4) AS rebased, "
   "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, "
   "event_id DESC) AS rn, "
   + _Z18_SQL + " AS z18 "
   "FROM events",
   "composite: F5 math family (dist/decile) + F6 clamp + F7 normalize + "
   "A3 normalize-by-max (scalar-subquery broadcast) + A5 adaptive "
   "mean+stddev threshold + P6 case classification + W3 gradient lag + "
   "W5 analytic rebase + W4 ranking window — one broadcast of the two "
   "scalars, one window shuffle on user_id serving all three frames. "
   "Late fold: Z-order clustering key (z18 — Morton interleave of "
   "floor(value) x user_id at 9 bits each, bit-exact in both engines; "
   "the write-side layout op zorder_layout range-partitions + sorts on "
   "it, pytest-verified disjoint per-file ranges)")
def events_enriched(spark, sf):
    from ocr_spark.functions.bucketing import zorder_key
    e = load(spark, sf, "events")
    g = e.agg(F.max("value").alias("mx"),
              F.round(F.avg("value") + F.stddev_samp("value") * 0.7, 6)
              .alias("thr"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wmin = Window.partitionBy("user_id")
    wrank = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id"))
    return e.crossJoin(F.broadcast(g)).select(
        "event_id",
        F.round(F.abs(F.col("value") - 50.0), 4).alias("dist"),
        F.floor(F.col("value") / 10).cast("long").alias("decile"),
        F.round(F.greatest(F.lit(5.0), F.least(F.lit(95.0),
                                               F.col("value"))), 4)
        .alias("clamped"),
        F.round(F.col("value") / 255.0, 6).alias("norm255"),
        F.round(F.col("value") / F.col("mx"), 6).alias("norm_max"),
        F.when(F.col("value") < 60, "low").otherwise("ok")
        .alias("conf_class"),
        (F.col("value") > F.col("thr")).cast("int").alias("is_outlier"),
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
        F.round(F.col("value") - F.min("value").over(wmin), 4)
        .alias("rebased"),
        F.row_number().over(wrank).alias("rn"),
        zorder_key([F.floor(F.col("value")).cast("long"),
                    F.col("user_id")], bits=9).alias("z18"))


@q("documents_rollup_metrics",
   "WITH r AS (SELECT source, lang, count(*) AS cnt, "
   "ROUND(avg(n_chars), 4) AS avg_chars "
   "FROM documents GROUP BY ROLLUP(source, lang)), "
   "u AS (SELECT source, " + _URL_SQL + " AS url FROM documents), "
   "sm AS (SELECT source, CAST(count(*) AS INT) AS n_sitemap_urls, "
   "md5(string_agg(url, ',' ORDER BY url)) AS sitemap_md5 "
   "FROM u GROUP BY source) "
   "SELECT r.source, r.lang, r.cnt, r.avg_chars, "
   "sm.n_sitemap_urls, sm.sitemap_md5 "
   "FROM r LEFT JOIN sm ON r.source = sm.source",
   "composite: S2 labeled-source counts + A9 extraction-metrics shape + "
   "A10 ROLLUP grouping sets — per-(source, lang) metrics with subtotal "
   "and grand-total rows. Late fold: sitemap discovery — a per-source "
   "<urlset> is BUILT from the sorted doc URLs and parsed back by the "
   "REAL from-scratch parser (core/sitemap.py over the streaming "
   "tokenizer); sitemap_md5 pins every parsed <loc> string and their "
   "order, the oracle reconstructs the same joined-URL digest without "
   "parsing (NULL on the grand-total row)")
def documents_rollup_metrics(spark, sf):
    from ocr_spark.operators.weblinks import sitemap_locs_udf
    d = load(spark, sf, "documents")
    base = (d.rollup("source", "lang")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars")))
    xml = d.select("source", _url_expr().alias("_u")).groupBy(
        "source").agg(F.concat(
            F.lit('<?xml version="1.0"?><urlset>'),
            F.concat_ws("", F.transform(
                F.array_sort(F.collect_list("_u")),
                lambda u: F.concat(F.lit("<url><loc>"), u,
                                   F.lit("</loc></url>")))),
            F.lit("</urlset>")).alias("_xml"))
    locs = F.transform(sitemap_locs_udf(F.col("_xml")),
                       lambda e: e["loc"])
    sm = xml.select(
        "source", F.size(locs).cast("int").alias("n_sitemap_urls"),
        F.md5(F.array_join(locs, ",")).alias("sitemap_md5"))
    return base.join(F.broadcast(sm), "source", "left")


@q("events_profile_by_type",
   "SELECT event_type, count(*) AS cnt, "
   "ROUND(sum(value), 4) AS ink, "
   "ROUND(avg(CASE WHEN value >= 50 THEN 1.0 ELSE 0.0 END), 4) "
   "AS high_share, "
   "count(DISTINCT user_id) AS users_exact, "
   "CAST(abs(approx_count_distinct(user_id) - count(DISTINCT user_id)) "
   "<= 0.1 * count(DISTINCT user_id) AS INT) AS approx_ok, "
   "ROUND(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) "
   "AS avg_k, "
   "ROUND(median(value), 4) AS med, "
   "CAST(abs(quantile_cont(value, 0.5) - median(value)) "
   "<= greatest(0.05 * abs(median(value)), 1e-9) AS INT) AS p50_ok "
   "FROM events GROUP BY event_type",
   "composite: A2 profile sum + A7 conditional-agg share + A8 exact AND "
   "approx count-distinct + F8 JSON extraction, one hash agg. The approx "
   "contract is the ACCURACY BOUND (sketches differ per engine): each "
   "engine checks its OWN HLL within 10% of its exact count — both "
   "sketches are exercised (ADVICE r2 #5), the driver compares the "
   "boolean. Late fold: exact interpolated median (med — VALUES "
   "verified across engines) + p50_ok, the same bound contract for "
   "percentile_approx: each engine checks its own sketch/estimator "
   "against its own exact median within 5%")
def events_profile_by_type(spark, sf):
    e = load(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 4).alias("ink"),
        F.round(F.avg(F.when(F.col("value") >= 50, 1.0).otherwise(0.0)), 4)
        .alias("high_share"),
        F.countDistinct("user_id").alias("users_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.median("value").alias("_med"),
        F.percentile_approx("value", 0.5, 10000).alias("_p50a"))
    ok = (F.abs(F.col("_approx") - F.col("users_exact"))
          <= 0.1 * F.col("users_exact")).cast("int")
    p50_ok = (F.abs(F.col("_p50a") - F.col("_med"))
              <= F.greatest(0.05 * F.abs(F.col("_med")),
                            F.lit(1e-9))).cast("int")
    return agg.select("event_type", "cnt", "ink", "high_share",
                      "users_exact", ok.alias("approx_ok"), "avg_k",
                      F.round("_med", 4).alias("med"),
                      p50_ok.alias("p50_ok"))


@q("time_bucket_counts",
   "SELECT strftime(ts, '%Y-%m-%d') AS day, "
   "time_bucket(INTERVAL 5 MINUTE, ts) AS win_start, count(*) AS cnt "
   "FROM events GROUP BY 1, 2",
   "composite: F9 date bucketing (partition-pruning key shape) + §2.10 "
   "tumbling-window aggregation (batch form of the streaming analog)")
def time_bucket_counts(spark, sf):
    e = load(spark, sf, "events")
    return (e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"),
                      F.window("ts", "5 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select("day", F.col("w.start").alias("win_start"), "cnt"))


@q("lineitem_topk_filtered",
   "SELECT l_orderkey, l_linenumber, l_extendedprice, "
   "ROUND(l_extendedprice / l_quantity, 4) AS unit_price "
   "FROM lineitem "
   "WHERE l_quantity BETWEEN 10 AND 20 "
   "AND l_extendedprice > 1000.0 "
   "AND l_extendedprice / l_quantity BETWEEN 50 AND 5000 "
   "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10",
   "composite: P2 threshold predicate + P4/P7 range filter (pushed to "
   "parquet row groups) + P5 computed-expression filter + T3 global "
   "top-k (TakeOrderedAndProject over the filtered scan; descending "
   "order also covers T1's sort shape)")
def lineitem_topk_filtered(spark, sf):
    li = load(spark, sf, "lineitem")
    ratio = F.col("l_extendedprice") / F.col("l_quantity")
    return (li.where(F.col("l_quantity").between(10, 20)
                     & (F.col("l_extendedprice") > 1000.0)
                     & ratio.between(50, 5000))
            .select("l_orderkey", "l_linenumber", "l_extendedprice",
                    F.round(ratio, 4).alias("unit_price"))
            .orderBy(F.desc("l_extendedprice"), "l_orderkey",
                     "l_linenumber")
            .limit(10))


@q("t_limit_suite",
   "SELECT kind, event_id FROM ("
   "SELECT 'recent' AS kind, event_id FROM "
   "(SELECT event_id FROM events ORDER BY ts DESC, event_id LIMIT 50) "
   "UNION ALL SELECT 'lowest' AS kind, event_id FROM "
   "(SELECT event_id FROM events ORDER BY value ASC, event_id LIMIT 20) "
   "UNION ALL SELECT 'probe' AS kind, (SELECT count(*) FROM "
   "(SELECT 1 FROM events WHERE value > 99.9 LIMIT 1)) AS event_id)",
   "composite: T1 descending sort + T4 bottom-k (both "
   "TakeOrderedAndProject: per-partition heap + driver merge, no global "
   "sort) + T5 early-exit LIMIT 1 existence probe (CollectLimit "
   "short-circuits the scan), tagged and unioned")
def t_limit_suite(spark, sf):
    e = load(spark, sf, "events")
    recent = (e.orderBy(F.desc("ts"), "event_id").limit(50)
              .select(F.lit("recent").alias("kind"), "event_id"))
    lowest = (e.orderBy(F.asc("value"), "event_id").limit(20)
              .select(F.lit("lowest").alias("kind"), "event_id"))
    probe = (e.where(F.col("value") > 99.9).select(F.lit(1)).limit(1)
             .agg(F.count(F.lit(1)).alias("event_id"))
             .select(F.lit("probe").alias("kind"),
                     F.col("event_id").cast("long")))
    return recent.unionByName(lowest).unionByName(probe)


@q("set_ops_suite",
   "SELECT 'except' AS op, CAST(c_custkey AS BIGINT) AS id FROM "
   "(SELECT c_custkey FROM customer EXCEPT "
   "SELECT o_custkey AS c_custkey FROM orders) "
   "UNION ALL SELECT 'intersect' AS op, CAST(user_id AS BIGINT) AS id "
   "FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'click' "
   "INTERSECT SELECT DISTINCT user_id FROM events "
   "WHERE event_type = 'purchase') "
   "UNION ALL SELECT 'union' AS op, CAST(user_id AS BIGINT) AS id FROM "
   "(SELECT DISTINCT user_id FROM events WHERE event_type = 'click' "
   "UNION SELECT DISTINCT o_custkey AS user_id FROM orders "
   "WHERE o_orderstatus = 'F')",
   "composite: §2.7 EXCEPT (the urls-not-in-checkpoint resume predicate "
   "shape) + INTERSECT + UNION-distinct, tagged and unioned")
def set_ops_suite(spark, sf):
    c = load(spark, sf, "customer").select(
        F.col("c_custkey").cast("long").alias("id"))
    o = load(spark, sf, "orders")
    e = load(spark, sf, "events")
    exc = (c.subtract(o.select(F.col("o_custkey").cast("long").alias("id")))
           .select(F.lit("except").alias("op"), "id"))
    clicks = (e.where(F.col("event_type") == "click")
              .select(F.col("user_id").cast("long").alias("id")).distinct())
    purch = (e.where(F.col("event_type") == "purchase")
             .select(F.col("user_id").cast("long").alias("id")).distinct())
    inter = clicks.intersect(purch).select(
        F.lit("intersect").alias("op"), "id")
    uni = (clicks.union(
        o.where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").cast("long").alias("id")))
        .distinct().select(F.lit("union").alias("op"), "id"))
    return exc.unionByName(inter).unionByName(uni)


@q("a1_profile_local_minima",
   "WITH s AS (SELECT user_id, ROUND(sum(value), 4) AS total FROM events "
   "GROUP BY user_id), "
   "w AS (SELECT user_id, total, lag(total) OVER (ORDER BY user_id) AS pv, "
   "lead(total) OVER (ORDER BY user_id) AS nv FROM s) "
   "SELECT user_id, total, "
   "CAST(COALESCE(total < pv AND total < nv, FALSE) AS INT) "
   "AS is_local_min FROM w",
   "composite: A1 horizontal projection profile (hash agg with partial "
   "aggregation; the scan prunes to 2 of 6 columns — P1's pruning "
   "evidence, see PLANS.md) + W2 lag/lead local-minima peak finding over "
   "the profile")
def a1_profile_local_minima(spark, sf):
    e = load(spark, sf, "events")
    s = e.groupBy("user_id").agg(F.round(F.sum("value"), 4).alias("total"))
    w = Window.orderBy("user_id")
    cur = (s.withColumn("pv", F.lag("total").over(w))
           .withColumn("nv", F.lead("total").over(w)))
    is_min = F.coalesce((F.col("total") < F.col("pv"))
                        & (F.col("total") < F.col("nv")), F.lit(False))
    return cur.select("user_id", "total",
                      is_min.cast("int").alias("is_local_min"))


# ------------------------------------------------ single-primitive rows

@q("a4_ordered_text_assembly",
   "SELECT user_id, string_agg(event_type, '' ORDER BY ts, event_id) "
   "AS journey FROM events GROUP BY user_id",
   "A4 RTL reassembly analog: ordered aggregation with explicit "
   "tie-break (array_sort covers T2)")
def a4(spark, sf):
    e = load(spark, sf, "events")
    return (e.groupBy("user_id")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("ts", "event_id", "event_type"))),
                    lambda s: s["event_type"]),
                "").alias("journey")))


@q("a6_confusion_matrix_pivot",
   "SELECT source, "
   "CAST(sum(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS BIGINT) AS en, "
   "CAST(sum(CASE WHEN lang='de' THEN 1 ELSE 0 END) AS BIGINT) AS de, "
   "CAST(sum(CASE WHEN lang='es' THEN 1 ELSE 0 END) AS BIGINT) AS es, "
   "CAST(sum(CASE WHEN lang='fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr, "
   "CAST(sum(CASE WHEN lang='zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh "
   "FROM documents GROUP BY source",
   "A6 confusion matrix: pivot-shaped conditional aggregation")
def a6(spark, sf):
    d = load(spark, sf, "documents")
    aggs = [F.sum(F.when(F.col("lang") == lg, 1).otherwise(0)).alias(lg)
            for lg in ["en", "de", "es", "fr", "zh"]]
    return d.groupBy("source").agg(*aggs)


@q("w1_sessionize_gaps_islands",
   "WITH flagged AS (SELECT user_id, ts, CASE WHEN ts - lag(ts) OVER "
   "(PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE "
   "OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
   "THEN 1 ELSE 0 END AS new_session FROM events) "
   "SELECT user_id, CAST(sum(new_session) AS BIGINT) AS sessions "
   "FROM flagged GROUP BY user_id",
   "W1 run-length line detection: gaps-and-islands sessionization")
def w1(spark, sf):
    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    new_s = F.when(
        lag_ts.isNull()
        | (F.col("ts") - lag_ts > F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    return (e.select("user_id", new_s.alias("new_session"))
            .groupBy("user_id")
            .agg(F.sum("new_session").alias("sessions")))


@q("f10_array_explode_topwords",
   "WITH dw AS (SELECT word, doc_id, count(*) AS c_dw FROM "
   "(SELECT doc_id, unnest(string_split(text, ' ')) AS word "
   "FROM documents) WHERE word <> '' GROUP BY 1, 2), "
   "n AS (SELECT count(*) AS nd FROM documents), "
   "ws AS (SELECT word, CAST(sum(c_dw) AS BIGINT) AS cnt, "
   "count(*) AS doc_freq, max(c_dw) AS max_tf FROM dw GROUP BY 1) "
   "SELECT word, cnt, doc_freq, ROUND(ln(nd / doc_freq), 4) AS idf, "
   "ROUND(max_tf * ln(nd / doc_freq), 4) AS top_tfidf "
   "FROM ws CROSS JOIN n ORDER BY cnt DESC, word LIMIT 50",
   "F10 array ops: split/explode/agg word counts. Late fold: corpus "
   "TF-IDF word stats (doc_freq, idf = ln(N/df), top_tfidf = best "
   "single-doc raw-tf·idf) — (word, doc) grain aggregated FIRST so "
   "partial agg stays effective on stopword-hot words")
def f10(spark, sf):
    from ocr_spark.operators.textstats import tf_idf_word_stats
    d = load(spark, sf, "documents")
    return (tf_idf_word_stats(d, "doc_id", "text")
            .orderBy(F.desc("cnt"), "word").limit(50))


# Target mixture for sample_to_mixture: varied per-source keep
# fractions (1/4, 1/2, 3/4, 1 cycling over the 20 synth sources) — a
# deterministic stand-in for a real pipeline's tuned mixing weights.
_MIX = {f"src{i}": (i % 4 + 1) / 4 for i in range(20)}
_MIX_VALUES = ", ".join(
    f"('{s}', {int(round(f * 1_000_000))})" for s, f in _MIX.items())


def _stop_sql() -> str:
    from ocr_spark.operators.textstats import STOPWORDS
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


_STOP_SQL = _stop_sql()


@q("s10_stratified_split",
   "WITH h AS (SELECT doc_id, lang, source, "
   "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) "
   "AS hv FROM documents), "
   "g AS (SELECT doc_id, lang, source, hv, "
   "CASE WHEN hv % 10 < 8 THEN 'train' ELSE 'eval' END AS split, "
   "hv % 8 AS bucket FROM h), "
   "wt(source, ppm) AS (VALUES " + _MIX_VALUES + "), "
   "b AS (SELECT lang, split, bucket, count(*) AS cnt "
   "FROM g GROUP BY 1, 2, 3), "
   "m AS (SELECT lang, split, bucket, count(*) AS mix_kept "
   "FROM g LEFT JOIN wt USING (source) "
   "WHERE hv % 1000000 < COALESCE(ppm, 1000000) GROUP BY 1, 2, 3), "
   "c AS (SELECT source, count(*) AS scnt FROM documents GROUP BY 1), "
   "k AS (SELECT lang, split, bucket, count(*) AS cap_kept "
   "FROM g JOIN c USING (source) "
   "WHERE hv % 1000000 < least(1000000, "
   "CAST(floor(10 * 1000000 / scnt) AS BIGINT)) GROUP BY 1, 2, 3), "
   # exact top-40%-by-quality gate: histogram cumsum threshold (all
   # threshold ties kept) — mirrors sampling.top_fraction_gate
   "f AS (SELECT doc_id, text, "
   "list_filter(string_split(text, ' '), w -> w <> '') AS ws, "
   "length(text) AS n_chars FROM documents), "
   "q AS (SELECT doc_id, ROUND(least(len(ws) / 100.0, 1.0) * 0.4 "
   "+ (len(list_filter(ws, w -> list_contains(" + _STOP_SQL + ", w))) "
   "/ greatest(len(ws), 1)) * 0.3 "
   "+ (1.0 - (n_chars - length(regexp_replace(text, '[^\\w ]', '', "
   "'g'))) / greatest(n_chars, 1)) * 0.2 "
   "+ least((length(replace(text, ' ', '')) / greatest(len(ws), 1)) "
   "/ 8.0, 1.0) * 0.1, 4) AS qual FROM f), "
   "qc AS (SELECT qual, count(*) AS c FROM q GROUP BY 1), "
   "cq AS (SELECT qual, sum(c) OVER (ORDER BY qual DESC ROWS BETWEEN "
   "UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM qc), "
   "nq AS (SELECT count(*) AS n FROM documents), "
   "th AS (SELECT max(qual) AS thr FROM cq CROSS JOIN nq "
   "WHERE cum >= ceil(0.4 * n)), "
   "kq AS (SELECT g.lang, g.split, g.bucket, count(*) AS q40_kept "
   "FROM g JOIN q USING (doc_id) CROSS JOIN th "
   "WHERE q.qual >= th.thr GROUP BY 1, 2, 3) "
   "SELECT b.lang, b.split, b.bucket, b.cnt, "
   "COALESCE(m.mix_kept, 0) AS mix_kept, "
   "COALESCE(k.cap_kept, 0) AS cap_kept, "
   "COALESCE(kq.q40_kept, 0) AS q40_kept FROM b LEFT JOIN m "
   "ON b.lang = m.lang AND b.split = m.split AND b.bucket = m.bucket "
   "LEFT JOIN k "
   "ON b.lang = k.lang AND b.split = k.split AND b.bucket = k.bucket "
   "LEFT JOIN kq "
   "ON b.lang = kq.lang AND b.split = kq.split AND b.bucket = kq.bucket",
   "SURVEY §3.3 stratified train/eval split (reference analog: "
   "train_test_split(stratify=labels), /root/reference/"
   "hebrew-ocr-cnn.py:102-110) + F4 hash bucketing (the same md5-derived "
   "bucketing primitive at a second modulus — production uses xxhash64, "
   "ocr_spark.functions.bucketing) + r3 mixture reweighting (The Pile/"
   "LLaMA data-mixing shape): mix_kept counts the docs surviving "
   "sample_to_mixture's deterministic per-source thinning toward the "
   "_MIX target distribution. Deterministic hashes so the oracle "
   "mirrors value-for-value; the seeded-random variant (df.sampleBy) "
   "is exercised in tests/test_operators.py. r3 also folds the C4/"
   "RefinedWeb per-domain quota (cap_per_source, operators/sampling.py): "
   "cap_kept counts survivors of the deterministic floor(cap*1e6/count) "
   "thinning toward an expected 10 docs/source — counts broadcast back, "
   "no ordering, no skewed window. Late fold: exact top-40%-by-quality "
   "selection (top_fraction_gate) — q40_kept counts survivors of the "
   "histogram-cumsum threshold gate, the global-ORDER-BY-free exact "
   "quantile (window runs on the 1e-4 score grid, not the corpus; "
   "threshold ties kept on both engines).")
def s10(spark, sf):
    from ocr_spark.operators.hashing import md5long
    from ocr_spark.operators.sampling import (
        cap_per_source, sample_to_mixture, top_fraction_gate)
    from ocr_spark.operators.textstats import quality_expr
    d = load(spark, sf, "documents")
    h = md5long(F.col("doc_id").cast("string"))
    split = F.when(h % 10 < 8, "train").otherwise("eval")
    keys = ["lang", "split", "bucket"]
    base = (d.select("lang", split.alias("split"), (h % 8).alias("bucket"))
            .groupBy(keys).agg(F.count(F.lit(1)).alias("cnt")))
    mixed = (sample_to_mixture(d, "doc_id", "source", _MIX)
             .select("lang", split.alias("split"), (h % 8).alias("bucket"))
             .groupBy(keys).agg(F.count(F.lit(1)).alias("mix_kept")))
    capped = (cap_per_source(d, "doc_id", "source", cap=10)
              .select("lang", split.alias("split"), (h % 8).alias("bucket"))
              .groupBy(keys).agg(F.count(F.lit(1)).alias("cap_kept")))
    gated = top_fraction_gate(
        d.select("lang", split.alias("split"), (h % 8).alias("bucket"),
                 quality_expr(F.col("text")).alias("_q")), "_q", 0.4)
    q40 = (gated.where(F.col("kept"))
           .groupBy(keys).agg(F.count(F.lit(1)).alias("q40_kept")))
    return (base.join(mixed, keys, "left").join(capped, keys, "left")
            .join(q40, keys, "left")
            .select(*keys, "cnt",
                    F.coalesce("mix_kept", F.lit(0)).alias("mix_kept"),
                    F.coalesce("cap_kept", F.lit(0)).alias("cap_kept"),
                    F.coalesce("q40_kept", F.lit(0)).alias("q40_kept")))


# ----------------------------------------------------------------- joins

@q("j1_broadcast_dim_join",
   "SELECT r.r_name AS region, z.zone AS zone, count(*) AS customers "
   "FROM customer c "
   "JOIN nation n ON c.c_nationkey = n.n_nationkey "
   "JOIN region r ON n.n_regionkey = r.r_regionkey "
   "JOIN (VALUES ('AMERICA', 'west'), ('EUROPE', 'west'), "
   "('ASIA', 'east'), ('AFRICA', 'south'), ('MIDDLE EAST', 'south')) "
   "z(rname, zone) ON r.r_name = z.rname "
   "GROUP BY r.r_name, z.zone",
   "J1 class-dict lookup analog (broadcast hash equi-join to tiny dim "
   "tables) + J5 literal-VALUES pairs dim (the confused-letter-pairs "
   "shape) in one chain — no shuffle of the fact side")
def j1(spark, sf):
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    zones = c.sparkSession.createDataFrame(
        [("AMERICA", "west"), ("EUROPE", "west"), ("ASIA", "east"),
         ("AFRICA", "south"), ("MIDDLE EAST", "south")],
        ["rname", "zone"])
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
             .join(F.broadcast(zones), F.col("r_name") == zones.rname)
             .groupBy(F.col("r_name").alias("region"), F.col("zone"))
             .agg(F.count(F.lit(1)).alias("customers")))


@q("j2_containment_anti_join",
   "SELECT a.n_nationkey, a.n_name FROM nation a "
   "WHERE NOT EXISTS (SELECT 1 FROM nation b "
   "WHERE a.n_regionkey = b.n_regionkey "
   "AND b.n_nationkey > a.n_nationkey)",
   "J2 nested-bbox-containment analog: theta self anti-join (BNLJ)")
def j2(spark, sf):
    n = load(spark, sf, "nation")
    a, b = n.alias("a"), n.alias("b")
    cond = (F.col("a.n_regionkey") == F.col("b.n_regionkey")) & \
           (F.col("b.n_nationkey") > F.col("a.n_nationkey"))
    return (a.join(b, cond, "left_anti")
             .select(F.col("n_nationkey"), F.col("n_name")))


@q("j3_interval_range_join",
   "SELECT a.user_id, count(*) AS pair_cnt FROM events a JOIN events b "
   "ON a.user_id = b.user_id AND b.event_id <> a.event_id "
   "AND b.ts BETWEEN a.ts - INTERVAL 60 SECOND AND a.ts "
   "GROUP BY a.user_id",
   "J3 interval-overlap analog: bucketed range join — probe side explodes "
   "to the 2 candidate 60s bins, equi-join on (user_id, bin), exact range "
   "filter after. Bounds per-group work even for hot users (the plain "
   "equi+range SMJ is quadratic within a user's group at scale).")
def j3(spark, sf):
    e = load(spark, sf, "events")
    bin_col = F.floor(F.unix_timestamp("ts") / 60).cast("long")
    b = e.select(F.col("user_id"), F.col("event_id").alias("b_event_id"),
                 F.col("ts").alias("b_ts"), bin_col.alias("bin"))
    a = e.select(F.col("user_id"), F.col("event_id").alias("a_event_id"),
                 F.col("ts").alias("a_ts"),
                 F.explode(F.array(bin_col, bin_col - 1)).alias("bin"))
    pairs = (a.join(b, ["user_id", "bin"])
             .where((F.col("b_event_id") != F.col("a_event_id"))
                    & (F.col("b_ts")
                       >= F.col("a_ts") - F.expr("INTERVAL 60 SECONDS"))
                    & (F.col("b_ts") <= F.col("a_ts"))))
    return (pairs.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("pair_cnt")))


@q("j4_fullouter_alignment",
   "WITH g AS (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) "
   "SELECT CAST(sum(CASE WHEN g.doc_id IS NULL THEN 1 ELSE 0 END) "
   "AS BIGINT) AS missing, "
   "CAST(sum(CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
   "AS extra, "
   "count(*) AS total "
   "FROM documents d FULL OUTER JOIN g ON d.doc_id = g.doc_id",
   "J4 expected-vs-found alignment: full outer join + missing/extra sets "
   "(the corpus-scale variant over real extraction output is "
   "j7_golden_alignment)")
def j4(spark, sf):
    d = load(spark, sf, "documents").select("doc_id")
    g = d.where(F.col("doc_id") % 10 != 0) \
         .withColumnRenamed("doc_id", "g_doc_id")
    j = d.join(g, d.doc_id == g.g_doc_id, "full_outer")
    return j.agg(
        F.sum(F.when(F.col("g_doc_id").isNull(), 1).otherwise(0))
        .alias("missing"),
        F.sum(F.when(F.col("doc_id").isNull(), 1).otherwise(0))
        .alias("extra"),
        F.count(F.lit(1)).alias("total"))


@q("j6_large_sortmerge_join",
   "SELECT o.o_orderpriority, "
   "ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue, "
   "count(*) AS line_cnt FROM orders o JOIN lineitem l "
   "ON o.o_orderkey = l.l_orderkey GROUP BY o.o_orderpriority",
   "large-large equi-join: sort-merge + AQE skew handling at scale")
def j6(spark, sf):
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    return (o.join(li, o.o_orderkey == li.l_orderkey)
             .groupBy("o_orderpriority")
             .agg(F.round(F.sum(F.col("l_extendedprice")
                                * (1 - F.col("l_discount"))), 2)
                  .alias("revenue"),
                  F.count(F.lit(1)).alias("line_cnt")))


@q("j8_asof_join",
   "WITH clicks AS (SELECT user_id, ts, ROUND(max(value), 4) AS value "
   "FROM events WHERE event_type = 'click' GROUP BY user_id, ts), "
   "purch AS (SELECT user_id, ts, event_id FROM events "
   "WHERE event_type = 'purchase') "
   "SELECT p.event_id, p.user_id, c.value AS last_click_value "
   "FROM purch p ASOF LEFT JOIN clicks c "
   "ON p.user_id = c.user_id AND p.ts >= c.ts",
   "as-of (point-in-time) join: latest prior click value per purchase — "
   "union-tag + last(ignorenulls) window, ONE shuffle on the key, no "
   "per-row probe join (operators/asof.py; skew_safe=True range-"
   "partitions a hot key across partitions, tests/test_operators.py); "
   "DuckDB native ASOF JOIN oracle")
def j8(spark, sf):
    from ocr_spark.operators.asof import asof_join

    e = load(spark, sf, "events")
    clicks = (e.where(F.col("event_type") == "click")
              .groupBy("user_id", "ts")
              .agg(F.round(F.max("value"), 4).alias("value")))
    purch = (e.where(F.col("event_type") == "purchase")
             .select("user_id", "ts", "event_id"))
    out = asof_join(purch, clicks, keys=["user_id"], ts_col="ts",
                    value_cols=["value"], prefix="")
    return out.select("event_id", "user_id",
                      F.col("value").alias("last_click_value"))


@q("w6_greedy_overlap_accept", None,
   "W6 greedy overlap acceptance: order-dependent sequential per-group "
   "scan via applyInPandas — not SQL-expressible (accepted set feeds back "
   "into later decisions); driver does rows-only, pytest compares against "
   "the pure-pandas oracle exactly")
def w6(spark, sf):
    from ocr_spark.operators.grouped import greedy_overlap_accept
    return greedy_overlap_accept(load(spark, sf, "events"))
