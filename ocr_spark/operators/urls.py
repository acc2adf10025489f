"""URL canonicalization + recrawl (keep-latest-capture) dedup.

The first pass of every Common-Crawl-style pipeline: the same page is
fetched many times under cosmetically different URLs (scheme/host case,
tracking params, fragments, trailing slash) and across many crawl
snapshots. Canonicalize first, then keep exactly one capture per
canonical URL — otherwise every downstream content-dedup operator pays
for recrawl copies that a pure string normalization would have removed.

Reference parity note: the reference keys its result cache on the raw
uploaded filename (ocr_project/ocr_app/views.py upload handling — one
artifact per name, newest write wins); this operator is the corpus-scale
version of that "one canonical key, latest capture wins" rule.

Scale shape (100 TB):
  * `canonicalize_url` is a pure expression column — no UDF, no shuffle,
    fully codegen'd; Catalyst keeps it inside the scan's WholeStageCodegen.
  * `dedup_latest_capture` is ONE partial-aggregated groupBy on the
    canonical URL: max_by carries (ts, id) only, so map-side combine
    collapses recrawl copies before the shuffle. A hot canonical URL is
    bounded by its recrawl count (thousands), never by corpus size —
    no salting needed.

Every regex/normalization step is engine-portable (same semantics in
Spark's Java regex and DuckDB's RE2) so the oracle can mirror it
string-for-string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query parameters that never identify content (trackers). Kept as exact
# prefixes / names so the DuckDB mirror is a starts_with + equality list.
TRACKING_PREFIXES = ("utm_",)
TRACKING_NAMES = ("gclid", "fbclid", "ref", "mc_cid", "mc_eid")


def _is_tracking(param: Column) -> Column:
    cond = F.lit(False)
    for p in TRACKING_PREFIXES:
        cond = cond | param.startswith(p)
    for n in TRACKING_NAMES:
        cond = cond | param.startswith(n + "=") | (param == n)
    return cond


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL, as a pure (codegen-able) expression.

    Steps, in order (each mirrored in `ORACLE_CANON_SQL`):
      1. strip the fragment (``#...``);
      2. lowercase the ``scheme://host[:port]`` prefix (authority only —
         path/query case is significant);
      3. drop the default port (``:80`` for http, ``:443`` for https);
      4. drop tracking query params (``utm_*``, gclid, fbclid, ref,
         mc_cid, mc_eid), sort the survivors bytewise, rejoin; drop the
         ``?`` entirely when none survive;
      5. strip one trailing ``/`` from the path.
    """
    u = F.regexp_replace(url, "#.*$", "")
    auth = F.regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1)
    rest = F.substring(u, F.length(auth) + F.lit(1), F.length(u))
    auth = F.lower(auth)
    auth = F.regexp_replace(auth, "^(http://.*):80$", "$1")
    auth = F.regexp_replace(auth, "^(https://.*):443$", "$1")
    path = F.when(rest.contains("?"),
                  F.substring_index(rest, "?", 1)).otherwise(rest)
    qs = F.when(rest.contains("?"),
                F.substring_index(rest, "?", -1)).otherwise(F.lit(""))
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~_is_tracking(p))
    qs_canon = F.array_join(F.array_sort(params), "&")
    path = F.regexp_replace(path, "/$", "")
    return F.concat(
        auth, path,
        F.when(qs_canon == "", F.lit("")).otherwise(F.concat(F.lit("?"),
                                                             qs_canon)))


def oracle_canon_sql(url_expr: str) -> str:
    """DuckDB SQL mirroring `canonicalize_url` step for step."""
    prefix_checks = " OR ".join(
        [f"starts_with(p, '{p}')" for p in TRACKING_PREFIXES]
        + [f"starts_with(p, '{n}=') OR p = '{n}'" for n in TRACKING_NAMES])
    u = f"regexp_replace({url_expr}, '#.*$', '')"
    auth = (f"regexp_replace(regexp_replace(lower(regexp_extract({u}, "
            f"'^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)', 1)), "
            f"'^(http://.*):80$', '\\1'), '^(https://.*):443$', '\\1')")
    rest = (f"substr({u}, length(regexp_extract({u}, "
            f"'^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)', 1)) + 1)")
    path = (f"regexp_replace(CASE WHEN contains({rest}, '?') THEN "
            f"split_part({rest}, '?', 1) ELSE {rest} END, '/$', '')")
    qs = (f"CASE WHEN contains({rest}, '?') THEN "
          f"array_to_string(list_sort(list_filter(string_split("
          f"split_part({rest}, '?', 2), '&'), "
          f"p -> p <> '' AND NOT ({prefix_checks}))), '&') ELSE '' END")
    return (f"({auth} || {path} || CASE WHEN {qs} = '' THEN '' "
            f"ELSE '?' || {qs} END)")


def dedup_latest_capture(df: DataFrame, url_col: str, ts_col: str,
                         id_col: str) -> DataFrame:
    """One row per canonical URL: the id/ts of the NEWEST capture, plus
    the recrawl count. Ties on ts break to the highest id (total order).

    One partial-aggregated shuffle on the canonical URL; max_by carries
    the (ts, id) struct only — page bodies never move.
    """
    canon = canonicalize_url(F.col(url_col)).alias("url_canon")
    return (df.select(canon, F.col(ts_col).alias("_ts"),
                      F.col(id_col).alias("_id"))
            .groupBy("url_canon")
            .agg(F.max_by("_id", F.struct("_ts", "_id")).alias("keeper_id"),
                 F.max("_ts").alias("latest_ts"),
                 F.count("*").alias("n_captures")))


def url_path(url: Column) -> Column:
    """Path component of an absolute URL ('/' when absent) — mirrors
    the oracle regex character-for-character. Scheme match is
    case-insensitive (raw captures carry 'HTTPS://...'; a
    lowercase-only pattern would silently yield '/' and let disallowed
    URLs through the robots gate)."""
    p = F.regexp_extract(url, "^[A-Za-z+.-]+://[^/]*(/.*)$", 1)
    return F.when(p == "", "/").otherwise(p)


def _rule_row(pattern: str, allow: bool) -> tuple:
    """One translated rule row: (prefix, allow, rx, spec, wild). The
    single spelling of the rx/spec/wild contract — every consumer
    (robots_rule_table, the driver fold, tests) builds rows here so the
    translation and the specificity key cannot drift apart."""
    from ocr_spark.core.robots import pattern_re

    wild = "*" in pattern or pattern.endswith("$")
    return (pattern, allow, pattern_re(pattern), len(pattern), wild)


# Cap on the bare-rules convenience collect in apply_robots: a real
# robots rule set is per-host and small; anything past this is a
# contract violation that should route through robots_rule_table.
MAX_BARE_RULES = 100_000

RULE_SCHEMA = ("prefix string, allow boolean, rx string, spec int, "
               "wild boolean")


def robots_pattern_table(spark, pats: list[tuple[str, bool]]) -> DataFrame:
    """Host-free (pattern, allow) list -> translated rule rows (for
    callers that cross-join one shared rule set onto many hosts)."""
    return spark.createDataFrame(
        [_rule_row(p, a) for p, a in pats], RULE_SCHEMA)


def robots_rule_table(spark, rules: list[tuple[str, str, bool]]
                      ) -> DataFrame:
    """(host, pattern, allow) rows -> the rule DataFrame apply_robots
    consumes, with the RFC 9309 wildcard translation precomputed
    driver-side (a robots rule set is tiny by definition): ``rx`` =
    core/robots.pattern_re(pattern) — syntax shared by Java regex and
    RE2 so the SAME string drives Spark and the DuckDB oracle —
    ``spec`` = rule-string length (the specificity key), and ``wild``
    marking rules that actually need regex matching."""
    return spark.createDataFrame(
        [(h, *_rule_row(p, a)) for h, p, a in rules],
        "host string, " + RULE_SCHEMA)


def apply_robots(df: DataFrame, id_col: str, url_col: str,
                 rules: DataFrame) -> DataFrame:
    """Gate URLs by robots.txt rules (RFC 9309 evaluation; rule texts
    come from ``core/robots.parse_robots`` at crawl time): ``rules`` is
    a (host, prefix, allow) table, ideally built by
    ``robots_rule_table``; a bare 3-column table is COLLECTED (tiny by
    the operator's own broadcast contract) and re-translated through
    the same helper, so wildcard rules in it are never silently
    evaluated as literal prefixes. Verdict per URL = the most specific
    matching rule on its host (specificity = rule-string length),
    allow wins a same-length tie, no match means allowed. Returns
    (id, robots_ok boolean).

    Scale shape (100 TB): a robots rule set is per-host and tiny
    relative to the corpus — explicitly broadcast; the match is one
    BroadcastHashJoin on host with the path test as a residual
    condition, and the most-specific-match argmax is ONE
    partial-aggregated struct max per URL (specificity, allow) — no
    window, no per-URL Python. Residual cost kept honest: plain prefix
    rules (the vast majority of real robots files) match via codegen'd
    startswith; only rules flagged ``wild`` pay regexp_like, whose
    non-literal pattern recompiles per residual evaluation — bounded
    by (URLs on wildcard-bearing hosts) x (that host's wildcard
    rules), not by the corpus x rule product.
    """
    from ocr_spark.functions.bucketing import host_of

    if "rx" not in rules.columns:
        # bounded collect (ADVICE r3): the re-translation convenience is
        # for rule sets that honor the operator's broadcast contract; a
        # contract-violating huge table must fail with a direction, not
        # OOM the driver after re-evaluating an arbitrary upstream plan
        rows = (rules.select("host", "prefix", "allow")
                .limit(MAX_BARE_RULES + 1).collect())
        if len(rows) > MAX_BARE_RULES:
            raise ValueError(
                f"apply_robots: bare 3-column rules table exceeds "
                f"{MAX_BARE_RULES} rows — build it with "
                f"robots_rule_table(...) (driver-side wildcard "
                f"translation) instead of passing a raw DataFrame")
        rules = robots_rule_table(
            df.sparkSession,
            [(r["host"], r["prefix"], r["allow"]) for r in rows])
    u = df.select(F.col(id_col),
                  host_of(F.col(url_col)).alias("_h"),
                  url_path(F.col(url_col)).alias("_p"))
    path_hit = (F.when(rules["wild"],
                       F.regexp_like(F.col("_p"), rules["rx"]))
                .otherwise(F.col("_p").startswith(rules["prefix"])))
    j = u.join(F.broadcast(rules),
               (F.col("_h") == rules["host"]) & path_hit, "left")
    m = F.when(F.col("prefix").isNotNull(),
               F.struct(F.col("spec").alias("l"),
                        F.col("allow").alias("allow")))
    return (j.groupBy(id_col).agg(F.max(m).alias("_m"))
            .select(F.col(id_col),
                    F.coalesce(F.col("_m.allow"), F.lit(True))
                    .alias("robots_ok")))
