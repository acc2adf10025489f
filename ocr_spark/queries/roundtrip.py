"""Extraction round-trip query: the flagship cross-check of the WHOLE
extraction UDF against an independent SQL model.

The documents.text column is wrapped in an HTML template (nav boilerplate
+ one <p> main block + footer boilerplate) and run through the REAL
extraction pipeline (tokenizer -> DOM -> classifier -> assembly). Because
the template yields exactly one candidate block, the classifier reduces to
"content iff n_words > 16" (ocr_spark/core/blocks.py CURR_WORDS_MIN), and
the expected output is whitespace-normalized text or '' — which DuckDB can
compute independently. A single divergent byte anywhere in the tokenizer,
DOM recovery, classifier, or assembly fails the hash.

r3 link-graph fold: the nav's second anchor carries a per-doc external
href, and the roundtrip emits the page's outlinks (tokenizer reuse,
operators/weblinks.py) resolved against a per-doc base URL plus the
distinct destination hosts — so the driver verifies link extraction +
resolution + host-cut VALUES alongside the extracted text.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.plans.extract_job import extract_udf
from ocr_spark.queries import QuerySpec, load

QUERIES: list[QuerySpec] = []

_NAV_A = '<nav><a href="/">home</a> <a href="'
_PRE_B = '">'      # ... per-doc anchor text ('more-<doc_id%9>') ...
_A_CLOSE = '</a>'  # ... then two EMPTY-text relative anchors (r4: the
#                       RFC 3986 dot-segment fold — empty anchors add no
#                       words, so the block/extraction oracles are
#                       untouched while n_links/links_csv exercise the
#                       real merge + remove_dot_segments path) ...
_NAV_CLOSE = '</nav><p>'
_SUFFIX = '</p><footer>copyright footer</footer></body></html>'

# per-doc external href: 'https://out<doc_id%7>.example.net/p-<doc_id%50>'
_EXT_SQL = ("('https://out' || CAST(doc_id % 7 AS VARCHAR) || "
            "'.example.net/p-' || CAST(doc_id % 50 AS VARCHAR))")
# per-doc canonical link target (present on doc_id % 5 = 0)
_CANON_SQL = ("('https://canon.example.com/c-' || "
              "CAST(doc_id % 50 AS VARCHAR))")


def _ext_href():
    did = F.col("doc_id")
    return F.concat(F.lit("https://out"), (did % 7).cast("string"),
                    F.lit(".example.net/p-"), (did % 50).cast("string"))


def _head():
    """Varied <head>: per-doc title, rel=canonical on %5 docs, robots
    noindex on %11 docs — head content is never a block, so the
    blocks/extraction oracles are untouched."""
    did = F.col("doc_id")
    canon = F.concat(F.lit('<link rel="canonical" '
                           'href="https://canon.example.com/c-'),
                     (did % 50).cast("string"), F.lit('">'))
    return F.concat(
        F.lit("<html><head><title>T-"), (did % 13).cast("string"),
        F.lit("</title>"),
        F.when(did % 5 == 0, canon).otherwise(""),
        F.when(did % 11 == 0,
               '<meta name="robots" content="noindex,nofollow">')
        .otherwise(""),
        F.lit("</head><body>"))


def _anchor_text():
    # per-doc external anchor text — ONE word so the nav block's
    # n_words/link_density oracle in extract_blocks_spans is unchanged
    return F.concat(F.lit("more-"), (F.col("doc_id") % 9).cast("string"))


def _rel_anchors():
    """Two empty-text relative hrefs per doc: '../../a/./art-<did%4>'
    (dot segments climb past the base dir, floor at root) and
    './rel-<did%6>' (same-dir reference). Resolved against the base
    'https://<source>.example.com/sec/idx' these MUST come out as
    '/a/art-N' and '/sec/rel-N' — the oracle pins the closed form."""
    did = F.col("doc_id")
    return F.concat(
        F.lit('<a href="../../a/./art-'), (did % 4).cast("string"),
        F.lit('"></a><a href="./rel-'), (did % 6).cast("string"),
        F.lit('"></a>'))


def _page():
    """Encoded page bytes (shared by both roundtrip queries)."""
    return F.encode(F.concat(_head(), F.lit(_NAV_A), _ext_href(),
                             F.lit(_PRE_B), _anchor_text(),
                             F.lit(_A_CLOSE), _rel_anchors(),
                             F.lit(_NAV_CLOSE), F.col("text"),
                             F.lit(_SUFFIX)), "utf-8")


def _base_url():
    return F.concat(F.lit("https://"), F.col("source"),
                    F.lit(".example.com/sec/idx"))


def _spark(spark, sf):
    from ocr_spark.functions.bucketing import host_of
    from ocr_spark.operators.weblinks import (
        anchored_outlinks_udf, head_meta_udf, resolve_links)

    d = load(spark, sf, "documents")
    res = d.select("doc_id", "source",
                   extract_udf(_page(), F.col("lang")).alias("r"),
                   anchored_outlinks_udf(_page()).alias("pairs"),
                   head_meta_udf(_page()).alias("hm"))
    raw_links = F.transform(F.col("pairs"), lambda x: x["href"])
    resolved = resolve_links(raw_links, _base_url())
    return res.select(
        "doc_id",
        F.col("r.extracted_text").alias("extracted"),
        F.col("r.content_kind").alias("kind"),
        F.col("r.n_blocks").alias("n_blocks"),
        F.size("pairs").alias("n_links"),
        F.array_join(resolved, ",").alias("links_csv"),
        F.array_join(F.array_sort(F.array_distinct(
            F.transform(resolved, host_of))), ",").alias("hosts_csv"),
        F.array_join(F.transform(F.col("pairs"), lambda x: x["anchor"]),
                     ",").alias("anchors_csv"),
        F.col("hm.noindex").cast("int").alias("noindex"),
        F.col("hm.canonical").alias("canonical"),
        F.col("hm.title").alias("title"))


QUERIES.append(QuerySpec(
    "extract_html_roundtrip",
    _spark,
    "WITH n AS (SELECT doc_id, source, "
    "trim(regexp_replace(text, '[ \\t\\n\\r\\f\\v]+', ' ', 'g')) AS norm "
    "FROM documents) "
    "SELECT doc_id, "
    "CASE WHEN len(list_filter(string_split(norm, ' '), w -> w <> '')) > 16 "
    "THEN norm ELSE '' END AS extracted, "
    "'html' AS kind, "
    "CASE WHEN norm = '' THEN 2 ELSE 3 END AS n_blocks, "
    "CAST(4 AS INT) AS n_links, "
    # the two relative hrefs pin the RFC 3986 closed form: base dir
    # /sec/ + '../../a/./art-N' -> /a/art-N (floored at root),
    # './rel-N' -> /sec/rel-N
    "('https://' || source || '.example.com/,' || " + _EXT_SQL + " || "
    "',https://' || source || '.example.com/a/art-' || "
    "CAST(doc_id % 4 AS VARCHAR) || "
    "',https://' || source || '.example.com/sec/rel-' || "
    "CAST(doc_id % 6 AS VARCHAR)) AS links_csv, "
    "array_to_string(list_sort([source || '.example.com', "
    "'out' || CAST(doc_id % 7 AS VARCHAR) || '.example.net']), ',') "
    "AS hosts_csv, "
    "('home,more-' || CAST(doc_id % 9 AS VARCHAR) || ',,') "
    "AS anchors_csv, "
    "CAST(doc_id % 11 = 0 AS INT) AS noindex, "
    "CASE WHEN doc_id % 5 = 0 THEN " + _CANON_SQL + " ELSE NULL END "
    "AS canonical, "
    "('T-' || CAST(doc_id % 13 AS VARCHAR)) AS title FROM n",
    "full extraction UDF vs independent SQL model of the classifier; "
    "r3 adds outlink extraction (tokenizer reuse, one narrow Arrow UDF "
    "over the same page bytes), expression-only URL resolution, the "
    "distinct-destination-host cut, and head metadata (robots noindex "
    "gate, rel=canonical dedup key, title — early-exit head-only "
    "tokenization); r4 adds RFC 3986 §5 reference resolution (merge + "
    "remove_dot_segments as one expression fold) exercised by two "
    "per-doc relative hrefs ('../../a/./art-N', './rel-N') whose "
    "closed-form resolutions the oracle pins — all VALUES verified "
    "per doc",
))


def _blocks_spark(spark, sf):
    d = load(spark, sf, "documents")
    res = d.select("doc_id", extract_udf(_page(), F.col("lang")).alias("r"))
    b = res.select("doc_id", F.explode("r.blocks").alias("b"))
    return b.select(
        "doc_id",
        F.col("b.block_id").alias("block_id"),
        F.col("b.tag").alias("tag"),
        F.col("b.n_words").alias("n_words"),
        F.round(F.col("b.link_density"), 4).alias("link_density"),
        F.col("b.is_content").alias("is_content"))


QUERIES.append(QuerySpec(
    "extract_blocks_spans",
    _blocks_spark,
    # Independent SQL model of the per-block spans the UDF emits for the
    # 3-block template: nav (2 words, link_density 0.5 — the two anchor
    # fragments concatenate to one word, 1/2), the <p> payload (content
    # iff > 16 words, same rule as the roundtrip query), footer. The <p>
    # block vanishes when the text normalizes to ''.
    "WITH n AS (SELECT doc_id, "
    "trim(regexp_replace(text, '[ \\t\\n\\r\\f\\v]+', ' ', 'g')) AS norm "
    "FROM documents), "
    "m AS (SELECT doc_id, norm, "
    "len(list_filter(string_split(norm, ' '), w -> w <> '')) AS w FROM n) "
    "SELECT doc_id, CAST(0 AS INT) AS block_id, 'nav' AS tag, "
    "CAST(2 AS INT) AS n_words, 0.5 AS link_density, FALSE AS is_content "
    "FROM m "
    "UNION ALL SELECT doc_id, CAST(1 AS INT), 'p', CAST(w AS INT), 0.0, "
    "w > 16 FROM m WHERE norm <> '' "
    "UNION ALL SELECT doc_id, "
    "CAST(CASE WHEN norm = '' THEN 1 ELSE 2 END AS INT), 'footer', "
    "CAST(2 AS INT), 0.0, FALSE FROM m",
    "per-document block/span records (ARRAY<STRUCT> column) vs an "
    "independent SQL model — the north rule's 'text/spans per document'",
))
