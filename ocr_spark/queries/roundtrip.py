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
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.plans.extract_job import extract_udf
from ocr_spark.queries import QuerySpec, load

QUERIES: list[QuerySpec] = []

_PREFIX = ('<html><head><title>t</title></head><body>'
           '<nav><a href="/">home</a> <a href="/x">more</a></nav><p>')
_SUFFIX = '</p><footer>copyright footer</footer></body></html>'


def _spark(spark, sf):
    d = load(spark, sf, "documents")
    page = F.encode(F.concat(F.lit(_PREFIX), F.col("text"),
                             F.lit(_SUFFIX)), "utf-8")
    res = d.select("doc_id", extract_udf(page, F.col("lang")).alias("r"))
    return res.select("doc_id",
                      F.col("r.extracted_text").alias("extracted"),
                      F.col("r.content_kind").alias("kind"),
                      F.col("r.n_blocks").alias("n_blocks"))


QUERIES.append(QuerySpec(
    "extract_html_roundtrip",
    _spark,
    "WITH n AS (SELECT doc_id, "
    "trim(regexp_replace(text, '[ \\t\\n\\r\\f\\v]+', ' ', 'g')) AS norm "
    "FROM documents) "
    "SELECT doc_id, "
    "CASE WHEN len(list_filter(string_split(norm, ' '), w -> w <> '')) > 16 "
    "THEN norm ELSE '' END AS extracted, "
    "'html' AS kind, "
    "CASE WHEN norm = '' THEN 2 ELSE 3 END AS n_blocks FROM n",
    "full extraction UDF vs independent SQL model of the classifier",
))


def _blocks_spark(spark, sf):
    d = load(spark, sf, "documents")
    page = F.encode(F.concat(F.lit(_PREFIX), F.col("text"),
                             F.lit(_SUFFIX)), "utf-8")
    res = d.select("doc_id", extract_udf(page, F.col("lang")).alias("r"))
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
