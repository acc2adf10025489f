"""Similarity-search queries over the embeddings table + DuckDB oracles.

The hyperplanes are deterministic Python literals inlined into BOTH the
Spark expressions and the oracle SQL, so bucket assignments are
verifiable value-by-value.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators import similarity as S
from ocr_spark.queries import QuerySpec, load

QUERIES: list[QuerySpec] = []

N_PLANES = 4
DIM = 64
PLANES = S.hyperplanes(N_PLANES, DIM, seed=123)


def _sql_vec(vals) -> str:
    return "[" + ", ".join(repr(float(v)) for v in vals) + "]"


def _sql_dot(vec_expr: str, vals) -> str:
    return f"list_dot_product(CAST({vec_expr} AS DOUBLE[]), {_sql_vec(vals)})"


def _query_vec(spark, sf):
    row = (load(spark, sf, "embeddings")
           .where(F.col("vec_id") == 0).select("embedding").first())
    return [float(x) for x in row["embedding"]]


def q(name, sql, note=""):
    def deco(fn):
        QUERIES.append(QuerySpec(name, fn, sql, note))
        return fn
    return deco


@q("sim_cosine_topk",
   "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings "
   "WHERE vec_id = 0) "
   "SELECT vec_id, ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), "
   "(SELECT qe FROM q)) / (sqrt(list_dot_product(CAST(embedding AS "
   "DOUBLE[]), CAST(embedding AS DOUBLE[]))) * sqrt((SELECT "
   "list_dot_product(qe, qe) FROM q))), 4) AS cos "
   "FROM embeddings WHERE vec_id <> 0 "
   "ORDER BY cos DESC, vec_id LIMIT 10",
   "brute-force cosine top-k (TakeOrderedAndProject: per-partition heap, "
   "no global sort)")
def cosine_topk(spark, sf):
    qv = _query_vec(spark, sf)
    emb = load(spark, sf, "embeddings").where(F.col("vec_id") != 0)
    return S.cosine_topk(emb, "vec_id", "embedding", qv, k=10)


@q("sim_lsh_bucket_histogram",
   "SELECT (" + " + ".join(
       f"(CASE WHEN {_sql_dot('embedding', p)} >= 0 "
       f"THEN {1 << j} ELSE 0 END)" for j, p in enumerate(PLANES))
   + ") AS bucket, count(*) AS cnt FROM embeddings GROUP BY 1",
   "random-hyperplane LSH bucketing (scale path for ANN)")
def lsh_histogram(spark, sf):
    emb = load(spark, sf, "embeddings")
    buckets = S.lsh_buckets(emb, "vec_id", "embedding", PLANES)
    return (buckets.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def _ann_sql(qv: list[float]) -> str:
    bucket_expr = " + ".join(
        f"(CASE WHEN {_sql_dot('embedding', p)} >= 0 "
        f"THEN {1 << j} ELSE 0 END)" for j, p in enumerate(PLANES))
    qbucket = 0
    for j, p in enumerate(PLANES):
        if sum(x * y for x, y in zip(qv, p)) >= 0:
            qbucket |= 1 << j
    qsql = _sql_vec(qv)
    return (
        f"WITH b AS (SELECT vec_id, embedding, ({bucket_expr}) AS bucket "
        f"FROM embeddings) "
        f"SELECT vec_id, ROUND(list_dot_product(CAST(embedding AS "
        f"DOUBLE[]), {qsql}) / (sqrt(list_dot_product(CAST(embedding AS "
        f"DOUBLE[]), CAST(embedding AS DOUBLE[]))) * "
        f"sqrt(list_dot_product({qsql}, {qsql}))), 4) AS cos "
        f"FROM b WHERE bucket = {qbucket} "
        f"ORDER BY cos DESC, vec_id LIMIT 5")


def _ann_spark(spark, sf):
    qv = _query_vec(spark, sf)
    emb = load(spark, sf, "embeddings")
    return S.ann_search(emb, "vec_id", "embedding", qv, PLANES, k=5)


def _make_ann_spec() -> QuerySpec:
    # The query vector comes from vec_id=0 of the same sf dir; embed it in
    # SQL via a scalar subquery so ONE sql string works for every sf tier.
    bucket_expr = " + ".join(
        f"(CASE WHEN {_sql_dot('embedding', p)} >= 0 "
        f"THEN {1 << j} ELSE 0 END)" for j, p in enumerate(PLANES))
    qbucket_expr = " + ".join(
        f"(CASE WHEN {_sql_dot('(SELECT embedding FROM embeddings WHERE vec_id = 0)', p)} >= 0 "
        f"THEN {1 << j} ELSE 0 END)" for j, p in enumerate(PLANES))
    sql = (
        "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe "
        "FROM embeddings WHERE vec_id = 0), "
        f"b AS (SELECT vec_id, embedding, ({bucket_expr}) AS bucket "
        "FROM embeddings) "
        "SELECT vec_id, ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), "
        "(SELECT qe FROM q)) / (sqrt(list_dot_product(CAST(embedding AS "
        "DOUBLE[]), CAST(embedding AS DOUBLE[]))) * sqrt((SELECT "
        "list_dot_product(qe, qe) FROM q))), 4) AS cos "
        f"FROM b WHERE bucket = ({qbucket_expr}) "
        "ORDER BY cos DESC, vec_id LIMIT 5")
    return QuerySpec("sim_ann_lsh_query", _ann_spark, sql,
                     "ANN: exact ranking restricted to the query's LSH "
                     "bucket")


QUERIES.append(_make_ann_spec())
