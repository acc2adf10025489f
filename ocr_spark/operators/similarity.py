"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus a random-hyperplane
LSH bucketing as the scale path (bucket first, then exact cosine only
inside the query's bucket — turns O(N) scans into O(N/2^bits) per query).

All math is JVM-side higher-order array expressions (zip_with/aggregate)
in float64 — no UDFs. Hyperplanes are generated deterministically
(random.Random(seed).gauss) and inlined as literals so the DuckDB oracle
can evaluate the identical planes.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hyperplanes(n_planes: int, dim: int, seed: int = 123) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)]
            for _ in range(n_planes)]


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: Column, b: Column) -> Column:
    da, db = _as_double(a), _as_double(b)
    return dot(da, db) / (F.sqrt(dot(da, da)) * F.sqrt(dot(db, db)))


def lit_vector(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def cosine_topk(df: DataFrame, id_col: str, vec_col: str,
                query_vec: list[float], k: int = 10,
                round_to: int = 4) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to query_vec.

    TakeOrderedAndProject at the physical level: each partition keeps a
    local top-k heap, driver merges — no full sort, no shuffle of vectors.
    """
    q = lit_vector(query_vec)
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), round_to).alias("cos"))
    return scored.orderBy(F.desc("cos"), id_col).limit(k)


def lsh_buckets(df: DataFrame, id_col: str, vec_col: str,
                planes: list[list[float]]) -> DataFrame:
    """(id, bucket): sign-bit bucket over random hyperplanes."""
    v = _as_double(F.col(vec_col))
    bucket = None
    for j, p in enumerate(planes):
        bit = F.when(dot(v, lit_vector(p)) >= 0,
                     F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bit if bucket is None else bucket + bit
    return df.select(F.col(id_col), bucket.alias("bucket"))


def ann_search(df: DataFrame, id_col: str, vec_col: str,
               query_vec: list[float], planes: list[list[float]],
               k: int = 5, round_to: int = 4) -> DataFrame:
    """LSH-bucketed approximate NN: exact cosine ranking restricted to the
    query's hyperplane bucket."""
    qbucket = 0
    for j, p in enumerate(planes):
        d = sum(x * y for x, y in zip(query_vec, p))
        if d >= 0:
            qbucket |= 1 << j
    with_b = lsh_buckets(df, id_col, vec_col, planes)
    cands = df.join(with_b.where(F.col("bucket") == qbucket), id_col)
    return cosine_topk(cands, id_col, vec_col, query_vec, k, round_to)
