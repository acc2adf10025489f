"""Corpus sampling operators: deterministic mixture reweighting and
per-source quota caps.

The data-mixing step of public LLM pipelines (The Pile, Gao et al. 2020
Table 1 mixing weights; LLaMA, Touvron et al. 2023 §2 sampling
proportions): down-sample overrepresented sources so the training
corpus matches a target source distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ocr_spark.operators.hashing import md5long

PPM = 1_000_000


def sample_to_mixture(df: DataFrame, id_col: str, source_col: str,
                      targets: dict[str, float],
                      default: float = 1.0) -> DataFrame:
    """Keep each row iff ``md5long(id) % 1e6 < round(frac[source] * 1e6)``
    — a deterministic per-source Bernoulli thinning. Reproducible across
    runs and engines (same md5-derived convention as the stratified
    split / F4 bucketing primitive), so resumed or re-run jobs sample
    the SAME documents — the property `df.sample()` cannot give a
    restartable 100 TB job. Sources absent from ``targets`` keep
    ``default`` of their rows.

    Scale shape: the target table is tiny by definition — broadcast
    LEFT join + a pure row predicate; no UDF, no shuffle, fully
    codegen'd, and the filter composes with scan pushdown of later
    stages (rejected rows never leave the scan's stage).
    """
    spark = df.sparkSession
    t = spark.createDataFrame(
        [(s, int(round(f * PPM))) for s, f in targets.items()],
        [source_col, "_keep_ppm"])
    h = md5long(F.col(id_col).cast("string"))
    keep = (h % PPM) < F.coalesce(
        F.col("_keep_ppm"), F.lit(int(round(default * PPM))))
    return (df.join(F.broadcast(t), source_col, "left")
            .where(keep).drop("_keep_ppm"))


def cap_per_source(df: DataFrame, id_col: str, source_col: str,
                   cap: int, exact: bool = False) -> DataFrame:
    """Per-source document quota (the C4 / RefinedWeb per-domain cap:
    Raffel et al. 2020 §2.2, Penedo et al. 2023 §3.1 — stop one hot
    domain from dominating the training mix).

    Default (scale path): one partial-aggregated groupBy computes the
    per-source counts (a tiny table — one row per source/domain),
    broadcast back; each row keeps iff
    ``md5long(id) % 1e6 < floor(cap * 1e6 / count)`` — deterministic
    thinning to an EXPECTED ``cap`` docs per source, no ordering, no
    skewed window, re-runs keep the same documents. ``floor`` on a
    double division is exact both engines for cap < ~2^43.

    ``exact=True``: a per-source ``row_number`` over the deterministic
    ``(md5long(id), id)`` order keeps exactly ``cap``. Honest caveat: a
    hot source's rows sort inside ONE partition — fine for dims or
    small caps, wrong tool for a 100 TB hot domain (use the default).
    """
    h = md5long(F.col(id_col).cast("string"))
    if exact:
        w = Window.partitionBy(source_col).orderBy(h, id_col)
        return (df.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= cap).drop("_rn"))
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_src_cnt"))
    keep_ppm = F.least(F.lit(PPM).cast("long"),
                       F.floor(F.lit(cap) * PPM / F.col("_src_cnt")))
    return (df.join(F.broadcast(counts), source_col)
            .where((h % PPM) < keep_ppm).drop("_src_cnt"))
