"""Corpus sampling operators: deterministic mixture reweighting.

The data-mixing step of public LLM pipelines (The Pile, Gao et al. 2020
Table 1 mixing weights; LLaMA, Touvron et al. 2023 §2 sampling
proportions): down-sample overrepresented sources so the training
corpus matches a target source distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
