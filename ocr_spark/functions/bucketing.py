"""URL-hash bucketing + skewed-host salting as Catalyst expressions.

North-rule requirement: "partitions the corpus by url-hash buckets with
explicit salting for skewed hosts" (BASELINE.json north_star). Everything
here is a JVM-side column expression — xxhash64/pmod — so bucketing costs
no Python round-trip and survives whole-stage codegen.

Reference analog of the skew policy: wide merged segments are detected as
outliers vs 1.5x the average width and split into round(w/avg) pieces
(/root/reference/overflow/revised_code.py:249-306). Here "hosts above
1.5x the mean row count" get their rows re-salted across SALT_N sub-keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 256
DEFAULT_SALT_N = 16
SKEW_FACTOR = 1.5


def host_of(url: Column) -> Column:
    """Extract the host from a url without UDFs."""
    return F.parse_url(url, F.lit("HOST"))


def url_bucket(url: Column, n_buckets: int = DEFAULT_BUCKETS) -> Column:
    """Stable bucket id in [0, n_buckets) from the full url."""
    return F.pmod(F.xxhash64(url), F.lit(n_buckets)).cast("int")


def hot_hosts(pages: DataFrame, skew_factor: float = SKEW_FACTOR) -> DataFrame:
    """Hosts whose row count exceeds skew_factor x mean host count.

    One partial-aggregated groupBy over the url column only (column
    pruning keeps the html blobs out of this shuffle entirely).
    """
    counts = (
        pages.select(host_of(F.col("url")).alias("host"))
        .groupBy("host").agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = counts.agg(F.avg("cnt").alias("mean_cnt"))
    return (
        counts.crossJoin(F.broadcast(stats))
        .where(F.col("cnt") > F.col("mean_cnt") * F.lit(skew_factor))
        .select("host", "cnt")
    )


def salted_partition_key(
    url: Column,
    is_hot: Column,
    n_buckets: int = DEFAULT_BUCKETS,
    salt_n: int = DEFAULT_SALT_N,
) -> tuple[Column, Column]:
    """(bucket, salt) pair: host-hash bucket, plus a url-hash salt that is
    nonzero only for hot hosts — cold hosts stay co-located by host while
    hot hosts fan out over salt_n partitions."""
    bucket = F.pmod(F.xxhash64(host_of(url)), F.lit(n_buckets)).cast("int")
    salt = F.when(
        is_hot, F.pmod(F.xxhash64(url), F.lit(salt_n)).cast("int")
    ).otherwise(F.lit(0))
    return bucket, salt
