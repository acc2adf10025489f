"""Custom stateful streaming operator via applyInPandasWithState.

Streaming first-seen dedup: the streaming twin of the batch
``dedup_exact`` operator (ocr_spark/operators/dedup.py) — per group key
(host), keep the set of content hashes already emitted and pass through
only first occurrences. Reference analog: the accepted-set of the greedy
overlap dedup (/root/reference/utils.py:244-265) — accept a candidate
only if it does not collide with anything already accepted — lifted to a
keyed, continuously-running state machine.

Scale notes:
  * State is partitioned by the group key (host) — the same url-hash/host
    partitioning discipline as the batch job, so hot hosts shard the state
    store rather than one executor.
  * The in-state seen-set is stored as an array of full 32-hex md5
    digests (exact dedup — no collision window). At production scale you
    bound its growth with state TTL
    (GroupStateTimeout.ProcessingTimeTimeout) and/or replace the exact set
    with a Bloom filter serialized into state; exactness here keeps the
    operator oracle-testable.
  * Arrow-batched: the callback receives pandas DataFrames per key, never
    per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, StringType, StructField, StructType,
)

from ocr_spark.functions.bucketing import host_of

DEDUP_OUTPUT_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("url", StringType()),
    StructField("content_hash", StringType()),
])

DEDUP_STATE_SCHEMA = StructType([
    StructField("seen", ArrayType(StringType())),
])


def _dedup_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    (seen_list,) = state.get if state.exists else ([],)
    seen = set(seen_list)
    host = key[0]
    for pdf in pdfs:
        # within-batch first occurrence, stable by arrival order
        pdf = pdf.drop_duplicates(subset=["content_hash"], keep="first")
        fresh = pdf[~pdf["content_hash"].isin(seen)]
        if len(fresh):
            seen.update(fresh["content_hash"].tolist())
            out = fresh[["url", "content_hash"]].copy()
            out.insert(0, "host", host)
            yield out
    state.update((sorted(seen),))


def dedup_stream(pages_stream: DataFrame) -> DataFrame:
    """url/html stream -> first-seen (host, url, content_hash) rows."""
    keyed = pages_stream.select(
        host_of(F.col("url")).alias("host"),
        F.col("url"),
        F.md5(F.col("html")).alias("content_hash"),
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_dedup(
    spark: SparkSession,
    pages_dir: str,
    out_path: str,
    checkpoint: str,
) -> None:
    """Bounded (availableNow) run of the stateful dedup over a pages dir.

    The checkpoint carries BOTH the file-source progress and the per-host
    seen-state, so a second invocation after new files arrive emits only
    hashes never seen in any prior run — streaming exactly-once dedup.
    """
    schema = spark.read.parquet(pages_dir).schema
    stream = spark.readStream.schema(schema).parquet(pages_dir)
    q = (dedup_stream(stream).writeStream.outputMode("append")
         .trigger(availableNow=True)
         .option("checkpointLocation", checkpoint)
         .format("parquet").option("path", out_path).start())
    q.awaitTermination()
