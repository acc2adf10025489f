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
  * State growth is BOUNDED two ways (both on by default at scale):
      - ``ttl`` sets GroupStateTimeout.ProcessingTimeTimeout — a host
        that stays quiet for the TTL has its seen-state dropped, so the
        store only holds recently-active hosts (re-admitting a dup after
        the TTL is the documented trade: crawl revisits are deduped
        within the freshness horizon, not forever);
      - ``mode="bloom"`` replaces the exact seen-set with a fixed-size
        Bloom filter (BLOOM_BITS bits per host, k=4), trading a bounded
        false-positive rate (a few uniques wrongly dropped) for O(1)
        state per host. ``mode="exact"`` keeps full 32-hex md5 digests —
        no collision window, oracle-testable, state linear in uniques.
  * Survivor choice is DETERMINISTIC: within a micro-batch, duplicates of
    a content hash are resolved to the lexicographically smallest url
    (arrival order inside a batch is not stable across runs).
  * Arrow-batched: the callback receives pandas DataFrames per key, never
    per-row Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, BinaryType, StringType, StructField, StructType,
)

from ocr_spark.functions.bucketing import host_of

DEDUP_OUTPUT_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("url", StringType()),
    StructField("content_hash", StringType()),
])

DEDUP_STATE_SCHEMA = StructType([
    StructField("seen", ArrayType(StringType())),
    StructField("bloom", BinaryType()),
])

BLOOM_BITS = 1 << 16          # 8 KiB per host, fixed
_BLOOM_K = 4


def _bloom_positions(content_hash: str) -> list[int]:
    d = hashlib.md5(content_hash.encode()).digest()
    return [int.from_bytes(d[i * 4:(i + 1) * 4], "big") % BLOOM_BITS
            for i in range(_BLOOM_K)]


def _bloom_test_and_set(bloom: bytearray, content_hash: str) -> bool:
    """True if possibly-seen before; always marks as seen."""
    seen = True
    for p in _bloom_positions(content_hash):
        byte, bit = divmod(p, 8)
        if not (bloom[byte] >> bit) & 1:
            seen = False
            bloom[byte] |= 1 << bit
    return seen


def _make_dedup_fn(mode: str, ttl_ms: int | None):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # quiet host past its TTL: drop the seen-state entirely
            state.remove()
            return
        if state.exists:
            seen_list, bloom_bytes = state.get
        else:
            seen_list, bloom_bytes = [], bytes(BLOOM_BITS // 8)
        seen = set(seen_list or [])
        bloom = bytearray(bloom_bytes or bytes(BLOOM_BITS // 8))
        host = key[0]
        for pdf in pdfs:
            # deterministic survivor: smallest url wins within the batch
            pdf = (pdf.sort_values(["content_hash", "url"])
                   .drop_duplicates(subset=["content_hash"], keep="first"))
            if mode == "bloom":
                fresh_mask = [not _bloom_test_and_set(bloom, h)
                              for h in pdf["content_hash"]]
                fresh = pdf[pd.Series(fresh_mask, index=pdf.index)]
            else:
                fresh = pdf[~pdf["content_hash"].isin(seen)]
                seen.update(fresh["content_hash"].tolist())
            if len(fresh):
                out = fresh[["url", "content_hash"]].copy()
                out.insert(0, "host", host)
                yield out
        if mode == "bloom":
            state.update((None, bytes(bloom)))
        else:
            state.update((sorted(seen), None))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    return fn


def dedup_stream(pages_stream: DataFrame, mode: str = "exact",
                 ttl_ms: int | None = None) -> DataFrame:
    """url/html stream -> first-seen (host, url, content_hash) rows."""
    keyed = pages_stream.select(
        host_of(F.col("url")).alias("host"),
        F.col("url"),
        F.md5(F.col("html")).alias("content_hash"),
    )
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms is not None
               else GroupStateTimeout.NoTimeout)
    return keyed.groupBy("host").applyInPandasWithState(
        _make_dedup_fn(mode, ttl_ms),
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def run_streaming_dedup(
    spark: SparkSession,
    pages_dir: str,
    out_path: str,
    checkpoint: str,
    mode: str = "exact",
    ttl_ms: int | None = None,
) -> None:
    """Bounded (availableNow) run of the stateful dedup over a pages dir.

    The checkpoint carries BOTH the file-source progress and the per-host
    seen-state, so a second invocation after new files arrive emits only
    hashes never seen in any prior run — streaming exactly-once dedup
    (within the TTL horizon when one is set).

    With a TTL, availableNow never self-terminates: processing-time
    timers make MicroBatchExecution keep scheduling (empty) batches to
    fire them, forever. Production TTL streams run continuously anyway;
    for this bounded entry point we drain the source, wait ttl_ms past
    the LAST data batch we observed (a processing-time timer is due
    ttl_ms after the batch that set it — empty batches finishing earlier
    fire nothing and must not count), then require two empty batches
    whose batchId is newer than everything seen at that point (those do
    expire every due timer), then stop the query — the checkpoint stays
    consistent because stop() lands on batch boundaries.

    Bookkeeping is by batchId, never by position in q.recentProgress:
    that list is a ring buffer (spark.sql.streaming.numRecentProgress-
    Updates, default 100), so with a long TTL the index-based view of
    "fresh" entries can be permanently empty while batches keep running.
    The TTL anchor is our observation time of the newest data batch — an
    upper bound on when its timers were set, so waiting ttl_ms from it
    is always sufficient (t_start seeds it conservatively).
    """
    import time as _time

    schema = spark.read.parquet(pages_dir).schema
    stream = spark.readStream.schema(schema).parquet(pages_dir)
    writer = (dedup_stream(stream, mode=mode, ttl_ms=ttl_ms)
              .writeStream.outputMode("append")
              .trigger(availableNow=True)
              .option("checkpointLocation", checkpoint)
              .format("parquet").option("path", out_path))
    t_start = _time.time()
    q = writer.start()
    if ttl_ms is None:
        q.awaitTermination()
        return
    deadline = _time.time() + 120
    last_data_seen = t_start      # observation time of newest data batch
    last_data_batch = -1
    gate_batch = None             # newest batchId visible when TTL elapsed
    while _time.time() < deadline:
        if q.awaitTermination(1):
            return
        prog = q.recentProgress
        if not prog:
            continue
        newest_data = max((p["batchId"] for p in prog
                           if p["numInputRows"] > 0), default=-1)
        if newest_data > last_data_batch:
            last_data_batch = newest_data
            last_data_seen = _time.time()
            gate_batch = None     # new data resets the drain gate
        if _time.time() - last_data_seen < ttl_ms / 1000.0:
            continue              # timers from that batch not due yet
        if gate_batch is None:
            gate_batch = max(p["batchId"] for p in prog)
            continue
        fresh_empty = [p["batchId"] for p in prog
                       if p["batchId"] > gate_batch
                       and p["numInputRows"] == 0]
        if len(fresh_empty) >= 2:
            break
    q.stop()
    q.awaitTermination()
