"""Token-budget shard packing: a distributed prefix sum.

Training-data pipelines pack the curated corpus into fixed-token-budget
shards (the sequence-packing / shard-writing step of GPT-3 App. B and
The Pile's output stage): documents are laid out in a deterministic
global order and each is assigned to the shard where its first token
lands, ``shard_id = floor(start_offset / budget)``.

The naive Spark spelling — a global ``Window.orderBy`` cumulative sum —
collapses to ONE partition and dies at scale. This module does the
textbook two-phase distributed prefix sum instead:

1. range-bucket the 60-bit doc hash into ``n_buckets`` CONTIGUOUS hash
   ranges (bucket boundaries respect the global (hash, id) order);
2. one tiny partial-aggregated groupBy computes each bucket's token sum
   (``n_buckets`` rows to the driver — same cost class as the k-means
   driver combine);
3. the driver turns those into exclusive per-bucket offsets, broadcast
   back as a tiny join table;
4. a per-bucket window cumsum (parallel across buckets) plus the offset
   yields the exact global prefix sum.

No single-partition stage anywhere; the only full-data shuffle is the
per-bucket window sort, which is what a 100 TB shard-writer needs
anyway (each bucket becomes a contiguous run of output shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ocr_spark.operators.hashing import md5long

HASH_BITS = 60  # md5long yields values in [0, 2^60)


def assign_token_shards(df: DataFrame, id_col: str, tokens_col: str,
                        budget: int, n_buckets: int = 64) -> DataFrame:
    """Append ``shard_id``: the fixed-``budget`` token shard in which this
    document STARTS, under the deterministic global order
    ``(md5long(id), id)``. Documents may straddle a boundary — standard
    concatenate-then-split packing semantics; the id-hash order is
    reproducible across runs and engines, so a resumed job writes the
    same shards.

    Exactness: offsets and cumulative sums are integer arithmetic; the
    final ``floor(start / budget)`` is exact for corpora under 2^53
    total tokens (a 100 TB corpus is ~10^13 tokens, well inside).
    """
    if n_buckets < 1 or n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    # Exact integer range-bucketing: h >> (60 - log2 B). A double-division
    # spelling is monotone but rounds h near 2^60 UP, creating a phantom
    # bucket n_buckets that the offsets inner join would silently drop.
    shift = HASH_BITS - (n_buckets.bit_length() - 1)
    h = md5long(F.col(id_col).cast("string"))
    base = df.withColumn("_h", h).withColumn(
        "_b", F.shiftright(F.col("_h"), shift))

    # Phase 1+2: per-bucket token totals -> driver (<= n_buckets rows).
    parts = {r["_b"]: r["_t"] for r in
             base.groupBy("_b").agg(F.sum(tokens_col).alias("_t")).collect()}
    running, offsets = 0, []
    for b in range(n_buckets):
        offsets.append((b, running))
        running += int(parts.get(b, 0) or 0)

    # Phase 3+4: broadcast offsets, per-bucket window cumsum.
    spark = df.sparkSession
    off = spark.createDataFrame(offsets, ["_b", "_off"])
    w = (Window.partitionBy("_b").orderBy("_h", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.col("_off") + F.sum(tokens_col).over(w)
             - F.col(tokens_col)).alias("_start")
    return (base.join(F.broadcast(off), "_b")
            .withColumn("shard_id",
                        F.floor(start / F.lit(budget)).cast("long"))
            .drop("_h", "_b", "_off"))


def pack_sequences(df: DataFrame, id_col: str, len_col: str,
                   capacity: int, n_buckets: int = 64) -> DataFrame:
    """Best-fit-decreasing sequence packing WITHOUT splitting documents
    — the sample-packing step of LM training pipelines (T5/GPT-style
    example packing: each training sequence is a concatenation of WHOLE
    documents up to the context budget, minimizing pad tokens).
    Complements ``assign_token_shards``, which splits documents at
    boundaries. Returns (id, len, pack_id, oversize): every pack's
    total length <= ``capacity``; docs longer than ``capacity`` get a
    singleton pack and ``oversize = true`` (route them to the splitting
    packer downstream).

    Bin packing is inherently sequential, so the distributed variant is
    bucket-local (the W6 grouped sequential-map shape): rows spread
    deterministically by ``md5long(id) % n_buckets``, BFD runs inside
    each bucket via applyInPandas, pack ids namespace as
    ``bucket * 2^40 + local``. Determinism end to end: the bucket hash,
    the (len desc, id asc) item order, and the best-fit tie rule
    (smallest remaining capacity, then lowest pack index) are all
    total orders — a resumed 100 TB job emits identical packs.

    Scale shape: ONE shuffle keyed by the hash bucket (rows carry id +
    one int); per-bucket BFD is O(n log n) comparisons (bisect over the
    sorted remaining-capacity list); ``n_buckets`` scales with the
    corpus so per-bucket state stays bounded — waste vs a global BFD is
    only the <= 1 partially-filled final bin per bucket, and BFD itself
    is within 11/9 of optimal (Johnson 1973). The quality knob mirrors
    the salting policy: more buckets = more parallelism, marginally
    more tail waste.
    """
    import bisect

    import pandas as pd

    id_type = [f.dataType.simpleString() for f in df.schema.fields
               if f.name == id_col][0]
    out_schema = (f"{id_col} {id_type}, {len_col} bigint, "
                  f"pack_id bigint, oversize boolean")

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([len_col, id_col],
                              ascending=[False, True], kind="mergesort")
        # sorted list of (remaining, pack_idx): best fit = first entry
        # with remaining >= L; ties break to the LOWEST pack index
        # because equal remainders sort by idx ascending.
        open_bins: list[tuple[int, int]] = []
        n_packs = 0
        packs, oversize = [], []
        # totality: NULL lengths pack as 0 (sorted last, na_position
        # default), the output column keeps the NULL
        for length in pdf[len_col].fillna(0).astype("int64"):
            if length > capacity:
                packs.append(-1)        # placeholder, patched below
                oversize.append(True)
                continue
            i = bisect.bisect_left(open_bins, (length, -1))
            if i < len(open_bins):
                rem, idx = open_bins.pop(i)
                bisect.insort(open_bins, (rem - length, idx))
                packs.append(idx)
            else:
                packs.append(n_packs)
                bisect.insort(open_bins, (capacity - length, n_packs))
                n_packs += 1
            oversize.append(False)
        for j, p in enumerate(packs):   # singleton packs for oversize
            if p < 0:
                packs[j] = n_packs
                n_packs += 1
        bkt = int(pdf["_bkt"].iloc[0])
        out = pdf[[id_col]].copy()
        out[len_col] = pdf[len_col].astype("Int64")
        out["pack_id"] = [bkt * (1 << 40) + p for p in packs]
        out["oversize"] = oversize
        return out

    tagged = df.select(
        F.col(id_col), F.col(len_col).cast("long").alias(len_col),
        (md5long(F.col(id_col).cast("string")) % n_buckets).alias("_bkt"))
    return tagged.groupBy("_bkt").applyInPandas(_pack, out_schema)
