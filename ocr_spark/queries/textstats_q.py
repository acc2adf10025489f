"""Text-analysis queries + DuckDB oracles over the documents table."""

from __future__ import annotations

from ocr_spark.operators import textstats as T
from ocr_spark.operators.hashing import MOD_P, sql_md5long
from ocr_spark.queries import QuerySpec, load

QUERIES: list[QuerySpec] = []


def q(name, sql, note=""):
    def deco(fn):
        QUERIES.append(QuerySpec(name, fn, sql, note))
        return fn
    return deco


def _sql_list(vals) -> str:
    return "[" + ", ".join(f"'{v}'" for v in vals) + "]"


_STOP = _sql_list(T.STOPWORDS)

# Stand-in linear-classifier vocabulary for model_quality_scores: a
# deterministic md5-derived integer weight (k/1000 in [-1, 1]) per
# marker/stopword. Production swaps in a TRAINED model's (word, weight)
# table — the mechanism under test (broadcast vocab lookup + codegen'd
# sigmoid, never an inlined literal expression) is identical.


def _weight_k(word: str) -> int:
    import hashlib
    return int(hashlib.md5(word.encode()).hexdigest()[:15], 16) % 2001 \
        - 1000


_VOCAB = sorted(set(T.STOPWORDS)
                | {w for ms in T.LANG_MARKERS.values() for w in ms})
_WEIGHTS = [(w, _weight_k(w)) for w in _VOCAB]
_WT_VALUES = ", ".join(f"('{w}', {k})" for w, k in _WEIGHTS)


_GSTOP = _sql_list(T.GOPHER_STOPWORDS)

@q("text_quality_score",
   "WITH f AS (SELECT doc_id, text, "
   "list_filter(string_split(text, ' '), w -> w <> '') AS ws, "
   "length(text) AS n_chars FROM documents), "
   "g AS (SELECT doc_id, len(ws) AS n_words, n_chars, "
   "len(list_filter(ws, w -> list_contains(" + _STOP + ", w))) AS stops, "
   "n_chars - length(regexp_replace(text, '[^\\w ]', '', 'g')) AS punct, "
   "length(replace(text, ' ', '')) AS alpha FROM f), "
   "wt(word, k) AS (VALUES " + _WT_VALUES + "), "
   "e AS (SELECT doc_id, unnest(ws) AS word FROM f), "
   "m AS (SELECT e.doc_id, count(*) AS n, "
   "sum(COALESCE(wt.k / 1000.0, 0.0)) AS sw "
   "FROM e LEFT JOIN wt USING (word) GROUP BY e.doc_id), "
   # Gopher rule-based flags (Rae 2021 A1.1) — mirrors gopher_quality_flags.
   "gr AS (SELECT doc_id, len(ws) AS gw, "
   "COALESCE(list_sum(list_transform(ws, w -> length(w))), 0) AS wlen_sum, "
   "length(text) - length(replace(text, '#', '')) AS n_hash, "
   "len(regexp_extract_all(text, '[.]{3}')) AS n_ell, "
   "list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS ls, "
   "len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha, "
   "len(list_distinct(list_filter(ws, w -> list_contains(" + _GSTOP
   + ", w)))) AS g_stop_hits FROM f), "
   "gf AS (SELECT doc_id, g_stop_hits, "
   "ROUND(wlen_sum / greatest(gw, 1), 4) AS g_mean_wlen, "
   "ROUND((n_hash + n_ell) / greatest(gw, 1), 4) AS g_symbol_ratio, "
   "ROUND(len(list_filter(ls, l -> starts_with(trim(l), '- ') "
   "OR starts_with(trim(l), '* '))) / greatest(len(ls), 1), 4) "
   "AS g_bullet_frac, "
   "ROUND(len(list_filter(ls, l -> ends_with(trim(l), '...'))) "
   "/ greatest(len(ls), 1), 4) AS g_ellipsis_frac, "
   "ROUND(n_alpha / greatest(gw, 1), 4) AS g_alpha_frac, "
   f"(gw >= {T.GOPHER_MIN_WORDS} AND gw <= {T.GOPHER_MAX_WORDS} "
   f"AND wlen_sum / greatest(gw, 1) >= {T.GOPHER_MIN_MEAN_WLEN} "
   f"AND wlen_sum / greatest(gw, 1) <= {T.GOPHER_MAX_MEAN_WLEN} "
   "AND (n_hash + n_ell) / greatest(gw, 1) <= "
   f"{T.GOPHER_MAX_SYMBOL_RATIO} "
   "AND len(list_filter(ls, l -> starts_with(trim(l), '- ') "
   "OR starts_with(trim(l), '* '))) / greatest(len(ls), 1) <= "
   f"{T.GOPHER_MAX_BULLET_FRAC} "
   "AND len(list_filter(ls, l -> ends_with(trim(l), '...'))) "
   f"/ greatest(len(ls), 1) <= {T.GOPHER_MAX_ELLIPSIS_FRAC} "
   f"AND n_alpha / greatest(gw, 1) >= {T.GOPHER_MIN_ALPHA_FRAC} "
   f"AND g_stop_hits >= {T.GOPHER_MIN_STOP_HITS}) AS gopher_pass "
   "FROM gr) "
   "SELECT g.doc_id, n_words, "
   "ROUND(stops / greatest(n_words, 1), 4) AS stop_ratio, "
   "ROUND(punct / greatest(n_chars, 1), 4) AS punct_ratio, "
   "ROUND(alpha / greatest(n_words, 1), 4) AS avg_word_len, "
   "ROUND(least(n_words / 100.0, 1.0) * 0.4 "
   "+ (stops / greatest(n_words, 1)) * 0.3 "
   "+ (1.0 - punct / greatest(n_chars, 1)) * 0.2 "
   "+ least((alpha / greatest(n_words, 1)) / 8.0, 1.0) * 0.1, 4) "
   "AS quality, "
   "ROUND(1.0 / (1.0 + exp(-(sw / n))), 4) AS model_score, "
   "gf.g_mean_wlen, gf.g_symbol_ratio, gf.g_bullet_frac, "
   "gf.g_ellipsis_frac, gf.g_alpha_frac, gf.g_stop_hits, gf.gopher_pass "
   "FROM g LEFT JOIN m ON g.doc_id = m.doc_id "
   "JOIN gf ON g.doc_id = gf.doc_id",
   "quality scoring: length/punct/stopword shallow features + "
   "fastText-style linear-classifier score over a broadcast (word, "
   "weight) vocabulary (deterministic stand-in weights; trained-model "
   "table at production) + Gopher rule-based flags (Rae 2021 A1.1: "
   "word-count/mean-word-length bounds, symbol ratio, bullet/ellipsis "
   "line fractions, alpha-word fraction, stop-hit floor)")
def quality(spark, sf):
    d = load(spark, sf, "documents")
    base = T.quality_features(d, "doc_id", "text")
    wt = spark.createDataFrame([(w, k / 1000.0) for w, k in _WEIGHTS],
                               ["word", "weight"])
    scores = T.model_quality_scores(d, "doc_id", "text", wt)
    gopher = T.gopher_quality_flags(d, "doc_id", "text").drop("g_n_words")
    return (base.join(scores, "doc_id", "left")
            .join(gopher, "doc_id"))


# Add-k smoothing constant for the bigram-LM perplexity fold below —
# hardcoded identically in the oracle SQL.
LM_K = 0.5


def _lang_sql() -> str:
    scores = {lg: f"len(list_filter(string_split(text, ' '), "
                  f"w -> list_contains({_sql_list(ms)}, w)))"
              for lg, ms in T.LANG_MARKERS.items()}
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in scores) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN s_{lg} = {best} THEN '{lg}'" for lg in scores) + " END"
    inner = ", ".join(f"{expr} AS s_{lg}" for lg, expr in scores.items())
    return (
        "WITH w AS (SELECT doc_id, lang, "
        "list_filter(string_split(text, ' '), x -> x <> '') AS ws "
        "FROM documents), "
        "bg AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM w, "
        "unnest(range(1, greatest(len(ws), 1))) AS t(i)), "
        "bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2), "
        "cc AS (SELECT w1, sum(c12) AS c1 FROM bc GROUP BY 1), "
        "v AS (SELECT count(DISTINCT x) AS vs FROM "
        "(SELECT w1 AS x FROM bc UNION ALL SELECT w2 FROM bc)), "
        "bgt AS (SELECT bg.doc_id, bg.w1, bg.w2 FROM bg "
        "JOIN w USING (doc_id) WHERE w.lang = 'en'), "
        "btc AS (SELECT w1, w2, count(*) AS c12t FROM bgt GROUP BY 1, 2), "
        "ctc AS (SELECT w1, sum(c12t) AS c1t FROM btc GROUP BY 1), "
        "vt AS (SELECT count(DISTINCT x) AS vst FROM "
        "(SELECT w1 AS x FROM btc UNION ALL SELECT w2 FROM btc)), "
        f"lp AS (SELECT bg.doc_id, ln((bc.c12 + {LM_K}) / "
        f"(cc.c1 + {LM_K} * v.vs)) AS logp, "
        f"ln((COALESCE(btc.c12t, 0) + {LM_K}) / "
        f"(COALESCE(ctc.c1t, 0) + {LM_K} * vt.vst)) "
        f"- ln((bc.c12 + {LM_K}) / (cc.c1 + {LM_K} * v.vs)) AS dlp "
        "FROM bg JOIN bc ON bg.w1 = bc.w1 AND bg.w2 = bc.w2 "
        "JOIN cc ON bg.w1 = cc.w1 "
        "LEFT JOIN btc ON bg.w1 = btc.w1 AND bg.w2 = btc.w2 "
        "LEFT JOIN ctc ON bg.w1 = ctc.w1 CROSS JOIN v CROSS JOIN vt), "
        "ppl AS (SELECT doc_id, ROUND(exp(-avg(logp)), 4) AS ppl, "
        "ROUND(exp(avg(dlp)), 4) AS dsir_w FROM lp GROUP BY 1), "
        f"s AS (SELECT doc_id, {inner} FROM documents), "
        # CCNet head/middle/tail mirror: per-language perplexity-tercile
        # thresholds from a (lang, ppl) histogram cumsum; integer cut
        # ranks ((n*k + 2) // 3 == ceil(n*k/3)); ties fall LOW.
        f"pb AS (SELECT s.doc_id, {case} AS pl, ppl.ppl AS ppl, "
        "ppl.dsir_w AS dsir_w FROM s LEFT JOIN ppl USING (doc_id)), "
        "hh AS (SELECT pl, ppl, count(*) AS c FROM pb "
        "WHERE ppl IS NOT NULL GROUP BY 1, 2), "
        "tt AS (SELECT pl, sum(c) AS n FROM hh GROUP BY 1), "
        "cu AS (SELECT pl, ppl, sum(c) OVER (PARTITION BY pl ORDER BY ppl "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum "
        "FROM hh), "
        "th AS (SELECT cu.pl, "
        "min(CASE WHEN cum >= (n * 1 + 2) // 3 THEN ppl END) AS t1, "
        "min(CASE WHEN cum >= (n * 2 + 2) // 3 THEN ppl END) AS t2 "
        "FROM cu JOIN tt USING (pl) GROUP BY 1) "
        "SELECT pb.pl AS pred_lang, count(*) AS cnt, "
        "ROUND(avg(ppl), 4) AS avg_ppl, "
        "ROUND(avg(dsir_w), 4) AS avg_dsir, "
        "count(*) FILTER (WHERE ppl <= t1) AS n_head, "
        "count(*) FILTER (WHERE ppl > t1 AND ppl <= t2) AS n_mid, "
        "count(*) FILTER (WHERE ppl > t2) AS n_tail "
        "FROM pb LEFT JOIN th ON pb.pl = th.pl GROUP BY 1")


@q("text_lang_id", _lang_sql(),
   "marker-lexicon language ID with deterministic tie-break. Folded: "
   "CCNet-style bigram-LM perplexity (Wenzek et al. 2020 §4.3 at order "
   "2) — avg_ppl per predicted language under an add-k corpus-trained "
   "bigram model; the oracle retrains and rescores the identical "
   "distribution in SQL (the self-trained setting makes every scored "
   "bigram in-vocabulary, so its inner join equals the operator's "
   "OOV-tolerant left join). Late fold: DSIR importance weights (Xie "
   "et al. 2023) — avg_dsir per language, target LM = the table's "
   "lang='en' subset vs the raw-pool LM (target-side OOV exercised for "
   "real: non-en bigrams hit the COALESCE-0 path in both engines). "
   "Late fold: CCNet §4.3 head/middle/tail perplexity terciles per "
   "language (quantile_buckets — grouped histogram-cumsum thresholds, "
   "no per-group corpus sort) as n_head/n_mid/n_tail counts")
def lang_id_q(spark, sf):
    from pyspark.sql import functions as F

    from ocr_spark.operators.sampling import lm_ppl_and_dsir, \
        quantile_buckets
    d = load(spark, sf, "documents")
    # persist justified: each trained LM has THREE derived consumers in
    # the fused scoring pass (bigram lookups, context sums, vocab
    # scalar) — unpersisted, each re-runs the corpus-wide training agg.
    # Size is bounded by distinct-bigram count (the pruned-LM contract).
    lm = T.fit_bigram_lm(d, "doc_id", "text").persist()
    tlm = T.fit_bigram_lm(d.where(F.col("lang") == "en"),
                          "doc_id", "text").persist()
    scores = lm_ppl_and_dsir(d, "doc_id", "text", tlm, lm, k=LM_K)
    per_doc = (d.select("doc_id", T.lang_id(F.col("text"))
                        .alias("pred_lang"))
               .join(scores, "doc_id", "left"))
    bucketed = quantile_buckets(per_doc, "pred_lang", "ppl")
    return bucketed.groupBy("pred_lang").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg("ppl"), 4).alias("avg_ppl"),
        F.round(F.avg("dsir_w"), 4).alias("avg_dsir"),
        F.sum(F.when(F.col("bucket") == "head", 1).otherwise(0))
        .alias("n_head"),
        F.sum(F.when(F.col("bucket") == "middle", 1).otherwise(0))
        .alias("n_mid"),
        F.sum(F.when(F.col("bucket") == "tail", 1).otherwise(0))
        .alias("n_tail"))


# Training-window chunking constants for the fold below (overlapping
# windows: stride < chunk) — hardcoded identically in the oracle SQL.
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


@q("text_token_counts",
   "WITH t AS (SELECT doc_id, "
   "list_filter(string_split(text, ' '), w -> w <> '') AS ws, "
   "len(list_filter(string_split(text, ' '), w -> w <> '')) AS ws_tokens, "
   "len(regexp_extract_all(text, '[a-z]{1,4}|[0-9]|[^\\w ]')) AS bpe_tokens, "
   + sql_md5long("CAST(doc_id AS VARCHAR)") + " AS hv FROM documents), "
   "c AS (SELECT doc_id, list_transform("
   "CASE WHEN len(ws) = 0 THEN []::INT[] "
   f"WHEN len(ws) <= {CHUNK_TOKENS} THEN [0] "
   f"ELSE list_concat(list_filter(range(0, len(ws), {CHUNK_STRIDE}), "
   f"s -> s + {CHUNK_TOKENS} < len(ws)), [len(ws) - {CHUNK_TOKENS}]) END, "
   f"s -> array_to_string(ws[s + 1:s + {CHUNK_TOKENS}], ' ')) "
   "AS chunks FROM t) "
   "SELECT t.doc_id, ws_tokens, bpe_tokens, "
   "CAST(floor((sum(ws_tokens) OVER (ORDER BY hv, t.doc_id "
   "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ws_tokens) "
   "/ 2000) AS BIGINT) AS shard_id, "
   "CAST(len(chunks) AS INT) AS n_chunks, "
   "CASE WHEN len(chunks) > 0 THEN md5(array_to_string(chunks, '|')) "
   "END AS chunks_md5 "
   "FROM t JOIN c ON t.doc_id = c.doc_id",
   "token counting: whitespace + BPE-ish regex estimate; r3 adds "
   "token-budget shard packing (shard_id) — the oracle's global window "
   "cumsum is what Spark must NOT do (single partition); "
   "assign_token_shards computes the identical prefix sum with "
   "range-bucket partials + broadcast offsets (operators/packing.py). "
   "Late fold: training-window chunking (chunk_texts, 32-token windows "
   "at stride 24, right-aligned tail) pinned value-for-value by "
   "chunks_md5 = md5 of the '|'-joined window texts")
def tokens(spark, sf):
    from pyspark.sql import functions as F

    from ocr_spark.operators.packing import assign_token_shards
    d = load(spark, sf, "documents")
    t = F.col("text")
    ct = T.chunk_texts(t, CHUNK_TOKENS, CHUNK_STRIDE)
    base = d.select(
        "doc_id",
        T.ws_token_count(t).alias("ws_tokens"),
        T.bpe_token_count(t).alias("bpe_tokens"),
        F.size(ct).alias("n_chunks"),
        F.when(F.size(ct) > 0, F.md5(F.array_join(ct, "|")))
        .alias("chunks_md5"))
    return assign_token_shards(base, "doc_id", "ws_tokens", budget=2000)


# Stand-in badword blocklist for the C4 page-policy fold: words that
# actually occur in the testdata vocabulary so the hit counts vary.
# Production swaps in the real ~400-word C4 list — the mechanism under
# test (broadcast blocklist TABLE + per-doc hit count) is identical.
_BADWORDS = ("slow", "dup")

@q("text_scrub_pii",
   "WITH a AS (SELECT doc_id, "
   "text || CASE WHEN doc_id % 17 = 0 THEN ' lorem ipsum' ELSE '' END "
   "|| CASE WHEN doc_id % 23 = 0 THEN ' {' ELSE '' END AS ft, "
   f"len(regexp_extract_all(text, '{T.EMAIL_RE}')) AS n_emails, "
   f"regexp_replace(text, '{T.EMAIL_RE}', '{T.PII_TOKEN}', 'g') AS t1 "
   "FROM documents), "
   "bw(word) AS (VALUES " + ", ".join(f"('{w}')" for w in _BADWORDS)
   + "), "
   "e AS (SELECT doc_id, unnest(list_filter(string_split(lower(ft), ' '), "
   "w -> w <> '')) AS word FROM a), "
   "c AS (SELECT e.doc_id, count(*) AS nb FROM e JOIN bw USING (word) "
   "GROUP BY 1) "
   "SELECT a.doc_id, "
   f"regexp_replace(t1, '{T.PHONE_RE}', '{T.PII_TOKEN}', 'g') AS scrubbed, "
   "CAST(n_emails AS INT) AS n_emails, "
   f"CAST(len(regexp_extract_all(t1, '{T.PHONE_RE}')) AS INT) AS n_phones, "
   "CAST(COALESCE(c.nb, 0) AS INT) AS n_badwords, "
   "contains(lower(ft), 'lorem ipsum') AS has_lorem, "
   "contains(ft, '{') AS has_brace, "
   "(COALESCE(c.nb, 0) = 0 AND NOT contains(lower(ft), 'lorem ipsum') "
   "AND NOT contains(ft, '{')) AS c4_kept "
   "FROM a LEFT JOIN c ON a.doc_id = c.doc_id",
   "PII scrub: emails + phone-shaped digit runs replaced by a fixed "
   "token, per-doc redaction counts — pure regex, narrow. Late fold: "
   "C4 page-grain policy filters (Raffel et al. 2020 §2.2) — badword-"
   "blocklist hit count over a broadcast (word) table, lorem-ipsum and "
   "curly-brace flags, combined c4_kept verdict; the synth vocabulary "
   "never triggers lorem/brace, so the driver row appends the markers "
   "deterministically (doc_id % 17 / % 23) to give every rule real "
   "work in both engines")
def scrub_pii_q(spark, sf):
    from pyspark.sql import functions as F

    d = load(spark, sf, "documents")
    base = T.scrub_pii(d, "doc_id", "text")
    ft = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 17 == 0, F.lit(" lorem ipsum"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 23 == 0, F.lit(" {"))
        .otherwise(F.lit("")))
    bw = spark.createDataFrame([(w,) for w in _BADWORDS], ["word"])
    flags = T.c4_page_flags(d.select("doc_id", ft.alias("ft")),
                            "doc_id", "ft", bw)
    return base.join(flags, "doc_id")


_SPAN_K = 8

@q("text_repetition_stats",
   "WITH w AS (SELECT doc_id, "
   "list_filter(string_split(text, ' '), x -> x <> '') AS ws "
   "FROM documents), "
   "g AS (SELECT doc_id, i AS pos, "
   + sql_md5long(f"array_to_string(ws[i:i+{_SPAN_K - 1}], ' ')")
   + " AS gh FROM w, "
   f"unnest(range(1, greatest(len(ws) - {_SPAN_K} + 2, 1))) AS t(i)), "
   "d AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2), "
   "s AS (SELECT doc_id, list_sort(list(pos)) AS ps "
   "FROM g JOIN d USING (gh) GROUP BY doc_id), "
   "m AS (SELECT doc_id, "
   "CAST(1 + COALESCE(list_sum(list_transform(range(2, len(ps) + 1), "
   f"j -> CASE WHEN ps[j] - ps[j-1] > {_SPAN_K} THEN 1 ELSE 0 END)), 0) "
   "AS INT) AS dup_spans, "
   f"CAST({_SPAN_K} + COALESCE(list_sum(list_transform("
   "range(2, len(ps) + 1), "
   f"j -> least(ps[j] - ps[j-1], {_SPAN_K}))), 0) AS INT) AS dup_words "
   "FROM s), "
   # ExactSubstr REMOVAL mirror (r4): removed word indices = union of
   # the duplicated windows [p, p+k); clean text = the other words
   "r AS (SELECT doc_id, list_sort(list_distinct(flatten("
   f"list_transform(ps, p -> range(p, p + {_SPAN_K}))))) AS rem FROM s) "
   "SELECT w.doc_id, len(ws) AS n_words, "
   "ROUND(len(list_distinct(ws)) / greatest(len(ws), 1), 4) "
   "AS distinct_ratio, "
   "ROUND(COALESCE(list_max(map_values(list_aggregate(ws, 'histogram'))), "
   "0) / greatest(len(ws), 1), 4) AS top_word_share, "
   "COALESCE(m.dup_spans, 0) AS dup_spans, "
   "COALESCE(m.dup_words, 0) AS dup_words, "
   "ROUND(COALESCE(m.dup_words, 0) / greatest(len(ws), 1), 4) "
   "AS dup_word_frac, "
   # inner COALESCE: DuckDB's array_to_string([]) is NULL, Spark's
   # array_join([]) is '' — a fully-removed doc must hash '' on both;
   # the ws IS NULL guard keeps NULL-text docs NULL
   "CASE WHEN ws IS NULL THEN NULL ELSE "
   "md5(COALESCE(array_to_string(list_filter(ws, (x, i) -> "
   "NOT list_contains(COALESCE(r.rem, CAST([] AS BIGINT[])), i)), ' '), "
   "'')) END AS clean_md5 "
   "FROM w LEFT JOIN m ON w.doc_id = m.doc_id "
   "LEFT JOIN r ON w.doc_id = r.doc_id",
   "Gopher-style repetition filters: distinct-word ratio + top-word "
   "share (spam/boilerplate detectors); r3 adds exact duplicated-"
   "substring spans at k-gram resolution (duplicated_span_stats — the "
   "shuffle-friendly ExactSubstr variant, Lee et al. 2021): dup_spans/"
   "dup_words/dup_word_frac over corpus-wide >= 2-occurrence 8-gram "
   "windows, merged per doc. r4 adds the actual REMOVAL "
   "(remove_duplicated_spans): clean_md5 fingerprints the text with "
   "every merged duplicated window cut out (word-grain), the oracle "
   "recomputing the removal independently from the positional k-grams")
def repetition_q(spark, sf):
    from pyspark.sql import functions as F

    from ocr_spark.operators.dedup import remove_duplicated_spans
    d = load(spark, sf, "documents")
    base = T.repetition_stats(d, "doc_id", "text")
    cleaned = remove_duplicated_spans(
        d.select("doc_id", "text"), "doc_id", "text", k=_SPAN_K)
    return (base.join(cleaned.select("doc_id", "clean_text", "dup_spans",
                                     "dup_words"), "doc_id")
            .select("doc_id", "n_words", "distinct_ratio", "top_word_share",
                    "dup_spans", "dup_words",
                    F.round(F.col("dup_words")
                            / F.greatest("n_words", F.lit(1)), 4)
                    .alias("dup_word_frac"),
                    F.md5("clean_text").alias("clean_md5")))


@q("curation_pipeline",
   "WITH surv AS (SELECT min(doc_id) AS doc_id FROM documents "
   "GROUP BY md5(text)), "
   "w AS (SELECT d.doc_id, d.lang, "
   "list_filter(string_split(d.text, ' '), x -> x <> '') AS ws "
   "FROM documents d JOIN surv USING (doc_id)), "
   "f AS (SELECT doc_id, lang, len(ws) AS n_words, "
   "ROUND(len(list_distinct(ws)) / greatest(len(ws), 1), 4) AS dr "
   "FROM w), "
   # decontamination mirror: 3-shingles over ALL docs (same construction
   # as the minhash/jaccard _SH_CTE), benchmark = doc_id < 5 slice
   "aw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
   "ash AS (SELECT DISTINCT doc_id, shingle FROM ("
   "SELECT doc_id, unnest(CASE WHEN len(ws) >= 3 THEN "
   "list_transform(range(1, len(ws) - 1), "
   "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) "
   "ELSE [array_to_string(ws, ' ')] END) AS shingle FROM aw)), "
   "bsh AS (SELECT DISTINCT shingle FROM ash WHERE doc_id < 5), "
   "contam AS (SELECT DISTINCT doc_id FROM ash JOIN bsh USING (shingle)) "
   "SELECT lang, count(*) FILTER (WHERE c.doc_id IS NULL) AS kept, "
   "ROUND(avg(n_words) FILTER (WHERE c.doc_id IS NULL), 4) AS avg_words, "
   "count(*) FILTER (WHERE c.doc_id IS NOT NULL) AS n_contam "
   "FROM f LEFT JOIN contam c ON f.doc_id = c.doc_id "
   "WHERE n_words >= 20 AND dr >= 0.3 GROUP BY lang",
   "end-to-end curation composition: exact-dedup survivors -> "
   "length + repetition quality gate -> benchmark decontamination "
   "(GPT-3-style k-shingle overlap vs a deterministic stand-in eval "
   "slice, doc_id < 5; at scale the benchmark is an external eval "
   "table) -> per-lang corpus stats. The text column NEVER crosses an "
   "Exchange: features are computed narrow on the scan, the gate is "
   "applied before the survivor join, and the contamination semi-join "
   "broadcasts the benchmark shingle-hash set, so the shuffles carry "
   "only ids + small stats (dedup groupBy ships md5+id)")
def curation_pipeline(spark, sf):
    from pyspark.sql import functions as F

    from ocr_spark.operators.dedup import contaminated_ids, \
        exact_dedup_survivors

    d = load(spark, sf, "documents")
    surv = exact_dedup_survivors(d, "doc_id", "text").select("doc_id")
    feats = T.repetition_stats(d, "doc_id", "text", carry=("lang",))
    gated = feats.where((F.col("n_words") >= 20)
                        & (F.col("distinct_ratio") >= 0.3))
    bench = d.where(F.col("doc_id") < 5).select("text")
    # left join against the flagged-id set (absent row == clean) rather
    # than decontaminate()'s docs+flags wrapper — skips the second
    # full-corpus scan the wrapper needs to re-attach text columns
    hits = contaminated_ids(d.select("doc_id", "text"), bench,
                            "doc_id", "text", k=3)
    clean = F.col("_hits").isNull()
    return (gated.join(surv, "doc_id").join(hits, "doc_id", "left")
            .groupBy("lang")
            .agg(F.sum(F.when(clean, 1).otherwise(0)).alias("kept"),
                 F.round(F.avg(F.when(clean, F.col("n_words"))), 4)
                 .alias("avg_words"),
                 F.sum(F.when(clean, 0).otherwise(1)).alias("n_contam")))


@q("text_fingerprint",
   "WITH n AS (SELECT doc_id, "
   "trim(regexp_replace(text, '[ \\t\\n\\r\\f\\v]+', ' ', 'g')) AS norm "
   "FROM documents), "
   "dw AS (SELECT doc_id, word, count(*) AS c_dw FROM "
   "(SELECT doc_id, unnest(string_split(text, ' ')) AS word "
   "FROM documents) WHERE word <> '' GROUP BY 1, 2), "
   "nn AS (SELECT count(*) AS nd FROM documents), "
   "i AS (SELECT word, ROUND(ln(nd / count(*)), 4) AS idf_r "
   "FROM dw CROSS JOIN nn GROUP BY word, nd), "
   "st AS (SELECT dw.doc_id, dw.word, "
   "ROUND(dw.c_dw * i.idf_r, 4) AS tfidf "
   "FROM dw JOIN i USING (word)), "
   "top AS (SELECT doc_id, word, tfidf, ROW_NUMBER() OVER "
   "(PARTITION BY doc_id ORDER BY tfidf DESC, word DESC) AS rn FROM st) "
   "SELECT n.doc_id, md5(norm) AS md5_fp, "
   "list_reduce(list_prepend(CAST(0 AS BIGINT), "
   "list_transform(list_filter(string_split(norm, ' '), w -> w <> ''), "
   "w -> " + sql_md5long("w") + f" % {MOD_P})), "
   f"(acc, h) -> (acc * 31 + h) % {MOD_P}) AS rolling_fp, "
   "t.word AS top_term, t.tfidf AS top_term_tfidf "
   "FROM n LEFT JOIN (SELECT * FROM top WHERE rn = 1) t "
   "ON n.doc_id = t.doc_id",
   "document fingerprinting: md5 + order-sensitive rolling hash. Late "
   "fold: per-doc TF-IDF keyword (tfidf_top_term — highest raw-tf·idf "
   "term, tie -> lexicographically last word; idf table broadcast, "
   "argmax = one partial-aggregated struct max, the oracle's global "
   "ROW_NUMBER window is exactly what Spark must not do)")
def fingerprint_q(spark, sf):
    from pyspark.sql import functions as F

    from ocr_spark.operators.textstats import tfidf_top_term
    d = load(spark, sf, "documents")
    return (T.fingerprint(d, "doc_id", "text")
            .join(tfidf_top_term(d, "doc_id", "text"), "doc_id", "left"))
