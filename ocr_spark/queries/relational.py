"""Relational operator inventory over the driver testdata tables.

One QuerySpec per SURVEY.md §2 row (S/P/J/A/W/T families + set ops +
scalar functions). The Spark side is DataFrame API (declarative — Catalyst
does pushdown/pruning/reordering); the SQL side is the DuckDB oracle.

Determinism rules applied throughout:
  * every aggregate/computed column aliased identically on both sides;
  * floats rounded to fixed decimals on both sides;
  * ordered aggregations carry explicit tie-breaks (event_id, keys).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ocr_spark.queries import QuerySpec, load

QUERIES: list[QuerySpec] = []


def q(name: str, sql: str | None, note: str = ""):
    def deco(fn):
        QUERIES.append(QuerySpec(name, fn, sql, note))
        return fn
    return deco


# ---------------------------------------------------------------- scans (S)

@q("s1_scan_documents",
   "SELECT doc_id, text, lang, source, n_chars FROM documents",
   "S1 full scan; parquet -> DataFrame")
def s1(spark, sf):
    return load(spark, sf, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars")


@q("s2_source_label_counts",
   "SELECT source, count(*) AS cnt FROM documents GROUP BY source",
   "S2 dir-walk labeled scan analog")
def s2(spark, sf):
    return (load(spark, sf, "documents")
            .groupBy("source").agg(F.count(F.lit(1)).alias("cnt")))


# -------------------------------------------------- projections/filters (P)

@q("p1_column_pruning",
   "SELECT doc_id, lang FROM documents",
   "P1 projection; Catalyst prunes scan to 2 columns")
def p1(spark, sf):
    return load(spark, sf, "documents").select("doc_id", "lang")


@q("p2_threshold_predicate",
   "SELECT event_id, value FROM events WHERE value > 50.0",
   "P2 Otsu-threshold analog: per-row predicate")
def p2(spark, sf):
    return (load(spark, sf, "events")
            .where(F.col("value") > 50.0).select("event_id", "value"))


@q("p4_range_filter",
   "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
   "WHERE l_quantity BETWEEN 10 AND 20",
   "P4 area-filter analog: range predicate, parquet row-group pruning")
def p4(spark, sf):
    return (load(spark, sf, "lineitem")
            .where(F.col("l_quantity").between(10, 20))
            .select("l_orderkey", "l_linenumber", "l_quantity"))


@q("p5_computed_expression_filter",
   "SELECT p_partkey, ROUND(p_retailprice / p_size, 4) AS ratio FROM part "
   "WHERE p_retailprice / p_size BETWEEN 20 AND 200",
   "P5 aspect-ratio filter analog: computed-expression predicate")
def p5(spark, sf):
    ratio = F.col("p_retailprice") / F.col("p_size")
    return (load(spark, sf, "part")
            .where(ratio.between(20, 200))
            .select("p_partkey", F.round(ratio, 4).alias("ratio")))


@q("p6_case_classification",
   "SELECT CASE WHEN value < 60 THEN 'low' ELSE 'ok' END AS conf_class, "
   "count(*) AS cnt FROM events GROUP BY 1",
   "P6 confidence-filter analog: when/otherwise case classification")
def p6(spark, sf):
    return (load(spark, sf, "events")
            .select(F.when(F.col("value") < 60, "low").otherwise("ok")
                    .alias("conf_class"))
            .groupBy("conf_class").agg(F.count(F.lit(1)).alias("cnt")))


@q("p8_char_whitelist",
   "SELECT doc_id, regexp_replace(text, '[^a-z ]', '', 'g') AS clean "
   "FROM documents",
   "P8 tesseract char-whitelist analog: alphabet constraint via regex")
def p8(spark, sf):
    return (load(spark, sf, "documents")
            .select("doc_id",
                    F.regexp_replace("text", "[^a-z ]", "").alias("clean")))


# ----------------------------------------------------------------- joins (J)

@q("j1_broadcast_dim_join",
   "SELECT r.r_name AS region, count(*) AS customers FROM customer c "
   "JOIN nation n ON c.c_nationkey = n.n_nationkey "
   "JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name",
   "J1 class-dict lookup analog: broadcast hash equi-join to tiny dims")
def j1(spark, sf):
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    return (c.join(F.broadcast(n),
                   c.c_nationkey == n.n_nationkey)
             .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
             .groupBy(F.col("r_name").alias("region"))
             .agg(F.count(F.lit(1)).alias("customers")))


@q("j2_containment_anti_join",
   "SELECT a.n_nationkey, a.n_name FROM nation a "
   "WHERE NOT EXISTS (SELECT 1 FROM nation b "
   "WHERE a.n_regionkey = b.n_regionkey "
   "AND b.n_nationkey > a.n_nationkey)",
   "J2 nested-bbox-containment analog: theta self anti-join (BNLJ)")
def j2(spark, sf):
    n = load(spark, sf, "nation")
    a, b = n.alias("a"), n.alias("b")
    cond = (F.col("a.n_regionkey") == F.col("b.n_regionkey")) & \
           (F.col("b.n_nationkey") > F.col("a.n_nationkey"))
    return (a.join(b, cond, "left_anti")
             .select(F.col("n_nationkey"), F.col("n_name")))


@q("j3_interval_range_join",
   "SELECT a.user_id, count(*) AS pair_cnt FROM events a JOIN events b "
   "ON a.user_id = b.user_id AND b.event_id <> a.event_id "
   "AND b.ts BETWEEN a.ts - INTERVAL 60 SECOND AND a.ts "
   "GROUP BY a.user_id",
   "J3 interval-overlap analog: bucketed range join — probe side explodes "
   "to the 2 candidate 60s bins, equi-join on (user_id, bin), exact range "
   "filter after. Bounds per-group work even for hot users (the plain "
   "equi+range SMJ is quadratic within a user's group at scale).")
def j3(spark, sf):
    e = load(spark, sf, "events")
    bin_col = F.floor(F.unix_timestamp("ts") / 60).cast("long")
    b = e.select(F.col("user_id"), F.col("event_id").alias("b_event_id"),
                 F.col("ts").alias("b_ts"), bin_col.alias("bin"))
    a = e.select(F.col("user_id"), F.col("event_id").alias("a_event_id"),
                 F.col("ts").alias("a_ts"),
                 F.explode(F.array(bin_col, bin_col - 1)).alias("bin"))
    pairs = (a.join(b, ["user_id", "bin"])
             .where((F.col("b_event_id") != F.col("a_event_id"))
                    & (F.col("b_ts")
                       >= F.col("a_ts") - F.expr("INTERVAL 60 SECONDS"))
                    & (F.col("b_ts") <= F.col("a_ts"))))
    return (pairs.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("pair_cnt")))


@q("j4_fullouter_alignment",
   "WITH g AS (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) "
   "SELECT CAST(sum(CASE WHEN g.doc_id IS NULL THEN 1 ELSE 0 END) "
   "AS BIGINT) AS missing, "
   "CAST(sum(CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
   "AS extra, "
   "count(*) AS total "
   "FROM documents d FULL OUTER JOIN g ON d.doc_id = g.doc_id",
   "J4 expected-vs-found alignment: full outer join + missing/extra sets")
def j4(spark, sf):
    d = load(spark, sf, "documents").select("doc_id")
    g = d.where(F.col("doc_id") % 10 != 0) \
         .withColumnRenamed("doc_id", "g_doc_id")
    j = d.join(g, d.doc_id == g.g_doc_id, "full_outer")
    return j.agg(
        F.sum(F.when(F.col("g_doc_id").isNull(), 1).otherwise(0))
        .alias("missing"),
        F.sum(F.when(F.col("doc_id").isNull(), 1).otherwise(0))
        .alias("extra"),
        F.count(F.lit(1)).alias("total"))


@q("j5_pairs_lookup_join",
   "SELECT p.b AS confusable_with, count(*) AS cnt FROM events e "
   "JOIN (VALUES ('click','view'), ('signup','purchase'), ('error','view')) "
   "p(a, b) ON e.event_type = p.a GROUP BY p.b",
   "J5 confused-letter-pairs analog: broadcast join vs literal dim")
def j5(spark, sf):
    pairs = load(spark, sf, "events").sparkSession.createDataFrame(
        [("click", "view"), ("signup", "purchase"), ("error", "view")],
        ["a", "b"])
    e = load(spark, sf, "events")
    return (e.join(F.broadcast(pairs), e.event_type == pairs.a)
             .groupBy(F.col("b").alias("confusable_with"))
             .agg(F.count(F.lit(1)).alias("cnt")))


@q("j6_large_sortmerge_join",
   "SELECT o.o_orderpriority, "
   "ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue, "
   "count(*) AS line_cnt FROM orders o JOIN lineitem l "
   "ON o.o_orderkey = l.l_orderkey GROUP BY o.o_orderpriority",
   "large-large equi-join: sort-merge + AQE skew handling at scale")
def j6(spark, sf):
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    return (o.join(li, o.o_orderkey == li.l_orderkey)
             .groupBy("o_orderpriority")
             .agg(F.round(F.sum(F.col("l_extendedprice")
                                * (1 - F.col("l_discount"))), 2)
                  .alias("revenue"),
                  F.count(F.lit(1)).alias("line_cnt")))


# ---------------------------------------------------------- aggregations (A)

@q("a1_projection_profile_sum",
   "SELECT user_id, ROUND(sum(value), 4) AS total FROM events "
   "GROUP BY user_id",
   "A1 horizontal projection profile: hash agg w/ partial aggregation")
def a1(spark, sf):
    return (load(spark, sf, "events").groupBy("user_id")
            .agg(F.round(F.sum("value"), 4).alias("total")))


@q("a3_normalize_by_max",
   "SELECT event_id, ROUND(value / (SELECT max(value) FROM events), 6) "
   "AS norm FROM events",
   "A3 profile normalization: scalar-subquery max broadcast")
def a3(spark, sf):
    e = load(spark, sf, "events")
    mx = e.agg(F.max("value").alias("mx"))
    return (e.crossJoin(F.broadcast(mx))
            .select("event_id",
                    F.round(F.col("value") / F.col("mx"), 6).alias("norm")))


@q("a4_ordered_text_assembly",
   "SELECT user_id, string_agg(event_type, '' ORDER BY ts, event_id) "
   "AS journey FROM events GROUP BY user_id",
   "A4 RTL reassembly analog: ordered aggregation with explicit tie-break")
def a4(spark, sf):
    e = load(spark, sf, "events")
    return (e.groupBy("user_id")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("ts", "event_id", "event_type"))),
                    lambda s: s["event_type"]),
                "").alias("journey")))


@q("a5_adaptive_threshold",
   "SELECT count(*) AS outliers FROM events WHERE value > "
   "(SELECT avg(value) + stddev_samp(value) * 0.7 FROM events)",
   "A5 mean+std adaptive threshold (scalar agg subquery)")
def a5(spark, sf):
    e = load(spark, sf, "events")
    thr = e.agg((F.avg("value") + F.stddev_samp("value") * 0.7)
                .alias("thr"))
    return (e.crossJoin(F.broadcast(thr))
            .where(F.col("value") > F.col("thr"))
            .agg(F.count(F.lit(1)).alias("outliers")))


@q("a6_confusion_matrix_pivot",
   "SELECT source, "
   "CAST(sum(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS BIGINT) AS en, "
   "CAST(sum(CASE WHEN lang='de' THEN 1 ELSE 0 END) AS BIGINT) AS de, "
   "CAST(sum(CASE WHEN lang='es' THEN 1 ELSE 0 END) AS BIGINT) AS es, "
   "CAST(sum(CASE WHEN lang='fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr, "
   "CAST(sum(CASE WHEN lang='zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh "
   "FROM documents GROUP BY source",
   "A6 confusion matrix: pivot-shaped conditional aggregation")
def a6(spark, sf):
    d = load(spark, sf, "documents")
    aggs = [F.sum(F.when(F.col("lang") == lg, 1).otherwise(0)).alias(lg)
            for lg in ["en", "de", "es", "fr", "zh"]]
    return d.groupBy("source").agg(*aggs)


@q("a7_per_class_share",
   "SELECT event_type, count(*) AS cnt, "
   "ROUND(avg(CASE WHEN value >= 50 THEN 1.0 ELSE 0.0 END), 4) "
   "AS high_share FROM events GROUP BY event_type",
   "A7 per-class precision analog: conditional aggregates")
def a7(spark, sf):
    return (load(spark, sf, "events").groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.round(F.avg(F.when(F.col("value") >= 50, 1.0)
                               .otherwise(0.0)), 4).alias("high_share")))


@q("a8_count_distinct",
   "SELECT event_type, count(DISTINCT user_id) AS users FROM events "
   "GROUP BY event_type",
   "A8 distinct cardinality (exact; approx variant in bench)")
def a8(spark, sf):
    return (load(spark, sf, "events").groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("users")))


@q("a9_extraction_metrics",
   "SELECT source, count(*) AS docs, ROUND(avg(n_chars), 4) AS avg_chars "
   "FROM documents GROUP BY source",
   "A9 per-partition metrics table shape")
def a9(spark, sf):
    return (load(spark, sf, "documents").groupBy("source")
            .agg(F.count(F.lit(1)).alias("docs"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars")))


@q("a10_rollup",
   "SELECT source, lang, count(*) AS cnt FROM documents "
   "GROUP BY ROLLUP(source, lang)",
   "grouping-sets family: ROLLUP")
def a10(spark, sf):
    return (load(spark, sf, "documents").rollup("source", "lang")
            .agg(F.count(F.lit(1)).alias("cnt")))


# --------------------------------------------------------------- windows (W)

@q("w1_sessionize_gaps_islands",
   "WITH flagged AS (SELECT user_id, ts, CASE WHEN ts - lag(ts) OVER "
   "(PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE "
   "OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
   "THEN 1 ELSE 0 END AS new_session FROM events) "
   "SELECT user_id, CAST(sum(new_session) AS BIGINT) AS sessions "
   "FROM flagged GROUP BY user_id",
   "W1 run-length line detection: gaps-and-islands sessionization")
def w1(spark, sf):
    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    new_s = F.when(
        lag_ts.isNull()
        | (F.col("ts") - lag_ts > F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    return (e.select("user_id", new_s.alias("new_session"))
            .groupBy("user_id")
            .agg(F.sum("new_session").alias("sessions")))


@q("w2_local_minima",
   "WITH s AS (SELECT user_id, sum(value) AS v FROM events GROUP BY user_id), "
   "w AS (SELECT user_id, v, lag(v) OVER (ORDER BY user_id) AS pv, "
   "lead(v) OVER (ORDER BY user_id) AS nv FROM s) "
   "SELECT user_id FROM w WHERE v < pv AND v < nv",
   "W2 peak finding: lag/lead local-minima detection")
def w2(spark, sf):
    e = load(spark, sf, "events")
    s = e.groupBy("user_id").agg(F.sum("value").alias("v"))
    w = Window.orderBy("user_id")
    cur = (s.withColumn("pv", F.lag("v").over(w))
           .withColumn("nv", F.lead("v").over(w)))
    return (cur.where((F.col("v") < F.col("pv"))
                      & (F.col("v") < F.col("nv")))
            .select("user_id"))


@q("w3_gradient_diff",
   "SELECT event_id, ROUND(value - lag(value) OVER "
   "(PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta FROM events",
   "W3 np.diff analog: lag arithmetic")
def w3(spark, sf):
    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"))


@q("w4_rank_per_group",
   "SELECT user_id, event_id FROM (SELECT user_id, event_id, row_number() "
   "OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
   "FROM events) WHERE rn <= 3",
   "W4 RTL ranking analog: row_number per partition, top-3")
def w4(spark, sf):
    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id"))
    return (e.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("user_id", "event_id"))


@q("w5_analytic_rebase",
   "SELECT event_id, ROUND(value - min(value) OVER "
   "(PARTITION BY user_id), 4) AS rebased FROM events",
   "W5 line-offset rebasing: analytic window over full partition")
def w5(spark, sf):
    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id")
    return e.select(
        "event_id",
        F.round(F.col("value") - F.min("value").over(w), 4).alias("rebased"))


@q("w6_tumbling_window_counts",
   "SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS win_start, count(*) AS cnt "
   "FROM events GROUP BY 1",
   "streaming-analog tumbling window aggregation (batch form)")
def w6(spark, sf):
    e = load(spark, sf, "events")
    return (e.groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("w.start").alias("win_start"), "cnt"))


# ---------------------------------------------------------- sorts/top-k (T)

@q("t3_global_topk",
   "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem "
   "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10",
   "T3 top-k widest segments: TakeOrderedAndProject")
def t3(spark, sf):
    return (load(spark, sf, "lineitem")
            .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
            .select("l_orderkey", "l_linenumber", "l_extendedprice")
            .limit(10))


@q("t4_bottomk",
   "SELECT event_id, value FROM events ORDER BY value ASC, event_id LIMIT 20",
   "T4 lowest-confidence chart: bottom-k")
def t4(spark, sf):
    return (load(spark, sf, "events")
            .orderBy(F.asc("value"), "event_id")
            .select("event_id", "value").limit(20))


# ------------------------------------------------------------- set ops (§2.7)

@q("set_except_resume_predicate",
   "SELECT c_custkey FROM customer EXCEPT SELECT o_custkey AS c_custkey "
   "FROM orders",
   "EXCEPT: urls-not-in-checkpoint resume predicate shape")
def set_except(spark, sf):
    c = load(spark, sf, "customer").select("c_custkey")
    o = load(spark, sf, "orders").select(
        F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o).distinct()


@q("set_intersect",
   "SELECT DISTINCT user_id FROM events WHERE event_type = 'click' "
   "INTERSECT SELECT DISTINCT user_id FROM events "
   "WHERE event_type = 'purchase'",
   "INTERSECT over derived sets")
def set_intersect(spark, sf):
    e = load(spark, sf, "events")
    a = e.where(F.col("event_type") == "click").select("user_id").distinct()
    b = e.where(F.col("event_type") == "purchase") \
         .select("user_id").distinct()
    return a.intersect(b)


@q("set_union",
   "SELECT DISTINCT user_id FROM events WHERE event_type = 'click' "
   "UNION SELECT DISTINCT o_custkey AS user_id FROM orders "
   "WHERE o_orderstatus = 'F'",
   "UNION (distinct) across heterogeneous sources")
def set_union(spark, sf):
    e = (load(spark, sf, "events")
         .where(F.col("event_type") == "click").select("user_id"))
    o = (load(spark, sf, "orders")
         .where(F.col("o_orderstatus") == "F")
         .select(F.col("o_custkey").alias("user_id")))
    return e.union(o).distinct()


# -------------------------------------------------- scalar functions (§2.8)

@q("f4_hash_bucketing",
   "SELECT CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 8 "
   "AS bucket, count(*) AS cnt FROM documents GROUP BY 1",
   "F4 url-hash bucketing (md5-based so DuckDB can mirror it; production "
   "uses xxhash64, ocr_spark.functions.bucketing)")
def f4(spark, sf):
    d = load(spark, sf, "documents")
    bucket = (F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
              .cast("long") % 8)
    return (d.groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))


@q("f8_json_extraction",
   "SELECT event_type, ROUND(avg(CAST(json_extract_string(props, '$.k') "
   "AS DOUBLE)), 4) AS avg_k FROM events GROUP BY event_type",
   "F8 JSON field plumbing (reference persists JSON result columns)")
def f8(spark, sf):
    e = load(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    return (e.groupBy("event_type")
            .agg(F.round(F.avg(k), 4).alias("avg_k")))


@q("f9_time_partition_pruning",
   "SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS cnt "
   "FROM events GROUP BY 1",
   "F9 warc_ts date bucketing: partition-pruning key shape (string-typed "
   "so Spark DATE vs DuckDB TIMESTAMP representations can't diverge)")
def f9(spark, sf):
    e = load(spark, sf, "events")
    return (e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .agg(F.count(F.lit(1)).alias("cnt")))


@q("f10_array_explode_topwords",
   "SELECT word, count(*) AS cnt FROM (SELECT unnest(string_split(text, ' ')) "
   "AS word FROM documents) WHERE word <> '' "
   "GROUP BY word ORDER BY cnt DESC, word LIMIT 50",
   "F10 array ops: split/explode/agg word counts")
def f10(spark, sf):
    d = load(spark, sf, "documents")
    return (d.select(F.explode(F.split("text", " ", -1)).alias("word"))
            .where(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), "word").limit(50))


@q("f1_string_reverse_concat",
   "SELECT doc_id, concat(lang, ':', reverse(substr(text, 1, 20))) AS tag "
   "FROM documents",
   "F1 string concat/reverse family")
def f1(spark, sf):
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.concat(F.col("lang"), F.lit(":"),
                 F.reverse(F.substring("text", 1, 20))).alias("tag"))


@q("f5_math_family",
   "SELECT event_id, ROUND(abs(value - 50.0), 4) AS dist, "
   "CAST(FLOOR(value / 10) AS BIGINT) AS decile, "
   "GREATEST(value, 10.0) AS clamped FROM events",
   "F5/F6 math + clamping family")
def f5(spark, sf):
    e = load(spark, sf, "events")
    return e.select(
        "event_id",
        F.round(F.abs(F.col("value") - 50.0), 4).alias("dist"),
        F.floor(F.col("value") / 10).cast("long").alias("decile"),
        F.greatest(F.col("value"), F.lit(10.0)).alias("clamped"))


@q("a2_vertical_profile",
   "SELECT event_type, ROUND(sum(value), 4) AS ink FROM events "
   "GROUP BY event_type",
   "A2 vertical projection profile: same hash-agg primitive as A1 on the "
   "other grouping axis")
def a2(spark, sf):
    e = load(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.round(F.sum("value"), 4).alias("ink"))


@q("t1_sort_rtl",
   "SELECT event_id, ts FROM events ORDER BY ts DESC, event_id LIMIT 50",
   "T1 ordering (RTL analog: descending sort) — TakeOrderedAndProject, "
   "no global sort")
def t1(spark, sf):
    e = load(spark, sf, "events")
    return (e.select("event_id", "ts")
            .orderBy(F.desc("ts"), "event_id").limit(50))


@q("t5_early_exit_probe",
   "SELECT count(*) AS found FROM "
   "(SELECT 1 FROM events WHERE value > 99.9 LIMIT 1)",
   "T5 early exit: LIMIT 1 existence probe (CollectLimit short-circuits "
   "the scan)")
def t5(spark, sf):
    e = load(spark, sf, "events")
    probe = e.where(F.col("value") > 99.9).select(F.lit(1)).limit(1)
    return probe.agg(F.count(F.lit(1)).alias("found"))


@q("f2_trim_empty_tests",
   "SELECT doc_id, length(trim(text)) AS n FROM documents "
   "WHERE length(trim(text)) > 0",
   "F2 trim/length emptiness predicate")
def f2(spark, sf):
    d = load(spark, sf, "documents")
    n = F.length(F.trim(F.col("text")))
    return d.select("doc_id", n.alias("n")).where(F.col("n") > 0)


@q("f3_substring_membership",
   "SELECT doc_id, CAST(contains(text, 'data') AS INT) AS has_marker "
   "FROM documents",
   "F3 substring membership predicate")
def f3(spark, sf):
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.col("text").contains("data").cast("int").alias("has_marker"))


@q("f6_clamp",
   "SELECT event_id, ROUND(GREATEST(5.0, LEAST(95.0, value)), 4) "
   "AS clamped FROM events",
   "F6 clamping: greatest(lo, least(hi, x)) — the pad-clamp analog")
def f6(spark, sf):
    e = load(spark, sf, "events")
    return e.select(
        "event_id",
        F.round(F.greatest(F.lit(5.0), F.least(F.lit(95.0), F.col("value"))),
                4).alias("clamped"))


@q("f7_normalize",
   "SELECT event_id, ROUND(value / 255.0, 6) AS norm FROM events",
   "F7 normalization arithmetic (img/255 analog)")
def f7(spark, sf):
    e = load(spark, sf, "events")
    return e.select(
        "event_id", F.round(F.col("value") / 255.0, 6).alias("norm"))


@q("j8_asof_join",
   "WITH clicks AS (SELECT user_id, ts, ROUND(max(value), 4) AS value "
   "FROM events WHERE event_type = 'click' GROUP BY user_id, ts), "
   "purch AS (SELECT user_id, ts, event_id FROM events "
   "WHERE event_type = 'purchase') "
   "SELECT p.event_id, p.user_id, c.value AS last_click_value "
   "FROM purch p ASOF LEFT JOIN clicks c "
   "ON p.user_id = c.user_id AND p.ts >= c.ts",
   "as-of (point-in-time) join: latest prior click value per purchase — "
   "union-tag + last(ignorenulls) window, ONE shuffle on the key, no "
   "per-row probe join (operators/asof.py); DuckDB native ASOF JOIN "
   "oracle")
def j8(spark, sf):
    from ocr_spark.operators.asof import asof_join

    e = load(spark, sf, "events")
    clicks = (e.where(F.col("event_type") == "click")
              .groupBy("user_id", "ts")
              .agg(F.round(F.max("value"), 4).alias("value")))
    purch = (e.where(F.col("event_type") == "purchase")
             .select("user_id", "ts", "event_id"))
    out = asof_join(purch, clicks, keys=["user_id"], ts_col="ts",
                    value_cols=["value"], prefix="")
    return out.select("event_id", "user_id",
                      F.col("value").alias("last_click_value"))


@q("j7_levenshtein_alignment",
   "SELECT doc_id, CAST(levenshtein(substr(text, 1, 40), "
   "replace(substr(text, 1, 40), 'e', '')) AS INT) AS edit_dist, "
   "CAST(length(substr(text, 1, 40)) AS INT) AS expected_len "
   "FROM documents",
   "J4 alignment metric promised by SURVEY: per-doc edit distance between "
   "expected text and a found-with-missing-chars variant (reference "
   "analog: verify_characters char mapping, /root/reference/overflow/"
   "segment_according_to_sentence.py:203-236). levenshtein() is a narrow "
   "JVM-side expression — per-doc cost only, no shuffle.")
def j7(spark, sf):
    d = load(spark, sf, "documents")
    expected = F.substring("text", 1, 40)
    found = F.expr("replace(substring(text, 1, 40), 'e', '')")
    return d.select(
        "doc_id",
        F.levenshtein(expected, found).cast("int").alias("edit_dist"),
        F.length(expected).cast("int").alias("expected_len"))


@q("s10_stratified_split",
   "SELECT lang, CASE WHEN "
   "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) "
   "% 10 < 8 THEN 'train' ELSE 'eval' END AS split, count(*) AS cnt "
   "FROM documents GROUP BY lang, split",
   "SURVEY §3.3 stratified train/eval split (reference analog: "
   "train_test_split(stratify=labels), /root/reference/"
   "hebrew-ocr-cnn.py:102-110). Deterministic hash split so the oracle "
   "can mirror it value-for-value; the seeded-random variant "
   "(df.sampleBy) is exercised in tests/test_operators.py.")
def s10(spark, sf):
    from ocr_spark.operators.hashing import md5long
    d = load(spark, sf, "documents")
    split = F.when(
        md5long(F.col("doc_id").cast("string")) % 10 < 8, "train"
    ).otherwise("eval")
    return (d.select("lang", split.alias("split"))
            .groupBy("lang", "split").agg(F.count(F.lit(1)).alias("cnt")))


@q("a8_approx_count_distinct",
   "SELECT event_type, count(DISTINCT user_id) AS users_exact, "
   "TRUE AS approx_ok FROM events GROUP BY event_type",
   "A8 approx variant: HyperLogLog++ sketches differ engine-to-engine, so "
   "the verifiable contract is the ACCURACY BOUND — approx within 10% of "
   "exact (rsd=0.02 => typical error ~2%) — which the oracle states as a "
   "constant. At 10^12 rows approx replaces the exact distinct's full "
   "shuffle of user ids with fixed-size mergeable sketches.")
def a8_approx(spark, sf):
    e = load(spark, sf, "events")
    agg = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"))
    ok = (F.abs(F.col("_approx") - F.col("users_exact"))
          / F.col("users_exact") <= 0.1)
    return agg.select("event_type", "users_exact", ok.alias("approx_ok"))


@q("w6_greedy_overlap_accept", None,
   "W6 greedy overlap acceptance: order-dependent sequential per-group "
   "scan via applyInPandas — not SQL-expressible (accepted set feeds back "
   "into later decisions); driver does rows-only, pytest compares against "
   "the pure-pandas oracle exactly")
def w6(spark, sf):
    from ocr_spark.operators.grouped import greedy_overlap_accept
    return greedy_overlap_accept(load(spark, sf, "events"))
