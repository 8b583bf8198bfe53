"""Relational driver queries — the reference's query patterns over the
TPC-H-ish tables (SURVEY.md §2.3-2.6 mappings).

Each is the Spark-native primitive a reference operator maps to: min/max
envelope aggregation (BoundingBox), reading-order windows (iterate_level),
lag/lead boundary predicates (IsAtBeginningOf), predicate-pushdown region
filters (SetRectangle), best-first top-k (ChoiceIterator), broadcast
dimension joins (corpus joins), rollup corpus analytics, and the batch
equivalent of the streaming windowed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .registry import ensure_utc

    return ensure_utc(spark).read.parquet(f"{sf_dir}/{name}.parquet")


@query(
    "q1_flagship_agg",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(floor(sum(l_quantity)) AS BIGINT) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS n
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus""",
)
def q1_flagship_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GetUTF8Text-style fold as a relational aggregate (TPC-H Q1 shape):
    map-side partial agg + 2-col hash agg; filter pushed to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("n"),
        )
    )


@query(
    "bbox_envelope",
    oracle="""
SELECT l_orderkey,
       CAST(floor(min(l_quantity)) AS BIGINT) AS x0,
       round(min(l_extendedprice), 2) AS y0,
       CAST(floor(max(l_quantity)) AS BIGINT) AS x1,
       round(max(l_extendedprice), 2) AS y1,
       count(*) AS n_children
FROM lineitem GROUP BY l_orderkey""",
)
def bbox_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-envelope aggregation (BoundingBox of a parent = min/max over
    children, tesserocr/tesserocr.pyx:586-608) as a classic hash agg."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.min("l_quantity").cast("bigint").alias("x0"),
            F.round(F.min("l_extendedprice"), 2).alias("y0"),
            F.max("l_quantity").cast("bigint").alias("x1"),
            F.round(F.max("l_extendedprice"), 2).alias("y1"),
            F.count("*").alias("n_children"),
        )
    )


@query(
    "reading_order",
    oracle="""
SELECT user_id, event_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT) AS pos
FROM events""",
)
def reading_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """iterate_level (tesserocr/tesserocr.pyx:1173-1183): reading-order
    position via row_number over a per-document (here per-user) window."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", (F.row_number().over(w) - 1).cast("bigint").alias("pos"))
    )


@query(
    "boundary_flags",
    oracle="""
SELECT user_id, event_id,
       (lag(event_type) OVER w IS NULL OR lag(event_type) OVER w <> event_type) AS is_at_beginning,
       lead(event_type) OVER w IS NULL AS is_at_final
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)
def boundary_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IsAtBeginningOf / IsAtFinalElement (tesserocr/tesserocr.pyx:518-568):
    lag/lead over the reading-order window."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        (
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type"))
        ).alias("is_at_beginning"),
        F.lead("event_type").over(w).isNull().alias("is_at_final"),
    )


@query(
    "region_filter",
    oracle="""
SELECT l_orderkey, l_partkey, CAST(floor(l_quantity) AS BIGINT) AS qty, l_extendedprice AS price
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20 AND l_shipdate < DATE '1995-01-01'""",
)
def region_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SetRectangle (tesserocr/tesserocr.pyx:1835-1847) as a range predicate —
    pushed down to the parquet scan (PushedFilters visible in .explain)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("date"))
        )
        .select(
            "l_orderkey",
            "l_partkey",
            F.col("l_quantity").cast("bigint").alias("qty"),
            F.col("l_extendedprice").alias("price"),
        )
    )


@query(
    "top_k_choices",
    oracle="""
SELECT p_brand, rank, p_partkey, p_retailprice
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         CAST(row_number() OVER (PARTITION BY p_brand
                                 ORDER BY p_retailprice DESC, p_partkey) AS INT) AS rank
  FROM part
) WHERE rank <= 3""",
)
def top_k_choices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChoiceIterator best-first top-k (tesserocr/tesserocr.pyx:1122-1163):
    rank within group, keep k best."""
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        _t(spark, sf_dir, "part")
        .select("p_brand", "p_partkey", "p_retailprice",
                F.row_number().over(w).cast("int").alias("rank"))
        .filter(F.col("rank") <= 3)
        .select("p_brand", "rank", "p_partkey", "p_retailprice")
    )


@query(
    "revenue_by_nation",
    oracle="""
SELECT r_name, n_name,
       round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name""",
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-style dimension join (SURVEY.md §2.3): fact ⋈ broadcast dims —
    nation/region/customer are broadcast, no shuffle for the small sides."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "rollup_lang_source",
    oracle="""
SELECT coalesce(lang, 'ALL') AS lang,
       coalesce(source, 'ALL') AS source,
       count(*) AS n,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY ROLLUP (lang, source)""",
)
def rollup_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus analytics rollup (free in Spark; absent in the reference —
    SURVEY.md §2.4 'distinct/rollup' row)."""
    return (
        _t(spark, sf_dir, "documents")
        .rollup("lang", "source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").cast("bigint").alias("chars"))
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            F.coalesce("source", F.lit("ALL")).alias("source"),
            "n",
            "chars",
        )
    )


@query(
    "events_windowed",
    oracle="""
SELECT date_trunc('hour', ts) AS win, event_type,
       count(*) AS n, round(sum(value), 4) AS v
FROM events GROUP BY 1, 2""",
)
def events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation — the batch twin of the Structured
    Streaming ingest path (streaming.py); equality with this query is the
    streaming correctness test."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v"))
    )


@query(
    "events_sessionized",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id,
       event_id
FROM flagged""",
)
def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gap > 30 min): lag + running sum — the stateful
    streaming pattern expressed as batch windows."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _t(spark, sf_dir, "events")
    # parquet ts is TIMESTAMP_NTZ; session TZ pinned UTC ⇒ epoch matches DuckDB
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    flagged = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return flagged.select(
        "user_id",
        F.sum("is_new").over(running).cast("bigint").alias("session_id"),
        "event_id",
    )


@query(
    "distinct_users_by_type",
    oracle="""
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type""",
)
def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (SURVEY §2.4 'distinct' row — absent in
    the reference, free in Spark): expand-style distinct agg."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "cube_flag_status",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       count(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (SURVEY §2.4 'grouping sets/cube' row)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "n",
        )
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "pivot_event_counts",
    oracle="""
SELECT user_id,
       """ + ",\n       ".join(
        f"count(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in _EVENT_TYPES
    ) + """
FROM events GROUP BY user_id""",
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide per-level stats — the 'region lists as columns' shape):
    one column per event type, Catalyst rewrites to conditional aggs."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
        .na.fill(0)
    )


@query(
    "unpivot_doc_stats",
    oracle="""
SELECT doc_id, 'n_chars' AS stat, CAST(n_chars AS BIGINT) AS value FROM documents
UNION ALL
SELECT doc_id, 'n_words', CAST(len(string_split(trim(text), ' ')) AS BIGINT) FROM documents""",
)
def unpivot_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (stack): wide per-document stats to long (stat, value) rows."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.when(
            F.col("text").isNotNull(),
            F.size(F.split(F.trim("text"), " ")),
        ).cast("bigint").alias("n_words"),  # NULL text -> NULL (legacy size(NULL)=-1 would diverge from the oracle)
    )
    return d.selectExpr(
        "doc_id",
        "stack(2, 'n_chars', n_chars, 'n_words', n_words) AS (stat, value)",
    )


@query(
    "empty_level_predicate",
    oracle="""
SELECT o_orderkey, TRUE AS empty
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)""",
)
def empty_level_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty(level) anti-existence predicate (tesserocr/tesserocr.pyx:628-637)
    → anti-join: orders with no lineitems."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_anti")
        .select("o_orderkey", F.lit(True).alias("empty"))
    )


@query(
    "events_asof_view",
    oracle="""
SELECT c.event_id,
       v.ts AS asof_view_ts,
       CAST(floor(epoch(c.ts)) - floor(epoch(v.ts)) AS BIGINT) AS gap_s
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND v.ts <= c.ts""",
)
def events_asof_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (a reference-absent operator Spark also lacks natively):
    each click matched to the latest view of the same user at-or-before it.

    Spark-first composition: tag views and clicks in ONE pass, window over
    (user_id, ts) with last(view_ts, ignorenulls) — a single shuffle keyed
    by user_id, no inequality join, no cross product. At 100 TB this is the
    only as-of shape that scales: the naive t1 <= t2 join is quadratic per
    user, this is O(n log n) per partition. Views sort before clicks at an
    equal ts so the ASOF ``<=`` bound is honored."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    is_view = (F.col("event_type") == "view").cast("int")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", (1 - is_view), "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = ev.withColumn(
        "view_ts", F.when(F.col("event_type") == "view", F.col("ts"))
    ).withColumn("asof_view_ts", F.last("view_ts", ignorenulls=True).over(w))
    return tagged.filter(F.col("event_type") == "click").select(
        "event_id",
        "asof_view_ts",
        (F.col("ts").cast("timestamp").cast("long")
         - F.col("asof_view_ts").cast("timestamp").cast("long"))
        .cast("bigint").alias("gap_s"),
    )


@query(
    "events_range_join",
    oracle="""
SELECT e.event_id, count(c.event_id) AS n_clicks
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = e.user_id
 AND c.ts >= e.ts - INTERVAL 300 SECOND AND c.ts <= e.ts
GROUP BY e.event_id""",
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via band bucketing: clicks within the 5 minutes before
    each error, same user.

    Scale shape: each click is posted to its 300 s bucket and the next one
    (narrow explode, 2x), then an EQUI-join on (user_id, bucket) + residual
    range filter — candidate pairs are bounded by bucket width instead of
    the per-user cross product a raw inequality join would plan (BNLJ)."""
    ev = _t(spark, sf_dir, "events")
    sec = F.col("ts").cast("timestamp").cast("double")
    bucket = F.floor(sec / 300).cast("long")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", bucket.alias("b")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_id"), "user_id",
            F.col("ts").alias("c_ts"),
            F.explode(F.array(bucket, bucket + 1)).alias("b"),
        )
    )
    matched = (
        errors.join(clicks, ["user_id", "b"])
        .filter(
            (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 300 SECONDS"))
            & (F.col("c_ts") <= F.col("ts"))
        )
        .groupBy("event_id")
        .agg(F.count("*").alias("n"))
    )
    return errors.select("event_id").join(matched, "event_id", "left").select(
        "event_id", F.coalesce("n", F.lit(0)).alias("n_clicks")
    )


@query(
    "event_value_percentiles",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type""",
)
def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group (reference-absent analytics;
    SURVEY §2.4 'approximate aggregates' row). Exact ``percentile`` keeps
    the oracle bit-comparable; the 100 TB variant swaps in
    ``percentile_approx`` (t-digest, mergeable map-side) with zero query
    changes."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        )
    )


@query(
    "orders_with_lineitems_semi",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)""",
)
def orders_with_lineitems_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence predicate as a left-semi join — the positive twin of
    Empty(level)'s anti-join; plans as one shuffle with the probe side
    deduplicated map-side."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "grouping_sets_revenue",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice), 2) AS revenue,
       CAST(grouping(l_returnflag) AS INT) AS g_flag,
       CAST(grouping(l_linestatus) AS INT) AS g_status
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube specialize):
    one Expand node feeding a single hash agg — cheaper than unioning three
    separate aggregations at corpus scale."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice), 2) AS revenue,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """)
