"""Beyond-parity extensions: joins, set operations, window analytics.

The reference supports none of these (SURVEY.md §2.3 no joins, §2.7 no set
ops, §2.8 no window functions — "Query cannot span across multiple tables",
README.md:27). On Spark they are native, so the engine exposes them as
extensions; each query documents the physical strategy that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.suite.registry import query
from realtime_olap_spark.suite.sqlgen import OSUM


@query("ext_join_broadcast", f"""
SELECT c.c_mktsegment AS mktsegment,
       COUNT(*) AS n_lineitems,
       {OSUM('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY mktsegment
""")
def ext_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dim join chain (TPC-H Q3 shape): revenue by market segment.

    Scale strategy: ``broadcast(customer)`` and ``broadcast(orders→dim
    projection)`` when they fit (dims ≪ fact at 100 TB; customer does,
    orders may not — Catalyst/AQE falls back to shuffled hash join above
    the threshold, which is exactly the right behavior). The fact table is
    never shuffled for broadcast sides; aggregation is partial→final."""
    c = Catalog(spark, sf_dir)
    li, orders, cust = c.table("lineitem"), c.table("orders"), c.table("customer")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,10)")
    return (li
            .join(orders.select("o_orderkey", "o_custkey"),
                  li["l_orderkey"] == F.col("o_orderkey"))
            .join(F.broadcast(cust.select("c_custkey", "c_mktsegment")),
                  F.col("o_custkey") == F.col("c_custkey"))
            .groupBy(F.col("c_mktsegment").alias("mktsegment"))
            .agg(F.count(F.lit(1)).alias("n_lineitems"),
                 F.sum(rev).cast("double").alias("revenue"))
            .orderBy("mktsegment"))


@query("ext_join_star", f"""
SELECT n.n_name AS nation,
       {OSUM('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'AMERICA'
GROUP BY nation
ORDER BY revenue DESC, nation ASC
""")
def ext_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join through the dimension snowflake (TPC-H Q5 shape).

    All three dims broadcast (region/nation/supplier are tiny at any SF);
    the region filter prunes before the broadcast, so the fact scan is the
    only large input and it is never exchanged."""
    c = Catalog(spark, sf_dir)
    li = c.table("lineitem")
    sup = c.table("supplier").select("s_suppkey", "s_nationkey")
    nat = c.table("nation").select("n_nationkey", "n_regionkey", "n_name")
    reg = c.table("region").where(F.col("r_name") == "AMERICA") \
                           .select("r_regionkey")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,10)")
    return (li
            .join(F.broadcast(sup), li["l_suppkey"] == F.col("s_suppkey"))
            .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.sum(rev).cast("double").alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("nation").asc()))


@query("ext_setop_intersect", """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY o_custkey
""")
def ext_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation (INTERSECT): customers with both finished and open
    orders. One shuffle on the key; both branches share the scan
    (Catalyst reuses the exchange)."""
    o = Catalog(spark, sf_dir).table("orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op).orderBy("o_custkey")


@query("ext_window_running", f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, {OSUM('value')} AS day_value
  FROM events GROUP BY day),
old AS (
  SELECT 'daily' AS marker, CAST(day AS TIMESTAMP) AS bucket, day_value,
         CAST(CAST(SUM(CAST(CAST(day_value AS VARCHAR) AS DECIMAL(38,10)))
                   OVER (ORDER BY day) AS VARCHAR) AS DOUBLE) AS running_value,
         CAST(NULL AS VARCHAR) AS event_type, CAST(NULL AS BIGINT) AS n,
         CAST(NULL AS BIGINT) AS running_n, CAST(NULL AS BIGINT) AS is_filled
  FROM daily),
hb AS (
  SELECT event_type,
         make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS bucket,
         COUNT(*) AS n_obs
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM hb GROUP BY 1),
grid AS (
  SELECT event_type, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds),
filled AS (
  SELECT g.event_type, g.bucket,
         last_value(hb.n_obs IGNORE NULLS)
           OVER (PARTITION BY g.event_type ORDER BY g.bucket) AS n,
         CAST(hb.n_obs IS NULL AS BIGINT) AS is_filled
  FROM grid g LEFT JOIN hb USING (event_type, bucket))
SELECT * FROM old
UNION ALL
SELECT 'hourly_gapfill' AS marker, bucket, CAST(NULL AS DOUBLE) AS day_value,
       CAST(NULL AS DOUBLE) AS running_value, event_type, n,
       CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY bucket) AS BIGINT)
         AS running_n,
       is_filled
FROM filled
""")
def ext_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window analytics, marker union of two branches:

    - ``daily``: daily totals + running cumulative sum (the original
      query, unchanged). The window sums DECIMAL partials (associative →
      deterministic at any parallelism); unbounded-preceding frames
      scale because days, not raw events, enter the window after the
      pre-aggregation.
    - ``hourly_gapfill``: hourly per-type counts densified by the
      zero-join gapfill emit shape (``operators/gapfill.gapfill``, LOCF)
      + a per-type running sum over the FILLED series — the r7 gapfill
      operator under the oracle hash (the DuckDB twin rebuilds the grid
      independently via generate_series + IGNORE-NULLS windows).

    Integer counts and decimal-routed doubles keep both branches
    hash-exact cross-engine."""
    from realtime_olap_spark.operators.gapfill import gapfill, time_bucket
    ev = Catalog(spark, sf_dir).table("events")
    # ONE corpus scan feeds both branches (r17; the r16 shape scanned
    # events once per branch): the (event_type, hour) cells carry the
    # hourly counts AND per-cell decimal value sums, and the daily
    # branch rolls cells up to days — decimal(38,10) addition is
    # associative/exact, so sum-of-cell-sums is bit-identical to the
    # direct per-day sum (the dsum contract), and cast(hour_bucket AS
    # DATE) == cast(ts AS DATE) whenever the session timezone offset is
    # whole-hour aligned (UTC is pinned at both engine entry points —
    # __spark_entry__ and session.get_spark; a fractional-offset session
    # like +05:30 driving this suite function DIRECTLY would land
    # boundary events on the wrong day, the same class of session-TZ
    # dependence the pinned entry points exist to rule out). The tiny
    # cell frame is localCheckpoint'd (lazy) so branch-B column pruning
    # cannot split the two consumers back into two scans.
    hb_all = time_bucket(
        ev, "ts", 3600, ["event_type"],
        [F.count(F.lit(1)).alias("n_obs"),
         F.sum(F.col("value").cast("decimal(38,10)")).alias("__dec")]
    ).localCheckpoint(eager=False)
    daily = (hb_all.groupBy(F.col("bucket").cast("date").alias("day"))
             .agg(F.sum("__dec").alias("dec_value")))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    old = daily.select(
        F.lit("daily").alias("marker"),
        F.col("day").cast("timestamp").alias("bucket"),
        F.col("dec_value").cast("double").alias("day_value"),
        F.sum("dec_value").over(w).cast("double").alias("running_value"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("long").alias("n"),
        F.lit(None).cast("long").alias("running_n"),
        F.lit(None).cast("long").alias("is_filled"))
    hb = hb_all.drop("__dec")
    filled = gapfill(hb, "bucket", ["event_type"], ["n_obs"], 3600,
                     how="locf")
    wrun = (Window.partitionBy("event_type").orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0))
    new = filled.select(
        F.lit("hourly_gapfill").alias("marker"), "bucket",
        F.lit(None).cast("double").alias("day_value"),
        F.lit(None).cast("double").alias("running_value"),
        "event_type",
        F.col("n_obs").alias("n"),
        F.sum("n_obs").over(wrun).alias("running_n"),
        F.col("is_filled").cast("long").alias("is_filled"))
    return old.unionByName(new).orderBy("marker", "event_type", "bucket")


@query("ext_sessionize", """
WITH t AS (
  SELECT user_id, ts, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events),
s AS (
  SELECT user_id, ts, us,
         CAST(SUM(CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM t)
, sess AS (
  SELECT 'session' AS marker, user_id, session_id AS idx,
         MIN(ts) AS ts_a, MAX(ts) AS ts_b,
         COUNT(*) AS n,
         CAST(MAX(us) - MIN(us) AS DOUBLE) AS val
  FROM s GROUP BY user_id, session_id)
, fe AS (
  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
  WHERE event_type IN ('signup','view','click','purchase'))
, fg AS (
  SELECT user_id,
    list_sort(list(us) FILTER (WHERE event_type='signup'))   AS a0,
    list_sort(list(us) FILTER (WHERE event_type='view'))     AS a1,
    list_sort(list(us) FILTER (WHERE event_type='click'))    AS a2,
    list_sort(list(us) FILTER (WHERE event_type='purchase')) AS a3
  FROM fe GROUP BY 1)
, fm1 AS (SELECT user_id, a1, a2, a3, a0[1] AS t_1 FROM fg)
, fm2 AS (SELECT user_id, a2, a3, t_1,
                 (list_filter(a1, x -> x > t_1))[1] AS t_2 FROM fm1)
, fm3 AS (SELECT user_id, a3, t_1, t_2,
                 (list_filter(a2, x -> x > t_2))[1] AS t_3 FROM fm2)
, fm4 AS (SELECT user_id, t_1, t_2, t_3,
                 (list_filter(a3, x -> x > t_3))[1] AS t_4 FROM fm3
          WHERE t_1 IS NOT NULL)
, fm AS (
  SELECT user_id, t_1, t_2, t_3, t_4,
         CASE WHEN t_4 IS NOT NULL THEN 4 WHEN t_3 IS NOT NULL THEN 3
              WHEN t_2 IS NOT NULL THEN 2 ELSE 1 END AS max_step
  FROM fm4)
, funnel AS (
  SELECT 'funnel' AS marker, user_id, u.step AS idx,
         make_timestamp(u.t) AS ts_a, CAST(NULL AS TIMESTAMP) AS ts_b,
         CAST(max_step AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS val
  FROM fm, LATERAL (
    SELECT 1 AS step, t_1 AS t UNION ALL SELECT 2, t_2
    UNION ALL SELECT 3, t_3 UNION ALL SELECT 4, t_4) u
  WHERE u.t IS NOT NULL)
, rb AS (
  SELECT user_id, epoch_us(ts) - (epoch_us(ts) % 604800000000) AS b_us
  FROM events)
, rfu AS (SELECT user_id, MIN(b_us) AS cohort_us FROM rb GROUP BY 1)
, ract AS (SELECT DISTINCT user_id, b_us FROM rb)
, rtall AS (
  SELECT cohort_us, (a.b_us - cohort_us) // 604800000000 AS off,
         COUNT(*) AS n_users
  FROM ract a JOIN rfu USING (user_id) GROUP BY 1, 2)
, retention AS (
  SELECT 'retention' AS marker, CAST(NULL AS BIGINT) AS user_id,
         off AS idx, make_timestamp(cohort_us) AS ts_a,
         CAST(NULL AS TIMESTAMP) AS ts_b, n_users AS n,
         n_users / MAX(CASE WHEN off = 0 THEN n_users END)
                     OVER (PARTITION BY cohort_us) AS val
  FROM rtall)
SELECT * FROM sess
UNION ALL SELECT * FROM funnel
UNION ALL SELECT * FROM retention
""")
def ext_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral analytics over events, marker union of three branches
    (each an r7 first-class operator under the oracle hash):

    - ``session``: 30-min inactivity-gap sessionization (the original
      query, unchanged mapping: idx=session_id, ts_a/ts_b=start/end,
      n=n_events, val=duration_us). lag + running-sum windows sharing
      ONE user_id shuffle.
    - ``funnel``: 4-step ordered funnel (``operators/funnel.py``),
      unpivoted tall — one row per user per matched step (idx=step,
      ts_a=matched time, n=max_step). Single user shuffle + HOF fold;
      the oracle mirrors the list algebra independently.
    - ``retention``: weekly first-activity cohorts
      (``operators/retention.py``; idx=offset, ts_a=cohort, n=n_users,
      val=retention ratio). Join-free single user shuffle.

    All three branches share the events scan; integer times (epoch
    micros) and int/int ratio divisions keep every value hash-exact
    cross-engine."""
    from realtime_olap_spark.operators.funnel import funnel_match
    from realtime_olap_spark.operators.retention import cohort_retention
    from realtime_olap_spark.operators.sessions import sessionize
    ev = Catalog(spark, sf_dir).table("events")
    sess = (sessionize(ev, "user_id", "ts", gap_minutes=30)
            .select(F.lit("session").alias("marker"), "user_id",
                    F.col("session_id").alias("idx"),
                    F.col("session_start").alias("ts_a"),
                    F.col("session_end").alias("ts_b"),
                    F.col("n_events").alias("n"),
                    F.col("duration_us").cast("double").alias("val")))
    m = funnel_match(ev, ["signup", "view", "click", "purchase"])
    funnel = (m.select(F.col("user").alias("user_id"), "max_step",
                       F.expr("stack(4, 1L, t_1, 2L, t_2, 3L, t_3, 4L, t_4)")
                       .alias("idx", "t"))
              .where(F.col("t").isNotNull())
              .select(F.lit("funnel").alias("marker"), "user_id", "idx",
                      F.timestamp_micros(F.col("t")).alias("ts_a"),
                      F.lit(None).cast("timestamp").alias("ts_b"),
                      F.col("max_step").cast("long").alias("n"),
                      F.lit(None).cast("double").alias("val")))
    ret = (cohort_retention(ev, bucket_seconds=7 * 86400)
           .select(F.lit("retention").alias("marker"),
                   F.lit(None).cast("long").alias("user_id"),
                   F.col("offset").alias("idx"),
                   F.col("cohort").alias("ts_a"),
                   F.lit(None).cast("timestamp").alias("ts_b"),
                   F.col("n_users").alias("n"),
                   F.col("retention").alias("val")))
    return (sess.unionByName(funnel).unionByName(ret)
            .orderBy("marker", "user_id", "idx", "ts_a"))


@query("ext_json_ingest", """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""")
def ext_json_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time JSON column derivation (ExpressionTransformer analog —
    the reference evaluates reflection UDFs per record at ingest,
    FunctionExpressionEvaluator.java:45; here it is a scan-side
    get_json_object that codegen inlines) + integer-exact aggregation."""
    ev = Catalog(spark, sf_dir).table("events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(k).alias("sum_k"),
                 F.max(k).alias("max_k"))
            .orderBy("event_type"))


def gapfill_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only gapfill: hourly per-type value curve densified with
    linear interpolation — the zero-join emit shape
    (``operators/gapfill.gapfill``) end-to-end at bench SF."""
    from realtime_olap_spark.operators.gapfill import gapfill, time_bucket  # noqa: PLC0415
    ev = Catalog(spark, sf_dir).table("events")
    b = time_bucket(ev, "ts", 3600, ["event_type"],
                    [F.avg("value").alias("v"),
                     F.count(F.lit(1)).cast("double").alias("n")])
    return gapfill(b, "bucket", ["event_type"], ["v", "n"], 3600,
                   how="linear")


def funnel_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only funnel: 4-step windowed funnel over the events table —
    one user_id shuffle + HOF fold (``operators/funnel.funnel_match``)
    plus the per-step conversion aggregate."""
    from realtime_olap_spark.operators.funnel import funnel_counts  # noqa: PLC0415
    ev = Catalog(spark, sf_dir).table("events")
    return funnel_counts(ev, ["signup", "view", "click", "purchase"],
                         window_seconds=7 * 24 * 3600)
