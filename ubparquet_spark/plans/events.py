"""Event-time analytics over the ``events`` table.

The reference has no streaming operators (SURVEY.md §2.8) — these plans
define the engine's event-time surface on the driver's designated streaming
table: tumbling/sliding windows, session windows with gap semantics, JSON
property extraction, mode/majority-vote per key (A3,
``voxel_to_instance_data.py:63``) and 2-D voxelization-style binning (A5,
``dlmerged2parquet.py:72-77``) re-expressed over (value, hour) space.

Batch plans here share semantics with ``ubparquet_spark.streaming`` — the
same window specs run under Structured Streaming with watermarks; the batch
results below are the ``Trigger.AvailableNow`` ground truth.

Scale notes: all aggregations are partial-aggregatable group-bys keyed by
(window, type) or user — they map-side combine and shuffle only the digest.
Session windows shuffle by user_id once; skewed users are handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ubparquet_spark.io import load_table
from ubparquet_spark.operators.segmented import DAY_US, segmented_lead
from ubparquet_spark.plans.tpch import cents, roundn, sql_roundn, sum_money


# ---------------------------------------------------------------------------
# Tumbling window (1 hour)
# ---------------------------------------------------------------------------

def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_money("value").alias("sum_value"),
            roundn(sum_money("value") / F.count(F.lit(1))).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


Q_EVENTS_HOURLY_SQL = """
SELECT
  date_trunc('hour', ts) AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
  FLOOR((CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_value
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Sliding window (2 hours, sliding 1 hour) — each event lands in 2 windows
# ---------------------------------------------------------------------------

def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_money("value").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


Q_EVENTS_SLIDING_SQL = """
SELECT
  date_trunc('hour', ts) - (off * INTERVAL 1 HOUR) AS window_start,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
CROSS JOIN (SELECT UNNEST([0, 1]) AS off)
WHERE ts IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Session windows (30-minute gap). Spark merges events while
# next_ts - prev_ts <= gap (a new session starts only when the gap is
# STRICTLY exceeded — the strict-gap `>` split encoded in the SQL
# oracles); session_end = last_ts + gap.
# ---------------------------------------------------------------------------

def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_money("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


Q_EVENTS_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value, event_id,
    -- strictly greater: session_window MERGES an event exactly gap
    -- after the previous one (verified empirically; end bound is the
    -- last event + gap, so equality is within the window)
    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WHERE user_id < 100 AND ts IS NOT NULL
), numbered AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS sess_id
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM numbered
GROUP BY user_id, sess_id
"""


# ---------------------------------------------------------------------------
# JSON property extraction (props is a JSON string column)
# ---------------------------------------------------------------------------

def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            roundn(F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


Q_EVENTS_JSON_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       FLOOR((CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Mode / majority vote per key (A3) — deterministic tie-break
# ---------------------------------------------------------------------------

def q_events_user_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    total = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    top = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_event_type"))
    )
    return total.join(top, "user_id").select(
        "user_id", "mode_event_type", "n_events"
    )


Q_EVENTS_USER_MODE_SQL = """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
), ranked AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rn
  FROM counts
), totals AS (
  SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
)
SELECT t.user_id, r.event_type AS mode_event_type, t.n_events
FROM totals t JOIN ranked r ON t.user_id = r.user_id AND r.rn = 1
"""


# ---------------------------------------------------------------------------
# 2-D voxelization-style binning (A5): bin (value, hour-of-day) cells with
# count + exact feature sum + majority label — the reference voxelizer's
# groupBy(floor(coord/size)) + feature agg + mode label, on events space.
# ---------------------------------------------------------------------------

def q_events_voxelize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.floor(F.col("value") / F.lit(5.0)).alias("vbin"),
        F.hour("ts").alias("hbin"),
        "event_type",
        "value",
    )
    cells = ev.groupBy("vbin", "hbin").agg(
        F.count(F.lit(1)).alias("n"),
        sum_money("value").alias("sum_value"),
    )
    label_counts = ev.groupBy("vbin", "hbin", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("vbin", "hbin").orderBy(
        F.desc("cnt"), F.asc("event_type")
    )
    labels = (
        label_counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vbin", "hbin", F.col("event_type").alias("mode_type"))
    )
    return cells.join(labels, ["vbin", "hbin"])


Q_EVENTS_VOXELIZE_SQL = """
WITH pts AS (
  SELECT CAST(FLOOR(value / 5.0) AS BIGINT) AS vbin,
         EXTRACT(hour FROM ts) AS hbin,
         event_type, value
  FROM events
), cells AS (
  SELECT vbin, hbin, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
  FROM pts GROUP BY vbin, hbin
), ranked AS (
  SELECT vbin, hbin, event_type,
         ROW_NUMBER() OVER (
           PARTITION BY vbin, hbin ORDER BY COUNT(*) DESC, event_type ASC
         ) AS rn
  FROM pts GROUP BY vbin, hbin, event_type
)
SELECT c.vbin, c.hbin, c.n, c.sum_value, r.event_type AS mode_type
FROM cells c JOIN ranked r ON c.vbin = r.vbin AND c.hbin = r.hbin AND r.rn = 1
"""


# ---------------------------------------------------------------------------
# Pivot (F11 sparse->wide): event_type counts as columns per user
# ---------------------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


Q_PIVOT_SQL = f"""
SELECT user_id,
       {", ".join(f"COUNT(*) FILTER (event_type = '{t}') AS {t}" for t in EVENT_TYPES)}
FROM events
WHERE user_id < 50
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Unpivot (F12 wide->long): melt numeric metrics into (metric, value) rows
# ---------------------------------------------------------------------------

def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    melted = li.select(
        "l_orderkey",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax)"
        ).alias("metric", "value"),
    )
    return (
        melted.groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")) / F.lit(100.0)).alias(
                "sum_value"
            ),
        )
    )


Q_UNPIVOT_SQL = """
WITH m AS (
  SELECT 'quantity' AS metric, l_quantity AS value FROM lineitem
  UNION ALL SELECT 'discount', l_discount FROM lineitem
  UNION ALL SELECT 'tax', l_tax FROM lineitem
)
SELECT metric, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM m
GROUP BY metric
"""


# ---------------------------------------------------------------------------
# Day-of-week profile (date-part functions; Spark dayofweek is 1=Sunday,
# DuckDB isodow is 1=Monday — aligned via (isodow % 7) + 1)
# ---------------------------------------------------------------------------

def q_events_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.dayofweek("ts").alias("dow"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_money("value").alias("sum_value"),
        )
    )


Q_EVENTS_DOW_SQL = """
SELECT CAST(date_part('isodow', ts) % 7 + 1 AS BIGINT) AS dow,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# As-of join: each purchase paired with the user's most recent prior click
# (inclusive <=, DuckDB/kdb ASOF semantics). Spark has no native ASOF —
# operators.asof implements it as union + ordered window (one shuffle).
# ---------------------------------------------------------------------------

def q_asof_prev_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.asof import as_of_join

    # NULL-ts policy: an event without a time cannot anchor or answer an
    # as-of lookup — excluded on BOTH sides in both engines (Spark would
    # otherwise sort NULL first in the asof window while DuckDB's ASOF
    # inequality silently drops it; round-7 time-axis sweep).
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    out = as_of_join(
        purchases,
        clicks,
        ["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_payload=["click_ts"],
    )
    return out.filter(F.col("asof_click_ts").isNotNull()).select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("asof_click_ts").alias("prev_click_ts"),
    )


Q_ASOF_SQL = """
SELECT p.event_id, p.user_id, p.ts AS purchase_ts, c.ts AS prev_click_ts
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase' AND ts IS NOT NULL) p
ASOF JOIN (SELECT user_id, ts FROM events
           WHERE event_type = 'click' AND ts IS NOT NULL) c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# ---------------------------------------------------------------------------
# Hypertable-style multi-resolution time rollup: one pass produces the
# per-(day, hour) leaves AND the per-day and grand-total continuous
# aggregates via ROLLUP on the time hierarchy.
# ---------------------------------------------------------------------------

def q_events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.date_trunc("day", "ts").alias("day"),
            F.hour("ts").cast("long").alias("hour"),
            "value",
        )
        .rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_money("value").alias("sum_value"),
        )
    )


Q_TIME_ROLLUP_SQL = """
SELECT date_trunc('day', ts) AS day,
       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY ROLLUP (1, 2)
HAVING COUNT(*) > 0
"""


# ---------------------------------------------------------------------------
# Temporal proximity join: ordered pairs of same-user events <= 10 min apart.
# A range predicate alone would plan as a nested-loop join; operators.interval
# buckets time into gap-sized cells so it runs as one shuffle equi-join
# (1-D analog of the reference's spatial radius join, larennet.py:55).
# ---------------------------------------------------------------------------

def q_event_pairs_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.interval import event_pairs_within

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return event_pairs_within(
        ev, ts_col="ts", id_col="event_id", keys=["user_id"],
        max_gap_seconds=600,
    )


Q_EVENT_PAIRS_SQL = """
SELECT a.user_id,
       a.event_id AS event_id_a,
       b.event_id AS event_id_b,
       date_diff('microsecond', a.ts, b.ts) AS gap_us
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 10 MINUTE
"""


# ---------------------------------------------------------------------------
# Time-series gap fill: hourly per-user totals on a dense hour spine (built
# with sequence/explode — no driver loop), missing hours forward-filled with
# an ignore-nulls running last(). The spine starts at each user's first
# active hour, so fills are always defined. Users capped to bound output.
# At 100 TB the spine is generated, not stored — its cost is the explode of
# one row per (user, hour), partitioned on the same key as the fill window.
# ---------------------------------------------------------------------------

def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(sum_money("value").alias("hour_value"))
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("hour"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return spine.join(hourly, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        F.last("hour_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("hour_value").isNotNull().alias("observed"),
    )


Q_GAP_FILL_SQL = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hour_value
  FROM events WHERE user_id < 30 GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, date_trunc('hour', MIN(ts)) AS h0,
         date_trunc('hour', MAX(ts)) AS h1
  FROM events WHERE user_id < 30 GROUP BY 1
),
spine AS (
  SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM bounds
)
SELECT s.user_id, s.hour,
       last_value(h.hour_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       h.hour_value IS NOT NULL AS observed
FROM spine s
LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
"""


# ---------------------------------------------------------------------------
# Stratified sampling (the deterministic analog of df.sampleBy): each stratum
# keeps 1/k of its rows chosen by an md5 hash of the row key, so the sample
# is reproducible, seed-free, and cross-engine identical — unlike Bernoulli
# sampleBy, whose RNG stream is engine-private. A pure scan predicate: no
# shuffle, fully pushdown-friendly, embarrassingly parallel at 100 TB.
# ---------------------------------------------------------------------------

_STRATA_CASE = (
    "CASE event_type WHEN 'click' THEN 2 WHEN 'view' THEN 10"
    " WHEN 'purchase' THEN 1 WHEN 'error' THEN 5 ELSE 4 END"
)


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keep = F.expr(
        "pmod(CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 15), 16, 10)"
        f" AS BIGINT), {_STRATA_CASE}) = 0"
    )
    return ev.filter(keep).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        sum_money("value").alias("sum_value"),
    )


Q_STRATIFIED_SQL = f"""
SELECT event_type, COUNT(*) AS n_sampled,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
WHERE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT)
      % ({_STRATA_CASE}) = 0
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Latest-row-per-key (snapshot dedup): each user's most recent event via
# row_number over (ts DESC, event_id DESC) — the event_id tiebreak makes the
# winner deterministic under equal timestamps. One shuffle on the key; at
# 100 TB this is the standard CDC-compaction plan.
# ---------------------------------------------------------------------------

def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


Q_LATEST_EVENT_SQL = """
SELECT user_id, event_id, ts, event_type
FROM (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Funnel analysis: users who signed up, then clicked AFTER the signup, then
# purchased AFTER that click (strict event-time ordering, not mere
# co-occurrence). Each stage is a conditional-min aggregation joined to the
# previous stage's timestamps — per-stage one groupBy on user_id, reusing
# the same shuffle key throughout, no window over full history.
# ---------------------------------------------------------------------------

def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    stage_a = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("t_a")
    )
    stage_b = (
        ev.filter(F.col("event_type") == "click")
        .join(stage_a, "user_id")
        .filter(F.col("ts") > F.col("t_a"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_b"))
    )
    stage_c = (
        ev.filter(F.col("event_type") == "purchase")
        .join(stage_b, "user_id")
        .filter(F.col("ts") > F.col("t_b"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_c"))
    )
    # one lazy plan, no driver-side counts: each stage collapses to a 1-row
    # aggregate and the cross joins of 1-row frames are free
    return (
        stage_a.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(stage_b.agg(F.count(F.lit(1)).alias("n_click_after")))
        .crossJoin(stage_c.agg(F.count(F.lit(1)).alias("n_purchase_after")))
    )


Q_EVENTS_FUNNEL_SQL = """
WITH a AS (
  SELECT user_id, MIN(ts) AS t_a FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
b AS (
  SELECT e.user_id, MIN(e.ts) AS t_b
  FROM events e JOIN a ON e.user_id = a.user_id
  WHERE e.event_type = 'click' AND e.ts > a.t_a
  GROUP BY e.user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_c
  FROM events e JOIN b ON e.user_id = b.user_id
  WHERE e.event_type = 'purchase' AND e.ts > b.t_b
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM a) AS n_signup,
       (SELECT COUNT(*) FROM b) AS n_click_after,
       (SELECT COUNT(*) FROM c) AS n_purchase_after
"""


# ---------------------------------------------------------------------------
# Weekly cohort retention: users grouped by first-active week, counted
# again at each later week offset — the classic product-analytics triangle.
# Shape: distinct (user, week) grid -> per-user min week -> self-join on
# user_id -> (cohort, offset) count-distinct. Every shuffle is keyed on
# user_id or the small (cohort, offset) pair; at 100 TB the distinct grid
# is the only full-data exchange and it partial-aggregates map-side.
# Offsets use whole-day integer arithmetic on week-truncated timestamps
# (midnight-aligned by construction), so both engines agree exactly.
# ---------------------------------------------------------------------------

RETENTION_MAX_WEEKS = 8


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    weeks = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(cohort, "user_id")
        .withColumn(
            "week_offset",
            F.expr("CAST(datediff(week, cohort_week) div 7 AS INT)"),
        )
        .filter(F.col("week_offset") <= RETENTION_MAX_WEEKS)
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


Q_EVENTS_RETENTION_SQL = f"""
WITH weeks AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
), cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY user_id
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, week) // 7 AS INT) AS week_offset,
       count(DISTINCT w.user_id) AS n_users
FROM weeks w JOIN cohort c ON c.user_id = w.user_id
WHERE date_diff('day', cohort_week, week) // 7 <= {RETENTION_MAX_WEEKS}
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Per-type z-score outlier flags: the standardize-then-filter anomaly
# pattern. Group stats come from exact integer-cents sums (n, Σv, Σv² — one
# partial-aggregatable shuffle, the q_price_qty_corr technique), broadcast
# back against the full table as a tiny per-type row, z computed in the
# cents domain (scale cancels). The outlier test runs on the ROUNDED z so
# both engines compare identical doubles at the ±3 boundary.
# ---------------------------------------------------------------------------

OUTLIER_Z = 3.0


def q_events_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s"),
        # decimal(38,0): v² ~1e10 per term wraps a BIGINT sum at ~1e9
        # rows per type (round-5 overflow sweep; DuckDB widens to HUGEINT)
        F.sum((v * v).cast("decimal(38,0)")).alias("sq"),
    )
    n = F.col("n").cast("double")
    s, sq = F.col("s").cast("double"), F.col("sq").cast("double")
    mean = s / n  # n >= 1 whenever the group exists
    # try_divide: a single-event type (n=1) or a zero-variance type would
    # raise DIVIDE_BY_ZERO under ANSI mode; DuckDB yields NULL for the same
    # rows, so NULL-on-degenerate keeps cross-engine parity AND survival
    std = F.sqrt(F.try_divide(n * sq - s * s, n * (n - F.lit(1.0))))
    z = roundn(F.try_divide(v.cast("double") - mean, std))
    return (
        ev.select("event_id", "event_type", "value")
        .join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            z.alias("z"),
            (F.abs(z) >= OUTLIER_Z).cast("int").alias("is_outlier"),
        )
    )


Q_EVENTS_OUTLIERS_SQL = f"""
WITH c AS (
  SELECT event_id, event_type, value,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
), st AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(v) AS BIGINT) AS s, CAST(SUM(v*v) AS BIGINT) AS sq
  FROM c GROUP BY event_type
), zt AS (
  SELECT event_id, c.event_type, value,
         FLOOR(((CAST(v AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                / SQRT((CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))
               * 10000 + 0.5) / 10000 AS z
  FROM c JOIN st ON c.event_type = st.event_type
)
SELECT event_id, event_type, value, z,
       CAST(ABS(z) >= {OUTLIER_Z} AS INT) AS is_outlier
FROM zt
"""


# ---------------------------------------------------------------------------
# Fiducial cut (P6): geometry.in_tpc range predicates, oracle-checked
# ---------------------------------------------------------------------------

#: synthetic detector coordinates derived from event_id with pure integer
#: arithmetic (bit-identical across engines): per axis (multiplier, modulus)
#: in tenth-cm units — shared by the fiducial-cut, spatial-join, and
#: Z-order queries and their SQL oracles (ONE definition; the f-string
#: SQLs interpolate these same values).
SYNTH_COORD = {"x": (131, 3600), "y": (197, 3000), "z": (73, 12000)}


def _synth_int(axis: str):
    m, mod = SYNTH_COORD[axis]
    return (F.col("event_id") * m) % mod


def _synth_int_sql(axis: str) -> str:
    m, mod = SYNTH_COORD[axis]
    return f"(event_id * {m}) % {mod}"


def q_fiducial_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fiducial-volume cut over synthetic detector coordinates.

    P6 range predicates with the reference's TPC constants
    (``/root/reference/detectoroutline.py:5-11``) and the 10 cm fiducial
    margin shape of ``larennet/jam_larennet.py:47-55``, applied through
    ``geometry.fiducial_cut`` so the driver oracle exercises the same
    helper the per-point cuts use.  The events table has no coordinates,
    so (x, y, z) are derived deterministically from ``event_id`` with pure
    integer arithmetic (bit-identical in Spark and DuckDB); the spans
    exceed the TPC volume on every axis so the cut genuinely bites.

    Scale: six scalar range predicates — on a real detector table these
    are top-level columns and Catalyst pushes them into the Parquet scan
    (PushedFilters), pruning out-of-volume row groups at storage.  The
    aggregate sums exact integers (deterministic under any partial-agg
    order) and converts to cm once at the end.
    """
    from ubparquet_spark import geometry

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        _synth_int("x").alias("ix"),
        _synth_int("y").alias("iy"),
        _synth_int("z").alias("iz"),
    ).withColumns(
        {
            "x": F.col("ix") / 10.0 - 50.0,    # [-50, 309.9] — spills both faces
            "y": F.col("iy") / 10.0 - 150.0,   # [-150, 149.9]
            "z": F.col("iz") / 10.0 - 100.0,   # [-100, 1099.9]
        }
    )
    kept = geometry.fiducial_cut(pts, margin=10.0)
    n = F.count(F.lit(1))
    agg = kept.groupBy("event_type").agg(
        n.alias("n_in"),
        F.sum("ix").alias("sx"),
        F.sum("iy").alias("sy"),
        F.sum("iz").alias("sz"),
    )
    cnt = F.col("n_in").cast("double")
    return agg.select(
        "event_type",
        "n_in",
        roundn(F.col("sx").cast("double") / cnt / 10.0 - 50.0, 4).alias("avg_x"),
        roundn(F.col("sy").cast("double") / cnt / 10.0 - 150.0, 4).alias("avg_y"),
        roundn(F.col("sz").cast("double") / cnt / 10.0 - 100.0, 4).alias("avg_z"),
    )


# margin=10 cm on the TPC volume x[0,256] y[-117,117] z[0,1036]
Q_FIDUCIAL_CUT_SQL = f"""
WITH pts AS (
  SELECT event_type,
         {_synth_int_sql("x")} AS ix,
         {_synth_int_sql("y")} AS iy,
         {_synth_int_sql("z")} AS iz
  FROM events
), kept AS (
  SELECT * FROM pts
  WHERE ix / 10.0 - 50.0  >= 10.0   AND ix / 10.0 - 50.0  <= 246.0
    AND iy / 10.0 - 150.0 >= -107.0 AND iy / 10.0 - 150.0 <= 107.0
    AND iz / 10.0 - 100.0 >= 10.0   AND iz / 10.0 - 100.0 <= 1026.0
)
SELECT event_type,
       COUNT(*) AS n_in,
       FLOOR((CAST(SUM(ix) AS DOUBLE) / COUNT(*) / 10.0 - 50.0)  * 10000 + 0.5) / 10000 AS avg_x,
       FLOOR((CAST(SUM(iy) AS DOUBLE) / COUNT(*) / 10.0 - 150.0) * 10000 + 0.5) / 10000 AS avg_y,
       FLOOR((CAST(SUM(iz) AS DOUBLE) / COUNT(*) / 10.0 - 100.0) * 10000 + 0.5) / 10000 AS avg_z
FROM kept
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Hourly volume-anomaly windows: flag (event_type, hour) windows whose
# event count deviates from the type's mean by more than 3σ — the
# ingestion-volume alarm of a streaming pipeline, evaluated in batch.
# The z² test is ALL-INTEGER:   (c·n − S)² > 9·(n·Q − S²)
# (multiply (c−S/n)² > 9·(Q−S²/n)/n through by n²), where S = Σc and
# Q = Σc² over the type's windows — exact and order-independent under any
# partial-aggregation layout, no float σ whose summation order could
# diverge across engines. All quadratic terms (Q, S², dev², n·Q) are
# promoted to DECIMAL(38,0) / HUGEINT on the two sides (round-5 overflow
# sweep): with hot-type hourly counts ~1e7 over ~1e5 windows, S ~1e12 and
# S² ~1e24 exceed BIGINT, and DuckDB would raise on the overflow while
# non-ANSI Spark wrapped — the 128-bit integer paths agree exactly.
#
# Shape: one (type, hour) count shuffle; the per-type moment rollup is a
# tiny second agg broadcast back onto the windows.
# ---------------------------------------------------------------------------

def q_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("window_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    moments = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("n_events").alias("s"),
        # decimal(38,0): a hot type's hourly n_events can reach ~1e7 at
        # 100 TB, so Σn² ~1e14 per window crosses BIGINT within ~1e5
        # windows (round-5 overflow sweep)
        F.sum((F.col("n_events") * F.col("n_events")).cast("decimal(38,0)")).alias("q"),
    )
    j = hourly.join(F.broadcast(moments), "event_type")
    dec = lambda c: c.cast("decimal(38,0)")
    dev = dec(F.col("n_events") * F.col("n_windows") - F.col("s"))
    thresh = 9 * (
        dec(F.col("n_windows")) * F.col("q") - dec(F.col("s")) * dec(F.col("s"))
    )
    return j.select(
        "event_type",
        "window_start",
        "n_events",
        (dev * dev > thresh).alias("anomalous"),
    ).filter(F.col("anomalous"))


Q_VOLUME_ANOMALY_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS window_start,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
), moments AS (
  SELECT event_type,
         COUNT(*) AS n_windows,
         CAST(SUM(n_events) AS HUGEINT) AS s,
         CAST(SUM(n_events * n_events) AS HUGEINT) AS q
  FROM hourly GROUP BY event_type
)
SELECT h.event_type, h.window_start, h.n_events, TRUE AS anomalous
FROM hourly h JOIN moments m ON h.event_type = m.event_type
WHERE (h.n_events * m.n_windows - m.s) * (h.n_events * m.n_windows - m.s)
      > 9 * (m.n_windows * m.q - m.s * m.s)
"""


# ---------------------------------------------------------------------------
# DAU/MAU stickiness: daily active users joined against the containing
# month's monthly actives — the engagement ratio every product-analytics
# stack reports. Two exact distinct-count aggregations at different
# grains; the month table is tiny (one row per month) and broadcasts onto
# the day table. The ratio is one division of exact integers, rounded.
# ---------------------------------------------------------------------------

def q_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        # date_trunc, not to_date: a DATE column round-trips as a python
        # object dtype while the oracle yields datetime64 — timestamps
        # compare cleanly in the hash harness
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("month", "ts").alias("month"),
    ).agg(F.countDistinct("user_id").alias("dau"))
    monthly = ev.groupBy(F.date_trunc("month", "ts").alias("month")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    return daily.join(F.broadcast(monthly), "month").select(
        "day",
        "dau",
        "mau",
        roundn(F.col("dau").cast("double") / F.col("mau"), 6).alias("stickiness"),
    )


Q_DAU_MAU_SQL = f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, date_trunc('month', ts) AS month,
         COUNT(DISTINCT user_id) AS dau
  FROM events GROUP BY 1, 2
), monthly AS (
  SELECT date_trunc('month', ts) AS month, COUNT(DISTINCT user_id) AS mau
  FROM events GROUP BY 1
)
SELECT d.day, d.dau, m.mau,
       {sql_roundn("CAST(d.dau AS DOUBLE) / m.mau", 6)} AS stickiness
FROM daily d JOIN monthly m ON d.month = m.month
"""


# ---------------------------------------------------------------------------
# First-touch attribution: each user's FIRST event type (earliest ts,
# event_id tie-break) vs whether they ever purchased — conversion rate by
# acquisition channel, the standard attribution rollup. min_by gives the
# first touch in ONE partial-aggregatable pass (no per-user sort window);
# the purchase flag is a max-of-indicator in the same shuffle.
# ---------------------------------------------------------------------------

def q_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts policy: an event without a time cannot be a "first" touch;
    # such rows are excluded from the whole analysis in both engines
    # (min_by's struct comparison ranks NULL ts smallest while DuckDB's
    # ORDER BY ts ranks it last — round-7 time-axis sweep). NULL-user
    # policy likewise: per-user attribution has no row for "no user" —
    # the oracle's USING join already drops the NULL-user group, the
    # Spark groupBy would keep it (round-7 null-key sweep).
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    per_user = ev.groupBy("user_id").agg(
        F.min_by(
            "event_type", F.struct(F.col("ts"), F.col("event_id"))
        ).alias("first_touch"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted"),
    )
    return per_user.groupBy("first_touch").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
        roundn(
            F.sum("converted").cast("double") / F.count(F.lit(1)), 6
        ).alias("conversion_rate"),
    )


Q_FIRST_TOUCH_SQL = f"""
WITH ranked AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), conv AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL GROUP BY user_id
), per_user AS (
  SELECT r.user_id, r.event_type AS first_touch, c.converted
  FROM ranked r JOIN conv c USING (user_id)
  WHERE r.rn = 1
)
SELECT first_touch,
       COUNT(*) AS n_users,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       {sql_roundn("CAST(SUM(converted) AS DOUBLE) / COUNT(*)", 6)} AS conversion_rate
FROM per_user
GROUP BY first_touch
"""


# ---------------------------------------------------------------------------
# RFM segmentation: per-user Recency (days since last event vs the corpus
# watermark), Frequency (event count), Monetary (summed value in exact
# integer cents), each bucketed into quartiles. The standard user-value
# segmentation shape: one partial-aggregatable shuffle over events
# grains to per-user rows (checkpointed once — three consumers below);
# each quartile then comes from operators/ranks.ranked + ntile_col —
# bit-identical to NTILE(4) but range-partitioned, because the USER
# table is fact-grain at warehouse scale and a plain unpartitioned NTILE
# window would funnel it through one task's sort (the round-6 rewire;
# the old plan was the q_twap class of scale defect). Desc orderings map
# to asc ranked() keys via negation plus an explicit null-last flag,
# reproducing the window's DESC NULLS LAST placement. The corpus
# watermark is a broadcast 1-row aggregate, not an eager count.
# Tie-breaks are total (metric, user_id), so quartile assignment is
# engine-deterministic.
# ---------------------------------------------------------------------------

def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.ranks import ntile_col, ranked

    # NULL-user policy: user-value segmentation has no row for "no
    # user"; also the NTILE tie-break key is user_id, whose NULL
    # ordering differs across engines (round-7 null-key sweep)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    asof = ev.agg(F.max("ts").alias("asof"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(cents("value")).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(asof))
        .select(
            "user_id",
            F.datediff(F.to_date("asof"), F.to_date("last_ts")).alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
        .localCheckpoint(eager=False)
    )

    def quartile(df: DataFrame, keys: list, out: str) -> DataFrame:
        tagged = df.select("user_id", *[k.alias(f"_k{i}") for i, k in enumerate(keys)])
        r = ranked(
            tagged,
            [],
            [f"_k{i}" for i in range(len(keys))] + ["user_id"],
            rank_col="_r",
            n_col="_n",
        )
        return r.select(
            "user_id", ntile_col("_r", "_n", 4).cast("int").alias(out)
        )

    # asc: ranked()'s range sort is asc-nulls-first, same as the window
    rq = quartile(per_user, [F.col("recency_days")], "r_quartile")
    # desc: negate for order, null flag last (DESC NULLS LAST semantics)
    fq = quartile(
        per_user,
        [F.col("frequency").isNull().cast("int"), -F.col("frequency")],
        "f_quartile",
    )
    mq = quartile(
        per_user,
        [F.col("monetary_cents").isNull().cast("int"), -F.col("monetary_cents")],
        "m_quartile",
    )
    return (
        per_user.select("user_id", "recency_days", "frequency", "monetary_cents")
        .join(rq, "user_id")
        .join(fq, "user_id")
        .join(mq, "user_id")
    )


Q_RFM_SQL = """
WITH wmark AS (
  SELECT MAX(ts) AS w FROM events WHERE user_id IS NOT NULL
), per_user AS (
  SELECT user_id,
         date_diff('day', CAST(MAX(ts) AS DATE), CAST((SELECT w FROM wmark) AS DATE)) AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS monetary_cents
  FROM events
  WHERE user_id IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, recency_days, frequency, monetary_cents,
       NTILE(4) OVER (ORDER BY recency_days ASC, user_id ASC) AS r_quartile,
       NTILE(4) OVER (ORDER BY frequency DESC, user_id ASC) AS f_quartile,
       NTILE(4) OVER (ORDER BY monetary_cents DESC, user_id ASC) AS m_quartile
FROM per_user
"""


# ---------------------------------------------------------------------------
# Spatial radius self-join (J3, reference `larennet.py:55-57` radius_graph)
# as an oracle-checked query: synthetic integer-derived coordinates (the
# q_fiducial_cut technique) let the grid-bucket 27-cell equi-join operator
# be verified against DuckDB's brute-force distance join. Membership is
# decided on sqrt(exact-integer d²) vs an integer radius — IEEE sqrt is
# exactly rounded, so the verdict is engine-deterministic even at d² = r²
# — and the emitted d² is recomputed as a pure-integer function of the
# pair ids, so the compared values carry no float at all.
#
# Scale: the operator's shape (cell bucketize → 27-cell replicate on the
# build side → equi-join → exact filter) is linear in points × density;
# the input filter bounds the BRUTE-FORCE ORACLE, not the operator.
# ---------------------------------------------------------------------------

SPATIAL_RADIUS_TENTHS = 600  # 60 cm in tenth-units


def _spatial_points(ev: DataFrame) -> DataFrame:
    return ev.filter(F.col("user_id") < 20).select(
        "event_type",
        F.col("event_id").alias("idx"),
        _synth_int("x").cast("double").alias("x"),
        _synth_int("y").cast("double").alias("y"),
        _synth_int("z").cast("double").alias("z"),
    )


def q_spatial_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.spatial import radius_self_join

    ev = load_table(spark, sf_dir, "events")
    pairs = radius_self_join(
        _spatial_points(ev),
        float(SPATIAL_RADIUS_TENTHS),
        keys=["event_type"],
        id_col="idx",
    )

    def _d(axis: str) -> F.Column:
        m, mod = SYNTH_COORD[axis]
        return ((F.col("a_id") * m) % mod) - ((F.col("b_id") * m) % mod)

    # plain integer multiplication, never pow(): Math.pow is libm (1-ulp
    # slack) and a truncating bigint cast would amplify an off-by-ulp
    dx, dy, dz = _d("x"), _d("y"), _d("z")
    d2 = dx * dx + dy * dy + dz * dz
    return pairs.select(
        "event_type", "a_id", "b_id", d2.cast("bigint").alias("d2")
    )


Q_SPATIAL_PAIRS_SQL = f"""
WITH pts AS (
  SELECT event_type, event_id AS idx,
         {_synth_int_sql("x")} AS ix,
         {_synth_int_sql("y")} AS iy,
         {_synth_int_sql("z")} AS iz
  FROM events WHERE user_id < 20
)
SELECT a.event_type, a.idx AS a_id, b.idx AS b_id,
       CAST((a.ix - b.ix) * (a.ix - b.ix)
          + (a.iy - b.iy) * (a.iy - b.iy)
          + (a.iz - b.iz) * (a.iz - b.iz) AS BIGINT) AS d2
FROM pts a JOIN pts b
  ON a.event_type = b.event_type AND a.idx <> b.idx
WHERE SQRT(CAST((a.ix - b.ix) * (a.ix - b.ix)
         + (a.iy - b.iy) * (a.iy - b.iy)
         + (a.iz - b.iz) * (a.iz - b.iz) AS DOUBLE)) <= {SPATIAL_RADIUS_TENTHS}
"""


# ---------------------------------------------------------------------------
# Z-order (Morton) layout audit: interleave 3-D bin indices into the
# 30-bit Morton key (`operators.zorder.morton3_key` — the data-layout key
# `write_zordered` sorts by so that spatially-close points land in the
# same row groups) and report per-prefix cell occupancy. Pure integer bit
# arithmetic on both engines; the oracle unrolls the identical interleave.
# The prefix histogram is exactly the locality property that makes range
# queries prune: one coarse cell = one contiguous Morton range.
# ---------------------------------------------------------------------------

ZORDER_PREFIX_SHIFT = 18  # keep the top 12 of 30 bits → coarse cells


def q_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.zorder import morton3_key

    ev = load_table(spark, sf_dir, "events")
    # integer DIV, not `/`+cast: Spark's double->long cast truncates but
    # DuckDB's CAST rounds — floor division sidesteps the divergence
    pts = ev.select(
        "event_id",
        F.expr(f"CAST(({_synth_int_sql('x')}) DIV 4 AS BIGINT)").alias("bx"),
        F.expr(f"CAST(({_synth_int_sql('y')}) DIV 4 AS BIGINT)").alias("by"),
        F.expr(f"CAST(({_synth_int_sql('z')}) DIV 16 AS BIGINT)").alias("bz"),
    )
    keyed = pts.withColumn("zorder", morton3_key("bx", "by", "bz"))
    return (
        keyed.groupBy(
            F.shiftright(F.col("zorder"), ZORDER_PREFIX_SHIFT).alias("cell")
        )
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("zorder").alias("min_key"),
            F.max("zorder").alias("max_key"),
        )
    )


def _zorder_sql() -> str:
    from ubparquet_spark.operators.zorder import BITS

    terms = []
    for b in range(BITS):
        for axis, c in enumerate(("bx", "by", "bz")):
            terms.append(f"(({c} // {1 << b}) % 2) * {1 << (3 * b + axis)}")
    key = " + ".join(terms)
    return f"""
WITH pts AS (
  SELECT CAST(({_synth_int_sql("x")}) // 4 AS BIGINT) AS bx,
         CAST(({_synth_int_sql("y")}) // 4 AS BIGINT) AS by,
         CAST(({_synth_int_sql("z")}) // 16 AS BIGINT) AS bz
  FROM events
), keyed AS (
  SELECT CAST({key} AS BIGINT) AS zorder FROM pts
)
SELECT zorder // {1 << ZORDER_PREFIX_SHIFT} AS cell,
       COUNT(*) AS n_points,
       MIN(zorder) AS min_key,
       MAX(zorder) AS max_key
FROM keyed
GROUP BY 1
"""


Q_ZORDER_CELLS_SQL = _zorder_sql()


# ---------------------------------------------------------------------------
# Neighbor-degree stats (A11, reference `larennet.py:61-62`:
# edges/num_nodes) over the radius-join edge list — the graph-density
# audit a geometric-learning pipeline runs before training. Rides the
# same grid-join edges as q_spatial_pairs; one additional
# partial-aggregatable shuffle on the event key.
# ---------------------------------------------------------------------------

def q_neighbor_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.spatial import neighbor_degree_stats

    ev = load_table(spark, sf_dir, "events")
    edges = q_spatial_pairs(spark, sf_dir)
    # the reference's num_nodes is the TOTAL point count — isolated points
    # dilute the density; pass the join's input so they are counted
    stats = neighbor_degree_stats(
        edges, keys=["event_type"], points=_spatial_points(ev)
    )
    return stats.select(
        "event_type",
        "n_edges",
        "n_nodes",
        roundn(F.col("avg_degree"), 6).alias("avg_degree"),
    )


Q_NEIGHBOR_DEGREE_SQL = f"""
WITH edges AS ({Q_SPATIAL_PAIRS_SQL}),
estats AS (
  SELECT event_type, COUNT(*) AS n_edges FROM edges GROUP BY event_type
), nodes AS (
  SELECT event_type, COUNT(DISTINCT event_id) AS n_nodes
  FROM events WHERE user_id < 20 GROUP BY event_type
)
SELECT n.event_type, COALESCE(e.n_edges, 0) AS n_edges, n.n_nodes,
       COALESCE({sql_roundn("CAST(e.n_edges AS DOUBLE) / n.n_nodes", 6)}, 0.0)
         AS avg_degree
FROM nodes n LEFT JOIN estats e ON e.event_type = n.event_type
"""




# ---------------------------------------------------------------------------
# Cohort LTV: users cohorted by first-activity week; purchase revenue per
# (cohort_week, week_offset) — the lifetime-value matrix a growth team
# reads next to the retention triangle. Scale shape: the cohort table is
# one per-user min (partial-aggregatable), joined back as a user->week map
# (at 100 TB a shuffle join on user_id; the purchase side is pre-filtered
# at the scan). Revenue sums exact integer cents.
# ---------------------------------------------------------------------------

def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.date_trunc("week", F.col("ts")).alias("week"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("vc"),
    )
    return (
        buys.join(cohort, "user_id")
        .withColumn(
            "week_offset",
            F.expr("CAST(datediff(week, cohort_week) div 7 AS INT)"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(
            F.countDistinct("user_id").alias("n_buyers"),
            (F.sum("vc") / 100.0).alias("revenue"),
        )
    )


Q_COHORT_LTV_SQL = """
WITH cohort AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
), buys AS (
  SELECT user_id, date_trunc('week', ts) AS week,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events WHERE event_type = 'purchase'
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, week) // 7 AS INT) AS week_offset,
       COUNT(DISTINCT b.user_id) AS n_buyers,
       SUM(vc) / 100.0 AS revenue
FROM buys b JOIN cohort c ON c.user_id = b.user_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Inter-arrival gap statistics per event type: lag over (user, type)
# ordered by time, gaps in EXACT microseconds (NTZ-epoch timestampdiff /
# epoch_us are integer in both engines — no timestamp-subtraction double
# drift, and no NTZ→LTZ cast whose offset would shift across a DST
# boundary under a foreign session timezone), then
# one partial-aggregatable rollup per type. The window partitions by
# (user_id, event_type) — millions of small partitions at 100 TB, the
# scalable case (contrast the single-partition global windows the
# operators/ranks module exists to avoid).
# ---------------------------------------------------------------------------

def q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("timestampdiff(MICROSECOND, to_timestamp_ntz('1970-01-01 00:00:00'), ts)").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    gaps = ev.withColumn("gap_us", F.col("us") - F.lag("us").over(w)).filter(
        F.col("gap_us").isNotNull()
    )
    # Σgap_us accumulates in decimal(38,0) (not BIGINT: DuckDB's
    # SUM(BIGINT) widens to HUGEINT, and at extreme row counts a Spark
    # BIGINT sum would wrap silently in non-ANSI mode); ONE division at
    # the end — an AVG over per-row doubles would be
    # partial-aggregation-order-dependent
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        roundn(
            F.sum(F.col("gap_us").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1)) / 1000000.0, 4
        ).alias("avg_gap_s"),
        (F.min("gap_us") / 1000000.0).alias("min_gap_s"),
        (F.max("gap_us") / 1000000.0).alias("max_gap_s"),
    )


Q_INTERARRIVAL_SQL = f"""
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY user_id, event_type
                 ORDER BY epoch_us(ts), event_id) AS gap_us
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_gaps,
       {sql_roundn("CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1000000.0", 4)} AS avg_gap_s,
       MIN(gap_us) / 1000000.0 AS min_gap_s,
       MAX(gap_us) / 1000000.0 AS max_gap_s
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY event_type
"""




# ---------------------------------------------------------------------------
# Time-weighted average value (TWAP) per event type: integral of the
# last-observation-carried-forward value over the observation span,
# divided by the span — the financial/metrics convention when samples are
# irregular. Each value holds from its event until the next event of the
# SAME type (global per type, not per user). Weights are EXACT integer
# microseconds (lag over the type-keyed window), the value is exact
# integer cents, and the (cents × micros) products sum in DECIMAL(38,0) —
# order-independent, so both engines produce the identical rational
# before the single final division.
# ---------------------------------------------------------------------------

def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("timestampdiff(MICROSECOND, to_timestamp_ntz('1970-01-01 00:00:00'), ts)").alias("us"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("vc"),
        "event_id",
    ).filter(F.col("us").isNotNull() & F.col("vc").isNotNull())
    # Null-value/null-ts observations are dropped BEFORE the lead window —
    # LOCF semantics: an unobserved sample neither starts a segment nor
    # advances the span; the previous value carries across it.  This is
    # exactly what the streaming twin (streaming/stateful.running_twap)
    # does by filtering nulls at the source, so batch and stream agree on
    # n_segments / span_s / twap in the presence of nulls.
    #
    # The lead runs through operators/segmented.segmented_lead, NOT a
    # plain type-keyed window: event_type is low-cardinality, so
    # Window.partitionBy("event_type") would sort each type's ENTIRE
    # history in one task (the scale-killer VERDICT r04 flagged).  Daily
    # buckets bound every window task; a tiny per-bucket handoff keeps
    # the result bit-identical to the plain lead (tests/test_segmented.py).
    seg = segmented_lead(
        ev,
        ["event_type"],
        ["us", "event_id"],
        "us",
        F.expr(f"us DIV {DAY_US}"),
        "next_us",
    ).filter(F.col("next_us").isNotNull() & (F.col("next_us") > F.col("us")))
    # next_us > us: a SEGMENT is a positive-duration LOCF interval.  Tied
    # timestamps (the ninth sweep's skew corpus collapses entire event
    # types onto one literal ts) produce zero-duration lead pairs; the
    # streaming twin (_update_twap) already treats a tie as "carry the
    # highest event_id's value forward, no segment" — with the lead
    # ordered on (us, event_id) the surviving positive-duration pair
    # carries exactly that value, so batch ≡ stream ≡ oracle on ties.
    dur = F.col("next_us") - F.col("us")
    dec = F.col("vc").cast("decimal(38,0)") * dur.cast("decimal(38,0)")
    # Every segment now has dur >= 1 us, so the span divisor cannot be
    # zero; try_divide stays as the explicit statement that a zero span
    # means "undefined, NULL" in both engines (DuckDB's DOUBLE division
    # already yields NULL on a zero divisor), not an ANSI throw.
    return seg.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_segments"),
        (F.sum(dur) / 1000000.0).alias("span_s"),
        roundn(
            F.try_divide(
                F.sum(dec).cast("double"), F.sum(dur).cast("double")
            )
            / 100.0,
            6,
        ).alias("twap"),
    )


Q_TWAP_SQL = f"""
WITH seg AS (
  SELECT event_type,
         epoch_us(ts) AS us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc,
         LEAD(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY epoch_us(ts), event_id
         ) AS next_us
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL
)
SELECT event_type,
       COUNT(*) AS n_segments,
       SUM(next_us - us) / 1000000.0 AS span_s,
       {sql_roundn(
           "CAST(SUM(CAST(vc AS HUGEINT) * (next_us - us)) AS DOUBLE)"
           " / CAST(NULLIF(SUM(next_us - us), 0) AS DOUBLE) / 100.0", 6)} AS twap
FROM seg WHERE next_us IS NOT NULL AND next_us > us
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Funnel latency: per user, the gap between the FIRST signup and the
# first purchase AFTER it; rolled up to count/mean/median. Scale shape:
# two per-user min-aggregations (partial-aggregatable; the purchase min is
# conditional on the signup time, computed after one user-keyed join of
# two pre-filtered scans), then the median via the same value-
# DISTRIBUTION technique as q_winsorized_prices — the running total runs
# over distinct gap values (blocked_cumsum, no single-task sort), not
# users. Gaps are exact integer seconds.
# ---------------------------------------------------------------------------

def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.expr("timestampdiff(MICROSECOND, to_timestamp_ntz('1970-01-01 00:00:00'), ts)")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(us).alias("s_us"))
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("b_us")
    )
    gaps = (
        buys.join(signup, "user_id")
        .filter(F.col("b_us") >= F.col("s_us"))
        .groupBy("user_id")
        .agg(F.min(F.col("b_us") - F.col("s_us")).alias("gap_us"))
        .select(F.expr("gap_us DIV 1000000").alias("gap_s"))
    )
    # distinct gap seconds are NOT quantization-bounded (a wide-horizon
    # corpus has ~1e7+ of them) — the running total is the two-pass
    # blocked prefix sum, never a single-task global ordered window
    from ubparquet_spark.operators.ranks import blocked_cumsum

    dist = gaps.groupBy("gap_s").agg(F.count(F.lit(1)).alias("c"))
    cum = blocked_cumsum(
        dist,
        ["gap_s"],
        {"cum": ("c", "inclusive")},
        totals={"n": "c", "sv": F.col("gap_s") * F.col("c")},
    )
    return cum.select(
        F.max("n").alias("n_converted"),
        roundn(F.max(F.col("sv").cast("double") / F.col("n")), 4).alias("mean_gap_s"),
        F.min(
            F.when(F.col("cum") >= F.ceil(F.col("n") / 2.0), F.col("gap_s"))
        ).alias("median_gap_s"),
    )


Q_TIME_TO_CONVERT_SQL = f"""
WITH signup AS (
  SELECT user_id, MIN(epoch_us(ts)) AS s_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), gaps AS (
  SELECT b.user_id,
         MIN(epoch_us(b.ts) - s.s_us) // 1000000 AS gap_s
  FROM events b JOIN signup s ON s.user_id = b.user_id
  WHERE b.event_type = 'purchase' AND epoch_us(b.ts) >= s.s_us
  GROUP BY b.user_id
), dist AS (
  SELECT gap_s, COUNT(*) AS c FROM gaps GROUP BY gap_s
), cum AS (
  SELECT gap_s, c,
         SUM(c) OVER (ORDER BY gap_s) AS cum,
         SUM(c) OVER () AS n,
         SUM(gap_s * c) OVER () AS sv
  FROM dist
)
SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
       {sql_roundn("MAX(CAST(sv AS DOUBLE) / n)", 4)} AS mean_gap_s,
       MIN(CASE WHEN cum >= CEIL(n / 2.0) THEN gap_s END) AS median_gap_s
FROM cum
"""




# ---------------------------------------------------------------------------
# Concurrent sessions: INTERVAL-OVERLAP self-join — which user pairs were
# active simultaneously, and for how long. The missing join shape next to
# the point-proximity join (q_event_pairs_10min): intervals × intervals.
# Scale shape: sessions bucketize into hour cells and explode into the
# cells they COVER (bounded by session length / cell width), the pair
# join is an equi-join on the cell key, duplicates from multi-cell
# overlaps collapse via per-pair max, and the exact overlap filter runs
# on the joined row — never an inequality (theta) join over the full
# session table. Overlaps accumulate in EXACT integer microseconds. The
# oracle mirrors with a plain range join (fine at oracle scale).
# ---------------------------------------------------------------------------

CONCURRENT_MAX_USER = 20
_SESS_GAP_US = 30 * 60 * 1000000
_CELL_US = 3600 * 1000000


def q_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < CONCURRENT_MAX_USER
    )
    sess = (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            # timestampdiff against the NTZ epoch, NOT a CAST to LTZ: the
            # cast is session-timezone-dependent and shifts across DST
            # (the operators/interval._epoch_micros hazard)
            F.expr(
                "timestampdiff(MICROSECOND,"
                " to_timestamp_ntz('1970-01-01 00:00:00'), w.start)"
            ).alias("s_us"),
            F.expr(
                "timestampdiff(MICROSECOND,"
                " to_timestamp_ntz('1970-01-01 00:00:00'), w.end)"
            ).alias("e_us"),
        )
    )
    from ubparquet_spark.operators.interval import interval_overlap_self_join

    # the generic cell-bucketed interval×interval join (property-tested
    # against brute force in test_interval.py); sessions are identified
    # by (user_id, s_us) — per-user sessions are disjoint, so s_us is a
    # unique session key within a user
    # pairs are already emitted once with a.user_id < b.user_id (the
    # operator orders on the first id col), so same-user session pairs
    # never appear and no symmetric re-keying is needed
    pair_overlaps = interval_overlap_self_join(
        sess,
        id_cols=["user_id", "s_us"],
        cell_us=_CELL_US,
    ).select(
        F.col("a_user_id").alias("user_a"),
        F.col("b_user_id").alias("user_b"),
        "overlap_us",
    )
    return (
        pair_overlaps.groupBy("user_a", "user_b")
        .agg(
            F.count(F.lit(1)).alias("n_session_pairs"),
            (F.sum("overlap_us") / 1000000.0).alias("overlap_s"),
        )
        .orderBy(F.col("overlap_s").desc(), "user_a", "user_b")
        .limit(20)
    )


Q_CONCURRENT_SESSIONS_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
    -- strictly greater: session_window MERGES an event exactly gap
    -- after the previous one (verified empirically; end bound is the
    -- last event + gap, so equality is within the window)
    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WHERE user_id < {CONCURRENT_MAX_USER}
), numbered AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS sess_id
  FROM flagged
), sess AS (
  SELECT user_id,
         epoch_us(MIN(ts)) AS s_us,
         epoch_us(MAX(ts)) + {_SESS_GAP_US} AS e_us
  FROM numbered GROUP BY user_id, sess_id
), pair_overlaps AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b,
         LEAST(a.e_us, b.e_us) - GREATEST(a.s_us, b.s_us) AS ov_us
  FROM sess a JOIN sess b
    ON a.user_id < b.user_id
   AND a.s_us < b.e_us AND b.s_us < a.e_us
  WHERE LEAST(a.e_us, b.e_us) - GREATEST(a.s_us, b.s_us) > 0
)
SELECT user_a, user_b,
       COUNT(*) AS n_session_pairs,
       SUM(ov_us) / 1000000.0 AS overlap_s
FROM pair_overlaps
GROUP BY user_a, user_b
ORDER BY overlap_s DESC, user_a, user_b
LIMIT 20
"""


# ---------------------------------------------------------------------------
# First-order Markov transition matrix over event types: per user, each
# consecutive (prev → next) event pair ordered by time, rolled up into
# transition counts and row-normalized probabilities — the standard
# behavioral-model / anomaly-baseline artifact (next-action prediction,
# bot detection).
#
# Scale shape: the lag window partitions by user_id — millions of small
# partitions at 100 TB, the scalable case. Row totals are an unordered
# window over the ALREADY-AGGREGATED ≤|types|² transition matrix — a
# value-domain-bounded artifact (the q_winsorized_prices histogram
# precedent), never the fact table, so the per-type window task holds at
# most |types| rows at any corpus size. A groupBy+broadcast-join form
# (the q2_min_cost_parts technique) was measured first: without
# ReusedExchange across the broadcast boundary it re-scanned the fact
# table for the totals branch (5 Exchanges, 2 scans) vs this plan's one
# scan and 3 Exchanges. Probabilities divide as double only at the end;
# the counts stay exact integers so the hash compares integers plus one
# stabilized division.
# ---------------------------------------------------------------------------

def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts policy: time-ordered transition pairs exclude un-timed
    # events in both engines (round-7 time-axis sweep).
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    ).select(
        "user_id",
        F.expr(
            "timestampdiff(MICROSECOND, to_timestamp_ntz('1970-01-01 00:00:00'), ts)"
        ).alias("us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pairs = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    counts = pairs.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = F.sum("n").over(Window.partitionBy("prev_type"))
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        roundn(F.col("n").cast("double") / tot.cast("double"), 6).alias("p"),
    )


Q_EVENT_TRANSITIONS_SQL = f"""
WITH pairs AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev_type,
         event_type AS next_type
  FROM events WHERE ts IS NOT NULL
), counts AS (
  SELECT prev_type, next_type, COUNT(*) AS n
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
), totals AS (
  SELECT prev_type, SUM(n) AS _tot FROM counts GROUP BY prev_type
)
SELECT c.prev_type, c.next_type, c.n,
       {sql_roundn("CAST(n AS DOUBLE) / CAST(_tot AS DOUBLE)", 6)} AS p
FROM counts c JOIN totals USING (prev_type)
"""


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve over user lifetimes (Kaplan & Meier 1958),
# the standard retention estimator under right-censoring: a user's
# lifetime is last-event-day − first-event-day; users whose last event
# falls within CENSOR_DAYS of the corpus horizon are censored (still
# alive), contributing to the at-risk set but not to the death counts.
# S(t) = Π_{t_i ≤ t} (1 − d_i / n_i), computed as exp(Σ ln·) with a
# zero-factor guard (once a time step kills everyone at risk, survival
# is exactly 0 from there on — no ln(0)).
#
# Scale shape: the per-user lifetime rollup is the only fact-grain
# shuffle (user_id keys — millions of partitions). Everything after runs
# on the lifetime HISTOGRAM, whose row count is bounded by the DAY-GRAIN
# domain (t = whole days between first and last event: ~36.5k rows even
# for a century-long corpus at ANY row count), so its global ordered
# windows are value-domain-bounded artifacts — never a fact-table
# single-partition sort. This bounded-domain assumption is PINNED by
# tests/test_plan_budget.py::test_global_window_allowlist: the window's
# input must remain the day-grain `t` aggregate; an edit that re-points
# it at a non-quantized column (where the blocked_cumsum rewrite of
# q_ks_test/q_mannwhitney_u would be required) fails there loudly.
# (The KM chain also running-MAXes a flag and running-SUMs ln(factor) —
# fold shapes blocked_cumsum doesn't carry — which is why this plan pins
# the bounded domain instead of rewiring.)
# The ln/exp fold order is the single
# ascending-t order in both engines, so the double chain is identical
# before the stabilizing roundn.
# ---------------------------------------------------------------------------

CENSOR_DAYS = 7


def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            "timestampdiff(MICROSECOND, to_timestamp_ntz('1970-01-01 00:00:00'), ts)"
        ).alias("us"),
    )
    days = ev.select("user_id", F.expr(f"us DIV {DAY_US}").alias("day"))
    life = days.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    # Collapse the per-user rows to a (lifetime, last-day) histogram —
    # bounded by the day domain² — and localCheckpoint it so the horizon
    # scalar and the censor flags both read the materialized artifact
    # instead of re-running the fact scan (without this, column pruning
    # specializes the horizon branch's subtree and defeats exchange
    # reuse: measured 2 full scans; the q_minhash_jaccard_est
    # bounded-candidates technique).
    hist0 = (
        life.select((F.col("d1") - F.col("d0")).alias("t"), "d1")
        .groupBy("t", "d1")
        .agg(F.count(F.lit(1)).alias("m"))
        .localCheckpoint(eager=False)
    )
    horizon = hist0.agg(F.max("d1").alias("dmax"))
    c = (F.col("dmax") - F.col("d1") < CENSOR_DAYS).cast("int")
    hist = (
        hist0.crossJoin(F.broadcast(horizon))
        .select("t", "m", c.alias("c"))
        .groupBy("t")
        .agg(
            F.sum(F.col("m") * (F.lit(1) - F.col("c"))).alias("n_deaths"),
            F.sum(F.col("m") * F.col("c")).alias("n_censored"),
            F.sum("m").alias("_n_end"),
        )
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    n_total = F.sum("_n_end").over(Window.partitionBy())
    at_risk = n_total - F.sum("_n_end").over(w) + F.col("_n_end")
    km = hist.withColumn("n_at_risk", at_risk).withColumn(
        "_factor",
        (F.col("n_at_risk") - F.col("n_deaths")).cast("double")
        / F.col("n_at_risk").cast("double"),
    )
    dead = F.max((F.col("_factor") <= 0).cast("int")).over(w) == 1
    log_surv = F.sum(
        F.when(F.col("_factor") > 0, F.log("_factor")).otherwise(F.lit(0.0))
    ).over(w)
    return km.select(
        F.col("t").alias("t_days"),
        "n_deaths",
        "n_censored",
        "n_at_risk",
        roundn(
            F.when(dead, F.lit(0.0)).otherwise(F.exp(log_surv)), 6
        ).alias("survival"),
    )


Q_SURVIVAL_KM_SQL = f"""
WITH life AS (
  SELECT user_id,
         MIN(epoch_us(ts) // {DAY_US}) AS d0,
         MAX(epoch_us(ts) // {DAY_US}) AS d1
  FROM events GROUP BY user_id
), horizon AS (
  SELECT MAX(epoch_us(ts) // {DAY_US}) AS dmax FROM events
), per_user AS (
  SELECT d1 - d0 AS t,
         CASE WHEN dmax - d1 < {CENSOR_DAYS} THEN 1 ELSE 0 END AS c
  FROM life CROSS JOIN horizon
), hist AS (
  SELECT t,
         CAST(SUM(1 - c) AS BIGINT) AS n_deaths,
         CAST(SUM(c) AS BIGINT) AS n_censored,
         CAST(COUNT(*) AS BIGINT) AS n_end
  FROM per_user GROUP BY t
), km AS (
  SELECT t, n_deaths, n_censored,
         SUM(n_end) OVER () - SUM(n_end) OVER w + n_end AS n_at_risk
  FROM hist
  WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), factors AS (
  SELECT *,
         CAST(n_at_risk - n_deaths AS DOUBLE) / CAST(n_at_risk AS DOUBLE) AS factor
  FROM km
)
SELECT t AS t_days, n_deaths, n_censored, CAST(n_at_risk AS BIGINT) AS n_at_risk,
       {sql_roundn(
           "CASE WHEN MAX(CASE WHEN factor <= 0 THEN 1 ELSE 0 END) OVER w = 1"
           " THEN 0.0"
           " ELSE exp(SUM(CASE WHEN factor > 0 THEN ln(factor) ELSE 0.0 END) OVER w)"
           " END", 6)} AS survival
FROM factors
WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# SCD-type-2 state history: collapse each user's event-type log into runs of
# consecutive equal states with half-open [valid_from, valid_to) ranges —
# operators/scd.collapse_runs (gaps-and-islands). All windows partition by
# user_id (high-cardinality); the run collapse rides the window exchange
# (subset rule), so the whole build is 2 Exchanges. The oracle mirrors the
# flip-detection + running-sum island numbering literally.
# ---------------------------------------------------------------------------

def q_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.scd import collapse_runs

    # NULL-ts policy: state history is a time-ordered run collapse —
    # un-timed events are excluded in both engines (round-7 sweep).
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    ).select(
        "user_id", "event_type", "ts", "event_id"
    )
    return collapse_runs(ev, ["user_id"], ["ts", "event_id"], "event_type")


Q_USER_STATE_HISTORY_SQL = """
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN ROW_NUMBER() OVER w = 1
                OR LAG(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS flip
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, event_type, ts,
         SUM(flip) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS run
  FROM flagged
), runs AS (
  SELECT user_id, run, MIN(event_type) AS event_type,
         MIN(ts) AS valid_from, COUNT(*) AS run_len
  FROM numbered GROUP BY user_id, run
)
SELECT user_id, event_type, valid_from,
       LEAD(valid_from) OVER w2 AS valid_to,
       run_len,
       (LEAD(valid_from) OVER w2 IS NULL) AS is_current
FROM runs
WINDOW w2 AS (PARTITION BY user_id ORDER BY run)
"""


# ---------------------------------------------------------------------------
# Windowed multi-touch attribution: each purchase splits one unit of credit
# over the click/view touches in its trailing 7-day window, proportional to
# touch counts (linear attribution). Touch counts come from ONE range window
# per user (no purchase×touch join materializes); per-purchase credits are
# quantized to 1e-9 BIGINTs so the corpus-wide credit totals are exact
# integer sums (order-independent, map-side combinable) rather than a
# shuffle-layout-dependent double reduction. decimal(38,0) accumulator per
# the repo-wide BIGINT-vs-HUGEINT rule.
# ---------------------------------------------------------------------------

_ATTR_WINDOW_US = 7 * DAY_US


def q_attribution_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND,"
            " to_timestamp_ntz('1970-01-01 00:00:00'), ts)"
        ).alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_ATTR_WINDOW_US, -1)
    )
    touch = lambda t: F.sum(  # noqa: E731
        F.when(F.col("event_type") == t, 1).otherwise(0)
    ).over(w)
    purchases = (
        ev.withColumn("n_clicks", touch("click"))
        .withColumn("n_views", touch("view"))
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("n_clicks") + F.col("n_views") > 0)
        )
        .withColumn("n_touch", F.col("n_clicks") + F.col("n_views"))
    )
    melted = purchases.select(
        "n_touch",
        F.explode(
            F.array(
                F.struct(
                    F.lit("click").alias("touch_type"),
                    F.col("n_clicks").alias("n"),
                ),
                F.struct(
                    F.lit("view").alias("touch_type"),
                    F.col("n_views").alias("n"),
                ),
            )
        ).alias("t")
    ).select(
        "t.touch_type",
        "t.n",
        # credit in integer nano-units: double division is per-row
        # deterministic; the SUM over the corpus is exact integer
        F.floor(
            F.col("t.n").cast("double") / F.col("n_touch").cast("double") * 1e9
            + F.lit(0.5)
        )
        .cast("long")
        .alias("credit_e9"),
    )
    return (
        melted.filter(F.col("n") > 0)
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            roundn(
                F.sum(F.col("credit_e9").cast("decimal(38,0)")).cast("double")
                / 1e9,
                6,
            ).alias("total_credit"),
            roundn(
                F.sum(F.col("n").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_touches"),
        )
    )


Q_ATTRIBUTION_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
), counted AS (
  SELECT event_id, event_type,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER w
           AS n_clicks,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER w
           AS n_views
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN {_ATTR_WINDOW_US} PRECEDING AND 1 PRECEDING)
), purchases AS (
  SELECT event_id, n_clicks, n_views, n_clicks + n_views AS n_touch
  FROM counted
  WHERE event_type = 'purchase' AND n_clicks + n_views > 0
), melted AS (
  SELECT t.touch_type, t.n,
         CAST(FLOOR(CAST(t.n AS DOUBLE) / CAST(n_touch AS DOUBLE) * 1e9
                    + 0.5) AS BIGINT) AS credit_e9
  FROM purchases,
       UNNEST([{{'touch_type': 'click', 'n': n_clicks}},
               {{'touch_type': 'view', 'n': n_views}}]) AS u(t)
)
SELECT touch_type,
       COUNT(*) AS n_conversions,
       {sql_roundn("CAST(SUM(credit_e9) AS DOUBLE) / 1e9", 6)}
         AS total_credit,
       {sql_roundn("CAST(SUM(n) AS DOUBLE) / COUNT(*)", 6)} AS avg_touches
FROM melted
WHERE n > 0
GROUP BY touch_type
"""


# ---------------------------------------------------------------------------
# CUSUM changepoint detection on daily revenue per event type: the day with
# the maximum |cumulative deviation from the per-type mean| — the classic
# level-shift detector. ALL-INTEGER: with c_i the day's cents total, D the
# day count and T = Σc_j, the statistic S_d = Σ_{i≤d}(c_i − T/D) scaled by D
# is S_d·D = D·prefix_d − d·T — exact integers, no per-day division whose
# engine-specific decimal rounding could flip a floor. The corpus pass is
# ONE (type, day) groupBy; every window runs over the ≤|types|·|days|
# aggregated artifact (the q_survival_km pattern: aggregate first, window
# over the bounded artifact — fine on a low-cardinality key because the
# input is already tiny).
# ---------------------------------------------------------------------------

def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts policy: a day series has no slot for an unknown day —
    # NULL-ts rows are excluded in both engines (the NULL day group
    # would otherwise sort first in Spark, last in DuckDB; round-7
    # time-axis sweep).
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = (
        ev.select(
            "event_type",
            # date_trunc (timestamp), not to_date: Spark DATE comes back
            # to pandas as datetime.date objects while DuckDB DATE
            # arrives as datetime64 — a dtype mismatch the typed oracle
            # harness rejects even when the values agree
            F.date_trunc("DAY", F.col("ts")).alias("day"),
            cents("value").alias("vc"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum(F.col("vc").cast("decimal(38,0)")).alias("c"))
    )
    w_all = Window.partitionBy("event_type")
    w_ord = Window.partitionBy("event_type").orderBy("day")
    scored = daily.select(
        "event_type",
        "day",
        (
            F.count(F.lit(1)).over(w_all)
            * F.sum("c").over(
                w_ord.rowsBetween(Window.unboundedPreceding, 0)
            )
            - F.row_number().over(w_ord) * F.sum("c").over(w_all)
        ).alias("sd"),
        F.count(F.lit(1)).over(w_all).alias("n_days"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("sd")).desc(), F.col("day").asc()
    )
    return (
        scored.withColumn("_r", F.row_number().over(pick))
        .filter(F.col("_r") == 1)
        .select(
            "event_type",
            "n_days",
            F.col("day").alias("change_day"),
            # |S_d·D| / D² / 100 = the plain CUSUM peak in dollars
            roundn(
                F.abs(F.col("sd")).cast("double")
                / F.col("n_days")
                / F.col("n_days")
                / 100.0,
                4,
            ).alias("cusum_peak_dollars"),
        )
    )


Q_CUSUM_SQL = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS c
  FROM events
  WHERE ts IS NOT NULL
  GROUP BY 1, 2
), scored AS (
  SELECT event_type, day,
         COUNT(*) OVER wa
           * SUM(c) OVER (wo ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - ROW_NUMBER() OVER wo * SUM(c) OVER wa AS sd,
         COUNT(*) OVER wa AS n_days
  FROM daily
  WINDOW wa AS (PARTITION BY event_type),
         wo AS (PARTITION BY event_type ORDER BY day)
), picked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY ABS(sd) DESC, day ASC) AS r
  FROM scored
)
SELECT event_type, n_days, day AS change_day,
       {sql_roundn(
           "CAST(ABS(sd) AS DOUBLE) / n_days / n_days / 100.0", 4)}
         AS cusum_peak_dollars
FROM picked WHERE r = 1
"""


# ---------------------------------------------------------------------------
# Exact two-sample Kolmogorov–Smirnov test: do click values and purchase
# values come from the same distribution? D = max|F1(v) − F2(v)| computed
# EXACTLY over the pooled value DISTRIBUTION (one groupBy on cents; both
# samples' cumulative counts ride one blocked prefix sum over the
# distinct values — operators/ranks.blocked_cumsum, so the near-unique
# cents domain never funnels through a single task's sort).
# The max is located on the integer numerator |c1·n2 − c2·n1| (decimal /
# HUGEINT — no float CDF subtraction), so the argmax value and the
# statistic are bit-exact cross-engine; ties broken at the smallest value.
# ---------------------------------------------------------------------------

_KS_A, _KS_B = "click", "purchase"


def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_KS_A, _KS_B) & F.col("value").isNotNull()
    )
    dist = ev.select(
        cents("value").alias("v"),
        F.when(F.col("event_type") == _KS_A, 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == _KS_B, 1).otherwise(0).alias("b"),
    ).groupBy("v").agg(
        F.sum("a").alias("c1"), F.sum("b").alias("c2")
    )
    # distinct cents are near-unique — cumulative counts via the blocked
    # prefix sum (operators/ranks), never a single-task global window;
    # the argmax is ONE struct-max aggregate (max num, ties -> min v),
    # not a row_number over a second global sort
    from ubparquet_spark.operators.ranks import blocked_cumsum

    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    cum = blocked_cumsum(
        dist,
        ["v"],
        {"cc1": (dec("c1"), "inclusive"), "cc2": (dec("c2"), "inclusive")},
        totals={"n1": dec("c1"), "n2": dec("c2")},
    )
    scored = cum.select(
        "v",
        F.abs(
            F.col("cc1") * F.col("n2") - F.col("cc2") * F.col("n1")
        ).alias("num"),
        "n1",
        "n2",
    )
    best = scored.agg(
        F.max(
            F.struct(
                F.col("num"), (-F.col("v")).alias("nv"), F.col("n1"), F.col("n2")
            )
        ).alias("b")
    # empty pooled input: max() yields one null struct where the oracle's
    # WHERE-filtered pick yields zero rows — drop it for parity
    ).filter(F.col("b").isNotNull())
    return best.select(
        F.col("b.n1").cast("long").alias("n_click"),
        F.col("b.n2").cast("long").alias("n_purchase"),
        (-F.col("b.nv") / 100.0).alias("ks_at_value"),
        roundn(
            F.col("b.num").cast("double")
            / (F.col("b.n1") * F.col("b.n2")).cast("double"),
            6,
        ).alias("ks_stat"),
    )


Q_KS_SQL = f"""
WITH dist AS (
  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
         SUM(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END) AS c2
  FROM events
  WHERE event_type IN ('{_KS_A}', '{_KS_B}') AND value IS NOT NULL
  GROUP BY 1
), scored AS (
  SELECT v,
         ABS(SUM(CAST(c1 AS HUGEINT)) OVER wo * SUM(CAST(c2 AS HUGEINT)) OVER wa
             - SUM(CAST(c2 AS HUGEINT)) OVER wo * SUM(CAST(c1 AS HUGEINT)) OVER wa)
           AS num,
         SUM(CAST(c1 AS HUGEINT)) OVER wa AS n1,
         SUM(CAST(c2 AS HUGEINT)) OVER wa AS n2
  FROM dist
  WINDOW wo AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wa AS ()
), picked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY num DESC, v ASC) AS r FROM scored
)
SELECT CAST(n1 AS BIGINT) AS n_click,
       CAST(n2 AS BIGINT) AS n_purchase,
       v / 100.0 AS ks_at_value,
       {sql_roundn(
           "CAST(num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)", 6)} AS ks_stat
FROM picked WHERE r = 1
"""


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation of daily revenue per event type — the "is there
# day-over-day momentum?" time-series screen. One (type, day) corpus
# groupBy; the lag pairing and the Pearson sums all run over the bounded
# daily artifact in EXACT integer cents (Σxy ≤ ~1e28 — decimal(38,0) /
# HUGEINT), with one double expression at the end.
# ---------------------------------------------------------------------------

def q_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts policy: same day-series exclusion as q_cusum_changepoint.
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = (
        ev.select(
            "event_type",
            F.date_trunc("DAY", F.col("ts")).alias("day"),
            cents("value").alias("vc"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("vc").alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    pairs = daily.select(
        "event_type",
        F.col("c").alias("x"),
        F.lag("c").over(w).alias("y"),
    ).filter(F.col("y").isNotNull())
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    return sums.select(
        "event_type",
        F.col("n").alias("n_pairs"),
        roundn(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("autocorr_lag1"),
    )


Q_AUTOCORR_SQL = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS c
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
), pairs AS (
  SELECT event_type, c AS x,
         LAG(c) OVER (PARTITION BY event_type ORDER BY day) AS y
  FROM daily
), sums AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM pairs WHERE y IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, n AS n_pairs,
       {sql_roundn(
           "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
           " / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
           "         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
           "        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
           "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))", 6)}
         AS autocorr_lag1
FROM sums
"""


# ---------------------------------------------------------------------------
# Exact Mann–Whitney U (rank-sum) test — the rank-based sibling of
# q_ks_test on the same click-vs-purchase samples. Midranks make the
# statistic rational with denominator 2, so everything is carried ×2 as
# EXACT integers: 2·R₁ = Σ_v c1_v·(2·before_v + c_v + 1) over the pooled
# value distribution (one groupBy + a blocked prefix sum over the
# distinct values, operators/ranks — the near-unique cents domain never
# single-task sorts), then 2U = 2R₁ − n1(n1+1).
# AUC = U/(n1·n2) is the one double division at the end. decimal(38,0) /
# HUGEINT throughout — no float rank arithmetic.
# ---------------------------------------------------------------------------

def q_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_KS_A, _KS_B) & F.col("value").isNotNull()
    )
    dist = ev.select(
        cents("value").alias("v"),
        F.when(F.col("event_type") == _KS_A, 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == _KS_B, 1).otherwise(0).alias("b"),
    ).groupBy("v").agg(
        F.sum("a").alias("c1"), F.sum("b").alias("c2")
    )
    # "before" counts via the blocked prefix sum over the near-unique
    # cents domain (operators/ranks) — no single-task global window
    from ubparquet_spark.operators.ranks import blocked_cumsum

    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    c = dec("c1") + dec("c2")
    cum = blocked_cumsum(
        dist,
        ["v"],
        {"before": (dec("c1") + dec("c2"), "exclusive")},
        totals={"n1": dec("c1"), "n2": dec("c2")},
    )
    scored = cum.select(
        (dec("c1") * (2 * F.col("before") + c + 1)).alias("term"),
        "n1",
        "n2",
    )
    sums = scored.groupBy("n1", "n2").agg(F.sum("term").alias("r1x2"))
    u2 = F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)
    return sums.select(
        F.col("n1").cast("long").alias("n_click"),
        F.col("n2").cast("long").alias("n_purchase"),
        (u2.cast("double") / 2.0).alias("u_stat"),
        roundn(
            u2.cast("double") / 2.0 / (F.col("n1") * F.col("n2")).cast("double"),
            6,
        ).alias("auc"),
    )


Q_MANNWHITNEY_SQL = f"""
WITH dist AS (
  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
         SUM(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END) AS c2
  FROM events
  WHERE event_type IN ('{_KS_A}', '{_KS_B}') AND value IS NOT NULL
  GROUP BY 1
), scored AS (
  SELECT CAST(c1 AS HUGEINT)
           * (2 * COALESCE(SUM(CAST(c1 + c2 AS HUGEINT)) OVER
                (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0)
              + (c1 + c2) + 1) AS term,
         SUM(CAST(c1 AS HUGEINT)) OVER () AS n1,
         SUM(CAST(c2 AS HUGEINT)) OVER () AS n2
  FROM dist
), sums AS (
  SELECT n1, n2, SUM(term) AS r1x2 FROM scored GROUP BY n1, n2
)
SELECT CAST(n1 AS BIGINT) AS n_click,
       CAST(n2 AS BIGINT) AS n_purchase,
       CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u_stat,
       {sql_roundn(
           "CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0"
           " / CAST(n1 * n2 AS DOUBLE)", 6)} AS auc
FROM sums
"""


# ---------------------------------------------------------------------------
# Key-skew profile: the "measure before you salt" diagnostic for the
# partitioning decisions operators/skew documents (BENCHNOTES round-6
# table: salting pays off only for sort-shaped skew on genuinely hot
# keys — this query is how you find out whether you HAVE one). One row:
# key count, row count, the hottest key's share, and the median/p99 of
# the key-frequency distribution with their ratio. Scale shape: one
# fact-grain groupBy to key counts, then everything runs on the
# FREQUENCY histogram (distinct frequency values — tiny), whose running
# total rides blocked_cumsum like every other value-distribution plan
# (frequency domains are near-dense but unbounded at the top).
# Nearest-rank (ceil) percentile definition, exact integers throughout.
# ---------------------------------------------------------------------------

SKEW_P_HI = 0.99


def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.ranks import blocked_cumsum

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    dist = counts.groupBy("c").agg(F.count(F.lit(1)).alias("k"))
    cum = blocked_cumsum(
        dist,
        ["c"],
        {"cum": ("k", "inclusive")},
        totals={"n_keys": "k", "n_rows": F.col("c") * F.col("k")},
    )
    med = F.min(
        F.when(F.col("cum") >= F.ceil(0.5 * F.col("n_keys")), F.col("c"))
    )
    p99 = F.min(
        F.when(
            F.col("cum") >= F.ceil(SKEW_P_HI * F.col("n_keys")), F.col("c")
        )
    )
    # empty-input parity: groupBy yields 0 rows on an empty events table;
    # the oracle's ungrouped aggregate carries HAVING COUNT(*) > 0 so both
    # engines emit 0 rows (q_ks_test convention).
    return cum.groupBy("n_keys", "n_rows").agg(
        F.max("c").alias("top1"),
        med.alias("median_freq"),
        p99.alias("p99_freq"),
    ).select(
        "n_keys",
        "n_rows",
        F.col("top1").alias("top1_count"),
        roundn(F.col("top1").cast("double") / F.col("n_rows"), 6).alias(
            "top1_share"
        ),
        "median_freq",
        "p99_freq",
        roundn(
            F.col("top1").cast("double") / F.col("median_freq"), 4
        ).alias("skew_ratio"),
    )


Q_KEY_SKEW_SQL = f"""
WITH counts AS (
  SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
), dist AS (
  SELECT c, COUNT(*) AS k FROM counts GROUP BY c
), cum AS (
  SELECT c, k,
         SUM(k) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum,
         SUM(k) OVER () AS n_keys,
         SUM(c * k) OVER () AS n_rows,
         MAX(c) OVER () AS top1
  FROM dist
)
SELECT CAST(MAX(n_keys) AS BIGINT) AS n_keys,
       CAST(MAX(n_rows) AS BIGINT) AS n_rows,
       CAST(MAX(top1) AS BIGINT) AS top1_count,
       {sql_roundn("CAST(MAX(top1) AS DOUBLE) / MAX(n_rows)", 6)} AS top1_share,
       MIN(CASE WHEN cum >= CEIL(0.5 * n_keys) THEN c END) AS median_freq,
       MIN(CASE WHEN cum >= CEIL({SKEW_P_HI} * n_keys) THEN c END) AS p99_freq,
       {sql_roundn("CAST(MAX(top1) AS DOUBLE)"
                   " / MIN(CASE WHEN cum >= CEIL(0.5 * n_keys) THEN c END)", 4)}
         AS skew_ratio
FROM cum
HAVING COUNT(*) > 0
"""


# ---------------------------------------------------------------------------
# Incremental summary-table maintenance, driver-checked: the per-type
# corpus statistics computed THROUGH the mergeable-state path
# (operators/incremental.py) — two disjoint deltas split at mid-month
# (NULL timestamps ride with the first delta so the split is exhaustive),
# each reduced to a state table, states merged, metrics finalized. The
# oracle is the full recompute as one plain GROUP BY: the driver hash
# thereby pins the state ALGEBRA (delta-fold == recompute) every round,
# not just in unit tests. Exact fields only — counts and decimal sums
# are order-independent so the fold is bit-identical; the HLL distinct
# states have no SQL twin and stay pytest-verified (bounded error +
# union-equals-single-shot exactness in test_incremental_agg.py).
# At 100 TB this is the plan shape that replaces a nightly full rescan:
# each delta costs one scan of ITSELF, the merge costs state rows (#keys).
# ---------------------------------------------------------------------------

INCR_SPLIT = "2024-01-15"


def q_incremental_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.incremental import (
        agg_state,
        finalize_state,
        merge_states,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", cents("value").alias("vc")
    )
    old = ev.filter(F.col("ts").isNull() | (F.col("ts") < INCR_SPLIT))
    new = ev.filter(F.col("ts") >= INCR_SPLIT)
    spec = dict(sums=["vc"], mins=["ts"], maxs=["ts"])
    merged = merge_states(
        [agg_state(old, ["event_type"], **spec),
         agg_state(new, ["event_type"], **spec)],
        ["event_type"],
    )
    fin = finalize_state(merged)
    # exact-cents convention: the decimal state sum is an integer count of
    # cents, so casting to double and dividing by 100 is bit-identical to
    # the oracle's BIGINT-cents sum (both < 2^53 of the scaled unit)
    return fin.select(
        "event_type",
        "n_rows",
        (F.col("sum_vc").cast("double") / 100.0).alias("sum_value"),
        "min_ts",
        "max_ts",
    )


Q_INCREMENTAL_STATS_SQL = """
SELECT event_type,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100.0 AS sum_value,
       MIN(ts) AS min_ts,
       MAX(ts) AS max_ts
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# EWMA smoothing over the daily revenue series (round 9): the classic
# monitoring smoother, exact across engines. Daily revenue is an exact
# integer-cents aggregate (one partial-aggregatable shuffle); the EWMA
# recursion ewma_i = α·x_i + (1−α)·ewma_{i−1} is inherently sequential,
# so it runs per event_type over the BOUNDED day-grain artifact (≤366
# rows/type/year — never the fact table): Spark folds the sorted
# (day, cents) array with the accumulator ROUNDED to 6 decimals at every
# step, and the oracle replays the identical rounded recursion as a
# recursive CTE — intermediate rounding is what makes a sequential
# double recursion bit-identical across engines (the q_survival_km
# ln-fold technique). α = 0.25 is exactly representable in binary.
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.25


def q_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts policy: same day-series exclusion as q_autocorr_daily;
    # an all-NULL-value day contributes rev = 0 in both engines.
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = (
        ev.select(
            "event_type",
            F.date_trunc("DAY", F.col("ts")).alias("day"),
            cents("value").alias("vc"),
        )
        .groupBy("event_type", "day")
        .agg(F.coalesce(F.sum("vc"), F.lit(0)).alias("rc"))
    )
    a, b = EWMA_ALPHA, 1.0 - EWMA_ALPHA
    per_type = daily.groupBy("event_type").agg(
        F.expr("array_sort(collect_list(struct(day, rc)))").alias("ds")
    )
    ew = F.expr(
        "aggregate(ds, CAST(array() AS ARRAY<DOUBLE>), (acc, s) ->"
        " array_append(acc, floor((CASE WHEN size(acc) = 0"
        " THEN s.rc / 100.0D"
        f" ELSE {a}D * (s.rc / 100.0D) + {b}D * element_at(acc, -1)"
        " END) * 1000000.0D + 0.5D) / 1000000.0D))"
    )
    return (
        per_type.select("event_type", "ds", ew.alias("ew"))
        .select(
            "event_type",
            F.posexplode("ds").alias("i", "s"),
            F.col("ew"),
        )
        .select(
            "event_type",
            F.col("s.day").alias("day"),
            (F.col("s.rc") / 100.0).alias("rev"),
            F.expr("element_at(ew, i + 1)").alias("ewma"),
        )
    )


Q_EWMA_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         COALESCE(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)), 0) AS rc
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
), idx AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM daily
), ew AS (
  SELECT event_type, day, rc, i,
         FLOOR((rc / 100.0) * 1000000.0 + 0.5) / 1000000.0 AS ewma
  FROM idx WHERE i = 1
  UNION ALL
  SELECT d.event_type, d.day, d.rc, d.i,
         FLOOR(({EWMA_ALPHA} * (d.rc / 100.0)
                + {1.0 - EWMA_ALPHA} * e.ewma) * 1000000.0 + 0.5)
           / 1000000.0
  FROM ew e JOIN idx d ON d.event_type = e.event_type AND d.i = e.i + 1
)
SELECT event_type, day, rc / 100.0 AS rev, ewma FROM ew
"""


# ---------------------------------------------------------------------------
# PSI distribution drift (round 9): the Population Stability Index between
# the first and second half of the event log, per event_type — the
# standard "did my feature distribution move" monitor for serving/training
# skew. Split point is exact integer epoch-micros midpoint; bins are 10
# equal-width buckets over the EARLY half's exact integer-cents [min, max]
# per type (the reference window owns the binning, as in production PSI);
# both counts come from ONE (type, bin) shuffle over a single scan pass.
# p/q are Laplace-smoothed exact rationals; the Σ(p−q)·ln(p/q) over the
# 10-bin artifact runs as an ORDERED fold in both engines (bit-stable).
# Types with no early rows put all mass in bin 0 (drift by construction).
# ---------------------------------------------------------------------------

PSI_BINS = 10


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND,"
            " to_timestamp_ntz('1970-01-01 00:00:00'), ts)"
        ).alias("us"),
        cents("value").alias("vc"),
    )
    # Integer floor division in BOTH engines: double-divide-then-cast
    # truncates in Spark but DuckDB's CAST(... AS BIGINT) rounds half
    # away from zero, so an odd min+max would put the two mids 1 µs
    # apart and split any row at that exact microsecond differently.
    split = ev.agg(
        F.expr("(min(us) + max(us)) div 2").alias("mid")
    )
    tagged = ev.crossJoin(F.broadcast(split)).select(
        "event_type", "vc", (F.col("us") < F.col("mid")).alias("early")
    )
    bounds = (
        tagged.filter("early")
        .groupBy("event_type")
        .agg(F.min("vc").alias("mn"), F.max("vc").alias("mx"))
    )
    binned = tagged.join(F.broadcast(bounds), "event_type", "left").select(
        "event_type",
        "early",
        F.expr(
            "CASE WHEN mn IS NULL OR mx = mn THEN 0 ELSE"
            f" least({PSI_BINS - 1}, greatest(0,"
            " CAST(floor((vc - mn) /"
            f" ((mx - mn) / {float(PSI_BINS)}D)) AS INT))) END"
        ).alias("bin"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("early"), 1).otherwise(0)).alias("ne"),
        F.sum(F.when(F.col("early"), 0).otherwise(1)).alias("nl"),
    )
    per_type = counts.groupBy("event_type").agg(
        F.expr("map_from_entries(collect_list(struct(bin, ne)))").alias("me"),
        F.expr("map_from_entries(collect_list(struct(bin, nl)))").alias("ml"),
        F.sum("ne").alias("te"),
        F.sum("nl").alias("tl"),
    )
    p = (
        f"((coalesce(element_at(me, b), 0L) + 1)"
        f" / CAST(te + {PSI_BINS} AS DOUBLE))"
    )
    q = (
        f"((coalesce(element_at(ml, b), 0L) + 1)"
        f" / CAST(tl + {PSI_BINS} AS DOUBLE))"
    )
    psi = F.expr(
        f"aggregate(sequence(0, {PSI_BINS - 1}), CAST(0.0 AS DOUBLE),"
        f" (acc, b) -> acc + ({p} - {q}) * ln({p} / {q}))"
    )
    return per_type.select(
        "event_type",
        F.col("te").alias("n_early"),
        F.col("tl").alias("n_late"),
        roundn(psi, 6).alias("psi"),
    )


def _psi_sql() -> str:
    p = (
        "((COALESCE(me[b][1], 0) + 1)"
        f" / CAST(te + {PSI_BINS} AS DOUBLE))"
    )
    q = (
        "((COALESCE(ml[b][1], 0) + 1)"
        f" / CAST(tl + {PSI_BINS} AS DOUBLE))"
    )
    return f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) AS us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
), split AS (
  SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM ev
), tagged AS (
  SELECT event_type, vc, us < mid AS early FROM ev CROSS JOIN split
), bounds AS (
  SELECT event_type, MIN(vc) AS mn, MAX(vc) AS mx
  FROM tagged WHERE early GROUP BY event_type
), binned AS (
  SELECT t.event_type, t.early,
         CASE WHEN b.mn IS NULL OR b.mx = b.mn THEN 0 ELSE
           LEAST({PSI_BINS - 1}, GREATEST(0,
             CAST(FLOOR((t.vc - b.mn)
               / ((b.mx - b.mn) / {float(PSI_BINS)})) AS INT))) END AS bin
  FROM tagged t LEFT JOIN bounds b ON t.event_type = b.event_type
), counts AS (
  SELECT event_type, bin,
         SUM(CASE WHEN early THEN 1 ELSE 0 END) AS ne,
         SUM(CASE WHEN early THEN 0 ELSE 1 END) AS nl
  FROM binned GROUP BY 1, 2
), per_type AS (
  SELECT event_type,
         MAP(list(bin), list(ne)) AS me,
         MAP(list(bin), list(nl)) AS ml,
         SUM(ne) AS te, SUM(nl) AS tl
  FROM counts GROUP BY event_type
)
SELECT event_type,
       CAST(te AS BIGINT) AS n_early,
       CAST(tl AS BIGINT) AS n_late,
       {sql_roundn(
           "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
           f" list_transform(range(0, {PSI_BINS}),"
           f" b -> ({p} - {q}) * ln({p} / {q}))),"
           " (acc, x) -> acc + x)", 6)} AS psi
FROM per_type
"""


Q_PSI_SQL = _psi_sql()


# ---------------------------------------------------------------------------
# Partition completeness gate (round 9) — the fifth data contract, on the
# FRESHNESS axis: for every (event_type, day) partition, actual row count
# vs the trailing mean of its last ≤7 OBSERVED days; a day delivering
# under half (pipeline dropped a shard upstream) or over double (double
# delivery) its trailing baseline is flagged BEFORE downstream consumers
# train on it. One (type, day) shuffle; the lag window runs over the
# bounded day-grain artifact keyed by type. The flags compare exact
# integers (2·n·cnt vs Σ) — no double thresholds to diverge on.
# ---------------------------------------------------------------------------

def q_partition_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("DAY", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    trailed = daily.select(
        "event_type",
        "day",
        "n_events",
        F.sum("n_events").over(w).alias("sn"),
        F.count("n_events").over(w).alias("cn"),
    )
    return trailed.select(
        "event_type",
        "day",
        "n_events",
        F.col("cn").alias("n_prior_days"),
        roundn(F.try_divide(F.col("sn").cast("double"), F.col("cn")), 6).alias(
            "expected"
        ),
        roundn(
            F.try_divide(
                F.col("n_events") * F.col("cn"), F.col("sn").cast("double")
            ),
            6,
        ).alias("ratio"),
        (
            (F.col("cn") > 0)
            & (F.lit(2) * F.col("n_events") * F.col("cn") < F.col("sn"))
        ).alias("under_delivered"),
        (
            (F.col("cn") > 0)
            & (F.col("n_events") * F.col("cn") > F.lit(2) * F.col("sn"))
        ).alias("over_delivered"),
    )


Q_PARTITION_COMPLETENESS_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS n_events
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
), trailed AS (
  SELECT event_type, day, n_events,
         SUM(n_events) OVER w AS sn,
         COUNT(n_events) OVER w AS cn
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, n_events,
       cn AS n_prior_days,
       FLOOR((CAST(sn AS DOUBLE) / NULLIF(cn, 0)) * 1000000 + 0.5)
         / 1000000 AS expected,
       FLOOR((n_events * cn / NULLIF(CAST(sn AS DOUBLE), 0)) * 1000000
             + 0.5) / 1000000 AS ratio,
       cn > 0 AND 2 * n_events * cn < sn AS under_delivered,
       cn > 0 AND n_events * cn > 2 * sn AS over_delivered
FROM trailed
"""


# ---------------------------------------------------------------------------
# Theil–Sen robust trend (staged in round 10, REGISTERED in round 11
# within the 6/round cap).  The median-of-pairwise-slopes estimator over the daily
# revenue series — the robust alternative to OLS when level shifts /
# outlier days would drag a least-squares line (29% breakdown point).
#
# Scale shape: ONE day-grain shuffle builds the ≤366-row/  (or N-day)
# daily artifact (localCheckpointed — three consumers); pairwise slopes
# are a self-join over that BOUNDED artifact (D(D−1)/2 ≤ ~67k pairs at a
# year), never over raw events.  Medians are exact order statistics by
# rank arithmetic: every slope is ONE integer-ratio double division
# (identical across engines), the lo/hi ranks are integers, and an
# even-count median averages two such doubles — bit-stable end to end;
# outputs rounded 6 dp as usual.
# ---------------------------------------------------------------------------


def q_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = (
        ev.select(
            F.datediff(
                F.date_trunc("DAY", F.col("ts")), F.lit("1970-01-01")
            ).alias("d"),
            cents("value").alias("vc"),
        )
        .groupBy("d")
        .agg(F.coalesce(F.sum("vc"), F.lit(0)).alias("rc"))
        .localCheckpoint(eager=False)
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("a.d") < F.col("b.d")).select(
        (
            (F.col("b.rc") - F.col("a.rc")).cast("double")
            / (F.col("b.d") - F.col("a.d")).cast("double")
        ).alias("s")
    )

    def _median(df: DataFrame, col: str) -> DataFrame:
        """Exact multiset median of a BOUNDED artifact column: global
        order statistics via one window over the artifact (allowlisted
        shape — the input is ≤ D² rows by construction)."""
        w = Window.orderBy(col)
        ranked = df.select(
            F.col(col), F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("m"),
        )
        # lo = floor((m+1)/2), hi = floor(m/2)+1: equal when m is odd
        # (one row selected), adjacent when even (two rows averaged)
        return ranked.filter(
            F.expr("rn = (m + 1) div 2 OR rn = m div 2 + 1")
        ).agg((F.sum(col) / F.count(F.lit(1))).alias("med"))

    slope = _median(slopes, "s").select(F.col("med").alias("slope"))
    resid = daily.crossJoin(F.broadcast(slope)).select(
        (
            F.col("rc").cast("double") / 100.0
            - F.col("slope") * F.col("d").cast("double") / 100.0
        ).alias("r"),
        "slope",
    )
    intercept = (
        _median(resid.select("r"), "r")
        .select(F.col("med").alias("intercept"))
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.count(F.lit(1)) * (F.count(F.lit(1)) - 1) / 2)
        .cast("long")
        .alias("n_pairs"),
    )
    return (
        stats.crossJoin(slope)
        .crossJoin(intercept)
        .select(
            "n_days",
            "n_pairs",
            roundn(F.col("slope") / 100.0, 6).alias("slope_rev_per_day"),
            roundn(F.col("intercept"), 6).alias("intercept_rev"),
        )
    )


Q_THEILSEN_SQL = """
WITH daily AS (
  SELECT datediff('day', DATE '1970-01-01', date_trunc('day', ts)) AS d,
         COALESCE(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)), 0) AS rc
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), slopes AS (
  SELECT CAST(b.rc - a.rc AS DOUBLE) / (b.d - a.d) AS s
  FROM daily a JOIN daily b ON a.d < b.d
), sranked AS (
  SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rn, COUNT(*) OVER () AS m
  FROM slopes
), slope AS (
  SELECT SUM(s) / COUNT(*) AS slope FROM sranked
  WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1
), resid AS (
  SELECT CAST(rc AS DOUBLE) / 100.0 - slope * d / 100.0 AS r
  FROM daily CROSS JOIN slope
), rranked AS (
  SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rn, COUNT(*) OVER () AS m
  FROM resid
), icept AS (
  SELECT SUM(r) / COUNT(*) AS intercept FROM rranked
  WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1
)
SELECT (SELECT COUNT(*) FROM daily) AS n_days,
       CAST((SELECT COUNT(*) FROM slopes) AS BIGINT) AS n_pairs,
       FLOOR((slope / 100.0) * 1000000 + 0.5) / 1000000 AS slope_rev_per_day,
       FLOOR(intercept * 1000000 + 0.5) / 1000000 AS intercept_rev
FROM slope CROSS JOIN icept
"""


QUERIES: dict[str, tuple] = {
    "q_ewma_daily": (q_ewma_daily, Q_EWMA_SQL),
    "q_theilsen_trend": (q_theilsen_trend, Q_THEILSEN_SQL),
    "q_psi_drift": (q_psi_drift, Q_PSI_SQL),
    "q_partition_completeness": (
        q_partition_completeness,
        Q_PARTITION_COMPLETENESS_SQL,
    ),
    "q_incremental_stats": (q_incremental_stats, Q_INCREMENTAL_STATS_SQL),
    "q_key_skew_profile": (q_key_skew_profile, Q_KEY_SKEW_SQL),
    "q_mannwhitney_u": (q_mannwhitney_u, Q_MANNWHITNEY_SQL),
    "q_autocorr_daily": (q_autocorr_daily, Q_AUTOCORR_SQL),
    "q_ks_test": (q_ks_test, Q_KS_SQL),
    "q_cusum_changepoint": (q_cusum_changepoint, Q_CUSUM_SQL),
    "q_user_state_history": (q_user_state_history, Q_USER_STATE_HISTORY_SQL),
    "q_attribution_window": (q_attribution_window, Q_ATTRIBUTION_SQL),
    "q_concurrent_sessions": (q_concurrent_sessions, Q_CONCURRENT_SESSIONS_SQL),
    "q_twap": (q_twap, Q_TWAP_SQL),
    "q_time_to_convert": (q_time_to_convert, Q_TIME_TO_CONVERT_SQL),
    "q_cohort_ltv": (q_cohort_ltv, Q_COHORT_LTV_SQL),
    "q_interarrival_stats": (q_interarrival_stats, Q_INTERARRIVAL_SQL),
    "q_rfm_segments": (q_rfm_segments, Q_RFM_SQL),
    "q_spatial_pairs": (q_spatial_pairs, Q_SPATIAL_PAIRS_SQL),
    "q_zorder_cells": (q_zorder_cells, Q_ZORDER_CELLS_SQL),
    "q_neighbor_degree": (q_neighbor_degree, Q_NEIGHBOR_DEGREE_SQL),
    "q_volume_anomaly": (q_volume_anomaly, Q_VOLUME_ANOMALY_SQL),
    "q_dau_mau": (q_dau_mau, Q_DAU_MAU_SQL),
    "q_first_touch": (q_first_touch, Q_FIRST_TOUCH_SQL),
    "q_fiducial_cut": (q_fiducial_cut, Q_FIDUCIAL_CUT_SQL),
    "q_events_outliers": (q_events_outliers, Q_EVENTS_OUTLIERS_SQL),
    "q_events_funnel": (q_events_funnel, Q_EVENTS_FUNNEL_SQL),
    "q_latest_event_per_user": (q_latest_event_per_user, Q_LATEST_EVENT_SQL),
    "q_stratified_sample": (q_stratified_sample, Q_STRATIFIED_SQL),
    "q_events_gap_fill": (q_events_gap_fill, Q_GAP_FILL_SQL),
    "q_event_pairs_10min": (q_event_pairs_10min, Q_EVENT_PAIRS_SQL),
    "q_events_time_rollup": (q_events_time_rollup, Q_TIME_ROLLUP_SQL),
    "q_asof_prev_click": (q_asof_prev_click, Q_ASOF_SQL),
    "q_pivot_user_events": (q_pivot_user_events, Q_PIVOT_SQL),
    "q_unpivot_metrics": (q_unpivot_metrics, Q_UNPIVOT_SQL),
    "q_events_dow": (q_events_dow, Q_EVENTS_DOW_SQL),
    "q_events_hourly": (q_events_hourly, Q_EVENTS_HOURLY_SQL),
    "q_events_sliding": (q_events_sliding, Q_EVENTS_SLIDING_SQL),
    "q_events_sessionize": (q_events_sessionize, Q_EVENTS_SESSIONIZE_SQL),
    "q_events_json": (q_events_json, Q_EVENTS_JSON_SQL),
    "q_events_user_mode": (q_events_user_mode, Q_EVENTS_USER_MODE_SQL),
    "q_events_voxelize": (q_events_voxelize, Q_EVENTS_VOXELIZE_SQL),
    "q_events_retention": (q_events_retention, Q_EVENTS_RETENTION_SQL),
    "q_event_transitions": (q_event_transitions, Q_EVENT_TRANSITIONS_SQL),
    "q_survival_km": (q_survival_km, Q_SURVIVAL_KM_SQL),
}
