"""Driver-contract query registry: every operator from SURVEY.md §2 (plus
the training-data ops) as a named (spark_fn, oracle_sql) pair over the
driver testdata tables.

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame whose
column NAMES and values match the DuckDB oracle SQL exactly (the driver
hashes values order-insensitively after sorting columns by name).

Parity rules applied throughout:
* session timezone pinned to UTC; timestamps returned as formatted strings
* computed doubles rounded to 6 (both sides); embedding math forced to
  double on the DuckDB side (``::DOUBLE[]``) to match Spark's accumulator
* deterministic tiebreaks (id columns) on every window/top-k
* Spark 4 runs ANSI mode: ``try_cast``/``TRY_CAST`` on both sides
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from logshipper_spark.functions import dedup, similarity, textstats
from logshipper_spark.operators import aggregate as agg


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ======================================================================
# §2.2 filters / mangle — over events (props is the '{"k": N}' parse target)
# ======================================================================

@q(
    "match_extract",
    """SELECT event_id,
              TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k_val
       FROM events""",
)
def match_extract(spark, sf_dir):
    """match: named-group regex extraction → new field (SURVEY §2.2 match)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract("props", '"k": ([0-9]+)', 1).try_cast("int").alias("k_val"),
    )


@q(
    "set_template",
    """SELECT event_id,
              event_type || '/' || regexp_extract(props, '"k": ([0-9]+)', 1) AS tag
       FROM events""",
)
def set_template(spark, sf_dir):
    """set: template interpolation {field}/{1} → new field (SURVEY §2.2 set)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.concat(
            F.col("event_type"), F.lit("/"), F.regexp_extract("props", '"k": ([0-9]+)', 1)
        ).alias("tag"),
    )


@q(
    "drop_filter",
    "SELECT event_id, event_type FROM events WHERE event_type <> 'error'",
)
def drop_filter(spark, sf_dir):
    """drop: predicate filter, pushed to the scan (SURVEY §2.2 drop)."""
    ev = _t(spark, sf_dir, "events")
    return ev.where(F.col("event_type") != "error").select("event_id", "event_type")


@q(
    "replace_redact",
    "SELECT event_id, regexp_replace(props, '[0-9]+', 'N', 'g') AS redacted FROM events",
)
def replace_redact(spark, sf_dir):
    """replace: regex span replacement (SURVEY §2.2 replace)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select("event_id", F.regexp_replace("props", "[0-9]+", "N").alias("redacted"))


@q(
    "mangle_chain",
    """SELECT event_id, upper(trim(event_type)) AS etype, value AS metric
       FROM events""",
)
def mangle_chain(spark, sf_dir):
    """strip+rename chained mangles as pure projections (SURVEY §2.2)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.upper(F.trim(F.col("event_type"))).alias("etype"),
        F.col("value").alias("metric"),
    )


@q(
    "json_extract",
    "SELECT event_id, TRY_CAST(props->>'$.k' AS INT) AS k_json FROM events",
)
def json_extract(spark, sf_dir):
    """json payload extraction: get_json_object (SURVEY §2.7 json)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").try_cast("int").alias("k_json")
    )


@q(
    "syslog_pri_decode",
    """SELECT event_id,
              (event_id % 192) AS pri,
              CAST((event_id % 192) % 8 AS INT) AS severity,
              CAST((event_id % 192) // 8 AS INT) AS facility,
              (['emerg','alert','crit','err','warning','notice','info','debug'])[CAST((event_id % 192) % 8 AS INT) + 1] AS severity_name
       FROM events""",
)
def syslog_pri_decode(spark, sf_dir):
    """syslog PRI decode: facility/severity arithmetic + name lookup
    (SURVEY §2.1 syslog input)."""
    ev = _t(spark, sf_dir, "events")
    sev_names = ["emerg", "alert", "crit", "err", "warning", "notice", "info", "debug"]
    pri = F.pmod(F.col("event_id"), F.lit(192))
    sev = F.pmod(pri, F.lit(8)).cast("int")
    return ev.select(
        "event_id",
        pri.alias("pri"),
        sev.alias("severity"),
        F.floor(pri / 8).cast("int").alias("facility"),
        F.element_at(F.array(*[F.lit(s) for s in sev_names]), sev + 1).alias("severity_name"),
    )


# ======================================================================
# §2.6 routing fan-out + §2.4 aggregates
# ======================================================================

@q(
    "route_fanout",
    """SELECT 'archive' AS sink, count(*) AS n FROM events
       UNION ALL
       SELECT 'errors' AS sink, count(*) AS n FROM events WHERE event_type = 'error'
       UNION ALL
       SELECT 'billing' AS sink, count(*) AS n FROM events WHERE event_type = 'purchase'""",
)
def route_fanout(spark, sf_dir):
    """multi-sink redistribute: sinks array + explode, per-sink counts
    (SURVEY §2.6 union/fan-out).  The counts right-join the literal sink
    list with coalesce(0) so a sink with ZERO matching events still emits
    its row — the oracle's scalar count(*) always does, and structural
    parity must not depend on every event type existing in the testdata
    (r4 review finding)."""
    ev = _t(spark, sf_dir, "events")
    sinks = F.concat(
        F.array(F.lit("archive")),
        F.when(F.col("event_type") == "error", F.array(F.lit("errors"))).otherwise(F.array()),
        F.when(F.col("event_type") == "purchase", F.array(F.lit("billing"))).otherwise(F.array()),
    )
    counts = ev.withColumn("sink", F.explode(sinks)).groupBy("sink").agg(
        F.count("*").alias("n")
    )
    all_sinks = spark.createDataFrame([("archive",), ("errors",), ("billing",)], "sink string")
    return all_sinks.join(counts, "sink", "left").select(
        "sink", F.coalesce("n", F.lit(0)).alias("n")
    )


@q(
    "counter_by_type",
    """SELECT event_type, count(*) AS n, round(sum(value), 4) AS total_value
       FROM events GROUP BY event_type""",
)
def counter_by_type(spark, sf_dir):
    """statsd counter: turns-per-role-shaped groupBy count (SURVEY §2.4)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value")
    )


@q(
    "events_per_minute",
    """SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS minute,
              count(*) AS n_events
       FROM events GROUP BY 1""",
)
def events_per_minute(spark, sf_dir):
    """tumbling 1-minute window counter (SURVEY §2.4 events-per-minute)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("minute", "ts"), "yyyy-MM-dd HH:mm:ss").alias("minute")
    ).agg(F.count("*").alias("n_events"))


@q(
    "rollup_timeseries",
    # the oracle mirrors the REAGGREGATION structure (hour from minute,
    # day from hour), not just the final values: sum-of-partial-sums is
    # what the operator computes, and round(6) absorbs the float
    # association differences between engines
    """WITH lv1 AS (
         SELECT date_trunc('minute', ts) AS b, event_type,
                count(*) AS n, sum(value) AS total,
                min(value) AS vmin, max(value) AS vmax
         FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
       lv2 AS (
         SELECT date_trunc('hour', b) AS b, event_type,
                sum(n) AS n, sum(total) AS total,
                min(vmin) AS vmin, max(vmax) AS vmax
         FROM lv1 GROUP BY 1, 2),
       lv3 AS (
         SELECT date_trunc('day', b) AS b, event_type,
                sum(n) AS n, sum(total) AS total,
                min(vmin) AS vmin, max(vmax) AS vmax
         FROM lv2 GROUP BY 1, 2)
       SELECT 'minute' AS resolution, strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
              event_type, n, round(total, 6) AS total,
              round(vmin, 6) AS vmin, round(vmax, 6) AS vmax FROM lv1
       UNION ALL
       SELECT 'hour', strftime(b, '%Y-%m-%d %H:%M:%S'), event_type, n,
              round(total, 6), round(vmin, 6), round(vmax, 6) FROM lv2
       UNION ALL
       SELECT 'day', strftime(b, '%Y-%m-%d %H:%M:%S'), event_type, n,
              round(total, 6), round(vmin, 6), round(vmax, 6) FROM lv3""",
)
def rollup_timeseries_q(spark, sf_dir):
    """Hypertable-style continuous-aggregate hierarchy (minute→hour→day):
    one scan at the finest level, coarser levels REAGGREGATED from the
    level below (operators/aggregate.py::rollup_timeseries) — the 100 TB
    path never re-reads raw events for the hour/day rollups."""
    ev = _t(spark, sf_dir, "events")
    # Partition-order-proof totals (r5 driver red row; VERDICT r5 #1):
    # sum DECIMAL-typed values so every level's total is EXACT and
    # association-order-independent — no Spark parallelism can flip the
    # 6th decimal any more.  events.value is decimal-clean (generated at
    # ≤3 fractional digits; decimal(30,9) gives 6 digits of slack), so
    # the exact decimal sum rounds at 6 places to the same value as the
    # oracle's float sum, whose dust (≪ the 5e-7 boundary margin for
    # values on a 1e-3 grid) cannot cross a rounding boundary.  min/max
    # are order-independent either way; the decimal round-trip of a
    # clean value is bit-identical to the original double.
    ev = ev.withColumn("value", F.col("value").cast("decimal(30,9)"))
    r = agg.rollup_timeseries(ev, "ts", "value", ["event_type"])
    return r.select(
        "resolution",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "event_type",
        "n",
        F.round(F.col("total").cast("double"), 6).alias("total"),
        F.round(F.col("vmin").cast("double"), 6).alias("vmin"),
        F.round(F.col("vmax").cast("double"), 6).alias("vmax"),
    )


@q(
    "range_join_windows",
    # plain BETWEEN join in the oracle; the Spark side must produce the
    # SAME pairs through the bucketized equi-join path
    """WITH w AS (
         SELECT user_id AS w_user, min(ts) AS w_start,
                min(ts) + INTERVAL 2 HOUR AS w_end
         FROM events WHERE user_id <= 10 GROUP BY 1)
       SELECT w.w_user, count(*) AS n_events,
              count(DISTINCT e.user_id) AS n_users
       FROM w JOIN events e ON e.ts >= w.w_start AND e.ts <= w.w_end
       GROUP BY w.w_user""",
)
def range_join_windows(spark, sf_dir):
    """Interval-containment join via the bucketized overlap strategy
    (operators/rangejoin.py): per-user 2-hour watch windows joined to ALL
    events falling inside them.  The plan is a shuffle EQUI-join on the
    time bucket + exact post-filter — never a BroadcastNestedLoopJoin /
    CartesianProduct, which is what a raw BETWEEN join lowers to."""
    from logshipper_spark.operators.rangejoin import range_join

    ev = _t(spark, sf_dir, "events")
    iv = (
        ev.where(F.col("user_id") <= 10)
        .groupBy(F.col("user_id").alias("w_user"))
        .agg(F.min("ts").alias("w_start"))
        .withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 2 HOURS"))
    )
    pts = ev.select(
        F.col("ts").alias("e_ts"), F.col("user_id").alias("e_user"), "event_id"
    )
    joined = range_join(pts, iv, "e_ts", "w_start", "w_end", bucket_seconds=600)
    return joined.groupBy("w_user").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("e_user").alias("n_users"),
    )


@q(
    "timer_percentiles",
    """SELECT event_type, count(*) AS n,
              round(avg(value), 6) AS avg_v,
              round(quantile_cont(value, 0.5), 6) AS p50,
              round(quantile_cont(value, 0.9), 6) AS p90,
              round(quantile_cont(value, 0.99), 6) AS p99
       FROM events WHERE value IS NOT NULL GROUP BY event_type""",
)
def timer_percentiles(spark, sf_dir):
    """statsd timer distribution (SURVEY §2.4 timers); exact percentile for
    oracle parity, percentile_approx is the 100 TB path."""
    ev = _t(spark, sf_dir, "events")
    return agg.timer_percentiles(ev, "value", "event_type")


@q(
    "gauge_last",
    """SELECT user_id, value AS last_value FROM events
       QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""",
)
def gauge_last(spark, sf_dir):
    """statsd gauge: last value per key, deterministic tiebreak (SURVEY §2.4)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("value").alias("last_value"))
    )


@q(
    "distinct_users",
    "SELECT count(DISTINCT user_id) AS n_users FROM events",
)
def distinct_users(spark, sf_dir):
    """exact distinct for parity; approx_count_distinct is the scale path."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(F.countDistinct("user_id").alias("n_users"))


# ======================================================================
# §2.5 windows: stable ordering, edge, sessionize, top-k
# ======================================================================

@q(
    "stable_order_rownum",
    """SELECT event_id,
              CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS turn_no
       FROM events""",
)
def stable_order_rownum(spark, sf_dir):
    """the ordering invariant backbone: row_number over (key, time, id)
    (SURVEY §2.5 stable per-conversation turn order)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select("event_id", F.row_number().over(w).cast("int").alias("turn_no"))


@q(
    "edge_detect",
    """SELECT user_id, count(*) AS n_changes FROM (
         SELECT user_id, event_type,
                lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         FROM events)
       WHERE prev IS NULL OR prev <> event_type
       GROUP BY user_id""",
)
def edge_detect(spark, sf_dir):
    """edge: stateful change-detection via lag (SURVEY §2.2 edge)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_changes"))
    )


@q(
    "sessionize",
    """SELECT user_id, CAST(1 + sum(new_sess) AS BIGINT) AS n_sessions FROM (
         SELECT user_id,
                CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                     THEN 1 ELSE 0 END AS new_sess
         FROM events)
       GROUP BY user_id""",
)
def sessionize(spark, sf_dir):
    """sessionization: lag-gap + cumulative flags (SURVEY §2.9 session
    windows, batch formulation).  Gaps use FRACTIONAL epoch seconds
    (cast ts to double): unix_timestamp truncates to whole seconds while
    the DuckDB oracle's epoch() keeps microseconds, and a true gap in
    (1800, 1801) would flip the >1800 test between engines (r4 review —
    the testdata has gaps within 5s of the boundary; micro-precision
    epochs are exact in a double)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ casts to double only via timestamp (session tz is pinned UTC)
    frac = F.col("ts").cast("timestamp").cast("double")
    gap = frac - F.lag(frac).over(w)
    return (
        ev.withColumn("new_sess", F.when(gap > 1800, 1).otherwise(0))
        .groupBy("user_id")
        .agg((F.lit(1) + F.sum("new_sess")).cast("bigint").alias("n_sessions"))
    )


@q(
    "session_window_counts",
    """WITH g AS (
         SELECT user_id, ts,
                -- >= (not >): Spark's session_window is half-open [ts, ts+gap),
                -- so an event exactly `gap` after the last starts a NEW session
                CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800
                     THEN 1 ELSE 0 END AS brk
         FROM events
       ), s AS (
         SELECT user_id, ts,
                sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
         FROM g
       )
       SELECT user_id,
              strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
              strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
              count(*) AS n_events
       FROM s GROUP BY user_id, sid""",
)
def session_window_counts(spark, sf_dir):
    """gap-based session windows via the built-in session_window aggregate
    (the batch twin of streaming/stream.py::session_windows_stream); the
    oracle reproduces sessions with lag-gap + running-sum SQL."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


@q(
    "topk_users",
    """SELECT user_id, n, CAST(rk AS INT) AS rk FROM (
         SELECT user_id, count(*) AS n,
                row_number() OVER (ORDER BY count(*) DESC, user_id) AS rk
         FROM events GROUP BY user_id)
       WHERE rk <= 10""",
)
def topk_users(spark, sf_dir):
    """top-k via aggregate-then-rank — shrink before the global window
    (SURVEY §2.5/§2.6 top-k)."""
    ev = _t(spark, sf_dir, "events")
    sizes = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("user_id"))
    return (
        sizes.withColumn("rk", F.row_number().over(w).cast("int")).where(F.col("rk") <= 10)
    )


@q(
    "heavy_hitters_users",
    # exact-regime oracle: capacity (4096) >> per-partition distinct users,
    # so no Misra-Gries decrement fires, the deficit is 0, and n_lo ==
    # n_hi == the exact count.  The approximation regime (tiny capacity,
    # planted skew) is bound-checked in pytest — a hash gate can't verify
    # an inequality.  Item is the STRING form on both sides (the sketch
    # keys on strings), so ties order lexicographically in both engines.
    """SELECT CAST(user_id AS VARCHAR) AS item,
              count(*) AS n_lo, count(*) AS n_hi
       FROM events GROUP BY user_id
       ORDER BY n_lo DESC, item LIMIT 10""",
)
def heavy_hitters_users(spark, sf_dir):
    """Bounded-memory frequent items (functions/sketches.py): per-partition
    Misra-Gries summaries (capacity rows each, Arrow mapInPandas) → one
    short-key shuffle → counter sum + broadcast deficit total → top-k.
    The raw key space never shuffles — the 100 TB path for heavy hitters
    over unbounded domains (URLs, raw messages)."""
    from logshipper_spark.functions.sketches import heavy_hitters

    ev = _t(spark, sf_dir, "events")
    return heavy_hitters(ev, "user_id", k=10, capacity=4096)


@q(
    "running_count",
    """SELECT event_id,
              count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
       FROM events""",
)
def running_count(spark, sf_dir):
    """per-key running count (SURVEY §2.5)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select("event_id", F.count("*").over(w).alias("running_n"))


# ======================================================================
# §2.3 joins (enrichment) + TPC-H-ish relational coverage
# ======================================================================

_KIND_DIM = [
    ("click", "engagement"),
    ("view", "engagement"),
    ("purchase", "revenue"),
    ("signup", "growth"),
    ("error", "ops"),
]


@q(
    "enrich_lookup",
    """SELECT e.event_id, d.kind FROM events e
       LEFT JOIN (VALUES ('click','engagement'), ('view','engagement'),
                         ('purchase','revenue'), ('signup','growth'),
                         ('error','ops')) AS d(event_type, kind)
       USING (event_type)""",
)
def enrich_lookup(spark, sf_dir):
    """lookup enrichment as a broadcast hash join (SURVEY §2.3)."""
    ev = _t(spark, sf_dir, "events")
    dim = spark.createDataFrame(_KIND_DIM, "event_type string, kind string")
    return ev.join(F.broadcast(dim), "event_type", "left").select("event_id", "kind")


@q(
    "semi_anti_join",
    """SELECT c.c_custkey FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""",
)
def semi_anti_join(spark, sf_dir):
    """deny-list routing predicate: LEFT ANTI join (SURVEY §2.3) —
    customers with no big-ticket order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@q(
    "tpch_q1",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 4) AS sum_qty,
              round(sum(l_extendedprice), 4) AS sum_base,
              round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
              round(avg(l_quantity), 6) AS avg_qty,
              count(*) AS n
       FROM lineitem GROUP BY l_returnflag, l_linestatus""",
)
def tpch_q1(spark, sf_dir):
    """the canonical partial+final hash aggregate (SURVEY §2.4 pattern)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_base"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.count("*").alias("n"),
    )


@q(
    "revenue_by_nation",
    """SELECT n.n_name, round(sum(o.o_totalprice), 4) AS revenue, count(*) AS n_orders
       FROM orders o
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       GROUP BY n.n_name""",
)
def revenue_by_nation(spark, sf_dir):
    """fact⋈dim⋈dim star join: broadcast both dims (SURVEY §2.3)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"), F.count("*").alias("n_orders"))
    )


@q(
    "top_order_per_customer",
    """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
       QUALIFY row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) = 1""",
)
def top_order_per_customer(spark, sf_dir):
    """top-1 per group window (SURVEY §2.5 top-k per group)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# ======================================================================
# Training-data ops — documents
# ======================================================================

@q(
    "dedup_exact",
    """SELECT md5(lower(regexp_replace(text, '[^A-Za-z0-9]+', '', 'g'))) AS fp,
              min(doc_id) AS keep_id, count(*) AS n_docs
       FROM documents GROUP BY 1""",
)
def dedup_exact_q(spark, sf_dir):
    """exact dedup: hash-groupBy on normalized fingerprint (task spec)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", textstats.fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_docs"))
    )


@q(
    "doc_fingerprint",
    """SELECT doc_id,
              md5(lower(regexp_replace(text, '[^A-Za-z0-9]+', '', 'g'))) AS fp
       FROM documents""",
)
def doc_fingerprint(spark, sf_dir):
    """document fingerprinting (task spec: rolling-hash-style content id)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", textstats.fingerprint(F.col("text")).alias("fp"))


@q(
    "text_quality",
    r"""SELECT doc_id,
              length(text) AS n_chars_m,
              len(regexp_extract_all(text, '\S+')) AS n_tokens_ws,
              len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens_bpe,
              round(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) * 1.0
                    / greatest(length(text), 1), 6) AS punct_ratio,
              round(len(regexp_extract_all(text, '(?i)\b(the|and|of|to|in|is|a|that|it|for)\b')) * 1.0
                    / greatest(len(regexp_extract_all(text, '\S+')), 1), 6) AS stopword_ratio
       FROM documents""",
)
def text_quality(spark, sf_dir):
    """quality scoring: lengths, token counts, punct/stopword ratios."""
    docs = _t(spark, sf_dir, "documents")
    out = textstats.quality_features(docs)
    return out.select(
        "doc_id", "n_chars_m", "n_tokens_ws", "n_tokens_bpe", "punct_ratio", "stopword_ratio"
    )


@q(
    "lang_id_score",
    r"""SELECT doc_id, lang,
              round(len(regexp_extract_all(text, '(?i)\b(the|and|of|to|in|is|a|that|it|for)\b')) * 1.0
                    / greatest(len(regexp_extract_all(text, '\S+')), 1), 6) AS en_score
       FROM documents""",
)
def lang_id_score(spark, sf_dir):
    """language-ID heuristic: stopword-density score vs labeled lang."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", textstats.english_score(F.col("text")).alias("en_score"))


@q(
    "minhash_pairs",
    # brute-force all-pairs oracle: at gate scale (500 docs = 125k pairs)
    # DuckDB computes exact 3-gram Jaccard for EVERY pair; equality holds
    # because the testdata's true pairs sit at J>=0.9 (recall ~0.9998/pair
    # with 8 bands x 4 rows) and the verify stage admits nothing below the
    # threshold.  The size prefilter (|A| <= 2|B| is necessary for J>=0.5)
    # keeps the oracle cheap without changing its result.
    r"""WITH toks AS (
         SELECT doc_id,
                list_filter(string_split_regex(lower(regexp_replace(text, '[^A-Za-z0-9\s]+', ' ', 'g')), '\s+'),
                            t -> t <> '') AS tk
         FROM documents
       ), sh AS (
         SELECT doc_id,
                list_distinct(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
                                             i -> array_to_string(tk[i:i+2], ' '))) AS grams
         FROM toks
       ), sized AS (SELECT doc_id, grams, len(grams) AS ng FROM sh),
       p AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                len(list_intersect(a.grams, b.grams)) * 1.0 /
                greatest(len(list_distinct(list_concat(a.grams, b.grams))), 1) AS jac
         FROM sized a JOIN sized b
           ON a.doc_id < b.doc_id AND a.ng <= 2 * b.ng AND b.ng <= 2 * a.ng
       )
       SELECT id_a, id_b, round(jac, 6) AS jaccard FROM p WHERE round(jac, 6) >= 0.5""",
)
def minhash_pairs(spark, sf_dir):
    """MinHash+LSH near-dup candidates → exact Jaccard ≥ 0.5 (task spec),
    gated against DuckDB's brute-force all-pairs exact Jaccard."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_dedup_pairs(docs, threshold=0.5, id_col="doc_id", text_col="text")


def _simhash_oracle_cte() -> str:
    """DuckDB CTE computing the SAME md5-variant simhash as
    ``dedup.simhash_signatures(hash_fn='md5')``: token hash = first 16 hex
    chars of md5 as two 32-bit halves, 64 ±1 vote sums, bit b = vote>0,
    MSB-first hex (uppercase to match Spark's conv()).  Generated SQL — 64
    aggregates written out by Python, one per bit, mirroring the Spark side."""
    votes = ", ".join(
        f"sum(CASE WHEN (({'lo' if b < 32 else 'hi'} >> {b % 32}) & 1) = 1 "
        f"THEN 1 ELSE -1 END) AS v{b}"
        for b in range(64)
    )
    hi_int = " + ".join(f"(CASE WHEN v{b} > 0 THEN {1 << (b - 32)} ELSE 0 END)" for b in range(32, 64))
    lo_int = " + ".join(f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(32))
    return rf"""toks AS (
         SELECT doc_id, unnest(list_filter(
             string_split_regex(lower(regexp_replace(text, '[^A-Za-z0-9\s]+', ' ', 'g')), '\s+'),
             t -> t <> '')) AS tok
         FROM documents
       ), hashed AS (
         SELECT doc_id,
                ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi,
                ('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo
         FROM toks
       ), votes AS (
         SELECT doc_id, {votes} FROM hashed GROUP BY doc_id
       ), sim AS (
         SELECT doc_id,
                printf('%08X', {hi_int}) || printf('%08X', {lo_int}) AS simhash,
                {hi_int} AS hi_int, {lo_int} AS lo_int
         FROM votes
       )"""


@q(
    "simhash_dups",
    # independent reimplementation: DuckDB computes the full md5-variant
    # simhash from scratch (tokenize → 64 vote aggregates → hex pack) and
    # groups identical fingerprints — upgraded from rows-only in r4.
    "WITH " + _simhash_oracle_cte() + """
       SELECT simhash, min(doc_id) AS keep_id, count(*) AS n_dups
       FROM sim GROUP BY simhash HAVING count(*) > 1""",
)
def simhash_dups(spark, sf_dir):
    """SimHash exact-fingerprint duplicate groups (task spec).  Uses the
    md5 token-hash variant so DuckDB can recompute the fingerprints
    byte-for-byte (xxhash64, the scale default, doesn't exist there —
    same plan, different leaf hash)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_duplicates(docs, hash_fn="md5")


@q(
    "simhash_near_dups",
    # brute-force all-pairs oracle: exact Hamming over the recomputed
    # fingerprints.  Equality with the banded Spark path holds because at
    # gate scale every chunk bucket is under bucket_cap, and (k+1)-chunk
    # pigeonhole banding has ZERO false negatives — upgraded from rows-only.
    "WITH " + _simhash_oracle_cte() + """
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              bit_count(xor(a.hi_int, b.hi_int)) + bit_count(xor(a.lo_int, b.lo_int)) AS hamming
       FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.hi_int, b.hi_int)) + bit_count(xor(a.lo_int, b.lo_int)) <= 4""",
)
def simhash_near_dups(spark, sf_dir):
    """SimHash Hamming≤k near-dup pairs via (k+1)-chunk banding
    (functions/dedup.py::simhash_near_duplicates), md5 variant for the
    cross-engine oracle."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_near_duplicates(docs, max_hamming=4, hash_fn="md5")


def _components_cte() -> str:
    """Shared recursive-CTE prefix for every components-family oracle
    (dedup_components, canonical_dedup, component_split): positive-Jaccard
    adjacent-pair edges → reachability → min-label components as `comp`.
    ONE copy — a threshold/gram-width change cannot silently diverge
    between the three oracles (review r5)."""
    return r"""WITH RECURSIVE toks AS (
         SELECT doc_id,
                list_filter(string_split_regex(lower(regexp_replace(text, '[^A-Za-z0-9\s]+', ' ', 'g')), '\s+'),
                            t -> t <> '') AS tk
         FROM documents
       ), sh AS (
         SELECT doc_id,
                list_distinct(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
                                             i -> array_to_string(tk[i:i+2], ' '))) AS grams
         FROM toks
       ), j AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                len(list_intersect(a.grams, b.grams)) * 1.0 /
                greatest(len(list_distinct(list_concat(a.grams, b.grams))), 1) AS jac
         FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
       ), edges AS (
         SELECT id_a AS a, id_b AS b FROM j WHERE jac > 0
         UNION ALL
         SELECT id_b, id_a FROM j WHERE jac > 0
       ), reach(src, node) AS (
         SELECT doc_id, doc_id FROM documents
         UNION
         SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a
       ), comp AS (
         SELECT node AS id, min(src) AS component FROM reach GROUP BY node)"""


def _adjacent_components(spark, sf_dir):
    """Shared Spark-side construction mirroring _components_cte: adjacent
    doc pairs with positive bigram Jaccard → connected components."""
    docs = _t(spark, sf_dir, "documents")
    pairs = docs.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    ).where(F.col("id_b") <= docs.agg(F.max("doc_id")).first()[0])
    edges = dedup.jaccard(pairs, docs).where(F.col("jaccard") > 0)
    return docs, dedup.connected_components(
        edges, nodes=docs.select("doc_id"), max_iter=30
    )


@q(
    "dedup_components",
    _components_cte() + " SELECT id, component FROM comp",
)
def dedup_components(spark, sf_dir):
    """near-dup cluster assignment: connected components (min-label +
    pointer jumping) over the positive-Jaccard adjacent-pair graph — the
    keep-one-representative stage of a dedup pipeline.  The oracle computes
    the same components with a recursive CTE."""
    _docs, comps = _adjacent_components(spark, sf_dir)
    return comps


@q(
    "ngram_jaccard_adjacent",
    r"""WITH toks AS (
         SELECT doc_id,
                list_filter(string_split_regex(lower(regexp_replace(text, '[^A-Za-z0-9\s]+', ' ', 'g')), '\s+'),
                            t -> t <> '') AS tk
         FROM documents
       ), sh AS (
         SELECT doc_id,
                list_distinct(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
                                             i -> array_to_string(tk[i:i+2], ' '))) AS grams
         FROM toks
       )
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              round(len(list_intersect(a.grams, b.grams)) * 1.0 /
                    greatest(len(list_distinct(list_concat(a.grams, b.grams))), 1), 6) AS jaccard
       FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""",
)
def ngram_jaccard_adjacent(spark, sf_dir):
    """exact 3-gram Jaccard over a deterministic candidate set (adjacent
    doc ids) — the verify-stage metric in isolation."""
    docs = _t(spark, sf_dir, "documents")
    pairs = docs.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    ).where(F.col("id_b") <= docs.agg(F.max("doc_id")).first()[0])
    return dedup.jaccard(pairs, docs)


@q(
    "stratified_sample",
    """SELECT doc_id, lang FROM documents
       WHERE (lang = 'en' AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 50)
          OR (lang = 'de' AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 20)
          OR (lang = 'fr' AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80)""",
)
def stratified_sample_q(spark, sf_dir):
    """training-mix construction: deterministic per-stratum sampling over a
    content-stable hash (no rand() — reruns/resumes pick identical rows)."""
    docs = _t(spark, sf_dir, "documents")
    out = textstats.stratified_sample(
        docs, "lang", {"en": 0.5, "de": 0.2, "fr": 0.8}, key_col="doc_id"
    )
    return out.select("doc_id", "lang")


@q(
    "quality_top_quantile",
    r"""SELECT doc_id, q_score FROM (
         SELECT doc_id,
                round(len(regexp_extract_all(text, '(?i)\b(the|and|of|to|in|is|a|that|it|for)\b')) * 1.0
                      / greatest(len(regexp_extract_all(text, '\S+')), 1), 6) AS q_score,
                percent_rank() OVER (ORDER BY
                  round(len(regexp_extract_all(text, '(?i)\b(the|and|of|to|in|is|a|that|it|for)\b')) * 1.0
                        / greatest(len(regexp_extract_all(text, '\S+')), 1), 6) DESC) AS pr
         FROM documents)
       WHERE pr <= 0.5""",
)
def quality_top_quantile_q(spark, sf_dir):
    """quality-quantile curation: keep the top half of docs by the
    stopword-density quality score (percent_rank over the scalar score)."""
    docs = _t(spark, sf_dir, "documents")
    out = textstats.quality_top_quantile(
        docs, textstats.english_score(F.col("text")), keep_fraction=0.5
    )
    return out.select("doc_id", "q_score")


@q(
    "quality_cutoff_filter",
    # verified: Spark approxQuantile(relativeError=0) returns the same data
    # point as DuckDB quantile_disc (both pick an actual element at the
    # target rank), so the >= cutoff row sets are identical
    r"""WITH s AS (
         SELECT doc_id,
                round(len(regexp_extract_all(text, '(?i)\b(the|and|of|to|in|is|a|that|it|for)\b')) * 1.0
                      / greatest(len(regexp_extract_all(text, '\S+')), 1), 6) AS q_score
         FROM documents)
       SELECT doc_id, q_score FROM s
       WHERE q_score >= (SELECT quantile_disc(q_score, 0.5) FROM s)""",
)
def quality_cutoff_filter(spark, sf_dir):
    """the 100-TB quantile-filtering path: one aggregate pass computes the
    score cutoff (approxQuantile), then a plain scalar predicate filters —
    NO global sort, NO single-partition window (plan-asserted in
    tools/explain_audit.py; quality_top_quantile keeps the percent_rank
    formulation for rank-exact parity)."""
    docs = _t(spark, sf_dir, "documents")
    out = textstats.quality_filter_by_cutoff(
        docs, textstats.english_score(F.col("text")), keep_fraction=0.5
    )
    return out.select("doc_id", "q_score")


@q(
    "contamination_check",
    r"""WITH toks AS (
         SELECT doc_id,
                list_filter(string_split_regex(lower(regexp_replace(text, '[^A-Za-z0-9\s]+', ' ', 'g')), '\s+'),
                            t -> t <> '') AS tk
         FROM documents
       ), g AS (
         SELECT doc_id,
                unnest(list_distinct(list_transform(range(1, greatest(len(tk) - 4, 1) + 1),
                                                    i -> array_to_string(tk[i:i+4], ' ')))) AS gram
         FROM toks
       ), bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
          train AS (SELECT * FROM g WHERE doc_id % 10 <> 0)
       SELECT t.doc_id, count(DISTINCT t.gram) AS n_hits
       FROM train t JOIN bench b USING (gram) GROUP BY t.doc_id""",
)
def contamination_check_q(spark, sf_dir):
    """benchmark decontamination: training docs sharing any 5-gram with the
    benchmark slice (doc_id % 10 == 0) — explode/join/aggregate, benchmark
    side broadcast."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.pmod("doc_id", F.lit(10)) == 0)
    train = docs.where(F.pmod("doc_id", F.lit(10)) != 0)
    return textstats.contamination_check(train, bench, n=5)


@q(
    "contamination_check_packed",
    # SAME oracle as contamination_check: the packed variant joins/counts on
    # xxhash64(gram) instead of the gram string, and count(DISTINCT hash) ==
    # count(DISTINCT gram) absent 64-bit collisions — so raw-gram SQL is the
    # exact oracle for the hashed plan
    r"""WITH toks AS (
         SELECT doc_id,
                list_filter(string_split_regex(lower(regexp_replace(text, '[^A-Za-z0-9\s]+', ' ', 'g')), '\s+'),
                            t -> t <> '') AS tk
         FROM documents
       ), g AS (
         SELECT doc_id,
                unnest(list_distinct(list_transform(range(1, greatest(len(tk) - 4, 1) + 1),
                                                    i -> array_to_string(tk[i:i+4], ' ')))) AS gram
         FROM toks
       ), bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
          train AS (SELECT * FROM g WHERE doc_id % 10 <> 0)
       SELECT t.doc_id, count(DISTINCT t.gram) AS n_hits
       FROM train t JOIN bench b USING (gram) GROUP BY t.doc_id""",
)
def contamination_check_packed(spark, sf_dir):
    """decontamination at 100-TB shape: the join/aggregate key is the
    8-byte xxhash64 of the gram, not the up-to-n-words string — the
    broadcast table and explode output carry longs, not text."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.pmod("doc_id", F.lit(10)) == 0)
    train = docs.where(F.pmod("doc_id", F.lit(10)) != 0)
    return textstats.contamination_check(train, bench, n=5, packed=True)


# end-to-end curation oracle: each stage reuses an already-verified
# fragment (quality cutoff, md5 fingerprint dedup, 5-gram overlap,
# md5-pct stratified mix) composed in the same order as the Spark plan.
# Shared by curation_e2e (one-shot batch) and curation_incremental (the
# SAME flow as ordered micro-batch deltas — equal by the tested parity
# contract in tests/test_curation.py).
_CURATION_SQL = r"""WITH bench AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
       train AS (SELECT * FROM documents WHERE doc_id % 10 <> 0),
       scored AS (
         SELECT *, round(len(regexp_extract_all(text, '(?i)\b(the|and|of|to|in|is|a|that|it|for)\b')) * 1.0
                         / greatest(len(regexp_extract_all(text, '\S+')), 1), 6) AS q_score
         FROM train),
       kept AS (SELECT * FROM scored
                WHERE q_score >= (SELECT quantile_disc(q_score, 0.5) FROM scored)),
       deduped AS (
         SELECT * FROM kept
         QUALIFY row_number() OVER (
           PARTITION BY md5(lower(regexp_replace(text, '[^A-Za-z0-9]+', '', 'g')))
           ORDER BY doc_id) = 1),
       tg AS (
         SELECT doc_id, unnest(list_distinct(list_transform(
                  range(1, greatest(len(tk) - 4, 1) + 1),
                  i -> array_to_string(tk[i:i+4], ' ')))) AS gram
         FROM (SELECT doc_id,
                      list_filter(string_split_regex(lower(regexp_replace(text, '[^A-Za-z0-9\s]+', ' ', 'g')), '\s+'),
                                  t -> t <> '') AS tk
               FROM deduped)),
       bg AS (
         SELECT DISTINCT unnest(list_distinct(list_transform(
                  range(1, greatest(len(tk) - 4, 1) + 1),
                  i -> array_to_string(tk[i:i+4], ' ')))) AS gram
         FROM (SELECT list_filter(string_split_regex(lower(regexp_replace(text, '[^A-Za-z0-9\s]+', ' ', 'g')), '\s+'),
                                  t -> t <> '') AS tk
               FROM bench)),
       clean AS (
         SELECT * FROM deduped
         WHERE doc_id NOT IN (SELECT DISTINCT t.doc_id FROM tg t JOIN bg USING (gram)))
       SELECT doc_id, lang, q_score FROM clean
       WHERE (lang = 'en' AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80)
          OR (lang = 'de' AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 60)
          OR (lang = 'fr' AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 60)"""


@q("curation_e2e", _CURATION_SQL)
def curation_e2e(spark, sf_dir):
    """FLAGSHIP curation pipeline: the full training-data flow a reference
    user runs — quality-quantile filter (scale path: approxQuantile cutoff)
    → exact dedup (md5 fingerprint, min-id canonical) → benchmark
    decontamination (5-gram overlap vs the held-out slice) → deterministic
    stratified mix.  Every stage is individually oracle-verified; this
    entry verifies their COMPOSITION end-to-end.

    100 TB shape: one aggregate pass (cutoff), one 16-byte-key shuffle
    (dedup), one broadcast join on grams (decontam), one pushed-down
    predicate (mix) — no global sort, no full-text shuffle anywhere."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.pmod("doc_id", F.lit(10)) == 0)
    train = docs.where(F.pmod("doc_id", F.lit(10)) != 0)
    # Score ONCE and pin (r6): quality_filter_by_cutoff recomputes the
    # stopword-regex score for the quantile pass AND the filter, and the
    # downstream dedup/decontam/anti-join consumers each re-evaluated the
    # whole filtered subtree (r6-before plan: 5 document scans).  Same
    # cutoff rule (approxQuantile relativeError=0 over the identical
    # double column) and same >= filter → row-identical output.
    scored = train.withColumn(
        "q_score", textstats.english_score(F.col("text")).cast("double")
    ).localCheckpoint()
    cutoff = scored.stat.approxQuantile("q_score", [0.5], 0.0)[0]
    kept = scored.where(F.col("q_score") >= cutoff)
    # deduped feeds the gram pass AND the decontam anti-join — pin it too
    deduped = dedup.dedup_exact(kept).localCheckpoint()
    hits = textstats.contamination_check(deduped, bench, n=5).select("doc_id")
    clean = deduped.join(hits, "doc_id", "left_anti")
    out = textstats.stratified_sample(clean, "lang", {"en": 0.8, "de": 0.6, "fr": 0.6})
    return out.select("doc_id", "lang", "q_score")


@q(
    "repetition_signals",
    # independent DuckDB reimplementation of the Gopher repetition
    # signals: trimmed non-empty lines, word 2-grams with multiplicity,
    # per-doc top-gram share
    r"""WITH lines AS (
         SELECT doc_id,
                list_filter(list_transform(string_split(text, chr(10)),
                                           x -> trim(x, ' ' || chr(9) || chr(13) || chr(12) || chr(11))),
                            x -> x <> '') AS ls
         FROM documents
       ), toks AS (
         SELECT doc_id,
                list_filter(string_split_regex(lower(regexp_replace(text, '[^A-Za-z0-9\s]+', ' ', 'g')), '\s+'),
                            t -> t <> '') AS tk
         FROM documents
       ), grams AS (
         SELECT doc_id, len(tk) AS ntk,
                list_transform(range(1, greatest(len(tk) - 1, 1) + 1),
                               i -> array_to_string(tk[i:i+1], ' ')) AS gs
         FROM toks
       ), topg AS (
         SELECT doc_id, max(c) AS top_c FROM (
           SELECT doc_id, g, count(*) AS c
           FROM (SELECT doc_id, unnest(gs) AS g FROM grams)
           GROUP BY doc_id, g)
         GROUP BY doc_id
       )
       SELECT l.doc_id,
              CASE WHEN len(ls) = 0 THEN 0.0
                   ELSE round((len(ls) - len(list_distinct(ls))) * 1.0 / len(ls), 6) END AS dup_line_frac,
              CASE WHEN ntk < 2 THEN 0.0
                   ELSE round((len(gs) - len(list_distinct(gs))) * 1.0 / len(gs), 6) END AS dup_ngram_frac,
              CASE WHEN ntk < 2 THEN 0.0
                   ELSE round(top_c * 1.0 / len(gs), 6) END AS top_ngram_frac
       FROM lines l JOIN grams g USING (doc_id) JOIN topg USING (doc_id)""",
)
def repetition_signals(spark, sf_dir):
    """Gopher-style intra-doc repetition quality signals (task spec:
    quality scoring tier) — duplicate-line, duplicate-2-gram, and
    top-2-gram fractions per document via one Arrow pass
    (functions/textstats.py::repetition_features)."""
    docs = _t(spark, sf_dir, "documents")
    rep = textstats.repetition_features(2)(F.col("text"))
    return docs.select(
        "doc_id",
        rep["dup_line_frac"].alias("dup_line_frac"),
        rep["dup_ngram_frac"].alias("dup_ngram_frac"),
        rep["top_ngram_frac"].alias("top_ngram_frac"),
    )


def _pii_oracle_sql() -> str:
    """Oracle generated FROM textstats.PII_RULES — same strings, same
    order, so a rule tightening (r5: ipv4 octet ranges, card IIN
    prefixes) can never drift between engines.  Patterns are written
    inside the RE2-compatible subset so Java regex (Spark) and RE2
    (DuckDB) agree; 'g' mirrors Spark's replace-all default."""
    expr = "text"
    for _name, pat, repl in textstats.PII_RULES:
        expr = (
            "regexp_replace(" + expr + ",\n                '"
            + pat.replace("'", "''") + "', '" + repl + "', 'g')"
        )
    return f"SELECT doc_id,\n              {expr} AS clean_text\n       FROM documents"


@q("pii_redact", _pii_oracle_sql())
def pii_redact(spark, sf_dir):
    """PII scrub (reference `replace` mangle applied to training-data
    sanitization): emails, IPs, API keys, card numbers, phones → typed
    placeholders, chained in rule order (textstats.PII_RULES)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", textstats.redact_pii(F.col("text")).alias("clean_text"))


@q(
    "paragraph_dedup",
    # paragraphs are synthesized as consecutive 3-token chunks (the corpus
    # carries no newlines): python str.split(' ') / DuckDB string_split /
    # Java split(' ') agree byte-for-byte incl. empty tokens on space runs.
    # Membership keys on md5(para) in BOTH engines (the scale shape —
    # paragraph text never shuffles for the frequency check).
    """WITH toks AS (
         SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       paras AS (
         SELECT doc_id, i AS pos,
                array_to_string(t[(i*3+1):(i*3+3)], ' ') AS para
         FROM toks, UNNEST(range(0, CAST(ceil(len(t)/3.0) AS BIGINT))) AS u(i)),
       boiler AS (
         SELECT md5(para) AS h FROM paras
         GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
       kept AS (
         SELECT * FROM paras WHERE md5(para) NOT IN (SELECT h FROM boiler)),
       base AS (
         SELECT doc_id, CAST(ceil(len(t)/3.0) AS BIGINT) AS n0 FROM toks)
       SELECT b.doc_id,
              coalesce(string_agg(k.para, chr(10) ORDER BY k.pos), '') AS clean_text,
              CAST(b.n0 - count(k.para) AS BIGINT) AS n_removed
       FROM base b LEFT JOIN kept k USING (doc_id)
       GROUP BY b.doc_id, b.n0""",
)
def paragraph_dedup_q(spark, sf_dir):
    """Corpus-level paragraph dedup (RefinedWeb/CCNet boilerplate pass):
    any paragraph in ≥2 distinct docs is removed everywhere, docs
    reassembled in order (functions/textstats.py::paragraph_dedup —
    16-byte md5 membership keys, one explode, no global sort)."""
    docs = _t(spark, sf_dir, "documents")
    chunks = textstats.chunk_array_pandas(3)(F.col("text"))
    docs2 = docs.select("doc_id", F.array_join(chunks, "\n").alias("text"))
    # pin the synthesized-paragraph text: paragraph_dedup consumes its
    # input twice (paragraph explode + original-count base) and each
    # consumption re-ran the Arrow chunk kernel over the corpus (r6)
    docs2 = docs2.localCheckpoint()
    return textstats.paragraph_dedup(docs2, min_df=2, sep="\n")


@q(
    "pack_sequences",
    # integer arithmetic end-to-end: md5 shard bucket, whitespace token
    # count, exclusive prefix sum, floor-div chunk id — bit-exact
    r"""WITH base AS (
         SELECT doc_id,
                ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS shard,
                len(regexp_extract_all(text, '\S+')) AS n_tokens
         FROM documents
       ), offs AS (
         SELECT doc_id, shard, n_tokens,
                CAST(COALESCE(sum(n_tokens) OVER (
                  PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
         FROM base)
       SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens, start_offset,
              start_offset // 512 AS pack_id
       FROM offs""",
)
def pack_sequences_q(spark, sf_dir):
    """Deterministic concat-then-chunk sequence packing (LM pretraining
    layout): per md5 shard, docs concatenate in id order and cut into
    512-token training sequences (textstats.pack_sequences)."""
    docs = _t(spark, sf_dir, "documents")
    out = textstats.pack_sequences(docs, budget=512, shards=16)
    return out.select(
        "doc_id", "shard", F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("start_offset").cast("long").alias("start_offset"), "pack_id",
    )


@q(
    "pack_payloads",
    r"""WITH base AS (
         SELECT doc_id, text,
                ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS shard,
                len(regexp_extract_all(text, '\S+')) AS n_tokens
         FROM documents
       ), offs AS (
         SELECT doc_id, text, shard, n_tokens,
                CAST(COALESCE(sum(n_tokens) OVER (
                  PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) // 512 AS pack_id
         FROM base)
       SELECT shard, pack_id, count(*) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
              string_agg(text, chr(10) ORDER BY doc_id) AS payload
       FROM offs GROUP BY shard, pack_id""",
)
def pack_payloads_q(spark, sf_dir):
    """Materialized training sequences: per (shard, pack) the id-ordered
    concatenated text (textstats.pack_payloads) — byte-hash-checked
    against DuckDB's ordered string_agg."""
    docs = _t(spark, sf_dir, "documents")
    out = textstats.pack_payloads(docs, budget=512, shards=16)
    return out.select(
        "shard", "pack_id", F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"), "payload",
    )


@q("curation_incremental", _CURATION_SQL)
def curation_incremental(spark, sf_dir):
    """Continuous-ingest parity entry: the SAME curation flow as
    ``curation_e2e`` executed as TWO ordered micro-batch deltas through
    ``functions/curation.py::IncrementalCurator`` (frozen-cutoff
    protocol: observe both deltas into the running score histogram,
    freeze the exact quantile-disc cutoff, admit each delta against the
    persisted fingerprint table and the cached broadcast bench grams).
    The oracle is IDENTICAL to curation_e2e's staged CTE — incremental
    over ordered deltas equals the one-shot batch by the parity contract
    (tests/test_curation.py), so a hash match here verifies the stateful
    multi-batch machinery end to end."""
    import os
    import shutil
    import tempfile

    from logshipper_spark.functions.curation import IncrementalCurator

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.pmod("doc_id", F.lit(10)) == 0)
    train = docs.where(F.pmod("doc_id", F.lit(10)) != 0)
    split = docs.agg(F.max("doc_id")).first()[0] // 2
    b1 = train.where(F.col("doc_id") < split)
    b2 = train.where(F.col("doc_id") >= split)
    # tmpfs scratch: this sandbox's one virtio disk stalls /tmp parquet
    # writes unpredictably (CLAUDE.md hazard) and this query is benched
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="curation_incremental_", dir=scratch)
    cur = None
    try:
        cur = IncrementalCurator(
            spark, work, bench, keep_fraction=0.5,
            fractions={"en": 0.8, "de": 0.6, "fr": 0.6},
        )
        # r5 single-pass protocol (VERDICT r4 #7): score each delta ONCE
        # (scored() pins the frame), then admit sequentially (b2's
        # anti-join must see b1's fingerprints — the ordered-delta parity
        # contract).  r6: the per-delta score+observe chains are fully
        # independent of each other, so BOTH pipelines (not just the
        # observe writes) run concurrently — one scoring wall, not two.
        from concurrent.futures import ThreadPoolExecutor

        def _prep(b):
            s = cur.scored(b)
            cur.observe(s)
            return s

        with ThreadPoolExecutor(max_workers=2) as ex:
            sb1, sb2 = list(ex.map(_prep, [b1, b2]))
        frozen = cur.cutoff()
        # admit() localCheckpoint()s its outputs eagerly, so the returned
        # plans survive the workdir cleanup below
        a1 = cur.admit(sb1, cutoff=frozen)
        a2 = cur.admit(sb2, cutoff=frozen)
        return a1.unionByName(a2).select("doc_id", "lang", "q_score")
    finally:
        # release the curator's cached bench-gram frame — bench/oracle
        # construct one curator per invocation (r4 advice: cache leak)
        if cur is not None:
            cur.close()
        shutil.rmtree(work, ignore_errors=True)


@q(
    "upsample_strata",
    """SELECT doc_id, lang,
              CAST(unnest(range(1, 1 + CASE WHEN lang = 'zh' THEN 3
                                            WHEN lang = 'fr' THEN 2
                                            ELSE 1 END)) AS INT) AS copy
       FROM documents""",
)
def upsample_strata(spark, sf_dir):
    """training-mix oversampling: rare strata repeated k times with a copy
    index — explode(sequence), narrow and deterministic."""
    docs = _t(spark, sf_dir, "documents")
    out = textstats.upsample(docs, "lang", {"zh": 3, "fr": 2})
    return out.select("doc_id", "lang", F.col("copy").cast("int").alias("copy"))


# ======================================================================
# Training-data ops — embeddings
# ======================================================================

@q(
    "embedding_norms",
    """SELECT vec_id,
              round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm
       FROM embeddings""",
)
def embedding_norms_q(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.embedding_norms(emb)


@q(
    "ann_cosine_topk",
    """SELECT vec_id,
              round(list_cosine_similarity(embedding::DOUBLE[],
                    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS cosine_sim
       FROM embeddings
       ORDER BY cosine_sim DESC, vec_id LIMIT 10""",
)
def ann_cosine_topk(spark, sf_dir):
    """brute-force exact ANN baseline: cosine top-10 vs vec 0 (task spec)."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.cosine_topk(emb, qvec, k=10)


@q(
    "ann_cosine_topk_batch",
    """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
                  FROM embeddings WHERE vec_id < 3)
       SELECT q_id, vec_id, cosine_sim, rk FROM (
         SELECT q.q_id, e.vec_id,
                round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cosine_sim,
                CAST(row_number() OVER (
                  PARTITION BY q.q_id
                  ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) DESC,
                           e.vec_id) AS INT) AS rk
         FROM embeddings e CROSS JOIN q)
       WHERE rk <= 10""",
)
def ann_cosine_topk_batch(spark, sf_dir):
    """batch ANN: exact top-10 for THREE query vectors in one corpus pass
    (one numpy matmul per Arrow batch, local top-k prune, tiny shuffle)."""
    emb = _t(spark, sf_dir, "embeddings")
    qrows = emb.where(F.col("vec_id") < 3).select("vec_id", "embedding").collect()
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows]
    return similarity.cosine_topk_batch(emb, queries, k=10)


@q("media_decode_features")  # rows-only: binary codec output is engine-opaque
def media_decode_features(spark, sf_dir):
    """Real multimodal decode end to end (r5, closes the r4 `partial`
    grade): deterministic WAV/PPM/BMP payloads synthesized driver-side
    (no external data), decoded by the BUILT-IN pure-Python codecs
    (multimodal.real_decode) inside an Arrow mapInPandas pass that drops
    the blob before any shuffle.  Feature = 8-dim block-mean summary of
    the decoded samples/pixels; golden-value pytest in
    tests/test_functions.py::TestMultimodal."""
    from logshipper_spark.functions import multimodal as mm

    media = mm.generate_real_media(spark, n=30)
    feats = mm.extract_features(media)
    # stable scalar projection: per-row feature mean rounded to 6 — keeps
    # the driver's row/schema check deterministic across runs
    return feats.select(
        "media_id", "kind", "n_bytes",
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x) / F.size("feature"), 6).alias("feat_mean"),
    )


@q(
    "embedding_decontam",
    # bench split = every 10th vec (the contamination_check convention);
    # cross join is fine at oracle scale (450×50), the Spark side never
    # joins at all (collected bench matrix + one Arrow matmul pass)
    """SELECT t.vec_id, round(max(list_cosine_similarity(
                t.embedding::DOUBLE[], b.embedding::DOUBLE[])), 6) AS max_cos
       FROM embeddings t JOIN embeddings b
         ON t.vec_id % 10 != 0 AND b.vec_id % 10 = 0
       GROUP BY t.vec_id
       HAVING round(max(list_cosine_similarity(
                t.embedding::DOUBLE[], b.embedding::DOUBLE[])), 6) >= 0.35""",
)
def embedding_decontam_q(spark, sf_dir):
    """Semantic benchmark decontamination: per train vector the max cosine
    vs the collected benchmark matrix, one Arrow matmul pass, no join
    (functions/similarity.py::embedding_decontam) — catches paraphrased
    leakage the 5-gram contamination_check can't see."""
    emb = _t(spark, sf_dir, "embeddings")
    bench = emb.where(F.pmod("vec_id", F.lit(10)) == 0)
    train = emb.where(F.pmod("vec_id", F.lit(10)) != 0)
    return similarity.embedding_decontam(train, bench, threshold=0.35)


@q("ann_lsh_topk")  # rows-only: hyperplane LSH not SQL-expressible
def ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed approximate ANN (scale path, task spec)."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.lsh_bucket_topk(emb, qvec, k=10, bits=12, hamming=2)


@q(
    "cosine_dup_pairs",
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine_sim
       FROM embeddings a JOIN embeddings b
         ON a.label = b.label AND a.vec_id < b.vec_id
       WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35""",
)
def cosine_dup_pairs(spark, sf_dir):
    """embedding-cosine near-dup within label blocks (blocked exact pairs;
    the LSH-bucketed variant is cosine_pairs in functions/similarity.py)."""
    emb = _t(spark, sf_dir, "embeddings")
    # per-label BLAS matmul, not a pair self-join (r6): the join form
    # ships BOTH 64-dim vectors across the Python/JVM boundary once per
    # PAIR (O(n²·d) bytes per block) and the interpreted-HOF column form
    # before it paid per-element evals; the blocked matmul moves each
    # vector once per block and is diff=0 vs both at 6 places.
    return similarity.blocked_cosine_pairs(
        emb, block_col="label", threshold=0.35
    )


# ======================================================================
# Extended relational coverage: as-of join, cube, pivot, set ops, json sink
# ======================================================================

@q(
    "asof_last_purchase",
    """WITH u AS (
         SELECT event_id, user_id, ts, 1 AS side, NULL::BIGINT AS p_id FROM events
         UNION ALL
         SELECT NULL, user_id, ts, 0 AS side, event_id FROM events WHERE event_type = 'purchase'
       )
       SELECT event_id, asof_event_id FROM (
         SELECT event_id, side,
                last_value(p_id IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts, side, p_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_event_id
         FROM u)
       WHERE side = 1""",
)
def asof_last_purchase(spark, sf_dir):
    """as-of join: latest purchase at-or-before each event, per user —
    union+window composition, ONE shuffle (operators/asof.py)."""
    from logshipper_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    # event_id tiebreaker: two purchases at the same (user, ts) resolve
    # deterministically in BOTH engines (r4 review — without it the gate
    # is one testdata regeneration from a flaky tie)
    out = asof_join(ev, purchases, key="user_id", left_ts="ts", right_ts="ts",
                    payload_cols=["event_id"], tiebreakers=["event_id"])
    return out.select("event_id", "asof_event_id")


@q(
    "asof_tolerance",
    # same union+window CTE as asof_last_purchase, additionally carrying
    # the matched purchase ts; a match staler than 3600 s nulls out —
    # pandas merge_asof(tolerance=...) semantics.  Gap compares
    # FRACTIONAL epoch on both sides (DuckDB epoch() keeps sub-seconds;
    # Spark uses the double cast, never unix_timestamp truncation).
    """WITH u AS (
         SELECT event_id, user_id, ts, 1 AS side,
                NULL::BIGINT AS p_id, NULL::TIMESTAMP AS p_ts FROM events
         UNION ALL
         SELECT NULL, user_id, ts, 0 AS side, event_id, ts
         FROM events WHERE event_type = 'purchase'
       ), w AS (
         SELECT event_id, ts, side,
                last_value(p_id IGNORE NULLS) OVER win AS a_id,
                last_value(p_ts IGNORE NULLS) OVER win AS a_ts
         FROM u
         WINDOW win AS (PARTITION BY user_id ORDER BY ts, side, p_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       )
       SELECT event_id,
              CASE WHEN a_ts IS NOT NULL AND epoch(ts) - epoch(a_ts) <= 3600
                   THEN a_id END AS asof_event_id
       FROM w WHERE side = 1""",
)
def asof_tolerance(spark, sf_dir):
    """as-of join with a staleness bound: latest purchase at-or-before
    each event per user, but only if within the last hour — stale matches
    null out exactly like no match (operators/asof.py tolerance param)."""
    from logshipper_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    out = asof_join(ev, purchases, key="user_id", left_ts="ts", right_ts="ts",
                    payload_cols=["event_id"], tiebreakers=["event_id"],
                    tolerance=3600.0)
    return out.select("event_id", "asof_event_id")


@q(
    "cube_counts",
    """SELECT event_type, CAST(hour(ts) AS INT) AS hr, count(*) AS n
       FROM events GROUP BY CUBE (event_type, hour(ts))""",
)
def cube_counts(spark, sf_dir):
    """cube/rollup aggregate (SURVEY §2.4 grouping sets)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("hr", F.hour("ts").cast("int"))
        .cube("event_type", "hr")
        .agg(F.count("*").alias("n"))
    )


@q(
    "pivot_user_types",
    """SELECT user_id,
              count(*) FILTER (event_type = 'click') AS click,
              count(*) FILTER (event_type = 'view') AS view,
              count(*) FILTER (event_type = 'purchase') AS purchase,
              count(*) FILTER (event_type = 'signup') AS signup,
              count(*) FILTER (event_type = 'error') AS error
       FROM events GROUP BY user_id""",
)
def pivot_user_types(spark, sf_dir):
    """pivot (SURVEY §2.6): per-user event-type matrix."""
    ev = _t(spark, sf_dir, "events")
    cats = ["click", "view", "purchase", "signup", "error"]
    out = ev.groupBy("user_id").pivot("event_type", cats).agg(F.count(F.lit(1)))
    return out.na.fill(0, cats)


@q(
    "except_users",
    """SELECT user_id FROM events WHERE event_type = 'error'
       EXCEPT
       SELECT user_id FROM events WHERE event_type = 'purchase'
       GROUP BY user_id HAVING count(*) >= 10""",
)
def except_users(spark, sf_dir):
    """set ops (SURVEY §2.6): error-prone users minus heavy purchasers."""
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "error").select("user_id")
    b = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 10)
        .select("user_id")
    )
    return a.distinct().exceptAll(b.distinct())


@q(
    "to_json_payload",
    """SELECT event_id,
              to_json(struct_pack(event_id := event_id, event_type := event_type)) AS doc
       FROM events""",
)
def to_json_payload(spark, sf_dir):
    """elasticsearch-style sink payload: message → JSON doc
    (logshipper/outputs.py::prepare_elasticsearch [approx], SURVEY §2.8)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.to_json(F.struct("event_id", "event_type")).alias("doc")
    )


@q(
    "statsd_wire_lines",
    r"""SELECT event_id,
              printf('events.%s:1|c|@0.25', event_type) AS counter_line,
              printf('latency.%s:%s|ms', event_type,
                     regexp_replace(printf('%.6f', round(value, 4)), '\.?0+$', '')) AS timer_line
       FROM events WHERE value IS NOT NULL""",
)
def statsd_wire_lines(spark, sf_dir):
    """statsd sink wire format: byte-exact counter/timer datagrams
    (logshipper/outputs.py::prepare_statsd [approx], SURVEY §2.8)."""
    from logshipper_spark.operators.sinkfmt import statsd_counter_line, statsd_timer_line

    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    return ev.select(
        "event_id",
        statsd_counter_line(
            F.format_string("events.%s", F.col("event_type")), F.lit(1), rate=0.25
        ).alias("counter_line"),
        statsd_timer_line(
            F.format_string("latency.%s", F.col("event_type")), F.round("value", 4)
        ).alias("timer_line"),
    )


@q(
    "es_bulk_payload",
    """SELECT event_id,
              printf('{"index": {"_index": "events", "_id": "%s"}}', CAST(event_id AS VARCHAR))
              || chr(10) ||
              to_json(struct_pack(event_id := event_id, event_type := event_type)) AS bulk
       FROM events""",
)
def es_bulk_payload(spark, sf_dir):
    """elasticsearch bulk-API body: action line + JSON doc per row
    (logshipper/outputs.py::prepare_elasticsearch [approx], SURVEY §2.8)."""
    from logshipper_spark.operators.sinkfmt import es_bulk_lines

    ev = _t(spark, sf_dir, "events")
    return es_bulk_lines(ev, "events", "event_id", ["event_id", "event_type"]).select(
        "event_id", "bulk"
    )


@q("approx_distinct_hll")  # rows-only: sketch values are engine-specific
def approx_distinct_hll(spark, sf_dir):
    """HLL distinct sketch — the 100 TB metrics path (SURVEY §2.4)."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(F.approx_count_distinct("user_id").alias("n_users_approx"))


@q(
    "sampled_counter",
    """SELECT event_type, count(*) AS n FROM events
       WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 25
       GROUP BY event_type""",
)
def sampled_counter(spark, sf_dir):
    """statsd rate-sampled counter (logshipper statsd `rate` [approx]):
    hash-deterministic 25% sample — reruns/resumes pick identical rows,
    unlike rand()-based sampling."""
    ev = _t(spark, sf_dir, "events")
    h = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10).cast("bigint")
    return (
        ev.where(F.pmod(h, F.lit(100)) < 25)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


@q("ann_ivf_topk")  # rows-only: KMeans quantizer is not SQL-expressible
def ann_ivf_topk(spark, sf_dir):
    """IVF approximate ANN: train-once quantizer (IVFIndex) + n_probe exact
    rerank (task spec 'IVF or LSH-bucketed variant')."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    index = similarity.IVFIndex.build(emb, n_cells=10)
    return index.topk(qvec, k=10, n_probe=3)


@q(
    "quarantine_unparsed",
    """SELECT event_id, 'unparsed:syslog' AS reason
       FROM events WHERE event_id % 2 = 1""",
)
def quarantine_unparsed_q(spark, sf_dir):
    """dead-letter routing: rows matching no grok pattern land in a
    quarantine frame with a reason column (operators/parse.py::
    split_unparsed) — even event_ids render as valid syslog lines, odd
    ones carry raw json that the syslog pack rejects."""
    from logshipper_spark.operators.parse import TRANSCRIPT_PATTERNS, split_unparsed

    ev = _t(spark, sf_dir, "events")
    wire = ev.select(
        "event_id",
        F.when(
            F.pmod("event_id", F.lit(2)) == 0,
            F.format_string(
                "<%d>Jan  5 03:00:00 node-a agentd[%d]: %s",
                F.pmod("event_id", F.lit(192)).cast("int"),
                F.pmod("event_id", F.lit(65536)).cast("int"),
                F.col("event_type"),
            ),
        ).otherwise(F.col("props")).alias("text"),
    )
    syslog_pat = [p for p in TRANSCRIPT_PATTERNS if p.name == "syslog"]
    _ok, dead = split_unparsed(wire, patterns=syslog_pat, reason="unparsed:syslog")
    return dead.select("event_id", "reason")


# ======================================================================
# Pipeline-spec composition + remaining operator oracles
# ======================================================================

@q(
    "call_pipeline",
    """SELECT event_id, 'ok' AS note, 'audited' AS sink
       FROM events WHERE event_type = 'purchase'""",
)
def call_pipeline(spark, sf_dir):
    """gated call/jump subroutine (SURVEY §2.2): only rows matching the
    calling step enter the sub-pipeline; a drop inside the sub suppresses
    the same-step forward (plans/spec.py call handler)."""
    from logshipper_spark.plans.spec import compile_pipeline

    ev = _t(spark, sf_dir, "events")
    sub = compile_pipeline(
        [{"match": {"event_type": "^error$"}, "drop": True}, {"set": {"note": "ok"}}]
    )
    pipe = compile_pipeline(
        [{"match": {"event_type": "^(purchase|error)$"}, "call": "score",
          "forward": ["audited"]}],
        pipelines={"score": sub},
    )
    return pipe.routed(ev).select("event_id", "note", "sink")


@q(
    "python_rewrite_sql",
    """SELECT event_id, upper(event_type) || ':' || CAST(event_id % 7 AS VARCHAR) AS tag
       FROM events""",
)
def python_rewrite_sql(spark, sf_dir):
    """python rewrite, sql lowering path (operators/pyexpr.py): stays in
    whole-stage codegen."""
    from logshipper_spark.plans.spec import compile_pipeline

    ev = _t(spark, sf_dir, "events")
    pipe = compile_pipeline(
        [{"python": {"field": "tag",
                     "sql": "upper(event_type) || ':' || cast(event_id % 7 as string)"}}]
    )
    return pipe.surviving(ev).select("event_id", "tag")


@q(
    "python_rewrite_expr",
    """SELECT event_id, upper(event_type) || '!' AS shout FROM events""",
)
def python_rewrite_expr(spark, sf_dir):
    """python rewrite, pandas lowering path (operators/pyexpr.py): the
    AST-validated expression subset compiled ONCE into an Arrow pandas_udf."""
    from logshipper_spark.plans.spec import compile_pipeline

    ev = _t(spark, sf_dir, "events")
    pipe = compile_pipeline(
        [{"python": {"field": "shout", "expr": "event_type.str.upper() + '!'"}}]
    )
    return pipe.surviving(ev).select("event_id", "shout")


_TOOL_DIM = [("click", "browser"), ("purchase", "checkout"), ("error", "debugger")]


@q(
    "tool_invocations",
    """SELECT d.tool, count(*) AS n_calls FROM events e
       JOIN (VALUES ('click','browser'), ('purchase','checkout'),
                    ('error','debugger')) AS d(event_type, tool)
       USING (event_type)
       GROUP BY d.tool ORDER BY d.tool""",
)
def tool_invocations_q(spark, sf_dir):
    """tool-invocation counter (north star aggregate): enrich a tool column
    via broadcast dim, count non-null per tool (operators/aggregate.py)."""
    ev = _t(spark, sf_dir, "events")
    dim = spark.createDataFrame(_TOOL_DIM, "event_type string, tool string")
    enriched = ev.join(F.broadcast(dim), "event_type", "left")
    return agg.tool_invocations(enriched)


@q(
    "syslog_reemit",
    """SELECT event_id,
              printf('<%d>Jan %2d 03:%02d:%02d node-%d %s[%d]: %s',
                     event_id % 192, 1 + event_id % 28, event_id % 60,
                     (event_id * 7) % 60, user_id % 4, event_type,
                     event_id % 65536, props) AS syslog_line
       FROM events""",
)
def syslog_reemit(spark, sf_dir):
    """syslog forward roundtrip (SURVEY §2.8): build an RFC3164 wire line,
    PARSE it with the grok syslog pattern, RE-EMIT with format_syslog_line —
    the oracle constructs the line directly, so a hash match proves the
    parse→re-emit roundtrip reproduces the wire format byte-for-byte."""
    from logshipper_spark.operators.parse import (
        TRANSCRIPT_PATTERNS, format_syslog_line, grok_native,
    )

    ev = _t(spark, sf_dir, "events")
    wire = ev.select(
        "event_id",
        F.format_string(
            "<%d>Jan %2d 03:%02d:%02d node-%d %s[%d]: %s",
            F.pmod("event_id", F.lit(192)).cast("int"),
            (1 + F.pmod("event_id", F.lit(28))).cast("int"),
            F.pmod("event_id", F.lit(60)).cast("int"),
            F.pmod(F.col("event_id") * 7, F.lit(60)).cast("int"),
            F.pmod("user_id", F.lit(4)).cast("int"),
            F.col("event_type"),
            F.pmod("event_id", F.lit(65536)).cast("int"),
            F.col("props"),
        ).alias("text"),
    )
    syslog_pat = [p for p in TRANSCRIPT_PATTERNS if p.name == "syslog"]
    parsed = grok_native(wire, patterns=syslog_pat)
    return format_syslog_line(parsed).select("event_id", "syslog_line")


@q(
    "rollup_counts",
    """SELECT event_type, CAST(hour(ts) AS INT) AS hr, count(*) AS n
       FROM events GROUP BY ROLLUP (event_type, hr)""",
)
def rollup_counts(spark, sf_dir):
    """rollup aggregate (SURVEY §2.4 grouping sets): hierarchical subtotals."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("hr", F.hour("ts").cast("int"))
        .rollup("event_type", "hr")
        .agg(F.count("*").alias("n"))
    )


@q(
    "grouping_sets_counts",
    """SELECT event_type, user_id, count(*) AS n
       FROM events GROUP BY GROUPING SETS ((event_type), (user_id))""",
)
def grouping_sets_counts(spark, sf_dir):
    """explicit grouping sets (SURVEY §2.4): two independent groupings in
    one pass (single shuffle with a grouping-id expand)."""
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_gs")
    return spark.sql(
        """SELECT event_type, user_id, count(*) AS n
           FROM events_gs GROUP BY GROUPING SETS ((event_type), (user_id))"""
    )


# ======================================================================
# round 5 additions: template mining, rate limiting, robust anomaly
# detection, embedding label-noise scoring, temperature mixture sampling
# ======================================================================

@q(
    "mine_templates",
    r"""WITH m AS (SELECT event_type || ' user=' || CAST(user_id AS VARCHAR) || ' ' || props AS msg
                   FROM events),
        t AS (SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(msg,
                 '0x[0-9a-fA-F]+', '<hex>', 'g'),
                 '\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\b', '<uuid>', 'g'),
                 '[0-9]+\.[0-9]+', '<f>', 'g'),
                 '[0-9]+', '<n>', 'g') AS template, msg FROM m)
       SELECT template, count(*) AS n_msgs, min(msg) AS exemplar
       FROM t GROUP BY template""",
)
def mine_templates_q(spark, sf_dir):
    """log template mining (Drain-lite): mask variable tokens with typed
    placeholders, group by the surviving structure — pure codegen'd
    regexp_replace, ONE shuffle carrying templates + partial counts
    (operators/parse.py::mine_templates)."""
    from logshipper_spark.operators.parse import mine_templates

    ev = _t(spark, sf_dir, "events")
    msgs = ev.select(
        F.concat(
            F.col("event_type"), F.lit(" user="),
            F.col("user_id").cast("string"), F.lit(" "), F.col("props"),
        ).alias("msg")
    )
    return mine_templates(msgs, "msg")


@q(
    "throttle_per_key",
    """SELECT event_id, user_id FROM (
         SELECT event_id, user_id,
                row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                   ORDER BY ts, event_id) AS rn
         FROM events)
       WHERE rn <= 1""",
)
def throttle_per_key_q(spark, sf_dir):
    """rate limiting: at most 1 event per user per hour, earliest-first
    with a deterministic event_id tiebreak (operators/aggregate.py::
    throttle_per_key — the time bucket rides in the partition key, so a
    globally hot user cannot concentrate its history in one task)."""
    ev = _t(spark, sf_dir, "events")
    out = agg.throttle_per_key(
        ev, ["user_id"], "ts", max_per_window=1, window="hour",
        tiebreak_cols=["event_id"],
    )
    return out.select("event_id", "user_id")


@q(
    "robust_outliers",
    """WITH med AS (SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
                    FROM events GROUP BY event_type),
        dev AS (SELECT e.event_id, e.event_type, e.value, m.med,
                       abs(e.value - m.med) AS absdev
                FROM events e JOIN med m USING (event_type)),
        mad AS (SELECT event_type, round(quantile_cont(absdev, 0.5), 6) AS mad
                FROM dev GROUP BY event_type)
       SELECT d.event_id, d.event_type,
              round(abs(d.value - d.med) / (1.4826 * m.mad), 6) AS robust_z
       FROM dev d JOIN mad m USING (event_type)
       WHERE m.mad > 0
         AND round(abs(d.value - d.med) / (1.4826 * m.mad), 6) > 3.5""",
)
def robust_outliers_q(spark, sf_dir):
    """median/MAD anomaly detection per event_type (operators/aggregate.py::
    robust_outliers): robust z > 3.5 on the heavy-tailed value column —
    Spark exact F.percentile(0.5) == DuckDB quantile_cont(0.5), both
    rounded to 6 before the z computation."""
    ev = _t(spark, sf_dir, "events")
    out = agg.robust_outliers(ev, "value", "event_type", k=3.5)
    return out.select("event_id", "event_type", "robust_z")


@q(
    "centroid_outliers",
    """WITH e AS (SELECT label, vec_id,
                         unnest(embedding::DOUBLE[]) AS v,
                         unnest(range(len(embedding))) AS i
                  FROM embeddings),
        c AS (SELECT label, i, round(avg(v), 9) AS c FROM e GROUP BY label, i),
        p AS (SELECT e.label, e.vec_id,
                     sum(e.v * c.c) AS dot,
                     sqrt(sum(e.v * e.v)) AS nv,
                     sqrt(sum(c.c * c.c)) AS nc
              FROM e JOIN c ON e.label = c.label AND e.i = c.i
              GROUP BY e.label, e.vec_id)
       SELECT label, vec_id, round(dot / (nv * nc), 6) AS cos_centroid,
              round(dot / (nv * nc), 6) < 0.2 AS is_outlier
       FROM p""",
)
def centroid_outliers_q(spark, sf_dir):
    """embedding label-noise scoring: cosine of every vector to its own
    label's centroid (functions/similarity.py::centroid_outliers) —
    vectors never shuffle as arrays; centroids are one short-key aggregate
    broadcast back."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.centroid_outliers(emb, threshold=0.2)


@q(
    "funnel_depths",
    """WITH fe AS (SELECT user_id, ts, event_type FROM events
                   WHERE event_type IN ('signup', 'view', 'click', 'purchase')
                     AND ts < (SELECT min(ts) + INTERVAL 1 DAY FROM events)),
        s1 AS (SELECT user_id, min(ts) AS t1 FROM fe
               WHERE event_type = 'signup' GROUP BY user_id),
        s2 AS (SELECT fe.user_id, min(ts) AS t2 FROM fe JOIN s1 USING (user_id)
               WHERE event_type = 'view' AND ts > t1 GROUP BY fe.user_id),
        s3 AS (SELECT fe.user_id, min(ts) AS t3 FROM fe JOIN s2 USING (user_id)
               WHERE event_type = 'click' AND ts > t2 GROUP BY fe.user_id),
        s4 AS (SELECT fe.user_id, min(ts) AS t4 FROM fe JOIN s3 USING (user_id)
               WHERE event_type = 'purchase' AND ts > t3 GROUP BY fe.user_id)
       SELECT CAST(depth AS INT) AS depth, count(*) AS n_users FROM (
         SELECT u.user_id,
                CASE WHEN t4 IS NOT NULL THEN 4 WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS depth
         FROM (SELECT DISTINCT user_id FROM fe) u
         LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
         LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id))
       GROUP BY depth""",
)
def funnel_depths(spark, sf_dir):
    """ordered funnel signup→view→click→purchase over the corpus's first
    day (operators/aggregate.py::funnel): ONE shuffle + per-key fold over
    time-sorted step events; the oracle is the textbook k-join formulation
    — greedy earliest matching makes them provably identical.  The cutoff
    is RELATIVE (min(ts)+1d, broadcast 1-row join) so depths stay varied
    {0..4} under any testdata regeneration."""
    ev = _t(spark, sf_dir, "events")
    cut = ev.agg((F.min("ts") + F.expr("INTERVAL 1 DAY")).alias("_t0"))
    first_day = ev.join(F.broadcast(cut)).where(F.col("ts") < F.col("_t0"))
    depths = agg.funnel(first_day, ["signup", "view", "click", "purchase"])
    return depths.groupBy("depth").agg(F.count("*").alias("n_users"))


@q(
    "cohort_retention",
    """WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id)
       SELECT CAST(CAST(date_trunc('day', f.first_ts) AS DATE) AS VARCHAR) AS cohort_day,
              CAST(date_diff('day', CAST(date_trunc('day', f.first_ts) AS DATE),
                             CAST(date_trunc('day', e.ts) AS DATE)) AS INT) AS day_offset,
              count(DISTINCT e.user_id) AS n_active
       FROM events e JOIN f USING (user_id)
       GROUP BY 1, 2""",
)
def cohort_retention_q(spark, sf_dir):
    """cohort/retention matrix (operators/aggregate.py::cohort_retention):
    first-seen day per user via a reused window exchange, then the
    aggregation key shrinks to (cohort, offset)."""
    ev = _t(spark, sf_dir, "events")
    return agg.cohort_retention(ev, "user_id", "ts", granularity="day")


def _ewma_oracle_sql(alpha: float = 0.3, k: int = 8) -> str:
    """Generated lag-chain mirror of ewma_smooth — decay powers embedded at
    full double precision (repr round-trips; both engines parse the decimal
    to the identical correctly-rounded double)."""
    decay = 1.0 - alpha
    num = ["value"]
    den = ["1"]
    for j in range(1, k):
        w = repr(decay**j)
        num.append(f"coalesce({w} * lag(value, {j}) OVER w, 0)")
        den.append(f"CASE WHEN lag(value, {j}) OVER w IS NOT NULL THEN {w} ELSE 0 END")
    return (
        "SELECT event_id, round((" + " + ".join(num) + ") / (" + " + ".join(den)
        + "), 6) AS ewma FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
    )


@q("ewma_value", _ewma_oracle_sql())
def ewma_value(spark, sf_dir):
    """bounded-history EWMA of the value metric per user (operators/
    aggregate.py::ewma_smooth): pure codegen lag chain, one shuffle —
    the k-term truncation that makes the recursive EWMA distributable
    AND oracle-checkable."""
    ev = _t(spark, sf_dir, "events")
    out = agg.ewma_smooth(
        ev, ["user_id"], "ts", "value", alpha=0.3, k=8, tiebreak_cols=["event_id"]
    )
    return out.select("event_id", "ewma")


@q(
    "char_entropy",
    """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
                   FROM documents WHERE len(text) > 0),
        p AS (SELECT doc_id, count(*)::DOUBLE / sum(count(*)) OVER (PARTITION BY doc_id) AS p
              FROM ch GROUP BY doc_id, c)
       SELECT doc_id, round(-sum(p * log2(p)) + 0.0, 6) AS entropy
       FROM p GROUP BY doc_id""",
)
def char_entropy_q(spark, sf_dir):
    """codepoint-entropy quality signal (functions/textstats.py::
    char_entropy_pandas): Arrow kernel per doc, no shuffle; gibberish /
    base64 spill scores high, repetitive spam scores low."""
    docs = _t(spark, sf_dir, "documents")
    ent = textstats.char_entropy_pandas()
    return docs.where(F.length("text") > 0).select(
        "doc_id", F.round(ent(F.col("text")), 6).alias("entropy")
    )


@q(
    "context_windows",
    """SELECT event_id,
              coalesce(string_agg(event_type, ' ') OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING), '') AS context,
              event_type AS target_label
       FROM events QUALIFY event_type = 'purchase'""",
)
def context_windows_q(spark, sf_dir):
    """sliding-context training-example extraction (operators/dialog.py::
    context_windows): (previous-4-labels context, target) pairs per user —
    bounded row frame, O(k) state per row; the transcript→training-example
    shape."""
    from logshipper_spark.operators import dialog

    ev = _t(spark, sf_dir, "events")
    out = dialog.context_windows(
        ev, "user_id", "ts", "event_type", k=4,
        target="purchase", tiebreak_cols=["event_id"],
    )
    return out.select("event_id", "context", "target_label")


@q(
    "transition_matrix",
    """WITH s AS (SELECT event_type,
                         lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
                  FROM events),
        c AS (SELECT prev_state, event_type AS state, count(*) AS n
              FROM s WHERE prev_state IS NOT NULL GROUP BY 1, 2)
       SELECT prev_state, state, n,
              round(n / sum(n) OVER (PARTITION BY prev_state), 6) AS p
       FROM c""",
)
def transition_matrix_q(spark, sf_dir):
    """first-order event-transition matrix (operators/dialog.py::
    transition_matrix): Markov session-path statistics; aggregation key
    shrinks to |states|² after one keyed shuffle."""
    from logshipper_spark.operators import dialog

    ev = _t(spark, sf_dir, "events")
    return dialog.transition_matrix(
        ev, "user_id", "ts", "event_type", tiebreak_cols=["event_id"]
    )


@q(
    "sequence_lint",
    """WITH s AS (SELECT user_id, event_type,
                         lag(event_type) OVER w AS prev_state,
                         epoch(ts) - lag(epoch(ts)) OVER w AS gap,
                         first_value(event_type) OVER w AS fs
                  FROM events
                  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT user_id,
              sum(CASE WHEN event_type = prev_state THEN 1 ELSE 0 END) AS n_repeats,
              sum(CASE WHEN gap > 3600.0 THEN 1 ELSE 0 END) AS n_large_gaps,
              CAST(max(CASE WHEN fs <> 'signup' THEN 1 ELSE 0 END) AS INT) AS bad_start
       FROM s GROUP BY user_id""",
)
def sequence_lint_q(spark, sf_dir):
    """sequence schema validation (operators/dialog.py::sequence_lint):
    role-alternation repeats, >1h gaps (fractional-epoch rule), and
    wrong-first-state flags per user — the pre-packing quality pass."""
    from logshipper_spark.operators import dialog

    ev = _t(spark, sf_dir, "events")
    return dialog.sequence_lint(
        ev, "user_id", "ts", "event_type",
        expected_start="signup", max_gap_s=3600.0, tiebreak_cols=["event_id"],
    )


@q(
    "vocab_zipf",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        c AS (SELECT token, count(*) AS n FROM tok WHERE token <> '' GROUP BY token)
       SELECT token, n,
              CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS INT) AS rank,
              round(n / sum(n) OVER (), 6) AS freq
       FROM c""",
)
def vocab_zipf_q(spark, sf_dir):
    """corpus Zipf table (functions/vocab.py::vocab_zipf): token counts,
    deterministic rank, relative frequency — vocabulary/OOV diagnostics;
    the ranking window sees only |vocab| rows."""
    from logshipper_spark.functions import vocab

    docs = _t(spark, sf_dir, "documents")
    return vocab.vocab_zipf(docs, "text")


@q(
    "bigram_lm",
    """WITH t AS (SELECT doc_id,
                         list_filter(string_split(text, ' '), l -> l <> '') AS toks
                  FROM documents),
        b AS (SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS z
              FROM t WHERE len(toks) >= 2),
        c AS (SELECT z[1] AS w1, z[2] AS w2, count(*) AS n FROM b GROUP BY 1, 2),
        v AS (SELECT count(DISTINCT w2) AS nv FROM c)
       SELECT w1, w2, n,
              round((n + 1.0) / (sum(n) OVER (PARTITION BY w1) + 1.0 * nv), 6) AS p
       FROM c, v""",
)
def bigram_lm_q(spark, sf_dir):
    """add-1 smoothed bigram LM (functions/vocab.py::bigram_lm): the
    KenLM-lite quality baseline; bigrams never cross doc boundaries, both
    normalizers run over the bounded (w1,w2) aggregate."""
    from logshipper_spark.functions import vocab

    docs = _t(spark, sf_dir, "documents")
    return vocab.bigram_lm(docs, "text", "doc_id", add_k=1.0)


@q(
    "doc_novelty",
    r"""WITH toks AS (
         SELECT doc_id,
                list_filter(string_split_regex(lower(regexp_replace(text, '[^A-Za-z0-9\s]+', ' ', 'g')), '\s+'),
                            t -> t <> '') AS tk
         FROM documents
       ), g AS (
         SELECT doc_id,
                unnest(list_distinct(list_transform(range(1, greatest(len(tk) - 4, 1) + 1),
                                                    i -> array_to_string(tk[i:i+4], ' ')))) AS gram
         FROM toks
       ), d AS (
         SELECT doc_id, count(*) OVER (PARTITION BY gram) AS dfg FROM g)
       SELECT doc_id, count(*) AS n_grams,
              sum(CASE WHEN dfg > 1 THEN 1 ELSE 0 END) AS n_shared,
              round(1 - sum(CASE WHEN dfg > 1 THEN 1 ELSE 0 END) / count(*), 6) AS novelty
       FROM d GROUP BY doc_id""",
)
def doc_novelty_q(spark, sf_dir):
    """inter-document novelty score (functions/textstats.py::doc_novelty):
    fraction of each doc's distinct 5-grams appearing in no other doc —
    one Arrow gram pass, one gram-keyed shuffle, per-doc aggregate."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.doc_novelty(docs, "text", "doc_id", n=5)


@q(
    "token_pmi",
    """WITH tok AS (SELECT DISTINCT doc_id, token FROM (
                      SELECT doc_id, unnest(string_split(text, ' ')) AS token
                      FROM documents) WHERE token <> ''),
        p AS (SELECT a.token AS w1, b.token AS w2, count(*) AS n12
              FROM tok a JOIN tok b USING (doc_id)
              WHERE a.token < b.token GROUP BY 1, 2 HAVING count(*) >= 2),
        t AS (SELECT token, count(*) AS n_t FROM tok GROUP BY token),
        n AS (SELECT count(*) AS nn FROM documents)
       SELECT w1, w2, n12,
              round(ln(n12 * nn / (t1.n_t * t2.n_t)), 6) AS pmi
       FROM p JOIN t t1 ON p.w1 = t1.token JOIN t t2 ON p.w2 = t2.token, n""",
)
def token_pmi_q(spark, sf_dir):
    """token-pair PMI by document co-occurrence (functions/vocab.py::
    token_pmi): co-partitioned self-join on the doc id, key shrinks to
    (w1,w2), per-token doc counts broadcast."""
    from logshipper_spark.functions import vocab

    docs = _t(spark, sf_dir, "documents")
    return vocab.token_pmi(docs, "text", "doc_id", min_count=2)


@q(
    "length_pct_by_source",
    """SELECT doc_id, source, n_chars,
              round(percent_rank() OVER (
                PARTITION BY source ORDER BY n_chars, doc_id), 6) AS pct
       FROM documents""",
)
def length_pct_by_source_q(spark, sf_dir):
    """per-source percentile normalization (functions/textstats.py::
    percentile_by_group): within-domain percent_rank with full (value,
    key) tiebreak — the cross-source score calibration step."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.percentile_by_group(docs, "source", "n_chars", "doc_id")


@q(
    "tfidf_topk",
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                     FROM documents),
        t AS (SELECT doc_id, token, count(*) AS tf FROM toks
              WHERE token <> '' GROUP BY 1, 2),
        d AS (SELECT token, count(*) AS df_t FROM t GROUP BY token),
        n AS (SELECT count(*) AS nn FROM documents),
        s AS (SELECT doc_id, t.token, tf,
                     round(tf * (ln((nn + 1.0) / (df_t + 1.0)) + 1.0), 6) AS score
              FROM t JOIN d USING (token), n)
       SELECT doc_id, token, tf, score, CAST(rk AS INT) AS rk FROM (
         SELECT *, row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rk FROM s)
       WHERE rk <= 3""",
)
def tfidf_topk_q(spark, sf_dir):
    """per-document top-3 TF-IDF keywords (functions/vocab.py::tfidf_topk):
    smoothed idf, broadcast |vocab| dim + 1-row N, doc-partitioned top-k
    window; ranking on the ROUNDED score so engines agree on ties."""
    from logshipper_spark.functions import vocab

    docs = _t(spark, sf_dir, "documents")
    return vocab.tfidf_topk(docs, "text", "doc_id", k=3)


@q(
    "group_sample_k",
    """SELECT doc_id, lang FROM (
         SELECT doc_id, lang,
                row_number() OVER (
                  PARTITION BY lang
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         FROM documents) WHERE rk <= 20""",
)
def group_sample_k_q(spark, sf_dir):
    """deterministic k-per-group sampling (functions/textstats.py::
    group_sample_k): fixed-size balanced eval slices via md5 order —
    content-stable, reproducible across engines and resumes."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.group_sample_k(docs, "lang", k=20).select("doc_id", "lang")


@q(
    "mixture_sample",
    """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        d AS (SELECT sum(pow(n, 0.5)) AS denom FROM c),
        t AS (SELECT lang, n, round(pow(n, 0.5) / denom, 12) AS w FROM c, d),
        r AS (SELECT lang,
                     CAST(floor(round(least(1.0, 250 * w / n), 9) * 1000000 + 0.5) AS BIGINT) AS thr
              FROM t)
       SELECT doc_id, lang FROM documents JOIN r USING (lang)
       WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000 < thr""",
)
def mixture_sample_q(spark, sf_dir):
    """temperature-scaled (alpha=0.5) mixture sampling over the skewed lang
    strata (functions/textstats.py::mixture_sample): per-source keep rates
    derived from n^alpha weights, admission via the content-stable md5
    bucket — no rand(), byte-identical across engines and reruns."""
    docs = _t(spark, sf_dir, "documents")
    out = textstats.mixture_sample(docs, "lang", alpha=0.5, budget=250, key_col="doc_id")
    return out.select("doc_id", "lang")


@q(
    "bigram_perplexity",
    """WITH t AS (SELECT doc_id,
                         list_filter(string_split(text, ' '), l -> l <> '') AS toks
                  FROM documents),
        b AS (SELECT doc_id, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS z
              FROM t WHERE len(toks) >= 2),
        d AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM b),
        c AS (SELECT w1, w2, count(*) AS n FROM d GROUP BY 1, 2),
        v AS (SELECT count(DISTINCT w2) AS nv FROM c),
        lm AS (SELECT w1, w2,
                      round((n + 1.0) / (sum(n) OVER (PARTITION BY w1) + 1.0 * nv), 6) AS p
               FROM c, v)
       SELECT doc_id, count(*) AS n_bigrams,
              round(avg(-ln(p)), 6) AS avg_nll,
              round(exp(avg(-ln(p))), 6) AS ppl
       FROM d JOIN lm USING (w1, w2) GROUP BY doc_id""",
)
def bigram_perplexity_q(spark, sf_dir):
    """per-document perplexity under the corpus add-1 bigram LM
    (functions/vocab.py::bigram_perplexity): the CCNet-style fluency
    bucket signal; LM probs rounded to 6 before the log in both engines."""
    from logshipper_spark.functions import vocab

    docs = _t(spark, sf_dir, "documents")
    return vocab.bigram_perplexity(docs, "text", "doc_id", add_k=1.0)


@q(
    "budget_truncate",
    """SELECT user_id, event_id, cum_cost FROM (
         SELECT user_id, event_id,
                round(sum(value) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_cost
         FROM events)
       WHERE cum_cost <= 500.0""",
)
def budget_truncate_q(spark, sf_dir):
    """context-budget prefix truncation (operators/dialog.py::
    budget_truncate): longest per-user prefix with cumulative cost ≤ 500 —
    the turn-boundary context cut before packing."""
    from logshipper_spark.operators import dialog

    ev = _t(spark, sf_dir, "events")
    out = dialog.budget_truncate(
        ev, "user_id", "ts", "value", budget=500.0, tiebreak_cols=["event_id"]
    )
    return out.select("user_id", "event_id", "cum_cost")


@q(
    "cluster_mixture",
    """WITH c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster_id,
                         embedding::DOUBLE[] AS cv
                  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
        s AS (SELECT e.vec_id, c.cluster_id,
                     round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) AS sim
              FROM embeddings e CROSS JOIN c),
        b AS (SELECT vec_id, cluster_id, sim,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY sim DESC, cluster_id ASC) AS rk
              FROM s)
       SELECT cluster_id, count(*) AS n, round(avg(sim), 6) AS avg_sim
       FROM b WHERE rk = 1 GROUP BY cluster_id""",
)
def cluster_mixture_q(spark, sf_dir):
    """domain-mixture profile (functions/similarity.py::cluster_mixture):
    nearest-centroid assignment (8 deterministic probe centroids = lowest
    vec_ids) aggregated to a K-row mixture table; ties at 6 places break
    toward the lowest centroid index in both engines."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.orderBy("vec_id").limit(8).select("embedding").collect()
    cents = [[float(x) for x in r["embedding"]] for r in probes]
    return similarity.cluster_mixture(emb, cents)


@q(
    "weighted_sample",
    """SELECT doc_id, samp_key FROM (
         SELECT doc_id,
                round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                          % 1000000 + 0.5) / 1000000.0) / n_chars, 12) AS samp_key
         FROM documents)
       ORDER BY samp_key DESC, doc_id LIMIT 50""",
)
def weighted_sample_q(spark, sf_dir):
    """deterministic weighted sampling without replacement (functions/
    textstats.py::weighted_sample, Efraimidis-Spirakis A-ES keyed on the
    content-stable md5 uniform): 50 docs weighted by n_chars — longer docs
    proportionally likelier, no rand(), TakeOrderedAndProject plan."""
    docs = _t(spark, sf_dir, "documents")
    out = textstats.weighted_sample(docs, "n_chars", k=50, id_col="doc_id")
    return out.select("doc_id", "samp_key")


@q(
    "chunk_overlap",
    """WITH t AS (SELECT doc_id,
                         string_split(regexp_replace(trim(text), ' +', ' ', 'g'), ' ') AS tk
                  FROM documents WHERE length(trim(text)) > 0),
        s AS (SELECT doc_id, tk, len(tk) AS l, unnest(range(0, len(tk), 10)) AS st
              FROM t)
       SELECT doc_id,
              CAST(st // 10 AS INT) AS chunk_idx,
              CAST(least(20, l - st) AS INT) AS n_toks,
              array_to_string(tk[st + 1 : st + 20], ' ') AS chunk
       FROM s""",
)
def chunk_overlap_q(spark, sf_dir):
    """sliding-window chunking with overlap (functions/textstats.py::
    chunk_text): 20-token windows every 10 tokens — the RAG/embedding
    indexing shape; pure codegen (normalize → split → sequence → slice)."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.chunk_text(docs, "text", "doc_id", size=20, stride=10)


@q(
    "trailing_rate",
    """SELECT user_id, event_id, trail_n, trail_sum FROM (
         SELECT user_id, event_id,
                count(*) OVER w AS trail_n,
                round(sum(value) OVER w, 6) AS trail_sum
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW))""",
)
def trailing_rate_q(spark, sf_dir):
    """trailing 10-minute per-user rate (operators/aggregate.py::
    trailing_rate): RANGE frame over EXACT integer microseconds
    (unix_micros / epoch_us) — value-based frames need no tiebreaks, and
    integer keys cannot round differently across engines at the frame
    boundary (the fractional-double hazard in CLAUDE.md r5)."""
    from logshipper_spark.operators import aggregate

    ev = _t(spark, sf_dir, "events")
    out = aggregate.trailing_rate(ev, "user_id", "ts", "value", horizon_s=600.0)
    return out.select("user_id", "event_id", "trail_n", "trail_sum")


@q(
    "canonical_dedup",
    _components_cte()
    + """ SELECT component, id AS canonical_id, n_chars AS canonical_score, n_members FROM (
         SELECT c.component, c.id, d.n_chars,
                row_number() OVER (PARTITION BY c.component
                                   ORDER BY d.n_chars DESC, c.id ASC) AS rk,
                count(*) OVER (PARTITION BY c.component) AS n_members
         FROM comp c JOIN documents d ON d.doc_id = c.id) WHERE rk = 1""",
)
def canonical_dedup_q(spark, sf_dir):
    """keep-the-best-copy dedup (functions/dedup.py::canonical_pick over
    connected_components): per near-dup cluster, the longest member (ties →
    lowest id) plus cluster size — argmax inside the partial aggregate via
    max(struct(score, -id)), no per-component window."""
    docs, comps = _adjacent_components(spark, sf_dir)
    return dedup.canonical_pick(comps, docs, score_col="n_chars", id_col="doc_id")


@q(
    "chat_sft_export",
    """SELECT user_id,
              CAST(count(*) AS INT) AS n_turns,
              to_json(list(struct_pack(role := event_type, content := props)
                           ORDER BY ts, event_id)) AS payload
       FROM events GROUP BY user_id""",
)
def chat_sft_export_q(spark, sf_dir):
    """chat-format SFT export (operators/dialog.py::chat_export): one JSON
    line per user with the time-ordered [{"role","content"}] message array
    — byte-exact across engines (compact to_json, struct-field key order)."""
    from logshipper_spark.operators import dialog

    ev = _t(spark, sf_dir, "events")
    return dialog.chat_export(
        ev, "user_id", "ts", "event_type", "props", tiebreak_cols=["event_id"]
    )


@q(
    "key_skew_profile",
    """WITH c AS (SELECT user_id AS key, count(*) AS n FROM events GROUP BY user_id),
        r AS (SELECT key, n, row_number() OVER (ORDER BY n ASC, key ASC) AS i FROM c)
       SELECT count(*) AS n_keys, sum(n) AS total, max(n) AS max_n,
              (SELECT key FROM c ORDER BY n DESC, key DESC LIMIT 1) AS top_key,
              round(max(n) * 1.0 / sum(n), 6) AS max_share,
              round(2.0 * sum(i * n) / (count(*) * sum(n))
                    - (count(*) + 1.0) / count(*), 6) AS gini
       FROM r""",
)
def key_skew_profile_q(spark, sf_dir):
    """shuffle-key skew diagnostics (functions/sketches.py::
    key_skew_profile): distinct keys, heaviest key + share, and the Gini
    coefficient of the per-key count distribution — the pre-partitioning
    report; everything after the first aggregate runs over |keys| rows."""
    from logshipper_spark.functions import sketches

    ev = _t(spark, sf_dir, "events")
    return sketches.key_skew_profile(ev, "user_id")


def _entity_oracle_sql() -> str:
    """Oracle generated FROM textstats.PII_RULES (same generation contract
    as _pii_oracle_sql): counts recomputed with regexp_extract_all — both
    engines count non-overlapping left-to-right matches."""
    cols = ",\n              ".join(
        "CAST(len(regexp_extract_all(text, '"
        + pat.replace("'", "''")
        + f"')) AS INT) AS n_{name}"
        for name, pat, _repl in textstats.PII_RULES
    )
    return f"SELECT doc_id,\n              {cols}\n       FROM documents"


@q("entity_counts", _entity_oracle_sql())
def entity_counts_q(spark, sf_dir):
    """per-document entity counts from the shared PII rule table
    (functions/textstats.py::extract_entities): the triage pass that
    decides which docs need the redaction projection; counted per rule on
    the ORIGINAL text, pure codegen regexp_count."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.extract_entities(docs, "text", "doc_id")


@q(
    "session_stats",
    """WITH s AS (
         SELECT user_id, event_id, value, epoch(ts) AS e,
                CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                      OR epoch(ts) - lag(epoch(ts)) OVER w > 1800.0
                     THEN 1 ELSE 0 END AS is_new
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        t AS (
         SELECT user_id, value, e,
                CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY e, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS session_id
         FROM s)
       SELECT user_id, session_id, count(*) AS n_events,
              round(max(e) - min(e), 6) AS duration_s,
              round(sum(value), 6) AS total_value
       FROM t GROUP BY user_id, session_id""",
)
def session_stats_q(spark, sf_dir):
    """per-session rollup (operators/aggregate.py::session_stats):
    lag-gap sessionization + (key, session) aggregate off ONE keyed
    shuffle — size, duration (fractional-epoch), total value."""
    from logshipper_spark.operators import aggregate

    ev = _t(spark, sf_dir, "events")
    return aggregate.session_stats(
        ev, "user_id", "ts", gap_s=1800.0, value_col="value",
        tiebreak_cols=["event_id"],
    )


@q(
    "winsorize_values",
    """WITH q AS (SELECT quantile_disc(value, 0.01) AS lo,
                         quantile_disc(value, 0.99) AS hi FROM events)
       SELECT event_id,
              CASE WHEN value IS NULL THEN NULL
                   ELSE round(least(greatest(value, lo), hi), 6) END AS value_w
       FROM events, q""",
)
def winsorize_values_q(spark, sf_dir):
    """quantile clipping (functions/textstats.py::winsorize): clamp value
    to its exact [p01, p99] — one approxQuantile(relativeError=0) pass
    (== DuckDB quantile_disc, verified r3) + a pushed scalar projection."""
    ev = _t(spark, sf_dir, "events")
    return textstats.winsorize(ev, "value", 0.01, 0.99).select("event_id", "value_w")


@q(
    "salted_join_orders",
    """SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""",
)
def salted_join_orders_q(spark, sf_dir):
    """skew-salted big-medium join (operators/enrich.py::skew_salted_join):
    result rows are EXACTLY the plain join's — the salt only refines
    partitioning (oracle IS the plain join); hub keys spread over
    salt_buckets tasks instead of one straggler."""
    from logshipper_spark.operators.enrich import skew_salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    return skew_salted_join(li, orders, "l_orderkey", salt_buckets=4)


@q(
    "table_diff_versions",
    """WITH o AS (SELECT event_id, event_type, props FROM events
                  WHERE event_id % 10 <> 0),
        n AS (SELECT event_id,
                     CASE WHEN event_id % 17 = 0 THEN 'mutated'
                          ELSE event_type END AS event_type,
                     props
              FROM events WHERE event_id % 13 <> 0)
       SELECT event_id, status FROM (
         SELECT coalesce(o.event_id, n.event_id) AS event_id,
                CASE WHEN o.event_id IS NULL THEN 'added'
                     WHEN n.event_id IS NULL THEN 'removed'
                     WHEN (o.event_type IS DISTINCT FROM n.event_type)
                       OR (o.props IS DISTINCT FROM n.props) THEN 'changed'
                END AS status
         FROM o FULL JOIN n ON o.event_id = n.event_id)
       WHERE status IS NOT NULL""",
)
def table_diff_versions_q(spark, sf_dir):
    """snapshot regression diff (sources/tableio.py::table_diff): two
    deterministic versions of events (10%% dropped from old, ~7.7%% dropped
    from new, 1/17 mutated) → added/removed/changed keys; content reduces
    to 16-byte digests before the full-outer merge, unchanged keys never
    leave the join."""
    from logshipper_spark.sources.tableio import table_diff

    ev = _t(spark, sf_dir, "events")
    old = ev.where(F.col("event_id") % 10 != 0)
    new = ev.where(F.col("event_id") % 13 != 0).withColumn(
        "event_type",
        F.when(F.col("event_id") % 17 == 0, F.lit("mutated")).otherwise(
            F.col("event_type")
        ),
    )
    return table_diff(old, new, ["event_id"], ["event_type", "props"])


@q(
    "rrf_fusion_topk",
    """WITH a AS (SELECT doc_id,
                         CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS INT) AS rank
                  FROM documents),
        b AS (SELECT doc_id,
                     CAST(row_number() OVER (ORDER BY md5(text) ASC, doc_id ASC) AS INT) AS rank
              FROM documents),
        f AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                     a.rank AS rank_a, b.rank AS rank_b,
                     round(coalesce(1.0 / (60 + a.rank), 0)
                           + coalesce(1.0 / (60 + b.rank), 0), 9) AS rrf_score
              FROM a FULL JOIN b ON a.doc_id = b.doc_id)
       SELECT doc_id, rank_a, rank_b, rrf_score
       FROM f ORDER BY rrf_score DESC, doc_id ASC LIMIT 20""",
)
def rrf_fusion_topk_q(spark, sf_dir):
    """reciprocal-rank fusion (functions/ranking.py::rrf_fusion) of two
    deterministic rankings (length-desc and content-hash order): the
    hybrid-search combiner, robust to incomparable score scales; fused
    score rounded to 9 + id tiebreak in both engines."""
    from logshipper_spark.functions.ranking import rrf_fusion
    from pyspark.sql.window import Window as W

    docs = _t(spark, sf_dir, "documents")
    a = docs.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc()))
        .cast("int")
        .alias("rank"),
    )
    b = docs.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.md5(F.col("text")).asc(), F.col("doc_id").asc()))
        .cast("int")
        .alias("rank"),
    )
    fused = rrf_fusion(a, b, "doc_id", k=60)
    return fused.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc()).limit(20)


@q(
    "quality_deciles",
    """WITH t AS (SELECT lang, n_chars, doc_id,
                         ntile(10) OVER (PARTITION BY lang
                                         ORDER BY n_chars ASC, doc_id ASC) AS bucket
                  FROM documents)
       SELECT lang, bucket, count(*) AS n,
              round(avg(n_chars), 6) AS avg_value,
              min(n_chars) AS min_value, max(n_chars) AS max_value
       FROM t GROUP BY lang, bucket""",
)
def quality_deciles_q(spark, sf_dir):
    """per-group decile bucketing (functions/ranking.py::ntile_buckets):
    quality-tier stats before choosing mix cutoffs; ntile's SQL-standard
    fill rule is engine-identical under the total (value, id) order."""
    from logshipper_spark.functions.ranking import ntile_buckets

    docs = _t(spark, sf_dir, "documents")
    return ntile_buckets(
        docs, "n_chars", n_buckets=10, group_col="lang", tiebreak_col="doc_id"
    )


@q(
    "ngram_diversity",
    """WITH t AS (SELECT lang,
                         list_filter(string_split(text, ' '), l -> l <> '') AS toks
                  FROM documents),
        b AS (SELECT lang, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS z
              FROM t WHERE len(toks) >= 2),
        g AS (SELECT lang AS grp, z[1] || ' ' || z[2] AS gram FROM b)
       SELECT grp, count(*) AS total_grams,
              count(DISTINCT gram) AS distinct_grams,
              round(count(DISTINCT gram) * 1.0 / count(*), 6) AS ttr
       FROM g GROUP BY grp""",
)
def ngram_diversity_q(spark, sf_dir):
    """bigram type-token ratio per language (functions/vocab.py::
    ngram_diversity): the corpus-diversity / templated-source diagnostic;
    the group rides the per-doc lag window, no join-back."""
    from logshipper_spark.functions import vocab

    docs = _t(spark, sf_dir, "documents")
    return vocab.ngram_diversity(docs, "text", group_col="lang", n=2)


@q(
    "split_assign",
    """SELECT doc_id,
              CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                        % 1000000 < 900000 THEN 'train'
                   WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                        % 1000000 < 950000 THEN 'val'
                   ELSE 'test' END AS split
       FROM documents""",
)
def split_assign_q(spark, sf_dir):
    """deterministic train/val/test splitting (functions/textstats.py::
    split_assign): content-stable md5 buckets into cumulative 90/5/5
    ranges — no rand(), growth-stable (each id's fate depends only on
    itself), pure pushed projection."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.split_assign(docs, "doc_id").select("doc_id", "split")


@q(
    "component_split",
    _components_cte()
    + """ SELECT id, component,
              CASE WHEN ('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 8))::BIGINT
                        % 1000000 < 900000 THEN 'train'
                   WHEN ('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 8))::BIGINT
                        % 1000000 < 950000 THEN 'val'
                   ELSE 'test' END AS split
       FROM comp""",
)
def component_split_q(spark, sf_dir):
    """near-dup-aware splitting (functions/textstats.py::component_split):
    the split hashes the CLUSTER id so every near-duplicate lands in the
    same split — the train/test-leakage guard exact dedup can't provide."""
    _docs, comps = _adjacent_components(spark, sf_dir)
    return textstats.component_split(comps, "id", "component")


@q(
    "decayed_count",
    """WITH m AS (SELECT max(epoch(ts)) AS T FROM events)
       SELECT user_id, count(*) AS n,
              round(sum(pow(0.5, (T - epoch(ts)) / 3600.0)), 6) AS decayed
       FROM events, m GROUP BY user_id""",
)
def decayed_count_q(spark, sf_dir):
    """exponential-decay activity counter (operators/aggregate.py::
    decayed_count, half-life 1h): the "active lately" ranking signal; T
    rides a broadcast 1-row aggregate, the weighted sum partial-aggregates."""
    from logshipper_spark.operators import aggregate

    ev = _t(spark, sf_dir, "events")
    return aggregate.decayed_count(ev, "user_id", "ts", half_life_s=3600.0)


@q(
    "label_coherence",
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        x AS (SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM e),
        m AS (SELECT label, pos, avg(val) AS mv FROM x GROUP BY label, pos),
        c AS (SELECT label, count(*) AS n FROM e GROUP BY label)
       SELECT label, n, round(sqrt(sum(mv * mv)), 6) AS coherence
       FROM m JOIN c USING (label) GROUP BY label, n""",
)
def label_coherence_q(spark, sf_dir):
    """embedding-cluster tightness (functions/similarity.py::
    group_coherence): ‖mean vector‖ per label — for L2-normalized
    embeddings this is the sqrt of average pairwise cosine; the aggregate
    is |labels|×dims rows, vectors never shuffle whole."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.group_coherence(emb, "label", "embedding")


@q(
    "freshness_report",
    """WITH g AS (SELECT max(epoch(ts)) AS G FROM events)
       SELECT event_type, count(*) AS n,
              CAST(max(ts) AS VARCHAR) AS max_ts,
              round(G - max(epoch(ts)), 6) AS lag_s
       FROM events, g GROUP BY event_type, G""",
)
def freshness_report_q(spark, sf_dir):
    """per-source freshness / staleness lag (operators/aggregate.py::
    freshness_report): latest ts per event_type vs the corpus-wide latest;
    global max rides a broadcast 1-row aggregate, fractional-epoch lags."""
    from logshipper_spark.operators import aggregate

    ev = _t(spark, sf_dir, "events")
    return aggregate.freshness_report(ev, "event_type", "ts")
