"""Declared query registry — the oracle-checked operator inventory.

Every operator from SURVEY §2 (and every BASELINE.json extension) appears
here as a named pair:

    SPARK[name]  : (spark, sf_dir) -> DataFrame      (the engine under test)
    ORACLE[name] : ANSI SQL string for DuckDB        (the reference answer)

Determinism rules that make cross-engine value-hash equality exact:

- **Sums over doubles are order-dependent** -> every aggregated measure is
  summed as DECIMAL(38,10) (exact, commutative) and cast to DOUBLE at the
  end; averages are exact-decimal-sum / count divided in double. The same
  expression shape is used on both sides, so results are bit-identical.
- **Array folds** (dot products, list sums) run left-to-right in array order
  in both engines (Spark ``aggregate``, DuckDB ``list_sum`` over
  ``list_transform``) -> identical IEEE results; cosines additionally
  rounded to 1e-6 to be safe against library-internal reassociation.
- **Hashing for dedup** uses md5 hex strings (identical in every engine);
  min/ordering over them is plain lexicographic.
- **Every top-k** has a total-order tie-break on an id column.
- Session timezone is UTC (session.py) so timestamp->date agrees with
  DuckDB's naive timestamps.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import ParquetCatalog, forecast_table_name
from .forecast import SeriesForecaster
from .functions import dedup as DD
from .functions import similarity as SIM
from .functions import lm as LM
from .functions import text as TX
from .functions.text import STOPWORDS
from . import multimodal as MM
from .operators import asof as AsOf
from .operators import packing as PK
from .operators import range_join as RJ
from .operators import ranking as RK
from .relational import daily_rollup, future_date_axis, gap_fill, only_future
from .schema import metric_columns
from .sources import read_table

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _dsum(col: F.Column) -> F.Column:
    """Order-independent exact sum of a double measure -> double."""
    return F.sum(col.cast("decimal(38,10)")).cast("double")


def _dsum_cents(col: F.Column) -> F.Column:
    """Money sum rounded to cents AFTER the double cast. Needed whenever
    the total can exceed ~9e5: scaled by 1e10 that passes 2^53, where
    DuckDB's decimal->double (int128 -> double, then /1e10) lands one ulp
    away from Spark's conversion; rounding to the (exact) cent grid makes
    both engines emit the identical double."""
    return F.round(F.sum(col.cast("decimal(38,10)")).cast("double"), 2)


# --------------------------------------------------------------------------
# catalog / schema operators (SURVEY §2.1)
# --------------------------------------------------------------------------


def q_c1_list_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = ParquetCatalog(spark, sf_dir).list_tables()
    return spark.createDataFrame([(n,) for n in names], "table_name string")


_C1_SQL = "SELECT * FROM (VALUES " + ", ".join(f"('{t}')" for t in sorted(TABLES)) + ") AS t(table_name)"


def q_c2_describe_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = ParquetCatalog(spark, sf_dir).describe("lineitem")
    return spark.createDataFrame(pairs, "column_name string, data_type string")


_C2_SQL = (
    "SELECT * FROM (VALUES "
    "('l_orderkey','bigint'),('l_partkey','bigint'),('l_suppkey','bigint'),"
    "('l_linenumber','int'),('l_quantity','double'),('l_extendedprice','double'),"
    "('l_discount','double'),('l_tax','double'),('l_returnflag','string'),"
    "('l_linestatus','string'),('l_shipdate','timestamp_ntz')"
    ") AS t(column_name, data_type)"
)


def q_c6_forecast_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = ParquetCatalog(spark, sf_dir).list_tables()
    return spark.createDataFrame(
        [(n, forecast_table_name(n)) for n in names], "table_name string, forecast_name string"
    )


_C6_SQL = (
    "SELECT table_name, 'bucket_forecast_' || regexp_replace(table_name, '^bucket_', '') AS forecast_name "
    "FROM (" + _C1_SQL + ")"
)


def q_c3_exists_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 EXISTS TABLE (forecast_script.py:128-129) as a driver-
    checkable census: the real filesystem probe (ParquetCatalog.
    table_exists) over every fixture table plus two names that must
    NOT exist — a derived-output name and a garbage name. The twin
    pins the expected flags, so a probe that lies either way breaks
    the hash."""
    cat = ParquetCatalog(spark, sf_dir)
    probes = sorted(TABLES) + ["bucket_forecast_orders", "no_such_table"]
    return spark.createDataFrame(
        [(p, cat.table_exists(p)) for p in probes],
        "table_name string, table_exists boolean",
    )


_C3_SQL = (
    "SELECT * FROM (VALUES "
    + ", ".join(f"('{t}', true)" for t in sorted(TABLES))
    + ", ('bucket_forecast_orders', false), ('no_such_table', false)"
    ") AS t(table_name, table_exists)"
)


def q_c4_drop_create_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 DROP TABLE + C5 CREATE (forecast_script.py:127-145) as a
    driver-checkable census: the REAL effectful verbs run against a
    throwaway tempdir database (never the fixture dir), and the row
    set is the exists-flag trace — absent, created, recreated
    (overwrite semantics: still exactly one table), dropped. A drop
    that silently no-ops or a create that lands at the wrong path
    breaks the trace."""
    import datetime as _dt
    import tempfile

    from .schema import forecast_output_schema

    sch = forecast_output_schema(["order_count"])
    df = spark.createDataFrame(
        [(_dt.date(2024, 1, 1), 1.0, 0.5, 1.5)], sch
    )
    steps: list[tuple[str, bool]] = []
    with tempfile.TemporaryDirectory() as tmp:
        cat = ParquetCatalog(spark, tmp)
        t = "bucket_forecast_daily_orders"
        steps.append(("1_before_create", cat.table_exists(t)))
        cat.write_table(df, t)
        steps.append(("2_after_create", cat.table_exists(t)))
        cat.write_table(df, t)  # drop+recreate == overwrite, still one
        steps.append(
            ("3_after_recreate", cat.table_exists(t) and len(cat.list_tables()) == 1)
        )
        cat.drop_table(t)
        steps.append(("4_after_drop", cat.table_exists(t)))
    return spark.createDataFrame(steps, "step string, table_exists boolean")


_C4_SQL = (
    "SELECT * FROM (VALUES ('1_before_create', false), "
    "('2_after_create', true), ('3_after_recreate', true), "
    "('4_after_drop', false)) AS t(step, table_exists)"
)


def q_c5_created_schema_echo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 typed CREATE (forecast_script.py:134-145) as a driver-
    checkable census: create a two-metric forecast output table in a
    tempdir via the real write path, then DESCRIBE the read-back
    parquet. The twin pins the full (position, name, type) layout —
    the interleaved (m, m_min, m_max) column rule and the date axis
    type are what the reference's CREATE TABLE statement encodes."""
    import datetime as _dt
    import tempfile

    from .schema import forecast_output_schema

    sch = forecast_output_schema(["order_count", "revenue"])
    df = spark.createDataFrame(
        [(_dt.date(2024, 1, 1), 1.0, 0.5, 1.5, 9.0, 8.0, 10.0)], sch
    )
    with tempfile.TemporaryDirectory() as tmp:
        cat = ParquetCatalog(spark, tmp)
        cat.write_table(df, "bucket_forecast_t")
        pairs = cat.describe("bucket_forecast_t")
    return spark.createDataFrame(
        [(i + 1, n, t) for i, (n, t) in enumerate(pairs)],
        "position int, column_name string, data_type string",
    )


_C5_SQL = (
    "SELECT * FROM (VALUES "
    "(1,'date','date'),(2,'order_count','double'),"
    "(3,'order_count_min','double'),(4,'order_count_max','double'),"
    "(5,'revenue','double'),(6,'revenue_min','double'),"
    "(7,'revenue_max','double')"
    ") AS t(position, column_name, data_type)"
)


def q_r2_type_skip_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 as data: which events columns survive the type skip-list
    (event_type/props are string-typed -> skipped)."""
    schema = _t(spark, sf_dir, "events").schema
    cols = metric_columns(schema, axis="date")
    return spark.createDataFrame([(c,) for c in cols], "column_name string")


_R2_SQL = "SELECT * FROM (VALUES ('event_id'),('ts'),('user_id'),('value')) AS t(column_name)"


# --------------------------------------------------------------------------
# relational operators (SURVEY §2.2)
# --------------------------------------------------------------------------


def q_r1_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    )


_R1_SQL = "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem"


def q_r4_cast_to_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select(F.to_date("o_orderdate").alias("date"))
        .distinct()
    )


_R4_SQL = "SELECT DISTINCT CAST(o_orderdate AS DATE) AS date FROM orders"


def q_r5_max_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select(F.to_date("o_orderdate").alias("date"))
        .agg(F.max("date").alias("last_known_date"))
    )


_R5_SQL = "SELECT MAX(CAST(o_orderdate AS DATE)) AS last_known_date FROM orders"


def _orders_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_rollup(
        _t(spark, sf_dir, "orders"),
        "o_orderdate",
        [
            F.count("*").alias("order_count"),
            _dsum(F.col("o_totalprice")).alias("total_revenue"),
        ],
    )


_ORDERS_DAILY_SQL = (
    "SELECT CAST(o_orderdate AS DATE) AS date, COUNT(*) AS order_count, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS total_revenue "
    "FROM orders GROUP BY 1"
)


def q_daily_sales_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _orders_daily(spark, sf_dir)


def q_daily_shipping_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_rollup(
        _t(spark, sf_dir, "lineitem"),
        "l_shipdate",
        [
            _dsum(F.col("l_quantity")).alias("qty"),
            _dsum(F.col("l_extendedprice")).alias("extended_price"),
            (
                _dsum(F.col("l_discount")) / F.count("*")
            ).alias("avg_discount"),
        ],
    )


_SHIPPING_DAILY_SQL = (
    "SELECT CAST(l_shipdate AS DATE) AS date, "
    "CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS qty, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS extended_price, "
    "CAST(SUM(CAST(l_discount AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS avg_discount "
    "FROM lineitem GROUP BY 1"
)


def q_r7_future_date_axis(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _t(spark, sf_dir, "orders").select(F.to_date("o_orderdate").alias("date"))
    return future_date_axis(daily, periods=7)


_R7_SQL = (
    "WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS ds FROM orders), "
    "m AS (SELECT MAX(ds) AS mx FROM d) "
    "SELECT ds FROM d UNION ALL "
    "SELECT CAST(unnest(generate_series(mx + INTERVAL 1 DAY, mx + INTERVAL 7 DAY, INTERVAL 1 DAY)) AS DATE) AS ds FROM m"
)


def q_r8_only_future(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _t(spark, sf_dir, "orders").select(F.to_date("o_orderdate").alias("date"))
    axis = future_date_axis(daily, periods=7)
    last = daily.agg(F.max("date")).collect()[0][0]
    return only_future(axis, last)


_R8_SQL = (
    "WITH m AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS mx FROM orders) "
    "SELECT CAST(unnest(generate_series(mx + INTERVAL 1 DAY, mx + INTERVAL 7 DAY, INTERVAL 1 DAY)) AS DATE) AS ds FROM m"
)


def q_r11_outer_join_null_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _orders_daily(spark, sf_dir).select("date", "order_count")
    b = q_daily_shipping_series(spark, sf_dir).select("date", "qty")
    return a.join(b, "date", "full_outer")


_R11_SQL = (
    "WITH a AS (SELECT CAST(o_orderdate AS DATE) AS date, COUNT(*) AS order_count FROM orders GROUP BY 1), "
    "b AS (SELECT CAST(l_shipdate AS DATE) AS date, CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS qty FROM lineitem GROUP BY 1) "
    "SELECT COALESCE(a.date, b.date) AS date, a.order_count, b.qty FROM a FULL OUTER JOIN b ON a.date = b.date"
)


def q_r10_r13_bounds_sink_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10 derived bounds + R13 sink column order (date, cols, mins, maxs)."""
    daily = _orders_daily(spark, sf_dir)
    return daily.select(
        "date",
        F.col("total_revenue"),
        (F.col("total_revenue") * 0.9).alias("total_revenue_min"),
        (F.col("total_revenue") * 1.1).alias("total_revenue_max"),
    )


_R10_SQL = (
    "WITH d AS (" + _ORDERS_DAILY_SQL + ") "
    "SELECT date, total_revenue, total_revenue * 0.9 AS total_revenue_min, "
    "total_revenue * 1.1 AS total_revenue_max FROM d"
)


# --------------------------------------------------------------------------
# SQL breadth: aggregation / join / window / sessionization / as-of
# (capabilities the engine gets from Spark SQL, SURVEY §2.6)
# --------------------------------------------------------------------------


def q_tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.to_date("l_shipdate") <= F.lit("1998-09-02"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (_dsum(F.col("l_discount")) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,10))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + deterministic top-k. The customer dim is broadcast
    (small side), lineitem↔orders is the real shuffle join."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("o_orderdate"))
        .agg(_dsum(disc).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


_Q3_SQL = """
SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


def q_tpch_q5_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join: dims broadcast, facts shuffle on their keys."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(sup.hint("broadcast"), (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey))
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(disc).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


_Q5_SQL = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name ORDER BY revenue DESC, n_name
"""


def q_tpch_q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue_delta"))
    )


_Q6_SQL = (
    "SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,10))) AS DOUBLE) AS revenue_delta "
    "FROM lineitem WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
)


def q_window_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        _t(spark, sf_dir, "customer")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("c_mktsegment", "rank", "c_custkey", "c_acctbal")
    )


_WINDOW_SQL = """
SELECT c_mktsegment, rank, c_custkey, c_acctbal FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rank
  FROM customer) WHERE rank <= 3
"""


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min): lag + cumulative sum of
    session-start flags — one shuffle on user_id. Gaps compare at FULL
    timestamp precision (cast to double seconds) — unix_timestamp truncates
    to seconds while DuckDB's epoch() keeps fractions, which diverges for
    gaps within a second of the boundary."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("double")
    prev_sec = F.lag(sec).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(sec - prev_sec > 1800, 1).otherwise(0)
        + F.when(F.lag("ts").over(w).isNull(), 1).otherwise(0),
    )
    return (
        flagged.groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"), F.count("*").alias("n_events"))
        .orderBy("user_id")
    )


_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id,
    (CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800 THEN 1 ELSE 0 END
     + CASE WHEN LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END) AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, SUM(new_session) AS n_sessions, COUNT(*) AS n_events
FROM flagged GROUP BY user_id
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one): for each order, the latest
    event with ts <= o_orderdate. Uses the bucketed two-pass operator
    (operators/asof.py): month-partitioned in-bucket windows + a tiny
    bucket-carry frame — no O(n*m) inequality join and no single global
    range-shuffled window task. The DuckDB oracle runs the equivalent
    global-window formulation."""
    ev = _t(spark, sf_dir, "events")
    orders = _t(spark, sf_dir, "orders")
    return AsOf.asof_join(
        orders, ev, left_ts="o_orderdate", right_ts="ts",
        right_value="event_id", out_col="last_event_id",
    ).select("o_orderkey", "last_event_id")


_ASOF_SQL = """
WITH u AS (
  SELECT ts AS t, event_id, NULL::BIGINT AS o_orderkey, 0 AS kind FROM events
  UNION ALL
  SELECT o_orderdate AS t, NULL::BIGINT AS event_id, o_orderkey, 1 AS kind FROM orders),
w AS (
  SELECT *, LAST_VALUE(event_id IGNORE NULLS) OVER (
      ORDER BY t, kind, COALESCE(event_id, o_orderkey)
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_event_id
  FROM u)
SELECT o_orderkey, last_event_id FROM w WHERE kind = 1
"""


def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via bucket equi-join (operators/range_join.py): how many
    events precede each purchase by at most one hour (the attribution
    window). The oracle runs the naive inequality-join form; ours never
    builds the cross product."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("interval 1 hour")).alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    points = ev.select("event_id", "ts")
    joined = RJ.range_join_points(purchases, points, "w_start", "w_end", "ts")
    return (
        joined.groupBy("purchase_id")
        .agg(F.count("*").alias("n_preceding"))
        .orderBy("purchase_id")
    )


_RANGE_SQL = """
SELECT p.event_id AS purchase_id, COUNT(*) AS n_preceding
FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
JOIN events e ON e.ts >= p.ts - INTERVAL 1 HOUR AND e.ts < p.ts
GROUP BY p.event_id ORDER BY p.event_id
"""


def q_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows: groupBy(session_window(ts, gap)) merges
    events within 30 min of the previous into one window ending
    last_ts + gap. The same expression runs unchanged under readStream
    (state pruned by watermark); the oracle is the classic gaps-and-islands
    rewrite. Spark starts a new session when the gap is >= the threshold
    (window end is exclusive), mirrored in the oracle's >= comparison."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            _dsum(F.col("value")).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )


_SESSION_WINDOW_SQL = """
WITH ev AS (SELECT user_id, ts, value FROM events WHERE user_id < 100),
marked AS (
  SELECT user_id, ts, value,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR epoch(ts) - epoch(LAG(ts) OVER w) >= 1800 THEN 1 ELSE 0 END AS new_s
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
sess AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
    ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked)
SELECT user_id, MIN(ts) AS session_start,
  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS session_value
FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start
"""


def q_sliding_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping window (7-day span, 1-day slide) event rollup — the sliding
    twin of the tumbling streaming rollup; each event lands in 7 windows
    (Spark's window() expands rows; the oracle expands via a 0..6 series)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "7 days", "1 day").alias("w"))
        .agg(F.count("*").alias("n_events"), _dsum(F.col("value")).alias("total_value"))
        .select(
            F.col("w.start").cast("date").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


_SLIDING_SQL = """
SELECT CAST(date_trunc('day', ts) - INTERVAL (i) DAY AS DATE) AS window_start,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS total_value
FROM events CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS i)
GROUP BY 1
"""


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event funnel: per user, first signup -> first subsequent purchase.
    One aggregation pass (conditional min-timestamps), then a row-local
    comparison — no self-join over the event log."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    converted = (
        F.col("first_signup").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") > F.col("first_signup"))
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("first_signup").alias("n_signed_up"),
        F.sum(converted.cast("long")).alias("n_converted"),
    )


_FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id)
SELECT COUNT(*) AS n_users,
  COUNT(first_signup) AS n_signed_up,
  SUM(CASE WHEN first_signup IS NOT NULL AND first_purchase IS NOT NULL
            AND first_purchase > first_signup THEN 1 ELSE 0 END) AS n_converted
FROM per_user
"""


def q_streaming_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming rollup's batch twin: same window() expression the
    Structured Streaming path uses (streaming/rollup.py)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("event_count"), _dsum(F.col("value")).alias("total_value"))
        .select(F.col("w.start").cast("date").alias("date"), "event_count", "total_value")
    )


_STREAM_SQL = (
    "SELECT CAST(ts AS DATE) AS date, COUNT(*) AS event_count, "
    "CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS total_value "
    "FROM events GROUP BY 1"
)


# --------------------------------------------------------------------------
# SQL breadth II: more join/agg/window/set/JSON/grouping shapes
# --------------------------------------------------------------------------


def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns (join + agg + top-k)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum(disc).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


_Q10_SQL = """
SELECT c_custkey, c_name, n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q_tpch_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + two-level aggregation: how many customers have k orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate ratio: share of revenue from PROMO parts."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg((F.lit(100.0) * _dsum(promo) / _dsum(disc)).alias("promo_revenue_pct"))
    )


_Q14_SQL = """
SELECT 100.0
  * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(38,10))) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING-subquery shape: orders whose total quantity exceeds 150."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
    )


_Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, total_qty
FROM (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING total_qty > 150) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
"""


def q_tpch_q19_bracket_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction-of-conjunctions predicate pushed through a join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 5) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 15) & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(_dsum(disc).alias("revenue"))
    )


_Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size <= 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size <= 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q_tpch_q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-nation x supplier-nation trade volume by ship year."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup.hint("broadcast"), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(n2), sup.s_nationkey == F.col("sn_key"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(_dsum(disc).alias("volume"))
    )


_Q7_SQL = """
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
  year(l_shipdate) AS ship_year,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS volume
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
GROUP BY 1, 2, 3
"""


def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View + scalar-max shape: supplier(s) with maximum 1996 revenue."""
    li = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1996)
    sup = _t(spark, sf_dir, "supplier")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    revenue = li.groupBy("l_suppkey").agg(_dsum(disc).alias("total_revenue"))
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_revenue == max_rev.max_revenue)
        .join(sup, revenue.l_suppkey == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS total_revenue
  FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q_tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-subquery shape, decorrelated: revenue from orders
    of a part below 50% of that part's average order quantity."""
    li = _t(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(
        (_dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty")
    )
    return (
        li.join(part_avg.hint("broadcast"), "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            _dsum_cents(F.col("l_extendedprice")).alias("small_qty_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


_Q17_SQL = """
WITH pa AS (
  SELECT l_partkey,
    CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey)
SELECT
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE), 2) AS small_qty_revenue,
  COUNT(*) AS n_lines
FROM lineitem JOIN pa USING (l_partkey)
WHERE l_quantity < 0.5 * avg_qty
"""


def q_cube_segment_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (segment, year): all four grouping combinations, one pass."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment", F.year("o_orderdate").alias("order_year"), "o_totalprice"
    )
    return joined.cube("c_mktsegment", "order_year").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n_orders"),
        _dsum_cents(F.col("o_totalprice")).alias("revenue"),
    )


_CUBE_SQL = """
SELECT c_mktsegment, year(o_orderdate) AS order_year,
  GROUPING(c_mktsegment) * 2 + GROUPING(year(o_orderdate)) AS gid,
  COUNT(*) AS n_orders,
  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (c_mktsegment, year(o_orderdate))
"""


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: supplier-name pairs within edit distance 1,
    prefix-blocked. The block key turns the quadratic self-join into an
    equi-join (pairs spanning blocks are out of scope by construction —
    both engines apply the identical blocking, so results agree)."""
    sup = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", F.substring("s_name", 1, 10).alias("blk")
    )
    a = sup.select(F.col("s_suppkey").alias("id_a"), F.col("s_name").alias("name_a"), "blk")
    b = sup.select(F.col("s_suppkey").alias("id_b"), F.col("s_name").alias("name_b"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 1)
        .select("id_a", "id_b", "dist")
    )


_FUZZY_SQL = """
WITH s AS (SELECT s_suppkey, s_name, substr(s_name, 1, 10) AS blk FROM supplier)
SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
       levenshtein(a.s_name, b.s_name) AS dist
FROM s a JOIN s b ON a.blk = b.blk AND a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
"""


def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-share shape (ratio of conditional sums per group): EUROPE
    suppliers' share of total revenue per ship year."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(sup.hint("broadcast"), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    europe = F.when(F.col("r_name") == "EUROPE", disc).otherwise(F.lit(0.0))
    return (
        joined.groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg((_dsum(europe) / _dsum(disc)).alias("europe_share"))
        .orderBy("ship_year")
    )


_Q8_SQL = """
SELECT year(l_shipdate) AS ship_year,
  CAST(SUM(CAST(CASE WHEN r_name = 'EUROPE' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(38,10))) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS europe_share
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1 ORDER BY 1
"""


def q_window_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + percent_rank: customer balance deciles within segment."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(10).over(w).alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


_NTILE_SQL = """
SELECT c_custkey, c_mktsegment, c_acctbal,
  NTILE(10) OVER w AS decile,
  round(PERCENT_RANK() OVER w, 6) AS pct_rank
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


def q_window_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average + running total of daily revenue — the classic
    time-series smoothing pass, one range-shuffle then streaming window."""
    # keep the daily revenue DECIMAL end-to-end: window sums stay exact and
    # engine-independent; cast to double only on output. (Converting an
    # already-derived double back to decimal is NOT portable: engines differ
    # between shortest-repr and exact-binary-expansion conversion.)
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("date"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,10)")).alias("rev_dec"))
    )
    w7 = Window.orderBy("date").rowsBetween(-6, 0)
    wcum = Window.orderBy("date").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "date",
        F.col("rev_dec").cast("double").alias("total_revenue"),
        (F.sum("rev_dec").over(w7).cast("double") / F.count("*").over(w7)).alias("revenue_ma7"),
        # round to cents: the true cum is exact 2-decimal money, but DuckDB's
        # decimal->double cast double-rounds (int128->double, then /1e10) and
        # can land 1 ulp off the correctly-rounded double Spark produces
        F.round(F.sum("rev_dec").over(wcum).cast("double"), 2).alias("revenue_cum"),
    )


_MOVAVG_SQL = """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS date,
         SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS rev_dec
  FROM orders GROUP BY 1)
SELECT date, CAST(rev_dec AS DOUBLE) AS total_revenue,
  CAST(SUM(rev_dec) OVER w7 AS DOUBLE) / COUNT(*) OVER w7 AS revenue_ma7,
  round(CAST(SUM(rev_dec) OVER wc AS DOUBLE), 2) AS revenue_cum
FROM d
WINDOW w7 AS (ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
       wc AS (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_window_dod_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): day-over-day revenue delta (NULL on the first day)."""
    daily = _orders_daily(spark, sf_dir)
    w = Window.orderBy("date")
    return daily.select(
        "date",
        "total_revenue",
        (F.col("total_revenue") - F.lag("total_revenue").over(w)).alias("dod_delta"),
    )


_DOD_SQL = f"""
WITH d AS ({_ORDERS_DAILY_SQL})
SELECT date, total_revenue,
  total_revenue - LAG(total_revenue) OVER (ORDER BY date) AS dod_delta
FROM d
"""


def q_set_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers active in both 1995 and 1996."""
    orders = _t(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96).withColumnRenamed("o_custkey", "custkey")


_SET_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


def q_anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no orders in 2001 (churn query)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 2001)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


_ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND year(o_orderdate) = 2001)
"""


def q_correlated_above_avg_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape: suppliers above their nation's average
    account balance (decorrelated to a groupBy + equi-join — the plan
    Catalyst produces for the subquery form too)."""
    sup = _t(spark, sf_dir, "supplier")
    nat_avg = sup.groupBy("s_nationkey").agg(
        (_dsum(F.col("s_acctbal")) / F.count("*")).alias("nation_avg")
    )
    return (
        sup.join(F.broadcast(nat_avg), "s_nationkey")
        .filter(F.col("s_acctbal") > F.col("nation_avg"))
        .select("s_suppkey", "s_name", "s_acctbal", F.round("nation_avg", 6).alias("nation_avg"))
    )


_CORR_SQL = """
WITH a AS (SELECT s_nationkey,
             CAST(SUM(CAST(s_acctbal AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS nation_avg
           FROM supplier GROUP BY 1)
SELECT s_suppkey, s_name, s_acctbal, round(nation_avg, 6) AS nation_avg
FROM supplier JOIN a USING (s_nationkey)
WHERE s_acctbal > nation_avg
"""


def q_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over the events props column + aggregate."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            _dsum(k.cast("double")).alias("sum_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


_JSON_SQL = """
SELECT event_type, COUNT(*) AS n_events,
  CAST(SUM(CAST(CAST(props->>'$.k' AS BIGINT) AS DECIMAL(38,10))) AS DOUBLE) AS sum_k,
  MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_rollup_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (nation, year) revenue with grouping_id — multi-granularity
    aggregation in one pass (the hypertable-rollup pattern)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", F.year("o_orderdate").alias("order_year"), "o_totalprice")
    )
    return (
        joined.rollup("n_name", "order_year")
        .agg(
            F.grouping_id().alias("gid"),
            _dsum(F.col("o_totalprice")).alias("revenue"),
        )
        .select("n_name", "order_year", "gid", "revenue")
    )


_ROLLUP_SQL = """
SELECT n_name, year(o_orderdate) AS order_year,
  GROUPING(n_name) * 2 + GROUPING(year(o_orderdate)) AS gid,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, year(o_orderdate))
"""


def q_pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (no distinct pre-pass): order counts
    per year x status."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(F.year("o_orderdate").alias("order_year"), "o_orderstatus")
        .groupBy("order_year")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "order_year",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_filled"),
            F.coalesce("P", F.lit(0)).alias("n_pending"),
        )
    )


_PIVOT_SQL = """
SELECT year(o_orderdate) AS order_year,
  COUNT(*) FILTER (o_orderstatus = 'O') AS n_open,
  COUNT(*) FILTER (o_orderstatus = 'F') AS n_filled,
  COUNT(*) FILTER (o_orderstatus = 'P') AS n_pending
FROM orders GROUP BY 1
"""


def q_unpivot_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's spine op (SURVEY §7.1): wide daily table -> long
    (date, metric, value) via native unpivot."""
    daily = _orders_daily(spark, sf_dir).select(
        "date",
        F.col("order_count").cast("double").alias("order_count"),
        "total_revenue",
    )
    return daily.unpivot("date", ["order_count", "total_revenue"], "metric", "value")


_UNPIVOT_SQL = f"""
WITH d AS ({_ORDERS_DAILY_SQL})
SELECT date, 'order_count' AS metric, CAST(order_count AS DOUBLE) AS value FROM d
UNION ALL
SELECT date, 'total_revenue' AS metric, total_revenue AS value FROM d
"""


def q_anomaly_zscore_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly detection on daily revenue: each
    day scored against the prior 28 days' mean/std. Std comes from exact
    decimal frame sums of x and x^2 (sqrt(E[x^2]-E[x]^2)) — deterministic
    where stddev_samp's per-engine accumulation order is not; z is ranked
    and compared on the 6dp-rounded value. The global date-ordered window
    runs on an already-aggregated daily series (tiny by construction)."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,10)")).alias("rev_dec")
    ).withColumn("revenue", F.col("rev_dec").cast("double"))
    w = Window.orderBy("day").rowsBetween(-28, -1)
    n = F.count("revenue").over(w)
    s1 = F.sum("rev_dec").over(w).cast("double")
    s2 = F.sum(
        (F.col("revenue") * F.col("revenue")).cast("decimal(38,6)")
    ).over(w).cast("double")
    mean = s1 / n
    var = F.greatest(s2 / n - mean * mean, F.lit(1e-12))
    z = F.round((F.col("revenue") - mean) / F.sqrt(var), 6)
    return (
        daily.select("day", "revenue", n.alias("n"), z.alias("z"))
        .filter(F.col("n") >= 14)
        .withColumn("is_anomaly", F.abs(F.col("z")) > 3.0)
        .drop("n")
        .orderBy("day")
    )


_ANOMALY_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
    SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS rev_dec,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1),
stats AS (
  SELECT day, revenue,
    COUNT(revenue) OVER w AS n,
    CAST(SUM(rev_dec) OVER w AS DOUBLE) AS s1,
    CAST(SUM(CAST(revenue * revenue AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s2
  FROM daily WINDOW w AS (ORDER BY day ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING))
SELECT day, revenue,
  ROUND((revenue - s1 / n) / sqrt(GREATEST(s2 / n - (s1 / n) * (s1 / n), 1e-12)), 6) AS z,
  ABS(ROUND((revenue - s1 / n) / sqrt(GREATEST(s2 / n - (s1 / n) * (s1 / n), 1e-12)), 6)) > 3.0 AS is_anomaly
FROM stats WHERE n >= 14 ORDER BY day
"""


def q_dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: orphan counts across the star schema's foreign
    keys (anti-join per relation, unioned). The pipeline-gate shape for
    ingest validation — each check is one LeftAnti join whose build side is
    just the key column, so the audit scans each fact table once per FK."""

    def orphans(child: DataFrame, parent: DataFrame, ck: str, pk: str, label: str) -> DataFrame:
        return (
            child.select(F.col(ck))
            .join(parent.select(F.col(pk)), child[ck] == parent[pk], "left_anti")
            .agg(F.count("*").alias("orphans"))
            .select(F.lit(label).alias("relation"), "orphans")
        )

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    ev = _t(spark, sf_dir, "events")
    checks = [
        orphans(li, orders, "l_orderkey", "o_orderkey", "lineitem->orders"),
        orphans(orders, cust, "o_custkey", "c_custkey", "orders->customer"),
        orphans(li, sup, "l_suppkey", "s_suppkey", "lineitem->supplier"),
        orphans(ev, cust, "user_id", "c_custkey", "events->customer"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("relation")


_DQ_SQL = """
SELECT 'lineitem->orders' AS relation, COUNT(*) AS orphans FROM lineitem
  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
UNION ALL
SELECT 'orders->customer', COUNT(*) FROM orders
  WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
UNION ALL
SELECT 'lineitem->supplier', COUNT(*) FROM lineitem
  WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)
UNION ALL
SELECT 'events->customer', COUNT(*) FROM events
  WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = user_id)
ORDER BY relation
"""


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event type, with the sketch's 5%
    tolerance bound materialized IN the result: the raw HLL estimate is
    engine-specific (not oracle-hashable), so the query emits the exact
    count plus a boolean verdict `approx_within_5pct` — if the sketch ever
    drifts out of bound the verdict flips and the oracle hash catches it.
    The 100 TB cardinality path is the approx aggregate (one pass,
    fixed-size mergeable sketches, map-side partials — no distinct-shuffle
    of the key universe); the exact column is the verification twin, cf.
    sketch_rollup_daily_users for the sketch-only rollup shape."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
    )
    return (
        agg.select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_within_5pct"),
        )
        .orderBy("event_type")
    )


_APPROX_DISTINCT_SQL = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS approx_within_5pct
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q_gap_fill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (ClickHouse WITH FILL / timescale
    gapfill): complete date spine + linear interpolation of missing days."""
    daily = _orders_daily(spark, sf_dir).select(
        "date",
        F.col("order_count").cast("double").alias("order_count"),
        "total_revenue",
    )
    filled = gap_fill(daily, ["order_count", "total_revenue"], axis="date")
    return filled.select(
        "date", F.round("order_count", 6).alias("order_count"),
        F.round("total_revenue", 4).alias("total_revenue"),
    )


_GAPFILL_SQL = f"""
WITH d AS ({_ORDERS_DAILY_SQL}),
bounds AS (SELECT MIN(date) AS d0, MAX(date) AS d1 FROM d),
spine AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS date FROM bounds),
j AS (
  SELECT s.date, CAST(d.order_count AS DOUBLE) AS order_count, d.total_revenue,
         date_diff('day', DATE '1970-01-01', s.date) AS day
  FROM spine s LEFT JOIN d ON s.date = d.date),
w AS (
  SELECT date, order_count, total_revenue, day,
    LAST_VALUE(order_count IGNORE NULLS) OVER wp AS oc_prev,
    FIRST_VALUE(order_count IGNORE NULLS) OVER wn AS oc_next,
    LAST_VALUE(total_revenue IGNORE NULLS) OVER wp AS tr_prev,
    FIRST_VALUE(total_revenue IGNORE NULLS) OVER wn AS tr_next,
    LAST_VALUE(CASE WHEN order_count IS NOT NULL THEN day END IGNORE NULLS) OVER wp AS oc_pd,
    FIRST_VALUE(CASE WHEN order_count IS NOT NULL THEN day END IGNORE NULLS) OVER wn AS oc_nd,
    LAST_VALUE(CASE WHEN total_revenue IS NOT NULL THEN day END IGNORE NULLS) OVER wp AS tr_pd,
    FIRST_VALUE(CASE WHEN total_revenue IS NOT NULL THEN day END IGNORE NULLS) OVER wn AS tr_nd
  FROM j
  WINDOW wp AS (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (ORDER BY date ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT date,
  round(COALESCE(order_count, oc_prev + (oc_next - oc_prev) * (day - oc_pd) / (oc_nd - oc_pd), oc_prev, oc_next), 6) AS order_count,
  round(COALESCE(total_revenue, tr_prev + (tr_next - tr_prev) * (day - tr_pd) / (tr_nd - tr_pd), tr_prev, tr_next), 4) AS total_revenue
FROM w
"""


def q_timeseries_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS over day/month/year time buckets — one scan, one
    expand, three granularities (the hypertable-rollup pattern)."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql("""
      SELECT CASE WHEN grouping(d) = 0 THEN 'day'
                  WHEN grouping(m) = 0 THEN 'month'
                  ELSE 'year' END AS grain,
             coalesce(d, m, y) AS bucket_start,
             count(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS total_value
      FROM (SELECT CAST(ts AS DATE) AS d,
                   CAST(date_trunc('MONTH', ts) AS DATE) AS m,
                   CAST(date_trunc('YEAR', ts) AS DATE) AS y,
                   value
            FROM events_v)
      GROUP BY GROUPING SETS ((d), (m), (y))
    """)


_MULTIGRAIN_SQL = """
SELECT CASE WHEN grouping(d) = 0 THEN 'day'
            WHEN grouping(m) = 0 THEN 'month'
            ELSE 'year' END AS grain,
       coalesce(d, m, y) AS bucket_start,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS total_value
FROM (SELECT CAST(ts AS DATE) AS d,
             CAST(date_trunc('month', ts) AS DATE) AS m,
             CAST(date_trunc('year', ts) AS DATE) AS y,
             value
      FROM events)
GROUP BY GROUPING SETS ((d), (m), (y))
"""


def q_percentiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (two-phase: sort within
    group partitions). approx_percentile is the sketch alternative when a
    single group's values exceed task memory."""
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(c_acctbal, 0.25)"), 6).alias("p25"),
            F.round(F.expr("percentile(c_acctbal, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(c_acctbal, 0.75)"), 6).alias("p75"),
            F.count("*").alias("n"),
        )
        .orderBy("c_mktsegment")
    )


_PCTL_SQL = """
SELECT c_mktsegment,
  round(quantile_cont(c_acctbal, 0.25), 6) AS p25,
  round(quantile_cont(c_acctbal, 0.50), 6) AS p50,
  round(quantile_cont(c_acctbal, 0.75), 6) AS p75,
  COUNT(*) AS n
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per group (expands to two-phase agg)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


_DISTINCT_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# text analysis (extension)
# --------------------------------------------------------------------------

_TOKS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.token_count(t).alias("n_tokens"),
        TX.char_count(t).alias("n_chars"),
        TX.punct_ratio(t).alias("punct_ratio"),
        TX.mean_word_length(t).alias("mean_word_len"),
        TX.stopword_ratio(t, "en").alias("stopword_ratio_en"),
    )


_TEXT_STATS_SQL = f"""
SELECT doc_id,
  len({_TOKS_SQL}) AS n_tokens,
  length(text) AS n_chars,
  (length(text) - length(regexp_replace(text, '[.,;:!?()\\[\\]{{}}"'']', '', 'g'))) / greatest(length(text), 1) AS punct_ratio,
  coalesce(list_sum(list_transform({_TOKS_SQL}, t -> length(t))), 0) / greatest(len({_TOKS_SQL}), 1) AS mean_word_len,
  len(list_filter({_TOKS_SQL}, t -> t IN ({",".join(repr(w) for w in STOPWORDS["en"])}))) / greatest(len({_TOKS_SQL}), 1) AS stopword_ratio_en
FROM documents
"""


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.lang_id(F.col("text")).alias("lang_pred"))


def _lang_case() -> str:
    """CASE expression for heuristic language ID over a `text` column."""
    scores = {
        lang: f"len(list_filter({_TOKS_SQL}, t -> t IN ({','.join(repr(w) for w in words)})))"
        for lang, words in STOPWORDS.items()
    }
    best = "greatest(" + ", ".join(scores.values()) + ")"
    cases = " ".join(
        f"WHEN {scores[lang]} > 0 AND {scores[lang]} = {best} THEN '{lang}'" for lang in STOPWORDS
    )
    return f"CASE {cases} ELSE 'und' END"


def _lang_sql() -> str:
    return f"SELECT doc_id, {_lang_case()} AS lang_pred FROM documents"


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.quality_score(F.col("text")).alias("quality"))


_QUALITY_SQL = f"""
SELECT doc_id,
  ((CASE WHEN len({_TOKS_SQL}) BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.0 END)
 + (CASE WHEN (length(text) - length(regexp_replace(text, '[.,;:!?()\\[\\]{{}}"'']', '', 'g'))) / greatest(length(text), 1) < 0.2 THEN 1.0 ELSE 0.0 END)
 + (CASE WHEN len(list_filter({_TOKS_SQL}, t -> t IN ({",".join(repr(w) for w in STOPWORDS["en"])}))) / greatest(len({_TOKS_SQL}), 1) > 0.05 THEN 1.0 ELSE 0.0 END)) / 3.0 AS quality
FROM documents
"""


def q_text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token budget vs whitespace token count per document."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.bpe_token_count(t).alias("n_bpe_tokens"),
        TX.token_count(t).alias("n_ws_tokens"),
    )


_BPE_SQL = f"""
SELECT doc_id,
  len(regexp_extract_all(lower(text), '{TX.BPE_SPLIT_RE.replace(chr(39), chr(39) * 2)}')) AS n_bpe_tokens,
  len({_TOKS_SQL}) AS n_ws_tokens
FROM documents
"""


def q_text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level word count: explode tokens -> groupBy -> top-20.
    The canonical map-side-combine aggregation (partial counts per
    partition; the shuffle carries one row per distinct token). The
    top-20 is orderBy+limit — TakeOrderedAndProject, each partition
    retains 20 rows — and the rank column is a window over the already
    20-row frame, never over the full vocabulary."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(TX.tokens(F.col("text"))).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("n"))
    top = RK.top_k(counts, [F.col("n").desc(), F.col("token")], 20)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return top.withColumn("rank", F.row_number().over(w))


_TOP_TOKENS_SQL = f"""
WITH tok AS (SELECT unnest({_TOKS_SQL}) AS token FROM documents),
counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token)
SELECT token, n, rank FROM (
  SELECT token, n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank FROM counts)
WHERE rank <= 20
"""


def q_text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction (top-3 terms per doc over a
    50-doc slice). Two aggregations over one token explode — term frequency
    per (doc, token) and document frequency per token — joined and ranked
    by a per-doc window. At corpus scale the df side is the vocabulary
    (small, broadcastable) while tf shuffles with map-side combine; tfidf
    is rounded to 6dp and ranked on the ROUNDED value in both engines so
    libm ulp differences in ln() cannot flip rank order."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    tok = docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))), 6
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "tfidf", "rank")
        .orderBy("doc_id", "rank")
    )


_TFIDF_SQL = f"""
WITH docs50 AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM docs50),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM docs50),
scored AS (
  SELECT doc_id, token, ROUND(tf * ln((1.0 + n_docs) / (1.0 + df)), 6) AS tfidf
  FROM tf JOIN df USING (token) CROSS JOIN n)
SELECT doc_id, token, tfidf, rank FROM (
  SELECT doc_id, token, tfidf,
    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank
  FROM scored)
WHERE rank <= 3 ORDER BY doc_id, rank
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))


_FP_SQL = f"SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents"


# --------------------------------------------------------------------------
# dedup (extension)
# --------------------------------------------------------------------------


def q_dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    fp = TX.fingerprint(F.col("text"))
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(fp).alias("n_unique"),
        (F.count("*") - F.countDistinct(fp)).alias("n_dupes"),
    )


_DEDUP_EXACT_SQL = (
    f"SELECT COUNT(*) AS n_docs, COUNT(DISTINCT md5({_NORM_SQL})) AS n_unique, "
    f"COUNT(*) - COUNT(DISTINCT md5({_NORM_SQL})) AS n_dupes FROM documents"
)

_SHINGLES_SQL = (
    f"list_distinct(list_transform(generate_series(1, greatest(length({_NORM_SQL}) - 4, 1)), "
    f"i -> substr({_NORM_SQL}, i, 5)))"
)


def q_dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return DD.minhash_signatures(docs, num_hashes=4)


_MINHASH_SIG_SQL = f"""
WITH s AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents)
SELECT doc_id,
  list_min(list_transform(sh, x -> md5('0' || x))) AS sig_0,
  list_min(list_transform(sh, x -> md5('1' || x))) AS sig_1,
  list_min(list_transform(sh, x -> md5('2' || x))) AS sig_2,
  list_min(list_transform(sh, x -> md5('3' || x))) AS sig_3
FROM s
"""


def q_dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # cache_key shares the persisted banded-signature stage with the
    # other three dedup-family queries: one corpus pass per run, not four
    return DD.minhash_lsh_candidates(docs, num_hashes=16, bands=4, cache_key=sf_dir)


_P = DD.MINHASH_PRIME
_MH = DD.minhash_params(16)

_SIG_MINS_SQL = ", ".join(
    f"MIN(({a} * x + {b}) % {_P}) AS h{i}" for i, (a, b) in enumerate(_MH)
)
_BAND_LIST_SQL = ", ".join(
    "concat_ws(',', '" + str(b) + "', " + ", ".join(f"h{b * 4 + r}" for r in range(4)) + ")"
    for b in range(4)
)

_MINHASH_LSH_SQL = f"""
WITH s AS (SELECT doc_id, unnest({_SHINGLES_SQL}) AS sh FROM documents),
h AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT % {_P} AS x FROM s),
sig AS (SELECT doc_id, {_SIG_MINS_SQL} FROM h GROUP BY doc_id),
banded AS (
  SELECT doc_id, unnest([{_BAND_LIST_SQL}]) AS band
  FROM sig)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return DD.simhash_signatures(docs)


_SIMHASH_SQL = f"""
WITH t AS (SELECT doc_id, list_transform({_TOKS_SQL},
             tok -> ('0x' || substr(md5(tok), 1, 8))::BIGINT) AS hashes
           FROM documents)
SELECT doc_id,
  list_sum(list_transform(generate_series(0, 31), i ->
    CASE WHEN list_sum(list_transform(hashes, h ->
      CASE WHEN CAST(floor(h / pow(2, i)) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END)) > 0
    THEN CAST(pow(2, i) AS BIGINT) ELSE 0 END))::BIGINT AS simhash
FROM t
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus near-dup pairs: LSH candidates + exact-Jaccard verify at
    0.8 — the scale pipeline (all-pairs shingle join never runs; the
    verification join only sees candidate docs). Jaccard rounded to 1e-6
    for cross-engine float safety."""
    docs = _t(spark, sf_dir, "documents")
    pairs = DD.lsh_verified_pairs(docs, threshold=0.8, cache_key=sf_dir)
    return pairs.withColumn("jaccard", F.round("jaccard", 6))


_JACCARD_SQL = f"""
WITH s AS (SELECT doc_id, unnest({_SHINGLES_SQL}) AS shg FROM documents),
h AS (SELECT doc_id, ('0x' || substr(md5(shg), 1, 15))::BIGINT % {_P} AS x FROM s),
sig AS (SELECT doc_id, {_SIG_MINS_SQL} FROM h GROUP BY doc_id),
banded AS (
  SELECT doc_id, unnest([{_BAND_LIST_SQL}]) AS band
  FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
sets AS (SELECT doc_id, {_SHINGLES_SQL} AS sh_set FROM documents),
verified AS (
  SELECT c.id_a, c.id_b,
    len(list_intersect(sa.sh_set, sb.sh_set))
      / (len(sa.sh_set) + len(sb.sh_set) - len(list_intersect(sa.sh_set, sb.sh_set))) AS jaccard
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b)
SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM verified WHERE jaccard >= 0.8
"""


def q_dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-inside-doc detection: containment |A∩B|/|A| catches a short doc
    quoted verbatim inside a long one, which Jaccard misses (the union is
    dominated by the long doc). Shares the persisted banded-signature and
    shingle-set stages with the rest of the dedup family (cache_key) — the
    verification formula is the only new work, so the marginal cost is one
    O(candidate-pairs) join. Both directions emitted as exact integer ppm."""
    docs = _t(spark, sf_dir, "documents")
    return DD.containment_pairs(docs, threshold_ppm=600_000, cache_key=sf_dir)


_CONTAIN_SQL = f"""
WITH s AS (SELECT doc_id, unnest({_SHINGLES_SQL}) AS shg FROM documents),
h AS (SELECT doc_id, ('0x' || substr(md5(shg), 1, 15))::BIGINT % {_P} AS x FROM s),
sig AS (SELECT doc_id, {_SIG_MINS_SQL} FROM h GROUP BY doc_id),
banded AS (
  SELECT doc_id, unnest([{_BAND_LIST_SQL}]) AS band
  FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
sets AS (SELECT doc_id, {_SHINGLES_SQL} AS sh_set FROM documents),
verified AS (
  SELECT c.id_a, c.id_b,
    len(list_intersect(sa.sh_set, sb.sh_set)) AS common,
    len(sa.sh_set) AS n_a, len(sb.sh_set) AS n_b
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b)
SELECT id_a, id_b,
  CAST(common * 1000000 // n_a AS BIGINT) AS cont_a_in_b_ppm,
  CAST(common * 1000000 // n_b AS BIGINT) AS cont_b_in_a_ppm,
  CASE WHEN common * 1000000 // n_a >= common * 1000000 // n_b
       THEN 'a_in_b' ELSE 'b_in_a' END AS contained
FROM verified
WHERE GREATEST(common * 1000000 // n_a, common * 1000000 // n_b) >= 600000
"""


# --------------------------------------------------------------------------
# dedup at fan-out scale (r5 VERDICT #3): the forecast_scale treatment
# applied to the LSH family. A synthetic corpus with a PLANTED duplicate
# structure — per 10-doc group: ids ..0-..7 unique, ..8 a near-dup of ..0
# (one of 30 tokens mutated, Jaccard ≈ 0.9), ..9 an exact dup of ..0 — is
# generated DETERMINISTICALLY from md5 in both engines, so the end-to-end
# pipeline (shingle → minhash → band join → verify) has exact expected
# recoveries: every exact pair MUST be found (identical signature ⇒ all
# bands collide), near pairs follow the banding collision law, and cross-
# group pairs are hash accidents (≈0). dedup_scale_audit runs 60k docs
# (rows-only; tests/test_dedup_scale.py pins linear candidate growth and
# bounded band occupancy across 15k→30k→60k); dedup_scale_contract_audit
# hash-gates the identical dataflow at 2k docs against a DuckDB twin that
# replays the whole pipeline on the same generated corpus.
# --------------------------------------------------------------------------

_DEDUP_SCALE_TOKENS = 30


def synth_dedup_corpus(spark: SparkSession, n_docs: int) -> DataFrame:
    """(doc_id, text) synthetic corpus with the planted-dup structure above.
    Pure expressions over spark.range — no data files, fully deterministic,
    reproducible bit-for-bit by the DuckDB twin (_synth_corpus_sql)."""
    d = F.col("id")
    src = F.when((d % 10) >= 8, d - (d % 10)).otherwise(d).cast("string")
    toks = [
        F.substring(F.md5(F.concat(src, F.lit(f"_{j}"))), 1, 8)
        for j in range(_DEDUP_SCALE_TOKENS - 1)
    ]
    last_seed = F.when(
        (d % 10) == 8, F.concat(src, F.lit("_mut"))
    ).otherwise(F.concat(src, F.lit(f"_{_DEDUP_SCALE_TOKENS - 1}")))
    toks.append(F.substring(F.md5(last_seed), 1, 8))
    return spark.range(n_docs).select(
        d.alias("doc_id"), F.concat_ws(" ", *toks).alias("text")
    )


def dedup_scale_audit_frame(spark: SparkSession, n_docs: int) -> DataFrame:
    """One summary row over the full LSH dedup pipeline on the synthetic
    corpus: corpus size, candidate volume, verified pairs at 0.8, exact
    pairs (must equal n_docs/10 — identical docs always collide), intra-
    vs cross-group split, and the max band-bucket occupancy (the quantity
    the in-plan guard bounds). All counts are exact integers."""
    docs = synth_dedup_corpus(spark, n_docs)
    key = ("dedup_scale", n_docs)
    cand = DD.minhash_lsh_candidates(docs, cache_key=key)
    verified = DD.lsh_verified_pairs(docs, threshold=0.8, cache_key=key)
    banded = DD.banded_signatures(docs, cache_key=key)
    n_cand = cand.agg(F.count("*").cast("bigint").alias("n_candidates"))
    occ = (
        banded.groupBy("band").agg(F.count("*").alias("c"))
        .agg(F.max("c").cast("bigint").alias("max_band_occupancy"))
    )
    v = verified.agg(
        F.count("*").cast("bigint").alias("n_verified_08"),
        F.sum((F.col("jaccard") == 1.0).cast("int")).cast("bigint").alias("n_exact_pairs"),
        F.sum(
            (F.expr("id_a div 10") == F.expr("id_b div 10")).cast("int")
        ).cast("bigint").alias("n_intra_group"),
        F.sum(
            (F.expr("id_a div 10") != F.expr("id_b div 10")).cast("int")
        ).cast("bigint").alias("n_cross_group"),
    )
    return (
        v.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(occ))
        .select(
            F.lit(n_docs).cast("bigint").alias("n_docs"),
            "n_candidates", "n_verified_08", "n_exact_pairs",
            "n_intra_group", "n_cross_group", "max_band_occupancy",
        )
    )


def q_dedup_scale_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60k-doc end-to-end LSH scale proof (rows-only; the hash-gated twin
    is dedup_scale_contract_audit at 2k — identical dataflow, identical
    generator). Scaling pins live in tests/test_dedup_scale.py."""
    return dedup_scale_audit_frame(spark, 60_000)


def q_dedup_scale_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_scale_audit_frame(spark, 2_000)


def _synth_corpus_sql(n_docs: int) -> str:
    toks = ",\n    ".join(
        f"substr(md5(concat(CAST(src AS VARCHAR), '_{j}')), 1, 8)"
        for j in range(_DEDUP_SCALE_TOKENS - 1)
    )
    last = (
        "substr(md5(CASE WHEN doc_id % 10 = 8 THEN concat(CAST(src AS VARCHAR), '_mut') "
        f"ELSE concat(CAST(src AS VARCHAR), '_{_DEDUP_SCALE_TOKENS - 1}') END), 1, 8)"
    )
    return f"""ids AS (
  SELECT i AS doc_id,
    CASE WHEN i % 10 >= 8 THEN i - (i % 10) ELSE i END AS src
  FROM range({n_docs}) t(i)),
corpus AS (
  SELECT doc_id, concat_ws(' ',
    {toks},
    {last}) AS text
  FROM ids)"""


_SHINGLES_CORPUS_SQL = _SHINGLES_SQL  # generic over any relation with `text`

_DEDUP_SCALE_AUDIT_SQL = f"""
WITH {_synth_corpus_sql(2_000)},
s AS (SELECT doc_id, unnest({_SHINGLES_CORPUS_SQL}) AS shg FROM corpus),
h AS (SELECT doc_id, ('0x' || substr(md5(shg), 1, 15))::BIGINT % {_P} AS x FROM s),
sig AS (SELECT doc_id, {_SIG_MINS_SQL} FROM h GROUP BY doc_id),
banded AS (
  SELECT doc_id, unnest([{_BAND_LIST_SQL}]) AS band
  FROM sig),
occ AS (SELECT MAX(c) AS mx FROM (SELECT COUNT(*) AS c FROM banded GROUP BY band)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
sets AS (SELECT doc_id, {_SHINGLES_CORPUS_SQL} AS sh_set FROM corpus),
verified AS (
  SELECT c.id_a, c.id_b,
    len(list_intersect(sa.sh_set, sb.sh_set))
      / (len(sa.sh_set) + len(sb.sh_set) - len(list_intersect(sa.sh_set, sb.sh_set))) AS jaccard
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b),
v08 AS (SELECT * FROM verified WHERE jaccard >= 0.8)
SELECT CAST(2000 AS BIGINT) AS n_docs,
  CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
  CAST(COUNT(*) AS BIGINT) AS n_verified_08,
  CAST(COALESCE(SUM(CASE WHEN jaccard = 1.0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_exact_pairs,
  CAST(COALESCE(SUM(CASE WHEN id_a // 10 = id_b // 10 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_intra_group,
  CAST(COALESCE(SUM(CASE WHEN id_a // 10 <> id_b // 10 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_cross_group,
  CAST((SELECT mx FROM occ) AS BIGINT) AS max_band_occupancy
FROM v08
"""


# --------------------------------------------------------------------------
# ANN at fan-out scale (r5 VERDICT #5): the dedup_scale treatment applied
# to the similarity family. A synthetic embedding corpus with PLANTED
# neighbor structure — per 10-vector group: ids ..0-..7 independent
# md5-derived vectors (components on the 1e-3 grid in [-1, 1]); ..9 an
# EXACT duplicate of ..0 (identical bits ⇒ identical sign-projection
# signature at ANY plane count — recovery must be total); ..8 a NEAR
# duplicate of ..0 (last coordinate shifted by an md5-derived delta in
# [-0.1, 0.1], cosine ≈ 0.999) whose bucket-collision rate follows the
# (1 − θ/π)^planes law. Plane count scales with the corpus
# (⌈log2 n⌉ + 3): expected random-bucket occupancy n/2^planes stays O(1),
# so candidate volume grows LINEARLY with n — the documented scale
# contract for sign-projection LSH (SCALING.md: "size n_planes to data
# volume"). ann_scale_audit runs 30k vectors (rows-only;
# tests/test_ann_scale.py pins exact-recovery totality, linear candidate
# growth and bounded occupancy across 7.5k→15k→30k);
# ann_scale_contract_audit hash-gates the identical dataflow at 2k
# vectors against a DuckDB twin that replays corpus generation,
# signatures, the bucket pair join and the cosine verify with the same
# sequential-sum float algebra.
# --------------------------------------------------------------------------

_ANN_SCALE_DIM = 8


def _ann_planes(n_vecs: int) -> int:
    import math

    return max(10, int(math.ceil(math.log2(n_vecs))) + 3)


def synth_embedding_corpus(spark: SparkSession, n_vecs: int) -> DataFrame:
    """(vec_id, embedding) deterministic synthetic corpus with the planted
    neighbor structure above. Pure expressions over spark.range — no data
    files; reproduced bit-for-bit by the DuckDB twin (_ann_corpus_sql):
    components are exact integer arithmetic divided by 1000.0, the near
    mutation is one IEEE add — identical doubles in both engines."""
    d = F.col("id")
    src = F.when((d % 10) >= 8, d - (d % 10)).otherwise(d).cast("string")

    def draw(seed_col, modulus: int, half: int):
        return (
            (
                F.conv(F.substring(F.md5(seed_col), 1, 15), 16, 10).cast("bigint")
                % modulus
                - half
            ).cast("double")
            / 1000.0
        )

    comps = [
        draw(F.concat(src, F.lit(f"_c{j}")), 2001, 1000)
        for j in range(_ANN_SCALE_DIM)
    ]
    delta = draw(F.concat(src, F.lit("_mut")), 201, 100)
    comps[-1] = F.when((d % 10) == 8, comps[-1] + delta).otherwise(comps[-1])
    return spark.range(n_vecs).select(
        d.alias("vec_id"), F.array(*comps).alias("embedding")
    )


def ann_scale_audit_frame(spark: SparkSession, n_vecs: int) -> DataFrame:
    """One summary row over the full hyperplane-LSH near-dup pipeline on
    the synthetic corpus: corpus size, plane count, bucket-pair candidate
    volume, verified pairs at cosine ≥ 0.95 (6dp-rounded BEFORE the
    filter, both engines), exact pairs (rounded cosine 1.0 — must equal
    n/10), intra- vs cross-group split, and the max bucket occupancy (the
    quantity the in-plan guard bounds). Each vector lands in exactly ONE
    bucket (single signature, no banding), so a pair collides at most
    once — no distinct pass. The bucketed frame is checkpointed: the
    occupancy probe and both join sides read one materialization."""
    n_planes = _ann_planes(n_vecs)
    emb = synth_embedding_corpus(spark, n_vecs)
    bucketed = SIM.lsh_bucket_assignments(
        emb, _ANN_SCALE_DIM, n_planes, seed=42
    ).localCheckpoint(eager=True)
    occ = (
        bucketed.groupBy("bucket")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").cast("bigint").alias("max_bucket_occupancy"))
    )
    a = bucketed.select(
        "bucket", F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    b = bucketed.select(
        "bucket", F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    )
    scored = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(DD.cosine_similarity(F.col("va"), F.col("vb")), 6).alias(
                "cosine"
            ),
        )
    )
    intra = F.expr("id_a div 10") == F.expr("id_b div 10")
    ra, rb = F.col("id_a") % 10, F.col("id_b") % 10
    # the planted structure: (g+0, g+9) exact; (g+0, g+8) and (g+8, g+9)
    # near (g+9 IS g+0, so both near pairs share the same mutated vector)
    planted_exact = intra & (ra == 0) & (rb == 9)
    planted_near = intra & (
        ((ra == 0) & (rb == 8)) | ((ra == 8) & (rb == 9))
    )
    summary = scored.agg(
        F.count("*").cast("bigint").alias("n_candidates"),
        F.sum((F.col("cosine") >= 0.95).cast("int")).cast("bigint").alias(
            "n_verified_095"
        ),
        F.sum((F.col("cosine") == 1.0).cast("int")).cast("bigint").alias(
            "n_exact_pairs"
        ),
        F.sum(planted_exact.cast("int")).cast("bigint").alias(
            "n_planted_exact_recovered"
        ),
        F.sum(planted_near.cast("int")).cast("bigint").alias(
            "n_planted_near_recovered"
        ),
        F.sum((~intra).cast("int")).cast("bigint").alias("n_cross_group"),
    )
    return summary.crossJoin(F.broadcast(occ)).select(
        F.lit(n_vecs).cast("bigint").alias("n_vecs"),
        F.lit(n_planes).cast("bigint").alias("n_planes"),
        "n_candidates",
        "n_verified_095",
        "n_exact_pairs",
        "n_planted_exact_recovered",
        "n_planted_near_recovered",
        "n_cross_group",
        "max_bucket_occupancy",
    )


def q_ann_scale_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30k-vector end-to-end hyperplane-LSH scale proof (rows-only; the
    hash-gated twin is ann_scale_contract_audit at 2k — identical
    dataflow, identical generator). Scaling pins live in
    tests/test_ann_scale.py."""
    return ann_scale_audit_frame(spark, 30_000)


def q_ann_scale_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_scale_audit_frame(spark, 2_000)


def _ann_corpus_sql(n_vecs: int) -> str:
    comps = ",\n      ".join(
        f"(('0x' || substr(md5(concat(CAST(src AS VARCHAR), '_c{j}')), 1, 15))::BIGINT % 2001 - 1000)::DOUBLE / 1000.0"
        for j in range(_ANN_SCALE_DIM - 1)
    )
    last = (
        f"(('0x' || substr(md5(concat(CAST(src AS VARCHAR), '_c{_ANN_SCALE_DIM - 1}')), 1, 15))::BIGINT % 2001 - 1000)::DOUBLE / 1000.0"
        " + CASE WHEN vec_id % 10 = 8 THEN"
        " (('0x' || substr(md5(concat(CAST(src AS VARCHAR), '_mut')), 1, 15))::BIGINT % 201 - 100)::DOUBLE / 1000.0"
        " ELSE 0.0 END"
    )
    return f"""ids AS (
  SELECT i AS vec_id,
    CASE WHEN i % 10 >= 8 THEN i - (i % 10) ELSE i END AS src
  FROM range({n_vecs}) t(i)),
corpus AS (
  SELECT vec_id, [
      {comps},
      {last}]::DOUBLE[] AS embedding
  FROM ids)"""


def _ann_scale_audit_sql(n_vecs: int) -> str:
    n_planes = _ann_planes(n_vecs)
    return f"""
WITH {_ann_corpus_sql(n_vecs)},
{_planes_cte(n_planes, dim=_ANN_SCALE_DIM)},
dots AS (
  SELECT e.vec_id, p.i,
    list_sum(list_transform(generate_series(1, {_ANN_SCALE_DIM}),
             j -> e.embedding[j] * p.p[j])) AS d
  FROM corpus e CROSS JOIN planes p),
sigs AS (
  SELECT vec_id,
    CAST(SUM(CASE WHEN d > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id),
occ AS (SELECT MAX(c) AS mx FROM (SELECT COUNT(*) AS c FROM sigs GROUP BY bucket)),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
scored AS (
  SELECT p.id_a, p.id_b,
    round(list_sum(list_transform(generate_series(1, {_ANN_SCALE_DIM}),
          j -> ea.embedding[j] * eb.embedding[j]))
    / (sqrt(list_sum(list_transform(ea.embedding, x -> x * x)))
     * sqrt(list_sum(list_transform(eb.embedding, x -> x * x)))), 6) AS cosine
  FROM pairs p
  JOIN corpus ea ON ea.vec_id = p.id_a
  JOIN corpus eb ON eb.vec_id = p.id_b)
SELECT CAST({n_vecs} AS BIGINT) AS n_vecs,
  CAST({n_planes} AS BIGINT) AS n_planes,
  CAST(COUNT(*) AS BIGINT) AS n_candidates,
  CAST(COALESCE(SUM(CASE WHEN cosine >= 0.95 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_verified_095,
  CAST(COALESCE(SUM(CASE WHEN cosine = 1.0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_exact_pairs,
  CAST(COALESCE(SUM(CASE WHEN id_a // 10 = id_b // 10
    AND id_a % 10 = 0 AND id_b % 10 = 9 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_planted_exact_recovered,
  CAST(COALESCE(SUM(CASE WHEN id_a // 10 = id_b // 10
    AND ((id_a % 10 = 0 AND id_b % 10 = 8) OR (id_a % 10 = 8 AND id_b % 10 = 9))
    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_planted_near_recovered,
  CAST(COALESCE(SUM(CASE WHEN id_a // 10 <> id_b // 10 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_cross_group,
  CAST((SELECT mx FROM occ) AS BIGINT) AS max_bucket_occupancy
FROM scored
"""


# (_ANN_SCALE_CONTRACT_SQL is materialized after _planes_cte is defined,
# next to the other LSH oracle constants)


def q_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filtering, exact-arithmetic edition: a bigram
    model is trained on the corpus itself (count(w1,w2)/count(w1·) as
    integer ppm) and every document is scored by its mean bigram
    probability — word-soup and boilerplate-heavy shards surface at the
    extremes. Per-source report: corpus mean and the min/max document
    scores.

    Scale: ONE groupBy over the exploded bigrams trains the model
    (map-side partial aggs; context totals derive from the model table
    itself — see functions/lm.py), one equi-join scores; both stages
    persist per run and are shared with the curation funnel's low-LM
    rule, so the corpus pays one train + one score pass total."""
    docs = _t(spark, sf_dir, "documents")
    per_doc = LM.doc_scores(docs, cache_key=sf_dir)
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_bigrams").cast("bigint").alias("n_bigrams"),
            F.expr("sum(sum_ppm) div sum(n_bigrams)")
            .cast("bigint")
            .alias("corpus_mean_ppm"),
            F.min(F.expr("sum_ppm div n_bigrams")).cast("bigint").alias("min_doc_ppm"),
            F.max(F.expr("sum_ppm div n_bigrams")).cast("bigint").alias("max_doc_ppm"),
        )
        .orderBy("source")
    )


_BIGRAM_LM_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, {_TOKS_SQL} AS l FROM documents
  WHERE len({_TOKS_SQL}) >= 2),
bg AS (
  SELECT doc_id, source, unnest(l[1:len(l)-1]) AS w1, unnest(l[2:len(l)]) AS w2
  FROM toks),
c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1),
lm AS (
  SELECT c2.w1, c2.w2, c2.c2 * 1000000 // c1.c1 AS p_ppm
  FROM c2 JOIN c1 ON c1.w1 = c2.w1),
per_doc AS (
  SELECT bg.doc_id, bg.source, COUNT(*) AS n_bigrams, SUM(p_ppm) AS sum_ppm
  FROM bg JOIN lm ON lm.w1 = bg.w1 AND lm.w2 = bg.w2
  GROUP BY bg.doc_id, bg.source)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
  CAST(SUM(sum_ppm) // SUM(n_bigrams) AS BIGINT) AS corpus_mean_ppm,
  CAST(MIN(sum_ppm // n_bigrams) AS BIGINT) AS min_doc_ppm,
  CAST(MAX(sum_ppm // n_bigrams) AS BIGINT) AS max_doc_ppm
FROM per_doc GROUP BY source ORDER BY source
"""


def q_dedup_near_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shipped artifact: corpus minus near-dups (min-id keeper rule)."""
    docs = _t(spark, sf_dir, "documents")
    return DD.dedup_near(docs, threshold=0.8, cache_key=sf_dir).select(
        "doc_id", "lang", "source"
    )


_DEDUP_NEAR_SQL = f"""
WITH s AS (SELECT doc_id, unnest({_SHINGLES_SQL}) AS shg FROM documents),
h AS (SELECT doc_id, ('0x' || substr(md5(shg), 1, 15))::BIGINT % {_P} AS x FROM s),
sig AS (SELECT doc_id, {_SIG_MINS_SQL} FROM h GROUP BY doc_id),
banded AS (
  SELECT doc_id, unnest([{_BAND_LIST_SQL}]) AS band
  FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
sets AS (SELECT doc_id, {_SHINGLES_SQL} AS sh_set FROM documents),
verified AS (
  SELECT c.id_a, c.id_b,
    len(list_intersect(sa.sh_set, sb.sh_set))
      / (len(sa.sh_set) + len(sb.sh_set) - len(list_intersect(sa.sh_set, sb.sh_set))) AS jaccard
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b),
drop_ids AS (SELECT DISTINCT id_b FROM verified WHERE jaccard >= 0.8)
SELECT doc_id, lang, source FROM documents
WHERE doc_id NOT IN (SELECT id_b FROM drop_ids)
"""


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters as connected components (iterative label
    propagation on Spark; the oracle computes the same transitive closure
    with a recursive CTE)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = DD.lsh_verified_pairs(docs, threshold=0.8, cache_key=sf_dir)
    return DD.connected_components(pairs).orderBy("id")


def q_dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME dup clusters through the O(log n)-round large-star /
    small-star algorithm (operators/graph.connected_components_star —
    Kiveris et al.): per-hop label propagation costs one round per hop
    of cluster diameter, so a pathological million-doc near-dup CHAIN
    (template families, quoted-reply threads) stalls it at 100 TB; the
    star steps collapse chains logarithmically with scalar per-key
    state. Hash-gated against the identical recursive-CTE closure as
    dedup_components — two independent algorithms, one answer."""
    from .operators.graph import connected_components_star

    docs = _t(spark, sf_dir, "documents")
    pairs = DD.lsh_verified_pairs(docs, threshold=0.8, cache_key=sf_dir)
    comps, _rounds = connected_components_star(pairs)
    return comps.orderBy("id")


_CC_SQL = f"""
WITH RECURSIVE base AS (
  WITH s AS (SELECT doc_id, unnest({_SHINGLES_SQL}) AS shg FROM documents),
  h AS (SELECT doc_id, ('0x' || substr(md5(shg), 1, 15))::BIGINT % {_P} AS x FROM s),
  sig AS (SELECT doc_id, {_SIG_MINS_SQL} FROM h GROUP BY doc_id),
  banded AS (SELECT doc_id, unnest([{_BAND_LIST_SQL}]) AS band FROM sig),
  cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
  sets AS (SELECT doc_id, {_SHINGLES_SQL} AS sh_set FROM documents)
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b
  WHERE len(list_intersect(sa.sh_set, sb.sh_set))
        / (len(sa.sh_set) + len(sb.sh_set) - len(list_intersect(sa.sh_set, sb.sh_set))) >= 0.8
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM base
  UNION SELECT id_b, id_a FROM base),
reach(s, t) AS (
  SELECT src, src FROM edges
  UNION
  SELECT r.s, e.dst FROM reach r JOIN edges e ON r.t = e.src)
SELECT s AS id, MIN(t) AS component FROM reach GROUP BY s ORDER BY id
"""


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data curation pass in one plan: language ID +
    quality filter + near-dedup, emitting the surviving corpus with its
    metadata. This is the composition a 100 TB pipeline ships nightly."""
    docs = _t(spark, sf_dir, "documents")
    kept = DD.dedup_near(docs, threshold=0.8)
    return (
        kept.withColumn("lang_pred", TX.lang_id(F.col("text")))
        .withColumn("quality", TX.quality_score(F.col("text")))
        .filter(F.col("quality") >= 1.0 - 1e-9)
        .select("doc_id", "lang_pred", F.round("quality", 6).alias("quality"))
    )


_CURATION_SQL = f"""
WITH s AS (SELECT doc_id, unnest({_SHINGLES_SQL}) AS shg FROM documents),
h AS (SELECT doc_id, ('0x' || substr(md5(shg), 1, 15))::BIGINT % {_P} AS x FROM s),
sig AS (SELECT doc_id, {_SIG_MINS_SQL} FROM h GROUP BY doc_id),
banded AS (SELECT doc_id, unnest([{_BAND_LIST_SQL}]) AS band FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
sets AS (SELECT doc_id, {_SHINGLES_SQL} AS sh_set FROM documents),
verified AS (
  SELECT c.id_a, c.id_b,
    len(list_intersect(sa.sh_set, sb.sh_set))
      / (len(sa.sh_set) + len(sb.sh_set) - len(list_intersect(sa.sh_set, sb.sh_set))) AS jaccard
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b),
drop_ids AS (SELECT DISTINCT id_b FROM verified WHERE jaccard >= 0.8),
kept AS (SELECT * FROM documents WHERE doc_id NOT IN (SELECT id_b FROM drop_ids)),
scored AS (
  SELECT doc_id,
    {_lang_case()} AS lang_pred,
    ((CASE WHEN len({_TOKS_SQL}) BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.0 END)
   + (CASE WHEN (length(text) - length(regexp_replace(text, '[.,;:!?()\\[\\]{{}}"'']', '', 'g'))) / greatest(length(text), 1) < 0.2 THEN 1.0 ELSE 0.0 END)
   + (CASE WHEN len(list_filter({_TOKS_SQL}, t -> t IN ({",".join(repr(w) for w in STOPWORDS["en"])}))) / greatest(len({_TOKS_SQL}), 1) > 0.05 THEN 1.0 ELSE 0.0 END)) / 3.0 AS quality
  FROM kept)
SELECT doc_id, lang_pred, round(quality, 6) AS quality
FROM scored WHERE quality >= 1.0 - 1e-9
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-class sampling (class balancing): keep ~40% of each
    language via an md5-hash bucket — reproducible across engines and runs,
    unlike rand()-based sampling; row-local, no shuffle before the count."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return (
        docs.filter(bucket < 40)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
        .orderBy("lang")
    )


_STRATIFIED_SQL = """
SELECT lang, COUNT(*) AS n_sampled FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 40
GROUP BY lang ORDER BY lang
"""


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled brute-force cosine pairs (spot-audit pattern); rounded to
    1e-6 for cross-engine float safety."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = DD.embedding_near_dup_pairs(emb, threshold=0.3, block_mod=5)
    return pairs.withColumn("cosine", F.round("cosine", 6))


_EMB_DUP_SQL = """
WITH s AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_sum(list_transform(generate_series(1, len(a.embedding)),
             i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
     * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))) AS cosine
  FROM s a JOIN s b ON a.vec_id < b.vec_id)
SELECT id_a, id_b, round(cosine, 6) AS cosine FROM p WHERE cosine >= 0.3
"""


# --------------------------------------------------------------------------
# similarity search (extension)
# --------------------------------------------------------------------------


def q_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array analytics: per-label L2-norm statistics over the embedding
    column — JVM-side array fold, no Python. Per-row norms round to 1e-6
    before aggregating (in-row float folds may reassociate across engines);
    the cross-row sum is decimal-exact."""
    emb = _t(spark, sf_dir, "embeddings")
    norm = F.round(
        F.sqrt(
            F.aggregate(
                F.col("embedding"),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        ),
        6,
    )
    return (
        emb.select("label", norm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            (_dsum(F.col("nrm")) / F.count("*")).alias("avg_norm"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
        )
        .orderBy("label")
    )


_NORM_STATS_SQL = """
WITH n AS (
  SELECT label,
    round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 6) AS nrm
  FROM embeddings)
SELECT label, COUNT(*) AS n_vectors,
  CAST(SUM(CAST(nrm AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS avg_norm,
  MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
FROM n GROUP BY label ORDER BY label
"""


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 against the vec_id=0 vector, fully in-plan (the
    query row is broadcast; no driver collect). The top-k is
    TakeOrderedAndProject (each partition retains 10 rows); the rank
    column is a window over the already-10-row frame, never over the
    full corpus."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    scored = emb.crossJoin(F.broadcast(q)).select(
        "vec_id", F.round(DD.cosine_similarity(F.col("embedding"), F.col("qvec")), 6).alias("cosine")
    )
    order = [F.col("cosine").desc(), F.col("vec_id")]
    top = RK.top_k(scored, order, 10)
    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


_TOPK_SQL = """
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
    round(list_sum(list_transform(generate_series(1, len(embedding)),
          i -> embedding[i]::DOUBLE * qvec[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
     * sqrt(list_sum(list_transform(qvec, x -> x::DOUBLE * x::DOUBLE)))), 6) AS cosine
  FROM embeddings, q)
SELECT vec_id, cosine, rank FROM (
  SELECT vec_id, cosine, ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS rank FROM scored)
WHERE rank <= 10
"""


def q_similarity_pairwise_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 neighbors for each of the first 3 vectors (excluding self)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    out = SIM.pairwise_topk(emb.filter(F.col("vec_id") >= 3), queries, k=3)
    return out.withColumn("cosine", F.round("cosine", 6))


_PAIRWISE_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 3),
c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 3),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    list_sum(list_transform(generate_series(1, len(c.embedding)),
          i -> c.embedding[i]::DOUBLE * q.qvec[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(c.embedding, x -> x::DOUBLE * x::DOUBLE)))
     * sqrt(list_sum(list_transform(q.qvec, x -> x::DOUBLE * x::DOUBLE)))) AS cosine
  FROM c, q)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
WHERE rank <= 3
"""


# Fixture embedding dimensionality: the hyperplane constants baked into
# the LSH oracle SQL below depend on it (pinned to the parquet schema by
# tests/test_oracle_dtypes.py::test_embedding_dim_matches_fixture).
_EMB_DIM = 64


def _lsh_probe_topk(
    spark: SparkSession, sf_dir: str, n_planes: int, n_probes: int
) -> DataFrame:
    """Shared body for the (multi-probe) LSH top-k queries: bucket filter
    via the seed-fixed signature, then the similarity_topk ranking recipe
    (cosine rounded to 6dp BEFORE ranking so the top-k set is
    deterministic across engines). Probe buckets are NOT provably bounded
    (a degenerate corpus can pile into one bucket), so the top-k is
    TakeOrderedAndProject, never a global window over the candidates."""
    emb = _t(spark, sf_dir, "embeddings")
    query = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    planes = SIM.random_hyperplanes(len(query), n_planes, seed=42)
    probes = SIM.multi_probe_buckets(query, planes, n_probes)
    bucketed = SIM.lsh_bucket_assignments(emb, len(query), n_planes, seed=42)
    qrow = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    scored = (
        bucketed.filter(F.col("bucket").isin(probes))
        .crossJoin(F.broadcast(qrow))
        .select(
            "vec_id",
            F.round(
                DD.cosine_similarity(F.col("embedding"), F.col("qvec")), 6
            ).alias("cosine"),
        )
    )
    order = [F.col("cosine").desc(), F.col("vec_id")]
    top = RK.top_k(scored, order, 10)
    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


def q_similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN: LSH-bucketed top-k. The seed-fixed hyperplanes are
    deterministic, so the DuckDB twin recomputes the identical signatures
    from the same plane constants baked into the SQL (the minhash-family
    recipe) — a full hash gate, not rows-only."""
    return _lsh_probe_topk(spark, sf_dir, n_planes=6, n_probes=1)


def q_similarity_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: the query bucket plus the 3 lowest-|margin|
    bit-flip neighbors; hash-gated against a DuckDB twin that derives the
    probe set from the same plane constants."""
    return _lsh_probe_topk(spark, sf_dir, n_planes=6, n_probes=4)


def _planes_cte(n_planes: int, dim: int = _EMB_DIM) -> str:
    """VALUES CTE of the seed-42 hyperplanes (repr round-trips doubles
    exactly, so both engines see bit-identical plane constants)."""
    planes = SIM.random_hyperplanes(dim, n_planes, seed=42)
    rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(
            i, ", ".join(repr(float(v)) for v in plane)
        )
        for i, plane in enumerate(planes)
    )
    return f"planes(i, p) AS (VALUES {rows})"


_LSH_SIGS_SQL = """
dots AS (
  SELECT e.vec_id, p.i,
    list_sum(list_transform(generate_series(1, len(e.embedding)),
             j -> e.embedding[j]::DOUBLE * p.p[j])) AS d
  FROM embeddings e CROSS JOIN planes p),
sigs AS (
  SELECT vec_id,
    CAST(SUM(CASE WHEN d > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id)"""


def _lsh_topk_sql(n_planes: int, n_probes: int) -> str:
    return f"""
WITH {_planes_cte(n_planes)},
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
margins AS (
  SELECT p.i,
    list_sum(list_transform(generate_series(1, len(q.qvec)),
             j -> q.qvec[j]::DOUBLE * p.p[j])) AS m
  FROM planes p, q),
qsig AS (
  SELECT CAST(SUM(CASE WHEN m > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS sig
  FROM margins),
flips AS (SELECT i FROM margins ORDER BY abs(m), i LIMIT {n_probes - 1}),
probes AS (
  SELECT sig AS b FROM qsig
  UNION ALL SELECT xor(sig, (1::BIGINT << i)) FROM qsig, flips),
{_LSH_SIGS_SQL.lstrip()},
scored AS (
  SELECT e.vec_id,
    round(list_sum(list_transform(generate_series(1, len(e.embedding)),
          j -> e.embedding[j]::DOUBLE * q.qvec[j]::DOUBLE))
    / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
     * sqrt(list_sum(list_transform(q.qvec, x -> x::DOUBLE * x::DOUBLE)))), 6) AS cosine
  FROM embeddings e, q
  WHERE e.vec_id IN (SELECT vec_id FROM sigs JOIN probes ON bucket = b))
SELECT vec_id, cosine, rank FROM (
  SELECT vec_id, cosine, ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 10
"""


_LSH_TOPK_SQL = _lsh_topk_sql(n_planes=6, n_probes=1)
_LSH_MULTIPROBE_SQL = _lsh_topk_sql(n_planes=6, n_probes=4)
_ANN_SCALE_CONTRACT_SQL = _ann_scale_audit_sql(2_000)


# --------------------------------------------------------------------------
# multimodal (extension)
# --------------------------------------------------------------------------


def q_similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: KMeans-centroid buckets, 4-probe search (rows-only: learned
    centroids are engine-side state; full-probe==brute-force equivalence is
    proven in tests/test_extensions.py)."""
    emb = _t(spark, sf_dir, "embeddings")
    query = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    assigned, centroids = SIM.ivf_index(emb, n_clusters=16)
    return SIM.ivf_topk(assigned, centroids, query, k=10, n_probe=4)


def q_similarity_ivf_det_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe with DETERMINISTIC data-sampled centroids (the vectors of
    vec_id 0..15): the same partition-pruned probe shape as the KMeans
    variant (similarity_ivf_topk, rows-only because MLlib centroids are
    engine state), but every step — centroid pick, 4-probe cosine ranking,
    argmin assignment via ||c||^2 - 2<x,c>, in-probe cosine top-10 — is
    replayed by the DuckDB twin with the identical sequential-sum float
    algebra, so the whole IVF dataflow is hash-gated. Assignment runs
    in-plan against literal centroids (the pq_encode recipe); ties break
    to the lowest centroid id in both engines."""
    import math

    emb = _t(spark, sf_dir, "embeddings")
    cents = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 16).collect()
    }
    cent_ids = sorted(cents)
    query = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]

    def seq_dot(a: list, b: list) -> float:
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    qn = math.sqrt(seq_dot(query, query))
    sims = [
        (
            seq_dot(cents[c], query)
            / (math.sqrt(seq_dot(cents[c], cents[c])) * qn),
            c,
        )
        for c in cent_ids
    ]
    probe = [c for _, c in sorted(sims, key=lambda t: (-t[0], t[1]))[:4]]

    d2s = F.array(
        *[
            F.lit(seq_dot(cents[c], cents[c]))
            - 2.0
            * F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    F.array(*[F.lit(v) for v in cents[c]]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for c in cent_ids
        ]
    )
    cluster = F.element_at(
        F.array(*[F.lit(c) for c in cent_ids]),
        F.array_position(d2s, F.array_min(d2s)).cast("int"),
    )
    qrow = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    scored = (
        emb.withColumn("cluster", cluster)
        .filter(F.col("cluster").isin(probe))
        .crossJoin(F.broadcast(qrow))
        .select(
            "vec_id",
            F.round(
                DD.cosine_similarity(F.col("embedding"), F.col("qvec")), 6
            ).alias("cosine"),
        )
    )
    order = [F.col("cosine").desc(), F.col("vec_id")]
    top = RK.top_k(scored, order, 10)
    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


_IVF_DET_SQL = """
WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
probes AS (
  SELECT cid FROM cent, q
  ORDER BY
    list_sum(list_transform(generate_series(1, len(cv)),
             i -> cv[i]::DOUBLE * qv[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(cv, y -> y::DOUBLE * y::DOUBLE)))
     * sqrt(list_sum(list_transform(qv, y -> y::DOUBLE * y::DOUBLE)))) DESC,
    cid
  LIMIT 4),
d2 AS (
  SELECT e.vec_id, c.cid,
    list_sum(list_transform(c.cv, y -> y::DOUBLE * y::DOUBLE))
    - 2.0 * list_sum(list_transform(generate_series(1, len(e.embedding)),
             i -> e.embedding[i]::DOUBLE * c.cv[i]::DOUBLE)) AS d2
  FROM embeddings e CROSS JOIN cent c),
assigned AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d2)
  WHERE rn = 1),
scored AS (
  SELECT e.vec_id,
    round(list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
     * sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE)))), 6) AS cosine
  FROM embeddings e, q
  WHERE e.vec_id IN (SELECT vec_id FROM assigned JOIN probes ON cluster = cid))
SELECT vec_id, cosine, rank FROM (
  SELECT vec_id, cosine, ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 10
"""


def q_similarity_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-measuring ANN quality telemetry: |approx top-10 ∩ exact
    top-10| for each deterministic approximate method (single-probe LSH,
    multi-probe LSH, deterministic-centroid IVF) — 'measure, don't
    guess' as a first-class query. Every path is seed/data-deterministic,
    so the DuckDB twin recomputes the identical report by composing the
    methods' own oracle SQL and intersecting."""
    from functools import reduce

    exact = q_similarity_topk(spark, sf_dir).select("vec_id")
    methods = [
        ("ivf_det", q_similarity_ivf_det_topk),
        ("lsh", q_similarity_lsh_topk),
        ("multiprobe", q_similarity_multiprobe_topk),
    ]
    frames = [
        fn(spark, sf_dir)
        .select("vec_id")
        .join(exact, "vec_id")
        .agg(F.count("*").cast("bigint").alias("n_overlap"))
        .select(F.lit(name).alias("method"), "n_overlap")
        for name, fn in methods
    ]
    return reduce(lambda a, b: a.unionByName(b), frames).orderBy("method")


def _recall_report_sql() -> str:
    return f"""
WITH exact AS (SELECT vec_id FROM ({_TOPK_SQL})),
ivf AS (SELECT vec_id FROM ({_IVF_DET_SQL})),
lshq AS (SELECT vec_id FROM ({_LSH_TOPK_SQL})),
mp AS (SELECT vec_id FROM ({_LSH_MULTIPROBE_SQL}))
SELECT 'ivf_det' AS method, CAST(COUNT(*) AS BIGINT) AS n_overlap
FROM ivf JOIN exact USING (vec_id)
UNION ALL
SELECT 'lsh', CAST(COUNT(*) AS BIGINT) FROM lshq JOIN exact USING (vec_id)
UNION ALL
SELECT 'multiprobe', CAST(COUNT(*) AS BIGINT) FROM mp JOIN exact USING (vec_id)
ORDER BY method
"""


def q_dedup_embedding_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus embedding near-dup via hyperplane-LSH buckets,
    hash-gated: the seed-fixed plane constants are baked into the DuckDB
    twin, which recomputes the same signatures, bucket equi-join, and
    cosine verification (output rounded 6dp, the embedding_near_dup
    convention)."""
    emb = _t(spark, sf_dir, "embeddings")
    dim = len(emb.first()["embedding"])
    pairs = SIM.hyperplane_near_dup_pairs(emb, dim, threshold=0.3, n_planes=4)
    return pairs.withColumn("cosine", F.round("cosine", 6))


_LSH_PAIRS_SQL = f"""
WITH {_planes_cte(4)},
{_LSH_SIGS_SQL.lstrip()},
e2 AS (
  SELECT s.vec_id, s.bucket, e.embedding
  FROM sigs s JOIN embeddings e USING (vec_id)),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_sum(list_transform(generate_series(1, len(a.embedding)),
             i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
     * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))) AS cosine
  FROM e2 a JOIN e2 b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT id_a, id_b, round(cosine, 6) AS cosine FROM p WHERE cosine >= 0.3
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1:N frame sampling over media payloads (rows-only: frame bytes are
    stub-decoded engine-side; shape and checksums tested)."""
    docs = _t(spark, sf_dir, "documents")
    return MM.sample_frames(MM.attach_payload(docs), n_frames=4)


def q_multimodal_frames_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed audit of the 1:N frame sampler: per (doc, frame) the md5
    checksum and byte length of the frame payload — fully deterministic
    byte arithmetic, so the DuckDB twin replays the same slicing
    (step = max(len//4, 1), tail fallback) with substr/md5. The fixture
    text is pure ASCII (dtype test pins it), so char slicing == byte
    slicing; the binary frames themselves stay in the rows-only query."""
    docs = _t(spark, sf_dir, "documents")
    fr = MM.sample_frames(MM.attach_payload(docs), n_frames=4)
    return fr.select(
        "doc_id", "frame_idx", "frame_checksum",
        F.octet_length("frame_payload").cast("bigint").alias("frame_bytes"),
    )


_MM_FRAMES_AUDIT_SQL = """
WITH d AS (
  SELECT doc_id, text, length(text) AS n,
         greatest(length(text) // 4, 1) AS step
  FROM documents WHERE length(text) > 0),
idx AS (
  SELECT doc_id, text, n, step, unnest(generate_series(0, 3)) AS i FROM d),
fr AS (
  SELECT doc_id, CAST(i AS INT) AS frame_idx,
    CASE WHEN substr(text, i * step + 1, step) <> ''
         THEN substr(text, i * step + 1, step)
         ELSE substr(text, n - step + 1, step) END AS frame
  FROM idx)
SELECT doc_id, frame_idx, md5(frame) AS frame_checksum,
  CAST(length(frame) AS BIGINT) AS frame_bytes
FROM fr
"""


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    mm = MM.attach_payload(docs)
    return mm.select(
        "doc_id",
        F.col("media.byte_len").alias("byte_len"),
        F.col("media.checksum").alias("checksum"),
    )


_MM_META_SQL = "SELECT doc_id, strlen(text)::BIGINT AS byte_len, md5(text) AS checksum FROM documents"


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF decode path over the documents payloads. The fallback
    decoder is deterministic byte statistics, so even the stub path is
    oracle-hashable: the DuckDB twin recomputes byte_len/first/last/
    window-sum from the ASCII text (char == byte, pinned by the dtype
    test) and the exact integer-sum/4 mean. The REAL codec path is
    hash-gated separately by multimodal_image_features."""
    docs = _t(spark, sf_dir, "documents")
    return MM.extract_features(MM.attach_payload(docs))


_MM_FEATURES_SQL = """
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS byte_len,
  (length(text)
   + list_sum(list_transform(generate_series(1, least(length(text), 256)),
              i -> ascii(substr(text, i, 1)))) % 997
   + ascii(substr(text, 1, 1))
   + ascii(substr(text, length(text), 1))) / 4.0 AS feat_mean,
  4 AS feat_dim
FROM documents
"""


def q_multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, oracle-gated end-to-end: each document gets a
    deterministic 4x4 24-bit BMP whose pixels tile its md5 digest, the
    payload round-trips through the pure-Python encoder AND decoder inside
    mapInPandas, and the decoded mean pixel intensity is emitted. The
    DuckDB twin recomputes the same mean directly from the md5 hex pairs,
    so a codec bug anywhere in the header/row-padding/BGR/bottom-up logic
    breaks the hash. Payload bytes never shuffle (generate + decode in one
    per-partition pass)."""
    import hashlib
    from collections.abc import Iterator as _It

    import pandas as pd  # noqa: PLC0415

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    schema = "doc_id long, feat_mean double, width int, height int"

    def _gen_and_decode(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                digest = hashlib.md5(str(text).encode("utf-8")).digest()
                rgb = (digest * 3)[:48]  # 4*4*3 bytes
                payload = MM.encode_bmp(4, 4, rgb)
                feats = MM._decode_payload(payload)  # real BMP path
                out.append(
                    {
                        "doc_id": doc_id,
                        "feat_mean": round(feats[0], 6),
                        "width": int(feats[1]),
                        "height": int(feats[2]),
                    }
                )
            yield pd.DataFrame(out, columns=["doc_id", "feat_mean", "width", "height"])

    return docs.mapInPandas(_gen_and_decode, schema=schema)


_MM_IMAGE_SQL = """
SELECT doc_id,
  round(list_sum(list_transform(generate_series(0, 15),
        i -> ('0x' || substr(md5(text), 2 * i + 1, 2))::BIGINT)) / 16.0, 6)
    AS feat_mean,
  4 AS width, 4 AS height
FROM documents
"""


def q_multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, oracle-gated end-to-end: each document gets a
    deterministic 16-sample 16-bit mono PCM clip (samples derived from its
    md5 digest), the payload round-trips through the pure-Python RIFF/WAVE
    encoder AND decoder inside mapInPandas, and the decoded mean signal
    power + zero-crossing count are emitted. The DuckDB twin recomputes
    both directly from the md5 hex pairs, so a codec bug anywhere in the
    chunk walk / PCM unpack breaks the hash (all values are exact: the
    power sum is < 2^53 and divides by 16). Payload bytes never shuffle."""
    import hashlib
    from collections.abc import Iterator as _It

    import pandas as pd  # noqa: PLC0415

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    schema = (
        "doc_id long, mean_power double, sample_rate long,"
        " n_samples long, zero_crossings long"
    )

    def _gen_and_decode(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        cols = ["doc_id", "mean_power", "sample_rate", "n_samples", "zero_crossings"]
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                digest = hashlib.md5(str(text).encode("utf-8")).digest()
                samples = [b * 256 - 32768 for b in digest]  # 16 int16 values
                payload = MM.encode_wav(8000, samples)
                feats = MM._decode_payload(payload)  # real RIFF/WAVE path
                out.append(
                    {
                        "doc_id": doc_id,
                        "mean_power": feats[0],
                        "sample_rate": int(feats[1]),
                        "n_samples": int(feats[2]),
                        "zero_crossings": int(feats[3]),
                    }
                )
            yield pd.DataFrame(out, columns=cols)

    return docs.mapInPandas(_gen_and_decode, schema=schema)


_MM_AUDIO_SQL = """
WITH b AS (
  SELECT doc_id,
    list_transform(generate_series(0, 15),
      i -> ('0x' || substr(md5(text), 2 * i + 1, 2))::BIGINT * 256 - 32768) AS s
  FROM documents)
SELECT doc_id,
  list_sum(list_transform(s, v -> v * v)) / 16.0 AS mean_power,
  CAST(8000 AS BIGINT) AS sample_rate,
  CAST(16 AS BIGINT) AS n_samples,
  CAST(list_sum(list_transform(generate_series(2, 16),
      i -> CASE WHEN (s[i-1] < 0) <> (s[i] < 0) THEN 1 ELSE 0 END))
    AS BIGINT) AS zero_crossings
FROM b
"""


def q_multimodal_video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode, oracle-gated end-to-end — completing the
    image/audio/VIDEO codec trio: each document gets a deterministic
    4-frame 2x2 RGB clip (48 bytes from three chained md5 digests), the
    payload round-trips through the pure-Python AVI encoder AND decoder
    (RIFF form-type dispatch -> chunk-tree walk -> bottom-up-BGR frame
    unpack) inside mapInPandas, and the decoded geometry + mean RGB
    level are emitted. The DuckDB twin recomputes them from the same
    md5 hex pairs, so a bug anywhere in the container walk or the DIB
    row flip breaks the hash. Payload bytes never shuffle."""
    import hashlib
    from collections.abc import Iterator as _It

    import pandas as pd  # noqa: PLC0415

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    schema = "doc_id long, n_frames long, width long, height long, mean_rgb double"

    def _gen_and_decode(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        cols = ["doc_id", "n_frames", "width", "height", "mean_rgb"]
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = str(text)
                raw = (
                    hashlib.md5(t.encode()).digest()
                    + hashlib.md5((t + "|1").encode()).digest()
                    + hashlib.md5((t + "|2").encode()).digest()
                )
                frames = [raw[12 * k : 12 * k + 12] for k in range(4)]
                payload = MM.encode_avi(2, 2, frames)
                feats = MM._decode_payload(payload)  # RIFF -> AVI path
                out.append(
                    {
                        "doc_id": doc_id,
                        "n_frames": int(feats[0]),
                        "width": int(feats[1]),
                        "height": int(feats[2]),
                        "mean_rgb": feats[3],
                    }
                )
            yield pd.DataFrame(out, columns=cols)

    return docs.mapInPandas(_gen_and_decode, schema=schema)


_MM_VIDEO_SQL = """
WITH b AS (
  SELECT doc_id,
    md5(text) || md5(text || '|1') || md5(text || '|2') AS hexs
  FROM documents)
SELECT doc_id, CAST(4 AS BIGINT) AS n_frames, CAST(2 AS BIGINT) AS width,
  CAST(2 AS BIGINT) AS height,
  list_sum(list_transform(generate_series(0, 47),
    i -> ('0x' || substr(hexs, 2 * i + 1, 2))::BIGINT)) / 48.0 AS mean_rgb
FROM b
"""


def q_multimodal_video_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full video TRANSFORM pipeline, oracle-gated: decode the 4-frame
    AVI clip, nearest-neighbor-resize every frame 2x2 -> 1x1, and emit
    each thumbnail's RGB. Floor point-sampling picks source pixel (0,0),
    i.e. the first 3 RGB bytes of each decoded frame — which the DuckDB
    twin reads straight from the md5 hex pairs, so the whole
    decode -> row-unflip -> resize chain must be byte-perfect for the
    hash to match. 1:N frame fan-out happens inside mapInPandas; only
    (doc, frame, 3 ints) rows ever shuffle."""
    import hashlib
    from collections.abc import Iterator as _It

    import pandas as pd  # noqa: PLC0415

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    schema = "doc_id long, frame_idx long, r long, g long, b long"

    def _pipeline(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        cols = ["doc_id", "frame_idx", "r", "g", "b"]
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = str(text)
                raw = (
                    hashlib.md5(t.encode()).digest()
                    + hashlib.md5((t + "|1").encode()).digest()
                    + hashlib.md5((t + "|2").encode()).digest()
                )
                payload = MM.encode_avi(
                    2, 2, [raw[12 * k : 12 * k + 12] for k in range(4)]
                )
                w, h, frames = MM.decode_avi(payload)
                for k, fr in enumerate(frames):
                    thumb = MM.resize_rgb(fr, w, h, 1, 1)
                    out.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": k,
                            "r": thumb[0],
                            "g": thumb[1],
                            "b": thumb[2],
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    return docs.mapInPandas(_pipeline, schema=schema)


_MM_VIDEO_THUMBS_SQL = """
WITH b AS (
  SELECT doc_id,
    md5(text) || md5(text || '|1') || md5(text || '|2') AS hexs
  FROM documents),
f AS (
  SELECT doc_id, k AS frame_idx,
    ('0x' || substr(hexs, 24 * k + 1, 2))::BIGINT AS r,
    ('0x' || substr(hexs, 24 * k + 3, 2))::BIGINT AS g,
    ('0x' || substr(hexs, 24 * k + 5, 2))::BIGINT AS b
  FROM b, UNNEST(generate_series(0, 3)) AS u(k))
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, r, g, b FROM f
"""


def q_ch_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse array-function parity pack over each doc's token-length
    sequence: arraySum (total chars), arrayDistinct (distinct lengths),
    arrayCompact length (count of runs of equal consecutive values),
    arrayDifference (sum of absolute step changes), arrayMax/arrayMin.
    Every op is a row-local higher-order array expression inside
    whole-stage codegen — zero shuffles before the output sort, the
    embarrassing-parallel shape array analytics should have. All values
    integer-exact."""
    docs = _t(spark, sf_dir, "documents")
    lens = F.transform(TX.tokens(F.col("text")), lambda t: F.length(t))
    d = docs.select("doc_id", lens.alias("l"))
    n = F.size("l")
    # guarded: Spark's sequence(2, 1) would DESCEND for a 1-token doc
    idx2 = F.when(n >= 2, F.sequence(F.lit(2), n)).otherwise(
        F.array().cast("array<int>")
    )
    step_ne = F.transform(
        idx2,
        lambda i: F.when(
            F.element_at(F.col("l"), i) != F.element_at(F.col("l"), i - 1), 1
        ).otherwise(0),
    )
    abs_diff = F.transform(
        idx2,
        lambda i: F.abs(
            F.element_at(F.col("l"), i) - F.element_at(F.col("l"), i - 1)
        ),
    )
    isum = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        isum(F.col("l")).alias("total_chars"),
        F.size(F.array_distinct("l")).cast("bigint").alias("n_distinct_lens"),
        (isum(step_ne) + 1).alias("n_runs"),
        isum(abs_diff).alias("sum_abs_diff"),
        F.array_max("l").cast("bigint").alias("max_len"),
        F.array_min("l").cast("bigint").alias("min_len"),
    ).orderBy("doc_id")


_CH_ARRAY_SQL = f"""
WITH d AS (
  SELECT doc_id, list_transform({_TOKS_SQL}, t -> length(t)) AS l
  FROM documents)
SELECT doc_id,
  CAST(len(l) AS BIGINT) AS n_tokens,
  CAST(COALESCE(list_sum(l), 0) AS BIGINT) AS total_chars,
  CAST(len(list_distinct(l)) AS BIGINT) AS n_distinct_lens,
  CAST(COALESCE(list_sum(list_transform(generate_series(2, len(l)),
    i -> CASE WHEN l[i] <> l[i-1] THEN 1 ELSE 0 END)), 0) + 1 AS BIGINT)
    AS n_runs,
  CAST(COALESCE(list_sum(list_transform(generate_series(2, len(l)),
    i -> abs(l[i] - l[i-1]))), 0) AS BIGINT) AS sum_abs_diff,
  CAST(list_max(l) AS BIGINT) AS max_len,
  CAST(list_min(l) AS BIGINT) AS min_len
FROM d ORDER BY doc_id
"""


def q_sample_by_user_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse SAMPLE-BY semantics: hash-RANGE sampling on the user
    key keeps every user all-or-nothing (bucket = md5(user) mod 8, keep
    bucket 1) — unlike row-Bernoulli, a sampled user's sessions, funnels,
    and retention stay COMPLETE, so behavioral metrics computed on the
    sample are unbiased per-user. Report: per event type, sampled
    events/users vs totals with exact ppm rates (expected ~125000).
    Row-local bucketing, one aggregation — the sample is reproducible on
    any engine, any partition order."""
    ev = _t(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 8
    )
    b = ev.select("event_type", "user_id", bucket.alias("bucket"))
    return (
        b.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum((F.col("bucket") == 1).cast("int"))
            .cast("bigint")
            .alias("sampled_events"),
            F.countDistinct(
                F.when(F.col("bucket") == 1, F.col("user_id"))
            )
            .cast("bigint")
            .alias("sampled_users"),
        )
        .withColumn(
            "event_rate_ppm",
            F.expr("sampled_events * 1000000 div n_events").cast("bigint"),
        )
        .orderBy("event_type")
    )


_SAMPLE_BY_SQL = """
WITH b AS (
  SELECT event_type, user_id,
    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS bucket
  FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(SUM(CASE WHEN bucket = 1 THEN 1 ELSE 0 END) AS BIGINT) AS sampled_events,
  CAST(COUNT(DISTINCT CASE WHEN bucket = 1 THEN user_id END) AS BIGINT)
    AS sampled_users,
  CAST(SUM(CASE WHEN bucket = 1 THEN 1 ELSE 0 END) * 1000000
       // COUNT(*) AS BIGINT) AS event_rate_ppm
FROM b GROUP BY event_type ORDER BY event_type
"""


def q_locf_impute_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation on the daily series: revenue on days where
    day-of-month % 7 = 3 is masked to NULL (a deterministic outage
    pattern), then repaired by LOCF (last observation carried forward)
    with a backward-fill for any leading gap — the standard sensor/KPI
    repair pair. Both directions are IGNORE-NULLS window edges over the
    date order; on the tiny daily frame this is one sort, and at scale
    the same windows partition by series key. Output flags which days
    were imputed so downstream consumers can weight them."""
    daily = _orders_daily(spark, sf_dir).select(
        "date", F.round("total_revenue", 2).alias("rev")
    )
    masked = daily.withColumn(
        "rev_masked",
        F.when(F.dayofmonth("date") % 7 == 3, F.lit(None)).otherwise(F.col("rev")),
    )
    w_fwd = Window.orderBy("date").rowsBetween(Window.unboundedPreceding, 0)
    w_bwd = Window.orderBy("date").rowsBetween(0, Window.unboundedFollowing)
    return (
        masked.withColumn("locf", F.last("rev_masked", ignorenulls=True).over(w_fwd))
        .withColumn("bfill", F.first("rev_masked", ignorenulls=True).over(w_bwd))
        .select(
            "date",
            F.coalesce("locf", "bfill").alias("rev_imputed"),
            F.col("rev_masked").isNull().alias("was_imputed"),
        )
        .orderBy("date")
    )


_LOCF_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS date,
    ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE), 2) AS rev
  FROM orders GROUP BY 1),
masked AS (
  SELECT date,
    CASE WHEN dayofmonth(date) % 7 = 3 THEN NULL ELSE rev END AS rev_masked
  FROM daily)
SELECT date,
  COALESCE(
    LAST_VALUE(rev_masked IGNORE NULLS) OVER (
      ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    FIRST_VALUE(rev_masked IGNORE NULLS) OVER (
      ORDER BY date ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    AS rev_imputed,
  rev_masked IS NULL AS was_imputed
FROM masked ORDER BY date
"""


def q_pii_redaction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — the compliance gate every training
    corpus passes before the tokenizer. The fixture text is synthetic
    word-soup, so the query first injects DETERMINISTIC PII (emails on
    doc_id%7=3, phone numbers on %11=5, SSN-shaped ids on %13=8 — in a
    real corpus this stage is the raw data), then runs the real
    machinery: three disjoint regex detectors, ordered regexp_replace
    redaction, and a per-source report of docs flagged, hits per PII
    class, chars redacted, and a residual_pii self-check that MUST be 0
    (redaction missed nothing). All row-local regex work in codegen —
    embarrassingly parallel at 100 TB; the shuffle carries one 8-int
    row per doc."""
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(did % 7 == 3,
               F.format_string(" contact user%d@mail-example.org", did)
               ).otherwise(F.lit("")),
        F.when(did % 11 == 5,
               F.format_string(" call 555-%03d-%04d", did % 1000, did % 10000)
               ).otherwise(F.lit("")),
        F.when(did % 13 == 8,
               F.format_string(" id 078-05-%04d", did % 10000)
               ).otherwise(F.lit("")),
    )
    # character classes only (no backslash escapes) so the identical
    # pattern strings drive Java regex (Spark) and RE2 (DuckDB)
    p_email = "[a-z0-9._]+@[a-z0-9.-]+[.][a-z]+"
    p_phone = "555-[0-9]{3}-[0-9]{4}"
    p_ssn = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
    base = docs.select("source", aug.alias("aug"))
    n = lambda c, pat: F.size(  # noqa: E731
        F.regexp_extract_all(c, F.lit(pat), F.lit(0))
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug"), F.lit(p_email), F.lit("[EMAIL]")),
            F.lit(p_phone), F.lit("[PHONE]")),
        F.lit(p_ssn), F.lit("[SSN]"))
    per = base.select(
        "source",
        n(F.col("aug"), p_email).alias("e"),
        n(F.col("aug"), p_phone).alias("p"),
        n(F.col("aug"), p_ssn).alias("s"),
        (F.length("aug") - F.length(red)).alias("chars_cut"),
        (n(red, p_email) + n(red, p_phone) + n(red, p_ssn)).alias("residual"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(((F.col("e") + F.col("p") + F.col("s")) > 0).cast("int"))
            .cast("bigint").alias("n_pii_docs"),
            F.sum("e").cast("bigint").alias("n_emails"),
            F.sum("p").cast("bigint").alias("n_phones"),
            F.sum("s").cast("bigint").alias("n_ssns"),
            F.sum("chars_cut").cast("bigint").alias("chars_redacted"),
            F.sum("residual").cast("bigint").alias("residual_pii"),
        )
        .orderBy("source")
    )


_PII_SQL = """
WITH aug AS (
  SELECT source,
    text ||
    CASE WHEN doc_id % 7 = 3
      THEN printf(' contact user%d@mail-example.org', doc_id) ELSE '' END ||
    CASE WHEN doc_id % 11 = 5
      THEN printf(' call 555-%03d-%04d', doc_id % 1000, doc_id % 10000)
      ELSE '' END ||
    CASE WHEN doc_id % 13 = 8
      THEN printf(' id 078-05-%04d', doc_id % 10000) ELSE '' END AS aug
  FROM documents),
red AS (
  SELECT source, aug,
    regexp_replace(regexp_replace(regexp_replace(aug,
      '[a-z0-9._]+@[a-z0-9.-]+[.][a-z]+', '[EMAIL]', 'g'),
      '555-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
      '[0-9]{3}-[0-9]{2}-[0-9]{4}', '[SSN]', 'g') AS redtext
  FROM aug),
per AS (
  SELECT source,
    len(regexp_extract_all(aug, '[a-z0-9._]+@[a-z0-9.-]+[.][a-z]+')) AS e,
    len(regexp_extract_all(aug, '555-[0-9]{3}-[0-9]{4}')) AS p,
    len(regexp_extract_all(aug, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS s,
    length(aug) - length(redtext) AS chars_cut,
    len(regexp_extract_all(redtext, '[a-z0-9._]+@[a-z0-9.-]+[.][a-z]+'))
      + len(regexp_extract_all(redtext, '555-[0-9]{3}-[0-9]{4}'))
      + len(regexp_extract_all(redtext, '[0-9]{3}-[0-9]{2}-[0-9]{4}'))
      AS residual
  FROM red)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN e + p + s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_docs,
  CAST(SUM(e) AS BIGINT) AS n_emails,
  CAST(SUM(p) AS BIGINT) AS n_phones,
  CAST(SUM(s) AS BIGINT) AS n_ssns,
  CAST(SUM(chars_cut) AS BIGINT) AS chars_redacted,
  CAST(SUM(residual) AS BIGINT) AS residual_pii
FROM per GROUP BY source ORDER BY source
"""


def q_agg_if_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``-If`` combinator parity (countIf / sumIf / avgIf /
    uniqExactIf / minIf / maxIf): the whole conditional-aggregate family
    folded into ONE pass over orders, grouped by order year. Money sums
    are exact cents; avgIf divides the exact sum by the If-count in
    double at the very end. Every measure is map-side combinable — one
    shuffle on ~7 year keys regardless of scale."""
    o = _t(spark, sf_dir, "orders")
    yr = F.year(F.col("o_orderdate").cast("date")).alias("yr")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    is_f = F.col("o_orderstatus") == "F"
    urgent = F.col("o_orderpriority").startswith("1-")
    is_open = F.col("o_orderstatus") == "O"
    return (
        o.groupBy(yr)
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(is_f.cast("int")).cast("bigint").alias("count_if_final"),
            F.sum(F.when(urgent, cents).otherwise(F.lit(0)))
            .cast("bigint").alias("sum_if_urgent_cents"),
            F.round(
                F.sum(F.when(is_open, cents)).cast("double")
                / (F.sum(is_open.cast("int")) * 100),
                6,
            ).alias("avg_if_open_price"),
            F.countDistinct(F.when(is_open, F.col("o_custkey")))
            .cast("bigint").alias("uniq_if_open_buyers"),
            F.min(F.when(urgent, F.col("o_orderdate").cast("date")))
            .alias("min_if_urgent_date"),
            F.max(F.when(urgent, F.col("o_orderdate").cast("date")))
            .alias("max_if_urgent_date"),
        )
        .orderBy("yr")
    )


_AGG_IF_SQL = """
SELECT year(CAST(o_orderdate AS DATE)) AS yr,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS count_if_final,
  CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
    FILTER (o_orderpriority LIKE '1-%'), 0) AS BIGINT) AS sum_if_urgent_cents,
  ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
          FILTER (o_orderstatus = 'O') AS DOUBLE)
        / (COUNT(*) FILTER (o_orderstatus = 'O') * 100), 6)
    AS avg_if_open_price,
  CAST(COUNT(DISTINCT o_custkey) FILTER (o_orderstatus = 'O') AS BIGINT)
    AS uniq_if_open_buyers,
  MIN(CAST(o_orderdate AS DATE)) FILTER (o_orderpriority LIKE '1-%')
    AS min_if_urgent_date,
  MAX(CAST(o_orderdate AS DATE)) FILTER (o_orderpriority LIKE '1-%')
    AS max_if_urgent_date
FROM orders GROUP BY yr ORDER BY yr
"""


def q_summap_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sumMap`` parity: per event type, a key-aligned map
    aggregation over the JSON props key (bucketed k%10) summing exact
    value-cents per bucket — emitted as the sorted ``keys_csv`` /
    ``sums_csv`` array pair (sumMap's return shape) so both engines
    hash the same canonical strings. Two shuffles: the (type, bucket)
    partial sum (map-side combinable, ≤ 10·|types| rows out), then the
    per-type array fold — the AggregatingMergeTree rollup shape."""
    ev = _t(spark, sf_dir, "events")
    bucket = (F.get_json_object("props", "$.k").cast("long") % 10).alias("bucket")
    cents = F.round(F.col("value") * 100).cast("bigint")
    partial = (
        ev.groupBy("event_type", bucket)
        .agg(F.sum(cents).alias("s"), F.count("*").cast("bigint").alias("n"))
    )
    folded = (
        partial.groupBy("event_type")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("bucket", "s", "n"))
            ).alias("kv")
        )
        .select(
            "event_type",
            F.concat_ws(",", F.transform("kv", lambda x: x["bucket"])).alias("keys_csv"),
            F.concat_ws(",", F.transform("kv", lambda x: x["s"])).alias("sums_csv"),
            F.concat_ws(",", F.transform("kv", lambda x: x["n"])).alias("counts_csv"),
        )
    )
    return folded.orderBy("event_type")


_SUMMAP_SQL = """
WITH partial AS (
  SELECT event_type,
    CAST(props->>'$.k' AS BIGINT) % 10 AS bucket,
    SUM(CAST(ROUND(value * 100) AS BIGINT)) AS s,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2)
SELECT event_type,
  array_to_string(list(bucket ORDER BY bucket), ',') AS keys_csv,
  array_to_string(list(s ORDER BY bucket), ',') AS sums_csv,
  array_to_string(list(n ORDER BY bucket), ',') AS counts_csv
FROM partial GROUP BY event_type ORDER BY event_type
"""


def q_welch_ttest_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-test (ClickHouse ``welchTTest`` parity) on
    order value between every market-segment pair: per (seg_a, seg_b),
    the t statistic and Welch–Satterthwaite degrees of freedom. Moments
    come from one exact-decimal pass per segment (n, Σcents, Σcents² in
    decimal — bit-identical doubles on both engines); the pair stage is
    a self-join over the 5-row moment table, so the expensive part is
    one fact-table aggregation regardless of scale."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    d19 = lambda col: col.cast("decimal(19,0)")  # noqa: E731
    m = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(F.col("c_mktsegment").alias("seg"), cents.alias("x"))
        .groupBy("seg")
        .agg(
            F.count("*").alias("n"),
            F.sum(d19(F.col("x"))).cast("double").alias("sx"),
            F.sum(d19(F.col("x")) * d19(F.col("x"))).cast("double").alias("sxx"),
        )
        .select(
            "seg", "n",
            (F.col("sx") / F.col("n") / 100).alias("mean"),
            ((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
             / (F.col("n") - 1) / 10000).alias("var"),
        )
        # the 5-row moment table feeds BOTH sides of the pair join;
        # the cut stops the fact aggregation from being derived twice
        .localCheckpoint(eager=True)
    )
    a, b = m.alias("a"), m.alias("b")
    va_n = F.col("a.var") / F.col("a.n")
    vb_n = F.col("b.var") / F.col("b.n")
    t = (F.col("a.mean") - F.col("b.mean")) / F.sqrt(va_n + vb_n)
    df = (va_n + vb_n) * (va_n + vb_n) / (
        va_n * va_n / (F.col("a.n") - 1) + vb_n * vb_n / (F.col("b.n") - 1)
    )
    return (
        a.join(F.broadcast(b), F.col("a.seg") < F.col("b.seg"))
        .select(
            F.col("a.seg").alias("seg_a"),
            F.col("b.seg").alias("seg_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            F.round(t, 6).alias("t_stat"),
            F.round(df, 3).alias("welch_df"),
        )
        .orderBy("seg_a", "seg_b")
    )


_WELCH_SQL = """
WITH m AS (
  SELECT c_mktsegment AS seg, COUNT(*) AS n,
    CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
          AS DECIMAL(19,0))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DECIMAL(19,0))
           * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DECIMAL(19,0)))
         AS DOUBLE) AS sxx
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1),
mm AS (
  SELECT seg, n, sx / n / 100 AS mean,
    (sxx - sx * sx / n) / (n - 1) / 10000 AS var
  FROM m)
SELECT a.seg AS seg_a, b.seg AS seg_b, a.n AS n_a, b.n AS n_b,
  ROUND((a.mean - b.mean) / SQRT(a.var / a.n + b.var / b.n), 6) AS t_stat,
  ROUND(POW(a.var / a.n + b.var / b.n, 2)
        / (POW(a.var / a.n, 2) / (a.n - 1)
           + POW(b.var / b.n, 2) / (b.n - 1)), 3) AS welch_df
FROM mm a JOIN mm b ON a.seg < b.seg
ORDER BY seg_a, seg_b
"""


def q_m4_downsample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014 — the visualization-
    grade reducer ClickHouse ships as ``largestTriangleThreeBuckets``'s
    parallel cousin): the daily revenue series reduced to 25 buckets,
    each emitting first/last/min/max with their dates — the four pixels
    a line chart actually needs. Unlike LTTB there is NO sequential
    dependency, so every bucket folds map-side: one tiny window for the
    row index, one aggregation. Exact cents throughout."""
    o = _t(spark, sf_dir, "orders")
    daily = _daily_cents(o)
    idx = (
        daily.select(
            "d", "cents",
            (F.row_number().over(Window.orderBy("d")) - 1).alias("i"),
        )
        .withColumn("n", F.count("*").over(Window.partitionBy()))
        .withColumn("bucket", F.expr("int(i * 25 div n)"))
    )
    return (
        idx.groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.min_by("d", "i").alias("d_first"),
            F.min_by("cents", "i").alias("v_first"),
            F.max_by("d", "i").alias("d_last"),
            F.max_by("cents", "i").alias("v_last"),
            F.min("cents").alias("v_min"),
            F.max("cents").alias("v_max"),
        )
        .orderBy("bucket")
    )


_M4_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1),
idx AS (
  SELECT d, cents,
    ROW_NUMBER() OVER (ORDER BY d) - 1 AS i,
    COUNT(*) OVER () AS n
  FROM daily)
SELECT CAST(i * 25 // n AS INT) AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n_days,
  arg_min(d, i) AS d_first, arg_min(cents, i) AS v_first,
  arg_max(d, i) AS d_last, arg_max(cents, i) AS v_last,
  MIN(cents) AS v_min, MAX(cents) AS v_max
FROM idx GROUP BY 1 ORDER BY bucket
"""


def q_target_encode_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe target encoding — the feature-engineering staple:
    each customer's nation encoded as the LEAVE-ONE-OUT mean account
    balance of the nation's *other* customers, (Σ − x)/(n − 1) in exact
    cents so the exclusion is bit-reproducible. One customer-grain
    aggregation broadcast back over the fact — no per-row subqueries,
    no fold loop; the encoding table is |nations| rows. Reports the 50
    customers whose own balance diverges most from their nation prior
    (the outlier-screening read of the encoding)."""
    c = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    per = c.select("c_custkey", "c_nationkey", cents.alias("x"))
    nat = per.groupBy("c_nationkey").agg(
        F.sum("x").alias("sx"), F.count("*").alias("n")
    )
    return (
        per.join(F.broadcast(nat), "c_nationkey")
        .select(
            "c_custkey",
            "c_nationkey",
            F.round(F.col("x") / 100.0, 2).alias("acctbal"),
            F.round(
                (F.col("sx") - F.col("x")) / (F.col("n") - 1) / 100.0, 6
            ).alias("loo_encoding"),
        )
        .withColumn(
            "abs_gap_cents",
            F.abs(
                F.round(F.col("acctbal") * 100).cast("bigint")
                - F.round(F.col("loo_encoding") * 100).cast("bigint")
            ),
        )
        .orderBy(F.desc("abs_gap_cents"), "c_custkey")
        .limit(50)
    )


_TARGET_ENC_SQL = """
WITH per AS (
  SELECT c_custkey, c_nationkey,
    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS x
  FROM customer),
nat AS (
  SELECT c_nationkey, SUM(x) AS sx, COUNT(*) AS n
  FROM per GROUP BY 1)
SELECT c_custkey, per.c_nationkey,
  ROUND(x / 100.0, 2) AS acctbal,
  ROUND((sx - x) / (n - 1) / 100.0, 6) AS loo_encoding,
  ABS(CAST(ROUND(ROUND(x / 100.0, 2) * 100) AS BIGINT)
      - CAST(ROUND(ROUND((sx - x) / (n - 1) / 100.0, 6) * 100) AS BIGINT))
    AS abs_gap_cents
FROM per JOIN nat ON per.c_nationkey = nat.c_nationkey
ORDER BY abs_gap_cents DESC, c_custkey LIMIT 50
"""


def q_vocab_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: build the top-30 corpus vocabulary
    (count desc, token asc — fully deterministic), then report per
    source shard the total tokens, out-of-vocabulary tokens, and OOV
    ppm — the go/no-go stat before committing a tokenizer to a corpus.
    The vocab is a tiny aggregate broadcast into an array-contains
    filter, so the second pass stays row-local; both passes are
    codegen'd array expressions."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(TX.tokens(F.col("text"))).alias("tok"))
    vocab = (
        toks.groupBy("tok")
        .count()
        .orderBy(F.desc("count"), "tok")
        .limit(30)
        .select("tok")
    )
    per = (
        toks.join(F.broadcast(vocab).withColumn("in_v", F.lit(1)), "tok", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("tokens_total"),
            F.sum((F.col("in_v").isNull()).cast("int")).cast("bigint").alias("tokens_oov"),
        )
        .withColumn(
            "oov_ppm",
            F.expr("tokens_oov * 1000000 div tokens_total").cast("bigint"),
        )
    )
    return per.orderBy("source")


_VOCAB_COV_SQL = f"""
WITH toks AS (
  SELECT source, unnest({_TOKS_SQL}) AS tok FROM documents),
vocab AS (
  SELECT tok FROM toks GROUP BY tok
  ORDER BY COUNT(*) DESC, tok LIMIT 30)
SELECT source, CAST(COUNT(*) AS BIGINT) AS tokens_total,
  CAST(SUM(CASE WHEN tok NOT IN (SELECT tok FROM vocab) THEN 1 ELSE 0 END)
       AS BIGINT) AS tokens_oov,
  CAST(SUM(CASE WHEN tok NOT IN (SELECT tok FROM vocab) THEN 1 ELSE 0 END)
       * 1000000 // COUNT(*) AS BIGINT) AS oov_ppm
FROM toks GROUP BY source ORDER BY source
"""


def q_cramers_v_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-association measures (ClickHouse ``cramersV`` /
    ``theilsU`` parity) between market segment and order priority:
    chi², Cramér's V, and BOTH asymmetric Theil's U coefficients from
    one contingency pass. The fact table is touched once (25-cell
    groupBy); every derived statistic is window arithmetic over that
    tiny frame. Entropies use natural log on integer counts — both
    engines agree at the 6-digit rounding all entropy queries here
    share."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cells = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(F.count("*").alias("nij"))
    )
    w_all = Window.partitionBy()
    t = (
        cells.withColumn("n", F.sum("nij").over(w_all))
        .withColumn("ri", F.sum("nij").over(Window.partitionBy("seg")))
        .withColumn("cj", F.sum("nij").over(Window.partitionBy("prio")))
    )
    nij, n, ri, cj = (F.col(x).cast("double") for x in ("nij", "n", "ri", "cj"))
    chi2_cell = (nij - ri * cj / n) * (nij - ri * cj / n) / (ri * cj / n)
    # H(X,Y), H(X), H(Y) terms; p log p summed over the 25 cells
    h_xy = -(nij / n) * F.log(nij / n)
    h_x_term = -(nij / n) * F.log(ri / n)   # sums to H(seg)
    h_y_term = -(nij / n) * F.log(cj / n)   # sums to H(prio)
    agg = t.agg(
        F.first("n").alias("n_orders"),
        F.countDistinct("seg").alias("r"),
        F.countDistinct("prio").alias("c"),
        F.sum(chi2_cell).alias("chi2"),
        F.sum(h_xy).alias("hxy"),
        F.sum(h_x_term).alias("hx"),
        F.sum(h_y_term).alias("hy"),
    )
    return agg.select(
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n_orders") * (F.least("r", "c") - 1))),
            6,
        ).alias("cramers_v"),
        # U(seg|prio) = (H(seg) - H(seg|prio)) / H(seg); H(seg|prio)=H(X,Y)-H(Y)
        F.round(
            (F.col("hx") - (F.col("hxy") - F.col("hy"))) / F.col("hx"), 6
        ).alias("theils_u_seg"),
        F.round(
            (F.col("hy") - (F.col("hxy") - F.col("hx"))) / F.col("hy"), 6
        ).alias("theils_u_prio"),
    )


_CRAMERS_SQL = """
WITH cells AS (
  SELECT c_mktsegment AS seg, o_orderpriority AS prio,
    COUNT(*) AS nij
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2),
t AS (
  SELECT nij,
    CAST(SUM(nij) OVER () AS DOUBLE) AS n,
    CAST(SUM(nij) OVER (PARTITION BY seg) AS DOUBLE) AS ri,
    CAST(SUM(nij) OVER (PARTITION BY prio) AS DOUBLE) AS cj,
    seg, prio
  FROM cells),
agg AS (
  SELECT ANY_VALUE(n) AS n_orders,
    COUNT(DISTINCT seg) AS r, COUNT(DISTINCT prio) AS c,
    SUM((CAST(nij AS DOUBLE) - ri * cj / n) * (CAST(nij AS DOUBLE) - ri * cj / n)
        / (ri * cj / n)) AS chi2,
    SUM(-(CAST(nij AS DOUBLE) / n) * LN(CAST(nij AS DOUBLE) / n)) AS hxy,
    SUM(-(CAST(nij AS DOUBLE) / n) * LN(ri / n)) AS hx,
    SUM(-(CAST(nij AS DOUBLE) / n) * LN(cj / n)) AS hy
  FROM t)
SELECT CAST(n_orders AS BIGINT) AS n_orders,
  ROUND(chi2, 6) AS chi2,
  ROUND(SQRT(chi2 / (n_orders * (LEAST(r, c) - 1))), 6) AS cramers_v,
  ROUND((hx - (hxy - hy)) / hx, 6) AS theils_u_seg,
  ROUND((hy - (hxy - hx)) / hy, 6) AS theils_u_prio
FROM agg
"""


def q_bitmap_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra (ClickHouse ``groupBitmapAnd/Or/Xor``
    parity): for every event-type pair, the exact user-set
    intersection, union, symmetric difference, and Jaccard ppm. One
    user-grain dedup pass builds (user, type) once; the pair stage
    works on per-type membership counts from a user-level type bitmap
    (collect_set ≤ 5 types/user), so no user-level self-join ever
    happens — the shuffle is one row per distinct (user, type-set)."""
    ev = _t(spark, sf_dir, "events")
    types = ev.select("event_type").distinct()
    per_user = (
        ev.groupBy("user_id")
        .agg(F.collect_set("event_type").alias("ts"))
    )
    a, b = types.alias("a"), types.alias("b")
    pairs = a.join(F.broadcast(b), F.col("a.event_type") < F.col("b.event_type")).select(
        F.col("a.event_type").alias("type_a"), F.col("b.event_type").alias("type_b")
    )
    # per user×pair membership without exploding users: broadcast the
    # ≤ C(5,2)=10 pairs over the user frame, test set membership row-local
    m = per_user.crossJoin(F.broadcast(pairs)).select(
        "type_a", "type_b",
        F.array_contains("ts", F.col("type_a")).cast("int").alias("in_a"),
        F.array_contains("ts", F.col("type_b")).cast("int").alias("in_b"),
    )
    return (
        m.groupBy("type_a", "type_b")
        .agg(
            F.sum(F.col("in_a")).cast("bigint").alias("n_a"),
            F.sum(F.col("in_b")).cast("bigint").alias("n_b"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_and"),
            F.sum(F.greatest("in_a", "in_b")).cast("bigint").alias("n_or"),
            F.sum(
                (F.col("in_a") + F.col("in_b") == 1).cast("int")
            ).cast("bigint").alias("n_xor"),
        )
        .withColumn("jaccard_ppm", F.expr("n_and * 1000000 div n_or").cast("bigint"))
        .orderBy("type_a", "type_b")
    )


_BITMAP_SQL = """
WITH per_user AS (
  SELECT user_id, list(DISTINCT event_type) AS ts FROM events GROUP BY 1),
types AS (SELECT DISTINCT event_type FROM events),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM types a JOIN types b ON a.event_type < b.event_type),
m AS (
  SELECT type_a, type_b,
    CASE WHEN list_contains(ts, type_a) THEN 1 ELSE 0 END AS in_a,
    CASE WHEN list_contains(ts, type_b) THEN 1 ELSE 0 END AS in_b
  FROM per_user CROSS JOIN pairs)
SELECT type_a, type_b,
  CAST(SUM(in_a) AS BIGINT) AS n_a,
  CAST(SUM(in_b) AS BIGINT) AS n_b,
  CAST(SUM(in_a * in_b) AS BIGINT) AS n_and,
  CAST(SUM(GREATEST(in_a, in_b)) AS BIGINT) AS n_or,
  CAST(SUM(CASE WHEN in_a + in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_xor,
  CAST(SUM(in_a * in_b) * 1000000 // SUM(GREATEST(in_a, in_b)) AS BIGINT)
    AS jaccard_ppm
FROM m GROUP BY 1, 2 ORDER BY type_a, type_b
"""


def q_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum construction for training: documents ranked by the
    quality score (stopword share minus non-alnum noise, the text_quality
    recipe), cut into 5 NTILE phases (highest quality = phase 1, fed
    first), each phase reporting docs, token budget, cumulative tokens,
    and the quality-score range — the schedule a curriculum loader
    consumes. Scoring is row-local; the ntile is the DISTRIBUTED one
    (operators/ranking.global_ntile: range-partitioned sort + broadcast
    partition offsets + SQL-exact tile arithmetic — never a
    single-partition WindowExec), then a 5-key fold."""
    docs = _t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    n_toks = F.size(toks)
    stop_share = (
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"])))
        / F.greatest(n_toks, F.lit(1))
    )
    noise = (
        F.length(F.regexp_replace(F.lower("text"), "[a-z0-9 ]", ""))
        / F.greatest(F.length("text"), F.lit(1))
    )
    scored = docs.select(
        "doc_id",
        n_toks.alias("n_toks"),
        F.round(stop_share - noise, 9).alias("q_score"),
    )
    phased = RK.global_ntile(
        scored, [F.desc("q_score"), "doc_id"], 5, col_name="phase"
    )
    # phase ∈ 1..5 by NTILE construction — global_ntile's pmod identity
    # clamp makes that domain visible to the plan census, so the 5-row
    # aggregate below provably bounds the cumulative window above it
    per = (
        phased.groupBy("phase")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("tokens"),
            F.round(F.min("q_score"), 9).alias("q_min"),
            F.round(F.max("q_score"), 9).alias("q_max"),
        )
    )
    w_cum = Window.orderBy("phase").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.withColumn("tokens_cum", F.sum("tokens").over(w_cum).cast("bigint"))
        .orderBy("phase")
    )


_CURRICULUM_SQL = f"""
WITH scored AS (
  SELECT doc_id, len({_TOKS_SQL}) AS n_toks,
    ROUND(
      len(list_filter({_TOKS_SQL},
        t -> t IN ({",".join(repr(w) for w in STOPWORDS["en"])})))
        / greatest(len({_TOKS_SQL}), 1)
      - length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
        / greatest(length(text), 1), 9) AS q_score
  FROM documents),
phased AS (
  SELECT *, NTILE(5) OVER (ORDER BY q_score DESC, doc_id) AS phase
  FROM scored),
per AS (
  SELECT phase, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_toks) AS BIGINT) AS tokens,
    ROUND(MIN(q_score), 9) AS q_min, ROUND(MAX(q_score), 9) AS q_max
  FROM phased GROUP BY phase)
SELECT phase, n_docs, tokens, q_min, q_max,
  CAST(SUM(tokens) OVER (ORDER BY phase
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tokens_cum
FROM per ORDER BY phase
"""


# Shared polynomial-cos great-circle recipe: cos(z) via an even Taylor
# polynomial in EXACT textual form — double +,*,/ are IEEE-determined, so
# evaluating the SAME expression string in Spark (selectExpr) and DuckDB
# yields bit-identical doubles, sidestepping cross-libm cos() drift.
_COS_POLY = (
    "(1.0 - {z2}/2.0 + {z2}*{z2}/24.0 - {z2}*{z2}*{z2}/720.0"
    " + {z2}*{z2}*{z2}*{z2}/40320.0"
    " - {z2}*{z2}*{z2}*{z2}*{z2}/3628800.0)"
)
_GEO_RAD = "(({d}) * 3.141592653589793 / 180.0)"


def _geo_dist_expr(lat_a: str, lon_a: str, lat_b: str, lon_b: str) -> str:
    """Equirectangular distance in km over the shared polynomial cos —
    one expression string consumed verbatim by both engines."""
    mlat = f"(({_GEO_RAD.format(d=lat_a)} + {_GEO_RAD.format(d=lat_b)}) / 2.0)"
    z2 = f"({mlat} * {mlat})"
    cosm = _COS_POLY.format(z2=z2)
    x = f"(({_GEO_RAD.format(d=lon_b)} - {_GEO_RAD.format(d=lon_a)}) * {cosm})"
    y = f"({_GEO_RAD.format(d=lat_b)} - {_GEO_RAD.format(d=lat_a)})"
    return f"ROUND(6371.0 * SQRT({x}*{x} + {y}*{y}), 3)"


def q_geo_nation_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo-distance surface (ClickHouse ``greatCircleDistance`` family):
    each nation gets a deterministic synthetic coordinate (an affine map
    of its key — the fixture has no geo columns, so the coordinates ARE
    the contract), and the query reports the 20 closest nation pairs by
    equirectangular distance. The trig is a shared polynomial-cos
    expression string evaluated textually by BOTH engines (bit-identical
    doubles — the multivar_ols trick applied to geo). 25 nations → 300
    broadcast pairs; at scale this is the geo-join shape where one side
    is a broadcast dimension."""
    n = _t(spark, sf_dir, "nation")
    # CAST to DOUBLE: both Spark and DuckDB parse these dotted literals
    # as DECIMAL, and decimal-scale truncation in the radian conversion
    # diverges between engines — the whole pipeline must run in ieee754
    geo = n.selectExpr(
        "n_nationkey", "n_name",
        "CAST(-60.0 + n_nationkey * 5.0 AS DOUBLE) AS lat",
        "CAST(-170.0 + n_nationkey * 13.0 AS DOUBLE) AS lon",
    )
    a, b = geo.alias("a"), geo.alias("b")
    dist = _geo_dist_expr("a.lat", "a.lon", "b.lat", "b.lon")
    return (
        a.join(F.broadcast(b), F.col("a.n_nationkey") < F.col("b.n_nationkey"))
        .selectExpr(
            "a.n_name AS nation_a",
            "b.n_name AS nation_b",
            f"{dist} AS dist_km",
        )
        .orderBy("dist_km", "nation_a", "nation_b")
        .limit(20)
    )


_GEO_SQL = f"""
WITH geo AS (
  SELECT n_nationkey, n_name,
    CAST(-60.0 + n_nationkey * 5.0 AS DOUBLE) AS lat,
    CAST(-170.0 + n_nationkey * 13.0 AS DOUBLE) AS lon
  FROM nation)
SELECT a.n_name AS nation_a, b.n_name AS nation_b,
  {_geo_dist_expr("a.lat", "a.lon", "b.lat", "b.lon")} AS dist_km
FROM geo a JOIN geo b ON a.n_nationkey < b.n_nationkey
ORDER BY dist_km, nation_a, nation_b LIMIT 20
"""


def q_woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information value (ClickHouse
    ``categoricalInformationValue`` parity — the credit-scoring feature
    screen): market segment as the categorical feature, "order has a
    returned line item" as the binary target. Per segment: good/bad
    counts, WOE = ln((good/Σgood)/(bad/Σbad)), the IV contribution, and
    the feature-level IV total. One semi-join flags returned orders,
    one 5-key aggregation, then window arithmetic on the tiny frame."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
    )
    flagged = (
        o.join(returned.withColumn("is_bad", F.lit(1)), "o_orderkey", "left")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.coalesce("is_bad", F.lit(0)).alias("bad"),
        )
    )
    per = flagged.groupBy("seg").agg(
        F.sum(1 - F.col("bad")).cast("bigint").alias("n_good"),
        F.sum("bad").cast("bigint").alias("n_bad"),
    )
    w = Window.partitionBy()
    t = per.withColumn("tg", F.sum("n_good").over(w)).withColumn(
        "tb", F.sum("n_bad").over(w)
    )
    pg = F.col("n_good").cast("double") / F.col("tg")
    pb = F.col("n_bad").cast("double") / F.col("tb")
    woe = F.log(pg / pb)
    return (
        t.select(
            "seg", "n_good", "n_bad",
            F.round(woe, 6).alias("woe"),
            F.round((pg - pb) * woe, 6).alias("iv_part"),
            F.round(F.sum((pg - pb) * woe).over(w), 6).alias("iv_total"),
        )
        .orderBy("seg")
    )


_WOE_SQL = """
WITH returned AS (
  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'),
flagged AS (
  SELECT c_mktsegment AS seg,
    CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS bad
  FROM orders
  LEFT JOIN returned r ON o_orderkey = r.l_orderkey
  JOIN customer ON o_custkey = c_custkey),
per AS (
  SELECT seg, CAST(SUM(1 - bad) AS BIGINT) AS n_good,
    CAST(SUM(bad) AS BIGINT) AS n_bad
  FROM flagged GROUP BY seg),
t AS (
  SELECT *, SUM(n_good) OVER () AS tg, SUM(n_bad) OVER () AS tb FROM per)
SELECT seg, n_good, n_bad,
  ROUND(LN((CAST(n_good AS DOUBLE) / tg) / (CAST(n_bad AS DOUBLE) / tb)), 6)
    AS woe,
  ROUND((CAST(n_good AS DOUBLE) / tg - CAST(n_bad AS DOUBLE) / tb)
        * LN((CAST(n_good AS DOUBLE) / tg) / (CAST(n_bad AS DOUBLE) / tb)), 6)
    AS iv_part,
  ROUND(SUM((CAST(n_good AS DOUBLE) / tg - CAST(n_bad AS DOUBLE) / tb)
        * LN((CAST(n_good AS DOUBLE) / tg) / (CAST(n_bad AS DOUBLE) / tb)))
        OVER (), 6) AS iv_total
FROM t ORDER BY seg
"""


def q_sequence_count_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceCount('(?1).*(?2)')`` parity: per user, the
    number of NON-OVERLAPPING view→purchase chains (greedy matching, the
    engine's semantics), reported as a distribution (users per chain
    count). The greedy recurrence m_j = min(m_{j-1}+1, views_before_j)
    unrolls to m = n_purchases + min_j(views_before_j − j) — pure
    window arithmetic, NO per-user iteration, no UDF: one sort-shuffle
    on user_id regardless of scale."""
    ev = _t(spark, sf_dir, "events")
    typed = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id", "ts", "event_id",
        (F.col("event_type") == "view").cast("int").alias("is_v"),
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_before = w_seq.rowsBetween(Window.unboundedPreceding, -1)
    marked = (
        typed.withColumn("views_before", F.coalesce(F.sum("is_v").over(w_before), F.lit(0)))
        .withColumn("p_rank", F.sum("is_p").over(w_seq))
        .filter(F.col("is_p") == 1)
    )
    per_user = marked.groupBy("user_id").agg(
        F.max("p_rank").alias("n_p"),
        F.min(F.col("views_before") - F.col("p_rank")).alias("slack"),
    )
    # m_n = min(n, min_j(A_j + n − j)) — the slack only ever SUBTRACTS
    # (cap at n_p when views are plentiful), hence least(slack, 0)
    chains = per_user.select(
        "user_id",
        (F.col("n_p") + F.least(F.col("slack"), F.lit(0))).alias("n_chains"),
    )
    return (
        chains.groupBy("n_chains")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy("n_chains")
    )


_SEQ_COUNT_SQL = """
WITH typed AS (
  SELECT user_id, ts, event_id,
    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_v,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events WHERE event_type IN ('view', 'purchase')),
marked AS (
  SELECT user_id,
    COALESCE(SUM(is_v) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS views_before,
    SUM(is_p) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_rank,
    is_p
  FROM typed),
per_user AS (
  SELECT user_id, MAX(p_rank) AS n_p,
    MIN(views_before - p_rank) AS slack
  FROM marked WHERE is_p = 1 GROUP BY user_id)
SELECT CAST(n_p + LEAST(slack, 0) AS BIGINT) AS n_chains,
  CAST(COUNT(*) AS BIGINT) AS n_users
FROM per_user GROUP BY 1 ORDER BY n_chains
"""


def q_roc_auc_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC via the tie-corrected rank-sum identity (the exact
    distributed AUC — no threshold sweep): score = first embedding
    component rounded to 6dp (the fixture vectors are unit-normalized,
    so the L2 norm is constant — a projection is the honest scalar
    probe), positive class = label ≥ 5. The rank side is DISTRIBUTED:
    a per-(score) aggregate folds counts + positive counts, a global
    row_number from operators/ranking (range-partitioned, broadcast
    offsets — no single-partition window) gives each row a rank, and
    min(rn) per score group recovers RANK() exactly; the tie-corrected
    doubled average rank 2·ar = 2·rank + tie_cnt − 1 stays integral, so
    the rank-sum matches the oracle's half-integer double sum bit-for-bit
    (every term < 2^53 is exactly representable)."""
    emb = _t(spark, sf_dir, "embeddings")
    scored = emb.select(
        F.round(F.col("embedding").getItem(0).cast("double"), 6).alias("score"),
        (F.col("label") >= 5).cast("int").alias("pos"),
        F.col("vec_id"),
    )
    # vec_id tie-break: irrelevant to min(rn)-per-score (RANK is
    # tie-insensitive) but lets the ranged shuffle SPLIT tied scores
    # across partitions — without it a heavily-tied score column would
    # collapse back to few tasks (see ranking.global_row_number docstring)
    rn = RK.global_row_number(scored, ["score", "vec_id"], col_name="rn")
    per_score = rn.groupBy("score").agg(
        F.min("rn").alias("rnk"),
        F.count("*").alias("cnt"),
        F.sum("pos").alias("posc"),
    )
    # Σ over positive rows of 2·avg_rank, exact integer arithmetic —
    # factors cast to decimal BEFORE multiplying: posc·(2·rnk+cnt−1) is
    # O(n²) and would silently wrap past 2^63 in bigint at large scale
    rs2 = F.sum(
        F.col("posc").cast("decimal(38,0)")
        * (2 * F.col("rnk") + F.col("cnt") - 1).cast("decimal(38,0)")
    )
    agg = per_score.agg(
        F.sum("posc").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("posc")).alias("n_neg"),
        rs2.alias("rs2"),
    )
    return agg.select(
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        F.round(
            (F.col("rs2").cast("double") / 2.0
             - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
            / (F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


_ROC_AUC_SQL = """
WITH scored AS (
  SELECT round(embedding[1]::DOUBLE, 6) AS score,
    CASE WHEN label >= 5 THEN 1 ELSE 0 END AS pos
  FROM embeddings),
r AS (
  SELECT pos,
    RANK() OVER (ORDER BY score)
      + (COUNT(*) OVER (PARTITION BY score) - 1) / 2.0 AS ar
  FROM scored),
agg AS (
  SELECT SUM(pos) AS n_pos, SUM(1 - pos) AS n_neg,
    SUM(CASE WHEN pos = 1 THEN ar END) AS rank_sum_pos
  FROM r)
SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
  ROUND((rank_sum_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg), 6) AS auc
FROM agg
"""


def q_ab_cuped_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with CUPED variance reduction (Deng et al.
    WSDM'13 — the industry-standard sensitivity boost): users split into
    arms by id parity at 2024-01-16; Y = post-period value, X =
    pre-period value (the covariate), θ = cov(X,Y)/var(X) POOLED, and
    the adjusted metric Yᶜ = Y − θ(X − X̄). Reports per-arm means, the
    raw and CUPED diffs, θ, and the achieved variance-reduction ppm.
    One user-grain aggregation; every moment is an exact-cents decimal
    power sum folded map-side — the scalar stage is a broadcast of one
    row."""
    ev = _t(spark, sf_dir, "events")
    t0 = F.lit("2024-01-16 00:00:00").cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("bigint")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < t0, cents).otherwise(F.lit(0))).alias("xc"),
            F.sum(F.when(F.col("ts") >= t0, cents).otherwise(F.lit(0))).alias("yc"),
        )
        .select(
            (F.col("user_id") % 2).cast("int").alias("arm"),
            F.col("xc"), F.col("yc"),
        )
    )
    d19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    moments = per_user.agg(
        F.count("*").alias("n"),
        F.sum(d19(F.col("xc"))).cast("double").alias("sx"),
        F.sum(d19(F.col("yc"))).cast("double").alias("sy"),
        F.sum(d19(F.col("xc")) * d19(F.col("xc"))).cast("double").alias("sxx"),
        F.sum(d19(F.col("xc")) * d19(F.col("yc"))).cast("double").alias("sxy"),
    ).select(
        (F.col("sx") / F.col("n")).alias("mx"),
        ((F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
         / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))).alias("theta"),
    )
    adj = per_user.crossJoin(F.broadcast(moments)).select(
        "arm",
        F.col("yc").cast("double").alias("y"),
        (F.col("yc").cast("double")
         - F.col("theta") * (F.col("xc").cast("double") - F.col("mx"))).alias("ya"),
        "theta",
    )
    # arm = user_id % 2 ∈ {0, 1}, so arms is 2 rows — checkpointed, and
    # the pooled variances are a 1-row broadcast aggregate over it instead
    # of a global window (no single-partition exchange, and the per_user
    # pipeline runs exactly once)
    arms = adj.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.avg("y").alias("my"),
        F.avg("ya").alias("mya"),
        F.var_samp("y").alias("vy"),
        F.var_samp("ya").alias("vya"),
        F.first("theta").alias("theta"),
    ).localCheckpoint(eager=True)
    pooled = arms.agg(
        (
            F.sum(F.col("vy") * (F.col("n") - 1)) / F.sum(F.col("n") - 1)
        ).alias("pv"),
        (
            F.sum(F.col("vya") * (F.col("n") - 1)) / F.sum(F.col("n") - 1)
        ).alias("pva"),
    )
    return (
        arms.crossJoin(F.broadcast(pooled))
        .select(
            "arm",
            F.col("n").cast("bigint").alias("n_users"),
            F.round(F.col("my") / 100, 6).alias("mean_value"),
            F.round(F.col("mya") / 100, 6).alias("mean_cuped"),
            F.round(F.col("theta"), 6).alias("theta"),
            F.round((F.lit(1.0) - F.col("pva") / F.col("pv")) * 1e6, 0)
            .cast("bigint").alias("var_reduction_ppm"),
        )
        .orderBy("arm")
    )


_AB_CUPED_SQL = """
WITH per_user AS (
  SELECT CAST(user_id % 2 AS INT) AS arm,
    SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS xc,
    SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS yc
  FROM events GROUP BY user_id),
m AS (
  SELECT CAST(SUM(CAST(xc AS DECIMAL(19,0))) AS DOUBLE) / COUNT(*) AS mx,
    (CAST(SUM(CAST(xc AS DECIMAL(19,0)) * CAST(yc AS DECIMAL(19,0))) AS DOUBLE)
     - CAST(SUM(CAST(xc AS DECIMAL(19,0))) AS DOUBLE)
       * CAST(SUM(CAST(yc AS DECIMAL(19,0))) AS DOUBLE) / COUNT(*))
    / (CAST(SUM(CAST(xc AS DECIMAL(19,0)) * CAST(xc AS DECIMAL(19,0))) AS DOUBLE)
     - CAST(SUM(CAST(xc AS DECIMAL(19,0))) AS DOUBLE)
       * CAST(SUM(CAST(xc AS DECIMAL(19,0))) AS DOUBLE) / COUNT(*)) AS theta
  FROM per_user),
adj AS (
  SELECT arm, CAST(yc AS DOUBLE) AS y,
    CAST(yc AS DOUBLE) - theta * (CAST(xc AS DOUBLE) - mx) AS ya, theta
  FROM per_user CROSS JOIN m),
arms AS (
  SELECT arm, COUNT(*) AS n, AVG(y) AS my, AVG(ya) AS mya,
    VAR_SAMP(y) AS vy, VAR_SAMP(ya) AS vya, ANY_VALUE(theta) AS theta
  FROM adj GROUP BY arm)
SELECT arm, CAST(n AS BIGINT) AS n_users,
  ROUND(my / 100, 6) AS mean_value,
  ROUND(mya / 100, 6) AS mean_cuped,
  ROUND(theta, 6) AS theta,
  CAST(ROUND((1.0 - (SUM(vya * (n - 1)) OVER () / SUM(n - 1) OVER ())
       / (SUM(vy * (n - 1)) OVER () / SUM(n - 1) OVER ())) * 1e6, 0) AS BIGINT)
    AS var_reduction_ppm
FROM arms ORDER BY arm
"""


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration / reliability diagram for the norm-score classifier
    behind roc_auc_embeddings: scores min-max-normalized to [0,1], cut
    into 10 equal-width probability bins; per bin the support, mean
    predicted score, observed positive rate (exact ppm), and the
    |pred − obs| gap that sums to ECE. Min/max come from one tiny
    aggregate broadcast back — two passes over a vector table, zero
    joins beyond the scalar broadcast. Score = first embedding
    component (unit-normalized fixture vectors make the norm
    constant)."""
    emb = _t(spark, sf_dir, "embeddings")
    scored = emb.select(
        F.round(F.col("embedding").getItem(0).cast("double"), 6).alias("s"),
        (F.col("label") >= 5).cast("int").alias("pos"),
    )
    rng = scored.agg(F.min("s").alias("lo"), F.max("s").alias("hi"))
    binned = scored.crossJoin(F.broadcast(rng)).select(
        "pos",
        F.least(
            F.floor((F.col("s") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 10)
            .cast("int"),
            F.lit(9),
        ).alias("bin"),
        ((F.col("s") - F.col("lo")) / (F.col("hi") - F.col("lo"))).alias("p"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.avg("p"), 6).alias("mean_pred"),
            F.sum("pos").cast("bigint").alias("n_pos"),
        )
        .withColumn("obs_ppm", F.expr("n_pos * 1000000 div n").cast("bigint"))
        .withColumn(
            "gap_ppm",
            F.abs(
                F.round(F.col("mean_pred") * 1e6, 0).cast("bigint") - F.col("obs_ppm")
            ),
        )
        .orderBy("bin")
    )


_CALIBRATION_SQL = """
WITH scored AS (
  SELECT round(embedding[1]::DOUBLE, 6) AS s,
    CASE WHEN label >= 5 THEN 1 ELSE 0 END AS pos
  FROM embeddings),
rng AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM scored),
binned AS (
  SELECT pos,
    LEAST(CAST(FLOOR((s - lo) / (hi - lo) * 10) AS INT), 9) AS bin,
    (s - lo) / (hi - lo) AS p
  FROM scored CROSS JOIN rng)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
  ROUND(AVG(p), 6) AS mean_pred,
  CAST(SUM(pos) AS BIGINT) AS n_pos,
  CAST(SUM(pos) * 1000000 // COUNT(*) AS BIGINT) AS obs_ppm,
  ABS(CAST(ROUND(ROUND(AVG(p), 6) * 1e6, 0) AS BIGINT)
      - CAST(SUM(pos) * 1000000 // COUNT(*) AS BIGINT)) AS gap_ppm
FROM binned GROUP BY bin ORDER BY bin
"""


def q_tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (BPE-ish tokens per whitespace word) per
    language — the multilingual-cost report every tokenizer eval leads
    with: high fertility = a language pays more compute per word. Both
    token counts are row-local regex folds (codegen), one 5-key
    aggregation; fertility in exact ppm."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    per = docs.select(
        "lang",
        TX.bpe_token_count(t).alias("bpe"),
        TX.token_count(t).alias("ws"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("bpe").cast("bigint").alias("bpe_tokens"),
            F.sum("ws").cast("bigint").alias("ws_tokens"),
        )
        .withColumn(
            "fertility_ppm",
            F.expr("bpe_tokens * 1000000 div ws_tokens").cast("bigint"),
        )
        .orderBy("lang")
    )


_FERTILITY_SQL = f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(len(regexp_extract_all(lower(text),
    '{TX.BPE_SPLIT_RE.replace(chr(39), chr(39) * 2)}'))) AS BIGINT) AS bpe_tokens,
  CAST(SUM(len({_TOKS_SQL})) AS BIGINT) AS ws_tokens,
  CAST(SUM(len(regexp_extract_all(lower(text),
    '{TX.BPE_SPLIT_RE.replace(chr(39), chr(39) * 2)}'))) * 1000000
    // SUM(len({_TOKS_SQL})) AS BIGINT) AS fertility_ppm
FROM documents GROUP BY lang ORDER BY lang
"""


def q_ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis (ClickHouse ``minSampleSizeConversion``
    parity): from the observed signup→purchase conversion baseline,
    the per-arm sample size needed to detect a −5% relative drop at
    α=0.05 (two-sided) / 80% power, plus how many users the fixture
    actually has. (A drop keeps the target rate inside (0,1) even when
    the observed baseline saturates near 1.) z-quantiles are double
    literals, so the whole formula is IEEE-identical across engines.
    One user-grain aggregation."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    )
    base = per_user.agg(
        F.count("*").alias("n_users"), F.sum("conv").alias("n_conv")
    )
    p1 = F.col("n_conv").cast("double") / F.col("n_users")
    p2 = p1 * 0.95
    pbar = (p1 + p2) / 2.0
    za, zb = 1.9599639845400545, 0.8416212335729143
    n_req = (
        (za * F.sqrt(2.0 * pbar * (1.0 - pbar))
         + zb * F.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
        / (p2 - p1)
    )
    return base.select(
        F.col("n_users").cast("bigint").alias("n_users"),
        F.round(p1, 6).alias("baseline_rate"),
        F.round(p2, 6).alias("target_rate"),
        F.ceil(n_req * n_req).cast("bigint").alias("n_required_per_arm"),
        (F.ceil(n_req * n_req) * 2 <= F.col("n_users")).alias("is_powered"),
    )


_AB_POWER_SQL = """
WITH per_user AS (
  SELECT user_id,
    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id),
base AS (
  SELECT COUNT(*) AS n_users, SUM(conv) AS n_conv FROM per_user),
calc AS (
  SELECT n_users,
    CAST(n_conv AS DOUBLE) / n_users AS p1,
    CAST(n_conv AS DOUBLE) / n_users * 0.95 AS p2
  FROM base)
SELECT CAST(n_users AS BIGINT) AS n_users,
  ROUND(p1, 6) AS baseline_rate,
  ROUND(p2, 6) AS target_rate,
  CAST(CEIL(POW((1.9599639845400545 * SQRT(2.0 * ((p1 + p2) / 2.0) * (1.0 - (p1 + p2) / 2.0))
    + 0.8416212335729143 * SQRT(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
    / (p2 - p1), 2)) AS BIGINT) AS n_required_per_arm,
  CAST(CEIL(POW((1.9599639845400545 * SQRT(2.0 * ((p1 + p2) / 2.0) * (1.0 - (p1 + p2) / 2.0))
    + 0.8416212335729143 * SQRT(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
    / (p2 - p1), 2)) * 2 <= n_users AS BOOLEAN) AS is_powered
FROM calc
"""


def q_encoding_advisor_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-encoding advisor (the lakehouse ops surface behind
    ClickHouse's column-codec picker): per lineitem column — rows,
    exact distinct count, adjacent-run count in the (orderkey,
    linenumber) physical order, then the dictionary-vs-RLE-vs-plain
    recommendation from distinct-ratio and run-ratio ppm thresholds.
    Run counting is DISTRIBUTED (operators/ranking.partitioned_run_counts):
    range-partition on the physical order, one vectorized per-partition
    pass counts interior value changes, and partitions stitch at their
    boundaries over a <= num_partitions-row frame — exact lag semantics,
    no single-partition window. Distinct counts fold in one aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_discount",
            "l_suppkey", "l_shipdate"]
    runs_wide = RK.partitioned_run_counts(
        li, ["l_orderkey", "l_linenumber"], cols
    )
    dist_aggs = [F.count_distinct(F.col(c)).cast("bigint").alias(f"dist_{c}") for c in cols]
    dist_wide = li.agg(*dist_aggs)
    wide = runs_wide.crossJoin(F.broadcast(dist_wide))
    stack = ", ".join(f"'{c}', runs_{c}, dist_{c}" for c in cols)
    long = wide.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack}) AS (column_name, n_runs, n_distinct)",
    )
    return (
        long.select(
            "column_name", "n_rows", "n_runs", "n_distinct",
            F.expr("n_distinct * 1000000 div n_rows").cast("bigint").alias("distinct_ppm"),
            F.expr("n_runs * 1000000 div n_rows").cast("bigint").alias("run_ppm"),
        )
        .withColumn(
            "recommendation",
            F.when(F.col("run_ppm") < 500000, F.lit("rle"))
            .when(F.col("distinct_ppm") < 10000, F.lit("dict"))
            .otherwise(F.lit("plain")),
        )
        .orderBy("column_name")
    )


_ENCODING_SQL = """
WITH ordered AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
  FROM lineitem),
chg AS (
  SELECT
    CASE WHEN l_returnflag IS DISTINCT FROM LAG(l_returnflag) OVER w THEN 1 ELSE 0 END AS chg_l_returnflag,
    CASE WHEN l_linestatus IS DISTINCT FROM LAG(l_linestatus) OVER w THEN 1 ELSE 0 END AS chg_l_linestatus,
    CASE WHEN l_quantity IS DISTINCT FROM LAG(l_quantity) OVER w THEN 1 ELSE 0 END AS chg_l_quantity,
    CASE WHEN l_discount IS DISTINCT FROM LAG(l_discount) OVER w THEN 1 ELSE 0 END AS chg_l_discount,
    CASE WHEN l_suppkey IS DISTINCT FROM LAG(l_suppkey) OVER w THEN 1 ELSE 0 END AS chg_l_suppkey,
    CASE WHEN l_shipdate IS DISTINCT FROM LAG(l_shipdate) OVER w THEN 1 ELSE 0 END AS chg_l_shipdate
  FROM ordered WINDOW w AS (ORDER BY l_orderkey, l_linenumber)),
runs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
    CAST(SUM(chg_l_returnflag) AS BIGINT) AS runs_l_returnflag,
    CAST(SUM(chg_l_linestatus) AS BIGINT) AS runs_l_linestatus,
    CAST(SUM(chg_l_quantity) AS BIGINT) AS runs_l_quantity,
    CAST(SUM(chg_l_discount) AS BIGINT) AS runs_l_discount,
    CAST(SUM(chg_l_suppkey) AS BIGINT) AS runs_l_suppkey,
    CAST(SUM(chg_l_shipdate) AS BIGINT) AS runs_l_shipdate
  FROM chg),
dist AS (
  SELECT CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS dist_l_returnflag,
    CAST(COUNT(DISTINCT l_linestatus) AS BIGINT) AS dist_l_linestatus,
    CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS dist_l_quantity,
    CAST(COUNT(DISTINCT l_discount) AS BIGINT) AS dist_l_discount,
    CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS dist_l_suppkey,
    CAST(COUNT(DISTINCT l_shipdate) AS BIGINT) AS dist_l_shipdate
  FROM lineitem),
long AS (
  SELECT n_rows, col AS column_name, n_runs, n_distinct FROM runs, dist,
  LATERAL (VALUES
    ('l_discount', runs_l_discount, dist_l_discount),
    ('l_linestatus', runs_l_linestatus, dist_l_linestatus),
    ('l_quantity', runs_l_quantity, dist_l_quantity),
    ('l_returnflag', runs_l_returnflag, dist_l_returnflag),
    ('l_shipdate', runs_l_shipdate, dist_l_shipdate),
    ('l_suppkey', runs_l_suppkey, dist_l_suppkey)
  ) AS v(col, n_runs, n_distinct))
SELECT column_name, n_rows, n_runs, n_distinct,
  CAST(n_distinct * 1000000 // n_rows AS BIGINT) AS distinct_ppm,
  CAST(n_runs * 1000000 // n_rows AS BIGINT) AS run_ppm,
  CASE WHEN n_runs * 1000000 // n_rows < 500000 THEN 'rle'
       WHEN n_distinct * 1000000 // n_rows < 10000 THEN 'dict'
       ELSE 'plain' END AS recommendation
FROM long ORDER BY column_name
"""


def q_bootstrap_ci_daily_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bootstrap CI for mean daily revenue: B=200 hash-
    indexed resamples of the day series (resample b picks day
    md5(b·100000+j) mod n for j=1..n — reproducible on any engine, any
    partition order), each resample's exact-cents mean, then the 2.5 %
    / 97.5 % order statistics of the B means. The spine is B·n rows
    joined back to the tiny daily frame by index — at 100 TB the daily
    frame is still a rollup, so the bootstrap costs B tiny passes, not
    B corpus scans."""
    o = _t(spark, sf_dir, "orders")
    daily = _daily_cents(o)
    idx = daily.select(
        F.row_number().over(Window.orderBy("d")).alias("j"), "cents"
    ).localCheckpoint(eager=True)
    n = idx.count()
    B = 200
    spine = (
        spark.range(1, B + 1)
        .select(F.col("id").alias("b"))
        .crossJoin(spark.range(1, n + 1).select(F.col("id").alias("k")))
    )
    pick = (
        F.conv(
            F.substring(
                F.md5((F.col("b") * 100000 + F.col("k")).cast("string")), 1, 15
            ),
            16, 10,
        ).cast("bigint") % n + 1
    ).alias("j")
    resampled = spine.select("b", pick).join(F.broadcast(idx), "j")
    means = resampled.groupBy("b").agg(
        (F.sum("cents").cast("double") / F.count("*") / 100.0).alias("m")
    )
    ranked = means.select(
        "m", F.row_number().over(Window.orderBy("m")).alias("r")
    )
    lo_r, hi_r = int(B * 0.025), int(B * 0.975)
    observed = idx.agg(
        (F.sum("cents").cast("double") / F.count("*") / 100.0).alias("obs")
    )
    return (
        ranked.filter(F.col("r").isin(lo_r, hi_r))
        .groupBy()
        .agg(
            F.round(F.min("m"), 6).alias("ci_lo"),
            F.round(F.max("m"), 6).alias("ci_hi"),
        )
        .crossJoin(F.broadcast(observed))
        .select(
            F.lit(B).cast("bigint").alias("n_resamples"),
            F.lit(n).cast("bigint").alias("n_days"),
            F.round("obs", 6).alias("mean_daily_revenue"),
            "ci_lo", "ci_hi",
        )
    )


_BOOTSTRAP_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1),
idx AS (
  SELECT ROW_NUMBER() OVER (ORDER BY d) AS j, cents FROM daily),
n AS (SELECT COUNT(*) AS n FROM idx),
spine AS (
  SELECT b.range AS b, idx.j AS k
  FROM range(1, 201) b CROSS JOIN idx),
resampled AS (
  SELECT b,
    ('0x' || substr(md5(CAST(b * 100000 + k AS VARCHAR)), 1, 15))::BIGINT
      % (SELECT n FROM n) + 1 AS j
  FROM spine),
means AS (
  SELECT b, CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0 AS m
  FROM resampled JOIN idx USING (j) GROUP BY b),
ranked AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS r FROM means),
ci AS (
  SELECT ROUND(MIN(m), 6) AS ci_lo, ROUND(MAX(m), 6) AS ci_hi
  FROM ranked WHERE r IN (5, 195)),
obs AS (
  SELECT CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0 AS obs FROM idx)
SELECT CAST(200 AS BIGINT) AS n_resamples,
  CAST((SELECT n FROM n) AS BIGINT) AS n_days,
  ROUND(obs, 6) AS mean_daily_revenue, ci_lo, ci_hi
FROM ci, obs
"""


def q_limit_by_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``LIMIT 2 OFFSET 1 BY o_orderpriority`` parity: for
    every priority class, skip the single biggest order and keep the
    next two (the runner-up report — ClickHouse's per-group pagination
    that plain LIMIT can't express). row_number over a per-priority
    value sort, keep ranks 2-3 — one window, no join; at scale the
    rank window prunes per-partition before the final sort."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("cents"), F.col("o_orderkey")
    )
    return (
        o.select("o_orderpriority", "o_orderkey", cents.alias("cents"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk").between(2, 3))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("rnk").cast("bigint").alias("rnk"),
            "o_orderkey", "cents",
        )
        .orderBy("priority", "rnk")
    )


_LIMIT_BY_SQL = """
SELECT o_orderpriority AS priority, CAST(rnk AS BIGINT) AS rnk,
  o_orderkey, cents
FROM (
  SELECT o_orderpriority, o_orderkey,
    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC, o_orderkey)
      AS rnk
  FROM orders)
WHERE rnk BETWEEN 2 AND 3
ORDER BY priority, rnk
"""


def q_group_by_with_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``GROUP BY ... WITH TOTALS`` parity: per-status order
    counts and exact revenue, plus the single TOTALS row (status
    '__totals__') computed in the same pass via ROLLUP — no second
    scan, no union. grouping_id distinguishes the totals row exactly
    the way ClickHouse's totals block does."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        o.select("o_orderstatus", cents.alias("cents"))
        .rollup("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("__totals__")).alias("status"),
            "n_orders", "revenue_cents",
        )
        .orderBy("status")
    )


_WITH_TOTALS_SQL = """
SELECT COALESCE(o_orderstatus, '__totals__') AS status,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS revenue_cents
FROM orders GROUP BY ROLLUP (o_orderstatus)
ORDER BY status
"""


def q_ttl_rollup_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``TTL ... GROUP BY`` parity — the MergeTree aging
    policy that REPLACES raw rows older than the TTL boundary with
    per-(day, type) aggregates while younger rows stay raw. Boundary:
    2024-01-20. The query emits the unified post-compaction table
    profile per day: granularity ('raw' | 'rollup'), stored rows (raw
    events vs one row per (day,type)), represented events, and exact
    value cents — proving the compaction is lossless in count and sum.
    Both branches are one conditional aggregation; no union of scans —
    a single pass groups by (day, granularity) with a type key only on
    the cold side."""
    ev = _t(spark, sf_dir, "events")
    t0 = F.lit("2024-01-20 00:00:00").cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("bigint")
    tagged = ev.select(
        F.to_date("ts").alias("day"),
        F.when(F.col("ts") < t0, F.lit("rollup")).otherwise(F.lit("raw")).alias("granularity"),
        F.when(F.col("ts") < t0, F.col("event_type")).alias("rollup_type"),
        F.when(F.col("ts") >= t0, F.col("event_id")).alias("raw_id"),
        cents.alias("cents"),
    )
    return (
        tagged.groupBy("day", "granularity")
        .agg(
            # cold days store one row per event type; hot days one per event
            (F.count_distinct("rollup_type") + F.count_distinct("raw_id"))
            .cast("bigint").alias("stored_rows"),
            F.count("*").cast("bigint").alias("events_represented"),
            F.sum("cents").cast("bigint").alias("value_cents"),
        )
        .withColumn(
            "compaction_ratio_ppm",
            F.expr("stored_rows * 1000000 div events_represented").cast("bigint"),
        )
        .orderBy("day")
    )


_TTL_ROLLUP_SQL = """
WITH tagged AS (
  SELECT CAST(ts AS DATE) AS day,
    CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00'
         THEN 'rollup' ELSE 'raw' END AS granularity,
    CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00'
         THEN event_type END AS rollup_type,
    CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
         THEN event_id END AS raw_id,
    CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events)
SELECT day, granularity,
  CAST(COUNT(DISTINCT rollup_type) + COUNT(DISTINCT raw_id) AS BIGINT)
    AS stored_rows,
  CAST(COUNT(*) AS BIGINT) AS events_represented,
  CAST(SUM(cents) AS BIGINT) AS value_cents,
  CAST((COUNT(DISTINCT rollup_type) + COUNT(DISTINCT raw_id)) * 1000000
       // COUNT(*) AS BIGINT) AS compaction_ratio_ppm
FROM tagged GROUP BY day, granularity ORDER BY day
"""


def q_theta_method_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method forecast (Assimakopoulos & Nikolopoulos 2000 — the
    M3-competition winner) for daily revenue: OLS-detrend to the θ=2
    line, SES(α=0.5) over it, then h=1..14 forecasts
    s_n + (h−1+1/α)·slope/2. Regression sums are EXACT integers
    (decimal in SQL) divided once; the SES recurrence replays the
    identical IEEE sequence in applyInPandas (Spark, one task — the
    forecaster's per-series partitioning) and a recursive CTE (DuckDB),
    so the gate is bit-exact with no rounding slack. Reference model
    family: forecast_script.py:171-177 fits per-series models the same
    one-task-per-series way."""
    import pandas as pd

    o = _t(spark, sf_dir, "orders")
    daily = _daily_cents(o)

    def _theta(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        ys = [int(v) for v in pdf["cents"]]
        n = len(ys)
        st = n * (n + 1) // 2
        stt = n * (n + 1) * (2 * n + 1) // 6
        sy = sum(ys)
        sty = sum((t + 1) * y for t, y in enumerate(ys))
        num, den = n * sty - st * sy, n * stt - st * st
        a1 = float(num) / float(den)
        a0 = (sy - a1 * st) / n
        s = None
        for t, y in enumerate(ys, start=1):
            x2 = 2.0 * y - (a0 + a1 * t)
            s = x2 if s is None else 0.5 * x2 + 0.5 * s
        rows = {"h": [], "forecast": [], "ses_level": [], "slope_cents": []}
        for h in range(1, 15):
            f = s + (h - 1 + 2.0) * (a1 / 2.0)
            rows["h"].append(h)
            rows["forecast"].append(f / 100.0)
            rows["ses_level"].append(s / 100.0)
            rows["slope_cents"].append(a1)
        return pd.DataFrame(rows)

    return (
        daily.groupBy(F.lit(1).alias("_g"))
        .applyInPandas(
            lambda _, pdf: _theta(pdf),
            "h int, forecast double, ses_level double, slope_cents double",
        )
        .orderBy("h")
    )


_THETA_SQL = """
WITH RECURSIVE daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1),
idx AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS rn, y FROM daily),
reg AS (
  SELECT COUNT(*) AS n,
    SUM(CAST(rn AS DECIMAL(38,0))) AS st,
    SUM(CAST(rn AS DECIMAL(38,0)) * CAST(rn AS DECIMAL(38,0))) AS stt,
    SUM(CAST(y AS DECIMAL(38,0))) AS sy,
    SUM(CAST(rn AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS sty
  FROM idx),
coef AS (
  SELECT n,
    CAST(n * sty - st * sy AS DOUBLE) / CAST(n * stt - st * st AS DOUBLE) AS a1,
    (CAST(sy AS DOUBLE)
     - CAST(n * sty - st * sy AS DOUBLE) / CAST(n * stt - st * st AS DOUBLE)
       * CAST(st AS DOUBLE)) / n AS a0
  FROM reg),
ses(rn, s) AS (
  SELECT i.rn, 2.0 * i.y - (c.a0 + c.a1 * i.rn)
  FROM idx i, coef c WHERE i.rn = 1
  UNION ALL
  SELECT i.rn, 0.5 * (2.0 * i.y - (c.a0 + c.a1 * i.rn)) + 0.5 * p.s
  FROM ses p JOIN idx i ON i.rn = p.rn + 1, coef c),
last AS (SELECT s FROM ses ORDER BY rn DESC LIMIT 1),
h AS (SELECT UNNEST(generate_series(1, 14)) AS h)
SELECT CAST(h.h AS INT) AS h,
  (l.s + (h.h - 1 + 2.0) * (c.a1 / 2.0)) / 100.0 AS forecast,
  l.s / 100.0 AS ses_level,
  c.a1 AS slope_cents
FROM h, last l, coef c ORDER BY h
"""


def q_ql_dirichlet_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty 2001 — the LM complement of BM25, μ=100) for a fixed
    3-term query: score(d) = Σ_q ln((tf + μ·P(q|C)) / (|d| + μ)).
    Collection statistics reduce to one broadcast row; per-doc term
    frequencies are row-local array filters, so the whole scorer is one
    corpus scan + a 3-ln chain — same shapes at any corpus size.
    Top-20, doc_id tie-break."""
    terms = ["stream", "filter", "vector"]
    docs = _t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    mu = F.lit(100.0)
    def _tf(term: str) -> F.Column:
        # NB: a `lambda x, t=term` default-arg closure would be seen by
        # PySpark as the 2-ary (element, index) lambda form — bind via
        # this factory instead
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    per = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[_tf(t).alias(f"tf{i}") for i, t in enumerate(terms)],
    )
    stats = per.agg(
        F.sum("dl").cast("double").alias("ctot"),
        *[F.sum(f"tf{i}").cast("double").alias(f"ctf{i}") for i in range(len(terms))],
    )
    j = per.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        term_score = F.log(
            (F.col(f"tf{i}") + mu * (F.col(f"ctf{i}") / F.col("ctot")))
            / (F.col("dl") + mu)
        )
        score = term_score if score is None else score + term_score
    return (
        j.select("doc_id", "dl", F.round(score, 6).alias("ql_score"))
        .orderBy(F.desc("ql_score"), "doc_id")
        .limit(20)
    )


_QL_SQL = f"""
WITH per AS (
  SELECT doc_id, len({_TOKS_SQL}) AS dl,
    len(list_filter({_TOKS_SQL}, x -> x = 'stream')) AS tf0,
    len(list_filter({_TOKS_SQL}, x -> x = 'filter')) AS tf1,
    len(list_filter({_TOKS_SQL}, x -> x = 'vector')) AS tf2
  FROM documents),
stats AS (
  SELECT CAST(SUM(dl) AS DOUBLE) AS ctot,
    CAST(SUM(tf0) AS DOUBLE) AS ctf0,
    CAST(SUM(tf1) AS DOUBLE) AS ctf1,
    CAST(SUM(tf2) AS DOUBLE) AS ctf2
  FROM per)
SELECT doc_id, dl,
  ROUND(
    LN((tf0 + 100.0 * (ctf0 / ctot)) / (dl + 100.0))
    + LN((tf1 + 100.0 * (ctf1 / ctot)) / (dl + 100.0))
    + LN((tf2 + 100.0 * (ctf2 / ctot)) / (dl + 100.0)), 6) AS ql_score
FROM per, stats
ORDER BY ql_score DESC, doc_id LIMIT 20
"""


def q_hurst_exponent_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent via rescaled-range (R/S) analysis of daily revenue
    — the long-memory diagnostic (H≈0.5 random walk, >0.5 trending)
    that decides whether momentum features are real. Dyadic scales
    {8,16,32,64}: blocks of s days each yield R (range of the ordered
    cumulative deviation — an ORDERED window sum, so the double
    sequence is identical on both engines) over S (block σ from exact
    integer power sums); H = OLS slope of ln(mean R/S) on ln(s).
    Reports per-scale mean R/S plus the fitted H on every row. The
    series is a day-grain rollup, so all of this is tiny-frame window
    math regardless of fact size."""
    o = _t(spark, sf_dir, "orders")
    daily = _daily_cents(o)
    idx = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1).alias("i"), "cents"
    ).localCheckpoint(eager=True)
    scales = spark.createDataFrame([(8,), (16,), (32,), (64,)], "s int")
    blocks = idx.crossJoin(F.broadcast(scales)).select(
        "s", (F.col("i") / F.col("s")).cast("int").alias("blk"), "i", "cents"
    )
    # block moments from exact integer sums
    wb = Window.partitionBy("s", "blk")
    d19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    withm = (
        blocks.withColumn("bn", F.count("*").over(wb))
        .filter(F.col("bn") == F.col("s"))  # full blocks only
        .withColumn("bsum", F.sum(d19(F.col("cents"))).over(wb).cast("double"))
        .withColumn("bsumsq", F.sum(d19(F.col("cents")) * d19(F.col("cents"))).over(wb).cast("double"))
        .withColumn("mean", F.col("bsum") / F.col("s"))
        .withColumn(
            "sd",
            F.sqrt((F.col("bsumsq") - F.col("bsum") * F.col("bsum") / F.col("s"))
                   / F.col("s")),
        )
    )
    wcum = Window.partitionBy("s", "blk").orderBy("i")
    dev = withm.withColumn(
        "cum", F.sum(F.col("cents").cast("double") - F.col("mean")).over(wcum)
    )
    per_block = dev.groupBy("s", "blk").agg(
        # round before the cross-block mean: block R/S values then sum
        # as decimal, so the scale mean is partition-order-free
        F.round((F.max("cum") - F.min("cum")) / F.first("sd"), 6).alias("rs")
    )
    per_scale = per_block.groupBy("s").agg(
        F.count("*").alias("n_blocks"),
        (_dsum(F.col("rs")) / F.count("*")).alias("mean_rs"),
    ).withColumn(
        # marker: bounded by the 4 literal dyadic scales at every SF
        # (plans.single_partition_collapses bounded-by-construction leaf)
        "__bounded_by_4_scales", F.lit(1)
    ).localCheckpoint(eager=True)
    # OLS of ln(mean_rs) on ln(s) over the 4 scale points
    wall = Window.partitionBy()
    ln_s, ln_r = F.log(F.col("s").cast("double")), F.log("mean_rs")
    fit = per_scale.select(
        "s", "n_blocks", "mean_rs", ln_s.alias("lx"), ln_r.alias("ly")
    ).withColumn(
        "hurst",
        (F.count("*").over(wall) * F.sum(F.col("lx") * F.col("ly")).over(wall)
         - F.sum("lx").over(wall) * F.sum("ly").over(wall))
        / (F.count("*").over(wall) * F.sum(F.col("lx") * F.col("lx")).over(wall)
           - F.sum("lx").over(wall) * F.sum("lx").over(wall)),
    )
    return fit.select(
        "s",
        F.col("n_blocks").cast("bigint").alias("n_blocks"),
        F.round("mean_rs", 6).alias("mean_rs"),
        F.round("hurst", 6).alias("hurst"),
    ).orderBy("s")


_HURST_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1),
idx AS (
  SELECT ROW_NUMBER() OVER (ORDER BY d) - 1 AS i, cents FROM daily),
scales AS (SELECT UNNEST([8, 16, 32, 64]) AS s),
blocks AS (
  SELECT s, CAST(i // s AS INT) AS blk, i, cents
  FROM idx CROSS JOIN scales),
withm AS (
  SELECT * FROM (
    SELECT s, blk, i, cents,
      COUNT(*) OVER wb AS bn,
      CAST(SUM(CAST(cents AS DECIMAL(19,0))) OVER wb AS DOUBLE) AS bsum,
      CAST(SUM(CAST(cents AS DECIMAL(19,0)) * CAST(cents AS DECIMAL(19,0)))
           OVER wb AS DOUBLE) AS bsumsq
    FROM blocks WINDOW wb AS (PARTITION BY s, blk))
  WHERE bn = s),
dev AS (
  SELECT s, blk,
    bsum / s AS mean,
    SQRT((bsumsq - bsum * bsum / s) / s) AS sd,
    SUM(CAST(cents AS DOUBLE) - bsum / s)
      OVER (PARTITION BY s, blk ORDER BY i) AS cum
  FROM withm),
per_block AS (
  SELECT s, blk, ROUND((MAX(cum) - MIN(cum)) / ANY_VALUE(sd), 6) AS rs
  FROM dev GROUP BY s, blk),
per_scale AS (
  SELECT s, COUNT(*) AS n_blocks,
    CAST(SUM(CAST(rs AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS mean_rs
  FROM per_block GROUP BY s),
fit AS (
  SELECT s, n_blocks, mean_rs,
    LN(CAST(s AS DOUBLE)) AS lx, LN(mean_rs) AS ly
  FROM per_scale)
SELECT s, CAST(n_blocks AS BIGINT) AS n_blocks,
  ROUND(mean_rs, 6) AS mean_rs,
  ROUND((COUNT(*) OVER () * SUM(lx * ly) OVER ()
         - SUM(lx) OVER () * SUM(ly) OVER ())
        / (COUNT(*) OVER () * SUM(lx * lx) OVER ()
           - SUM(lx) OVER () * SUM(lx) OVER ()), 6) AS hurst
FROM fit ORDER BY s
"""


def q_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user-behavior Markov chain: H = Σ_i π(i)
    Σ_j −P(i→j)·ln P(i→j), with the stationary weight π estimated as
    each source state's share of transitions — the single number that
    says how predictable user journeys are (0 = deterministic). Rides
    the same lead-window pair counts as markov_transitions. event_type is
    not provably a closed enum, so the transition table counts as
    data-proportional: the total-mass and entropy-rate scalars are 1-row
    broadcast aggregates (never a global window over the cell table), and
    the per-source normalizer stays a src-PARTITIONED window (parallel by
    key). The cell table is checkpointed once — one events scan total."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    counts = (
        pairs.groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    ntot = counts.agg(F.sum("n").alias("ntot"))
    wsrc = Window.partitionBy("src")
    t = counts.withColumn("nsrc", F.sum("n").over(wsrc)).crossJoin(
        F.broadcast(ntot)
    )
    p = F.col("n").cast("double") / F.col("nsrc")
    cell = -(F.col("nsrc").cast("double") / F.col("ntot")) * p * F.log(p)
    per_src = (
        t.groupBy("src")
        .agg(
            F.first("nsrc").cast("bigint").alias("n_transitions"),
            F.round(F.sum(-p * F.log(p)), 6).alias("row_entropy"),
            F.sum(cell).alias("h_part"),
        )
    )
    hr = per_src.agg(F.sum("h_part").alias("h_sum"))
    return (
        per_src.crossJoin(F.broadcast(hr))
        .withColumn("entropy_rate", F.round(F.col("h_sum"), 6))
        .select("src", "n_transitions", "row_entropy", "entropy_rate")
        .orderBy("src")
    )


_MARKOV_ENTROPY_SQL = """
WITH pairs AS (
  SELECT event_type AS src,
    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events),
counts AS (
  SELECT src, dst, COUNT(*) AS n FROM pairs
  WHERE dst IS NOT NULL GROUP BY 1, 2),
t AS (
  SELECT src, dst, n,
    SUM(n) OVER (PARTITION BY src) AS nsrc,
    SUM(n) OVER () AS ntot
  FROM counts),
per_src AS (
  SELECT src,
    CAST(ANY_VALUE(nsrc) AS BIGINT) AS n_transitions,
    ROUND(SUM(-(CAST(n AS DOUBLE) / nsrc) * LN(CAST(n AS DOUBLE) / nsrc)), 6)
      AS row_entropy,
    SUM(-(CAST(nsrc AS DOUBLE) / ntot) * (CAST(n AS DOUBLE) / nsrc)
        * LN(CAST(n AS DOUBLE) / nsrc)) AS h_part
  FROM t GROUP BY src)
SELECT src, n_transitions, row_entropy,
  ROUND(SUM(h_part) OVER (), 6) AS entropy_rate
FROM per_src ORDER BY src
"""


def q_evt_gumbel_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value analysis: monthly block maxima of daily revenue,
    Gumbel fit by method of moments (β = σ√6/π, μ = m − γβ with the
    Euler–Mascheroni constant as a double literal), and the 10/50/100-
    block return levels μ − β·ln(−ln(1−1/T)) — the tail-risk numbers
    capacity planning reads. Block maxima are one day-grain rollup +
    one month aggregation; moments are exact integer power sums of the
    maxima divided once."""
    o = _t(spark, sf_dir, "orders")
    daily = _daily_cents(o)
    maxima = (
        daily.groupBy(F.date_trunc("month", "d").cast("date").alias("m"))
        .agg(F.max("cents").alias("mx"))
    )
    d19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    mom = maxima.agg(
        F.count("*").alias("n"),
        F.sum(d19(F.col("mx"))).cast("double").alias("sx"),
        F.sum(d19(F.col("mx")) * d19(F.col("mx"))).cast("double").alias("sxx"),
    ).select(
        "n",
        (F.col("sx") / F.col("n")).alias("mean"),
        F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
               / (F.col("n") - 1)).alias("sd"),
    )
    gamma = 0.5772156649015329
    pi = 3.141592653589793
    beta = F.col("sd") * F.sqrt(F.lit(6.0)) / pi
    mu = F.col("mean") - gamma * beta
    levels = spark.createDataFrame([(10,), (50,), (100,)], "t int")
    rl = mu - beta * F.log(-F.log(1.0 - 1.0 / F.col("t").cast("double")))
    return (
        mom.crossJoin(F.broadcast(levels))
        .select(
            "t",
            F.col("n").cast("bigint").alias("n_blocks"),
            F.round(mu / 100.0, 6).alias("gumbel_mu"),
            F.round(beta / 100.0, 6).alias("gumbel_beta"),
            F.round(rl / 100.0, 6).alias("return_level"),
        )
        .orderBy("t")
    )


_EVT_GUMBEL_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1),
maxima AS (
  SELECT date_trunc('month', d) AS m, MAX(cents) AS mx
  FROM daily GROUP BY 1),
mom AS (
  SELECT COUNT(*) AS n,
    CAST(SUM(CAST(mx AS DECIMAL(19,0))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(mx AS DECIMAL(19,0)) * CAST(mx AS DECIMAL(19,0))) AS DOUBLE)
      AS sxx
  FROM maxima),
fit AS (
  SELECT n, sx / n AS mean,
    SQRT((sxx - sx * sx / n) / (n - 1)) AS sd
  FROM mom),
levels AS (SELECT UNNEST([10, 50, 100]) AS t)
SELECT t, CAST(n AS BIGINT) AS n_blocks,
  ROUND((mean - 0.5772156649015329 * (sd * SQRT(6.0) / 3.141592653589793))
        / 100.0, 6) AS gumbel_mu,
  ROUND((sd * SQRT(6.0) / 3.141592653589793) / 100.0, 6) AS gumbel_beta,
  ROUND(((mean - 0.5772156649015329 * (sd * SQRT(6.0) / 3.141592653589793))
    - (sd * SQRT(6.0) / 3.141592653589793)
      * LN(-LN(1.0 - 1.0 / CAST(t AS DOUBLE)))) / 100.0, 6) AS return_level
FROM fit CROSS JOIN levels ORDER BY t
"""


def q_template_skeleton_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-level dedup — the instruction-data sibling of exact
    dedup: texts normalize to a SKELETON (digits → '#', whitespace
    collapsed, lowercase) so docs differing only in numbers/ids
    collide. Reports per source: docs, distinct skeletons, docs sitting
    in a collision class (skeleton shared by ≥2 docs), and the rows
    removable by keep-one-per-skeleton. Skeletonization is row-local
    regex; the shuffle carries (source, skeleton-md5) pairs only."""
    docs = _t(spark, sf_dir, "documents")
    skel = F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower("text"), "[0-9]+", "#"), "\\s+", " "
            )
        )
    )
    per = docs.select("source", skel.alias("sk"))
    grp = per.groupBy("source", "sk").agg(F.count("*").alias("n"))
    return (
        grp.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_skeletons"),
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(F.lit(0)))
            .cast("bigint").alias("docs_in_collisions"),
            F.sum(F.col("n") - 1).cast("bigint").alias("removable_docs"),
        )
        .withColumn(
            "dup_ppm",
            F.expr("removable_docs * 1000000 div n_docs").cast("bigint"),
        )
        .orderBy("source")
    )


_SKELETON_SQL = """
WITH per AS (
  SELECT source,
    md5(trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '#', 'g'),
                            '\\s+', ' ', 'g'))) AS sk
  FROM documents),
grp AS (
  SELECT source, sk, COUNT(*) AS n FROM per GROUP BY 1, 2)
SELECT source,
  CAST(SUM(n) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS BIGINT) AS n_skeletons,
  CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS docs_in_collisions,
  CAST(SUM(n - 1) AS BIGINT) AS removable_docs,
  CAST(SUM(n - 1) * 1000000 // SUM(n) AS BIGINT) AS dup_ppm
FROM grp GROUP BY source ORDER BY source
"""


def q_padding_waste_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batching-efficiency report: token padding waste under (a) global
    padding to the capped max length vs (b) length-bucketed batching
    (64-token buckets) — the number that justifies bucketed batching in
    a training loader. Lengths cap at 512 (the packing contract);
    per-strategy padded-token totals are exact integers, so waste ppm
    is hash-exact. One tokenize pass, one bucket aggregation, one tiny
    global max broadcast."""
    docs = _t(spark, sf_dir, "documents")
    n_tok = F.least(TX.token_count(F.col("text")), F.lit(512))
    per = docs.select(n_tok.alias("len"))
    gmax = per.agg(F.max("len").alias("gmax"))
    bucket = (F.ceil(F.col("len").cast("double") / 64.0) * 64).cast("bigint")
    # loaders pad to the LONGEST sequence in the bucket, not the cap —
    # so bucket waste can never exceed global-max padding
    per_b = (
        per.withColumn("bucket_cap", F.greatest(bucket, F.lit(64)))
        .groupBy("bucket_cap")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("len").cast("bigint").alias("real_tokens"),
            F.max("len").cast("bigint").alias("bucket_max"),
        )
        .withColumn(
            "bucket_padded", (F.col("bucket_max") * F.col("n_docs")).cast("bigint")
        )
    )
    return (
        per_b.crossJoin(F.broadcast(gmax))
        .select(
            "bucket_cap", "n_docs", "real_tokens", "bucket_max",
            (F.col("bucket_padded") - F.col("real_tokens")).alias("bucket_waste"),
            (F.col("gmax").cast("bigint") * F.col("n_docs") - F.col("real_tokens"))
            .alias("global_waste"),
        )
        .withColumn(
            "saved_ppm",
            F.expr(
                "(global_waste - bucket_waste) * 1000000 div "
                "greatest(global_waste, 1)"
            ).cast("bigint"),
        )
        .orderBy("bucket_cap")
    )


_PADDING_SQL = f"""
WITH per AS (
  SELECT LEAST(len({_TOKS_SQL}), 512) AS len FROM documents),
gmax AS (SELECT MAX(len) AS gmax FROM per),
per_b AS (
  SELECT GREATEST(CAST(CEIL(CAST(len AS DOUBLE) / 64.0) * 64 AS BIGINT), 64)
      AS bucket_cap,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(len) AS BIGINT) AS real_tokens,
    CAST(MAX(len) AS BIGINT) AS bucket_max
  FROM per GROUP BY 1)
SELECT bucket_cap, n_docs, real_tokens, bucket_max,
  CAST(bucket_max * n_docs - real_tokens AS BIGINT) AS bucket_waste,
  CAST(gmax * n_docs - real_tokens AS BIGINT) AS global_waste,
  CAST((gmax * n_docs - real_tokens - (bucket_max * n_docs - real_tokens))
       * 1000000 // GREATEST(gmax * n_docs - real_tokens, 1) AS BIGINT)
    AS saved_ppm
FROM per_b CROSS JOIN gmax ORDER BY bucket_cap
"""


def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction (the DPO/RLHF data-prep shape):
    within each source shard, docs rank by the curriculum quality
    score; rank i pairs with rank n+1−i (best vs worst, inward) so
    every pair has the widest available margin without reuse. Emits
    chosen/rejected ids and the exact margin; pairs with zero margin
    are dropped (no learning signal). Ranking is one per-source window;
    the pairing is a per-source self-equi-join on the reflected rank —
    no cross-source traffic."""
    docs = _t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    n_toks = F.size(toks)
    stop_share = (
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"])))
        / F.greatest(n_toks, F.lit(1))
    )
    noise = (
        F.length(F.regexp_replace(F.lower("text"), "[a-z0-9 ]", ""))
        / F.greatest(F.length("text"), F.lit(1))
    )
    scored = docs.select(
        "doc_id", "source",
        F.round(stop_share - noise, 9).alias("q"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("q"), "doc_id")
    ranked = scored.select(
        "source", "doc_id", "q",
        F.row_number().over(w).alias("r"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    ).localCheckpoint(eager=True)
    a = ranked.alias("a")
    b = ranked.alias("b")
    pairs = a.join(
        b,
        (F.col("a.source") == F.col("b.source"))
        & (F.col("b.r") == F.col("a.n") + 1 - F.col("a.r"))
        & (F.col("a.r") < F.col("b.r")),
    )
    return (
        pairs.select(
            F.col("a.source").alias("source"),
            F.col("a.doc_id").alias("chosen_id"),
            F.col("b.doc_id").alias("rejected_id"),
            F.round(F.col("a.q") - F.col("b.q"), 9).alias("margin"),
        )
        .filter(F.col("margin") > 0)
        .orderBy("source", F.desc("margin"), "chosen_id")
    )


_PREFERENCE_SQL = f"""
WITH scored AS (
  SELECT doc_id, source,
    ROUND(
      len(list_filter({_TOKS_SQL},
        t -> t IN ({",".join(repr(w) for w in STOPWORDS["en"])})))
        / greatest(len({_TOKS_SQL}), 1)
      - length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
        / greatest(length(text), 1), 9) AS q
  FROM documents),
ranked AS (
  SELECT source, doc_id, q,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS r,
    COUNT(*) OVER (PARTITION BY source) AS n
  FROM scored)
SELECT a.source, a.doc_id AS chosen_id, b.doc_id AS rejected_id,
  ROUND(a.q - b.q, 9) AS margin
FROM ranked a JOIN ranked b
  ON a.source = b.source AND b.r = a.n + 1 - a.r AND a.r < b.r
WHERE ROUND(a.q - b.q, 9) > 0
ORDER BY a.source, margin DESC, chosen_id
"""


def q_burstiness_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness of user activity (Goh & Barabási 2008): per user, the
    interarrival-time coefficient stats fold into B = (σ−μ)/(σ+μ)
    (−1 = periodic, 0 = Poisson, →1 = bursty); the report aggregates
    the mean B per activity band (users bucketed by event count:
    <50 / 50-99 / ≥100). Interarrival seconds are exact integers, per-
    user moments are exact sums, and per-user B rounds to 1e-6 before
    the decimal cross-user mean — fully order-free. One user-ordered
    window + two aggregations."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact MICROsecond gaps: unix_timestamp would truncate to seconds
    # while DuckDB's epoch() keeps fractions — µs integers agree exactly
    gaps = (
        ev.select(
            "user_id",
            (F.unix_micros("ts")
             - F.unix_micros(F.lag("ts").over(w))).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    d19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    per_user = gaps.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(d19(F.col("gap"))).cast("double").alias("sg"),
        F.sum(d19(F.col("gap")) * d19(F.col("gap"))).cast("double").alias("sgg"),
    ).filter(F.col("n") >= 2)
    mu = F.col("sg") / F.col("n")
    sd = F.sqrt((F.col("sgg") - F.col("sg") * F.col("sg") / F.col("n")) / F.col("n"))
    b = F.round((sd - mu) / (sd + mu), 6)
    banded = per_user.select(
        F.when(F.col("n") < 50, F.lit("a_under_50"))
        .when(F.col("n") < 100, F.lit("b_50_to_99"))
        .otherwise(F.lit("c_100_plus")).alias("band"),
        b.alias("b"),
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.round(_dsum(F.col("b")) / F.count("*"), 6).alias("mean_burstiness"),
            F.min("b").alias("min_b"),
            F.max("b").alias("max_b"),
        )
        .orderBy("band")
    )


_BURSTINESS_SQL = """
WITH gaps AS (
  SELECT user_id,
    epoch_us(ts)
      - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      AS gap
  FROM events),
per_user AS (
  SELECT user_id, COUNT(*) AS n,
    CAST(SUM(CAST(gap AS DECIMAL(19,0))) AS DOUBLE) AS sg,
    CAST(SUM(CAST(gap AS DECIMAL(19,0)) * CAST(gap AS DECIMAL(19,0))) AS DOUBLE)
      AS sgg
  FROM gaps WHERE gap IS NOT NULL GROUP BY user_id HAVING COUNT(*) >= 2),
scored AS (
  SELECT CASE WHEN n < 50 THEN 'a_under_50'
              WHEN n < 100 THEN 'b_50_to_99'
              ELSE 'c_100_plus' END AS band,
    ROUND((SQRT((sgg - sg * sg / n) / n) - sg / n)
          / (SQRT((sgg - sg * sg / n) / n) + sg / n), 6) AS b
  FROM per_user)
SELECT band, CAST(COUNT(*) AS BIGINT) AS n_users,
  ROUND(CAST(SUM(CAST(b AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 6)
    AS mean_burstiness,
  MIN(b) AS min_b, MAX(b) AS max_b
FROM scored GROUP BY band ORDER BY band
"""


def q_capture_recapture_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimator — the dedup-theory tool for
    'how many users exist that we HAVEN'T seen': treat viewers as
    capture 1, clickers as capture 2; N̂ = (n1+1)(n2+1)/(m+1) − 1 with
    the Seber variance for a ±1.96σ interval. One user-grain dedup
    aggregation; everything after is scalar algebra on one row."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("int")).alias("c1"),
        F.max((F.col("event_type") == "click").cast("int")).alias("c2"),
    )
    base = per_user.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c1") * F.col("c2")).alias("m"),
        F.count("*").alias("n_observed"),
    )
    n1, n2, m = (F.col(c).cast("double") for c in ("n1", "n2", "m"))
    nhat = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    var = ((n1 + 1.0) * (n2 + 1.0) * (n1 - m) * (n2 - m)
           / ((m + 1.0) * (m + 1.0) * (m + 2.0)))
    half = 1.959963984540054 * F.sqrt(var)
    return base.select(
        F.col("n1").cast("bigint").alias("n_viewers"),
        F.col("n2").cast("bigint").alias("n_clickers"),
        F.col("m").cast("bigint").alias("n_both"),
        F.col("n_observed").cast("bigint").alias("n_observed"),
        F.round(nhat, 3).alias("n_hat"),
        F.round(nhat - half, 3).alias("ci_lo"),
        F.round(nhat + half, 3).alias("ci_hi"),
    )


_CAPTURE_SQL = """
WITH per_user AS (
  SELECT user_id,
    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c1,
    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c2
  FROM events GROUP BY user_id),
base AS (
  SELECT SUM(c1) AS n1, SUM(c2) AS n2, SUM(c1 * c2) AS m,
    COUNT(*) AS n_observed
  FROM per_user),
c AS (
  SELECT CAST(n1 AS DOUBLE) AS n1, CAST(n2 AS DOUBLE) AS n2,
    CAST(m AS DOUBLE) AS m, n_observed,
    (CAST(n1 AS DOUBLE) + 1.0) * (CAST(n2 AS DOUBLE) + 1.0)
      / (CAST(m AS DOUBLE) + 1.0) - 1.0 AS nhat,
    1.959963984540054 * SQRT(
      (CAST(n1 AS DOUBLE) + 1.0) * (CAST(n2 AS DOUBLE) + 1.0)
      * (CAST(n1 AS DOUBLE) - CAST(m AS DOUBLE))
      * (CAST(n2 AS DOUBLE) - CAST(m AS DOUBLE))
      / ((CAST(m AS DOUBLE) + 1.0) * (CAST(m AS DOUBLE) + 1.0)
         * (CAST(m AS DOUBLE) + 2.0))) AS half
  FROM base)
SELECT CAST(n1 AS BIGINT) AS n_viewers, CAST(n2 AS BIGINT) AS n_clickers,
  CAST(m AS BIGINT) AS n_both, CAST(n_observed AS BIGINT) AS n_observed,
  ROUND(nhat, 3) AS n_hat,
  ROUND(nhat - half, 3) AS ci_lo,
  ROUND(nhat + half, 3) AS ci_hi
FROM c
"""


def q_ljung_box_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau test on daily revenue — the inferential
    closure of the ACF family: Q = n(n+2)·Σ_{k≤14} r_k²/(n−k) vs the
    χ²(14) 95% critical value (a double literal), answering 'is this
    series white noise?' before any forecasting effort. The r_k
    pipeline is the acf_daily_revenue shape (exact decimal power sums,
    lag spine join); per-lag Q terms round to 1e-12 and sum as decimal
    so the 14-term fold is order-free. Two shuffles total."""
    o = _t(spark, sf_dir, "orders")
    daily = _daily_cents(o, "x")
    series = daily.select(
        F.row_number().over(Window.orderBy("d")).alias("i"), "x"
    ).localCheckpoint(eager=True)
    n_days = series.count()
    lags = spark.range(1, 15).select(F.col("id").cast("int").alias("k"))
    a, b = series.alias("a"), series.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b.i") == F.col("a.i") + F.col("k"))
        .select("k", F.col("a.x").alias("x"), F.col("b.x").alias("y"))
    )
    dsum = lambda col: F.sum(col.cast("decimal(38,0)")).cast("double")  # noqa: E731
    d19 = lambda col: col.cast("decimal(19,0)")  # noqa: E731
    psum = lambda u, v: F.sum(d19(u) * d19(v)).cast("double")  # noqa: E731
    sums = pairs.groupBy("k").agg(
        F.count("*").alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        psum(F.col("x"), F.col("y")).alias("sxy"),
        psum(F.col("x"), F.col("x")).alias("sxx"),
        psum(F.col("y"), F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    r6 = F.round(num / den, 6)
    term = F.round(
        r6 * r6 / (F.lit(float(n_days)) - F.col("k").cast("double")), 12
    )
    agg = sums.select("k", term.alias("t")).agg(
        F.sum(F.col("t").cast("decimal(38,18)")).cast("double").alias("ssum")
    )
    crit = 23.684791304840576  # chi2 ppf(0.95, df=14)
    q = F.lit(float(n_days)) * (F.lit(float(n_days)) + 2.0) * F.col("ssum")
    return agg.select(
        F.lit(n_days).cast("bigint").alias("n_days"),
        F.lit(14).cast("bigint").alias("df"),
        F.round(q, 6).alias("q_stat"),
        F.lit(crit).alias("critical_0_95"),
        (q > crit).alias("reject_white_noise"),
    )


_LJUNG_BOX_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x
  FROM orders GROUP BY 1),
series AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, x FROM daily),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM series),
lags AS (SELECT CAST(unnest(generate_series(1, 14)) AS INT) AS k),
pairs AS (
  SELECT k, a.x AS x, b.x AS y
  FROM series a CROSS JOIN lags
  JOIN series b ON b.i = a.i + k),
sums AS (
  SELECT k, COUNT(*) AS n,
    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS syy
  FROM pairs GROUP BY k),
terms AS (
  SELECT ROUND(
    ROUND((n * sxy - sx * sy)
          / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
    * ROUND((n * sxy - sx * sy)
          / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
    / (nd - k), 12) AS t
  FROM sums, nn),
agg AS (
  SELECT CAST(SUM(CAST(t AS DECIMAL(38,18))) AS DOUBLE) AS ssum FROM terms)
SELECT CAST(nd AS BIGINT) AS n_days, CAST(14 AS BIGINT) AS df,
  ROUND(nd * (nd + 2.0) * ssum, 6) AS q_stat,
  23.684791304840576 AS critical_0_95,
  nd * (nd + 2.0) * ssum > 23.684791304840576 AS reject_white_noise
FROM agg, nn
"""


def q_replacing_final_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplacingMergeTree + ``FINAL`` semantics with tombstones — the
    CDC-compaction read path: every event is an upsert of its user's
    profile (version = event_id); events with event_id % 10 = 0 are
    DELETE tombstones. FINAL = keep only the max-version row per user,
    and emit nothing if that row is a tombstone. Reports the upsert/
    delete/survivor census plus an exact survivors value-checksum. One
    max_by aggregation per key — no sort, no window, the merge-on-read
    collapse at any scale."""
    ev = _t(spark, sf_dir, "events")
    versioned = ev.select(
        "user_id",
        F.col("event_id").alias("version"),
        (F.col("event_id") % 10 == 0).alias("is_delete"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    final = versioned.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_versions"),
        F.sum(F.col("is_delete").cast("int")).cast("bigint").alias("n_deletes"),
        F.max_by("is_delete", "version").alias("last_is_delete"),
        F.max_by("cents", "version").alias("last_cents"),
    )
    return final.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("n_versions").cast("bigint").alias("n_upserts"),
        F.sum("n_deletes").cast("bigint").alias("n_tombstones"),
        F.sum((~F.col("last_is_delete")).cast("int")).cast("bigint").alias("n_survivors"),
        F.sum(F.when(~F.col("last_is_delete"), F.col("last_cents")).otherwise(F.lit(0)))
        .cast("bigint").alias("survivor_cents"),
    )


_REPLACING_SQL = """
WITH versioned AS (
  SELECT user_id, event_id AS version,
    event_id % 10 = 0 AS is_delete,
    CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events),
final AS (
  SELECT user_id, COUNT(*) AS n_versions,
    SUM(CASE WHEN is_delete THEN 1 ELSE 0 END) AS n_deletes,
    arg_max(is_delete, version) AS last_is_delete,
    arg_max(cents, version) AS last_cents
  FROM versioned GROUP BY user_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(SUM(n_versions) AS BIGINT) AS n_upserts,
  CAST(SUM(n_deletes) AS BIGINT) AS n_tombstones,
  CAST(SUM(CASE WHEN last_is_delete THEN 0 ELSE 1 END) AS BIGINT) AS n_survivors,
  CAST(SUM(CASE WHEN last_is_delete THEN 0 ELSE last_cents END) AS BIGINT)
    AS survivor_cents
FROM final
"""


def q_collapsing_merge_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree semantics: views carry sign +1, clicks −1;
    the merge collapses each user to SUM(sign) — pairs cancel, the
    residue is the uncollapsed state. Reports the distribution of net
    sign per user plus how many rows the collapse eliminates
    (rows_before − |net| summed) — the compaction-benefit census. One
    user aggregation + one tiny distribution rollup."""
    ev = _t(spark, sf_dir, "events")
    signed = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.when(F.col("event_type") == "view", F.lit(1)).otherwise(F.lit(-1)).alias("sign"),
    )
    per_user = signed.groupBy("user_id").agg(
        F.count("*").alias("n_rows"), F.sum("sign").alias("net")
    )
    return (
        per_user.groupBy(
            F.when(F.col("net") > 0, F.lit("views_surplus"))
            .when(F.col("net") < 0, F.lit("clicks_surplus"))
            .otherwise(F.lit("balanced")).alias("state")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("n_rows").cast("bigint").alias("rows_before"),
            F.sum(F.abs("net")).cast("bigint").alias("rows_after"),
            F.sum(F.col("n_rows") - F.abs("net")).cast("bigint").alias("rows_collapsed"),
        )
        .orderBy("state")
    )


_COLLAPSING_SQL = """
WITH signed AS (
  SELECT user_id,
    CASE WHEN event_type = 'view' THEN 1 ELSE -1 END AS sign
  FROM events WHERE event_type IN ('view', 'click')),
per_user AS (
  SELECT user_id, COUNT(*) AS n_rows, SUM(sign) AS net
  FROM signed GROUP BY user_id)
SELECT CASE WHEN net > 0 THEN 'views_surplus'
            WHEN net < 0 THEN 'clicks_surplus'
            ELSE 'balanced' END AS state,
  CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(n_rows) AS BIGINT) AS rows_before,
  CAST(SUM(ABS(net)) AS BIGINT) AS rows_after,
  CAST(SUM(n_rows - ABS(net)) AS BIGINT) AS rows_collapsed
FROM per_user GROUP BY 1 ORDER BY state
"""


def q_rolling_median_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling median over the trailing-7-day revenue frame — the
    robust moving-average alternative Spark has no built-in for (no
    exact percentile window). The frame's ≤7 cents values collect into
    a bounded array, sort row-locally, and the median picks middles
    with even/odd parity handled exactly — integer cents make the .5
    halves hash-stable. On the day-grain rollup this is O(days·7); the
    same shape partitions by series key at scale."""
    o = _t(spark, sf_dir, "orders")
    daily = _daily_cents(o)
    w = Window.orderBy("d").rowsBetween(-6, 0)
    arr = F.sort_array(F.collect_list("cents").over(w))
    mid_hi = ((F.size(arr) + 1) / 2).cast("int")
    mid_lo = (F.size(arr) / 2).cast("int")
    med = F.when(
        F.size(arr) % 2 == 1,
        F.element_at(arr, mid_hi).cast("double"),
    ).otherwise(
        (F.element_at(arr, mid_lo) + F.element_at(arr, mid_lo + 1)) / 2.0
    )
    return daily.select(
        "d",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.round(med / 100.0, 3).alias("median_7d"),
        F.size(arr).cast("bigint").alias("frame_days"),
    ).orderBy("d")


_ROLLING_MEDIAN_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1)
SELECT d, ROUND(cents / 100.0, 2) AS revenue,
  ROUND(MEDIAN(cents) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        / 100.0, 3) AS median_7d,
  CAST(COUNT(*) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
       AS BIGINT) AS frame_days
FROM daily ORDER BY d
"""


def q_rrf_fusion_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009 — the hybrid-search
    combiner): BM25 and Dirichlet query-likelihood rank the corpus for
    the same 3-term query, then fuse via RRF = Σ 1/(60+rank). Both
    scorers run off ONE row-local tf pass (no explode, no second scan);
    ranks are integer row_numbers over bit-identical score doubles, so
    the fused ordering is hash-exact. The shape generalizes: swap QL
    for an ANN ranking and this is the sparse+dense fusion every
    retrieval stack ships."""
    terms = ["stream", "filter", "vector"]
    docs = _t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))

    def _tf(term: str) -> F.Column:
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    per = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[_tf(t).alias(f"tf{i}") for i, t in enumerate(terms)],
    ).localCheckpoint(eager=True)
    stats = per.agg(
        F.count("*").alias("nd"),
        F.sum("dl").cast("double").alias("ctot"),
        *[F.sum(f"tf{i}").cast("double").alias(f"ctf{i}") for i in range(3)],
        *[F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}") for i in range(3)],
    )
    j = per.crossJoin(F.broadcast(stats))
    avgdl = F.col("ctot") / F.col("nd")
    bm25 = None
    ql = None
    for i in range(3):
        tf = F.col(f"tf{i}").cast("double")
        idf = F.log((F.col("nd") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5) + 1.0)
        sat = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (F.col("dl") / avgdl)))
        b_term = idf * sat
        q_term = F.log(
            (tf + 100.0 * (F.col(f"ctf{i}") / F.col("ctot"))) / (F.col("dl") + 100.0)
        )
        bm25 = b_term if bm25 is None else bm25 + b_term
        ql = q_term if ql is None else ql + q_term
    scored = j.select(
        "doc_id", bm25.alias("s_bm25"), ql.alias("s_ql")
    ).localCheckpoint(eager=True)
    # both global ranks are DISTRIBUTED row_numbers (operators/ranking:
    # range-partitioned sort + broadcast partition offsets — two narrow
    # ranged shuffles of (doc_id, score), never a single-partition window);
    # the fused top-20 is orderBy+limit = TakeOrderedAndProject
    r_b = RK.global_row_number(
        scored.select("doc_id", "s_bm25"),
        [F.desc("s_bm25"), "doc_id"], col_name="r_bm25",
    ).select("doc_id", "r_bm25")
    r_q = RK.global_row_number(
        scored.select("doc_id", "s_ql"),
        [F.desc("s_ql"), "doc_id"], col_name="r_ql",
    ).select("doc_id", "r_ql")
    ranked = r_b.join(r_q, "doc_id")
    rrf = 1.0 / (60.0 + F.col("r_bm25")) + 1.0 / (60.0 + F.col("r_ql"))
    fused = ranked.select(
        "doc_id",
        F.col("r_bm25").cast("bigint").alias("r_bm25"),
        F.col("r_ql").cast("bigint").alias("r_ql"),
        F.round(rrf, 9).alias("rrf_score"),
    )
    return RK.top_k(fused, [F.desc("rrf_score"), "doc_id"], 20)


_RRF_SQL = f"""
WITH per AS (
  SELECT doc_id, len({_TOKS_SQL}) AS dl,
    len(list_filter({_TOKS_SQL}, x -> x = 'stream')) AS tf0,
    len(list_filter({_TOKS_SQL}, x -> x = 'filter')) AS tf1,
    len(list_filter({_TOKS_SQL}, x -> x = 'vector')) AS tf2
  FROM documents),
stats AS (
  SELECT COUNT(*) AS nd, CAST(SUM(dl) AS DOUBLE) AS ctot,
    CAST(SUM(tf0) AS DOUBLE) AS ctf0, CAST(SUM(tf1) AS DOUBLE) AS ctf1,
    CAST(SUM(tf2) AS DOUBLE) AS ctf2,
    SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
    SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
    SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
  FROM per),
scored AS (
  SELECT doc_id,
    LN((nd - df0 + 0.5) / (df0 + 0.5) + 1.0)
      * (CAST(tf0 AS DOUBLE) * 2.2)
        / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (dl / (ctot / nd))))
    + LN((nd - df1 + 0.5) / (df1 + 0.5) + 1.0)
      * (CAST(tf1 AS DOUBLE) * 2.2)
        / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (dl / (ctot / nd))))
    + LN((nd - df2 + 0.5) / (df2 + 0.5) + 1.0)
      * (CAST(tf2 AS DOUBLE) * 2.2)
        / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (dl / (ctot / nd))))
      AS s_bm25,
    LN((CAST(tf0 AS DOUBLE) + 100.0 * (ctf0 / ctot)) / (dl + 100.0))
    + LN((CAST(tf1 AS DOUBLE) + 100.0 * (ctf1 / ctot)) / (dl + 100.0))
    + LN((CAST(tf2 AS DOUBLE) + 100.0 * (ctf2 / ctot)) / (dl + 100.0))
      AS s_ql
  FROM per, stats),
ranked AS (
  SELECT doc_id,
    ROW_NUMBER() OVER (ORDER BY s_bm25 DESC, doc_id) AS r_bm25,
    ROW_NUMBER() OVER (ORDER BY s_ql DESC, doc_id) AS r_ql
  FROM scored)
SELECT doc_id, CAST(r_bm25 AS BIGINT) AS r_bm25, CAST(r_ql AS BIGINT) AS r_ql,
  ROUND(1.0 / (60.0 + r_bm25) + 1.0 / (60.0 + r_ql), 9) AS rrf_score
FROM ranked ORDER BY rrf_score DESC, doc_id LIMIT 20
"""


def q_lag_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-engineering table for the forecaster: per day — revenue,
    lags 1/7/14/28, trailing-7-day exact mean, day-of-week, and the
    weekly-delta target. The supervised-learning matrix every
    gradient-boosted forecaster trains on; all columns are windows over
    the day-grain rollup (exact cents; the trailing mean divides a
    decimal sum once). Emits only rows with a full 28-day history so
    the matrix is dense — the train-ready contract."""
    o = _t(spark, sf_dir, "orders")
    daily = _daily_cents(o)
    w = Window.orderBy("d")
    w7 = w.rowsBetween(-6, 0)
    feat = daily.select(
        "d",
        F.col("cents").alias("y"),
        F.lag("cents", 1).over(w).alias("lag_1"),
        F.lag("cents", 7).over(w).alias("lag_7"),
        F.lag("cents", 14).over(w).alias("lag_14"),
        F.lag("cents", 28).over(w).alias("lag_28"),
        F.round(
            F.sum(F.col("cents").cast("decimal(38,10)")).over(w7).cast("double")
            / F.count("*").over(w7) / 100.0,
            6,
        ).alias("mean_7d"),
        (F.weekday("d") + 1).alias("isodow"),
    )
    return (
        feat.filter(F.col("lag_28").isNotNull())
        .select(
            "d",
            F.round(F.col("y") / 100.0, 2).alias("y"),
            F.round(F.col("lag_1") / 100.0, 2).alias("lag_1"),
            F.round(F.col("lag_7") / 100.0, 2).alias("lag_7"),
            F.round(F.col("lag_14") / 100.0, 2).alias("lag_14"),
            F.round(F.col("lag_28") / 100.0, 2).alias("lag_28"),
            "mean_7d",
            "isodow",
            F.round((F.col("y") - F.col("lag_7")) / 100.0, 2).alias("target_wow"),
        )
        .orderBy("d")
    )


_LAG_FEATURES_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1),
feat AS (
  SELECT d, cents AS y,
    LAG(cents, 1) OVER w AS lag_1,
    LAG(cents, 7) OVER w AS lag_7,
    LAG(cents, 14) OVER w AS lag_14,
    LAG(cents, 28) OVER w AS lag_28,
    ROUND(CAST(SUM(CAST(cents AS DECIMAL(38,10)))
        OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
      / COUNT(*) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      / 100.0, 6) AS mean_7d,
    isodow(d) AS isodow
  FROM daily WINDOW w AS (ORDER BY d))
SELECT d, ROUND(y / 100.0, 2) AS y,
  ROUND(lag_1 / 100.0, 2) AS lag_1,
  ROUND(lag_7 / 100.0, 2) AS lag_7,
  ROUND(lag_14 / 100.0, 2) AS lag_14,
  ROUND(lag_28 / 100.0, 2) AS lag_28,
  mean_7d, isodow,
  ROUND((y - lag_7) / 100.0, 2) AS target_wow
FROM feat WHERE lag_28 IS NOT NULL ORDER BY d
"""


def q_bucketed_percentile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-percentile accuracy audit (the quantileTiming
    trade-off): ship delay (receipt-free proxy: shipdate − orderdate
    days) p50/p90/p99 computed (a) EXACTLY via order statistics and (b)
    from a 64-bucket fixed-width histogram with linear interpolation —
    reporting both and the error in days. The histogram path is the
    O(64)-state mergeable shape a 100 TB rollup would persist; the
    exact path costs a sort. Integer day delays make the exact side
    hash-trivial; the interpolated estimate is a fixed IEEE chain.
    Sketch dual: ship_delay_quantile_sketch (approx_percentile, the
    named 100 TB path)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    delays = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("delay")
    ).localCheckpoint(eager=True)
    n = delays.count()
    qs_ = [(50, 0.50), (90, 0.90), (99, 0.99)]
    # exact: k-th order statistic at ceil(q*n), computed DISTRIBUTED as
    # "min delay whose cumulative count >= k" over the per-value count
    # aggregate — delays are integer days with a schema-bounded domain
    # (shipdate − orderdate ∈ [1, 121] in TPC-H), so the cumulative
    # window rides a <=122-row frame, never the fact table
    vc = delays.groupBy("delay").agg(F.count("*").alias("c"))
    wv = Window.orderBy("delay").rowsBetween(Window.unboundedPreceding, 0)
    cumv = vc.withColumn("cumc", F.sum("c").over(wv)).localCheckpoint(eager=True)
    exact = None
    for label, q in qs_:
        k = int(q * n) if (q * n).is_integer() else int(q * n) + 1
        pick = (
            cumv.filter(F.col("cumc") >= max(k, 1))
            .orderBy("delay")
            .limit(1)
            .select(F.lit(label).alias("p"), F.col("delay").alias("exact_days"))
        )
        exact = pick if exact is None else exact.unionByName(pick)
    # histogram: 64 buckets over [min, max]
    rng = delays.agg(
        F.min("delay").alias("lo"), F.max("delay").alias("hi")
    )
    hist = (
        delays.crossJoin(F.broadcast(rng))
        .select(
            F.least(
                F.floor(
                    (F.col("delay") - F.col("lo")).cast("double")
                    / (F.col("hi") - F.col("lo")) * 64
                ).cast("int"),
                F.lit(63),
            ).alias("b"),
            "lo", "hi",
        )
        .groupBy("b", "lo", "hi")
        .agg(F.count("*").alias("c"))
    )
    wcum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("c").over(wcum)).localCheckpoint(eager=True)
    est = None
    for label, q in qs_:
        target = q * n
        first_ge = (
            cum.filter(F.col("cum") >= F.lit(target))
            .orderBy("b")
            .limit(1)
            .select(
                F.lit(label).alias("p"),
                F.round(
                    F.col("lo")
                    + (F.col("b")
                       + (F.lit(target) - (F.col("cum") - F.col("c")))
                       / F.col("c"))
                    * (F.col("hi") - F.col("lo")) / 64.0,
                    6,
                ).alias("hist_days"),
            )
        )
        est = first_ge if est is None else est.unionByName(first_ge)
    return (
        exact.join(est, "p")
        .select(
            "p",
            F.col("exact_days").cast("bigint").alias("exact_days"),
            "hist_days",
            F.round(F.abs(F.col("hist_days") - F.col("exact_days")), 6)
            .alias("abs_err_days"),
        )
        .orderBy("p")
    )


_BUCKETED_PCTL_SQL = """
WITH delays AS (
  SELECT date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
    AS delay
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
nn AS (SELECT COUNT(*) AS n FROM delays),
ranked AS (
  SELECT delay, ROW_NUMBER() OVER (ORDER BY delay) AS rn FROM delays),
exact AS (
  SELECT p, delay AS exact_days FROM (
    SELECT 50 AS p,
      CAST(CASE WHEN 0.50 * n = FLOOR(0.50 * n) THEN 0.50 * n
           ELSE FLOOR(0.50 * n) + 1 END AS BIGINT) AS k FROM nn
    UNION ALL
    SELECT 90,
      CAST(CASE WHEN 0.90 * n = FLOOR(0.90 * n) THEN 0.90 * n
           ELSE FLOOR(0.90 * n) + 1 END AS BIGINT) FROM nn
    UNION ALL
    SELECT 99,
      CAST(CASE WHEN 0.99 * n = FLOOR(0.99 * n) THEN 0.99 * n
           ELSE FLOOR(0.99 * n) + 1 END AS BIGINT) FROM nn) ks
  JOIN ranked ON rn = GREATEST(k, 1)),
rng AS (SELECT MIN(delay) AS lo, MAX(delay) AS hi FROM delays),
hist AS (
  SELECT LEAST(CAST(FLOOR(CAST(delay - lo AS DOUBLE) / (hi - lo) * 64) AS INT),
               63) AS b,
    lo, hi, COUNT(*) AS c
  FROM delays CROSS JOIN rng GROUP BY 1, 2, 3),
cum AS (
  SELECT *, SUM(c) OVER (ORDER BY b
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist),
est AS (
  SELECT p, hist_days FROM (
    SELECT q.p, q.target,
      ROUND(lo + (b + (q.target - (cum - c)) / c) * (hi - lo) / 64.0, 6)
        AS hist_days,
      ROW_NUMBER() OVER (PARTITION BY q.p ORDER BY b) AS pick
    FROM cum
    JOIN (SELECT 50 AS p, 0.50 * n AS target FROM nn
          UNION ALL SELECT 90, 0.90 * n FROM nn
          UNION ALL SELECT 99, 0.99 * n FROM nn) q
      ON cum >= q.target) z
  WHERE pick = 1)
SELECT exact.p AS p, CAST(exact_days AS BIGINT) AS exact_days, hist_days,
  ROUND(ABS(hist_days - exact_days), 6) AS abs_err_days
FROM exact JOIN est ON exact.p = est.p
ORDER BY exact.p
"""


def q_dp_noise_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy release calibration: per-nation customer
    counts through the Laplace mechanism (ε=1, sensitivity 1), with the
    noise drawn from a DETERMINISTIC md5-hash uniform (the privacy
    engineer's repro harness — swap the hash for a CSPRNG in
    production). Inverse-CDF: noise = −b·sign(u−½)·ln(1−2|u−½|).
    Reports true vs released counts and the absolute error the ε buys.
    One aggregation; noise is row-local scalar math on 25 rows."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    per = (
        c.groupBy("c_nationkey")
        .agg(F.count("*").alias("true_count"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    u = (
        F.conv(F.substring(F.md5(F.col("n_nationkey").cast("string")), 1, 13), 16, 10)
        .cast("double") / F.lit(float(16 ** 13))
    )
    centered = u - 0.5
    b = 1.0  # sensitivity/epsilon
    noise = -b * F.signum(centered) * F.log(1.0 - 2.0 * F.abs(centered))
    released = F.greatest(F.round(F.col("true_count") + noise, 0), F.lit(0.0))
    return per.select(
        "n_name",
        F.col("true_count").cast("bigint").alias("true_count"),
        F.round(noise, 6).alias("noise"),
        released.cast("bigint").alias("released_count"),
        F.abs(released.cast("bigint") - F.col("true_count"))
        .cast("bigint").alias("abs_err"),
    ).orderBy("n_name")


_DP_NOISE_SQL = """
WITH per AS (
  SELECT n_name, n_nationkey, COUNT(*) AS true_count
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2),
noised AS (
  SELECT n_name, true_count,
    -1.0 * SIGN(('0x' || substr(md5(CAST(n_nationkey AS VARCHAR)), 1, 13))::BIGINT
                / CAST(POWER(16, 13) AS DOUBLE) - 0.5)
      * LN(1.0 - 2.0 * ABS(('0x' || substr(md5(CAST(n_nationkey AS VARCHAR)), 1, 13))::BIGINT
                           / CAST(POWER(16, 13) AS DOUBLE) - 0.5)) AS noise
  FROM per)
SELECT n_name, CAST(true_count AS BIGINT) AS true_count,
  ROUND(noise, 6) AS noise,
  CAST(GREATEST(ROUND(true_count + noise, 0), 0.0) AS BIGINT) AS released_count,
  CAST(ABS(CAST(GREATEST(ROUND(true_count + noise, 0), 0.0) AS BIGINT)
           - true_count) AS BIGINT) AS abs_err
FROM noised ORDER BY n_name
"""


def q_quantile_normalization_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of per-source document-length
    distributions onto the pooled distribution (the cross-batch
    harmonization trick from genomics, applied to corpus shards):
    each doc's length maps to the pooled order statistic at its
    within-source quantile, idx = ceil(rank·N/n_s). Reports per source
    the before/after mean lengths — after normalization every shard
    sees the same distribution. The pooled rank is the DISTRIBUTED
    global row_number (operators/ranking: range-partitioned sort +
    broadcast partition offsets — no single-partition window); the
    per-source rank stays a partitioned window; one index equi-join
    (never a distribution-wide broadcast)."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.select("source", "doc_id", TX.token_count(F.col("text")).alias("len"))
    pooled = RK.global_row_number(
        per.select("len", "doc_id"), ["len", "doc_id"], col_name="rn"
    ).select("rn", F.col("len").alias("pooled_len"))
    n_total = pooled.count()
    w_src = Window.partitionBy("source").orderBy("len", "doc_id")
    ranked = per.select(
        "source", "len",
        F.row_number().over(w_src).alias("rs"),
        F.count("*").over(Window.partitionBy("source")).alias("ns"),
    )
    idx = F.ceil(F.col("rs").cast("double") * n_total / F.col("ns")).cast("int")
    mapped = ranked.withColumn("rn", idx).join(pooled, "rn")
    return (
        mapped.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(
                F.sum(F.col("len").cast("decimal(38,10)")).cast("double")
                / F.count("*"), 6,
            ).alias("mean_len_before"),
            F.round(
                F.sum(F.col("pooled_len").cast("decimal(38,10)")).cast("double")
                / F.count("*"), 6,
            ).alias("mean_len_after"),
            F.min("pooled_len").cast("bigint").alias("min_after"),
            F.max("pooled_len").cast("bigint").alias("max_after"),
        )
        .orderBy("source")
    )


_QNORM_SQL = f"""
WITH per AS (
  SELECT source, doc_id, len({_TOKS_SQL}) AS len FROM documents),
pooled AS (
  SELECT ROW_NUMBER() OVER (ORDER BY len, doc_id) AS rn,
    len AS pooled_len
  FROM per),
nn AS (SELECT COUNT(*) AS n FROM per),
ranked AS (
  SELECT source, len,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY len, doc_id) AS rs,
    COUNT(*) OVER (PARTITION BY source) AS ns
  FROM per),
mapped AS (
  SELECT source, len, pooled_len
  FROM ranked, nn
  JOIN pooled
    ON pooled.rn = CAST(CEIL(CAST(rs AS DOUBLE) * n / ns) AS INT))
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  ROUND(CAST(SUM(CAST(len AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 6)
    AS mean_len_before,
  ROUND(CAST(SUM(CAST(pooled_len AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 6)
    AS mean_len_after,
  CAST(MIN(pooled_len) AS BIGINT) AS min_after,
  CAST(MAX(pooled_len) AS BIGINT) AS max_after
FROM mapped GROUP BY source ORDER BY source
"""


def q_changepoint_binseg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-split binary segmentation changepoint on daily revenue:
    the split day t* maximizing the scaled mean-shift statistic
    sqrt(k(n−k)/n)·|mean_left − mean_right| — the complement of CUSUM
    (which flags drift; this NAMES the break). Prefix sums from one
    ordered window give every candidate split in one pass; means are
    exact-decimal sums divided once, so the argmax is hash-stable
    (ties break on earliest day). Emits the chosen split with both
    segment means and the statistic."""
    o = _t(spark, sf_dir, "orders")
    daily = _daily_cents(o)
    w = Window.orderBy("d")
    wall = Window.partitionBy()
    pre = daily.select(
        "d",
        F.row_number().over(w).alias("k"),
        F.sum(F.col("cents").cast("decimal(38,0)")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("double").alias("pk"),
    ).withColumn("n", F.count("*").over(wall)).withColumn(
        "tot", F.max(F.col("pk")).over(wall)
    )
    k, n = F.col("k").cast("double"), F.col("n").cast("double")
    mean_l = F.col("pk") / k
    mean_r = (F.col("tot") - F.col("pk")) / (n - k)
    stat = F.sqrt(k * (n - k) / n) * F.abs(mean_l - mean_r)
    cand = pre.filter(F.col("k") < F.col("n")).select(
        "d",
        F.col("k").cast("bigint").alias("split_k"),
        F.round((mean_l / 100.0), 6).alias("mean_before"),
        F.round((mean_r / 100.0), 6).alias("mean_after"),
        F.round(stat, 6).alias("stat"),
    )
    return cand.orderBy(F.desc("stat"), "d").limit(1)


_BINSEG_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1),
pre AS (
  SELECT d,
    ROW_NUMBER() OVER (ORDER BY d) AS k,
    CAST(SUM(CAST(cents AS DECIMAL(38,0))) OVER (ORDER BY d
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS pk
  FROM daily),
ext AS (
  SELECT *, COUNT(*) OVER () AS n, MAX(pk) OVER () AS tot FROM pre),
cand AS (
  SELECT d, CAST(k AS BIGINT) AS split_k,
    ROUND(pk / k / 100.0, 6) AS mean_before,
    ROUND((tot - pk) / (n - k) / 100.0, 6) AS mean_after,
    ROUND(SQRT(CAST(k AS DOUBLE) * (n - k) / n)
          * ABS(pk / k - (tot - pk) / (n - k)), 6) AS stat
  FROM ext WHERE k < n)
SELECT * FROM cand ORDER BY stat DESC, d LIMIT 1
"""


def q_seasonal_strength_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-strength diagnostics (Hyndman's F_s): after the classical
    decomposition (centered 7-day trend, weekday seasonal, residual),
    F_s = max(0, 1 − Var(resid)/Var(seasonal+resid)) and the trend
    twin F_t = max(0, 1 − Var(resid)/Var(trend+resid)) — the two
    numbers that say whether the forecaster should carry weekly
    seasonality and trend terms at all. Components round to 1e-6 (the
    decompose query's contract) and the variances are decimal power
    sums of those rounded values — order-free and hash-exact."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,10)")).cast("double"), 2
        ).alias("y")
    )
    wtrend = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.withColumn("n_win", F.count("*").over(wtrend)).withColumn(
        "trend",
        F.round(
            F.sum(F.col("y").cast("decimal(38,10)")).over(wtrend).cast("double")
            / F.col("n_win"),
            6,
        ),
    )
    detr = trended.withColumn("dt", F.round(F.col("y") - F.col("trend"), 6))
    dow_means = (
        detr.groupBy((F.weekday("day") + F.lit(1)).alias("isodow"))
        .agg(
            F.round(
                F.sum(F.col("dt").cast("decimal(38,10)")).cast("double")
                / F.count("*"),
                6,
            ).alias("s_raw")
        )
    )
    grand = dow_means.agg(
        F.round(
            F.sum(F.col("s_raw").cast("decimal(38,10)")).cast("double")
            / F.count("*"),
            6,
        ).alias("g")
    )
    season = dow_means.crossJoin(F.broadcast(grand)).select(
        "isodow", F.round(F.col("s_raw") - F.col("g"), 6).alias("seasonal")
    )
    full = detr.join(
        F.broadcast(season), (F.weekday("day") + 1) == F.col("isodow")
    ).select(
        "day",
        "seasonal",
        F.col("trend"),
        F.round(F.col("y") - F.col("trend") - F.col("seasonal"), 6).alias("resid"),
    )
    d10 = lambda c: c.cast("decimal(38,10)")  # noqa: E731
    var_of = lambda c: (  # decimal power sums -> double variance  # noqa: E731
        F.sum(d10(c) * d10(c)).cast("double") / F.count("*")
        - (F.sum(d10(c)).cast("double") / F.count("*"))
        * (F.sum(d10(c)).cast("double") / F.count("*"))
    )
    agg = full.agg(
        F.count("*").alias("n_days"),
        var_of(F.col("resid")).alias("vr"),
        var_of(F.col("seasonal") + F.col("resid")).alias("vsr"),
        var_of(F.col("trend") + F.col("resid")).alias("vtr"),
    )
    return agg.select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.round(F.greatest(F.lit(0.0), 1.0 - F.col("vr") / F.col("vsr")), 6)
        .alias("seasonal_strength"),
        F.round(F.greatest(F.lit(0.0), 1.0 - F.col("vr") / F.col("vtr")), 6)
        .alias("trend_strength"),
    )


_SEASONAL_STRENGTH_SQL = """
WITH daily AS (
  SELECT o_orderdate AS day,
    ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE), 2) AS y
  FROM orders GROUP BY 1),
trended AS (
  SELECT day, y,
    ROUND(CAST(SUM(CAST(y AS DECIMAL(38,10))) OVER w AS DOUBLE)
          / COUNT(*) OVER w, 6) AS trend
  FROM daily WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
detr AS (
  SELECT *, ROUND(y - trend, 6) AS dt FROM trended),
dow_means AS (
  SELECT isodow(CAST(day AS DATE)) AS isodow,
    ROUND(CAST(SUM(CAST(dt AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 6) AS s_raw
  FROM detr GROUP BY 1),
grand AS (
  SELECT ROUND(CAST(SUM(CAST(s_raw AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 6)
    AS g
  FROM dow_means),
season AS (
  SELECT isodow, ROUND(s_raw - g, 6) AS seasonal
  FROM dow_means CROSS JOIN grand),
full_t AS (
  SELECT ROUND(y - trend - seasonal, 6) AS resid, seasonal, trend
  FROM detr JOIN season ON isodow(CAST(day AS DATE)) = season.isodow),
agg AS (
  SELECT COUNT(*) AS n_days,
    CAST(SUM(CAST(resid AS DECIMAL(38,10)) * CAST(resid AS DECIMAL(38,10)))
         AS DOUBLE) / COUNT(*)
      - (CAST(SUM(CAST(resid AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*))
        * (CAST(SUM(CAST(resid AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*)) AS vr,
    CAST(SUM(CAST(seasonal + resid AS DECIMAL(38,10))
             * CAST(seasonal + resid AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*)
      - (CAST(SUM(CAST(seasonal + resid AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*))
        * (CAST(SUM(CAST(seasonal + resid AS DECIMAL(38,10))) AS DOUBLE)
           / COUNT(*)) AS vsr,
    CAST(SUM(CAST(trend + resid AS DECIMAL(38,10))
             * CAST(trend + resid AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*)
      - (CAST(SUM(CAST(trend + resid AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*))
        * (CAST(SUM(CAST(trend + resid AS DECIMAL(38,10))) AS DOUBLE)
           / COUNT(*)) AS vtr
  FROM full_t)
SELECT CAST(n_days AS BIGINT) AS n_days,
  ROUND(GREATEST(0.0, 1.0 - vr / vsr), 6) AS seasonal_strength,
  ROUND(GREATEST(0.0, 1.0 - vr / vtr), 6) AS trend_strength
FROM agg
"""


def q_brand_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price elasticity of demand per part brand: log-log OLS of
    quantity on effective price factor (1 − discount) over line items —
    the econometric read of the discount ladder (elasticity < 0 means
    discounts move volume). Log terms round to 1e-9 and every OLS sum
    is a decimal accumulation of those rounded values, so the per-brand
    fold is partition-order-free; the slope algebra runs once per
    brand. Top-10 brands by support."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    x = F.round(F.log(1.0 - F.col("l_discount")), 9)
    y = F.round(F.log(F.col("l_quantity")), 9)
    # (19,9) operands: their product is decimal(38,18) — the widest shape
    # BOTH engines keep exact (28,12)x(28,12) would overflow 38 digits and
    # each engine truncates the scale differently (the stats_moments lesson)
    d18 = lambda c: c.cast("decimal(19,9)")  # noqa: E731
    per = j.select(F.col("p_brand").alias("brand"), x.alias("x"), y.alias("y"))
    agg = per.groupBy("brand").agg(
        F.count("*").alias("n"),
        F.sum(d18(F.col("x"))).cast("double").alias("sx"),
        F.sum(d18(F.col("y"))).cast("double").alias("sy"),
        F.sum(d18(F.col("x")) * d18(F.col("x"))).cast("double").alias("sxx"),
        F.sum(d18(F.col("x")) * d18(F.col("y"))).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    return (
        agg.select(
            "brand",
            F.col("n").cast("bigint").alias("n_lines"),
            F.round(slope, 6).alias("elasticity"),
            F.round(intercept, 6).alias("log_base_qty"),
        )
        .orderBy(F.desc("n_lines"), "brand")
        .limit(10)
    )


_ELASTICITY_SQL = """
WITH per AS (
  SELECT p_brand AS brand,
    ROUND(LN(1.0 - l_discount), 9) AS x,
    ROUND(LN(l_quantity), 9) AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey),
agg AS (
  SELECT brand, COUNT(*) AS n,
    CAST(SUM(CAST(x AS DECIMAL(19,9))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(y AS DECIMAL(19,9))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(x AS DECIMAL(19,9)) * CAST(x AS DECIMAL(19,9))) AS DOUBLE)
      AS sxx,
    CAST(SUM(CAST(x AS DECIMAL(19,9)) * CAST(y AS DECIMAL(19,9))) AS DOUBLE)
      AS sxy
  FROM per GROUP BY brand)
SELECT brand, CAST(n AS BIGINT) AS n_lines,
  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS elasticity,
  ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
    AS log_base_qty
FROM agg ORDER BY n_lines DESC, brand LIMIT 10
"""


def q_wasserstein_shard_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein (earth-mover) distance between each source
    shard's document-length distribution and the pooled corpus — the
    drift metric that catches a crawler or filter change shifting a
    shard's length profile. Exact discrete W1 via quantile alignment:
    shard rank r maps to pooled order statistic ceil(r·N/n_s) (the
    quantile-normalization index) and W1 = mean |len − pooled_len| —
    integer token counts make the metric hash-exact. Pooled rank =
    distributed global row_number (operators/ranking, range-partitioned
    + broadcast offsets); per-source rank = partitioned window; one
    index equi-join; nothing corpus-wide broadcasts or single-tasks."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.select("source", "doc_id", TX.token_count(F.col("text")).alias("len"))
    pooled = RK.global_row_number(
        per.select("len", "doc_id"), ["len", "doc_id"], col_name="rn"
    ).select("rn", F.col("len").alias("pooled_len"))
    n_total = pooled.count()
    w_src = Window.partitionBy("source").orderBy("len", "doc_id")
    ranked = per.select(
        "source", "len",
        F.row_number().over(w_src).alias("rs"),
        F.count("*").over(Window.partitionBy("source")).alias("ns"),
    )
    idx = F.ceil(F.col("rs").cast("double") * n_total / F.col("ns")).cast("int")
    mapped = ranked.withColumn("rn", idx).join(pooled, "rn")
    return (
        mapped.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.abs(F.col("len") - F.col("pooled_len")))
            .cast("bigint").alias("total_moved_tokens"),
        )
        .withColumn(
            "w1_ppm_tokens",
            F.expr("total_moved_tokens * 1000000 div n_docs").cast("bigint"),
        )
        .orderBy(F.desc("w1_ppm_tokens"), "source")
    )


_WASSERSTEIN_SQL = f"""
WITH per AS (
  SELECT source, doc_id, len({_TOKS_SQL}) AS len FROM documents),
pooled AS (
  SELECT ROW_NUMBER() OVER (ORDER BY len, doc_id) AS rn, len AS pooled_len
  FROM per),
nn AS (SELECT COUNT(*) AS n FROM per),
ranked AS (
  SELECT source, len,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY len, doc_id) AS rs,
    COUNT(*) OVER (PARTITION BY source) AS ns
  FROM per),
mapped AS (
  SELECT source, len, pooled_len
  FROM ranked, nn
  JOIN pooled ON pooled.rn = CAST(CEIL(CAST(rs AS DOUBLE) * n / ns) AS INT))
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(ABS(len - pooled_len)) AS BIGINT) AS total_moved_tokens,
  CAST(SUM(ABS(len - pooled_len)) * 1000000 // COUNT(*) AS BIGINT)
    AS w1_ppm_tokens
FROM mapped GROUP BY source
ORDER BY w1_ppm_tokens DESC, source
"""


def q_kalman_local_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kalman filter, local-level model (random walk + observation
    noise; q=1e10, r=1e12 cents², fixed) over daily revenue — the
    probabilistic smoother the forecasting family lacked: predict-var,
    gain K = P/(P+r), filtered level, posterior variance per step. The
    recurrence is BIT-EXACT across engines (applyInPandas vs recursive
    CTE, identical IEEE op order — the croston/theta contract, no
    rounding slack); output is the last 30 filtered days plus gain and
    ±95% band. One task per series at scale (the forecaster's
    partitioning)."""
    import pandas as pd

    o = _t(spark, sf_dir, "orders")
    daily = _daily_cents(o)
    q_var, r_var = 1e10, 1e12

    def _kalman(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        out = {"d": [], "y": [], "level": [], "gain": [], "band": []}
        level = var = None
        for i in range(len(pdf)):
            y = float(pdf["cents"][i])
            if level is None:
                level, var = y, r_var
            else:
                pvar = var + q_var
                k = pvar / (pvar + r_var)
                level = level + k * (y - level)
                var = (1.0 - k) * pvar
                out_k = k
            import math

            out["d"].append(pdf["d"][i])
            out["y"].append(y / 100.0)
            out["level"].append(level / 100.0)
            out["gain"].append(0.0 if i == 0 else out_k)
            # math.sqrt is IEEE-correctly-rounded like SQL SQRT; x**0.5
            # routes through pow() and is NOT guaranteed bit-identical
            out["band"].append(1.959963984540054 * math.sqrt(var) / 100.0)
        return pd.DataFrame(out).tail(30)

    return (
        daily.groupBy(F.lit(1).alias("_g"))
        .applyInPandas(
            lambda _, pdf: _kalman(pdf),
            "d date, y double, level double, gain double, band double",
        )
        .orderBy("d")
    )


_KALMAN_SQL = """
WITH RECURSIVE daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1),
idx AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS rn, d, y FROM daily),
kf(rn, d, y, level, var, gain) AS (
  SELECT rn, d, CAST(y AS DOUBLE), CAST(y AS DOUBLE), 1e12,
    CAST(0.0 AS DOUBLE)
  FROM idx WHERE rn = 1
  UNION ALL
  SELECT i.rn, i.d, CAST(i.y AS DOUBLE),
    k.level + ((k.var + 1e10) / ((k.var + 1e10) + 1e12))
      * (CAST(i.y AS DOUBLE) - k.level),
    (1.0 - (k.var + 1e10) / ((k.var + 1e10) + 1e12)) * (k.var + 1e10),
    (k.var + 1e10) / ((k.var + 1e10) + 1e12)
  FROM kf k JOIN idx i ON i.rn = k.rn + 1),
nn AS (SELECT MAX(rn) AS n FROM idx)
SELECT d, y / 100.0 AS y, level / 100.0 AS level, gain,
  1.959963984540054 * SQRT(var) / 100.0 AS band
FROM kf, nn WHERE rn > n - 30 ORDER BY d
"""


def q_lttb_downsample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013 —
    ClickHouse ships it as ``largestTriangleThreeBuckets``), completing
    the M4 pair: first/last anchored, 25 interior buckets, each
    selecting the point maximizing the triangle area with the PREVIOUS
    selection and the NEXT bucket's average — the perceptually-best
    27-point rendition of the daily series. The selection chain is
    inherently sequential, so Spark runs it in one applyInPandas task
    over the day rollup (the croston/theta contract) while the oracle
    replays the identical IEEE area argmax in a recursive CTE — exact
    doubles, exact ties (lowest day wins), no rounding slack in the
    selection."""
    import pandas as pd

    o = _t(spark, sf_dir, "orders")
    daily = _daily_cents(o)
    B_INNER = 25

    def _lttb(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        xs = list(range(1, len(pdf) + 1))
        ys = [int(v) for v in pdf["cents"]]
        n = len(xs)
        bucket_of = lambda rn: (  # noqa: E731
            0 if rn == 1 else (B_INNER + 1 if rn == n
                               else 1 + (rn - 2) * B_INNER // (n - 2))
        )
        members = {}
        for rn in xs:
            members.setdefault(bucket_of(rn), []).append(rn)
        avgs = {
            b: (sum(m) / len(m), sum(ys[rn - 1] for rn in m) / len(m))
            for b, m in members.items()
        }
        sel = [(1, float(xs[0]), float(ys[0]))]
        for k in range(1, B_INNER + 1):
            sx, sy = sel[-1][1], sel[-1][2]
            ax, ay = avgs[k + 1]
            best = None
            for rn in members[k]:
                x, y = float(rn), float(ys[rn - 1])
                area2 = abs((sx - ax) * (y - sy) - (sx - x) * (ay - sy))
                if best is None or area2 > best[0]:
                    best = (area2, rn, x, y)
            sel.append((best[1], best[2], best[3]))
        sel.append((n, float(n), float(ys[-1])))
        out = pd.DataFrame(
            {
                "k": list(range(len(sel))),
                "d": [pdf["d"][rn - 1] for rn, _, _ in sel],
                "revenue": [round(y / 100.0, 2) for _, _, y in sel],
            }
        )
        return out

    return (
        daily.groupBy(F.lit(1).alias("_g"))
        .applyInPandas(
            lambda _, pdf: _lttb(pdf), "k int, d date, revenue double"
        )
        .orderBy("k")
    )


def _lttb_area_sql(p: str, a: str) -> str:
    """Triangle-area×2 between the running selection (s.sx, s.sy), a
    candidate point alias `p`, and a next-bucket average alias `a` —
    ONE expression string so the argmax and its MAX twin can't drift."""
    return (
        f"ABS((s.sx - {a}.ax) * (CAST({p}.y AS DOUBLE) - s.sy)"
        f" - (s.sx - CAST({p}.x AS DOUBLE)) * ({a}.ay - s.sy))"
    )


_LTTB_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1),
idx AS (
  SELECT ROW_NUMBER() OVER (ORDER BY d) AS rn, d, cents FROM daily),
nn AS (SELECT COUNT(*) AS n FROM idx),
bk AS (
  SELECT rn AS x, cents AS y, d,
    CASE WHEN rn = 1 THEN 0 WHEN rn = n THEN 26
         ELSE 1 + (rn - 2) * 25 // (n - 2) END AS b
  FROM idx, nn),
avgs AS (
  SELECT b, CAST(SUM(x) AS DOUBLE) / COUNT(*) AS ax,
    CAST(SUM(y) AS DOUBLE) / COUNT(*) AS ay
  FROM bk GROUP BY b),
sel(k, srn, sx, sy) AS (
  SELECT 0, x, CAST(x AS DOUBLE), CAST(y AS DOUBLE) FROM bk WHERE b = 0
  UNION ALL
  SELECT s.k + 1,
    (SELECT MIN(p.rn) FROM (SELECT x AS rn, x, y, b FROM bk) p, avgs a
      WHERE p.b = s.k + 1 AND a.b = s.k + 2
        AND {_lttb_area_sql('p', 'a')} =
          (SELECT MAX({_lttb_area_sql('p', 'a')})
           FROM (SELECT x AS rn, x, y, b FROM bk) p, avgs a
           WHERE p.b = s.k + 1 AND a.b = s.k + 2)),
    (SELECT CAST(x AS DOUBLE) FROM bk p2, avgs a2
      WHERE a2.b = s.k + 2 AND p2.b = s.k + 1
        AND {_lttb_area_sql('p2', 'a2')} =
          (SELECT MAX({_lttb_area_sql('p', 'a')})
           FROM (SELECT x AS rn, x, y, b FROM bk) p, avgs a
           WHERE p.b = s.k + 1 AND a.b = s.k + 2)
      ORDER BY p2.x LIMIT 1),
    (SELECT CAST(y AS DOUBLE) FROM bk p2, avgs a2
      WHERE a2.b = s.k + 2 AND p2.b = s.k + 1
        AND {_lttb_area_sql('p2', 'a2')} =
          (SELECT MAX({_lttb_area_sql('p', 'a')})
           FROM (SELECT x AS rn, x, y, b FROM bk) p, avgs a
           WHERE p.b = s.k + 1 AND a.b = s.k + 2)
      ORDER BY p2.x LIMIT 1)
  FROM sel s WHERE s.k < 25)
SELECT k, d, revenue FROM (
  SELECT s.k AS k, bk.d, ROUND(bk.y / 100.0, 2) AS revenue
  FROM sel s JOIN bk ON bk.x = s.srn
  UNION ALL
  SELECT 26, bk.d, ROUND(bk.y / 100.0, 2) FROM bk WHERE b = 26)
ORDER BY k
"""


def q_time_decayed_value_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``exponentialTimeDecayedAvg`` parity: per event type,
    the exponentially time-decayed average of value at the stream's
    final timestamp (τ = 7 days) — recency-weighted engagement without
    a window cutoff. Each row's weight exp(−Δt/τ) rounds to 1e-12 and
    both the weighted-value and weight sums accumulate as decimals, so
    the fold is partition-order-free; one aggregation after a broadcast
    of the global max timestamp."""
    ev = _t(spark, sf_dir, "events")
    tmax = ev.agg(F.max("ts").alias("tmax"))
    tau_us = 7.0 * 86400.0 * 1e6
    j = ev.crossJoin(F.broadcast(tmax))
    wgt = F.round(
        F.exp(
            -(F.unix_micros("tmax") - F.unix_micros("ts")).cast("double") / tau_us
        ),
        12,
    )
    term = F.round(wgt * F.round(F.col("value"), 6), 12)
    d = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    return (
        j.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(
                F.sum(d(term)).cast("double") / F.sum(d(wgt)).cast("double"), 6
            ).alias("decayed_avg"),
            F.round(F.sum(d(wgt)).cast("double"), 6).alias("effective_n"),
        )
        .orderBy("event_type")
    )


_EXP_DECAY_SQL = """
WITH tm AS (SELECT MAX(ts) AS tmax FROM events),
w AS (
  SELECT event_type,
    ROUND(EXP(-CAST(epoch_us(tmax) - epoch_us(ts) AS DOUBLE)
              / (7.0 * 86400.0 * 1e6)), 12) AS wgt,
    ROUND(value, 6) AS v
  FROM events, tm)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
  ROUND(CAST(SUM(CAST(ROUND(wgt * v, 12) AS DECIMAL(38,12))) AS DOUBLE)
        / CAST(SUM(CAST(wgt AS DECIMAL(38,12))) AS DOUBLE), 6) AS decayed_avg,
  ROUND(CAST(SUM(CAST(wgt AS DECIMAL(38,12))) AS DOUBLE), 6) AS effective_n
FROM w GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# forecasting (core capability; structurally checked, not SQL-expressible)
# --------------------------------------------------------------------------


def q_forecast_daily_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _orders_daily(spark, sf_dir)
    return SeriesForecaster(interval=7, backend="fourier_ridge").transform(daily)


def q_forecast_multi_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The architecture headline: EVERY daily series of EVERY source table
    forecast in ONE distributed job. Wide tables unpivot into one long
    frame tagged (table, metric); groupBy(table, metric).applyInPandas
    fits all series concurrently — the reference's nested per-table,
    per-column loop (forecast_script.py:229,169) collapsed into a single
    shuffle. Output: long forecasts keyed (table, metric, ds)."""
    from .relational import unpivot_metrics

    orders_daily = _orders_daily(spark, sf_dir)
    events_daily = daily_rollup(
        _t(spark, sf_dir, "events"),
        "ts",
        [
            F.count("*").cast("double").alias("event_count"),
            _dsum(F.col("value")).alias("total_value"),
        ],
    )
    long = unpivot_metrics(
        orders_daily, ["order_count", "total_revenue"], axis="date"
    ).withColumn("table", F.lit("orders_daily")).unionByName(
        unpivot_metrics(
            events_daily, ["event_count", "total_value"], axis="date"
        ).withColumn("table", F.lit("events_daily"))
    )
    fc = SeriesForecaster(interval=7, backend="fourier_ridge")
    return fc.transform_long(long, group_cols=["table"]).orderBy(
        "table", "metric", "ds"
    )


def q_forecast_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental refit demo (rows-only): fit on history cut at 2000-01-01,
    then advance only the order_count series' axis — the revenue series
    reuses its prior forecast without touching a Python worker. The
    reference drops and recreates everything per run; cost here scales with
    changed series."""
    from .relational import unpivot_metrics

    daily = _orders_daily(spark, sf_dir)
    long_all = unpivot_metrics(daily, ["order_count", "total_revenue"], axis="date")
    cut = long_all.filter(F.col("ds") < "2000-01-01")
    grown = cut.unionByName(
        long_all.filter((F.col("ds") >= "2000-01-01") & (F.col("metric") == "order_count"))
    )
    fc = SeriesForecaster(interval=7, backend="fourier_ridge")
    prior, wm = fc.transform_long_incremental(cut, None, None)
    out, _ = fc.transform_long_incremental(grown, prior, wm)
    return out.orderBy("metric", "ds")


def q_forecast_backtest_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest at fan-out scale (r5 VERDICT #5): the 2,500-series
    seriesgen corpus × 4 rolling cutoffs = 10,000 (series, cutoff) fits
    in ONE applyInPandas job — the cutoff is just another group key, so
    a 4-cutoff backtest parallelizes exactly like a 4×-larger corpus.
    The keyed fan-out repartition lives inside transform_long, so the
    same AQE serial-collapse defense the plain path got in r4 covers
    the multiplied key space; tests/test_forecast_scale.py pins the
    stage width and the single exchange. Rows-only (scores are model
    output); forecast_backtest_scale_contract_audit is the hash-gated
    twin. Cutoffs leave ≥7 held-out days inside the 30-day history, so
    every fit scores exactly `interval` actuals."""
    from .sources import seriesgen as _sg

    _sg.register(spark)
    df = (
        spark.read.format("seriesgen")
        .option("series", "2500")
        .option("days", "30")
        .load()
    )
    long_df = df.select(
        F.col("date").alias("ds"),
        F.col("series_id").cast("string").alias("metric"),
        F.col("y"),
    )
    fc = SeriesForecaster(interval=7, only_future=True)
    return fc.backtest(
        long_df, ["2024-01-16", "2024-01-19", "2024-01-22", "2024-01-23"]
    )


def q_forecast_backtest_scale_contract_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hash-gated contract for the 10,000-fit backtest: every
    (series × cutoff) cell present exactly once (n_rows = 2500 × 4),
    every fit scored on exactly 7 held-out days, coverage a valid
    fraction, error metrics finite and non-negative — pinned as literal
    expectations from the generator/cutoff parameters. A dropped
    series, a double-emit from a serial collapse, or a broken holdout
    join breaks the hash."""
    out = q_forecast_backtest_scale(spark, sf_dir)
    bad_cov = (F.col("coverage") < 0) | (F.col("coverage") > 1)
    bad_err = (
        F.col("mae").isNull() | (F.col("mae") < 0)
        | F.col("rmse").isNull() | (F.col("rmse") < 0)
        | F.isnan("mae") | F.isnan("rmse")
    )
    per_cell = out.groupBy("metric", "cutoff").agg(F.count("*").alias("n"))
    return (
        out.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct("metric").cast("bigint").alias("n_series"),
            F.countDistinct("cutoff").cast("bigint").alias("n_cutoffs"),
            F.min("n_scored").cast("bigint").alias("n_scored_min"),
            F.max("n_scored").cast("bigint").alias("n_scored_max"),
            F.sum(bad_cov.cast("bigint")).cast("bigint").alias("n_coverage_violations"),
            F.sum(bad_err.cast("bigint")).cast("bigint").alias("n_error_violations"),
        )
        .crossJoin(
            F.broadcast(
                per_cell.agg(F.max("n").cast("bigint").alias("max_rows_per_cell"))
            )
        )
    )


_FORECAST_BACKTEST_SCALE_AUDIT_SQL = """
SELECT CAST(2500 * 4 AS BIGINT) AS n_rows,
  CAST(2500 AS BIGINT) AS n_series,
  CAST(4 AS BIGINT) AS n_cutoffs,
  CAST(7 AS BIGINT) AS n_scored_min,
  CAST(7 AS BIGINT) AS n_scored_max,
  CAST(0 AS BIGINT) AS n_coverage_violations,
  CAST(0 AS BIGINT) AS n_error_violations,
  CAST(1 AS BIGINT) AS max_rows_per_cell
"""


def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest over the orders daily series (rows-only):
    two cutoffs x two metrics fit in ONE distributed job (cutoff is a group
    key), scored on held-out actuals."""
    from .relational import unpivot_metrics

    daily = _orders_daily(spark, sf_dir)
    long_all = unpivot_metrics(daily, ["order_count", "total_revenue"], axis="date")
    fc = SeriesForecaster(interval=7, backend="fourier_ridge")
    return fc.backtest(long_all, cutoffs=["2000-06-01", "2000-09-01"])


def q_forecast_only_future(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = daily_rollup(
        ev, "ts", [F.count("*").cast("double").alias("event_count"), _dsum(F.col("value")).alias("total_value")]
    )
    return SeriesForecaster(interval=7, only_future=True, backend="fourier_ridge").transform(daily)


def q_forecast_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed contract for the flagship forecast (the forecast_* queries
    stay rows-only because yhat is model output, but everything the
    CONTRACT promises is deterministic and oracle-checkable): axis =
    distinct history dates plus exactly `interval` future days (R7/M3),
    schema = date + (m, m_min, m_max) per metric (C5), zero NULL cells for
    healthy series (M4/R12), and zero rows violating m_min <= m <= m_max
    (R10/M2 interval ordering). The DuckDB twin recomputes the axis facts
    from orders and pins every verdict at its healthy value."""
    fc = q_forecast_daily_sales(spark, sf_dir)
    metrics = sorted(
        c for c in fc.columns
        if c != "date" and not c.endswith("_min") and not c.endswith("_max")
    )
    bad = None
    nulls = None
    for m in metrics:
        viol = (
            (F.col(f"{m}_min") > F.col(m)) | (F.col(m) > F.col(f"{m}_max"))
        ).cast("bigint")
        isnull = (
            F.col(m).isNull()
            | F.col(f"{m}_min").isNull()
            | F.col(f"{m}_max").isNull()
        ).cast("bigint")
        bad = viol if bad is None else bad + viol
        nulls = isnull if nulls is None else nulls + isnull
    return fc.agg(
        F.count("*").alias("n_rows"),
        F.min("date").alias("min_date"),
        F.max("date").alias("max_date"),
        F.sum(nulls).cast("bigint").alias("n_null_cells"),
        F.sum(bad).cast("bigint").alias("n_bound_violations"),
    ).select(
        "n_rows", "min_date", "max_date",
        F.lit(len(metrics)).alias("n_metrics"),
        "n_null_cells", "n_bound_violations",
    )


_FORECAST_AUDIT_SQL = """
SELECT CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) + 7 AS BIGINT) AS n_rows,
  MIN(CAST(o_orderdate AS DATE)) AS min_date,
  MAX(CAST(o_orderdate AS DATE)) + 7 AS max_date,
  2 AS n_metrics,
  CAST(0 AS BIGINT) AS n_null_cells,
  CAST(0 AS BIGINT) AS n_bound_violations
FROM orders
"""


def q_forecast_future_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed contract for the --only-future shape (R8): exactly
    `interval` rows, all strictly after the last observed event day,
    consecutive, bounds ordered — the contract the reference's
    only_future flag promises (forecast_script.py:175-176), recomputed by
    DuckDB from the events table."""
    fc = q_forecast_only_future(spark, sf_dir)
    metrics = sorted(
        c for c in fc.columns
        if c != "date" and not c.endswith("_min") and not c.endswith("_max")
    )
    bad = None
    for m in metrics:
        viol = (
            (F.col(f"{m}_min") > F.col(m)) | (F.col(m) > F.col(f"{m}_max"))
        ).cast("bigint")
        bad = viol if bad is None else bad + viol
    return fc.agg(
        F.count("*").alias("n_rows"),
        F.min("date").alias("min_date"),
        F.max("date").alias("max_date"),
        F.sum(bad).cast("bigint").alias("n_bound_violations"),
    ).select(
        "n_rows", "min_date", "max_date",
        F.lit(len(metrics)).alias("n_metrics"),
        "n_bound_violations",
    )


_FORECAST_FUTURE_AUDIT_SQL = """
SELECT CAST(7 AS BIGINT) AS n_rows,
  MAX(CAST(ts AS DATE)) + 1 AS min_date,
  MAX(CAST(ts AS DATE)) + 7 AS max_date,
  2 AS n_metrics,
  CAST(0 AS BIGINT) AS n_bound_violations
FROM events
"""


def q_forecast_scale_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-at-scale proof (VERDICT r4 #7): 2,500 independent
    series from the seriesgen source (30 days each, deterministic)
    through SeriesForecaster.transform_long with a 7-day only-future
    horizon — 2,500 concurrent applyInPandas fits in ONE job. The scan
    is partition-batched (strided series-per-partition) and the fit
    stage pins its own fan-out width with a keyed repartition, because
    AQE's BYTE-based shuffle coalescing would otherwise merge the
    tiny-by-bytes/heavy-by-CPU Python stage into one serial worker
    (measured 24s -> 8s at 2,500 series on local[32]). Rows-only (yhat
    is model output); forecast_scale_contract_audit is the hash-gated
    twin. At 100 TB this exact plan is the engine's core primitive:
    per-series cost is constant, width is the cluster."""
    from .sources import seriesgen as _sg

    _sg.register(spark)
    df = (
        spark.read.format("seriesgen")
        .option("series", "2500")
        .option("days", "30")
        .load()
    )
    long_df = df.select(
        F.col("date").alias("ds"),
        F.col("series_id").cast("string").alias("metric"),
        F.col("y"),
    )
    fc = SeriesForecaster(interval=7, only_future=True)
    return fc.transform_long(long_df).orderBy("metric", "ds")


def q_forecast_scale_contract_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hash-gated contract for the 2,500-series fan-out: every series
    present, EXACTLY `interval` rows each (so n_rows = series x 7),
    all dates in the strictly-future 7-day window after the 30-day
    history (generator start 2024-01-01 -> future = 2024-01-31 ..
    2024-02-06), zero interval-ordering violations, zero NULL cells.
    The twin pins every number from the generator's parameters — a
    dropped series, a serial-collapse double-emit, or a broken future
    axis breaks the hash."""
    out = q_forecast_scale_series(spark, sf_dir)
    per = out.groupBy("metric").agg(F.count("*").alias("n"))
    return (
        out.agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("metric").alias("n_series"),
            F.min("ds").alias("min_ds"),
            F.max("ds").alias("max_ds"),
            F.sum(
                (
                    (F.col("yhat_lower") > F.col("yhat"))
                    | (F.col("yhat") > F.col("yhat_upper"))
                ).cast("bigint")
            ).alias("n_bound_violations"),
            F.sum(
                (
                    F.col("yhat").isNull()
                    | F.col("yhat_lower").isNull()
                    | F.col("yhat_upper").isNull()
                ).cast("bigint")
            ).alias("n_null_cells"),
        )
        .crossJoin(
            F.broadcast(
                per.agg(
                    F.min("n").alias("rows_per_series_min"),
                    F.max("n").alias("rows_per_series_max"),
                )
            )
        )
        .select(
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_series").cast("bigint").alias("n_series"),
            "min_ds",
            "max_ds",
            F.col("rows_per_series_min").cast("bigint").alias("rows_per_series_min"),
            F.col("rows_per_series_max").cast("bigint").alias("rows_per_series_max"),
            F.col("n_bound_violations").cast("bigint").alias("n_bound_violations"),
            F.col("n_null_cells").cast("bigint").alias("n_null_cells"),
        )
    )


_FORECAST_SCALE_AUDIT_SQL = """
SELECT CAST(2500 * 7 AS BIGINT) AS n_rows,
  CAST(2500 AS BIGINT) AS n_series,
  DATE '2024-01-31' AS min_ds,
  DATE '2024-02-06' AS max_ds,
  CAST(7 AS BIGINT) AS rows_per_series_min,
  CAST(7 AS BIGINT) AS rows_per_series_max,
  CAST(0 AS BIGINT) AS n_bound_violations,
  CAST(0 AS BIGINT) AS n_null_cells
"""


def q_forecast_multi_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed contract for the one-job multi-table forecast: per
    (table, metric) series, the long output carries exactly
    history-axis + interval rows spanning [min history day, max history
    day + interval], with ordered uncertainty bounds — i.e. the
    architecture headline (every series of every table in ONE shuffle)
    preserves each series' R7/M3 axis. DuckDB recomputes both tables'
    axes directly."""
    fc = q_forecast_multi_table(spark, sf_dir)
    viol = (
        (F.col("yhat_lower") > F.col("yhat")) | (F.col("yhat") > F.col("yhat_upper"))
    ).cast("bigint")
    return (
        fc.groupBy("table", "metric")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(F.col("ds").cast("date")).alias("min_ds"),
            F.max(F.col("ds").cast("date")).alias("max_ds"),
            F.sum(viol).cast("bigint").alias("n_bound_violations"),
        )
        .orderBy("table", "metric")
    )


def q_forecast_incremental_contract_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hashed contract for the incremental refit: the grown series
    (order_count) carries the FULL history axis + interval while the
    untouched series (total_revenue) still carries its pre-cutoff axis +
    interval — i.e. the operator really did refit only the changed series
    and reuse the prior forecast. Axes recomputed by DuckDB from orders."""
    fc = q_forecast_incremental(spark, sf_dir)
    viol = (
        (F.col("yhat_lower") > F.col("yhat")) | (F.col("yhat") > F.col("yhat_upper"))
    ).cast("bigint")
    return (
        fc.groupBy("metric")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(F.col("ds").cast("date")).alias("min_ds"),
            F.max(F.col("ds").cast("date")).alias("max_ds"),
            F.sum(viol).cast("bigint").alias("n_bound_violations"),
        )
        .orderBy("metric")
    )


_FORECAST_INCR_AUDIT_SQL = """
WITH full_axis AS (
  SELECT CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) + 7 AS BIGINT) AS n_rows,
    MIN(CAST(o_orderdate AS DATE)) AS min_ds,
    MAX(CAST(o_orderdate AS DATE)) + 7 AS max_ds
  FROM orders),
cut_axis AS (
  SELECT CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) + 7 AS BIGINT) AS n_rows,
    MIN(CAST(o_orderdate AS DATE)) AS min_ds,
    MAX(CAST(o_orderdate AS DATE)) + 7 AS max_ds
  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '2000-01-01')
SELECT 'order_count' AS metric, n_rows, min_ds, max_ds,
  CAST(0 AS BIGINT) AS n_bound_violations FROM full_axis
UNION ALL
SELECT 'total_revenue', n_rows, min_ds, max_ds, CAST(0 AS BIGINT) FROM cut_axis
ORDER BY metric
"""


def q_forecast_backtest_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed contract for the rolling-origin backtest: the (cutoff,
    metric) grid is complete, each cell scored exactly the held-out days
    inside (cutoff, cutoff+7] that exist in history, and the metric
    identities that hold for ANY model (mae >= 0, rmse >= mae, coverage
    in [0,1]) are emitted as hashed verdicts."""
    bt = q_forecast_backtest(spark, sf_dir)
    return bt.select(
        "metric",
        "cutoff",
        F.col("n_scored").cast("bigint").alias("n_scored"),
        (F.col("mae") >= 0).alias("mae_nonneg"),
        (F.col("rmse") >= F.col("mae")).alias("rmse_dominates_mae"),
        ((F.col("coverage") >= 0) & (F.col("coverage") <= 1)).alias("coverage_in_01"),
    ).orderBy("metric", "cutoff")


_FORECAST_BT_AUDIT_SQL = """
WITH days AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders),
cells AS (
  SELECT m.metric, c.cutoff,
    CAST((SELECT COUNT(*) FROM days
          WHERE d > CAST(c.cutoff AS DATE)
            AND d <= CAST(c.cutoff AS DATE) + 7) AS BIGINT) AS n_scored
  FROM (SELECT unnest(['order_count', 'total_revenue']) AS metric) m
  CROSS JOIN (SELECT unnest(['2000-06-01', '2000-09-01']) AS cutoff) c)
SELECT metric, cutoff, n_scored,
  TRUE AS mae_nonneg, TRUE AS rmse_dominates_mae, TRUE AS coverage_in_01
FROM cells ORDER BY metric, cutoff
"""


_FORECAST_MULTI_AUDIT_SQL = """
WITH o AS (
  SELECT CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) + 7 AS BIGINT) AS n_rows,
    MIN(CAST(o_orderdate AS DATE)) AS min_ds,
    MAX(CAST(o_orderdate AS DATE)) + 7 AS max_ds
  FROM orders),
e AS (
  SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) + 7 AS BIGINT) AS n_rows,
    MIN(CAST(ts AS DATE)) AS min_ds,
    MAX(CAST(ts AS DATE)) + 7 AS max_ds
  FROM events)
SELECT 'events_daily' AS "table", 'event_count' AS metric,
  n_rows, min_ds, max_ds, CAST(0 AS BIGINT) AS n_bound_violations FROM e
UNION ALL
SELECT 'events_daily', 'total_value', n_rows, min_ds, max_ds, CAST(0 AS BIGINT) FROM e
UNION ALL
SELECT 'orders_daily', 'order_count', n_rows, min_ds, max_ds, CAST(0 AS BIGINT) FROM o
UNION ALL
SELECT 'orders_daily', 'total_revenue', n_rows, min_ds, max_ds, CAST(0 AS BIGINT) FROM o
ORDER BY "table", metric
"""


# --------------------------------------------------------------------------
# TPC-H completion set (adapted shapes — the fixture schema has no partsupp
# table and no l_shipmode/l_commitdate/l_receiptdate/c_phone columns, so each
# query keeps the reference plan SHAPE (correlated subqueries, semi/anti
# joins, conditional aggregation) over the columns that exist; the adaptation
# is noted per query).
# --------------------------------------------------------------------------


def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 shape: per-part minimum-cost supplier via a decorrelated min
    subquery. Adapted: unit supply cost is derived from lineitem as
    min(l_extendedprice / l_quantity) per (part, supplier) since the fixture
    has no partsupp. The per-part min is a groupBy + equality join (the
    classic decorrelation of q2's correlated scalar subquery); dims are
    broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # selective part filter joins BELOW the aggregation: grouping the
    # filtered lineitem == filtering the grouped result (inner join on the
    # group key), but ~50x fewer rows enter the groupBy — a reordering
    # Catalyst does not do across an aggregate, so it is encoded here
    ps = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "supply_cost"
            )
        )
    )
    eu_sup = (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey).join(
        eu_sup.hint("broadcast"), ps.l_suppkey == eu_sup.s_suppkey
    )
    best = offers.groupBy(F.col("p_partkey").alias("bp_partkey")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    return (
        offers.join(
            F.broadcast(best),
            (offers.p_partkey == best.bp_partkey)
            & (offers.supply_cost == best.min_cost),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "supply_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


_Q2_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey),
eu_sup AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
offers AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, supply_cost
  FROM ps JOIN part ON l_partkey = p_partkey
  JOIN eu_sup ON l_suppkey = s_suppkey
  WHERE p_size = 15)
SELECT s_acctbal, s_name, n_name, p_partkey, supply_cost
FROM offers o
WHERE supply_cost = (SELECT MIN(supply_cost) FROM offers i WHERE i.p_partkey = o.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
"""


def q_tpch_q4_priority_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4 shape: order-priority counts over an EXISTS semi-join to lineitem.
    Adapted: the EXISTS predicate is l_returnflag = 'R' (fixture has no
    l_commitdate/l_receiptdate)."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    flagged = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(flagged, orders.o_orderkey == flagged.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9 shape: profit by (supplier nation, order year) over a 5-way join
    with a substring part filter. Adapted: cost term uses p_retailprice in
    place of ps_supplycost (no partsupp): amount = extprice*(1-disc) -
    0.01*p_retailprice*quantity."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("blue"))
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.01 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(sup.hint("broadcast"), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_dsum(amount).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


_Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) - 0.01 * p_retailprice * l_quantity
      AS DECIMAL(38,10))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%blue%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


def q_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11 shape: per-part value with a HAVING threshold from a scalar
    subquery over the same aggregate. Adapted: part value = sum of
    extendedprice shipped by suppliers of one nation (no partsupp); the
    threshold is 0.1% of the nation's total."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 7)
    scoped = li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
    per_part = scoped.groupBy("l_partkey").agg(
        _dsum(F.col("l_extendedprice")).alias("part_value")
    )
    # threshold from the SAME decimal grand total on both engines (never
    # recast a derived double back to decimal — engines round differently)
    total = scoped.agg((_dsum(F.col("l_extendedprice")) * 0.001).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


_Q11_SQL = """
WITH scoped AS (
  SELECT l_partkey, l_extendedprice
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey = 7),
per_part AS (
  SELECT l_partkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS part_value
  FROM scoped GROUP BY l_partkey)
SELECT l_partkey, part_value FROM per_part
WHERE part_value > (
  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) * 0.001 FROM scoped)
ORDER BY part_value DESC, l_partkey
"""


def q_tpch_q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12 shape: conditional (CASE) aggregation of order priorities per
    lineitem category. Adapted: l_linestatus stands in for l_shipmode and the
    date predicate uses l_shipdate (no commit/receipt dates)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


_Q12_SQL = """
SELECT l_linestatus,
  SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS high_line_count,
  SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus ORDER BY l_linestatus
"""


def q_tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16 shape: distinct-supplier counts per part attribute group with a
    NOT IN anti-join on a supplier subquery. Adapted: the part-supplier
    relation comes from lineitem; excluded suppliers are those with negative
    account balance (stand-in for the complaints LIKE filter)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & (F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49))
    )
    bad_sup = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_sup), li.l_suppkey == bad_sup.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13' AND p_size IN (1,4,9,14,23,36,45,49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 shape: nested IN subqueries — suppliers whose 1996 shipped
    quantity of 'red' parts exceeds half their total availability. Adapted:
    availability = that supplier's all-time shipped quantity of the part
    (no partsupp.ps_availqty); both levels stay semi-joins."""
    li = _t(spark, sf_dir, "lineitem")
    red_parts = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red")).select("p_partkey")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    red_li = li.join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey)
    total = red_li.groupBy("l_partkey", "l_suppkey").agg(
        _dsum(F.col("l_quantity")).alias("total_qty")
    )
    recent = (
        red_li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy(
            F.col("l_partkey").alias("r_partkey"), F.col("l_suppkey").alias("r_suppkey")
        )
        .agg(_dsum(F.col("l_quantity")).alias("recent_qty"))
    )
    qualifying = (
        total.join(
            recent,
            (total.l_partkey == recent.r_partkey) & (total.l_suppkey == recent.r_suppkey),
        )
        .filter(F.col("recent_qty") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(qualifying, sup.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name", "s_suppkey")
    )


_Q20_SQL = """
WITH red_li AS (
  SELECT l_partkey, l_suppkey, l_quantity, l_shipdate
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'),
total AS (
  SELECT l_partkey, l_suppkey,
    CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS total_qty
  FROM red_li GROUP BY l_partkey, l_suppkey),
recent AS (
  SELECT l_partkey, l_suppkey,
    CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS recent_qty
  FROM red_li
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey)
SELECT s_name, s_suppkey
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT t.l_suppkey FROM total t JOIN recent r
      ON t.l_partkey = r.l_partkey AND t.l_suppkey = r.l_suppkey
    WHERE r.recent_qty > 0.5 * t.total_qty)
ORDER BY s_name, s_suppkey
"""


def q_tpch_q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21 shape: EXISTS + NOT EXISTS self-joins on lineitem — suppliers
    whose line in a finished multi-supplier order was the only one returned.
    Adapted: 'kept waiting' = l_returnflag 'R' (no receipt/commit dates);
    both correlated quantifiers become aggregate-then-join semi/anti checks."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    sup = _t(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_flagged_suppliers"),
    )
    eligible = per_order.filter(
        (F.col("n_suppliers") > 1) & (F.col("n_flagged_suppliers") == 1)
    )
    flagged = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").distinct()
    return (
        flagged.join(eligible.select("l_orderkey"), "l_orderkey")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(sup.hint("broadcast"), F.col("l_suppkey") == sup.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


_Q21_SQL = """
WITH eligible AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING COUNT(DISTINCT l_suppkey) > 1
     AND COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) = 1),
flagged AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
SELECT s_name, numwait FROM (
  SELECT l_suppkey, COUNT(*) AS numwait
  FROM flagged JOIN eligible USING (l_orderkey)
  WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')
  GROUP BY l_suppkey)
JOIN supplier ON l_suppkey = s_suppkey
ORDER BY numwait DESC, s_name LIMIT 100
"""


def q_tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22 shape: scalar average subquery + anti-join to orders, grouped by a
    customer attribute. Adapted: nation key stands in for the phone country
    code (fixture has no c_phone); threshold = average positive balance of
    nations 0-6; 'dormant' = no URGENT order (every fixture customer has at
    least one order, so the anti-join carries a predicate)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey") <= 6)
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (_dsum(F.col("c_acctbal")) / F.count("*")).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


_Q22_SQL = """
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_nationkey <= 6
  AND c_acctbal > (
    SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS DOUBLE)
    FROM customer WHERE c_nationkey <= 6 AND c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey ORDER BY cntrycode
"""


# --------------------------------------------------------------------------
# round-1 widening batch 2: grouping sets, argmax-per-group, seasonality,
# bigrams, embedding centroids, corpus histograms, repetition scoring
# --------------------------------------------------------------------------


def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((n_name), (order_year)) — two *sideways* aggregation
    grains in one shuffle, a shape neither ROLLUP nor CUBE expresses.
    Single pass over the joined fact: Spark expands the sets map-side, so
    the shuffle carries one partial row per (set, key) — at 100 TB this is
    one fact scan instead of two separate groupBys."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", F.year("o_orderdate").alias("order_year"), "o_totalprice")
    )
    return (
        joined.groupingSets(
            [["n_name"], ["order_year"]], "n_name", "order_year"
        )
        .agg(
            F.grouping_id().alias("gid"),
            _dsum_cents(F.col("o_totalprice")).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .select("n_name", "order_year", "gid", "revenue", "n_orders")
    )


_GSETS_SQL = """
SELECT n_name, year(o_orderdate) AS order_year,
  GROUPING(n_name) * 2 + GROUPING(year(o_orderdate)) AS gid,
  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE), 2) AS revenue,
  COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name), (year(o_orderdate)))
"""


def q_argmax_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax-per-group without a self-join: max over a (price, orderkey)
    struct gives each customer's most expensive order (ties -> highest key)
    in ONE aggregation — the scalable alternative to the join-back-on-max
    idiom the oracle uses. Top 25 customers by that best price: the
    per-customer frame is corpus-proportional, so the top-k is
    TakeOrderedAndProject, and the rank window runs over 25 rows only."""
    orders = _t(spark, sf_dir, "orders")
    best = orders.groupBy("o_custkey").agg(
        F.max(
            F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
        ).alias("b")
    )
    order = [F.col("best_price").desc(), F.col("o_custkey")]
    top = RK.top_k(
        best.select(
            "o_custkey",
            F.col("b.p").cast("double").alias("best_price"),
            F.col("b.k").alias("best_orderkey"),
        ),
        order,
        25,
    )
    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


_ARGMAX_SQL = """
WITH m AS (
  SELECT o_custkey, max(o_totalprice) AS best_price
  FROM orders GROUP BY o_custkey),
b AS (
  SELECT m.o_custkey, m.best_price, max(o.o_orderkey) AS best_orderkey
  FROM m JOIN orders o
    ON o.o_custkey = m.o_custkey AND o.o_totalprice = m.best_price
  GROUP BY m.o_custkey, m.best_price)
SELECT o_custkey, best_price, best_orderkey, rank FROM (
  SELECT o_custkey, CAST(best_price AS DOUBLE) AS best_price, best_orderkey,
    ROW_NUMBER() OVER (ORDER BY best_price DESC, o_custkey) AS rank
  FROM b)
WHERE rank <= 25
"""


def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average daily order revenue by ISO day-of-week — the seasonality
    profile a forecaster's weekly component captures. Two aggregations
    (daily rollup, then 7-row dow profile); the second input is one row
    per date so its shuffle is negligible at any scale."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy("o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,10)")).alias("rev")
    )
    return (
        daily.groupBy((F.weekday("o_orderdate") + F.lit(1)).alias("isodow"))
        .agg(
            F.count("*").alias("n_days"),
            F.round(F.sum("rev").cast("double"), 2).alias("total_revenue"),
        )
        .withColumn(
            "avg_daily_revenue",
            F.round(F.col("total_revenue") / F.col("n_days"), 4),
        )
        .select("isodow", "n_days", "total_revenue", "avg_daily_revenue")
    )


_DOW_SQL = """
WITH daily AS (
  SELECT o_orderdate, SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS rev
  FROM orders GROUP BY o_orderdate)
SELECT isodow(o_orderdate) AS isodow,
  COUNT(*) AS n_days,
  ROUND(CAST(SUM(rev) AS DOUBLE), 2) AS total_revenue,
  ROUND(ROUND(CAST(SUM(rev) AS DOUBLE), 2) / COUNT(*), 4) AS avg_daily_revenue
FROM daily GROUP BY isodow(o_orderdate)
"""


def q_text_bigram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams: zip the token array against its own tail
    (pure JVM array ops, no Python), explode, count. The shuffle carries
    one partial count per distinct bigram per partition (map-side
    combine), not one row per bigram occurrence."""
    docs = _t(spark, sf_dir, "documents")
    t = TX.tokens(F.col("text"))
    n = F.size(t)
    bigrams = F.zip_with(
        F.slice(t, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    counts = (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
    )
    # distinct bigrams grow faster than the unigram vocab — top-k via
    # TakeOrderedAndProject, rank window over the 20-row result only
    order = [F.col("n").desc(), F.col("bigram")]
    top = RK.top_k(counts, order, 20)
    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


_BIGRAM_SQL = f"""
WITH toks AS (SELECT {_TOKS_SQL} AS t FROM documents),
big AS (
  SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bigram
  FROM toks),
counts AS (SELECT bigram, COUNT(*) AS n FROM big GROUP BY bigram)
SELECT bigram, n, rank FROM (
  SELECT bigram, n, ROW_NUMBER() OVER (ORDER BY n DESC, bigram) AS rank FROM counts)
WHERE rank <= 20
"""


def q_embedding_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the 64-dim embedding column in long form
    (label, pos, centroid): posexplode -> groupBy (label, pos) -> exact
    decimal mean. This is the k-means-update / class-prototype primitive;
    the shuffle carries labels x 64 dims regardless of row count, and the
    long output avoids array-hash comparison pitfalls."""
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("double").cast("decimal(38,10)")).alias("s"),
        )
        .select(
            "label",
            "pos",
            "n",
            F.round(F.col("s").cast("double") / F.col("n"), 6).alias("centroid"),
        )
    )


_CENTROID_SQL = """
WITH pe AS (
  SELECT label, r.i AS pos, embedding[r.i] AS v
  FROM embeddings
  CROSS JOIN (SELECT CAST(range AS INTEGER) AS i FROM range(1, 65)) r)
SELECT label, pos, COUNT(*) AS n,
  ROUND(CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 6) AS centroid
FROM pe GROUP BY label, pos
"""


def q_doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length histogram per source: 50-char buckets over n_chars.
    The pre-training curation sanity check (length distribution shift);
    pure map-side bucketing + one tiny aggregation."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            "source",
            (F.floor(F.col("n_chars") / 50) * 50).alias("bucket_lo"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


_LENHIST_SQL = """
SELECT source, CAST(floor(n_chars / 50) * 50 AS BIGINT) AS bucket_lo,
  COUNT(*) AS n_docs, MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM documents GROUP BY source, floor(n_chars / 50) * 50
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition score: 1 - distinct_tokens/total_tokens.
    The boilerplate/spam signal in LLM-corpus quality gates. Per-row array
    ops only — embarrassingly parallel, no shuffle before the final
    top-20."""
    docs = _t(spark, sf_dir, "documents")
    t = TX.tokens(F.col("text"))
    n = F.size(t)
    rep = F.round(
        F.lit(1.0)
        - F.size(F.array_distinct(t)) / F.greatest(n, F.lit(1)).cast("double"),
        6,
    )
    scored = docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct"),
        rep.alias("repetition"),
    )
    order = [F.col("repetition").desc(), F.col("doc_id")]
    top = RK.top_k(scored, order, 20)
    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


_REPETITION_SQL = f"""
WITH s AS (
  SELECT doc_id, len({_TOKS_SQL}) AS n_tokens,
    len(list_distinct({_TOKS_SQL})) AS n_distinct
  FROM documents)
SELECT doc_id, n_tokens, n_distinct, repetition, rank FROM (
  SELECT doc_id, n_tokens, n_distinct,
    ROUND(1.0 - n_distinct / greatest(n_tokens, 1)::DOUBLE, 6) AS repetition,
    ROW_NUMBER() OVER (
      ORDER BY ROUND(1.0 - n_distinct / greatest(n_tokens, 1)::DOUBLE, 6) DESC,
               doc_id) AS rank
  FROM s)
WHERE rank <= 20
"""


# --------------------------------------------------------------------------
# mergeable-sketch rollups (Apache DataSketches built-ins, Spark 3.5+/4.x)
#
# THE 100 TB aggregation pattern: sketches are mergeable partial aggregates,
# so coarse grains (month, total) are computed by unioning the fine-grain
# sketch column — no second scan of the fact table, and a pre-aggregated
# sketch table is ~KB per group regardless of row count.
# --------------------------------------------------------------------------


def q_sketch_rollup_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct-user HLL sketches unioned into a total WITHOUT
    rescanning events: one scan builds per-day sketches; the total grain
    merges 30 sketch blobs (bytes, not rows). Estimates are deterministic
    (hash registers + pointwise-max merge, no RNG)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count("*").alias("n_events"),
    )
    # the HLL estimate itself is engine-specific, so the hashable surface
    # is the exact count plus an in-query 5% tolerance verdict on the
    # estimate (the approx_distinct_users pattern): if the sketch or the
    # merge ever drifts out of bound the verdict flips and the oracle
    # hash catches it.
    ok = lambda est, exact: (  # noqa: E731
        F.abs(est - exact) <= 0.05 * exact
    ).alias("approx_within_5pct")
    per_day = daily.select(
        F.lit("day").alias("grain"),
        F.col("day").cast("string").alias("key"),
        "exact_users",
        "n_events",
        ok(F.hll_sketch_estimate("sk"), F.col("exact_users")),
    )
    exact_total = ev.agg(F.countDistinct("user_id").alias("exact_users"))
    total = (
        daily.agg(
            F.hll_union_agg("sk").alias("sk"), F.sum("n_events").alias("n_events")
        )
        .crossJoin(F.broadcast(exact_total))
        .select(
            F.lit("total").alias("grain"),
            F.lit("ALL").alias("key"),
            "exact_users",
            "n_events",
            ok(F.hll_sketch_estimate("sk"), F.col("exact_users")),
        )
    )
    return per_day.unionByName(total)


_SKETCH_ROLLUP_SQL = """
SELECT 'day' AS grain, CAST(CAST(ts AS DATE) AS VARCHAR) AS key,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  TRUE AS approx_within_5pct
FROM events GROUP BY 2
UNION ALL
SELECT 'total', 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT),
  CAST(COUNT(*) AS BIGINT), TRUE
FROM events
"""


def q_sketch_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketches of event value per event_type, merged into a
    global grain from the per-type sketches. p50/p90/p99 come out of the
    sketch, rank error ~1.7% at default k — the streaming/distributed
    replacement for exact percentile sorts."""
    ev = _t(spark, sf_dir, "events")
    # hashable surface = the exact interpolated percentiles (the
    # percentiles_by_segment pairing) plus in-query verdicts that each
    # KLL quantile lands inside the exact ±5%-rank window — sketch
    # estimates themselves are engine-specific. The verdicts are
    # Spark-internal assertions (the oracle emits TRUE), so a sketch
    # regression flips a hashed boolean.
    exact_aggs = [
        F.count("*").alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    ]
    bound_exprs = {
        "p50": ("percentile(value, 0.45)", "percentile(value, 0.55)"),
        "p90": ("percentile(value, 0.85)", "percentile(value, 0.95)"),
        "p99": ("percentile(value, 0.94)", "percentile(value, 1.0)"),
    }
    bound_aggs = [
        F.expr(e).alias(f"{name}_{side}")
        for name, (lo, hi) in bound_exprs.items()
        for side, e in (("lo", lo), ("hi", hi))
    ]
    per_type = ev.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value").alias("sk"), *exact_aggs, *bound_aggs
    )
    merged_sk = ev.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value").alias("sk")
    ).agg(F.kll_merge_agg_double("sk").alias("sk"))
    merged = (
        ev.agg(*exact_aggs, *bound_aggs).crossJoin(F.broadcast(merged_sk))
    )

    def _verdicts(df: DataFrame, key: F.Column) -> DataFrame:
        cols = [key.alias("event_type"), "n", "p50", "p90", "p99"]
        for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            est = F.kll_sketch_get_quantile_double("sk", F.lit(q))
            cols.append(
                (
                    (est >= F.col(f"{name}_lo")) & (est <= F.col(f"{name}_hi"))
                ).alias(f"{name}_within_rank_tol")
            )
        return df.select(*cols)

    return _verdicts(per_type, F.col("event_type")).unionByName(
        _verdicts(merged, F.lit("ALL"))
    )


_SKETCH_QUANTILES_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  round(quantile_cont(value, 0.5), 6) AS p50,
  round(quantile_cont(value, 0.9), 6) AS p90,
  round(quantile_cont(value, 0.99), 6) AS p99,
  TRUE AS p50_within_rank_tol, TRUE AS p90_within_rank_tol,
  TRUE AS p99_within_rank_tol
FROM events GROUP BY event_type
UNION ALL
SELECT 'ALL', CAST(COUNT(*) AS BIGINT),
  round(quantile_cont(value, 0.5), 6), round(quantile_cont(value, 0.9), 6),
  round(quantile_cont(value, 0.99), 6), TRUE, TRUE, TRUE
FROM events
"""


def q_sketch_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retained users via Theta sketch set intersection:
    per-week sketches of user_id, consecutive weeks paired, intersection
    estimated. Below the sketch's nominal-entries threshold estimates are
    exact, so the DuckDB oracle (exact self-join intersection) hash-matches
    at fixture scale; at 100 TB the same plan degrades gracefully to
    bounded-error estimates instead of a quadratic users-join."""
    ev = _t(spark, sf_dir, "events")
    weekly = ev.groupBy(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start")
    ).agg(F.theta_sketch_agg("user_id").alias("sk"))
    a, b = weekly.alias("a"), weekly.alias("b")
    paired = a.join(
        b, F.date_add(F.col("a.week_start"), 7) == F.col("b.week_start")
    )
    return paired.select(
        F.col("a.week_start").alias("week_start"),
        F.col("b.week_start").alias("next_week_start"),
        F.theta_sketch_estimate(F.col("a.sk")).cast("bigint").alias("users_w"),
        F.theta_sketch_estimate(F.col("b.sk")).cast("bigint").alias("users_next"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("a.sk"), F.col("b.sk"))
        ).cast("bigint").alias("retained"),
    ).withColumn(
        "retention_rate",
        F.round(F.col("retained") / F.col("users_w"), 6),
    )


_RETENTION_SQL = """
WITH wu AS (
  SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS week_start, user_id
  FROM events),
wc AS (SELECT week_start, COUNT(*) AS users FROM wu GROUP BY week_start),
ret AS (
  SELECT a.week_start, b.week_start AS next_week_start, COUNT(*) AS retained
  FROM wu a JOIN wu b
    ON b.week_start = a.week_start + INTERVAL 7 DAY AND a.user_id = b.user_id
  GROUP BY a.week_start, b.week_start)
SELECT r.week_start, r.next_week_start,
  w1.users AS users_w, w2.users AS users_next, r.retained,
  ROUND(r.retained / CAST(w1.users AS DOUBLE), 6) AS retention_rate
FROM ret r
JOIN wc w1 ON w1.week_start = r.week_start
JOIN wc w2 ON w2.week_start = r.next_week_start
"""


def q_variant_props_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics over the OPEN VARIANT type (Spark 4):
    parse the JSON props column once into a binary variant, then typed
    path extraction feeds a normal aggregation. Versus string JSON ops,
    variant parses each value once (not once per path) and its binary
    encoding shreds into columnar reads at the parquet layer — the
    schema-on-read path for 100 TB of heterogeneous event payloads."""
    ev = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.col("k").cast("bigint")).alias("sum_k"),
        )
        .withColumn(
            "avg_k",
            F.round(F.col("sum_k").cast("double") / F.col("n_with_k"), 6),
        )
    )


_VARIANT_SQL = """
WITH x AS (
  SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM events)
SELECT event_type, COUNT(*) AS n, COUNT(k) AS n_with_k,
  MIN(k) AS min_k, MAX(k) AS max_k, SUM(CAST(k AS BIGINT)) AS sum_k,
  ROUND(CAST(SUM(CAST(k AS BIGINT)) AS DOUBLE) / COUNT(k), 6) AS avg_k
FROM x GROUP BY event_type
"""


def q_user_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting over the events stream: per day, new users (first
    ever seen), returning users, and the cumulative user count. Two
    aggregations sharing the user_id shuffle key (daily-active and
    first-seen) + a broadcast-sized join on day + a cumulative window over
    the (tiny) daily series. The user-level frames are one row per user /
    per (user, day) — at 100 TB both shuffles carry ids, never events."""
    ev = _t(spark, sf_dir, "events")
    # day is a calendar grain (bounded by the corpus time span, not data
    # volume) — the census resolves it through cast-as-date on the active
    # side and through the domain-preserving MIN on the first_seen side
    active = (
        ev.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("active_users"))
    )
    first_seen = (
        ev.groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("new_users"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(first_seen, "day", "left")
        .withColumn("new_users", F.coalesce("new_users", F.lit(0)))
        .withColumn("returning_users", F.col("active_users") - F.col("new_users"))
        .withColumn("cumulative_users", F.sum("new_users").over(w))
        .select("day", "active_users", "new_users", "returning_users", "cumulative_users")
    )


_GROWTH_SQL = """
WITH active AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS active_users
  FROM events GROUP BY CAST(ts AS DATE)),
fs AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id),
nu AS (SELECT day, COUNT(*) AS new_users FROM fs GROUP BY day)
SELECT a.day, a.active_users,
  COALESCE(nu.new_users, 0) AS new_users,
  a.active_users - COALESCE(nu.new_users, 0) AS returning_users,
  SUM(COALESCE(nu.new_users, 0)) OVER (
    ORDER BY a.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS cumulative_users
FROM active a LEFT JOIN nu ON nu.day = a.day
"""


def q_dq_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations over orders, evaluated in ONE scan
    (functions/quality.py): any number of row-level rules become
    conditional-count aggregates in a single agg — never one job per
    rule. Two rules are deliberately violated by the fixture (pre-2000
    dates, sub-100k price cap) so the summary exercises non-zero paths."""
    from .functions.quality import check_expectations

    orders = _t(spark, sf_dir, "orders")
    pri = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    return check_expectations(
        orders,
        {
            "orderkey_not_null": F.col("o_orderkey").isNotNull(),
            "positive_price": F.col("o_totalprice") > 0,
            "known_priority": F.col("o_orderpriority").isin(pri),
            "price_under_100k": F.col("o_totalprice") < 100000,
            "pre_y2k_date": F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"),
        },
    )


_DQ_EXPECT_SQL = """
WITH s AS (
  SELECT COUNT(*) AS n_rows,
    SUM(CASE WHEN o_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS v_notnull,
    SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS v_pos,
    SUM(CASE WHEN o_orderpriority IN
      ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
      THEN 0 ELSE 1 END) AS v_pri,
    SUM(CASE WHEN o_totalprice < 100000 THEN 0 ELSE 1 END) AS v_cap,
    SUM(CASE WHEN o_orderdate < TIMESTAMP '2000-01-01' THEN 0 ELSE 1 END) AS v_y2k
  FROM orders),
long AS (
  SELECT 'orderkey_not_null' AS rule, n_rows, v_notnull AS n_violations FROM s
  UNION ALL SELECT 'positive_price', n_rows, v_pos FROM s
  UNION ALL SELECT 'known_priority', n_rows, v_pri FROM s
  UNION ALL SELECT 'price_under_100k', n_rows, v_cap FROM s
  UNION ALL SELECT 'pre_y2k_date', n_rows, v_y2k FROM s)
SELECT rule, n_rows, n_violations,
  ROUND((n_rows - n_violations) / CAST(greatest(n_rows, 1) AS DOUBLE), 6) AS pass_rate
FROM long ORDER BY rule
"""


def q_similarity_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 by integer dot product over int8-quantized embeddings
    (functions/similarity.py quantize/quantized_topk): per-dim min/max
    stats train on a dims-sized aggregate, then quantization and scoring
    are row-local JVM array ops. 4x memory/bandwidth vs float32 — the ANN
    compression tier; recall vs exact cosine is pinned in tests."""
    emb = SIM.with_normalized(_t(spark, sf_dir, "embeddings"))
    qrow = emb.filter(F.col("vec_id") == 0).head()
    if qrow is None:
        raise ValueError("embeddings table has no vec_id=0 query row")
    query = [float(x) for x in qrow.nvec]
    mins, scales = SIM.quantization_stats(emb, vec_col="nvec")
    return SIM.quantized_topk(emb, query, mins, scales, k=20, vec_col="nvec")


# The quantizer's "learned" state is all deterministic data (per-dim
# min/max of the L2-normalized corpus, scales, the normalized vec_id=0
# query), so the DuckDB twin replays the identical IEEE pipeline:
# normalize -> per-dim stats -> ADC weights -> rounded integer codes ->
# dot with the weight array -> 6dp-rounded ranking.
_QUANTIZED_SQL = f"""
WITH nv AS (
  SELECT vec_id,
    list_transform(embedding, x -> x::DOUBLE /
      greatest(sqrt(list_sum(list_transform(embedding,
               y -> y::DOUBLE * y::DOUBLE))), 1e-12)) AS nvec
  FROM embeddings),
dims AS (
  SELECT i, MIN(nvec[i]) AS lo, MAX(nvec[i]) AS hi
  FROM nv, generate_series(1, {_EMB_DIM}) t(i)
  GROUP BY i),
arrs AS (
  SELECT list(lo ORDER BY i) AS lo_a,
         list(greatest(hi - lo, 1e-12) / 255.0 ORDER BY i) AS sc_a
  FROM dims),
qn AS (SELECT nvec AS qv FROM nv WHERE vec_id = 0),
scored AS (
  SELECT n.vec_id,
    round(list_sum(list_transform(generate_series(1, {_EMB_DIM}),
          i -> round((n.nvec[i] - a.lo_a[i]) / a.sc_a[i])
               * (a.sc_a[i] * q.qv[i]))), 6) AS qscore
  FROM nv n, arrs a, qn q)
SELECT vec_id, qscore FROM scored ORDER BY qscore DESC, vec_id LIMIT 20
"""


def q_decontaminate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the training-set hygiene op: flag
    corpus documents sharing any word 4-gram with a held-out benchmark
    set (here: doc_id % 97 == 0 simulates the eval set). The benchmark
    gram set is tiny by construction, so it BROADCASTS: the corpus-side
    scan streams past it with no shuffle of corpus text; per-source
    summary follows. At 100 TB this is a broadcast-semi-join per shard —
    contamination checking at scan speed."""
    docs = _t(spark, sf_dir, "documents")
    bench_grams = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(TX.word_shingles(F.col("text"), 4)).alias("g"))
        .distinct()
    )
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    contaminated = (
        corpus.select("doc_id", "source", F.explode(TX.word_shingles(F.col("text"), 4)).alias("g"))
        .join(F.broadcast(bench_grams), "g")
        .select("doc_id", "source")
        .distinct()
    )
    return (
        corpus.groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .join(
            contaminated.groupBy("source").agg(F.count("*").alias("n_contaminated")),
            "source",
            "left",
        )
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)))
        .withColumn("n_kept", F.col("n_docs") - F.col("n_contaminated"))
        .select("source", "n_docs", "n_contaminated", "n_kept")
    )


_WORD4_SQL = (
    f"list_distinct(list_transform(generate_series(1, greatest(len({_TOKS_SQL}) - 3, 1)), "
    f"i -> array_to_string(list_slice({_TOKS_SQL}, i, i + 3), ' ')))"
)

_DECONTAM_SQL = f"""
WITH d AS (SELECT doc_id, source, {_WORD4_SQL} AS sh FROM documents),
bench AS (SELECT DISTINCT unnest(sh) AS g FROM d WHERE doc_id % 97 = 0),
hits AS (
  SELECT DISTINCT c.doc_id, c.source
  FROM (SELECT doc_id, source, unnest(sh) AS g FROM d WHERE doc_id % 97 != 0) c
  JOIN bench USING (g)),
per_src AS (
  SELECT source, COUNT(*) AS n_docs FROM d WHERE doc_id % 97 != 0 GROUP BY source),
hit_src AS (SELECT source, COUNT(*) AS n_contaminated FROM hits GROUP BY source)
SELECT p.source, p.n_docs,
  COALESCE(h.n_contaminated, 0) AS n_contaminated,
  p.n_docs - COALESCE(h.n_contaminated, 0) AS n_kept
FROM per_src p LEFT JOIN hit_src h ON h.source = p.source
"""


def q_corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain mixing: per-source target weights (even
    source ids keep 100%, odd keep 40%) applied via a content-hash
    Bernoulli gate — md5(doc_id) mod 1e6 under rate. No RNG state, so
    the SAME rows are selected on every engine, every run, any partition
    order: reproducible data recipes, the mixing contract a training
    pipeline needs. Output: per-source selection summary."""
    docs = _t(spark, sf_dir, "documents")
    src_num = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    rate = F.when(src_num % 2 == 0, F.lit(1.0)).otherwise(F.lit(0.4))
    frac = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint") % 1000000
    ) / 1000000.0
    return (
        docs.select("source", rate.alias("rate"), (frac < rate).alias("sel"))
        .groupBy("source", "rate")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("sel").cast("int")).alias("n_selected"),
        )
        .select("source", "rate", "n_docs", "n_selected")
    )


_MIX_SQL = """
WITH x AS (
  SELECT source,
    CASE WHEN CAST(regexp_extract(source, '([0-9]+)', 1) AS INTEGER) % 2 = 0
         THEN 1.0 ELSE 0.4 END AS rate,
    (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000)
      / 1000000.0 AS frac
  FROM documents)
SELECT source, rate, COUNT(*) AS n_docs,
  SUM(CASE WHEN frac < rate THEN 1 ELSE 0 END) AS n_selected
FROM x GROUP BY source, rate
"""


def q_window_range_1h_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per event, the count/sum of same-type
    events in the trailing hour — a range frame over epoch-micros, NOT a
    row frame, so irregular event spacing is handled exactly (peers at
    the same instant always share a frame). Partitioned by event_type:
    parallel by construction; frame sums run in decimal (engines disagree
    on double add/retract order inside sliding frames)."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "event_type",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(38,10)")).over(w)
        .cast("double")
        .alias("sum_1h"),
    )


_RANGE1H_SQL = """
SELECT event_id, event_type,
  COUNT(*) OVER w AS n_1h,
  CAST(SUM(CAST(value AS DECIMAL(38,10))) OVER w AS DOUBLE) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics from EXACT decimal power sums: per
    event_type, stddev of value and corr(value, props.k) derived from
    (n, Σx, Σx², Σy, Σy², Σxy) — one aggregation pass, and because the
    sums are exact decimals the derived doubles are bit-identical across
    engines (native corr()/stddev() stream in partition order and are
    not reproducible). The moment-sum shape is also the distributed
    one: partials add, so it map-side combines like any sum.

    Inputs cast to decimal(18,8), NOT (38,10): Spark truncates a
    (38,10)x(38,10) product to scale 6 (the 38-digit precision cap forces
    scale loss) while DuckDB keeps full scale — (18,8) products stay
    exact at scale 16 in both engines, so the power sums really are
    exact for inputs with <= 8 decimal places."""
    ev = _t(spark, sf_dir, "events")
    x = F.col("value").cast("decimal(18,8)")
    y = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "int").cast(
        "decimal(18,8)"
    )
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    stddev = F.sqrt((sxx - sx * sx / n) / (n - 1))
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return agg.select(
        "event_type",
        "n",
        F.round(sx / n, 6).alias("mean_value"),
        F.round(stddev, 6).alias("stddev_value"),
        F.round(corr, 6).alias("corr_value_k"),
    )


_MOMENTS_SQL = """
WITH b AS (
  -- DECIMAL(19,8) not (18,8): width 19 forces int128 storage so the
  -- product does not overflow int64; products are exact at scale 16,
  -- matching Spark's (18,8)x(18,8) -> (37,16) exactly
  SELECT event_type,
    CAST(value AS DECIMAL(19,8)) AS x,
    CAST(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS DECIMAL(19,8)) AS y
  FROM events),
m AS (
  SELECT event_type, COUNT(*) AS n,
    SUM(x) AS sx, SUM(x*x) AS sxx, SUM(y) AS sy, SUM(y*y) AS syy, SUM(x*y) AS sxy
  FROM b GROUP BY event_type)
SELECT event_type, n,
  ROUND(CAST(sx AS DOUBLE) / n, 6) AS mean_value,
  ROUND(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/n) / (n - 1)), 6) AS stddev_value,
  ROUND((n*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
    / (sqrt(n*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
     * sqrt(n*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 6) AS corr_value_k
FROM m
"""


def q_per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sampling: rank rows inside each source by
    a content hash and keep the first 5 — a uniform without-replacement
    sample per group that is identical on every engine/run/partitioning
    (the distributed replacement for per-group reservoir sampling; same
    hash-gate idea as corpus_mix_sample but with an exact per-group k).
    One shuffle on the group key; the window sorts within groups only."""
    docs = _t(spark, sf_dir, "documents")
    hsh = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(hsh, "doc_id")
    return (
        docs.select("source", "doc_id", "n_chars")
        .withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= 5)
    )


_PGSAMPLE_SQL = """
SELECT source, doc_id, n_chars, pick FROM (
  SELECT source, doc_id, n_chars,
    ROW_NUMBER() OVER (
      PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    ) AS pick
  FROM documents)
WHERE pick <= 5
"""


def q_nation_top_customers_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg WITHIN GROUP, Spark 4): per
    nation, its top-3 customers by account balance concatenated in rank
    order. Rank runs partitioned by nation (parallel); the listagg input
    is 3 rows per nation, so the final aggregation is trivially small."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    top3 = (
        cust.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        top3.groupBy("n_name")
        .agg(
            F.expr(
                "listagg(c_name, ',') WITHIN GROUP (ORDER BY rank)"
            ).alias("top_customers"),
            F.count("*").alias("n_top"),
        )
        .select("n_name", "top_customers", "n_top")
    )


_LISTAGG_SQL = """
WITH ranked AS (
  SELECT n_name, c_name,
    ROW_NUMBER() OVER (
      PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rank
  FROM customer JOIN nation ON c_nationkey = n_nationkey)
SELECT n_name,
  string_agg(c_name, ',' ORDER BY rank) AS top_customers,
  COUNT(*) AS n_top
FROM ranked WHERE rank <= 3 GROUP BY n_name
"""


def q_scd2_user_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change stream: each user's
    event_type is treated as a mutable attribute; consecutive duplicate
    states compress away (lag), then each surviving change opens a
    validity interval closed by the next change (lead). valid_to NULL
    marks the current state. Two window passes partitioned by user —
    parallel across users, no self-join, the standard CDC->SCD2 build."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "ts", "event_id", F.col("event_type").alias("state"))
        .withColumn("prev_state", F.lag("state").over(w))
        .filter(
            F.col("prev_state").isNull() | (F.col("state") != F.col("prev_state"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


_SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type AS state,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
  FROM events),
changes AS (
  SELECT user_id, ts, event_id, state FROM ordered
  WHERE prev_state IS NULL OR state != prev_state)
SELECT user_id, state, ts AS valid_from,
  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM changes
"""


def q_scd2_state_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup over the SCD2 intervals: every user's state
    as of 2024-01-15 00:00. Interval containment on the already-built
    dimension — a filter, not a join, because validity intervals tile
    each user's timeline (the \"time travel\" read pattern)."""
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    ivals = q_scd2_user_state_intervals(spark, sf_dir)
    return (
        ivals.filter(
            (F.col("valid_from") <= cutoff)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > cutoff))
        )
        .select("user_id", "state", "valid_from")
        .orderBy("user_id")
    )


_SCD2_ASOF_SQL = f"""
WITH ivals AS ({_SCD2_SQL})
SELECT user_id, state, valid_from FROM ivals
WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
ORDER BY user_id
"""


def q_seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily revenue
    series: trend = centered 7-day moving average (decimal inside the
    frame), seasonal = mean detrended value per ISO weekday (recentered
    to sum to zero), residual = value - trend - seasonal. The explain-
    the-forecast companion to the Prophet/ridge forecaster, exact enough
    to hash-check cross-engine. Window + two tiny aggregates over the
    daily series — at 100 TB the daily rollup upstream is the reducer."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,10)")).cast("double"), 2
        ).alias("y")
    )
    wtrend = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.withColumn(
        "n_win", F.count("*").over(wtrend)
    ).withColumn(
        "trend",
        F.round(
            F.sum(F.col("y").cast("decimal(38,10)")).over(wtrend).cast("double")
            / F.col("n_win"),
            6,
        ),
    )
    detr = trended.withColumn("dt", F.round(F.col("y") - F.col("trend"), 6))
    dow_means = (
        detr.groupBy((F.weekday("day") + F.lit(1)).alias("isodow"))
        .agg(
            F.round(
                F.sum(F.col("dt").cast("decimal(38,10)")).cast("double")
                / F.count("*"),
                6,
            ).alias("s_raw")
        )
    )
    grand = dow_means.agg(
        F.round(
            F.sum(F.col("s_raw").cast("decimal(38,10)")).cast("double") / F.count("*"),
            6,
        ).alias("g")
    )
    seasonal = dow_means.crossJoin(F.broadcast(grand)).select(
        "isodow", F.round(F.col("s_raw") - F.col("g"), 6).alias("seasonal")
    )
    return (
        detr.join(
            F.broadcast(seasonal),
            (F.weekday("day") + F.lit(1)) == F.col("isodow"),
        )
        .select(
            "day",
            "y",
            "trend",
            "seasonal",
            F.round(F.col("y") - F.col("trend") - F.col("seasonal"), 6).alias(
                "residual"
            ),
        )
    )


_DECOMP_SQL = """
WITH daily AS (
  SELECT o_orderdate AS day,
    ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE), 2) AS y
  FROM orders GROUP BY o_orderdate),
trended AS (
  SELECT day, y,
    COUNT(*) OVER w AS n_win,
    ROUND(CAST(SUM(CAST(y AS DECIMAL(38,10))) OVER w AS DOUBLE) / COUNT(*) OVER w, 6) AS trend
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
detr AS (
  SELECT day, y, trend, ROUND(y - trend, 6) AS dt FROM trended),
dow_means AS (
  SELECT isodow(day) AS isodow,
    ROUND(CAST(SUM(CAST(dt AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 6) AS s_raw
  FROM detr GROUP BY isodow(day)),
grand AS (
  SELECT ROUND(CAST(SUM(CAST(s_raw AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 6) AS g
  FROM dow_means),
seasonal AS (
  SELECT isodow, ROUND(s_raw - g, 6) AS seasonal FROM dow_means CROSS JOIN grand)
SELECT d.day, d.y, d.trend, s.seasonal,
  ROUND(d.y - d.trend - s.seasonal, 6) AS residual
FROM detr d JOIN seasonal s ON isodow(d.day) = s.isodow
"""


def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) over parts: keep every part no other part
    strictly dominates on (cheaper price, larger size). Instead of the
    naive O(n^2) self-anti-join, the 2-D skyline reduces to a window scan:
    collapse to one row per distinct price with the max size at that price,
    take the running max of size over strictly-cheaper prices (rows frame
    on the per-price rollup = strict because prices are grouped), and keep
    parts whose size matches or exceeds it (dominance needs BOTH strict
    dims, so equal-size-but-cheaper does not dominate). The distinct-price
    frame grows with the part count, so the strictly-cheaper running max
    is the distributed exclusive running max (operators/ranking.py), and
    the join back is a plain equi-join (AQE may still broadcast it at
    runtime when it IS small) — O(n log n), no join explosion at 100 TB."""
    part = _t(spark, sf_dir, "part")
    per_price = part.groupBy("p_retailprice").agg(
        F.max("p_size").alias("max_size_at_price")
    )
    cheaper = RK.global_running_max(
        per_price,
        ["p_retailprice"],
        "max_size_at_price",
        "cheaper_max_size",
        exclusive=True,
    ).select("p_retailprice", "cheaper_max_size")
    return (
        part.join(cheaper, "p_retailprice")
        .filter(
            F.col("cheaper_max_size").isNull()
            | (F.col("p_size") >= F.col("cheaper_max_size"))
        )
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
    )


_SKYLINE_SQL = """
WITH per_price AS (
  SELECT p_retailprice, MAX(p_size) AS max_size_at_price
  FROM part GROUP BY p_retailprice),
cheaper AS (
  SELECT p_retailprice,
    MAX(max_size_at_price) OVER (ORDER BY p_retailprice
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cheaper_max_size
  FROM per_price)
SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size
FROM part p JOIN cheaper c ON p.p_retailprice = c.p_retailprice
WHERE c.cheaper_max_size IS NULL OR p.p_size >= c.cheaper_max_size
"""


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next event_type | current event_type), estimated from every adjacent
    pair in each user's timeline. One lag-free window pass (lead) + one
    aggregation — the sequence-model bootstrap for behavioral data. The
    per-src normalizer rides along via a second window over the grouped
    counts, so there is no extra self-join."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    counts = pairs.groupBy("src", "dst").agg(F.count("*").alias("n"))
    wsrc = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n") / F.sum("n").over(wsrc), 6).alias("p"),
    )


_MARKOV_SQL = """
WITH pairs AS (
  SELECT event_type AS src,
    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events),
counts AS (
  SELECT src, dst, COUNT(*) AS n FROM pairs
  WHERE dst IS NOT NULL GROUP BY src, dst)
SELECT src, dst, n,
  ROUND(n / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE), 6) AS p
FROM counts
"""


def q_twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per user over irregularly-spaced
    events: each observation holds until the next one, so TWAP =
    sum(value * dt) / sum(dt) with dt in exact integer microseconds
    (unix_micros == DuckDB epoch_us). The weighted sum aggregates in
    decimal — value*dt is one IEEE multiply (deterministic), only the
    reduction order needs taming. The standard finance/metrics estimator
    that plain avg() gets wrong on bursty streams."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    spans = (
        ev.select(
            "user_id",
            "value",
            F.unix_micros("ts").alias("t0"),
            F.unix_micros(F.lead("ts").over(w)).alias("t1"),
        )
        .filter(F.col("t1").isNotNull())
        .withColumn("dt", F.col("t1") - F.col("t0"))
    )
    return (
        spans.groupBy("user_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum("dt").alias("total_us"),
            F.round(
                F.sum((F.col("value") * F.col("dt")).cast("decimal(38,6)"))
                .cast("double")
                / F.sum("dt"),
                6,
            ).alias("twap"),
        )
        .filter(F.col("total_us") > 0)
    )


_TWAP_SQL = """
WITH spans AS (
  SELECT user_id, value,
    epoch_us(ts) AS t0,
    epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS t1
  FROM events),
d AS (
  SELECT user_id, value, t1 - t0 AS dt FROM spans WHERE t1 IS NOT NULL)
SELECT user_id, COUNT(*) AS n_spans, SUM(dt) AS total_us,
  ROUND(CAST(SUM(CAST(value * dt AS DECIMAL(38,6))) AS DOUBLE)
        / CAST(SUM(dt) AS DOUBLE), 6) AS twap
FROM d GROUP BY user_id HAVING SUM(dt) > 0
"""


def q_allocation_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder proration: split each order's total price across
    its line items proportionally to extended price, in EXACT integer
    cents — sum(alloc) == order total, always. floor-divide gives the
    base share, then the leftover cents (< n_items) go to the largest
    fractional remainders (total order via remainder desc, weight desc,
    linenumber). Pure int64 arithmetic end-to-end: no float drift on any
    engine, and the whole thing is two window passes over a single
    partition-by-orderkey shuffle — no self-join, linear at 100 TB."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_cents"),
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("total_cents"),
    )
    w_order = Window.partitionBy("l_orderkey")
    w_rank = Window.partitionBy("l_orderkey").orderBy(
        F.desc("rem"), F.desc("price_cents"), "l_linenumber"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn("sw", F.sum("price_cents").over(w_order))
        .withColumn("base", F.expr("(total_cents * price_cents) DIV sw"))
        .withColumn("rem", F.expr("(total_cents * price_cents) % sw"))
        .withColumn("rk", F.row_number().over(w_rank))
        .withColumn("leftover", F.col("total_cents") - F.sum("base").over(w_order))
        .select(
            "l_orderkey",
            "l_linenumber",
            "price_cents",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("leftover"), F.lit(1)).otherwise(F.lit(0))
            ).alias("alloc_cents"),
        )
    )


_PRORATE_SQL = """
WITH li AS (
  SELECT l_orderkey, l_linenumber,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents
  FROM lineitem),
j AS (
  SELECT li.*, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
  FROM li JOIN orders ON l_orderkey = o_orderkey),
b AS (
  SELECT *, SUM(price_cents) OVER (PARTITION BY l_orderkey) AS sw
  FROM j),
c AS (
  SELECT *, (total_cents * price_cents) // sw AS base,
            (total_cents * price_cents) % sw AS rem
  FROM b),
r AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY l_orderkey
      ORDER BY rem DESC, price_cents DESC, l_linenumber) AS rk,
    total_cents - SUM(base) OVER (PARTITION BY l_orderkey) AS leftover
  FROM c)
SELECT l_orderkey, l_linenumber, price_cents,
  base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS alloc_cents
FROM r
"""


def q_cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix over the event stream: users are
    cohorted by the ISO week of their first event; each later active week
    contributes one cell (cohort_week, week_offset) with the distinct-user
    count. All date/integer arithmetic (date_trunc('week') agrees across
    engines; the offset is an exact multiple of 7 days) — no floats to
    tame. Two aggregations plus one join that is broadcastable because the
    per-user first-seen table is |users|, tiny next to the event log."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("week_d")
    )
    firsts = ev.groupBy("user_id").agg(F.min("week_d").alias("cohort_week"))
    return (
        ev.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("week_d", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


_COHORT_SQL = """
WITH ev AS (
  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week_d FROM events),
firsts AS (
  SELECT user_id, MIN(week_d) AS cohort_week FROM ev GROUP BY user_id)
SELECT cohort_week,
  CAST(date_diff('day', cohort_week, week_d) / 7 AS INTEGER) AS week_offset,
  COUNT(DISTINCT ev.user_id) AS n_users
FROM ev JOIN firsts ON ev.user_id = firsts.user_id
GROUP BY cohort_week, week_offset
"""


def q_phonetic_word_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic-lite dedup over the part-name vocabulary: fingerprint each
    word as first letter + vowel-stripped tail (a soundex-style consonant
    skeleton that RE2 and Java regex agree on — no backreferences), then
    group words sharing a fingerprint. Surfaces spelling variants that
    exact dedup misses. Vocabulary extraction is explode + groupBy (all
    codegen); the grouping runs on the distinct-word set, which is tiny
    relative to the corpus at any scale."""
    words = (
        _t(spark, sf_dir, "part")
        .select(F.explode(F.split(F.upper("p_name"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    keyed = words.select(
        "w",
        F.concat(
            F.substring("w", 1, 1),
            F.regexp_replace(F.substring(F.col("w"), 2, 1000), "[AEIOU]", ""),
        ).alias("fingerprint"),
    )
    return (
        keyed.groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_words"),
            F.array_join(F.array_sort(F.collect_list("w")), ",").alias("words"),
        )
        .filter(F.col("n_words") >= 2)
    )


_PHONETIC_SQL = """
WITH words AS (
  SELECT DISTINCT w
  FROM (SELECT unnest(string_split(upper(p_name), ' ')) AS w FROM part)
  WHERE w <> ''),
keyed AS (
  SELECT w, substr(w, 1, 1) || regexp_replace(substr(w, 2), '[AEIOU]', '', 'g')
    AS fingerprint
  FROM words)
SELECT fingerprint, COUNT(*) AS n_words,
  string_agg(w, ',' ORDER BY w) AS words
FROM keyed
GROUP BY fingerprint
HAVING COUNT(*) >= 2
"""


def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order, vs the
    global max order date), frequency (order count) and monetary (lifetime
    revenue, cents-rounded) per customer, each scored into quintiles with
    ntile(5). Every ntile ordering carries a custkey tie-break so the
    quintile assignment is a total order — identical across engines. One
    aggregation over orders (checkpointed once), then three distributed
    NTILE passes (operators/ranking.py) — the per-customer frame is
    fact-proportional, so each quintile split is a ranged shuffle +
    broadcast offsets, never a single-partition window."""
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count("*").alias("frequency"),
        _dsum_cents(F.col("o_totalprice")).alias("monetary"),
    )
    max_d = o.select(F.max(F.to_date("o_orderdate")).alias("max_d"))
    scored = (
        per_cust.crossJoin(F.broadcast(max_d))
        .withColumn("recency_days", F.datediff("max_d", "last_order"))
        .drop("max_d", "last_order")
    )
    out = RK.global_ntile(
        scored, ["recency_days", "o_custkey"], 5, col_name="r_score"
    )
    out = RK.global_ntile(
        out, [F.desc("frequency"), F.col("o_custkey")], 5, col_name="f_score"
    )
    out = RK.global_ntile(
        out, [F.desc("monetary"), F.col("o_custkey")], 5, col_name="m_score"
    )
    return out.select(
        F.col("o_custkey").alias("custkey"),
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
    )


_RFM_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
    MAX(CAST(o_orderdate AS DATE)) AS last_order,
    COUNT(*) AS frequency,
    ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE), 2)
      AS monetary
  FROM orders GROUP BY o_custkey),
scored AS (
  SELECT o_custkey,
    date_diff('day', last_order,
      (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)) AS recency_days,
    frequency, monetary
  FROM per_cust)
SELECT o_custkey AS custkey, recency_days, frequency, monetary,
  NTILE(5) OVER (ORDER BY recency_days, o_custkey) AS r_score,
  NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
  NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
FROM scored
"""


# Driver-local graph materialization bound: the trade-graph queries
# collect a DERIVED nation-keyed edge list (<= |nations|² = 625 rows by
# construction). That bound is a DATA property, not a plan property —
# so it is enforced, not just argued: a future caller pointing the same
# code at an unbounded key fails loudly instead of OOMing the driver.
_MAX_DRIVER_EDGES = 10_000


def _collect_bounded_edges(df: DataFrame, what: str) -> list:
    """Fetch at most the bound + 1 rows (LIMIT caps the transfer, so
    even a violating caller never ships the full edge list to the
    driver), then fail loudly past the bound."""
    rows = df.limit(_MAX_DRIVER_EDGES + 1).collect()
    if len(rows) > _MAX_DRIVER_EDGES:
        raise ValueError(
            f"{what}: derived edge list exceeds {_MAX_DRIVER_EDGES} rows; "
            "driver-local materialization is only sound for bounded "
            "(nation-keyed) graphs — use the distributed graph operators "
            "for unbounded keys"
        )
    return rows


def q_trade_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census on the nation trade graph: nations are vertices; an
    undirected edge joins two nations whose mutual trade volume (either
    direction) beats 1.05x the mean pair volume — a relative threshold so
    the graph sparsifies identically at every scale factor. Triangles are
    counted by the canonical a<b<c two-hop join. Integer counting on a
    <=25-vertex derived graph: the heavy lifting is the fact-table
    aggregation; the thresholded edge list (<= |nations|^2 rows) is
    materialized to the driver ONCE and re-created as a local DataFrame,
    so the three-way self-join never re-derives the fact aggregation —
    without this, Spark re-planned the 5-table join under every alias
    (24 parquet scans in the census; the fact tables are now read only in
    the single edge-materialization job). The DuckDB twin needs
    MATERIALIZED CTEs for the same reason."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v"),
        )
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(_dsum(F.col("v")).alias("volume"))
    )
    mean_vol = vol.select((_dsum(F.col("volume")) / F.count("*")).alias("mv"))
    edge_rows = _collect_bounded_edges(
        vol.crossJoin(F.broadcast(mean_vol))
        .filter(F.col("volume") > 1.05 * F.col("mv"))
        .select("a", "b"),
        "trade_graph_triangles",
    )
    edges = spark.createDataFrame(
        [(r.a, r.b) for r in edge_rows] or [(None, None)], "a bigint, b bigint"
    ).filter(F.col("a").isNotNull())
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")),
        )
        .select(
            F.col("e1.a").alias("na"),
            F.col("e1.b").alias("nb"),
            F.col("e2.b").alias("nc"),
        )
    )
    return tri.groupBy().agg(
        F.count("*").alias("n_triangles"),
        F.count_distinct("na", "nb", "nc").alias("n_distinct"),
    )


_TRIANGLE_SQL = """
WITH vol AS MATERIALIZED (
  SELECT LEAST(s_nationkey, c_nationkey) AS a,
         GREATEST(s_nationkey, c_nationkey) AS b,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10)))
              AS DOUBLE) AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey <> c_nationkey
  GROUP BY 1, 2),
mv AS (
  SELECT CAST(SUM(CAST(volume AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS mv
  FROM vol),
edges AS MATERIALIZED (
  -- MATERIALIZED on vol+edges: inlined, DuckDB re-expands the fact
  -- aggregation under every self-join alias and the plan blows up at sf0.1
  SELECT a, b FROM vol, mv WHERE volume > 1.05 * mv),
tri AS (
  SELECT e1.a AS na, e1.b AS nb, e2.b AS nc
  FROM edges e1
  JOIN edges e2 ON e1.b = e2.a
  JOIN edges e3 ON e1.a = e3.a AND e2.b = e3.b)
SELECT COUNT(*) AS n_triangles,
  COUNT(DISTINCT (na, nb, nc)) AS n_distinct
FROM tri
"""


def q_funnel_sequence_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching over per-user event timelines: compress
    each user's time-ordered event types to an initials string (s/v/c/p/e)
    and regex-match the signup->view->purchase funnel with arbitrary gaps
    — the MATCH_RECOGNIZE-lite idiom. The ordered compression is a sorted
    collect_list inside one groupBy (a single shuffle keyed by user);
    the regex runs once per user on a short string, not per event."""
    ev = _t(spark, sf_dir, "events")
    seqs = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"), F.substring("event_type", 1, 1).alias("i")
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.concat_ws("", F.transform(F.array_sort(F.collect_list("s")), lambda x: x["i"])).alias(
                "seq"
            )
        )
    )
    return seqs.select(
        "user_id",
        F.length("seq").alias("n_events"),
        F.col("seq").rlike("s.*v.*p").alias("funnel_hit"),
        F.length(F.regexp_replace("seq", "[^p]", "")).alias("n_purchases"),
    )


_FUNNEL_SEQ_SQL = """
WITH seqs AS (
  SELECT user_id,
    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id)
SELECT user_id, LENGTH(seq) AS n_events,
  regexp_matches(seq, 's.*v.*p') AS funnel_hit,
  LENGTH(regexp_replace(seq, '[^p]', '', 'g')) AS n_purchases
FROM seqs
"""


def q_ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily order revenue with a
    half-life of one day, truncated to a 16-day kernel. The whole kernel
    is INTEGER arithmetic end-to-end: daily revenue in cents (exact int64)
    scaled by 2^(15-lag) via shiftleft, summed, and floored to micro-
    dollars with a split quotient/remainder integer division — no libm,
    no float division, no ROUND (a real 6dp half-up/half-even tie showed
    up at sf0.01). The kernel is a bounded day-index band join
    (16 rows per day) — linear in days, no unbounded window state,
    scale-safe."""
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(_dsum_cents(F.col("o_totalprice")).alias("revenue"))
        .withColumn("idx", F.row_number().over(Window.orderBy("d")))
    )
    daily = daily.withColumn(
        "rev_cents", F.round(F.col("revenue") * 100).cast("bigint")
    )
    cur, past = daily.alias("cur"), daily.alias("past")
    joined = cur.join(
        past,
        (F.col("past.idx") <= F.col("cur.idx"))
        & (F.col("past.idx") > F.col("cur.idx") - 16),
    ).select(
        F.col("cur.d").alias("d"),
        F.col("cur.revenue").alias("revenue"),
        (F.lit(15) - (F.col("cur.idx") - F.col("past.idx"))).alias("shift"),
        F.col("past.rev_cents").alias("rev_cents"),
    )
    # exact floor at micro-dollar precision: num/(den*100) dollars, scaled
    # by 1e6 via split quotient/remainder so every intermediate fits int64.
    # No float division, no ROUND — immune to half-up/half-even tie drift.
    return (
        joined.groupBy("d", "revenue")
        .agg(
            F.sum(F.expr("rev_cents * shiftleft(1L, shift)")).alias("num"),
            (F.sum(F.expr("shiftleft(1L, shift)")) * 100).alias("d2"),
        )
        .select(
            "d",
            "revenue",
            F.expr(
                "(num DIV d2) * 1000000 + ((num % d2) * 1000000) DIV d2"
            ).alias("ewma_micro"),
        )
    )


_EWMA_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE), 2)
      AS revenue
  FROM orders GROUP BY 1),
idxd AS (
  SELECT d, revenue, CAST(ROUND(revenue * 100) AS BIGINT) AS rev_cents,
    ROW_NUMBER() OVER (ORDER BY d) AS idx
  FROM daily),
joined AS (
  SELECT cur.d, cur.revenue,
    15 - (cur.idx - past.idx) AS shift, past.rev_cents
  FROM idxd cur JOIN idxd past
    ON past.idx <= cur.idx AND past.idx > cur.idx - 16),
agg AS (
  SELECT d, revenue,
    SUM(rev_cents * (1::BIGINT << shift)) AS num,
    SUM(1::BIGINT << shift) * 100 AS d2
  FROM joined GROUP BY d, revenue)
SELECT d, revenue,
  (num // d2) * 1000000 + ((num % d2) * 1000000) // d2 AS ewma_micro
FROM agg
"""


def q_pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the directed nation trade graph (supplier
    nation -> customer nation, edge weight = trade volume). Genuinely
    iterative — k rounds of join+aggregate with lineage cuts — but the
    iteration count is FIXED (10), so the DuckDB twin unrolls the power
    iteration into 10 generated CTE stages over the identical edge
    derivation and hash-checks the 6dp-rounded ranks; the numpy parity
    test (tests/test_graph.py) independently pins the operator."""
    from .operators.graph import pagerank

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
    )
    pr = pagerank(edges, weight="volume", iterations=10, damping=0.85)
    return pr.select(
        F.col("node").alias("nationkey"), F.round("rank", 6).alias("rank")
    )


def _pagerank_sql(iterations: int = 10) -> str:
    """Unrolled power-iteration twin of operators/graph.pagerank: one CTE
    trio (dangling mass, contributions, new ranks) per round, mirroring
    the operator's float algebra — (1.0 - 0.85) evaluates to the same
    IEEE double in both engines, and all cross-row sums feed a 6dp round."""
    stages = []
    for k in range(1, iterations + 1):
        prev = f"r{k - 1}"
        stages.append(f"""
d{k} AS (
  SELECT COALESCE(SUM(r.rank), 0.0) AS dm
  FROM {prev} r JOIN dangling d ON r.node = d.node),
c{k} AS (
  SELECT nm.dst, SUM(nm.frac * r.rank) AS c
  FROM norm nm JOIN {prev} r ON nm.src = r.node GROUP BY nm.dst),
r{k} AS (
  SELECT n.node,
    (1.0 - 0.85) / nn.n + 0.85 * (COALESCE(c.c, 0.0) + d{k}.dm / nn.n) AS rank
  FROM nodes n CROSS JOIN nn CROSS JOIN d{k} LEFT JOIN c{k} c ON c.dst = n.node)""")
    return f"""
WITH edges AS MATERIALIZED (
  SELECT s_nationkey AS src, c_nationkey AS dst,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10)))
         AS DOUBLE) AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey <> c_nationkey
  GROUP BY 1, 2),
nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
out_w AS MATERIALIZED (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
norm AS MATERIALIZED (
  SELECT e.src, e.dst, e.w / o.ow AS frac FROM edges e JOIN out_w o USING (src)),
dangling AS MATERIALIZED (
  SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM out_w)),
r0 AS (SELECT node, 1.0 / n AS rank FROM nodes, nn),
{",".join(stages)}
SELECT node AS nationkey, round(rank, 6) AS rank FROM r{iterations}
"""


_PAGERANK_SQL = _pagerank_sql(10)


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of each document's token distribution — the
    classic diversity/quality signal for training-data curation: near-zero
    entropy flags degenerate/repetitive documents. p*ln(p) terms aggregate
    in decimal (commutative), divided by a shared ln(2) literal so both
    engines compute the identical double. explode + two aggregations, all
    codegen — no Python in the hot path, linear in corpus size."""
    toks = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
    )
    counts = toks.groupBy("doc_id", "w").agg(F.count("*").alias("n"))
    p = F.col("n") / F.col("tot")
    return (
        counts.withColumn("tot", F.sum("n").over(Window.partitionBy("doc_id")))
        .groupBy("doc_id")
        .agg(
            F.min("tot").alias("n_tokens"),
            F.round(
                F.sum((-p * F.log(p)).cast("decimal(38,18)")).cast("double")
                / 0.6931471805599453,
                6,
            ).alias("entropy_bits"),
        )
    )


_ENTROPY_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
  FROM documents),
counts AS (
  SELECT doc_id, w, COUNT(*) AS n FROM toks WHERE w <> '' GROUP BY doc_id, w),
tot AS (
  SELECT *, SUM(n) OVER (PARTITION BY doc_id) AS tot FROM counts)
SELECT doc_id, MIN(tot) AS n_tokens,
  ROUND(
    CAST(SUM(CAST(-(n / CAST(tot AS DOUBLE)) * ln(n / CAST(tot AS DOUBLE))
                  AS DECIMAL(38,18))) AS DOUBLE) / 0.6931471805599453,
    6) AS entropy_bits
FROM tot GROUP BY doc_id
"""


def q_bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval over the document corpus for a fixed 3-term
    query — the standard lexical-search scorer (k1=1.2, b=0.75). tf/df/
    doclen are integers; idf and the saturation term are a fixed chain of
    IEEE ops identical on both engines; per-term scores aggregate in
    decimal so the 3-term sum is order-free. Top-20 with doc_id tie-break.
    One explode + two aggregations + a broadcast of the 3-row term stats —
    the inverted-index-free formulation that still scales linearly."""
    terms = ["spark", "join", "table"]
    toks = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
    )
    # ONE tokenization pass: per-doc length and the per-term counts come out
    # of the same groupBy (the explode is the expensive part — running it
    # once instead of per-statistic halves the scan+shuffle volume)
    grouped = toks.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.sum((F.col("w") == t).cast("long")).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    ).localCheckpoint(eager=True)
    # ^ materialized once: corpus stats, df and the scoring join all read
    # the per-doc aggregate (|docs| rows), so the corpus-wide tokenization
    # runs exactly one time instead of once per consumer subtree.
    corpus = grouped.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    )
    stack_expr = "stack({}, {}) as (w, tf)".format(
        len(terms), ", ".join(f"'{t}', tf_{i}" for i, t in enumerate(terms))
    )
    tf = (
        grouped.select("doc_id", "dl", F.expr(stack_expr))
        .filter(F.col("tf") > 0)
    )
    df_ = tf.groupBy("w").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(df_), "w").crossJoin(F.broadcast(corpus))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    avgdl = F.col("total_len") / F.col("n_docs")
    sat = (F.col("tf") * (1.2 + 1)) / (
        F.col("tf") + 1.2 * (1 - 0.75 + 0.75 * (F.col("dl") / avgdl))
    )
    return (
        scored.select("doc_id", (idf * sat).alias("term_score"))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("term_score").cast("decimal(38,18)")).cast("double"), 6
            ).alias("bm25")
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


_BM25_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
  FROM documents),
toks2 AS (SELECT doc_id, w FROM toks WHERE w <> ''),
doclen AS (SELECT doc_id, COUNT(*) AS dl FROM toks2 GROUP BY doc_id),
corpus AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM doclen),
tf AS (
  SELECT doc_id, w, COUNT(*) AS tf FROM toks2
  WHERE w IN ('spark', 'join', 'table') GROUP BY doc_id, w),
df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
scored AS (
  SELECT tf.doc_id,
    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
      * ((tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75
          * (dl / (CAST(total_len AS DOUBLE) / n_docs))))) AS term_score
  FROM tf JOIN df USING (w) JOIN doclen USING (doc_id), corpus)
SELECT doc_id,
  ROUND(CAST(SUM(CAST(term_score AS DECIMAL(38,18))) AS DOUBLE), 6) AS bm25
FROM scored GROUP BY doc_id
ORDER BY bm25 DESC, doc_id LIMIT 20
"""


def q_revenue_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive days where daily
    revenue strictly increased day-over-day. The island id is the classic
    row_number difference (day index minus run-local row_number), entirely
    integer/date arithmetic; revenue comparisons happen on the cents-
    rounded daily series so both engines see identical doubles. Returns
    the 10 longest rising streaks. Two window passes + one aggregate —
    no self-join, linear in days."""
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(_dsum_cents(F.col("o_totalprice")).alias("revenue"))
    )
    w = Window.orderBy("d")
    flagged = (
        daily.withColumn("idx", F.row_number().over(w))
        .withColumn("up", (F.col("revenue") > F.lag("revenue").over(w)).cast("int"))
        .filter(F.col("up") == 1)
    )
    w_up = Window.orderBy("idx")
    islands = flagged.withColumn(
        "grp", F.col("idx") - F.row_number().over(w_up)
    )
    return (
        islands.groupBy("grp")
        .agg(
            F.min("d").alias("start_d"),
            F.max("d").alias("end_d"),
            F.count("*").alias("streak_days"),
        )
        .drop("grp")
        .orderBy(F.desc("streak_days"), "start_d")
        .limit(10)
    )


_STREAK_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE), 2)
      AS revenue
  FROM orders GROUP BY 1),
flagged AS (
  SELECT d, revenue,
    ROW_NUMBER() OVER (ORDER BY d) AS idx,
    CASE WHEN revenue > LAG(revenue) OVER (ORDER BY d) THEN 1 ELSE 0 END AS up
  FROM daily),
ups AS (SELECT * FROM flagged WHERE up = 1),
islands AS (
  SELECT *, idx - ROW_NUMBER() OVER (ORDER BY idx) AS grp FROM ups)
SELECT MIN(d) AS start_d, MAX(d) AS end_d, COUNT(*) AS streak_days
FROM islands GROUP BY grp
ORDER BY streak_days DESC, start_d LIMIT 10
"""


def q_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap: event count and exact-decimal mean value per
    (ISO day-of-week, hour-of-day) cell — the 7x24 usage fingerprint.
    Pure integer bucketing (Spark weekday()+1 == DuckDB isodow) and one
    aggregation; the mean divides an exact decimal sum by the count in
    double. Single shuffle on a 168-key space — trivially scalable."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.weekday("ts") + 1).alias("isodow"),
            F.hour("ts").alias("hour"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                _dsum(F.col("value")) / F.count("*"), 6
            ).alias("avg_value"),
        )
    )


_HEATMAP_SQL = """
SELECT isodow(ts) AS isodow, hour(ts) AS hour, COUNT(*) AS n_events,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 6)
    AS avg_value
FROM events GROUP BY 1, 2
"""


def q_mad_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion per event type: exact median (percentile_cont
    0.5, R-7 linear interpolation in both engines) and the median absolute
    deviation — the outlier-resistant alternative to mean/stddev for
    telemetry with heavy tails. Outliers counted at the |v - med| > 3*MAD
    fence; both engines derive the fence through the identical op chain so
    the boundary double is bit-equal. Two grouped percentile passes."""
    ev = _t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.min("med").alias("med"),
        F.expr("percentile(adev, 0.5)").alias("mad"),
        F.count("*").alias("n"),
    )
    return (
        dev.join(
            F.broadcast(mad.select("event_type", F.col("mad").alias("mad2"))),
            "event_type",
        )
        .groupBy("event_type")
        .agg(
            F.sum((F.col("adev") > 3 * F.col("mad2")).cast("int")).alias("n_outliers")
        )
        .join(mad, "event_type")
        .select(
            "event_type",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n",
            "n_outliers",
        )
    )


_MAD_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type),
dev AS (
  SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
  FROM events e JOIN med m ON e.event_type = m.event_type),
mad AS (
  SELECT event_type, MIN(med) AS med, quantile_cont(adev, 0.5) AS mad,
    COUNT(*) AS n
  FROM dev GROUP BY event_type),
outl AS (
  SELECT d.event_type,
    SUM(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS n_outliers
  FROM dev d JOIN mad m ON d.event_type = m.event_type
  GROUP BY d.event_type)
SELECT o.event_type, ROUND(m.med, 6) AS med, ROUND(m.mad, 6) AS mad,
  m.n, o.n_outliers
FROM outl o JOIN mad m ON o.event_type = m.event_type
"""


def q_interval_merge_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval consolidation (the calendar/uptime-merge
    primitive): each event opens a 5-minute activity interval; per user,
    intervals that overlap or touch merge into islands via the running-max
    -of-end trick (a new island starts when ts > max end so far). All
    exact integer microseconds. One shuffle (partition by user) + two
    ordered window passes + one aggregation — no self-join, linear in
    events, the standard scale-safe formulation."""
    span_us = 300_000_000  # 5 minutes
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(span_us)).alias("e"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = ev.withColumn(
        "new_island",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_island = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("start_us"), F.max("e").alias("end_us")
    )
    return per_island.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.sum(F.col("end_us") - F.col("start_us")).alias("total_active_us"),
        F.max(F.col("end_us") - F.col("start_us")).alias("max_island_us"),
    )


_INTERVAL_SQL = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e, event_id
  FROM events),
flagged AS (
  SELECT *, CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY user_id
      ORDER BY s, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      -9223372036854775808) THEN 1 ELSE 0 END AS new_island
  FROM ev),
islands AS (
  SELECT *, SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged),
per_island AS (
  SELECT user_id, island, MIN(s) AS start_us, MAX(e) AS end_us
  FROM islands GROUP BY user_id, island)
SELECT user_id, COUNT(*) AS n_islands,
  SUM(end_us - start_us) AS total_active_us,
  MAX(end_us - start_us) AS max_island_us
FROM per_island GROUP BY user_id
"""


def q_attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each purchase is credited to the user's
    EARLIEST click in the preceding 7 days, found with an event-time RANGE
    frame (order by epoch-micros, range 7d preceding .. current row) — no
    as-of self-join, one window pass. Daily rollup reports purchases,
    attributed purchases, and the mean click->purchase latency (exact
    integer-microsecond sum / count, divided once in double)."""
    week_us = 7 * 24 * 3600 * 1_000_000
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.to_date("ts").alias("d"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-week_us, 0)
    )
    attributed = (
        ev.withColumn(
            "first_click_us",
            F.min(
                F.when(F.col("event_type") == "click", F.col("us"))
            ).over(w),
        )
        .filter(F.col("event_type") == "purchase")
    )
    return attributed.groupBy("d").agg(
        F.count("*").alias("n_purchases"),
        F.sum(F.col("first_click_us").isNotNull().cast("int")).alias("n_attributed"),
        F.round(
            F.sum(F.col("us") - F.col("first_click_us")).cast("double")
            / F.sum(F.col("first_click_us").isNotNull().cast("int")),
            1,
        ).alias("avg_latency_us"),
    )


_ATTRIB_SQL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, CAST(ts AS DATE) AS d
  FROM events),
attributed AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' THEN us END) OVER (
      PARTITION BY user_id ORDER BY us
      RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW) AS first_click_us
  FROM ev)
SELECT d, COUNT(*) AS n_purchases,
  SUM(CASE WHEN first_click_us IS NOT NULL THEN 1 ELSE 0 END) AS n_attributed,
  ROUND(CAST(SUM(us - first_click_us) AS DOUBLE)
        / SUM(CASE WHEN first_click_us IS NOT NULL THEN 1 ELSE 0 END), 1)
    AS avg_latency_us
FROM attributed WHERE event_type = 'purchase' GROUP BY d
"""


def q_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its region's revenue, in
    exact integer parts-per-million (nation_cents * 1e6 DIV region_cents)
    — the integer-floor idiom again, so no float division or ROUND can
    drift. One fact aggregation keyed by nation + broadcast dims + one
    window sum over the 25-row aggregate."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    per_nation = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "rev_cents"
            )
        )
    )
    w = Window.partitionBy("r_name")
    return per_nation.withColumn(
        "region_cents", F.sum("rev_cents").over(w)
    ).select(
        "r_name",
        "n_name",
        "rev_cents",
        F.expr("(rev_cents * 1000000) DIV region_cents").alias("share_ppm"),
    )


_SHARE_SQL = """
WITH per_nation AS (
  SELECT r_name, n_name,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name),
tot AS (
  SELECT *, SUM(rev_cents) OVER (PARTITION BY r_name) AS region_cents
  FROM per_nation)
SELECT r_name, n_name, rev_cents,
  (rev_cents * 1000000) // region_cents AS share_ppm
FROM tot
"""


def q_yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth in exact integer basis points:
    (year_cents - prev_cents) * 10000 DIV prev_cents. lag() over the
    per-year aggregate (a handful of rows) — the canonical reporting
    query, float-free."""
    o = _t(spark, sf_dir, "orders")
    yearly = o.groupBy(F.year("o_orderdate").alias("yr")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev_cents")
    )
    w = Window.orderBy("yr")
    return (
        yearly.withColumn("prev_cents", F.lag("rev_cents").over(w))
        .withColumn(
            "growth_bp",
            F.expr("(rev_cents - prev_cents) * 10000 DIV prev_cents"),
        )
        .select("yr", "rev_cents", "prev_cents", "growth_bp")
    )


_YOY_SQL = """
WITH yearly AS (
  SELECT year(o_orderdate) AS yr,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
  FROM orders GROUP BY 1),
lagged AS (
  SELECT *, LAG(rev_cents) OVER (ORDER BY yr) AS prev_cents FROM yearly)
SELECT yr, rev_cents, prev_cents,
  (rev_cents - prev_cents) * 10000 // prev_cents AS growth_bp
FROM lagged
"""


def q_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day, with EXACT sliding
    distinct counts: each active (day, user) pair fans out to the 7 target
    days it supports via explode(sequence(...)) and a count_distinct per
    target day — an equi-shuffle formulation (dedup -> bounded 7x explode
    -> groupBy), not an inequality self-join and not a window (Spark has
    no COUNT(DISTINCT) over frames). Stickiness is integer ppm, the
    float-free ratio idiom. Scales as 7x the (day,user) dedup output,
    which is already tiny next to the event log."""
    ev = _t(spark, sf_dir, "events")
    day_users = ev.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    bounds = ev.agg(F.max(F.to_date("ts")).alias("max_d"))
    fanned = (
        day_users.select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("d"), F.date_add(F.col("d"), 6), F.expr("interval 1 day")
                )
            ).alias("target_d"),
            F.col("d").alias("active_d"),
        )
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("target_d") <= F.col("max_d"))
    )
    per_day = fanned.groupBy("target_d").agg(
        F.count_distinct("user_id").alias("wau"),
        F.count_distinct(
            F.when(F.col("active_d") == F.col("target_d"), F.col("user_id"))
        ).alias("dau"),
    )
    return per_day.select(
        F.col("target_d").alias("d"),
        "dau",
        "wau",
        F.expr("(dau * 1000000) DIV wau").alias("stickiness_ppm"),
    ).filter(F.col("dau") > 0)


_DAUWAU_SQL = """
WITH day_users AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
bounds AS (SELECT MAX(CAST(ts AS DATE)) AS max_d FROM events),
fanned AS (
  SELECT user_id, d AS active_d,
    CAST(unnest(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY))
         AS DATE) AS target_d
  FROM day_users),
per_day AS (
  SELECT target_d,
    COUNT(DISTINCT user_id) AS wau,
    COUNT(DISTINCT CASE WHEN active_d = target_d THEN user_id END) AS dau
  FROM fanned, bounds WHERE target_d <= max_d
  GROUP BY target_d)
SELECT target_d AS d, dau, wau, (dau * 1000000) // wau AS stickiness_ppm
FROM per_day WHERE dau > 0
"""


def q_priority_topn_with_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N-with-others reporting rollup: per order year, the two most
    frequent order priorities keep their own rows and everything else
    collapses into an OTHER bucket — the standard dashboard legend shape.
    Rank ties break on the priority string so the cut is a total order.
    One aggregation + one small window over the (year x priority) grid +
    one re-aggregation; all integer counts."""
    o = _t(spark, sf_dir, "orders")
    counts = o.groupBy(
        F.year("o_orderdate").alias("yr"), "o_orderpriority"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("yr").orderBy(F.desc("n"), "o_orderpriority")
    ranked = counts.withColumn("rk", F.row_number().over(w))
    return (
        ranked.withColumn(
            "bucket",
            F.when(F.col("rk") <= 2, F.col("o_orderpriority")).otherwise(
                F.lit("OTHER")
            ),
        )
        .groupBy("yr", "bucket")
        .agg(F.sum("n").alias("n_orders"), F.count("*").alias("n_priorities"))
    )


_TOPN_OTHER_SQL = """
WITH counts AS (
  SELECT year(o_orderdate) AS yr, o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY 1, 2),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY yr
    ORDER BY n DESC, o_orderpriority) AS rk
  FROM counts)
SELECT yr,
  CASE WHEN rk <= 2 THEN o_orderpriority ELSE 'OTHER' END AS bucket,
  SUM(n) AS n_orders, COUNT(*) AS n_priorities
FROM ranked GROUP BY 1, 2
"""


def q_window_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking/navigation window functions in one pass over
    the per-customer revenue aggregate, partitioned by market segment:
    rank, dense_rank, percent_rank, cume_dist, first_value, nth_value(2)
    and the gap to the segment leader. The ordering is a total order
    (monetary desc, custkey) so every function is engine-deterministic;
    percent_rank/cume_dist are exact (k-1)/(n-1) rationals computed the
    same way on both sides. One fact aggregation + one window over the
    |customers| aggregate."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    per_cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "rev_cents"
            )
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("rev_cents"), "c_custkey"
    )
    wf = w.rowsBetween(Window.unboundedPreceding, 0)
    return per_cust.select(
        "c_custkey",
        "c_mktsegment",
        "rev_cents",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first_value("rev_cents").over(wf).alias("leader_cents"),
        F.nth_value("rev_cents", 2).over(wf).alias("runnerup_cents"),
        (F.first_value("rev_cents").over(wf) - F.col("rev_cents")).alias(
            "gap_to_leader"
        ),
    )


_WINFUNCS_SQL = """
WITH per_cust AS (
  SELECT c_custkey, c_mktsegment,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_custkey, c_mktsegment)
SELECT c_custkey, c_mktsegment, rev_cents,
  RANK() OVER w AS rnk,
  DENSE_RANK() OVER w AS drnk,
  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
  ROUND(CUME_DIST() OVER w, 6) AS cume,
  FIRST_VALUE(rev_cents) OVER wf AS leader_cents,
  NTH_VALUE(rev_cents, 2) OVER wf AS runnerup_cents,
  FIRST_VALUE(rev_cents) OVER wf - rev_cents AS gap_to_leader
FROM per_cust
WINDOW
  w AS (PARTITION BY c_mktsegment ORDER BY rev_cents DESC, c_custkey),
  wf AS (PARTITION BY c_mktsegment ORDER BY rev_cents DESC, c_custkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


_SQL_API_REPORT = """
WITH monthly AS (
  SELECT n_name,
    date_trunc('month', CAST(o_orderdate AS DATE)) AS mo,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS gross,
    COUNT(*) AS n_orders
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE o_orderstatus <> 'F'
  GROUP BY n_name, date_trunc('month', CAST(o_orderdate AS DATE))),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY mo
      ORDER BY gross DESC, n_name) AS rk
  FROM monthly)
SELECT CAST(mo AS DATE) AS mo, n_name, ROUND(gross, 2) AS gross, n_orders
FROM ranked WHERE rk <= 3
"""


def q_sql_api_monthly_leaders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-SQL front end: the exact report text runs through
    spark.sql() over registered temp views — same string (modulo nothing)
    DuckDB executes as the oracle. Demonstrates that the engine's SQL
    surface, not just the DataFrame combinators, is ANSI-portable:
    CTEs, named windows, month truncation, top-k per group."""
    for t in ["orders", "customer", "nation"]:
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_API_REPORT)



def _daily_cents(o: DataFrame, alias: str = "cents") -> DataFrame:
    """Day-grain exact-cents revenue series (d, <alias>) from orders —
    the shared input of the CUSUM/ACF/runs/Bollinger/drawdown/Haar
    time-series statistics family."""
    return o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(alias)
    )

def q_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis: parts co-purchased in the same order, with
    association lift. The pair generation is a self-join of the distinct
    (order, part) item set on the order key — per-order blowup is bounded
    by the order's line count (<= 7 in TPC-H), so the shuffle stays
    linear in |lineitem| at any scale. Lift is emitted as an EXACT
    integer (parts-per-million, floor division) so the cross-engine hash
    needs no float formatting: lift_ppm = n12 * N * 1e6 div (n1 * n2).
    int64-safe through sf~10 (n12*N*1e6 ~ 1e17); the decimal upgrade is
    a one-line cast. Top 50 by support with full tie-break."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    # tiny derived aggregates: materialize once so the a/b self-join does
    # not re-expand the distinct's subtree (cf. triangles lesson)
    items = items.localCheckpoint(eager=True)
    n_orders = items.select(F.count_distinct("ok").alias("n"))
    item_counts = items.groupBy("pk").agg(F.count("*").alias("cnt"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("p1"), F.col("b.pk").alias("p2"))
        .agg(F.count("*").alias("n12"))
        .filter(F.col("n12") >= 2)
    )
    return (
        pairs.join(F.broadcast(item_counts.withColumnRenamed("cnt", "n1")), pairs.p1 == F.col("pk"))
        .drop("pk")
        .join(F.broadcast(item_counts.withColumnRenamed("cnt", "n2")), F.col("p2") == F.col("pk"))
        .drop("pk")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "p1", "p2", "n12", "n1", "n2",
            F.expr("(n12 * n * 1000000L) div (n1 * n2)").alias("lift_ppm"),
        )
        .orderBy(F.desc("n12"), F.desc("lift_ppm"), "p1", "p2")
        .limit(50)
    )


_BASKET_SQL = """
WITH items AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
n_orders AS (SELECT COUNT(DISTINCT ok) AS n FROM items),
item_counts AS MATERIALIZED (SELECT pk, COUNT(*) AS cnt FROM items GROUP BY pk),
pair_counts AS (
  SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS n12
  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
SELECT p1, p2, n12, c1.cnt AS n1, c2.cnt AS n2,
  (n12 * n * 1000000) // (c1.cnt * c2.cnt) AS lift_ppm
FROM pair_counts
JOIN item_counts c1 ON p1 = c1.pk
JOIN item_counts c2 ON p2 = c2.pk
CROSS JOIN n_orders
ORDER BY n12 DESC, lift_ppm DESC, p1, p2 LIMIT 50
"""


def q_regression_trend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS (regr_slope/regr_intercept twin) of
    monthly revenue on a month index, one slope per nation. Native
    regr_* stream doubles and are not cross-engine reproducible; instead
    the five power sums (n, Σx, Σy, Σxy, Σx²) are EXACT integers (x =
    month index, y = cents), and the slope/intercept algebra runs on
    exact int64 numerators/denominators with one final double division —
    bit-identical across engines. One fact aggregation (month grain) +
    one 25-row aggregation; sums stay int64-safe through sf~10."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            (
                (F.year(F.col("o_orderdate").cast("date")) - F.lit(1992)) * 12
                + F.month(F.col("o_orderdate").cast("date")) - 1
            ).alias("x"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("n_name", "x")
        .agg(F.sum("cents").alias("y"))
    )
    sums = monthly.groupBy("n_name").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return sums.select(
        "n_name",
        "n",
        F.round(num.cast("double") / den.cast("double"), 6).alias("slope_cents_per_month"),
        F.round(
            (F.col("sy") * den - num * F.col("sx")).cast("double")
            / (F.col("n") * den).cast("double"),
            6,
        ).alias("intercept_cents"),
    )


_REGRESSION_SQL = """
WITH monthly AS (
  SELECT n_name,
    (year(CAST(o_orderdate AS DATE)) - 1992) * 12
      + month(CAST(o_orderdate AS DATE)) - 1 AS x,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS y
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2),
sums AS (
  SELECT n_name, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM monthly GROUP BY 1)
SELECT n_name, n,
  ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_cents_per_month,
  ROUND(CAST(sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx AS DOUBLE)
        / CAST(n * (n * sxx - sx * sx) AS DOUBLE), 6) AS intercept_cents
FROM sums
"""


def q_chi_square_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence on the market-segment ×
    order-priority contingency table, computed with window marginals
    (zero extra joins: one fact aggregation to the 25-cell table, then
    three window sums over it). Counts are exact integers; expected
    value and the chi² contribution are evaluated with explicit
    multiplication (no POWER) in double from those integers — identical
    IEEE results on both engines, rounded at 6dp."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cells = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count("*").alias("obs"))
    )
    w_seg = Window.partitionBy("seg")
    w_pri = Window.partitionBy("pri")
    w_all = Window.partitionBy()
    with_marg = cells.select(
        "seg", "pri", "obs",
        F.sum("obs").over(w_seg).alias("row_tot"),
        F.sum("obs").over(w_pri).alias("col_tot"),
        F.sum("obs").over(w_all).alias("n"),
    )
    exp = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col("n").cast("double")
    dev = F.col("obs").cast("double") - exp
    return with_marg.select(
        "seg", "pri", "obs",
        F.round(exp, 6).alias("expected"),
        F.round(dev * dev / exp, 6).alias("chi2_contrib"),
    )


_CHI2_SQL = """
WITH cells AS (
  SELECT c_mktsegment AS seg, o_orderpriority AS pri, COUNT(*) AS obs
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2),
marg AS (
  SELECT seg, pri, obs,
    SUM(obs) OVER (PARTITION BY seg) AS row_tot,
    SUM(obs) OVER (PARTITION BY pri) AS col_tot,
    SUM(obs) OVER () AS n
  FROM cells)
SELECT seg, pri, obs,
  ROUND(CAST(row_tot * col_tot AS DOUBLE) / CAST(n AS DOUBLE), 6) AS expected,
  ROUND((CAST(obs AS DOUBLE) - CAST(row_tot * col_tot AS DOUBLE) / CAST(n AS DOUBLE))
        * (CAST(obs AS DOUBLE) - CAST(row_tot * col_tot AS DOUBLE) / CAST(n AS DOUBLE))
        / (CAST(row_tot * col_tot AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS chi2_contrib
FROM marg
"""


def q_cusum_breakpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point candidates on the daily revenue series: the
    cumulative deviation from the global mean, S_t = Σ_{i<=t}(x_i - x̄),
    peaks where the level shifts. Computed INTEGER-EXACT by scaling by n
    (S_t·n = n·P_t - t·T with P_t the cents prefix sum, T the total):
    no mean division, no doubles anywhere. One day-grain aggregation,
    one global-order window (day count rows, not fact rows), top 10 by
    |S·n| with date tie-break. n·P_t stays int64 through sf~100."""
    o = _t(spark, sf_dir, "orders")
    daily = _daily_cents(o, "cents")
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "d", "cents",
        F.row_number().over(Window.orderBy("d")).alias("i"),
        F.sum("cents").over(w).alias("p"),
    )
    tot = daily.agg(
        F.count("*").alias("n"), F.sum("cents").alias("t")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "d", "cents",
            (F.col("n") * F.col("p") - F.col("i") * F.col("t")).alias("s_scaled"),
        )
        .orderBy(F.abs(F.col("s_scaled")).desc(), "d")
        .limit(10)
    )


_CUSUM_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
tot AS (SELECT COUNT(*) AS n, SUM(cents) AS t FROM daily),
cum AS (
  SELECT d, cents, ROW_NUMBER() OVER (ORDER BY d) AS i,
         SUM(cents) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM daily)
SELECT d, cents, n * p - i * t AS s_scaled
FROM cum CROSS JOIN tot
ORDER BY ABS(n * p - i * t) DESC, d LIMIT 10
"""


def q_event_type_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining (order-3): the most frequent event-type
    trigrams across per-user timelines. Two LEADs over the (user, time)
    window — the ordering is a total order (ts, event_id) so the
    sequence is engine-deterministic — then one count aggregation over
    at most |types|³ groups. Scales as one shuffle keyed by user plus
    one tiny aggregation; no per-user collect."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .select(F.concat_ws(">", "e1", "e2", "e3").alias("trigram"))
        .groupBy("trigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "trigram")
        .limit(20)
    )


_TRIGRAM_SQL = """
WITH seq AS (
  SELECT event_type AS e1,
    LEAD(event_type, 1) OVER w AS e2,
    LEAD(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT e1 || '>' || e2 || '>' || e3 AS trigram, COUNT(*) AS n
FROM seq WHERE e3 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, trigram LIMIT 20
"""


def q_khop_nation_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-hop reachability (<= 4 hops) over the DIRECTED trade
    graph (supplier nation -> customer nation, edges kept where pair
    volume beats 1.05x the mean), from the hub: the nation with the
    most qualifying out-edges (tie-break: lowest key). The Spark side runs
    the iterative frontier-expansion BFS operator
    (operators/graph.bfs_distances); the oracle is a DuckDB RECURSIVE
    CTE over the identical edge derivation — an iterative DataFrame
    loop hash-checked against recursive SQL. Edge volumes use the exact
    decimal-sum shape, so the threshold comparison sees bit-identical
    doubles on both sides (same guarantee the triangle census relies
    on). The thresholded edge list (<= |nations|²) is collected once,
    so BFS rounds never re-run the fact aggregation."""
    from .operators.graph import bfs_distances

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
    )
    # vol feeds both the mean and the edge filter; without a cut the
    # 3-table fact join subtree would be derived twice in one action
    # (cf. triangles lesson). ≤ |nations|² rows, so the checkpoint is tiny.
    vol = vol.localCheckpoint(eager=True)
    mean_vol = vol.select((_dsum(F.col("volume")) / F.count("*")).alias("mv"))
    edge_rows = _collect_bounded_edges(
        vol.crossJoin(F.broadcast(mean_vol))
        .filter(F.col("volume") > 1.05 * F.col("mv"))
        .select("src", "dst"),
        "khop_nation_reachability",
    )
    edges = spark.createDataFrame(
        [(r.src, r.dst) for r in edge_rows] or [(None, None)], "src int, dst int"
    ).filter(F.col("src").isNotNull())
    out_deg: dict[int, int] = {}
    for r in edge_rows:
        out_deg[r.src] = out_deg.get(r.src, 0) + 1
    hub = min(out_deg, key=lambda k: (-out_deg[k], k)) if out_deg else 0
    return bfs_distances(edges, hub, max_hops=4).orderBy("dist", "node")


_KHOP_SQL = """
WITH RECURSIVE vol AS MATERIALIZED (
  SELECT s_nationkey AS src, c_nationkey AS dst,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10)))
         AS DOUBLE) AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey <> c_nationkey
  GROUP BY 1, 2),
mv AS (
  SELECT CAST(SUM(CAST(volume AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS mv
  FROM vol),
edges AS MATERIALIZED (
  SELECT CAST(src AS INT) AS src, CAST(dst AS INT) AS dst
  FROM vol, mv WHERE volume > 1.05 * mv),
hub AS (
  SELECT src AS h FROM edges GROUP BY src
  ORDER BY COUNT(*) DESC, src LIMIT 1),
hops AS (
  SELECT (SELECT h FROM hub) AS node, 0 AS dist
  UNION ALL
  SELECT e.dst, h.dist + 1
  FROM hops h JOIN edges e ON e.src = h.node
  WHERE h.dist < 4)
SELECT node, CAST(MIN(dist) AS INT) AS dist
FROM hops GROUP BY node ORDER BY dist, node
"""


def q_fifo_attribution_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO supply/demand matching (queue attribution / cost-basis
    allocation): each user's purchase spend consumes their view budget
    strictly first-in-first-out. The classic sequential algorithm becomes
    a set-based interval-overlap join: cumulative cents turn each view
    (supply) and purchase (demand) into a half-open interval, and FIFO
    matches are exactly the pairwise interval overlaps. Everything is
    int64 (cents prefix sums over a total (ts, event_id) order), the
    overlap join is equi on user + range on the cumsums, and output size
    is O(|events|) because FIFO chains are monotone. The 100 TB shape:
    one shuffle by user for the windows, one co-partitioned self-join."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")

    def intervals(df: DataFrame, typ: str, idx: str, lo: str, hi: str) -> DataFrame:
        return (
            df.filter(F.col("event_type") == typ)
            .select(
                "user_id", "ts", "event_id",
                F.round(F.col("value") * 100).cast("bigint").alias("cents"),
            )
            .select(
                "user_id",
                F.row_number().over(w).alias(idx),
                (F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0)) - F.col("cents")).alias(lo),
                F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(hi),
            )
        )

    sup = intervals(ev, "view", "s_idx", "s_lo", "s_hi").alias("s")
    dem = intervals(ev, "purchase", "d_idx", "d_lo", "d_hi").alias("d")
    return (
        sup.join(
            dem,
            (F.col("s.user_id") == F.col("d.user_id"))
            & (F.col("s_lo") < F.col("d_hi"))
            & (F.col("d_lo") < F.col("s_hi")),
        )
        .select(
            F.col("s.user_id").alias("user_id"),
            "d_idx", "s_idx",
            (F.least("s_hi", "d_hi") - F.greatest("s_lo", "d_lo")).alias("matched_cents"),
        )
    )


_FIFO_SQL = """
WITH sup AS (
  SELECT user_id,
    ROW_NUMBER() OVER w AS s_idx,
    SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w
      - CAST(ROUND(value * 100) AS BIGINT) AS s_lo,
    SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS s_hi
  FROM events WHERE event_type = 'view'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
dem AS (
  SELECT user_id,
    ROW_NUMBER() OVER w AS d_idx,
    SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w
      - CAST(ROUND(value * 100) AS BIGINT) AS d_lo,
    SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS d_hi
  FROM events WHERE event_type = 'purchase'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT s.user_id, d_idx, s_idx,
  LEAST(s_hi, d_hi) - GREATEST(s_lo, d_lo) AS matched_cents
FROM sup s JOIN dem d
  ON s.user_id = d.user_id AND s_lo < d_hi AND d_lo < s_hi
"""


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label covariance matrix entries for the first four embedding
    dimensions (feature-correlation screening before training). Native
    covar_pop streams doubles and is not reproducible; here each of the
    10 (i<=j) entries comes from exact decimal power sums (n, Σxi, Σxj,
    Σxixj) with the algebra done once in double — the same pattern as
    stats_moments, extended to array columns. Products are formed in
    double from exact float->double casts, so both engines hand the same
    values to the decimal accumulator. One scan, one aggregation."""
    em = _t(spark, sf_dir, "embeddings")
    dims = [F.col("embedding")[i].cast("double").alias(f"x{i}") for i in range(4)]
    base = em.select("label", *dims)
    aggs = [F.count("*").alias("n")]
    for i in range(4):
        aggs.append(F.sum(F.col(f"x{i}").cast("decimal(38,10)")).cast("double").alias(f"s{i}"))
    for i in range(4):
        for j in range(i, 4):
            aggs.append(
                F.sum((F.col(f"x{i}") * F.col(f"x{j}")).cast("decimal(38,10)"))
                .cast("double")
                .alias(f"p{i}{j}")
            )
    sums = base.groupBy("label").agg(*aggs)
    rows = []
    for i in range(4):
        for j in range(i, 4):
            cov = (
                F.col(f"p{i}{j}") / F.col("n")
                - (F.col(f"s{i}") / F.col("n")) * (F.col(f"s{j}") / F.col("n"))
            )
            rows.append(
                sums.select(
                    "label", F.lit(i).alias("i"), F.lit(j).alias("j"),
                    F.round(cov, 6).alias("cov"),
                )
            )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def _emb_cov_sql() -> str:
    cells = []
    for i in range(4):
        for j in range(i, 4):
            cells.append(
                f"SELECT label, {i} AS i, {j} AS j, "
                f"ROUND(p{i}{j} / n - (s{i} / n) * (s{j} / n), 6) AS cov FROM sums"
            )
    sum_cols = ["COUNT(*) AS n"] + [
        f"CAST(SUM(CAST(x{i} AS DECIMAL(38,10))) AS DOUBLE) AS s{i}" for i in range(4)
    ] + [
        f"CAST(SUM(CAST(x{i} * x{j} AS DECIMAL(38,10))) AS DOUBLE) AS p{i}{j}"
        for i in range(4) for j in range(i, 4)
    ]
    dim_cols = ", ".join(
        f"CAST(embedding[{i + 1}] AS DOUBLE) AS x{i}" for i in range(4)
    )
    return (
        f"WITH base AS (SELECT label, {dim_cols} FROM embeddings),\n"
        f"sums AS (SELECT label, {', '.join(sum_cols)} FROM base GROUP BY label)\n"
        + "\nUNION ALL\n".join(cells)
    )


_EMB_COV_SQL = _emb_cov_sql()

# Benford's-law expected first-digit probabilities, hardcoded as exact
# decimal literals on BOTH sides so no engine ever evaluates log10.
_BENFORD_P = {
    1: "0.301029995664", 2: "0.176091259056", 3: "0.124938736608",
    4: "0.096910013008", 5: "0.079181246048", 6: "0.066946789631",
    7: "0.057991946978", 8: "0.051152522447", 9: "0.045757490561",
}


def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law fraud screen on order totals: observed first-
    significant-digit counts vs the log-law expectation, with per-digit
    chi² contributions. The first digit is taken from the cents integer
    (scaling by 100 never changes the first significant digit of a
    positive value). Expected probabilities are shared 12-dp literals —
    no log10 call in either engine — so expected counts and chi² terms
    are identical doubles. One scan, 9 output rows."""
    o = _t(spark, sf_dir, "orders")
    digits = (
        o.select(
            F.substring(
                F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").alias("obs"))
    )
    probs = spark.createDataFrame(
        [(d, float(p)) for d, p in _BENFORD_P.items()], "digit int, p double"
    )
    n_tot = digits.agg(F.sum("obs").alias("n"))
    exp = F.col("p") * F.col("n").cast("double")
    dev = F.col("obs").cast("double") - exp
    return (
        digits.join(F.broadcast(probs), "digit")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "digit", "obs",
            F.round(exp, 4).alias("expected"),
            F.round(dev * dev / exp, 6).alias("chi2_contrib"),
        )
    )


_BENFORD_SQL = (
    "WITH digits AS (\n"
    "  SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,\n"
    "         COUNT(*) AS obs\n"
    "  FROM orders GROUP BY 1),\n"
    "probs AS (SELECT * FROM (VALUES "
    # 'e0' forces a DOUBLE literal (correctly-rounded parse) — a bare
    # decimal literal would go through DECIMAL and double-round
    + ", ".join(f"({d}, {p}e0)" for d, p in _BENFORD_P.items())
    + ") AS t(digit, p)),\n"
    "tot AS (SELECT SUM(obs) AS n FROM digits)\n"
    "SELECT d.digit, obs,\n"
    "  ROUND(p * CAST(n AS DOUBLE), 4) AS expected,\n"
    "  ROUND((CAST(obs AS DOUBLE) - p * CAST(n AS DOUBLE))\n"
    "        * (CAST(obs AS DOUBLE) - p * CAST(n AS DOUBLE))\n"
    "        / (p * CAST(n AS DOUBLE)), 6) AS chi2_contrib\n"
    "FROM digits d JOIN probs ON d.digit = probs.digit CROSS JOIN tot\n"
)


def q_pareto_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) concentration per nation: the smallest customer
    count whose cumulative revenue reaches 80% of the nation total, and
    that count as exact ppm of the customer base. The 80% threshold is
    the integer comparison 5·cum >= 4·total (no percentage doubles),
    revenue is exact cents, ranking has a custkey tie-break, and the
    share is floor-division ppm — every output column is an integer.
    One fact aggregation + one per-nation window."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    per_cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("cents"), "c_custkey")
    ranked = per_cust.select(
        "n_name",
        F.row_number().over(w).alias("rk"),
        F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cents").over(Window.partitionBy("n_name")).alias("total"),
        F.count("*").over(Window.partitionBy("n_name")).alias("n_customers"),
    )
    return (
        ranked.filter(5 * F.col("cum") >= 4 * F.col("total"))
        .groupBy("n_name")
        .agg(
            F.min("rk").alias("n_top80"),
            F.first("n_customers").alias("n_customers"),
        )
        .select(
            "n_name", "n_top80", "n_customers",
            F.expr("(n_top80 * 1000000L) div n_customers").alias("share_ppm"),
        )
    )


_PARETO_SQL = """
WITH per_cust AS (
  SELECT n_name, c_custkey,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2),
ranked AS (
  SELECT n_name,
    ROW_NUMBER() OVER w AS rk,
    SUM(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    SUM(cents) OVER (PARTITION BY n_name) AS total,
    COUNT(*) OVER (PARTITION BY n_name) AS n_customers
  FROM per_cust
  WINDOW w AS (PARTITION BY n_name ORDER BY cents DESC, c_custkey))
SELECT n_name, MIN(rk) AS n_top80, MIN(n_customers) AS n_customers,
  (MIN(rk) * 1000000) // MIN(n_customers) AS share_ppm
FROM ranked WHERE 5 * cum >= 4 * total
GROUP BY n_name
"""


def q_gini_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue within each nation (the
    Lorenz-curve inequality measure). Sorted-rank formula G =
    (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) on exact cents with a custkey
    tie-break, so both engines rank identically; the two accumulators
    are int64 (Σi·x ≈ n²·x̄/2 stays under 2^63 through sf~1, decimal
    upgrade beyond). One fact aggregation + one per-nation window."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    per_cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
    )
    w = Window.partitionBy("n_name").orderBy("cents", "c_custkey")
    ranked = per_cust.select(
        "n_name", "cents", F.row_number().over(w).alias("i")
    )
    sums = ranked.groupBy("n_name").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("sx"),
        F.sum(F.col("i") * F.col("cents")).alias("six"),
    )
    return sums.select(
        "n_name", "n",
        F.round(
            (2 * F.col("six") - (F.col("n") + 1) * F.col("sx")).cast("double")
            / (F.col("n") * F.col("sx")).cast("double"),
            6,
        ).alias("gini"),
    )


_GINI_SQL = """
WITH per_cust AS (
  SELECT n_name, c_custkey,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2),
ranked AS (
  SELECT n_name, cents,
    ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY cents, c_custkey) AS i
  FROM per_cust),
sums AS (
  SELECT n_name, COUNT(*) AS n, SUM(cents) AS sx, SUM(i * cents) AS six
  FROM ranked GROUP BY 1)
SELECT n_name, n,
  ROUND(CAST(2 * six - (n + 1) * sx AS DOUBLE)
        / CAST(n * sx AS DOUBLE), 6) AS gini
FROM sums
"""


def q_acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily revenue series at lags
    1..14 (seasonality detection for the forecasting surface). Per-lag
    Pearson correlation over the index-aligned pairs: the series gets a
    dense row index, joins itself at offset k for all 14 lags via a
    lags spine, and every power sum (Σx, Σy, Σxy, Σx², Σy²) is an
    exact decimal accumulation of int64 cents products — the corr
    algebra runs once in double per lag (the stats_moments recipe).
    Products fit int64 through sf~0.5; cast-before-multiply upgrades
    beyond. Two shuffles (day grain, lag-join) regardless of scale."""
    o = _t(spark, sf_dir, "orders")
    daily = _daily_cents(o, "x")
    series = daily.select(
        F.row_number().over(Window.orderBy("d")).alias("i"), "x"
    )
    lags = spark.range(1, 15).select(F.col("id").cast("int").alias("k"))
    a, b = series.alias("a"), series.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b.i") == F.col("a.i") + F.col("k"))
        .select("k", F.col("a.x").alias("x"), F.col("b.x").alias("y"))
    )
    # cast to decimal BEFORE multiplying: an int64 cents product wraps
    # silently in non-ANSI Spark beyond ~sf0.5 while DuckDB raises, so
    # the divergence would be silent-wrong vs loud-fail. decimal(19,0)
    # operands keep the product width at 38 in both engines.
    dsum = lambda col: F.sum(col.cast("decimal(38,0)")).cast("double")  # noqa: E731
    d19 = lambda col: col.cast("decimal(19,0)")  # noqa: E731
    psum = lambda u, v: F.sum(d19(u) * d19(v)).cast("double")  # noqa: E731
    sums = pairs.groupBy("k").agg(
        F.count("*").alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        psum(F.col("x"), F.col("y")).alias("sxy"),
        psum(F.col("x"), F.col("x")).alias("sxx"),
        psum(F.col("y"), F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select("k", "n", F.round(num / den, 6).alias("acf"))


_ACF_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x
  FROM orders GROUP BY 1),
series AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, x FROM daily),
lags AS (SELECT CAST(unnest(generate_series(1, 14)) AS INT) AS k),
pairs AS (
  SELECT k, a.x AS x, b.x AS y
  FROM series a CROSS JOIN lags
  JOIN series b ON b.i = a.i + k),
sums AS (
  SELECT k, COUNT(*) AS n,
    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS syy
  FROM pairs GROUP BY k)
SELECT k, n,
  ROUND((n * sxy - sx * sy)
        / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS acf
FROM sums
"""


def q_survival_hazard_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time survival analysis (Kaplan-Meier ingredients) for
    signup -> first purchase: for each day-offset t with at least one
    conversion, the number at risk, the conversions, and the hazard
    d_t/n_t as exact ppm. Censoring: users who signed up but never
    purchased exit at the global last-observed date. n_t is a reversed
    cumulative sum over the per-day exit counts — one user-grain
    aggregation plus one tiny window; no per-user driver loop."""
    ev = _t(spark, sf_dir, "events")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    purchase = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    first_purchase = (
        signup.join(purchase, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    horizon = ev.agg(F.max(F.col("ts").cast("date")).alias("h"))
    exits = (
        signup.join(first_purchase, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("t1").isNotNull(),
                F.datediff(F.col("t1").cast("date"), F.col("t0").cast("date")),
            )
            .otherwise(F.datediff(F.col("h"), F.col("t0").cast("date")))
            .alias("t"),
            F.col("t1").isNotNull().cast("int").alias("converted"),
        )
        # t is a day offset between two in-corpus dates — bounded by the
        # calendar span (grows with time, not data volume); the census
        # proves it through the CASE rule (every branch is a datediff)
        .groupBy("t")
        .agg(
            F.count("*").alias("n_exits"),
            F.sum("converted").alias("d_events"),
        )
    )
    w_rev = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    return (
        exits.select(
            "t", "d_events", F.sum("n_exits").over(w_rev).alias("n_risk")
        )
        .filter(F.col("d_events") > 0)
        .select(
            "t", "n_risk", "d_events",
            F.expr("(d_events * 1000000L) div n_risk").alias("hazard_ppm"),
        )
    )


_SURVIVAL_SQL = """
WITH signup AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
first_purchase AS (
  SELECT s.user_id, MIN(e.ts) AS t1
  FROM signup s JOIN events e ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s.t0
  GROUP BY s.user_id),
horizon AS (SELECT MAX(CAST(ts AS DATE)) AS h FROM events),
exits AS (
  SELECT
    CASE WHEN t1 IS NOT NULL
         THEN date_diff('day', CAST(t0 AS DATE), CAST(t1 AS DATE))
         ELSE date_diff('day', CAST(t0 AS DATE), h) END AS t,
    COUNT(*) AS n_exits,
    SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS d_events
  FROM signup LEFT JOIN first_purchase USING (user_id) CROSS JOIN horizon
  GROUP BY 1),
curve AS (
  SELECT t, d_events,
    SUM(n_exits) OVER (ORDER BY t DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
  FROM exits)
SELECT t, n_risk, d_events,
  (d_events * 1000000) // n_risk AS hazard_ppm
FROM curve WHERE d_events > 0
"""


def q_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of daily revenue
    direction: day-over-day deltas become a +/- sign sequence (zero
    deltas excluded), runs are counted where consecutive signs differ,
    and the normal-approximation z-score comes from the exact integer
    counts (n⁺, n⁻, R) with the textbook mean/variance formula done
    once in double. Two windows over the day-grain series (delta, then
    lagged sign after the zero-filter); single-row output."""
    o = _t(spark, sf_dir, "orders")
    daily = _daily_cents(o, "x")
    w = Window.orderBy("d")
    signs = (
        daily.select("d", (F.col("x") - F.lag("x").over(w)).alias("delta"))
        .filter(F.col("delta").isNotNull() & (F.col("delta") != 0))
        .select("d", F.signum(F.col("delta").cast("double")).cast("int").alias("s"))
    )
    seq = signs.select(
        "s", F.lag("s").over(Window.orderBy("d")).alias("prev")
    )
    counts = seq.agg(
        F.sum((F.col("s") == 1).cast("int")).alias("n_pos"),
        F.sum((F.col("s") == -1).cast("int")).alias("n_neg"),
        (1 + F.sum((F.col("prev").isNotNull() & (F.col("s") != F.col("prev"))).cast("int"))).alias("n_runs"),
    )
    np_, nn, r = (
        F.col("n_pos").cast("double"),
        F.col("n_neg").cast("double"),
        F.col("n_runs").cast("double"),
    )
    mu = 1 + 2 * np_ * nn / (np_ + nn)
    var = (
        2 * np_ * nn * (2 * np_ * nn - np_ - nn)
        / ((np_ + nn) * (np_ + nn) * (np_ + nn - 1))
    )
    return counts.select(
        "n_pos", "n_neg", "n_runs",
        F.round((r - mu) / F.sqrt(var), 6).alias("z_score"),
    )


_RUNS_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x
  FROM orders GROUP BY 1),
deltas AS (
  SELECT d, x - LAG(x) OVER (ORDER BY d) AS delta FROM daily),
signs AS (
  SELECT d, CASE WHEN delta > 0 THEN 1 ELSE -1 END AS s
  FROM deltas WHERE delta IS NOT NULL AND delta <> 0),
seq AS (
  SELECT s, LAG(s) OVER (ORDER BY d) AS prev FROM signs),
counts AS (
  SELECT
    SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS n_pos,
    SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS n_neg,
    1 + SUM(CASE WHEN prev IS NOT NULL AND s <> prev THEN 1 ELSE 0 END) AS n_runs
  FROM seq)
SELECT n_pos, n_neg, n_runs,
  ROUND((CAST(n_runs AS DOUBLE)
         - (1 + 2.0 * n_pos * n_neg / (n_pos + n_neg)))
        / SQRT(2.0 * n_pos * n_neg * (2.0 * n_pos * n_neg - n_pos - n_neg)
               / (CAST(n_pos + n_neg AS DOUBLE) * (n_pos + n_neg) * (n_pos + n_neg - 1))), 6) AS z_score
FROM counts
"""


def q_phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval ("value table") over a positional token
    index — the capability BM25's bag-of-words ranking cannot express.
    Tokenization is posexplode of the whitespace split; adjacency is one
    LEAD over the (doc, position) window, so phrase hits are counted
    without a positions self-join. Scales as one shuffle keyed by doc;
    the index (doc, pos, token) is the standard inverted-index layout
    a real corpus would persist bucketed by token. Top 20 docs by hit
    count with doc_id tie-break."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    hits = (
        toks.select("doc_id", "tok", F.lead("tok").over(w).alias("nxt"))
        .filter((F.col("tok") == "value") & (F.col("nxt") == "table"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return hits.orderBy(F.desc("n_hits"), "doc_id").limit(20)


_PHRASE_SQL = """
WITH lists AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
toks AS (
  -- parallel unnest zips token with its ordinal (no WITH ORDINALITY in
  -- this DuckDB)
  SELECT doc_id, unnest(l) AS tok,
         unnest(generate_series(1, len(l))) AS pos
  FROM lists),
seq AS (
  SELECT doc_id, tok,
    LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM toks)
SELECT doc_id, COUNT(*) AS n_hits
FROM seq WHERE tok = 'value' AND nxt = 'table'
GROUP BY doc_id ORDER BY n_hits DESC, doc_id LIMIT 20
"""


def q_ccf_order_to_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between two fact tables' daily series
    — ordered revenue by ORDER date (x) vs shipped quantity by SHIP
    date (y) — at lags -7..+7 (positive k: shipping lags ordering by k
    days; TPC-H ships 1..121 days after ordering, so the physical lag
    structure is real). Same exact-decimal power-sum Pearson as the ACF
    query, but the pairing joins ON CALENDAR DATE shifted by the lag
    spine, so series gaps align correctly rather than by row index.
    Day-grain aggregations on both facts, one lag-join, 15-row output."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dx = _daily_cents(o, "x")
    dy = (
        li.groupBy(F.col("l_shipdate").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("y"))
    )
    lags = spark.range(-7, 8).select(F.col("id").cast("int").alias("k"))
    pairs = (
        dx.crossJoin(F.broadcast(lags))
        .join(dy.withColumnRenamed("d", "dy"), F.expr("dy = date_add(d, k)"))
        .select("k", "x", "y")
    )
    # cast to decimal BEFORE multiplying: an int64 cents product wraps
    # silently in non-ANSI Spark beyond ~sf0.5 while DuckDB raises, so
    # the divergence would be silent-wrong vs loud-fail. decimal(19,0)
    # operands keep the product width at 38 in both engines.
    dsum = lambda col: F.sum(col.cast("decimal(38,0)")).cast("double")  # noqa: E731
    d19 = lambda col: col.cast("decimal(19,0)")  # noqa: E731
    psum = lambda u, v: F.sum(d19(u) * d19(v)).cast("double")  # noqa: E731
    sums = pairs.groupBy("k").agg(
        F.count("*").alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        psum(F.col("x"), F.col("y")).alias("sxy"),
        psum(F.col("x"), F.col("x")).alias("sxx"),
        psum(F.col("y"), F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select("k", "n", F.round(num / den, 6).alias("ccf"))


_CCF_SQL = """
WITH dx AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x
  FROM orders GROUP BY 1),
dy AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
    SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS y
  FROM lineitem GROUP BY 1),
lags AS (SELECT CAST(unnest(generate_series(-7, 7)) AS INT) AS k),
pairs AS (
  SELECT k, x, y
  FROM dx CROSS JOIN lags
  JOIN dy ON dy.d = dx.d + to_days(k)),
sums AS (
  SELECT k, COUNT(*) AS n,
    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS syy
  FROM pairs GROUP BY k)
SELECT k, n,
  ROUND((n * sxy - sx * sy)
        / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS ccf
FROM sums
"""


def q_profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-profiling operator (the DESCRIBE-statistics surface
    every lakehouse engine ships): per column of ``orders`` — row count,
    null count, exact distinct count. A single aggregation computes all
    3×|columns| measures map-side, then unpivots to the long profile
    layout driver-side; nothing rescans the fact per column. Counts are
    integers, so the profile is hash-exact across engines."""
    o = _t(spark, sf_dir, "orders")
    cols = _PROFILE_COLUMNS  # shared with the oracle; fixture drift is
    # caught by tests/test_registry_consistency.py::test_profile_columns
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"dist_{c}"))
    wide = o.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', null_{c}, dist_{c}" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_expr}) AS (column_name, n_null, n_distinct)",
        "n_rows",
    ).select("column_name", "n_rows", "n_null", "n_distinct")


# ONE canonical column list drives both engines: the Spark query and the
# DuckDB twin cannot diverge on coverage; a registry test pins the list
# to the live fixture schema so silent drift surfaces as a test failure.
_PROFILE_COLUMNS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
]


def _profile_sql() -> str:
    cols = _PROFILE_COLUMNS
    parts = [
        f"SELECT '{c}' AS column_name, COUNT(*) AS n_rows, "
        f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_null, "
        f"COUNT(DISTINCT {c}) AS n_distinct FROM orders"
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


_PROFILE_SQL = _profile_sql()


def q_percentile_disc_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISCRETE percentiles (p50/p90/p99) of order value per
    market segment: the value physically present at rank ceil(q·n) in
    cents order — no interpolation, so the output is an integer and the
    hash needs no float discipline (the interpolating twin is
    percentiles_by_segment). Both engines use the identical row_number
    formulation; ranking ties break on orderkey. One fact shuffle, one
    window, 3 rows per segment."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            "o_orderkey",
        )
    )
    w = Window.partitionBy("seg").orderBy("cents", "o_orderkey")
    ranked = base.select(
        "seg", "cents",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("seg")).alias("n"),
    )
    qs = spark.createDataFrame([(50,), (90,), (99,)], "q int")
    return (
        ranked.crossJoin(F.broadcast(qs))
        .filter(F.col("rk") == F.ceil(F.col("q") * F.col("n") / 100))
        .select("seg", "q", F.col("cents").alias("value_cents"))
    )


_PCTL_DISC_SQL = """
WITH base AS (
  SELECT c_mktsegment AS seg,
    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey),
ranked AS (
  SELECT seg, cents,
    ROW_NUMBER() OVER (PARTITION BY seg ORDER BY cents, o_orderkey) AS rk,
    COUNT(*) OVER (PARTITION BY seg) AS n
  FROM base)
SELECT seg, q, cents AS value_cents
FROM ranked CROSS JOIN (SELECT unnest([50, 90, 99]) AS q) qs
WHERE rk = CEIL(q * n / 100.0)
"""


def q_bollinger_bands_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over daily revenue: 20-day trailing mean ± 2σ.
    The sliding frame accumulates exact decimal sums (Σx, Σx² in
    DECIMAL — double add/retract drift differs per engine, decimals
    don't), the mean/σ algebra runs in double once per row, and bands
    are rounded to cents. Population σ over the observed frame (shorter
    at the series head). One day-grain aggregation + one frame window."""
    o = _t(spark, sf_dir, "orders")
    daily = _daily_cents(o, "x")
    wf = Window.orderBy("d").rowsBetween(-19, 0)
    framed = daily.select(
        "d", "x",
        F.count("*").over(wf).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).over(wf).cast("double").alias("s"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).over(wf).cast("double").alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    sigma = F.sqrt(F.col("ss") / F.col("n") - mean * mean)
    return framed.select(
        "d", "x",
        F.round(mean, 2).alias("ma20"),
        F.round(mean - 2 * sigma, 2).alias("band_lo"),
        F.round(mean + 2 * sigma, 2).alias("band_hi"),
    )


_BOLLINGER_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x
  FROM orders GROUP BY 1),
framed AS (
  SELECT d, x,
    COUNT(*) OVER wf AS n,
    CAST(SUM(CAST(x AS DECIMAL(38,0))) OVER wf AS DOUBLE) AS s,
    CAST(SUM(CAST(x * x AS DECIMAL(38,0))) OVER wf AS DOUBLE) AS ss
  FROM daily
  WINDOW wf AS (ORDER BY d ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
SELECT d, x,
  ROUND(s / n, 2) AS ma20,
  ROUND(s / n - 2 * SQRT(ss / n - (s / n) * (s / n)), 2) AS band_lo,
  ROUND(s / n + 2 * SQRT(ss / n - (s / n) * (s / n)), 2) AS band_hi
FROM framed
"""


def q_max_drawdown_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative-revenue-minus-trend curve:
    for each day, the drop from the running peak of the detrended
    cumulative series (the CUSUM statistic reused as an equity curve),
    and the single worst (peak, trough) episode. Everything is the
    n-scaled integer arithmetic of the CUSUM query — running max and
    drawdown are int64 — so the output is hash-exact. Two global-order
    windows over the day-grain series; top-1 row."""
    o = _t(spark, sf_dir, "orders")
    daily = _daily_cents(o, "cents")
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "d",
        F.row_number().over(Window.orderBy("d")).alias("i"),
        F.sum("cents").over(w).alias("p"),
    )
    tot = daily.agg(F.count("*").alias("n"), F.sum("cents").alias("t"))
    curve = cum.crossJoin(F.broadcast(tot)).select(
        "d", (F.col("n") * F.col("p") - F.col("i") * F.col("t")).alias("equity")
    )
    dd = curve.select(
        "d", "equity",
        F.max("equity").over(Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)).alias("peak"),
    ).select(
        "d", "equity", "peak", (F.col("peak") - F.col("equity")).alias("drawdown")
    )
    return dd.orderBy(F.desc("drawdown"), "d").limit(1)


_DRAWDOWN_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
tot AS (SELECT COUNT(*) AS n, SUM(cents) AS t FROM daily),
curve AS (
  SELECT d,
    n * SUM(cents) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - ROW_NUMBER() OVER (ORDER BY d) * t AS equity
  FROM daily CROSS JOIN tot),
dd AS (
  SELECT d, equity,
    MAX(equity) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM curve)
SELECT d, equity, peak, peak - equity AS drawdown
FROM dd ORDER BY drawdown DESC, d LIMIT 1
"""


def q_haar_wavelet_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-level Haar wavelet decomposition of the daily revenue
    series (multi-resolution change detection): each level pairs
    consecutive samples into an approximation (sum) and a detail
    (difference), then recurses on the approximations. Unscaled integer
    Haar (no /√2 — cents stay int64; magnitudes at level L carry an
    implicit 2^(L/2) factor, irrelevant for within-level ranking). Each
    level is one groupBy on idx div 2 with parity-split sums; incomplete
    tail pairs are dropped. Output: top 5 |detail| per level with
    pair-index tie-break — the strongest day-pair, 2-day, and 4-day
    shocks. Three tiny aggregations after the day-grain shuffle."""
    o = _t(spark, sf_dir, "orders")
    daily = _daily_cents(o, "x")
    level = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1).alias("i"), "x"
    )
    outs = []
    for lvl in (1, 2, 3):
        paired = (
            level.select(F.expr("i div 2").alias("pi"), "i", "x")
            .groupBy("pi")
            .agg(
                F.sum(F.when(F.col("i") % 2 == 0, F.col("x"))).alias("even"),
                F.sum(F.when(F.col("i") % 2 == 1, F.col("x"))).alias("odd"),
                F.count("*").alias("cnt"),
            )
            .filter(F.col("cnt") == 2)
        )
        approx = paired.select(F.col("pi").alias("i"), (F.col("even") + F.col("odd")).alias("x"))
        detail = paired.select(
            F.lit(lvl).alias("level"),
            F.col("pi").alias("pair_idx"),
            (F.col("even") - F.col("odd")).alias("detail"),
        )
        w = Window.partitionBy("level").orderBy(
            F.abs(F.col("detail")).desc(), "pair_idx"
        )
        outs.append(
            detail.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
            .drop("rk")
        )
        level = approx
    out = outs[0]
    for o_ in outs[1:]:
        out = out.unionByName(o_)
    return out


_HAAR_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x
  FROM orders GROUP BY 1),
l0 AS (SELECT ROW_NUMBER() OVER (ORDER BY d) - 1 AS i, x FROM daily),
p1 AS (
  SELECT i // 2 AS i,
    SUM(CASE WHEN i % 2 = 0 THEN x END) AS even,
    SUM(CASE WHEN i % 2 = 1 THEN x END) AS odd,
    COUNT(*) AS cnt
  FROM l0 GROUP BY i // 2 HAVING COUNT(*) = 2),
l1 AS (SELECT i, even + odd AS x FROM p1),
p2 AS (
  SELECT i // 2 AS i,
    SUM(CASE WHEN i % 2 = 0 THEN x END) AS even,
    SUM(CASE WHEN i % 2 = 1 THEN x END) AS odd,
    COUNT(*) AS cnt
  FROM l1 GROUP BY i // 2 HAVING COUNT(*) = 2),
l2 AS (SELECT i, even + odd AS x FROM p2),
p3 AS (
  SELECT i // 2 AS i,
    SUM(CASE WHEN i % 2 = 0 THEN x END) AS even,
    SUM(CASE WHEN i % 2 = 1 THEN x END) AS odd,
    COUNT(*) AS cnt
  FROM l2 GROUP BY i // 2 HAVING COUNT(*) = 2),
details AS (
  SELECT 1 AS level, i AS pair_idx, even - odd AS detail FROM p1
  UNION ALL
  SELECT 2, i, even - odd FROM p2
  UNION ALL
  SELECT 3, i, even - odd FROM p3),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY level
    ORDER BY ABS(detail) DESC, pair_idx) AS rk
  FROM details)
SELECT level, pair_idx, detail FROM ranked WHERE rk <= 5
"""


_LATERAL_SQL = """
SELECT n_name, t.c_name, t.bal
FROM nation n, LATERAL (
  SELECT c_name, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal
  FROM customer WHERE c_nationkey = n.n_nationkey
  ORDER BY bal DESC, c_name LIMIT 2
) t
"""


def q_lateral_top_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (top-2-per-group as a dependent
    subquery): the same SQL string runs through spark.sql() and DuckDB
    — ANSI LATERAL parity, the second pure-SQL front-end query after
    sql_api_monthly_leaders. Catalyst decorrelates the LIMIT subquery
    into a ranked window rather than executing per-row, so the plan is
    one shuffle over customer, not |nation| probes. Balance in exact
    cents; (bal, name) total order."""
    for t in ["nation", "customer"]:
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


def q_ks_test_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic comparing the order-value
    distributions of the BUILDING vs MACHINERY segments — computed
    EXACTLY: D = max|F1-F2| is evaluated as max|cum1·n2 - cum2·n1| over
    the merged support (integer cents, integer counts), then emitted both
    as the exact scaled integer and as ppm. One fact aggregation to
    (value, per-segment counts); the cumulative counts over the
    fact-proportional distinct-value table come from the distributed
    running sum (operators/ranking.py). int64-safe: cum·n ≤
    |orders|² ≈ 2×10¹⁰ at sf1."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
            (F.col("c_mktsegment") == "BUILDING").cast("bigint").alias("is1"),
        )
    )
    counts = base.groupBy("v").agg(
        F.sum("is1").alias("c1"), F.sum(1 - F.col("is1")).alias("c2")
    )
    # distinct prices grow with the fact table, so the CDFs come from the
    # distributed running sum (ranged shuffle + broadcast offsets); the
    # totals are max(cumulative) off the same checkpointed frame — one
    # fact scan, no single-partition window
    cum = RK.global_running_sum(counts, ["v"], ["c1", "c2"], ["cum1", "cum2"])
    tot = cum.agg(
        F.max("cum1").cast("bigint").alias("n1"),
        F.max("cum2").cast("bigint").alias("n2"),
    )
    diffs = cum.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        F.abs(
            F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")
        ).alias("d_scaled"),
    )
    return diffs.groupBy("n1", "n2").agg(
        F.max("d_scaled").alias("d_scaled")
    ).select(
        "n1", "n2", "d_scaled",
        F.expr("(d_scaled * 1000000L) div (n1 * n2)").alias("d_ppm"),
    )


_KS_SQL = """
WITH base AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS is1
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
counts AS (
  SELECT v, SUM(is1) AS c1, SUM(1 - is1) AS c2 FROM base GROUP BY v),
diffs AS (
  SELECT
    SUM(c1) OVER wt AS n1,
    SUM(c2) OVER wt AS n2,
    ABS(SUM(c1) OVER w * SUM(c2) OVER wt - SUM(c2) OVER w * SUM(c1) OVER wt) AS d_scaled
  FROM counts
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wt AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
SELECT n1, n2, MAX(d_scaled) AS d_scaled,
  (MAX(d_scaled) * 1000000) // (n1 * n2) AS d_ppm
FROM diffs GROUP BY n1, n2
"""


def q_mannwhitney_u_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Mann-Whitney U for the same two segments. Rank sums
    stay EXACT under ties by working with doubled ranks: a tied group of
    c values after s predecessors carries doubled-average-rank 2s+c+1,
    so 2·R1 = Σ c1·(2s+c+1) is an integer, and 2·U1 = 2·R1 − n1(n1+1).
    The normal approximation with the tie-correction term Σ(t³−t) (also
    exact) runs once in double. Same grouped-value + distributed
    running-sum shape as the KS query. 2R1 ≤ n² ≈ 2×10¹⁰ at sf1 —
    int64-safe."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
            (F.col("c_mktsegment") == "BUILDING").cast("bigint").alias("is1"),
        )
    )
    counts = base.groupBy("v").agg(
        F.sum("is1").alias("c1"),
        F.sum(1 - F.col("is1")).alias("c2"),
        F.count("*").alias("c"),
    )
    # distinct prices grow with the fact table: the predecessor count s
    # comes from the distributed running sum; n1/n2 fold into the SAME
    # one-row aggregate over the checkpointed frame (the old second fact
    # scan for totals is gone)
    cum = RK.global_running_sum(counts, ["v"], ["c"], ["cumc"])
    terms = cum.select(
        "c1", "c2", "c",
        (F.col("cumc") - F.col("c")).alias("s"),
    )
    sums = terms.agg(
        F.sum(F.col("c1") * (2 * F.col("s") + F.col("c") + 1)).alias("r1_2"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias("tie3"),
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
    )
    j = sums.select(
        "n1", "n2",
        (F.col("r1_2") - F.col("n1") * (F.col("n1") + 1)).alias("u1_2"),
        "tie3",
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    nd = n1d + n2d
    mu2 = n1d * n2d  # doubled mean: 2 * n1*n2/2
    var = n1d * n2d / 12 * ((nd + 1) - F.col("tie3").cast("double") / (nd * (nd - 1)))
    return j.select(
        "n1", "n2", "u1_2", "tie3",
        F.round((F.col("u1_2").cast("double") - mu2) / (2 * F.sqrt(var)), 6).alias("z_score"),
    )


_MWU_SQL = """
WITH base AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS is1
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
counts AS (
  SELECT v, SUM(is1) AS c1, SUM(1 - is1) AS c2, COUNT(*) AS c
  FROM base GROUP BY v),
terms AS (
  SELECT c1, c,
    SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS s
  FROM counts),
sums AS (
  SELECT SUM(c1 * (2 * s + c + 1)) AS r1_2,
         SUM(c * c * c - c) AS tie3
  FROM terms),
tot AS (SELECT SUM(is1) AS n1, SUM(1 - is1) AS n2 FROM base)
SELECT n1, n2, r1_2 - n1 * (n1 + 1) AS u1_2, tie3,
  ROUND((CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE) - CAST(n1 AS DOUBLE) * n2)
        / (2 * SQRT(CAST(n1 AS DOUBLE) * n2 / 12
             * ((CAST(n1 AS DOUBLE) + n2 + 1)
                - CAST(tie3 AS DOUBLE)
                  / ((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2 - 1))))), 6) AS z_score
FROM sums CROSS JOIN tot
"""


def q_theilsen_trend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per nation: the median of all pairwise
    slopes of the monthly revenue series — the outlier-resistant twin of
    regression_trend_by_nation. Slopes are (Δcents/Δmonths) computed in
    double from exact integers (identical IEEE division both engines);
    the median is the DISCRETE lower median picked by row_number, so no
    interpolation ever mixes two doubles. Pair count is C(84,2)≈3.5k
    per nation — quadratic in MONTHS (the aggregate), constant in fact
    rows, which is what makes Theil-Sen feasible at any corpus scale."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            (
                (F.year(F.col("o_orderdate").cast("date")) - 1992) * 12
                + F.month(F.col("o_orderdate").cast("date")) - 1
            ).alias("x"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("y"))
        .localCheckpoint(eager=True)  # tiny; avoid re-deriving per alias
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    slopes = (
        a.join(
            b,
            (F.col("a.n_name") == F.col("b.n_name")) & (F.col("a.x") < F.col("b.x")),
        )
        .select(
            F.col("a.n_name").alias("n_name"),
            (
                (F.col("b.y") - F.col("a.y")).cast("double")
                / (F.col("b.x") - F.col("a.x")).cast("double")
            ).alias("slope"),
            F.col("a.x").alias("x1"),
            F.col("b.x").alias("x2"),
        )
    )
    w = Window.partitionBy("n_name").orderBy("slope", "x1", "x2")
    ranked = slopes.select(
        "n_name", "slope",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("n_name")).alias("cnt"),
    )
    return ranked.filter(F.expr("rk = (cnt + 1) div 2")).select(
        "n_name", "cnt", F.round("slope", 6).alias("theilsen_slope")
    )


_THEILSEN_SQL = """
WITH monthly AS MATERIALIZED (
  SELECT n_name,
    (year(CAST(o_orderdate AS DATE)) - 1992) * 12
      + month(CAST(o_orderdate AS DATE)) - 1 AS x,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS y
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2),
slopes AS (
  SELECT a.n_name,
    CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope,
    a.x AS x1, b.x AS x2
  FROM monthly a JOIN monthly b
    ON a.n_name = b.n_name AND a.x < b.x),
ranked AS (
  SELECT n_name, slope,
    ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY slope, x1, x2) AS rk,
    COUNT(*) OVER (PARTITION BY n_name) AS cnt
  FROM slopes)
SELECT n_name, cnt, ROUND(slope, 6) AS theilsen_slope
FROM ranked WHERE rk = (cnt + 1) // 2
"""


def q_interpurchase_time_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase-time distribution: days between a customer's
    consecutive orders (LAG over the per-customer date order, ties
    broken by orderkey), bucketed into weekly bins capped at 52+. All
    integer day arithmetic; one shuffle keyed by customer, then a tiny
    histogram aggregation."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").cast("date"), "o_orderkey"
    )
    gaps = (
        o.select(
            "o_custkey",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate").cast("date")).over(w),
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    return (
        gaps.select(
            F.least(F.expr("gap_days div 7"), F.lit(52)).alias("week_bucket")
        )
        .groupBy("week_bucket")
        .agg(F.count("*").alias("n_gaps"))
    )


_INTERPURCHASE_SQL = """
WITH gaps AS (
  SELECT date_diff('day',
      LAG(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
        ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
      CAST(o_orderdate AS DATE)) AS gap_days
  FROM orders)
SELECT LEAST(gap_days // 7, 52) AS week_bucket, COUNT(*) AS n_gaps
FROM gaps WHERE gap_days IS NOT NULL
GROUP BY 1
"""


def q_fano_factor_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness per event type: the Fano factor (variance/mean of the
    DAILY event-count series; 1 = Poisson, >1 = bursty). Daily counts
    are integers, so the power sums are exact int64 and the dispersion
    algebra runs once in double (population variance). Two aggregations:
    day×type grain, then per-type sums over ≤ days rows."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").alias("k"))
    )
    sums = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("k").alias("sk"),
        F.sum(F.col("k") * F.col("k")).alias("skk"),
    )
    n, sk, skk = (
        F.col("n_days").cast("double"),
        F.col("sk").cast("double"),
        F.col("skk").cast("double"),
    )
    mean = sk / n
    var = skk / n - mean * mean
    return sums.select(
        "event_type", "n_days", "sk",
        F.round(var / mean, 6).alias("fano_factor"),
    )


_FANO_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS k
  FROM events GROUP BY 1, 2),
sums AS (
  SELECT event_type, COUNT(*) AS n_days, SUM(k) AS sk, SUM(k * k) AS skk
  FROM daily GROUP BY 1)
SELECT event_type, n_days, sk,
  ROUND((CAST(skk AS DOUBLE) / n_days
         - (CAST(sk AS DOUBLE) / n_days) * (CAST(sk AS DOUBLE) / n_days))
        / (CAST(sk AS DOUBLE) / n_days), 6) AS fano_factor
FROM sums
"""


def q_winsorized_mean_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean (5%/95%) of order value per market segment:
    values outside the exact discrete p05/p95 fences clamp TO the fence,
    then the clamped cents average exactly (int64 sum / count in double,
    rounded to cents). The fences reuse the rank = ceil(q·n) discrete-
    percentile rule, joined back as one tiny broadcast. Robust-location
    twin of mad_robust_stats at a fraction of its passes."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            "o_orderkey",
        )
    )
    w = Window.partitionBy("seg").orderBy("cents", "o_orderkey")
    ranked = base.select(
        "seg", "cents",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("seg")).alias("n"),
    )
    fences = (
        ranked.filter(
            (F.col("rk") == F.ceil(F.col("n") * 5 / 100))
            | (F.col("rk") == F.ceil(F.col("n") * 95 / 100))
        )
        .groupBy("seg")
        .agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    )
    clamped = base.join(F.broadcast(fences), "seg").select(
        "seg", F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("cents"))).alias("wc")
    )
    return clamped.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.round(F.sum("wc").cast("double") / F.count("*"), 2).alias("winsorized_mean_cents"),
    )


_WINSOR_SQL = """
WITH base AS (
  SELECT c_mktsegment AS seg,
    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey),
ranked AS (
  SELECT seg, cents,
    ROW_NUMBER() OVER (PARTITION BY seg ORDER BY cents, o_orderkey) AS rk,
    COUNT(*) OVER (PARTITION BY seg) AS n
  FROM base),
fences AS (
  SELECT seg, MIN(cents) AS lo, MAX(cents) AS hi
  FROM ranked
  WHERE rk = CEIL(n * 5 / 100.0) OR rk = CEIL(n * 95 / 100.0)
  GROUP BY seg),
clamped AS (
  SELECT base.seg, GREATEST(lo, LEAST(hi, cents)) AS wc
  FROM base JOIN fences ON base.seg = fences.seg)
SELECT seg, COUNT(*) AS n,
  ROUND(CAST(SUM(wc) AS DOUBLE) / COUNT(*), 2) AS winsorized_mean_cents
FROM clamped GROUP BY seg
"""


def q_ship_delay_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship SLA: discrete p50/p90/p99 of the days between order
    date and each line item's ship date, per order priority — the
    operational-latency percentile report. The only fact-fact join in
    the statistics family: lineitem ⋈ orders shuffles on the order key
    (AQE skew-safe), delays are integer days, and the percentile rule is
    the exact rank = ceil(q·n) discrete pick with a (delay, orderkey,
    linenumber) total order."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    delays = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_orderpriority").alias("pri"),
            F.datediff(
                F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("delay_days"),
            "l_orderkey", "l_linenumber",
        )
    )
    w = Window.partitionBy("pri").orderBy("delay_days", "l_orderkey", "l_linenumber")
    ranked = delays.select(
        "pri", "delay_days",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("pri")).alias("n"),
    )
    qs = spark.createDataFrame([(50,), (90,), (99,)], "q int")
    return (
        ranked.crossJoin(F.broadcast(qs))
        .filter(F.col("rk") == F.ceil(F.col("q") * F.col("n") / 100))
        .select("pri", "q", "delay_days")
    )


_SHIP_DELAY_SQL = """
WITH delays AS (
  SELECT o_orderpriority AS pri,
    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS delay_days,
    l_orderkey, l_linenumber
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
ranked AS (
  SELECT pri, delay_days,
    ROW_NUMBER() OVER (PARTITION BY pri
      ORDER BY delay_days, l_orderkey, l_linenumber) AS rk,
    COUNT(*) OVER (PARTITION BY pri) AS n
  FROM delays)
SELECT pri, q, delay_days
FROM ranked CROSS JOIN (SELECT unnest([50, 90, 99]) AS q) qs
WHERE rk = CEIL(q * n / 100.0)
"""


def q_peak_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency by sweep line: an order is OPEN from its order
    date until its last line ships; the sweep emits +1/-1 boundary
    events, a running sum over the date order gives the concurrently-
    open count, and the top 10 peak days fall out. The per-order
    interval needs one fact-fact aggregation (max shipdate per order);
    the sweep itself runs over the tiny per-day boundary table.
    Orders whose last ship falls ON day d count as open through d
    (the -1 lands on d+1). All integer counting."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    spans = (
        li.groupBy("l_orderkey")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("close_d"))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .select(F.col("o_orderdate").cast("date").alias("open_d"), "close_d")
    )
    deltas = (
        spans.select(F.col("open_d").alias("d"), F.lit(1).alias("delta"))
        .unionByName(
            spans.select(
                F.date_add(F.col("close_d"), 1).alias("d"), F.lit(-1).alias("delta")
            )
        )
        .groupBy("d")
        .agg(F.sum("delta").alias("net"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        deltas.select("d", F.sum("net").over(w).alias("open_orders"))
        .orderBy(F.desc("open_orders"), "d")
        .limit(10)
    )


_PEAK_OPEN_SQL = """
WITH spans AS (
  SELECT CAST(o_orderdate AS DATE) AS open_d,
         MAX(CAST(l_shipdate AS DATE)) AS close_d
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_orderkey, CAST(o_orderdate AS DATE)),
deltas AS (
  SELECT d, SUM(delta) AS net FROM (
    SELECT open_d AS d, 1 AS delta FROM spans
    UNION ALL
    SELECT close_d + 1 AS d, -1 AS delta FROM spans)
  GROUP BY d),
sweep AS (
  SELECT d,
    SUM(net) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open_orders
  FROM deltas)
SELECT d, open_orders FROM sweep
ORDER BY open_orders DESC, d LIMIT 10
"""


def q_lorenz_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve sampled at customer-count deciles, per region: the
    cumulative revenue share held by the poorest 10%..100% of customers
    — the curve the Gini coefficient integrates. Shares are exact ppm
    (floor division of int64 cumulative cents), decile membership is
    rank·10 div n, and the last row of each decile carries the point.
    One fact aggregation, one region-partitioned window."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    per_cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "c_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
    )
    w = Window.partitionBy("r_name").orderBy("cents", "c_custkey")
    ranked = per_cust.select(
        "r_name",
        F.row_number().over(w).alias("rk"),
        F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.count("*").over(Window.partitionBy("r_name")).alias("n"),
        F.sum("cents").over(Window.partitionBy("r_name")).alias("total"),
    )
    return (
        ranked.withColumn("decile", F.expr("(rk * 10) div n"))
        .filter(F.expr("rk * 10 % n = 0 OR rk = n"))
        .filter(F.col("decile") >= 1)
        .groupBy("r_name", "decile")
        .agg(
            # two-stage exact split (cf. ewma_micro): cum*1e6 overflows
            # int64 near sf1, but cum*1e3 holds to sf~400 and
            # floor(cum*1e6/total) == q*1e3 + floor((r*1e3)/total)
            # for q, r = divmod(cum*1e3, total).
            F.max(
                F.expr(
                    "((cum * 1000) div total) * 1000"
                    " + (((cum * 1000) % total) * 1000) div total"
                )
            ).alias("cum_share_ppm")
        )
    )


_LORENZ_SQL = """
WITH per_cust AS (
  SELECT r_name, c_custkey,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2),
ranked AS (
  SELECT r_name,
    ROW_NUMBER() OVER w AS rk,
    SUM(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    COUNT(*) OVER (PARTITION BY r_name) AS n,
    SUM(cents) OVER (PARTITION BY r_name) AS total
  FROM per_cust
  WINDOW w AS (PARTITION BY r_name ORDER BY cents, c_custkey))
SELECT r_name, (rk * 10) // n AS decile,
  MAX(((cum * 1000) // total) * 1000
      + (((cum * 1000) % total) * 1000) // total) AS cum_share_ppm
FROM ranked
WHERE (rk * 10 % n = 0 OR rk = n) AND (rk * 10) // n >= 1
GROUP BY 1, 2
"""


def q_weighted_median_price_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median line price per part brand: the smallest
    price v whose cumulative quantity weight reaches half the brand
    total (2·cumw >= totw — integer comparison, no halving). Weights
    pre-aggregate per (brand, price) BEFORE the window, so tie ordering
    within equal prices can never matter. One fact-fact-ish join
    (part broadcasts), one brand-partitioned window over the price
    grain."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    grain = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand",
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        )
        .agg(F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("w"))
    )
    win = Window.partitionBy("p_brand").orderBy("cents")
    ranked = grain.select(
        "p_brand", "cents",
        F.sum("w").over(win.rowsBetween(Window.unboundedPreceding, 0)).alias("cumw"),
        F.sum("w").over(Window.partitionBy("p_brand")).alias("totw"),
    )
    return (
        ranked.filter(2 * F.col("cumw") >= F.col("totw"))
        .groupBy("p_brand")
        .agg(
            F.min("cents").alias("weighted_median_cents"),
            F.max("totw").alias("total_quantity"),
        )
    )


_WMEDIAN_SQL = """
WITH grain AS (
  SELECT p_brand,
    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
    SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS w
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2),
ranked AS (
  SELECT p_brand, cents,
    SUM(w) OVER (PARTITION BY p_brand ORDER BY cents
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
    SUM(w) OVER (PARTITION BY p_brand) AS totw
  FROM grain)
SELECT p_brand, MIN(cents) AS weighted_median_cents,
  MAX(totw) AS total_quantity
FROM ranked WHERE 2 * cumw >= totw
GROUP BY p_brand
"""


def q_snapshot_diff_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC reconciliation via the snapshot-diff operator
    (operators/diff.py): per-customer order aggregates as of 1995-12-31
    vs today, classified added / changed / unchanged by the operator's
    pre-hashed full-outer join (md5 over integer-string value columns —
    engine-portable because bigint->string casts agree). Aggregated to
    class counts; 'removed' is structurally impossible (history only
    grows) and its absence is part of the check."""
    from .operators.diff import diff_summary

    o = _t(spark, sf_dir, "orders")
    per_cust = lambda df: (  # noqa: E731
        df.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"),
        )
    )
    old = per_cust(o.filter(F.col("o_orderdate").cast("date") < F.lit("1996-01-01").cast("date")))
    new = per_cust(o)
    return diff_summary(old, new, ["custkey"]).orderBy("change")


_SNAPDIFF_SQL = """
WITH old AS (
  SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1996-01-01'
  GROUP BY 1),
new AS (
  SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
classified AS (
  SELECT CASE
    WHEN old.custkey IS NULL THEN 'added'
    WHEN new.custkey IS NULL THEN 'removed'
    WHEN old.n_orders = new.n_orders AND old.cents = new.cents THEN 'unchanged'
    ELSE 'changed' END AS change
  FROM old FULL OUTER JOIN new ON old.custkey = new.custkey)
SELECT change, COUNT(*) AS n FROM classified
GROUP BY change ORDER BY change
"""


def q_embedding_clip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as the vector-preprocessing surface:
    per label, how many embedding components exceed |x| > 0.2 (clip
    candidates), via filter(embedding, ...) + size — no explode, no
    Python. The predicate casts float components to double before the
    0.2 comparison so both engines test identical values; counts are
    integers and the clip rate is floor-division ppm."""
    em = _t(spark, sf_dir, "embeddings")
    per_vec = em.select(
        "label",
        F.size(F.col("embedding")).alias("n_dims"),
        F.size(
            F.filter(
                F.col("embedding"),
                lambda x: F.abs(x.cast("double")) > F.lit(0.2),
            )
        ).alias("n_clip"),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum("n_dims").alias("total_dims"),
            F.sum("n_clip").alias("total_clip"),
        )
        .select(
            "label", "n_vectors", "total_dims", "total_clip",
            F.expr("(total_clip * 1000000L) div total_dims").alias("clip_ppm"),
        )
    )


_CLIP_SQL = """
WITH per_vec AS (
  SELECT label, len(embedding) AS n_dims,
    len(list_filter(embedding, x -> ABS(CAST(x AS DOUBLE)) > 0.2e0)) AS n_clip
  FROM embeddings)
SELECT label, COUNT(*) AS n_vectors,
  SUM(n_dims) AS total_dims, SUM(n_clip) AS total_clip,
  (SUM(n_clip) * 1000000) // SUM(n_dims) AS clip_ppm
FROM per_vec GROUP BY label
"""


def q_daily_kpi_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The metrics-layer spine: one wide daily KPI row — orders, exact
    revenue, floor-division AOV, distinct buyers, first-time buyers, and
    the cumulative customer base. Three day-grain aggregates (core,
    first-seen, cumulative window) joined on the date spine; every
    column is an integer so the report is hash-exact. The shape a
    semantic layer materializes incrementally at scale (cf.
    operators/incremental.py)."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev_cents"),
        F.count_distinct("o_custkey").alias("n_buyers"),
    )
    first_seen = (
        o.groupBy("o_custkey")
        .agg(F.min(F.col("o_orderdate").cast("date")).alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("n_new_buyers"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.join(first_seen, "d", "left")
        .select(
            "d", "n_orders", "rev_cents",
            F.expr("rev_cents div n_orders").alias("aov_cents"),
            "n_buyers",
            F.coalesce("n_new_buyers", F.lit(0)).alias("n_new_buyers"),
        )
        .withColumn("cum_buyers", F.sum("n_new_buyers").over(w))
    )


_KPI_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents,
    COUNT(DISTINCT o_custkey) AS n_buyers
  FROM orders GROUP BY 1),
first_seen AS (
  SELECT d, COUNT(*) AS n_new_buyers FROM (
    SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS d
    FROM orders GROUP BY 1)
  GROUP BY 1)
SELECT d, n_orders, rev_cents,
  rev_cents // n_orders AS aov_cents,
  n_buyers,
  COALESCE(n_new_buyers, 0) AS n_new_buyers,
  SUM(COALESCE(n_new_buyers, 0)) OVER (ORDER BY d
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_buyers
FROM daily LEFT JOIN first_seen USING (d)
"""


def q_hierarchy_share_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent at two hierarchy levels in one pass: each
    nation's revenue as exact-ppm share of its region and each region's
    share of the world, from two window partitions over the 25-row
    nation aggregate — the drill-down report shape (no self-joins, no
    re-aggregation). Integer ppm floor division throughout."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    per_nation = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
    )
    w_region = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    return per_nation.withColumn(
        "region_cents", F.sum("cents").over(w_region)
    ).withColumn(
        "world_cents", F.sum("cents").over(w_all)
    ).select(
        "r_name", "n_name", "cents",
        # two-stage exact split (cf. ewma_micro): cents*1e6 overflows
        # int64 near sf1-2; *1e3 twice holds to sf~400.
        F.expr(
            "((cents * 1000) div region_cents) * 1000"
            " + (((cents * 1000) % region_cents) * 1000) div region_cents"
        ).alias("share_of_region_ppm"),
        F.expr(
            "((region_cents * 1000) div world_cents) * 1000"
            " + (((region_cents * 1000) % world_cents) * 1000) div world_cents"
        ).alias("region_share_ppm"),
    )


_HIER_SQL = """
WITH per_nation AS (
  SELECT r_name, n_name,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2),
leveled AS (
  SELECT r_name, n_name, cents,
    SUM(cents) OVER (PARTITION BY r_name) AS region_cents,
    SUM(cents) OVER () AS world_cents
  FROM per_nation)
SELECT r_name, n_name, cents,
  ((cents * 1000) // region_cents) * 1000
    + (((cents * 1000) % region_cents) * 1000) // region_cents
    AS share_of_region_ppm,
  ((region_cents * 1000) // world_cents) * 1000
    + (((region_cents * 1000) % world_cents) * 1000) // world_cents
    AS region_share_ppm
FROM leveled
"""


def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic — the report an operator runs before
    sizing a 100 TB join: per candidate key (order custkey, lineitem
    partkey/suppkey), the row count of the heaviest key, the exact
    discrete p50/p99 of per-key counts, and max/p50 as the skew ratio
    in exact ppm. All integer; per-key counts aggregate first, and the
    percentile ranks over the fact-proportional key-count table come
    from the distributed row_number (operators/ranking.py) — ranged
    shuffle + broadcast offsets, never a single-partition window; the
    key-count total is a broadcast 1-row aggregate off the same
    checkpointed frame."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")

    def key_stats(df: DataFrame, col: str, label: str) -> DataFrame:
        per_key = df.groupBy(F.col(col).alias("k")).agg(F.count("*").alias("n"))
        numbered = RK.global_row_number(per_key, ["n", "k"], col_name="rk")
        total = numbered.agg(F.count("*").alias("cnt"))
        ranked = numbered.crossJoin(F.broadcast(total)).select("n", "rk", "cnt")
        picks = ranked.agg(
            F.max("n").alias("max_n"),
            F.max(F.when(F.col("rk") == F.ceil(F.col("cnt") * 50 / 100), F.col("n"))).alias("p50_n"),
            F.max(F.when(F.col("rk") == F.ceil(F.col("cnt") * 99 / 100), F.col("n"))).alias("p99_n"),
            F.count("*").alias("n_keys"),
        )
        return picks.select(
            F.lit(label).alias("key_name"), "n_keys", "max_n", "p50_n", "p99_n",
            F.expr("(max_n * 1000000L) div p50_n").alias("skew_ratio_ppm"),
        )

    out = key_stats(o, "o_custkey", "orders.o_custkey")
    out = out.unionByName(key_stats(li, "l_partkey", "lineitem.l_partkey"))
    out = out.unionByName(key_stats(li, "l_suppkey", "lineitem.l_suppkey"))
    return out


def _skew_sql() -> str:
    parts = []
    for table, col in [
        ("orders", "o_custkey"),
        ("lineitem", "l_partkey"),
        ("lineitem", "l_suppkey"),
    ]:
        parts.append(f"""
SELECT '{table}.{col}' AS key_name, n_keys, max_n, p50_n, p99_n,
  (max_n * 1000000) // p50_n AS skew_ratio_ppm
FROM (
  SELECT MAX(n) AS max_n,
    MAX(CASE WHEN rk = CEIL(cnt * 50 / 100.0) THEN n END) AS p50_n,
    MAX(CASE WHEN rk = CEIL(cnt * 99 / 100.0) THEN n END) AS p99_n,
    COUNT(*) AS n_keys
  FROM (
    SELECT n, ROW_NUMBER() OVER (ORDER BY n, k) AS rk,
      COUNT(*) OVER () AS cnt
    FROM (SELECT {col} AS k, COUNT(*) AS n FROM {table} GROUP BY 1)))""")
    return "\nUNION ALL\n".join(parts)


_KEY_SKEW_SQL = _skew_sql()


def q_weekly_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-over-time movement: each nation's weekly revenue rank in
    1995, with the week-over-week rank delta (positive = climbed). Rank
    ties break on nation name; LAG over the (nation, week) grid gives
    the movement — the leaderboard-delta report shape. Output limited
    to movers (delta <> 0) to keep the result focused."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    weekly = (
        o.filter(F.year(F.col("o_orderdate").cast("date")) == 1995)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            # week = the Monday date, not the bare ISO week number: Jan 1
            # 1995 carries ISO week 52 (of 1994) and a bare `wk` would
            # merge it with late-December 1995; a date axis is also
            # monotone with time for the LAG ordering.
            F.date_trunc("week", F.col("o_orderdate").cast("date"))
            .cast("date")
            .alias("wk"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
    )
    w_rank = Window.partitionBy("wk").orderBy(F.desc("cents"), "n_name")
    ranked = weekly.select(
        "n_name", "wk", F.row_number().over(w_rank).alias("rnk")
    )
    w_lag = Window.partitionBy("n_name").orderBy("wk")
    return (
        ranked.select(
            "n_name", "wk", "rnk",
            (F.lag("rnk").over(w_lag) - F.col("rnk")).alias("delta"),
        )
        .filter(F.col("delta").isNotNull() & (F.col("delta") != 0))
    )


_RANK_MOVERS_SQL = """
WITH weekly AS (
  SELECT n_name, CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE) AS wk,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE year(CAST(o_orderdate AS DATE)) = 1995
  GROUP BY 1, 2),
ranked AS (
  SELECT n_name, wk,
    ROW_NUMBER() OVER (PARTITION BY wk ORDER BY cents DESC, n_name) AS rnk
  FROM weekly),
moved AS (
  SELECT n_name, wk, rnk,
    LAG(rnk) OVER (PARTITION BY n_name ORDER BY wk) - rnk AS delta
  FROM ranked)
SELECT n_name, wk, rnk, delta
FROM moved WHERE delta IS NOT NULL AND delta <> 0
"""


def q_frequent_parts_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accelerated EXACT heavy hitters: every part whose line
    count exceeds 1/32768 of the fact, found via partition-local
    Misra-Gries summaries (functions/frequent.py) and re-counted
    exactly — shuffle cost is O(partitions × k_sketch) + candidate
    rows instead of the full key universe. The support-threshold
    contract is provably complete under any distribution (see the
    operator docstring — a top-k framing is NOT sketch-safe on
    near-uniform keys, which this fixture's partkey is), and the
    DuckDB oracle computes the same set exactly, so the hash match
    verifies zero candidate loss end-to-end. The one intentionally-
    Python stage (mapInPandas summary) is Arrow-batched."""
    from .functions.frequent import frequent_above_support

    li = _t(spark, sf_dir, "lineitem")
    return frequent_above_support(li, "l_partkey", k_sketch=32768)


_FREQ_SUPPORT_SQL = """
WITH tot AS (SELECT COUNT(*) AS total FROM lineitem)
SELECT l_partkey, COUNT(*) AS n
FROM lineitem CROSS JOIN tot
GROUP BY l_partkey, total
HAVING 32768 * COUNT(*) > total
"""


def q_customer_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer gaps-and-islands over the MONTH grid: runs of
    consecutive active months via the classic month_index − row_number
    grouping trick, reporting each customer's longest streak and island
    count — top 20 by (longest streak, fewest islands, custkey).
    Customers hold ~10 orders across 84 months at every scale factor,
    so the island structure is non-degenerate at any SF. Two windows +
    two aggregations, all keyed by customer."""
    o = _t(spark, sf_dir, "orders")
    months = (
        o.select(
            "o_custkey",
            (
                (F.year(F.col("o_orderdate").cast("date")) - 1992) * 12
                + F.month(F.col("o_orderdate").cast("date")) - 1
            ).alias("m"),
        )
        .distinct()
    )
    w = Window.partitionBy("o_custkey").orderBy("m")
    islands = months.select(
        "o_custkey",
        (F.col("m") - F.row_number().over(w)).alias("grp"),
    ).groupBy("o_custkey", "grp").agg(F.count("*").alias("run_len"))
    return (
        islands.groupBy("o_custkey")
        .agg(
            F.max("run_len").alias("longest_streak"),
            F.count("*").alias("n_islands"),
        )
        .orderBy(F.desc("longest_streak"), "n_islands", "o_custkey")
        .limit(20)
    )


_ISLANDS_SQL = """
WITH months AS (
  SELECT DISTINCT o_custkey,
    (year(CAST(o_orderdate AS DATE)) - 1992) * 12
      + month(CAST(o_orderdate AS DATE)) - 1 AS m
  FROM orders),
islands AS (
  SELECT o_custkey,
    m - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY m) AS grp
  FROM months),
runs AS (
  SELECT o_custkey, grp, COUNT(*) AS run_len
  FROM islands GROUP BY 1, 2)
SELECT o_custkey, MAX(run_len) AS longest_streak, COUNT(*) AS n_islands
FROM runs GROUP BY o_custkey
ORDER BY longest_streak DESC, n_islands, o_custkey LIMIT 20
"""


def q_lineitem_contiguity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detail-row integrity: line numbers within each order must be
    exactly 1..k with no duplicates — checked in ONE aggregation pass
    per order via the arithmetic identity (count == max AND sum ==
    k(k+1)/2 AND min == 1), then summarized to a single row. No sort,
    no window, no distinct — the cheapest possible contiguity proof."""
    li = _t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").alias("cnt"),
        F.min("l_linenumber").alias("mn"),
        F.max("l_linenumber").alias("mx"),
        F.sum("l_linenumber").alias("sm"),
    )
    flagged = per_order.select(
        (
            (F.col("mn") == 1)
            & (F.col("mx") == F.col("cnt"))
            & (F.col("sm") == F.col("cnt") * (F.col("cnt") + 1) / 2)
        ).alias("ok")
    )
    return flagged.agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("ok").cast("bigint")).alias("n_contiguous"),
        F.sum((~F.col("ok")).cast("bigint")).alias("n_violations"),
    )


_CONTIG_SQL = """
WITH per_order AS (
  SELECT l_orderkey, COUNT(*) AS cnt, MIN(l_linenumber) AS mn,
         MAX(l_linenumber) AS mx, SUM(l_linenumber) AS sm
  FROM lineitem GROUP BY 1),
flagged AS (
  SELECT (mn = 1 AND mx = cnt AND sm = cnt * (cnt + 1) / 2) AS ok
  FROM per_order)
SELECT COUNT(*) AS n_orders,
  SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS n_contiguous,
  SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS n_violations
FROM flagged
"""

# discount weights 0.9^k for order-year offsets 0..6, shared 12-dp
# literals on both sides so neither engine ever calls pow()
_LTV_W = {
    0: "1.0", 1: "0.9", 2: "0.81", 3: "0.729",
    4: "0.6561", 5: "0.59049", 6: "0.531441",
}


def q_discounted_ltv_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted customer lifetime value: yearly revenue × 0.9^years-
    since-first-order, summed per customer — top 20. The discount
    powers are shared decimal literals (the Benford trick: no pow(), no
    libm divergence); yearly revenue is exact cents, the weighted sum
    runs once in double and rounds to cents. Two aggregations (customer
    × year, then customer) + a broadcast weights join."""
    o = _t(spark, sf_dir, "orders")
    yearly = (
        o.groupBy(
            "o_custkey", F.year(F.col("o_orderdate").cast("date")).alias("yr")
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
    )
    w_first = Window.partitionBy("o_custkey")
    offset = yearly.select(
        "o_custkey", "cents",
        (F.col("yr") - F.min("yr").over(w_first)).alias("k"),
    )
    weights = spark.createDataFrame(
        [(k, float(v)) for k, v in _LTV_W.items()], "k int, w double"
    )
    return (
        offset.join(F.broadcast(weights), "k")
        .groupBy("o_custkey")
        .agg(
            # each term's double product casts to decimal BEFORE the sum:
            # exact commutative accumulation, shuffle-order-proof
            F.round(
                F.sum(
                    (F.col("cents").cast("double") * F.col("w")).cast("decimal(38,10)")
                ).cast("double"),
                2,
            ).alias("ltv_cents")
        )
        .orderBy(F.desc("ltv_cents"), "o_custkey")
        .limit(20)
    )


_LTV_SQL = (
    "WITH yearly AS (\n"
    "  SELECT o_custkey, year(CAST(o_orderdate AS DATE)) AS yr,\n"
    "    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents\n"
    "  FROM orders GROUP BY 1, 2),\n"
    "offs AS (\n"
    "  SELECT o_custkey, cents,\n"
    "    yr - MIN(yr) OVER (PARTITION BY o_custkey) AS k\n"
    "  FROM yearly),\n"
    "weights AS (SELECT * FROM (VALUES "
    + ", ".join(f"({k}, {v}e0)" for k, v in _LTV_W.items())
    + ") AS t(k, w))\n"
    "SELECT o_custkey,\n"
    "  ROUND(CAST(SUM(CAST(CAST(cents AS DOUBLE) * w AS DECIMAL(38,10))) AS DOUBLE), 2) AS ltv_cents\n"
    "FROM offs JOIN weights USING (k)\n"
    "GROUP BY o_custkey ORDER BY ltv_cents DESC, o_custkey LIMIT 20\n"
)


def q_dice_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation strength for adjacent token pairs: the Dice
    coefficient 2·n_ab/(n_a+n_b) in exact ppm, over pairs with support
    ≥ 20 — which word pairs stick together beyond their individual
    frequencies (the PMI-family association measure, integer-exact so
    no log). One tokenization pass feeds both the unigram counts
    (broadcast twice) and the LEAD-adjacency bigram counts. Top 30 by
    (dice, pair)."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok")
    )
    uni = toks.groupBy("tok").agg(F.count("*").alias("n"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = (
        toks.select("doc_id", "tok", F.lead("tok").over(w).alias("nxt"))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("tok").alias("a"), F.col("nxt").alias("b"))
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 20)
    )
    ua = uni.select(F.col("tok").alias("a"), F.col("n").alias("n_a"))
    ub = uni.select(F.col("tok").alias("b"), F.col("n").alias("n_b"))
    return (
        bi.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .select(
            "a", "b", "n_ab", "n_a", "n_b",
            F.expr("(2 * n_ab * 1000000L) div (n_a + n_b)").alias("dice_ppm"),
        )
        .orderBy(F.desc("dice_ppm"), "a", "b")
        .limit(30)
    )


_DICE_SQL = """
WITH lists AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
toks AS (
  SELECT doc_id, unnest(l) AS tok,
         unnest(generate_series(1, len(l))) AS pos
  FROM lists),
uni AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
bi AS (
  SELECT a, b, COUNT(*) AS n_ab FROM (
    SELECT doc_id, tok AS a,
      LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS b
    FROM toks)
  WHERE b IS NOT NULL GROUP BY a, b HAVING COUNT(*) >= 20)
SELECT a, b, n_ab, ua.n AS n_a, ub.n AS n_b,
  (2 * n_ab * 1000000) // (ua.n + ub.n) AS dice_ppm
FROM bi JOIN uni ua ON bi.a = ua.tok JOIN uni ub ON bi.b = ub.tok
ORDER BY dice_ppm DESC, a, b LIMIT 30
"""


def q_embedding_dimension_medians(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension discrete median of the embedding corpus (the
    feature-wise robust center a normalization pipeline needs): one
    posexplode to (dim, value) — integer-scaled to micro-units so the
    rank pick is hash-exact — then the ceil(n/2) rank pick per
    dimension. 64 output rows regardless of corpus size; the explode
    shuffle is the only fact-sized stage."""
    em = _t(spark, sf_dir, "embeddings")
    vals = em.select(
        F.posexplode(F.col("embedding")).alias("dim", "v"),
        F.col("vec_id"),
    ).select(
        "dim",
        F.round(F.col("v").cast("double") * 1000000).cast("bigint").alias("micro"),
        "vec_id",
    )
    w = Window.partitionBy("dim").orderBy("micro", "vec_id")
    ranked = vals.select(
        "dim", "micro",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("dim")).alias("n"),
    )
    return (
        ranked.filter(F.col("rk") == F.ceil(F.col("n") / 2))
        .select("dim", F.col("micro").alias("median_micro"), "n")
    )


_EMB_MEDIAN_SQL = """
WITH vals AS (
  SELECT dim - 1 AS dim,
    CAST(ROUND(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS micro, vec_id
  FROM (
    SELECT vec_id, unnest(embedding) AS v,
           unnest(generate_series(1, len(embedding))) AS dim
    FROM embeddings)),
ranked AS (
  SELECT dim, micro,
    ROW_NUMBER() OVER (PARTITION BY dim ORDER BY micro, vec_id) AS rk,
    COUNT(*) OVER (PARTITION BY dim) AS n
  FROM vals)
SELECT dim, micro AS median_micro, n
FROM ranked WHERE rk = CEIL(n / 2.0)
"""


def q_rank_correlation_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric association between nations' order volume and
    revenue: Spearman's rho (1 − 6Σd²/(n(n²−1)) over row_number ranks
    with name tie-breaks) and Kendall's tau (concordant-minus-
    discordant over the 25×24/2 nation pairs). Both statistics reduce
    to exact integer counts on the 25-row aggregate — the double
    division happens once per statistic. The pairwise stage is
    quadratic in NATIONS, constant in fact rows."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    per_nation = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"),
        )
        # marker column: frame is bounded by |nations| = 25 at every SF
        # (plans.single_partition_collapses treats the checkpoint leaf as
        # bounded-by-construction); 25 rows, reused by ranks and pairs
        .withColumn("__bounded_by_25_nations", F.lit(1))
        .localCheckpoint(eager=True)
    )
    ranked = per_nation.select(
        "n_name",
        F.row_number().over(Window.orderBy("n_orders", "n_name")).alias("rx"),
        F.row_number().over(Window.orderBy("cents", "n_name")).alias("ry"),
    )
    spearman = ranked.agg(
        F.count("*").alias("n"),
        F.sum(
            (F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))
        ).alias("sum_d2"),
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    pairs = a.join(b, F.col("a.n_name") < F.col("b.n_name")).select(
        (
            (F.col("a.rx") < F.col("b.rx")) == (F.col("a.ry") < F.col("b.ry"))
        ).cast("bigint").alias("concordant")
    )
    kendall = pairs.agg(
        F.sum("concordant").alias("n_conc"),
        F.sum(1 - F.col("concordant")).alias("n_disc"),
    )
    return (
        spearman.crossJoin(kendall)
        .select(
            "n", "sum_d2", "n_conc", "n_disc",
            F.round(
                1 - (6 * F.col("sum_d2")).cast("double")
                / (F.col("n") * (F.col("n") * F.col("n") - 1)).cast("double"),
                6,
            ).alias("spearman_rho"),
            F.round(
                (F.col("n_conc") - F.col("n_disc")).cast("double")
                / (F.col("n_conc") + F.col("n_disc")).cast("double"),
                6,
            ).alias("kendall_tau"),
        )
    )


_RANKCORR_SQL = """
WITH per_nation AS MATERIALIZED (
  SELECT n_name, COUNT(*) AS n_orders,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1),
ranked AS MATERIALIZED (
  SELECT n_name,
    ROW_NUMBER() OVER (ORDER BY n_orders, n_name) AS rx,
    ROW_NUMBER() OVER (ORDER BY cents, n_name) AS ry
  FROM per_nation),
spearman AS (
  SELECT COUNT(*) AS n, SUM((rx - ry) * (rx - ry)) AS sum_d2 FROM ranked),
kendall AS (
  SELECT
    SUM(CASE WHEN (a.rx < b.rx) = (a.ry < b.ry) THEN 1 ELSE 0 END) AS n_conc,
    SUM(CASE WHEN (a.rx < b.rx) = (a.ry < b.ry) THEN 0 ELSE 1 END) AS n_disc
  FROM ranked a JOIN ranked b ON a.n_name < b.n_name)
SELECT n, sum_d2, n_conc, n_disc,
  ROUND(1 - CAST(6 * sum_d2 AS DOUBLE) / CAST(n * (n * n - 1) AS DOUBLE), 6) AS spearman_rho,
  ROUND(CAST(n_conc - n_disc AS DOUBLE) / CAST(n_conc + n_disc AS DOUBLE), 6) AS kendall_tau
FROM spearman CROSS JOIN kendall
"""


def q_rapid_repeat_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rapid-repeat-order audit: pairs of distinct orders by the same
    customer within 3 days, with the amount-similarity signal
    min/max·1e6 (exact ppm) that a duplicate-payment screen thresholds
    on. The self-join is equi on customer plus a bounded date-range
    predicate, so pair volume scales with per-customer short-window
    bursts, not the fact. Canonical pair order (earlier orderkey
    first), all-integer output."""
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.col("o_orderdate").cast("date").alias("d"),
        "o_orderkey",
    ).localCheckpoint(eager=True)  # avoid re-deriving the scan per alias
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.abs(F.datediff(F.col("b.d"), F.col("a.d"))) <= 3),
        )
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("orderkey_1"),
            F.col("b.o_orderkey").alias("orderkey_2"),
            F.abs(F.datediff(F.col("b.d"), F.col("a.d"))).alias("days_apart"),
            F.col("a.cents").alias("cents_1"),
            F.col("b.cents").alias("cents_2"),
            F.expr(
                "(least(a.cents, b.cents) * 1000000L) div greatest(a.cents, b.cents)"
            ).alias("amount_sim_ppm"),
        )
    )


_DUP_PAY_SQL = """
WITH base AS (
  SELECT o_custkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(o_orderdate AS DATE) AS d, o_orderkey
  FROM orders)
SELECT a.o_custkey AS custkey,
  a.o_orderkey AS orderkey_1, b.o_orderkey AS orderkey_2,
  ABS(date_diff('day', a.d, b.d)) AS days_apart,
  a.cents AS cents_1, b.cents AS cents_2,
  (LEAST(a.cents, b.cents) * 1000000) // GREATEST(a.cents, b.cents) AS amount_sim_ppm
FROM base a JOIN base b
  ON a.o_custkey = b.o_custkey
  AND a.o_orderkey < b.o_orderkey
  AND ABS(date_diff('day', a.d, b.d)) <= 3
"""


def q_boxplot_stats_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boxplot statistics per nation: discrete quartiles (rank =
    ceil(q·n) picks), IQR, and Tukey-fence outlier counts — with the
    1.5·IQR fences evaluated in DOUBLED integers (2·x < 2·q1 − 3·IQR)
    so the half-unit never becomes a float. One fact shuffle for the
    ranking window, quartiles join back as a broadcast, outliers count
    in one conditional aggregation."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            "o_orderkey",
        )
    )
    w = Window.partitionBy("n_name").orderBy("cents", "o_orderkey")
    ranked = base.select(
        "n_name", "cents",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("n_name")).alias("n"),
    )
    quartiles = (
        ranked.filter(
            (F.col("rk") == F.ceil(F.col("n") * 25 / 100))
            | (F.col("rk") == F.ceil(F.col("n") * 50 / 100))
            | (F.col("rk") == F.ceil(F.col("n") * 75 / 100))
        )
        .groupBy("n_name")
        .agg(
            F.min("cents").alias("q1"),
            F.max("cents").alias("q3"),
            F.max(
                F.when(F.col("rk") == F.ceil(F.col("n") * 50 / 100), F.col("cents"))
            ).alias("q2"),
        )
    )
    joined = base.join(F.broadcast(quartiles), "n_name")
    iqr = F.col("q3") - F.col("q1")
    low = 2 * F.col("cents") < 2 * F.col("q1") - 3 * iqr
    high = 2 * F.col("cents") > 2 * F.col("q3") + 3 * iqr
    return joined.groupBy("n_name", "q1", "q2", "q3").agg(
        F.count("*").alias("n"),
        (F.col("q3") - F.col("q1")).alias("iqr"),
        F.sum(low.cast("bigint")).alias("n_low_outliers"),
        F.sum(high.cast("bigint")).alias("n_high_outliers"),
    ).select("n_name", "n", "q1", "q2", "q3", "iqr", "n_low_outliers", "n_high_outliers")


_BOXPLOT_SQL = """
WITH base AS (
  SELECT n_name, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey),
ranked AS (
  SELECT n_name, cents,
    ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY cents, o_orderkey) AS rk,
    COUNT(*) OVER (PARTITION BY n_name) AS n
  FROM base),
quartiles AS (
  SELECT n_name, MIN(cents) AS q1, MAX(cents) AS q3,
    MAX(CASE WHEN rk = CEIL(n * 50 / 100.0) THEN cents END) AS q2
  FROM ranked
  WHERE rk = CEIL(n * 25 / 100.0) OR rk = CEIL(n * 50 / 100.0)
     OR rk = CEIL(n * 75 / 100.0)
  GROUP BY n_name)
SELECT base.n_name, COUNT(*) AS n, q1, q2, q3, q3 - q1 AS iqr,
  SUM(CASE WHEN 2 * cents < 2 * q1 - 3 * (q3 - q1) THEN 1 ELSE 0 END) AS n_low_outliers,
  SUM(CASE WHEN 2 * cents > 2 * q3 + 3 * (q3 - q1) THEN 1 ELSE 0 END) AS n_high_outliers
FROM base JOIN quartiles ON base.n_name = quartiles.n_name
GROUP BY base.n_name, q1, q2, q3
"""


def q_conversion_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative signup→purchase conversion at the 1/7/14/30-day
    marks: the share of the signup cohort converting within T days, in
    exact ppm — the business-facing complement of the survival hazard
    query. Per-user first-purchase offsets compute once (user-grain
    shuffle); the four thresholds fold into one conditional aggregation
    over a broadcast spine."""
    ev = _t(spark, sf_dir, "events")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    purchase = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    # ts >= t0 lives in the JOIN condition, not a post-join filter: a
    # signup user whose purchases are all pre-t0 must null-extend into
    # the cohort with t_days NULL, not vanish from it.
    s, p = signup.alias("s"), purchase.alias("p")
    offsets = (
        s.join(
            p,
            (F.col("s.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") >= F.col("s.t0")),
            "left",
        )
        .groupBy(F.col("s.user_id").alias("user_id"))
        .agg(
            F.min(
                F.datediff(F.col("p.ts").cast("date"), F.col("s.t0").cast("date"))
            ).alias("t_days")
        )
    )
    marks = spark.createDataFrame([(1,), (7,), (14,), (30,)], "t_mark int")
    return (
        offsets.crossJoin(F.broadcast(marks))
        .groupBy("t_mark")
        .agg(
            F.count("*").alias("n_cohort"),
            F.sum(
                (F.col("t_days").isNotNull() & (F.col("t_days") <= F.col("t_mark"))).cast("bigint")
            ).alias("n_converted"),
        )
        .select(
            "t_mark", "n_cohort", "n_converted",
            F.expr("(n_converted * 1000000L) div n_cohort").alias("conv_ppm"),
        )
    )


_CONV_CURVE_SQL = """
WITH signup AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
offsets AS (
  SELECT s.user_id,
    MIN(date_diff('day', CAST(t0 AS DATE), CAST(e.ts AS DATE))) AS t_days
  FROM signup s LEFT JOIN events e
    ON e.user_id = s.user_id AND e.event_type = 'purchase' AND e.ts >= s.t0
  GROUP BY s.user_id),
marks AS (SELECT unnest([1, 7, 14, 30]) AS t_mark)
SELECT t_mark, COUNT(*) AS n_cohort,
  SUM(CASE WHEN t_days IS NOT NULL AND t_days <= t_mark THEN 1 ELSE 0 END) AS n_converted,
  (SUM(CASE WHEN t_days IS NOT NULL AND t_days <= t_mark THEN 1 ELSE 0 END) * 1000000)
    // COUNT(*) AS conv_ppm
FROM offsets CROSS JOIN marks
GROUP BY t_mark
"""


def q_monthly_hhi_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration time series: the Herfindahl-Hirschman index
    of revenue shares across nations, per month (Σ shareᵢ², 1/25 =
    perfectly even … 1 = monopolized). Squares and totals accumulate as
    exact decimals (cents² passes int64 beyond sf~10), the share
    algebra runs once per month in double, rounded 6dp. One fact
    aggregation to month×nation, one 84-row reduce."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate").cast("date"))
            .cast("date")
            .alias("mo"),
            "n_name",
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
    )
    sums = monthly.groupBy("mo").agg(
        F.count("*").alias("n_nations"),
        F.sum(F.col("cents").cast("decimal(38,0)")).cast("double").alias("tot"),
        F.sum(
            (F.col("cents").cast("decimal(38,0)") * F.col("cents").cast("decimal(38,0)"))
        ).cast("double").alias("sq"),
    )
    return sums.select(
        "mo", "n_nations",
        F.round(F.col("sq") / (F.col("tot") * F.col("tot")), 6).alias("hhi"),
    )


_HHI_SQL = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS mo,
    n_name,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2),
sums AS (
  SELECT mo, COUNT(*) AS n_nations,
    CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS tot,
    CAST(SUM(CAST(cents AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS sq
  FROM monthly GROUP BY mo)
SELECT mo, n_nations, ROUND(sq / (tot * tot), 6) AS hhi
FROM sums
"""


def q_rebased_revenue_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indexed time series: each region's monthly revenue rebased to
    its own first month (= 1,000,000 ppm) — the '1995 = 100' economic-
    index report. FIRST_VALUE over the region window supplies the base;
    the index is exact ppm floor division. One fact aggregation to
    region×month, one window over the 420-row aggregate."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            "r_name",
            F.date_trunc("month", F.col("o_orderdate").cast("date"))
            .cast("date")
            .alias("mo"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
    )
    w = Window.partitionBy("r_name").orderBy("mo").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return monthly.withColumn(
        "base_cents", F.first_value("cents").over(w)
    ).select(
        "r_name", "mo", "cents",
        F.expr("(cents * 1000000) div base_cents").alias("index_ppm"),
    )


_REBASE_SQL = """
WITH monthly AS (
  SELECT r_name,
    CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS mo,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2)
SELECT r_name, mo, cents,
  (cents * 1000000) // FIRST_VALUE(cents) OVER (PARTITION BY r_name ORDER BY mo
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS index_ppm
FROM monthly
"""


# --------------------------------------------------------------------------
# round-2 additions: curation reporting, path analysis, corpus statistics
# --------------------------------------------------------------------------


def q_skew_salted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase skew-safe aggregation surfaced as a registry query: the
    events fact grouped by its genuinely-hot key (a handful of event_type
    values own the whole table — the one skew case AQE cannot split,
    since a groupBy key is indivisible at the shuffle layer). salted_agg
    spreads each hot key over 16 salt shards for the heavy phase and
    merges 16 tiny partials per key; counts and decimal cents sums are
    commutative, so the result is EXACTLY the plain GROUP BY — which is
    what the DuckDB twin computes, proving salting changes the plan, not
    the answer."""
    from .functions.skew import salted_agg

    ev = _t(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        [
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        ],
        lambda: [
            F.sum("n_events").alias("n_events"),
            F.sum("cents").alias("cents"),
        ],
        n_salts=16,
    )
    return out.orderBy("event_type")


_SALTED_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation report: per (source, lang), how much of the corpus the
    near-dedup pass keeps — the number every data-mixture owner asks for.
    Consumes the SAME persisted banded-signature/shingle-set stages as the
    rest of the dedup family (cache_key), so the report costs one
    candidate join + a broadcast-joined rollup, not a corpus re-pass."""
    docs = _t(spark, sf_dir, "documents")
    pairs = DD.lsh_verified_pairs(docs, threshold=0.8, cache_key=sf_dir)
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return (
        docs.join(drop.withColumn("dropped", F.lit(1)), "doc_id", "left")
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce(F.col("dropped"), F.lit(0)).cast("bigint")).alias(
                "n_dropped"
            ),
        )
        .select(
            "source", "lang", "n_docs", "n_dropped",
            F.expr("((n_docs - n_dropped) * 1000000) div n_docs").alias(
                "keep_ratio_ppm"
            ),
        )
        .orderBy("source", "lang")
    )


_DEDUP_RATE_SQL = f"""
WITH s AS (SELECT doc_id, unnest({_SHINGLES_SQL}) AS shg FROM documents),
h AS (SELECT doc_id, ('0x' || substr(md5(shg), 1, 15))::BIGINT % {_P} AS x FROM s),
sig AS (SELECT doc_id, {_SIG_MINS_SQL} FROM h GROUP BY doc_id),
banded AS (
  SELECT doc_id, unnest([{_BAND_LIST_SQL}]) AS band
  FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
sets AS (SELECT doc_id, {_SHINGLES_SQL} AS sh_set FROM documents),
drop_ids AS (
  SELECT DISTINCT c.id_b AS doc_id
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b
  WHERE len(list_intersect(sa.sh_set, sb.sh_set))
        / (len(sa.sh_set) + len(sb.sh_set) - len(list_intersect(sa.sh_set, sb.sh_set))) >= 0.8),
agg AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(CASE WHEN d.doc_id IN (SELECT doc_id FROM drop_ids)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
  FROM documents d GROUP BY 1, 2)
SELECT source, lang, n_docs, n_dropped,
  ((n_docs - n_dropped) * 1000000) // n_docs AS keep_ratio_ppm
FROM agg ORDER BY source, lang
"""


def q_session_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey prefixes: 30-min-gap sessionization (the
    sessionization query's exact gap convention), the first 3 event types
    of each session joined with '>', counted across sessions — the funnel
    discovery report. The path pivot is 3 conditional MAX aggregates (no
    order-sensitive collect_list), so the result is engine-deterministic;
    top-20 rank ties break on the path string."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("double")
    flagged = ev.withColumn(
        "new_session",
        F.when(sec - F.lag(sec).over(w) > 1800, 1)
        .otherwise(0)
        + F.when(F.lag("ts").over(w).isNull(), 1).otherwise(0),
    ).withColumn(
        "sid",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    w_sess = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    first3 = (
        flagged.withColumn("rn", F.row_number().over(w_sess))
        .groupBy("user_id", "sid")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias("e1"),
            F.max(F.when(F.col("rn") == 2, F.col("event_type"))).alias("e2"),
            F.max(F.when(F.col("rn") == 3, F.col("event_type"))).alias("e3"),
            F.count("*").alias("n_events"),
        )
    )
    paths = (
        first3.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path"), "n_events"
        )
        .groupBy("path")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("total_events"),
        )
    )
    # distinct paths are only bounded if event_type is a closed enum —
    # not provable from the data, so top-k via TakeOrderedAndProject
    order = [F.desc("n_sessions"), F.col("path")]
    top = RK.top_k(paths, order, 20)
    return top.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    ).select("rank", "path", "n_sessions", "total_events")


_SESSION_PATHS_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
    (CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800 THEN 1 ELSE 0 END
     + CASE WHEN LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END) AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT user_id, ts, event_id, event_type,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged),
numbered AS (
  SELECT user_id, sid, event_type,
    ROW_NUMBER() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn
  FROM sessions),
first3 AS (
  SELECT user_id, sid,
    MAX(CASE WHEN rn = 1 THEN event_type END) AS e1,
    MAX(CASE WHEN rn = 2 THEN event_type END) AS e2,
    MAX(CASE WHEN rn = 3 THEN event_type END) AS e3,
    COUNT(*) AS n_events
  FROM numbered GROUP BY 1, 2),
paths AS (
  SELECT concat_ws('>', e1, e2, e3) AS path,
    CAST(COUNT(*) AS BIGINT) AS n_sessions,
    CAST(SUM(n_events) AS BIGINT) AS total_events
  FROM first3 GROUP BY 1)
SELECT rank, path, n_sessions, total_events FROM (
  SELECT path, n_sessions, total_events,
    ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS rank
  FROM paths)
WHERE rank <= 20
"""


def q_text_zipf_rank_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf profile of the corpus: global token frequencies, rank-ordered
    (count desc, token asc), top 50 — the vocabulary-concentration signal
    curation dashboards plot log-log. One explode + one aggregation; the
    vocabulary grows with the corpus (this repo's own
    heaps_law_vocab_growth query measures it), so the top-50 is
    TakeOrderedAndProject and the rank window runs over 50 rows only."""
    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
    )
    counts = toks.groupBy("w").agg(F.count("*").alias("n"))
    order = [F.desc("n"), F.col("w")]
    top = RK.top_k(counts, order, 50)
    return top.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    ).select("rank", "w", "n")


_ZIPF_SQL = r"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                x -> x <> '')) AS w
  FROM documents),
counts AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY w)
SELECT rank, w, n FROM (
  SELECT w, n, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rank FROM counts)
WHERE rank <= 50
"""


def q_window_percentile_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + percent_rank coverage: every 200th customer (by balance
    order) per market segment with both distribution markers, 6dp — the
    sampled-CDF report shape. Ties in acctbal are real in the fixture, so
    both engines order by (acctbal, custkey) and the markers stay exact."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    marked = cust.select(
        F.col("c_mktsegment").alias("seg"),
        "c_custkey",
        F.row_number().over(w).alias("rn"),
        F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )
    return marked.filter(F.col("rn") % 200 == 0).select(
        "seg", "c_custkey", "rn", "cume_dist", "pct_rank"
    )


_PCTL_MARKERS_SQL = """
SELECT seg, c_custkey, rn, cume_dist, pct_rank FROM (
  SELECT c_mktsegment AS seg, c_custkey,
    ROW_NUMBER() OVER w AS rn,
    round(CUME_DIST() OVER w, 6) AS cume_dist,
    round(PERCENT_RANK() OVER w, 6) AS pct_rank
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey))
WHERE rn % 200 = 0
"""


def q_corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix planning: allocate a 100k-token sampling budget across
    (lang, source) strata proportionally to their token mass, exact to the
    last token via largest-remainder (the allocation_proration recipe on
    the corpus axis). All int64; one corpus aggregation + one 25-row
    window pass."""
    budget = 100_000
    toks = (
        _t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.sum(
                F.size(F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != ""))
            ).cast("bigint").alias("n_tokens")
        )
    )
    w_all = Window.partitionBy()
    based = toks.withColumn("total", F.sum("n_tokens").over(w_all)).select(
        "lang", "source", "n_tokens", "total",
        F.expr(f"({budget}L * n_tokens) div total").alias("base_quota"),
        F.expr(f"({budget}L * n_tokens) % total").alias("rem"),
    )
    w_rem = Window.orderBy(F.desc("rem"), "lang", "source")
    w_sum = Window.partitionBy()
    return (
        based.withColumn("rem_rank", F.row_number().over(w_rem))
        .withColumn("assigned", F.sum("base_quota").over(w_sum))
        .select(
            "lang", "source", "n_tokens",
            (
                F.col("base_quota")
                + F.when(
                    F.col("rem_rank") <= F.lit(budget) - F.col("assigned"), 1
                ).otherwise(0)
            ).cast("bigint").alias("token_quota"),
        )
        .orderBy("lang", "source")
    )


_TOKEN_BUDGET_SQL = r"""
WITH toks AS (
  SELECT lang, source,
    CAST(SUM(len(list_filter(string_split_regex(lower(text), '\s+'),
             x -> x <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1, 2),
based AS (
  SELECT lang, source, n_tokens,
    SUM(n_tokens) OVER () AS total,
    (100000 * n_tokens) // SUM(n_tokens) OVER () AS base_quota,
    (100000 * n_tokens) % SUM(n_tokens) OVER () AS rem
  FROM toks),
ranked AS (
  SELECT lang, source, n_tokens, base_quota,
    ROW_NUMBER() OVER (ORDER BY rem DESC, lang, source) AS rem_rank,
    SUM(base_quota) OVER () AS assigned
  FROM based)
SELECT lang, source, n_tokens,
  CAST(base_quota + CASE WHEN rem_rank <= 100000 - assigned THEN 1 ELSE 0 END
       AS BIGINT) AS token_quota
FROM ranked ORDER BY lang, source
"""


def q_corpus_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-style): per source shard,
    tokens are concatenated in doc_id order and cut every 256; the
    report shows, per (shard, context window), how many docs feed it,
    how many straddle in from the previous window, and its fill. One
    window cumsum per shard + a bounded explode — closed-form, fully
    codegen'd, identical SQL on the oracle side."""
    return PK.pack_concat_chunks(_t(spark, sf_dir, "documents"), budget=256)


_PACK_CHUNKS_SQL = r"""
WITH toks AS (
  SELECT source, doc_id,
    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
         x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents),
pos AS (
  SELECT source, doc_id, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS cum_before
  FROM toks WHERE n_tokens > 0),
spans AS (
  SELECT source, n_tokens, cum_before,
    cum_before // 256 AS first_bin,
    (cum_before + n_tokens - 1) // 256 AS last_bin
  FROM pos),
binned AS (
  SELECT source, n_tokens, cum_before, first_bin,
    unnest(generate_series(first_bin, last_bin)) AS bin_id
  FROM spans)
SELECT source, CAST(bin_id AS BIGINT) AS bin_id,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN first_bin < bin_id THEN 1 ELSE 0 END) AS BIGINT) AS n_carry,
  CAST(SUM(LEAST((bin_id + 1) * 256, cum_before + n_tokens)
         - GREATEST(bin_id * 256, cum_before)) AS BIGINT) AS bin_tokens
FROM binned GROUP BY source, bin_id ORDER BY source, bin_id
"""


def q_corpus_pack_firstfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy next-fit sequence packing: docs fill the current 256-token
    bin until the next would overflow. The per-shard fill recurrence is
    sequential, so Spark runs it as applyInPandas (one scan per source
    shard); the oracle replays the identical recurrence with a recursive
    CTE that advances every shard one document per step."""
    return PK.pack_first_fit(_t(spark, sf_dir, "documents"), budget=256)


_PACK_FIRSTFIT_SQL = r"""
WITH RECURSIVE toks AS (
  SELECT source, doc_id,
    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
         x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents),
docs AS (
  SELECT source, doc_id, n_tokens,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM toks WHERE n_tokens > 0),
pack(source, rn, doc_id, n_tokens, bin_id, fill) AS (
  SELECT source, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
  FROM docs WHERE rn = 1
  UNION ALL
  SELECT d.source, d.rn, d.doc_id, d.n_tokens,
    CASE WHEN p.fill + d.n_tokens > 256 THEN p.bin_id + 1 ELSE p.bin_id END,
    CASE WHEN p.fill + d.n_tokens > 256 THEN d.n_tokens
         ELSE p.fill + d.n_tokens END
  FROM pack p JOIN docs d ON d.source = p.source AND d.rn = p.rn + 1)
SELECT source, doc_id, n_tokens, bin_id FROM pack ORDER BY source, doc_id
"""


def q_corpus_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-indexing twin of the packing family: sliding 128-token windows
    with stride 64 (50% overlap) per document; the manifest prices the
    index amplification a vector store pays for the overlap. Per-doc
    window sums fold row-locally (aggregate over the index sequence), so
    the only shuffle is the per-shard rollup."""
    return PK.chunk_overlap_manifest(
        _t(spark, sf_dir, "documents"), chunk=128, stride=64
    )


_CHUNK_OVERLAP_SQL = r"""
WITH toks AS (
  SELECT source, doc_id,
    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
         x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents),
per_doc AS (
  SELECT source, n_tokens,
    1 + GREATEST(0, (n_tokens - 128 + 63) // 64) AS k
  FROM toks WHERE n_tokens > 0),
folded AS (
  SELECT source, n_tokens, k,
    list_sum(list_transform(generate_series(0, k - 1),
      i -> LEAST(128, n_tokens - i * 64))) AS win_tokens,
    list_sum(list_transform(generate_series(0, k - 1),
      i -> CASE WHEN n_tokens - i * 64 >= 128 THEN 1 ELSE 0 END)) AS full_windows
  FROM per_doc)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
  CAST(SUM(k) AS BIGINT) AS n_windows,
  CAST(SUM(win_tokens) AS BIGINT) AS window_tokens,
  CAST(SUM(win_tokens) * 1000000 // SUM(n_tokens) AS BIGINT) AS expansion_ppm,
  CAST(SUM(full_windows) * 1000000 // SUM(k) AS BIGINT) AS full_share_ppm
FROM folded GROUP BY source ORDER BY source
"""


def q_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-quality audit for the dedup index: per LSH candidate
    pair, the MinHash-estimated Jaccard (fraction of agreeing signature
    components) against the exact shingle Jaccard. This is the telemetry
    that justifies band/row parameters before a 100 TB run. Reads the
    SAME persisted signature/shingle-set stages as the dedup family —
    zero extra corpus passes."""
    docs = _t(spark, sf_dir, "documents")
    cand = DD.minhash_lsh_candidates(docs, num_hashes=16, bands=4, cache_key=sf_dir)
    sig = DD.numeric_signatures(docs, num_hashes=16, cache_key=sf_dir)
    exact = DD.lsh_verified_pairs(docs, threshold=0.0, cache_key=sf_dir).select(
        "id_a", "id_b", "jaccard"
    )
    sa = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(16)],
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(16)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(16)
    )
    est = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", (matches / F.lit(16.0)).alias("est"))
    )
    return est.join(exact, ["id_a", "id_b"]).select(
        "id_a",
        "id_b",
        F.round("est", 6).alias("est_jaccard"),
        F.round("jaccard", 6).alias("jaccard"),
        F.round(F.abs(F.col("est") - F.col("jaccard")), 6).alias("abs_err"),
    )


_MINHASH_EST_MATCH_SQL = " + ".join(
    f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(16)
)

_MINHASH_ERR_SQL = f"""
WITH s AS (SELECT doc_id, unnest({_SHINGLES_SQL}) AS sh FROM documents),
h AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT % {_P} AS x FROM s),
sig AS (SELECT doc_id, {_SIG_MINS_SQL} FROM h GROUP BY doc_id),
banded AS (
  SELECT doc_id, unnest([{_BAND_LIST_SQL}]) AS band
  FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
est AS (
  SELECT c.id_a, c.id_b, ({_MINHASH_EST_MATCH_SQL}) / 16.0 AS est
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.id_a
  JOIN sig sb ON sb.doc_id = c.id_b),
sets AS (SELECT doc_id, {_SHINGLES_SQL} AS sh_set FROM documents),
verified AS (
  SELECT c.id_a, c.id_b,
    len(list_intersect(sa.sh_set, sb.sh_set))
      / (len(sa.sh_set) + len(sb.sh_set) - len(list_intersect(sa.sh_set, sb.sh_set))) AS jaccard
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b)
SELECT e.id_a, e.id_b, round(e.est, 6) AS est_jaccard,
  round(v.jaccard, 6) AS jaccard,
  round(abs(e.est - v.jaccard), 6) AS abs_err
FROM est e JOIN verified v ON v.id_a = e.id_a AND v.id_b = e.id_b
"""


def q_embedding_standardize_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension standardization audit for the embedding corpus:
    mean, stddev (both from exact decimal sums, so the doubles agree
    bit-for-bit cross-engine), and the tail census beyond mean +/- 2.5
    sd. Two passes over the exploded values with a broadcast of the
    64-row stats frame; output is 64 rows regardless of corpus size."""
    em = _t(spark, sf_dir, "embeddings")
    vals = em.select(
        F.col("vec_id"), F.posexplode("embedding").alias("dim", "v0")
    ).select("vec_id", "dim", F.col("v0").cast("double").alias("v"))
    stats = vals.groupBy("dim").agg(
        _dsum(F.col("v")).alias("s"),
        _dsum(F.col("v") * F.col("v")).alias("s2"),
        F.count("*").cast("bigint").alias("n"),
    )
    m = stats.select(
        "dim",
        (F.col("s") / F.col("n")).alias("mean"),
        F.sqrt(
            F.greatest(
                (F.col("s2") - F.col("s") * F.col("s") / F.col("n"))
                / (F.col("n") - 1),
                F.lit(0.0),
            )
        ).alias("sd"),
    )
    return (
        vals.join(F.broadcast(m), "dim")
        .groupBy("dim", "mean", "sd")
        .agg(
            F.sum(
                F.when(F.col("v") > F.col("mean") + 2.5 * F.col("sd"), 1).otherwise(0)
            ).cast("bigint").alias("n_hi"),
            F.sum(
                F.when(F.col("v") < F.col("mean") - 2.5 * F.col("sd"), 1).otherwise(0)
            ).cast("bigint").alias("n_lo"),
        )
        .select(
            "dim",
            F.round("mean", 6).alias("mean_v"),
            F.round("sd", 6).alias("sd_v"),
            "n_hi",
            "n_lo",
        )
        .orderBy("dim")
    )


_EMB_STANDARDIZE_SQL = """
WITH vals AS (
  SELECT vec_id, dim - 1 AS dim, CAST(v AS DOUBLE) AS v
  FROM (
    SELECT vec_id, unnest(embedding) AS v,
           unnest(generate_series(1, len(embedding))) AS dim
    FROM embeddings)),
stats AS (
  SELECT dim,
    CAST(SUM(CAST(v AS DECIMAL(38,10))) AS DOUBLE) AS s,
    CAST(SUM(CAST(v * v AS DECIMAL(38,10))) AS DOUBLE) AS s2,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM vals GROUP BY dim),
m AS (
  SELECT dim, s / n AS mean,
    sqrt(greatest((s2 - s * s / n) / (n - 1), 0.0)) AS sd
  FROM stats)
SELECT v.dim, round(m.mean, 6) AS mean_v, round(m.sd, 6) AS sd_v,
  CAST(SUM(CASE WHEN v.v > m.mean + 2.5 * m.sd THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
  CAST(SUM(CASE WHEN v.v < m.mean - 2.5 * m.sd THEN 1 ELSE 0 END) AS BIGINT) AS n_lo
FROM vals v JOIN m ON v.dim = m.dim
GROUP BY v.dim, m.mean, m.sd ORDER BY v.dim
"""


def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation: confusion matrix of labeled lang vs the
    n-gram-heuristic prediction, with an exact ppm share of each true
    lang's row. The eval every classifier-driven curation step needs
    before it gates a 100 TB corpus; one groupBy + a 25-row window."""
    docs = _t(spark, sf_dir, "documents")
    cm = (
        docs.select("lang", TX.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w = Window.partitionBy("lang")
    return (
        cm.withColumn("lang_total", F.sum("n").over(w))
        .select(
            "lang",
            "lang_pred",
            "n",
            F.expr("n * 1000000L div lang_total").alias("share_ppm"),
        )
        .orderBy("lang", "lang_pred")
    )


_LANG_CONFUSION_SQL = f"""
WITH pred AS (SELECT lang, {_lang_case()} AS lang_pred FROM documents),
cm AS (
  SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2)
SELECT lang, lang_pred, n,
  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS share_ppm
FROM cm ORDER BY lang, lang_pred
"""


def q_incremental_rollup_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-view maintenance invariant, surfaced as a query: the
    daily events rollup maintained as base-through-Jan-20 PLUS a delta of
    later events, merged additively (operators/incremental.py), must
    equal the batch recompute — which is exactly what the DuckDB oracle
    computes. Sums carry exact decimal partials through the merge so the
    two-stage addition is bit-identical to the oracle's one-stage sum.
    At 100 TB the same algebra runs against touched partitions only
    (maintain_daily_rollup); cost tracks the delta, not the view."""
    from .operators import incremental as IV

    ev = _t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-21").cast("timestamp")

    def roll(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("date", F.to_date("ts"))
            .groupBy("date")
            .agg(
                F.count("*").cast("bigint").alias("event_count"),
                F.sum(F.col("value").cast("decimal(38,10)")).alias("total_value"),
            )
        )

    base = roll(ev.filter(F.col("ts") < cutoff))
    delta = roll(ev.filter(F.col("ts") >= cutoff))
    merged = IV.merge_additive(base, delta, keys=["date"])
    return merged.select(
        "date",
        F.col("event_count").cast("bigint").alias("event_count"),
        F.round(F.col("total_value").cast("double"), 6).alias("total_value"),
    ).orderBy("date")


_INCR_ROLLUP_SQL = """
SELECT CAST(ts AS DATE) AS date,
  CAST(COUNT(*) AS BIGINT) AS event_count,
  round(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6) AS total_value
FROM events GROUP BY 1 ORDER BY 1
"""


# Bloom filter geometry for the semi-join audit: 2^18 bits as 8192
# 32-bit words (shift <= 31 keeps every mask positive and in-range for
# both engines' BIGINT shift), 2 md5-derived hash functions.
_BLOOM_BITS = 262144
_BLOOM_WORD = 32


def q_bloom_semi_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter (Bloom semi-join) audit: a 32 KiB bit array built
    from the urgent-order keys stands in for the multi-GB build side of
    orders⋉lineitem — the probe side tests 2 bits per key before any
    shuffle. The audit reports the exact-vs-bloom pass counts and the
    measured false-positive rate, which is the number that sizes the
    filter before a 100 TB run (where the bitmap ships as one broadcast
    and the filtered probe side skips the join shuffle for ~99% of
    rows). All arithmetic is md5-derived integer ops, identical in the
    oracle."""
    m, w = _BLOOM_BITS, _BLOOM_WORD

    def h(col: F.Column, salt: str) -> F.Column:
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 15),
                16,
                10,
            ).cast("long")
            % m
        )

    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
    )
    positions = urgent.select(h(F.col("k"), "a").alias("pos")).unionAll(
        urgent.select(h(F.col("k"), "b").alias("pos"))
    )
    words = (
        positions.select(
            F.expr(f"pos div {w}").alias("word_idx"),
            F.expr(f"shiftleft(cast(1 as bigint), cast(pos % {w} as int))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )
    probe = (
        _t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k")).distinct()
    )
    probed = probe.select(
        "k",
        h(F.col("k"), "a").alias("h1"),
        h(F.col("k"), "b").alias("h2"),
    )
    w1 = words.select(F.col("word_idx").alias("w1"), F.col("word").alias("word1"))
    w2 = words.select(F.col("word_idx").alias("w2"), F.col("word").alias("word2"))
    checked = (
        probed.withColumn("w1", F.expr(f"h1 div {w}"))
        .withColumn("m1", F.expr(f"shiftleft(cast(1 as bigint), cast(h1 % {w} as int))"))
        .withColumn("w2", F.expr(f"h2 div {w}"))
        .withColumn("m2", F.expr(f"shiftleft(cast(1 as bigint), cast(h2 % {w} as int))"))
        .join(F.broadcast(w1), "w1", "left")
        .join(F.broadcast(w2), "w2", "left")
        .withColumn(
            "bloom_pass",
            (F.coalesce(F.col("word1"), F.lit(0)).bitwiseAND(F.col("m1")) != 0)
            & (F.coalesce(F.col("word2"), F.lit(0)).bitwiseAND(F.col("m2")) != 0),
        )
    )
    exact = urgent.distinct().withColumn("is_urgent", F.lit(1))
    audited = checked.join(exact, checked.k == exact.k, "left")
    return audited.agg(
        F.count("*").cast("bigint").alias("n_probed"),
        F.sum(F.coalesce(F.col("is_urgent"), F.lit(0))).cast("bigint").alias("n_exact"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).cast("bigint").alias("n_bloom_pass"),
        F.sum(
            F.when(F.col("bloom_pass") & F.col("is_urgent").isNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_false_pos"),
        F.sum(F.when(~F.col("bloom_pass") & F.col("is_urgent").isNotNull(), 1).otherwise(0))
        .cast("bigint").alias("n_false_neg"),
    )


_BLOOM_SQL = f"""
WITH urgent AS (
  SELECT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'),
positions AS (
  SELECT ('0x' || substr(md5('a' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
         % {_BLOOM_BITS} AS pos FROM urgent
  UNION ALL
  SELECT ('0x' || substr(md5('b' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
         % {_BLOOM_BITS} AS pos FROM urgent),
words AS (
  SELECT pos // {_BLOOM_WORD} AS word_idx,
         bit_or(1::BIGINT << CAST(pos % {_BLOOM_WORD} AS INTEGER)) AS word
  FROM positions GROUP BY 1),
probe AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
hashed AS (
  SELECT k,
    ('0x' || substr(md5('a' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
      % {_BLOOM_BITS} AS h1,
    ('0x' || substr(md5('b' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
      % {_BLOOM_BITS} AS h2
  FROM probe),
checked AS (
  SELECT h.k,
    (COALESCE(w1.word, 0) & (1::BIGINT << CAST(h.h1 % {_BLOOM_WORD} AS INTEGER))) <> 0
    AND
    (COALESCE(w2.word, 0) & (1::BIGINT << CAST(h.h2 % {_BLOOM_WORD} AS INTEGER))) <> 0
      AS bloom_pass,
    u.k IS NOT NULL AS is_urgent
  FROM hashed h
  LEFT JOIN words w1 ON w1.word_idx = h.h1 // {_BLOOM_WORD}
  LEFT JOIN words w2 ON w2.word_idx = h.h2 // {_BLOOM_WORD}
  LEFT JOIN (SELECT DISTINCT k FROM urgent) u ON u.k = h.k)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probed,
  CAST(SUM(CASE WHEN is_urgent THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
  CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
  CAST(SUM(CASE WHEN bloom_pass AND NOT is_urgent THEN 1 ELSE 0 END) AS BIGINT)
    AS n_false_pos,
  CAST(SUM(CASE WHEN NOT bloom_pass AND is_urgent THEN 1 ELSE 0 END) AS BIGINT)
    AS n_false_neg
FROM checked
"""


def q_holt_linear_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend, alpha=0.2,
    beta=0.1) of daily order revenue — a second, fully HASH-GATED model
    family beside the Prophet-style surface (whose model outputs are
    rows-only). The recurrence is inherently sequential, so it runs in
    applyInPandas per series; the oracle replays the identical
    IEEE-double recurrence in a recursive CTE. No rounding anywhere:
    both engines execute the same op sequence on the same doubles, so
    the bits match and the harness's %.6f canonicalization agrees.
    Scale shape: one task per (table, metric) series like the
    forecaster; state is O(1) per series."""
    import pandas as pd

    daily = _orders_daily(spark, sf_dir).select(
        "date", F.col("total_revenue").cast("double").alias("y")
    )
    alpha, beta = 0.2, 0.1

    def _holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("date").reset_index(drop=True)
        if len(pdf) < 2:
            return pd.DataFrame(
                {"date": [], "level": [], "trend": [], "fitted": []}
            )
        y = pdf["y"].tolist()
        lvl, tr = y[0], y[1] - y[0]
        levels, trends, fitted = [lvl], [tr], [y[0]]
        for i in range(1, len(y)):
            fit = lvl + tr
            new_lvl = alpha * y[i] + (1 - alpha) * (lvl + tr)
            tr = beta * (new_lvl - lvl) + (1 - beta) * tr
            lvl = new_lvl
            levels.append(lvl)
            trends.append(tr)
            fitted.append(fit)
        return pd.DataFrame(
            {"date": pdf["date"], "level": levels, "trend": trends, "fitted": fitted}
        )

    return (
        daily.groupBy(F.lit(1).alias("_g"))
        .applyInPandas(
            lambda _, pdf: _holt(pdf),
            "date date, level double, trend double, fitted double",
        )
        .orderBy("date")
    )


_HOLT_SQL = """
WITH RECURSIVE daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS y,
    ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE)) AS rn
  FROM orders GROUP BY 1),
init AS (
  SELECT a.d, a.y, a.rn, a.y AS level, b.y - a.y AS trend, a.y AS fitted
  FROM daily a JOIN daily b ON b.rn = 2 WHERE a.rn = 1),
holt(d, y, rn, level, trend, fitted) AS (
  SELECT d, y, rn, level, trend, fitted FROM init
  UNION ALL
  SELECT n.d, n.y, n.rn,
    0.2 * n.y + (1 - 0.2) * (h.level + h.trend),
    0.1 * ((0.2 * n.y + (1 - 0.2) * (h.level + h.trend)) - h.level)
      + (1 - 0.1) * h.trend,
    h.level + h.trend
  FROM holt h JOIN daily n ON n.rn = h.rn + 1)
SELECT d AS date, level, trend, fitted FROM holt ORDER BY d
"""


def q_corpus_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (96/2/2 by md5 of the
    doc id — stable across runs, engines, and cluster sizes, which is
    what makes a 100 TB split reproducible and leak-free), reported as
    doc and token mass per (source, split). Pure row-local hashing +
    one rollup; no shuffle beyond the final aggregate."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        % 100
    )
    n_tokens = F.size(
        F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    ).cast("bigint")
    split = (
        F.when(bucket < 96, "train").when(bucket < 98, "val").otherwise("test")
    )
    return (
        docs.select(F.col("source"), split.alias("split"), n_tokens.alias("t"))
        .groupBy("source", "split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("t").cast("bigint").alias("n_tokens"),
        )
        .orderBy("source", "split")
    )


_SPLIT_SQL = r"""
WITH assigned AS (
  SELECT source,
    CASE
      WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % 100 < 96 THEN 'train'
      WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % 100 < 98 THEN 'val'
      ELSE 'test' END AS split,
    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
         x -> x <> '')) AS BIGINT) AS t
  FROM documents)
SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(t) AS BIGINT) AS n_tokens
FROM assigned GROUP BY 1, 2 ORDER BY source, split
"""


_HASH_EMB_DIM = 16


def q_text_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing document embedding (the hashing trick): each token
    maps to one of 16 dimensions by md5, per-dim counts form the vector.
    This is the deterministic 'embed' step that connects the documents
    table to the similarity stack without any model — and unlike learned
    embeddings it is exactly replayable in SQL, so the whole vector is
    hash-gated. One explode + one groupBy with 16 conditional sums
    (codegen'd; ONE md5 per token, not per (token, dim))."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("t")
    )
    dim = (
        F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long")
        % _HASH_EMB_DIM
    )
    dimmed = tok.select("doc_id", dim.alias("dim"))
    return (
        dimmed.groupBy("doc_id")
        .agg(
            *[
                F.sum(F.when(F.col("dim") == i, 1).otherwise(0))
                .cast("bigint")
                .alias(f"f{i}")
                for i in range(_HASH_EMB_DIM)
            ]
        )
        .orderBy("doc_id")
    )


_HASH_EMB_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS t FROM documents),
dims AS (
  SELECT doc_id,
    ('0x' || substr(md5(t), 1, 15))::BIGINT % {_HASH_EMB_DIM} AS dim
  FROM tok)
SELECT doc_id,
  {", ".join(f"CAST(SUM(CASE WHEN dim = {i} THEN 1 ELSE 0 END) AS BIGINT) AS f{i}" for i in range(_HASH_EMB_DIM))}
FROM dims GROUP BY doc_id ORDER BY doc_id
"""


def q_curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation funnel with stage attribution: every document is
    claimed by the FIRST rule that rejects it — (1) too short (< 30
    tokens), (2) near-dup loser (min-id keeper over the Jaccard-0.8
    verified pairs, riding the persisted LSH stages), (3) LM quality
    (bigram score below half the corpus mean) — or survives to `kept`.
    Per-source stage counts are what a pipeline owner reads to see WHICH
    rule is eating their corpus. All thresholds and scores are exact
    integers, so the whole funnel is hash-gated.

    Scale: the LM per-doc scores and dup set are the two non-row-local
    inputs; the corpus-mean threshold is a broadcast single-row aggregate
    (never a global window), and the stage attribution itself is one
    row-local CASE over the joined flags."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "source", F.size(TX.tokens(F.col("text"))).cast("bigint").alias("n_tok")
    )
    dup = (
        DD.lsh_verified_pairs(docs, threshold=0.8, cache_key=sf_dir)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    # shared cached stage with bigram_lm_quality: one train + one score
    # pass per run, no matter how many queries consume the scores
    per_doc = LM.doc_scores(docs, cache_key=sf_dir)
    thr = per_doc.agg(
        F.expr("sum(sum_ppm) div sum(n_bigrams)").cast("bigint").alias("corpus_ppm")
    )
    stage = (
        base.join(dup, "doc_id", "left")
        .join(per_doc.select("doc_id", "mean_ppm"), "doc_id", "left")
        .crossJoin(F.broadcast(thr))
        .withColumn(
            "stage",
            F.when(F.col("n_tok") < 30, F.lit("drop_short"))
            .when(F.col("is_dup") == 1, F.lit("drop_near_dup"))
            .when(
                F.col("mean_ppm") * 2 < F.col("corpus_ppm"), F.lit("drop_low_lm")
            )
            .otherwise(F.lit("kept")),
        )
    )
    return (
        stage.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("stage") == "drop_short", 1).otherwise(0))
            .cast("bigint")
            .alias("drop_short"),
            F.sum(F.when(F.col("stage") == "drop_near_dup", 1).otherwise(0))
            .cast("bigint")
            .alias("drop_near_dup"),
            F.sum(F.when(F.col("stage") == "drop_low_lm", 1).otherwise(0))
            .cast("bigint")
            .alias("drop_low_lm"),
            F.sum(F.when(F.col("stage") == "kept", 1).otherwise(0))
            .cast("bigint")
            .alias("kept"),
        )
        .orderBy("source")
    )


_CURATION_FUNNEL_SQL = f"""
WITH base AS (
  SELECT doc_id, source, CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok
  FROM documents),
s AS (SELECT doc_id, unnest({_SHINGLES_SQL}) AS shg FROM documents),
h AS (SELECT doc_id, ('0x' || substr(md5(shg), 1, 15))::BIGINT % {_P} AS x FROM s),
sig AS (SELECT doc_id, {_SIG_MINS_SQL} FROM h GROUP BY doc_id),
banded AS (
  SELECT doc_id, unnest([{_BAND_LIST_SQL}]) AS band
  FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
sets AS (SELECT doc_id, {_SHINGLES_SQL} AS sh_set FROM documents),
dup AS (
  SELECT DISTINCT c.id_b AS doc_id, 1 AS is_dup
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b
  WHERE len(list_intersect(sa.sh_set, sb.sh_set))
      / (len(sa.sh_set) + len(sb.sh_set) - len(list_intersect(sa.sh_set, sb.sh_set)))
      >= 0.8),
tk AS (
  SELECT doc_id, {_TOKS_SQL} AS l FROM documents
  WHERE len({_TOKS_SQL}) >= 2),
bg AS (
  SELECT doc_id, unnest(l[1:len(l)-1]) AS w1, unnest(l[2:len(l)]) AS w2 FROM tk),
c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1),
lm AS (
  SELECT c2.w1, c2.w2, c2.c2 * 1000000 // c1.c1 AS p_ppm
  FROM c2 JOIN c1 ON c1.w1 = c2.w1),
per_doc AS (
  SELECT bg.doc_id, COUNT(*) AS n_bigrams, SUM(p_ppm) AS sum_ppm,
    SUM(p_ppm) // COUNT(*) AS mean_ppm
  FROM bg JOIN lm ON lm.w1 = bg.w1 AND lm.w2 = bg.w2
  GROUP BY bg.doc_id),
thr AS (SELECT SUM(sum_ppm) // SUM(n_bigrams) AS corpus_ppm FROM per_doc),
staged AS (
  SELECT b.source,
    CASE WHEN b.n_tok < 30 THEN 'drop_short'
         WHEN d.is_dup = 1 THEN 'drop_near_dup'
         WHEN p.mean_ppm * 2 < t.corpus_ppm THEN 'drop_low_lm'
         ELSE 'kept' END AS stage
  FROM base b
  LEFT JOIN dup d ON d.doc_id = b.doc_id
  LEFT JOIN per_doc p ON p.doc_id = b.doc_id
  CROSS JOIN thr t)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN stage = 'drop_short' THEN 1 ELSE 0 END) AS BIGINT) AS drop_short,
  CAST(SUM(CASE WHEN stage = 'drop_near_dup' THEN 1 ELSE 0 END) AS BIGINT) AS drop_near_dup,
  CAST(SUM(CASE WHEN stage = 'drop_low_lm' THEN 1 ELSE 0 END) AS BIGINT) AS drop_low_lm,
  CAST(SUM(CASE WHEN stage = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS kept
FROM staged GROUP BY source ORDER BY source
"""


def q_corpus_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-diversity telemetry: treating doc_id as crawl order, what
    fraction of each document's 5-char shingles has never been seen
    before? A healthy crawl keeps novelty high; a collapsing one trends
    toward boilerplate. Report: per (source, arrival decile), docs and
    novelty ppm. The only corpus-sized shuffle is the min-doc-per-shingle
    aggregate (map-side combined); per-doc novel counts come from that
    aggregate alone (groupBy first_doc — no join back to the exploded
    shingles), and per-doc shingle counts are row-local set sizes from
    the dedup family's persisted shingle-set stage."""
    docs = _t(spark, sf_dir, "documents")
    sets = DD.shingle_sets(docs, cache_key=sf_dir)
    exploded = sets.select("doc_id", F.explode("sh_set").alias("sh"))
    first = exploded.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    novel = first.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").cast("bigint").alias("n_novel")
    )
    per_doc = (
        sets.select("doc_id", F.size("sh_set").cast("bigint").alias("n_sh"))
        .join(novel, "doc_id", "left")
        .fillna(0, subset=["n_novel"])
        .join(docs.select("doc_id", "source"), "doc_id")
    )
    decile = F.ntile(10).over(Window.partitionBy("source").orderBy("doc_id"))
    return (
        per_doc.withColumn("decile", decile.cast("bigint"))
        .groupBy("source", "decile")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_sh").cast("bigint").alias("n_shingles"),
            F.expr("sum(n_novel) * 1000000 div sum(n_sh)")
            .cast("bigint")
            .alias("novelty_ppm"),
        )
        .orderBy("source", "decile")
    )


_NOVELTY_SQL = f"""
WITH sets AS (SELECT doc_id, {_SHINGLES_SQL} AS sh_set FROM documents),
exploded AS (SELECT doc_id, unnest(sh_set) AS sh FROM sets),
first AS (SELECT sh, MIN(doc_id) AS first_doc FROM exploded GROUP BY sh),
novel AS (SELECT first_doc AS doc_id, COUNT(*) AS n_novel FROM first GROUP BY first_doc),
per_doc AS (
  SELECT s.doc_id, len(s.sh_set) AS n_sh, COALESCE(n.n_novel, 0) AS n_novel,
    d.source
  FROM sets s
  LEFT JOIN novel n ON n.doc_id = s.doc_id
  JOIN documents d ON d.doc_id = s.doc_id),
binned AS (
  SELECT source, n_sh, n_novel,
    NTILE(10) OVER (PARTITION BY source ORDER BY doc_id) AS decile
  FROM per_doc)
SELECT source, CAST(decile AS BIGINT) AS decile,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_sh) AS BIGINT) AS n_shingles,
  CAST(SUM(n_novel) * 1000000 // SUM(n_sh) AS BIGINT) AS novelty_ppm
FROM binned GROUP BY source, decile ORDER BY source, decile
"""


def q_source_domain_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing analytics: cosine similarity between source shards in
    the feature-hash embedding space (per-source token-count vectors over
    the same 16 md5 dims as text_hash_embedding). The corpus reduces to
    one 16-dim integer vector per source (one explode + groupBy, map-side
    combined); the pair stage is an inequality join over the CHECKPOINTED
    |sources|-row aggregate — bounded at every scale factor (cf. the
    rank_correlation/triangles lesson), never over docs. Dot products and
    norms are exact bigints; the only doubles are the final sqrt/divide,
    computed in the same op order both engines."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(TX.tokens(F.col("text"))).alias("t"))
    dim = (
        F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long") % _HASH_EMB_DIM
    )
    vec = (
        tok.select("source", dim.alias("dim"))
        .groupBy("source")
        .agg(
            *[
                F.sum(F.when(F.col("dim") == i, 1).otherwise(0))
                .cast("bigint")
                .alias(f"f{i}")
                for i in range(_HASH_EMB_DIM)
            ]
        )
        .localCheckpoint(eager=True)  # tiny; prevents double corpus derivation
    )
    a = vec.select(
        F.col("source").alias("source_x"),
        *[F.col(f"f{i}").alias(f"a{i}") for i in range(_HASH_EMB_DIM)],
    )
    b = vec.select(
        F.col("source").alias("source_y"),
        *[F.col(f"f{i}").alias(f"b{i}") for i in range(_HASH_EMB_DIM)],
    )
    dot = sum(F.col(f"a{i}") * F.col(f"b{i}") for i in range(_HASH_EMB_DIM))
    na2 = sum(F.col(f"a{i}") * F.col(f"a{i}") for i in range(_HASH_EMB_DIM))
    nb2 = sum(F.col(f"b{i}") * F.col(f"b{i}") for i in range(_HASH_EMB_DIM))
    return (
        a.join(b, F.col("source_x") < F.col("source_y"))
        .select(
            "source_x",
            "source_y",
            dot.cast("bigint").alias("dot"),
            F.round(
                dot
                / (
                    F.sqrt(na2.cast("double")) * F.sqrt(nb2.cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
        .orderBy("source_x", "source_y")
    )


_DOMAIN_SIM_SQL = f"""
WITH tok AS (SELECT source, unnest({_TOKS_SQL}) AS t FROM documents),
dims AS (
  SELECT source,
    ('0x' || substr(md5(t), 1, 15))::BIGINT % {_HASH_EMB_DIM} AS dim
  FROM tok),
vec AS (
  SELECT source,
    {", ".join(f"CAST(SUM(CASE WHEN dim = {i} THEN 1 ELSE 0 END) AS BIGINT) AS f{i}" for i in range(_HASH_EMB_DIM))}
  FROM dims GROUP BY source)
SELECT a.source AS source_x, b.source AS source_y,
  CAST(({" + ".join(f"a.f{i} * b.f{i}" for i in range(_HASH_EMB_DIM))}) AS BIGINT) AS dot,
  round(({" + ".join(f"a.f{i} * b.f{i}" for i in range(_HASH_EMB_DIM))})
    / (sqrt(CAST(({" + ".join(f"a.f{i} * a.f{i}" for i in range(_HASH_EMB_DIM))}) AS DOUBLE))
       * sqrt(CAST(({" + ".join(f"b.f{i} * b.f{i}" for i in range(_HASH_EMB_DIM))}) AS DOUBLE))), 6) AS cosine
FROM vec a JOIN vec b ON a.source < b.source
ORDER BY source_x, source_y
"""


def q_stream_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-sizing audit: treating event_id as arrival order, how
    late does each event arrive relative to the max event-time seen so
    far? The p50/p90/p99/max lateness (exact rank picks) and the ppm of
    events later than 60 s are exactly the numbers that choose a
    Structured Streaming `withWatermark` delay. Both global passes are
    DISTRIBUTED (operators/ranking): the arrival-order running max
    stitches per-partition cummax with broadcast prefix maxima, and the
    exact rank picks ride global_row_number (range-partitioned +
    broadcast offsets) — no single-partition window at any step."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("us")
    )
    cm = RK.global_running_max(ev, ["event_id"], "us", "cummax_us")
    late = cm.select((F.col("cummax_us") - F.col("us")).alias("late_us"),
                     "event_id")
    ranked = RK.global_row_number(late, ["late_us", "event_id"], col_name="rk")
    n = ranked.count()  # bounded scalar off the internal checkpoint

    def pick(q: float) -> F.Column:
        import math
        return F.max(
            F.when(F.col("rk") == math.ceil(n * q), F.col("late_us"))
        )

    agg = ranked.agg(
        pick(0.5).alias("p50_late_us"),
        pick(0.9).alias("p90_late_us"),
        pick(0.99).alias("p99_late_us"),
        F.max("late_us").alias("max_late_us"),
        F.expr(
            "CAST(SUM(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END) * 1000000"
            f" div {n} AS BIGINT)"
        ).alias("over_60s_ppm"),
    )
    return agg.select(
        F.lit(n).cast("bigint").alias("n_events"),
        "p50_late_us", "p90_late_us", "p99_late_us",
        "max_late_us", "over_60s_ppm",
    )


_LATENESS_SQL = """
WITH ev AS (SELECT event_id, epoch_us(ts) AS us FROM events),
late AS (
  SELECT event_id,
    MAX(us) OVER (ORDER BY event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - us AS late_us
  FROM ev),
ranked AS (
  SELECT late_us,
    ROW_NUMBER() OVER (ORDER BY late_us, event_id) AS rk,
    COUNT(*) OVER () AS n
  FROM late)
SELECT CAST(MAX(n) AS BIGINT) AS n_events,
  CAST(MAX(CASE WHEN rk = CAST(CEIL(n * 0.5) AS BIGINT) THEN late_us END)
    AS BIGINT) AS p50_late_us,
  CAST(MAX(CASE WHEN rk = CAST(CEIL(n * 0.9) AS BIGINT) THEN late_us END)
    AS BIGINT) AS p90_late_us,
  CAST(MAX(CASE WHEN rk = CAST(CEIL(n * 0.99) AS BIGINT) THEN late_us END)
    AS BIGINT) AS p99_late_us,
  CAST(MAX(late_us) AS BIGINT) AS max_late_us,
  CAST(SUM(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END) * 1000000
    // MAX(n) AS BIGINT) AS over_60s_ppm
FROM ranked
"""


def q_boilerplate_prefix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-prevalence report: per source shard, the modal 16-char
    normalized document prefix and its share. Scraped corpora concentrate
    templated headers/navigation in the document head, so a shard whose
    modal prefix share spikes is a boilerplate-stripping candidate before
    tokenization. One (source, prefix) groupBy with map-side combine, a
    top-1 window over the per-source prefix table (prefix-type-bounded,
    not corpus-bounded), and a broadcast-sized totals join."""
    docs = _t(spark, sf_dir, "documents")
    pre = docs.select(
        "source", F.substring(TX.normalize_text(F.col("text")), 1, 16).alias("pre")
    )
    # prefix-type-bounded aggregate referenced twice (top + totals):
    # checkpoint so the corpus scan runs once (cf. the khop/vol lesson)
    counts = (
        pre.groupBy("source", "pre")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("pre"))
    top = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("source", F.col("pre").alias("modal_prefix"), F.col("n").alias("modal_n"))
    )
    totals = counts.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_prefixes"),
    )
    return (
        totals.join(top, "source")
        .select(
            "source",
            "n_docs",
            "n_prefixes",
            "modal_prefix",
            F.col("modal_n").cast("bigint").alias("modal_n"),
            F.expr("modal_n * 1000000 div n_docs").cast("bigint").alias("modal_share_ppm"),
        )
        .orderBy("source")
    )


_BOILERPLATE_SQL = f"""
WITH p AS (SELECT source, substr({_NORM_SQL}, 1, 16) AS pre FROM documents),
counts AS (SELECT source, pre, COUNT(*) AS n FROM p GROUP BY source, pre),
top AS (
  SELECT source, pre AS modal_prefix, n AS modal_n,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, pre ASC) AS rk
  FROM counts),
totals AS (
  SELECT source, SUM(n) AS n_docs, COUNT(*) AS n_prefixes FROM counts GROUP BY source)
SELECT t.source, CAST(t.n_docs AS BIGINT) AS n_docs,
  CAST(t.n_prefixes AS BIGINT) AS n_prefixes,
  top.modal_prefix, CAST(top.modal_n AS BIGINT) AS modal_n,
  CAST(top.modal_n * 1000000 // t.n_docs AS BIGINT) AS modal_share_ppm
FROM totals t JOIN top ON top.source = t.source AND top.rk = 1
ORDER BY t.source
"""


def q_cross_source_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage census: near-dup pairs (Jaccard >= 0.8) whose two
    docs live in DIFFERENT source shards — exactly the pairs that turn a
    shard-level train/eval split into contamination. Rides the persisted
    LSH candidate + shingle-set stages (cache_key), so the marginal cost is
    one metadata join; the report aggregates to unordered shard pairs."""
    docs = _t(spark, sf_dir, "documents")
    pairs = DD.lsh_verified_pairs(docs, threshold=0.8, cache_key=sf_dir)
    meta = docs.select("doc_id", "source")
    sa = meta.select(F.col("doc_id").alias("id_a"), F.col("source").alias("src_a"))
    sb = meta.select(F.col("doc_id").alias("id_b"), F.col("source").alias("src_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("src_a") != F.col("src_b"))
        .select(
            F.least("src_a", "src_b").alias("source_x"),
            F.greatest("src_a", "src_b").alias("source_y"),
            F.round("jaccard", 6).alias("jaccard"),
        )
        .groupBy("source_x", "source_y")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.max("jaccard").alias("max_jaccard"),
        )
        .orderBy("source_x", "source_y")
    )


_LEAKAGE_SQL = f"""
WITH s AS (SELECT doc_id, unnest({_SHINGLES_SQL}) AS shg FROM documents),
h AS (SELECT doc_id, ('0x' || substr(md5(shg), 1, 15))::BIGINT % {_P} AS x FROM s),
sig AS (SELECT doc_id, {_SIG_MINS_SQL} FROM h GROUP BY doc_id),
banded AS (
  SELECT doc_id, unnest([{_BAND_LIST_SQL}]) AS band
  FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
sets AS (SELECT doc_id, {_SHINGLES_SQL} AS sh_set FROM documents),
verified AS (
  SELECT c.id_a, c.id_b,
    len(list_intersect(sa.sh_set, sb.sh_set))
      / (len(sa.sh_set) + len(sb.sh_set) - len(list_intersect(sa.sh_set, sb.sh_set))) AS jaccard
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b
  WHERE jaccard >= 0.8),
meta AS (SELECT doc_id, source FROM documents)
SELECT LEAST(ma.source, mb.source) AS source_x,
  GREATEST(ma.source, mb.source) AS source_y,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  MAX(round(v.jaccard, 6)) AS max_jaccard
FROM verified v
JOIN meta ma ON ma.doc_id = v.id_a
JOIN meta mb ON mb.doc_id = v.id_b
WHERE ma.source <> mb.source
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_epoch_shuffle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle for training-data delivery: every doc is
    assigned a pseudo-random position key md5('epoch7|' || doc_id) and a
    shard (key mod 8) — the same permutation on any cluster size, any run.
    The manifest is what a data loader consumes: per shard, its doc count,
    share of the corpus, an order-insensitive id checksum, and the key
    range. At 100 TB the write is repartitionByRange on the key (narrow
    rows, near-uniform by construction); no global sort ever runs."""
    docs = _t(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("epoch7|"), F.col("doc_id").cast("string"))).alias("k"),
    ).withColumn(
        "shard",
        (F.conv(F.substring("k", 1, 8), 16, 10).cast("bigint") % 8).cast("bigint"),
    )
    # shard = key mod 8 ∈ 0..7 — the %-literal domain rule makes this
    # 8-row grain visible to the plan census (the share window below runs
    # over these 8 rows)
    agg = keyed.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
        F.min("k").alias("first_key"),
        F.max("k").alias("last_key"),
    )
    # total derives from the 8-row aggregate itself (window over shards),
    # so the corpus is scanned exactly once
    return (
        agg.withColumn("_total", F.sum("n_docs").over(Window.partitionBy()))
        .withColumn("share_ppm", F.expr("n_docs * 1000000 div _total").cast("bigint"))
        .select(
            "shard", "n_docs", "share_ppm", "id_checksum", "first_key", "last_key"
        )
        .orderBy("shard")
    )


_EPOCH_SHUFFLE_SQL = """
WITH keyed AS (
  SELECT doc_id, md5('epoch7|' || CAST(doc_id AS VARCHAR)) AS k
  FROM documents),
sharded AS (
  SELECT doc_id, k, ('0x' || substr(k, 1, 8))::BIGINT % 8 AS shard FROM keyed),
tot AS (SELECT COUNT(*) AS n FROM sharded)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(*) * 1000000 // MAX(tot.n) AS BIGINT) AS share_ppm,
  CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
  MIN(k) AS first_key, MAX(k) AS last_key
FROM sharded, tot
GROUP BY shard ORDER BY shard
"""


# --------------------------------------------------------------------------
# corpus policy gates: blocklist filtering, substring-level dup spans,
# temperature-based domain mixing, cross-shard distribution drift
# --------------------------------------------------------------------------

_BLOCKLIST = ("slow", "merge", "spam")


def q_blocklist_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style banned-term gate: per source shard, how many docs contain
    a blocklisted token, total hits, and the token budget kept if flagged
    docs are dropped (exact integer ppm). Per-row array filter only —
    embarrassingly parallel; the shuffle carries one 5-int row per doc.
    ('spam' is deliberately absent from the fixture vocab: zero-hit terms
    must cost nothing and report cleanly.)"""
    docs = _t(spark, sf_dir, "documents")
    t = TX.tokens(F.col("text"))
    hits = F.size(F.filter(t, lambda x: x.isin(*_BLOCKLIST)))
    per = docs.select(
        "source",
        F.size(t).alias("n_toks"),
        hits.alias("hits"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("hits") > 0).cast("int")).cast("bigint").alias("n_flagged"),
            F.sum("hits").cast("bigint").alias("blocked_hits"),
            F.sum("n_toks").cast("bigint").alias("tokens_total"),
            F.sum(F.when(F.col("hits") == 0, F.col("n_toks")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("tokens_kept"),
        )
        .withColumn(
            "kept_ppm",
            F.expr("tokens_kept * 1000000 div tokens_total").cast("bigint"),
        )
        .orderBy("source")
    )


_BLOCKLIST_SQL = f"""
WITH d AS (
  SELECT source, len({_TOKS_SQL}) AS n_toks,
    len(list_filter({_TOKS_SQL}, x -> x IN ('slow', 'merge', 'spam'))) AS hits
  FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
  CAST(SUM(hits) AS BIGINT) AS blocked_hits,
  CAST(SUM(n_toks) AS BIGINT) AS tokens_total,
  CAST(SUM(CASE WHEN hits = 0 THEN n_toks ELSE 0 END) AS BIGINT) AS tokens_kept,
  CAST(SUM(CASE WHEN hits = 0 THEN n_toks ELSE 0 END) * 1000000
       // SUM(n_toks) AS BIGINT) AS kept_ppm
FROM d GROUP BY source ORDER BY source
"""


def q_dup_span_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication spans — the signal doc-level MinHash
    misses (Lee et al., 'Deduplicating Training Data Makes LMs Better'):
    a doc can be globally unique yet contain a long pasted passage. Every
    positional 5-gram shingle is marked duplicated if an earlier doc
    (min doc_id) already contains it; gaps-and-islands over positions
    yields the longest contiguous duplicated token span per doc. Scale
    shape: one explode, a window-min on the 16-byte shingle hash, per-doc
    windows — one corpus scan, no pairwise comparison ever."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", TX.tokens(F.col("text")).alias("t"))
    idx = F.when(
        F.size("t") >= 5, F.sequence(F.lit(1), F.size("t") - 4)
    ).otherwise(F.array().cast("array<int>"))
    sh = toks.select(
        "doc_id",
        F.explode(idx).alias("p"),
        F.col("t"),
    ).select(
        "doc_id",
        "p",
        F.md5(F.concat_ws(" ", F.slice("t", F.col("p"), F.lit(5)))).alias("sh"),
    )
    # ONE linear pipeline over the exploded shingles — no join-back, no
    # lineage reuse: first-seen via window-min on the shingle hash (one
    # shuffle), islands via a (doc, dup)-partitioned window (one shuffle),
    # then two partition-compatible aggregations. Exactly one corpus scan.
    w_sh = Window.partitionBy("sh")
    marked = sh.withColumn("dup", F.min("doc_id").over(w_sh) < F.col("doc_id"))
    w_run = Window.partitionBy("doc_id", "dup").orderBy("p")
    runs = marked.withColumn("grp", F.col("p") - F.row_number().over(w_run))
    per_doc = (
        runs.groupBy("doc_id", "dup", "grp")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("dup"), F.col("cnt")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("dup_shingles"),
            F.coalesce(F.max(F.when(F.col("dup"), F.col("cnt"))), F.lit(0)).alias(
                "span_raw"
            ),
        )
        .withColumn(
            "max_dup_span",
            F.when(F.col("span_raw") > 0, F.col("span_raw") + 4)
            .otherwise(F.lit(0))
            .cast("bigint"),
        )
    )
    # per_doc is one row per document — corpus-proportional, so the
    # top-20 is TakeOrderedAndProject, rank window over 20 rows only
    order = [
        F.col("max_dup_span").desc(), F.col("dup_shingles").desc(), F.col("doc_id")
    ]
    top = RK.top_k(per_doc, order, 20)
    return top.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    ).select("doc_id", "n_shingles", "dup_shingles", "max_dup_span", "rank")


_DUP_SPAN_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
sh AS (
  SELECT doc_id, p, md5(array_to_string(t[p:p+4], ' ')) AS sh
  FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS u(p)),
marked AS (
  SELECT doc_id, p,
    MIN(doc_id) OVER (PARTITION BY sh) < doc_id AS dup
  FROM sh),
runs AS (
  SELECT doc_id, p, dup,
    p - ROW_NUMBER() OVER (PARTITION BY doc_id, dup ORDER BY p) AS grp
  FROM marked),
spans AS (
  SELECT doc_id, MAX(cnt) + 4 AS max_dup_span FROM (
    SELECT doc_id, grp, COUNT(*) AS cnt FROM runs WHERE dup GROUP BY doc_id, grp)
  GROUP BY doc_id),
stats AS (
  SELECT doc_id, COUNT(*) AS n_shingles,
    SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS dup_shingles
  FROM marked GROUP BY doc_id)
SELECT doc_id, n_shingles, dup_shingles, max_dup_span, rank FROM (
  SELECT s.doc_id, CAST(s.n_shingles AS BIGINT) AS n_shingles,
    CAST(s.dup_shingles AS BIGINT) AS dup_shingles,
    CAST(COALESCE(sp.max_dup_span, 0) AS BIGINT) AS max_dup_span,
    ROW_NUMBER() OVER (ORDER BY COALESCE(sp.max_dup_span, 0) DESC,
                       s.dup_shingles DESC, s.doc_id) AS rank
  FROM stats s LEFT JOIN spans sp ON s.doc_id = sp.doc_id)
WHERE rank <= 20
"""


def q_domain_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing (alpha = 0.5, the multilingual
    upsampling rule): per-source weight c^alpha / sum(c^alpha) and the
    per-doc sample factor it implies. Sqrt weights are rounded to the
    1e-6 grid and summed as DECIMAL so the normalizer is order-independent
    and bit-identical cross-engine. One corpus scan into a 20-row
    aggregate; everything after is driver-free window math."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(F.count("*").cast("bigint").alias("n_docs"))
    w = per.withColumn(
        "w_raw",
        F.round(F.sqrt(F.col("n_docs").cast("double")), 6).cast("decimal(38,6)"),
    )
    tot = w.withColumn(
        "w_sum", F.sum("w_raw").over(Window.partitionBy())
    ).withColumn("n_tot", F.sum("n_docs").over(Window.partitionBy()))
    weight = F.round(
        F.col("w_raw").cast("double") / F.col("w_sum").cast("double"), 6
    )
    return tot.select(
        "source",
        "n_docs",
        weight.alias("weight"),
        F.round(
            weight * F.col("n_tot").cast("double") / F.col("n_docs").cast("double"),
            6,
        ).alias("sample_factor"),
    ).orderBy("source")


_TEMPERATURE_MIX_SQL = """
WITH per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source),
w AS (
  SELECT source, n_docs,
    CAST(ROUND(sqrt(CAST(n_docs AS DOUBLE)), 6) AS DECIMAL(38,6)) AS w_raw
  FROM per),
t AS (
  SELECT source, n_docs, w_raw,
    SUM(w_raw) OVER () AS w_sum,
    CAST(SUM(n_docs) OVER () AS BIGINT) AS n_tot
  FROM w)
SELECT source, n_docs,
  ROUND(CAST(w_raw AS DOUBLE) / CAST(w_sum AS DOUBLE), 6) AS weight,
  ROUND(ROUND(CAST(w_raw AS DOUBLE) / CAST(w_sum AS DOUBLE), 6)
        * CAST(n_tot AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS sample_factor
FROM t ORDER BY source
"""


def q_shard_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of token distributions between every
    source-shard pair — the drift/eval report that tells a data recipe
    which shards are redundant and which add coverage. Distributions are
    per-shard aggregates (vocab-sized, tiny at any SF), so the pairwise
    stage joins pre-aggregated frames, never raw docs; JS terms are
    rounded to 1e-12 and summed as DECIMAL for cross-engine exactness."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(TX.tokens(F.col("text"))).alias("tok"))
    # vocab-x-shards rows: checkpoint so the pairwise stage's four aliases
    # derive from the tiny aggregate, not four corpus re-scans
    dist = (
        tok.groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = dist.groupBy("source").agg(F.sum("c").alias("n"))
    d = dist.join(tot, "source").select(
        "source",
        "tok",
        (F.col("c").cast("double") / F.col("n").cast("double")).alias("p"),
    )
    srcs = tot.select("source")
    # shard domain is bounded (20 here, O(100s) in any corpus) — broadcast
    # the inequality pair join so it plans BNLJ, never a cartesian shuffle
    pairs = srcs.select(F.col("source").alias("src_a")).join(
        F.broadcast(srcs.select(F.col("source").alias("src_b"))),
        F.col("src_a") < F.col("src_b"),
    )
    pa = pairs.join(
        d.select(F.col("source").alias("src_a"), "tok", F.col("p").alias("pa")),
        ["src_a"],
    )
    pb = pairs.join(
        d.select(F.col("source").alias("src_b"), "tok", F.col("p").alias("pb")),
        ["src_b"],
    )
    merged = (
        pa.join(pb, ["src_a", "src_b", "tok"], "full_outer")
        .withColumn("pa", F.coalesce("pa", F.lit(0.0)))
        .withColumn("pb", F.coalesce("pb", F.lit(0.0)))
    )
    term = 0.5 * F.when(
        F.col("pa") > 0,
        F.col("pa") * F.log(2.0 * F.col("pa") / (F.col("pa") + F.col("pb"))),
    ).otherwise(F.lit(0.0)) + 0.5 * F.when(
        F.col("pb") > 0,
        F.col("pb") * F.log(2.0 * F.col("pb") / (F.col("pa") + F.col("pb"))),
    ).otherwise(F.lit(0.0))
    return (
        merged.groupBy("src_a", "src_b")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens_union"),
            F.round(
                F.sum(F.round(term, 12).cast("decimal(38,12)")).cast("double"), 6
            ).alias("js_div"),
        )
        .orderBy("src_a", "src_b")
    )


_JS_DIVERGENCE_SQL = f"""
WITH tok AS (
  SELECT source, unnest({_TOKS_SQL}) AS tok FROM documents),
dist AS (
  SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY source, tok),
tot AS (SELECT source, SUM(c) AS n FROM dist GROUP BY source),
d AS (
  SELECT dist.source, tok,
    CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p
  FROM dist JOIN tot ON dist.source = tot.source),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM tot a JOIN tot b ON a.source < b.source),
merged AS (
  SELECT p.src_a, p.src_b, v.tok,
    COALESCE(da.p, 0.0) AS pa, COALESCE(db.p, 0.0) AS pb
  FROM pairs p
  CROSS JOIN (SELECT DISTINCT tok FROM dist) v
  LEFT JOIN d da ON da.source = p.src_a AND da.tok = v.tok
  LEFT JOIN d db ON db.source = p.src_b AND db.tok = v.tok
  WHERE COALESCE(da.p, 0.0) > 0 OR COALESCE(db.p, 0.0) > 0),
terms AS (
  SELECT src_a, src_b,
    0.5 * CASE WHEN pa > 0 THEN pa * ln(2.0 * pa / (pa + pb)) ELSE 0.0 END
    + 0.5 * CASE WHEN pb > 0 THEN pb * ln(2.0 * pb / (pa + pb)) ELSE 0.0 END
      AS term
  FROM merged)
SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_tokens_union,
  ROUND(CAST(SUM(CAST(ROUND(term, 12) AS DECIMAL(38,12))) AS DOUBLE), 6) AS js_div
FROM terms GROUP BY src_a, src_b ORDER BY src_a, src_b
"""


def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge round of tokenizer training: weighted character-pair
    counts over the corpus. The classic two-phase trick makes this viable
    at 100 TB — one corpus pass folds into the word-frequency table
    (vocab ≪ corpus), then pair counting explodes only the tiny vocab
    table, never the corpus. Output: top-20 merge candidates with
    type/token statistics, the table a BPE trainer's first iteration
    would commit."""
    docs = _t(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(TX.tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    idx = F.when(
        F.length("w") >= 2, F.sequence(F.lit(1), F.length("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = wf.select("w", "cnt", F.explode(idx).alias("p")).select(
        "w", "cnt", F.col("w").substr(F.col("p"), F.lit(2)).alias("pair")
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("cnt").cast("bigint").alias("weighted_count"),
        F.countDistinct("w").cast("bigint").alias("n_word_types"),
    )
    # distinct character pairs grow with the vocab — top-k via
    # TakeOrderedAndProject, rank window over the 20-row result only
    order = [F.col("weighted_count").desc(), F.col("pair")]
    top = RK.top_k(agg, order, 20)
    return top.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    ).select("pair", "weighted_count", "n_word_types", "rank")


_BPE_MERGE_SQL = f"""
WITH wf AS (
  SELECT w, COUNT(*) AS cnt
  FROM (SELECT unnest({_TOKS_SQL}) AS w FROM documents) GROUP BY w),
pairs AS (
  SELECT w, cnt, substr(w, p, 2) AS pair
  FROM wf, UNNEST(generate_series(1, length(w) - 1)) AS u(p)),
agg AS (
  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS weighted_count,
    CAST(COUNT(DISTINCT w) AS BIGINT) AS n_word_types
  FROM pairs GROUP BY pair)
SELECT pair, weighted_count, n_word_types, rank FROM (
  SELECT pair, weighted_count, n_word_types,
    ROW_NUMBER() OVER (ORDER BY weighted_count DESC, pair) AS rank FROM agg)
WHERE rank <= 20
"""


_PCA_DIMS = 16
_PCA_ITERS = 8


def q_embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding covariance via 8 unrolled
    power-iteration rounds — the deterministic PCA primitive (whitening /
    outlier axes / spectral screening) without MLlib's RNG-seeded SVD.
    One corpus pass builds exact decimal power sums for the leading
    16x16 covariance block (the stats_moments pattern over array
    columns); every later round is driver-free math on a checkpointed
    256-row matrix. Matvec terms and norms are rounded to fixed decimal
    grids each round, so both engines walk the identical float
    trajectory. Loadings are sign-normalized on dim 0."""
    d, iters = _PCA_DIMS, _PCA_ITERS
    em = _t(spark, sf_dir, "embeddings")
    base = em.select(
        *[F.col("embedding")[i].cast("double").alias(f"x{i}") for i in range(d)]
    )
    aggs = [F.count("*").alias("n")]
    for i in range(d):
        aggs.append(
            F.sum(F.col(f"x{i}").cast("decimal(38,10)")).cast("double").alias(f"s{i}")
        )
    for i in range(d):
        for j in range(i, d):
            aggs.append(
                F.sum((F.col(f"x{i}") * F.col(f"x{j}")).cast("decimal(38,10)"))
                .cast("double")
                .alias(f"p{i}_{j}")
            )
    sums = base.agg(*aggs).localCheckpoint(eager=True)  # 1 row
    cells = []
    for i in range(d):
        for j in range(d):
            a, b = min(i, j), max(i, j)
            c = F.round(
                F.col(f"p{a}_{b}") / F.col("n")
                - (F.col(f"s{i}") / F.col("n")) * (F.col(f"s{j}") / F.col("n")),
                9,
            )
            cells.append(
                F.struct(F.lit(i).alias("i"), F.lit(j).alias("j"), c.alias("c"))
            )
    cov = (
        sums.select(F.explode(F.array(*cells)).alias("e"))
        .select("e.i", "e.j", "e.c")
        .localCheckpoint(eager=True)
    )
    v = spark.createDataFrame([(j, 0.25) for j in range(d)], "j int, v double")
    nrm = None
    for _ in range(iters):
        # one eager job per round: checkpoint u (16 rows); nrm and v are
        # lazy one-stage derivations of it, so no subtree is ever computed
        # twice and the lineage stays flat across rounds
        u = (
            cov.join(v, "j")
            .groupBy("i")
            .agg(
                F.round(
                    F.sum(
                        F.round(F.col("c") * F.col("v"), 12).cast("decimal(38,12)")
                    ).cast("double"),
                    9,
                ).alias("u")
            )
            .localCheckpoint(eager=True)
        )
        nrm = u.agg(
            F.round(
                F.sqrt(
                    F.sum(
                        F.round(F.col("u") * F.col("u"), 12).cast("decimal(38,12)")
                    ).cast("double")
                ),
                9,
            ).alias("nrm")
        )
        v = u.crossJoin(F.broadcast(nrm)).select(
            F.col("i").alias("j"), F.round(F.col("u") / F.col("nrm"), 9).alias("v")
        )
    sign = v.filter(F.col("j") == 0).select(
        F.when(F.col("v") < 0, F.lit(-1.0)).otherwise(F.lit(1.0)).alias("sgn")
    )
    return (
        v.crossJoin(F.broadcast(sign))
        .crossJoin(F.broadcast(nrm))
        .select(
            F.col("j").alias("dim"),
            F.round(F.col("v") * F.col("sgn"), 6).alias("loading"),
            F.round(F.col("nrm"), 6).alias("eigenvalue"),
        )
        .orderBy("dim")
    )


def _pca_power_sql(d: int = _PCA_DIMS, iters: int = _PCA_ITERS) -> str:
    """Unrolled power-iteration twin of q_embedding_pca_power: identical
    decimal power sums, identical per-round rounding grids."""
    dim_cols = ", ".join(
        f"CAST(embedding[{i + 1}] AS DOUBLE) AS x{i}" for i in range(d)
    )
    sum_cols = ["COUNT(*) AS n"] + [
        f"CAST(SUM(CAST(x{i} AS DECIMAL(38,10))) AS DOUBLE) AS s{i}" for i in range(d)
    ] + [
        f"CAST(SUM(CAST(x{i} * x{j} AS DECIMAL(38,10))) AS DOUBLE) AS p{i}_{j}"
        for i in range(d) for j in range(i, d)
    ]
    cells = []
    for i in range(d):
        for j in range(d):
            a, b = min(i, j), max(i, j)
            cells.append(
                f"SELECT {i} AS i, {j} AS j, "
                f"ROUND(p{a}_{b} / n - (s{i} / n) * (s{j} / n), 9) AS c FROM sums"
            )
    stages = []
    for k in range(1, iters + 1):
        prev = f"v{k - 1}"
        stages.append(f"""
u{k} AS MATERIALIZED (
  SELECT i, ROUND(CAST(SUM(CAST(ROUND(c * v, 12) AS DECIMAL(38,12)))
                  AS DOUBLE), 9) AS u
  FROM cov JOIN {prev} ON cov.j = {prev}.j GROUP BY i),
n{k} AS MATERIALIZED (
  SELECT ROUND(sqrt(CAST(SUM(CAST(ROUND(u * u, 12) AS DECIMAL(38,12)))
                    AS DOUBLE)), 9) AS nrm FROM u{k}),
v{k} AS MATERIALIZED (
  SELECT i AS j, ROUND(u / nrm, 9) AS v FROM u{k}, n{k})""")
    v0_rows = ", ".join(f"({j}, CAST(0.25 AS DOUBLE))" for j in range(d))
    return f"""
WITH base AS (SELECT {dim_cols} FROM embeddings),
sums AS MATERIALIZED (SELECT {", ".join(sum_cols)} FROM base),
cov AS MATERIALIZED ({" UNION ALL ".join(cells)}),
v0 AS (SELECT * FROM (VALUES {v0_rows}) t(j, v)),
{",".join(stages)},
sgn AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS sgn
        FROM v{iters} WHERE j = 0)
SELECT v{iters}.j AS dim, ROUND(v * sgn, 6) AS loading,
  ROUND(nrm, 6) AS eigenvalue
FROM v{iters}, sgn, n{iters} ORDER BY dim
"""


_PCA_POWER_SQL = _pca_power_sql()


def q_k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit before a dataset ships: treat (event_type, day) as
    the quasi-identifier and flag cells whose distinct-user count is
    below k=5 — the re-identification surface k-anonymity bounds. Per
    event type: cell counts, risky cells, the minimum cell population,
    and the ppm share of events sitting in risky cells (exact integer
    math). One scan, two partial-aggregating shuffles, both on bounded
    keys (types x days)."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )
    return (
        cells.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_cells"),
            F.sum(F.when(F.col("n_users") < 5, 1).otherwise(0))
            .cast("bigint")
            .alias("n_risky_cells"),
            F.min("n_users").cast("bigint").alias("min_cell_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("n_users") < 5, F.col("n_events")).otherwise(0))
            .cast("bigint")
            .alias("risky_events"),
        )
        .withColumn(
            "risky_ppm",
            F.expr("risky_events * 1000000 div n_events").cast("bigint"),
        )
        .orderBy("event_type")
    )


_K_ANON_SQL = """
WITH cells AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cells,
  CAST(SUM(CASE WHEN n_users < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_cells,
  CAST(MIN(n_users) AS BIGINT) AS min_cell_users,
  CAST(SUM(n_events) AS BIGINT) AS n_events,
  CAST(SUM(CASE WHEN n_users < 5 THEN n_events ELSE 0 END) AS BIGINT)
    AS risky_events,
  CAST(SUM(CASE WHEN n_users < 5 THEN n_events ELSE 0 END) * 1000000
       // SUM(n_events) AS BIGINT) AS risky_ppm
FROM cells GROUP BY event_type ORDER BY event_type
"""


def q_freshness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness SLA audit across heterogeneous time columns: each
    fact table reports its row count and high-water mark; staleness is
    measured in days behind the fleet-wide maximum (a deterministic
    'now'). The shape that matters at scale: per-table aggregates are
    parquet-statistics-answerable scans (min/max/count), unioned into a
    3-row report — no cross-table join of raw rows ever happens."""
    o = _t(spark, sf_dir, "orders").agg(
        F.lit("orders").alias("table_name"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.max(F.to_date("o_orderdate")).alias("high_water"),
    )
    li = _t(spark, sf_dir, "lineitem").agg(
        F.lit("lineitem").alias("table_name"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.max(F.to_date("l_shipdate")).alias("high_water"),
    )
    ev = _t(spark, sf_dir, "events").agg(
        F.lit("events").alias("table_name"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.max(F.to_date("ts")).alias("high_water"),
    )
    rep = o.unionByName(li).unionByName(ev)
    w = Window.partitionBy()
    return (
        rep.withColumn("fleet_max", F.max("high_water").over(w))
        .select(
            "table_name",
            "n_rows",
            "high_water",
            F.datediff("fleet_max", "high_water").cast("bigint").alias(
                "staleness_days"
            ),
        )
        .orderBy("table_name")
    )


_FRESHNESS_SQL = """
WITH rep AS (
  SELECT 'orders' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
    CAST(MAX(o_orderdate) AS DATE) AS high_water FROM orders
  UNION ALL
  SELECT 'lineitem', CAST(COUNT(*) AS BIGINT), CAST(MAX(l_shipdate) AS DATE)
  FROM lineitem
  UNION ALL
  SELECT 'events', CAST(COUNT(*) AS BIGINT), CAST(MAX(ts) AS DATE) FROM events)
SELECT table_name, n_rows, high_water,
  CAST(date_diff('day', high_water, MAX(high_water) OVER ()) AS BIGINT)
    AS staleness_days
FROM rep ORDER BY table_name
"""


def q_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution: every purchase's value is split
    across the user's clicks in the preceding 7 days with half-life
    weights 0.5^(age_days/7), normalized per purchase. Unlike first-touch
    (one window pass), multi-touch needs the (purchase, click) pair list —
    built as a per-user range join (equi-join on user_id + bounded time
    predicate), never a cross join. Daily report: attributed value by
    click day, exact-decimal summed. Weights are rounded to 1e-9 before
    the per-purchase normalizer so shares are identical cross-engine."""
    ev = _t(spark, sf_dir, "events")
    week_us = 7 * 24 * 3600 * 1_000_000
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("p_us"),
        F.col("value").alias("p_value"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.unix_micros("ts").alias("c_us"),
        F.to_date(F.timestamp_micros(F.col("c_us"))).alias("click_day"),
    )
    pairs = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_us") <= F.col("p_us"))
        & (F.col("c_us") > F.col("p_us") - F.lit(week_us)),
    ).withColumn(
        "w",
        F.round(
            F.pow(
                F.lit(0.5),
                (F.col("p_us") - F.col("c_us")).cast("double")
                / F.lit(float(week_us)),
            ),
            9,
        ),
    )
    w_norm = Window.partitionBy("purchase_id")
    shared = pairs.withColumn(
        "share",
        F.col("w")
        / F.sum(F.col("w").cast("decimal(38,12)")).over(w_norm).cast("double"),
    )
    return (
        shared.groupBy("click_day")
        .agg(
            F.count("*").cast("bigint").alias("n_touches"),
            F.countDistinct("purchase_id").cast("bigint").alias("n_purchases"),
            F.round(
                F.sum(
                    F.round(F.col("p_value") * F.col("share"), 9).cast(
                        "decimal(38,10)"
                    )
                ).cast("double"),
                6,
            ).alias("attributed_value"),
        )
        .orderBy("click_day")
    )


_TIME_DECAY_SQL = """
WITH purchases AS (
  SELECT user_id AS p_user, event_id AS purchase_id,
    epoch_us(ts) AS p_us, value AS p_value
  FROM events WHERE event_type = 'purchase'),
clicks AS (
  SELECT user_id AS c_user, epoch_us(ts) AS c_us, CAST(ts AS DATE) AS click_day
  FROM events WHERE event_type = 'click'),
pairs AS (
  SELECT purchase_id, p_value, click_day,
    ROUND(pow(0.5, CAST(p_us - c_us AS DOUBLE) / 604800000000.0), 9) AS w
  FROM purchases JOIN clicks
    ON p_user = c_user AND c_us <= p_us AND c_us > p_us - 604800000000),
shared AS (
  SELECT click_day, purchase_id, p_value,
    w / CAST(SUM(CAST(w AS DECIMAL(38,12))) OVER (PARTITION BY purchase_id)
             AS DOUBLE) AS share
  FROM pairs)
SELECT click_day, CAST(COUNT(*) AS BIGINT) AS n_touches,
  CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS n_purchases,
  ROUND(CAST(SUM(CAST(ROUND(p_value * share, 9) AS DECIMAL(38,10))) AS DOUBLE),
        6) AS attributed_value
FROM shared GROUP BY click_day ORDER BY click_day
"""


def q_dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the nightly-ingest shape: a new batch (odd
    doc_ids) is admitted against a frozen index (even doc_ids) WITHOUT
    ever re-deduping the index against itself. The banded-signature and
    shingle-set stages are the same persisted family stages every other
    dedup query reads (one corpus pass per run); the candidate join is
    band-key equi with parity filters on each side, so its cost is
    O(batch x collisions), independent of index self-pairs. Output: one
    admission row per batch doc with its verified index duplicates."""
    docs = _t(spark, sf_dir, "documents")
    banded = DD.banded_signatures(docs, num_hashes=16, bands=4, cache_key=sf_dir)
    idx = banded.filter(F.col("doc_id") % 2 == 0)
    new = banded.filter(F.col("doc_id") % 2 == 1)
    cand = (
        new.alias("n")
        .join(idx.alias("i"), F.col("n.band") == F.col("i.band"))
        .select(
            F.col("n.doc_id").alias("batch_id"),
            F.col("i.doc_id").alias("index_id"),
        )
        .distinct()
    )
    sets = DD.shingle_sets(docs, cache_key=sf_dir)
    sa = sets.select(F.col("doc_id").alias("batch_id"), F.col("sh_set").alias("sh_a"))
    sb = sets.select(F.col("doc_id").alias("index_id"), F.col("sh_set").alias("sh_b"))
    common = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    verified = (
        cand.join(sa, "batch_id")
        .join(sb, "index_id")
        .withColumn(
            "jaccard",
            F.round(
                common / (F.size("sh_a") + F.size("sh_b") - common), 6
            ),
        )
        .filter(F.col("jaccard") >= 0.8)
    )
    dup_stats = verified.groupBy("batch_id").agg(
        F.count("*").cast("bigint").alias("n_index_dups"),
        F.min("index_id").cast("bigint").alias("first_dup_index_id"),
        F.max("jaccard").alias("max_jaccard"),
    )
    batch_docs = docs.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("batch_id")
    )
    return (
        batch_docs.join(dup_stats, "batch_id", "left")
        .select(
            "batch_id",
            F.coalesce("n_index_dups", F.lit(0)).cast("bigint").alias("n_index_dups"),
            F.col("first_dup_index_id"),
            F.coalesce("max_jaccard", F.lit(0.0)).alias("max_jaccard"),
            (F.coalesce("n_index_dups", F.lit(0)) == 0).alias("admitted"),
        )
        .orderBy("batch_id")
    )


_INCR_DEDUP_SQL = f"""
WITH s AS (SELECT doc_id, unnest({_SHINGLES_SQL}) AS shg FROM documents),
h AS (SELECT doc_id, ('0x' || substr(md5(shg), 1, 15))::BIGINT % {_P} AS x FROM s),
sig AS (SELECT doc_id, {_SIG_MINS_SQL} FROM h GROUP BY doc_id),
banded AS (
  SELECT doc_id, unnest([{_BAND_LIST_SQL}]) AS band
  FROM sig),
cand AS (
  SELECT DISTINCT n.doc_id AS batch_id, i.doc_id AS index_id
  FROM banded n JOIN banded i ON n.band = i.band
  WHERE n.doc_id % 2 = 1 AND i.doc_id % 2 = 0),
sets AS (SELECT doc_id, {_SHINGLES_SQL} AS sh_set FROM documents),
verified AS (
  SELECT c.batch_id, c.index_id,
    round(len(list_intersect(sa.sh_set, sb.sh_set))
      / (len(sa.sh_set) + len(sb.sh_set)
         - len(list_intersect(sa.sh_set, sb.sh_set))), 6) AS jaccard
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.batch_id
  JOIN sets sb ON sb.doc_id = c.index_id),
agg AS (
  SELECT batch_id, COUNT(*) AS n_index_dups,
    MIN(index_id) AS first_dup_index_id, MAX(jaccard) AS max_jaccard
  FROM verified WHERE jaccard >= 0.8 GROUP BY batch_id)
SELECT d.doc_id AS batch_id,
  CAST(COALESCE(a.n_index_dups, 0) AS BIGINT) AS n_index_dups,
  CAST(a.first_dup_index_id AS BIGINT) AS first_dup_index_id,
  COALESCE(a.max_jaccard, 0.0) AS max_jaccard,
  COALESCE(a.n_index_dups, 0) = 0 AS admitted
FROM documents d LEFT JOIN agg a ON d.doc_id = a.batch_id
WHERE d.doc_id % 2 = 1 ORDER BY batch_id
"""


def q_label_knn_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mislabeled-sample screening: each vector's nearest in-bucket
    neighbor (hyperplane LSH, 6 seed-fixed planes) votes on its label;
    per label the report counts vectors, evaluable vectors (bucket
    neighbors exist), nearest-neighbor agreements, and the agreement ppm.
    The kNN graph is bucket-local by construction — cosine never runs
    across buckets, so cost scales with occupancy (sized by n_planes),
    not corpus². Ranking uses 6dp-rounded cosines with an id tie-break,
    identical in the baked-plane DuckDB twin."""
    emb = _t(spark, sf_dir, "embeddings")
    dim = len(emb.first()["embedding"])
    pairs = SIM.hyperplane_near_dup_pairs(emb, dim, threshold=-1.0, n_planes=6)
    directed = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "cosine"
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("src"), F.col("id_a").alias("dst"), "cosine"
        )
    ).withColumn("cos_r", F.round("cosine", 6))
    w_nn = Window.partitionBy("src").orderBy(F.col("cos_r").desc(), F.col("dst"))
    nn = directed.withColumn("rn", F.row_number().over(w_nn)).filter("rn = 1")
    lab = emb.select("vec_id", "label")
    nn_lab = nn.join(
        lab.select(F.col("vec_id").alias("dst"), F.col("label").alias("nn_label")),
        "dst",
    ).select(F.col("src").alias("vec_id"), "nn_label")
    per_vec = lab.join(nn_lab, "vec_id", "left")
    return (
        per_vec.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.sum(F.when(F.col("nn_label").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_evaluated"),
            F.sum(F.when(F.col("nn_label") == F.col("label"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_agree"),
        )
        .withColumn(
            "agree_ppm",
            F.expr(
                "CASE WHEN n_evaluated > 0"
                " THEN n_agree * 1000000 div n_evaluated ELSE NULL END"
            ).cast("bigint"),
        )
        .orderBy("label")
    )


_KNN_AGREE_SQL = f"""
WITH {_planes_cte(6)},
{_LSH_SIGS_SQL.lstrip()},
e2 AS (
  SELECT s.vec_id, s.bucket, e.embedding, e.label
  FROM sigs s JOIN embeddings e USING (vec_id)),
p AS (
  SELECT a.vec_id AS src, b.vec_id AS dst, b.label AS nn_label,
    round(list_sum(list_transform(generate_series(1, len(a.embedding)),
             i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
     * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))),
      6) AS cos_r
  FROM e2 a JOIN e2 b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
nn AS (
  SELECT src, nn_label FROM (
    SELECT src, nn_label,
      ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos_r DESC, dst) AS rn
    FROM p) WHERE rn = 1)
SELECT e.label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
  CAST(SUM(CASE WHEN nn.nn_label IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_evaluated,
  CAST(SUM(CASE WHEN nn.nn_label = e.label THEN 1 ELSE 0 END) AS BIGINT)
    AS n_agree,
  CAST(CASE WHEN SUM(CASE WHEN nn.nn_label IS NOT NULL THEN 1 ELSE 0 END) > 0
       THEN SUM(CASE WHEN nn.nn_label = e.label THEN 1 ELSE 0 END) * 1000000
            // SUM(CASE WHEN nn.nn_label IS NOT NULL THEN 1 ELSE 0 END)
       ELSE NULL END AS BIGINT) AS agree_ppm
FROM embeddings e LEFT JOIN nn ON e.vec_id = nn.src
GROUP BY e.label ORDER BY e.label
"""


def q_window_funnel_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-parity windowFunnel: per user, the deepest
    view -> click -> purchase chain whose THREE events all fit inside a
    24h window anchored at the view (the reference engine's signature
    funnel aggregate, absent from Spark). Single-scan plan: instead of
    per-level self-joins (which re-read the fact once per level), the
    chain state propagates through TWO event-time RANGE windows over the
    user partition — each click carries its latest qualifying view
    (v_best), each purchase checks the max v_best among its prior-24h
    clicks against its own anchor bound. Exact: a valid chain exists iff
    max(v_best) >= t3 - 24h (proof in the window bounds: t1 ∈
    [t2-24h, t2), t2 ∈ (t3-24h, t3), t3 <= t1+24h). Output: user count
    per achieved level (0-3), levels summing to the full user base."""
    day_us = 24 * 3600 * 1_000_000
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w24 = Window.partitionBy("user_id").orderBy("us").rangeBetween(-day_us, -1)
    chain = (
        ev.withColumn(
            "v_best",
            F.max(
                F.when(F.col("event_type") == "view", F.col("us"))
            ).over(w24),
        )
        .withColumn(
            "click_anchor",
            F.when(
                (F.col("event_type") == "click") & F.col("v_best").isNotNull(),
                F.col("v_best"),
            ),
        )
        .withColumn("best_click_anchor", F.max("click_anchor").over(w24))
    )
    per_user = chain.groupBy("user_id").agg(
        F.greatest(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("best_click_anchor") >= F.col("us") - day_us),
                    3,
                ).otherwise(0)
            ),
            F.max(F.when(F.col("click_anchor").isNotNull(), 2).otherwise(0)),
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)),
        ).alias("level")
    )
    return (
        per_user.groupBy("level")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy("level")
    )


_WINDOW_FUNNEL_SQL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
v AS (SELECT user_id AS u, us AS t1 FROM ev WHERE event_type = 'view'),
c AS (SELECT user_id AS u, us AS t2 FROM ev WHERE event_type = 'click'),
p AS (SELECT user_id AS u, us AS t3 FROM ev WHERE event_type = 'purchase'),
l2 AS (
  SELECT v.u, t1, t2 FROM v JOIN c ON v.u = c.u
  WHERE t2 > t1 AND t2 <= t1 + 86400000000),
l3 AS (
  SELECT l2.u FROM l2 JOIN p ON l2.u = p.u
  WHERE t3 > t2 AND t3 <= t1 + 86400000000),
per_user AS (
  SELECT users.user_id,
    GREATEST(
      CASE WHEN users.user_id IN (SELECT u FROM l3) THEN 3 ELSE 0 END,
      CASE WHEN users.user_id IN (SELECT u FROM l2) THEN 2 ELSE 0 END,
      CASE WHEN users.user_id IN (SELECT u FROM v) THEN 1 ELSE 0 END) AS level
  FROM (SELECT DISTINCT user_id FROM ev) users)
SELECT level, CAST(COUNT(*) AS BIGINT) AS n_users
FROM per_user GROUP BY level ORDER BY level
"""


def q_retention_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-parity retention(): per user a vector of gate flags —
    active in week 1 (the anchor), AND-ed with weeks 2/3/4 — aggregated
    to the classic retention curve (denominator = anchor cohort, the CH
    semantics where later flags only count if the first fired). One scan
    folds to per-(user, week) activity; flags are a conditional-MAX
    pivot per user; the curve is one tiny aggregate. Weeks are fixed
    7-day buckets from the global min day (deterministic anchor)."""
    ev = _t(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("d"))
    t0 = ev.agg(F.min("d").alias("d0"))
    wk = ev.crossJoin(F.broadcast(t0)).select(
        "user_id", (F.datediff("d", "d0") / 7).cast("int").alias("week")
    )
    flags = wk.groupBy("user_id").agg(
        *[
            F.max(F.when(F.col("week") == w, 1).otherwise(0)).alias(f"w{w}")
            for w in range(4)
        ]
    )
    return flags.agg(
        F.sum("w0").cast("bigint").alias("cohort"),
        F.sum(F.col("w0") * F.col("w1")).cast("bigint").alias("kept_w1"),
        F.sum(F.col("w0") * F.col("w2")).cast("bigint").alias("kept_w2"),
        F.sum(F.col("w0") * F.col("w3")).cast("bigint").alias("kept_w3"),
    ).select(
        "cohort",
        "kept_w1",
        "kept_w2",
        "kept_w3",
        F.expr("kept_w1 * 1000000 div cohort").cast("bigint").alias("w1_ppm"),
        F.expr("kept_w2 * 1000000 div cohort").cast("bigint").alias("w2_ppm"),
        F.expr("kept_w3 * 1000000 div cohort").cast("bigint").alias("w3_ppm"),
    )


_RETENTION_FLAGS_SQL = """
WITH d AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
t0 AS (SELECT MIN(d) AS d0 FROM d),
wk AS (
  SELECT user_id, CAST(date_diff('day', d0, d) / 7 AS INTEGER) AS week
  FROM d, t0),
flags AS (
  SELECT user_id,
    MAX(CASE WHEN week = 0 THEN 1 ELSE 0 END) AS w0,
    MAX(CASE WHEN week = 1 THEN 1 ELSE 0 END) AS w1,
    MAX(CASE WHEN week = 2 THEN 1 ELSE 0 END) AS w2,
    MAX(CASE WHEN week = 3 THEN 1 ELSE 0 END) AS w3
  FROM wk GROUP BY user_id)
SELECT CAST(SUM(w0) AS BIGINT) AS cohort,
  CAST(SUM(w0 * w1) AS BIGINT) AS kept_w1,
  CAST(SUM(w0 * w2) AS BIGINT) AS kept_w2,
  CAST(SUM(w0 * w3) AS BIGINT) AS kept_w3,
  CAST(SUM(w0 * w1) * 1000000 // SUM(w0) AS BIGINT) AS w1_ppm,
  CAST(SUM(w0 * w2) * 1000000 // SUM(w0) AS BIGINT) AS w2_ppm,
  CAST(SUM(w0 * w3) * 1000000 // SUM(w0) AS BIGINT) AS w3_ppm
FROM flags
"""


def q_adaptive_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-parity histogram(N): equal-FREQUENCY bins over order
    totals (8 bins) — adaptive boundaries that track the data where
    equal-width bins waste resolution on empty tails. Bin edges come
    from ntile over the cents-exact total (total-order tie-break on the
    key), then per-bin min/max/count/exact-decimal sum. The ntile is
    the DISTRIBUTED one (operators/ranking.global_ntile: range-
    partitioned sort + broadcast partition offsets + SQL-exact tile
    arithmetic — no single-partition window); two shuffles total, the
    ranged sort and the bin rollup."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    binned = RK.global_ntile(
        o.select(cents.alias("cents"), F.col("o_orderkey")),
        ["cents", "o_orderkey"], 8, col_name="bin",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("cents").cast("bigint").alias("lo_cents"),
            F.max("cents").cast("bigint").alias("hi_cents"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        .orderBy("bin")
    )


_ADAPTIVE_HIST_SQL = """
WITH b AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
    NTILE(8) OVER (ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT),
                   o_orderkey) AS bin
  FROM orders)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(MIN(cents) AS BIGINT) AS lo_cents,
  CAST(MAX(cents) AS BIGINT) AS hi_cents,
  CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM b GROUP BY bin ORDER BY bin
"""


def q_dedup_canonical_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical selection per near-dup cluster: keep the LONGEST member
    (ties -> min id) instead of the min-id rule — the policy that ships
    the most complete copy of each duplicated document. Components ride
    the family's persisted LSH stages; the canonical election is one
    window over the (id, component, n_chars) frame — metadata-sized, the
    text never travels. Per-cluster report includes the chars the policy
    saves (total minus canonical)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = DD.lsh_verified_pairs(docs, threshold=0.8, cache_key=sf_dir)
    cc = DD.connected_components(pairs)
    m = cc.join(
        docs.select(F.col("doc_id").alias("id"), "n_chars"), "id"
    )
    w_comp = Window.partitionBy("component")
    w_rank = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("id")
    )
    return (
        m.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("n_members", F.count("*").over(w_comp))
        .withColumn("total_chars", F.sum("n_chars").over(w_comp))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("n_members").cast("bigint").alias("n_members"),
            F.col("id").alias("canonical_id"),
            F.col("n_chars").cast("bigint").alias("canonical_chars"),
            (F.col("total_chars") - F.col("n_chars"))
            .cast("bigint")
            .alias("chars_saved"),
        )
        .orderBy("component")
    )


_CANONICAL_SQL = f"""
WITH cc AS ({_CC_SQL}),
m AS (
  SELECT cc.component, cc.id, d.n_chars
  FROM cc JOIN documents d ON cc.id = d.doc_id),
sel AS (
  SELECT component, id, n_chars,
    ROW_NUMBER() OVER (PARTITION BY component
                       ORDER BY n_chars DESC, id) AS rn,
    COUNT(*) OVER (PARTITION BY component) AS n_members,
    SUM(n_chars) OVER (PARTITION BY component) AS total_chars
  FROM m)
SELECT component, CAST(n_members AS BIGINT) AS n_members,
  id AS canonical_id, CAST(n_chars AS BIGINT) AS canonical_chars,
  CAST(total_chars - n_chars AS BIGINT) AS chars_saved
FROM sel WHERE rn = 1 ORDER BY component
"""


def q_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for intermittent demand — the forecasting-family
    member for sparse series, where Holt/Prophet smear zeros into bias.
    Demand = daily count of a deterministic 1%-ish order slice
    (o_orderkey % 101 = 0) on the gap-filled axis; smoothed demand size z
    and inter-demand interval p (alpha = 0.2) update ONLY on demand
    days; forecast = z / p. Inherently sequential -> applyInPandas (one
    task per series, O(1) state, the forecaster's partitioning); the
    oracle replays the identical IEEE recurrence in a recursive CTE, so
    no rounding is needed anywhere."""
    import pandas as pd

    o = _t(spark, sf_dir, "orders")
    span = o.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    axis = span.select(
        F.explode(F.sequence("d0", "d1")).alias("date")
    )
    demand = (
        o.filter(F.col("o_orderkey") % 101 == 0)
        .groupBy(F.to_date("o_orderdate").alias("date"))
        .agg(F.count("*").alias("y"))
    )
    daily = (
        axis.join(demand, "date", "left")
        .select("date", F.coalesce("y", F.lit(0)).cast("double").alias("y"))
    )
    alpha = 0.2

    def _croston(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("date").reset_index(drop=True)
        out = {"date": [], "y": [], "z": [], "p": [], "forecast": []}
        z = p = None
        q = 0
        for i in range(len(pdf)):
            y = pdf["y"][i]
            q += 1
            if y > 0:
                if z is None:
                    z, p = y, float(q)
                else:
                    z = z + alpha * (y - z)
                    p = p + alpha * (q - p)
                q = 0
            if z is not None:
                out["date"].append(pdf["date"][i])
                out["y"].append(y)
                out["z"].append(z)
                out["p"].append(p)
                out["forecast"].append(z / p)
        return pd.DataFrame(out)

    return (
        daily.groupBy(F.lit(1).alias("_g"))
        .applyInPandas(
            lambda _, pdf: _croston(pdf),
            "date date, y double, z double, p double, forecast double",
        )
        .orderBy("date")
    )


_CROSTON_SQL = """
WITH RECURSIVE axis AS (
  SELECT UNNEST(generate_series(MIN(CAST(o_orderdate AS DATE)),
                                MAX(CAST(o_orderdate AS DATE)),
                                INTERVAL 1 DAY))::DATE AS date
  FROM orders),
demand AS (
  SELECT CAST(o_orderdate AS DATE) AS date, COUNT(*) AS y
  FROM orders WHERE o_orderkey % 101 = 0 GROUP BY 1),
daily AS (
  SELECT a.date, CAST(COALESCE(d.y, 0) AS DOUBLE) AS y,
    ROW_NUMBER() OVER (ORDER BY a.date) AS rn
  FROM axis a LEFT JOIN demand d ON a.date = d.date),
first_demand AS (SELECT MIN(rn) AS rn0 FROM daily WHERE y > 0),
cr(date, y, rn, z, p, q) AS (
  SELECT d.date, d.y, d.rn, d.y, CAST(d.rn AS DOUBLE), 0
  FROM daily d, first_demand f WHERE d.rn = f.rn0
  UNION ALL
  SELECT n.date, n.y, n.rn,
    CASE WHEN n.y > 0 THEN c.z + 0.2 * (n.y - c.z) ELSE c.z END,
    CASE WHEN n.y > 0 THEN c.p + 0.2 * ((c.q + 1) - c.p) ELSE c.p END,
    CASE WHEN n.y > 0 THEN 0 ELSE c.q + 1 END
  FROM cr c JOIN daily n ON n.rn = c.rn + 1)
SELECT date, y, z, p, z / p AS forecast FROM cr ORDER BY date
"""


def q_naive_baseline_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (lag-7) baseline scorecard for the two daily series
    the forecaster ships — MAE / RMSE / sMAPE per metric, the floor any
    real model must beat (and the MASE denominator). Errors run in exact
    integers (cents / counts) summed as DECIMAL, divided once in double;
    sMAPE terms are 1e-12-rounded doubles summed as DECIMAL. One
    aggregation over the lag-joined daily frame; the lag is a window on
    the tiny daily series, not the fact table."""
    daily = _orders_daily(spark, sf_dir).select(
        "date",
        F.col("order_count").cast("bigint").alias("cnt"),
        F.round(F.col("total_revenue") * 100).cast("bigint").alias("rev_cents"),
    )
    w = Window.orderBy("date")
    lagged = (
        daily.select(
            "date",
            "cnt",
            "rev_cents",
            F.lag("cnt", 7).over(w).alias("cnt_hat"),
            F.lag("rev_cents", 7).over(w).alias("rev_hat"),
        )
        .filter(F.col("cnt_hat").isNotNull())
        # daily-series-sized; both metric branches read it, so one
        # checkpoint saves a second scan of the orders fact
        .localCheckpoint(eager=True)
    )

    def metric(y, yhat, name, scale):
        err = F.abs(y - yhat)
        smape_term = F.round(
            F.lit(2.0)
            * err.cast("double")
            / (F.abs(y) + F.abs(yhat)).cast("double"),
            12,
        )
        return lagged.agg(
            F.lit(name).alias("metric"),
            F.count("*").cast("bigint").alias("n_days"),
            F.round(
                F.sum(err.cast("decimal(38,0)")).cast("double")
                / F.count("*")
                / scale,
                6,
            ).alias("mae"),
            F.round(
                F.sqrt(
                    F.sum((err * err).cast("decimal(38,0)")).cast("double")
                    / F.count("*")
                )
                / scale,
                6,
            ).alias("rmse"),
            F.round(
                F.sum(smape_term.cast("decimal(38,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("smape"),
        )

    return metric(F.col("cnt"), F.col("cnt_hat"), "order_count", 1.0).unionByName(
        metric(F.col("rev_cents"), F.col("rev_hat"), "total_revenue", 100.0)
    ).orderBy("metric")


_NAIVE_SCORE_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS date, COUNT(*) AS cnt,
    CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE)
          * 100) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1),
lagged AS (
  SELECT date, cnt, rev_cents,
    LAG(cnt, 7) OVER (ORDER BY date) AS cnt_hat,
    LAG(rev_cents, 7) OVER (ORDER BY date) AS rev_hat
  FROM daily),
f AS (SELECT * FROM lagged WHERE cnt_hat IS NOT NULL)
SELECT 'order_count' AS metric, CAST(COUNT(*) AS BIGINT) AS n_days,
  ROUND(CAST(SUM(CAST(ABS(cnt - cnt_hat) AS DECIMAL(38,0))) AS DOUBLE)
        / COUNT(*) / 1.0, 6) AS mae,
  ROUND(sqrt(CAST(SUM(CAST(ABS(cnt - cnt_hat) * ABS(cnt - cnt_hat)
                       AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*)) / 1.0, 6)
    AS rmse,
  ROUND(CAST(SUM(CAST(ROUND(2.0 * CAST(ABS(cnt - cnt_hat) AS DOUBLE)
        / CAST(ABS(cnt) + ABS(cnt_hat) AS DOUBLE), 12) AS DECIMAL(38,12)))
        AS DOUBLE) / COUNT(*), 6) AS smape
FROM f
UNION ALL
SELECT 'total_revenue', CAST(COUNT(*) AS BIGINT),
  ROUND(CAST(SUM(CAST(ABS(rev_cents - rev_hat) AS DECIMAL(38,0))) AS DOUBLE)
        / COUNT(*) / 100.0, 6),
  ROUND(sqrt(CAST(SUM(CAST(ABS(rev_cents - rev_hat) * ABS(rev_cents - rev_hat)
                       AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*)) / 100.0, 6),
  ROUND(CAST(SUM(CAST(ROUND(2.0 * CAST(ABS(rev_cents - rev_hat) AS DOUBLE)
        / CAST(ABS(rev_cents) + ABS(rev_hat) AS DOUBLE), 12) AS DECIMAL(38,12)))
        AS DOUBLE) / COUNT(*), 6)
FROM f
ORDER BY metric
"""

# Multivariate OLS via normal equations, solved in closed form (Cramer's
# rule on the 3x3 Gram matrix). The algebra below is ONE shared formula
# text evaluated by F.expr on the Spark side and spliced verbatim into the
# DuckDB twin — identical expression trees guarantee identical IEEE
# doubles, so no tolerance is needed. Note a33 = sw because the weekend
# dummy is idempotent (w² = w).
_OLS_DET = "(n*(stt*sw - stw*stw) - st*(st*sw - stw*sw) + sw*(st*stw - stt*sw))"
_OLS_DA = "(sy*(stt*sw - stw*stw) - st*(sty*sw - stw*swy) + sw*(sty*stw - stt*swy))"
_OLS_DB = "(n*(sty*sw - stw*swy) - sy*(st*sw - stw*sw) + sw*(st*swy - sty*sw))"
_OLS_DC = "(n*(stt*swy - sty*stw) - st*(st*swy - sty*sw) + sy*(st*stw - stt*sw))"
_OLS_OUT = (
    f"ROUND({_OLS_DA} / {_OLS_DET}, 6) AS intercept, "
    f"ROUND({_OLS_DB} / {_OLS_DET}, 6) AS slope_per_day, "
    f"ROUND({_OLS_DC} / {_OLS_DET}, 6) AS weekend_effect, "
    f"ROUND(1.0 - (syy - ({_OLS_DA} / {_OLS_DET} * sy"
    f" + {_OLS_DB} / {_OLS_DET} * sty"
    f" + {_OLS_DC} / {_OLS_DET} * swy))"
    f" / (syy - sy * sy / n), 6) AS r2"
)


def _split_select_list(s: str) -> list[str]:
    """Split a SELECT list on top-level commas (parens-aware)."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def q_multivar_ols_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression in one aggregation pass: daily revenue ~
    intercept + trend·t + weekend dummy, solved in closed form from exact
    power sums (the normal-equations / Cramer path — no iterative
    optimizer, no MLlib RNG). The only corpus-sized work is the daily
    rollup; the Gram matrix is 9 decimal-exact sums over the tiny series
    and the solve is scalar algebra shared verbatim with the oracle.
    This is the scale shape for ANY fixed-feature linear model: map-side
    partial sums, one row out."""
    daily = _orders_daily(spark, sf_dir).select(
        "date", F.col("total_revenue").alias("y")
    )
    w0 = Window.partitionBy()
    base = daily.withColumn("d0", F.min("date").over(w0)).select(
        F.datediff("date", "d0").cast("double").alias("t"),
        F.dayofweek("date").isin(1, 7).cast("int").cast("double").alias("w"),
        "y",
    )
    t, w, y = F.col("t"), F.col("w"), F.col("y")
    sums = base.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(t.cast("decimal(38,6)")).cast("double").alias("st"),
        F.sum(w.cast("decimal(38,6)")).cast("double").alias("sw"),
        F.sum((t * t).cast("decimal(38,6)")).cast("double").alias("stt"),
        F.sum((t * w).cast("decimal(38,6)")).cast("double").alias("stw"),
        F.sum(F.round(y, 6).cast("decimal(38,6)")).cast("double").alias("sy"),
        F.sum(F.round(t * y, 6).cast("decimal(38,6)")).cast("double").alias("sty"),
        F.sum(F.round(w * y, 6).cast("decimal(38,6)")).cast("double").alias("swy"),
        F.sum(F.round(y * y, 4).cast("decimal(38,4)")).cast("double").alias("syy"),
    )
    return sums.selectExpr(*[e.strip() for e in _split_select_list(_OLS_OUT)])


_MULTIVAR_OLS_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS date,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS y
  FROM orders GROUP BY 1),
base AS (
  SELECT CAST(date_diff('day', MIN(date) OVER (), date) AS DOUBLE) AS t,
    CAST(CASE WHEN dayofweek(date) IN (0, 6) THEN 1 ELSE 0 END AS DOUBLE) AS w,
    y
  FROM daily),
sums AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM(CAST(t AS DECIMAL(38,6))) AS DOUBLE) AS st,
    CAST(SUM(CAST(w AS DECIMAL(38,6))) AS DOUBLE) AS sw,
    CAST(SUM(CAST(t * t AS DECIMAL(38,6))) AS DOUBLE) AS stt,
    CAST(SUM(CAST(t * w AS DECIMAL(38,6))) AS DOUBLE) AS stw,
    CAST(SUM(CAST(ROUND(y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(ROUND(t * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sty,
    CAST(SUM(CAST(ROUND(w * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS swy,
    CAST(SUM(CAST(ROUND(y * y, 4) AS DECIMAL(38,4))) AS DOUBLE) AS syy
  FROM base)
SELECT {_OLS_OUT} FROM sums
"""


def q_weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass weighted sampling without replacement (Efraimidis-
    Spirakis): each doc draws key = u^(1/w) from a deterministic
    md5-derived uniform u and weight w = n_chars; the global top-k by key
    IS a weighted sample — the standard distributed primitive (inclusion
    probability proportional to weight, no second pass, no rejection
    loop). Top-k is a TakeOrdered over row-local keys: at 100 TB each
    partition ships k candidates, never the corpus. Keys are rounded to
    1e-12 with an id tie-break for cross-engine total order."""
    docs = _t(spark, sf_dir, "documents")
    u = (
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("es|"), F.col("doc_id").cast("string"))), 1, 15),
                16,
                10,
            ).cast("bigint")
            % 1000000
        ).cast("double")
        + 0.5
    ) / 1000000.0
    key = F.round(
        F.pow(u, F.lit(1.0) / F.col("n_chars").cast("double")), 12
    )
    keyed = docs.select("doc_id", "source", "n_chars", key.alias("key"))
    order = [F.col("key").desc(), F.col("doc_id")]
    top = RK.top_k(keyed, order, 20)
    return top.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    ).select("doc_id", "source", "n_chars", "key", "rank")


_ES_SAMPLE_SQL = """
WITH keyed AS (
  SELECT doc_id, source, n_chars,
    ROUND(pow(
      (CAST(('0x' || substr(md5('es|' || CAST(doc_id AS VARCHAR)), 1, 15))
            AS BIGINT) % 1000000 + 0.5) / 1000000.0,
      1.0 / CAST(n_chars AS DOUBLE)), 12) AS key
  FROM documents)
SELECT doc_id, source, n_chars, key, rank FROM (
  SELECT doc_id, source, n_chars, key,
    ROW_NUMBER() OVER (ORDER BY key DESC, doc_id) AS rank
  FROM keyed)
WHERE rank <= 20
"""


# --------------------------------------------------------------------------
# ClickHouse function parity — round-3 wave (theilsU / studentTTest /
# sequenceNextNode / uniqUpTo / deltaSum / sparkbar / geohashEncode)
# --------------------------------------------------------------------------


def q_theils_u_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``theilsU`` + ``contingency`` parity: the uncertainty
    coefficient U(priority|status) / U(status|priority) and Pearson's
    contingency coefficient over orders. One shuffle to the bounded
    (priority x status) cell table (<= 15 cells at any SF); entropies and
    chi-square accumulate 1e-12-rounded terms as decimals, so every sum is
    partition-order-free and bit-identical across engines."""
    o = _t(spark, sf_dir, "orders")
    cells = (
        o.groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    d12 = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    wx = Window.partitionBy("o_orderpriority")
    wy = Window.partitionBy("o_orderstatus")
    wall = Window.partitionBy()
    e = cells.select(
        "c",
        F.sum("c").over(wx).alias("cx"),
        F.sum("c").over(wy).alias("cy"),
        F.sum("c").over(wall).alias("n"),
    )
    p = F.col("c").cast("double") / F.col("n").cast("double")
    px = F.col("cx").cast("double") / F.col("n").cast("double")
    py = F.col("cy").cast("double") / F.col("n").cast("double")
    ex = F.col("cx").cast("double") * F.col("cy").cast("double") / F.col("n").cast("double")
    terms = e.select(
        "n",
        d12(F.round(p * F.log(p), 12)).alias("t_xy"),
        # marginal-entropy terms counted once per cell, weighted by the
        # cell's share of its marginal -> sums to the marginal entropy
        d12(F.round(p * F.log(px), 12)).alias("t_x"),
        d12(F.round(p * F.log(py), 12)).alias("t_y"),
        d12(
            F.round(
                (F.col("c").cast("double") - ex) * (F.col("c").cast("double") - ex) / ex,
                12,
            )
        ).alias("t_chi"),
    )
    agg = terms.groupBy("n").agg(
        (-F.sum("t_xy")).cast("double").alias("h_xy"),
        (-F.sum("t_x")).cast("double").alias("h_x"),
        (-F.sum("t_y")).cast("double").alias("h_y"),
        F.sum("t_chi").cast("double").alias("chi2"),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.round("h_x", 6).alias("h_priority"),
        F.round("h_y", 6).alias("h_status"),
        F.round("h_xy", 6).alias("h_joint"),
        F.round((F.col("h_x") - (F.col("h_xy") - F.col("h_y"))) / F.col("h_x"), 6)
        .alias("u_priority_given_status"),
        F.round((F.col("h_y") - (F.col("h_xy") - F.col("h_x"))) / F.col("h_y"), 6)
        .alias("u_status_given_priority"),
        F.round("chi2", 6).alias("chi2"),
        F.round(F.sqrt(F.col("chi2") / (F.col("chi2") + nd)), 6)
        .alias("contingency_c"),
    )


_THEILS_U_SQL = """
WITH cells AS (
  SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2),
e AS (
  SELECT c,
    SUM(c) OVER (PARTITION BY o_orderpriority) AS cx,
    SUM(c) OVER (PARTITION BY o_orderstatus) AS cy,
    SUM(c) OVER () AS n
  FROM cells),
terms AS (
  SELECT n,
    CAST(ROUND((c::DOUBLE / n) * ln(c::DOUBLE / n), 12) AS DECIMAL(38,12)) AS t_xy,
    CAST(ROUND((c::DOUBLE / n) * ln(cx::DOUBLE / n), 12) AS DECIMAL(38,12)) AS t_x,
    CAST(ROUND((c::DOUBLE / n) * ln(cy::DOUBLE / n), 12) AS DECIMAL(38,12)) AS t_y,
    CAST(ROUND(
      (c::DOUBLE - cx::DOUBLE * cy::DOUBLE / n)
      * (c::DOUBLE - cx::DOUBLE * cy::DOUBLE / n)
      / (cx::DOUBLE * cy::DOUBLE / n), 12) AS DECIMAL(38,12)) AS t_chi
  FROM e),
agg AS (
  SELECT n,
    CAST(-SUM(t_xy) AS DOUBLE) AS h_xy,
    CAST(-SUM(t_x) AS DOUBLE) AS h_x,
    CAST(-SUM(t_y) AS DOUBLE) AS h_y,
    CAST(SUM(t_chi) AS DOUBLE) AS chi2
  FROM terms GROUP BY n)
SELECT CAST(n AS BIGINT) AS n_orders,
  ROUND(h_x, 6) AS h_priority,
  ROUND(h_y, 6) AS h_status,
  ROUND(h_xy, 6) AS h_joint,
  ROUND((h_x - (h_xy - h_y)) / h_x, 6) AS u_priority_given_status,
  ROUND((h_y - (h_xy - h_x)) / h_y, 6) AS u_status_given_priority,
  ROUND(chi2, 6) AS chi2,
  ROUND(sqrt(chi2 / (chi2 + n::DOUBLE)), 6) AS contingency_c
FROM agg
"""


def q_student_ttest_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``studentTTest`` parity (the equal-variance companion to
    the existing ``welch_ttest_segments``): pooled-variance two-sample t on
    customer account balance, BUILDING vs MACHINERY. Sums and sums of
    squares accumulate as exact decimals of 1e-2/1e-4-rounded terms (order
    free); the t statistic and pooled variance divide in double at the
    end. Single aggregation pass, two groups."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    v = F.round(F.col("c_acctbal"), 2)
    g = c.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(v.cast("decimal(38,2)")).alias("s"),
        F.sum(F.round(v * v, 4).cast("decimal(38,4)")).alias("ss"),
    )
    wide = (
        g.groupBy()
        .pivot("c_mktsegment", ["BUILDING", "MACHINERY"])
        .agg(F.first("n").alias("n"), F.first("s").alias("s"), F.first("ss").alias("ss"))
    )
    n1, n2 = F.col("BUILDING_n").cast("double"), F.col("MACHINERY_n").cast("double")
    s1, s2 = F.col("BUILDING_s").cast("double"), F.col("MACHINERY_s").cast("double")
    ss1, ss2 = F.col("BUILDING_ss").cast("double"), F.col("MACHINERY_ss").cast("double")
    m1, m2 = s1 / n1, s2 / n2
    pooled = ((ss1 - n1 * m1 * m1) + (ss2 - n2 * m2 * m2)) / (n1 + n2 - 2)
    t = (m1 - m2) / F.sqrt(pooled * (1 / n1 + 1 / n2))
    return wide.select(
        F.col("BUILDING_n").alias("n_building"),
        F.col("MACHINERY_n").alias("n_machinery"),
        F.round(m1, 6).alias("mean_building"),
        F.round(m2, 6).alias("mean_machinery"),
        F.round(pooled, 6).alias("pooled_var"),
        F.round(t, 6).alias("t_stat"),
        (n1 + n2 - 2).cast("bigint").alias("df"),
        (F.abs(t) > 1.96).cast("int").alias("significant_5pct"),
    )


_STUDENT_T_SQL = """
WITH g AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
    SUM(CAST(ROUND(c_acctbal, 2) AS DECIMAL(38,2))) AS s,
    SUM(CAST(ROUND(ROUND(c_acctbal, 2) * ROUND(c_acctbal, 2), 4)
             AS DECIMAL(38,4))) AS ss
  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY 1),
wide AS (
  SELECT
    MAX(CASE WHEN c_mktsegment = 'BUILDING' THEN n END) AS n1b,
    MAX(CASE WHEN c_mktsegment = 'MACHINERY' THEN n END) AS n2b,
    CAST(MAX(CASE WHEN c_mktsegment = 'BUILDING' THEN s END) AS DOUBLE) AS s1,
    CAST(MAX(CASE WHEN c_mktsegment = 'MACHINERY' THEN s END) AS DOUBLE) AS s2,
    CAST(MAX(CASE WHEN c_mktsegment = 'BUILDING' THEN ss END) AS DOUBLE) AS ss1,
    CAST(MAX(CASE WHEN c_mktsegment = 'MACHINERY' THEN ss END) AS DOUBLE) AS ss2
  FROM g)
SELECT n1b AS n_building, n2b AS n_machinery,
  ROUND(s1 / n1b, 6) AS mean_building,
  ROUND(s2 / n2b, 6) AS mean_machinery,
  ROUND(((ss1 - n1b * (s1/n1b) * (s1/n1b)) + (ss2 - n2b * (s2/n2b) * (s2/n2b)))
        / (n1b + n2b - 2), 6) AS pooled_var,
  ROUND((s1/n1b - s2/n2b) / sqrt(
    (((ss1 - n1b * (s1/n1b) * (s1/n1b)) + (ss2 - n2b * (s2/n2b) * (s2/n2b)))
     / (n1b + n2b - 2)) * (1.0/n1b + 1.0/n2b)), 6) AS t_stat,
  CAST(n1b + n2b - 2 AS BIGINT) AS df,
  CAST(abs((s1/n1b - s2/n2b) / sqrt(
    (((ss1 - n1b * (s1/n1b) * (s1/n1b)) + (ss2 - n2b * (s2/n2b) * (s2/n2b)))
     / (n1b + n2b - 2)) * (1.0/n1b + 1.0/n2b))) > 1.96 AS INT)
    AS significant_5pct
FROM wide
"""


def q_sequence_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceNextNode('forward','head')`` parity: for every
    user, the event immediately following their FIRST 'view' (ties broken
    by event_id — a total order, so the answer is engine-independent), and
    the distribution of those next steps. One window pass partitioned by
    user (scales with users, no global sort); users whose first view is
    their last event report '(end)'."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        F.sum((F.col("event_type") == "view").cast("int"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("views_so_far"),
    )
    first_view = marked.filter(
        (F.col("event_type") == "view") & (F.col("views_so_far") == 1)
    )
    return (
        first_view.groupBy(
            F.coalesce("next_type", F.lit("(end)")).alias("next_after_first_view")
        )
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy("next_after_first_view")
    )


_SEQ_NEXT_SQL = """
WITH marked AS (
  SELECT user_id, event_type,
    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS next_type,
    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS views_so_far
  FROM events)
SELECT COALESCE(next_type, '(end)') AS next_after_first_view,
  CAST(COUNT(*) AS BIGINT) AS n_users
FROM marked WHERE event_type = 'view' AND views_so_far = 1
GROUP BY 1 ORDER BY 1
"""


def q_uniq_up_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``uniqUpTo(N)`` parity: per event type, the distinct
    user count reported exactly while <= N and as N+1 once it exceeds N
    (the CH contract that bounds state at N+1 values per group). Shown at
    N=10 and N=100 beside the exact count; one aggregation. At scale the
    capped semantics are what make per-group distinct state bounded —
    the partial-aggregate state never holds more than N+1 ids."""
    ev = _t(spark, sf_dir, "events")
    exact = F.countDistinct("user_id").cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            exact.alias("exact_users"),
            F.least(exact, F.lit(11)).cast("bigint").alias("uniq_up_to_10"),
            F.least(exact, F.lit(101)).cast("bigint").alias("uniq_up_to_100"),
            (exact > 100).cast("int").alias("capped_at_100"),
        )
        .orderBy("event_type")
    )


_UNIQ_UP_TO_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
  CAST(LEAST(COUNT(DISTINCT user_id), 11) AS BIGINT) AS uniq_up_to_10,
  CAST(LEAST(COUNT(DISTINCT user_id), 101) AS BIGINT) AS uniq_up_to_100,
  CAST(COUNT(DISTINCT user_id) > 100 AS INT) AS capped_at_100
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_delta_sum_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``deltaSum`` / ``runningDifference`` parity over the
    daily revenue series, per month: the sum of positive day-over-day
    increases (deltaSum's monotone-gain semantics), up/down day counts,
    and the first-to-last net change. Daily revenue aggregates 1e-2-rounded
    prices as exact decimals, so deltas and their sums are exact and
    order-free; the lag runs inside month partitions (no global sort)."""
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.round("o_totalprice", 2).cast("decimal(38,2)")).alias("rev")
        )
    )
    w = Window.partitionBy(F.date_format("d", "yyyy-MM")).orderBy("d")
    d = daily.select(
        F.date_format("d", "yyyy-MM").alias("month"),
        "d",
        "rev",
        (F.col("rev") - F.lag("rev").over(w)).alias("delta"),
    )
    return (
        d.groupBy("month")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum(F.when(F.col("delta") > 0, F.col("delta")).otherwise(F.lit(0)))
            .cast("double")
            .alias("delta_sum"),
            F.sum(F.when(F.col("delta") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("up_days"),
            F.sum(F.when(F.col("delta") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("down_days"),
            (F.max_by("rev", "d") - F.min_by("rev", "d"))
            .cast("double")
            .alias("net_change"),
        )
        .orderBy("month")
    )


_DELTA_SUM_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(38,2))) AS rev
  FROM orders GROUP BY 1),
dd AS (
  SELECT strftime(d, '%Y-%m') AS month, d, rev,
    rev - LAG(rev) OVER (PARTITION BY strftime(d, '%Y-%m') ORDER BY d)
      AS delta
  FROM daily)
SELECT month, CAST(COUNT(*) AS BIGINT) AS n_days,
  CAST(SUM(CASE WHEN delta > 0 THEN delta ELSE 0 END) AS DOUBLE) AS delta_sum,
  CAST(SUM(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT) AS up_days,
  CAST(SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT) AS down_days,
  CAST(arg_max(rev, d) - arg_min(rev, d) AS DOUBLE) AS net_change
FROM dd GROUP BY month ORDER BY month
"""


_SPARKBAR_PALETTE = "▁▂▃▄▅▆▇█"


def q_sparkbar_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sparkbar`` parity: per month, an 8-level unicode bar
    chart of daily order counts (observed days, in day order). Levels are
    min-max normalized per month — level = floor((v-min)*7/(max-min)),
    all-equal months render full bars — using only integer-valued doubles,
    so floor() is exact in both engines. The per-month array is bounded at
    31 entries; one shuffle to (month, day), one to month."""
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM").alias("month"),
            F.dayofmonth(F.col("o_orderdate").cast("date")).alias("dom"),
        )
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    m = daily.groupBy("month").agg(
        F.array_sort(F.collect_list(F.struct("dom", "cnt"))).alias("arr"),
        F.min("cnt").alias("mn"),
        F.max("cnt").alias("mx"),
    )
    lvl = lambda c: F.when(  # noqa: E731
        F.col("mx") == F.col("mn"), F.lit(7)
    ).otherwise(
        F.floor(
            (c - F.col("mn")).cast("double") * 7.0
            / (F.col("mx") - F.col("mn")).cast("double")
        )
    )
    return m.select(
        "month",
        F.size("arr").cast("bigint").alias("n_days"),
        F.col("mn").cast("bigint").alias("min_daily"),
        F.col("mx").cast("bigint").alias("max_daily"),
        F.concat_ws(
            "",
            F.transform(
                "arr",
                lambda s: F.substring(
                    F.lit(_SPARKBAR_PALETTE),
                    (lvl(s.getField("cnt")) + 1).cast("int"),
                    1,
                ),
            ),
        ).alias("sparkbar"),
    ).orderBy("month")


_SPARKBAR_SQL = f"""
WITH daily AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
    day(CAST(o_orderdate AS DATE)) AS dom,
    CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1, 2),
m AS (
  SELECT month, list(cnt ORDER BY dom) AS arr,
    MIN(cnt) AS mn, MAX(cnt) AS mx
  FROM daily GROUP BY month)
SELECT month, CAST(len(arr) AS BIGINT) AS n_days,
  CAST(mn AS BIGINT) AS min_daily, CAST(mx AS BIGINT) AS max_daily,
  list_aggregate(list_transform(arr, v -> substr('{_SPARKBAR_PALETTE}',
    CAST(CASE WHEN mx = mn THEN 7
         ELSE floor((v - mn)::DOUBLE * 7.0 / (mx - mn)::DOUBLE) END
         AS INT) + 1, 1)), 'string_agg', '') AS sparkbar
FROM m ORDER BY month
"""


_GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def q_geohash_grid_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``geohashEncode`` parity: customers are placed on a
    deterministic synthetic lat/lon grid (key-derived, since fixtures have
    no geography), geohash-encoded at precision 2 with pure integer bit
    interleaving (5 lon bits + 5 lat bits -> 2 base32 chars — exact, no
    floating point), then rolled up per cell. The cell space is bounded at
    1024 rows at ANY scale; row-local encoding plus one aggregation; the
    encode is a codegen'd expression chain, no UDF."""
    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey").cast("bigint")
    # synthetic coords: lat in [-90,90) on a 0.01-degree grid, lon likewise
    lat_units = (k * 37) % 18000   # (lat + 90) * 100
    lon_units = (k * 73) % 36000   # (lon + 180) * 100
    # geohash cell index at 5 bits per axis: floor(frac * 32)
    latb = F.floor((lat_units * 32) / F.lit(18000)).cast("bigint")
    lonb = F.floor((lon_units * 32) / F.lit(36000)).cast("bigint")
    code = F.lit(0).cast("bigint")
    for i in range(5):
        code = (
            code
            + F.shiftright(lonb, i).bitwiseAND(F.lit(1)) * F.lit(2 ** (2 * i + 1))
            + F.shiftright(latb, i).bitwiseAND(F.lit(1)) * F.lit(2 ** (2 * i))
        )
    gh = F.concat(
        *[
            F.substring(
                F.lit(_GEOHASH_ALPHABET),
                (F.shiftright(code, 5 - 5 * j).bitwiseAND(F.lit(31)) + 1).cast(
                    "int"
                ),
                1,
            )
            for j in range(2)
        ]
    )
    return (
        c.select(
            gh.alias("geohash2"),
            F.round("c_acctbal", 2).alias("bal"),
        )
        .groupBy("geohash2")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum(F.col("bal").cast("decimal(38,2)"))
            .cast("double")
            .alias("sum_acctbal"),
        )
        .orderBy("geohash2")
    )


def _geohash_sql() -> str:
    code_terms = " + ".join(
        f"(((lonb >> {i}) & 1) * {2 ** (2 * i + 1)})"
        f" + (((latb >> {i}) & 1) * {2 ** (2 * i)})"
        for i in range(5)
    )
    chars = " || ".join(
        f"substr('{_GEOHASH_ALPHABET}', CAST(((code >> {5 - 5 * j}) & 31) + 1 AS INT), 1)"
        for j in range(2)
    )
    return f"""
WITH grid AS (
  SELECT
    CAST(floor(((c_custkey * 37) % 18000) * 32 / 18000.0) AS BIGINT) AS latb,
    CAST(floor(((c_custkey * 73) % 36000) * 32 / 36000.0) AS BIGINT) AS lonb,
    ROUND(c_acctbal, 2) AS bal
  FROM customer),
coded AS (
  SELECT CAST({code_terms} AS BIGINT) AS code, bal FROM grid)
SELECT {chars} AS geohash2,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(SUM(CAST(bal AS DECIMAL(38,2))) AS DOUBLE) AS sum_acctbal
FROM coded GROUP BY 1 ORDER BY 1
"""


_GEOHASH_SQL = _geohash_sql()


def q_group_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupBitAnd`` / ``groupBitOr`` / ``groupBitXor``
    parity: bitwise aggregates of the user-id key per event type (the CH
    idiom for permission-mask folding and parity checks). Associative +
    commutative integer folds — partial aggregation is exact, one
    shuffle."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.bit_and("user_id").cast("bigint").alias("bit_and_users"),
            F.bit_or("user_id").cast("bigint").alias("bit_or_users"),
            F.bit_xor("user_id").cast("bigint").alias("bit_xor_users"),
        )
        .orderBy("event_type")
    )


_GROUP_BIT_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(bit_and(user_id) AS BIGINT) AS bit_and_users,
  CAST(bit_or(user_id) AS BIGINT) AS bit_or_users,
  CAST(bit_xor(user_id) AS BIGINT) AS bit_xor_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_any_heavy_daily_majority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``anyHeavy`` made deterministic: per ISO week, the
    Boyer-Moore majority-vote fold over the sequence of daily winning
    event types (day order; daily winner = max count, ties to the
    alphabetically first type), verified against the exact mode. The fold
    is a Catalyst ``aggregate`` over a <=7-element week array — no UDF,
    no shuffle beyond the two groupBys; the DuckDB twin replays the
    identical fold with ``list_reduce``. ``bm_is_majority`` certifies the
    Boyer-Moore invariant: the candidate equals the mode whenever a true
    majority (> n/2 days) exists."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("d"), "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    wd = Window.partitionBy("d").orderBy(F.col("cnt").desc(), "event_type")
    winners = (
        daily.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .select(
            F.date_trunc("week", F.col("d")).cast("date").alias("week"),
            F.dayofyear("d").alias("dom"),
            F.col("event_type").alias("winner"),
        )
    )
    m = winners.groupBy("week").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dom", "winner"))),
            lambda s: s.getField("winner"),
        ).alias("ws")
    )
    acc0 = F.struct(F.lit("").alias("cand"), F.lit(0).alias("cnt"))
    bm = F.aggregate(
        "ws",
        acc0,
        lambda acc, w: F.when(
            acc.getField("cnt") == 0,
            F.struct(w.alias("cand"), F.lit(1).alias("cnt")),
        )
        .when(
            w == acc.getField("cand"),
            F.struct(
                acc.getField("cand").alias("cand"),
                (acc.getField("cnt") + 1).alias("cnt"),
            ),
        )
        .otherwise(
            F.struct(
                acc.getField("cand").alias("cand"),
                (acc.getField("cnt") - 1).alias("cnt"),
            )
        ),
    )
    folded = m.select("week", F.size("ws").alias("n_days"), bm.alias("bm"), "ws")
    modal_days = F.array_max(
        F.transform(
            F.array_distinct("ws"),
            lambda w: F.size(F.filter("ws", lambda x: x == w)),
        )
    )
    # mode with alphabetical tie-break: among winners hitting modal_days,
    # the smallest string
    mode_val = F.array_min(
        F.filter(
            F.array_distinct("ws"),
            lambda w: F.size(F.filter("ws", lambda x: x == w)) == modal_days,
        )
    )
    return folded.select(
        "week",
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("bm").getField("cand").alias("bm_candidate"),
        mode_val.alias("modal_winner"),
        modal_days.cast("bigint").alias("modal_days"),
        (modal_days * 2 > F.col("n_days")).cast("int").alias("has_true_majority"),
        (F.col("bm").getField("cand") == mode_val).cast("int").alias("bm_matches_mode"),
    ).orderBy("week")


_ANY_HEAVY_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2),
winners AS (
  SELECT CAST(date_trunc('week', d) AS DATE) AS week, dayofyear(d) AS dom,
    event_type AS winner
  FROM (SELECT d, event_type, cnt,
          ROW_NUMBER() OVER (PARTITION BY d ORDER BY cnt DESC, event_type) AS rn
        FROM daily)
  WHERE rn = 1),
m AS (
  SELECT week, list(winner ORDER BY dom) AS ws FROM winners GROUP BY week),
folded AS (
  SELECT week, len(ws) AS n_days, ws,
    list_reduce(
      list_transform(ws, w -> {'cand': w, 'cnt': 1}),
      (acc, x) -> CASE
        WHEN acc.cnt = 0 THEN {'cand': x.cand, 'cnt': 1}
        WHEN x.cand = acc.cand THEN {'cand': acc.cand, 'cnt': acc.cnt + 1}
        ELSE {'cand': acc.cand, 'cnt': acc.cnt - 1} END).cand AS bm_candidate,
    list_max(list_transform(list_distinct(ws),
      w -> len(list_filter(ws, x -> x = w)))) AS modal_days
  FROM m)
SELECT week, CAST(n_days AS BIGINT) AS n_days, bm_candidate,
  list_min(list_filter(list_distinct(ws),
    w -> len(list_filter(ws, x -> x = w)) = modal_days)) AS modal_winner,
  CAST(modal_days AS BIGINT) AS modal_days,
  CAST(modal_days * 2 > n_days AS INT) AS has_true_majority,
  CAST(bm_candidate = list_min(list_filter(list_distinct(ws),
    w -> len(list_filter(ws, x -> x = w)) = modal_days)) AS INT)
    AS bm_matches_mode
FROM folded ORDER BY week
"""


def q_ngram_distance_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ngramDistance`` parity: Sørensen–Dice complement over
    character-3-gram MULTISETS for every pair of distinct part names
    within distance 0.5. The name vocabulary is bounded (64 values at any
    SF), so the pair space is a bounded self-join over a deduplicated
    frame — never O(parts²); multiset intersection is an integer array
    fold, exact in both engines."""
    names = _t(spark, sf_dir, "part").select("p_name").distinct()
    grams = lambda c: F.transform(  # noqa: E731
        F.sequence(F.lit(1), F.length(c) - 2),
        lambda i: F.substring(c, i, F.lit(3)),
    )
    g = names.select(F.col("p_name").alias("name"), grams(F.col("p_name")).alias("g"))
    a = g.select(F.col("name").alias("name_a"), F.col("g").alias("ga"))
    b = g.select(F.col("name").alias("name_b"), F.col("g").alias("gb"))
    inter = F.aggregate(
        F.array_distinct("ga"),
        F.lit(0),
        lambda acc, gr: acc
        + F.least(
            F.size(F.filter("ga", lambda x: x == gr)),
            F.size(F.filter("gb", lambda x: x == gr)),
        ),
    )
    pairs = (
        # inequality-only pair join over the 64-name deduplicated frame —
        # broadcast nested loop (bounded 64² = 4096 pairs at any SF),
        # same shape as rank_correlation_nations' Kendall stage
        a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            inter.cast("bigint").alias("shared_grams"),
            F.round(
                1.0
                - 2.0 * inter.cast("double")
                / (F.size("ga") + F.size("gb")).cast("double"),
                6,
            ).alias("ngram_dist"),
        )
    )
    return pairs.filter(F.col("ngram_dist") <= 0.5).orderBy(
        "ngram_dist", "name_a", "name_b"
    )


_NGRAM_DIST_SQL = """
WITH names AS (SELECT DISTINCT p_name FROM part),
g AS (
  SELECT p_name AS name,
    list_transform(generate_series(1, len(p_name) - 2),
                   i -> substr(p_name, CAST(i AS INT), 3)) AS gr
  FROM names),
pairs AS (
  SELECT a.name AS name_a, b.name AS name_b,
    list_sum(list_transform(list_distinct(a.gr),
      x -> least(len(list_filter(a.gr, y -> y = x)),
                 len(list_filter(b.gr, y -> y = x))))) AS inter,
    len(a.gr) + len(b.gr) AS total
  FROM g a JOIN g b ON a.name < b.name)
SELECT name_a, name_b, CAST(inter AS BIGINT) AS shared_grams,
  ROUND(1.0 - 2.0 * inter::DOUBLE / total::DOUBLE, 6) AS ngram_dist
FROM pairs WHERE ROUND(1.0 - 2.0 * inter::DOUBLE / total::DOUBLE, 6) <= 0.5
ORDER BY ngram_dist, name_a, name_b
"""


# SemDeDup cluster-size hard bound: k(n) targets E[cluster] = 64
# vectors, so 1024 is 16x headroom. A cluster past the bound means the
# centroid recipe collapsed for this corpus (near-duplicate centroid
# sample) — fail LOUDLY before the per-cluster pairwise join goes
# quadratic, instead of OOMing an executor. Raise k, don't the bound.
_SEMDEDUP_TARGET_CLUSTER = 64
_SEMDEDUP_MAX_CLUSTER = 1024


def q_semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) over the embedding corpus, scale-
    parameterized: k(n) = max(16, n // 64) centroids sampled on an even
    vec_id stride (the deterministic, oracle-replayable surrogate for
    the learned-KMeans path in similarity.ivf_index — same k ∝ n rule,
    E[cluster] = 64 vectors at EVERY corpus size, so the per-cluster
    pairwise pass stays O(n·64) total instead of quadratic-in-corpus).
    Every vector joins the broadcast centroid frame (O(k) rows — no
    driver-side vector literals), takes the argmin-d² centroid, and
    inside each cluster any vector whose cosine to a LOWER-id
    cluster-mate reaches the threshold (0.35) is dropped. An in-plan
    assert_true bounds cluster size at 1024 — a degenerate assignment
    fails loudly before the pairwise join can go quadratic. Assignment
    argmin, sequential-fold cosine, and 1e-6 rounds are replayed
    exactly by the DuckDB twin. Report: per-cluster sizes, drops, mean
    pair cosine."""
    emb = _t(spark, sf_dir, "embeddings")
    # k(n) and the sampling stride derive IN-PLAN from a broadcast 1-row
    # aggregate (no separate driver count job); floor division on
    # positive counts matches the twin's // exactly
    kcol = F.greatest(
        F.lit(16),
        F.floor(F.col("n") / _SEMDEDUP_TARGET_CLUSTER),
    ).cast("bigint")
    par = (
        emb.agg(F.count("*").alias("n"))
        .select(
            kcol.alias("k"),
            F.greatest(F.lit(1), F.floor(F.col("n") / kcol))
            .cast("bigint")
            .alias("stride"),
        )
    )
    cents = (
        emb.crossJoin(F.broadcast(par))
        .filter(
            (F.col("vec_id") % F.col("stride") == 0)
            & (F.col("vec_id") < F.col("stride") * F.col("k"))
        )
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    )

    def _fold(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)

    # d² up to the row-constant ||e||²: ||c||² - 2<e,c>, both folds
    # left-to-right over float32→double values = the twin's list_sum
    c2 = _fold(F.transform(F.col("cv"), lambda y: y.cast("double") * y.cast("double")))
    dot = _fold(
        F.zip_with(
            F.col("embedding"), F.col("cv"),
            lambda x, y: x.cast("double") * y.cast("double"),
        )
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "embedding", "cid", (c2 - 2.0 * dot).alias("d2")
    )
    # argmin with cid tie-break == the twin's ROW_NUMBER(ORDER BY d2, cid);
    # every centroid is its own nearest (d2_self = -||c||² is the unique
    # minimum), so no cluster is empty
    assigned = scored.groupBy("vec_id").agg(
        F.min_by("cid", F.struct(F.col("d2"), F.col("cid"))).alias("cluster"),
        F.first("embedding").alias("embedding"),
    )
    # referenced 3x below (pair sides + sizes) and the assignment is now
    # a real join, so persist ONE frame per (app, sf_dir) through the
    # dedup family's session cache — repeat calls (bench iterations, the
    # oracle gate) reuse it instead of stacking fresh persists that churn
    # executor memory (bench showed 1.6-8s swings from eviction)
    assigned = DD._cached_stage(
        emb, ("semdedup_assigned", sf_dir), lambda: assigned
    )
    sizes = assigned.groupBy("cluster").agg(
        F.count("*").cast("bigint").alias("n_vectors")
    )
    # the hard bound rides a broadcast join against the k-row sizes
    # frame (no extra window shuffle): the pairwise input itself refuses
    # to produce rows for an oversized cluster
    guarded_cluster = F.when(
        F.assert_true(
            F.col("n_vectors") <= F.lit(_SEMDEDUP_MAX_CLUSTER),
            F.lit(
                "semdedup cluster exceeds the %d-vector bound; raise k"
                % _SEMDEDUP_MAX_CLUSTER
            ),
        ).isNull(),
        F.col("cluster"),
    )
    a = assigned.join(F.broadcast(sizes), "cluster").select(
        guarded_cluster.alias("cluster"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("ea"),
    )
    b = assigned.select(
        F.col("cluster"), F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb")
    )
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "cluster",
            "id_a",
            "id_b",
            F.round(DD.cosine_similarity(F.col("ea"), F.col("eb")), 6).alias("cos"),
        )
    )
    pair_stats = pairs.groupBy("cluster").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(
            F.sum(F.col("cos").cast("decimal(38,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_pair_cos"),
    )
    drops = (
        pairs.filter(F.col("cos") >= 0.35)
        .select("cluster", "id_b")
        .distinct()
        .groupBy("cluster")
        .agg(F.count("*").cast("bigint").alias("n_dropped"))
    )
    out = (
        sizes.join(pair_stats, "cluster", "left")
        .join(drops, "cluster", "left")
        .select(
            F.col("cluster").cast("bigint").alias("cluster"),
            "n_vectors",
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            "mean_pair_cos",
            F.coalesce("n_dropped", F.lit(0)).cast("bigint").alias("n_dropped"),
            (F.col("n_vectors") - F.coalesce("n_dropped", F.lit(0)))
            .cast("bigint")
            .alias("n_kept"),
        )
        .orderBy("cluster")
    )
    return out


_SEMDEDUP_SQL = """
WITH par AS (
  SELECT n, greatest(16, n // 64) AS k,
         greatest(1, n // greatest(16, n // 64)) AS stride
  FROM (SELECT COUNT(*) AS n FROM embeddings)),
cent AS (
  SELECT vec_id AS cid, embedding AS cv
  FROM embeddings, par
  WHERE vec_id % stride = 0 AND vec_id < stride * k),
d2 AS (
  SELECT e.vec_id, c.cid,
    list_sum(list_transform(c.cv, y -> y::DOUBLE * y::DOUBLE))
    - 2.0 * list_sum(list_transform(generate_series(1, len(e.embedding)),
             i -> e.embedding[i]::DOUBLE * c.cv[i]::DOUBLE)) AS d2
  FROM embeddings e CROSS JOIN cent c),
assigned AS (
  SELECT vec_id, cluster, embedding FROM (
    SELECT d.vec_id, d.cid AS cluster, e.embedding,
      ROW_NUMBER() OVER (PARTITION BY d.vec_id ORDER BY d.d2, d.cid) AS rn
    FROM d2 d JOIN embeddings e ON e.vec_id = d.vec_id)
  WHERE rn = 1),
pairs AS (
  SELECT a.cluster, a.vec_id AS id_a, b.vec_id AS id_b,
    round(list_sum(list_transform(generate_series(1, len(a.embedding)),
          i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
     * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))), 6)
      AS cos
  FROM assigned a JOIN assigned b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
pair_stats AS (
  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_pairs,
    ROUND(CAST(SUM(CAST(cos AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6)
      AS mean_pair_cos
  FROM pairs GROUP BY cluster),
drops AS (
  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_dropped
  FROM (SELECT DISTINCT cluster, id_b FROM pairs WHERE cos >= 0.35)
  GROUP BY cluster),
sizes AS (
  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vectors
  FROM assigned GROUP BY cluster)
SELECT CAST(s.cluster AS BIGINT) AS cluster, s.n_vectors,
  CAST(COALESCE(p.n_pairs, 0) AS BIGINT) AS n_pairs,
  p.mean_pair_cos,
  CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped,
  CAST(s.n_vectors - COALESCE(d.n_dropped, 0) AS BIGINT) AS n_kept
FROM sizes s
LEFT JOIN pair_stats p ON p.cluster = s.cluster
LEFT JOIN drops d ON d.cluster = s.cluster
ORDER BY cluster
"""


def q_edit_distance_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``editDistance`` (Levenshtein) parity over the bounded
    part-name vocabulary: every distinct-name pair within distance 8,
    with the normalized similarity 1 - dist/max(len). Both engines ship
    the exact DP Levenshtein as a builtin (Spark ``levenshtein``, DuckDB
    ``levenshtein``) — integer result, bit-exact. The pair stage is the
    same bounded self-join over the deduplicated 64-name frame as
    ngram_distance_names; the fact table is scanned once for DISTINCT."""
    names = _t(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            dist.cast("bigint").alias("edit_dist"),
            F.round(
                1.0
                - dist.cast("double")
                / F.greatest(F.length("name_a"), F.length("name_b")).cast("double"),
                6,
            ).alias("name_sim"),
        )
        .filter(F.col("edit_dist") <= 8)
        .orderBy("edit_dist", "name_a", "name_b")
    )


_EDIT_DIST_SQL = """
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist,
  ROUND(1.0 - levenshtein(a.p_name, b.p_name)::DOUBLE
        / GREATEST(LEN(a.p_name), LEN(b.p_name))::DOUBLE, 6) AS name_sim
FROM names a JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 8
ORDER BY edit_dist, name_a, name_b
"""


def q_summing_merge_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SummingMergeTree FINAL semantics: rows sharing the sort key
    ``(user_id, day)`` merge into one — numeric measures summed (exact:
    ``value`` is 1e-6-grid rounded into DECIMAL(38,6) before the sum),
    the non-summed column resolved deterministically to the latest
    row's event_type (ClickHouse keeps "any"; ``max_by(event_id)`` pins
    it). Reports the day-grain compaction census: keys, rows
    before/after, merged rows, and the day's summed measure. One key
    aggregation + one day rollup — both partial-aggregate-friendly."""
    ev = _t(spark, sf_dir, "events")
    per_key = (
        ev.select(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            F.round("value", 6).cast("decimal(38,6)").alias("v"),
            "event_id",
            "event_type",
        )
        .groupBy("user_id", "day")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("v").alias("sum_value"),
            F.max_by("event_type", "event_id").alias("last_type"),
        )
    )
    return (
        per_key.groupBy("day")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("n_rows").cast("bigint").alias("rows_before"),
            F.sum(F.col("n_rows") - 1).cast("bigint").alias("rows_merged"),
            F.round(F.sum("sum_value").cast("double"), 4).alias("day_value"),
            F.sum(F.when(F.col("last_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("keys_last_purchase"),
        )
        .orderBy("day")
    )


_SUMMING_MERGE_SQL = """
WITH per_key AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_rows,
    SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6))) AS sum_value,
    arg_max(event_type, event_id) AS last_type
  FROM events GROUP BY 1, 2)
SELECT day, CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(SUM(n_rows) AS BIGINT) AS rows_before,
  CAST(SUM(n_rows - 1) AS BIGINT) AS rows_merged,
  ROUND(CAST(SUM(sum_value) AS DOUBLE), 4) AS day_value,
  CAST(SUM(CASE WHEN last_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
    AS keys_last_purchase
FROM per_key GROUP BY day ORDER BY day
"""


def q_versioned_collapsing_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VersionedCollapsingMergeTree semantics, write pattern included:
    each user's event stream (ordered by ts, event_id) is re-expressed
    as the CDC row pairs an upstream writer would emit — event k
    cancels version k-1 with sign −1 and inserts version k with sign
    +1 (the first event inserts only). The merge collapses (user,
    version) groups whose signs net to zero; exactly the last version
    survives. Audit, grouped by the surviving state's event_type: user
    count, CDC rows written, cancelled versions, and the exact write
    amplification in ppm. The explode is row-local (≤2 rows/event);
    the collapse shuffles on (user, version) — the real engine's merge
    key — so it partitions cleanly at any scale."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versioned = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("version"),
    )
    cdc = versioned.select(
        "user_id",
        "event_type",
        F.explode(
            F.when(
                F.col("version") == 1,
                F.array(F.struct(F.col("version"), F.lit(1).alias("sign"))),
            ).otherwise(
                F.array(
                    F.struct((F.col("version") - 1).alias("version"),
                             F.lit(-1).alias("sign")),
                    F.struct(F.col("version"), F.lit(1).alias("sign")),
                )
            )
        ).alias("r"),
    ).select("user_id", "event_type", F.col("r.version").alias("version"),
             F.col("r.sign").alias("sign"))
    collapsed = (
        cdc.groupBy("user_id", "version")
        # ≤1 row of each sign per (user, version) — sign alone is a
        # total order, the +1 insert's type is the state
        .agg(F.sum("sign").alias("net"), F.count("*").alias("n_rows"),
             F.max_by("event_type", "sign").alias("state"))
    )
    per_user = collapsed.groupBy("user_id").agg(
        F.sum("n_rows").alias("rows_written"),
        F.sum(F.when(F.col("net") == 0, 1).otherwise(0)).alias("cancelled"),
        F.sum(F.when(F.col("net") != 0, 1).otherwise(0)).alias("survivors"),
        F.max_by("state", F.when(F.col("net") != 0, F.col("version"))).alias(
            "surviving_type"
        ),
    )
    return (
        per_user.groupBy("surviving_type")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("rows_written").cast("bigint").alias("cdc_rows_written"),
            F.sum("cancelled").cast("bigint").alias("versions_cancelled"),
            F.sum("survivors").cast("bigint").alias("rows_surviving"),
            F.floor(F.sum("rows_written") * 1000000 / F.sum("survivors"))
            .cast("bigint")
            .alias("write_amp_ppm"),
        )
        .orderBy("surviving_type")
    )


_VERSIONED_COLLAPSING_SQL = """
WITH versioned AS (
  SELECT user_id, event_type,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS version
  FROM events),
cdc AS (
  SELECT user_id, event_type, version, 1 AS sign FROM versioned
  UNION ALL
  SELECT user_id, event_type, version - 1 AS version, -1 AS sign
  FROM versioned WHERE version > 1),
collapsed AS (
  SELECT user_id, version, SUM(sign) AS net, COUNT(*) AS n_rows,
    arg_max(event_type, sign) AS state
  FROM cdc GROUP BY 1, 2),
per_user AS (
  SELECT user_id, SUM(n_rows) AS rows_written,
    SUM(CASE WHEN net = 0 THEN 1 ELSE 0 END) AS cancelled,
    SUM(CASE WHEN net <> 0 THEN 1 ELSE 0 END) AS survivors,
    arg_max(state, CASE WHEN net <> 0 THEN version ELSE NULL END)
      AS surviving_type
  FROM collapsed GROUP BY user_id)
SELECT surviving_type, CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(rows_written) AS BIGINT) AS cdc_rows_written,
  CAST(SUM(cancelled) AS BIGINT) AS versions_cancelled,
  CAST(SUM(survivors) AS BIGINT) AS rows_surviving,
  CAST(FLOOR(SUM(rows_written) * 1000000 / SUM(survivors)) AS BIGINT)
    AS write_amp_ppm
FROM per_user GROUP BY surviving_type ORDER BY surviving_type
"""


def q_anova_price_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA (ClickHouse ``analysisOfVariance`` parity) of order
    value across the market segments: between/within sums of squares,
    the F statistic, and eta². Per-segment moments (n, Σcents, Σcents²)
    come from ONE exact-decimal fact pass — the same bit-identical
    moment recipe as welch_ttest_segments — and the F assembly runs on
    the checkpointed 5-row moment table, so cost is one aggregation at
    any scale."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    d19 = lambda col: col.cast("decimal(19,0)")  # noqa: E731
    m = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(F.col("c_mktsegment").alias("seg"), cents.alias("x"))
        .groupBy("seg")
        .agg(
            F.count("*").alias("n"),
            F.sum(d19(F.col("x"))).cast("double").alias("sx"),
            F.sum(d19(F.col("x")) * d19(F.col("x"))).cast("double").alias("sxx"),
        )
        .localCheckpoint(eager=True)
    )
    g = m.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("n_total"),
        F.sum(F.col("sx") * F.col("sx") / F.col("n")).alias("sum_gsq"),
        F.sum("sx").alias("sx_all"),
        F.sum("sxx").alias("sxx_all"),
    )
    ssb = (F.col("sum_gsq") - F.col("sx_all") * F.col("sx_all") / F.col("n_total")) / 10000
    ssw = (F.col("sxx_all") - F.col("sum_gsq")) / 10000
    fstat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n_total") - F.col("k")))
    return g.select(
        F.col("k").cast("bigint").alias("k_groups"),
        F.col("n_total").cast("bigint").alias("n_total"),
        F.round(ssb / 1000000, 4).alias("ss_between_musd"),
        F.round(ssw / 1000000, 4).alias("ss_within_musd"),
        F.round(fstat, 6).alias("f_stat"),
        F.round(ssb / (ssb + ssw), 6).alias("eta_sq"),
    )


_ANOVA_SQL = """
WITH m AS (
  SELECT c_mktsegment AS seg, COUNT(*) AS n,
    CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
          AS DECIMAL(19,0))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DECIMAL(19,0))
           * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DECIMAL(19,0)))
         AS DOUBLE) AS sxx
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1),
g AS (
  SELECT COUNT(*) AS k, SUM(n) AS n_total,
    SUM(sx * sx / n) AS sum_gsq, SUM(sx) AS sx_all, SUM(sxx) AS sxx_all
  FROM m)
SELECT CAST(k AS BIGINT) AS k_groups, CAST(n_total AS BIGINT) AS n_total,
  ROUND((sum_gsq - sx_all * sx_all / n_total) / 10000 / 1000000, 4)
    AS ss_between_musd,
  ROUND((sxx_all - sum_gsq) / 10000 / 1000000, 4) AS ss_within_musd,
  ROUND(((sum_gsq - sx_all * sx_all / n_total) / 10000 / (k - 1))
        / ((sxx_all - sum_gsq) / 10000 / (n_total - k)), 6) AS f_stat,
  ROUND(((sum_gsq - sx_all * sx_all / n_total) / 10000)
        / ((sum_gsq - sx_all * sx_all / n_total) / 10000
           + (sxx_all - sum_gsq) / 10000), 6) AS eta_sq
FROM g
"""


_DSIR_BUCKETS = 64


def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023, 'Data Selection for Language Models via
    Importance Resampling'): every document scored by the hashed-n-gram
    importance log-ratio between a target distribution (here the ``en``
    slice) and the raw corpus. Unigrams hash into 64 md5 buckets; both
    distributions are add-one-smoothed bucket frequencies; the per-bucket
    log-ratio λ_b (rounded to the 1e-6 grid, repo log-determinism rule)
    is a 64-row broadcast table, and each doc's score is the exact
    decimal Σ c_b·λ_b — order-free, so hash-stable. Scale shape: one
    tokenize/explode pass, one 64-row aggregate, one broadcast join —
    the same single-corpus-pass DSIR runs at 100 TB."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(TX.tokens(F.col("text"))).alias("t")
    )
    bucket = (
        F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long") % _DSIR_BUCKETS
    )
    bt = tok.select("doc_id", "lang", bucket.alias("b"))
    counts = bt.groupBy("b").agg(
        F.count("*").alias("r_b"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("t_b"),
    )
    totals = counts.agg(
        F.sum("r_b").alias("r_tot"), F.sum("t_b").alias("t_tot")
    )
    lam = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                F.log(
                    ((F.col("t_b") + 1) / (F.col("t_tot") + _DSIR_BUCKETS))
                    / ((F.col("r_b") + 1) / (F.col("r_tot") + _DSIR_BUCKETS))
                ),
                6,
            ).cast("decimal(20,6)").alias("lam"),
        )
        .localCheckpoint(eager=True)
    )
    per_doc = bt.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    scored = (
        per_doc.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            # ROUND on the DECIMAL (half-away both engines) BEFORE the
            # double cast — a .00005-boundary sum would double-round;
            # a bare decimal->decimal CAST truncates in DuckDB
            F.round(F.sum(F.col("c") * F.col("lam")), 4)
            .cast("double")
            .alias("dsir_score"),
        )
    )
    meta = docs.select("doc_id", "lang", "source")
    return (
        scored.join(meta, "doc_id")
        .select(
            "doc_id", "lang", "source", "n_tokens", "dsir_score",
            (F.col("dsir_score") > 0).alias("selected"),
        )
        .orderBy("doc_id")
    )


_DSIR_SQL = f"""
WITH tok AS (SELECT doc_id, lang, unnest({_TOKS_SQL}) AS t FROM documents),
bt AS (
  SELECT doc_id, lang,
    ('0x' || substr(md5(t), 1, 15))::BIGINT % {_DSIR_BUCKETS} AS b
  FROM tok),
counts AS (
  SELECT b, COUNT(*) AS r_b,
    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_b
  FROM bt GROUP BY b),
totals AS (SELECT SUM(r_b) AS r_tot, SUM(t_b) AS t_tot FROM counts),
lam AS (
  SELECT b,
    CAST(ROUND(LN(((t_b + 1) / (t_tot + {_DSIR_BUCKETS}))
               / ((r_b + 1) / (r_tot + {_DSIR_BUCKETS}))), 6)
         AS DECIMAL(20,6)) AS lam
  FROM counts, totals),
per_doc AS (SELECT doc_id, b, COUNT(*) AS c FROM bt GROUP BY 1, 2),
scored AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
    CAST(ROUND(SUM(c * lam), 4) AS DOUBLE) AS dsir_score
  FROM per_doc JOIN lam USING (b) GROUP BY doc_id)
SELECT doc_id, lang, source, n_tokens, dsir_score,
  dsir_score > 0 AS selected
FROM scored JOIN documents USING (doc_id)
ORDER BY doc_id
"""


def q_quantiles_exact_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantileExactWeighted`` parity: per brand, the
    quantity-weighted exact {p25, p50, p75} of line extended price. The
    quantile rule is integer-exact — the smallest value whose cumulative
    weight w satisfies 4w ≥ W / 2w ≥ W / 4w ≥ 3W (no q·W float ever
    computed). One (brand, cents) pre-aggregation bounds the window
    input to distinct values; brand totals ride a checkpointed 25-row
    aggregate joined broadcast. Partitions by brand at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    base = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    per_val = base.groupBy("brand", "cents").agg(F.sum("w").alias("sw"))
    # brand totals via an unordered window over the SAME per-value
    # frame: one fact pass feeds both the cumulative and the total
    # (the former join+checkpoint formulation re-ran the fact join to
    # materialize a totals frame — twice the scans for the same result)
    cum = per_val.withColumn(
        "cw",
        F.sum("sw").over(
            Window.partitionBy("brand").orderBy("cents")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn(
        "w_total", F.sum("sw").over(Window.partitionBy("brand"))
    )
    pick = lambda cond: F.min(F.when(cond, F.col("cents")))  # noqa: E731
    return (
        cum.groupBy("brand", "w_total")
        .agg(
            (pick(4 * F.col("cw") >= F.col("w_total")) / 100.0).alias("p25"),
            (pick(2 * F.col("cw") >= F.col("w_total")) / 100.0).alias("p50"),
            (pick(4 * F.col("cw") >= 3 * F.col("w_total")) / 100.0).alias("p75"),
        )
        .select("brand", F.col("w_total").cast("bigint").alias("w_total"),
                "p25", "p50", "p75")
        .orderBy("brand")
    )


_QUANT_WEIGHTED_SQL = """
WITH base AS (
  SELECT p_brand AS brand,
    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
    CAST(l_quantity AS BIGINT) AS w
  FROM lineitem JOIN part ON l_partkey = p_partkey),
per_val AS (
  SELECT brand, cents, SUM(w) AS sw FROM base GROUP BY 1, 2),
cum AS (
  SELECT brand, cents, SUM(sw) OVER (
      PARTITION BY brand ORDER BY cents
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
    SUM(sw) OVER (PARTITION BY brand) AS w_total
  FROM per_val)
SELECT brand, CAST(MAX(w_total) AS BIGINT) AS w_total,
  MIN(CASE WHEN 4 * cw >= w_total THEN cents END) / 100.0 AS p25,
  MIN(CASE WHEN 2 * cw >= w_total THEN cents END) / 100.0 AS p50,
  MIN(CASE WHEN 4 * cw >= 3 * w_total THEN cents END) / 100.0 AS p75
FROM cum GROUP BY brand ORDER BY brand
"""


def q_window_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(…, 'strict_order')`` parity: the
    view → click → purchase chain counts ONLY when the steps are
    consecutive events in the user's stream (any interleaved event
    aborts the chain — the mode the relaxed window_funnel_levels can't
    express) and the whole chain fits in 24h of the anchor view. Two
    LEADs over the user partition decide every level in one scan; per
    user the deepest strict chain wins; levels partition the full user
    base. Exact integers end-to-end."""
    day_us = 24 * 3600 * 1_000_000
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    lead1_t, lead2_t = F.lead("event_type", 1).over(w), F.lead("event_type", 2).over(w)
    lead1_us, lead2_us = F.lead("us", 1).over(w), F.lead("us", 2).over(w)
    lvl = (
        F.when(
            (F.col("event_type") == "view")
            & (lead1_t == "click")
            & (lead2_t == "purchase")
            & (lead2_us <= F.col("us") + day_us),
            3,
        )
        .when(
            (F.col("event_type") == "view")
            & (lead1_t == "click")
            & (lead1_us <= F.col("us") + day_us),
            2,
        )
        .when(F.col("event_type") == "view", 1)
        .otherwise(0)
    )
    per_user = ev.select("user_id", lvl.alias("lvl")).groupBy("user_id").agg(
        F.max("lvl").alias("funnel_level")
    )
    return (
        per_user.groupBy("funnel_level")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy("funnel_level")
    )


_FUNNEL_STRICT_SQL = """
WITH led AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
    LEAD(event_type, 1) OVER w AS t1, LEAD(event_type, 2) OVER w AS t2,
    LEAD(epoch_us(ts), 1) OVER w AS us1, LEAD(epoch_us(ts), 2) OVER w AS us2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
lvls AS (
  SELECT user_id,
    CASE WHEN event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
              AND us2 <= us + 86400000000 THEN 3
         WHEN event_type = 'view' AND t1 = 'click'
              AND us1 <= us + 86400000000 THEN 2
         WHEN event_type = 'view' THEN 1 ELSE 0 END AS lvl
  FROM led),
per_user AS (SELECT user_id, MAX(lvl) AS funnel_level FROM lvls GROUP BY 1)
SELECT funnel_level, CAST(COUNT(*) AS BIGINT) AS n_users
FROM per_user GROUP BY funnel_level ORDER BY funnel_level
"""


_MULTI_SEARCH_NEEDLES = ["spark", "join", "merge", "stream"]


def q_multi_search_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``multiSearchAllPositions`` parity: for a fixed needle
    list, the 1-based byte position of each needle's first occurrence in
    every document (0 = absent — CH's convention), plus the found count.
    Pure row-local string scans (``instr`` both engines), zero shuffles
    beyond the final order; trivially scan-parallel at any corpus
    size."""
    docs = _t(spark, sf_dir, "documents")
    cols = [
        F.instr(F.col("text"), F.lit(n)).cast("bigint").alias(f"pos_{n}")
        for n in _MULTI_SEARCH_NEEDLES
    ]
    found = sum(
        (F.when(F.col(f"pos_{n}") > 0, 1).otherwise(0) for n in _MULTI_SEARCH_NEEDLES),
        F.lit(0),
    )
    return (
        docs.select("doc_id", *cols)
        .withColumn("n_found", found.cast("bigint"))
        .orderBy("doc_id")
    )


_MULTI_SEARCH_SQL = f"""
SELECT doc_id,
  {", ".join(f"CAST(COALESCE(instr(text, '{n}'), 0) AS BIGINT) AS pos_{n}" for n in _MULTI_SEARCH_NEEDLES)},
  CAST({" + ".join(f"CASE WHEN instr(text, '{n}') > 0 THEN 1 ELSE 0 END" for n in _MULTI_SEARCH_NEEDLES)}
    AS BIGINT) AS n_found
FROM documents ORDER BY doc_id
"""


# fixed survey polygon in the synthetic centi-degree grid (closed ring,
# 5 integer vertices) — shared by the Spark literal and the SQL VALUES
_PIP_POLY = [(2000, 3000), (9000, 1000), (16000, 8000), (12000, 30000),
             (3000, 20000)]
_PIP_EDGES = [
    (_PIP_POLY[i][0], _PIP_POLY[i][1],
     _PIP_POLY[(i + 1) % len(_PIP_POLY)][0],
     _PIP_POLY[(i + 1) % len(_PIP_POLY)][1])
    for i in range(len(_PIP_POLY))
]


def q_point_in_polygon_sites(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``pointInPolygon`` parity: each customer's synthetic
    site (the geohash query's centi-degree grid — px=(key·37)%18000,
    py=(key·73)%36000) tested against a fixed 5-vertex polygon by ray
    casting. The crossing test is ALL-INTEGER (cross-multiplied, no
    division, products ≤ ~7e8), so both engines agree bit-for-bit even
    on boundary-adjacent points. Per-nation report: sites inside /
    total and the inside share in exact ppm. The 5-edge table is a
    row-local explode — one customer scan, one 25-row rollup."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    pts = c.select(
        "c_custkey", "c_nationkey",
        ((F.col("c_custkey") * 37) % 18000).alias("px"),
        ((F.col("c_custkey") * 73) % 36000).alias("py"),
    )
    edges = F.array(*[
        F.struct(F.lit(x1).alias("x1"), F.lit(y1).alias("y1"),
                 F.lit(x2).alias("x2"), F.lit(y2).alias("y2"))
        for x1, y1, x2, y2 in _PIP_EDGES
    ])
    e = pts.select("c_custkey", "c_nationkey", "px", "py",
                   F.explode(edges).alias("e"))
    straddles = (F.col("e.y1") > F.col("py")) != (F.col("e.y2") > F.col("py"))
    # px < x-intersect, cross-multiplied by (y2-y1) with sign handled by
    # comparing against the edge's vertical direction
    left_of = (
        (F.col("px") - F.col("e.x1")) * (F.col("e.y2") - F.col("e.y1"))
        < (F.col("e.x2") - F.col("e.x1")) * (F.col("py") - F.col("e.y1"))
    ) == (F.col("e.y2") > F.col("e.y1"))
    crossed = e.groupBy("c_custkey", "c_nationkey").agg(
        F.sum(F.when(straddles & left_of, 1).otherwise(0)).alias("crossings")
    )
    return (
        crossed.join(F.broadcast(n), crossed.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("bigint").alias("n_sites"),
            F.sum(F.when(F.col("crossings") % 2 == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_inside"),
        )
        .withColumn(
            "inside_ppm",
            F.floor(F.col("n_inside") * 1000000 / F.col("n_sites")).cast("bigint"),
        )
        .orderBy("nation")
    )


_PIP_SQL = f"""
WITH edges(x1, y1, x2, y2) AS (
  VALUES {", ".join(f"({x1}, {y1}, {x2}, {y2})" for x1, y1, x2, y2 in _PIP_EDGES)}),
pts AS (
  SELECT c_custkey, c_nationkey,
    (c_custkey * 37) % 18000 AS px, (c_custkey * 73) % 36000 AS py
  FROM customer),
crossed AS (
  SELECT c_custkey, c_nationkey,
    SUM(CASE WHEN ((y1 > py) <> (y2 > py))
          AND (((px - x1) * (y2 - y1) < (x2 - x1) * (py - y1)) = (y2 > y1))
        THEN 1 ELSE 0 END) AS crossings
  FROM pts CROSS JOIN edges GROUP BY 1, 2)
SELECT n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_sites,
  CAST(SUM(CASE WHEN crossings % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_inside,
  CAST(FLOOR(SUM(CASE WHEN crossings % 2 = 1 THEN 1 ELSE 0 END) * 1000000
             / COUNT(*)) AS BIGINT) AS inside_ppm
FROM crossed JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY nation
"""


def q_bounding_ratio_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``boundingRatio`` parity: per month, the slope between
    the first and last observed (day, revenue) points — rise over run on
    the series' bounding box diagonal. First/last resolve by arg_min/
    arg_max over the day (exact cents), the slope divides two exact
    integers in double and rounds to 1e-6. Single-day months are
    excluded (undefined run). One day-grain rollup, one month rollup."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    )
    m = (
        daily.groupBy(F.date_format("d", "yyyy-MM").alias("month"))
        .agg(
            F.count("*").alias("n_days"),
            F.min("d").alias("first_d"),
            F.max("d").alias("last_d"),
            F.min_by("cents", "d").alias("first_c"),
            F.max_by("cents", "d").alias("last_c"),
        )
        .filter(F.col("n_days") > 1)
    )
    return m.select(
        "month",
        F.col("n_days").cast("bigint").alias("n_days"),
        F.round(
            (F.col("last_c") - F.col("first_c")).cast("double")
            / 100.0
            / F.datediff("last_d", "first_d").cast("double"),
            6,
        ).alias("bounding_ratio"),
    ).orderBy("month")


_BOUNDING_RATIO_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
m AS (
  SELECT strftime(d, '%Y-%m') AS month, COUNT(*) AS n_days,
    MIN(d) AS first_d, MAX(d) AS last_d,
    arg_min(cents, d) AS first_c, arg_max(cents, d) AS last_c
  FROM daily GROUP BY 1)
SELECT month, CAST(n_days AS BIGINT) AS n_days,
  ROUND(CAST(last_c - first_c AS DOUBLE) / 100.0
        / CAST(date_diff('day', first_d, last_d) AS DOUBLE), 6)
    AS bounding_ratio
FROM m WHERE n_days > 1 ORDER BY month
"""


def q_contingency_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of ClickHouse's association family in one pass —
    ``contingency`` (Pearson's C) and ``cramersVBiasCorrected``
    (Bergsma 2013) over the (market segment × order priority) table,
    alongside the raw chi² and phi² they derive from. Cell counts come
    from one exact integer aggregation; every derived statistic is the
    same double expression shape on both engines, rounded to 1e-6.
    The k×r cell table is tiny (5×5) at any scale."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cells = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(F.count("*").alias("nij"))
        # marker: bounded by |segments|×|priorities| = 5×5 at every SF
        # (plans.single_partition_collapses bounded-by-construction leaf)
        .withColumn("__bounded_by_5x5_categories", F.lit(1))
        .localCheckpoint(eager=True)
    )
    wseg = Window.partitionBy("seg")
    wprio = Window.partitionBy("prio")
    wall = Window.partitionBy()
    with_m = cells.select(
        "seg", "prio", "nij",
        F.sum("nij").over(wseg).alias("ri"),
        F.sum("nij").over(wprio).alias("cj"),
        F.sum("nij").over(wall).alias("n"),
    )
    chi_term = (
        (F.col("nij") - F.col("ri") * F.col("cj") / F.col("n"))
        * (F.col("nij") - F.col("ri") * F.col("cj") / F.col("n"))
        / (F.col("ri") * F.col("cj") / F.col("n"))
    )
    agg = with_m.agg(
        F.sum(chi_term).alias("chi2"),
        F.max("n").alias("n"),
        F.countDistinct("seg").alias("k"),
        F.countDistinct("prio").alias("r"),
    )
    phi2 = F.col("chi2") / F.col("n")
    phi2c = F.greatest(
        F.lit(0.0),
        phi2 - (F.col("k") - 1) * (F.col("r") - 1) / (F.col("n") - 1),
    )
    kc = F.col("k") - (F.col("k") - 1) * (F.col("k") - 1) / (F.col("n") - 1)
    rc = F.col("r") - (F.col("r") - 1) * (F.col("r") - 1) / (F.col("n") - 1)
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.round("chi2", 6).alias("chi2"),
        F.round(phi2, 6).alias("phi2"),
        F.round(F.sqrt(phi2 / (phi2 + 1)), 6).alias("contingency_c"),
        F.round(F.sqrt(phi2c / F.least(kc - 1, rc - 1)), 6).alias(
            "cramers_v_bc"
        ),
    )


_CONTINGENCY_SQL = """
WITH cells AS (
  SELECT c_mktsegment AS seg, o_orderpriority AS prio, COUNT(*) AS nij
  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
m AS (
  SELECT seg, prio, nij,
    SUM(nij) OVER (PARTITION BY seg) AS ri,
    SUM(nij) OVER (PARTITION BY prio) AS cj,
    SUM(nij) OVER () AS n
  FROM cells),
agg AS (
  SELECT
    SUM((nij - ri * cj / n) * (nij - ri * cj / n) / (ri * cj / n)) AS chi2,
    MAX(n) AS n, COUNT(DISTINCT seg) AS k, COUNT(DISTINCT prio) AS r
  FROM m)
SELECT CAST(n AS BIGINT) AS n, ROUND(chi2, 6) AS chi2,
  ROUND(chi2 / n, 6) AS phi2,
  ROUND(SQRT((chi2 / n) / (chi2 / n + 1)), 6) AS contingency_c,
  ROUND(SQRT(GREATEST(0.0, chi2 / n - (k - 1) * (r - 1) / (n - 1))
        / LEAST(k - (k - 1) * (k - 1) / (n - 1) - 1,
                r - (r - 1) * (r - 1) / (n - 1) - 1)), 6) AS cramers_v_bc
FROM agg
"""


def q_with_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ORDER BY … WITH FILL INTERPOLATE`` parity: the daily
    revenue series densified to the full date axis, gap days linearly
    interpolated between their observed neighbors (leading/trailing gaps
    clamp to the nearest observation). The interpolation divides exact
    cent integers and day counts in double — identical on both engines —
    and rounds to 1e-4. Scale shape: axis explode from one min/max
    aggregate, two per-series windows (prev/next observed), no global
    collect; partitions by series key when applied per-series."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    axis = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
    )
    grid = axis.join(daily, "d", "left")
    obs_d = F.when(F.col("cents").isNotNull(), F.col("d"))
    wp = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.orderBy("d").rowsBetween(0, Window.unboundedFollowing)
    g = grid.select(
        "d", "cents",
        F.last(obs_d, ignorenulls=True).over(wp).alias("pd"),
        F.last(F.col("cents"), ignorenulls=True).over(wp).alias("pv"),
        F.first(obs_d, ignorenulls=True).over(wn).alias("nd"),
        F.first(F.col("cents"), ignorenulls=True).over(wn).alias("nv"),
    )
    # exact-integer interpolation: numerator pv·(g−k) + nv·k over run g,
    # floored to milli-cents — ONE exactly-rounded IEEE division, no
    # decimal re-round (ROUND-on-double diverges at .00005 boundaries)
    k, run = F.datediff("d", "pd"), F.datediff("nd", "pd")
    num = (
        F.when(F.col("cents").isNotNull(), F.col("cents"))
        .when(F.col("pd").isNull(), F.col("nv"))
        .when(F.col("nd").isNull(), F.col("pv"))
        .otherwise(F.col("pv") * (run - k) + F.col("nv") * k)
    )
    den = (
        F.when(
            F.col("cents").isNull() & F.col("pd").isNotNull()
            & F.col("nd").isNotNull(),
            run,
        ).otherwise(F.lit(1))
    )
    mcents = F.floor(num * 1000 / den).cast("bigint")
    return g.select(
        "d",
        F.col("cents").isNull().alias("filled"),
        (mcents / 100000.0).alias("revenue"),
    ).orderBy("d")


_WITH_FILL_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
axis AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds),
grid AS (
  SELECT a.d, daily.cents FROM axis a LEFT JOIN daily ON a.d = daily.d),
g AS (
  SELECT d, cents,
    MAX(CASE WHEN cents IS NOT NULL THEN d END) OVER
      (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
    last_value(cents IGNORE NULLS) OVER
      (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    MIN(CASE WHEN cents IS NOT NULL THEN d END) OVER
      (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd,
    first_value(cents IGNORE NULLS) OVER
      (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
  FROM grid)
SELECT d, cents IS NULL AS filled,
  CAST(FLOOR(CASE
    WHEN cents IS NOT NULL THEN cents
    WHEN pd IS NULL THEN nv
    WHEN nd IS NULL THEN pv
    ELSE pv * (date_diff('day', pd, nd) - date_diff('day', pd, d))
         + nv * date_diff('day', pd, d)
  END * 1000 / CASE
    WHEN cents IS NULL AND pd IS NOT NULL AND nd IS NOT NULL
    THEN date_diff('day', pd, nd) ELSE 1 END) AS BIGINT) / 100000.0
    AS revenue
FROM g ORDER BY d
"""


def q_url_functions_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse URL-function family parity (``domain``,
    ``topLevelDomain``, ``path``, ``queryString``, ``cutQueryString``,
    ``URLHierarchy`` depth) over deterministic per-document URLs
    (https://www.<source>.example.com/corpus/<lang>/<doc_id>?lang=<lang>
    — synthesized because the corpus carries no native URLs, exactly as
    a scraping pipeline would emit them). Every extractor is a row-local
    regexp/substring expression replayed verbatim by the twin; the
    report aggregates per (domain, tld): page count, distinct paths,
    query-stripped dedup count, and mean hierarchy depth in exact
    integer ppm. Zero shuffles beyond the final rollup."""
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://www."), F.col("source"), F.lit(".example.com/corpus/"),
        F.col("lang"), F.lit("/"), F.col("doc_id"),
        F.lit("?lang="), F.col("lang"),
    )
    u = docs.select("doc_id", url.alias("url"))
    host = F.regexp_extract("url", r"^https?://([^/]+)", 1)
    dom = F.regexp_replace(host, r"^www\.", "")
    tld = F.regexp_extract(host, r"\.([a-z0-9-]+)$", 1)
    path = F.regexp_extract("url", r"^https?://[^/]+([^?#]*)", 1)
    qs = F.regexp_extract("url", r"\?([^#]*)", 1)
    cut = F.regexp_replace("url", r"\?[^#]*", "")
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    parsed = u.select(
        "doc_id", dom.alias("domain"), tld.alias("tld"),
        path.alias("path"), qs.alias("query_string"), cut.alias("cut_url"),
        depth.alias("depth"),
    )
    return (
        parsed.groupBy("domain", "tld")
        .agg(
            F.count("*").cast("bigint").alias("n_pages"),
            F.countDistinct("path").cast("bigint").alias("n_paths"),
            F.countDistinct("cut_url").cast("bigint").alias("n_cut_urls"),
            F.floor(F.sum("depth") * 1000000 / F.count("*"))
            .cast("bigint")
            .alias("mean_depth_ppm"),
        )
        .orderBy("domain")
    )


_URL_FUNCS_SQL = """
WITH u AS (
  SELECT doc_id,
    'https://www.' || source || '.example.com/corpus/' || lang || '/'
      || doc_id || '?lang=' || lang AS url
  FROM documents),
parsed AS (
  SELECT doc_id,
    regexp_replace(regexp_extract(url, '^https?://([^/]+)', 1),
                   '^www\\.', '') AS domain,
    regexp_extract(regexp_extract(url, '^https?://([^/]+)', 1),
                   '\\.([a-z0-9-]+)$', 1) AS tld,
    regexp_extract(url, '^https?://[^/]+([^?#]*)', 1) AS path,
    regexp_extract(url, '\\?([^#]*)', 1) AS query_string,
    regexp_replace(url, '\\?[^#]*', '') AS cut_url,
    len(list_filter(string_split(
      regexp_extract(url, '^https?://[^/]+([^?#]*)', 1), '/'),
      x -> x != '')) AS depth
  FROM u)
SELECT domain, tld, CAST(COUNT(*) AS BIGINT) AS n_pages,
  CAST(COUNT(DISTINCT path) AS BIGINT) AS n_paths,
  CAST(COUNT(DISTINCT cut_url) AS BIGINT) AS n_cut_urls,
  CAST(FLOOR(SUM(depth) * 1000000 / COUNT(*)) AS BIGINT) AS mean_depth_ppm
FROM parsed GROUP BY domain, tld ORDER BY domain
"""


# ---- topKWeighted: deterministic Space-Saving (k=3) -----------------------
# The fold's 9 branches (3 hits, 3 empty slots, 3 victim replacements) are
# generated ONCE from this outcome table, so the Spark aggregate() lambda
# and the DuckDB recursive-CTE twin replay bit-identical semantics.
# Branch conditions, in order, over state (i1,c1,i2,c2,i3,c3) and event
# (t, w); victims are chosen by min (count, item) — a total order.

def _ss_branches(
    acc: str, t: str, w: str, pair: str = "struct({0}, {1})"
) -> list[tuple[str, dict[str, str]]]:
    a = lambda f: f"{acc}{f}"  # noqa: E731
    pr = lambda c, i: pair.format(a(c), a(i))  # noqa: E731
    keep = {f: a(f) for f in ("i1", "c1", "i2", "c2", "i3", "c3")}
    out = []
    for s in (1, 2, 3):
        out.append((f"{a(f'i{s}')} = {t}",
                    {**keep, f"c{s}": f"{a(f'c{s}')} + {w}"}))
    for s in (1, 2, 3):
        out.append((f"{a(f'i{s}')} IS NULL",
                    {**keep, f"i{s}": t, f"c{s}": w}))
    vic1 = (f"{pr('c1', 'i1')} <= {pr('c2', 'i2')}"
            f" AND {pr('c1', 'i1')} <= {pr('c3', 'i3')}")
    vic2 = f"{pr('c2', 'i2')} <= {pr('c3', 'i3')}"
    out.append((vic1, {**keep, "i1": t, "c1": f"{a('c1')} + {w}"}))
    out.append((vic2, {**keep, "i2": t, "c2": f"{a('c2')} + {w}"}))
    out.append(("TRUE", {**keep, "i3": t, "c3": f"{a('c3')} + {w}"}))
    return out


def _ss_spark_case() -> str:
    branches = _ss_branches("acc.", "x.t", "x.w")
    whens = "\n".join(
        f"WHEN {cond} THEN named_struct("
        + ", ".join(f"'{f}', {vals[f]}" for f in ("i1", "c1", "i2", "c2", "i3", "c3"))
        + ")"
        for cond, vals in branches[:-1]
    )
    _, last = branches[-1]
    els = "named_struct(" + ", ".join(
        f"'{f}', {last[f]}" for f in ("i1", "c1", "i2", "c2", "i3", "c3")) + ")"
    return f"CASE {whens} ELSE {els} END"


def _ss_duck_cols() -> str:
    branches = _ss_branches("s.", "e.t", "e.w", pair="({0}, {1})")
    cols = []
    for f in ("i1", "c1", "i2", "c2", "i3", "c3"):
        whens = " ".join(f"WHEN {cond} THEN {vals[f]}"
                         for cond, vals in branches[:-1])
        cols.append(f"CASE {whens} ELSE {branches[-1][1][f]} END AS {f}")
    return ",\n    ".join(cols)


def q_topk_weighted_spacesaving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``topKWeighted(3)`` parity: the Space-Saving heavy-
    hitter sketch (Metwally et al. 2005) replayed DETERMINISTICALLY —
    per month, events fold in (ts, event_id) order through a 3-counter
    state; on overflow the min-(count, item) counter is evicted and
    inherits its count (the algorithm's signature overestimate). The
    month's exact weighted leader rides the same scan, so the report
    doubles as sketch-accuracy telemetry (``top1_agrees``). The fold is
    a Spark ``aggregate`` lambda over the month's sorted event array;
    the DuckDB twin replays the identical branch table in a recursive
    CTE — both generated from one outcome map, so the engines cannot
    drift. Scale: state is O(k) per group; the sort/fold partitions by
    month (the aggregate key), exactly how the real sketch merges."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"),
        F.col("event_type").alias("t"),
        F.round(F.col("value") * 100).cast("bigint").alias("w"),
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    folded = (
        ev.groupBy("day")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("us", "event_id", "t", "w"))
            ).alias("evs")
        )
        .withColumn(
            "st",
            F.expr(
                "aggregate(evs, "
                "named_struct('i1', CAST(NULL AS STRING), 'c1', CAST(0 AS BIGINT), "
                "'i2', CAST(NULL AS STRING), 'c2', CAST(0 AS BIGINT), "
                "'i3', CAST(NULL AS STRING), 'c3', CAST(0 AS BIGINT)), "
                f"(acc, x) -> {_ss_spark_case()})"
            ),
        )
        .withColumn(
            "ranked",
            F.expr(
                "array_sort(filter(array("
                "named_struct('negc', -st.c1, 'i', st.i1, 'c', st.c1), "
                "named_struct('negc', -st.c2, 'i', st.i2, 'c', st.c2), "
                "named_struct('negc', -st.c3, 'i', st.i3, 'c', st.c3)), "
                "s -> s.i IS NOT NULL))"
            ),
        )
    )
    exact = ev.groupBy("day", "t").agg(F.sum("w").alias("sw"))
    wrk = Window.partitionBy("day").orderBy(F.desc("sw"), "t")
    leader = (
        exact.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") == 1)
        .select("day", F.col("t").alias("exact_top_item"),
                F.col("sw").alias("exact_top_w"))
    )
    return (
        folded.join(leader, "day")
        .select(
            "day",
            F.expr("try_element_at(ranked, 1).i").alias("top1_item"),
            F.expr("try_element_at(ranked, 1).c").alias("top1_w"),
            F.expr("try_element_at(ranked, 2).i").alias("top2_item"),
            F.expr("try_element_at(ranked, 2).c").alias("top2_w"),
            F.expr("try_element_at(ranked, 3).i").alias("top3_item"),
            F.expr("try_element_at(ranked, 3).c").alias("top3_w"),
            "exact_top_item",
            "exact_top_w",
            (F.expr("try_element_at(ranked, 1).i") == F.col("exact_top_item"))
            .alias("top1_agrees"),
        )
        .orderBy("day")
    )


def _topk_ss_sql() -> str:
    return f"""
WITH RECURSIVE ev AS (
  SELECT CAST(ts AS DATE) AS m, event_type AS t,
    CAST(ROUND(value * 100) AS BIGINT) AS w,
    ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE)
                       ORDER BY ts, event_id) AS rn
  FROM events),
mx AS (SELECT m, MAX(rn) AS mx FROM ev GROUP BY m),
step AS (
  SELECT m, 0 AS rn, CAST(NULL AS VARCHAR) AS i1, CAST(0 AS BIGINT) AS c1,
    CAST(NULL AS VARCHAR) AS i2, CAST(0 AS BIGINT) AS c2,
    CAST(NULL AS VARCHAR) AS i3, CAST(0 AS BIGINT) AS c3
  FROM mx
  UNION ALL
  SELECT s.m, s.rn + 1,
    {_ss_duck_cols()}
  FROM step s JOIN ev e ON e.m = s.m AND e.rn = s.rn + 1),
final AS (
  SELECT s.* FROM step s JOIN mx ON mx.m = s.m AND s.rn = mx.mx),
ranked AS (
  SELECT m, list_sort(list_filter(
    [{{'negc': -c1, 'i': i1, 'c': c1}},
     {{'negc': -c2, 'i': i2, 'c': c2}},
     {{'negc': -c3, 'i': i3, 'c': c3}}], s -> s.i IS NOT NULL)) AS r
  FROM final),
exact AS (
  SELECT m, t, SUM(w) AS sw FROM ev GROUP BY 1, 2),
leader AS (
  SELECT m, t AS exact_top_item, sw AS exact_top_w FROM (
    SELECT m, t, sw,
      ROW_NUMBER() OVER (PARTITION BY m ORDER BY sw DESC, t) AS rk
    FROM exact) WHERE rk = 1)
SELECT ranked.m AS day,
  r[1].i AS top1_item, CAST(r[1].c AS BIGINT) AS top1_w,
  r[2].i AS top2_item, CAST(r[2].c AS BIGINT) AS top2_w,
  r[3].i AS top3_item, CAST(r[3].c AS BIGINT) AS top3_w,
  exact_top_item, CAST(exact_top_w AS BIGINT) AS exact_top_w,
  r[1].i = exact_top_item AS top1_agrees
FROM ranked JOIN leader ON leader.m = ranked.m
ORDER BY day
"""


_TOPK_SS_SQL = _topk_ss_sql()


def q_dedup_paragraph_ccnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style cross-document paragraph deduplication (Wenzek et al.
    2020). The corpus has no newlines, so "paragraphs" are fixed
    12-token chunks — the same deterministic segmentation a sharded
    pipeline would apply. Every chunk is fingerprinted with MD5 and
    deduplicated GLOBALLY: the first occurrence in (doc_id, chunk_idx)
    order survives, every later copy (across documents or repeated
    within one) is dropped. The report aggregates per (source, lang):
    documents, chunk/dup counts, and exact retained-token ppm. Scale:
    the dedup shuffle carries (16-byte fingerprint, doc_id, idx,
    n_tokens) — never chunk text — so the exchange is O(corpus
    fingerprints), the standard CCNet shard-hash layout."""
    K = 12
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", F.split("text", " ").alias("toks")
    )
    chunked = (
        docs.withColumn(
            "idx",
            F.explode(
                F.sequence(F.lit(0), F.ceil(F.size("toks") / K).cast("int") - 1)
            ),
        )
        .select(
            "doc_id",
            "source",
            "lang",
            "idx",
            F.slice("toks", F.col("idx") * K + 1, K).alias("ch"),
        )
        .select(
            "doc_id",
            "source",
            "lang",
            "idx",
            F.md5(F.array_join("ch", " ").cast("binary")).alias("fp"),
            F.size("ch").alias("n_toks"),
        )
    )
    w = Window.partitionBy("fp").orderBy("doc_id", "idx")
    marked = chunked.withColumn("rn", F.row_number().over(w))
    per_doc = marked.groupBy("doc_id", "source", "lang").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("dup_chunks"),
        F.sum("n_toks").alias("toks_total"),
        F.sum(F.when(F.col("rn") > 1, F.col("n_toks")).otherwise(0)).alias(
            "toks_removed"
        ),
    )
    return (
        per_doc.groupBy("source", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chunks").cast("bigint").alias("n_chunks"),
            F.sum("dup_chunks").cast("bigint").alias("dup_chunks"),
            F.sum("toks_total").cast("bigint").alias("toks_total"),
            F.sum("toks_removed").cast("bigint").alias("toks_removed"),
            F.floor(
                (F.sum("toks_total") - F.sum("toks_removed"))
                * 1000000
                / F.sum("toks_total")
            )
            .cast("bigint")
            .alias("retained_ppm"),
        )
        .orderBy("source", "lang")
    )


_CCNET_SQL = """
WITH t AS (
  SELECT doc_id, source, lang, string_split(text, ' ') AS toks
  FROM documents),
ix AS (
  SELECT doc_id, source, lang, toks,
    unnest(generate_series(0,
      CAST(ceil(len(toks) / 12.0) AS BIGINT) - 1)) AS idx
  FROM t),
c AS (
  SELECT doc_id, source, lang, idx,
    list_slice(toks, idx * 12 + 1, idx * 12 + 12) AS ch
  FROM ix),
f AS (
  SELECT doc_id, source, lang, idx,
    md5(array_to_string(ch, ' ')) AS fp, len(ch) AS n_toks
  FROM c),
m AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, idx) AS rn
  FROM f),
per_doc AS (
  SELECT doc_id, source, lang, COUNT(*) AS n_chunks,
    SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS dup_chunks,
    SUM(n_toks) AS toks_total,
    SUM(CASE WHEN rn > 1 THEN n_toks ELSE 0 END) AS toks_removed
  FROM m GROUP BY 1, 2, 3)
SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
  CAST(SUM(dup_chunks) AS BIGINT) AS dup_chunks,
  CAST(SUM(toks_total) AS BIGINT) AS toks_total,
  CAST(SUM(toks_removed) AS BIGINT) AS toks_removed,
  CAST(FLOOR((SUM(toks_total) - SUM(toks_removed)) * 1000000
             / SUM(toks_total)) AS BIGINT) AS retained_ppm
FROM per_doc GROUP BY source, lang ORDER BY source, lang
"""


def q_dict_get_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse external-dictionary parity: ``dictGetOrDefault`` +
    hierarchical ``dictGet`` (nation → region). The probe key is
    ``c_custkey % 30`` — keys 25-29 miss the 25-entry nation dictionary
    and resolve to the defaults ('UNKNOWN' / 'NONE'), exercising the
    OrDefault contract. Spark expresses the dictionary as a BROADCAST
    left join (the physical layout ClickHouse's HASHED dictionary uses),
    so the fact scan never shuffles; the twin replays the same lookups
    with LEFT JOIN + COALESCE."""
    cust = _t(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 30).alias("probe"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    looked = (
        cust.join(F.broadcast(nation), cust.probe == nation.n_nationkey, "left")
        .join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left"
        )
        .select(
            F.coalesce("n_name", F.lit("UNKNOWN")).alias("nation_name"),
            F.coalesce("r_name", F.lit("NONE")).alias("region_name"),
            "bal",
        )
    )
    return (
        looked.groupBy("region_name", "nation_name")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum("bal").cast("double").alias("sum_bal"),
        )
        .orderBy("region_name", "nation_name")
    )


_DICT_GET_SQL = """
WITH probe AS (
  SELECT c_custkey % 30 AS probe,
    CAST(c_acctbal AS DECIMAL(18,2)) AS bal
  FROM customer)
SELECT COALESCE(r_name, 'NONE') AS region_name,
  COALESCE(n_name, 'UNKNOWN') AS nation_name,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(SUM(bal) AS DOUBLE) AS sum_bal
FROM probe
LEFT JOIN nation ON probe = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2 ORDER BY region_name, nation_name
"""


def q_ipv4_subnet_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse IPv4-function family parity (``IPv4StringToNum``,
    ``IPv4NumToString`` round-trip, ``isIPAddressInRange`` CIDR test)
    over deterministic per-event addresses 10.(uid>>16&255).(uid>>8&
    255).(uid&255) — synthesized because events carry no native IPs,
    exactly as an access-log pipeline would emit them. Each address is
    re-PARSED from its string form (split + positional weights, the
    StringToNum contract), bucketed into its /24, and tested against
    the fixed CIDR 10.0.32.0/19. The host part is a Knuth
    multiplicative hash of the user id (raw ids span only one /24);
    all row-local integer expressions; one rollup shuffle."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id")
    h = (F.col("user_id") * F.lit(2654435761)) % 16777216
    ip = F.concat_ws(
        ".",
        F.lit("10"),
        (h / 65536).cast("bigint"),
        ((h / 256).cast("bigint")) % 256,
        h % 256,
    )
    parts = F.split(ip, r"\.")
    num = (
        parts.getItem(0).cast("bigint") * 16777216
        + parts.getItem(1).cast("bigint") * 65536
        + parts.getItem(2).cast("bigint") * 256
        + parts.getItem(3).cast("bigint")
    )
    cidr_lo = 10 * 16777216 + 32 * 256  # 10.0.32.0
    cidr_hi = cidr_lo + 8192 - 1  # /19 → 2^13 addresses
    with_ip = ev.select(
        "user_id",
        ip.alias("ip"),
        num.alias("ipnum"),
        F.concat_ws(
            ".", parts.getItem(0), parts.getItem(1), parts.getItem(2), F.lit("0")
        ).alias("subnet24"),
        num.between(cidr_lo, cidr_hi).alias("in_cidr"),
    )
    return (
        with_ip.groupBy("subnet24")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.min("ipnum").cast("bigint").alias("min_num"),
            F.max("ipnum").cast("bigint").alias("max_num"),
            F.sum(F.when(F.col("in_cidr"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_in_cidr"),
        )
        .orderBy("min_num")
    )


_IPV4_SQL = """
WITH e AS (
  SELECT user_id,
    '10.' || (((user_id * 2654435761) % 16777216) // 65536) || '.'
    || ((((user_id * 2654435761) % 16777216) // 256) % 256) || '.'
    || ((user_id * 2654435761) % 256) AS ip
  FROM events),
p AS (
  SELECT user_id, ip, string_split(ip, '.') AS parts FROM e),
n AS (
  SELECT user_id, ip,
    CAST(parts[1] AS BIGINT) * 16777216 + CAST(parts[2] AS BIGINT) * 65536
      + CAST(parts[3] AS BIGINT) * 256 + CAST(parts[4] AS BIGINT) AS ipnum,
    parts[1] || '.' || parts[2] || '.' || parts[3] || '.0' AS subnet24
  FROM p)
SELECT subnet24, CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(MIN(ipnum) AS BIGINT) AS min_num,
  CAST(MAX(ipnum) AS BIGINT) AS max_num,
  CAST(SUM(CASE WHEN ipnum BETWEEN 167780352 AND 167788543
       THEN 1 ELSE 0 END) AS BIGINT) AS n_in_cidr
FROM n GROUP BY subnet24 ORDER BY min_num
"""


def q_moments_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``skewPop`` / ``kurtPop`` parity: population skewness
    and kurtosis per event type from EXACT raw power sums. Values are
    fixed-pointed to deci-units (w = round(value*10)) so w..w^4 are
    exact integers; the four power sums accumulate in DECIMAL (order-
    independent), and only the final moment algebra runs in doubles —
    the identical IEEE expression tree on both engines, so the hashes
    are bit-stable. One map-side-combined rollup shuffle; no window."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 10).cast("bigint").alias("w")
    )
    w, w2 = F.col("w"), (F.col("w") * F.col("w"))
    agg = ev.select(
        "event_type", w.alias("w1"), w2.alias("w2"),
        (w2 * w).alias("w3"),
        (w2.cast("decimal(19,0)") * w2.cast("decimal(19,0)")).alias("w4"),
    ).groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("w1").cast("decimal(38,0)")).cast("double").alias("s1"),
        F.sum(F.col("w2").cast("decimal(38,0)")).cast("double").alias("s2"),
        F.sum(F.col("w3").cast("decimal(38,0)")).cast("double").alias("s3"),
        F.sum(F.col("w4")).cast("double").alias("s4"),
    )
    mean = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mean * mean
    m3 = (F.col("s3") / F.col("n") - mean * (F.col("s2") / F.col("n")) * 3
          + mean * mean * mean * 2)
    m4 = (F.col("s4") / F.col("n") - mean * (F.col("s3") / F.col("n")) * 4
          + mean * mean * (F.col("s2") / F.col("n")) * 6
          - mean * mean * mean * mean * 3)
    return (
        agg.select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            mean.alias("mean_w"),
            m2.alias("m2"),
            (m3 / F.sqrt(m2 * m2 * m2)).alias("skew_pop"),
            (m4 / (m2 * m2)).alias("kurt_pop"),
        )
        .orderBy("event_type")
    )


_SKEW_KURT_SQL = """
WITH w AS (
  SELECT event_type, CAST(ROUND(value * 10) AS BIGINT) AS w FROM events),
s AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM(CAST(w AS DECIMAL(38,0))) AS DOUBLE) AS s1,
    CAST(SUM(CAST(w * w AS DECIMAL(38,0))) AS DOUBLE) AS s2,
    CAST(SUM(CAST(w * w * w AS DECIMAL(38,0))) AS DOUBLE) AS s3,
    CAST(SUM(CAST(w * w AS DECIMAL(19,0)) * CAST(w * w AS DECIMAL(19,0)))
         AS DOUBLE) AS s4
  FROM w GROUP BY event_type),
m AS (
  SELECT event_type, n, s1 / n AS mean_w,
    s2 / n - (s1 / n) * (s1 / n) AS m2,
    s3 / n - (s1 / n) * (s2 / n) * 3
      + (s1 / n) * (s1 / n) * (s1 / n) * 2 AS m3,
    s4 / n - (s1 / n) * (s3 / n) * 4
      + (s1 / n) * (s1 / n) * (s2 / n) * 6
      - (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) * 3 AS m4
  FROM s)
SELECT event_type, CAST(n AS BIGINT) AS n, mean_w, m2,
  m3 / sqrt(m2 * m2 * m2) AS skew_pop,
  m4 / (m2 * m2) AS kurt_pop
FROM m ORDER BY event_type
"""


def q_simple_linreg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``simpleLinearRegression(x, y)`` parity: per event
    type, ordinary least squares of daily total value (cents) against
    the day index. All five sufficient statistics (n, Σx, Σy, Σxx,
    Σxy) accumulate as exact integers/decimals; slope and intercept
    are derived with the identical double expression on both engines.
    This is the mergeable-sufficient-statistics shape — the only thing
    a 1000-executor fit ever shuffles is the 5-tuple per group."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            .alias("x"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "x")
        .agg(F.sum("cents").alias("y"))
    )
    s = daily.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        s.select(
            "event_type",
            F.col("n").cast("bigint").alias("n_days"),
            slope.alias("slope_cents_per_day"),
            ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias(
                "intercept_cents"
            ),
        )
        .orderBy("event_type")
    )


_SIMPLE_LINREG_SQL = """
WITH daily AS (
  SELECT event_type,
    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
    SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
  FROM events GROUP BY 1, 2),
s AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy
  FROM daily GROUP BY event_type)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_cents_per_day,
  (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
    AS intercept_cents
FROM s ORDER BY event_type
"""


def q_group_uniq_array_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupUniqArray`` (+ bounded ``groupUniqArray(3)``)
    parity: per day, the sorted distinct event-type set, its
    cardinality, and the 3-element bounded prefix. Arrays are emitted
    comma-joined so the hash canonicalization is engine-neutral. One
    rollup shuffle; collect_set is the map-side-combining distinct-set
    aggregate (state is the bounded distinct set, not the rows)."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "event_type"
    )
    return (
        ev.groupBy("day")
        .agg(F.array_sort(F.collect_set("event_type")).alias("types"))
        .select(
            "day",
            F.size("types").cast("bigint").alias("n_uniq"),
            F.array_join("types", ",").alias("uniq_types"),
            F.array_join(F.slice("types", 1, 3), ",").alias("uniq_types_3"),
        )
        .orderBy("day")
    )


_GROUP_UNIQ_SQL = """
WITH s AS (
  SELECT CAST(ts AS DATE) AS day,
    list_sort(list(DISTINCT event_type)) AS types
  FROM events GROUP BY 1)
SELECT day, CAST(len(types) AS BIGINT) AS n_uniq,
  array_to_string(types, ',') AS uniq_types,
  array_to_string(list_slice(types, 1, 3), ',') AS uniq_types_3
FROM s ORDER BY day
"""


def q_corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``corrMatrix`` parity: the full Pearson correlation
    matrix over four lineitem measures (quantity, extendedprice cents,
    discount bp, tax bp), computed from ONE pass of exact decimal
    power/cross sums and emitted long-form (upper triangle). The
    single aggregation produces all 14 sufficient statistics; the 6
    pair rows are exploded from that 1-row frame, so the fact table is
    scanned exactly once — the matrix shape CH computes, expressed as
    sufficient-statistics + explode."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("p"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("d"),
        F.round(F.col("l_tax") * 100).cast("bigint").alias("t"),
    )
    cols = ["q", "p", "d", "t"]
    aggs = [F.count("*").cast("double").alias("n")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).cast("decimal(38,0)")).cast("double").alias(f"s_{c}")
        )
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i:]]
    for a, b in pairs:
        aggs.append(
            F.sum((F.col(a) * F.col(b)).cast("decimal(38,0)"))
            .cast("double")
            .alias(f"s_{a}{b}")
        )
    s = li.agg(*aggs)
    names = {"q": "quantity", "p": "extendedprice_cents",
             "d": "discount_bp", "t": "tax_bp"}
    rows = []
    for a, b in pairs:
        if a == b:
            continue
        cov = F.col("n") * F.col(f"s_{a}{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        va = F.col("n") * F.col(f"s_{a}{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        vb = F.col("n") * F.col(f"s_{b}{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        rows.append(
            F.struct(
                F.lit(names[a]).alias("col_a"),
                F.lit(names[b]).alias("col_b"),
                (cov / F.sqrt(va * vb)).alias("corr"),
            )
        )
    return (
        s.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.col_a", "r.col_b", "r.corr")
        .orderBy("col_a", "col_b")
    )


def _corr_matrix_sql() -> str:
    cols = ["q", "p", "d", "t"]
    names = {"q": "quantity", "p": "extendedprice_cents",
             "d": "discount_bp", "t": "tax_bp"}
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i:]]
    sums = ",\n    ".join(
        [f"CAST(SUM(CAST({c} AS DECIMAL(38,0))) AS DOUBLE) AS s_{c}"
         for c in cols]
        + [f"CAST(SUM(CAST({a} * {b} AS DECIMAL(38,0))) AS DOUBLE) AS s_{a}{b}"
           for a, b in pairs]
    )
    sel = "\nUNION ALL\n".join(
        f"SELECT '{names[a]}' AS col_a, '{names[b]}' AS col_b,\n"
        f"  (n * s_{a}{b} - s_{a} * s_{b})\n"
        f"  / sqrt((n * s_{a}{a} - s_{a} * s_{a})"
        f" * (n * s_{b}{b} - s_{b} * s_{b})) AS corr FROM s"
        for a, b in pairs if a != b
    )
    return f"""
WITH w AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p,
    CAST(ROUND(l_discount * 100) AS BIGINT) AS d,
    CAST(ROUND(l_tax * 100) AS BIGINT) AS t
  FROM lineitem),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
    {sums}
  FROM w)
SELECT * FROM ({sel}) ORDER BY col_a, col_b
"""


_CORR_MATRIX_SQL = _corr_matrix_sql()


def q_aggregating_merge_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregatingMergeTree ``-State``/``-Merge`` semantics: per-day
    partial aggregate states (count/sum/min/max over 1e-6-grid DECIMAL
    values) are built first, then MERGED across days per event_type —
    exactly the two-level shape a materialized view over
    AggregatingMergeTree produces. The mergeable exact-uniq state is the
    pre-distinct (event_type, user_id) grain, re-counted at merge time —
    the scalable exact pattern (HLL sketches are the approximate 100 TB
    path, covered by sketch_rollup_daily_users). Emits the merged values
    plus merged==direct verification flags; the partial/merge plan is
    all map-side combinable and shuffles only (type, day) / (type, user)
    keys, never raw rows twice."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.round(F.col("value"), 6).cast("decimal(38,6)").alias("v"),
        "user_id",
    )
    states = base.groupBy("event_type", "day").agg(
        F.count("*").alias("p_n"),
        F.sum("v").alias("p_sum"),
        F.min("v").alias("p_min"),
        F.max("v").alias("p_max"),
    )
    merged = states.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_states"),
        F.sum("p_n").cast("bigint").alias("merged_n"),
        F.round(F.sum("p_sum").cast("double"), 4).alias("merged_sum"),
        F.min("p_min").cast("double").alias("merged_min"),
        F.max("p_max").cast("double").alias("merged_max"),
    )
    uniq = (
        base.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("merged_uniq"))
    )
    direct = base.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("d_n"),
        F.round(F.sum("v").cast("double"), 4).alias("d_sum"),
        F.countDistinct("user_id").cast("bigint").alias("d_uniq"),
    )
    return (
        merged.join(uniq, "event_type")
        .join(direct, "event_type")
        .select(
            "event_type",
            "n_states",
            "merged_n",
            "merged_sum",
            "merged_min",
            "merged_max",
            "merged_uniq",
            (F.col("merged_n") == F.col("d_n")).cast("int").alias("n_ok"),
            (F.col("merged_sum") == F.col("d_sum")).cast("int").alias("sum_ok"),
            (F.col("merged_uniq") == F.col("d_uniq")).cast("int").alias("uniq_ok"),
        )
        .orderBy("event_type")
    )


_AGG_MERGE_SQL = """
WITH base AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(ROUND(value, 6) AS DECIMAL(38,6)) AS v, user_id
  FROM events),
states AS (
  SELECT event_type, day, COUNT(*) AS p_n, SUM(v) AS p_sum,
    MIN(v) AS p_min, MAX(v) AS p_max
  FROM base GROUP BY 1, 2),
merged AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_states,
    CAST(SUM(p_n) AS BIGINT) AS merged_n,
    ROUND(CAST(SUM(p_sum) AS DOUBLE), 4) AS merged_sum,
    CAST(MIN(p_min) AS DOUBLE) AS merged_min,
    CAST(MAX(p_max) AS DOUBLE) AS merged_max
  FROM states GROUP BY 1),
uniq AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS merged_uniq
  FROM (SELECT DISTINCT event_type, user_id FROM base) GROUP BY 1),
direct AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS d_n,
    ROUND(CAST(SUM(v) AS DOUBLE), 4) AS d_sum,
    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS d_uniq
  FROM base GROUP BY 1)
SELECT m.event_type, m.n_states, m.merged_n, m.merged_sum, m.merged_min,
  m.merged_max, u.merged_uniq,
  CAST(m.merged_n = d.d_n AS INT) AS n_ok,
  CAST(m.merged_sum = d.d_sum AS INT) AS sum_ok,
  CAST(u.merged_uniq = d.d_uniq AS INT) AS uniq_ok
FROM merged m
JOIN uniq u ON m.event_type = u.event_type
JOIN direct d ON m.event_type = d.event_type
ORDER BY m.event_type
"""


def q_agg_resample_combinator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``-Resample`` combinator
    (``sumResample(0, 500, 50)(value, value)`` /
    ``countResample(...)``): fixed value-range buckets per event_type,
    every bucket emitted even when empty (the combinator returns a
    fixed-length array; here one row per bucket with zero-fill), rows
    outside [start, stop) excluded exactly as ClickHouse drops
    out-of-range keys. The bucket spine is generated by exploding a
    ``sequence`` per distinct type (5 rows) — no cross join, no driver
    loop; the aggregation itself shuffles (type, bucket) partials
    only."""
    ev = _t(spark, sf_dir, "events")
    start, stop, step = 0, 500, 50
    nb = (stop - start) // step
    b = ev.where((F.col("value") >= start) & (F.col("value") < stop)).select(
        "event_type",
        F.round(F.col("value"), 6).cast("decimal(38,6)").alias("v"),
        F.floor((F.col("value") - F.lit(start)) / F.lit(step))
        .cast("int")
        .alias("bucket"),
    )
    agg = b.groupBy("event_type", "bucket").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(nb - 1))).alias("bucket"),
        )
        .withColumn("bucket", F.col("bucket").cast("int"))
    )
    return (
        spine.join(agg, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            (F.col("bucket") * step + start).cast("bigint").alias("bucket_lo"),
            (F.col("bucket") * step + start + step)
            .cast("bigint")
            .alias("bucket_hi"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_rows"),
            F.round(
                F.coalesce(F.col("s"), F.lit(0).cast("decimal(38,6)")).cast(
                    "double"
                ),
                4,
            ).alias("sum_value"),
        )
        .orderBy("event_type", "bucket")
    )


_AGG_RESAMPLE_SQL = """
WITH b AS (
  SELECT event_type, CAST(ROUND(value, 6) AS DECIMAL(38,6)) AS v,
    CAST(FLOOR((value - 0) / 50) AS INT) AS bucket
  FROM events WHERE value >= 0 AND value < 500),
agg AS (
  SELECT event_type, bucket, COUNT(*) AS n, SUM(v) AS s
  FROM b GROUP BY 1, 2),
spine AS (
  SELECT event_type, CAST(unnest(generate_series(0, 9)) AS INT) AS bucket
  FROM (SELECT DISTINCT event_type FROM events))
SELECT sp.event_type, sp.bucket,
  CAST(sp.bucket * 50 AS BIGINT) AS bucket_lo,
  CAST(sp.bucket * 50 + 50 AS BIGINT) AS bucket_hi,
  CAST(COALESCE(a.n, 0) AS BIGINT) AS n_rows,
  ROUND(CAST(COALESCE(a.s, 0) AS DOUBLE), 4) AS sum_value
FROM spine sp LEFT JOIN agg a
  ON sp.event_type = a.event_type AND sp.bucket = a.bucket
ORDER BY sp.event_type, sp.bucket
"""


def q_graphite_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphiteMergeTree-style age-based precision rollup: points aged
    ≤7 days from the newest timestamp stay at day grain, ≤21 days roll
    to ISO-week grain, older to month grain — Graphite's retention
    ``age:precision`` rules re-expressed declaratively. The rollup
    function is avg (Graphite's default), computed exactly as decimal
    sum / count. The reference max-date is a broadcast single-row
    aggregate (the r5 scalar pattern); everything else is one
    grain-keyed aggregation with map-side partials."""
    ev = _t(spark, sf_dir, "events")
    maxd = ev.agg(F.max(F.col("ts").cast("date")).alias("ref"))
    d = ev.select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.round(F.col("value"), 6).cast("decimal(38,6)").alias("v"),
    ).crossJoin(F.broadcast(maxd))
    age = F.datediff(F.col("ref"), F.col("day"))
    grain = (
        F.when(age <= 7, F.lit("day"))
        .when(age <= 21, F.lit("week"))
        .otherwise(F.lit("month"))
    )
    bucket = (
        F.when(age <= 7, F.col("day"))
        .when(age <= 21, F.date_trunc("week", F.col("day")).cast("date"))
        .otherwise(F.date_trunc("month", F.col("day")).cast("date"))
    )
    return (
        d.select(
            "event_type",
            grain.alias("grain"),
            bucket.alias("bucket_start"),
            "v",
        )
        .groupBy("event_type", "grain", "bucket_start")
        .agg(
            F.count("*").cast("bigint").alias("n_raw"),
            F.round(
                (F.sum("v") / F.count("*")).cast("double"), 6
            ).alias("avg_value"),
        )
        .orderBy("event_type", "bucket_start", "grain")
    )


_GRAPHITE_SQL = """
WITH m AS (SELECT MAX(CAST(ts AS DATE)) AS ref FROM events),
d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(ROUND(value, 6) AS DECIMAL(38,6)) AS v,
    date_diff('day', CAST(ts AS DATE), (SELECT ref FROM m)) AS age
  FROM events),
g AS (
  SELECT event_type,
    CASE WHEN age <= 7 THEN 'day' WHEN age <= 21 THEN 'week'
         ELSE 'month' END AS grain,
    CASE WHEN age <= 7 THEN day
         WHEN age <= 21 THEN CAST(date_trunc('week', day) AS DATE)
         ELSE CAST(date_trunc('month', day) AS DATE) END AS bucket_start,
    v
  FROM d)
SELECT event_type, grain, bucket_start,
  CAST(COUNT(*) AS BIGINT) AS n_raw,
  ROUND(CAST(SUM(v) / COUNT(*) AS DOUBLE), 6) AS avg_value
FROM g GROUP BY 1, 2, 3
ORDER BY event_type, bucket_start, grain
"""


def q_paste_join_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse PASTE JOIN (positional join): two independently
    ordered sides are glued row-N-to-row-N. Side A is the daily order
    revenue series date-ascending; side B is the SAME series re-ordered
    revenue-descending (ties broken by date) — so row k pairs day k
    with the k-th largest revenue day, a rank-vs-time alignment.
    Positional joins need a total order; here the sides are daily
    aggregates (bounded by the date span), so the single-partition
    row_number window is safe — at raw-fact scale the same shape is a
    per-range zipWithIndex over pre-sorted buckets."""
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("date"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("decimal(38,0)")
            ).alias("cents")
        )
    )
    wa = Window.orderBy("date")
    wb = Window.orderBy(F.col("cents").desc(), F.col("date"))
    a = daily.select(
        F.row_number().over(wa).alias("rn"),
        F.col("date").alias("date_asc"),
        (F.col("cents").cast("double") / 100).alias("rev_asc"),
    )
    b = daily.select(
        F.row_number().over(wb).alias("rn"),
        F.col("date").alias("date_by_rank"),
        (F.col("cents").cast("double") / 100).alias("rev_ranked"),
    )
    return (
        a.join(b, "rn")
        .select("rn", "date_asc", "rev_asc", "date_by_rank", "rev_ranked")
        .orderBy("rn")
    )


_PASTE_JOIN_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS date,
    SUM(CAST(ROUND(o_totalprice * 100) AS DECIMAL(38,0))) AS cents
  FROM orders GROUP BY 1),
a AS (
  SELECT row_number() OVER (ORDER BY date) AS rn, date AS date_asc,
    CAST(cents AS DOUBLE) / 100 AS rev_asc
  FROM daily),
b AS (
  SELECT row_number() OVER (ORDER BY cents DESC, date) AS rn,
    date AS date_by_rank, CAST(cents AS DOUBLE) / 100 AS rev_ranked
  FROM daily)
SELECT a.rn, a.date_asc, a.rev_asc, b.date_by_rank, b.rev_ranked
FROM a JOIN b ON a.rn = b.rn ORDER BY a.rn
"""


def q_mean_z_test_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``meanZTest`` parity: two-sample z-test on event value
    between every event_type pair, variances taken as the population
    variances of each sample (the known-variance contract of the z-test).
    Moments come from ONE exact-decimal pass over the facts (n, Σmicros,
    Σmicros² per type); the pair stage is a self-join over the 5-row
    moment table with a < tie-break, so data volume only ever touches the
    single aggregation. z is computed with the identical double
    expression shape on both engines and rounded to 1e-6."""
    ev = _t(spark, sf_dir, "events")
    micros = F.round(F.col("value") * 1e6).cast("decimal(38,0)")
    m = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(micros).alias("s1"),
        F.sum(micros * micros).alias("s2"),
    )
    mean = (F.col("s1").cast("double") / F.col("n")) / 1e6
    varp = (
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
        / (F.col("n") * F.col("n")).cast("double")
    ) / 1e12
    stats = m.select(
        "event_type", "n", mean.alias("mean"), varp.alias("varp")
    )
    a = stats.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("n_a"),
        F.col("mean").alias("mean_a"),
        F.col("varp").alias("var_a"),
    )
    b = stats.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("n_b"),
        F.col("mean").alias("mean_b"),
        F.col("varp").alias("var_b"),
    )
    z = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(
        F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    )
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            F.round("mean_a", 6).alias("mean_a"),
            F.round("mean_b", 6).alias("mean_b"),
            F.round(z, 6).alias("z_score"),
            (F.abs(z) > 1.959964).cast("int").alias("significant_95"),
        )
        .orderBy("type_a", "type_b")
    )


_MEAN_Z_SQL = """
WITH m AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
    SUM(CAST(ROUND(value * 1e6) AS DECIMAL(38,0))) AS s1,
    SUM(CAST(ROUND(value * 1e6) AS DECIMAL(38,0))
        * CAST(ROUND(value * 1e6) AS DECIMAL(38,0))) AS s2
  FROM events GROUP BY 1),
stats AS (
  SELECT event_type, n,
    (CAST(s1 AS DOUBLE) / n) / 1e6 AS mean,
    (CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * n AS DOUBLE)) / 1e12
      AS varp
  FROM m)
SELECT a.event_type AS type_a, b.event_type AS type_b,
  a.n AS n_a, b.n AS n_b,
  ROUND(a.mean, 6) AS mean_a, ROUND(b.mean, 6) AS mean_b,
  ROUND((a.mean - b.mean)
        / sqrt(a.varp / a.n + b.varp / b.n), 6) AS z_score,
  CAST(abs((a.mean - b.mean) / sqrt(a.varp / a.n + b.varp / b.n))
       > 1.959964 AS INT) AS significant_95
FROM stats a JOIN stats b ON a.event_type < b.event_type
ORDER BY type_a, type_b
"""


def q_max_intersections_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``maxIntersections`` / ``maxIntersectionsPosition``:
    per YEAR, the maximum number of concurrently-open orders and the
    FIRST day that peak is reached. An order is open from o_orderdate
    until its last line ships; intervals are clipped to the year so
    every year's sweep is self-contained (no cross-year carry-in — the
    same clipping a ClickHouse user applies when grouping the aggregate
    by year). The sweep is +1/-1 boundary events, a running sum over
    (year, day), then an argmin-day over the per-year max — one
    fact-fact aggregation for spans, windows only over the small
    boundary table."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    spans = (
        li.groupBy("l_orderkey").agg(
            F.max(F.col("l_shipdate").cast("date")).alias("close_day")
        )
    )
    iv = (
        o.select(
            "o_orderkey", F.col("o_orderdate").cast("date").alias("open_day")
        )
        .join(spans, F.col("o_orderkey") == F.col("l_orderkey"))
        # data noise guard: a last-ship before the order date counts as
        # open for just the order day (also keeps the year range
        # non-inverted — Spark's sequence() would DESCEND on y0 > y1
        # while DuckDB's generate_series returns empty)
        .select(
            "open_day",
            F.greatest("close_day", "open_day").alias("close_day"),
        )
        .select("open_day", "close_day", F.year("open_day").alias("y_open"),
                F.year("close_day").alias("y_close"))
    )
    # clip to each covered year: explode the (small, <=2 here) year range
    iv = iv.select(
        "open_day",
        "close_day",
        F.explode(F.sequence("y_open", "y_close")).alias("yr"),
    ).select(
        "yr",
        F.greatest(
            F.col("open_day"), F.to_date(F.concat(F.col("yr"), F.lit("-01-01")))
        ).alias("s"),
        F.least(
            F.col("close_day"),
            F.to_date(F.concat(F.col("yr"), F.lit("-12-31"))),
        ).alias("e"),
    )
    starts = iv.groupBy("yr", F.col("s").alias("day")).agg(
        F.count("*").alias("d")
    )
    ends = iv.groupBy(
        "yr", F.date_add(F.col("e"), 1).alias("day")
    ).agg((-F.count("*")).alias("d"))
    bounds = starts.unionByName(ends).groupBy("yr", "day").agg(
        F.sum("d").alias("delta")
    )
    w = Window.partitionBy("yr").orderBy("day")
    run = bounds.withColumn(
        "open_cnt", F.sum("delta").over(w)
    ).where(F.year("day") == F.col("yr"))
    wy = Window.partitionBy("yr")
    peak = (
        run.withColumn("mx", F.max("open_cnt").over(wy))
        .where(F.col("open_cnt") == F.col("mx"))
        .groupBy("yr")
        .agg(
            F.max("mx").cast("bigint").alias("max_intersections"),
            F.min("day").alias("first_peak_day"),
        )
    )
    return peak.orderBy("yr")


_MAX_INTERSECT_SQL = """
WITH spans AS (
  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close_day
  FROM lineitem GROUP BY 1),
iv0 AS (
  SELECT CAST(o_orderdate AS DATE) AS open_day,
    greatest(s.close_day, CAST(o_orderdate AS DATE)) AS close_day
  FROM orders o JOIN spans s ON o.o_orderkey = s.l_orderkey),
iv AS (
  SELECT yr,
    greatest(open_day, CAST(yr || '-01-01' AS DATE)) AS s,
    least(close_day, CAST(yr || '-12-31' AS DATE)) AS e
  FROM iv0, unnest(generate_series(CAST(year(open_day) AS INT),
                                   CAST(year(close_day) AS INT))) AS t(yr)),
bounds AS (
  SELECT yr, day, SUM(d) AS delta FROM (
    SELECT yr, s AS day, COUNT(*) AS d FROM iv GROUP BY 1, 2
    UNION ALL
    SELECT yr, e + INTERVAL 1 DAY AS day, -COUNT(*) AS d
    FROM iv GROUP BY 1, 2)
  GROUP BY 1, 2),
run AS (
  SELECT yr, day,
    SUM(delta) OVER (PARTITION BY yr ORDER BY day
                     ROWS UNBOUNDED PRECEDING) AS open_cnt
  FROM bounds),
fy AS (SELECT yr, CAST(day AS DATE) AS day, open_cnt FROM run
       WHERE year(day) = yr),
mx AS (SELECT yr, MAX(open_cnt) AS m FROM fy GROUP BY 1)
SELECT fy.yr, CAST(mx.m AS BIGINT) AS max_intersections,
  MIN(fy.day) AS first_peak_day
FROM fy JOIN mx ON fy.yr = mx.yr AND fy.open_cnt = mx.m
GROUP BY fy.yr, mx.m ORDER BY fy.yr
"""


def q_array_enumerate_uniq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse array-function parity, round 2:
    ``arrayEnumerateUniq`` (per-element occurrence index; its max is the
    max term frequency), ``arrayIntersect`` against the English stopword
    list, and ``arrayRotate``'s first element. The occurrence scan is
    bounded to the first 50 tokens (quadratic row-local work stays
    ≤2500 comparisons/row — the unbounded scale path for term
    frequencies is the explode/groupBy in text_top_tokens). Everything
    is higher-order array expressions inside codegen; zero shuffles
    before the output sort."""
    docs = _t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    d = docs.select("doc_id", toks.alias("t"), F.slice(toks, 1, 50).alias("h"))
    n = F.size("t")
    occ = F.transform(
        F.sequence(F.lit(1), F.size("h")),
        lambda i: F.size(
            F.filter(
                F.slice(F.col("h"), 1, i),
                lambda x: x == F.element_at(F.col("h"), i),
            )
        ),
    )
    stop_en = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    rot_first = F.when(
        n > 0, F.element_at(F.col("t"), ((F.lit(3) % n) + 1).cast("int"))
    )
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.array_max(occ).cast("bigint").alias("max_occ_head50"),
        F.size(F.array_intersect(F.array_distinct("t"), stop_en))
        .cast("bigint")
        .alias("n_stop_distinct"),
        rot_first.alias("rot3_first"),
    ).orderBy("doc_id")


_ARRAY_ENUM_SQL = f"""
WITH d AS (
  SELECT doc_id, {_TOKS_SQL} AS t,
    list_slice({_TOKS_SQL}, 1, 50) AS h
  FROM documents)
SELECT doc_id,
  CAST(len(t) AS BIGINT) AS n_tokens,
  CAST(list_max(list_transform(generate_series(1, len(h)),
    i -> len(list_filter(list_slice(h, 1, i), x -> x = h[i]))))
    AS BIGINT) AS max_occ_head50,
  CAST(len(list_intersect(list_distinct(t),
    ['the','and','of','to','in','is','that','it','for','was']))
    AS BIGINT) AS n_stop_distinct,
  CASE WHEN len(t) > 0 THEN t[(3 % len(t)) + 1] END AS rot3_first
FROM d ORDER BY doc_id
"""


def q_string_hamming_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse string-distance parity, round 2:
    ``byteHammingDistance`` on '#'-padded 12-byte name prefixes and
    ``stringJaccardIndex`` (distinct-character Jaccard) over every
    nation-name pair (25 names → 300 a<b pairs; the pair stage runs on
    a broadcast-size dimension, never facts). Character sets are built
    with the identical substr-per-position expansion on both engines;
    DuckDB's built-in ``jaccard`` is the cross-check for the set
    formula."""
    nat = _t(spark, sf_dir, "nation").select("n_name")
    pad = F.rpad(F.substring(F.col("n_name"), 1, 12), 12, "#")
    chars = F.expr(
        "transform(sequence(1, length(n_name)), i -> substr(n_name, i, 1))"
    )
    base = nat.select(
        F.col("n_name").alias("name"),
        pad.alias("pad12"),
        F.array_distinct(chars).alias("cs"),
    )
    a = base.select(
        F.col("name").alias("name_a"),
        F.col("pad12").alias("pa"),
        F.col("cs").alias("ca"),
    )
    b = base.select(
        F.col("name").alias("name_b"),
        F.col("pad12").alias("pb"),
        F.col("cs").alias("cb"),
    )
    ham = F.aggregate(
        F.zip_with(
            F.expr("transform(sequence(1, 12), i -> substr(pa, i, 1))"),
            F.expr("transform(sequence(1, 12), i -> substr(pb, i, 1))"),
            lambda x, y: F.when(x != y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    inter = F.size(F.array_intersect("ca", "cb"))
    union = F.size(F.array_union("ca", "cb"))
    return (
        a.join(b, F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            ham.cast("bigint").alias("hamming12"),
            F.round(inter.cast("double") / union, 6).alias("jaccard_chars"),
            (
                F.substring("name_a", 1, 3) == F.substring("name_b", 1, 3)
            ).cast("int").alias("same_prefix3"),
        )
        .orderBy("name_a", "name_b")
    )


_STRING_HAM_JAC_SQL = """
WITH base AS (
  SELECT n_name AS name, rpad(substr(n_name, 1, 12), 12, '#') AS pad12,
    list_distinct(list_transform(generate_series(1, length(n_name)),
      i -> substr(n_name, i, 1))) AS cs
  FROM nation)
SELECT a.name AS name_a, b.name AS name_b,
  CAST(list_sum(list_transform(generate_series(1, 12),
    i -> CASE WHEN substr(a.pad12, i, 1) <> substr(b.pad12, i, 1)
         THEN 1 ELSE 0 END)) AS BIGINT) AS hamming12,
  ROUND(CAST(len(list_intersect(a.cs, b.cs)) AS DOUBLE)
        / len(list_distinct(a.cs || b.cs)), 6) AS jaccard_chars,
  CAST(substr(a.name, 1, 3) = substr(b.name, 1, 3) AS INT) AS same_prefix3
FROM base a JOIN base b ON a.name < b.name
ORDER BY name_a, name_b
"""


def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rules quality filter (Rae et al. 2021 §A1.1) as a per-doc
    report: word count in [50, 100000], mean word length in [3, 10],
    ≥80% of words containing an alphabetic character, ≥2 English
    stopword hits, and the symbol-to-word ratio ('#' or ellipsis) below
    0.1 — plus the final keep verdict. Every metric is a row-local
    built-in string/array expression (no UDFs, no shuffles before the
    sort); at 100 TB the verdict column feeds the same
    filter-then-write curation pass corpus_curation uses."""
    docs = _t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    d = docs.select("doc_id", F.col("text"), toks.alias("t"))
    n = F.size("t")
    total_len = F.aggregate(
        F.transform(F.col("t"), lambda x: F.length(x)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    mean_len = total_len.cast("double") / F.greatest(n, F.lit(1))
    n_alpha = F.size(F.filter(F.col("t"), lambda x: x.rlike("[a-z]")))
    alpha_frac = n_alpha.cast("double") / F.greatest(n, F.lit(1))
    stop_en = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    stop_hits = F.size(
        F.filter(F.col("t"), lambda x: F.array_contains(stop_en, x))
    )
    n_symbols = (
        F.length("text")
        - F.length(F.regexp_replace(F.col("text"), r"#|\.\.\.|…", ""))
    )
    sym_ratio = n_symbols.cast("double") / F.greatest(n, F.lit(1))
    f_words = (n >= 50) & (n <= 100000)
    f_mwl = (mean_len >= 3.0) & (mean_len <= 10.0)
    f_alpha = alpha_frac >= 0.8
    f_stop = stop_hits >= 2
    f_sym = sym_ratio < 0.1
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.cast("bigint").alias("stopword_hits"),
        F.round(sym_ratio, 6).alias("symbol_ratio"),
        f_words.cast("int").alias("ok_word_count"),
        f_mwl.cast("int").alias("ok_mean_word_len"),
        f_alpha.cast("int").alias("ok_alpha_frac"),
        f_stop.cast("int").alias("ok_stopwords"),
        f_sym.cast("int").alias("ok_symbol_ratio"),
        (f_words & f_mwl & f_alpha & f_stop & f_sym)
        .cast("int")
        .alias("keep"),
    ).orderBy("doc_id")


_GOPHER_SQL = f"""
WITH d AS (
  SELECT doc_id, text, {_TOKS_SQL} AS t FROM documents),
m AS (
  SELECT doc_id, len(t) AS n,
    CAST(COALESCE(list_sum(list_transform(t, x -> length(x))), 0)
         AS DOUBLE) / greatest(len(t), 1) AS mean_len,
    CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
         AS DOUBLE) / greatest(len(t), 1) AS alpha_frac,
    len(list_filter(t, x -> list_contains(
      ['the','and','of','to','in','is','that','it','for','was'], x)))
      AS stop_hits,
    CAST(length(text) - length(regexp_replace(text, '#|\\.\\.\\.|…', '',
      'g')) AS DOUBLE) / greatest(len(t), 1) AS sym_ratio
  FROM d)
SELECT doc_id, CAST(n AS BIGINT) AS n_words,
  ROUND(mean_len, 6) AS mean_word_len,
  ROUND(alpha_frac, 6) AS alpha_word_frac,
  CAST(stop_hits AS BIGINT) AS stopword_hits,
  ROUND(sym_ratio, 6) AS symbol_ratio,
  CAST(n >= 50 AND n <= 100000 AS INT) AS ok_word_count,
  CAST(mean_len >= 3.0 AND mean_len <= 10.0 AS INT) AS ok_mean_word_len,
  CAST(alpha_frac >= 0.8 AS INT) AS ok_alpha_frac,
  CAST(stop_hits >= 2 AS INT) AS ok_stopwords,
  CAST(sym_ratio < 0.1 AS INT) AS ok_symbol_ratio,
  CAST(n >= 50 AND n <= 100000 AND mean_len >= 3.0 AND mean_len <= 10.0
       AND alpha_frac >= 0.8 AND stop_hits >= 2 AND sym_ratio < 0.1
       AS INT) AS keep
FROM m ORDER BY doc_id
"""


def q_time_slots_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``timeSlots(StartTime, Duration, Size)`` parity: each
    event spans [ts, ts + value seconds); the expression expands it into
    the covered 1800-second slot starts (epoch-grid floor, inclusive on
    both ends exactly like timeSlots), then a per-slot occupancy rollup:
    events overlapping the slot and distinct users. The expansion is a
    row-local sequence/explode (bounded: value < 500 s ⇒ ≤2 slots/row);
    the rollup shuffles (slot) partials only. Slots are emitted as epoch
    BIGINTs — timezone-proof across engines."""
    ev = _t(spark, sf_dir, "events")
    u = F.unix_timestamp("ts")
    dur = F.floor(F.col("value")).cast("bigint")
    s0 = F.floor(u / 1800) * 1800
    s1 = F.floor((u + dur) / 1800) * 1800
    slots = ev.select(
        "user_id",
        F.explode(F.sequence(s0, s1, F.lit(1800).cast("bigint"))).alias(
            "slot_epoch"
        ),
    )
    return (
        slots.groupBy("slot_epoch")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("slot_epoch")
    )


_TIME_SLOTS_SQL = """
WITH s AS (
  SELECT user_id,
    unnest(generate_series(
      CAST(FLOOR(epoch(ts) / 1800) * 1800 AS BIGINT),
      CAST(FLOOR((epoch(ts) + CAST(FLOOR(value) AS BIGINT)) / 1800) * 1800
           AS BIGINT),
      1800)) AS slot_epoch
  FROM events)
SELECT slot_epoch, CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM s GROUP BY 1 ORDER BY 1
"""


def q_quantile_timing_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantileTiming`` parity: timings (here
    value×100 → ms) are histogrammed at quantileTiming's documented
    resolution — exact 1 ms buckets below 1024 ms, 16 ms buckets up to
    30 s, everything beyond clamped to 30000 — and the quantile is the
    smallest bucket whose cumulative count reaches ceil(q·n). Per
    event_type: p50/p90/p99 plus the clamp census. The bucket rollup is
    one aggregation with map-side partials; the quantile scan runs over
    the tiny (type, bucket) table with a cumulative window — the exact
    shape a 100 TB timing percentile should have (bounded state, no
    full sort of raw timings)."""
    ev = _t(spark, sf_dir, "events")
    t = F.round(F.col("value") * 100).cast("bigint")
    bucket = (
        F.when(t < 1024, t)
        .when(t <= 30000, t - (t % 16))
        .otherwise(F.lit(30000))
    )
    counts = (
        ev.select("event_type", bucket.alias("b"))
        .groupBy("event_type", "b")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("b")
    wt = Window.partitionBy("event_type")
    cum = counts.select(
        "event_type",
        "b",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wt).alias("n"),
        F.sum(F.when(F.col("b") == 30000, F.col("c")).otherwise(0))
        .over(wt)
        .alias("n_clamped"),
    )
    qs = []
    for q, nm in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        qs.append(
            F.min(
                F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("b"))
            ).alias(nm)
        )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.max("n_clamped").cast("bigint").alias("n_clamped"),
            *qs,
        )
        .orderBy("event_type")
    )


_QUANTILE_TIMING_SQL = """
WITH t AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS ms FROM events),
b AS (
  SELECT event_type,
    CASE WHEN ms < 1024 THEN ms WHEN ms <= 30000 THEN ms - (ms % 16)
         ELSE 30000 END AS b
  FROM t),
c AS (SELECT event_type, b, COUNT(*) AS c FROM b GROUP BY 1, 2),
cum AS (
  SELECT event_type, b,
    SUM(c) OVER (PARTITION BY event_type ORDER BY b
                 ROWS UNBOUNDED PRECEDING) AS cum,
    SUM(c) OVER (PARTITION BY event_type) AS n,
    SUM(CASE WHEN b = 30000 THEN c ELSE 0 END)
      OVER (PARTITION BY event_type) AS n_clamped
  FROM c)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
  CAST(MAX(n_clamped) AS BIGINT) AS n_clamped,
  MIN(CASE WHEN cum >= CEIL(0.5 * n) THEN b END) AS p50,
  MIN(CASE WHEN cum >= CEIL(0.9 * n) THEN b END) AS p90,
  MIN(CASE WHEN cum >= CEIL(0.99 * n) THEN b END) AS p99
FROM cum GROUP BY event_type ORDER BY event_type
"""


def q_top_customers_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``LIMIT n WITH TIES``: the top customers by order
    count, keeping EVERY row that ties the 10th-place value — rank() ≤
    10, not row_number() ≤ 10. Order counts are small integers, so the
    tie group is large and the semantic difference visible. Two-pass
    threshold instead of a global rank window: RANK(v) over a DESC order
    is 1 + count of strictly-greater rows, so per-value counts (one tiny
    aggregate over the per-customer frame) + a distributed running sum
    (operators/ranking.py) give each distinct value's rank; the ≤10
    surviving values broadcast back onto the per-customer frame. No
    single-partition pass over the fact-proportional customer table."""
    o = _t(spark, sf_dir, "orders")
    # checkpoint: both the per-value branch and the join-back read this
    # frame — one fact scan, not two
    per = (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .localCheckpoint(eager=True)
    )
    vals = per.groupBy("n_orders").agg(F.count("*").alias("cnt"))
    cum = RK.global_running_sum(
        vals, [F.desc("n_orders")], ["cnt"], ["cum_cnt"]
    )
    kept = cum.select(
        "n_orders", (F.col("cum_cnt") - F.col("cnt") + 1).alias("rnk")
    ).where(F.col("rnk") <= 10)
    return (
        per.join(F.broadcast(kept), "n_orders")
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("n_orders").cast("bigint").alias("n_orders"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy(F.col("n_orders").desc(), "custkey")
    )


_WITH_TIES_SQL = """
WITH per AS (
  SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1),
r AS (
  SELECT o_custkey, n, rank() OVER (ORDER BY n DESC) AS rnk FROM per)
SELECT o_custkey AS custkey, CAST(n AS BIGINT) AS n_orders,
  CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 10 ORDER BY n DESC, custkey
"""


def q_set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION DISTINCT census (ClickHouse set
    operators) over active-customer sets of two adjacent order years:
    sizes of both sets, the intersection, each difference, the union,
    and the symmetric difference, plus min-custkey witnesses of the
    one-sided sets. Implemented as ONE full-outer join on the
    pre-distinct (custkey, year-flag) sets with conditional counting —
    a single shuffle instead of five separate set-op passes; the
    oracle spells the same flags via FULL JOIN. The two-column set
    frames are the only shuffled payload."""
    o = _t(spark, sf_dir, "orders")
    yr = F.year(F.col("o_orderdate"))
    a = (
        o.where(yr == 1996).select("o_custkey").distinct()
        .select(F.col("o_custkey").alias("k"), F.lit(1).alias("in_a"))
    )
    b = (
        o.where(yr == 1997).select("o_custkey").distinct()
        .select(F.col("o_custkey").alias("k"), F.lit(1).alias("in_b"))
    )
    j = a.join(b, "k", "full").select(
        "k",
        F.coalesce("in_a", F.lit(0)).alias("ia"),
        F.coalesce("in_b", F.lit(0)).alias("ib"),
    )
    return j.agg(
        F.sum("ia").cast("bigint").alias("n_1996"),
        F.sum("ib").cast("bigint").alias("n_1997"),
        F.sum(F.col("ia") * F.col("ib")).cast("bigint").alias("n_both"),
        F.sum(F.col("ia") * (1 - F.col("ib"))).cast("bigint").alias("n_only_1996"),
        F.sum(F.col("ib") * (1 - F.col("ia"))).cast("bigint").alias("n_only_1997"),
        F.count("*").cast("bigint").alias("n_union"),
        F.sum(
            F.when(F.col("ia") != F.col("ib"), 1).otherwise(0)
        ).cast("bigint").alias("n_symdiff"),
        F.min(F.when(F.col("ib") == 0, F.col("k"))).alias("min_only_1996"),
        F.min(F.when(F.col("ia") == 0, F.col("k"))).alias("min_only_1997"),
    )


_SET_OPS_SQL = """
WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders
           WHERE year(o_orderdate) = 1996),
b AS (SELECT DISTINCT o_custkey AS k FROM orders
      WHERE year(o_orderdate) = 1997),
j AS (
  SELECT COALESCE(a.k, b.k) AS k,
    CASE WHEN a.k IS NULL THEN 0 ELSE 1 END AS ia,
    CASE WHEN b.k IS NULL THEN 0 ELSE 1 END AS ib
  FROM a FULL JOIN b ON a.k = b.k)
SELECT CAST(SUM(ia) AS BIGINT) AS n_1996,
  CAST(SUM(ib) AS BIGINT) AS n_1997,
  CAST(SUM(ia * ib) AS BIGINT) AS n_both,
  CAST(SUM(ia * (1 - ib)) AS BIGINT) AS n_only_1996,
  CAST(SUM(ib * (1 - ia)) AS BIGINT) AS n_only_1997,
  CAST(COUNT(*) AS BIGINT) AS n_union,
  CAST(SUM(CASE WHEN ia <> ib THEN 1 ELSE 0 END) AS BIGINT) AS n_symdiff,
  MIN(CASE WHEN ib = 0 THEN k END) AS min_only_1996,
  MIN(CASE WHEN ia = 0 THEN k END) AS min_only_1997
FROM j
"""


def q_date_format_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse date-formatting family parity — ``toYYYYMM``,
    ``dateName('month'|'weekday')``, ``toISOWeek``, and a
    ``formatDateTime``-style quarter label — reported per order month
    with the month's order count. Names come from the engines' native
    formatters (Spark date_format MMMM/EEEE, DuckDB
    monthname/dayname — both English), ISO weeks from weekofyear; the
    rollup is a single month-keyed aggregation."""
    o = _t(spark, sf_dir, "orders")
    m0 = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    per = (
        o.select(m0.alias("month_start"))
        .groupBy("month_start")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )
    return per.select(
        (F.year("month_start") * 100 + F.month("month_start"))
        .cast("bigint")
        .alias("yyyymm"),
        F.col("month_start"),
        F.date_format("month_start", "MMMM").alias("month_name"),
        F.date_format("month_start", "EEEE").alias("first_dow_name"),
        F.weekofyear("month_start").cast("bigint").alias("iso_week_of_first"),
        F.concat(
            F.lit("Q"), F.quarter("month_start"), F.lit("-"),
            F.year("month_start"),
        ).alias("quarter_label"),
        "n_orders",
    ).orderBy("yyyymm")


_DATE_FORMAT_SQL = """
WITH per AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
    COUNT(*) AS n
  FROM orders GROUP BY 1)
SELECT CAST(year(month_start) * 100 + month(month_start) AS BIGINT)
    AS yyyymm,
  month_start,
  monthname(month_start) AS month_name,
  dayname(month_start) AS first_dow_name,
  CAST(weekofyear(month_start) AS BIGINT) AS iso_week_of_first,
  'Q' || quarter(month_start) || '-' || year(month_start)
    AS quarter_label,
  CAST(n AS BIGINT) AS n_orders
FROM per ORDER BY yyyymm
"""


def q_vector_distance_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse vector-distance function family parity —
    ``L1Distance``, ``L2Distance``, ``LinfDistance``, ``dotProduct``,
    ``cosineDistance`` — every embedding scored against the broadcast
    vec_id=0 query vector. All folds run left-to-right in array order
    on both engines (Spark ``aggregate`` ≙ DuckDB ``list_sum`` over
    ``list_transform``) so doubles are bit-identical; results rounded
    to 1e-6. Row-local math inside codegen; the only join is the
    broadcast single-row query."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    d = emb.crossJoin(F.broadcast(q))
    diff = F.zip_with(
        "embedding", "qvec", lambda a, b: a.cast("double") - b.cast("double")
    )
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    dot = fold(
        F.zip_with(
            "embedding",
            "qvec",
            lambda a, b: a.cast("double") * b.cast("double"),
        )
    )
    na = F.sqrt(
        fold(
            F.transform(
                "embedding", lambda x: x.cast("double") * x.cast("double")
            )
        )
    )
    nb = F.sqrt(
        fold(
            F.transform("qvec", lambda x: x.cast("double") * x.cast("double"))
        )
    )
    return d.select(
        "vec_id",
        F.round(fold(F.transform(diff, F.abs)), 6).alias("l1"),
        F.round(
            F.sqrt(fold(F.transform(diff, lambda x: x * x))), 6
        ).alias("l2"),
        F.round(F.array_max(F.transform(diff, F.abs)), 6).alias("linf"),
        F.round(dot, 6).alias("dot"),
        F.round(F.lit(1.0) - dot / (na * nb), 6).alias("cosine_dist"),
    ).orderBy("vec_id")


_VECTOR_DIST_SQL = """
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
d AS (
  SELECT vec_id,
    list_transform(generate_series(1, len(embedding)),
      i -> embedding[i]::DOUBLE - qvec[i]::DOUBLE) AS diff,
    list_sum(list_transform(generate_series(1, len(embedding)),
      i -> embedding[i]::DOUBLE * qvec[i]::DOUBLE)) AS dot,
    sqrt(list_sum(list_transform(embedding,
      x -> x::DOUBLE * x::DOUBLE))) AS na,
    sqrt(list_sum(list_transform(qvec,
      x -> x::DOUBLE * x::DOUBLE))) AS nb
  FROM embeddings, q)
SELECT vec_id,
  ROUND(COALESCE(list_sum(list_transform(diff, x -> abs(x))), 0), 6) AS l1,
  ROUND(sqrt(COALESCE(list_sum(list_transform(diff, x -> x * x)), 0)), 6)
    AS l2,
  ROUND(list_max(list_transform(diff, x -> abs(x))), 6) AS linf,
  ROUND(dot, 6) AS dot,
  ROUND(1.0 - dot / (na * nb), 6) AS cosine_dist
FROM d ORDER BY vec_id
"""


def q_ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard-negative mining: for each of the 20
    lowest-id query vectors, the top-5 most-cosine-similar vectors with
    a DIFFERENT label (the classic hard negatives — near in embedding
    space, wrong class). The bounded query set broadcasts against the
    corpus (20 × N scoring, embarrassingly parallel, zero shuffle
    before the per-query top-k window); at 100 TB the same mining runs
    per LSH bucket (similarity_lsh_topk's path) instead of
    brute-force."""
    emb = _t(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("q_label"),
    )
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    dot = fold(
        F.zip_with(
            "embedding",
            "qvec",
            lambda a, b: a.cast("double") * b.cast("double"),
        )
    )
    na = F.sqrt(
        fold(
            F.transform(
                "embedding", lambda x: x.cast("double") * x.cast("double")
            )
        )
    )
    nb = F.sqrt(
        fold(
            F.transform("qvec", lambda x: x.cast("double") * x.cast("double"))
        )
    )
    scored = (
        emb.crossJoin(F.broadcast(qset))
        .where(F.col("label") != F.col("q_label"))
        .select(
            "q_id",
            "q_label",
            "vec_id",
            "label",
            F.round(dot / (na * nb), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select(
            "q_id",
            "q_label",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            "cosine",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy("q_id", "rnk")
    )


_ANN_HARD_NEG_SQL = """
WITH qset AS (
  SELECT vec_id AS q_id, embedding AS qvec, label AS q_label
  FROM embeddings WHERE vec_id < 20),
scored AS (
  SELECT q.q_id, q.q_label, e.vec_id, e.label,
    ROUND(list_sum(list_transform(generate_series(1, len(e.embedding)),
        i -> e.embedding[i]::DOUBLE * q.qvec[i]::DOUBLE))
      / (sqrt(list_sum(list_transform(e.embedding,
           x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform(q.qvec,
           x -> x::DOUBLE * x::DOUBLE)))), 6) AS cosine
  FROM embeddings e, qset q
  WHERE e.label <> q.q_label),
r AS (
  SELECT q_id, q_label, vec_id, label, cosine,
    ROW_NUMBER() OVER (PARTITION BY q_id
                       ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored)
SELECT q_id, q_label, vec_id AS neg_id, label AS neg_label, cosine,
  CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 5 ORDER BY q_id, rnk
"""


def q_min_max_map_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``minMap`` / ``maxMap`` / ``avgMap`` parity (the
    sumMap siblings): per event type, key-aligned per-bucket (props.k
    mod 10) minimum, maximum, and exact average of value-cents,
    emitted as sorted CSV array pairs — the map-aggregate return shape
    canonicalized identically on both engines. One (type, bucket)
    partial aggregation (map-side combinable), one per-type fold."""
    ev = _t(spark, sf_dir, "events")
    bucket = (F.get_json_object("props", "$.k").cast("long") % 10).alias(
        "bucket"
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    partial = ev.groupBy("event_type", bucket).agg(
        F.min(cents).alias("mn"),
        F.max(cents).alias("mx"),
        F.sum(cents.cast("decimal(38,0)")).alias("s"),
        F.count("*").alias("n"),
    )
    avg_micros = F.floor(
        (F.col("s") * 1000000 / F.col("n")).cast("decimal(38,6)")
    ).cast("bigint")
    folded = (
        partial.select(
            "event_type",
            F.struct("bucket", "mn", "mx", avg_micros.alias("am")).alias("kv"),
        )
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("kv")).alias("kv"))
        .select(
            "event_type",
            F.concat_ws(
                ",", F.transform("kv", lambda x: x["bucket"])
            ).alias("keys_csv"),
            F.concat_ws(",", F.transform("kv", lambda x: x["mn"])).alias(
                "mins_csv"
            ),
            F.concat_ws(",", F.transform("kv", lambda x: x["mx"])).alias(
                "maxs_csv"
            ),
            F.concat_ws(",", F.transform("kv", lambda x: x["am"])).alias(
                "avg_micros_csv"
            ),
        )
    )
    return folded.orderBy("event_type")


_MIN_MAX_MAP_SQL = """
WITH p AS (
  SELECT event_type,
    CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS bucket,
    MIN(CAST(ROUND(value * 100) AS BIGINT)) AS mn,
    MAX(CAST(ROUND(value * 100) AS BIGINT)) AS mx,
    CAST(FLOOR(CAST(SUM(CAST(ROUND(value * 100) AS DECIMAL(38,0)))
      * 1000000 / COUNT(*) AS DECIMAL(38,6))) AS BIGINT) AS am
  FROM events GROUP BY 1, 2)
SELECT event_type,
  string_agg(bucket, ',' ORDER BY bucket) AS keys_csv,
  string_agg(mn, ',' ORDER BY bucket) AS mins_csv,
  string_agg(mx, ',' ORDER BY bucket) AS maxs_csv,
  string_agg(am, ',' ORDER BY bucket) AS avg_micros_csv
FROM p GROUP BY event_type ORDER BY event_type
"""


def q_gd_linreg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``stochasticLinearRegression`` re-expressed as
    DETERMINISTIC full-batch gradient descent: daily revenue (dollars)
    against the normalized day index, 5 unrolled GD steps at lr=0.5
    from w=(0,0). The loss gradient of linear least squares depends
    only on sufficient statistics (n, Σt, Σy, Σt², Σty, Σy²), so the
    facts are read ONCE — every iteration is pure scalar arithmetic on
    the single stats row, applied with the identical expression shape
    on both engines (bit-identical doubles; SGD's order-dependence is
    exactly what this formulation removes, and what makes it the
    100 TB-safe shape). Emits the per-iteration (w0, w1, mse) trace."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("decimal(38,0)")
        ).alias("cents")
    )
    b = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    # (19,0)/(10,0) operands keep every product inside DECIMAL(38,0) —
    # (38,0)×(38,0) silently falls back to DOUBLE in DuckDB (the
    # decimal-product-overflow trap from NOTES_r2)
    k = F.datediff(F.col("day"), F.col("d0")).cast("decimal(10,0)")
    y = F.col("cents").cast("decimal(19,0)")
    stats = (
        daily.crossJoin(F.broadcast(b))
        .select(
            k.alias("k"),
            y.alias("y"),
            F.datediff(F.col("d1"), F.col("d0"))
            .cast("double")
            .alias("dd"),
        )
        .agg(
            F.count("*").cast("double").alias("n"),
            F.max("dd").alias("dd"),
            F.sum("k").cast("double").alias("sk"),
            F.sum(F.col("y")).cast("double").alias("sy_c"),
            F.sum(F.col("k") * F.col("k")).cast("double").alias("skk"),
            F.sum(F.col("k") * F.col("y")).cast("double").alias("sky_c"),
            F.sum(F.col("y") * F.col("y")).cast("double").alias("syy_c"),
        )
    )
    # derived double stats: t = k/dd (normalized), y in dollars
    s = stats.select(
        "n",
        (F.col("sk") / F.col("dd")).alias("st"),
        (F.col("sy_c") / F.lit(100.0)).alias("sy"),
        (F.col("skk") / (F.col("dd") * F.col("dd"))).alias("stt"),
        (F.col("sky_c") / (F.col("dd") * F.lit(100.0))).alias("sty"),
        (F.col("syy_c") / F.lit(10000.0)).alias("syy"),
    )
    # unrolled GD: identical textual updates on both engines
    for i in range(6):
        if i == 0:
            s = s.withColumn("w0", F.expr("0.0")).withColumn(
                "w1", F.expr("0.0")
            )
        else:
            s = (
                s.withColumn(
                    "w0n",
                    F.expr("w0 - 0.5 * (2.0 * (w0 * n + w1 * st - sy) / n)"),
                )
                .withColumn(
                    "w1n",
                    F.expr(
                        "w1 - 0.5 * (2.0 * (w0 * st + w1 * stt - sty) / n)"
                    ),
                )
                .drop("w0", "w1")
                .withColumnRenamed("w0n", "w0")
                .withColumnRenamed("w1n", "w1")
            )
        s = s.withColumn(
            f"trace_{i}",
            F.struct(
                F.lit(i).alias("iter"),
                F.col("w0").alias("w0"),
                F.col("w1").alias("w1"),
                F.expr(
                    "(w0 * w0 * n + w1 * w1 * stt + syy + 2.0 * w0 * w1 * st"
                    " - 2.0 * w0 * sy - 2.0 * w1 * sty) / n"
                ).alias("mse"),
            ),
        )
    traced = s.select(
        F.explode(F.array(*[F.col(f"trace_{i}") for i in range(6)])).alias(
            "t"
        )
    )
    # mse is ~1e14 (dollars²): ROUND(double, 4) is lossy in DuckDB at
    # that magnitude (×1e4 exceeds exact-integer double range), so the
    # trace reports FLOOR(mse/1e6) — an exact integer on both engines
    return traced.select(
        F.col("t.iter").alias("iter"),
        F.round("t.w0", 6).alias("w0"),
        F.round("t.w1", 6).alias("w1"),
        F.floor(F.col("t.mse") / F.lit(1000000.0))
        .cast("bigint")
        .alias("mse_mega"),
    ).orderBy("iter")


_GD_LINREG_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
    SUM(CAST(ROUND(o_totalprice * 100) AS DECIMAL(38,0))) AS cents
  FROM orders GROUP BY 1),
b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
raw AS (
  -- (19,0)/(10,0) operands keep every product inside DECIMAL(38,0);
  -- (38,0)x(38,0) silently degrades to DOUBLE in DuckDB
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(MAX(date_diff('day', d0, d1)) AS DOUBLE) AS dd,
    CAST(SUM(CAST(date_diff('day', d0, day) AS DECIMAL(10,0))) AS DOUBLE)
      AS sk,
    CAST(SUM(CAST(cents AS DECIMAL(19,0))) AS DOUBLE) AS sy_c,
    CAST(SUM(CAST(date_diff('day', d0, day) AS DECIMAL(10,0))
             * CAST(date_diff('day', d0, day) AS DECIMAL(10,0)))
         AS DOUBLE) AS skk,
    CAST(SUM(CAST(date_diff('day', d0, day) AS DECIMAL(10,0))
             * CAST(cents AS DECIMAL(19,0)))
         AS DOUBLE) AS sky_c,
    CAST(SUM(CAST(cents AS DECIMAL(19,0)) * CAST(cents AS DECIMAL(19,0)))
         AS DOUBLE) AS syy_c
  FROM daily, b),
s AS (
  SELECT n, sk / dd AS st, sy_c / 100.0 AS sy,
    skk / (dd * dd) AS stt, sky_c / (dd * 100.0) AS sty,
    syy_c / 10000.0 AS syy
  FROM raw),
it0 AS (SELECT *, 0.0 AS w0, 0.0 AS w1 FROM s),
-- nw0/nw1 avoid DuckDB's lateral-alias shadowing: both updates must
-- read the PREVIOUS iteration's (w0, w1), exactly like the Spark twin
it1 AS (SELECT n, st, sy, stt, sty, syy,
  w0 - 0.5 * (2.0 * (w0 * n + w1 * st - sy) / n) AS nw0,
  w1 - 0.5 * (2.0 * (w0 * st + w1 * stt - sty) / n) AS nw1 FROM it0),
it1r AS (SELECT n, st, sy, stt, sty, syy, nw0 AS w0, nw1 AS w1 FROM it1),
it2 AS (SELECT n, st, sy, stt, sty, syy,
  w0 - 0.5 * (2.0 * (w0 * n + w1 * st - sy) / n) AS nw0,
  w1 - 0.5 * (2.0 * (w0 * st + w1 * stt - sty) / n) AS nw1 FROM it1r),
it2r AS (SELECT n, st, sy, stt, sty, syy, nw0 AS w0, nw1 AS w1 FROM it2),
it3 AS (SELECT n, st, sy, stt, sty, syy,
  w0 - 0.5 * (2.0 * (w0 * n + w1 * st - sy) / n) AS nw0,
  w1 - 0.5 * (2.0 * (w0 * st + w1 * stt - sty) / n) AS nw1 FROM it2r),
it3r AS (SELECT n, st, sy, stt, sty, syy, nw0 AS w0, nw1 AS w1 FROM it3),
it4 AS (SELECT n, st, sy, stt, sty, syy,
  w0 - 0.5 * (2.0 * (w0 * n + w1 * st - sy) / n) AS nw0,
  w1 - 0.5 * (2.0 * (w0 * st + w1 * stt - sty) / n) AS nw1 FROM it3r),
it4r AS (SELECT n, st, sy, stt, sty, syy, nw0 AS w0, nw1 AS w1 FROM it4),
it5 AS (SELECT n, st, sy, stt, sty, syy,
  w0 - 0.5 * (2.0 * (w0 * n + w1 * st - sy) / n) AS nw0,
  w1 - 0.5 * (2.0 * (w0 * st + w1 * stt - sty) / n) AS nw1 FROM it4r),
it5r AS (SELECT n, st, sy, stt, sty, syy, nw0 AS w0, nw1 AS w1 FROM it5),
tr AS (
  SELECT 0 AS iter, * FROM it0 UNION ALL SELECT 1, * FROM it1r
  UNION ALL SELECT 2, * FROM it2r UNION ALL SELECT 3, * FROM it3r
  UNION ALL SELECT 4, * FROM it4r UNION ALL SELECT 5, * FROM it5r)
SELECT iter, ROUND(w0, 6) AS w0, ROUND(w1, 6) AS w1,
  CAST(FLOOR((w0 * w0 * n + w1 * w1 * stt + syy + 2.0 * w0 * w1 * st
         - 2.0 * w0 * sy - 2.0 * w1 * sty) / n / 1000000.0) AS BIGINT)
    AS mse_mega
FROM tr ORDER BY iter
"""


def q_sequence_match_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch`` parity for the three pattern
    classes: any-order '(?1).*(?2)' (a view EVENTUALLY followed by a
    purchase), adjacency '(?1)(?2)' (immediately followed), and the
    time-conditioned '(?1)(?t<=3600)(?2)' (within an hour). Each user's
    stream is one sorted array (total order ts, event_id — built by a
    single groupBy; no windows), the matchers are row-local array
    lambdas, and the report aggregates user counts per pattern. The
    only shuffle is the per-user collect — the same state shape
    sessionization uses at 100 TB."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        F.struct(
            F.unix_timestamp("ts").alias("s"),
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("t"),
        ).alias("kv"),
    )
    per = base.groupBy("user_id").agg(
        F.sort_array(F.collect_list("kv")).alias("kv")
    )
    t = F.transform(F.col("kv"), lambda x: x["t"])
    s = F.transform(F.col("kv"), lambda x: x["s"])
    n = F.size("kv")
    d = per.select("user_id", t.alias("t"), s.alias("s"), n.alias("n"))
    fv = F.array_position(F.col("t"), "view")
    lp_rev = F.array_position(F.reverse(F.col("t")), "purchase")
    lp = F.when(lp_rev > 0, F.col("n") + 1 - lp_rev).otherwise(F.lit(0))
    m_any = (fv > 0) & (lp > fv)
    idx = F.sequence(F.lit(1), F.greatest(F.col("n") - 1, F.lit(1)))
    m_adj = F.when(
        F.col("n") >= 2,
        F.exists(
            idx,
            lambda i: (F.element_at(F.col("t"), i) == "view")
            & (F.element_at(F.col("t"), i + 1) == "purchase"),
        ),
    ).otherwise(F.lit(False))
    m_time = F.exists(
        F.sequence(F.lit(1), F.col("n")),
        lambda i: (F.element_at(F.col("t"), i) == "view")
        & F.exists(
            F.sequence(
                F.least(i + 1, F.col("n")), F.col("n")
            ),
            lambda j: (j > i)
            & (F.element_at(F.col("t"), j) == "purchase")
            & (
                F.element_at(F.col("s"), j) - F.element_at(F.col("s"), i)
                <= 3600
            ),
        ),
    )
    flags = d.select(
        m_any.cast("int").alias("a"),
        m_adj.cast("int").alias("b"),
        m_time.cast("int").alias("c"),
    )
    return flags.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("a").cast("bigint").alias("n_match_any"),
        F.sum("b").cast("bigint").alias("n_match_adjacent"),
        F.sum("c").cast("bigint").alias("n_match_within_1h"),
    )


_SEQ_MATCH_SQL = """
WITH per AS (
  -- FLOOR(epoch()) matches Spark's unix_timestamp (second-floored);
  -- ordering by raw epoch micros would diverge on same-second ties
  SELECT user_id,
    list(event_type ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id)
      AS t,
    list(CAST(FLOOR(epoch(ts)) AS BIGINT)
         ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id) AS s,
    COUNT(*) AS n
  FROM events GROUP BY 1),
f AS (
  SELECT user_id, n,
    list_position(t, 'view') AS fv,
    CASE WHEN list_position(list_reverse(t), 'purchase') > 0
         THEN n + 1 - list_position(list_reverse(t), 'purchase')
         ELSE 0 END AS lp,
    CASE WHEN n >= 2 THEN len(list_filter(generate_series(1, n - 1),
      i -> t[i] = 'view' AND t[i + 1] = 'purchase')) > 0
      ELSE FALSE END AS m_adj,
    len(list_filter(generate_series(1, n),
      i -> t[i] = 'view' AND len(list_filter(generate_series(i + 1, n),
        j -> t[j] = 'purchase' AND s[j] - s[i] <= 3600)) > 0)) > 0
      AS m_time
  FROM per)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(CASE WHEN fv > 0 AND lp > fv THEN 1 ELSE 0 END) AS BIGINT)
    AS n_match_any,
  CAST(SUM(CASE WHEN m_adj THEN 1 ELSE 0 END) AS BIGINT)
    AS n_match_adjacent,
  CAST(SUM(CASE WHEN m_time THEN 1 ELSE 0 END) AS BIGINT)
    AS n_match_within_1h
FROM f
"""


def q_entropy_by_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``entropy()`` aggregate parity over four categorical
    columns (order priority/status, market segment, return flag):
    Shannon entropy in bits, the distinct count, and the normalized
    entropy H/log2(k). Each column is one count-by-value aggregation
    (map-side combinable; the value domains are tiny), entropies are
    folded from exact integer counts with the identical -Σ(c/n)·log2
    expression, rounded to 1e-6. The four per-column frames union into
    one report."""
    frames = []
    specs = [
        ("orders", "o_orderpriority", "orders.o_orderpriority"),
        ("orders", "o_orderstatus", "orders.o_orderstatus"),
        ("customer", "c_mktsegment", "customer.c_mktsegment"),
        ("lineitem", "l_returnflag", "lineitem.l_returnflag"),
    ]
    for tbl, col, label in specs:
        df = _t(spark, sf_dir, tbl)
        counts = df.groupBy(F.col(col).alias("v")).agg(
            F.count("*").alias("c")
        )
        agg = counts.agg(
            F.sum("c").alias("n"),
            F.count("*").alias("k"),
            F.collect_list(F.struct("v", "c")).alias("kv"),
        )
        p = lambda x: x["c"].cast("double") / F.col("n")  # noqa: E731
        ent = -F.aggregate(
            F.sort_array(F.col("kv")),
            F.lit(0.0),
            lambda acc, x: acc + p(x) * F.log2(p(x)),
        )
        frames.append(
            agg.select(
                F.lit(label).alias("column_name"),
                F.col("n").cast("bigint").alias("n_rows"),
                F.col("k").cast("bigint").alias("n_distinct"),
                F.round(ent, 6).alias("entropy_bits"),
                F.round(ent / F.log2(F.col("k").cast("double")), 6).alias(
                    "norm_entropy"
                ),
            )
        )
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out.orderBy("column_name")


def _column_entropy_sql() -> str:
    specs = [
        ("orders", "o_orderpriority", "orders.o_orderpriority"),
        ("orders", "o_orderstatus", "orders.o_orderstatus"),
        ("customer", "c_mktsegment", "customer.c_mktsegment"),
        ("lineitem", "l_returnflag", "lineitem.l_returnflag"),
    ]
    parts = []
    for tbl, col, label in specs:
        parts.append(f"""
SELECT '{label}' AS column_name, CAST(n AS BIGINT) AS n_rows,
  CAST(k AS BIGINT) AS n_distinct,
  ROUND(-list_sum(list_transform(kv,
    x -> (x.c::DOUBLE / n) * log2(x.c::DOUBLE / n))), 6) AS entropy_bits,
  ROUND(-list_sum(list_transform(kv,
    x -> (x.c::DOUBLE / n) * log2(x.c::DOUBLE / n)))
    / log2(k::DOUBLE), 6) AS norm_entropy
FROM (
  SELECT SUM(c) AS n, COUNT(*) AS k,
    list(struct_pack(v := v, c := c) ORDER BY v, c) AS kv
  FROM (SELECT {col} AS v, COUNT(*) AS c FROM {tbl} GROUP BY 1))""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY column_name"


_COLUMN_ENTROPY_SQL = _column_entropy_sql()


def q_substring_search_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse string-search function family — ``position``,
    ``countSubstrings``, ``hasToken``, ``startsWith`` / ``endsWith`` —
    per document against fixed needles. Occurrence counting uses the
    replace-length identity (no regex engine in the hot path except the
    word-boundary token probe); every expression is row-local inside
    codegen. The needle set is a compile-time constant, the 100 TB shape
    of a blocklist/keyword scan."""
    docs = _t(spark, sf_dir, "documents")
    text = F.col("text")
    n_data = (
        (F.length(text) - F.length(F.regexp_replace(text, "data", "")))
        / F.lit(4)
    ).cast("bigint")
    return docs.select(
        "doc_id",
        F.locate("data", text).cast("bigint").alias("pos_data"),
        n_data.alias("n_data"),
        text.rlike(r"\bspark\b").cast("int").alias("has_token_spark"),
        F.col("text").startswith("the ").cast("int").alias("starts_the"),
        F.col("text").endswith("join").cast("int").alias("ends_join"),
    ).orderBy("doc_id")


_SUBSTRING_SEARCH_SQL = r"""
SELECT doc_id,
  CAST(strpos(text, 'data') AS BIGINT) AS pos_data,
  CAST((length(text) - length(replace(text, 'data', ''))) / 4 AS BIGINT)
    AS n_data,
  CAST(regexp_matches(text, '\bspark\b') AS INT) AS has_token_spark,
  CAST(starts_with(text, 'the ') AS INT) AS starts_the,
  CAST(ends_with(text, 'join') AS INT) AS ends_join
FROM documents ORDER BY doc_id
"""


def q_transform_mapping_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``transform(x, from, to, default)`` + ``multiIf``
    parity: order priorities map to urgency weights through a literal
    value map (default 10), order totals tier through a multiIf
    cascade; the report is the per-month weighted urgency score and
    tier census. The mapping is a row-local CASE chain (what Catalyst
    folds transform() to anyway); one month-keyed aggregation."""
    o = _t(spark, sf_dir, "orders")
    weight = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 100)
        .when(F.col("o_orderpriority") == "2-HIGH", 50)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 25)
        .otherwise(10)
    )
    tier = (
        F.when(F.col("o_totalprice") >= 300000, "jumbo")
        .when(F.col("o_totalprice") >= 150000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
    )
    return (
        o.select(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("yyyymm"),
            weight.alias("w"),
            tier.alias("tier"),
        )
        .groupBy("yyyymm")
        .agg(
            F.sum("w").cast("bigint").alias("urgency_score"),
            F.sum(F.when(F.col("tier") == "jumbo", 1).otherwise(0))
            .cast("bigint")
            .alias("n_jumbo"),
            F.sum(F.when(F.col("tier") == "large", 1).otherwise(0))
            .cast("bigint")
            .alias("n_large"),
            F.sum(F.when(F.col("tier") == "medium", 1).otherwise(0))
            .cast("bigint")
            .alias("n_medium"),
            F.sum(F.when(F.col("tier") == "small", 1).otherwise(0))
            .cast("bigint")
            .alias("n_small"),
        )
        .orderBy("yyyymm")
    )


_TRANSFORM_MAP_SQL = """
SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
    AS yyyymm,
  CAST(SUM(CASE o_orderpriority WHEN '1-URGENT' THEN 100
    WHEN '2-HIGH' THEN 50 WHEN '3-MEDIUM' THEN 25 ELSE 10 END) AS BIGINT)
    AS urgency_score,
  CAST(SUM(CASE WHEN o_totalprice >= 300000 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_jumbo,
  CAST(SUM(CASE WHEN o_totalprice >= 150000 AND o_totalprice < 300000
    THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
  CAST(SUM(CASE WHEN o_totalprice >= 50000 AND o_totalprice < 150000
    THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
  CAST(SUM(CASE WHEN o_totalprice < 50000 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_small
FROM orders GROUP BY 1 ORDER BY yyyymm
"""


def q_array_join_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``LEFT ARRAY JOIN`` + ``arrayEnumerate`` parity: each
    document's first-5 token list explodes WITH positions, empty lists
    keep their row (position NULL — the LEFT variant), then a
    per-position census: docs reaching that position and the
    lexicographically-smallest most-frequent token (exact argmin over
    (−count, token)). posexplode_outer is the Spark spelling of LEFT
    ARRAY JOIN with arrayEnumerate; the census is two tiny keyed
    aggregations."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.slice(TX.tokens(F.col("text")), 1, 5)
    ex = docs.select(
        "doc_id", F.posexplode_outer(toks).alias("pos0", "tok")
    ).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "tok"
    )
    per_tok = ex.where(F.col("pos").isNotNull()).groupBy("pos", "tok").agg(
        F.count("*").alias("c")
    )
    top = (
        per_tok.groupBy("pos")
        .agg(
            F.sum("c").cast("bigint").alias("n_docs"),
            F.min_by(
                F.col("tok"), F.struct((-F.col("c")).alias("nc"), F.col("tok"))
            ).alias("top_token"),
            F.max("c").cast("bigint").alias("top_count"),
        )
    )
    null_rows = ex.where(F.col("pos").isNull()).agg(
        F.count("*").cast("bigint").alias("n_empty_docs")
    )
    return (
        top.crossJoin(F.broadcast(null_rows))
        .select("pos", "n_docs", "top_token", "top_count", "n_empty_docs")
        .orderBy("pos")
    )


_ARRAY_JOIN_POS_SQL = f"""
WITH t AS (SELECT doc_id, list_slice({_TOKS_SQL}, 1, 5) AS toks
           FROM documents),
ex AS (
  SELECT doc_id,
    CASE WHEN len(toks) = 0 THEN NULL ELSE u.i END AS pos,
    CASE WHEN len(toks) = 0 THEN NULL ELSE toks[u.i] END AS tok
  FROM t LEFT JOIN LATERAL unnest(generate_series(1, len(toks))) AS u(i)
    ON TRUE),
per_tok AS (
  SELECT pos, tok, COUNT(*) AS c FROM ex WHERE pos IS NOT NULL
  GROUP BY 1, 2),
top AS (
  SELECT pos, CAST(tot AS BIGINT) AS n_docs, tok AS top_token,
    CAST(c AS BIGINT) AS top_count
  FROM (
    SELECT pos, tok, c,
      SUM(c) OVER (PARTITION BY pos) AS tot,
      ROW_NUMBER() OVER (PARTITION BY pos ORDER BY c DESC, tok) AS rn
    FROM per_tok)
  WHERE rn = 1),
nulls AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_empty_docs FROM ex
  WHERE pos IS NULL)
SELECT pos, n_docs, top_token, top_count, n_empty_docs
FROM top, nulls ORDER BY pos
"""


def q_avg_weighted_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``avgWeighted`` + ``covarPop``/``covarSamp`` parity
    per part brand: the quantity-weighted mean extended price (exact:
    decimal Σ(w·x)/Σw in cents), and the population/sample covariance
    of (quantity, price-cents) from one exact-decimal sufficient-stats
    pass — n, Σq, Σp, Σqp in DECIMAL, covariance assembled in double
    with the identical expression on both engines. One fact aggregation
    keyed by the ~25-value brand dimension; the broadcast part join is
    the only other exchange."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    q = F.col("l_quantity").cast("decimal(19,0)")
    pc = F.round(F.col("l_extendedprice") * 100).cast("decimal(19,0)")
    m = j.groupBy("p_brand").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(q).cast("double").alias("sq"),
        F.sum(pc).cast("double").alias("sp"),
        F.sum(q * pc).cast("double").alias("sqp"),
        F.sum(q * q).cast("double").alias("sqq"),
    )
    covp = (F.col("sqp") / F.col("n")) - (
        F.col("sq") / F.col("n")
    ) * (F.col("sp") / F.col("n"))
    return m.select(
        "p_brand",
        F.col("n").cast("bigint").alias("n_lines"),
        F.round(F.col("sqp") / F.col("sq") / 100.0, 6).alias(
            "avg_weighted_price"
        ),
        F.round(covp / 100.0, 6).alias("covar_pop"),
        F.round(
            covp * F.col("n") / (F.col("n") - 1.0) / 100.0, 6
        ).alias("covar_samp"),
    ).orderBy("p_brand")


_AVG_WEIGHTED_SQL = """
WITH m AS (
  SELECT p_brand, CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(19,0))) AS DOUBLE) AS sq,
    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(19,0)))
         AS DOUBLE) AS sp,
    CAST(SUM(CAST(l_quantity AS DECIMAL(19,0))
             * CAST(ROUND(l_extendedprice * 100) AS DECIMAL(19,0)))
         AS DOUBLE) AS sqp,
    CAST(SUM(CAST(l_quantity AS DECIMAL(19,0))
             * CAST(l_quantity AS DECIMAL(19,0))) AS DOUBLE) AS sqq
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1)
SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
  ROUND(sqp / sq / 100.0, 6) AS avg_weighted_price,
  ROUND(((sqp / n) - (sq / n) * (sp / n)) / 100.0, 6) AS covar_pop,
  ROUND(((sqp / n) - (sq / n) * (sp / n)) * n / (n - 1.0) / 100.0, 6)
    AS covar_samp
FROM m ORDER BY p_brand
"""


def q_integer_division_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse integer-arithmetic parity — ``intDiv`` (truncates
    toward zero), ``modulo`` (sign of the dividend), and
    ``positiveModulo`` — exercised on a signed value (props.k − 50,
    divisor 7). Cross-engine division semantics are a classic silent
    divergence (floor- vs trunc-division); both sides here spell the
    SAME explicit trunc/pmod formulas, and the report aggregates per
    event type so any row-level disagreement shifts a sum. Row-local
    arithmetic, one aggregation."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint") - 50
    d = F.lit(7)
    # trunc-toward-zero division and C-style remainder (both match
    # Spark's native `div`/`%`; spelled explicitly for cross-engine
    # clarity), plus the always-positive modulo
    # FLOOR(|k|/d) == trunc toward zero for the non-negative numerator;
    # spelled with explicit FLOOR because DuckDB's double->BIGINT CAST
    # rounds (Spark's truncates)
    tdiv = F.floor(F.abs(k) / d).cast("bigint") * F.when(k < 0, -1).otherwise(
        1
    )
    trem = k - tdiv * d
    pmod = ((k % d) + d) % d
    b = ev.select(
        "event_type",
        k.alias("k"),
        tdiv.alias("tdiv"),
        trem.alias("trem"),
        pmod.alias("pmod"),
    )
    return (
        b.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.when(F.col("k") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_negative"),
            F.sum("tdiv").cast("bigint").alias("sum_intdiv"),
            F.sum("trem").cast("bigint").alias("sum_modulo"),
            F.sum("pmod").cast("bigint").alias("sum_positive_modulo"),
            F.min("trem").cast("bigint").alias("min_modulo"),
            F.min("pmod").cast("bigint").alias("min_positive_modulo"),
        )
        .orderBy("event_type")
    )


_INT_DIV_SQL = """
WITH b AS (
  SELECT event_type,
    CAST(json_extract(props, '$.k') AS BIGINT) - 50 AS k
  FROM events),
c AS (
  SELECT event_type, k,
    CAST(FLOOR(abs(k) / 7) AS BIGINT)
      * (CASE WHEN k < 0 THEN -1 ELSE 1 END) AS tdiv,
    k - CAST(FLOOR(abs(k) / 7) AS BIGINT)
      * (CASE WHEN k < 0 THEN -1 ELSE 1 END) * 7 AS trem,
    ((k % 7) + 7) % 7 AS pmod
  FROM b)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CASE WHEN k < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
  CAST(SUM(tdiv) AS BIGINT) AS sum_intdiv,
  CAST(SUM(trem) AS BIGINT) AS sum_modulo,
  CAST(SUM(pmod) AS BIGINT) AS sum_positive_modulo,
  CAST(MIN(trem) AS BIGINT) AS min_modulo,
  CAST(MIN(pmod) AS BIGINT) AS min_positive_modulo
FROM c GROUP BY event_type ORDER BY event_type
"""


def q_asof_join_directions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional as-of joins (pandas merge_asof / QuestDB parity —
    ClickHouse ASOF JOIN is the backward case): every purchase event is
    matched to the same user's nearest view event backward, forward,
    and nearest-with-1h-tolerance, via the bucketed two-pass operator
    (operators/asof.py — forward is the backward pass on the
    time-negated axis, nearest is both passes + smaller-gap pick with
    backward ties). The report is a single checksum row: match counts
    and exact id sums per direction plus the tie census, so any
    row-level disagreement shifts a sum. The DuckDB twin uses native
    ASOF JOIN both ways."""
    ev = _t(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    v = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    r = AsOf.asof_join_directional(
        p, v, "ts", "ts", "view_id", keys=["user_id"],
        direction="backward", out_col="b_id", out_ts_col="b_ts",
    )
    r = AsOf.asof_join_directional(
        r, v, "ts", "ts", "view_id", keys=["user_id"],
        direction="forward", out_col="f_id", out_ts_col="f_ts",
    )
    # nearest derives from the two matches already attached (the same
    # smaller-gap/backward-tie/tolerance algebra the operator's
    # direction='nearest' runs — which is pytest-pinned separately) so
    # the query costs exactly two as-of passes, not four
    gb = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("b_ts"))
    gf = F.unix_micros(F.col("f_ts")) - F.unix_micros(F.col("ts"))
    pick_b = F.col("b_id").isNotNull() & (
        F.col("f_id").isNull() | (gb <= gf)
    )
    n0_id = F.when(pick_b, F.col("b_id")).otherwise(F.col("f_id"))
    n0_ts = F.when(pick_b, F.col("b_ts")).otherwise(F.col("f_ts"))
    n_id = F.when(
        n0_id.isNotNull()
        & (
            F.abs(F.unix_micros(F.col("ts")) - F.unix_micros(n0_ts))
            <= 3600 * 1_000_000
        ),
        n0_id,
    )
    r = r.withColumn("n_id", n_id)
    return r.agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        F.count("b_id").cast("bigint").alias("n_backward"),
        F.count("f_id").cast("bigint").alias("n_forward"),
        F.count("n_id").cast("bigint").alias("n_nearest_1h"),
        F.sum("b_id").cast("bigint").alias("sum_backward_ids"),
        F.sum("f_id").cast("bigint").alias("sum_forward_ids"),
        F.sum("n_id").cast("bigint").alias("sum_nearest_ids"),
        F.sum(
            F.when(
                F.col("n_id").isNotNull() & (F.col("n_id") == F.col("b_id")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_nearest_took_backward"),
    )


_ASOF_DIRECTIONS_SQL = """
WITH p AS (
  SELECT user_id, ts, event_id FROM events
  WHERE event_type = 'purchase'),
v AS (
  SELECT user_id, ts AS vts, event_id AS view_id FROM events
  WHERE event_type = 'view'),
b AS (
  SELECT p.event_id, p.ts, v.view_id AS b_id, v.vts AS b_ts
  FROM p ASOF LEFT JOIN v
    ON p.user_id = v.user_id AND p.ts >= v.vts),
f AS (
  SELECT p.event_id, v.view_id AS f_id, v.vts AS f_ts
  FROM p ASOF LEFT JOIN v
    ON p.user_id = v.user_id AND p.ts <= v.vts),
j AS (
  SELECT b.event_id, b.ts, b.b_id, b.b_ts, f.f_id, f.f_ts
  FROM b JOIN f ON b.event_id = f.event_id),
n AS (
  SELECT *,
    CASE WHEN b_id IS NOT NULL AND (f_id IS NULL OR
        epoch_us(ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(ts))
      THEN b_id ELSE f_id END AS n0_id,
    CASE WHEN b_id IS NOT NULL AND (f_id IS NULL OR
        epoch_us(ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(ts))
      THEN b_ts ELSE f_ts END AS n0_ts
  FROM j),
near AS (
  SELECT *, CASE WHEN n0_id IS NOT NULL
      AND abs(epoch_us(ts) - epoch_us(n0_ts)) <= 3600000000
    THEN n0_id END AS n_id
  FROM n)
SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
  CAST(COUNT(b_id) AS BIGINT) AS n_backward,
  CAST(COUNT(f_id) AS BIGINT) AS n_forward,
  CAST(COUNT(n_id) AS BIGINT) AS n_nearest_1h,
  CAST(SUM(b_id) AS BIGINT) AS sum_backward_ids,
  CAST(SUM(f_id) AS BIGINT) AS sum_forward_ids,
  CAST(SUM(n_id) AS BIGINT) AS sum_nearest_ids,
  CAST(SUM(CASE WHEN n_id IS NOT NULL AND n_id = b_id THEN 1 ELSE 0 END)
       AS BIGINT) AS n_nearest_took_backward
FROM near
"""


def q_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (the rsync/LBFS boundary trick
    LLM pipelines use against SHIFTED duplicate text, where fixed-size
    or paragraph chunking misses): a rolling 3-token md5 picks chunk
    boundaries (hash % 16 == 0 → expected ~16-token chunks), chunks are
    re-hashed, and the per-source report counts chunk instances,
    distinct chunks, the dup ratio (ppm), and chunks shared across ≥2
    documents. Boundary detection and chunk assembly are row-local
    array expressions; the only shuffles carry (hash, doc) pairs — the
    same fingerprint-only-shuffle shape as exact dedup."""
    docs = _t(spark, sf_dir, "documents")
    t = TX.tokens(F.col("text"))
    d = docs.select("doc_id", "source", t.alias("t"), F.size(t).alias("n"))
    tri = lambda i: F.concat_ws(  # noqa: E731
        " ",
        F.element_at(F.col("t"), i - 2),
        F.element_at(F.col("t"), i - 1),
        F.element_at(F.col("t"), i),
    )
    is_bnd = (
        lambda i: F.conv(F.substring(F.md5(tri(i)), 1, 8), 16, 10)  # noqa: E731
        .cast("bigint")
        % 16
        == 0
    )
    bnds = F.when(
        F.col("n") >= 3,
        F.filter(F.sequence(F.lit(3), F.col("n")), is_bnd),
    ).otherwise(F.array().cast("array<int>"))
    d = d.withColumn("bnds", bnds)
    starts = F.concat(
        F.array(F.lit(1)), F.transform(F.col("bnds"), lambda b: b + 1)
    )
    ends = F.concat(F.col("bnds"), F.array(F.col("n")))
    chunks = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.size(starts)),
            lambda j: F.concat_ws(
                " ",
                F.slice(
                    F.col("t"),
                    F.element_at(starts, j),
                    F.greatest(
                        F.element_at(ends, j) - F.element_at(starts, j) + 1,
                        F.lit(0),
                    ),
                ),
            ),
        ),
        lambda c: c != F.lit(""),
    )
    ex = d.select(
        "doc_id", "source", F.explode(chunks).alias("chunk")
    ).select("doc_id", "source", F.md5("chunk").alias("h"))
    multi = (
        ex.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h", F.lit(1).alias("is_multi"))
    )
    ex2 = ex.join(F.broadcast(multi), "h", "left")
    return (
        ex2.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.countDistinct("h").cast("bigint").alias("n_distinct"),
            F.expr(
                "(count(*) - count(distinct h)) * 1000000 div count(*)"
            )
            .cast("bigint")
            .alias("dup_ppm"),
            F.countDistinct(F.when(F.col("is_multi") == 1, F.col("h")))
            .cast("bigint")
            .alias("n_hashes_multi_doc"),
        )
        .orderBy("source")
    )


_CDC_CHUNK_SQL = f"""
WITH d AS (
  SELECT doc_id, source, {_TOKS_SQL} AS t, len({_TOKS_SQL}) AS n
  FROM documents),
b AS (
  SELECT doc_id, source, t, n,
    CASE WHEN n >= 3 THEN list_filter(generate_series(3, n),
      i -> ('0x' || substr(md5(t[i-2] || ' ' || t[i-1] || ' ' || t[i]),
            1, 8))::BIGINT % 16 = 0)
    ELSE [] END AS bnds
  FROM d),
c AS (
  SELECT doc_id, source,
    list_concat([1], list_transform(bnds, x -> x + 1)) AS starts,
    list_concat(bnds, [n]) AS ends, t
  FROM b),
ex AS (
  SELECT doc_id, source,
    md5(array_to_string(list_slice(t, starts[j], ends[j]), ' ')) AS h
  FROM c, unnest(generate_series(1, len(starts))) AS u(j)
  WHERE array_to_string(list_slice(t, starts[j], ends[j]), ' ') <> ''),
multi AS (
  SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM ex GROUP BY h)
  WHERE nd >= 2)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
  CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct,
  CAST((COUNT(*) - COUNT(DISTINCT h)) * 1000000 // COUNT(*) AS BIGINT)
    AS dup_ppm,
  CAST(COUNT(DISTINCT CASE WHEN h IN (SELECT h FROM multi) THEN h END)
       AS BIGINT) AS n_hashes_multi_doc
FROM ex GROUP BY source ORDER BY source
"""


def q_streaming_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming sliding-window top-k
    (streaming/topk.py): 6h windows sliding 3h, top-3 event types per
    window (count desc, type tie-break) — the same window()/rank
    expressions the watermarked stream runs, hash-gated here. The
    DuckDB twin derives each event's two covering windows from the 3h
    grid explicitly. Stateful count in the engine, bounded rank
    downstream — the 100 TB/day trending-topics shape."""
    from .streaming.topk import sliding_type_counts, topk_per_window

    ev = _t(spark, sf_dir, "events")
    counts = sliding_type_counts(ev)
    return (
        topk_per_window(counts, k=3)
        .select(
            F.col("window_start").cast("timestamp").alias("window_start"),
            "rnk",
            "event_type",
            "n",
        )
        .orderBy("window_start", "rnk")
    )


_STREAM_TOPK_SQL = """
WITH g AS (
  SELECT event_type,
    to_timestamp(CAST(FLOOR(epoch(ts) / 10800) * 10800 AS BIGINT))
      AT TIME ZONE 'UTC' AS g0,
    ts
  FROM events),
ex AS (
  SELECT event_type, g0 - INTERVAL 3 HOUR AS window_start FROM g
  UNION ALL
  SELECT event_type, g0 AS window_start FROM g),
c AS (
  SELECT window_start, event_type, COUNT(*) AS n
  FROM ex GROUP BY 1, 2),
r AS (
  SELECT window_start, event_type, n,
    ROW_NUMBER() OVER (PARTITION BY window_start
                       ORDER BY n DESC, event_type) AS rnk
  FROM c)
SELECT CAST(window_start AS TIMESTAMP) AS window_start,
  CAST(rnk AS BIGINT) AS rnk, event_type, CAST(n AS BIGINT) AS n
FROM r WHERE rnk <= 3 ORDER BY window_start, rnk
"""


def q_interval_length_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``intervalLengthSum`` parity: total length of the
    UNION of per-event intervals per event type (overlaps counted
    once). Each event spans [ts, ts + clamp(round(value), 1, 3600)]
    seconds. The classic sweep: sort by start, and each interval
    contributes max(0, end - max(start, running-max-of-prior-ends)) —
    one window pass, integer seconds, no interval explode (the naive
    second-level explode would be 3600x the rows; this is the shape
    that survives dense coverage at 100 TB). Both engines run the
    identical sweep."""
    ev = _t(spark, sf_dir, "events")
    dur = F.least(
        F.greatest(F.round("value").cast("bigint"), F.lit(1)), F.lit(3600)
    )
    s = F.floor(F.col("ts").cast("double")).cast("bigint")
    iv = ev.select("event_type", s.alias("s"), (s + dur).alias("e"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = F.greatest(
        F.col("e")
        - F.greatest(F.col("s"), F.coalesce(F.max("e").over(w), F.col("s"))),
        F.lit(0),
    )
    return (
        iv.select("event_type", contrib.alias("c"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_intervals"),
            F.sum("c").cast("bigint").alias("union_len_sec"),
        )
        .orderBy("event_type")
    )


_INTERVAL_LEN_SQL = """
WITH iv AS (
  SELECT event_type,
    CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
    CAST(FLOOR(epoch(ts)) AS BIGINT)
      + least(greatest(CAST(ROUND(value) AS BIGINT), 1), 3600) AS e
  FROM events),
c AS (
  SELECT event_type,
    greatest(e - greatest(s, COALESCE(MAX(e) OVER (
      PARTITION BY event_type ORDER BY s, e
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), s)), 0) AS c
  FROM iv)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_intervals,
  CAST(SUM(c) AS BIGINT) AS union_len_sec
FROM c GROUP BY event_type ORDER BY event_type
"""


def q_schema_evolution_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift ingestion (the 100 TB reality: datasets gain
    columns mid-life): two parquet generations are written to a
    tempdir — gen 1 (even order keys) without, gen 2 (odd keys) WITH a
    late-added priority column — and read back through ONE
    mergeSchema scan. The census pins: total rows survive, the merged
    schema is the union, gen-1 rows surface NULL (not garbage, not
    dropped) in the late column, and gen-2 values are intact. The twin
    recomputes every count from orders directly."""
    import tempfile

    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    with tempfile.TemporaryDirectory() as tmp:
        base.where(F.col("o_orderkey") % 2 == 0).write.parquet(tmp + "/gen1")
        o.where(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            F.col("o_orderpriority").alias("priority"),
        ).write.parquet(tmp + "/gen2")
        merged = (
            spark.read.option("mergeSchema", "true")
            .parquet(tmp + "/gen1", tmp + "/gen2")
        )
        out = merged.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.lit(len(merged.columns)).cast("bigint").alias("n_cols_merged"),
            F.sum(F.col("priority").isNull().cast("bigint"))
            .cast("bigint")
            .alias("n_null_priority"),
            F.countDistinct("priority").cast("bigint").alias("n_priorities"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        ).collect()[0]
    return spark.createDataFrame(
        [tuple(out)],
        "n_rows bigint, n_cols_merged bigint, n_null_priority bigint, "
        "n_priorities bigint, sum_cents bigint",
    )


_SCHEMA_EVO_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(3 AS BIGINT) AS n_cols_merged,
  CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_null_priority,
  CAST(COUNT(DISTINCT CASE WHEN o_orderkey % 2 = 1
    THEN o_orderpriority END) AS BIGINT) AS n_priorities,
  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS sum_cents
FROM orders
"""


def q_json_corrupt_records_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Malformed-input ingestion contract (the 100 TB reality: raw JSON
    feeds always contain garbage lines): a JSONL dataset is generated
    from documents with every doc_id % 10 == 0 line deliberately
    corrupted, read back through ONE PERMISSIVE scan with
    columnNameOfCorruptRecord, and the census pins: no line vanishes
    (valid + corrupt == total), corrupt lines surface in the quarantine
    column with NULL data fields, and valid-line values are intact.
    The twin recomputes every count from documents. FAILFAST/DROPMALFORMED
    are the same reader's other modes; PERMISSIVE-with-quarantine is
    the one that preserves auditability at scale."""
    import tempfile

    docs = _t(spark, sf_dir, "documents")
    line = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(F.lit("{corrupt "), F.col("doc_id").cast("string")),
    ).otherwise(
        F.to_json(
            F.struct(
                F.col("doc_id"),
                F.length("text").cast("bigint").alias("n_chars"),
            )
        )
    )
    with tempfile.TemporaryDirectory() as tmp:
        docs.select(line.alias("value")).write.mode("overwrite").text(
            tmp + "/feed"
        )
        parsed = (
            spark.read.schema(
                "doc_id long, n_chars long, _corrupt_record string"
            )
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(tmp + "/feed")
        )
        out = parsed.agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.col("_corrupt_record").isNotNull().cast("bigint"))
            .cast("bigint")
            .alias("n_corrupt"),
            F.sum(F.col("doc_id").isNotNull().cast("bigint"))
            .cast("bigint")
            .alias("n_valid"),
            F.sum(
                (
                    F.col("_corrupt_record").isNotNull()
                    & F.col("doc_id").isNull()
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("n_quarantined_nulled"),
            F.sum(F.coalesce("n_chars", F.lit(0)))
            .cast("bigint")
            .alias("sum_valid_chars"),
        ).collect()[0]
    return spark.createDataFrame(
        [tuple(out)],
        "n_lines bigint, n_corrupt bigint, n_valid bigint, "
        "n_quarantined_nulled bigint, sum_valid_chars bigint",
    )


_JSON_CORRUPT_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(SUM(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_corrupt,
  CAST(SUM(CASE WHEN doc_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_valid,
  CAST(SUM(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_quarantined_nulled,
  CAST(SUM(CASE WHEN doc_id % 10 <> 0 THEN LENGTH(text) ELSE 0 END)
    AS BIGINT) AS sum_valid_chars
FROM documents
"""


def q_gzip_text_ingest_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed text ingestion (ClickHouse reads .gz natively;
    forecast pipelines inherit logs this way): documents are written as
    FOUR gzip JSONL files and read back through one scan. The census
    pins row survival, value integrity, and that all four compressed
    files were actually opened. The SCALE caveat this query exists to
    document: gzip is NOT splittable — one task per .gz file regardless
    of size (pinned with a partition test in test_advice_r4.py), so a
    100 TB gz-landed feed must arrive as many files (or be transcoded
    to a splittable layout) before heavy processing."""
    import tempfile

    docs = _t(spark, sf_dir, "documents")
    line = F.to_json(
        F.struct(
            F.col("doc_id"), F.length("text").cast("bigint").alias("n_chars")
        )
    )
    with tempfile.TemporaryDirectory() as tmp:
        (
            docs.select(line.alias("value"))
            .repartition(4)
            .write.option("compression", "gzip")
            .text(tmp + "/feed")
        )
        back = (
            spark.read.schema("doc_id long, n_chars long")
            .json(tmp + "/feed")
            .select("doc_id", "n_chars", F.input_file_name().alias("f"))
        )
        out = back.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.countDistinct("f").cast("bigint").alias("n_gz_files"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.sum(
                F.when(F.col("f").endswith(".gz"), 0).otherwise(1)
            ).cast("bigint").alias("n_not_gz"),
        ).collect()[0]
    return spark.createDataFrame(
        [tuple(out)],
        "n_rows bigint, n_docs bigint, n_gz_files bigint, "
        "sum_chars bigint, n_not_gz bigint",
    )


_GZIP_INGEST_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(4 AS BIGINT) AS n_gz_files,
  CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_chars,
  CAST(0 AS BIGINT) AS n_not_gz
FROM documents
"""


def q_manifest_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase-commit custom sink, driver-gated: orders write through
    the jsonlsink Python DataSource (staged part files, atomic manifest
    swap), read back through the manifest, and the census pins row
    survival, key distinctness, value integrity, and that the manifest
    total equals what the tasks reported. A torn publish, a lost commit
    message, or a value-mangling serializer breaks the hash."""
    import json as _json
    import os as _os
    import tempfile

    from .sources import jsonl_sink

    jsonl_sink.register(spark)
    src = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    with tempfile.TemporaryDirectory() as tmp:
        target = tmp + "/sink"
        src.write.format("jsonlsink").option("path", target).mode(
            "append"
        ).save()
        with open(_os.path.join(target, jsonl_sink.MANIFEST)) as fh:
            man = _json.load(fh)
        back = jsonl_sink.read_manifest(
            spark, target, "o_orderkey long, cents long"
        )
        out = back.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct("o_orderkey").cast("bigint").alias("n_keys"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        ).collect()[0]
    return spark.createDataFrame(
        [
            (
                out.n_rows,
                out.n_keys,
                out.sum_cents,
                int(man["total_rows"]) == out.n_rows,
            )
        ],
        "n_rows bigint, n_keys bigint, sum_cents bigint, "
        "manifest_consistent boolean",
    )


_MANIFEST_SINK_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS sum_cents,
  true AS manifest_consistent
FROM orders
"""


def q_kafka_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka wire layer, driver-gated: events encode into the kafka
    source's fixed wire schema (binary JSON value, user-keyed
    partitions, event_id offsets) and parse back through the SAME
    expression layer the format("kafka") binding uses. The census pins
    lossless round-trip (row count, id set, exact value cents sum,
    microsecond timestamp fidelity) plus the broker invariants the
    double must honor (8 partitions, zero malformed)."""
    from .streaming.kafka_shape import events_to_wire, parse_events_payload

    ev = _t(spark, sf_dir, "events")
    parsed = parse_events_payload(events_to_wire(ev))
    return (
        parsed.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct("event_id").cast("bigint").alias("n_ids"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("sum_cents"),
            F.countDistinct(F.date_format("ts", "SSSSSS"))
            .cast("bigint")
            .alias("n_micro_patterns"),
            F.countDistinct("kafka_partition").cast("bigint").alias(
                "n_partitions"
            ),
            F.sum(F.col("event_id").isNull().cast("bigint"))
            .cast("bigint")
            .alias("n_malformed"),
        )
    )


_KAFKA_WIRE_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids,
  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
  CAST(COUNT(DISTINCT lpad(CAST(microsecond(ts) % 1000000 AS VARCHAR),
    6, '0')) AS BIGINT) AS n_micro_patterns,
  CAST(COUNT(DISTINCT user_id % 8) AS BIGINT) AS n_partitions,
  CAST(0 AS BIGINT) AS n_malformed
FROM events
"""


def _replay_closed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the REAL append-mode Structured Streaming query over the
    events parquet (availableNow replay) and return the drained memory
    sink: only windows the final watermark (max event ts - 1 day)
    closed are emitted — the production sink-mode semantics, not the
    complete-mode drain the replay tests use."""
    from .streaming.rollup import EVENTS_SCHEMA
    from .streaming.topk import sliding_type_counts

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    counts = sliding_type_counts(stream, watermark="1 day")
    name = "closed_counts_replay"
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("streaming replay did not finish in 300s")
    return spark.table(name)


def q_streaming_closed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-closed APPEND-mode output of the sliding-window count
    stream (streaming/topk.sliding_type_counts), hash-gated against a
    DuckDB twin (VERDICT r4 #8): a real availableNow replay runs the
    stateful query, and the emitted subset must equal the batch windows
    whose end is at or before max(ts) - 1 day — the exact watermark
    closure rule. A state-store bug, a wrong watermark column, or an
    eager/late emission changes the row set and breaks the hash."""
    drained = _replay_closed_counts(spark, sf_dir)
    return drained.select(
        F.col("window_start").cast("timestamp").alias("window_start"),
        F.col("window_end").cast("timestamp").alias("window_end"),
        "event_type",
        F.col("n").cast("bigint").alias("n"),
    ).orderBy("window_start", "event_type")


_STREAM_CLOSED_COUNTS_SQL = """
WITH g AS (
  SELECT event_type,
    CAST(to_timestamp(CAST(FLOOR(epoch(ts) / 10800) * 10800 AS BIGINT))
      AT TIME ZONE 'UTC' AS TIMESTAMP) AS g0
  FROM events),
ex AS (
  SELECT event_type, g0 - INTERVAL 3 HOUR AS window_start FROM g
  UNION ALL
  SELECT event_type, g0 AS window_start FROM g),
c AS (
  SELECT window_start, window_start + INTERVAL 6 HOUR AS window_end,
    event_type, COUNT(*) AS n
  FROM ex GROUP BY 1, 2, 3)
SELECT window_start, window_end, event_type, CAST(n AS BIGINT) AS n
FROM c
WHERE window_end <= (SELECT MAX(ts) - INTERVAL 1 DAY FROM events)
ORDER BY window_start, event_type
"""


def q_streaming_closed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per watermark-closed window over the APPEND-mode stream
    output (the production foreachBatch ranking stage running on what
    the engine actually emitted), hash-gated against the DuckDB window
    twin restricted to the same closed subset."""
    from .streaming.topk import topk_per_window

    drained = _replay_closed_counts(spark, sf_dir)
    return (
        topk_per_window(drained, k=3)
        .select(
            F.col("window_start").cast("timestamp").alias("window_start"),
            "rnk",
            "event_type",
            F.col("n").cast("bigint").alias("n"),
        )
        .orderBy("window_start", "rnk")
    )


_STREAM_CLOSED_TOPK_SQL = """
WITH g AS (
  SELECT event_type,
    CAST(to_timestamp(CAST(FLOOR(epoch(ts) / 10800) * 10800 AS BIGINT))
      AT TIME ZONE 'UTC' AS TIMESTAMP) AS g0
  FROM events),
ex AS (
  SELECT event_type, g0 - INTERVAL 3 HOUR AS window_start FROM g
  UNION ALL
  SELECT event_type, g0 AS window_start FROM g),
c AS (
  SELECT window_start, event_type, COUNT(*) AS n
  FROM ex GROUP BY 1, 2
  HAVING window_start + INTERVAL 6 HOUR
    <= (SELECT MAX(ts) - INTERVAL 1 DAY FROM events)),
r AS (
  SELECT window_start, event_type, n,
    ROW_NUMBER() OVER (PARTITION BY window_start
                       ORDER BY n DESC, event_type) AS rnk
  FROM c)
SELECT window_start, CAST(rnk AS BIGINT) AS rnk, event_type,
  CAST(n AS BIGINT) AS n
FROM r WHERE rnk <= 3 ORDER BY window_start, rnk
"""


# --------------------------------------------------------------------------
# streaming state at scale (r5): the forecast/dedup scale-proof treatment
# applied to the stateful streaming surface. SCALING.md claims "event-time
# TTL caps the store at the ACTIVE user population" — this makes the claim
# an oracle-checkable number: a deterministic 4,000-user corpus (cohort A
# goes idle on day 1, cohort B keeps streaming through day 6) replays
# through the real applyInPandasWithState sessionizer with a 1-day TTL, and
# the FINAL state-store row count (StreamingQueryProgress.stateOperators
# numRowsTotal) must equal |B| exactly — A's 2,000 states evicted by the
# watermark, never resident at the end. The emitted totals simultaneously
# hash-match exact batch sessionization of the same events in DuckDB.
# --------------------------------------------------------------------------

_SSB_USERS = 4_000          # cohort A = u < 2000 (idle after day 1), B = rest
_SSB_COHORT = 2_000
# per-user event epochs (u seconds added per user; relative gaps identical
# for every user, so session structure is uniform and exactly computable)
_SSB_DAY1 = [1704103200, 1704103800, 1704110400]   # 2024-01-01 10:00/10:10/12:00 UTC
_SSB_DAY5 = [1704448800, 1704449400]               # 2024-01-05 10:00/10:10 UTC
_SSB_DAY6 = [1704535200]                           # 2024-01-06 10:00 UTC


def _ssb_events(spark: SparkSession, epochs: list[int], b_only: bool) -> DataFrame:
    u = spark.range(_SSB_USERS).select(F.col("id").alias("user_id"))
    if b_only:
        u = u.filter(F.col("user_id") >= _SSB_COHORT)
    frames = [
        u.select(
            "user_id",
            F.timestamp_seconds(F.lit(int(e)) + F.col("user_id")).alias("ts"),
        )
        for e in epochs
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def q_streaming_state_bound_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming state-bound scale proof: real availableNow replay of the
    applyInPandasWithState sessionizer (gap 1800 s, event-time TTL 1 day)
    over the deterministic two-cohort corpus above, one micro-batch per
    staged file (mtime-ordered, maxFilesPerTrigger=1) so the watermark
    advances day1 → day5 → day6 and cohort A's 2,000 idle states are
    EVICTED in the day-6 batch. Emits one summary row: user/session/event
    totals recovered from the update-mode sink (per-user running maxima =
    final totals) plus the final state-store row count — which must equal
    the active cohort, 2,000, for the DuckDB twin's hash to match. The
    twin replays the session math exactly (epoch-integer lag-gap rule).
    The staged parquet dir and the memory-sink table are ephemeral: the
    summary is checkpointed, then both are torn down — repeated runs in
    one long session leak neither disk nor temp-view state."""
    import os
    import shutil
    import tempfile

    from .streaming.sessionize import sessionize_stream

    src = tempfile.mkdtemp(prefix="ssb_events_")
    name = "state_bound_audit_replay"
    try:
        staged: list[str] = []
        for i, (epochs, b_only) in enumerate(
            [(_SSB_DAY1, False), (_SSB_DAY5, True), (_SSB_DAY6, True)]
        ):
            before = set(os.listdir(src))
            _ssb_events(spark, epochs, b_only).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            new = [f for f in os.listdir(src) if f.endswith(".parquet") and f not in before]
            staged.extend(os.path.join(src, f) for f in new)
        # deterministic micro-batch order: FileStreamSource sorts by mtime
        base = 1_700_000_000
        for i, path in enumerate(staged):
            os.utime(path, (base + 10 * i, base + 10 * i))
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            sessionize_stream(stream, gap_seconds=1800, ttl_seconds=86_400)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("state-bound replay did not finish in 300s")
        progress = q.lastProgress
        state_rows = int(progress["stateOperators"][0]["numRowsTotal"])
        per_user = (
            spark.table(name)
            .groupBy("user_id")
            .agg(
                F.max("n_sessions").alias("n_sessions"),  # update-mode: monotone
                F.max("n_events").alias("n_events"),
            )
        )
        # materialize the 1-row summary so the sink table + staged files
        # can be dropped before returning the (lazy) result
        return per_user.agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("n_sessions").cast("bigint").alias("total_sessions"),
            F.sum("n_events").cast("bigint").alias("total_events"),
            F.lit(state_rows).cast("bigint").alias("state_rows_final"),
            F.lit(_SSB_USERS).cast("bigint").alias("state_rows_all_time"),
        ).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(name)
        shutil.rmtree(src, ignore_errors=True)


_STATE_BOUND_SQL = f"""
WITH u AS (SELECT i AS u FROM range({_SSB_USERS}) t(i)),
ev AS (
  SELECT u, {_SSB_DAY1[0]} + u AS ts FROM u
  UNION ALL SELECT u, {_SSB_DAY1[1]} + u FROM u
  UNION ALL SELECT u, {_SSB_DAY1[2]} + u FROM u
  UNION ALL SELECT u, {_SSB_DAY5[0]} + u FROM u WHERE u >= {_SSB_COHORT}
  UNION ALL SELECT u, {_SSB_DAY5[1]} + u FROM u WHERE u >= {_SSB_COHORT}
  UNION ALL SELECT u, {_SSB_DAY6[0]} + u FROM u WHERE u >= {_SSB_COHORT}),
s AS (
  SELECT u,
    CASE WHEN LAG(ts) OVER w IS NULL OR ts - LAG(ts) OVER w > 1800
         THEN 1 ELSE 0 END AS ns
  FROM ev WINDOW w AS (PARTITION BY u ORDER BY ts)),
per AS (SELECT u, SUM(ns) AS n_sessions, COUNT(*) AS n_events FROM s GROUP BY u)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(n_sessions) AS BIGINT) AS total_sessions,
  CAST(SUM(n_events) AS BIGINT) AS total_events,
  CAST({_SSB_COHORT} AS BIGINT) AS state_rows_final,
  CAST({_SSB_USERS} AS BIGINT) AS state_rows_all_time
FROM per
"""


def q_global_rank_price_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL RANK/DENSE_RANK parity through the DISTRIBUTED ranking family
    (operators/ranking.global_rank): order totals (exact cents) ranked
    globally with ties — the 15 cheapest distinct price points with their
    dense index, gapped rank, and multiplicity. RANK reduces tie groups
    via a partitioned min-row_number (never a single-partition window);
    DENSE_RANK ranks only the distinct-value frame. Integer outputs keep
    the hash exact against DuckDB's native window functions."""
    o = _t(spark, sf_dir, "orders")
    sel = o.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        "o_orderkey",
    )
    rnk = RK.global_rank(sel, ["c"], "rnk")
    drk = RK.global_rank(sel, ["c"], "drk", dense=True)
    per = (
        rnk.groupBy("c")
        .agg(F.min("rnk").alias("rnk"), F.count("*").cast("bigint").alias("n_orders"))
        .join(drk.select("c", "drk").distinct(), "c")
    )
    return (
        per.filter(F.col("drk") <= 15)
        .select(
            F.col("drk").cast("bigint").alias("dense_rank"),
            F.col("c").alias("cents"),
            F.col("rnk").cast("bigint").alias("rank"),
            "n_orders",
        )
        .orderBy("dense_rank")
    )


_GLOBAL_RANK_SQL = """
WITH r AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
    RANK() OVER (ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rnk,
    DENSE_RANK() OVER (ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS drk
  FROM orders),
per AS (
  SELECT c, MIN(rnk) AS rnk, MIN(drk) AS drk, COUNT(*) AS n_orders
  FROM r GROUP BY c)
SELECT CAST(drk AS BIGINT) AS dense_rank, c AS cents,
  CAST(rnk AS BIGINT) AS rank, CAST(n_orders AS BIGINT) AS n_orders
FROM per WHERE drk <= 15 ORDER BY dense_rank
"""


def q_quantiles_exclusive_inclusive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``quantileExactInclusive`` / ``quantileExactExclusive``
    parity (= Excel PERCENTILE.INC/EXC) per market segment on
    account-balance cents: inclusive ranks at h=(n−1)q+1, exclusive at
    h=(n+1)q clamped to [1, n], both linearly interpolated between the
    two bracketing ORDER STATISTICS — computed by element lookup in the
    per-segment sorted array (segments are bounded dimension groups;
    the unbounded-group scale path is the KLL sketch in
    sketch_value_quantiles). Integer cents keep the order statistics
    exact; the interpolation arithmetic is expression-identical on both
    engines."""
    cust = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    per = cust.groupBy("c_mktsegment").agg(
        F.sort_array(F.collect_list(cents)).alias("v"),
        F.count("*").alias("n"),
    )
    cols = [F.col("c_mktsegment"), F.col("n").cast("bigint").alias("n")]
    for q, nm in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75")):
        for excl, tag in ((False, "inc"), (True, "exc")):
            if excl:
                h = F.lit(q) * (F.col("n") + 1)
                h = F.greatest(F.least(h, F.col("n").cast("double")), F.lit(1.0))
            else:
                h = F.lit(q) * (F.col("n") - 1) + 1
            lo = F.floor(h).cast("int")
            hi = F.ceil(h).cast("int")
            vlo = F.element_at(F.col("v"), lo).cast("double")
            vhi = F.element_at(F.col("v"), hi).cast("double")
            val = (vlo + (h - lo.cast("double")) * (vhi - vlo)) / 100.0
            cols.append(F.round(val, 6).alias(f"{nm}_{tag}"))
    return per.select(*cols).orderBy("c_mktsegment")


def _quantile_ie_sql() -> str:
    parts = []
    for q, nm in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75")):
        for excl, tag in ((False, "inc"), (True, "exc")):
            if excl:
                h = f"greatest(least({q} * (n + 1), CAST(n AS DOUBLE)), 1.0)"
            else:
                h = f"{q} * (n - 1) + 1"
            parts.append(
                f"ROUND((CAST(v[CAST(FLOOR({h}) AS INT)] AS DOUBLE)"
                f" + ({h} - CAST(CAST(FLOOR({h}) AS INT) AS DOUBLE))"
                f" * (CAST(v[CAST(CEIL({h}) AS INT)] AS DOUBLE)"
                f" - CAST(v[CAST(FLOOR({h}) AS INT)] AS DOUBLE))) / 100.0, 6)"
                f" AS {nm}_{tag}"
            )
    sel = ",\n  ".join(parts)
    return f"""
WITH per AS (
  SELECT c_mktsegment,
    list(CAST(ROUND(c_acctbal * 100) AS BIGINT)
         ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS v,
    COUNT(*) AS n
  FROM customer GROUP BY 1)
SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
  {sel}
FROM per ORDER BY c_mktsegment
"""


_QUANTILE_IE_SQL = _quantile_ie_sql()


def q_age_unit_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``age(unit, d1, d2)`` parity — FULL elapsed units
    (unlike dateDiff's boundary-crossing count): per order, the span
    from order date to its last line's ship date in full days, weeks,
    and months (months via the calendar rule: 12·Δy + Δm − 1 if the
    end day-of-month hasn't reached the start's). Reported per order
    priority: averages scaled to exact integer milli-units plus the
    max-days witness. One fact-fact span aggregation, one rollup."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    spans = li.groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("d2")
    )
    j = o.select(
        "o_orderkey", "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("d1"),
    ).join(spans, F.col("o_orderkey") == F.col("l_orderkey"))
    j = j.select(
        "o_orderpriority", "d1", F.greatest("d2", "d1").alias("d2")
    )
    days = F.datediff("d2", "d1")
    months = (
        (F.year("d2") - F.year("d1")) * 12
        + (F.month("d2") - F.month("d1"))
        - F.when(F.dayofmonth("d2") < F.dayofmonth("d1"), 1).otherwise(0)
    )
    b = j.select(
        "o_orderpriority",
        days.alias("age_days"),
        F.floor(days / 7).alias("age_weeks"),
        months.alias("age_months"),
    )
    return (
        b.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.expr("sum(age_days) * 1000 div count(*)")
            .cast("bigint")
            .alias("avg_age_days_milli"),
            F.expr("sum(age_weeks) * 1000 div count(*)")
            .cast("bigint")
            .alias("avg_age_weeks_milli"),
            F.expr("sum(age_months) * 1000 div count(*)")
            .cast("bigint")
            .alias("avg_age_months_milli"),
            F.max("age_days").cast("bigint").alias("max_age_days"),
        )
        .orderBy("o_orderpriority")
    )


_AGE_UNIT_SQL = """
WITH spans AS (
  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS d2
  FROM lineitem GROUP BY 1),
j AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d1,
    greatest(s.d2, CAST(o_orderdate AS DATE)) AS d2
  FROM orders o JOIN spans s ON o.o_orderkey = s.l_orderkey),
b AS (
  SELECT o_orderpriority,
    date_diff('day', d1, d2) AS age_days,
    CAST(FLOOR(date_diff('day', d1, d2) / 7) AS BIGINT) AS age_weeks,
    (year(d2) - year(d1)) * 12 + (month(d2) - month(d1))
      - CASE WHEN day(d2) < day(d1) THEN 1 ELSE 0 END AS age_months
  FROM j)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(age_days) * 1000 // COUNT(*) AS BIGINT) AS avg_age_days_milli,
  CAST(SUM(age_weeks) * 1000 // COUNT(*) AS BIGINT)
    AS avg_age_weeks_milli,
  CAST(SUM(age_months) * 1000 // COUNT(*) AS BIGINT)
    AS avg_age_months_milli,
  CAST(MAX(age_days) AS BIGINT) AS max_age_days
FROM b GROUP BY 1 ORDER BY o_orderpriority
"""


def q_array_predicates_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse array-predicate family — ``hasAll``, ``hasAny``,
    ``hasSubstr`` (CONTIGUOUS subsequence), ``indexOf``, ``countEqual``
    — over each document's token list against fixed probes. hasSubstr
    is the real algorithm of the five: ∃i such that the length-m slice
    at i equals the probe (row-local O(n·m), m=2 here). Per-doc flags
    plus the corpus rollup would be a filter at 100 TB; emitted per doc
    for the hash gate."""
    docs = _t(spark, sf_dir, "documents")
    t = TX.tokens(F.col("text"))
    d = docs.select("doc_id", t.alias("t"), F.size(t).alias("n"))
    probe_all = F.array(F.lit("the"), F.lit("data"))
    probe_any = F.array(F.lit("spark"), F.lit("stream"), F.lit("batch"))
    sub = ["key", "order"]
    has_substr = F.when(
        F.col("n") >= len(sub),
        F.exists(
            F.sequence(F.lit(1), F.col("n") - (len(sub) - 1)),
            lambda i: (F.element_at(F.col("t"), i) == sub[0])
            & (F.element_at(F.col("t"), i + 1) == sub[1]),
        ),
    ).otherwise(F.lit(False))
    return d.select(
        "doc_id",
        (F.size(F.array_intersect(F.array_distinct("t"), probe_all)) == 2)
        .cast("int")
        .alias("has_all"),
        F.arrays_overlap("t", probe_any).cast("int").alias("has_any"),
        has_substr.cast("int").alias("has_substr_key_order"),
        F.array_position("t", "join").cast("bigint").alias("index_of_join"),
        F.size(F.filter("t", lambda x: x == F.lit("merge")))
        .cast("bigint")
        .alias("count_equal_merge"),
    ).orderBy("doc_id")


_ARRAY_PRED_SQL = f"""
WITH d AS (SELECT doc_id, {_TOKS_SQL} AS t, len({_TOKS_SQL}) AS n
           FROM documents)
SELECT doc_id,
  CAST(len(list_intersect(list_distinct(t), ['the', 'data'])) = 2 AS INT)
    AS has_all,
  CAST(len(list_intersect(t, ['spark', 'stream', 'batch'])) > 0 AS INT)
    AS has_any,
  CAST(CASE WHEN n >= 2 THEN len(list_filter(generate_series(1, n - 1),
    i -> t[i] = 'key' AND t[i + 1] = 'order')) > 0 ELSE FALSE END AS INT)
    AS has_substr_key_order,
  CAST(list_position(t, 'join') AS BIGINT) AS index_of_join,
  CAST(len(list_filter(t, x -> x = 'merge')) AS BIGINT)
    AS count_equal_merge
FROM d ORDER BY doc_id
"""


def q_bit_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``bitCount`` parity: popcount of the props key,
    histogrammed — per popcount: occurrences, distinct k values, and
    min/max witnesses. bit_count is a native expression on both engines
    (Spark ``bit_count``, DuckDB ``bit_count`` over BIT) — spelled here
    with the same builtin; one tiny keyed aggregation."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    b = ev.select(F.bit_count(k).alias("pop"), k.alias("k"))
    return (
        b.groupBy("pop")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.countDistinct("k").cast("bigint").alias("n_distinct_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .select(F.col("pop").cast("bigint").alias("pop"), "n",
                "n_distinct_k", "min_k", "max_k")
        .orderBy("pop")
    )


_BIT_COUNT_SQL = """
WITH b AS (
  SELECT bit_count(CAST(CAST(json_extract(props, '$.k') AS BIGINT)
                        AS BIT)) AS pop,
    CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT CAST(pop AS BIGINT) AS pop, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k,
  CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
FROM b GROUP BY pop ORDER BY pop
"""


def q_power_of_two_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``roundToExp2`` parity: order totals (cents) bucketed
    to their previous power of two — the log-scale histogram that keeps
    a constant bucket count regardless of value range (the right
    money/latency histogram at 100 TB: ≤64 buckets, map-side
    combinable). The exponent comes from integer bit-length, not
    floating log2 (log2(2^53±ε) rounds wrong at bucket edges); both
    engines spell FLOOR(LOG2) over an exact small int via a 63-step
    CASE-free trick: length of the binary representation."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    # bit_length of the value = floor(log2) + 1, exactly, via the
    # engine's binary formatter — no floating point near bucket edges
    exp = (F.length(F.conv(cents, 10, 2)) - 1).cast("int")
    b = o.select(exp.alias("e"), cents.alias("c"))
    return (
        b.groupBy("e")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("c").cast("decimal(38,0)"))
            .cast("bigint")
            .alias("sum_cents"),
            F.min("c").cast("bigint").alias("min_cents"),
            F.max("c").cast("bigint").alias("max_cents"),
        )
        .select(
            F.col("e").cast("bigint").alias("exp2"),
            F.pow(F.lit(2.0), F.col("e")).cast("bigint").alias("bucket_lo"),
            "n",
            "sum_cents",
            "min_cents",
            "max_cents",
        )
        .orderBy("exp2")
    )


_POW2_HIST_SQL = """
WITH b AS (
  SELECT length(bin(CAST(ROUND(o_totalprice * 100) AS BIGINT))) - 1 AS e,
    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders)
SELECT CAST(e AS BIGINT) AS exp2,
  CAST(power(2.0, e) AS BIGINT) AS bucket_lo,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(c AS DECIMAL(38,0))) AS BIGINT) AS sum_cents,
  CAST(MIN(c) AS BIGINT) AS min_cents,
  CAST(MAX(c) AS BIGINT) AS max_cents
FROM b GROUP BY e ORDER BY exp2
"""


def q_heaps_law_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth (V = K·N^β) over the corpus read in
    doc_id order: cumulative distinct vocabulary is computed WITHOUT a
    running-distinct scan — each token contributes at its FIRST document
    (one groupBy-min over exploded (token, doc) pairs), so cum_vocab is
    a cumulative sum of per-doc first-occurrence counts — computed
    DISTRIBUTED (operators/ranking.global_running_sum: per-partition
    running sums + broadcast prefix totals, no single-partition window).
    Checkpoints every 50 docs carry (N, V) plus the corpus-level
    log-log OLS fit (β, ln K) attached from a broadcast 1-row moment
    aggregate. The explode + min shuffle is the only fact-scale work —
    the classic tokenizer-budget forecasting curve for training
    corpora."""
    docs = _t(spark, sf_dir, "documents")
    t = TX.tokens(F.col("text"))
    d = docs.select("doc_id", t.alias("t"), F.size(t).alias("n_toks"))
    first = (
        d.select("doc_id", F.explode(F.array_distinct("t")).alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(F.col("first_doc").alias("doc_id"))
        .agg(F.count("*").alias("new_vocab"))
    )
    joined = (
        d.select("doc_id", "n_toks")
        .join(first, "doc_id", "left")
        .select(
            "doc_id", "n_toks",
            F.coalesce("new_vocab", F.lit(0)).alias("new_vocab"),
        )
    )
    cum = RK.global_running_sum(
        joined, ["doc_id"], ["n_toks", "new_vocab"],
        ["cum_tokens", "cum_vocab"],
    ).where(F.col("doc_id") % 50 == 49)
    x = F.log(F.col("cum_tokens").cast("double"))
    y = F.log(F.col("cum_vocab").cast("double"))
    cp = cum.select(
        "doc_id",
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        F.col("cum_vocab").cast("bigint").alias("cum_vocab"),
        x.alias("lx"), y.alias("ly"),
    )
    moments = cp.agg(
        F.count("*").cast("double").alias("m"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    fit = cp.crossJoin(F.broadcast(moments)).select(
        "doc_id", "cum_tokens", "cum_vocab", "m", "sx", "sy", "sxx", "sxy"
    )
    beta = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    lnk = (F.col("sy") - beta * F.col("sx")) / F.col("m")
    return fit.select(
        "doc_id",
        "cum_tokens",
        "cum_vocab",
        F.round(beta, 6).alias("heaps_beta"),
        F.round(lnk, 6).alias("heaps_ln_k"),
    ).orderBy("doc_id")


_HEAPS_SQL = f"""
WITH d AS (
  SELECT doc_id, {_TOKS_SQL} AS t, len({_TOKS_SQL}) AS n_toks
  FROM documents),
first AS (
  SELECT first_doc AS doc_id, COUNT(*) AS new_vocab FROM (
    SELECT tok, MIN(doc_id) AS first_doc FROM (
      SELECT doc_id, unnest(list_distinct(t)) AS tok FROM d)
    GROUP BY tok)
  GROUP BY first_doc),
cum AS (
  SELECT d.doc_id,
    SUM(d.n_toks) OVER (ORDER BY d.doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum_tokens,
    SUM(COALESCE(f.new_vocab, 0)) OVER (ORDER BY d.doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum_vocab
  FROM d LEFT JOIN first f ON d.doc_id = f.doc_id),
cp AS (SELECT * FROM cum WHERE doc_id % 50 = 49),
fit AS (
  SELECT doc_id, CAST(cum_tokens AS BIGINT) AS cum_tokens,
    CAST(cum_vocab AS BIGINT) AS cum_vocab,
    CAST(COUNT(*) OVER () AS DOUBLE) AS m,
    SUM(ln(CAST(cum_tokens AS DOUBLE))) OVER () AS sx,
    SUM(ln(CAST(cum_vocab AS DOUBLE))) OVER () AS sy,
    SUM(ln(CAST(cum_tokens AS DOUBLE)) * ln(CAST(cum_tokens AS DOUBLE)))
      OVER () AS sxx,
    SUM(ln(CAST(cum_tokens AS DOUBLE)) * ln(CAST(cum_vocab AS DOUBLE)))
      OVER () AS sxy
  FROM cp)
SELECT doc_id, cum_tokens, cum_vocab,
  ROUND((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS heaps_beta,
  ROUND((sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx) / m, 6)
    AS heaps_ln_k
FROM fit ORDER BY doc_id
"""


def q_jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random-projection distortion report: the
    64-dim embeddings project to 8 dims through deterministic ±1
    hyperplanes (sign = parity of md5(plane_i), the same seedless
    derivation the LSH family uses), and every pair among the 20
    lowest-id vectors reports original vs projected L2 and the
    distortion ratio. Projections are row-local ordered folds
    (bit-identical both engines); the pair stage runs on the broadcast
    20-row frame. The report quantifies exactly what the 8× cheaper
    ANN shuffle costs in distance fidelity."""
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 20)
    n_planes = 8
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, v: acc + v
    )

    def proj(p: int):
        signed = F.transform(
            F.sequence(F.lit(1), F.size("embedding")),
            lambda i: F.element_at(F.col("embedding"), i).cast("double")
            * F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(F.lit(f"jl_{p}_"), i.cast("string"))
                        ),
                        1,
                        2,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 2
                == 0,
                1.0,
            ).otherwise(-1.0),
        )
        return fold(signed) / F.lit(float(n_planes) ** 0.5)

    pr = emb.select(
        "vec_id",
        F.col("embedding").alias("e"),
        F.array(*[proj(p) for p in range(n_planes)]).alias("pr"),
    )
    a = pr.select(
        F.col("vec_id").alias("id_a"),
        F.col("e").alias("ea"),
        F.col("pr").alias("pa"),
    )
    b = pr.select(
        F.col("vec_id").alias("id_b"),
        F.col("e").alias("eb"),
        F.col("pr").alias("pb"),
    )
    d_orig = F.sqrt(
        fold(
            F.zip_with(
                "ea",
                "eb",
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            )
        )
    )
    d_proj = F.sqrt(
        fold(F.zip_with("pa", "pb", lambda x, y: (x - y) * (x - y)))
    )
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(d_orig, 6).alias("l2_orig"),
            F.round(d_proj, 6).alias("l2_proj"),
            F.round(d_proj / d_orig, 4).alias("distortion"),
        )
        .orderBy("id_a", "id_b")
    )


def _jl_sql(n_planes: int = 8) -> str:
    projs = ", ".join(
        f"""list_sum(list_transform(generate_series(1, len(embedding)),
      i -> embedding[i]::DOUBLE *
        (CASE WHEN ('0x' || substr(md5('jl_{p}_' || CAST(i AS VARCHAR)),
             1, 2))::BIGINT % 2 = 0 THEN 1.0 ELSE -1.0 END)))
      / sqrt(8.0)"""
        for p in range(n_planes)
    )
    return f"""
WITH pr AS (
  SELECT vec_id, embedding AS e, [{projs}] AS pr
  FROM embeddings WHERE vec_id < 20)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  ROUND(sqrt(list_sum(list_transform(generate_series(1, len(a.e)),
    i -> (a.e[i]::DOUBLE - b.e[i]::DOUBLE)
       * (a.e[i]::DOUBLE - b.e[i]::DOUBLE)))), 6) AS l2_orig,
  ROUND(sqrt(list_sum(list_transform(generate_series(1, 8),
    i -> (a.pr[i] - b.pr[i]) * (a.pr[i] - b.pr[i])))), 6) AS l2_proj,
  ROUND(sqrt(list_sum(list_transform(generate_series(1, 8),
      i -> (a.pr[i] - b.pr[i]) * (a.pr[i] - b.pr[i]))))
    / sqrt(list_sum(list_transform(generate_series(1, len(a.e)),
      i -> (a.e[i]::DOUBLE - b.e[i]::DOUBLE)
         * (a.e[i]::DOUBLE - b.e[i]::DOUBLE)))), 4) AS distortion
FROM pr a JOIN pr b ON a.vec_id < b.vec_id
ORDER BY id_a, id_b
"""


_JL_SQL = _jl_sql()


def q_bag_set_ops_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operators (``INTERSECT ALL`` / ``EXCEPT ALL`` —
    the multiplicity-preserving flavors ClickHouse and ANSI SQL define
    next to the DISTINCT ones): daily order-priority multisets of 1996
    vs 1997, sized via the standard per-key count identity
    (∩ALL = Σ min(c₁, c₂); ∖ALL = Σ max(c₁−c₂, 0)) — one count
    aggregation per side and a tiny 5-row join, never a row-level
    set-op shuffle. DISTINCT flavors reported alongside for the
    semantic contrast."""
    o = _t(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")

    def side(y):
        return (
            o.where(yr == y)
            .groupBy(F.col("o_orderpriority").alias("p"))
            .agg(F.count("*").alias("c"))
        )

    a = side(1996).select("p", F.col("c").alias("ca"))
    b = side(1997).select("p", F.col("c").alias("cb"))
    j = a.join(b, "p", "full").select(
        "p",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    return j.agg(
        F.sum("ca").cast("bigint").alias("n_1996"),
        F.sum("cb").cast("bigint").alias("n_1997"),
        F.sum(F.least("ca", "cb")).cast("bigint").alias("intersect_all"),
        F.sum(F.greatest(F.col("ca") - F.col("cb"), F.lit(0)))
        .cast("bigint")
        .alias("except_all_1996"),
        F.sum(F.greatest(F.col("cb") - F.col("ca"), F.lit(0)))
        .cast("bigint")
        .alias("except_all_1997"),
        F.sum(((F.col("ca") > 0) & (F.col("cb") > 0)).cast("int"))
        .cast("bigint")
        .alias("intersect_distinct"),
        F.sum(((F.col("ca") > 0) & (F.col("cb") == 0)).cast("int"))
        .cast("bigint")
        .alias("except_distinct_1996"),
    )


_BAG_SET_OPS_SQL = """
WITH a AS (
  SELECT o_orderpriority AS p, COUNT(*) AS ca FROM orders
  WHERE year(o_orderdate) = 1996 GROUP BY 1),
b AS (
  SELECT o_orderpriority AS p, COUNT(*) AS cb FROM orders
  WHERE year(o_orderdate) = 1997 GROUP BY 1),
j AS (
  SELECT COALESCE(a.p, b.p) AS p, COALESCE(ca, 0) AS ca,
    COALESCE(cb, 0) AS cb
  FROM a FULL JOIN b ON a.p = b.p)
SELECT CAST(SUM(ca) AS BIGINT) AS n_1996,
  CAST(SUM(cb) AS BIGINT) AS n_1997,
  CAST(SUM(least(ca, cb)) AS BIGINT) AS intersect_all,
  CAST(SUM(greatest(ca - cb, 0)) AS BIGINT) AS except_all_1996,
  CAST(SUM(greatest(cb - ca, 0)) AS BIGINT) AS except_all_1997,
  CAST(SUM(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS intersect_distinct,
  CAST(SUM(CASE WHEN ca > 0 AND cb = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS except_distinct_1996
FROM j
"""


def q_matryoshka_truncation_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka-embedding truncation fidelity: cosine similarity over
    the first d ∈ {8, 16, 32, 64} dimensions vs the full 64-dim cosine,
    for every pair among the 20 lowest-id vectors — mean absolute
    cosine delta and worst-pair delta per d. This is the storage/recall
    dial of truncation-tolerant embeddings (prefix dims ≙ coarse
    search, full dims ≙ rerank); folds are ordered and row-local, the
    pair stage is the broadcast 20-row frame."""
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 20)
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, v: acc + v
    )

    def cos(ea, eb, d):
        sa = F.slice(ea, 1, d)
        sb = F.slice(eb, 1, d)
        dot = fold(
            F.zip_with(
                sa, sb, lambda x, y: x.cast("double") * y.cast("double")
            )
        )
        na = F.sqrt(
            fold(F.transform(sa, lambda x: x.cast("double") * x.cast("double")))
        )
        nb = F.sqrt(
            fold(F.transform(sb, lambda x: x.cast("double") * x.cast("double")))
        )
        return dot / (na * nb)

    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    full = cos(F.col("ea"), F.col("eb"), 64)
    rows = []
    for d in (8, 16, 32, 64):
        delta = F.abs(cos(F.col("ea"), F.col("eb"), d) - full)
        rows.append(
            F.struct(
                F.lit(d).alias("dims"),
                delta.alias("delta"),
            )
        )
    ex = pairs.select(
        F.explode(F.array(*rows)).alias("r")
    ).select(F.col("r.dims").alias("dims"), F.col("r.delta").alias("delta"))
    return (
        ex.groupBy("dims")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.round(
                (
                    F.sum(F.round(F.col("delta") * 1e9).cast("decimal(38,0)"))
                    .cast("double")
                    / F.count("*")
                )
                / 1e9,
                6,
            ).alias("mean_abs_delta"),
            F.round(F.max("delta"), 6).alias("max_abs_delta"),
        )
        .select(
            F.col("dims").cast("bigint").alias("dims"),
            "n_pairs",
            "mean_abs_delta",
            "max_abs_delta",
        )
        .orderBy("dims")
    )


def _matryoshka_sql() -> str:
    def cos(d):
        return f"""(list_sum(list_transform(generate_series(1, {d}),
      i -> a.ea[i]::DOUBLE * b.eb[i]::DOUBLE))
      / (sqrt(list_sum(list_transform(list_slice(a.ea, 1, {d}),
           x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform(list_slice(b.eb, 1, {d}),
           x -> x::DOUBLE * x::DOUBLE)))))"""

    branches = "\nUNION ALL\n".join(
        f"SELECT {d} AS dims, abs({cos(d)} - {cos(64)}) AS delta "
        f"FROM a JOIN b ON a.id_a < b.id_b"
        for d in (8, 16, 32, 64)
    )
    return f"""
WITH a AS (SELECT vec_id AS id_a, embedding AS ea FROM embeddings
           WHERE vec_id < 20),
b AS (SELECT vec_id AS id_b, embedding AS eb FROM embeddings
      WHERE vec_id < 20),
ex AS ({branches})
SELECT CAST(dims AS BIGINT) AS dims,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  ROUND((CAST(SUM(CAST(ROUND(delta * 1e9) AS DECIMAL(38,0))) AS DOUBLE)
         / COUNT(*)) / 1e9, 6) AS mean_abs_delta,
  ROUND(MAX(delta), 6) AS max_abs_delta
FROM ex GROUP BY dims ORDER BY dims
"""


_MATRYOSHKA_SQL = _matryoshka_sql()


def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup ROI curve: how many near-dup pairs/docs each Jaccard
    threshold (0.5→0.9) removes, from ONE LSH-candidate + exact-verify
    pass (rides the shared persisted signature/shingle stages — the
    corpus is never re-scanned per threshold). Removal follows the
    min-id-keeper rule (a doc is dropped iff it pairs at ≥t with a
    smaller id). This is the knob-tuning readout before committing a
    100 TB dedup run: pair volume and survivor count per threshold,
    exact."""
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar for the survivor ratio (bounded read)
    pairs = DD.lsh_verified_pairs(docs, threshold=0.5, cache_key=sf_dir)
    aggs = []
    for t in (50, 60, 70, 80, 90):
        cond = F.col("jaccard") >= t / 100.0
        aggs.extend(
            [
                F.sum(cond.cast("int")).cast("bigint").alias(f"pairs_{t}"),
                F.countDistinct(F.when(cond, F.col("id_b")))
                .cast("bigint")
                .alias(f"removed_{t}"),
            ]
        )
    wide = pairs.agg(*aggs)
    rows = [
        F.struct(
            F.lit(t).alias("threshold_pct"),
            F.coalesce(F.col(f"pairs_{t}"), F.lit(0)).alias("n_pairs"),
            F.coalesce(F.col(f"removed_{t}"), F.lit(0)).alias(
                "n_docs_removed"
            ),
        )
        for t in (50, 60, 70, 80, 90)
    ]
    return (
        wide.select(F.explode(F.array(*rows)).alias("r"))
        .select(
            F.col("r.threshold_pct").cast("bigint").alias("threshold_pct"),
            F.col("r.n_pairs").alias("n_pairs"),
            F.col("r.n_docs_removed").alias("n_docs_removed"),
            F.lit(n_docs).cast("bigint").alias("n_total_docs"),
            F.floor(
                (F.lit(n_docs) - F.col("r.n_docs_removed"))
                * 1000000
                / F.lit(n_docs)
            )
            .cast("bigint")
            .alias("survivor_ppm"),
        )
        .orderBy("threshold_pct")
    )


def _dedup_sweep_sql() -> str:
    # reuses the exact candidate/verify chain of _JACCARD_SQL (same
    # signature constants), swept over thresholds without a re-scan
    body = _JACCARD_SQL.split("SELECT id_a")[0]
    return f"""{body}
SELECT t AS threshold_pct,
  CAST(SUM(CASE WHEN jaccard >= t / 100.0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_pairs,
  CAST(COUNT(DISTINCT CASE WHEN jaccard >= t / 100.0 THEN id_b END)
       AS BIGINT) AS n_docs_removed,
  CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_total_docs,
  CAST(FLOOR(((SELECT COUNT(*) FROM documents)
        - COUNT(DISTINCT CASE WHEN jaccard >= t / 100.0 THEN id_b END))
       * 1000000 / (SELECT COUNT(*) FROM documents)) AS BIGINT)
    AS survivor_ppm
FROM verified, unnest([50, 60, 70, 80, 90]) AS u(t)
GROUP BY t ORDER BY threshold_pct
"""


def q_group_array_sorted_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArraySorted(k)`` parity: per nation, the 5
    smallest customer account balances (cents) as a CSV array — the
    bounded-k sorted-aggregate that ships a top/bottom-k LIST per group
    without materializing the group (at scale the k-bounded heap state
    is what makes it one map-side-combinable pass). Tie-break is the
    value itself (duplicates keep multiplicity, exactly k survive)."""
    cust = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    return (
        cust.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.concat_ws(
                ",",
                F.slice(F.sort_array(F.collect_list(cents)), 1, 5),
            ).alias("bottom5_cents_csv"),
        )
        .orderBy("nationkey")
    )


_GROUP_ARRAY_SORTED_SQL = """
SELECT c_nationkey AS nationkey,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  array_to_string(list_slice(
    list(CAST(ROUND(c_acctbal * 100) AS BIGINT)
         ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT)), 1, 5), ',')
    AS bottom5_cents_csv
FROM customer GROUP BY 1 ORDER BY nationkey
"""


def q_deterministic_sample_quantile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``quantileDeterministic(x, determinator)`` semantics:
    a REPRODUCIBLE sampled quantile — the sample is selected by a hash
    of the determinator column (event_id), never by an RNG, so any
    engine / partition order / rerun draws the identical sample. Per
    event type: the exact p50 of value-cents on the full data, the
    exact p50 on the 1-in-8 hash sample, and the absolute error — the
    accuracy-vs-cost readout. Both quantiles are discrete order
    statistics (rank ceil(n/2)) via one window pass each."""
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    sampled = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15),
               16, 10).cast("bigint") % 8 == 0
    )
    b = ev.select("event_type", cents.alias("c"), sampled.alias("s"))

    def p50(df, tag):
        # discrete p50: value at rank ceil(n/2) in (c) order — the
        # SELECTED VALUE is tie-insensitive (row_number among equal c
        # always lands on the same c), so no tie-break column is needed
        w = Window.partitionBy("event_type").orderBy("c")
        wn = Window.partitionBy("event_type")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .withColumn("n", F.count("*").over(wn))
            .where(F.col("rn") == F.ceil(F.col("n") / 2))
            .select("event_type", F.col("c").alias(tag),
                    F.col("n").cast("bigint").alias(f"n_{tag}"))
        )

    full = p50(b, "p50_full")
    samp = p50(b.where("s"), "p50_sample")
    return (
        full.join(samp, "event_type")
        .select(
            "event_type",
            "n_p50_full",
            "n_p50_sample",
            "p50_full",
            "p50_sample",
            F.abs(F.col("p50_full") - F.col("p50_sample")).alias("abs_err"),
        )
        .orderBy("event_type")
    )


_DET_SAMPLE_QUANTILE_SQL = """
WITH b AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c,
    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 8 = 0
      AS s
  FROM events),
fq AS (
  SELECT event_type, c AS p50_full, CAST(n AS BIGINT) AS n_p50_full FROM (
    SELECT event_type, c,
      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) AS rn,
      COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM b)
  WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)),
sq AS (
  SELECT event_type, c AS p50_sample, CAST(n AS BIGINT) AS n_p50_sample
  FROM (
    SELECT event_type, c,
      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) AS rn,
      COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM b WHERE s)
  WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT))
SELECT f.event_type, f.n_p50_full, s.n_p50_sample, f.p50_full,
  s.p50_sample, abs(f.p50_full - s.p50_sample) AS abs_err
FROM fq f JOIN sq s ON f.event_type = s.event_type
ORDER BY f.event_type
"""


def q_rounding_semantics_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse rounding-family parity — ``round`` (half away from
    zero), ``roundBankers`` (half to even), ``floor``/``ceil``/
    ``trunc`` — applied to value×10 at one decimal, aggregated per
    event type so every row's verdict shifts a sum. The half-even and
    half-away branches are spelled with the SAME explicit integer
    formulas on both engines (engine-native round() differs silently:
    Spark HALF_UP, DuckDB half-even on ties — the exact class of bug
    this report pins). Counts of actual .5 ties where the two
    semantics diverge included. Signs alternate by event_id parity so
    the NEGATIVE branches are exercised by the oracle at every SF:
    the remainder is the floor-consistent pmod (always in [0,1e5)),
    and the half-away tie direction is sign-aware — for u<0 the tie
    rounds DOWN to q (away from zero), for u>=0 up to q+1. A
    dividend-signed % here silently degrades both rounding modes to
    floor on negative inputs."""
    ev = _t(spark, sf_dir, "events")
    # exact tenths: value is micro-grid in fixtures, scaled to integer
    # micros-of-tenths to detect exact .5 ties; parity sign makes
    # roughly half the inputs negative
    sign = F.when(F.col("event_id") % 2 == 0, F.lit(-1)).otherwise(
        F.lit(1)
    ).cast("bigint")
    u = (F.round(F.col("value") * 1_000_000).cast("bigint") * sign)
    # floor quotient + floor-consistent remainder: u = q*1e5 + r with
    # r in [0, 1e5) for ANY sign of u (pmod, not dividend-signed %)
    q_ = F.floor(u / 100000).cast("bigint")
    r_ = F.pmod(u, F.lit(100000).cast("bigint"))
    half_away = (
        F.when(r_ > 50000, q_ + 1)
        .when(r_ < 50000, q_)
        # exact tie: away-from-zero is q+1 for u>=0, q for u<0
        .otherwise(F.when(u < 0, q_).otherwise(q_ + 1))
    )
    half_even = (
        F.when(r_ > 50000, q_ + 1)
        .when(r_ < 50000, q_)
        .otherwise(F.when(q_ % 2 == 0, q_).otherwise(q_ + 1))
    )
    b = ev.select(
        "event_type",
        half_away.alias("ha"),
        half_even.alias("he"),
        (r_ == 50000).cast("int").alias("tie"),
        q_.alias("fl"),
    )
    return (
        b.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("ha").cast("bigint").alias("sum_round_half_away"),
            F.sum("he").cast("bigint").alias("sum_round_bankers"),
            F.sum("fl").cast("bigint").alias("sum_floor"),
            F.sum("tie").cast("bigint").alias("n_exact_ties"),
            F.sum(F.when(F.col("ha") != F.col("he"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_divergent"),
        )
        .orderBy("event_type")
    )


_ROUNDING_SQL = """
WITH b AS (
  SELECT event_type,
    CAST(ROUND(value * 1000000) AS BIGINT)
      * (CASE WHEN event_id % 2 = 0 THEN -1 ELSE 1 END) AS u
  FROM events),
c AS (
  SELECT event_type, u,
    CAST(FLOOR(u / 100000.0) AS BIGINT) AS q,
    ((u % 100000) + 100000) % 100000 AS r
  FROM b),
d AS (
  SELECT event_type, q AS fl,
    CASE WHEN r > 50000 THEN q + 1 WHEN r < 50000 THEN q
         WHEN u < 0 THEN q ELSE q + 1 END AS ha,
    CASE WHEN r > 50000 THEN q + 1 WHEN r < 50000 THEN q
         WHEN q % 2 = 0 THEN q ELSE q + 1 END AS he,
    CASE WHEN r = 50000 THEN 1 ELSE 0 END AS tie
  FROM c)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(ha) AS BIGINT) AS sum_round_half_away,
  CAST(SUM(he) AS BIGINT) AS sum_round_bankers,
  CAST(SUM(fl) AS BIGINT) AS sum_floor,
  CAST(SUM(tie) AS BIGINT) AS n_exact_ties,
  CAST(SUM(CASE WHEN ha <> he THEN 1 ELSE 0 END) AS BIGINT)
    AS n_divergent
FROM d GROUP BY event_type ORDER BY event_type
"""


def q_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window exact distinct (ClickHouse ``uniqExact`` over a
    7-day trailing window): distinct-count is NOT decomposable, so the
    scalable shape is contribute-to-window — each (user, day) pair
    explodes into the ≤7 window-end days it affects (bounded fan-out),
    then one distinct + one count per window key. No per-window rescan,
    no set-union state; shuffle volume is 7× the (user, day) grain, not
    the event grain. Trailing windows clipped to the observed day span;
    DAU reported alongside for the ratio."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select(
        F.col("user_id").alias("u"), F.col("ts").cast("date").alias("d")
    ).distinct()
    # d survives the explode, so the DAU column rides the SAME pass as
    # the trailing window (win_end == d marks each pair's own day) —
    # one explode, one aggregation, no separate daily branch or join
    ex = ud.select(
        "u",
        "d",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("win_end"),
    )
    bounds = ev.agg(F.max(F.col("ts").cast("date")).alias("mx"))
    return (
        ex.crossJoin(F.broadcast(bounds))
        .where(F.col("win_end") <= F.col("mx"))
        .groupBy("win_end")
        .agg(
            F.countDistinct(F.when(F.col("win_end") == F.col("d"), F.col("u")))
            .cast("bigint")
            .alias("users_1d"),
            F.countDistinct("u").cast("bigint").alias("users_7d"),
        )
        .orderBy("win_end")
    )


_SLIDING_DISTINCT_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
ex AS (
  SELECT u, d, CAST(unnest(generate_series(d, d + INTERVAL 6 DAY,
                                           INTERVAL 1 DAY)) AS DATE)
      AS win_end
  FROM ud),
b AS (SELECT MAX(CAST(ts AS DATE)) AS mx FROM events)
SELECT win_end,
  CAST(COUNT(DISTINCT CASE WHEN win_end = d THEN u END) AS BIGINT)
    AS users_1d,
  CAST(COUNT(DISTINCT u) AS BIGINT) AS users_7d
FROM ex, b WHERE win_end <= b.mx
GROUP BY win_end ORDER BY win_end
"""


def q_sequence_match_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceMatch NEGATION semantics ('view, then purchase, with NO
    error in between' — the pattern class plain funnels cannot
    express): per user, a match exists iff some purchase has a view
    before it with every intervening event non-error. Row-local scan:
    for each purchase index j, the LAST view index before j and the
    LAST error index before j — clean iff last_view > last_error. Per
    event type stream in one sorted per-user array (single groupBy);
    report counts matched users with and without the negation, plus
    users rejected ONLY by the error guard."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        F.struct(
            F.unix_timestamp("ts").alias("s"),
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("t"),
        ).alias("kv"),
    )
    per = base.groupBy("user_id").agg(
        F.sort_array(F.collect_list("kv")).alias("kv")
    )
    t = F.transform(F.col("kv"), lambda x: x["t"])
    d = per.select("user_id", t.alias("t"), F.size("kv").alias("n"))
    idx = F.sequence(F.lit(1), F.col("n"))
    last_before = lambda j, what: F.array_max(  # noqa: E731
        F.filter(
            idx,
            lambda i: (i < j) & (F.element_at(F.col("t"), i) == what),
        )
    )
    m_plain = F.exists(
        idx,
        lambda j: (F.element_at(F.col("t"), j) == "purchase")
        & last_before(j, "view").isNotNull(),
    )
    m_neg = F.exists(
        idx,
        lambda j: (F.element_at(F.col("t"), j) == "purchase")
        & last_before(j, "view").isNotNull()
        & (
            F.coalesce(last_before(j, "error"), F.lit(0))
            < last_before(j, "view")
        ),
    )
    flags = d.select(
        m_plain.cast("int").alias("p"), m_neg.cast("int").alias("q")
    )
    return flags.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("p").cast("bigint").alias("n_view_then_purchase"),
        F.sum("q").cast("bigint").alias("n_without_error_between"),
        F.sum(F.when((F.col("p") == 1) & (F.col("q") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_rejected_by_error_guard"),
    )


_SEQ_NEGATION_SQL = """
WITH per AS (
  SELECT user_id,
    list(event_type ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id)
      AS t,
    COUNT(*) AS n
  FROM events GROUP BY 1),
f AS (
  SELECT user_id,
    len(list_filter(generate_series(1, n), j -> t[j] = 'purchase'
      AND len(list_filter(generate_series(1, n),
          i -> i < j AND t[i] = 'view')) > 0)) > 0 AS p,
    len(list_filter(generate_series(1, n), j -> t[j] = 'purchase'
      AND len(list_filter(generate_series(1, n),
          i -> i < j AND t[i] = 'view')) > 0
      AND COALESCE(list_max(list_filter(generate_series(1, n),
          i -> i < j AND t[i] = 'error')), 0)
        < list_max(list_filter(generate_series(1, n),
          i -> i < j AND t[i] = 'view')))) > 0 AS q
  FROM per)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT)
    AS n_view_then_purchase,
  CAST(SUM(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT)
    AS n_without_error_between,
  CAST(SUM(CASE WHEN p AND NOT q THEN 1 ELSE 0 END) AS BIGINT)
    AS n_rejected_by_error_guard
FROM f
"""


def q_window_funnel_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(86400, 'strict_dedup')`` parity: the
    view → click → purchase chain where a REPEAT of an already-matched
    step between levels aborts the chain (the mode that distinguishes
    genuine progressions from re-fired anchors). Stateless
    formulation — no sequential fold: per anchor view, the first
    in-window click must have no intervening view, and the first
    purchase after it no intervening view/click; per-user level is the
    max over anchors. Row-local array scans over the per-user sorted
    stream (one groupBy — the sessionization state shape); levels
    partition the user base."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        F.struct(
            F.unix_micros("ts").alias("us"),
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("t"),
        ).alias("kv"),
    )
    per = base.groupBy("user_id").agg(
        F.sort_array(F.collect_list("kv")).alias("kv")
    )
    t = F.transform(F.col("kv"), lambda x: x["t"])
    us = F.transform(F.col("kv"), lambda x: x["us"])
    d = per.select("user_id", t.alias("t"), us.alias("us"),
                   F.size("kv").alias("n"))
    day_us = 24 * 3600 * 1_000_000
    idx = F.sequence(F.lit(1), F.col("n"))
    tt = lambda i: F.element_at(F.col("t"), i)  # noqa: E731
    uu = lambda i: F.element_at(F.col("us"), i)  # noqa: E731

    def between(a, b, types):
        return F.exists(
            idx,
            lambda k: (k > a)
            & (k < b)
            & F.array_contains(F.array(*[F.lit(x) for x in types]), tt(k)),
        )

    def first_after(a, typ, anchor):
        return F.array_min(
            F.filter(
                idx,
                lambda j: (j > a)
                & (tt(j) == typ)
                & (uu(j) <= uu(anchor) + day_us),
            )
        )

    def anchor_level(i):
        c1 = first_after(i, "click", i)
        p1 = first_after(c1, "purchase", i)
        return (
            F.when(c1.isNull(), 1)
            .when(between(i, c1, ["view"]), 1)
            .when(p1.isNull(), 2)
            .when(between(c1, p1, ["view", "click"]), 2)
            .otherwise(3)
        )

    lvl = F.coalesce(
        F.array_max(
            F.transform(
                F.filter(idx, lambda i: tt(i) == "view"),
                anchor_level,
            )
        ),
        F.lit(0),
    )
    return (
        d.select(lvl.alias("funnel_level"))
        .groupBy("funnel_level")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy("funnel_level")
    )


_FUNNEL_DEDUP_SQL = """
WITH per AS (
  SELECT user_id,
    list(event_type ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id)
      AS t,
    list(CAST(epoch_us(ts) AS BIGINT)
         ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) AS s,
    COUNT(*) AS n
  FROM events GROUP BY 1),
lv AS (
  SELECT user_id,
    COALESCE(list_max(list_transform(
      list_filter(generate_series(1, n), i -> t[i] = 'view'),
      i -> CASE
        WHEN list_min(list_filter(generate_series(1, n),
            j -> j > i AND t[j] = 'click'
              AND s[j] <= s[i] + 86400000000)) IS NULL THEN 1
        WHEN len(list_filter(generate_series(1, n), k -> k > i
            AND k < list_min(list_filter(generate_series(1, n),
                j -> j > i AND t[j] = 'click'
                  AND s[j] <= s[i] + 86400000000))
            AND t[k] = 'view')) > 0 THEN 1
        WHEN list_min(list_filter(generate_series(1, n),
            j -> j > list_min(list_filter(generate_series(1, n),
                jj -> jj > i AND t[jj] = 'click'
                  AND s[jj] <= s[i] + 86400000000))
              AND t[j] = 'purchase'
              AND s[j] <= s[i] + 86400000000)) IS NULL THEN 2
        WHEN len(list_filter(generate_series(1, n), k ->
            k > list_min(list_filter(generate_series(1, n),
                jj -> jj > i AND t[jj] = 'click'
                  AND s[jj] <= s[i] + 86400000000))
            AND k < list_min(list_filter(generate_series(1, n),
                j -> j > list_min(list_filter(generate_series(1, n),
                    jj -> jj > i AND t[jj] = 'click'
                      AND s[jj] <= s[i] + 86400000000))
                  AND t[j] = 'purchase'
                  AND s[j] <= s[i] + 86400000000))
            AND (t[k] = 'view' OR t[k] = 'click'))) > 0 THEN 2
        ELSE 3 END)), 0) AS funnel_level
  FROM per)
SELECT funnel_level, CAST(COUNT(*) AS BIGINT) AS n_users
FROM lv GROUP BY funnel_level ORDER BY funnel_level
"""


def q_dict_hierarchy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse hierarchical-dictionary parity — ``dictGetHierarchy``
    (the id chain up to the root) and ``dictIsIn`` (ancestor test) over
    the nation → region hierarchy: per nation, the name chain, the
    hierarchy id path as CSV, the region ancestor flag for EUROPE, and
    the depth. Flat dimension joins (broadcast); at scale the
    hierarchy dictionary is exactly the broadcast side."""
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    j = nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    return j.select(
        F.col("n_nationkey").cast("bigint").alias("nationkey"),
        F.concat_ws(">", F.col("n_name"), F.col("r_name")).alias(
            "name_chain"
        ),
        F.concat_ws(
            ",",
            F.col("n_nationkey").cast("string"),
            (F.col("r_regionkey") + 100).cast("string"),
        ).alias("id_path"),
        (F.col("r_name") == "EUROPE").cast("int").alias("is_in_europe"),
        F.lit(2).cast("bigint").alias("depth"),
    ).orderBy("nationkey")


_DICT_HIERARCHY_SQL = """
SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
  n_name || '>' || r_name AS name_chain,
  CAST(n_nationkey AS VARCHAR) || ',' ||
    CAST(r_regionkey + 100 AS VARCHAR) AS id_path,
  CAST(r_name = 'EUROPE' AS INT) AS is_in_europe,
  CAST(2 AS BIGINT) AS depth
FROM nation JOIN region ON n_regionkey = r_regionkey
ORDER BY nationkey
"""


def q_rolling_beta_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-day OLS slope (the trading-desk rolling beta /
    momentum signal): daily revenue regressed on the day index over a
    ROWS 29-PRECEDING frame. Sufficient statistics (n, Σx, Σy, Σxx,
    Σxy) accumulate as exact integers inside the window frame and the
    slope assembles in double with the identical expression on both
    engines — a windowed version of gd_linreg's one-pass rule. Only
    full frames emit (rn ≥ 30). Cents-per-day, rounded 1e-6."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("decimal(19,0)")
        ).alias("cents")
    )
    b = daily.select(
        "day",
        F.datediff(
            "day", F.to_date(F.lit("1992-01-01"))
        ).cast("decimal(10,0)").alias("x"),
        F.col("cents").cast("decimal(19,0)").alias("y"),
    )
    w = Window.orderBy("day").rowsBetween(-29, 0)
    wo = Window.orderBy("day")
    f = b.select(
        "day",
        F.count("*").over(w).cast("double").alias("n"),
        F.sum("x").over(w).cast("double").alias("sx"),
        F.sum("y").over(w).cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("double").alias("sxy"),
        F.row_number().over(wo).alias("rn"),
    ).where(F.col("rn") >= 30)
    beta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return f.select(
        "day",
        F.round(beta, 6).alias("beta_cents_per_day"),
    ).orderBy("day")


_ROLLING_BETA_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
    SUM(CAST(ROUND(o_totalprice * 100) AS DECIMAL(19,0))) AS cents
  FROM orders GROUP BY 1),
b AS (
  SELECT day,
    CAST(date_diff('day', DATE '1992-01-01', day) AS DECIMAL(10,0)) AS x,
    CAST(cents AS DECIMAL(19,0)) AS y
  FROM daily),
f AS (
  SELECT day,
    CAST(COUNT(*) OVER w AS DOUBLE) AS n,
    CAST(SUM(x) OVER w AS DOUBLE) AS sx,
    CAST(SUM(y) OVER w AS DOUBLE) AS sy,
    CAST(SUM(x * x) OVER w AS DOUBLE) AS sxx,
    CAST(SUM(x * y) OVER w AS DOUBLE) AS sxy,
    ROW_NUMBER() OVER (ORDER BY day) AS rn
  FROM b
  WINDOW w AS (ORDER BY day ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
SELECT day,
  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    AS beta_cents_per_day
FROM f WHERE rn >= 30 ORDER BY day
"""


def q_json_roundtrip_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON output-format parity (ClickHouse JSONEachRow ↔ Spark
    to_json ↔ DuckDB to_json emit the identical compact encoding for
    int/string structs — verified here, not assumed): each order row
    serializes to a JSON object, re-parses, and the report counts exact
    string-identity round trips plus field-level re-extraction matches.
    Row-local serialization inside codegen; one aggregation. The
    sanity layer under every JSONEachRow export/ingest pipeline."""
    o = _t(spark, sf_dir, "orders")
    doc = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("p"),
            F.year("o_orderdate").alias("y"),
        )
    )
    b = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.year("o_orderdate").alias("y"),
        doc.alias("j"),
    )
    back_k = F.get_json_object("j", "$.k").cast("bigint")
    back_p = F.get_json_object("j", "$.p")
    back_y = F.get_json_object("j", "$.y").cast("bigint")
    rebuilt = F.concat(
        F.lit('{"k":'), F.col("o_orderkey").cast("string"),
        F.lit(',"p":"'), F.col("o_orderpriority"),
        F.lit('","y":'), F.col("y").cast("string"), F.lit("}"),
    )
    return b.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum((F.col("j") == rebuilt).cast("int"))
        .cast("bigint")
        .alias("n_exact_encoding"),
        F.sum((back_k == F.col("o_orderkey")).cast("int"))
        .cast("bigint")
        .alias("n_key_roundtrip"),
        F.sum((back_p == F.col("o_orderpriority")).cast("int"))
        .cast("bigint")
        .alias("n_priority_roundtrip"),
        F.sum((back_y == F.col("y")).cast("int"))
        .cast("bigint")
        .alias("n_year_roundtrip"),
    )


_JSON_ROUNDTRIP_SQL = """
WITH b AS (
  SELECT o_orderkey, o_orderpriority, year(o_orderdate) AS y,
    to_json(struct_pack(k := o_orderkey, p := o_orderpriority,
                        y := year(o_orderdate)))::VARCHAR AS j
  FROM orders)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CASE WHEN j = '{"k":' || CAST(o_orderkey AS VARCHAR)
    || ',"p":"' || o_orderpriority || '","y":' || CAST(y AS VARCHAR)
    || '}' THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_encoding,
  CAST(SUM(CASE WHEN CAST(json_extract(j, '$.k') AS BIGINT)
    = o_orderkey THEN 1 ELSE 0 END) AS BIGINT) AS n_key_roundtrip,
  CAST(SUM(CASE WHEN json_extract_string(j, '$.p')
    = o_orderpriority THEN 1 ELSE 0 END) AS BIGINT)
    AS n_priority_roundtrip,
  CAST(SUM(CASE WHEN CAST(json_extract(j, '$.y') AS BIGINT) = y
    THEN 1 ELSE 0 END) AS BIGINT) AS n_year_roundtrip
FROM b
"""


def q_binary_encoding_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse binary-encoding family parity — ``base64Encode`` /
    ``base64Decode`` / ``hex`` / ``unhex`` — over each document's md5
    digest bytes: the hex and base64 encodings, a decode-identity
    flag, and the encoded lengths (4·⌈16/3⌉ = 24 with padding; 32 hex
    chars). Row-local codec expressions; per-doc rows keep the hash
    gate byte-honest."""
    docs = _t(spark, sf_dir, "documents")
    dig = F.unhex(F.md5("text"))
    b = docs.select("doc_id", dig.alias("d"))
    return b.select(
        "doc_id",
        F.hex("d").alias("hex"),
        F.base64("d").alias("b64"),
        (F.unbase64(F.base64("d")) == F.col("d")).cast("int").alias(
            "b64_roundtrip_ok"
        ),
        F.length(F.hex("d")).cast("bigint").alias("hex_len"),
        F.length(F.base64("d")).cast("bigint").alias("b64_len"),
    ).orderBy("doc_id")


_BINARY_ENCODING_SQL = """
WITH b AS (
  SELECT doc_id, from_hex(md5(text)) AS d FROM documents)
SELECT doc_id,
  hex(d) AS hex,
  to_base64(d) AS b64,
  CAST(from_base64(to_base64(d)) = d AS INT) AS b64_roundtrip_ok,
  CAST(length(hex(d)) AS BIGINT) AS hex_len,
  CAST(length(to_base64(d)) AS BIGINT) AS b64_len
FROM b ORDER BY doc_id
"""


def q_countmin_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch accuracy audit: a deterministic 4×16 CMS (row
    hashes from md5, no RNG) over event types — per key the exact
    count, the CMS estimate (min over rows of the hashed cell), and the
    overestimate in ppm. CMS cells build in ONE map-side-combinable
    aggregation of (row, col) partials — the fixed-size mergeable-state
    shape that makes CMS the 100 TB heavy-hitter counter — and the
    estimate probe joins the 64-cell table broadcast. Overestimates
    are ≥0 by construction (the test pins the one-sided error
    guarantee)."""
    ev = _t(spark, sf_dir, "events")
    depth, width = 4, 16

    def col_for(r, key):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"cms{r}_"), key)), 1, 8),
                16,
                10,
            ).cast("bigint")
            % width
        )

    rows = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        col_for(r, F.col("event_type")).alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc")
    )
    cells = rows.groupBy(
        F.col("rc.r").alias("r"), F.col("rc.c").alias("c")
    ).agg(F.count("*").alias("cell"))
    exact = ev.groupBy("event_type").agg(F.count("*").alias("exact"))
    probes = exact.select(
        "event_type",
        "exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        col_for(r, F.col("event_type")).alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("event_type", "exact", F.col("rc.r").alias("r"),
             F.col("rc.c").alias("c"))
    est = (
        probes.join(F.broadcast(cells), ["r", "c"])
        .groupBy("event_type", "exact")
        .agg(F.min("cell").alias("cms_estimate"))
    )
    return est.select(
        "event_type",
        F.col("exact").cast("bigint").alias("exact"),
        F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
        (F.col("cms_estimate") - F.col("exact"))
        .cast("bigint")
        .alias("overestimate"),
        F.expr("(cms_estimate - exact) * 1000000 div exact")
        .cast("bigint")
        .alias("overest_ppm"),
    ).orderBy("event_type")


def _countmin_sql(depth: int = 4, width: int = 16) -> str:
    def col_for(r, key):
        return (
            f"('0x' || substr(md5('cms{r}_' || {key}), 1, 8))::BIGINT"
            f" % {width}"
        )

    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS r, {col_for(r, 'event_type')} AS c FROM events"
        for r in range(depth)
    )
    probe_unions = "\nUNION ALL\n".join(
        f"SELECT event_type, exact, {r} AS r,"
        f" {col_for(r, 'event_type')} AS c FROM exact_t"
        for r in range(depth)
    )
    return f"""
WITH rows_t AS ({unions}),
cells AS (SELECT r, c, COUNT(*) AS cell FROM rows_t GROUP BY 1, 2),
exact_t AS (SELECT event_type, COUNT(*) AS exact FROM events GROUP BY 1),
probes AS ({probe_unions}),
est AS (
  SELECT p.event_type, p.exact, MIN(cells.cell) AS cms_estimate
  FROM probes p JOIN cells ON p.r = cells.r AND p.c = cells.c
  GROUP BY 1, 2)
SELECT event_type, CAST(exact AS BIGINT) AS exact,
  CAST(cms_estimate AS BIGINT) AS cms_estimate,
  CAST(cms_estimate - exact AS BIGINT) AS overestimate,
  CAST((cms_estimate - exact) * 1000000 // exact AS BIGINT)
    AS overest_ppm
FROM est ORDER BY event_type
"""


_COUNTMIN_SQL = _countmin_sql()


def q_bloom_filter_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter false-positive audit from first principles: a
    deterministic 256-bit / 4-hash filter (md5-derived bit positions,
    no RNG) built over 1996's active customers, probed with TRUE
    NEGATIVES (customers active in 1997 but not 1996). Reports bits
    set, observed false positives, FPR ppm, and the textbook
    (1−e^(−kn/m))^k expectation — the calibration every
    bloom-semi-join (bloom_semi_join_audit) relies on. Build and probe
    are explode→distinct→equi-join shapes; the filter itself is the
    256-row bit table (broadcast)."""
    o = _t(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    k, m = 4, 256
    a = o.where(yr == 1996).select(F.col("o_custkey").alias("c")).distinct()
    b = o.where(yr == 1997).select(F.col("o_custkey").alias("c")).distinct()
    probes = b.join(a, "c", "left_anti")

    def bits(df):
        return df.select(
            "c",
            F.explode(
                F.array(
                    *[
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.lit(f"bf{r}_"),
                                            F.col("c").cast("string"),
                                        )
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("bigint")
                            % m
                        )
                        for r in range(k)
                    ]
                )
            ).alias("bit"),
        )

    filt = bits(a).select("bit").distinct()
    hit = (
        bits(probes)
        .join(F.broadcast(filt.withColumn("present", F.lit(1))), "bit", "left")
        .groupBy("c")
        .agg(F.sum(F.coalesce("present", F.lit(0))).alias("n_hit"))
    )
    n_ins = a.count()
    n_bits = filt.count()
    theory = (
        1.0 - F.exp(F.lit(-float(k) * n_ins / m))
    ) ** k
    return hit.agg(
        F.lit(n_ins).cast("bigint").alias("n_inserted"),
        F.lit(n_bits).cast("bigint").alias("n_bits_set"),
        F.count("*").cast("bigint").alias("n_true_negative_probes"),
        F.sum((F.col("n_hit") == k).cast("int"))
        .cast("bigint")
        .alias("n_false_positives"),
        F.floor(
            F.sum((F.col("n_hit") == k).cast("int"))
            * 1000000
            / F.count("*")
        )
        .cast("bigint")
        .alias("fpr_ppm"),
        F.floor(theory * 1000000).cast("bigint").alias("theory_fpr_ppm"),
    )


def _bloom_sql(k: int = 4, m: int = 256) -> str:
    def bit(r):
        return (
            f"('0x' || substr(md5('bf{r}_' || CAST(c AS VARCHAR)), 1, 8))"
            f"::BIGINT % {m}"
        )

    a_bits = "\nUNION ALL\n".join(
        f"SELECT c, {bit(r)} AS bit FROM a" for r in range(k)
    )
    p_bits = "\nUNION ALL\n".join(
        f"SELECT c, {bit(r)} AS bit FROM probes" for r in range(k)
    )
    return f"""
WITH a AS (SELECT DISTINCT o_custkey AS c FROM orders
           WHERE year(o_orderdate) = 1996),
b AS (SELECT DISTINCT o_custkey AS c FROM orders
      WHERE year(o_orderdate) = 1997),
probes AS (SELECT c FROM b WHERE c NOT IN (SELECT c FROM a)),
filt AS (SELECT DISTINCT bit FROM ({a_bits})),
pb AS ({p_bits}),
hit AS (
  SELECT pb.c, SUM(CASE WHEN filt.bit IS NOT NULL THEN 1 ELSE 0 END)
    AS n_hit
  FROM pb LEFT JOIN filt ON pb.bit = filt.bit GROUP BY pb.c)
SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_inserted,
  CAST((SELECT COUNT(*) FROM filt) AS BIGINT) AS n_bits_set,
  CAST(COUNT(*) AS BIGINT) AS n_true_negative_probes,
  CAST(SUM(CASE WHEN n_hit = {k} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_false_positives,
  CAST(FLOOR(SUM(CASE WHEN n_hit = {k} THEN 1 ELSE 0 END) * 1000000.0
       / COUNT(*)) AS BIGINT) AS fpr_ppm,
  CAST(FLOOR(power(1.0 - exp(-{float(k)} * (SELECT COUNT(*) FROM a)
       / {m}), {k}) * 1000000) AS BIGINT) AS theory_fpr_ppm
FROM hit
"""


_BLOOM_FPR_SQL = _bloom_sql()


def q_hll_manual_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog from first principles, bit-deterministic: 64
    registers fed by a 60-bit md5 hash (bucket = low 6 bits, rho =
    leading-zero rank of the remaining 54 bits), per event type. The
    register sum Σ2^(−Mj) is computed as the EXACT integer Σ2^(55−Mj)
    (a ≤61-bit sum — no order-dependent float accumulation), so the
    raw estimate is bit-identical on any engine/partition order. Small-
    range correction (m·ln(m/V)) applied exactly as the paper says.
    Reports exact uniques, the HLL estimate, and signed error in ppm —
    the audit that justifies approx_count_distinct's error envelope."""
    ev = _t(spark, sf_dir, "events")
    m = 64
    x = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    bucket = x % m
    w = F.floor(x / m).cast("bigint")
    bitlen = F.when(w > 0, F.length(F.conv(w, 10, 2))).otherwise(F.lit(0))
    rho = (F.lit(55) - bitlen).cast("int")  # 54-bit field: lz + 1
    regs = (
        ev.select("event_type", bucket.alias("b"), rho.alias("rho"))
        .groupBy("event_type", "b")
        .agg(F.max("rho").alias("M"))
    )
    spine = (
        ev.select("event_type").distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("b"),
        )
    )
    full = spine.join(regs, ["event_type", "b"], "left").select(
        "event_type", F.coalesce("M", F.lit(0)).alias("M")
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = full.groupBy("event_type").agg(
        F.sum(F.pow(F.lit(2.0), F.lit(55) - F.col("M")).cast("bigint"))
        .alias("z_scaled"),
        F.sum((F.col("M") == 0).cast("int")).alias("v_zero"),
    )
    raw = (
        F.lit(alpha * m * m)
        * F.lit(float(2**55))
        / F.col("z_scaled").cast("double")
    )
    est = F.when(
        (raw <= 2.5 * m) & (F.col("v_zero") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_zero")),
    ).otherwise(raw)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact")
    )
    return (
        agg.join(exact, "event_type")
        .select(
            "event_type",
            F.col("exact").cast("bigint").alias("exact_uniques"),
            F.round(est, 4).alias("hll_estimate"),
            F.floor((est - F.col("exact")) * 1000000 / F.col("exact"))
            .cast("bigint")
            .alias("signed_err_ppm"),
        )
        .orderBy("event_type")
    )


_HLL_MANUAL_SQL = """
WITH h AS (
  SELECT event_type,
    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS x,
    user_id
  FROM events),
r AS (
  SELECT event_type, x % 64 AS b,
    CAST(55 - (CASE WHEN CAST(FLOOR(x / 64) AS BIGINT) > 0
      THEN length(bin(CAST(FLOOR(x / 64) AS BIGINT))) ELSE 0 END)
      AS INT) AS rho
  FROM h),
regs AS (SELECT event_type, b, MAX(rho) AS M FROM r GROUP BY 1, 2),
spine AS (
  SELECT event_type, CAST(unnest(generate_series(0, 63)) AS BIGINT) AS b
  FROM (SELECT DISTINCT event_type FROM events)),
full_regs AS (
  SELECT s.event_type, COALESCE(regs.M, 0) AS M
  FROM spine s LEFT JOIN regs
    ON s.event_type = regs.event_type AND s.b = regs.b),
agg AS (
  SELECT event_type,
    SUM(CAST(power(2.0, 55 - M) AS BIGINT)) AS z_scaled,
    SUM(CASE WHEN M = 0 THEN 1 ELSE 0 END) AS v_zero
  FROM full_regs GROUP BY 1),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact FROM events
  GROUP BY 1),
est AS (
  SELECT a.event_type, e.exact,
    CASE WHEN (0.7213 / (1.0 + 1.079 / 64) * 64 * 64)
           * 36028797018963968.0 / CAST(a.z_scaled AS DOUBLE)
           <= 2.5 * 64 AND a.v_zero > 0
      THEN 64.0 * ln(64.0 / a.v_zero)
      ELSE (0.7213 / (1.0 + 1.079 / 64) * 64 * 64)
           * 36028797018963968.0 / CAST(a.z_scaled AS DOUBLE) END AS est
  FROM agg a JOIN exact e ON a.event_type = e.event_type)
SELECT event_type, CAST(exact AS BIGINT) AS exact_uniques,
  ROUND(est, 4) AS hll_estimate,
  CAST(FLOOR((est - exact) * 1000000 / exact) AS BIGINT)
    AS signed_err_ppm
FROM est ORDER BY event_type
"""


def q_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): every doc
    scores under an add-one-smoothed corpus bigram LM (one count pass;
    the LM is the broadcast side), per-token negative log-likelihood
    becomes the doc's pseudo-perplexity, and docs split into
    head/middle/tail TERCILES — the quality tiers CCNet keeps/reweights
    /drops. Tercile cuts use exact rank arithmetic (ntile with total-
    order tie-break on doc_id). Report per bucket: docs, token mass,
    and the mean nll (micro-rounded). The filter that decides what a
    100 TB crawl keeps — one corpus pass for the LM, one for
    scoring."""
    docs = _t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    d = docs.select("doc_id", toks.alias("t"), F.size(toks).alias("n"))
    big = d.select(
        "doc_id",
        "n",
        F.explode(
            F.when(
                F.col("n") >= 2,
                F.transform(
                    F.sequence(F.lit(2), F.col("n")),
                    lambda i: F.struct(
                        F.element_at(F.col("t"), i - 1).alias("w1"),
                        F.element_at(F.col("t"), i).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast(
                "array<struct<w1:string,w2:string>>"
            ))
        ).alias("bg"),
    ).select("doc_id", "n", F.col("bg.w1").alias("w1"),
             F.col("bg.w2").alias("w2"))
    bg_counts = big.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    un_counts = big.groupBy("w1").agg(F.count("*").alias("cu"))
    vocab = big.select(F.col("w2").alias("w")).union(
        big.select("w1")
    ).distinct().count()
    scored = (
        big.join(F.broadcast(bg_counts), ["w1", "w2"])
        .join(F.broadcast(un_counts), "w1")
        .select(
            "doc_id",
            "n",
            (
                -F.log(
                    (F.col("cb") + 1).cast("double")
                    / (F.col("cu") + vocab).cast("double")
                )
            ).alias("nll"),
        )
    )
    per_doc = scored.groupBy("doc_id", "n").agg(
        (
            F.sum(F.round(F.col("nll") * 1e9).cast("decimal(38,0)"))
            .cast("double")
            / 1e9
            / F.greatest(F.col("n") - 1, F.lit(1))
        ).alias("nll_per_tok")
    )
    # per_doc is one row per document — corpus-proportional, so the
    # tercile split is the distributed NTILE (ranged shuffle + broadcast
    # offsets), never a single-partition window
    bucketed = RK.global_ntile(
        per_doc, ["nll_per_tok", "doc_id"], 3, col_name="tercile"
    ).withColumn(
        "bucket",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
            F.col("tercile"),
        ),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(
                    F.round(F.col("nll_per_tok") * 1e6).cast("decimal(38,0)")
                ).cast("double")
                / F.count("*")
                / 1e6,
                6,
            ).alias("mean_nll_per_tok"),
        )
        .orderBy("bucket")
    )


def _ccnet_ppl_sql() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, {_TOKS_SQL} AS t, len({_TOKS_SQL}) AS n FROM documents),
big AS (
  SELECT doc_id, n, t[i - 1] AS w1, t[i] AS w2
  FROM d, unnest(CASE WHEN n >= 2 THEN generate_series(2, n)
                 ELSE [] END) AS u(i)),
bg AS (SELECT w1, w2, COUNT(*) AS cb FROM big GROUP BY 1, 2),
un AS (SELECT w1, COUNT(*) AS cu FROM big GROUP BY 1),
v AS (SELECT COUNT(*) AS vocab FROM (
  SELECT DISTINCT w FROM (SELECT w2 AS w FROM big
                          UNION ALL SELECT w1 FROM big))),
scored AS (
  SELECT b.doc_id, b.n,
    -ln(CAST(bg.cb + 1 AS DOUBLE) / CAST(un.cu + v.vocab AS DOUBLE))
      AS nll
  FROM big b JOIN bg ON b.w1 = bg.w1 AND b.w2 = bg.w2
  JOIN un ON b.w1 = un.w1 CROSS JOIN v),
per_doc AS (
  SELECT doc_id, n,
    CAST(SUM(CAST(ROUND(nll * 1e9) AS DECIMAL(38,0))) AS DOUBLE) / 1e9
      / greatest(n - 1, 1) AS nll_per_tok
  FROM scored GROUP BY 1, 2),
bucketed AS (
  SELECT *, ntile(3) OVER (ORDER BY nll_per_tok, doc_id) AS tercile
  FROM per_doc)
SELECT CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
       ELSE 'tail' END AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n) AS BIGINT) AS n_tokens,
  ROUND(CAST(SUM(CAST(ROUND(nll_per_tok * 1e6) AS DECIMAL(38,0)))
        AS DOUBLE) / COUNT(*) / 1e6, 6) AS mean_nll_per_tok
FROM bucketed GROUP BY tercile ORDER BY bucket
"""


_CCNET_PPL_SQL = _ccnet_ppl_sql()


def q_conformal_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal interval calibration on the daily revenue
    series: the first 70% of days (by date) calibrate — residuals of
    the seasonal-naive (lag-7) forecast yield the discrete ceil(0.9·
    (n+1))-rank absolute-residual quantile — and the held-out 30%
    measure empirical coverage of ±q̂ bands. Everything is exact
    integer cents and rank arithmetic (no model, no floats until the
    final ppm), so the coverage guarantee audit is bit-reproducible —
    the distribution-free uncertainty wrapper any forecast sink
    (R10's bounds columns) can cite."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("decimal(19,0)")
        ).cast("bigint").alias("cents")
    )
    w = Window.orderBy("day")
    b = daily.select(
        "day",
        "cents",
        F.lag("cents", 7).over(w).alias("pred"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(
            Window.rangeBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_days"),
    ).where(F.col("pred").isNotNull())
    split = F.floor(F.col("n_days") * 7 / 10).cast("int")
    b = b.withColumn("is_cal", (F.col("rn") <= split).cast("int")).withColumn(
        "abs_res", F.abs(F.col("cents") - F.col("pred"))
    )
    cal = b.where("is_cal = 1")
    wq = Window.orderBy("abs_res", "day")
    n_cal = cal.count()
    import math as _math

    q_rank = _math.ceil(0.9 * (n_cal + 1))
    q_rank = min(q_rank, n_cal)
    qhat = (
        cal.withColumn("r", F.row_number().over(wq))
        .where(F.col("r") == q_rank)
        .select(F.col("abs_res").alias("qhat"))
    )
    test = b.where("is_cal = 0").crossJoin(F.broadcast(qhat))
    return test.agg(
        F.lit(n_cal).cast("bigint").alias("n_calibration"),
        F.count("*").cast("bigint").alias("n_test"),
        F.max("qhat").cast("bigint").alias("qhat_cents"),
        F.sum((F.col("abs_res") <= F.col("qhat")).cast("int"))
        .cast("bigint")
        .alias("n_covered"),
        F.floor(
            F.sum((F.col("abs_res") <= F.col("qhat")).cast("int"))
            * 1000000
            / F.count("*")
        )
        .cast("bigint")
        .alias("coverage_ppm"),
    )


_CONFORMAL_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS DECIMAL(19,0)))
         AS BIGINT) AS cents
  FROM orders GROUP BY 1),
b0 AS (
  SELECT day, cents,
    LAG(cents, 7) OVER (ORDER BY day) AS pred,
    ROW_NUMBER() OVER (ORDER BY day) AS rn,
    COUNT(*) OVER () AS n_days
  FROM daily),
b AS (
  SELECT *, CAST(FLOOR(n_days * 7 / 10) AS INT) AS split,
    abs(cents - pred) AS abs_res
  FROM b0 WHERE pred IS NOT NULL),
cal AS (SELECT * FROM b WHERE rn <= split),
nq AS (SELECT COUNT(*) AS n_cal FROM cal),
qh AS (
  SELECT abs_res AS qhat FROM (
    SELECT abs_res, ROW_NUMBER() OVER (ORDER BY abs_res, day) AS r
    FROM cal), nq
  WHERE r = least(CAST(CEIL(0.9 * (n_cal + 1)) AS BIGINT), n_cal)),
test AS (SELECT * FROM b WHERE rn > split)
SELECT CAST((SELECT n_cal FROM nq) AS BIGINT) AS n_calibration,
  CAST(COUNT(*) AS BIGINT) AS n_test,
  CAST(MAX(qh.qhat) AS BIGINT) AS qhat_cents,
  CAST(SUM(CASE WHEN test.abs_res <= qh.qhat THEN 1 ELSE 0 END)
       AS BIGINT) AS n_covered,
  CAST(FLOOR(SUM(CASE WHEN test.abs_res <= qh.qhat THEN 1 ELSE 0 END)
       * 1000000.0 / COUNT(*)) AS BIGINT) AS coverage_ppm
FROM test, qh
"""


def q_psi_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — the model-monitoring drift metric —
    between 1996 (reference) and 1997 (current) order totals: decile
    breakpoints come from the REFERENCE year's exact discrete deciles
    (rank arithmetic on cents), both years histogram against those
    fixed cuts, and PSI = Σ(p−q)·ln(p/q) with Laplace-smoothed shares.
    One pass per year + a broadcast 9-row cut table; the report also
    flags the standard 0.1/0.25 thresholds. ln folds on micro-rounded
    shares keep the statistic cross-engine exact. Sketch dual for the
    cut table: psi_cuts_sketch_audit (approx_percentile cuts with a
    rank-error verdict — the one-aggregation 100 TB path)."""
    o = _t(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    ref = o.where(yr == 1996).select(cents.alias("c"))
    cur = o.where(yr == 1997).select(cents.alias("c"))
    # decile ranks come from the DISTRIBUTED global row_number
    # (operators/ranking: range-partitioned + broadcast offsets — no
    # single-partition window; the value at a given global rank is
    # deterministic regardless of tie order within equal cents). The 9
    # cut values are a bounded <= 9-row fetch; bucketing is then a
    # row-local array scan — no join, and duplicate cent values keep
    # their full multiplicity
    ranked_ref = RK.global_row_number(ref, ["c"], col_name="r")
    n_ref = ranked_ref.count()
    cut_vals = sorted(
        {
            r.c
            for r in ranked_ref.where(
                F.col("r").isin(*[(n_ref * d) // 10 for d in range(1, 10)])
            ).collect()
        }
    )
    cuts_arr = F.array(*[F.lit(int(v)) for v in cut_vals])

    def bucketize(df):
        b = F.size(F.filter(cuts_arr, lambda cut: cut < F.col("c")))
        return df.select(b.alias("b")).groupBy("b").agg(
            F.count("*").alias("n")
        )

    p = bucketize(ref).select(F.col("b"), F.col("n").alias("np"))
    q_ = bucketize(cur).select(F.col("b"), F.col("n").alias("nq"))
    spine = spark.range(0, 10).select(F.col("id").cast("int").alias("b"))
    j = (
        spine.join(p, "b", "left")
        .join(q_, "b", "left")
        .select(
            "b",
            F.coalesce("np", F.lit(0)).alias("np"),
            F.coalesce("nq", F.lit(0)).alias("nq"),
        )
    )
    tot = Window.rangeBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    shares = j.select(
        "b",
        "np",
        "nq",
        (
            (F.col("np") + 1).cast("double")
            / (F.sum("np").over(tot) + 10).cast("double")
        ).alias("ps"),
        (
            (F.col("nq") + 1).cast("double")
            / (F.sum("nq").over(tot) + 10).cast("double")
        ).alias("qs"),
    )
    term = (F.col("ps") - F.col("qs")) * F.log(F.col("ps") / F.col("qs"))
    return shares.agg(
        F.sum("np").cast("bigint").alias("n_ref"),
        F.sum("nq").cast("bigint").alias("n_cur"),
        F.round(
            F.sum(F.round(term * 1e9).cast("decimal(38,0)")).cast("double")
            / 1e9,
            6,
        ).alias("psi"),
        (
            F.sum(F.round(term * 1e9).cast("decimal(38,0)")).cast("double")
            / 1e9
            >= 0.1
        ).cast("int").alias("drift_warning"),
        (
            F.sum(F.round(term * 1e9).cast("decimal(38,0)")).cast("double")
            / 1e9
            >= 0.25
        ).cast("int").alias("drift_alert"),
    )


_PSI_SQL = """
WITH ref AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders
  WHERE year(o_orderdate) = 1996),
cur AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders
  WHERE year(o_orderdate) = 1997),
nref AS (SELECT COUNT(*) AS n FROM ref),
cuts AS (
  SELECT list(DISTINCT cut ORDER BY cut) AS cl FROM (
    SELECT c AS cut FROM (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS r FROM ref), nref
    WHERE r IN (n * 1 // 10, n * 2 // 10, n * 3 // 10, n * 4 // 10,
                n * 5 // 10, n * 6 // 10, n * 7 // 10, n * 8 // 10,
                n * 9 // 10))),
pb AS (
  SELECT b, COUNT(*) AS np FROM (
    SELECT len(list_filter((SELECT cl FROM cuts), x -> x < c)) AS b
    FROM ref)
  GROUP BY b),
qb AS (
  SELECT b, COUNT(*) AS nq FROM (
    SELECT len(list_filter((SELECT cl FROM cuts), x -> x < c)) AS b
    FROM cur)
  GROUP BY b),
spine AS (SELECT unnest(generate_series(0, 9)) AS b),
j AS (
  SELECT spine.b, COALESCE(pb.np, 0) AS np, COALESCE(qb.nq, 0) AS nq
  FROM spine LEFT JOIN pb ON spine.b = pb.b
  LEFT JOIN qb ON spine.b = qb.b),
shares AS (
  SELECT b, np, nq,
    CAST(np + 1 AS DOUBLE) / CAST(SUM(np) OVER () + 10 AS DOUBLE) AS ps,
    CAST(nq + 1 AS DOUBLE) / CAST(SUM(nq) OVER () + 10 AS DOUBLE) AS qs
  FROM j)
SELECT CAST(SUM(np) AS BIGINT) AS n_ref,
  CAST(SUM(nq) AS BIGINT) AS n_cur,
  ROUND(CAST(SUM(CAST(ROUND((ps - qs) * ln(ps / qs) * 1e9)
        AS DECIMAL(38,0))) AS DOUBLE) / 1e9, 6) AS psi,
  CAST(CAST(SUM(CAST(ROUND((ps - qs) * ln(ps / qs) * 1e9)
        AS DECIMAL(38,0))) AS DOUBLE) / 1e9 >= 0.1 AS INT)
    AS drift_warning,
  CAST(CAST(SUM(CAST(ROUND((ps - qs) * ln(ps / qs) * 1e9)
        AS DECIMAL(38,0))) AS DOUBLE) / 1e9 >= 0.25 AS INT)
    AS drift_alert
FROM shares
"""


def q_ship_delay_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch dual of bucketed_percentile_error's exact side (r5 VERDICT
    #6 — the 100 TB path as a NAMED query, not a docstring promise):
    p50/p90/p99 ship delay via approx_percentile (KLL-class mergeable
    sketch, fixed state, one pass) judged against the exact order
    statistic computed distributed (min delay whose cumulative per-value
    count reaches ceil(q·n) — the bounded-domain recipe the exact query
    uses). The hashable surface is the exact value plus an in-query
    tolerance verdict on the sketch (the sketch_rollup_daily_users
    pattern): accuracy=10000 bounds rank error at n/10000, so a ±2-day
    drift on integer day delays means the sketch or its merge broke —
    and the flipped verdict breaks the oracle hash."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    delays = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("delay")
    ).localCheckpoint(eager=True)
    qs_ = [(50, 0.50), (90, 0.90), (99, 0.99)]
    n1 = delays.agg(F.count("*").alias("n"))
    # exact side: per-value counts (delay domain is schema-bounded,
    # shipdate − orderdate ∈ [1, 121]). The delays checkpoint erased the
    # datediff lineage, so this ≤122-row frame is checkpointed WITH a
    # __bounded marker (the documented census convention for provably
    # tiny checkpoints) — which also means the three quantile picks
    # reread 122 rows instead of re-aggregating the fact checkpoint
    vc = (
        delays.groupBy("delay")
        .agg(F.count("*").alias("c"))
        .withColumn("__bounded_delay_domain_1_to_121", F.lit(1))
        .localCheckpoint(eager=True)
    )
    wv = Window.orderBy("delay").rowsBetween(Window.unboundedPreceding, 0)
    cumv = (
        vc.withColumn("cumc", F.sum("c").over(wv))
        .crossJoin(F.broadcast(n1))
    )
    sk = delays.agg(
        F.percentile_approx(
            "delay", [q for _, q in qs_], 10_000
        ).alias("sk_arr")
    ).select(
        F.posexplode("sk_arr").alias("pos", "sketch_days")
    )
    exact = None
    for i, (label, q) in enumerate(qs_):
        k = F.greatest(F.ceil(F.lit(q) * F.col("n")), F.lit(1))
        pick = (
            cumv.filter(F.col("cumc") >= k)
            .orderBy("delay")
            .limit(1)
            .select(
                F.lit(label).cast("bigint").alias("p"),
                F.lit(i).alias("pos"),
                F.col("delay").cast("bigint").alias("exact_days"),
            )
        )
        exact = pick if exact is None else exact.unionByName(pick)
    return (
        exact.join(F.broadcast(sk), "pos")
        .select(
            "p",
            "exact_days",
            (F.abs(F.col("sketch_days") - F.col("exact_days")) <= 2).alias(
                "sketch_within_2d"
            ),
        )
        .orderBy("p")
    )


_SHIP_DELAY_SKETCH_SQL = """
WITH delays AS (
  SELECT datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
    AS delay
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
n AS (SELECT COUNT(*) AS n FROM delays),
vc AS (SELECT delay, COUNT(*) AS c FROM delays GROUP BY delay),
cumv AS (
  SELECT delay, SUM(c) OVER (ORDER BY delay
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
  FROM vc),
qs AS (SELECT * FROM (VALUES (50, 0.50), (90, 0.90), (99, 0.99)) t(p, q))
SELECT CAST(p AS BIGINT) AS p,
  CAST((SELECT MIN(delay) FROM cumv
        WHERE cumc >= GREATEST(CEIL(q * (SELECT n FROM n)), 1)) AS BIGINT)
    AS exact_days,
  TRUE AS sketch_within_2d
FROM qs ORDER BY p
"""


def q_psi_cuts_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch dual of psi_drift_report's exact decile cuts (r5 VERDICT
    #6): the reference-year cut table from approx_percentile instead of
    the distributed exact rank. The sketch guarantees rank error
    <= n/accuracy, so the audit verifies each sketch cut's REALIZED rank
    (count of cents strictly below it) lands within n·5e-4 + 1 of the
    target decile rank — a verdict both engines can hash (DuckDB emits
    the expected TRUE; a broken sketch flips Spark's side). At 100 TB
    the sketch path replaces the ranged shuffle with one mergeable-state
    aggregation — this query IS that path, permanently pinned against
    the exact one."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    ref = o.where(F.year("o_orderdate") == 1996).select(cents.alias("c"))
    ref = ref.localCheckpoint(eager=True)
    n1 = ref.agg(F.count("*").alias("n"))
    cuts = ref.agg(
        F.percentile_approx("c", [d / 10.0 for d in range(1, 10)], 10_000).alias(
            "arr"
        )
    ).select(F.posexplode("arr").alias("pos", "cut"))
    ranks = (
        ref.crossJoin(F.broadcast(cuts))
        .groupBy("pos", "cut")
        .agg(F.sum((F.col("c") < F.col("cut")).cast("long")).alias("realized_rank"))
        .crossJoin(F.broadcast(n1))
    )
    d = F.col("pos") + 1
    # exact integer division (a double divide could land on x.9999…)
    target = F.expr("n * (pos + 1) div 10").cast("bigint")
    tol = F.ceil(F.col("n") * 5e-4) + 1
    return ranks.select(
        d.cast("bigint").alias("decile"),
        F.col("n").cast("bigint").alias("n_ref"),
        target.alias("target_rank"),
        (F.abs(F.col("realized_rank") - target) <= tol).alias(
            "sketch_rank_within_tol"
        ),
    ).orderBy("decile")


_PSI_CUTS_SKETCH_SQL = """
WITH ref AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders
  WHERE year(o_orderdate) = 1996),
n AS (SELECT COUNT(*) AS n FROM ref)
SELECT CAST(d AS BIGINT) AS decile,
  CAST((SELECT n FROM n) AS BIGINT) AS n_ref,
  CAST((SELECT n FROM n) * d // 10 AS BIGINT) AS target_rank,
  TRUE AS sketch_rank_within_tol
FROM unnest(generate_series(1, 9)) t(d) ORDER BY decile
"""


def q_negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec negative-sampling distribution (Mikolov et al. 2013):
    unigram counts raised to the 3/4 power, normalized to ppm, with the
    cumulative distribution that an alias/binary-search sampler walks.
    One token-count pass; the vocabulary grows with the corpus (Heaps'
    law), so the cumulative sum is the distributed running sum
    (operators/ranking.py) and the normalizer is max(cumulative) off the
    same checkpointed frame. Weights are micro-rounded integers before
    the exact cumulative sum, so the table is bit-identical on both
    engines."""
    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(TX.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    w_micro = F.round(F.pow(F.col("c").cast("double"), 0.75) * 1e6).cast(
        "bigint"
    )
    b = counts.select("tok", "c", w_micro.alias("w"))
    cum = RK.global_running_sum(b, ["tok"], ["w"], ["cum_w"])
    tot = cum.agg(F.max("cum_w").cast("bigint").alias("tot_w"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "tok",
            F.col("c").cast("bigint").alias("count"),
            F.expr("w * 1000000 div tot_w").cast("bigint").alias("prob_ppm"),
            F.expr("cum_w * 1000000 div tot_w").cast("bigint").alias("cum_ppm"),
        )
        .orderBy("tok")
    )


_NEG_SAMPLING_SQL = f"""
WITH counts AS (
  SELECT tok, COUNT(*) AS c FROM (
    SELECT unnest({_TOKS_SQL}) AS tok FROM documents)
  GROUP BY tok),
b AS (
  SELECT tok, c,
    CAST(ROUND(power(CAST(c AS DOUBLE), 0.75) * 1e6) AS BIGINT) AS w
  FROM counts)
SELECT tok, CAST(c AS BIGINT) AS count,
  CAST(w * 1000000 // SUM(w) OVER () AS BIGINT) AS prob_ppm,
  CAST(SUM(w) OVER (ORDER BY tok ROWS UNBOUNDED PRECEDING) * 1000000
       // SUM(w) OVER () AS BIGINT) AS cum_ppm
FROM b ORDER BY tok
"""


def q_t5_span_corruption_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption, deterministically seeded: a position is
    a span START iff md5(doc_id, position) lands under the rate
    threshold (~5%), each span masks 3 tokens (clipped at the doc end),
    overlaps merge by construction (a position is masked iff ANY of the
    3 preceding starts fired). Per doc: tokens, span starts, masked
    tokens, and the corruption ratio in ppm — the exact preprocessing
    census a masked-LM data pipeline audits before training. All
    row-local array lambdas; hash-seeded, so any engine/rerun draws the
    same masks."""
    docs = _t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    d = docs.select("doc_id", F.size(toks).alias("n"))
    idx = F.sequence(F.lit(1), F.col("n"))
    is_start = lambda i: (  # noqa: E731
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit("_"),
                        i.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
        < 5
    )
    starts = F.filter(idx, is_start)
    masked = F.filter(
        idx,
        lambda i: F.exists(
            starts, lambda s: (s <= i) & (i < s + 3)
        ),
    )
    b = d.select(
        "doc_id",
        "n",
        F.size(starts).alias("n_spans"),
        F.size(masked).alias("n_masked"),
    )
    return b.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.col("n_spans").cast("bigint").alias("n_span_starts"),
        F.col("n_masked").cast("bigint").alias("n_masked"),
        F.expr("n_masked * 1000000 div greatest(n, 1)")
        .cast("bigint")
        .alias("corruption_ppm"),
    ).orderBy("doc_id")


_T5_SPAN_SQL = f"""
WITH d AS (
  SELECT doc_id, len({_TOKS_SQL}) AS n FROM documents),
b AS (
  SELECT doc_id, n,
    list_filter(generate_series(1, n),
      i -> ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_'
            || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 100 < 5) AS starts
  FROM d)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
  CAST(len(starts) AS BIGINT) AS n_span_starts,
  CAST(len(list_filter(generate_series(1, n),
    i -> len(list_filter(starts, s -> s <= i AND i < s + 3)) > 0))
    AS BIGINT) AS n_masked,
  CAST(len(list_filter(generate_series(1, n),
    i -> len(list_filter(starts, s -> s <= i AND i < s + 3)) > 0))
    * 1000000 // greatest(n, 1) AS BIGINT) AS corruption_ppm
FROM b ORDER BY doc_id
"""


def q_dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup keeper: near-dup components (the iterative
    min-label operator over the shared LSH pairs) keep the member with
    the HIGHEST quality score (Gopher-style token count × stopword
    signal; ties → min doc_id) instead of the naive min-id — the policy
    real corpora want, since the canonical copy should be the best one.
    Per component: kept doc, members, dropped count, and whether the
    quality keeper disagrees with min-id. Components are tiny; the
    expensive stages (pairs, labels) are the family's shared passes."""
    docs = _t(spark, sf_dir, "documents")
    pairs = DD.lsh_verified_pairs(docs, threshold=0.8, cache_key=sf_dir)
    comp = DD.connected_components(pairs)
    toks = TX.tokens(F.col("text"))
    stop_en = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    quality = (
        F.size(toks) * 10
        + F.size(F.filter(toks, lambda x: F.array_contains(stop_en, x)))
    )
    q_ = docs.select(F.col("doc_id").alias("id"), quality.alias("q"))
    j = comp.join(q_, "id")
    keeper = (
        j.groupBy("component")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.max_by(
                F.col("id"), F.struct(F.col("q").alias("q"),
                                      (-F.col("id")).alias("nid"))
            ).alias("kept_id"),
            F.min("id").alias("min_id"),
        )
    )
    return (
        keeper.select(
            F.col("component").cast("bigint").alias("component"),
            "n_members",
            F.col("kept_id").cast("bigint").alias("kept_id"),
            (F.col("n_members") - 1).cast("bigint").alias("n_dropped"),
            (F.col("kept_id") != F.col("min_id")).cast("int").alias(
                "keeper_differs_from_min_id"
            ),
        )
        .orderBy("component")
    )


def _dedup_best_sql() -> str:
    # reuse the candidate/verify chain from _JACCARD_SQL (the shared
    # dedup constants), close components with the same reach()
    # transitive closure the dedup_components twin uses, then take the
    # quality argmax per component via a rank window
    body = _JACCARD_SQL.split("SELECT id_a")[0]
    # body ends after the `verified` CTE; make the whole chain RECURSIVE
    body = body.replace("WITH s AS", "WITH RECURSIVE s AS", 1)
    return f"""{body}
, pairs AS (
  SELECT id_a, id_b FROM verified WHERE jaccard >= 0.8),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach(s2, t2) AS (
  SELECT src, src FROM edges
  UNION
  SELECT r.s2, e.dst FROM reach r JOIN edges e ON r.t2 = e.src),
labels AS (
  SELECT s2 AS id, MIN(t2) AS component FROM reach GROUP BY s2),
toks AS (
  SELECT doc_id AS id,
    len({_TOKS_SQL}) * 10
    + len(list_filter({_TOKS_SQL}, x -> list_contains(
        ['the','and','of','to','in','is','that','it','for','was'], x)))
      AS q
  FROM documents),
j AS (SELECT l.id, l.component, t.q FROM labels l JOIN toks t
      ON l.id = t.id),
ranked AS (
  SELECT component, id, q,
    ROW_NUMBER() OVER (PARTITION BY component
                       ORDER BY q DESC, id) AS rnk,
    COUNT(*) OVER (PARTITION BY component) AS n_members,
    MIN(id) OVER (PARTITION BY component) AS min_id
  FROM j)
SELECT CAST(component AS BIGINT) AS component,
  CAST(n_members AS BIGINT) AS n_members,
  CAST(id AS BIGINT) AS kept_id,
  CAST(n_members - 1 AS BIGINT) AS n_dropped,
  CAST(id <> min_id AS INT) AS keeper_differs_from_min_id
FROM ranked WHERE rnk = 1 ORDER BY component
"""


def q_retrieval_metrics_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-evaluation metrics for the similarity stack — NDCG@10,
    MRR, and recall@10 per query — with binary relevance defined as
    label agreement (the standard proxy when no judgments exist): each
    of the 20 lowest-id query vectors ranks the corpus by cosine
    (self excluded, total-order tie-break), relevant = same label.
    DCG discounts are Σ rel/log2(rank+1) micro-rounded before
    summation; ideal DCG uses the query's relevant-count (capped at
    10). The scoring pass is the broadcast-query brute-force shape —
    at scale the same metrics run over the LSH/IVF candidate lists to
    measure THEIR recall (similarity_recall_report's companion)."""
    emb = _t(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("q_label"),
    )
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, v: acc + v
    )
    dot = fold(
        F.zip_with(
            "embedding", "qvec",
            lambda a, b: a.cast("double") * b.cast("double"),
        )
    )
    na = F.sqrt(
        fold(F.transform(
            "embedding", lambda x: x.cast("double") * x.cast("double")))
    )
    nb = F.sqrt(
        fold(F.transform(
            "qvec", lambda x: x.cast("double") * x.cast("double")))
    )
    scored = (
        emb.crossJoin(F.broadcast(qset))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "q_label",
            "vec_id",
            (F.col("label") == F.col("q_label")).cast("int").alias("rel"),
            F.round(dot / (na * nb), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    dcg_term = F.when(
        (F.col("rnk") <= 10) & (F.col("rel") == 1),
        F.round(
            F.lit(1e6) / F.log2(F.col("rnk").cast("double") + 1.0)
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    per_q = ranked.groupBy("q_id").agg(
        F.sum("rel").alias("n_relevant"),
        F.sum(dcg_term).alias("dcg_micro"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("first_rel"),
        F.sum(
            ((F.col("rnk") <= 10) & (F.col("rel") == 1)).cast("int")
        ).alias("hits_at_10"),
    )
    ideal_k = F.least(F.col("n_relevant"), F.lit(10)).cast("int")
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.greatest(ideal_k, F.lit(1))),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + F.when(
            i <= ideal_k,
            F.round(F.lit(1e6) / F.log2(i.cast("double") + 1.0)).cast(
                "bigint"
            ),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    return (
        per_q.select(
            "q_id",
            F.col("n_relevant").cast("bigint").alias("n_relevant"),
            F.expr("dcg_micro").cast("bigint").alias("dcg_micro"),
            idcg.alias("idcg_micro"),
            F.floor(
                F.col("dcg_micro") * 1000000 / F.greatest(idcg, F.lit(1))
            )
            .cast("bigint")
            .alias("ndcg_ppm"),
            # zero-relevant guard: a query with no same-label neighbor
            # has first_rel NULL and n_relevant 0 — report 0, not a
            # silently-vanishing NULL row (ADVICE r3)
            F.coalesce(
                F.floor(F.lit(1e6) / F.col("first_rel")).cast("bigint"),
                F.lit(0).cast("bigint"),
            ).alias("rr_micro"),
            F.col("hits_at_10").cast("bigint").alias("hits_at_10"),
            F.coalesce(
                F.floor(
                    F.col("hits_at_10")
                    * 1e6
                    / F.greatest(
                        F.least(F.col("n_relevant"), F.lit(10)), F.lit(1)
                    )
                ).cast("bigint"),
                F.lit(0).cast("bigint"),
            ).alias("recall10_ppm"),
        )
        .orderBy("q_id")
    )


_RETRIEVAL_METRICS_SQL = """
WITH qset AS (
  SELECT vec_id AS q_id, embedding AS qvec, label AS q_label
  FROM embeddings WHERE vec_id < 20),
scored AS (
  SELECT q.q_id, q.q_label, e.vec_id,
    CAST(e.label = q.q_label AS INT) AS rel,
    ROUND(list_sum(list_transform(generate_series(1, len(e.embedding)),
        i -> e.embedding[i]::DOUBLE * q.qvec[i]::DOUBLE))
      / (sqrt(list_sum(list_transform(e.embedding,
           x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform(q.qvec,
           x -> x::DOUBLE * x::DOUBLE)))), 6) AS cosine
  FROM embeddings e, qset q WHERE e.vec_id <> q.q_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored),
per_q AS (
  SELECT q_id, SUM(rel) AS n_relevant,
    SUM(CASE WHEN rnk <= 10 AND rel = 1
        THEN CAST(ROUND(1e6 / log2(CAST(rnk AS DOUBLE) + 1.0)) AS BIGINT)
        ELSE 0 END) AS dcg_micro,
    MIN(CASE WHEN rel = 1 THEN rnk END) AS first_rel,
    SUM(CASE WHEN rnk <= 10 AND rel = 1 THEN 1 ELSE 0 END) AS hits_at_10
  FROM ranked GROUP BY q_id),
w_idcg AS (
  SELECT q_id, n_relevant, dcg_micro, first_rel, hits_at_10,
    COALESCE(list_sum(list_transform(
      generate_series(1, CAST(least(n_relevant, 10) AS BIGINT)),
      i -> CAST(ROUND(1e6 / log2(CAST(i AS DOUBLE) + 1.0)) AS BIGINT))), 0)
      AS idcg_micro
  FROM per_q)
SELECT q_id, CAST(n_relevant AS BIGINT) AS n_relevant,
  CAST(dcg_micro AS BIGINT) AS dcg_micro,
  CAST(idcg_micro AS BIGINT) AS idcg_micro,
  CAST(FLOOR(dcg_micro * 1000000 / greatest(idcg_micro, 1)) AS BIGINT)
    AS ndcg_ppm,
  COALESCE(CAST(FLOOR(1e6 / first_rel) AS BIGINT), 0) AS rr_micro,
  CAST(hits_at_10 AS BIGINT) AS hits_at_10,
  COALESCE(CAST(FLOOR(hits_at_10 * 1e6
    / greatest(least(n_relevant, 10), 1)) AS BIGINT), 0)
    AS recall10_ppm
FROM w_idcg ORDER BY q_id
"""


def q_multimodal_ppm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PPM decode, oracle-gated end-to-end — the registry-dispatch
    proof: the SAME digest pixels as multimodal_image_features ship in
    a P6 netpbm container instead of BMP, round-trip through the PPM
    encoder and the magic-byte decode registry inside mapInPandas, and
    must produce the IDENTICAL features (the DuckDB twin is the same
    md5 recompute — container-independence is the contract). A wrong
    registry dispatch, header parse, or the BMP path's padding logic
    leaking into PPM breaks the hash. Payload bytes never shuffle."""
    import hashlib
    from collections.abc import Iterator as _It

    import pandas as pd  # noqa: PLC0415

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    schema = "doc_id long, feat_mean double, width int, height int"

    def _gen_and_decode(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                digest = hashlib.md5(str(text).encode("utf-8")).digest()
                rgb = (digest * 3)[:48]  # 4*4*3 bytes
                payload = MM.encode_ppm(4, 4, rgb)
                feats = MM._decode_payload(payload)  # registry → PPM path
                out.append(
                    {
                        "doc_id": doc_id,
                        "feat_mean": round(feats[0], 6),
                        "width": int(feats[1]),
                        "height": int(feats[2]),
                    }
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "feat_mean", "width", "height"]
            )

    return docs.mapInPandas(_gen_and_decode, schema=schema)


# identical twin to _MM_IMAGE_SQL on purpose: features must be
# container-independent (BMP vs PPM carry the same pixels)
_MM_PPM_SQL = _MM_IMAGE_SQL


def q_multimodal_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode, oracle-gated end-to-end: the SAME digest pixels
    as multimodal_image_features ship in a zlib-COMPRESSED PNG container
    (8-bit truecolor, CRC-checked chunks, filtered scanlines) through
    the magic-byte decode registry inside mapInPandas, and must produce
    IDENTICAL features (twin = the same md5 recompute). Unlike
    BMP/PPM, the payload round-trips an actual DEFLATE stream — a
    broken inflate, CRC pass, or scanline de-filter breaks the hash.
    Payload bytes never shuffle."""
    import hashlib
    from collections.abc import Iterator as _It

    import pandas as pd  # noqa: PLC0415

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    schema = "doc_id long, feat_mean double, width int, height int"

    def _gen_and_decode(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                digest = hashlib.md5(str(text).encode("utf-8")).digest()
                rgb = (digest * 3)[:48]  # 4*4*3 bytes
                payload = MM.encode_png(4, 4, rgb)
                feats = MM._decode_payload(payload)  # registry → PNG path
                out.append(
                    {
                        "doc_id": doc_id,
                        "feat_mean": round(feats[0], 6),
                        "width": int(feats[1]),
                        "height": int(feats[2]),
                    }
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "feat_mean", "width", "height"]
            )

    return docs.mapInPandas(_gen_and_decode, schema=schema)


# identical twin again: BMP, PPM and PNG carry the same pixels, so the
# features are container-independent by contract
_MM_PNG_SQL = _MM_IMAGE_SQL


def q_topk_by_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k WITHOUT a rank window: per nation, the top-3
    customers by account balance via a SALTED two-level sorted-slice
    aggregate. Level 1 groups on (nation, salt=pmod(custkey,64)) and
    keeps only its local top-3, so no single aggregation buffer ever
    holds more than 1/64th of a nation's rows; level 2 re-slices the
    ≤ 3×64 survivors per nation. Honest bound: collect_list's partial
    state is still the salted group's rows (Spark has no k-bounded
    built-in UDAF) — the salt fan-out is the memory dial, and a heap
    UDAF is the true constant-state shape. Because max salt-group
    top-3 ⊇ nation top-3, the two-level result is exact. Emitted as
    (nation, rank, custkey, cents); total-order tie-breaks on custkey
    keep both engines exact."""
    cust = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    kv = F.struct(
        (-cents).alias("neg"), F.col("c_custkey").alias("ck")
    )
    lvl1 = (
        cust.groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.pmod(F.col("c_custkey"), F.lit(64)).alias("salt"),
        )
        .agg(F.slice(F.sort_array(F.collect_list(kv)), 1, 3).alias("t1"))
        .select("nationkey", F.explode("t1").alias("kv"))
    )
    per = lvl1.groupBy("nationkey").agg(
        F.slice(F.sort_array(F.collect_list("kv")), 1, 3).alias("top")
    )
    ex = per.select(
        "nationkey",
        F.posexplode("top").alias("pos0", "kv"),
    )
    return ex.select(
        "nationkey",
        (F.col("pos0") + 1).cast("bigint").alias("rnk"),
        F.col("kv.ck").cast("bigint").alias("custkey"),
        (-F.col("kv.neg")).cast("bigint").alias("cents"),
    ).orderBy("nationkey", "rnk")


_TOPK_AGG_SQL = """
WITH per AS (
  SELECT c_nationkey AS nationkey,
    list_slice(
      list(struct_pack(neg := -CAST(ROUND(c_acctbal * 100) AS BIGINT),
                       ck := c_custkey)
           ORDER BY -CAST(ROUND(c_acctbal * 100) AS BIGINT), c_custkey),
      1, 3) AS top
  FROM customer GROUP BY 1)
SELECT nationkey, CAST(u.i AS BIGINT) AS rnk,
  CAST(top[u.i].ck AS BIGINT) AS custkey,
  CAST(-top[u.i].neg AS BIGINT) AS cents
FROM per, unnest(generate_series(1, len(top))) AS u(i)
ORDER BY nationkey, rnk
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "c1_list_tables": q_c1_list_tables,
    "c2_describe_lineitem": q_c2_describe_lineitem,
    "c6_forecast_names": q_c6_forecast_names,
    "c3_exists_census": q_c3_exists_census,
    "c4_drop_create_census": q_c4_drop_create_census,
    "c5_created_schema_echo": q_c5_created_schema_echo,
    "r1_scan_project": q_r1_scan_project,
    "r2_type_skip_projection": q_r2_type_skip_projection,
    "r4_cast_to_date": q_r4_cast_to_date,
    "r5_max_date": q_r5_max_date,
    "r7_future_date_axis": q_r7_future_date_axis,
    "r8_only_future": q_r8_only_future,
    "r11_outer_join_null_fill": q_r11_outer_join_null_fill,
    "r10_r13_bounds_sink_order": q_r10_r13_bounds_sink_order,
    "daily_sales_series": q_daily_sales_series,
    "daily_shipping_series": q_daily_shipping_series,
    "tpch_q1_pricing_summary": q_tpch_q1_pricing_summary,
    "tpch_q3_top_orders": q_tpch_q3_top_orders,
    "tpch_q5_nation_volume": q_tpch_q5_nation_volume,
    "tpch_q6_revenue_delta": q_tpch_q6_revenue_delta,
    "tpch_q7_nation_trade_volume": q_tpch_q7_nation_trade_volume,
    "tpch_q10_returned_items": q_tpch_q10_returned_items,
    "tpch_q13_order_count_distribution": q_tpch_q13_order_count_distribution,
    "tpch_q14_promo_revenue": q_tpch_q14_promo_revenue,
    "tpch_q18_large_orders": q_tpch_q18_large_orders,
    "tpch_q19_bracket_predicates": q_tpch_q19_bracket_predicates,
    "tpch_q8_market_share": q_tpch_q8_market_share,
    "tpch_q15_top_supplier": q_tpch_q15_top_supplier,
    "tpch_q17_small_quantity_revenue": q_tpch_q17_small_quantity_revenue,
    "tpch_q2_min_cost_supplier": q_tpch_q2_min_cost_supplier,
    "tpch_q4_priority_semi_join": q_tpch_q4_priority_semi_join,
    "tpch_q9_product_profit": q_tpch_q9_product_profit,
    "tpch_q11_important_stock": q_tpch_q11_important_stock,
    "tpch_q12_priority_by_linestatus": q_tpch_q12_priority_by_linestatus,
    "tpch_q16_supplier_count": q_tpch_q16_supplier_count,
    "tpch_q20_part_promotion": q_tpch_q20_part_promotion,
    "tpch_q21_waiting_orders": q_tpch_q21_waiting_orders,
    "tpch_q22_dormant_customers": q_tpch_q22_dormant_customers,
    "cube_segment_year": q_cube_segment_year,
    "fuzzy_name_pairs": q_fuzzy_name_pairs,
    "window_top_customers": q_window_top_customers,
    "window_moving_average": q_window_moving_average,
    "window_ntile_deciles": q_window_ntile_deciles,
    "window_dod_delta": q_window_dod_delta,
    "set_repeat_customers": q_set_repeat_customers,
    "anti_join_inactive_customers": q_anti_join_inactive_customers,
    "correlated_above_avg_suppliers": q_correlated_above_avg_suppliers,
    "json_extract_props": q_json_extract_props,
    "rollup_nation_year": q_rollup_nation_year,
    "pivot_status_by_year": q_pivot_status_by_year,
    "unpivot_daily_metrics": q_unpivot_daily_metrics,
    "distinct_users_per_type": q_distinct_users_per_type,
    "approx_distinct_users": q_approx_distinct_users,
    "dq_referential_integrity": q_dq_referential_integrity,
    "anomaly_zscore_daily": q_anomaly_zscore_daily,
    "gap_fill_daily_revenue": q_gap_fill_daily_revenue,
    "timeseries_multigrain": q_timeseries_multigrain,
    "percentiles_by_segment": q_percentiles_by_segment,
    "sessionization": q_sessionization,
    "session_window_stats": q_session_window_stats,
    "asof_join": q_asof_join,
    "range_join_events": q_range_join_events,
    "funnel_conversion": q_funnel_conversion,
    "streaming_daily_rollup": q_streaming_daily_rollup,
    "sliding_window_rollup": q_sliding_window_rollup,
    "text_stats": q_text_stats,
    "text_lang_id": q_text_lang_id,
    "text_quality": q_text_quality,
    "text_bpe_token_count": q_text_bpe_token_count,
    "text_top_tokens": q_text_top_tokens,
    "text_tfidf_keywords": q_text_tfidf_keywords,
    "text_fingerprint": q_text_fingerprint,
    "dedup_exact_stats": q_dedup_exact_stats,
    "dedup_minhash_signature": q_dedup_minhash_signature,
    "dedup_minhash_lsh_pairs": q_dedup_minhash_lsh_pairs,
    "dedup_simhash": q_dedup_simhash,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_containment_pairs": q_dedup_containment_pairs,
    "dedup_scale_audit": q_dedup_scale_audit,
    "dedup_scale_contract_audit": q_dedup_scale_contract_audit,
    "ann_scale_audit": q_ann_scale_audit,
    "ann_scale_contract_audit": q_ann_scale_contract_audit,
    "bigram_lm_quality": q_bigram_lm_quality,
    "boilerplate_prefix_report": q_boilerplate_prefix_report,
    "cross_source_leakage": q_cross_source_leakage,
    "epoch_shuffle_manifest": q_epoch_shuffle_manifest,
    "source_domain_similarity": q_source_domain_similarity,
    "corpus_novelty_decay": q_corpus_novelty_decay,
    "corpus_chunk_overlap": q_corpus_chunk_overlap,
    "curation_funnel_report": q_curation_funnel_report,
    "dedup_near_projection": q_dedup_near_projection,
    "dedup_components": q_dedup_components,
    "dedup_components_star": q_dedup_components_star,
    "corpus_curation": q_corpus_curation,
    "stratified_sample": q_stratified_sample,
    "embedding_near_dup": q_embedding_near_dup,
    "embedding_norm_stats": q_embedding_norm_stats,
    "similarity_topk": q_similarity_topk,
    "similarity_pairwise_topk": q_similarity_pairwise_topk,
    "similarity_lsh_topk": q_similarity_lsh_topk,
    "similarity_multiprobe_topk": q_similarity_multiprobe_topk,
    "similarity_ivf_topk": q_similarity_ivf_topk,
    "similarity_ivf_det_topk": q_similarity_ivf_det_topk,
    "similarity_recall_report": q_similarity_recall_report,
    "dedup_embedding_lsh_pairs": q_dedup_embedding_lsh_pairs,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_features": q_multimodal_features,
    "multimodal_image_features": q_multimodal_image_features,
    "multimodal_audio_features": q_multimodal_audio_features,
    "multimodal_frames_audit": q_multimodal_frames_audit,
    "multimodal_frames": q_multimodal_frames,
    "forecast_daily_sales": q_forecast_daily_sales,
    "forecast_only_future": q_forecast_only_future,
    "forecast_incremental": q_forecast_incremental,
    "forecast_backtest": q_forecast_backtest,
    "forecast_multi_table": q_forecast_multi_table,
    "grouping_sets_revenue": q_grouping_sets_revenue,
    "argmax_order_per_customer": q_argmax_order_per_customer,
    "dow_seasonality": q_dow_seasonality,
    "text_bigram_top": q_text_bigram_top,
    "embedding_centroid_by_label": q_embedding_centroid_by_label,
    "doc_length_histogram": q_doc_length_histogram,
    "text_repetition": q_text_repetition,
    "sketch_rollup_daily_users": q_sketch_rollup_daily_users,
    "sketch_value_quantiles": q_sketch_value_quantiles,
    "sketch_weekly_retention": q_sketch_weekly_retention,
    "variant_props_analytics": q_variant_props_analytics,
    "user_growth_accounting": q_user_growth_accounting,
    "dq_orders_expectations": q_dq_orders_expectations,
    "similarity_quantized_topk": q_similarity_quantized_topk,
    "decontaminate_corpus": q_decontaminate_corpus,
    "corpus_mix_sample": q_corpus_mix_sample,
    "window_range_1h_rolling": q_window_range_1h_rolling,
    "stats_moments": q_stats_moments,
    "per_group_sample": q_per_group_sample,
    "nation_top_customers_listagg": q_nation_top_customers_listagg,
    "scd2_user_state_intervals": q_scd2_user_state_intervals,
    "scd2_state_asof": q_scd2_state_asof,
    "seasonal_decompose_daily": q_seasonal_decompose_daily,
    "skyline_parts": q_skyline_parts,
    "markov_transitions": q_markov_transitions,
    "twap_user_value": q_twap_user_value,
    "allocation_proration": q_allocation_proration,
    "cohort_retention_weekly": q_cohort_retention_weekly,
    "phonetic_word_groups": q_phonetic_word_groups,
    "rfm_segmentation": q_rfm_segmentation,
    "trade_graph_triangles": q_trade_graph_triangles,
    "funnel_sequence_regex": q_funnel_sequence_regex,
    "ewma_daily_revenue": q_ewma_daily_revenue,
    "pagerank_trade_graph": q_pagerank_trade_graph,
    "token_entropy": q_token_entropy,
    "bm25_keyword_search": q_bm25_keyword_search,
    "revenue_streaks": q_revenue_streaks,
    "dow_hour_heatmap": q_dow_hour_heatmap,
    "mad_robust_stats": q_mad_robust_stats,
    "interval_merge_activity": q_interval_merge_activity,
    "attribution_first_touch": q_attribution_first_touch,
    "nation_revenue_share": q_nation_revenue_share,
    "yoy_revenue_growth": q_yoy_revenue_growth,
    "dau_wau_stickiness": q_dau_wau_stickiness,
    "priority_topn_with_others": q_priority_topn_with_others,
    "window_function_showcase": q_window_function_showcase,
    "sql_api_monthly_leaders": q_sql_api_monthly_leaders,
    "market_basket_pairs": q_market_basket_pairs,
    "regression_trend_by_nation": q_regression_trend_by_nation,
    "chi_square_segment_priority": q_chi_square_segment_priority,
    "cusum_breakpoints": q_cusum_breakpoints,
    "event_type_trigrams": q_event_type_trigrams,
    "khop_nation_reachability": q_khop_nation_reachability,
    "fifo_attribution_match": q_fifo_attribution_match,
    "embedding_covariance": q_embedding_covariance,
    "benford_first_digit": q_benford_first_digit,
    "pareto_revenue_concentration": q_pareto_revenue_concentration,
    "gini_revenue_by_nation": q_gini_revenue_by_nation,
    "acf_daily_revenue": q_acf_daily_revenue,
    "survival_hazard_curve": q_survival_hazard_curve,
    "runs_test_daily": q_runs_test_daily,
    "phrase_search_positional": q_phrase_search_positional,
    "ccf_order_to_ship": q_ccf_order_to_ship,
    "profile_orders_columns": q_profile_orders_columns,
    "percentile_disc_by_segment": q_percentile_disc_by_segment,
    "bollinger_bands_daily": q_bollinger_bands_daily,
    "max_drawdown_daily": q_max_drawdown_daily,
    "haar_wavelet_daily": q_haar_wavelet_daily,
    "lateral_top_balances": q_lateral_top_balances,
    "ks_test_segments": q_ks_test_segments,
    "mannwhitney_u_segments": q_mannwhitney_u_segments,
    "theilsen_trend_by_nation": q_theilsen_trend_by_nation,
    "interpurchase_time_histogram": q_interpurchase_time_histogram,
    "fano_factor_event_types": q_fano_factor_event_types,
    "winsorized_mean_by_segment": q_winsorized_mean_by_segment,
    "ship_delay_percentiles": q_ship_delay_percentiles,
    "peak_open_orders": q_peak_open_orders,
    "lorenz_curve_points": q_lorenz_curve_points,
    "weighted_median_price_by_brand": q_weighted_median_price_by_brand,
    "snapshot_diff_customer_orders": q_snapshot_diff_customer_orders,
    "embedding_clip_stats": q_embedding_clip_stats,
    "daily_kpi_wide": q_daily_kpi_wide,
    "hierarchy_share_report": q_hierarchy_share_report,
    "key_skew_report": q_key_skew_report,
    "weekly_rank_movers": q_weekly_rank_movers,
    "frequent_parts_sketch": q_frequent_parts_sketch,
    "customer_activity_islands": q_customer_activity_islands,
    "lineitem_contiguity_check": q_lineitem_contiguity_check,
    "discounted_ltv_top_customers": q_discounted_ltv_top_customers,
    "dice_collocations": q_dice_collocations,
    "embedding_dimension_medians": q_embedding_dimension_medians,
    "rank_correlation_nations": q_rank_correlation_nations,
    "rapid_repeat_orders": q_rapid_repeat_orders,
    "boxplot_stats_by_nation": q_boxplot_stats_by_nation,
    "conversion_curve": q_conversion_curve,
    "monthly_hhi_nations": q_monthly_hhi_nations,
    "forecast_contract_audit": q_forecast_contract_audit,
    "forecast_scale_series": q_forecast_scale_series,
    "forecast_scale_contract_audit": q_forecast_scale_contract_audit,
    "forecast_backtest_scale": q_forecast_backtest_scale,
    "forecast_backtest_scale_contract_audit": q_forecast_backtest_scale_contract_audit,
    "forecast_future_contract_audit": q_forecast_future_contract_audit,
    "forecast_multi_contract_audit": q_forecast_multi_contract_audit,
    "forecast_incremental_contract_audit": q_forecast_incremental_contract_audit,
    "forecast_backtest_contract_audit": q_forecast_backtest_contract_audit,
    "skew_salted_rollup": q_skew_salted_rollup,
    "dedup_rate_by_source": q_dedup_rate_by_source,
    "session_event_paths": q_session_event_paths,
    "text_zipf_rank_freq": q_text_zipf_rank_freq,
    "window_percentile_markers": q_window_percentile_markers,
    "corpus_token_budget": q_corpus_token_budget,
    "rebased_revenue_index": q_rebased_revenue_index,
    "corpus_pack_chunks": q_corpus_pack_chunks,
    "corpus_pack_firstfit": q_corpus_pack_firstfit,
    "minhash_estimate_error": q_minhash_estimate_error,
    "embedding_standardize_outliers": q_embedding_standardize_outliers,
    "lang_id_confusion": q_lang_id_confusion,
    "incremental_rollup_equivalence": q_incremental_rollup_equivalence,
    "bloom_semi_join_audit": q_bloom_semi_join_audit,
    "holt_linear_daily": q_holt_linear_daily,
    "corpus_split_assignment": q_corpus_split_assignment,
    "text_hash_embedding": q_text_hash_embedding,
    "stream_lateness_profile": q_stream_lateness_profile,
    "blocklist_filter_report": q_blocklist_filter_report,
    "dup_span_report": q_dup_span_report,
    "domain_temperature_mix": q_domain_temperature_mix,
    "shard_js_divergence": q_shard_js_divergence,
    "bpe_merge_candidates": q_bpe_merge_candidates,
    "embedding_pca_power": q_embedding_pca_power,
    "k_anonymity_report": q_k_anonymity_report,
    "freshness_report": q_freshness_report,
    "attribution_time_decay": q_attribution_time_decay,
    "dedup_incremental_batch": q_dedup_incremental_batch,
    "label_knn_agreement": q_label_knn_agreement,
    "window_funnel_levels": q_window_funnel_levels,
    "retention_flags": q_retention_flags,
    "adaptive_histogram": q_adaptive_histogram,
    "dedup_canonical_projection": q_dedup_canonical_projection,
    "croston_intermittent": q_croston_intermittent,
    "naive_baseline_scorecard": q_naive_baseline_scorecard,
    "multivar_ols_daily": q_multivar_ols_daily,
    "weighted_sample_es": q_weighted_sample_es,
    "multimodal_video_features": q_multimodal_video_features,
    "multimodal_video_thumbs": q_multimodal_video_thumbs,
    "ch_array_functions": q_ch_array_functions,
    "sample_by_user_cohort": q_sample_by_user_cohort,
    "locf_impute_daily": q_locf_impute_daily,
    "pii_redaction_report": q_pii_redaction_report,
    "agg_if_combinators": q_agg_if_combinators,
    "summap_props_rollup": q_summap_props_rollup,
    "welch_ttest_segments": q_welch_ttest_segments,
    "m4_downsample_daily": q_m4_downsample_daily,
    "target_encode_nations": q_target_encode_nations,
    "vocab_coverage_report": q_vocab_coverage_report,
    "cramers_v_association": q_cramers_v_association,
    "bitmap_set_ops": q_bitmap_set_ops,
    "curriculum_phases": q_curriculum_phases,
    "geo_nation_distances": q_geo_nation_distances,
    "woe_information_value": q_woe_information_value,
    "sequence_count_chains": q_sequence_count_chains,
    "roc_auc_embeddings": q_roc_auc_embeddings,
    "ab_cuped_scorecard": q_ab_cuped_scorecard,
    "calibration_bins": q_calibration_bins,
    "tokenizer_fertility_by_lang": q_tokenizer_fertility_by_lang,
    "ab_power_analysis": q_ab_power_analysis,
    "encoding_advisor_lineitem": q_encoding_advisor_lineitem,
    "bootstrap_ci_daily_mean": q_bootstrap_ci_daily_mean,
    "limit_by_per_group": q_limit_by_per_group,
    "group_by_with_totals": q_group_by_with_totals,
    "ttl_rollup_compaction": q_ttl_rollup_compaction,
    "theta_method_daily": q_theta_method_daily,
    "ql_dirichlet_search": q_ql_dirichlet_search,
    "hurst_exponent_daily": q_hurst_exponent_daily,
    "markov_entropy_rate": q_markov_entropy_rate,
    "evt_gumbel_daily_revenue": q_evt_gumbel_daily_revenue,
    "template_skeleton_dedup": q_template_skeleton_dedup,
    "padding_waste_report": q_padding_waste_report,
    "preference_pairs": q_preference_pairs,
    "burstiness_index": q_burstiness_index,
    "capture_recapture_users": q_capture_recapture_users,
    "ljung_box_daily": q_ljung_box_daily,
    "replacing_final_cdc": q_replacing_final_cdc,
    "collapsing_merge_balance": q_collapsing_merge_balance,
    "rolling_median_7d": q_rolling_median_7d,
    "rrf_fusion_search": q_rrf_fusion_search,
    "lag_feature_matrix": q_lag_feature_matrix,
    "bucketed_percentile_error": q_bucketed_percentile_error,
    "dp_noise_report": q_dp_noise_report,
    "quantile_normalization_sources": q_quantile_normalization_sources,
    "changepoint_binseg_daily": q_changepoint_binseg_daily,
    "seasonal_strength_daily": q_seasonal_strength_daily,
    "brand_price_elasticity": q_brand_price_elasticity,
    "wasserstein_shard_drift": q_wasserstein_shard_drift,
    "kalman_local_level": q_kalman_local_level,
    "lttb_downsample_daily": q_lttb_downsample_daily,
    "time_decayed_value_avg": q_time_decayed_value_avg,
    "theils_u_association": q_theils_u_association,
    "student_ttest_segments": q_student_ttest_segments,
    "sequence_next_node": q_sequence_next_node,
    "uniq_up_to_report": q_uniq_up_to_report,
    "delta_sum_report": q_delta_sum_report,
    "sparkbar_monthly_orders": q_sparkbar_monthly_orders,
    "geohash_grid_rollup": q_geohash_grid_rollup,
    "group_bit_ops": q_group_bit_ops,
    "any_heavy_daily_majority": q_any_heavy_daily_majority,
    "ngram_distance_names": q_ngram_distance_names,
    "semdedup_clusters": q_semdedup_clusters,
    "edit_distance_names": q_edit_distance_names,
    "summing_merge_compaction": q_summing_merge_compaction,
    "versioned_collapsing_audit": q_versioned_collapsing_audit,
    "anova_price_segments": q_anova_price_segments,
    "dsir_importance_weights": q_dsir_importance_weights,
    "quantiles_exact_weighted": q_quantiles_exact_weighted,
    "window_funnel_strict": q_window_funnel_strict,
    "multi_search_positions": q_multi_search_positions,
    "point_in_polygon_sites": q_point_in_polygon_sites,
    "bounding_ratio_daily": q_bounding_ratio_daily,
    "contingency_coefficient": q_contingency_coefficient,
    "with_fill_interpolate": q_with_fill_interpolate,
    "url_functions_report": q_url_functions_report,
    "topk_weighted_spacesaving": q_topk_weighted_spacesaving,
    "dedup_paragraph_ccnet": q_dedup_paragraph_ccnet,
    "dict_get_enrichment": q_dict_get_enrichment,
    "ipv4_subnet_report": q_ipv4_subnet_report,
    "moments_skew_kurt": q_moments_skew_kurt,
    "simple_linreg_daily": q_simple_linreg_daily,
    "group_uniq_array_daily": q_group_uniq_array_daily,
    "corr_matrix_lineitem": q_corr_matrix_lineitem,
    "aggregating_merge_states": q_aggregating_merge_states,
    "agg_resample_combinator": q_agg_resample_combinator,
    "graphite_rollup": q_graphite_rollup,
    "paste_join_daily": q_paste_join_daily,
    "mean_z_test_pairs": q_mean_z_test_pairs,
    "max_intersections_yearly": q_max_intersections_yearly,
    "array_enumerate_uniq": q_array_enumerate_uniq,
    "string_hamming_jaccard": q_string_hamming_jaccard,
    "gopher_quality_rules": q_gopher_quality_rules,
    "time_slots_expansion": q_time_slots_expansion,
    "quantile_timing_buckets": q_quantile_timing_buckets,
    "top_customers_with_ties": q_top_customers_with_ties,
    "set_ops_customers": q_set_ops_customers,
    "date_format_family": q_date_format_family,
    "vector_distance_family": q_vector_distance_family,
    "ann_hard_negatives": q_ann_hard_negatives,
    "min_max_map_rollup": q_min_max_map_rollup,
    "gd_linreg_daily": q_gd_linreg_daily,
    "sequence_match_flags": q_sequence_match_flags,
    "entropy_by_column": q_entropy_by_column,
    "substring_search_family": q_substring_search_family,
    "transform_mapping_report": q_transform_mapping_report,
    "array_join_positions": q_array_join_positions,
    "avg_weighted_covar": q_avg_weighted_covar,
    "integer_division_semantics": q_integer_division_semantics,
    "asof_join_directions": q_asof_join_directions,
    "cdc_chunk_dedup": q_cdc_chunk_dedup,
    "streaming_window_topk": q_streaming_window_topk,
    "streaming_closed_counts": q_streaming_closed_counts,
    "streaming_state_bound_audit": q_streaming_state_bound_audit,
    "global_rank_price_points": q_global_rank_price_points,
    "interval_length_sum": q_interval_length_sum,
    "schema_evolution_census": q_schema_evolution_census,
    "json_corrupt_records_census": q_json_corrupt_records_census,
    "gzip_text_ingest_census": q_gzip_text_ingest_census,
    "manifest_sink_roundtrip": q_manifest_sink_roundtrip,
    "kafka_wire_roundtrip": q_kafka_wire_roundtrip,
    "streaming_closed_topk": q_streaming_closed_topk,
    "quantiles_exclusive_inclusive": q_quantiles_exclusive_inclusive,
    "age_unit_family": q_age_unit_family,
    "array_predicates_report": q_array_predicates_report,
    "bit_count_distribution": q_bit_count_distribution,
    "power_of_two_histogram": q_power_of_two_histogram,
    "heaps_law_vocab_growth": q_heaps_law_vocab_growth,
    "jl_projection_distortion": q_jl_projection_distortion,
    "bag_set_ops_priorities": q_bag_set_ops_priorities,
    "matryoshka_truncation_report": q_matryoshka_truncation_report,
    "dedup_threshold_sweep": q_dedup_threshold_sweep,
    "group_array_sorted_topn": q_group_array_sorted_topn,
    "sliding_distinct_users": q_sliding_distinct_users,
    "sequence_match_negation": q_sequence_match_negation,
    "window_funnel_dedup": q_window_funnel_dedup,
    "dict_hierarchy_report": q_dict_hierarchy_report,
    "rolling_beta_30d": q_rolling_beta_30d,
    "json_roundtrip_report": q_json_roundtrip_report,
    "binary_encoding_report": q_binary_encoding_report,
    "countmin_error_report": q_countmin_error_report,
    "bloom_filter_fpr_audit": q_bloom_filter_fpr_audit,
    "hll_manual_audit": q_hll_manual_audit,
    "ccnet_perplexity_buckets": q_ccnet_perplexity_buckets,
    "conformal_coverage_report": q_conformal_coverage_report,
    "psi_drift_report": q_psi_drift_report,
    "psi_cuts_sketch_audit": q_psi_cuts_sketch_audit,
    "ship_delay_quantile_sketch": q_ship_delay_quantile_sketch,
    "negative_sampling_table": q_negative_sampling_table,
    "t5_span_corruption_report": q_t5_span_corruption_report,
    "dedup_keep_best_quality": q_dedup_keep_best_quality,
    "retrieval_metrics_report": q_retrieval_metrics_report,
    "multimodal_ppm_features": q_multimodal_ppm_features,
    "multimodal_png_features": q_multimodal_png_features,
    "topk_by_aggregation": q_topk_by_aggregation,
    "deterministic_sample_quantile": q_deterministic_sample_quantile,
    "rounding_semantics_report": q_rounding_semantics_report,
}

ORACLE_QUERIES: dict[str, str] = {
    "c1_list_tables": _C1_SQL,
    "c2_describe_lineitem": _C2_SQL,
    "c6_forecast_names": _C6_SQL,
    "c3_exists_census": _C3_SQL,
    "c4_drop_create_census": _C4_SQL,
    "c5_created_schema_echo": _C5_SQL,
    "r1_scan_project": _R1_SQL,
    "r2_type_skip_projection": _R2_SQL,
    "r4_cast_to_date": _R4_SQL,
    "r5_max_date": _R5_SQL,
    "r7_future_date_axis": _R7_SQL,
    "r8_only_future": _R8_SQL,
    "r11_outer_join_null_fill": _R11_SQL,
    "r10_r13_bounds_sink_order": _R10_SQL,
    "daily_sales_series": _ORDERS_DAILY_SQL,
    "daily_shipping_series": _SHIPPING_DAILY_SQL,
    "tpch_q1_pricing_summary": _Q1_SQL,
    "tpch_q3_top_orders": _Q3_SQL,
    "tpch_q5_nation_volume": _Q5_SQL,
    "tpch_q6_revenue_delta": _Q6_SQL,
    "tpch_q7_nation_trade_volume": _Q7_SQL,
    "tpch_q10_returned_items": _Q10_SQL,
    "tpch_q13_order_count_distribution": _Q13_SQL,
    "tpch_q14_promo_revenue": _Q14_SQL,
    "tpch_q18_large_orders": _Q18_SQL,
    "tpch_q19_bracket_predicates": _Q19_SQL,
    "tpch_q8_market_share": _Q8_SQL,
    "tpch_q15_top_supplier": _Q15_SQL,
    "tpch_q17_small_quantity_revenue": _Q17_SQL,
    "tpch_q2_min_cost_supplier": _Q2_SQL,
    "tpch_q4_priority_semi_join": _Q4_SQL,
    "tpch_q9_product_profit": _Q9_SQL,
    "tpch_q11_important_stock": _Q11_SQL,
    "tpch_q12_priority_by_linestatus": _Q12_SQL,
    "tpch_q16_supplier_count": _Q16_SQL,
    "tpch_q20_part_promotion": _Q20_SQL,
    "tpch_q21_waiting_orders": _Q21_SQL,
    "tpch_q22_dormant_customers": _Q22_SQL,
    "cube_segment_year": _CUBE_SQL,
    "fuzzy_name_pairs": _FUZZY_SQL,
    "window_top_customers": _WINDOW_SQL,
    "window_moving_average": _MOVAVG_SQL,
    "window_ntile_deciles": _NTILE_SQL,
    "window_dod_delta": _DOD_SQL,
    "set_repeat_customers": _SET_SQL,
    "anti_join_inactive_customers": _ANTI_SQL,
    "correlated_above_avg_suppliers": _CORR_SQL,
    "json_extract_props": _JSON_SQL,
    "rollup_nation_year": _ROLLUP_SQL,
    "pivot_status_by_year": _PIVOT_SQL,
    "unpivot_daily_metrics": _UNPIVOT_SQL,
    "distinct_users_per_type": _DISTINCT_SQL,
    "approx_distinct_users": _APPROX_DISTINCT_SQL,
    "dq_referential_integrity": _DQ_SQL,
    "anomaly_zscore_daily": _ANOMALY_SQL,
    "gap_fill_daily_revenue": _GAPFILL_SQL,
    "timeseries_multigrain": _MULTIGRAIN_SQL,
    "percentiles_by_segment": _PCTL_SQL,
    "sessionization": _SESSION_SQL,
    "session_window_stats": _SESSION_WINDOW_SQL,
    "asof_join": _ASOF_SQL,
    "range_join_events": _RANGE_SQL,
    "funnel_conversion": _FUNNEL_SQL,
    "streaming_daily_rollup": _STREAM_SQL,
    "sliding_window_rollup": _SLIDING_SQL,
    "text_stats": _TEXT_STATS_SQL,
    "text_lang_id": _lang_sql(),
    "text_quality": _QUALITY_SQL,
    "text_bpe_token_count": _BPE_SQL,
    "text_top_tokens": _TOP_TOKENS_SQL,
    "text_tfidf_keywords": _TFIDF_SQL,
    "text_fingerprint": _FP_SQL,
    "dedup_exact_stats": _DEDUP_EXACT_SQL,
    "dedup_minhash_signature": _MINHASH_SIG_SQL,
    "dedup_minhash_lsh_pairs": _MINHASH_LSH_SQL,
    "dedup_simhash": _SIMHASH_SQL,
    "dedup_ngram_jaccard": _JACCARD_SQL,
    "dedup_containment_pairs": _CONTAIN_SQL,
    "dedup_scale_contract_audit": _DEDUP_SCALE_AUDIT_SQL,
    "ann_scale_contract_audit": _ANN_SCALE_CONTRACT_SQL,
    "bigram_lm_quality": _BIGRAM_LM_SQL,
    "boilerplate_prefix_report": _BOILERPLATE_SQL,
    "cross_source_leakage": _LEAKAGE_SQL,
    "epoch_shuffle_manifest": _EPOCH_SHUFFLE_SQL,
    "source_domain_similarity": _DOMAIN_SIM_SQL,
    "corpus_novelty_decay": _NOVELTY_SQL,
    "corpus_chunk_overlap": _CHUNK_OVERLAP_SQL,
    "curation_funnel_report": _CURATION_FUNNEL_SQL,
    "dedup_near_projection": _DEDUP_NEAR_SQL,
    "dedup_components": _CC_SQL,
    "dedup_components_star": _CC_SQL,
    "corpus_curation": _CURATION_SQL,
    "stratified_sample": _STRATIFIED_SQL,
    "embedding_near_dup": _EMB_DUP_SQL,
    "embedding_norm_stats": _NORM_STATS_SQL,
    "similarity_topk": _TOPK_SQL,
    "similarity_pairwise_topk": _PAIRWISE_SQL,
    "similarity_lsh_topk": _LSH_TOPK_SQL,
    "similarity_multiprobe_topk": _LSH_MULTIPROBE_SQL,
    "similarity_quantized_topk": _QUANTIZED_SQL,
    "similarity_ivf_det_topk": _IVF_DET_SQL,
    "similarity_recall_report": _recall_report_sql(),
    "dedup_embedding_lsh_pairs": _LSH_PAIRS_SQL,
    # rows-only (engine-side state / model output, not SQL-expressible):
    #   forecast_* (model output), multimodal_features/frames (engine-side
    #   decode), similarity_ivf_topk (learned KMeans centroids)
    "multimodal_meta": _MM_META_SQL,
    "multimodal_image_features": _MM_IMAGE_SQL,
    "multimodal_audio_features": _MM_AUDIO_SQL,
    "multimodal_frames_audit": _MM_FRAMES_AUDIT_SQL,
    "multimodal_features": _MM_FEATURES_SQL,
    "grouping_sets_revenue": _GSETS_SQL,
    "argmax_order_per_customer": _ARGMAX_SQL,
    "dow_seasonality": _DOW_SQL,
    "text_bigram_top": _BIGRAM_SQL,
    "embedding_centroid_by_label": _CENTROID_SQL,
    "doc_length_histogram": _LENHIST_SQL,
    "text_repetition": _REPETITION_SQL,
    # sketch estimates are engine-specific, so the HLL/KLL rollups hash
    # their exact twins + in-query tolerance verdicts; weekly retention
    # is exact below nominal-entries so it oracle-checks directly:
    "sketch_rollup_daily_users": _SKETCH_ROLLUP_SQL,
    "sketch_value_quantiles": _SKETCH_QUANTILES_SQL,
    "sketch_weekly_retention": _RETENTION_SQL,
    "variant_props_analytics": _VARIANT_SQL,
    "user_growth_accounting": _GROWTH_SQL,
    "dq_orders_expectations": _DQ_EXPECT_SQL,
    "decontaminate_corpus": _DECONTAM_SQL,
    "corpus_mix_sample": _MIX_SQL,
    "window_range_1h_rolling": _RANGE1H_SQL,
    "stats_moments": _MOMENTS_SQL,
    "per_group_sample": _PGSAMPLE_SQL,
    "nation_top_customers_listagg": _LISTAGG_SQL,
    "scd2_user_state_intervals": _SCD2_SQL,
    "scd2_state_asof": _SCD2_ASOF_SQL,
    "seasonal_decompose_daily": _DECOMP_SQL,
    "skyline_parts": _SKYLINE_SQL,
    "markov_transitions": _MARKOV_SQL,
    "twap_user_value": _TWAP_SQL,
    "allocation_proration": _PRORATE_SQL,
    "cohort_retention_weekly": _COHORT_SQL,
    "phonetic_word_groups": _PHONETIC_SQL,
    "rfm_segmentation": _RFM_SQL,
    "trade_graph_triangles": _TRIANGLE_SQL,
    "funnel_sequence_regex": _FUNNEL_SEQ_SQL,
    "ewma_daily_revenue": _EWMA_SQL,
    "pagerank_trade_graph": _PAGERANK_SQL,
    "token_entropy": _ENTROPY_SQL,
    "bm25_keyword_search": _BM25_SQL,
    "revenue_streaks": _STREAK_SQL,
    "dow_hour_heatmap": _HEATMAP_SQL,
    "mad_robust_stats": _MAD_SQL,
    "interval_merge_activity": _INTERVAL_SQL,
    "attribution_first_touch": _ATTRIB_SQL,
    "nation_revenue_share": _SHARE_SQL,
    "yoy_revenue_growth": _YOY_SQL,
    "dau_wau_stickiness": _DAUWAU_SQL,
    "priority_topn_with_others": _TOPN_OTHER_SQL,
    "window_function_showcase": _WINFUNCS_SQL,
    "sql_api_monthly_leaders": _SQL_API_REPORT,
    "market_basket_pairs": _BASKET_SQL,
    "regression_trend_by_nation": _REGRESSION_SQL,
    "chi_square_segment_priority": _CHI2_SQL,
    "cusum_breakpoints": _CUSUM_SQL,
    "event_type_trigrams": _TRIGRAM_SQL,
    "khop_nation_reachability": _KHOP_SQL,
    "fifo_attribution_match": _FIFO_SQL,
    "embedding_covariance": _EMB_COV_SQL,
    "benford_first_digit": _BENFORD_SQL,
    "pareto_revenue_concentration": _PARETO_SQL,
    "gini_revenue_by_nation": _GINI_SQL,
    "acf_daily_revenue": _ACF_SQL,
    "survival_hazard_curve": _SURVIVAL_SQL,
    "runs_test_daily": _RUNS_SQL,
    "phrase_search_positional": _PHRASE_SQL,
    "ccf_order_to_ship": _CCF_SQL,
    "profile_orders_columns": _PROFILE_SQL,
    "percentile_disc_by_segment": _PCTL_DISC_SQL,
    "bollinger_bands_daily": _BOLLINGER_SQL,
    "max_drawdown_daily": _DRAWDOWN_SQL,
    "haar_wavelet_daily": _HAAR_SQL,
    "lateral_top_balances": _LATERAL_SQL,
    "ks_test_segments": _KS_SQL,
    "mannwhitney_u_segments": _MWU_SQL,
    "theilsen_trend_by_nation": _THEILSEN_SQL,
    "interpurchase_time_histogram": _INTERPURCHASE_SQL,
    "fano_factor_event_types": _FANO_SQL,
    "winsorized_mean_by_segment": _WINSOR_SQL,
    "ship_delay_percentiles": _SHIP_DELAY_SQL,
    "peak_open_orders": _PEAK_OPEN_SQL,
    "lorenz_curve_points": _LORENZ_SQL,
    "weighted_median_price_by_brand": _WMEDIAN_SQL,
    "snapshot_diff_customer_orders": _SNAPDIFF_SQL,
    "embedding_clip_stats": _CLIP_SQL,
    "daily_kpi_wide": _KPI_SQL,
    "hierarchy_share_report": _HIER_SQL,
    "key_skew_report": _KEY_SKEW_SQL,
    "weekly_rank_movers": _RANK_MOVERS_SQL,
    "frequent_parts_sketch": _FREQ_SUPPORT_SQL,
    "customer_activity_islands": _ISLANDS_SQL,
    "lineitem_contiguity_check": _CONTIG_SQL,
    "discounted_ltv_top_customers": _LTV_SQL,
    "dice_collocations": _DICE_SQL,
    "embedding_dimension_medians": _EMB_MEDIAN_SQL,
    "rank_correlation_nations": _RANKCORR_SQL,
    "rapid_repeat_orders": _DUP_PAY_SQL,
    "boxplot_stats_by_nation": _BOXPLOT_SQL,
    "conversion_curve": _CONV_CURVE_SQL,
    "monthly_hhi_nations": _HHI_SQL,
    "rebased_revenue_index": _REBASE_SQL,
    "forecast_contract_audit": _FORECAST_AUDIT_SQL,
    "forecast_scale_contract_audit": _FORECAST_SCALE_AUDIT_SQL,
    "forecast_backtest_scale_contract_audit": _FORECAST_BACKTEST_SCALE_AUDIT_SQL,
    "forecast_future_contract_audit": _FORECAST_FUTURE_AUDIT_SQL,
    "forecast_multi_contract_audit": _FORECAST_MULTI_AUDIT_SQL,
    "forecast_incremental_contract_audit": _FORECAST_INCR_AUDIT_SQL,
    "forecast_backtest_contract_audit": _FORECAST_BT_AUDIT_SQL,
    "skew_salted_rollup": _SALTED_SQL,
    "dedup_rate_by_source": _DEDUP_RATE_SQL,
    "session_event_paths": _SESSION_PATHS_SQL,
    "text_zipf_rank_freq": _ZIPF_SQL,
    "window_percentile_markers": _PCTL_MARKERS_SQL,
    "corpus_token_budget": _TOKEN_BUDGET_SQL,
    "corpus_pack_chunks": _PACK_CHUNKS_SQL,
    "corpus_pack_firstfit": _PACK_FIRSTFIT_SQL,
    "minhash_estimate_error": _MINHASH_ERR_SQL,
    "embedding_standardize_outliers": _EMB_STANDARDIZE_SQL,
    "lang_id_confusion": _LANG_CONFUSION_SQL,
    "incremental_rollup_equivalence": _INCR_ROLLUP_SQL,
    "bloom_semi_join_audit": _BLOOM_SQL,
    "holt_linear_daily": _HOLT_SQL,
    "corpus_split_assignment": _SPLIT_SQL,
    "text_hash_embedding": _HASH_EMB_SQL,
    "stream_lateness_profile": _LATENESS_SQL,
    "blocklist_filter_report": _BLOCKLIST_SQL,
    "dup_span_report": _DUP_SPAN_SQL,
    "domain_temperature_mix": _TEMPERATURE_MIX_SQL,
    "shard_js_divergence": _JS_DIVERGENCE_SQL,
    "bpe_merge_candidates": _BPE_MERGE_SQL,
    "embedding_pca_power": _PCA_POWER_SQL,
    "k_anonymity_report": _K_ANON_SQL,
    "freshness_report": _FRESHNESS_SQL,
    "attribution_time_decay": _TIME_DECAY_SQL,
    "dedup_incremental_batch": _INCR_DEDUP_SQL,
    "label_knn_agreement": _KNN_AGREE_SQL,
    "window_funnel_levels": _WINDOW_FUNNEL_SQL,
    "retention_flags": _RETENTION_FLAGS_SQL,
    "adaptive_histogram": _ADAPTIVE_HIST_SQL,
    "dedup_canonical_projection": _CANONICAL_SQL,
    "croston_intermittent": _CROSTON_SQL,
    "naive_baseline_scorecard": _NAIVE_SCORE_SQL,
    "multivar_ols_daily": _MULTIVAR_OLS_SQL,
    "weighted_sample_es": _ES_SAMPLE_SQL,
    "multimodal_video_features": _MM_VIDEO_SQL,
    "multimodal_video_thumbs": _MM_VIDEO_THUMBS_SQL,
    "ch_array_functions": _CH_ARRAY_SQL,
    "sample_by_user_cohort": _SAMPLE_BY_SQL,
    "locf_impute_daily": _LOCF_SQL,
    "pii_redaction_report": _PII_SQL,
    "agg_if_combinators": _AGG_IF_SQL,
    "summap_props_rollup": _SUMMAP_SQL,
    "welch_ttest_segments": _WELCH_SQL,
    "m4_downsample_daily": _M4_SQL,
    "target_encode_nations": _TARGET_ENC_SQL,
    "vocab_coverage_report": _VOCAB_COV_SQL,
    "cramers_v_association": _CRAMERS_SQL,
    "bitmap_set_ops": _BITMAP_SQL,
    "curriculum_phases": _CURRICULUM_SQL,
    "geo_nation_distances": _GEO_SQL,
    "woe_information_value": _WOE_SQL,
    "sequence_count_chains": _SEQ_COUNT_SQL,
    "roc_auc_embeddings": _ROC_AUC_SQL,
    "ab_cuped_scorecard": _AB_CUPED_SQL,
    "calibration_bins": _CALIBRATION_SQL,
    "tokenizer_fertility_by_lang": _FERTILITY_SQL,
    "ab_power_analysis": _AB_POWER_SQL,
    "encoding_advisor_lineitem": _ENCODING_SQL,
    "bootstrap_ci_daily_mean": _BOOTSTRAP_SQL,
    "limit_by_per_group": _LIMIT_BY_SQL,
    "group_by_with_totals": _WITH_TOTALS_SQL,
    "ttl_rollup_compaction": _TTL_ROLLUP_SQL,
    "theta_method_daily": _THETA_SQL,
    "ql_dirichlet_search": _QL_SQL,
    "hurst_exponent_daily": _HURST_SQL,
    "markov_entropy_rate": _MARKOV_ENTROPY_SQL,
    "evt_gumbel_daily_revenue": _EVT_GUMBEL_SQL,
    "template_skeleton_dedup": _SKELETON_SQL,
    "padding_waste_report": _PADDING_SQL,
    "preference_pairs": _PREFERENCE_SQL,
    "burstiness_index": _BURSTINESS_SQL,
    "capture_recapture_users": _CAPTURE_SQL,
    "ljung_box_daily": _LJUNG_BOX_SQL,
    "replacing_final_cdc": _REPLACING_SQL,
    "collapsing_merge_balance": _COLLAPSING_SQL,
    "rolling_median_7d": _ROLLING_MEDIAN_SQL,
    "rrf_fusion_search": _RRF_SQL,
    "lag_feature_matrix": _LAG_FEATURES_SQL,
    "bucketed_percentile_error": _BUCKETED_PCTL_SQL,
    "dp_noise_report": _DP_NOISE_SQL,
    "quantile_normalization_sources": _QNORM_SQL,
    "changepoint_binseg_daily": _BINSEG_SQL,
    "seasonal_strength_daily": _SEASONAL_STRENGTH_SQL,
    "brand_price_elasticity": _ELASTICITY_SQL,
    "wasserstein_shard_drift": _WASSERSTEIN_SQL,
    "kalman_local_level": _KALMAN_SQL,
    "lttb_downsample_daily": _LTTB_SQL,
    "time_decayed_value_avg": _EXP_DECAY_SQL,
    "theils_u_association": _THEILS_U_SQL,
    "student_ttest_segments": _STUDENT_T_SQL,
    "sequence_next_node": _SEQ_NEXT_SQL,
    "uniq_up_to_report": _UNIQ_UP_TO_SQL,
    "delta_sum_report": _DELTA_SUM_SQL,
    "sparkbar_monthly_orders": _SPARKBAR_SQL,
    "geohash_grid_rollup": _GEOHASH_SQL,
    "group_bit_ops": _GROUP_BIT_SQL,
    "any_heavy_daily_majority": _ANY_HEAVY_SQL,
    "ngram_distance_names": _NGRAM_DIST_SQL,
    "semdedup_clusters": _SEMDEDUP_SQL,
    "edit_distance_names": _EDIT_DIST_SQL,
    "summing_merge_compaction": _SUMMING_MERGE_SQL,
    "versioned_collapsing_audit": _VERSIONED_COLLAPSING_SQL,
    "anova_price_segments": _ANOVA_SQL,
    "dsir_importance_weights": _DSIR_SQL,
    "quantiles_exact_weighted": _QUANT_WEIGHTED_SQL,
    "window_funnel_strict": _FUNNEL_STRICT_SQL,
    "multi_search_positions": _MULTI_SEARCH_SQL,
    "point_in_polygon_sites": _PIP_SQL,
    "bounding_ratio_daily": _BOUNDING_RATIO_SQL,
    "contingency_coefficient": _CONTINGENCY_SQL,
    "with_fill_interpolate": _WITH_FILL_SQL,
    "url_functions_report": _URL_FUNCS_SQL,
    "topk_weighted_spacesaving": _TOPK_SS_SQL,
    "dedup_paragraph_ccnet": _CCNET_SQL,
    "dict_get_enrichment": _DICT_GET_SQL,
    "ipv4_subnet_report": _IPV4_SQL,
    "moments_skew_kurt": _SKEW_KURT_SQL,
    "simple_linreg_daily": _SIMPLE_LINREG_SQL,
    "group_uniq_array_daily": _GROUP_UNIQ_SQL,
    "corr_matrix_lineitem": _CORR_MATRIX_SQL,
    "aggregating_merge_states": _AGG_MERGE_SQL,
    "agg_resample_combinator": _AGG_RESAMPLE_SQL,
    "graphite_rollup": _GRAPHITE_SQL,
    "paste_join_daily": _PASTE_JOIN_SQL,
    "mean_z_test_pairs": _MEAN_Z_SQL,
    "max_intersections_yearly": _MAX_INTERSECT_SQL,
    "array_enumerate_uniq": _ARRAY_ENUM_SQL,
    "string_hamming_jaccard": _STRING_HAM_JAC_SQL,
    "gopher_quality_rules": _GOPHER_SQL,
    "time_slots_expansion": _TIME_SLOTS_SQL,
    "quantile_timing_buckets": _QUANTILE_TIMING_SQL,
    "top_customers_with_ties": _WITH_TIES_SQL,
    "set_ops_customers": _SET_OPS_SQL,
    "date_format_family": _DATE_FORMAT_SQL,
    "vector_distance_family": _VECTOR_DIST_SQL,
    "ann_hard_negatives": _ANN_HARD_NEG_SQL,
    "min_max_map_rollup": _MIN_MAX_MAP_SQL,
    "gd_linreg_daily": _GD_LINREG_SQL,
    "sequence_match_flags": _SEQ_MATCH_SQL,
    "entropy_by_column": _COLUMN_ENTROPY_SQL,
    "substring_search_family": _SUBSTRING_SEARCH_SQL,
    "transform_mapping_report": _TRANSFORM_MAP_SQL,
    "array_join_positions": _ARRAY_JOIN_POS_SQL,
    "avg_weighted_covar": _AVG_WEIGHTED_SQL,
    "integer_division_semantics": _INT_DIV_SQL,
    "asof_join_directions": _ASOF_DIRECTIONS_SQL,
    "cdc_chunk_dedup": _CDC_CHUNK_SQL,
    "streaming_window_topk": _STREAM_TOPK_SQL,
    "streaming_closed_counts": _STREAM_CLOSED_COUNTS_SQL,
    "streaming_state_bound_audit": _STATE_BOUND_SQL,
    "global_rank_price_points": _GLOBAL_RANK_SQL,
    "interval_length_sum": _INTERVAL_LEN_SQL,
    "schema_evolution_census": _SCHEMA_EVO_SQL,
    "json_corrupt_records_census": _JSON_CORRUPT_SQL,
    "gzip_text_ingest_census": _GZIP_INGEST_SQL,
    "manifest_sink_roundtrip": _MANIFEST_SINK_SQL,
    "kafka_wire_roundtrip": _KAFKA_WIRE_SQL,
    "streaming_closed_topk": _STREAM_CLOSED_TOPK_SQL,
    "quantiles_exclusive_inclusive": _QUANTILE_IE_SQL,
    "age_unit_family": _AGE_UNIT_SQL,
    "array_predicates_report": _ARRAY_PRED_SQL,
    "bit_count_distribution": _BIT_COUNT_SQL,
    "power_of_two_histogram": _POW2_HIST_SQL,
    "heaps_law_vocab_growth": _HEAPS_SQL,
    "jl_projection_distortion": _JL_SQL,
    "bag_set_ops_priorities": _BAG_SET_OPS_SQL,
    "matryoshka_truncation_report": _MATRYOSHKA_SQL,
    "dedup_threshold_sweep": _dedup_sweep_sql(),
    "group_array_sorted_topn": _GROUP_ARRAY_SORTED_SQL,
    "sliding_distinct_users": _SLIDING_DISTINCT_SQL,
    "sequence_match_negation": _SEQ_NEGATION_SQL,
    "window_funnel_dedup": _FUNNEL_DEDUP_SQL,
    "dict_hierarchy_report": _DICT_HIERARCHY_SQL,
    "rolling_beta_30d": _ROLLING_BETA_SQL,
    "json_roundtrip_report": _JSON_ROUNDTRIP_SQL,
    "binary_encoding_report": _BINARY_ENCODING_SQL,
    "countmin_error_report": _COUNTMIN_SQL,
    "bloom_filter_fpr_audit": _BLOOM_FPR_SQL,
    "hll_manual_audit": _HLL_MANUAL_SQL,
    "ccnet_perplexity_buckets": _CCNET_PPL_SQL,
    "conformal_coverage_report": _CONFORMAL_SQL,
    "psi_drift_report": _PSI_SQL,
    "psi_cuts_sketch_audit": _PSI_CUTS_SKETCH_SQL,
    "ship_delay_quantile_sketch": _SHIP_DELAY_SKETCH_SQL,
    "negative_sampling_table": _NEG_SAMPLING_SQL,
    "t5_span_corruption_report": _T5_SPAN_SQL,
    "dedup_keep_best_quality": _dedup_best_sql(),
    "retrieval_metrics_report": _RETRIEVAL_METRICS_SQL,
    "multimodal_ppm_features": _MM_PPM_SQL,
    "multimodal_png_features": _MM_PNG_SQL,
    "topk_by_aggregation": _TOPK_AGG_SQL,
    "deterministic_sample_quantile": _DET_SAMPLE_QUANTILE_SQL,
    "rounding_semantics_report": _ROUNDING_SQL,
}

# DuckDB SUM()/integer-division over integer columns returns HUGEINT
# (int128); pandas materializes that as float/object, so the driver's
# hash canonicalization diverges from Spark's BIGINT even when values
# are identical (round-1 tpch_q12 failure). Every oracle output column
# listed here is wrapped with CAST(... AS BIGINT) below; the audit in
# tools/audit_oracle_dtypes.py (pytest tests/test_oracle_dtypes.py)
# asserts the class can't regress.
_BIGINT_CASTS: dict[str, tuple[str, ...]] = {
    "allocation_proration": ("alloc_cents",),
    "attribution_first_touch": ("n_attributed",),
    "bollinger_bands_daily": ("x",),
    "boxplot_stats_by_nation": ("n_low_outliers", "n_high_outliers"),
    "conversion_curve": ("n_converted", "conv_ppm"),
    "corpus_mix_sample": ("n_selected",),
    "cusum_breakpoints": ("cents", "s_scaled"),
    "daily_kpi_wide": ("rev_cents", "aov_cents", "cum_buyers"),
    "dq_orders_expectations": ("n_violations",),
    "embedding_clip_stats": ("total_dims", "total_clip", "clip_ppm"),
    "ewma_daily_revenue": ("ewma_micro",),
    "fano_factor_event_types": ("sk",),
    "fifo_attribution_match": ("matched_cents",),
    "funnel_conversion": ("n_converted",),
    "haar_wavelet_daily": ("detail",),
    "hierarchy_share_report": ("cents", "share_of_region_ppm", "region_share_ppm"),
    "interval_merge_activity": ("total_active_us",),
    "ks_test_segments": ("n1", "n2", "d_scaled", "d_ppm"),
    "lineitem_contiguity_check": ("n_contiguous", "n_violations"),
    "lorenz_curve_points": ("cum_share_ppm",),
    "mad_robust_stats": ("n_outliers",),
    "mannwhitney_u_segments": ("n1", "n2", "u1_2", "tie3"),
    "max_drawdown_daily": ("equity", "peak", "drawdown"),
    "nation_revenue_share": ("rev_cents", "share_ppm"),
    "peak_open_orders": ("open_orders",),
    "priority_topn_with_others": ("n_orders",),
    "profile_orders_columns": ("n_null",),
    "rank_correlation_nations": ("sum_d2", "n_conc", "n_disc"),
    "rebased_revenue_index": ("cents", "index_ppm"),
    "runs_test_daily": ("n_pos", "n_neg", "n_runs"),
    "sessionization": ("n_sessions",),
    "survival_hazard_curve": ("n_risk", "d_events", "hazard_ppm"),
    "token_entropy": ("n_tokens",),
    "tpch_q12_priority_by_linestatus": ("high_line_count", "low_line_count"),
    "twap_user_value": ("total_us",),
    "user_growth_accounting": ("cumulative_users",),
    "variant_props_analytics": ("sum_k",),
    "weighted_median_price_by_brand": ("total_quantity",),
    "window_function_showcase": (
        "rev_cents", "leader_cents", "runnerup_cents", "gap_to_leader"),
    "yoy_revenue_growth": ("rev_cents", "prev_cents", "growth_bp"),
}


def _cast_bigint(sql: str, cols: tuple[str, ...]) -> str:
    repl = ", ".join(f"CAST({c} AS BIGINT) AS {c}" for c in cols)
    return f"SELECT * REPLACE ({repl}) FROM (\n{sql}\n) AS _bigint_t"


for _name, _cols in _BIGINT_CASTS.items():
    ORACLE_QUERIES[_name] = _cast_bigint(ORACLE_QUERIES[_name], _cols)
del _name, _cols
