package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import Num._

/** Batch analytics over the stream-shaped `events` table: tumbling and
  * sliding time windows and gap-based sessionization. The streaming twins
  * live in [[graft.streaming.EventStream]]; these batch forms are the
  * oracle-checkable semantics.
  */
object Events {

  // ---- q60: tumbling 1-hour windows ---------------------------------------
  def q60Hourly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("total_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("hour_start", "event_type")

  val q60Sql: String =
    s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start, event_type,
       |  COUNT(*) AS n,
       |  ${sqlDsum("value")} AS total_value,
       |  MIN(value) AS min_value,
       |  MAX(value) AS max_value,
       |  COUNT(DISTINCT user_id) AS n_users
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY hour_start, event_type""".stripMargin

  // ---- q61: sliding windows (2h size, 1h slide) via offset explode --------
  // Each event belongs to the windows starting at trunc(ts) and trunc(ts)−1h
  // — the generator form of a sliding window, shuffle-free until the agg.
  def q61Sliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("window_start", explode(array(
        date_trunc("hour", col("ts")),
        date_trunc("hour", col("ts")) - expr("INTERVAL 1 HOUR"))))
      .groupBy("window_start", "event_type")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy("window_start", "event_type")

  val q61Sql: String =
    s"""SELECT window_start, event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total_value
       |FROM (
       |  SELECT unnest([date_trunc('hour', CAST(ts AS TIMESTAMP)),
       |                 date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR]) AS window_start,
       |         event_type, value
       |  FROM events) w
       |GROUP BY 1, 2
       |ORDER BY window_start, event_type""".stripMargin

  // ---- q62: gap-based sessionization (30-min inactivity) ------------------
  // lag → gap flag → running sum = session id; pure integer/window logic,
  // hence engine-exact.
  def q62Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val runSum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull
          || col("ts") - col("prev_ts") > expr("INTERVAL 30 MINUTE"), 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(runSum))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        dsum(col("value")).as("session_value"))
      .orderBy("user_id", "session_id")
  }

  val q62Sql: String =
    s"""SELECT user_id, session_id, COUNT(*) AS n_events,
       |  MIN(ts) AS session_start, MAX(ts) AS session_end,
       |  ${sqlDsum("value")} AS session_value
       |FROM (
       |  SELECT user_id, event_id, value, ts,
       |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM (
       |    SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
       |      CASE WHEN lag(CAST(ts AS TIMESTAMP), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |           OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |              > INTERVAL 30 MINUTE
       |           THEN 1 ELSE 0 END AS new_session
       |    FROM events) flagged) sess
       |GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  // ---- q65: semi-structured JSON column (from_json) -----------------------
  // `props` is a JSON string; Spark parses it with a typed schema
  // (from_json), the oracle extracts the same field by regex — equal
  // results prove the parse.
  def q65EventsJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(
        count(col("k")).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val q65Sql: String =
    """SELECT event_type,
      |  COUNT(k) AS n,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  MIN(k) AS min_k,
      |  MAX(k) AS max_k
      |FROM (SELECT event_type,
      |        CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INT) AS k
      |      FROM events) j
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---- q66: as-of join (composed from union + window) ---------------------
  // For each event, the customer's most recent order at or before the
  // event time. Spark lacks a native as-of join; rather than a custom
  // SparkPlan, this composes built-ins (preference (a) of the build
  // brief): tag both sides, union, and carry the last order attributes
  // forward with an ignore-nulls window — one shuffle by key, no range
  // explosion, scales as a plain keyed sort. Orders are deduped per
  // (custkey, date) first so ties can't make the match nondeterministic.
  // The DuckDB oracle is its native ASOF JOIN.
  def q66AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val o = graft.Tables.t(s, dir, "orders")
      .groupBy("o_custkey", "o_orderdate")
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val oTagged = o.select(
      col("o_custkey").as("k"), col("o_orderdate").as("t"),
      lit(0).as("src"), col("o_orderkey"), col("o_orderdate"),
      lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"))
    val e = Tables.events(s, dir)
    val eTagged = e.select(
      col("user_id").as("k"), col("ts").as("t"),
      lit(1).as("src"), lit(null).cast("long").as("o_orderkey"),
      lit(null).cast("timestamp_ntz").as("o_orderdate"),
      col("event_id"), col("value"))
    // at equal t the order sorts first (src 0 < 1) → "at or before" matches
    val w = Window.partitionBy("k").orderBy("t", "src")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    oTagged.union(eTagged)
      .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("asof_orderdate", last(col("o_orderdate"), ignoreNulls = true).over(w))
      .filter(col("src") === 1 && col("asof_orderkey").isNotNull)
      .select(col("event_id"), col("k").as("user_id"), col("t").as("ts"),
        col("asof_orderkey"), col("asof_orderdate"),
        datediff(col("t").cast("date"), col("asof_orderdate").cast("date")).as("days_since_order"))
      .orderBy("event_id")
  }

  val q66Sql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY o_custkey, o_orderdate)
      |SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
      |  o.o_orderkey AS asof_orderkey, o.o_orderdate AS asof_orderdate,
      |  CAST(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(CAST(e.ts AS TIMESTAMP) AS DATE)) AS INT) AS days_since_order
      |FROM events e
      |ASOF JOIN o ON e.user_id = o.o_custkey AND CAST(e.ts AS TIMESTAMP) >= o.o_orderdate
      |ORDER BY event_id""".stripMargin

  // ---- q67: range/interval join -------------------------------------------
  // Events within 3 days after each of the customer's first 3 orders —
  // an equi-join on the key FIRST (bounding the pair count), then the
  // range predicate; never a pure range cross-product. The 2024-vs-2001
  // testdata time ranges would make the natural version empty, so event
  // times are projected onto the order-date era deterministically.
  def q67RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val o = graft.Tables.t(s, dir, "orders")
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        // deterministic projection into 1995–2001: day index from event id
        (lit("1995-01-01").cast("timestamp_ntz")
          + make_dt_interval(pmod(col("event_id"), lit(2400)).cast("int"))).as("ts2"))
    e.join(o, col("user_id") === col("o_custkey")
        && col("ts2") >= col("o_orderdate")
        && col("ts2") < col("o_orderdate") + expr("INTERVAL 3 DAYS"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_events"), min(col("ts2")).as("first_event"))
      .orderBy("o_orderkey")
  }

  val q67Sql: String =
    """SELECT o_orderkey, COUNT(*) AS n_events, MIN(ts2) AS first_event
      |FROM (
      |  SELECT event_id, user_id,
      |    TIMESTAMP '1995-01-01 00:00:00' + INTERVAL (event_id % 2400) DAY AS ts2
      |  FROM events) e
      |JOIN (SELECT o_orderkey, o_custkey, o_orderdate FROM orders WHERE o_orderkey % 10 = 0) o
      |  ON e.user_id = o.o_custkey
      | AND e.ts2 >= o.o_orderdate
      | AND e.ts2 < o.o_orderdate + INTERVAL 3 DAY
      |GROUP BY o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_events_hourly" -> q60Hourly _,
    "q61_events_sliding" -> q61Sliding _,
    "q62_sessionize" -> q62Sessionize _,
    "q65_events_json" -> q65EventsJson _,
    "q66_asof_join" -> q66AsofJoin _,
    "q67_range_join" -> q67RangeJoin _,
  )

  val oracle: Map[String, String] = Map(
    "q60_events_hourly" -> q60Sql,
    "q61_events_sliding" -> q61Sql,
    "q62_sessionize" -> q62Sql,
    "q65_events_json" -> q65Sql,
    "q66_asof_join" -> q66Sql,
    "q67_range_join" -> q67Sql,
  )
}
