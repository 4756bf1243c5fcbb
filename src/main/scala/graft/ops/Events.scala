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

  // -------------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_events_hourly" -> q60Hourly _,
    "q61_events_sliding" -> q61Sliding _,
    "q62_sessionize" -> q62Sessionize _,
    "q65_events_json" -> q65EventsJson _,
  )

  val oracle: Map[String, String] = Map(
    "q60_events_hourly" -> q60Sql,
    "q61_events_sliding" -> q61Sql,
    "q62_sessionize" -> q62Sql,
    "q65_events_json" -> q65Sql,
  )
}
