package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.ops.Num._

/** Structured Streaming over the `events` table (SURVEY.md §2.7: the
  * reference is pure batch; this is the streaming surface the new engine
  * adds). The same parquet drives a file-source stream; windowed
  * aggregation runs with `Trigger.AvailableNow` to a memory sink, so the
  * streaming plan is exercised end-to-end and its result is comparable to
  * the batch oracle (`q60`-style SQL).
  */
object EventStream {

  /** Raw schema with ts as nanos-long (see [[graft.Tables.events]]). */
  private val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream of events with µs TIMESTAMP_NTZ `ts`. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The streaming file source monitors a DIRECTORY; the testdata table is
    // a single read-only file, so stage a temp dir with a symlink to it.
    val staged = java.nio.file.Files.createTempDirectory("graft_events_stream_")
    java.nio.file.Files.createSymbolicLink(
      staged.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    spark.readStream
      .schema(rawSchema)
      .parquet(staged.toString)
      // TimestampType (not NTZ): watermarks require an event-time zone;
      // sessions pin UTC, so wall values match the NTZ batch path.
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Tumbling 1-hour windowed aggregation with a 2-hour watermark — the
    * canonical streaming shape (watermark + window + agg). The watermark
    * only gates state eviction in append mode; under complete mode it is
    * carried but not dropping, which keeps this twin comparable to batch.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))

  /** Run the streaming plan to completion on the static parquet and return
    * the materialized result — the batch-equivalence bridge used by the
    * driver contract (`q63_stream_hourly`).
    */
  def q63StreamHourly(s: SparkSession, dir: String): DataFrame = {
    val name = s"stream_hourly_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = hourlyAgg(eventsStream(s, dir))
      .select(col("window.start").cast("timestamp_ntz").as("hour_start"),
        col("event_type"), col("n"), col("total_value"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name).orderBy("hour_start", "event_type")
  }

  val q63Sql: String =
    s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start, event_type,
       |  COUNT(*) AS n, ${sqlDsum("value")} AS total_value
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY hour_start, event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_stream_hourly" -> (q63StreamHourly _)
  )

  val oracle: Map[String, String] = Map(
    "q63_stream_hourly" -> q63Sql,
  )
}
