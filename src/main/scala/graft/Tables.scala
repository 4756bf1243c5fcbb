package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All relational tables are plain parquet scans — Catalyst pushes filters
  * and prunes columns into the scan, so no caching/materialization here.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` carries TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as long and floor to
    * microseconds as TIMESTAMP_NTZ — identical to DuckDB's ns→µs cast, so
    * oracle comparisons line up.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` on the session
    * (set at construction in Verify/Bench/tests). Deliberately NOT set
    * here: mutating session conf as a read side effect leaks the legacy
    * behavior into every later parquet read in the session.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
}
