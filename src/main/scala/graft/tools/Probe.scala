package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump Spark-side schemas of the driver testdata tables. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(s"== $t: ${df.schema.simpleString}")
    }
    // timestamp comparison sanity
    import org.apache.spark.sql.functions._
    val o = spark.read.parquet(s"$dir/orders.parquet")
    o.select(col("o_orderdate"),
        date_trunc("hour", col("o_orderdate")).as("tr"),
        (col("o_orderdate") <= lit("1998-09-01").cast("timestamp")).as("cmp"))
      .show(3, truncate = false)
    spark.stop()
  }
}
