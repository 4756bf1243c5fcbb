package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // expensive lambda exprs must not be re-inlined into scan filters
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session (codegen, shuffle machinery, broadcast env) so
    // the first timed query isn't charged JVM start-up costs
    spark.range(1000000).selectExpr("sum(id)").collect()
    import org.apache.spark.sql.functions.broadcast
    val wr = spark.range(1000)
    wr.join(broadcast(spark.range(100)), "id").count()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
