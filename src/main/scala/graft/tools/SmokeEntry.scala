package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-parity smoke: call SparkEntry.entry on a BARE session (no
  * extensions, no custom confs) exactly as the driver would.
  */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n schema=${df.schema.simpleString}")
    assert(n > 0)
    spark.stop()
  }
}
