package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: bisect the Generate(explode) cost. */
object ProfileQ41c {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = graft.Tables.t(spark, dir, "documents")
    val ws = split(trim(lower(col("text"))), "\\s+")
    val tokenized = docs.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), ws.as("ws"))
      .repartition(col("doc_id"))

    val shingleExpr =
      when(size(col("ws")) >= 3,
        transform(sequence(lit(1), size(col("ws")) - 2),
          i => concat_ws(" ",
            element_at(col("ws"), i),
            element_at(col("ws"), i + 1),
            element_at(col("ws"), i + 2))))
        .otherwise(array().cast("array<string>"))
    val arr = tokenized.select(col("doc_id"), array_distinct(shingleExpr).as("arr"))

    time("A explode only")(
      arr.select(col("doc_id"), explode(col("arr")).as("s")).count())
    time("B size only")(
      arr.select(col("doc_id"), size(col("arr")).as("n")).agg(sum("n")).collect())
    time("C explode+size")(
      arr.select(col("doc_id"), size(col("arr")).as("n"), explode(col("arr")).as("s")).count())
    time("A2 explode only again")(
      arr.select(col("doc_id"), explode(col("arr")).as("s")).count())
    val noDistinct = tokenized.select(col("doc_id"), shingleExpr.as("arr"))
    time("D explode no-distinct")(
      noDistinct.select(col("doc_id"), explode(col("arr")).as("s")).count())
    val filtered = tokenized.filter(size(col("ws")) >= 3)
      .select(col("doc_id"),
        transform(sequence(lit(1), size(col("ws")) - 2),
          i => concat_ws(" ",
            element_at(col("ws"), i),
            element_at(col("ws"), i + 1),
            element_at(col("ws"), i + 2))).as("arr"))
    time("E explode no-when (filter first)")(
      filtered.select(col("doc_id"), explode(col("arr")).as("s")).count())
    spark.stop()
  }
}
