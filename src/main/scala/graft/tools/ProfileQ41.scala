package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the q41 pipeline. */
object ProfileQ41 {
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = graft.Tables.t(spark, dir, "documents")
    val ws = split(trim(lower(col("text"))), "\\s+")
    val tokenized = docs.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), ws.as("ws"))
    time("tokenize only")(tokenized.count())
    val arr = tokenized.repartition(col("doc_id"))
      .select(col("doc_id"),
        array_distinct(
          when(size(col("ws")) >= 3,
            transform(sequence(lit(1), size(col("ws")) - 2),
              i => concat_ws(" ",
                element_at(col("ws"), i),
                element_at(col("ws"), i + 1),
                element_at(col("ws"), i + 2))))
            .otherwise(array().cast("array<string>"))).as("arr"))
    time("arr build")(arr.count())
    val sh = arr.select(col("doc_id"), size(col("arr")).as("n_doc"),
      explode(col("arr")).as("shingle"))
    time("sh explode")(sh.count())
    val rare = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 100).select("shingle")
    time("rare df-filter")(rare.count())
    val shf = sh.join(broadcast(rare), "shingle")
    time("shf join")(shf.count())
    val a = shf.select(col("shingle"), col("doc_id").as("id_a"), col("n_doc").as("n_a"))
    val b = shf.select(col("shingle"), col("doc_id").as("id_b"), col("n_doc").as("n_b"))
    val pairs = a.hint("shuffle_hash").join(b, "shingle")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("n_common"))
    time("pairs agg")(pairs.count())
    time("pairs agg again")(pairs.count())
    spark.stop()
  }
}
