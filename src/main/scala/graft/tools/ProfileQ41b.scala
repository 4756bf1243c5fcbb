package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: isolate the expensive expression in the shingle build. */
object ProfileQ41b {
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

    time("force split (sum sizes)")(
      tokenized.select(sum(size(col("ws")))).collect())

    val shingleExpr =
      when(size(col("ws")) >= 3,
        transform(sequence(lit(1), size(col("ws")) - 2),
          i => concat_ws(" ",
            element_at(col("ws"), i),
            element_at(col("ws"), i + 1),
            element_at(col("ws"), i + 2))))
        .otherwise(array().cast("array<string>"))

    time("force transform (sum sizes)")(
      tokenized.select(sum(size(shingleExpr))).collect())

    time("force transform+distinct")(
      tokenized.select(sum(size(array_distinct(shingleExpr)))).collect())

    val cached = tokenized.repartition(col("doc_id"))
      .select(col("doc_id"), array_distinct(shingleExpr).as("arr")).persist()
    time("materialize arr (cache)")(cached.count())
    time("explode from cache")(
      cached.select(col("doc_id"), explode(col("arr"))).count())
    time("explode from cache again")(
      cached.select(col("doc_id"), explode(col("arr"))).count())

    // rest of q41 from the cached arr
    val sh = cached.select(col("doc_id"), size(col("arr")).as("n_doc"),
      explode(col("arr")).as("shingle"))
    val rare = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 100).select("shingle")
    val shf = sh.join(broadcast(rare), "shingle")
    val a = shf.select(col("shingle"), col("doc_id").as("id_a"), col("n_doc").as("n_a"))
    val b = shf.select(col("shingle"), col("doc_id").as("id_b"), col("n_doc").as("n_b"))
    val pairsHinted = a.hint("shuffle_hash").join(b, "shingle")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b").agg(count(lit(1)).as("n_common"))
    time("pairs from cache (shuffle_hash)")(pairsHinted.count())
    val pairsDefault = a.join(b, "shingle")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b").agg(count(lit(1)).as("n_common"))
    time("pairs from cache (default strategy)")(pairsDefault.count())
    time("full q41 as shipped")(
      graft.SparkEntry.queries("q41_ngram_jaccard")(spark, dir).count())
    spark.stop()
  }
}
