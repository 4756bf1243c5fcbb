package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: per-stage timing of the shipped q41 via listener. */
object ProfileQ41d {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // expensive lambda exprs must not be re-inlined into scan filters
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {
          a <- si.submissionTime; b <- si.completionTime
        } yield (b - a) / 1000.0
        println(f"[stageinfo] id=${si.stageId}%3d tasks=${si.numTasks}%3d " +
          f"time=${dur.getOrElse(-1.0)}%6.2f s  ${si.name.takeWhile(_ != '\n').take(60)}")
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.SparkEntry.queries("q41_ngram_jaccard")(spark, dir).explain("formatted")
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries("q41_ngram_jaccard")(spark, dir).count()
    println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    Thread.sleep(500)
    spark.stop()
  }
}
