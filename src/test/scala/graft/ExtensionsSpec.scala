package graft

import org.apache.spark.sql.functions._

import graft.functions.DotProduct

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("RewriteDotProduct rule replaces the zip_with/aggregate composition") {
    // non-literal input so constant folding can't evaluate the whole thing
    val df = spark.range(2)
      .select(array(col("id") + 1.0, col("id") + 2.0).as("a"),
        array(col("id") + 3.0, col("id") + 4.0).as("b"))
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d"))
    val optimized = df.queryExecution.optimizedPlan
    val rewritten = optimized.expressions.exists(_.exists(_.isInstanceOf[DotProduct]))
    assert(rewritten, s"expected DotProduct in:\n$optimized")
    assert(df.first().getDouble(0) == 11.0) // id=0: [1,2]·[3,4]
  }

  test("rule leaves non-dot-product aggregates alone") {
    val df = spark.range(2)
      .select(array(col("id") + 1.0, col("id") + 2.0).as("a"),
        array(col("id") + 3.0, col("id") + 4.0).as("b"))
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x + y), // sum, not product
        lit(0.0), (acc, x) => acc + x).as("d"))
    val rewritten = df.queryExecution.optimizedPlan
      .expressions.exists(_.exists(_.isInstanceOf[DotProduct]))
    assert(!rewritten)
    assert(df.first().getDouble(0) == 10.0)
  }

  test("extension-injected SQL functions work") {
    assert(spark.sql("SELECT dot_product(array(1.0d,2.0d), array(3.0d,4.0d))")
      .first().getDouble(0) == 11.0)
    val mean = spark.sql(
      "SELECT avg(x) FROM (SELECT rand_exponential(2.0d, 7) AS x FROM range(100000))")
      .first().getDouble(0)
    assert(math.abs(mean - 0.5) < 0.02, s"mean=$mean")
  }
}
