package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator module; each key with an
  * `oracleSql` twin is hash-checked by the driver against DuckDB on the same
  * parquet tables (sf0.01). Keys without a twin get a rows-only check
  * (stochastic / hash-function-dependent ops).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++
      actuarial.Actuarial.queries ++
      ops.TextOps.queries ++
      ops.Dedup.queries ++
      ops.Curation.queries ++
      ops.Similarity.queries ++
      ops.Events.queries ++
      ops.Multimodal.queries ++
      ops.Pipeline.queries ++
      ops.Corpus.queries ++
      ops.Analytics.queries ++
      ops.Warehouse.queries ++
      sources.Formats.queries ++
      streaming.EventStream.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++
      actuarial.Actuarial.oracle ++
      ops.TextOps.oracle ++
      ops.Dedup.oracle ++
      ops.Curation.oracle ++
      ops.Similarity.oracle ++
      ops.Events.oracle ++
      ops.Multimodal.oracle ++
      ops.Pipeline.oracle ++
      ops.Corpus.oracle ++
      ops.Analytics.oracle ++
      ops.Warehouse.oracle ++
      sources.Formats.oracle ++
      streaming.EventStream.oracle
}
