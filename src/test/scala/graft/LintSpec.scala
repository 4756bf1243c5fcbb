package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural enforcement of source-level numeric conventions that every
  * oracle hash-match depends on but that no compiler checks.
  */
class LintSpec extends AnyFunSuite {

  /** The Num.scala discipline (`ops/Num.scala:33-38`): never cast a
    * COMPUTED double to decimal — Spark converts double→decimal via the
    * shortest decimal string, DuckDB via scaling arithmetic, and a value
    * within 1 ulp of a scale-boundary flips differently in each engine.
    * Decimal casts are only safe on (a) raw grid-valued columns (money/
    * rate), (b) values rounded first (dsum6), or (c) products that are
    * EXACT in f64 (integer-grid inputs).
    *
    * This lint pins every `DecimalType(` cast site in main sources to an
    * audited per-file count. Adding a new decimal cast fails this test
    * until the site is audited against the rule above and the count
    * updated — the convention is now structural, not folklore.
    */
  test("driver contract: no key collisions, no orphaned oracles") {
    // SparkEntry aggregates the module maps with `++`, which silently
    // keeps the LAST binding on a key collision — a duplicated query name
    // in two modules would quietly drop one implementation from the
    // driver's gate. Likewise an oracle key with no query entry would
    // never be exercised.
    val moduleMaps = Seq(
      "Relational" -> ops.Relational.queries, "Actuarial" -> actuarial.Actuarial.queries,
      "TextOps" -> ops.TextOps.queries, "Dedup" -> ops.Dedup.queries,
      "Curation" -> ops.Curation.queries, "Similarity" -> ops.Similarity.queries,
      "Events" -> ops.Events.queries, "Multimodal" -> ops.Multimodal.queries,
      "Pipeline" -> ops.Pipeline.queries, "Corpus" -> ops.Corpus.queries,
      "Analytics" -> ops.Analytics.queries, "Warehouse" -> ops.Warehouse.queries,
      "Formats" -> sources.Formats.queries, "EventStream" -> streaming.EventStream.queries)
    val owners = moduleMaps.flatMap { case (m, qs) => qs.keys.map(_ -> m) }
    val dups = owners.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"query keys defined in several modules (one silently wins): " +
        dups.map { case (k, ms) => s"$k -> ${ms.map(_._2).mkString("/")}" }.mkString(", "))
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query (never exercised): $orphans")
    assert(SparkEntry.queries.size == owners.size,
      "aggregated query map lost entries")
  }

  test("decimal casts appear only at audited sites") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val sites: Map[String, Int] = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        java.nio.file.Files.readAllLines(p).asScala
          .filter(l => l.contains("DecimalType(") && !l.trim.startsWith("import"))
          .map(_ => root.relativize(p).toString.replace('\\', '/'))
      }
      .toSeq.groupBy(identity).view.mapValues(_.size).toMap
    val audited = Map(
      // dsum / dsum6 / money / rate — the discipline's own sanctioned forms
      "ops/Num.scala" -> 4,
      // q9 running-total sum (raw grid column), q26 Σx² (l_quantity is an
      // integer-valued grid, so the product is exact in f64 — audited),
      // q38 per-part sum (raw grid column)
      "ops/Relational.scala" -> 3,
    )
    assert(sites == audited,
      s"un-audited DecimalType cast sites: $sites vs audited $audited — " +
        "read ops/Num.scala:33-38 before adding one (computed doubles must " +
        "round first or stay double; raw grid columns and f64-exact " +
        "products are fine), then update the audited map")
  }
}
