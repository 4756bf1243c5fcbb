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
