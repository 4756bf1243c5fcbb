package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Every digest flavor honors the declared data plane (`'format'` =
  * parquet, q266) on its WRITE paths — delta (merge-on-read), rowlevel
  * (group rewrites), partitioned, and branch tables all route new DATA
  * files through the plane, while delta VERB LOGS (`delta-*`) stay
  * plain-text records and reads dispatch per file's byte format (so
  * mixed-plane history always reads correctly).
  */
class PlaneFlavorsSpec extends SparkSpec {

  private def tmp(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  private def dataFiles(dir: Path): Seq[String] = {
    val l = Files.list(dir)
    try l.iterator().asScala.map(_.getFileName.toString)
      .filter(n => !n.startsWith("_") && !n.startsWith(".") &&
        !n.startsWith("delta-") && !Files.isDirectory(dir.resolve(n))).toSeq
    finally l.close()
  }

  private def setupCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")

  private val seed =
    "SELECT id AS doc_id, CASE WHEN id % 2 = 0 THEN 'aa' ELSE 'bb' END " +
      "AS lang, id * 3 AS n_chars FROM range(200)"

  test("delta flavor on the parquet plane: base insert writes parquet, " +
      "verb logs stay text, compact materializes parquet") {
    setupCatalog()
    val dir = tmp("graft_plane_delta_")
    val tbl = s"graft.ns.pldelta_${System.nanoTime()}"
    spark.sql(s"""CREATE TABLE $tbl (doc_id BIGINT, lang STRING, n_chars BIGINT)
                 |USING graft_digest TBLPROPERTIES ('path'='$dir',
                 |  'delta'='true', 'format'='parquet')""".stripMargin)
    spark.sql(s"INSERT INTO $tbl $seed")
    assert(dataFiles(dir).nonEmpty && dataFiles(dir).forall(_.endsWith(".parquet")),
      dataFiles(dir).toString)
    spark.sql(s"UPDATE $tbl SET n_chars = 0 WHERE doc_id % 10 = 1")
    spark.sql(s"DELETE FROM $tbl WHERE doc_id % 10 = 2")
    // merge-on-read readback folds verb logs over parquet base files
    assert(spark.sql(s"SELECT COUNT(*) FROM $tbl").head().getLong(0) == 180)
    // 20 updated rows + doc_id 0 (whose seed n_chars is 0*3)
    assert(spark.sql(
      s"SELECT COUNT(*) FROM $tbl WHERE n_chars = 0").head().getLong(0) == 21)
    val short = tbl.split("\\.").drop(1).mkString(".")
    spark.sql(s"CALL graft.system.compact(table => '$short')").collect()
    assert(dataFiles(dir).forall(_.endsWith(".parquet")),
      s"post-compact: ${dataFiles(dir)}")
    assert(spark.sql(s"SELECT COUNT(*) FROM $tbl").head().getLong(0) == 180)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("rowlevel flavor on the parquet plane: the group rewrite's " +
      "replacement files are parquet and the rewrite is value-exact") {
    setupCatalog()
    val dir = tmp("graft_plane_rlo_")
    val tbl = s"graft.ns.plrlo_${System.nanoTime()}"
    spark.sql(s"""CREATE TABLE $tbl (doc_id BIGINT, lang STRING, n_chars BIGINT)
                 |USING graft_digest TBLPROPERTIES ('path'='$dir',
                 |  'rowlevel'='true', 'format'='parquet')""".stripMargin)
    spark.sql(s"INSERT INTO $tbl $seed")
    spark.sql(s"UPDATE $tbl SET n_chars = n_chars + 1 WHERE lang = 'aa'")
    assert(dataFiles(dir).forall(_.endsWith(".parquet")), dataFiles(dir).toString)
    assert(spark.sql(s"SELECT SUM(n_chars) FROM $tbl WHERE lang = 'aa'")
      .head().getLong(0) == (0 until 200 by 2).map(_ * 3L + 1).sum)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("branch flavor on the parquet plane: a branch INSERT writes " +
      "parquet into the shared directory and main stays isolated") {
    setupCatalog()
    val dir = tmp("graft_plane_branch_")
    val main = s"graft.ns.plmain_${System.nanoTime()}"
    val dev = s"graft.ns.pldev_${System.nanoTime()}"
    // branches need a history-retaining flavor (create_branch refuses
    // plain tables) — the delta flavor on the parquet plane
    spark.sql(s"""CREATE TABLE $main (doc_id BIGINT, lang STRING, n_chars BIGINT)
                 |USING graft_digest TBLPROPERTIES ('path'='$dir',
                 |  'delta'='true', 'format'='parquet')""".stripMargin)
    spark.sql(s"INSERT INTO $main $seed")
    val mainShort = main.split("\\.").drop(1).mkString(".")
    spark.sql(s"CALL graft.system.create_branch(table => '$mainShort', " +
      "branch => 'dev')").collect()
    spark.sql(s"""CREATE TABLE $dev (doc_id BIGINT, lang STRING, n_chars BIGINT)
                 |USING graft_digest TBLPROPERTIES ('path'='$dir',
                 |  'branch'='dev', 'format'='parquet')""".stripMargin)
    val before = dataFiles(dir).toSet
    spark.sql(s"INSERT INTO $dev SELECT 9999, 'zz', 1")
    val fresh = dataFiles(dir).toSet -- before
    assert(fresh.nonEmpty && fresh.forall(_.endsWith(".parquet")), fresh.toString)
    assert(spark.sql(s"SELECT COUNT(*) FROM $dev").head().getLong(0) == 201)
    assert(spark.sql(s"SELECT COUNT(*) FROM $main").head().getLong(0) == 200,
      "main must not see the branch's staged parquet file")
    spark.sql(s"DROP TABLE $dev")
    spark.sql(s"DROP TABLE $main")
  }

  test("partitioned flavor on the parquet plane: inserts land parquet and " +
      "partition listing still serves from file names") {
    setupCatalog()
    val dir = tmp("graft_plane_part_")
    val tbl = s"graft.ns.plpart_${System.nanoTime()}"
    spark.sql(s"""CREATE TABLE $tbl (doc_id BIGINT, lang STRING, n_chars BIGINT)
                 |USING graft_digest TBLPROPERTIES ('path'='$dir',
                 |  'partitioned'='true', 'format'='parquet')""".stripMargin)
    spark.sql(s"INSERT INTO $tbl $seed")
    assert(dataFiles(dir).nonEmpty && dataFiles(dir).forall(_.endsWith(".parquet")),
      dataFiles(dir).toString)
    val parts = spark.sql(s"SHOW PARTITIONS $tbl").collect().map(_.getString(0)).toSet
    assert(parts == Set("lang=aa", "lang=bb"), parts.toString)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("streaming epochs honor the parquet plane: every epoch's committed " +
      "files are parquet and the batch read-back is value-exact") {
    setupCatalog()
    val dir = tmp("graft_plane_stream_")
    val tbl = s"graft.ns.plstream_${System.nanoTime()}"
    spark.sql(s"""CREATE TABLE $tbl (doc_id BIGINT, lang STRING, n_chars BIGINT)
                 |USING graft_digest TBLPROPERTIES ('path'='$dir',
                 |  'format'='parquet')""".stripMargin)
    val ckpt = tmp("graft_plane_stream_ckpt_")
    val q = spark.readStream.format("graft.sources.SeqSource")
      .option("rows", "400").option("slices", "4")
      .option("columnar", "false").option("rowsPerBatch", "100")
      .load()
      .selectExpr("id AS doc_id", "substr(h, 1, 1) AS lang", "v AS n_chars")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable(tbl)
    q.awaitTermination()
    // multiple epochs landed, every committed data file is parquet, and
    // the manifest-gated batch read folds them value-exactly
    val files = dataFiles(dir)
    val epochs = files.flatMap(n => "-je(\\d+)-".r.findFirstMatchIn(n).map(_.group(1)))
      .distinct
    assert(epochs.size >= 2, s"expected multiple epochs, got $files")
    assert(files.nonEmpty && files.forall(_.endsWith(".parquet")), files.toString)
    assert(spark.table(tbl).count() == 400)
    assert(spark.sql(s"SELECT SUM(n_chars) FROM $tbl").head().getLong(0) ==
      (0L until 400L).map(i => i * 2654435761L % 1000003L).sum)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("expire_snapshots on a BRANCH: per-ref retention with per-ref pins, " +
      "main untouched, no file another ref names is GC'd") {
    setupCatalog()
    val dir = tmp("graft_plane_brexp_")
    val tbl = s"graft.ns.brexp_${System.nanoTime()}"
    val short = tbl.split("\\.").drop(1).mkString(".")
    spark.sql(s"""CREATE TABLE $tbl (doc_id BIGINT, lang STRING, n_chars BIGINT)
                 |USING graft_digest TBLPROPERTIES ('path'='$dir', 'delta'='true')""".stripMargin)
    spark.sql(s"INSERT INTO $tbl VALUES (1, 'aa', 10)")
    spark.sql(s"CALL graft.system.create_branch(table => '$short', branch => 'work')").collect()
    val tblB = s"${tbl}_work"
    spark.sql(s"""CREATE TABLE $tblB (doc_id BIGINT, lang STRING, n_chars BIGINT)
                 |USING graft_digest TBLPROPERTIES ('path'='$dir', 'branch'='work')""".stripMargin)
    (2 to 5).foreach(i => spark.sql(s"INSERT INTO $tblB VALUES ($i, 'bb', ${i * 10})"))
    // pin an early branch version, then expire the branch to keep_last=1
    spark.sql(s"CALL graft.system.create_tag(table => '$short', tag => 'early', " +
      "version => 2, branch => 'work')").collect()
    val mainVersions = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("_MANIFEST.v")).toSet
    val r = spark.sql(s"CALL graft.system.expire_snapshots(table => '$short', " +
      "keep_last => 1, branch => 'work')").collect()
    assert(r.length == 1, r.toSeq.toString)
    // the pinned version and the head survive; earlier branch snapshots gone
    assert(Files.exists(dir.resolve("_MANIFEST@work.v2")), "pin must survive")
    assert(!Files.exists(dir.resolve("_MANIFEST@work.v3")), "v3 must expire")
    // main's snapshots are untouched and main still reads
    val mainAfter = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("_MANIFEST.v")).toSet
    assert(mainAfter == mainVersions, s"$mainVersions vs $mainAfter")
    assert(spark.table(tbl).count() == 1)
    // the branch head and the pin still read exactly their content
    assert(spark.table(tblB).count() == 5)
    assert(spark.sql(s"SELECT COUNT(*) FROM $tbl VERSION AS OF 'early'")
      .head().getLong(0) == 2)
    // expiring an unknown branch refuses
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.system.expire_snapshots(table => '$short', " +
        "keep_last => 1, branch => 'ghost')").collect()
    }
    assert(e.getMessage.contains("no branch"), e.getMessage)
    spark.sql(s"DROP TABLE $tbl"); spark.sql(s"DROP TABLE $tblB")
  }
}
