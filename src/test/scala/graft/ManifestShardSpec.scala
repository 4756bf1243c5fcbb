package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DigestManifest

/** SHARDED MANIFEST tests: commits write O(changes) delta snapshots
  * (`#base:<v-1>` + change records) instead of the full file listing,
  * with a full base every 16th version re-anchoring the chain, and an
  * O(1)-byte `#version:<N>` pointer. Resolution (fold + per-table head
  * cache) must be byte-for-byte equivalent to the old full-listing
  * protocol for every reader — these specs pin the shapes, the
  * equivalence, the fold-exactness fallback, legacy compatibility, and
  * the expire-time chain rebase.
  */
class ManifestShardSpec extends AnyFunSuite {

  private def tmp(prefix: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  private def rawLines(dir: java.nio.file.Path, name: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(dir.resolve(name)).asScala
      .filter(_.nonEmpty).toSeq
  }

  test("append commits write #base: delta snapshots whose size is " +
      "O(changes), not O(table files); the pointer is a #version: line") {
    val dir = tmp("graft_shard_delta_")
    (1 to 12).foreach { i =>
      DigestManifest.publishAppend(dir.toString,
        Seq(s"lang_aa-f$i.csv,$i"), DigestManifest.currentVersion(dir.toString))
    }
    // v1 is a full base, v2.. are deltas naming only their own change
    assert(!rawLines(dir, "_MANIFEST.v1").head.startsWith("#"))
    (2 to 12).foreach { v =>
      val lines = rawLines(dir, s"_MANIFEST.v$v")
      assert(lines.head == s"#base:${v - 1}", s"v$v not delta-shaped: $lines")
      assert(lines.tail == Seq(s"+lang_aa-f$v.csv,$v"),
        s"v$v delta should carry exactly its own commit's change: $lines")
    }
    // per-commit bytes FLAT: the 12th snapshot is no bigger than the 2nd
    val s2 = java.nio.file.Files.size(dir.resolve("_MANIFEST.v2"))
    val s12 = java.nio.file.Files.size(dir.resolve("_MANIFEST.v12"))
    assert(s12 <= s2 + 4, s"per-commit bytes grew with table size: $s2 -> $s12")
    // the pointer is O(1) bytes
    assert(rawLines(dir, "_MANIFEST") == Seq("#version:12"))
    // and resolution equals the logical listing
    assert(DigestManifest.head(dir.toString) ==
      (12, (1 to 12).map(i => s"lang_aa-f$i.csv,$i")))
  }

  test("every 16th version is a FULL base re-anchoring the chain; " +
      "resolution across the boundary is exact") {
    val dir = tmp("graft_shard_base_")
    (1 to 20).foreach { i =>
      DigestManifest.publishAppend(dir.toString,
        Seq(s"lang_aa-f$i.csv,$i"), DigestManifest.currentVersion(dir.toString))
    }
    assert(!rawLines(dir, "_MANIFEST.v16").head.startsWith("#"),
      "v16 must be a full base")
    assert(rawLines(dir, "_MANIFEST.v16").size == 16)
    assert(rawLines(dir, "_MANIFEST.v17").head == "#base:16")
    // time travel to arbitrary versions folds correctly on both sides
    assert(DigestManifest.listingAt(dir.toString, DigestManifest.MainRef, 15) ==
      (1 to 15).map(i => s"lang_aa-f$i.csv,$i"))
    assert(DigestManifest.listingAt(dir.toString, DigestManifest.MainRef, 20) ==
      (1 to 20).map(i => s"lang_aa-f$i.csv,$i"))
  }

  test("replace commits fold removals and in-place mutations (DV-style) " +
      "through the delta shape; truncate falls back to a full (empty) " +
      "snapshot because empty is smaller than its delta") {
    val dir = tmp("graft_shard_replace_")
    // enough surviving entries that the delta is smaller than the full
    // listing (on a tiny table the size heuristic rightly prefers full)
    (1 to 9).foreach { i =>
      DigestManifest.publishAppend(dir.toString,
        Seq(s"lang_aa-f$i.csv,$i"), DigestManifest.currentVersion(dir.toString))
    }
    // DV-style in-place mutation of one entry + removal of another
    val mutated = (1 to 9).map {
      case 2 => "lang_aa-f2.csv,1,dv=0:1"
      case i => s"lang_aa-f$i.csv,$i"
    }.filterNot(_.startsWith("lang_aa-f3"))
    DigestManifest.publishReplace(dir.toString, mutated, 9)
    val v10 = rawLines(dir, "_MANIFEST.v10")
    assert(v10.head == "#base:9" &&
      v10.tail.toSet == Set("-lang_aa-f3.csv,3",
        "~lang_aa-f2.csv,2|lang_aa-f2.csv,1,dv=0:1"),
      s"replace delta wrong: $v10")
    assert(DigestManifest.head(dir.toString) == (10, mutated))
    // truncate: the full empty snapshot wins over an all-removes delta
    DigestManifest.publishReplace(dir.toString, Seq.empty, 10)
    assert(java.nio.file.Files.size(dir.resolve("_MANIFEST.v11")) == 0L)
    assert(DigestManifest.head(dir.toString) == (11, Seq.empty))
  }

  test("a listing the delta grammar cannot reproduce (reordered entries) " +
      "falls back to a FULL snapshot — correctness never depends on " +
      "delta-expressibility") {
    val dir = tmp("graft_shard_fallback_")
    DigestManifest.publish(dir.toString, Seq("a.csv,1", "b.csv,2"))
    // same entries, reversed order: fold-verify fails -> full shape
    DigestManifest.publish(dir.toString, Seq("b.csv,2", "a.csv,1"))
    val v2 = rawLines(dir, "_MANIFEST.v2")
    assert(!v2.head.startsWith("#"), s"reorder must write a full base: $v2")
    assert(DigestManifest.head(dir.toString) == (2, Seq("b.csv,2", "a.csv,1")))
  }

  test("legacy full-shape snapshots and a legacy raw-listing pointer " +
      "resolve unchanged (shape detected per file, not per table)") {
    val dir = tmp("graft_shard_legacy_")
    java.nio.file.Files.write(dir.resolve("_MANIFEST.v1"),
      "a.csv,1\nb.csv,2".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("_VERSIONS"),
      "1,1000\n".getBytes("UTF-8"))
    // a pre-shard pointer holds the listing itself
    java.nio.file.Files.write(dir.resolve("_MANIFEST"),
      "a.csv,1\nb.csv,2".getBytes("UTF-8"))
    assert(DigestManifest.head(dir.toString) == (1, Seq("a.csv,1", "b.csv,2")))
    assert(DigestManifest.listingFor(dir.toString, "_MANIFEST") ==
      Seq("a.csv,1", "b.csv,2"))
    // a commit on top of the legacy state shards from there on
    DigestManifest.publishAppend(dir.toString, Seq("c.csv,3"), 1)
    assert(rawLines(dir, "_MANIFEST.v2").head == "#base:1")
    assert(rawLines(dir, "_MANIFEST") == Seq("#version:2"))
    assert(DigestManifest.listingFor(dir.toString, "_MANIFEST") ==
      Seq("a.csv,1", "b.csv,2", "c.csv,3"))
  }

  test("the head cache survives a cold process (cleared cache) and a " +
      "dropped-and-recreated table at the same path never serves a " +
      "stale fold") {
    val dir = tmp("graft_shard_cache_")
    (1 to 5).foreach { i =>
      DigestManifest.publishAppend(dir.toString,
        Seq(s"f$i.csv,$i"), DigestManifest.currentVersion(dir.toString))
    }
    val hot = DigestManifest.head(dir.toString)
    DigestManifest.clearHeadCacheForTest()
    assert(DigestManifest.head(dir.toString) == hot, "cold fold differs")
    // recreate the table at the SAME path with different content
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(dir).iterator().asScala.toSeq
      .foreach(java.nio.file.Files.delete)
    (1 to 5).foreach { i =>
      DigestManifest.publishAppend(dir.toString,
        Seq(s"OTHER$i.csv,$i"), DigestManifest.currentVersion(dir.toString))
    }
    assert(DigestManifest.head(dir.toString) ==
      (5, (1 to 5).map(i => s"OTHER$i.csv,$i")),
      "stale cache served the dropped table's fold")
  }

  test("branch refs shard independently: a branch commit writes a delta " +
      "against ITS OWN chain under @ref names") {
    val dir = tmp("graft_shard_branch_")
    val base = (1 to 6).map(i => s"lang_aa-file-$i.csv,$i")
    DigestManifest.publish(dir.toString, base)
    DigestManifest.publish(dir.toString, base, "dev")
    DigestManifest.publishAppend(dir.toString, Seq("lang_bb-new.csv,7"), 1, "dev")
    assert(rawLines(dir, "_MANIFEST@dev.v2").head == "#base:1")
    assert(rawLines(dir, "_MANIFEST@dev") == Seq("#version:2"))
    assert(DigestManifest.head(dir.toString, "dev") ==
      (2, base :+ "lang_bb-new.csv,7"))
    // main untouched
    assert(DigestManifest.head(dir.toString) == (1, base))
  }
}
