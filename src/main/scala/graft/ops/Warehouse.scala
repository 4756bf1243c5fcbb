package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Warehouse-maintenance operators: MERGE/upsert semantics and
  * slowly-changing-dimension (SCD2) interval construction. Spark core has
  * no MERGE INTO statement (that lives in table formats like Delta/
  * Iceberg), but the SEMANTICS are a single relational expansion — which
  * is exactly how those formats execute it underneath: a full-outer join
  * on the merge key with per-row matched/not-matched actions.
  *
  * Hashed outputs are integers/strings/timestamps only (exact values,
  * never rounded doubles — see ops/Pipeline.scala).
  */
object Warehouse {

  // ---- q89: MERGE / upsert via full-outer join ----------------------------
  // The standing corpus receives a deterministic revision batch: every
  // doc_id % 3 == 0 document arrives re-crawled with more content
  // (update), and every doc_id % 50 == 0 document spawns a new derived
  // key (insert). MERGE semantics: matched → take the batch row,
  // not-matched-by-source → keep, not-matched-by-target → insert; each
  // output row is tagged with the action applied.
  //
  // Scale shape: one shuffle-on-key full-outer join (AQE broadcasts a
  // small batch side at runtime); at 100 TB the same plan co-locates via
  // bucketing on the merge key — nothing here pins a strategy.
  def q89MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val docs = t(s, dir, "documents")
    val updates = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("lang"), col("source"),
        (col("n_chars") + lit(1000L)).as("n_chars"))
      .unionAll(docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"),
          col("lang"), col("source"), col("n_chars")))
    base.as("b").join(updates.as("u"),
        col("b.doc_id") === col("u.doc_id"), "full_outer")
      .select(
        coalesce(col("u.doc_id"), col("b.doc_id")).as("doc_id"),
        coalesce(col("u.lang"), col("b.lang")).as("lang"),
        coalesce(col("u.source"), col("b.source")).as("source"),
        coalesce(col("u.n_chars"), col("b.n_chars")).as("n_chars"),
        when(col("b.doc_id").isNull, "insert")
          .when(col("u.doc_id").isNull, "keep")
          .otherwise("update").as("op"))
      .orderBy("doc_id")
  }

  val q89Sql: String =
    """WITH upd AS (
      |  SELECT doc_id, lang, source, n_chars + 1000 AS n_chars
      |  FROM documents WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, lang, source, n_chars
      |  FROM documents WHERE doc_id % 50 = 0)
      |SELECT COALESCE(u.doc_id, b.doc_id) AS doc_id,
      |  COALESCE(u.lang, b.lang) AS lang,
      |  COALESCE(u.source, b.source) AS source,
      |  COALESCE(u.n_chars, b.n_chars) AS n_chars,
      |  CASE WHEN b.doc_id IS NULL THEN 'insert'
      |       WHEN u.doc_id IS NULL THEN 'keep'
      |       ELSE 'update' END AS op
      |FROM documents b FULL OUTER JOIN upd u ON b.doc_id = u.doc_id
      |ORDER BY doc_id""".stripMargin

  // ---- q90: SCD2 interval build from a change log -------------------------
  // Per user, collapse the event stream into type-change intervals: a row
  // per run of consecutive identical event_types, valid [valid_from,
  // valid_to), open-ended for the current state — the standard
  // slowly-changing-dimension (type 2) construction from an append-only
  // log. Two windows, both partitioned by user_id (shuffle once on the
  // dimension key, never a global sort): lag() flags change rows, lead()
  // over the surviving change rows closes each interval. Current rows
  // carry the standard 9999-12-31 end sentinel, not NULL — SCD2 range
  // predicates (`BETWEEN valid_from AND valid_to`) then need no null
  // branch, and null timestamps (NaT) don't survive a hash compare.
  def q90Scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val changes = graft.Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    val wc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes
      .withColumn("change_seq", row_number().over(wc))
      .withColumn("valid_to",
        coalesce(lead("ts", 1).over(wc),
          lit("9999-12-31 00:00:00").cast("timestamp_ntz")))
      .select(col("user_id"), col("change_seq"), col("event_type"),
        col("ts").as("valid_from"), col("valid_to"))
      .orderBy("user_id", "change_seq")
  }

  val q90Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
      |    lag(event_type, 1) OVER w AS prev_type
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |changes AS (
      |  SELECT * FROM flagged
      |  WHERE prev_type IS NULL OR prev_type <> event_type)
      |SELECT user_id,
      |  CAST(row_number() OVER w AS INT) AS change_seq, event_type,
      |  ts AS valid_from,
      |  COALESCE(lead(ts, 1) OVER w, TIMESTAMP '9999-12-31 00:00:00') AS valid_to
      |FROM changes
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, change_seq""".stripMargin

  // ---- q117: CDC changelog apply (latest-wins with deletes) ---------------
  // The Debezium/CDC materialization shape: an append-only changelog keyed
  // by user_id, ordered by (ts, event_id), where 'error' events are
  // tombstones (deletes) and everything else upserts. Applying the log =
  // keep each key's LATEST entry; a key whose latest entry is a tombstone
  // leaves the materialized table. This is the streaming-upsert complement
  // of q89's batch MERGE: q89 merges one batch into a base, q117 collapses
  // an arbitrarily long ordered log into current state.
  //
  // Scale shape: both windows (latest-pick row_number and the per-key
  // change count) share ONE hashpartitioning exchange on user_id — the q90
  // discipline; no global sort, no self-join. At 100 TB the log is
  // additionally bucketed by key so reapplication is shuffle-free.
  def q117CdcApply(s: SparkSession, dir: String): DataFrame =
    cdcCollapse(graft.Tables.events(s, dir))

  /** The latest-wins collapse over a changelog frame with (user_id, ts,
    * event_id, event_type) — shared by q117 (batch apply) and q174 (the
    * same log round-tripped through the epoch-committing streaming sink).
    */
  def cdcCollapse(log: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    val wAll = Window.partitionBy("user_id")
    log
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"))
      .withColumn("rk", row_number().over(wOrd))
      .withColumn("n_changes", count(lit(1)).over(wAll))
      .filter(col("rk") === 1 && col("op") === "U")
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_type").as("last_type"), col("n_changes"))
      .orderBy("user_id")
  }

  val q117Sql: String =
    """WITH log AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
      |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      |  FROM events),
      |ranked AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n_changes
      |  FROM log)
      |SELECT user_id, ts AS last_ts, event_type AS last_type,
      |  CAST(n_changes AS BIGINT) AS n_changes
      |FROM ranked
      |WHERE rk = 1 AND op = 'U'
      |ORDER BY user_id""".stripMargin

  // ---- q130/q131 shared: two deterministic table snapshots ----------------
  // v0 ("yesterday") and v1 ("today") derive from `documents` by fixed
  // arithmetic rules, giving all four change classes: docs with
  // doc_id % 11 = 3 are new in v1 (inserts), doc_id % 13 = 5 are gone
  // from v1 (deletes), doc_id % 4 = 1 re-crawled with n_chars + 7
  // (updates), the rest unchanged. Keys keep their (lang, source)
  // dimension across versions — only the measure changes on update.
  private def snapV0(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") % 11 =!= 3)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  private def snapV1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") % 13 =!= 5)
      .select(col("doc_id"), col("lang"), col("source"),
        when(col("doc_id") % 4 === 1, col("n_chars") + 7)
          .otherwise(col("n_chars")).as("n_chars"))

  private val snapV0Sql =
    """SELECT doc_id, lang, source, n_chars
      |FROM documents WHERE doc_id % 11 <> 3""".stripMargin
  private val snapV1Sql =
    """SELECT doc_id, lang, source,
      |  CASE WHEN doc_id % 4 = 1 THEN n_chars + 7 ELSE n_chars END AS n_chars
      |FROM documents WHERE doc_id % 13 <> 5""".stripMargin

  // ---- q130: snapshot diff (changelog derivation) -------------------------
  // The INVERSE of q117: q117 applies a changelog to get state, q130
  // derives the changelog FROM two table snapshots — what table formats
  // compute between versions for incremental consumers, and what any
  // 100 TB pipeline needs to re-process only what moved. One
  // shuffle-on-key full-outer join; rows classify by presence and by a
  // row-content md5 FINGERPRINT compare (never column-by-column — the
  // fingerprint is one narrow expression per side and generalizes to any
  // column set); unchanged rows are dropped so the output is only the
  // delta. At 100 TB both snapshots bucket on the key and the diff is
  // shuffle-free.
  def q130SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    // \u0001-separated so shifted column boundaries can't collide
    // ("ab"+"c" vs "a"+"bc"); compared only WITHIN an engine, so any
    // narrow row-hash works - matches the oracle's chr(1) separator
    def fp(c: String) = md5(concat_ws("\u0001",
      col(s"$c.lang"), col(s"$c.source"), col(s"$c.n_chars")).cast("binary"))
    // the changelog carries the full current-side row (dimensions
    // included, newest side preferred), so downstream consumers — q131's
    // view fold above all — never rejoin the base table
    snapV0(s, dir).as("a").join(snapV1(s, dir).as("b"),
        col("a.doc_id") === col("b.doc_id"), "full_outer")
      .select(
        coalesce(col("a.doc_id"), col("b.doc_id")).as("doc_id"),
        when(col("a.doc_id").isNull, "insert")
          .when(col("b.doc_id").isNull, "delete")
          .when(fp("a") =!= fp("b"), "update")
          .otherwise("unchanged").as("change"),
        coalesce(col("b.lang"), col("a.lang")).as("lang"),
        coalesce(col("b.source"), col("a.source")).as("source"),
        col("a.n_chars").as("n_chars_old"),
        col("b.n_chars").as("n_chars_new"))
      .filter(col("change") =!= "unchanged")
      .orderBy("doc_id")
  }

  val q130Sql: String =
    s"""WITH v0 AS ($snapV0Sql),
       |v1 AS ($snapV1Sql),
       |d AS (
       |  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       |    CASE WHEN a.doc_id IS NULL THEN 'insert'
       |         WHEN b.doc_id IS NULL THEN 'delete'
       |         WHEN md5(concat_ws(chr(1), a.lang, a.source, a.n_chars))
       |           <> md5(concat_ws(chr(1), b.lang, b.source, b.n_chars))
       |           THEN 'update'
       |         ELSE 'unchanged' END AS change,
       |    COALESCE(b.lang, a.lang) AS lang,
       |    COALESCE(b.source, a.source) AS source,
       |    a.n_chars AS n_chars_old, b.n_chars AS n_chars_new
       |  FROM v0 a FULL OUTER JOIN v1 b ON a.doc_id = b.doc_id)
       |SELECT * FROM d WHERE change <> 'unchanged'
       |ORDER BY doc_id""".stripMargin

  // ---- q131: incremental materialized-view maintenance --------------------
  // The delta-application shape every warehouse needs at 100 TB: a
  // standing per-(lang, source) aggregate view over v0 is advanced to v1
  // by folding in ONLY the q130 changelog — the v1 table itself is never
  // re-aggregated. Each change contributes a signed delta (insert:
  // +1 doc / +n_new chars; delete: −1 / −n_old; update: 0 / n_new−n_old);
  // deltas partial-aggregate to one row per touched key, a full-outer
  // join folds them into the view, and keys whose count reaches zero drop
  // out. Cost ∝ |changelog| + |view|, independent of |v1| — the whole
  // point of incremental view maintenance.
  //
  // The ORACLE is the definition itself: DuckDB aggregates v1 DIRECTLY.
  // Incremental result ≡ full recompute, proven by hash — the
  // correctness statement of IVM, checked end-to-end.
  def q131IncrementalView(s: SparkSession, dir: String): DataFrame = {
    val view0 = snapV0(s, dir)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    // the changelog is self-contained (q130 carries the dimensions), so
    // the fold never touches the base table — only |changelog| + |view|
    val delta = q130SnapshotDiff(s, dir)
      .select(col("lang"), col("source"),
        when(col("change") === "insert", lit(1L))
          .when(col("change") === "delete", lit(-1L))
          .otherwise(lit(0L)).as("dn"),
        (coalesce(col("n_chars_new"), lit(0L))
          - coalesce(col("n_chars_old"), lit(0L))).as("dchars"))
      .groupBy("lang", "source")
      .agg(sum(col("dn")).as("dn"), sum(col("dchars")).as("dchars"))
    view0.as("v").join(delta.as("d"),
        col("v.lang") === col("d.lang") && col("v.source") === col("d.source"),
        "full_outer")
      .select(
        coalesce(col("v.lang"), col("d.lang")).as("lang"),
        coalesce(col("v.source"), col("d.source")).as("source"),
        (coalesce(col("n_docs"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_docs"),
        (coalesce(col("sum_chars"), lit(0L)) + coalesce(col("dchars"), lit(0L))).as("sum_chars"))
      .filter(col("n_docs") > 0)
      .orderBy("lang", "source")
  }

  /** Full recompute over v1 — the IVM correctness statement as the oracle. */
  val q131Sql: String =
    s"""WITH v1 AS ($snapV1Sql)
       |SELECT lang, source, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM v1
       |GROUP BY lang, source
       |ORDER BY lang, source""".stripMargin

  // ---- q133: snapshot stats-drift monitor ---------------------------------
  // The data-quality gate a pipeline runs BEFORE promoting a new table
  // version (the Deequ/expectations shape): per-column statistics of the
  // incoming snapshot compared against the standing one, flagging row
  // count, NDV, null-count, and min/max movement. Catching a collapsed
  // column (ndv→1), a null flood, or a range excursion here costs two
  // stats passes; catching it after promotion costs a re-train. One
  // aggregation pass per snapshot (the q111 ANALYZE shape — at 100 TB the
  // NDV column swaps to the q126 HLL sketch), one tiny join on column
  // name. Integer/string/boolean output only — engine-exact.
  private val driftCols = Seq("doc_id", "lang", "source", "n_chars")

  private def statsOf(df: DataFrame): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      driftCols.flatMap { c =>
        Seq(countDistinct(col(c)).as(s"ndv_$c"),
          (count(lit(1)) - count(col(c))).as(s"nulls_$c"),
          min(col(c)).cast("string").as(s"min_$c"),
          max(col(c)).cast("string").as(s"max_$c"))
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), explode(array(driftCols.map { c =>
        struct(lit(c).as("col"), col(s"ndv_$c").as("ndv"),
          col(s"nulls_$c").as("n_nulls"),
          col(s"min_$c").as("min_val"), col(s"max_$c").as("max_val"))
      }: _*)).as("st"))
      .select(col("st.col").as("col"), col("n_rows"), col("st.ndv").as("ndv"),
        col("st.n_nulls").as("n_nulls"),
        col("st.min_val").as("min_val"), col("st.max_val").as("max_val"))
  }

  def q133StatsDrift(s: SparkSession, dir: String): DataFrame = {
    val a = statsOf(snapV0(s, dir)).as("a")
    val b = statsOf(snapV1(s, dir)).as("b")
    a.join(b, col("a.col") === col("b.col"))
      .select(col("a.col").as("col"),
        col("a.n_rows").as("n_rows_v0"), col("b.n_rows").as("n_rows_v1"),
        col("a.ndv").as("ndv_v0"), col("b.ndv").as("ndv_v1"),
        col("a.n_nulls").as("n_nulls_v0"), col("b.n_nulls").as("n_nulls_v1"),
        (col("a.min_val") =!= col("b.min_val")).as("min_changed"),
        (col("a.max_val") =!= col("b.max_val")).as("max_changed"))
      .withColumn("drift",
        col("n_rows_v0") =!= col("n_rows_v1") || col("ndv_v0") =!= col("ndv_v1")
          || col("n_nulls_v0") =!= col("n_nulls_v1")
          || col("min_changed") || col("max_changed"))
      .orderBy("col")
  }

  val q133Sql: String = {
    def side(snap: String, alias: String): String =
      driftCols.map { c =>
        s"""SELECT '$c' AS col, COUNT(*) AS n_rows, COUNT(DISTINCT $c) AS ndv,
           |  COUNT(*) - COUNT($c) AS n_nulls,
           |  CAST(MIN($c) AS VARCHAR) AS min_val, CAST(MAX($c) AS VARCHAR) AS max_val
           |FROM $snap""".stripMargin
      }.mkString(s"$alias AS (\n", "\nUNION ALL\n", ")")
    s"""WITH v0 AS ($snapV0Sql),
       |v1 AS ($snapV1Sql),
       |${side("v0", "sa")},
       |${side("v1", "sb")}
       |SELECT sa.col AS col,
       |  sa.n_rows AS n_rows_v0, sb.n_rows AS n_rows_v1,
       |  sa.ndv AS ndv_v0, sb.ndv AS ndv_v1,
       |  sa.n_nulls AS n_nulls_v0, sb.n_nulls AS n_nulls_v1,
       |  sa.min_val <> sb.min_val AS min_changed,
       |  sa.max_val <> sb.max_val AS max_changed,
       |  (sa.n_rows <> sb.n_rows OR sa.ndv <> sb.ndv
       |    OR sa.n_nulls <> sb.n_nulls
       |    OR sa.min_val <> sb.min_val OR sa.max_val <> sb.max_val) AS drift
       |FROM sa JOIN sb ON sa.col = sb.col
       |ORDER BY col""".stripMargin
  }

  // ---- q159: Merkle range-digest tree diff (anti-entropy table sync) ------
  // The primitive that lets two 100 TB replicas agree on WHICH key ranges
  // differ while exchanging only kilobytes of digests: doc_id space is
  // range-bucketed into 256 leaves (width = (max_id div 256)+1, a scalar
  // derived identically by both engines), each leaf's digest is the md5 of
  // its rows' fingerprints in key order, and parents hash their two
  // children up to a single root — 511 digests per replica. Sync walks the
  // trees root-down and descends ONLY into differing subtrees, so the
  // transcript is O(changed leaves × depth), not O(rows); the emitted
  // leaf rows carry the exact [lo_doc, hi_doc] ranges to re-transfer —
  // the Dynamo/Cassandra anti-entropy shape over Spark relations. The
  // compared replica (snapV2) differs sparsely (~1% of docs re-crawled
  // with n_chars+1, a handful deleted), so differing nodes are a thin
  // root-to-leaf spine, not the whole tree (spec-pinned: the differing
  // set is ancestor-closed and leaf count is bounded by changed docs;
  // self-diff is empty). Empty leaves digest to a sentinel so the spine
  // is total on both sides. Scale shape: one shuffle per tree level with
  // level n+1 built from level n's 2× smaller relation; row fingerprints
  // partial-aggregate per leaf, and the 8 upper levels are kilobyte
  // relations.
  private[graft] val merkleLeaves = 256
  private[graft] val merkleDepth = 8 // log2(merkleLeaves)

  /** The divergent replica: doc_id % 499 = 7 lost, % 97 = 13 re-crawled. */
  private[graft] def snapV2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") % 499 =!= 7)
      .select(col("doc_id"), col("lang"), col("source"),
        when(col("doc_id") % 97 === 13, col("n_chars") + 1)
          .otherwise(col("n_chars")).as("n_chars"))

  private val snapV2Sql =
    """SELECT doc_id, lang, source,
      |  CASE WHEN doc_id % 97 = 13 THEN n_chars + 1 ELSE n_chars END AS n_chars
      |FROM documents WHERE doc_id % 499 <> 7""".stripMargin

  /** Leaf width so every doc_id lands in [0, merkleLeaves). */
  private[graft] def merkleWidth(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .agg(expr(s"max(doc_id) div $merkleLeaves + 1").as("w"))

  /** All 511 (level, idx, digest) nodes of one replica's Merkle tree;
    * level `merkleDepth` = leaves, level 0 = root.
    */
  private[graft] def merkleNodes(
      s: SparkSession, snap: DataFrame, widthDf: DataFrame): DataFrame = {
    val observed = snap.crossJoin(broadcast(widthDf))
      .select(expr("doc_id div w").as("idx"), col("doc_id"),
        md5(concat_ws("\u0001", col("doc_id"), col("lang"), col("source"),
          col("n_chars")).cast("binary")).as("rd"))
      .groupBy("idx")
      .agg(md5(expr(
        "array_join(transform(sort_array(collect_list(struct(doc_id, rd))), x -> x.rd), ',')")
        .cast("binary")).as("digest"))
    var lvl = s.range(merkleLeaves).select(col("id").as("idx"))
      .join(observed, Seq("idx"), "left")
      .select(col("idx"), coalesce(col("digest"), lit("empty")).as("digest"))
    var acc = lvl.withColumn("level", lit(merkleDepth))
    for (l <- (merkleDepth - 1) to 0 by -1) {
      lvl = lvl.groupBy(expr("idx div 2").as("idx"))
        .agg(md5(expr(
          "array_join(transform(sort_array(collect_list(struct(idx, digest))), x -> x.digest), ',')")
          .cast("binary")).as("digest"))
      acc = acc.unionByName(lvl.withColumn("level", lit(l)))
    }
    acc
  }

  def q159MerkleSync(s: SparkSession, dir: String): DataFrame = {
    val widthDf = merkleWidth(s, dir)
    val v1 = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val a = merkleNodes(s, v1, widthDf).as("a")
    val b = merkleNodes(s, snapV2(s, dir), widthDf).as("b")
    a.join(b, col("a.level") === col("b.level") && col("a.idx") === col("b.idx"))
      .filter(col("a.digest") =!= col("b.digest"))
      .select(col("a.level").as("level"), col("a.idx").as("idx"),
        col("a.digest").as("v1_digest"), col("b.digest").as("v2_digest"))
      .crossJoin(broadcast(widthDf))
      .select(col("level"), col("idx"),
        expr(s"idx * shiftleft(w, $merkleDepth - level)").as("lo_doc"),
        expr(s"(idx + 1) * shiftleft(w, $merkleDepth - level) - 1").as("hi_doc"),
        col("v1_digest"), col("v2_digest"))
      .orderBy("level", "idx")
  }

  val q159Sql: String = {
    def tree(src: String, tag: String): String = {
      val leaves =
        s"""r$tag AS (
           |  SELECT doc_id // (SELECT w FROM wq) AS idx, doc_id,
           |    md5(concat_ws(chr(1), doc_id, lang, source, n_chars)) AS rd
           |  FROM $src),
           |o$tag AS (
           |  SELECT idx, md5(string_agg(rd, ',' ORDER BY doc_id)) AS digest
           |  FROM r$tag GROUP BY idx),
           |s${tag}_$merkleDepth AS (
           |  SELECT b.bucket AS idx, COALESCE(o$tag.digest, 'empty') AS digest
           |  FROM (SELECT range AS bucket FROM range($merkleLeaves)) b
           |  LEFT JOIN o$tag ON o$tag.idx = b.bucket)""".stripMargin
      val ups = ((merkleDepth - 1) to 0 by -1).map { l =>
        s"""s${tag}_$l AS (
           |  SELECT idx // 2 AS idx, md5(string_agg(digest, ',' ORDER BY idx)) AS digest
           |  FROM s${tag}_${l + 1} GROUP BY 1)""".stripMargin
      }
      val union = (merkleDepth to 0 by -1)
        .map(l => s"SELECT $l AS level, idx, digest FROM s${tag}_$l")
        .mkString(s"n$tag AS (\n", "\nUNION ALL\n", ")")
      (leaves +: ups :+ union).mkString(",\n")
    }
    s"""WITH wq AS (SELECT (max(doc_id) // $merkleLeaves) + 1 AS w FROM documents),
       |v1 AS (SELECT doc_id, lang, source, n_chars FROM documents),
       |v2 AS ($snapV2Sql),
       |${tree("v1", "a")},
       |${tree("v2", "b")}
       |SELECT na.level, na.idx,
       |  na.idx * ((SELECT w FROM wq) << ($merkleDepth - na.level)) AS lo_doc,
       |  (na.idx + 1) * ((SELECT w FROM wq) << ($merkleDepth - na.level)) - 1 AS hi_doc,
       |  na.digest AS v1_digest, nb.digest AS v2_digest
       |FROM na JOIN nb ON na.level = nb.level AND na.idx = nb.idx
       |WHERE na.digest <> nb.digest
       |ORDER BY 1, 2""".stripMargin
  }

  // ---- q169: constraint audit suite (FK / uniqueness / not-null) ----------
  // The declarative data-quality gate (the dbt-tests / Deequ shape)
  // complementing q133's statistical drift: hard relational CONSTRAINTS
  // checked as one suite — every foreign key across the star schema
  // (orphan counts via anti-joins; dimension sides broadcast), key
  // uniqueness (duplicated-key counts), and key not-null counts. The
  // clean checks must PASS; to keep the violation path honest rather
  // than vacuously green, the suite also audits a simulated partial-loss
  // scenario (orders with o_orderkey % 50 = 3 dropped, as after a failed
  // backfill) whose lineitem FK check must FAIL with exactly the planted
  // orphan count. One row per check: (check_name, violations, pass).
  // The suite also SURFACES a real property of this corpus: the
  // synthetic lineitem does not follow TPC-H (orderkey, linenumber)
  // uniqueness — that check reports the duplicated-pair count and fails,
  // which is precisely the audit doing its job (spec-pinned to the
  // exact count).
  // Scale shape: each FK check is one anti-join that broadcasts its
  // dimension side or co-locates on the bucketed key; uniqueness is a
  // partial-agged groupBy-HAVING; the suite unions kilobyte results.
  def q169ConstraintAudit(s: SparkSession, dir: String): DataFrame = {
    def row(name: String, violations: DataFrame): DataFrame =
      violations.agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check_name"), col("violations"),
          (col("violations") === 0).as("pass"))
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    def orphans(fact: DataFrame, fk: String, dim: DataFrame, pk: String) =
      fact.select(col(fk)).join(broadcast(dim.select(col(pk))),
        col(fk) === col(pk), "left_anti")
    def dupKeys(df: DataFrame, keys: Seq[String]) =
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
    val checks = Seq(
      row("fk_lineitem_orders",
        orphans(li, "l_orderkey", ord, "o_orderkey")),
      row("fk_lineitem_part",
        orphans(li, "l_partkey", t(s, dir, "part"), "p_partkey")),
      row("fk_lineitem_supplier",
        orphans(li, "l_suppkey", t(s, dir, "supplier"), "s_suppkey")),
      row("fk_orders_customer",
        orphans(ord, "o_custkey", cust, "c_custkey")),
      row("fk_customer_nation",
        orphans(cust, "c_nationkey", t(s, dir, "nation"), "n_nationkey")),
      row("fk_nation_region",
        orphans(t(s, dir, "nation"), "n_regionkey",
          t(s, dir, "region"), "r_regionkey")),
      row("unique_orders_pk", dupKeys(ord, Seq("o_orderkey"))),
      row("unique_lineitem_pk", dupKeys(li, Seq("l_orderkey", "l_linenumber"))),
      row("unique_customer_pk", dupKeys(cust, Seq("c_custkey"))),
      row("notnull_lineitem_keys",
        li.filter(col("l_orderkey").isNull || col("l_partkey").isNull
          || col("l_suppkey").isNull)),
      row("notnull_orders_keys",
        ord.filter(col("o_orderkey").isNull || col("o_custkey").isNull)),
      // planted scenario: a partial order loss MUST surface as FK orphans
      row("fk_lineitem_orders_after_partial_loss",
        orphans(li, "l_orderkey",
          ord.filter(col("o_orderkey") % 50 =!= 3), "o_orderkey")))
    checks.reduce(_ unionByName _).orderBy("check_name")
  }

  val q169Sql: String =
    """WITH t AS (
      |  SELECT 'fk_lineitem_orders' AS check_name, CAST(COUNT(*) AS BIGINT) AS violations
      |  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      |  UNION ALL
      |  SELECT 'fk_lineitem_part', COUNT(*)
      |  FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
      |  UNION ALL
      |  SELECT 'fk_lineitem_supplier', COUNT(*)
      |  FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
      |  UNION ALL
      |  SELECT 'fk_orders_customer', COUNT(*)
      |  FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
      |  UNION ALL
      |  SELECT 'fk_customer_nation', COUNT(*)
      |  FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
      |  UNION ALL
      |  SELECT 'fk_nation_region', COUNT(*)
      |  FROM nation WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region)
      |  UNION ALL
      |  SELECT 'unique_orders_pk', COUNT(*) FROM (
      |    SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1)
      |  UNION ALL
      |  SELECT 'unique_lineitem_pk', COUNT(*) FROM (
      |    SELECT l_orderkey, l_linenumber FROM lineitem
      |    GROUP BY 1, 2 HAVING COUNT(*) > 1)
      |  UNION ALL
      |  SELECT 'unique_customer_pk', COUNT(*) FROM (
      |    SELECT c_custkey FROM customer GROUP BY 1 HAVING COUNT(*) > 1)
      |  UNION ALL
      |  SELECT 'notnull_lineitem_keys', COUNT(*) FROM lineitem
      |  WHERE l_orderkey IS NULL OR l_partkey IS NULL OR l_suppkey IS NULL
      |  UNION ALL
      |  SELECT 'notnull_orders_keys', COUNT(*) FROM orders
      |  WHERE o_orderkey IS NULL OR o_custkey IS NULL
      |  UNION ALL
      |  SELECT 'fk_lineitem_orders_after_partial_loss', COUNT(*)
      |  FROM lineitem WHERE l_orderkey NOT IN (
      |    SELECT o_orderkey FROM orders WHERE o_orderkey % 50 <> 3))
      |SELECT check_name, violations, violations = 0 AS pass
      |FROM t
      |ORDER BY check_name""".stripMargin

  // ---- q171: observed job metrics (one pass, no audit re-scan) ------------
  // The `Dataset.observe` surface: a curation job (drop returned lines)
  // carries its own audit metrics — rows scanned, rows dropped, money
  // scanned — collected by a CollectMetrics node DURING the job's single
  // pass. At 100 TB this is the difference between "the pipeline reports
  // its input profile for free" and "a second full scan to audit what
  // the first one did". The job's kept-count and the observed metrics
  // are emitted as one row; the oracle recomputes all four numbers from
  // the source, and n_kept + n_returned = n_scanned is internally
  // cross-checked loudly. Plan-locked: the metrics ride the SAME scan
  // (exactly one lineitem scan in the executed plan).
  def q171ObservedMetrics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val obs = org.apache.spark.sql.Observation(
      s"q171_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    val job = t(s, dir, "lineitem")
      .observe(obs,
        count(lit(1)).as("n_scanned"),
        count(when(col("l_returnflag") === "R", 1)).as("n_returned"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("sum_cents"))
      .filter(col("l_returnflag") =!= "R")
    q171LastPlan = { val p = job.queryExecution.executedPlan.toString; p }
    val kept = job.count() // the one action: job + metrics in a single pass
    val m = obs.get
    val (scanned, returned, cents) = (m("n_scanned").asInstanceOf[Long],
      m("n_returned").asInstanceOf[Long], m("sum_cents").asInstanceOf[Long])
    require(kept + returned == scanned,
      s"q171: observed metrics inconsistent ($kept + $returned != $scanned)")
    Seq((scanned, kept, returned, cents))
      .toDF("n_scanned", "n_kept", "n_returned", "sum_cents")
  }

  /** Executed plan of the last q171 job, for the single-scan lock. */
  @volatile private[graft] var q171LastPlan: String = ""

  val q171Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_scanned,
      |  CAST(COUNT(*) FILTER (WHERE l_returnflag <> 'R') AS BIGINT) AS n_kept,
      |  CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS n_returned,
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM lineitem""".stripMargin

  // -------------------------------------------------------------------------
  // ---- q191: SQL-defined routines — the full declarative UDF surface ------
  // Everything q-numbered so far extends the engine from SCALA (Catalyst
  // expressions, Aggregators, V2 plugins); this is the surface a
  // SQL-ONLY user extends it from, new in Spark 4: SQL scalar UDFs
  // (CREATE FUNCTION ... RETURNS ... RETURN expr), SQL TABLE UDFs
  // (RETURNS TABLE ... RETURN query — a parameterized view), session
  // VARIABLEs (DECLARE / SET VAR), EXECUTE IMMEDIATE with a USING bind
  // from a variable, and listagg WITHIN GROUP. All five compose in one
  // statement chain: the table UDF calls the scalar UDF per row, the
  // outer aggregate binds the UDF's argument through EXECUTE IMMEDIATE
  // from a session variable, and listagg proves deterministic ordered
  // string aggregation. These are pure analysis-time expansions — the
  // optimized plan is identical to writing the query inline (the scalar
  // UDF inlines into codegen; the table UDF is a named subquery), so the
  // 100 TB plan shape is exactly q1's partial-final aggregate.
  def q191SqlUdfSurface(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_q191")
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION q191_band(p DOUBLE)
            |RETURNS STRING
            |RETURN CASE WHEN p < 100000 THEN 'low'
            |            WHEN p < 300000 THEN 'mid' ELSE 'high' END""".stripMargin)
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION q191_orders(st STRING)
            |RETURNS TABLE (okey BIGINT, band STRING, cents BIGINT)
            |RETURN SELECT o_orderkey, q191_band(o_totalprice),
            |  CAST(floor(o_totalprice * 100) AS BIGINT)
            |FROM orders_q191 WHERE o_orderstatus = st""".stripMargin)
    s.sql("DECLARE OR REPLACE VARIABLE q191_status STRING DEFAULT 'O'")
    s.sql("SET VAR q191_status = 'F'")
    s.sql("""EXECUTE IMMEDIATE
            |'SELECT band, COUNT(*) AS n, SUM(cents) AS sum_cents,
            |   substr(listagg(CAST(okey AS STRING), '','') WITHIN GROUP (ORDER BY okey), 1, 40) AS first_keys
            | FROM q191_orders(?) GROUP BY band ORDER BY band'
            |USING q191_status""".stripMargin)
  }

  val q191Sql: String =
    """SELECT band, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  substr(string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey), 1, 40) AS first_keys
      |FROM (
      |  SELECT o_orderkey,
      |    CASE WHEN o_totalprice < 100000 THEN 'low'
      |         WHEN o_totalprice < 300000 THEN 'mid' ELSE 'high' END AS band,
      |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderstatus = 'F') x
      |GROUP BY band
      |ORDER BY band""".stripMargin

  // ---- q198: SQL scripting — procedural control flow in the engine --------
  // Spark 4.1's SQL scripting (BEGIN...END compound statements, DECLARE
  // locals, WHILE/IF, SET) — the declarative twin of a driver-side Scala
  // loop: the whole iterative program ships as ONE statement and each
  // contained query is still a full Catalyst plan. The script below walks
  // the 12 calendar months, accumulating order cents into a local for ODD
  // months only (exercising IF) and counting loop iterations; DuckDB
  // predicts both closed-form, so the oracle proves the loop executed
  // exactly 12 times with the branch taken on the right months. Scale
  // note: each iteration is an independent aggregate over a month — the
  // scripting layer adds driver-side control only, never a collect of
  // data rows. (The conf flag is session-wide but scoped-set here; it
  // only gates parsing of compound statements.)
  def q198SqlScripting(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_q198")
    s.sql("SET spark.sql.scripting.enabled=true")
    s.sql("""BEGIN
            |  DECLARE m INT DEFAULT 1;
            |  DECLARE iters INT DEFAULT 0;
            |  DECLARE odd_cents BIGINT DEFAULT 0;
            |  WHILE m <= 12 DO
            |    IF m % 2 = 1 THEN
            |      SET odd_cents = odd_cents + (
            |        SELECT COALESCE(CAST(SUM(floor(o_totalprice * 100)) AS BIGINT), 0)
            |        FROM orders_q198 WHERE month(o_orderdate) = m);
            |    END IF;
            |    SET iters = iters + 1;
            |    SET m = m + 1;
            |  END WHILE;
            |  SELECT iters, odd_cents;
            |END""".stripMargin)
  }

  val q198Sql: String =
    """SELECT 12 AS iters,
      |  CAST(SUM(FLOOR(o_totalprice * 100)) AS BIGINT) AS odd_cents
      |FROM orders
      |WHERE month(o_orderdate) % 2 = 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q89_merge_upsert" -> q89MergeUpsert _,
    "q90_scd2_intervals" -> q90Scd2Intervals _,
    "q117_cdc_apply" -> q117CdcApply _,
    "q130_snapshot_diff" -> q130SnapshotDiff _,
    "q131_incremental_view" -> q131IncrementalView _,
    "q133_stats_drift" -> q133StatsDrift _,
    "q159_merkle_sync" -> q159MerkleSync _,
    "q169_constraint_audit" -> q169ConstraintAudit _,
    "q171_observed_metrics" -> q171ObservedMetrics _,
    "q191_sql_udf_surface" -> q191SqlUdfSurface _,
    "q198_sql_scripting" -> q198SqlScripting _,
  )

  val oracle: Map[String, String] = Map(
    "q89_merge_upsert" -> q89Sql,
    "q90_scd2_intervals" -> q90Sql,
    "q117_cdc_apply" -> q117Sql,
    "q130_snapshot_diff" -> q130Sql,
    "q131_incremental_view" -> q131Sql,
    "q133_stats_drift" -> q133Sql,
    "q159_merkle_sync" -> q159Sql,
    "q169_constraint_audit" -> q169Sql,
    "q171_observed_metrics" -> q171Sql,
    "q191_sql_udf_surface" -> q191Sql,
    "q198_sql_scripting" -> q198Sql,
  )
}
