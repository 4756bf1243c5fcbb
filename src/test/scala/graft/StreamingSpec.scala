package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{EventStream, UserEvent}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("sessionizer state survives across micro-batches") {
    // two parquet files + maxFilesPerTrigger=1 → two micro-batches; events
    // of the same user span both, so open sessions must carry over.
    val staged = Files.createTempDirectory("graft_stream_2batch_")
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(CAST(ts AS TIMESTAMP))").as("ts_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    // split by time so batch 2 continues batch 1's open sessions
    val cut = ev.agg(expr("percentile(ts_us, 0.5)")).first().getDouble(0).toLong
    ev.filter(col("ts_us") <= cut).coalesce(1).write.parquet(s"$staged/b1")
    ev.filter(col("ts_us") > cut).coalesce(1).write.parquet(s"$staged/b2")
    // flatten into one dir (file source lists recursively only with glob)
    val flat = Files.createTempDirectory("graft_stream_flat_")
    java.nio.file.Files.list(java.nio.file.Paths.get(s"$staged/b1")).forEach { p =>
      if (p.toString.endsWith(".parquet"))
        Files.copy(p, flat.resolve("a_" + p.getFileName.toString))
    }
    java.nio.file.Files.list(java.nio.file.Paths.get(s"$staged/b2")).forEach { p =>
      if (p.toString.endsWith(".parquet"))
        Files.copy(p, flat.resolve("b_" + p.getFileName.toString))
    }
    // the file source orders micro-batches by modification time — make the
    // ordering deterministic (b1 strictly before b2)
    var t = java.nio.file.attribute.FileTime.fromMillis(1700000000000L)
    java.nio.file.Files.list(flat).sorted().forEach { p =>
      Files.setLastModifiedTime(p, t)
      t = java.nio.file.attribute.FileTime.fromMillis(t.toMillis + 60000)
    }

    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(flat.toString)
      .as[UserEvent]
    val name = "sessions_2batch"
    val q = EventStream.sessionize(stream, gapUs = 30L * 60 * 1000000)
      .toDF()
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table(name)
      .select("user_id", "start_us", "end_us", "n_events", "cents")

    // batch truth: all sessions minus each user's trailing open one
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us")
    val batchSessions = ev
      .withColumn("prev", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev").isNull || col("ts_us") - col("prev") > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(
        byUser.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        count(lit(1)).as("n_events"), sum("cents").as("cents"))
    val closed = batchSessions
      .withColumn("max_sid", max("sid").over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
      .filter(col("sid") < col("max_sid"))
      .select("user_id", "start_us", "end_us", "n_events", "cents")

    assert(streamed.exceptAll(closed).isEmpty && closed.exceptAll(streamed).isEmpty,
      s"streamed=${streamed.count()} batch-closed=${closed.count()}")
    assert(streamed.count() > 0)
  }

  test("native session_window agrees with the custom-state sessionizer") {
    // Align the two surfaces' documented semantic differences:
    //  * q72 emits every session (complete mode); q64 withholds each
    //    user's trailing open session → drop each user's last q72 row;
    //  * q72's window end = last event + gap → subtract the 30-min gap.
    // Boundary events (diff exactly = gap) would legitimately split in
    // q72 and merge in q64; the testdata has none (asserted by equality).
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val native = EventStream.q72StreamSessionWindow(spark, sf)
      .withColumn("max_start", max("session_start").over(w))
      .filter(col("session_start") < col("max_start"))
      .select(col("user_id"), col("session_start"),
        (col("session_end") - expr("INTERVAL 30 MINUTE")).as("session_end"),
        col("n_events"), col("total_value"))
    val custom = EventStream.q64StreamSessions(spark, sf)
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
    assert(native.exceptAll(custom).isEmpty && custom.exceptAll(native).isEmpty,
      s"native=${native.count()} custom=${custom.count()}")
    assert(custom.count() > 0)
  }

  test("CDC fold survives a checkpointed restart exactly-once") {
    // the fault-tolerance contract behind q119's id-derived fold: a file
    // source with a CHECKPOINT processes two files (batches 0,1), the
    // query terminates, two more files arrive, and a RESTARTED query on
    // the same checkpoint must (a) not reprocess the first two files —
    // its batch ids continue at 2,3 and only versions v2/v3 appear — and
    // (b) fold onward from the durable v1 state, landing on exactly the
    // batch aggregate of all four files. Loss would under-count,
    // reprocessing would double-count; equality proves exactly-once.
    val src = Files.createTempDirectory("graft_ckpt_src_")
    val ckpt = Files.createTempDirectory("graft_ckpt_meta_")
    val stateRoot = Files.createTempDirectory("graft_ckpt_state_")
    val ev = Tables.events(spark, sf)
    val parts = ev.withColumn("g", expr("pmod(hash(user_id), 4)"))
    def writeFile(g: Int, name: String, tMillis: Long): Unit = {
      val tmp = Files.createTempDirectory("graft_ckpt_tmp_")
      parts.filter(col("g") === g).drop("g")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      java.nio.file.Files.list(tmp).forEach { p =>
        if (p.toString.endsWith(".parquet")) {
          val dst = src.resolve(name)
          Files.copy(p, dst)
          Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(tMillis))
        }
      }
    }
    def runDrain(): Unit = {
      val feed = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(src.toString)
      val fold: (org.apache.spark.sql.DataFrame, Long) => Unit = { (batch, id) =>
        val latest = batch.groupBy("user_id").agg(
          max(struct(col("ts"), col("event_id"), col("event_type"))).as("last"),
          count(lit(1)).as("n_changes"))
        val merged =
          if (id <= 0) latest
          else spark.read.parquet(s"$stateRoot/v${id - 1}").unionByName(latest)
            .groupBy("user_id")
            .agg(max(col("last")).as("last"), sum(col("n_changes")).as("n_changes"))
        merged.write.mode("overwrite").parquet(s"$stateRoot/v$id")
      }
      val q = feed.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    writeFile(0, "f0.parquet", 1700000000000L)
    writeFile(1, "f1.parquet", 1700000060000L)
    runDrain() // batches 0, 1
    assert(Files.exists(stateRoot.resolve("v1")), "first run must reach v1")
    assert(!Files.exists(stateRoot.resolve("v2")), "first run must stop at v1")
    writeFile(2, "f2.parquet", 1700000120000L)
    writeFile(3, "f3.parquet", 1700000180000L)
    runDrain() // restart: only the new files, batches 2, 3
    assert(Files.exists(stateRoot.resolve("v3")), "restart must continue at v2/v3")
    val fin = spark.read.parquet(s"$stateRoot/v3")
    val truth = ev.groupBy("user_id").agg(
      max(struct(col("ts"), col("event_id"), col("event_type"))).as("last"),
      count(lit(1)).as("n_changes"))
    assert(fin.exceptAll(truth).isEmpty && truth.exceptAll(fin).isEmpty,
      s"restart fold=${fin.count()} batch truth=${truth.count()}")
    assert(fin.count() > 0)
  }

  test("q138: event-time timers fire on <= watermark, across batches and at close") {
    // Pins the THREE engine behaviors q138's oracle depends on, with
    // hand-built boundary data the real table cannot guarantee:
    //  1. a timer registered in batch 1 fires during a LATER batch once the
    //     watermark passes it (cross-batch expiry);
    //  2. under AvailableNow a final no-data batch runs and fires timers
    //     against the terminal watermark;
    //  3. the expiry comparison is `expiry <= watermark` — a timer at
    //     EXACTLY the final watermark fires, one 1 ms past it does not.
    // If a Spark upgrade changes any of these, this fails loudly and the
    // q138 oracle predicate must be revisited.
    val t0 = 1600000000000L
    val G = 1800000L // the processor's 30-min gap
    val H = 3600000L
    val wmF = t0 + 4 * H + 60000L // final watermark = global max event ms
    val b1 = Seq((1L, t0, 10L), (1L, t0 + 60000L, 10L), (9L, t0 + 3 * H, 5L))
    val b2 = Seq((1L, t0 + 4 * H, 10L), (9L, wmF, 5L),
      (250L, wmF - G, 7L), // timer at exactly the final watermark → fires
      (300L, wmF - G + 1L, 7L)) // timer 1 ms past it → must NOT fire
    val dir = Files.createTempDirectory("graft_timer_batches_")
    Seq(b1 -> "a", b2 -> "b").zipWithIndex.foreach { case ((rows, tag), i) =>
      val tmp = Files.createTempDirectory("graft_timer_tmp_")
      rows.toDF("user_id", "ms", "cents")
        .select(col("user_id"), expr("timestamp_millis(ms)").as("ts"), col("cents"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      java.nio.file.Files.list(tmp).forEach { p =>
        if (p.toString.endsWith(".parquet")) {
          val dst = dir.resolve(s"${tag}.parquet")
          Files.copy(p, dst)
          Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
        }
      }
    }
    val feed = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, cents LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withWatermark("ts", "0 seconds")
      .as[graft.streaming.TimedEvent]
    EventStream.withRocksDBProvider(spark) {
      val q = feed.groupByKey(_.user_id)
        .transformWithState(new graft.streaming.SessionTimerProcessor(G),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append)
        .toDF()
        .writeStream.outputMode("append").format("memory").queryName("timer_pin")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val got = spark.table("timer_pin")
      .select("user_id", "start_ms", "end_ms", "n_events", "cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val expected = Set(
      (1L, t0, t0 + 60000L, 2L, 20L), // closed cross-batch (event or re-armed timer)
      (9L, t0 + 3 * H, t0 + 3 * H, 1L, 5L), // cross-batch timer/event close
      (250L, wmF - G, wmF - G, 1L, 7L)) // expiry == final watermark → fired
    assert(got == expected,
      s"timer semantics drifted: got $got, expected $expected")
  }

  test("q142: MapState/ListState survive a checkpointed transformWithState restart") {
    // the durability contract behind q142: a query processes two
    // time-range files against a checkpoint, TERMINATES, two more files
    // arrive, and the restarted query must fold onward from the RocksDB
    // state it left — per-type counts keep accumulating and the last-3
    // buffer carries over. Final per-user summaries (max-n emission
    // across both runs) must equal the single-run q142 output exactly;
    // state loss would reset counts, replay would double them.
    val src = Files.createTempDirectory("graft_tws_src_")
    val ckpt = Files.createTempDirectory("graft_tws_ckpt_")
    val emitDir = Files.createTempDirectory("graft_tws_emit_")
    val build = Files.createTempDirectory("graft_tws_build_")
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("timestamp_millis(unix_micros(CAST(ts AS TIMESTAMP)) div 1000)").as("ts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .repartitionByRange(4, col("ts"))
      .write.mode("overwrite").parquet(build.toString)
    val chunks = {
      val buf = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
      val listing = java.nio.file.Files.list(build)
      try listing.forEach(f =>
        if (f.getFileName.toString.startsWith("part-")) buf += f)
      finally listing.close()
      buf.sortBy(_.getFileName.toString).toSeq
    }
    assert(chunks.size == 4)
    def addChunk(i: Int): Unit = {
      val dst = src.resolve(s"chunk_$i.parquet")
      Files.copy(chunks(i), dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    def runDrain(): Unit = {
      val feed = spark.readStream
        .schema("event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP, cents LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.toString)
        .as[graft.streaming.TypedEvent]
      EventStream.withRocksDBProvider(spark) {
        val sink: (org.apache.spark.sql.DataFrame, Long) => Unit =
          (b, _) => b.write.mode("append").parquet(emitDir.toString)
        val q = feed.groupByKey(_.user_id)
          .transformWithState(new graft.streaming.TypedStateProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Append())
          .toDF()
          .writeStream
          .foreachBatch(sink)
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
    }
    addChunk(0); addChunk(1); runDrain()
    addChunk(2); addChunk(3); runDrain()
    val fin = spark.read.parquet(emitDir.toString)
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("type_counts"), col("recent_ids"))).as("f"))
      .select(col("user_id"), col("f.n_events").as("n_events"),
        col("f.type_counts").as("type_counts"), col("f.recent_ids").as("recent_ids"))
    val whole = streaming.EventStream.q142StatePrimitives(spark, sf)
    assert(fin.exceptAll(whole).isEmpty && whole.exceptAll(fin).isEmpty,
      s"restart fold=${fin.count()} single-run=${whole.count()}")
    assert(fin.count() > 0)
  }

  test("incremental CDC fold lands exactly on the batch changelog apply") {
    // q119 folds 4 out-of-time-order micro-batches into versioned state;
    // the fixpoint must equal q117's one-shot batch apply row-for-row —
    // the streaming/batch parity contract (their shared oracle proves it
    // cross-engine; this pins it in-engine at spec scale too)
    val streamed = EventStream.q119StreamCdcUpsert(spark, sf)
    val batch = ops.Warehouse.q117CdcApply(spark, sf)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      s"streamed=${streamed.count()} batch=${batch.count()}")
    assert(streamed.count() > 0)
  }

  test("q176: processing-time timers fire between ProcessingTime micro-batches " +
      "and the collapse matches the batch GROUP BY") {
    graft.streaming.PtFlushProcessor.fires.set(0L)
    val out = EventStream.q176PtTimerFlush(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max(col("ts").cast("timestamp")).cast("timestamp_ntz").as("last_ts"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .orderBy("user_id")
    assert(out.exceptAll(batch).isEmpty && batch.exceptAll(out).isEmpty,
      s"q176 collapse diverged from batch GROUP BY (out=${out.count()}, batch=${batch.count()})")
    // the timer path must have actually run: every key seen in batch k
    // re-arms an immediate timer, so fires >= keys alive before the last
    // micro-batch — zero means the ProcessingTime mode never swept timers
    val fires = graft.streaming.PtFlushProcessor.fires.get()
    assert(fires > 0L, "no processing-time timer fired across the 4-batch replay")
  }

  test("events loader yields identical wall-clock rows for ns-long and µs-timestamp files") {
    // Regression for the r11 red round: the driver regenerated
    // events.parquet with ts as TIMESTAMP(MICROS) where it used to be
    // TIMESTAMP(NANOS), and the hardcoded ns→µs division broke 29 queries
    // (batch: analysis error; streaming: every ts silently landed in Jan
    // 1970). Tables.events / EventStream.eventsStream now branch on the
    // footer dtype; this spec writes the same five events in BOTH units and
    // asserts both loaders read identical wall-clock rows from each.
    //
    // The ns fixture stores ts as a raw int64 of nanos: Spark cannot WRITE
    // TIMESTAMP(NANOS), and under nanosAsLong=true a genuine NANOS file
    // surfaces to the loader as exactly this LongType shape, so the raw
    // long exercises the same loader branch.
    val rows = Seq(
      (1L, "2024-03-01 10:15:30.123456", 7L, "click", 1.5, "{}"),
      (2L, "2024-03-01 10:45:00.000001", 7L, "view", 2.0, "{}"),
      (3L, "2024-03-01 11:05:59.999999", 8L, "click", 0.5, "{}"),
      (4L, "2024-03-02 00:00:00.000000", 9L, "purchase", 9.9, "{}"),
      (5L, "2024-03-02 23:59:59.500000", 9L, "view", 3.3, "{}"))
      .toDF("event_id", "ts_str", "user_id", "event_type", "value", "props")
      .withColumn("ts_ntz", expr("CAST(ts_str AS TIMESTAMP_NTZ)"))

    // each fixture dir holds a single file named events.parquet — the
    // driver's testdata layout, which both loaders expect
    def writeSingle(df: org.apache.spark.sql.DataFrame, tag: String): String = {
      val stage = Files.createTempDirectory(s"graft_tsunit_${tag}_stage_")
      df.coalesce(1).write.parquet(s"$stage/out")
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$stage/out"))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      val dir = Files.createTempDirectory(s"graft_tsunit_${tag}_")
      Files.copy(part, dir.resolve("events.parquet"))
      dir.toString
    }
    val cols = Seq("event_id", "ts_ntz", "user_id", "event_type", "value", "props")
    val usDir = writeSingle(
      rows.select(col("event_id"), col("ts_ntz").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props")), "us")
    val nsDir = writeSingle(
      rows.select(col("event_id"),
        expr("unix_micros(CAST(ts_ntz AS TIMESTAMP)) * 1000L").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props")), "ns")

    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("event_id"),
        date_format(col("ts").cast("timestamp"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("w"))
        .orderBy("event_id")
        .collect().map(r => s"${r.getLong(0)}|${r.getString(1)}").toSeq

    val batchUs = canon(Tables.events(spark, usDir))
    val batchNs = canon(Tables.events(spark, nsDir))
    assert(batchUs == batchNs, s"batch loader diverged:\nus=$batchUs\nns=$batchNs")
    assert(batchUs.exists(_.contains("2024-03-01 10:15:30.123456")),
      s"µs precision lost in batch loader: $batchUs")
    // loader must yield a timestamp type either way, never a raw long
    assert(Tables.events(spark, usDir).schema("ts").dataType.typeName.startsWith("timestamp"))
    assert(Tables.events(spark, nsDir).schema("ts").dataType.typeName.startsWith("timestamp"))

    def canonStream(dir: String, tag: String): Seq[String] = {
      val name = s"tsunit_$tag"
      val q = EventStream.eventsStream(spark, dir)
        .writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      canon(spark.table(name))
    }
    val streamUs = canonStream(usDir, "us")
    val streamNs = canonStream(nsDir, "ns")
    assert(streamUs == streamNs, s"stream loader diverged:\nus=$streamUs\nns=$streamNs")
    assert(streamUs == batchUs, s"stream vs batch diverged:\nstream=$streamUs\nbatch=$batchUs")
  }

  test("q158: stream-static join broadcasts the dimension in the micro-batch plan") {
    // the static side of a stream-static join must ride a broadcast —
    // never shuffle the stream for an enrichment join (the q4 star-join
    // discipline inside the streaming runtime). Locked on the ACTUAL
    // micro-batch physical plan of the q158 run, not a batch twin.
    val out = EventStream.q158StreamStaticJoin(spark, sf)
    assert(out.count() > 0)
    val plan = EventStream.lastStreamStaticPlan
    assert(plan.contains("BroadcastHashJoin"),
      s"stream-static join did not broadcast the dimension:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"stream-static join fell back to a stream-side shuffle join:\n$plan")
  }
}
