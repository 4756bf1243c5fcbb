package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Training-data pipeline operators beyond dedup/similarity: benchmark
  * decontamination, repetition-based quality gating, cross-document
  * sequence packing, stratified sampling, temperature-based mixture
  * weighting, and PII redaction.
  *
  * Every query here is deterministic AND engine-version-proof: hashed
  * outputs are integers/booleans/md5 strings only (integer counting,
  * fixed-point ppm weights, integer threshold comparisons, md5 ordering) —
  * never a rounded double, which round 4 proved diverges across DuckDB
  * builds. Scale shapes are shuffle-on-key aggregations and per-stratum
  * windows — never a global single-partition window and never a
  * driver-side loop.
  */
object Pipeline {

  /** q77's contamination threshold, as the integer-comparison denominator:
    * a train document is contaminated when n_shared/n_doc ≥ 1/DecontamDenom
    * (20·n_shared ≥ n_doc ⇔ 5% shingle overlap). NOTE: r5 changed this from
    * 50% (2·n_shared ≥ n_doc) to 5% in the same commit as the integer-math
    * conversion — the oracle hashes re-baselined because of the threshold
    * change, not the determinism refactor.
    */
  private[ops] val DecontamDenom = 20

  // ---- q77: benchmark decontamination (n-gram overlap) --------------------
  // The train/eval split is deterministic (eval = doc_id % 97 == 0 — the
  // stand-in for a held-out benchmark suite). A training document is
  // contaminated when it shares word-3-gram shingles with ANY eval
  // document; the overlap test is |doc ∩ evalSet| / |doc| ≥ 5% on DISTINCT
  // shingles. This is the standard n-gram decontamination pass (the
  // GPT-3/PaLM recipe, with 3-grams standing in for their 8-13-grams at
  // this document length). The threshold test is the INTEGER comparison
  // 20·n_shared ≥ n_doc and the output is integer-only — no double
  // rounding anywhere, so the result is bit-identical across engines and
  // engine versions (r4 lesson: round(x,6) of integer ratios diverged in
  // the driver's DuckDB).
  //
  // Scale shape: the eval shingle set is |eval docs| · |shingles/doc| —
  // small relative to the corpus (held-out suites are fixed-size), and
  // AQE broadcasts it when estimates allow; the train side never
  // self-joins. Counting is per (train doc × distinct shared shingle):
  // one shuffle on shingle, one partial-agged groupBy(doc_id).
  def q77Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingles(t(s, dir, "documents"))
    val evalShingles = sh.filter(col("doc_id") % 97 === 0)
      .select("shingle").distinct()
    sh.filter(col("doc_id") % 97 =!= 0)
      .join(evalShingles, "shingle") // shingles are per-doc distinct already
      .groupBy("doc_id", "n_doc")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") * DecontamDenom >= col("n_doc"))
      .select("doc_id", "n_doc", "n_shared")
      .orderBy("doc_id")
  }

  val q77Sql: String =
    s"""WITH sh AS (${Dedup.shinglesSql}),
       |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_doc FROM sh GROUP BY doc_id)
       |SELECT sh.doc_id, sizes.n_doc, COUNT(*) AS n_shared
       |FROM sh JOIN ev USING (shingle) JOIN sizes ON sizes.doc_id = sh.doc_id
       |WHERE sh.doc_id % 97 <> 0
       |GROUP BY sh.doc_id, sizes.n_doc
       |HAVING COUNT(*) * $DecontamDenom >= sizes.n_doc
       |ORDER BY sh.doc_id""".stripMargin

  // ---- q78: repetition-based quality gate (Gopher-style) ------------------
  // Per document: top-word mass and duplicate-bigram counts — the two
  // cheapest repetition signals from the Gopher quality rules (Rae et al.
  // 2021 §A1.1). The output is the exact integer numerators/denominators
  // plus the gate verdict; the gate thresholds (top-word mass ≤ 0.2,
  // dup-bigram fraction ≤ 0.4) are evaluated as the INTEGER comparisons
  // 5·top_word_n ≤ n_words and 5·(n_bigrams − n_distinct) ≤ 2·n_bigrams.
  // Nothing in the hashed output is a double (r4 lesson: round(x,6) of
  // integer ratios diverged in the driver's DuckDB build), so the result
  // is bit-identical across engines and engine versions.
  //
  // Scale shape: two exploded aggregations (words, bigrams), each a
  // partial-agged groupBy keyed by (doc_id, term) then (doc_id) — the
  // explode is a narrow 1→k generator and nothing ever groups by a bare
  // hot term, so there is no skew amplification at corpus scale.
  def q78RepetitionQuality(s: SparkSession, dir: String): DataFrame = {
    val ws = split(trim(lower(col("text"))), "\\s+")
    val docs = t(s, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), ws.as("ws"))
      .transform(graft.Tables.barrier(_, col("doc_id"))) // materialize split once (see Dedup.shingles)
    val words = docs
      .select(col("doc_id"), explode_outer(col("ws")).as("w"))
      .filter(col("w").isNotNull)
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_words"), max("c").as("top_word_n"),
        count(lit(1)).as("n_distinct_words"))
    val bigrams = docs
      .select(col("doc_id"),
        when(size(col("ws")) >= 2,
          transform(sequence(lit(1), size(col("ws")) - 1),
            i => concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1))))
          .otherwise(array().cast("array<string>")).as("bg"))
      .select(col("doc_id"), size(col("bg")).cast("long").as("n_bigrams"),
        explode_outer(array_distinct(col("bg"))).as("b"))
      .groupBy(col("doc_id"), col("n_bigrams"))
      .agg(count(col("b")).as("n_distinct_bigrams"))
    words.join(bigrams, "doc_id")
      .select(col("doc_id"), col("n_words"), col("n_distinct_words"),
        col("top_word_n"), col("n_bigrams"), col("n_distinct_bigrams"))
      .withColumn("keep",
        col("top_word_n") * 5 <= col("n_words") &&
          (col("n_bigrams") - col("n_distinct_bigrams")) * 5 <= col("n_bigrams") * 2)
      .orderBy("doc_id")
  }

  val q78Sql: String =
    """WITH d AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
      |  FROM documents WHERE length(trim(text)) > 0),
      |words AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
      |    CAST(MAX(c) AS BIGINT) AS top_word_n,
      |    CAST(COUNT(*) AS BIGINT) AS n_distinct_words
      |  FROM (SELECT doc_id, w, COUNT(*) AS c
      |        FROM d, unnest(ws) AS u(w) GROUP BY doc_id, w) wc
      |  GROUP BY doc_id),
      |bg AS (
      |  SELECT doc_id, CAST(greatest(len(ws) - 1, 0) AS BIGINT) AS n_bigrams,
      |    CAST(CASE WHEN len(ws) >= 2 THEN count(DISTINCT b) ELSE 0 END AS BIGINT)
      |      AS n_distinct_bigrams
      |  FROM d LEFT JOIN LATERAL (
      |    SELECT unnest(list_transform(range(1, greatest(len(ws), 1)),
      |      i -> ws[i] || ' ' || ws[i+1])) AS b) x ON TRUE
      |  GROUP BY doc_id, len(ws))
      |SELECT words.doc_id, n_words, n_distinct_words, top_word_n,
      |  n_bigrams, n_distinct_bigrams,
      |  (top_word_n * 5 <= n_words AND
      |   (n_bigrams - n_distinct_bigrams) * 5 <= n_bigrams * 2) AS keep
      |FROM words JOIN bg ON words.doc_id = bg.doc_id
      |ORDER BY words.doc_id""".stripMargin

  // ---- q79: cross-document sequence packing -------------------------------
  // GPT-style packing: within each source shard, documents are laid out in
  // doc_id order on one token stream and cut into fixed 256-token training
  // sequences; a document spans sequences [first_seq, last_seq]. The
  // running offset is a window sum PARTITIONED BY SOURCE — per-shard
  // packing is how real pipelines keep this scalable (a single global
  // token stream would serialize the window into one partition).
  private val seqLen = 256

  def q79PackSequences(s: SparkSession, dir: String): DataFrame = {
    val nTok = when(length(trim(col("text"))) === 0, lit(0))
      .otherwise(size(split(trim(lower(col("text"))), "\\s+")))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "documents")
      .select(col("source"), col("doc_id"), nTok.as("n_tokens"))
      .withColumn("end_off", sum("n_tokens").over(w))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      .filter(col("n_tokens") > 0)
      .select(col("source"), col("doc_id"), col("n_tokens"),
        floor(col("start_off") / seqLen).as("first_seq"),
        floor((col("end_off") - 1) / seqLen).as("last_seq"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
      .orderBy("source", "doc_id")
  }

  val q79Sql: String =
    s"""WITH offs AS (
       |  SELECT source, doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+')) END AS n_tokens,
       |    SUM(CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+')) END)
       |      OVER (PARTITION BY source ORDER BY doc_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
       |  FROM documents)
       |SELECT source, doc_id, n_tokens,
       |  CAST((end_off - n_tokens) AS BIGINT) // $seqLen AS first_seq,
       |  CAST((end_off - 1) AS BIGINT) // $seqLen AS last_seq,
       |  CAST((end_off - 1) AS BIGINT) // $seqLen
       |    - CAST((end_off - n_tokens) AS BIGINT) // $seqLen + 1 AS n_seqs
       |FROM offs WHERE n_tokens > 0
       |ORDER BY source, doc_id""".stripMargin

  // ---- q80: stratified sampling with exact per-stratum quotas -------------
  // Exactly min(quota, |stratum|) documents per language, chosen by the
  // deterministic md5 order (the q37 cross-engine hash-sampling basis) —
  // reproducible across engines, reruns, and partitionings. Shape: one
  // window rank per stratum (shuffle on lang), no global sort until the
  // bounded output.
  private val strataQuota = 40

  def q80StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val h = md5(col("doc_id").cast("string").cast("binary"))
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    t(s, dir, "documents")
      .select(col("lang"), col("doc_id"), h.as("h"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= strataQuota)
      .select("lang", "doc_id", "rk")
      .orderBy("lang", "rk")
  }

  val q80Sql: String =
    s"""SELECT lang, doc_id, rk FROM (
       |  SELECT lang, doc_id,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
       |  FROM documents) r
       |WHERE rk <= $strataQuota
       |ORDER BY lang, rk""".stripMargin

  // ---- q172: batch padding-efficiency stats (arrival vs length-bucketed) --
  // The measurement behind every "sort by length before batching" line in
  // a training recipe: fixed-size batches of 8 docs padded to the batch
  // max. Strategy `arrival` batches in corpus order (doc_id div 8);
  // strategy `length_bucketed` groups docs into 16-token length buckets
  // and batches within each bucket in (n_tokens, doc_id) order — the
  // batching windows PARTITION BY bucket, so no strategy needs a global
  // sort (the q145 discipline; a fully-sorted-corpus strategy would).
  // Per strategy: batch count, real tokens, padded slots
  // (Σ batch_size·batch_max), and the waste in ppm — one integral
  // division of nonnegatives. The length-bucketed waste must come in
  // far below arrival order (spec-pinned), which is the whole point.
  private val padBatch = 8L
  private val padBucketTokens = 16L

  def q172PaddingStats(s: SparkSession, dir: String): DataFrame = {
    val nTok = when(length(trim(col("text"))) === 0, lit(0))
      .otherwise(size(split(trim(lower(col("text"))), "\\s+")))
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), nTok.cast("long").as("n_tokens"))
    val arrival = docs
      .withColumn("strategy", lit("arrival"))
      .withColumn("batch", expr(s"doc_id div $padBatch"))
    val bucketed = docs
      .withColumn("strategy", lit("length_bucketed"))
      .withColumn("bucket", expr(s"n_tokens div $padBucketTokens"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("bucket").orderBy("n_tokens", "doc_id")))
      .withColumn("batch",
        col("bucket") * 1000000L + expr(s"(rk - 1) div $padBatch"))
      .drop("bucket", "rk")
    arrival.unionByName(bucketed)
      .groupBy("strategy", "batch")
      .agg(count(lit(1)).as("bsz"), sum("n_tokens").as("real"),
        max("n_tokens").as("mx"))
      .groupBy("strategy")
      .agg(count(lit(1)).as("n_batches"),
        sum("real").as("real_tokens"),
        sum(col("bsz") * col("mx")).as("padded_slots"))
      .withColumn("waste_ppm",
        expr("((padded_slots - real_tokens) * 1000000) div padded_slots"))
      .orderBy("strategy")
  }

  val q172Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+')) END
       |      AS BIGINT) AS n_tokens
       |  FROM documents),
       |arrival AS (
       |  SELECT 'arrival' AS strategy, doc_id // $padBatch AS batch, n_tokens
       |  FROM toks),
       |bucketed AS (
       |  SELECT 'length_bucketed' AS strategy,
       |    (n_tokens // $padBucketTokens) * 1000000
       |      + (row_number() OVER (PARTITION BY n_tokens // $padBucketTokens
       |         ORDER BY n_tokens, doc_id) - 1) // $padBatch AS batch,
       |    n_tokens
       |  FROM toks),
       |batches AS (
       |  SELECT strategy, batch, COUNT(*) AS bsz,
       |    CAST(SUM(n_tokens) AS BIGINT) AS real, MAX(n_tokens) AS mx
       |  FROM (SELECT * FROM arrival UNION ALL SELECT * FROM bucketed) u
       |  GROUP BY 1, 2),
       |agg AS (
       |  SELECT strategy, COUNT(*) AS n_batches,
       |    CAST(SUM(real) AS BIGINT) AS real_tokens,
       |    CAST(SUM(bsz * mx) AS BIGINT) AS padded_slots
       |  FROM batches GROUP BY 1)
       |SELECT strategy, n_batches, real_tokens, padded_slots,
       |  ((padded_slots - real_tokens) * 1000000) // padded_slots AS waste_ppm
       |FROM agg
       |ORDER BY strategy""".stripMargin

  // ---- q81: temperature-scaled mixture weights ----------------------------
  // Per (lang, source) corpus shard: sampling weight ∝ n_tokens^0.5 — the
  // standard temperature reweighting (multilingual LM mixing, T=2 ⇔
  // exponent 1/2). The weight is materialized as the FIXED-POINT integer
  // `weight_ppm` (parts-per-million of the mix):
  //   w_fp       = floor(sqrt(n_tokens) · 10⁶)          — a long
  //   weight_ppm = (w_fp · 10⁶) div Σ w_fp              — integer division
  // Every step is cross-engine exact: sqrt and the 10⁶ multiply are
  // correctly-rounded IEEE-754 double ops (bit-identical in any engine),
  // floor is exact, and the normalizer is an order-independent INTEGER
  // sum with an integer division. No double ever reaches the hashed
  // output (r4 lesson: a sqrt→decimal→double→round(…,6) chain diverged in
  // the driver's DuckDB build — decimal casts and rounding are
  // engine-version-specific; fixed-point integers are not).
  private[ops] def mixtureShards(s: SparkSession, dir: String): DataFrame = {
    val nTok = when(length(trim(col("text"))) === 0, lit(0))
      .otherwise(size(split(trim(lower(col("text"))), "\\s+")))
    val shards = t(s, dir, "documents")
      .select(col("lang"), col("source"), nTok.as("n_tokens"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .withColumn("w_fp",
        floor(sqrt(col("n_tokens").cast("double")) * lit(1000000.0)))
    // normalizer via broadcast cross join (stays lazy, no driver collect);
    // the integer sum is order-independent. The ppm numerator w_fp·10⁶ is
    // computed in DECIMAL(38,0): in Long it overflows once a shard holds
    // ≳8.5e13 tokens (w_fp ≳ 9.2e12), and with ANSI off Spark would wrap
    // silently negative while DuckDB's BIGINT errors — exactly the
    // divergence this module exists to rule out at the 100 TB target.
    // DECIMAL(38,0) DIV BIGINT is still exact integer math and returns a
    // Long, so the hashed output stays integer-only.
    val tot = shards.agg(sum("w_fp").as("tot"))
    shards.crossJoin(broadcast(tot))
      .withColumn("weight_ppm",
        expr("(CAST(w_fp AS DECIMAL(38,0)) * 1000000) DIV tot"))
      .select("lang", "source", "n_docs", "n_tokens", "weight_ppm")
  }

  def q81MixingWeights(s: SparkSession, dir: String): DataFrame =
    mixtureShards(s, dir).orderBy("lang", "source")

  /** Shared CTE chain for the fixed-point mixture weights — reused by the
    * q84 materializer oracle.
    */
  private[ops] val mixtureCtes: String =
    """shards AS (
      |  SELECT lang, source, COUNT(*) AS n_docs,
      |    CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
      |        ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END) AS BIGINT)
      |      AS n_tokens
      |  FROM documents GROUP BY lang, source),
      |ws AS (SELECT *,
      |         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS w_fp
      |       FROM shards),
      |mix AS (
      |  SELECT lang, source, n_docs, n_tokens,
      |    CAST((CAST(w_fp AS HUGEINT) * 1000000)
      |         // CAST((SELECT SUM(w_fp) FROM ws) AS BIGINT) AS BIGINT)
      |      AS weight_ppm
      |  FROM ws)""".stripMargin

  val q81Sql: String =
    s"""WITH $mixtureCtes
       |SELECT lang, source, n_docs, n_tokens, weight_ppm FROM mix
       |ORDER BY lang, source""".stripMargin

  // ---- q84: weighted-sample materializer ----------------------------------
  // Consumes q81's fixed-point mixture weights and materializes an actual
  // training-mix manifest: per (lang, source) shard, quota =
  // (weight_ppm · budget) div 10⁶ documents, picked in deterministic
  // md5(doc_id) order (the q80 cross-engine sampling basis). Integer
  // quotas + hash ordering ⇒ fully oracle-checkable.
  //
  // Scale shape: the quota table is k shards (tiny — broadcast by AQE);
  // ranking is one row_number window per shard (shuffle on (lang,
  // source)), never a global sort; the budget bound makes the output
  // constant-size regardless of corpus size.
  private val mixBudget = 500

  def q84WeightedSample(s: SparkSession, dir: String): DataFrame = {
    val quotas = mixtureShards(s, dir)
      .withColumn("quota", expr(s"(weight_ppm * CAST($mixBudget AS BIGINT)) DIV 1000000"))
      .select("lang", "source", "quota")
    val h = md5(col("doc_id").cast("string").cast("binary"))
    val w = Window.partitionBy("lang", "source").orderBy(col("h"), col("doc_id"))
    t(s, dir, "documents")
      .select(col("lang"), col("source"), col("doc_id"), h.as("h"))
      .withColumn("rk", row_number().over(w))
      .join(quotas, Seq("lang", "source"))
      .filter(col("rk") <= col("quota"))
      .select(col("lang"), col("source"), col("doc_id"), col("rk"), col("quota"))
      .orderBy("lang", "source", "rk")
  }

  val q84Sql: String =
    s"""WITH $mixtureCtes,
       |quotas AS (
       |  SELECT lang, source, CAST((weight_ppm * $mixBudget) // 1000000 AS BIGINT) AS quota
       |  FROM mix),
       |ranked AS (
       |  SELECT lang, source, doc_id,
       |    row_number() OVER (PARTITION BY lang, source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
       |  FROM documents)
       |SELECT r.lang, r.source, r.doc_id, r.rk, q.quota
       |FROM ranked r JOIN quotas q USING (lang, source)
       |WHERE rk <= quota
       |ORDER BY lang, source, rk""".stripMargin

  // ---- q85: PII redaction -------------------------------------------------
  // Regex scrubbing of emails and long digit runs — the compliance pass
  // every assembled corpus goes through. The testdata carries no PII, so
  // each document is first decorated with a DETERMINISTIC synthetic
  // contact line (derived from doc_id); the redaction (the operator under
  // test) then strips it. Narrow per-row map, no shuffle; patterns stay in
  // the portable regex subset both engines compile identically.
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val numRe = "[0-9]{5,}"

  def q85PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val decorated = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com id "),
      (col("doc_id") * 7919 + 10007).cast("string"))
    t(s, dir, "documents")
      .select(col("doc_id"), decorated.as("raw"))
      .select(col("doc_id"),
        regexp_count(col("raw"), lit(emailRe)).as("n_emails"),
        regexp_count(col("raw"), lit(numRe)).as("n_long_nums"),
        md5(regexp_replace(regexp_replace(col("raw"), emailRe, "<EMAIL>"),
          numRe, "<NUM>").cast("binary")).as("redacted_md5"))
      .orderBy("doc_id")
  }

  val q85Sql: String =
    s"""SELECT doc_id,
       |  length(regexp_extract_all(raw, '$emailRe')) AS n_emails,
       |  length(regexp_extract_all(raw, '$numRe')) AS n_long_nums,
       |  md5(regexp_replace(regexp_replace(raw, '$emailRe', '<EMAIL>', 'g'),
       |      '$numRe', '<NUM>', 'g')) AS redacted_md5
       |FROM (SELECT doc_id,
       |        text || ' contact user' || CAST(doc_id AS VARCHAR) ||
       |        '@example.com id ' || CAST(doc_id * 7919 + 10007 AS VARCHAR) AS raw
       |      FROM documents) d
       |ORDER BY doc_id""".stripMargin

  // ---- q99: train/val/test split manifest ---------------------------------
  // Deterministic holdout assignment by hash-prefix range: split =
  // lexicographic band of md5(doc_id) — 'test' for h < '04' (4/256 ≈
  // 1.56%), 'val' for h < '08', else 'train'. A string compare on the hex
  // digest is engine-exact (both engines emit lowercase hex), stable
  // under corpus growth (a document's split never changes when others are
  // added — the property random sampling lacks), and embarrassingly
  // parallel: one narrow map, one partial-agged groupBy for the manifest.
  // This is the q37 hash-sampling discipline applied to the one split
  // every training pipeline needs.
  def q99SplitManifest(s: SparkSession, dir: String): DataFrame = {
    val h = md5(col("doc_id").cast("string").cast("binary"))
    t(s, dir, "documents")
      .withColumn("split",
        when(h < "04", "test").when(h < "08", "val").otherwise("train"))
      .groupBy("split", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("split", "lang")
  }

  val q99Sql: String =
    """SELECT split, lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM (
      |  SELECT lang, n_chars, doc_id,
      |    CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '04' THEN 'test'
      |         WHEN md5(CAST(doc_id AS VARCHAR)) < '08' THEN 'val'
      |         ELSE 'train' END AS split
      |  FROM documents) d
      |GROUP BY split, lang
      |ORDER BY split, lang""".stripMargin

  // ---- q136: consistent-hash shard rebalance manifest ---------------------
  // What happens to q99's static assignment when the shard COUNT changes:
  // a plain `hash % n` remaps ~(n-1)/n of all keys on n → n+1 — at 100 TB
  // that is rewriting the whole store to add one shard. Jump consistent
  // hash (Lamping & Veach '14 — the native codegen expression in
  // functions/JumpConsistentHash.scala) moves EXACTLY the expected
  // 1/(n+1) fraction, and every moved key lands in the NEW shard, so a
  // 16 → 17 resharding relocates ~6% of documents and touches no
  // existing shard pair. The manifest reports both assignments and the
  // moved flag per document — the migration plan a rebalancer executes.
  // No SQL spelling of the jump loop exists → rows-only, pinned by the
  // reference-implementation + defining-property specs.
  def q136ConsistentShards(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.JumpConsistentHash.jump_hash
    t(s, dir, "documents")
      .select(col("doc_id"), xxhash64(col("doc_id")).as("key"))
      .select(col("doc_id"),
        jump_hash(col("key"), 16).as("shard_16"),
        jump_hash(col("key"), 17).as("shard_17"))
      .withColumn("moved", col("shard_16") =!= col("shard_17"))
      .orderBy("doc_id")
  }

  // -------------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q136_consistent_shards" -> q136ConsistentShards _,
    "q77_decontaminate" -> q77Decontaminate _,
    "q78_repetition_quality" -> q78RepetitionQuality _,
    "q79_pack_sequences" -> q79PackSequences _,
    "q80_stratified_sample" -> q80StratifiedSample _,
    "q81_mixing_weights" -> q81MixingWeights _,
    "q84_weighted_sample" -> q84WeightedSample _,
    "q85_pii_redact" -> q85PiiRedact _,
    "q99_split_manifest" -> q99SplitManifest _,
    "q172_padding_stats" -> q172PaddingStats _,
  )

  val oracle: Map[String, String] = Map(
    "q77_decontaminate" -> q77Sql,
    "q78_repetition_quality" -> q78Sql,
    "q79_pack_sequences" -> q79Sql,
    "q80_stratified_sample" -> q80Sql,
    "q81_mixing_weights" -> q81Sql,
    "q84_weighted_sample" -> q84Sql,
    "q85_pii_redact" -> q85Sql,
    "q99_split_manifest" -> q99Sql,
    "q172_padding_stats" -> q172Sql,
  )
}
