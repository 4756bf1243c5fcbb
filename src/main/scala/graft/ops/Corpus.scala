package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Corpus-curation operators beyond ops/Pipeline: segment-level (paragraph)
  * exact deduplication, URL canonicalization with per-host dedup stats,
  * exact-substring benchmark contamination pairs, and a linear
  * quality-classifier scorer.
  *
  * Same determinism discipline as ops/Pipeline: hashed outputs are
  * integers / booleans / md5 strings only — never a rounded double — so
  * every query here is bit-identical across engines and engine versions.
  * Scale shapes are narrow per-row maps, shuffle-on-key aggregations and
  * per-key windows; never a global single-partition window, never a
  * driver-side loop.
  */
object Corpus {

  private val nonBlank = length(trim(col("text"))) > 0
  private def ws = split(trim(lower(col("text"))), "\\s+")

  // ---- q113: paragraph-level exact dedup ----------------------------------
  // The C4/RefinedWeb line-dedup shape at segment granularity: each document
  // splits into non-overlapping 16-token segments (the paragraph stand-in
  // for this corpus — the synthetic text carries no newlines), every
  // segment is deduplicated CORPUS-WIDE keeping its first occurrence (min
  // (doc_id, seg_idx) — deterministic), and each document is reconstructed
  // from its surviving segments in order. Repeated boilerplate is removed
  // from every document except the first one that carried it.
  //
  // Scale shape: one narrow 1→k segment generator per doc, ONE shuffle —
  // the winner-pick window partitioned by segment text (at 100 TB the
  // partition key is md5(seg_text), same distribution, bounded key width) —
  // then a partial-agged groupBy(doc_id) for the reconstruction. No
  // self-join, no global window.
  private val segTokens = 16

  def q113ParagraphDedup(s: SparkSession, dir: String): DataFrame = {
    val segs = t(s, dir, "documents")
      .filter(nonBlank)
      .select(col("doc_id"), ws.as("ws"))
      .transform(graft.Tables.barrier(_, col("doc_id"))) // materialize split once (see Dedup.shingles)
      .select(col("doc_id"), col("ws"),
        explode_outer(sequence(lit(1), size(col("ws")), lit(segTokens))).as("start"))
      .filter(col("start").isNotNull)
      .select(col("doc_id"),
        ((col("start") - 1) / segTokens).cast("int").as("seg_idx"),
        concat_ws(" ", slice(col("ws"), col("start"), lit(segTokens))).as("seg_text"))
    val w = Window.partitionBy("seg_text").orderBy("doc_id", "seg_idx")
    segs
      .withColumn("rk", row_number().over(w))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("rk") === 1, lit(1L)).otherwise(lit(0L))).as("n_kept"),
        // surviving text, reconstructed in segment order; collect_list
        // drops the when()'s nulls, array_sort orders by (seg_idx, _)
        md5(concat_ws(" ",
          transform(
            array_sort(collect_list(when(col("rk") === 1,
              struct(col("seg_idx"), col("seg_text"))))),
            x => x.getField("seg_text"))).cast("binary")).as("kept_md5"))
      .orderBy("doc_id")
  }

  val q113Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
       |  FROM documents WHERE length(trim(text)) > 0),
       |segs AS (
       |  SELECT doc_id, CAST((start - 1) // $segTokens AS INT) AS seg_idx,
       |    array_to_string(ws[start : least(start + ${segTokens - 1}, len(ws))], ' ') AS seg_text
       |  FROM d, unnest(generate_series(1, len(ws), $segTokens)) AS u(start)),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY seg_text ORDER BY doc_id, seg_idx) AS rk
       |  FROM segs)
       |SELECT doc_id, COUNT(*) AS n_segs,
       |  CAST(COUNT(*) FILTER (WHERE rk = 1) AS BIGINT) AS n_kept,
       |  md5(COALESCE(string_agg(seg_text, ' ' ORDER BY seg_idx) FILTER (WHERE rk = 1), ''))
       |    AS kept_md5
       |FROM ranked
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // ---- q114: URL canonicalization + per-host dedup stats ------------------
  // The crawl-curation front door: raw URLs arrive in mixed case, with and
  // without scheme/www/query-string/trailing-slash decorations; the
  // operator canonicalizes them (lowercase, strip scheme + www. + query +
  // trailing slash), extracts host and registered domain, and aggregates
  // per host: document count, distinct canonical URLs (the URL-dedup
  // signal) and an over-quota flag (integer compare — the per-host crawl
  // cap). The testdata carries no URL column, so each document is first
  // decorated with a DETERMINISTIC synthetic URL derived from (source,
  // doc_id) — variant case/decoration branches included — and the
  // normalization (the operator under test) then canonicalizes it.
  //
  // Scale shape: narrow per-row regex maps (no UDFs, portable regex subset
  // both engines compile identically), then one partial-agged
  // groupBy(domain, host). countDistinct adds its standard two-phase
  // expansion on the same key — no extra wide stage.
  private val hostQuota = 6

  def q114UrlNormalize(s: SparkSession, dir: String): DataFrame = {
    // doc_id % 20 IS the source index in the testdata, so host/path variety
    // within a source must come from the per-source counter doc_id DIV 20 —
    // a bare doc_id % k would be constant per source (degenerate dedup).
    val serial = expr("doc_id DIV 20")
    val scheme = when(col("doc_id") % 11 === 0, lit("HTTPS://"))
      .when(col("doc_id") % 2 === 0, lit("https://")).otherwise(lit("http://"))
    val www = when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit(""))
    val host0 = concat(col("source"), lit(".ex"), (serial % 4).cast("string"), lit(".org"))
    val host = when(col("doc_id") % 13 === 0, upper(host0)).otherwise(host0)
    val path = concat(lit("/docs/"), (serial % 10).cast("string"))
    val trailing = when(col("doc_id") % 4 === 1, lit("/")).otherwise(lit(""))
    val query = when(col("doc_id") % 5 === 0,
      concat(lit("?utm_source=feed&ref="), col("doc_id").cast("string"))).otherwise(lit(""))
    val raw = concat(scheme, www, host, path, trailing, query)
    val canon =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(lower(raw), "^https?://", ""),
            "^www\\.", ""),
          "[?#].*$", ""),
        "/+$", "")
    t(s, dir, "documents")
      .select(col("doc_id"), canon.as("url"))
      .select(col("doc_id"), col("url"),
        regexp_extract(col("url"), "^([^/]+)", 1).as("host"))
      .withColumn("domain", regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1))
      .groupBy("domain", "host")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_urls"),
        min(col("doc_id")).as("first_doc"))
      .withColumn("over_quota", col("n_docs") > hostQuota)
      .orderBy("domain", "host")
  }

  val q114Sql: String =
    s"""WITH raw AS (
       |  SELECT doc_id,
       |    (CASE WHEN doc_id % 11 = 0 THEN 'HTTPS://'
       |          WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
       |    || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
       |    || (CASE WHEN doc_id % 13 = 0
       |             THEN upper(source || '.ex' || CAST((doc_id // 20) % 4 AS VARCHAR) || '.org')
       |             ELSE source || '.ex' || CAST((doc_id // 20) % 4 AS VARCHAR) || '.org' END)
       |    || '/docs/' || CAST((doc_id // 20) % 10 AS VARCHAR)
       |    || (CASE WHEN doc_id % 4 = 1 THEN '/' ELSE '' END)
       |    || (CASE WHEN doc_id % 5 = 0
       |             THEN '?utm_source=feed&ref=' || CAST(doc_id AS VARCHAR) ELSE '' END)
       |      AS u
       |  FROM documents),
       |canon AS (
       |  SELECT doc_id,
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(u),
       |      '^https?://', ''), '^www\\.', ''), '[?#].*$$', ''), '/+$$', '') AS url
       |  FROM raw),
       |hosts AS (
       |  SELECT doc_id, url, regexp_extract(url, '^([^/]+)', 1) AS host FROM canon)
       |SELECT regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain, host,
       |  COUNT(*) AS n_docs, COUNT(DISTINCT url) AS n_urls,
       |  MIN(doc_id) AS first_doc,
       |  COUNT(*) > $hostQuota AS over_quota
       |FROM hosts
       |GROUP BY 1, 2
       |ORDER BY domain, host""".stripMargin

  // ---- q116: exact-substring contamination pairs --------------------------
  // The match-location complement of q77's per-document overlap gate: for
  // every (train doc, eval doc) pair sharing at least one exact word
  // 4-gram, emit the pair and the shared-gram count — the audit table a
  // decontamination pass produces before dropping documents (the Lee et
  // al. exact-substring recipe; 4-grams stand in for their 50-token runs
  // at this document length, exactly as q77's 3-grams stand in for the
  // GPT-3 8-13-grams). Same deterministic eval split as q77
  // (doc_id % 97 = 0).
  //
  // Scale shape: per-doc DISTINCT grams (narrow 1→k generator), one
  // shuffle on gram joining train grams to the small eval-gram side (AQE
  // broadcasts it when estimates allow — held-out suites are fixed-size),
  // one partial-agged groupBy on the pair. The train side never
  // self-joins.
  private val contamN = 4

  def q116SubstringContam(s: SparkSession, dir: String): DataFrame = {
    val grams = t(s, dir, "documents")
      .filter(nonBlank)
      .select(col("doc_id"), ws.as("ws"))
      .transform(graft.Tables.barrier(_, col("doc_id"))) // materialize split once
      .select(col("doc_id"),
        explode_outer(array_distinct(
          when(size(col("ws")) >= contamN,
            transform(sequence(lit(1), size(col("ws")) - (contamN - 1)),
              i => concat_ws(" ", slice(col("ws"), i, lit(contamN)))))
            .otherwise(array().cast("array<string>")))).as("g"))
      .filter(col("g").isNotNull)
    val evalGrams = grams.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("eval_id"), col("g"))
    grams.filter(col("doc_id") % 97 =!= 0)
      .join(evalGrams, "g")
      .groupBy("doc_id", "eval_id")
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy("doc_id", "eval_id")
  }

  val q116Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
       |  FROM documents WHERE length(trim(text)) > 0),
       |g AS (
       |  SELECT DISTINCT doc_id, g FROM d,
       |    unnest(list_transform(range(1, len(ws) - ${contamN - 2}),
       |      i -> array_to_string(ws[i : i + ${contamN - 1}], ' '))) AS u(g)
       |  WHERE len(ws) >= $contamN)
       |SELECT t.doc_id AS doc_id, e.doc_id AS eval_id, COUNT(*) AS n_shared_grams
       |FROM g t JOIN g e ON t.g = e.g
       |WHERE t.doc_id % 97 <> 0 AND e.doc_id % 97 = 0
       |GROUP BY t.doc_id, e.doc_id
       |ORDER BY doc_id, eval_id""".stripMargin

  // ---- q118: linear quality-classifier scoring ----------------------------
  // The fasttext-style quality-filter shape: a fixed linear model over
  // cheap per-document features (token count, punctuation, digit runs,
  // length), scored per row and thresholded into keep/drop plus a score
  // bucket for mixture construction. Weights are INTEGERS and every
  // feature is an integer count, so the score is exact int64 arithmetic —
  // no sigmoid (transcendentals diverge across engines); the monotone
  // threshold/bucket transform preserves the ranking a probability head
  // would induce.
  //
  // Scale shape: a single narrow per-row map over the scan — the weight
  // vector rides in the plan as literals (the broadcast-model shape); no
  // shuffle at all until the output sort.
  private val qcThreshold = 150
  private val qcBucket = 50

  def q118QualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val nTokens = when(nonBlank, size(split(trim(col("text")), "\\s+"))).otherwise(lit(0))
    val nPunct = length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))
    val nDigits = length(col("text")) - length(regexp_replace(col("text"), "[0-9]", ""))
    t(s, dir, "documents")
      .select(col("doc_id"),
        nTokens.cast("long").as("n_tokens"),
        nPunct.cast("long").as("n_punct"),
        nDigits.cast("long").as("n_digits"),
        length(col("text")).cast("long").as("len_chars"))
      .withColumn("score",
        col("n_tokens") * 3 - col("n_punct") * 5 - col("n_digits") * 2
          + expr("len_chars DIV 10") - 40)
      .select(col("doc_id"), col("n_tokens"), col("n_punct"), col("n_digits"),
        col("len_chars"), col("score"),
        (col("score") >= qcThreshold).as("keep"),
        // clamp before bucketing: negative integer division truncates in
        // Spark and floors in other engines — clamping rules the branch out
        expr(s"greatest(score, CAST(0 AS BIGINT)) DIV $qcBucket").as("bucket"))
      .orderBy("doc_id")
  }

  val q118Sql: String =
    s"""WITH f AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens,
       |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT)
       |      AS n_punct,
       |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT)
       |      AS n_digits,
       |    CAST(length(text) AS BIGINT) AS len_chars
       |  FROM documents),
       |scored AS (
       |  SELECT *, n_tokens * 3 - n_punct * 5 - n_digits * 2 + len_chars // 10 - 40 AS score
       |  FROM f)
       |SELECT doc_id, n_tokens, n_punct, n_digits, len_chars, score,
       |  score >= $qcThreshold AS keep,
       |  CAST(greatest(score, 0) // $qcBucket AS BIGINT) AS bucket
       |FROM scored
       |ORDER BY doc_id""".stripMargin

  // ---- q123: span-corruption masking plan ----------------------------------
  // The denoising-objective complement of q46/q79's packing: a T5-style
  // span-corruption PLAN per document — mask a ~15% token budget in
  // length-3 spans on a fixed stride, with a document-dependent phase so
  // span positions vary across the corpus but stay a PURE FUNCTION of
  // (doc_id, n_tokens): phase = (doc_id · 31) mod stride. Rerunning the
  // pipeline regenerates the identical mask plan (the q37 reproducibility
  // discipline — a rand() plan would differ per run/partitioning).
  // Output per span: sentinel id, start, clipped length — all integers.
  //
  // Scale shape: a narrow 1→k generator per doc (explode of span starts),
  // no shuffle until the output sort.
  private val spanStride = 20
  private val spanLen = 3

  def q123SpanCorruption(s: SparkSession, dir: String): DataFrame = {
    val nTok = size(split(trim(lower(col("text"))), "\\s+"))
    t(s, dir, "documents")
      .filter(nonBlank)
      .select(col("doc_id"), nTok.as("n_tokens"),
        (col("doc_id") * 31 % spanStride).cast("int").as("phase"))
      .filter(col("n_tokens") > col("phase"))
      .select(col("doc_id"), col("n_tokens"),
        posexplode(sequence(col("phase") + 1, col("n_tokens"), lit(spanStride)))
          .as(Seq("sentinel", "span_start")))
      .select(col("doc_id"), col("n_tokens"), col("sentinel"), col("span_start"),
        least(lit(spanLen), col("n_tokens") - col("span_start") + 1).as("span_len"))
      .orderBy("doc_id", "sentinel")
  }

  val q123Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS INT) AS n_tokens,
       |    CAST(doc_id * 31 % $spanStride AS INT) AS phase
       |  FROM documents WHERE length(trim(text)) > 0)
       |SELECT doc_id, n_tokens,
       |  CAST((u.start - phase - 1) // $spanStride AS INT) AS sentinel,
       |  CAST(u.start AS INT) AS span_start,
       |  CAST(least($spanLen, n_tokens - u.start + 1) AS INT) AS span_len
       |FROM d, unnest(generate_series(phase + 1, n_tokens, $spanStride)) AS u(start)
       |WHERE n_tokens > phase
       |ORDER BY doc_id, sentinel""".stripMargin

  // ---- q124: bigram LM conditional counts (CCNet-style corpus stats) ------
  // The counting step of the cheap n-gram language model real pipelines
  // train for perplexity-based quality filtering (the CCNet recipe):
  // corpus-wide bigram counts joined to their left-unigram counts, with
  // the conditional probability P(b|a) as fixed-point ppm (q81
  // discipline — integer division, never a rounded double). Top-200 by
  // bigram count with deterministic tie-break keeps the output bounded.
  //
  // Scale shape: two partial-agged exploded aggregations (never grouped
  // by a bare hot token without its doc/bigram context — the q78 skew
  // note), one keyed join bigram→unigram, bounded TakeOrderedAndProject.
  def q124BigramLm(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .filter(nonBlank)
      .select(col("doc_id"), ws.as("ws"))
      .transform(graft.Tables.barrier(_, col("doc_id"))) // materialize split once
    val unigrams = docs
      .select(explode_outer(col("ws")).as("a"))
      .filter(col("a").isNotNull)
      .groupBy("a").agg(count(lit(1)).as("c_a"))
    val bigrams = docs
      .select(explode_outer(
        when(size(col("ws")) >= 2,
          transform(sequence(lit(1), size(col("ws")) - 1),
            i => struct(element_at(col("ws"), i).as("a"),
              element_at(col("ws"), i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("bg"))
      .filter(col("bg").isNotNull)
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    bigrams.join(unigrams, "a")
      .select(col("a"), col("b"), col("c_ab"), col("c_a"),
        expr("(c_ab * 1000000) DIV c_a").as("p_cond_ppm"))
      .orderBy(desc("c_ab"), asc("a"), asc("b"))
      .limit(200)
  }

  val q124Sql: String =
    """WITH d AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
      |  FROM documents WHERE length(trim(text)) > 0),
      |uni AS (
      |  SELECT w AS a, COUNT(*) AS c_a FROM d, unnest(ws) AS u(w) GROUP BY w),
      |bg AS (
      |  SELECT ws[i] AS a, ws[i+1] AS b, COUNT(*) AS c_ab
      |  FROM d, unnest(range(1, greatest(len(ws), 1))) AS u(i)
      |  WHERE len(ws) >= 2
      |  GROUP BY 1, 2)
      |SELECT bg.a AS a, bg.b AS b, c_ab, c_a, (c_ab * 1000000) // c_a AS p_cond_ppm
      |FROM bg JOIN uni ON bg.a = uni.a
      |ORDER BY c_ab DESC, bg.a, bg.b
      |LIMIT 200""".stripMargin

  // ---- q128: per-document LM quality score (the CCNet filter shape) -------
  // q124 built the corpus bigram LM; q128 SCORES every document under it —
  // the judgment step of perplexity-based quality filtering (CCNet): a
  // document whose bigrams are predictable under the corpus model reads
  // as fluent text, one full of rare transitions as noise. The score is
  // the mean conditional-probability ppm of the doc's bigrams,
  // integer-exact end to end: per-bigram P(b|a) as (c_ab·10⁶) DIV c_a
  // (the q124/q81 fixed-point discipline — a float log-perplexity would
  // hash-diverge across engines' libm), summed and DIV'd per doc. `keep`
  // compares against a FIXED threshold — in production calibrated offline
  // from a sample, exactly as CCNet fits its tercile cut-offs offline
  // rather than re-deriving them per batch (a global ntile here would be
  // a corpus-wide single-partition sort).
  //
  // Scale shape: the corpus LM is REDUCED first (bigram⋈unigram on the
  // already-aggregated count relations), then one keyed join attaches
  // per-bigram ppm to the exploded doc bigrams and a partial-agged
  // groupBy(doc_id) folds the score — cost ∝ corpus tokens, shuffled on
  // the bigram key (AQE skew-splits the "the of"-class hot keys), never
  // a doc × vocabulary product. Docs with < 2 tokens have no bigrams and
  // are unscored (absent) in both engines.
  private val lmKeepPpm = 34000L

  def q128LmScore(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .filter(nonBlank)
      .select(col("doc_id"), ws.as("ws"))
      .transform(graft.Tables.barrier(_, col("doc_id"))) // materialize split once
    val docBigrams = docs
      .select(col("doc_id"), explode_outer(
        when(size(col("ws")) >= 2,
          transform(sequence(lit(1), size(col("ws")) - 1),
            i => struct(element_at(col("ws"), i).as("a"),
              element_at(col("ws"), i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("bg"))
      .filter(col("bg").isNotNull)
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
    val unigrams = docs
      .select(explode_outer(col("ws")).as("a"))
      .filter(col("a").isNotNull)
      .groupBy("a").agg(count(lit(1)).as("c_a"))
    val ppm = docBigrams
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      .join(unigrams, "a")
      .select(col("a"), col("b"), expr("(c_ab * 1000000) DIV c_a").as("p_ppm"))
    docBigrams.join(ppm, Seq("a", "b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_ppm")).as("sum_ppm"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("sum_ppm DIV n_bigrams").as("avg_p_ppm"),
        (expr("sum_ppm DIV n_bigrams") >= lmKeepPpm).as("keep"))
      .orderBy("doc_id")
  }

  val q128Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
       |  FROM documents WHERE length(trim(text)) > 0),
       |dbg AS (
       |  SELECT doc_id, ws[i] AS a, ws[i+1] AS b
       |  FROM d, unnest(range(1, greatest(len(ws), 1))) AS u(i)
       |  WHERE len(ws) >= 2),
       |uni AS (
       |  SELECT a, COUNT(*) AS c_a FROM (SELECT unnest(ws) AS a FROM d) t GROUP BY a),
       |bg AS (SELECT a, b, COUNT(*) AS c_ab FROM dbg GROUP BY 1, 2),
       |ppm AS (
       |  SELECT bg.a, bg.b, (c_ab * 1000000) // c_a AS p_ppm
       |  FROM bg JOIN uni ON bg.a = uni.a)
       |SELECT doc_id, COUNT(*) AS n_bigrams,
       |  CAST(SUM(p_ppm) AS BIGINT) // COUNT(*) AS avg_p_ppm,
       |  (CAST(SUM(p_ppm) AS BIGINT) // COUNT(*)) >= $lmKeepPpm AS keep
       |FROM dbg JOIN ppm USING (a, b)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // ---- q173: native Generator (UDTF) — per-source trigram vocabulary ------
  // Drives [[graft.functions.WordNgrams]] — a native Catalyst Generator
  // (the 1→k table-valued expression class explode/posexplode subclass,
  // completing the custom-extension matrix) — from SQL TEXT through the
  // session extensions: `word_ngrams(text, 3)` in a select list, exactly
  // like a built-in generator. Emits rows straight off the token walk
  // with no intermediate array-of-structs per doc (the transform+
  // posexplode composition materializes and copies one). The aggregate —
  // distinct trigram vocabulary and total trigram volume per source —
  // shuffles once on (source, gram) via the standard two-phase distinct
  // expansion. FunctionsSpec pins the generator's output equal to the
  // built-in composition row-for-row on the real corpus.
  def q173NgramGenerator(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .selectExpr("source", "word_ngrams(text, 3)")
      .groupBy("source")
      .agg(countDistinct(col("gram")).as("n_distinct_grams"),
        count(lit(1)).as("n_grams"))
      .orderBy("source")

  val q173Sql: String =
    """WITH d AS (
      |  SELECT source, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
      |  FROM documents WHERE length(trim(text)) > 0),
      |g AS (
      |  SELECT source, array_to_string(ws[i : i + 2], ' ') AS gram
      |  FROM d, unnest(range(1, len(ws) - 1)) AS u(i)
      |  WHERE len(ws) >= 3)
      |SELECT source, COUNT(DISTINCT gram) AS n_distinct_grams,
      |  CAST(COUNT(*) AS BIGINT) AS n_grams
      |FROM g
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q113_paragraph_dedup" -> q113ParagraphDedup _,
    "q114_url_normalize" -> q114UrlNormalize _,
    "q116_substring_contam" -> q116SubstringContam _,
    "q118_quality_classifier" -> q118QualityClassifier _,
    "q123_span_corruption" -> q123SpanCorruption _,
    "q124_bigram_lm" -> q124BigramLm _,
    "q128_lm_score" -> q128LmScore _,
    "q173_ngram_generator" -> q173NgramGenerator _,
  )

  val oracle: Map[String, String] = Map(
    "q113_paragraph_dedup" -> q113Sql,
    "q114_url_normalize" -> q114Sql,
    "q116_substring_contam" -> q116Sql,
    "q118_quality_classifier" -> q118Sql,
    "q123_span_corruption" -> q123Sql,
    "q124_bigram_lm" -> q124Sql,
    "q128_lm_score" -> q128Sql,
    "q173_ngram_generator" -> q173Sql,
  )
}
