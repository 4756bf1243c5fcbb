package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import Num._

/** Text-analysis operators over the `documents` table — the text half of a
  * training-data pipeline: token statistics, quality scoring, n-gram
  * language ID, and document fingerprinting. All pure column expressions
  * (codegen-friendly, no UDFs) and all DuckDB-oracle-checkable.
  */
object TextOps {

  /** Whitespace tokens of the trimmed text; [''] for blank docs in both
    * engines, so guard counts with a blank check.
    */
  private[ops] def toks(c: Column): Column = split(trim(c), "\\s+")

  private[ops] val isBlank: Column = length(trim(col("text"))) === 0

  // ---- q30: per-document token/quality statistics -------------------------
  def q30TextStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("n_tokens", when(isBlank, lit(0)).otherwise(size(toks(col("text")))))
      .select(
        col("doc_id"), col("lang"), col("source"), col("n_chars"),
        length(col("text")).as("len_chars"),
        col("n_tokens"),
        // avg token length over whitespace-free chars; 0 for blank docs
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(length(regexp_replace(col("text"), "\\s+", "")).cast("double")
            / col("n_tokens")).as("avg_token_len"),
        // BPE-ish pre-tokenizer count: letter runs / digit runs / single
        // non-space symbols — the GPT-2-style split shape
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("n_tokens_bpe"),
        (length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", "")))
          .as("n_punct"),
        (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
          .as("n_digits"))
      .orderBy("doc_id")

  val q30Sql: String =
    """SELECT doc_id, lang, source, n_chars,
      |  CAST(length(text) AS INT) AS len_chars,
      |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
      |       ELSE length(regexp_split_to_array(trim(text), '\s+')) END AS INT) AS n_tokens,
      |  CASE WHEN length(trim(text)) = 0 THEN 0.0
      |       ELSE CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
      |            / length(regexp_split_to_array(trim(text), '\s+')) END AS avg_token_len,
      |  CAST(length(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS n_tokens_bpe,
      |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS INT) AS n_punct,
      |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS INT) AS n_digits
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- q31: corpus token frequencies (explode → groupBy) ------------------
  // The generator-op shape (1 doc → k token rows) followed by a shuffled
  // aggregation; top-100 tokens by frequency with deterministic tie-break.
  def q31TokenFreq(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(!isBlank)
      .select(col("doc_id"), toks(lower(col("text"))).as("toks"))
      .transform(graft.Tables.barrier(_, col("doc_id"))) // materialize the token array pre-explode
      .select(col("doc_id"), explode_outer(col("toks")).as("token"))
      .filter(col("token").isNotNull)
      .groupBy("token")
      .agg(count(lit(1)).as("freq"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(desc("freq"), asc("token"))
      .limit(100)

  val q31Sql: String =
    """SELECT token, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS n_docs
      |FROM (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
      |  FROM documents
      |  WHERE length(trim(text)) > 0) tok
      |GROUP BY token
      |ORDER BY freq DESC, token
      |LIMIT 100""".stripMargin

  // ---- q32: n-gram-heuristic language ID ----------------------------------
  // Scores each language by counts of characteristic function-word bigrams/
  // unigrams (regex hit counts are deterministic in both engines), then
  // argmax with a fixed preference order on ties.
  private def hits(pattern: String): Column =
    size(regexp_extract_all(concat(lit(" "), lower(col("text")), lit(" ")),
      lit(pattern), lit(0)))

  private[ops] val langScores: Seq[(String, String)] = Seq(
    "en" -> " (the|and|of|to|is) ",
    "de" -> " (der|die|das|und|ist) ",
    "fr" -> " (le|la|les|et|est) ",
    "es" -> " (el|los|las|y|es) ")

  def q32LangId(s: SparkSession, dir: String): DataFrame = {
    val scored = langScores.foldLeft(t(s, dir, "documents")) {
      case (df, (l, p)) => df.withColumn(s"score_$l", hits(p))
    }
    val best = langScores.map(_._1).foldLeft(lit(0)) { (acc, l) =>
      greatest(acc, col(s"score_$l"))
    }
    scored
      .withColumn("lang_pred",
        when(best === 0, lit("und"))
          .when(col("score_en") === best, lit("en"))
          .when(col("score_de") === best, lit("de"))
          .when(col("score_fr") === best, lit("fr"))
          .otherwise(lit("es")))
      .select(col("doc_id"), col("lang"), col("lang_pred"),
        col("score_en"), col("score_de"), col("score_fr"), col("score_es"),
        (col("lang") === col("lang_pred")).as("is_match"))
      .orderBy("doc_id")
  }

  val q32Sql: String = {
    def h(p: String) = s"CAST(length(regexp_extract_all(' ' || lower(text) || ' ', '$p')) AS INT)"
    val scores = langScores.map { case (l, p) => s"${h(p)} AS score_$l" }.mkString(",\n      |  ")
    s"""SELECT doc_id, lang, lang_pred, score_en, score_de, score_fr, score_es,
       |  lang = lang_pred AS is_match
       |FROM (
       |  SELECT doc_id, lang,
       |  $scores,
       |  CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
       |       WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
       |       WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
       |       WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
       |       ELSE 'es' END AS lang_pred
       |  FROM documents) scored
       |ORDER BY doc_id""".stripMargin
  }

  // ---- q33: document fingerprint + quality score --------------------------
  // Fingerprint = md5 of whitespace-normalized lowercase text (identical
  // bytes in both engines); quality = deterministic combination of length /
  // punctuation / token signals, rounded to a stable grid.
  def q33Fingerprint(s: SparkSession, dir: String): DataFrame = {
    val norm = lower(regexp_replace(trim(col("text")), "\\s+", " "))
    val nTok = when(isBlank, lit(0)).otherwise(size(toks(col("text"))))
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        md5(norm.cast("binary")).as("fingerprint"),
        nTok.as("n_tokens"),
        round(
          least(lit(1.0), col("n_chars") / lit(500.0)) * 0.5
            + least(lit(1.0), nTok.cast("double") / lit(100.0)) * 0.5, 4)
          .as("quality"))
      .orderBy("doc_id")
  }

  val q33Sql: String =
    """SELECT doc_id,
      |  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint,
      |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
      |       ELSE length(regexp_split_to_array(trim(text), '\s+')) END AS INT) AS n_tokens,
      |  round(least(CAST(1.0 AS DOUBLE), CAST(n_chars AS DOUBLE) / 500.0) * 0.5
      |        + least(CAST(1.0 AS DOUBLE), CAST(CASE WHEN length(trim(text)) = 0 THEN 0
      |              ELSE length(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) / 100.0) * 0.5, 4) AS quality
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- q46: token-window chunking (sequence packing) ----------------------
  // Each document splits into overlapping 64-token windows on a 48-token
  // stride — the chunk/pack step feeding a training tokenizer. A narrow
  // 1→k generator per doc (explode of the window starts); no shuffle at
  // all until the output sort. Chunk starts, slices, and joins behave
  // identically in DuckDB (generate_series / list slicing), so the op is
  // fully oracle-checked including chunk text.
  private val chunkLen = 64
  private val chunkStride = 48

  def q46ChunkDocuments(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(!isBlank)
      .select(col("doc_id"), toks(lower(col("text"))).as("ws"))
      .transform(graft.Tables.barrier(_, col("doc_id"))) // materialize the token array pre-explode
      .select(col("doc_id"), col("ws"),
        explode_outer(sequence(lit(1), size(col("ws")), lit(chunkStride))).as("start"))
      .filter(col("start").isNotNull)
      .select(
        col("doc_id"),
        ((col("start") - 1) / chunkStride).cast("int").as("chunk_id"),
        size(slice(col("ws"), col("start"), lit(chunkLen))).as("n_chunk_tokens"),
        concat_ws(" ", slice(col("ws"), col("start"), lit(chunkLen))).as("chunk_text"))
      .orderBy("doc_id", "chunk_id")

  val q46Sql: String =
    s"""SELECT doc_id,
       |  CAST((start - 1) / $chunkStride AS INT) AS chunk_id,
       |  CAST(length(ws[start : least(start + ${chunkLen - 1}, len(ws))]) AS INT) AS n_chunk_tokens,
       |  array_to_string(ws[start : least(start + ${chunkLen - 1}, len(ws))], ' ') AS chunk_text
       |FROM (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
       |  FROM documents WHERE length(trim(text)) > 0) d,
       |  unnest(generate_series(1, len(ws), $chunkStride)) AS u(start)
       |ORDER BY doc_id, chunk_id""".stripMargin

  // ---- q145: global sequence packing (concat-and-split block map) ---------
  // GPT-style pretraining packs the corpus as ONE token stream split into
  // fixed-size blocks: concatenate every non-blank document in doc_id
  // order, cut the stream every 128 tokens, and emit the (block, doc)
  // span map — which documents feed each training block, and with how
  // many tokens. q79 packs per SOURCE shard precisely to dodge the
  // global-stream problem; q145 solves the global stream itself — the
  // layout single-corpus training runs actually use. The hard part at
  // scale is the GLOBAL prefix sum of token counts: a single
  // `SUM OVER (ORDER BY doc_id)` window is a one-partition sort of the
  // whole corpus. Instead the offset is
  // computed in two phases — (1) per-shard token totals (a partial-agg
  // groupBy over |corpus|/64 shards, map-side combined), prefix-summed
  // with a window over that TINY relation (|shards| rows, not |corpus|);
  // (2) a broadcast join puts each shard's base offset back on the docs,
  // and the per-doc running sum windows PARTITIONED BY shard — every
  // shard's cumsum runs in parallel. Shards are doc_id div 64 (dense ids
  // here; range partitioning gives the same contiguous shards when ids
  // are sparse). The block explode is a narrow 1→k generator (k ≈ n/128
  // + 1, almost always 1). All integers end to end — fully oracled.
  private val packBlock = 128
  private val packShard = 64

  def q145PackBlocks(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .filter(!isBlank)
      .select(col("doc_id"), size(toks(lower(col("text")))).cast("long").as("n"),
        (col("doc_id") / packShard).cast("long").as("shard"))
    val shardBase = docs.groupBy("shard")
      .agg(sum("n").as("shard_tokens"))
      .withColumn("shard_base",
        coalesce(sum("shard_tokens").over(
          Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("shard", "shard_base")
    val offs = docs
      .join(broadcast(shardBase), "shard")
      .withColumn("intra",
        sum("n").over(Window.partitionBy("shard").orderBy("doc_id")))
      .withColumn("tok_start", col("shard_base") + col("intra") - col("n"))
    offs
      .select(col("doc_id"), col("n"), col("tok_start"),
        explode(sequence(
          expr(s"tok_start div $packBlock"),
          expr(s"(tok_start + n - 1) div $packBlock"))).as("block_id"))
      .select(
        col("block_id"),
        col("doc_id"),
        col("n").cast("int").as("n_tokens"),
        col("tok_start"),
        (least(col("tok_start") + col("n"), (col("block_id") + 1) * packBlock)
          - greatest(col("tok_start"), col("block_id") * packBlock))
          .cast("int").as("tok_in_block"))
      .orderBy("block_id", "doc_id")
  }

  val q145Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n
       |  FROM documents WHERE length(trim(text)) > 0),
       |o AS (
       |  SELECT doc_id, n,
       |    CAST(SUM(n) OVER (ORDER BY doc_id) - n AS BIGINT) AS tok_start
       |  FROM d)
       |SELECT CAST(u.b AS BIGINT) AS block_id, doc_id,
       |  CAST(n AS INT) AS n_tokens, tok_start,
       |  CAST(least(tok_start + n, (u.b + 1) * $packBlock)
       |       - greatest(tok_start, u.b * $packBlock) AS INT) AS tok_in_block
       |FROM o, unnest(generate_series(tok_start // $packBlock,
       |  (tok_start + n - 1) // $packBlock)) AS u(b)
       |ORDER BY block_id, doc_id""".stripMargin

  // ---- q37: deterministic hash sampling -----------------------------------
  // ~10% Bernoulli sample that is REPRODUCIBLE ACROSS ENGINES: keep rows
  // whose md5 of the primary key starts below 0x1a (26/256 ≈ 10.2%).
  // Unlike rand()-based TABLESAMPLE, the sample is a pure function of the
  // data — stable under reruns, partitioning, and engine — which is what
  // a training-data pipeline needs for resumable subset builds. Pushdown-
  // friendly: the predicate is a scan-level filter, no shuffle.
  def q37HashSample(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .filter(md5(concat(col("l_orderkey").cast("string"), lit("_"),
        col("l_linenumber").cast("string")).cast("binary")) < "1a")
      .orderBy("l_orderkey", "l_linenumber")

  val q37Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |WHERE md5(CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)) < '1a'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- q148: repetition-based quality filters, shuffle-free ---------------
  // The OTHER half of the Gopher repetition suite (Rae et al. 2021
  // §A1.1), complementing q78: q78 gates on top-WORD mass and distinct-
  // bigram fraction via two exploded, shuffled aggregations; q148 gates
  // on duplicate-word fraction, top-2-GRAM coverage, and duplicate-
  // 3-gram mass — and computes them with ZERO corpus shuffles. Every
  // metric is a per-row lambda over the token array (n-gram build,
  // array_sort, one linear run-scan via `aggregate` — equal grams are
  // adjacent after the sort, so top-gram count and duplicate mass fall
  // out of run lengths), so the op is embarrassingly parallel at any
  // corpus size where q78's shape pays two keyed shuffles. Metrics are
  // EXACT integer ppm (1e6-scaled integral division — cross-engine
  // hash-safe, per the no-rounded-doubles rule). The one exchange is the
  // doc_id repartition BARRIER that materializes the token array before
  // lambdas index it per element — without it CollapseProject re-inlines
  // the split() per n-gram (the q127 O(n²) trap). The DuckDB oracle
  // recomputes the same counts the orthodox way (unnest → GROUP BY), so
  // the lambda run-scan is checked against an independent formulation.
  private def ngrams(ws: Column, k: Int): Column =
    when(size(ws) >= k,
      transform(sequence(lit(0), size(ws) - k),
        i => concat_ws(" ", (1 to k).map(j => element_at(ws, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** (longest equal-run, total mass of runs longer than 1) over the sorted
    * gram array — one linear pass; equal grams are adjacent after sort.
    */
  private def runStats(grams: Column): Column = {
    val z = struct(lit("\u0000").as("prev"), lit(0L).as("run"),
      lit(0L).as("best"), lit(0L).as("dup"))
    aggregate(array_sort(grams), z,
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"),
          (acc("dup") + when(x =!= acc("prev") && acc("run") > 1L, acc("run"))
            .otherwise(0L)).as("dup"))
      },
      acc => struct(acc("best").as("best"),
        (acc("dup") + when(acc("run") > 1L, acc("run")).otherwise(0L)).as("dup")))
  }

  def q148RepetitionFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(!isBlank)
      .select(col("doc_id"), toks(lower(col("text"))).as("ws"))
      .transform(graft.Tables.barrier(_, col("doc_id"))) // materialize ws before per-element lambdas
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n"),
        size(array_distinct(col("ws"))).cast("long").as("nd"),
        runStats(ngrams(col("ws"), 2)).as("s2"),
        runStats(ngrams(col("ws"), 3)).as("s3"))
      .selectExpr(
        "doc_id",
        "CAST(n AS INT) AS n_tokens",
        "(1000000 * (n - nd)) div n AS dup_word_ppm",
        "CASE WHEN n >= 2 THEN (1000000 * s2.best) div (n - 1) ELSE 0L END AS top_2gram_ppm",
        "CASE WHEN n >= 3 THEN (1000000 * s3.dup) div (n - 2) ELSE 0L END AS dup_3gram_ppm")
      .withColumn("keep",
        col("dup_word_ppm") < 300000L && col("top_2gram_ppm") < 200000L
          && col("dup_3gram_ppm") < 300000L)
      .orderBy("doc_id")

  val q148Sql: String =
    """WITH d AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
      |  FROM documents WHERE length(trim(text)) > 0),
      |nn AS (
      |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n,
      |    CAST(len(list_distinct(ws)) AS BIGINT) AS nd
      |  FROM d),
      |g2 AS (
      |  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
      |  FROM d, unnest(generate_series(1, len(ws) - 1)) AS u(i)),
      |c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g),
      |a2 AS (SELECT doc_id, MAX(c) AS best2 FROM c2 GROUP BY doc_id),
      |g3 AS (
      |  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
      |  FROM d, unnest(generate_series(1, len(ws) - 2)) AS u(i)),
      |c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY doc_id, g),
      |a3 AS (
      |  SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup3
      |  FROM c3 GROUP BY doc_id)
      |SELECT nn.doc_id, CAST(nn.n AS INT) AS n_tokens,
      |  CAST((1000000 * (nn.n - nn.nd)) // nn.n AS BIGINT) AS dup_word_ppm,
      |  CAST(CASE WHEN nn.n >= 2
      |    THEN (1000000 * COALESCE(a2.best2, 0)) // (nn.n - 1)
      |    ELSE 0 END AS BIGINT) AS top_2gram_ppm,
      |  CAST(CASE WHEN nn.n >= 3
      |    THEN (1000000 * COALESCE(a3.dup3, 0)) // (nn.n - 2)
      |    ELSE 0 END AS BIGINT) AS dup_3gram_ppm,
      |  ((1000000 * (nn.n - nn.nd)) // nn.n < 300000
      |   AND CASE WHEN nn.n >= 2
      |     THEN (1000000 * COALESCE(a2.best2, 0)) // (nn.n - 1)
      |     ELSE 0 END < 200000
      |   AND CASE WHEN nn.n >= 3
      |     THEN (1000000 * COALESCE(a3.dup3, 0)) // (nn.n - 2)
      |     ELSE 0 END < 300000) AS keep
      |FROM nn
      |LEFT JOIN a2 USING (doc_id)
      |LEFT JOIN a3 USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ---- q153: BPE vocabulary learning (distributed merge loop) -------------
  // Byte-pair encoding (Sennrich et al. 2016) — the tokenizer-training
  // step of an LLM pipeline, as a DataFrame program. Classic BPE learns
  // on the WORD-FREQUENCY table, not the raw corpus: the one corpus-sized
  // step is the token groupBy (shuffled, partial-agged); the merge loop
  // then iterates on the vocab relation (31 rows here, millions on a real
  // corpus — still distributed). Per round: adjacent symbol pairs via a
  // narrow 1→k lambda explode, one partial-agged groupBy(l, r) weighted
  // by word frequency, arg-max collected to the driver as ONE row (the
  // q54 centroid-literal pattern — merges are inherently sequential), and
  // the merge applied vocab-wide as a GREEDY left-to-right symbol walk
  // (subword-nmt's i+=2 rule: a match emits l+r and the walk resumes
  // AFTER the merged token) — an `aggregate` lambda over the symbol
  // array, NOT a string replace: a single non-overlapping replace of
  // ' l r ' misses every second occurrence of back-to-back pairs (the
  // two matches in ' a b a b ' share a boundary space), silently
  // mis-merging runs like 'abab' or 'aaaa'. Ties break (count desc,
  // left, right) — deterministic, so the DuckDB twin UNROLLS all 12
  // rounds with the SAME greedy walk (list_reduce over a '#'-encoded
  // (emitted, pending) state) and the merge table matches exactly.
  // Per-round localCheckpoint truncates the 12-deep walk lineage.
  /** Greedy left-to-right application of ONE learned merge (l, r) over a
    * symbol array, as a SQL `aggregate` lambda: state = (emitted tokens,
    * pending symbol); a match emits l+r and clears the pending slot so the
    * merged token is never reconsidered in this pass (subword-nmt's i+=2
    * walk). `l`/`r` are [a-z0-9]+ runs — safe to inline as SQL literals.
    */
  private[graft] def greedyMergeArr(arr: String, l: String, r: String): String =
    s"aggregate($arr, " +
      "named_struct('out', cast(array() as array<string>), 'pend', ''), " +
      "(acc, x) -> CASE " +
      "WHEN acc.pend = '' THEN named_struct('out', acc.out, 'pend', x) " +
      s"WHEN acc.pend = '$l' AND x = '$r' " +
      s"THEN named_struct('out', array_append(acc.out, '$l$r'), 'pend', '') " +
      "ELSE named_struct('out', array_append(acc.out, acc.pend), 'pend', x) END, " +
      "acc -> CASE WHEN acc.pend = '' THEN acc.out " +
      "ELSE array_append(acc.out, acc.pend) END)"

  /** DuckDB twin of [[greedyMergeArr]]: list_reduce has no initial-value
    * form, so the running (emitted, pending) state rides in ONE VARCHAR as
    * `emitted || '#' || pending` — a raw first element (no '#') reads as
    * "nothing emitted, first symbol pending", and '#' cannot collide with
    * the [a-z0-9|]+ symbol alphabet. `l`/`r` must be COLUMN references
    * (DuckDB lambdas capture outer columns but reject subqueries).
    */
  private def duckGreedyEnc(ls: String, l: String, r: String): String =
    s"list_reduce($ls, (acc, x) -> CASE " +
      "WHEN strpos(acc, '#') = 0 THEN " +
      s"CASE WHEN acc = $l AND x = $r THEN ' ' || $l || $r || '#' " +
      "ELSE ' ' || acc || '#' || x END " +
      "ELSE CASE WHEN split_part(acc, '#', 2) = '' THEN acc || x " +
      s"WHEN split_part(acc, '#', 2) = $l AND x = $r " +
      s"THEN split_part(acc, '#', 1) || ' ' || $l || $r || '#' " +
      "ELSE split_part(acc, '#', 1) || ' ' || split_part(acc, '#', 2) || '#' || x END END)"

  /** Decode of the '#'-encoded walk state in a column named `enc`. */
  private val duckGreedyDecode: String =
    "CASE WHEN strpos(enc, '#') = 0 THEN enc " +
      "ELSE trim(split_part(enc, '#', 1) || ' ' || split_part(enc, '#', 2)) END"

  private val bpeRounds = 12

  def q153BpeMerges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    var words = t(s, dir, "documents")
      .filter(!isBlank)
      .select(explode(toks(lower(col("text")))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        trim(regexp_replace(col("word"), "(.)", "$1 ")).as("sym"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.Buffer[(Int, String, String, String, Long)]()
    for (k <- 1 to bpeRounds) {
      val best = words
        .select(col("freq"), split(col("sym"), " ").as("sarr"))
        .filter(size(col("sarr")) >= 2) // sequence(1,0) would run DESCENDING
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(sarr) - 1)," +
            " i -> struct(element_at(sarr, i) AS l, element_at(sarr, i + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect().head
      val (l, r, cnt) = (best.getString(0), best.getString(1), best.getLong(2))
      merges += ((k, l, r, l + r, cnt))
      words = words.select(col("freq"),
        expr(s"array_join(${greedyMergeArr("split(sym, ' ')", l, r)}, ' ')").as("sym"))
        .localCheckpoint(true)
    }
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
      .orderBy("merge_rank")
  }

  val q153Sql: String = {
    val rounds = (1 to bpeRounds).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT l, r, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, s[i] AS l, s[i+1] AS r FROM (
         |      SELECT freq, string_split(sym, ' ') AS s FROM w${k - 1}) x,
         |      unnest(generate_series(1, len(s) - 1)) AS u(i)) y
         |  GROUP BY l, r),
         |b$k AS MATERIALIZED (SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
         |w$k AS MATERIALIZED (
         |  SELECT freq, $duckGreedyDecode AS sym FROM (
         |    SELECT freq, ${duckGreedyEnc("string_split(sym, ' ')", "b.l", "b.r")} AS enc
         |    FROM w${k - 1}, b$k b) e)""".stripMargin
    }.mkString(",\n")
    val sel = (1 to bpeRounds).map(k =>
      s"SELECT $k AS merge_rank, l AS lhs, r AS rhs, l || r AS merged, cnt AS pair_count FROM b$k")
      .mkString("\nUNION ALL ")
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS freq,
       |    trim(regexp_replace(tok, '(.)', '\\1 ', 'g')) AS sym
       |  FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
       |        FROM documents WHERE length(trim(text)) > 0) t
       |  GROUP BY tok),
       |$rounds
       |SELECT * FROM ($sel) ORDER BY merge_rank""".stripMargin
  }

  // ---- q154: BPE encode (apply the learned vocabulary) --------------------
  // The other half of the tokenizer: q153 TRAINS the merge table, q154
  // ENCODES the corpus with it and reports per-document compression. A
  // document becomes one symbol array with '|' as the word boundary
  // (corpus is [a-z0-9 ] — checked — so '|' can never collide with a
  // symbol, and no learned pair spans it); applying the 12 merges in rank
  // order is 12 chained greedy walks (the q153 `aggregate` lambda — same
  // i+=2 semantics as training, so back-to-back pair runs merge the way
  // the learned table expects) — a NARROW map over the corpus,
  // embarrassingly parallel, no shuffle. The merges come from the
  // memoized q153 result (one train per session). The oracle cannot
  // hardcode learned merges (they are data-dependent), so it RECOMPUTES
  // them via the q153 CTE chain and walks them through a chain of
  // per-merge CTE stages that CROSS JOIN the one-row b$k relations —
  // DuckDB lambdas capture those columns but reject subqueries — keeping
  // the SQL text data-independent while the applied vocabulary always
  // matches the input.
  private val bpeMergeCache = new graft.SessionCache[Seq[(String, String)]]()
  private def bpeMergesMemo(s: SparkSession, dir: String): Seq[(String, String)] =
    bpeMergeCache.getOrCompute(s, dir)(
      q153BpeMerges(s, dir).collect().toSeq.map(r => (r.getString(1), r.getString(2))))

  def q154BpeEncode(s: SparkSession, dir: String): DataFrame = {
    val merges = bpeMergesMemo(s, dir)
    val arrExpr = merges.foldLeft(
      "split(trim(regexp_replace(regexp_replace(trim(lower(text)), '\\\\s+', '|')," +
        " '(.)', '$1 ')), ' ')") {
      case (acc, (l, r)) => greedyMergeArr(acc, l, r)
    }
    t(s, dir, "documents")
      .filter(!isBlank)
      .select(col("doc_id"), toks(lower(col("text"))).as("ws"),
        expr(s"filter($arrExpr, x -> x != '|')").as("bpe"))
      .select(col("doc_id"),
        size(col("ws")).cast("int").as("n_ws_tokens"),
        size(col("bpe")).cast("int").as("n_bpe_tokens"),
        expr("(size(bpe) * 1000000L) div size(ws)").as("compression_ppm"))
      .orderBy("doc_id")
  }

  val q154Sql: String = {
    val base =
      "trim(regexp_replace(regexp_replace(trim(lower(text)), '\\s+', '|', 'g'), '(.)', '\\1 ', 'g'))"
    val stages = (1 to bpeRounds).map { k =>
      s"""enc$k AS (
         |  SELECT doc_id, n_ws,
         |    ${duckGreedyEnc("string_split(sym, ' ')", s"b$k.l", s"b$k.r")} AS enc
         |  FROM e${k - 1}, b$k),
         |e$k AS (SELECT doc_id, n_ws, $duckGreedyDecode AS sym FROM enc$k)""".stripMargin
    }.mkString(",\n")
    val trainCtes = q153Sql.substring("WITH ".length, q153Sql.indexOf("\nSELECT * FROM"))
    s"""WITH $trainCtes,
       |e0 AS (
       |  SELECT doc_id,
       |    CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_ws,
       |    $base AS sym
       |  FROM documents WHERE length(trim(text)) > 0),
       |$stages
       |SELECT doc_id, n_ws AS n_ws_tokens,
       |  CAST(len(list_filter(string_split(sym, ' '), x -> x <> '|')) AS INT)
       |    AS n_bpe_tokens,
       |  (CAST(len(list_filter(string_split(sym, ' '), x -> x <> '|')) AS BIGINT)
       |   * 1000000) // CAST(n_ws AS BIGINT) AS compression_ppm
       |FROM e$bpeRounds
       |ORDER BY doc_id""".stripMargin
  }

  // ---- q156: deterministic epoch shuffle of training blocks ---------------
  // The data-loader step after q145's packing: each training epoch reads
  // the blocks in a different REPRODUCIBLE pseudo-random order (md5 of
  // epoch:block — a pure function of the data, the q37 discipline, so
  // any worker can recompute its read order with no coordination or
  // stored permutation). Emitting explicit positions for a global
  // permutation is the same scale problem as q145's global offsets — a
  // naive `row_number() OVER (ORDER BY h)` is a one-partition sort of
  // every block — so positions come from the same two-phase pattern:
  // bucket by the first two hex chars of the hash (256 ordered buckets),
  // count per bucket (tiny), prefix-sum the bucket bases, broadcast them
  // back, and rank WITHIN buckets in parallel. Bucket-prefix order equals
  // full-hash order, so positions are exactly the global permutation's.
  private val shuffleEpochs = 2

  def q156EpochShuffle(s: SparkSession, dir: String): DataFrame = {
    val blocks = q145PackBlocks(s, dir)
      .groupBy("block_id").agg(count(lit(1)).as("n_docs"))
    val perEpoch = (1 to shuffleEpochs).map { e =>
      val b = blocks
        .withColumn("h", md5(concat(lit(s"$e:"), col("block_id").cast("string"))
          .cast("binary")))
        .withColumn("bkt", expr("conv(substring(h, 1, 2), 16, 10)").cast("long"))
      val base = b.groupBy("bkt").agg(count(lit(1)).as("n"))
        .withColumn("base",
          coalesce(sum("n").over(
            Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
        .select("bkt", "base")
      b.join(broadcast(base), "bkt")
        .withColumn("pos",
          col("base") + row_number().over(
            Window.partitionBy("bkt").orderBy("h", "block_id")))
        .select(lit(e).as("epoch"), col("pos"), col("block_id"), col("n_docs"))
    }
    perEpoch.reduce(_.union(_)).orderBy("epoch", "pos")
  }

  val q156Sql: String =
    s"""WITH blocks AS (
       |  SELECT block_id, COUNT(*) AS n_docs
       |  FROM ($q145Sql) span GROUP BY block_id)
       |SELECT e AS epoch,
       |  CAST(row_number() OVER (PARTITION BY e
       |    ORDER BY md5(CAST(e AS VARCHAR) || ':' || CAST(block_id AS VARCHAR)),
       |      block_id) AS BIGINT) AS pos,
       |  block_id, n_docs
       |FROM blocks CROSS JOIN (VALUES (1), (2)) ep(e)
       |ORDER BY epoch, pos""".stripMargin

  // -------------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_text_stats" -> q30TextStats _,
    "q31_token_freq" -> q31TokenFreq _,
    "q32_lang_id" -> q32LangId _,
    "q33_fingerprint" -> q33Fingerprint _,
    "q37_hash_sample" -> q37HashSample _,
    "q46_chunk_documents" -> q46ChunkDocuments _,
    "q145_pack_blocks" -> q145PackBlocks _,
    "q148_repetition_filter" -> q148RepetitionFilter _,
    "q153_bpe_merges" -> q153BpeMerges _,
    "q154_bpe_encode" -> q154BpeEncode _,
    "q156_epoch_shuffle" -> q156EpochShuffle _,
  )

  val oracle: Map[String, String] = Map(
    "q30_text_stats" -> q30Sql,
    "q31_token_freq" -> q31Sql,
    "q32_lang_id" -> q32Sql,
    "q33_fingerprint" -> q33Sql,
    "q37_hash_sample" -> q37Sql,
    "q46_chunk_documents" -> q46Sql,
    "q145_pack_blocks" -> q145Sql,
    "q148_repetition_filter" -> q148Sql,
    "q153_bpe_merges" -> q153Sql,
    "q154_bpe_encode" -> q154Sql,
    "q156_epoch_shuffle" -> q156Sql,
  )
}
