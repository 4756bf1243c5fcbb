package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** The end-to-end corpus curation pipeline — the flagship composition of
  * the training-data operators: quality gate → language gate → exact
  * dedup → near-dup cluster representative selection, emitting the
  * curated document manifest.
  *
  * Policy (deliberately explicit, since a curation query is only as good
  * as its stated policy):
  *  1. quality ≥ 0.5 and ≥ 10 tokens (q33's deterministic quality score);
  *  2. predicted language must be identifiable (q32's n-gram ID ≠ 'und');
  *  3. exact duplicates collapse to the minimum doc_id per normalized
  *     fingerprint;
  *  4. near-duplicate clusters (q41 pairs → q44 connected components,
  *     computed corpus-wide) keep only their representative (minimum
  *     doc_id); a doc whose representative was itself filtered earlier
  *     drops with it — representative-only policy.
  *
  * Every stage is deterministic, so the WHOLE pipeline is DuckDB-oracled
  * end to end. Scale shape: narrow per-doc scoring, one groupBy per dedup
  * stage (map-side partial agg), the pair/cluster machinery bounded by
  * q41's stop-shingle pruning, and no driver-side loops outside the
  * O(log n) connected-components rounds.
  */
object Curation {

  def q45CurateCorpus(s: SparkSession, dir: String): DataFrame = {
    import TextOps.{isBlank, langScores, toks}
    val docs = t(s, dir, "documents")
    val norm = lower(regexp_replace(trim(col("text")), "\\s+", " "))
    val nTok = when(isBlank, lit(0)).otherwise(size(toks(col("text"))))
    val scored = langScores.foldLeft(docs) { case (df, (l, p)) =>
      df.withColumn(s"score_$l",
        size(regexp_extract_all(concat(lit(" "), lower(col("text")), lit(" ")),
          lit(p), lit(0))))
    }
    val best = langScores.map(_._1).foldLeft(lit(0)) { (acc, l) =>
      greatest(acc, col(s"score_$l"))
    }
    val feat = scored.select(
      col("doc_id"),
      md5(norm.cast("binary")).as("fingerprint"),
      nTok.as("n_tokens"),
      round(
        least(lit(1.0), col("n_chars") / lit(500.0)) * 0.5
          + least(lit(1.0), nTok.cast("double") / lit(100.0)) * 0.5, 4)
        .as("quality"),
      when(best === 0, lit("und"))
        .when(col("score_en") === best, lit("en"))
        .when(col("score_de") === best, lit("de"))
        .when(col("score_fr") === best, lit("fr"))
        .otherwise(lit("es")).as("lang_pred"))
    val gated = feat.filter(
      col("quality") >= 0.5 && col("n_tokens") >= 10 && col("lang_pred") =!= "und")
    // exact dedup: min doc_id per fingerprint via groupBy (partial agg) +
    // semi join — not a window over the fingerprint partitioning
    val fpKeep = gated.groupBy("fingerprint").agg(min(col("doc_id")).as("doc_id"))
    val exact = gated.join(fpKeep, Seq("fingerprint", "doc_id"), "left_semi")
    // near-dup representatives from the corpus-wide cluster assignment
    val clusters = Dedup.q44DedupClusters(s, dir)
    exact.join(clusters, Seq("doc_id"), "left_outer")
      .filter(col("keep_id").isNull || col("keep_id") === col("doc_id"))
      .select("doc_id", "lang_pred", "n_tokens", "quality", "fingerprint")
      .orderBy("doc_id")
  }

  /** Oracle twin: the identical policy as one SQL statement, composing the
    * q32/q33 feature expressions with the q44 recursive-CTE closure.
    */
  val q45Sql: String = {
    def h(p: String) =
      s"CAST(length(regexp_extract_all(' ' || lower(text) || ' ', '$p')) AS INT)"
    val scores = TextOps.langScores.map { case (l, p) => s"${h(p)} AS score_$l" }
      .mkString(",\n      |    ".stripMargin)
    s"""WITH RECURSIVE ${Dedup.pairBaseCtes},
       |jp AS (
       |  SELECT id_a, id_b FROM pairs
       |  JOIN sizes sa ON sa.doc_id = id_a
       |  JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.8),
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM jp
       |  UNION SELECT id_b, id_a FROM jp),
       |reach(u, r) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) n
       |  UNION
       |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u),
       |keep AS (SELECT u AS doc_id, MIN(r) AS keep_id FROM reach GROUP BY u),
       |feat AS (
       |  SELECT doc_id,
       |    md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
       |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS INT) AS n_tokens,
       |    round(least(CAST(1.0 AS DOUBLE), CAST(n_chars AS DOUBLE) / 500.0) * 0.5
       |          + least(CAST(1.0 AS DOUBLE), CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |                ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS DOUBLE) / 100.0) * 0.5, 4) AS quality,
       |    CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
       |         WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
       |         WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
       |         WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
       |         ELSE 'es' END AS lang_pred
       |  FROM (
       |    SELECT doc_id, text, n_chars,
       |    $scores
       |    FROM documents) scored),
       |gated AS (
       |  SELECT * FROM feat
       |  WHERE quality >= 0.5 AND n_tokens >= 10 AND lang_pred <> 'und'),
       |exact AS (
       |  SELECT * FROM (
       |    SELECT *, MIN(doc_id) OVER (PARTITION BY fingerprint) AS fp_keep
       |    FROM gated) x
       |  WHERE doc_id = fp_keep)
       |SELECT e.doc_id, e.lang_pred, e.n_tokens, e.quality, e.fingerprint
       |FROM exact e LEFT JOIN keep k ON k.doc_id = e.doc_id
       |WHERE k.doc_id IS NULL OR k.keep_id = e.doc_id
       |ORDER BY e.doc_id""".stripMargin
  }

  // ---- q93: the FULL modern curation recipe -------------------------------
  // q45 plus the round-5 LLM-pipeline gates, in the order a production
  // corpus build applies them:
  //  1. substance gate: ≥ 10 tokens, identifiable language (q32/q45);
  //  2. repetition quality gate (q78's integer-exact Gopher rules);
  //  3. benchmark decontamination: eval docs (doc_id % 97 == 0) are
  //     excluded outright, and training docs sharing ≥ 5% of their
  //     shingles with the eval set are dropped (q77);
  //  4. exact dedup: min doc_id per normalized fingerprint;
  //  5. near-dup clusters keep only their representative (q41→q44).
  // Every stage is integer/string-deterministic, so the whole composed
  // pipeline is one DuckDB-oracled statement. Scale shape: the gates are
  // narrow maps or partial-agged joins reusing the SAME memoized cluster
  // build as q44/q45; no stage adds a shuffle beyond its operator's own.
  def q93FullCuration(s: SparkSession, dir: String): DataFrame = {
    import TextOps.{isBlank, langScores, toks}
    val docs = t(s, dir, "documents")
    val norm = lower(regexp_replace(trim(col("text")), "\\s+", " "))
    val nTok = when(isBlank, lit(0)).otherwise(size(toks(col("text"))))
    val scored = langScores.foldLeft(docs) { case (df, (l, p)) =>
      df.withColumn(s"score_$l",
        size(regexp_extract_all(concat(lit(" "), lower(col("text")), lit(" ")),
          lit(p), lit(0))))
    }
    val best = langScores.map(_._1).foldLeft(lit(0)) { (acc, l) =>
      greatest(acc, col(s"score_$l"))
    }
    val feat = scored.select(
      col("doc_id"),
      md5(norm.cast("binary")).as("fingerprint"),
      nTok.as("n_tokens"),
      when(best === 0, lit("und"))
        .when(col("score_en") === best, lit("en"))
        .when(col("score_de") === best, lit("de"))
        .when(col("score_fr") === best, lit("fr"))
        .otherwise(lit("es")).as("lang_pred"))
    val repKeep = Pipeline.q78RepetitionQuality(s, dir)
      .filter(col("keep")).select("doc_id")
    val contaminated = Pipeline.q77Decontaminate(s, dir).select("doc_id")
    val gated = feat
      .filter(col("n_tokens") >= 10 && col("lang_pred") =!= "und"
        && col("doc_id") % 97 =!= 0)
      .join(repKeep, Seq("doc_id"), "left_semi")
      .join(contaminated, Seq("doc_id"), "left_anti")
    val fpKeep = gated.groupBy("fingerprint").agg(min(col("doc_id")).as("doc_id"))
    val exact = gated.join(fpKeep, Seq("fingerprint", "doc_id"), "left_semi")
    exact.join(Dedup.q44DedupClusters(s, dir), Seq("doc_id"), "left_outer")
      .filter(col("keep_id").isNull || col("keep_id") === col("doc_id"))
      .select("doc_id", "lang_pred", "n_tokens", "fingerprint")
      .orderBy("doc_id")
  }

  /** Oracle twin: the identical five-stage policy as ONE SQL statement,
    * composing the q77/q78 CTEs with q45's feature block and the q44
    * recursive-CTE closure.
    */
  val q93Sql: String = {
    def h(p: String) =
      s"CAST(length(regexp_extract_all(' ' || lower(text) || ' ', '$p')) AS INT)"
    val scores = TextOps.langScores.map { case (l, p) => s"${h(p)} AS score_$l" }
      .mkString(",\n      |    ".stripMargin)
    s"""WITH RECURSIVE ${Dedup.pairBaseCtes},
       |jp AS (
       |  SELECT id_a, id_b FROM pairs
       |  JOIN sizes sa ON sa.doc_id = id_a
       |  JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.8),
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM jp
       |  UNION SELECT id_b, id_a FROM jp),
       |reach(u, r) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) n
       |  UNION
       |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u),
       |keep AS (SELECT u AS doc_id, MIN(r) AS keep_id FROM reach GROUP BY u),
       |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
       |contaminated AS (
       |  SELECT c.doc_id FROM (
       |    SELECT sh.doc_id, COUNT(*) AS n_shared
       |    FROM sh JOIN ev USING (shingle)
       |    WHERE sh.doc_id % 97 <> 0
       |    GROUP BY sh.doc_id) c
       |  JOIN sizes s ON s.doc_id = c.doc_id
       |  WHERE c.n_shared * 20 >= s.n),
       |d AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
       |  FROM documents WHERE length(trim(text)) > 0),
       |words AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
       |    CAST(MAX(c) AS BIGINT) AS top_word_n
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
       |,repkeep AS (
       |  SELECT words.doc_id
       |  FROM words JOIN bg ON words.doc_id = bg.doc_id
       |  WHERE top_word_n * 5 <= n_words
       |    AND (n_bigrams - n_distinct_bigrams) * 5 <= n_bigrams * 2),
       |feat AS (
       |  SELECT doc_id,
       |    md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
       |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS INT) AS n_tokens,
       |    CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
       |         WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
       |         WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
       |         WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
       |         ELSE 'es' END AS lang_pred
       |  FROM (
       |    SELECT doc_id, text, n_chars,
       |    $scores
       |    FROM documents) scored),
       |gated AS (
       |  SELECT * FROM feat
       |  WHERE n_tokens >= 10 AND lang_pred <> 'und' AND doc_id % 97 <> 0
       |    AND doc_id IN (SELECT doc_id FROM repkeep)
       |    AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
       |exact AS (
       |  SELECT * FROM (
       |    SELECT *, MIN(doc_id) OVER (PARTITION BY fingerprint) AS fp_keep
       |    FROM gated) x
       |  WHERE doc_id = fp_keep)
       |SELECT e.doc_id, e.lang_pred, e.n_tokens, e.fingerprint
       |FROM exact e LEFT JOIN keep k ON k.doc_id = e.doc_id
       |WHERE k.doc_id IS NULL OR k.keep_id = e.doc_id
       |ORDER BY e.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_curate_corpus" -> q45CurateCorpus _,
    "q93_full_curation" -> q93FullCuration _,
  )

  val oracle: Map[String, String] = Map(
    "q45_curate_corpus" -> q45Sql,
    "q93_full_curation" -> q93Sql,
  )
}
