package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines, over the
 * `documents` table. All scoring uses integer / fixed-point arithmetic
 * (basis points via exact integer division) so results are bit-identical
 * between Spark and the DuckDB oracle at any parallelism.
 */
object TextOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** md5-derived 60-bit integer hash — identical in Spark and DuckDB. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
  def md5LongSql(e: String): String =
    s"CAST(CAST('0x' || substr(md5($e), 1, 15) AS UBIGINT) AS BIGINT)"

  val stopwords: Seq[String] = Seq("the", "a", "an", "of", "to", "in", "and", "is")
  private def stopwordsSqlList = stopwords.map(w => s"'$w'").mkString(", ")

  /** Token counting: whitespace tokens, regex word tokens, distinct tokens. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).cast("long").as("re_tokens"),
      size(array_distinct(split(col("text"), " "))).cast("long").as("distinct_tokens"))
      .orderBy("doc_id")

  val tokenCountSql: String =
    """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS re_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS distinct_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /**
   * Quality scoring: length, mean word length, stopword ratio, repetition
   * (distinct/total tokens) — all in basis points. A composite `quality_bp`
   * mirrors heuristic quality filters used on web-scale corpora.
   */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    docs(spark, dir)
      .withColumn("n_tok", size(toks).cast("long"))
      .withColumn("n_stop", size(filter(toks, t => t.isin(stopwords: _*))).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
      .select(
        col("doc_id"), col("n_chars"), col("n_tok"),
        expr("(n_chars * 100) div n_tok").as("mean_wordlen_cp"),
        expr("(n_stop * 10000) div n_tok").as("stop_bp"),
        expr("(n_distinct * 10000) div n_tok").as("distinct_bp"),
        expr("((n_distinct * 10000) div n_tok + (n_stop * 10000) div n_tok) div 2")
          .as("quality_bp"))
      .orderBy("doc_id")
  }

  val qualityScoreSql: String =
    s"""SELECT doc_id, n_chars, n_tok, (n_chars * 100) // n_tok AS mean_wordlen_cp,
       |  (n_stop * 10000) // n_tok AS stop_bp,
       |  (n_distinct * 10000) // n_tok AS distinct_bp,
       |  ((n_distinct * 10000) // n_tok + (n_stop * 10000) // n_tok) // 2 AS quality_bp
       |FROM (
       |  SELECT doc_id, n_chars,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stopwordsSqlList))) AS BIGINT) AS n_stop,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
       |  FROM documents) ORDER BY doc_id""".stripMargin

  /**
   * Language ID by marker-token voting (n-gram/stopword heuristic): count
   * marker hits per language, argmax with deterministic tie-break on
   * language name. (The corpus is synthetic; the point is the operator —
   * the oracle agrees with the engine by construction, not with `lang`.)
   */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist", "zu"),
    "es" -> Seq("el", "la", "de", "y", "es", "que"),
    "fr" -> Seq("le", "la", "et", "est", "que", "des"))

  def langId(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val scores = langMarkers.map { case (lg, ms) =>
      size(filter(toks, t => t.isin(ms: _*))).cast("long").as(s"score_$lg")
    }
    val d = docs(spark, dir).select((col("doc_id") +: scores): _*)
    val best = greatest(langMarkers.map { case (lg, _) => col(s"score_$lg") }: _*)
    // argmax with alphabetical tie-break (first match wins)
    val sortedLangs = langMarkers.map(_._1).sorted
    val pred = sortedLangs.init.foldRight(lit(sortedLangs.last)) { (lg, els) =>
      when(col(s"score_$lg") === col("best"), lit(lg)).otherwise(els)
    }
    d.withColumn("best", best)
      .select(col("doc_id"), pred.as("pred_lang"), col("best").as("best_score"))
      .orderBy("doc_id")
  }

  val langIdSql: String = {
    val scoreExprs = langMarkers.map { case (lg, ms) =>
      val list = ms.map(m => s"'$m'").mkString(", ")
      s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ($list))) AS BIGINT) AS score_$lg"
    }.mkString(",\n    ")
    val sortedLangs = langMarkers.map(_._1).sorted
    val bestExpr = "greatest(" + langMarkers.map { case (lg, _) => s"score_$lg" }.mkString(", ") + ")"
    val predExpr = "CASE " + sortedLangs.init.map(lg =>
      s"WHEN score_$lg = best THEN '$lg'").mkString(" ") +
      s" ELSE '${sortedLangs.last}' END"
    s"""SELECT doc_id, $predExpr AS pred_lang, best AS best_score
       |FROM (
       |  SELECT *, $bestExpr AS best FROM (
       |    SELECT doc_id, $scoreExprs FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  /**
   * Document fingerprinting (winnowing-style): min and max md5-hash over
   * 5-word shingles — a stable content fingerprint robust to local edits.
   */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    // spread: the per-row work (shingle + md5 per gram) is the md5-heavy
    // profile the input-size-adaptive redistribution was measured to help
    Tables.read(spark, dir, "documents", spread = true)
      .select(col("doc_id"), explode(Shingles.grams(col("text"), 5)).as("g"))
      // hash ONCE per gram in a projection; min and max aggregate the same
      // column (feeding md5Long(g) to both aggregates evaluated the md5
      // twice per row — the dominant per-row cost of this query)
      .select(col("doc_id"), md5Long(col("g")).as("h"))
      .groupBy(col("doc_id"))
      .agg(min(col("h")).as("fp_min"),
        max(col("h")).as("fp_max"),
        count(lit(1)).as("n_shingles"))
      .orderBy("doc_id")
  }

  val fingerprintSql: String =
    s"""SELECT doc_id, min(${md5LongSql("g")}) AS fp_min, max(${md5LongSql("g")}) AS fp_max,
       |  count(*) AS n_shingles
       |FROM (
       |  SELECT doc_id, unnest(${Shingles.gramsSql("text", 5)}) AS g
       |  FROM documents)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** ONE-SCAN fusion of the quality and lang-id gates for the pipeline
    * composition: both are pure per-row projections over `text`, so
    * computing them in a single select replaces the old
    * quality.join(lang, "doc_id") — two scans of `documents`, the
    * tokenize/split work done twice, plus a join exchange — with zero
    * joins. The expressions are the SAME ones [[qualityScore]] and
    * [[langId]] use, so the values are identical by construction (and the
    * composition's DuckDB oracle still computes the two gates as separate
    * relational subqueries). */
  private[ops] def qualityLang(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val scores = langMarkers.map { case (lg, ms) =>
      size(filter(toks, t => t.isin(ms: _*))).cast("long").as(s"score_$lg")
    }
    val sortedLangs = langMarkers.map(_._1).sorted
    val pred = sortedLangs.init.foldRight(lit(sortedLangs.last)) { (lg, els) =>
      when(col(s"score_$lg") === col("best"), lit(lg)).otherwise(els)
    }
    docs(spark, dir)
      .withColumn("n_tok", size(toks).cast("long"))
      .withColumn("n_stop", size(filter(toks, t => t.isin(stopwords: _*))).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
      .select((Seq(col("doc_id"), col("n_tok"),
        expr("((n_distinct * 10000) div n_tok + (n_stop * 10000) div n_tok) div 2")
          .as("quality_bp")) ++ scores): _*)
      .withColumn("best", greatest(langMarkers.map { case (lg, _) => col(s"score_$lg") }: _*))
      .select(col("doc_id"), col("n_tok"), col("quality_bp"), pred.as("pred_lang"))
  }

  /**
   * Vocabulary building: global token frequencies, top-50 with a
   * deterministic (count DESC, token ASC) tie-break. The corpus-wide
   * explode + count is two-phase (map-side combine absorbs the token
   * skew — 'the' collapses to one row per task before the shuffle) and
   * the top-k is a TakeOrdered, never a global sort.
   */
  def vocabTopK(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(50)

  val vocabTopKSql: String =
    """SELECT token, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |WHERE token <> ''
      |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "text_token_count" -> (tokenCount _, tokenCountSql),
    "text_quality_score" -> (qualityScore _, qualityScoreSql),
    "text_lang_id" -> (langId _, langIdSql),
    "text_fingerprint" -> (fingerprint _, fingerprintSql),
    "text_vocab_topk" -> (vocabTopK _, vocabTopKSql))
}
