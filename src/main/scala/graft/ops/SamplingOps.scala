package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import TextOps.{md5Long, md5LongSql}

/**
 * Deterministic sampling and corpus-mixing operators — the selection steps
 * of a training-data pipeline. Everything is a pure function of the data
 * (hash-derived, never RNG-state-dependent), so samples are reproducible
 * across engines, reruns, partitionings, and cluster sizes — the property
 * that makes a 100 TB sample auditable.
 */
object SamplingOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Bernoulli rate in basis points for [[sampleHash]]. */
  val SampleBp = 2000 // 20%

  /**
   * Deterministic Bernoulli sample: include a doc iff
   * md5(doc_id) mod 10000 < rate_bp. Embarrassingly parallel (no shuffle
   * beyond the output sort), stable under repartitioning, and composable —
   * disjoint rate bands give disjoint samples for train/validation splits.
   */
  def sampleHash(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("h_bp", pmod(md5Long(col("doc_id").cast("string")), lit(10000L)))
      .filter(col("h_bp") < SampleBp)
      .select(col("doc_id"), col("lang"), col("h_bp"))
      .orderBy("doc_id")

  val sampleHashSql: String =
    s"""SELECT doc_id, lang, ${md5LongSql("CAST(doc_id AS VARCHAR)")} % 10000 AS h_bp
       |FROM documents
       |WHERE ${md5LongSql("CAST(doc_id AS VARCHAR)")} % 10000 < $SampleBp
       |ORDER BY doc_id""".stripMargin

  /** Per-language quota for [[mixStratified]]. */
  val PerLangK = 40

  /**
   * Stratified corpus mix: the K highest-quality documents per language
   * (deterministic tie-break on doc_id) — the "balance languages, keep the
   * best" selection. Scale shape: rank-within-group gets Spark's map-side
   * WindowGroupLimit, so each map task forwards at most K rows per language
   * before the shuffle — never a full per-group sort of 10^10 rows.
   */
  def mixStratified(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val scored = docs(spark, dir)
      .withColumn("n_tok", size(toks).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
      .withColumn("distinct_bp", expr("(n_distinct * 10000) div n_tok"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("distinct_bp").desc, col("doc_id").asc)
    scored
      // cast: Spark row_number is int32, DuckDB's is int64 — dtype parity
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= PerLangK)
      .select(col("lang"), col("rank"), col("doc_id"), col("distinct_bp"))
      .orderBy("lang", "rank")
  }

  val mixStratifiedSql: String =
    s"""SELECT lang, rank, doc_id, distinct_bp FROM (
       |  SELECT lang, doc_id, distinct_bp,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY distinct_bp DESC, doc_id ASC) AS rank
       |  FROM (
       |    SELECT doc_id, lang,
       |      (CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) * 10000)
       |        // CAST(len(string_split(text,' ')) AS BIGINT) AS distinct_bp
       |    FROM documents))
       |WHERE rank <= $PerLangK ORDER BY lang, rank""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "sample_hash" -> (sampleHash _, sampleHashSql),
    "mix_stratified" -> (mixStratified _, mixStratifiedSql))
}
