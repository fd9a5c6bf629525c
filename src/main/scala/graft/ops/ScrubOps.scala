package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Corpus-scrubbing operators for training-data pipelines: PII redaction
 * and URL canonicalization + dedup. The synthetic `documents` corpus
 * carries no PII or URLs, so each query first CONSTRUCTS the sensitive
 * content deterministically from the table (same expression in the DuckDB
 * oracle) — the operators then run against realistic matches with exact
 * cross-engine parity. Both are linear single-pass scans (plus one
 * aggregation for the URL dedup): the right 100 TB shape, no joins.
 */
object ScrubOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  // RE2-and-Java-compatible patterns (both engines).
  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val phoneRe = "\\b555-[0-9]{4}\\b"

  /**
   * PII scrubbing: redact emails and phone-shaped tokens, count what was
   * redacted. The per-doc contact line is derived from doc_id so every
   * document exercises both patterns.
   */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val pii = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com call 555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    val scrubbed = regexp_replace(
      regexp_replace(pii, emailRe, "<EMAIL>"), phoneRe, "<PHONE>")
    docs(spark, dir).select(
      col("doc_id"),
      size(regexp_extract_all(pii, lit(emailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(pii, lit(phoneRe), lit(0))).cast("long").as("n_phones"),
      md5(scrubbed).as("scrubbed_md5"),
      length(scrubbed).cast("long").as("scrubbed_len"))
      .orderBy("doc_id")
  }

  val piiScrubSql: String = {
    val pii = "text || ' contact user' || CAST(doc_id AS VARCHAR) || " +
      "'@example.com call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    val scrubbed = s"regexp_replace(regexp_replace($pii, '$emailRe', '<EMAIL>', 'g'), " +
      s"'$phoneRe', '<PHONE>', 'g')"
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all($pii, '$emailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all($pii, '$phoneRe')) AS BIGINT) AS n_phones,
       |  md5($scrubbed) AS scrubbed_md5,
       |  CAST(length($scrubbed) AS BIGINT) AS scrubbed_len
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /**
   * URL canonicalization + dedup: lowercase, strip the fragment, the
   * default https port, and utm_* tracking parameters, then collapse
   * documents sharing a canonical URL (keep the smallest doc_id — the
   * deterministic canonical representative, same rule as the near-dup
   * family). doc_id % 50 aliases many docs onto each path; the tracking
   * params and casing differ per doc, so the dedup is non-trivial.
   */
  def urlCanonical(spark: SparkSession, dir: String): DataFrame = {
    val raw = concat(
      lit("https://WWW."), col("source"), lit(".Example.COM:443/p/"),
      pmod(col("doc_id"), lit(50)).cast("string"),
      lit("?utm_source=feed&utm_id="), col("doc_id").cast("string"),
      lit("&id="), pmod(col("doc_id"), lit(7)).cast("string"), lit("#sec"))
    val canon =
      regexp_replace( // 4. trailing '?' or '&' left by param stripping
        regexp_replace( // 3. utm_* tracking params
          regexp_replace( // 2. default https port
            regexp_replace(lower(raw), "#.*$", ""), // 1. fragment
            ":443/", "/"),
          "utm_[a-z]+=[^&#]*&?", ""),
        "[?&]$", "")
    docs(spark, dir).select(col("doc_id"), canon.as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(min(col("doc_id")).as("keep_doc"),
        count(lit(1)).as("n_docs"))
      .orderBy("canonical_url")
  }

  val urlCanonicalSql: String = {
    val raw = "'https://WWW.' || source || '.Example.COM:443/p/' || " +
      "CAST(doc_id % 50 AS VARCHAR) || '?utm_source=feed&utm_id=' || " +
      "CAST(doc_id AS VARCHAR) || '&id=' || CAST(doc_id % 7 AS VARCHAR) || '#sec'"
    val canon = "regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      s"lower($raw), '#.*$$', '', 'g'), ':443/', '/', 'g'), " +
      "'utm_[a-z]+=[^&#]*&?', '', 'g'), '[?&]$', '', 'g')"
    s"""SELECT canonical_url, min(doc_id) AS keep_doc, count(*) AS n_docs
       |FROM (SELECT doc_id, $canon AS canonical_url FROM documents)
       |GROUP BY canonical_url ORDER BY canonical_url""".stripMargin
  }

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "text_pii_scrub" -> (piiScrub _, piiScrubSql),
    "dedup_url_canonical" -> (urlCanonical _, urlCanonicalSql))
}
