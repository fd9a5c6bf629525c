package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus-cleaning composition — the flagship shape of a
 * web-scale training-data pipeline, built entirely from the operator
 * library: language gate (marker-vote lang-id) -> quality gate (integer
 * basis-point heuristics) -> near-dup removal (verified-LSH connected
 * components, keep the canonical representative). Output: the surviving
 * corpus with its token accounting.
 *
 * Scale shape: every stage is linear or hash-blocked (no all-pairs
 * anywhere — see [[DedupOps]]); the three stages join on doc_id, so the
 * composition adds two doc_id-hash shuffles on top of the stages
 * themselves, and Catalyst prunes each stage's unused columns.
 */
object PipelineOps {

  /** Composite quality floor in basis points (see TextOps.qualityScore):
    * ~40th percentile of the synthetic corpus — keeps the gate genuinely
    * selective in both engines. */
  val QualityMinBp = 2400

  def corpusClean(spark: SparkSession, dir: String): DataFrame = {
    // quality + lang-id are pure per-row projections over the same rows:
    // TextOps.qualityLang computes both in ONE scan (the old
    // quality.join(lang) paid a second documents scan, the tokenization
    // twice, and a join exchange for values derivable per row)
    val gates = TextOps.qualityLang(spark, dir)
    val canon = DedupOps.clusterCanonical(spark, dir)
      .select(col("doc_id"), col("is_canonical"))
    gates.join(canon, "doc_id")
      .filter(col("pred_lang") === "en" &&
        col("quality_bp") >= QualityMinBp && col("is_canonical") === 1)
      .select(col("doc_id"), col("n_tok"), col("quality_bp"))
      .orderBy("doc_id")
  }

  val corpusCleanSql: String = {
    val q = TextOps.qualityScoreSql.replace("ORDER BY doc_id", "")
    val l = TextOps.langIdSql.replace("ORDER BY doc_id", "")
    // the canonicalization oracle carries its own WITH RECURSIVE — legal
    // inside a derived table, so it nests as a subquery here
    val c = DedupOps.clusterCanonicalSql.replace("ORDER BY d.doc_id", "")
    s"""WITH q AS ($q),
       |l AS ($l),
       |c AS (SELECT doc_id, is_canonical FROM ($c) t)
       |SELECT q.doc_id AS doc_id, q.n_tok AS n_tok, q.quality_bp AS quality_bp
       |FROM q JOIN l USING (doc_id) JOIN c USING (doc_id)
       |WHERE l.pred_lang = 'en' AND q.quality_bp >= $QualityMinBp
       |  AND c.is_canonical = 1
       |ORDER BY doc_id""".stripMargin
  }

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "pipeline_corpus_clean" -> (corpusClean _, corpusCleanSql))
}
