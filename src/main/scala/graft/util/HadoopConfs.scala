package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Session-derived Hadoop configuration, shared by the WAL source and the
  * lake table so both honor the same filesystem settings. */
object HadoopConfs {

  /**
   * The session's Hadoop configuration INCLUDING runtime-set
   * `spark.hadoop.*` entries with the prefix stripped.
   * `sessionState.newHadoopConf()` copies runtime session entries verbatim
   * (the prefix is only stripped for static SparkConf entries at session
   * build), so `spark.conf.set("spark.hadoop.fs.s3a.access.key", ...)`
   * would otherwise never reach a FileSystem.
   */
  def session(spark: SparkSession): Configuration = {
    val c = spark.sessionState.newHadoopConf()
    spark.conf.getAll.foreach { case (k, v) =>
      if (k.startsWith("spark.hadoop.")) c.set(k.stripPrefix("spark.hadoop."), v)
    }
    c
  }

  def active(): Configuration =
    SparkSession.getActiveSession.map(session).getOrElse(new Configuration())
}
