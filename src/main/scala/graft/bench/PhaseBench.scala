package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.apply.MergeEngine
import graft.cli.Main
import graft.decode.ChangeDecoder

/** One-off phase breakdown of the apply hot path: decode-only vs
  * decode+prepare vs full apply, same WAL, best-of-3 each. */
object PhaseBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wal = CdcBench.prepareWal(spark, nTxns = 300000L, txnsPerSegment = 5000L)
    val lines = spark.read.text(wal)
    val keyFields = Seq("repo", "path").map(Main.reposSchema(_))

    def best(f: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    def forceCount(df: org.apache.spark.sql.DataFrame): Unit = df.count(): Unit
    def forceAll(df: org.apache.spark.sql.DataFrame): Unit = {
      val c = df.columns.map(col)
      df.select(xxhash64(c.map(x => to_json(struct(x))).toIndexedSeq: _*).as("h"))
        .agg(bit_xor(org.apache.spark.sql.functions.col("h"))).collect(): Unit
    }

    val read = best(forceCount(lines))
    val decoded = ChangeDecoder.decode(lines)
    val decode = best(forceAll(decoded.drop("columnvalues", "columntypes", "columnnames", "oldkeys")))
    val prepared = MergeEngine.prepare(decoded.filter(col("table") === "repos"), keyFields, Main.reposRenameMap)
    val prep = best(forceAll(prepared.drop("_row", "_types")))
    val dedup = best(forceCount(prepared
      .groupBy(col("repo"), col("path"))
      .agg(max_by(struct(col("lsn"), col("seq"), col("kind"), col("_row"), col("_types")),
        struct(col("lsn"), col("seq"))).as("w"))))
    val full = best {
      val r = CdcBench.run(spark, 300000L, 5000L, walDirOverride = Some(wal))
      println(f"  full=${r.seconds}%.2f")
    }
    println(f"PHASES read=$read%.2f decode=$decode%.2f decode+prepare=$prep%.2f +dedup=$dedup%.2f fullApply=$full%.2f")
    spark.stop()
  }
}
