package graft.bench

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.apply.MergeEngine
import graft.cli.Main
import graft.decode.ChangeDecoder

/**
 * Decision benchmark: can the keep-last dedup + per-bucket delta write run
 * with ONE full-payload shuffle instead of two?
 *
 * A (current): groupBy(keys).agg(max_by)  [shuffle 1: partial-agg output,
 *   ~= full payload when keys are mostly unique in the batch]
 *   -> repartition(_bucket)               [shuffle 2: deduped payload]
 *   -> write partitionBy(_bucket)
 *
 * B (bucket-first): repartition(_bucket)  [shuffle 1: raw payload]
 *   -> groupBy(_bucket, keys).agg(max_by) [NO exchange: HashPartitioning
 *      on _bucket satisfies ClusteredDistribution(_bucket, keys)]
 *   -> write partitionBy(_bucket)
 *
 * Trade: B loses map-side combine for hot keys (a hot key's raw events all
 * cross the wire), so the salted path must keep shape A. Interleaved
 * best-of-N because this host is noisy.
 */
object DedupShapeBench {
  def main(args: Array[String]): Unit = {
    val nTxns = if (args.nonEmpty) args(0).toLong else 300000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wal = CdcBench.prepareWal(spark, nTxns, 5000L)
    val keyFields = Seq("repo", "path").map(Main.reposSchema(_))
    val keyCols = Seq("repo", "path")
    def prepared: DataFrame = {
      val p = MergeEngine.prepare(
        ChangeDecoder.decode(spark.read.text(wal)).filter(col("table") === "repos"),
        keyFields, Main.reposRenameMap)
      p.withColumn("_bucket", pmod(xxhash64(keyCols.map(col): _*), lit(32)).cast("int"))
    }
    val rowStruct = struct(col("lsn"), col("seq"), col("kind"),
      col("_bucket"), col("_row"), col("_types"))
    val ordStruct = struct(col("lsn"), col("seq"))
    def deltaCols(df: DataFrame): DataFrame =
      df.select((keyCols.map(col) ++ Seq(col("_row"), col("_types"),
        col("lsn").as("_lsn"), col("seq").cast("int").as("_seq"),
        col("kind").as("_kind"), col("_bucket"))).toIndexedSeq: _*)

    def shapeA: DataFrame = deltaCols(prepared
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(rowStruct, ordStruct).as("w"))
      .select((keyCols.map(col) :+ col("w.*")).toIndexedSeq: _*))
      .repartition(col("_bucket"))

    def shapeB: DataFrame = deltaCols(prepared
      .repartition(col("_bucket"))
      .groupBy((col("_bucket") +: keyCols.map(col)).toIndexedSeq: _*)
      .agg(max_by(rowStruct, ordStruct).as("w"))
      .select((keyCols.map(col) :+ col("w.*")).toIndexedSeq: _*))

    def exchanges(df: DataFrame): Int =
      df.queryExecution.executedPlan.toString().linesIterator
        .count(l => l.contains("Exchange") && !l.contains("Reused"))
    println(s"exchanges A=${exchanges(shapeA)} B=${exchanges(shapeB)}")

    def timeWrite(df: DataFrame): Double = {
      val out = graft.util.TempDirs.scratch("dedup-shape")
      val t0 = System.nanoTime()
      df.write.partitionBy("_bucket").mode("overwrite").parquet(out)
      val s = (System.nanoTime() - t0) / 1e9
      // delete immediately: 2*reps full outputs coexisting until exit
      // would multiply peak disk by 2*reps (the hook stays as backstop)
      graft.util.TempDirs.deleteDir(out)
      s
    }
    val a = Array.fill(reps)(0.0); val b = Array.fill(reps)(0.0)
    for (i <- 0 until reps) { // interleave: noisy host
      a(i) = timeWrite(shapeA)
      b(i) = timeWrite(shapeB)
    }
    def fmt(xs: Array[Double]) =
      f"best=${xs.min}%.2f all=[${xs.map(x => f"$x%.2f").mkString(",")}]"
    println(s"A(two-shuffle)  ${fmt(a)}")
    println(s"B(bucket-first) ${fmt(b)}")
    spark.stop()
  }
}
