package graft.bench

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.apply.MergeEngine
import graft.cli.Main
import graft.decode.ChangeDecoder

/**
 * Decision benchmark: parquet compression codec for the DELTA write — the
 * dominant phase of the apply path (PhaseBench). Deltas are transient
 * (read back once for stats, merged at read, compacted away), so write
 * speed matters more than ratio, but size feeds the read-back and the
 * merge. Interleaved reps; reports wall time AND bytes per codec.
 */
object CodecBench {
  def main(args: Array[String]): Unit = {
    val nTxns = if (args.nonEmpty) args(0).toLong else 300000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val codecs = Seq("snappy", "lz4", "zstd", "uncompressed")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wal = CdcBench.prepareWal(spark, nTxns, 5000L)
    val keyFields = Seq("repo", "path").map(Main.reposSchema(_))
    val keyCols = Seq("repo", "path")
    val rowStruct = struct(col("lsn"), col("seq"), col("kind"),
      col("_bucket"), col("_row"), col("_types"))
    val ordStruct = struct(col("lsn"), col("seq"))
    def deltaRows: DataFrame = {
      val p = MergeEngine.prepare(
        ChangeDecoder.decode(spark.read.text(wal)).filter(col("table") === "repos"),
        keyFields, Main.reposRenameMap)
        .withColumn("_bucket", pmod(xxhash64(keyCols.map(col): _*), lit(32)).cast("int"))
      p.groupBy(keyCols.map(col): _*)
        .agg(max_by(rowStruct, ordStruct).as("w"))
        .select((keyCols.map(col) :+ col("w.*")).toIndexedSeq: _*)
        .select((keyCols.map(col) ++ Seq(col("_row"), col("_types"),
          col("lsn").as("_lsn"), col("seq").cast("int").as("_seq"),
          col("kind").as("_kind"), col("_bucket"))).toIndexedSeq: _*)
        .repartition(col("_bucket"))
    }

    def dirBytes(d: String): Long = {
      val root = java.nio.file.Paths.get(d)
      val it = java.nio.file.Files.walk(root).iterator()
      var n = 0L
      while (it.hasNext) { val p = it.next(); if (java.nio.file.Files.isRegularFile(p)) n += java.nio.file.Files.size(p) }
      n
    }

    val times = codecs.map(_ -> Array.fill(reps)(0.0)).toMap
    val readTimes = codecs.map(_ -> Array.fill(reps)(0.0)).toMap
    var bytes = Map.empty[String, Long]
    var dirs = Map.empty[String, String]
    for (i <- 0 until reps; c <- codecs) { // interleave: noisy host
      val out = dirs.getOrElse(c, {
        val d = graft.util.TempDirs.scratch(s"codec-$c")
        dirs += c -> d; d
      })
      val t0 = System.nanoTime()
      deltaRows.write.partitionBy("_bucket")
        .option("compression", c).mode("overwrite").parquet(out)
      times(c)(i) = (System.nanoTime() - t0) / 1e9
      if (i == 0) bytes += c -> dirBytes(out)
      // read-back: every column forced (the merge/stat read pattern)
      val t1 = System.nanoTime()
      val df = spark.read.parquet(out)
      df.select(xxhash64(df.columns.map(x => to_json(struct(col(x)))).toIndexedSeq: _*).as("h"))
        .agg(bit_xor(col("h"))).collect()
      readTimes(c)(i) = (System.nanoTime() - t1) / 1e9
    }
    codecs.foreach { c =>
      val xs = times(c); val rs = readTimes(c)
      println(f"$c%-12s write=${xs.min}%.2f [${xs.map(x => f"$x%.2f").mkString(",")}] " +
        f"read=${rs.min}%.2f [${rs.map(x => f"$x%.2f").mkString(",")}] " +
        f"bytes=${bytes(c) / 1e6}%.1f MB")
    }
    spark.stop()
  }
}
