package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.apply.MergeEngine
import graft.cli.Main
import graft.decode.ChangeDecoder

/**
 * Decision benchmark: parquet writer tuning for the DELTA write (the
 * dominant apply phase per PhaseBench). Dictionary encoding builds a
 * per-column hash dictionary during the write; the delta payload's map
 * VALUES carry near-unique file content, so the dictionary overflows and
 * the build work is wasted — but the same setting also covers the keys
 * and kind columns, which DO repeat. Measured, not guessed: write time,
 * read-back time, and bytes, dictionary on vs off, interleaved reps.
 */
object WriterTuningBench {
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
      val stream = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      try {
        val it = stream.iterator()
        var n = 0L
        while (it.hasNext) {
          val p = it.next()
          if (java.nio.file.Files.isRegularFile(p)) n += java.nio.file.Files.size(p)
        }
        n
      } finally stream.close()
    }

    val variants = Seq("dict-on" -> "true", "dict-off" -> "false")
    val w = variants.map(_._1 -> Array.fill(reps)(0.0)).toMap
    val r = variants.map(_._1 -> Array.fill(reps)(0.0)).toMap
    var bytes = Map.empty[String, Long]
    var dirs = Map.empty[String, String]
    for (i <- 0 until reps; (name, dict) <- variants) { // interleave: noisy host
      val out = dirs.getOrElse(name, {
        val d = graft.util.TempDirs.scratch(s"wtune-$name"); dirs += name -> d; d
      })
      val t0 = System.nanoTime()
      deltaRows.write.partitionBy("_bucket")
        .option("compression", "zstd")
        .option("parquet.enable.dictionary", dict)
        .mode("overwrite").parquet(out)
      w(name)(i) = (System.nanoTime() - t0) / 1e9
      if (i == 0) bytes += name -> dirBytes(out)
      val t1 = System.nanoTime()
      val df = spark.read.parquet(out)
      df.select(xxhash64(df.columns.map(x => to_json(struct(col(x)))).toIndexedSeq: _*).as("h"))
        .agg(bit_xor(col("h"))).collect()
      r(name)(i) = (System.nanoTime() - t1) / 1e9
    }
    variants.foreach { case (name, _) =>
      println(f"$name%-9s write=${w(name).min}%.2f [${w(name).map(x => f"$x%.2f").mkString(",")}] " +
        f"read=${r(name).min}%.2f [${r(name).map(x => f"$x%.2f").mkString(",")}] " +
        f"bytes=${bytes(name) / 1e6}%.1f MB")
    }
    spark.stop()
  }
}
