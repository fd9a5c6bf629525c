package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: window-cap vs two-pass aggregate cap under a manufactured
  * every-doc hot shingle. */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(150000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.util.TempDirs.scratch("skew")
    // every doc shares one boilerplate 5-gram; docs 0/1 are true near-dups
    spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat(lit("common boiler plate header text "),
        when(col("id") <= 1, lit("alpha beta gamma delta epsilon zeta eta theta iota kappa"))
          .otherwise(concat_ws(" ", (0 until 10).map(j =>
            concat(lit(s"w$j"), col("id"))): _*))).as("text"),
      lit(100L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f; val s = (System.nanoTime() - t0) / 1e9
      println(s"  rows=$n"); s
    }
    // warm both
    DedupOps.ngramJaccard(spark, dir).count()
    DedupOps.ngramJaccardAggCap(spark, dir).count()
    val wins = (1 to 3).map { _ =>
      val w = time(DedupOps.ngramJaccard(spark, dir).count())
      val a = time(DedupOps.ngramJaccardAggCap(spark, dir).count())
      (w, a)
    }
    println(f"SKEW nDocs=$nDocs window_best=${wins.map(_._1).min}%.2f agg_best=${wins.map(_._2).min}%.2f " +
      f"window_all=${wins.map(w => f"${w._1}%.2f").mkString(",")} agg_all=${wins.map(w => f"${w._2}%.2f").mkString(",")}")
    spark.stop()
  }
}
