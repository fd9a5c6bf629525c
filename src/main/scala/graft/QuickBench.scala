package graft
import org.apache.spark.sql.SparkSession
object QuickBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = graft.bench.CdcBench.run(spark, nTxns = 300000L, txnsPerSegment = 5000L)
    println(f"QUICKBENCH events=${r.events} sec=${r.seconds}%.2f eps=${r.eventsPerSec}%.0f")
    spark.stop()
  }
}
