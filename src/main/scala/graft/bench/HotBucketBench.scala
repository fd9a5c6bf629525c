package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.lake.LakeTable

/**
 * Hot-bucket read-straggler decision bench (round-3 verdict "What's wrong"
 * #1): a table where ONE bucket holds ~50% of all keys, read through
 *
 *  - LOCAL  — the zero-Exchange per-bucket merge (one core per bucket:
 *             the hot bucket is a straggler task by construction);
 *  - SHUFFLE — the key-hash max_by merge (Exchange, but per-KEY
 *             parallelism absorbs the hot bucket);
 *  - HYBRID — the shipped data-aware split: buckets whose recorded merge
 *             input bytes exceed maxLocalMergeBytesPerBucket shuffle,
 *             the rest merge locally.
 *
 * Also measured on a UNIFORM table of the same size, where LOCAL should
 * win (no straggler, no Exchange) — the hybrid must match LOCAL there.
 *
 * Usage: runMain graft.bench.HotBucketBench [nKeys] [reps]
 */
object HotBucketBench {
  def main(args: Array[String]): Unit = {
    val nKeys = args.headOption.map(_.toInt).getOrElse(400000)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nBuckets = 8
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))

    /** ids whose write-path bucket is `b`, found by rejection over a range. */
    def idsInBucket(b: Int, n: Int): Array[Long] =
      spark.range(0, n.toLong * nBuckets * 2)
        .filter(pmod(xxhash64(col("id")), lit(nBuckets)) === b)
        .limit(n).as[Long].collect()

    def ins(lsn: Long, id: Long): String = {
      // incompressible ~480B payload: on-disk bytes (which drive the
      // hybrid's threshold) then track in-memory merge cost realistically
      val sb = new StringBuilder(520)
      var k = 0L
      while (k < 30) { sb.append(f"${graft.gen.ChangeStreamGen.mix(id * 31 + k)}%016x"); k += 1 }
      s"""{"lsn":$lsn,"xid":$lsn,"change":[{"kind":"insert","schema":"public","table":"t",""" +
        s""""columnnames":["id","v"],"columntypes":["bigint","text"],""" +
        s""""columnvalues":[$id,"$sb"]}]}"""
    }

    def build(root: String, keys: Array[Long],
              localBytes: Long, localBuckets: Int = 256): LakeTable = {
      val t = new LakeTable(spark, root, maxDeltasPerBucket = 1000,
        maxLocalMergeBuckets = localBuckets,
        maxDeltaBytesPerBucket = Long.MaxValue, // keep every delta unmerged
        maxLocalMergeBytesPerBucket = localBytes)
      t.create(schema, Seq("id"), nBuckets)
      // three delta batches so every bucket is delta-carrying at read time
      keys.grouped(math.max(1, keys.length / 3)).zipWithIndex.foreach {
        case (ks, i) =>
          val lines = ks.zipWithIndex.map { case (k, j) =>
            ins(i.toLong * nKeys + j + 1, k)
          }.toIndexedSeq
          MergeEngine.applyBatch(t,
            ChangeDecoder.decode(spark.createDataset(lines).toDF("value")))
      }
      t
    }

    // SKEWED: half the keys in bucket 0, the rest spread uniformly.
    println("building key populations...")
    val hot = idsInBucket(0, nKeys / 2)
    val uniformKeys = spark.range(1000000000L, 1000000000L + nKeys)
      .as[Long].collect()
    val spread = uniformKeys.take(nKeys / 2)
    val skewKeys = hot ++ spread

    def bench(tag: String, keys: Array[Long]): Unit = {
      val base = graft.util.TempDirs.scratch(s"hotb-$tag")
      // identical data, three read shapes (fresh table per shape so the
      // snapshot bytes are identical; reads repeated interleaved, best-of)
      val tLocal = build(s"$base/local", keys, localBytes = Long.MaxValue)
      val tShuffle = build(s"$base/shuffle", keys, localBytes = Long.MaxValue,
        localBuckets = 0)
      val tHybrid = build(s"$base/hybrid", keys,
        localBytes = 32L * 1024 * 1024) // hot bucket shuffles, cold merge locally
      def time(t: LakeTable): Double = {
        val t0 = System.nanoTime()
        val n = t.read().selectExpr("bit_xor(xxhash64(id, v))").head()
        (System.nanoTime() - t0) / 1e9
      }
      time(tLocal); time(tShuffle); time(tHybrid) // warm
      val runs = (1 to reps).map(_ => (time(tLocal), time(tShuffle), time(tHybrid)))
      println(f"HOTBUCKET $tag keys=${keys.length} " +
        f"local_best=${runs.map(_._1).min}%.2f shuffle_best=${runs.map(_._2).min}%.2f " +
        f"hybrid_best=${runs.map(_._3).min}%.2f " +
        f"local_all=${runs.map(r => f"${r._1}%.2f").mkString(",")} " +
        f"shuffle_all=${runs.map(r => f"${r._2}%.2f").mkString(",")} " +
        f"hybrid_all=${runs.map(r => f"${r._3}%.2f").mkString(",")}")
    }

    bench("skewed", skewKeys)
    bench("uniform", uniformKeys)
    spark.stop()
  }
}
