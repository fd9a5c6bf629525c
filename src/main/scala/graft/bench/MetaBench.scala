package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import graft.lake.{LakeTable, Snapshot}

/**
 * Metadata-scale bench for DISTRIBUTED snapshot manifests (round-3 verdict
 * next-round #5): a table with O(10^4..10^5) live files, measuring what a
 * commit that touches ONE bucket costs in metadata wall time and bytes —
 * the regime the per-bucket manifest design exists for. INLINE form
 * rewrites the whole O(files) snapshot JSON every commit; DISTRIBUTED
 * rewrites the O(buckets) root plus exactly the touched buckets'
 * manifests (pointer reuse for the rest).
 *
 * Purely a metadata exercise: the file entries are synthetic (no parquet
 * is read or written), which is precisely the point — at 10^10 rows the
 * metadata path must not scale with table size.
 *
 * Usage: runMain graft.bench.MetaBench [nFiles] [nBuckets] [commits]
 */
object MetaBench {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(50000)
    val nBuckets = args.drop(1).headOption.map(_.toInt).getOrElse(512)
    val commits = args.drop(2).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val perBucket = nFiles / nBuckets

    def fileName(commit: Long, b: Int, i: Int): String =
      f"data/commit-$commit%012d-aaaaaaaa/_bucket=$b/part-$i%05d.parquet"

    def fullSnapshot(s0: Snapshot): Snapshot = {
      val bf = (0 until nBuckets).map(b =>
        b -> (0 until perBucket).map(i => fileName(1, b, i))).toMap
      val all = bf.values.flatten.toSeq
      s0.copy(
        bucketFiles = bf,
        bucketWatermarks = (0 until nBuckets).map(_ -> 1L).toMap,
        lsnHighWatermark = 1L,
        fileStats = all.map(f => f -> Map("id" -> (("0", "99999")))).toMap,
        fileBytes = all.map(f => f -> 1048576L).toMap)
    }

    def metaBytes(root: String): Long = {
      val dir = java.nio.file.Paths.get(root, "meta")
      if (!java.nio.file.Files.exists(dir)) return 0L
      val s = java.nio.file.Files.walk(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size).sum
      } finally s.close()
    }

    def run(tag: String, threshold: Int): Unit = {
      val root = graft.util.TempDirs.scratch(s"meta-$tag")
      val t = new LakeTable(spark, root, manifestThresholdFiles = threshold)
      t.create(schema, Seq("id"), nBuckets)
      val t0 = System.nanoTime()
      var cur = t.commit(fullSnapshot(t.currentSnapshot.get), 0L)
      val fullS = (System.nanoTime() - t0) / 1e9
      // steady state: single-bucket-touch commits (one delta appended)
      var bytesBefore = metaBytes(root)
      val times = (1 to commits).map { k =>
        val b = k % nBuckets
        val delta = fileName(100L + k, b, 0)
        val next = cur.copy(
          bucketDeltas = cur.bucketDeltas +
            (b -> (cur.bucketDeltas.getOrElse(b, Nil) :+ delta)),
          bucketWatermarks = cur.bucketWatermarks + (b -> (1L + k)),
          lsnHighWatermark = 1L + k,
          fileStats = cur.fileStats + (delta -> Map("id" -> (("0", "99999")))),
          fileBytes = cur.fileBytes + (delta -> 65536L))
        val c0 = System.nanoTime()
        cur = t.commit(next, cur.snapshotId, prev = Some(cur))
        (System.nanoTime() - c0) / 1e9
      }
      val bytesAfter = metaBytes(root)
      val perCommitBytes = (bytesAfter - bytesBefore) / commits
      println(f"META $tag nFiles=$nFiles buckets=$nBuckets fullCommit=$fullS%.2fs " +
        f"touchCommit_med=${times.sorted.apply(times.size / 2)}%.3fs " +
        f"touchCommit_best=${times.min}%.3fs " +
        f"metaBytesPerTouchCommit=$perCommitBytes " +
        f"(all=${times.map(x => f"$x%.3f").mkString(",")})")
    }

    run("inline", threshold = Int.MaxValue)
    run("distributed", threshold = 4096)
    spark.stop()
  }
}
