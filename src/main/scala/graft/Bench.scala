package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bench.CdcBench

/**
 * Driver-run benchmark: headline queries on SPARK_GRAFT_SF_DIR plus the CDC
 * apply-throughput benchmark (the primary BASELINE.json metric:
 * change-events/sec applied end-to-end, WAL-replay -> lake upsert).
 * Prints exactly ONE JSON line.
 *
 * Scaling evidence across two parallelism levels lives in graft.ScaleBench
 * (writes BENCH/BASELINE.md); this main stays single-session.
 */
object Bench {

  /** Headline subset: one per operator family, heaviest variants. */
  val headline: Seq[String] = Seq(
    "q1_agg", "q_join_revenue", "q_window_top_per_key", "q_approx_agg",
    "q_asof_join", "q_event_sessions",
    "cdc_decode_roundtrip", "cdc_merge_final_state",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_cluster_canonical", "pipeline_corpus_clean",
    "ann_cosine_topk", "dedup_embedding_cosine", "dedup_embedding_lsh",
    "text_fingerprint", "text_quality_score", "multimodal_meta")

  /** Work-forcing TIMING sink (not a correctness checksum): forces EVERY
    * output column to be computed (a bare count() lets Spark prune
    * projection-only queries down to a parquet row count, timing nothing).
    * Map columns go through to_json (xxhash64 rejects maps); bit_xor is
    * order-independent and cannot overflow (ANSI mode makes sum throw on
    * long overflow). Caveat that keeps this timing-only: xor cancels rows
    * duplicated an even number of times, so equal values here do NOT prove
    * equal outputs — correctness comparison is the DuckDB oracle's job
    * (Verify + tools/compare_oracle.py), never this sink's. */
  def checksum(df: DataFrame): Long = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.MapType => to_json(col(f.name))
        case _ => col(f.name)
      }
    }
    val r = df.select(xxhash64(cols.toIndexedSeq: _*).as("h"))
      .agg(bit_xor(col("h"))).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queries = SparkEntry.queries
    val results = headline.filter(queries.contains).map { name =>
      val fn = queries(name)
      checksum(fn(spark, sfDir)) // warm (parquet footer cache, codegen)
      // BEST-OF-2 timed reps: this host's noisy-neighbor variance
      // (documented 5-10x, observed 10x WITHIN one process on identical
      // plans) makes a single timed sample useless for round-over-round
      // comparison
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        checksum(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }.min
      name -> t
    }

    // CDC apply throughput: WAL segments on disk -> decode -> MERGE -> lake.
    // This host has documented 5-10x noisy-neighbor variance, so a single
    // cold rep made round-over-round comparison pure noise: run the batch
    // apply and the streaming replay INTERLEAVED twice over the SAME
    // pre-generated WAL and report the best rep of each (matching how
    // ScaleBench samples).
    val wal = CdcBench.prepareWal(spark, nTxns = 300000L, txnsPerSegment = 5000L)
    // Micro-batched replay of the same volume (6 x 10-segment triggers) is
    // the realistic 10^10-event shape; merge-on-read keeps per-batch cost
    // O(batch) where bucket CoW paid O(table) per batch.
    val reps = (1 to 2).map { _ =>
      (CdcBench.run(spark, nTxns = 300000L, txnsPerSegment = 5000L,
        walDirOverride = Some(wal)),
        CdcBench.runStreaming(spark, nTxns = 300000L, txnsPerSegment = 5000L,
          segmentsPerTrigger = 10, walDirOverride = Some(wal)))
    }
    val cdc = reps.map(_._1).minBy(_.seconds)
    val cdcStream = reps.map(_._2).minBy(_.seconds)

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
        f""""cdc_apply":{"events":${cdc.events},"seconds":${cdc.seconds}%.3f,""" +
        f""""events_per_sec":${cdc.eventsPerSec}%.0f},""" +
        f""""cdc_apply_stream":{"events":${cdcStream.events},"seconds":${cdcStream.seconds}%.3f,""" +
        f""""events_per_sec":${cdcStream.eventsPerSec}%.0f,"batches":6}}""")
    spark.stop()
  }
}
