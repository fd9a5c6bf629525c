package graft

import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/**
 * The stop-shingle frequency cap: a shingle present in f documents yields
 * f^2 candidate-pair rows in the inverted-list self-join, so hot shingles
 * (boilerplate) must be dropped before the join — bounded candidates even
 * when one phrase appears in every document.
 */
class DedupCapSpec extends SparkSpec {
  import spark.implicits._

  test("one hot shingle does not explode the candidate set") {
    val dir = tmpDir("docs")
    val hot = "common boiler plate header text" // one 5-gram, in EVERY doc
    // 120 docs share the hot shingle (> ShingleCap = 50); only docs 0 and 1
    // additionally share enough unique shingles to be real near-dups
    val docs = (0 until 120).map { i =>
      val body =
        if (i <= 1) s"alpha beta gamma delta epsilon zeta eta theta iota kappa"
        else s"unique$i w$i x$i y$i z$i a$i b$i c$i d$i e$i"
      (i.toLong, s"$hot $body", (hot.length + body.length + 1).toLong)
    }
    docs.toDF("doc_id", "text", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pairs = DedupOps.ngramJaccard(spark, dir).collect()
    // without the cap the hot shingle alone creates 120*119/2 = 7140
    // candidate pairs; with it only the genuinely-similar pair survives
    assert(pairs.length === 1)
    assert((pairs.head.getLong(0), pairs.head.getLong(1)) === ((0L, 1L)))
  }

  test("extreme skew: window cap and two-pass aggregate cap agree (5k-doc hot shingle)") {
    // Benchmarked decision (see BENCH/BASELINE.md): the window-expressed cap
    // beats the aggregate+anti-join variant even with an EVERY-doc hot
    // shingle (150k docs: 2.9s vs 7.4s; 600k docs: 7.1s vs 10.5s best-of-3,
    // local[8]) because it reuses one exchange and one shingling pass; the
    // agg variant remains the escape hatch for 10^8-doc boilerplate. This
    // test pins their OUTPUT parity under heavy skew so the hatch stays
    // swappable.
    val dir = tmpDir("docs3")
    val hot = "common boiler plate header text"
    val docs = (0 until 5000).map { i =>
      val body =
        if (i <= 1) s"alpha beta gamma delta epsilon zeta eta theta iota kappa"
        else s"unique$i w$i x$i y$i z$i a$i b$i c$i d$i e$i"
      (i.toLong, s"$hot $body", 100L)
    }
    docs.toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val win = DedupOps.ngramJaccard(spark, dir).collect().map(_.toSeq).toSeq
    val agg = DedupOps.ngramJaccardAggCap(spark, dir).collect().map(_.toSeq).toSeq
    assert(win === agg)
    assert(win.length === 1) // only the genuine near-dup pair survives
  }

  test("cluster canonicalization: chains collapse to min id, singletons keep themselves") {
    val dir = tmpDir("docs4")
    // a near-dup CHAIN: doc1 = doc0 with the last word changed, doc2 = doc1
    // with the first word changed — every adjacent pair is highly similar;
    // plus an unrelated singleton. All chain members must map to doc 0
    // regardless of which pairs the LSH stage surfaces directly.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (0L, base),
      (1L, base.replace(" mu", " nu")),
      (2L, base.replace("alpha ", "omega ").replace(" mu", " nu")),
      (3L, "totally different words that match nothing else at all here now"))
      .map { case (id, t) => (id, t, 100L) }
    docs.toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // Pin the round shape: convergence rides the round's ONE materializing
    // action (observe on the checkpoint) — at most a single `count` action
    // in the whole call (the pre-loop empty-frontier guard) — and the
    // superseded per-round frontiers + the edge set are released eagerly
    // instead of accumulating until the ContextCleaner GCs them.
    val counts = new java.util.concurrent.atomic.AtomicInteger
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (funcName == "count") { counts.incrementAndGet(); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    val rddsBefore = spark.sparkContext.getPersistentRDDs.size
    spark.listenerManager.register(ql)
    val got =
      try DedupOps.clusterCanonical(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      finally spark.listenerManager.unregister(ql)
    assert(got === Seq((0L, 0L, 1), (1L, 0L, 0), (2L, 0L, 0), (3L, 3L, 1)))
    locally { // the listener bus is async — poll until the counter stabilizes
      var prev = -1; var cur = counts.get; var spins = 0
      while (cur != prev && spins < 50) {
        prev = cur; Thread.sleep(100); cur = counts.get; spins += 1
      }
    }
    assert(counts.get <= 1,
      s"convergence must ride the checkpoint action, saw ${counts.get} count()s")
    val rddsAfter = spark.sparkContext.getPersistentRDDs.size
    assert(rddsAfter - rddsBefore <= 1, // only the FINAL frontier survives
      s"superseded frontiers must be released ($rddsBefore -> $rddsAfter)")
  }

  test("capped join plan stays an equi-join (no cartesian/BNLJ)") {
    val dir = tmpDir("docs2")
    (0 until 10).map(i => (i.toLong, s"a b c d e f$i g$i", 15L))
      .toDF("doc_id", "text", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val plan = DedupOps.ngramJaccard(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
