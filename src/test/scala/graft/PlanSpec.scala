package graft

import graft.ops.{RelationalQueries, CdcQueries}

/**
 * Physical-plan shape assertions — the "would this survive 100 TB" checks:
 * filters and projections must reach the parquet scan, small dims must
 * broadcast, the keep-last dedup must be a partial (map-side combining)
 * hash aggregation rather than a window sort.
 */
class PlanSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // materialize THIS plan so AQE settles on the final one
    val full = df.queryExecution.executedPlan.toString
    full.split("== Initial Plan ==").head // assert on the AQE final plan only
  }

  test("q1_agg: quantity filter is pushed to the parquet scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,5.0)]")
      || p.contains("GreaterThan(l_quantity"), p)
  }

  test("q1_agg: scan reads only the referenced columns (column pruning)") {
    val p = plan("q1_agg")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_tax"),
      readSchema)
    assert(readSchema.contains("l_quantity"), readSchema)
  }

  test("q_join_revenue: customer dim is broadcast") {
    val p = plan("q_join_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_join_revenue: lineitem-orders is a shuffle join, not a broadcast NLJ") {
    val p = plan("q_join_revenue")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("cdc_merge_final_state: keep-last dedup is a partial hash aggregation") {
    val p = plan("cdc_merge_final_state")
    // two-phase agg: a partial (merge_max_by) before the shuffle, final after
    assert(p.contains("partial_max_by"), p)
    assert(!p.contains("Window"), p) // not the sort-the-world window variant
  }

  test("cdc_dedup_keeplast: single shuffle (one Exchange) for the aggregation") {
    val p = plan("cdc_dedup_keeplast")
    // roundrobinpartitioning = the conditional small-input spread (Tables
    // .read): input-size-gated, absent at scale — not part of the query's
    // algorithmic shuffle count
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("roundrobinpartitioning"))
    // one for the groupBy, one for the final orderBy (output ordering only)
    assert(exchanges <= 2, s"$exchanges exchanges:\n$p")
  }

  test("whole-stage codegen covers the aggregation pipeline") {
    val p = plan("q1_agg")
    // codegen'd operators print with a "*(stageId)" prefix in the plan tree
    assert(p.contains("*(1)") && p.contains("*(2)"), p)
  }

  test("topk is a TakeOrderedAndProject, not a global sort") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  // --- dedup / similarity family: candidate generation must be an
  // equi-join on a blocking key, never an all-pairs product, and the heavy
  // aggregations must combine map-side (partial) before the shuffle.

  private def assertNoProductJoin(name: String): String = {
    val p = plan(name)
    assert(!p.contains("CartesianProduct"), s"$name plan has a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plan has a BNLJ:\n$p")
    p
  }

  test("dedup_minhash_lsh: banded equi-join, partial min aggregation") {
    val p = assertNoProductJoin("dedup_minhash_lsh")
    assert(p.contains("partial_min"), p)
  }

  test("dedup_ngram_jaccard: capped inverted-list equi-join, no product") {
    assertNoProductJoin("dedup_ngram_jaccard")
  }

  test("dedup_embedding_lsh: bucket-blocked equi-join, no product") {
    val p = assertNoProductJoin("dedup_embedding_lsh")
    assert(p.contains("partial_sum"), p)
  }

  test("dedup_embedding_cosine / ann_ivf_topk: no product joins") {
    assertNoProductJoin("dedup_embedding_cosine")
    assertNoProductJoin("ann_ivf_topk")
  }

  test("q_approx_agg: KMV top-k gets a map-side WindowGroupLimit (never a full per-group sort)") {
    val p = plan("q_approx_agg")
    // Spark's WindowGroupLimit keeps only the 64 smallest hashes per group
    // BEFORE the shuffle — without it the distinct-hash sort is O(distinct
    // keys) per group, which does not survive 10^10 rows
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial"), p)
  }

  test("dedup_exact: single hash aggregation with map-side combine") {
    val p = plan("dedup_exact")
    assert(p.contains("partial_"), p)
    assert(!p.contains("Window"), p)
  }

  test("dedup_ngram_jaccard: the shingle inverted list is computed once and reused") {
    val p = plan("dedup_ngram_jaccard")
    // the window-expressed frequency cap shares its hashpartitioning(g)
    // exchange with both self-join sides
    assert(p.contains("ReusedExchange"), p)
  }

  test("dedup_minhash_verified: blocking-key equi-joins only, no product join") {
    // No forced broadcast: the candidate set is data-dependent and unbounded
    // (a forced hint bypasses AQE's size check — driver OOM at 100 TB). The
    // only required shape is no product join; AQE picks broadcast vs shuffle.
    assertNoProductJoin("dedup_minhash_verified")
  }

  test("ann_cosine_topk_arrays: broadcast query side, no explode blowup") {
    val p = plan("ann_cosine_topk_arrays")
    // a 10-row broadcast build side against the streaming corpus is the
    // intended brute-force shape (BNLJ is fine here — the build side is
    // constant-size; a CartesianProduct would shuffle both sides)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), p)
    // the dot product happens inside the row: no Generate/explode blowup
    assert(!p.contains("Generate"), p)
  }

  test("q_event_sessions / q_asof_join: one shuffle per key partitioning, no products") {
    for (name <- Seq("q_event_sessions", "q_asof_join")) {
      val p = assertNoProductJoin(name)
      // all windows run on the same user_id partitioning: exactly one
      // hash exchange (plus the final presentation sort)
      val hashExchanges = p.linesIterator
        .count(l => l.contains("Exchange hashpartitioning"))
      assert(hashExchanges <= 2, s"$name: $hashExchanges hash exchanges:\n$p")
    }
  }

  test("dedup_cluster_canonical / pipeline_corpus_clean: no product joins anywhere") {
    // both are join-heavy compositions (label propagation rounds; the
    // 3-stage corpus pipeline) — every join must stay key-blocked
    assertNoProductJoin("dedup_cluster_canonical")
    assertNoProductJoin("pipeline_corpus_clean")
  }

  test("mix_stratified: rank-per-group gets a map-side WindowGroupLimit") {
    // top-K per language must forward at most K rows per group per map
    // task BEFORE the shuffle — never sort 10^10 rows per group
    val p = plan("mix_stratified")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_range_join: bucketized equi-join, never a theta cross product") {
    val p = assertNoProductJoin("q_range_join")
    assert(p.contains("partial_count"), p)
  }

  test("q_event_tumbling: partial aggregation before the shuffle") {
    val p = plan("q_event_tumbling")
    assert(p.contains("partial_"), p)
  }

  test("text_vocab_topk: map-side combine absorbs token skew; top-k is TakeOrdered") {
    val p = plan("text_vocab_topk")
    assert(p.contains("partial_count"), p) // 'the' collapses before the shuffle
    assert(p.contains("TakeOrderedAndProject"), p) // never a global sort
  }

  test("text_pii_scrub: a single linear scan — no shuffle except output order") {
    val p = plan("text_pii_scrub")
    assert(!p.contains("Join"), p)
    // the only exchanges are the final orderBy's range partitioning and the
    // conditional small-input spread (roundrobin, input-size-gated — absent
    // at scale)
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(l => l.contains("rangepartitioning")
      || l.contains("roundrobinpartitioning")),
      s"non-ordering exchange in a linear scrub:\n$p")
  }

  test("dedup_url_canonical: one hash aggregation, map-side combine, no join") {
    val p = plan("dedup_url_canonical")
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_"), p)
    val hashExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashExchanges <= 1, s"$hashExchanges hash exchanges:\n$p")
  }

  test("cdc_change_feed: the feed read is scan+project — no join, no aggregation, no shuffle but output order") {
    // O(changed bytes) at the PLAN level: attributing rows to snapshots via
    // the literal map (small ranges) must not introduce joins or shuffles —
    // the feed is a straight projection over exactly the commit delta files
    val p = plan("cdc_change_feed")
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate") && !p.contains("ObjectHashAggregate"), p)
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"non-ordering exchange in the feed read:\n$p")
  }
}
