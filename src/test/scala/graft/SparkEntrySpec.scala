package graft

import graft.ops.MultimodalOps

/** Contract smoke tests: entry() is non-empty, every query runs at sf0.001
  * and has an oracle, and the multimodal mapPartitions plumbing decodes. */
class SparkEntrySpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("entry() flagship CDC apply returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle and vice versa (full hash-exact coverage)") {
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // materialize whole plan
    }
  }

  test("multimodal mapPartitions decode: schema, batch shape, determinism") {
    import spark.implicits._
    val media = MultimodalOps.mediaFromDocuments(spark, sf).repartition(4)
    val feats = MultimodalOps.decodeFeatures(media)
    assert(feats.columns.toSeq ===
      Seq("doc_id", "media_type", "format", "n_bytes", "width", "height",
        "n_frames", "checksum"))
    val rows = feats.collect()
    assert(rows.length === media.count())
    // document-text blobs sniff as no known container => stub features
    assert(rows.forall(_.format === "unknown"))
    assert(rows.forall(f => f.width >= 64 && f.width < 64 + 577))
    assert(rows.forall(f => f.n_frames === 1 + f.n_bytes / 100))
    // determinism across partitionings
    val again = MultimodalOps.decodeFeatures(media.repartition(7)).collect()
    assert(rows.map(f => (f.doc_id, f.checksum)).toSet ===
      again.map(f => (f.doc_id, f.checksum)).toSet)
  }
}
