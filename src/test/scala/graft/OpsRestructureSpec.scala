package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/**
 * Round-6 optimization guards: every operator whose INTERNALS were
 * restructured for performance (multi-column single-pass aggregates
 * replacing explode pipelines; hashed shingle join keys; fused one-scan
 * gates; the cluster-canonical init fold) is compared against a naive
 * reference implementation of the ORIGINAL shape on the real sf0.001
 * inputs. The DuckDB oracle gates the same equalities externally; this
 * spec keeps them pinned at sbt-test time.
 */
class OpsRestructureSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  // --- naive reference shapes (the pre-optimization formulations) ---

  private def docs(s: SparkSession) = s.read.parquet(s"$sf/documents.parquet")

  private def shingled(s: SparkSession): DataFrame =
    docs(s).select(col("doc_id"),
      explode(array_distinct(Shingles.grams(col("text"), 5))).as("g"))

  test("minhashSignature == naive explode-K formulation") {
    val P = 1000003L
    def aCoef(j: Int): Long = 37L + 2L * j
    def bCoef(j: Int): Long = 101L * j + 13L
    val sh = shingled(spark)
      .withColumn("h0", pmod(TextOps.md5Long(col("g")), lit(P)))
    val withJ = sh.select(col("doc_id"), col("h0"),
      explode(sequence(lit(0), lit(7))).as("j"))
    val aMap = map(Seq.range(0, 8).flatMap(j => Seq(lit(j), lit(aCoef(j)))): _*)
    val bMap = map(Seq.range(0, 8).flatMap(j => Seq(lit(j), lit(bCoef(j)))): _*)
    val naive = withJ
      .withColumn("hj", pmod(element_at(aMap, col("j")) * col("h0")
        + element_at(bMap, col("j")), lit(P)))
      .groupBy(col("doc_id"), col("j"))
      .agg(min(col("hj")).as("minhash"))
      .orderBy("doc_id", "j")
    val opt = DedupOps.minhashSignature(spark, sf)
    assert(opt.schema.map(f => (f.name, f.dataType)) ===
      naive.schema.map(f => (f.name, f.dataType)))
    assert(rows(opt) === rows(naive))
  }

  test("simhash == naive explode-16 two-aggregation formulation") {
    val tok = docs(spark)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("t"))
      .withColumn("h", TextOps.md5Long(col("t")))
    val naive = tok.select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(15))).as("b"))
      .withColumn("contrib",
        when(expr("shiftright(h, cast(b as int))").bitwiseAND(1) === 1, 1L)
          .otherwise(-1L))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(col("contrib")).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0,
        expr("shiftleft(cast(1 as bigint), cast(b as int))"))
        .otherwise(0L)).as("simhash"),
        count(lit(1)).as("n_bits"))
      .orderBy("doc_id")
    val opt = DedupOps.simhash(spark, sf)
    assert(opt.schema.map(f => (f.name, f.dataType)) ===
      naive.schema.map(f => (f.name, f.dataType)))
    assert(rows(opt) === rows(naive))
  }

  test("ngram Jaccard over hashed shingles == string-keyed formulation") {
    // the original string-keyed pipeline, window cap included
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    val sh = shingled(spark)
      .withColumn("df", count(lit(1)).over(w))
      .filter(col("df") <= DedupOps.ShingleCap)
      .drop("df")
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.as("a"); val b = sh.as("b")
    val naive = a.join(b, col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard_bp", expr("(inter * 10000) div (na + nb - inter)"))
      .filter(col("jaccard_bp") >= 2000)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("na"), col("nb"),
        col("jaccard_bp"))
      .orderBy("doc_a", "doc_b")
    assert(rows(DedupOps.ngramJaccard(spark, sf)) === rows(naive))
  }

  test("lshBuckets == naive explode-8 two-aggregation formulation") {
    val q = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("idx0", "v")))
      .select(col("vec_id"), col("label"), (col("idx0") + 1).as("idx"),
        floor(col("v").cast("double") * 1000 + 0.5).cast("long").as("q"))
    val naive = q.select(col("vec_id"), col("idx"), col("q"),
        explode(sequence(lit(0), lit(7))).as("j"))
      .withColumn("r", pmod(col("idx") * 31 + col("j") * 17, lit(7)) - 3)
      .groupBy(col("vec_id"), col("j"))
      .agg(sum(col("q") * col("r")).as("dotj"))
      .groupBy(col("vec_id"))
      .agg(sum(when(col("dotj") > 0,
        expr("shiftleft(cast(1 as bigint), cast(j as int))")).otherwise(0L))
        .as("bucket"))
      .orderBy("vec_id")
    val opt = SimilarityOps.annLshBuckets(spark, sf)
    assert(opt.schema.map(f => (f.name, f.dataType)) ===
      naive.schema.map(f => (f.name, f.dataType)))
    assert(rows(opt) === rows(naive))
  }

  test("fused qualityLang == qualityScore JOIN langId") {
    val naive = TextOps.qualityScore(spark, sf)
      .select(col("doc_id"), col("n_tok"), col("quality_bp"))
      .join(TextOps.langId(spark, sf).select(col("doc_id"), col("pred_lang")),
        "doc_id")
      .orderBy("doc_id")
    val opt = TextOps.qualityLang(spark, sf).orderBy("doc_id")
    assert(opt.schema.map(f => (f.name, f.dataType)) ===
      naive.schema.map(f => (f.name, f.dataType)))
    assert(rows(opt) === rows(naive))
  }

  test("clusterCanonical init fold reaches the identity-init fixpoint") {
    // fixpoint = min reachable id per component; the init fold must not
    // change it, only reach it a round earlier. Naive: recompute via the
    // identity-init loop inline.
    val pairs = DedupOps.minhashVerified(spark, sf).select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .cache()
    var labels = edges.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("canon", col("doc_id"))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 25) {
      val nbrMin = edges
        .join(labels, edges("doc_b") === labels("doc_id"))
        .groupBy(edges("doc_a").as("nbr_doc")).agg(min(col("canon")).as("nbr_min"))
      val updated = labels
        .join(nbrMin, labels("doc_id") === nbrMin("nbr_doc"), "left")
        .select(col("doc_id"),
          least(col("canon"), coalesce(col("nbr_min"), col("canon"))).as("canon"),
          (col("nbr_min") < col("canon")).as("_low"))
        .cache()
      changed = updated.filter(col("_low")).count()
      labels = updated.drop("_low")
      rounds += 1
    }
    val naive = docs(spark).select(col("doc_id"))
      .join(labels.withColumnRenamed("canon", "c"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("c"), col("doc_id")).as("canonical_doc"))
      .withColumn("is_canonical",
        (col("doc_id") === col("canonical_doc")).cast("int"))
      .orderBy("doc_id")
    assert(rows(DedupOps.clusterCanonical(spark, sf)) === rows(naive))
    edges.unpersist()
  }
}
