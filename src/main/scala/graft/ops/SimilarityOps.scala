package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Similarity search over the `embeddings` table (vec_id, embedding:
 * array<float>, label).
 *
 * Determinism across engines: components are quantized to integers
 * (q = floor(v * 1000 + 0.5)) and all dot products / norms are exact
 * int64 sums — order-independent, no FP drift between Spark and DuckDB at
 * any parallelism. The ranking metric is the sign-adjusted scaled cosine²
 * in basis points: m = sign(dot) * (dot² * 10000) / (|a|²·|b|²), which is
 * monotone in cosine, so top-k by m == top-k by cosine.
 *
 * Scale: brute-force top-k broadcasts the (small) query side against the
 * full corpus — one shuffle on (query, candidate). The LSH variant buckets
 * by random-hyperplane signature so candidate generation is an equi-join on
 * the bucket key (the 100 TB path); near-dup is label-blocked the same way.
 */
object SimilarityOps {

  private val SCALE = 1000

  /** Quantized components: (vec_id, label, idx [1-based], q). */
  private def quantized(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("idx0", "v")))
      .select(col("vec_id"), col("label"), (col("idx0") + 1).as("idx"),
        floor(col("v").cast("double") * SCALE + 0.5).cast("long").as("q"))

  private val quantizedSql: String =
    s"""SELECT vec_id, label, e.i AS idx, e.q AS q FROM (
       |    SELECT vec_id, label, unnest(list_transform(range(1, len(embedding) + 1),
       |      i -> {'i': i, 'q': CAST(floor(CAST(embedding[i] AS DOUBLE) * $SCALE + 0.5) AS BIGINT)})) AS e
       |    FROM embeddings)""".stripMargin

  /** Norms: |v|² in quantized units. */
  private def norms(q: DataFrame): DataFrame =
    q.groupBy(col("vec_id")).agg(sum(col("q") * col("q")).as("n2"))

  private val normsSql: String =
    s"""SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n2 FROM quant GROUP BY 1"""

  /** Signed scaled cosine² in basis points (exact integer arithmetic).
    * The square is computed in DECIMAL(38,0) / HUGEINT: in int64,
    * dot*dot*10000 silently wraps once |dot| exceeds ~3e7 (≈30 unit-range
    * dims at this SCALE — Spark would emit wrong rankings with no error
    * while DuckDB raises), so the widened form is exact for any |dot| up
    * to ~1.8e16, i.e. every realistic dimension/scale combination. The
    * final value is ≤ 10000, cast back to BIGINT on both engines. */
  private[graft] val metricExpr =
    "CASE WHEN dot >= 0 THEN (CAST(dot AS DECIMAL(38,0)) * dot * 10000) div NULLIF(CAST(na AS DECIMAL(38,0)) * nb, 0) " +
      "ELSE -((CAST(dot AS DECIMAL(38,0)) * dot * 10000) div NULLIF(CAST(na AS DECIMAL(38,0)) * nb, 0)) END"
  private val metricSqlExpr =
    "CASE WHEN dot >= 0 THEN CAST((CAST(dot AS HUGEINT) * dot * 10000) // NULLIF(CAST(na AS HUGEINT) * nb, 0) AS BIGINT) " +
      "ELSE CAST(-((CAST(dot AS HUGEINT) * dot * 10000) // NULLIF(CAST(na AS HUGEINT) * nb, 0)) AS BIGINT) END"

  /**
   * Brute-force cosine top-k: for each query vector (vec_id < 10), the 5
   * nearest neighbors by cosine, rank-ordered with deterministic tie-break.
   */
  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val q = quantized(spark, dir)
    val n = norms(q)
    val queries = q.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("idx"), col("q").as("qq"))
    val cands = q.select(col("vec_id").as("nid"), col("idx"), col("q").as("cq"))
    val dots = queries.join(cands, Seq("idx"))
      .filter(col("qid") =!= col("nid"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("qq") * col("cq")).as("dot"))
    val scored = dots
      .join(n.select(col("vec_id").as("qid"), col("n2").as("na")), "qid")
      .join(n.select(col("vec_id").as("nid"), col("n2").as("nb")), "nid")
      .withColumn("cos2_bp", expr(metricExpr))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos2_bp").desc, col("nid").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("rnk"), col("nid"), col("cos2_bp"))
      .orderBy("qid", "rnk")
  }

  val annTopKSql: String =
    s"""WITH quant AS ($quantizedSql),
       |norms AS ($normsSql),
       |dots AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS nid, CAST(sum(a.q * b.q) AS BIGINT) AS dot
       |  FROM quant a JOIN quant b ON a.idx = b.idx AND a.vec_id < 10 AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT qid, nid, $metricSqlExpr AS cos2_bp
       |  FROM (SELECT d.qid, d.nid, d.dot, na.n2 AS na, nb.n2 AS nb
       |        FROM dots d JOIN norms na ON d.qid = na.vec_id
       |        JOIN norms nb ON d.nid = nb.vec_id))
       |SELECT qid, rnk, nid, cos2_bp FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY qid
       |    ORDER BY cos2_bp DESC, nid ASC) AS INT) AS rnk FROM scored)
       |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin

  /**
   * Brute-force cosine top-k, ARRAY-NATIVE: the dot product is computed
   * inside the row with `zip_with` + `aggregate` over the quantized vectors
   * instead of exploding components into rows — the corpus side streams
   * once and the (tiny) query side broadcasts, so there is NO shuffle and
   * no |dims|x row blowup. Same integer metric as [[annTopK]], so the two
   * variants are value-identical and share one oracle.
   */
  def annTopKArrays(spark: SparkSession, dir: String): DataFrame = {
    val q = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"),
          v => floor(v.cast("double") * SCALE + 0.5).cast("long")).as("qv"))
      .withColumn("n2",
        aggregate(col("qv"), lit(0L), (acc, x) => acc + x * x))
    val queries = q.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("qv").as("qa"), col("n2").as("na"))
    val cands = q.select(col("vec_id").as("nid"), col("qv").as("qb"), col("n2").as("nb"))
    // dot over the COMMON prefix: zip_with null-pads a length mismatch,
    // which would poison the whole sum to NULL, while the explode variant
    // (and the shared oracle) inner-join on idx — i.e. sum over common
    // indices. Slicing both sides to the shorter length makes ragged
    // inputs value-identical too; empty arrays are excluded like the
    // idx-join excludes them (no common index => no candidate pair).
    val common = least(size(col("qa")), size(col("qb")))
    val scored = cands.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("nid"))
      .filter(common > 0)
      .withColumn("dot",
        aggregate(zip_with(slice(col("qa"), lit(1), common),
            slice(col("qb"), lit(1), common), (x, y) => x * y),
          lit(0L), (acc, v) => acc + v))
      .withColumn("cos2_bp", expr(metricExpr))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos2_bp").desc, col("nid").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("rnk"), col("nid"), col("cos2_bp"))
      .orderBy("qid", "rnk")
  }

  /**
   * Random-hyperplane LSH bucketing: 8 deterministic integer hyperplanes
   * r_j(idx) = ((idx*31 + j*17) % 7) - 3; bucket bit j = [dot_j > 0].
   * Bucket-equal vectors are ANN candidates — candidate generation becomes
   * an equi-join on `bucket`, the scale path for 10^10 rows.
   */
  private def lshBuckets(q: DataFrame): DataFrame = {
    // 8 parallel hyperplane-dot aggregates per vector instead of exploding
    // every component row 8 ways and aggregating twice (8x fewer rows
    // through the pipeline, ONE exchange instead of two); the bucket bits
    // are then per-row arithmetic over the 8 sums — identical values
    val dots = Seq.range(0, 8).map(j =>
      sum(col("q") * (pmod(col("idx") * 31 + lit(j * 17), lit(7)) - 3))
        .as(s"_d$j"))
    q.groupBy(col("vec_id")).agg(dots.head, dots.tail: _*)
      .select(col("vec_id"),
        Seq.range(0, 8).map(j =>
          when(col(s"_d$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("bucket"))
  }

  def annLshBuckets(spark: SparkSession, dir: String): DataFrame =
    lshBuckets(quantized(spark, dir)).orderBy("vec_id")

  val annLshBucketsSql: String =
    s"""WITH quant AS ($quantizedSql),
       |dots AS (
       |  SELECT vec_id, j,
       |    CAST(sum(q * (((idx * 31 + j * 17) % 7) - 3)) AS BIGINT) AS dotj
       |  FROM (SELECT vec_id, idx, q, unnest(range(0, 8)) AS j FROM quant)
       |  GROUP BY 1, 2)
       |SELECT vec_id,
       |  CAST(sum(CASE WHEN dotj > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS bucket
       |FROM dots GROUP BY 1 ORDER BY vec_id""".stripMargin

  /**
   * Embedding-cosine near-duplicate pairs, blocked by `label` (the blocking
   * key stands in for an IVF/LSH partition at scale): pairs with
   * |cos|² >= 0.15 (1500 bp), sign-positive.
   */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val q = quantized(spark, dir)
    val n = norms(q)
    val a = q.select(col("label"), col("idx"), col("vec_id").as("va"), col("q").as("qa"))
    val b = q.select(col("label"), col("idx"), col("vec_id").as("vb"), col("q").as("qb"))
    // pin the probe side's clustering on the BLOCKING KEY alone: the dots
    // join fans every (label,idx) block out to n^2 products, so its cost is
    // per-ROW fan-out, not bytes — without the pin the whole product +
    // partial-agg ran as ONE task (byte-based AQE coalescing / broadcast
    // probe inheriting the single scan split). label-only clustering keeps
    // every (va,vb) pair's partial sum WITHIN one task (pinning on
    // (label,idx) was measured to multiply the partial-agg output by the
    // partition count — each pair's sum split across every idx partition).
    val dots = Tables.pinned(a, col("label"))
      .join(b, Seq("label", "idx"))
      .filter(col("va") < col("vb"))
      .groupBy(col("label"), col("va"), col("vb"))
      .agg(sum(col("qa") * col("qb")).as("dot"))
    dots
      .join(n.select(col("vec_id").as("va"), col("n2").as("na")), "va")
      .join(n.select(col("vec_id").as("vb"), col("n2").as("nb")), "vb")
      .withColumn("cos2_bp", expr(metricExpr))
      .filter(col("cos2_bp") >= 1500)
      .select(col("label"), col("va"), col("vb"), col("cos2_bp"))
      .orderBy("label", "va", "vb")
  }

  val embeddingNearDupSql: String =
    s"""WITH quant AS ($quantizedSql),
       |norms AS ($normsSql),
       |dots AS (
       |  SELECT a.label, a.vec_id AS va, b.vec_id AS vb, CAST(sum(a.q * b.q) AS BIGINT) AS dot
       |  FROM quant a JOIN quant b ON a.label = b.label AND a.idx = b.idx AND a.vec_id < b.vec_id
       |  GROUP BY 1, 2, 3)
       |SELECT label, va, vb, cos2_bp FROM (
       |  SELECT d.label, d.va, d.vb, $metricSqlExpr AS cos2_bp
       |  FROM (SELECT d0.label, d0.va, d0.vb, d0.dot, na.n2 AS na, nb.n2 AS nb
       |        FROM dots d0 JOIN norms na ON d0.va = na.vec_id
       |        JOIN norms nb ON d0.vb = nb.vec_id) d)
       |WHERE cos2_bp >= 1500 ORDER BY label, va, vb""".stripMargin

  /**
   * Embedding-cosine near-duplicate pairs blocked by the random-hyperplane
   * LSH bucket — the 100 TB composition: bucket cardinality is driven by
   * the hash (2^8 signatures), never by a data-dependent attribute like
   * `label`, whose hottest value makes label-blocking quadratic. Candidate
   * generation stays an equi-join on `bucket`; the same 1500 bp cosine²
   * threshold is applied to candidates that share a bucket.
   */
  def embeddingNearDupLsh(spark: SparkSession, dir: String): DataFrame = {
    val q = quantized(spark, dir)
    val n = norms(q)
    val qb = q.join(lshBuckets(q), "vec_id")
    val a = qb.select(col("bucket"), col("idx"), col("vec_id").as("va"), col("q").as("qa"))
    val b = qb.select(col("bucket"), col("idx"), col("vec_id").as("vb"), col("q").as("qb"))
    // same probe-side pin as the label-blocked variant (blocking key only —
    // see embeddingNearDup): product fan-out is per-row cost, byte-based
    // coalescing would serialize it
    val dots = Tables.pinned(a, col("bucket"))
      .join(b, Seq("bucket", "idx"))
      .filter(col("va") < col("vb"))
      .groupBy(col("bucket"), col("va"), col("vb"))
      .agg(sum(col("qa") * col("qb")).as("dot"))
    dots
      .join(n.select(col("vec_id").as("va"), col("n2").as("na")), "va")
      .join(n.select(col("vec_id").as("vb"), col("n2").as("nb")), "vb")
      .withColumn("cos2_bp", expr(metricExpr))
      .filter(col("cos2_bp") >= 1500)
      .select(col("bucket"), col("va"), col("vb"), col("cos2_bp"))
      .orderBy("bucket", "va", "vb")
  }

  val embeddingNearDupLshSql: String =
    s"""WITH quant AS ($quantizedSql),
       |norms AS ($normsSql),
       |bdots AS (
       |  SELECT vec_id, j,
       |    CAST(sum(q * (((idx * 31 + j * 17) % 7) - 3)) AS BIGINT) AS dotj
       |  FROM (SELECT vec_id, idx, q, unnest(range(0, 8)) AS j FROM quant)
       |  GROUP BY 1, 2),
       |buckets AS (
       |  SELECT vec_id,
       |    CAST(sum(CASE WHEN dotj > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM bdots GROUP BY 1),
       |qb AS (SELECT q.*, b.bucket FROM quant q JOIN buckets b USING (vec_id)),
       |dots AS (
       |  SELECT a.bucket, a.vec_id AS va, b.vec_id AS vb,
       |    CAST(sum(a.q * b.q) AS BIGINT) AS dot
       |  FROM qb a JOIN qb b ON a.bucket = b.bucket AND a.idx = b.idx
       |    AND a.vec_id < b.vec_id
       |  GROUP BY 1, 2, 3)
       |SELECT bucket, va, vb, cos2_bp FROM (
       |  SELECT d.bucket, d.va, d.vb, $metricSqlExpr AS cos2_bp
       |  FROM (SELECT d0.bucket, d0.va, d0.vb, d0.dot, na.n2 AS na, nb.n2 AS nb
       |        FROM dots d0 JOIN norms na ON d0.va = na.vec_id
       |        JOIN norms nb ON d0.vb = nb.vec_id) d)
       |WHERE cos2_bp >= 1500 ORDER BY bucket, va, vb""".stripMargin

  /**
   * IVF-style ANN with a TRAINED codebook: deterministic seed sampling
   * (the embeddings of vec_ids 0,17,34,...) followed by one integer-exact
   * k-means (Lloyd) refinement — assign every vector to its nearest seed,
   * recompute each cell's centroid as the truncated integer mean of its
   * members (sum div count: both engines truncate identically), then
   * re-assign against the refined centroids. Every vector lands in its
   * final cell (coarse quantizer) and queries probe ONLY their own cell —
   * the inverted-file structure that turns a corpus-wide scan into a
   * per-cell scan at 10^10 scale; each training step is one shuffle-keyed
   * aggregation, so the training itself scales the same way. Output: per
   * query (vec_id < 10), its cell and the top-3 same-cell neighbors.
   */
  private val NCELLS = 8
  def annIvfTopK(spark: SparkSession, dir: String): DataFrame = {
    val q = quantized(spark, dir)
    // argmax quantized dot to centroid, tie-break on cell — ONE definition
    // for the training and final assignments (a drifted copy would silently
    // desynchronize the codebook from the inverted file)
    def assign(src: DataFrame, cents: DataFrame): DataFrame = {
      val dots = src.join(cents, Seq("idx"))
        .groupBy(col("vec_id"), col("cell"))
        .agg(sum(col("q") * col("cq")).as("dot"))
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("dot").desc, col("cell").asc)
      dots.withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1).select(col("vec_id"), col("cell"))
    }
    val seeds = q.filter(pmod(col("vec_id"), lit(17)) === 0 && col("vec_id") < 17 * NCELLS)
      .select(expr("CAST(vec_id div 17 AS INT)").as("cell"), col("idx"), col("q").as("cq"))
    // TRAIN ON A SAMPLE (deterministic ~1-in-3 by id hash), the textbook
    // IVF shape: k-means quality needs only a representative subset, and a
    // full-corpus training assignment would double the corpus-wide k x n
    // work at 10^10 rows. Only the FINAL assignment touches every vector.
    val sample = q.filter(pmod(col("vec_id"), lit(3)) === 0)
    // Lloyd step: integer centroid of each seeded cell's SAMPLE members
    val cents1 = sample.join(assign(sample, seeds), "vec_id")
      .groupBy(col("cell"), col("idx"))
      .agg(expr("sum(q) div count(1)").as("cq"))
    val assigned = assign(q, cents1)
    // probe: brute-force INSIDE the query's cell only
    val qa = q.join(assigned, "vec_id")
    val queries = qa.filter(col("vec_id") < 10)
      .select(col("cell"), col("idx"), col("vec_id").as("qid"), col("q").as("qq"))
    val cands = qa.select(col("cell"), col("idx"), col("vec_id").as("nid"), col("q").as("cq"))
    val n = norms(q)
    val scored = queries.join(cands, Seq("cell", "idx"))
      .filter(col("qid") =!= col("nid"))
      .groupBy(col("cell"), col("qid"), col("nid"))
      .agg(sum(col("qq") * col("cq")).as("dot"))
      .join(n.select(col("vec_id").as("qid"), col("n2").as("na")), "qid")
      .join(n.select(col("vec_id").as("nid"), col("n2").as("nb")), "nid")
      .withColumn("cos2_bp", expr(metricExpr))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos2_bp").desc, col("nid").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("qid"), col("cell"), col("rnk"), col("nid"), col("cos2_bp"))
      .orderBy("qid", "rnk")
  }

  val annIvfTopKSql: String =
    s"""WITH quant AS ($quantizedSql),
       |norms AS ($normsSql),
       |seeds AS (
       |  SELECT CAST(vec_id // 17 AS INT) AS cell, idx, q AS cq FROM quant
       |  WHERE vec_id % 17 = 0 AND vec_id < ${17 * NCELLS}),
       |samp AS (SELECT * FROM quant WHERE vec_id % 3 = 0),
       |assign0 AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY dot DESC, cell ASC) AS rn FROM (
       |      SELECT a.vec_id, c.cell, CAST(sum(a.q * c.cq) AS BIGINT) AS dot
       |      FROM samp a JOIN seeds c ON a.idx = c.idx GROUP BY 1, 2))
       |  WHERE rn = 1),
       |cents AS (
       |  SELECT s.cell, q.idx, CAST(sum(q.q) // count(*) AS BIGINT) AS cq
       |  FROM samp q JOIN assign0 s USING (vec_id) GROUP BY 1, 2),
       |assign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY dot DESC, cell ASC) AS rn FROM (
       |      SELECT a.vec_id, c.cell, CAST(sum(a.q * c.cq) AS BIGINT) AS dot
       |      FROM quant a JOIN cents c ON a.idx = c.idx GROUP BY 1, 2))
       |  WHERE rn = 1),
       |qa AS (SELECT q.*, s.cell FROM quant q JOIN assign s USING (vec_id)),
       |scored AS (
       |  SELECT d.cell, d.qid, d.nid, $metricSqlExpr AS cos2_bp FROM (
       |    SELECT d0.cell, d0.qid, d0.nid, d0.dot, na.n2 AS na, nb.n2 AS nb FROM (
       |      SELECT a.cell, a.vec_id AS qid, b.vec_id AS nid,
       |        CAST(sum(a.q * b.q) AS BIGINT) AS dot
       |      FROM qa a JOIN qa b ON a.cell = b.cell AND a.idx = b.idx
       |        AND a.vec_id < 10 AND a.vec_id <> b.vec_id
       |      GROUP BY 1, 2, 3) d0
       |    JOIN norms na ON d0.qid = na.vec_id
       |    JOIN norms nb ON d0.nid = nb.vec_id) d)
       |SELECT qid, cell, rnk, nid, cos2_bp FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY qid
       |    ORDER BY cos2_bp DESC, nid ASC) AS INT) AS rnk FROM scored)
       |WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "ann_cosine_topk" -> (annTopK _, annTopKSql),
    // value-identical to ann_cosine_topk (same integer metric): one oracle
    "ann_cosine_topk_arrays" -> (annTopKArrays _, annTopKSql),
    "ann_lsh_buckets" -> (annLshBuckets _, annLshBucketsSql),
    "ann_ivf_topk" -> (annIvfTopK _, annIvfTopKSql),
    "dedup_embedding_cosine" -> (embeddingNearDup _, embeddingNearDupSql),
    "dedup_embedding_lsh" -> (embeddingNearDupLsh _, embeddingNearDupLshSql))
}
