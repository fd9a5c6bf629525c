package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import TextOps.{md5Long, md5LongSql}

/**
 * Deduplication operators for training-data pipelines over `documents`:
 * exact (hash), n-gram Jaccard, MinHash+LSH, SimHash, and (in
 * [[SimilarityOps]]) embedding-cosine near-dup.
 *
 * Scale design: every variant is shuffle-bounded by (shingle -> doc) or
 * (band-signature -> doc) inverted lists, never by an all-pairs cross join —
 * the candidate-pair generation is a self-equi-join on a blocking key, which
 * is exactly the shape that survives 100 TB. Hot shingles ARE dropped by a
 * document-frequency cap (a stop-shingle filter, [[ShingleCap]]) before the
 * join: a shingle present in f documents contributes f^2 candidate rows, so
 * without the cap one boilerplate phrase goes quadratic at scale. The cap is
 * applied symmetrically to the per-doc sizes, so Jaccard stays a true
 * similarity over the capped shingle sets in both engines.
 *
 * All similarity math is exact integer arithmetic (basis points via integer
 * division) for cross-engine determinism.
 */
object DedupOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "documents", spread = true) // md5/shingle-heavy

  /** Reclaim a localCheckpoint'd frame's storage immediately. The blocks
    * are the ONLY copy (checkpointing truncated the lineage), so this is
    * safe only once nothing will ever read the frame again — callers use
    * it on superseded iteration frontiers, never on a frame a returned
    * lazy DataFrame still references. */
  private def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Exact dedup: group identical content by hash, keep canonical min id. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "documents") // plain read: one md5 per DOC is
      // too light to repay the spread exchange (measured 0.26s -> 0.60s)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("canonical_doc"),
        count(lit(1)).as("n_copies"))
      .orderBy("content_hash")

  val exactSql: String =
    """SELECT md5(text) AS content_hash, min(doc_id) AS canonical_doc,
      |  count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin

  // Shared shingling: distinct 5-word grams per doc.
  private val N = 5
  private def shingled(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        explode(array_distinct(Shingles.grams(col("text"), N))).as("g"))

  private val shingledSql: String =
    s"""SELECT doc_id, unnest(list_distinct(${Shingles.gramsSql("text", N)})) AS g
       |  FROM documents""".stripMargin

  /** Stop-shingle document-frequency cap: shingles in more than this many
    * docs are dropped BEFORE the self-join (f docs => f^2 candidate rows). */
  val ShingleCap = 50

  /** Shingles HASHED to 64-bit longs inside the gram array (xxhash64,
    * whole-stage-codegen'd), distinct taken over the hashes: the Jaccard
    * pipeline only ever EQUATES grams — it never emits one — so an
    * 8-byte key replaces a ~30-byte string through the window exchange,
    * the window sort, and the self-join probe (guide §2.3 "narrower
    * types"). Distinct-by-hash == distinct-by-string up to a 64-bit
    * collision (~n^2/2^65; the DuckDB oracle compares the string-keyed
    * result at every scale factor, so a collision would fail loudly).
    * The minhash family is NOT routed through this: its sketch is
    * defined over md5(g) and must stay oracle-exact. */
  private def hashedShingles(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        explode(array_distinct(
          transform(Shingles.grams(col("text"), N), g => xxhash64(g)))).as("gh"))

  private def cappedShingles(spark: SparkSession, dir: String): DataFrame = {
    // document frequency as a whole-partition window over g rather than a
    // separate aggregate + anti-join: the window's hashpartitioning(g) is
    // exactly what the downstream self-join on g requires, so Catalyst
    // reuses ONE exchange (and one scan+shingling pass) for the cap and
    // both join sides instead of re-deriving the inverted list three times.
    // Skew caveat: the hottest shingle's entire posting list streams
    // through ONE task before the filter drops it — linear and spillable.
    // Benchmarked against the two-pass aggregate+anti-join variant below
    // under a manufactured every-doc hot shingle (see BENCH/BASELINE.md):
    // the window variant stays faster until the hot posting list dwarfs
    // the corpus, because the agg variant re-derives the shingling twice
    // and pays two extra exchanges. Kept as the default; the agg variant
    // is the escape hatch for corpora with 10^8-doc boilerplate.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("gh"))
    hashedShingles(spark, dir)
      .withColumn("df", count(lit(1)).over(w))
      .filter(col("df") <= ShingleCap)
      .drop("df")
  }

  /** Two-pass cap: map-side-combining df aggregate, then an anti-join
    * against the hot list. No single-task hot-shingle straggler (partial
    * aggregation absorbs the hot posting list per map task), at the price
    * of re-deriving the shingle list and two more exchanges. */
  private[graft] def cappedShinglesAgg(spark: SparkSession, dir: String): DataFrame = {
    val sh = hashedShingles(spark, dir)
    val hot = sh.groupBy(col("gh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > ShingleCap)
      .select(col("gh"))
    sh.join(hot, Seq("gh"), "left_anti")
  }

  private val cappedShinglesSql: String =
    s"""SELECT sh.doc_id, sh.g FROM sh
       |  WHERE sh.g NOT IN (
       |    SELECT g FROM sh GROUP BY g HAVING count(*) > $ShingleCap)""".stripMargin

  /**
   * N-gram Jaccard near-dup: frequency-capped inverted-list self-join on
   * shingle, candidate pairs scored |A∩B| / |A∪B| in basis points over the
   * capped shingle sets; pairs >= 2000 bp (0.2).
   */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    jaccardPairs(cappedShingles(spark, dir))

  /** Same pipeline over the two-pass (aggregate+anti-join) cap — the
    * extreme-skew escape hatch; output-identical to [[ngramJaccard]]. */
  private[graft] def ngramJaccardAggCap(spark: SparkSession, dir: String): DataFrame =
    jaccardPairs(cappedShinglesAgg(spark, dir))

  private def jaccardPairs(sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.as("a"); val b = sh.as("b")
    val pairs = a.join(b, col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard_bp", expr("(inter * 10000) div (na + nb - inter)"))
      .filter(col("jaccard_bp") >= 2000)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("na"), col("nb"),
        col("jaccard_bp"))
      .orderBy("doc_a", "doc_b")
  }

  val ngramJaccardSql: String =
    s"""WITH sh AS ($shingledSql),
       |shc AS ($cappedShinglesSql),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM shc a JOIN shc b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, inter, sa.n AS na, sb.n AS nb,
       |  (inter * 10000) // (sa.n + sb.n - inter) AS jaccard_bp
       |FROM pairs JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE (inter * 10000) // (sa.n + sb.n - inter) >= 2000
       |ORDER BY doc_a, doc_b""".stripMargin

  // MinHash parameters: K hash functions over a prime field, banded for LSH.
  private val K = 8
  private val P = 1000003L
  private def aCoef(j: Int): Long = 37L + 2L * j
  private def bCoef(j: Int): Long = 101L * j + 13L

  /** All K per-doc minhashes in ONE map-side-combined aggregation over the
    * shingle rows — (doc_id, _m0.._m7) — shared by [[minhashSignature]] and
    * [[minhashLsh]]. The previous shape exploded every shingle row K ways
    * (K x row blowup through the first exchange) and then needed a SECOND
    * exchange to band; K parallel min-aggregates evaluate the same seeded
    * hashes as plain projections per input row, shuffle only n_docs rows,
    * and leave banding a per-row projection. hj = pmod(a_j * h0 + b_j, P)
    * exactly as before (h0 < P ~ 1e6, a_j <= 51: no overflow). */
  private def minhashCols(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingled(spark, dir)
      .select(col("doc_id"), pmod(md5Long(col("g")), lit(P)).as("h0"))
    val aggs = Seq.range(0, K).map(j =>
      min(pmod(lit(aCoef(j)) * col("h0") + lit(bCoef(j)), lit(P))).as(s"_m$j"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * MinHash signatures: for each doc and each of K seeded linear hashes over
   * the shingle md5-hash, the minimum value — an unbiased Jaccard sketch.
   * (Computed as K parallel aggregates, unpivoted to the (doc_id, j,
   * minhash) contract rows AFTER the aggregation — n_docs x K tiny rows.)
   */
  def minhashSignature(spark: SparkSession, dir: String): DataFrame =
    minhashCols(spark, dir)
      .select(col("doc_id"),
        posexplode(array(Seq.range(0, K).map(j => col(s"_m$j")): _*))
          .as(Seq("j", "minhash")))
      .orderBy("doc_id", "j")

  val minhashSignatureSql: String = {
    val aCase = Seq.range(0, K).map(j => s"WHEN $j THEN ${aCoef(j)}").mkString(" ")
    val bCase = Seq.range(0, K).map(j => s"WHEN $j THEN ${bCoef(j)}").mkString(" ")
    s"""WITH sh AS ($shingledSql)
       |SELECT doc_id, CAST(j AS INT) AS j,
       |  min((CASE j $aCase END * h0 + CASE j $bCase END) % $P) AS minhash
       |FROM (SELECT doc_id, ${md5LongSql("g")} % $P AS h0, unnest(range(0, $K)) AS j FROM sh)
       |GROUP BY doc_id, j ORDER BY doc_id, j""".stripMargin
  }

  /**
   * MinHash LSH candidate pairs: K/2-band signatures (2 rows per band);
   * docs sharing any band bucket are near-dup candidates. The band
   * signature is the blocking key — the join never goes all-pairs.
   */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    // band signature m_{2b} * P + m_{2b+1} as a per-row projection over the
    // K aggregated minhash columns (identical to the old sum-of-pieces per
    // (doc, band): even piece = minhash * P, odd piece = minhash) — no
    // second aggregation, no K x row explode before the exchange
    val bandStructs = Seq.range(0, K / 2).map { b =>
      struct(lit(b).as("band"),
        (col(s"_m${2 * b}") * P + col(s"_m${2 * b + 1}")).as("sig"))
    }
    val banded = minhashCols(spark, dir)
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
        && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy("doc_a", "doc_b")
  }

  val minhashLshSql: String =
    s"""WITH sig AS (${minhashSignatureSql.replace("ORDER BY doc_id, j", "")}),
       |banded AS (
       |  SELECT doc_id, j // 2 AS band,
       |    CAST(sum(CASE WHEN j % 2 = 0 THEN minhash * $P ELSE minhash END) AS BIGINT) AS sig
       |  FROM sig GROUP BY 1, 2)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
       |FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin

  /**
   * The full two-stage near-dup pipeline — THE shape that survives 100 TB:
   * banded-LSH candidate generation (hash-bounded equi-join, no all-pairs)
   * followed by exact Jaccard verification computed ONLY on the candidate
   * pairs. The candidate set's size is DATA-DEPENDENT (it grows with corpus
   * size and duplication rate), so no broadcast hint is forced: AQE sizes
   * the join at runtime — small candidate sets broadcast, large ones
   * degrade gracefully to a shuffle join instead of OOMing the driver.
   * Output: verified pairs with their exact similarity.
   */
  def minhashVerified(spark: SparkSession, dir: String): DataFrame =
    minhashVerifiedCheckpointed(spark, dir)._1

  /** [[minhashVerified]] plus a handle on the eagerly checkpointed
    * candidate set, so a caller that MATERIALIZES a derivative of the
    * result (clusterCanonical checkpoints its edge list) can release the
    * candidate blocks immediately instead of leaving them to the
    * ContextCleaner — DedupCapSpec pins that only the final frontier
    * survives a clusterCanonical call. Callers of the plain
    * [[minhashVerified]] return a lazy frame whose plan still reads the
    * candidate blocks, so there the ContextCleaner lifecycle is correct. */
  private def minhashVerifiedCheckpointed(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // Candidate pairs are SPARSE relative to the corpus (that is the whole
    // point of LSH blocking), so materialize them once — localCheckpoint,
    // the same move clusterCanonical makes for its edge list; without it
    // the two consumers below would each re-derive the full LSH pipeline —
    // and SEMI-JOIN-PRUNE every corpus-wide side of the verification
    // (guide §3.2 "reduce the big side before shuffling it"): the
    // gram-intersection sides and the size aggregate then process only
    // CANDIDATE documents' shingles instead of the whole corpus. Before
    // this, the verify join carried the full shingle set twice (the local
    // plan even broadcast all of it, ~1.5M rows at sf0.1, off a stale
    // pre-explode size estimate). Semantics unchanged: every downstream
    // join is inner on doc_a/doc_b ∈ cands ⊆ candDocs, and a retained
    // doc's shingle rows (hence its size n) are untouched by the semi join.
    val cands = minhashLsh(spark, dir).select(col("doc_a"), col("doc_b"))
      .localCheckpoint()
    val candDocs = cands.select(col("doc_a").as("doc_id"))
      .union(cands.select(col("doc_b").as("doc_id"))).distinct()
    // exact-verification intersections only EQUATE grams — the hashed
    // shingles (8-byte join key) replace the string grams here just as in
    // the Jaccard pipeline; sizes count the same distinct sets
    val sh = hashedShingles(spark, dir)
      .join(candDocs, Seq("doc_id"), "left_semi")
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("doc_a"), col("gh"))
    val b = sh.select(col("doc_id").as("doc_b"), col("gh"))
    val pairGrams = cands.join(a, "doc_a").join(b, Seq("doc_b", "gh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val verified = pairGrams
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard_bp", expr("(inter * 10000) div (na + nb - inter)"))
      .filter(col("jaccard_bp") >= 2000)
      .select(col("doc_a"), col("doc_b"), col("jaccard_bp"))
      .orderBy("doc_a", "doc_b")
    (verified, cands)
  }

  val minhashVerifiedSql: String =
    s"""WITH cands AS (${minhashLshSql.replace("ORDER BY doc_a, doc_b", "")}),
       |sh AS ($shingledSql),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |pg AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS inter
       |  FROM cands c
       |  JOIN sh a ON a.doc_id = c.doc_a
       |  JOIN sh b ON b.doc_id = c.doc_b AND b.g = a.g
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, (inter * 10000) // (sa.n + sb.n - inter) AS jaccard_bp
       |FROM pg JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE (inter * 10000) // (sa.n + sb.n - inter) >= 2000
       |ORDER BY doc_a, doc_b""".stripMargin

  /**
   * Near-dup CLUSTER CANONICALIZATION — the step a training-data pipeline
   * actually ships: verified near-dup pairs form an undirected graph;
   * every document maps to the MINIMUM doc_id reachable in its connected
   * component (the cluster's canonical representative), singletons map to
   * themselves. Downstream "keep one per cluster" is then a single filter
   * (doc_id == canonical_doc).
   *
   * Scale shape: iterative min-label propagation — each round is one
   * shuffle join on doc_id + a map-side-combining min aggregation, and the
   * round count is the component DIAMETER, which for near-dup clusters is
   * tiny (dup clusters are dense cliques from the LSH band join). The
   * label frontier is checkpointed each round to cut plan lineage. For
   * adversarial long-chain graphs the known upgrade is large-star/
   * small-star contraction (O(log n) rounds); not needed for dup graphs.
   */
  def clusterCanonical(spark: SparkSession, dir: String): DataFrame = {
    val (verified, cands) = minhashVerifiedCheckpointed(spark, dir)
    val pairs = verified.select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint() // computed once; reused every round
    // `edges` is materialized above; nothing downstream reads the verify
    // pipeline (hence the LSH candidate checkpoint) again — release it now
    // rather than holding candidate-pair blocks for the whole propagation
    releaseLocalCheckpoint(cands)
    // Init = identity FOLDED WITH the first propagation round: every vertex
    // starts at min(self, min(neighbors)) — one aggregation over the edge
    // list, the same cost as the old distinct() identity init, but one full
    // propagation round (join + agg + checkpoint action) cheaper to the
    // identical fixpoint (dup cliques now converge at init; the loop's
    // first pass just verifies). Vertex set unchanged: distinct doc_a.
    var labels = edges.groupBy(col("doc_a").as("doc_id"))
      .agg(min(col("doc_b")).as("_mn"))
      .select(col("doc_id"), least(col("doc_id"), col("_mn")).as("canon"))
      .localCheckpoint()
    // One cheap pre-loop count over the already-materialized frontier: a
    // zero-row frontier must skip the loop entirely, because AQE's
    // empty-relation propagation can drop the CollectMetrics node from an
    // all-empty plan and the observation below would then never resolve
    // (CLAUDE.md lesson 8). Inside the loop the frontier is non-empty.
    var changed = if (labels.count() > 0) 1L else 0L
    var rounds = 0
    while (changed > 0 && rounds < 25) {
      val nbrMin = edges
        .join(labels, edges("doc_b") === labels("doc_id"))
        .groupBy(edges("doc_a").as("nbr_doc")).agg(min(col("canon")).as("nbr_min"))
      // The convergence check RIDES the round's one materializing action
      // (the eager localCheckpoint) as an observe metric: `nbr_min < canon`
      // iff this round lowered the label — no second driver-synchronized
      // count() job per round. (`null < canon` is null, which count(when)
      // skips, so untouched rows don't count as changes.)
      val obs = org.apache.spark.sql.Observation()
      val updated = labels
        .join(nbrMin, labels("doc_id") === nbrMin("nbr_doc"), "left")
        .select(col("doc_id"),
          least(col("canon"), coalesce(col("nbr_min"), col("canon"))).as("canon"),
          (col("nbr_min") < col("canon")).as("_lowered"))
        .observe(obs, count(when(col("_lowered"), 1)).as("changed"))
        .drop("_lowered")
        .localCheckpoint()
      changed = obs.get.get("changed").map(_.asInstanceOf[Long]).getOrElse(0L)
      // The superseded frontier's checkpoint blocks are the only copy of a
      // dead dataset; reclaim them NOW instead of waiting for the
      // ContextCleaner to GC O(rounds) accumulated copies. Safe: `updated`
      // is already materialized, nothing reads the old frontier again.
      releaseLocalCheckpoint(labels)
      labels = updated
      rounds += 1
    }
    releaseLocalCheckpoint(edges) // the result below reads only `labels`
    // Wrong silently is worse than loud: a component with diameter > 25
    // (adversarial chain graphs — dup clusters are dense cliques and
    // converge in 2-3 rounds) would otherwise ship non-minimal canonical
    // ids and "keep one per cluster" would keep several. The documented
    // upgrade for such graphs is large-star/small-star contraction.
    if (changed > 0) throw new IllegalStateException(
      s"clusterCanonical did not converge in $rounds rounds " +
        s"($changed labels still changing) — component diameter exceeds " +
        "the round budget; raise it or use star-contraction for this graph")
    docs(spark, dir).select(col("doc_id"))
      .join(labels.withColumnRenamed("canon", "c"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("c"), col("doc_id")).as("canonical_doc"))
      .withColumn("is_canonical",
        (col("doc_id") === col("canonical_doc")).cast("int"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle: exact transitive closure via a recursive CTE (min
    * reachable id == the fixpoint the label propagation converges to).
    * Closure is O(component^2) rows — fine at oracle scale, which is why
    * the Spark side uses propagation instead. */
  val clusterCanonicalSql: String =
    s"""WITH RECURSIVE vp AS (
       |  SELECT doc_a, doc_b FROM (
       |    ${minhashVerifiedSql.replace("ORDER BY doc_a, doc_b", "")}) t),
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM vp
       |  UNION SELECT doc_b, doc_a FROM vp),
       |reach AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
       |canon AS (
       |  SELECT u AS doc_id, least(u, min(v)) AS canonical_doc
       |  FROM reach GROUP BY u)
       |SELECT d.doc_id AS doc_id,
       |  COALESCE(c.canonical_doc, d.doc_id) AS canonical_doc,
       |  CAST(d.doc_id = COALESCE(c.canonical_doc, d.doc_id) AS INT) AS is_canonical
       |FROM documents d LEFT JOIN canon c ON d.doc_id = c.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /**
   * SimHash: 16-bit locality-sensitive fingerprint — per bit, sum +1/-1
   * over distinct-token hashes; bit set iff the sum is positive.
   */
  private val SIMBITS = 16
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    // SIMBITS parallel signed-sum aggregates per doc instead of exploding
    // every token row SIMBITS ways and aggregating twice: the per-bit
    // contribution is a projection of the token hash, so ONE map-side-
    // combined aggregation computes all 16 sums (16x fewer rows through
    // the pipeline, one exchange instead of two). simhash and n_bits are
    // then per-row arithmetic over the sums: the old second aggregation
    // summed shiftleft(1,b) over exactly the SIMBITS (doc,b) rows every
    // doc with >= 1 token has, so n_bits == SIMBITS identically.
    val tok = Tables.read(spark, dir, "documents") // plain read: simhash's
      // per-row work (short-token md5) measured too light to repay the
      // spread exchange the shingle-heavy queries want
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("t"))
      .select(col("doc_id"), md5Long(col("t")).as("h"))
    val sums = Seq.range(0, SIMBITS).map(b =>
      sum(when(expr(s"shiftright(h, $b)").bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"_s$b"))
    tok.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        Seq.range(0, SIMBITS).map(b =>
          when(col(s"_s$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("simhash"),
        lit(SIMBITS.toLong).as("n_bits"))
      .orderBy("doc_id")
  }

  val simhashSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, ${md5LongSql("t")} AS h FROM (
       |    SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
       |    FROM documents)),
       |bits AS (
       |  SELECT doc_id, b, CAST(sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s
       |  FROM (SELECT doc_id, h, unnest(range(0, $SIMBITS)) AS b FROM tok)
       |  GROUP BY doc_id, b)
       |SELECT doc_id,
       |  CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS simhash,
       |  count(*) AS n_bits
       |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "dedup_exact" -> (exact _, exactSql),
    "dedup_ngram_jaccard" -> (ngramJaccard _, ngramJaccardSql),
    "dedup_minhash_sig" -> (minhashSignature _, minhashSignatureSql),
    "dedup_minhash_lsh" -> (minhashLsh _, minhashLshSql),
    "dedup_minhash_verified" -> (minhashVerified _, minhashVerifiedSql),
    "dedup_cluster_canonical" -> (clusterCanonical _, clusterCanonicalSql),
    "dedup_simhash" -> (simhash _, simhashSql))
}
