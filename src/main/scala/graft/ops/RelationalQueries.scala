package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * General relational operator coverage (SURVEY.md §2.2): scans, filters,
 * hash/sort aggregation, broadcast + shuffle joins, semi/anti joins, ranking
 * windows, top-k, set ops, rollup, scalar functions.
 *
 * FP discipline: monetary doubles are aggregated as DECIMAL in BOTH engines
 * (exact, order-independent) and emitted as DOUBLE of the exact decimal —
 * bit-identical across Spark and the DuckDB oracle regardless of
 * parallelism. Never sum raw doubles.
 */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private val dec = "decimal(38,6)"

  /** TPC-H Q1-style scan + hash aggregation with decimal-exact sums. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_quantity") > 5.0)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec)))
          .cast(dec)).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(38,6)) * (CAST(1 AS DECIMAL(38,6)) - CAST(l_discount AS DECIMAL(38,6))) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_quantity > 5.0
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** 3-way join: big-big shuffle join (lineitem x orders) + broadcast dim
    * (customer), revenue per market segment. */
  def joinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        sum((col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec)))
          .cast(dec)).cast("double").as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy("c_mktsegment")
  }

  val joinRevenueSql: String =
    """SELECT c_mktsegment,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(38,6)) * (CAST(1 AS DECIMAL(38,6)) - CAST(l_discount AS DECIMAL(38,6))) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
      |  count(DISTINCT o_orderkey) AS n_orders
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Left semi join: customers that have at least one 'F' order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  val semiJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_customers FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Left anti join: customers with no pending ('P') orders, per nation. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_orderstatus") === "P")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_nationkey")
  }

  val antiJoinSql: String =
    """SELECT c_nationkey, count(*) AS n_customers FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Ranking window: top-3 orders per customer by (totalprice, orderkey). */
  def windowTopPerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rnk")
  }

  val windowTopPerKeySql: String =
    """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rnk FROM orders)
      |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin

  /** Global top-k with deterministic tie-break. */
  def topK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .limit(20)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))

  val topKSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 20""".stripMargin

  /** Set op: nations with rich customers but no rich suppliers. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").filter(col("c_acctbal") > 9000)
      .select(col("c_nationkey").as("nationkey")).distinct()
    val s = t(spark, dir, "supplier").filter(col("s_acctbal") > 9000)
      .select(col("s_nationkey").as("nationkey")).distinct()
    c.except(s).orderBy("nationkey")
  }

  val setOpsSql: String =
    """SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
      |EXCEPT SELECT DISTINCT s_nationkey FROM supplier WHERE s_acctbal > 9000
      |ORDER BY nationkey""".stripMargin

  /** Rollup aggregation over region/nation of customers. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_regionkey"), col("n_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_regionkey").asc_nulls_first, col("n_nationkey").asc_nulls_first)
  }

  val rollupAggSql: String =
    // HAVING count(*) > 0: on EMPTY input DuckDB's ROLLUP still emits the
    // grand-total row (NULL, NULL, 0) while Spark emits zero rows; every
    // rollup group over non-empty input has count >= 1, so the clause only
    // aligns the empty-input case
    """SELECT n_regionkey, n_nationkey, count(*) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP (n_regionkey, n_nationkey)
      |HAVING count(*) > 0
      |ORDER BY n_regionkey ASC NULLS FIRST, n_nationkey ASC NULLS FIRST""".stripMargin

  /** Scalar function coverage: string/date/math, all integer-exact. */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderkey") < 1000)
      .select(
        col("o_orderkey"),
        upper(substring(col("o_orderpriority"), 1, 1)).as("pri"),
        length(col("o_orderpriority")).as("pri_len"),
        year(col("o_orderdate")).cast("int").as("yr"),
        month(col("o_orderdate")).cast("int").as("mo"),
        dayofmonth(col("o_orderdate")).cast("int").as("dom"),
        floor(col("o_totalprice")).cast("long").as("price_floor"),
        // % (sign-preserving) matches the oracle's %; pmod would diverge
        // on a negative key
        (col("o_orderkey") % 7).cast("long").as("key_mod"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("tag"))
      .orderBy("o_orderkey")

  val scalarFuncsSql: String =
    """SELECT o_orderkey, upper(substr(o_orderpriority, 1, 1)) AS pri,
      |  CAST(length(o_orderpriority) AS INT) AS pri_len,
      |  CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
      |  CAST(day(o_orderdate) AS INT) AS dom,
      |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
      |  CAST(o_orderkey % 7 AS BIGINT) AS key_mod,
      |  concat_ws('-', o_orderstatus, o_orderpriority) AS tag
      |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin

  /**
   * Approximate aggregates with a DETERMINISTIC sketch, hash-exact across
   * engines (unlike HLL/t-digest, whose internals differ):
   *
   *  - distinct-count: K-minimum-values (KMV) over the md5-derived 60-bit
   *    hash of l_partkey — the K-th smallest distinct hash h_K estimates
   *    distinct ≈ (K-1) * 2^60 / h_K (Bar-Yossef et al.'s KMV estimator),
   *    computed in exact integer arithmetic (DECIMAL / HUGEINT);
   *  - quantiles: exact lower-rank percentile over a deterministic 5%
   *    hash sample (md5(orderkey_linenumber) % 20 = 0) — the value is
   *    SELECTED, never arithmetically aggregated, so doubles stay
   *    bit-identical.
   *
   * Both are honest scale shapes: KMV is a distinct + per-group top-K; the
   * sample quantile sorts 5% of the data per group.
   */
  private val KMV_K = 64
  private val HashSpace = 1L << 60 // md5Long is 60-bit (15 hex chars)

  def approxAgg(spark: SparkSession, dir: String): DataFrame = {
    import TextOps.md5Long
    val li = t(spark, dir, "lineitem")
    val distinctHashes = li
      .select(col("l_returnflag"), md5Long(col("l_partkey").cast("string")).as("h"))
      .distinct()
    val wH = Window.partitionBy(col("l_returnflag")).orderBy(col("h"))
    val kth = distinctHashes
      .withColumn("rnk", row_number().over(wH))
      .filter(col("rnk") === KMV_K)
      .select(col("l_returnflag"), col("h").as("hk"))
      .withColumn("approx_parts",
        expr(s"CAST(CAST(${KMV_K - 1} AS DECIMAL(38,0)) * CAST($HashSpace AS DECIMAL(38,0)) div hk AS BIGINT)"))
    val samp = li
      .filter(md5Long(concat_ws("_", col("l_orderkey"), col("l_linenumber"))) % 20 === 0)
      .select(col("l_returnflag"), col("l_extendedprice").as("p"))
    val wP = Window.partitionBy(col("l_returnflag")).orderBy(col("p"))
    val counts = samp.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val quants = samp
      .withColumn("rnk", row_number().over(wP))
      .join(counts, "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        max(when(col("rnk") === expr("(n-1)*50 div 100 + 1"), col("p"))).as("p50_price"),
        max(when(col("rnk") === expr("(n-1)*99 div 100 + 1"), col("p"))).as("p99_price"),
        min(col("n")).as("sample_n"))
    kth.select(col("l_returnflag"), col("approx_parts"))
      .join(quants, "l_returnflag")
      .select(col("l_returnflag"), col("approx_parts"), col("sample_n"),
        col("p50_price"), col("p99_price"))
      .orderBy("l_returnflag")
  }

  val approxAggSql: String = {
    import TextOps.md5LongSql
    s"""WITH dh AS (
       |  SELECT DISTINCT l_returnflag, ${md5LongSql("CAST(l_partkey AS VARCHAR)")} AS h
       |  FROM lineitem),
       |kth AS (
       |  SELECT l_returnflag,
       |    CAST((CAST(${KMV_K - 1} AS HUGEINT) * $HashSpace) // h AS BIGINT) AS approx_parts
       |  FROM (SELECT l_returnflag, h,
       |          row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rnk
       |        FROM dh)
       |  WHERE rnk = $KMV_K),
       |samp AS (
       |  SELECT l_returnflag, l_extendedprice AS p FROM lineitem
       |  WHERE ${md5LongSql("concat_ws('_', l_orderkey, l_linenumber)")} % 20 = 0),
       |counts AS (SELECT l_returnflag, count(*) AS n FROM samp GROUP BY 1),
       |ranked AS (
       |  SELECT l_returnflag, p,
       |    row_number() OVER (PARTITION BY l_returnflag ORDER BY p) AS rnk
       |  FROM samp),
       |quants AS (
       |  SELECT r.l_returnflag,
       |    max(CASE WHEN rnk = (n-1)*50//100 + 1 THEN p END) AS p50_price,
       |    max(CASE WHEN rnk = (n-1)*99//100 + 1 THEN p END) AS p99_price,
       |    CAST(min(n) AS BIGINT) AS sample_n
       |  FROM ranked r JOIN counts c USING (l_returnflag) GROUP BY 1)
       |SELECT k.l_returnflag, approx_parts, sample_n, p50_price, p99_price
       |FROM kth k JOIN quants q USING (l_returnflag)
       |ORDER BY l_returnflag""".stripMargin
  }

  /** Queries with no SQL-expressible oracle (driver does rows-only). */
  val noOracle: Map[String, (SparkSession, String) => DataFrame] = Map.empty

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q1_agg" -> (q1Agg _, q1AggSql),
    "q_join_revenue" -> (joinRevenue _, joinRevenueSql),
    "q_semi_join" -> (semiJoin _, semiJoinSql),
    "q_anti_join" -> (antiJoin _, antiJoinSql),
    "q_window_top_per_key" -> (windowTopPerKey _, windowTopPerKeySql),
    "q_topk" -> (topK _, topKSql),
    "q_setops" -> (setOps _, setOpsSql),
    "q_rollup" -> (rollupAgg _, rollupAggSql),
    "q_scalar_funcs" -> (scalarFuncs _, scalarFuncsSql),
    "q_approx_agg" -> (approxAgg _, approxAggSql))
}
