package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Event-time operators over the `events` stream table — the batch-checkable
 * analogs of the streaming windows (StreamingWindowSpec proves the streaming
 * side; these give the same semantics a DuckDB oracle):
 *
 *  - tumbling window aggregation (integer epoch-bucket arithmetic — no
 *    timezone/timestamp-format drift between engines);
 *  - gap-based sessionization (lag + running sum — the session-window
 *    primitive);
 *  - AS-OF JOIN, the operator Spark lacks natively, composed scale-first as
 *    a MERGE-AS-OF: union the two tagged streams, one window pass carries
 *    the last right-side value forward per key. This is O(n log n) within
 *    each key partition and never builds candidate pairs — the shape that
 *    survives 10^10 rows, unlike a theta-join on (l.ts >= r.ts) which
 *    Catalyst would execute as a per-key cross product.
 *
 * All numeric outputs are integer-exact or decimal-exact for cross-engine
 * hash parity.
 */
object EventTimeOps {

  private def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")

  private val TenMinUs = 600L * 1000000L
  private val SessionGapUs = 1800L * 1000000L // 30 min

  /** FLOOR division on integral columns — the principled tumbling-window
    * id: the window covering [-n, 0) is -1, never merged with [0, n).
    * NEITHER engine floors natively on integers (Spark's `/`+cast AND
    * DuckDB's `//` both truncate toward zero — measured: -7 // 2 = -3 in
    * DuckDB 1.0), so BOTH sides must spell the floor out explicitly: here
    * via pmod (always non-negative, so (x - pmod(x, n)) is exactly
    * divisible and the quotient is exact in double for any |x| < 2^53),
    * and in the oracle SQL via the same (x - ((x % n + n) % n)) // n
    * identity in exact integer arithmetic — see [[floorDivSql]]. */
  private[graft] def floorDiv(x: Column, n: Long): Column =
    ((x - pmod(x, lit(n))) / n).cast("long")

  /** The oracle-side floor division matching [[floorDiv]] exactly,
    * including pre-epoch (negative) timestamps. */
  private[graft] def floorDivSql(x: String, n: Long): String =
    s"(($x - ((($x % $n) + $n) % $n)) // $n)"

  /** Tumbling 10-minute windows per event type: counts + exact sums. */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(floorDiv(unix_micros(col("ts").cast("timestamp")), TenMinUs).as("win10m"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(38,6)")).cast("double").as("sum_value"))
      .orderBy("win10m", "event_type")

  val tumblingSql: String =
    s"""SELECT CAST(${floorDivSql("epoch_us(ts)", TenMinUs)} AS BIGINT) AS win10m, event_type,
       |  count(*) AS n_events,
       |  CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY win10m, event_type""".stripMargin

  /** Gap-based sessions (30-min inactivity closes a session) per user. */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    val wo = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts").cast("timestamp")).as("tus"))
      .withColumn("prev", lag(col("tus"), 1).over(wo))
      .withColumn("new_s",
        when(col("prev").isNull || col("tus") - col("prev") > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("tus")).as("start_us"), max(col("tus")).as("end_us"))
      .orderBy("user_id", "session_id")
  }

  val sessionsSql: String =
    s"""WITH t AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS tus,
       |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
       |  FROM events),
       |s AS (
       |  SELECT *, CAST(sum(CASE WHEN prev IS NULL OR tus - prev > $SessionGapUs
       |      THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY user_id ORDER BY tus, event_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM t)
       |SELECT user_id, session_id, count(*) AS n_events,
       |  min(tus) AS start_us, max(tus) AS end_us
       |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin

  /**
   * AS-OF join: each purchase matched to the user's most recent click at or
   * before it (null if none yet). Merge-as-of: right-side rows sort BEFORE
   * a left-side row at the same timestamp (side 0 < 1 = inclusive <=); one
   * forward window pass carries the last click id.
   */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tus"),
        col("event_id"), lit(null).cast("long").as("click_id"),
        lit(1).as("side"), col("event_id").as("oid"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tus"),
        lit(null).cast("long").as("event_id"), col("event_id").as("click_id"),
        lit(0).as("side"), col("event_id").as("oid"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("side"), col("oid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("asof_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("tus").as("purchase_us"),
        col("asof_click_id"))
      .orderBy("event_id")
  }

  val asofJoinSql: String =
    """WITH tagged AS (
      |  SELECT user_id, epoch_us(ts) AS tus, event_id,
      |    CAST(NULL AS BIGINT) AS click_id, 1 AS side, event_id AS oid
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, epoch_us(ts), CAST(NULL AS BIGINT), event_id, 0, event_id
      |  FROM events WHERE event_type = 'click'),
      |w AS (
      |  SELECT *, last_value(click_id IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY tus, side, oid
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_id
      |  FROM tagged)
      |SELECT event_id, user_id, tus AS purchase_us, asof_click_id
      |FROM w WHERE side = 1 ORDER BY event_id""".stripMargin

  /**
   * RANGE (interval) JOIN, composed scale-first: error events open 10-minute
   * incident windows [t0, t0+10min); count ALL events falling inside each
   * window. A naive theta-join (e.ts >= t0 AND e.ts < t1) has no equality
   * key, so Catalyst would execute it as a cross product — instead the time
   * axis is BUCKETIZED at the window length: each incident explodes into
   * the <= 2 ten-minute buckets it overlaps (interval length == bucket
   * width), each event owns exactly ONE bucket, and the join becomes a
   * bucket equi-join + residual range filter. No pair blowup, no duplicate
   * (incident, event) pairs (the event's bucket is unique), shuffle keyed
   * by time bucket — the standard web-scale interval-join shape.
   */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_id"), col("ts"),
        floorDiv(unix_micros(col("ts").cast("timestamp")), TenMinUs).as("b"))
    val incidents = events(spark, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"),
        unix_micros(col("ts").cast("timestamp")).as("t0us"))
      .withColumn("t1us", col("t0us") + TenMinUs)
      .withColumn("b", explode(sequence(
        floorDiv(col("t0us"), TenMinUs),
        floorDiv(col("t1us") - 1, TenMinUs))))
    incidents.join(ev, "b")
      .filter(unix_micros(col("ts").cast("timestamp")) >= col("t0us") &&
        unix_micros(col("ts").cast("timestamp")) < col("t1us"))
      .groupBy(col("incident_id"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("incident_id")
  }

  /** Oracle: the direct theta range join (fine at oracle scale). */
  val rangeJoinSql: String =
    """WITH inc AS (
      |  SELECT event_id AS incident_id, ts AS t0, ts + INTERVAL 10 MINUTE AS t1
      |  FROM events WHERE event_type = 'error')
      |SELECT i.incident_id, count(*) AS n_events
      |FROM inc i JOIN events e ON e.ts >= i.t0 AND e.ts < i.t1
      |GROUP BY 1 ORDER BY incident_id""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_event_tumbling" -> (tumbling _, tumblingSql),
    "q_event_sessions" -> (sessions _, sessionsSql),
    "q_asof_join" -> (asofJoin _, asofJoinSql),
    "q_range_join" -> (rangeJoin _, rangeJoinSql))
}
