package graft

import org.apache.spark.sql.functions._
import graft.ops.{EventTimeOps, SimilarityOps}

/**
 * Cross-engine semantics pinned with ADVERSARIAL inputs the parquet
 * testdata never contains: pre-epoch timestamps, zero-norm embeddings,
 * keys past 2^53 — the cases where Spark and the DuckDB oracle can
 * silently diverge (verified against DuckDB 1.0: integer `//` TRUNCATES
 * toward zero, `x // 0` is NULL, `%` keeps the dividend's sign).
 */
class CrossEngineSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("floorDiv floors (never truncates) — incl. pre-epoch and huge magnitudes") {
    val n = 600000000L
    // expectations = Math.floorDiv, which the oracle-side floorDivSql
    // identity ((x - ((x % n + n) % n)) // n) reproduces in DuckDB
    // byte-for-byte (verified for exactly these values)
    val xs = Seq(-1L, -n, -n - 1, -3 * n / 2, 0L, 1L, n, n + 1, -(1L << 61))
    val got = xs.toDF("x")
      .select(EventTimeOps.floorDiv(col("x"), n).as("w"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === xs.map(Math.floorDiv(_, n)))
    // and the SQL identity renders the same formula the doc promises
    assert(EventTimeOps.floorDivSql("t", 10L) ===
      "((t - (((t % 10) + 10) % 10)) // 10)")
  }

  test("cosine metric on a zero-norm vector yields NULL, never a crash") {
    // ANSI mode is Spark 4's default: an unguarded `div 0` would throw
    // SparkArithmeticException while the oracle's `// 0` returns NULL —
    // crash vs rows. NULLIF aligns both on NULL.
    val rows = Seq((10L, 0L, 25L), (10L, 4L, 25L), (-10L, 0L, 0L))
      .toDF("dot", "na", "nb")
      .selectExpr(s"CAST(${SimilarityOps.metricExpr} AS BIGINT) AS m")
      .collect()
    assert(rows(0).isNullAt(0), "na = 0 must yield NULL")
    assert(!rows(1).isNullAt(0) && rows(1).getLong(0) === 10000L)
    assert(rows(2).isNullAt(0), "na = nb = 0 must yield NULL")
  }

  test("exact integer division for grouping keys past 2^53") {
    // double division rounds above 2^53; `div` is exact 64-bit and
    // truncates toward zero exactly like DuckDB's integer `//`
    val bigs = Seq((1L << 60) + 5L, (1L << 61) + 7L, (1L << 62) + 9L,
      6921234567890123457L)
    val rows = bigs.toDF("event_id")
      .select(col("event_id"),
        (col("event_id") / 10).cast("long").as("viaDouble"),
        expr("event_id div 10").as("viaDiv"))
      .collect()
    rows.foreach(r =>
      assert(r.getLong(2) === r.getLong(0) / 10, s"div inexact for ${r.getLong(0)}"))
    assert(rows.exists(r => r.getLong(1) !== r.getLong(0) / 10),
      "premise: double division must be inexact for at least one value")
  }

  test("% keeps the dividend's sign in both engines (pmod does not)") {
    val r = Seq(-7L).toDF("k")
      .select((col("k") % 8).as("m"), pmod(col("k"), lit(8)).as("p"))
      .head()
    assert(r.getLong(0) === -7L) // matches DuckDB -7 % 8 = -7
    assert(r.getLong(1) === 1L)  // pmod would have diverged
  }

  test("keep-last ties broken deterministically across partitionings") {
    // duplicate event_id with different payloads: the full-struct max_by
    // ordering (and the oracle's multi-key ORDER BY) must pick the same
    // row no matter how the data is partitioned
    val dup = Seq(
      (1L, 5L, "click", 2.0), (1L, 5L, "purchase", 1.0), (1L, 3L, "view", 9.0))
      .toDF("user_id", "event_id", "event_type", "value")
    def keepLast(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_id"), col("event_type"), col("value")),
        struct(col("event_id"), col("event_type"), col("value"))).as("w"))
      .select(col("user_id"), col("w.event_type")).head()
    val a = keepLast(dup.repartition(1))
    val b = keepLast(dup.repartition(7))
    assert(a === b)
    assert(a.getString(1) === "purchase") // "purchase" > "click" lexicographically
  }
}
