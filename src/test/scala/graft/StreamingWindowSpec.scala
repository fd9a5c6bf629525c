package graft

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/**
 * Structured Streaming operator coverage beyond the CDC pipeline's needs:
 * event-time tumbling windows with a watermark (late data dropped), and
 * custom keyed state via mapGroupsWithState (running per-user session
 * counters). The CDC engine itself deliberately keeps state in the sink
 * table + checkpoint (SURVEY.md §2.2 streaming note) — these tests prove
 * the capabilities exist for workloads that do need them.
 */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked tumbling-window aggregation drops late events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val agg = input.toDF().toDF("ts", "user_id", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("win_out").start()
    try {
      input.addData((ts(0), 1L, 1.0), (ts(1), 1L, 2.0), (ts(6), 2L, 5.0))
      q.processAllAvailable()
      // advance the watermark far past the first windows
      input.addData((ts(40), 3L, 1.0))
      q.processAllAvailable()
      // a very late event for the (closed) first window must be dropped
      input.addData((ts(2), 1L, 100.0))
      q.processAllAvailable()
      input.addData((ts(55), 3L, 1.0)) // close remaining windows
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select(col("window.start").cast("string"), col("user_id"), col("n"), col("v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      // first 5-min window of user 1 counts ONLY the on-time events
      assert(rows.contains(("2024-01-01 10:00:00", 1L, 2L, 3.0)), rows)
      assert(rows.contains(("2024-01-01 10:05:00", 2L, 1L, 5.0)), rows)
      assert(!rows.exists(_._4 == 103.0), s"late event leaked: $rows")
      // nor as a SEPARATE append-mode row (the realistic leak shape: the
      // closed window re-fires as a new (n=1, v=100.0) output row)
      assert(!rows.exists(_._4 == 100.0), s"late event re-fired: $rows")
      assert(rows.count(r => r._1 == "2024-01-01 10:00:00" && r._2 == 1L) === 1,
        s"closed window must appear exactly once: $rows")
    } finally q.stop()
  }

  test("mapGroupsWithState maintains custom per-key running state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    def update(user: Long, events: Iterator[(Long, Double)],
               state: GroupState[(Long, Double)]): (Long, Long, Double) = {
      val (pn, pv) = state.getOption.getOrElse((0L, 0.0))
      var n = pn; var v = pv
      events.foreach { e => n += 1; v += e._2 }
      state.update((n, v))
      (user, n, v)
    }
    val out = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("state_out").start()
    try {
      input.addData((1L, 1.0), (1L, 2.0), (2L, 10.0))
      q.processAllAvailable()
      input.addData((1L, 3.0))
      q.processAllAvailable()
      val latest = spark.table("state_out")
        .groupBy(col("_1")).agg(max(struct(col("_2"), col("_3"))).as("s"))
        .select(col("_1"), col("s._2"), col("s._3"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(latest === Set((1L, 3L, 6.0), (2L, 1L, 10.0)))
    } finally q.stop()
  }
}
