package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.types._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.lake.LakeTable

/**
 * ScalaCheck property (SURVEY.md §5): any random interleaving of
 * insert/update/delete operations per key, replayed under any micro-batch
 * partitioning, converges to the same final state as a sequential
 * in-memory fold — a strengthening the reference's set-based eventual
 * checks (KinesisReceivesPostgresChangesIT.java:156-198) never had.
 *
 * Generators are driven directly with fixed seeds (Spark jobs are too
 * expensive for hundreds of ScalaCheck trials; 5 seeded cases x ~40 ops
 * exercise the space deterministically).
 */
class ConvergencePropertySpec extends SparkSpec {
  import spark.implicits._

  val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("v", StringType)))

  sealed trait Op { def id: Int }
  case class Put(id: Int, kind: String, v: String) extends Op
  case class Del(id: Int) extends Op

  val genOp: Gen[Op] = for {
    id <- Gen.choose(1, 8) // few keys => many per-key collisions
    op <- Gen.frequency(
      4 -> Gen.alphaLowerStr.map(s => Put(id, "insert", s.take(6))),
      4 -> Gen.alphaLowerStr.map(s => Put(id, "update", s.take(6))),
      2 -> Gen.const(Del(id)))
  } yield op

  val genCase: Gen[(List[Op], List[Int])] = for {
    ops <- Gen.nonEmptyListOf(genOp)
    // random batch boundaries: sizes that partition the op list
    cuts <- Gen.listOfN(3, Gen.choose(1, math.max(1, ops.size)))
  } yield (ops, cuts)

  private def line(lsn: Long, op: Op): String = op match {
    case Put(id, kind, v) =>
      val old = if (kind == "update")
        s""","oldkeys":{"keynames":["id"],"keytypes":["integer"],"keyvalues":[$id]}"""
      else ""
      s"""{"lsn":$lsn,"xid":$lsn,"change":[{"kind":"$kind","schema":"public","table":"t",""" +
        s""""columnnames":["id","v"],"columntypes":["integer","text"],""" +
        s""""columnvalues":[$id,"$v"]$old}]}"""
    case Del(id) =>
      s"""{"lsn":$lsn,"xid":$lsn,"change":[{"kind":"delete","schema":"public","table":"t",""" +
        s""""oldkeys":{"keynames":["id"],"keytypes":["integer"],"keyvalues":[$id]}}]}"""
  }

  private def foldExpected(ops: List[Op]): Map[Int, String] =
    ops.foldLeft(Map.empty[Int, String]) {
      case (m, Put(id, _, v)) => m.updated(id, v)
      case (m, Del(id)) => m.removed(id)
    }

  test("property: random op interleavings + random batching converge to the fold") {
    val params = Gen.Parameters.default.withSize(40)
    val cases = (1 to 5).flatMap(i => genCase(params, Seed(i.toLong)))
    assert(cases.size === 5)
    cases.foreach { case (ops, cuts) =>
      val lines = ops.zipWithIndex.map { case (op, i) => line(i + 1L, op) }
      val t = new LakeTable(spark, tmpDir("prop"))
      t.create(schema, Seq("id"), nBuckets = 3)
      // split into batches at the (sorted, deduped) cut points
      val bounds = (cuts.map(c => c % lines.size).filter(_ > 0).sorted.distinct
        :+ lines.size).distinct
      var from = 0
      bounds.foreach { to =>
        if (to > from) {
          val df = spark.createDataset(lines.slice(from, to)).toDF("value")
          MergeEngine.applyBatch(t, ChangeDecoder.decode(df))
          from = to
        }
      }
      val got = t.read().collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(got === foldExpected(ops), s"ops=$ops cuts=$cuts")
    }
  }
}
