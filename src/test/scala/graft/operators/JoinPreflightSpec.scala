package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JoinPreflightSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("estimated cardinality is EXACT and the skew rows are right") {
    val left = Seq(1L, 1L, 1L, 2L, 2L, 3L, 5L).toDF("k")
    val right = Seq(1L, 1L, 2L, 3L, 3L, 3L, 4L).toDF("j")
    val out = JoinPreflight.equiJoinMass(left, "k", right, "j", topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val actual = left.join(right, left("k") === right("j")).count()
    assert(out.head._5 === actual) // total_pairs column, any row
    // per-key: 1 -> 3*2=6, 2 -> 2*1=2, 3 -> 1*3=3; keys 4,5 unmatched
    assert(out.map(t => t._1 -> t._4).toMap === Map(1L -> 6L, 2L -> 2L, 3L -> 3L))
    // ordered by pairs desc, key asc; shares in ppm of the exact total
    assert(out.map(_._1).toSeq === Seq(1L, 3L, 2L))
    assert(out.map(_._6).toSeq === Seq(6L * 1000000 / 11, 3L * 1000000 / 11,
      2L * 1000000 / 11))
  }

  test("empty intersection prices to zero without dividing by it") {
    val left = Seq(1L, 2L).toDF("k")
    val right = Seq(3L, 4L).toDF("j")
    val out = JoinPreflight.equiJoinMass(left, "k", right, "j")
    assert(out.count() === 0L)
  }
}
