package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** JL sign projection: deterministic matrix, exact fold semantics,
  * and the distance-preservation property the lemma promises (within
  * the tolerance a 16-dim sketch can give).
  */
class JlProjectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(n: Int, d: Int) =
    (0 until n).map { i =>
      (i.toLong, (0 until d).map(j =>
        math.sin(i * 37.0 + j * 11.0).toFloat).toArray)
    }.toDF("id", "v")

  test("projection is deterministic and partitioning-invariant") {
    val df = vecs(40, 64)
    val a = Similarity.jlProject(df, "id", "v", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = Similarity.jlProject(df.repartition(13), "id", "v", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a === b)
    assert(a.values.forall(_.length === 16))
  }

  test("y_j is the ±1-signed fold scaled by 1/√outDim, matrix from hex15 parity") {
    val df = vecs(3, 8)
    val out = Similarity.jlProject(df, "id", "v", 8, 4, salt = "t")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // recompute with the same md5-parity rule in plain Scala
    def sign(j: Int, i: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t|$j|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(md.take(15), 16) % 2 == 0) 1.0 else -1.0
    }
    val in = vecs(3, 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    for (id <- in.keys; j <- 0 until 4) {
      var acc = 0.0
      for (i <- 0 until 8) acc += in(id)(i).toDouble * sign(j, i)
      assert(out(id)(j) === acc * 0.5, s"id=$id j=$j") // 1/√4
    }
  }

  test("projection approximately preserves pairwise distance ordering") {
    // not a tight ε-guarantee at 16 dims — check rank correlation:
    // for a fixed anchor, the nearest and farthest of 30 points by
    // true L2 stay in the projected bottom/top third
    val df = vecs(31, 64)
    val p = Similarity.jlProject(df, "id", "v", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val raw = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = (1L until 31L).toSeq
    val byTrue = ids.sortBy(i => d2(raw(0L), raw(i)))
    val projD = ids.map(i => i -> d2(p(0L), p(i))).toMap
    val byProj = ids.sortBy(projD)
    val trueNear = byTrue.take(5).toSet
    assert(byProj.take(15).count(trueNear) >= 4,
      s"true-nearest lost in projection: ${byProj.take(15)}")
    val trueFar = byTrue.takeRight(5).toSet
    assert(byProj.takeRight(15).count(trueFar) >= 4)
  }
}
