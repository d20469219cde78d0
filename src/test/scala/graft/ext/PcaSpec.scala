package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Top-principal-direction + ABTT semantics: a planted dominant
  * direction is recovered, the integer scatter is bit-stable under
  * repartitioning, and the projection removal obeys the Pythagorean
  * identity per row.
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def planted(n: Int) = {
    // u = (3,4)/5 dominant direction in the first two dims; the rest
    // is a small deterministic wiggle
    (0 until n).map { i =>
      val a = (i % 7 - 3).toFloat // -3..3 along u
      val w = ((i % 5) - 2) * 0.01f
      (i.toLong, Array.tabulate(64) {
        case 0 => 0.6f * a + w
        case 1 => 0.8f * a - w
        case d => ((i + d) % 3 - 1) * 0.005f
      })
    }.toDF("vec_id", "embedding")
  }

  test("recovers a planted dominant direction") {
    val out = Pca.topComponent(planted(140), "vec_id", "embedding")
      .orderBy("dim_id").select("pc1").as[Double].collect()
    val dot = out(0) * 0.6 + out(1) * 0.8
    assert(math.abs(dot) > 0.999, s"pc1 misses the planted u: $dot")
    assert(math.abs(out.map(x => x * x).sum - 1.0) < 1e-9)
  }

  test("opqRotate is orthogonal and concentrates pc1 into dim 0") {
    val df = planted(140)
    val rot = Pca.opqRotate(df, "vec_id", "embedding", train = df)
    val before = df.orderBy("vec_id").as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    val after = rot.orderBy("vec_id").as[(Long, Array[Double])].collect()
      .toMap
    // norms preserved (Householder reflections are orthogonal)
    before.foreach { case (id, x) =>
      val n0 = x.map(a => a * a).sum
      val n1 = after(id).map(a => a * a).sum
      assert(math.abs(n0 - n1) < 1e-9 * (1.0 + n0), s"norm drift at $id")
    }
    // a pairwise distance too (the property ADC actually relies on)
    val (a0, b0) = (before(3L), before(77L))
    val (a1, b1) = (after(3L), after(77L))
    val d0 = a0.zip(b0).map { case (p, q) => (p - q) * (p - q) }.sum
    val d1 = a1.zip(b1).map { case (p, q) => (p - q) * (p - q) }.sum
    assert(math.abs(d0 - d1) < 1e-9 * (1.0 + d0))
    // the planted dominant direction now lives in coordinate 0:
    // variance of dim 0 dominates every other single dimension
    val n = after.size.toDouble
    val varByDim = (0 until 64).map { d =>
      val xs = after.values.map(_(d))
      val mu = xs.sum / n
      xs.map(x => (x - mu) * (x - mu)).sum / n
    }
    assert(varByDim(0) > varByDim.drop(1).max * 10,
      s"dim-0 variance ${varByDim(0)} does not dominate")
  }

  test("integer scatter makes the result partition-invariant") {
    val df = planted(90)
    def run(parts: Int) =
      Pca.topComponent(df.repartition(parts), "vec_id", "embedding")
        .orderBy("dim_id")
        .select("sum_q", "pc1", "lambda", "trace")
        .as[(Long, Double, Double, Double)].collect().toSeq
    assert(run(1) == run(7))
  }

  test("opqRotate wins recall on the anisotropic fixture and only there") {
    // the gate fixture pair at sf0.01: on the planted rank-1 corpus
    // the rotated chain must beat the unrotated one (this is the
    // fixture that justifies the operator); the isotropic control arm
    // (q_pq_recall / q_pq_rot_recall) is pinned separately by its
    // oracle rows showing no lift
    val dir = "/root/testdata/sf0.01"
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(org.apache.spark.sql.functions.sum("n_hit"))
        .as[Long].head()
    val unrot = hits(graft.queries.ExtQueries.pqRecallAniso(spark, dir))
    val rot = hits(graft.queries.ExtQueries.pqRotAniso(spark, dir))
    assert(rot > unrot,
      s"rotated recall $rot does not beat unrotated $unrot")
  }

  test("abtt obeys the per-row Pythagorean identity") {
    val rows = Pca.abtt(planted(80), "vec_id", "embedding")
      .select("proj", "norm2_before", "norm2_after")
      .as[(Double, Double, Double)].collect()
    rows.foreach { case (p, b, a) =>
      assert(math.abs(a - (b - p * p)) < 1e-9)
    }
    // the planted direction carries most of the mass
    assert(rows.map(_._3).sum < 0.2 * rows.map(_._2).sum)
  }
}
