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

  test("integer scatter makes the result partition-invariant") {
    val df = planted(90)
    def run(parts: Int) =
      Pca.topComponent(df.repartition(parts), "vec_id", "embedding")
        .orderBy("dim_id")
        .select("sum_q", "pc1", "lambda", "trace")
        .as[(Long, Double, Double, Double)].collect().toSeq
    assert(run(1) == run(7))
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
