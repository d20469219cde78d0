package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.TestSpark

/** ScalaCheck equivalence: the binned (shuffle-form) interval join
  * must equal the broadcast BETWEEN join for ANY intervals, values and
  * bin width — degenerate intervals (lo == hi), intervals narrower and
  * wider than a bin, negative domains, and values on exact bin edges
  * all arise from the generators.
  */
object BinnedIntervalProps extends Properties("BinnedIntervalJoin") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(20)

  private lazy val spark = TestSpark.spark

  private val valueGen = Gen.chooseNum(-50.0, 50.0)
    .map(v => math.rint(v * 4) / 4) // quarter-steps: bin-edge hits likely

  private val intervalGen: Gen[(Double, Double)] = for {
    lo <- valueGen
    width <- Gen.oneOf(Gen.const(0.0), Gen.chooseNum(0.0, 30.0))
  } yield (lo, lo + width)

  property("equals broadcast interval join for any data and bin width") =
    forAll(Gen.resize(15, Gen.listOf(valueGen)),
           Gen.resize(8, Gen.listOf(intervalGen)),
           Gen.oneOf(0.25, 1.0, 7.0, 100.0)) { (values, intervals, binWidth) =>
      import spark.implicits._
      val l = values.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "x")
      val r = intervals.zipWithIndex
        .map { case ((lo, hi), j) => (j, lo, hi) }.toDF("band", "lo", "hi")
      val expected = AsOfJoin.intervalJoin(l, r, Nil, "x", "lo", "hi")
        .where(org.apache.spark.sql.functions.col("band").isNotNull)
        .select("id", "band").collect().map(w => (w.getInt(0), w.getInt(1))).toSet
      val got = AsOfJoin.binnedIntervalJoin(l, r, "x", "lo", "hi", binWidth)
        .select("id", "band").collect().map(w => (w.getInt(0), w.getInt(1))).toSet
      got == expected
    }

  property("tolerates a user __bin column and inverted (lo > hi) intervals") =
    forAll(Gen.chooseNum(0.5, 5.0)) { binWidth =>
      import spark.implicits._
      // left already carries a __bin column; one right interval is
      // inverted and must match nothing (not replicate wrongly)
      val l = Seq((1, 2.0, "keep"), (2, 9.0, "keep")).toDF("id", "x", "__bin")
      val r = Seq((10, 1.0, 3.0), (11, 8.0, 4.0)).toDF("band", "lo", "hi")
      val got = AsOfJoin.binnedIntervalJoin(l, r, "x", "lo", "hi", binWidth)
      got.columns.contains("__bin") &&
        got.select("id", "band").collect()
          .map(w => (w.getInt(0), w.getInt(1))).toSet == Set((1, 10))
    }
}
