package graft.operators

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.TestSpark
import AsOfBrute.{L, R}

/** ScalaCheck equivalence: AsOfJoin == nested-loop merge_asof
  * reference (SURVEY.md §5.4) for all three directions, over integral
  * and fractional keys — random group counts, key collisions between
  * sides, and empty right groups all arise from the generators.
  */
object AsOfJoinProps extends Properties("AsOfJoin") {

  // 30 random cases per property x 6 properties; each case runs a full
  // Spark window plan, so the default 100 would dominate `sbt test`.
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(30)

  private lazy val spark = TestSpark.spark

  private val nGroups = 3

  private def leftGen[K](keyGen: Gen[K]): Gen[List[(Int, K)]] =
    Gen.resize(25, Gen.listOf(Gen.zip(Gen.choose(1, nGroups), keyGen)))

  private def rightGen[K](keyGen: Gen[K]): Gen[List[(Int, K)]] =
    Gen.resize(25, Gen.listOf(Gen.zip(Gen.choose(1, nGroups), keyGen)))

  private def runSpark[K](left: Seq[L[K]], right: Seq[R[K]], direction: String,
                          allowExact: Boolean, tolerance: Option[Double],
                          toDf: (Seq[L[K]], Seq[R[K]]) => (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)): Map[Int, Option[Int]] = {
    val (l, r) = toDf(left, right)
    AsOfJoin.asof(l, r, "on", "on", Seq("g"), direction,
        allowExactMatches = allowExact, tolerance = tolerance)
      .select("id", "v").collect()
      .map(row => row.getInt(0) -> (if (row.isNullAt(1)) None else Some(row.getInt(1))))
      .toMap
  }

  private def checkEq[K: Numeric](rawL: List[(Int, K)], rawR: List[(Int, K)],
                                direction: String,
                                toDf: (Seq[L[K]], Seq[R[K]]) => (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame),
                                allowExact: Boolean = true,
                                tolerance: Option[Double] = None): Prop = {
    val left = rawL.zipWithIndex.map { case ((g, k), i) => L(g, k, i) }
    // dedupe right (by, on): positional tiebreak among exact dups has
    // no distributed meaning (covered by the explicit tiebreak test)
    val right = rawR.distinctBy(x => (x._1, x._2))
      .zipWithIndex.map { case ((g, k), i) => R(g, k, i * 10) }
    val expected = AsOfBrute.asof(left, right, direction, allowExact, tolerance).toMap
    val got = runSpark(left, right, direction, allowExact, tolerance, toDf)
    Prop(got == expected) :|
      s"got=$got expected=$expected l=$left r=$right exact=$allowExact tol=$tolerance"
  }

  private def longDfs(l: Seq[L[Long]], r: Seq[R[Long]]) = {
    val s = spark; import s.implicits._
    (l.map(x => (x.by, x.on, x.id)).toDF("g", "on", "id"),
      r.map(x => (x.by, x.on, x.v)).toDF("g", "on", "v"))
  }

  private def doubleDfs(l: Seq[L[Double]], r: Seq[R[Double]]) = {
    val s = spark; import s.implicits._
    (l.map(x => (x.by, x.on, x.id)).toDF("g", "on", "id"),
      r.map(x => (x.by, x.on, x.v)).toDF("g", "on", "v"))
  }

  private val longKey = Gen.choose(-50L, 50L)
  // halves force exact equidistant cases; the .5 grid keeps double
  // arithmetic exact so brute-force and Spark agree bit-for-bit
  private val doubleKey = Gen.choose(-100, 100).map(_ / 2.0)

  for (dir <- Seq("backward", "forward", "nearest")) {
    property(s"$dir equals nested-loop reference (long keys)") =
      forAll(leftGen(longKey), rightGen(longKey)) { (l, r) =>
        checkEq[Long](l, r, dir, longDfs)
      }
    property(s"$dir equals nested-loop reference (double keys)") =
      forAll(leftGen(doubleKey), rightGen(doubleKey)) { (l, r) =>
        checkEq[Double](l, r, dir, doubleDfs)
      }
    property(s"$dir strict (allow_exact_matches=false) equals reference") =
      forAll(leftGen(longKey), rightGen(longKey)) { (l, r) =>
        checkEq[Long](l, r, dir, longDfs, allowExact = false)
      }
    property(s"$dir with tolerance equals reference") =
      forAll(leftGen(longKey), rightGen(longKey), Gen.choose(0, 20)) { (l, r, tol) =>
        checkEq[Long](l, r, dir, longDfs, tolerance = Some(tol.toDouble))
      }
  }
}
