package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAllNoShrink

import graft.TestSpark

/** Salted aggregation must be RESULT-identical to the direct
  * aggregation for any data distribution and bucket count — the
  * associativity claim, property-tested.
  */
object SaltingProps extends Properties("Salting") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val rowsGen: Gen[List[(String, Long, Double)]] =
    Gen.resize(60, Gen.nonEmptyListOf(for {
      k <- Gen.oneOf("hot", "hot", "hot", "a", "b") // skew on purpose
      id <- Gen.choose(0L, 10000L)
      v <- Gen.choose(-1000, 1000).map(_ / 4.0)
    } yield (k, id, v)))

  property("saltedAgg(count, decimal sum) == direct aggregation for any buckets") =
    forAllNoShrink(rowsGen, Gen.choose(1, 16)) { (rows, buckets) =>
      import spark.implicits._
      val df = rows.toDF("k", "id", "v")
      val dec = DecimalType(18, 2)
      val direct = df.groupBy("k")
        .agg(count(lit(1)).as("n"), sum(col("v").cast(dec)).cast("double").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val salted = Salting.saltedAgg(df, Seq("k"), buckets, Seq(col("id")),
          Seq(("n", count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)),
            ("s", sum(col("v").cast(dec)),
              (c: org.apache.spark.sql.Column) => sum(c).cast("double"))))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      Prop(direct == salted) :| s"direct=$direct salted=$salted buckets=$buckets"
    }

  property("skewAudit reports exactly the over-target keys with the MINIMAL sufficient salt") =
    forAllNoShrink(rowsGen, Gen.choose(1L, 40L)) { (rows, target) =>
      import spark.implicits._
      val got = Salting.skewAudit(rows.toDF("k", "id", "v"), Seq("k"), target)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        .filter(_._2 > target)
        .map { case (k, n) => (k, n, (n + target - 1) / target) }.toSet
      val minimal = got.forall { case (_, n, s) =>
        n <= s * target && n > (s - 1) * target }
      Prop(got == want && minimal) :| s"got=$got want=$want target=$target"
    }
}
