package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Salted two-phase aggregation and salted joins must be result-
  * identical to their unsalted forms (associative aggs, replicated
  * build side) — the whole point is changing the task layout, not the
  * answer.
  */
class SaltingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of rows share one hot key — the shape AQE can't split for aggs
  private lazy val skewed = (1 to 2000).map { i =>
    (if (i % 10 == 0) s"key${i % 7}" else "hotkey", i.toLong, i * 1.5)
  }.toDF("k", "id", "v")

  test("saltedAgg(count, decimal sum) equals the direct aggregation") {
    val dec = DecimalType(18, 2)
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(dec)).cast("double").as("s"))
    val salted = Salting.saltedAgg(skewed, Seq("k"), buckets = 8,
      saltSource = Seq(col("id")),
      aggs = Seq(
        ("n", count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)),
        ("s", sum(col("v").cast(dec)),
          (c: org.apache.spark.sql.Column) => sum(c).cast("double"))))
    assert(direct.exceptAll(salted).isEmpty && salted.exceptAll(direct).isEmpty)
  }

  test("saltedEquiJoin equals the plain join, including unmatched-left rows") {
    val dim = Seq(("hotkey", "H"), ("key1", "A"), ("key3", "B")).toDF("k", "tag")
    val plain = skewed.join(dim, Seq("k"), "left")
    val salted = Salting.saltedEquiJoin(skewed, dim, Seq("k"),
      buckets = 8, saltSource = Seq(col("id")), joinType = "left")
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("salt spreads a hot key across buckets") {
    val buckets = skewed.filter(col("k") === "hotkey")
      .select(Salting.salt(8, col("id")).as("s"))
      .distinct().count()
    assert(buckets === 8)
  }
}
