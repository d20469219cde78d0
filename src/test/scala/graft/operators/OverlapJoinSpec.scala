package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Interval-overlap join semantics: closed-endpoint matching, the
  * first-bin exactly-once claim under multi-bin overlaps, inverted-
  * interval drops, collision suffixing — each against the bare
  * overlap-predicate brute force. */
class OverlapJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("closed endpoints: touching intervals match, disjoint do not") {
    val l = Seq((1L, 0.0, 10.0)).toDF("k", "lo", "hi")
    val r = Seq((1L, 10.0, 20.0), (1L, 10.5, 20.0)).toDF("k", "rlo", "rhi")
    val got = AsOfJoin.overlapJoin(l, r, Seq("k"),
        "lo", "hi", "rlo", "rhi", binWidth = 5.0)
      .select("rlo").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(10.0)) // [0,10]x[10,20] touches; [10.5,..] doesn't
  }

  test("a pair overlapping many bins is emitted exactly once") {
    // overlap region [5, 95] covers 90 one-unit bins — one output row
    val l = Seq((1L, 0.0, 95.0)).toDF("k", "lo", "hi")
    val r = Seq((1L, 5.0, 200.0)).toDF("k", "rlo", "rhi")
    val got = AsOfJoin.overlapJoin(l, r, Seq("k"),
      "lo", "hi", "rlo", "rhi", binWidth = 1.0)
    assert(got.count() == 1L)
  }

  test("inverted intervals drop from both sides") {
    val l = Seq((1L, 0.0, 10.0), (1L, 9.0, 2.0)).toDF("k", "lo", "hi")
    val r = Seq((1L, 5.0, 6.0), (1L, 8.0, 1.0)).toDF("k", "rlo", "rhi")
    val got = AsOfJoin.overlapJoin(l, r, Seq("k"),
      "lo", "hi", "rlo", "rhi", binWidth = 4.0)
    assert(got.count() == 1L) // only [0,10]x[5,6]
  }

  test("right-side name collisions get the rsuffix") {
    val l = Seq((1L, 0.0, 10.0, "a")).toDF("k", "lo", "hi", "tag")
    val r = Seq((1L, 5.0, 6.0, "b")).toDF("k", "lo", "hi", "tag")
    val got = AsOfJoin.overlapJoin(l, r, Seq("k"),
      "lo", "hi", "lo", "hi", binWidth = 4.0)
    assert(got.columns.toSeq ==
      Seq("k", "lo", "hi", "tag", "lo_right", "hi_right", "tag_right"))
    assert(got.count() == 1L)
  }

  test("matches the brute-force overlap join on keyed random intervals") {
    val l = spark.range(200).select((col("id") % 7).as("k"),
      (col("id") * 13 % 101).cast("double").as("lo"))
      .withColumn("hi", col("lo") + (col("k") * 11 % 23).cast("double"))
    val r = spark.range(150).select((col("id") % 7).as("k"),
      (col("id") * 29 % 97).cast("double").as("rlo"))
      .withColumn("rhi", col("rlo") + (col("k") * 5 % 17).cast("double"))
    val brute = l.join(r, Seq("k"))
      .where(col("lo") <= col("rhi") && col("rlo") <= col("hi"))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    val binned = AsOfJoin.overlapJoin(l, r, Seq("k"),
        "lo", "hi", "rlo", "rhi", binWidth = 8.0)
      .groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(binned == brute)
  }
}
