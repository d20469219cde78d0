package graft.catalyst

import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The injected optimizer rule must turn unbounded levenshtein
  * predicates into the banded form (length guard + thresholded DP),
  * leave non-literal thresholds alone, and never change results.
  */
class BandedLevenshteinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a real parquet scan: over a LocalRelation the optimizer folds the
  // whole filter away before the plan can be inspected
  private lazy val pairs = {
    val dir = java.nio.file.Files.createTempDirectory("graft-lev").toString
    Seq(
      ("kitten", "sitting"),   // dist 3
      ("abc", "abc"),          // dist 0
      ("abc", "abcdef"),       // dist 3, length gap 3
      ("short", "a much longer string entirely"), // gap > k
      (null.asInstanceOf[String], "x")).toDF("a", "b")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def bandedCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case Levenshtein(_, _, Some(_)) => 1
      }).sum
    }.sum

  test("levenshtein <= literal rewrites to the banded form") {
    val q = pairs.filter(levenshtein(col("a"), col("b")) <= 3)
    assert(bandedCount(q) === 1, q.queryExecution.optimizedPlan.toString)
    assert(q.select("a").as[String].collect().toSet ===
      Set("kitten", "abc")) // both abc rows match; null row drops
  }

  test("strict < literal rewrites with threshold k-1, same results") {
    val q = pairs.filter(levenshtein(col("a"), col("b")) < 3)
    assert(bandedCount(q) === 1)
    assert(q.count() === 1) // only the exact match is under distance 3
  }

  test("reversed literal >= form rewrites too") {
    val q = pairs.filter(lit(3) >= levenshtein(col("a"), col("b")))
    assert(bandedCount(q) === 1)
    assert(q.count() === 3) // kitten~sitting (3), abc~abc (0), abc~abcdef (3)
  }

  test("column-valued threshold is left unbounded") {
    val q = pairs.withColumn("k", length(col("b")))
      .filter(levenshtein(col("a"), col("b")) <= col("k"))
    assert(bandedCount(q) === 0)
  }

  test("rewrite matches the unbounded predicate row-for-row on random strings") {
    val rnd = new scala.util.Random(7)
    def s() = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
    val df = Seq.fill(300)((s(), s())).toDF("a", "b")
    val got = df.filter(levenshtein(col("a"), col("b")) <= 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = df.collect().map(r => (r.getString(0), r.getString(1)))
      .filter { case (a, b) =>
        org.apache.commons.text.similarity.LevenshteinDistance.getDefaultInstance
          .apply(a, b) <= 4
      }.toSet
    assert(got === want)
  }
}
