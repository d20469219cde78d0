package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Ranking/argmin parity traps (SURVEY.md §7.4.3): keep-first tie
  * determinism, null handling in primary and secondary keys.
  */
class RankingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("keepFirst keeps exactly the first row per group under the ordering") {
    val df = Seq(
      (1, 10.0, "b"), (1, 10.0, "a"), (1, 5.0, "z"),
      (2, 7.0, "x")).toDF("g", "t", "tag")
    val out = Ranking.keepFirst(df, Seq("g"), Seq(col("t").asc, col("tag").asc))
      .select("g", "tag").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out === Map(1 -> "z", 2 -> "x"))
  }

  test("keepFirst ties break by the secondary key, not input order") {
    val df = Seq((1, 10.0, "b"), (1, 10.0, "a")).toDF("g", "t", "tag")
    val out = Ranking.keepFirst(df, Seq("g"), Seq(col("t").asc, col("tag").asc))
      .select("tag").collect().map(_.getString(0)).toSeq
    assert(out === Seq("a"))
  }

  test("argminRow returns the whole row of the minimum") {
    val df = Seq(
      (1, 3.0, "2024-01-01", "slow"),
      (1, 1.0, "2024-01-02", "fast"),
      (2, 2.0, "2024-01-03", "only")).toDF("g", "t", "d", "tag")
    val out = Ranking.argminRow(df, Seq("g"), Seq("t", "d"))
      .select("g", "tag").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out === Map(1 -> "fast", 2 -> "only"))
  }

  test("argminRow tie on primary key resolves by secondary key (first occurrence)") {
    val df = Seq(
      (1, 1.0, "2024-01-05", "later"),
      (1, 1.0, "2024-01-02", "earlier")).toDF("g", "t", "d", "tag")
    val out = Ranking.argminRow(df, Seq("g"), Seq("t", "d"))
      .select("tag").collect().map(_.getString(0)).toSeq
    assert(out === Seq("earlier"))
  }

  test("argminRow: NULL secondary tie-break sorts LAST (row_number default)") {
    val df = Seq(
      (1, 1.0, Option.empty[String], "nullsec"),
      (1, 1.0, Some("2024-01-09"), "datedsec")).toDF("g", "t", "d", "tag")
    val out = Ranking.argminRow(df, Seq("g"), Seq("t", "d"))
      .select("tag").collect().map(_.getString(0)).toSeq
    assert(out === Seq("datedsec"))
  }

  test("argminRow drops rows with NULL primary key; all-NULL group vanishes") {
    val df = Seq(
      (1, Option.empty[Double], "x"),
      (1, Some(2.0), "y"),
      (2, Option.empty[Double], "z")).toDF("g", "t", "tag")
    val out = Ranking.argminRow(df, Seq("g"), Seq("t"))
      .select("g", "tag").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out === Map(1 -> "y")) // group 2 dropped, pandas idxmin semantics
  }
}
