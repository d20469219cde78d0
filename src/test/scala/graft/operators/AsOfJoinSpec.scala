package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Example-based as-of join semantics, pinned to pandas merge_asof
  * (SURVEY.md §7.4.1): direction rules, equidistant-prefers-prior,
  * fractional numeric keys (the long-cast truncation regression),
  * leftOn/rightOn key renaming, and no-match null padding.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def leftDf(rows: (Int, Double, Int)*): DataFrame =
    rows.toSeq.toDF("g", "on", "id")
  private def rightDf(rows: (Int, Double, Int)*): DataFrame =
    rows.toSeq.toDF("g", "on", "v")

  private def matches(df: DataFrame): Map[Int, Option[Int]] =
    df.select("id", "v").collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap

  test("backward picks greatest right on <= left on, exact match allowed") {
    val l = leftDf((1, 5.0, 1), (1, 10.0, 2), (1, 2.0, 3))
    val r = rightDf((1, 5.0, 50), (1, 8.0, 80), (1, 3.0, 30))
    assert(matches(AsOfJoin.backward(l, r, "on", Seq("g"))) ===
      Map(1 -> Some(50), 2 -> Some(80), 3 -> None))
  }

  test("forward picks least right on >= left on") {
    val l = leftDf((1, 5.0, 1), (1, 9.0, 2), (1, 99.0, 3))
    val r = rightDf((1, 5.0, 50), (1, 8.0, 80), (1, 30.0, 300))
    assert(matches(AsOfJoin.forward(l, r, "on", Seq("g"))) ===
      Map(1 -> Some(50), 2 -> Some(300), 3 -> None))
  }

  test("nearest picks smaller |delta|; equidistant prefers the prior row") {
    val l = leftDf((1, 5.0, 1), (1, 6.9, 2), (1, 7.5, 3))
    val r = rightDf((1, 4.0, 40), (1, 7.0, 70), (1, 8.0, 80))
    // id=1: d(4)=1 < d(7)=2 -> 40; id=2: d(7)=0.1 -> 70;
    // id=3: d(7)=0.5 == d(8)=0.5 -> prior (70) wins.
    assert(matches(AsOfJoin.nearest(l, r, "on", Seq("g"))) ===
      Map(1 -> Some(40), 2 -> Some(70), 3 -> Some(70)))
  }

  test("nearest keeps fractional precision (long-cast truncation regression)") {
    // left=2.6 vs rights {2.0, 3.0}: truncating to long gave dB=0 and
    // wrongly picked backward; correct is forward (0.4 < 0.6).
    val l = leftDf((1, 2.6, 1))
    val r = rightDf((1, 2.0, 20), (1, 3.0, 30))
    assert(matches(AsOfJoin.nearest(l, r, "on", Seq("g"))) === Map(1 -> Some(30)))
  }

  test("by-groups are isolated: a right row never matches another group") {
    val l = leftDf((1, 5.0, 1), (2, 5.0, 2))
    val r = rightDf((1, 4.0, 40))
    assert(matches(AsOfJoin.backward(l, r, "on", Seq("g"))) ===
      Map(1 -> Some(40), 2 -> None))
  }

  test("leftOn/rightOn joins differently-named keys (lap_number vs lap_start)") {
    val l = Seq((1, 3L, 1), (1, 8L, 2)).toDF("g", "lap_number", "id")
    val r = Seq((1, 1L, 10), (1, 6L, 60)).toDF("g", "lap_start", "v")
    val out = AsOfJoin.backwardOn(l, r, "lap_number", "lap_start", Seq("g"))
    assert(out.columns.toSeq ===
      Seq("g", "lap_number", "id", "lap_start", "v"))
    assert(matches(out) === Map(1 -> Some(10), 2 -> Some(60)))
  }

  test("duplicate right on-keys: backward takes greatest tiebreak, forward least") {
    val l = leftDf((1, 5.0, 1))
    val r = Seq((1, 4.0, 1, 100), (1, 4.0, 2, 200)).toDF("g", "on", "tb", "v")
    val bwd = AsOfJoin.asof(l, r, "on", "on", Seq("g"), "backward",
      tiebreak = Some("tb"))
    assert(matches(bwd) === Map(1 -> Some(200)))
    val r2 = Seq((1, 6.0, 1, 100), (1, 6.0, 2, 200)).toDF("g", "on", "tb", "v")
    val fwd = AsOfJoin.asof(l, r2, "on", "on", Seq("g"), "forward",
      tiebreak = Some("tb"))
    assert(matches(fwd) === Map(1 -> Some(100)))
  }

  test("allowExactMatches=false skips the equal-key row (strict backward/forward)") {
    val l = leftDf((1, 5.0, 1))
    val r = rightDf((1, 5.0, 50), (1, 3.0, 30), (1, 8.0, 80))
    val strictB = AsOfJoin.asof(l, r, "on", "on", Seq("g"), "backward",
      allowExactMatches = false)
    assert(matches(strictB) === Map(1 -> Some(30)))
    val strictF = AsOfJoin.asof(l, r, "on", "on", Seq("g"), "forward",
      allowExactMatches = false)
    assert(matches(strictF) === Map(1 -> Some(80)))
  }

  test("tolerance null-pads matches beyond the distance (micros for timestamps)") {
    val l = Seq((1, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), 1))
      .toDF("g", "on", "id")
    val r = Seq((1, java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), 50))
      .toDF("g", "on", "v")
    val within = AsOfJoin.asof(l, r, "on", "on", Seq("g"), "backward",
      tolerance = Some(6e6)) // 6 s in micros
    assert(matches(within) === Map(1 -> Some(50)))
    val beyond = AsOfJoin.asof(l, r, "on", "on", Seq("g"), "backward",
      tolerance = Some(4e6)) // 4 s in micros
    assert(matches(beyond) === Map(1 -> None))
  }

  test("empty by is rejected (single-partition scale hazard)") {
    val l = leftDf((1, 5.0, 1))
    val r = rightDf((1, 4.0, 40))
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, "on", Nil)
    }
  }

  test("timestamp keys: nearest arbitrates in exact micros") {
    val l = Seq((1, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), 1))
      .toDF("g", "on", "id")
    val r = Seq(
      (1, java.sql.Timestamp.valueOf("2024-01-01 00:00:09"), 90),
      (1, java.sql.Timestamp.valueOf("2024-01-01 00:00:11"), 110))
      .toDF("g", "on", "v")
    // equidistant 1s each side -> prior wins
    assert(matches(AsOfJoin.nearest(l, r, "on", Seq("g"))) === Map(1 -> Some(90)))
  }

  test("interval join matches rows inside [lo, hi] and null-pads misses") {
    val l = Seq((1, 5.0, 1), (1, 15.0, 2), (1, 99.0, 3)).toDF("g", "x", "id")
    val bands = Seq(("a", 1.0, 10.0), ("b", 11.0, 20.0)).toDF("band", "lo", "hi")
    val out = AsOfJoin.intervalJoin(l, bands, Nil, "x", "lo", "hi")
      .select("id", "band").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out === Map(1 -> "a", 2 -> "b", 3 -> null))
  }

  test("binned interval join equals inner interval join across bin widths") {
    // values on bin edges, intervals spanning several bins, a value in
    // no interval (dropped: inner semantics), an interval narrower than
    // a bin — all must agree with the broadcast BETWEEN join for any
    // bin width.
    val l = Seq((1, 5.0, 1), (1, 10.0, 2), (1, 15.0, 3), (1, 99.0, 4),
      (1, 20.0, 5)).toDF("g", "x", "id")
    val bands = Seq(("a", 1.0, 10.0), ("b", 11.0, 20.0), ("c", 14.0, 16.0))
      .toDF("band", "lo", "hi")
    val expected = AsOfJoin.intervalJoin(l, bands, Nil, "x", "lo", "hi")
      .where(col("band").isNotNull)
      .select("id", "band").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    for (w <- Seq(0.5, 3.0, 10.0, 100.0)) {
      val got = AsOfJoin.binnedIntervalJoin(l, bands, "x", "lo", "hi", binWidth = w)
        .select("id", "band").collect().map(r => (r.getInt(0), r.getString(1))).toSet
      assert(got === expected, s"binWidth=$w")
      assert(got === Set((1, "a"), (2, "a"), (3, "b"), (3, "c"), (5, "b")))
    }
  }

  test("binned interval join emits no duplicate matches") {
    // an interval replicated into 4 bins must still match a contained
    // value exactly once (the value lives in exactly one bin).
    val l = Seq((1, 12.0, 1)).toDF("g", "x", "id")
    val bands = Seq(("wide", 0.0, 40.0)).toDF("band", "lo", "hi")
    val out = AsOfJoin.binnedIntervalJoin(l, bands, "x", "lo", "hi", binWidth = 10.0)
    assert(out.count() === 1)
  }
}
