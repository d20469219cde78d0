package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("funnel counts ordered completions, anchored at the first step-1 event") {
    val ev = Seq(
      // u1 completes in order
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
      // u2 clicks BEFORE viewing — that click must not count; the
      // later click does
      (2L, "click", ts(0)), (2L, "view", ts(5)), (2L, "click", ts(6)),
      // u3 views only
      (3L, "view", ts(0)),
      // u4 purchases before clicking — not a completion
      (4L, "view", ts(0)), (4L, "purchase", ts(1)), (4L, "click", ts(2)),
      // u5 never views
      (5L, "click", ts(0)), (5L, "purchase", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), maxSpanSeconds = 3600)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // step1: u1,u2,u3,u4 viewed; step2: u1,u2,u4 clicked after;
    // step3: only u1 purchased after its click
    assert(out === Map(1L -> 4L, 2L -> 3L, 3L -> 1L))
  }

  test("funnel span window cuts completions outside maxSpan of the anchor") {
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(10)),
      (2L, "view", ts(0)), (2L, "click", ts(120)) // beyond the 1h span
    ).toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click"), maxSpanSeconds = 3600)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 2L, 2L -> 1L))
  }

  test("retention triangle counts distinct users per cohort/offset week") {
    val week = 7L * 24 * 60 // minutes
    val ev = Seq(
      (1L, ts(0)), (1L, ts(week + 1)), (1L, ts(2 * week + 1)),
      (2L, ts(1)), (2L, ts(2 * week + 2)),
      (3L, ts(week + 3)), (3L, ts(week + 4)) // cohort week 1, only w1
    ).toDF("user_id", "ts")
      .withColumn("event_type", org.apache.spark.sql.functions.lit("x"))
    val out = EventAnalytics.retentionCohorts(ev, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 2L,
      (1L, 0L) -> 1L))
  }
}
