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

  test("rateAnomaly flags a bucket only with a full trailing window and >2x the trailing mean") {
    // type "a": hours 0-5 at 1 event/h, hour 6 at 3 (3*6 > 6*2 -> spike),
    // hour 7 at 2 (2*6 <= 8*2 -> quiet). Hours 0-5 lack a full window.
    val a = (0 to 5).map(h => ("a", ts(h * 60L))) ++
      Seq.fill(3)(("a", ts(6 * 60L))) ++ Seq.fill(2)(("a", ts(7 * 60L)))
    // type "b": sparse hours 0,10,..,50 at 1/h then hour 60 at 3 — the
    // baseline is the previous 6 OBSERVED buckets, so it still spikes.
    val b = (0 to 5).map(h => ("b", ts(h * 600L))) ++
      Seq.fill(3)(("b", ts(60 * 60L)))
    val ev = (a ++ b).toDF("event_type", "ts")
    val out = EventAnalytics.rateAnomaly(ev, "event_type", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(5)).toMap
    assert(out(("a", 6L)) === 1L)
    assert(out(("a", 7L)) === 0L)
    assert((0 to 5).forall(h => out(("a", h.toLong)) === 0L))
    assert(out(("b", 60L)) === 1L)
  }

  test("multi-touch credits sum to exactly 10000, remainder on the closing click") {
    val ev = Seq(
      // u1: 3 clicks inside the 1h window, one outside, then purchase
      (10L, 1L, "click", ts(-90)), (11L, 1L, "click", ts(-50)),
      (12L, 1L, "click", ts(-20)), (13L, 1L, "click", ts(-5)),
      (14L, 1L, "purchase", ts(0)),
      // u2 purchases with no click in window -> absent from output
      (20L, 2L, "purchase", ts(0))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventAnalytics.multiTouchAttribution(ev, "user_id",
        "event_type", "ts", "event_id", "purchase", "click",
        windowSeconds = 3600)
      .collect().map(r => r.getLong(1) -> r.getLong(5)).toMap
    // 10000 div 3 = 3333; closing click (id 13) takes 3334
    assert(out === Map(11L -> 3333L, 12L -> 3333L, 13L -> 3334L))
    assert(out.values.sum === 10000L)
  }

  test("capped multi-touch degenerates bit-for-bit to uncapped below the cap") {
    // a mixed fixture: in/out-of-window clicks, multiple users,
    // clicks straddling the bucket boundary (ids 10 vs 11-13), ties
    val ev = Seq(
      (10L, 1L, "click", ts(-90)), (11L, 1L, "click", ts(-50)),
      (12L, 1L, "click", ts(-20)), (13L, 1L, "click", ts(-5)),
      (14L, 1L, "purchase", ts(0)),
      (15L, 1L, "purchase", ts(-40)), // window catches clicks 10, 11
      (20L, 2L, "purchase", ts(0)),
      (21L, 3L, "click", ts(-10)), (22L, 3L, "purchase", ts(0))
    ).toDF("event_id", "user_id", "event_type", "ts")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val uncapped = EventAnalytics.multiTouchAttribution(ev, "user_id",
      "event_type", "ts", "event_id", "purchase", "click",
      windowSeconds = 3600)
    // no (user, 1h bucket) holds more than 3 clicks -> cap never bites
    val capped = EventAnalytics.multiTouchAttributionCapped(ev, "user_id",
      "event_type", "ts", "event_id", "purchase", "click",
      windowSeconds = 3600, maxClicksPerWindow = 3)
    assert(rows(capped) === rows(uncapped))
    assert(rows(capped).nonEmpty)
  }

  test("capped multi-touch keeps the latest clicks per window and bounds the bot") {
    // bot user 9: 10 clicks in one bucket before the purchase; cap 2
    // keeps the LATEST two (ids 108, 109) and splits 5000/5000
    val bot = (100L to 109L).map(i =>
      (i, 9L, "click", ts(-30 + (i - 100)))) :+
      ((200L, 9L, "purchase", ts(0)))
    val ev = bot.toDF("event_id", "user_id", "event_type", "ts")
    val out = EventAnalytics.multiTouchAttributionCapped(ev, "user_id",
        "event_type", "ts", "event_id", "purchase", "click",
        windowSeconds = 3600, maxClicksPerWindow = 2)
      .collect().map(r => r.getLong(1) -> r.getLong(5)).toMap
    assert(out === Map(108L -> 5000L, 109L -> 5000L))
  }

  test("multiTouchCapAudit prices uncapped vs capped join mass") {
    // user 9: 10 clicks in one bucket + 2 purchases; user 1: 2 clicks,
    // 1 purchase. cap=2: uncapped mass = 10*2 + 2*1 = 22; user 9's
    // bucket caps to 2 -> capped mass = purchases-covering-bucket ×
    // min(clicks,2); dropped = 8; one window over cap of 2 observed
    val ev = ((100L to 109L).map(i => (i, 9L, "click", ts(-30))) ++ Seq(
      (200L, 9L, "purchase", ts(0)), (201L, 9L, "purchase", ts(-1)),
      (300L, 1L, "click", ts(-10)), (301L, 1L, "click", ts(-5)),
      (302L, 1L, "purchase", ts(0))))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = EventAnalytics.multiTouchCapAudit(ev, "user_id", "event_type",
        "ts", "purchase", "click", windowSeconds = 3600,
        maxClicksPerWindow = 2)
      .collect().head
    assert(r.getAs[Long]("pairs_uncapped") === 22L)
    assert(r.getAs[Long]("n_capped_windows") === 1L)
    assert(r.getAs[Long]("clicks_dropped") === 8L)
    // both purchases of user 9 cover the clicks' bucket once each in
    // the exploded join (bucket 0 or -1 depending on trunc), and both
    // of user 1's clicks survive: capped mass = 2*2 + 1*2 = 6
    assert(r.getAs[Long]("pairs_capped") === 6L)
  }

  test("transitions counts consecutive pairs per user with the id tiebreak") {
    // u1: view->click->view; u2 has a ts TIE broken by event_id
    // (3 before 4 -> click->view), and no cross-user pair leaks
    val ev = Seq(
      (1L, 1L, "view", ts(0)), (2L, 1L, "click", ts(5)),
      (5L, 1L, "view", ts(9)),
      (3L, 2L, "click", ts(7)), (4L, 2L, "view", ts(7))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventAnalytics.transitions(ev, "user_id", "event_type",
        "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out === Map(
      ("view", "click") -> 1L, ("click", "view") -> 2L))
  }

  test("bucketed transitions equal the total-order counts, bot included") {
    // a planted bot (user 7, 500 events across many 1-minute buckets,
    // deterministic pseudo-random types incl. timestamp ties) plus
    // sparse users with empty buckets between events — the bucket
    // decomposition must stitch boundaries across the gaps exactly
    val rows = (0 until 500).map { i =>
      (100L + i, 7L, Seq("a", "b", "c")((i * 7 + i / 3) % 3),
        ts(i / 4))  // 4 events per minute -> in-bucket ties
    } ++ Seq(
      (1L, 1L, "a", ts(0)), (2L, 1L, "b", ts(300)), // 5h gap
      (3L, 2L, "c", ts(59)), (4L, 2L, "a", ts(60)), // adjacent buckets
      (5L, 3L, "b", ts(12)))                        // singleton user
    val ev = rows.toDF("event_id", "user_id", "event_type", "ts")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val total = m(EventAnalytics.transitions(ev, "user_id",
      "event_type", "ts", "event_id"))
    // 1-minute buckets: the bot crosses ~125 boundaries
    val bucketed = m(EventAnalytics.transitionsBucketed(ev, "user_id",
      "event_type", "ts", "event_id", bucketUs = 60000000L))
    assert(bucketed === total)
    assert(total.values.sum === 499L + 1L + 1L) // 503 events, 3 users w/ pairs
    // degenerate bucket (1 us) = every pair is a boundary pair
    val tiny = m(EventAnalytics.transitionsBucketed(ev, "user_id",
      "event_type", "ts", "event_id", bucketUs = 1L))
    assert(tiny === total)
  }

  test("transitionsBucketed total-order assertion is loud on duplicate keys, silent on unique ones") {
    // duplicate (user, ts, tie): the decomposition's equality with
    // transitions() is undefined — the opt-in assertion must name it
    val dup = Seq(
      (1L, ts(0), "a", 100L), (1L, ts(0), "b", 100L),
      (1L, ts(1), "c", 101L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val e = intercept[IllegalArgumentException] {
      EventAnalytics.transitionsBucketed(dup, "user_id", "event_type",
        "ts", "event_id", assertTotalOrder = true)
    }
    assert(e.getMessage.contains("total order"))
    // unique keys: the assertion passes through and the counts match
    // the one-window operator
    val ok = Seq(
      (1L, ts(0), "a", 100L), (1L, ts(0), "b", 101L),
      (1L, ts(1), "c", 102L))
      .toDF("user_id", "ts", "event_type", "event_id")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(EventAnalytics.transitionsBucketed(ok, "user_id",
        "event_type", "ts", "event_id", assertTotalOrder = true))
      === m(EventAnalytics.transitions(ok, "user_id", "event_type",
        "ts", "event_id")))
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
