package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Winnowing (SIGMOD'03) selection guarantees, the MOSS overlap
  * report, CCNet tercile routing, and temperature-mix quota algebra
  * on hand-built corpora.
  */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fp(rows: (Long, String)*): Map[Long, Set[Long]] =
    TextOps.winnowFingerprints(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getLong(1)).toSet }

  test("winnowing guarantee: a shared w+k-1 token run shares a fingerprint") {
    // k=3, w=4 → any shared run of 6 tokens must share >= 1 selected
    // fingerprint. The run is embedded at different offsets amid
    // unrelated text.
    val run = "one two three four five six"
    val m = fp(
      (1L, s"aa bb cc $run dd ee"),
      (2L, s"$run xx yy zz qq ww rr tt"))
    assert(m(1L).intersect(m(2L)).nonEmpty,
      "documents sharing a 6-token run must share a fingerprint")
  }

  test("selection density is ~2/(w+1), far below one per shingle") {
    val toks = (1 to 400).map(i => s"t${i % 97}x$i").mkString(" ")
    val m = fp((1L, toks))
    val shingles = 400 - 3 + 1
    assert(m(1L).size < shingles / 2,
      s"selected ${m(1L).size} of $shingles shingles — winnowing must thin")
    assert(m(1L).size > shingles / 10)
  }

  test("short docs degenerate: <k tokens none, <w+k-1 tokens one global min") {
    val m = fp((1L, "just two"), (2L, "exactly three tokens here"))
    assert(!m.contains(1L), "fewer than k tokens → no fingerprints")
    // 4 tokens → 2 shingles < w → one window = global min → 1 fp
    assert(m(2L).size == 1)
  }

  test("winnowOverlap surfaces a planted clone and respects minShared") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val rows = Seq(
      (1L, base),
      (2L, base + " tail marker"),              // near-clone of 1
      (3L, (101 to 140).map(i => s"v$i").mkString(" ")))
    val out = TextOps.winnowOverlap(rows.toDF("doc_id", "text"),
      "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 2L),
      s"planted near-clone pair must surface: ${out.toSeq}")
    assert(!out.exists(p => p._2 == 3L || p._1 == 3L),
      "disjoint doc must not pair")
  }

  test("winnowOverlap df cap drops boilerplate fingerprints") {
    // 60 identical boilerplate docs, 14 tokens → 12 shingles → 9
    // windows; each selected min covers at most w=4 windows, so every
    // doc selects >= ceil(9/4) = 3 fingerprints (pigeonhole), all
    // with df = 60. Under maxDf=50 they all drop → zero pairs; with
    // the cap lifted to 60 every pair shares those >= 3 >= minShared
    // fingerprints → all C(60,2) = 1770 pairs. The cap is exactly
    // what separates the two outcomes.
    val boiler = ("the quick brown fox jumps over a lazy dog near " +
      "the old stone bridge")
    val rows = (1L to 60L).map(i => (i, boiler))
    val capped = TextOps.winnowOverlap(rows.toDF("doc_id", "text"),
      "doc_id", "text").collect()
    assert(capped.isEmpty,
      s"df-capped boilerplate must not generate ${capped.length} pairs")
    val uncapped = TextOps.winnowOverlap(rows.toDF("doc_id", "text"),
      "doc_id", "text", maxDf = 60).collect()
    assert(uncapped.length == 1770)
    assert(uncapped.forall(_.getLong(2) >= 3L))
  }

  test("ccnetBuckets: terciles per language are balanced and ordered") {
    // 9 docs in one lang with increasing rare-token density → strictly
    // increasing surprisal keys; terciles must be 3/3/3 in key order.
    val rows = (1 to 9).map { i =>
      val commons = Seq.fill(9 - i)("common").mkString(" ")
      val rares = (1 to i).map(j => s"rare${i}_$j").mkString(" ")
      (i.toLong, s"$commons $rares".trim, "en")
    } :+ ((100L, "common common common", "fr"))
    val out = TextOps.ccnetBuckets(rows.toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang").collect()
    val en = out.filter(_.getString(1) == "en")
    assert(en.groupBy(_.getLong(4)).view.mapValues(_.length).toMap ==
      Map(1L -> 3, 2L -> 3, 3L -> 3))
    // the head tercile holds the three lowest ppl keys
    val byTier = en.groupBy(_.getString(5)).view
      .mapValues(_.map(_.getLong(3)).toSeq).toMap
    assert(byTier("head").max <= byTier("middle").min)
    assert(byTier("middle").max <= byTier("tail").min)
    // the single fr doc lands in its own partition, bucket 1 = head
    val fr = out.filter(_.getString(1) == "fr")
    assert(fr.length == 1 && fr(0).getString(5) == "head")
  }

  test("temperature quotas: sqrt up-weights small sources, never overshoots") {
    val rows = (1L to 400L).map(i => (i, "big")) ++
      (401L to 425L).map(i => (i, "small"))
    val df = rows.toDF("doc_id", "source")
    val q = Sampling.temperatureQuotas(df, "doc_id", "source", budget = 100L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (nBig, _, qBig) = q("big")
    val (nSmall, _, qSmall) = q("small")
    // proportional would give small 100*25/425 ≈ 5; sqrt temperature
    // gives 100*5/(20+5) = 20 — up-weighted 4x.
    assert(qSmall * nBig > qBig * nSmall,
      "sqrt mixing must up-weight the small source relative to counts")
    assert(qBig + qSmall <= 100L, "quotas must never overshoot budget")
    assert(qBig + qSmall >= 100L - 1L, "floor undershoot < #sources")
    // hand values: w_big = floor(sqrt(400*2^20)) = 20480,
    // w_small = floor(sqrt(25*2^20)) = 5120, Σw = 25600
    // quota_big = 100*20480 div 25600 = 80, small = 20.
    assert(qBig == 80L && qSmall == 20L)
  }

  test("temperatureSample returns exactly the quota per source, stably") {
    val rows = (1L to 400L).map(i => (i, "big")) ++
      (401L to 425L).map(i => (i, "small"))
    val df = rows.toDF("doc_id", "source")
    val out = Sampling.temperatureSample(df, "doc_id", "source",
      budget = 100L).collect()
    val bySrc = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySrc == Map("big" -> 80, "small" -> 20))
    // deterministic: same picked set on re-run
    val again = Sampling.temperatureSample(df, "doc_id", "source",
      budget = 100L).collect().map(_.getLong(0)).toSet
    assert(again == out.map(_.getLong(0)).toSet)
    // and stable under corpus reordering (hash order, not input order)
    val shuffled = Sampling.temperatureSample(
      df.orderBy(col("doc_id").desc), "doc_id", "source", budget = 100L)
      .collect().map(_.getLong(0)).toSet
    assert(shuffled == again)
  }
}
