package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WeightedSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int) =
    (1 to n).map(i => (i.toLong, (i % 10 + 1).toLong)).toDF("id", "w")

  test("returns exactly k rows, deterministically, partitioning-invariant") {
    val a = Sampling.weightedPrioritySample(corpus(500), "id", col("w"), 50)
      .collect().map(_.getLong(0)).toSeq
    val b = Sampling.weightedPrioritySample(corpus(500).repartition(11),
      "id", col("w"), 50).collect().map(_.getLong(0)).toSeq
    assert(a.size === 50)
    assert(a.toSet === b.toSet)
  }

  test("selection odds grow with weight; an overwhelming weight always wins") {
    // same ids hashed identically: the weight-10 copies of a row beat
    // its weight-1 copy whenever both compete (identical hash, bigger
    // divisor -> smaller priority)
    val heavy = (1 to 400).map(i => (i.toLong, if (i <= 200) 10L else 1L))
      .toDF("id", "w")
    val kept = Sampling.weightedPrioritySample(heavy, "id", col("w"), 100)
      .collect().map(_.getLong(0))
    val heavyKept = kept.count(_ <= 200)
    assert(heavyKept >= 75, s"heavy rows under-selected: $heavyKept/100")
    // a single huge-weight row has priority ~0 and must always be kept
    val spiked = heavy.union(Seq((9999L, 1000000000000L)).toDF("id", "w"))
    val kept2 = Sampling.weightedPrioritySample(spiked, "id", col("w"), 10)
      .collect().map(_.getLong(0))
    assert(kept2.contains(9999L))
  }

  test("equal weights degrade to plain hash-order top-k") {
    val flat = (1 to 300).map(i => (i.toLong, 7L)).toDF("id", "w")
    val sample = Sampling.weightedPrioritySample(flat, "id", col("w"), 30)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // priorities are hash/7 — distinct hashes make distinct priorities
    // almost surely; the set equals the 30 smallest of them
    val all = Sampling.weightedPrioritySample(flat, "id", col("w"), 300)
      .collect().map(r => (r.getLong(2), r.getLong(0))).sorted.take(30)
      .map(_._2).toSet
    assert(sample.map(_._1).toSet === all)
  }
}
