package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bloom-pruned semi-join invariants: never a false negative (the
  * pruned+exact result is exactly the plain semi-join), the pure
  * bitmap filter keeps every true member (false positives allowed),
  * and the bitmap stays within its declared bound. */
class BloomPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val numBits = 1 << 10 // deliberately small: force collisions

  test("prunedSemiJoin equals the plain left-semi join exactly") {
    val fact = (1 to 1000).map(i => (i.toLong, s"row$i")).toDF("k", "payload")
    val dim = Seq(3L, 77L, 500L, 999L, 2000L).toDF("dk")
    val got = BloomPrune.prunedSemiJoin(fact, dim, "k", "dk", numBits = numBits)
      .select("k").as[Long].collect().sorted
    assert(got === Array(3L, 77L, 500L, 999L))
  }

  test("bitmap filter alone has no false negatives under heavy collision") {
    val keys = (1 to 500).map(_.toLong)
    val dim = keys.toDF("dk")
    val words = BloomPrune.buildBitmap(dim, "dk", numBits, numHashes = 3)
    assert(words.length === numBits / 64)
    val survivors = dim
      .where(BloomPrune.mightContain(words, col("dk"), numHashes = 3))
      .count()
    assert(survivors === 500L) // every inserted key must pass its own filter
  }

  test("prunedSemiJoin works when fact and dim key columns share a name") {
    val fact = (1 to 100).map(i => (i.toLong, s"row$i")).toDF("k", "payload")
    val dim = Seq(7L, 42L, 500L).toDF("k") // same name as the fact key
    val got = BloomPrune.prunedSemiJoin(fact, dim, "k", "k", numBits = numBits)
      .select("k").as[Long].collect().sorted
    assert(got === Array(7L, 42L))
  }

  test("bitmap filter actually prunes non-members") {
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val words = BloomPrune.buildBitmap(dim, "dk", numBits = 1 << 14, numHashes = 3)
    val fact = (1L to 10000L).toDF("k")
    val kept = fact
      .where(BloomPrune.mightContain(words, col("k"), numHashes = 3))
      .count()
    // 3 true members + a handful of false positives at most — the
    // point is orders-of-magnitude pruning, not exactness (the exact
    // semi-join pass handles that).
    assert(kept >= 3L && kept < 100L, s"kept $kept of 10000")
  }
}
