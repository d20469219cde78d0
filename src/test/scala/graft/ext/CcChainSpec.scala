package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pointer-halving connected components on diameter-heavy graphs:
  * long chains converge in logarithmic rounds (plain min-label pays a
  * round per hop and would exhaust the 25-round budget), labels still
  * equal the component minimum, and clique graphs stay at their
  * 2-round floor.
  */
class CcChainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a 200-link chain converges inside the round budget to min ids") {
    // plain min-label would need 199 rounds; halving needs ~log2(199)
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val out = Dedup.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(out.size == 200)
    assert(out.values.toSet == Set(0L))
  }

  test("two chains and an isolated pair keep separate components") {
    val edges = ((0L until 49L).map(i => (i, i + 1)) ++
      (100L until 149L).map(i => (i, i + 1)) :+ (900L, 901L))
      .toDF("a", "b")
    val out = Dedup.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert((0L to 49L).forall(out(_) == 0L))
    assert((100L to 149L).forall(out(_) == 100L))
    assert(out(900L) == 900L && out(901L) == 900L)
  }

  test("clique graphs keep the min-id label under the halving loop") {
    val edges = (for (a <- 0L until 8L; b <- (a + 1) until 8L)
      yield (a * 10, b * 10)).toDF("a", "b")
    val out = Dedup.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(out.values.toSet == Set(0L))
  }
}
