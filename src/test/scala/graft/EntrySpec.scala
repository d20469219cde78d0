package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: the flagship entry query must return
  * rows on the smallest fixtures, and every declared query must have
  * an oracle or be consciously rows-only.
  */
class EntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has an oracle entry (and vice versa)") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }
}
