package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plan-shape regression guards: the properties that make these
  * queries scale are asserted, not just eyeballed — filter pushdown
  * reaching the parquet scan, column pruning, aggregation instead of
  * window sorts for argmin, and the single-exchange as-of shape.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formattedPlan(df: DataFrame): String = {
    val explain = new java.io.ByteArrayOutputStream()
    Console.withOut(explain) { df.explain("formatted") }
    explain.toString
  }

  test("q1_agg pushes the shipdate filter into the scan and prunes columns") {
    val plan = formattedPlan(StarQueries.q1Agg(spark, sf))
    assert(plan.contains("PushedFilters") && plan.contains("LessThanOrEqual(l_shipdate"))
    // pruned read schema: none of the unused lineitem columns
    assert(!plan.contains("l_comment") && !plan.contains("l_receiptdate"))
  }

  test("fastest leaderboard is a hash aggregation, not a window sort") {
    val plan = planOf(StarQueries.fastestLeaderboard(spark, sf))
    assert(!plan.contains("Window"), s"argmin must not plan a window:\n$plan")
    assert(plan.contains("Aggregate") || plan.contains("HashAggregate"))
  }

  test("as-of join plans exactly one hash-partitioning exchange") {
    val plan = planOf(StarQueries.asofBackward(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }

  test("top-k plans TakeOrderedAndProject, not a global sort") {
    val plan = planOf(StarQueries.topK(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("IVF assignment never shuffles the candidate corpus") {
    val plan = planOf(ExtQueries.ivfTopK(spark, sf))
    // exchanges may hash on the cell id (probe join) or query_id
    // (ranking window) — but the candidate vectors themselves must be
    // assigned map-side, so no exchange keys on a vector id
    val keys = "Exchange hashpartitioning\\(([a-zA-Z_0-9#]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(keys.forall(k => !k.startsWith("neighbor_id") && !k.startsWith("vec_id")),
      s"candidate corpus must not shuffle for cell assignment: $keys\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"centroid set must ride a broadcast:\n$plan")
  }

  test("event filters push into the events scan for as-of inputs") {
    val plan = formattedPlan(StarQueries.asofNearest(spark, sf))
    assert(plan.contains("PushedFilters") && plan.contains("event_type"))
  }
}
