package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computed cases for the analytics shapes (funnel, retention,
  * quality checks): the sf-fixture oracles prove engine parity; these
  * prove the SEMANTICS on inputs where the expected answer is
  * checkable by eye — including planted violations for the quality
  * suite, which is all-zeros on the clean fixtures.
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")

  private def funnelOf(rows: (Long, String, Int)*): (Long, Long, Long) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    rows.map { case (u, t, m) => (u * 1000 + m, ts(m), u, t, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = StarQueries.funnel(spark, dir).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("funnel: stages are strictly ordered per user, first occurrences anchor") {
    assert(funnelOf(
      (1, "view", 10), (1, "click", 20), (1, "purchase", 30), // full path
      (2, "view", 10), (2, "click", 5),                       // click BEFORE view: no stage 2
      (3, "click", 10), (3, "purchase", 20),                  // never viewed: not in funnel
      (4, "view", 10), (4, "purchase", 20)                    // skipped click: stops at view
    ) === ((3L, 1L, 1L)))
  }

  test("funnel: a second, later click still counts (first qualifying wins)") {
    assert(funnelOf(
      (1, "view", 10), (1, "click", 5), (1, "click", 15), (1, "purchase", 20)
    ) === ((1L, 1L, 1L)))
  }

  test("retention: D1/D7 flags from planted activity days") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ret").toString
    def day(d: Int, u: Long) = (u * 100 + d, Timestamp.valueOf(f"2024-01-${d}%02d 09:00:00"), u, "view", 1.0, "{}")
    Seq(
      day(1, 1), day(2, 1), day(8, 1), // cohort d1: back on D1 and D7
      day(1, 2), day(3, 2),            // cohort d1: neither D1 nor D7
      day(2, 3), day(3, 3)             // cohort d2: back on D1
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StarQueries.retention(spark, dir).collect()
      .map(r => r.getTimestamp(0).toString.take(10) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      "2024-01-01" -> ((2L, 1L, 1L)),
      "2024-01-02" -> ((1L, 1L, 0L))))
  }

  test("quality checks fire on planted violations") {
    val dir = java.nio.file.Files.createTempDirectory("graft-qc").toString
    def write(name: String, df: DataFrame) =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    write("customer", Seq((1, "a", 1, 0.0, "B"), (1, "b", 1, 0.0, "B"), (2, "c", 1, 0.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    write("orders", Seq((10L, 1L, "O", 5.0, ts(1), null.asInstanceOf[String]),
        (11L, 2L, "O", 6.0, ts(2), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
    write("lineitem", Seq(
        (10L, 1L, 1L, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", ts(1)),   // ok
        (99L, 1L, 1L, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", ts(1)),   // orphan order
        (11L, 1L, 1L, 2, 99.0, 1.0, 0.0, 0.0, "N", "O", ts(1)))  // qty out of range
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate"))
    write("events", Seq((1L, ts(1), null.asInstanceOf[java.lang.Long], "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = StarQueries.qualityChecks(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "customer_dup_keys" -> 1L,     // key 1 twice
      "events_null_user" -> 1L,
      "lineitem_orphans" -> 1L,      // orderkey 99
      "lineitem_qty_range" -> 1L,    // qty 99
      "orders_null_priority" -> 1L))
  }
}
