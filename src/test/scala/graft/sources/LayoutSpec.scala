package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The layout helpers must actually change the plans: partitioned
  * writes prune directories, and same-bucketed tables join with no
  * shuffle exchange.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed tables sort-merge-join without a shuffle exchange") {
    val left = (1 to 1000).map(i => (i.toLong % 50, i.toLong, i * 1.0))
      .toDF("k", "id", "v")
    val right = (1 to 200).map(i => (i.toLong % 50, s"tag$i")).toDF("k", "tag")
    Layout.writeBucketed(left, "bucketed_l", Seq("k"), 8, Seq("k"))
    Layout.writeBucketed(right, "bucketed_r", Seq("k"), 8, Seq("k"))
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // plain plan (no AQE re-writes), no broadcast: a bucket-aligned
      // SMJ must need zero ShuffleExchange nodes
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bucketed_l").join(spark.table("bucketed_r"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucket-aligned join must not shuffle:\n$plan")
      assert(joined.count() ===
        left.join(right, "k").count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS bucketed_l")
      spark.sql("DROP TABLE IF EXISTS bucketed_r")
    }
  }

  test("partitioned write prunes directories for equality predicates") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val df = (1 to 100).map(i => (i % 4, i.toLong)).toDF("part", "id")
    Layout.writePartitioned(df, dir, Seq("part"))
    val pruned = spark.read.parquet(dir).filter(col("part") === 2)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() === 25)
    // the file listing itself is restricted to one partition directory
    assert(scan.contains("PartitionFilters: [isnotnull(part"),
      s"expected partition filters in:\n$scan")
  }
}
