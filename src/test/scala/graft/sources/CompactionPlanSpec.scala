package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Compaction-plan semantics: the start-offset grouping rule holds
  * exactly against a recomputation from the per-file stats, groups
  * are contiguous in file order, and multi-part directories plan one
  * row per part file.
  */
class CompactionPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("multi-part directory: one row per part, rule holds exactly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-compact").toString
    spark.range(20000).selectExpr("id", "id * 2 AS v")
      .repartition(5).write.mode("overwrite").parquet(dir)
    val target = 20000L
    val plan = Layout.compactionPlan(spark, dir, target)
      .orderBy("file_name")
      .select("file_name", "file_bytes", "group_id", "group_bytes",
        "n_files_in_group")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val parts = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(plan.size == parts && parts == 5)
    // recompute the rule from the raw stats
    var cum = 0L
    plan.foreach { case (_, bytes, gid, _, _) =>
      assert(gid == cum / target, s"rule mismatch at cum=$cum")
      cum += bytes
    }
    // per-group rollups are consistent
    plan.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.forall(_._4 == rows.map(_._2).sum))
      assert(rows.forall(_._5 == rows.size.toLong))
    }
    // groups are contiguous and non-decreasing in file order
    assert(plan.map(_._3) == plan.map(_._3).sorted)
  }

  test("a huge target plans a single group over the fixture dir") {
    val plan = Layout.compactionPlan(spark, "/root/testdata/sf0.001",
      targetBytes = Long.MaxValue)
    assert(plan.select("group_id").distinct().count() == 1L)
  }
}
