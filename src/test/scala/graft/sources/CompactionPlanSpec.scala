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

  test("compactGroups executes the plan row-exactly, one file per group") {
    val src = java.nio.file.Files
      .createTempDirectory("graft-compact-src").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-compact-out").toString
    spark.range(20000).selectExpr("id", "md5(CAST(id AS STRING)) AS v")
      .repartition(8).write.mode("overwrite").parquet(src)
    val target = 150000L
    val v = Layout.compactGroups(spark, src, out, target)
      .select("group_id", "n_files_in", "plan_rows", "out_files",
        "out_rows", "rows_match")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(v.nonEmpty && v.exists(_._2 > 1),
      s"fixture produced no multi-file group: $v")
    assert(v.forall(_._6), s"row mismatch: $v")
    assert(v.forall(_._4 == 1L), s"more than one file per group: $v")
    assert(v.map(_._3).sum == 20000L)
    // total rows also survive a full read of the compacted tree, and
    // the sources are untouched (retirement is the caller's call)
    assert(spark.read.parquet(out).count() == 20000L)
    assert(spark.read.parquet(src).count() == 20000L)

    // IDEMPOTENCE (the fixed point): a file that already meets the
    // target is never re-merged — re-planning the compacted tree at
    // any target <= its smallest file yields only singleton groups,
    // so a second compaction pass rewrites nothing. (Exact same-target
    // re-planning can still merge: compacting k files drops k-1
    // footers and re-compresses, so outputs may land just under the
    // byte target — the plan is a byte rule, not a row rule.)
    val minOut = Layout.parquetFileStats(spark, out)
      .agg(org.apache.spark.sql.functions.min("file_bytes"))
      .as[Long].head()
    val replan = Layout.compactionPlan(spark, out, minOut)
    assert(replan.select("n_files_in_group").distinct()
      .as[Long].collect().toSeq == Seq(1L),
      "a compacted file was re-merged at its own fixed point")
  }
}
