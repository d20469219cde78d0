package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Integer-domain PageRank semantics: one hand-computed round,
  * multigraph normalization, mass decay bound, determinism. */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("one round on a 3-node hand graph reproduces the exact longs") {
    // 1→2, 2→1, 3→1; N = 3; pr0 = 333333333333 each; base = 50000000000
    val e = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("s", "d")
    val got = GraphOps.pageRank(e, "s", "d", iters = 1)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq(
      (1L, 50000000000L + 85L * (333333333333L * 2) / 100L),
      (2L, 50000000000L + 85L * 333333333333L / 100L),
      (3L, 50000000000L)))
  }

  test("duplicate edges and self-loops are normalized away") {
    val messy = Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L)).toDF("s", "d")
    val clean = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    def run(df: org.apache.spark.sql.DataFrame) =
      GraphOps.pageRank(df, "s", "d", iters = 3)
        .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(messy) == run(clean))
  }

  test("total mass never exceeds SCALE (floored shares only decay)") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("s", "d")
    val total = GraphOps.pageRank(e, "s", "d", iters = 5)
      .agg(sum("pr")).head().getLong(0)
    assert(total <= GraphOps.Scale)
    assert(total > GraphOps.Scale / 2) // and the decay is ulp-scale, not mass-scale
  }

  test("deterministic across runs on a derived graph") {
    val e = spark.range(500).select(
      (col("id") % 37).as("s"), (col("id") * 7 % 37).as("d"))
    def run() = GraphOps.pageRank(e, "s", "d", iters = 4)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run() == run())
  }
}
