package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.ExtQueries

/** SemDeDup semantics: near-identical vectors connect and the min-id
  * representative is kept, dissimilar vectors survive as their own
  * singleton components, and the gate query's planted clones resolve
  * to their bases.
  */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("planted near-identical groups collapse to min-id reps") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0001f, 0.0f, 0.0f)), // ~parallel to 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.0001f, 1.0f, 0.0f, 0.0f)), // ~parallel to 3
      (5L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (6L, Array(0.5f, 0.5f, 0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(df, "vec_id", "embedding",
      dim = 4, k = 2, iters = 2, minCosine = 0.99)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(out.size == 6)
    assert(out(1L) == (1L, true))
    assert(out(2L) == (1L, false))
    assert(out(3L) == (3L, true))
    assert(out(4L) == (3L, false))
    assert(out(5L) == (5L, true))
    assert(out(6L) == (6L, true))
  }

  test("is deterministic across runs") {
    def run() = ExtQueries.semanticDedupQ(spark, "/root/testdata/sf0.001")
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(run() == run())
  }

  test("gate query: every planted clone resolves to its base, bases kept") {
    val rows = ExtQueries.semanticDedupQ(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    val clones = rows.keys.filter(_ >= 10000L)
    assert(clones.nonEmpty)
    clones.foreach { c =>
      assert(rows(c) == (c - 10000L, false), s"clone $c")
      assert(rows(c - 10000L) == (c - 10000L, true), s"base of $c")
    }
    // random fixture vectors do not accidentally clear 0.99 cosine:
    // everything outside the planted clone pairs is its own component
    rows.filter(_._1 < 10000L).foreach { case (id, (comp, rep)) =>
      assert(comp == id && rep, s"vec $id unexpectedly deduped")
    }
  }
}
