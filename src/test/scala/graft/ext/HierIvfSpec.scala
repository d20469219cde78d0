package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Two-level coarse assignment (Similarity.ivfResidualsHier) and the
  * exact-family pre-flight (Dedup.pairMassPreflight /
  * exactOrCappedPairs): the hier path degrades to the flat argmin
  * when every group is probed, routes through the nearest top when
  * not, and the pre-flight's pair-mass arithmetic matches a
  * hand-computed corpus and actually flips the route.
  */
class HierIvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(rows: (Long, Array[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("hier assignment equals flat when w covers every top group") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val cands = e.filter(col("vec_id") >= 20)
    val cents = cands.filter(col("vec_id") % 21 === 0)
    val tops = cents // every leaf is its own top -> singleton groups
    val nTops = tops.count().toInt
    val flat = Similarity.ivfResiduals(cands, cents, "vec_id", "embedding")
      .select(col("neighbor_id"), col("__cell").as("flat"))
    val hier = Similarity.ivfResidualsHier(cands, cents, tops,
      "vec_id", "embedding", w = nTops)
      .select(col("neighbor_id"), col("__cell").as("hier"))
    val diff = flat.join(hier, Seq("neighbor_id"))
      .filter(col("flat") =!= col("hier")).count()
    assert(diff == 0L)
  }

  test("hier w=1 assigns inside the nearest top's group only") {
    // two well-separated groups; tops are the group anchors
    val cents = vecs(
      10L -> Array(10f, 0f, 0f, 0f), 11L -> Array(11f, 0f, 0f, 0f),
      20L -> Array(0f, 10f, 0f, 0f), 21L -> Array(0f, 11f, 0f, 0f))
    val tops = vecs(10L -> Array(10f, 0f, 0f, 0f),
      20L -> Array(0f, 10f, 0f, 0f))
    // candidate nearest 11 overall; with w=1 it still probes top 10's
    // group (x-axis) and must pick 11 there
    val cand = vecs(1L -> Array(11.4f, 0.1f, 0f, 0f),
      2L -> Array(0.1f, 10.6f, 0f, 0f))
    val out = Similarity.ivfResidualsHier(cand, cents, tops,
      "vec_id", "embedding", w = 1)
      .select("neighbor_id", "__cell").as[(Long, Long)].collect().toMap
    assert(out(1L) == 11L)
    assert(out(2L) == 21L)
  }

  test("hier residual is candidate minus the winning leaf centroid") {
    val cents = vecs(10L -> Array(10f, 0f, 0f, 0f),
      20L -> Array(0f, 10f, 0f, 0f))
    val cand = vecs(1L -> Array(9f, 1f, 0f, 0f))
    val rv = Similarity.ivfResidualsHier(cand, cents, cents,
      "vec_id", "embedding", w = 2)
      .select("__rv").as[Seq[Double]].head()
    assert(rv == Seq(-1.0, 1.0, 0.0, 0.0))
  }

  test("w-sweep curve: one row per w, fixed corpus, agreement grows") {
    val out = graft.queries.ExtQueries
      .ivfHierCurve(spark, "/root/testdata/sf0.001")
      .orderBy("w")
      .select("w", "n_vectors", "n_same_cell")
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.map(_._2).distinct.length == 1) // same corpus each arm
    // on this fixture (no exact-d2 ties) probing more groups only
    // moves the pick toward the flat argmin
    assert(out.last._3 >= out.head._3)
  }

  test("w-sweep on the anisotropic fixture saturates early (the knee)") {
    // the isotropic sweep is near-linear in w (211/284/357/419 of 480
    // at sf0.01 — the floor its scaladoc predicts); on the planted
    // 17-slab corpus the top-level router recovers almost the whole
    // flat assignment at w = 1 — the knee a deployment sizes w from
    val out = graft.queries.ExtQueries
      .ivfHierCurveAniso(spark, "/root/testdata/sf0.01")
      .orderBy("w")
      .select("w", "n_vectors", "n_same_cell")
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    val (n, w1) = (out.head._2, out.head._3)
    assert(w1 * 10 >= n * 9, s"w=1 agreement $w1/$n below 90%")
  }

  test("pairMassPreflight matches the hand-computed pair mass") {
    // three identical 7-token docs: 5 distinct 3-shingles each,
    // prefix L = 5 - ceil(0.6*5) + 1 = 3, each prefix shingle has
    // pdf = 3 -> est = 3 * C(3,2) = 9
    val docs = Seq(1L, 2L, 3L).map(i => (i, "a b c d e f g"))
      .toDF("doc_id", "text")
    val row = Dedup.pairMassPreflight(docs, "doc_id", "text",
      budgets = Seq(100L)).collect().head
    assert(row.getAs[Long]("n_docs") == 3L)
    assert(row.getAs[Long]("n_shingle_rows") == 15L)
    assert(row.getAs[Long]("n_prefix_rows") == 9L)
    assert(row.getAs[Long]("est_candidate_pairs") == 9L)
    assert(row.getAs[Boolean]("within_budget"))
  }

  test("exactOrCappedPairs takes the exact branch under budget") {
    val docs = Seq(
      (1L, "a b c d e f g"), (2L, "a b c d e f g"),
      (3L, "x y z w q r s")).toDF("doc_id", "text")
    val out = Dedup.exactOrCappedPairs(docs, "doc_id", "text",
      budgetPairs = 1000000L)
    val rows = out.select("doc_a", "doc_b", "route")
      .as[(Long, Long, String)].collect().toSet
    assert(rows == Set((1L, 2L, "exact")))
    val expected = Dedup.prefixFilterPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(rows.map(r => (r._1, r._2)) == expected)
  }

  test("exactOrCappedPairs refuses the exact path above budget") {
    // a 12-clique of identical docs: C(12,2)=66 pairs per prefix
    // shingle, far above the 10-pair budget -> capped LSH route
    val docs = (1L to 12L).map(i => (i, "a b c d e f g"))
      .toDF("doc_id", "text")
    val out = Dedup.exactOrCappedPairs(docs, "doc_id", "text",
      budgetPairs = 10L, maxBucketSize = 64)
    val routes = out.select("route").distinct().as[String].collect().toSet
    assert(routes == Set("lsh_capped"))
    // identical docs share every band bucket -> all pairs surface
    assert(out.count() == 66L)
  }

  test("exactOrCappedPairs onOverBudget=shard keeps the exact answer") {
    // the same 12-clique: est 198 pre-filter pairs (3 prefix shingles
    // x C(12,2)) vs budget 10 -> 20 sequential shard passes, answer
    // identical to the single-pass exact join (all 66 pairs, once)
    val docs = (1L to 12L).map(i => (i, "a b c d e f g"))
      .toDF("doc_id", "text")
    val out = Dedup.exactOrCappedPairs(docs, "doc_id", "text",
      budgetPairs = 10L, onOverBudget = "shard")
    val rows = out.select("doc_a", "doc_b", "route")
      .as[(Long, Long, String)].collect()
    assert(rows.map(_._3).toSet == Set("exact_sharded"))
    val pairs = rows.map(r => (r._1, r._2))
    assert(pairs.length == 66 && pairs.toSet.size == 66)
    val expected = Dedup.prefixFilterPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.toSet == expected)
  }

  test("exactOrCappedPairs onOverBudget=fail refuses above budget") {
    val docs = (1L to 12L).map(i => (i, "a b c d e f g"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      Dedup.exactOrCappedPairs(docs, "doc_id", "text",
        budgetPairs = 10L, onOverBudget = "fail")
    }
    assert(e.getMessage.contains("exceeds budget"))
    // under budget, "fail" never triggers: the exact branch runs
    val ok = Dedup.exactOrCappedPairs(docs, "doc_id", "text",
      budgetPairs = 1000000L, onOverBudget = "fail")
    assert(ok.select("route").distinct().as[String].collect().toSet
      == Set("exact"))
  }

  test("pairMassPreflightAB matches the hand-computed cross mass") {
    // index: three identical 7-token docs (prefix L = 3, pdfI = 3 per
    // prefix shingle); incoming: two more copies (pdfN = 2) ->
    // est = 3 shared prefix shingles x 3 x 2 = 18
    val idx = Seq(1L, 2L, 3L).map(i => (i, "a b c d e f g"))
      .toDF("doc_id", "text")
    val inc = Seq(101L, 102L).map(i => (i, "a b c d e f g"))
      .toDF("doc_id", "text")
    val row = Dedup.pairMassPreflightAB(idx, inc, "doc_id", "text",
      budgets = Seq(100L)).collect().head
    assert(row.getAs[Long]("n_index") == 3L)
    assert(row.getAs[Long]("n_incoming") == 2L)
    assert(row.getAs[Long]("est_candidate_pairs") == 18L)
    assert(row.getAs[Boolean]("within_budget"))
  }

  test("exactOrCappedPairsAB routes exact under budget, shard above") {
    val idx = (1L to 8L).map(i => (i, "a b c d e f g"))
      .toDF("doc_id", "text")
    val inc = (101L to 104L).map(i => (i, "a b c d e f g"))
      .toDF("doc_id", "text")
    val exact = Dedup.exactOrCappedPairsAB(idx, inc, "doc_id", "text",
      budgetPairs = 1000000L)
    assert(exact.select("route").distinct().as[String].collect().toSet
      == Set("exact"))
    // 8 x 4 identical cross pairs, each exactly once
    assert(exact.count() == 32L)
    val sharded = Dedup.exactOrCappedPairsAB(idx, inc, "doc_id", "text",
      budgetPairs = 10L, onOverBudget = "shard", maxShards = 5)
    val rows = sharded.select("index_id", "new_id", "route")
      .as[(Long, Long, String)].collect()
    assert(rows.map(_._3).toSet == Set("exact_sharded"))
    assert(rows.length == 32 &&
      rows.map(r => (r._1, r._2)).toSet.size == 32)
    assert(rows.map(r => (r._1, r._2)).toSet
      == exact.select("index_id", "new_id")
        .as[(Long, Long)].collect().toSet)
    intercept[IllegalStateException] {
      Dedup.exactOrCappedPairsAB(idx, inc, "doc_id", "text",
        budgetPairs = 10L, onOverBudget = "fail").collect()
    }
  }

  test("exactPrepRouted: a forced shard route leaves the composition's answer unchanged") {
    val dir = "/root/testdata/sf0.001"
    val base = graft.queries.ExtQueries.exactPrep(spark, dir)
      .collect().map(_.toSeq).toSet
    // budget 1 forces the over-budget shard route through the whole
    // composed pipeline (pairs -> CC -> representatives); the ladder
    // must be invisible in the output
    val routed = graft.queries.ExtQueries
      .exactPrepRouted(spark, dir, budgetPairs = 1L, maxShards = 3)
      .collect().map(_.toSeq).toSet
    assert(routed == base)
  }
}
