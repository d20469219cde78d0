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

  test("triangleCounts: K4 plus a pendant edge, hand-counted") {
    // K4 on {1,2,3,4} = 4 triangles, each node in exactly 3; node 5
    // hangs off node 1 (degree 1, zero triangles but still reported)
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("s", "d")
    val got = GraphOps.triangleCounts(e, "s", "d")
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 0L))
  }

  test("triangleCounts: multigraph duplicates, reversed edges, and self-loops normalize away") {
    // the same triangle planted as (1,2),(2,3),(3,1) with a duplicate
    // (2,1), a reversed (1,3), and a self-loop — still ONE triangle
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (2L, 2L)).toDF("s", "d")
    val got = GraphOps.triangleCounts(e, "s", "d")
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("personalized PageRank: one hand round, teleport only to the seed") {
    // 1→2, 2→1, 3→1; seed {1}: pr0 = (SCALE, 0, 0); round 1:
    // node 1 gets only its teleport (no inbound mass yet), node 2
    // gets 85% of the seed's share, node 3 gets nothing
    val e = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("s", "d")
    val got = GraphOps.personalizedPageRank(e, "s", "d",
        seeds = Seq(1L), iters = 1)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq(
      (1L, 150000000000L),
      (2L, 85L * 1000000000000L / 100L),
      (3L, 0L)))
  }

  test("kCore: triangle with a tendril keeps only the triangle at k=2") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    val got = GraphOps.kCore(e, "s", "d", k = 2)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: a path peels to nothing, one layer per round") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    assert(GraphOps.kCore(e, "s", "d", k = 2).count() == 0L)
    // bounded peel: with maxRounds = 1 only the first layer (the two
    // degree-1 ends) has dropped — the interior survives as the
    // documented capped state
    val capped = GraphOps.kCore(e, "s", "d", k = 2, maxRounds = 1)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq == Seq(2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("kCore: K4 survives k=3 intact and early-exits") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("s", "d")
    val got = GraphOps.kCore(e, "s", "d", k = 3, maxRounds = 10)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("bipartiteCoOccurrence: hand pairs, duplicate edges collapse, cap drops highest ids") {
    // u1 touches {1,2,3} (dup edge to 2 collapses) -> 3 pairs;
    // u2 touches {2,3} -> 1 pair; u3 touches {1,2,3,4} but cap=3
    // keeps the LOWEST ids {1,2,3}
    val e = Seq((1L, 1L), (1L, 2L), (1L, 2L), (1L, 3L),
      (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L), (3L, 3L), (3L, 4L)).toDF("u", "i")
    val got = GraphOps.bipartiteCoOccurrence(e, "u", "i", maxPerUser = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(
      (1L, 2L) -> 2L, (1L, 3L) -> 2L, (2L, 3L) -> 3L))
  }

  test("bipartiteCoOccurrence equals the capped self-join on a random bipartite graph") {
    val e = spark.range(600).select(
      (col("id") % 23).as("u"), ((col("id") * 17 + 3) % 40).as("i"))
    val cap = 6
    import org.apache.spark.sql.expressions.Window
    val ui = e.distinct()
    val capped = ui.withColumn("rk", org.apache.spark.sql.functions
        .row_number().over(Window.partitionBy("u").orderBy("i")))
      .filter(col("rk") <= cap).select("u", "i")
    val a = capped.select(col("u"), col("i").as("ia"))
    val b = capped.select(col("u"), col("i").as("ib"))
    val brute = a.join(b, Seq("u")).where(col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val got = GraphOps.bipartiteCoOccurrence(e, "u", "i", cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got === brute)
  }

  test("bipartiteLift: hand case evaluates to exact doubles") {
    // u1{1,2}, u2{1,2}, u3{1}: N=3, cnt(1)=3, cnt(2)=2, co(1,2)=2
    // lift = 2*3/3/2 = 1.0 exactly (all operands are small integers)
    val e = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L))
      .toDF("u", "i")
    val r = GraphOps.bipartiteLift(e, "u", "i", maxPerUser = 5).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5)) === ((1L, 2L, 2L, 3L, 2L, 1.0)))
  }

  test("bipartiteCapAudit prices the pair mass with and without the cap") {
    // n_items per user: u1=3, u2=5 with cap 3:
    // uncapped pairs 3+10=13, capped 3+3=6, dropped items 2
    val e = (Seq((1L, 1L), (1L, 2L), (1L, 3L)) ++
      (1 to 5).map(i => (2L, i.toLong))).toDF("u", "i")
    val r = GraphOps.bipartiteCapAudit(e, "u", "i", maxPerUser = 3).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((2L, 1L, 2L, 13L, 6L)))
  }

  test("triangleCounts matches the brute-force 3-join on a skewed random graph") {
    // hub node 0 touches everything (the degree-orientation's target
    // regime); brute force = id-ordered a<b<c three-way join
    val e = spark.range(300).select(
      (col("id") % 50).as("s"), ((col("id") * 13 + 7) % 50).as("d"))
      .unionByName(spark.range(49).select(
        lit(0L).as("s"), (col("id") + 1).as("d")))
    val simple = e.filter(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("a"),
        greatest(col("s"), col("d")).as("b")).distinct()
    val e1 = simple.select(col("a").as("u"), col("b").as("v"))
    val e2 = simple.select(col("a").as("v"), col("b").as("w"))
    val e3 = simple.select(col("a").as("u"), col("b").as("w"))
    val tri = e1.join(e2, Seq("v")).join(e3, Seq("u", "w"))
    val brute = tri.select(col("u").as("node"))
      .unionByName(tri.select(col("v").as("node")))
      .unionByName(tri.select(col("w").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = GraphOps.triangleCounts(e, "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.filter(_._2 > 0L) == brute)
    assert(got.keySet.forall(n => brute.contains(n) || got(n) == 0L))
  }
}
