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

  test("simhash64 fingerprint is a pure projection — zero exchanges") {
    // the whole point of the native expression: the fingerprint is
    // computed where the row lives, no explode, no aggregation
    val plan = planOf(ExtQueries.simhash64Fp(spark, sf))
    assert(!plan.contains("Exchange"),
      s"simhash64 must not shuffle:\n$plan")
    assert(plan.contains("simhash64"),
      s"native expression must appear in the plan:\n$plan")
  }

  test("IVF cell audit shuffles only the (bounded) cell counts") {
    val plan = planOf(ExtQueries.ivfCellAudit(spark, sf))
    val keys = "Exchange hashpartitioning\\(([a-zA-Z_0-9#]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(keys.nonEmpty && keys.forall(k =>
        k.startsWith("cell") || k.startsWith("__cell")),
      s"only the per-cell partial counts may shuffle: $keys\n$plan")
    assert(plan.contains("partial_count"),
      s"the count must combine map-side before the exchange:\n$plan")
  }

  test("star join broadcasts the fixed dims and pushes the date filter") {
    val plan = formattedPlan(StarQueries.starJoin(spark, sf))
    assert(plan.contains("BroadcastExchange"),
      s"nation/region must ride a broadcast:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("o_orderdate"),
      s"order-date filter must reach the orders scan:\n$plan")
    // pruned: no unused wide columns read from lineitem
    assert(!plan.contains("l_quantity") && !plan.contains("l_shipdate"))
  }

  test("star join matches the direct five-table join rewrite") {
    import org.apache.spark.sql.functions._
    val got = StarQueries.starJoin(spark, sf).collect()
    // independent formulation: plain chained joins, no explicit
    // broadcast hints, revenue through the same decimal domain
    val li = graft.sources.Tables.lineitem(spark, sf)
    val o = graft.sources.Tables.orders(spark, sf)
    val c = graft.sources.Tables.customer(spark, sf)
    val s = graft.sources.Tables.supplier(spark, sf)
    val n = graft.sources.Tables.nation(spark, sf)
    val r = graft.sources.Tables.region(spark, sf)
    val exp = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" &&
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy("n_name")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(org.apache.spark.sql.types.DecimalType(18, 4))).cast("double")
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
      .collect()
    assert(got.toSeq === exp.toSeq)
  }

  test("salted agg query equals the direct groupBy") {
    import org.apache.spark.sql.functions._
    val got = StarQueries.saltedAggQuery(spark, sf).collect()
    val exp = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .orderBy("event_type").collect()
    assert(got.toSeq === exp.toSeq)
  }

  test("salted join query equals the direct join + groupBy") {
    import org.apache.spark.sql.functions._
    val weights = spark.createDataFrame(Seq(
        ("view", 1.0), ("click", 2.0), ("purchase", 10.0),
        ("signup", 5.0), ("error", 0.0)))
      .toDF("event_type", "weight")
    val got = StarQueries.saltedJoinQuery(spark, sf).collect()
    val exp = graft.sources.Tables.events(spark, sf)
      .join(weights, Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum((col("value") * col("weight"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("weighted_value"))
      .orderBy("event_type").collect()
    assert(got.toSeq === exp.toSeq)
  }

  test("decimal-moment correlation tracks Spark's builtin corr") {
    import org.apache.spark.sql.functions._
    val got = StarQueries.corrByGroup(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val builtin = graft.sources.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === builtin.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) < 1e-9, s"$k: $v vs ${builtin(k)}") }
  }

  test("running total and lag windows are partitioned (no global funnel)") {
    for (df <- Seq(StarQueries.runningTotal(spark, sf),
                   StarQueries.lagDelta(spark, sf))) {
      val plan = planOf(df)
      assert(plan.contains("Window"), s"expected a window:\n$plan")
      // an unpartitioned window plans Exchange SinglePartition before
      // the WindowExec — the funnel this test forbids
      assert(!plan.contains("Exchange SinglePartition"),
        s"window must be partitioned:\n$plan")
    }
  }

  test("event filters push into the events scan for as-of inputs") {
    val plan = formattedPlan(StarQueries.asofNearest(spark, sf))
    assert(plan.contains("PushedFilters") && plan.contains("event_type"))
  }

  test("hier IVF assignment never shuffles the candidate corpus") {
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
    val cands = e.filter(col("vec_id") >= 20)
    val cents = cands.filter(col("vec_id") % 21 === 0)
    val plan = planOf(graft.ext.Similarity.ivfResidualsHier(
      cands, cents, cents.filter(col("vec_id") % 63 === 0),
      "vec_id", "embedding", w = 2))
    val keys = "Exchange hashpartitioning\\(([a-zA-Z_0-9#]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(keys.forall(k => !k.startsWith("neighbor_id") && !k.startsWith("vec_id")),
      s"candidates must be assigned map-side: $keys\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"the two-level structure must ride a broadcast:\n$plan")
  }

  test("abtt projection removal is a pure projection — zero exchanges") {
    val plan = planOf(graft.ext.Pca.abtt(
      graft.sources.Tables.embeddings(spark, sf)
        .select("vec_id", "embedding"), "vec_id", "embedding"))
    assert(!plan.contains("Exchange"),
      s"abtt must not shuffle (the scatter ran eagerly):\n$plan")
  }

  test("suffix max-match shuffles only on bucket/suffix keys") {
    val plan = planOf(ExtQueries.substrSpans(spark, sf))
    val keys = "Exchange hashpartitioning\\(([a-zA-Z_0-9#]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(keys.nonEmpty && keys.forall(k =>
        k.startsWith("bkt") || k.startsWith("s#") || k.startsWith("s ")),
      s"only bucket/suffix keys may shuffle: $keys\n$plan")
  }

  test("JL projection is shuffle-free: matrix broadcast, rows project in place") {
    val plan = planOf(ExtQueries.jlProjectQ(spark, sf))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"jlProject must not shuffle the corpus:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"the ±1 matrix must ride a broadcast:\n$plan")
  }

  test("weighted sample plans TakeOrderedAndProject, no window, no global sort") {
    val plan = planOf(ExtQueries.weightedSampleQ(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Window"), s"no window allowed:\n$plan")
  }

  test("z-order extent audit: stats row broadcast, one agg shuffle on the bucket") {
    val plan = planOf(ExtQueries.zorderClusterQ(spark, sf))
    assert(plan.contains("BroadcastExchange"),
      s"min/max stats must broadcast:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"expected exactly the bucket-agg shuffle, got $exchanges:\n$plan")
  }

  test("overlap join plans an equi-join on the bin key, never a nested loop") {
    val plan = planOf(StarQueries.overlapJoinQuery(spark, sf))
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"the bin key must carry the join:\n$plan")
    // and no distinct over the joined output — exactly-once comes from
    // the first-bin filter, not a dedup shuffle
    assert(!plan.contains("Deduplicate"), plan)
  }

  test("triangle counting: every shuffle is keyed, none global") {
    val plan = planOf(ExtQueries.trianglesQ(spark, sf))
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"wedge/closing joins must be equi-joins:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"no global funnel anywhere in the triangle plan:\n$plan")
  }

  test("transitions and rate-anomaly windows are key-partitioned") {
    for (df <- Seq(StarQueries.transitionsQuery(spark, sf),
                   StarQueries.rateAnomalyQuery(spark, sf))) {
      val plan = planOf(df)
      assert(plan.contains("Window"), s"expected a window:\n$plan")
      assert(!plan.contains("Exchange SinglePartition"),
        s"window must be partitioned:\n$plan")
    }
  }

  test("curriculum global rank plans NO single-partition funnel") {
    val plan = planOf(ExtQueries.curriculumQ(spark, sf))
    // the row-level rank must ride the bucket-partitioned window...
    assert(plan.contains("windowspecdefinition(__bucket"),
      s"rank must be bucket-partitioned:\n$plan")
    // ...and the only SinglePartition exchange allowed is the 1-ROW
    // total-count scalar agg (partial sums of bucket counts — not
    // data); a second one would mean the rank itself funneled
    val singles = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(singles <= 1,
      s"only the scalar total may single-partition ($singles found):\n$plan")
  }

  test("join preflight shuffles only key histograms, never payload columns") {
    val plan = planOf(ExtQueries.joinPreflightQ(spark, sf))
    val keys = "Exchange hashpartitioning\\(([a-zA-Z_0-9#]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(keys.forall(_.startsWith("key")),
      s"only the key-count tables may shuffle: $keys\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
