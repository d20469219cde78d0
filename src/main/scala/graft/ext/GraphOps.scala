package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph authority scoring — the crawl-prioritization slot of a
  * web-corpus pipeline (Common Crawl publishes harmonic centrality /
  * PageRank per domain for exactly this): given an edge table, rank
  * nodes by stationary link mass so the fetch frontier and the
  * per-domain quality prior can weight by authority. Reference has no
  * counterpart (brief §ext).
  *
  * ## Oracle-exact arithmetic (why the iteration is integer-domain)
  *
  * Float PageRank is a per-node sum of doubles — order-dependent. This
  * iteration stays in a scaled LONG domain (SCALE = 10^12) with every
  * division an explicit floor on non-negative operands, so Spark's
  * `div` and DuckDB's `//` agree:
  *  - init: pr₀ = SCALE div N per node;
  *  - round: contrib(v) = Σ_{u→v} (pr(u) div out(u)) — a LONG sum of
  *    floored shares, exact and order-independent;
  *  - damping: pr'(v) = (15·SCALE div 100) div N
  *    + (85·contrib(v)) div 100.
  * Floored shares mean total mass decays slightly per round instead of
  * being conserved — the DEFINED semantics here (an audit-friendly
  * trade: every engine reproduces the exact longs; the drift is
  * ≤ out-degree ulps per node per round). Dangling mass (out = 0) is
  * dropped, the same choice the simplest published formulation makes.
  * 85·contrib stays under 2^53: contrib ≤ SCALE·N/N = 10^12.
  *
  * ## Scale shape (the 100 TB posture)
  *
  * Each round is the canonical distributed PageRank step: one
  * node-keyed shuffle (pr ⋈ edges on src) + one groupBy(dst) with
  * map-side partial sums — contribution rows shuffle, the edge table
  * itself is read from its persisted partitioning every round. The
  * rank frame is localCheckpoint-ed per round (lineage cut; a cluster
  * run would persist MEMORY_AND_DISK and co-partition edges by src
  * once so every round's join is shuffle-free on the edge side).
  * Convergence is logged as the total |Δpr| per round — same
  * observability policy as [[Dedup.connectedComponents]].
  */
object GraphOps {

  val Scale = 1000000000000L // 10^12

  /** `iters` damped rounds over `edges (src, dst)`. Duplicate edges
    * are collapsed and self-loops dropped before iteration (the
    * multigraph→simple-graph normalization every published domain
    * graph applies). Returns (node, pr) with pr in the SCALE domain —
    * divide by SCALE for the real-valued rank. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int): DataFrame = {
    require(iters >= 1)
    val (e, nodes) = normalized(edges, srcCol, dstCol)
    val n = nodes.count()
    require(n > 0, "pageRank needs at least one non-self-loop edge")
    dampedLoop(e, nodes,
      init = lit(Scale / n),
      baseOf = lit((15L * Scale / 100L) / n),
      iters = iters, tag = "pageRank")
  }

  /** PERSONALIZED PageRank: the teleport returns to a fixed seed set
    * instead of every node — relevance-to-the-seeds rather than
    * global authority (the crawl-frontier scorer when the corpus has
    * a topic whitelist; SALSA/PPR is also the classic related-item
    * ranker on the co-occurrence graph). Same integer domain and loop
    * as [[pageRank]]: init mass = SCALE div |seeds| on seeds (0
    * elsewhere), per-round teleport = (15·SCALE div 100) div |seeds|
    * to seeds only. The seed set rides an `isin` literal (bounded —
    * seed lists are curator-sized; a corpus-sized seed table would
    * broadcast-join instead, same shape). */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
                           dstCol: String, seeds: Seq[Long],
                           iters: Int): DataFrame = {
    require(iters >= 1)
    require(seeds.nonEmpty, "personalizedPageRank needs >= 1 seed")
    val (e, nodes) = normalized(edges, srcCol, dstCol)
    val s = seeds.size.toLong
    val isSeed = col("node").isin(seeds: _*)
    dampedLoop(e, nodes,
      init = when(isSeed, lit(Scale / s)).otherwise(lit(0L)),
      baseOf = when(isSeed, lit((15L * Scale / 100L) / s))
        .otherwise(lit(0L)),
      iters = iters, tag = "personalizedPageRank")
  }

  private def normalized(edges: DataFrame, srcCol: String,
                         dstCol: String): (DataFrame, DataFrame) = {
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    (e, nodes)
  }

  /** The shared damped iteration: `init` and `baseOf` are column
    * expressions over `node`, so the uniform and personalized
    * teleports are the same loop. */
  private def dampedLoop(e: DataFrame, nodes: DataFrame, init: Column,
                         baseOf: Column, iters: Int,
                         tag: String): DataFrame = {
    // fresh attribute ids (localCheckpoint) — outDeg shares e's
    // lineage, and the per-round share ⋈ edges step would otherwise
    // be an ambiguous self-join
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("out"))
      .select(col("src").as("osrc"), col("out"))
      .localCheckpoint()
    var pr = nodes.select(col("node"), init.as("pr"))
      .localCheckpoint()
    var iter = 0
    var movedLast = -1L
    // early exit on |Δ| = 0 only: the integer domain reaches an exact
    // fixed point (measured by round ~6 on the gate graph), and once
    // no rank changed, further rounds are provably identity — the
    // fixed-cap result is unchanged (the KMeans.fit exit rule)
    while (iter < iters && movedLast != 0) {
      iter += 1
      val contrib = pr
        .join(outDeg, col("node") === col("osrc"))
        .select(col("node"), expr("pr div out").as("share"))
        .join(e, col("node") === col("src"))
        .groupBy(col("dst").as("cnode"))
        .agg(sum("share").as("contrib"))
      // the rank frame carries exactly `nodes`' node set every round
      // (left join preserves it), so stepping FROM pr — with the old
      // rank riding the same row — replaces the nodes ⋈ contrib join
      // AND folds the |Δ| log into this round's own frame: the delta
      // agg below is a scan of the materialized checkpoint, not a
      // second node-keyed shuffle per round
      val stepped = pr.select(col("node"), col("pr").as("__old"))
        .join(contrib, col("node") === col("cnode"), "left")
        .select(col("node"), col("__old"),
          (baseOf + expr("85 * coalesce(contrib, 0L) div 100"))
            .as("pr"))
        .localCheckpoint()
      movedLast = stepped
        .agg(sum(abs(col("pr") - col("__old"))).as("d"))
        .head().getLong(0)
      pr = stepped.select("node", "pr")
      System.err.println(
        s"[graft.GraphOps] $tag iteration $iter/$iters: |delta| = $movedLast")
    }
    pr
  }

  /** Per-node triangle counts over an undirected multigraph — the
    * local-clustering / community-density signal a link-graph quality
    * prior weights by (a page whose neighborhood is a near-clique is a
    * link farm; one with zero closure is a hub). Exact, via the
    * degree-ordered orientation (Schank & Wagner 2005; the standard
    * distributed formulation is Suri & Vassilvitskii 2011's MapReduce
    * node-iterator++): orient every simple edge from the (degree, id)-
    * lexicographically SMALLER endpoint to the larger, enumerate
    * wedges at each source, and close them against the oriented edge
    * set. Every triangle is found exactly once (its three oriented
    * edges form a DAG u→v→w, u→w: the wedge at u whose legs are
    * (v, w) closes on v→w; the mirrored wedge (w, v) cannot close).
    *
    * ## Scale shape (the 100 TB posture)
    *
    * Orientation bounds every out-neighborhood by O(√m) — a node of
    * degree d keeps only edges toward HIGHER-degree endpoints, and at
    * most √(2m) nodes have degree ≥ √(2m) — so the wedge join emits
    * O(m^1.5) rows worst-case (vs Σ deg² for the naive node iterator,
    * quadratic on skewed graphs: the whole point at web scale, where
    * hub pages have 10⁷ in-links but almost no closed wedges through
    * them). Plan: one distinct (simple-graph normalization), one
    * degree agg, two key-parallel degree-attach joins, one self-join
    * on the wedge source, one equi-join on the closing (v, w) pair —
    * every shuffle keyed, no broadcast of anything data-sized, and the
    * exactly-once argument above means NO pair-dedup shuffle. Returns
    * (node, tri_cnt) for every node of the simple graph (zeros kept —
    * the zero IS the link-farm signal's other tail). */
  def triangleCounts(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("x"), col(dstCol).cast("long").as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
      .localCheckpoint()
    val deg = e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val da = deg.select(col("node").as("a"), col("deg").as("da"))
    val db = deg.select(col("node").as("b"), col("deg").as("db"))
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val o = e.join(da, "a").join(db, "b")
      .select(when(lowFirst, col("a")).otherwise(col("b")).as("s"),
        when(lowFirst, col("b")).otherwise(col("a")).as("t"))
      .localCheckpoint()
    val wedgeLeft = o.select(col("s").as("u"), col("t").as("v"))
    val wedgeRight = o.select(col("s").as("u"), col("t").as("w"))
    val closing = o.select(col("s").as("v"), col("t").as("w"))
    val tri = wedgeLeft.join(wedgeRight, Seq("u"))
      .where(col("v") =!= col("w"))
      .join(closing, Seq("v", "w"))
    val cnt = tri.select(col("u").as("node"))
      .unionByName(tri.select(col("v").as("node")))
      .unionByName(tri.select(col("w").as("node")))
      .groupBy("node").agg(count(lit(1)).as("tri_cnt"))
    deg.select("node").join(cnt, Seq("node"), "left")
      .select(col("node"), coalesce(col("tri_cnt"), lit(0L)).as("tri_cnt"))
  }

  /** Bounded k-core peel: repeatedly drop every node of degree < k
    * (and its edges) until nothing drops or `maxRounds` is hit —
    * the densest-subgraph signal (a page surviving the k-core sits in
    * a mutually-linked community; link spam and tendrils peel away).
    * The k-core is UNIQUE, so the fixpoint is engine-independent; the
    * round cap makes the cost bound explicit instead of hiding a
    * diameter-length cascade (a path graph peels from the ends inward,
    * one layer per round — the chain regime [[Dedup.connectedComponents]]
    * documents; peeling is inherently sequential, there is no
    * pointer-halving analog, so production posture is the cap plus the
    * per-round drop log; after a fixpoint every further round is an
    * identity, so early exit ≡ the fixed unroll the oracle replays).
    *
    * Per round: one degree agg (map-side combinable) + two left-semi
    * joins of the edge set against the surviving-node set — every
    * shuffle keyed on a node id, the edge payload never widens, and
    * the frame is localCheckpoint-ed so lineage stays round-deep, the
    * same loop discipline as [[pageRank]]. The per-round driver-side
    * scalar is one bounded count (the survivor tally — the logged
    * convergence signal). Returns (node, core_deg): degrees within
    * the final edge set. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int, maxRounds: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    var e = edges
      .select(col(srcCol).cast("long").as("x"), col(dstCol).cast("long").as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
      .localCheckpoint()
    var nodesBefore = -1L
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      round += 1
      val deg = e.select(col("a").as("node"))
        .unionByName(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val alive = deg.filter(col("deg") >= k).select("node")
        .localCheckpoint()
      val survivors = alive.count()
      converged = survivors == nodesBefore
      nodesBefore = survivors
      if (!converged) {
        e = e.join(alive.select(col("node").as("a")), Seq("a"), "left_semi")
          .join(alive.select(col("node").as("b")), Seq("b"), "left_semi")
          .localCheckpoint()
      }
      System.err.println(
        s"[graft.GraphOps] kCore round $round/$maxRounds: $survivors nodes >= deg $k")
    }
    e.select(col("a").as("node")).unionByName(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("core_deg"))
  }

  /** Bipartite CO-OCCURRENCE projection with a per-user cap — the
    * collaborative signal (items sharing users, documents sharing
    * links/citations) whose naive form is the classic quadratic
    * blowup: one power user touching 10⁶ items would alone emit
    * 5·10¹¹ pairs. The cap bounds every user's contribution at
    * C(maxPerUser, 2) pairs — the same audited-cap contract as the
    * LSH bucket cap — keeping the projection linear in users. Kept
    * items under the cap are the LOWEST item ids (deterministic, and
    * trivially replayable in SQL; a deployment ranks by recency or
    * weight instead — same shape, different ORDER BY). Pairs generate
    * IN-ROW (sorted per-user array ≤ maxPerUser long, HOF pair
    * expansion) so there is no self-join: one distinct, one user-key
    * window, one user-key agg, one pair-key count agg. Use
    * [[bipartiteCapAudit]] to price what the cap dropped. */
  def bipartiteCoOccurrence(edges: DataFrame, userCol: String,
                            itemCol: String, maxPerUser: Int): DataFrame =
    pairCounts(capped(edges, userCol, itemCol, maxPerUser))

  /** The capped (u, i) table itself — exposed so the streaming
    * ingest face joins against EXACTLY the batch operator's cap
    * definition (one place to change the kept-items rule). */
  private[graft] def capped(edges: DataFrame, userCol: String,
                            itemCol: String,
                            maxPerUser: Int): DataFrame = {
    require(maxPerUser >= 2, s"maxPerUser must be >= 2, got $maxPerUser")
    import org.apache.spark.sql.expressions.Window
    val ui = edges.select(col(userCol).cast("long").as("u"),
        col(itemCol).cast("long").as("i")).distinct()
    val w = Window.partitionBy("u").orderBy("i")
    ui.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxPerUser)
      .select("u", "i")
  }

  private def pairCounts(cappedUi: DataFrame): DataFrame =
    cappedUi.groupBy("u")
      .agg(sort_array(collect_list(col("i"))).as("items"))
      .select(explode(expr(
        """flatten(transform(items, (x, ix) ->
          |  transform(slice(items, ix + 2, size(items)), y ->
          |    struct(x AS item_a, y AS item_b))))""".stripMargin)).as("pr"))
      .select(col("pr.item_a"), col("pr.item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_users"))

  /** LIFT scoring over the capped co-occurrence world: for each pair,
    * observed co-users vs the independence expectation —
    * lift = n_ab·N / (n_a·n_b), every count from the SAME capped
    * table so margins and pairs describe one consistent corpus. The
    * double evaluates in one fixed left-to-right chain
    * (CAST(n_ab) · N / n_a / n_b — the q_pmi_colloc bit-equality
    * policy; an integer-ppm form would overflow 2^63 at corpus
    * scale). Margins are an item-keyed agg; N rides a broadcast
    * 1-row agg — no collect. */
  def bipartiteLift(edges: DataFrame, userCol: String, itemCol: String,
                    maxPerUser: Int): DataFrame = {
    val c = capped(edges, userCol, itemCol, maxPerUser).localCheckpoint()
    val total = c.agg(countDistinct("u").as("n_total"))
    val mA = c.groupBy(col("i").as("item_a"))
      .agg(count(lit(1)).as("cnt_a"))
    val mB = c.groupBy(col("i").as("item_b"))
      .agg(count(lit(1)).as("cnt_b"))
    pairCounts(c)
      .join(mA, "item_a").join(mB, "item_b")
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("n_users"),
        col("cnt_a"), col("cnt_b"),
        (col("n_users").cast("double") * col("n_total")
          / col("cnt_a") / col("cnt_b")).as("lift"))
  }

  /** The pricing/audit face of [[bipartiteCoOccurrence]]'s cap: user
    * and capped-user counts, items dropped, and the pair mass with
    * and without the cap (Σ C(n,2) vs Σ C(min(n,cap),2)) — the same
    * decide-from-data posture as the exact-family pair preflight,
    * one map-side-combinable agg. */
  def bipartiteCapAudit(edges: DataFrame, userCol: String,
                        itemCol: String, maxPerUser: Int): DataFrame = {
    val ui = edges.select(col(userCol).cast("long").as("u"),
        col(itemCol).cast("long").as("i")).distinct()
    ui.groupBy("u").agg(count(lit(1)).as("n_items"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("n_items") > maxPerUser, 1L).otherwise(0L))
          .as("n_capped_users"),
        sum(greatest(col("n_items") - maxPerUser, lit(0L)))
          .as("items_dropped"),
        sum(expr("n_items * (n_items - 1) DIV 2")).as("pairs_uncapped"),
        sum(expr(s"least(n_items, $maxPerUser) * " +
          s"(least(n_items, $maxPerUser) - 1) DIV 2")).as("pairs_capped"))
  }
}
