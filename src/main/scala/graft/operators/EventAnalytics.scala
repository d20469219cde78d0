package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classic event-stream analytics at fact-table scale: ordered funnel
  * conversion and cohort retention. Both are pure relational
  * compositions (filter → keyed agg → keyed join), so Catalyst keeps
  * scans column-pruned and type-filter-pushed, and every shuffle
  * rides the user key — the natural co-partitioning for an event
  * fact table (bucket it by user and the whole analysis is
  * shuffle-free).
  */
object EventAnalytics {

  private def us(c: Column): Column = unix_micros(c)

  /** Ordered funnel: how many users complete step1 → step2 → … in
    * ORDER, each later step strictly after the previous one and the
    * whole path within `maxSpanSeconds` of the user's FIRST step-1
    * event (the standard first-touch anchoring — deterministic, and
    * one scan per step instead of a per-user sequence alignment).
    *
    * Output: one row per step (step_idx, step, n_users) — the funnel
    * table a conversion dashboard plots. Each stage is a pushed-down
    * type filter + a map-side-combinable min-agg + a user-key join
    * against the (shrinking) survivor set; nothing ever shuffles the
    * full fact table payload. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String],
             maxSpanSeconds: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got $steps")
    require(maxSpanSeconds > 0, s"maxSpanSeconds must be > 0")
    val spanUs = maxSpanSeconds * 1000000L
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(us(col(tsCol))).as("t1"))
    val survivors = steps.tail.zipWithIndex.scanLeft(first) {
      case (prev, (step, i)) =>
        val k = i + 2 // this step's 1-based index
        events.filter(col(typeCol) === step)
          .select(col(userCol), us(col(tsCol)).as("__ts"))
          .join(prev, userCol)
          .filter(col("__ts") > col(s"t${k - 1}") &&
            col("__ts") <= col("t1") + spanUs)
          .groupBy((col(userCol) +: (1 until k).map(j => col(s"t$j"))): _*)
          .agg(min(col("__ts")).as(s"t$k"))
    }
    survivors.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).cast("long").as("n_users"))
        .select(lit(i + 1).cast("long").as("step_idx"),
          lit(steps(i)).as("step"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Event-rate SPIKE detection: hourly counts per event type, each
    * compared against its own trailing baseline — flagged when the
    * bucket more than doubles the trailing mean. The comparison is
    * the integer cross-multiplication `n·trail_n > 2·trail_sum`
    * (exact in any engine — no float mean), and the baseline is the
    * previous `trailing` OBSERVED buckets (row frame; empty hours
    * don't exist as rows at 100 TB and synthesizing them would mean
    * densifying the timeline). Buckets without a full trailing
    * window never flag. One map-side-combinable count agg + one
    * type-partitioned window over the (tiny) bucket table — the
    * fact table itself is touched once. */
  def rateAnomaly(events: DataFrame, typeCol: String, tsCol: String,
                  trailing: Int = 6): DataFrame = {
    val counts = events
      .select(col(typeCol).as("event_type"), us(col(tsCol)).as("__us"))
      // integer DIV, not Column./ (double division truncates wrong at
      // exact-multiple boundaries)
      .select(col("event_type"),
        expr("__us DIV 3600000000").as("hour_bucket"))
      .groupBy("event_type", "hour_bucket")
      .agg(count(lit(1)).as("n_events"))
    rateAnomalyOnCounts(counts, trailing)
  }

  /** The flag pass alone, over an already-aggregated
    * (event_type, hour_bucket, n_events) table — bucket-sized input,
    * so the streaming face can maintain the counts incrementally and
    * run this comparison over the bounded aggregate each trigger. */
  def rateAnomalyOnCounts(counts: DataFrame,
                          trailing: Int = 6): DataFrame = {
    require(trailing >= 1, s"trailing must be >= 1, got $trailing")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("hour_bucket")
      .rowsBetween(-trailing, -1)
    counts
      .withColumn("trail_n", count(lit(1)).over(w))
      .withColumn("trail_events",
        coalesce(sum("n_events").over(w), lit(0L)))
      .withColumn("is_spike",
        when(col("trail_n") === trailing &&
          col("n_events") * col("trail_n") > col("trail_events") * 2,
          lit(1L)).otherwise(lit(0L)))
  }

  /** MULTI-touch attribution: every purchase splits its credit across
    * ALL of the user's clicks inside the lookback window
    * [ts − windowSeconds, ts], in exact integer BASIS POINTS so any
    * engine reproduces the split: each click gets 10000 div n, and
    * the integer remainder (10000 − n·(10000 div n)) goes to the
    * LAST click before the purchase — the near-touch bias every
    * published position-based scheme gives the closing click, here
    * doubling as the exactness fix (credits always sum to exactly
    * 10000 per purchase; event_id tiebreaks tied click timestamps).
    * Purchases with no click in the window don't appear — the
    * unattributed population is [[rateAnomaly]]'s sibling query
    * (last-touch attribution's NULL bucket). Plan: one user-key
    * equi-join with the window predicate as a post-join filter
    * (key-parallel; pairs bounded by clicks-per-user-per-window) +
    * two purchase-keyed window functions. */
  def multiTouchAttribution(events: DataFrame, userCol: String,
                            typeCol: String, tsCol: String, idCol: String,
                            purchaseType: String, clickType: String,
                            windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be > 0")
    import org.apache.spark.sql.expressions.Window
    val wUs = windowSeconds * 1000000L
    val p = events.filter(col(typeCol) === purchaseType)
      .select(col(userCol).as("user_id"), col(idCol).as("purchase_id"),
        us(col(tsCol)).as("p_us"))
    val c = events.filter(col(typeCol) === clickType)
      .select(col(userCol).as("user_id"), col(idCol).as("click_id"),
        us(col(tsCol)).as("c_us"))
    val pairs = p.join(c, Seq("user_id"))
      .filter(col("c_us") >= col("p_us") - wUs && col("c_us") <= col("p_us"))
    creditSplit(pairs)
  }

  /** The shared credit arithmetic of the multi-touch family: given
    * (purchase_id, click_id, user_id, p_us, c_us) pair rows, the
    * integer basis-point split with the remainder on the closing
    * click. Two purchase-keyed windows; partitions are bounded by
    * touches-per-purchase. */
  private def creditSplit(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPurchase = Window.partitionBy("purchase_id")
    val lastFirst = Window.partitionBy("purchase_id")
      .orderBy(col("c_us").desc, col("click_id").desc)
    pairs
      .withColumn("n_touches", count(lit(1)).over(byPurchase))
      .withColumn("__rk", row_number().over(lastFirst))
      .withColumn("credit_bp",
        expr("10000 DIV n_touches") +
          when(col("__rk") === 1,
            lit(10000L) - col("n_touches") * expr("10000 DIV n_touches"))
            .otherwise(lit(0L)))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        (col("p_us") - col("c_us")).as("gap_us"),
        col("n_touches"), col("credit_bp"))
  }

  /** [[multiTouchAttribution]] with the user-key join's skew bounded —
    * the production form. The uncapped join pairs every purchase with
    * every click OF THE SAME USER before the window filter prunes:
    * one bot user with 10⁶ clicks and 10³ purchases emits 10⁹ pair
    * rows the filter then throws away — the canonical power-law
    * blowup every other pair generator in this engine caps
    * (LSH bucket cap, bipartite per-user cap, winnow df cap).
    *
    * Two bounds, one semantic change:
    *  - TIME bounds the join: clicks key by their lookback-width
    *    bucket (`c_us div windowSeconds`), each purchase explodes to
    *    the exactly-two buckets its window spans, and the join runs on
    *    (user, bucket) — a pair whose click is outside the purchase's
    *    window can no longer even MEET, so pre-filter pairs per
    *    purchase ≤ that user's clicks in two buckets, not all history;
    *  - the CAP bounds the bucket: at most `maxClicksPerWindow` clicks
    *    survive per (user, bucket) — the LATEST by (c_us, click_id),
    *    the same order the credit split favors — so pairs per purchase
    *    ≤ 2·cap regardless of bot volume. The cap's top-k is computed
    *    in two stages (salted per-(user, bucket, salt) row_number,
    *    then row_number over the ≤ 64·cap survivors) so one hot
    *    bucket never serializes into a single-task sort of the bot's
    *    whole click history.
    *
    * Below the cap the answer is BIT-IDENTICAL to
    * [[multiTouchAttribution]] (every click kept ⇒ same pairs ⇒ same
    * split — the degeneration the spec pins). Above it, dropped
    * clicks shift their credit onto the kept (latest) ones; the drop
    * volume is [[multiTouchCapAudit]]'s one-row report — the
    * decide-from-data audit to run BEFORE choosing the cap. */
  def multiTouchAttributionCapped(events: DataFrame, userCol: String,
                                  typeCol: String, tsCol: String,
                                  idCol: String, purchaseType: String,
                                  clickType: String, windowSeconds: Long,
                                  maxClicksPerWindow: Int): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be > 0")
    require(maxClicksPerWindow > 0, s"maxClicksPerWindow must be > 0")
    import org.apache.spark.sql.expressions.Window
    val wUs = windowSeconds * 1000000L
    val p = events.filter(col(typeCol) === purchaseType)
      .select(col(userCol).as("user_id"), col(idCol).as("purchase_id"),
        us(col(tsCol)).as("p_us"))
    val c = events.filter(col(typeCol) === clickType)
      .select(col(userCol).as("user_id"), col(idCol).as("click_id"),
        us(col(tsCol)).as("c_us"))
      .withColumn("__b", expr(s"c_us DIV $wUs"))
    val latestFirst = Seq(col("c_us").desc, col("click_id").desc)
    val preprune = Window
      .partitionBy(col("user_id"), col("__b"),
        pmod(xxhash64(col("click_id")), lit(64L)))
      .orderBy(latestFirst: _*)
    val perBucket = Window.partitionBy("user_id", "__b")
      .orderBy(latestFirst: _*)
    val kept = c
      .withColumn("__r1", row_number().over(preprune))
      .filter(col("__r1") <= maxClicksPerWindow)
      .withColumn("__ck", row_number().over(perBucket))
      .filter(col("__ck") <= maxClicksPerWindow)
      .drop("__r1", "__ck")
    // [p_us − wUs, p_us] spans exactly the buckets b(p_us) − 1 and
    // b(p_us): every in-window click's bucket is one of the two, and
    // each (purchase, click) pair meets at the click's OWN bucket
    // only — exactly once, no distinct needed
    val px = p.select(col("user_id"), col("purchase_id"), col("p_us"),
      explode(array(expr(s"p_us DIV $wUs"), expr(s"p_us DIV $wUs - 1")))
        .as("__b"))
    val pairs = px.join(kept, Seq("user_id", "__b"))
      .filter(col("c_us") >= col("p_us") - wUs && col("c_us") <= col("p_us"))
      .drop("__b")
    creditSplit(pairs)
  }

  /** The pricing/audit face of [[multiTouchAttributionCapped]]'s cap —
    * the bipartiteCapAudit pattern on the attribution join. One row:
    * the per-user join mass the UNCAPPED operator would generate
    * (Σ purchases(u) · clicks(u) — its pre-filter pair count), the
    * capped form's (user, bucket)-keyed mass
    * (Σ purchases(u, b±) · min(clicks(u, b), cap)), and the cap's
    * bite (windows over cap, clicks dropped). All map-side-combinable
    * aggs over key-count tables; no pair is ever materialized. */
  def multiTouchCapAudit(events: DataFrame, userCol: String,
                         typeCol: String, tsCol: String,
                         purchaseType: String, clickType: String,
                         windowSeconds: Long,
                         maxClicksPerWindow: Int): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be > 0")
    require(maxClicksPerWindow > 0, s"maxClicksPerWindow must be > 0")
    val wUs = windowSeconds * 1000000L
    val cap = maxClicksPerWindow.toLong
    val p = events.filter(col(typeCol) === purchaseType)
      .select(col(userCol).as("user_id"), us(col(tsCol)).as("p_us"))
    val c = events.filter(col(typeCol) === clickType)
      .select(col(userCol).as("user_id"), us(col(tsCol)).as("c_us"))
      .select(col("user_id"), expr(s"c_us DIV $wUs").as("__b"))
    val pU = p.groupBy("user_id").agg(count(lit(1)).as("n_p"))
    val cB = c.groupBy("user_id", "__b").agg(count(lit(1)).as("n_cb"))
    val cU = cB.groupBy("user_id").agg(sum(col("n_cb")).as("n_c"))
    val uncapped = pU.join(cU, Seq("user_id"))
      .agg(coalesce(sum(col("n_p") * col("n_c")), lit(0L))
        .as("pairs_uncapped"))
    val pB = p.select(col("user_id"),
        explode(array(expr(s"p_us DIV $wUs"), expr(s"p_us DIV $wUs - 1")))
          .as("__b"))
      .groupBy("user_id", "__b").agg(count(lit(1)).as("n_pb"))
    val bite = cB.agg(
      count(lit(1)).as("n_user_windows"),
      coalesce(sum(when(col("n_cb") > cap, 1L).otherwise(0L)), lit(0L))
        .as("n_capped_windows"),
      coalesce(sum(greatest(col("n_cb") - cap, lit(0L))), lit(0L))
        .as("clicks_dropped"))
    val cappedMass = pB.join(cB, Seq("user_id", "__b"))
      .agg(coalesce(sum(col("n_pb") * least(col("n_cb"), lit(cap))), lit(0L))
        .as("pairs_capped"))
    bite.crossJoin(broadcast(uncapped)).crossJoin(broadcast(cappedMass))
  }

  /** First-order Markov transition counts: for each user's event
    * stream ordered by (`tsCol`, `tieCol`) — the tiebreak column makes
    * the order TOTAL when timestamps collide, so the counts are
    * deterministic — count every consecutive (from_type → to_type)
    * step. The behavioral transition matrix (next-action prediction,
    * bot detection by improbable paths). One user-key window (lead)
    * over a three-column projection of the fact table + one tiny
    * groupBy on the |types|² pair space — map-side combinable, so the
    * shuffle after the window carries ~|types|² rows per partition. */
  def transitions(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(typeCol).as("from_type"),
        col(tsCol), col(tieCol))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** [[transitions]] without the per-user total sort — the skew-safe
    * form for power-law event streams (the round-9 verdict's
    * stretch item: a bot user with 10⁸ events serializes
    * `transitions`' one-window-partition-per-user sort into a single
    * task). Same bucket decomposition as the corpus rank/cumsum
    * family (Sampling.shardPlan): events window inside (user,
    * `bucketUs`-wide time bucket) — every bucket of the hot user
    * sorts in PARALLEL — and the cross-bucket steps come from a
    * second, bounded window over the per-(user, bucket) boundary
    * summary: last event of a bucket pairs with the first event of
    * the user's next NON-EMPTY bucket (lead over buckets skips empty
    * ones by construction — only observed buckets have rows). That
    * summary has one row per non-empty (user, bucket) — bounded by
    * time-range/bucketUs per user, not by event count — so the hot
    * user's serial work drops from O(events·log events) to
    * O(buckets·log buckets). Exactly equal to [[transitions]] for
    * any `bucketUs` (intra-bucket pairs + boundary pairs ARE the
    * consecutive pairs of the total order; spec-pinned, including
    * on a planted bot user), because (tsCol, tieCol) is a total
    * order per user: the boundary struct-min/max picks the same
    * first/last events the global sort would.
    *
    * CALL-SITE CONTRACT — (tsCol, tieCol) must be STRICTLY unique per
    * user. Under duplicate keys [[transitions]] itself is already
    * nondeterministic (the window sort breaks the tie arbitrarily),
    * and this decomposition can break it DIFFERENTLY at bucket
    * boundaries (the struct min/max adds the type as a third
    * comparator), silently diverging from the one-window form. Use an
    * event id as `tieCol` (every gate caller does) and the contract
    * holds by construction; pass `assertTotalOrder = true` in tests /
    * one-off audits to make violations loud — it adds one
    * count-vs-distinct action over the three key columns, so leave it
    * off in production plans. */
  def transitionsBucketed(events: DataFrame, userCol: String,
                          typeCol: String, tsCol: String, tieCol: String,
                          bucketUs: Long = 86400000000L,
                          assertTotalOrder: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketUs >= 1, s"bucketUs must be >= 1, got $bucketUs")
    val e = events.select(col(userCol).as("__u"),
      col(typeCol).as("__t"), us(col(tsCol)).as("__ts"),
      col(tieCol).as("__tie"))
      .withColumn("__b", expr(s"__ts div $bucketUs"))
    if (assertTotalOrder) {
      val nDup = e.groupBy("__u", "__ts", "__tie")
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).count()
      require(nDup == 0,
        s"transitionsBucketed: (tsCol, tieCol) is not a total order " +
          s"per user — $nDup duplicated (user, ts, tie) key groups; " +
          "equality with transitions() needs a strict total order " +
          "(use a unique event id as tieCol)")
    }
    val wb = Window.partitionBy("__u", "__b")
      .orderBy(col("__ts"), col("__tie"))
    val intra = e.withColumn("__next", lead(col("__t"), 1).over(wb))
      .filter(col("__next").isNotNull)
      .select(col("__t").as("from_type"), col("__next").as("to_type"))
    val summary = e.groupBy("__u", "__b")
      .agg(min(struct(col("__ts"), col("__tie"), col("__t"))).as("__first"),
        max(struct(col("__ts"), col("__tie"), col("__t"))).as("__last"))
    val wu = Window.partitionBy("__u").orderBy("__b")
    val inter = summary
      .withColumn("__nf", lead(col("__first"), 1).over(wu))
      .filter(col("__nf").isNotNull)
      .select(col("__last").getField("__t").as("from_type"),
        col("__nf").getField("__t").as("to_type"))
    intra.unionByName(inter)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Cohort retention: users grouped by the EPOCH WEEK of their first
    * event (integer `epoch_us div week` — calendar-free, so both
    * engines agree without timezone/week-start semantics), then for
    * each (cohort_week, week_offset) the count of distinct cohort
    * users active that week. The classic retention triangle.
    *
    * Two user-keyed aggs + one user-key join + a bounded
    * (cohort × offset) distinct-agg — at 100 TB the first-event
    * table is the only per-user state and it's exactly one row per
    * user. */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val first = events.groupBy(col(userCol))
      .agg(min(us(col(tsCol))).as("__first"))
    events.select(col(userCol), us(col(tsCol)).as("__ts"))
      .join(first, userCol)
      .select(col(userCol),
        expr(s"__first DIV $weekUs").as("cohort_week"),
        expr(s"__ts DIV $weekUs - __first DIV $weekUs").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col(userCol)).as("n_users"))
  }
}
