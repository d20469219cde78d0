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
