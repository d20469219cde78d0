package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming surface over the `events` schema (SURVEY.md
  * §2.11). Every transform works identically on a batch or streaming
  * DataFrame — Catalyst drops the watermark node in batch plans, which
  * is exactly what makes the batch-equivalence tests in StreamingSpec
  * meaningful: the STREAMING result must equal the same operator run
  * as a batch query.
  *
  * State posture at scale: all aggregations key on (window,
  * event_type) or (user, session) — state is partitioned by group key
  * across executors, and the watermark bounds state retention, so
  * state size tracks active windows, not history.
  */
object StreamingOps {

  private val dec = DecimalType(18, 2)

  /** Tumbling event-time window counts + decimal-domain sums — the
    * streaming form of StarQueries.tumblingWindow. */
  def tumblingCounts(df: DataFrame, watermark: String = "10 minutes",
                     win: String = "1 hour"): DataFrame =
    df.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast("double").as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding window (1 h span, 30 min slide by default): each event
    * lands in span/slide windows. */
  def slidingCounts(df: DataFrame, watermark: String = "10 minutes",
                    win: String = "1 hour", slide: String = "30 minutes"): DataFrame =
    df.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

  /** Per-user session windows closed by a gap of inactivity. */
  def sessionCounts(df: DataFrame, watermark: String = "10 minutes",
                    gap: String = "10 minutes"): DataFrame =
    df.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast("double").as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n"), col("sum_value"))

  /** Streaming dedup bounded by the watermark: duplicate event_ids
    * arriving within the watermark horizon collapse to one row; state
    * for an id is dropped once the watermark passes it. */
  def dedupWithinWatermark(df: DataFrame, watermark: String = "10 minutes"): DataFrame =
    df.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
}
