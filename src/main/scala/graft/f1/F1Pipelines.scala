package graft.f1

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.F1Functions._
import graft.operators.{AsOfJoin, Ranking}

/** The reference's three entry-point pipelines (SURVEY.md §3),
  * re-expressed as lazy DataFrame transforms.
  *
  * Where the reference loops per driver over HTTP (N+1 serial), every
  * pipeline here is ONE declarative plan over the whole session(s):
  * Spark parallelizes by partition, dims are broadcast, and the same
  * code runs unchanged over one session or a decade of telemetry.
  */
object F1Pipelines {

  /** E1 core — enrich laps: P1 actual_lap_time, J1 driver acronym /
    * color broadcast equi-join, J3 backward as-of against stints +
    * F7 null-out + P13 tire age.
    * Ref: /root/reference/src/session_object.py:135-154,56-80. */
  def enrichLaps(laps: DataFrame, stints: DataFrame, drivers: DataFrame): DataFrame = {
    val withTime = laps.withColumn("actual_lap_time",
      actualLapTime(col("duration_sector_1"), col("duration_sector_2"),
        col("duration_sector_3")))

    // J1 — the reference zips unique() lists positionally; the honest
    // relational form is a broadcast equi-join on driver_number.
    val dim = drivers
      .select("session_key", "driver_number", "name_acronym", "driver_color")
      .dropDuplicates("session_key", "driver_number")
    val withDriver = withTime.join(broadcast(dim),
      Seq("session_key", "driver_number"), "left")

    // J3 — as-of backward on laps.lap_number vs stints.lap_start
    // (pandas left_on/right_on, /root/reference/src/session_object.py:62-63),
    // then F7: null-out matches past lap_end (stint intervals are
    // non-overlapping so this equals the J2 interval join; pinned by
    // F1PipelinesSpec).
    // "compound" is renamed before the join: withColumn("Compound", ...)
    // would case-insensitively REPLACE a joined "compound" column in
    // place instead of adding the reference's capitalized column.
    val stintCols = stints.select(col("session_key"), col("driver_number"),
      col("lap_start"), col("lap_end"), col("compound").as("__compound"),
      col("tyre_age_at_start"), col("stint_number"))
    val asof = AsOfJoin.backwardOn(withDriver, stintCols,
      leftOn = "lap_number", rightOn = "lap_start",
      by = Seq("session_key", "driver_number"))
    val inStint = col("lap_number") <= col("lap_end")
    asof
      .withColumn("Compound", when(inStint, col("__compound")))
      .withColumn("Tire Age", when(inStint,
        tireAge(col("lap_number"), col("lap_start"), col("lap_end"),
          col("tyre_age_at_start"))))
      .withColumn("Stint Number", when(inStint, col("stint_number")))
      .drop("lap_start", "lap_end", "__compound", "tyre_age_at_start", "stint_number")
  }

  /** E1 — A1 fastest lap per driver (whole-row argmin on
    * actual_lap_time, first-on-tie via date_start), O1 sorted.
    * Ref: /root/reference/src/session_object.py:156-174. */
  def fastestLapPerDriver(enriched: DataFrame): DataFrame =
    Ranking.argminRow(enriched,
        groupCols = Seq("session_key", "driver_number"),
        orderCols = Seq("actual_lap_time", "date_start"))
      .orderBy(col("actual_lap_time").asc_nulls_last, col("date_start").asc)

  /** E2 — qualifying classification + grid order. One plan: F1
    * pit-out filter → P7 phase label → per-phase best lap (W1) →
    * Q3 top-10 ++ Q2 bottom-5 ++ Q1 bottom-5 (W2/W3/U2).
    * `sessionStart` comes from the sessions dim (J5 scalar).
    * Ref: /root/reference/src/data_processing.py:269-291. */
  def qualifyingGrid(enriched: DataFrame, sessionStart: Column): DataFrame = {
    val phased = enriched
      .filter(notPitOut(col("is_pit_out_lap")))
      .withColumn("phase", qualifyingPhase(col("date_start"), sessionStart))

    // Per-(phase, driver) best lap = W1 keep-first under O1 ordering.
    val best = Ranking.keepFirst(phased,
      partition = Seq("phase", "driver_number"),
      order = Seq(col("actual_lap_time").asc_nulls_last, col("date_start").asc))

    // Rank within phase: ascending best time. Q3 contributes P1-10,
    // Q2's 5 slowest P11-15, Q1's 5 slowest P16-20 (W2 bottom-5 =
    // rank-from-bottom <= 5).
    val wAsc = Window.partitionBy("phase")
      .orderBy(col("actual_lap_time").asc_nulls_last, col("date_start").asc)
    val wDesc = Window.partitionBy("phase")
      .orderBy(col("actual_lap_time").desc_nulls_first, col("date_start").desc)
    val ranked = best
      .withColumn("rank_in_phase", row_number().over(wAsc))
      .withColumn("rank_from_bottom", row_number().over(wDesc))

    // The reference takes tail(5) of each ASCENDING-sorted phase and
    // appends those rows in ascending order — so P11 is the FASTEST of
    // the five eliminated Q2 drivers and P15 the slowest (same for Q1
    // at P16-20): grid = 16 - rank_from_bottom / 21 - rank_from_bottom.
    val q3 = ranked.filter(col("phase") === "Q3")
      .withColumn("grid_position", col("rank_in_phase"))
    val q2Out = ranked.filter(col("phase") === "Q2" && col("rank_from_bottom") <= 5)
      .withColumn("grid_position", lit(16) - col("rank_from_bottom"))
    val q1Out = ranked.filter(col("phase") === "Q1" && col("rank_from_bottom") <= 5)
      .withColumn("grid_position", lit(21) - col("rank_from_bottom"))

    q3.unionByName(q2Out).unionByName(q1Out)
      .drop("rank_in_phase", "rank_from_bottom")
      .orderBy("grid_position")
  }

  /** P14 — the v1 reference's POSITIONAL tire age: the i-th lap
    * matched to a stint (by lap_number order) gets tyre_age_at_start
    * + i, regardless of gaps in the lap numbers. Diverges from the
    * canonical P13 lap-arithmetic exactly when laps are missing inside
    * a stint (P13 ages jump with the gap; P14 ages stay consecutive) —
    * the divergence the survey pins by test (F1PipelinesSpec).
    * Ref: /root/reference/src/data_processing.py:164-181. */
  def tireAgePositional(laps: DataFrame, stints: DataFrame): DataFrame = {
    val joined = AsOfJoin.intervalJoin(laps, stints,
      by = Seq("session_key", "driver_number"),
      valueCol = "lap_number", loCol = "lap_start", hiCol = "lap_end")
    val w = Window
      .partitionBy("session_key", "driver_number", "stint_number")
      .orderBy("lap_number")
    joined.withColumn("tire_age_positional",
      when(col("stint_number").isNotNull,
        row_number().over(w) - 1 + col("tyre_age_at_start")))
  }

  /** P8 — red-flag guard: a qualifying session longer than 70 minutes
    * means a red flag broke the Q1/Q2/Q3 timing model.
    * Ref: /root/reference/src/data_processing.py:218-220. */
  def assertNoRedFlag(sessionStart: java.sql.Timestamp, sessionEnd: java.sql.Timestamp): Unit = {
    val minutes = (sessionEnd.getTime - sessionStart.getTime) / 60000.0
    require(minutes <= 70,
      s"Session lasted $minutes min (>70): red-flag interruption, qualifying phases not derivable")
  }

  /** E3 — telemetry for one lap (F5 inclusive time mask pushed into
    * the scan, P4 seconds-from-lap-start), then J4 nearest as-of with
    * track location. Ref: /root/reference/src/session_object.py:193-250. */
  def lapTelemetry(carData: DataFrame, lapStart: Column, lapEnd: Column): DataFrame =
    carData
      .filter(inTimeRange(col("date"), lapStart, lapEnd))
      .withColumn("seconds_from_lap_start", secondsBetween(col("date"), lapStart))

  def telemetryWithTrackPosition(telemetry: DataFrame, location: DataFrame): DataFrame =
    AsOfJoin.nearest(telemetry,
      location.select("session_key", "driver_number", "date", "x", "y", "z"),
      on = "date", by = Seq("session_key", "driver_number"))

  /** classes.py surface — A2 per-(driver, compound) average lap time,
    * F3/F4 filters, R1 pivot to the drivers × compounds matrix, O5
    * sort by best MEDIUM time (NaN-last, driver tie-break).
    * Ref: /root/reference/classes.py:71-95. */
  def avgLapByCompound(enriched: DataFrame): DataFrame =
    enriched
      .filter(col("actual_lap_time").isNotNull)
      .filter(!col("Compound").isin("TEST_UNKNOWN", "UNKNOWN"))
      .groupBy("driver_number", "name_acronym", "Compound")
      // exact decimal-domain mean: raw double sums are order-dependent
      // and would flake the oracle hash under re-partitioning
      .agg((sum(col("actual_lap_time").cast(DecimalType(18, 4))).cast("double")
        / count(lit(1))).as("avg_lap_time"))

  /** Chart-data assembly for the reference's fastest-lap comparison
    * chart (compare_fastest_lap_characteristics): one row per plotted
    * bar, carrying everything the renderer needs — bar order, the bar
    * height (actual_lap_time) with its M:SS.mmm label, the capitalized
    * compound annotation, the compound bar color (map-miss → NULL,
    * like pandas), and the driver tick color ("Unknown"/NULL →
    * "#000000", the reference's fallback). Rows with NULL lap time are
    * dropped (the notna() mask). `orderCols` is the branch the
    * reference takes on session type: grid_position for qualifying,
    * (actual_lap_time, date_start) for races — see
    * F1Session.comparisonFrame. Window partitions on session_key, so
    * the per-session bar numbering (≤ grid size) never funnels a whole
    * dataset through one task.
    * Ref: /root/reference/src/session_object.py:259-311. */
  def comparisonFrame(rows: DataFrame, orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy("session_key").orderBy(orderCols: _*)
    rows.filter(col("actual_lap_time").isNotNull)
      .withColumn("bar_order", row_number().over(w))
      .select(col("session_key"), col("bar_order"), col("name_acronym"),
        col("actual_lap_time"),
        formatLapTime(col("actual_lap_time")).as("lap_time_label"),
        capitalize(col("Compound")).as("compound_label"),
        compoundColor(col("Compound")).as("bar_color"),
        when(col("driver_color").isNull || col("driver_color") === "Unknown",
          lit("#000000")).otherwise(col("driver_color")).as("driver_color"))
  }

  def avgLapMatrix(enriched: DataFrame, compounds: Seq[String]): DataFrame = {
    val long = avgLapByCompound(enriched)
    val sortKey = min(when(col("Compound") === "MEDIUM", col("avg_lap_time")))
    long.groupBy("driver_number", "name_acronym")
      .pivot("Compound", compounds)
      .agg(first(col("avg_lap_time")))
      .join(long.groupBy("driver_number").agg(sortKey.as("__sort")), Seq("driver_number"), "left")
      .orderBy(col("__sort").asc_nulls_last, col("name_acronym").asc)
      .drop("__sort")
  }
}
