package graft.f1

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.F1Functions
import graft.operators.AsOfJoin
import graft.sources.F1Tables

/** The reference's `Session` object re-expressed as a lazy facade —
  * the API a dashboard binds to (`Session(session_key)`,
  * /root/reference/src/session_object.py:25-53). Every member is a
  * lazily-built, cached DataFrame: the reference caches the whole
  * session object across UI interactions (dashboard.py:89-99); here
  * the first action materializes each plan once and Spark's cache
  * serves every later chart from memory. Nothing collects to the
  * driver except what a caller explicitly displays.
  */
class F1Session(spark: SparkSession, sessionKey: Long,
                dir: String = F1Tables.FixtureDir) {

  private def only(df: DataFrame): DataFrame =
    df.filter(col("session_key") === sessionKey)

  // only frames a caller actually touched get cached — and released
  private val materializedCaches =
    scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private def tracked(df: DataFrame): DataFrame = synchronized {
    materializedCaches += df
    df
  }

  /** Session metadata row (circuit, name, type, start/end). */
  lazy val info: DataFrame = tracked(only(F1Tables.sessions(spark, dir)).cache())

  /** E1 — enriched laps: actual_lap_time, driver dim, stint compound /
    * tire age via the backward as-of join.
    * Ref: /root/reference/src/session_object.py:135-154. */
  lazy val laps: DataFrame = tracked(F1Pipelines.enrichLaps(
    only(F1Tables.laps(spark, dir)),
    only(F1Tables.stints(spark, dir)),
    only(F1Tables.drivers(spark, dir))).cache())

  /** E1 — fastest lap per driver (whole-row argmin).
    * Ref: /root/reference/src/session_object.py:156-174. */
  lazy val fastestLaps: DataFrame = F1Pipelines.fastestLapPerDriver(laps)

  /** E2 — qualifying grid, only meaningful when the session is a
    * qualifying session (the reference guards the same way,
    * /root/reference/src/data_processing.py:270-272). */
  lazy val qualifyingGrid: DataFrame = {
    val start = info.filter(col("session_type") === "Qualifying")
      .select(col("date_start").as("__session_start"))
    F1Pipelines.qualifyingGrid(
      laps.crossJoin(broadcast(start)), col("__session_start"))
      .drop("__session_start")
  }

  /** E3 — one lap's telemetry with nearest-location track position.
    * Ref: /root/reference/src/session_object.py:193-250. */
  def lapTelemetry(driverNumber: Long, lapNumber: Long): DataFrame = {
    // the lap window comes from the already-cached enriched frame —
    // repeated dashboard calls must not re-scan the laps parquet
    val lap = laps
      .filter(col("driver_number") === driverNumber &&
        col("lap_number") === lapNumber)
      .select(col("date_start").as("__ls"),
        F1Functions.addSeconds(col("date_start"), col("lap_duration")).as("__le"))
    val windowed = F1Pipelines.lapTelemetry(
      only(F1Tables.carData(spark, dir))
        .filter(col("driver_number") === driverNumber)
        .crossJoin(broadcast(lap)),
      col("__ls"), col("__le")).drop("__ls", "__le")
    F1Pipelines.telemetryWithTrackPosition(windowed,
      only(F1Tables.location(spark, dir)))
  }

  /** classes.py surface — per-(driver, compound) averages and the
    * pivoted matrix. */
  lazy val avgLapByCompound: DataFrame = F1Pipelines.avgLapByCompound(laps)
  def avgLapMatrix(compounds: Seq[String]): DataFrame =
    F1Pipelines.avgLapMatrix(laps, compounds)

  /** The chart-ready frame behind the reference's fastest-lap
    * comparison chart: qualifying sessions plot in grid order, any
    * other session in fastest-lap order with one bar per driver.
    * The branch is the reference's own `if self.session_type ==
    * "Qualifying"` — a one-row scalar read from the cached session
    * info (bounded driver-side control flow, not a data collect).
    * Ref: /root/reference/src/session_object.py:259-311. */
  lazy val comparisonFrame: DataFrame = {
    // headOption, not head(): an unknown session key must yield an
    // empty frame like every other member, not throw on the empty info
    val isQualifying = info.select("session_type").limit(1).collect()
      .headOption.exists(_.getString(0) == "Qualifying")
    if (isQualifying)
      F1Pipelines.comparisonFrame(qualifyingGrid, Seq(col("grid_position").asc))
    else
      F1Pipelines.comparisonFrame(fastestLaps,
        Seq(col("actual_lap_time").asc_nulls_last, col("date_start").asc))
  }

  /** Release the cached frames a caller actually materialized (a
    * dashboard switching sessions). Untouched lazy members are not
    * forced just to be unpersisted. */
  def release(): Unit = synchronized {
    materializedCaches.foreach(_.unpersist())
    materializedCaches.clear()
  }
}
