package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.f1.F1Pipelines
import graft.functions.F1Functions
import graft.sources.F1Tables

/** The reference's F1 entity pipelines (SURVEY.md §3 E1/E2/E3) run
  * end-to-end over the committed fixtures (fixtures/f1, written by
  * FixtureGen) and checked against DuckDB oracles reading the same
  * files. The `dir` argument every query receives is the star-schema
  * sf dir — unused here; the F1 fixture set is fixed.
  */
object F1Queries {

  private def enriched(spark: SparkSession): DataFrame =
    F1Pipelines.enrichLaps(F1Tables.laps(spark), F1Tables.stints(spark),
      F1Tables.drivers(spark))

  /** E1 — lap enrichment: P1 bround, J1 broadcast driver dim, J3
    * backward as-of vs stints + F7 null-out + P13 tire age. */
  def f1Enrich(spark: SparkSession, dir: String): DataFrame =
    enriched(spark).select(
      col("session_key"), col("driver_number"), col("lap_number"),
      col("date_start"), col("actual_lap_time"), col("name_acronym"),
      col("driver_color"), col("Compound").as("compound"),
      col("Tire Age").as("tire_age"), col("Stint Number").as("stint_number"))

  /** E1 — A1 whole-row argmin fastest lap per driver. */
  def f1Fastest(spark: SparkSession, dir: String): DataFrame =
    F1Pipelines.fastestLapPerDriver(enriched(spark)).select(
      col("driver_number"), col("lap_number"), col("date_start"),
      col("actual_lap_time"), col("name_acronym"),
      col("Compound").as("compound"))

  /** E2 — qualifying classification + grid order. The session start
    * (J5 scalar) stays in-plan via a broadcast single-row cross join —
    * no driver-side collect. */
  def f1Grid(spark: SparkSession, dir: String): DataFrame = {
    val sessionStart = F1Tables.sessions(spark)
      .filter(col("session_type") === "Qualifying")
      .select(col("date_start").as("__session_start"))
    val withStart = enriched(spark).crossJoin(broadcast(sessionStart))
    F1Pipelines.qualifyingGrid(withStart, col("__session_start"))
      .select(col("grid_position"), col("phase"), col("driver_number"),
        col("name_acronym"), col("actual_lap_time"))
  }

  /** classes.py surface — A2 per-(driver, compound) average lap time
    * through the exact decimal domain. */
  def f1AvgCompound(spark: SparkSession, dir: String): DataFrame =
    F1Pipelines.avgLapByCompound(enriched(spark)).select(
      col("driver_number"), col("name_acronym"),
      col("Compound").as("compound"), col("avg_lap_time"))

  /** classes.py surface — R1 pivot to the drivers × compounds matrix
    * with fixed compound order (R3 reindex keeps all-NULL columns),
    * O5 sort key = best MEDIUM average (A3). */
  def f1AvgMatrix(spark: SparkSession, dir: String): DataFrame =
    F1Pipelines.avgLapMatrix(enriched(spark), Seq("SOFT", "MEDIUM", "HARD"))
      .select("driver_number", "name_acronym", "SOFT", "MEDIUM", "HARD")

  /** E3 — one lap's telemetry (F5 time mask + P4 seconds column, J5
    * scalar lap window via broadcast) + J4 nearest as-of with track
    * location. */
  def f1Telemetry(spark: SparkSession, dir: String): DataFrame = {
    val lap = F1Tables.laps(spark)
      .filter(col("driver_number") === 7 && col("lap_number") === 7)
      .select(col("date_start").as("__ls"),
        F1Functions.addSeconds(col("date_start"), col("lap_duration")).as("__le"))
    val windowed = F1Pipelines.lapTelemetry(
      F1Tables.carData(spark).crossJoin(broadcast(lap)),
      col("__ls"), col("__le")).drop("__ls", "__le")
    F1Pipelines.telemetryWithTrackPosition(windowed, F1Tables.location(spark))
  }

  /** S1–S3/S9 — the openf1 DataSourceV2 connector: per-driver parallel
    * partitions, pushed-down session/driver predicates, retry-wrapped
    * transport. Oracle reads the same data from the committed parquet. */
  def openf1Laps(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("openf1").option("entity", "laps").load()
      .filter(col("session_key") === 9001 && col("driver_number") <= 3)
      .select("session_key", "driver_number", "lap_number", "date_start",
        "lap_duration", "is_pit_out_lap")

  /** §2.11 + S1–S3/S9 — the openf1 connector in STREAMING mode
    * (MicroBatchStream, the reference dashboard's live re-poll loop):
    * a real readStream over the connector runs to completion and must
    * equal the BATCH oracle over the committed laps parquet. The scope
    * (session 9001) rides in as a reader option — streaming scans get
    * no filter pushdown — and the driver filter is applied by Spark
    * above the source. Stateless append stream: no state stores, no
    * shuffle, so no partition-count override is needed. */
  private val streamRuns = new java.util.concurrent.atomic.AtomicInteger(0)
  def openf1Stream(spark: SparkSession, dir: String): DataFrame = {
    val name = s"q_openf1_stream_${streamRuns.incrementAndGet()}"
    val q = spark.readStream.format("openf1")
      .option("entity", "laps").option("session_key", "9001").load()
      .filter(col("driver_number") <= 3)
      .select("session_key", "driver_number", "lap_number", "date_start",
        "lap_duration", "is_pit_out_lap")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // detach from the memory sink (bounded result) and drop the view
    val sunk = spark.table(name)
    val rows = sunk.collectAsList()
    spark.catalog.dropTempView(name)
    spark.createDataFrame(rows, sunk.schema)
  }

  /** S8 — meetings catalog distinct projection. */
  def f1Meetings(spark: SparkSession, dir: String): DataFrame =
    F1Tables.meetings(spark)
      .select("meeting_official_name", "meeting_key").distinct()

  /** S8 tail — sessions-in-weekend drill-down
    * (/root/reference/src/helper_functions.py:44-53): the distinct
    * (session_name, session_key) catalog per meeting. The meetings dim
    * is broadcast — at catalog scale both sides are tiny, but the
    * shape (fact ⋈ broadcast dim → distinct) is the one that survives
    * a full-history sessions table. */
  def f1WeekendSessions(spark: SparkSession, dir: String): DataFrame =
    F1Tables.sessions(spark)
      .join(broadcast(F1Tables.meetings(spark)), Seq("meeting_key"))
      .select("meeting_key", "meeting_official_name", "session_key", "session_name")
      .distinct()

  /** S7 + S12 — pit scan with dropped export columns. */
  def f1Pit(spark: SparkSession, dir: String): DataFrame =
    F1Tables.pit(spark).drop("meeting_key", "session_key")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_f1_enrich"       -> (f1Enrich _),
    "q_f1_fastest"      -> (f1Fastest _),
    "q_f1_grid"         -> (f1Grid _),
    "q_f1_avg_compound" -> (f1AvgCompound _),
    "q_f1_avg_matrix"   -> (f1AvgMatrix _),
    "q_f1_telemetry"    -> (f1Telemetry _),
    "q_f1_meetings"     -> (f1Meetings _),
    "q_f1_weekend_sessions" -> (f1WeekendSessions _),
    "q_openf1_laps"     -> (openf1Laps _),
    "q_openf1_stream"   -> (openf1Stream _),
    "q_f1_pit"          -> (f1Pit _),
  )
}
