package graft.f1

import org.apache.spark.sql.types._

/** Explicit schemas for the OpenF1-shaped entities (SURVEY.md §1.3:
  * fixed StructTypes, nullable fields — the reference's column
  * accesses define the contract; see FIXTURES.md §B).
  */
object F1Schemas {

  val laps: StructType = StructType(Seq(
    StructField("session_key", LongType, nullable = false),
    StructField("driver_number", LongType, nullable = false),
    StructField("lap_number", LongType, nullable = false),
    StructField("date_start", TimestampType),
    StructField("duration_sector_1", DoubleType),
    StructField("duration_sector_2", DoubleType),
    StructField("duration_sector_3", DoubleType),
    StructField("lap_duration", DoubleType),
    StructField("is_pit_out_lap", BooleanType)))

  val stints: StructType = StructType(Seq(
    StructField("session_key", LongType, nullable = false),
    StructField("driver_number", LongType, nullable = false),
    StructField("stint_number", LongType),
    StructField("lap_start", LongType),
    StructField("lap_end", LongType),
    StructField("compound", StringType),
    StructField("tyre_age_at_start", LongType)))

  val drivers: StructType = StructType(Seq(
    StructField("session_key", LongType, nullable = false),
    StructField("driver_number", LongType, nullable = false),
    StructField("name_acronym", StringType),
    StructField("team_colour", StringType),
    StructField("driver_color", StringType)))

  val sessions: StructType = StructType(Seq(
    StructField("session_key", LongType, nullable = false),
    StructField("meeting_key", LongType),
    StructField("session_name", StringType),
    StructField("session_type", StringType),
    StructField("circuit_short_name", StringType),
    StructField("date_start", TimestampType),
    StructField("date_end", TimestampType)))

  val carData: StructType = StructType(Seq(
    StructField("session_key", LongType, nullable = false),
    StructField("driver_number", LongType, nullable = false),
    StructField("date", TimestampType),
    StructField("speed", DoubleType),
    StructField("throttle", DoubleType),
    StructField("brake", DoubleType),
    StructField("n_gear", LongType),
    StructField("rpm", LongType)))

  val location: StructType = StructType(Seq(
    StructField("session_key", LongType, nullable = false),
    StructField("driver_number", LongType, nullable = false),
    StructField("date", TimestampType),
    StructField("x", DoubleType),
    StructField("y", DoubleType),
    StructField("z", DoubleType)))

  val pit: StructType = StructType(Seq(
    StructField("session_key", LongType, nullable = false),
    StructField("meeting_key", LongType),
    StructField("driver_number", LongType, nullable = false),
    StructField("date", TimestampType),
    StructField("pit_duration", DoubleType),
    StructField("lap_number", LongType)))

  val meetings: StructType = StructType(Seq(
    StructField("meeting_key", LongType, nullable = false),
    StructField("year", IntegerType),
    StructField("meeting_official_name", StringType)))
}
