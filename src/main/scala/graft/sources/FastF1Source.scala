package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType, StringType, StructField, StructType}

/** S10 — the FastF1 ALTERNATE source as an executable analogue.
  * The reference's second entry point loads laps through the fastf1
  * package instead of the OpenF1 REST API
  * (/root/reference/classes.py:13-17); a FastF1 cache export is a
  * tabular file with FastF1's OWN column names (DriverNumber,
  * LapNumber, LapStartDate, Sector1Time, ...) and "NaT" markers for
  * missing times. This loader reads that shape from CSV and
  * renames/parses it to the exact [[graft.f1.F1Schemas.laps]] layout,
  * so every downstream pipeline (enrichment, grid, ranking,
  * telemetry) runs unchanged on either source — the property the
  * reference obtains by hand-aligning the two frames' columns.
  *
  * Scale posture: a plain schema'd CSV scan — splittable, parallel,
  * filter/pruning pushdown as for any file source; the rename/parse
  * is a projection.
  */
object FastF1Source {

  /** The FastF1-export physical schema (times already in seconds). */
  val rawSchema: StructType = StructType(Seq(
    StructField("SessionKey", LongType),
    StructField("DriverNumber", LongType),
    StructField("LapNumber", LongType),
    StructField("LapStartDate", StringType), // ISO-8601, no offset
    StructField("Sector1Time", DoubleType),
    StructField("Sector2Time", DoubleType),
    StructField("Sector3Time", DoubleType),
    StructField("LapTime", DoubleType),
    StructField("IsPitOutLap", BooleanType)))

  /** Laps in the canonical engine layout, from a FastF1-shaped CSV
    * directory. "NaT" (pandas' missing-time marker) reads as NULL. */
  def laps(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(rawSchema)
      .option("header", "true")
      .option("nullValue", "NaT")
      .csv(path)
      .select(
        col("SessionKey").as("session_key"),
        col("DriverNumber").as("driver_number"),
        col("LapNumber").as("lap_number"),
        to_timestamp(col("LapStartDate")).as("date_start"),
        col("Sector1Time").as("duration_sector_1"),
        col("Sector2Time").as("duration_sector_2"),
        col("Sector3Time").as("duration_sector_3"),
        col("LapTime").as("lap_duration"),
        col("IsPitOutLap").as("is_pit_out_lap"))
}
