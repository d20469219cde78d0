package graft.f1

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.sources.F1Tables

/** Typed views of the F1 entities (SURVEY.md §7.0: `Dataset[T]` for
  * public API ergonomics; internals stay untyped for Catalyst
  * optimizability). Field names match the parquet/REST schema 1:1 so
  * `.as[T]` is a pure metadata operation — no extra projection.
  */
object F1Model {

  case class Lap(session_key: Long, driver_number: Long, lap_number: Long,
                 date_start: Option[Timestamp],
                 duration_sector_1: Option[Double],
                 duration_sector_2: Option[Double],
                 duration_sector_3: Option[Double],
                 lap_duration: Option[Double],
                 is_pit_out_lap: Option[Boolean])

  case class Stint(session_key: Long, driver_number: Long,
                   stint_number: Option[Long], lap_start: Option[Long],
                   lap_end: Option[Long], compound: Option[String],
                   tyre_age_at_start: Option[Long])

  case class Driver(session_key: Long, driver_number: Long,
                    name_acronym: Option[String], team_colour: Option[String],
                    driver_color: Option[String])

  def laps(spark: SparkSession, dir: String = F1Tables.FixtureDir): Dataset[Lap] = {
    import spark.implicits._
    F1Tables.laps(spark, dir).as[Lap]
  }

  def stints(spark: SparkSession, dir: String = F1Tables.FixtureDir): Dataset[Stint] = {
    import spark.implicits._
    F1Tables.stints(spark, dir).as[Stint]
  }

  def drivers(spark: SparkSession, dir: String = F1Tables.FixtureDir): Dataset[Driver] = {
    import spark.implicits._
    F1Tables.drivers(spark, dir).as[Driver]
  }
}
