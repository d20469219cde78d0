package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The FastF1 alternate source (S10): a FastF1-shaped CSV export reads
  * to the exact canonical laps layout, and pipelines produce identical
  * results from either physical source.
  */
class FastF1SourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def stageCsv(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-fastf1").toString
    F1Tables.laps(spark).select(
        col("session_key").as("SessionKey"),
        col("driver_number").as("DriverNumber"),
        col("lap_number").as("LapNumber"),
        date_format(col("date_start"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
          .as("LapStartDate"),
        col("duration_sector_1").as("Sector1Time"),
        col("duration_sector_2").as("Sector2Time"),
        col("duration_sector_3").as("Sector3Time"),
        col("lap_duration").as("LapTime"),
        col("is_pit_out_lap").as("IsPitOutLap"))
      .coalesce(1).write.mode("overwrite")
      .option("header", "true").option("nullValue", "NaT")
      .csv(dir)
    dir
  }

  test("FastF1-shaped CSV reads to the canonical laps layout, rows exact") {
    val viaCsv = FastF1Source.laps(spark, stageCsv())
    val viaParquet = F1Tables.laps(spark)
    assert(viaCsv.schema.map(f => (f.name, f.dataType))
      === viaParquet.schema.map(f => (f.name, f.dataType)))
    assert(viaCsv.exceptAll(viaParquet).isEmpty
      && viaParquet.exceptAll(viaCsv).isEmpty)
    // NaT markers really became NULLs (fixture has 21 null sector-2 times)
    assert(viaCsv.filter(col("duration_sector_2").isNull).count() > 0)
  }

  test("a pipeline computes identical results from either physical source") {
    val viaCsv = graft.operators.Ranking.argminRow(
      FastF1Source.laps(spark, stageCsv())
        .filter(col("lap_duration").isNotNull),
      groupCols = Seq("driver_number"),
      orderCols = Seq("lap_duration", "lap_number"))
    val viaParquet = graft.operators.Ranking.argminRow(
      F1Tables.laps(spark).filter(col("lap_duration").isNotNull),
      groupCols = Seq("driver_number"),
      orderCols = Seq("lap_duration", "lap_number"))
    assert(viaCsv.exceptAll(viaParquet).isEmpty
      && viaParquet.exceptAll(viaCsv).isEmpty)
  }
}
