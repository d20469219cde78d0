package graft.f1

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.AsOfJoin
import graft.sources.F1Tables

/** End-to-end F1 pipeline semantics over the committed fixtures
  * (fixtures/f1). Pins the claims the implementation makes:
  * as-of-backward + null-out == interval join for non-overlapping
  * stints, grid-position orientation (fastest eliminated driver takes
  * the best remaining slot), stint-gap null-out, and the E3 telemetry
  * window + nearest-join shape.
  */
class F1PipelinesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val enriched: DataFrame =
    F1Pipelines.enrichLaps(F1Tables.laps(spark), F1Tables.stints(spark),
      F1Tables.drivers(spark))

  test("enrichLaps keeps every lap exactly once (left join, no fan-out)") {
    assert(enriched.count() === F1Tables.laps(spark).count())
    assert(enriched.groupBy("driver_number", "lap_number").count()
      .filter(col("count") > 1).count() === 0)
  }

  test("as-of backward + null-out equals the interval join (non-overlapping stints)") {
    val laps = F1Tables.laps(spark).select("session_key", "driver_number", "lap_number")
    val stints = F1Tables.stints(spark)
    val viaInterval = AsOfJoin.intervalJoin(laps, stints,
        by = Seq("session_key", "driver_number"),
        valueCol = "lap_number", loCol = "lap_start", hiCol = "lap_end")
      .select(col("driver_number"), col("lap_number"),
        col("compound"), col("stint_number"))
    val viaAsof = enriched.select(col("driver_number"), col("lap_number"),
      col("Compound").as("compound"), col("Stint Number").as("stint_number"))
    assert(viaAsof.exceptAll(viaInterval).isEmpty
      && viaInterval.exceptAll(viaAsof).isEmpty)
  }

  test("stint coverage gap yields NULL compound (F7 null-out past lap_end)") {
    // driver 3's stint 2 ends at lap 8; laps 9-10 exist but are uncovered
    val gap = enriched.filter(col("driver_number") === 3 &&
      col("lap_number").isin(9, 10))
    assert(gap.count() === 2)
    assert(gap.filter(col("Compound").isNull).count() === 2)
    val covered = enriched.filter(col("driver_number") === 3 && col("lap_number") === 8)
    assert(covered.filter(col("Compound").isNotNull).count() === 1)
  }

  test("tire age advances with lap number from tyre_age_at_start") {
    val d5 = enriched.filter(col("driver_number") === 5 && col("Stint Number") === 1)
      .select("lap_number", "Tire Age").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver 5, stint 1: lap_start=1, tyre_age_at_start=5%4=1
    assert(d5 === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("qualifying grid is a full 1..20 with Q3 ahead of Q2-outs ahead of Q1-outs") {
    val grid = graft.queries.F1Queries.f1Grid(spark, "")
    val rows = grid.select("grid_position", "phase").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows.keySet === (1 to 20).toSet)
    assert((1 to 10).forall(rows(_) === "Q3"))
    assert((11 to 15).forall(rows(_) === "Q2"))
    assert((16 to 20).forall(rows(_) === "Q1"))
  }

  test("P11/P16 go to the FASTEST eliminated driver of Q2/Q1, not the slowest") {
    val grid = graft.queries.F1Queries.f1Grid(spark, "")
      .select("grid_position", "actual_lap_time", "phase").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getString(2)))
    val q2Out = grid.filter(_._3 == "Q2").filter(g => g._1 >= 11 && g._1 <= 15)
    assert(q2Out.sortBy(_._1).map(_._2).toSeq === q2Out.map(_._2).sorted.toSeq,
      "eliminated Q2 drivers must be ordered fastest-first from P11")
    val q1Out = grid.filter(_._3 == "Q1").filter(g => g._1 >= 16)
    assert(q1Out.sortBy(_._1).map(_._2).toSeq === q1Out.map(_._2).sorted.toSeq)
  }

  test("fastest lap per driver is the true minimum of that driver's laps") {
    val fastest = F1Pipelines.fastestLapPerDriver(enriched)
      .select("driver_number", "actual_lap_time").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mins = enriched.filter(col("actual_lap_time").isNotNull)
      .groupBy("driver_number").agg(min("actual_lap_time").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fastest === mins)
  }

  test("lap telemetry window is inclusive and seconds_from_lap_start starts at 0") {
    val t = graft.queries.F1Queries.f1Telemetry(spark, "")
    val secs = t.select("seconds_from_lap_start").collect().map(_.getDouble(0))
    assert(secs.nonEmpty && secs.forall(s => s >= 0.0))
    // every telemetry row got a nearest location match (location covers the window)
    assert(t.filter(col("x").isNull).count() === 0)
  }

  test("P13 vs P14 tire age diverge exactly on in-stint lap gaps (pinned choice)") {
    import spark.implicits._
    val laps = Seq((1L, 1L, 6L), (1L, 1L, 8L), (1L, 1L, 9L))
      .toDF("session_key", "driver_number", "lap_number")
    val stints = Seq((1L, 1L, 2L, 6L, 10L, "SOFT", 4L))
      .toDF("session_key", "driver_number", "stint_number",
        "lap_start", "lap_end", "compound", "tyre_age_at_start")
    val positional = F1Pipelines.tireAgePositional(laps, stints)
      .select("lap_number", "tire_age_positional").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // v1 positional: consecutive ages regardless of the missing lap 7
    assert(positional === Map(6L -> 4L, 8L -> 5L, 9L -> 6L))
    // canonical v2 lap arithmetic: ages jump with the gap
    val arithmetic = laps.select(col("lap_number"),
        graft.functions.F1Functions.tireAge(col("lap_number"), lit(6L), lit(10L), lit(4L)).as("a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(arithmetic === Map(6L -> 4L, 8L -> 6L, 9L -> 7L))
  }

  test("red-flag guard rejects sessions longer than 70 minutes") {
    intercept[IllegalArgumentException] {
      F1Pipelines.assertNoRedFlag(
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 11:20:00"))
    }
    F1Pipelines.assertNoRedFlag(
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
      java.sql.Timestamp.valueOf("2024-01-01 11:00:00"))
  }
}
