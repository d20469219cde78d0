package graft.f1

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The Session facade must serve the same results as the raw
  * pipelines, filter strictly to its session, and cache-release
  * cleanly — the dashboard usage contract.
  */
class F1SessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val session = new F1Session(spark, FixtureGen.SessionKey)

  test("facade laps equal the raw enrichment pipeline") {
    val raw = F1Pipelines.enrichLaps(
      graft.sources.F1Tables.laps(spark),
      graft.sources.F1Tables.stints(spark),
      graft.sources.F1Tables.drivers(spark))
    assert(session.laps.exceptAll(raw).isEmpty && raw.exceptAll(session.laps).isEmpty)
  }

  test("fastest laps: one row per driver, true minima") {
    val fl = session.fastestLaps
    assert(fl.count() === fl.select("driver_number").distinct().count())
    assert(fl.count() === 20)
  }

  test("qualifying grid through the facade is the full 1..20") {
    val grid = session.qualifyingGrid.select("grid_position")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(grid === (1 to 20))
  }

  test("lap telemetry binds a single driver's lap window with positions") {
    val t = session.lapTelemetry(7L, 7L)
    assert(t.count() > 0)
    assert(t.select("driver_number").distinct().collect().map(_.getLong(0)).toSeq === Seq(7L))
    assert(t.filter(col("x").isNull).count() === 0)
  }

  test("an unknown session key yields empty frames, not errors") {
    val ghost = new F1Session(spark, 424242L)
    assert(ghost.laps.isEmpty && ghost.fastestLaps.isEmpty)
    ghost.release()
  }

  test("release unpersists the cached frames") {
    session.laps.count() // materialize cache
    session.release()
    assert(session.laps.storageLevel ===
      org.apache.spark.storage.StorageLevel.NONE)
  }
}
