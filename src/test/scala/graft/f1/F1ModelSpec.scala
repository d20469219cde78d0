package graft.f1

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Typed Dataset views: `.as[T]` round-trips the fixture schema and
  * typed transformations compose with the untyped pipelines.
  */
class F1ModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("typed laps load and filter with compile-time fields") {
    val laps = F1Model.laps(spark)
    val d7 = laps.filter(_.driver_number == 7L)
    assert(d7.count() === 14) // 5 Q1 + 5 Q2 + 4 Q3 laps
    assert(d7.head().session_key === FixtureGen.SessionKey)
  }

  test("typed stints expose the coverage gap as data, not schema surprises") {
    val s = F1Model.stints(spark).filter(_.driver_number == 3L)
      .collect().sortBy(_.stint_number.getOrElse(0L))
    assert(s.map(_.lap_end.get).toSeq === Seq(5L, 8L, 14L))
  }

  test("typed view feeds the untyped enrichment pipeline unchanged") {
    val enriched = F1Pipelines.enrichLaps(
      F1Model.laps(spark).toDF(), F1Model.stints(spark).toDF(),
      F1Model.drivers(spark).toDF())
    assert(enriched.count() === F1Model.laps(spark).count())
  }

  test("GraftSession builder config reaches the active session surface") {
    val b = graft.GraftSession.builder(master = "local[2]", shufflePartitions = 7)
    // building on an existing SparkContext returns the same session with
    // our confs applied where session-scoped
    val s = b.getOrCreate()
    assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
  }
}
