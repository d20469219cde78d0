package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import F1Functions._

/** Scalar parity traps (SURVEY.md §2.2): HALF_EVEN rounding, the
  * truncating M:SS.mmm formatter with null→"", capitalize, tire age,
  * qualifying phase boundaries, map-literal lookups.
  */
class F1FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eval1[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).collect()(0).getAs[T]("v")

  test("actualLapTime rounds HALF_EVEN like Python round (not HALF_UP)") {
    // 0.0005 at scale 3: HALF_UP -> 0.001, HALF_EVEN -> 0.000
    assert(eval1[Double](actualLapTime(lit(0.0), lit(0.0), lit(0.0005))) === 0.0)
    assert(eval1[Double](actualLapTime(lit(0.0), lit(0.0), lit(0.0015))) === 0.002)
    assert(eval1[Double](actualLapTime(lit(30.1), lit(20.2), lit(10.3))) === 60.6)
  }

  test("actualLapTime is NULL when any sector is NULL") {
    val out = spark.range(1).select(
      actualLapTime(lit(1.0), lit(null).cast("double"), lit(2.0)).as("v"))
      .collect()(0)
    assert(out.isNullAt(0))
  }

  test("formatLapTime truncates milliseconds, never rounds") {
    assert(eval1[String](formatLapTime(lit(65.4569))) === "1:05.456")
    assert(eval1[String](formatLapTime(lit(59.9999))) === "0:59.999")
    assert(eval1[String](formatLapTime(lit(120.0))) === "2:00.000")
  }

  test("formatLapTime NULL -> empty string (classes.py convention)") {
    assert(eval1[String](formatLapTime(lit(null).cast("double"))) === "")
  }

  test("formatAxisSeconds renders M:SS.cc and blanks NULL/NaN") {
    assert(eval1[String](formatAxisSeconds(lit(65.459))) === "1:05.45")
    assert(eval1[String](formatAxisSeconds(lit(null).cast("double"))) === "")
    assert(eval1[String](formatAxisSeconds(lit(Double.NaN))) === "")
  }

  test("capitalize matches Python str.capitalize") {
    assert(eval1[String](capitalize(lit("MEDIUM"))) === "Medium")
    assert(eval1[String](capitalize(lit("soft"))) === "Soft")
    assert(eval1[String](capitalize(lit("x"))) === "X")
  }

  test("compoundColor misses yield NULL (pandas .map NaN)") {
    assert(eval1[String](compoundColor(lit("SOFT"))) === "#FF0000")
    val out = spark.range(1).select(compoundColor(lit("NOPE")).as("v")).collect()(0)
    assert(out.isNullAt(0))
  }

  test("tireAge = lap_number - lap_start + tyre_age_at_start inside the stint") {
    assert(eval1[Long](tireAge(lit(10L), lit(8L), lit(15L), lit(3L))) === 5L)
  }

  test("tireAge NULL outside the stint interval") {
    val out = spark.range(1)
      .select(tireAge(lit(20L), lit(8L), lit(15L), lit(3L)).as("v")).collect()(0)
    assert(out.isNullAt(0))
  }

  test("qualifyingPhase boundaries: Q1 < start+25min <= Q2 < +23min <= Q3") {
    val start = lit("2024-01-01 10:00:00").cast("timestamp")
    def phaseAt(t: String): String =
      eval1[String](qualifyingPhase(lit(t).cast("timestamp"), start))
    assert(phaseAt("2024-01-01 10:00:00") === "Q1")
    assert(phaseAt("2024-01-01 10:24:59") === "Q1")
    assert(phaseAt("2024-01-01 10:25:00") === "Q2")
    assert(phaseAt("2024-01-01 10:47:59") === "Q2")
    assert(phaseAt("2024-01-01 10:48:00") === "Q3")
  }

  test("secondsBetween / addSeconds round-trip fractional seconds") {
    val t0 = lit("2024-01-01 00:00:00").cast("timestamp")
    assert(eval1[Double](secondsBetween(addSeconds(t0, lit(12.345)), t0)) === 12.345)
  }

  test("notPitOut treats NULL as not-pit-out (keeps the lap)") {
    assert(eval1[Boolean](notPitOut(lit(null).cast("boolean"))) === true)
    assert(eval1[Boolean](notPitOut(lit(true))) === false)
  }
}
