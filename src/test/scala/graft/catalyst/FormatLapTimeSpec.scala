package graft.catalyst

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.F1Functions

/** The native expression must be indistinguishable from the builtin
  * composition path — checked over deterministic edges, a seeded
  * random sweep (through whole-stage codegen), and interpreted eval.
  */
class FormatLapTimeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native expression equals builtin composition over a random sweep") {
    FormatLapTime.register(spark)
    val rnd = new scala.util.Random(42)
    val vals = Seq(0.0, 59.9999, 60.0, 65.4569, 119.999, 120.0, 3599.123) ++
      (1 to 500).map(_ => rnd.nextDouble() * 7200.0)
    val df = vals.toDF("s")
      .select(expr("format_lap_time(s)").as("native"),
        F1Functions.formatLapTime(col("s")).as("builtin"))
    assert(df.filter(col("native") =!= col("builtin")).count() === 0)
  }

  test("NULL input formats to empty string, and the column is non-nullable") {
    FormatLapTime.register(spark)
    val df = Seq(Option.empty[Double], Some(65.0)).toDF("s")
      .select(expr("format_lap_time(s)").as("v"))
    assert(!df.schema("v").nullable)
    assert(df.collect().map(_.getString(0)).toSet === Set("", "1:05.000"))
  }

  test("interpreted eval matches codegen output") {
    val e = FormatLapTime(org.apache.spark.sql.catalyst.expressions.Literal(65.4569))
    assert(e.eval(null).toString === "1:05.456")
    val n = FormatLapTime(
      org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.DoubleType))
    assert(n.eval(null).toString === "")
  }

  test("truncation (never rounding) at the millisecond boundary") {
    val e = FormatLapTime(org.apache.spark.sql.catalyst.expressions.Literal(59.9999))
    assert(e.eval(null).toString === "0:59.999")
  }
}
