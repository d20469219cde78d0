package graft.f1

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
// forAllNoShrink: shrinking would drop entries from the per-driver
// time lists, breaking the participation structure the invariants assume
import org.scalacheck.Prop.forAllNoShrink

import graft.TestSpark

/** Grid-order invariants under random — but CONSISTENT — qualifying
  * data (SURVEY.md §5.4): who runs Q2/Q3 is derived from the generated
  * Q1/Q2 times exactly like a real session (5 slowest eliminated per
  * phase), matching the reference's assumption that elimination and
  * participation agree. Invariants: positions are exactly 1..20, each
  * driver classified once, Q3 runners ahead of Q2-outs ahead of
  * Q1-outs, eliminated groups ordered fastest-first.
  */
object QualifyingGridProps extends Properties("QualifyingGrid") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark

  private val base = Timestamp.valueOf("2024-05-04 14:00:00").getTime

  // one random lap time per driver per phase; participation derived below
  private val timesGen: Gen[List[Double]] =
    Gen.listOfN(60, Gen.choose(6000, 9000).map(_ / 100.0))

  property("grid positions are a permutation of 1..20 with correct phase bands") =
    forAllNoShrink(timesGen) { times =>
      import spark.implicits._
      def t(d: Int, ph: Int): Double = times((ph * 20 + d - 1) % 60) + d * 1e-4

      // derive advancement from the Q1/Q2 times (ties by driver number)
      val q1Order = (1 to 20).sortBy(d => (t(d, 0), d))
      val q2Runners = q1Order.take(15).toSet
      val q2Order = (1 to 20).filter(q2Runners).sortBy(d => (t(d, 1), d))
      val q3Runners = q2Order.take(10).toSet

      val phaseOffsets = Map(0 -> 120L, 1 -> 1560L, 2 -> 2940L)
      val rows = for {
        d <- 1 to 20
        ph <- 0 to 2
        if ph == 0 || (ph == 1 && q2Runners(d)) || (ph == 2 && q3Runners(d))
      } yield (9001L, d.toLong,
        new Timestamp(base + (phaseOffsets(ph) + d % 7) * 1000L), t(d, ph), false)

      val df = rows.toDF("session_key", "driver_number", "date_start",
        "actual_lap_time", "is_pit_out_lap")
        .withColumn("name_acronym", concat(lit("D"), col("driver_number")))
      val grid = F1Pipelines.qualifyingGrid(df,
          lit("2024-05-04 14:00:00").cast("timestamp"))
        .select("grid_position", "phase", "driver_number", "actual_lap_time")
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))

      val positions = grid.map(_._1).sorted.toSeq
      val phaseOk = grid.forall {
        case (p, "Q3", _, _) => p >= 1 && p <= 10
        case (p, "Q2", _, _) => p >= 11 && p <= 15
        case (p, "Q1", _, _) => p >= 16 && p <= 20
        case _               => false
      }
      val uniqueDrivers = grid.map(_._3).distinct.length == 20
      def fastestFirst(lo: Int, hi: Int): Boolean = {
        val seg = grid.filter(g => g._1 >= lo && g._1 <= hi).sortBy(_._1).map(_._4)
        seg.sameElements(seg.sorted)
      }
      Prop(positions == (1 to 20) && phaseOk && uniqueDrivers &&
        fastestFirst(11, 15) && fastestFirst(16, 20)) :|
        s"grid=${grid.sortBy(_._1).mkString(", ")}"
    }
}
