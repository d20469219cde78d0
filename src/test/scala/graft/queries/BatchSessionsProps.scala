package graft.queries

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.TestSpark

/** ScalaCheck: the windowed gaps-and-islands sessionizer must equal a
  * straightforward in-memory fold over per-user time-sorted events,
  * for random user counts, timestamps (including exact ties and
  * exact-gap edges) and values.
  */
object BatchSessionsProps extends Properties("BatchSessions") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark

  private val gapUs = 6L * 3600 * 1000000

  // minutes chosen so exact 6h (=360m) gaps occur regularly
  private val eventGen = for {
    user <- Gen.choose(1, 3)
    minutes <- Gen.oneOf(Gen.choose(0, 2000), Gen.oneOf(0, 360, 720, 721))
  } yield (user.toLong, minutes)

  private def brute(events: Seq[(Long, Long, Timestamp, Double)])
      : Set[(Long, Timestamp, Timestamp, Long, Double)] =
    events.groupBy(_._2).flatMap { case (user, evs) =>
      val sorted = evs.sortBy(e => (e._3.getTime, e._1))
      val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Timestamp, Double)]]) {
        case (Nil, e) => List(List(e))
        case (cur :: done, e) =>
          val gap = e._3.getTime * 1000 - cur.head._3.getTime * 1000
          if (gap > gapUs) List(e) :: cur :: done else (e :: cur) :: done
      }
      sessions.map { s =>
        val asc = s.reverse
        (user, asc.head._3, asc.last._3, s.size.toLong,
          BigDecimal(s.map(e => BigDecimal(e._4).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble).toDouble)
      }
    }.toSet

  property("equals the per-user in-memory fold") =
    forAll(Gen.resize(40, Gen.nonEmptyListOf(eventGen))) { raw =>
      import spark.implicits._
      val events = raw.zipWithIndex.map { case ((u, m), i) =>
        (i.toLong, u, new Timestamp(1700000000000L + m * 60000L), (m % 7) + 0.25)
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-bs").toString
      events.toDF("event_id", "user_id", "ts", "value")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = StarQueries.batchSessions(spark, dir).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      got == brute(events)
    }
}
