package graft.f1

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Writes the committed F1-shaped fixture tables under fixtures/f1/
  * (one qualifying session, 20 drivers). Pure arithmetic — no RNG —
  * so a re-run reproduces byte-identical values; the correctness
  * oracles (F1Oracles) and F1PipelinesSpec read the same files.
  *
  * Shape mirrors the reference's entities (FIXTURES.md / F1Schemas):
  * laps with sector durations + pit-out flags + a few NULL sectors,
  * non-overlapping stints with one deliberate coverage gap (driver 3
  * laps 9-10 -> NULL compound, exercising the post-as-of null-out F7),
  * drivers dim, a weekend session catalog, car telemetry at 1 Hz and track
  * location at 0.8 s for the nearest as-of join (J4).
  */
object FixtureGen {

  val SessionKey = 9001L
  val T0: Instant = Instant.parse("2024-05-04T14:00:00Z")

  private def ts(secondsFromT0: Double): Timestamp =
    Timestamp.from(T0.plusNanos((secondsFromT0 * 1e9).toLong))

  /** Q1: all 20 drivers, laps 1-5; Q2: drivers 1-15, laps 6-10;
    * Q3: drivers 1-10, laps 11-14. Phase offsets put date_start
    * inside the reference's Q1/Q2/Q3 boundaries (25 / 48 min). */
  def laps: Seq[(Long, Long, Long, Timestamp, Option[Double], Option[Double], Option[Double], Option[Double], Boolean)] =
    for {
      d <- 1L to 20L
      (phaseOff, lapLo, lapHi) <- Seq((120.0, 1L, 5L), (1560.0, 6L, 10L), (2940.0, 11L, 14L))
      if !(lapLo == 6L && d > 15) && !(lapLo == 11L && d > 10)
      lap <- lapLo to lapHi
    } yield {
      val idx = lap - lapLo
      val start = ts(phaseOff + idx * 110.0 + d * 5.0)
      def sector(k: Int): Double = 20.0 + ((d * 7 + lap * 13 + k * 5) % 40) * 0.1
      val s2Null = (d + lap) % 11 == 0
      val s1 = Some(sector(1))
      val s2 = if (s2Null) None else Some(sector(2))
      val s3 = Some(sector(3))
      val total = for (a <- s1; b <- s2; c <- s3) yield a + b + c
      (SessionKey, d, lap, start, s1, s2, s3, total, idx == 0L)
    }

  /** Non-overlapping stints; driver 3's second stint ends at lap 8,
    * leaving laps 9-10 uncovered (tests F7 null-out past lap_end). */
  def stints: Seq[(Long, Long, Long, Long, Long, String, Long)] = {
    val compounds = Seq("SOFT", "MEDIUM", "HARD")
    (for (d <- 1L to 20L) yield {
      val s1 = (SessionKey, d, 1L, 1L, 5L, compounds((d % 3).toInt), d % 4)
      val s2 = if (d <= 15)
        Some((SessionKey, d, 2L, 6L, if (d == 3) 8L else 10L,
          compounds(((d + 1) % 3).toInt), (d + 1) % 4))
      else None
      val s3 = if (d <= 10)
        Some((SessionKey, d, 3L, 11L, 14L, compounds(((d + 2) % 3).toInt), (d + 2) % 4))
      else None
      Seq(s1) ++ s2 ++ s3
    }).flatten
  }

  def drivers: Seq[(Long, Long, String, String, String)] =
    (1L to 20L).map { d =>
      (SessionKey, d, f"D$d%02d", f"#${d * 11}%02X00AA", f"#${d * 11}%02X00AA")
    }

  /** A full race weekend per meeting so the sessions-in-weekend
    * catalog drill-down (helper_functions.py:44-53) has real structure.
    * Exactly ONE session across the catalog has session_type
    * "Qualifying" — the grid query's J5 scalar filters on it. */
  def sessions: Seq[(Long, Long, String, String, String, Timestamp, Timestamp)] =
    Seq(
      (9000L, 77L, "Practice 1", "Practice", "TestRing", ts(-172800.0), ts(-169200.0)),
      (SessionKey, 77L, "Qualifying", "Qualifying", "TestRing", ts(0.0), ts(3600.0)),
      (9002L, 77L, "Race", "Race", "TestRing", ts(86400.0), ts(93600.0)),
      (9100L, 78L, "Practice 1", "Practice", "OtherRing", ts(604800.0), ts(608400.0)),
      (9102L, 78L, "Race", "Race", "OtherRing", ts(777600.0), ts(784800.0)))

  def meetings: Seq[(Long, Int, String)] =
    Seq((77L, 2024, "Test Grand Prix"), (78L, 2024, "Other Grand Prix"))

  def pit: Seq[(Long, Long, Long, Timestamp, Double, Long)] =
    (1L to 10L).map { d =>
      (SessionKey, 77L, d, ts(1500.0 + d * 11.0), 20.0 + (d % 5) * 0.7, 5L)
    }

  /** 1 Hz car telemetry for driver 7 over [T0+1560s, T0+1760s). */
  def carData: Seq[(Long, Long, Timestamp, Double, Double, Double, Long, Long)] =
    (0 until 200).map { i =>
      (SessionKey, 7L, ts(1560.0 + i),
        150.0 + (i * 17 % 200) * 0.5, (i * 7 % 101).toDouble,
        (i % 5) * 20.0, (i % 8) + 1L, 9000L + i * 37 % 3000)
    }

  /** 0.8 s-spaced track location for driver 7 — deliberately unaligned
    * with carData so the nearest join has real arbitration to do. */
  def location: Seq[(Long, Long, Timestamp, Double, Double, Double)] =
    (0 until 250).map { i =>
      (SessionKey, 7L, ts(1560.0 + i * 0.8),
        (i * 31 % 500).toDouble, (i * 53 % 500).toDouble, (i % 20) * 0.5)
    }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "fixtures/f1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._

    def write(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")

    write(laps.toDF("session_key", "driver_number", "lap_number", "date_start",
      "duration_sector_1", "duration_sector_2", "duration_sector_3",
      "lap_duration", "is_pit_out_lap"), "laps")
    write(stints.toDF("session_key", "driver_number", "stint_number",
      "lap_start", "lap_end", "compound", "tyre_age_at_start"), "stints")
    write(drivers.toDF("session_key", "driver_number", "name_acronym",
      "team_colour", "driver_color"), "drivers")
    write(sessions.toDF("session_key", "meeting_key", "session_name",
      "session_type", "circuit_short_name", "date_start", "date_end"), "sessions")
    write(meetings.toDF("meeting_key", "year", "meeting_official_name"), "meetings")
    write(pit.toDF("session_key", "meeting_key", "driver_number", "date",
      "pit_duration", "lap_number"), "pit")
    write(carData.toDF("session_key", "driver_number", "date", "speed",
      "throttle", "brake", "n_gear", "rpm"), "car_data")
    write(location.toDF("session_key", "driver_number", "date", "x", "y", "z"),
      "location")
    spark.stop()
  }
}
