package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression library re-expressing the reference's scalar /
  * derived-column operators (SURVEY.md §2.2 P1–P14, §2.3 F1–F10).
  *
  * Everything here is a pure `Column` combinator: zero serialization,
  * fully codegen'd by Catalyst, safe inside whole-stage codegen at any
  * scale. No UDFs.
  */
object F1Functions {

  /** P1 — `actual_lap_time = round(s1+s2+s3, 3)` with HALF_EVEN
    * (Python `round` is banker's rounding; Spark `round` is HALF_UP so
    * we must use `bround`). NULL if any sector is NULL — `+` already
    * propagates NULL. Ref: /root/reference/src/data_processing.py:88,
    * /root/reference/src/session_object.py:144.
    */
  def actualLapTime(s1: Column, s2: Column, s3: Column): Column =
    bround(s1 + s2 + s3, 3)

  /** P3 — compound → hex color lookup via a map literal; misses → NULL
    * (pandas `.map` yields NaN on miss).
    * Ref: /root/reference/src/data_visualization.py:13. */
  val compoundColors: Map[String, String] = Map(
    "SOFT" -> "#FF0000", "MEDIUM" -> "#FFFF00", "HARD" -> "#FFFFFF",
    "INTERMEDIATE" -> "#00FF00", "WET" -> "#0000FF")

  def compoundColor(compound: Column): Column =
    element_at(typedLit(compoundColors), compound)

  /** P4 — seconds elapsed since a reference timestamp, as fractional
    * seconds. Ref: /root/reference/src/session_object.py:88-90. */
  def secondsBetween(ts: Column, start: Column): Column =
    (unix_micros(ts) - unix_micros(start)) / lit(1e6)

  /** P6 — timestamp + float-seconds duration (lap end time).
    * Ref: /root/reference/src/session_object.py:186-190. */
  def addSeconds(ts: Column, seconds: Column): Column =
    timestamp_micros(unix_micros(ts) + (seconds * lit(1e6)).cast("long"))

  /** P7 — qualifying-phase label from the session start: Q1 lasts 18
    * min, +7 min buffer, Q2 15 min, +8 min buffer, rest is Q3.
    * Ref: /root/reference/src/data_processing.py:222-239. */
  def qualifyingPhase(ts: Column, sessionStart: Column): Column = {
    val q2Start = addSeconds(sessionStart, lit((18 + 7) * 60.0))
    val q3Start = addSeconds(q2Start, lit((15 + 8) * 60.0))
    when(ts < q2Start, "Q1").when(ts < q3Start, "Q2").otherwise("Q3")
  }

  /** P9/P10/P11 — float seconds → "M:SS.mmm", truncating (not
    * rounding) the millisecond part, matching the reference's
    * int()-based formatter; NULL in → "" (classes.py empty-string
    * convention). Ref: /root/reference/src/data_processing.py:314-318,
    * /root/reference/classes.py:29-36. */
  def formatLapTime(seconds: Column): Column = {
    val totalMillis = floor(seconds * 1000).cast("long")
    // Column `/` is always double division; floor+cast restores the
    // integral domain (%d would reject a double at runtime).
    val m  = floor(totalMillis / 60000L).cast("long")
    val s  = floor((totalMillis % 60000L) / 1000L).cast("long")
    val ms = totalMillis % 1000L
    // format_string renders a NULL %d arg as the string "null", so the
    // null input case must short-circuit explicitly.
    when(seconds.isNull, lit(""))
      .otherwise(format_string("%d:%02d.%03d", m, s, ms))
  }

  /** P11 — axis-label formatter: "M:SS.cc" (centiseconds, truncating),
    * NULL/NaN → "". Ref: /root/reference/classes.py:38-44. */
  def formatAxisSeconds(seconds: Column): Column = {
    val totalCentis = floor(seconds * 100).cast("long")
    val m = floor(totalCentis / 6000L).cast("long")
    val s = floor((totalCentis % 6000L) / 100L).cast("long")
    val c = totalCentis % 100L
    when(seconds.isNull || isnan(seconds), lit(""))
      .otherwise(format_string("%d:%02d.%02d", m, s, c))
  }

  /** P12 — `str.capitalize()`: first char upper, rest lower.
    * Ref: /root/reference/src/session_object.py:279-280. */
  def capitalize(c: Column): Column =
    concat(upper(substring(c, 1, 1)), lower(substring(c, 2, 1000000)))

  /** P13 — tire age: `lap_number - lap_start + tyre_age_at_start`,
    * NULL when the lap is outside its stint or age is NULL (the
    * canonical v2 semantics; the v1 positional loop P14 diverges and
    * is pinned by test only). Ref: /root/reference/src/session_object.py:69-70. */
  def tireAge(lapNumber: Column, lapStart: Column, lapEnd: Column,
              tyreAgeAtStart: Column): Column =
    when(lapNumber.between(lapStart, lapEnd),
      lapNumber - lapStart + tyreAgeAtStart)

  /** F1 — drop pit-out laps (NULL counts as not-pit-out). Spelled as
    * a disjunction, not `!coalesce(x, false)`: IS NULL OR = false
    * translates to a parquet source filter and pushes to the scan,
    * while the coalesce form is held above it and reads every row
    * (caught by PlanLintSpec). Ref: /root/reference/src/data_processing.py:281. */
  def notPitOut(isPitOut: Column): Column =
    isPitOut.isNull || isPitOut === lit(false)

  /** F5 — inclusive time-range mask; pushes to parquet row-group
    * stats. Ref: /root/reference/src/session_object.py:93-95. */
  def inTimeRange(ts: Column, start: Column, end: Column): Column =
    ts.between(start, end)
}
