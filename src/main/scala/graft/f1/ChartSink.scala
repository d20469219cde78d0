package graft.f1

import java.util.Locale

import org.apache.spark.sql.{DataFrame, Row}

import graft.catalyst.FormatLapTime

/** Render-side consumer for the chart-ready frames — the executable
  * analogue of the reference's matplotlib figures
  * (/root/reference/src/data_visualization.py:1-59,
  * /root/reference/src/session_object.py:259-311) as deterministic
  * standalone SVG. The DATA work (grid ordering, bar colors, label
  * formatting, phase assignment) all happens in the distributed plan
  * that produces [[F1Session.comparisonFrame]] / lap telemetry; this
  * sink only places already-computed values on a canvas. It collects —
  * deliberately and safely: a comparison frame is one session's grid
  * (≤ bars-per-session rows) and a telemetry frame is one lap, the
  * same bounded data the reference hands to matplotlib. Rendering is
  * bit-deterministic (Locale.ROOT numeric formatting, no timestamps,
  * no RNG), so goldens pin it.
  */
object ChartSink {

  private val W = 960
  private val H = 320
  private val MarginL = 60
  private val MarginR = 12
  private val MarginT = 34
  private val MarginB = 58

  private def fmt(v: Double): String = String.format(Locale.ROOT, "%.2f", v)
  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Bar chart over a `comparisonFrame`: one bar per driver in
    * bar_order, compound color fill, lap-time annotation, compound
    * label, driver-colored tick, and (qualifying) the Q3/Q2/Q1 bands
    * with dashed separators after P10 and P15 — the reference chart's
    * fixed 9.5/14.5 boundaries. */
  def comparisonSvg(frame: DataFrame, title: String,
                    qualifying: Boolean = false): String = {
    val rows = frame
      .select("bar_order", "name_acronym", "actual_lap_time",
        "lap_time_label", "compound_label", "bar_color", "driver_color")
      .orderBy("bar_order")
      .collect()
    require(rows.nonEmpty, "comparison frame is empty")

    val times = rows.map(_.getDouble(2))
    // reference ylim: first bar * 0.95 .. last bar * 1.05
    val yMin = times.head * 0.95
    val yMax = times.last * 1.05
    val plotW = W - MarginL - MarginR
    val plotH = H - MarginT - MarginB
    val n = rows.length
    val slot = plotW.toDouble / n
    val barW = slot * 0.8
    def yPix(v: Double): Double =
      MarginT + (yMax - v) / (yMax - yMin) * plotH
    def xPix(i: Int): Double = MarginL + i * slot + (slot - barW) / 2

    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" font-family="sans-serif">"""
    sb ++= s"""<title>${esc(title)}</title>"""
    sb ++= s"""<text x="${W / 2}" y="18" text-anchor="middle" font-size="14">${esc(title)}</text>"""

    if (qualifying) {
      // shaded phase spans in bar-index space, like the reference's
      // axvspan(start-0.5, end-0.5): Q3 first 10 bars, Q2 next 5, Q1 rest
      val bands = Seq((0, 10, "Q3", "#636363"), (10, 15, "Q2", "#222222"),
        (15, 20, "Q1", "#000000"))
      for ((s, e, label, color) <- bands if s < n) {
        val x0 = MarginL + s * slot
        val x1 = MarginL + math.min(e, n) * slot
        sb ++= s"""<rect class="band" x="${fmt(x0)}" y="$MarginT" width="${fmt(x1 - x0)}" height="$plotH" fill="$color" fill-opacity="0.3"/>"""
        sb ++= s"""<text x="${fmt((x0 + x1) / 2)}" y="${MarginT + 12}" text-anchor="middle" font-size="12" fill="#ffffff">$label</text>"""
      }
      for (b <- Seq(10, 15) if b < n) {
        val x = MarginL + b * slot
        sb ++= s"""<line x1="${fmt(x)}" y1="$MarginT" x2="${fmt(x)}" y2="${MarginT + plotH}" stroke="#000000" stroke-width="0.75" stroke-dasharray="4 3"/>"""
      }
    }

    // y axis: 5 ticks, lap-time formatted like the reference's axis
    for (t <- 0 to 4) {
      val v = yMin + (yMax - yMin) * t / 4
      val y = yPix(v)
      sb ++= s"""<line x1="${MarginL - 4}" y1="${fmt(y)}" x2="$MarginL" y2="${fmt(y)}" stroke="#000000"/>"""
      sb ++= s"""<text x="${MarginL - 8}" y="${fmt(y + 4)}" text-anchor="end" font-size="9">${FormatLapTime.format(v)}</text>"""
    }

    rows.zipWithIndex.foreach { case (r, i) =>
      val v = r.getDouble(2)
      val x = xPix(i)
      val yTop = yPix(math.min(v, yMax))
      val barColor = Option(r.getString(5)).getOrElse("#888888")
      sb ++= s"""<rect class="bar" x="${fmt(x)}" y="${fmt(yTop)}" width="${fmt(barW)}" height="${fmt(MarginT + plotH - yTop)}" fill="$barColor" stroke="#000000" stroke-width="0.5"/>"""
      // lap time above the bar, rotated like the reference annotation
      sb ++= s"""<text class="laptime" x="${fmt(x + barW / 2)}" y="${fmt(yTop - 4)}" font-size="9" text-anchor="start" transform="rotate(-90 ${fmt(x + barW / 2)} ${fmt(yTop - 4)})">${esc(r.getString(3))}</text>"""
      // compound label near the baseline
      sb ++= s"""<text class="compound" x="${fmt(x + barW / 2)}" y="${MarginT + plotH - 4}" font-size="8" text-anchor="middle">${esc(Option(r.getString(4)).getOrElse(""))}</text>"""
      // driver acronym tick, colored by driver color, rotated 45°
      val tx = x + barW / 2
      val ty = MarginT + plotH + 14
      sb ++= s"""<text class="tick" x="${fmt(tx)}" y="$ty" font-size="10" fill="${r.getString(6)}" text-anchor="end" transform="rotate(-45 ${fmt(tx)} $ty)">${esc(r.getString(1))}</text>"""
    }
    sb ++= "</svg>"
    sb.toString
  }

  /** Two stacked line panels over one lap's telemetry: speed on top,
    * throttle (green) + brake (red) below, x in seconds from lap
    * start — the reference's visualize_lap_telemetry. */
  def telemetrySvg(frame: DataFrame, title: String = "Lap telemetry"): String = {
    val rows = frame
      .select("seconds_from_lap_start", "speed", "throttle", "brake")
      .orderBy("seconds_from_lap_start")
      .collect()
    require(rows.nonEmpty, "telemetry frame is empty")

    val xs = rows.map(_.getDouble(0))
    val (x0, x1) = (xs.min, xs.max)
    val panelH = (H - MarginT - MarginB) / 2
    val plotW = W - MarginL - MarginR
    def xPix(v: Double): Double =
      MarginL + (if (x1 > x0) (v - x0) / (x1 - x0) else 0.5) * plotW

    def polyline(cls: String, color: String, top: Int, lo: Double, hi: Double,
                 value: Row => Double): String = {
      val pts = rows.map { r =>
        val y = top + (hi - value(r)) / (hi - lo) * (panelH - 8)
        s"${fmt(xPix(r.getDouble(0)))},${fmt(y)}"
      }.mkString(" ")
      s"""<polyline class="$cls" points="$pts" fill="none" stroke="$color" stroke-width="1.2"/>"""
    }

    val speeds = rows.map(_.getDouble(1))
    val speedTop = MarginT
    val pedalTop = MarginT + panelH + 8
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" font-family="sans-serif">"""
    sb ++= s"""<title>${esc(title)}</title>"""
    sb ++= s"""<text x="${W / 2}" y="18" text-anchor="middle" font-size="14">${esc(title)}</text>"""
    sb ++= s"""<text x="14" y="${speedTop + panelH / 2}" font-size="10" transform="rotate(-90 14 ${speedTop + panelH / 2})" text-anchor="middle">Vehicle Speed / km/h</text>"""
    sb ++= s"""<text x="14" y="${pedalTop + panelH / 2}" font-size="10" transform="rotate(-90 14 ${pedalTop + panelH / 2})" text-anchor="middle">Throttle and Brake / %</text>"""
    sb ++= polyline("speed", "#1f77b4", speedTop, speeds.min, math.max(speeds.max, speeds.min + 1), _.getDouble(1))
    sb ++= polyline("throttle", "#2ca02c", pedalTop, 0.0, 100.0, _.getDouble(2))
    sb ++= polyline("brake", "#d62728", pedalTop, 0.0, 100.0, _.getDouble(3))
    sb ++= "</svg>"
    sb.toString
  }

  def writeSvg(path: java.nio.file.Path, svg: String): Unit = {
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, svg)
  }
}
