package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of joins (SURVEY.md §2.4 J3/J4) re-expressed Spark-first.
  *
  * Spark has no built-in as-of join, so we lower it to a
  * union + ordered window: tag both sides, union them, and within each
  * `by` group carry the nearest right-side row to every left row with
  * `last(_, ignoreNulls)` / `first(_, ignoreNulls)` over an ordering
  * on the as-of key. One shuffle (hash on `by`), one sort — the same
  * cost profile as a sort-merge join, and it scales horizontally with
  * the number of `by` groups (driver_number here; at 100 TB the `by`
  * key keeps every partition independent; no broadcast, no skew
  * amplification beyond what the grouping key itself has). `by` must
  * be non-empty: an empty partition spec would funnel both inputs
  * through a single task — a global as-of needs an explicit constant
  * key and a conscious decision that the data fits one partition.
  *
  * Semantics pinned to pandas `merge_asof` (the reference's engine):
  *   - backward: right row with the greatest `on` <= left `on`
  *     (exact matches allowed). Ref: /root/reference/src/session_object.py:62-63.
  *   - forward: least `on` >= left `on`.
  *   - nearest: smaller |Δon| wins; EQUIDISTANT → the backward (prior)
  *     row wins, matching pandas. Ref: /root/reference/src/session_object.py:240-250.
  *
  * The as-of key may be named differently on each side (pandas
  * `left_on`/`right_on` — the reference joins laps.lap_number against
  * stints.lap_start, /root/reference/src/session_object.py:62-63).
  * Right-side columns that collide with left-side names get `rsuffix`.
  */
object AsOfJoin {

  private val ON   = "__asof_on"
  private val TAG  = "__asof_tag"
  private val TB   = "__asof_tb"
  private val LROW = "__asof_l"
  private val RROW = "__asof_r"

  def backward(left: DataFrame, right: DataFrame, on: String,
               by: Seq[String], rsuffix: String = "_right",
               tiebreak: Option[String] = None): DataFrame =
    asof(left, right, on, on, by, "backward", rsuffix, tiebreak)

  def backwardOn(left: DataFrame, right: DataFrame, leftOn: String,
                 rightOn: String, by: Seq[String], rsuffix: String = "_right",
                 tiebreak: Option[String] = None): DataFrame =
    asof(left, right, leftOn, rightOn, by, "backward", rsuffix, tiebreak)

  def forward(left: DataFrame, right: DataFrame, on: String,
              by: Seq[String], rsuffix: String = "_right",
              tiebreak: Option[String] = None): DataFrame =
    asof(left, right, on, on, by, "forward", rsuffix, tiebreak)

  def nearest(left: DataFrame, right: DataFrame, on: String,
              by: Seq[String], rsuffix: String = "_right",
              tiebreak: Option[String] = None): DataFrame =
    asof(left, right, on, on, by, "nearest", rsuffix, tiebreak)

  /** `tiebreak` disambiguates duplicate right-side `on` values (pandas
    * resolves them positionally, which has no distributed meaning):
    * among equal-`on` right rows, backward takes the row with the
    * GREATEST tiebreak, forward the LEAST — i.e. the positional
    * behavior when the right side is ordered by the tiebreak column.
    *
    * `allowExactMatches=false` makes backward strictly `<` and forward
    * strictly `>` (pandas allow_exact_matches); `tolerance` (in the
    * key's comparison domain — micros for timestamps) null-pads any
    * match farther than the given distance (pandas tolerance). Both
    * are pure ordering/projection changes — the plan stays one
    * shuffle + one window. */
  def asof(left: DataFrame, right: DataFrame, leftOn: String, rightOn: String,
           by: Seq[String], direction: String, rsuffix: String = "_right",
           tiebreak: Option[String] = None,
           allowExactMatches: Boolean = true,
           tolerance: Option[Double] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown as-of direction: $direction")
    require(by.nonEmpty,
      "asof: `by` must be non-empty — an empty partition spec would run " +
      "both inputs through one task; add a constant key column for a " +
      "deliberately-global (single-partition) as-of")

    val leftCols  = left.columns.toSeq
    // Right payload keeps its own `on` key (needed for nearest's |Δ|)
    // but not the `by` keys (equal by construction).
    val rightPayloadCols = right.columns.toSeq.filterNot(by.contains)
    val lSchema = StructType(left.schema.fields)
    val rSchema = StructType(right.schema.filter(f => rightPayloadCols.contains(f.name)))

    // Sort-tag geometry: left sorts at 1. A right row visible to the
    // BACKWARD frame (unboundedPreceding → current) at EQUAL `on` must
    // sort before the left row (tag 0); excluded-at-equal (strict, the
    // pandas allow_exact_matches=False) means sorting it after (tag 2).
    // Forward is the mirror image. A separate MARK distinguishes the
    // two right copies in the nearest case, where sort tags flip with
    // exactness but identity must not.
    val MARK = "__asof_mark"
    val bTag = if (allowExactMatches) 0 else 2
    val fTag = if (allowExactMatches) 2 else 0
    val tb: DataFrame => Column = df => tiebreak.map(df(_)).getOrElse(lit(0))
    val lTagged = left.select(
      by.map(col) ++ Seq(
        col(leftOn).as(ON), lit(1).as(TAG), lit(null).cast("string").as(MARK),
        lit(null).cast("double").as(TB),
        struct(leftCols.map(col): _*).as(LROW),
        lit(null).cast(rSchema).as(RROW)): _*)
    def rTagged(tag: Int, mark: String) = right.select(
      by.map(col) ++ Seq(
        col(rightOn).as(ON), lit(tag).as(TAG), lit(mark).as(MARK),
        tb(right).cast("double").as(TB),
        lit(null).cast(lSchema).as(LROW),
        struct(rightPayloadCols.map(col): _*).as(RROW)): _*)

    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col(ON).asc, col(TAG).asc, col(TB).asc_nulls_first)
    val wB = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    // comparison domain for |Δon|: micros (exact long) for timestamps,
    // long for integral keys, double for fractional keys — a long cast
    // would TRUNCATE fractional keys and pick the wrong side.
    val toNum: Column => Column = left.schema(leftOn).dataType match {
      case TimestampType => unix_micros _
      case DateType      => unix_date(_).cast("long") // DATE can't cast to BIGINT
      case ByteType | ShortType | IntegerType | LongType => _.cast("long")
      case _ => _.cast("double")
    }

    val matched: DataFrame = direction match {
      case "backward" =>
        lTagged.unionByName(rTagged(bTag, "b"))
          .withColumn(RROW, last(col(RROW), ignoreNulls = true).over(wB))
      case "forward" =>
        lTagged.unionByName(rTagged(fTag, "f"))
          .withColumn(RROW, first(col(RROW), ignoreNulls = true).over(wF))
      case "nearest" =>
        // Duplicate the right side so one copy is visible backward and
        // one forward, then arbitrate by |Δon| with prior-wins ties.
        val both = lTagged.unionByName(rTagged(bTag, "b")).unionByName(rTagged(fTag, "f"))
        val bwd = last(when(col(MARK) === "b", col(RROW)), ignoreNulls = true).over(wB)
        val fwd = first(when(col(MARK) === "f", col(RROW)), ignoreNulls = true).over(wF)
        val dB = toNum(col(ON)) - toNum(col("__b")(rightOn))
        val dF = toNum(col("__f")(rightOn)) - toNum(col(ON))
        both
          .withColumn("__b", bwd).withColumn("__f", fwd)
          .withColumn(RROW,
            when(col("__b").isNull, col("__f"))
              .when(col("__f").isNull, col("__b"))
              .when(dB <= dF, col("__b"))
              .otherwise(col("__f")))
          .drop("__b", "__f")
    }

    // pandas tolerance: null-pad matches farther than `tolerance` in
    // the comparison domain (micros for timestamps)
    val bounded = tolerance match {
      case Some(tol) =>
        val d = abs(toNum(col(ON)) - toNum(col(RROW)(rightOn)))
        matched.withColumn(RROW, when(col(RROW).isNotNull && d <= tol, col(RROW)))
      case None => matched
    }

    val leftOnly = bounded.filter(col(TAG) === 1)
    val takenLeft = leftCols.map(c => col(LROW)(c).as(c))
    val takenRight = rightPayloadCols.map { c =>
      val name = if (leftCols.contains(c)) c + rsuffix else c
      col(RROW)(c).as(name)
    }
    leftOnly.select(takenLeft ++ takenRight: _*)
  }

  /** J2 — interval (range) join: left rows matched to right rows whose
    * `[loCol, hiCol]` range contains `valueCol`, equi on `by`. The
    * right side (stints: ~5 rows/driver) is broadcast so the range
    * predicate never degenerates into a shuffled nested-loop join at
    * scale. Ref: /root/reference/src/data_processing.py:144-183. */
  def intervalJoin(left: DataFrame, right: DataFrame, by: Seq[String],
                   valueCol: String, loCol: String, hiCol: String,
                   broadcastRight: Boolean = true): DataFrame = {
    val r = if (broadcastRight) broadcast(right) else right
    val cond = by.map(k => left(k) === r(k))
      .reduceOption(_ && _).map(_ && left(valueCol).between(r(loCol), r(hiCol)))
      .getOrElse(left(valueCol).between(r(loCol), r(hiCol)))
    val dupDropped = by.foldLeft(left.join(r, cond, "left")) { (df, k) => df.drop(r(k)) }
    dupDropped
  }

  /** J2 without broadcast — the interval-join shape that survives an
    * interval table too large for `broadcast()`: quantize the value
    * domain into `binWidth`-wide bins, replicate each `[lo, hi]`
    * interval into every bin it overlaps (`sequence` + `explode`), and
    * equi-join on the bin key before re-checking exact containment.
    * Both sides shuffle-partition on `__bin`, so the physical plan is a
    * plain hash join — never the nested-loop a bare BETWEEN forces when
    * neither side broadcasts. Inner-join semantics (unmatched left rows
    * drop). Replication per interval = ceil(width / binWidth) + 1:
    * choose binWidth near the median interval width.
    * Ref: /root/reference/src/data_processing.py:144-183 (lap↔stint
    * containment), re-shaped for the 100 TB case. */
  def binnedIntervalJoin(left: DataFrame, right: DataFrame, valueCol: String,
                         loCol: String, hiCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // the bin key must not collide with a user column on either side
    val taken = (left.columns ++ right.columns).toSet
    val bin = Iterator.from(0)
      .map(i => if (i == 0) "__bin" else s"__bin$i").find(!taken(_)).get
    // an inverted interval (lo > hi) is empty under BETWEEN, but
    // sequence() would expand it with step -1 and replicate it into
    // bins it doesn't cover — drop such rows before binning
    val binned = right.where(col(loCol) <= col(hiCol)).withColumn(bin,
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    left.withColumn(bin, floor(col(valueCol) / binWidth).cast("long"))
      .join(binned, Seq(bin))
      .where(col(valueCol).between(col(loCol), col(hiCol)))
      .drop(bin)
  }

  /** Interval OVERLAP join — both sides are `[lo, hi]` ranges (closed;
    * a pair matches iff `loL <= hiR AND loR <= hiL`), equi on `by`.
    * The interval–interval generalization of [[binnedIntervalJoin]]:
    * Spark's only native plans for this predicate are a broadcast
    * nested loop or a full cartesian — neither survives two large
    * sides. Both sides replicate into every `binWidth`-wide bin they
    * cover (`sequence` + `explode`) and equi-join on `(by, bin)`, so
    * the physical plan is a plain shuffled hash/sort-merge join.
    *
    * A matching pair shares every bin in the overlap region — instead
    * of a distinct over the (wide) output, each pair is counted ONLY
    * in the overlap's FIRST bin (`bin == greatest(floor(loL/w),
    * floor(loR/w))`, which both sides cover whenever they overlap at
    * all): exactly-once without any dedup shuffle, the same trick the
    * banded-signature joins use for band collisions. Inverted
    * intervals (lo > hi — empty under the closed semantics) drop
    * before binning, as in [[binnedIntervalJoin]]. Replication per
    * row = ceil(width / binWidth) + 1: choose binWidth near the
    * median interval width. Right-side name collisions get `rsuffix`. */
  def overlapJoin(left: DataFrame, right: DataFrame, by: Seq[String],
                  loL: String, hiL: String, loR: String, hiR: String,
                  binWidth: Double, rsuffix: String = "_right"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val taken = (left.columns ++ right.columns).toSet
    val bin = Iterator.from(0)
      .map(i => if (i == 0) "__bin" else s"__bin$i").find(!taken(_)).get
    val leftCols = left.columns.toSet
    val r0 = right.columns.foldLeft(right) { (df, c) =>
      if (leftCols.contains(c) && !by.contains(c))
        df.withColumnRenamed(c, c + rsuffix) else df
    }
    val (loR2, hiR2) =
      (if (leftCols.contains(loR) && !by.contains(loR)) loR + rsuffix else loR,
        if (leftCols.contains(hiR) && !by.contains(hiR)) hiR + rsuffix else hiR)
    def binned(df: DataFrame, lo: String, hi: String) =
      df.where(col(lo) <= col(hi)).withColumn(bin,
        explode(sequence(
          floor(col(lo) / binWidth).cast("long"),
          floor(col(hi) / binWidth).cast("long"))))
    binned(left, loL, hiL)
      .join(binned(r0, loR2, hiR2), by :+ bin)
      .where(col(loL) <= col(hiR2) && col(loR2) <= col(hiL) &&
        col(bin) === greatest(
          floor(col(loL) / binWidth).cast("long"),
          floor(col(loR2) / binWidth).cast("long")))
      .drop(bin)
  }
}
