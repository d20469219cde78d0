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
    * behavior when the right side is ordered by the tiebreak column. */
  def asof(left: DataFrame, right: DataFrame, leftOn: String, rightOn: String,
           by: Seq[String], direction: String, rsuffix: String = "_right",
           tiebreak: Option[String] = None): DataFrame = {
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

    // backward wants right rows visible at equal `on` in a
    // (unboundedPreceding → current) frame → right sorts first (tag 0
    // < 1); forward wants them visible in (current →
    // unboundedFollowing) → right sorts last (tag 2 > 1).
    val tb: DataFrame => Column = df => tiebreak.map(df(_)).getOrElse(lit(0))
    val lTagged = left.select(
      by.map(col) ++ Seq(
        col(leftOn).as(ON), lit(1).as(TAG), lit(null).cast("double").as(TB),
        struct(leftCols.map(col): _*).as(LROW),
        lit(null).cast(rSchema).as(RROW)): _*)
    def rTagged(tag: Int) = right.select(
      by.map(col) ++ Seq(
        col(rightOn).as(ON), lit(tag).as(TAG), tb(right).cast("double").as(TB),
        lit(null).cast(lSchema).as(LROW),
        struct(rightPayloadCols.map(col): _*).as(RROW)): _*)

    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col(ON).asc, col(TAG).asc, col(TB).asc_nulls_first)
    val wB = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val matched: DataFrame = direction match {
      case "backward" =>
        lTagged.unionByName(rTagged(0))
          .withColumn(RROW, last(col(RROW), ignoreNulls = true).over(wB))
      case "forward" =>
        lTagged.unionByName(rTagged(2))
          .withColumn(RROW, first(col(RROW), ignoreNulls = true).over(wF))
      case "nearest" =>
        // Duplicate the right side so one copy is visible backward and
        // one forward, then arbitrate by |Δon| with prior-wins ties.
        val both = lTagged.unionByName(rTagged(0)).unionByName(rTagged(2))
        val bwd = last(when(col(TAG) === 0, col(RROW)), ignoreNulls = true).over(wB)
        val fwd = first(when(col(TAG) === 2, col(RROW)), ignoreNulls = true).over(wF)
        // |Δon| in the key's native comparison domain: micros (exact
        // long) for timestamps, long for integral keys, double for
        // fractional keys — double subtraction preserves the ordering
        // of |Δ| (a long cast would TRUNCATE fractional keys and pick
        // the wrong side, e.g. left=2.6 vs right {2.0, 3.0}).
        val toNum: Column => Column = left.schema(leftOn).dataType match {
          case TimestampType => unix_micros _
          case ByteType | ShortType | IntegerType | LongType | DateType =>
            _.cast("long")
          case _ => _.cast("double")
        }
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

    val leftOnly = matched.filter(col(TAG) === 1)
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
}
