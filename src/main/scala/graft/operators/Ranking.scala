package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking / dedup / argmin operators (SURVEY.md §2.5 A1, §2.6 W1–W3).
  *
  * The reference's sort-then-drop_duplicates-keep-first idiom is
  * exactly `row_number() == 1` over an explicit ordering; we always
  * give the window deterministic tie-break keys so the result is
  * stable across partitionings (pandas keep-first depends on input
  * order; a nondeterministic Spark plan would flake the oracle —
  * SURVEY.md §7.4.3).
  */
object Ranking {

  /** W1 — keep the first row per group under `order` (pandas
    * `sort_values(...).drop_duplicates(subset, keep="first")`).
    * Ref: /root/reference/src/data_processing.py:282-284. */
  def keepFirst(df: DataFrame, partition: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** A1 — whole-row argmin per group with deterministic first-on-tie:
    * `min(struct(orderKeys..., payload))` — struct ordering is
    * lexicographic so the tie-break keys decide, and min-aggregation
    * is partial+final (map-side combine, one shuffle, no window sort).
    * Pandas `idxmin` skips NaN and drops all-NaN groups; we filter
    * nulls on the primary key ourselves. Secondary tie-break keys are
    * wrapped as (isNull, value) pairs so a NULL tie-break sorts LAST
    * (pandas/DuckDB row_number ORDER BY default), not first as raw
    * struct-min ordering would.
    * Ref: /root/reference/src/session_object.py:156-165. */
  def argminRow(df: DataFrame, groupCols: Seq[String],
                orderCols: Seq[String]): DataFrame = {
    // pandas idxmin skips NaN as well as missing values: a float NaN
    // would sort LAST in Spark (fine) but an all-NaN group must vanish
    // like an all-null one does
    val head = col(orderCols.head)
    val present = df.schema(orderCols.head).dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType => head.isNotNull && !isnan(head)
      case _ => head.isNotNull
    }
    val filtered = df.filter(present)
    val payload = struct(df.columns.map(col): _*)
    val orderKey = col(orderCols.head).as("__k0") +:
      orderCols.tail.zipWithIndex.flatMap { case (c, i) =>
        Seq(col(c).isNull.as(s"__n${i + 1}"), col(c).as(s"__k${i + 1}"))
      }
    val key = struct(orderKey :+ payload.as("__row"): _*)
    val agged = filtered.groupBy(groupCols.map(col): _*)
      .agg(min(key).as("__k"))
    agged.select(df.columns.map(c => col(s"__k.__row.$c").as(c)): _*)
  }
}
