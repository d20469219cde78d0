package graft.sources

import org.apache.spark.sql.DataFrame

/** Physical-layout helpers for the 100 TB posture (SURVEY.md §4.2):
  * partition fact tables by coarse keys (session/date) for partition
  * pruning, bucket join-heavy tables by their join key so co-located
  * joins skip the shuffle entirely, and sort within buckets on the
  * as-of key so ordered windows skip their sort.
  */
object Layout {

  /** Directory-partitioned parquet: scans with equality/range
    * predicates on `partitionCols` prune whole directories. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted managed table: two tables bucketed the same way
    * on the join key sort-merge-join with NO exchange — at 100 TB this
    * converts every laps⋈stints / laps⋈telemetry join from a full
    * shuffle into a per-bucket local merge. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }
}
