package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Morton (Z-order) interleave of two pre-quantized non-negative
    * columns: x occupies even bits, y odd bits — so y's top bit is the
    * most significant. Pure builtin bit math, codegen-friendly. */
  def zorderValue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(call_function("shiftleft",
          shiftright(x, i).bitwiseAND(lit(1L)), lit(2 * i)))
        .bitwiseOR(call_function("shiftleft",
          shiftright(y, i).bitwiseAND(lit(1L)), lit(2 * i + 1)))
    }
  }

  /** Z-order-clustered parquet write: quantize both columns to `bits`
    * over their observed [min, max] (one bounded 4-value agg collect —
    * the same control-plane stats pass a table OPTIMIZE does),
    * interleave into a Morton value, range-partition into `numFiles`
    * and sort within each. Every output file then covers a narrow
    * rectangle in (xCol, yCol) space, so min/max file- and row-group
    * stats prune scans filtered on EITHER column — the layout that
    * keeps multi-dimension point/range lookups off a 100 TB full scan
    * when directory partitioning can only serve one key. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    bits: Int = 16, numFiles: Int = 8): Unit = {
    val Array(stats) = df.agg(
      min(col(xCol)).cast("double").as("xmin"),
      max(col(xCol)).cast("double").as("xmax"),
      min(col(yCol)).cast("double").as("ymin"),
      max(col(yCol)).cast("double").as("ymax")).collect()
    if (stats.anyNull) { // empty or all-NULL keys: nothing to cluster
      df.write.mode("overwrite").parquet(path)
      return
    }
    val (xmin, xmax) = (stats.getDouble(0), stats.getDouble(1))
    val (ymin, ymax) = (stats.getDouble(2), stats.getDouble(3))
    val scale = (1L << bits) - 1
    def quant(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit(scale), greatest(lit(0L),
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(scale.toDouble))
          .cast("long")))
    val z = zorderValue2(
      quant(col(xCol), xmin, xmax), quant(col(yCol), ymin, ymax), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Parquet footer inventory — the layout-observability face of the
    * module: one row per (file, row group) with its row count and
    * leaf-column-chunk count, read straight from the footers. At
    * 100 TB this manifest job is how a pipeline audits its own
    * layout (row groups per file, rows per row group — the knobs
    * `maxPartitionBytes` and partition pruning actually see) without
    * scanning a byte of data. Footer reads DISTRIBUTE: the file list
    * is a Dataset and each task opens only its own footers — a
    * driver-side loop over a million files is the anti-pattern this
    * shape avoids. Accepts a single parquet file or a directory of
    * part files. */
  def parquetLayout(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val f = new java.io.File(path)
    val files: Seq[String] =
      if (f.isDirectory)
        f.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(_.getAbsolutePath).toSeq.sorted
      else Seq(f.getAbsolutePath)
    spark.createDataset(files)
      .repartition(math.min(files.size,
        spark.sparkContext.defaultParallelism))
      .flatMap { p =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(p), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          r.getFooter.getBlocks.asScala.toSeq.zipWithIndex.map {
            case (b, i) =>
              (p.substring(p.lastIndexOf('/') + 1), i.toLong,
                b.getRowCount, b.getColumns.size.toLong)
          }
        } finally r.close()
      }
      .toDF("file_name", "row_group_id", "n_rows", "n_columns")
  }
}
