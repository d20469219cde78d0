package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided star schema (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All reads are plain
  * `spark.read.parquet` so Catalyst drives column pruning and filter
  * pushdown into the scan — at 100 TB these tables would be
  * partitioned (facts by date/orderdate) and the same code holds:
  * nothing here materializes or collects.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame    = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame    = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame  = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame    = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame  = table(spark, d, "lineitem")
  /** `events.ts` normalizes to TimestampType whatever encoding the
    * driver's fixture generation used — it has shipped BOTH:
    *  - INT64 TIMESTAMP(NANOS) (rounds ≤6), which Spark 4 refuses to
    *    read as TimestampType; read as the raw nanos long (legacy
    *    conf) and truncate to micros with integer `DIV` (nanos exceed
    *    double's 53-bit mantissa; float division would corrupt
    *    timestamps), matching DuckDB's own ns→µs read;
    *  - timestamp[us] without UTC adjustment (round 7+), which Spark
    *    reads as TIMESTAMP_NTZ — a type `unix_micros`, watermarks,
    *    and stream-stream range joins all reject. The session
    *    timezone is pinned UTC everywhere (GraftSession/TestSpark/
    *    Bench), so the NTZ→TIMESTAMP cast is value-preserving and
    *    keeps every downstream micros comparison identical to the
    *    DuckDB oracle's naive read. */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
