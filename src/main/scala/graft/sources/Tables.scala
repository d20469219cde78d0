package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
  /** `events.ts` is INT64 TIMESTAMP(NANOS) in the fixture parquet,
    * which Spark 4 refuses to read as TimestampType; read it as the
    * raw nanos long (legacy conf) and truncate to micros — integer
    * `DIV` (nanos exceed double's 53-bit mantissa; a float division
    * would corrupt timestamps), matching DuckDB's own ns→µs read. */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
