package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (Test/fork gives
  * the JVM the JDK-17 add-opens from build.sbt). Config mirrors
  * Verify/Bench: UTC, small shuffle fan-out, nanos-as-long for the
  * events fixture.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.catalyst.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
