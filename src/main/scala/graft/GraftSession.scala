package graft

import org.apache.spark.sql.SparkSession

/** The engine's front door: a SparkSession.Builder preloaded with the
  * configuration every graft deployment wants — UTC semantics, AQE
  * (with skew-join handling) on, the nanos-as-long read shim for the
  * events fixtures, and the GraftExtensions function injector so
  * `format_lap_time` resolves from SQL without manual registration.
  * Shuffle fan-out defaults to the local core count; a cluster deploy
  * overrides it (and master) per site.
  */
object GraftSession {
  def builder(master: String = "local[*]",
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", "graft.catalyst.GraftExtensions")
      .config("spark.ui.enabled", "false")
}
