package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main: measures the FIXED machinery floor of a
  * Structured Streaming gate query — the cost that remains when the
  * data is ~nothing (128 rows), i.e. file-source listing + query
  * start/stop + per-shuffle-partition RocksDB state-store setup +
  * memory-sink teardown. The round-9/10 verdicts flagged this floor
  * as unmeasured (finding W4): the 15 `q_stream_*` gate queries each
  * pay it on top of their real work, and without a number the
  * per-query bench rows over-attribute machinery cost to operators.
  *
  * Three shapes, isolating the state-store term:
  *  - `pass`: stateless projection (NO state stores — floor is
  *    start/stop + listing + sink only);
  *  - `agg`: watermarked tumbling count (1 store per shuffle
  *    partition);
  *  - `join`: watermarked stream-stream inner join (4 stores per
  *    shuffle partition — two sides × two key spaces).
  * The stateful shapes run at 1 / 8 / 32 shuffle partitions: the
  * slope over partition count IS the per-store setup cost, and the
  * gap between `pass` and `agg@8` is what the gate's sizing (8
  * partitions, StarQueries.withStreamShuffle) pays for state at all.
  *
  * Each cell reports the min of 3 runs (the floor, not the variance).
  * Run: `sbt "runMain graft.queries.StreamFloor"`. Results belong in
  * BASELINE.md's streaming-floor note, re-measure on env change.
  */
object StreamFloor {

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def timeStream(spark: SparkSession, batch: DataFrame, n: Int,
                         mode: String)(mk: (() => DataFrame) => DataFrame)
      : Double = {
    val staged = java.nio.file.Files.createTempDirectory("stream_floor")
    try {
      batch.write.mode("overwrite").parquet(staged.toString)
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", RocksProvider)
      try {
        val name = s"floor_${System.nanoTime()}"
        def source() =
          spark.readStream.schema(batch.schema).parquet(staged.toString)
        val t0 = System.nanoTime()
        val q = mk(source _).writeStream.format("memory")
          .queryName(name).outputMode(mode).start()
        try q.processAllAvailable()
        finally q.stop()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.dropTempView(name)
        dt
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(staged).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val tiny = (0 until 128).map(i =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + i * 60000L),
          (i % 7).toLong, s"t${i % 3}"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .coalesce(1).localCheckpoint()

    def best(reps: Int)(run: => Double): Double =
      (1 to reps).map(_ => run).min

    def pass(n: Int): Double =
      timeStream(spark, tiny, n, "append")(src =>
        src().select(col("event_id"), col("event_type")))
    def agg(n: Int): Double =
      timeStream(spark, tiny, n, "complete")(src =>
        src().withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n")))
    def join(n: Int): Double =
      timeStream(spark, tiny, n, "append") { src =>
        val a = src().withWatermark("ts", "1 hour")
        val b = src().select(col("event_id").as("eid2"),
          col("ts").as("ts2")).withWatermark("ts2", "1 hour")
        a.join(b, col("event_id") === col("eid2") &&
          col("ts2").between(col("ts"), col("ts") + expr("interval 1 hour")))
      }

    // one warm-up of each shape so JIT/classloading lands outside the
    // measured floor (the gate suite is warm too)
    pass(8); agg(8); join(8)
    val rows = Seq(
      ("pass", 8, best(3)(pass(8))),
      ("agg", 1, best(3)(agg(1))),
      ("agg", 8, best(3)(agg(8))),
      ("agg", 32, best(3)(agg(32))),
      ("join", 1, best(3)(join(1))),
      ("join", 8, best(3)(join(8))),
      ("join", 32, best(3)(join(32))))
    rows.foreach { case (shape, n, s) =>
      println(f"floor shape=$shape%-4s parts=$n%-2d min_sec=$s%.2f")
    }
    spark.stop()
  }
}
