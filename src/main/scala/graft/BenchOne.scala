package graft

/** Local micro-bench: time named queries (one untimed warmup, then
  * `reps` timed runs through the noop sink). The iteration loop for
  * plan work — Bench stays the driver's full-surface timing.
  *
  * Usage: runMain graft.BenchOne <sfDir> <name[,name...]> [reps]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      // lower median for even rep counts (times((reps)/2) would label
      // the upper element — for reps=2, the MAX — as the median)
      println(f"[benchone] $n%s: min=${times.head}%.3f med=${times((reps - 1) / 2)}%.3f max=${times.last}%.3f")
    }
    spark.stop()
  }
}
