package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.concurrent.TrieMap

/** Dev tool (guide §1/§7): run one query and print every Spark JOB it
  * fires — wall time, stage/task counts, and the user-code call site —
  * so a composite (store-lifecycle) query's cost can be attributed to
  * its individual actions before optimizing any of them.
  *
  * Usage: runMain graft.JobProfile <sfDir> <name[,name...]>
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/tmp/spark-events"))
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", "/tmp/spark-events")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = TrieMap[Int, (Long, String, Int)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts(js.jobId) = (System.nanoTime(), site, js.stageInfos.map(_.numTasks).sum)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, site, tasks) =>
          val ms = (System.nanoTime() - t0) / 1e6
          rows.add(f"[job] ${je.jobId}%4d ${ms}%9.1f ms  tasks=$tasks%5d  $site%s")
        }
    })
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      // warm pass: codegen/classloading off the profile
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      rows.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give it a beat to drain before printing
      Thread.sleep(500)
      println(s"\n===== $n: ${f"$s%.2f"} s, ${rows.size} jobs =====")
      rows.forEach(r => println(r))
    }
    spark.stop()
  }
}
