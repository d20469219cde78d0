package graft

import org.apache.spark.sql.functions._

/** AutoMaintain RATIO TUNING sweep — the evidence behind the default
  * `ratio = 3.0` in [[graft.ext.StoreMaintenance.AutoMaintain]]:
  *
  *   run_main.sh graft.RatioSweep <sfDir> [ratios] [waves]
  *
  * For each ratio (default 2,3,5,8 plus an unmaintained `inf` arm):
  * build the BM25 store on wave 0 of `waves` corpus slices, enable
  * generation chains, then fold the remaining waves with an explicit
  * maintenance tick after each (the exact append-then-tick sequence
  * the in-band `autoMaintain` knob runs, timed separately so the
  * sweep can attribute cost). Prints ONE JSON line per ratio:
  *
  *   ratio          the trigger threshold (live files vs ideal)
  *   ticks_fired    how many of the ticks actually compacted
  *   live_files     postings artifact's live file count at the end
  *   ideal_files    one per populated bucket dir (the fresh bound)
  *   append_sec     Σ wall of the appends alone
  *   maint_sec      Σ wall of the ticks (compaction + vacuum + no-ops)
  *   query_sec      the 20-probe query face, warm-then-timed
  *
  * The trade the sweep prices: a LOW ratio compacts often (high
  * maint_sec, file count hugs ideal), a HIGH ratio defers (low
  * maint_sec, query face pays the small-files tax the SlowFs model
  * prices per open). The default should sit where query_sec is
  * indistinguishable from fresh while maint_sec stays a small
  * fraction of append_sec — BASELINE.md records the table. */
object RatioSweep {

  private def deleteTree(p: String): Unit = {
    val root = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(root)) {
      val it = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      } finally it.close()
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val ratios: Seq[Option[Double]] =
      (if (args.length > 1) args(1).split(",").toSeq
       else Seq("2", "3", "5", "8", "inf"))
        .map(r => if (r == "inf") None else Some(r.toDouble))
    val waves = if (args.length > 2) args(2).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tail = dir.split('/').filter(_.nonEmpty).last
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").localCheckpoint()
    val corpus = docs.filter(col("doc_id") >= 20)
    val probes = docs.filter(col("doc_id") < 20)
      .select(col("doc_id").as("query_id"),
        slice(graft.ext.TextOps.tokens(col("text")), 1, 3).as("terms"))
      .localCheckpoint()

    def wall[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    ratios.foreach { ratio =>
      val rTag = ratio.map(_.toString.replace('.', '_')).getOrElse("inf")
      val path = s"/tmp/graft_ristore_ratio_${rTag}_$tail"
      deleteTree(path)
      graft.ext.RetrievalIndexStore.build(
        corpus.filter(pmod(col("doc_id"), lit(waves)) === 0),
        "doc_id", "text", path)
      graft.ext.StoreMaintenance.enableStoreGenerations("retrieval", path)
      var appendSec = 0.0
      var maintSec = 0.0
      var fired = 0
      (1 until waves).foreach { k =>
        val (_, a) = wall(graft.ext.RetrievalIndexStore.append(
          corpus.filter(pmod(col("doc_id"), lit(waves)) === k),
          "doc_id", "text", path))
        appendSec += a
        ratio.foreach { r =>
          val (reports, m) = wall(
            graft.ext.StoreMaintenance.maintainIfNeeded(spark,
              graft.ext.StoreMaintenance.artifactsOf("retrieval", path),
              graft.ext.StoreMaintenance.AutoMaintain(ratio = r)))
          maintSec += m
          fired += reports.size
        }
      }
      val postings = s"$path/postings.parquet"
      val live = graft.ext.StoreGenerations.currentFiles(postings).get
      val ideal = live
        .map(p => p.substring(0, p.lastIndexOf('/'))).distinct.length
      def query() = graft.ext.RetrievalIndexStore.query(spark, path,
        probes, "query_id", "terms", k = 5)
      query().write.format("noop").mode("overwrite").save() // warm
      val (_, qSec) = wall(
        query().write.format("noop").mode("overwrite").save())
      println(f"""{"ratio":"$rTag","ticks_fired":$fired,""" +
        f""""live_files":${live.length},"ideal_files":$ideal,""" +
        f""""append_sec":$appendSec%.2f,"maint_sec":$maintSec%.2f,""" +
        f""""query_sec":$qSec%.2f,"waves":$waves,"sf":"$dir"}""")
    }
    spark.stop()
  }
}
