package graft

import org.apache.spark.sql.functions._

/** Re-price the fragmented-vs-compacted store query face under
  * OBJECT-STORE open costs ([[graft.sources.SlowFs]] — measured
  * injection, not an arithmetic model):
  *
  *   run_main.sh graft.ObjectStoreModel <sfDir> [delayMs...]
  *
  * Stages (exists-checked, ScaleBench's own staging) the 16-wave
  * fragmented BM25 store and its compacted twin over `sfDir`, then
  * times the SAME fixed 20-probe query batch against each store at
  * per-file-open delays of 0 (local baseline) and each `delayMs`
  * (default 2 and 10 — the bracket of typical object-store first-byte
  * GET latency), reading through `slowfs:` so every parquet open
  * pays the configured cost. Prints one JSON line per (store, delay)
  * with the store's live file count and the wall seconds — the
  * numbers BASELINE.md's frag/defrag table quotes in its
  * object-store column. */
object ObjectStoreModel {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ObjectStoreModel <sfDir> [delayMs...]")
    val sfDir = args(0)
    val delays = if (args.length > 1) args.drop(1).map(_.toLong).toSeq
                 else Seq(2L, 10L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.slowfs.impl", classOf[graft.sources.SlowFs].getName)
    // fresh fs instances per conf, so a delay change actually lands
    hc.setBoolean("fs.slowfs.impl.disable.cache", true)

    val tail = sfDir.split('/').filter(_.nonEmpty).last
    val frag = s"/tmp/graft_ristore_frag_scale_$tail"
    val defrag = s"/tmp/graft_ristore_defrag_scale_$tail"
    // stage both stores (idempotent; the staging query warms them)
    ScaleBench.bm25FragQuery(spark, sfDir, frag, compact = false).collect()
    ScaleBench.bm25FragQuery(spark, sfDir, defrag, compact = true).collect()

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    val probes = docs.filter(col("doc_id") < 20)
      .select(col("doc_id").as("query_id"),
        slice(graft.ext.TextOps.tokens(col("text")), 1, 3).as("terms"))
      .localCheckpoint()

    for (delay <- 0L +: delays; (name, path) <- Seq(("frag", frag),
        ("defrag", defrag))) {
      hc.setLong("fs.slowfs.open.delay.ms", delay)
      val p = if (delay == 0L) path else s"slowfs:$path"
      val nFiles = graft.sources.Layout.listParquet(path).length
      // warm once (footer/plan caches), then time
      graft.ext.RetrievalIndexStore.query(spark, p, probes,
        "query_id", "terms", k = 5).collect()
      val t0 = System.nanoTime()
      val n = graft.ext.RetrievalIndexStore.query(spark, p, probes,
        "query_id", "terms", k = 5).collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"store":"$name","delay_ms":$delay,"n_files":$nFiles,""" +
        f""""rows":$n,"sec":$sec%.2f}""")
    }
    spark.stop()
  }
}
