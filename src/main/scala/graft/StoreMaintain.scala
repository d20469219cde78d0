package graft

import graft.ext.StoreMaintenance

/** Operational CLI for the store-maintenance path — the entry point a
  * deployment's scheduler invokes on its compaction cadence (the
  * batch sibling of the merge sink's `maintainEvery` knob):
  *
  *   run_main.sh graft.StoreMaintain audit     <artifactDir>...
  *   run_main.sh graft.StoreMaintain sig       <storePath>
  *   run_main.sh graft.StoreMaintain vector    <storePath>
  *   run_main.sh graft.StoreMaintain retrieval <storePath>
  *   run_main.sh graft.StoreMaintain release   <storePath>
  *
  * `audit` prints the footer-only health inventory (zero data read —
  * the WHEN); the store kinds run the corresponding compaction (the
  * crash-recoverable swap; re-running after any kill is the repair)
  * and print one JSON line per artifact with the before/after
  * arithmetic plus the wall seconds — the line an operator's log
  * retention actually wants. */
object StoreMaintain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: StoreMaintain <audit|sig|vector|retrieval|release> <path>...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args(0) match {
      case "audit" =>
        StoreMaintenance.auditArtifacts(spark, args.drop(1).toSeq)
          .collect().foreach { r =>
            println(s"""{"artifact":"${r.getString(0)}","n_files":${r.getLong(1)},""" +
              s""""bytes":${r.getLong(2)},"rows":${r.getLong(3)},""" +
              s""""bytes_per_file":${r.getLong(4)}}""")
          }
      case kind =>
        val path = args(1)
        val t0 = System.nanoTime()
        val reports = kind match {
          case "sig"       => StoreMaintenance.compactSignatureStore(spark, path)
          case "vector"    => StoreMaintenance.compactVectorIndexStore(spark, path)
          case "retrieval" => StoreMaintenance.compactRetrievalIndexStore(spark, path)
          case "release"   => StoreMaintenance.compactReleaseStore(spark, path)
          case other => sys.error(s"unknown store kind: $other")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        reports.foreach { r =>
          println(s"""{"artifact":"${r.artifact}","files_before":${r.filesBefore},""" +
            s""""files_after":${r.filesAfter},"rows_before":${r.rowsBefore},""" +
            s""""rows_after":${r.rowsAfter}}""")
        }
        println(f"""{"kind":"$kind","path":"$path","sec":$sec%.2f}""")
    }
    spark.stop()
  }
}
