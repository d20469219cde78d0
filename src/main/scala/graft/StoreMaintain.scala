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
  *   run_main.sh graft.StoreMaintain enable    <kind> <storePath>
  *   run_main.sh graft.StoreMaintain snapshot  <kind> <storePath>
  *   run_main.sh graft.StoreMaintain fold      <kind> <storePath>
  *   run_main.sh graft.StoreMaintain vacuum    <kind> <storePath> <keepGens>
  *
  * `audit` prints the footer-only health inventory (zero data read —
  * the WHEN); the store kinds run the corresponding compaction (the
  * crash-recoverable swap; re-running after any kill is the repair)
  * and print one JSON line per artifact with the before/after
  * arithmetic plus the wall seconds — the line an operator's log
  * retention actually wants.
  *
  * Concurrency contract: on a NON-generational store the compaction
  * swap parks-and-replaces the live artifact directory, so run this
  * CLI QUIESCED — no concurrent readers or second maintenance
  * process (a reader in the two-rename window hits ENOENT). A store
  * whose artifacts carry a [[graft.ext.StoreGenerations]] chain
  * (`StoreGenerations.enable`) compacts ONLINE instead: readers keep
  * resolving their pinned generation while the compacted one
  * publishes, and only [[graft.ext.StoreGenerations.vacuum]] retires
  * bytes — the single-writer contract then covers writers only. */
object StoreMaintain {

  /** Minimal JSON string escaping — paths can carry quotes or
    * backslashes, and an operator's log pipeline chokes on raw
    * interpolation. */
  private[graft] def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private val Usage =
    "usage: StoreMaintain audit <artifactDir>... | " +
      "<sig|vector|retrieval|release> <storePath> | " +
      "enable <kind> <storePath> | snapshot <kind> <storePath> | " +
      "fold <kind> <storePath> | " +
      "vacuum <kind> <storePath> <keepGens>"

  def main(args: Array[String]): Unit = {
    // per-subcommand arity up front: a short invocation dies with the
    // usage line, never an ArrayIndexOutOfBoundsException
    val arity = Map("audit" -> 2, "enable" -> 3, "snapshot" -> 3,
      "fold" -> 3, "vacuum" -> 4,
      "sig" -> 2, "vector" -> 2, "retrieval" -> 2, "release" -> 2)
    require(args.nonEmpty && arity.contains(args(0)) &&
      args.length >= arity(args(0)), Usage)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args(0) match {
      case "audit" =>
        StoreMaintenance.auditArtifacts(spark, args.drop(1).toSeq)
          .collect().foreach { r =>
            println(s"""{"artifact":${jstr(r.getString(0))},"n_files":${r.getLong(1)},""" +
              s""""bytes":${r.getLong(2)},"rows":${r.getLong(3)},""" +
              s""""bytes_per_file":${r.getLong(4)}}""")
          }
      case "enable" =>
        StoreMaintenance.enableStoreGenerations(args(1), args(2))
        println(s"""{"enabled":${jstr(args(2))},"kind":${jstr(args(1))}}""")
      case "snapshot" =>
        val gen = graft.ext.StoreSnapshots.enable(args(1), args(2))
        println(s"""{"snapshotted":${jstr(args(2))},"kind":${jstr(args(1))},"gen":$gen}""")
      case "fold" =>
        // adopt pending file-level commits (concurrent writers'
        // batches) into the artifact chains without compacting —
        // the standalone face of what every compaction does first
        val gen = graft.ext.StoreSnapshots.fold(args(1), args(2))
          .getOrElse(sys.error(
            s"${args(2)} has no store snapshot chain — nothing to fold"))
        println(s"""{"folded":${jstr(args(2))},"kind":${jstr(args(1))},"gen":$gen}""")
      case "vacuum" =>
        val (nf, nm) = StoreMaintenance.vacuumStore(args(1), args(2),
          args(3).toInt)
        println(s"""{"vacuumed":${jstr(args(2))},"files_deleted":$nf,""" +
          s""""manifests_deleted":$nm}""")
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
        // a snapshotted store's readers resolve through the store
        // manifest: pin the post-compaction generations so they see it
        graft.ext.StoreSnapshots.commitIfSnapshotted(kind, path)
        val sec = (System.nanoTime() - t0) / 1e9
        reports.foreach { r =>
          println(s"""{"artifact":${jstr(r.artifact)},"files_before":${r.filesBefore},""" +
            s""""files_after":${r.filesAfter},"rows_before":${r.rowsBefore},""" +
            s""""rows_after":${r.rowsAfter}}""")
        }
        println(f"""{"kind":${jstr(kind)},"path":${jstr(path)},"sec":$sec%.2f}""")
    }
    spark.stop()
  }
}
