package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** GENERATION CHAIN for a persisted store's artifact directories —
  * the piece that turns [[StoreMaintenance]]'s crash-safe compaction
  * into an ONLINE compaction: readers keep resolving a pinned
  * generation's file list while maintenance publishes the next one,
  * and bytes retire only when [[vacuum]]'s keep window passes them.
  *
  * This is the manifest-chain machinery the streaming merge-sink
  * table already ships ([[graft.streaming.StreamingOps]]: `tableAt` /
  * `publishManifest` / `vacuumManifests`), applied to the index-store
  * artifacts the maintenance CLI hits on a live cadence. Without it,
  * the two-rename swap in [[StoreMaintenance.compactArtifact]]
  * requires a QUIESCED store: between `move(dir, retired)` and
  * `move(scratch, dir)` the live directory does not exist, and a
  * long-running query holding the old file list loses its files at
  * the final delete. With a chain, compaction only ever ADDS files
  * and a manifest — nothing a live reader references moves or dies
  * until the vacuum retires generations beyond the keep window.
  *
  * Layout: `<artifactDir>/_manifests/gen=<N>` is a text file listing
  * the parquet paths that constitute the artifact at generation N
  * (absolute paths, same format as the merge-sink table's). The
  * underscore prefix keeps the chain invisible to Spark's file
  * listing, so a non-generational reader of the plain directory is
  * unaffected by `enable` until the first compaction diverges the
  * chain from the directory inventory.
  *
  * Contracts:
  *  - SINGLE WRITER: appends and compactions on one artifact
  *    serialize (the store contract); a lost race surfaces loudly
  *    through the no-clobber generation publish, never as silent
  *    last-writer-wins (same `link(2)` primitive as the merge sink).
  *  - READERS ARE FREE: any number, any time; a reader holds the
  *    file list of the generation it resolved, which survives every
  *    compaction and every vacuum within the keep window.
  *  - Spark's `SaveMode.Overwrite` on the directory (a store
  *    rebuild) deletes the chain with the bytes — a rebuilt store
  *    starts non-generational until [[enable]]d again.
  *
  * Reference behavior context: the reference re-reads its corpus per
  * run (no persisted derived state); generation-pinned store reads
  * are what a 100 TB deployment adds so maintenance never blocks
  * serving. */
object StoreGenerations {

  /** Basename pattern of files a generational compaction minted —
    * [[commitAppend]] must not adopt a crashed compaction's
    * unpublished output as "appended rows" (they duplicate rows the
    * live generation already carries). */
  private[ext] val CompactName = "^gen\\d+-".r

  private def manifestsDir(dir: String) = s"$dir/_manifests"

  private def exists(p: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(p))

  /** Whether the artifact carries a generation chain. */
  def isGenerational(dir: String): Boolean = exists(manifestsDir(dir))

  private def gens(dir: String): Seq[(Long, java.io.File)] =
    Option(new java.io.File(manifestsDir(dir)).listFiles())
      .getOrElse(Array.empty)
      .flatMap(f => "^gen=(\\d+)$".r.findFirstMatchIn(f.getName)
        .map(_.group(1).toLong -> f))
      .sortBy(_._1).toSeq

  private def readManifest(f: java.io.File): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(f.toPath).asScala.toSeq
      .filter(_.nonEmpty)
  }

  /** The newest published generation number, if any. */
  def currentGen(dir: String): Option[Long] = gens(dir).lastOption.map(_._1)

  /** The artifact's file list AT a generation — the largest published
    * generation <= `gen`, or None if none that old survives (same
    * time-travel contract as the merge-sink table's `filesAt`). */
  def filesAt(dir: String, gen: Long): Option[Seq[String]] =
    gens(dir).filter(_._1 <= gen).lastOption.map(g => readManifest(g._2))

  /** The CURRENT generation's file list (None = non-generational). */
  def currentFiles(dir: String): Option[Seq[String]] =
    gens(dir).lastOption.map(g => readManifest(g._2))

  /** Publish generation `gen` — no-clobber (`link(2)` + read-back,
    * via the merge sink's guarded publish): a second writer racing
    * onto the same generation RAISES instead of corrupting the
    * chain. */
  private[ext] def publish(dir: String, gen: Long,
                           files: Seq[String]): Unit =
    graft.streaming.StreamingOps.publishManifest(dir, gen,
      files.sorted, replace = false)

  /** Start the chain: generation 0 = the directory's current parquet
    * inventory. Idempotent (an already-generational artifact keeps
    * its chain). Returns the current generation. */
  def enable(dir: String): Long = currentGen(dir).getOrElse {
    val files = graft.sources.Layout.listParquet(dir)
    require(files.nonEmpty, s"nothing to version under $dir")
    publish(dir, 0L, files)
    0L
  }

  private def canon(s: String): String =
    java.nio.file.Paths.get(s).toAbsolutePath.normalize.toString

  /** Every file any surviving manifest references (canonicalized). */
  private def referenced(dir: String): Set[String] =
    gens(dir).flatMap(g => readManifest(g._2)).map(canon).toSet

  /** Read the artifact: the current generation's file list when a
    * chain exists (with `basePath` so bucket-partition directories
    * keep yielding their partition column and partition pruning),
    * the plain directory otherwise. */
  def read(spark: SparkSession, dir: String): DataFrame =
    currentFiles(dir) match {
      case Some(files) if files.nonEmpty =>
        spark.read.option("basePath", dir).parquet(files: _*)
      case Some(_) => spark.emptyDataFrame
      case None => spark.read.parquet(dir)
    }

  /** Generation-pinned read with the vacuum contract enforced LOUDLY
    * (the store face of the merge-sink table's `tableAt`): a pin
    * inside the keep window resolves the exact artifact state it
    * names; a pin the vacuum has passed fails here with a clear
    * error, never a partial read of surviving files. */
  def readAt(spark: SparkSession, dir: String, gen: Long): DataFrame =
    filesAt(dir, gen) match {
      case Some(files) if files.nonEmpty =>
        spark.read.option("basePath", dir).parquet(files: _*)
      case Some(_) => spark.emptyDataFrame
      case None => throw new IllegalStateException(
        s"no generation <= $gen survives under $dir: the pin is " +
          "outside the vacuum keep window (or the artifact has no " +
          "chain) — re-pin to a kept generation")
    }

  /** Fold a completed append's files into the chain: publish
    * generation N+1 = generation N's list + every parquet file on
    * disk no surviving manifest references (the files the append
    * just wrote), EXCLUDING [[CompactName]]-stamped files (a crashed
    * compaction's unpublished output duplicates live rows; the
    * vacuum retires it). When nothing unreferenced is found — an
    * empty batch, or a REPLAYED batch whose canonical files the
    * chain already adopted — no generation is published (the commit
    * is already on the chain; this is what makes a replayed
    * streaming append a no-op rather than generation churn). No-op
    * (None) on a non-generational artifact, so append paths call
    * this unconditionally. */
  def commitAppend(dir: String): Option[Long] =
    currentGen(dir).map { cur =>
      val ref = referenced(dir)
      val fresh = graft.sources.Layout.listParquet(dir)
        .filterNot(p => ref.contains(canon(p)))
        .filterNot(p => CompactName
          .findFirstIn(p.substring(p.lastIndexOf('/') + 1)).isDefined)
      if (fresh.isEmpty) cur
      else {
        val next = cur + 1
        publish(dir, next, currentFiles(dir).get ++ fresh)
        next
      }
    }

  /** Land a micro-batch's rows as ONE canonical file in a FLAT
    * generational artifact (`<dir>/gb<batchId>.parquet`) and commit —
    * the replay-safe streaming-append primitive: a replayed batch
    * overwrites its own file (REPLACE_EXISTING; nothing else ever
    * carries its name) and its commit finds nothing unreferenced, so
    * the chain — and every pinned reader — is untouched. A mid-batch
    * crash leaves only an unreferenced file the replay overwrites.
    * Micro-batches are small by definition, so one file per batch IS
    * the fresh-build landing (the auto-maintenance ratio still
    * bounds the long-run count). Returns the chain generation. */
  def landCanonical(df: DataFrame, dir: String, batchId: Long): Long = {
    require(isGenerational(dir),
      s"streaming append needs a generation chain on $dir — without " +
        "one a replayed micro-batch would double its rows")
    val scratch = s"$dir.__append_b$batchId"
    df.coalesce(1).write.mode("overwrite").parquet(scratch)
    val files = graft.sources.Layout.listParquet(scratch)
    require(files.length <= 1,
      s"coalesce(1) landed ${files.length} files under $scratch")
    files.foreach { p =>
      java.nio.file.Files.move(java.nio.file.Paths.get(p),
        java.nio.file.Paths.get(s"$dir/gb$batchId.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    deleteTree(scratch)
    commitAppend(dir).get
  }

  /** [[landCanonical]] for a BUCKET-PARTITIONED artifact: the batch
    * lands as one canonical `gb<batchId>.parquet` per POPULATED
    * bucket directory (the bucket-clustered repartition guarantees
    * one scratch file per bucket — enforced), preserving the layout
    * probe-time partition pruning keys on. Same replay/crash
    * contract as the flat form. */
  def landCanonicalBucketed(df: DataFrame, dir: String,
                            bucketCol: String, batchId: Long): Long = {
    require(isGenerational(dir),
      s"streaming append needs a generation chain on $dir — without " +
        "one a replayed micro-batch would double its rows")
    val scratch = s"$dir.__append_b$batchId"
    df.repartition(org.apache.spark.sql.functions.col(bucketCol))
      .write.partitionBy(bucketCol).mode("overwrite").parquet(scratch)
    val rx = (java.util.regex.Pattern.quote(s"$bucketCol=") +
      "(-?\\d+)/").r
    graft.sources.Layout.listParquet(scratch)
      .flatMap(p => rx.findFirstMatchIn(p).map(m => (m.group(1), p)))
      .groupBy(_._1)
      .foreach { case (bucket, files) =>
        require(files.length == 1,
          s"bucket $bucket holds ${files.length} scratch files; the " +
            "bucket-clustered write guarantees one — not renaming")
        val tgt = java.nio.file.Paths.get(
          s"$dir/$bucketCol=$bucket/gb$batchId.parquet")
        java.nio.file.Files.createDirectories(tgt.getParent)
        java.nio.file.Files.move(
          java.nio.file.Paths.get(files.head._2), tgt,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    deleteTree(scratch)
    commitAppend(dir).get
  }

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

  /** Retire generations beyond the newest `keepGens` and every
    * parquet file under the artifact no kept manifest references —
    * including dead compaction scratch output. Keeps at least one
    * generation; returns (files deleted, manifests deleted). Same
    * single-writer cadence as the merge-sink vacuum: run it from the
    * maintenance path, not concurrently with a reader pinned older
    * than the kept window. */
  def vacuum(dir: String, keepGens: Int): (Int, Int) = {
    require(keepGens >= 1, "must keep at least one generation")
    val all = gens(dir)
    if (all.isEmpty) return (0, 0)
    val (drop, keep) = all.splitAt(math.max(0, all.length - keepGens))
    val kept = keep.flatMap(g => readManifest(g._2)).map(canon).toSet
    val dead = graft.sources.Layout.listParquet(dir)
      .filterNot(p => kept.contains(canon(p)))
    dead.foreach(p =>
      java.nio.file.Files.delete(java.nio.file.Paths.get(p)))
    drop.foreach { case (_, f) => java.nio.file.Files.delete(f.toPath) }
    (dead.length, drop.length)
  }
}
