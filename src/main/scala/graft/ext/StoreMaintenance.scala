package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance for the persisted index stores ([[SignatureStore]],
  * [[VectorIndexStore]], [[RetrievalIndexStore]]): fold the parquet
  * files their append-only ingest accretes back into a fresh-build
  * layout, verify from footers + bounded invariants, and retire the
  * superseded bytes — the same compact-then-vacuum lifecycle the
  * manifest table got in [[graft.streaming.StreamingOps
  * .compactManifest]]/[[graft.streaming.StreamingOps.vacuumManifests]],
  * applied to the stores a daily-ingest deployment touches every day.
  *
  * Why it exists: every `append` writes its own parquet files, so a
  * year of daily batches turns each store scan into a 365-file
  * small-files problem and the bucket-pruned query faces quietly decay
  * (a probe still prunes to its buckets, but every bucket is now N
  * files of open/footer overhead). Compaction is PHYSICAL only — the store's
  * answers are bit-identical before and after (spec-pinned through
  * every store's query face), because rewriting rows never changes the
  * relational content, and the one SEMANTIC fold (summing the BM25
  * store's df/stats delta rows) preserves the sums readers take.
  *
  * The unit of work is one artifact DIRECTORY:
  *
  *  - flat artifacts (bands/sets/stats) rewrite into
  *    ceil(bytes/targetBytes) files (footer arithmetic sizes the
  *    output — no data read to plan);
  *  - bucket-partitioned artifacts (codes/postings/df) rewrite into
  *    ONE file per bucket directory via the hash-inverse probe
  *    (partition == bucket, the [[graft.sources.Layout
  *    .compactGroupsFiles]] trick), preserving the directory layout
  *    the probe-time partition pruning depends on. One file per bucket
  *    is the fresh-build bound because the store's bucket-count knob
  *    (cell_buckets / tok_buckets) is how a deployment sizes buckets
  *    to begin with.
  *
  * Two-phase, crash-recoverable swap (single maintenance writer, same
  * cadence contract as the manifest table's): the compacted copy
  * builds in `<dir>.__compact`, is verified (footer inventory + the
  * artifact's bounded invariant), marked `_GRAFT_VERIFIED`, and only
  * then swapped in by two directory renames with the old bytes parked
  * at `<dir>.__retired` until the final delete — the vacuum. A crash
  * anywhere leaves a state [[recoverArtifact]] repairs: stale scratch
  * is discarded, a verified scratch with no live dir rolls FORWARD,
  * a parked retired dir with no live dir rolls BACK. [[compactArtifact]]
  * runs recovery first, so re-running after any crash is the repair.
  *
  * Reference behavior context: the reference re-reads its corpus per
  * run (no persisted derived state to maintain); this lifecycle is
  * what a 100 TB deployment adds, not a translation. */
object StoreMaintenance {

  /** One artifact's compaction outcome — bounded, driver-side. */
  final case class ArtifactReport(artifact: String, filesBefore: Long,
                                  filesAfter: Long, rowsBefore: Long,
                                  rowsAfter: Long)

  private def scratchOf(dir: String) = s"$dir.__compact"
  private def retiredOf(dir: String) = s"$dir.__retired"
  private val Marker = "_GRAFT_VERIFIED"

  private def exists(p: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(p))

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

  private def move(from: String, to: String): Unit =
    java.nio.file.Files.move(java.nio.file.Paths.get(from),
      java.nio.file.Paths.get(to))

  /** Repair an artifact directory after a crashed [[compactArtifact]].
    * Returns the action taken: "clean" (live dir intact — stale
    * scratch/retired leftovers deleted), "rolled_forward" (verified
    * scratch promoted to live), "rolled_back" (retired bytes
    * restored). Idempotent; [[compactArtifact]] calls it on entry. */
  def recoverArtifact(dir: String): String = {
    val scratch = scratchOf(dir); val retired = retiredOf(dir)
    if (exists(dir)) {
      deleteTree(scratch); deleteTree(retired); "clean"
    } else if (exists(s"$scratch/$Marker")) {
      // crashed between the two swap renames (or before the retire
      // delete): the scratch passed verification, promote it
      move(scratch, dir); deleteTree(retired); "rolled_forward"
    } else if (exists(retired)) {
      // crashed after parking the live dir but before a verified
      // scratch could replace it (verification marker absent means
      // the scratch cannot be trusted): restore the old bytes
      deleteTree(scratch); move(retired, dir); "rolled_back"
    } else {
      require(false, s"$dir missing with no recoverable state"); ""
    }
  }

  /** Compact one artifact directory in place (see class doc).
    *
    * `bucketCol` — Some(c): the directory is `partitionBy(c)` laid out
    * and MUST stay that way (probe-time pruning); rewrite = one file
    * per bucket. None: flat; rewrite = ceil(bytes/targetBytes) files.
    *
    * `fold` — the semantic fold applied during the rewrite (identity
    * for row-preserving artifacts; delta-summing for the BM25 df and
    * stats tables). `invariant` — a ONE-ROW aggregate that must be
    * equal on the artifact before and after (defaults to row count,
    * which is only correct for identity folds; folding callers pass
    * the sums their readers take). */
  def compactArtifact(spark: SparkSession, dir: String,
                      bucketCol: Option[String],
                      fold: DataFrame => DataFrame = identity,
                      invariant: DataFrame => DataFrame =
                        _.agg(count(lit(1)).as("n_rows")),
                      targetBytes: Long = 128L << 20): ArtifactReport = {
    recoverArtifact(dir)
    val srcFiles = graft.sources.Layout.listParquet(dir)
    require(srcFiles.nonEmpty, s"nothing to compact under $dir")
    val scratch = scratchOf(dir)
    val src = spark.read.parquet(dir)
    val before = invariant(src).collect().toSeq
    val rowsBefore = graft.sources.Layout
      .parquetFileStatsFiles(spark, srcFiles)
      .agg(sum("n_rows")).collect()(0).getLong(0)
    val folded = fold(src)
    bucketCol match {
      case Some(c) =>
        // bucket values from the DIRECTORY NAMES (control-plane, zero
        // data read) — the same values probe-time pruning keys on
        val rx = (java.util.regex.Pattern.quote(s"$c=") + "(-?\\d+)/").r
        val vals = srcFiles
          .flatMap(p => rx.findFirstMatchIn(p).map(_.group(1).toLong))
          .distinct.sorted
        require(vals.nonEmpty, s"no $c= partition dirs under $dir")
        val nV = vals.length
        // partition == bucket via the hash-inverse probe (the
        // compactGroupsFiles trick): each bucket's rows land alone in
        // one task, so partitionBy emits exactly one file per bucket.
        // The value→pid map is bucket-count-sized (the store's layout
        // knob, thousands at most — bounded-collect class).
        val inv: Map[Long, Long] = spark.range(nV * 64L)
          .select(col("id"),
            pmod(hash(col("id")), lit(nV)).cast("long").as("b"))
          .groupBy("b").agg(min("id").as("pid"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        require(inv.size == nV,
          s"hash-inverse probe found ${inv.size} of $nV partitions")
        val pidMap = map(vals.zipWithIndex.flatMap { case (v, i) =>
          Seq(lit(v), lit(inv(i.toLong))) }: _*)
        folded
          .withColumn("__pid", element_at(pidMap, col(c).cast("long")))
          .repartition(nV, col("__pid"))
          .drop("__pid")
          .write.mode("overwrite").partitionBy(c).parquet(scratch)
      case None =>
        val bytes = graft.sources.Layout
          .parquetFileStatsFiles(spark, srcFiles)
          .agg(sum("file_bytes")).collect()(0).getLong(0)
        val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        folded.repartition(nOut)
          .write.mode("overwrite").parquet(scratch)
    }
    val after = invariant(spark.read.parquet(scratch)).collect().toSeq
    require(before == after,
      s"invariant mismatch compacting $dir: $before -> $after; " +
        "scratch NOT promoted — the live artifact is untouched")
    val outFiles = graft.sources.Layout.listParquet(scratch)
    val rowsAfter = graft.sources.Layout
      .parquetFileStatsFiles(spark, outFiles)
      .agg(sum("n_rows")).collect()(0).getLong(0)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$scratch/$Marker"))
    move(dir, retiredOf(dir))
    move(scratch, dir)
    deleteTree(retiredOf(dir)) // the vacuum: superseded bytes retire
    ArtifactReport(dir, srcFiles.length.toLong, outFiles.length.toLong,
      rowsBefore, rowsAfter)
  }

  /** Footer-only health audit — the number that tells a deployment
    * WHEN to compact, at footer-read cost (zero data scanned): one
    * row per artifact directory with its file/byte/row inventory and
    * bytes-per-file. A store whose n_files grows daily while
    * bytes_per_file shrinks is accreting the small-files decay the
    * compaction path reverses; a deployment alerts on
    * n_files / max(1, bytes div targetBytes). */
  def auditArtifacts(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    import spark.implicits._
    dirs.map { d =>
      val files =
        if (!exists(d)) Seq.empty else graft.sources.Layout.listParquet(d)
      if (files.isEmpty) (d, 0L, 0L, 0L, 0L)
      else {
        val r = graft.sources.Layout.parquetFileStatsFiles(spark, files)
          .agg(sum("file_bytes").as("b"), sum("n_rows").as("r")).head()
        (d, files.length.toLong, r.getLong(0), r.getLong(1),
          r.getLong(0) / files.length)
      }
    }.toDF("artifact", "n_files", "bytes", "rows", "bytes_per_file")
  }

  /** Reports as a frame, for specs/gates that want to assert on the
    * arithmetic relationally. */
  def reportDF(spark: SparkSession, reports: Seq[ArtifactReport])
      : DataFrame = {
    import spark.implicits._
    reports.toDF()
  }

  /** [[SignatureStore]] maintenance: bands + sets (flat, row-
    * preserving; params is one immutable file and never accretes). */
  def compactSignatureStore(spark: SparkSession, path: String,
                            targetBytes: Long = 128L << 20)
      : Seq[ArtifactReport] = Seq(
    compactArtifact(spark, s"$path/bands.parquet", None,
      targetBytes = targetBytes),
    compactArtifact(spark, s"$path/sets.parquet", None,
      targetBytes = targetBytes))

  /** [[VectorIndexStore]] maintenance: codes (cell-bucketed, row-
    * preserving — the layout probe-time pruning keys on is preserved
    * bucket-for-bucket; centroids/codebook/params are build-frozen
    * and never accrete). */
  def compactVectorIndexStore(spark: SparkSession, path: String)
      : Seq[ArtifactReport] = Seq(
    compactArtifact(spark, s"$path/codes.parquet", Some("cell_bucket")))

  /** [[ReleaseStore]] maintenance: the three artifacts the daily loop
    * APPENDS to — the signature index (bands/sets) plus the seen-url /
    * seen-hash identity filters. The identity filters fold to
    * DISTINCT: every batch appends ALL its urls/hashes (including ones
    * the release had already seen — the filters track input history),
    * so re-crawled urls accumulate duplicate rows that a membership
    * probe never needed; the fold drops them while the invariant pins
    * the only thing probes consume — the distinct member count. The
    * frozen quality models (lm/lm_tot/profiles) are build-time
    * artifacts and never accrete. */
  def compactReleaseStore(spark: SparkSession, path: String)
      : Seq[ArtifactReport] =
    compactSignatureStore(spark, s"$path/sig") ++ Seq(
      compactArtifact(spark, s"$path/urls.parquet", None,
        fold = _.distinct(),
        invariant = _.agg(countDistinct("norm_url").as("n_urls"))),
      compactArtifact(spark, s"$path/hashes.parquet", None,
        fold = _.distinct(),
        invariant = _.agg(countDistinct("h").as("n_hashes"))))

  /** [[RetrievalIndexStore]] maintenance: postings (token-bucketed,
    * row-preserving), df (token-bucketed, delta rows SUMMED into one
    * row per token — readers sum, so the fold is the read), stats
    * (delta rows summed into one row), and — when the store carries
    * the positional face — positions (token-bucketed, row-
    * preserving). The invariants pin exactly what scoring consumes:
    * Σdf and the distinct token count for df; ΣN and ΣT for stats. */
  def compactRetrievalIndexStore(spark: SparkSession, path: String)
      : Seq[ArtifactReport] = {
    val base = Seq(
      compactArtifact(spark, s"$path/postings.parquet", Some("tok_bucket")),
      compactArtifact(spark, s"$path/df.parquet", Some("tok_bucket"),
        fold = d => d.groupBy("tok", "tok_bucket")
          .agg(sum("df").as("df"))
          .select("tok", "df", "tok_bucket"),
        invariant = d => d.agg(sum("df").as("sum_df"),
          countDistinct("tok").as("n_tok"))),
      compactArtifact(spark, s"$path/stats.parquet", None,
        fold = d => d.agg(sum("n_docs").as("n_docs"),
          sum("total_dl").as("total_dl")),
        invariant = d => d.agg(sum("n_docs").as("n"),
          sum("total_dl").as("t"))))
    if (exists(s"$path/positions.parquet"))
      base :+ compactArtifact(spark, s"$path/positions.parquet",
        Some("tok_bucket"))
    else base
  }
}
