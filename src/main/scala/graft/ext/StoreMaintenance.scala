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
  * PROMOTION has two modes, picked per artifact by whether the
  * directory carries a [[StoreGenerations]] chain:
  *
  *  - Non-generational (the default): two-phase, crash-recoverable
  *    directory swap (single maintenance writer, QUIESCED store —
  *    no concurrent readers): the compacted copy builds in
  *    `<dir>.__compact`, is verified (footer inventory + the
  *    artifact's bounded invariant), marked `_GRAFT_VERIFIED`, and
  *    only then swapped in by two directory renames with the old
  *    bytes parked at `<dir>.__retired` until the final delete. A
  *    crash anywhere leaves a state [[recoverArtifact]] repairs;
  *    [[compactArtifact]] runs recovery first, so re-running after
  *    any crash is the repair.
  *
  *  - Generational ([[StoreGenerations.enable]]d): ONLINE promotion —
  *    the verified scratch files move INTO the artifact directory
  *    under deterministic generation-stamped names and generation
  *    N+1 publishes their list (no-clobber). Nothing a live reader
  *    references moves or dies: a reader holding generation N's file
  *    list completes correctly THROUGH the compaction, and the
  *    superseded bytes retire only when [[StoreGenerations.vacuum]]'s
  *    keep window passes them. A crash anywhere leaves only
  *    unreferenced files (re-running overwrites its own dead output;
  *    the vacuum sweeps whatever remains) — no recovery step at all.
  *
  * Reference behavior context: the reference re-reads its corpus per
  * run (no persisted derived state to maintain); this lifecycle is
  * what a 100 TB deployment adds, not a translation. */
object StoreMaintenance {

  /** One artifact's compaction outcome — bounded, driver-side. */
  final case class ArtifactReport(artifact: String, filesBefore: Long,
                                  filesAfter: Long, rowsBefore: Long,
                                  rowsAfter: Long)

  /** One artifact's maintenance recipe: where it lives, whether its
    * layout is bucket-partitioned (and must stay that way), the
    * semantic fold (identity for row-preserving artifacts), and the
    * bounded invariant that gates promotion. */
  final case class ArtifactSpec(dir: String, bucketCol: Option[String],
                                fold: DataFrame => DataFrame,
                                invariant: DataFrame => DataFrame)

  /** Audit-triggered in-band maintenance config (the store-side
    * mirror of the merge sink's `maintainEvery`): after an ingest
    * fold, any artifact whose live file count exceeds `ratio` × its
    * fresh-build ideal (one file per populated bucket; bytes /
    * `targetBytes` for flat artifacts) compacts in-band, and — when
    * the artifact is generational — vacuums beyond `keepGens`. The
    * trigger reads filesystem metadata only (file names + sizes):
    * zero data, zero footers, so a no-op tick costs microseconds. */
  final case class AutoMaintain(ratio: Double = 3.0,
                                targetBytes: Long = 128L << 20,
                                keepGens: Int = 2) {
    require(ratio >= 1.0, s"ratio must be >= 1, got $ratio")
    require(targetBytes > 0, s"targetBytes must be positive")
    require(keepGens >= 1, s"keepGens must be >= 1")
  }

  private def rowIdentity(df: DataFrame): DataFrame = df

  private def countInvariant(df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("n_rows"))

  private def spec(dir: String, bucketCol: Option[String] = None,
                   fold: DataFrame => DataFrame = rowIdentity,
                   invariant: DataFrame => DataFrame = countInvariant)
      : ArtifactSpec = ArtifactSpec(dir, bucketCol, fold, invariant)

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

  /** Repair an artifact directory after a crashed NON-generational
    * [[compactArtifact]]. Returns the action taken: "clean" (live dir
    * intact — stale scratch/retired leftovers deleted),
    * "rolled_forward" (verified scratch promoted to live),
    * "rolled_back" (retired bytes restored). Idempotent;
    * [[compactArtifact]] calls it on entry. (A GENERATIONAL
    * compaction needs no recovery: a crash leaves only unreferenced
    * files, which re-running overwrites and the vacuum sweeps.) */
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
    * the sums their readers take).
    *
    * Promotion mode (swap vs online generation publish) follows the
    * artifact: see the class doc. */
  def compactArtifact(spark: SparkSession, dir: String,
                      bucketCol: Option[String],
                      fold: DataFrame => DataFrame = rowIdentity,
                      invariant: DataFrame => DataFrame = countInvariant,
                      targetBytes: Long = 128L << 20): ArtifactReport = {
    val generational = StoreGenerations.isGenerational(dir)
    if (generational) deleteTree(scratchOf(dir)) // stale scratch only
    else recoverArtifact(dir)
    val srcFiles =
      if (generational) StoreGenerations.currentFiles(dir).get
      else graft.sources.Layout.listParquet(dir)
    require(srcFiles.nonEmpty, s"nothing to compact under $dir")
    val scratch = scratchOf(dir)
    val src =
      if (generational) StoreGenerations.read(spark, dir)
      else spark.read.parquet(dir)
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
    if (generational) {
      // ONLINE promotion: move the verified scratch files INTO the
      // live directory under deterministic generation-stamped names
      // (REPLACE_EXISTING overwrites only this compaction's own dead
      // prior attempt — the names embed the target generation, and
      // nothing references them until the publish below), then
      // publish their list as the next generation. Readers pinned to
      // any surviving generation are untouched; old bytes retire at
      // the next StoreGenerations.vacuum.
      val gen = StoreGenerations.currentGen(dir).get + 1
      val rxb = bucketCol.map(c =>
        (java.util.regex.Pattern.quote(s"$c=") + "(-?\\d+)/").r)
      val moved = outFiles.sorted.zipWithIndex.map { case (p, i) =>
        val tgt = rxb.flatMap(_.findFirstMatchIn(p)) match {
          case Some(m) =>
            s"$dir/${bucketCol.get}=${m.group(1)}/gen$gen-c.parquet"
          case None => s"$dir/gen$gen-p$i.parquet"
        }
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(tgt).getParent)
        java.nio.file.Files.move(java.nio.file.Paths.get(p),
          java.nio.file.Paths.get(tgt),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        tgt
      }
      StoreGenerations.publish(dir, gen, moved)
      deleteTree(scratch)
    } else {
      java.nio.file.Files.createFile(
        java.nio.file.Paths.get(s"$scratch/$Marker"))
      move(dir, retiredOf(dir))
      move(scratch, dir)
      deleteTree(retiredOf(dir)) // the vacuum: superseded bytes retire
    }
    ArtifactReport(dir, srcFiles.length.toLong, outFiles.length.toLong,
      rowsBefore, rowsAfter)
  }

  private def compact(spark: SparkSession, s: ArtifactSpec,
                      targetBytes: Long = 128L << 20): ArtifactReport =
    compactArtifact(spark, s.dir, s.bucketCol, s.fold, s.invariant,
      targetBytes)

  /** Footer-only health audit — the number that tells a deployment
    * WHEN to compact, at footer-read cost (zero data scanned): one
    * row per artifact directory with its file/byte/row inventory and
    * bytes-per-file — the LIVE inventory (the current generation's
    * files when the artifact carries a chain; retired-but-unvacuumed
    * bytes are not small-files decay, they are the keep window). A
    * store whose n_files grows daily while bytes_per_file shrinks is
    * accreting the decay the compaction path reverses; a deployment
    * alerts on n_files / max(1, bytes div targetBytes). */
  def auditArtifacts(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    import spark.implicits._
    dirs.map { d =>
      val files =
        if (!exists(d)) Seq.empty
        else StoreGenerations.currentFiles(d)
          .getOrElse(graft.sources.Layout.listParquet(d))
      if (files.isEmpty) (d, 0L, 0L, 0L, 0L)
      else {
        val r = graft.sources.Layout.parquetFileStatsFiles(spark, files)
          .agg(sum("file_bytes").as("b"), sum("n_rows").as("r")).head()
        (d, files.length.toLong, r.getLong(0), r.getLong(1),
          r.getLong(0) / files.length)
      }
    }.toDF("artifact", "n_files", "bytes", "rows", "bytes_per_file")
  }

  /** The in-band maintenance tick ([[AutoMaintain]]): compact — and,
    * on generational artifacts, vacuum — exactly the artifacts whose
    * live file count crossed ratio × ideal. Returns the reports of
    * what actually compacted (usually empty — that is the point of a
    * threshold). The trigger is pure filesystem metadata; sizing the
    * flat ideal uses file lengths, not footers, so a quiet tick
    * launches zero Spark jobs.
    *
    * `snapshot = Some((kind, storePath))`: when the store carries a
    * [[StoreSnapshots]] chain, a tick that compacted anything commits
    * ONE new store snapshot pinning the post-compaction generations,
    * then vacuums snapshot-aware (artifact generations any surviving
    * snapshot pins are kept, whatever the per-artifact keep window
    * says) — the per-artifact vacuum below would otherwise retire
    * generations a kept snapshot still names. */
  def maintainIfNeeded(spark: SparkSession, specs: Seq[ArtifactSpec],
                       am: AutoMaintain,
                       snapshot: Option[(String, String)] = None)
      : Seq[ArtifactReport] = {
    val snapped = snapshot.filter { case (_, p) =>
      StoreSnapshots.isSnapshotted(p) }
    // adopt pending file-level commits (concurrent writers' batches)
    // into the chains FIRST: the trigger below counts chain files,
    // and compaction folds chain files — unfolded d-entries would be
    // invisible to both (maintenance runs exclusively, so nothing
    // lands while this folds)
    snapped.foreach { case (kind, p) => StoreSnapshots.fold(kind, p) }
    val reports = specs.flatMap { s =>
      if (!exists(s.dir)) None
      else {
        val files = StoreGenerations.currentFiles(s.dir)
          .getOrElse(graft.sources.Layout.listParquet(s.dir))
        val ideal = s.bucketCol match {
          case Some(_) =>
            // fresh-build bound: one file per POPULATED bucket dir
            math.max(1L,
              files.map(p => p.substring(0, p.lastIndexOf('/')))
                .distinct.length.toLong)
          case None =>
            val bytes = files.map(p => java.nio.file.Files.size(
              java.nio.file.Paths.get(p))).sum
            math.max(1L, (bytes + am.targetBytes - 1) / am.targetBytes)
        }
        if (files.length <= am.ratio * ideal) None
        else {
          val r = compact(spark, s, am.targetBytes)
          if (snapped.isEmpty && StoreGenerations.isGenerational(s.dir))
            StoreGenerations.vacuum(s.dir, am.keepGens)
          Some(r)
        }
      }
    }
    if (reports.nonEmpty) snapped.foreach { case (kind, p) =>
      StoreSnapshots.commit(kind, p)
      StoreSnapshots.vacuum(kind, p, am.keepGens)
    }
    reports
  }

  /** [[StoreGenerations.enable]] on every accreting artifact of a
    * store (`kind` ∈ sig | vector | retrieval | release) — the
    * opt-in that makes its compactions online. */
  def enableStoreGenerations(kind: String, path: String): Unit =
    artifactsOf(kind, path).foreach(s => StoreGenerations.enable(s.dir))

  /** [[StoreGenerations.vacuum]] across a store's accreting
    * artifacts; returns (files deleted, manifests deleted) summed.
    * On a [[StoreSnapshots]]-enabled store, routes through the
    * snapshot-aware vacuum so no kept snapshot's pins retire. */
  def vacuumStore(kind: String, path: String, keepGens: Int): (Int, Int) =
    if (StoreSnapshots.isSnapshotted(path))
      StoreSnapshots.vacuum(kind, path, keepGens)
    else artifactsOf(kind, path)
      .filter(s => StoreGenerations.isGenerational(s.dir))
      .map(s => StoreGenerations.vacuum(s.dir, keepGens))
      .foldLeft((0, 0)) { case ((a, b), (c, d)) => (a + c, b + d) }

  private[graft] def artifactsOf(kind: String, path: String)
      : Seq[ArtifactSpec] = kind match {
    case "sig"       => sigArtifacts(path)
    case "vector"    => vectorArtifacts(path)
    case "retrieval" => retrievalArtifacts(path)
    case "release"   => releaseArtifacts(path)
    case other => sys.error(s"unknown store kind: $other")
  }

  /** Reports as a frame, for specs/gates that want to assert on the
    * arithmetic relationally. */
  def reportDF(spark: SparkSession, reports: Seq[ArtifactReport])
      : DataFrame = {
    import spark.implicits._
    reports.toDF()
  }

  /** [[SignatureStore]] artifacts: bands + sets (flat, row-
    * preserving; params is one immutable file and never accretes). */
  private def sigArtifacts(path: String): Seq[ArtifactSpec] = Seq(
    spec(s"$path/bands.parquet"), spec(s"$path/sets.parquet"))

  def compactSignatureStore(spark: SparkSession, path: String,
                            targetBytes: Long = 128L << 20)
      : Seq[ArtifactReport] = {
    StoreSnapshots.fold("sig", path) // adopt pending file-level commits
    sigArtifacts(path).map(s => compact(spark, s, targetBytes))
  }

  /** [[VectorIndexStore]] artifacts: codes (cell-bucketed, row-
    * preserving — the layout probe-time pruning keys on is preserved
    * bucket-for-bucket; centroids/codebook/params are build-frozen
    * and never accrete). */
  private def vectorArtifacts(path: String): Seq[ArtifactSpec] = Seq(
    spec(s"$path/codes.parquet", Some("cell_bucket")))

  def compactVectorIndexStore(spark: SparkSession, path: String)
      : Seq[ArtifactReport] = {
    StoreSnapshots.fold("vector", path) // adopt pending file-level commits
    vectorArtifacts(path).map(s => compact(spark, s))
  }

  /** [[ReleaseStore]] artifacts: the three the daily loop APPENDS
    * to — the signature index (bands/sets) plus the seen-url /
    * seen-hash identity filters. The identity filters fold to
    * DISTINCT: every batch appends ALL its urls/hashes (including ones
    * the release had already seen — the filters track input history),
    * so re-crawled urls accumulate duplicate rows that a membership
    * probe never needed; the fold drops them while the invariant pins
    * the only thing probes consume — the distinct member count. The
    * frozen quality models (lm/lm_tot/profiles) are build-time
    * artifacts and never accrete. */
  private def releaseArtifacts(path: String): Seq[ArtifactSpec] =
    sigArtifacts(s"$path/sig") ++ Seq(
      spec(s"$path/urls.parquet", fold = _.distinct(),
        invariant = _.agg(countDistinct("norm_url").as("n_urls"))),
      spec(s"$path/hashes.parquet", fold = _.distinct(),
        invariant = _.agg(countDistinct("h").as("n_hashes"))))

  def compactReleaseStore(spark: SparkSession, path: String)
      : Seq[ArtifactReport] = {
    StoreSnapshots.fold("release", path) // adopt pending file-level commits
    releaseArtifacts(path).map(s => compact(spark, s))
  }

  /** [[RetrievalIndexStore]] artifacts: postings (token-bucketed,
    * row-preserving), df (token-bucketed, delta rows SUMMED into one
    * row per token — readers sum, so the fold is the read), stats
    * (delta rows summed into one row), and — when the store carries
    * the positional face — positions (token-bucketed, row-
    * preserving). The invariants pin exactly what scoring consumes:
    * Σdf and the distinct token count for df; ΣN and ΣT for stats.
    *
    * The store's 3–4 artifacts compact SEQUENTIALLY and
    * INDEPENDENTLY: a crash mid-sequence leaves a mixed-compaction
    * store — harmless (compaction is physical-only per artifact, the
    * fold preserves what readers consume, and each directory is
    * independently recoverable), and re-running the store-level call
    * resumes the sequence: already-compacted artifacts fold to
    * themselves (idempotent), the interrupted one repairs via its own
    * recovery, the rest compact fresh. */
  private def retrievalArtifacts(path: String): Seq[ArtifactSpec] = {
    val base = Seq(
      spec(s"$path/postings.parquet", Some("tok_bucket")),
      spec(s"$path/df.parquet", Some("tok_bucket"),
        fold = d => d.groupBy("tok", "tok_bucket")
          .agg(sum("df").as("df"))
          .select("tok", "df", "tok_bucket"),
        invariant = d => d.agg(sum("df").as("sum_df"),
          countDistinct("tok").as("n_tok"))),
      spec(s"$path/stats.parquet",
        fold = d => d.agg(sum("n_docs").as("n_docs"),
          sum("total_dl").as("total_dl")),
        invariant = d => d.agg(sum("n_docs").as("n"),
          sum("total_dl").as("t"))))
    if (exists(s"$path/positions.parquet"))
      base :+ spec(s"$path/positions.parquet", Some("tok_bucket"))
    else base
  }

  def compactRetrievalIndexStore(spark: SparkSession, path: String)
      : Seq[ArtifactReport] = {
    StoreSnapshots.fold("retrieval", path) // adopt pending file-level commits
    retrievalArtifacts(path).map(s => compact(spark, s))
  }
}
