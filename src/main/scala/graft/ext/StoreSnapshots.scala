package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** STORE-LEVEL atomic commit — one manifest spanning ALL of a store's
  * artifacts, so a reader never observes a half-committed append.
  *
  * [[StoreGenerations]] gives each artifact directory its own chain,
  * which makes every artifact independently consistent — but a
  * multi-artifact append ([[RetrievalIndexStore.append]]: postings,
  * THEN df, THEN stats, THEN positions) publishes three or four
  * generations in sequence, and a reader issuing `query()` between
  * the postings commit and the df commit scores the new batch's
  * postings against the PREVIOUS generation's document frequencies.
  * BM25's exactness argument ("df over the pruned scan is exact for
  * every query token") silently assumes the artifacts are mutually
  * consistent; nothing below this layer enforces it. This is the
  * merge-sink pattern applied one level up: the sink publishes ONE
  * manifest per batch naming every file of the table — the store
  * publishes ONE snapshot per append naming every ARTIFACT'S
  * GENERATION, and the query faces resolve all artifacts through one
  * pinned snapshot: all-old or all-new, never mixed.
  *
  * Layout: `<storePath>/_store_manifests/gen=<S>` — same no-clobber
  * conditional-create publish as every other chain (via
  * [[graft.sources.ManifestIO]]; nothing POSIX-specific). Lines:
  *
  *   a <tab> <relArtifactDir> <tab> <artifactGen>   (chained artifact)
  *   f <tab> <relFilePath>    <tab> <bytes>         (frozen/seed file)
  *   d <tab> <relArtifactDir> <tab> <relFilePath>   (file-level commit:
  *       a concurrent writer's landed file, read IN ADDITION to the
  *       artifact's pinned generation — see [[commitOwnStore]])
  *
  * The `f` entries inventory the store's FROZEN artifacts — the seed
  * files an append never touches (params, trained centroids/codebook,
  * the release store's quality models). They were previously outside
  * any manifest discipline: a deleted or overwritten seed surfaced
  * only as a scan error (or worse, silently different scores).
  * [[pin]] verifies every `f` entry's existence AND size at RESOLVE
  * time and fails loudly naming the seed, before any Spark job runs.
  *
  * Contracts:
  *  - WRITERS: the plain append paths (chain commits + [[commit]])
  *    remain single-writer per store; CONCURRENT appenders go through
  *    [[commitOwnStore]] (multi-artifact, file-level entries) or
  *    [[StoreGenerations.commitOwn]] (single-accreting-artifact) —
  *    any number may race; a lost publish race re-bases and retries.
  *    MAINTENANCE (compaction, [[fold]], vacuum) stays exclusive.
  *  - READERS ARE FREE: a [[Pin]] resolves every artifact at the
  *    generation (plus file-level entries) one snapshot names; those
  *    survive any vacuum that keeps the snapshot ([[vacuum]] pins
  *    them).
  *  - OPT-IN: a store without `_store_manifests` behaves exactly as
  *    before (per-artifact current-generation reads) — every
  *    pre-existing gate is unchanged by construction.
  *
  * Reference behavior context: the reference re-reads its corpus per
  * run (no persisted derived state); cross-artifact snapshot isolation
  * is what a 100 TB deployment's serving stores add. */
object StoreSnapshots {

  private def mdir(path: String) = s"$path/_store_manifests"

  private def io(path: String): graft.sources.ManifestIO =
    graft.sources.ManifestIO.forPath(path)

  private def canon(s: String): String =
    java.nio.file.Paths.get(s).toAbsolutePath.normalize.toString

  private def rel(path: String, p: String): String =
    java.nio.file.Paths.get(canon(path))
      .relativize(java.nio.file.Paths.get(canon(p))).toString

  private def gens(path: String): Seq[Long] =
    io(path).list(mdir(path))
      .flatMap(n => "^gen=(\\d+)$".r.findFirstMatchIn(n)
        .map(_.group(1).toLong))
      .sorted

  /** Whether the store carries a snapshot chain. */
  def isSnapshotted(path: String): Boolean = gens(path).nonEmpty

  /** The newest published snapshot generation, if any. */
  def currentGen(path: String): Option[Long] = gens(path).lastOption

  /** The store's FROZEN artifacts per kind — build-time seeds an
    * append never touches, inventoried read-only in every snapshot. */
  private[ext] def frozenOf(kind: String, path: String): Seq[String] =
    kind match {
      case "sig"       => Seq(s"$path/params.parquet")
      case "vector"    => Seq(s"$path/centroids.parquet",
        s"$path/codebook.parquet", s"$path/params.parquet")
      case "retrieval" => Seq(s"$path/params.parquet")
      case "release"   => Seq(s"$path/sig/params.parquet",
        s"$path/lm.parquet", s"$path/lm_tot.parquet",
        s"$path/profiles.parquet")
      case other => sys.error(s"unknown store kind: $other")
    }

  private def exists(p: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(p))

  private def visibleParquet(dir: String): Seq[String] = {
    val base = java.nio.file.Paths.get(dir).toAbsolutePath.normalize
    graft.sources.Layout.listParquet(dir).filterNot { p =>
      val r = base.relativize(
        java.nio.file.Paths.get(p).toAbsolutePath.normalize).toString
      r.split('/').exists(s => s.startsWith("_") || s.startsWith("."))
    }
  }

  /** The snapshot's content lines for the store's CURRENT state:
    * every existing chained artifact at its current generation, every
    * frozen file with its size, PLUS the previous snapshot's pending
    * file-level commits (`d` lines) whose files the artifact's pinned
    * generation has not adopted yet — a single-writer commit must
    * never drop a concurrent writer's committed-but-unfolded batch
    * (once [[fold]] adopts the files into the chain, the pinned
    * generation covers them and the `d` lines retire here). */
  private def entries(kind: String, path: String): Seq[String] = {
    val chained = StoreMaintenance.artifactsOf(kind, path)
      .map(_.dir).filter(exists)
    require(chained.nonEmpty, s"no artifacts under $path for kind $kind")
    val aLines = chained.map { dir =>
      val gen = StoreGenerations.currentGen(dir).getOrElse(
        sys.error(s"$dir has no generation chain — snapshotting needs " +
          "chains on every accreting artifact (StoreSnapshots.enable " +
          "establishes them)"))
      s"a\t${rel(path, dir)}\t$gen"
    }
    val fLines = frozenOf(kind, path).filter(exists).flatMap { fdir =>
      visibleParquet(fdir).map { p =>
        s"f\t${rel(path, p)}\t${java.nio.file.Files.size(java.nio.file.Paths.get(p))}"
      }
    }
    val dLines = currentGen(path).toSeq.flatMap { cur =>
      val chainCovered: Map[String, Set[String]] = chained.map { dir =>
        canon(dir) -> StoreGenerations.currentFiles(dir)
          .getOrElse(Seq.empty).map(canon).toSet
      }.toMap
      io(path).read(s"${mdir(path)}/gen=$cur").getOrElse("")
        .split("\n", -1).toSeq.filter(_.startsWith("d\t"))
        .filter { l =>
          val Array(_, rDir, rFile) = l.split("\t", 3)
          !chainCovered.getOrElse(canon(s"$path/$rDir"), Set.empty)
            .contains(canon(s"$path/$rFile"))
        }
    }
    aLines ++ fLines ++ dLines
  }

  private def publish(path: String, gen: Long, lines: Seq[String]): Unit = {
    require(lines.nonEmpty,
      s"refusing to publish empty store snapshot $gen under $path")
    val content = lines.mkString("\n")
    val target = s"${mdir(path)}/gen=$gen"
    io(path).putIfAbsent(target, content)
    val stored = io(path).read(target).getOrElse("")
    if (stored != content)
      throw new graft.sources.LostPublishRace(
        s"lost publish race on store snapshot $path gen=$gen — a second " +
          "writer is committing to the same store (single-writer contract " +
          "for multi-artifact mutations; [[commit]] itself retries, since " +
          "a snapshot only pins the store's current state)")
  }

  /** Drop the snapshot chain (every store manifest) — called by each
    * store's `build`: an overwrite deletes the per-artifact chains the
    * snapshots pin, so the rebuilt store starts UN-SNAPSHOTTED until
    * [[enable]]d again — the store-level face of the contract the
    * artifact chains document for `SaveMode.Overwrite` (a stale
    * snapshot over fresh artifacts would otherwise fail every commit
    * with a missing-chain error). */
  def invalidate(path: String): Unit =
    gens(path).foreach(g => io(path).delete(s"${mdir(path)}/gen=$g"))

  /** Start the snapshot chain: establish per-artifact chains on every
    * accreting artifact (idempotent), then publish snapshot 0 pinning
    * each at its current generation plus the frozen inventory.
    * Idempotent; returns the current snapshot generation. */
  def enable(kind: String, path: String): Long =
    currentGen(path).getOrElse {
      StoreMaintenance.enableStoreGenerations(kind, path)
      publish(path, 0L, entries(kind, path))
      0L
    }

  /** Publish the next snapshot pinning the store's CURRENT artifact
    * generations — THE atomic commit point of a multi-artifact append
    * or compaction: until this publishes, every reader keeps resolving
    * the previous snapshot's mutually-consistent generations. Skips
    * publishing (returns the current generation) when nothing moved,
    * so replayed/idempotent appends cause no snapshot churn.
    *
    * A lost publish race here is RETRIED (bounded): a snapshot commit
    * carries no writer-private content — it pins whatever the store's
    * current artifact generations are — so when another committer wins
    * the generation number, re-reading and re-pinning the (possibly
    * newer) current state is always sound. This is what lets the
    * single-accreting-artifact concurrent appenders
    * ([[StoreGenerations.commitOwn]], e.g. the vector store's codes
    * chain) each snapshot-commit after their chain commit without
    * coordinating. The single-writer contract REMAINS for
    * multi-artifact mutations (a sig/BM25 append spans chains, and
    * concurrent interleavings could snapshot a torn cross-artifact
    * state — see [[SignatureStore.append]]'s scaladoc). */
  def commit(kind: String, path: String): Long = {
    var attempt = 0
    while (true) {
      val cur = currentGen(path).getOrElse(
        sys.error(s"$path has no store snapshot chain — StoreSnapshots" +
          ".enable first"))
      val lines = entries(kind, path)
      val unchanged = io(path).read(s"${mdir(path)}/gen=$cur")
        .contains(lines.mkString("\n"))
      if (unchanged) return cur
      try {
        publish(path, cur + 1, lines)
        return cur + 1
      } catch {
        case e: graft.sources.LostPublishRace =>
          attempt += 1
          if (attempt >= 16) throw e
      }
    }
    sys.error("unreachable")
  }

  /** [[commit]] when the store is snapshotted, no-op otherwise — the
    * unconditional call every append path makes. */
  def commitIfSnapshotted(kind: String, path: String): Option[Long] =
    if (isSnapshotted(path)) Some(commit(kind, path)) else None

  /** FILE-LEVEL store commit — the multi-writer append primitive for
    * MULTI-ARTIFACT stores, where per-chain commits cannot work
    * ([[SignatureStore.append]]'s scaladoc has the torn-state
    * argument): the snapshot manifest itself becomes the lone commit
    * point. The writer lands its batch PRIVATELY in every artifact
    * ([[StoreGenerations.landOwn]]/[[landOwnBucketed]] — untouched
    * chains, invisible files), then CAS-publishes the next snapshot =
    * the current snapshot's lines + one `d` entry per landed file.
    * One conditional create spans ALL artifacts, so a reader pins
    * either the whole batch or none of it — bands always with their
    * sets, postings always with their df; and a lost race re-bases on
    * the winner's snapshot (which carries the winner's `d` lines) and
    * retries, so every surviving snapshot differs from its parent by
    * exactly one writer's whole cross-artifact batch.
    *
    * The chains stay behind deliberately: [[fold]] (run from the
    * exclusive maintenance path) adopts pending `d` files into each
    * artifact's chain and retires the `d` lines — compaction and
    * vacuum then see them as ordinary chained files. Replaying a
    * commit whose files are all covered (as `d` lines or folded into
    * the pinned chains) returns the current snapshot unchanged;
    * partial foreign coverage fails loudly. */
  def commitOwnStore(kind: String, path: String,
                     filesByArtifact: Map[String, Seq[String]],
                     maxAttempts: Int = 16): Long = {
    require(filesByArtifact.nonEmpty, "commitOwnStore with no artifacts")
    val base = canon(path)
    val mine: Seq[(String, String)] = filesByArtifact.toSeq.flatMap {
      case (dir, files) =>
        require(files.nonEmpty, s"commitOwnStore with no files for $dir")
        val cDir = canon(dir)
        require(cDir.startsWith(base + "/"),
          s"artifact outside the store: $dir is not under $path")
        files.map { f =>
          val cf = canon(f)
          require(cf.startsWith(cDir + "/"),
            s"commitOwnStore file outside its artifact: $f not under $dir")
          require(exists(cf),
            s"commitOwnStore file does not exist (land first): $f")
          (cDir, cf)
        }
    }
    val myLines = mine.map { case (d, f) =>
      s"d\t${rel(path, d)}\t${rel(path, f)}"
    }
    var attempt = 0
    while (true) {
      val cur = currentGen(path).getOrElse(sys.error(
        s"$path has no store snapshot chain — concurrent multi-artifact " +
          "appends need one (StoreSnapshots.enable first)"))
      val content = io(path).read(s"${mdir(path)}/gen=$cur").getOrElse(
        throw new IllegalStateException(
          s"store snapshot gen=$cur under $path vanished mid-commit"))
      val lines = content.split("\n", -1).toSeq.filter(_.nonEmpty)
      val coveredD = lines.filter(_.startsWith("d\t")).toSet
      val pinnedChainFiles: Map[String, Set[String]] = lines.collect {
        case l if l.startsWith("a\t") =>
          val Array(_, r, g) = l.split("\t", 3)
          val dir = canon(s"$path/$r")
          dir -> StoreGenerations.filesAt(dir, g.toLong)
            .getOrElse(Seq.empty).map(canon).toSet
      }.toMap
      val covered = mine.zip(myLines).count { case ((d, f), l) =>
        coveredD.contains(l) ||
          pinnedChainFiles.getOrElse(d, Set.empty).contains(f)
      }
      if (covered == mine.length) return cur // replay: whole batch committed
      require(covered == 0,
        s"commitOwnStore batch under $path is PARTIALLY covered " +
          s"($covered/${mine.length} files already committed) — a foreign " +
          "commit adopted part of this batch; one batch must be committed " +
          "by exactly one commitOwnStore call")
      mine.foreach { case (d, _) =>
        require(pinnedChainFiles.contains(d),
          s"$d is not pinned by the current store snapshot of $path — " +
            "the artifact did not exist at enable time (re-commit the " +
            "store to adopt it before concurrent appends)")
      }
      try {
        publish(path, cur + 1, lines ++ myLines)
        return cur + 1
      } catch {
        case e: graft.sources.LostPublishRace =>
          attempt += 1
          if (attempt >= maxAttempts) throw e
      }
    }
    sys.error("unreachable")
  }

  /** Adopt every pending file-level commit into its artifact's chain
    * and publish the snapshot that retires the `d` lines — run from
    * the EXCLUSIVE maintenance path before compaction/vacuum, so
    * those only ever see ordinary chained files. No-op (returns the
    * current generation) when nothing is pending or the store is not
    * snapshotted. */
  def fold(kind: String, path: String): Option[Long] =
    currentGen(path).map { cur =>
      val content = io(path).read(s"${mdir(path)}/gen=$cur").getOrElse("")
      val pending = content.split("\n", -1).toSeq
        .filter(_.startsWith("d\t"))
        .map { l =>
          val Array(_, rDir, rFile) = l.split("\t", 3)
          (s"$path/$rDir", s"$path/$rFile")
        }
        .groupBy(_._1).map { case (d, fs) => d -> fs.map(_._2) }
      if (pending.isEmpty) cur
      else {
        pending.foreach { case (dir, files) =>
          StoreGenerations.commitOwn(dir, files)
        }
        commit(kind, path) // entries() drops the now-chain-covered d lines
      }
    }

  /** One resolved snapshot: every chained artifact's pinned
    * generation, seeds verified. Readers hold a Pin for the duration
    * of one logical query — every artifact read through it is
    * mutually consistent however many commits land meanwhile. */
  final class Pin private[StoreSnapshots] (
      spark: SparkSession, storePath: String, val gen: Long,
      pins: Map[String, Long], dFiles: Map[String, Seq[String]]) {

    /** The artifact at ITS PINNED GENERATION — never the current one —
      * PLUS any file-level commit entries this snapshot carries for it
      * (a concurrent writer's batch the chain has not folded yet):
      * one combined file list, one scan, `basePath` preserved so
      * bucket-partition directories keep their partition column. */
    def read(artifactDir: String): DataFrame =
      pins.get(canon(artifactDir)) match {
        case Some(g) =>
          val chainFiles = StoreGenerations.filesAt(artifactDir, g)
            .getOrElse(throw new IllegalStateException(
              s"no generation <= $g survives under $artifactDir: store " +
                s"snapshot gen=$gen pins outside the artifact's vacuum " +
                "keep window — re-pin to a kept snapshot"))
          val extra = dFiles.getOrElse(canon(artifactDir), Seq.empty)
          spark.read.option("basePath", artifactDir)
            .parquet((chainFiles ++ extra): _*)
        case None => throw new IllegalStateException(
          s"$artifactDir is not pinned by store snapshot gen=$gen of " +
            s"$storePath — the artifact did not exist when the snapshot " +
            "committed (re-commit the store to adopt it)")
      }

    private[ext] def pinnedGens: Map[String, Long] = pins
    private[ext] def pinnedDFiles: Map[String, Seq[String]] = dFiles
  }

  /** Resolve the CURRENT snapshot: parse its artifact pins and verify
    * every frozen-seed entry (existence + size) LOUDLY, before any
    * scan. One listing + one manifest read + seed stats — driver-side,
    * kilobytes. */
  def pin(spark: SparkSession, path: String): Pin = {
    val gen = currentGen(path).getOrElse(
      sys.error(s"$path has no store snapshot chain"))
    pinAt(spark, path, gen)
  }

  /** [[pin]] at an explicit snapshot generation (time travel within
    * the vacuum keep window — same contract as the chain layer's
    * `readAt`: a vacuumed pin fails loudly). */
  def pinAt(spark: SparkSession, path: String, gen: Long): Pin = {
    val content = io(path).read(s"${mdir(path)}/gen=$gen")
      .getOrElse(throw new IllegalStateException(
        s"no store snapshot gen=$gen under $path: the pin is outside " +
          "the vacuum keep window — re-pin to a kept snapshot"))
    val lines = content.split("\n", -1).toSeq.filter(_.nonEmpty)
    val pins = lines.collect {
      case l if l.startsWith("a\t") =>
        val Array(_, r, g) = l.split("\t", 3)
        canon(s"$path/$r") -> g.toLong
    }.toMap
    val dFiles = lines.collect {
      case l if l.startsWith("d\t") =>
        val Array(_, rDir, rFile) = l.split("\t", 3)
        canon(s"$path/$rDir") -> s"$path/$rFile"
    }.groupBy(_._1).map { case (d, fs) => d -> fs.map(_._2) }
    lines.foreach {
      case l if l.startsWith("f\t") =>
        val Array(_, r, sz) = l.split("\t", 3)
        val p = s"$path/$r"
        if (!exists(p))
          throw new IllegalStateException(
            s"seed file missing at resolve time: $p (inventoried by " +
              s"store snapshot gen=$gen) — the store's frozen artifact " +
              "was deleted or moved; rebuild or re-enable the store")
        val now = java.nio.file.Files.size(java.nio.file.Paths.get(p))
        if (now != sz.toLong)
          throw new IllegalStateException(
            s"seed file modified at resolve time: $p is $now bytes, " +
              s"snapshot gen=$gen inventoried ${sz.toLong} — frozen " +
              "artifacts must not change outside a rebuild; re-enable " +
              "the store to adopt the new seed")
      case _ => ()
    }
    new Pin(spark, path, gen, pins, dFiles)
  }

  /** The read hook every store face uses: a snapshot-pinned resolver
    * when the store carries a chain (ONE pin per face call — all
    * artifacts mutually consistent), the per-artifact current read
    * otherwise (pre-snapshot behavior, bit-identical). */
  def reader(spark: SparkSession, path: String): String => DataFrame =
    if (isSnapshotted(path)) {
      val p = pin(spark, path)
      dir => p.read(dir)
    } else dir => StoreGenerations.read(spark, dir)

  /** [[reader]] pinned to an EXPLICIT snapshot generation — store-level
    * TIME TRAVEL: every artifact resolves at the generation snapshot
    * `gen` pinned (mutually consistent by construction — for BM25 that
    * means the historical postings score against the HISTORICAL df and
    * (N, T), not today's), seeds verified, and a vacuumed generation
    * fails loudly at resolve ([[pinAt]]'s contract). Requires a
    * snapshotted store: per-artifact chains alone have no cross-
    * artifact generation mapping to travel along. */
  def readerAt(spark: SparkSession, path: String,
               gen: Long): String => DataFrame = {
    val p = pinAt(spark, path, gen)
    dir => p.read(dir)
  }

  /** Snapshot-aware store vacuum: retire store snapshots beyond the
    * newest `keepGens`, then vacuum each chained artifact keeping its
    * newest generation PLUS every generation a SURVIVING snapshot
    * pins — a reader pinned to any kept snapshot still resolves every
    * artifact it names. Returns (files deleted, manifests deleted —
    * artifact manifests + store snapshots). */
  def vacuum(kind: String, path: String, keepGens: Int): (Int, Int) = {
    require(keepGens >= 1, "must keep at least one snapshot")
    val all = gens(path)
    require(all.nonEmpty, s"no store snapshots under $path")
    val (drop, keep) = all.splitAt(math.max(0, all.length - keepGens))
    val keptLines = keep.flatMap { g =>
      io(path).read(s"${mdir(path)}/gen=$g").getOrElse("")
        .split("\n", -1).toSeq.filter(_.nonEmpty)
    }
    val pinned: Map[String, Set[Long]] = keptLines
      .filter(_.startsWith("a\t"))
      .map { l =>
        val Array(_, r, ag) = l.split("\t", 3)
        canon(s"$path/$r") -> ag.toLong
      }
      .groupBy(_._1).map { case (d, gs) => d -> gs.map(_._2).toSet }
    // file-level commit entries of surviving snapshots: not chained
    // yet (fold retires them), so the artifact vacuum must be told
    // explicitly to spare them
    val dPinned: Map[String, Set[String]] = keptLines
      .filter(_.startsWith("d\t"))
      .map { l =>
        val Array(_, rDir, rFile) = l.split("\t", 3)
        canon(s"$path/$rDir") -> s"$path/$rFile"
      }
      .groupBy(_._1).map { case (d, fs) => d -> fs.map(_._2).toSet }
    val (nf, nm) = StoreMaintenance.artifactsOf(kind, path)
      .map(_.dir).filter(StoreGenerations.isGenerational)
      .map(d => StoreGenerations.vacuumKeeping(d, 1,
        pinned.getOrElse(canon(d), Set.empty),
        dPinned.getOrElse(canon(d), Set.empty)))
      .foldLeft((0, 0)) { case ((a, b), (c, e)) => (a + c, b + e) }
    drop.foreach(g => io(path).delete(s"${mdir(path)}/gen=$g"))
    (nf, nm + drop.length)
  }
}
