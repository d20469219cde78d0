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
  *
  * The `f` entries inventory the store's FROZEN artifacts — the seed
  * files an append never touches (params, trained centroids/codebook,
  * the release store's quality models). They were previously outside
  * any manifest discipline: a deleted or overwritten seed surfaced
  * only as a scan error (or worse, silently different scores).
  * [[pin]] verifies every `f` entry's existence AND size at RESOLVE
  * time and fails loudly naming the seed, before any Spark job runs.
  *
  * Contracts (inherited from the chain layer):
  *  - SINGLE WRITER per store: appends, compactions, and snapshot
  *    commits serialize; a lost publish race raises.
  *  - READERS ARE FREE: a [[Pin]] resolves every artifact at the
  *    generation one snapshot names; those generations survive any
  *    vacuum that keeps the snapshot ([[vacuum]] pins them).
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
    * frozen file with its size. */
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
    aLines ++ fLines
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

  /** One resolved snapshot: every chained artifact's pinned
    * generation, seeds verified. Readers hold a Pin for the duration
    * of one logical query — every artifact read through it is
    * mutually consistent however many commits land meanwhile. */
  final class Pin private[StoreSnapshots] (
      spark: SparkSession, storePath: String, val gen: Long,
      pins: Map[String, Long]) {

    /** The artifact at ITS PINNED GENERATION — never the current one. */
    def read(artifactDir: String): DataFrame =
      pins.get(canon(artifactDir)) match {
        case Some(g) => StoreGenerations.readAt(spark, artifactDir, g)
        case None => throw new IllegalStateException(
          s"$artifactDir is not pinned by store snapshot gen=$gen of " +
            s"$storePath — the artifact did not exist when the snapshot " +
            "committed (re-commit the store to adopt it)")
      }

    private[ext] def pinnedGens: Map[String, Long] = pins
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
    new Pin(spark, path, gen, pins)
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
    val pinned: Map[String, Set[Long]] = keep
      .flatMap { g =>
        io(path).read(s"${mdir(path)}/gen=$g").getOrElse("")
          .split("\n", -1).toSeq.filter(_.startsWith("a\t"))
          .map { l =>
            val Array(_, r, ag) = l.split("\t", 3)
            canon(s"$path/$r") -> ag.toLong
          }
      }
      .groupBy(_._1).map { case (d, gs) => d -> gs.map(_._2).toSet }
    val (nf, nm) = StoreMaintenance.artifactsOf(kind, path)
      .map(_.dir).filter(StoreGenerations.isGenerational)
      .map(d => StoreGenerations.vacuumKeeping(d, 1,
        pinned.getOrElse(canon(d), Set.empty)))
      .foldLeft((0, 0)) { case ((a, b), (c, e)) => (a + c, b + e) }
    drop.foreach(g => io(path).delete(s"${mdir(path)}/gen=$g"))
    (nf, nm + drop.length)
  }
}
