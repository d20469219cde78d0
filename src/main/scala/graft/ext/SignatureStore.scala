package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash signature store — the artifact that makes the
  * daily incremental near-dup check O(batch), not O(corpus).
  *
  * [[Dedup.incrementalNearDups]] recomputes the INDEX side's band
  * table on every ingest run: at production scale the index is the
  * whole corpus, so the daily check re-shingles and re-hashes 100 TB
  * to answer a question about a few GB of new documents — pure waste,
  * since MinHash signatures are content-deterministic. The store
  * persists what the index contributes to the check, once:
  *
  *   <path>/bands.parquet   (doc_id, band, bkey)     - LSH probe table
  *   <path>/sets.parquet    (doc_id, shingles)       - verification sets
  *   <path>/params.parquet  (shingle_n, num_hashes)  - the signature
  *                          config, so every later reader/appender
  *                          derives THE SAME bands (a mismatched
  *                          probe joins nothing and silently loses
  *                          recall -- ingest/append therefore read the
  *                          config from the store, never from args)
  *
  * Ingest-time scale shape (the reason this exists): the batch's band
  * keys are BROADCAST to the store scan, so the store-side band table
  * is scanned once and never shuffled; bucket-cap sizing counts only
  * PROBED buckets (identical to the direct route's per-bucket counts
  * on those buckets — unprobed buckets cannot produce candidates);
  * the verification sets are semi-joined to the candidate index ids
  * (broadcast again) so sets.parquet is scanned, never shuffled. Every
  * shuffle in the plan is proportional to the batch's collisions, not
  * the corpus. With the direct route, the same ingest pays two full
  * index shuffles (signature agg + set agg) before the first
  * candidate appears.
  *
  * Same output contract as [[Dedup.incrementalNearDups]]:
  * (new_id, index_id, jaccard), jaccard >= minJaccard, exact shingle
  * verification. IncrStoredSpec pins store-route == direct-route on
  * the same inputs, including under a bucket cap and across an
  * append. Caller contract (unchanged from the direct route): id
  * spaces are disjoint; [[append]] is how a verified batch becomes
  * part of tomorrow's index.
  *
  * Reference behavior context: the reference re-reads its full corpus
  * per run (eager pandas, no persisted derived state) — this store is
  * the piece a 100 TB deployment adds, not a translation. */
object SignatureStore {

  private def bandsOf(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int, numHashes: Int): DataFrame =
    Dedup.nativeBands(df, idCol, textCol, shingleN, numHashes)
      .select(col(idCol).cast("long").as("doc_id"), col("band"), col("bkey"))

  private def setsOf(df: DataFrame, idCol: String, textCol: String,
                     shingleN: Int): DataFrame =
    Dedup.shingleRows(df, idCol, textCol, shingleN)
      .groupBy(col(idCol))
      .agg(collect_list(col("shingle")).as("shingles"))
      .select(col(idCol).cast("long").as("doc_id"), col("shingles"))

  /** Build (or rebuild — overwrite) the store from the current index.
    * One signature pass and one shingle-set pass over the corpus; both
    * are the same aggregations the direct route pays PER RUN. */
  def build(index: DataFrame, idCol: String, textCol: String, path: String,
            shingleN: Int = 3, numHashes: Int = 8): Unit = {
    StoreSnapshots.invalidate(path) // a rebuild starts un-snapshotted
    val spark = index.sparkSession
    import spark.implicits._
    // the three artifacts are independent derivations — overlap their
    // writes so each one's stage tail back-fills the others (Par doc)
    Par.run(
      () => bandsOf(index, idCol, textCol, shingleN, numHashes)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/bands.parquet"),
      () => setsOf(index, idCol, textCol, shingleN)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/sets.parquet"),
      () => Seq((shingleN, numHashes)).toDF("shingle_n", "num_hashes")
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/params.parquet"))
  }

  /** The store's signature config — 1 row, driver-side (the
    * bounded-collect class: two ints). */
  def params(spark: SparkSession, path: String): (Int, Int) = {
    val row = spark.read.parquet(s"$path/params.parquet").head()
    (row.getAs[Int]("shingle_n"), row.getAs[Int]("num_hashes"))
  }

  /** Fold a verified batch into the store (append-only; the batch's
    * bands/sets are derived under the STORE's config, so an appended
    * doc is probe-able tomorrow exactly as a built doc is). Caller
    * guarantees the batch's ids are new — the store has no dedup of
    * its own (same contract as the direct route's id-disjointness).
    *
    * On a [[StoreGenerations]]-enabled store each artifact publishes
    * the next generation after its write (readers never see a
    * half-appended batch's files mixed into an older pin).
    * `autoMaintain` is the in-band lifecycle knob (the store-side
    * mirror of the merge sink's `maintainEvery`): consult the
    * filesystem-metadata trigger after the fold and compact+vacuum
    * exactly the artifacts whose file count crossed the ratio.
    *
    * SINGLE WRITER on THIS path — this append's consistency unit
    * spans TWO chains (bands and sets must cover the same doc set, or
    * a band-probe candidate loses its verification set), and
    * per-chain commits — however each one is made, CAS included — can
    * interleave across writers so that a store-level snapshot taken
    * between them pins a torn cross-artifact state. CONCURRENT
    * writers therefore commit through the snapshot manifest itself as
    * the lone commit point ([[appendOwn]] →
    * [[StoreSnapshots.commitOwnStore]]: one conditional create names
    * the writer's files across ALL artifacts), never through the
    * chains. */
  def append(incoming: DataFrame, idCol: String, textCol: String,
             path: String,
             autoMaintain: Option[StoreMaintenance.AutoMaintain] = None)
      : Unit = {
    val spark = incoming.sparkSession
    val (shingleN, numHashes) = params(spark, path)
    // overlap the two independent artifact WRITES (guide §2.6); the
    // chain commits keep their documented order below, after both
    Par.run(
      () => bandsOf(incoming, idCol, textCol, shingleN, numHashes)
        .write.mode(SaveMode.Append).parquet(s"$path/bands.parquet"),
      () => setsOf(incoming, idCol, textCol, shingleN)
        .write.mode(SaveMode.Append).parquet(s"$path/sets.parquet"))
    StoreGenerations.commitAppend(s"$path/bands.parquet")
    StoreGenerations.commitAppend(s"$path/sets.parquet")
    // the store-level atomic commit point: on a snapshotted store,
    // readers keep resolving the previous snapshot's (bands, sets)
    // pair until BOTH artifact commits above are pinned together here
    StoreSnapshots.commitIfSnapshotted("sig", path)
    autoMaintain.foreach(am => StoreMaintenance.maintainIfNeeded(spark,
      StoreMaintenance.artifactsOf("sig", path), am,
      snapshot = Some(("sig", path))))
  }

  /** CONCURRENT append — any number of writers fold verified batches
    * into the store AT ONCE, on a SNAPSHOTTED store: the batch's
    * bands and sets land privately in both artifacts
    * ([[StoreGenerations.landOwn]] — chains untouched, files
    * invisible), then ONE file-level snapshot commit
    * ([[StoreSnapshots.commitOwnStore]]) publishes them atomically
    * across both artifacts — a reader pins the whole batch or none of
    * it (bands always with their verification sets), a lost race
    * re-bases on the winner's snapshot and retries, and the exclusive
    * maintenance path's [[StoreSnapshots.fold]] later adopts the
    * files into the chains. Same derivation and id-disjointness
    * contract as [[append]]. Returns the published snapshot
    * generation. */
  def appendOwn(incoming: DataFrame, idCol: String, textCol: String,
                path: String, writerTag: String): Long = {
    val spark = incoming.sparkSession
    require(StoreSnapshots.isSnapshotted(path),
      s"concurrent multi-artifact append needs store snapshots on $path " +
        "(StoreSnapshots.enable first) — the snapshot manifest is the " +
        "lone commit point that keeps bands and sets atomic")
    val (shingleN, numHashes) = params(spark, path)
    val bands = StoreGenerations.landOwn(
      bandsOf(incoming, idCol, textCol, shingleN, numHashes),
      s"$path/bands.parquet", writerTag)
    val sets = StoreGenerations.landOwn(
      setsOf(incoming, idCol, textCol, shingleN),
      s"$path/sets.parquet", writerTag)
    StoreSnapshots.commitOwnStore("sig", path, Map(
      s"$path/bands.parquet" -> bands,
      s"$path/sets.parquet" -> sets))
  }

  /** REPLAY-SAFE append for a STREAMING ingest — exactly-once store
    * state from idempotence ([[StoreGenerations.landCanonical]]: one
    * canonical `gb<batchId>` file per artifact per batch, adopted by
    * the generation chains; a replayed batch overwrites its own files
    * and commits nothing). Requires chains on bands + sets
    * (`StoreMaintain enable sig <path>`). The batch's bands/sets
    * derive under the STORE's config, same as [[append]]. */
  def appendCanonical(incoming: DataFrame, idCol: String, textCol: String,
                      path: String, batchId: Long,
                      runTag: String = ""): Unit = {
    val spark = incoming.sparkSession
    val (shingleN, numHashes) = params(spark, path)
    StoreGenerations.landCanonical(
      bandsOf(incoming, idCol, textCol, shingleN, numHashes),
      s"$path/bands.parquet", batchId, runTag)
    StoreGenerations.landCanonical(
      setsOf(incoming, idCol, textCol, shingleN),
      s"$path/sets.parquet", batchId, runTag)
    StoreSnapshots.commitIfSnapshotted("sig", path)
  }

  /** The daily check: near-dups of `incoming` against the STORE
    * (never the raw index). Output (new_id, index_id, jaccard) —
    * bit-identical to [[Dedup.incrementalNearDups]] over the same
    * logical index, spec-pinned.
    *
    * `broadcastBatch` is on by default — an ingest batch is small by
    * definition; a deployment whose batch outgrows the driver flips
    * it off and pays a shuffle join instead (the store still scans
    * once either way). */
  def ingest(spark: SparkSession, path: String, incoming: DataFrame,
             idCol: String, textCol: String,
             minJaccard: Double = 0.5,
             maxBucketSize: Int = Int.MaxValue,
             broadcastBatch: Boolean = true,
             resolve: Option[String => DataFrame] = None): DataFrame = {
    // resolve FIRST: on a snapshotted store this verifies the frozen
    // seeds (params) loudly before any scan plans
    val rd = resolve.getOrElse(StoreSnapshots.reader(spark, path))
    val (shingleN, numHashes) = params(spark, path)
    val mark = if (broadcastBatch) (df: DataFrame) => broadcast(df)
               else identity[DataFrame] _
    val bN = bandsOf(incoming, idCol, textCol, shingleN, numHashes)
      .withColumnRenamed("doc_id", "new_id")
    // generation-aware: a chained store's probe resolves a pinned
    // file list, so maintenance can compact concurrently. ONE
    // resolver for bands AND sets: on a snapshotted store both come
    // from the same snapshot (a candidate id surfaced by the band
    // probe always has its verification set — mixed generations
    // could silently drop a pair). `resolve` lets a composed caller
    // (the release loop) thread ITS store-level pin through.
    val bI = rd(s"$path/bands.parquet")
    // store rows inside probed buckets only: the broadcast join keeps
    // every index row of every bucket the batch touches, so counting
    // THESE rows per (band, bkey) reproduces the direct route's index
    // bucket sizes exactly where it matters (unprobed buckets cannot
    // produce candidates, so their sizes are unobservable either way).
    // mark() applies AT the use sites -- a broadcast hint does not
    // survive the distinct() aggregation boundary
    val probed = bI.join(mark(bN.select("band", "bkey").distinct()),
      Seq("band", "bkey")).localCheckpoint()
    val inCap =
      if (maxBucketSize == Int.MaxValue) probed
      else {
        val small = probed.groupBy("band", "bkey")
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") <= maxBucketSize)
          .select("band", "bkey")
        probed.join(small, Seq("band", "bkey"), "left_semi")
      }
    // candidates feed the verification join and the set semi-join --
    // checkpoint so the band join runs once (same policy as the
    // direct route)
    val cand = inCap.join(mark(bN), Seq("band", "bkey"))
      .select(col("new_id"), col("doc_id").as("index_id")).distinct()
      .localCheckpoint()
    val setsN = setsOf(incoming, idCol, textCol, shingleN)
      .select(col("doc_id").as("new_id"), col("shingles").as("__seta"))
    val candIdx = mark(cand.select(col("index_id").as("doc_id")).distinct())
    val setsI = rd(s"$path/sets.parquet")
      .join(candIdx, Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("index_id"), col("shingles").as("__setb"))
    val inter = size(array_intersect(col("__seta"), col("__setb")))
    val union = size(col("__seta")) + size(col("__setb")) - inter
    cand.join(setsN, Seq("new_id")).join(setsI, Seq("index_id"))
      .select(col("new_id"), col("index_id"),
        (inter.cast("double") / union).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
