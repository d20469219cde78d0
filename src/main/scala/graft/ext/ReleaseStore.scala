package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The release's FULL derived-state artifact + the daily loop that
  * consumes it: release N ships everything release N+1's batch needs,
  * so tomorrow's increment costs O(batch), never O(corpus).
  *
  * [[CorpusRelease.run]] rebuilds the world; [[shipIngestStore]]
  * (round 12) shipped the near-dup index. This object completes the
  * artifact and adds the driver:
  *
  *   <path>/sig/...          [[SignatureStore]] over the RELEASED
  *                           (kept) docs — the near-dup probe index
  *   <path>/urls.parquet     (norm_url) distinct over the release
  *                           INPUT — the seen-URL filter
  *   <path>/hashes.parquet   (h = md5 text) distinct over the release
  *                           INPUT — the seen-content filter
  *   <path>/lm.parquet       (tok, c) + <path>/lm_tot.parquet (n, v)
  *                           — the FROZEN unigram quality LM
  *   <path>/profiles.parquet (lang, prof) — the FROZEN language-ID
  *                           trigram profiles
  *
  * Contract split, stated in the artifact: the IDENTITY filters
  * (urls, hashes) track release-input HISTORY — a url or exact text
  * the release has already judged is never re-admitted, whatever its
  * fate was; the SIMILARITY index tracks the RELEASED corpus — near
  * redundancy is measured against what actually shipped. The quality
  * models are SNAPSHOTS of the release's own training (they trained
  * on its post-dedup post-decon survivors) and stay frozen until a
  * rebuild — the same snapshot semantics as [[VectorIndexStore]]'s
  * geometry; unseen batch tokens smooth to count 0+1 under the frozen
  * (N + V) mass ([[TextOps.lmSurprisalWith]]). The manifest's
  * 5_quality rows carry contract = 'frozen_models' so the ledger
  * records that posture.
  *
  * [[incrementalRelease]] runs the whole release chain over ONE
  * BATCH: seen-url probe → within-batch url keeper → seen-hash probe
  * → within-batch exact keeper → near-dup vs the store
  * ([[SignatureStore.ingest]] — batch broadcast, store scanned once)
  * + within-batch pairs with index-match PROPAGATION (a batch
  * component containing any index-matched doc drops entirely — the
  * released doc wins, transitively) → benchmark decon → frozen-model
  * quality routing → pack/shard/card over the batch's kept set. It
  * then folds the batch into the stores (survivors into the sig
  * index, all batch urls/hashes into the seen filters) so the NEXT
  * batch probes today's — the loop closes. Every shuffle is
  * batch-sized or a broadcast probe into one store scan.
  *
  * Gate `q_incr_release` checks the batch ledger against a DuckDB
  * oracle that replays the full release chain to its kept set and
  * frozen models, then the batch chain DIRECTLY (no store) — the
  * artifact plumbing must be invisible in the dispositions. */
object ReleaseStore {

  private val cleanDispositions =
    Seq("kept", "quality_drop", "quality_review")

  /** Ship the artifact from a finished release (corpus = the release
    * INPUT with url/lang/source; ledger = the release's per-doc
    * dispositions). One pass per store member; the sig build is the
    * same two aggregations the direct incremental route pays PER
    * ingest run. */
  def build(corpus: DataFrame, ledger: DataFrame, path: String): Unit = {
    StoreSnapshots.invalidate(path) // a rebuild starts un-snapshotted
    val kept = corpus.join(
      ledger.filter(col("disposition") === "kept").select("doc_id"),
      Seq("doc_id")).select("doc_id", "text")
    // the quality models train on what the release's did: the
    // post-dedup post-decon survivors (ledger dispositions kept /
    // quality_drop / quality_review = the routing stage's input)
    val clean = corpus.join(
      ledger.filter(col("disposition").isin(cleanDispositions: _*))
        .select("doc_id"),
      Seq("doc_id"))
    val (uni, tot) = TextOps.lmModel(clean, "text")
    // the five store members are independent derivations over corpus/
    // ledger — overlap their builds/writes (guide §2.6 via Par)
    Par.run(
      () => SignatureStore.build(kept, "doc_id", "text", s"$path/sig"),
      () => corpus.select(UrlOps.normalize(col("url")).as("norm_url"))
        .distinct()
        .write.mode(SaveMode.Overwrite).parquet(s"$path/urls.parquet"),
      () => corpus.select(md5(col("text")).as("h")).distinct()
        .write.mode(SaveMode.Overwrite).parquet(s"$path/hashes.parquet"),
      () => uni.select(col("tok"), col("__c").as("c"))
        .write.mode(SaveMode.Overwrite).parquet(s"$path/lm.parquet"),
      () => tot.select(col("__n").as("n"), col("__v").as("v")).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/lm_tot.parquet"),
      () => TextOps.langProfiles(clean, "text", "lang")
        .select(col("__lang").as("lang"), col("__prof").as("prof"))
        .write.mode(SaveMode.Overwrite).parquet(s"$path/profiles.parquet"))
  }

  /** Release N+1 from release N's store + one raw batch
    * (doc_id, text, url, lang, source; ids disjoint from every prior
    * input — the standard store contract). Returns the batch-scoped
    * [[CorpusRelease.Bundle]] (ledger covers EVERY batch doc exactly
    * once; packs/shards/card cover its kept set) and folds the batch
    * into the store. `maxBucketSize` caps BOTH near-dup pair
    * generators (the store probe and the within-batch join) — the
    * same audited posture as the full release. */
  /** `foldBatch = false` skips step i6's store-fold writes (sig
    * append + url/hash appends) and returns the bundle alone — the
    * MEASUREMENT face: a benchmark timing the daily loop repeatedly
    * against a fixed store must see the same store (and therefore the
    * same work) on every run, and the fold's cost is separately
    * measured flat (q_incr_fixed_ingest's curve + two batch-sized
    * appends). Production runs keep the default true — the loop
    * closes by folding today's batch into tomorrow's probes.
    *
    * `canonicalBatch = Some((batchId, runTag))`: the STREAMING fold —
    * every i6 write lands as one canonical `[r<tag>-]gb<batchId>`
    * file per artifact ([[StoreGenerations.landCanonical]]; requires
    * chains on sig bands/sets + urls/hashes — `StoreMaintain enable
    * release <path>`), so a replayed micro-batch overwrites its own
    * bytes and commits nothing: the whole daily loop becomes
    * exactly-once per micro-batch, the merge-sink argument applied to
    * the release store. The probe/route stages are reads and are
    * replay-idempotent by construction. */
  def incrementalRelease(spark: SparkSession, path: String,
                         batch: DataFrame, benchmark: DataFrame,
                         packTokens: Int = 512, shardTokens: Long = 2000L,
                         maxBucketSize: Int = Int.MaxValue,
                         foldBatch: Boolean = true,
                         autoMaintain: Option[StoreMaintenance.AutoMaintain]
                           = None,
                         canonicalBatch: Option[(Long, String)] = None)
      : CorpusRelease.Bundle = {
    // --- i1: seen-URL probe + within-batch url keeper -------------
    val nb = batch.withColumn("__nu", UrlOps.normalize(col("url")))
      .localCheckpoint()
    // generation-aware store probes through ONE resolver: a chained
    // store's readers hold a pinned file list, so an in-band
    // compaction (autoMaintain) never disturbs a probe already
    // planned; on a snapshotted store, urls/hashes/sig all resolve
    // from the SAME snapshot (and the frozen quality models verify)
    val rd = StoreSnapshots.reader(spark, path)
    val seenUrls = rd(s"$path/urls.parquet")
      .join(broadcast(nb.select(col("__nu").as("norm_url")).distinct()),
        Seq("norm_url"))
      .select(col("norm_url").as("__nu"))
    val uk = nb.join(seenUrls, Seq("__nu"), "left_anti")
      .withColumn("__uk", min("doc_id").over(Window.partitionBy("__nu")))
      .filter(col("doc_id") === col("__uk"))
    // drop frames are checkpointed BEFORE the i6 store-fold writes:
    // they (transitively) read the store's urls/hashes/sig files, and
    // a lazy frame re-evaluated after the fold appends would observe
    // post-append store state (exactly-once only by the grace of
    // Spark's pinned file listing, which REFRESH breaks)
    val uDropped = nb.select("doc_id")
      .join(uk.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("url").as("disposition"))
      .localCheckpoint()

    // --- i2: seen-hash probe + within-batch exact keeper ----------
    val hk = uk.withColumn("__h", md5(col("text"))).localCheckpoint()
    val seenH = rd(s"$path/hashes.parquet")
      .join(broadcast(hk.select(col("__h").as("h")).distinct()), Seq("h"))
      .select(col("h").as("__h"))
    val ek = hk.join(seenH, Seq("__h"), "left_anti")
      .withColumn("__ek", min("doc_id").over(Window.partitionBy("__h")))
      .filter(col("doc_id") === col("__ek"))
    val eDropped = hk.select("doc_id")
      .join(ek.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("exact").as("disposition"))
      .localCheckpoint()
    val se = ek.select("doc_id", "text", "url", "lang", "source")
      .localCheckpoint()

    // --- i3: near-dup — store probe + within-batch pairs, with
    // index-match propagation through batch components --------------
    val ingest = SignatureStore.ingest(spark, s"$path/sig",
      se.select("doc_id", "text"), "doc_id", "text",
      maxBucketSize = maxBucketSize, resolve = Some(rd))
    val im = ingest.select(col("new_id").as("id")).distinct()
    val bp = Dedup.nearDupPairs(se.select("doc_id", "text"),
      "doc_id", "text", maxBucketSize = maxBucketSize)
      .select("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(bp, "doc_a", "doc_b")
    val compAll = se.select(col("doc_id").as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id"))
        .as("component"))
      .localCheckpoint()
    val badComp = compAll.join(im, Seq("id")).select("component").distinct()
    val nearIds = compAll
      .join(broadcast(badComp), Seq("component"), "left_semi")
      .select("id")
      .unionByName(compAll.filter(col("id") =!= col("component"))
        .select("id"))
      .distinct()
    val nDropped = nearIds
      .select(col("id").as("doc_id"), lit("near").as("disposition"))
      .localCheckpoint()
    val afterNear = se.join(nearIds.select(col("id").as("doc_id")),
      Seq("doc_id"), "left_anti").localCheckpoint()

    // --- i4: benchmark decontamination (batch-sized) ---------------
    val contamIds = Dedup.decontaminate(afterNear, benchmark,
      "doc_id", "text", n = 5, minOverlap = 3).select("doc_id")
    val cDropped = contamIds.select(col("doc_id"),
      lit("contaminated").as("disposition"))
    val clean = afterNear.join(contamIds, Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // --- i5: quality routing under the FROZEN release models -------
    val uni = spark.read.parquet(s"$path/lm.parquet")
      .select(col("tok"), col("c").as("__c"))
    val tot = spark.read.parquet(s"$path/lm_tot.parquet")
      .select(col("n").as("__n"), col("v").as("__v"))
    val profiles = spark.read.parquet(s"$path/profiles.parquet")
      .select(col("lang").as("__lang"), col("prof").as("__prof"))
    val gopher = TextOps.gopherQuality(clean, "doc_id", "text",
        minTokens = 30)
      .select(col("doc_id"), col("pass").as("__gp"))
    val surp = TextOps.lmSurprisalWith(clean, "doc_id", "text", uni, tot)
      .select(col("doc_id"), col("n_tokens").as("__nt"),
        col("surprisal_bits").as("__sb"))
    val lid = TextOps.langIdWith(clean, "doc_id", "text", "lang", profiles)
      .select(col("doc_id"),
        (col("pred_lang") === col("lang")).as("__lm"))
    val routed = lid.join(surp, "doc_id").join(gopher, "doc_id")
      .select(col("doc_id"),
        when(!col("__gp"), "quality_drop")
          .when(!col("__lm") || col("__sb") * 5 > col("__nt") * 26,
            "quality_review")
          .otherwise("kept").as("disposition"))
      .localCheckpoint()
    val fin = clean.join(routed.filter(col("disposition") === "kept"),
        Seq("doc_id"))
      .select("doc_id", "text", "lang", "source")
      .localCheckpoint()

    // --- i6: delta artifacts over the batch's kept set -------------
    val packs = TextOps.seqPack(fin.select("doc_id", "text", "source"),
      "doc_id", "text", "source", budgetTokens = packTokens)
    val shards = Sampling.shardPlan(fin, "doc_id", "text", shardTokens)
    val card = CorpusRelease.dataCard(fin)
    val ledger = uDropped.unionByName(eDropped).unionByName(nDropped)
      .unionByName(cDropped).unionByName(routed)

    val nearContract =
      if (maxBucketSize == Int.MaxValue) "lsh_uncapped" else "lsh_capped"
    def m1(stage: String, metric: String, v: DataFrame,
           contract: String = "exact"): DataFrame =
      v.select(lit(stage).as("stage"), lit(metric).as("metric"),
        coalesce(col(v.columns.head).cast("long"), lit(0L)).as("value"),
        lit(contract).as("contract"))
    val manifest = Seq(
      m1("0_input", "n_docs", batch.agg(count(lit(1)))),
      m1("1_url", "n_dropped", uDropped.agg(count(lit(1)))),
      m1("2_exact", "n_dropped", eDropped.agg(count(lit(1)))),
      m1("3_near", "n_dropped", nDropped.agg(count(lit(1))), nearContract),
      m1("4_decon", "n_dropped", cDropped.agg(count(lit(1)))),
      m1("5_quality", "n_drop", routed
        .filter(col("disposition") === "quality_drop").agg(count(lit(1))),
        "frozen_models"),
      m1("5_quality", "n_review", routed
        .filter(col("disposition") === "quality_review").agg(count(lit(1))),
        "frozen_models"),
      m1("5_quality", "n_keep", fin.agg(count(lit(1))), "frozen_models"),
      m1("6_pack", "n_packs", packs
        .select("source", "pack_id").distinct().agg(count(lit(1)))),
      m1("7_shard", "n_shards", shards
        .select("shard_id").distinct().agg(count(lit(1)))))
      .reduce(_ unionByName _)

    // --- fold the batch into the store: survivors join the released
    // index, every batch url/hash joins the seen filters — the NEXT
    // batch probes today's ----------------------------------------
    if (foldBatch) canonicalBatch match {
      case Some((batchId, runTag)) =>
        SignatureStore.appendCanonical(fin.select("doc_id", "text"),
          "doc_id", "text", s"$path/sig", batchId, runTag)
        StoreGenerations.landCanonical(
          nb.select(col("__nu").as("norm_url")).distinct(),
          s"$path/urls.parquet", batchId, runTag)
        StoreGenerations.landCanonical(
          nb.select(md5(col("text")).as("h")).distinct(),
          s"$path/hashes.parquet", batchId, runTag)
        StoreSnapshots.commitIfSnapshotted("release", path)
        autoMaintain.foreach(am => StoreMaintenance.maintainIfNeeded(spark,
          StoreMaintenance.artifactsOf("release", path), am,
          snapshot = Some(("release", path))))
      case None =>
        SignatureStore.append(fin.select("doc_id", "text"),
          "doc_id", "text", s"$path/sig")
        nb.select(col("__nu").as("norm_url")).distinct()
          .write.mode(SaveMode.Append).parquet(s"$path/urls.parquet")
        StoreGenerations.commitAppend(s"$path/urls.parquet")
        nb.select(md5(col("text")).as("h")).distinct()
          .write.mode(SaveMode.Append).parquet(s"$path/hashes.parquet")
        StoreGenerations.commitAppend(s"$path/hashes.parquet")
        // store-level atomic commit: tomorrow's probes see today's
        // fold across sig/urls/hashes all at once, never partially
        StoreSnapshots.commitIfSnapshotted("release", path)
        // in-band lifecycle knob (see SignatureStore.append): a daily
        // loop with autoMaintain set needs no external compaction tick
        autoMaintain.foreach(am => StoreMaintenance.maintainIfNeeded(spark,
          StoreMaintenance.artifactsOf("release", path), am,
          snapshot = Some(("release", path))))
    }

    CorpusRelease.Bundle(ledger, packs, shards, card, manifest)
  }
}
