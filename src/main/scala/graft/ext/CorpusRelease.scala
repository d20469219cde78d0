package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The LLM-side analogue of `graft.f1.F1Dashboard`: one driver program
  * composing the individually-gated corpus operators into a dataset
  * RELEASE — dedup cascade (URL → exact → near) → benchmark
  * decontamination → quality routing → sequence packing → shard plan
  * → data card — and writing the whole audit bundle to one output
  * tree. Every stage is an operator that already passes its own
  * oracle (`q_dedup_cascade`, `q_decontaminate`, `q_quality_route`,
  * `q_seq_packing`, `q_shard_plan`, `q_data_card`); this object pins
  * their COMPOSITION: each stage consumes exactly the previous
  * stage's survivor set, the quality models (language profiles, the
  * unigram LM) train on the post-dedup post-decon corpus they score,
  * and the manifest ledgers every document's disposition so
  * `input = kept + Σ dropped` is checkable by the gate
  * (`q_corpus_release`) and by CorpusReleaseSpec's goldens.
  *
  * Scale shape: nothing here adds a shuffle beyond the member
  * operators' own (measured) shapes. The two survivor frames that
  * feed multiple downstream consumers (`afterDedup` feeds the decon
  * join and the ledger; `clean` feeds three quality scorers) are
  * localCheckpoint-ed so the cascade's CC iteration is not replayed
  * per consumer — a cluster deployment would persist MEMORY_AND_DISK
  * instead. The manifest is a union of one-row aggregates over those
  * checkpointed frames: bounded, no driver-side loops.
  */
object CorpusRelease {

  /** The release artifacts, each a frame a deployment writes next to
    * its shards: per-doc disposition ledger, pack and shard
    * assignments for the kept set, the data card, and the per-stage
    * manifest `(stage, metric, value)` the gate checks. */
  final case class Bundle(ledger: DataFrame, packs: DataFrame,
                          shards: DataFrame, card: DataFrame,
                          manifest: DataFrame)

  /** Runs the full release chain.
    *
    * @param corpus        (doc_id, text, url, lang, source)
    * @param benchmark     (doc_id, text) — the held-out eval set whose
    *                      5-gram overlaps disqualify training docs
    * @param maxBucketSize LSH bucket cap for the near-dup stage (the
    *                      production skew guard — see
    *                      [[Dedup.lshCandidates]]). The manifest
    *                      RECORDS the posture either way: its 3_near
    *                      rows carry contract = 'lsh_capped' /
    *                      'lsh_uncapped' plus the bucket-drop audit
    *                      (buckets capped, pre-filter pairs not
    *                      generated), so a release ledger states its
    *                      own recall contract instead of implying
    *                      completeness it didn't buy.
    */
  def run(corpus: DataFrame, benchmark: DataFrame,
          packTokens: Int = 512, shardTokens: Long = 2000L,
          maxBucketSize: Int = Int.MaxValue): Bundle = {
    // --- stage 1-3: the dedup cascade (cheapest key first; each
    // stage only sees the previous stage's keepers) ---------------
    val uk = corpus.withColumn("__uk",
      min("doc_id").over(Window.partitionBy(UrlOps.normalize(col("url")))))
    val uDropped = uk.filter(col("doc_id") =!= col("__uk"))
      .select(col("doc_id"), lit("url").as("disposition"))
    val ek = uk.filter(col("doc_id") === col("__uk"))
      .withColumn("__ek",
        min("doc_id").over(Window.partitionBy(md5(col("text")))))
    val eDropped = ek.filter(col("doc_id") =!= col("__ek"))
      .select(col("doc_id"), lit("exact").as("disposition"))
    val se = ek.filter(col("doc_id") === col("__ek"))
      .select("doc_id", "text", "lang", "source")
    val nearIds = Dedup.connectedComponents(
        Dedup.nearDupPairs(se, "doc_id", "text",
          maxBucketSize = maxBucketSize).select("doc_a", "doc_b"),
        "doc_a", "doc_b")
      .filter(col("id") =!= col("component"))
      .select(col("id").as("doc_id"))
    val nDropped = nearIds.select(col("doc_id"),
      lit("near").as("disposition"))
    val afterDedup = se.join(nearIds, Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // --- stage 4: benchmark decontamination ----------------------
    val contamIds = Dedup.decontaminate(afterDedup, benchmark,
        "doc_id", "text", n = 5, minOverlap = 3)
      .select("doc_id")
    val cDropped = contamIds.select(col("doc_id"),
      lit("contaminated").as("disposition"))
    val clean = afterDedup.join(contamIds, Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // --- stage 5: quality routing (models train on the corpus they
    // score — the post-dedup post-decon survivors) ----------------
    val gopher = TextOps.gopherQuality(clean, "doc_id", "text",
        minTokens = 30)
      .select(col("doc_id"), col("pass").as("__gp"))
    val surp = TextOps.lmSurprisal(clean, "doc_id", "text")
      .select(col("doc_id"), col("n_tokens").as("__nt"),
        col("surprisal_bits").as("__sb"))
    val lid = TextOps.langId(clean, "doc_id", "text", "lang")
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

    // --- stages 6-8 over the released set ------------------------
    val packs = TextOps.seqPack(fin.select("doc_id", "text", "source"),
      "doc_id", "text", "source", budgetTokens = packTokens)
    val shards = Sampling.shardPlan(fin, "doc_id", "text", shardTokens)
    val card = dataCard(fin)

    val ledger = uDropped.unionByName(eDropped).unionByName(nDropped)
      .unionByName(cDropped).unionByName(routed)

    // the near-dup stage's recall-audit face: the LSH buckets the cap
    // dropped from pairwise generation (same band projection the
    // stage keyed on — a zero-shuffle rebuild plus one bounded agg),
    // and the pre-filter pairs those buckets would have emitted
    val nearContract =
      if (maxBucketSize == Int.MaxValue) "lsh_uncapped" else "lsh_capped"
    val overs = Dedup.oversizeBuckets(
      Dedup.nativeBands(se, "doc_id", "text"), maxBucketSize)
      .localCheckpoint()

    // coalesce: a fully-filtered corpus yields NULL sums, and the
    // manifest must still close (0), not crash the release. Every row
    // carries the CONTRACT its stage ran under — 'exact' for the
    // complete deterministic stages, the LSH posture for 3_near.
    def m1(stage: String, metric: String, v: DataFrame,
           contract: String = "exact"): DataFrame =
      v.select(lit(stage).as("stage"), lit(metric).as("metric"),
        coalesce(col(v.columns.head).cast("long"), lit(0L)).as("value"),
        lit(contract).as("contract"))
    val manifest = Seq(
      m1("0_input", "n_docs", corpus.agg(count(lit(1)))),
      m1("1_url", "n_dropped", uDropped.agg(count(lit(1)))),
      m1("2_exact", "n_dropped", eDropped.agg(count(lit(1)))),
      m1("3_near", "n_dropped", nDropped.agg(count(lit(1))), nearContract),
      m1("3_near", "n_buckets_capped", overs.agg(count(lit(1))),
        nearContract),
      m1("3_near", "n_pairs_dropped", overs.agg(
        sum(shiftright(col("bucket_size") * (col("bucket_size") - 1), 1))),
        nearContract),
      m1("4_decon", "n_dropped", cDropped.agg(count(lit(1)))),
      m1("5_quality", "n_drop", routed
        .filter(col("disposition") === "quality_drop").agg(count(lit(1)))),
      m1("5_quality", "n_review", routed
        .filter(col("disposition") === "quality_review").agg(count(lit(1)))),
      m1("5_quality", "n_keep", fin.agg(count(lit(1)))),
      m1("6_pack", "n_packs", packs
        .select("source", "pack_id").distinct().agg(count(lit(1)))),
      m1("6_pack", "n_tokens", packs.agg(sum("n_tokens"))),
      m1("7_shard", "n_shards", shards
        .select("shard_id").distinct().agg(count(lit(1)))),
      m1("8_card", "n_docs", card
        .filter(col("metric") === "n_docs").select("value")),
      m1("8_card", "n_tokens", card
        .filter(col("metric") === "n_tokens").select("value")),
      m1("8_card", "n_vocab", card
        .filter(col("metric") === "n_vocab").select("value")))
      .reduce(_ unionByName _)

    Bundle(ledger, packs, shards, card, manifest)
  }

  /** The release data card over an arbitrary (doc_id, text, lang,
    * source) frame — the same metrics/long-form shape as the
    * standalone `q_data_card`, as a reusable seam. */
  def dataCard(d: DataFrame): DataFrame = {
    val base = d.select(col("lang"), col("source"),
      length(col("text")).cast("long").as("__ch"),
      size(split(col("text"), " ")).cast("long").as("__nt"),
      md5(col("text")).as("__h"))
    val a = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("__nt")).as("n_tokens"),
      sum(col("__ch")).as("n_chars"),
      max(col("__nt")).as("max_doc_tokens"),
      min(col("__nt")).as("min_doc_tokens"),
      (count(lit(1)) - countDistinct(col("__h"))).as("n_exact_dup_docs"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"))
    val vocab = d.select(explode(split(col("text"), " ")).as("tok"))
      .agg(countDistinct(col("tok")).as("n_vocab"))
    a.crossJoin(vocab).selectExpr(
      "stack(9, 'n_docs', n_docs, 'n_tokens', n_tokens, " +
        "'n_chars', n_chars, 'max_doc_tokens', max_doc_tokens, " +
        "'min_doc_tokens', min_doc_tokens, " +
        "'n_exact_dup_docs', n_exact_dup_docs, 'n_langs', n_langs, " +
        "'n_sources', n_sources, 'n_vocab', n_vocab) " +
        "AS (metric, value)")
  }

  /** Ship the release's INGEST INDEX beside its shards: a
    * [[SignatureStore]] built from the released (kept) documents, so
    * tomorrow's batch checks against the release artifact itself
    * (`SignatureStore.ingest`) instead of re-deriving the index side
    * from the shards — the release closing the loop with the
    * incremental operators. The kept set is re-derived from the
    * ledger (disposition == 'kept'), never recomputed: the join
    * reads the already-checkpointed routing frame. Gate
    * `q_release_ingest` runs release → ship → ingest end to end
    * against an oracle that replays the release chain to its kept
    * set and then the direct MinHash chain — the store and the
    * bundle plumbing must both be invisible in the answer. */
  def shipIngestStore(corpus: DataFrame, ledger: DataFrame,
                      path: String): Unit = {
    val kept = corpus.join(
      ledger.filter(col("disposition") === "kept").select("doc_id"),
      Seq("doc_id"))
      .select("doc_id", "text")
    SignatureStore.build(kept, "doc_id", "text", path)
  }

  /** Writes the bundle as one release tree:
    * `outDir/{ledger,packs,shards,data_card,manifest}/` parquet —
    * the artifact set a dataset release ships beside its shards. */
  def writeBundle(b: Bundle, outDir: String): Unit = {
    b.ledger.write.mode("overwrite").parquet(s"$outDir/ledger")
    b.packs.write.mode("overwrite").parquet(s"$outDir/packs")
    b.shards.write.mode("overwrite").parquet(s"$outDir/shards")
    b.card.write.mode("overwrite").parquet(s"$outDir/data_card")
    b.manifest.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/manifest")
  }
}
