package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted index — the lexical sibling of
  * [[SignatureStore]] (near-dup) and [[VectorIndexStore]] (ANN),
  * completing the persisted-derived-state family: a retrieval batch
  * pays for ITS OWN vocabulary's postings, never a corpus rebuild.
  *
  * [[Retrieval.bm25TopK]] re-tokenizes the corpus, re-counts df, and
  * re-derives the (N, T) totals on every call — the right shape for a
  * one-shot audit, pure waste for the decontamination / corpus-probe
  * lookups a pipeline runs daily against an index that didn't change.
  * The store persists:
  *
  *   <path>/postings.parquet  (doc_id, tok, tf, dl) PARTITIONED BY
  *                            tok_bucket = pmod(xxhash64(tok), B) —
  *                            optionally statically PRUNED to each
  *                            token's top-N impact postings (see
  *                            [[build]])
  *   <path>/df.parquet        (tok, df, tok_bucket) — per-token DELTA
  *                            rows; readers SUM. Persisted separately
  *                            from the postings so pruning never
  *                            touches idf
  *   <path>/stats.parquet     (n_docs, total_dl) — one DELTA row per
  *                            build/append; readers SUM (doc sets are
  *                            disjoint across writes, so N and T are
  *                            exactly additive)
  *   <path>/params.parquet    (tok_buckets) — the bucket fn config,
  *                            read by append/query so every write and
  *                            probe agrees on the layout
  *
  * The layout IS the probe structure: every posting of a token lives
  * in that token's bucket directory, so [[query]] plans the batch's
  * probed buckets first (one tiny job over the query terms — the
  * bounded-collect class) and Spark's file index prunes every other
  * directory at planning time. A batch whose vocabulary hits b of B
  * buckets scans ~b/B of the corpus postings — the inverted-file
  * promise kept at the file level, pinned by the spec on the executed
  * scan's numFiles metric. Within scanned buckets, the query terms
  * broadcast to the scan, so non-query tokens sharing a bucket drop
  * in the first (shuffle-free) join; df and the score join then run
  * over candidate postings only — bounded by Σ_t df(t), the classic
  * inverted-index cost, never corpus×queries.
  *
  * Exactness: df(t) counts postings of token t, which ALL live in t's
  * bucket — a pruned scan is complete for every query token; (N, T)
  * come from the summed delta rows. Every input to the scoring stage
  * is therefore identical to the direct route's over the same logical
  * corpus, and the scores are integer, so [[query]] ==
  * `Retrieval.bm25TopK` bit-for-bit, including across an [[append]]
  * (spec-pinned; the q_bm25_stored gate reuses q_bm25_topk's DuckDB
  * oracle verbatim — the store must be invisible in the answer).
  *
  * Caller contract (same as the sibling stores): appended doc ids are
  * new — the store has no dedup of its own.
  *
  * Reference behavior context: the reference re-reads its full corpus
  * per run (eager pandas, no persisted derived state); this store is
  * the artifact a 100 TB deployment adds, not a translation. */
object RetrievalIndexStore {

  private def postingsOf(df: DataFrame, idCol: String, textCol: String,
                         tokBuckets: Int): DataFrame =
    Retrieval.postings(df, idCol, textCol)
      .select(col(idCol).cast("long").as("doc_id"), col("tok"),
        col("tf"), col("dl"))
      .withColumn("tok_bucket",
        pmod(xxhash64(col("tok")), lit(tokBuckets.toLong)))

  /** The batch's (N, T) contribution, from its postings frame —
    * max(dl) per doc (dl is functionally dependent on the doc), then
    * one bounded row. */
  private def statsOf(post: DataFrame): DataFrame =
    post.groupBy("doc_id").agg(max("dl").as("__dl"))
      .agg(count(lit(1)).as("n_docs"), sum("__dl").as("total_dl"))

  /** Per-token document frequencies from a postings frame — the df
    * SOURCE OF TRUTH the store persists separately so static pruning
    * can drop postings without touching idf: (tok, df, tok_bucket),
    * bucket-partitioned like the postings so a probe prunes both
    * scans the same way. Delta rows per build/append; readers SUM
    * (doc sets are disjoint across writes). */
  private def dfOf(post: DataFrame): DataFrame =
    post.groupBy("tok", "tok_bucket").agg(count(lit(1)).as("df"))

  /** Build (or rebuild — overwrite) the index from the corpus. One
    * tokenize+count pass (checkpointed so the four artifact writes
    * share it) — the same aggregation the direct route pays PER QUERY
    * BATCH.
    *
    * `maxPostingsPerToken` is STATIC INDEX PRUNING (the Carmel et al.
    * technique every production engine ships): keep only each
    * token's `cap` highest-impact postings — rank by (tf desc,
    * dl asc, doc_id asc), the deterministic form of "high term
    * frequency in a short document scores highest" — while df (and
    * therefore idf) stays EXACT from the separately-persisted df
    * table, and (N, T) stay exact from the full corpus. The trade is
    * recall on documents that would have accumulated their score
    * from many weak term hits; the win is a per-token bound on what
    * any future query scans — the flat-at-any-scale serving index.
    * Default MaxValue = no pruning = bit-equal to the direct chain. */
  def build(corpus: DataFrame, idCol: String, textCol: String,
            path: String, tokBuckets: Int = 256,
            maxPostingsPerToken: Int = Int.MaxValue,
            positional: Boolean = false): Unit = {
    StoreSnapshots.invalidate(path) // a rebuild starts un-snapshotted
    val spark = corpus.sparkSession
    import spark.implicits._
    val post = postingsOf(corpus, idCol, textCol, tokBuckets)
      .localCheckpoint()
    val kept =
      if (maxPostingsPerToken == Int.MaxValue) post
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("tok")
          .orderBy(col("tf").desc, col("dl").asc, col("doc_id").asc)
        post.withColumn("__pr", row_number().over(w))
          .filter(col("__pr") <= maxPostingsPerToken).drop("__pr")
      }
    // bucket-keyed repartition before every partitionBy write: a
    // partitionBy off the upstream partitioning mints up to
    // (input partitions × buckets) files — ~25M on a 100 TB scan —
    // while clustering on the bucket key bounds output at one file
    // per (bucket, owning task): ≤ tok_buckets files total, the
    // layout knob a deployment sizes buckets with in the first place
    // the artifacts all derive from the shared checkpointed postings
    // (or the corpus) independently — overlap their writes (Par doc)
    Par.run(
      () => bucketed(kept).write.partitionBy("tok_bucket")
        .mode(SaveMode.Overwrite).parquet(s"$path/postings.parquet"),
      () => bucketed(dfOf(post)).write.partitionBy("tok_bucket")
        .mode(SaveMode.Overwrite).parquet(s"$path/df.parquet"),
      () => statsOf(post).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/stats.parquet"),
      () => if (positional)
        bucketed(positionsOf(corpus, idCol, textCol, tokBuckets))
          .write.partitionBy("tok_bucket")
          .mode(SaveMode.Overwrite).parquet(s"$path/positions.parquet"),
      () => Seq(tokBuckets).toDF("tok_buckets").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/params.parquet"))
  }

  /** Positional postings under the store's bucket layout: (doc_id,
    * pos, tok, tok_bucket) — the artifact that upgrades the stored
    * index from term retrieval to phrase retrieval. NEVER pruned
    * (phrase matching needs every occurrence position; the static
    * pruning trade applies to the scored postings only). */
  private def positionsOf(df: DataFrame, idCol: String, textCol: String,
                          tokBuckets: Int): DataFrame =
    Retrieval.positionalPostings(df, idCol, textCol)
      .select(col(idCol).cast("long").as("doc_id"), col("pos"), col("tok"))
      .withColumn("tok_bucket",
        pmod(xxhash64(col("tok")), lit(tokBuckets.toLong)))

  /** Cluster a bucket-partitioned artifact's rows on their bucket
    * before the partitionBy write (see the [[build]] comment). */
  private def bucketed(df: DataFrame): DataFrame =
    df.repartition(col("tok_bucket"))

  private def hasPositions(path: String): Boolean =
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/positions.parquet"))

  /** The store's layout config — 1 row, driver-side (bounded-collect
    * class: one int). */
  def params(spark: SparkSession, path: String): Int =
    spark.read.parquet(s"$path/params.parquet").head()
      .getAs[Int]("tok_buckets")

  /** Fold a new document batch into the index (append-only; the
    * batch's postings land under the STORE's bucket fn, its df
    * contribution appends as per-token delta rows, its (N, T)
    * contribution as one stats row). Postings are per-doc facts, so
    * batch-local derivation is exact — no cross-doc state to
    * reconcile. On a PRUNED store, appended postings are NOT
    * re-truncated against the resident top-N (that would mean
    * rewriting resident buckets per batch); the cap re-applies at the
    * next rebuild — the same snapshot-until-rebuild posture as the
    * vector index's frozen geometry. df stays exact either way. */
  def append(incoming: DataFrame, idCol: String, textCol: String,
             path: String,
             autoMaintain: Option[StoreMaintenance.AutoMaintain] = None)
      : Unit = {
    val spark = incoming.sparkSession
    val tokBuckets = params(spark, path)
    val post = postingsOf(incoming, idCol, textCol, tokBuckets)
      .localCheckpoint()
    // a positional store stays positional: the batch's positions land
    // under the same bucket fn, so tomorrow's phrase probe sees the
    // appended docs exactly as built ones (per-doc facts — no
    // cross-doc state to reconcile, same as the scored postings).
    // All four artifact WRITES are independent — overlap them (guide
    // §2.6); the chain commits keep their documented order below
    val positional = hasPositions(path)
    Par.run(
      () => bucketed(post).write.partitionBy("tok_bucket")
        .mode(SaveMode.Append).parquet(s"$path/postings.parquet"),
      () => bucketed(dfOf(post)).write.partitionBy("tok_bucket")
        .mode(SaveMode.Append).parquet(s"$path/df.parquet"),
      () => statsOf(post).coalesce(1)
        .write.mode(SaveMode.Append).parquet(s"$path/stats.parquet"),
      () => if (positional)
        bucketed(positionsOf(incoming, idCol, textCol, tokBuckets))
          .write.partitionBy("tok_bucket")
          .mode(SaveMode.Append).parquet(s"$path/positions.parquet"))
    StoreGenerations.commitAppend(s"$path/postings.parquet")
    StoreGenerations.commitAppend(s"$path/df.parquet")
    StoreGenerations.commitAppend(s"$path/stats.parquet")
    if (positional)
      StoreGenerations.commitAppend(s"$path/positions.parquet")
    // the store-level atomic commit point: on a snapshotted store a
    // reader between the per-artifact commits above keeps resolving
    // the previous snapshot — new postings are never scored against
    // stale document frequencies (all-old or all-new)
    StoreSnapshots.commitIfSnapshotted("retrieval", path)
    // in-band lifecycle knob — see SignatureStore.append
    autoMaintain.foreach(am => StoreMaintenance.maintainIfNeeded(spark,
      StoreMaintenance.artifactsOf("retrieval", path), am,
      snapshot = Some(("retrieval", path))))
  }

  /** REPLAY-SAFE append for a STREAMING ingest — exactly-once store
    * state from idempotence ([[StoreGenerations]] canonical landing:
    * one `gb<batchId>` file per bucket dir for the bucketed artifacts
    * and one per batch for stats; a replayed batch overwrites its own
    * files and commits nothing). Requires chains on every accreting
    * artifact (`StoreMaintain enable retrieval <path>`). Same
    * derivation as [[append]] — per-doc facts under the store's
    * bucket fn, df/stats as delta rows readers sum. */
  /** CONCURRENT append — the BM25 sibling of
    * [[SignatureStore.appendOwn]], and the store the file-level
    * snapshot commit exists for: the batch's postings, df deltas,
    * stats row (and positions on a positional store) land privately
    * in their artifacts, then ONE conditional create
    * ([[StoreSnapshots.commitOwnStore]]) publishes all of them as a
    * snapshot — a reader can never score the batch's postings against
    * document frequencies that don't include them (all-old or
    * all-new, per writer, however many writers race). Requires a
    * snapshotted store; maintenance's [[StoreSnapshots.fold]] later
    * adopts the files into the chains. Returns the published snapshot
    * generation. */
  def appendOwn(incoming: DataFrame, idCol: String, textCol: String,
                path: String, writerTag: String): Long = {
    val spark = incoming.sparkSession
    require(StoreSnapshots.isSnapshotted(path),
      s"concurrent multi-artifact append needs store snapshots on $path " +
        "(StoreSnapshots.enable first) — the snapshot manifest is the " +
        "lone commit point that keeps postings, df, and stats atomic")
    val tokBuckets = params(spark, path)
    val post = postingsOf(incoming, idCol, textCol, tokBuckets)
      .localCheckpoint()
    val landed = Seq.newBuilder[(String, Seq[String])]
    landed += s"$path/postings.parquet" -> StoreGenerations.landOwnBucketed(
      post, s"$path/postings.parquet", "tok_bucket", writerTag)
    landed += s"$path/df.parquet" -> StoreGenerations.landOwnBucketed(
      dfOf(post), s"$path/df.parquet", "tok_bucket", writerTag)
    landed += s"$path/stats.parquet" -> StoreGenerations.landOwn(
      statsOf(post).coalesce(1), s"$path/stats.parquet", writerTag)
    if (hasPositions(path))
      landed += s"$path/positions.parquet" ->
        StoreGenerations.landOwnBucketed(
          positionsOf(incoming, idCol, textCol, tokBuckets),
          s"$path/positions.parquet", "tok_bucket", writerTag)
    StoreSnapshots.commitOwnStore("retrieval", path, landed.result().toMap)
  }

  def appendCanonical(incoming: DataFrame, idCol: String, textCol: String,
                      path: String, batchId: Long,
                      runTag: String = ""): Unit = {
    val spark = incoming.sparkSession
    val tokBuckets = params(spark, path)
    val post = postingsOf(incoming, idCol, textCol, tokBuckets)
      .localCheckpoint()
    StoreGenerations.landCanonicalBucketed(post,
      s"$path/postings.parquet", "tok_bucket", batchId, runTag)
    StoreGenerations.landCanonicalBucketed(dfOf(post),
      s"$path/df.parquet", "tok_bucket", batchId, runTag)
    StoreGenerations.landCanonical(statsOf(post),
      s"$path/stats.parquet", batchId, runTag)
    if (hasPositions(path))
      StoreGenerations.landCanonicalBucketed(
        positionsOf(incoming, idCol, textCol, tokBuckets),
        s"$path/positions.parquet", "tok_bucket", batchId, runTag)
    StoreSnapshots.commitIfSnapshotted("retrieval", path)
  }

  /** Exact-phrase top-k against the STORED positional index (build
    * with `positional = true`): plan the two-term batch's probed
    * buckets (one tiny job over the query phrases — bounded-collect
    * class), scan ONLY those partitions of positions.parquet, drop
    * non-query tokens via a broadcast join at the scan, then run
    * [[Retrieval.phraseFromPostings]] — the adjacency join + ranking
    * stage the direct route uses, over a pruned scan complete for
    * every query term (every occurrence of a token lives in its
    * bucket). Output identical to `Retrieval.phraseTopK` on the same
    * logical corpus: (query_id, doc_id, rank, phrase_tf) —
    * spec-pinned, including across an [[append]]. Without this face a
    * stored-index user issuing a quoted query would pay the full
    * corpus re-index the store exists to avoid. */
  def phraseQuery(spark: SparkSession, path: String, queries: DataFrame,
                  queryIdCol: String, t1Col: String, t2Col: String,
                  k: Int): DataFrame = {
    require(hasPositions(path),
      s"$path has no positional face; build(positional = true)")
    // resolve FIRST — seed verification before any scan (see query)
    val rd = StoreSnapshots.reader(spark, path)
    val tokBuckets = params(spark, path)
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(t1Col).as("__t1"), col(t2Col).as("__t2")).localCheckpoint()
    val qtoks = q.select(explode(array(col("__t1"), col("__t2"))).as("tok"))
      .distinct().localCheckpoint()
    val buckets = qtoks
      .select(pmod(xxhash64(col("tok")), lit(tokBuckets.toLong)).as("__b"))
      .distinct().collect().map(_.getLong(0)).sorted
    val post = rd(s"$path/positions.parquet")
      .filter(col("tok_bucket").isin(buckets: _*))
      .join(broadcast(qtoks), Seq("tok"))
      .select(col("doc_id"), col("pos"), col("tok"))
    Retrieval.phraseFromPostings(q, "query_id", "__t1", "__t2",
      post, "doc_id", k)
  }

  /** BM25 top-k against the stored index: plan the batch's probed
    * buckets (the query vocabulary's hash buckets — one tiny job),
    * scan ONLY those partitions, drop non-query tokens via a
    * broadcast join at the scan, then run [[Retrieval
    * .bm25FromPostings]] — the scoring stage the direct route uses,
    * over inputs exact for every query token. Output identical to
    * `Retrieval.bm25TopK` on the same logical corpus:
    * (query_id, doc_id, rank, score_q). */
  def query(spark: SparkSession, path: String, queries: DataFrame,
            queryIdCol: String, termsCol: String, k: Int,
            asOf: Option[Long] = None): DataFrame = {
    // resolve FIRST: on a snapshotted store this verifies the frozen
    // seeds (params) loudly before any scan plans. `asOf` = store-
    // level time travel: answer from snapshot `asOf`'s mutually-
    // consistent artifact generations (historical postings scored
    // with the HISTORICAL df and (N, T)) — within the vacuum keep
    // window, loud outside it
    val rd = asOf.map(g => StoreSnapshots.readerAt(spark, path, g))
      .getOrElse(StoreSnapshots.reader(spark, path))
    val tokBuckets = params(spark, path)
    // the query batch's distinct terms: small by definition (same
    // bounded class as an ingest batch); checkpointed because it
    // feeds the bucket plan, the scan join, and the score join
    val qterms = queries
      .select(col(queryIdCol).as("query_id"),
        explode(col(termsCol)).as("tok"))
      .distinct().localCheckpoint()
    val buckets = qterms
      .select(pmod(xxhash64(col("tok")), lit(tokBuckets.toLong)).as("__b"))
      .distinct().collect().map(_.getLong(0)).sorted
    val qtoks = qterms.select("tok").distinct()
    // candidate postings = probed buckets ∩ query tokens; checkpoint
    // so dfreq and the score join share one scan
    // generation-aware reads through ONE resolver: on a snapshotted
    // store, postings/df/stats all resolve from the SAME snapshot —
    // a batch's new postings are never scored against the previous
    // generation's df/(N,T) however the reader interleaves with an
    // in-flight append (bucket-dir pruning kept via basePath)
    val post = rd(s"$path/postings.parquet")
      .filter(col("tok_bucket").isin(buckets: _*))
      .join(broadcast(qtoks), Seq("tok"))
      .select(col("tok"), col("doc_id"), col("tf"), col("dl"))
      .localCheckpoint()
    // df from the persisted table (summed deltas), NOT from counting
    // the scan: on a pruned store the scan undercounts by design;
    // on an unpruned store the two are identical (spec-pinned)
    val dfreq = rd(s"$path/df.parquet")
      .filter(col("tok_bucket").isin(buckets: _*))
      .join(broadcast(qtoks), Seq("tok"))
      .groupBy("tok").agg(sum("df").as("__df"))
    val tot = rd(s"$path/stats.parquet")
      .agg(sum("n_docs").as("__n"), sum("total_dl").as("__t"))
    Retrieval.bm25FromPostings(qterms, post, dfreq, tot, "doc_id", k)
  }
}
