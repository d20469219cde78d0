package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVFADC index — the ANN sibling of [[SignatureStore]]:
  * the trained structure AND the corpus's codes live on disk, so a
  * query batch pays probes, never training or encoding.
  *
  * [[Similarity.ivfPqTopK]] re-assigns and re-encodes the whole
  * candidate corpus on every call — the right shape for a one-shot
  * audit, pure waste for a serving index: assignment is O(N·K)
  * multiply-adds over data that didn't change. The store persists:
  *
  *   <path>/centroids.parquet  (cid, vector)  - coarse quantizer
  *   <path>/codebook.parquet   (cid, vector)  - residual PQ codebook
  *   <path>/codes.parquet      (neighbor_id, cell, codes) partitioned
  *                             by cell_bucket = cell % cell_buckets
  *   <path>/params.parquet     (num_sub, sub_dim, cell_buckets)
  *
  * The layout IS the probe structure: codes are partitioned by
  * cell-bucket, and [[query]] plans the batch's probed cells first
  * (one tiny job over the broadcast centroid row — q·K scores), then
  * reads codes.parquet filtered to those buckets/cells. Spark's file
  * index prunes unprobed directories at planning time, so a batch
  * that probes w of K cells SCANS ~w/K of the corpus codes — the
  * inverted-file promise kept at the file level, visible in the
  * plan's PartitionFilters and pinned by the spec on `inputFiles`.
  * `cell_buckets` bounds the directory fan-out (a √N-cell index at
  * corpus scale would otherwise mint millions of partitions); pruning
  * granularity degrades gracefully to the bucket, and the row-level
  * `cell` filter still pushes down into each scanned file.
  *
  * Vectors are stored as double (the exact widening every reader
  * applies anyway), so the store round-trip is bit-invisible:
  * [[query]] equals `Similarity.ivfPqTopK` over the same logical
  * corpus, spec-pinned, including across an [[append]].
  *
  * [[append]] encodes new vectors under the STORE's centroids and
  * codebook — an index snapshot's geometry is frozen until a rebuild,
  * the same snapshot semantics the signature store documents; the
  * recall audits (q_ann_recall family) are the drift monitor that
  * says when to rebuild. */
object VectorIndexStore {

  private def normalized(df: DataFrame, idCol: String, vecCol: String)
      : DataFrame =
    df.select(col(idCol).cast("long").as("cid"),
      Similarity.toDouble(col(vecCol)).as("vector"))

  private def encode(corpus: DataFrame, idCol: String, vecCol: String,
                     centroids: DataFrame, codebook: DataFrame,
                     numSub: Int, subDim: Int, cellBuckets: Int): DataFrame = {
    val assigned = Similarity.ivfResiduals(corpus, centroids, idCol, vecCol)
    Similarity.encodeCodes(assigned, codebook, idCol, vecCol, numSub, subDim)
      .select(col("neighbor_id").cast("long").as("neighbor_id"),
        col("__cell").cast("long").as("cell"), col("__codes").as("codes"))
      .withColumn("cell_bucket", pmod(col("cell"), lit(cellBuckets.toLong)))
  }

  /** Build (or rebuild — overwrite) the index from the corpus and a
    * trained structure. One assignment + one encode pass — the same
    * two passes every direct ivfPqTopK call pays per query batch. */
  def build(corpus: DataFrame, idCol: String, vecCol: String, path: String,
            centroids: DataFrame, codebook: DataFrame,
            numSub: Int, subDim: Int, cellBuckets: Int = 1024): Unit = {
    StoreSnapshots.invalidate(path) // a rebuild starts un-snapshotted
    val spark = corpus.sparkSession
    import spark.implicits._
    // bucket-keyed repartition before the partitionBy write: off the
    // encode's upstream partitioning the write would mint up to
    // (input partitions × buckets) files — millions on a 100 TB
    // corpus — while clustering on cell_bucket bounds output at one
    // file per (bucket, owning task), the layout the probe scan and
    // the compaction path both want.
    // The four artifacts are independent derivations — overlap their
    // writes so the three tiny ones ride the codes write's tail (Par)
    Par.run(
      () => normalized(centroids, idCol, vecCol)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/centroids.parquet"),
      () => normalized(codebook, idCol, vecCol)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/codebook.parquet"),
      () => Seq((numSub, subDim, cellBuckets))
        .toDF("num_sub", "sub_dim", "cell_buckets").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/params.parquet"),
      () => encode(corpus, idCol, vecCol,
        normalized(centroids, idCol, vecCol).select(
          col("cid").as(idCol), col("vector").as(vecCol)),
        normalized(codebook, idCol, vecCol).select(
          col("cid").as(idCol), col("vector").as(vecCol)),
        numSub, subDim, cellBuckets)
        .repartition(col("cell_bucket"))
        .write.partitionBy("cell_bucket").mode(SaveMode.Overwrite)
        .parquet(s"$path/codes.parquet"))
  }

  /** The index config — 1 row, driver-side (bounded-collect class). */
  def params(spark: SparkSession, path: String): (Int, Int, Int) = {
    val row = spark.read.parquet(s"$path/params.parquet").head()
    (row.getAs[Int]("num_sub"), row.getAs[Int]("sub_dim"),
      row.getAs[Int]("cell_buckets"))
  }

  private def stored(spark: SparkSession, path: String, part: String,
                     idCol: String, vecCol: String): DataFrame =
    spark.read.parquet(s"$path/$part.parquet")
      .select(col("cid").as(idCol), col("vector").as(vecCol))

  /** Fold new vectors into the index under the STORE's frozen
    * geometry (snapshot semantics — see the class doc). Caller
    * guarantees new ids; the store has no dedup of its own.
    * `autoMaintain`: the in-band lifecycle knob — see
    * [[SignatureStore.append]]. */
  def append(newVectors: DataFrame, idCol: String, vecCol: String,
             path: String,
             autoMaintain: Option[StoreMaintenance.AutoMaintain] = None)
      : Unit = {
    val spark = newVectors.sparkSession
    val (numSub, subDim, cellBuckets) = params(spark, path)
    encode(newVectors, idCol, vecCol,
      stored(spark, path, "centroids", idCol, vecCol),
      stored(spark, path, "codebook", idCol, vecCol),
      numSub, subDim, cellBuckets)
      .repartition(col("cell_bucket"))
      .write.partitionBy("cell_bucket").mode(SaveMode.Append)
      .parquet(s"$path/codes.parquet")
    StoreGenerations.commitAppend(s"$path/codes.parquet")
    StoreSnapshots.commitIfSnapshotted("vector", path)
    autoMaintain.foreach(am => StoreMaintenance.maintainIfNeeded(spark,
      StoreMaintenance.artifactsOf("vector", path), am,
      snapshot = Some(("vector", path))))
  }

  /** REPLAY-SAFE append for a STREAMING ingest — exactly-once store
    * state from idempotence, the merge-sink argument applied to the
    * vector store. Requires a [[StoreGenerations]] chain on the codes
    * artifact: the batch encodes under the frozen geometry into a
    * batch-scratch, lands as ONE canonical file per populated bucket
    * (`cell_bucket=X/gb<batchId>.parquet` — the bucket-clustered
    * repartition guarantees one file per bucket, enforced), and the
    * chain adopts exactly the unreferenced files. A REPLAYED batch
    * overwrites its own canonical files (REPLACE_EXISTING — nothing
    * else ever carries its name) and its commit finds nothing
    * unreferenced, so the chain — and every reader — is untouched: a
    * mid-batch crash leaves only unreferenced files the replay
    * overwrites and the vacuum would sweep. Single-writer contract
    * unchanged (the streaming sink's serial batches ARE it). */
  def appendCanonical(newVectors: DataFrame, idCol: String, vecCol: String,
                      path: String, batchId: Long,
                      runTag: String = ""): Unit = {
    val spark = newVectors.sparkSession
    val codes = s"$path/codes.parquet"
    require(StoreGenerations.isGenerational(codes),
      s"streaming append needs a generation chain on $codes " +
        "(StoreGenerations.enable / StoreMaintain enable) — without " +
        "one a replayed micro-batch would double its rows")
    val (numSub, subDim, cellBuckets) = params(spark, path)
    StoreGenerations.landCanonicalBucketed(
      encode(newVectors, idCol, vecCol,
        stored(spark, path, "centroids", idCol, vecCol),
        stored(spark, path, "codebook", idCol, vecCol),
        numSub, subDim, cellBuckets),
      codes, "cell_bucket", batchId, runTag)
    StoreSnapshots.commitIfSnapshotted("vector", path)
  }

  /** CONCURRENT append — any number of writers fold batches into the
    * index AT ONCE. The vector store is the index store where this is
    * sound without a cross-artifact protocol: its frozen geometry
    * (centroids/codebook/params) never changes on append, so `codes`
    * is the ONLY accreting artifact and a single chain commit is the
    * whole consistency unit. Each writer encodes under the frozen
    * geometry, lands its files privately
    * ([[StoreGenerations.landOwnBucketed]] — one file per populated
    * bucket, invisible until committed), then races the exact-file-set
    * CAS commit ([[StoreGenerations.commitOwn]]): the loser re-bases
    * on the winner's generation, so every surviving generation differs
    * from its parent by exactly one writer's whole batch — no torn
    * batches, no double adoption, pinned readers untouched. The
    * snapshot commit (when enabled) retries the same way; it pins
    * current state, so losing that race just means pinning a newer
    * consistent state. Caller guarantees new ids, as for [[append]].
    * Returns the codes-chain generation this writer's commit
    * published. */
  def appendOwn(newVectors: DataFrame, idCol: String, vecCol: String,
                path: String, writerTag: String): Long = {
    val spark = newVectors.sparkSession
    val codes = s"$path/codes.parquet"
    require(StoreGenerations.isGenerational(codes),
      s"concurrent append needs a generation chain on $codes " +
        "(StoreGenerations.enable / StoreMaintain enable)")
    val (numSub, subDim, cellBuckets) = params(spark, path)
    val landed = StoreGenerations.landOwnBucketed(
      encode(newVectors, idCol, vecCol,
        stored(spark, path, "centroids", idCol, vecCol),
        stored(spark, path, "codebook", idCol, vecCol),
        numSub, subDim, cellBuckets),
      codes, "cell_bucket", writerTag)
    val gen = StoreGenerations.commitOwn(codes, landed)
    StoreSnapshots.commitIfSnapshotted("vector", path)
    gen
  }

  /** REBUILD: re-fit the index geometry over the CURRENT corpus and
    * re-encode — the operation the recall audits (the documented
    * drift monitor) point a deployment toward once appends from a
    * shifted distribution have degraded the frozen-geometry recall.
    * One coarse-quantizer derivation (deterministic √N stride sample
    * by id — the same policy the direct IVFADC chain uses; a
    * deployment with sparse ids derives its own centroids and calls
    * [[build]]), one residual k-means fit, one encode pass — the
    * exact cost of a fresh [[build]], which is the honest bar: a
    * rebuild IS a fresh build over base + appends, so its output is
    * bit-identical to one (spec-pinned), and the layout config
    * (num_sub, sub_dim, cell_buckets) carries over from the store.
    * Overwrites the store; a generation chain, like any rebuild's,
    * starts fresh (re-enable after). */
  def rebuild(corpus: DataFrame, idCol: String, vecCol: String,
              path: String, k: Int, iters: Int): Unit = {
    val spark = corpus.sparkSession
    val (numSub, subDim, cellBuckets) = params(spark, path)
    val stride = math.max(1L,
      math.floor(math.sqrt(corpus.count().toDouble)).toLong)
    val cents = corpus.filter(col(idCol) % stride === 0)
    // the residual-trained codebook: fit on what it will quantize
    // (residuals cluster near the origin), same as the direct chain
    val res = Similarity.ivfResiduals(corpus, cents, idCol, vecCol)
      .select(col("neighbor_id").as(idCol), col("__rv").as(vecCol))
    val cb = KMeans.codebook(KMeans.fit(res, idCol, vecCol, k = k,
        numSub = numSub, subDim = subDim, iters = iters))
      .select(col("cid").as(idCol), col("vector").as(vecCol))
    build(corpus, idCol, vecCol, path, cents, cb,
      numSub, subDim, cellBuckets)
  }

  /** Frozen-geometry ENCODE-DISTORTION audit — the cheap IN-BAND
    * drift monitor. The recall audits are the store's documented
    * drift monitor, but they need exact ground truth (a brute-force
    * L2 pass over the corpus); this needs ONE projection over the
    * batch: each vector's total quantization error under the STORE's
    * frozen centroids + codebook — Σ over subspaces of the nearest-
    * centroid residual d2, summed in sub_id order (the ADC fold, so
    * the double is engine-exact and the gate DuckDB-replayable). A
    * distribution-shifted batch lands far from every frozen centroid
    * and its distortion profile jumps ORDERS above the build-time
    * corpus's — the signal that says "rebuild" before recall decays
    * in production, at append-time cost. Output: (id, distortion),
    * one row per vector. Zero shuffle: broadcast structure, per-row
    * fold, then an in-row ordered sum. */
  def encodeDistortion(vectors: DataFrame, idCol: String, vecCol: String,
                       path: String): DataFrame = {
    val spark = vectors.sparkSession
    val (numSub, subDim, _) = params(spark, path)
    val res = Similarity.ivfResiduals(vectors,
        stored(spark, path, "centroids", idCol, vecCol), idCol, vecCol)
      .select(col("neighbor_id").as(idCol), col("__rv").as(vecCol))
    Similarity.pqEncode(res,
        stored(spark, path, "codebook", idCol, vecCol),
        idCol, vecCol, numSub, subDim)
      .groupBy(col(idCol))
      .agg(aggregate(
        transform(
          array_sort(collect_list(struct(col("sub_id"), col("dist2")))),
          c => c.getField("dist2")),
        lit(0.0), (acc, x) => acc + x).as("distortion"))
  }

  /** Persist the drift-trigger CALIBRATION: the mean frozen-geometry
    * [[encodeDistortion]] of `reference` (normally the build corpus)
    * — the number [[appendOrRebuild]] compares every batch mean
    * against. One projection over the reference + one scalar row;
    * the fold is sub_id-ordered, so the stored double is
    * DuckDB-replayable like the monitor itself. */
  def calibrate(reference: DataFrame, idCol: String, vecCol: String,
                path: String): Double = {
    val spark = reference.sparkSession
    import spark.implicits._
    val m = encodeDistortion(reference, idCol, vecCol, path)
      .agg(avg("distortion")).head().getDouble(0)
    Seq(m).toDF("mean_distortion").coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$path/calibration.parquet")
    m
  }

  /** The stored calibration — 1 row, driver-side. */
  def calibration(spark: SparkSession, path: String): Double =
    spark.read.parquet(s"$path/calibration.parquet").head()
      .getAs[Double]("mean_distortion")

  /** Drift-triggered REFRESH policy — the ANN analogue of
    * [[StoreMaintenance.AutoMaintain]]: the monitor says WHEN
    * ([[encodeDistortion]]'s batch mean vs `factor ×` the stored
    * [[calibrate]]d base mean — one in-band projection, zero ground
    * truth), the rebuild says HOW ([[rebuild]] over `corpus`, the
    * caller's full raw table — the store persists codes, not
    * vectors). The batch measures under the CURRENT frozen geometry,
    * appends, and past the threshold the store rebuilds and
    * RE-CALIBRATES over the extended corpus — so a continuing stream
    * from the same shifted mode triggers exactly once: the next wave
    * measures near the new calibration and folds in as a plain
    * append. Returns true when this batch triggered the rebuild.
    * In-distribution batches cost one extra projection; the rebuild
    * costs exactly a fresh build (the honest bar, spec-pinned). */
  def appendOrRebuild(newVectors: DataFrame, idCol: String, vecCol: String,
                      path: String, corpus: DataFrame, factor: Double,
                      k: Int, iters: Int): Boolean = {
    require(factor >= 1.0, s"trigger factor must be >= 1, got $factor")
    val spark = newVectors.sparkSession
    val batchMean = encodeDistortion(newVectors, idCol, vecCol, path)
      .agg(avg("distortion")).head().getDouble(0)
    val cal = calibration(spark, path)
    append(newVectors, idCol, vecCol, path)
    if (batchMean > factor * cal) {
      rebuild(corpus, idCol, vecCol, path, k, iters)
      calibrate(corpus, idCol, vecCol, path)
      true
    } else false
  }

  /** ADC top-k against the stored index: plan the batch's probed
    * cells (q·nprobe longs to the driver — bounded-collect class),
    * scan ONLY their partitions, score. Output identical to
    * `Similarity.ivfPqTopK` on the same logical corpus:
    * (query_id, neighbor_id, rank, adc_dist2). */
  def query(spark: SparkSession, path: String, queries: DataFrame,
            idCol: String, vecCol: String, k: Int, nprobe: Int,
            asOf: Option[Long] = None): DataFrame = {
    // resolve FIRST: on a snapshotted store this verifies the frozen
    // seeds (centroids/codebook/params) loudly before any scan plans.
    // `asOf` = store-level time travel (StoreSnapshots.readerAt):
    // the codes resolve at the generation snapshot `asOf` pinned —
    // the index as it stood at that commit, frozen geometry verified
    val rd = asOf.map(g => StoreSnapshots.readerAt(spark, path, g))
      .getOrElse(StoreSnapshots.reader(spark, path))
    val (numSub, subDim, cellBuckets) = params(spark, path)
    val centroids = stored(spark, path, "centroids", idCol, vecCol)
    val codebook = stored(spark, path, "codebook", idCol, vecCol)
    // probed-cell plan: rank all K cells per query (queries are few;
    // this is the same O(q·K) pick adcFromCodes repeats exactly), keep
    // the distinct union — a SUPERSET per query, which adcFromCodes'
    // own per-query probe join then narrows to exactly nprobe
    val cents = broadcast(centroids.select(col(idCol).as("__cell"),
      col(vecCol).as("__ccv")))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("__qd").asc, col("__cell").asc)
    val probedCells = queries
      .select(col(idCol).as("query_id"), Similarity.toDouble(col(vecCol)).as("__qv"))
      .crossJoin(cents)
      .select(col("query_id"), col("__cell"),
        Similarity.dist2(col("__qv"), col("__ccv")).as("__qd"))
      .withColumn("__pr", row_number().over(wp))
      .filter(col("__pr") <= nprobe)
      .select("__cell").distinct()
      .collect().map(_.getLong(0)).sorted
    val buckets = probedCells.map(_ % cellBuckets).distinct
    // generation-aware read: a chained store's probe resolves a
    // pinned file list (bucket-dir partition pruning preserved via
    // basePath), so compaction never blocks queries
    val codes = rd(s"$path/codes.parquet")
      .filter(col("cell_bucket").isin(buckets: _*) &&
        col("cell").isin(probedCells: _*))
      .select(col("neighbor_id"), col("cell").as("__cell"),
        col("codes").as("__codes"))
    Similarity.adcFromCodes(codes, queries, centroids, codebook,
      idCol, vecCol, k, nprobe, numSub, subDim)
  }
}
