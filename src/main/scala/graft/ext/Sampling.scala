package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for the training-data pipeline
  * surface (brief §ext): hash-based train/val/test splits and
  * per-source corpus rebalancing.
  *
  * Both operators are pure projections over a content-independent
  * identity hash — no shuffle, no RNG state, no driver coordination:
  * the assignment of a document is a function of its id alone, so it
  * is reproducible across runs, engines, partitionings, and cluster
  * sizes (the property a 100 TB pipeline actually needs from a
  * "random" split — `rand()` has none of it). Hash domain: first 15
  * md5 hex chars (< 2^60, exact in a signed long in Spark and DuckDB
  * alike), reduced by integer modulus — no floating point anywhere.
  */
object Sampling {

  /** Buckets per unit probability: thresholds quantize to 1/10000. */
  private val Buckets = 10000L

  /** Salted identity hash in [0, Buckets): independent streams for
    * independent decisions (the split assignment of a doc must not
    * correlate with its sampling fate — same id, different salt). */
  def hashBucket(id: Column, salt: String): Column =
    TextOps.hex15(concat(lit(salt + "|"), id.cast("string"))) % Buckets

  /** Deterministic train/val/test assignment from the id hash.
    * `valPct`/`testPct` are given in bucket counts out of 10000
    * (e.g. 100 = 1%). Stable under corpus growth: a document's split
    * never changes when other documents come or go — the property
    * that keeps eval sets honest across dataset versions. */
  def splitAssign(df: DataFrame, idCol: String,
                  valBuckets: Int = 100, testBuckets: Int = 100): DataFrame = {
    require(valBuckets >= 0 && testBuckets >= 0 &&
      valBuckets + testBuckets < Buckets)
    val b = hashBucket(col(idCol), "split")
    df.select(col(idCol), b.as("bucket"),
      when(b < lit(Buckets - valBuckets - testBuckets), "train")
        .when(b < lit(Buckets - testBuckets), "val")
        .otherwise("test").as("split"))
  }

  /** Exact-count stratified sample: the first `n` documents per
    * stratum under a salted-id-hash ordering — "take N docs per
    * domain" with an EXACT output size, where the probabilistic
    * [[domainMix]] only hits a target in expectation. Deterministic
    * and content-independent like the other samplers; the id
    * tiebreak makes the order total even on hash collisions.
    *
    * Scale shape: one shuffle on the stratum key for the ranking
    * window. A stratum's rows all visit one task — for a hot stratum
    * at extreme scale, pre-filter with [[domainMix]] to cut the
    * stratum near its target before the exact rank pass. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       n: Int): DataFrame = {
    require(n > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(col("__h").asc, col(idCol).asc)
    df.withColumn("__h", hashBucket(col(idCol), "strat"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__h", "__rn")
  }

  /** Per-source rebalancing: keep each document with its source's
    * target probability (quantized to 1/10000), decided by a salted
    * id hash — deterministic downsampling of over-represented sources
    * (the "domain mixing" step of corpus assembly). Sources absent
    * from `targets` keep everything. Returns the kept rows. */
  def domainMix(df: DataFrame, idCol: String, sourceCol: String,
                targets: Map[String, Double]): DataFrame = {
    require(targets.values.forall(p => p >= 0.0 && p <= 1.0),
      "keep probabilities must be in [0, 1]")
    val thresholds: Map[String, Long] =
      targets.map { case (s, p) => s -> math.round(p * Buckets) }
    val thr = coalesce(
      element_at(typedLit(thresholds), col(sourceCol)), lit(Buckets))
    df.filter(hashBucket(col(idCol), "mix") < thr)
  }

  /** Leakage-proof train/val/test split: near-duplicate CLUSTERS move
    * between splits as a unit. [[splitAssign]] hashes the document
    * id, so two near-identical documents can land in train and test —
    * the eval set then scores memorization, not generalization (the
    * classic dedup-leakage failure). Here the hash input is the
    * cluster label from [[graft.ext.Dedup.connectedComponents]]
    * (rename its `id` column to `idCol` — `labels` must carry
    * (idCol, component)); documents without a near-dup (absent from
    * `labels`) are singleton clusters labeled by their own id — for them the
    * assignment REDUCES EXACTLY to [[splitAssign]]'s buckets only
    * when their id equals their label, which it does, so adding or
    * removing dup edges never reshuffles unrelated documents.
    *
    * Scale shape: one left join of the corpus against the (small —
    * only docs that HAVE a near-dup) label table on the id key, then
    * the same pure hash projection as [[splitAssign]]. The label
    * side is the output of the dedup pass the pipeline already ran;
    * nothing here adds a pair-generating step. */
  def clusterAwareSplit(df: DataFrame, labels: DataFrame, idCol: String,
                        valBuckets: Int = 100, testBuckets: Int = 100): DataFrame = {
    require(valBuckets >= 0 && testBuckets >= 0 &&
      valBuckets + testBuckets < Buckets)
    val withComp = df.select(col(idCol))
      .join(labels.select(col(idCol), col("component")), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("component"))
    val b = hashBucket(col("component"), "split")
    withComp.select(col(idCol), col("component"), b.as("bucket"),
      when(b < lit(Buckets - valBuckets - testBuckets), "train")
        .when(b < lit(Buckets - testBuckets), "val")
        .otherwise("test").as("split"))
  }

  /** Temperature-scaled source mixing weights (the multilingual /
    * multi-domain sampling recipe of mT5 and the Llama corpora):
    * sample source i proportional to count^α with α = 1/2, which
    * up-weights small sources relative to proportional sampling
    * without letting any source dominate. Exact-integer form: the
    * weight is floor(sqrt(count · 2^20)) — sqrt is IEEE
    * correctly-rounded in every engine (unlike ln/pow), and the floor
    * is exact while count·2^20 < 2^52, i.e. count < ~4.5e9 docs per
    * source; beyond that a deployment shifts the fixed point down.
    * The per-source quota out of `budget` is one integral division
    * `(budget · w) div Σw` — quotas can undershoot budget by at most
    * (#sources − 1) rows (floor rounding), never overshoot.
    *
    * Returns one row per source: (source, n_docs, weight, quota).
    * Scale shape: one map-side-combinable count agg; the quota math
    * runs on the #sources-row result against a one-row broadcast
    * total. */
  def temperatureQuotas(df: DataFrame, idCol: String, sourceCol: String,
                        budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val counts = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("source"), col("n_docs"),
        floor(sqrt(col("n_docs") * lit(1048576L))).cast("long").as("weight"))
    val tot = broadcast(counts.agg(sum("weight").as("__wsum")))
    counts.crossJoin(tot)
      .select(col("source"), col("n_docs"), col("weight"),
        expr(s"($budget * weight) div __wsum").as("quota"))
  }

  /** The selection step for [[temperatureQuotas]]: the first `quota`
    * documents of each source under the salted-id-hash order (same
    * total order as [[stratifiedSample]] — hash asc, id asc — so the
    * picked set is deterministic, content-independent, and stable
    * under re-partitioning). Returns (idCol, source, rk) for the
    * kept rows.
    *
    * Scale shape: the quota table is #sources rows (broadcast); the
    * ranking window partitions by source — a hot source at extreme
    * scale pre-thins through [[domainMix]] first, same caveat as
    * stratifiedSample. */
  def temperatureSample(df: DataFrame, idCol: String, sourceCol: String,
                        budget: Long): DataFrame = {
    val quotas = broadcast(
      temperatureQuotas(df, idCol, sourceCol, budget)
        .select(col("source").as("__qsrc"), col("quota")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sourceCol)
      .orderBy(col("__h").asc, col(idCol).asc)
    df.select(col(idCol), col(sourceCol),
        hashBucket(col(idCol), "temp").as("__h"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(quotas, col(sourceCol) === col("__qsrc"))
      .filter(col("rk") <= col("quota"))
      .select(col(idCol), col(sourceCol), col("rk"))
  }

  /** Token-budget corpus assembly: keep, per source, the hash-order
    * PREFIX of documents whose cumulative token count stays within
    * `budgetTokens` — corpus specs are written in tokens, not
    * documents ("50B tokens of web, 5B of code"), and a doc-count
    * quota ([[temperatureSample]]) hits a token target only in
    * expectation. The order is the same salted-hash total order as
    * the other samplers (content-independent, reorder-stable); the
    * budget rule is prefix-inclusive — a document is kept iff the
    * running total INCLUDING it is <= budget, so the kept set is a
    * deterministic prefix and never overshoots.
    *
    * Returns (idCol, source, n_tokens, cum_tokens) for kept rows.
    * Scale shape: one narrow projection for the token count, one
    * per-source ranking/cumsum window (hot-source caveat shared with
    * stratifiedSample; the epoch-shuffle bucket-offset decomposition
    * applies the same way at extreme scale). */
  def tokenBudgetSample(df: DataFrame, idCol: String, textCol: String,
                        sourceCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"budget must be >= 0, got $budgetTokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(col("__h").asc, col(idCol).asc)
    df.select(col(idCol), col(sourceCol).as("source"),
        size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"),
        hashBucket(col(idCol), "tokbudget").as("__h"))
      .withColumn("cum_tokens",
        sum("n_tokens").over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
          .cast("long"))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col(idCol), col("source"), col("n_tokens"), col("cum_tokens"))
  }

  /** Deterministic WEIGHTED sampling without replacement: keep the k
    * rows with the smallest `priority = hash div max(weight, 1)` —
    * the integer surrogate of the Efraimidis–Spirakis u^(1/w)
    * exponential-key scheme (hash/2^60 plays u; dividing by the
    * weight shrinks a heavy row's key, so selection odds grow
    * monotonically with weight and a weight-w row beats a weight-1
    * row in a given draw w× as often). ALL-BIGINT arithmetic — no
    * ln()/pow() float seam, so the sample is bit-reproducible across
    * engines, runs, and partitionings, unlike rand()-keyed samplers;
    * the trade is the surrogate's tail odds deviate from exact E-S
    * for near-equal weights (documented, not hidden). Use: quality-
    * weighted corpus downsampling — weight = a quality score and the
    * budget keeps good documents preferentially but not exclusively.
    * Scale: one scan; the global k-smallest is TakeOrdered (per-
    * partition top-k, k-bounded merge on the driver) — no global
    * sort, no window. */
  def weightedPrioritySample(df: DataFrame, idCol: String,
                             weight: Column, k: Int,
                             salt: String = "wsample"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // full 60-bit hex15 (not the 10k-bucket hashBucket): the DIV-by-
    // weight key needs headroom or near-equal weights tie constantly
    df.select(col(idCol), weight.cast("long").as("weight"),
        TextOps.hex15(concat(lit(salt + "|"), col(idCol).cast("string")))
          .as("__h"))
      .withColumn("priority",
        expr("__h DIV greatest(weight, 1)"))
      .orderBy(col("priority").asc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("weight"), col("priority"))
  }

  /** Deterministic output-shard planning: assign every document to a
    * fixed-token-budget shard (`shard_id = cum_before div
    * shardTokens` over the global salted-hash order) — the writer
    * plan that turns a 100 TB corpus into ~uniform shard files with
    * reproducible membership (re-running the plan on the same corpus
    * yields byte-identical shards; `rand()`-partitioned writers give
    * neither uniformity nor reproducibility). Shards are contiguous
    * runs of the hash order, so membership is stable under
    * re-partitioning and cluster size.
    *
    * The global cumulative sum does NOT use a global window (the
    * repo's plan lint rejects one — it funnels the corpus through a
    * single task): the permutation key is (bucket, hash, id) with
    * bucket = hash % numBuckets, so the cumsum decomposes exactly
    * like [[epochShuffle]]'s rank — a per-bucket window (parallel)
    * plus broadcast cumulative bucket token-offsets, and because the
    * bucket is a prefix of the sort key, bucket-local cumsum +
    * bucket offset IS the global cumsum.
    *
    * Returns (idCol, n_tokens, cum_before, shard_id). A document
    * larger than `shardTokens` still lands in exactly one shard (the
    * plan never splits documents; the oversized shard is observable
    * through cum_before). */
  def shardPlan(df: DataFrame, idCol: String, textCol: String,
                shardTokens: Long, numBuckets: Int = 1024): DataFrame = {
    require(shardTokens >= 1, s"shardTokens must be >= 1, got $shardTokens")
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val h = TextOps.hex15(
      concat(lit("shard|"), col(idCol).cast("string")))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy("__bucket").orderBy(col("__h").asc, col(idCol).asc)
    val local = df.select(col(idCol),
        size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"),
        h.as("__h"), (h % numBuckets).as("__bucket"))
      .withColumn("__cum",
        sum("n_tokens").over(wLocal.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val offsets = bucketOffsets(local.groupBy("__bucket")
      .agg(sum("n_tokens").as("__cnt")))
    local.join(broadcast(offsets), Seq("__bucket"))
      .select(col(idCol), col("n_tokens"),
        (col("__off") + col("__cum") - col("n_tokens")).cast("long")
          .as("cum_before"),
        expr(s"(__off + __cum - n_tokens) div $shardTokens")
          .as("shard_id"))
  }

  /** Cumulative offset of every bucket = Σ counts of LOWER buckets —
    * the broadcast half of the bucket-decomposed global rank/cumsum
    * shared by [[shardPlan]], [[epochShuffle]] and
    * [[curriculumPhases]]. Input: (__bucket, __cnt); output:
    * (__bucket, __off). Bucket cardinality is the (bounded) bucket
    * count, so the theta-join is broadcast-sized by construction. */
  private def bucketOffsets(counts: DataFrame): DataFrame = {
    val lower = broadcast(counts
      .select(col("__bucket").as("__lb"), col("__cnt").as("__lc")))
    counts.join(lower, col("__lb") < col("__bucket"), "left")
      .groupBy("__bucket")
      .agg(coalesce(sum("__lc"), lit(0L)).as("__off"))
  }

  /** Deterministic epoch shuffle + fixed-size batch assignment: the
    * global training-order permutation every pre-training run needs,
    * without the global-window bottleneck. A naive `row_number()
    * OVER (ORDER BY hash)` ranks the whole corpus in ONE task; here
    * the permutation key is `(bucket, hash, id)` with `bucket =
    * hash % numBuckets`, so ranking decomposes: a per-bucket window
    * (parallel — each bucket is an independent partition) plus a
    * cumulative bucket-offset table (numBuckets rows — bounded,
    * broadcast back). Because the bucket is itself a prefix of the
    * sort key, bucket-local rank + bucket offset IS the global rank.
    * The permutation is exactly as pseudorandom as the hash and
    * reproducible across runs, engines, partitionings, and cluster
    * sizes — `rand()`-based shuffles are none of these.
    *
    * Returns `(idCol, pos, batch_id)`: `pos` is the 1-based global
    * shuffled position, `batch_id = (pos-1) / batchSize`. Epochs
    * differ by salt (`epoch` feeds the hash), so re-shuffling an
    * epoch is a projection change, not a data move.
    *
    * Scale: one hash-key shuffle for the per-bucket windows, one
    * bounded (numBuckets-row) agg + broadcast join. The cumulative
    * bucket offsets come from a triangular self-join of the counts
    * table — numBuckets² comparisons bounded by the KNOB, not the
    * data — so NO unpartitioned window exists anywhere in the plan
    * (the repo's plan lint rejects them: a global window funnels its
    * whole input through one task). */
  /** CURRICULUM phase assignment: each row's global quantile bucket
    * under the (score, id) order — quality-ascending training
    * curricula assign phase = decile of the quality score, and the
    * naive plan is a GLOBAL row_number (one task at 100 TB). Here the
    * rank decomposes exactly like [[epochShuffle]]'s, but stronger:
    * the bucket is an ORDER-PRESERVING coarsening of the score itself
    * (`score DIV bucketWidth`), so bucket-local rank + broadcast
    * cumulative bucket counts IS the global rank under the DESIRED
    * order, not a defined-order substitute. Per-bucket parallelism is
    * bounded by score granularity (a single hot score value cannot
    * split across buckets — shrink bucketWidth toward 1 for
    * fine-grained scores; integer scores with heavy ties are the
    * pathological case and land in one window task per value).
    * Output: (id, score, global_rank 1-based, phase 0..phases-1 via
    * (rank−1)·phases div total). */
  def curriculumPhases(df: DataFrame, idCol: String, scoreCol: String,
                       phases: Int = 10,
                       bucketWidth: Long = 64L): DataFrame = {
    require(phases >= 2, s"phases must be >= 2, got $phases")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy("__bucket").orderBy(col("score").asc, col(idCol).asc)
    val ranked = df
      .select(col(idCol), col(scoreCol).cast("long").as("score"))
      .withColumn("__bucket", expr(s"score DIV $bucketWidth"))
      .withColumn("__rn", row_number().over(wLocal))
    val counts = ranked.groupBy("__bucket").agg(count(lit(1)).as("__cnt"))
    val offsets = bucketOffsets(counts)
    val total = counts.agg(sum("__cnt").as("__total"))
    ranked.join(broadcast(offsets), Seq("__bucket"))
      .crossJoin(broadcast(total))
      .select(col(idCol), col("score"),
        (col("__off") + col("__rn")).cast("long").as("global_rank"),
        expr(s"(__off + __rn - 1) * $phases DIV __total").as("phase"))
  }

  def epochShuffle(df: DataFrame, idCol: String, batchSize: Int,
                   epoch: Int = 0, numBuckets: Int = 1024): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val h = TextOps.hex15(
      concat(lit(s"epoch$epoch|"), col(idCol).cast("string")))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy("__bucket").orderBy(col("__h").asc, col(idCol).asc)
    val ranked = df.select(col(idCol), h.as("__h"),
        (h % numBuckets).as("__bucket"))
      .withColumn("__rn", row_number().over(wLocal))
    val offsets = bucketOffsets(
      ranked.groupBy("__bucket").agg(count(lit(1)).as("__cnt")))
    ranked.join(broadcast(offsets), Seq("__bucket"))
      .select(col(idCol),
        (col("__off") + col("__rn")).cast("long").as("pos"),
        ((col("__off") + col("__rn") - 1) / batchSize).cast("long")
          .as("batch_id"))
  }
}
