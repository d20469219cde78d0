package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The composed LLM-training-data preparation pipeline — the product
  * shape all the ext operators exist for: exact dedup → near-dup
  * removal (MinHash-LSH candidates, keep the lowest doc id of each
  * verified pair) → quality gate → per-doc stats of the surviving
  * corpus. One declarative plan; every stage is banded/bucketed or a
  * hash aggregation, so the composition inherits the 100 TB posture of
  * its parts.
  */
object TrainingDataPipeline {

  /** Documents to drop as near-duplicates: the higher doc id of every
    * verified pair. (Greedy pairwise drop — transitive chains keep
    * their lowest member through pair ordering.) */
  def nearDupLosers(df: DataFrame, idCol: String, textCol: String,
                    minJaccard: Double): DataFrame =
    Dedup.nearDupPairs(df, idCol, textCol, minJaccard = minJaccard)
      .select(col("doc_b").as(idCol)).distinct()

  /** [[prepareReleasable]] without the handle — the pinned post-dedup
    * corpus stays cached for the session (what a long-lived pipeline
    * wants; a caller that moves on to unrelated work should use
    * [[prepareReleasable]] and release after consuming the result). */
  def prepare(docs: DataFrame, minJaccard: Double = 0.5,
              minQuality: Double = 0.3): DataFrame =
    prepareReleasable(docs, minJaccard, minQuality)._1

  /** Returns (result, release): `release()` unpersists the pinned
    * intermediate corpus once the result has been consumed. */
  def prepareReleasable(docs: DataFrame, minJaccard: Double = 0.5,
                        minQuality: Double = 0.3): (DataFrame, () => Unit) = {
    // 1. exact dedup: keep the lowest id per content hash
    val keepers = docs
      .groupBy(md5(col("text")).as("__h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .drop("__h")
    // The exact-deduped corpus feeds FOUR differently-shaped consumers
    // (MinHash signatures, verification shingles, the anti-join left
    // side, and the quality gate); exchange reuse is not guaranteed
    // across them, so without persistence the scan → md5-groupBy →
    // semi-join subtree re-executes once per consumer. Persisting here
    // mirrors what a real pipeline does anyway: the post-exact-dedup
    // corpus is the natural materialization point.
    val exactDeduped = docs.join(keepers, Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 2. near-dup removal over the exact-deduped corpus
    val losers = nearDupLosers(exactDeduped, "doc_id", "text", minJaccard)
    val nearDeduped = exactDeduped.join(losers, Seq("doc_id"), "left_anti")

    // 3. quality gate + 4. stats of the surviving corpus
    val result = TextOps.langQuality(nearDeduped, "doc_id", "text", "lang")
      .filter(col("quality") >= minQuality)
      .select("doc_id", "lang", "n_tokens", "quality")
    (result, () => { exactDeduped.unpersist(); () })
  }
}
