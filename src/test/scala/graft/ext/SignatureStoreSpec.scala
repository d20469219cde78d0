package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The persisted signature store must be INVISIBLE in the answer:
  * every route through the store equals Dedup.incrementalNearDups
  * over the same logical index — including across an append and under
  * a bucket cap — because the store is a cache of deterministic
  * derivations, never a different algorithm. */
class SignatureStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs: DataFrame =
    graft.sources.Tables.documents(spark, dir).select("doc_id", "text")

  private def clones(every: Int, off: Long, marker: String): DataFrame =
    docs.filter(col("doc_id") % every === 0)
      .select((col("doc_id") + off).as("doc_id"),
        concat(col("text"), lit(marker)).as("text"))

  private def rows(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("new_id").cast("long"), col("index_id").cast("long"),
        col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("store ingest equals the direct route on the same inputs") {
    val store = "/tmp/graft_sigstore_spec1"
    val batch = clones(13, 600000L, " graftincr end")
    SignatureStore.build(docs, "doc_id", "text", store)
    val stored = rows(SignatureStore.ingest(spark, store, batch,
      "doc_id", "text"))
    val direct = rows(Dedup.incrementalNearDups(docs, batch,
      "doc_id", "text"))
    assert(stored == direct)
    assert(stored.nonEmpty) // the fixture plants real matches
  }

  test("an appended batch is probe-able exactly like a built doc") {
    val store = "/tmp/graft_sigstore_spec2"
    val batchA = clones(13, 600000L, " graftincr end")
    val batchB = clones(26, 800000L, " graftincr fresh")
    SignatureStore.build(docs, "doc_id", "text", store)
    SignatureStore.append(batchA, "doc_id", "text", store)
    val stored = rows(SignatureStore.ingest(spark, store, batchB,
      "doc_id", "text"))
    val direct = rows(Dedup.incrementalNearDups(
      docs.unionByName(batchA), batchB, "doc_id", "text"))
    assert(stored == direct)
    // the append mattered: some of B's matches are A's clones
    assert(stored.exists { case (_, idx, _) => idx >= 600000L })
  }

  test("bucket-cap pruning counts probed buckets like the direct route") {
    val store = "/tmp/graft_sigstore_spec3"
    val batch = clones(13, 600000L, " graftincr end")
    SignatureStore.build(docs, "doc_id", "text", store)
    for (cap <- Seq(1, 2, Int.MaxValue)) {
      val stored = rows(SignatureStore.ingest(spark, store, batch,
        "doc_id", "text", maxBucketSize = cap))
      val direct = rows(Dedup.incrementalNearDups(docs, batch,
        "doc_id", "text", maxBucketSize = cap))
      assert(stored == direct, s"cap=$cap")
    }
  }

  test("ingest derives the signature config from the store, not the caller") {
    val store = "/tmp/graft_sigstore_spec4"
    val batch = clones(13, 600000L, " graftincr end")
    SignatureStore.build(docs, "doc_id", "text", store, numHashes = 4)
    assert(SignatureStore.params(spark, store) == (3, 4))
    val stored = rows(SignatureStore.ingest(spark, store, batch,
      "doc_id", "text"))
    val direct = rows(Dedup.incrementalNearDups(docs, batch,
      "doc_id", "text", numHashes = 4))
    assert(stored == direct)
  }
}
