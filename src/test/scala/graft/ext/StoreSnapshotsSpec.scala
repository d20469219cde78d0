package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The store-level snapshot must make a multi-artifact append ATOMIC
  * to readers: a query interleaved between the per-artifact commits
  * sees the all-old store (never new postings against stale df), the
  * post-commit query sees all-new; frozen seed files verify at
  * resolve time (missing/modified fails loudly BEFORE any scan);
  * snapshot-aware vacuum keeps every artifact generation a surviving
  * snapshot pins; and the whole protocol runs unchanged on the
  * object-store manifest transport. */
abstract class StoreSnapshotsBehavior(tag: String, objectStore: Boolean)
    extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val objIo = new graft.sources.ObjectStoreManifestIO

  private def docs: DataFrame =
    graft.sources.Tables.documents(spark, dir).select("doc_id", "text")

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def fresh(path0: String): String = {
    val path = s"${path0}_$tag"
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      val it = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      } finally it.close()
    }
    if (objectStore) graft.sources.ManifestIO.register(path, objIo)
    path
  }

  // ---- retrieval store: the judge case — postings committed, df not

  private def corpus: DataFrame = docs.filter(col("doc_id") >= 20)
  // the batch duplicates the corpus's RARE-term documents under new
  // ids: appending it changes df("dup") (so every score moves) and
  // adds rankable docs — the committed append MUST shift the answer
  // (non-vacuousness for the all-old/all-new checks). "dup" is the
  // one rare token in the synthetic vocabulary (df 25/500); the
  // others are stopword-frequent and idf-floor to 0.
  private def batchB: DataFrame =
    docs.filter(col("doc_id") >= 20 && col("text").contains("dup"))
      .select((col("doc_id") + 700000).as("doc_id"), col("text"))
  private def queries: DataFrame =
    docs.filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"),
        array(lit("dup"), lit("vector"), lit("line")).as("terms"))

  /** The exact per-artifact derivations [[RetrievalIndexStore.append]]
    * runs, exposed stepwise so the test can COMMIT BETWEEN THEM — the
    * interleaving a crash or a slow writer produces. */
  private def postRows(b: DataFrame, tokBuckets: Int): DataFrame =
    Retrieval.postings(b, "doc_id", "text")
      .select(col("doc_id").cast("long").as("doc_id"), col("tok"),
        col("tf"), col("dl"))
      .withColumn("tok_bucket",
        pmod(xxhash64(col("tok")), lit(tokBuckets.toLong)))

  test("reader between a retrieval append's artifact commits sees the " +
      "all-old store; the snapshot commit flips it to all-new") {
    val path = fresh("/tmp/graft_snapspec_ret")
    RetrievalIndexStore.build(corpus, "doc_id", "text", path)
    StoreSnapshots.enable("retrieval", path)
    val base = rows(RetrievalIndexStore.query(spark, path, queries,
      "query_id", "terms", k = 5))
    assert(base.nonEmpty)

    // HALF-APPEND: batch postings land and their artifact generation
    // commits — but df/stats have not moved yet. Without the store
    // snapshot, a reader here would score batchB's postings against
    // corpus-only document frequencies.
    val tokBuckets = RetrievalIndexStore.params(spark, path)
    val post = postRows(batchB, tokBuckets).localCheckpoint()
    post.repartition(col("tok_bucket")).write.partitionBy("tok_bucket")
      .mode(SaveMode.Append).parquet(s"$path/postings.parquet")
    StoreGenerations.commitAppend(s"$path/postings.parquet")
    assert(StoreGenerations.currentGen(s"$path/postings.parquet").get >
      StoreSnapshots.pin(spark, path)
        .pinnedGens(java.nio.file.Paths.get(s"$path/postings.parquet")
          .toAbsolutePath.normalize.toString),
      "the half-append must have advanced the artifact chain")
    val interleaved = rows(RetrievalIndexStore.query(spark, path, queries,
      "query_id", "terms", k = 5))
    assert(interleaved == base,
      "a reader between artifact commits must see the ALL-OLD store")

    // finish the append: df + stats commits, then the atomic point
    post.groupBy("tok", "tok_bucket").agg(count(lit(1)).as("df"))
      .repartition(col("tok_bucket")).write.partitionBy("tok_bucket")
      .mode(SaveMode.Append).parquet(s"$path/df.parquet")
    StoreGenerations.commitAppend(s"$path/df.parquet")
    post.groupBy("doc_id").agg(max("dl").as("__dl"))
      .agg(count(lit(1)).as("n_docs"), sum("__dl").as("total_dl"))
      .coalesce(1).write.mode(SaveMode.Append)
      .parquet(s"$path/stats.parquet")
    StoreGenerations.commitAppend(s"$path/stats.parquet")
    StoreSnapshots.commit("retrieval", path)

    val after = rows(RetrievalIndexStore.query(spark, path, queries,
      "query_id", "terms", k = 5))
    val direct = rows(Retrieval.bm25TopK(queries, "query_id", "terms",
      corpus.unionByName(batchB), "doc_id", "text", 5))
    assert(after == direct,
      "post-commit the store must answer as the extended corpus")
    assert(after != base, "the batch shifts at least one ranking")
  }

  test("sig store: bands committed without sets stays invisible until " +
      "the snapshot commit; committed state equals a normal append's") {
    val path = fresh("/tmp/graft_snapspec_sig")
    val twin = fresh("/tmp/graft_snapspec_sigtwin")
    val baseDocs = docs.filter(col("doc_id") % 2 === 0)
    val wave = docs.filter(col("doc_id") % 2 === 1)
    val probe = docs.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 600000).as("doc_id"),
        concat(col("text"), lit(" snapend")).as("text"))
    SignatureStore.build(baseDocs, "doc_id", "text", path)
    SignatureStore.build(baseDocs, "doc_id", "text", twin)
    StoreSnapshots.enable("sig", path)
    val before = rows(SignatureStore.ingest(spark, path, probe,
      "doc_id", "text"))
    // half-append: bands only (the exact first half of append())
    val (shingleN, numHashes) = SignatureStore.params(spark, path)
    Dedup.nativeBands(wave, "doc_id", "text", shingleN, numHashes)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("band"), col("bkey"))
      .write.mode(SaveMode.Append).parquet(s"$path/bands.parquet")
    StoreGenerations.commitAppend(s"$path/bands.parquet")
    assert(rows(SignatureStore.ingest(spark, path, probe,
      "doc_id", "text")) == before,
      "a reader between bands and sets commits must see the all-old " +
        "store — a new band row without its verification set would " +
        "silently drop the pair instead")
    // finish: sets + the atomic commit
    Dedup.shingleRows(wave, "doc_id", "text", shingleN)
      .groupBy(col("doc_id"))
      .agg(collect_list(col("shingle")).as("shingles"))
      .select(col("doc_id").cast("long").as("doc_id"), col("shingles"))
      .write.mode(SaveMode.Append).parquet(s"$path/sets.parquet")
    StoreGenerations.commitAppend(s"$path/sets.parquet")
    StoreSnapshots.commit("sig", path)
    SignatureStore.append(wave, "doc_id", "text", twin)
    assert(rows(SignatureStore.ingest(spark, path, probe,
      "doc_id", "text")) ==
      rows(SignatureStore.ingest(spark, twin, probe, "doc_id", "text")),
      "the committed snapshot equals a normal append's store")
  }

  test("frozen seeds verify at resolve time: a modified or missing " +
      "seed fails loudly naming the file, before any scan") {
    val path = fresh("/tmp/graft_snapspec_seed")
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val cands = e.filter(col("vec_id") >= 20)
    val cents = cands.filter(col("vec_id") % 7 === 0)
    val qs = e.filter(col("vec_id") < 20)
    VectorIndexStore.build(cands, "vec_id", "embedding", path,
      cents, cents, numSub = 8, subDim = 8, cellBuckets = 16)
    StoreSnapshots.enable("vector", path)
    val ok = rows(VectorIndexStore.query(spark, path, qs,
      "vec_id", "embedding", k = 3, nprobe = 3))
    assert(ok.nonEmpty)
    val seedFile = graft.sources.Layout
      .listParquet(s"$path/centroids.parquet").head
    val orig = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(seedFile))
    // modified seed: size changes → resolve-time failure naming it
    java.nio.file.Files.write(java.nio.file.Paths.get(seedFile),
      (orig :+ 0.toByte))
    val eMod = intercept[IllegalStateException] {
      VectorIndexStore.query(spark, path, qs,
        "vec_id", "embedding", k = 3, nprobe = 3)
    }
    assert(eMod.getMessage.contains("seed file modified") &&
      eMod.getMessage.contains(seedFile))
    // missing seed
    java.nio.file.Files.delete(java.nio.file.Paths.get(seedFile))
    val eGone = intercept[IllegalStateException] {
      VectorIndexStore.query(spark, path, qs,
        "vec_id", "embedding", k = 3, nprobe = 3)
    }
    assert(eGone.getMessage.contains("seed file missing") &&
      eGone.getMessage.contains(seedFile))
    // restored: the store answers exactly as before
    java.nio.file.Files.write(
      java.nio.file.Paths.get(seedFile), orig)
    assert(rows(VectorIndexStore.query(spark, path, qs,
      "vec_id", "embedding", k = 3, nprobe = 3)) == ok)
  }

  test("snapshot-aware vacuum keeps every artifact generation a " +
      "surviving snapshot pins; dropped snapshots fail loudly") {
    val path = fresh("/tmp/graft_snapspec_vac")
    val d = docs
    SignatureStore.build(d.filter(col("doc_id") % 4 === 0),
      "doc_id", "text", path)
    StoreSnapshots.enable("sig", path)
    (1 to 3).foreach { k =>
      SignatureStore.append(d.filter(col("doc_id") % 4 === k),
        "doc_id", "text", path)
    }
    assert(StoreSnapshots.currentGen(path).contains(3L))
    val pin2 = StoreSnapshots.pinAt(spark, path, 2L)
    val n2 = pin2.read(s"$path/bands.parquet").count()
    val (files, manifests) = StoreSnapshots.vacuum("sig", path,
      keepGens = 2)
    assert(manifests >= 2, s"vacuum dropped $manifests manifests")
    // snapshots {2, 3} survive: the old pin still resolves EXACTLY,
    // through artifact generations only snapshot 2 pins
    assert(StoreSnapshots.pinAt(spark, path, 2L)
      .read(s"$path/bands.parquet").count() == n2)
    assert(pin2.read(s"$path/bands.parquet").count() == n2)
    intercept[IllegalStateException] {
      StoreSnapshots.pinAt(spark, path, 1L)
    }
    // a later cycle passing snapshot 2: its pin is gone, loudly
    SignatureStore.append(d.filter(col("doc_id") % 13 === 5)
      .select((col("doc_id") + 800000).as("doc_id"), col("text")),
      "doc_id", "text", path)
    StoreSnapshots.vacuum("sig", path, keepGens = 1)
    intercept[IllegalStateException] {
      StoreSnapshots.pinAt(spark, path, 2L)
    }
    assert(files >= 0)
  }

  test("auto-maintenance on a snapshotted store: one post-compaction " +
      "snapshot, answers unchanged, current pin always resolves") {
    val path = fresh("/tmp/graft_snapspec_auto")
    val d = docs
    val probe = d.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 600000).as("doc_id"),
        concat(col("text"), lit(" snapauto")).as("text"))
    SignatureStore.build(d.filter(col("doc_id") % 4 === 0),
      "doc_id", "text", path)
    StoreSnapshots.enable("sig", path)
    (1 to 2).foreach { k =>
      SignatureStore.append(d.filter(col("doc_id") % 4 === k),
        "doc_id", "text", path)
    }
    val expected = rows(SignatureStore.ingest(spark, path, probe,
      "doc_id", "text"))
    SignatureStore.append(d.filter(col("doc_id") % 4 === 3),
      "doc_id", "text", path,
      autoMaintain = Some(StoreMaintenance.AutoMaintain(ratio = 2.0)))
    val expected2 = rows(SignatureStore.ingest(spark, path, probe,
      "doc_id", "text"))
    assert(expected2.size >= expected.size)
    // the tick compacted + committed + vacuumed: the store is at a
    // bounded file count and the current snapshot resolves cleanly
    val bands = s"$path/bands.parquet"
    assert(StoreGenerations.currentFiles(bands).get.length <= 3)
    val pin = StoreSnapshots.pin(spark, path)
    assert(pin.read(bands).count() > 0)
    // idempotent commit: nothing moved, so no snapshot churn
    val g = StoreSnapshots.currentGen(path).get
    assert(StoreSnapshots.commit("sig", path) == g)
  }
}

class StoreSnapshotsSpec
    extends StoreSnapshotsBehavior("posix", objectStore = false)

/** The same behavior on the object-store manifest transport (LIST /
  * GET / conditional PUT only) — store-level atomicity needs nothing
  * POSIX. */
class StoreSnapshotsObjectStoreSpec
    extends StoreSnapshotsBehavior("objstore", objectStore = true)
