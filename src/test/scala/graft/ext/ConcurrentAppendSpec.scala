package graft.ext

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The multi-writer append protocol ([[StoreGenerations.landOwn]] +
  * [[StoreGenerations.commitOwn]] — land privately, CAS-commit the
  * exact file set, re-base on a lost race): N genuinely racing
  * writers must each get their WHOLE batch onto the chain exactly
  * once, every surviving generation must differ from its parent by
  * exactly one writer's batch (no torn batches, ever), pinned
  * readers must be untouched, and the vector store's concurrent face
  * ([[VectorIndexStore.appendOwn]]) must be invisible in the answer
  * (== the direct IVFADC chain over the same logical corpus). */
class ConcurrentAppendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def deleteTree(p: String): Unit = {
    val root = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(root)) {
      val it = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      } finally it.close()
    }
  }

  private def freshChain(path: String, baseRows: Seq[Long]): Unit = {
    import spark.implicits._
    deleteTree(path)
    baseRows.toDF("id").coalesce(1).write.parquet(path)
    StoreGenerations.enable(path)
  }

  private def chainIds(path: String): Set[Long] =
    StoreGenerations.read(spark, path)
      .collect().map(_.getLong(0)).toSet

  test("racing writers each commit their whole batch exactly once, " +
    "and every generation adds exactly one writer's batch") {
    val path = "/tmp/graft_concspec_race"
    freshChain(path, Seq(0L))
    import spark.implicits._
    val writers = 6
    val barrier = new java.util.concurrent.CyclicBarrier(writers)
    val landed = new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
    val futures = (1 to writers).map { w =>
      Future {
        // two rows per writer, landed as two private files (two
        // lands, one commit — commitOwn takes the combined set)
        val files =
          StoreGenerations.landOwn(Seq(w * 100L).toDF("id").coalesce(1),
            path, writerTag = s"t$w") ++
          StoreGenerations.landOwn(Seq(w * 100L + 1L).toDF("id").coalesce(1),
            path, writerTag = s"t$w")
        landed.put(s"t$w", files)
        barrier.await() // maximize genuine commit contention
        StoreGenerations.commitOwn(path, files)
      }
    }
    Await.result(Future.sequence(futures), 5.minutes)
    // every writer's rows present exactly once
    val ids = StoreGenerations.read(spark, path)
      .groupBy(col("id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (Seq(0L) ++
      (1 to writers).flatMap(w => Seq(w * 100L, w * 100L + 1L))).toSet
    assert(ids.keySet == expected)
    assert(ids.values.forall(_ == 1L), s"duplicated rows: $ids")
    // chain shape: base gen + one generation per writer, each adding
    // exactly that writer's whole landed batch — atomic visibility
    val cur = StoreGenerations.currentGen(path).get
    assert(cur == writers.toLong)
    val wTag = "w(t\\d+)-u".r
    (1L to cur).foreach { g =>
      val prev = StoreGenerations.filesAt(path, g - 1).get.toSet
      val now = StoreGenerations.filesAt(path, g).get.toSet
      assert(prev.subsetOf(now), s"gen $g dropped files")
      val added = (now -- prev).toSeq
      val tags = added.flatMap(p =>
        wTag.findFirstMatchIn(p.substring(p.lastIndexOf('/') + 1))
          .map(_.group(1))).distinct
      assert(tags.length == 1,
        s"gen $g mixes writers' files: $added")
      assert(added.toSet == landed.get(tags.head).toSet,
        s"gen $g carries a PARTIAL batch for ${tags.head}")
    }
  }

  test("a reader pinned before the race resolves its exact state") {
    val path = "/tmp/graft_concspec_pin"
    freshChain(path, Seq(1L, 2L))
    import spark.implicits._
    val before = chainIds(path)
    val pinnedGen = StoreGenerations.currentGen(path).get
    val futures = (1 to 3).map { w =>
      Future {
        StoreGenerations.commitOwn(path, StoreGenerations.landOwn(
          Seq(w + 10L).toDF("id"), path, writerTag = s"p$w"))
      }
    }
    Await.result(Future.sequence(futures), 5.minutes)
    val pinned = StoreGenerations.readAt(spark, path, pinnedGen)
      .collect().map(_.getLong(0)).toSet
    assert(pinned == before)
    assert(chainIds(path) == before ++ Set(11L, 12L, 13L))
  }

  test("re-base without a race: a commit on a stale base adopts the " +
    "interleaved writer's generation as its parent") {
    val path = "/tmp/graft_concspec_rebase"
    freshChain(path, Seq(0L))
    import spark.implicits._
    val filesA = StoreGenerations.landOwn(
      Seq(100L).toDF("id"), path, writerTag = "a")
    // writer B lands AND commits while A sits between land and commit
    StoreGenerations.commitOwn(path, StoreGenerations.landOwn(
      Seq(200L).toDF("id"), path, writerTag = "b"))
    val genA = StoreGenerations.commitOwn(path, filesA)
    assert(genA == 2L)
    assert(chainIds(path) == Set(0L, 100L, 200L))
  }

  test("replaying a commit of already-chained files is a no-op") {
    val path = "/tmp/graft_concspec_replay"
    freshChain(path, Seq(0L))
    import spark.implicits._
    val files = StoreGenerations.landOwn(
      Seq(7L).toDF("id"), path, writerTag = "r")
    val gen = StoreGenerations.commitOwn(path, files)
    assert(StoreGenerations.commitOwn(path, files) == gen)
    assert(StoreGenerations.currentGen(path).get == gen)
    assert(chainIds(path) == Set(0L, 7L))
  }

  test("a foreign partial adoption of a writer's batch fails loudly") {
    val path = "/tmp/graft_concspec_torn"
    freshChain(path, Seq(0L))
    import spark.implicits._
    val files =
      StoreGenerations.landOwn(Seq(1L).toDF("id").coalesce(1),
        path, writerTag = "x") ++
      StoreGenerations.landOwn(Seq(2L).toDF("id").coalesce(1),
        path, writerTag = "x")
    assert(files.length == 2)
    // a foreign commit adopts ONE of the writer's two files
    StoreGenerations.publish(path, 1L,
      StoreGenerations.currentFiles(path).get :+ files.head)
    val e = intercept[IllegalArgumentException] {
      StoreGenerations.commitOwn(path, files)
    }
    assert(e.getMessage.contains("PARTIALLY referenced"))
  }

  test("the adopt-everything commitAppend never adopts a concurrent " +
    "writer's landed-uncommitted files") {
    val path = "/tmp/graft_concspec_mixed"
    freshChain(path, Seq(0L))
    import spark.implicits._
    val landed = StoreGenerations.landOwn(
      Seq(50L).toDF("id"), path, writerTag = "z")
    // a plain append lands an untagged file and commits; the
    // concurrent writer's private file must stay invisible
    Seq(60L).toDF("id").coalesce(1)
      .write.mode("append").parquet(path)
    StoreGenerations.commitAppend(path)
    assert(chainIds(path) == Set(0L, 60L))
    // the concurrent writer's own commit then lands its whole batch
    StoreGenerations.commitOwn(path, landed)
    assert(chainIds(path) == Set(0L, 50L, 60L))
  }

  // ---- multi-artifact stores: the file-level snapshot commit ----

  private def docs: DataFrame =
    graft.sources.Tables.documents(spark, dir).select("doc_id", "text")

  private def snapDocIds(path: String, artifact: String, gen: Long): Set[Long] =
    StoreSnapshots.pinAt(spark, path, gen).read(s"$path/$artifact")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet

  test("racing sig-store writers commit bands and sets ATOMICALLY: " +
    "every surviving snapshot's bands cover exactly its sets") {
    val path = "/tmp/graft_concspec_sig"
    deleteTree(path)
    val base = docs.filter(col("doc_id") < 200)
    SignatureStore.build(base, "doc_id", "text", path)
    StoreSnapshots.enable("sig", path)
    val writers = 4
    val barrier = new java.util.concurrent.CyclicBarrier(writers)
    val futures = (1 to writers).map { w =>
      Future {
        val batch = docs
          .filter(col("doc_id") >= 200 && col("doc_id") % writers === w - 1)
          .select((col("doc_id") + 10000L * w).as("doc_id"), col("text"))
        barrier.await()
        SignatureStore.appendOwn(batch, "doc_id", "text", path,
          writerTag = s"sw$w")
      }
    }
    Await.result(Future.sequence(futures), 10.minutes)
    val cur = StoreSnapshots.currentGen(path).get
    assert(cur == writers.toLong) // one snapshot per writer, re-based
    // THE atomicity audit: at EVERY snapshot, a band-probe candidate
    // always has its verification set — doc sets identical per pin
    (0L to cur).foreach { g =>
      val bandDocs = snapDocIds(path, "bands.parquet", g)
      val setDocs = snapDocIds(path, "sets.parquet", g)
      assert(bandDocs == setDocs,
        s"snapshot $g is TORN: bands ${bandDocs.size} docs vs sets " +
          s"${setDocs.size}")
    }
    // and the final state carries every writer's whole batch
    val baseIds = base.select("doc_id").collect().map(_.getLong(0)).toSet
    val want = baseIds ++ (1 to writers).flatMap { w =>
      docs.filter(col("doc_id") >= 200 && col("doc_id") % writers === w - 1)
        .collect().map(r => r.getLong(0) + 10000L * w)
    }.toSet
    assert(snapDocIds(path, "bands.parquet", cur) == want)
  }

  test("a store pin between a writer's private lands sees NOTHING of " +
    "the batch; the file-level commit then publishes all of it") {
    val path = "/tmp/graft_concspec_sig2"
    deleteTree(path)
    val base = docs.filter(col("doc_id") < 100)
    SignatureStore.build(base, "doc_id", "text", path)
    StoreSnapshots.enable("sig", path)
    val before = snapDocIds(path, "bands.parquet",
      StoreSnapshots.currentGen(path).get)
    val batch = docs.filter(col("doc_id") >= 100 && col("doc_id") < 150)
    val (shingleN, numHashes) = SignatureStore.params(spark, path)
    // land privately (the writer's first half-step)…
    val bands = StoreGenerations.landOwn(
      Dedup.nativeBands(batch, "doc_id", "text", shingleN, numHashes)
        .select(col("doc_id").cast("long").as("doc_id"),
          col("band"), col("bkey")),
      s"$path/bands.parquet", "half")
    // …a reader pinning NOW sees the pre-batch store exactly
    val mid = StoreSnapshots.pin(spark, path)
    assert(mid.read(s"$path/bands.parquet")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      == before)
    // finish the batch and commit it as one snapshot
    val sets = StoreGenerations.landOwn(
      Dedup.shingleRows(batch, "doc_id", "text", shingleN)
        .groupBy(col("doc_id"))
        .agg(collect_list(col("shingle")).as("shingles"))
        .select(col("doc_id").cast("long").as("doc_id"), col("shingles")),
      s"$path/sets.parquet", "half")
    StoreSnapshots.commitOwnStore("sig", path, Map(
      s"$path/bands.parquet" -> bands, s"$path/sets.parquet" -> sets))
    val cur = StoreSnapshots.currentGen(path).get
    val after = snapDocIds(path, "bands.parquet", cur)
    assert(after == before ++ batch.collect().map(_.getLong(0)))
    assert(snapDocIds(path, "sets.parquet", cur) == after)
    // the mid-flight pin STILL resolves the pre-batch store
    assert(mid.read(s"$path/bands.parquet")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      == before)
  }

  test("fold adopts pending file-level commits into the chains and " +
    "compaction answers unchanged") {
    val path = "/tmp/graft_concspec_sigfold"
    deleteTree(path)
    SignatureStore.build(docs.filter(col("doc_id") < 200),
      "doc_id", "text", path)
    StoreSnapshots.enable("sig", path)
    val batch = docs.filter(col("doc_id") >= 200 && col("doc_id") < 260)
      .select((col("doc_id") + 600000L).as("doc_id"), col("text"))
    SignatureStore.appendOwn(batch, "doc_id", "text", path, "fw")
    val probe = docs.filter(col("doc_id") >= 260 && col("doc_id") < 290)
      .select((col("doc_id") + 800000L).as("doc_id"), col("text"))
    def answers(): Set[(Long, Long)] =
      SignatureStore.ingest(spark, path, probe, "doc_id", "text")
        .select("new_id", "index_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val beforeFold = answers()
    // the current snapshot carries d-lines; compaction folds them
    // into the chains first, then compacts — answers unchanged and
    // the post-compaction snapshot carries no d-lines
    StoreMaintenance.compactSignatureStore(spark, path)
    StoreSnapshots.commit("sig", path)
    assert(answers() == beforeFold)
    val io = graft.sources.ManifestIO.forPath(path)
    val cur = StoreSnapshots.currentGen(path).get
    val content = io.read(s"$path/_store_manifests/gen=$cur").get
    assert(!content.contains("d\t"),
      s"post-fold snapshot still carries file-level entries:\n$content")
  }

  test("snapshot vacuum spares unfolded file-level commits") {
    val path = "/tmp/graft_concspec_sigvac"
    deleteTree(path)
    SignatureStore.build(docs.filter(col("doc_id") < 150),
      "doc_id", "text", path)
    StoreSnapshots.enable("sig", path)
    val batch = docs.filter(col("doc_id") >= 150 && col("doc_id") < 200)
      .select((col("doc_id") + 600000L).as("doc_id"), col("text"))
    SignatureStore.appendOwn(batch, "doc_id", "text", path, "vw")
    // keep only the newest snapshot: its d-files must survive the
    // artifact vacuums even though NO chain references them
    StoreSnapshots.vacuum("sig", path, keepGens = 1)
    val cur = StoreSnapshots.currentGen(path).get
    val ids = snapDocIds(path, "bands.parquet", cur)
    assert(batch.collect().map(_.getLong(0)).toSet.subsetOf(ids))
    assert(snapDocIds(path, "sets.parquet", cur) == ids)
  }

  test("racing BM25 writers never let postings outrun df/stats: at " +
    "every snapshot, stats' N equals the postings' distinct docs") {
    val path = "/tmp/graft_concspec_bm25"
    deleteTree(path)
    val corpus = docs.filter(col("doc_id") >= 20 && col("doc_id") < 300)
    RetrievalIndexStore.build(corpus.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", path)
    StoreSnapshots.enable("retrieval", path)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val futures = Seq(1, 2).map { m =>
      Future {
        barrier.await()
        RetrievalIndexStore.appendOwn(
          corpus.filter(col("doc_id") % 3 === m),
          "doc_id", "text", path, writerTag = s"bw$m")
      }
    }
    Await.result(Future.sequence(futures), 10.minutes)
    val cur = StoreSnapshots.currentGen(path).get
    (0L to cur).foreach { g =>
      val pin = StoreSnapshots.pinAt(spark, path, g)
      val nPost = pin.read(s"$path/postings.parquet")
        .select("doc_id").distinct().count()
      val nStats = pin.read(s"$path/stats.parquet")
        .agg(sum("n_docs")).collect()(0).getLong(0)
      assert(nPost == nStats,
        s"snapshot $g TORN: $nPost posting docs vs stats N=$nStats")
    }
    assert(StoreSnapshots.pinAt(spark, path, cur)
      .read(s"$path/postings.parquet")
      .select("doc_id").distinct().count() == corpus.count())
  }

  test("a streaming canonical append and a concurrent file-level " +
    "writer coexist: both batches land, every snapshot consistent, " +
    "replay still commits nothing") {
    val path = "/tmp/graft_concspec_interplay"
    deleteTree(path)
    SignatureStore.build(docs.filter(col("doc_id") < 150),
      "doc_id", "text", path)
    StoreSnapshots.enable("sig", path)
    val canonical = docs
      .filter(col("doc_id") >= 150 && col("doc_id") < 200)
      .select((col("doc_id") + 600000L).as("doc_id"), col("text"))
      .localCheckpoint()
    val own = docs.filter(col("doc_id") >= 200 && col("doc_id") < 250)
      .select((col("doc_id") + 700000L).as("doc_id"), col("text"))
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val fCanon = Future {
      barrier.await()
      // what runSigIngestSink does per micro-batch
      SignatureStore.appendCanonical(canonical, "doc_id", "text", path,
        batchId = 0L, runTag = "ip")
    }
    val fOwn = Future {
      barrier.await()
      SignatureStore.appendOwn(own, "doc_id", "text", path, "ipw")
    }
    Await.result(Future.sequence(Seq(fCanon, fOwn)), 10.minutes)
    val cur = StoreSnapshots.currentGen(path).get
    // every surviving snapshot is cross-artifact consistent, however
    // the chain commits, the snapshot commit, and the file-level CAS
    // interleaved
    (0L to cur).foreach { g =>
      assert(snapDocIds(path, "bands.parquet", g)
        == snapDocIds(path, "sets.parquet", g), s"snapshot $g torn")
    }
    val want = docs.filter(col("doc_id") < 150)
      .collect().map(_.getLong(0)).toSet ++
      canonical.collect().map(_.getLong(0)) ++
      own.collect().map(_.getLong(0))
    assert(snapDocIds(path, "bands.parquet", cur) == want)
    // a replayed micro-batch overwrites its own canonical files and
    // commits nothing — no new snapshot, state unchanged
    SignatureStore.appendCanonical(canonical, "doc_id", "text", path,
      batchId = 0L, runTag = "ip")
    assert(StoreSnapshots.currentGen(path).get == cur)
    assert(snapDocIds(path, "bands.parquet", cur) == want)
  }

  // ---- the vector store's concurrent face ----

  private val (numSub, subDim) = (4, 2)
  private def emb: DataFrame =
    graft.sources.Tables.embeddings(spark, dir).select("vec_id", "embedding")
  private def queries: DataFrame = emb.filter(col("vec_id") < 5)
  private def cands: DataFrame = emb.filter(col("vec_id") >= 20)
  private def cents: DataFrame = cands.filter(col("vec_id") % 37 === 0)
  private def codebook: DataFrame = {
    val res = Similarity.ivfResiduals(cands, cents, "vec_id", "embedding")
      .select(col("neighbor_id").as("vec_id"), col("__rv").as("embedding"))
    KMeans.codebook(
      KMeans.fit(res, "vec_id", "embedding",
        k = 4, numSub = numSub, subDim = subDim, iters = 2))
      .select(col("cid").as("vec_id"), col("vector").as("embedding"))
  }
  private def rows(df: DataFrame): Set[(Long, Long, Int, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getInt(2), r.getDouble(3))).toSet

  test("concurrent vector-store appendOwn writers == the direct " +
    "IVFADC chain, with the snapshot chain advanced consistently") {
    val path = "/tmp/graft_concspec_vec"
    deleteTree(path)
    val cb = codebook.localCheckpoint()
    val base = cands.filter(col("vec_id") % 3 === 0)
    VectorIndexStore.build(base, "vec_id", "embedding", path, cents, cb,
      numSub, subDim)
    StoreSnapshots.enable("vector", path)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val futures = Seq(1, 2).map { m =>
      Future {
        barrier.await()
        VectorIndexStore.appendOwn(
          cands.filter(col("vec_id") % 3 === m),
          "vec_id", "embedding", path, writerTag = s"vw$m")
      }
    }
    Await.result(Future.sequence(futures), 5.minutes)
    val stored = rows(VectorIndexStore.query(spark, path, queries,
      "vec_id", "embedding", k = 3, nprobe = 2))
    val direct = rows(Similarity.ivfPqTopK(queries, cands, cents, cb,
      "vec_id", "embedding", k = 3, nprobe = 2,
      numSub = numSub, subDim = subDim))
    assert(stored == direct)
    assert(stored.nonEmpty)
    // the snapshot chain caught up to a consistent current state:
    // its pinned codes generation is the chain's current one
    val pin = StoreSnapshots.pin(spark, path)
    val codesDir = s"$path/codes.parquet"
    assert(pin.pinnedGens(java.nio.file.Paths.get(codesDir)
      .toAbsolutePath.normalize.toString) ==
      StoreGenerations.currentGen(codesDir).get)
  }
}
