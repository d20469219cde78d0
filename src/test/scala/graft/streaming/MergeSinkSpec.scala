package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming merge sink's manifest table must (a) apply MERGE
  * semantics per micro-batch against the PREVIOUS generation,
  * (b) carry untouched seed files by reference across generations
  * (never copied, never rewritten), and (c) converge to the same
  * table when a batch replays after a mid-commit kill — exactly-once
  * table states from idempotence, with one manifest per batch id. */
abstract class MergeSinkBehavior(objectStore: Boolean)
    extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private lazy val objIo = new graft.sources.ObjectStoreManifestIO

  /** Temp base for one test, registered against the object-store
    * manifest transport when this suite instance exercises it. */
  private def tempBase(tag: String): java.nio.file.Path = {
    val b = java.nio.file.Files.createTempDirectory(s"graft-$tag")
    if (objectStore)
      graft.sources.ManifestIO.register(b.toString, objIo)
    b
  }

  /** Manifest entry names via the transport (gen=* plus any temp
    * leftovers), so assertions hold under both implementations. */
  private def manifestNames(root: String): Seq[String] =
    graft.sources.ManifestIO.forPath(root).list(s"$root/_manifests")

  case class Up(doc_id: Long, text: String, n_chars: Long,
                _deleted: Boolean)

  private def seed(base: String): Seq[String] = {
    graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "n_chars")
      .repartitionByRange(6, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(s"$base/seed")
    graft.sources.Layout.listParquet(s"$base/seed")
  }

  private def table(root: String): Map[Long, String] = {
    val files = StreamingOps.currentFiles(root).get
    spark.read.parquet(files: _*).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("per-batch MERGE against the previous generation") {
    val base = tempBase("msink1")
    val root = s"$base/table"
    val sf = seed(base.toString)
    val before = spark.read.parquet(sf: _*)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val s = MemoryStream[Up]
    val q = StreamingOps.runMergeSink(s.toDF(), root, sf, "doc_id",
      s"$base/ckpt")
    try {
      s.addData(Up(1L, "one updated", 11L, _deleted = false),
        Up(999001L, "brand new", 9L, _deleted = false))
      q.processAllAvailable()
      s.addData(Up(2L, "", 0L, _deleted = true),      // delete key 2
        Up(999001L, "new again", 9L, _deleted = false)) // update batch-1 insert
      q.processAllAvailable()
    } finally q.stop()
    val got = table(root)
    assert(got(1L) == "one updated")
    assert(got(999001L) == "new again")
    assert(!got.contains(2L))
    assert(got.size == before.size) // +1 insert, -1 delete
    val untouched = (before.keySet -- Set(1L, 2L, 999001L)).take(5)
    untouched.foreach(k => assert(got(k) == before(k)))
  }

  test("untouched seed files ride every generation by reference") {
    val base = tempBase("msink2")
    val root = s"$base/table"
    val sf = seed(base.toString)
    val mtimes = sf.map(p => p -> new java.io.File(p).lastModified()).toMap
    val s = MemoryStream[Up]
    val q = StreamingOps.runMergeSink(s.toDF(), root, sf, "doc_id",
      s"$base/ckpt")
    try {
      // two batches confined to the lowest keys: the high-range seed
      // files must appear VERBATIM in the final manifest
      s.addData(Up(0L, "low a", 5L, _deleted = false))
      q.processAllAvailable()
      s.addData(Up(1L, "low b", 5L, _deleted = false))
      q.processAllAvailable()
    } finally q.stop()
    val cur = StreamingOps.currentFiles(root).get
    val carried = sf.filter(cur.contains)
    assert(carried.size >= 4,
      s"low-key batches should carry most of 6 seed files: $cur")
    sf.foreach(p => assert(new java.io.File(p).lastModified() == mtimes(p),
      s"seed $p was modified"))
  }

  test("a replayed batch converges: same table, one manifest per batch id") {
    val base = tempBase("msink3")
    val root = s"$base/table"
    val sf = seed(base.toString)
    val ckpt = s"$base/ckpt"
    val batchA = Seq(Up(1L, "a1", 2L, _deleted = false))
    val batchB = Seq(Up(999003L, "b1", 2L, _deleted = false),
      Up(1L, "a2", 2L, _deleted = false))
    val s1 = MemoryStream[Up]
    val q1 = StreamingOps.runMergeSink(s1.toDF(), root, sf, "doc_id", ckpt)
    try { s1.addData(batchA: _*); q1.processAllAvailable() }
    finally q1.stop()
    val afterA = table(root)
    assert(afterA(1L) == "a1")
    // restart on the same checkpoint: the recovered source replays
    // its history (the at-least-once path a mid-commit kill produces),
    // then batch B applies exactly once on top
    val s2 = MemoryStream[Up]
    s2.addData(batchA: _*)
    val q2 = StreamingOps.runMergeSink(s2.toDF(), root, sf, "doc_id", ckpt)
    try { s2.addData(batchB: _*); q2.processAllAvailable() }
    finally q2.stop()
    val got = table(root)
    assert(got(1L) == "a2")
    assert(got(999003L) == "b1")
    assert(got.size == afterA.size + 1)
    // one manifest per batch id, none duplicated by the replay
    val gens = manifestNames(root)
      .filter(_.startsWith("gen=")).sorted
    assert(gens == Seq("gen=0", "gen=1"), s"manifests: $gens")
  }

  test("vacuum retires unreferenced generations; the current table is intact") {
    val base = tempBase("msink4")
    val root = s"$base/table"
    val sf = seed(base.toString)
    val s = MemoryStream[Up]
    val q = StreamingOps.runMergeSink(s.toDF(), root, sf, "doc_id",
      s"$base/ckpt")
    try {
      // three batches re-touching key 1: each rewrites the same seed
      // file, so generations 0 and 1 hold data files generation 2
      // no longer references
      Seq("v0", "v1", "v2").foreach { v =>
        s.addData(Up(1L, v, 2L, _deleted = false))
        q.processAllAvailable()
      }
    } finally q.stop()
    val before = table(root)
    assert(before(1L) == "v2")
    val dataFiles = graft.sources.Layout.listParquet(s"$root/data")
    val (files, manifests) = StreamingOps.vacuumManifests(root, keepGens = 1)
    assert(manifests == 2)
    assert(files > 0 && files < dataFiles.size,
      s"vacuum removed $files of ${dataFiles.size}")
    // the current table reads identically after the vacuum, and the
    // caller-owned seed files were never candidates
    assert(table(root) == before)
    sf.foreach(p => assert(new java.io.File(p).exists(), s"seed $p deleted"))
    // idempotent: a second vacuum finds nothing
    assert(StreamingOps.vacuumManifests(root, keepGens = 1) == ((0, 0)))
  }

  test("compaction collapses unit files in place; vacuum then retires them") {
    val base = tempBase("msink5")
    val root = s"$base/table"
    val sf = seed(base.toString)
    val s = MemoryStream[Up]
    val q = StreamingOps.runMergeSink(s.toDF(), root, sf, "doc_id",
      s"$base/ckpt")
    try {
      // three single-key batches, each minting a tiny unit file
      (0 to 2).foreach { i =>
        s.addData(Up(999100L + i, s"ins $i", 5L, _deleted = false))
        q.processAllAvailable()
      }
    } finally q.stop()
    val before = table(root)
    val nBefore = StreamingOps.currentFiles(root).get.size
    val verify = StreamingOps.compactManifest(spark, root,
      targetBytes = 1L << 30) // one group: everything merges
    assert(verify.filter(!col("rows_match")).count() == 0)
    val cur = StreamingOps.currentFiles(root).get
    assert(cur.size < nBefore, s"${cur.size} vs $nBefore files")
    assert(table(root) == before)
    // the pre-compaction units are now unreferenced; vacuum retires
    // them and the compacted table still reads identically
    val (removed, _) = StreamingOps.vacuumManifests(root, keepGens = 1)
    assert(removed > 0)
    assert(table(root) == before)
    sf.foreach(p => assert(new java.io.File(p).exists(), s"seed $p deleted"))
    // a re-compaction without an intervening batch must land in a
    // FRESH directory (never overwrite the one its inputs live in)
    // and leave the table identical
    StreamingOps.compactManifest(spark, root, targetBytes = 1L << 30)
    assert(table(root) == before)
  }

  test("generation-pinned reads resolve each historical table state") {
    val base = tempBase("msink7")
    val root = s"$base/table"
    val sf = seed(base.toString)
    val s = MemoryStream[Up]
    val q = StreamingOps.runMergeSink(s.toDF(), root, sf, "doc_id",
      s"$base/ckpt")
    try {
      Seq("v0", "v1", "v2").foreach { v =>
        s.addData(Up(1L, v, 2L, _deleted = false))
        q.processAllAvailable()
      }
    } finally q.stop()
    def textAt(gen: Long): String = {
      val files = StreamingOps.filesAt(root, gen).get
      spark.read.parquet(files: _*).filter(col("doc_id") === 1L)
        .select("text").head().getString(0)
    }
    assert(textAt(0L) == "v0")
    assert(textAt(1L) == "v1")
    assert(textAt(2L) == "v2")
    assert(textAt(Long.MaxValue) == "v2") // = current
    // a pin outside the vacuum window is gone, by contract
    StreamingOps.vacuumManifests(root, keepGens = 2)
    assert(StreamingOps.filesAt(root, 0L).isEmpty)
    assert(textAt(1L) == "v1") // inside the window: still exact
  }

  test("a second publisher on the same root loses loudly; a replay is benign") {
    val base = tempBase("msink8")
    val root = s"$base/table"
    val mine = Seq("/data/a.parquet", "/data/b.parquet")
    // writer 1 publishes generation 5
    StreamingOps.publishManifest(root, 5L, mine, replace = false)
    // a REPLAY republishes byte-identical content (canonical unit
    // names make replay bytes deterministic) — benign, no raise
    StreamingOps.publishManifest(root, 5L, mine, replace = false)
    // a SECOND WRITER with different content must lose loudly —
    // never silently last-writer-wins
    intercept[IllegalStateException] {
      StreamingOps.publishManifest(root, 5L, Seq("/data/c.parquet"),
        replace = false)
    }
    // and the winner's generation is untouched by the loser's attempt
    assert(StreamingOps.filesAt(root, 5L).get == mine)
    // no orphaned temp files from the losing attempt
    val leftovers = manifestNames(root).filterNot(_ == "gen=5")
    assert(leftovers.isEmpty, s"leftovers: ${leftovers.toSeq}")
  }

  test("vacuum keep window: pinned readers inside survive, outside fail loudly") {
    val base = tempBase("msink9")
    val root = s"$base/table"
    val sf = seed(base.toString)
    val s = MemoryStream[Up]
    val q = StreamingOps.runMergeSink(s.toDF(), root, sf, "doc_id",
      s"$base/ckpt")
    try {
      Seq("v0", "v1", "v2").foreach { v =>
        s.addData(Up(1L, v, 2L, _deleted = false))
        q.processAllAvailable()
      }
    } finally q.stop()
    StreamingOps.vacuumManifests(root, keepGens = 2)
    // inside the window: the pin resolves the exact state AND every
    // file it references is still on disk (the vacuum never deletes
    // data a kept generation needs)
    val pinned = StreamingOps.tableAt(spark, root, 1L)
    StreamingOps.filesAt(root, 1L).get.foreach(p =>
      assert(new java.io.File(p).exists(), s"kept-gen file $p deleted"))
    assert(pinned.filter(col("doc_id") === 1L)
      .select("text").head().getString(0) == "v1")
    // outside the window: a clear error, never a partial read
    val e = intercept[IllegalStateException] {
      StreamingOps.tableAt(spark, root, 0L)
    }
    assert(e.getMessage.contains("keep window"))
  }

  test("self-maintaining sink: files stay bounded, table exact, seeds intact") {
    val base = tempBase("msink10")
    val root = s"$base/table"
    val sf = seed(base.toString)
    val before = spark.read.parquet(sf: _*)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val s = MemoryStream[Up]
    // maintenance every 2 batches: compact the base into one group
    // (1 GiB target) and vacuum beyond the newest 2 generations
    val q = StreamingOps.runMergeSink(s.toDF(), root, sf, "doc_id",
      s"$base/ckpt", maintainEvery = Some((2, 1L << 30, 2)))
    try {
      (0 to 5).foreach { i =>
        s.addData(Up(999200L + i, s"ins $i", 5L, _deleted = false))
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = table(root)
    (0 to 5).foreach(i => assert(got(999200L + i) == s"ins $i"))
    val untouched = (before.keySet -- got.keySet.filter(_ >= 999200L))
    untouched.take(5).foreach(k => assert(got(k) == before(k)))
    assert(got.size == before.size + 6)
    // without maintenance the table would reference the 6 seed files
    // plus one unit per batch (≥ 12 by gen 5); the ticks keep the
    // live list compacted
    val cur = StreamingOps.currentFiles(root).get
    assert(cur.size <= 4, s"expected a compacted file list, got $cur")
    // the gen-4 tick vacuumed to {3, 4}; gen 5 published after it
    val gens = manifestNames(root)
      .filter(_.startsWith("gen=")).sorted
    assert(gens == Seq("gen=3", "gen=4", "gen=5"), s"manifests: $gens")
    // caller-owned seed files are never maintenance candidates
    sf.foreach(p => assert(new java.io.File(p).exists(), s"seed $p deleted"))
    // every file the live generations reference is on disk
    (3L to 5L).foreach(g => StreamingOps.filesAt(root, g).get
      .foreach(p => assert(new java.io.File(p).exists(), s"$p missing")))
  }

  test("deleting every key empties the table; the next batch re-seeds it") {
    val base = tempBase("msink6")
    val root = s"$base/table"
    val sf = seed(base.toString)
    val allKeys = spark.read.parquet(sf: _*)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val s = MemoryStream[Up]
    val q = StreamingOps.runMergeSink(s.toDF(), root, sf, "doc_id",
      s"$base/ckpt")
    try {
      s.addData(allKeys.map(k => Up(k, "", 0L, _deleted = true)): _*)
      q.processAllAvailable()
      assert(StreamingOps.currentFiles(root).get.isEmpty,
        "gen 0 should reference no files")
      s.addData(Up(7770L, "reborn", 6L, _deleted = false))
      q.processAllAvailable()
    } finally q.stop()
    assert(table(root) == Map(7770L -> "reborn"))
  }
}

class MergeSinkSpec extends MergeSinkBehavior(objectStore = false)

/** The same behavior with the manifest transport swapped for the
  * object-store model (LIST / GET / conditional PUT only). */
class MergeSinkObjectStoreSpec extends MergeSinkBehavior(objectStore = true)
