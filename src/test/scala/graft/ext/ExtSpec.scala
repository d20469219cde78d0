package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.ExtQueries
import graft.sources.Tables

/** LLM-pipeline operator semantics: dedup recall/precision on the
  * derived corpora, position sensitivity of fingerprints, SimHash
  * locality, cosine sanity, and the multimodal mapPartitions path
  * agreeing with the relational path.
  */
class ExtSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("exact dedup: every derived copy collapses onto its base doc") {
    val out = ExtQueries.dedupExact(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val dups = out.filter(_._2 == 2L)
    assert(out.forall(_._2 <= 2L))
    // every 7th doc was copied; all keepers of dup groups are base ids
    assert(dups.nonEmpty && dups.forall(_._1 < 100000L))
    assert(dups.forall { case (id, _) => id % 7 == 0 })
  }

  test("minhash-LSH finds the planted near-dup pairs with high recall, full precision") {
    val pairs = ExtQueries.dedupMinhashLsh(spark, sf)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val planted = pairs.filter { case (a, b, _) => b == a + 200000 }
    val nPlanted = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 11 === 0).count()
    assert(planted.length >= (nPlanted * 0.9).toInt,
      s"recall too low: ${planted.length}/$nPlanted")
    assert(pairs.forall(_._3 >= 0.5)) // precision: threshold enforced
  }

  test("native minhash near-dup pipeline equals the composed reference exactly") {
    val d = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val corpus = d.unionByName(d.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" graftmarker end")).as("text")))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs(Dedup.nearDupPairs(corpus, "doc_id", "text"))
      === pairs(Dedup.nearDupPairsComposed(corpus, "doc_id", "text")))
  }

  test("wordShingleSet array equals the exploded shingleRows set per doc") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").limit(50)
    val viaArr = docs
      .select(col("doc_id"), TextOps.wordShingleSet(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val viaRows = Dedup.shingleRows(docs, "doc_id", "text", 3)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getString(1)).toSet }
    assert(viaArr === viaRows)
  }

  test("array-intersect jaccard equals the explode+count jaccard on candidates") {
    val d = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val corpus = d.unionByName(d.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" graftmarker end")).as("text")))
    val cand = corpus.as("a").join(corpus.as("b"),
        col("a.doc_id") + 200000 === col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val sh = Dedup.shingleRows(corpus, "doc_id", "text", 3)
    val shArr = corpus.select(col("doc_id"),
      TextOps.wordShingleSet(col("text"), 3).as("sh"))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m(Dedup.jaccardOnCandidatesArr(cand, shArr, "doc_id", "sh"))
      === m(Dedup.jaccardOnCandidates(cand, sh, "doc_id")))
  }

  test("boundBlocks keeps NULL-keyed rows when their block is under the cap") {
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None),
                 (4L, None), (5L, Some("b")), (6L, Some("b")), (7L, Some("b")))
      .toDF("id", "k")
    val kept = Dedup.boundBlocks(df, Seq("k"), maxBlockSize = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    // "b" (3 members) exceeds the cap; the NULL block (2) must SURVIVE
    assert(kept === Set(1L, 2L, 3L, 4L))
    val over = Dedup.oversizeBlocks(df, Seq("k"), 2)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(over === Map(Some("b") -> 3L))
  }

  test("decontamination reports shingle overlap with the benchmark only") {
    val corpus = Seq(
      (1L, "one two three four five six seven"),      // fully contained
      (2L, "alpha beta gamma delta epsilon zeta"),    // clean
      (3L, "one two three four five unrelated tail")) // 1 shared shingle
      .toDF("doc_id", "text")
    val bench = Seq((10L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val got = Dedup.decontaminate(corpus, bench, "doc_id", "text",
        n = 5, minOverlap = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 3L -> 1L))
    // threshold trims the partial hit
    val strict = Dedup.decontaminate(corpus, bench, "doc_id", "text",
        n = 5, minOverlap = 2)
      .collect().map(r => r.getLong(0)).toSet
    assert(strict === Set(1L))
  }

  test("sequence packing: contiguous, budget-aligned, deterministic") {
    val df = Seq(
      (1L, "a " * 99 + "a", "web"),   // 100 tokens
      (2L, "b " * 49 + "b", "web"),   // 50
      (3L, "c " * 79 + "c", "web"),   // 80  -> cum_before 150, pack 0
      (4L, "d " * 59 + "d", "web"),   // 60  -> cum_before 230, pack 1
      (5L, "e " * 499 + "e", "web"),  // 500 -> cum_before 290, pack 1 (overflow)
      (6L, "f", "web"),               // 1   -> cum_before 790, pack 3
      (7L, "g " * 9 + "g", "news"))   // independent stream, pack 0
      .toDF("doc_id", "text", "source")
    val got = TextOps.seqPack(df, "doc_id", "text", "source", budgetTokens = 200)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) === (("web", 100L, 0L, 1L)))
    assert(got(2L) === (("web", 50L, 0L, 2L)))
    assert(got(3L) === (("web", 80L, 0L, 3L)))  // 150 < 200: still pack 0
    assert(got(4L) === (("web", 60L, 1L, 1L)))  // 230 // 200 = 1
    assert(got(5L) === (("web", 500L, 1L, 2L))) // joins pack 1, overflows it
    assert(got(6L) === (("web", 1L, 3L, 1L)))   // lands after the overflow
    assert(got(7L) === (("news", 10L, 0L, 1L))) // streams pack independently
    // pack ids are dense per stream only where docs actually land;
    // every pack's FIRST member starts below the next budget boundary
    got.values.groupBy(v => (v._1, v._3)).foreach { case (_, members) =>
      assert(members.exists(_._4 == 1L), "every pack has a first member")
    }
  }

  test("int8 quantization: bounded error, clamped range, zero-vector safe") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),       // all-zero: scale 0
      (3L, Array(1e-8f, -1e-8f, 1e-8f, 1e-8f)),  // tiny but nonzero
      (4L, Array(100f, -100f, 50f, 12.5f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getSeq[Int](2), r.getDouble(3)))).toMap
    // every quantized component is in [-127, 127]
    rows.values.foreach { case (_, q, _) => q.foreach(c => assert(c.abs <= 127)) }
    // reconstruction error is bounded by scale/2 (+ ulp slack)
    rows.foreach { case (id, (scale, _, err)) =>
      assert(err <= scale / 2 + 1e-12, s"vec $id err $err vs scale $scale") }
    // the max-magnitude component hits ±127 exactly (symmetric scale)
    assert(rows(1L)._2.contains(-127))
    assert(rows(4L)._2.contains(127) && rows(4L)._2.contains(-127))
    // zero vector: scale 0, all-zero q, zero error — no NaN/divide
    assert(rows(2L) === ((0.0, Seq(0, 0, 0, 0), 0.0)))
    // quantized cosine stays close to exact cosine at int8 precision
    val exact = df.filter(col("vec_id").isin(1L, 4L))
      .select(Similarity.cosine(
        Similarity.toDouble(col("embedding")),
        Similarity.toDouble(col("embedding")))).collect()
    assert(exact.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
    def dequant(id: Long): Seq[Double] =
      rows(id)._2.map(_ * rows(id)._1)
    val a = Seq(0.5, -1.0, 0.25, 0.0)
    val da = dequant(1L)
    def cos(x: Seq[Double], y: Seq[Double]) = {
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      d / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
    }
    assert(math.abs(cos(a, da) - 1.0) < 1e-3,
      "dequantized vector must stay nearly parallel to the original")
  }

  test("LSH bucket cap drops hot cliques from pairing and audits them") {
    // a 6-member clique of identical docs (one hot bucket per band)
    // plus one small near-dup pair that must keep pairing normally
    val clique = (1L to 6L).map(i => (i, "the same viral boilerplate text row"))
    val pair = Seq(
      (10L, "another distinct doc body entirely here"),
      (11L, "another distinct doc body entirely here too"))
    val df = (clique ++ pair).toDF("doc_id", "text")
    val uncapped = Dedup.nearDupPairs(df, "doc_id", "text")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((10L, 11L)))
    assert(uncapped.count { case (a, b) => a <= 6 && b <= 6 } === 15,
      "uncapped: the full 6-clique pairs quadratically")
    val capped = Dedup.nearDupPairs(df, "doc_id", "text", maxBucketSize = 4)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((10L, 11L)),
      "capped: hot-bucket pairs drop, small buckets keep full recall")
    // ...and the drop is observable, not silent
    graft.catalyst.MinHashSig.register(spark)
    val sig = df.select(col("doc_id"),
      call_function("minhash_sig", split(col("text"), " "),
        lit(3), lit(8)).as("__sig"))
    val bands = sig
      .select(col("doc_id"), col("__sig"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .select(col("doc_id"), col("band"),
        expr("concat(__sig[CAST(band * 2 AS INT)], __sig[CAST(band * 2 + 1 AS INT)])")
          .as("bkey"))
    val audited = Dedup.oversizeBuckets(bands, 4)
      .collect().map(r => r.getLong(2))
    assert(audited.length === 4 && audited.forall(_ === 6L),
      "each band must report the 6-member hot bucket")
  }

  test("native simhash16 equals the explode+aggregate composition exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val native = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = Dedup.simhashComposed(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === composed)
  }

  test("simhash of a doc with no contributing tokens is NULL, not 0") {
    // the composed explode path emits NO row for such a doc, so 0 would
    // be a value the composition can never produce; NULL marks it
    graft.catalyst.SimHash16.register(spark)
    val df = Seq((1L, Seq.empty[String]), (2L, Seq("real", "tokens")))
      .toDF("doc_id", "toks")
      .select(col("doc_id"), call_function("simhash16", col("toks")).as("fp"))
    val byId = df.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(byId(1L) === true)
    assert(byId(2L) === false)
  }

  test("simhash: a near-identical document lands within small hamming distance") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different words about spark catalyst query planning"))
      .toDF("doc_id", "text")
    val fp = Dedup.simhash(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(1L), fp(2L)) <= 4)
    assert(hamming(fp(1L), fp(3L)) > hamming(fp(1L), fp(2L)))
  }

  test("normalize is idempotent and strips to the [a-z0-9 ] alphabet") {
    val inputs = Seq("  Hello, WORLD!! 42 ", "a\tb", "ALL CAPS.", "", "###",
      "mixed   Spaces  and-dashes_under")
    val df = inputs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val once = df.select(col("id"), TextOps.normalize(col("s")).as("n1"))
    val twice = once.select(col("id"), col("n1"),
      TextOps.normalize(col("n1")).as("n2"))
    val rows = twice.collect().map(r => (r.getString(1), r.getString(2)))
    assert(rows.forall { case (a, b) => a == b }, "normalize must be idempotent")
    assert(rows.forall(_._1.matches("[a-z0-9 ]*")))
    assert(rows.forall(r => !r._1.startsWith(" ") && !r._1.endsWith(" ")
      && !r._1.contains("  ")))
  }

  test("token stats computes counts and exact average token length") {
    val df = Seq((1L, "aa bbb cccc")).toDF("doc_id", "text")
    val r = TextOps.tokenStats(df, "doc_id", "text").collect()(0)
    assert(r.getInt(1) === 3)           // n_tokens
    assert(r.getInt(2) === 3)           // distinct
    assert(r.getInt(3) === 11)          // n_chars
    assert(r.getDouble(4) === 3.0)      // (11 - 2) / 3
  }

  test("splitAssign: deterministic, exhaustive, stable under corpus growth") {
    val base = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    val a = Sampling.splitAssign(base, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Sampling.splitAssign(base, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a === b, "same ids must always get the same split")
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(a.values.count(_ == "train") > a.size * 0.9)
    // stability: a doc's split is id-local — removing half the corpus
    // must not move anyone (the property rand()-splits lack)
    val half = Sampling.splitAssign(base.filter(col("doc_id") % 2 === 0), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(half.forall { case (id, s) => a(id) == s })
  }

  test("domainMix: targeted sources downsample, 0.0 drops all, others keep all") {
    val d = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "source")
    val kept = ExtQueries.domainMix(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val keptBySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    val totalBySrc = d.collect().map(r => r.getString(1))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(!keptBySrc.contains("src2"), "p=0.0 must drop every doc")
    assert(keptBySrc("src0") < totalBySrc("src0"), "p=0.5 must drop some")
    assert(keptBySrc("src1") < keptBySrc("src0"), "p=0.2 keeps fewer than p=0.5")
    for (s <- totalBySrc.keySet -- ExtQueries.mixTargets.keySet)
      assert(keptBySrc(s) === totalBySrc(s), s"untargeted $s must keep all")
  }

  test("repetitionStats: hand-computed duplicate fractions") {
    val df = Seq(
      (1L, "a a b"),          // dup tokens: 1/3; 2-grams [a a, a b] distinct
      (2L, "x y x y x"),      // dup tokens: 3/5; 2-grams [x y, y x, x y, y x] -> 2/4
      (3L, "one"))            // single token: no 2-grams, zero fractions
      .toDF("doc_id", "text")
    val got = TextOps.repetitionStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getInt(3), r.getDouble(4)))).toMap
    assert(got(1L) === ((3, 1.0 / 3, 2, 0.0)))
    assert(got(2L) === ((5, 3.0 / 5, 4, 0.5)))
    assert(got(3L) === ((1, 0.0, 0, 0.0)))
  }

  test("gopherQuality: each rule flag trips independently; pass is the conjunction") {
    val longDoc = ("the of and " + Seq.fill(30)("data").mkString(" "))
    val df = Seq(
      (1L, longDoc),                                  // passes everything
      (2L, "the of tiny"),                            // fails token floor
      (3L, ("the of " + Seq.fill(31)("a").mkString(" "))),   // mean word len < 3
      (4L, ("the of " + Seq.fill(31)("12345").mkString(" "))), // alpha frac low
      (5L, Seq.fill(33)("word").mkString(" ")))       // no stopword hits
      .toDF("doc_id", "text")
    val got = TextOps.gopherQuality(df, "doc_id", "text", minTokens = 30)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8),
          r.getBoolean(9)))).toMap
    assert(got(1L) === ((true, true, true, true, true)))
    assert(got(2L)._1 === false && got(2L)._5 === false)
    assert(got(3L)._2 === false && got(3L)._5 === false)
    assert(got(4L)._3 === false && got(4L)._5 === false)
    assert(got(5L)._4 === false && got(5L)._5 === false)
  }

  test("boundBlocks drops a skewed block from pairing but keeps small blocks") {
    // one hot block ("web", 100) with 6 members, one small block with 2
    val rows = (1L to 6L).map(id => (id, s"doc $id", "web", 100)) ++
      Seq((7L, "pair a", "books", 50), (8L, "pair b", "books", 50))
    val df = rows.toDF("doc_id", "text", "source", "n_chars")
    val bounded = Dedup.boundBlocks(df, Seq("source", "n_chars"), maxBlockSize = 4)
    assert(bounded.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(7L, 8L), "hot block must be dropped, small block kept")
    val over = Dedup.oversizeBlocks(df, Seq("source", "n_chars"), 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(over.toSeq === Seq(("web", 100, 6L)), "dropped block must be reported")
    // a cap above the largest block is a no-op (the oracle-safety property)
    assert(Dedup.boundBlocks(df, Seq("source", "n_chars"), 1024).count() === 8)
  }

  test("fingerprint is position-sensitive (rolling, not bag-of-words)") {
    val df = Seq((1L, "alpha beta"), (2L, "beta alpha")).toDF("doc_id", "text")
    val fp = TextOps.fingerprint(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) !== fp(2L))
  }

  test("cosine of a vector with itself is 1; orthogonal vectors score 0") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 2.0f)), (3L, Seq(3.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteTopK(df.filter(col("vec_id") === 1),
        df.filter(col("vec_id") > 1), "vec_id", "embedding", 2)
      .orderBy("rank").collect()
    assert(top(0).getLong(1) === 3L)  // parallel vector first
    assert(math.abs(top(0).getDouble(3) - 1.0) < 1e-12)
    assert(math.abs(top(1).getDouble(3)) < 1e-12)
  }

  test("ANN top-k: an identical vector is always retrieved at rank 1 with cosine ~1") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val copies = e.filter(col("vec_id") % 13 === 0)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val ann = Similarity.annTopK(copies, e, "vec_id", "embedding",
        k = 1, numPlanes = 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    val expected = copies.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ann.map(_._1).toSet === expected, "every query must find a neighbor")
    assert(ann.forall { case (q, n, c) => n == q - 10000 && c > 0.999999 })
  }

  test("numPlanes scales with corpus size: 20+ planes still give full identical-vector recall") {
    // the sizing rule itself: 10^9 vectors / 10^3-per-bucket → 20 planes
    assert(Similarity.suggestedNumPlanes(1000000000L, 1000L) === 20)
    assert(Similarity.suggestedNumPlanes(100L, 1000L) === 1)   // tiny corpus → floor
    assert(Similarity.suggestedNumPlanes(Long.MaxValue, 1L) === 62) // Long-bucket cap
    // identical vectors share a bucket at ANY plane count, so recall
    // stays full as numPlanes grows — the knob is safe to scale up
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val copies = e.filter(col("vec_id") % 13 === 0)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val ann = Similarity.annTopK(copies, e, "vec_id", "embedding",
        k = 1, numPlanes = 20, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val expected = copies.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ann.map(_._1).toSet === expected)
    assert(ann.forall { case (q, n, c) => n == q - 10000 && c > 0.999999 })
  }

  test("multi-probe ANN recall >= single-probe recall against the brute-force truth") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 20)
    val c = e.filter(col("vec_id") >= 20)
    def top1(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.filter(col("rank") === 1).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = top1(Similarity.bruteTopK(q, c, "vec_id", "embedding", 1))
    val single = top1(Similarity.annTopK(q, c, "vec_id", "embedding", 1, 8, 64))
    val multi = top1(Similarity.annTopKMultiProbe(q, c, "vec_id", "embedding", 1, 8, 64))
    def recall(ann: Map[Long, Long]): Double =
      truth.count { case (k, v) => ann.get(k).contains(v) }.toDouble / truth.size
    assert(recall(multi) >= recall(single))
    // multi-probe candidates are a superset, so every single-probe
    // query that answered still answers
    assert(single.keySet.subsetOf(multi.keySet))
  }

  test("connected components: chains, cycles and isolated pairs label by min id") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L),
      (22L, 20L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(edges, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("dedup clusters are transitive: both near-copy families join the base's cluster") {
    val clusters = ExtQueries.dedupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val planted = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 11 === 0).select("doc_id")
      .collect().map(_.getLong(0))
    // every planted base is its cluster's keeper with BOTH variants in
    // (size >= 3) — a pair-only view would report two separate pairs
    val covered = planted.filter(id => clusters.getOrElse(id, 0L) >= 3L)
    assert(covered.length >= (planted.length * 0.9).toInt,
      s"transitive clusters too rare: ${covered.length}/${planted.length}")
    // no variant id ever shows up as a keeper (min-id policy)
    assert(clusters.keys.forall(_ < 200000L))
  }

  test("tf-idf ranks rarity-weighted counts; ratio idf keeps exact arithmetic") {
    val d = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextOps.tfidfTopTerms(d, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getInt(5))).toSet
    // N=2; df: a=2, b=1, c=1; score = tf*(N+1)/(df+1)
    assert(got === Set(
      (1L, "a", 2L, 2L, 2.0, 1), (1L, "b", 1L, 1L, 1.5, 2),
      (2L, "c", 1L, 1L, 1.5, 1), (2L, "a", 1L, 2L, 1.0, 2)))
  }

  test("stratified sample: exactly n per stratum, unaffected by other strata") {
    val d = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "source")
    val all = Sampling.stratifiedSample(d, "doc_id", "source", 3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val perSource = all.groupBy(_._2).view.mapValues(_.length).toMap
    assert(perSource.values.forall(_ == 3))
    // isolation: sampling one stratum alone returns the same members
    val src = all.head._2
    val alone = Sampling.stratifiedSample(
        d.filter(col("source") === src), "doc_id", "source", 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(alone === all.filter(_._2 == src).toSet)
  }

  test("redact scrubs emails, urls, and long digit runs, leaves short numbers") {
    val d = Seq((1L, "mail bob.x@corp.io or https://a.b/c?d=9999 pin 123 card 12345678"))
      .toDF("id", "text")
    val out = d.select(TextOps.redact(col("text"))).collect().head.getString(0)
    assert(out === "mail <EMAIL> or <URL> pin 123 card <NUM>")
  }

  test("IVF with every cell probed equals the exact brute-force top-k") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 10)
    val c = e.filter(col("vec_id") >= 10)
    val cents = c.filter(col("vec_id") % 17 === 0)
    val nCells = cents.count().toInt
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // nprobe = K means no cell is pruned, so IVF must return exactly
    // the exact-baseline answer (cosine ties broken identically)
    assert(rows(Similarity.ivfTopK(q, c, cents, "vec_id", "embedding", 3, nCells))
      === rows(Similarity.bruteTopK(q, c, "vec_id", "embedding", 3)))
  }

  test("IVF probing fewer cells returns a subset of per-query candidates, never junk") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 10)
    val c = e.filter(col("vec_id") >= 10)
    val cents = c.filter(col("vec_id") % 17 === 0)
    val ivf = Similarity.ivfTopK(q, c, cents, "vec_id", "embedding", 3, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // every query still gets rows, ranks are dense from 1, scores sane
    assert(ivf.map(_._1).distinct.length == 10)
    assert(ivf.forall { case (_, _, cos) => cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9 })
  }

  test("bpe pretokenizer: contractions, digit runs, punctuation split as pinned") {
    val df = Seq((1L, "it's doc-17 v1.2, ok!")).toDF("id", "text")
    val toks = df.select(TextOps.bpePretokens(col("text")).as("pt"))
      .collect().head.getSeq[String](0)
    assert(toks === Seq("it", "'s", " doc", "-", "17", " v", "1", ".", "2",
      ",", " ok", "!"))
    val stats = TextOps.bpeTokenStats(df, "id", "text").collect().head
    assert(stats.getInt(1) === 4)                 // whitespace tokens
    assert(stats.getInt(2) === 12)                // pretokens
    assert(stats.getInt(3) === 12)                // all distinct here
    assert(math.abs(stats.getDouble(4) - 21.0 / 12) < 1e-12)
  }

  test("embedding LSH: identical vectors always share a bucket -> full recall") {
    val pairs = ExtQueries.embedNearDup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 13 === 0).select("vec_id")
      .collect().map(_.getLong(0)).map(id => (id, id + 10000)).toSet
    assert(planted.subsetOf(pairs))
  }

  test("training pipeline drops exact copies, near copies, and low-quality docs") {
    val out = ExtQueries.trainingPrep(spark, sf)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // every exact copy (+100000) lost to its base at stage 1
    assert(!out.keys.exists(id => id >= 100000 && id < 200000))
    // near copies (+200000) lost to LSH near-dup removal at stage 2
    assert(!out.keys.exists(_ >= 200000))
    // survivors all pass the quality gate
    assert(out.values.forall(_ >= 0.25))
    assert(out.nonEmpty)
  }

  test("typed CentroidAggregator matches the relational decimal centroid to 1e-7") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val centroidUdaf = udaf(new CentroidAggregator(64),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    val typed = e.groupBy("label").agg(centroidUdaf(col("embedding")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val relational = ExtQueries.centroid(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(typed.keySet === relational.keySet)
    // the relational path truncates each element to 8 decimal places
    // (DECIMAL(18,8)) before summing, so the two differ by up to ~n·5e-9
    for (k <- typed.keySet; (a, b) <- typed(k).zip(relational(k)))
      assert(math.abs(a - b) < 1e-7, s"label $k diverged: $a vs $b")
  }

  test("multimodal: mapPartitions decode stub agrees with the relational path") {
    implicit val s = spark
    val media = Seq(
      Multimodal.MediaRow(1L, "image", "hello world".getBytes("UTF-8")),
      Multimodal.MediaRow(2L, "audio", Array[Byte](0x10, 0x7f, 0x33)),
      Multimodal.MediaRow(3L, "video", Array.empty[Byte])).toDS()
    val typed = Multimodal.extractFeatures(media)
      .select("media_id", "n_bytes", "first_byte", "checksum")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    val relational = Multimodal.featureColumns(
        media.toDF().withColumnRenamed("payload", "p"), "media_id", "p")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2).toInt, r.getLong(3))).toSet
    assert(typed === relational)
  }

  test("magic-byte sniffing identifies containers in both typed and column forms") {
    val png = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a).map(_.toByte)
    val jpg = Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)
    val wav = "RIFF1234WAVE".getBytes("US-ASCII")
    val txt = "hello".getBytes("US-ASCII")
    assert(Multimodal.sniffKind(png) === "image/png")
    assert(Multimodal.sniffKind(jpg) === "image/jpeg")
    assert(Multimodal.sniffKind(wav) === "audio/wav")
    assert(Multimodal.sniffKind(txt) === "unknown")
    val viaCol = Seq((1L, png), (2L, jpg), (3L, wav), (4L, txt))
      .toDF("id", "p")
      .select(col("id"), Multimodal.sniffKindCol(col("p")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaCol === Map(1L -> "image/png", 2L -> "image/jpeg",
      3L -> "audio/wav", 4L -> "unknown"))
  }

  test("frame sample takes every k-th byte preserving order") {
    val payload = (0 until 100).map(_.toByte).toArray
    val sampled = Multimodal.frameSample(payload, 16)
    assert(sampled.toSeq === Seq(0, 16, 32, 48, 64, 80, 96).map(_.toByte))
  }

  test("simhash pairs: byte bands recall exactly the hamming<=1 pairs (brute check)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val fps = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val brute = (for {
      (ida, sa) <- fps; (idb, sb) <- fps if ida < idb
      if java.lang.Long.bitCount(sa ^ sb) <= 1
    } yield (ida, idb)).toSet
    val got = Dedup.simhashPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute) // pigeonhole: full recall, and nothing extra
  }

  test("edit-distance pairs: identical prefix blocks pair, distance is exact") {
    val d = Seq(
      (1L, "the quick brown fox jumps", "en"),
      (2L, "the quick brown fox jumped", "en"),   // same blk, dist 2 (s -> ed)
      (3L, "the quick brown cat sits", "en"),     // same blk, moderate dist
      (4L, "the quick brown fox jumps", "de"),    // same prefix, other lang
      (5L, "a totally different text here", "en") // other block
    ).toDF("doc_id", "text", "lang")
    val pairs = Dedup.editDistancePairs(d, "doc_id", "text", "lang",
        prefixLen = 8, compareLen = 120, maxDist = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs((1L, 2L)) === 2L)
    // blocking is exact: cross-lang and cross-prefix docs never pair
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L || b == 5L })
  }

  test("hll distinct: estimate within tolerance at both p=8 and p=12") {
    val hv = (1 to 20000)
      .map(i => s"val$i").toDF("s")
      .select(TextOps.hex15(col("s")).as("hv"))
    // theoretical std error ~1.04/sqrt(m): ~6.5% at p=8, ~1.6% at
    // p=12 — assert ~2 sigma, and that the knob actually tightens
    val est8 = Sketches.hllDistinct(hv, "hv", p = 8).collect().head
    val est12 = Sketches.hllDistinct(hv, "hv", p = 12).collect().head
    assert(est8.getLong(1) === 20000L && est12.getLong(1) === 20000L)
    val err8 = math.abs(est8.getDouble(0) - 20000.0) / 20000.0
    val err12 = math.abs(est12.getDouble(0) - 20000.0) / 20000.0
    assert(err8 < 0.13, s"p=8 error $err8")
    assert(err12 < 0.033, s"p=12 error $err12")
    assert(err12 < err8, s"p=12 ($err12) should beat p=8 ($err8) here")
  }

  test("hll distinct: precision bounds are enforced") {
    val hv = Seq("a").toDF("s").select(TextOps.hex15(col("s")).as("hv"))
    intercept[IllegalArgumentException](Sketches.hllDistinct(hv, "hv", p = 6))
    intercept[IllegalArgumentException](Sketches.hllDistinct(hv, "hv", p = 15))
  }

  test("frameColumns matches the typed frameSample path per row") {
    val rows = Seq((1L, "hello world, a payload"), (2L, "x"), (3L, ""))
    val df = rows.toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val got = Multimodal.frameColumns(df, "doc_id", "payload", k = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.foreach { case (id, s) =>
      val sampled = Multimodal.frameSample(s.getBytes("UTF-8"), 4)
      val checksum =
        if (sampled.isEmpty) 0L
        else sampled.map(b => (b & 0xff).toLong).sum % 1000003L
      assert(got(id) === ((sampled.length.toLong, checksum)), s"doc $id")
    }
  }

  test("count-min: exact on a collision-free probe set, never an undercount") {
    val df = (1 to 10).flatMap(k => Seq.fill(k)(s"key$k")).toDF("k")
    val sketch = Sketches.countMinBuild(df, "k")
    assert(sketch.count() <= 4L * 256L)
    val probes = (1 to 10).map(k => s"key$k").toDF("k")
    val est = Sketches.countMinEstimate(sketch, probes, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // d=4 independent rows: an overcount needs a collision in EVERY
    // row; with 10 keys × 256 buckets the fixed md5 layout has none,
    // so estimates are exact here — and can never be below truth.
    (1 to 10).foreach(k => assert(est(s"key$k") === k.toLong))
  }

  test("hll distinct: duplicated input leaves registers (and estimate) unchanged") {
    val base = (1 to 500).map(i => s"v$i").toDF("s")
      .select(TextOps.hex15(col("s")).as("hv"))
    for (p <- Seq(8, 12)) {
      val est1 = Sketches.hllDistinct(base, "hv", p).collect().head.getDouble(0)
      val est3 = Sketches.hllDistinct(base.union(base).union(base), "hv", p)
        .collect().head.getDouble(0)
      assert(est1 === est3, s"p=$p")
    }
  }

  test("bottom-k quantile sketch: invariant under partitioning") {
    val rows = (0 until 2000).map(i => (i.toLong, ((i * 7919) % 1000).toDouble))
    val df = rows.toDF("id", "v")
    val a = Sketches.bottomKQuantiles(df.repartition(1), "id", "v", k = 128)
      .collect().head
    val b = Sketches.bottomKQuantiles(df.repartition(13), "id", "v", k = 128)
      .collect().head
    assert(a === b) // the hash domain, not the layout, fixes the sample
  }

  test("bottom-k quantile sketch: n <= k degrades to exact quantiles") {
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val row = Sketches.bottomKQuantiles(df, "id", "v", k = 256,
      qs = Seq(0.5)).collect().head
    assert(row.getLong(0) === 100L)                  // whole input sampled
    assert(row.getDouble(1) === 50.5)                // exact interpolated median
  }

  test("bottom-k quantile sketch: estimates bracket truth on a large uniform stream") {
    val df = (0 until 20000).map(i => (i.toLong, (i % 10000).toDouble))
      .toDF("id", "v")
    val row = Sketches.bottomKQuantiles(df, "id", "v", k = 256,
      qs = Seq(0.25, 0.5, 0.75)).collect().head
    // ±O(1/sqrt(k)) rank error: k=256 -> ~6.25% sigma; allow 4 sigma
    val (q25, q50, q75) = (row.getDouble(1), row.getDouble(2), row.getDouble(3))
    assert(math.abs(q25 - 2500) < 2500, s"q25=$q25")
    assert(math.abs(q50 - 5000) < 2500, s"q50=$q50")
    assert(math.abs(q75 - 7500) < 2500, s"q75=$q75")
    assert(q25 <= q50 && q50 <= q75)
  }

  test("vocab coverage: hand-built corpus scores covered-occurrence fractions") {
    val df = Seq(
      (1L, "a a b c"),   // freq: a high everywhere
      (2L, "a b b z"),
      (3L, "q r s t")    // all rare
    ).toDF("doc_id", "text")
    // corpus freq: a=3 b=3 c=1 z=1 q=1 r=1 s=1 t=1; top-2 (count desc,
    // token asc through the a/b tie) = {a, b}
    val got = TextOps.vocabCoverage(df, "doc_id", "text", topR = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got(1L) === ((4L, 3L, 0.75)))
    assert(got(2L) === ((4L, 3L, 0.75)))
    assert(got(3L) === ((4L, 0L, 0.0)))
  }

  test("cluster representatives: highest quality wins, ties to smallest id") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("id", "component")
    val quality = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 4L), (9L, 4L))
      .toDF("doc_id", "q")
    val got = Dedup.clusterRepresentatives(labels, quality, "doc_id", "q")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got(1L) === ((2L, 9L, 3L))) // 2 and 3 tie on q=9 -> min id 2
    assert(got(7L) === ((7L, 4L, 2L))) // 7 and 9 tie on q=4 -> min id 7
  }

  test("cluster reps gate: planted 3-cliques elect the longer +200000 clone") {
    val reps = ExtQueries.clusterReps(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    // wherever the full planted clique formed (size 3), both clones
    // carry two extra marker tokens; the +200000 clone has the
    // smaller id of the two and must be the representative
    val cliques = reps.filter(_._2._2 == 3L)
    assert(cliques.nonEmpty)
    cliques.foreach { case (cluster, (rep, _)) =>
      assert(rep === cluster + 200000L, s"cluster $cluster")
    }
  }

  test("pmi collocations: hand-computed lift on a two-token stream") {
    // "x y x y x y": bigrams xy=3 yx=2 (Nb=5), unigrams x=3 y=3 (Nu=6)
    val df = Seq("x y x y x y").toDF("text")
    val got = TextOps.pmiCollocations(df, "text", minCount = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.length === 2)
    assert(got(0) === (("x", "y", 3L, 3d * 6 * 6 / 5 / 3 / 3)))
    assert(got(1) === (("y", "x", 2L, 2d * 6 * 6 / 5 / 3 / 3)))
  }

  test("pmi collocations: minCount floors rare bigrams out of the ranking") {
    val df = Seq.fill(5)("a b").toDF("text")
      .union(Seq("c d").toDF("text"))
    val got = TextOps.pmiCollocations(df, "text", minCount = 5, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got === Array(("a", "b"))) // c-d appears once, floored
  }

  test("dup ngram spans: shared runs flagged, unique docs score zero") {
    val df = Seq(
      (1L, "a b c d e f g h"),       // shares grams @pos 1,2 with doc 2
      (2L, "x a b c d e f y"),       // the same grams land @pos 2,3
      (3L, "p q r s t u v w")        // fully unique
    ).toDF("doc_id", "text")
    val got = TextOps.dupNgramSpans(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))).toMap
    assert(got(1L) === ((4L, 2L, 0.5, 2L))) // "a b c d e","b c d e f"
    assert(got(2L) === ((4L, 2L, 0.5, 2L)))
    assert(got(3L) === ((4L, 0L, 0.0, 0L)))
  }

  test("dup ngram spans: non-adjacent duplicates break the run") {
    // doc 1 shares its FIRST and LAST gram with docs 2/3 but not the
    // middle ones -> two singleton islands, max run 1
    val df = Seq(
      (1L, "a b c d e z z z v w x y k"),
      (2L, "a b c d e q q q q"),
      (3L, "m v w x y k")
    ).toDF("doc_id", "text")
    val got = TextOps.dupNgramSpans(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    assert(got(1L) === ((2L, 1L)))
  }

  test("source divergence: hand-computed TV; single source scores zero") {
    val df = Seq(("s1", "a a b"), ("s2", "a b b b")).toDF("source", "text")
    val got = TextOps.sourceDivergence(df, "source", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // p1=(2/3,1/3), p=(3/7,4/7): TV = 5/21, via the 10/2/3/7 chain
    // p2=(1/4,3/4): TV = 5/28, via the 10/2/4/7 chain
    assert(got("s1") === ((3L, 10.0 / 2.0 / 3.0 / 7.0)))
    assert(got("s2") === ((4L, 10.0 / 2.0 / 4.0 / 7.0)))
    val solo = TextOps.sourceDivergence(
      Seq(("only", "a b c a")).toDF("source", "text"), "source", "text")
      .collect()
    assert(solo.length === 1 && solo.head.getDouble(2) === 0.0)
  }

  test("source divergence: disjoint vocabularies approach full divergence") {
    val df = Seq(("s1", "a a a a"), ("s2", "b b b b")).toDF("source", "text")
    val got = TextOps.sourceDivergence(df, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // each source: present |4*8-4*4|=16, absent (8-4)*4=16 -> 32/2/4/8
    assert(got("s1") === 0.5 && got("s2") === 0.5)
  }

  test("chunkDocs: stride covers the doc, tail chunk shortens, no degenerate tail") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextOps.chunkDocs(df, "doc_id", "text", chunkSize = 8, overlap = 2)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq === Seq(
      (0L, 1L, 8L, (1 to 8).map(i => s"t$i").mkString(" ")),
      (1L, 7L, 4L, (7 to 10).map(i => s"t$i").mkString(" "))))
    // n=8 with the same knobs: start 7 would add no new token -> one chunk
    val exact = TextOps.chunkDocs(
      Seq((1L, (1 to 8).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text"),
      "doc_id", "text", chunkSize = 8, overlap = 2).collect()
    assert(exact.length === 1)
  }

  test("chunkDocs: dropping each chunk's overlap prefix reconstructs the corpus") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val chunks = TextOps.chunkDocs(docs, "doc_id", "text", 64, 8)
      .collect().groupBy(_.getLong(0))
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, text) =>
      val ordered = chunks(id).sortBy(_.getLong(1))
      val rebuilt = ordered.zipWithIndex.map { case (r, i) =>
        val toks = r.getString(4).split(" ")
        (if (i == 0) toks else toks.drop(8)).mkString(" ")
      }.filter(_.nonEmpty).mkString(" ")
      assert(rebuilt === text, s"doc $id")
    }
  }

  test("minhashAccuracy: identical docs agree on all components; counts are exact") {
    val df = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),          // identical to 1
      (3L, "a b c d e f g h extra tok") // near-dup of 1 (2 tokens appended)
    ).toDF("doc_id", "text")
    val got = Dedup.minhashAccuracy(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    val (nm, inter, uni, est, jac) = got((1L, 2L))
    assert(nm === 8L && est === 1.0 && jac === 1.0 && inter === uni)
    // 1 vs 3: shingle sets are 6 vs 8 with all 6 shared
    got.get((1L, 3L)).foreach { case (_, i3, u3, _, j3) =>
      assert(i3 === 6L && u3 === 8L && j3 === 6.0 / 8.0)
    }
    // estimator sanity on the gate corpus: every planted near-dup
    // candidate agrees on most components (est tracks jaccard >= 0.9)
    val gate = ExtQueries.minhashAcc(spark, sf).collect()
    assert(gate.nonEmpty)
    val planted = gate.filter(r => r.getLong(1) === r.getLong(0) + 200000)
    assert(planted.nonEmpty && planted.forall(_.getLong(2) >= 5L))
  }

  test("incremental near-dups: batch matches the index, never the index itself") {
    val index = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "pack my box with five dozen liquor jugs right now"),
      // 3 and 4 are near-dups of EACH OTHER inside the index — an
      // incremental check must NOT re-pair the corpus against itself
      (3L, "spark engines shuffle data across the cluster at scale"),
      (4L, "spark engines shuffle data across the cluster at speed")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (101L, "the quick brown fox jumps over the lazy dog today ok"), // ~doc 1
      (102L, "completely unrelated fresh content nothing shared here at all")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalNearDups(index, incoming, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((101L, 1L)))
    // gate shape: clones match their base, reversed docs match nothing
    val gate = ExtQueries.incrDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gate.nonEmpty)
    assert(gate.forall { case (n, _) => n < 700000L },
      "token-reversed batch docs must not near-dup anything")
    assert(gate.count { case (n, i) => n === i + 600000 } >= gate.length / 2)
  }

  test("cluster-aware split: clusters move as a unit, singletons keep splitAssign fate") {
    val gate = ExtQueries.leakageSplit(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    // every cluster resolves to exactly one split
    gate.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.map(_._3).distinct.length === 1,
        s"cluster $comp straddles splits")
    }
    // planted pairs share a component (so a split) — and the naive
    // id-hash split WOULD have separated at least one such pair at
    // some sf; verify the clustering actually rewired those docs
    val byId = gate.map(t => t._1 -> t._2).toMap
    val planted = gate.filter(t => byId.contains(t._1 + 200000))
    assert(planted.nonEmpty)
    planted.foreach { case (id, comp, _) =>
      assert(byId(id + 200000) === comp, s"pair ($id, ${id + 200000}) split apart")
    }
    // singletons: component == own id, bucket identical to splitAssign
    val naive = Sampling.splitAssign(
      gate.map(_._1).toSeq.toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    gate.filter(t => t._1 === t._2).foreach { case (id, _, split) =>
      assert(naive(id) === split, s"singleton $id diverged from splitAssign")
    }
  }

  test("cluster-aware split: a cluster the id-hash would split stays together") {
    // ids 12 and 13 hash to different splitAssign buckets regions is
    // not guaranteed; instead force the CASE: hand edges joining two
    // docs whose naive splits differ for THIS hash domain. Find such
    // a pair deterministically among 0..999.
    val naive = Sampling.splitAssign(
      spark.range(0, 1000).select(col("id").as("doc_id")), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val cross = (0L until 999L).find(i => naive(i) != naive(i + 1))
    assert(cross.nonEmpty, "hash split has no boundary in 0..999?")
    val (a, b) = (cross.get, cross.get + 1)
    val docs = spark.range(0, 1000).select(col("id").as("doc_id"))
    val labels = Seq((a, a), (b, a)).toDF("doc_id", "component")
    val got = Sampling.clusterAwareSplit(docs, labels, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got(a) === got(b), "edge (a,b) must co-locate the pair")
    // everyone else untouched
    (0L until 1000L).filterNot(i => i == a || i == b).foreach { i =>
      assert(got(i) === naive(i), s"unrelated doc $i reshuffled")
    }
  }

  test("chunk-pack composition: budget bounds pack mass, doc chunks stay ordered") {
    val out = ExtQueries.chunkPack(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // chunks are <= 64 tokens, so a 256-budget pack never exceeds
    // 256 + 63 even with the first-fit overflow item
    out.groupBy(t => (t._2, t._4)).foreach { case ((src, pack), members) =>
      assert(members.map(_._3).sum <= 256 + 63, s"pack ($src, $pack) overfull")
      // pack_pos order = chunk_uid order (doc-major, chunk-minor)
      val byPos = members.sortBy(_._5).map(_._1)
      assert(byPos === byPos.sorted, s"pack ($src, $pack) out of order")
    }
  }

  test("ann recall audit: multiprobe never loses to single-probe; counts are consistent") {
    val got = ExtQueries.annRecall(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.length === 20)
    got.foreach { case (qid, nExact, nAnn, nHit, nAnnMp, nHitMp) =>
      assert(nExact === 3L, s"query $qid")
      assert(nHit <= math.min(nExact, nAnn), s"query $qid hit bound")
      assert(nHitMp <= math.min(nExact, nAnnMp), s"query $qid mp hit bound")
      // Hamming-1 probing strictly widens the candidate set, so the
      // approximate top-3 can only get closer to the exact top-3
      assert(nAnnMp >= nAnn && nHitMp >= nHit, s"query $qid mp regressed")
    }
    // the audit must be non-vacuous in both directions at this sf:
    // some queries hit, and the single-probe path misses something
    assert(got.map(_._4).sum > 0, "no hits at all")
    assert(got.exists(t => t._6 > t._4) || got.exists(t => t._4 < t._2),
      "audit shows no approximation gap to measure")
  }

  test("pack stats: every non-final pack is full; fills bounded by budget + max chunk") {
    val got = ExtQueries.packStats(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.nonEmpty)
    got.foreach { case (src, nPacks, nChunks, nTokens, _, maxFill, minFill) =>
      assert(maxFill <= 256 + 63, s"source $src overfull pack")
      assert(minFill >= 1 && nChunks >= nPacks && nTokens >= nChunks, src)
    }
    // per-pack invariant against the chunk-pack output it audits:
    // a non-final pack's fill is at least budget - (maxChunk - 1) —
    // its first chunk can start up to 63 tokens past the boundary
    // (previous pack's overflow), never more
    val packed = ExtQueries.chunkPack(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(2)))
    packed.groupBy(_._1).foreach { case (src, rows) =>
      val fills = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum)
      val lastPack = fills.keys.max
      fills.foreach { case (pack, fill) =>
        if (pack != lastPack)
          assert(fill >= 256 - 63, s"source $src pack $pack underfull: $fill")
      }
    }
    // totals agree with the audit's aggregates
    assert(got.map(_._3).sum === packed.length.toLong)
    assert(got.map(_._4).sum === packed.map(_._3).sum)
  }

  test("quality route: decision agrees with its three source signals row by row") {
    val route = ExtQueries.qualityRoute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5), r.getString(6)))
    assert(route.nonEmpty)
    val counts = route.groupBy(_._6).view.mapValues(_.length).toMap
    route.foreach { case (id, langOk, n, bits, gopher, r) =>
      val expected =
        if (!gopher) "drop"
        else if (!langOk || bits * 5 > n * 26) "review"
        else "keep"
      assert(r === expected, s"doc $id routed $r, expected $expected")
    }
    // the fixture corpus must exercise at least keep and review (the
    // thresholds were picked against the measured signal ranges)
    assert(counts.contains("keep") && counts.contains("review"), counts)
  }

  test("pq: seeds self-encode at zero residual; adc matches a scala re-derivation") {
    // operator-level invariant (raw-seed codebook): a codebook row's
    // own subvector is its centroid, so seeds self-encode residual 0
    val rawCands = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= 20).select("vec_id", "embedding")
    val rawSeeds = rawCands.filter(col("vec_id") < 36)
    val selfEnc = Similarity.pqEncode(rawSeeds, rawSeeds,
      "vec_id", "embedding", numSub = 8, subDim = 8).collect()
    assert(selfEnc.length == 16 * 8)
    selfEnc.foreach(r => assert(r.getDouble(3) === 0.0,
      s"seed ${r.getLong(0)} sub ${r.getLong(1)}"))

    // gate config (TRAINED 256x16x4 codebook): shape + ADC equals an
    // independent double re-derivation from raw floats against the
    // collected trained codebook
    val enc = ExtQueries.pqCodes(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
    val byVec = enc.toMap
    assert(enc.nonEmpty && enc.forall { case (_, (c, d)) => c >= 0 && c < 256 && d >= 0.0 })
    // every vector has exactly 16 subspace rows
    assert(enc.groupBy(_._1._1).forall(_._2.length == 16))

    val emb = Tables.embeddings(spark, sf)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val cb = KMeans.codebook(
      KMeans.fit(rawCands, "vec_id", "embedding",
        k = 256, numSub = 16, subDim = 4, iters = 4))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double], m: Int): Double = {
      var s = 0.0; var i = m * 4
      while (i < m * 4 + 4) { val t = a(i) - b(i); s += t * t; i += 1 }; s
    }
    val got = ExtQueries.pqTopKQ(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case (q, n, rank, adc) =>
      assert(rank >= 1 && rank <= 3)
      val expected = (0 until 16).map { m =>
        val code = byVec((n, m.toLong))._1
        d2(emb(q), cb(code), m)
      }.foldLeft(0.0)(_ + _)
      assert(adc === expected, s"adc mismatch for ($q,$n)")
    }

    // recall audit: both sides rank 3 deep; hits bounded by both
    val rec = ExtQueries.pqRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rec.length === 20)
    rec.foreach { case (q, ne, na, nh) =>
      assert(ne === 3 && na === 3 && nh >= 0 && nh <= 3, s"query $q") }
  }

  test("epoch shuffle: exact permutation, fixed batches, epoch-sensitive, growth-local") {
    val out = ExtQueries.epochShuffle(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = out.length
    // positions are exactly 1..N (a permutation, no gaps or dups)
    assert(out.map(_._2).sorted.toSeq === (1L to n).toSeq)
    // batches are full except possibly the last
    val sizes = out.groupBy(_._3).view.mapValues(_.length).toMap
    val lastBatch = sizes.keys.max
    sizes.foreach { case (b, s) =>
      if (b != lastBatch) assert(s === 64, s"batch $b not full: $s") }
    // the decomposed ranking equals the naive global (bucket, h, id) sort
    val docs = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    def hex15(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    val expected = docs.map(id => (id, hex15(s"epoch0|$id")))
      .sortBy { case (id, h) => (h % 1024, h, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    out.foreach { case (id, pos, _) =>
      assert(pos === expected(id), s"doc $id rank mismatch") }
    // a different epoch is a different permutation
    val e1 = Sampling.epochShuffle(
      Tables.documents(spark, sf), "doc_id", 64, epoch = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.exists { case (id, pos, _) => e1(id) != pos })
  }

  test("lm surprisal: hand-computed bits on a tiny corpus; rare docs score above common docs") {
    // corpus: "a" x3, "b" x1 -> N=4, V=2, N+V=6 (bits=3)
    // c(a)=3 -> bits(4)=3 -> term 0; c(b)=1 -> bits(2)=2 -> term 1
    val tiny = Seq((1L, "a a b"), (2L, "a")).toDF("doc_id", "text")
    val got = TextOps.lmSurprisal(tiny, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) === ((3L, 1L, 1L, 7L))) // 0+0+1 bits; b is a hapax; 3+3+1
    assert(got(2L) === ((1L, 0L, 0L, 3L)))

    // monotonicity on the real corpus: a doc made of corpus hapaxes
    // must out-surprise a doc made of the most common tokens
    val out = ExtQueries.lmSurprisal(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (id, n, bits) =>
      assert(bits >= 0 && bits <= n * 64, s"doc $id bits out of range") }
  }

  test("lang id: separable profiles classify perfectly; ties go to the smallest lang") {
    // two languages with disjoint trigram inventories -> perfect
    // classification regardless of profile size
    val sep = Seq(
      (1L, "aaaa bbbb aaab", "xx"), (2L, "aaab aaaa", "xx"),
      (3L, "zzzz yyyy zzzy", "yy"), (4L, "zzzy zzzz", "yy"))
      .toDF("doc_id", "text", "lang")
    val got = TextOps.langId(sep, "doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.forall { case (_, lang, pred) => lang == pred },
      s"misclassified: ${got.mkString(",")}")

    // identical text everywhere -> every doc overlaps every profile
    // equally -> argmax tie -> lexicographically smallest lang
    val tie = Seq(
      (1L, "same text here", "bb"), (2L, "same text here", "aa"),
      (3L, "same text here", "cc"))
      .toDF("doc_id", "text", "lang")
    val tied = TextOps.langId(tie, "doc_id", "text", "lang")
      .collect().map(r => r.getString(2)).distinct
    assert(tied === Array("aa"), s"tie must resolve to 'aa', got ${tied.toSeq}")

    // sub-trigram docs score 0 against every profile and still get
    // the smallest lang, not a null/crash
    val tiny = Seq((1L, "ab", "zz"), (2L, "long enough text", "aa"))
      .toDF("doc_id", "text", "lang")
    val t = TextOps.langId(tiny, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(t(1L) === (("aa", 0L)))
  }

  test("lang id confusion: row sums equal per-lang doc counts; overlap bounded by profile size") {
    val conf = ExtQueries.langIdConfusion(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val perLang = conf.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    val docs = Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.toMap === docs)
    // a doc's overlap with one 50-gram profile is at most 50
    conf.foreach { case (_, _, n, so) =>
      assert(so <= n * 50, "overlap exceeds profile size") }
  }

  test("binaryQuantize packs sign bits exactly; identical codes retrieve at hamming 0") {
    import spark.implicits._
    val v = (1 to 64).map(i => if (i % 3 == 0) 1.0f else -1.0f).toArray
    val df = Seq((1L, v), (2L, v), (3L, v.map(x => -x)))
      .toDF("vec_id", "embedding")
    val codes = Similarity.binaryQuantize(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def word(from: Int, pos: Boolean): Long =
      (0 until 32).map(i => if (((i + from + 1) % 3 == 0) == pos) 1L << i else 0L).sum
    assert(codes(1L) === ((word(0, true), word(32, true))))
    assert(codes(3L) === ((word(0, false), word(32, false))))
    val top = Similarity.hammingTopK(df.filter(col("vec_id") === 1L),
        df.filter(col("vec_id") > 1L), "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getInt(2), r.getLong(1), r.getLong(3)))
    assert(top.sortBy(_._1).toSeq === Seq((1, 2L, 0L), (2, 3L, 64L)))
  }

  test("dsirWeights: target-vocab docs score positive, alien docs negative; micro-case exact") {
    import spark.implicits._
    // corpus = {aa aa, bb bb}; target = {aa aa}. Corpus LM: N=4,V=2 ->
    // per-token bits 3-2=1 for both docs (bits_corpus = 2 each).
    // Target LM: N=2,V=1 -> 'aa' costs bits(3)-bits(3)=0, 'bb' is
    // unseen: bits(3)-bits(1)=1. So weight(doc1)=2-0=2 (selected),
    // weight(doc2)=2-2=0 (not selected).
    val corpus = Seq((1L, "aa aa"), (2L, "bb bb")).toDF("doc_id", "text")
    val target = corpus.filter(col("doc_id") === 1L)
    val got = TextOps.dsirWeights(corpus, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(2), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got(1L) === ((2L, 0L, 2L, true)))
    assert(got(2L) === ((2L, 2L, 0L, false)))
  }

  test("dsir gate: the target sample itself skews positive vs the rest of the corpus") {
    val out = ExtQueries.dsirSelect(spark, sf)
      .join(Tables.documents(spark, sf).select("doc_id", "source"), "doc_id")
      .groupBy(col("source") === "src0")
      .agg(avg(col("weight_bits").cast("double")).as("mean_w"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(out(true) > out(false),
      s"target-sample mean weight ${out(true)} not above corpus ${out(false)}")
  }

  test("ivfPqTopK with one centroid reduces exactly to pqTopK on translated vectors") {
    // K = 1 -> every candidate lands in the single cell and nprobe=1
    // probes it, so IVFADC degenerates to plain ADC over residuals
    // v - c. Feeding pqTopK the PRE-translated vectors must therefore
    // reproduce the ivfPqTopK output bit-for-bit (same codebook, same
    // argmin ties, same fold order) — the composition adds routing,
    // never different arithmetic.
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val qs = e.filter(col("vec_id") < 5)
    val cands = e.filter(col("vec_id") >= 5 && col("vec_id") < 60)
    val seeds = e.filter(col("vec_id") >= 5 && col("vec_id") < 21)
    val cent = cands.filter(col("vec_id") === 5)
    val composed = Similarity.ivfPqTopK(qs, cands, cent, seeds,
      "vec_id", "embedding", k = 3, nprobe = 1, numSub = 8, subDim = 8)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val cv = cent.select(Similarity.toDouble(col("embedding"))).head.getSeq[Double](0)
    val shift = (v: Column) =>
      zip_with(Similarity.toDouble(v),
        lit(cv.toArray), (x, y) => x - y)
    val translated = Similarity.pqTopK(
      qs.select(col("vec_id"), shift(col("embedding")).as("embedding")),
      cands.select(col("vec_id"), shift(col("embedding")).as("embedding")),
      seeds, "vec_id", "embedding", k = 3, numSub = 8, subDim = 8)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(composed === translated)
  }

  test("ivfPqTopK emits k dense ranks per query from probed cells only") {
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val cands = e.filter(col("vec_id") >= 20)
    val out = Similarity.ivfPqTopK(
      e.filter(col("vec_id") < 8), cands,
      cands.filter(col("vec_id") % 25 === 0),
      e.filter(col("vec_id") >= 20 && col("vec_id") < 36),
      "vec_id", "embedding", k = 3, nprobe = 2, numSub = 8, subDim = 8)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getDouble(3)))
    val byQ = out.groupBy(_._1)
    assert(byQ.size === 8)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1 to 3), s"ranks for query $q")
      rows.foreach { case (_, _, d) => assert(d >= 0.0, s"negative ADC for $q") }
    }
  }

  test("vocab coverage: tie-break is by token ascending, not hash order") {
    // every token appears exactly once -> top-2 must be the two
    // lexicographically smallest tokens
    val df = Seq((1L, "delta echo"), (2L, "alpha bravo")).toDF("doc_id", "text")
    val got = TextOps.vocabCoverage(df, "doc_id", "text", topR = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(2L) === 1.0) // alpha, bravo in vocab
    assert(got(1L) === 0.0)
  }
}
