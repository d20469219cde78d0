package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The composed corpus-release driver: every input doc gets exactly
  * one ledger disposition, planted dups/contamination land in their
  * stage, the manifest arithmetic closes (input = kept + Σ dropped),
  * the bundle tree writes and re-reads, and the whole run is
  * deterministic. The per-stage VALUES are oracle-checked at the
  * gate (q_corpus_release); this spec pins the composition contract
  * on a hand-built corpus where each disposition is forced.
  */
class CorpusReleaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ≥30 alphabetic tokens with ≥2 stopwords → passes the gopher
  // gate; built from a tiny repeated vocabulary so the self-trained
  // unigram LM scores them as unsurprising (route = kept)
  // every 5-gram contains a seeded token (seeded every other slot),
  // so docs with different seeds share ZERO 5-grams — only the
  // benchmark twin (same seed) can trip decontamination
  private def longText(seed: Int): String =
    (0 until 34).map(i => Seq("the", s"dataset$seed", "of", s"model$seed",
      "is", s"corpus$seed", "to", s"weight$seed")(i % 8)).mkString(" ")

  private def corpus() = Seq(
    // 1/2: same page behind tracking-param and case noise → url dup
    (1L, longText(1), "https://site0.com/p/1?utm_source=x", "en", "s0"),
    (2L, longText(1) + " tail variation of the data corpus is here now",
      "HTTPS://WWW.SITE0.COM:443/p/1", "en", "s0"),
    // 3/4: distinct urls, identical text → exact dup
    (3L, longText(3), "https://site1.com/a", "en", "s0"),
    (4L, longText(3), "https://site2.com/b", "en", "s1"),
    // 5/6: marker-suffixed copy → near dup (high jaccard)
    (5L, longText(5), "https://site3.com/c", "en", "s1"),
    (6L, longText(5) + " graftmarker end", "https://site4.com/d", "en", "s1"),
    // 7: shares its whole text with the benchmark → contaminated
    (7L, longText(7), "https://site5.com/e", "en", "s0"),
    // 8: too short for gopher → quality_drop
    (8L, "short doc", "https://site6.com/f", "en", "s1"),
    // 9: clean keeper
    (9L, longText(9), "https://site7.com/g", "en", "s0"))
    .toDF("doc_id", "text", "url", "lang", "source")

  private def bench() =
    Seq((100L, longText(7))).toDF("doc_id", "text")

  test("ledger assigns every doc exactly one forced disposition") {
    val b = CorpusRelease.run(corpus(), bench())
    val led = b.ledger.as[(Long, String)].collect().toMap
    assert(led.size == 9, s"ledger rows: $led")
    assert(led(2L) == "url")     // 1 < 2 on the shared normalized url
    assert(led(4L) == "exact")   // 3 < 4 on identical text
    assert(led(6L) == "near")    // CC root is 5
    assert(led(7L) == "contaminated")
    assert(led(8L) == "quality_drop")
    assert(Seq(1L, 3L, 5L, 9L).forall(id =>
      Set("kept", "quality_review")(led(id))), s"keepers: $led")
  }

  test("manifest arithmetic closes and matches the ledger") {
    val b = CorpusRelease.run(corpus(), bench())
    val m = b.manifest.select("stage", "metric", "value")
      .as[(String, String, Long)].collect()
      .map { case (s, k, v) => (s, k) -> v }.toMap
    val dropped = m("1_url" -> "n_dropped") + m("2_exact" -> "n_dropped") +
      m("3_near" -> "n_dropped") + m("4_decon" -> "n_dropped") +
      m("5_quality" -> "n_drop") + m("5_quality" -> "n_review")
    assert(m("0_input" -> "n_docs") == 9L)
    assert(m("0_input" -> "n_docs") == dropped + m("5_quality" -> "n_keep"))
    assert(m("8_card" -> "n_docs") == m("5_quality" -> "n_keep"))
    assert(m("6_pack" -> "n_tokens") == m("8_card" -> "n_tokens"))
    // the released set packs into >= 1 pack and >= 1 shard
    assert(m("6_pack" -> "n_packs") >= 1L)
    assert(m("7_shard" -> "n_shards") >= 1L)
  }

  test("bundle writes one release tree and re-reads intact") {
    val out = java.nio.file.Files
      .createTempDirectory("corpus_release").toString
    val b = CorpusRelease.run(corpus(), bench())
    CorpusRelease.writeBundle(b, out)
    val parts = Seq("ledger", "packs", "shards", "data_card", "manifest")
    parts.foreach(p => assert(
      new java.io.File(s"$out/$p").isDirectory, s"missing $out/$p"))
    val m0 = b.manifest.orderBy("stage", "metric")
      .as[(String, String, Long, String)].collect().toSeq
    val m1 = spark.read.parquet(s"$out/manifest").orderBy("stage", "metric")
      .as[(String, String, Long, String)].collect().toSeq
    assert(m0 == m1)
    assert(spark.read.parquet(s"$out/ledger").count() == 9L)
  }

  test("manifest records the near-dup contract and the hot-bucket audit") {
    // uncapped run: contract says so, audit rows are zero
    val un = CorpusRelease.run(corpus(), bench())
      .manifest.select("stage", "metric", "value", "contract")
      .as[(String, String, Long, String)].collect()
    assert(un.filter(_._1 == "3_near").map(_._4).toSet
      == Set("lsh_uncapped"))
    assert(un.filter(r => r._1 != "3_near").map(_._4).toSet
      == Set("exact"))
    assert(un.find(r => r._2 == "n_buckets_capped").get._3 == 0L)

    // planted HOT BUCKET: 24 near-identical docs (one trailing token
    // differs — the exact stage can't collapse them) share most LSH
    // band buckets, so a cap of 6 drops real buckets from pairwise
    // generation and the manifest must SAY so — buckets counted,
    // pre-filter pairs priced, contract = lsh_capped
    val hot = (0 until 24).map(i => (500L + i,
      longText(42) + s" variant$i",
      s"https://hot.example/h/$i", "en", "s0"))
      .toDF("doc_id", "text", "url", "lang", "source")
    val b = CorpusRelease.run(corpus().unionByName(hot), bench(),
      maxBucketSize = 6)
    val m = b.manifest.select("stage", "metric", "value", "contract")
      .as[(String, String, Long, String)].collect()
    val mm = m.map(r => (r._1, r._2) -> r._3).toMap
    assert(m.filter(_._1 == "3_near").map(_._4).toSet
      == Set("lsh_capped"))
    assert(mm("3_near" -> "n_buckets_capped") > 0L,
      s"no capped buckets: ${m.toSeq}")
    assert(mm("3_near" -> "n_pairs_dropped") >=
      mm("3_near" -> "n_buckets_capped") * (7L * 6 / 2))
    // the ledger still covers every doc exactly once (the cap changes
    // recall, never the input=kept+dropped arithmetic)
    val dropped = mm("1_url" -> "n_dropped") +
      mm("2_exact" -> "n_dropped") + mm("3_near" -> "n_dropped") +
      mm("4_decon" -> "n_dropped") + mm("5_quality" -> "n_drop") +
      mm("5_quality" -> "n_review")
    assert(mm("0_input" -> "n_docs") == 33L)
    assert(mm("0_input" -> "n_docs")
      == dropped + mm("5_quality" -> "n_keep"))
  }

  test("the release is deterministic run-to-run") {
    def manifest() = CorpusRelease.run(corpus(), bench())
      .manifest.orderBy("stage", "metric")
      .as[(String, String, Long, String)].collect().toSeq
    assert(manifest() == manifest())
  }

  test("the shipped ingest store answers like the direct check on the kept set") {
    import org.apache.spark.sql.functions._
    val path = "/tmp/graft_relstore_spec"
    val b = CorpusRelease.run(corpus(), bench())
    CorpusRelease.shipIngestStore(corpus(), b.ledger, path)
    val kept = corpus().join(
      b.ledger.filter(col("disposition") === "kept").select("doc_id"),
      Seq("doc_id")).select("doc_id", "text")
    // probe = a clone of each kept doc (marker appended) + one novel doc
    val probe = kept.limit(3)
      .select((col("doc_id") + 5000).as("doc_id"),
        concat(col("text"), lit(" probed")).as("text"))
      .unionByName(Seq((9999L, "entirely novel text " + longText(77)))
        .toDF("doc_id", "text"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("new_id", "index_id", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
    val viaStore = rows(SignatureStore.ingest(spark, path, probe,
      "doc_id", "text"))
    val direct = rows(Dedup.incrementalNearDups(kept, probe,
      "doc_id", "text"))
    assert(viaStore == direct)
    assert(viaStore.nonEmpty)
    // the novel doc matched nothing
    assert(!viaStore.exists(_._1 == 9999L))
  }
}
