package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Wave-2 corpus-assembly semantics on hand-built corpora:
  * containment vs Jaccard, token-budget prefix rule, version diff,
  * duplicated-span excision, bigram fluency, winnow decontamination.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("containment catches an excerpt Jaccard-LSH would miss") {
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val excerpt = (1 to 10).map(i => s"w$i").mkString(" ")
    val other = (101 to 160).map(i => s"v$i").mkString(" ")
    val out = Dedup.containmentPairs(
      Seq((1L, long), (2L, excerpt), (3L, other)).toDF("doc_id", "text"),
      "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.length == 1)
    val (a, b, inter, na, nb) = out(0)
    assert((a, b) == (1L, 2L))
    // the excerpt's 8 shingles are ALL contained: c(B,A) = 1 exactly
    assert(inter == 8L && nb == 8L && na == 58L)
    // while the Jaccard is tiny — the case LSH-on-Jaccard misses
    assert(inter * 5 < na + nb - inter)
  }

  test("tokenBudgetSample keeps exactly the <=budget hash-order prefix") {
    val rows = (1L to 30L).map(i =>
      (i, (1 to (3 + (i % 5)).toInt).map(j => s"t${i}_$j").mkString(" "),
        if (i <= 15) "a" else "b"))
    val df = rows.toDF("doc_id", "text", "source")
    val full = Sampling.tokenBudgetSample(df, "doc_id", "text", "source",
      Long.MaxValue).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val expected = full.filter(_._3 <= 20L).map(_._1).toSet
    val kept = Sampling.tokenBudgetSample(df, "doc_id", "text", "source",
      20L).collect()
    assert(kept.map(_.getLong(0)).toSet == expected)
    // never overshoots, per source
    val bySrc = kept.groupBy(_.getString(1))
    bySrc.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).sum <= 20L)
      assert(rs.map(_.getLong(3)).max <= 20L)
    }
    assert(kept.nonEmpty && kept.length < 30)
  }

  test("corpusDiff reports added/removed/changed and omits unchanged") {
    val v1 = Seq((1L, "same text"), (2L, "old text"), (3L, "going away"))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, "same text"), (2L, "new text"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val out = TextOps.corpusDiff(v1, v2, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("dupSpanRemoval cuts exactly the covered positions") {
    // docs 1 and 2 share tokens s1..s5 (one duplicated 5-gram); the
    // flanking tokens survive. doc 3 shares nothing and is untouched.
    val shared = "s1 s2 s3 s4 s5"
    val out = TextOps.dupSpanRemoval(Seq(
      (1L, s"a1 a2 $shared a3 a4"),
      (2L, s"b1 $shared b2 b3 b4"),
      (3L, "c1 c2 c3 c4 c5 c6 c7")).toDF("doc_id", "text"),
      "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out(1L) == (("a1 a2 a3 a4", 4L, 5L)))
    assert(out(2L) == (("b1 b2 b3 b4", 4L, 5L)))
    assert(out(3L) == (("c1 c2 c3 c4 c5 c6 c7", 7L, 0L)))
  }

  test("dupSpanRemoval: identical docs fully excise but keep their row") {
    val t = "x1 x2 x3 x4 x5 x6"
    val out = TextOps.dupSpanRemoval(
      Seq((1L, t), (2L, t)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(out.length == 2)
    assert(out.forall(r => r._2 == "" && r._3 == 0L && r._4 == 6L))
  }

  test("bigramSurprisal: shuffled word order costs more bits than fluent") {
    val fluent = (1 to 5).map(i => (i.toLong, "the cat sat on the mat"))
    val shuffled = Seq((100L, "mat the on sat cat the"))
    val out = TextOps.bigramSurprisal(
      (fluent ++ shuffled).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out.values.forall(_._1 == 6L))
    val fluentBits = out(1L)._2
    val shuffledBits = out(100L)._2
    assert(shuffledBits > fluentBits,
      s"shuffled $shuffledBits must exceed fluent $fluentBits")
    // unigram surprisal cannot tell them apart — same token multiset
    val uni = TextOps.lmSurprisal(
      (fluent ++ shuffled).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(uni(1L) == uni(100L))
  }

  test("shardPlan's bucket-decomposed cumsum equals the global order") {
    val rows = (1L to 50L).map(i =>
      (i, (1 to (5 + (i % 7)).toInt).map(j => s"t${i}_$j").mkString(" ")))
    val df = rows.toDF("doc_id", "text")
    val out = Sampling.shardPlan(df, "doc_id", "text",
      shardTokens = 40L, numBuckets = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // re-derive the expected global cumsum driver-side from the same
    // permutation key (bucket, hash, id)
    val keyed = df.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n"),
        TextOps.hex15(concat(lit("shard|"), col("doc_id").cast("string")))
          .as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, _, h) => (h % 8, h, id) }
    var cum = 0L
    val expected = keyed.map { case (id, n, _) =>
      val before = cum; cum += n; (id, n, before, before / 40L)
    }.toSet
    assert(out.toSet == expected)
    // shard fill: every non-final shard spans >= shardTokens of
    // cum range (docs are never split; overshoot bounded by max doc)
    val lastShard = out.map(_._4).max
    val bounds = out.groupBy(_._4).view
      .mapValues(rs => rs.map(r => r._3 + r._2).max).toMap
    bounds.filter(_._1 < lastShard).foreach { case (s, hi) =>
      assert(hi >= (s + 1) * 40L)
    }
  }

  test("cluster-size histogram composition: sizes + derived singletons") {
    val t = (1 to 12).map(i => s"c$i").mkString(" ")
    val corpus = Seq((1L, t), (2L, t + " tail"),
      (3L, (100 to 111).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(corpus, "doc_id", "text")
      .select("doc_a", "doc_b")
    val sizes = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
    val multi = sizes.groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"))
    val singles = corpus.agg(count(lit(1)).as("__t"))
      .crossJoin(sizes.agg(sum("cluster_size").as("__l")))
      .select(lit(1L).as("cluster_size"),
        (col("__t") - coalesce(col("__l"), lit(0L))).cast("long")
          .as("n_clusters"))
    val hist = multi.unionByName(singles).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist == Map(2L -> 1L, 1L -> 1L))
  }

  test("winnowDecontaminate flags the benchmark's corpus copy") {
    val bench = (1 to 20).map(i => s"e$i").mkString(" ")
    val clean = (101 to 120).map(i => s"c$i").mkString(" ")
    val out = TextOps.winnowDecontaminate(
      Seq((1L, bench), (2L, clean)).toDF("doc_id", "text"),
      Seq((900L, bench)).toDF("doc_id", "text"),
      "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 1)
    assert(out(0)._1 == 1L && out(0)._2 == 900L && out(0)._3 >= 2L)
  }
}
