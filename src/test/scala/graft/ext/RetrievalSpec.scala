package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** BM25 + RRF semantics on hand-built corpora: term-match ranking,
  * idf ordering, length normalization, the integer quantization
  * bounds, and the fusion arithmetic pinned against hand-computed
  * values.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "text")
  private def query(id: Long, terms: String*) =
    Seq((id, terms)).toDF("query_id", "terms")

  test("docs containing the query term outrank docs that don't") {
    // pad docs keep df(alpha)=2 below N/2 so the clamped idf is
    // positive (df >= N/2 zeroes it — Lucene's convention).
    val c = corpus(
      (10L, "alpha beta gamma"),
      (11L, "delta epsilon zeta"),
      (12L, "alpha alpha beta"),
      (13L, "pad pad pad"), (14L, "pad pad pad"), (15L, "pad pad pad"))
    val out = Retrieval.bm25TopK(query(1L, "alpha"), "query_id", "terms",
      c, "doc_id", "text", k = 6).collect()
    // doc 11 has no query term — it must not appear at all (inner
    // join on the posting list).
    assert(out.map(_.getLong(1)).toSet == Set(10L, 12L))
    // higher tf wins under equal dl=3: doc 12 (tf=2) above doc 10.
    assert(out.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq == Seq(12L, 10L))
  }

  test("rarer terms carry more weight (idf ordering)") {
    // 'rare' appears in 1 of 8 docs, 'common' in 6 of 8. Two probe
    // docs match exactly one term each with identical tf and dl.
    val c = corpus(
      (10L, "rare filler filler"), (11L, "common filler filler"),
      (12L, "common pad pad"), (13L, "common pad pad"),
      (14L, "common pad pad"), (15L, "common pad pad"),
      (16L, "common pad pad"), (17L, "pad pad pad"))
    val out = Retrieval.bm25TopK(
      Seq((1L, Seq("rare", "common"))).toDF("query_id", "terms"),
      "query_id", "terms", c, "doc_id", "text", k = 8).collect()
    val score = out.map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(score(10L) > score(11L),
      s"rare-term doc must outscore common-term doc: $score")
  }

  test("shorter docs outrank longer docs at equal tf (length norm)") {
    val c = corpus(
      (10L, "alpha beta"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta"),
      (12L, "pad pad pad"), (13L, "pad pad pad"),
      (14L, "pad pad pad"), (15L, "pad pad pad"))
    val out = Retrieval.bm25TopK(query(1L, "alpha"), "query_id", "terms",
      c, "doc_id", "text", k = 2).collect()
    assert(out.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq == Seq(10L, 11L))
    // and strictly: the short doc's integer score is larger
    val sc = out.map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(sc(10L) > sc(11L))
  }

  test("duplicate query terms collapse (standard BM25 query semantics)") {
    val c = corpus((10L, "alpha beta"), (11L, "beta gamma"),
      (12L, "pad pad"), (13L, "pad pad"))
    val once = Retrieval.bm25TopK(query(1L, "alpha"), "query_id", "terms",
      c, "doc_id", "text", k = 4).collect()
    val twice = Retrieval.bm25TopK(query(1L, "alpha", "alpha"),
      "query_id", "terms", c, "doc_id", "text", k = 4).collect()
    assert(once.nonEmpty && once(0).getLong(3) > 0L)
    assert(once.map(r => (r.getLong(1), r.getLong(3))).toSet ==
      twice.map(r => (r.getLong(1), r.getLong(3))).toSet)
  }

  test("integer score matches the hand-computed closed form") {
    // N=4 docs, 3 tokens each → T=12. Query 'alpha' hits doc 10 with
    // tf=1, dl=3, df=1:
    //   idf     = bitlen(2*(4-1)+1) - bitlen(2*1+1)
    //           = bitlen(7) - bitlen(3) = 3 - 2 = 1
    //   tf_part = (20480*T*tf) div (8*T*tf + 3*T + 9*dl*N)
    //           = 245760 div (96 + 36 + 108) = 245760 div 240 = 1024
    //   score   = 1 * 1024 = 1024.
    val c4 = corpus(
      (10L, "alpha pad pad"), (11L, "pad pad pad"),
      (12L, "pad pad pad"), (13L, "pad pad pad"))
    val out = Retrieval.bm25TopK(query(1L, "alpha"), "query_id", "terms",
      c4, "doc_id", "text", k = 1).collect()
    assert(out.length == 1 && out(0).getLong(1) == 10L)
    assert(out(0).getLong(3) == 1024L,
      s"hand-computed score 1024, got ${out(0).getLong(3)}")
  }

  test("rrfFuse matches hand-computed fixed-point contributions") {
    // ranker A: cand 5 at rank 1, cand 6 at rank 2
    // ranker B: cand 6 at rank 1, cand 7 at rank 2
    // contributions: 1000000 div 61 = 16393, div 62 = 16129
    //   cand 5: 16393; cand 6: 16129 + 16393 = 32522; cand 7: 16129
    val a = Seq((1L, 5L, 1), (1L, 6L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val b = Seq((1L, 6L, 1), (1L, 7L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), k = 3).collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3))).sortBy(_._2)
    assert(out.toSeq == Seq((6L, 1, 32522L), (5L, 2, 16393L),
      (7L, 3, 16129L)))
  }

  test("fused rank prefers candidates present in both rankers") {
    // A candidate at rank 3 in BOTH lists (2·15873=31746) beats a
    // rank-1 single-list candidate (16393) — the consensus property
    // RRF exists for.
    val a = Seq((1L, 5L, 1), (1L, 9L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val b = Seq((1L, 8L, 1), (1L, 9L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val top = Retrieval.rrfFuse(Seq(a, b), k = 1).collect()
    assert(top(0).getLong(1) == 9L)
  }

  test("phrase tf equals the brute-force adjacent-pair count") {
    // the positional-index join must agree with literally counting
    // adjacent (t1, t2) token pairs per doc — including overlapping
    // occurrences ("x x x" contains "x x" twice)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val q = docs.filter(col("doc_id") < 20)
      .select(col("doc_id").as("query_id"),
        element_at(TextOps.tokens(col("text")), 1).as("t1"),
        element_at(TextOps.tokens(col("text")), 2).as("t2"))
    val corpus = docs.filter(col("doc_id") >= 20)
    val got = Retrieval.phraseTopK(q, "query_id", "t1", "t2",
        corpus, "doc_id", "text", k = 1000000)
      .select(col("query_id"), col("doc_id"), col("phrase_tf"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val brute = q.crossJoin(corpus.select(col("doc_id"),
        TextOps.tokens(col("text")).as("__w")))
      .select(col("query_id"), col("doc_id"),
        size(filter(expr("sequence(1, size(__w) - 1)"),
          i => element_at(col("__w"), i) === col("t1") &&
            element_at(col("__w"), i + 1) === col("t2")))
          .cast("long").as("tf"))
      .filter(col("tf") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == brute)
  }

  test("phrase ranking: overlapping occurrences count individually") {
    val corpus = Seq((20L, "x x x y"), (21L, "x x y")).toDF("doc_id", "text")
    val q = Seq((1L, "x", "x")).toDF("query_id", "t1", "t2")
    val got = Retrieval.phraseTopK(q, "query_id", "t1", "t2",
        corpus, "doc_id", "text", k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((20L, 1L, 2L), (21L, 2L, 1L)))
  }
}
