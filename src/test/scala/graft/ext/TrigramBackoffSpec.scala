package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TrigramBackoffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("backoff levels classify matched order correctly") {
    // ref LM: "a b c d" and "a b x" -> trigrams {a b c, b c d}, bigrams
    // {a b(x2), b c, b x, c d}, unigrams {a:2 b:2 c:1 d:1 x:1}, N=7 V=5
    val ref = Seq((1L, "a b c d"), (2L, "a b x")).toDF("doc_id", "text")
    val scored = Seq(
      (10L, "a b c"),   // pos3: trigram (a,b,c) seen -> level 3
      (11L, "x a b"),   // pos3: trigram unseen, bigram (a,b) seen -> 2
      (12L, "c c a"),   // pos3: tri+bi unseen, unigram a seen -> 1
      (13L, "a b zzz")  // pos3: zzz OOV -> 0
    ).toDF("doc_id", "text")
    val out = TextOps.trigramBackoffSurprisal(ref, scored, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    def bits(x: Long) = java.lang.Long.toBinaryString(x).length
    // doc10: lvl3, bits = bits(c2ctx(a,b)=2) - bits(c3=1) = 2-1 = 1
    assert(out(10L) === ((1L, 1L, 1L, 0L, 0L, 0L)))
    // doc11: lvl2, bits = 1 + bits(c1ctx(a)=2) - bits(c2(a,b)=2) = 1
    assert(out(11L) === ((1L, 1L, 0L, 1L, 0L, 0L)))
    // doc12: lvl1, bits = 2 + bits(N=7) - bits(c1(a)=2) = 2 + 3 - 2 = 3
    assert(out(12L) === ((1L, 3L, 0L, 0L, 1L, 0L)))
    // doc13: OOV, bits = 1 + bits(N+V=12) = 1 + 4 = 5
    assert(out(13L) === ((1L, 5L, 0L, 0L, 0L, 1L)))
    assert(bits(7) === 3 && bits(12) === 4) // the arithmetic above
  }

  test("docs under 3 tokens score nothing; longer docs score len-2 positions") {
    val ref = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val scored = Seq((10L, "a b"), (11L, "a b c d e")).toDF("doc_id", "text")
    val out = TextOps.trigramBackoffSurprisal(ref, scored, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!out.contains(10L))
    assert(out(11L) === 3L)
  }

  test("deterministic under repartitioning") {
    val docs = (1 to 60).map(i =>
      (i.toLong, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 2} end"))
      .toDF("doc_id", "text")
    val ref = docs.filter($"doc_id" % 3 === 0)
    val sc = docs.filter($"doc_id" % 3 =!= 0)
    val a = TextOps.trigramBackoffSurprisal(ref, sc, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val b = TextOps.trigramBackoffSurprisal(ref.repartition(5),
      sc.repartition(7), "doc_id", "text").collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
