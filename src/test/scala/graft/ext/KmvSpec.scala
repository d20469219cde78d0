package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.ExtQueries

class KmvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def agg(k: Int) = new Sketches.KmvAggregator(k)

  test("below k distinct values the sketch is the exact distinct set") {
    val a = agg(64)
    val b = Seq(5L, 3L, 5L, 9L, 3L).foldLeft(a.zero)(a.reduce)
    assert(b === Seq(3L, 5L, 9L))
    assert(a.finish(b) === ((3L, -1L)))
  }

  test("sketch keeps exactly the k smallest distinct hashes") {
    val a = agg(4)
    val b = (100L to 1L by -1L).foldLeft(a.zero)(a.reduce)
    assert(b === Seq(1L, 2L, 3L, 4L))
    assert(a.finish(b) === ((4L, 4L)))
  }

  test("merge of split sketches equals the whole-input sketch") {
    val a = agg(8)
    val xs = (0 until 500).map(i => (i * 2654435761L) % 100000L)
    val whole = xs.foldLeft(a.zero)(a.reduce)
    for (cut <- Seq(1, 100, 250, 499)) {
      val (l, r) = xs.splitAt(cut)
      val merged = a.merge(l.foldLeft(a.zero)(a.reduce),
        r.foldLeft(a.zero)(a.reduce))
      assert(merged === whole, s"cut=$cut")
    }
  }

  test("estimator lands within 30% of truth on a 10k-distinct stream") {
    // uniform-ish 60-bit hashes from the same md5 domain the query uses
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(i: Int): Long = {
      val d = md.digest(s"kmv|$i".getBytes("UTF-8"))
      BigInt(1, d.take(8)).longValue >>> 4 // top 60 bits
    }
    val k = 64
    val a = agg(k)
    val b = (0 until 10000).map(h).foldLeft(a.zero)(a.reduce)
    val (m, kth) = a.finish(b)
    assert(m === k)
    val est = (k - 1).toDouble * math.pow(2, 60) / kth.toDouble
    assert(math.abs(est - 10000) / 10000.0 < 0.30, s"est=$est")
  }

  test("q_kmv_distinct at sf0.001 is exact (15 users < k)") {
    val row = ExtQueries.kmvDistinct(spark, sf).collect().head
    assert(row.getAs[Long]("k") === 64L)
    assert(row.getAs[Long]("n_exact") === 15L)
    assert(row.getAs[Double]("est_distinct") === 15.0)
  }
}
