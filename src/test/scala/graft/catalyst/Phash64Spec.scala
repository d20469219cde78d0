package graft.catalyst

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the three properties the perceptual hash exists for —
  * container invariance, perturbation locality, unrelated-content
  * separation — plus full banded-join recall at the Hamming
  * threshold against a brute-force pair scan. */
class Phash64Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private val rnd = new scala.util.Random(29)
  private def doc(): String =
    Seq.fill(250)("the data spark table row agg value fast"
      .split(" ")(rnd.nextInt(8))).mkString(" ")
  private val docs = Seq.fill(40)(doc())

  test("re-wrap invariance: same content, any container, identical hash") {
    val png = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47)
    val jpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte)
    docs.foreach { d =>
      val c = d.getBytes("UTF-8")
      assert(Phash64.compute(png ++ c, 4) === Phash64.compute(jpg ++ c, 3))
      assert(Phash64.compute(png ++ c, 4) === Phash64.compute(c, 0))
    }
  }

  test("locality: small perturbations stay within the threshold, unrelated content far out") {
    val hs = docs.map(d => Phash64.compute(d.getBytes("UTF-8"), 0))
    val perturbed = docs.map(d =>
      d.substring(0, 100) + "XQZ" + d.substring(103))
    val hp = perturbed.map(d => Phash64.compute(d.getBytes("UTF-8"), 0))
    hs.zip(hp).foreach { case (a, b) => assert(ham(a, b) <= 7) }
    val cross = for (i <- docs.indices; j <- docs.indices if i < j)
      yield ham(hs(i), hs(j))
    assert(cross.min > 7, s"unrelated docs under the threshold: ${cross.min}")
    // bit 63 (the DC slot) is always clear: the hash never goes negative
    (hs ++ hp).foreach(h => assert(h >= 0))
  }

  test("banded pairs equal brute force at the threshold (full recall <= 7)") {
    graft.ext.Multimodal // touch
    val corpus = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) } ++
      docs.zipWithIndex.collect { case (d, i) if i % 3 == 0 =>
        (i + 1000L, d.substring(0, 40) + "Y" + d.substring(41))
      }
    val df = corpus.toDF("media_id", "text")
      .select(col("media_id"), encode(col("text"), "UTF-8").as("payload"))
    val h = graft.ext.Multimodal.phash(df, "media_id", "payload", lit(0))
    val got = graft.ext.Multimodal.phashPairs(h, "media_id", "phash")
      .orderBy("media_a", "media_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val hs = corpus.map { case (id, d) =>
      id -> Phash64.compute(d.getBytes("UTF-8"), 0)
    }
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = ham(ha, hb) if d <= 7
    } yield (ia, ib, d.toLong)).sortBy(p => (p._1, p._2))
    assert(got === brute)
    assert(brute.nonEmpty) // the planted single-char clones must pair

    // the production band width: 4×16-bit bands, full recall <= 3
    val got16 = graft.ext.Multimodal
      .phashPairs(h, "media_id", "phash", maxHamming = 3, bandBits = 16)
      .orderBy("media_a", "media_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val brute3 = brute.filter(_._3 <= 3)
    assert(got16 === brute3)
    intercept[IllegalArgumentException] {
      graft.ext.Multimodal.phashPairs(h, "media_id", "phash",
        maxHamming = 4, bandBits = 16) // pigeonhole only covers <= 3
    }
  }
}
