package graft.catalyst

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ext.Dedup
import graft.sources.Tables

/** Pins the 64-bit SimHash path: the native one-pass expression must
  * equal the explode+aggregate composition bit-for-bit, the band
  * split must be the fingerprint's own 16-bit slices, and the banded
  * pair join must recall EXACTLY the hamming<=3 pairs (pigeonhole:
  * 4 bands, <=3 flipped bits, so one band always survives intact).
  */
class SimHash64Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("native simhash64 equals the two-half explode+aggregate composition") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val native = Dedup.simhash64(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = Dedup.simhash64Composed(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === composed)
    // 64 bits must actually be exercised: some fingerprint uses a
    // bit above the old 16-bit range on any non-trivial corpus
    assert(native.values.exists(fp => (fp >>> 16) != 0L))
  }

  test("band split is the fingerprint's own 16-bit slices") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val fp = Dedup.simhash64(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bands = Dedup.simhash64Bands(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (0 until 4).map(k => r.getLong(1 + k))).toMap
    assert(bands.keySet === fp.keySet)
    bands.foreach { case (id, bs) =>
      bs.zipWithIndex.foreach { case (b, k) =>
        assert(b === ((fp(id) >>> (16 * k)) & 0xffffL))
        assert(b >= 0L && b <= 0xffffL)
      }
    }
  }

  test("simhash64 of a doc with no contributing tokens is NULL, not 0") {
    SimHash64.register(spark)
    val df = Seq((1L, Seq.empty[String]), (2L, Seq("real", "tokens")))
      .toDF("doc_id", "toks")
      .select(col("doc_id"), call_function("simhash64", col("toks")).as("fp"))
    val byId = df.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(byId(1L) === true)
    assert(byId(2L) === false)
  }

  test("64-bit banded pairs recall exactly the hamming<=3 pairs (brute check)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      // append near-copies so the threshold region is populated
      .unionByName(Tables.documents(spark, sf)
        .filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 900000).as("doc_id"),
          concat(col("text"), lit(" tiny tail")).as("text")))
    val fps = Dedup.simhash64(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val brute = (for {
      (ida, sa) <- fps; (idb, sb) <- fps if ida < idb
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ida, idb) -> java.lang.Long.bitCount(sa ^ sb).toLong).toMap
    val got = Dedup.simhashPairs64(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === brute) // pigeonhole: full recall, nothing extra
    assert(brute.nonEmpty, "threshold region must actually be exercised")
  }
}
