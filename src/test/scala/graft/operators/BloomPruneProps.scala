package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.TestSpark

/** ScalaCheck: for ANY fact/dim key sets, bitmap sizes and hash
  * counts, the bloom-pruned semi-join equals the plain semi-join —
  * the no-false-negatives guarantee under heavy collision pressure
  * (tiny bitmaps force many false positives; the exact pass must
  * clear every one).
  */
object BloomPruneProps extends Properties("BloomPrune") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark

  private val keysGen = Gen.resize(60, Gen.listOf(Gen.choose(-1000L, 1000L)))

  property("pruned semi-join == plain semi-join for any keys/bits/hashes") =
    forAll(keysGen, keysGen, Gen.oneOf(64, 128, 1024), Gen.choose(1, 4)) {
      (factKeys, dimKeys, numBits, numHashes) =>
        import spark.implicits._
        val fact = factKeys.zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "id")
        val dim = dimKeys.toDF("dk")
        val got = BloomPrune.prunedSemiJoin(fact, dim, "k", "dk",
            numBits = numBits, numHashes = numHashes)
          .select("id").collect().map(_.getInt(0)).sorted.toSeq
        val dimSet = dimKeys.toSet
        val want = factKeys.zipWithIndex.collect {
          case (k, i) if dimSet(k) => i
        }.sorted.toSeq
        got == want
    }
}
