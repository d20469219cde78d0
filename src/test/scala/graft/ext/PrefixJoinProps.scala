package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAllNoShrink

import graft.TestSpark

/** Exactness property for the prefix-filter similarity join: against
  * ANY corpus and ANY threshold, [[Dedup.prefixFilterPairs]] must
  * emit exactly the pairs a brute-force all-pairs Jaccard emits —
  * the operator's whole contract is that its three pruning stages
  * (rarity-ordered prefix, length ratio, positional bound) are
  * candidate-complete. The reference model is an in-memory fold over
  * the same shingle semantics (single-space tokens, word 3-grams,
  * distinct per doc).
  */
object PrefixJoinProps extends Properties("PrefixFilterJoin") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  // small vocabulary forces real shingle overlap; near-clone docs
  // (shared prefix, one token appended) exercise the high-J regime
  // the threshold keeps
  private val docsGen: Gen[List[(Long, String)]] = for {
    base <- Gen.resize(6, Gen.nonEmptyListOf(for {
      id <- Gen.choose(0L, 1000L)
      n <- Gen.choose(1, 12)
      toks <- Gen.listOfN(n, Gen.oneOf((0 to 7).map(i => s"t$i")))
    } yield (id, toks.mkString(" "))))
    clones <- Gen.someOf(base)
  } yield (base ++ clones.map { case (id, t) => (id + 10000L, t + " t8") })
    .distinctBy(_._1)

  private val tauGen: Gen[Int] = Gen.choose(25, 95)

  private def shingleSet(text: String): Set[String] = {
    val w = text.split(" ")
    if (w.length < 3) Set.empty
    else w.sliding(3).map(_.mkString(" ")).toSet
  }

  private def brute(docs: List[(Long, String)], tauPct: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    val sh = docs.map { case (id, t) => id -> shingleSet(t) }
    (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      i = (sa & sb).size.toLong
      if i > 0 && i * 100 >= tauPct.toLong * (sa.size + sb.size - i)
    } yield (ia, ib, i, sa.size.toLong, sb.size.toLong)).toSet
  }

  property("equals brute-force all-pairs Jaccard for any corpus and threshold") =
    forAllNoShrink(docsGen, tauGen) { (docs, tau) =>
      import spark.implicits._
      val got = Dedup
        .prefixFilterPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
          shingleN = 3, tauPct = tau)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .toSet
      val want = brute(docs, tau)
      if (got != want)
        println(s"tau=$tau missing=${want -- got} extra=${got -- want}")
      got == want
    }

  // the shard decomposition must be invisible in the ANSWER: for any
  // corpus, threshold, AND shard count, the sequential shingle-family
  // passes reassemble exactly the brute-force pair set — no pair lost
  // to a shard boundary (the first shared rarity-ordered shingle's
  // pass always re-derives it) and none emitted twice (only that pass
  // keeps it)
  property("sharded join equals brute force for any corpus, threshold, and shard count") =
    forAllNoShrink(docsGen, tauGen, Gen.choose(1, 5)) { (docs, tau, shards) =>
      import spark.implicits._
      val got = Dedup
        .prefixFilterPairsSharded(docs.toDF("doc_id", "text"),
          "doc_id", "text", shingleN = 3, tauPct = tau, shards = shards)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .toSet
      val want = brute(docs, tau)
      if (got != want)
        println(s"sharded tau=$tau shards=$shards " +
          s"missing=${want -- got} extra=${got -- want}")
      got == want
    }

  property("AB join equals brute-force cross-corpus Jaccard for any split and threshold") =
    forAllNoShrink(docsGen, docsGen, tauGen) { (left, right, tau) =>
      import spark.implicits._
      // disjoint id spaces: offset the incoming side (caller contract)
      val inc = right.map { case (id, t) => (id + 100000L, t) }
      val got = Dedup
        .prefixFilterJoinAB(left.toDF("doc_id", "text"),
          inc.toDF("doc_id", "text"), "doc_id", "text",
          shingleN = 3, tauPct = tau)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .toSet
      val shI = left.map { case (id, t) => id -> shingleSet(t) }
      val shN = inc.map { case (id, t) => id -> shingleSet(t) }
      val want = (for {
        (ia, sa) <- shI; (ib, sb) <- shN
        i = (sa & sb).size.toLong
        if i > 0 && i * 100 >= tau.toLong * (sa.size + sb.size - i)
      } yield (ia, ib, i, sa.size.toLong, sb.size.toLong)).toSet
      if (got != want)
        println(s"AB tau=$tau missing=${want -- got} extra=${got -- want}")
      got == want
    }

  // the AB shard decomposition must be invisible too: for any two
  // corpora, threshold, and shard count, the sequential shingle-family
  // passes reassemble exactly the brute-force CROSS pair set — the
  // first-shared-shingle rule stays valid under the UNION rarity order
  // (the rarest shared shingle of a qualifying cross pair sits in both
  // prefixes, and only its shard emits the pair)
  property("AB sharded equals brute force for any corpora, threshold, and shard count") =
    forAllNoShrink(docsGen, docsGen, tauGen, Gen.choose(1, 5)) {
      (left, right, tau, shards) =>
        import spark.implicits._
        val inc = right.map { case (id, t) => (id + 100000L, t) }
        val got = Dedup
          .prefixFilterJoinABSharded(left.toDF("doc_id", "text"),
            inc.toDF("doc_id", "text"), "doc_id", "text",
            shingleN = 3, tauPct = tau, shards = shards)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4)))
          .toSet
        val shI = left.map { case (id, t) => id -> shingleSet(t) }
        val shN = inc.map { case (id, t) => id -> shingleSet(t) }
        val want = (for {
          (ia, sa) <- shI; (ib, sb) <- shN
          i = (sa & sb).size.toLong
          if i > 0 && i * 100 >= tau.toLong * (sa.size + sb.size - i)
        } yield (ia, ib, i, sa.size.toLong, sb.size.toLong)).toSet
        if (got != want)
          println(s"AB sharded tau=$tau shards=$shards " +
            s"missing=${want -- got} extra=${got -- want}")
        got == want
    }
}
