package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.ExtQueries

/** Iterated unigram-LM trainer: the shrink schedule is the pure
  * recurrence keep = max(target, m - max(1, m/5)), the loop stops at
  * the target, per-round vocab fingerprints are distinct (membership
  * really moves), and the run is deterministic.
  */
class UnigramTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run() = ExtQueries.unigramTrainQ(spark, "/root/testdata/sf0.001")
    .orderBy("round")
    .select("round", "n_multi_before", "n_multi_after", "n_dropped",
      "corpus_pieces", "vocab_fp")
    .as[(Long, Long, Long, Long, Long, String)].collect().toSeq

  test("shrink schedule matches the recurrence and stops at target") {
    val rows = run()
    var m = graft.catalyst.UnigramSegment.DefaultVocab
      .count(p => p._1.codePointCount(0, p._1.length) > 1).toLong
    rows.foreach { case (_, before, after, dropped, _, _) =>
      assert(before == m)
      val keep = math.max(12L, m - math.max(1L, m / 5))
      assert(after == keep)
      assert(dropped == before - after)
      m = keep
    }
    assert(rows.last._3 == 12L)
    assert(rows.map(_._1) == (1L to rows.size).toSeq)
  }

  test("each round's vocab membership actually changes") {
    val fps = run().map(_._6)
    assert(fps.distinct.size == fps.size)
  }

  test("is deterministic across runs") {
    assert(run() == run())
  }

  test("a custom target below the used-piece count forces longer " +
    "segmentations") {
    val docs = Seq((1L, ("the cat " * 50).trim)).toDF("doc_id", "text")
    val out = TextOps.unigramTrain(docs, "text",
      targetMulti = 0, maxRounds = 25)
      .orderBy("round")
      .select("n_multi_after", "corpus_pieces")
      .as[(Long, Long)].collect()
    assert(out.last._1 == 0L)
    // with every chunk gone, 'the' segments into 3 singles: the
    // final rounds' starting-vocab piece counts must exceed round 1's
    assert(out.last._2 > out.head._2)
  }
}
