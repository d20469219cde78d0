package graft.catalyst

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The Viterbi contract pinned three ways: hand-computed
  * segmentations on the default vocab, an exhaustive brute-force
  * enumeration on a tie-dense vocab (score desc, count asc, sequence
  * lex asc — the order the DuckDB oracle re-derives with one struct
  * sort), and the reconstruction/codegen paths through a real Spark
  * projection. */
class UnigramSegmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seg(table: UnigramVocab, text: String): Seq[String] = {
    val arr = UnigramSegment.segment(UTF8String.fromString(text), table)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  private val default =
    new UnigramVocab(UnigramSegment.DefaultVocab, UnigramSegment.DefaultUnkScore)

  test("hand-computed segmentations on the default vocab") {
    // 'tion' (-1500) beats t+ion (-604-1200) and ti+on (-970-810)
    assert(seg(default, "nation") === Seq("n", "at", "ion"))
    // -600-830-1200 = -2630 beats n+a+tion = -600-606-1500 = -2706
    assert(seg(default, "the cat") === Seq("the", "c", "at"))
    // é is not in the vocab: single-code-point UNK fallback
    assert(seg(default, "café") === Seq("c", "a", "f", "é"))
    // multiple spaces collapse; empty input yields no pieces
    assert(seg(default, "  a  b ") === Seq("a", "b"))
    assert(seg(default, "") === Seq.empty)
  }

  test("brute force: DP equals exhaustive enumeration on a tie-dense vocab") {
    // every multi-char piece scores exactly the sum of its singles, so
    // score ties are everywhere and the count/lex keys do real work;
    // 'c' is deliberately absent (UNK single)
    val vocab = Seq("a" -> -10L, "b" -> -10L, "ab" -> -20L, "ba" -> -20L,
      "aa" -> -20L, "aba" -> -30L, "bab" -> -30L, "bb" -> -25L)
    val unk = -35L
    val table = new UnigramVocab(vocab, unk)
    val vm = vocab.toMap

    def enumerate(tok: String): Seq[Seq[String]] =
      if (tok.isEmpty) Seq(Seq.empty)
      else (1 to math.min(4, tok.length)).flatMap { l =>
        val p = tok.substring(0, l)
        if (vm.contains(p) || l == 1)
          enumerate(tok.substring(l)).map(p +: _)
        else Seq.empty
      }

    def scoreOf(s: Seq[String]): Long =
      s.map(p => vm.getOrElse(p, unk)).sum

    val lexSeq = new Ordering[Seq[String]] {
      def compare(x: Seq[String], y: Seq[String]): Int =
        x.zip(y).iterator.map { case (a, b) => a.compareTo(b) }
          .find(_ != 0).getOrElse(x.length.compareTo(y.length))
    }
    val best = new Ordering[Seq[String]] {
      def compare(x: Seq[String], y: Seq[String]): Int = {
        val s = scoreOf(y).compareTo(scoreOf(x)) // score desc
        if (s != 0) s
        else {
          val c = x.length.compareTo(y.length) // count asc
          if (c != 0) c else lexSeq.compare(x, y)
        }
      }
    }

    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 400) {
      val tok = Seq.fill(1 + rnd.nextInt(9))("abc" (rnd.nextInt(3))).mkString
      val want = enumerate(tok).min(best)
      assert(seg(table, tok) === want, s"token '$tok'")
    }
  }

  test("spark projection: reconstruction + stats wrapper consistency") {
    UnigramSegment.register(spark)
    val rnd = new scala.util.Random(13)
    val docs = (1 to 60).map { i =>
      val words = Seq.fill(1 + rnd.nextInt(8))(
        Seq.fill(1 + rnd.nextInt(10))("theandingcafé!2" (rnd.nextInt(15))).mkString)
      (i.toLong, words.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = df.select(col("doc_id"), col("text"),
        call_function("unigram_segment", col("text")).as("p"))
      .collect()
    got.foreach { r =>
      // pieces concatenate back to the text modulo the spaces
      assert(r.getSeq[String](2).mkString ===
        r.getString(1).split(" ").filter(_.nonEmpty).mkString)
    }
    // the stats wrapper scores what the expression emitted
    val stats = graft.ext.TextOps.unigramStats(df, "doc_id", "text").collect()
    val vm = UnigramSegment.DefaultVocab.toMap
    val byId = got.map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    stats.foreach { r =>
      val p = byId(r.getLong(0))
      assert(r.getLong(1) === p.length)
      assert(r.getLong(2) === p.count(x => !vm.contains(x)))
      assert(r.getLong(3) ===
        p.map(x => vm.getOrElse(x, UnigramSegment.DefaultUnkScore)).sum)
    }
  }

  test("prune round: monotone piece counts, pruned pieces really gone") {
    UnigramSegment.register(spark)
    // 'the' lands 250 Viterbi uses (survives at 100); 'doc' lands 50
    // (pruned), as do the rarer bigram chunks
    val df = (1 to 50).map(i =>
        (i.toLong, s"the the the the doc-$i the value"))
      .toDF("doc_id", "text")
    val out = graft.ext.TextOps
      .unigramPruneRound(df, "doc_id", "text", minUses = 100L)
      .collect()
    assert(out.length === 50)
    // dropping vocab entries can only lengthen a Viterbi segmentation
    out.foreach(r => assert(r.getLong(2) >= r.getLong(1)))
    // 'doc' (100 uses < 200) was pruned, so every doc re-segments longer
    assert(out.forall(r => r.getLong(2) > r.getLong(1)))
    // the pruned expression is registered: spot-check it directly
    val p2 = df.limit(1).select(
      call_function("unigram_segment_pruned", col("text"))).collect()
    assert(!p2.head.getSeq[String](0).contains("doc"))
    assert(p2.head.getSeq[String](0).contains("the"))
  }

  test("piece counts are partitioning-invariant") {
    UnigramSegment.register(spark)
    val df = (1 to 40).map(i => (i.toLong, s"the nation doc-$i café"))
      .toDF("doc_id", "text")
    val a = graft.ext.TextOps.unigramPieceCounts(df, "doc_id", "text")
      .orderBy("piece").collect().toSeq
    val b = graft.ext.TextOps
      .unigramPieceCounts(df.repartition(7), "doc_id", "text")
      .orderBy("piece").collect().toSeq
    assert(a === b)
    // the UNK é surfaces as an out-of-vocab piece
    assert(a.exists(r => r.getString(0) == "é" && !r.getBoolean(3)))
  }
}
