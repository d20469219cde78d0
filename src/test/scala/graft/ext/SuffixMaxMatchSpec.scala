package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Maximal repeated-substring lengths (TextOps.suffixMaxMatch):
  * a shared 12-token span yields the exact 12/11/10 decay from each
  * occurrence's start, identical documents saturate through the
  * count-shortcut path, and unique text emits nothing.
  */
class SuffixMaxMatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val span = (1 to 12).map(i => s"s$i").mkString(" ")

  test("a shared 12-token span decays 12/11/10 from each start") {
    val docs = Seq(
      (1L, s"x1 x2 x3 x4 x5 $span y1 y2 y3 y4 y5"),
      (2L, s"z1 z2 z3 $span w1 w2 w3 w4 w5 w6 w7 w8"))
      .toDF("doc_id", "text")
    val out = TextOps.suffixMaxMatch(docs, "doc_id", "text",
      minTokens = 10, maxCmp = 20)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 6L, 12L), (1L, 7L, 11L), (1L, 8L, 10L),
      (2L, 4L, 12L), (2L, 5L, 11L), (2L, 6L, 10L)))
  }

  test("identical documents saturate via the identical-twin shortcut") {
    val text = (1 to 15).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val out = TextOps.suffixMaxMatch(docs, "doc_id", "text",
      minTokens = 10, maxCmp = 20)
      .as[(Long, Long, Long)].collect().toSet
    val expected = (for (d <- Seq(1L, 2L); p <- 1L to 6L)
      yield (d, p, 15L - p + 1L)).toSet
    assert(out == expected)
  }

  test("unique text emits no spans") {
    val docs = Seq((1L, (1 to 30).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    assert(TextOps.suffixMaxMatch(docs, "doc_id", "text").count() == 0L)
  }

  test("match lengths cap at maxCmp") {
    val text = (1 to 40).map(i => s"c$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val out = TextOps.suffixMaxMatch(docs, "doc_id", "text",
      minTokens = 10, maxCmp = 20)
      .select("match_len").as[Long].collect()
    assert(out.max == 20L)
  }
}
