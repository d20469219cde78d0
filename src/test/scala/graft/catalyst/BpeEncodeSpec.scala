package graft.catalyst

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The merge loop against hand-computed encodings, the reconstruction
  * invariant (symbols concatenate back to the token), and the
  * closed-table guard.
  */
class BpeEncodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def encode(tokens: String*): Map[String, Seq[String]] = {
    BpeEncode.register(spark)
    tokens.toDF("tok")
      .select(col("tok"), call_function("bpe_encode", col("tok")).as("syms"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
      .toMap
  }

  test("hand-computed merges: rank order decides, compounds chain") {
    val got = encode("the", " the", "and", "standing", "xyz", "a", "")
    // t+h fires before h+e (rank 0 < 1), then th+e (rank 11)
    assert(got("the") === Seq("the"))
    // the leading space joins LAST ( ,the is rank 19)
    assert(got(" the") === Seq(" the"))
    assert(got("and") === Seq("and"))
    // st (16), an (4) + d (12) -> and, in (2) + g (13) -> ing
    assert(got("standing") === Seq("st", "and", "ing"))
    // no ranked pair at all: code points survive unmerged
    assert(got("xyz") === Seq("x", "y", "z"))
    assert(got("a") === Seq("a"))
    assert(got("") === Seq.empty)
  }

  test("leftmost non-overlapping occurrences merge together per round") {
    // i n i n i n: all three (i,n) pairs fuse in one round
    assert(encode("ininin")("ininin") === Seq("in", "in", "in"))
    // t h t h: both (t,h) occurrences fuse; th+th has no rank
    assert(encode("thth")("thth") === Seq("th", "th"))
  }

  test("reconstruction invariant: concatenated symbols equal the token") {
    BpeEncode.register(spark)
    val rnd = new scala.util.Random(11)
    val alpha = "thieran dsogul\n.?"
    val toks = (1 to 300).map(_ =>
      (1 to (1 + rnd.nextInt(12))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val bad = toks.toDF("tok")
      .select(col("tok"),
        array_join(call_function("bpe_encode", col("tok")), "").as("rejoined"))
      .filter(col("tok") =!= col("rejoined"))
      .count()
    assert(bad === 0)
  }

  test("merge table must be closed: a compound no earlier merge produces is rejected") {
    val ex = intercept[IllegalArgumentException] {
      new BpeTable(Seq(("t", "h"), ("he", "x")))
    }
    assert(ex.getMessage.contains("not closed"))
    // the valid chain is accepted
    new BpeTable(Seq(("t", "h"), ("th", "x")))
  }
}
