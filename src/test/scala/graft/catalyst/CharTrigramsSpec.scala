package graft.catalyst

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the native expression value-identical to the composed Column
  * form it replaces (TextOps.charShingles at n = 3) on random strings
  * spanning ASCII, multi-byte, and supplementary code points, and the
  * distinct variant to array_distinct of the same. */
class CharTrigramsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val alphabet: IndexedSeq[String] =
    ("abc XYZ09.,!" .map(_.toString)) ++ Seq("é", "ü", "中", "文", "𝒜", "🙂")

  private def randomDocs(n: Int, seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (i.toLong,
      Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length)))
        .mkString))
  }

  test("equals the composed charShingles(_, 3) on mixed-plane strings") {
    CharTrigrams.register(spark)
    val df = randomDocs(300, 5).toDF("id", "s")
    val cmp = df.select(
        call_function("char_trigrams", col("s"), lit(false)).as("native"),
        graft.ext.TextOps.charShingles(col("s"), 3).as("composed"),
        call_function("char_trigrams", col("s"), lit(true)).as("nd"),
        array_distinct(graft.ext.TextOps.charShingles(col("s"), 3)).as("cd"))
      .collect()
    cmp.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
      assert(r.getSeq[String](2) === r.getSeq[String](3))
    }
  }

  test("fewer than 3 code points yields the empty array, incl. one astral pair") {
    CharTrigrams.register(spark)
    val got = Seq("", "a", "ab", "🙂🙂", "abc")
      .toDF("s")
      .select(col("s"), call_function("char_trigrams", col("s"), lit(false)))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("") === Seq.empty)
    assert(got("a") === Seq.empty)
    assert(got("ab") === Seq.empty)
    assert(got("🙂🙂") === Seq.empty) // 2 code points, 4 UTF-16 units
    assert(got("abc") === Seq("abc"))
  }
}
