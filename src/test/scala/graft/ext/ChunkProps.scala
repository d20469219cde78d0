package graft.ext

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAllNoShrink

import graft.TestSpark

/** chunkDocs invariants, property-tested across random documents and
  * (chunkSize, overlap) knobs:
  *  - dropping each non-first chunk's `overlap`-token prefix and
  *    concatenating reconstructs the document exactly (no token lost,
  *    none duplicated outside the declared overlap);
  *  - every chunk is at most `chunkSize` tokens;
  *  - every chunk past the first starts exactly `stride` after its
  *    predecessor and contributes at least one new token (the
  *    degenerate-tail rule).
  */
object ChunkProps extends Properties("ChunkDocs") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val docsGen: Gen[List[(Long, String)]] =
    Gen.resize(8, Gen.nonEmptyListOf(for {
      id <- Gen.choose(0L, 1000000L)
      n <- Gen.choose(1, 200)
    } yield (id, (1 to n).map(i => s"w$i").mkString(" "))))
      .map(_.distinctBy(_._1))

  private val knobsGen: Gen[(Int, Int)] = for {
    size <- Gen.choose(1, 40)
    overlap <- Gen.choose(0, size - 1)
  } yield (size, overlap)

  property("overlap-dropped concatenation reconstructs every document") =
    forAllNoShrink(docsGen, knobsGen) { case (docs, (size, overlap)) =>
      import spark.implicits._
      val stride = size - overlap
      val out = TextOps.chunkDocs(docs.toDF("doc_id", "text"),
          "doc_id", "text", size, overlap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4)))
        .groupBy(_._1)
      val checks = docs.map { case (id, text) =>
        val chunks = out(id).sortBy(_._2)
        val rebuilt = chunks.zipWithIndex.map { case (c, i) =>
          val toks = c._5.split(" ")
          (if (i == 0) toks else toks.drop(overlap)).mkString(" ")
        }.filter(_.nonEmpty).mkString(" ")
        val sizesOk = chunks.forall(c => c._4 >= 1 && c._4 <= size &&
          c._4 == c._5.split(" ").length.toLong)
        val strideOk = chunks.sliding(2).forall {
          case Array(a, b) => b._3 == a._3 + stride
          case _ => true
        }
        val freshOk = chunks.zipWithIndex.forall { case (c, i) =>
          i == 0 || c._3 + c._4 - 1 > chunks(i - 1)._3 + chunks(i - 1)._4 - 1
        }
        Prop(rebuilt == text && sizesOk && strideOk && freshOk) :|
          s"doc=$id size=$size overlap=$overlap chunks=${chunks.length}"
      }
      Prop.all(checks: _*)
    }
}
