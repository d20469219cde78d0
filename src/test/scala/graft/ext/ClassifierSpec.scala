package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** Linear quality-classifier semantics: feature shape, hard-sigmoid
  * clamping, training determinism, that the fit genuinely learns the
  * gate label (accuracy well above the majority baseline), and that
  * scoring under the fitted weights is a pure projection of the
  * trained model.
  */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def labeled = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"),
      when(col("n_chars") >= 306, 1L).otherwise(0L).as("label"))

  test("hashedFeatures: bias slot + bucket counts sum to token count") {
    val df = Seq((1L, "a b c d e")).toDF("id", "text")
      .select(Classifier.hashedFeatures(col("text"), 16, 32L).as("x"))
    val x = df.head().getSeq[Long](0)
    assert(x.length == 17)
    assert(x.head == 32L)               // bias gain
    assert(x.tail.sum == 5L)            // five tokens, all counted once
    assert(x.tail.forall(_ >= 0L))
  }

  test("hardSigmoid clamps to [0, scale] and is centered at z = 0") {
    val df = Seq(-1000000L, -2L, 0L, 2L, 1000000L).toDF("z")
      .select(col("z"), Classifier.hardSigmoid(col("z")).as("p"))
    val got = df.orderBy("z").collect().map(_.getLong(1)).toSeq
    // floor(-2/4) = -1 (floor, not truncate): 32768 - 1
    assert(got == Seq(0L, 32767L, 32768L, 32768L, 65536L))
  }

  test("fit is deterministic and learns the length label (acc >= 0.9)") {
    val w1 = Classifier.fit(labeled, "text", "label")
    val w2 = Classifier.fit(labeled, "text", "label")
    assert(w1.toSeq == w2.toSeq)
    val scored = Classifier.score(labeled, "text", w1.toIndexedSeq)
    val n = scored.count()
    val correct = scored.filter(col("keep") === col("label")).count()
    assert(correct.toDouble / n >= 0.9,
      s"train accuracy ${correct.toDouble / n} below 0.9")
    // the label is balanced enough that 0.9 beats majority-class
    val pos = labeled.filter(col("label") === 1).count()
    assert(math.max(pos, n - pos).toDouble / n < 0.9)
  }

  test("score preserves input columns and derives keep from p") {
    val w = Array.fill(17)(0L)
    val out = Classifier.score(labeled.limit(5), "text", w.toIndexedSeq)
    assert(out.columns.toSeq ==
      Seq("doc_id", "text", "label", "z", "p", "keep"))
    // zero weights: z = 0, p = scale/2, keep = 1 for every row
    out.collect().foreach { r =>
      assert(r.getAs[Long]("z") == 0L)
      assert(r.getAs[Long]("p") == 32768L)
      assert(r.getAs[Int]("keep") == 1)
    }
  }

  test("fit is invariant under partition layout") {
    // the gradient is a LONG sum — order-independent by construction;
    // this pins it: 1 partition and 32 partitions produce identical
    // weights (a float gradient loop would differ in the last ulps)
    val w1 = Classifier.fit(labeled.repartition(1), "text", "label",
      iters = 4)
    val w32 = Classifier.fit(labeled.repartition(32), "text", "label",
      iters = 4)
    assert(w1.toSeq == w32.toSeq)
  }

  test("fit rejects mis-sized scale and empty corpora") {
    intercept[IllegalArgumentException] {
      Classifier.fit(labeled, "text", "label", scale = 1L << 21)
    }
    intercept[IllegalArgumentException] {
      Classifier.fit(labeled.filter(col("doc_id") < 0), "text", "label")
    }
  }
}
