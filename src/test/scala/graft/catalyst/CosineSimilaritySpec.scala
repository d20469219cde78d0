package graft.catalyst

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ext.Similarity

/** The fused native cosine must be bit-identical to the HOF reference
  * composition — same sequential accumulation, so exactly equal, not
  * approximately.
  */
class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native cosine equals the HOF composition bit-for-bit on random vectors") {
    CosineSimilarity.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i.toLong,
        Seq.fill(64)(rnd.nextFloat() * 2 - 1),
        Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        Similarity.toDouble(col("a")).as("da"),
        Similarity.toDouble(col("b")).as("db"))
      .select(col("id"),
        call_function("graft_cosine", col("da"), col("db")).as("native"),
        Similarity.cosine(col("da"), col("db")).as("hof"))
    // bit-exact: compare raw double bits, not a tolerance
    val diff = df.filter(col("native") =!= col("hof")).count()
    assert(diff === 0)
  }

  test("interpreted eval matches the column path") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = ArrayData.toArrayData(Array(1.0, 2.0, 3.0))
    val b = ArrayData.toArrayData(Array(4.0, 5.0, 6.0))
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(CosineSimilarity.computeOrNull(a, b) === expected)
  }

  test("zero vector yields NaN exactly like the HOF division") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val z = ArrayData.toArrayData(Array(0.0, 0.0))
    val v = ArrayData.toArrayData(Array(1.0, 2.0))
    assert(CosineSimilarity.computeOrNull(z, v).isNaN)
  }

  test("mismatched lengths and null elements yield NULL, same as the HOF path") {
    CosineSimilarity.register(spark)
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (2L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),
      (3L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)))
      .toDF("id", "a", "b")
      .select(col("id"),
        call_function("graft_cosine", col("a"), col("b")).as("native"),
        Similarity.cosine(col("a"), col("b")).as("hof"))
    val rows = df.collect().map(r =>
      (r.getLong(0), r.isNullAt(1), r.isNullAt(2))).toSeq.sortBy(_._1)
    assert(rows === Seq((1L, true, true), (2L, true, true), (3L, false, false)),
      "native NULLs must match HOF NULLs exactly")
  }
}
