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
    assert(CosineSimilarity.compute(a, b) === expected)
  }

  test("zero vector yields NaN exactly like the HOF division") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val z = ArrayData.toArrayData(Array(0.0, 0.0))
    val v = ArrayData.toArrayData(Array(1.0, 2.0))
    assert(CosineSimilarity.compute(z, v).isNaN)
  }
}
