package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** JSONL ingest contract: explicit schema (no inference pass),
  * PERMISSIVE null-row malformed handling, nested struct access. */
class JsonlCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fixture reads 203 lines: 200 schema-valid + 3 planted broken") {
    val df = JsonlCorpus.load(spark)
    assert(df.schema == JsonlCorpus.schema) // declared, not inferred
    assert(df.count() == 203)
    assert(df.filter(col("id").isNotNull).count() == 200)
    // broken lines are FULLY null rows, not partial records
    assert(df.filter(col("id").isNull && (col("lang").isNotNull ||
      col("text").isNotNull || col("meta").isNotNull)).count() == 0)
  }

  test("nested meta struct carries through and ids are the planted range") {
    val good = JsonlCorpus.load(spark).filter(col("id").isNotNull)
    val r = good.agg(min("id"), max("id"),
      sum(col("meta.stars")), countDistinct(col("meta.source"))).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 199L)
    assert(r.getLong(2) == 400L) // sum of id % 5 over 0..199
  }
}
