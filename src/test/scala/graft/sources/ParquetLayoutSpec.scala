package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Footer inventory against ground truth: per-file row sums equal the
  * table's count on both the single-file fixture and a multi-part
  * directory this spec writes itself. */
class ParquetLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("single fixture file: rows and columns match the data") {
    val path = "/root/testdata/sf0.001/documents.parquet"
    val layout = Layout.parquetLayout(spark, path).collect()
    assert(layout.nonEmpty)
    val total = layout.map(_.getLong(2)).sum
    assert(total === spark.read.parquet(path).count())
    // flat 5-column schema -> 5 leaf chunks per row group
    layout.foreach(r => assert(r.getLong(3) === 5L))
  }

  test("multi-part directory: every part appears, sums still match") {
    val dir = java.nio.file.Files.createTempDirectory("layoutspec").toString
    try {
      (1 to 1000).map(i => (i.toLong, s"row $i")).toDF("id", "s")
        .repartition(4).write.mode("overwrite").parquet(dir)
      val layout = Layout.parquetLayout(spark, dir)
        .collect()
      assert(layout.map(_.getString(0)).distinct.length === 4)
      assert(layout.map(_.getLong(2)).sum === 1000L)
      layout.foreach(r => assert(r.getLong(3) === 2L))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
