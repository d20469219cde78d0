package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The copy-on-write merge must be invisible in the answer (the
  * post-merge view equals textbook MERGE semantics computed
  * independently) AND visible in the file plan (untouched files are
  * carried by reference — no output unit, left byte-identical on
  * disk; each rewrite unit emits exactly one file). */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs: DataFrame =
    graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text", "n_chars")

  private def stage(path: String): Unit =
    docs.repartitionByRange(8, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(path)

  private def batch: DataFrame =
    docs.filter(col("doc_id") % 13 === 0 && col("doc_id") % 19 =!= 0)
      .withColumn("text", concat(col("text"), lit(" upd")))
      .withColumn("_deleted", lit(false))
      .unionByName(docs.filter(col("doc_id") % 19 === 0)
        .withColumn("_deleted", lit(true)))
      .unionByName(docs.filter(col("doc_id") % 31 === 0)
        .select((col("doc_id") + 900000).as("doc_id"),
          col("text"), col("n_chars"))
        .withColumn("_deleted", lit(false)))

  /** Independent MERGE semantics: anti-join the batch's keys, union
    * the surviving batch rows. */
  private def expected(upd: DataFrame): Set[(Long, String, Long)] =
    docs.join(upd.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(upd.filter(!col("_deleted")).drop("_deleted"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private def rows(df: DataFrame): Set[(Long, String, Long)] =
    df.select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("post-merge view equals textbook MERGE semantics") {
    val src = "/tmp/graft_merge_spec1_src"
    val out = "/tmp/graft_merge_spec1_out"
    stage(src)
    val manifest = Merge.mergeInto(spark, src, out, batch, "doc_id")
    assert(rows(Merge.mergedView(spark, src, out, manifest))
      == expected(batch))
  }

  test("untouched files carry by reference and are never rewritten") {
    val src = "/tmp/graft_merge_spec2_src"
    val out = "/tmp/graft_merge_spec2_out"
    stage(src)
    // a batch confined to the low end of the key space: only the
    // file(s) whose footer range covers [0, 5] may rewrite
    val upd = docs.filter(col("doc_id") <= 5)
      .withColumn("text", concat(col("text"), lit(" low")))
      .withColumn("_deleted", lit(false))
    val before = Layout.listParquet(src)
      .map(p => p -> new java.io.File(p).lastModified()).toMap
    val manifest = Merge.mergeInto(spark, src, out, upd, "doc_id")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    val carries = manifest.filter(_._2 == "carry")
    val rewrites = manifest.filter(_._2 == "rewrite")
    assert(carries.length >= 6,
      s"a 6-key batch should carry most of 8 range files: $manifest")
    assert(rewrites.nonEmpty)
    // the output tree holds ONLY the batch unit + rewritten units,
    // one file each; sources are untouched on disk
    val outUnits = Layout.listParquet(out)
      .flatMap("unit=(\\d+)/".r.findFirstMatchIn(_).map(_.group(1).toLong))
    assert(outUnits.distinct.length == rewrites.length + 1)
    assert(outUnits.length == outUnits.distinct.length,
      "a rewrite unit emitted more than one file")
    Layout.listParquet(src).foreach { p =>
      assert(new java.io.File(p).lastModified() == before(p),
        s"source $p was modified")
    }
    // content still exact under the pruned plan
    val mdf = Merge.mergeInto(spark, src, out, upd, "doc_id")
    assert(rows(Merge.mergedView(spark, src, out, mdf)) == expected(upd))
  }

  test("manifest arithmetic: rewrites account for every matched key") {
    val src = "/tmp/graft_merge_spec3_src"
    val out = "/tmp/graft_merge_spec3_out"
    stage(src)
    val manifest = Merge.mergeInto(spark, src, out, batch, "doc_id")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    // per rewrite, rows_before − rows_after = keys the batch matched
    // in that file; summed over rewrites it must equal the batch's
    // matched-key count (updates + deletes of present keys)
    val removed = manifest.filter(_._2 == "rewrite")
      .map(m => m._3 - m._4).sum
    val matched = docs.join(batch.select("doc_id"), Seq("doc_id"),
      "left_semi").count()
    assert(removed == matched)
    // and the insert unit holds exactly the batch's survivors
    val ins = manifest.find(_._2 == "insert").get
    assert(ins._4 == batch.filter(!col("_deleted")).count())
    // conservation: Σ rows_after over ALL rows = merged table size
    assert(manifest.map(_._4).sum == expected(batch).size)
  }

  test("no touched files and no survivors: the merge is a complete no-op") {
    val src = "/tmp/graft_merge_spec5_src"
    val out = "/tmp/graft_merge_spec5_out"
    stage(src)
    // one delete of a key outside every footer range: nothing to
    // touch, nothing to insert — the written tree holds no parquet
    val upd = docs.limit(1)
      .select(lit(999999L).as("doc_id"), col("text"), col("n_chars"))
      .withColumn("_deleted", lit(true))
    val manifest = Merge.mergeInto(spark, src, out, upd, "doc_id")
    val acts = manifest.collect()
      .map(r => r.getString(1) -> r.getLong(3)).groupBy(_._1)
    assert(!acts.contains("rewrite"))
    assert(acts("insert").map(_._2).sum == 0L)
    assert(rows(Merge.mergedView(spark, src, out, manifest))
      == rows(docs))
  }

  test("deletes of absent keys are no-ops; empty-survivor batch still merges") {
    val src = "/tmp/graft_merge_spec4_src"
    val out = "/tmp/graft_merge_spec4_out"
    stage(src)
    val upd = docs.filter(col("doc_id") % 19 === 0)
      .withColumn("_deleted", lit(true))
      .unionByName(docs.limit(1)
        .select((col("doc_id") + 777000).as("doc_id"),
          col("text"), col("n_chars"))
        .withColumn("_deleted", lit(true)))
    val manifest = Merge.mergeInto(spark, src, out, upd, "doc_id")
    val got = rows(Merge.mergedView(spark, src, out, manifest))
    assert(got == expected(upd))
    assert(!got.exists(_._1 % 19 == 0))
  }
}
