package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scale-up evidence harness: materializes a deterministic FACTOR×
  * copy of the scaling tables (documents / embeddings / events) from
  * a base sf dir, then times the dedup / ANN / text / streaming
  * headliners on base vs scaled and prints the ratio table recorded
  * in BASELINE.md. A structure-preserving scale-up, not noise:
  *
  *  - documents: copy k offsets doc_id by k·10⁶; k>0 appends a short
  *    variant marker to the text (n_chars recomputed), so every base
  *    doc becomes a 10-clique of near-duplicates — the WORST case for
  *    MinHash/LSH and clustering (maximum candidate-pair pressure),
  *    not the easiest;
  *  - embeddings: vec_id offset; k>0 perturbs the first component by
  *    k·0.001 — near-identical vectors land in the same LSH/IVF
  *    buckets, again maximizing bucket-join load;
  *  - events: user_id offset per copy, timestamps unchanged — 10× the
  *    keys and rows in the same watermark window, so streaming state
  *    grows 10× rather than the timeline stretching.
  *
  * Each timed query runs once untimed (plan/codegen warm) then once
  * timed through the noop sink, same as Bench. Linear-ish ratios
  * (≈ factor, modulo fixed per-query overhead) are the pass
  * criterion; super-linear blowups flag a shape that would not
  * survive 100 TB.
  */
object ScaleBench {

  val Headliners: Seq[String] = Seq(
    "q_dedup_exact", "q_dedup_minhash_lsh", "q_dedup_clusters",
    "q_ngram_jaccard", "q_line_dedup", "q_simhash", "q_training_prep",
    "q_cosine_topk", "q_ann_topk", "q_ann_multiprobe", "q_ivf_topk",
    "q_embed_neardup", "q_tfidf", "q_bpe_merges",
    // round-5 additions over the scaling tables: blocked/banded pair
    // generators (the shapes whose worst case is quadratic), the CMS
    // build, frame sampling, and the batch sessionizer's keyed window
    "q_edit_distance", "q_simhash_pairs", "q_cms_frequency",
    "q_multimodal_frames", "q_batch_sessions",
    "q_stream_tumbling", "q_custom_sessions", "q_stream_dedup")

  def buildScaled(spark: SparkSession, baseDir: String, outDir: String,
                  factor: Int): Unit = {
    def copies(k: Int): (DataFrame, DataFrame, DataFrame) = {
      val off = k.toLong * 1000000L
      val docs = Tables.documents(spark, baseDir).select(
        (col("doc_id") + lit(off)).as("doc_id"),
        (if (k == 0) col("text")
         else concat(col("text"), lit(s" v$k"))).as("text"),
        col("lang"), col("source"),
        (if (k == 0) col("n_chars")
         else col("n_chars") + lit(s" v$k".length.toLong)).as("n_chars"))
      val embs = Tables.embeddings(spark, baseDir).select(
        (col("vec_id") + lit(off)).as("vec_id"),
        (if (k == 0) col("embedding")
         else concat(
           array((element_at(col("embedding"), 1) + lit(k * 0.001f))
             .cast("float")),
           slice(col("embedding"), 2, 1000000))).as("embedding"),
        col("label"))
      val evts = Tables.events(spark, baseDir).select(
        (col("event_id") + lit(off)).as("event_id"), col("ts"),
        (col("user_id") + lit(off)).as("user_id"),
        col("event_type"), col("value"), col("props"))
      (docs, embs, evts)
    }
    val all = (0 until factor).map(copies)
    def write(df: DataFrame, name: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")
    write(all.map(_._1).reduce(_ unionByName _), "documents")
    write(all.map(_._2).reduce(_ unionByName _), "embeddings")
    write(all.map(_._3).reduce(_ unionByName _), "events")
  }

  private def time(spark: SparkSession, name: String, dir: String): Double = {
    val fn = SparkEntry.queries(name)
    fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
    val t0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_scale10"
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$outDir/documents.parquet"))) {
      buildScaled(spark, baseDir, outDir, factor)
    }

    println(f"${"query"}%-22s ${"base(s)"}%9s ${"x$factor(s)"}%9s ratio")
    val rows = Headliners.map { q =>
      val tBase = time(spark, q, baseDir)
      val tBig = time(spark, q, outDir)
      println(f"$q%-22s $tBase%9.2f $tBig%9.2f ${tBig / tBase}%5.1f")
      (q, tBase, tBig)
    }
    val json = rows.map { case (q, a, b) =>
      f""""$q":[$a%.2f,$b%.2f]""" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("scale_out.json"),
      s"""{"factor":$factor,"base":"$baseDir","queries":$json}\n""")
    spark.stop()
  }
}
