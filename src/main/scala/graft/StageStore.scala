package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Stage a FRAGMENTED store for maintenance pricing — the fixture
  * side of the isolated [[StoreMaintain]] scale points:
  *
  *   run_main.sh graft.StageStore sig    <sfDir> <path> [waves=16]
  *   run_main.sh graft.StageStore vector <sfDir> <path> [waves=16]
  *
  * Builds the store from wave 0 (every `waves`-th id) and appends
  * the remaining `waves − 1` slices one batch at a time — the same
  * daily-append history the q_bm25_frag_query ScaleBench staging
  * gives the BM25 store, reproduced for the signature and vector
  * stores so each store's maintenance tick gets its own measured
  * 100× point. Prints the resulting artifact inventory as JSON. */
object StageStore {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: StageStore <sig|vector> <sfDir> <path> [waves]")
    val (kind, sfDir, path) = (args(0), args(1), args(2))
    val waves = if (args.length > 3) args(3).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    kind match {
      case "sig" =>
        val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
        graft.ext.SignatureStore.build(
          docs.filter(pmod(col("doc_id"), lit(waves)) === 0),
          "doc_id", "text", path)
        (1 until waves).foreach { k =>
          graft.ext.SignatureStore.append(
            docs.filter(pmod(col("doc_id"), lit(waves)) === k),
            "doc_id", "text", path)
        }
      case "vector" =>
        val e = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
        val cands = e.filter(col("vec_id") >= 20)
        val stride = math.max(1L,
          math.floor(math.sqrt(cands.count().toDouble)).toLong)
        val cents = cands.filter(col("vec_id") % stride === 0)
        val res = graft.ext.Similarity
          .ivfResiduals(cands, cents, "vec_id", "embedding")
          .select(col("neighbor_id").as("vec_id"), col("__rv").as("embedding"))
        val cb = graft.ext.KMeans.codebook(
          graft.ext.KMeans.fit(res, "vec_id", "embedding",
            k = 256, numSub = 16, subDim = 4, iters = 4))
          .select(col("cid").as("vec_id"), col("vector").as("embedding"))
        graft.ext.VectorIndexStore.build(
          cands.filter(pmod(col("vec_id"), lit(waves)) === 0),
          "vec_id", "embedding", path, cents, cb, numSub = 16, subDim = 4)
        (1 until waves).foreach { k =>
          graft.ext.VectorIndexStore.append(
            cands.filter(pmod(col("vec_id"), lit(waves)) === k),
            "vec_id", "embedding", path)
        }
      case other => sys.error(s"unknown store kind: $other")
    }
    val arts = graft.ext.StoreMaintenance.artifactsOf(
      if (kind == "sig") "sig" else "vector", path).map(_.dir)
    graft.ext.StoreMaintenance.auditArtifacts(spark, arts)
      .collect().foreach { r =>
        println(s"""{"artifact":${StoreMaintain.jstr(r.getString(0))},""" +
          s""""n_files":${r.getLong(1)},"bytes":${r.getLong(2)},""" +
          s""""rows":${r.getLong(3)}}""")
      }
    spark.stop()
  }
}
