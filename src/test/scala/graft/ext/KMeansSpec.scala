package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.ExtQueries
import graft.sources.Tables

/** Lloyd k-means trainer semantics: output shape, determinism,
  * empty-cell carry, codebook round-trip, that training actually
  * reduces encode distortion vs the round-7 first-16 stand-in, and
  * the recall bar the round-8 brief set (trained-PQ recall@3 ≥ 0.7
  * on the gate fixture).
  */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def cands = Tables.embeddings(spark, sf)
    .filter(col("vec_id") >= 20).select("vec_id", "embedding")

  test("fit emits k x numSub x subDim component rows with contiguous ids") {
    val fit = KMeans.fit(cands, "vec_id", "embedding",
      k = 8, numSub = 4, subDim = 16, iters = 2)
    val rows = fit.collect()
    assert(rows.length == 8 * 4 * 16)
    val cids = rows.map(_.getLong(1)).distinct.sorted
    assert(cids.sameElements(0L until 8L))
    val subs = rows.map(_.getLong(0)).distinct.sorted
    assert(subs.sameElements(0L until 4L))
    // every (sub, cid) carries one n_members figure; per subspace the
    // populations sum to the corpus size (every vector assigned)
    val n = cands.count()
    fit.groupBy("sub_id").agg(sum(col("n_members") / 16).as("tot"))
      .collect().foreach(r => assert(r.getDouble(1) == n.toDouble))
  }

  test("fit is deterministic across runs") {
    def run() = KMeans.fit(cands, "vec_id", "embedding",
      k = 8, numSub = 4, subDim = 16, iters = 2)
      .orderBy("sub_id", "cid", "dim_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(run() == run())
  }

  test("an emptied cell carries its previous position with n_members = 0") {
    // two tight clusters, k=4: the two seeds landing on duplicate
    // points collapse (ties assign to the smallest cid), so at least
    // one cell must end empty yet keep a centroid row
    // ids 1 and 2 share an identical vector and both land in the
    // 4-seed init (key order = id order here), so cids 0 and 1 start
    // identical; every point ties toward the smaller cid and cell 1
    // empties, carrying its seed position
    val df = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.0f, 0.0f)),
      (3L, Array(0.0f, 0.001f)), (4L, Array(1.0f, 1.0f)),
      (5L, Array(1.001f, 1.0f)), (6L, Array(1.0f, 1.001f)))
      .toDF("id", "vec")
    val fit = KMeans.fit(df, "id", "vec", k = 4, numSub = 1, subDim = 2,
      iters = 3)
    val perCell = fit.filter(col("dim_id") === 0)
      .select("cid", "n_members").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perCell.size == 4)
    assert(perCell.values.sum == 6L)
    assert(perCell.values.exists(_ == 0L), s"expected an empty cell: $perCell")
  }

  test("codebook rows concatenate sub-centroids in sub_id order, /scale") {
    val fit = KMeans.fit(cands, "vec_id", "embedding",
      k = 4, numSub = 4, subDim = 16, iters = 1)
    val cb = KMeans.codebook(fit).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(cb.size == 4 && cb.values.forall(_.length == 64))
    val comps = fit.collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2)) -> r.getLong(3))
      .toMap
    for (cid <- 0L until 4L; m <- 0L until 4L; i <- 0L until 16L)
      assert(cb(cid)((m * 16 + i).toInt) == comps((cid, m, i)) / 32768.0)
  }

  test("training beats the first-16 stand-in on total encode distortion") {
    def distortion(seeds: org.apache.spark.sql.DataFrame): Double =
      Similarity.pqEncode(cands, seeds, "vec_id", "embedding",
        numSub = 16, subDim = 4)
        .agg(sum("dist2")).collect()(0).getDouble(0)
    // same-size comparison at the gate config: 256 trained centroids
    // vs the first 256 raw candidate vectors as an untrained codebook
    val standIn = cands.filter(col("vec_id") < 20 + 256)
    val trained = KMeans.codebook(
      KMeans.fit(cands, "vec_id", "embedding",
        k = 256, numSub = 16, subDim = 4, iters = 4))
      .select(col("cid").as("vec_id"), col("vector").as("embedding"))
    val (s, t) = (distortion(standIn), distortion(trained))
    assert(t < s * 0.7, s"trained distortion $t not well below stand-in $s")
  }

  test("assignTo reproduces the fit's own final partition") {
    val fit = KMeans.fit(cands, "vec_id", "embedding",
      k = 8, numSub = 4, subDim = 16, iters = 2)
    val asg = KMeans.assignTo(cands, "vec_id", "embedding", fit,
      numSub = 4, subDim = 16)
    // per (sub_id, cid) population under assignTo == fit's n_members
    val fromFit = fit.filter(col("dim_id") === 0)
      .select("sub_id", "cid", "n_members").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val fromAsg = asg.groupBy("sub_id", "cid").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    fromFit.foreach { case (key, n) =>
      assert(fromAsg.getOrElse(key, 0L) == n, s"cell $key") }
  }

  test("assignTo matches a brute-force nearest-centroid argmin") {
    val fit = KMeans.fit(cands, "vec_id", "embedding",
      k = 6, numSub = 1, subDim = 64, iters = 2)
    val asg = KMeans.assignTo(cands, "vec_id", "embedding", fit,
      numSub = 1, subDim = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val cents = fit.collect()
      .groupBy(_.getLong(1))
      .map { case (cid, rows) =>
        cid -> rows.sortBy(_.getLong(2)).map(_.getLong(3)) }
    val vecs = cands.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * 32768.0 + 0.5).toLong))
    vecs.foreach { case (id, q) =>
      val best = cents.toSeq.map { case (cid, cv) =>
        (cv.zip(q).map { case (c, x) => (x - c) * (x - c) }.sum, cid)
      }.min
      assert(asg(id) == best._2, s"vec $id")
    }
  }

  test("trained-PQ recall@3 >= 0.7 on the gate fixture") {
    // the driver's correctness gate runs at sf0.01 — measure there
    val r = ExtQueries.pqRecall(spark, "/root/testdata/sf0.01")
      .agg(sum("n_hit").as("h"), sum("n_exact").as("e")).collect()(0)
    val recall = r.getLong(0).toDouble / r.getLong(1)
    assert(recall >= 0.7, s"recall@3 = $recall")
  }
}
