package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT equi-join output-cardinality preflight — the general-join
  * sibling of `ext.Dedup.pairMassPreflight` (which prices the
  * similarity self-join): before shuffling two 100 TB fact tables,
  * price the join from the key histograms alone.
  *
  * `|A ⋈ B| = Σ_k cntA(k)·cntB(k)` exactly, from two map-side-
  * combinable count aggregations over column-pruned single-key scans
  * plus a join of the (small) key-count tables — the payload columns
  * never move. The per-key products also expose WHERE the mass sits:
  * the heaviest keys and their output share are precisely the rows a
  * skew decision needs ([[Salting.saltedEquiJoin]]'s bucket knob, or
  * AQE's skew threshold), and an estimate dominated by one key says
  * "salt or re-model", not "add executors".
  *
  * Output: the `topN` heaviest keys by pair contribution, each with
  * both side counts, its pair count, the exact total, and its share
  * in ppm (integer DIV — engine-exact). Deterministic order:
  * (pairs desc, key asc), k-bounded TakeOrdered, no window.
  */
object JoinPreflight {
  def equiJoinMass(left: DataFrame, leftKey: String,
                   right: DataFrame, rightKey: String,
                   topN: Int = 5): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val ca = left.select(col(leftKey).as("key"))
      .groupBy("key").agg(count(lit(1)).as("n_left"))
    val cb = right.select(col(rightKey).as("key"))
      .groupBy("key").agg(count(lit(1)).as("n_right"))
    val pairs = ca.join(cb, "key")
      .select(col("key"), col("n_left"), col("n_right"),
        (col("n_left") * col("n_right")).as("pairs"))
    val total = pairs.agg(
      coalesce(sum("pairs"), lit(0L)).as("total_pairs"))
    pairs.crossJoin(broadcast(total))
      .withColumn("share_ppm",
        expr("(pairs * 1000000) DIV greatest(total_pairs, 1)"))
      .orderBy(col("pairs").desc, col("key").asc)
      .limit(topN)
  }
}
