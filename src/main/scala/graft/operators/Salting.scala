package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4.2 / 100 TB posture). AQE's skew-join
  * splitting handles most cases at runtime; these helpers cover the
  * two shapes AQE can't: a skewed AGGREGATION key (one giant group
  * still lands on one task after AQE) and a skewed join where the
  * build side must be replicated per salt.
  *
  * All provided aggregates are associative (count / decimal-sum /
  * min / max), so the two-phase salted result is bit-identical to the
  * direct aggregation.
  */
object Salting {

  /** Deterministic salt in [0, buckets): hash of the caller-chosen
    * high-cardinality columns (NOT the group key — salting by the key
    * would put each group in one bucket again). */
  def salt(buckets: Int, saltSource: Column*): Column =
    pmod(hash(saltSource: _*), lit(buckets))

  /** Two-phase aggregation over a skewed group key: phase 1 aggregates
    * (key, salt) — splitting each giant group across `buckets` tasks —
    * phase 2 merges the partials per key. `aggs` maps output column
    * name → (phase1 agg of input, phase2 merge of partial). */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                saltSource: Seq[Column],
                aggs: Seq[(String, Column, Column => Column)]): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(buckets, saltSource: _*))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head._2.as(s"__p_${aggs.head._1}"),
        aggs.tail.map(a => a._2.as(s"__p_${a._1}")): _*)
    partial.groupBy(keys.map(col): _*)
      .agg(aggs.head._3(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map(a => a._3(col(s"__p_${a._1}")).as(a._1)): _*)
  }

  /** Skew-safe equi-join against a small (replicable) right side: the
    * left gets a deterministic salt, the right is replicated once per
    * salt bucket, and the join key becomes (keys, salt) — a single
    * hot key now spreads over `buckets` tasks. Results are identical
    * to the unsalted join because every right row exists for every
    * salt value. */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                     buckets: Int, saltSource: Seq[Column],
                     joinType: String = "inner"): DataFrame = {
    // right/full outer would emit each unmatched right row once per
    // salt replica — result-identity only holds for left-preserving
    // join types
    val allowed = Set("inner", "cross", "left", "leftouter",
      "semi", "leftsemi", "anti", "leftanti")
    require(allowed.contains(
        joinType.toLowerCase(java.util.Locale.ROOT).replace("_", "")),
      s"saltedEquiJoin does not support '$joinType': unmatched right rows " +
      "would duplicate once per salt replica")
    val saltedLeft = left.withColumn("__salt", salt(buckets, saltSource: _*))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** The MEASUREMENT that picks the salt knob: per-key row counts for
    * every key whose group exceeds `targetPerTask`, with the minimal
    * bucket count that brings its per-bucket share back under target —
    * `suggested_salt = ⌈cnt / target⌉` (exact for counts under 2^53
    * — see the ceil note below). Feed the max
    * over the report into [[saltedAgg]]/[[saltedEquiJoin]]'s `buckets`
    * (or fix the partitioning upstream); an empty report means the key
    * is safe unsalted.
    *
    * This is the same decide-from-data posture as the dedup/ANN
    * audits: salting by guesswork either under-splits (the hot task
    * still stalls the stage) or over-splits (buckets× replication of
    * the join's right side for nothing). One map-side-combinable
    * count agg at 100 TB — the cost of knowing. */
  def skewAudit(df: DataFrame, keys: Seq[String],
                targetPerTask: Long): DataFrame = {
    require(keys.nonEmpty && targetPerTask > 0)
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > targetPerTask)
      // ceil via floor-of-double division: exact while cnt stays
      // under 2^53 per key (row counts — unreachable in practice)
      .withColumn("suggested_salt",
        floor((col("cnt") + targetPerTask - 1) / targetPerTask))
  }
}
