package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pruned semi-join — the build-side-sketch pattern for
  * "fact ⋈ filtered-dim" at 100 TB: hash the (filtered) dim keys into a
  * fixed bitmap, broadcast the bitmap as a literal, and drop fact rows
  * whose key cannot be in the dim BEFORE the fact ever shuffles. A
  * final exact left-semi join removes the bitmap's false positives, so
  * results are exactly the plain semi-join's — the bloom only moves
  * work off the wire. This is the explicit-operator form of Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` injection, usable when the
  * dim arrives from outside the plan (a catalog, a previous job).
  *
  * Scale posture: the bitmap build is one hash-agg over the dim
  * producing at most `numBits/64` (word, bits) rows; the driver collect
  * is bounded by the bitmap size (1<<20 bits = 128 KiB), the same
  * control-plane order as any broadcast hash join build side. The fact
  * side is touched only by a projection-level filter that rides the
  * scan — no UDFs, all codegen-friendly builtins.
  */
object BloomPrune {

  private def positions(key: Column, numBits: Int, numHashes: Int): Seq[Column] =
    (0 until numHashes).map { i =>
      // k independent hash functions from one xxhash64 by salting with
      // the hash index; pmod keeps positions in [0, numBits).
      pmod(xxhash64(key, lit(i)), lit(numBits.toLong))
    }

  /** Distributed bitmap build: explode each key into its k bit
    * positions, OR per 64-bit word, collect the (bounded) word list. */
  def buildBitmap(dim: DataFrame, keyCol: String, numBits: Int,
                  numHashes: Int): Seq[Long] = {
    require(numBits % 64 == 0, "numBits must be a multiple of 64")
    val words = dim
      .select(explode(array(positions(col(keyCol), numBits, numHashes): _*)).as("pos"))
      .distinct()
      .select(shiftright(col("pos"), 6).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("m"))
      .groupBy("w").agg(bit_or(col("m")).as("bits"))
      .collect()
    val out = Array.fill(numBits / 64)(0L)
    words.foreach(r => out(r.getInt(0)) = r.getLong(1))
    out.toSeq
  }

  /** Pure-builtin membership test against a literal bitmap: all k bit
    * positions must be set. False positives possible, negatives never. */
  def mightContain(words: Seq[Long], key: Column, numHashes: Int): Column = {
    val numBits = words.length * 64
    val arr = typedlit(words)
    positions(key, numBits, numHashes).map { pos =>
      val word = element_at(arr, shiftright(pos, 6).cast("int") + 1)
      call_function("shiftright", word, (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** fact ⋉ dim with bloom pre-pruning: bit-identical to the plain
    * left-semi join, but the fact side is filtered at the scan.
    *
    * EAGER: unlike the other (lazy) operators in this package, calling
    * this runs a Spark job immediately — [[buildBitmap]] collects the
    * (bounded, numBits/8 bytes) bitmap to the driver so it can be
    * inlined as a literal filter. Call it where an action is
    * acceptable. The dim key is internally aliased, so fact and dim
    * key columns may share a name without an ambiguous-reference
    * error. */
  def prunedSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                     dimKey: String, numBits: Int = 1 << 17,
                     numHashes: Int = 3, broadcastDim: Boolean = true): DataFrame = {
    val dk = Iterator.from(0).map(i => s"__dimkey$i")
      .find(n => !fact.columns.contains(n)).get
    val keys = dim.select(col(dimKey).as(dk))
    val words = buildBitmap(keys, dk, numBits, numHashes)
    // the exact pass removes false positives; broadcast when the dim
    // fits (the usual case for a filtered dim — else shuffle semi-join
    // over the already-pruned fact, still far cheaper than unpruned).
    val exact = if (broadcastDim) broadcast(keys) else keys
    fact.where(mightContain(words, col(factKey), numHashes))
      .join(exact, col(factKey) === col(dk), "left_semi")
  }
}
