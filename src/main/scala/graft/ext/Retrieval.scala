package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse (lexical) retrieval + hybrid rank fusion — the BM25 /
  * reciprocal-rank-fusion half of a production search stack, beside
  * the dense ANN family in [[Similarity]]. A training-data pipeline
  * uses this for decontamination lookups, targeted corpus probes, and
  * the lexical leg of hybrid retrieval-augmented mining.
  *
  * Number policy (same as TextOps.lmSurprisal): everything is BIGINT.
  * BM25's idf is quantized through the integer bit length —
  * `length(bin(x))` = floor(log2 x)+1 is exact in every engine where
  * a float `ln` is correctly rounded in none — and the tf saturation
  * term, a rational with known denominator, is carried in fixed point
  * via one integral division. Scores are sums of integer products, so
  * grouped aggregation is order-independent and the DuckDB oracle
  * matches bit-for-bit.
  *
  * Scale shape: the corpus-sized work — posting build (one explode +
  * map-side-combinable (tok, doc) count) and the score join — rides
  * the TOKEN key; the vocabulary is never broadcast (a 100 TB corpus
  * vocabulary fits no driver). The query set is small and broadcasts
  * on its own under AQE. Per-query top-k is a window over each
  * query's scored postings union — bounded by Σ_t df(t) rows per
  * query, the classic inverted-index cost, NOT corpus×queries.
  */
object Retrieval {

  private def bits(x: Column): Column = length(bin(x))

  /** Posting lists with per-doc length: (tok, id, tf, dl). One explode
    * + one map-side-combinable count; dl rides along as max(dl) since
    * it is functionally dependent on the doc. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

  /** BM25 top-k in exact integer form (k1 = 3/2, b = 3/4 — the
    * standard 1.5/0.75 as true rationals, not floats).
    *
    * Per (query term t, doc d):
    *   idf_bits(t)  = max(0, bitlen(2(N−df)+1) − bitlen(2·df+1))
    *                  — Robertson's odds idf in whole bits, clamped
    *                  non-negative (Lucene's convention);
    *   tf_part(d,t) = (2^10 · (k1+1) · tf) / (tf + k1(1−b+b·dl/avgdl))
    *                  with avgdl = T/N multiplied through:
    *                = (20480·T·tf) div (8·T·tf + 3·T + 9·dl·N)
    *                  ∈ [0, 2560], one integral division;
    *   score(q,d)   = Σ_{t ∈ distinct terms of q} idf_bits·tf_part.
    *
    * The div keeps everything in the BIGINT domain; the numerator
    * 20480·T·tf bounds exactness at T·tf < 2^49 ≈ 5.6e14 total corpus
    * tokens × within-doc tf — beyond that a production deployment
    * divides both sides by N first (avgdl in fixed point) at the cost
    * of one more quantization, which this gate-exact form avoids.
    *
    * `queries`: (queryIdCol, termsCol: array<string>); duplicate terms
    * inside one query collapse (standard BM25 query-term semantics).
    * Returns (query_id, doc id, rank, score_q) — rank by score desc,
    * id asc; score_q is the integer score, observable so the
    * quantization is auditable. */
  def bm25TopK(queries: DataFrame, queryIdCol: String, termsCol: String,
               corpus: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    val post = postings(corpus, idCol, textCol)
    val dfreq = post.groupBy("tok").agg(count(lit(1)).as("__df"))
    val tot = post.groupBy(col(idCol)).agg(max("dl").as("__dl"))
      .agg(count(lit(1)).as("__n"), sum("__dl").as("__t"))
    val qterms = queries
      .select(col(queryIdCol).as("query_id"),
        explode(col(termsCol)).as("tok"))
      .distinct()
    bm25FromPostings(qterms, post, dfreq, tot, idCol, k)
  }

  /** The scoring stage of [[bm25TopK]], factored out so the persisted
    * inverted index ([[RetrievalIndexStore]]) can run the IDENTICAL
    * integer-exact chain over a pruned postings scan (the stored
    * route's df/totals are exact for every query token, so the two
    * routes are bit-equal — spec-pinned).
    *
    * `qterms`: (query_id, tok), duplicates already collapsed;
    * `post`: (tok, idCol, tf, dl); `dfreq`: (tok, __df);
    * `tot`: ONE row (__n, __t) — broadcast here. */
  def bm25FromPostings(qterms: DataFrame, post: DataFrame,
                       dfreq: DataFrame, tot: DataFrame,
                       idCol: String, k: Int): DataFrame = {
    val idf = greatest(lit(0L),
      bits((lit(2L) * (col("__n") - col("__df"))) + 1L)
        - bits(lit(2L) * col("__df") + 1L))
    val tfPart = expr(
      "(20480 * __t * tf) div (8 * __t * tf + 3 * __t + 9 * dl * __n)")
    val scored = qterms
      .join(post, "tok")
      .join(dfreq, "tok")
      .crossJoin(broadcast(tot))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(idf * tfPart).cast("long").as("score_q"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_q").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("rank"), col("score_q"))
  }

  /** Positional posting lists: (id, pos, tok) — the index layout that
    * upgrades term retrieval to phrase/proximity retrieval. Pure
    * posexplode; inherits scan partitioning. */
  def positionalPostings(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs.select(col(idCol),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "tok")))

  /** Exact-phrase top-k over [[positionalPostings]]: a 2-term phrase
    * matches where its terms sit at adjacent positions, score =
    * occurrence count (phrase tf), rank by tf desc / id asc — the
    * positional-index adjacency join every search engine runs for
    * quoted queries, and the decontamination probe for verbatim
    * phrase leakage.
    *
    * Scale shape: postings are pruned to the query TERM SET first —
    * the query side is tiny and broadcasts, so the corpus-sized
    * posting stream shrinks to matching-term rows before any
    * shuffle; the adjacency join then rides the (doc, position) key.
    * Counts are integers; no floats anywhere. */
  def phraseTopK(queries: DataFrame, queryIdCol: String, t1Col: String,
                 t2Col: String, corpus: DataFrame, idCol: String,
                 textCol: String, k: Int): DataFrame =
    phraseFromPostings(queries, queryIdCol, t1Col, t2Col,
      positionalPostings(corpus, idCol, textCol), idCol, k)

  /** The adjacency-join + ranking stage of [[phraseTopK]], factored
    * out so the persisted positional index
    * ([[RetrievalIndexStore.phraseQuery]]) can run the IDENTICAL
    * chain over a bucket-pruned positional-postings scan. `post` may
    * be pre-pruned to any superset of the queries' term rows — both
    * posting references filter on the query terms, so pruning is
    * invisible in the answer (spec-pinned). */
  def phraseFromPostings(queries: DataFrame, queryIdCol: String,
                         t1Col: String, t2Col: String, post: DataFrame,
                         idCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"),
      col(t1Col).as("__t1"), col(t2Col).as("__t2")))
    val p1 = q.join(post, post("tok") === col("__t1"))
      .select(col("query_id"), col("__t2"), col(idCol), col("pos"))
    // renamed projection, not an alias: the two posting references
    // share lineage and an `.as` self-join would be ambiguous
    val p2 = post.select(col(idCol).as("__id2"), col("pos").as("__pos2"),
      col("tok").as("__tok2"))
    val hits = p1.join(p2,
        col("__id2") === col(idCol) && col("__pos2") === col("pos") + 1 &&
          col("__tok2") === col("__t2"))
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("phrase_tf"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("phrase_tf").desc, col(idCol).asc)
    hits.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("rank"), col("phrase_tf"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher SIGIR'09) of
    * N rankers over the same (query_id, neighbor_id) space, in exact
    * integer form: contribution of a rank-r hit = `scale div
    * (rrfK + r)` (the paper's 1/(60+r) carried in fixed point — one
    * integral division of constants, identical in every engine), fused
    * score = the sum over rankers, fused rank by score desc, id asc.
    *
    * Input frames each carry (query_id, neighbor_id, rank); a
    * candidate absent from one ranker's list simply contributes
    * nothing (the union-groupBy encodes the Σ over "lists containing
    * d" directly). Scale shape: the ranker outputs are already top-R
    * — tiny per query — so fusion is one union + one
    * map-side-combinable agg + one bounded window. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60,
              scale: Long = 1000000L): DataFrame = {
    val contrib = rankings
      .map(_.select(col("query_id"), col("neighbor_id"),
        expr(s"$scale div ($rrfK + rank)").as("__c")))
      .reduce(_ unionByName _)
    val fused = contrib.groupBy("query_id", "neighbor_id")
      .agg(sum("__c").cast("long").as("rrf_score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_score").desc, col("neighbor_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "rrf_score")
  }
}
