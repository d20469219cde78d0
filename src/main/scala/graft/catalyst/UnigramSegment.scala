package graft.catalyst

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) Viterbi segmentation as a native
  * expression: whole document string in, the ARRAY of vocabulary
  * pieces out — every whitespace token independently segmented into
  * the score-maximal piece sequence. This is the OTHER half of the
  * tokenizer family next to [[BpeEncode]]: BPE encodes by a learned
  * merge order; the unigram model scores every segmentation by the
  * sum of per-piece log-probabilities and takes the argmax (Kudo
  * 2018, the SentencePiece default), which is what makes piece
  * probabilities prunable by their Viterbi usage counts
  * (TextOps.unigramPieceCounts is exactly that EM/pruning signal).
  *
  * DETERMINISTIC CONTRACT (what the DuckDB oracle re-derives): for
  * each token (maximal run between single-space splits, empties
  * skipped) choose, among ALL segmentations into vocab pieces and
  * single-code-point UNK fallbacks, the one that
  *   1. maximizes the total integer score (vocab pieces carry their
  *      scaled log-prob; any single code point absent from the vocab
  *      scores `unkScore`),
  *   2. ties → fewest pieces,
  *   3. remaining ties → lexicographically smallest piece sequence
  *      under UTF-8 BYTE order (element-wise; equal piece counts mean
  *      no prefix case arises).
  * Key 3 is well-defined under forward DP because key 2 fires first:
  * two prefixes tied on (score, count) have the same piece count, so
  * their lexicographic order is decided strictly inside the prefix
  * region and survives any shared continuation. UTF-8 byte order (=
  * code-point order) is the collation BOTH engines natively compare
  * strings by; Java's UTF-16 `compareTo` would diverge on
  * supplementary planes, so the comparator here goes through the
  * UTF8String bytes.
  *
  * Scale shape: per-row imperative projection, zero shuffle, rides
  * whole-stage codegen via a static call with the vocab attached as a
  * reference object (same pattern as [[BpeEncode]]'s merge table).
  * Per-token cost is O(len · maxPieceLen) cells; the rare
  * triple-tie path materializes two candidate prefix sequences via
  * parent pointers (O(len)) instead of carrying every cell's sequence
  * (O(len²) memory) — documents are bounded by the corpus schema, but
  * a pathological single "token" of megabytes would still only cost
  * the DP table, not the sequence cross-product.
  */
case class UnigramSegment(child: Expression,
                          vocab: Seq[(String, Long)] = UnigramSegment.DefaultVocab,
                          unkScore: Long = UnigramSegment.DefaultUnkScore)
    extends UnaryExpression {

  private lazy val table = new UnigramVocab(vocab, unkScore)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment requires STRING input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment"

  override def nullSafeEval(text: Any): Any =
    UnigramSegment.segment(text.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", table,
      classOf[UnigramVocab].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.catalyst.UnigramSegment.segment($t, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

/** Piece → score lookup keyed by string, plus the max piece length
  * that bounds the DP's inner loop. Scores are scaled integer
  * log-probs (negative; less negative = more probable). */
final class UnigramVocab(pieces: Seq[(String, Long)], val unkScore: Long)
    extends Serializable {
  require(pieces.nonEmpty, "empty vocab")
  require(pieces.map(_._1).distinct.length == pieces.length, "duplicate piece")
  require(pieces.forall(_._1.nonEmpty), "empty-string piece")

  private val map = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
  pieces.foreach { case (p, s) => map.put(p, s) }

  val maxLen: Int = pieces.map(p => p._1.codePointCount(0, p._1.length)).max

  /** Some(score) if the piece is in the vocab. */
  def score(piece: String): java.lang.Long = map.get(piece)
}

object UnigramSegment {

  val DefaultUnkScore: Long = -5000L

  /** A tiny hand-built unigram vocab: every printable ASCII code
    * point as a single-char piece (score -600 − (code mod 7), the
    * spread exercising the tie-break keys) plus common English
    * multi-char chunks priced below the sum of their singles so the
    * Viterbi path actually uses them. Deliberately fixed and public:
    * the correctness oracle inlines the SAME piece list, so both
    * engines segment from identical vocab. A deployment swaps in its
    * learned vocab via the expression's `vocab` parameter. */
  val DefaultVocab: Seq[(String, Long)] = {
    val singles = (33 to 126).map(c => (c.toChar.toString, -600L - (c % 7)))
    val chunks = Seq(
      "the" -> -1100L, "and" -> -1150L, "ing" -> -1150L, "ion" -> -1200L,
      "tion" -> -1500L, "ent" -> -1250L, "doc" -> -1200L, "ata" -> -1250L,
      "er" -> -800L, "re" -> -820L, "on" -> -810L, "at" -> -830L,
      "en" -> -840L, "an" -> -850L, "or" -> -860L, "es" -> -870L,
      "st" -> -880L, "le" -> -890L, "ou" -> -900L, "he" -> -910L,
      "in" -> -790L, "ed" -> -920L, "nd" -> -930L, "to" -> -940L,
      "it" -> -950L, "is" -> -960L, "te" -> -970L, "of" -> -980L,
      "10" -> -900L, "20" -> -910L)
    singles ++ chunks
  }

  /** UTF-8 byte order (= code-point order), the collation DuckDB and
    * Spark compare strings by. */
  private def utf8Compare(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  /** One DP cell: best (score, count) for the token prefix ending
    * here, with the parent cell + piece to re-materialize the
    * sequence on the rare full-tie path. */
  private final class Cell(val score: Long, val count: Int,
                           val parent: Int, val piece: String)

  private def seqOf(dp: Array[Cell], j: Int): List[String] = {
    var out = List.empty[String]
    var i = j
    while (i > 0) { out = dp(i).piece :: out; i = dp(i).parent }
    out
  }

  /** -1 if candidate (prev1, p1) beats (prev2, p2) under contract
    * key 3 (both already tied on score and count). */
  private def lexCompare(dp: Array[Cell], prev1: Int, p1: String,
                         prev2: Int, p2: String): Int = {
    val s1 = seqOf(dp, prev1) :+ p1
    val s2 = seqOf(dp, prev2) :+ p2
    val it1 = s1.iterator
    val it2 = s2.iterator
    while (it1.hasNext && it2.hasNext) {
      val c = utf8Compare(it1.next(), it2.next())
      if (c != 0) return c
    }
    0 // equal counts → equal lengths → sequences identical
  }

  /** Viterbi-segment ONE token (code-point array form). Appends the
    * winning piece sequence to `out`. */
  private def segmentToken(tok: String, table: UnigramVocab,
                           out: java.util.ArrayList[UTF8String]): Unit = {
    // code-point boundaries: cp(i) = UTF-16 offset of code point i
    val n = tok.codePointCount(0, tok.length)
    val cp = new Array[Int](n + 1)
    var o = 0
    var i = 0
    while (i < n) { cp(i) = o; o += Character.charCount(tok.codePointAt(o)); i += 1 }
    cp(n) = tok.length

    val dp = new Array[Cell](n + 1)
    dp(0) = new Cell(0L, 0, -1, null)
    var j = 1
    while (j <= n) {
      var best: Cell = null
      var l = 1
      val maxL = math.min(table.maxLen, j)
      while (l <= maxL) {
        val piece = tok.substring(cp(j - l), cp(j))
        val s = table.score(piece)
        val pieceScore =
          if (s != null) s.longValue
          else if (l == 1) table.unkScore
          else Long.MinValue // multi-char non-vocab: not a legal piece
        if (pieceScore != Long.MinValue) {
          val prev = dp(j - l)
          val cand = new Cell(prev.score + pieceScore, prev.count + 1, j - l, piece)
          val better =
            if (best == null) true
            else if (cand.score != best.score) cand.score > best.score
            else if (cand.count != best.count) cand.count < best.count
            else lexCompare(dp, cand.parent, cand.piece,
              best.parent, best.piece) < 0
          if (better) best = cand
        }
        l += 1
      }
      dp(j) = best // never null: l == 1 always yields a candidate
      j += 1
    }
    seqOf(dp, n).foreach(p => out.add(UTF8String.fromString(p)))
  }

  /** Shared by interpreted eval and generated code. */
  def segment(text: UTF8String, table: UnigramVocab): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val s = text.toString
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) segmentToken(s.substring(start, i), table, out)
        start = i + 1
      }
      i += 1
    }
    val arr = new Array[Any](out.size)
    var m = 0
    while (m < out.size) { arr(m) = out.get(m); m += 1 }
    new GenericArrayData(arr)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unigram_segment", exprs => UnigramSegment(exprs.head), "built-in")
}
