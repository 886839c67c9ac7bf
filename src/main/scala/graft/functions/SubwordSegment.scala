package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Dynamic-programming subword segmentation kernels — the optimal-path
  * counterpart of [[WordPieceTokens]]'s greedy longest-match. Both
  * kernels run the same left-to-right Viterbi DP over each whitespace
  * word; they differ only in the path objective:
  *
  *  - [[MinSegVocab]] (integer-exact): fewest pieces, ties broken by
  *    larger total piece weight, then by longer piece at each position.
  *    Pure BIGINT arithmetic, so DuckDB re-derives the identical
  *    segmentation with a recursive-CTE rendition of the same DP
  *    (value oracle, qt41) — this is the "portable twin" of the
  *    float-scored unigram path, the same pattern as qd10/qd15 for
  *    MinHash.
  *  - [[UnigramVocab]] (log-prob): maximum total piece log-probability
  *    — the segmentation step of the public SentencePiece unigram LM
  *    (Kudo 2018); ties broken by longer piece. Double-scored, so it
  *    is exercised by the in-Spark training gate (qt42), not a
  *    cross-engine hash compare.
  *
  * DP semantics shared by both (and mirrored in the SQL oracle):
  * a position with no piece ending on it is UNREACHABLE; candidates
  * whose predecessor position is unreachable are skipped (a longer
  * piece can bridge over an uncovered char). A word whose final
  * position is unreachable yields NO pieces at all — the kernel emits
  * nothing for it, exactly as the oracle's walk drops the row.
  *
  * Scale: per-row, allocation-light (four small arrays per word),
  * stays inside whole-stage codegen via an `addReferenceObj` vocab
  * handle; no shuffle, no UDF.
  */
final class MinSegVocab(entries: Seq[(String, Long)], val maxLen: Int)
    extends Serializable {
  require(maxLen >= 1, s"bad maxLen $maxLen")

  private val weights = new java.util.HashMap[String, java.lang.Long]()
  entries.foreach { case (p, c) => if (p.nonEmpty) weights.put(p, c) }

  /** Append the optimal pieces of one word to `out`; no-op if the word
    * cannot be covered by the vocab. */
  private def segment(word: String, out: java.util.ArrayList[UTF8String]): Unit = {
    val n = word.length
    val nps = new Array[Long](n + 1) // min piece count to reach pos
    val css = new Array[Long](n + 1) // max weight sum at that count
    val bls = new Array[Int](n + 1)  // chosen piece length (0 = unreachable)
    var pos = 1
    while (pos <= n) {
      var bestNp = Long.MaxValue
      var bestCs = Long.MinValue
      var bestL = 0
      var l = math.min(maxLen, pos)
      while (l >= 1) {
        // predecessor must be reachable (pos - l == 0 is the start)
        if (pos - l == 0 || bls(pos - l) != 0) {
          val w = weights.get(word.substring(pos - l, pos))
          if (w != null) {
            val np = if (pos - l == 0) 1L else nps(pos - l) + 1L
            val cs = (if (pos - l == 0) 0L else css(pos - l)) + w.longValue()
            // (np asc, cs desc, l desc); l desc comes free: we scan l
            // downward and only replace on strict improvement
            if (np < bestNp || (np == bestNp && cs > bestCs)) {
              bestNp = np; bestCs = cs; bestL = l
            }
          }
        }
        l -= 1
      }
      nps(pos) = bestNp; css(pos) = bestCs; bls(pos) = bestL
      pos += 1
    }
    if (n > 0 && bls(n) != 0) appendWalk(word, bls, out)
  }

  private def appendWalk(
      word: String, bls: Array[Int], out: java.util.ArrayList[UTF8String]): Unit = {
    // backward walk collects piece lengths, then emit left-to-right
    var i = word.length
    var k = 0
    val lens = new Array[Int](word.length)
    while (i > 0) { lens(k) = bls(i); i -= bls(i); k += 1 }
    var j = k - 1
    var start = 0
    while (j >= 0) {
      out.add(UTF8String.fromString(word.substring(start, start + lens(j))))
      start += lens(j)
      j -= 1
    }
  }

  /** Piece stream of a whole (already-normalized, single-spaced)
    * document; empty and uncoverable words contribute nothing. */
  def tokenize(text: UTF8String): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val words = text.toString.split(" ", -1)
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) segment(words(i), out)
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}

/** `array<string>` of minimal-piece segmentation tokens — integer DP,
  * value-oracled cross-engine (qt41). */
case class MinSegTokens(child: Expression, entries: Seq[(String, Long)], maxLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string arg, got ${child.dataType}")

  @transient private lazy val v = new MinSegVocab(entries, maxLen)

  override def nullSafeEval(t: Any): Any = v.tokenize(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minsegVocab", v, classOf[MinSegVocab].getName)
    defineCodeGen(ctx, ev, t => s"$ref.tokenize($t)")
  }

  override protected def withNewChildInternal(c: Expression): MinSegTokens =
    copy(child = c)

  override def prettyName: String = "minseg_tokens"
}

/** Unigram-LM Viterbi vocab: pieces with log-prob scores; best-path
  * (max total score) segmentation, ties to the longer piece. */
final class UnigramVocab(entries: Seq[(String, Double)], val maxLen: Int)
    extends Serializable {
  require(maxLen >= 1, s"bad maxLen $maxLen")

  private val scores = new java.util.HashMap[String, java.lang.Double]()
  entries.foreach { case (p, s) => if (p.nonEmpty) scores.put(p, s) }

  private def segment(word: String, out: java.util.ArrayList[UTF8String]): Unit = {
    val n = word.length
    val dps = new Array[Double](n + 1)
    val bls = new Array[Int](n + 1)
    var pos = 1
    while (pos <= n) {
      var bestS = Double.NegativeInfinity
      var bestL = 0
      var l = math.min(maxLen, pos)
      while (l >= 1) {
        if (pos - l == 0 || bls(pos - l) != 0) {
          val s = scores.get(word.substring(pos - l, pos))
          if (s != null) {
            val d = (if (pos - l == 0) 0.0 else dps(pos - l)) + s.doubleValue()
            if (d > bestS) { bestS = d; bestL = l } // l desc free: downward scan
          }
        }
        l -= 1
      }
      dps(pos) = bestS; bls(pos) = bestL
      pos += 1
    }
    if (n > 0 && bls(n) != 0) {
      var i = n
      var k = 0
      val lens = new Array[Int](n)
      while (i > 0) { lens(k) = bls(i); i -= bls(i); k += 1 }
      var j = k - 1
      var start = 0
      while (j >= 0) {
        out.add(UTF8String.fromString(word.substring(start, start + lens(j))))
        start += lens(j)
        j -= 1
      }
    }
  }

  def tokenize(text: UTF8String): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val words = text.toString.split(" ", -1)
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) segment(words(i), out)
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}

/** `array<string>` of max-log-prob unigram segmentation tokens. */
case class UnigramTokens(child: Expression, entries: Seq[(String, Double)], maxLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string arg, got ${child.dataType}")

  @transient private lazy val v = new UnigramVocab(entries, maxLen)

  override def nullSafeEval(t: Any): Any = v.tokenize(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", v, classOf[UnigramVocab].getName)
    defineCodeGen(ctx, ev, t => s"$ref.tokenize($t)")
  }

  override protected def withNewChildInternal(c: Expression): UnigramTokens =
    copy(child = c)

  override def prettyName: String = "unigram_tokens"
}

object SubwordSegment {

  /** Minimal-piece DP tokens of (already-normalized) text. */
  def minsegTokens(text: Column, vocab: Seq[(String, Long)], maxLen: Int): Column =
    ColumnBridge.column(MinSegTokens(ColumnBridge.expression(text), vocab, maxLen))

  /** Max-log-prob unigram tokens of (already-normalized) text. */
  def unigramTokens(text: Column, vocab: Seq[(String, Double)], maxLen: Int): Column =
    ColumnBridge.column(UnigramTokens(ColumnBridge.expression(text), vocab, maxLen))
}
