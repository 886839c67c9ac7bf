package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match WordPiece segmentation (the public WordPiece
  * algorithm: per whitespace word, repeatedly take the LONGEST vocab
  * piece matching at the cursor; continuation pieces carry the `##`
  * prefix; a word with no match at any cursor becomes one `[UNK]`).
  * All token-denominated operators previously counted whitespace
  * tokens only — undercounting subword-dense text (code, CJK,
  * concatenations) several-fold; this kernel supplies the real
  * counter, and the [[graft.operators.text.CorpusOps]] consumers
  * accept it via their token-source parameters.
  *
  * Determinism: longest-match over a duplicate-free vocab has exactly
  * one successor per cursor state, so segmentation is a pure function
  * of (word, vocab) — DuckDB re-derives it with a recursive CTE and
  * the whole piece stream is value-oracled (qt21).
  */
final class WordPieceVocab(pieces: Seq[String]) extends Serializable {

  private val first = new java.util.HashSet[String]()
  private val cont = new java.util.HashSet[String]()
  private var maxFirst = 1
  private var maxCont = 1
  pieces.distinct.foreach { p =>
    if (p.startsWith("##")) {
      val r = p.substring(2)
      cont.add(r)
      maxCont = math.max(maxCont, r.length)
    } else {
      first.add(p)
      maxFirst = math.max(maxFirst, p.length)
    }
  }

  private val unk = UTF8String.fromString("[UNK]")

  /** Greedy-segment one word into `out`; on any dead end the whole
    * word collapses to a single [UNK] (the standard WordPiece
    * convention). */
  private def segment(word: String, out: java.util.ArrayList[UTF8String]): Unit = {
    val mark = out.size()
    var pos = 0
    while (pos < word.length) {
      val isFirst = pos == 0
      val set = if (isFirst) first else cont
      var l = math.min(if (isFirst) maxFirst else maxCont, word.length - pos)
      var found: String = null
      while (l >= 1 && found == null) {
        val cand = word.substring(pos, pos + l)
        if (set.contains(cand)) found = cand
        l -= 1
      }
      if (found == null) {
        while (out.size() > mark) out.remove(out.size() - 1)
        out.add(unk)
        return
      }
      out.add(UTF8String.fromString(if (isFirst) found else "##" + found))
      pos += found.length
    }
  }

  /** Piece stream of a whole (already-normalized, single-spaced)
    * document. Called from codegen via an `addReferenceObj` handle —
    * the vocab is JVM-resident per task, never re-parsed per row. */
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

/** `array<string>` of WordPiece tokens of a normalized text column.
  * The vocab rides into generated code as a reference object (the
  * codegen analog of a broadcast: one JVM-wide instance, zero
  * per-row cost) — the same stays-in-WholeStageCodegen discipline as
  * [[SortedCharShingles]]. */
case class WordPieceTokens(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string arg, got ${child.dataType}")

  @transient private lazy val v = new WordPieceVocab(vocab)

  override def nullSafeEval(t: Any): Any = v.tokenize(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpVocab", v, classOf[WordPieceVocab].getName)
    defineCodeGen(ctx, ev, t => s"$ref.tokenize($t)")
  }

  override protected def withNewChildInternal(c: Expression): WordPieceTokens =
    copy(child = c)

  override def prettyName: String = "wordpiece_tokens"
}

object WordPiece {

  /** The built-in demonstration vocab: every ASCII letter/digit in raw
    * and `##` form (so alphanumeric words always segment; punctuated
    * words hit [UNK]) plus common English units and suffixes. A real
    * deployment swaps in its trained vocab — everything downstream is
    * vocab-agnostic. */
  val DefaultVocab: Seq[String] = {
    val chars = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    (chars ++ chars.map("##" + _) ++
      Seq("the", "and", "ing", "ion", "er", "ed", "es", "re", "th",
        "on", "in", "at", "or", "ti", "sing", "test") ++
      Seq("##ing", "##ion", "##er", "##ed", "##es", "##s", "##e", "##d",
        "##ly", "##on", "##at", "##ti", "##th")).distinct
  }

  /** WordPiece pieces of (already-normalized) text. */
  def tokens(text: Column, vocab: Seq[String] = DefaultVocab): Column =
    ColumnBridge.column(WordPieceTokens(ColumnBridge.expression(text), vocab))

  /** Subword token count — drop-in for
    * [[graft.operators.text.TextAnalysis.tokenCount]] wherever a
    * token-denominated operator takes a counter column. */
  def count(text: Column, vocab: Seq[String] = DefaultVocab): Column =
    org.apache.spark.sql.functions.size(tokens(text, vocab))

  /** The vocab as a DuckDB VALUES list (single-quoted, deduped). */
  private def vocabValues(vocab: Seq[String]): String =
    vocab.distinct.map(p => s"('${p.replace("'", "''")}')").mkString(",")

  /** Recursive-CTE rendition of the greedy longest-match over
    * `documents(doc_id, text)`, ending in CTE
    * `wp(doc_id, wi, wtoks, npieces, nunk)` — one row per word with
    * its space-joined pieces. Longest-match is expressed as a vocab
    * join filtered by NOT EXISTS any longer match; a word whose walk
    * dies before the end collapses to [UNK], mirroring
    * [[WordPieceVocab.segment]]. */
  def oracleCtes(vocab: Seq[String] = DefaultVocab): String =
    s"""vocab(piece, raw, is_cont) AS (
       |  SELECT DISTINCT piece,
       |         CASE WHEN piece LIKE '##%' THEN substring(piece, 3) ELSE piece END,
       |         piece LIKE '##%'
       |  FROM (VALUES ${vocabValues(vocab)}) v(piece)),
       |wpwords AS (
       |  SELECT doc_id, unnest(range(1, len(ws) + 1)) AS wi, ws AS wss
       |  FROM (SELECT doc_id,
       |               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
       |        FROM documents) t),
       |wpw AS (SELECT doc_id, wi, wss[wi] AS w FROM wpwords),
       |seg AS (
       |  SELECT doc_id, wi, w, 0 AS pos, CAST(NULL AS VARCHAR) AS piece, 0 AS step
       |  FROM wpw
       |  UNION ALL
       |  SELECT s.doc_id, s.wi, s.w, s.pos + len(v.raw), v.piece, s.step + 1
       |  FROM seg s JOIN vocab v
       |    ON v.is_cont = (s.pos > 0)
       |   AND substring(s.w, s.pos + 1, len(v.raw)) = v.raw
       |  WHERE s.pos < len(s.w)
       |    AND NOT EXISTS (
       |      SELECT 1 FROM vocab v2
       |      WHERE v2.is_cont = (s.pos > 0)
       |        AND substring(s.w, s.pos + 1, len(v2.raw)) = v2.raw
       |        AND len(v2.raw) > len(v.raw))),
       |wpagg AS (
       |  SELECT doc_id, wi, any_value(len(w)) AS wlen, max(pos) AS maxpos,
       |         string_agg(piece, ' ' ORDER BY step) FILTER (WHERE step > 0) AS pieces
       |  FROM seg GROUP BY doc_id, wi),
       |wp AS (
       |  SELECT doc_id, wi,
       |         CASE WHEN maxpos = wlen THEN pieces ELSE '[UNK]' END AS wtoks,
       |         CASE WHEN maxpos = wlen THEN len(string_split(pieces, ' ')) ELSE 1 END AS npieces,
       |         CASE WHEN maxpos = wlen THEN 0 ELSE 1 END AS nunk
       |  FROM wpagg)""".stripMargin

  /** The qt21 oracle: per-document piece count, [UNK] count, and the
    * md5 of the full space-joined piece stream — a value oracle over
    * every piece in order. */
  def oracleSql(vocab: Seq[String] = DefaultVocab): String =
    // COALESCEs: a document whose text normalizes to '' still yields
    // one ''-word row whose pieces/npieces are NULL — the Spark side
    // skips empty words entirely (0 pieces, md5 of ''), so the NULL
    // aggregates must land on the same 0/0/md5('') row
    s"""WITH RECURSIVE ${oracleCtes(vocab)}
       |SELECT doc_id,
       |       CAST(COALESCE(sum(npieces), 0) AS BIGINT) AS n_pieces,
       |       CAST(COALESCE(sum(nunk), 0) AS BIGINT) AS n_unk,
       |       md5(COALESCE(string_agg(wtoks, ' ' ORDER BY wi), '')) AS pieces_md5
       |FROM wp GROUP BY doc_id""".stripMargin
}
