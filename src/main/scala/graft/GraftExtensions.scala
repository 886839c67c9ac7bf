package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineSim, DeflateRatio, DotProduct, MinHashSignature, PortableMinHashSig, PortableSimHashSig, RollingMinHash, SigMatchFraction, SimHash64, SortedCharShingles, SortedIntersectCount, SortedTokenShingles, SquaredDistance}

/** SparkSessionExtensions hook: registers graft's custom Catalyst
  * expressions as SQL functions, so the engine's sketching primitives
  * are usable from `spark.sql(...)` and from any SQL-speaking client,
  * not only the Column API. Activated by
  * `spark.sql.extensions=graft.GraftExtensions` (set by
  * [[GraftSession.builder]]; on a cluster, pass the same conf to
  * spark-submit).
  *
  *   - simhash64(tokens array<string>) -> bigint
  *   - minhash_signature(text string, k int, shingle int) -> array<bigint>
  *   - rolling_min_hash(text string, window int) -> bigint
  *   - vec_dot(a, b array<float|double>) -> double
  *   - vec_cosine(a, b array<float|double>) -> double
  *   - vec_sqdist(a, b array<float|double>) -> double
  *   - sig_match_fraction(a, b array<bigint>) -> double
  *   - portable_minhash_sig(text string) -> array<bigint>
  *   - portable_simhash(text string) -> bigint
  *   - sorted_char_shingles(text string, k int) -> array<string>
  *   - sorted_token_shingles(text string, n int) -> array<string>
  *   - sorted_intersect_count(a, b array<string>) -> bigint
  *   - deflate_ratio(text string) -> double
  *   - next_fit_bin(len bigint, capacity bigint) OVER (...) -> bigint
  *     (window aggregate — sequence-packing bin numbers)
  *   - wordpiece_tokens(text string) -> array<string> (built-in vocab;
  *     custom vocabs go through the Column API, where the vocab is a
  *     driver value — SQL literals are the wrong vehicle for 30k rows)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "simhash64(tokens)")
        SimHash64(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "minhash_signature(text, k, shingle)")
        MinHashSignature(
          children.head,
          intLit(children(1), "minhash_signature", "k"),
          intLit(children(2), "minhash_signature", "shingle"))
      }))
    def inject2(name: String, clazz: Class[_], make: (Expression, Expression) => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        (children: Seq[Expression]) => {
          require(children.size == 2, s"$name(a, b)")
          make(children.head, children(1))
        }))
    def inject1(name: String, clazz: Class[_], make: Expression => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        (children: Seq[Expression]) => {
          require(children.size == 1, s"$name(text)")
          make(children.head)
        }))
    inject2("vec_dot", classOf[DotProduct], DotProduct(_, _))
    // window function: registry resolution is the supported SQL path
    // for custom window aggregates (`next_fit_bin(len, cap) OVER
    // (PARTITION BY .. ORDER BY .. ROWS UNBOUNDED PRECEDING)`) — the
    // analyzer wires the frame from the function's own spec.
    inject2("next_fit_bin", classOf[graft.functions.NextFitBin],
      graft.functions.NextFitBin(_, _))
    inject2("vec_cosine", classOf[CosineSim], CosineSim(_, _))
    inject2("vec_sqdist", classOf[SquaredDistance], SquaredDistance(_, _))
    inject2("sig_match_fraction", classOf[SigMatchFraction], SigMatchFraction(_, _))
    inject2("sorted_intersect_count", classOf[SortedIntersectCount], SortedIntersectCount(_, _))
    ext.injectFunction((
      FunctionIdentifier("sorted_char_shingles"),
      new ExpressionInfo(classOf[SortedCharShingles].getName, "sorted_char_shingles"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "sorted_char_shingles(text, k)")
        SortedCharShingles(
          children.head, intLit(children(1), "sorted_char_shingles", "k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("sorted_token_shingles"),
      new ExpressionInfo(classOf[SortedTokenShingles].getName, "sorted_token_shingles"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "sorted_token_shingles(text, n)")
        SortedTokenShingles(
          children.head, intLit(children(1), "sorted_token_shingles", "n"))
      }))
    inject1("portable_minhash_sig", classOf[PortableMinHashSig], PortableMinHashSig(_))
    inject1("portable_simhash", classOf[PortableSimHashSig], PortableSimHashSig(_))
    inject1("deflate_ratio", classOf[DeflateRatio], DeflateRatio(_))
    inject1("wordpiece_tokens", classOf[graft.functions.WordPieceTokens],
      graft.functions.WordPieceTokens(_, graft.functions.WordPiece.DefaultVocab))
    ext.injectFunction((
      FunctionIdentifier("rolling_min_hash"),
      new ExpressionInfo(classOf[RollingMinHash].getName, "rolling_min_hash"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "rolling_min_hash(text, window)")
        RollingMinHash(
          children.head, intLit(children(1), "rolling_min_hash", "window"))
      }))
  }
}
