package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextOps
import graft.operators.text.CorpusOps

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def pieces(text: String, vocab: Seq[String] = WordPiece.DefaultVocab): Seq[String] =
    Seq(text).toDF("t")
      .select(WordPiece.tokens(TextOps.normalized(col("t")), vocab).as("p"))
      .as[Seq[String]].head()

  test("greedy longest-match picks the longest piece at each cursor") {
    assert(pieces("the singer") == Seq("the", "sing", "##er"))
    assert(pieces("testing") == Seq("test", "##ing"))
    // 'loudly': no multi-char raw prefix -> chars, then ##ly beats ##l
    assert(pieces("loudly") == Seq("l", "##o", "##u", "##d", "##ly"))
  }

  test("a word with any unmatchable cursor collapses to [UNK]") {
    assert(pieces("sang,") == Seq("[UNK]"))
    assert(pieces("ok sang, ok") == Seq("o", "##k", "[UNK]", "o", "##k"))
    // non-ascii chars are outside the demo vocab
    assert(pieces("café") == Seq("[UNK]"))
  }

  test("digits segment via the char vocab") {
    assert(pieces("a1 23") == Seq("a", "##1", "2", "##3"))
  }

  test("duplicate vocab entries do not duplicate pieces") {
    val dup = WordPiece.DefaultVocab ++ Seq("##d", "##ly", "the")
    assert(pieces("loudly the", dup) == Seq("l", "##o", "##u", "##d", "##ly", "the"))
  }

  test("count is a drop-in token counter for CorpusOps consumers") {
    val docs = Seq((1L, "the singer"), (2L, "testing loudly")).toDF("id", "text")
    val wp = WordPiece.tokens(TextOps.normalized(col("text")))
    // chunk on subword tokens: doc 2 has 7 pieces -> chunks at 1, 5
    val chunks = CorpusOps
      .chunkTokens(docs, col("text"), col("id"), maxTokens = 4, stride = 4,
        tokens = Some(wp))
      .filter(col("id") === 2L)
      .select("chunk_start", "chunk_tokens").as[(Int, Int)].collect().sorted
    assert(chunks.toSeq == Seq((1, 4), (5, 3)), s"got ${chunks.toSeq}")
    // oov profile over the subword stream sees pieces, not words
    val oov = CorpusOps
      .oovProfile(docs, col("text"), col("id"), vocabSize = 100,
        tokens = Some(wp))
      .select(col("id"), col("n_tokens")).as[(Long, Long)].collect().toMap
    assert(oov(1L) == 3L && oov(2L) == 7L, s"got $oov")
  }
}
