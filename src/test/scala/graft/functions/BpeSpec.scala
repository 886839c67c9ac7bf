package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextOps
import graft.operators.text.CorpusOps

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def toks(text: String,
      merges: Seq[(String, String)] = Bpe.DefaultMerges): Seq[String] =
    Seq(text).toDF("t")
      .select(Bpe.tokens(TextOps.normalized(col("t")), merges).as("p"))
      .as[Seq[String]].head()

  test("merges apply in rank order, leftmost first on ties") {
    // "the": t+h (rank 0) -> th, then th+e (rank 1) -> the
    assert(toks("the") == Seq("the"))
    // "thth": t+h fires leftmost first, then the second occurrence
    assert(toks("thth") == Seq("th", "th"))
    // chained ranks: o+n -> on, t+i -> ti, ti+on -> tion
    assert(toks("nation") == Seq("n", "at", "i", "on"))
    assert(toks("tion") == Seq("tion"))
  }

  test("unmergeable text stays at character tokens") {
    assert(toks("xyz") == Seq("x", "y", "z"))
    assert(toks("a b") == Seq("a", "b"))
  }

  test("rank order matters: lower rank beats longer merge chains") {
    // "ing": i+n (rank 2) fires before any alternative; then in+g
    assert(toks("ing") == Seq("ing"))
    assert(toks("sting") == Seq("st", "ing"))
  }

  test("duplicate merge entries keep the first rank") {
    val dup = Bpe.DefaultMerges ++ Seq(("t", "h"), ("x", "y"))
    assert(toks("the xy", dup) == Seq("the", "xy"))
  }

  test("empty and whitespace-only text tokenize to nothing") {
    assert(toks("") == Seq.empty)
    assert(toks("   ") == Seq.empty)
  }

  test("count is a drop-in token counter for CorpusOps consumers") {
    val docs = Seq((1L, "the nation"), (2L, "testing a b c")).toDF("id", "text")
    val bpe = Bpe.tokens(TextOps.normalized(col("text")))
    // doc 2: "testing" -> t,es,ting? verify via the counter itself
    val n = docs.select(col("id"), size(bpe).as("n")).as[(Long, Int)].collect().toMap
    assert(n(1L) == toks("the nation").length)
    assert(n(2L) == toks("testing a b c").length)
    // chunking on BPE tokens covers every token exactly once at stride = max
    val chunks = CorpusOps
      .chunkTokens(docs, col("text"), col("id"), maxTokens = 3, stride = 3,
        tokens = Some(bpe))
      .groupBy("id").agg(sum("chunk_tokens").as("tot"))
      .as[(Long, Long)].collect().toMap
    assert(chunks(1L) == n(1L) && chunks(2L) == n(2L), s"got $chunks vs $n")
    // temperature mixing accepts the BPE counter as its token source
    val mixed = CorpusOps.temperatureMix(
      docs, col("text"), col("id"), lit("s"),
      budgetTokens = 100L, alpha = 0.5,
      tokenCount = Some(Bpe.count(TextOps.normalized(col("text")))))
    assert(mixed.count() == 2, "tiny corpus under budget must keep everything")
  }
}
