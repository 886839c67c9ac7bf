package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.Bm25

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark window spark join"),
    (2L, "spark table scan"),
    (3L, "window window window window"),
    (4L, "no matching terms at all here"))

  /** Independent driver-side BM25 with the same conventions. */
  private def ref(query: Seq[String], k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val dfq = query.map(t => t -> toks.count(_._2.contains(t)).toDouble).toMap
    toks.flatMap { case (id, ts) =>
      val cs = query.sorted.flatMap { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0 || dfq(t) == 0) None
        else {
          val idf = math.log(1.0 + (n - dfq(t) + 0.5) / (dfq(t) + 0.5))
          Some(idf * (tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * (ts.size / avgdl))))
        }
      }
      if (cs.isEmpty) None
      else Some(id -> math.floor(cs.foldLeft(0.0)(_ + _) * 1e4) / 1e4)
    }
  }

  private def run(query: Seq[String], k: Int = 10): Map[Long, Double] =
    Bm25.topK(corpus.toDF("doc_id", "text"), col("text"), col("doc_id"),
        query, k = k)
      .as[(Long, Double)].collect().toMap

  test("scores match an independent driver-side BM25") {
    assert(run(Seq("spark", "window")) == ref(Seq("spark", "window")))
  }

  test("only docs hitting at least one query term are returned") {
    val got = run(Seq("spark"))
    assert(got.keySet == Set(1L, 2L))
    // doc 1 has tf=2 of 'spark', doc 2 tf=1 with shorter dl — both
    // positive, doc ordering by the reference
    assert(got == ref(Seq("spark")))
  }

  test("k caps the result and the cut is score-ordered") {
    val got = Bm25.topK(corpus.toDF("doc_id", "text"), col("text"),
        col("doc_id"), Seq("spark", "window"), k = 1)
      .as[(Long, Double)].collect()
    assert(got.length == 1)
    val full = ref(Seq("spark", "window"))
    assert(got.head._2 == full.values.max)
  }

  test("fixture corpus run is stable against the reference formulation") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val got = Bm25.topK(docs, col("text"), col("doc_id"),
        Seq("spark", "window", "vector"), k = 15)
      .as[(Long, Double)].collect()
    assert(got.length == 15)
    assert(got.forall(_._2 > 0))
    // descending by (score, id)
    val sorted = got.sortBy(r => (-r._2, r._1)).toSeq
    assert(got.toSeq == sorted)
  }
}
