package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.HashedEmbedding

class HashedEmbeddingSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Driver-side re-derivation of the hashing trick. */
  private def ref(texts: Seq[(Long, String)], dim: Int): Map[Long, Seq[Long]] =
    texts.map { case (id, t) =>
      val v = Array.fill(dim)(0L)
      t.toLowerCase.trim.replaceAll("\\s+", " ").split(" ", -1)
        .filter(_.nonEmpty).foreach { term =>
          val h = md5hex(term)
          val j = (java.lang.Long.parseLong(h.take(8), 16) % dim).toInt
          val s = 1L - 2L * (java.lang.Long.parseLong(h.slice(8, 16), 16) % 2)
          v(j) += s
        }
      id -> v.toSeq
    }.filter(_._2.exists(_ != 0L)).toMap

  private val corpus = Seq(
    (1L, "spark shuffles partition data across executors"),
    (2L, "spark shuffles partition data across the cluster"),
    (3L, "bake the cake with flour sugar and butter"),
    (4L, "the cat sat on the mat"))

  test("embeddings match a driver-side re-derivation") {
    val got = HashedEmbedding.embed(
        corpus.toDF("doc_id", "text"), col("text"), col("doc_id"), dim = 32)
      .as[(Long, Seq[Long])].collect().toMap
    assert(got == ref(corpus, 32))
  }

  test("embedRows is the exact dense explode of embed") {
    // the harness-facing scalar shape (r11 advice: arrays don't hash)
    val rows = HashedEmbedding.embedRows(
        corpus.toDF("doc_id", "text"), col("text"), col("doc_id"), dim = 32)
      .as[(Long, Long, Long)].collect()
    val expect = ref(corpus, 32).flatMap { case (id, v) =>
      v.zipWithIndex.map { case (x, j) => (id, j.toLong, x) }
    }.toSet
    assert(rows.length == expect.size) // every (doc, dim) cell exactly once
    assert(rows.toSet == expect)
  }

  test("near-identical docs rank above unrelated ones for a probe") {
    val got = HashedEmbedding.topK(
        corpus.toDF("doc_id", "text"), col("text"), col("doc_id"),
        probeId = 1L, dim = 32, k = 3)
      .select("id", "cos").as[(Long, Double)].collect()
    assert(got.head._1 == 2L, got.mkString(","))
    assert(got.head._2 > 0.6)
    val cosMap = got.toMap
    assert(cosMap.getOrElse(3L, -1.0) < cosMap(2L))
  }

  test("dense-embedding cosine equals the sparse-dot retrieval cosine") {
    // the sparse-dot identity the oracle and the 100 TB path rely on
    val emb = HashedEmbedding.embed(
        corpus.toDF("doc_id", "text"), col("text"), col("doc_id"), dim = 32)
      .as[(Long, Seq[Long])].collect().toMap
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      val d = math.floor(dot /
        math.sqrt(a.map(x => x * x).sum.toDouble *
          b.map(x => x * x).sum.toDouble) * 1e4) / 1e4
      d
    }
    val got = HashedEmbedding.topK(
        corpus.toDF("doc_id", "text"), col("text"), col("doc_id"),
        probeId = 1L, dim = 32, k = 4)
      .select("id", "cos").as[(Long, Double)].collect().toMap
    got.foreach { case (id, c) =>
      assert(c == cos(emb(1L), emb(id)), s"doc $id")
    }
  }

  test("a cancelled-out document drops from the embedding table entirely") {
    // two occurrences of terms hashing to the same (j, opposite-sign)
    // would cancel; simplest guaranteed case: an empty doc
    val withEmpty = corpus :+ (9L, "")
    val got = HashedEmbedding.embed(
        withEmpty.toDF("doc_id", "text"), col("text"), col("doc_id"), dim = 32)
      .select("id").as[Long].collect().toSet
    assert(!got.contains(9L))
    assert(got == Set(1L, 2L, 3L, 4L))
  }
}
