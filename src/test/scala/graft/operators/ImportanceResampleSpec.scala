package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.ImportanceResample

class ImportanceResampleSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side re-derivation with the same md5-bucket / integer
    * micro-nat conventions. */
  private def ref(
      texts: Seq[(Long, String, Boolean)],
      buckets: Int,
      smoothing: Long): Map[Long, (Long, Long)] = {
    def bucket(f: String): Long = {
      val d = MessageDigest.getInstance("MD5").digest(f.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % buckets
    }
    def feats(t: String): Seq[Long] = {
      val toks = t.toLowerCase.trim.replaceAll("\\s+", " ").split(" ", -1).toSeq
      val bi = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      (toks ++ bi).map(bucket)
    }
    val all = texts.map { case (id, t, isT) => (id, feats(t), isT) }
    val cr = all.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val ct = all.filter(_._3).flatMap(_._2).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val (tt, tr) = (ct.values.sum.toDouble, cr.values.sum.toDouble)
    def micro(n: Long, t: Double): Long =
      math.floor(math.log((n + smoothing) / (t + smoothing * buckets)) * 1e6).toLong
    all.map { case (id, fs, _) =>
      val w = fs.map(b =>
        micro(ct.getOrElse(b, 0L), tt) - micro(cr(b), tr)).sum
      id -> ((fs.size.toLong, w))
    }.toMap
  }

  private val corpus = Seq(
    (1L, "stocks rallied as markets closed higher today", true),
    (2L, "markets closed mixed as stocks wavered", true),
    (3L, "the cake recipe needs flour and sugar", false),
    (4L, "whisk the flour and sugar into batter", false),
    (5L, "stocks and markets closed the day higher", false))

  test("weights match a driver-side re-derivation") {
    val df = corpus.toDF("doc_id", "text", "is_t")
    val got = ImportanceResample.weights(
        df, col("text"), col("doc_id"), col("is_t"),
        buckets = 64, smoothing = 1L)
      .select("id", "n_feats", "lr_micro")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == ref(corpus, 64, 1L))
  }

  test("target-like off-target docs outweigh unrelated docs") {
    val df = corpus.toDF("doc_id", "text", "is_t")
    val w = ImportanceResample.weights(
        df, col("text"), col("doc_id"), col("is_t"),
        buckets = 64, smoothing = 1L)
      .select("id", "lr_micro").as[(Long, Long)].collect().toMap
    // doc 5 shares the finance vocabulary; docs 3-4 do not
    assert(w(5L) > w(3L))
    assert(w(5L) > w(4L))
  }

  test("sampleSummary selects the target-like slice at the k cut") {
    val df = corpus.toDF("doc_id", "text", "is_t")
      .withColumn("domain", when(col("doc_id") <= 2, "finance")
        .when(col("doc_id") === 5, "finance").otherwise("baking"))
    val got = ImportanceResample.sampleSummary(
        df, col("text"), col("doc_id"), col("domain"), col("is_t"),
        buckets = 64, smoothing = 1L, k = 3)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("finance")._3 == 3L)
    assert(got("baking")._3 == 0L)
    assert(got("finance")._4 == 1.0)
    assert(got("baking")._4 == 0.0)
  }

  test("weightsAgainst with target = the en slice equals weights with the predicate") {
    // the cross-corpus form reduces algebraically to the in-corpus
    // form whenever the target rows are a subset of raw
    val df = corpus.toDF("doc_id", "text", "is_t")
    val inCorpus = ImportanceResample.weights(
        df, col("text"), col("doc_id"), col("is_t"),
        buckets = 64, smoothing = 1L)
      .select("id", "n_feats", "lr_micro")
      .as[(Long, Long, Long)].collect().toSet
    val crossCorpus = ImportanceResample.weightsAgainst(
        df, col("text"), col("doc_id"),
        df.where(col("is_t")), col("text"),
        buckets = 64, smoothing = 1L)
      .select("id", "n_feats", "lr_micro")
      .as[(Long, Long, Long)].collect().toSet
    assert(crossCorpus == inCorpus)
  }

  test("weightsAgainst scores toward a disjoint external target corpus") {
    val raw = corpus.toDF("doc_id", "text", "is_t").drop("is_t")
    val external = Seq(
      (900L, "markets and stocks closed sharply higher"),
      (901L, "stocks rallied while markets closed up"))
      .toDF("doc_id", "text")
    val w = ImportanceResample.weightsAgainst(
        raw, col("text"), col("doc_id"),
        external, col("text"), buckets = 64, smoothing = 1L)
      .select("id", "lr_micro").as[(Long, Long)].collect().toMap
    // finance docs outweigh baking docs under a finance target
    assert(w(1L) > w(3L) && w(2L) > w(4L) && w(5L) > w(3L))
  }

  test("gumbel sampling is deterministic and softer than the argmax cut") {
    // 30 target-ish docs and 30 off-target docs with overlapping
    // vocab: the argmax cut at k=20 takes only target docs; the
    // gumbel cut must (a) reproduce itself exactly and (b) admit at
    // least one off-target doc at high temperature
    val docs = ((1 to 30).map(i => (i.toLong, s"stocks markets rally session $i", true)) ++
      (31 to 60).map(i => (i.toLong, s"flour sugar batter recipe $i", false)))
    val df = docs.toDF("doc_id", "text", "is_t")
    def run(tau: Double) = ImportanceResample.gumbelSampleSummary(
        df, col("text"), col("doc_id"),
        when(col("doc_id") <= 30, "fin").otherwise("bake"), col("is_t"),
        buckets = 64, smoothing = 1L, k = 20, tau = tau)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    val a = run(30.0)
    val b = run(30.0)
    assert(a == b, "gumbel sample not deterministic")
    assert(a("bake") >= 1, s"high-temperature sample admitted nothing off-target: $a")
    // near-zero temperature converges to the argmax cut
    val cold = run(1e-6)
    assert(cold("fin") == 20L && cold("bake") == 0L, cold.toString)
  }

  test("weight of a doc composed ONLY of target features is positive") {
    val df = corpus.toDF("doc_id", "text", "is_t")
    val w = ImportanceResample.weights(
        df, col("text"), col("doc_id"), col("is_t"),
        buckets = 64, smoothing = 1L)
      .select("id", "lr_micro").as[(Long, Long)].collect().toMap
    assert(w(1L) > 0L)
    assert(w(3L) < 0L)
  }
}
