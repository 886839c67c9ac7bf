package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.similarity.Quantize

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("codes match driver-side floor(x*127/max + 0.5) exactly") {
    val emb = Tables.load(spark, sf0001, "embeddings").limit(20)
    val got = Quantize
      .profile(emb, col("embedding"), col("vec_id"))
      .as[(Long, Double, Long, Long, Long)].collect().sortBy(_._1)
    val raw = emb.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    got.zip(raw).foreach { case ((id, _, qSum, qMin, qMax), (rid, v)) =>
      assert(id == rid)
      val mx = v.map(x => math.abs(x.toDouble)).max
      val scale = if (mx == 0) 0.0 else 127.0 / mx
      val qs = v.map(x => math.floor(x.toDouble * scale + 0.5).toLong)
      assert(qSum == qs.sum, s"vec $id sum")
      assert(qMin == qs.min && qMax == qs.max, s"vec $id min/max")
      assert(qs.forall(q => q >= -127 && q <= 127), s"vec $id out of int8 range")
    }
  }

  test("zero vector quantizes to zeros with scale 0") {
    val df = Seq((1L, Seq.fill(4)(0.0f))).toDF("vec_id", "embedding")
    val r = Quantize.profile(df, col("embedding"), col("vec_id"))
      .as[(Long, Double, Long, Long, Long)].head()
    assert(r == ((1L, 0.0, 0L, 0L, 0L)))
  }

  test("int8 top-k ranks like the driver-side integer dot; zero scores 0") {
    val df = Seq(
      (0L, Seq(1.0f, 0.0f, 0.5f)),   // probe
      (1L, Seq(2.0f, 0.0f, 1.0f)),   // same direction -> top
      (2L, Seq(-1.0f, 0.0f, -0.5f)), // opposite -> bottom
      (3L, Seq(0.0f, 1.0f, 0.0f)),   // orthogonal
      (4L, Seq(0.0f, 0.0f, 0.0f)))   // zero vector -> score 0
      .toDF("vec_id", "embedding")
    val got = Quantize.topKInt8(df, col("embedding"), col("vec_id"),
        queryId = 0L, k = 10)
      .as[(Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 3L, 4L, 2L))
    // driver-side check of the winner's integer dot: codes of (1,0,.5)
    // scale 127 -> (127,0,64); of (2,0,1) scale 63.5 -> (127,0,64)
    assert(got.head._2 == 127L * 127L + 64L * 64L)
    assert(got.find(_._1 == 4L).get._3 == 0.0)
    assert(got.find(_._1 == 2L).get._3 < 0)
  }

  test("int8 top-k agrees with float brute force on fixture order") {
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
    val int8 = Quantize.topKInt8(emb, col("embedding"), col("vec_id"),
        queryId = 0L, k = 5)
      .as[(Long, Long, Double)].collect().map(_._1).toSeq
    assert(int8.size == 5 && int8.distinct.size == 5 && !int8.contains(0L))
  }
}
