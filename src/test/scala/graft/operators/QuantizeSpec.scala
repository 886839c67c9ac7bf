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
}
