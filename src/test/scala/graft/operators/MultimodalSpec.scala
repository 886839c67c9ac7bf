package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  implicit private lazy val sp: SparkSession = spark

  private lazy val media =
    Multimodal.asMedia(Tables.load(spark, sf0001, "documents"), "doc_id", "text")

  test("binary payload preserves utf-8 byte length") {
    val got = media.select(octet_length(col("content")).as("n")).as[Int].collect().sum
    val expected = Tables.load(spark, sf0001, "documents")
      .select(octet_length(col("text")).as("n")).as[Int].collect().sum
    assert(got == expected)
  }

  test("decode stub is deterministic and total") {
    val meta = Multimodal.decodeStub(media)
    assert(meta.count() == 500)
    val m1 = meta.filter(_.id == 7L).head()
    val m2 = Multimodal.decodeStub(media).filter(_.id == 7L).head()
    assert(m1 == m2, "decode must be deterministic")
    assert(m1.width >= 64 && m1.height >= 64)
  }

  test("resize stub caps the longer side and keeps aspect floor") {
    val resized = Multimodal.resizeStub(Multimodal.decodeStub(media), maxSide = 128)
    resized.collect().foreach { m =>
      assert(math.max(m.width, m.height) <= 128)
      assert(m.width >= 1 && m.height >= 1)
    }
  }

  test("frame sampling covers payloads with the requested stride") {
    val frames = Multimodal.frameSampleStub(media, frameBytes = 64, stride = 2)
    val byDoc = frames.groupByKey(_.id).count().collect().toMap
    assert(byDoc.size == 500)
    // doc with n bytes has ceil-ish frames: every 2nd of n/64 (min 1)
    val doc = Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id") === 0).select(octet_length(col("text"))).as[Int].head()
    val expectedFrames = math.max(1, doc / 64 + (if (doc % 64 > 0) 0 else 0))
    assert(byDoc(0L) == (0 until math.max(1, doc / 64) by 2).size)
  }
}
