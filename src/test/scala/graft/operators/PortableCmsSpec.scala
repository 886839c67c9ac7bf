package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.PortableCms

class PortableCmsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple apple banana"),
    (2L, "apple cherry"),
    (3L, "banana date elderberry fig")
  ).toDF("doc_id", "text")

  test("exact counts are right and estimates never undercount") {
    val out = PortableCms.profile(docs, col("text"), topK = 10).collect()
    val byTerm = out.map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byTerm("apple")._1 == 3L)
    assert(byTerm("banana")._1 == 2L)
    assert(byTerm("fig")._1 == 1L)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"undercount for ${r.getString(0)}")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
  }

  test("the sketch table is bounded by d*w rows and conserves mass") {
    val terms = docs.select(explode(split(lower(col("text")), " ")).as("term"))
    val table = PortableCms.table(terms, col("term")).collect()
    assert(table.length <= PortableCms.d * PortableCms.w)
    // every term lands in exactly one bucket per row: total mass = d * N
    val mass = table.map(_.getLong(2)).sum
    assert(mass == PortableCms.d.toLong * terms.count())
  }

  test("on the real fixture every top-term estimate is one-sided") {
    val real = graft.Tables.load(spark, sf0001, "documents")
    val out = PortableCms.profile(real, col("text"), topK = 20).collect()
    assert(out.length == 20)
    assert(out.forall(r => r.getLong(3) >= 0))
  }
}
