package graft.partition

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The property the reference's pagination flirts with losing
  * (cmd/root.go:367's extra empty page): slices must be an exact
  * partition of the keyspace — every row in exactly one slice. */
class KeyRangeSlicerSpec extends SparkSpec {
  import spark.implicits._

  private def checkExactPartition(keys: Seq[Long], slices: Int): Unit = {
    val df = keys.toDF("k")
    val preds = KeyRangeSlicer.slicePredicates(df, Seq("k"), slices)
    val total = preds.map(p => df.filter(expr(p)).count()).sum
    assert(total == keys.size, s"rows covered once: $preds")
  }

  test("uniform keys partition exactly") {
    checkExactPartition(1L to 1000L, 8)
  }

  test("skewed keys partition exactly") {
    val skewed = Seq.fill(500)(7L) ++ (1L to 100L) ++ Seq.fill(400)(999999L)
    checkExactPartition(skewed, 6)
  }

  test("random key sets partition exactly (property, seeded)") {
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val keys = Seq.fill(200)(rnd.nextLong() % 100000L)
      checkExactPartition(keys, 2 + rnd.nextInt(8))
    }
  }

  test("no PK or single slice => one full-scan predicate") {
    val df = (1L to 10L).toDF("k")
    assert(KeyRangeSlicer.slicePredicates(df, Seq.empty, 8).sameElements(Array("1=1")))
    assert(KeyRangeSlicer.slicePredicates(df, Seq("k"), 1).sameElements(Array("1=1")))
  }

  test("empty table => one predicate") {
    val df = spark.emptyDataset[Long].toDF("k")
    assert(KeyRangeSlicer.slicePredicates(df, Seq("k"), 4).length == 1)
  }

  test("numSlices mirrors ceil(count/pageSize) with a cap") {
    assert(KeyRangeSlicer.numSlices(0, 100000) == 1)
    assert(KeyRangeSlicer.numSlices(100000, 100000) == 1)
    assert(KeyRangeSlicer.numSlices(100001, 100000) == 2)
    assert(KeyRangeSlicer.numSlices(Long.MaxValue / 2, 1, maxSlices = 512) == 512)
  }

  test("fixture lineitem slices cover every row exactly once") {
    val li = graft.Tables.load(spark, sf0001, "lineitem")
    val preds = KeyRangeSlicer.slicePredicates(li, Seq("l_orderkey", "l_linenumber"), 8)
    val total = preds.map(p => li.filter(expr(p)).count()).sum
    assert(total == li.count())
  }
}
