package graft.sync

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("range-sorted layout yields disjoint per-file key ranges, content intact") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val out = java.nio.file.Files.createTempDirectory("graft_layout").toString
    Layout.writeRangeSorted(li, "l_orderkey", 8, out)

    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 1, "expected a multi-file layout")

    // per-file (min, max) of the cluster key must be pairwise disjoint —
    // that's what makes footer stats prunable for range scans
    val ranges = files.map { f =>
      spark.read.parquet(f)
        .agg(min("l_orderkey"), max("l_orderkey"))
        .as[(Long, Long)].head()
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping file ranges: hi=$hi lo2=$lo2")
      case _ =>
    }

    // layout is a rewrite, not a transformation
    val back = spark.read.parquet(out)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }
}
