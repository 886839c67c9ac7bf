package graft.operators

import java.nio.file.Files

import graft.SparkSpec

class BarrierSpec extends SparkSpec {
  import spark.implicits._

  test("default barrier is a local checkpoint (no checkpoint dir touched)") {
    assert(spark.conf.getOption(Barrier.ConfKey).isEmpty)
    val out = Barrier(Seq(1, 2, 3).toDF("x"))
    assert(out.count() == 3)
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "local barrier must not set a reliable checkpoint dir")
  }

  test("spark.graft.checkpointDir routes the barrier through checkpoint()") {
    val dir = Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(Barrier.ConfKey, dir)
    try {
      val out = Barrier(Seq(1, 2, 3, 4).toDF("x"))
      assert(out.count() == 4)
      val resolved = spark.sparkContext.getCheckpointDir
      assert(resolved.exists(_.contains(dir.stripPrefix("/"))),
        s"checkpoint dir not under $dir: $resolved")
      // reliable checkpoint writes rdd-* block files into the dir
      def rddFiles(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles()).toSeq.flatten
          .flatMap(c => if (c.isDirectory) rddFiles(c) else Seq(c))
      assert(rddFiles(new java.io.File(dir)).nonEmpty,
        "no checkpoint files written — barrier did not go through checkpoint()")

      // a second barrier reuses the same base dir (no UUID pile-up)
      val before = spark.sparkContext.getCheckpointDir
      Barrier(Seq(5).toDF("x")).count()
      assert(spark.sparkContext.getCheckpointDir == before)
    } finally {
      spark.conf.unset(Barrier.ConfKey)
    }
  }
}
