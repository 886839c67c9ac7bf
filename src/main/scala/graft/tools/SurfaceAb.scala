package graft.tools

/** One-JVM interleaved A/B of the r20 Barrier layout surfacing for a
  * set of registry queries: each round runs every named query once
  * with `spark.graft.barrier.surfaceLayout=false` (the pre-r20
  * UnknownPartitioning checkpoint) and once with it on, alternating,
  * so the machine floor cancels. Prints per-query min/med both ways.
  *
  * Usage: runMain graft.tools.SurfaceAb [sfDir] [rounds] [q1,q2,...]
  */
object SurfaceAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val names = args.lift(2)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("qd03_minhash_pairs", "qt32_perplexity_filter",
        "qs11_semantic_prune"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .builder("graft-surface-ab").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String, surface: Boolean): Double = {
      spark.conf.set("spark.graft.barrier.surfaceLayout", surface.toString)
      val t0 = System.nanoTime()
      graft.queries.Registry.byName(name).run(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup both ways
    names.foreach { n => run(n, surface = false); run(n, surface = true) }
    val off = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    val on = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    (1 to rounds).foreach { _ =>
      names.foreach { n =>
        val a = run(n, surface = false); off(n) ::= a
        val b = run(n, surface = true); on(n) ::= b
        println(f"$n off $a%.3f on $b%.3f")
      }
    }
    names.foreach { n =>
      val o = off(n).sorted; val s = on(n).sorted
      println(f"$n: OFF min ${o.head}%.3f med ${o(o.size / 2)}%.3f | " +
        f"ON min ${s.head}%.3f med ${s(s.size / 2)}%.3f | " +
        f"on/off min ${s.head / o.head}%.2f")
    }
    spark.stop()
  }
}
