package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Barrier

/** Scratch A/B for the qt13/qt33 span-stream keying question: does a
  * repartition(g) BEFORE the barrier let both consumers (the per-span
  * count and the flag join) skip their exchanges, and does it pay at
  * bench scale? Also prints the post-barrier plan to confirm whether a
  * localCheckpoint preserves its outputPartitioning for Catalyst.
  *
  * Usage: runMain graft.tools.SpanAb [sfDir] [rounds]
  */
object SpanAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .builder("graft-span-ab").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")

    def exploded(pre: Boolean): DataFrame = {
      val e = graft.operators.Parallelism.ensureMin(docs)
        .select(col("doc_id").as("id"),
          explode(graft.operators.text.SpanDedup.spanKeys(col("text"), 8)).as("g"))
      Barrier(if (pre) e.repartition(col("g")) else e)
    }

    // the qt13 tail: per-span counts, hot/shared routing, per-doc rollup
    def profile(ex: DataFrame): DataFrame = {
      val counts = ex.groupBy("g").agg(count(lit(1)).as("nd"))
      val hot = counts.filter(col("nd") > 1000000).select(col("g"), lit(1).as("hot"))
      val shared = counts.filter(col("nd") >= 2 && col("nd") <= 1000000)
        .select(col("g"), lit(1).as("sh"))
      val flagged = ex.join(broadcast(hot), Seq("g"), "left")
      flagged.filter(col("hot") === 1).select(col("id"), lit(1).as("sh"))
        .unionByName(flagged.filter(col("hot").isNull)
          .join(shared, Seq("g"), "left").select(col("id"), col("sh")))
        .groupBy("id")
        .agg(count(lit(1)).as("n_spans"), count(col("sh")).as("shared_spans"))
    }

    def run(tag: String, pre: Boolean): Double = {
      val t0 = System.nanoTime()
      profile(exploded(pre)).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$tag: $dt%.3f s")
      dt
    }
    // does the checkpoint carry its partitioning? count exchanges in
    // the count-leg plan both ways
    Seq(false, true).foreach { pre =>
      val p = profile(exploded(pre)).queryExecution.executedPlan.toString
      val ex = "Exchange hashpartitioning".r.findAllIn(p).length
      println(s"pre=$pre hash-exchanges-in-plan=$ex")
    }
    var a = List.empty[Double]; var b = List.empty[Double]
    (1 to rounds).foreach { _ =>
      a ::= run("unkeyed", false)
      b ::= run("prekeyed", true)
    }
    println(f"unkeyed  min ${a.min}%.3f med ${a.sorted.apply(a.size / 2)}%.3f")
    println(f"prekeyed min ${b.min}%.3f med ${b.sorted.apply(b.size / 2)}%.3f")
    spark.stop()
  }
}
