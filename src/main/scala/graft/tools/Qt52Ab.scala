package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{PortableRound, TextOps}

/** Scratch interleaved A/B for the qt52 context-stream shapes: the
  * pre-r19 lag-window form vs the r19 array-derived form, full score
  * pipeline, alternating runs in ONE JVM so the floor cancels. Not part
  * of any query path; kept for reproducibility of OPTIMIZATION_r19.md.
  *
  * Usage: runMain graft.tools.Qt52Ab [sfDir] [rounds]
  */
object Qt52Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .builder("graft-qt52-ab").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")

    def streamWindow(df: DataFrame, text: Column, id: Column): DataFrame = {
      val toks = graft.operators.Parallelism.ensureMin(df)
        .select(id.as("id"), posexplode(TextOps.tokens(text)).as(Seq("pos", "term")))
      val byDoc = Window.partitionBy("id").orderBy("pos")
      toks
        .withColumn("p1", lag("term", 1).over(byDoc))
        .withColumn("p2", lag("term", 2).over(byDoc))
    }
    def streamArray(df: DataFrame, text: Column, id: Column): DataFrame =
      graft.operators.Parallelism.ensureMin(df)
        .select(id.as("id"), TextOps.tokens(text).as("__t"))
        .select(col("id"), col("__t"),
          posexplode(col("__t")).as(Seq("pos", "term")))
        .select(col("id"), col("pos"), col("term"),
          when(col("pos") >= 1, element_at(col("__t"), col("pos"))).as("p1"),
          when(col("pos") >= 2, element_at(col("__t"), col("pos") - 1)).as("p2"))

    // the full qt52 pipeline over a given stream maker (counts + joins
    // + per-doc rollup), minCount/alpha/tau as qt52 uses them
    def score(stream: DataFrame): DataFrame = {
      val lnA = graft.operators.text.BackoffLm.alphaMicro(0.4)
      val minCount = 2L
      val c1 = stream.groupBy("term").agg(count(lit(1)).as("n1"))
      val n = c1.agg(sum("n1").cast("double").as("total"))
      val c2 = stream.where(col("p1").isNotNull)
        .groupBy("p1", "term").agg(count(lit(1)).as("n2"))
        .where(col("n2") >= minCount)
      val c3 = stream.where(col("p2").isNotNull)
        .groupBy("p2", "p1", "term").agg(count(lit(1)).as("n3"))
        .where(col("n3") >= minCount)
      val tri = c3.select(col("p2").as("t_p2"), col("p1").as("t_p1"),
        col("term").as("t_w"), col("n3"))
      val triCtx = c2.select(col("p1").as("x_p2"), col("term").as("x_p1"),
        col("n2").as("nc2"))
      val bi = c2.select(col("p1").as("b_p1"), col("term").as("b_w"), col("n2"))
      val biCtx = c1.select(col("term").as("y_p1"), col("n1").as("nc1"))
      val uni = c1.select(col("term").as("u_w"), col("n1"))
      val microLn = (num: Column, den: Column) =>
        floor(log(num.cast("double") / den) * lit(1e6)).cast("long")
      stream
        .join(tri, col("p2") === col("t_p2") && col("p1") === col("t_p1") &&
          col("term") === col("t_w"), "left")
        .join(triCtx, col("p2") === col("x_p2") && col("p1") === col("x_p1"), "left")
        .join(bi, col("p1") === col("b_p1") && col("term") === col("b_w"), "left")
        .join(biCtx, col("p1") === col("y_p1"), "left")
        .join(uni, col("term") === col("u_w"), "left")
        .crossJoin(broadcast(n))
        .select(col("id"),
          when(col("n3").isNotNull, microLn(col("n3"), col("nc2").cast("double")))
            .when(col("n2").isNotNull,
              microLn(col("n2"), col("nc1").cast("double")) +
                when(col("p2").isNotNull, lit(lnA)).otherwise(lit(0L)))
            .otherwise(
              microLn(col("n1"), col("total")) +
                when(col("p2").isNotNull, lit(2L * lnA))
                  .when(col("p1").isNotNull, lit(lnA))
                  .otherwise(lit(0L))).as("lp"))
        .groupBy("id")
        .agg(count(lit(1)).as("n_tokens"), sum("lp").as("sum_lp"))
        .select(col("id"),
          PortableRound.floorTo(
            -col("sum_lp").cast("double") / lit(1e6) /
              col("n_tokens").cast("double"), 4).as("ce"))
    }

    def run(tag: String, mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$tag: $dt%.3f s")
      dt
    }
    var w = List.empty[Double]; var a = List.empty[Double]
    (1 to rounds).foreach { _ =>
      w ::= run("window", score(streamWindow(docs, col("text"), col("doc_id"))))
      a ::= run("array ", score(streamArray(docs, col("text"), col("doc_id"))))
    }
    println(f"window min ${w.min}%.3f med ${w.sorted.apply(w.size / 2)}%.3f")
    println(f"array  min ${a.min}%.3f med ${a.sorted.apply(a.size / 2)}%.3f")
    spark.stop()
  }
}
