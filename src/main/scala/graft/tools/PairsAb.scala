package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Barrier, TextOps}
import graft.operators.dedup.{MinHashLSH, PortableMinHash}

/** Scratch A/B harness for the r19 pair-mine shape experiments — times
  * alternative formulations of the portable MinHash pair mine in one
  * JVM over the same materialized signatures. Not part of any query
  * path; kept for reproducibility of OPTIMIZATION_r19.md numbers.
  *
  * Usage: runMain graft.tools.PairsAb [sfDir] [runs]
  */
object PairsAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .builder("graft-pairs-ab").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")

    import PortableMinHash.{bands, numHashes, rowsPerBand}
    def banded(df: DataFrame, text: Column, id: Column): DataFrame =
      graft.operators.Parallelism.ensureMin(df)
        .select(id.as("id"),
          PortableMinHash.signature(TextOps.normalized(text)).as("sig"))
        .withColumn("bks", transform(
          sequence(lit(0), lit(bands - 1)),
          j => md5(array_join(
            transform(slice(col("sig"), j * lit(rowsPerBand) + lit(1), lit(rowsPerBand)),
              x => x.cast("string")),
            ","))))

    // OLD: ids-only bucket join + two sig re-attach joins + dedup
    def oldPairs(sigs: DataFrame, threshold: Double): DataFrame = {
      val buckets = sigs.select(col("id"), posexplode(col("bks")).as(Seq("band", "bk")))
      val a = buckets.select(col("band"), col("bk"), col("id").as("doc_a"))
      val b = buckets.select(col("band"), col("bk"), col("id").as("doc_b"))
      val cand = a.join(b, Seq("band", "bk"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
      val bySig = sigs.select(col("id"), col("sig"))
      cand
        .join(bySig.select(col("id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
        .join(bySig.select(col("id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
        .withColumn("est_jaccard",
          MinHashLSH.estJaccard(col("sig_a"), col("sig_b"), numHashes))
        .filter(col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
        .dropDuplicates("doc_a", "doc_b")
    }

    // NEW: sig-inline bucket join + first-colliding-band mask
    def newPairs(sigs: DataFrame, threshold: Double): DataFrame = {
      val fine = sigs.select(col("id"), col("sig"),
        posexplode(col("bks")).as(Seq("band", "bk")))
      fine.select(col("band"), col("bk"),
          col("id").as("doc_a"), col("sig").as("sig_a"))
        .join(fine.select(col("band"), col("bk"),
          col("id").as("doc_b"), col("sig").as("sig_b")), Seq("band", "bk"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("mask", graft.functions.BandCollisionMask(
          col("sig_a"), col("sig_b"), rowsPerBand))
        .filter(expr(
          "(mask & -mask) = shiftleft(cast(1 as bigint), band)"))
        .withColumn("est_jaccard",
          MinHashLSH.estJaccard(col("sig_a"), col("sig_b"), numHashes))
        .filter(col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    }

    // HYBRID: sig-inline bucket join, est inline, dedup post-filter
    def hybridPairs(sigs: DataFrame, threshold: Double): DataFrame = {
      val fine = sigs.select(col("id"), col("sig"),
        posexplode(col("bks")).as(Seq("band", "bk")))
      fine.select(col("band"), col("bk"),
          col("id").as("doc_a"), col("sig").as("sig_a"))
        .join(fine.select(col("band"), col("bk"),
          col("id").as("doc_b"), col("sig").as("sig_b")), Seq("band", "bk"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("est_jaccard",
          MinHashLSH.estJaccard(col("sig_a"), col("sig_b"), numHashes))
        .filter(col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
        .dropDuplicates("doc_a", "doc_b")
    }

    val sigs = Barrier(banded(docs, col("text"), col("doc_id")))
    def time(tag: String, mk: => DataFrame): Unit = {
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        val df = mk
        df.write.mode("overwrite").format("noop").save()
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      println(s"== $tag plan ==")
      mk.explain()
    }
    // also time a Barrier'd materialization (the qd37 consumption shape)
    def timeBarrier(tag: String, mk: => DataFrame): Unit =
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        val b = Barrier(mk)
        println(f"$tag+barrier run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        Barrier.release(b)
      }

    time("old", oldPairs(sigs, 0.3))
    time("new", newPairs(sigs, 0.3))
    time("hybrid", hybridPairs(sigs, 0.3))

    // the qd37 consumption shape, stage-timed: barrier the pairs, base
    // CC over even-even edges, incremental append of the odd edges
    def qd37body(tag: String, mk: DataFrame => DataFrame): Unit = {
      implicit val ss: org.apache.spark.sql.SparkSession = spark
      (1 to runs).foreach { i =>
        var t0 = System.nanoTime()
        val p = Barrier(mk(sigs))
        val t1 = System.nanoTime()
        val evens = docs.filter(col("doc_id") % 2 === 0)
        val odds = docs.filter(col("doc_id") % 2 === 1)
        val baseEdges = p.filter(col("doc_a") % 2 === 0 && col("doc_b") % 2 === 0)
        val incEdges = p.filter(col("doc_a") % 2 === 1 || col("doc_b") % 2 === 1)
        val base = graft.operators.dedup.ConnectedComponents.components(
          baseEdges, "doc_a", "doc_b", evens, "doc_id")
        base.write.mode("overwrite").format("noop").save()
        val t2 = System.nanoTime()
        graft.operators.dedup.ConnectedComponents.appendComponents(
          base, incEdges, "doc_a", "doc_b", odds, "doc_id")
          .write.mode("overwrite").format("noop").save()
        val t3 = System.nanoTime()
        println(f"$tag qd37 run$i: pairs ${(t1 - t0) / 1e9}%.3f  " +
          f"baseCC ${(t2 - t1) / 1e9}%.3f  append ${(t3 - t2) / 1e9}%.3f  " +
          f"total ${(t3 - t0) / 1e9}%.3f")
      }
    }
    // equality + physical-layout diagnostics
    val po = Barrier(oldPairs(sigs, 0.3))
    val pn = Barrier(newPairs(sigs, 0.3))
    println(s"old count=${po.count()} parts=${po.rdd.getNumPartitions}")
    println(s"new count=${pn.count()} parts=${pn.rdd.getNumPartitions}")
    println(s"old except new=${po.exceptAll(pn).count()}  " +
      s"new except old=${pn.exceptAll(po).count()}")

    qd37body("old", oldPairs(_, 0.3))
    qd37body("new", newPairs(_, 0.3))
    spark.stop()
  }
}
