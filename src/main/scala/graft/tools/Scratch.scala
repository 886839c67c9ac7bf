package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.dedup.MinHashLSH

/** Throwaway perf probe (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("scratch").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")
    def time(name: String)(f: => Unit): Unit = {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min match { case t => println(f"[scratch] $name%-28s ${t}%.3f s") }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    println(s"[scratch] docs=${docs.count()}")
    val p = MinHashLSH.Params()
    time("signatures only") {
      noop(MinHashLSH.signatures(docs, col("text"), col("doc_id"), p))
    }
    time("sig + checkpoint") {
      MinHashLSH.signatures(docs, col("text"), col("doc_id"), p)
        .localCheckpoint(true).count(); ()
    }
    time("full candidatePairs") {
      noop(MinHashLSH.candidatePairs(docs, col("text"), col("doc_id"), p))
    }
    spark.stop()
  }
}
