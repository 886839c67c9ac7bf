package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.text.{Bm25, HashedEmbedding, HybridRetrieval}
import graft.queries.HybridBatchFixture

/** Scratch interleaved A/B for the qs39 tokenize-sharing question
  * (r19 verdict item 3): SHARED — one tokenized corpus barrier feeds
  * the BM25 leg (stats + hits) and the hashed-embedding leg (the r20
  * shipped shape) — vs SPLIT — each leg tokenizes for itself (the r19
  * shape: three tokenize passes, two barriers). Full qs39 pipeline
  * both ways, alternating in ONE JVM so the floor cancels. Not part of
  * any query path; kept for reproducibility of OPTIMIZATION_r20.md.
  *
  * Usage: runMain graft.tools.Qs39Ab [sfDir] [rounds]
  */
object Qs39Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .builder("graft-qs39-ab").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val queries = HybridBatchFixture.queries
    val (kPerList, kOut) = (20, 10)
    val K = 60L

    // the r19 split shape: Bm25.topKBatch and queryTopKBatch each
    // tokenize the corpus themselves (topKBatch additionally pays the
    // stats pass) — verbatim pre-r20 textTopKBatch body
    def splitShape(): DataFrame = {
      val termed = queries.map { case (qid, q) =>
        (qid, q.toLowerCase.trim.replaceAll("\\s+", " ")
          .split(" ").toSeq.filter(_.nonEmpty))
      }
      val lex = Bm25.topKBatch(docs, col("text"), col("doc_id"), termed, kPerList)
        .select(col("query_id"), col("id"), col("lex_rank"))
      val dense = HashedEmbedding
        .queryTopKBatch(docs, col("text"), col("doc_id"), queries, 64, kPerList)
        .select(col("query_id"), col("id"), col("dense_rank"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("rrf_scaled").desc, col("id"))
      lex.join(dense, Seq("query_id", "id"), "full_outer")
        .withColumn(
          "rrf_scaled",
          coalesce(expr(s"1000000L div (${K}L + lex_rank)"), lit(0L)) +
            coalesce(expr(s"1000000L div (${K}L + dense_rank)"), lit(0L)))
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= kOut)
        .select("query_id", "id", "lex_rank", "dense_rank", "rrf_scaled")
    }

    def sharedShape(): DataFrame =
      HybridRetrieval.textTopKBatch(
        docs, col("text"), col("doc_id"), queries, kPerList, kOut)

    def run(tag: String, mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$tag: $dt%.3f s")
      dt
    }
    // equality guard before timing: the two shapes must agree row for row
    val d1 = splitShape(); val d2 = sharedShape()
    val diff = d1.exceptAll(d2).count() + d2.exceptAll(d1).count()
    println(s"row diff: $diff ${if (diff == 0) "(identical)" else "(MISMATCH!)"}")

    var sp = List.empty[Double]; var sh = List.empty[Double]
    (1 to rounds).foreach { _ =>
      sp ::= run("split ", splitShape())
      sh ::= run("shared", sharedShape())
    }
    println(f"split  min ${sp.min}%.3f med ${sp.sorted.apply(sp.size / 2)}%.3f")
    println(f"shared min ${sh.min}%.3f med ${sh.sorted.apply(sh.size / 2)}%.3f")
    spark.stop()
    if (diff != 0) sys.exit(1)
  }
}
