package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Byte volumes for the qs39 shared-tokenize trade (companion to
  * [[Qt52Bytes]]): W = the materialized (id, toks, dl) frame both
  * retrieval legs read, R = the documents parquet. Shared wins on
  * bytes when R + W_write + 3·W_read < 3·R, i.e. W/R < 1/2 (the
  * third consumer is the BM25 stats aggregate).
  *
  * Usage: runMain graft.tools.Qs39Bytes [sfDir]
  */
object Qs39Bytes {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession
      .builder("graft-qs39-bytes").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    def du(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(du).sum).getOrElse(0L)
    val r = du(new java.io.File(s"$sfDir/documents.parquet"))
    val tok = graft.operators.Parallelism.ensureMin(docs)
      .select(col("doc_id").as("id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("id"), col("toks"), size(col("toks")).cast("double").as("dl"))
    val tmp = java.nio.file.Files.createTempDirectory("qs39bytes").toString
    tok.write.mode("overwrite").parquet(s"$tmp/tok")
    val wDisk = du(new java.io.File(s"$tmp/tok"))
    val cp = tok.localCheckpoint(true); cp.count()
    val wMem = spark.sparkContext.getRDDStorageInfo.map(i => i.memSize + i.diskSize).sum
    println(f"R (documents parquet)      : $r%,d bytes")
    println(f"W (tok frame, parquet)     : $wDisk%,d bytes  W/R=${wDisk.toDouble/r}%.2f")
    println(f"W (tok frame, ckpt blocks) : $wMem%,d bytes  Wmem/R=${wMem.toDouble/r}%.2f")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    spark.stop()
  }
}
