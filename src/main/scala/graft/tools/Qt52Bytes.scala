package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Bytes-based adjudication of the BackoffLm shared-scan trade (r19
  * verdict item 7): the qt52 scoring run consumes the exploded context
  * stream FOUR times (c1, c2, c3, scoring join), each consumption a
  * full documents scan + tokenize. The alternative is one barrier
  * write + four reads of the materialized stream. Rather than
  * re-litigating local wall time (measured wall-neutral-to-worse in
  * r19), this prints the actual byte volumes both sides move, so the
  * crossover is a recorded number:
  *
  *   no barrier: 4 × R_scan      (+ 4 × tokenize CPU)
  *   barrier:    1 × R_scan + W_write + 4 × W_read
  *
  * where R = documents parquet bytes and W = the context stream's
  * materialized size (measured two ways: Spark's in-memory
  * deserialized block total for a localCheckpoint, and snappy parquet
  * on disk for the serialized/network-shaped size).
  *
  * Usage: runMain graft.tools.Qt52Bytes [sfDir]
  */
object Qt52Bytes {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .builder("graft-qt52-bytes").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")

    // R: the documents parquet on disk
    val docsPath = new java.io.File(s"$sfDir/documents.parquet")
    def du(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(du).sum).getOrElse(0L)
    val r = du(docsPath)

    // the qt52 context stream (BackoffLm's array-derived shape)
    val stream = graft.operators.Parallelism.ensureMin(docs)
      .select(col("doc_id").as("id"), TextOps.tokens(col("text")).as("__t"))
      .select(col("id"), posexplode(col("__t")).as(Seq("pos", "term")),
        col("__t"))
      .select(col("id"), col("pos"), col("term"),
        when(col("pos") >= 1, element_at(col("__t"), col("pos"))).as("p1"),
        when(col("pos") >= 2, element_at(col("__t"), col("pos") - 1)).as("p2"))

    // W (serialized): the stream as snappy parquet
    val tmp = java.nio.file.Files.createTempDirectory("qt52bytes").toString
    stream.write.mode("overwrite").parquet(s"$tmp/stream")
    val wDisk = du(new java.io.File(s"$tmp/stream"))

    // W (in-memory blocks): what a localCheckpoint barrier holds
    val cp = stream.localCheckpoint(true)
    cp.count()
    val wMem = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum +
      spark.sparkContext.getRDDStorageInfo.map(_.diskSize).sum

    val rows = spark.read.parquet(s"$tmp/stream").count()
    println(f"R (documents parquet)        : $r%,d bytes")
    println(f"W (stream, snappy parquet)   : $wDisk%,d bytes (${rows}%,d rows)")
    println(f"W (stream, checkpoint blocks): $wMem%,d bytes")
    println(f"W/R (parquet)                : ${wDisk.toDouble / r}%.2f")
    val noBarrier = 4.0 * r
    val withBarrier = r + wDisk * 5.0 // 1 write + 4 reads
    println(f"no-barrier bytes  = 4R        = ${noBarrier}%,.0f")
    println(f"barrier bytes     = R + 5W    = ${withBarrier}%,.0f")
    println(f"barrier/no-barrier            = ${withBarrier / noBarrier}%.2f")
    println(
      "crossover: barrier wins on BYTES when W < 3R/5, i.e. W/R < 0.6")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    spark.stop()
  }
}
