package graft.sync

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.catalog.JdbcCatalog
import graft.config.Endpoint

/** Continuous replication: file-source micro-batches append into a JDBC
  * target through the sink's batched-transaction path, with checkpointed
  * source progress across restarts. */
class StreamingSyncSpec extends SparkSpec {
  import spark.implicits._

  private val dstUrl = "jdbc:derby:memory:streamsync;create=true"
  private lazy val dstEp = Endpoint(dstUrl)

  test("streaming sync replicates, restarts idempotently, and ships only deltas") {
    val dstCat = new JdbcCatalog(dstEp)
    DdlReplay.replay(dstCat, Seq(
      """CREATE TABLE cust_stream (
           c_custkey BIGINT, c_name VARCHAR(64), c_nationkey INT,
           c_acctbal DOUBLE, c_mktsegment VARCHAR(32))"""))
    val sink = JdbcSink(dstEp)

    val customer = Tables.load(spark, sf0001, "customer")
    val srcDir = java.nio.file.Files.createTempDirectory("graft_ss_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ss_ckpt").toString
    customer.write.mode("append").parquet(srcDir)
    val n0 = customer.count()

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(customer.schema).parquet(srcDir)
      val q = Sync.streamingSync(stream, sink, "cust_stream", ckpt)
      q.awaitTermination(60000)
    }

    runOnce()
    assert(sink.rowCount(spark, "cust_stream").contains(n0))
    assert(Compare.contentEqual(
      spark.read.parquet(srcDir), sink.readBack(spark, "cust_stream")))

    // restart on the same checkpoint with no new files: nothing re-ships
    runOnce()
    assert(sink.rowCount(spark, "cust_stream").contains(n0),
      "checkpointed restart duplicated rows")

    // new source file: only the delta crosses
    customer.limit(10)
      .withColumn("c_custkey", col("c_custkey") + lit(1000000L))
      .write.mode("append").parquet(srcDir)
    runOnce()
    assert(sink.rowCount(spark, "cust_stream").contains(n0 + 10),
      "delta run should append exactly the new file's rows")
  }
}
