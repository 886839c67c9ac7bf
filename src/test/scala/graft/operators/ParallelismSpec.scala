package graft.operators

import graft.SparkSpec
import graft.config.Endpoint
import graft.sync.{DdlReplay, JdbcSink}

/** ensureMin must widen narrow sources WITHOUT an RDD probe: JDBC
  * reads report their partition array on the relation (their default
  * size stat is Long.MaxValue, so a stats-only check would wrongly
  * treat one JDBC partition as wide). */
class ParallelismSpec extends SparkSpec {
  import spark.implicits._

  test("a single-partition JDBC read is widened to the core count") {
    val url = "jdbc:derby:memory:pardb;create=true"
    val cat = new graft.catalog.JdbcCatalog(Endpoint(url))
    DdlReplay.replay(cat, Seq(
      "CREATE TABLE par_t (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(8))"))
    JdbcSink(Endpoint(url)).append(
      (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"), "par_t")
    val df = spark.read.jdbc(url, "par_t", new java.util.Properties())
    // plan introspection sees exactly one JDBC partition...
    assert(org.apache.spark.sql.graftbridge.PlanBridge
      .jdbcLeafPartitions(df).contains(1))
    // ...and ensureMin widens it (rdd probe is fine IN THE TEST)
    val widened = Parallelism.ensureMin(df)
    assert(widened.rdd.getNumPartitions >=
      spark.sparkContext.defaultParallelism)
  }

  test("file scans keep the stats-based estimate (no false widening of wide scans)") {
    val docs = graft.Tables.load(spark, sf001, "documents")
    assert(org.apache.spark.sql.graftbridge.PlanBridge
      .jdbcLeafPartitions(docs).isEmpty)
    // small parquet: widened by the size estimate
    assert(Parallelism.ensureMin(docs).rdd.getNumPartitions >=
      spark.sparkContext.defaultParallelism)
  }
}
