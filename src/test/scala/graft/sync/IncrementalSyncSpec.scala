package graft.sync

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.JdbcCatalog
import graft.config.Endpoint

/** Incremental (watermark-append) sync against a live JDBC source and
  * target: only rows beyond the target's MAX(watermark) move. */
class IncrementalSyncSpec extends SparkSpec {
  import spark.implicits._

  private val srcUrl = "jdbc:derby:memory:incsrc;create=true"
  private val dstUrl = "jdbc:derby:memory:incdst;create=true"
  private lazy val srcEp = Endpoint(srcUrl)
  private lazy val dstEp = Endpoint(dstUrl)

  test("incremental sync appends only the delta, full load when target empty") {
    val srcCat = new JdbcCatalog(srcEp)
    val dstCat = new JdbcCatalog(dstEp)
    DdlReplay.replay(srcCat, Seq(
      "CREATE TABLE inc_t (id BIGINT NOT NULL PRIMARY KEY, payload VARCHAR(16))"))
    DdlReplay.replay(dstCat, Seq(
      "CREATE TABLE inc_t (id BIGINT NOT NULL PRIMARY KEY, payload VARCHAR(16))"))
    val sink = JdbcSink(dstEp)

    // seed source with 100 rows; first incremental run = full load
    val batch1 = (1L to 100L).map(i => (i, s"row_$i")).toDF("id", "payload")
    JdbcSink(srcEp).append(batch1, "inc_t")
    val r1 = Sync.syncIncremental(spark, srcCat, sink, "inc_t", "id", pageSize = 30)
    assert(r1.ok && r1.rows == 100, r1.toString)

    // append 20 more at the source; second run moves exactly the delta
    val batch2 = (101L to 120L).map(i => (i, s"row_$i")).toDF("id", "payload")
    JdbcSink(srcEp).append(batch2, "inc_t")
    val r2 = Sync.syncIncremental(spark, srcCat, sink, "inc_t", "id", pageSize = 30)
    assert(r2.ok && r2.rows == 120, r2.toString)

    // no new rows: idempotent
    val r3 = Sync.syncIncremental(spark, srcCat, sink, "inc_t", "id", pageSize = 30)
    assert(r3.ok && r3.rows == 120, r3.toString)

    // content equality end-to-end
    assert(Compare.contentEqual(
      srcCat.read(spark, "inc_t"), sink.readBack(spark, "inc_t")))
  }
}
