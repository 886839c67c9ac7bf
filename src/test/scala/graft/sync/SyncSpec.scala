package graft.sync

import graft.{SparkSpec, Tables}
import graft.catalog.{JdbcCatalog, ParquetCatalog}
import graft.config.{Endpoint, SyncConfig}

class SyncSpec extends SparkSpec {

  test("parquet sync round trip preserves content exactly") {
    val out = java.nio.file.Files.createTempDirectory("graft_sync_t").toString
    val catalog = new ParquetCatalog(sf0001)
    val sink = ParquetSink(out)
    val report = Sync.syncTable(spark, catalog, sink, "customer")
    assert(report.ok && report.rows == 150)
    assert(Compare.contentEqual(
      Tables.load(spark, sf0001, "customer"), sink.readBack(spark, "customer")))
  }

  test("syncAll with exclusion syncs the rest concurrently") {
    val out = java.nio.file.Files.createTempDirectory("graft_syncall_t").toString
    val catalog = new ParquetCatalog(sf0001)
    val cfg = SyncConfig(Endpoint("src"), Endpoint("dest"), maxParallel = 4,
      exclude = Seq("lineitem", "orders", "events", "documents", "embeddings", "part"))
    val reports = Sync.syncAll(spark, catalog, ParquetSink(out), cfg)
    assert(reports.map(_.table).sorted == Seq("customer", "nation", "region", "supplier"))
    assert(reports.forall(_.ok))
  }

  test("syncAll routes watermarked tables through incremental append") {
    val out = java.nio.file.Files.createTempDirectory("graft_wm_t").toString
    val catalog = new ParquetCatalog(sf0001)
    val sink = ParquetSink(out)
    val cfg = SyncConfig(Endpoint("src"), Endpoint("dest"), maxParallel = 2,
      exclude = Tables.all.filterNot(Set("region", "nation")),
      watermarks = Map("nation" -> "n_nationkey"))
    val r1 = Sync.syncAll(spark, catalog, sink, cfg)
    assert(r1.forall(_.ok), r1.toString)
    // second run: truncate-load table rewrites; watermarked table
    // appends nothing (idempotent) — row counts stay put
    val r2 = Sync.syncAll(spark, catalog, sink, cfg)
    assert(r2.forall(_.ok), r2.toString)
    assert(sink.readBack(spark, "nation").count() == 25)
    assert(Compare.contentEqual(
      Tables.load(spark, sf0001, "nation"), sink.readBack(spark, "nation")))
  }

  test("count compare flags a missing destination table (NO/NO)") {
    val out = java.nio.file.Files.createTempDirectory("graft_cmp_t").toString
    val catalog = new ParquetCatalog(sf0001)
    val sink = ParquetSink(out)
    Sync.syncTable(spark, catalog, sink, "region")
    val rows = Compare.countCompare(spark, catalog, sink, Seq("region", "nation"))
    val byTable = rows.map(r => r.table_name -> r).toMap
    assert(byTable("region").is_ok == "YES" && byTable("region").dest_is_exist == "YES")
    assert(byTable("nation").is_ok == "NO" && byTable("nation").dest_is_exist == "NO")
  }

  test("content compare detects a mutated row") {
    import org.apache.spark.sql.functions._
    val a = Tables.load(spark, sf0001, "nation")
    val b = a.withColumn("n_name",
      when(col("n_nationkey") === 7, lit("MUTATED")).otherwise(col("n_name")))
    assert(!Compare.contentEqual(a, b))
    assert(Compare.contentEqual(a, a))
  }

  test("content checksum of a double column is storage-representation-safe") {
    import org.apache.spark.sql.functions._
    // parquet side: doubles. Derby side: the same values through a
    // REAL (float32) column would differ bitwise; through DOUBLE they
    // round-trip — either way the checksum must compare the CANONICAL
    // fixed-scale rendering, not engine stringification
    val url = "jdbc:derby:memory:graftdbl;create=true"
    val src = Tables.load(spark, sf0001, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    val sink = JdbcSink(Endpoint(url), numPartitions = 2)
    sink.overwrite(src, "balcmp")
    val back = sink.readBack(spark, "balcmp")
    val cols = Seq("c_acctbal", "c_custkey")
    val a = Compare.contentChecksum(src, cols).head()
    val b = Compare.contentChecksum(back, cols).head()
    assert(a == b, s"double-column checksum drifted across engines: $a vs $b")
    // and it still detects a real value change at the last scale digit
    val nudged = src.withColumn("c_acctbal",
      when(col("c_custkey") === 1, col("c_acctbal") + 0.0000000001)
        .otherwise(col("c_acctbal")))
    val c = Compare.contentChecksum(nudged, cols).head()
    assert(a.get(0) != c.get(0), "nudged double not detected")
  }
}

/** Full JDBC path against embedded Derby: DDL replay, truncate-load
  * write, catalog discovery (DatabaseMetaData), partitioned read-back,
  * count + content compare. This is the reference's MySQL→MySQL flow
  * with a real JDBC engine on both ends of the sink side.
  */
class JdbcDerbySpec extends SparkSpec {
  private val url = "jdbc:derby:memory:graftdb;create=true"
  private lazy val target = new JdbcCatalog(Endpoint(url))

  test("DDL replay + truncate-load + discovery + read-back") {
    // DDL replay (reference S12: create target tables ahead of data)
    DdlReplay.replay(target, Seq(
      "CREATE TABLE nation (n_nationkey INT NOT NULL PRIMARY KEY, n_name VARCHAR(64), n_regionkey INT)"))

    val src = Tables.load(spark, sf0001, "nation")
    val sink = JdbcSink(Endpoint(url), batchRowSize = 7, numPartitions = 2)
    sink.overwrite(src, "nation")

    // discovery via DatabaseMetaData (reference S3/S4)
    assert(target.listTables().contains("nation"))
    assert(target.primaryKey("nation") == Seq("n_nationkey"))

    // read-back: lower-cased names, content-equal to source
    val back = sink.readBack(spark, "nation")
    assert(back.columns.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(Compare.contentEqual(src, back))

    // idempotent truncate-load (reference S11): second run, same result
    sink.overwrite(src, "nation")
    assert(sink.readBack(spark, "nation").count() == 25)
  }

  test("view replay: discovery, definition read, dependency-safe replay (S13)") {
    val srcUrl = "jdbc:derby:memory:graftvsrc;create=true"
    val dstUrl = "jdbc:derby:memory:graftvdst;create=true"
    val src = new JdbcCatalog(Endpoint(srcUrl))
    val dst = new JdbcCatalog(Endpoint(dstUrl))
    val baseDdl = "CREATE TABLE base_t (id INT NOT NULL PRIMARY KEY, v VARCHAR(16))"
    DdlReplay.replay(src, Seq(
      baseDdl,
      "INSERT INTO base_t VALUES (1, 'a')",
      "INSERT INTO base_t VALUES (2, 'b')",
      "CREATE VIEW v_upper AS SELECT id, UPPER(v) AS vv FROM base_t",
      // sorts BEFORE its base view — exercises the create retry pass
      "CREATE VIEW a_on_view AS SELECT vv FROM v_upper WHERE id > 1"))
    assert(src.listViews() == Seq("a_on_view", "v_upper"))
    assert(src.listViews(Seq("a_on_view")) == Seq("v_upper"))
    // views are NOT base tables (create-table's limit(0) path must
    // never materialize them as tables)
    assert(!src.listTables().contains("v_upper"))

    DdlReplay.replayTable(dst, "base_t", baseDdl)
    val r1 = DdlReplay.replayViews(src, dst, src.listViews())
    assert(r1.forall(_._2.isRight), r1.toString)
    dst.execute("INSERT INTO base_t VALUES (5, 'x')")
    assert(dst.rowCount(spark, "v_upper") == 1)
    assert(dst.rowCount(spark, "a_on_view") == 1)

    // idempotent re-replay: Derby refuses to drop a view a dependent
    // reads, so the drop phase must fell a_on_view first
    val r2 = DdlReplay.replayViews(src, dst, src.listViews())
    assert(r2.forall(_._2.isRight), r2.toString)
    assert(dst.rowCount(spark, "a_on_view") == 1)
  }

  test("custom-SQL mode pushes each configured SELECT to the source verbatim") {
    DdlReplay.replay(target, Seq(
      "CREATE TABLE src_n (k INT NOT NULL PRIMARY KEY, v VARCHAR(32))"))
    import org.apache.spark.sql.functions._
    val df = spark.range(20).select(
      col("id").cast("int").as("k"), concat(lit("v"), col("id")).as("v"))
    JdbcSink(Endpoint(url)).overwrite(df, "src_n")

    val cfg = SyncConfig(
      Endpoint(url), Endpoint(url),
      tables = Map("paged_copy" -> Seq(
        "SELECT k, v FROM src_n WHERE k < 10",
        "SELECT k, v FROM src_n WHERE k >= 10")))
    val reports = Sync.syncCustom(spark, Endpoint(url), JdbcSink(Endpoint(url)), cfg)
    assert(reports.forall(_.ok), reports.mkString(";"))
    assert(reports.head.rows == 20)
    val back = JdbcSink(Endpoint(url)).readBack(spark, "paged_copy")
    assert(back.count() == 20 && back.columns.toSeq == Seq("k", "v"))
  }

  test("exclusion filtering works over JDBC discovery") {
    DdlReplay.replay(target, Seq("CREATE TABLE skipme (id INT)"))
    assert(!target.listTables(Seq("skipme")).contains("skipme"))
    assert(target.listTables().contains("skipme"))
  }

  test("replayTable drops-and-recreates; a failed replay rolls back") {
    val create = "CREATE TABLE replay_t (id INT, v VARCHAR(8))"
    // fresh target: no drop needed, plain create
    DdlReplay.replayTable(target, "replay_t", create)
    target.execute("INSERT INTO replay_t VALUES (1, 'a')")
    // existing target: metadata-probed drop + recreate in one txn —
    // the old rows must be gone
    DdlReplay.replayTable(target, "replay_t", create)
    assert(target.rowCount(spark, "replay_t") == 0)
    // failed create: the drop that preceded it must roll back, leaving
    // the previous table (and its rows) intact
    target.execute("INSERT INTO replay_t VALUES (2, 'b')")
    intercept[java.sql.SQLException] {
      DdlReplay.replayTable(target, "replay_t", "CREATE TABLE replay_t (broken")
    }
    assert(target.tableExists("replay_t"),
      "failed replay must not leave the target dropped")
    assert(target.rowCount(spark, "replay_t") == 1)
  }

  test("replay prologue: MySQL-wire gets FK-off + drop-if-exists, others probe") {
    assert(DdlReplay.prologue(mysqlWire = true, "t1", exists = sys.error("not consulted")) ==
      Seq("SET FOREIGN_KEY_CHECKS=0", "drop table if exists `t1` cascade"))
    assert(DdlReplay.prologue(mysqlWire = false, "t1", exists = true) ==
      Seq("DROP TABLE t1"))
    assert(DdlReplay.prologue(mysqlWire = false, "t1", exists = false).isEmpty)
  }
}
