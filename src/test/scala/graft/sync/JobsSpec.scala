package graft.sync

import scala.concurrent.{Await, Promise}
import scala.concurrent.duration.Duration

import graft.SparkSpec

class JobsSpec extends SparkSpec {

  test("tagSql prefixes the processlist-visible comment tag once") {
    assert(Jobs.SqlTag == s"/* graft ${Jobs.RunId} */")
    assert(Jobs.tagSql("SELECT 1") == s"${Jobs.SqlTag} SELECT 1")
    assert(Jobs.tagSql(Jobs.tagSql("SELECT 1")) == s"${Jobs.SqlTag} SELECT 1")
  }

  test("cancelJobGroup aborts a tagged long-running job") {
    val done = Promise[Option[Throwable]]()
    val runner = new Thread(() =>
      try {
        Jobs.tagged(spark, "graft-kill-me") {
          spark.range(0, 4, 1, 4).rdd.foreach { _ =>
            var i = 0
            while (i < 600) { Thread.sleep(100); i += 1 } // ~60s unless killed
          }
        }
        done.success(None)
      } catch { case e: Throwable => done.success(Some(e)) })
    runner.start()
    // wait until the group's job is actually registered — a fixed sleep
    // races a cold session (cancel lands before the job exists and the
    // 60s body then outlives the await)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.sparkContext.statusTracker
             .getJobIdsForGroup("graft-kill-me").isEmpty &&
           System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(spark.sparkContext.statusTracker
      .getJobIdsForGroup("graft-kill-me").nonEmpty, "job never started")
    Jobs.cancel(spark, "graft-kill-me")
    val outcome = Await.result(done.future, Duration(30, "s"))
    assert(outcome.isDefined, "job was not cancelled")
    val msg = outcome.get.getMessage
    assert(msg != null && msg.toLowerCase.contains("cancel"), msg)
  }

  test("shutdown hook arms and disarms cleanly") {
    val hook = Jobs.armShutdownCancel(spark)
    Jobs.disarm(hook) // removing proves it was registered
  }

  test("shutdown hook with endpoints arms and disarms cleanly") {
    val hook = Jobs.armShutdownCancel(spark,
      Seq(graft.config.Endpoint("jdbc:mysql://nowhere:3306/db")))
    Jobs.disarm(hook)
  }

  test("PROCESSLIST scan SQL matches the reference shape, tag included") {
    // default scan is scoped to THIS run's tag — two graft instances on
    // one endpoint must not kill each other's statements
    assert(Jobs.scanTaggedSql() ==
      "SELECT id FROM information_schema.PROCESSLIST " +
        s"WHERE info LIKE '/* graft ${Jobs.RunId} */%'")
    // explicit all-runs scan covers crashed-instance cleanup
    assert(Jobs.scanTaggedSql(allRuns = true) ==
      "SELECT id FROM information_schema.PROCESSLIST " +
        "WHERE info LIKE '/* graft %'")
  }

  test("kill statements are generated per id; non-numeric ids refused") {
    assert(Jobs.killStatements(Seq("12", "907")) ==
      Seq("KILL QUERY 12", "KILL QUERY 907"))
    assert(Jobs.killStatements(Nil).isEmpty)
    // ids are interpolated into SQL — an injection-shaped id must throw,
    // never execute
    intercept[IllegalArgumentException] {
      Jobs.killStatements(Seq("1; DROP TABLE t"))
    }
  }

  test("dialect gate: only MySQL-wire endpoints are scanned") {
    assert(Jobs.isMySqlWire("jdbc:mysql://h:3306/db"))
    assert(Jobs.isMySqlWire("jdbc:mariadb://h:3306/db"))
    assert(!Jobs.isMySqlWire("jdbc:postgresql://h:5432/db"))
    assert(!Jobs.isMySqlWire("jdbc:derby:memory:x"))
    // gated endpoint: no connection is even attempted (a connect to
    // this URL would throw — absence of error IS the assertion)
    assert(Jobs.killTagged(
      graft.config.Endpoint("jdbc:postgresql://unreachable:1/db")).isEmpty)
  }

  test("scan-and-kill walks tagged PROCESSLIST rows (Derby-faked server)") {
    // Derby can't run KILL QUERY, but it CAN host a fake
    // information_schema.PROCESSLIST — the scan runs for real; the
    // kill attempts fail with SQLException per id and are ignored,
    // like the reference's per-row error handling
    val conn = java.sql.DriverManager
      .getConnection("jdbc:derby:memory:graftjobs;create=true")
    try {
      val st = conn.createStatement()
      // unquoted, so it folds to the same case the scan's unquoted
      // schema reference folds to
      st.execute("CREATE SCHEMA INFORMATION_SCHEMA")
      st.execute(
        "CREATE TABLE information_schema.PROCESSLIST" +
          "(id VARCHAR(16), info VARCHAR(256))")
      st.execute("INSERT INTO information_schema.PROCESSLIST VALUES" +
        s"('11', '${Jobs.SqlTag} SELECT * FROM big')," +
        "('12', 'SELECT untagged')," +
        s"('13', '${Jobs.SqlTag} SELECT 2')," +
        "('14', '/* graft deadbeef0000 */ SELECT other_instance')")
      st.close()
      // own-run scan skips the other instance's tagged statement
      assert(Jobs.killTagged(conn).sorted == Seq("11", "13"))
      // all-runs scan reaps it too
      assert(Jobs.killTagged(conn, allRuns = true).sorted ==
        Seq("11", "13", "14"))
    } finally conn.close()
  }

  test("withShutdownCancel arms for the body and always disarms") {
    val before = Jobs.armTotal
    var during = -1
    Jobs.withShutdownCancel(spark) { during = Jobs.armedCount }
    assert(during >= 1, "hook not armed inside the bracket")
    assert(Jobs.armTotal == before + 1)
    assert(Jobs.armedCount == 0, "hook leaked past the bracket")
    // disarms on exception too
    intercept[RuntimeException] {
      Jobs.withShutdownCancel(spark) { throw new RuntimeException("boom") }
    }
    assert(Jobs.armedCount == 0, "hook leaked past a throwing body")
  }
}
