package graft.sync

import org.apache.spark.sql.SparkSession

/** Cooperative cancellation (SURVEY O4). The reference prefixes every
  * source query with a "goapp" SQL comment tag (cmd/root.go:359,380)
  * and, on SIGINT/SIGTERM, scans `information_schema.PROCESSLIST` for
  * tagged queries and kills each (cmd/app.go:161-191).
  *
  * Spark-shaped, the same two halves are:
  *   - tagging = a job group (`setJobGroup` with interruptOnCancel), so
  *     every job a pipeline submits is addressable as a unit, plus the
  *     same literal SQL comment on pushed-down query text so a DBA sees
  *     the tag in the source database's processlist;
  *   - kill = `cancelJobGroup` (task interrupt propagates to the JDBC
  *     fetch via Statement.cancel in the driver), armed from a JVM
  *     shutdown hook instead of a hand-rolled signal goroutine.
  */
object Jobs {

  /** Comment tag prefixed to SQL pushed to the source database —
    * the reference's "goapp" tag (cmd/root.go:359). */
  val SqlTag = "/* graft */"

  def tagSql(sql: String): String =
    if (sql.startsWith(SqlTag)) sql else s"$SqlTag $sql"

  /** Run `body` with every Spark job it submits in group `group`,
    * with interrupt-on-cancel so JDBC fetches die promptly. */
  def tagged[A](spark: SparkSession, group: String, desc: String = "")(
      body: => A): A = {
    val sc = spark.sparkContext
    sc.setJobGroup(group, if (desc.isEmpty) group else desc,
      interruptOnCancel = true)
    try body
    finally sc.clearJobGroup()
  }

  def cancel(spark: SparkSession, group: String): Unit =
    spark.sparkContext.cancelJobGroup(group)

  /** Arm a shutdown hook cancelling all in-flight jobs — the
    * reference's SIGINT handler (cmd/app.go:161-177). Returns the hook
    * thread so tests/callers can disarm. */
  def armShutdownCancel(spark: SparkSession): Thread = {
    val hook = new Thread(() =>
      try spark.sparkContext.cancelAllJobs()
      catch { case _: Throwable => () })
    Runtime.getRuntime.addShutdownHook(hook)
    hook
  }

  def disarm(hook: Thread): Unit =
    try Runtime.getRuntime.removeShutdownHook(hook)
    catch { case _: IllegalStateException => () }
}
