package graft.sync

import org.apache.spark.sql.SparkSession

/** Per-table completion ledger for RESUMABLE full sync — closes the
  * round-12 "what's missing #3": an interrupted plain `sync` used to
  * restart from zero (the reference shares this; its rerun recopies
  * everything, cmd/root.go:58-208). Each table that commits writes one
  * (table, rows) row here through [[graft.operators.StagedSwap]] (the
  * HistogramIngest ledger discipline: the live path is never
  * half-written, an interrupted swap restores), so a killed run's rerun
  * skips completed tables and re-runs only the interrupted one.
  *
  * Lifecycle: the ledger exists only while a run is IN PROGRESS. When
  * every table of a run reports ok, [[Sync.syncAll]] clears it — the
  * next `sync` is a fresh full load, matching truncate-load semantics
  * run-over-run. `--from-scratch` clears it up front.
  *
  * Concurrency: tables commit from [[Sync.parMap]]'s driver threads —
  * a JVM lock serializes those — and, since round 14, a filesystem
  * lock ([[withFsLock]]) serializes DIFFERENT drivers pointed at the
  * same ledger dir: two concurrent `sync --ledger` runs no longer
  * interleave the read-union-swap and lose each other's commits
  * (round-13 review). The critical section is a tables-sized parquet
  * write, so holding an FS lock across it costs microseconds relative
  * to the table syncs themselves.
  */
object SyncLedger {

  private val lock = new Object

  private def livePath(dir: String) = new org.apache.hadoop.fs.Path(s"$dir/ledger")
  private def lockPath(dir: String) = new org.apache.hadoop.fs.Path(s"$dir/ledger_lock")

  private def fsFor(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Cross-process mutual exclusion for the ledger's read-union-swap:
    * atomic create-if-absent of a lock sentinel (HDFS and local FS
    * both guarantee `create(overwrite = false)` fails if the path
    * exists). A holder that died inside the critical section leaves
    * the sentinel behind — any lock older than `staleMs` is adopted
    * as orphaned (rename-won, so exactly one adopter); the critical
    * section is a sidecar-sized parquet write, so a healthy holder
    * never keeps the lock anywhere near that long. Waiting contenders
    * spin with a short sleep and give up with a usable error after
    * `timeoutMs` (naming the holder recorded inside the sentinel).
    *
    * This is a LEASE, not a fenced lock (review note): a holder
    * stalled past `staleMs` can be adopted while still alive, and the
    * two may interleave — `staleMs` must dominate the worst-case
    * critical section (default 10 min vs a seconds-long write) for
    * the exclusion to hold. Release is OWNERSHIP-CHECKED: the holder
    * deletes the sentinel only if it still carries its own tag, so a
    * stalled holder that WAS adopted cannot release the adopter's
    * lock and let a third writer in. */
  private[sync] def withFsLock[T](
      spark: SparkSession, dir: String,
      staleMs: Long = 10L * 60 * 1000,
      timeoutMs: Long = 2L * 60 * 1000)(body: => T): T = {
    val lp = lockPath(dir)
    val fs = fsFor(spark, lp)
    val tag =
      s"${java.lang.ProcessHandle.current().pid()}@" +
        s"${java.net.InetAddress.getLocalHost.getHostName}:" +
        java.util.UUID.randomUUID().toString
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var acquired = false
    while (!acquired) {
      try {
        val out = fs.create(lp, false)
        try out.write(tag.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        acquired = true
      } catch {
        case _: java.io.IOException =>
          val stale =
            try fs.getFileStatus(lp).getModificationTime <
              System.currentTimeMillis() - staleMs
            catch { case _: java.io.FileNotFoundException => false }
          if (stale) {
            // adopt the orphan via rename: exactly ONE contender wins
            // the rename (a plain delete could clobber the fresh lock
            // a faster adopter just created); losers loop and
            // re-contend on create-if-absent
            val orphan = new org.apache.hadoop.fs.Path(
              lp.toString + "_stale_" + java.util.UUID.randomUUID())
            if (fs.rename(lp, orphan)) fs.delete(orphan, false)
          }
          else if (System.nanoTime() > deadline) {
            val holder =
              try {
                val in = fs.open(lp)
                try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
              } catch { case _: Exception => "<unknown>" }
            throw new IllegalStateException(
              s"ledger at $dir is locked by $holder — another sync " +
                "--ledger run is writing it; wait for it, or delete " +
                s"$lp if that run is known dead")
          } else Thread.sleep(50)
      }
    }
    try body
    finally {
      // release only OUR sentinel: if a contender adopted us as stale
      // mid-section, the sentinel on disk is theirs now — deleting it
      // would hand the ledger to a third writer while they still hold
      val ours =
        try graft.operators.StagedSwap.readSidecar(fs, lp) == tag
        catch { case _: Exception => false }
      if (ours) fs.delete(lp, false)
      ()
    }
  }

  private def completedUnlocked(
      spark: SparkSession, dir: String): Map[String, Long] = {
    val live = livePath(dir)
    val fs = fsFor(spark, live)
    graft.operators.StagedSwap.restoreIfInterrupted(fs, live)
    if (!fs.exists(live)) Map.empty
    else spark.read.parquet(live.toString)
      .collect()
      .map(r => r.getAs[String]("table") -> r.getAs[Long]("rows"))
      .toMap
  }

  /** Tables already committed by the interrupted run (with their row
    * counts) — empty when no run is in progress. */
  def completed(spark: SparkSession, dir: String): Map[String, Long] =
    lock.synchronized {
      withFsLock(spark, dir)(completedUnlocked(spark, dir))
    }

  /** Record `table` as committed. Idempotent per table (last write
    * wins on rows). Serialized against every other ledger writer —
    * same-JVM threads by the object lock, other drivers by the FS
    * lock — so no interleaving can drop a committed table. */
  def markDone(spark: SparkSession, dir: String, table: String, rows: Long): Unit =
    lock.synchronized {
      withFsLock(spark, dir) {
        val entries = (completedUnlocked(spark, dir) + (table -> rows)).toSeq
        import spark.implicits._
        val live = livePath(dir)
        val fs = fsFor(spark, live)
        val tmp = graft.operators.StagedSwap.tmpPath(live)
        entries.toDF("table", "rows")
          .coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        graft.operators.StagedSwap.swapIn(fs, live, tmp)
      }
    }

  /** Close the ledger (run complete, or `--from-scratch`). */
  def clear(spark: SparkSession, dir: String): Unit = lock.synchronized {
    withFsLock(spark, dir) {
      val live = livePath(dir)
      val fs = fsFor(spark, live)
      graft.operators.StagedSwap.restoreIfInterrupted(fs, live)
      if (fs.exists(live)) fs.delete(live, true)
      ()
    }
  }
}
