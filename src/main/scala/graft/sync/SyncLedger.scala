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
  * Concurrency: tables commit from [[Sync.parMap]]'s driver threads;
  * the read-union-swap is serialized on a JVM lock (one driver owns a
  * sync run — the reference's model too). The ledger is tables-sized,
  * so the collect is bounded by the catalog, never data.
  */
object SyncLedger {

  private val lock = new Object

  private def livePath(dir: String) = new org.apache.hadoop.fs.Path(s"$dir/ledger")

  private def fsFor(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Tables already committed by the interrupted run (with their row
    * counts) — empty when no run is in progress. */
  def completed(spark: SparkSession, dir: String): Map[String, Long] = {
    val live = livePath(dir)
    val fs = fsFor(spark, live)
    graft.operators.StagedSwap.restoreIfInterrupted(fs, live)
    if (!fs.exists(live)) Map.empty
    else spark.read.parquet(live.toString)
      .collect()
      .map(r => r.getAs[String]("table") -> r.getAs[Long]("rows"))
      .toMap
  }

  /** Record `table` as committed. Idempotent per table (last write
    * wins on rows). */
  def markDone(spark: SparkSession, dir: String, table: String, rows: Long): Unit =
    lock.synchronized {
      val entries = (completed(spark, dir) + (table -> rows)).toSeq
      import spark.implicits._
      val live = livePath(dir)
      val fs = fsFor(spark, live)
      val tmp = graft.operators.StagedSwap.tmpPath(live)
      entries.toDF("table", "rows")
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      graft.operators.StagedSwap.swapIn(fs, live, tmp)
    }

  /** Close the ledger (run complete, or `--from-scratch`). */
  def clear(spark: SparkSession, dir: String): Unit = lock.synchronized {
    val live = livePath(dir)
    val fs = fsFor(spark, live)
    graft.operators.StagedSwap.restoreIfInterrupted(fs, live)
    if (fs.exists(live)) fs.delete(live, true)
  }
}
