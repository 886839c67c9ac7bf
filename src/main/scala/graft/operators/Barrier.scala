package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage barrier for sketch tables that are about to be self-joined
  * (minhash signatures, simhash fingerprints, LSH bucket tables, CC
  * label frontiers): materialize once so the join lineage doesn't
  * recompute the sketch per candidate pair.
  *
  * Two implementations, selected by `spark.graft.checkpointDir`:
  *
  *   - unset (default): eager `localCheckpoint` — blocks live on the
  *     executors and are freed by the ContextCleaner when the result
  *     plan is dropped. Right for single-node / short-lived jobs, but
  *     the blocks have no replication: on a multi-node cluster a lost
  *     executor kills every dependent stage.
  *   - set: eager reliable `checkpoint()` into that directory (HDFS/
  *     object store on a real cluster) — survives executor loss, the
  *     right barrier for 1000-executor runs where losing one of the
  *     32+ hosts mid-LSH is routine, at the cost of a write+read
  *     round trip through the checkpoint store.
  */
object Barrier {

  val ConfKey = "spark.graft.checkpointDir"

  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        // setCheckpointDir appends a fresh UUID subdir on every call —
        // only (re)set when unset or when the configured base changed
        val sc = spark.sparkContext
        if (!sc.getCheckpointDir.exists(_.contains(stripScheme(dir))))
          sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None =>
        df.localCheckpoint(eager = true)
    }
  }

  private def stripScheme(dir: String): String = {
    val noScheme = dir.indexOf("://") match {
      case -1 => dir
      case i  => dir.substring(i + 3)
    }
    noScheme.stripSuffix("/")
  }
}
