package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the settings every entry point (Verify, Bench,
  * tests, CLI) shares. Local mode here, but every knob is chosen so the
  * same code lands well on a multi-executor cluster:
  *   - shuffle.partitions sized to cores (not the 200 default) locally;
  *     on a real cluster AQE coalescing makes the exact number soft.
  *   - AQE on: runtime re-plan (skew-join splitting, partition
  *     coalescing, broadcast-join demotion/promotion at 100 TB scale).
  *   - UTC session time zone for oracle (DuckDB) parity.
  */
object GraftSession {
  def builder(appName: String = "graft"): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      // register graft's custom expressions as SQL functions
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // respect the advisory partition size when coalescing instead of
      // keeping one post-shuffle partition per core: small shuffles
      // collapse to few tasks (less scheduling overhead), large
      // shuffles still split by size — the setting Spark's own docs
      // recommend for production
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.compression.codec", "snappy")
      // fixture `events.ts` is parquet TIMESTAMP(NANOS), which Spark's
      // reader rejects by default; read as raw ns longs and convert in
      // Tables.load (exact integer µs division)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // reliable checkpoints (Barrier with spark.graft.checkpointDir
      // set) are one-shot sketch materializations: let the
      // ContextCleaner delete them once their RDD is GC'd instead of
      // accumulating one full table copy per Barrier call. Read at
      // SparkContext construction, so it must be set here, not at
      // Barrier time.
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
  }

  /** Local session for tests/tools; cluster deployments use spark-submit
    * and only pick up the conf defaults from [[builder]]. */
  def local(appName: String = "graft", cores: String = "*"): SparkSession = {
    val s = builder(appName).master(s"local[$cores]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
