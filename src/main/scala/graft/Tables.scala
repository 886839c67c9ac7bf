package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Fixture-table loader. One parquet file per table under a scale-factor
  * directory (see TESTDATA.md). Columns arrive lower-cased already; the
  * reference force-lowercases names (cmd/root.go:313-314), and
  * [[graft.sync.Normalize]] reproduces that for arbitrary sources.
  */
object Tables {
  val tpch: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extension: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ extension

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS); with nanosAsLong it
    // arrives as an ns-epoch long — convert with exact integer µs
    // division (values are µs-granularity, so nothing truncates).
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
