package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    // events.ts has shipped as two physical shapes across fixture
    // generations; normalize both to session-zoned TIMESTAMP so every
    // downstream consumer (windows, watermarks, unix_micros) sees one
    // type. The session zone is pinned UTC (build.sbt/GraftSession),
    // so both conversions denote the identical instant:
    //  - TIMESTAMP(NANOS): read as ns-epoch long under nanosAsLong —
    //    exact integer µs division (values are µs-granularity).
    //  - timestamp[us] without tz metadata: arrives TIMESTAMP_NTZ —
    //    cast reinterprets the wall-clock as UTC.
    if (name == "events")
      df.schema("ts").dataType match {
        case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    else df
  }
}
