package graft.tools

import org.apache.spark.sql.functions._

/** Scratch harness for the q42 TableProfile decomposition — times the
  * plain-metrics aggregation leg and the exact-distinct leg separately,
  * plus encoding variants of the distinct leg. Not part of any query
  * path; kept for reproducibility of OPTIMIZATION_r19.md numbers.
  *
  * Usage: runMain graft.tools.ProfileAb [sfDir] [runs]
  */
object ProfileAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .builder("graft-profile-ab").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Tables.load(spark, sfDir, "lineitem")
    val cols = df.columns.toSeq

    def time(tag: String, mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    time("full", graft.operators.TableProfile.profile(df, useSketch = false))
    time("distinct-leg", graft.operators.TableProfile.exactDistinct(df, cols))
    // the plain-metrics leg = full − distinct (one map-side-combined
    // aggregation pass); timed here as the sketch-tier profile minus
    // its (cheap) HLL rows to get a comparable single-pass number
    time("plain-leg(sketch-tier)",
      graft.operators.TableProfile.profile(df, useSketch = true))
    // variant: numeric columns shuffled as longs (null string field),
    // strings as strings — same distinct semantics, no toString for
    // numerics
    time("distinct-typed", {
      import org.apache.spark.sql.types._
      val pairs = graft.operators.Parallelism.ensureMin(df)
        .select(explode(array(cols.zipWithIndex.map { case (n, i) =>
          df.schema(n).dataType match {
            case ByteType | ShortType | IntegerType | LongType =>
              struct(lit(i).as("ci"), col(n).cast("long").as("vl"),
                lit(null).cast("string").as("vs"))
            case TimestampType | TimestampNTZType =>
              struct(lit(i).as("ci"),
                unix_micros(col(n).cast("timestamp")).as("vl"),
                lit(null).cast("string").as("vs"))
            case FloatType | DoubleType =>
              // exact IEEE: -0.0 normalizes via +0.0; NaN handled by
              // cast (all NaN equal after nanvl)
              struct(lit(i).as("ci"), lit(null).cast("long").as("vl"),
                (col(n) + lit(0.0)).cast("string").as("vs"))
            case _ =>
              struct(lit(i).as("ci"), lit(null).cast("long").as("vl"),
                col(n).cast("string").as("vs"))
          }
        }: _*)).as("r"))
        .select("r.ci", "r.vl", "r.vs")
        .where(col("vl").isNotNull || col("vs").isNotNull)
      pairs.distinct().groupBy("ci").agg(count(lit(1)).as("distinct"))
    })
    spark.stop()
  }
}
