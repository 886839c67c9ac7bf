package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch interleaved A/B for the q42 distinct-leg float encoding
  * (r20 verdict item 4): STRING — float/double cells render
  * `(x + 0.0).cast(string)` (the r19 shape) — vs BITS — cells ride
  * [[graft.functions.DoubleBits]] as exact longs (the r20 shape).
  * Both run the identical explode → distinct → per-column count over
  * sf lineitem, alternating in ONE JVM so the floor cancels. Also
  * verifies the two encodings produce identical per-column counts.
  *
  * Usage: runMain graft.tools.Q42Ab [sfDir] [rounds]
  */
object Q42Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .builder("graft-q42-ab").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Tables.load(spark, sfDir, "lineitem")
    val cols = df.columns.toSeq

    def leg(floatAsBits: Boolean): DataFrame = {
      val nullS = lit(null).cast("string")
      val nullL = lit(null).cast("long")
      val pairs = graft.operators.Parallelism.ensureMin(df)
        .select(explode(array(
          cols.zipWithIndex.map { case (n, i) =>
            val (vl, vs) = df.schema(n).dataType match {
              case ByteType | ShortType | IntegerType | LongType =>
                (col(n).cast("long"), nullS)
              case TimestampType | TimestampNTZType =>
                (unix_micros(col(n).cast("timestamp")), nullS)
              case FloatType | DoubleType if floatAsBits =>
                (graft.functions.DoubleBits(
                  (col(n) + lit(0.0)).cast("double")), nullS)
              case FloatType | DoubleType =>
                (nullL, (col(n) + lit(0.0)).cast("string"))
              case _ => (nullL, col(n).cast("string"))
            }
            struct(lit(i).as("ci"), vl.as("vl"), vs.as("vs"))
          }: _*)).as("r")).select("r.ci", "r.vl", "r.vs")
        .where(col("vl").isNotNull || col("vs").isNotNull)
      pairs.distinct().groupBy("ci").agg(count(lit(1)).as("distinct"))
    }

    val a = leg(floatAsBits = false).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = leg(floatAsBits = true).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    println(s"counts equal: ${a == b} ${if (a == b) "" else s"$a vs $b"}")

    def run(tag: String, mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$tag: $dt%.3f s")
      dt
    }
    var s = List.empty[Double]; var bt = List.empty[Double]
    (1 to rounds).foreach { _ =>
      s ::= run("string", leg(floatAsBits = false))
      bt ::= run("bits  ", leg(floatAsBits = true))
    }
    println(f"string min ${s.min}%.3f med ${s.sorted.apply(s.size / 2)}%.3f")
    println(f"bits   min ${bt.min}%.3f med ${bt.sorted.apply(bt.size / 2)}%.3f")
    spark.stop()
    if (a != b) sys.exit(1)
  }
}
