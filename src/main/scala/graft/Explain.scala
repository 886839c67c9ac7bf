package graft

import graft.queries.Registry

/** Plan-inspection tool: prints the formatted physical plan of each
  * named query (or every bench-flagged one) so pushdown, broadcast
  * choice, and whole-stage-codegen spans can be reviewed.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Registry.all.filter(_.bench).map(_.name)
    val spark = GraftSession.builder("graft-explain").master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Registry.byName(n).run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
