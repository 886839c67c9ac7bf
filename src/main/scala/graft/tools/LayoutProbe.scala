package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Barrier

/** One-JVM probe for the r20 Barrier layout surfacing: verifies that a
  * keyed barrier's partitioning is visible to Catalyst (downstream
  * keyed consumers plan no Exchange) and that results stay identical
  * to the un-keyed form. Prints plan excerpts + verdicts; exits 1 on
  * any mismatch.
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("layout-probe").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val df = (1 to 100000).map(i => (i.toLong % 997, i.toLong)).toDF("g", "v")

    def exchanges(p: org.apache.spark.sql.DataFrame): Int =
      "Exchange (?!SinglePartition)".r
        .findAllIn(p.queryExecution.executedPlan.toString).size

    var failed = false
    def check(name: String, cond: Boolean, detail: String): Unit = {
      println(s"[probe] $name: ${if (cond) "OK" else "FAIL"} ($detail)")
      if (!cond) failed = true
    }

    // 1. plain localCheckpoint via Dataset API loses partitioning (the
    //    upstream behavior this round fixes)
    val plainCp = df.repartition(8, col("g")).localCheckpoint(true)
    val plainAgg = plainCp.groupBy("g").count()
    val plainEx = exchanges(plainAgg)
    println(s"[probe] Dataset.localCheckpoint groupBy exchanges = $plainEx")

    // 2. keyed barrier: groupBy must plan no exchange
    val kb = Barrier.keyed(df, "g")
    val kbAgg = kb.groupBy("g").count()
    val kbEx = exchanges(kbAgg)
    check("keyed-barrier groupBy elides exchange", kbEx == 0, s"exchanges=$kbEx")

    // 3. join of two frames keyed the same way: no exchange either side
    val kb2 = Barrier.keyed(df.groupBy("g").agg(sum("v").as("s")), "g")
    val j = kb.join(kb2, Seq("g"))
    val jEx = exchanges(j)
    val jShuffle = "Exchange hashpartitioning".r
      .findAllIn(j.queryExecution.executedPlan.toString).size
    check("keyed-barrier co-partitioned join elides shuffles", jShuffle == 0,
      s"shuffleExchanges=$jShuffle totalExchanges=$jEx")
    if (jEx != jShuffle) println(j.queryExecution.executedPlan.toString.take(1500))

    // 4. results identical to the un-keyed form
    val ref = df.groupBy("g").count().withColumnRenamed("count", "c")
    val got = kbAgg.withColumnRenamed("count", "c")
    val diff = ref.exceptAll(got).count() + got.exceptAll(ref).count()
    check("keyed-barrier agg values identical", diff == 0, s"diff=$diff")

    // 5. clustered-superset: partitioned by g satisfies groupBy(g, v)
    val kbAgg2 = kb.groupBy("g", "v").count()
    val kb2Ex = exchanges(kbAgg2)
    check("subset-key clustering elides exchange", kb2Ex == 0,
      s"exchanges=$kb2Ex")

    // 6. plain Barrier AFTER an elided co-partitioned join re-surfaces
    //    the join's partitioning (the CC round-loop steady state)
    val again = Barrier(j.select(col("g"), (col("v") + col("s")).as("w")))
    val againAgg = again.groupBy("g").count()
    val againEx = exchanges(againAgg)
    check("post-join plain Barrier re-surfaces layout", againEx == 0,
      s"exchanges=$againEx")

    // 7. reliable-checkpoint mode surfaces too
    spark.conf.set(Barrier.ConfKey, "/tmp/layout_probe_ckpt")
    val rb = Barrier.keyed(df, "g")
    val rbEx = exchanges(rb.groupBy("g").count())
    check("reliable keyed barrier elides exchange", rbEx == 0,
      s"exchanges=$rbEx")
    val rdiff = rb.groupBy("g").count().withColumnRenamed("count", "c")
      .exceptAll(ref).count()
    check("reliable keyed barrier values identical", rdiff == 0, s"diff=$rdiff")
    spark.conf.unset(Barrier.ConfKey)

    println(if (failed) "[probe] FAILED" else "[probe] ALL OK")
    spark.stop()
    if (failed) sys.exit(1)
  }
}
