package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.Decontaminate

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // bench doc 100 shares its 10-token prefix with train doc 1; train
  // doc 2 is clean; train doc 3 is shorter than one span
  private val leaked = (1 to 10).map(i => s"q$i").mkString(" ")
  private lazy val bench = Seq(
    (100L, s"$leaked bench tail"),
    (101L, "other benchmark item entirely disjoint from training")
  ).toDF("doc_id", "text")
  private lazy val train = Seq(
    (1L, s"$leaked training continuation here"),
    (2L, "a perfectly clean training document with its own words only present here"),
    (3L, "tiny")
  ).toDF("doc_id", "text")

  private lazy val keys = Decontaminate.benchmarkKeys(bench, col("text"))

  test("profile counts overlapping spans per training document") {
    val p = Decontaminate
      .profile(train, col("text"), col("doc_id"), keys)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    val byId = p.map(r => r._1 -> r).toMap
    // doc 1: 13 tokens -> 6 spans; spans 1..3 sit inside the leaked
    // 10-token prefix and also occur in bench doc 100
    assert(byId(1L)._2 == 6 && byId(1L)._3 == 3 && byId(1L)._4)
    assert(byId(2L)._3 == 0 && !byId(2L)._4)
    // short doc: its single whole-stream span is not in the bench set
    assert(byId(3L) == ((3L, 1L, 0L, false)))
  }

  test("dropContaminated removes exactly the overlapping documents") {
    val kept = Decontaminate
      .dropContaminated(train, col("text"), "doc_id", keys)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(2L, 3L)))
  }

  test("the contamination test joins broadcast, never shuffles the corpus side") {
    val plan = Decontaminate
      .profile(train, col("text"), col("doc_id"), keys)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark key set must broadcast:\n$plan")
  }

  test("a document sharing a span with itself only is clean") {
    // internal repetition must not count as benchmark contamination
    val selfRep = Seq((9L, s"$leaked $leaked")).toDF("doc_id", "text")
    val cleanKeys = Decontaminate.benchmarkKeys(
      Seq((200L, "completely unrelated benchmark prose")).toDF("doc_id", "text"),
      col("text"))
    val p = Decontaminate
      .profile(selfRep, col("text"), col("doc_id"), cleanKeys)
      .as[(Long, Long, Long, Boolean)].head()
    assert(p._3 == 0 && !p._4)
  }
}
