package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.dedup.MinHashLSH

/** Incremental near-dup: a new batch deduped against a persisted
  * corpus LSH index without re-processing the corpus. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private lazy val corpus = Seq(
    (2L, base),
    (4L, "completely different corpus content about spark partitions and shuffles"),
    (6L, "yet another unrelated document speaking of benchmarks and latencies")
  ).toDF("doc_id", "text")
  // 11 is a near-copy of corpus doc 2; 13 is novel; 2 re-ingests doc 2
  private lazy val increment = Seq(
    (11L, base + " tonight"),
    (13L, "a wholly new document with nothing in common with the corpus at all"),
    (2L, base)
  ).toDF("doc_id", "text")

  private val p = MinHashLSH.Params(
    shingleSize = 5, numHashes = 48, bands = 12, threshold = 0.3, maxBucket = 1000)

  test("the gate's payload expansion derives from the banding params") {
    // round-19 advice: the broadcast relation carries a FIXED per-doc
    // payload (bands x numHashes-wide sig), so a constant 4x under-
    // gated short documents. 48/12 defaults: 12 x (8*48 + 48) = 5184
    // bytes/doc over a 256-byte raw-row floor = ceil -> 21x.
    assert(MinHashLSH.incrementPayloadExpansion(12, 48) == 21)
    assert(MinHashLSH.IncrementPayloadExpansion == 21)
    // denser banding inflates further; trivial banding floors at 4x
    assert(MinHashLSH.incrementPayloadExpansion(48, 48) >
      MinHashLSH.incrementPayloadExpansion(12, 48))
    assert(MinHashLSH.incrementPayloadExpansion(1, 8) == 4)
  }

  test("increment pairs find cross-batch near-dups and re-ingests, not novel docs") {
    val index = MinHashLSH.buildIndex(corpus, col("text"), col("doc_id"), p)
    val pairs = MinHashLSH
      .pairsAgainstIndex(index, increment, col("text"), col("doc_id"), p)
      .select("id_new", "id_old").as[(Long, Long)].collect().toSet
    assert(pairs.contains((11L, 2L)), s"near-copy not found: $pairs")
    assert(pairs.contains((2L, 2L)), s"re-ingest not flagged: $pairs")
    assert(!pairs.exists(_._1 == 13L), s"novel doc misflagged: $pairs")
  }

  test("dedupAgainstIndex keeps exactly the novel increment rows") {
    val index = MinHashLSH.buildIndex(corpus, col("text"), col("doc_id"), p)
    val kept = MinHashLSH
      .dedupAgainstIndex(index, increment, col("text"), "doc_id", p)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(13L)), kept.mkString(","))
  }

  test("index write/read round trip gives identical pairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_idx").toString
    val index = MinHashLSH.buildIndex(corpus, col("text"), col("doc_id"), p)
    MinHashLSH.writeIndex(index, dir)
    val back = MinHashLSH.readIndex(spark, dir)
    val live = MinHashLSH
      .pairsAgainstIndex(index, increment, col("text"), col("doc_id"), p)
      .collect().map(_.toSeq).toSet
    val persisted = MinHashLSH
      .pairsAgainstIndex(back, increment, col("text"), col("doc_id"), p)
      .collect().map(_.toSeq).toSet
    assert(live == persisted)
  }

  test("the corpus index streams through a broadcast join — no corpus-side shuffle or sort-merge") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_idx2").toString
    MinHashLSH.writeIndex(
      MinHashLSH.buildIndex(corpus, col("text"), col("doc_id"), p), dir)
    val back = MinHashLSH.readIndex(spark, dir)
    val plan = MinHashLSH
      .pairsAgainstIndex(back, increment, col("text"), col("doc_id"), p)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus side merged-sorted:\n$plan")
  }

  test("the increment broadcast is GATED: hinted small, shuffled big, same pairs") {
    // round-18 1000x smoke finding: the unconditional broadcast hint
    // collected a corpus-scale "increment" to the driver and aborted
    // on spark.driver.maxResultSize — "small relative to the corpus"
    // is not "small in absolute terms". Below the gate the increment
    // rides the hint (the plan spec above); at a forced-zero ceiling
    // the same call must plan a shuffled join AND return identical
    // pairs. autoBroadcastJoinThreshold is disabled for the gated-off
    // plan so Spark's own size heuristic (which would re-broadcast
    // this tiny fixture) cannot mask the gate.
    val index = MinHashLSH.buildIndex(corpus, col("text"), col("doc_id"), p)
    def innerBroadcast(plan: String): Boolean =
      plan.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("Inner"))
    val hinted = MinHashLSH
      .pairsAgainstIndex(index, increment, col("text"), col("doc_id"), p)
    assert(innerBroadcast(hinted.queryExecution.executedPlan.toString),
      "a small increment must ride the broadcast hint")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val gated =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val g = MinHashLSH.pairsAgainstIndex(
          index, increment, col("text"), col("doc_id"), p,
          broadcastBytes = 0L)
        assert(!innerBroadcast(g.queryExecution.executedPlan.toString),
          "an above-gate increment must not be collected for broadcast")
        g.collect().map(_.toSeq).toSet
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(hinted.collect().map(_.toSeq).toSet == gated,
      "the gated-off plan changed the pairs")
    // the portable twin carries the same gate
    val pHinted = graft.operators.dedup.PortableMinHash
      .incrementalPairs(corpus, increment, col("text"), col("doc_id"), 0.3)
      .collect().map(_.toSeq).toSet
    val pGated =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        graft.operators.dedup.PortableMinHash
          .incrementalPairs(corpus, increment, col("text"), col("doc_id"), 0.3,
            broadcastBytes = 0L)
          .collect().map(_.toSeq).toSet
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(pHinted == pGated, "the portable twin's gate changed the pairs")
  }

  test("hot corpus buckets are excluded from the increment join") {
    // 50 near-identical corpus docs flood their buckets past maxBucket
    val flood = (100L to 149L).map(i => (i, s"$base boiler $i")).toDF("doc_id", "text")
    val tight = p.copy(maxBucket = 10)
    val index = MinHashLSH.buildIndex(flood, col("text"), col("doc_id"), tight)
    assert(index.hot.count() > 0, "flood did not overflow any bucket")
    val pairs = MinHashLSH
      .pairsAgainstIndex(index, increment, col("text"), col("doc_id"), tight)
    // doc 11/2 collide with the flood only through capped buckets;
    // the join must complete without expanding them
    assert(pairs.count() >= 0)
    val uncapped = MinHashLSH.buildIndex(flood, col("text"), col("doc_id"), p)
    val full = MinHashLSH
      .pairsAgainstIndex(uncapped, increment, col("text"), col("doc_id"), p)
    assert(full.count() >= pairs.count(),
      "cap may only remove pairs, never invent them")
  }
}
