package graft.queries

import graft.SparkSpec

/** Physical-plan regression net: locks in the plan properties the
  * operators were designed around (pruned scans, broadcast placement,
  * pushdown, top-k without global sort), so a refactor that silently
  * degrades the plan fails fast. Complements Explain (ad-hoc review)
  * and the bench (end numbers). */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String = {
    // pins grep ReadSchema lines: a fixture cached by ANY earlier suite
    // in the shared session would splice its full-column scan into the
    // plan and fail the pruning assertions — pin against a clean cache
    spark.sharedState.cacheManager.clearCache()
    Registry.byName(name).run(spark, sf0001).queryExecution.executedPlan.toString
  }

  test("q01: scan prunes to the five needed lineitem columns") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("ReadSchema"), p)
    val schema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!schema.contains("l_orderkey") && !schema.contains("l_shipdate"),
      s"scan reads more than needed: $schema")
    assert(p.contains("HashAggregate"), "partial+final aggregate expected")
  }

  test("q01: single shuffle — partial/final aggregate, nothing else") {
    // the headline query's plan is a pure two-phase hash aggregate; any
    // extra exchange here is a regression (round-4's 2.6x bench swing
    // was environment, not plan — this pin keeps it decidable)
    val p = plan("q01_pricing_summary")
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Reused"))
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$p")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"),
      "aggregate fell out of the hash path")
  }

  test("qs09: quantized code array materializes once per row") {
    // Catalyst does not CSE higher-order-function lambdas: if the
    // codes() transform were inlined into q_sum/q_min/q_max, every
    // embedding would quantize three times per row. The floor() kernel
    // appears exactly once in the plan when the __q intermediate holds.
    val p = plan("qs09_quantize_profile")
    // count the QUANTIZE kernel (floor(x*scale + 0.5)) specifically —
    // the scale column's own floor-scaled projection also prints FLOOR
    val floors = "\\+ 0\\.5\\)".r.findAllIn(p).size
    assert(floors == 1,
      s"quantize transform duplicated ($floors kernel sites):\n$p")
  }

  test("q23: dimension joins broadcast; fact side never pre-shuffles") {
    val p = plan("q23_revenue_by_segment")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "small-dim join regressed to a sort-merge join")
  }

  test("q25: the date filter reaches the parquet scan") {
    val p = plan("q25_date_filter")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_shipdate"), s"filter not pushed: $pushed")
  }

  test("qs02: top-k is TakeOrdered, not a global sort") {
    val p = plan("qs02_topk_bruteforce")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("GlobalSort"), "unexpected global sort for top-k")
  }

  test("qs02: cosine runs as the native codegen kernel") {
    val p = plan("qs02_topk_bruteforce")
    assert(p.contains("vec_cosine") || p.contains("VectorExprsImpl") ||
      p.contains("CosineSim") || p.toLowerCase.contains("cosine"),
      "native cosine expression missing from plan")
    assert(!p.contains("zip_with"), "interpreted HOF cosine crept back in")
  }

  test("qt01: pure projection — no exchange at all") {
    val p = plan("qt01_token_stats")
    assert(!p.contains("Exchange"), s"per-row text stats should not shuffle:\n$p")
  }

  // ensureMin's parallelism floor shows as a RoundRobin REPARTITION
  // on the tiny sf0.001 files (it no-ops at scale) — the pins below
  // count only DATA shuffles (hash/range), not that fan-out
  private def dataExchanges(p: String): Int =
    p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Reused") &&
        !l.contains("RoundRobinPartitioning"))

  test("qt57: readability shuffles no data — per-row projection only") {
    val p = plan("qt57_readability")
    assert(dataExchanges(p) == 0,
      s"per-row readability should not shuffle:\n$p")
  }

  test("qs34: moments are one map-combined shuffle, d²-bounded") {
    val p = plan("qs34_embedding_moments")
    assert(dataExchanges(p) == 1,
      s"expected exactly one data shuffle:\n$p")
    assert(p.contains("HashAggregate"), "partial+final aggregate expected")
    assert(!p.contains("Join"), s"moment rollup must not plan a join:\n$p")
  }

  test("qe18: skew report broadcasts the 1-row totals back") {
    val p = plan("qe18_key_skew")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"totals must broadcast, not shuffle:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must cut without a global sort:\n$p")
  }

  test("qs36: every curve row is a TakeOrdered cut over the one scored table") {
    val p = plan("qs36_nprobe_curve")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"),
      s"1-row stat attachments must broadcast, not sort-merge:\n$p")
    assert(!p.contains("GlobalSort"), "no global sort in the curve")
  }

  test("qs37: prefix scores ride one scan; curve rows are TakeOrdered cuts") {
    val p = plan("qs37_dim_truncation_curve")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"),
      s"1-row stat attachments must broadcast, not sort-merge:\n$p")
    assert(!p.contains("GlobalSort"), "no global sort in the curve")
  }

  test("qj01: as-of join is one shuffle + one window, never a join") {
    val p = plan("qj01_asof_attribution")
    assert(!p.contains("Join"), s"asof decomposition must not plan a join:\n$p")
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Reused"))
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$p")
    // both side filters reach the parquet scans
    assert(p.contains("EqualTo(event_type,purchase)") &&
      p.contains("EqualTo(event_type,view)"), p)
  }

  test("qd34: eval bands broadcast into the corpus band scan") {
    val p = plan("qd34_fuzzy_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"the small eval side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"band join degraded to a nested loop:\n$p")
  }

  test("qe21: session cut and path leads share ONE per-user exchange") {
    val p = plan("qe21_path_ngrams")
    val winLines = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty, s"expected per-user windows:\n$p")
    winLines.foreach { l =>
      assert(l.contains("user_id"),
        s"window not partitioned by user (global single-task window):\n$l")
    }
    // session monotonicity lets the leads ride the session window's
    // exchange — a per-(user, session) window would pay a second full
    // shuffle of every event (measured 13x at 10x data before this)
    val eventExchanges = dataExchanges(p) -
      p.linesIterator.count(l => l.contains("Exchange") &&
        !l.contains("Reused") && !l.contains("RoundRobinPartitioning") &&
        !l.contains("user_id"))
    assert(eventExchanges == 1,
      s"expected exactly one per-user event shuffle:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must cut without a global sort:\n$p")
  }

  test("qj06: interval overlap stays a hash equi-join with pushed filters") {
    val p = plan("qj06_interval_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"overlap join degraded to a nested loop:\n$p")
    // both side filters reach the parquet scans
    assert(p.contains("EqualTo(event_type,purchase)") &&
      p.contains("EqualTo(event_type,view)"), p)
  }

  test("q34: global numbering has no unpartitioned window") {
    val p = plan("q34_ntile_rownum")
    // every Window node must carry a partition spec — a bare
    // `Window [...ORDER BY...]` with no partitioning is the
    // all-rows-on-one-task shape this query was rebuilt to avoid
    val winLines = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty, s"expected a per-partition window:\n$p")
    winLines.foreach { l =>
      assert(l.contains("__pid"),
        s"window not partitioned (global single-task window):\n$l")
    }
  }

  test("qt13: span table is materialized once; joins stay hash joins") {
    val p = plan("qt13_dup_spans")
    // the explode ran once, behind the Barrier — both the shared-set
    // aggregation and the join-back read the materialized span table,
    // so no Generate (explode) may appear in the final plan
    assert(!p.contains("Generate"),
      s"span explode re-evaluated instead of read from the barrier:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span join degraded to nested loop:\n$p")
  }

  test("qe01: hourly window is one shuffle — partial/final hash aggregate") {
    // r9 bench drift watch: the windowed agg must stay a pure
    // two-phase aggregate; any extra exchange is plan drift (the
    // +81% r8→r9 delta was the events.ts fixture change, not plan)
    val p = plan("qe01_hourly_window")
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Reused"))
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  test("qs10: k-means assignment is map-only — no join, no exchange") {
    // fit() runs bounded driver work up front; the ASSIGN plan itself
    // must stay a pure projection (centroids ride as literals)
    val p = plan("qs10_kmeans_assign")
    assert(!p.contains("Join"), s"assignment plans a join:\n$p")
    assert(!p.contains("Exchange"), s"assignment shuffles:\n$p")
  }

  test("qt41: segmentation is a shuffle-free projection over a pruned scan") {
    // seedVocab runs its own bounded jobs up front; the SEGMENTATION
    // plan itself (the query's returned frame) must stay map-only —
    // the DP kernel rides as a reference object, like qs10's centroids
    val p = plan("qt41_minseg_tokens")
    assert(!p.contains("Exchange"), s"segmentation shuffles:\n$p")
    assert(!p.contains("Join"), s"segmentation plans a join:\n$p")
    val schema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!schema.contains("source") && !schema.contains("lang"),
      s"scan reads more than doc_id/text: $schema")
  }

  test("qt43: growth-curve joins broadcast; cumsum runs over the bucket frame") {
    val p = plan("qt43_vocab_growth")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"10-row histogram join regressed to sort-merge:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"frame join degraded to nested loop:\n$p")
  }

  test("qs29: balance monitor is one corpus pass — map-only assignment into an 8-row histogram") {
    val p = plan("qs29_ivf_balance")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"cell-frame join regressed:\n$p")
    // exactly one scan of embeddings: assignment and base/inc flags
    // compute in the same projection
    val scans = p.linesIterator.count(l => l.contains("embeddings.parquet"))
    assert(scans == 1, s"expected one embeddings scan, got $scans:\n$p")
  }

  test("qs27: distributed batch ADC — no driver job, DPP-pruned scan, broadcast probes") {
    import org.apache.spark.sql.functions.col
    import graft.operators.similarity.IvfPq
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_plan").toString
    IvfPq.writeIndex(emb, col("embedding"), col("vec_id"), dir)
    val codes = spark.read.parquet(s"$dir/codes")
    val probes = emb.filter(col("vec_id") < 50)
    // constructing the batch result must run ZERO jobs (the old path
    // collected the probe batch to the driver here)
    spark.sparkContext.setJobGroup("qs27-construct", "construction probe")
    val df = IvfPq.adcTopKBatch(codes, probes,
      col("embedding"), col("vec_id"), topk = 3, nprobe = 3)
    Thread.sleep(1000) // status tracker is listener-fed (async)
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup("qs27-construct")
    spark.sparkContext.clearJobGroup()
    assert(jobs.isEmpty, s"plan construction ran ${jobs.length} driver job(s)")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"probe side not broadcast:\n$p")
    // the partitioned codes scan must carry a dynamic pruning filter on
    // cell — file-level restriction to the probed cells at runtime
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.toLowerCase.contains("dynamicpruning"),
      s"codes scan not dynamically pruned:\n$pf\n$p")
  }

  test("qs27/qs28 mining scale: above the gate the probe side is NOT broadcast") {
    // the serving-path test above asserts the broadcast + DPP shape;
    // this one asserts the GATE — past the ProbeBatch threshold the
    // batch paths must not hint broadcast (a broadcast relation is
    // built by collecting to the driver: multi-GB at mining scale).
    // autoBroadcastJoinThreshold is disabled so the tiny fixture
    // can't be planner-broadcast on its own; a forced hint would
    // still surface as BroadcastHashJoin, so its absence proves the
    // hint is gone. Construction must still run zero driver jobs.
    import org.apache.spark.sql.functions.col
    import graft.operators.similarity.{HardNegatives, IvfPq}
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_gate").toString
    IvfPq.writeIndex(emb, col("embedding"), col("vec_id"), dir)
    val codes = spark.read.parquet(s"$dir/codes")
    val probes = emb.filter(col("vec_id") < 50)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sparkContext.setJobGroup("qs27-gate-construct", "gate probe")
      val adc = IvfPq.adcTopKBatch(codes, probes,
        col("embedding"), col("vec_id"), topk = 3, nprobe = 3,
        thresholdBytes = 0L)
      val mined = HardNegatives.mineIvfBatch(
        emb, col("embedding"), col("vec_id"), col("label"),
        probes, col("embedding"), col("vec_id"), col("label"),
        k = 3, nprobe = 3, thresholdBytes = 0L)
      val pAdc = adc.queryExecution.executedPlan.toString
      val pMin = mined.queryExecution.executedPlan.toString
      Thread.sleep(1000) // status tracker is listener-fed (async)
      val jobs = spark.sparkContext.statusTracker
        .getJobIdsForGroup("qs27-gate-construct")
      spark.sparkContext.clearJobGroup()
      assert(jobs.isEmpty,
        s"gated plan construction ran ${jobs.length} driver job(s)")
      for ((label, p) <- Seq("adcTopKBatch" -> pAdc, "mineIvfBatch" -> pMin)) {
        assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastExchange"),
          s"$label still broadcasts the probe side above the gate:\n$p")
        assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
          s"$label lost its shuffled join:\n$p")
      }
      // and the gate must not change ANSWERS: the shuffled plan returns
      // the same rows as the broadcast plan
      val served = IvfPq.adcTopKBatch(codes, probes,
        col("embedding"), col("vec_id"), topk = 3, nprobe = 3)
      assert(served.exceptAll(adc).isEmpty && adc.exceptAll(served).isEmpty,
        "gated plan diverges from the broadcast plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("qp15: packing is one shard shuffle feeding a running window") {
    // next-fit packs with exactly ONE exchange (hash by shard into the
    // window) over narrow (id, shard, len) rows — document text never
    // shuffles; the running (fill, bin) kernel shows up as the
    // next_fit_bin window aggregate in a Window node, never a sort
    // of the whole corpus text.
    val p = plan("qp15_sequence_packing")
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Reused"))
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$p")
    assert(p.contains("next_fit_bin"), p)
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
    val schema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!schema.contains("lang") && !schema.contains("source"),
      s"packing scan reads unused columns: $schema")
  }

  test("qp20: the DSIR model reaches the documents as ONE broadcast row") {
    // r19 shape: the B-row bucket model folds into a single
    // (bucket → lt−lr) map row that cross-broadcasts onto the raw
    // documents, and each doc scores itself by an in-order array fold —
    // the scoring side must carry NO per-doc shuffle at all (the former
    // shape broadcast-joined the model onto an exploded feature stream
    // and then shuffled the whole stream by doc id to roll it up). The
    // only exchanges allowed are the model-side bucket aggregation and
    // the parallelism repartition of the scan.
    val p = plan("qp20_dsir_weights")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"bucket join degraded to a stream shuffle:\n$p")
    // no hash exchange except the model-side bucket aggregations:
    // scoring is map-only (r19 advice: asserting on the literal
    // attribute name `id#` was brittle — enumerate the hash exchanges
    // and pin every one to the bucket key instead)
    val hashKeys = """Exchange hashpartitioning\((\w+)#""".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(hashKeys.nonEmpty && hashKeys.forall(_ == "b"),
      s"per-doc rollup shuffle reappeared (hash exchanges on " +
        s"$hashKeys):\n$p")
    val schema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!schema.contains("source") && !schema.contains("n_chars"),
      s"DSIR scan reads unused columns: $schema")
  }

  test("qt52: backoff-LM scoring is all equi hash joins on n-gram keys") {
    // five count-table joins, every one an equi-join; any nested-loop
    // degradation would make scoring quadratic in the token stream
    val p = plan("qt52_backoff_lm_score")
    assert(!p.contains("CartesianProduct"), p)
    val bnl = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    // the single-row totals attach is the only permitted non-equi join
    assert(bnl <= 1, s"unexpected nested-loop joins ($bnl):\n$p")
    val schema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!schema.contains("lang") && !schema.contains("source"),
      s"LM scan reads unused columns: $schema")
  }

  test("qe14: histogram scan prunes to the value column") {
    // the sketch aggregates map-side over ONE column; the cumulative
    // walks are over domain-bounded tables, so the only corpus-sized
    // work is the pruned scan + two-phase aggregate
    val p = plan("qe14_histogram_quantiles")
    // several scans exist (the totals scan correctly reads struct<>);
    // no scan may read more than `value`
    val schemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.exists(_.contains("value")), p)
    schemas.foreach(s =>
      assert(!s.contains("props") && !s.contains("event_type"),
        s"histogram scan reads unused columns: $s"))
    assert(p.contains("HashAggregate"), p)
  }

  test("qs31/qs32: hashed retrieval broadcasts the probe; top-k is TakeOrdered") {
    // the probe is a <= dim-row relation: it must broadcast onto the
    // component stream, and the final cut must be a TakeOrdered, not
    // a global sort of the corpus
    Seq("qs31_hashed_topk", "qs32_hashed_query_topk").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q:\n$p")
      assert(p.contains("TakeOrderedAndProject"), s"$q:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("qt54: the OLS runs over the vocab slice — corpus scan prunes to (lang, text)") {
    val p = plan("qt54_zipf_slope")
    val schema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!schema.contains("source") && !schema.contains("n_chars"),
      s"zipf scan reads unused columns: $schema")
    // ranking happens in a per-group window, never a global sort
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("qe16: every window partitions by hour — no single-task stage") {
    val p = plan("qe16_hourly_quantiles")
    // an unpartitioned Window would read "Window [...]" with an empty
    // partition spec and log the single-partition warning; the hourly
    // walk must carry hr in every window's partitioning
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach(l =>
      assert(l.contains("g0#") || l.contains("hr#"),
        s"window not partitioned by hour: $l"))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("qs39: every batch-hybrid window carries the query key") {
    // the single-probe hybrid path's windows are deliberately
    // single-task (kPerList rows); the BATCH path must never inherit
    // that — every ranking/fusion window partitions by query_id, so a
    // large probe batch spreads instead of serializing through one task
    val p = plan("qs39_hybrid_batch")
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach(l =>
      assert(l.contains("query_id#"),
        s"batch window not partitioned by query_id: $l"))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("qd29/qp27: divergence scans prune to (source, text); pair stage is an equi-join") {
    // qd29's plan carries the corpus scan; qp27's corpus work hides
    // behind the perSrc Barrier (its final plan reads the S-row
    // checkpoint), so the scan-pruning leg is asserted on qd29 and
    // the no-blowup leg on both
    val p29 = plan("qd29_source_divergence")
    val schemas = p29.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.exists(s => s.contains("source") && s.contains("text")), p29)
    schemas.foreach(s =>
      assert(!s.contains("n_chars") && !s.contains("doc_id"),
        s"qd29 scan reads unused columns: $s"))
    Seq(p29, plan("qp27_diversity_budgets")).foreach(p =>
      // the S x S pair stage joins on bucket EQUALITY; only the
      // bounded grid builders may be nested-loop (broadcast, domain-
      // sized) — a CartesianProduct would mean a corpus-sized blowup
      assert(!p.contains("CartesianProduct"), p))
  }

  test("qj02: band join stays a hash equi-join with pushed filters") {
    val p = plan("qj02_band_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"band join degraded to nested loop:\n$p")
    assert(p.contains("EqualTo(event_type,view)") &&
      p.contains("EqualTo(event_type,purchase)"), p)
  }
}
