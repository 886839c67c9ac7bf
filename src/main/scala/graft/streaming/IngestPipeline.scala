package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.operators.dedup.MinHashLSH
import graft.sync.Sink

/** Streaming corpus ingestion — the continuous form of the batch
  * curation pipeline: documents arrive as a stream and must not
  * re-enter the corpus when they already exist (exact) or
  * near-duplicate it (sketch index), without ever re-processing the
  * corpus itself. Pairs with [[MinHashLSH.buildIndex]]: the corpus is
  * signed once offline; the stream checks against it forever after.
  */
object IngestPipeline {

  /** The corpus's exact-dup guard: distinct md5 fingerprints of the
    * normalized text — one 32-char string per unique document, the
    * compact static side of the ingest anti-join. */
  def corpusFingerprints(corpus: DataFrame, text: Column): DataFrame =
    corpus.select(md5(TextOps.normalized(text)).as("fp")).distinct()

  /** Broadcast ceiling for the static fingerprint set (round 18 —
    * the incremental-miner lesson, [[MinHashLSH
    * .IncrementBroadcastBytes]], applied to the streaming guard): a
    * fingerprint set whose plan estimate exceeds this joins UNHINTED
    * (the stream shuffles per micro-batch) instead of being collected
    * to the driver and re-shipped to every executor per batch. A
    * 100 TB corpus's fp set is tens of GB — at that size pass `bloom`
    * so only positives ever reach the confirm join. */
  val FingerprintBroadcastBytes: Long = 128L << 20

  /** Exact ingest dedup, fully streaming: drop documents whose
    * fingerprint exists in the static corpus (stream-static broadcast
    * LEFT ANTI — stateless, evaluated per micro-batch), then drop
    * within-stream re-deliveries of the same fingerprint inside the
    * watermark horizon (keyed state bounded by horizon × arrival
    * rate). The stream side is never shuffled by the anti-join while
    * the fingerprint set fits under [[FingerprintBroadcastBytes]]
    * (the size-gated hint); past the gate the join goes unhinted.
    *
    * With `bloom` (built over the same fingerprint universe — see
    * [[exactGuard]]), bloom-negative rows bypass the anti-join as
    * definite novels (no false negatives) and only positives confirm
    * against the static set — the per-micro-batch join touches the
    * true-dup fraction plus ~fpp noise instead of every arriving row.
    *
    * When no explicit `bloom` is passed but `bloomPath` names the
    * index's persisted sidecar ([[buildIndexDir]] writes one), the
    * sidecar is AUTO-LOADED exactly when the fingerprint relation
    * exceeds the broadcast gate (round-18 verdict: past the ceiling a
    * no-bloom caller paid an unhinted corpus-fingerprint shuffle PER
    * MICRO-BATCH — the sidecar already existed, it just wasn't picked
    * up). Under the gate the set broadcasts anyway and the extra
    * bloom branch would only widen the plan.
    */
  def dedupIngest(
      stream: DataFrame,
      text: Column,
      fingerprints: DataFrame,
      eventTime: String = "ts",
      horizon: String = "2 hours",
      bloom: Option[org.apache.spark.util.sketch.BloomFilter] = None,
      broadcastBytes: Long = FingerprintBroadcastBytes,
      bloomPath: Option[String] = None): DataFrame = {
    val withFp = stream.withColumn("__fp", md5(TextOps.normalized(text)))
    val fpRel = fingerprints.select(col("fp").as("__fp"))
    val fits =
      graft.operators.similarity.ProbeBatch.fitsBroadcast(fpRel, broadcastBytes)
    val fpHinted = graft.operators.similarity.ProbeBatch.hinted(fpRel, fits)
    val effectiveBloom = bloom.orElse(
      if (fits) None
      else bloomPath.flatMap(readBloom(stream.sparkSession, _)))
    val guarded = effectiveBloom match {
      case Some(bf) =>
        // null __fp (null text) must route with the bloom-NEGATIVE
        // branch: the no-bloom anti-join keeps such rows (null keys
        // never match), and a raw `hit`/`!hit` split would drop them
        // from BOTH branches (three-valued logic) — the modes must
        // agree on null-text rows.
        val hit = coalesce(
          graft.functions.BloomExprs.mightContain(bf, col("__fp")), lit(false))
        withFp.filter(hit)
          .join(fpHinted, Seq("__fp"), "left_anti")
          .unionByName(withFp.filter(!hit))
      case None =>
        withFp.join(fpHinted, Seq("__fp"), "left_anti")
    }
    guarded
      .withWatermark(eventTime, horizon)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
  }

  /** Full curation ingest: per micro-batch, exact-dedup against the
    * corpus fingerprints AND against everything this stream already
    * appended (the sink's own fingerprints, recomputed per batch, so
    * an exact duplicate arriving in a LATER micro-batch is rejected
    * too — the static set alone would only guard batch one), then
    * near-dup-dedup against the persisted LSH index
    * ([[MinHashLSH.dedupAgainstIndex]] — increment broadcasts, corpus
    * streams through one scan), then append survivors to the sink.
    * foreachBatch because the near-dup check is a composed batch plan,
    * not a single streaming-supported join; source progress is
    * checkpointed, the sink append is at-least-once on task retry
    * (pair with a keyed target, as in Sync.streamingSync). Within-batch
    * self-duplicates collapse via the exact fingerprint before the
    * index check.
    *
    * Guard freshness: the EXACT guard is complete (corpus ∪ ingested);
    * the NEAR-DUP guard is as fresh as the index — two novel
    * near-duplicates of each other arriving in different micro-batches
    * both land, until the corpus index is rebuilt out of band. Folding
    * every appended batch into a live LSH index is a compaction job,
    * not a per-batch plan.
    *
    * The ingested-side guard is maintained INCREMENTALLY: each batch
    * appends its novel fingerprints to `<table>_fps` through the same
    * sink, so later batches read 32-char digests instead of re-hashing
    * every previously ingested document — per-batch guard cost is one
    * narrow fingerprint-table read, not a full sink re-scan. */
  def curateIngest(
      stream: DataFrame,
      sink: Sink,
      table: String,
      checkpointDir: String,
      index: MinHashLSH.LshIndex,
      fingerprints: DataFrame,
      text: Column,
      idCol: String,
      p: MinHashLSH.Params = MinHashLSH.Params(),
      benchmark: Option[MinHashLSH.LshIndex] = None,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      bloom: Option[org.apache.spark.util.sketch.BloomFilter] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val novel =
          curateBatch(batch, sink, table, index, fingerprints, text, idCol, p, bloom)
        val (clean, dirty) = benchmark match {
          case Some(b) => deconSplit(novel, b, text, idCol, p)
          case None => (novel, novel.limit(0))
        }
        sink.append(clean.drop("__fp"), table)
        if (benchmark.isDefined)
          sink.append(dirty.drop("__fp"), s"${table}_quarantine")
        // fingerprints of EVERYTHING novel — including quarantined docs,
        // so a re-sent contaminated doc is rejected by the cheap exact
        // guard instead of re-running the benchmark check
        sink.append(novel.select(col("__fp").as("fp")).distinct(), s"${table}_fps")
      }
      .trigger(trigger)
      .start()

  /** Benchmark-contamination gate at ingest — the streaming form of
    * fuzzy decontamination (qd34): documents that are near-duplicates
    * (est Jaccard >= p.threshold) of ANY benchmark item are routed to
    * `<table>_quarantine` instead of the corpus, so eval leaks never
    * ENTER the corpus rather than being scrubbed later. The benchmark
    * index is built once ([[MinHashLSH.buildIndex]] over the eval set —
    * small by assumption) and reused across every micro-batch; per
    * batch the check is [[MinHashLSH.pairsAgainstIndex]]'s shape: the
    * batch's banded signatures broadcast into ONE scan of the
    * benchmark's band table, ids-only. Returns (clean, quarantined) —
    * the dirty id set crosses a Barrier because both splits consume it. */
  private[graft] def deconSplit(
      novel: DataFrame,
      bench: MinHashLSH.LshIndex,
      text: Column,
      idCol: String,
      p: MinHashLSH.Params): (DataFrame, DataFrame) = {
    val dirtyIds = MinHashLSH
      .pairsAgainstIndex(bench, novel, text, col(idCol), p)
      .select(col("id_new").as(idCol))
      .distinct()
      .transform(graft.operators.Barrier.apply)
    (novel.join(dirtyIds, Seq(idCol), "left_anti"),
      novel.join(dirtyIds, Seq(idCol), "left_semi"))
  }

  /** The exact-dup guard stage of [[curateBatch]], pre-LSH and
    * pre-Barrier (so its join shape stays plan-inspectable): rows of
    * `batch` whose fingerprint is NOT in corpus ∪ already-ingested
    * fps, one representative per in-batch fingerprint.
    *
    * With a `bloom` ([[graft.functions.BloomMightContain]], built over
    * the SAME fingerprint universe as `fingerprints` ∪ the sink's fp
    * table), rows the filter rejects are DEFINITELY novel (no false
    * negatives) and skip the exact-confirmation join entirely — only
    * bloom-positives probe the guard. That is the 100 TB shape: the
    * guard's raw fingerprints stop being broadcastable around 10⁹ rows
    * (~40 GB of md5 strings) while their bloom bits stay ~1.4 GB at
    * 1% fpp, and the positives (the true-dup fraction plus ~1% noise)
    * become the tiny join side. */
  private[graft] def exactGuard(
      batch: DataFrame,
      sink: Sink,
      table: String,
      fingerprints: DataFrame,
      text: Column,
      idCol: String,
      bloom: Option[org.apache.spark.util.sketch.BloomFilter]): DataFrame = {
    val fpTable = s"${table}_fps"
    val withFp = batch.withColumn("__fp", md5(TextOps.normalized(text)))
    val guard =
      if (sink.exists(batch.sparkSession, fpTable))
        fingerprints.unionByName(
          sink.readBack(batch.sparkSession, fpTable).select("fp"))
      else fingerprints
    (bloom match {
      case Some(bf) =>
        // the 100 TB join shape: the guard is the UNBROADCASTABLE side,
        // so the bloom-positive fingerprints (true dups + ~fpp noise —
        // tiny) broadcast INTO one streaming scan of the guard to find
        // the confirmed dups, which broadcast again for the final
        // anti-join. The guard is never broadcast and never shuffled.
        // An ALL-NEGATIVE batch short-circuits before any plan that
        // touches the guard is built (the MediaIngest admission
        // pattern): no false negatives means every row is definitely
        // novel, and the driver-side probe costs one pass over the
        // BATCH — foreachBatch context, so a job here is legal — vs a
        // full scan of the corpus-scale fingerprint set per batch.
        val hit = graft.functions.BloomExprs.mightContain(bf, col("__fp"))
        val probeFps = withFp.filter(hit).select(col("__fp")).distinct()
          .transform(graft.operators.Barrier.apply) // read by two joins
        if (probeFps.isEmpty) withFp
        else {
          val dupFps = guard.select(col("fp").as("__fp"))
            .join(broadcast(probeFps), Seq("__fp"), "left_semi")
          withFp.join(broadcast(dupFps), Seq("__fp"), "left_anti")
        }
      case None =>
        // small-corpus mode: one guard broadcast, one anti-join
        withFp.join(broadcast(guard.select(col("fp").as("__fp"))),
          Seq("__fp"), "left_anti")
    })
      // keep one representative per in-batch fingerprint (lowest id)
      .withColumn("__rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("__fp").orderBy(col(idCol))))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  private[graft] def curateBatch(
      batch: DataFrame,
      sink: Sink,
      table: String,
      index: MinHashLSH.LshIndex,
      fingerprints: DataFrame,
      text: Column,
      idCol: String,
      p: MinHashLSH.Params,
      bloom: Option[org.apache.spark.util.sketch.BloomFilter] = None): DataFrame =
    MinHashLSH
      .dedupAgainstIndex(
        index,
        exactGuard(batch, sink, table, fingerprints, text, idCol, bloom),
        text, idCol, p)
      .transform(graft.operators.Barrier.apply)

  /** Persist/load the guard bloom beside the index (Hadoop FS, so any
    * scheme the session can reach works). */
  def writeBloom(
      spark: org.apache.spark.sql.SparkSession,
      bloom: org.apache.spark.util.sketch.BloomFilter,
      path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // staged publish (round-15): a raw overwrite create left a crash
    // window where the bloom existed TRUNCATED, and every later fold
    // then died inside BloomFilter.readFrom
    graft.operators.StagedSwap.writeSidecarVia(fs, p, bloom.writeTo)
  }

  def readBloom(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Option[org.apache.spark.util.sketch.BloomFilter] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val is = fs.open(p)
      try Some(org.apache.spark.util.sketch.BloomFilter.readFrom(is))
      finally is.close()
    }
  }

  /** The shared id-bloom rebuild convention (creation, sidecar
    * adoption, saturation) for every maintenance path — 4× headroom
    * over the current id count so folds have room before fpp decays.
    * `ids` must be a single non-null string column named `id`.
    * Extracted after review: three near-verbatim copies had to agree
    * on headroom and the BloomMeta contract by hand. */
  private[graft] def writeIdBloomFrom(
      spark: org.apache.spark.sql.SparkSession,
      ids: org.apache.spark.sql.DataFrame,
      bloomPath: String,
      metaPath: String,
      fpp: Double): Unit = {
    val n = math.max(ids.count() * 4, 4L)
    writeBloom(spark, ids.stat.bloomFilter("id", n, fpp), bloomPath)
    writeBloomMeta(spark, BloomMeta(n, fpp), metaPath)
  }

  /** The bloom's creation params, persisted beside the bits:
    * `BloomFilter.mergeInPlace` requires identical (numBits,
    * numHashFunctions), and those derive from (expectedItems, fpp) at
    * creation — so an increment filter built executor-side is
    * mergeable into the persisted one exactly when it is created with
    * the SAME params, which therefore must survive restarts. */
  private[graft] final case class BloomMeta(expectedItems: Long, fpp: Double)

  private[graft] def writeBloomMeta(
      spark: org.apache.spark.sql.SparkSession,
      meta: BloomMeta,
      path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    // ArtifactMeta (round-15 consolidation): the former raw
    // fs.create(overwrite = true) writer had the torn-write window —
    // a crash left the meta EXISTING but EMPTY, and every later fold
    // died parsing it — that StagedSwap.writeSidecar was built to close
    graft.operators.ArtifactMeta.write(
      p.getFileSystem(spark.sessionState.newHadoopConf()), p,
      Seq("items" -> meta.expectedItems.toString, "fpp" -> meta.fpp.toString))
  }

  private[graft] def readBloomMeta(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Option[BloomMeta] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    graft.operators.ArtifactMeta.read(fs, p).map { m =>
      (m.get("items"), m.get("fpp"), m.get("value")) match {
        case (Some(items), Some(fpp), _) => BloomMeta(items.toLong, fpp.toDouble)
        case (_, _, Some(legacy)) => // pre-round-15 "items fpp" file
          val parts = legacy.split(" ")
          BloomMeta(parts(0).toLong, parts(1).toDouble)
        case _ => throw new java.io.IOException(
          s"bloom meta at $path is unreadable: $m — rebuild the index bloom")
      }
    }
  }

  /** Build the SELF-CONTAINED index directory the CLI lifecycle works
    * against: the [[MinHashLSH]] docs/hot layout plus the corpus exact
    * fingerprints under `fps` — everything an increment needs, so
    * `index append` never touches the corpus again. */
  def buildIndexDir(
      corpus: DataFrame,
      text: Column,
      id: Column,
      dir: String,
      p: MinHashLSH.Params = MinHashLSH.Params(),
      bloomFpp: Double = 0.01): Unit = {
    MinHashLSH.writeIndex(MinHashLSH.buildIndex(corpus, text, id, p), dir)
    corpusFingerprints(corpus, text).write.mode("overwrite").parquet(s"$dir/fps")
    // the guard bloom: built from the persisted fps (one narrow read,
    // no corpus re-hash) so increments can reject definite-novels
    // without touching the raw fingerprint set. Sized 4x the corpus —
    // increments fold their fingerprints in forever, and a filter
    // sized exactly for day zero would saturate (fpp -> 1) as the
    // corpus grows; ingestBatch also rebuilds when saturation shows.
    val spark = corpus.sparkSession
    val fps = spark.read.parquet(s"$dir/fps")
    val n = math.max(fps.count() * 4, 4L)
    writeBloom(spark, fps.stat.bloomFilter("fp", n, bloomFpp), s"$dir/bloom")
    writeBloomMeta(spark, BloomMeta(n, bloomFpp), s"$dir/bloom.meta")
  }

  /** `graft index compact`: refresh the index dir's DERIVED artifacts
    * from its accumulated docs. [[ingestBatch]] folds signatures and
    * bloom bits forward, but the hot-bucket list stays as BUILT — an
    * increment-accumulated flood (the same boilerplate arriving every
    * day) never enters it, so every later append pays that bucket's
    * quadratic pair expansion. Compact recomputes `hot` over the full
    * docs set (build + every appended increment) and rebuilds the
    * guard bloom from the full fingerprint universe (corpus fps ∪ the
    * sink's ingested fps) with fresh 4× headroom — the periodic
    * out-of-band job the streaming doc calls out, as a CLI verb.
    * Returns (docs signed, hot buckets, fingerprints bloomed). */
  def compactIndexDir(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      ingestedFps: Option[DataFrame] = None,
      p: MinHashLSH.Params = MinHashLSH.Params(),
      bloomFpp: Double = 0.01): (Long, Long, Long) = {
    // hot refresh: one aggregation over the accumulated docs — the
    // build-time cost, re-paid at compaction cadence, not per append
    val docs = spark.read.parquet(s"$indexDir/docs")
    val hot = docs
      .select(posexplode(col("bks")).as(Seq("band", "bh")))
      .groupBy("band", "bh")
      .count()
      .filter(col("count") > p.maxBucket)
      .select("band", "bh")
    // docs is a plain parquet scan and hot lands in a DIFFERENT subdir,
    // so the overwrite never reads what it replaces
    hot.write.mode("overwrite").parquet(s"$indexDir/hot")
    val allFps = ingestedFps
      .foldLeft(spark.read.parquet(s"$indexDir/fps").select("fp"))(
        (acc, more) => acc.unionByName(more.select("fp")))
      .distinct()
    val n = math.max(allFps.count() * 4, 4L)
    writeBloom(spark, allFps.stat.bloomFilter("fp", n, bloomFpp), s"$indexDir/bloom")
    writeBloomMeta(spark, BloomMeta(n, bloomFpp), s"$indexDir/bloom.meta")
    (docs.count(), spark.read.parquet(s"$indexDir/hot").count(), n / 4)
  }

  /** One BATCH increment through the full curation lifecycle — the
    * `graft index append` form of [[curateIngest]]: exact-dedup
    * against corpus + already-ingested fingerprints, near-dup-dedup
    * against the persisted index, append survivors to the sink, then
    * FOLD the survivors' signatures into the index's docs so the next
    * increment's near-dup guard sees them (the out-of-band compaction
    * the streaming doc calls out, done inline here — batch cadence can
    * afford it). The hot-bucket list refreshes only on a full rebuild.
    * Returns (incoming rows, survivors kept). */
  def ingestBatch(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      increment: DataFrame,
      sink: Sink,
      table: String,
      text: Column,
      idCol: String,
      p: MinHashLSH.Params = MinHashLSH.Params()): (Long, Long) = {
    val index = MinHashLSH.readIndex(spark, indexDir)
    val fps = spark.read.parquet(s"$indexDir/fps")
    val bloom = readBloom(spark, s"$indexDir/bloom")
    val novel = curateBatch(increment, sink, table, index, fps, text, idCol, p, bloom)
    sink.append(novel.drop("__fp"), table)
    sink.append(novel.select(col("__fp").as("fp")).distinct(), s"${table}_fps")
    MinHashLSH.signatures(novel, text, col(idCol), p)
      .withColumn("bks", MinHashLSH.bandKeys(col("sig"), p.bands, p.rows))
      .write.mode("append").parquet(s"$indexDir/docs")
    // fold the survivors' fingerprints into the persisted bloom too,
    // EXECUTOR-side: build an increment filter with the persisted
    // creation params (identical numBits/numHashFunctions — the
    // mergeInPlace compatibility contract) via the distributed
    // stat.bloomFilter aggregate, then OR it in. No fingerprint ever
    // crosses to the driver — only the two filters' bits meet there.
    // A fixed-size filter saturates as folds accumulate (fpp -> 1 =
    // every row silently pays the exact join again), so when the
    // filter's own saturation estimate passes 5%, rebuild it from the
    // full fingerprint universe with fresh 4x headroom.
    bloom.foreach { bf =>
      val meta = readBloomMeta(spark, s"$indexDir/bloom.meta")
      val novelFps = novel.select(col("__fp")).filter(col("__fp").isNotNull)
      // no sidecar (legacy index dir) = creation params unrecoverable
      // (numHashFunctions is private to the impl) = not mergeable:
      // fall through to the full rebuild instead. Zero-row aggregate
      // yields no filter at all (stat.bloomFilter NPEs) — nothing to
      // fold then anyway.
      meta.filter(_ => !novelFps.isEmpty).foreach(m =>
        bf.mergeInPlace(novelFps.stat.bloomFilter("__fp", m.expectedItems, m.fpp)))
      val refreshed =
        if (meta.nonEmpty && bf.expectedFpp() <= 0.05) bf
        else {
          val allFps = fps.select("fp")
            .unionByName(sink.readBack(spark, s"${table}_fps").select("fp"))
            .distinct()
          val n = math.max(allFps.count() * 4, 4L)
          writeBloomMeta(spark, BloomMeta(n, 0.01), s"$indexDir/bloom.meta")
          allFps.stat.bloomFilter("fp", n, 0.01)
        }
      writeBloom(spark, refreshed, s"$indexDir/bloom")
    }
    (increment.count(), novel.count())
  }
}
