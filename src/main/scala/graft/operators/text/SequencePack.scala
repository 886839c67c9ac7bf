package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PackExprs

/** Sequence packing — the step between a curated corpus and a training
  * run: concatenate documents into fixed-capacity token sequences
  * (context windows) so padding waste is bounded. Exact bin packing is
  * NP-hard and inherently serial; the scalable compromise every
  * large-corpus trainer uses is next-fit WITHIN independent shards:
  * documents hash (md5, engine-reproducible) into `shards` streams,
  * each stream packs serially in doc_id order, shards pack in
  * parallel. Next-fit wastes at most one partially-filled tail bin of
  * capacity per shard versus the per-shard optimum's lower bound
  * ceil(sum(len)/capacity) — [[stats]] reports exactly that gap.
  *
  * 100 TB shape: one hash shuffle of narrow (id, len) rows into
  * `shards` window partitions; the serial scan inside each partition
  * is a code-generated two-slot running aggregate
  * ([[graft.functions.NextFitBin]]), so throughput is the window
  * sort's. Document TEXT never moves — the assignment table joins
  * back by id at write time. Shard count = target parallelism
  * (thousands at cluster scale), independent of data volume.
  *
  * Oversize documents (len > capacity) are counted AT capacity — the
  * "truncate to context length" convention — so every sequence's
  * token budget is honest.
  */
object SequencePack {

  /** Per-document sequence assignment: (doc_id, shard, len, seq) with
    * seq the 1-based sequence number within the shard. */
  def assign(
      docs: DataFrame,
      text: Column,
      id: Column,
      capacity: Int,
      shards: Int): DataFrame =
    assignInput(docs, text, id, capacity, shards)
      .withColumn(
        "seq",
        PackExprs.nextFitBinOver(
          col("len"), lit(capacity.toLong),
          partitionBy = Seq(col("shard")), orderBy = Seq(col("doc_id"))))

  /** Per-shard packing efficiency over an [[assign]] result: sequence
    * count vs the ceil(sum/capacity) lower bound, and utilization in
    * basis points (integer arithmetic — engine-exact). */
  def stats(assigned: DataFrame, capacity: Int): DataFrame =
    assigned
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        max(col("seq")).as("n_seqs"),
        sum(col("len")).as("packed_tokens"))
      .selectExpr(
        "shard", "n_docs", "n_seqs", "packed_tokens",
        s"(10000L * packed_tokens) div (n_seqs * ${capacity}L) AS util_bp",
        s"(packed_tokens + ${capacity - 1}L) div ${capacity}L AS lower_bound_seqs")

  /** Incremental packing: continue an existing [[assign]] table with
    * new documents WITHOUT touching a single existing row — the
    * `index append` / `ann append` / `media append` sibling for the
    * packing lifecycle. Next-fit is PREFIX-STABLE (packing docs
    * 1..n and then appending n+1..m in order equals packing 1..m in
    * one shot, per shard), so the continuation needs only each
    * shard's tail state: (max seq, fill of that seq). The trick that
    * reuses the unmodified window kernel: one synthetic GHOST row per
    * shard, ordered before every new doc, carrying the tail fill as
    * its length — the kernel consumes it into bin 1, so a new doc
    * landing in bin 1 joins the tail sequence (seq = maxSeq) and bin
    * b > 1 opens seq maxSeq + b − 1. Ghosts are dropped on the way
    * out. Tail state is a `shards`-row aggregate (broadcast join);
    * the increment shuffles once, the EXISTING assignment is never
    * read beyond that aggregate.
    *
    * New doc_ids must sort after the already-packed ids of their
    * shard (the append-only id convention every increment path in
    * this repo assumes). `validateOrder` (default on) enforces it
    * LOUDLY — one tiny aggregation against the shard tail state that
    * is being read anyway — because a violation would not fail, it
    * would silently reorder the walk and break append == one-shot
    * repack. */
  def appendAssign(
      existing: DataFrame,
      newDocs: DataFrame,
      text: Column,
      id: Column,
      capacity: Int,
      shards: Int,
      validateOrder: Boolean = true): DataFrame = {
    val tail = existing
      .groupBy("shard")
      .agg(max(col("seq")).as("__max_seq"), max(col("doc_id")).as("__max_id"))
      .join(
        existing.groupBy("shard", "seq").agg(sum(col("len")).as("__f")),
        Seq("shard"))
      .where(col("seq") === col("__max_seq"))
      .select(col("shard"), col("__max_seq"), col("__max_id"),
        col("__f").as("__tail_fill"))
    val joined = assignInput(newDocs, text, id, capacity, shards)
      .join(broadcast(tail), Seq("shard"), "left")
    if (validateOrder) {
      // the convention prefix-stability rests on, enforced LOUDLY: a
      // new id at or below its shard's packed maximum would silently
      // reorder the walk and break append == one-shot repack. One
      // tiny aggregation over the already-joined increment.
      val bad = joined
        .where(col("__max_id").isNotNull && col("doc_id") <= col("__max_id"))
        .limit(1).collect()
      require(bad.isEmpty,
        s"appendAssign: new doc_id ${bad.headOption.map(_.get(1)).orNull} " +
          "is <= its shard's already-packed maximum — increments must be " +
          "append-only in id order (repack, or fix the id assignment)")
    }
    val inc = joined.drop("__max_id")
      .na.fill(Map("__max_seq" -> 1L, "__tail_fill" -> 0L))
    // ghost rows: doc_id null sorts FIRST in the ascending window
    val ghosts = inc
      .select(col("shard"), col("__max_seq"), col("__tail_fill"))
      .distinct()
      .select(
        lit(null).cast("bigint").as("doc_id"), col("shard"),
        col("__tail_fill").as("len"), col("__max_seq"), col("__tail_fill"))
    inc.unionByName(ghosts)
      .withColumn(
        "__bin",
        PackExprs.nextFitBinOver(
          col("len"), lit(capacity.toLong),
          partitionBy = Seq(col("shard")), orderBy = Seq(col("doc_id"))))
      .where(col("doc_id").isNotNull)
      .select(
        col("doc_id"), col("shard"), col("len"),
        (col("__max_seq") + col("__bin") - lit(1L)).as("seq"))
  }

  private def assignInput(
      docs: DataFrame, text: Column, id: Column,
      capacity: Int, shards: Int): DataFrame = {
    val len = least(
      TextAnalysis.tokenCount(text).cast("long"), lit(capacity.toLong))
    val shard =
      conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
        .cast("bigint") % shards
    docs.select(id.as("doc_id"), shard.as("shard"), len.as("len"))
  }

  /** The materialized training sequences: join the narrow assignment
    * back to the text by id and concatenate each sequence's documents
    * in doc_id order. Output stays narrow — (shard, seq, n_docs,
    * seq_tokens, seq_md5) with the md5 standing in for the sequence
    * text, so the value oracle covers every byte of every sequence
    * without shipping the corpus through the compare. At scale this is
    * the only point where text moves: one id-equi join (the
    * assignment side is ids+lens only) and one capacity-bounded
    * groupBy — each group holds at most `capacity` tokens by
    * construction, so collect_list cannot blow up a task. */
  def materialize(
      assigned: DataFrame,
      docs: DataFrame,
      text: Column,
      id: Column): DataFrame =
    materializeText(assigned, docs, text, id)
      .select(
        col("shard"), col("seq"), col("n_docs"), col("seq_tokens"),
        md5(col("text")).as("seq_md5"))

  /** The trainer-facing variant: the concatenated sequence TEXT
    * itself (shard, seq, text, n_docs, seq_tokens). [[materialize]]
    * is this with the text md5'd for the narrow value oracle — ONE
    * implementation of the ordering/concat convention. */
  def materializeText(
      assigned: DataFrame,
      docs: DataFrame,
      text: Column,
      id: Column): DataFrame =
    assigned
      .join(docs.select(id.as("doc_id"), text.as("__text")), Seq("doc_id"))
      .groupBy("shard", "seq")
      .agg(
        concat_ws(" ",
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("__text")))),
            s => s.getField("__text"))).as("text"),
        count(lit(1)).as("n_docs"),
        sum(col("len")).as("seq_tokens"))
      .select("shard", "seq", "text", "n_docs", "seq_tokens")

  /** Shared oracle fragment: the packed assignment as a recursive CTE
    * (DuckDB walks each shard serially, exactly the kernel's
    * semantics), ending with a `pack` CTE of (shard, rn, doc_id, len,
    * fill, seq). Body only, no WITH prefix, re-rootable on any
    * documents-shaped relation — composed funnels (qp18) splice it
    * after their own stage CTEs. */
  private[graft] def packCtesBody(
      capacity: Int, shards: Int, from: String): String =
    s"""base AS (
       |  SELECT doc_id,
       |         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % $shards AS shard,
       |         LEAST(CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT), $capacity) AS len
       |  FROM $from),
       |ord AS (
       |  SELECT base.*, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
       |  FROM base),
       |pack AS (
       |  SELECT shard, rn, doc_id, len, len AS fill, CAST(1 AS BIGINT) AS seq
       |  FROM ord WHERE rn = 1
       |  UNION ALL
       |  SELECT o.shard, o.rn, o.doc_id, o.len,
       |         CASE WHEN p.fill + o.len > $capacity THEN o.len ELSE p.fill + o.len END,
       |         CASE WHEN p.fill + o.len > $capacity THEN p.seq + 1 ELSE p.seq END
       |  FROM pack p JOIN ord o ON o.shard = p.shard AND o.rn = p.rn + 1)""".stripMargin

  private def packCtes(capacity: Int, shards: Int): String =
    s"WITH RECURSIVE ${packCtesBody(capacity, shards, "documents")}"

  /** qp15: full per-document assignment, value-oracled. */
  def oracleAssignSql(capacity: Int, shards: Int): String =
    s"""${packCtes(capacity, shards)}
       |SELECT doc_id, shard, len, seq FROM pack""".stripMargin

  /** qp17: materialized sequences, value-oracled byte-for-byte via the
    * per-sequence md5. */
  def oracleMaterializeSql(capacity: Int, shards: Int): String =
    s"""${packCtes(capacity, shards)}
       |SELECT p.shard, p.seq,
       |       count(*) AS n_docs,
       |       CAST(sum(p.len) AS BIGINT) AS seq_tokens,
       |       md5(string_agg(d.text, ' ' ORDER BY p.doc_id)) AS seq_md5
       |FROM pack p JOIN documents d USING (doc_id)
       |GROUP BY p.shard, p.seq""".stripMargin

  /** qp19: the shard-count tuning curve — next-fit wastes at most one
    * partially-filled tail sequence PER SHARD, so shard count trades
    * packing parallelism against padding waste (waste ≈ shards·cap/2
    * tokens in expectation); this is the number an operator reads
    * before picking the shard count for a corpus size. One row per
    * candidate shard count: total sequences vs the global lower
    * bound, waste in basis points (integer arithmetic). */
  def shardCurve(
      docs: DataFrame,
      text: Column,
      id: Column,
      capacity: Int,
      shardCounts: Seq[Int]): DataFrame =
    shardCounts
      .map { sh =>
        stats(assign(docs, text, id, capacity, sh), capacity)
          .agg(
            sum(col("n_docs")).as("n_docs"),
            sum(col("n_seqs")).as("n_seqs"),
            sum(col("packed_tokens")).as("packed_tokens"))
          .selectExpr(
            s"${sh}L AS n_shards",
            "CAST(n_docs AS BIGINT) AS n_docs",
            "CAST(n_seqs AS BIGINT) AS n_seqs",
            "CAST(packed_tokens AS BIGINT) AS packed_tokens",
            s"(packed_tokens + ${capacity - 1}L) div ${capacity}L AS lower_bound_seqs",
            s"(10000L * (n_seqs * ${capacity}L - packed_tokens)) div (n_seqs * ${capacity}L) AS waste_bp")
      }
      .reduce(_ unionByName _)

  def oracleShardCurveSql(capacity: Int, shardCounts: Seq[Int]): String =
    shardCounts
      .map { sh =>
        s"""SELECT * FROM (
           |WITH RECURSIVE ${packCtesBody(capacity, sh, "documents")}
           |SELECT CAST($sh AS BIGINT) AS n_shards,
           |       count(*) AS n_docs,
           |       CAST(sum(mx) AS BIGINT) AS n_seqs,
           |       CAST(sum(len) AS BIGINT) AS packed_tokens,
           |       (CAST(sum(len) AS BIGINT) + ${capacity - 1}) // $capacity AS lower_bound_seqs,
           |       (10000 * (CAST(sum(mx) AS BIGINT) * $capacity - CAST(sum(len) AS BIGINT)))
           |         // (CAST(sum(mx) AS BIGINT) * $capacity) AS waste_bp
           |FROM (SELECT shard, len,
           |             CASE WHEN rn = 1 THEN smx ELSE 0 END AS mx
           |      FROM (SELECT shard, rn, len,
           |                   max(seq) OVER (PARTITION BY shard) AS smx
           |            FROM pack) z) y
           |) s$sh""".stripMargin
      }
      .mkString("\nUNION ALL\n")

  /** qp16: per-shard efficiency, value-oracled. */
  def oracleStatsSql(capacity: Int, shards: Int): String =
    s"""${packCtes(capacity, shards)}
       |SELECT shard,
       |       count(*) AS n_docs,
       |       max(seq) AS n_seqs,
       |       CAST(sum(len) AS BIGINT) AS packed_tokens,
       |       (10000 * CAST(sum(len) AS BIGINT)) // (max(seq) * $capacity) AS util_bp,
       |       (CAST(sum(len) AS BIGINT) + ${capacity - 1}) // $capacity AS lower_bound_seqs
       |FROM pack
       |GROUP BY shard""".stripMargin
}
