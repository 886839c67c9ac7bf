package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.SequencePack

class SequencePackSpec extends SparkSpec {
  import spark.implicits._

  /** Reference next-fit: serial walk, same semantics the kernel and
    * the recursive-CTE oracle implement. */
  private def nextFitRef(lens: Seq[Long], cap: Long): Seq[Long] = {
    var fill = 0L
    var bin = 1L
    lens.map { l =>
      if (fill + l > cap) { bin += 1; fill = l } else fill += l
      bin
    }
  }

  test("the window kernel reproduces serial next-fit, single shard") {
    val lens = Seq(3L, 4L, 2L, 5L, 5L, 1L, 1L, 4L, 5L, 2L)
    val df = lens.zipWithIndex
      .map { case (l, i) => (i.toLong, ("x " * l.toInt).trim) }
      .toDF("doc_id", "text")
    // shards = 1 -> one partition, doc_id order == input order
    val out = SequencePack.assign(df, col("text"), col("doc_id"),
        capacity = 5, shards = 1)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("seq")).toSeq == nextFitRef(lens, 5L))
  }

  test("no sequence exceeds capacity and numbering is contiguous") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val cap = 128
    val out = SequencePack.assign(docs, col("text"), col("doc_id"),
      capacity = cap, shards = 4)
    val over = out.groupBy("shard", "seq")
      .agg(sum("len").as("t")).where(col("t") > cap).count()
    assert(over == 0L, "a packed sequence exceeds capacity")
    // contiguous 1..n_seqs per shard: distinct seq count == max seq
    val gaps = out.groupBy("shard")
      .agg(countDistinct("seq").as("d"), max("seq").as("mx"))
      .where(col("d") =!= col("mx")).count()
    assert(gaps == 0L, "sequence numbering has gaps")
    assert(out.count() == docs.count(), "every document is packed")
  }

  test("oversize documents truncate to capacity and fill a bin alone") {
    val df = Seq(
      (1L, ("w " * 10).trim), // len 10 > cap 4 -> counted at 4
      (2L, "a b"),            // len 2
      (3L, "c d e")           // len 3 -> overflows into bin 3
    ).toDF("doc_id", "text")
    val rows = SequencePack.assign(df, col("text"), col("doc_id"),
        capacity = 4, shards = 1)
      .orderBy("doc_id").collect()
    assert(rows.map(_.getAs[Long]("len")).toSeq == Seq(4L, 2L, 3L))
    assert(rows.map(_.getAs[Long]("seq")).toSeq == Seq(1L, 2L, 3L))
  }

  test("appendAssign continues packing exactly where a one-shot run lands") {
    // next-fit is prefix-stable: pack the id-lower half, append the
    // id-upper half, and the combined table must equal packing the
    // whole corpus in one shot — the rebuild-equality contract every
    // append path in this repo carries (qs24's sibling)
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val first = docs.filter(col("doc_id") < 250)
    val second = docs.filter(col("doc_id") >= 250)
    val base = SequencePack.assign(first, col("text"), col("doc_id"),
      capacity = 128, shards = 4)
    val appended = SequencePack.appendAssign(base, second,
      col("text"), col("doc_id"), capacity = 128, shards = 4)
    val combined = base.unionByName(appended)
    val oneShot = SequencePack.assign(docs, col("text"), col("doc_id"),
      capacity = 128, shards = 4)
    assert(combined.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(combined).isEmpty,
      "append-continued packing diverges from the one-shot packing")
  }

  test("appendAssign refuses out-of-order increments loudly") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val base = SequencePack.assign(
      docs.filter(col("doc_id") >= 250), col("text"), col("doc_id"),
      capacity = 128, shards = 4)
    val e = intercept[IllegalArgumentException] {
      SequencePack.appendAssign(base, docs.filter(col("doc_id") < 250),
        col("text"), col("doc_id"), capacity = 128, shards = 4).count()
    }
    assert(e.getMessage.contains("append-only"), e.getMessage)
  }

  test("appendAssign into an empty base starts sequences at 1") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .limit(20)
    val empty = SequencePack.assign(docs.limit(0), col("text"), col("doc_id"),
      capacity = 128, shards = 4)
    val appended = SequencePack.appendAssign(empty, docs,
      col("text"), col("doc_id"), capacity = 128, shards = 4)
    val direct = SequencePack.assign(docs, col("text"), col("doc_id"),
      capacity = 128, shards = 4)
    assert(appended.exceptAll(direct).isEmpty &&
      direct.exceptAll(appended).isEmpty)
  }

  test("materialize concatenates each sequence's docs in doc_id order") {
    val df = Seq(
      (1L, "a b"), (2L, "c d e"), (3L, "f")
    ).toDF("doc_id", "text")
    // capacity 5: docs 1+2 fill seq 1 (2+3), doc 3 opens seq 2
    val asg = SequencePack.assign(df, col("text"), col("doc_id"),
      capacity = 5, shards = 1)
    val out = SequencePack.materialize(asg, df, col("text"), col("doc_id"))
      .orderBy("seq").collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.length == 2)
    assert(out(0).getAs[String]("seq_md5") == md5hex("a b c d e"))
    assert(out(0).getAs[Long]("seq_tokens") == 5L)
    assert(out(1).getAs[String]("seq_md5") == md5hex("f"))
  }

  test("stats report the lower-bound gap per shard") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val assigned = SequencePack.assign(docs, col("text"), col("doc_id"),
      capacity = 512, shards = 4)
    val st = SequencePack.stats(assigned, capacity = 512).collect()
    assert(st.nonEmpty)
    st.foreach { r =>
      val nSeqs = r.getAs[Long]("n_seqs")
      val lb = r.getAs[Long]("lower_bound_seqs")
      val util = r.getAs[Long]("util_bp")
      assert(nSeqs >= lb, "bin count below the packing lower bound")
      assert(util > 0L && util <= 10000L)
    }
  }
}
