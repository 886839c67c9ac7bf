package graft

import org.apache.spark.sql.functions._

/** Pins the ScaleSmoke decorrelation families (round 17: the third
  * scaling decade needs > 128 distinct transforms; a repeated
  * transform hands two replicas identical content and quadratically
  * inflates every cross-replica dup/similarity structure, so the
  * smoke would measure the fixture, not the operator). */
class ScaleSmokeSpec extends SparkSpec {
  import spark.implicits._

  private val N = ScaleSmoke.AffineOrder // 312 — the pre-σ family

  test("all 196,560 composed alphabet tables are pairwise distinct") {
    // the COMPLETE family: affine group (312) × σ epochs (630). Table
    // construction is pure Scala, so the proof is exhaustive, not
    // sampled; distinctness of the translate table implies
    // distinctness of the text transform
    val total = ScaleSmoke.AlphaPermFamily
    assert(total == 312 * 630)
    val tables = (0 until total).map(ScaleSmoke.alphaTable)
    assert(tables.toSet.size == total,
      s"only ${tables.toSet.size} of $total tables distinct")
    // replicas < 312 are byte-identical to the pre-σ family
    assert(tables(0) == "abcdefghijklmnopqrstuvwxyz")
  }

  test("no nontrivial power of σ is affine (the composition's keystone)") {
    // if σ^d were affine for some 0 < d < 630, two composed maps
    // aff1∘σ^e and aff2∘σ^(e+d) could coincide; check all 629 powers
    for (d <- 1 until 630) {
      val p = ScaleSmoke.sigmaPow(d)
      val a = (p(1) - p(0) + 26) % 26
      val b = p(0)
      val affine = (0 until 26).forall(j => p(j) == (a * j + b) % 26)
      assert(!affine, s"sigma^$d is the affine map j -> $a*j+$b")
    }
    // and σ's order really is 630: no earlier return to identity
    assert(ScaleSmoke.sigmaPow(630).toSeq == (0 until 26).toSeq)
    for (d <- Seq(2, 3, 5, 7, 9, 315, 210, 126, 90, 70))
      assert(ScaleSmoke.sigmaPow(d).toSeq != (0 until 26).toSeq,
        s"sigma order divides $d")
  }

  test("all 312 alphabet maps are distinct; replica 0 is the identity") {
    // a pangram exercises every letter, so two distinct affine maps
    // must produce different transforms of it; one row, 312 columns,
    // one collect
    val pangram = "the quick brown fox jumps over the lazy dog AND " +
      "SPHINX OF BLACK QUARTZ judge my vow 0123 ,.!"
    val row = Seq(pangram).toDF("t")
      .select((0 until N).map(i =>
        ScaleSmoke.alphaPerm(col("t"), i).as(s"r$i")): _*)
      .head()
    val outs = (0 until N).map(row.getString)
    assert(outs.head == pangram, "replica 0 must ride through unchanged")
    assert(outs.distinct.size == N,
      s"alphabet maps repeat: only ${outs.distinct.size} of $N distinct")
    // statistics invariance: lengths and non-letter structure survive
    assert(outs.forall(_.length == pangram.length))
    assert(outs.forall(o => o.zip(pangram).forall { case (a, b) =>
      a.isLetter == b.isLetter && a.isUpper == b.isUpper &&
        (a.isLetter || a == b) }))
  }

  test("all 312 embedding transforms are distinct and orthogonal") {
    // a vector with 64 distinct non-zero coords: any two DIFFERENT
    // signed rotations of it differ in at least one slot
    val v = (1 to 64).map(_.toFloat)
    val row = Seq(Tuple1(v)).toDF("e")
      .select((0 until N).map(i =>
        ScaleSmoke.embPerm(col("e"), i).as(s"r$i")): _*)
      .head()
    val outs = (0 until N).map(i => row.getSeq[Float](i).toVector)
    assert(outs.head == v.toVector, "replica 0 must ride through unchanged")
    assert(outs.distinct.size == N,
      s"embedding transforms repeat: ${outs.distinct.size} of $N distinct")
    // replicas 128/129+ (the pre-round-17 boundary) really are new
    // transforms, not replays of 0/1
    assert(outs(128) != outs(0) && outs(129) != outs(1))
    // orthogonality in effect: norms survive exactly (signed
    // permutation of float slots — no arithmetic beyond sign)
    val norm = v.map(x => x.toDouble * x).sum
    assert(outs.forall(o => math.abs(o.map(x => x.toDouble * x).sum - norm)
      < 1e-6))
  }

  test("epoch sign words: bijective, complement-free over 64 epochs") {
    val words = (0 until 64).map(ScaleSmoke.epochSignWord)
    assert(words.head == 0L, "epoch 0 must be the identity pattern")
    assert(words.distinct.size == words.size)
    assert(words.map(~_).toSet.intersect(words.toSet).isEmpty,
      "a complemented word aliases a transform through the global flip")
  }

  test("buildBig fails fast past the family bound, before any write") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bigbound")
      .toString
    val e = intercept[IllegalArgumentException] {
      ScaleSmoke.buildBig(spark, sf0001, s"$tmp/big",
        ScaleSmoke.AlphaPermFamily + 1)
    }
    assert(e.getMessage.contains("affine"), e.getMessage)
    assert(!new java.io.File(s"$tmp/big").exists(),
      "failed build left partial tables behind")
  }

  test("build markers record the replica count; a mismatched rebuild fails fast") {
    // round-17 advice: subset builds (SPARK_GRAFT_BIG_TABLES) against
    // one bigDir can run with different SPARK_GRAFT_REPLICAS — without
    // the stamp, tables silently disagree on scale and the corpus
    // still reads as complete
    val big = java.nio.file.Files.createTempDirectory("graft_bigmark")
      .toString + "/big"
    val sub = Set("documents", "embeddings")
    ScaleSmoke.buildBig(spark, sf0001, big, replicas = 2, tables = sub)
    val marker = java.nio.file.Paths.get(s"$big/_BUILT")
    assert(new String(java.nio.file.Files.readAllBytes(marker),
      "UTF-8").trim == "2", "marker must record the replica count")
    // same count: idempotent no-op (corpus untouched)
    val mtime = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$big/documents.parquet"))
    ScaleSmoke.buildBig(spark, sf0001, big, replicas = 2, tables = sub)
    assert(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$big/documents.parquet")) == mtime,
      "a matching rebuild must not rewrite the corpus")
    // different count against the same dir: fail fast, corpus untouched
    val e = intercept[IllegalArgumentException] {
      ScaleSmoke.buildBig(spark, sf0001, big, replicas = 3, tables = sub)
    }
    assert(e.getMessage.contains("replicas=2") &&
      e.getMessage.contains("replicas=3"), e.getMessage)
    // a pre-round-18 EMPTY marker (count unknowable) is adopted as-is
    java.nio.file.Files.write(marker, Array.empty[Byte])
    ScaleSmoke.buildBig(spark, sf0001, big, replicas = 3, tables = sub)
    assert(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$big/documents.parquet")) == mtime,
      "a legacy empty marker must adopt the corpus, not rebuild it")
  }

  test("a single-table subset build leaves its own marker and is not rebuilt") {
    // round 19: a documents-ONLY build wrote no marker at all (the
    // combined _BUILT means "both tables"), so every timed attempt
    // re-replicated a fixture already on disk — at 1000x that is a
    // ~20-minute full-table rewrite per run
    val big = java.nio.file.Files.createTempDirectory("graft_bigmark1")
      .toString + "/big"
    ScaleSmoke.buildBig(spark, sf0001, big, replicas = 2,
      tables = Set("documents"))
    val docMarker = java.nio.file.Paths.get(s"$big/_BUILT_documents")
    assert(java.nio.file.Files.exists(docMarker),
      "documents-only build must leave its per-table marker")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$big/_BUILT")),
      "a subset build must not claim the combined marker")
    val mtime = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$big/documents.parquet"))
    ScaleSmoke.buildBig(spark, sf0001, big, replicas = 2,
      tables = Set("documents"))
    assert(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$big/documents.parquet")) == mtime,
      "a matching documents-only rebuild must not rewrite the corpus")
    // a later FULL build adopts the existing documents and adds the
    // rest: embeddings appear, documents stay untouched
    ScaleSmoke.buildBig(spark, sf0001, big, replicas = 2,
      tables = Set("documents", "embeddings"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$big/embeddings.parquet")))
    assert(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$big/documents.parquet")) == mtime,
      "the full build must adopt, not rewrite, the marked documents")
  }
}
