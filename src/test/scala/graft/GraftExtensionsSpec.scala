package graft

import org.apache.spark.sql.functions._

/** The SQL surface of the custom expressions (SparkSessionExtensions
  * injection): spark.sql results must equal the Column API results. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("simhash64 is callable from SQL and matches the Column API") {
    val df = Seq("the quick brown fox", "jumps over the lazy dog").toDF("text")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark
      .sql("SELECT simhash64(split(text, ' ')) AS h FROM ext_docs")
      .as[Long].collect().toSeq
    val viaCol = df
      .select(graft.functions.functions.simhash64(split(col("text"), " ")).as("h"))
      .as[Long].collect().toSeq
    assert(viaSql == viaCol)
  }

  test("minhash_signature is callable from SQL and matches the Column API") {
    val df = Seq("some document text for hashing").toDF("text")
    df.createOrReplaceTempView("ext_docs2")
    val viaSql = spark
      .sql("SELECT minhash_signature(text, 16, 5) AS sig FROM ext_docs2")
      .as[Seq[Long]].head()
    val viaCol = df
      .select(graft.functions.MinHashSignature(col("text"), 16, 5).as("sig"))
      .as[Seq[Long]].head()
    assert(viaSql == viaCol && viaSql.size == 16)
  }

  test("rolling_min_hash is callable from SQL and matches the Column API") {
    val df = Seq("rolling hash fingerprint input").toDF("text")
    df.createOrReplaceTempView("ext_docs3")
    val viaSql = spark
      .sql("SELECT rolling_min_hash(text, 8) AS fp FROM ext_docs3")
      .as[Long].head()
    val viaCol = df
      .select(graft.functions.RollingMinHash(col("text"), 8).as("fp"))
      .as[Long].head()
    assert(viaSql == viaCol)
  }

  test("vector and sketch kernels are callable from SQL") {
    val df = Seq((Seq(1f, 0f, 2f), Seq(2f, 1f, 0f), "abc def ghi")).toDF("a", "b", "text")
    df.createOrReplaceTempView("ext_vecs")
    val r = spark.sql(
      """SELECT vec_dot(a, b) AS d, vec_cosine(a, a) AS c,
        |       sig_match_fraction(minhash_signature(text, 8, 3),
        |                          minhash_signature(text, 8, 3)) AS m,
        |       portable_simhash(text) AS ps,
        |       size(portable_minhash_sig(text)) AS pk
        |FROM ext_vecs""".stripMargin).head()
    assert(r.getDouble(0) == 2.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getDouble(2) == 1.0)
    assert(r.getLong(3) != 0L)
    assert(r.getInt(4) == 48)
  }

  test("set and distance kernels are callable from SQL") {
    val df = Seq("abc abd xyz").toDF("text")
    df.createOrReplaceTempView("ext_sets")
    val r = spark.sql(
      """SELECT sorted_char_shingles(text, 3) AS cs,
        |       sorted_token_shingles(text, 2) AS ts,
        |       sorted_intersect_count(sorted_token_shingles(text, 2),
        |                              sorted_token_shingles(text, 2)) AS ic,
        |       vec_sqdist(array(1.0D, 2.0D), array(1.0D, 0.0D)) AS sq,
        |       deflate_ratio(repeat(text, 50)) AS dr
        |FROM ext_sets""".stripMargin).head()
    assert(r.getSeq[String](0).nonEmpty && r.getSeq[String](0) == r.getSeq[String](0).sorted)
    assert(r.getSeq[String](1) == Seq("abc abd", "abd xyz"))
    assert(r.getLong(2) == 2L)
    assert(r.getDouble(3) == 4.0)
    assert(r.getDouble(4) > 0.0 && r.getDouble(4) < 0.3)
  }

  test("wordpiece_tokens is callable from SQL and matches the Column API") {
    val df = Seq("the singer testing loudly").toDF("text")
    df.createOrReplaceTempView("ext_docs_wp")
    val viaSql = spark
      .sql("SELECT wordpiece_tokens(text) AS p FROM ext_docs_wp")
      .as[Seq[String]].head()
    val viaCol = df
      .select(graft.functions.WordPiece.tokens(col("text")).as("p"))
      .as[Seq[String]].head()
    assert(viaSql == viaCol)
    assert(viaSql.startsWith(Seq("the", "sing", "##er")), viaSql.mkString(" "))
  }

  test("next_fit_bin works as a SQL window function over the registry") {
    val df = Seq((1L, 3L), (2L, 4L), (3L, 2L), (4L, 5L), (5L, 5L))
      .toDF("id", "len")
    df.createOrReplaceTempView("ext_pack")
    val bins = spark
      .sql("""SELECT id, next_fit_bin(len, 5L) OVER (ORDER BY id) AS bin
              FROM ext_pack ORDER BY id""")
      .as[(Long, Long)].collect().map(_._2).toSeq
    // serial next-fit at capacity 5: 3 | 4 | 2 | 5 | 5
    assert(bins == Seq(1L, 2L, 3L, 4L, 5L), bins)
    // and against the Column API kernel
    val viaCol = graft.operators.text.SequencePack
      .assign(
        df.select(col("id").as("doc_id"),
          // synthesize text with len tokens so assign re-derives len
          concat_ws(" ", transform(sequence(lit(1), col("len")), _ => lit("w")))
            .as("text")),
        col("text"), col("doc_id"), capacity = 5, shards = 1)
      .orderBy("doc_id").select("seq").as[Long].collect().toSeq
    assert(viaCol == bins)
  }

  test("non-literal k is rejected with a clear message") {
    val df = Seq(("t", 3)).toDF("text", "k")
    df.createOrReplaceTempView("ext_docs4")
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(text, k, 5) FROM ext_docs4").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
