package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import graft.SparkSpec

/** Property-based invariants over randomized inputs — each property
  * runs a reduced trial count (Spark jobs per trial) but explores
  * shapes the handcrafted fixtures cannot. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(8)

  private def holds(p: Prop): Unit = {
    val r = check(params, p)
    assert(r.passed, r.status.toString)
  }

  test("NextFitBin equals the serial next-fit reference on random lengths") {
    val gen = Gen.zip(
      Gen.listOfN(20, Gen.choose(0L, 12L)), Gen.choose(4L, 12L))
    holds(Prop.forAll(gen) { case (lens, cap) =>
      // lens beyond cap are truncated by the OPERATOR contract; the
      // kernel itself is fed the already-clamped lengths
      val clamped = lens.map(math.min(_, cap))
      val df = clamped.zipWithIndex
        .map { case (l, i) => (i.toLong, l) }.toDF("doc_id", "len")
      val got = df
        .withColumn("seq", graft.functions.PackExprs.nextFitBinOver(
          col("len"), lit(cap), partitionBy = Seq(lit(1)),
          orderBy = Seq(col("doc_id"))))
        .orderBy("doc_id").select("seq").as[Long].collect().toSeq
      var fill = 0L; var bin = 1L
      val ref = clamped.map { l =>
        if (fill + l > cap) { bin += 1; fill = l } else fill += l
        bin
      }
      got == ref
    })
  }

  test("PortableHll registers: merge == union stream, for random term sets") {
    val genTerms = Gen.listOfN(25, Gen.alphaNumStr.map(_.take(6)))
    holds(Prop.forAll(genTerms, genTerms) { (as, bs) =>
      def regs(ts: Seq[String]) =
        graft.operators.text.PortableHll.registers(
          ts.toDF("term").withColumn("g", lit(1)), col("term"), Seq("g"))
      val merged = graft.operators.text.PortableHll
        .mergeRegisters(regs(as).unionByName(regs(bs)), Seq("g"))
        .select("register", "m_j").as[(Long, Long)].collect().toSet
      val whole = regs(as ++ bs)
        .select("register", "m_j").as[(Long, Long)].collect().toSet
      merged == whole
    })
  }

  test("floorTo matches the scala reference for random doubles incl. ties") {
    // mix plain doubles with constructed decimal-tie rationals — the
    // qp05 class round() diverged on
    val genPlain = Gen.choose(-2.0, 2.0)
    val genTie = Gen.zip(Gen.choose(-20000L, 20000L), Gen.oneOf(16000L, 32000L, 2000L))
      .map { case (a, b) => a.toDouble / b.toDouble }
    holds(Prop.forAll(Gen.listOfN(12, Gen.oneOf(genPlain, genTie))) { xs =>
      val got = xs.toDF("x")
        .select(graft.operators.PortableRound.floorTo(col("x"), 4).as("y"))
        .as[Double].collect().toSeq
      val ref = xs.map(x => math.floor(x * 1e4) / 1e4)
      got == ref
    })
  }

  test("GraphRank mass conservation, exact, randomized") {
    val genEdges = Gen.listOfN(10,
      Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 5L)))
    holds(Prop.forAll(genEdges, Gen.choose(1, 4)) { (edges, rounds) =>
      val nodes = (0L to 5L).map(i => s"n$i")
      val e = edges.map { case (a, b) => (s"n$a", s"n$b") }
      val total = GraphRank.rank(
          nodes.toDF("n"), "n", e.toDF("s", "d"), "s", "d", rounds)
        .as[(String, Long)].collect().map(_._2).sum
      total == 6L * 1000000L
    })
  }

  test("asofNearest matches a naive argmin join on random series") {
    val genRows = Gen.listOfN(14,
      Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 40L)))
    holds(Prop.forAll(genRows, genRows) { (ls, rs) =>
      // unique (key, ord) per side: the operator's documented
      // determinism precondition
      val l = ls.distinct.map { case (k, o) => (k, o, s"l$k-$o") }
      val r = rs.distinct.map { case (k, o) => (k, o, s"r$k-$o") }
      val got = AsOfJoin.asofNearest(
          l.toDF("k", "ord", "lv"), r.toDF("k", "ord", "rv"),
          Seq("k"), "ord")
        .select("k", "ord", "r_ord")
        .as[(Long, Long, Option[Long])].collect()
        .map(x => (x._1, x._2) -> x._3).toMap
      l.forall { case (k, o, _) =>
        val cands = r.filter(_._1 == k)
        val expect =
          if (cands.isEmpty) None
          else {
            val best = cands.minBy(c =>
              (math.abs(c._2 - o), if (c._2 <= o) 0 else 1))
            Some(best._2)
          }
        got((k, o)) == expect
      }
    })
  }

  test("interval overlapJoin equals the naive inequality join on random intervals") {
    // intervals never longer than the bucket width (the operator's
    // documented precondition); negative starts included
    val w = 10L
    val genSide = Gen.listOfN(12, Gen.zip(
      Gen.choose(1L, 3L), Gen.choose(-30L, 30L), Gen.choose(0L, w)))
    holds(Prop.forAll(genSide, genSide) { (ls, rs) =>
      val l = ls.zipWithIndex.map { case ((k, s, len), i) =>
        (k, i.toLong, s, s + len) }
      val r = rs.zipWithIndex.map { case ((k, s, len), i) =>
        (k, (100 + i).toLong, s, s + len) }
      val got = IntervalJoin.overlapJoin(
          l.toDF("k", "lid", "ls", "le"), r.toDF("k", "rid", "rs", "re"),
          Seq("k"), "ls", "le", "rs", "re", bucketWidth = w)
        .select("lid", "r_rid", "overlap_us")
        .as[(Long, Long, Long)].collect().toSet
      val expect = (for {
        (lk, lid, s1, e1) <- l
        (rk, rid, s2, e2) <- r
        if lk == rk && s1 < e2 && s2 < e1
      } yield (lid, rid, math.min(e1, e2) - math.max(s1, s2))).toSet
      got == expect
    })
  }

  test("asofForward matches a naive argmin join on random series") {
    val genRows = Gen.listOfN(14,
      Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 40L)))
    holds(Prop.forAll(genRows, genRows) { (ls, rs) =>
      val l = ls.distinct
      val r = rs.distinct
      val got = AsOfJoin.asofForward(
          l.map { case (k, o) => (k, o, s"l$k-$o") }.toDF("k", "ord", "lv"),
          r.map { case (k, o) => (k, o) }.toDF("k", "ord"),
          Seq("k"), "ord")
        .select("k", "ord", "r_ord")
        .as[(Long, Long, Option[Long])].collect()
        .map(x => (x._1, x._2) -> x._3).toMap
      l.forall { case (k, o) =>
        val after = r.filter(c => c._1 == k && c._2 > o)
        val expect = if (after.isEmpty) None else Some(after.map(_._2).min)
        got((k, o)) == expect
      }
    })
  }

  test("asofInterpolate matches naive per-key bracketing on random series") {
    val genL = Gen.listOfN(12, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 40L)))
    val genR = Gen.listOfN(12, Gen.zip(
      Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 40L)),
      Gen.choose(-50, 50).map(_.toDouble)))
    holds(Prop.forAll(genL, genR) { (ls, rsRaw) =>
      val l = ls.distinct.map { case (k, o) => (k, o, s"l$k-$o") }
      // unique (key, ord) on the right: the determinism precondition
      val r = rsRaw.map { case ((k, o), v) => (k, o, v) }
        .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
      val got = AsOfJoin.asofInterpolate(
          l.toDF("k", "ord", "lv"), r.toDF("k", "ord", "value"),
          Seq("k"), "ord", "value")
        .select("k", "ord", "r_value")
        .as[(Long, Long, Option[Double])].collect()
        .map(x => (x._1, x._2) -> x._3).toMap
      l.forall { case (k, t, _) =>
        val s = r.filter(_._1 == k)
        val before = s.filter(_._2 <= t).sortBy(_._2).lastOption
        val after = s.filter(_._2 > t).sortBy(_._2).headOption
        val expect = (before, after) match {
          case (None, None) => None
          case (Some(b), _) if b._2 == t => Some(b._3)
          case (None, Some(f)) => Some(f._3)
          case (Some(b), None) => Some(b._3)
          case (Some(b), Some(f)) =>
            Some(b._3 + (f._3 - b._3) *
              ((t - b._2).toDouble / (f._2 - b._2).toDouble))
        }
        got((k, t)) == expect
      }
    })
  }

  test("quotaSample equals per-stratum smallest hash keys on random ids") {
    val genIds = Gen.listOfN(30, Gen.zip(Gen.choose(0L, 500L), Gen.choose(1, 3)))
    holds(Prop.forAll(genIds, Gen.choose(1, 6)) { (rows, n) =>
      val df = rows.distinct.map { case (id, s) => (id, s"s$s") }
      val sample = graft.operators.text.CorpusOps
        .quotaSample(df.toDF("id", "src"), col("src"), col("id"), n)
        .select("src", "id").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      def key(id: Long): String = {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
        md.take(5).map("%02x".format(_)).mkString // first 10 hex chars
      }
      df.groupBy(_._2).forall { case (src, members) =>
        val expect = members.map(_._1)
          .sortBy(id => (java.lang.Long.parseLong(key(id), 16), id))
          .take(n).toSet
        sample.getOrElse(src, Set.empty) == expect
      }
    })
  }

  test("MinSegTokens is the brute-force optimum (pure kernel, many trials)") {
    // pure-JVM kernel: no Spark job per trial, so the trial count can
    // be high. Alphabet includes 'd' with NO single-char vocab entry —
    // words become coverable only when a multi-char piece bridges 'd',
    // exercising both the bridge and the skip branch.
    import org.apache.spark.unsafe.types.UTF8String
    val genPiece = for {
      n <- Gen.choose(1, 3)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString
    val genVocab = for {
      ps <- Gen.listOfN(8, genPiece)
      ws <- Gen.listOfN(8, Gen.choose(1L, 20L))
    } yield (ps.zip(ws).toMap + ("a" -> 1L) + ("b" -> 2L)).toSeq
    val genWord = Gen.choose(0, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    def brute(w: String, vocab: Map[String, Long]): Option[(Int, Long)] = {
      def segs(i: Int): Seq[List[String]] =
        if (i == w.length) Seq(Nil)
        else (1 to math.min(3, w.length - i)).flatMap { l =>
          val p = w.substring(i, i + l)
          if (vocab.contains(p)) segs(i + l).map(p :: _) else Nil
        }
      val all = segs(0)
      if (all.isEmpty) None
      else Some(all.map(s => (s.size, s.map(vocab).sum))
        .minBy { case (n, c) => (n, -c) })
    }
    val pureParams = Parameters.default.withMinSuccessfulTests(200)
    val r = check(pureParams, Prop.forAll(genVocab, genWord) { (entries, w) =>
      val vocab = entries.toMap
      val v = new graft.functions.MinSegVocab(entries, 3)
      val a = v.tokenize(UTF8String.fromString(w))
      val got = (0 until a.numElements())
        .map(i => a.getUTF8String(i).toString)
      brute(w, vocab) match {
        case None => got.isEmpty
        case Some((bn, bc)) =>
          got.mkString("") == w && got.size == bn && got.map(vocab).sum == bc
      }
    })
    assert(r.passed, r.status.toString)
  }

  test("Unigram Viterbi path dominates every other valid segmentation") {
    import org.apache.spark.unsafe.types.UTF8String
    val genEntry = for {
      n <- Gen.choose(1, 3)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
      s <- Gen.choose(-8.0, -0.5)
    } yield (cs.mkString, s)
    val genVocab = Gen.listOfN(10, genEntry)
      .map(es => (es.toMap + ("a" -> -1.0) + ("b" -> -2.0) + ("c" -> -3.0)).toSeq)
    val genWord = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    def allSegs(w: String, vocab: Map[String, Double]): Seq[List[String]] = {
      def segs(i: Int): Seq[List[String]] =
        if (i == w.length) Seq(Nil)
        else (1 to math.min(3, w.length - i)).flatMap { l =>
          val p = w.substring(i, i + l)
          if (vocab.contains(p)) segs(i + l).map(p :: _) else Nil
        }
      segs(0)
    }
    val pureParams = Parameters.default.withMinSuccessfulTests(200)
    val r = check(pureParams, Prop.forAll(genVocab, genWord) { (entries, w) =>
      val vocab = entries.toMap
      val v = new graft.functions.UnigramVocab(entries, 3)
      val a = v.tokenize(UTF8String.fromString(w))
      val got = (0 until a.numElements())
        .map(i => a.getUTF8String(i).toString)
      val best = got.map(vocab).sum
      got.mkString("") == w &&
        allSegs(w, vocab).forall(s => s.map(vocab).sum <= best + 1e-9)
    })
    assert(r.passed, r.status.toString)
  }

  test("BpeLearn merge table is prefix-stable in nMerges") {
    val word = Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
    val genTexts = Gen.listOfN(4, Gen.listOfN(3, word).map(_.mkString(" ")))
    holds(Prop.forAll(genTexts) { texts =>
      val df = texts.toDF("text")
      val m3 = graft.operators.text.BpeLearn
        .learn(df, col("text"), 3)
        .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
      val m5 = graft.operators.text.BpeLearn
        .learn(df, col("text"), 5)
        .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
      m5.take(m3.length).startsWith(m3) && m3.length <= 3
    })
  }

  test("PortableHistogram: every quantile estimate under-shoots within 10^(1-p)") {
    val genVals = Gen.listOfN(40, Gen.choose(1, 2000000))
      .map(_.map(_ / 1000.0))
    holds(Prop.forAll(genVals, Gen.oneOf(2, 3)) { (vs, p) =>
      val rows = PortableHistogram.quantileProfile(
          vs.toDF("value"), col("value"), p,
          qsPerMille = Seq(100, 500, 900, 1000))
        .select("est_milli", "exact_milli", "in_bound")
        .as[(Long, Long, Boolean)].collect()
      rows.length == 4 && rows.forall { case (est, exact, inB) =>
        est <= exact && inB
      }
    })
  }

  test("HashedEmbedding: self-cosine is 1 and dot is symmetric on random docs") {
    val genDoc = Gen.listOfN(8,
      Gen.oneOf("spark", "data", "window", "vector", "shuffle",
        "alpha", "beta", "gamma")).map(_.mkString(" "))
    holds(Prop.forAll(genDoc, genDoc) { (a, b) =>
      val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      val emb = graft.operators.text.HashedEmbedding.embed(
          df, col("text"), col("doc_id"), dim = 16)
        .as[(Long, Seq[Long])].collect().toMap
      def dot(x: Seq[Long], y: Seq[Long]) =
        x.zip(y).map { case (u, v) => u * v }.sum
      emb.get(1L).zip(emb.get(2L)).forall { case (e1, e2) =>
        dot(e1, e2) == dot(e2, e1) &&
          dot(e1, e1) > 0 && dot(e2, e2) > 0
      }
    })
  }

  test("BackoffLm: a verbatim duplicate of a training doc never scores worse than a shuffle") {
    val genWords = Gen.listOfN(6,
      Gen.oneOf("a1", "b2", "c3", "d4", "e5", "f6", "g7", "h8")).map(_.distinct)
    holds(Prop.forAll(genWords) { ws =>
      (ws.length < 3) || {
        val natural = ws.mkString(" ")
        val shuffled = (ws.reverse.tail :+ ws.head).mkString(" ")
        val train = (0 until 5).map(i => (i.toLong, natural))
        val probes = Seq((100L, natural), (101L, shuffled))
        val got = graft.operators.text.BackoffLm.score(
            (train ++ probes).toDF("doc_id", "text"),
            col("text"), col("doc_id"),
            alpha = 0.4, tau = 99.0, minCount = 2)
          .select("id", "ce").as[(Long, Double)].collect().toMap
        got(100L) <= got(101L)
      }
    })
  }
}
