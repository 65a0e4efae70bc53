package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Distill}

/** Invariants for the round-14 distillation tier, beyond the DuckDB
  * hash-match: the fit equals an independently solved normal-equation
  * system, the salted two-stage top-k equals the naive one-stage form,
  * and FIM transforms are lossless re-serializations. */
class DistillSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("quality_fit equals an independent BigInt normal-equation solve") {
    val rows = Distill.featuredOf(spark, dir)
      .select("n_tokens", "stop_cnt", "q_teacher")
      .as[(Long, Long, Long)].collect()
    def det3(m: Array[Array[BigInt]]): BigInt =
      m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
        m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
        m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
    var (n, s1, s2, s11, s12, s22, sy, s1y, s2y) =
      (BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0),
        BigInt(0), BigInt(0), BigInt(0))
    rows.foreach { case (x1l, x2l, yl) =>
      val (x1, x2, y) = (BigInt(x1l), BigInt(x2l), BigInt(yl))
      n += 1; s1 += x1; s2 += x2; s11 += x1 * x1; s12 += x1 * x2
      s22 += x2 * x2; sy += y; s1y += x1 * y; s2y += x2 * y
    }
    val a = Array(Array(n, s1, s2), Array(s1, s11, s12),
      Array(s2, s12, s22))
    val b = Array(sy, s1y, s2y)
    val den = det3(a)
    val expect = (0 until 3).map { c =>
      val m = a.map(_.clone()); (0 until 3).foreach(r => m(r)(c) = b(r))
      BigDecimal(det3(m).doubleValue / den.doubleValue)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Distill.qualityFit(spark, dir)
      .orderBy("feature").as[(String, Double)].collect()
    assert(got.map(_._1).toSeq ==
      Seq("w0_intercept", "w1_n_tokens", "w2_stop_cnt"))
    got.map(_._2).zip(expect).foreach { case (g, e) =>
      assert(g == e, s"weight $g != $e")
    }
    // a non-degenerate fit: the slope weights actually move
    assert(got.map(_._2).count(_ != 0.0) >= 2)
  }

  test("quality_predict: pred + resid recompose the teacher; resid " +
      "orthogonality holds at rounded-weight tolerance") {
    val rows = Distill.qualityPredict(spark, dir)
      .select("q_teacher", "q_pred", "resid", "n_tokens")
      .as[(Long, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (y, pred, resid, _) =>
      assert(math.abs(y - pred - resid) < 2e-6, s"$y != $pred + $resid")
    }
    // least-squares residuals sum to ~0; the only slack is the 1e-6
    // rounding of the weights amplified by the feature magnitudes
    val sumResid = rows.map(_._3).sum
    val scale = rows.map(r => math.abs(r._1.toDouble)).sum
    assert(math.abs(sumResid) / scale < 1e-5,
      s"residuals not centered: $sumResid vs scale $scale")
  }

  test("domain_topk: the salted two-stage plan equals the naive " +
      "one-stage window") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("q_teacher").desc, col("doc_id").asc)
    val naive = Distill.featuredOf(spark, dir)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("source"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("q_teacher"))
      .as[(String, Long, Long, Long)].collect().toSet
    val staged = Distill.domainTopk(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(staged == naive)
    assert(staged.nonEmpty)
  }

  test("curriculum_order: two-pass distributed ranks equal the naive " +
      "windows; ord is a contiguous permutation") {
    import org.apache.spark.sql.expressions.Window
    val wq = Window.orderBy(col("q_teacher").desc, col("doc_id").asc)
    val base = Distill.featuredOf(spark, dir)
      .select(col("doc_id"), col("q_teacher"))
    val n = base.count()
    val naive = base
      .withColumn("rk", row_number().over(wq).cast("long") - 1)
      .withColumn("si",
        when(col("rk") * 4 < n, 0L)
          .when(col("rk") * 4 >= n * 3, 2L).otherwise(1L))
      .withColumn("h", graft.operators.TextOps.h32(
        concat(lit("cur:"), col("doc_id").cast("string"))))
      .withColumn("ord", row_number().over(
        Window.orderBy(col("si"), col("h"), col("doc_id")))
        .cast("long") - 1)
      .select(col("ord"), col("doc_id"),
        element_at(array(lit("easy"), lit("core"), lit("hard")),
          (col("si") + 1).cast("int")).as("stage"),
        col("q_teacher"))
      .as[(Long, Long, String, Long)].collect().sortBy(_._1).toSeq
    val got = Distill.curriculumOrder(spark, dir)
      .as[(Long, Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == naive)
    assert(got.map(_._1) == (0L until n).toSeq, "ord not contiguous")
    // quartile staging: stage sizes follow the exact-rank arithmetic
    val sizes = got.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val easy = (0L until n).count(r => r * 4 < n)
    val hard = (0L until n).count(r => r * 4 >= n * 3)
    assert(sizes("easy") == easy && sizes("hard") == hard &&
      sizes("core") == n - easy - hard, sizes.toString)
  }

  test("fim_transform: spans are non-empty, lossless, and short docs " +
      "pass through") {
    // synthetic corpus exercising the n<3 passthrough and the minimal
    // n=3 split alongside real-shaped docs
    val d = java.nio.file.Files.createTempDirectory("graft-fim").toString
    Seq(
      (1L, "one", "en", "src0"),
      (2L, "two tokens", "en", "src0"),
      (3L, "a b c", "en", "src1"),
      (4L, "the quick brown fox jumps over the lazy dog", "en", "src1"),
      (5L, (1 to 40).map(i => s"tok$i").mkString(" "), "en", "src2"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Corpus.fimTransform(spark, d)
      .select("doc_id", "n_tokens", "p_len", "m_len", "fim_applied",
        "fim_text")
      .as[(Long, Long, Long, Long, Boolean, String)].collect()
      .map(r => r._1 -> r).toMap
    val src = Seq(1L -> "one", 2L -> "two tokens", 3L -> "a b c",
      4L -> "the quick brown fox jumps over the lazy dog",
      5L -> (1 to 40).map(i => s"tok$i").mkString(" ")).toMap
    // passthrough: text unchanged, zero cut lengths
    Seq(1L, 2L).foreach { id =>
      val (_, _, pl, ml, applied, text) = got(id)
      assert(!applied && text == src(id) && pl == 0 && ml == 0)
    }
    // applied: parse the PSM serialization back and recompose
    Seq(3L, 4L, 5L).foreach { id =>
      val (_, n, pl, ml, applied, text) = got(id)
      assert(applied)
      val m = "(?s)^<PRE> (.*) <SUF> (.*) <MID> (.*)$".r
        .findFirstMatchIn(text)
      assert(m.isDefined, s"doc $id: bad PSM shape: $text")
      val (p, s, mid) = (m.get.group(1), m.get.group(2), m.get.group(3))
      def tk(x: String) = x.split(" ", -1).toSeq
      assert(tk(p).size == pl && tk(mid).size == ml,
        s"doc $id lengths: ${tk(p).size}/$pl ${tk(mid).size}/$ml")
      assert(tk(p).nonEmpty && tk(mid).nonEmpty && tk(s).nonEmpty)
      assert(tk(p) ++ tk(mid) ++ tk(s) == tk(src(id)),
        s"doc $id not lossless")
      assert(pl + ml < n)
    }
  }

  test("mix_quality: tiers follow quality_predict's scores and copy " +
      "counts follow the tier-modulated rate decomposition") {
    import graft.operators.TextOps
    val (qLow, qHigh) = (400000.0, 700000.0)
    val rates = Corpus.defaultMixRates
    val mixed = Corpus.mixQuality(spark, dir, rates, qLow, qHigh)
      .as[(Long, String, Double, Long, Long)].collect().toSeq
    assert(mixed.nonEmpty)
    // cross-check every emitted row's q_pred and tier against the
    // hash-verified quality_predict projection
    val pred = Distill.qualityPredict(spark, dir)
      .select("doc_id", "q_pred").as[(Long, Double)].collect().toMap
    mixed.foreach { case (id, _, qp, tier, _) =>
      assert(qp == pred(id), s"doc $id q_pred $qp != ${pred(id)}")
      val want = if (qp < qLow) 0L else if (qp >= qHigh) 2L else 1L
      assert(tier == want, s"doc $id tier $tier != $want (q_pred $qp)")
    }
    // nothing below qLow survives, and both surviving tiers are
    // exercised by the testdata
    assert(mixed.forall(_._3 >= qLow))
    assert(mixed.exists(_._4 == 1L) && mixed.exists(_._4 == 2L))
    // per-doc copy count equals the (base | doubled) decomposition of
    // its source rate under the mixq: salt — recomputed independently
    // from the rate map here
    val srcOf = graft.model.Tables.documents(spark, dir)
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    val h = srcOf.keys.toSeq.toDF("id")
      .select(col("id"), TextOps.h32(concat(lit("mixq:"),
        col("id").cast("string"))).as("h"))
      .as[(Long, Long)].collect().toMap
    def dec(x: Double): (Long, Long) = {
      val c = math.floor(x).toLong
      (c, math.round((x - c) * (1L << 32).toDouble))
    }
    val copies = mixed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    copies.foreach { case (id, got) =>
      val r = rates(srcOf(id))
      val (c, t) = if (pred(id) >= qHigh) dec(2 * r) else dec(r)
      val want = c + (if (h(id) < t) 1L else 0L)
      assert(got == want, s"doc $id copies $got != $want")
    }
    // dropped-tier docs are genuinely absent (some doc scored < qLow)
    assert(pred.values.exists(_ < qLow))
    pred.collect { case (id, qp) if qp < qLow =>
      assert(!copies.contains(id), s"doc $id (q_pred $qp) not dropped")
    }
    // copy_idx is 1..n per doc (the corpus_mix expansion contract)
    mixed.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.map(_._5).sorted == (1L to rows.size.toLong),
        s"doc $id copy_idx not contiguous")
    }
  }
}
