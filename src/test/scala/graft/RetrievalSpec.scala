package graft

import graft.operators.Retrieval

/** Hand-checkable fixtures for the retrieval & LM-statistics tier. Each
  * expected value is re-derived in the test from the published formula
  * (an independent arithmetic path from the DataFrame expression tree),
  * then compared post-round(6) — the same contract the DuckDB oracle
  * enforces at corpus scale.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // --- BM25 -------------------------------------------------------------

  private lazy val bmDocs = Seq(
    (0L, "spark join spark"),          // dl 3: spark×2, join×1
    (1L, "filter the the the"),        // dl 4: filter×1
    (2L, "the a b c"),                 // dl 4: no query term → excluded
    (3L, "window window join window")  // dl 4: window×3, join×1
  ).toDF("doc_id", "text")

  private def idf(n: Long, df: Long): Double =
    math.log((n - df + 0.5) / (df + 0.5) + 1.0)

  private def bmTerm(tf: Long, dl: Long, avgdl: Double, n: Long,
      df: Long): Double =
    idf(n, df) * tf * (Retrieval.BmK1 + 1.0) /
      (tf + Retrieval.BmK1 *
        (1.0 - Retrieval.BmB + Retrieval.BmB * dl / avgdl))

  test("bm25_topk matches the Okapi formula on a hand corpus") {
    val out = Retrieval.bm25TopkOf(bmDocs, Retrieval.QueryTerms, 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val avgdl = (3 + 4 + 4 + 4) / 4.0
    // df over docs CONTAINING the term: spark 1, join 2, filter 1, window 1
    val exp = Map(
      0L -> (r6(bmTerm(2, 3, avgdl, 4, 1) + bmTerm(1, 3, avgdl, 4, 2)), 2L),
      1L -> (r6(bmTerm(1, 4, avgdl, 4, 1)), 1L),
      3L -> (r6(bmTerm(3, 4, avgdl, 4, 1) + bmTerm(1, 4, avgdl, 4, 2)), 2L))
    assert(out.map(_._1).toSet == Set(0L, 1L, 3L),
      "doc 2 has no query term and must drop out of the ranking")
    out.foreach { case (id, score, hits) =>
      assert(math.abs(score - exp(id)._1) < 1e-9, s"doc $id score")
      assert(hits == exp(id)._2, s"doc $id n_terms_hit")
    }
    // ranking is by score desc: doc3 (window×3) > doc0 > doc1
    assert(out.map(_._1).toSeq == Seq(3L, 0L, 1L))
  }

  // --- unigram LM -------------------------------------------------------

  test("unigram_logprob matches the Laplace-smoothed unigram NLL") {
    val docs = Seq((0L, "a a b"), (1L, "b c")).toDF("doc_id", "text")
    val out = Retrieval.unigramLogprobOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // counts: a 2, b 2, c 1 → T 5, V 3; p = (cnt+1)/8
    val nA = -math.log(3 / 8.0); val nC = -math.log(2 / 8.0)
    val exp = Map(
      0L -> (3L, r6((2 * nA + 1 * nA) / 3.0)), // a,b share cnt 2
      1L -> (2L, r6((nA + nC) / 2.0)))
    out.foreach { case (id, n, nll) =>
      assert(n == exp(id)._1, s"doc $id n_tokens")
      assert(math.abs(nll - exp(id)._2) < 1e-9, s"doc $id avg_nll")
    }
  }

  test("bigram_nll matches the Laplace bigram LM with exact context counts") {
    // corpus: d0 "a b a b" → (a,b)×2 (b,a)×1; d1 "b c" → (b,c)×1
    // bigram counts: ab 2, ba 1, bc 1; contexts: a → 2, b → 2;
    // V = 4 (a, b, c, solo — the bigram-less doc still adds vocabulary)
    val docs = Seq((0L, "a b a b"), (1L, "b c"), (2L, "solo"))
      .toDF("doc_id", "text")
    val out = Retrieval.bigramNllOf(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val pAb = 3 / 6.0; val pBa = 2 / 6.0; val pBc = 2 / 6.0
    assert(out(0L) == ((3L,
      r6((2 * -math.log(pAb) + 1 * -math.log(pBa)) / 3.0))))
    assert(out(1L) == ((1L, r6(-math.log(pBc)))))
    // a single-token doc has no bigram and emits no row
    assert(!out.contains(2L))
  }

  test("bigram surprise separates scrambled text from fluent text") {
    // same unigram profile, different bigram structure: the fluent doc
    // repeats the corpus-dominant transitions, the scrambled one never
    // follows them — unigram NLL ties, bigram NLL must not
    val docs = Seq(
      (0L, "x y x y x y x y"), (1L, "x y x y x y x y"),
      (2L, "x x y y x x y y")).toDF("doc_id", "text")
    val uni = Retrieval.unigramLogprobOf(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    val bi = Retrieval.bigramNllOf(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(uni(0L) == uni(2L), "unigram NLL cannot separate these")
    assert(bi(2L) > bi(0L), "bigram NLL must flag the scrambled doc")
  }

  test("source_kl: hand divergence, zero for identical distributions") {
    // A: x×3 y×1, B: y×3 x×1 → corpus p(x)=p(y)=1/2
    val docs = Seq((0L, "x x x y", "A"), (1L, "y y y x", "B"))
      .toDF("doc_id", "text", "source")
    val out = Retrieval.sourceKlOf(docs).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val kl = r6(0.75 * math.log(0.75 / 0.5) + 0.25 * math.log(0.25 / 0.5))
    assert(out("A") == ((4L, 2L, kl)))
    assert(out("B") == ((4L, 2L, kl))) // symmetric construction
    // identical per-source distributions → KL exactly 0
    val same = Seq((0L, "x y", "A"), (1L, "x y", "B"))
      .toDF("doc_id", "text", "source")
    Retrieval.sourceKlOf(same).collect()
      .foreach(r => assert(r.getDouble(3) == 0.0, r.toString))
  }

  // --- PMI --------------------------------------------------------------

  test("pmi_bigrams matches the Church-Hanks formula, support-filtered") {
    val docs = Seq((0L, "x y x y x"), (1L, "z z")).toDF("doc_id", "text")
    val out = Retrieval.pmiBigramsOf(docs, minCount = 2L, k = 100)
      .collect().map(r =>
        ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    // bigrams: (x,y)×2 (y,x)×2 (z,z)×1 → B 5; tokens: x3 y2 z2 → T 7
    // support ≥2 keeps (x,y) and (y,x); (z,z) is filtered out
    assert(out.keySet == Set(("x", "y"), ("y", "x")))
    val pXY = r6(math.log((1.0 * 2 * 7 * 7) / (1.0 * 5 * 3 * 2)))
    assert(out(("x", "y")) == ((2L, pXY)))
    assert(out(("y", "x")) == ((2L, pXY)))
  }

  test("pmi_bigrams is empty when no bigram meets the support floor") {
    val docs = Seq((0L, "p q r")).toDF("doc_id", "text")
    assert(Retrieval.pmiBigramsOf(docs, minCount = 5L, k = 10).count() == 0)
  }

  // --- entropy -----------------------------------------------------------

  test("text_entropy matches ln(n) - sum(tf ln tf)/n on hand docs") {
    val docs = Seq(
      (0L, "a a b"),     // H = ln3 - (2 ln2)/3
      (1L, "x y z"),     // uniform: H = ln3
      (2L, "w w w w")    // constant: H = 0
    ).toDF("doc_id", "text")
    val out = Retrieval.textEntropyOf(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(0L) == ((3L, 2L,
      r6(math.log(3) - 2 * math.log(2) / 3))))
    assert(out(1L) == ((3L, 3L, r6(math.log(3)))))
    assert(out(2L) == ((4L, 1L, 0.0)))
  }

  // --- NLL quality buckets ----------------------------------------------

  test("nll_bucket assigns head/middle/tail by exact global NLL rank") {
    // 8 docs with strictly increasing rarity mix → distinct NLLs; the
    // expected buckets are recomputed driver-side from the engine's own
    // avg_nll output, sorted (avg_nll, doc_id)
    val docs = (0L to 7L).map { i =>
      // doc i repeats the common token (8-i) times and its own private
      // token i times → more private tokens = rarer mass = higher NLL
      (i, (Seq.fill((8 - i).toInt)("common") ++
        Seq.fill(i.toInt + 1)(s"rare$i")).mkString(" "))
    }.toDF("doc_id", "text")
    val out = Retrieval.nllBucketOf(spark, docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(out.length == 8)
    val byRank = out.sortBy { case (id, nll, _) => (nll, id) }
    byRank.zipWithIndex.foreach { case ((id, _, bucket), rank) =>
      val exp = if (rank * 4 < 8) "head"
        else if (rank * 4 >= 24) "tail" else "middle"
      assert(bucket == exp, s"doc $id rank $rank")
    }
    assert(byRank.count(_._3 == "head") == 2)
    assert(byRank.count(_._3 == "tail") == 2)
    assert(byRank.count(_._3 == "middle") == 4)
  }

  test("nll_bucket quartile arithmetic on a non-divisible corpus (n=5)") {
    val docs = (0L to 4L).map(i =>
      (i, (Seq.fill(5)("c") ++ Seq.fill(i.toInt)(s"r$i")).mkString(" ")))
      .toDF("doc_id", "text")
    val buckets = Retrieval.nllBucketOf(spark, docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .sortBy { case (id, nll, _) => (nll, id) }.map(_._3).toSeq
    // rank*4 < 5 → ranks 0,1 (head gets the ceil quarter);
    // rank*4 >= 15 → rank 4 only
    assert(buckets == Seq("head", "head", "middle", "middle", "tail"))
  }

  test("single-token and empty docs contribute no bigrams, no crash") {
    val docs = Seq((0L, "solo"), (1L, "x y x y")).toDF("doc_id", "text")
    val out = Retrieval.pmiBigramsOf(docs, minCount = 2L, k = 10).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("x", "y")))
  }
}
