package graft

import java.nio.file.Files

import graft.operators.{Dedup, Similarity}

/** Degenerate-bucket guards (VERDICT r1 item 3): a corpus with a huge
  * byte-identical mass lands every LSH band/bucket in one cell; without
  * the guards, the in-bucket all-pairs joins go quadratic (10k identical
  * docs → ~50M candidate pairs PER BAND). These tests feed exactly that
  * corpus with low thresholds and assert the guarded operators complete
  * and still find the genuine near-duplicates outside the mass. Exact
  * dedup (one hash groupBy) is the pass that owns byte-identical mass —
  * dropping it from the near-dup tiers loses nothing. */
class GuardSpec extends SparkSpec {
  import spark.implicits._

  /** 10k byte-identical docs + two genuinely near-dup docs (6 shingles,
    * 5 shared → exact jaccard 5/7). */
  private lazy val docsDir: String = {
    val d = Files.createTempDirectory("graft-guard").toString
    val mass = (1L to 10000L)
      .map(i => (i, "alpha beta gamma delta epsilon zeta"))
    val near = Seq(
      (20001L, "one two three four five six seven eight"),
      (20002L, "one two three four five six seven nine"))
    (mass ++ near).toDF("doc_id", "text")
      .coalesce(2).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("minhash hot-bucket guard: 10k-identical-doc corpus completes; no mass pairs") {
    val out = Dedup
      .dedupMinhash(spark, docsDir, limit = 1000000, maxBucket = 100)
      .as[(Long, Long, Double)].collect()
    assert(out.forall { case (a, b, _) => a > 10000L && b > 10000L },
      s"mass pair leaked: ${out.take(5).mkString(",")}")
  }

  test("ngram high-DF shingle drop: stop-shingle mass dropped, rare-shingle pair exact") {
    val out = Dedup
      .ngramJaccard(spark, docsDir, limit = 1000000, maxDf = 100)
      .as[(Long, Long, Double)].collect()
    assert(out.forall { case (a, b, _) => a > 10000L && b > 10000L })
    // the near-dup pair only shares rare shingles — its exact jaccard
    // survives the guard untouched (5 of 7 distinct shingles shared)
    assert(out.exists { case (a, b, j) =>
      a == 20001L && b == 20002L && math.abs(j - 5.0 / 7) < 1e-6 })
  }

  test("simhash hot-band guard bounds the banded pairing on the same corpus") {
    val out = Dedup.simhashPairs(spark, docsDir, t = 3, maxBand = 100)
      .as[(Long, Long, Long)].collect()
    assert(out.forall { case (a, b, _) => a > 10000L && b > 10000L })
  }

  test("jaccard hot-customer guard: a 5k-product customer is excluded, exact pairs kept") {
    // one degenerate customer holding 5000 products would expand to
    // ~12.5M pairs from a single groupBy key (unsplittable by AQE skew
    // handling); the guard drops it from pair generation while sizes
    // stay exact — the surviving pair's jaccard uses the TRUE product
    // sizes, so guarded values are exact for pairs of cold customers
    // that share no hot customer (lower-bound semantics otherwise)
    val hot = (1L to 5000L).map(p => (999L, p))
    val cold = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 2L))
    val b = (hot ++ cold).toDF("customer_id", "product_id")
    val out = graft.operators.Recommend
      .jaccardPairsFrom(b, maxBasket = 100)
      .as[(Long, Long, Double)].collect().toList
    // customers 1,2 share {P1,P2}; 999 is guarded out of PAIRING only,
    // so common(P1,P2)=2 while sizes stay exact (999 still counts):
    // sz(P1)={1,2,999}→3, sz(P2)={1,2,3,999}→4 → 2/(3+4-2) = 0.4
    val p12 = out.find(r => r._1 == 1L && r._2 == 2L)
    assert(p12.exists(r => math.abs(r._3 - 0.4) < 1e-9), out.take(5).toString)
    // no pair involves two products ONLY the hot customer shares
    assert(out.forall { case (a, bb, _) => a <= 2L && bb <= 2L },
      out.take(5).toString)
  }

  test("guarded output equals the unguarded pipeline on the non-degenerate remainder") {
    import org.apache.spark.sql.functions.col
    // the guards' documented contract (round-5 verdict item 7): on a
    // corpus WITH a degenerate bucket, the guarded operator returns
    // EXACTLY what the unguarded operator returns on the corpus with the
    // degenerate mass removed up front — not merely 'no mass pairs'.
    // Oracle-style: the unguarded run (thresholds that never fire) is an
    // independent computation path over the remainder.
    val rem = Files.createTempDirectory("graft-guard-rem").toString
    spark.read.parquet(s"$docsDir/documents.parquet")
      .filter(col("doc_id") > 10000L)
      .write.mode("overwrite").parquet(s"$rem/documents.parquet")
    val guardedMin = Dedup
      .dedupMinhash(spark, docsDir, limit = 1000000, maxBucket = 100)
      .as[(Long, Long, Double)].collect().toSet
    val unguardedMin = Dedup
      .dedupMinhash(spark, rem, limit = 1000000, maxBucket = Int.MaxValue)
      .as[(Long, Long, Double)].collect().toSet
    assert(guardedMin == unguardedMin && guardedMin.nonEmpty,
      s"minhash: guarded $guardedMin vs unguarded-remainder $unguardedMin")
    val guardedNg = Dedup
      .ngramJaccard(spark, docsDir, limit = 1000000, maxDf = 100)
      .as[(Long, Long, Double)].collect().toSet
    val unguardedNg = Dedup
      .ngramJaccard(spark, rem, limit = 1000000, maxDf = Int.MaxValue)
      .as[(Long, Long, Double)].collect().toSet
    assert(guardedNg == unguardedNg && guardedNg.nonEmpty,
      s"ngram: guarded $guardedNg vs unguarded-remainder $unguardedNg")
  }

  test("embedding hot-bucket guard: identical-vector mass dropped, near pair kept") {
    val d = Files.createTempDirectory("graft-guard-emb").toString
    val mass = (1L to 5000L).map(i => (i, Array.fill(8)(1.0f)))
    val near = Seq(
      (20001L, Array(-1.0f, 1f, 1f, 1f, 1f, 1f, 1f, 0.9f)),
      (20002L, Array(-1.0f, 1f, 1f, 1f, 1f, 1f, 1f, 1.0f)))
    (mass ++ near).toDF("vec_id", "embedding")
      .coalesce(2).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = Similarity.dedupEmbedding(spark, d, maxBucket = 100)
      .as[(Long, Long, Double)].collect()
    // the 5000-strong sign-bucket (all-positive → 255) is dropped; the
    // two near vectors share bucket 254 and remain the only pair
    assert(out.length == 1, out.mkString(","))
    assert(out.head._1 == 20001L && out.head._2 == 20002L)
    assert(out.head._3 > 0.99)
  }

  test("flat-df corpus: the corpus-relative df cap fires where a large absolute cap stays dark") {
    // the sf10 DNF shape in miniature: a FIXED tiny vocabulary keeps
    // every shingle's df high (here 200 — over the 100 floor, under
    // 1000, the old absolute default that stayed dark at sf10), so only
    // a threshold the corpus count can't outgrow fires. 1600 docs in 8
    // identity classes of 200: unguarded pairing goes ~within-class
    // all-pairs (8·C(200,2) = 159 200 — the quadratic the guard exists
    // to stop); guarded, every shingle is over the cap and the pairing
    // collapses.
    val d = Files.createTempDirectory("graft-guard-flat").toString
    val vocab = Array("w0", "w1", "w2", "w3", "w4", "w5", "w6", "w7")
    val docs = (1L to 1600L).map { i =>
      val toks = (0 until 24).map(j => vocab(((i + j * j) % 8).toInt))
      (i, toks.mkString(" "))
    }
    docs.toDF("doc_id", "text")
      .coalesce(2).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val guarded = Dedup.ngramJaccard(spark, d, limit = 1000000)
      .as[(Long, Long, Double)].collect()
    val unguarded = Dedup
      .ngramJaccard(spark, d, limit = 1000000, maxDf = Int.MaxValue)
      .as[(Long, Long, Double)].collect()
    assert(unguarded.length > 100000, s"fixture too tame: ${unguarded.length}")
    assert(guarded.length < unguarded.length / 10,
      s"relative cap never fired: ${guarded.length} vs ${unguarded.length}")
    val wg = Dedup.winnowPairsOf(
      Dedup.winnowOf(spark.read.parquet(s"$d/documents.parquet"), k = 3, w = 2)
        .select("doc_id", "fingerprint").distinct(),
      limit = 1000000, maxDf = 100)
      .as[(Long, Long, Long, Double)].collect()
    assert(wg.length < unguarded.length / 10,
      s"winnow relative cap never fired: ${wg.length}")
  }

  test("the relative term RAISES the cap above a tiny floor (n > 10^4 docs)") {
    // on the 10 002-doc corpus the effective cap is
    // max(floor=1, ceil(10002/10^4)=2) = 2: the near-dup pair's df-2
    // shingles/fingerprints survive a floor that would drop them, while
    // the df-10^4 mass still goes. A purely absolute cap of 1 would
    // return NOTHING (pairing needs df >= 2) — the pair's presence is
    // the integer-ceil arithmetic working.
    val ng = Dedup.ngramJaccard(spark, docsDir, limit = 1000000, maxDf = 1)
      .as[(Long, Long, Double)].collect()
    assert(ng.exists { case (a, b, j) =>
      a == 20001L && b == 20002L && math.abs(j - 5.0 / 7) < 1e-6 },
      ng.take(5).mkString(","))
    assert(ng.forall { case (a, b, _) => a > 10000L && b > 10000L })
    val sets = Dedup
      .winnowOf(spark.read.parquet(s"$docsDir/documents.parquet"),
        k = 3, w = 2)
      .select("doc_id", "fingerprint").distinct()
    val wp = Dedup.winnowPairsOf(sets, limit = 1000000, maxDf = 1)
      .as[(Long, Long, Long, Double)].collect()
    assert(wp.exists { case (a, b, _, j) =>
      a == 20001L && b == 20002L && j > 0 }, wp.take(5).mkString(","))
    assert(wp.forall { case (a, b, _, _) => a > 10000L && b > 10000L })
  }

  test("winnow hot-fingerprint guard: mass pairs dropped, near pair survives") {
    // the identical mass elects identical fingerprints in all 10k docs
    // → fingerprint df 10k ≫ maxDf, guard drops them from pairing; the
    // near-dup pair's fingerprints are rare and pair exactly
    val sets = graft.operators.Dedup
      .winnowOf(spark.read.parquet(s"$docsDir/documents.parquet"),
        k = 3, w = 2)
      .select("doc_id", "fingerprint").distinct()
    val out = graft.operators.Dedup
      .winnowPairsOf(sets, limit = 1000000, maxDf = 100)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.forall { case (a, b, _, _) => a > 10000L && b > 10000L },
      s"mass pair leaked: ${out.take(5).mkString(",")}")
    assert(out.exists { case (a, b, _, j) =>
      a == 20001L && b == 20002L && j > 0 }, out.take(5).mkString(","))
  }

  test("degenerate corpus: quality_fit fails fast on singular normal " +
      "equations; the rank/cap ops still complete") {
    // every doc identical → both features constant → collinear with the
    // intercept → zero determinant. A silent division would emit NaN
    // weights; the fit must refuse instead.
    val d = Files.createTempDirectory("graft-degen").toString
    (1L to 2000L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src0' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(2).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Distill.qualityFit(spark, d).collect()
    }
    assert(e.getMessage.contains("singular normal equations"),
      e.getMessage)
    // rank-based ops are tie-broken by doc_id, so full degeneracy is
    // fine: contiguous order, every row ranked/capped deterministically
    val cur = graft.operators.Distill.curriculumOrder(spark, d)
      .select("ord").as[Long].collect()
    assert(cur.sorted.toSeq == (0L until 2000L).toSeq)
    val topk = graft.operators.Distill.domainTopk(spark, d)
      .as[(String, Long, Long, Long)].collect()
    assert(topk.map(r => (r._1, r._2)).toSeq ==
      (1L to 5L).map(r => ("src0", r)).toSeq)
    assert(graft.operators.Corpus.sourceCap(spark, d).count() == 2000L)
  }

  test("span survivor hot span: 10k-doc shared span completes; one keeper") {
    // a span shared by 10k documents is one df row + per-doc start
    // lists — never a doc-pair surface (spanSurvivorsOf scaladoc); each
    // doc carries a unique tail token so only span@0 is shared
    val docs = (1L to 10000L)
      .map(i => (i, s"h1 h2 h3 h4 h5 h6 h7 h8 u$i"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextOps.spanSurvivorsOf(docs)
      .select($"doc_id", $"n_removed", $"clean_text")
      .as[(Long, Long, String)].collect()
    assert(got.length == 10000)
    val byId = got.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L) == ((0L, "h1 h2 h3 h4 h5 h6 h7 h8 u1")),
      "min doc_id is the surviving canonical copy")
    assert((2L to 10000L).forall(i => byId(i) == ((8L, s"u$i"))),
      "every non-keeper loses exactly the shared span's 8 positions")
  }

  test("retrieval tier is linear on the 10k-identical-doc corpus (no pairwise surface)") {
    import graft.operators.Retrieval
    // the identical mass degenerates every bucket-style surface; the
    // retrieval tier has no pairwise operator AT ALL, so its contract
    // on this corpus is completion with linear row counts (this test
    // pins that a future change doesn't introduce a pair expansion) —
    // and nll_bucket's rank must stay exact-quartile even when 10k of
    // the 10 002 NLL values are bit-identical (doc_id breaks the ties)
    val docs = spark.read.parquet(s"$docsDir/documents.parquet")
    assert(Retrieval.textEntropyOf(docs).count() == 10002)
    val buckets = Retrieval.nllBucketOf(spark, docs)
      .groupBy("bucket").count().as[(String, Long)].collect().toMap
    assert(buckets("head") == (10002 + 3) / 4)
    assert(buckets("tail") == 10002 - (3 * 10002 + 3) / 4)
    // the mass shares no query term → bm25 excludes it by construction
    assert(Retrieval.bm25TopkOf(docs, Retrieval.QueryTerms, 100)
      .count() == 0)
    // bigram counts collapse to the distinct bigrams of the mass doc
    // (support-filtered, top-k bounded)
    assert(Retrieval.pmiBigramsOf(docs, minCount = 5L, k = 100)
      .count() <= 100)
  }

  test("semdedup hot-cell guard: 10k-identical-vector cell completes, all kept") {
    graft.functions.VectorExpressions.register(spark)
    // every vector identical → one cell of 10k; without the guard the
    // in-cell pair join is 10⁸ rows. Guarded: pair generation skips the
    // hot cell, members keep max_cos NULL / keep=true (lower-bound
    // semantics — an oversized cell demands a finer quantizer)
    val e = (0L until 10000L).map(i => (i, Array(1.0, 0.0)))
      .toDF("vec_id", "v")
    val out = graft.operators.Similarity
      .semdedupFixedOf(e, nClusters = 1, tau = 0.4, maxCell = 1000)
      .as[(Long, Long, Option[Double], Boolean)].collect()
    assert(out.length == 10000)
    assert(out.forall(r => r._2 == 0L && r._3.isEmpty && r._4))
  }
}
