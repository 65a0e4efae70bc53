package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** Corpus assembly: split determinism/stability and the stratified
  * sampler's core contract — the scale-safe plan (threshold prefilter +
  * bounded window + short-stratum fallback) returns EXACTLY what the
  * naive full-stratum window would. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("split_assign: full coverage, plausible fractions, stable assignment") {
    val s = Corpus.splitAssign(spark, dir).cache()
    val total = s.count()
    val byvSplit = s.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(byvSplit.keySet == Set("train", "val", "test"), byvSplit)
    assert(byvSplit.values.sum == total)
    // hash mod 100 over >=100 docs: train must dominate, test/val small
    assert(byvSplit("train") > byvSplit("val") &&
      byvSplit("train") > byvSplit("test"), byvSplit)
    // stability: same doc → same split on recompute (pure hash, no RNG)
    val again = Corpus.splitAssign(spark, dir)
    assert(s.select("doc_id", "split").except(
      again.select("doc_id", "split")).count() == 0)
    s.unpersist()
  }

  test("sample_stratified equals the naive full-stratum window exactly") {
    val docs = graft.model.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        graft.operators.TextOps.h32(
          concat(lit("strat:"), col("doc_id"))).as("h"))
    val w = Window.partitionBy("lang").orderBy(asc("h"), asc("doc_id"))
    val naive = docs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 50)
      .select(col("lang"), col("rk").cast("long").as("rk"), col("doc_id"))
    val fast = Corpus.sampleStratified(spark, dir)
    assert(fast.count() == naive.count())
    assert(fast.except(naive).count() == 0 &&
      naive.except(fast).count() == 0)
  }

  test("sample_stratified short-stratum fallback: quota above stratum size") {
    // quota larger than any stratum → every doc of every lang returned,
    // via the fallback path (prefilter keeps ~4x quota, but short strata
    // re-rank unfiltered)
    val total = graft.model.Tables.documents(spark, dir).count()
    val out = Corpus.sampleStratified(spark, dir, quota = 1000000)
    assert(out.count() == total)
    // ranks are dense 1..n per stratum
    val maxRk = out.groupBy("lang").agg(max("rk").as("mx"),
      count(lit(1)).as("n"))
    assert(maxRk.filter(col("mx") =!= col("n")).count() == 0)
  }

  test("domain_stats: constructed corpus — dup attribution, keep rule, shares") {
    // doc A: 25 tokens incl a stopword → keep; appears 3× (twice in
    // srcA, once in srcB) → all three are dup docs. doc S: 2 tokens →
    // fails the keep gate, unique. doc B: 21 tokens keep, unique.
    val a = ("the" +: (1 to 24).map(i => s"w$i")).mkString(" ")
    val b = ("the" +: (1 to 20).map(i => s"b$i")).mkString(" ")
    val docs = Seq(
      (1L, "srcA", a), (2L, "srcA", a), (3L, "srcA", "tiny doc"),
      (4L, "srcB", a), (5L, "srcB", b)
    ).toDF("doc_id", "source", "text")
    val out = Corpus.domainStatsOf(docs)
      .as[(String, Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    // totals: 5 docs, 25+25+2+25+21 = 98 tokens
    assert(out == Seq(
      ("srcA", 3L, 52L, 2L, 2L, 0.666667, 0.666667, 0.6, 0.530612),
      ("srcB", 2L, 46L, 2L, 1L, 1.0, 0.5, 0.4, 0.469388)))
  }

  test("domain_stats: real corpus invariants — partition, share closure") {
    val out = Corpus.domainStats(spark, dir).cache()
    val docs = graft.model.Tables.documents(spark, dir)
    assert(out.agg(sum("docs")).as[Long].collect().head == docs.count())
    // rates and shares bounded; per-source counters consistent
    assert(out.filter(col("keep_docs") > col("docs") ||
      col("dup_docs") > col("docs")).count() == 0)
    assert(out.filter(col("doc_share") <= 0 || col("doc_share") > 1)
      .count() == 0)
    // shares close to 1 up to per-source rounding (6 dp each)
    val shareSum = out.agg(sum("doc_share")).as[Double].collect().head
    assert(math.abs(shareSum - 1.0) < 1e-4, shareSum)
    // dup accounting matches a naive recount of docs in shared-text groups
    val naiveDups = docs.groupBy("text")
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .agg(sum("c")).as[Option[Long]].collect().head.getOrElse(0L)
    assert(out.agg(sum("dup_docs")).as[Long].collect().head == naiveDups)
    out.unpersist()
  }

  test("corpus_mix: rate semantics — identity, down-sample bounds, up-sample copies") {
    val docs = graft.model.Tables.documents(spark, dir)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val out = Corpus.corpusMix(spark, dir, Corpus.defaultMixRates).cache()
    // rate 1.0 sources (src1, src5, ...): every doc exactly once
    val perDoc = out.filter(col("source") === "src1")
      .groupBy("doc_id").count()
    assert(perDoc.filter(col("count") =!= 1).count() == 0)
    assert(perDoc.count() == docs("src1"))
    // rate 1.5 sources: every doc 1 or 2 copies, total in (n, 2n)
    val up = out.filter(col("source") === "src0").groupBy("doc_id").count()
    assert(up.filter(col("count") < 1 || col("count") > 2).count() == 0)
    assert(up.count() == docs("src0")) // floor(1.5)=1 → nothing dropped
    // rate 0.25 sources: subset, single copies
    val down = out.filter(col("source") === "src3")
    assert(down.count() < docs("src3"))
    assert(down.groupBy("doc_id").count()
      .filter(col("count") =!= 1).count() == 0)
    // deterministic: recompute equals
    assert(out.except(Corpus.corpusMix(spark, dir, Corpus.defaultMixRates))
      .count() == 0)
    out.unpersist()
  }

  test("pack_assign equals the naive window cumsum; packs fill their budget") {
    val budget = 500L
    val out = Corpus.packAssign(spark, dir, budget).cache()
    // naive single-partition form (fine at test scale)
    val docs = graft.model.Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        graft.operators.TextOps.h32(
          concat(lit("pack:"), col("doc_id"))).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(asc("h"), asc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = docs
      .withColumn("cum", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        (col("cum") / budget).cast("long").as("pack_id"))
    assert(out.except(naive).count() == 0 && naive.except(out).count() == 0)
    // packs are dense 0..max and every non-final pack is filled: the
    // cumulative tokens through pack p reach at least (p+1)*budget
    val packs = out.groupBy("pack_id").agg(sum("n_tokens").as("tok"))
      .orderBy("pack_id").as[(Long, Long)].collect()
    assert(packs.map(_._1).toSeq == (0L until packs.length).toSeq)
    var cum = 0L
    packs.dropRight(1).zipWithIndex.foreach { case ((_, tok), p) =>
      cum += tok
      assert(cum >= (p + 1) * budget, s"pack $p underfilled: $cum")
    }
    out.unpersist()
  }

  test("corpus_prepare: gates compose and packs restart per split") {
    val out = Corpus.corpusPrepare(spark, dir, budget = 300L).cache()
    val ids = out.select("doc_id").as[Long].collect().toSet
    // every emitted doc passed BOTH gates
    val keep = graft.operators.TextOps.textQuality(spark, dir)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    val surv = graft.operators.Dedup.dedupSurvivors(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(keep) && ids.subsetOf(surv))
    assert(ids == (keep intersect surv), "gates must compose exactly")
    // pack ids are dense from 0 WITHIN each split independently
    out.select("split").distinct().as[String].collect().foreach { s =>
      val packs = out.filter(col("split") === s)
        .select("pack_id").distinct().orderBy("pack_id")
        .as[Long].collect().toSeq
      assert(packs == (0L until packs.length), s"split $s packs: $packs")
    }
    out.unpersist()
  }

  test("sample_stratified threshold path: big synthetic strata, exact equality") {
    // 3000-doc strata engage the hash-threshold prefilter (quota*safety
    // = 20 << 3000); equality with the naive window proves the
    // prefilter never cuts a row that ranks inside the quota
    val docs = spark.range(9000)
      .selectExpr("id AS doc_id",
        "CASE CAST(id % 3 AS INT) WHEN 0 THEN 'en' WHEN 1 THEN 'fr' ELSE 'de' END AS lang")
      .withColumn("h", graft.operators.TextOps.h32(
        concat(lit("strat:"), col("doc_id"))))
    val fast = Corpus.sampleStratifiedFrom(docs, quota = 5, safety = 4)
    val w = Window.partitionBy("lang").orderBy(asc("h"), asc("doc_id"))
    val naive = docs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("rk").cast("long").as("rk"), col("doc_id"))
    assert(fast.count() == 15)
    assert(fast.except(naive).count() == 0 && naive.except(fast).count() == 0)
  }

  test("sample_stratified: per-stratum quota respected and ranks dense") {
    val out = Corpus.sampleStratified(spark, dir, quota = 5).cache()
    val per = out.groupBy("lang").count().as[(String, Long)].collect()
    assert(per.nonEmpty && per.forall(_._2 <= 5), per.toList)
    assert(out.filter(col("rk") < 1 || col("rk") > 5).count() == 0)
    out.unpersist()
  }

  test("decontaminate matches a driver-side brute force on sf0.001") {
    val out = Corpus.decontaminate(spark, dir).as[(Long, Long, Boolean)]
      .collect().map { case (id, n, c) => id -> ((n, c)) }.toMap
    // brute force: JVM-side 5-gram sets per doc, split via splitAssign
    val splits = Corpus.splitAssign(spark, dir)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val grams = graft.model.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.split(" ").sliding(5).filter(_.length == 5)
          .map(_.mkString(" ")).toSet
      }.toMap
    val evalSh = grams.collect {
      case (id, s) if splits(id) == "test" => s
    }.foldLeft(Set.empty[String])(_ ++ _)
    val trainIds = splits.collect { case (id, "train") => id }.toSet
    assert(out.keySet == trainIds, "one row per train doc")
    trainIds.foreach { id =>
      val expect = (grams(id) & evalSh).size.toLong
      assert(out(id) == ((expect, expect > 0)),
        s"doc $id: got ${out(id)}, expected $expect shared 5-grams")
    }
    // the testdata embeds genuine cross-split near-dups — the operator
    // must find at least one, or the test is vacuous
    assert(out.values.exists(_._2), "no contamination found at sf0.001?")
  }

  test("corpus_prepare_full = corpus_prepare minus rep-gate and decon drops") {
    val fullQ = Corpus.corpusPrepareFull(spark, dir)
      .select("doc_id", "split", "n_tokens").as[(Long, String, Long)]
      .collect().toSet
    val baseQ = Corpus.corpusPrepare(spark, dir)
      .select("doc_id", "split", "n_tokens").as[(Long, String, Long)]
      .collect().toSet
    // the extra gates only remove documents, never add or relabel
    assert(fullQ.subsetOf(baseQ), (fullQ -- baseQ).take(5))
    // the removed set is exactly (repetition failures ∪ contaminated
    // train docs) restricted to corpus_prepare's output
    val repFail = graft.operators.TextOps.textRepetition(spark, dir)
      .filter(!col("keep_rep")).select("doc_id").as[Long].collect().toSet
    val cont = Corpus.decontaminate(spark, dir)
      .filter(col("contaminated")).select("doc_id").as[Long]
      .collect().toSet
    val dropped = baseQ.map(_._1) -- fullQ.map(_._1)
    assert(dropped == ((repFail ++ cont) & baseQ.map(_._1)),
      dropped.take(5))
    // pack ids restart per split and are dense from 0 in the full form
    val packs = Corpus.corpusPrepareFull(spark, dir)
      .groupBy("split").agg(min("pack_id"), max("pack_id"))
      .as[(String, Long, Long)].collect()
    assert(packs.nonEmpty && packs.forall(_._2 == 0L), packs.toList)
  }

  test("pack_manifest: totals reconcile, packs dense, budget respected") {
    val man = Corpus.packManifest(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    val full = Corpus.corpusPrepareFull(spark, dir) // registry-cached
    // per-split token totals reconcile with the prepared corpus
    val manTotals = man.groupBy(_._1).view
      .mapValues(_.map(_._4).sum).toMap
    val corpusTotals = full.groupBy("split").agg(sum("n_tokens"))
      .as[(String, Long)].collect().toMap
    assert(manTotals == corpusTotals)
    // pack ids dense 0..max per split
    man.groupBy(_._1).foreach { case (split, rows) =>
      val ids = rows.map(_._2).sorted
      assert(ids.toSeq == (0L until ids.length).toSeq, s"$split: $ids")
    }
    // budget: every non-final pack closes past the 4096 boundary minus
    // one document (greedy prefix-sum packing can overshoot by at most
    // the doc that crosses the boundary)
    val maxDoc = full.agg(max("n_tokens")).as[Long].collect().head
    man.groupBy(_._1).foreach { case (split, rows) =>
      val nonFinal = rows.sortBy(_._2).dropRight(1)
      nonFinal.foreach { case (_, pid, _, toks) =>
        assert(toks > 4096 - maxDoc, s"$split pack $pid: $toks tokens")
      }
    }
  }

  test("pack_tokens reconciles with pack_manifest and the survivor token totals") {
    val pt = Corpus.packTokens(spark, dir).cache()
    // every survivor contributes exactly its token count, every token
    // position exactly once
    val perDoc = pt.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("pos").as("maxp"))
    val prep = Corpus.corpusPrepareFull(spark, dir)
      .select("doc_id", "n_tokens")
    val joined = perDoc.join(prep, "doc_id")
    assert(joined.filter(col("n") =!= col("n_tokens") ||
      col("maxp") =!= col("n_tokens") - 1).isEmpty)
    assert(perDoc.count() == prep.count()) // no survivor missing
    // the per-(split, pack) rollup IS pack_manifest
    val rolled = pt.groupBy("split", "pack_id")
      .agg(count(lit(1)).as("tokens"))
      .as[(String, Long, Long)].collect().toSet
    val manifest = Corpus.packManifest(spark, dir)
      .select("split", "pack_id", "tokens")
      .as[(String, Long, Long)].collect().toSet
    assert(rolled == manifest)
    pt.unpersist()
  }

  test("corpus_quantiles: ordered quartiles; p50 equals a driver-side median") {
    val q = Corpus.corpusQuantiles(spark, dir).cache()
    assert(q.filter(col("p25") > col("p50") || col("p50") > col("p75"))
      .isEmpty)
    // spot-check one source against the textbook interpolated median
    val src = q.select("source").orderBy("source").head().getString(0)
    val lens = graft.model.Tables.documents(spark, dir)
      .filter(col("source") === src)
      .select(size(split(col("text"), " ")).cast("double"))
      .as[Double].collect().sorted
    val pos = (lens.length - 1) * 0.5
    val (lo, hi) = (lens(pos.toInt), lens(math.ceil(pos).toInt))
    val expected = lo + (hi - lo) * (pos - pos.toInt)
    val p50 = q.filter(col("source") === src).head().getAs[Double]("p50")
    assert(p50 == expected, s"$src: p50 $p50 vs driver-side $expected")
    q.unpersist()
  }

  test("source_cap: two-level bucketed prefix sum equals the naive " +
      "one-window cumsum, including on a hot domain") {
    import graft.operators.TextOps
    // synthetic skew: one domain with 10,000 docs beside two small ones
    // — the shape whose naive window sorts the whole domain in one task
    val docs = ((1L to 10000L).map(i => (i, "hot")) ++
      (10001L to 10050L).map(i => (i, "cold1")) ++
      (10051L to 10060L).map(i => (i, "cold2")))
      .toDF("doc_id", "source")
      .withColumn("n_tokens", lit(1L) + pmod(col("doc_id"), lit(7L)))
      .withColumn("h", TextOps.h32(
        concat(lit("cap:"), col("doc_id").cast("string"))))
    val budget = 2000L
    val got = Corpus.sourceCapOf(docs, budget)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    val naive = docs
      .withColumn("cum_before", coalesce(
        sum("n_tokens").over(Window.partitionBy("source")
          .orderBy(asc("h"), asc("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("cum_before"), (col("cum_before") < budget).as("kept"))
      .orderBy("source", "cum_before")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == naive)
    // the cap binds on the hot domain and spares the small ones
    val byKept = got.groupBy(r => (r._1, r._5)).view
      .mapValues(_.size).toMap
    assert(byKept.contains(("hot", false)), "hot domain never capped")
    assert(!byKept.contains(("cold2", false)), "small domain capped")
    // kept set's token total lands in [budget, budget + max n_tokens)
    val hotKept = got.filter(r => r._1 == "hot" && r._5)
      .map(_._3).sum
    assert(hotKept >= budget && hotKept < budget + 7, hotKept.toString)
  }

  test("shingles of docs shorter than the window are empty, not garbage") {
    // Spark's sequence(0, negative) descends — the CASE guard in
    // shinglesOf must keep short docs shingle-free (DuckDB range parity)
    val docs = Seq((1L, "only four words here"), (2L, "a b c d e f"))
      .toDF("doc_id", "text")
    val sh = graft.operators.Dedup.shinglesOf(docs, 5)
      .as[(Long, String)].collect().toSeq
    assert(!sh.exists(_._1 == 1L), sh)
    assert(sh.filter(_._1 == 2L).map(_._2).sorted ==
      Seq("a b c d e", "b c d e f"), sh)
  }
}
