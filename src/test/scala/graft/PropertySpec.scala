package graft

import org.apache.spark.sql.functions.{col, round, timestamp_micros}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.algo.PageRank

/** ScalaCheck-generator property tests (SURVEY §5.2): PageRank
  * conservation + convergence on random graphs, Jaccard range/symmetry on
  * random bipartite incidences. Samples are drawn from Gen with a fixed
  * seed (the scalatest/scalacheck bridge artifact isn't in the offline
  * cache, so sampling is driven manually). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val smallGraph: Gen[(Int, List[(Long, Long)])] = for {
    n <- Gen.choose(2, 12)
    density <- Gen.choose(1, 3)
    edges <- Gen.listOfN(n * density, for {
      s <- Gen.choose(0L, n - 1L)
      d <- Gen.choose(0L, n - 1L)
    } yield (s, d))
  } yield (n, edges.filter(e => e._1 != e._2).distinct)

  private val packInput: Gen[(List[(Long, Long, Long, String)], Long)] = for {
    n <- Gen.choose(1, 60)
    budget <- Gen.choose(1L, 50L)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 200L)
      tok <- Gen.choose(0L, 30L)
      h <- Gen.choose(0L, 5L) // tiny range → forces doc_id tie-breaks
      g <- Gen.oneOf("train", "val", "test")
    } yield (id, tok, h, g))
  } yield (rows.distinctBy(_._1), budget)

  test("packedBy ≡ driver-side per-group prefix sum on random inputs") {
    samples(packInput, 12).foreach { case (rows, budget) =>
      val df = rows.toDF("doc_id", "n_tokens", "h", "grp")
      val got = graft.operators.Corpus.packedBy(df, budget)
        .as[(Long, Long, String, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      val want = rows.groupBy(_._4).flatMap { case (g, rs) =>
        var cum = 0L
        rs.sortBy(r => (r._3, r._1)).map { case (id, tok, _, _) =>
          val pack = cum / budget
          cum += tok
          id -> ((tok, g, pack))
        }
      }
      assert(got == want, s"budget=$budget rows=$rows")
    }
  }

  test("PageRank conserves mass; fast path ≡ distributed loop on random graphs") {
    samples(smallGraph, 8).foreach { case (n, edges) =>
      val v = (0L until n.toLong).map((_, 1.0)).toDF("id", "pers")
      // row-normalize out-weights like adjacency_norm does
      val outDeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      val e = edges.map { case (s, d) => (s, d, 1.0 / outDeg(s)) }
        .toDF("src", "dst", "weight")
      // default params → single-task fast path on graphs this small
      val ranks = PageRank.run(spark, v, e).as[(Long, Double)].collect()
      assert(ranks.length == n)
      assert(math.abs(ranks.map(_._2).sum - 1.0) < 1e-6,
        s"n=$n edges=$edges sum=${ranks.map(_._2).sum}")
      assert(ranks.forall(_._2 >= 0))
      // the co-partitioned RDD loop (the 100-TB path) must agree to fp
      // noise on the same graph — keeps BOTH paths random-graph-covered
      val dist = PageRank.run(spark, v, e,
          PageRank.Params(localThreshold = 0L))
        .as[(Long, Double)].collect().toMap
      ranks.foreach { case (id, r) =>
        assert(math.abs(r - dist(id)) < 1e-9,
          s"n=$n vertex $id: fast $r vs distributed ${dist(id)}") }
    }
  }

  test("PageRank on an edgeless graph is teleport-only (all sinks)") {
    val v = (0L until 4L).map(i => (i, if (i == 2L) 1.0 else 0.0))
      .toDF("id", "pers")
    val e = Seq.empty[(Long, Long, Double)].toDF("src", "dst", "weight")
    val r = PageRank.run(spark, v, e).as[(Long, Double)].collect().toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
    assert(r(2L) > r(0L)) // personalization survives sink redistribution
  }

  test("simhash 15-bit banding finds EVERY pair within hamming 3 (random fingerprints)") {
    // pigeonhole claim behind dedup_simhash_pairs: 3 differing bits touch
    // at most 3 of the 4 15-bit bands, so one band always matches. Random
    // fingerprints are drawn clustered (few distinct base values, random
    // low-weight flips) so small-hamming pairs actually occur.
    val fpGen = for {
      base <- Gen.choose(0L, (1L << 60) - 1)
      flips <- Gen.choose(0, 4)
      bits <- Gen.listOfN(flips, Gen.choose(0, 59))
    } yield bits.foldLeft(base)((v, b) => v ^ (1L << b))
    val corpus = Gen.listOfN(40, fpGen)
    samples(corpus, 6).foreach { fps =>
      val sig = fps.zipWithIndex.map { case (f, i) => (i.toLong, f) }
        .toDF("doc_id", "simhash")
      val banded = graft.operators.Dedup.simhashPairsFrom(sig, t = 3)
        .as[(Long, Long, Long)].collect().toSet
      val brute = (for {
        (a, i) <- fps.zipWithIndex; (b, j) <- fps.zipWithIndex
        if i < j
        h = java.lang.Long.bitCount(a ^ b)
        if h <= 3
      } yield (i.toLong, j.toLong, h.toLong)).toSet
      assert(banded == brute,
        s"banded ${banded.size} vs brute ${brute.size}: " +
          s"missing ${(brute -- banded).take(3)}")
    }
  }

  test("simhash 8-band multi-index finds EVERY pair within hamming 7 (random fingerprints)") {
    // pigeonhole at the wider radius: ≤ 7 differing bits leave at least
    // one of the 8 bands untouched. Flips drawn up to 8 so pairs beyond
    // the radius occur too (the exact filter must drop them).
    val fpGen = for {
      base <- Gen.choose(0L, (1L << 60) - 1)
      flips <- Gen.choose(0, 8)
      bits <- Gen.listOfN(flips, Gen.choose(0, 59))
    } yield bits.foldLeft(base)((v, b) => v ^ (1L << b))
    val corpus = Gen.listOfN(40, fpGen)
    samples(corpus, 6).foreach { fps =>
      val sig = fps.zipWithIndex.map { case (f, i) => (i.toLong, f) }
        .toDF("doc_id", "simhash")
      val banded = graft.operators.Dedup.simhashPairsFrom(sig, t = 7)
        .as[(Long, Long, Long)].collect().toSet
      val brute = (for {
        (a, i) <- fps.zipWithIndex; (b, j) <- fps.zipWithIndex
        if i < j
        h = java.lang.Long.bitCount(a ^ b)
        if h <= 7
      } yield (i.toLong, j.toLong, h.toLong)).toSet
      assert(banded == brute,
        s"banded ${banded.size} vs brute ${brute.size}: " +
          s"missing ${(brute -- banded).take(3)}")
    }
  }

  test("adversarial hamming-7 pair touching all four 15-bit bands is found at t = 7") {
    // adversarial witness that t = 7 NEEDS the 8-band index: bits
    // 0,8,16,24,32,39,46 hit all four 15-bit bands (two each in bands
    // 0-2, one in band 3) but only seven of the eight multi-index bands
    // (8,8,8,8,7,7,7,7 bits at offsets 0,8,16,24,32,39,46,53 — one
    // flipped bit at the START of each of bands 0-6; band 7 matches).
    val a = 0L
    val b = Seq(0, 8, 16, 24, 32, 39, 46).foldLeft(0L)((v, i) => v ^ (1L << i))
    assert(java.lang.Long.bitCount(a ^ b) == 7)
    val sig = Seq((1L, a), (2L, b)).toDF("doc_id", "simhash")
    val found = graft.operators.Dedup.simhashPairsFrom(sig, t = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(found == Set((1L, 2L, 7L)))
  }

  test("jaccard is within [0,1] and symmetric on random incidences") {
    val pairsGen = Gen.listOfN(60, for {
      c <- Gen.choose(1L, 8L); p <- Gen.choose(1L, 10L)
    } yield (c, p))
    samples(pairsGen, 8).foreach { pairs =>
      val b = pairs.distinct.toDF("customer_id", "product_id")
      val sizes = b.groupBy("product_id").count()
        .as[(Long, Long)].collect().toMap
      val common = b.as("x").join(b.as("y"),
          $"x.customer_id" === $"y.customer_id" &&
            $"x.product_id" < $"y.product_id")
        .groupBy($"x.product_id".as("p1"), $"y.product_id".as("p2"))
        .count().as[(Long, Long, Long)].collect()
      common.foreach { case (p1, p2, c) =>
        val j = c.toDouble / (sizes(p1) + sizes(p2) - c)
        assert(j >= 0.0 && j <= 1.0)
        val j2 = c.toDouble / (sizes(p2) + sizes(p1) - c)
        assert(j == j2)
      }
    }
  }

  test("jaccard_lsh is sound (exact scores) and complete on identical sets") {
    val pairsGen = Gen.listOfN(60, for {
      c <- Gen.choose(1L, 8L); p <- Gen.choose(1L, 10L)
    } yield (c, p))
    samples(pairsGen, 6).foreach { pairs =>
      val b = pairs.distinct.toDF("customer_id", "product_id")
      val exact = graft.operators.Recommend.jaccardPairsFrom(b)
        .select($"p1", $"p2", round($"jaccard", 6).as("jaccard"))
        .as[(Long, Long, Double)].collect()
        .map { case (p1, p2, j) => (p1, p2) -> j }.toMap
      val lsh = graft.operators.Recommend.jaccardLshFrom(b, k = 1000)
        .as[(Long, Long, Double)].collect()
      // soundness: every surfaced pair carries the exact operator's score
      lsh.foreach { case (p1, p2, j) =>
        assert(exact.get((p1, p2)).contains(j),
          s"lsh pair ($p1,$p2)=$j disagrees with exact ${exact.get((p1, p2))}")
      }
      // completeness at j=1: identical customer sets share the whole
      // signature, so every band collides — banding finds them surely
      val lshPairs = lsh.map { case (p1, p2, _) => (p1, p2) }.toSet
      exact.foreach { case ((p1, p2), j) =>
        if (j == 1.0) assert(lshPairs.contains((p1, p2)),
          s"identical-set pair ($p1,$p2) missed by LSH banding")
      }
    }
  }

  test("jaccard_lsh_2l: the two-level aggregation is row-identical") {
    // the round-12 item-2 experiment variant reshapes only the bucket
    // collect (salted partial → merge) — the candidate set, and so the
    // whole scored output, must match the one-level shape exactly on
    // arbitrary incidences (the sf0.01 oracle row pins the same claim
    // on real data; this pins it across random shapes incl. salt-class
    // boundaries: doc sets smaller than, equal to, and above salt=16)
    val pairsGen = Gen.listOfN(80, for {
      c <- Gen.choose(1L, 10L); p <- Gen.choose(1L, 25L)
    } yield (c, p))
    samples(pairsGen, 6).foreach { pairs =>
      val b = pairs.distinct.toDF("customer_id", "product_id")
      val one = graft.operators.Recommend.jaccardLshFrom(b, k = 1000)
        .as[(Long, Long, Double)].collect().toSeq
      val two = graft.operators.Recommend.jaccardLshTwoLevelFrom(b, k = 1000)
        .as[(Long, Long, Double)].collect().toSeq
      assert(one == two, s"two-level diverged: one=$one two=$two")
    }
  }

  // (event_id, user_id, event_type, us): few users + a tiny us range →
  // equal-timestamp ties and same-instant touch/purchase collisions are
  // guaranteed, the edge cases the as-of tie discipline must pin; the
  // "other" type exercises the type filter
  private val eventStream: Gen[List[(Long, Long, String, Long)]] = for {
    n <- Gen.choose(1, 80)
    rows <- Gen.listOfN(n, for {
      uid <- Gen.choose(0L, 3L)
      us <- Gen.choose(0L, 20L)
      ty <- Gen.oneOf("view", "click", "purchase", "other")
    } yield (uid, us, ty))
  } yield rows.zipWithIndex.map { case ((u, us, ty), i) =>
    (i.toLong, u, ty, us) }

  private val randomDocs: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 10)
    texts <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 20)
      ts <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e", "f"))
    } yield ts.mkString(" "))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("text_entropy ∈ [0, ln(distinct)]; extremes exact on random docs") {
    samples(randomDocs, 10).foreach { docs =>
      val rows = graft.operators.Retrieval
        .textEntropyOf(docs.toDF("doc_id", "text")).collect()
      assert(rows.length == docs.length)
      rows.foreach { r =>
        val (n, d, h) = (r.getLong(1), r.getLong(2), r.getDouble(3))
        assert(h >= 0.0 && h <= math.log(d.toDouble) + 1e-9,
          s"entropy $h outside [0, ln($d)]")
        if (d == 1) assert(h == 0.0, "constant doc must have entropy 0")
        if (d == n) assert(math.abs(h - math.log(n.toDouble)) < 1e-6,
          "all-distinct doc must have entropy ln(n)")
      }
    }
  }

  test("nll_bucket: exact quartile sizes, buckets ordered by NLL (random docs)") {
    samples(randomDocs, 8).foreach { docs =>
      val out = graft.operators.Retrieval
        .nllBucketOf(spark, docs.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      val n = out.length
      assert(n == docs.length)
      // rank·4 < n ⇔ rank < ⌈n/4⌉; rank·4 ≥ 3n ⇔ rank ≥ ⌈3n/4⌉
      assert(out.count(_._3 == "head") == (n + 3) / 4, s"n=$n")
      assert(out.count(_._3 == "tail") == n - (3 * n + 3) / 4, s"n=$n")
      // bucket boundaries respect the (nll, doc_id) total order
      val byRank = out.sortBy { case (id, nll, _) => (nll, id) }.map(_._3)
      val order = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
      assert(byRank.map(order).sliding(2).forall(w =>
        w.length < 2 || w(0) <= w(1)), byRank.mkString(","))
    }
  }

  test("source_kl is nonnegative and zero only at identical distributions (random)") {
    val gen = for {
      n <- Gen.choose(2, 10)
      rows <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 15)
        ts <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
        src <- Gen.oneOf("s0", "s1", "s2")
      } yield (ts.mkString(" "), src))
    } yield rows.zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) }
    samples(gen, 10).foreach { docs =>
      val out = graft.operators.Retrieval
        .sourceKlOf(docs.toDF("doc_id", "text", "source")).collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        // Gibbs' inequality; float summation can dip a true-zero KL to
        // ~-1e-15, which round(·,6) takes to -0.0 — and -0.0 >= 0.0
        assert(r.getDouble(3) >= 0.0, s"negative KL: $r")
      }
    }
  }

  test("winnowOf ≡ driver-side robust winnowing on random docs") {
    def h32ref(s: String): Long =
      java.lang.Long.parseLong(java.security.MessageDigest
        .getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8), 16)
    def ref(tokens: Seq[String], k: Int, w: Int): Set[(Long, Long)] = {
      val hs =
        if (tokens.length < k) Vector.empty[Long]
        else tokens.sliding(k).map(g => h32ref(g.mkString(" "))).toVector
      (0 to hs.length - w).map { s =>
        val win = hs.slice(s, s + w)
        val mn = win.min
        ((s + win.lastIndexOf(mn)).toLong, mn) // rightmost minimizer
      }.toSet
    }
    samples(randomDocs, 10).foreach { docs =>
      val got = graft.operators.Dedup
        .winnowOf(docs.toDF("doc_id", "text"), k = 3, w = 4)
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).map { case (id, rs) =>
          id -> rs.map(r => (r._2, r._3)).toSet }
      val want = docs.map { case (id, text) =>
        id -> ref(text.split(" ").toSeq, 3, 4) }.filter(_._2.nonEmpty).toMap
      assert(got == want, s"docs=$docs")
    }
    // the winnowing guarantee, pinned on a constructed pair: two docs
    // sharing a (w+k-1)-token substring share at least one fingerprint
    val shared = "p q r s t u" // 6 = w+k-1 tokens
    val pair = Seq((1L, s"a b c d e $shared"), (2L, s"$shared x y z w2 v"))
    val fps = graft.operators.Dedup
      .winnowOf(pair.toDF("doc_id", "text"), k = 3, w = 4)
      .as[(Long, Long, Long)].collect()
    val f1 = fps.filter(_._1 == 1L).map(_._3).toSet
    val f2 = fps.filter(_._1 == 2L).map(_._3).toSet
    assert((f1 & f2).nonEmpty, s"guarantee violated: $f1 vs $f2")
  }

  test("eventAsofOf ≡ driver-side last-touch on random streams (ties included)") {
    samples(eventStream, 12).foreach { rows =>
      val df = rows.toDF("event_id", "user_id", "event_type", "us")
        .select(col("event_id"), col("user_id"), col("event_type"),
          timestamp_micros(col("us")).as("ts"))
      val got = graft.operators.EventsOps.eventAsofOf(df)
        .select("event_id", "touch_event_id").collect()
        .map(r => r.getLong(0) ->
          Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      val touches = rows.filter(r => r._3 == "view" || r._3 == "click")
      val want = rows.filter(_._3 == "purchase").map {
        case (eid, uid, _, us) =>
          val cand = touches.filter(t => t._2 == uid && t._4 <= us)
          eid -> (if (cand.isEmpty) None
                  else Some(cand.maxBy(t => (t._4, t._1))._1))
      }.toMap
      assert(got == want, s"rows=$rows")
    }
  }

  test("eventWindowJoinOf ≡ driver-side range join on random streams (winUs=5)") {
    val winUs = 5L // tiny window over us ∈ [0,20] — every bucket edge hit
    samples(eventStream, 12).foreach { rows =>
      val df = rows.toDF("event_id", "user_id", "event_type", "us")
        .select(col("event_id"), col("user_id"), col("event_type"),
          timestamp_micros(col("us")).as("ts"))
      val got = graft.operators.EventsOps.eventWindowJoinOf(df, winUs)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(3), r.getLong(4), r.getLong(5),
            Option(r.get(6)).map(_.asInstanceOf[Long])))).toMap
      val touches = rows.filter(r => r._3 == "view" || r._3 == "click")
      val want = rows.filter(_._3 == "purchase").map {
        case (eid, uid, _, us) =>
          val c = touches.filter(t =>
            t._2 == uid && t._4 <= us && t._4 >= us - winUs)
          eid -> ((c.size.toLong, c.count(_._3 == "view").toLong,
            c.count(_._3 == "click").toLong,
            if (c.isEmpty) None else Some(us - c.map(_._4).max)))
      }.toMap
      assert(got == want, s"rows=$rows")
    }
  }
}
