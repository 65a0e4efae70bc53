package graft

import java.nio.file.Files

import graft.operators.TextOps

/** BPE merge learning (TextOps.bpeMerges): the Sennrich et al. 2016
  * merge loop at word granularity. Pins the two rules everything hangs
  * on — greedy left-to-right non-overlap within a step, and merged
  * tokens participating only in LATER steps — plus the deterministic
  * tie-break, and full-table parity against an independent in-test
  * reference implementation (plain Scala fold, no Spark) on a corpus
  * wide enough to exercise ties, self-pairs and chained merges. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDir(docs: Seq[(Long, String)]): String = {
    val d = Files.createTempDirectory("graft-bpe").toString
    docs.toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  /** Independent reference: Counter + greedy fold, mirroring
    * learn_bpe.py's semantics directly (no shared code with the
    * operator). */
  private def refMerges(texts: Seq[String], n: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var docs = texts.map(_.split(' ').toSeq)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    for (step <- 1 to n) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      docs.foreach { t =>
        t.lazyZip(t.drop(1)).foreach { (a, b) =>
          counts((a, b)) = counts.getOrElse((a, b), 0L) + 1 }
      }
      if (counts.nonEmpty) {
        val ((a, b), cnt) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        val m = s"${a}_$b"
        out += ((step, a, b, m, cnt))
        docs = docs.map { t =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          t.foreach { x =>
            if (acc.nonEmpty && acc.last == a && x == b)
              acc(acc.length - 1) = m
            else acc += x
          }
          acc.toSeq
        }
      }
    }
    out.toSeq
  }

  private def run(docs: Seq[(Long, String)], n: Int)
      : Seq[(Int, String, String, String, Long)] =
    TextOps.bpeMerges(spark, corpusDir(docs), nMerges = n)
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)

  test("greedy non-overlap: 'a a a' merges once, the merged token pairs next step") {
    val got = run(Seq((1L, "a a a")), 2)
    // step 1: pair (a,a) appears at positions 1-2 and 2-3 → count 2, but
    // the rewrite is greedy left-to-right: [a_a, a]
    assert(got.head == ((1, "a", "a", "a_a", 2L)))
    // step 2: the ONLY pair is (a_a, a) — the merged symbol is new
    assert(got(1) == ((2, "a_a", "a", "a_a_a", 1L)))
  }

  test("tie-break is (count DESC, left ASC, right ASC)") {
    // both pairs occur exactly once; (b,a) < (c,a) lexicographically
    val got = run(Seq((1L, "c a"), (2L, "b a")), 1)
    assert(got == Seq((1, "b", "a", "b_a", 1L)))
  }

  test("single-token and multi-doc corpora: no pairs contributed by 1-token docs") {
    val got = run(Seq((1L, "x"), (2L, "x y"), (3L, "x y")), 1)
    assert(got == Seq((1, "x", "y", "x_y", 2L)))
  }

  test("depth robustness: 64 merge rounds complete and match the reference") {
    // 4 full checkpoint generations (BpeCheckpointEvery = 16): without
    // the lineage cut, round 64's count pass would drag a 64-deep
    // nested `aggregate` fold through analysis and codegen. 40 docs of
    // 4 repeated tokens give ~80 productive rounds: each doc yields
    // (t,t) cnt 3 then later (t_t,t_t) cnt 1, so the loop never dries
    // up before round 64 and every winner is tie-broken
    // deterministically.
    assert(TextOps.BpeCheckpointEvery * 4 == 64) // the test's premise
    val texts = (0 until 40).map(i => Seq.fill(4)(f"t$i%02d").mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = run(docs, 64)
    assert(got.size == 64)
    assert(got == refMerges(texts, 64))
  }

  test("full-table parity with the independent reference on a mixed corpus") {
    val texts = Seq(
      "the quick fox the quick fox jumps",
      "a a a a b a a b",
      "the quick brown fox",
      "b a b a b a",
      "quick quick quick the the the",
      "fox jumps fox jumps fox")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = run(docs, 5)
    assert(got == refMerges(texts, 5),
      s"got=$got expected=${refMerges(texts, 5)}")
  }
}
