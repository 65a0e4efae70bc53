package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.algo.PageRank
import graft.operators.{Corpus, Dedup, Distill, EventsOps, GraphMetrics, Multimodal, Recommend, Relational, Retrieval, Similarity, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is an operator from SURVEY.md §2 (or the
  * extension surface §7.4); every key that is ANSI-SQL-expressible also
  * appears in [[oracleSql]] with a DuckDB-runnable equivalent over the same
  * parquet tables. Column names and ordering are aligned pairwise; floats
  * are engine-deterministic by construction (see [[graft.operators.Det]]).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * cooc_topk = the reference's "frequently bought together" ranking
    * (`tp2/app/main.py:98-105`) — scan+join+agg+sort+limit in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.coocTopk(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_project"      -> ((s, d) => Relational.scanProject(s, d)),
    "cooc_topk"         -> ((s, d) => Relational.coocTopk(s, d)),
    "cooc_pairs"        -> ((s, d) => Relational.coocPairs(s, d)),
    "popularity_topk"   -> ((s, d) => Relational.popularityTopk(s, d)),
    "popularity_approx" -> ((s, d) => Relational.popularityApprox(s, d)),
    "orderfreq_topk"    -> ((s, d) => Relational.orderfreqTopk(s, d)),
    "event_weights"     -> ((s, d) => Relational.eventWeights(s, d)),
    "edges_build"       -> ((s, d) => Relational.edgesBuild(s, d)),
    "event_edges"       -> ((s, d) => Relational.eventEdges(s, d)),
    "bipartite_edges"   -> ((s, d) => Relational.bipartiteEdges(s, d)),
    "adjacency_norm"    -> ((s, d) => Relational.adjacencyNorm(s, d)),
    "collab_topk"       -> ((s, d) => Recommend.collabTopk(s, d)),
    "jaccard_sim"      -> ((s, d) => Recommend.jaccardTopk(s, d)),
    "jaccard_lsh"      -> ((s, d) => Recommend.jaccardLsh(s, d)),
    "jaccard_lsh_2l"   -> ((s, d) => Recommend.jaccardLshTwoLevel(s, d)),
    "rec_blend"         -> ((s, d) => Recommend.recBlend(s, d)),
    // the full 3-strategy blend on the FIXED-iteration PPR — the
    // hash-checkable twin of rec_blend_full (which stays on the
    // converged fixpoint, no oracle by design)
    "rec_blend_fixed"   -> ((s, d) => Recommend.recBlendFixed(s, d)),
    // iterative graph tier — not SQL-expressible, so no oracleSql entry;
    // verified by golden-fixture + invariant ScalaTests (SURVEY §5.2)
    "pagerank_global"   -> ((s, d) => PageRank.pagerankGlobal(s, d)),
    "pagerank_fixed"    -> ((s, d) => PageRank.pagerankFixed(s, d)),
    "ppr_seeded"        -> ((s, d) => PageRank.pprSeeded(s, d)),
    "ppr_fixed"         -> ((s, d) => PageRank.pprFixed(s, d)),
    "rec_blend_full"    -> ((s, d) => {
      // full tp1 blend incl. the PPR strategy (Engine scaladoc); seed =
      // min purchasing customer, same convention as rec_blend
      val g = graft.rec.Engine.fromOrders(s, d)
      val row = g.incidence.agg(org.apache.spark.sql.functions
        .min("customer_id")).collect()(0)
      if (row.isNullAt(0)) // empty incidence → nobody to recommend for
        s.range(0).selectExpr("id AS product_id",
          "CAST(0.0 AS DOUBLE) AS score", "CAST(0.0 AS DOUBLE) AS c_cooc",
          "CAST(0.0 AS DOUBLE) AS c_sim", "CAST(0.0 AS DOUBLE) AS c_ppr",
          "CAST(0.0 AS DOUBLE) AS c_global")
      else graft.rec.Engine.recommend(s, g, row.getLong(0), topN = 10)
    }),
    // events analytics tier
    "json_props"        -> ((s, d) => EventsOps.jsonProps(s, d)),
    "event_hourly"      -> ((s, d) => EventsOps.eventHourly(s, d)),
    "event_sliding"     -> ((s, d) => EventsOps.eventSliding(s, d)),
    "sessionize"        -> ((s, d) => EventsOps.sessionize(s, d)),
    "event_funnel"      -> ((s, d) => EventsOps.eventFunnel(s, d)),
    "event_retention"   -> ((s, d) => EventsOps.eventRetention(s, d)),
    "event_asof"        -> ((s, d) => EventsOps.eventAsof(s, d)),
    "event_window_join" -> ((s, d) => EventsOps.eventWindowJoin(s, d)),
    "event_anomaly"     -> ((s, d) => EventsOps.eventAnomaly(s, d)),
    // text analysis tier
    "text_tokens"        -> ((s, d) => TextOps.textStats(s, d)),
    "text_quality"      -> ((s, d) => TextOps.textQuality(s, d)),
    "tfidf"             -> ((s, d) => TextOps.tfidf(s, d)),
    "text_fingerprint"  -> ((s, d) => TextOps.textFingerprint(s, d)),
    "lang_id"           -> ((s, d) => TextOps.langId(s, d)),
    "lang_id_ngram"     -> ((s, d) => TextOps.langIdNgram(s, d)),
    // dedup tier
    "dedup_exact"       -> ((s, d) => Dedup.dedupExact(s, d)),
    "dedup_minhash"     -> ((s, d) => Dedup.dedupMinhash(s, d)),
    "dedup_simhash"     -> ((s, d) => Dedup.simhash(s, d)),
    "dedup_simhash_pairs" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "dedup_clusters"    -> ((s, d) => Dedup.dedupClusters(s, d)),
    "dedup_survivors"   -> ((s, d) => Dedup.dedupSurvivors(s, d)),
    "ngram_jaccard"     -> ((s, d) => Dedup.ngramJaccard(s, d)),
    // similarity search tier
    "sim_topk"          -> ((s, d) => Similarity.simTopk(s, d)),
    "knn_bucketed"      -> ((s, d) => Similarity.knnBucketed(s, d)),
    "knn_multiprobe"    -> ((s, d) => Similarity.knnMultiProbe(s, d)),
    "knn_ivf_fixed"     -> ((s, d) => Similarity.knnIvfFixed(s, d)),
    // learned-quantizer IVF — iterative k-means fixpoint, so no SQL
    // oracle (same justification as the pagerank tier); invariant-tested
    "knn_ivf"           -> ((s, d) => Similarity.knnIvf(s, d)),
    "dedup_embedding"   -> ((s, d) => Similarity.dedupEmbedding(s, d)),
    // multimodal plumbing (image + audio decode real, video stubbed —
    // see Multimodal scaladoc)
    "multimodal_features" -> ((s, d) => Multimodal.featuresQuery(s, d)),
    "multimodal_frames"   -> ((s, d) => Multimodal.framesQuery(s, d)),
    "multimodal_resize"   -> ((s, d) => Multimodal.resizeQuery(s, d)),
    // corpus assembly tier
    "split_assign"      -> ((s, d) => Corpus.splitAssign(s, d)),
    "sample_stratified" -> ((s, d) => Corpus.sampleStratified(s, d)),
    "corpus_mix"        -> ((s, d) =>
      Corpus.corpusMix(s, d, Corpus.defaultMixRates)),
    "mix_quality"       -> ((s, d) =>
      Corpus.mixQuality(s, d, Corpus.defaultMixRates)),
    "pack_assign"       -> ((s, d) => Corpus.packAssign(s, d)),
    "corpus_prepare"    -> ((s, d) => Corpus.corpusPrepare(s, d)),
    "decontaminate"     -> ((s, d) => Corpus.decontaminate(s, d)),
    "ngram_counts"      -> ((s, d) => TextOps.ngramCounts(s, d)),
    "vocab_build"       -> ((s, d) => TextOps.vocabBuild(s, d)),
    "embed_quantize"    -> ((s, d) => Similarity.embedQuantize(s, d)),
    "corpus_stats"      -> ((s, d) => Corpus.corpusStats(s, d)),
    "corpus_quantiles"  -> ((s, d) => Corpus.corpusQuantiles(s, d)),
    "text_repetition"   -> ((s, d) => TextOps.textRepetition(s, d)),
    "span_dup_rate"     -> ((s, d) => TextOps.spanDupRate(s, d)),
    "corpus_prepare_full" -> ((s, d) => Corpus.corpusPrepareFull(s, d)),
    "pack_manifest"     -> ((s, d) => Corpus.packManifest(s, d)),
    "pack_tokens"       -> ((s, d) => Corpus.packTokens(s, d)),
    "tokenize_ids"      -> ((s, d) => TextOps.tokenizeIds(s, d)),
    "tokenize_unk"      -> ((s, d) => TextOps.tokenizeUnk(s, d)),
    "bpe_merges"        -> ((s, d) => TextOps.bpeMerges(s, d)),
    "bpe_merges_bytes"  -> ((s, d) => TextOps.bpeMergesBytes(s, d)),
    // quantized-ANN query path: approximates exact cosine (recall
    // pinned in ScalaTest) but the quantized computation itself is
    // deterministic → oracle-checked like the rest of the ANN tier
    "knn_quantized"     -> ((s, d) => Similarity.knnQuantized(s, d)),
    // the last two survey rows previously scoped n/a, reframed
    // Spark-first: S8 batch chunker as deterministic hash-bucket batch
    // assignment, G3 visualization as bounded DOT serialization
    "chunk_assign"      -> ((s, d) => graft.sources.Etl.chunkAssign(s, d)),
    "viz_dot"           -> ((s, d) => graft.operators.Viz.dotLines(s, d)),
    // corpus observability tier (round 9): per-domain curation report,
    // tokenizer-sizing coverage curve, semantic-cluster audit
    "domain_stats"      -> ((s, d) => Corpus.domainStats(s, d)),
    "vocab_coverage"    -> ((s, d) => TextOps.vocabCoverage(s, d)),
    "cluster_stats"     -> ((s, d) => Similarity.clusterStats(s, d)),
    // graph-structure + boilerplate-removal tier (round 9): per-vertex
    // triadic structure on the co-purchase graph, cross-doc span removal
    "triangle_counts"   -> ((s, d) => GraphMetrics.triangleCounts(s, d)),
    "triangle_est"      -> ((s, d) => GraphMetrics.triangleEst(s, d)),
    "graph_stats"       -> ((s, d) => GraphMetrics.graphStats(s, d)),
    "degree_dist"       -> ((s, d) => GraphMetrics.degreeDist(s, d)),
    "text_clean"        -> ((s, d) => TextOps.textClean(s, d)),
    "span_survivors"    -> ((s, d) => TextOps.spanSurvivors(s, d)),
    // round-9 widening: per-vector semantic-dedup verdicts (SemDeDup on
    // the fixed-centroid cells), PII scrubbing over synthesized contact
    // notes, and bounded-depth BFS reachability (the Cypher
    // variable-length-path shape) on the co-purchase graph
    "semdedup_fixed"    -> ((s, d) => Similarity.semdedupFixed(s, d)),
    "pii_redact"        -> ((s, d) => TextOps.piiRedact(s, d)),
    "reach_hops"        -> ((s, d) => GraphMetrics.reachHops(s, d)),
    // retrieval & LM-statistics tier (round 9): BM25 ranking for a
    // fixed query, unigram-LM surprise (the perplexity-filter proxy),
    // PMI collocations
    "bm25_topk"         -> ((s, d) => Retrieval.bm25Topk(s, d)),
    "unigram_logprob"   -> ((s, d) => Retrieval.unigramLogprob(s, d)),
    "pmi_bigrams"       -> ((s, d) => Retrieval.pmiBigrams(s, d)),
    // quality-binning pair: CCNet head/middle/tail by exact global NLL
    // rank; within-doc distribution entropy
    "nll_bucket"        -> ((s, d) => Retrieval.nllBucket(s, d)),
    "text_entropy"      -> ((s, d) => Retrieval.textEntropy(s, d)),
    "bigram_nll"        -> ((s, d) => Retrieval.bigramNll(s, d)),
    "source_kl"         -> ((s, d) => Retrieval.sourceKl(s, d)),
    // robust winnowing (MOSS) — positional local fingerprints + the
    // fingerprint-set near-dup pairing over them
    "winnow_fingerprints" -> ((s, d) => Dedup.winnowFingerprints(s, d)),
    "winnow_pairs"        -> ((s, d) => Dedup.winnowPairs(s, d)),
    // quality-model distillation tier (round 14): exact closed-form fit
    // of a cheap linear filter to an expensive teacher signal, the
    // full-corpus scoring pass it enables, and per-domain curation by
    // the teacher score; plus FIM training-example construction
    "quality_fit"       -> ((s, d) => Distill.qualityFit(s, d)),
    "quality_predict"   -> ((s, d) => Distill.qualityPredict(s, d)),
    "domain_topk"       -> ((s, d) => Distill.domainTopk(s, d)),
    "fim_transform"     -> ((s, d) => Corpus.fimTransform(s, d)),
    "curriculum_order"  -> ((s, d) => Distill.curriculumOrder(s, d)),
    "source_cap"        -> ((s, d) => Corpus.sourceCap(s, d)),
    "bpe_encode"        -> ((s, d) => TextOps.bpeEncode(s, d)),
    "bpe_encode_bytes"  -> ((s, d) => TextOps.bpeEncodeBytes(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** The 16 minhash permutation constants (a, b) for
    * `(a·h + b) mod 1000000007`, index = position in the signature —
    * the SAME constants as the Spark side (`Dedup.scala` minhash);
    * change in lockstep. */
  private val minhashPerms: Seq[(Long, Long)] = Seq(
    654435747L -> 40503L, 953445008L -> 640493002L,
    666121539L -> 887878419L, 916718432L -> 739353030L,
    635055555L -> 15564468L, 613703214L -> 407642994L,
    478985632L -> 764070412L, 685929885L -> 143680607L,
    537319864L -> 495584588L, 113289140L -> 662427260L,
    443904346L -> 291123970L, 237508372L -> 394074373L,
    760536115L -> 194217892L, 56448786L -> 407224614L,
    174558421L -> 818425391L, 842614604L -> 683379637L)

  /** The minhash-LSH candidate SQL, shared verbatim by the
    * `dedup_minhash` oracle and (as the pair source subquery) by the
    * `dedup_clusters`/`dedup_survivors`/`corpus_prepare*` closures.
    * Round 11 part 2: the signature stage is ONE 16-column min
    * aggregate over the (doc, shingle-hash) stream — per-permutation
    * arithmetic unchanged — instead of the 16× permutation cross-join
    * + (doc, i) group-by, whose 1.6 B-row working set at sf10 was the
    * measured wall behind both the r9 "95 GB RSS" closure DNF and the
    * pack-chain oracles' >68 GB temp (SCALING.md §4/§6). Verified
    * value-identical to the cross-join form at sf0.01 and sf0.1
    * before the swap (the round-10 discipline). */
  private val dedupMinhashSql: String = {
    // Everything below derives from minhashPerms.size: the signature
    // width, band count, and similarity divisor all track a single
    // constant (advisor r11: four hardcoded drift points → one).
    val k = minhashPerms.size
    val mins = minhashPerms.zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * h + $b) % 1000000007) AS v$i"
    }.mkString(",\n         ")
    // Band columns get non-colliding names (bv1, bv2): band 0 used to
    // emit `v0 AS v1, v1 AS v2`, which only bound the TABLE column v1
    // (not the lateral alias) by DuckDB's resolution precedence —
    // correct but fragile (advisor r11).
    val bandRows = (0 until k / 2).map { b =>
      val pre = if (b == 0) s"SELECT doc_id, 0 AS band, v0 AS bv1, v1 AS bv2"
                else s"UNION ALL SELECT doc_id, $b, v${2 * b}, v${2 * b + 1}"
      s"$pre FROM mhw"
    }.mkString("\n  ")
    val eq = (0 until k).map(i =>
      s"(CASE WHEN x.v$i = y.v$i THEN 1 ELSE 0 END)")
      .grouped(2).map(_.mkString(" + ")).mkString("\n          + ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents),
      |sh AS (SELECT DISTINCT doc_id, sh FROM (
      |         SELECT doc_id, unnest(list_transform(range(len(t) - 2),
      |           i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS sh
      |         FROM toks)),
      |h AS (SELECT doc_id,
      |             CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT) AS h
      |      FROM sh),
      |mhw AS MATERIALIZED (
      |  SELECT doc_id,
      |         $mins
      |  FROM h GROUP BY 1),
      |bands AS (
      |  $bandRows),
      |cand AS (SELECT DISTINCT a.doc_id AS p1, b.doc_id AS p2
      |         FROM bands a JOIN bands b
      |           ON a.band = b.band AND a.bv1 = b.bv1 AND a.bv2 = b.bv2
      |          AND a.doc_id < b.doc_id)
      |SELECT c.p1, c.p2,
      |       CAST($eq AS BIGINT) / $k.0 AS est_jaccard
      |FROM cand c JOIN mhw x ON x.doc_id = c.p1
      |            JOIN mhw y ON y.doc_id = c.p2
      |ORDER BY est_jaccard DESC, p1 ASC, p2 ASC LIMIT 500""".stripMargin
  }

  /** The corpus_prepare_full oracle, extracted so `pack_manifest`
    * wraps it as a subquery. */
  private lazy val corpusPrepareFullSql: String =
      s"""WITH RECURSIVE pairs AS (SELECT p1, p2 FROM ($dedupMinhashSql) q),
        |e AS (SELECT p1 AS a, p2 AS b FROM pairs
        |      UNION SELECT p2, p1 FROM pairs),
        |reach(a, b) AS (SELECT a, b FROM e
        |                UNION SELECT r.a, e2.b
        |                      FROM reach r JOIN e e2 ON r.b = e2.a),
        |lbl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        |        FROM reach GROUP BY a),
        |tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |spl AS (SELECT doc_id,
        |          CASE WHEN bkt < 80 THEN 'train'
        |               WHEN bkt < 90 THEN 'val' ELSE 'test' END AS split
        |        FROM (SELECT doc_id,
        |                CAST(('0x' || substr(md5('split:' ||
        |                      CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |                  % 100 AS bkt FROM documents)),
        |bg AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c FROM (
        |         SELECT doc_id, unnest(list_transform(range(len(t) - 1),
        |           i -> t[i+1] || ' ' || t[i+2])) AS gram FROM tk)
        |       GROUP BY 1, 2),
        |rep AS (SELECT doc_id FROM (
        |          SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb,
        |            CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
        |              AS rs
        |          FROM bg GROUP BY 1)
        |        WHERE rs / nb < CAST(0.25 AS DOUBLE)),
        |sh5 AS (SELECT DISTINCT doc_id, sh FROM (
        |          SELECT doc_id, unnest(list_transform(range(len(t) - 4),
        |            i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |                 t[i+4] || ' ' || t[i+5])) AS sh FROM tk)),
        |ev AS (SELECT DISTINCT sh5.sh FROM sh5 JOIN spl USING (doc_id)
        |       WHERE spl.split = 'test'),
        |cont AS (SELECT DISTINCT sh5.doc_id FROM sh5
        |         JOIN spl USING (doc_id) JOIN ev ON sh5.sh = ev.sh
        |         WHERE spl.split = 'train'),
        |base AS (SELECT d.doc_id,
        |           CAST(len(t.t) AS BIGINT) AS n_tokens,
        |           CAST(('0x' || substr(md5('pack:' ||
        |                 CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h,
        |           s.split
        |         FROM documents d
        |         JOIN tk t ON d.doc_id = t.doc_id
        |         JOIN spl s ON d.doc_id = s.doc_id
        |         WHERE len(t.t) BETWEEN 20 AND 1000
        |           AND len(list_filter(t.t,
        |                 x -> x IN ('the', 'a', 'of', 'and', 'in'))) > 0
        |           AND d.doc_id IN (SELECT doc_id FROM rep)
        |           AND d.doc_id NOT IN
        |               (SELECT doc_id FROM lbl WHERE doc_id <> cluster_id)
        |           AND d.doc_id NOT IN (SELECT doc_id FROM cont)),
        |c AS (SELECT doc_id, split, n_tokens,
        |        COALESCE(sum(n_tokens) OVER (PARTITION BY split
        |          ORDER BY h, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS cum
        |      FROM base)
        |SELECT doc_id, split, n_tokens, CAST(cum // 4096 AS BIGINT)
        |         AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin

  /** The `tokenize_unk` oracle, extracted so `pack_tokens` reuses it as
    * a subquery (the same sharing pattern as [[corpusPrepareFullSql]]). */
  private val tokenizeUnkSql: String =
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |c AS (SELECT token, CAST(count(*) AS BIGINT) AS n
        |      FROM tok GROUP BY 1 HAVING count(*) >= 5),
        |v AS (SELECT CAST(row_number() OVER (ORDER BY n DESC, token ASC)
        |         - 1 AS BIGINT) AS token_id, token FROM c),
        |seq AS (SELECT doc_id,
        |          unnest(list_transform(range(len(t)),
        |            i -> {'pos': i, 'tok': t[i+1]})) AS u
        |        FROM (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents))
        |SELECT s.doc_id, CAST(s.u.pos AS BIGINT) AS pos,
        |       CAST(COALESCE(v.token_id + 1, 0) AS BIGINT) AS token_id
        |FROM seq s LEFT JOIN (SELECT * FROM v WHERE token_id < 50000) v
        |  ON s.u.tok = v.token
        |ORDER BY doc_id, pos""".stripMargin

  /** DuckDB oracle for `bpe_merges`: the BPE merge loop unrolled to
    * `iters` steps (the pagerank_fixed pattern — fixed iteration count →
    * chained MATERIALIZED CTEs, hash-exact longs/strings throughout).
    * Each step counts adjacent pairs from the split token list, picks
    * the (cnt DESC, a, b) winner, and rewrites the corpus with the
    * doubled-space replace trick: double every separator so each token
    * owns a space on both sides, string-replace ` a␣␣b ` (left-to-right,
    * non-overlapping — replace()'s scan order IS BPE's greedy rule once
    * spaces are doubled), then collapse runs of spaces back. Since
    * round 11 the Spark side applies merges with the SAME doubled-space
    * replace (TextOps.bpeMerges scaladoc); the semantics were proven
    * fold-equivalent back when the engine used the array fold, and
    * BpeSpec still pins parity against an independent fold reference. */
  private def bpeMergesSql(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      val apply =
        if (k == iters) "" else s""",
           |d${k + 1} AS MATERIALIZED (
           |  SELECT trim(regexp_replace(
           |           replace(' ' || replace(s, ' ', '  ') || ' ',
           |                   coalesce((SELECT ' ' || a || '  ' || b || ' '
           |                             FROM w$k), chr(1)),
           |                   coalesce((SELECT ' ' || m || ' ' FROM w$k),
           |                            chr(1))),
           |           ' +', ' ', 'g')) AS s
           |  FROM d$k)""".stripMargin
      s"""p$k AS (
         |  SELECT t[i] AS a, t[i + 1] AS b, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
         |        FROM (SELECT string_split(s, ' ') AS t FROM d$k))
         |  GROUP BY 1, 2),
         |w$k AS MATERIALIZED (
         |  SELECT a, b, a || '_' || b AS m, cnt
         |  FROM p$k ORDER BY cnt DESC, a, b LIMIT 1)$apply""".stripMargin
    }.mkString(",\n")
    val out = (1 to iters).map { k =>
      s"SELECT $k AS step, a AS lhs, b AS rhs, m AS merged, cnt AS pair_count FROM w$k"
    }.mkString("\nUNION ALL ")
    s"""WITH d1 AS MATERIALIZED (SELECT text AS s FROM documents),
       |$steps
       |$out
       |ORDER BY step""".stripMargin
  }

  /** DuckDB oracle for `bpe_encode`: [[bpeMergesSql]]'s learn chain
    * with doc_id carried through every d-CTE and the FINAL merge also
    * applied (the learn chain skips the last apply — encoding needs
    * it), then per-doc before/after counts joined back to documents.
    * Merge selection is unchanged (pair counts group by (a, b) only,
    * so carrying doc_id cannot move a winner). */
  private def bpeEncodeSql(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""p$k AS (
         |  SELECT t[i] AS a, t[i + 1] AS b, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
         |        FROM (SELECT string_split(s, ' ') AS t FROM d$k))
         |  GROUP BY 1, 2),
         |w$k AS MATERIALIZED (
         |  SELECT a, b, a || '_' || b AS m, cnt
         |  FROM p$k ORDER BY cnt DESC, a, b LIMIT 1),
         |d${k + 1} AS MATERIALIZED (
         |  SELECT doc_id, trim(regexp_replace(
         |           replace(' ' || replace(s, ' ', '  ') || ' ',
         |                   coalesce((SELECT ' ' || a || '  ' || b || ' '
         |                             FROM w$k), chr(1)),
         |                   coalesce((SELECT ' ' || m || ' ' FROM w$k),
         |                            chr(1))),
         |           ' +', ' ', 'g')) AS s
         |  FROM d$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH d1 AS MATERIALIZED (SELECT doc_id, text AS s FROM documents),
       |$steps
       |SELECT d.doc_id,
       |       CAST(len(string_split(doc.text, ' ')) AS BIGINT)
       |         AS n_tokens,
       |       CAST(len(string_split(d.s, ' ')) AS BIGINT)
       |         AS n_tokens_bpe,
       |       round(CAST(len(string_split(d.s, ' ')) AS DOUBLE)
       |             / len(string_split(doc.text, ' ')), 6)
       |         AS compression
       |FROM d${iters + 1} d JOIN documents doc USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** DuckDB oracle for `bpe_merges_bytes`: the byte/char-level variant
    * of [[bpeMergesSql]] — words become char sequences with the `</w>`
    * marker glued to the last char, the loop runs over the
    * word-frequency TYPE table (pair counts are freq-weighted sums),
    * and merges concatenate symbols directly. Same unrolled chained-
    * MATERIALIZED-CTE shape, same doubled-space greedy replace. */
  private def bpeMergesBytesSql(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      val apply =
        if (k == iters) "" else s""",
           |d${k + 1} AS MATERIALIZED (
           |  SELECT trim(regexp_replace(
           |           replace(' ' || replace(s, ' ', '  ') || ' ',
           |                   coalesce((SELECT ' ' || a || '  ' || b || ' '
           |                             FROM w$k), chr(1)),
           |                   coalesce((SELECT ' ' || m || ' ' FROM w$k),
           |                            chr(1))),
           |           ' +', ' ', 'g')) AS s, f
           |  FROM d$k)""".stripMargin
      s"""p$k AS (
         |  SELECT t[i] AS a, t[i + 1] AS b, CAST(sum(f) AS BIGINT) AS cnt
         |  FROM (SELECT t, f, unnest(generate_series(1, len(t) - 1)) AS i
         |        FROM (SELECT string_split(s, ' ') AS t, f FROM d$k))
         |  GROUP BY 1, 2),
         |w$k AS MATERIALIZED (
         |  SELECT a, b, a || b AS m, cnt
         |  FROM p$k ORDER BY cnt DESC, a, b LIMIT 1)$apply""".stripMargin
    }.mkString(",\n")
    val out = (1 to iters).map { k =>
      s"SELECT $k AS step, a AS lhs, b AS rhs, m AS merged, cnt AS pair_count FROM w$k"
    }.mkString("\nUNION ALL ")
    s"""WITH d1 AS MATERIALIZED (
       |  SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || '</w>' AS s,
       |         CAST(count(*) AS BIGINT) AS f
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY 1),
       |$steps
       |$out
       |ORDER BY step""".stripMargin
  }

  /** DuckDB oracle for `bpe_encode_bytes`: [[bpeMergesBytesSql]]'s
    * learn chain with the word `w` carried through every type-table
    * CTE and the FINAL merge also applied (merge selection groups by
    * (a, b) only, so carrying w cannot move a winner — the same
    * argument as [[bpeEncodeSql]]), then the per-doc word stream joins
    * the encoded type table and aggregates symbol counts — mirroring
    * the Spark side's one-corpus-pass broadcast-join shape. */
  private def bpeEncodeBytesSql(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""p$k AS (
         |  SELECT t[i] AS a, t[i + 1] AS b, CAST(sum(f) AS BIGINT) AS cnt
         |  FROM (SELECT t, f, unnest(generate_series(1, len(t) - 1)) AS i
         |        FROM (SELECT string_split(s, ' ') AS t, f FROM d$k))
         |  GROUP BY 1, 2),
         |w$k AS MATERIALIZED (
         |  SELECT a, b, a || b AS m, cnt
         |  FROM p$k ORDER BY cnt DESC, a, b LIMIT 1),
         |d${k + 1} AS MATERIALIZED (
         |  SELECT w, trim(regexp_replace(
         |           replace(' ' || replace(s, ' ', '  ') || ' ',
         |                   coalesce((SELECT ' ' || a || '  ' || b || ' '
         |                             FROM w$k), chr(1)),
         |                   coalesce((SELECT ' ' || m || ' ' FROM w$k),
         |                            chr(1))),
         |           ' +', ' ', 'g')) AS s, f
         |  FROM d$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH d1 AS MATERIALIZED (
       |  SELECT w, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || '</w>' AS s,
       |         CAST(count(*) AS BIGINT) AS f
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY 1),
       |$steps,
       |x AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |      FROM documents)
       |SELECT x.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |       CAST(sum(len(string_split(t.s, ' '))) AS BIGINT)
       |         AS n_tokens_bpe,
       |       round(CAST(sum(len(string_split(t.s, ' '))) AS DOUBLE)
       |             / count(*), 6) AS compression
       |FROM x JOIN d${iters + 1} t USING (w)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin
  }

  /** The co-purchase graph CTE prefix (undirected edge list + degrees),
    * shared by the `triangle_counts`, `graph_stats`, and `degree_dist`
    * oracles. */
  private val coocGraphSql: String =
      """lp AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |und AS MATERIALIZED (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
        |                     AND a.l_partkey < b.l_partkey),
        |deg AS MATERIALIZED (
        |  SELECT v, CAST(count(*) AS BIGINT) AS d
        |  FROM (SELECT src AS v FROM und
        |        UNION ALL SELECT dst FROM und) GROUP BY 1)""".stripMargin

  /** Per-vertex triangles + local clustering coefficient over the
    * co-purchase graph (no final ORDER BY — `triangle_counts` appends
    * one; `graph_stats` aggregates the whole table). Degree-ordered
    * orientation: wedge pairs id-sorted (e1.v < e2.v) so the closing
    * probe hits the canonical id-sorted undirected edge list — each
    * triangle counted exactly once from its unique orientation-DAG
    * source (the enumeration shape differs from the Spark side's
    * per-edge adjacency intersection, which is the point: two
    * independent algorithms must agree). Round 11 part 2: the wedge
    * closure is NOT materialized — `tri` is referenced once and
    * streams into a single-pass `GROUPING SETS ((u),(a),(b))`
    * aggregate (per-role counts in one scan, merged by COALESCE), so
    * the only live state is the two 120 M-edge build sides plus a
    * ≤3·|V| aggregate table; the old form held the full multi-billion
    * -row triangle list on disk and scanned it three times, which was
    * the sf10 wall (SCALING.md §4). Verified value-identical at
    * sf0.01/sf0.1 before the swap. */
  private val triangleCountsSql: String =
      s"""WITH $coocGraphSql,
        |ore AS MATERIALIZED (
        |  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.src < e.dst)
        |              THEN e.src ELSE e.dst END AS u,
        |         CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.src < e.dst)
        |              THEN e.dst ELSE e.src END AS v
        |  FROM und e JOIN deg du ON e.src = du.v
        |             JOIN deg dv ON e.dst = dv.v),
        |tri AS (
        |  SELECT e1.u AS u, e1.v AS a, e2.v AS b
        |  FROM ore e1 JOIN ore e2 ON e1.u = e2.u AND e1.v < e2.v
        |  JOIN und ON und.src = e1.v AND und.dst = e2.v),
        |tv AS (SELECT COALESCE(u, a, b) AS v, CAST(sum(c) AS BIGINT) AS t
        |       FROM (SELECT u, a, b, CAST(count(*) AS BIGINT) AS c
        |             FROM tri GROUP BY GROUPING SETS ((u), (a), (b)))
        |       GROUP BY 1)
        |SELECT deg.v AS product_id, deg.d AS degree,
        |       CAST(COALESCE(tv.t, 0) AS BIGINT) AS triangles,
        |       CASE WHEN deg.d >= 2
        |            THEN round((2.0 * COALESCE(tv.t, 0))
        |                       / (deg.d * (deg.d - 1.0)), 6)
        |            ELSE CAST(0.0 AS DOUBLE) END AS clust_coeff
        |FROM deg LEFT JOIN tv ON deg.v = tv.v""".stripMargin

  /** DuckDB oracle for `pagerank_fixed`: the reference's power step
    * (`tp1/knoledge_graphs/recommendation.py:150-179`) with a FIXED
    * iteration count as a RECURSIVE CTE (round 11; DuckDB permits
    * aggregation in the recursive term where standard SQL forbids it).
    * The rounds-≤10 form UNROLLED the 8 steps as chained MATERIALIZED
    * CTEs — at sf10 DuckDB holds every step's materialization and its
    * join temp alive for the whole statement and DNF'd at >80 GB of
    * spill; the recursive working table keeps exactly ONE rank vector
    * live per iteration. Verified value-identical to the unrolled text
    * at sf0.01 and sf0.1 before the swap (the round-10 discipline).
    * Arithmetic mirrors graft.algo.PageRank exactly: uniform pers 1/N,
    * row-normalized weights (exact-int division), sink mass
    * redistributed over all vertices, damping literals cast to DOUBLE
    * so DuckDB doesn't compute (1 - 0.85) in DECIMAL (which is exact
    * 0.15, NOT the double 0.15000000000000002 Spark uses). See
    * [[recursivePowerSteps]] for the single-reference plumbing. */
  private def pagerankFixedSql(iters: Int): String = {
    val steps =
      recursivePowerSteps(iters, "(CAST(1 AS DOUBLE) / nn.n)")
    s"""WITH RECURSIVE oi AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |cnt AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
       |               CAST(count(*) AS BIGINT) AS cnt
       |        FROM oi a JOIN oi b ON a.l_orderkey = b.l_orderkey
       |                           AND a.l_partkey <> b.l_partkey
       |        GROUP BY 1, 2),
       |e AS MATERIALIZED (
       |  SELECT src, dst, cnt / (sum(cnt) OVER (PARTITION BY src)) AS w
       |  FROM cnt),
       |v AS MATERIALIZED (SELECT p_partkey AS id FROM part),
       |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
       |r0 AS MATERIALIZED (SELECT v.id, CAST(1 AS DOUBLE) / nn.n AS rank
       |                    FROM v CROSS JOIN nn),
       |$steps
       |SELECT id AS product_id, round(rank, 6) AS rank
       |FROM r$iters ORDER BY product_id""".stripMargin
  }

  /** The recursive power chain shared by the fixed-rank oracles.
    * Expects CTEs `e(src,dst,w)`, `v` (with an `id` column; `v.pers`
    * when `teleport` references it), `nn(n)`, and `r0(id,rank)` in
    * scope; the enclosing WITH must say `WITH RECURSIVE`. Emits CTEs
    * `dang` (per-node sink flag), `rr` (the recursive (iter,id,rank)
    * vector), and `r$iters` (the step-`iters` vector, named so the
    * callers' downstream CTEs are untouched by the rewrite).
    *
    * Per step, EXACTLY the unrolled arithmetic: rank' =
    * (1−d)·teleport + d·(Σ_in w·rank + sinkmass/n). The plumbing works
    * around DuckDB's single-recursive-reference rule: the one `rr`
    * reference computes the sink mass as a windowed sum over the full
    * previous vector BEFORE the edge join filters it (sinks have no
    * out-edges, so the join would drop exactly the rows being summed),
    * and the per-dst aggregate carries that scalar (plus the step
    * counter) through MAX; the outer window MAX re-broadcasts both to
    * in-degree-0 nodes whose LEFT JOIN rows are NULL. The `p`-side
    * `iter < iters` guard makes the stopping pass join an EMPTY build
    * side instead of paying a 9th full edge probe. One divergence from
    * the unrolled text, documented here on purpose: on an EDGE-FREE
    * corpus the recursion stops at r0 and the oracle returns 0 rows
    * where the unrolled form still teleports — every oracle-checked sf
    * has edges, and the engine side of an edge-free graph is itself
    * pinned by PageRankSpec, not by this oracle. */
  private def recursivePowerSteps(iters: Int, teleport: String): String =
    s"""dang AS MATERIALIZED (
       |  SELECT v.id, CASE WHEN s.src IS NULL THEN 1 ELSE 0 END AS d
       |  FROM v LEFT JOIN (SELECT DISTINCT src FROM e) s ON v.id = s.src),
       |rr AS (
       |  SELECT 0 AS iter, id, rank FROM r0
       |  UNION ALL
       |  SELECT iter, id, rank FROM (
       |    SELECT MAX(c.iter) OVER () + 1 AS iter, v.id,
       |        (1 - CAST(0.85 AS DOUBLE)) * $teleport
       |      + CAST(0.85 AS DOUBLE) * (COALESCE(c.contrib, CAST(0 AS DOUBLE))
       |                                + MAX(c.s) OVER () / nn.n) AS rank
       |    FROM v CROSS JOIN nn
       |    LEFT JOIN (
       |      SELECT e.dst AS id, SUM(e.w * p.rank) AS contrib,
       |             MAX(p.s) AS s, MAX(p.iter) AS iter
       |      FROM (SELECT rr.iter, rr.id, rr.rank,
       |                   COALESCE(SUM(CASE WHEN d.d = 1 THEN rr.rank END)
       |                              OVER (), CAST(0 AS DOUBLE)) AS s
       |            FROM rr JOIN dang d ON rr.id = d.id
       |            WHERE rr.iter < $iters) p
       |      JOIN e ON e.src = p.id
       |      GROUP BY e.dst) c
       |    ON v.id = c.id
       |  ) q WHERE iter <= $iters),
       |r$iters AS MATERIALIZED (SELECT id, rank FROM rr WHERE iter = $iters)""".stripMargin

  /** DuckDB oracle for `ppr_fixed`: [[pagerankFixedSql]]'s recursive
    * power chain with the SEEDED personalization — pers = 1/|seeds| on
    * the min purchasing customer's products and 0 elsewhere (the
    * raw-1.0 vector renormalized by its total, mirroring
    * graft.algo.PageRank.run). The teleport term becomes (1−d)·v.pers;
    * rank init stays uniform 1/N and the sink redistribution stays
    * over ALL vertices, exactly as the Spark loop computes them. */
  private def pprFixedSql(iters: Int): String = {
    val steps = recursivePowerSteps(iters, "v.pers")
    s"""WITH RECURSIVE oi AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |cnt AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
       |               CAST(count(*) AS BIGINT) AS cnt
       |        FROM oi a JOIN oi b ON a.l_orderkey = b.l_orderkey
       |                           AND a.l_partkey <> b.l_partkey
       |        GROUP BY 1, 2),
       |e AS MATERIALIZED (
       |  SELECT src, dst, cnt / (sum(cnt) OVER (PARTITION BY src)) AS w
       |  FROM cnt),
       |bp AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey AS cid, l_partkey AS pid
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |seeds AS MATERIALIZED (
       |  SELECT DISTINCT pid AS sp FROM bp
       |  WHERE cid = (SELECT min(cid) FROM bp)),
       |sc AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS m FROM seeds),
       |v AS MATERIALIZED (
       |  SELECT p_partkey AS id,
       |         CASE WHEN sp IS NOT NULL THEN CAST(1 AS DOUBLE) / sc.m
       |              ELSE CAST(0 AS DOUBLE) END AS pers
       |  FROM part LEFT JOIN seeds ON p_partkey = sp CROSS JOIN sc),
       |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
       |r0 AS MATERIALIZED (SELECT v.id, CAST(1 AS DOUBLE) / nn.n AS rank
       |                    FROM v CROSS JOIN nn),
       |$steps
       |SELECT id AS product_id, round(rank, 6) AS rank
       |FROM r$iters ORDER BY product_id""".stripMargin
  }

  /** DuckDB oracle for `rec_blend_fixed`: the ENTIRE three-strategy
    * blend in one statement — the rec_blend oracle's cooc/jaccard
    * scores + the seeded fixed-iteration power chain (raw ranks) + the
    * Engine's normalization contract (PPR max over the FULL vector
    * seeds included; cooc/jaccard maxes over candidates) + the
    * 0.4/0.3/0.3 blend with per-strategy contributions. The fixed rank
    * vector covers every product, so candidates = all non-seed
    * products. */
  private def recBlendFixedSql(iters: Int): String = {
    val steps = recursivePowerSteps(iters, "v.pers")
    s"""WITH RECURSIVE b AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey AS cid, l_partkey AS pid
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |seeds AS MATERIALIZED (
       |  SELECT DISTINCT pid AS sp FROM b
       |  WHERE cid = (SELECT min(cid) FROM b)),
       |oi AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |cooc AS MATERIALIZED (
       |  SELECT a.l_partkey AS src, b2.l_partkey AS dst,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM oi a JOIN oi b2 ON a.l_orderkey = b2.l_orderkey
       |                      AND a.l_partkey <> b2.l_partkey
       |  GROUP BY 1, 2),
       |cscore AS (SELECT dst AS pid, CAST(sum(cnt) AS BIGINT) AS s_cooc
       |           FROM cooc JOIN seeds ON src = sp GROUP BY 1),
       |sizes AS MATERIALIZED (
       |          SELECT pid, CAST(count(*) AS BIGINT) AS sz
       |          FROM b GROUP BY 1),
       |-- seed-anchored jaccard (round 11): only (seed, other) basket
       |-- pairs are enumerated — the full basket-pair frame was the
       |-- sf10 >70 GB spill; verified value-identical to the full form
       |-- at sf0.01/sf0.1 before the swap
       |commons AS (SELECT x.pid AS sp, y.pid AS pid,
       |                   CAST(count(*) AS BIGINT) AS common
       |            FROM b x JOIN seeds s ON x.pid = s.sp
       |                     JOIN b y ON x.cid = y.cid AND y.pid <> x.pid
       |            GROUP BY 1, 2),
       |jscore AS (SELECT c.pid,
       |                  sum(c.common / (s1.sz + s2.sz - c.common)) AS s_jacc
       |           FROM commons c JOIN sizes s1 ON c.sp = s1.pid
       |                          JOIN sizes s2 ON c.pid = s2.pid
       |           GROUP BY 1),
       |e AS MATERIALIZED (
       |  SELECT src, dst, cnt / (sum(cnt) OVER (PARTITION BY src)) AS w
       |  FROM cooc),
       |sc AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS m FROM seeds),
       |v AS MATERIALIZED (
       |  SELECT p_partkey AS id,
       |         CASE WHEN sp IS NOT NULL THEN CAST(1 AS DOUBLE) / sc.m
       |              ELSE CAST(0 AS DOUBLE) END AS pers
       |  FROM part LEFT JOIN seeds ON p_partkey = sp CROSS JOIN sc),
       |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
       |r0 AS MATERIALIZED (SELECT v.id, CAST(1 AS DOUBLE) / nn.n AS rank
       |                    FROM v CROSS JOIN nn),
       |$steps,
       |pm AS MATERIALIZED (SELECT max(rank) AS ppr_max FROM r$iters),
       |cand AS (SELECT r.id AS pid,
       |                COALESCE(c.s_cooc, 0) AS s_cooc,
       |                COALESCE(j.s_jacc, CAST(0.0 AS DOUBLE)) AS s_jacc,
       |                r.rank AS s_ppr
       |         FROM r$iters r LEFT JOIN cscore c ON r.id = c.pid
       |                        LEFT JOIN jscore j ON r.id = j.pid
       |         WHERE r.id NOT IN (SELECT sp FROM seeds)),
       |norm AS (SELECT pid,
       |    CASE WHEN max(s_cooc) OVER () > 0
       |         THEN s_cooc / (max(s_cooc) OVER ())
       |         ELSE CAST(0.0 AS DOUBLE) END AS nc,
       |    CASE WHEN max(s_jacc) OVER () > 0
       |         THEN s_jacc / (max(s_jacc) OVER ())
       |         ELSE CAST(0.0 AS DOUBLE) END AS nj,
       |    CASE WHEN pm.ppr_max > 0 THEN s_ppr / pm.ppr_max
       |         ELSE CAST(0.0 AS DOUBLE) END AS np
       |  FROM cand CROSS JOIN pm)
       |SELECT pid AS product_id,
       |       round(CAST(0.4 AS DOUBLE)*nc + CAST(0.3 AS DOUBLE)*nj
       |             + CAST(0.3 AS DOUBLE)*np, 6) AS score,
       |       round(CAST(0.4 AS DOUBLE)*nc, 6) AS c_cooc,
       |       round(CAST(0.3 AS DOUBLE)*nj, 6) AS c_sim,
       |       round(CAST(0.3 AS DOUBLE)*np, 6) AS c_ppr
       |FROM norm
       |WHERE CAST(0.4 AS DOUBLE)*nc + CAST(0.3 AS DOUBLE)*nj
       |      + CAST(0.3 AS DOUBLE)*np > 0
       |ORDER BY score DESC, product_id ASC LIMIT 10""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "pagerank_fixed" -> pagerankFixedSql(8),
    "ppr_fixed" -> pprFixedSql(8),
    "rec_blend_fixed" -> recBlendFixedSql(8),
    "scan_project" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type IN ('view','click','purchase')
        |ORDER BY event_id""".stripMargin,

    "cooc_topk" ->
      """WITH oi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |cnt AS (SELECT b.l_partkey AS product_id,
        |               CAST(count(*) AS BIGINT) AS co_count
        |        FROM oi a JOIN oi b ON a.l_orderkey = b.l_orderkey
        |                           AND a.l_partkey <> b.l_partkey
        |        GROUP BY 1)
        |SELECT product_id, p_name AS name, p_retailprice AS price, co_count
        |FROM cnt JOIN part ON product_id = p_partkey
        |ORDER BY co_count DESC, product_id ASC LIMIT 10""".stripMargin,

    "cooc_pairs" ->
      """WITH oi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |       CAST(count(*) AS BIGINT) AS cnt
        |FROM oi a JOIN oi b ON a.l_orderkey = b.l_orderkey
        |                   AND a.l_partkey <> b.l_partkey
        |GROUP BY 1, 2 ORDER BY src, dst""".stripMargin,

    "popularity_topk" ->
      """SELECT l_partkey AS product_id,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS popularity
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY popularity DESC, product_id ASC LIMIT 100""".stripMargin,

    "orderfreq_topk" ->
      """SELECT l_partkey AS product_id,
        |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS order_count
        |FROM lineitem
        |GROUP BY 1 ORDER BY order_count DESC, product_id ASC LIMIT 100""".stripMargin,

    "event_weights" ->
      """SELECT * FROM (
        |  SELECT user_id,
        |         sum(CASE event_type WHEN 'view' THEN CAST(0.5 AS DOUBLE)
        |                             WHEN 'click' THEN CAST(1.0 AS DOUBLE)
        |                             WHEN 'purchase' THEN CAST(2.0 AS DOUBLE)
        |                             ELSE CAST(0.0 AS DOUBLE) END) AS weight
        |  FROM events GROUP BY user_id)
        |WHERE weight > 0 ORDER BY user_id""".stripMargin,

    "edges_build" ->
      """WITH placed AS (
        |  SELECT 'PLACED' AS rel_type, 'C' || o_custkey AS src,
        |         'O' || o_orderkey AS dst, CAST(1.0 AS DOUBLE) AS weight
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |contains_e AS (
        |  SELECT 'CONTAINS' AS rel_type, 'O' || l_orderkey AS src,
        |         'P' || l_partkey AS dst,
        |         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |           / 100.0 AS weight
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |                JOIN part ON l_partkey = p_partkey
        |  GROUP BY l_orderkey, l_partkey),
        |incat AS (
        |  SELECT 'IN_CATEGORY' AS rel_type, 'P' || p_partkey AS src,
        |         p_brand AS dst, CAST(1.0 AS DOUBLE) AS weight
        |  FROM part)
        |SELECT * FROM (SELECT * FROM placed UNION ALL
        |               SELECT * FROM contains_e UNION ALL
        |               SELECT * FROM incat)
        |ORDER BY rel_type, src, dst""".stripMargin,

    "event_edges" ->
      """SELECT event_id, 'C' || user_id AS src,
        |       CASE event_type WHEN 'view' THEN 'VIEWED'
        |                       WHEN 'click' THEN 'CLICKED'
        |                       WHEN 'purchase' THEN 'PURCHASED'
        |                       ELSE 'VIEWED' END AS rel_type,
        |       date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts, value
        |FROM events ORDER BY event_id""".stripMargin,

    "bipartite_edges" ->
      """SELECT DISTINCT o_custkey AS customer_id, l_partkey AS product_id
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY customer_id, product_id""".stripMargin,

    "adjacency_norm" ->
      """WITH oi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |cnt AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |               CAST(count(*) AS BIGINT) AS cnt
        |        FROM oi a JOIN oi b ON a.l_orderkey = b.l_orderkey
        |                           AND a.l_partkey <> b.l_partkey
        |        GROUP BY 1, 2)
        |SELECT src, dst,
        |       round(cnt / (sum(cnt) OVER (PARTITION BY src)), 6) AS weight
        |FROM cnt ORDER BY src, dst""".stripMargin,

    "collab_topk" ->
      """WITH b AS (SELECT DISTINCT o_custkey AS cid, l_partkey AS pid
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |seed AS (SELECT min(cid) AS seed_cid FROM b),
        |p1s AS (SELECT DISTINCT pid AS p1 FROM b, seed WHERE cid = seed_cid),
        |c2s AS (SELECT DISTINCT b.cid AS c2, p1s.p1
        |        FROM b JOIN p1s ON b.pid = p1s.p1, seed
        |        WHERE b.cid <> seed_cid),
        |paths AS (SELECT c2s.c2, b.pid AS p2
        |          FROM c2s JOIN b ON b.cid = c2s.c2
        |          WHERE b.pid <> c2s.p1)
        |SELECT p2 AS product_id, CAST(count(DISTINCT c2) AS BIGINT) AS score
        |FROM paths GROUP BY 1
        |ORDER BY score DESC, product_id ASC LIMIT 10""".stripMargin,

    // BASKET-LISTED since round 11: the b×b self-join on cid hashed two
    // ~50 GB sides at sf10 only to enumerate within-customer pairs.
    // Collapsing each customer to one sorted product list and unnesting
    // its i<j index pairs produces the identical pair multiset with no
    // join at all (ps is sorted, so ps[i]<ps[j] ⟺ the old x.pid<y.pid)
    // — the engine's own basket-pairing shape (Recommend.jaccardPairs).
    // Verified value-identical to the self-join form at sf0.01/sf0.1
    // before the swap.
    "jaccard_sim" ->
      """WITH b AS MATERIALIZED (
        |           SELECT DISTINCT o_custkey AS cid, l_partkey AS pid
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |sizes AS MATERIALIZED (
        |          SELECT pid, CAST(count(*) AS BIGINT) AS sz
        |          FROM b GROUP BY 1),
        |bk AS MATERIALIZED (
        |          SELECT cid, list_sort(list(pid)) AS ps
        |          FROM b GROUP BY cid),
        |common AS (SELECT p1, p2, CAST(count(*) AS BIGINT) AS common
        |           FROM (SELECT ps[i.i] AS p1, ps[j.j] AS p2
        |                 FROM bk,
        |                   LATERAL (SELECT unnest(range(1, len(ps) + 1))
        |                            AS i) i,
        |                   LATERAL (SELECT unnest(range(1, len(ps) + 1))
        |                            AS j) j
        |                 WHERE i.i < j.j)
        |           GROUP BY 1, 2)
        |SELECT p1, p2,
        |       round(common / (s1.sz + s2.sz - common), 6) AS jaccard
        |FROM common JOIN sizes s1 ON p1 = s1.pid
        |            JOIN sizes s2 ON p2 = s2.pid
        |ORDER BY jaccard DESC, p1 ASC, p2 ASC LIMIT 100""".stripMargin,

    // the 16 (a,b) literals and the 2-row banding must track
    // Dedup.PermA/PermB/MinhashK (same family as dedup_minhash above);
    // the element hash is h32 of the DECIMAL customer id (both engines
    // render a BIGINT as plain digits). Every step AS MATERIALIZED:
    // DuckDB re-inlines chained CTEs otherwise.
    "jaccard_lsh" ->
      """WITH b AS MATERIALIZED (
        |         SELECT DISTINCT o_custkey AS cid, l_partkey AS pid
        |         FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |h AS MATERIALIZED (SELECT pid,
        |       CAST(('0x' || substr(md5(CAST(cid AS VARCHAR)), 1, 8))
        |            AS BIGINT) AS h
        |     FROM b),
        |mh AS MATERIALIZED (
        |     SELECT pid, i, min((a * h + p.b) % 1000000007) AS v
        |     FROM h, (VALUES (0, 654435747, 40503),
        |       (1, 953445008, 640493002), (2, 666121539, 887878419),
        |       (3, 916718432, 739353030), (4, 635055555, 15564468),
        |       (5, 613703214, 407642994), (6, 478985632, 764070412),
        |       (7, 685929885, 143680607), (8, 537319864, 495584588),
        |       (9, 113289140, 662427260), (10, 443904346, 291123970),
        |       (11, 237508372, 394074373), (12, 760536115, 194217892),
        |       (13, 56448786, 407224614), (14, 174558421, 818425391),
        |       (15, 842614604, 683379637)) AS p(i, a, b)
        |     GROUP BY 1, 2),
        |bands AS MATERIALIZED (
        |     SELECT pid, i // 2 AS band,
        |            max(CASE WHEN i % 2 = 0 THEN v END) AS v1,
        |            max(CASE WHEN i % 2 = 1 THEN v END) AS v2
        |     FROM mh GROUP BY 1, 2),
        |cand AS MATERIALIZED (
        |     SELECT DISTINCT a.pid AS p1, b.pid AS p2
        |     FROM bands a JOIN bands b ON a.band = b.band
        |       AND a.v1 = b.v1 AND a.v2 = b.v2 AND a.pid < b.pid),
        |sizes AS MATERIALIZED (
        |     SELECT pid, CAST(count(*) AS BIGINT) AS sz FROM b GROUP BY 1),
        |common AS MATERIALIZED (
        |     SELECT c.p1, c.p2, CAST(count(*) AS BIGINT) AS common
        |     FROM cand c JOIN b x ON x.pid = c.p1
        |                 JOIN b y ON y.pid = c.p2 AND y.cid = x.cid
        |     GROUP BY 1, 2)
        |SELECT p1, p2,
        |       round(common / (s1.sz + s2.sz - common), 6) AS jaccard
        |FROM common JOIN sizes s1 ON p1 = s1.pid
        |            JOIN sizes s2 ON p2 = s2.pid
        |ORDER BY jaccard DESC, p1 ASC, p2 ASC LIMIT 100""".stripMargin,

    // SEED-ANCHORED since round 11 (the event_asof oracle-rewrite
    // precedent): the old form re-derived the FULL cooc chain (240 M
    // pairs at sf10) and the FULL basket-pair frame (>70 GB spill) only
    // to keep the rows touching the seed set. Both scores now filter to
    // the seeds BEFORE expanding: cscore counts (seed-lineitem, order,
    // other-lineitem) triples directly; jscore enumerates only
    // (seed, other) basket pairs. Same multisets of counted rows and
    // summed jaccard terms as the full form — verified value-identical
    // to the old SQL at sf0.01 AND sf0.1 before the swap (the round-10
    // discipline).
    "rec_blend" ->
      """WITH b AS MATERIALIZED (
        |           SELECT DISTINCT o_custkey AS cid, l_partkey AS pid
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |seed AS (SELECT min(cid) AS seed_cid FROM b),
        |seeds AS MATERIALIZED (
        |           SELECT DISTINCT pid AS sp FROM b, seed
        |           WHERE cid = seed_cid),
        |oi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |cscore AS (SELECT b2.l_partkey AS pid,
        |                  CAST(count(*) AS BIGINT) AS s_cooc
        |           FROM oi a JOIN seeds ON a.l_partkey = sp
        |                     JOIN oi b2 ON a.l_orderkey = b2.l_orderkey
        |                              AND b2.l_partkey <> a.l_partkey
        |           GROUP BY 1),
        |sizes AS MATERIALIZED (
        |           SELECT pid, CAST(count(*) AS BIGINT) AS sz
        |           FROM b GROUP BY 1),
        |commons AS (SELECT x.pid AS sp, y.pid AS pid,
        |                   CAST(count(*) AS BIGINT) AS common
        |            FROM b x JOIN seeds s ON x.pid = s.sp
        |                     JOIN b y ON x.cid = y.cid AND y.pid <> x.pid
        |            GROUP BY 1, 2),
        |jscore AS (SELECT c.pid,
        |                  sum(c.common / (s1.sz + s2.sz - c.common)) AS s_jacc
        |           FROM commons c JOIN sizes s1 ON c.sp = s1.pid
        |                          JOIN sizes s2 ON c.pid = s2.pid
        |           GROUP BY 1),
        |cand AS (SELECT COALESCE(c.pid, js.pid) AS pid,
        |                COALESCE(s_cooc, 0) AS s_cooc,
        |                COALESCE(s_jacc, CAST(0.0 AS DOUBLE)) AS s_jacc
        |         FROM cscore c FULL OUTER JOIN jscore js ON c.pid = js.pid),
        |cand2 AS (SELECT * FROM cand
        |          WHERE pid NOT IN (SELECT sp FROM seeds)),
        |norm AS (SELECT pid,
        |    CASE WHEN max(s_cooc) OVER () > 0
        |         THEN s_cooc / (max(s_cooc) OVER ())
        |         ELSE CAST(0.0 AS DOUBLE) END AS nc,
        |    CASE WHEN max(s_jacc) OVER () > 0
        |         THEN s_jacc / (max(s_jacc) OVER ())
        |         ELSE CAST(0.0 AS DOUBLE) END AS nj
        |  FROM cand2)
        |SELECT pid AS product_id,
        |       round(CAST(0.4 AS DOUBLE)*nc + CAST(0.3 AS DOUBLE)*nj, 6) AS score,
        |       round(CAST(0.4 AS DOUBLE)*nc, 6) AS c_cooc,
        |       round(CAST(0.3 AS DOUBLE)*nj, 6) AS c_sim
        |FROM norm
        |WHERE CAST(0.4 AS DOUBLE)*nc + CAST(0.3 AS DOUBLE)*nj > 0
        |ORDER BY score DESC, product_id ASC LIMIT 10""".stripMargin,

    "json_props" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "event_hourly" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS users,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
        |         AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |           FROM events),
        |f AS (SELECT user_id, ts_us,
        |        CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
        |             WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
        |             ELSE 0 END AS new_sess
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        |s AS (SELECT user_id, ts_us,
        |        CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |      FROM f)
        |SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
        |       min(ts_us) AS start_us, max(ts_us) - min(ts_us) AS duration_us
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,

    "event_funnel" ->
      """SELECT * FROM (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view'
        |             THEN epoch_us(CAST(ts AS TIMESTAMP)) END)
        |      AS first_view_us,
        |    min(CASE WHEN event_type = 'click'
        |             THEN epoch_us(CAST(ts AS TIMESTAMP)) END)
        |      AS first_click_us,
        |    min(CASE WHEN event_type = 'purchase'
        |             THEN epoch_us(CAST(ts AS TIMESTAMP)) END)
        |      AS first_purchase_us
        |  FROM events GROUP BY user_id)
        |WHERE first_view_us < first_click_us
        |  AND first_click_us < first_purchase_us
        |ORDER BY user_id""".stripMargin,

    "event_retention" ->
      """WITH acts AS (SELECT DISTINCT user_id,
        |                date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
        |              FROM events),
        |firsts AS (SELECT user_id, min(day) AS cohort_day
        |           FROM acts GROUP BY 1)
        |SELECT cohort_day,
        |       CAST(date_diff('day', cohort_day, day) AS BIGINT)
        |         AS day_offset,
        |       CAST(count(DISTINCT a.user_id) AS BIGINT) AS users
        |FROM acts a JOIN firsts f ON a.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // last-touch attribution as-of join (EventsOps.eventAsof); the
    // oracle uses DuckDB's NATIVE ASOF JOIN — a third formulation,
    // independent of both the Spark union+window form and the naive
    // per-purchase rank over the inequality join (round ≤9 oracle; its
    // per-user cross product spilled 27 GB and DNF'd at sf10, while the
    // native as-of checks the same semantics there in seconds). ASOF
    // picks the greatest t.us ≤ p.us; equal-us ties are pre-reduced to
    // one row via max(event_id)/arg_max so the match is deterministic —
    // the same "highest event_id wins at equal time" rule the Spark
    // window's (us, kind, event_id) sort encodes. Verified identical to
    // the rank-form oracle at sf0.01 and sf0.1 before the swap.
    "event_asof" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |p AS (SELECT event_id, user_id, us FROM e
        |      WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, us, max(event_id) AS touch_event_id,
        |             arg_max(event_type, event_id) AS touch_type
        |      FROM e WHERE event_type IN ('view', 'click')
        |      GROUP BY user_id, us)
        |SELECT p.event_id, p.user_id, p.us AS purchase_us,
        |       t.touch_event_id, t.touch_type, t.us AS touch_us,
        |       p.us - t.us AS gap_us
        |FROM p ASOF LEFT JOIN t
        |  ON p.user_id = t.user_id AND t.us <= p.us
        |ORDER BY p.event_id""".stripMargin,

    // attribution-window range join (EventsOps.eventWindowJoin); the
    // oracle runs the plain inequality join the bucketed equi-join must
    // reproduce
    "event_window_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |p AS (SELECT event_id, user_id, us FROM e
        |      WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_type, us FROM e
        |      WHERE event_type IN ('view', 'click')),
        |h AS (SELECT p.event_id,
        |             CAST(count(*) AS BIGINT) AS n_touch,
        |             CAST(sum(CASE WHEN t.event_type = 'view'
        |                           THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |             CAST(sum(CASE WHEN t.event_type = 'click'
        |                           THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |             min(p.us - t.us) AS min_gap_us
        |      FROM p JOIN t ON t.user_id = p.user_id
        |                   AND t.us <= p.us AND t.us >= p.us - 3600000000
        |      GROUP BY 1)
        |SELECT p.event_id, p.user_id, p.us AS purchase_us,
        |       CAST(COALESCE(h.n_touch, 0) AS BIGINT) AS n_touch,
        |       CAST(COALESCE(h.n_view, 0) AS BIGINT) AS n_view,
        |       CAST(COALESCE(h.n_click, 0) AS BIGINT) AS n_click,
        |       h.min_gap_us
        |FROM p LEFT JOIN h ON p.event_id = h.event_id
        |ORDER BY p.event_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |         AS n_uniq,
        |       round((length(text) - len(string_split(text, ' ')) + 1)
        |             / CAST(len(string_split(text, ' ')) AS DOUBLE), 6)
        |         AS avg_token_len,
        |       CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |q AS (SELECT doc_id,
        |        CAST(len(toks) AS BIGINT) AS n_tokens,
        |        CAST(len(list_filter(toks,
        |          x -> x IN ('the', 'a', 'of', 'and', 'in'))) AS BIGINT)
        |          AS stop_cnt,
        |        CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq
        |      FROM t)
        |SELECT doc_id, n_tokens, stop_cnt,
        |       round(stop_cnt / CAST(n_tokens AS DOUBLE), 6) AS stop_ratio,
        |       round(n_uniq / CAST(n_tokens AS DOUBLE), 6) AS ttr,
        |       (n_tokens >= 20 AND n_tokens <= 1000 AND stop_cnt > 0) AS keep
        |FROM q ORDER BY doc_id""".stripMargin,

    "lang_id" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
        |           FROM documents),
        |v AS (SELECT doc_id, lang,
        |        CAST(len(list_filter(toks,
        |          x -> x IN ('the', 'a', 'of', 'and', 'in'))) AS BIGINT)
        |          AS en_votes,
        |        CAST(len(list_filter(toks,
        |          x -> x IN ('le', 'la', 'de', 'et', 'un'))) AS BIGINT)
        |          AS fr_votes,
        |        CAST(len(list_filter(toks,
        |          x -> x IN ('der', 'die', 'das', 'und', 'ein'))) AS BIGINT)
        |          AS de_votes,
        |        CAST(len(list_filter(toks,
        |          x -> x IN ('el', 'los', 'de', 'y', 'un'))) AS BIGINT)
        |          AS es_votes
        |      FROM t)
        |SELECT doc_id, lang AS label, en_votes, fr_votes, de_votes, es_votes,
        |       CASE WHEN en_votes >= fr_votes AND en_votes >= de_votes
        |                 AND en_votes >= es_votes THEN 'en'
        |            WHEN fr_votes >= de_votes AND fr_votes >= es_votes
        |              THEN 'fr'
        |            WHEN de_votes >= es_votes THEN 'de'
        |            ELSE 'es' END AS pred_lang
        |FROM v ORDER BY doc_id""".stripMargin,

    "lang_id_ngram" ->
      """WITH s AS (SELECT doc_id, lang,
        |    ((length(text) - length(replace(text, ' th', ''))) // 3
        |     + (length(text) - length(replace(text, 'the', ''))) // 3
        |     + (length(text) - length(replace(text, 'ing', ''))) // 3
        |     + (length(text) - length(replace(text, ' an', ''))) // 3
        |     + (length(text) - length(replace(text, 'ion', ''))) // 3)
        |      AS en_score,
        |    ((length(text) - length(replace(text, ' le', ''))) // 3
        |     + (length(text) - length(replace(text, 'les', ''))) // 3
        |     + (length(text) - length(replace(text, ' de', ''))) // 3
        |     + (length(text) - length(replace(text, 'ent', ''))) // 3
        |     + (length(text) - length(replace(text, 'que', ''))) // 3)
        |      AS fr_score,
        |    ((length(text) - length(replace(text, 'der', ''))) // 3
        |     + (length(text) - length(replace(text, 'die', ''))) // 3
        |     + (length(text) - length(replace(text, 'sch', ''))) // 3
        |     + (length(text) - length(replace(text, 'ein', ''))) // 3
        |     + (length(text) - length(replace(text, 'und', ''))) // 3)
        |      AS de_score,
        |    ((length(text) - length(replace(text, ' el', ''))) // 3
        |     + (length(text) - length(replace(text, 'los', ''))) // 3
        |     + (length(text) - length(replace(text, 'las', ''))) // 3
        |     + (length(text) - length(replace(text, 'ado', ''))) // 3
        |     + (length(text) - length(replace(text, ' de', ''))) // 3)
        |      AS es_score
        |  FROM documents)
        |SELECT doc_id, lang AS label,
        |       CAST(en_score AS BIGINT) AS en_score,
        |       CAST(fr_score AS BIGINT) AS fr_score,
        |       CAST(de_score AS BIGINT) AS de_score,
        |       CAST(es_score AS BIGINT) AS es_score,
        |       CASE WHEN en_score >= fr_score AND en_score >= de_score
        |                 AND en_score >= es_score THEN 'en'
        |            WHEN fr_score >= de_score AND fr_score >= es_score
        |              THEN 'fr'
        |            WHEN de_score >= es_score THEN 'de'
        |            ELSE 'es' END AS pred_lang
        |FROM s ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text,
        |         '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+')) AS BIGINT)
        |         AS n_tokens_re,
        |       CAST(list_reduce(
        |         list_prepend(0, list_transform(string_split(text, ' '),
        |           t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT))),
        |         (a, b) -> (a * 31 + b) % 1000000007) AS BIGINT)
        |         AS rolling_fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
        |       CAST(count(*) AS BIGINT) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin,

    "dedup_minhash" -> dedupMinhashSql,

    // transitive closure of the minhash candidate pairs via DuckDB's
    // recursive CTE — the oracle for the distributed connected
    // components in Dedup.dupClusters (cluster id = min reachable id)
    "dedup_clusters" ->
      s"""WITH RECURSIVE pairs AS (SELECT p1, p2 FROM ($dedupMinhashSql) q),
        |e AS (SELECT p1 AS a, p2 AS b FROM pairs
        |      UNION SELECT p2, p1 FROM pairs),
        |reach(a, b) AS (SELECT a, b FROM e
        |                UNION SELECT r.a, e2.b
        |                      FROM reach r JOIN e e2 ON r.b = e2.a)
        |SELECT a AS doc_id, least(a, min(b)) AS cluster_id,
        |       a = least(a, min(b)) AS is_survivor
        |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin,

    "dedup_survivors" ->
      s"""WITH RECURSIVE pairs AS (SELECT p1, p2 FROM ($dedupMinhashSql) q),
        |e AS (SELECT p1 AS a, p2 AS b FROM pairs
        |      UNION SELECT p2, p1 FROM pairs),
        |reach(a, b) AS (SELECT a, b FROM e
        |                UNION SELECT r.a, e2.b
        |                      FROM reach r JOIN e e2 ON r.b = e2.a),
        |lbl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        |        FROM reach GROUP BY a)
        |SELECT d.doc_id, d.lang, d.source FROM documents d
        |WHERE d.doc_id NOT IN
        |      (SELECT doc_id FROM lbl WHERE doc_id <> cluster_id)
        |ORDER BY d.doc_id""".stripMargin,

    // NB: substr(md5,1,15) = 15 hex chars = 60 bits, and range(60), must
    // track Dedup.SimhashBits (here and in dedup_simhash_pairs below)
    "dedup_simhash" ->
      """WITH tok AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS freq,
        |               CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
        |             FROM (SELECT doc_id,
        |                          unnest(string_split(text, ' ')) AS tok
        |                   FROM documents)
        |             GROUP BY doc_id, tok),
        |bits AS (SELECT doc_id, j,
        |           CASE WHEN sum(freq * (((h >> CAST(j AS INTEGER)) & 1) * 2
        |                                 - 1)) > 0
        |                THEN CAST(1 AS BIGINT) << CAST(j AS INTEGER)
        |                ELSE 0 END AS bitval
        |         FROM tok, (SELECT unnest(range(60)) AS j)
        |         GROUP BY doc_id, j)
        |SELECT doc_id, CAST(sum(bitval) AS BIGINT) AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_simhash_pairs" ->
      s"""WITH tok AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS freq,
        |               CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
        |             FROM (SELECT doc_id,
        |                          unnest(string_split(text, ' ')) AS tok
        |                   FROM documents)
        |             GROUP BY doc_id, tok),
        |bits AS (SELECT doc_id, j,
        |           CASE WHEN sum(freq * (((h >> CAST(j AS INTEGER)) & 1) * 2
        |                                 - 1)) > 0
        |                THEN CAST(1 AS BIGINT) << CAST(j AS INTEGER)
        |                ELSE 0 END AS bitval
        |         FROM tok, (SELECT unnest(range(60)) AS j)
        |         GROUP BY doc_id, j),
        |sig AS MATERIALIZED (
        |        SELECT doc_id, CAST(sum(bitval) AS BIGINT) AS simhash
        |        FROM bits GROUP BY doc_id),
        |-- BANDED since round 11: the all-pairs doc_id<doc_id join is
        |-- n²/2 (>87 GB spill at sf10) where the engine's own 4×15-bit
        |-- pigeonhole banding is candidate-bounded AND exact for
        |-- hamming ≤ 3 (3 differing bits touch ≤ 3 of 4 disjoint
        |-- bands). The hot-band guard mirrors the engine's literally —
        |-- the engine DROPS pairs whose only shared bands are hot, so
        |-- the oracle must too. Verified value-identical to the
        |-- all-pairs form at sf0.01/sf0.1 before the swap.
        |bands AS MATERIALIZED (
        |        SELECT doc_id, simhash, o.b AS band,
        |               (simhash >> o.off) & 32767 AS bv
        |        FROM sig, (VALUES (0, 0), (1, 15), (2, 30), (3, 45))
        |             AS o(b, off)),
        |hot AS MATERIALIZED (
        |        SELECT band, bv FROM bands GROUP BY band, bv
        |        HAVING count(*) > ${Dedup.SimhashMaxBand}),
        |kept AS MATERIALIZED (
        |        SELECT x.* FROM bands x LEFT JOIN hot h
        |          ON x.band = h.band AND x.bv = h.bv
        |        WHERE h.band IS NULL),
        |cand AS (SELECT DISTINCT a.doc_id AS p1, b.doc_id AS p2,
        |                a.simhash AS s1, b.simhash AS s2
        |         FROM kept a JOIN kept b
        |           ON a.band = b.band AND a.bv = b.bv
        |          AND a.doc_id < b.doc_id)
        |SELECT p1, p2,
        |       CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
        |FROM cand
        |WHERE bit_count(xor(s1, s2)) <= 3
        |ORDER BY hamming, p1, p2""".stripMargin,

    // the corpus-relative stop-shingle guard is mirrored (keep CTE,
    // same GREATEST(floor, ⌈n/10⁴⌉) integer ceil as winnow_pairs); the
    // floor and denominator interpolate from Dedup.DfFloor/RelDfDenom so
    // engine and oracle cannot drift; sizes stay unguarded-exact — the
    // lower-bound contract
    "ngram_jaccard" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents),
        |sh AS (SELECT DISTINCT doc_id, sh FROM (
        |         SELECT doc_id, unnest(list_transform(range(len(t) - 2),
        |           i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS sh
        |         FROM toks)),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
        |          FROM sh GROUP BY 1),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM sizes),
        |keep AS (SELECT sh FROM sh GROUP BY sh
        |         HAVING count(*) <= GREATEST(${Dedup.DfFloor},
        |           (SELECT (n_docs + ${Dedup.RelDfDenom - 1})
        |                    // ${Dedup.RelDfDenom} FROM nd))),
        |i AS (SELECT s.doc_id, s.sh FROM sh s JOIN keep USING (sh)),
        |common AS (SELECT x.doc_id AS p1, y.doc_id AS p2,
        |                  CAST(count(*) AS BIGINT) AS common
        |           FROM i x JOIN i y
        |             ON x.sh = y.sh AND x.doc_id < y.doc_id
        |           GROUP BY 1, 2)
        |SELECT p1, p2,
        |       round(common / (s1.sz + s2.sz - common), 6) AS jaccard
        |FROM common JOIN sizes s1 ON p1 = s1.doc_id
        |            JOIN sizes s2 ON p2 = s2.doc_id
        |ORDER BY jaccard DESC, p1 ASC, p2 ASC LIMIT 200""".stripMargin,

    "sim_topk" ->
      """WITH e AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |p AS (SELECT vec_id AS pid, v AS pv FROM e
        |      WHERE vec_id = (SELECT min(vec_id) FROM embeddings))
        |SELECT e.vec_id,
        |       round(list_sum(list_transform(list_zip(e.v, p.pv),
        |                                     s -> s[1] * s[2]))
        |             / (sqrt(list_sum(list_transform(e.v, x -> x*x)))
        |                * sqrt(list_sum(list_transform(p.pv, x -> x*x)))), 6)
        |         AS cosine
        |FROM e, p WHERE e.vec_id <> p.pid
        |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin,

    "knn_bucketed" ->
      """WITH e AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |eb AS (SELECT vec_id, v,
        |         (SELECT CAST(sum(CASE WHEN v[CAST(i AS INTEGER) + 1] > 0
        |                     THEN CAST(1 AS BIGINT) << CAST(i AS INTEGER)
        |                     ELSE 0 END) AS BIGINT)
        |          FROM (SELECT unnest(range(8)) AS i)) AS bucket
        |       FROM e),
        |probes AS (SELECT vec_id AS pid, v AS pv, bucket AS pbucket
        |           FROM eb ORDER BY vec_id LIMIT 5),
        |scored AS (SELECT p.pid, e2.vec_id,
        |             round(list_sum(list_transform(list_zip(e2.v, p.pv),
        |                                           s -> s[1] * s[2]))
        |               / (sqrt(list_sum(list_transform(e2.v, x -> x*x)))
        |                  * sqrt(list_sum(list_transform(p.pv, x -> x*x)))),
        |               6) AS cosine
        |           FROM eb e2 JOIN probes p
        |             ON e2.bucket = p.pbucket AND e2.vec_id <> p.pid),
        |ranked AS (SELECT pid, vec_id, cosine,
        |             CAST(row_number() OVER (PARTITION BY pid
        |               ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rank
        |           FROM scored)
        |SELECT pid, rank, vec_id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY pid, rank""".stripMargin,

    "knn_multiprobe" ->
      """WITH e AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |eb AS (SELECT vec_id, v,
        |         (SELECT CAST(sum(CASE WHEN v[CAST(i AS INTEGER) + 1] > 0
        |                     THEN CAST(1 AS BIGINT) << CAST(i AS INTEGER)
        |                     ELSE 0 END) AS BIGINT)
        |          FROM (SELECT unnest(range(8)) AS i)) AS bucket
        |       FROM e),
        |probes AS (SELECT vec_id AS pid, v AS pv, bucket AS pbucket
        |           FROM eb ORDER BY vec_id LIMIT 5),
        |cand AS (SELECT pid, pv,
        |           unnest(list_concat([pbucket],
        |             list_transform(range(8),
        |               i -> xor(pbucket,
        |                 CAST(1 AS BIGINT) << CAST(i AS INTEGER))))) AS cb
        |         FROM probes),
        |scored AS (SELECT c.pid, e2.vec_id,
        |             round(list_sum(list_transform(list_zip(e2.v, c.pv),
        |                                           s -> s[1] * s[2]))
        |               / (sqrt(list_sum(list_transform(e2.v, x -> x*x)))
        |                  * sqrt(list_sum(list_transform(c.pv, x -> x*x)))),
        |               6) AS cosine
        |           FROM eb e2 JOIN cand c
        |             ON e2.bucket = c.cb AND e2.vec_id <> c.pid),
        |ranked AS (SELECT pid, vec_id, cosine,
        |             CAST(row_number() OVER (PARTITION BY pid
        |               ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rank
        |           FROM scored)
        |SELECT pid, rank, vec_id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY pid, rank""".stripMargin,

    // fixed-centroid IVF (Similarity.knnIvfFixed): the knn_ivf topology
    // with centroids = the first 16 vec_ids' vectors (no learned
    // k-means state), so assignment, nprobe cell ranking, and scoring
    // all replay in SQL. d2 = |c|² − 2·c·v (|v|² constant per vector);
    // ties on (d2, cell). MATERIALIZED: e/cents feed multiple steps.
    "knn_ivf_fixed" ->
      """WITH e AS MATERIALIZED (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |cents AS MATERIALIZED (SELECT vec_id AS cell, v AS cv
        |           FROM e ORDER BY vec_id LIMIT 16),
        |asg AS MATERIALIZED (SELECT vec_id, v, cell,
        |         row_number() OVER (PARTITION BY vec_id
        |           ORDER BY d2 ASC, cell ASC) AS ark
        |       FROM (SELECT e.vec_id, e.v, c.cell,
        |               list_sum(list_transform(c.cv, x -> x*x))
        |               - 2.0 * list_sum(list_transform(list_zip(c.cv, e.v),
        |                                               s -> s[1] * s[2]))
        |                 AS d2
        |             FROM e CROSS JOIN cents c)),
        |assigned AS MATERIALIZED (SELECT vec_id, v, cell AS bucket
        |           FROM asg WHERE ark = 1),
        |probes AS MATERIALIZED (SELECT vec_id AS pid, v AS pv
        |           FROM e ORDER BY vec_id LIMIT 5),
        |pc AS MATERIALIZED (SELECT pid, pv, cell,
        |         row_number() OVER (PARTITION BY pid
        |           ORDER BY d2 ASC, cell ASC) AS crk
        |       FROM (SELECT p.pid, p.pv, c.cell,
        |               list_sum(list_transform(c.cv, x -> x*x))
        |               - 2.0 * list_sum(list_transform(list_zip(c.cv, p.pv),
        |                                               s -> s[1] * s[2]))
        |                 AS d2
        |             FROM probes p CROSS JOIN cents c)),
        |cand AS MATERIALIZED (SELECT pid, pv, cell AS cb
        |           FROM pc WHERE crk <= 3),
        |scored AS (SELECT cd.pid, a.vec_id,
        |             round(list_sum(list_transform(list_zip(a.v, cd.pv),
        |                                           s -> s[1] * s[2]))
        |               / (sqrt(list_sum(list_transform(a.v, x -> x*x)))
        |                  * sqrt(list_sum(list_transform(cd.pv, x -> x*x)))),
        |               6) AS cosine
        |           FROM assigned a JOIN cand cd
        |             ON a.bucket = cd.cb AND a.vec_id <> cd.pid),
        |ranked AS (SELECT pid, vec_id, cosine,
        |             CAST(row_number() OVER (PARTITION BY pid
        |               ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rank
        |           FROM scored)
        |SELECT pid, rank, vec_id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY pid, rank""".stripMargin,

    // quantized ANN (Similarity.knnQuantized): the embed_quantize
    // chain (proven engine-exact by its own oracle) + the knn_bucketed
    // query shape, bucket and scores computed FROM the integer qs —
    // every step deterministic, so the "approximate" ANN path is
    // nevertheless hash-checkable (the approximation is wrt exact
    // cosine, not wrt the declared computation)
    "knn_quantized" ->
      """WITH e AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |m AS (SELECT vec_id, v,
        |        list_max(list_transform(v, x -> abs(x))) AS maxabs
        |      FROM e),
        |s AS (SELECT vec_id, v,
        |        CASE WHEN maxabs > 0
        |             THEN CAST(127.0 AS DOUBLE) / maxabs
        |             ELSE CAST(0.0 AS DOUBLE) END AS scale
        |      FROM m),
        |q AS (SELECT vec_id,
        |        list_transform(v, x ->
        |          CAST(floor(x * scale + CAST(0.5 AS DOUBLE)) AS BIGINT))
        |          AS qs
        |      FROM s),
        |qb AS (SELECT vec_id, qs,
        |         (SELECT CAST(sum(CASE WHEN qs[CAST(i AS INTEGER) + 1] > 0
        |                     THEN CAST(1 AS BIGINT) << CAST(i AS INTEGER)
        |                     ELSE 0 END) AS BIGINT)
        |          FROM (SELECT unnest(range(8)) AS i)) AS bucket
        |       FROM q),
        |probes AS (SELECT vec_id AS pid, qs AS ps, bucket AS pbucket
        |           FROM qb ORDER BY vec_id LIMIT 5),
        |scored AS (SELECT p.pid, x.vec_id,
        |             round(CAST(list_sum(list_transform(list_zip(x.qs, p.ps),
        |                          z -> z[1] * z[2])) AS DOUBLE)
        |               / (sqrt(CAST(list_sum(list_transform(x.qs,
        |                            t -> t * t)) AS DOUBLE))
        |                  * sqrt(CAST(list_sum(list_transform(p.ps,
        |                              t -> t * t)) AS DOUBLE))), 6) AS cosine
        |           FROM qb x JOIN probes p
        |             ON x.bucket = p.pbucket AND x.vec_id <> p.pid),
        |ranked AS (SELECT pid, vec_id, cosine,
        |             CAST(row_number() OVER (PARTITION BY pid
        |               ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rank
        |           FROM scored)
        |SELECT pid, rank, vec_id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY pid, rank""".stripMargin,

    "event_sliding" ->
      """WITH e AS (SELECT event_type, user_id,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |x AS (SELECT event_type, user_id,
        |        unnest([(us // 1800000000) * 1800000000,
        |                (us // 1800000000) * 1800000000 - 1800000000])
        |          AS w_us
        |      FROM e)
        |SELECT make_timestamp(w_us) AS window_start, event_type,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS users
        |FROM x GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |             FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |          FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
        |SELECT doc_id, tf.term, tf, df,
        |       round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        |FROM tf JOIN dfreq ON tf.term = dfreq.term, n
        |ORDER BY doc_id, tf.term""".stripMargin,

    "dedup_embedding" ->
      """WITH e AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |eb AS (SELECT vec_id, v,
        |         (SELECT CAST(sum(CASE WHEN v[CAST(i AS INTEGER) + 1] > 0
        |                     THEN CAST(1 AS BIGINT) << CAST(i AS INTEGER)
        |                     ELSE 0 END) AS BIGINT)
        |          FROM (SELECT unnest(range(8)) AS i)) AS bucket
        |       FROM e)
        |SELECT x.vec_id AS p1, y.vec_id AS p2,
        |       round(list_sum(list_transform(list_zip(x.v, y.v),
        |                                     s -> s[1] * s[2]))
        |         / (sqrt(list_sum(list_transform(x.v, t -> t*t)))
        |            * sqrt(list_sum(list_transform(y.v, t -> t*t)))), 6)
        |         AS cosine
        |FROM eb x JOIN eb y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
        |ORDER BY cosine DESC, p1 ASC, p2 ASC LIMIT 100""".stripMargin,

    "multimodal_features" ->
      """SELECT doc_id AS asset_id,
        |       CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |       CAST(length(text) AS BIGINT) AS n_bytes,
        |       CAST(16 AS BIGINT) AS dim
        |FROM documents ORDER BY asset_id""".stripMargin,

    "multimodal_frames" ->
      """WITH v AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT doc_id,
        |             unnest(range(0, CAST(ceil(length(text) / 256.0) AS BIGINT),
        |                          2)) AS frame_idx,
        |             text
        |      FROM v)
        |SELECT doc_id AS asset_id, frame_idx,
        |       CAST(length(substr(text, CAST(frame_idx * 256 + 1 AS INTEGER),
        |                          256)) AS BIGINT) AS n_bytes,
        |       CAST(('0x' || substr(md5(substr(text,
        |              CAST(frame_idx * 256 + 1 AS INTEGER), 256)), 1, 8))
        |            AS BIGINT) AS frame_fp
        |FROM f ORDER BY asset_id, frame_idx""".stripMargin,

    "multimodal_resize" ->
      """WITH im AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
        |r AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
        |             regexp_replace(text, '(.)(.)', '\1', 'g') AS rz
        |      FROM im)
        |SELECT doc_id AS asset_id, n_bytes,
        |       CAST(length(rz) AS BIGINT) AS resized_bytes,
        |       CAST(('0x' || substr(md5(rz), 1, 8)) AS BIGINT) AS resized_fp
        |FROM r ORDER BY asset_id""".stripMargin,

    "split_assign" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
        |          1, 8)) AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |       CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM d ORDER BY doc_id""".stripMargin,

    // the oracle runs the NAIVE full-stratum window; the Spark plan's
    // threshold prefilter + short-stratum fallback must reproduce it
    // exactly (see Corpus.sampleStratified scaladoc)
    "sample_stratified" ->
      """WITH d AS (SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)),
        |          1, 8)) AS BIGINT) AS h
        |  FROM documents),
        |r AS (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
        |          AS rk
        |      FROM d)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id
        |FROM r WHERE rk <= 50 ORDER BY lang, rk""".stripMargin,

    // the VALUES config is generated from the SAME rate map the Spark
    // query uses (decomposed to whole copies + dyadic hash threshold),
    // so the two surfaces cannot drift; hash + copy expansion are
    // independently expressed per engine
    "corpus_mix" -> {
      val vals = graft.operators.Corpus.defaultMixRates.toSeq.sorted
        .map { case (s, r) =>
          val c = math.floor(r).toLong
          s"('$s', $c, ${math.round((r - c) * (1L << 32).toDouble)})"
        }.mkString(", ")
      s"""WITH cfg(source, copies, thr) AS (VALUES $vals),
        |d AS (SELECT doc_id, documents.source AS source, copies, thr,
        |        CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)),
        |              1, 8)) AS BIGINT) AS h
        |      FROM documents JOIN cfg ON documents.source = cfg.source),
        |k AS (SELECT doc_id, source,
        |        CAST(copies + CASE WHEN h < thr THEN 1 ELSE 0 END AS BIGINT)
        |          AS n
        |      FROM d)
        |SELECT doc_id, source,
        |       CAST(unnest(range(1, n + 1)) AS BIGINT) AS copy_idx
        |FROM k WHERE n > 0 ORDER BY doc_id, copy_idx""".stripMargin
    },

    // quality-aware mixing: the distillation fit (HUGEINT normal
    // equations + Cramer, the quality_predict oracle's chain), per-doc
    // q_pred over the ROUNDED weights, then corpus_mix's copy expansion
    // with tier-modulated (base vs doubled) rate decompositions — both
    // generated from the SAME rate map the Spark query uses
    "mix_quality" -> {
      val vals = graft.operators.Corpus.defaultMixRates.toSeq.sorted
        .map { case (s, r) =>
          def dec(x: Double): (Long, Long) = {
            val c = math.floor(x).toLong
            (c, math.round((x - c) * (1L << 32).toDouble))
          }
          val (c1, t1) = dec(r)
          val (c2, t2) = dec(2 * r)
          s"('$s', $c1, $t1, $c2, $t2)"
        }.mkString(", ")
      s"""WITH f AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the', 'a', 'of', 'and', 'in'))) AS BIGINT)
        |      AS x2,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |      AS u
        |  FROM documents),
        |y AS MATERIALIZED (SELECT doc_id, source, x1, x2,
        |        (1000000 * x2) // x1 + (1000000 * u) // x1 AS y
        |      FROM f),
        |s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |        CAST(sum(x1) AS HUGEINT) AS s1,
        |        CAST(sum(x2) AS HUGEINT) AS s2,
        |        CAST(sum(x1 * x1) AS HUGEINT) AS s11,
        |        CAST(sum(x1 * x2) AS HUGEINT) AS s12,
        |        CAST(sum(x2 * x2) AS HUGEINT) AS s22,
        |        CAST(sum(y) AS HUGEINT) AS sy,
        |        CAST(sum(x1 * y) AS HUGEINT) AS s1y,
        |        CAST(sum(x2 * y) AS HUGEINT) AS s2y
        |      FROM y),
        |d AS MATERIALIZED (SELECT
        |    n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
        |      + s2*(s1*s12 - s11*s2) AS den,
        |    sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
        |      + s2*(s1y*s12 - s11*s2y) AS d0,
        |    n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
        |      + s2*(s1*s2y - s1y*s2) AS d1,
        |    n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
        |      + sy*(s1*s12 - s11*s2) AS d2
        |  FROM s),
        |w AS (SELECT
        |    round(CAST(d0 AS DOUBLE) / CAST(den AS DOUBLE), 6) AS w0,
        |    round(CAST(d1 AS DOUBLE) / CAST(den AS DOUBLE), 6) AS w1,
        |    round(CAST(d2 AS DOUBLE) / CAST(den AS DOUBLE), 6) AS w2
        |  FROM d),
        |p AS (SELECT doc_id, source,
        |        round(w0 + w1 * x1 + w2 * x2, 6) AS q_pred
        |      FROM y, w),
        |cfg(source, c1, t1, c2, t2) AS (VALUES $vals),
        |k AS (SELECT doc_id, p.source AS source, q_pred,
        |        CASE WHEN q_pred < 400000.0 THEN 0
        |             WHEN q_pred >= 700000.0 THEN 2
        |             ELSE 1 END AS tier,
        |        CAST(('0x' || substr(md5('mixq:'
        |              || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h,
        |        c1, t1, c2, t2
        |      FROM p JOIN cfg ON p.source = cfg.source),
        |nc AS (SELECT doc_id, source, q_pred,
        |         CAST(tier AS BIGINT) AS tier,
        |         CAST(CASE WHEN tier = 0 THEN 0
        |                   WHEN tier = 2 THEN
        |                     c2 + CASE WHEN h < t2 THEN 1 ELSE 0 END
        |                   ELSE c1 + CASE WHEN h < t1 THEN 1 ELSE 0 END
        |              END AS BIGINT) AS n
        |       FROM k)
        |SELECT doc_id, source, q_pred, tier,
        |       CAST(unnest(range(1, n + 1)) AS BIGINT) AS copy_idx
        |FROM nc WHERE n > 0 ORDER BY doc_id, copy_idx""".stripMargin
    },

    // the naive single-partition window form of the distributed
    // two-pass prefix sum in Corpus.packAssign — value-identical by
    // construction (the prefix sum is over the same total order)
    "pack_assign" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)),
        |          1, 8)) AS BIGINT) AS h
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |        COALESCE(sum(n_tokens) OVER (ORDER BY h, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS cum
        |      FROM t)
        |SELECT doc_id, n_tokens, CAST(cum // 4096 AS BIGINT) AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin,

    // the full preparation pipeline — quality gate + dedup-survivor
    // filter + split assignment + per-split pack cumsum — composed in
    // one SQL statement exactly as the Spark plan composes the
    // operators
    "corpus_prepare" ->
      s"""WITH RECURSIVE pairs AS (SELECT p1, p2 FROM ($dedupMinhashSql) q),
        |e AS (SELECT p1 AS a, p2 AS b FROM pairs
        |      UNION SELECT p2, p1 FROM pairs),
        |reach(a, b) AS (SELECT a, b FROM e
        |                UNION SELECT r.a, e2.b
        |                      FROM reach r JOIN e e2 ON r.b = e2.a),
        |lbl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        |        FROM reach GROUP BY a),
        |tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |base AS (SELECT d.doc_id,
        |           CAST(len(t.t) AS BIGINT) AS n_tokens,
        |           CAST(('0x' || substr(md5('pack:' ||
        |                 CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h,
        |           CASE WHEN d.bkt < 80 THEN 'train'
        |                WHEN d.bkt < 90 THEN 'val'
        |                ELSE 'test' END AS split
        |         FROM (SELECT doc_id,
        |                 CAST(('0x' || substr(md5('split:' ||
        |                       CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |                   % 100 AS bkt
        |               FROM documents) d
        |         JOIN tk t ON d.doc_id = t.doc_id
        |         WHERE len(t.t) BETWEEN 20 AND 1000
        |           AND len(list_filter(t.t,
        |                 x -> x IN ('the', 'a', 'of', 'and', 'in'))) > 0
        |           AND d.doc_id NOT IN
        |               (SELECT doc_id FROM lbl WHERE doc_id <> cluster_id)),
        |c AS (SELECT doc_id, split, n_tokens,
        |        COALESCE(sum(n_tokens) OVER (PARTITION BY split
        |          ORDER BY h, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS cum
        |      FROM base)
        |SELECT doc_id, split, n_tokens, CAST(cum // 4096 AS BIGINT)
        |         AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin,

    // corpus_prepare + the round-5 gates (repetition, decontamination)
    // — the complete pipeline, replayed end-to-end in one statement
    "corpus_prepare_full" -> corpusPrepareFullSql,

    // the per-(split, pack) dataloader manifest (Corpus.packManifest)
    "pack_manifest" ->
      s"""SELECT split, pack_id,
        |       CAST(count(*) AS BIGINT) AS docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS tokens
        |FROM ($corpusPrepareFullSql) q
        |GROUP BY split, pack_id
        |ORDER BY split, pack_id""".stripMargin,

    // 5-gram overlap against the test split (Corpus.decontaminate)
    "decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents),
        |sh AS (SELECT DISTINCT doc_id, sh FROM (
        |         SELECT doc_id, unnest(list_transform(range(len(t) - 4),
        |           i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |                t[i+4] || ' ' || t[i+5])) AS sh
        |         FROM toks)),
        |spl AS (SELECT doc_id,
        |          CASE WHEN bkt < 80 THEN 'train'
        |               WHEN bkt < 90 THEN 'val'
        |               ELSE 'test' END AS split
        |        FROM (SELECT doc_id,
        |                CAST(('0x' || substr(md5('split:' ||
        |                      CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |                  % 100 AS bkt
        |              FROM documents)),
        |ev AS (SELECT DISTINCT sh.sh FROM sh JOIN spl USING (doc_id)
        |       WHERE spl.split = 'test'),
        |hits AS (SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shared
        |         FROM sh JOIN spl USING (doc_id)
        |              JOIN ev ON sh.sh = ev.sh
        |         WHERE spl.split = 'train'
        |         GROUP BY 1)
        |SELECT s.doc_id,
        |       CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
        |       COALESCE(h.n_shared, 0) > 0 AS contaminated
        |FROM spl s LEFT JOIN hits h ON s.doc_id = h.doc_id
        |WHERE s.split = 'train' ORDER BY s.doc_id""".stripMargin,

    // corpus-level top-100 2-gram statistics (TextOps.ngramCounts)
    "ngram_counts" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(len(t) - 1),
        |        i -> t[i+1] || ' ' || t[i+2])) AS gram
        |      FROM toks)
        |SELECT gram, CAST(count(*) AS BIGINT) AS occurrences,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |FROM g GROUP BY 1
        |ORDER BY occurrences DESC, gram ASC LIMIT 100""".stripMargin,

    // the naive single-partition rank form of the distributed
    // range-partition + zipWithIndex in TextOps.vocabBuild —
    // value-identical (the rank is over the same total order)
    "vocab_build" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |c AS (SELECT token, CAST(count(*) AS BIGINT) AS n
        |      FROM tok GROUP BY 1 HAVING count(*) >= 5)
        |SELECT CAST(row_number() OVER (ORDER BY n DESC, token ASC) - 1
        |         AS BIGINT) AS token_id, token, n
        |FROM c ORDER BY token_id""".stripMargin,

    // vocabulary application (TextOps.tokenizeIds): OOV drops, pos
    // keeps the original index
    "tokenize_ids" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |c AS (SELECT token, CAST(count(*) AS BIGINT) AS n
        |      FROM tok GROUP BY 1 HAVING count(*) >= 5),
        |v AS (SELECT CAST(row_number() OVER (ORDER BY n DESC, token ASC)
        |         - 1 AS BIGINT) AS token_id, token FROM c),
        |seq AS (SELECT doc_id,
        |          unnest(list_transform(range(len(t)),
        |            i -> {'pos': i, 'tok': t[i+1]})) AS u
        |        FROM (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents))
        |SELECT s.doc_id, CAST(s.u.pos AS BIGINT) AS pos, v.token_id
        |FROM seq s JOIN v ON s.u.tok = v.token
        |WHERE v.token_id < 50000
        |ORDER BY doc_id, pos""".stripMargin,

    // tokenize_ids with the reserve-index-0 UNK convention: left join +
    // coalesce, in-vocab ids shift by one, every position yields a row
    "tokenize_unk" -> tokenizeUnkSql,

    // BPE merge learning (TextOps.bpeMerges): 4 unrolled merge rounds,
    // winner + corpus rewrite per round — counts are exact longs, the
    // winner rule a deterministic (cnt DESC, a, b) sort, so the merge
    // table hash-matches across engines
    "bpe_merges" -> bpeMergesSql(4),

    // byte/char-level BPE over the word-frequency type table — the
    // production tokenizer-training granularity (TextOps.bpeMergesBytes)
    "bpe_merges_bytes" -> bpeMergesBytesSql(4),
    "bpe_encode" -> bpeEncodeSql(4),
    "bpe_encode_bytes" -> bpeEncodeBytesSql(4),

    // the pipeline terminal (Corpus.packTokens): the UNK-tokenized
    // token stream of every pipeline survivor, tagged with its
    // (split, pack_id) batch — tokenize_unk joined against
    // corpus_prepare_full's assignment
    "pack_tokens" ->
      s"""WITH prep AS (SELECT doc_id, split, pack_id
        |              FROM ($corpusPrepareFullSql) p),
        |t AS (SELECT * FROM ($tokenizeUnkSql) q)
        |SELECT prep.split, prep.pack_id, t.doc_id, t.pos, t.token_id
        |FROM t JOIN prep ON t.doc_id = prep.doc_id
        |ORDER BY prep.split, prep.pack_id, t.doc_id, t.pos""".stripMargin,

    // symmetric int8 quantization summary (Similarity.embedQuantize);
    // bare decimals CAST to DOUBLE per the Det determinism contract
    "embed_quantize" ->
      """WITH e AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |m AS (SELECT vec_id, v,
        |        list_max(list_transform(v, x -> abs(x))) AS maxabs
        |      FROM e),
        |s AS (SELECT vec_id, v,
        |        CASE WHEN maxabs > 0
        |             THEN CAST(127.0 AS DOUBLE) / maxabs
        |             ELSE CAST(0.0 AS DOUBLE) END AS scale
        |      FROM m),
        |q AS (SELECT vec_id, scale,
        |        list_transform(v, x ->
        |          CAST(floor(x * scale + CAST(0.5 AS DOUBLE)) AS BIGINT))
        |          AS qs
        |      FROM s)
        |SELECT vec_id, round(scale, 6) AS scale,
        |       CAST(list_min(qs) AS BIGINT) AS q_min,
        |       CAST(list_max(qs) AS BIGINT) AS q_max,
        |       CAST(list_sum(qs) AS BIGINT) AS q_sum
        |FROM q ORDER BY vec_id""".stripMargin,

    // Gopher-style bigram repetition gate (TextOps.textRepetition);
    // the 0.25 threshold is dyadic → the boolean is engine-exact
    "text_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(len(t) - 1),
        |        i -> t[i+1] || ' ' || t[i+2])) AS gram
        |      FROM toks),
        |pc AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c
        |       FROM g GROUP BY 1, 2),
        |agg AS (SELECT doc_id,
        |          CAST(sum(c) AS BIGINT) AS n_bigrams,
        |          CAST(max(c) AS BIGINT) AS top_rep,
        |          CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
        |            AS rep_slots
        |        FROM pc GROUP BY 1)
        |SELECT doc_id, n_bigrams, top_rep, rep_slots,
        |       round(rep_slots / n_bigrams, 6) AS rep_ratio,
        |       rep_slots / n_bigrams < CAST(0.25 AS DOUBLE) AS keep_rep
        |FROM agg ORDER BY doc_id""".stripMargin,

    // cross-document exact-substring duplication signal
    // (TextOps.spanDupRate): df over distinct (doc, span) pairs, rate
    // per doc; 0.5 threshold dyadic → engine-exact boolean
    "span_dup_rate" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t
        |            FROM documents),
        |sp AS (SELECT doc_id, unnest(list_transform(range(len(t) - 7),
        |         i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |              t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' ||
        |              t[i+7] || ' ' || t[i+8])) AS s
        |       FROM tk),
        |pd AS (SELECT doc_id, s, CAST(count(*) AS BIGINT) AS c
        |       FROM sp GROUP BY 1, 2),
        |dup AS (SELECT s FROM pd GROUP BY s HAVING count(*) >= 2),
        |nd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_dup
        |       FROM pd JOIN dup USING (s) GROUP BY 1),
        |tot AS (SELECT doc_id,
        |          CAST(CASE WHEN len(t) >= 8 THEN len(t) - 7
        |               ELSE 0 END AS BIGINT) AS n_spans
        |        FROM tk)
        |SELECT tot.doc_id, tot.n_spans,
        |       CAST(COALESCE(nd.n_dup, 0) AS BIGINT) AS n_dup,
        |       CASE WHEN tot.n_spans > 0
        |            THEN round(COALESCE(nd.n_dup, 0) / tot.n_spans, 6)
        |            ELSE CAST(0.0 AS DOUBLE) END AS dup_rate,
        |       (CASE WHEN tot.n_spans > 0
        |             THEN COALESCE(nd.n_dup, 0) / tot.n_spans
        |             ELSE CAST(0.0 AS DOUBLE) END)
        |         < CAST(0.5 AS DOUBLE) AS keep_span
        |FROM tot LEFT JOIN nd ON tot.doc_id = nd.doc_id
        |ORDER BY tot.doc_id""".stripMargin,

    // exact per-source token-length quartiles (Corpus.corpusQuantiles);
    // dyadic quantile points → linear interpolation lands on exact
    // dyadic fractions of ints, bit-identical across engines
    "corpus_quantiles" ->
      """WITH d AS (SELECT source,
        |             CAST(len(string_split(text, ' ')) AS DOUBLE)
        |               AS n_tokens
        |           FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS docs,
        |       quantile_cont(n_tokens, 0.25) AS p25,
        |       quantile_cont(n_tokens, 0.5) AS p50,
        |       quantile_cont(n_tokens, 0.75) AS p75
        |FROM d GROUP BY source ORDER BY source""".stripMargin,

    // per-(source, lang) audit rollup (Corpus.corpusStats)
    "corpus_stats" ->
      """SELECT source, lang,
        |       CAST(count(*) AS BIGINT) AS docs,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens,
        |       CAST(sum(n_chars) AS BIGINT) AS chars,
        |       CAST(min(len(string_split(text, ' '))) AS BIGINT)
        |         AS min_tokens,
        |       CAST(max(len(string_split(text, ' '))) AS BIGINT)
        |         AS max_tokens
        |FROM documents GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin,

    // S8 chunker: nb = ceil(count/100) must track Etl.chunkAssign's
    // chunkSize=100 default; hash = the shared h32 salted-md5 family
    "chunk_assign" ->
      """WITH nb AS MATERIALIZED (
        |  SELECT GREATEST(1, CAST(ceil(count(*) / 100.0) AS BIGINT)) AS n
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(('0x' || substr(md5('chunk:' || CAST(doc_id AS VARCHAR)),
        |             1, 8)) AS BIGINT) % n AS batch
        |FROM documents, nb ORDER BY doc_id""".stripMargin,

    // G3 DOT export: top-100 undirected cooc edges + their endpoint
    // nodes as DOT body lines; penwidth integerized as w100 = 200 +
    // (600*w)//max_w rendered %d.%02d — must track Viz.dotLines
    "viz_dot" ->
      """WITH oi AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |cnt AS MATERIALIZED (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |         CAST(count(*) AS BIGINT) AS w
        |  FROM oi a JOIN oi b ON a.l_orderkey = b.l_orderkey
        |                     AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |top AS MATERIALIZED (
        |  SELECT * FROM cnt ORDER BY w DESC, src ASC, dst ASC LIMIT 100),
        |mx AS MATERIALIZED (SELECT max(w) AS mw FROM top),
        |sel AS MATERIALIZED (
        |  SELECT 0 AS sect, printf('  %d;', id) AS line
        |  FROM (SELECT src AS id FROM top UNION SELECT dst AS id FROM top)
        |  UNION ALL
        |  SELECT 1 AS sect,
        |         printf('  %d -- %d [penwidth=%d.%02d];', src, dst,
        |                (200 + (600 * w) // mw) // 100,
        |                (200 + (600 * w) // mw) % 100) AS line
        |  FROM top, mx)
        |SELECT line FROM sel ORDER BY sect, line""".stripMargin,

    // per-domain curation report (Corpus.domainStats): keep rule must
    // track TextOps.keepGate (20..1000 tokens + stopword floor), dup
    // signal = full-content md5 seen in >= 2 docs
    "domain_stats" ->
      """WITH b AS (SELECT doc_id, source,
        |             CAST(len(string_split(text, ' ')) AS BIGINT)
        |               AS n_tokens,
        |             (len(string_split(text, ' ')) >= 20
        |              AND len(string_split(text, ' ')) <= 1000
        |              AND len(list_filter(string_split(text, ' '),
        |                x -> x IN ('the', 'a', 'of', 'and', 'in'))) > 0)
        |               AS keep,
        |             md5(text) AS fp
        |           FROM documents),
        |f AS (SELECT source, n_tokens, keep,
        |        count(*) OVER (PARTITION BY fp) AS grp
        |      FROM b),
        |s AS (SELECT source, CAST(count(*) AS BIGINT) AS docs,
        |        CAST(sum(n_tokens) AS BIGINT) AS tokens,
        |        CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
        |          AS keep_docs,
        |        CAST(sum(CASE WHEN grp >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |          AS dup_docs
        |      FROM f GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS t_docs,
        |        CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |          AS t_tokens
        |      FROM documents)
        |SELECT source, docs, tokens, keep_docs, dup_docs,
        |       round(keep_docs / CAST(docs AS DOUBLE), 6) AS keep_rate,
        |       round(dup_docs / CAST(docs AS DOUBLE), 6) AS dup_rate,
        |       round(docs / CAST(t_docs AS DOUBLE), 6) AS doc_share,
        |       round(tokens / CAST(t_tokens AS DOUBLE), 6) AS token_share
        |FROM s CROSS JOIN t ORDER BY source""".stripMargin,

    // tokenizer-sizing curve (TextOps.vocabCoverage): rank order must
    // track vocabBuild's (-n, token); topR = 100 default
    "vocab_coverage" ->
      """WITH tok AS MATERIALIZED (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT token, CAST(count(*) AS BIGINT) AS n
        |      FROM tok GROUP BY 1),
        |r AS MATERIALIZED (
        |  SELECT token, n,
        |         CAST(row_number() OVER (ORDER BY n DESC, token ASC)
        |              AS BIGINT) AS rank
        |  FROM c ORDER BY rank LIMIT 100),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS t_tokens FROM tok),
        |h AS (SELECT n AS n1 FROM r WHERE rank = 1),
        |cum AS (SELECT rank, token, n,
        |          CAST(sum(n) OVER (ORDER BY rank
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |        FROM r)
        |SELECT rank, cum.token, cum.n, cum_tokens,
        |       round(cum_tokens / CAST(t_tokens AS DOUBLE), 6) AS coverage,
        |       CASE WHEN rank > 1
        |            THEN round(ln(CAST(n1 AS DOUBLE) / cum.n)
        |                       / ln(CAST(rank AS DOUBLE)), 6)
        |       END AS zipf_exp
        |FROM cum CROSS JOIN t CROSS JOIN h ORDER BY rank""".stripMargin,

    // semantic-cluster audit (Similarity.clusterStats): same fixed
    // centroids + argmin arithmetic as knn_ivf_fixed above (16 cells);
    // mean cosine via round-to-6dp -> exact micro-unit longs
    "cluster_stats" ->
      """WITH e AS MATERIALIZED (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |             CAST(label AS BIGINT) AS label
        |           FROM embeddings),
        |cents AS MATERIALIZED (SELECT vec_id AS cell, v AS cv
        |           FROM e ORDER BY vec_id LIMIT 16),
        |asg AS MATERIALIZED (SELECT vec_id, label, cell, cos_micro,
        |         row_number() OVER (PARTITION BY vec_id
        |           ORDER BY d2 ASC, cell ASC) AS ark
        |       FROM (SELECT e.vec_id, e.label, c.cell,
        |               list_sum(list_transform(c.cv, x -> x*x))
        |               - 2.0 * list_sum(list_transform(list_zip(c.cv, e.v),
        |                                               s -> s[1] * s[2]))
        |                 AS d2,
        |               CAST(round(round(
        |                 list_sum(list_transform(list_zip(c.cv, e.v),
        |                                         s -> s[1] * s[2]))
        |                 / (sqrt(list_sum(list_transform(e.v, x -> x*x)))
        |                    * sqrt(list_sum(list_transform(c.cv,
        |                        x -> x*x)))), 6) * 1000000) AS BIGINT)
        |                 AS cos_micro
        |             FROM e CROSS JOIN cents c)),
        |assigned AS MATERIALIZED (SELECT vec_id, label, cell, cos_micro
        |           FROM asg WHERE ark = 1),
        |pc AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
        |         CAST(sum(cos_micro) AS BIGINT) AS sum_micro
        |       FROM assigned GROUP BY 1),
        |bl AS (SELECT cell, label, CAST(count(*) AS BIGINT) AS ln_
        |       FROM assigned GROUP BY 1, 2),
        |top AS (SELECT cell, label AS top_label, ln_ AS top_label_n
        |        FROM (SELECT cell, label, ln_,
        |                row_number() OVER (PARTITION BY cell
        |                  ORDER BY ln_ DESC, label ASC) AS lrk
        |              FROM bl)
        |        WHERE lrk = 1)
        |SELECT pc.cell, n_vecs,
        |       round(CAST(sum_micro AS DOUBLE)
        |             / CAST(n_vecs * 1000000 AS DOUBLE), 6) AS mean_cos,
        |       top_label, top_label_n,
        |       round(top_label_n / CAST(n_vecs AS DOUBLE), 6) AS purity
        |FROM pc JOIN top ON pc.cell = top.cell ORDER BY pc.cell""".stripMargin,

    // per-vertex triangles + clustering coefficient
    // (GraphMetrics.triangleCounts) — see triangleCountsSql
    "triangle_counts" ->
      s"""$triangleCountsSql
        |ORDER BY product_id""".stripMargin,

    // one-row global graph summary (GraphMetrics.graphStats): exact-long
    // aggregates of the per-vertex triangle table; wedge count via
    // integer division (d(d-1) always even); transitivity = 3T/W
    "graph_stats" ->
      s"""WITH t AS MATERIALIZED ($triangleCountsSql)
        |SELECT CAST(count(*) AS BIGINT) AS n_vertices,
        |       CAST(sum(degree) / 2 AS BIGINT) AS n_edges,
        |       CAST(sum(triangles) / 3 AS BIGINT) AS n_triangles,
        |       CAST(sum(degree * (degree - 1) // 2) AS BIGINT) AS n_wedges,
        |       max(degree) AS max_degree,
        |       round(sum(degree) / CAST(count(*) AS DOUBLE), 6)
        |         AS avg_degree,
        |       CASE WHEN sum(degree * (degree - 1) // 2) > 0
        |            THEN round(sum(triangles)
        |                 / CAST(sum(degree * (degree - 1) // 2) AS DOUBLE), 6)
        |            ELSE CAST(0.0 AS DOUBLE) END AS transitivity
        |FROM t HAVING count(*) > 0""".stripMargin,

    // DOULION edge-sampled triangle estimate (GraphMetrics.triangleEst):
    // hash-deterministic p=1/2 edge sampling (h32("src:dst") even), exact
    // triangle count on the sparsified graph — here by the canonical
    // 3-way self-join, independent of the Spark side's oriented
    // intersection — scaled by 2³. All longs, so hash-exact.
    "triangle_est" ->
      s"""WITH $coocGraphSql,
        |s AS MATERIALIZED (
        |  SELECT src, dst FROM und
        |  WHERE CAST(('0x' || substr(md5(CAST(src AS VARCHAR) || ':' ||
        |                                 CAST(dst AS VARCHAR)), 1, 8))
        |             AS BIGINT) % 2 = 0),
        |tri AS (SELECT CAST(count(*) AS BIGINT) AS t
        |        FROM s e1
        |        JOIN s e2 ON e1.src = e2.src AND e1.dst < e2.dst
        |        JOIN s e3 ON e3.src = e1.dst AND e3.dst = e2.dst)
        |SELECT CAST((SELECT count(*) FROM und) AS BIGINT)
        |         AS n_edges_total,
        |       CAST((SELECT count(*) FROM s) AS BIGINT)
        |         AS n_edges_sampled,
        |       t AS tri_sampled,
        |       CAST(t * 8 AS BIGINT) AS est_triangles
        |FROM tri WHERE (SELECT count(*) FROM und) > 0""".stripMargin,

    // co-purchase degree histogram (GraphMetrics.degreeDist)
    "degree_dist" ->
      s"""WITH $coocGraphSql
        |SELECT d AS degree, CAST(count(*) AS BIGINT) AS n_products
        |FROM deg GROUP BY 1 ORDER BY 1""".stripMargin,

    // cross-document span removal (TextOps.textClean): span rule must
    // track span_dup_rate's n=8 shingles and df >= 2 over distinct
    // (doc, span); a position is removed iff covered by a shared span
    "text_clean" ->
      """WITH tk AS MATERIALIZED (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |ps AS MATERIALIZED (
        |  SELECT doc_id, unnest(range(len(t) - 7)) AS start,
        |         unnest(list_transform(range(len(t) - 7),
        |           i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |                t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' ||
        |                t[i+7] || ' ' || t[i+8])) AS s
        |  FROM tk),
        |dup AS (SELECT s FROM (SELECT DISTINCT doc_id, s FROM ps)
        |        GROUP BY s HAVING count(*) >= 2),
        |hs AS (SELECT doc_id,
        |         list_sort(list(DISTINCT start)) AS hs
        |       FROM ps JOIN dup USING (s) GROUP BY 1),
        |k AS (SELECT tk.doc_id,
        |        CAST(len(t) AS BIGINT) AS n_tokens,
        |        list_filter(range(len(t)),
        |          i -> len(list_filter(COALESCE(hs.hs, []),
        |                 st -> i >= st AND i < st + 8)) = 0) AS kept,
        |        t
        |      FROM tk LEFT JOIN hs ON tk.doc_id = hs.doc_id)
        |SELECT doc_id, n_tokens,
        |       CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
        |       COALESCE(
        |         array_to_string(list_transform(kept, i -> t[i+1]), ' '),
        |         '') AS clean_text
        |FROM k ORDER BY doc_id""".stripMargin,

    // keep-one exact-substring dedup (TextOps.spanSurvivors): the
    // text_clean span/coverage machinery plus the survivor election —
    // min(doc_id) per df>=2 span is the keeper, removal applies only
    // where doc_id != keeper
    "span_survivors" ->
      """WITH tk AS MATERIALIZED (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |ps AS MATERIALIZED (
        |  SELECT doc_id, unnest(range(len(t) - 7)) AS start,
        |         unnest(list_transform(range(len(t) - 7),
        |           i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |                t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' ||
        |                t[i+7] || ' ' || t[i+8])) AS s
        |  FROM tk),
        |dup AS (SELECT s, min(doc_id) AS keeper
        |        FROM (SELECT DISTINCT doc_id, s FROM ps)
        |        GROUP BY s HAVING count(*) >= 2),
        |hs AS (SELECT doc_id,
        |         list_sort(list(DISTINCT start)) AS hs
        |       FROM ps JOIN dup USING (s)
        |       WHERE ps.doc_id <> dup.keeper GROUP BY 1),
        |k AS (SELECT tk.doc_id,
        |        CAST(len(t) AS BIGINT) AS n_tokens,
        |        list_filter(range(len(t)),
        |          i -> len(list_filter(COALESCE(hs.hs, []),
        |                 st -> i >= st AND i < st + 8)) = 0) AS kept,
        |        t
        |      FROM tk LEFT JOIN hs ON tk.doc_id = hs.doc_id)
        |SELECT doc_id, n_tokens,
        |       CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
        |       COALESCE(
        |         array_to_string(list_transform(kept, i -> t[i+1]), ' '),
        |         '') AS clean_text
        |FROM k ORDER BY doc_id""".stripMargin,

    // SemDeDup verdicts (Similarity.semdedupFixed): knn_ivf_fixed's
    // fixed-centroid assignment (16 cells, argmin on |c|²−2·c·v, ties
    // by cell), then in-cell pairwise cosine; drop iff a LOWER-id peer
    // sits at cosine >= 0.4. The cell-size guard (<= 1000) mirrors
    // dropHotBuckets and never fires on testdata.
    "semdedup_fixed" ->
      """WITH e AS MATERIALIZED (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |cents AS MATERIALIZED (SELECT vec_id AS cell, v AS cv
        |           FROM e ORDER BY vec_id LIMIT 16),
        |asg AS (SELECT vec_id, v, cell,
        |         row_number() OVER (PARTITION BY vec_id
        |           ORDER BY d2 ASC, cell ASC) AS ark
        |       FROM (SELECT e.vec_id, e.v, c.cell,
        |               list_sum(list_transform(c.cv, x -> x*x))
        |               - 2.0 * list_sum(list_transform(list_zip(c.cv, e.v),
        |                                               s -> s[1] * s[2]))
        |                 AS d2
        |             FROM e CROSS JOIN cents c)),
        |assigned AS MATERIALIZED (SELECT vec_id, v, cell
        |           FROM asg WHERE ark = 1),
        |cool AS MATERIALIZED (SELECT * FROM assigned
        |        WHERE cell IN (SELECT cell FROM assigned
        |                       GROUP BY cell HAVING count(*) <= 1000)),
        |pairs AS (SELECT a.vec_id, b.vec_id AS pid,
        |            round(list_sum(list_transform(list_zip(a.v, b.v),
        |                                          s -> s[1] * s[2]))
        |              / (sqrt(list_sum(list_transform(a.v, x -> x*x)))
        |                 * sqrt(list_sum(list_transform(b.v, x -> x*x)))),
        |              6) AS cosine
        |          FROM cool a JOIN cool b
        |            ON a.cell = b.cell AND a.vec_id <> b.vec_id),
        |pv AS (SELECT vec_id, max(cosine) AS max_cos,
        |         max(CASE WHEN pid < vec_id AND cosine >= 0.4
        |               THEN 1 ELSE 0 END) AS drp
        |       FROM pairs GROUP BY vec_id)
        |SELECT a.vec_id, a.cell, pv.max_cos,
        |       coalesce(pv.drp, 0) = 0 AS keep
        |FROM assigned a LEFT JOIN pv ON a.vec_id = pv.vec_id
        |ORDER BY a.vec_id""".stripMargin,

    // PII scrubbing (TextOps.piiRedact): contact notes synthesized from
    // customer (integer/string fields only — no float formatting), then
    // detection counts on the original note + email → IP → phone
    // replacement. Patterns are alternation-free, so Java and RE2
    // matching coincide; DuckDB needs the explicit 'g' flag Spark
    // applies by default.
    "pii_redact" ->
      """WITH notes AS (SELECT c_custkey AS customer_id,
        |         c_name || ' (' || c_mktsegment || ')'
        |         || CASE WHEN c_custkey % 3 <> 0
        |              THEN ' email c' || CAST(c_custkey AS VARCHAR)
        |                   || '@example.com'
        |              ELSE '' END
        |         || CASE WHEN c_custkey % 2 = 0
        |              THEN ' phone +1-555-'
        |                   || lpad(CAST(c_custkey % 10000 AS VARCHAR),
        |                           4, '0')
        |              ELSE '' END
        |         || CASE WHEN c_custkey % 5 <> 1
        |              THEN ' ip 10.' || CAST(c_nationkey AS VARCHAR)
        |                   || '.0.' || CAST(c_custkey % 256 AS VARCHAR)
        |              ELSE '' END
        |         || ' account under review' AS note
        |       FROM customer)
        |SELECT customer_id,
        |  CAST(len(regexp_extract_all(note,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_email,
        |  CAST(len(regexp_extract_all(note,
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(note,
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
        |    AS BIGINT) AS n_ip,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(note,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |        '<EMAIL>', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
        |      '<IP>', 'g'),
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |FROM notes ORDER BY customer_id""".stripMargin,

    // bounded-depth BFS (GraphMetrics.reachHops): min-hop reachability
    // within 3 hops of the 5 smallest co-purchase vertices. Levels are
    // frontier sets with per-level dedup; anti-joins enforce min-hop.
    "reach_hops" ->
      """WITH oi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |edges AS MATERIALIZED (SELECT a.l_partkey AS src,
        |           b.l_partkey AS dst
        |         FROM oi a JOIN oi b ON a.l_orderkey = b.l_orderkey
        |                            AND a.l_partkey <> b.l_partkey
        |         GROUP BY 1, 2),
        |seeds AS (SELECT DISTINCT src AS seed FROM edges
        |          ORDER BY seed LIMIT 5),
        |f1 AS MATERIALIZED (SELECT s.seed, e.dst AS v
        |        FROM seeds s JOIN edges e ON e.src = s.seed
        |        WHERE e.dst <> s.seed GROUP BY 1, 2),
        |n2 AS (SELECT f.seed, e.dst AS v
        |       FROM f1 f JOIN edges e ON e.src = f.v GROUP BY 1, 2),
        |f2 AS MATERIALIZED (SELECT n2.seed, n2.v FROM n2
        |        ANTI JOIN f1 ON f1.seed = n2.seed AND f1.v = n2.v
        |        WHERE n2.v <> n2.seed),
        |n3 AS (SELECT f.seed, e.dst AS v
        |       FROM f2 f JOIN edges e ON e.src = f.v GROUP BY 1, 2),
        |f3 AS (SELECT n3.seed, n3.v FROM n3
        |        ANTI JOIN f1 ON f1.seed = n3.seed AND f1.v = n3.v
        |        ANTI JOIN f2 ON f2.seed = n3.seed AND f2.v = n3.v
        |        WHERE n3.v <> n3.seed)
        |SELECT seed, v AS product_id, CAST(1 AS BIGINT) AS hops FROM f1
        |UNION ALL SELECT seed, v, CAST(2 AS BIGINT) FROM f2
        |UNION ALL SELECT seed, v, CAST(3 AS BIGINT) FROM f3
        |ORDER BY seed, hops, product_id""".stripMargin,

    // Okapi BM25 (Lucene idf variant) for the fixed 4-term query in
    // Retrieval.QueryTerms; k1/b mirror Retrieval.BmK1/BmB. dl and
    // avgdl count single-space tokens, same as the Spark side.
    "bm25_topk" ->
      """WITH tok AS (SELECT doc_id, len(string_split(text, ' ')) AS dl,
        |                    unnest(string_split(text, ' ')) AS term
        |             FROM documents),
        |qt AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok
        |       WHERE term IN ('spark', 'join', 'filter', 'window')
        |       GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |          FROM qt GROUP BY 1),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |                 CAST(sum(len(string_split(text, ' '))) AS DOUBLE)
        |                   / count(*) AS avgdl
        |          FROM documents)
        |SELECT doc_id,
        |       round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        |             * tf * 2.2
        |             / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6)
        |         AS bm25,
        |       CAST(count(*) AS BIGINT) AS n_terms_hit
        |FROM qt JOIN dfreq ON qt.term = dfreq.term, stats
        |GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id ASC LIMIT 100""".stripMargin,

    // Laplace-smoothed unigram LM: p(t) = (cnt+1)/(T+V); per-doc
    // token-weighted mean negative log-likelihood.
    "unigram_logprob" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |             FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2),
        |cnt AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cnt
        |        FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t_tokens,
        |               CAST(count(*) AS BIGINT) AS v_size
        |        FROM cnt)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |       round(sum(tf * -ln((cnt + 1.0) / (t_tokens + v_size)))
        |             / sum(tf), 6) AS avg_nll
        |FROM tf JOIN cnt ON tf.term = cnt.term, tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // PMI over adjacent token pairs, support filter c_ab >= 5; the PMI
    // expression mirrors the Spark parse shape character-for-character
    // (ln((1.0*c_ab*T*T)/(1.0*B*c_a*c_b))) so both engines evaluate the
    // same IEEE tree. B = sum(len-1), T = sum(len) from the doc scan.
    "pmi_bigrams" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents),
        |big AS (SELECT unnest(list_transform(range(len(t) - 1),
        |          i -> struct_pack(w1 := t[i+1], w2 := t[i+2]))) AS bg
        |        FROM toks),
        |bcnt AS (SELECT bg.w1 AS w1, bg.w2 AS w2,
        |                CAST(count(*) AS BIGINT) AS c_ab
        |         FROM big GROUP BY 1, 2 HAVING count(*) >= 5),
        |ucnt AS (SELECT unnest(string_split(text, ' ')) AS term
        |         FROM documents),
        |uc AS (SELECT term, CAST(count(*) AS BIGINT) AS c
        |       FROM ucnt GROUP BY 1),
        |tot AS (SELECT CAST(sum(greatest(len(string_split(text, ' ')) - 1,
        |                 0)) AS BIGINT) AS b_total,
        |               CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |                 AS t_total
        |        FROM documents)
        |SELECT w1, w2, c_ab,
        |       round(ln((1.0 * c_ab * t_total * t_total)
        |             / (1.0 * b_total * a.c * b.c)), 6) AS pmi
        |FROM bcnt JOIN uc a ON bcnt.w1 = a.term
        |          JOIN uc b ON bcnt.w2 = b.term, tot
        |ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 100""".stripMargin,

    // CCNet-style head/middle/tail binning by EXACT global rank over
    // the ROUNDED per-doc NLL (a float sum's accumulation order is
    // fixed in neither engine — at 6 dp the rank key is
    // engine-identical, doc_id breaks residual ties; this is the naive
    // single-partition row_number form of the distributed
    // range-partition + zipWithIndex rank — value-identical, same
    // total order). Quartile test is integer arithmetic: rank*4 vs
    // n_docs.
    "nll_bucket" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |             FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2),
        |cnt AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cnt
        |        FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t_tokens,
        |               CAST(count(*) AS BIGINT) AS v_size
        |        FROM cnt),
        |nll AS (SELECT doc_id,
        |          round(sum(tf * -ln((cnt + 1.0) / (t_tokens + v_size)))
        |            / sum(tf), 6) AS avg_nll
        |        FROM tf JOIN cnt ON tf.term = cnt.term, tot
        |        GROUP BY doc_id),
        |r AS (SELECT doc_id, avg_nll,
        |        CAST(row_number() OVER (ORDER BY avg_nll ASC, doc_id ASC)
        |          - 1 AS BIGINT) AS rank,
        |        CAST(count(*) OVER () AS BIGINT) AS n_docs
        |      FROM nll)
        |SELECT doc_id, avg_nll,
        |       CASE WHEN rank * 4 < n_docs THEN 'head'
        |            WHEN rank * 4 >= n_docs * 3 THEN 'tail'
        |            ELSE 'middle' END AS bucket
        |FROM r ORDER BY doc_id""".stripMargin,

    // per-type hourly z-scores: exact-long moments, variance as ONE
    // double tree, integer zero-variance guard, flag on the rounded z
    // (all mirrored from EventsOps.eventAnomalyOf's expression shape)
    "event_anomaly" ->
      """WITH h AS (SELECT event_type,
        |             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |             CAST(count(*) AS BIGINT) AS n
        |           FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nb,
        |             CAST(sum(n) AS BIGINT) AS sx,
        |             CAST(sum(n * n) AS BIGINT) AS sxx
        |      FROM h GROUP BY 1 HAVING count(*) >= 2),
        |zz AS (SELECT h.event_type, hour, n,
        |         CASE WHEN nb * sxx - sx * sx > 0
        |           THEN round((n - CAST(sx AS DOUBLE) / nb)
        |                / sqrt(CAST(nb * sxx - sx * sx AS DOUBLE)
        |                       / (nb * (nb - 1))), 6)
        |           ELSE 0.0 END AS z
        |       FROM h JOIN s ON h.event_type = s.event_type)
        |SELECT event_type, hour, n, z, abs(z) >= 2.0 AS is_anomaly
        |FROM zz ORDER BY event_type, hour""".stripMargin,

    // robust winnowing, k=3 w=4: positioned 3-gram h32 hashes, window
    // min over [pos, pos+3], rightmost minimizer via the 4-way fan-out
    // join; mirrors Dedup.winnowOf shape-for-shape
    "winnow_fingerprints" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents),
        |g AS (SELECT doc_id, pos,
        |        CAST(('0x' || substr(md5(t[pos+1] || ' ' || t[pos+2]
        |               || ' ' || t[pos+3]), 1, 8)) AS BIGINT) AS h
        |      FROM (SELECT doc_id, t,
        |              CAST(unnest(range(len(t) - 2)) AS BIGINT) AS pos
        |            FROM toks)),
        |m AS (SELECT doc_id, pos AS s,
        |        min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
        |          AS mn,
        |        count(*) OVER (PARTITION BY doc_id) AS np
        |      FROM g),
        |starts AS (SELECT doc_id, s, mn FROM m WHERE s <= np - 4),
        |cand AS (SELECT doc_id, s, mn, s + off AS pos
        |         FROM starts,
        |              (SELECT CAST(unnest(range(4)) AS BIGINT) AS off)),
        |w AS (SELECT c.doc_id, c.s, c.mn, max(g.pos) AS pos
        |      FROM cand c JOIN g ON g.doc_id = c.doc_id
        |                        AND g.pos = c.pos AND g.h = c.mn
        |      GROUP BY 1, 2, 3)
        |SELECT DISTINCT doc_id, pos, mn AS fingerprint
        |FROM w ORDER BY doc_id, pos""".stripMargin,

    // fingerprint-set jaccard over the winnowed signatures. The
    // corpus-relative hot-fingerprint guard IS mirrored (the `keep`
    // CTE: df ≤ GREATEST(Dedup.DfFloor, ⌈n_docs/RelDfDenom⌉),
    // interpolated integer ceil — the exact Dedup.dropHotBucketsRel
    // arithmetic by construction), so engine and oracle agree
    // even on a corpus where boilerplate pushes a fingerprint past the
    // df cap — sizes stay unguarded-exact on both sides, matching
    // Dedup.winnowPairsOf's lower-bound contract. The
    // rightmost-minimizer join of the winnow_fingerprints oracle is
    // skipped here deliberately: the distinct fingerprint VALUES per
    // doc are exactly the distinct complete-window minimums, whichever
    // position each window elects.
    "winnow_pairs" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents),
        |g AS (SELECT doc_id, pos,
        |        CAST(('0x' || substr(md5(t[pos+1] || ' ' || t[pos+2]
        |               || ' ' || t[pos+3]), 1, 8)) AS BIGINT) AS h
        |      FROM (SELECT doc_id, t,
        |              CAST(unnest(range(len(t) - 2)) AS BIGINT) AS pos
        |            FROM toks)),
        |m AS (SELECT doc_id, pos AS s,
        |        min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
        |          AS mn,
        |        count(*) OVER (PARTITION BY doc_id) AS np
        |      FROM g),
        |sets AS MATERIALIZED (SELECT DISTINCT doc_id, mn AS fp
        |         FROM m WHERE s <= np - 4),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
        |          FROM sets GROUP BY 1),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM sizes),
        |keep AS (SELECT fp FROM sets GROUP BY fp
        |         HAVING count(*) <= GREATEST(${Dedup.DfFloor},
        |           (SELECT (n_docs + ${Dedup.RelDfDenom - 1})
        |                    // ${Dedup.RelDfDenom} FROM nd))),
        |i AS MATERIALIZED (
        |  SELECT s.doc_id, s.fp FROM sets s JOIN keep USING (fp)),
        |common AS (SELECT x.doc_id AS p1, y.doc_id AS p2,
        |                  CAST(count(*) AS BIGINT) AS common
        |           FROM i x JOIN i y
        |             ON x.fp = y.fp AND x.doc_id < y.doc_id
        |           GROUP BY 1, 2)
        |SELECT p1, p2, common,
        |       round(common / (s1.sz + s2.sz - common), 6) AS jaccard
        |FROM common JOIN sizes s1 ON p1 = s1.doc_id
        |            JOIN sizes s2 ON p2 = s2.doc_id
        |ORDER BY jaccard DESC, p1 ASC, p2 ASC LIMIT 200""".stripMargin,

    // per-source KL drift from the corpus token distribution; the
    // ratio keeps one parse shape ((1.0*c_st*t_all)/(1.0*t_src*c_t)),
    // mirrored from Retrieval.sourceKlOf
    "source_kl" ->
      """WITH st AS (SELECT source, unnest(string_split(text, ' ')) AS term
        |            FROM documents),
        |sc AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c_st
        |       FROM st GROUP BY 1, 2),
        |ct AS (SELECT term, CAST(sum(c_st) AS BIGINT) AS c_t
        |       FROM sc GROUP BY 1),
        |tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS t_all FROM ct),
        |stot AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS t_src
        |         FROM sc GROUP BY 1)
        |SELECT sc.source, CAST(sum(c_st) AS BIGINT) AS n_tokens,
        |       CAST(count(*) AS BIGINT) AS n_terms,
        |       round(sum((CAST(c_st AS DOUBLE) / t_src)
        |             * ln((1.0 * c_st * t_all) / (1.0 * t_src * c_t))),
        |         6) AS kl_nats
        |FROM sc JOIN ct ON sc.term = ct.term
        |        JOIN stot ON sc.source = stot.source, tot
        |GROUP BY sc.source ORDER BY sc.source""".stripMargin,

    // Laplace bigram LM: p(w2|w1) = (c_ab+1)/(c_ctx+V), c_ctx the
    // exact prefix-context count re-aggregated from the bigram counts
    "bigram_nll" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents),
        |dbg AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2,
        |               CAST(count(*) AS BIGINT) AS tf
        |        FROM (SELECT doc_id,
        |                unnest(list_transform(range(len(t) - 1),
        |                  i -> struct_pack(w1 := t[i+1], w2 := t[i+2])))
        |                  AS bg
        |              FROM toks)
        |        GROUP BY 1, 2, 3),
        |bcnt AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c_ab
        |         FROM dbg GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(sum(c_ab) AS BIGINT) AS c_ctx
        |        FROM bcnt GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v_size
        |      FROM (SELECT unnest(string_split(text, ' ')) AS term
        |            FROM documents))
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
        |       round(sum(tf * -ln((c_ab + 1.0) / (c_ctx + v_size)))
        |             / sum(tf), 6) AS avg_nll2
        |FROM dbg JOIN bcnt USING (w1, w2) JOIN ctx USING (w1), v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // single-pass entropy form ln(n) - sum(tf*ln(tf))/n; tf=1 terms
    // contribute 0 to the sum (ln 1 = 0)
    "text_entropy" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |             FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |       CAST(count(*) AS BIGINT) AS distinct_tokens,
        |       round(ln(sum(tf)) - sum(tf * ln(tf)) / sum(tf), 6)
        |         AS entropy
        |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // quality-model distillation: the fit is exact integer sums (DuckDB
    // HUGEINT, Spark decimal→BigInt) + one 3×3 Cramer solve whose ONLY
    // floats are a final int→double cast, one division, one round —
    // the Distill scaladoc's cross-engine contract. The teacher target
    // uses integer division throughout, so it is a BIGINT both engines
    // compute identically.
    "quality_fit" ->
      """WITH f AS (SELECT
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the', 'a', 'of', 'and', 'in'))) AS BIGINT)
        |      AS x2,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |      AS u
        |  FROM documents),
        |y AS (SELECT x1, x2,
        |        (1000000 * x2) // x1 + (1000000 * u) // x1 AS y
        |      FROM f),
        |s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |        CAST(sum(x1) AS HUGEINT) AS s1,
        |        CAST(sum(x2) AS HUGEINT) AS s2,
        |        CAST(sum(x1 * x1) AS HUGEINT) AS s11,
        |        CAST(sum(x1 * x2) AS HUGEINT) AS s12,
        |        CAST(sum(x2 * x2) AS HUGEINT) AS s22,
        |        CAST(sum(y) AS HUGEINT) AS sy,
        |        CAST(sum(x1 * y) AS HUGEINT) AS s1y,
        |        CAST(sum(x2 * y) AS HUGEINT) AS s2y
        |      FROM y),
        |d AS MATERIALIZED (SELECT
        |    n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
        |      + s2*(s1*s12 - s11*s2) AS den,
        |    sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
        |      + s2*(s1y*s12 - s11*s2y) AS d0,
        |    n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
        |      + s2*(s1*s2y - s1y*s2) AS d1,
        |    n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
        |      + sy*(s1*s12 - s11*s2) AS d2
        |  FROM s)
        |SELECT * FROM (
        |  SELECT 'w0_intercept' AS feature,
        |         round(CAST(d0 AS DOUBLE) / CAST(den AS DOUBLE), 6)
        |           AS weight FROM d
        |  UNION ALL SELECT 'w1_n_tokens',
        |         round(CAST(d1 AS DOUBLE) / CAST(den AS DOUBLE), 6) FROM d
        |  UNION ALL SELECT 'w2_stop_cnt',
        |         round(CAST(d2 AS DOUBLE) / CAST(den AS DOUBLE), 6) FROM d)
        |ORDER BY feature""".stripMargin,

    // the scoring pass: per-doc arithmetic over the ROUNDED fit weights
    // in the same fixed 3-term order as the Spark projection
    "quality_predict" ->
      """WITH f AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the', 'a', 'of', 'and', 'in'))) AS BIGINT)
        |      AS x2,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |      AS u
        |  FROM documents),
        |y AS MATERIALIZED (SELECT doc_id, x1, x2,
        |        (1000000 * x2) // x1 + (1000000 * u) // x1 AS y
        |      FROM f),
        |s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |        CAST(sum(x1) AS HUGEINT) AS s1,
        |        CAST(sum(x2) AS HUGEINT) AS s2,
        |        CAST(sum(x1 * x1) AS HUGEINT) AS s11,
        |        CAST(sum(x1 * x2) AS HUGEINT) AS s12,
        |        CAST(sum(x2 * x2) AS HUGEINT) AS s22,
        |        CAST(sum(y) AS HUGEINT) AS sy,
        |        CAST(sum(x1 * y) AS HUGEINT) AS s1y,
        |        CAST(sum(x2 * y) AS HUGEINT) AS s2y
        |      FROM y),
        |d AS MATERIALIZED (SELECT
        |    n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
        |      + s2*(s1*s12 - s11*s2) AS den,
        |    sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
        |      + s2*(s1y*s12 - s11*s2y) AS d0,
        |    n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
        |      + s2*(s1*s2y - s1y*s2) AS d1,
        |    n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
        |      + sy*(s1*s12 - s11*s2) AS d2
        |  FROM s),
        |w AS (SELECT
        |    round(CAST(d0 AS DOUBLE) / CAST(den AS DOUBLE), 6) AS w0,
        |    round(CAST(d1 AS DOUBLE) / CAST(den AS DOUBLE), 6) AS w1,
        |    round(CAST(d2 AS DOUBLE) / CAST(den AS DOUBLE), 6) AS w2
        |  FROM d)
        |SELECT doc_id, x1 AS n_tokens, x2 AS stop_cnt, y AS q_teacher,
        |       round(w0 + w1 * x1 + w2 * x2, 6) AS q_pred,
        |       round(y - (w0 + w1 * x1 + w2 * x2), 6) AS resid
        |FROM y, w ORDER BY doc_id""".stripMargin,

    // per-domain curation: the oracle replays the ONE-stage top-k form;
    // the engine's salted two-stage plan is exactly equal by the
    // any-top-k-row-is-in-its-salt's-top-k argument (Distill scaladoc)
    "domain_topk" ->
      """WITH f AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the', 'a', 'of', 'and', 'in'))) AS BIGINT)
        |      AS x2,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |      AS u
        |  FROM documents),
        |y AS (SELECT doc_id, source,
        |        (1000000 * x2) // x1 + (1000000 * u) // x1 AS q_teacher
        |      FROM f),
        |r AS (SELECT source, doc_id, q_teacher,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY q_teacher DESC, doc_id ASC) AS rk
        |      FROM y)
        |SELECT source, CAST(rk AS BIGINT) AS rank, doc_id, q_teacher
        |FROM r WHERE rk <= 5 ORDER BY source, rank""".stripMargin,

    // curriculum: exact global quartile staging by teacher score, then
    // a deterministic hash shuffle within each stage — both ranks are
    // plain window row_numbers here; the engine's distributed two-pass
    // rank equals them by the total-order argument (Distill scaladoc)
    "curriculum_order" ->
      """WITH f AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the', 'a', 'of', 'and', 'in'))) AS BIGINT)
        |      AS x2,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |      AS u
        |  FROM documents),
        |y AS (SELECT doc_id,
        |        (1000000 * x2) // x1 + (1000000 * u) // x1 AS q_teacher
        |      FROM f),
        |r AS (SELECT doc_id, q_teacher,
        |        row_number() OVER (ORDER BY q_teacher DESC, doc_id ASC)
        |          - 1 AS rk,
        |        count(*) OVER () AS n
        |      FROM y),
        |s AS (SELECT doc_id, q_teacher,
        |        CASE WHEN rk * 4 < n THEN 0
        |             WHEN rk * 4 >= n * 3 THEN 2
        |             ELSE 1 END AS si,
        |        CAST(('0x' || substr(md5('cur:'
        |              || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |          AS h
        |      FROM r)
        |SELECT CAST(row_number()
        |         OVER (ORDER BY si, h, doc_id) - 1 AS BIGINT) AS ord,
        |       doc_id,
        |       CASE si WHEN 0 THEN 'easy' WHEN 1 THEN 'core'
        |               ELSE 'hard' END AS stage,
        |       q_teacher
        |FROM s ORDER BY ord""".stripMargin,

    // per-source token-budget cap: the oracle replays the naive
    // one-window cumsum; the engine's two-level bucket decomposition
    // equals it by the high-bits total-order argument (Corpus scaladoc)
    "source_cap" ->
      """WITH f AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(('0x' || substr(md5('cap:'
        |          || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
        |  FROM documents),
        |c AS (SELECT source, doc_id, n_tokens,
        |        COALESCE(CAST(sum(n_tokens) OVER (PARTITION BY source
        |            ORDER BY h ASC, doc_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |          AS BIGINT), 0) AS cum_before
        |      FROM f)
        |SELECT source, doc_id, n_tokens, cum_before,
        |       (cum_before < 1500) AS kept
        |FROM c ORDER BY source, cum_before""".stripMargin,

    // FIM: the GREATEST(…, 1) modulus guard mirrors the Spark side
    // (sub-3-token rows take the passthrough branch but the cut
    // arithmetic is still evaluated)
    "fim_transform" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tk
        |           FROM documents),
        |c AS (SELECT doc_id, text, tk,
        |        CAST(len(tk) AS BIGINT) AS n,
        |        1 + CAST(('0x' || substr(md5('fim-a:'
        |              || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |          % GREATEST(CAST(len(tk) AS BIGINT) - 2, 1) AS pl
        |      FROM t),
        |c2 AS (SELECT *,
        |        1 + CAST(('0x' || substr(md5('fim-b:'
        |              || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |          % GREATEST(n - 1 - pl, 1) AS ml
        |       FROM c)
        |SELECT doc_id, n AS n_tokens,
        |       CASE WHEN n >= 3 THEN pl ELSE 0 END AS p_len,
        |       CASE WHEN n >= 3 THEN ml ELSE 0 END AS m_len,
        |       (n >= 3) AS fim_applied,
        |       CASE WHEN n >= 3 THEN
        |         '<PRE> ' || array_to_string(list_slice(tk, 1, pl), ' ')
        |         || ' <SUF> '
        |         || array_to_string(list_slice(tk, pl + ml + 1, n), ' ')
        |         || ' <MID> '
        |         || array_to_string(list_slice(tk, pl + 1, pl + ml), ' ')
        |       ELSE text END AS fim_text
        |FROM c2 ORDER BY doc_id""".stripMargin,
  ) match {
    // jaccard_lsh_2l (the two-level-aggregation experiment variant,
    // round-12 verdict item 2) is value-identical to jaccard_lsh by
    // construction — the salted partial-collect/merge reshapes only the
    // bucket aggregation — so it shares the oracle verbatim; the shared
    // oracle row is exactly what pins the "identical output" claim.
    case m => m + ("jaccard_lsh_2l" -> m("jaccard_lsh"))
  }

  /** Staged renderings of the oracle queries whose SINGLE-STATEMENT
    * form does not fit DuckDB at sf10 (round 12, verdict item 1): the
    * corpus-prep/pack chain held 5 chained CTE frames alive in one
    * statement (>68 GB temp at 64 AND 90 GB memory budgets), and the
    * exact-triangle wedge join's working set is unbounded per
    * statement. Each stage materializes one already-hash-verified
    * building block as a TEMP TABLE (DuckDB releases the statement's
    * operator state between stages), and the final SQL reads only
    * stage tables plus the base views — a multi-statement oracle is
    * still an oracle. selfcheck.py runs these when
    * GRAFT_ORACLE_STAGED=1; the result is compared against the SAME
    * Spark dump as the single-statement form, so any drift between
    * the two renderings fails the hash check (both modes verified
    * green at sf0.01 and sf0.1 before being trusted at sf10).
    *
    * Stage values are statement LISTS so a stage can accumulate in a
    * loop: the triangle wedge pass runs as [[TriangleSlices]] INSERTs
    * each bounded to one `u % slices` residue class, capping the
    * per-statement wedge working set at ~1/slices of the whole. */
  val TriangleSlices = 8

  val oracleStages: Seq[(String, Seq[String])] = {
    val tkCte = "tk AS (SELECT doc_id, string_split(text, ' ') AS t" +
      " FROM documents)"
    Seq(
      "stg_pairs" -> Seq(
        s"""CREATE TEMP TABLE stg_pairs AS
          |SELECT p1, p2 FROM ($dedupMinhashSql) q""".stripMargin),
      "stg_lbl" -> Seq(
        """CREATE TEMP TABLE stg_lbl AS
          |WITH RECURSIVE e AS (SELECT p1 AS a, p2 AS b FROM stg_pairs
          |     UNION SELECT p2, p1 FROM stg_pairs),
          |reach(a, b) AS (SELECT a, b FROM e
          |                UNION SELECT r.a, e2.b
          |                      FROM reach r JOIN e e2 ON r.b = e2.a)
          |SELECT a AS doc_id, least(a, min(b)) AS cluster_id
          |FROM reach GROUP BY a""".stripMargin),
      "stg_spl" -> Seq(
        """CREATE TEMP TABLE stg_spl AS
          |SELECT doc_id,
          |  CASE WHEN bkt < 80 THEN 'train'
          |       WHEN bkt < 90 THEN 'val' ELSE 'test' END AS split
          |FROM (SELECT doc_id,
          |        CAST(('0x' || substr(md5('split:' ||
          |              CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          |          % 100 AS bkt FROM documents)""".stripMargin),
      "stg_rep" -> Seq(
        s"""CREATE TEMP TABLE stg_rep AS
          |WITH $tkCte,
          |bg AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c FROM (
          |         SELECT doc_id, unnest(list_transform(range(len(t) - 1),
          |           i -> t[i+1] || ' ' || t[i+2])) AS gram FROM tk)
          |       GROUP BY 1, 2)
          |SELECT doc_id FROM (
          |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb,
          |    CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS rs
          |  FROM bg GROUP BY 1)
          |WHERE rs / nb < CAST(0.25 AS DOUBLE)""".stripMargin),
      "stg_cont" -> Seq(
        s"""CREATE TEMP TABLE stg_cont AS
          |WITH $tkCte,
          |sh5 AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM (
          |         SELECT doc_id, unnest(list_transform(range(len(t) - 4),
          |           i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
          |                t[i+4] || ' ' || t[i+5])) AS sh FROM tk)),
          |ev AS (SELECT DISTINCT sh5.sh FROM sh5
          |       JOIN stg_spl spl USING (doc_id)
          |       WHERE spl.split = 'test')
          |SELECT DISTINCT sh5.doc_id FROM sh5
          |JOIN stg_spl spl USING (doc_id) JOIN ev ON sh5.sh = ev.sh
          |WHERE spl.split = 'train'""".stripMargin),
      "stg_prep_full" -> Seq(
        s"""CREATE TEMP TABLE stg_prep_full AS
          |WITH $tkCte,
          |base AS (SELECT d.doc_id,
          |           CAST(len(t.t) AS BIGINT) AS n_tokens,
          |           CAST(('0x' || substr(md5('pack:' ||
          |                 CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h,
          |           s.split
          |         FROM documents d
          |         JOIN tk t ON d.doc_id = t.doc_id
          |         JOIN stg_spl s ON d.doc_id = s.doc_id
          |         WHERE len(t.t) BETWEEN 20 AND 1000
          |           AND len(list_filter(t.t,
          |                 x -> x IN ('the', 'a', 'of', 'and', 'in'))) > 0
          |           AND d.doc_id IN (SELECT doc_id FROM stg_rep)
          |           AND d.doc_id NOT IN
          |               (SELECT doc_id FROM stg_lbl WHERE doc_id <> cluster_id)
          |           AND d.doc_id NOT IN (SELECT doc_id FROM stg_cont))
          |SELECT doc_id, split, n_tokens,
          |       CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY split
          |         ORDER BY h, doc_id
          |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |         // 4096 AS BIGINT) AS pack_id
          |FROM base""".stripMargin),
      "stg_tok_unk" -> Seq(
        s"CREATE TEMP TABLE stg_tok_unk AS\n$tokenizeUnkSql"),
      "stg_und" -> Seq(
        """CREATE TEMP TABLE stg_und AS
          |WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
          |SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          |FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
          |                   AND a.l_partkey < b.l_partkey""".stripMargin),
      "stg_deg" -> Seq(
        """CREATE TEMP TABLE stg_deg AS
          |SELECT v, CAST(count(*) AS BIGINT) AS d
          |FROM (SELECT src AS v FROM stg_und
          |      UNION ALL SELECT dst FROM stg_und) GROUP BY 1""".stripMargin),
      "stg_ore" -> Seq(
        """CREATE TEMP TABLE stg_ore AS
          |SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.src < e.dst)
          |            THEN e.src ELSE e.dst END AS u,
          |       CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.src < e.dst)
          |            THEN e.dst ELSE e.src END AS v
          |FROM stg_und e JOIN stg_deg du ON e.src = du.v
          |               JOIN stg_deg dv ON e.dst = dv.v""".stripMargin),
      "stg_tv" -> (
        Seq("CREATE TEMP TABLE stg_tv (v BIGINT, t BIGINT)") ++
        (0 until TriangleSlices).map { i =>
          s"""INSERT INTO stg_tv
            |SELECT COALESCE(u, a, b) AS v, CAST(sum(c) AS BIGINT) AS t
            |FROM (SELECT u, a, b, CAST(count(*) AS BIGINT) AS c
            |      FROM (SELECT e1.u AS u, e1.v AS a, e2.v AS b
            |            FROM stg_ore e1 JOIN stg_ore e2
            |              ON e1.u = e2.u AND e1.v < e2.v
            |            JOIN stg_und und
            |              ON und.src = e1.v AND und.dst = e2.v
            |            WHERE e1.u % $TriangleSlices = $i)
            |      GROUP BY GROUPING SETS ((u), (a), (b)))
            |GROUP BY 1""".stripMargin
        }),
    )
  }

  /** Per-query staged form: (stage names in dependency order, final
    * SELECT over the stage tables). Keys are a subset of [[oracleSql]];
    * result columns and ordering are identical to the single-statement
    * entries. */
  val stagedOracleSql: Map[String, (Seq[String], String)] = {
    val packChain =
      Seq("stg_pairs", "stg_lbl", "stg_spl", "stg_rep", "stg_cont",
          "stg_prep_full")
    val triBase = Seq("stg_und", "stg_deg", "stg_ore", "stg_tv")
    val triVertex =
      """stg_deg deg LEFT JOIN
        |  (SELECT v, CAST(sum(t) AS BIGINT) AS t FROM stg_tv GROUP BY 1) tv
        |  ON deg.v = tv.v""".stripMargin
    Map(
      "corpus_prepare" -> (Seq("stg_pairs", "stg_lbl", "stg_spl") ->
        """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t
          |            FROM documents),
          |base AS (SELECT d.doc_id,
          |           CAST(len(t.t) AS BIGINT) AS n_tokens,
          |           CAST(('0x' || substr(md5('pack:' ||
          |                 CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h,
          |           s.split
          |         FROM documents d
          |         JOIN tk t ON d.doc_id = t.doc_id
          |         JOIN stg_spl s ON d.doc_id = s.doc_id
          |         WHERE len(t.t) BETWEEN 20 AND 1000
          |           AND len(list_filter(t.t,
          |                 x -> x IN ('the', 'a', 'of', 'and', 'in'))) > 0
          |           AND d.doc_id NOT IN
          |               (SELECT doc_id FROM stg_lbl WHERE doc_id <> cluster_id)),
          |c AS (SELECT doc_id, split, n_tokens,
          |        COALESCE(sum(n_tokens) OVER (PARTITION BY split
          |          ORDER BY h, doc_id
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |          AS cum
          |      FROM base)
          |SELECT doc_id, split, n_tokens, CAST(cum // 4096 AS BIGINT)
          |         AS pack_id
          |FROM c ORDER BY doc_id""".stripMargin),
      "corpus_prepare_full" -> (packChain ->
        """SELECT doc_id, split, n_tokens, pack_id
          |FROM stg_prep_full ORDER BY doc_id""".stripMargin),
      "pack_manifest" -> (packChain ->
        """SELECT split, pack_id,
          |       CAST(count(*) AS BIGINT) AS docs,
          |       CAST(sum(n_tokens) AS BIGINT) AS tokens
          |FROM stg_prep_full
          |GROUP BY split, pack_id
          |ORDER BY split, pack_id""".stripMargin),
      "pack_tokens" -> ((packChain :+ "stg_tok_unk") ->
        """SELECT p.split, p.pack_id, t.doc_id, t.pos, t.token_id
          |FROM stg_tok_unk t JOIN stg_prep_full p ON t.doc_id = p.doc_id
          |ORDER BY p.split, p.pack_id, t.doc_id, t.pos""".stripMargin),
      "triangle_counts" -> (triBase ->
        s"""SELECT deg.v AS product_id, deg.d AS degree,
          |       CAST(COALESCE(tv.t, 0) AS BIGINT) AS triangles,
          |       CASE WHEN deg.d >= 2
          |            THEN round((2.0 * COALESCE(tv.t, 0))
          |                       / (deg.d * (deg.d - 1.0)), 6)
          |            ELSE CAST(0.0 AS DOUBLE) END AS clust_coeff
          |FROM $triVertex
          |ORDER BY product_id""".stripMargin),
      "graph_stats" -> (triBase ->
        s"""WITH t AS (
          |  SELECT deg.d AS degree,
          |         CAST(COALESCE(tv.t, 0) AS BIGINT) AS triangles
          |  FROM $triVertex)
          |SELECT CAST(count(*) AS BIGINT) AS n_vertices,
          |       CAST(sum(degree) / 2 AS BIGINT) AS n_edges,
          |       CAST(sum(triangles) / 3 AS BIGINT) AS n_triangles,
          |       CAST(sum(degree * (degree - 1) // 2) AS BIGINT) AS n_wedges,
          |       max(degree) AS max_degree,
          |       round(sum(degree) / CAST(count(*) AS DOUBLE), 6)
          |         AS avg_degree,
          |       CASE WHEN sum(degree * (degree - 1) // 2) > 0
          |            THEN round(sum(triangles)
          |                 / CAST(sum(degree * (degree - 1) // 2) AS DOUBLE), 6)
          |            ELSE CAST(0.0 AS DOUBLE) END AS transitivity
          |FROM t HAVING count(*) > 0""".stripMargin),
    )
  }
}
