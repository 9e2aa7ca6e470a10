package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** The session-artifact contract: every (spark, dir) entry point that
  * consumes a session-scoped cached artifact (shared edge tables, the
  * oriented-triangle pair, the SCC labels, the 5-gram LM blocks, the
  * bigram counts) must return BIT-IDENTICAL rows to the standalone Df
  * form that builds its own artifacts — the caches change where the
  * work happens, never what is computed. The tri-scale DuckDB oracles
  * gate the same property end-to-end; this spec pins it directly at
  * unit granularity so a cache-keying or release bug fails here first,
  * with a readable diff, instead of as a hash mismatch in the driver.
  */
class SessionArtifactSpec extends SparkTestBase {

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case null => "∅"
      case x => x
    }).toSet

  private def docs = graft.Tables.fanOut(graft.Tables.documents(spark, sfDir))
  private def rawDocs = graft.Tables.documents(spark, sfDir)

  test("pagerank via sessionEdges equals the standalone Df form") {
    val cached = Graph.pagerank(spark, sfDir)
    val standalone = Graph.pagerankDf(docs)
    assert(rows(cached) == rows(standalone))
  }

  test("link components via sessionUndirected equal the standalone Df form") {
    assert(rows(Graph.linkComponents(spark, sfDir)) ==
      rows(Graph.linkComponentsDf(docs)))
  }

  test("SCC via the session label cache equals the standalone Df form") {
    assert(rows(Graph.linkScc(spark, sfDir)) == rows(Graph.linkSccDf(docs)))
  }

  test("transitivity and clustering coefficient via the shared triangle pair equal Df forms") {
    assert(rows(Graph.graphTransitivity(spark, sfDir)) ==
      rows(Graph.graphTransitivityDf(docs)))
    assert(rows(Graph.clusteringCoefficient(spark, sfDir)) ==
      rows(Graph.clusteringCoefficientDf(docs)))
  }

  test("crawl depth and reciprocity via sessionEdges equal Df forms") {
    import org.apache.spark.sql.functions._
    assert(rows(Graph.crawlDepth(spark, sfDir)) ==
      rows(Graph.crawlDepthDf(docs, col("source") === lit("src0"))))
    assert(rows(Graph.graphReciprocity(spark, sfDir)) ==
      rows(Graph.graphReciprocityDf(docs)))
  }

  test("KN and WB scoring via the session LM blocks equal the Df forms") {
    val wide = TextAnalysis.chooseWideKeys(rawDocs)
    assert(rows(TextAnalysis.knLogProb(spark, sfDir)) ==
      rows(TextAnalysis.knLogProbDf(rawDocs, wideKeys = wide)))
    assert(rows(TextAnalysis.wbLogProb(spark, sfDir)) ==
      rows(TextAnalysis.wbLogProbDf(rawDocs, wide)))
  }

  test("bigram scorer and collocations via the shared count table equal the Df forms") {
    assert(rows(TextAnalysis.bigramLogProb(spark, sfDir)) ==
      rows(TextAnalysis.bigramLogProbDf(rawDocs)))
    assert(rows(TextAnalysis.topCollocations(spark, sfDir)) ==
      rows(TextAnalysis.topCollocationsDf(rawDocs)))
  }

  test("semantic dedup drop lists via the session fit caches equal standalone fits") {
    // the r15 share: the registered wrappers take the derived-k cells
    // fit (and the PQ raw codebooks) from the session caches; both
    // fits are deterministic, so the drop lists must be IDENTICAL to
    // a standalone refit — the fitKey=None path planted-fixture tests
    // exercise
    val emb = graft.Tables.embeddings(spark, sfDir)
    assert(rows(Similarity.semanticDedupDropList(emb,
        fitKey = Some((spark, sfDir)))) ==
      rows(Similarity.semanticDedupDropList(emb)))
    assert(rows(Similarity.semanticDedupPqDropList(emb,
        fitKey = Some((spark, sfDir)))) ==
      rows(Similarity.semanticDedupPqDropList(emb)))
  }

  test("retrieval session frames equal the standalone Df forms") {
    // r16: the registered bound-table/pruned evaluators ride the
    // pinned contribution + block-max artifacts
    assert(rows(Search.bm25TermBounds(spark, sfDir)) ==
      rows(Search.bm25TermBoundsDf(docs)))
    assert(rows(Search.bm25MaxScoreTopK(spark, sfDir)) ==
      rows(Search.bm25MaxScoreTopKDf(docs)))
    assert(rows(Search.bm25BlockMaxBounds(spark, sfDir)) ==
      rows(Search.bm25BlockMaxBoundsDf(docs)))
    assert(rows(Search.bm25BlockMaxTopK(spark, sfDir)) ==
      rows(Search.bm25BlockMaxTopKDf(docs)))
    assert(rows(Search.queryLikelihoodTopK(spark, sfDir)) ==
      rows(Search.queryLikelihoodTopKDf(docs)))
    // r16 amendment: the registered section family (ranking AND the
    // winners-only payload) rides the session section-chunks artifact
    assert(rows(Search.sectionBm25TopK(spark, sfDir)) ==
      rows(Search.sectionBm25TopKDf(docs)))
    assert(rows(Search.sectionDedup(spark, sfDir)) ==
      rows(Search.sectionDedupDf(docs)))
    // r16 amendment: hard negatives + eval audit ride the session
    // contribution frame
    assert(rows(Search.hardNegatives(spark, sfDir)) ==
      rows(Search.hardNegativesDf(docs)))
    assert(rows(Search.retrievalEvalAudit(spark, sfDir)) ==
      rows(Search.retrievalEvalAuditDf(docs)))
  }

  test("clearing all session caches rebuilds bit-identical artifacts (cold-bench contract)") {
    // SessionCaches.clearAll between two builds must be invisible in
    // results: every artifact is deterministic, so the cold bench's
    // per-query clears can only change WHERE time is spent
    val before = Seq(
      rows(Graph.pagerank(spark, sfDir)),
      rows(Search.bm25BlockMaxTopK(spark, sfDir)),
      rows(TextAnalysis.bigramLogProb(spark, sfDir)))
    graft.SessionCaches.clearAll(spark)
    val after = Seq(
      rows(Graph.pagerank(spark, sfDir)),
      rows(Search.bm25BlockMaxTopK(spark, sfDir)),
      rows(TextAnalysis.bigramLogProb(spark, sfDir)))
    assert(before == after, "clearAll must be result-invisible")
    // regression: the block-max BOUNDS consumer as the FIRST build in
    // a cold session once hit a recursive computeIfAbsent (its
    // artifact derives from the contribution artifact in the same
    // map) — rebuild it first-thing after a clear
    graft.SessionCaches.clearAll(spark)
    assert(rows(Search.bm25BlockMaxBounds(spark, sfDir)) ==
      rows(Search.bm25BlockMaxBoundsDf(docs)))
  }

  test("trained subword tables: session cache hit is bit-identical to a retrain (r19)") {
    // both trainers are deterministic functions of (corpus, params), so
    // cached-vs-cleared results must match bit for bit — the trainer
    // caches joined the session-artifact program in r19
    val cached = (rows(TextAnalysis.unigramVocab(spark, sfDir)),
      rows(TextAnalysis.bpeMerges(spark, sfDir)),
      rows(TextAnalysis.tokenizerBakeoff(spark, sfDir)))
    graft.SessionCaches.clearAll(spark)
    val retrained = (rows(TextAnalysis.unigramVocab(spark, sfDir)),
      rows(TextAnalysis.bpeMerges(spark, sfDir)),
      rows(TextAnalysis.tokenizerBakeoff(spark, sfDir)))
    assert(cached == retrained, "trainer cache must be result-invisible")
  }
}
