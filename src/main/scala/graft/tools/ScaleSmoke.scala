package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale-up smoke: synthesizes an sf~1 dataset from sf0.1 (fact
  * tables replicated with key offsets; dimensions kept — the realistic
  * growth shape) and times the heaviest queries at both scales. A query
  * whose time grows superlinearly (≳12× at 10× data at fixed
  * parallelism) has a scale bug regardless of its absolute cost.
  *
  * Replica hygiene: document text is passed through a per-replica
  * letter substitution and embeddings are cyclically rotated, so
  * replicas are NOT textual/vector near-duplicates of the originals —
  * otherwise every dedup query would see c copies per content and its
  * candidate-pair stage would grow O(c²) BY CONSTRUCTION of the data,
  * not by any engine defect. Join keys (orderkey) offset consistently
  * on both sides; per-user/per-doc densities stay constant.
  *
  * Usage: runMain graft.tools.ScaleSmoke [srcDir] [workDir] [replicas] [query...]
  * (trailing query names restrict the run to that subset — directed
  * probes of new operators without paying for the full sweep)
  */
object ScaleSmoke {

  private val heavyQueries = Seq(
    "q1_pricing_summary", "q3_shipping", "q5_local_supplier",
    "q_lineitem_cube", "q_percentiles", "q_approx_distincts",
    "q_tfidf_top_terms", "q_minhash_pairs", "q_simhash_near_dups",
    "q_neardup_clusters", "q_session_stats", "q_hot_terms_exact",
    "q_pii_redaction", "q_split_counts", "q_pack_stats",
    "q_repetition_stats", "q_resample_counts",
    "q_decontamination", "q_semantic_dedup",
    "q_bloom_decontamination", "q_bloom_semi_join",
    "q_stratified_sample", "q_unigram_logprob",
    "q_gopher_filters", "q_span_dedup", "q_winnow_span_dedup",
    "q_kmeans", "q_perplexity_buckets",
    "q_source_overlap", "q_zipf_slope", "q_cluster_prune", "q_curation_funnel",
    "q_quality_auc", "q_corpus_diff", "q_bigram_logprob", "q_top_collocations",
    "q_token_entropy",
    "q_backoff_logprob", "q_fivegram_logprob", "q_interp_logprob",
    "q_wb_logprob", "q_kn_logprob",
    "q_heaps_law", "q_quality_calibration",
    "q_entropy_rate", "q_roc_points", "q_semantic_dedup_pq", "q_winnow_stats",
    "q_dsir_weights", "q_mixture_execute", "q_vocab_coverage",
    "q_sem_decontamination" /* eval side fixed: work grows with corpus, not eval² */,
    "q_ivf_pq_topk" /* fixed query count: probe work grows with data, not queries² */,
    "q_ngram_jaccard" /* bounded kernel: must stay FLAT, not 10× */,
    "q_epoch_order", "q_shuffle_mix", "q_compression_ratio",
    "q_bpe_stats" /* fixed training sample: scoring grows with corpus vocab, not sample */,
    "q_dim_truncation" /* fixed query count, like q_ivf_pq_topk */,
    "q_kn_logprob_wide" /* wide keys: 2x key bytes, same plan — must track q_kn_logprob */,
    "q_ngram_containment_corpus" /* banded candidates: grows with true near-dups, not n² */,
    "q_ngram_containment_stratified" /* per-size-class banding: rows=1 layer emits cross-strata only */,
    "q_sq_ann_topk" /* IVF-pruned + bounded final: fixed query count */,
    "q_media_phash" /* narrow hashing map: linear */,
    "q_media_neardup_pairs" /* banded 16-bit-chunk self-join: grows with planted-dup mass */,
    "q_paragraph_dedup" /* one hash-keyed window, packed 16 B/paragraph rows */,
    "q_c4_line_filter" /* pure narrow map: must stay linear at scan speed */,
    "q_url_dedup" /* one keyed exchange on canon_url, payload-independent */,
    "q_minhash_incremental" /* delta-vs-index keyed band join, never delta x base */,
    "q_knn_graph" /* all-docs top-k: nprobe x cellSize work per doc, linear total */,
    "q_quality_propagation" /* knn graph + id-keyed joins; no new pair term */,
    "q_boilerplate_cleaned" /* dictionary mining keyed on (source, line); doc side broadcast-only */,
    "q_semantic_outliers" /* id-keyed label join + dimsxsources agg; bounded top-k final */,
    "q_domain_cap" /* narrow scoring + bounded per-domain top-k; <= cap rows/domain cross the exchange */,
    "q_acquisition_funnel" /* one projection + canon-url window + dict mining; single-row final */,
    "q_token_budget_select" /* histogram window + 1-row broadcast threshold; two narrow passes */,
    "q_doc_chunks" /* pure narrow generate: must stay linear at scan speed */,
    "q_leakage_safe_splits" /* cluster rounds + two id-keyed joins; grows with near-dup mass */,
    "q_split_inheritance" /* delta-vs-index keyed probe + base cluster rounds; no delta x base term */,
    "q_cdc_chunks" /* pure narrow HOF chain: must stay linear at scan speed */,
    "q_curriculum_order" /* histogram->broadcast thresholds + 48-partition rank window */,
    "q_sketch_overlap" /* per-source HLL partials: KB per source cross the wire, |sources|^2 pair join */,
    "q_cdc_dedup" /* narrow CDC kernel + one md5-keyed aggregate; grows with shared-chunk mass */,
    "q_cdc_incremental" /* delta chunks probe the frozen index via one keyed join */,
    "q_unimax_execute" /* |languages|-row plan broadcast onto one corpus pass */,
    "q_filter_ensemble" /* one signal projection + content-hash window, the funnel's shape */,
    "q_ingest_gate" /* five frozen-artifact probes, all keyed; batch-proportional work */,
    "q_zorder_events" /* narrow bit math + one bucket groupBy; extents broadcast */,
    "q_layout_compare" /* three 64-group bucket aggregates over one scan lineage */,
    "q_substring_dedup" /* anchor stream linear in tokens; one keyed agg + semi-join + doc window */,
    "q_audio_neardup_pairs" /* keyed fingerprint inverted-index join; grows with planted-dup mass */,
    "q_pack_bucketed" /* narrow token count + (bucket, shard) windows; one keyed agg */,
    "q_graph_ann_topk" /* fixed query count: rounds x beam keyed probes of the kNN graph */,
    "q_substring_excised" /* anchor chain + doc-keyed cut/rejoin; grows with duplicated mass */,
    "q_substring_incremental" /* delta anchors semi-join the frozen base gram index */,
    "q_moore_lewis" /* two vocab-keyed LM chains + gram-keyed scoring; linear in tokens */,
    "q_filter_attribution" /* ensemble matrix + ONE stacked global aggregate */,
    "q_tokenizer_bakeoff" /* both subword trainers + two source-keyed rollups; grows with word types */)

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_sfx10")
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    // replica-hygiene bounds: the letter rotation k*2%26 has period 13
    // (replica 13 would be an exact text duplicate of replica 0) and the
    // embedding cyclic rotation degenerates once k reaches the vector
    // length (64 dims) — past either bound the "replicas are NOT
    // near-dups" property fails by construction and dedup-query ratios
    // would look superlinear for data reasons, not engine reasons.
    require(replicas >= 1 && replicas <= 13,
      s"replicas must be in [1, 13] to keep replica texts/vectors distinct, got $replicas")
    // the work dir is OVERWRITTEN — refuse the driver's read-only
    // dataset tree outright (r13 incident: a transposed-argument call
    // `ScaleSmoke <small-sf> /root/testdata/sf0.1 10 q_...` clobbered
    // the real sf0.1 with a 10x replication of sf0.01; the positional
    // workDir made the mistake one argument away)
    require(!java.nio.file.Paths.get(work).toAbsolutePath.normalize
        .startsWith("/root/testdata"),
      s"workDir $work is inside the read-only testdata tree — " +
        "ScaleSmoke OVERWRITES its workDir; use /tmp")
    val spark = graft.LocalSession.build()

    // resume guard: every table's _SUCCESS marker AND a matching replica
    // count (a crash mid-synthesis, or a previous run with a different
    // replica factor, must not be silently reused)
    val allTables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val marker = java.nio.file.Paths.get(s"$work/.replicas")
    val complete =
      allTables.forall(t => new java.io.File(s"$work/$t.parquet/_SUCCESS").exists()) &&
        java.nio.file.Files.exists(marker) &&
        java.nio.file.Files.readString(marker).trim == replicas.toString
    if (!complete) {
      println(s"[scale] building ${replicas}x dataset at $work from $src")
      synthesize(spark, src, work, replicas)
      java.nio.file.Files.createDirectories(marker.getParent)
      java.nio.file.Files.writeString(marker, replicas.toString)
    }

    graft.BenchKit.warmUp(spark, src)

    val subset = args.drop(3)
    val toRun = if (subset.isEmpty) heavyQueries else subset.toSeq
    println(f"${"query"}%-28s ${"sf0.1"}%8s ${"x" + replicas}%8s ${"ratio"}%7s")
    toRun.foreach { q =>
      val a = graft.BenchKit.best(spark, q, src)
      val b = graft.BenchKit.best(spark, q, work)
      println(f"$q%-28s $a%8.2f $b%8.2f ${b / a}%7.1f")
    }
    // decontamination's forced one-pass fallback (the oversized-eval
    // path) — not a registered query, but its scaling matters just as
    // much as the broadcast path's (full sweep only)
    if (subset.isEmpty) {
      def deconFallback(d: String) = () => graft.ext.Corpus
        .decontaminationStatsDf(graft.Tables.documents(spark, d),
          maxBroadcastEvalBytes = 0L)
      val fa = graft.BenchKit.bestDf(deconFallback(src))
      val fb = graft.BenchKit.bestDf(deconFallback(work))
      println(f"${"q_decontamination(1pass)"}%-28s $fa%8.2f $fb%8.2f ${fb / fa}%7.1f")
    }
    spark.stop()
  }

  /** Fact tables replicated with consistent key offsets; dims copied. */
  private def synthesize(spark: SparkSession, src: String, work: String,
                         replicas: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$work/$t.parquet")

    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => write(read(t), t))

    // offset bases: max key + 1 per table (events yields both its keys
    // in one scan)
    def offsetBase(t: String, c: String): Long =
      read(t).agg(max(col(c))).collect().head.getLong(0) + 1

    val mo = offsetBase("orders", "o_orderkey")
    val Array(me, mu) = read("events")
      .agg(max(col("event_id")), max(col("user_id"))).collect().head
      .toSeq.map(_.asInstanceOf[Long] + 1).toArray
    val md = offsetBase("documents", "doc_id")
    val mv = offsetBase("embeddings", "vec_id")

    def replicate(t: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(t)
      write((0 until replicas).map(k => f(base, k)).reduce(_ unionAll _), t)
    }

    replicate("orders") { (df, k) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(k * mo)) }
    replicate("lineitem") { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(k * mo)) }
    replicate("events") { (df, k) =>
      df.withColumn("event_id", col("event_id") + lit(k * me))
        .withColumn("user_id", col("user_id") + lit(k * mu)) }
    // per-replica letter substitution: replicas diverge in shingle space
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    replicate("documents") { (df, k) =>
      val rot = alpha.drop(k * 2 % 26) + alpha.take(k * 2 % 26)
      df.withColumn("doc_id", col("doc_id") + lit(k * md))
        .withColumn("text", translate(col("text"), alpha, rot)) }
    // cyclic rotation: same norm, decorrelated directions across replicas
    replicate("embeddings") { (df, k) =>
      df.withColumn("vec_id", col("vec_id") + lit(k * mv))
        .withColumn("embedding",
          if (k == 0) col("embedding")
          else concat(slice(col("embedding"), k + 1, 10000),
            slice(col("embedding"), 1, k))) }
  }
}
