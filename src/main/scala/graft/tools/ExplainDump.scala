package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

import java.nio.file.{Files, Paths}

/** Regenerate EXPLAIN.md: formatted physical plans for the headline
  * queries, the evidence artifact behind SCALE.md's claims (filter
  * pushdown, column pruning, broadcast choices, top-k operator).
  *
  * Usage: `sbt "runMain graft.tools.ExplainDump"` (writes to repo
  * root; pass an output path to override).
  */
object ExplainDump {
  val headline: Seq[String] = Seq(
    "q01_pricing_summary", "q04_top_customers", "q05_segment_revenue",
    "q07_anti_join", "q09_window_rank", "q14_or_join_rewrite",
    "q15_multiway_join", "q25_rollup", "q26_asof_join", "q27_range_join",
    "q29_salted_join", "dd_minhash_agg_expr", "dd_simhash_native_expr",
    "dd_cosine_bucketed", "dd_jaccard_verified", "ann_brute_topk",
    "ann_ivf_topk", "ann_lsh_multiprobe", "ta_repetition", "pp_mixture",
    "ta_dup_ngrams", "ta_pii", "ta_bigram_lm", "dd_exact_substring",
    "dd_semantic", "ann_int8_topk",
    // dd_contamination_bloom is deliberately NOT dumped: its Filter
    // prints the whole constant sketch as a megabyte hex literal
    // (SCALE.md describes the plan shape instead)
    "pp_filter_e2e", "pp_temperature", "pp_curation_verdicts",
    "mm_decode", "dd_semantic_at_rest",
    "q39_topk_per_key", "q40_topk_rewrite", "q44_grouping_sets",
    "q45_unpivot", "ev_window", "ev_session_native",
    "ev_interval_join", "ev_interval_left", "ann_ivf_incremental",
    "ann_pq_topk", "ann_pq_ivf_partitioned", "pp_bm25_search",
    "dd_pagerank", "ev_funnel", "ev_user_features",
    // round 11: the at-rest/incremental probes — the plans to read
    // for PartitionFilters on term_bucket / gram_bucket / cent_id
    "pp_bm25_at_rest", "pp_bm25_incremental", "pp_bm25_updated",
    "dd_contamination_at_rest", "pp_hybrid_at_rest",
    "ann_ivf_compacted", "ann_ivf_refreshed",
    // round-11 continuation: two-stage refine (both layout scans must
    // show cent_id PartitionFilters), sketch-prefiltered heavy
    // hitters, BPE, shard manifest
    "ann_pq_refined", "ann_pq_ivf_refined", "ta_heavy_hitters",
    "pp_bpe_tokenize", "pp_shard_manifest", "pp_shard_updated",
    "ann_binary_topk", "ann_binary_partitioned", "ann_mrl_eval",
    "pp_span_corruption", "pp_hard_negatives_at_rest",
    "pp_curate_shard_e2e",
    // round 12: the production-vocab BPE forms, the span-index scrub
    // family (the at-rest plan must show NO word_ngrams/split — reads
    // the persisted stores only), survivor selection, drift monitors
    "pp_bpe_train_fast", "pp_bpe_apply_fast", "pp_bpe_tokenize_fast",
    "dd_exact_substring_at_rest", "dd_exact_substring_incremental",
    "dd_keep_best", "pp_drift_psi", "pp_drift_incremental",
    "pp_embedding_drift", "ev_funnel_sparse",
    // round 13: the NB sufficient-statistics store (the at-rest plan
    // must read folded counts, never re-tokenize the train split) and
    // the unigram tokenizer family (broadcast-model scan-local
    // segmentation — no joins growing with the vocabulary)
    "pp_nb_model", "pp_nb_model_at_rest", "pp_nb_updated",
    "pp_nb_classify_at_rest", "pp_unigram_train", "pp_unigram_apply",
    "pp_unigram_tokenize",
    // round 17 (verdict #2): every gate that cost >= 1 s noop-basis
    // in bench_r16_close.json is dumped, so plan audits read plans,
    // not source — the LM chain family, the re-based expression-heavy
    // outliers (langid, gopher, percentile contracts), and the
    // round-16/17 curation gates with their at-rest twins
    "gr_triangles", "ta_langid_nb", "ta_langid_nb_at_rest",
    "pp_filter_ppl_e2e",
    "ta_ngram_lm_kn5", "ta_ngram_lm_kn5_bos", "ta_ngram_lm_kn5_at_rest",
    "ta_ngram_lm_kn5_model_at_rest", "ta_ngram_lm_kn5_pruned",
    "ta_ngram_lm_mkn5", "ta_ngram_lm_mkn5_at_rest",
    "ta_ngram_lm_kn3", "ta_ngram_lm_kn3_at_rest", "ta_ngram_lm_kn",
    "ta_ngram_lm_sb", "ta_ngram_lm_sb_at_rest", "ta_ngram_lm_smoothed",
    "ta_ppl_route", "ta_ppl_route_at_rest", "ta_ppl_tertiles_approx",
    "ta_ppl_tertiles_prod", "ta_ppl_lang_buckets",
    "dd_exact_substring_compacted", "dd_contamination_incremental",
    "dd_semantic_incremental", "dd_triplets_at_rest",
    "pp_cdc_dedup", "pp_cdc_incremental", "pp_cdc_at_rest",
    "pp_chunk_cdc", "pp_hybrid_search", "pp_semdedup_at_rest",
    "pp_semdedup_e2e", "pp_dsir_weights", "pp_hard_negatives",
    "ann_int8_ivf_incremental", "ann_int8_ivf_refreshed",
    "ann_int8_partitioned", "ann_int8_ivf_partitioned",
    "ann_pq_ivf_incremental", "ann_ivf_partitioned",
    "pp_maxmatch_apply", "pp_bpe_apply", "pp_bpe_train",
    "ta_gopher_rules", "ta_langid", "ta_top_bigram", "ta_normalize",
    "q28_hll_contract", "q30_percentiles", "q42_percentile_contract",
    // (xml_convert_2000docs is the conversion BENCH, not a registered
    // query — its ingest plan is pinned by IngestSpec/PlanSpec)
    "q21_recursive_native", "dq_checks",
    "pp_nb_classify", "pp_data_card",
    "pp_split_decontam", "pp_split_decontam_at_rest",
    "ta_boilerplate", "ta_boilerplate_at_rest", "ta_boilerplate_updated",
    // round-17 report tier (all ≥ 1 s at sf0.1)
    "pp_nb_eval", "pp_contamination_report", "ta_tokenizer_fertility",
    // round-18: the DSIR store apply + the streamed-ingest parity gate
    "pp_dsir_weights_at_rest", "xml_convert_streamed",
    // round-19: the DOULION sampled-triangle twin (read next to
    // gr_triangles — same orientation machinery on the md5-sampled
    // edge set) and the streamed-LSH pairs gate
    "gr_triangles_approx", "dd_minhash_incremental")

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("EXPLAIN.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val sb = new StringBuilder
    sb.append("# EXPLAIN — formatted physical plans (generated by ")
    sb.append("graft.tools.ExplainDump at sf0.001)\n\n")
    sb.append("Evidence for SCALE.md: look for `PushedFilters` / trimmed ")
    sb.append("`ReadSchema` on scans, `BroadcastHashJoin` on dimensions, ")
    sb.append("`TakeOrderedAndProject` for top-k, and partial/final ")
    sb.append("`HashAggregate` pairs.\n")
    headline.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(FormattedMode)
      sb.append(s"\n## $name\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
