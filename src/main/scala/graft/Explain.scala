package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val dflt = Seq("ts_since","q1_pricing","q5_region_revenue","ann_topk","text_tfidf",
      "ts_gapfill","ts_moving_avg","pack_sequences","text_repetition",
      "q6_revenue_delta","q10_returned","q18_large_orders","agg_rollup",
      "text_contamination","text_logprob","dedup_incremental","ts_ewma",
      "pack_greedy","pipeline_filter","pii_redact","doc_chunks","ts_holt",
      "ts_rolling_median","ts_mad","ts_corr","ts_diff","user_transitions",
      "events_props_agg","user_daily_active","big_spenders_semi",
      "q4_priority_exists","q7_nation_volume","q8_market_share","q13_custdist",
      "q15_top_supplier","q17_small_quantity","q22_no_orders","text_entropy",
      "vocab_topk","sample_balance","embed_centroid","cluster_assign",
      "q19_disjunctive","events_near_join","user_path_topk","events_sliding",
      "ts_autocorr","ts_winsorize","basket_pairs","events_decile","agg_cube",
      "events_interval_join","ts_lttb","agg_approx_distinct","mm_pixels","mm_audio",
      "ts_seasonal","sample_temperature",
      // dedup_canonical is omitted (like dedup_components always was):
      // building its frame runs the iterative components computation
      // eagerly — real Spark jobs, not a plan dump. ann_ivf_indexed is
      // omitted for the same reason: its builder fits the quantizer and
      // WRITES the index before the probe plan exists; pass it as an
      // explicit arg to dump the probe-side plan anyway.
      "user_sessions","mm_meta","mm_gif_frames","mm_resize",
      "dedup_exact","dedup_cosine",
      "text_bm25","events_salted_join","stream_dedup_replay","agg_approx_quantile",
      "ts_m4","ts_crossings","agg_count_min","events_zorder",
      "graph_triangles","events_attribution","events_ab_mwu","text_phrase",
      "sample_domain_cap","ts_changepoint","graph_edge_support","ts_motif",
      "kv_snapshot_diff","user_transition_latency","ts_dtw",
      "text_collocations","kv_history_scd2","stream_cusum_replay",
      "embed_covariance","embed_pca_power","ts_nearest_join","graph_fof",
      "sample_bootstrap","events_ab_srm","graph_modularity",
      "ts_forecast_eval","ts_gap_stats","sample_epoch_shuffle","events_ab_ks")
    for (q <- (if (args.nonEmpty) args.toSeq else dflt)) {
      println(s"===== $q")
      println(SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString.take(2600))
    }
    spark.stop()
  }
}
