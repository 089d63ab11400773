package graft

/** Plan-budget re-measurement tool: prints Exchange/broadcast counts
  * for the hot-query set so PlanSpec's snapshot budgets can be
  * re-pinned from measured reality after a deliberate plan change.
  * Run with `sbt "Test/runMain graft.PlanDump"`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.spark
    val dir = SparkSpec.Sf0001
    val hot = Seq("dedup_cluster_modularity", "graph_kcore",
      "dedup_keep_best", "layout_bucketed_join", "mm_phash_neardup",
      "text_bigram_logprob", "dedup_edit_distance",
      "assoc_rules_pairs", "text_pmi_bigrams", "text_diversity",
      "ql_create_cq", "sync_maintenance", "ann_lsh_multiprobe_recall",
      "ql_show_cqs", "stats_mad_outliers", "pipeline_dedup_report",
      // r15 incremental families + the write→CQ roundtrip
      "ann_ivf_inc_assign", "ann_ivf_inc_topk", "dedup_inc_sigmatch",
      "dedup_inc_marks_within", "dedup_inc_index_delta",
      "cq_write_backfill", "sync_write_upsert",
      // r16 persisted-index families (E2E entries: final plan is the
      // read-back or the pruned serve)
      "dedup_inc_pruned_marks", "dedup_inc_expired_marks",
      "dedup_semantic_inc", "ann_ivf_inc_pruned_topk",
      "ann_ivf_inc_multiprobe_topk", "ann_ivf_expired_topk",
      // r17 PQ/codes face: final plan is the IVFADC serve
      "ann_ivfpq_inc_topk",
      // r18 drift repair: final plan is the two-face serve union
      "ann_ivf_recluster_topk", "ann_ivf_split_topk")
    hot.foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect(): Unit
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val ex = "Exchange".r.findAllIn(p).size
      val rt = "Exchange rangepartitioning".r.findAllIn(p).size
      val bc = "BroadcastExchange".r.findAllIn(p).size
      println(s"PLANDUMP $q exchanges=$ex range=$rt broadcast=$bc")
    }
  }
}
