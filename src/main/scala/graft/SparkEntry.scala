package graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{asc_nulls_first, col}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the §7 extension set)
  * has an entry in `queries`; those expressible in ANSI SQL have a DuckDB
  * oracle in `oracleSql` with IDENTICAL output column names (the driver
  * sorts columns by name before hashing).
  *
  * Library operators return UNSORTED DataFrames — a global presentation
  * sort is protocol overhead nobody should pay at 100 TB. The driver's
  * hash compare, however, needs a deterministic row order, so this
  * registry (and only it) appends each query's output orderBy. Queries
  * whose ordering IS the semantics (top-k: q_topk, e_knn_brute,
  * d_token_freq) are registered bare.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multiway star join: revenue per region (broadcast dims, single shuffle).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinMultiway(spark, "/root/testdata/sf0.001")

  private type Q = (SparkSession, String) => DataFrame
  /** Protocol adapter: append the deterministic presentation sort the
    * driver's row-order-sensitive hash needs. */
  private def srt(fn: Q, keys: Column*): Q = (s, d) => fn(s, d).orderBy(keys: _*)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — reference surface (hive.py Q1-Q4 over events) —
    "q1_time_filter" -> srt(ReferenceQueries.q1TimeFilter _, col("event_id")),
    "q2_hourly_avg"  -> srt(ReferenceQueries.q2HourlyAvg _, col("hour_bucket")),
    "q3_union_cube"  -> srt(ReferenceQueries.q3UnionCube _,
      asc_nulls_first("room"), asc_nulls_first("hour_bucket")),
    "q4_join_aggs"   -> srt(ReferenceQueries.q4JoinAggs _, col("hour_bucket")),
    // — generalized relational surface (SURVEY.md §7.2 step 6) —
    "q_agg_pricing"     -> srt(Relational.aggPricing _, col("l_returnflag"), col("l_linestatus")),
    "q_filter_range"    -> srt(Relational.filterRange _, col("l_orderkey"), col("l_linenumber")),
    "q_join_inner"      -> srt(Relational.joinInner _, col("o_orderkey")),
    "q_join_left"       -> srt(Relational.joinLeft _,
      asc_nulls_first("c_custkey"), asc_nulls_first("o_orderkey")),
    "q_join_semi"       -> srt(Relational.joinSemi _, col("c_custkey")),
    "q_join_anti"       -> srt(Relational.joinAnti _, col("c_custkey")),
    "q_join_right"      -> srt(Relational.joinRight _,
      asc_nulls_first("c_custkey"), asc_nulls_first("o_orderkey")),
    "q_cross_join"      -> srt(Relational.crossJoin _, col("r_name"), col("n_name")),
    "q_join_full"       -> srt(Relational.joinFull _, asc_nulls_first("nationkey")),
    "q_join_multiway"   -> srt(Relational.joinMultiway _, col("r_name")),
    "q_union_all"       -> srt(Relational.unionAll _, col("src"), col("nationkey"), col("name")),
    "q_union_distinct"  -> srt(Relational.unionDistinct _, col("nationkey")),
    "q_intersect"       -> srt(Relational.intersectKeys _, col("nationkey")),
    "q_except"          -> srt(Relational.exceptKeys _, col("nationkey")),
    "q_intersect_all"   -> srt(Relational.intersectAllKeys _, col("nationkey")),
    "q_except_all"      -> srt(Relational.exceptAllKeys _, col("nationkey")),
    "q_distinct"        -> srt(Relational.distinctOp _, col("c_mktsegment"), col("c_nationkey")),
    "q_topk"            -> (Relational.topK _),
    "q_window_rank"     -> srt(Relational.windowRank _, col("o_custkey"), col("rn")),
    "q_window_running"  -> srt(Relational.windowRunning _, col("o_custkey"), col("o_orderkey")),
    "q_window_lag"      -> srt(Relational.windowLag _,
      asc_nulls_first("o_custkey"), asc_nulls_first("o_orderkey")),
    "q_window_rankings" -> srt(Relational.windowRankings _,
      asc_nulls_first("o_custkey"), asc_nulls_first("o_orderkey")),
    "q_array_funcs"     -> srt(Relational.arrayFuncs _, col("doc_id")),
    "q_explode"         -> srt(Relational.explodeTokens _, col("doc_id"), col("pos")),
    "q_sessionize"      -> srt(Relational.sessionize _, col("user_id"), col("session_id")),
    "q_collect_agg"     -> srt(Relational.collectAgg _, col("r_name")),
    "q_window_firstlast" -> srt(Relational.windowFirstLast _, col("o_custkey"), col("o_orderkey")),
    "q_window_range"    -> srt(Relational.windowRangeFrame _, col("o_custkey"), col("o_orderkey")),
    "q_window_pct"      -> srt(Relational.windowPercentiles _, col("o_custkey"), col("o_orderkey")),
    "q_rollup"          -> srt(Relational.rollupOp _,
      asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
    "q_grouping_sets"   -> srt(Relational.groupingSetsOp _,
      asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
    "q_having"          -> srt(Relational.havingOp _, col("o_custkey")),
    "q_case_when"       -> srt(Relational.caseWhen _, col("bucket")),
    "q_string_funcs"    -> srt(Relational.stringFuncs _, col("c_custkey")),
    "q_like_filter"     -> srt(Relational.likeFilter _, col("p_partkey")),
    "q_date_funcs"      -> srt(Relational.dateFuncs _, col("o_orderkey")),
    "q_math_funcs"      -> srt(Relational.mathFuncs _, col("l_orderkey"), col("l_linenumber")),
    "q_json_extract"    -> srt(Relational.jsonExtract _, col("event_type")),
    "q_count_distinct"  -> srt(Relational.countDistinctOp _, col("event_type")),
    "q_approx_distinct" -> srt(Relational.approxDistinct _, col("event_type")),
    "q_approx_pctile"   -> srt(Relational.approxPercentileOp _, col("l_returnflag")),
    "q_scalar_subquery" -> srt(Relational.scalarSubquery _, col("o_orderkey")),
    "q_correlated_subq" -> srt(Relational.correlatedSubquery _, col("o_orderkey")),
    "q_stats_agg"       -> srt(Relational.statsAgg _, col("l_returnflag")),
    "q_throttle_dedup"  -> srt(Relational.throttleDedup _, col("event_id")),
    "q_pivot"           -> srt(Relational.pivotOp _, col("hour_bucket")),
    "q_sample_seeded"   -> srt(Relational.sampleSeeded _, col("l_orderkey"), col("l_linenumber")),
    "q_sample_hash"     -> srt(Relational.sampleHash _, col("l_orderkey"), col("l_linenumber")),
    "q_asof_join"       -> srt(Relational.asofJoin _, col("event_id")),
    "q_range_join"      -> srt(Relational.rangeJoin _, col("band")),
    "q_null_funcs"      -> srt(Relational.nullFuncs _, col("o_orderkey")),
    "q_lateral"         -> srt(Relational.lateralTopPerRegion _,
      col("r_name"), org.apache.spark.sql.functions.desc("acctbal"), col("c_name")),
    "q_struct_funcs"    -> srt(Relational.structFuncs _, col("o_orderkey")),
    "q_map_funcs"       -> srt(Relational.mapFuncs _, col("event_id")),
    // — LLM-data-pipeline extensions (SURVEY.md §7.2 step 8) —
    "d_text_stats"      -> srt(ext.TextAnalysis.textStats _, col("doc_id")),
    "d_lang_id"         -> srt(ext.TextAnalysis.langId _, col("doc_id")),
    "d_fingerprint"     -> srt(ext.TextAnalysis.fingerprint _, col("doc_id")),
    "d_token_freq"      -> (ext.TextAnalysis.tokenFreq _),
    "d_ngram_counts"    -> (ext.TextAnalysis.ngramCounts _),
    "d_quality_filter"  -> srt(ext.TextAnalysis.qualityFilter _, col("doc_id")),
    "d_dedup_exact"     -> srt(ext.Dedup.dedupExact _, col("keep_id")),
    "d_dedup_minhash"   -> srt(ext.Dedup.dedupMinhash _, col("doc_id")),
    "d_dedup_simhash"   -> srt(ext.Dedup.dedupSimhash _, col("doc_id")),
    "d_ngram_jaccard"   -> srt(ext.Dedup.ngramJaccard _, col("doc_a"), col("doc_b")),
    "d_dedup_groups"    -> srt(ext.Dedup.dedupGroups _, col("doc_id")),
    "d_contamination"   -> srt(ext.Dedup.contamination _, col("doc_id"), col("bench_id")),
    "e_knn_brute"       -> (ext.Similarity.knnBrute _),
    "e_knn_per_vec"     -> srt(ext.Similarity.knnPerVec _, col("q_id"), col("rank")),
    "e_emb_stats"       -> srt(ext.Similarity.embStats _, col("vec_id")),
    "e_centroids"       -> srt(ext.Similarity.centroids _, col("label"), col("dim")),
    "e_quantize"        -> srt(ext.Similarity.quantize _, col("vec_id"), col("dim")),
    "e_ann_lsh"         -> srt(ext.Similarity.annLsh _, col("vec_id")),
    "e_ann_ivf"         -> srt(ext.Similarity.annIvf _, col("q_id"), col("rank")),
    "e_cosine_dedup"    -> srt(ext.Similarity.cosineDedup _, col("vec_a"), col("vec_b")),
    "e_cosine_dedup_lsh" -> srt(ext.Similarity.cosineDedupLsh _, col("vec_a"), col("vec_b")),
    "m_payload_meta"    -> srt(ext.Multimodal.payloadMeta _, col("doc_id")),
    "m_frame_sample"    -> srt(ext.Multimodal.frameSample _, col("doc_id"), col("frame_idx")),
    "m_feature_extract" -> srt(ext.Multimodal.featureExtract _, col("doc_id"), col("bin")),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_time_filter" -> ReferenceQueries.q1Sql,
    "q2_hourly_avg"  -> ReferenceQueries.q2Sql,
    "q3_union_cube"  -> ReferenceQueries.q3Sql,
    "q4_join_aggs"   -> ReferenceQueries.q4Sql,
    "q_agg_pricing"     -> Relational.aggPricingSql,
    "q_filter_range"    -> Relational.filterRangeSql,
    "q_join_inner"      -> Relational.joinInnerSql,
    "q_join_left"       -> Relational.joinLeftSql,
    "q_join_semi"       -> Relational.joinSemiSql,
    "q_join_anti"       -> Relational.joinAntiSql,
    "q_join_right"      -> Relational.joinRightSql,
    "q_cross_join"      -> Relational.crossJoinSql,
    "q_join_full"       -> Relational.joinFullSql,
    "q_join_multiway"   -> Relational.joinMultiwaySql,
    "q_union_all"       -> Relational.unionAllSql,
    "q_union_distinct"  -> Relational.unionDistinctSql,
    "q_intersect"       -> Relational.intersectKeysSql,
    "q_except"          -> Relational.exceptKeysSql,
    "q_intersect_all"   -> Relational.intersectAllKeysSql,
    "q_except_all"      -> Relational.exceptAllKeysSql,
    "q_distinct"        -> Relational.distinctOpSql,
    "q_topk"            -> Relational.topKSql,
    "q_window_rank"     -> Relational.windowRankSql,
    "q_window_running"  -> Relational.windowRunningSql,
    "q_window_lag"      -> Relational.windowLagSql,
    "q_window_rankings" -> Relational.windowRankingsSql,
    "q_array_funcs"     -> Relational.arrayFuncsSql,
    "q_explode"         -> Relational.explodeTokensSql,
    "q_sessionize"      -> Relational.sessionizeSql,
    "q_collect_agg"     -> Relational.collectAggSql,
    "q_window_firstlast" -> Relational.windowFirstLastSql,
    "q_window_range"    -> Relational.windowRangeFrameSql,
    "q_window_pct"      -> Relational.windowPercentilesSql,
    "q_rollup"          -> Relational.rollupOpSql,
    "q_grouping_sets"   -> Relational.groupingSetsOpSql,
    "q_having"          -> Relational.havingOpSql,
    "q_case_when"       -> Relational.caseWhenSql,
    "q_string_funcs"    -> Relational.stringFuncsSql,
    "q_like_filter"     -> Relational.likeFilterSql,
    "q_date_funcs"      -> Relational.dateFuncsSql,
    "q_math_funcs"      -> Relational.mathFuncsSql,
    "q_json_extract"    -> Relational.jsonExtractSql,
    "q_count_distinct"  -> Relational.countDistinctOpSql,
    "q_approx_distinct" -> Relational.approxDistinctSql,
    "q_approx_pctile"   -> Relational.approxPercentileOpSql,
    "q_sample_hash"     -> Relational.sampleHashSql,
    "q_asof_join"       -> Relational.asofJoinSql,
    "q_range_join"      -> Relational.rangeJoinSql,
    "q_null_funcs"      -> Relational.nullFuncsSql,
    "q_lateral"         -> Relational.lateralTopPerRegionSql,
    "q_struct_funcs"    -> Relational.structFuncsSql,
    "q_map_funcs"       -> Relational.mapFuncsSql,
    "q_scalar_subquery" -> Relational.scalarSubquerySql,
    "q_correlated_subq" -> Relational.correlatedSubquerySql,
    "q_stats_agg"       -> Relational.statsAggSql,
    "q_throttle_dedup"  -> Relational.throttleDedupSql,
    "q_pivot"           -> Relational.pivotOpSql,
    "d_text_stats"      -> ext.TextAnalysis.textStatsSql,
    "d_lang_id"         -> ext.TextAnalysis.langIdSql,
    "d_fingerprint"     -> ext.TextAnalysis.fingerprintSql,
    "d_token_freq"      -> ext.TextAnalysis.tokenFreqSql,
    "d_ngram_counts"    -> ext.TextAnalysis.ngramCountsSql,
    "d_quality_filter"  -> ext.TextAnalysis.qualityFilterSql,
    "d_dedup_exact"     -> ext.Dedup.dedupExactSql,
    "d_ngram_jaccard"   -> ext.Dedup.ngramJaccardSql,
    "d_dedup_groups"    -> ext.Dedup.dedupGroupsSql,
    "d_contamination"   -> ext.Dedup.contaminationSql,
    "e_knn_brute"       -> ext.Similarity.knnBruteSql,
    "e_knn_per_vec"     -> ext.Similarity.knnPerVecSql,
    "e_emb_stats"       -> ext.Similarity.embStatsSql,
    "e_centroids"       -> ext.Similarity.centroidsSql,
    "e_quantize"        -> ext.Similarity.quantizeSql,
    "e_ann_lsh"         -> ext.Similarity.annLshSql,
    "e_cosine_dedup"    -> ext.Similarity.cosineDedupSql,
    "e_cosine_dedup_lsh" -> ext.Similarity.cosineDedupLshSql,
    "m_payload_meta"    -> ext.Multimodal.payloadMetaSql,
    "m_frame_sample"    -> ext.Multimodal.frameSampleSql,
    "m_feature_extract" -> ext.Multimodal.featureExtractSql,
  )
}
