package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the §7 extension set)
  * has an entry in `queries`; those expressible in ANSI SQL have a DuckDB
  * oracle in `oracleSql` with IDENTICAL output column names (the driver
  * sorts columns by name before hashing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multiway star join: revenue per region (broadcast dims, single shuffle).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinMultiway(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — reference surface (hive.py Q1-Q4 over events) —
    "q1_time_filter" -> (ReferenceQueries.q1TimeFilter _),
    "q2_hourly_avg"  -> (ReferenceQueries.q2HourlyAvg _),
    "q3_union_cube"  -> (ReferenceQueries.q3UnionCube _),
    "q4_join_aggs"   -> (ReferenceQueries.q4JoinAggs _),
    // — generalized relational surface (SURVEY.md §7.2 step 6) —
    "q_agg_pricing"     -> (Relational.aggPricing _),
    "q_filter_range"    -> (Relational.filterRange _),
    "q_join_inner"      -> (Relational.joinInner _),
    "q_join_left"       -> (Relational.joinLeft _),
    "q_join_semi"       -> (Relational.joinSemi _),
    "q_join_anti"       -> (Relational.joinAnti _),
    "q_join_right"      -> (Relational.joinRight _),
    "q_cross_join"      -> (Relational.crossJoin _),
    "q_join_full"       -> (Relational.joinFull _),
    "q_join_multiway"   -> (Relational.joinMultiway _),
    "q_union_all"       -> (Relational.unionAll _),
    "q_union_distinct"  -> (Relational.unionDistinct _),
    "q_intersect"       -> (Relational.intersectKeys _),
    "q_except"          -> (Relational.exceptKeys _),
    "q_intersect_all"   -> (Relational.intersectAllKeys _),
    "q_except_all"      -> (Relational.exceptAllKeys _),
    "q_distinct"        -> (Relational.distinctOp _),
    "q_topk"            -> (Relational.topK _),
    "q_window_rank"     -> (Relational.windowRank _),
    "q_window_running"  -> (Relational.windowRunning _),
    "q_window_lag"      -> (Relational.windowLag _),
    "q_window_rankings" -> (Relational.windowRankings _),
    "q_array_funcs"     -> (Relational.arrayFuncs _),
    "q_explode"         -> (Relational.explodeTokens _),
    "q_sessionize"      -> (Relational.sessionize _),
    "q_collect_agg"     -> (Relational.collectAgg _),
    "q_window_firstlast" -> (Relational.windowFirstLast _),
    "q_rollup"          -> (Relational.rollupOp _),
    "q_grouping_sets"   -> (Relational.groupingSetsOp _),
    "q_having"          -> (Relational.havingOp _),
    "q_case_when"       -> (Relational.caseWhen _),
    "q_string_funcs"    -> (Relational.stringFuncs _),
    "q_like_filter"     -> (Relational.likeFilter _),
    "q_date_funcs"      -> (Relational.dateFuncs _),
    "q_math_funcs"      -> (Relational.mathFuncs _),
    "q_json_extract"    -> (Relational.jsonExtract _),
    "q_count_distinct"  -> (Relational.countDistinctOp _),
    "q_approx_distinct" -> (Relational.approxDistinct _),
    "q_scalar_subquery" -> (Relational.scalarSubquery _),
    "q_correlated_subq" -> (Relational.correlatedSubquery _),
    "q_stats_agg"       -> (Relational.statsAgg _),
    "q_throttle_dedup"  -> (Relational.throttleDedup _),
    "q_pivot"           -> (Relational.pivotOp _),
    "q_sample_seeded"   -> (Relational.sampleSeeded _),
    // — LLM-data-pipeline extensions (SURVEY.md §7.2 step 8) —
    "d_text_stats"      -> (ext.TextAnalysis.textStats _),
    "d_lang_id"         -> (ext.TextAnalysis.langId _),
    "d_fingerprint"     -> (ext.TextAnalysis.fingerprint _),
    "d_token_freq"      -> (ext.TextAnalysis.tokenFreq _),
    "d_quality_filter"  -> (ext.TextAnalysis.qualityFilter _),
    "d_dedup_exact"     -> (ext.Dedup.dedupExact _),
    "d_dedup_minhash"   -> (ext.Dedup.dedupMinhash _),
    "d_dedup_simhash"   -> (ext.Dedup.dedupSimhash _),
    "d_ngram_jaccard"   -> (ext.Dedup.ngramJaccard _),
    "e_knn_brute"       -> (ext.Similarity.knnBrute _),
    "e_knn_per_vec"     -> (ext.Similarity.knnPerVec _),
    "e_emb_stats"       -> (ext.Similarity.embStats _),
    "e_ann_lsh"         -> (ext.Similarity.annLsh _),
    "e_ann_ivf"         -> (ext.Similarity.annIvf _),
    "e_cosine_dedup"    -> (ext.Similarity.cosineDedup _),
    "m_payload_meta"    -> (ext.Multimodal.payloadMeta _),
    "m_frame_sample"    -> (ext.Multimodal.frameSample _),
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
    "q_scalar_subquery" -> Relational.scalarSubquerySql,
    "q_correlated_subq" -> Relational.correlatedSubquerySql,
    "q_stats_agg"       -> Relational.statsAggSql,
    "q_throttle_dedup"  -> Relational.throttleDedupSql,
    "q_pivot"           -> Relational.pivotOpSql,
    "d_text_stats"      -> ext.TextAnalysis.textStatsSql,
    "d_lang_id"         -> ext.TextAnalysis.langIdSql,
    "d_fingerprint"     -> ext.TextAnalysis.fingerprintSql,
    "d_token_freq"      -> ext.TextAnalysis.tokenFreqSql,
    "d_quality_filter"  -> ext.TextAnalysis.qualityFilterSql,
    "d_dedup_exact"     -> ext.Dedup.dedupExactSql,
    "d_ngram_jaccard"   -> ext.Dedup.ngramJaccardSql,
    "e_knn_brute"       -> ext.Similarity.knnBruteSql,
    "e_knn_per_vec"     -> ext.Similarity.knnPerVecSql,
    "e_emb_stats"       -> ext.Similarity.embStatsSql,
    "e_cosine_dedup"    -> ext.Similarity.cosineDedupSql,
    "m_payload_meta"    -> ext.Multimodal.payloadMetaSql,
  )
}
