package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered in
  * [[queries]]; each SQL-expressible one has a matching DuckDB oracle in
  * [[oracleSql]] with IDENTICAL output column names (the driver compare
  * sorts columns by name before hashing). Non-SQL-expressible ops
  * (rand-sampling, LSH, ML fits, streaming state) appear in `queries`
  * only → rows-only check.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing"    -> (Relational.q1Pricing _),
    "q2_projfilter" -> (Relational.q2ProjFilter _),
    "q3_distinct"   -> (Relational.q3Distinct _),
    "q4_rollup"     -> (Relational.q4Rollup _),
    "q5_cube"       -> (Relational.q5Cube _),
    "q6_topk"       -> (Relational.q6TopK _),
    "q7_setops"     -> (Relational.q7SetOps _),
    "q8_string"     -> (Relational.q8ScalarString _),
    "q9_date"       -> (Relational.q9ScalarDate _),
    "q10_json"      -> (Relational.q10Json _),
    "q11_math"      -> (Relational.q11Math _),
    "q12_stats"     -> (Relational.q12Stats _),
    "q13_groupmin"  -> (Relational.q13GroupMin _),
    "q14_join_star" -> (Joins.q14JoinStar _),
    "q15_outer"     -> (Joins.q15Outer _),
    "q16_semi_anti" -> (Joins.q16SemiAnti _),
    "q17_band_join" -> (Joins.q17BandJoin _),
    "q18_asof"      -> (Joins.q18AsOf _),
    "q19_window"    -> (Windows.q19Window _),
    "q20_topk_group" -> (Windows.q20TopKGroup _),
    "q21_dedup_exact" -> (Text.q21DedupExact _),
    "q22_cosine_topk" -> (Similarity.q22CosineTopK _),
    "q23_quality"   -> (Text.q23Quality _),
    "q24_terms"     -> (Text.q24Terms _),
    "q25_neardup_minhash" -> (Similarity.q25NearDup _),
    "q26_ann_lsh"   -> (Similarity.q26AnnLsh _),
    "q27_fingerprint" -> (Text.q27Fingerprint _),
    "q28_hof"       -> (Arrays.q28Hof _),
    "q29_timewindow" -> (Streaming.q29TimeWindow _),
    "q30_session"   -> (Streaming.q30Session _),
    "q31_sparsity"  -> (Arrays.q31Sparsity _),
    "q32_ml_metrics" -> (graft.ml.EmnistPipeline.q32MlMetrics _),
    "q33_strat_sample" -> (graft.util.Sampling.q33StratSample _),
    "q34_meanvec"   -> (VectorAggs.q34MeanVec _),
    "q35_pca_variance" -> (graft.ml.EmnistPipeline.q35PcaVariance _),
    "q36_approx_distinct" -> (Relational.q36ApproxDistinct _),
    "q37_from_json" -> (Relational.q37FromJson _),
    "q38_simhash"   -> (Text.q38Simhash _),
    "q39_ngram_jaccard" -> (Similarity.q39NgramJaccard _),
    "q40_embed_neardup" -> (Similarity.q40EmbeddingNearDup _),
    "q41_sliding"   -> (Streaming.q41Sliding _),
    "q42_percentiles" -> (Relational.q42Percentiles _),
    "q43_dedup_clusters" -> (Similarity.q43DedupClusters _),
    "q44_interval_join" -> (Streaming.q44IntervalJoin _),
    "q45_ann_ivf"   -> (Similarity.q45AnnIvf _),
    "q46_token_counts" -> (Text.q46TokenCounts _),
    "q47_winnow_fingerprint" -> (Text.q47WinnowFingerprint _),
    "q48_group_percentiles" -> (Relational.q48GroupPercentiles _),
    "q49_langid"    -> (Text.q49LangId _),
    "q50_salted_agg" -> (graft.util.Skew.q50SaltedAgg _),
    "q51_salted_join" -> (graft.util.Skew.q51SaltedJoin _),
    "q52_multimodal_join" -> (Multimodal.q52MultimodalJoin _),
    "q53_bloom_join" -> (Joins.q53BloomJoin _),
    "q54_approx_quantiles" -> (Relational.q54ApproxQuantiles _),
    "q55_dedup_corpus" -> (Similarity.q55DedupCorpus _),
    "q56_repetition" -> (Quality.q56Repetition _),
    "q57_pivot"     -> (Relational.q57Pivot _),
    "q58_unpivot"   -> (Relational.q58Unpivot _),
    "q59_shared_shingles" -> (Quality.q59SharedShingles _),
    "q60_bow_dedup" -> (Quality.q60BowDedup _),
    "q61_grouping_sets" -> (Relational.q61GroupingSets _),
    "q62_tfidf_terms" -> (Text.q62TfidfTerms _),
    "q63_normalize_text" -> (Relational.q63NormalizeText _),
    "q64_source_overlap" -> (Similarity.q64SourceOverlap _),
    "q65_window_dist" -> (Windows.q65WindowDist _),
    "q66_pii_redact" -> (Text.q66PiiRedact _),
    "q67_binned_band_join" -> (Joins.q67BinnedBandJoin _),
    "q68_gapfill"   -> (TimeSeries.q68GapFill _),
    "q69_histogram" -> (Relational.q69Histogram _),
    "q70_trailing_window" -> (TimeSeries.q70TrailingWindow _),
    "q71_auto_band_join" -> (Joins.q71AutoBandJoin _),
    "q72_int_band_join" -> (Joins.q72IntBandJoin _),
    "q73_parquet_band_join" -> (Joins.q73ParquetBandJoin _),
    "q77_time_band_join" -> (Joins.q77TimeBandJoin _),
    "q74_hll_bounds" -> (Relational.q74HllBounds _),
    "q75_gk_bounds" -> (Relational.q75GkBounds _),
    "q76_ann_recall" -> (Similarity.q76AnnRecall _),
    "q78_heavy_hitters" -> (Sketches.q78HeavyHitters _),
    "q79_zorder_cells" -> (graft.util.Layout.q79ZorderCells _),
    "q80_grouped_band_join" -> (Joins.q80GroupedBandJoin _),
    "q81_upsert" -> (Mutations.q81Upsert _),
    "q82_scd2" -> (Mutations.q82Scd2 _),
    "q83_weighted_sample" -> (graft.util.Sampling.q83WeightedSample _),
    "q84_fuzzy_join" -> (Joins.q84FuzzyJoin _),
    "q85_fuzzy_corpus_join" -> (Joins.q85FuzzyCorpusJoin _),
    "q86_weighted_group_sample" -> (graft.util.Sampling.q86WeightedGroupSample _),
    "q87_large_band_join" -> (Joins.q87LargeBandJoin _),
    "q88_knn_recall" -> (Similarity.q88KnnRecall _),
    "q89_semantic_dedup" -> (Similarity.q89SemanticDedup _),
    "q90_compact" -> (graft.util.Layout.q90Compact _),
    "q91_tpe_search" -> (graft.ml.Tpe.q91TpeSearch _),
    "q92_sequence_pack" -> (Packing.q92SequencePack _),
    "q93_hash_split" -> (Packing.q93HashSplit _),
    "q94_chunk_docs" -> (Packing.q94ChunkDocs _),
    "q95_cdc_versioned" -> (Mutations.q95CdcVersioned _),
    "q96_langid_accuracy" -> (Text.q96LangIdAccuracy _),
    "q97_softmax_gbt" -> (graft.ml.SoftmaxGbt.q97SoftmaxGbt _),
    "q98_clustered_recall" -> (Similarity.q98ClusteredRecall _),
    "q99_pq_recall" -> (Similarity.q99PqRecall _),
    "q100_substring_dedup" -> (SpanDedup.q100SubstringDedup _),
    "q101_bucketed_join" -> (graft.util.Bucketing.q101BucketedJoin _),
    "q102_remove_spans" -> (SpanDedup.q102RemoveSpans _),
    "q103_minhash_recall" -> (Similarity.q103MinhashRecall _),
    "q104_winnowed_spans" -> (SpanDedup.q104WinnowedSpans _),
    "q105_hist_gbt" -> (graft.ml.HistGbt.q105HistGbt _),
    "q106_cms_bounds" -> (Sketches.q106CmsBounds _),
    "q107_suffix_dedup" -> (SuffixDedup.q107SuffixDedup _),
    "q108_curation" -> (Quality.q108Curation _),
    "q109_remove_winnowed" -> (SpanDedup.q109RemoveWinnowed _),
    "q110_remove_exact" -> (SuffixDedup.q110RemoveExact _),
    "q111_hist_gbt_noisy" -> (graft.ml.HistGbt.q111HistGbtNoisy _),
    "q112_decontaminate" -> (SpanDedup.q112Decontaminate _),
    "q113_lm_perplexity" -> (Quality.q113LmPerplexity _),
    "q114_admission" -> (Quality.q114Admission _),
    "q115_remove_contaminated" -> (SpanDedup.q115RemoveContaminated _),
    "q116_shipped_corpus" -> (Quality.q116ShippedCorpus _),
    "q117_shipped_corpus_neardup" -> (Quality.q117ShippedCorpusNearDup _),
    "q118_bpe_pack" -> (Bpe.q118BpePack _),
    "q119_quality_gate" -> (Quality.q119QualityGate _),
    "q120_ccnet_buckets" -> (Quality.q120CcnetBuckets _),
    "q121_corpus_mixture" -> (graft.util.Sampling.q121CorpusMixture _),
    "q122_gopher_gate" -> (Quality.q122GopherGate _),
    "q123_dsir_weights" -> (Quality.q123DsirWeights _),
    "q124_sq_recall" -> (Similarity.q124SqRecall _),
    "q125_admission_v2" -> (Quality.q125AdmissionV2 _),
    "q126_hard_negatives" -> (Similarity.q126HardNegatives _),
    "q127_hard_negative_recall" -> (Similarity.q127HardNegativeRecall _),
    "q128_bpe_fertility" -> (Bpe.q128BpeFertility _),
    "q129_shipped_corpus_full" -> (Quality.q129ShippedCorpusFull _),
    "q130_semantic_decontam" -> (Similarity.q130SemanticDecontam _),
    "q131_temperature_mixture" -> (graft.util.Sampling.q131TemperatureMixture _),
    "q132_tfidf_decontam" -> (Similarity.q132TfidfDecontam _),
    "q133_shard_manifest" -> (Packing.q133ShardManifest _),
    "q134_temperature_epochs" -> (graft.util.Sampling.q134TemperatureEpochs _),
    "q135_leakage_report" -> (SpanDedup.q135LeakageReport _),
    "q136_stupid_backoff" -> (Quality.q136StupidBackoff _),
    "q137_doremi_mixture" -> (Quality.q137DoremiMixture _),
    "q138_corpus_datasheet" -> (Quality.q138CorpusDatasheet _),
    "q139_lsh_plan" -> (Similarity.q139LshPlan _),
    "q140_leakage_split" -> (Packing.q140LeakageFreeSplit _),
    "q141_length_batches" -> (Packing.q141LengthBatches _),
    "q142_split_leakage" -> (Packing.q142SplitLeakage _),
    "q143_kneser_ney" -> (Quality.q143KneserNey _),
    "q144_c4_clean" -> (Quality.q144C4Clean _),
    "q145_clip_gate" -> (Multimodal.q145ClipGate _),
    "q146_epoch_shuffle" -> (Packing.q146EpochShuffle _),
    "q147_paragraph_dedup" -> (Quality.q147ParagraphDedup _),
    "q148_luhn_audit" -> (Text.q148LuhnAudit _),
    "q149_bitext_mine" -> (Similarity.q149BitextMine _),
    "q150_ccnet_c4_clean" -> (Quality.q150CcnetC4Clean _),
    "q151_deletion_blast" -> (Packing.q151DeletionBlast _),
    "q152_source_minhash" -> (Similarity.q152SourceMinhash _),
    "q153_repack_deleted" -> (Packing.q153RepackDeleted _),
    "q154_chunk_neighbors" -> (Similarity.q154ChunkNeighbors _),
    "q155_contrastive_pairs" -> (Similarity.q155ContrastivePairs _),
    "q156_quality_survivors" -> (Similarity.q156QualitySurvivors _),
    "q157_delta_dedup" -> (Similarity.q157DeltaDedup _),
    "q158_line_lm" -> (Quality.q158LineLm _),
    "q159_line_lm_clean" -> (Quality.q159LineLmClean _),
    "q160_curriculum" -> (Quality.q160Curriculum _),
    "q161_bitext_blocked" -> (Similarity.q161BitextBlockedParity _),
    "q162_soft_dedup" -> (Similarity.q162SoftDedup _),
    "q163_moore_lewis" -> (Quality.q163MooreLewis _),
    "q164_unimax" -> (graft.util.Sampling.q164Unimax _),
    "q165_budget_prune" -> (Quality.q165BudgetPrune _),
    "q166_dup_lines" -> (Quality.q166DupLines _),
    "q167_ngram_repetition" -> (Quality.q167NgramRepetition _),
    "q168_admission_v3" -> (Quality.q168AdmissionV3 _),
    "q169_phash_dedup" -> (Images.q169PhashDedup _),
    "q170_budgeted_corpus" -> ((s, d) => Quality.q170BudgetedCorpus(s, d)),
    "q171_unigram_tokenize" -> (Unigram.q171UnigramTokenize _),
    "q172_unigram_em_gate" -> (Unigram.q172UnigramEmGate _),
    "q173_unigram_em_tokenize" -> (Unigram.q173UnigramEmTokenize _),
    "q174_unigram_pack" -> (Unigram.q174UnigramPack _),
    "q175_unigram_delta_apply" -> (Unigram.q175UnigramDeltaApply _),
    "q176_video_neardup" -> (Multimodal.q176VideoNearDup _),
    "q177_url_curation" -> (Text.q177UrlCuration _),
    "q178_html_extract" -> (Text.q178HtmlExtract _),
    "q179_extract_clean" -> (Text.q179ExtractClean _),
    "q180_ccnet_lang_buckets" -> (Quality.q180CcnetLangBuckets _),
    "q181_example_spans" -> (Packing.q181ExampleSpans _),
    "q182_ccnet_norm_buckets" -> (Quality.q182CcnetNormBuckets _),
    "q183_robots_gate" -> (Text.q183RobotsGate _),
    "q184_site_boilerplate" -> (Quality.q184SiteBoilerplate _),
    "q185_crawl_head" -> (Text.q185CrawlHead _),
    "q186_ccnet_lang_delta" -> (Quality.q186CcnetLangDeltaApply _),
    "q187_bm25_topk" -> (Similarity.q187Bm25TopK _),
    "q188_bm25_delta_query" -> (Similarity.q188Bm25DeltaQuery _),
    "q189_bm25_append" -> (Similarity.q189Bm25Append _),
    "q190_hybrid_rrf" -> (Similarity.q190HybridRrf _),
    "q191_retrieval_eval" -> (Similarity.q191RetrievalEval _),
    "q192_hybrid_ivf_recall" -> (Similarity.q192HybridIvfRecall _),
    "q193_trigram_bm25" -> (Similarity.q193TrigramBm25 _),
    "q194_shard_integrity" -> (Packing.q194ShardIntegrity _),
    "q195_pack_by_lang" -> (Packing.q195PackByLang _),
    "q196_contamination_shards" -> (Packing.q196ContaminationShards _),
    "q197_accent_fold_buckets" -> (Quality.q197AccentFoldBuckets _),
    "q198_goss_efb_gbt" -> (graft.ml.HistGbt.q198GossEfbGbt _),
    "q199_hybrid_ivf_serve" -> (Similarity.q199HybridIvfServe _),
    "q200_watermark_audit" -> (Streaming.q200WatermarkAudit _),
    "q201_bm25_compact" -> (Similarity.q201Bm25Compact _),
    "q202_d4_prune" -> (Similarity.q202D4Prune _),
    "q203_script_profile" -> (Text.q203ScriptProfile _),
    "q204_nfkc_fold" -> (Quality.q204NfkcFoldSubset _),
    "q205_session_audit" -> (Streaming.q205SessionAudit _),
    "q206_delta_dedup" -> (Similarity.q206DeltaDedup _),
    "q207_ivf_serve_batch" -> (Similarity.q207IvfServeBatch _),
    "q208_data_constrained" -> (Quality.q208DataConstrained _),
    "q209_dedup_index_append" -> (Similarity.q209DedupIndexAppend _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  /** The span-dedup oracle family is COMPOSED from four shared SQL
    * fragments — two hit-derivation heads (hashed stride-1 grams;
    * winnowed selection) × two tails (emit merged spans; remove spans
    * and emit the cleaned corpus) — so each of q100/q102/q104/q107/
    * q109/q110 is one head+tail concatenation and a fix to the shared
    * islands merge or segment walk fixes every member at once.
    *
    * [[hashedHitCtesSql]]: 24-char gram explode (1-based substr on
    * both engines) + >=2-distinct-doc gate -> hits(doc_id, pos, e).
    */
  private val hashedHitCtesSql: String =
    """WITH g AS (
        |  SELECT doc_id, u.i AS pos, substr(text, CAST(u.i AS INT), 24) AS gram
        |  FROM documents,
        |       unnest(generate_series(1, CAST(length(text) AS BIGINT) - 23)) AS u(i)),
        |dup AS (SELECT gram FROM g GROUP BY gram
        |        HAVING count(DISTINCT doc_id) >= 2),
        |hits AS (SELECT doc_id, pos, pos + 23 AS e FROM g
        |         WHERE gram IN (SELECT gram FROM dup)),""".stripMargin

  /** Gaps-and-islands merge: hits -> grp (one row per surviving gram
    * hit, gid numbering maximal overlapping/adjacent runs per doc).
    */
  private val islandCtesSql: String =
    """isl AS (
        |  SELECT doc_id, pos, e,
        |    CASE WHEN pos > COALESCE(max(e) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
        |    THEN 1 ELSE 0 END AS brk
        |  FROM hits),
        |grp AS (SELECT doc_id, pos, e,
        |          SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
        |        FROM isl)""".stripMargin

  /** Emit-spans tail: grp -> the merged (span_start, span_end,
    * span_len) frame, the q100/q104/q107 result shape.
    */
  private val spanSelectSql: String =
    """SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(e) AS BIGINT) AS span_end,
        |  CAST(max(e) - min(pos) + 1 AS BIGINT) AS span_len
        |FROM grp GROUP BY doc_id, gid
        |ORDER BY doc_id, span_start""".stripMargin

  /** Removal tail: grp -> the cleaned corpus. A lag-window segment
    * walk rebuilds each document from the keep-ranges between its
    * spans, so every byte of every cleaned document is hash-checked.
    * `docsRel` names the relation being cleaned — the whole table for
    * the dedup heads, the training CTE for the containment head
    * (q115).
    */
  private def spanRemovalTailSql(docsRel: String = "documents"): String =
    s"""spans AS (SELECT doc_id, min(pos) AS span_start, max(e) AS span_end
        |          FROM grp GROUP BY doc_id, gid),
        |seg AS (
        |  SELECT doc_id, span_start, span_end,
        |    COALESCE(lag(span_end) OVER (PARTITION BY doc_id ORDER BY span_start),
        |             0) AS prev_end
        |  FROM spans),
        |cleaned AS (
        |  SELECT s.doc_id,
        |    string_agg(substr(d.text, CAST(s.prev_end + 1 AS INT),
        |        CAST(s.span_start - s.prev_end - 1 AS INT)),
        |      '' ORDER BY s.span_start)
        |      || substr(d.text, CAST(m.max_end + 1 AS INT)) AS clean
        |  FROM seg s
        |  JOIN $docsRel d ON d.doc_id = s.doc_id
        |  JOIN (SELECT doc_id, max(span_end) AS max_end FROM spans
        |        GROUP BY doc_id) m ON m.doc_id = s.doc_id
        |  GROUP BY s.doc_id, d.text, m.max_end)
        |SELECT d.doc_id, COALESCE(c.clean, d.text) AS clean_text,
        |  CAST(length(COALESCE(c.clean, d.text)) AS INT) AS clean_len
        |FROM $docsRel d LEFT JOIN cleaned c ON c.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin

  /** q100 span-derivation SQL, shared verbatim by q107: two
    * independent algorithms (hashed grams vs literal suffix-rank
    * classes), one contract, one oracle.
    */
  private val spanDedupOracleSql: String =
    s"$hashedHitCtesSql\n$islandCtesSql\n$spanSelectSql"

  /** q102 removal SQL, shared verbatim by q110: the hash path and the
    * suffix-exact path flag identical spans, so their cleaned corpora
    * must be byte-identical too.
    */
  private val spanRemovalOracleSql: String =
    s"$hashedHitCtesSql\n$islandCtesSql,\n${spanRemovalTailSql()}"

  /** Winnowed hit head (q104/q109): DuckDB re-derives the SAME
    * winnowed selection (base-131 poly hash mod 2^31-1 per 24-gram,
    * leftmost window-min of every 8-hash window — list_position
    * returns the first match, matching the kernel's strict-< scan);
    * the dup GATE then keys on the LITERAL gram at each selected
    * position (Spark: xxhash64 of the same substring — the q100
    * injective-hash idiom), NOT the 31-bit selection fingerprint,
    * whose ~n^2/2^32 collisions would flag never-duplicated text.
    */
  private val winnowedHitCtesSql: String =
    """WITH g AS (
        |  SELECT doc_id, list_transform(generate_series(1, length(text)-23),
        |    i -> list_reduce(
        |           list_transform(generate_series(0,23),
        |             j -> CAST(ascii(text[i+j:i+j]) AS BIGINT)),
        |           (acc, c) -> (acc * 131 + c) % 2147483647)) AS gh
        |  FROM documents WHERE length(text) >= 31),
        |sel AS (
        |  SELECT DISTINCT doc_id,
        |    CAST(u.j + list_position(gh[CAST(u.j AS INT):CAST(u.j + 7 AS INT)],
        |      list_min(gh[CAST(u.j AS INT):CAST(u.j + 7 AS INT)])) - 1
        |      AS BIGINT) AS pos
        |  FROM g, unnest(generate_series(1, CAST(len(gh) AS BIGINT) - 7)) AS u(j)),
        |selg AS (
        |  SELECT s.doc_id, s.pos,
        |    substr(d.text, CAST(s.pos AS INT), 24) AS gram
        |  FROM sel s JOIN documents d USING (doc_id)),
        |dup AS (SELECT gram FROM selg GROUP BY gram
        |        HAVING count(DISTINCT doc_id) >= 2),
        |hits AS (SELECT doc_id, pos, pos + 23 AS e FROM selg
        |         WHERE gram IN (SELECT gram FROM dup)),""".stripMargin

  /** Deterministic training/benchmark split shared by the containment
    * family (q112/q114/q115/q116): every 97th doc plays the eval set.
    * Fragments below end WITHOUT a trailing comma; compositions join
    * with ",\n" and are concatenated OUTSIDE any stripMargin (the
    * removal tail's `||` concat lines would lose a pipe to an outer
    * margin strip).
    */
  private val trainBenchSplitBodySql: String =
    """tr AS (SELECT * FROM documents WHERE doc_id % 97 <> 0),
        |be AS (SELECT * FROM documents WHERE doc_id % 97 = 0)""".stripMargin

  private val trainBenchSplitSql: String = "WITH " + trainBenchSplitBodySql

  /** Exact-Jaccard near-dup clustering CTEs (q43's green oracle body,
    * shared with q140): 3-shingle inverted index (df-capped), pairwise
    * Jaccard ≥ 0.1, undirected edges, recursive reachability →
    * cl(doc_id, cluster_id = min reachable id). Callers must open the
    * chain with `WITH RECURSIVE`.
    */
  private def jaccardClusterBodySql: String =
    """tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |sh0 AS (
        |  SELECT DISTINCT doc_id,
        |   unnest(list_transform(generate_series(1, len(t) - 2),
        |     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |  FROM tok),
        |ok AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 100),
        |sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN ok USING (s)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b
        |  FROM shared
        |  JOIN sizes na ON doc_a = na.doc_id
        |  JOIN sizes nb ON doc_b = nb.doc_id
        |  WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.1),
        |edges AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION SELECT doc_b AS a, doc_a AS b FROM pairs),
        |reach(node, peer) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.peer),
        |cl AS (SELECT node AS doc_id, min(peer) AS cluster_id
        |       FROM reach GROUP BY node)""".stripMargin

  /** Containment hit head: the benchmark gram set gating `srcRel`'s
    * gram stream -> hits(doc_id, pos, e). The q112 gate, shared by
    * every oracle that flags or excises benchmark text.
    */
  private def containmentHitCtesSql(srcRel: String): String =
    s"""bg AS (SELECT DISTINCT substr(text, CAST(u.i AS INT), 24) AS gram
        |       FROM be,
        |       unnest(generate_series(1, CAST(length(text) AS BIGINT) - 23)) AS u(i)),
        |g AS (SELECT doc_id, u.i AS pos, substr(text, CAST(u.i AS INT), 24) AS gram
        |      FROM $srcRel,
        |      unnest(generate_series(1, CAST(length(text) AS BIGINT) - 23)) AS u(i)),
        |hits AS (SELECT doc_id, pos, pos + 23 AS e FROM g
        |         WHERE gram IN (SELECT gram FROM bg))""".stripMargin

  /** LM model + per-bigram scoring CTEs (q113/q114/q116): add-one-
    * smoothed bigram model from every 3rd doc, log-probs for
    * `candsRel`'s bigram stream -> j(doc_id, logp).
    */
  private def lmCtesSql(candsRel: String): String =
    lmCtesPrefixedSql("", "(SELECT * FROM documents WHERE doc_id % 3 = 0)",
      candsRel)

  /** The same LM chain with every CTE name prefixed and the model's
    * REFERENCE relation a parameter — lets one oracle host two
    * independent LMs (the q163 Moore–Lewis shape: in-domain vs
    * general). Prefix "" + the q113 reference reproduces [[lmCtesSql]]
    * verbatim-semantically, so every existing LM oracle keeps its
    * green fragment.
    */
  private def lmCtesPrefixedSql(p: String, refRel: String,
      candsRel: String): String =
    s"""${p}rb AS (
        |  SELECT unnest(list_transform(generate_series(1, length(text) - 1),
        |    i -> lower(text)[i:i+1])) AS bigram
        |  FROM $refRel AS ${p}ref_src WHERE length(text) >= 2),
        |${p}cnt2 AS (SELECT bigram, count(*) AS c2 FROM ${p}rb GROUP BY bigram),
        |${p}cnt1 AS (SELECT bigram[1:1] AS ctx, count(*) AS c1 FROM ${p}rb GROUP BY ctx),
        |${p}voc AS (SELECT count(DISTINCT bigram[2:2]) AS v FROM ${p}rb),
        |${p}cb AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, length(text) - 1),
        |    i -> lower(text)[i:i+1])) AS bigram
        |  FROM $candsRel AS ${p}cand_src WHERE length(text) >= 2),
        |${p}j AS (
        |  SELECT ${p}cb.doc_id,
        |    ln((COALESCE(c2, 0) + 1.0) / (COALESCE(c1, 0) + v)) AS logp
        |  FROM ${p}cb
        |  LEFT JOIN ${p}cnt2 USING (bigram)
        |  LEFT JOIN ${p}cnt1 ON ${p}cnt1.ctx = ${p}cb.bigram[1:1]
        |  CROSS JOIN ${p}voc)""".stripMargin

  /** Per-doc LM rollup CTE over `j` — the bits value q114/q116 gate on
    * (q113's own final select additionally reports n_transitions).
    */
  private val lmAggCteSql: String =
    """lm AS (SELECT doc_id, round(-avg(logp) / ln(2), 6) AS lm_bits
        |       FROM j GROUP BY doc_id)""".stripMargin

  /** Gopher §A1.1 battery CTEs over `srcRel` (needs doc_id, text) →
    * `gob(doc_id, metrics…, r_* booleans, keep)`. Shared by q122
    * (planted corpus at Gopher's own 50/2 thresholds) and q125 (raw
    * candidates at the fixture's 30/1).
    */
  private def gopherCtesSql(srcRel: String, minWords: Int, minStop: Int): String =
    s"""gpwx AS (
        |  SELECT doc_id, u.w FROM $srcRel,
        |    unnest(string_split(replace(text, chr(10), ' '), ' ')) AS u(w)
        |  WHERE u.w <> ''),
        |gpwstat AS (
        |  SELECT doc_id, count(*) AS n_words, sum(length(w)) AS wchars,
        |    sum(CASE WHEN regexp_matches(w, '[a-z]') THEN 1 ELSE 0 END) AS n_alpha,
        |    count(DISTINCT CASE WHEN w IN ('the','be','to','of','and','that','have','with')
        |      THEN w END) AS n_stop
        |  FROM gpwx GROUP BY doc_id),
        |gplx AS (
        |  SELECT doc_id, u.l FROM $srcRel, unnest(string_split(text, chr(10))) AS u(l)),
        |gplstat AS (
        |  SELECT doc_id, count(*) AS n_lines,
        |    sum(CASE WHEN l LIKE '- %' OR l LIKE '* %' THEN 1 ELSE 0 END) AS n_bullet,
        |    sum(CASE WHEN l LIKE '%...' THEN 1 ELSE 0 END) AS n_ell_line
        |  FROM gplx GROUP BY doc_id),
        |gpsym AS (
        |  SELECT doc_id,
        |    length(text) - length(replace(text, '#', '')) AS n_hash,
        |    (length(text) - length(replace(text, '...', ''))) // 3 AS n_ell
        |  FROM $srcRel),
        |gpm AS (
        |  SELECT w.doc_id AS doc_id,
        |    CAST(n_words AS BIGINT) AS n_words, CAST(n_lines AS BIGINT) AS n_lines,
        |    floor(CAST(wchars AS DOUBLE) * 1e6 / n_words + 0.5) / 1e6 AS mean_wlen,
        |    floor(CAST(n_hash + n_ell AS DOUBLE) * 1e6 / n_words + 0.5) / 1e6 AS symbol_ratio,
        |    floor(CAST(n_bullet AS DOUBLE) * 1e6 / n_lines + 0.5) / 1e6 AS bullet_frac,
        |    floor(CAST(n_ell_line AS DOUBLE) * 1e6 / n_lines + 0.5) / 1e6 AS ellipsis_frac,
        |    floor(CAST(n_alpha AS DOUBLE) * 1e6 / n_words + 0.5) / 1e6 AS alpha_frac,
        |    CAST(n_stop AS BIGINT) AS n_stop
        |  FROM gpwstat w JOIN gplstat l USING (doc_id) JOIN gpsym s USING (doc_id)),
        |gob AS (
        |  SELECT *,
        |    (n_words BETWEEN $minWords AND 100000) AS r_wordcount,
        |    (mean_wlen BETWEEN 3.0 AND 10.0) AS r_meanlen,
        |    (symbol_ratio <= 0.1) AS r_symbol,
        |    (bullet_frac <= 0.9) AS r_bullet,
        |    (ellipsis_frac <= 0.3) AS r_ellipsis,
        |    (alpha_frac >= 0.8) AS r_alpha,
        |    (n_stop >= $minStop) AS r_stop,
        |    (n_words BETWEEN $minWords AND 100000 AND mean_wlen BETWEEN 3.0 AND 10.0
        |     AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3
        |     AND alpha_frac >= 0.8 AND n_stop >= $minStop) AS keep
        |  FROM gpm)""".stripMargin

  /** Duplicate-line battery CTEs over `srcRel` (doc_id, text; lines =
    * newline split) → `dlk(doc_id, dup_line_micro, dup_char_micro)` —
    * the q166 algebra parameterized for composition (q168).
    */
  private def dupLineCtesSql(srcRel: String): String =
    s"""dlex AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
        |        FROM $srcRel),
        |dlg AS (SELECT doc_id, line, count(*) AS c FROM dlex GROUP BY 1, 2),
        |dla AS (SELECT doc_id, sum(c) AS n_lines, count(*) AS n_distinct,
        |          sum(c * length(line)) AS n_chars,
        |          sum((c - 1) * length(line)) AS dup_chars
        |        FROM dlg GROUP BY doc_id),
        |dlk AS (SELECT doc_id,
        |    CAST(floor((n_lines - n_distinct) * 1e6 / greatest(n_lines, 1) + 0.5) AS BIGINT) AS dup_line_micro,
        |    CAST(floor(dup_chars * 1e6 / greatest(n_chars, 1) + 0.5) AS BIGINT) AS dup_char_micro
        |  FROM dla)""".stripMargin

  /** n-gram repetition battery CTEs over `srcRel` (doc_id, text;
    * words = space split after newline→space) →
    * `ngk(doc_id, ok_n2..ok_n10)` — the q167 algebra parameterized
    * and pivoted to per-doc rule booleans (q168). Docs absent from
    * `ngk` (fewer than 2 words) pass vacuously — callers coalesce.
    */
  private def ngramOkCtesSql(srcRel: String): String = {
    val okCols = (2 to 10).map(n =>
      s"    coalesce(bool_and(CASE WHEN n = $n THEN ok END), TRUE) AS ok_n$n")
      .mkString(",\n")
    s"""ngtok AS (SELECT doc_id,
        |    string_split(replace(text, chr(10), ' '), ' ') AS t FROM $srcRel),
        |ngw AS (SELECT doc_id,
        |    CAST(list_sum(list_transform(t, w -> length(w))) AS BIGINT) AS w_chars
        |  FROM ngtok),
        |ngn AS (SELECT unnest(generate_series(2, 10)) AS n),
        |nggx AS (
        |  SELECT ngtok.doc_id, ngn.n, u.i AS pos,
        |    array_to_string(t[u.i : u.i + ngn.n - 1], ' ') AS gram
        |  FROM ngtok, ngn, unnest(generate_series(1, len(t) - ngn.n + 1)) AS u(i)
        |  WHERE len(t) >= ngn.n),
        |nggc AS (SELECT doc_id, n, gram, count(*) AS c FROM nggx GROUP BY 1, 2, 3),
        |ngtop AS (
        |  SELECT doc_id, n, CAST(c * (length(gram) - (n - 1)) AS BIGINT) AS metric_chars
        |  FROM (SELECT doc_id, n, gram, c,
        |      row_number() OVER (PARTITION BY doc_id, n
        |        ORDER BY c DESC, length(gram) DESC, gram) AS rk
        |    FROM nggc WHERE n <= 4) WHERE rk = 1),
        |ngdpos AS (
        |  SELECT DISTINCT g.doc_id, g.n, u.k AS idx
        |  FROM nggx g JOIN nggc ON nggc.doc_id = g.doc_id AND nggc.n = g.n
        |    AND nggc.gram = g.gram,
        |    unnest(generate_series(g.pos, g.pos + g.n - 1)) AS u(k)
        |  WHERE nggc.c > 1 AND g.n >= 5),
        |ngwlen AS (
        |  SELECT doc_id, u.i AS idx, CAST(length(t[u.i]) AS BIGINT) AS wl
        |  FROM ngtok, unnest(generate_series(1, len(t))) AS u(i)),
        |ngdup AS (
        |  SELECT d.doc_id, d.n, CAST(sum(w.wl) AS BIGINT) AS metric_chars
        |  FROM ngdpos d JOIN ngwlen w USING (doc_id, idx) GROUP BY 1, 2),
        |nggrid AS (SELECT DISTINCT doc_id, n FROM nggx),
        |ngfam AS (
        |  SELECT doc_id, n, metric_chars FROM ngtop
        |  UNION ALL
        |  SELECT g.doc_id, g.n, COALESCE(d.metric_chars, 0) AS metric_chars
        |  FROM nggrid g LEFT JOIN ngdup d USING (doc_id, n) WHERE g.n >= 5),
        |ngth AS (SELECT * FROM (VALUES (2, 200000), (3, 180000), (4, 160000),
        |  (5, 150000), (6, 140000), (7, 130000), (8, 120000), (9, 110000),
        |  (10, 100000)) v(n, thr)),
        |ngok AS (
        |  SELECT f.doc_id, f.n,
        |    CAST(floor(f.metric_chars * 1e6 / greatest(w.w_chars, 1) + 0.5) AS BIGINT) <= th.thr AS ok
        |  FROM ngfam f JOIN ngw w USING (doc_id) JOIN ngth th ON th.n = f.n)""".stripMargin +
      ",\nngk AS (\n  SELECT doc_id,\n" + okCols + "\n  FROM ngok GROUP BY doc_id)"
  }

  /** The word-frequency head every unigram oracle shares; `srcRel` is
    * the FIT corpus (q175 fits on a split, not the whole table).
    */
  private def unigramWfSql(srcRel: String = "documents"): String =
    s"""w0 AS (SELECT unnest(string_split(text, ' ')) AS word FROM $srcRel AS uwf_src),
      |wf AS (SELECT word, count(*) AS freq FROM w0 WHERE word <> '' GROUP BY word)""".stripMargin

  /** q171/q174's frequency-scored vocab on the integer micro-cost grid
    * (needs `wf`): all single chars + top-`kGram` 2-/3-grams.
    */
  private def unigramFreqVocabSql(kGram: Int): String =
    """gs AS (
      |  SELECT g.l, substr(wf.word, u.i, g.l) AS gram, CAST(sum(wf.freq) AS BIGINT) AS cnt
      |  FROM wf, (VALUES (1), (2), (3)) g(l),
      |    unnest(generate_series(1, length(wf.word) - g.l + 1)) AS u(i)
      |  WHERE length(wf.word) >= g.l
      |  GROUP BY 1, 2),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM gs WHERE l = 1),
      |vocab AS MATERIALIZED (
      |  SELECT gram AS piece,
      |    CAST(floor(-ln(CAST(cnt AS DOUBLE) / n) * 1e6 + 0.5) AS BIGINT) AS cost
      |  FROM (
      |    SELECT gram, cnt FROM gs WHERE l = 1
      |    UNION ALL
      |    SELECT gram, cnt FROM (SELECT gram, cnt,
      |        row_number() OVER (ORDER BY cnt DESC, gram) AS rk FROM gs WHERE l = 2)
      |""".stripMargin +
      s"      WHERE rk <= $kGram\n" +
      """    UNION ALL
      |    SELECT gram, cnt FROM (SELECT gram, cnt,
      |        row_number() OVER (ORDER BY cnt DESC, gram) AS rk FROM gs WHERE l = 3)
      |""".stripMargin +
      s"      WHERE rk <= $kGram), tot)"

  /** q173's FITTED cost table as a literal VALUES CTE — the EM arm's
    * oracle injection (see [[graft.ops.Unigram.lastEmVocab]]): costs
    * are already integer micro-grid longs, so the literal round-trip
    * is exact.
    */
  private def unigramVocabLiteralSql(v: graft.ops.Unigram.Vocab): String = {
    val rows = v.pieces.toSeq.sorted.map { case (p, c) =>
      s"('${p.replace("'", "''")}', $c)"
    }.mkString(",\n    ")
    "vocab AS MATERIALIZED (\n  SELECT piece, CAST(cost AS BIGINT) AS cost FROM (VALUES\n    " +
      rows + ") v(piece, cost))"
  }

  /** q171/q173's tokenization targets (needs `wf`): distinct words +
    * adjacent-word compounds ≤ `maxW` chars.
    */
  private def unigramTargetsSql(maxW: Int): String =
    """dw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |cmp AS (
      |  SELECT ws[u.i] || ws[u.i+1] AS word
      |  FROM dw, unnest(generate_series(1, len(ws) - 1)) AS u(i)
      |  WHERE ws[u.i] <> '' AND ws[u.i+1] <> ''
      |""".stripMargin +
      s"    AND length(ws[u.i]) + length(ws[u.i+1]) <= $maxW),\n" +
      """tg AS MATERIALIZED (
      |  SELECT word, length(word) AS len FROM (
      |    SELECT word FROM wf UNION SELECT word FROM cmp))""".stripMargin

  /** The unigram Viterbi machinery (needs `tg`, `vocab`): a
    * `maxW`-stage unrolled integer DP (dp CTEs MATERIALIZED — each
    * references up to 3 predecessors, so inlining would re-plan the
    * chain 3^maxW times, the q118 hang), a per-(word, pos)
    * longest-piece choice table, and a LINEAR recursive backward walk
    * emitting the segmentation.
    */
  private def unigramDpWalkSql(maxW: Int): String = {
    val dpCtes = (1 to maxW).map { p =>
      val preds = (1 to 3).filter(_ <= p).map { l =>
        if (p - l == 0)
          s"""SELECT t.word, v.cost AS c FROM tg t
             |      JOIN vocab v ON v.piece = substr(t.word, ${p - l + 1}, $l)
             |      WHERE t.len >= $p""".stripMargin
        else
          s"""SELECT t.word, d.best + v.cost AS c FROM tg t
             |      JOIN d${p - l} d ON d.word = t.word
             |      JOIN vocab v ON v.piece = substr(t.word, ${p - l + 1}, $l)
             |      WHERE t.len >= $p""".stripMargin
      }
      s"d$p AS MATERIALIZED (SELECT word, min(c) AS best FROM (\n" +
        preds.mkString("\n      UNION ALL\n") + ") GROUP BY word)"
    }
    val dpallUnion = (1 to maxW)
      .map(p => s"SELECT word, $p AS pos, best FROM d$p")
      .mkString("\n  UNION ALL ")
    dpCtes.mkString(",\n") + ",\n" +
      s"dpall AS MATERIALIZED (\n  $dpallUnion\n" +
      """  UNION ALL SELECT word, 0 AS pos, CAST(0 AS BIGINT) FROM tg),
      |choice AS MATERIALIZED (
      |  SELECT d.word, d.pos, max(c.l) AS l
      |  FROM dpall d, (VALUES (1), (2), (3)) c(l)
      |  JOIN vocab v ON TRUE
      |  JOIN dpall prev ON prev.word = d.word AND prev.pos = d.pos - c.l
      |  WHERE d.pos >= 1 AND c.l <= d.pos
      |    AND v.piece = substr(d.word, d.pos - c.l + 1, c.l)
      |    AND prev.best + v.cost = d.best
      |  GROUP BY d.word, d.pos),
      |walk(word, pos, piece) AS (
      |  SELECT t.word, t.len, substr(t.word, t.len - ch.l + 1, ch.l)
      |  FROM tg t JOIN choice ch ON ch.word = t.word AND ch.pos = t.len
      |  UNION ALL
      |  SELECT w.word, w.pos - ch0.l, substr(w.word, w.pos - ch0.l - ch.l + 1, ch.l)
      |  FROM walk w
      |  JOIN choice ch0 ON ch0.word = w.word AND ch0.pos = w.pos
      |  JOIN choice ch ON ch.word = w.word AND ch.pos = w.pos - ch0.l
      |  WHERE w.pos - ch0.l >= 1)""".stripMargin
  }

  /** The per-word segmentation tail q171/q173 share. */
  private val unigramWordTailSql: String =
    """SELECT t.word, CAST(count(w.piece) AS BIGINT) AS n_pieces,
      |  dl.best AS cost_micro,
      |  string_agg(w.piece, '|' ORDER BY w.pos) AS seg
      |FROM tg t
      |JOIN dpall dl ON dl.word = t.word AND dl.pos = t.len
      |JOIN walk w ON w.word = t.word
      |GROUP BY t.word, dl.best
      |ORDER BY t.word""".stripMargin

  /** q171's unigram-tokenizer oracle (generated, the q118 BPE-stage
    * technique): frequency vocab → DP → walk → per-word output.
    */
  private def unigramOracleSql(maxW: Int, kGram: Int): String =
    "WITH RECURSIVE\n" + unigramWfSql() + ",\n" + unigramFreqVocabSql(kGram) +
      ",\n" + unigramTargetsSql(maxW) + ",\n" + unigramDpWalkSql(maxW) +
      "\n" + unigramWordTailSql

  /** q173's oracle: the SAME targets/DP/walk/tail as q171, under the
    * EM-FIT cost table this run produced (literal CTE injection).
    * Until the query has run in this session there is no fitted table
    * to inject — the placeholder keeps `oracleSql` total; `Verify`
    * always runs queries first.
    */
  private def unigramEmOracleSql(maxW: Int): String =
    graft.ops.Unigram.lastEmVocab.map { v =>
      "WITH RECURSIVE\n" + unigramWfSql() + ",\n" + unigramVocabLiteralSql(v) +
        ",\n" + unigramTargetsSql(maxW) + ",\n" + unigramDpWalkSql(maxW) +
        "\n" + unigramWordTailSql
    }.getOrElse(
      // FAIL CLOSED: if the query never ran (Verify catches per-query
      // throwables and continues), the dumped oracle must ERROR in
      // DuckDB, not succeed with a decoy row — the driver then records
      // a loud oracle failure instead of depending on the missing
      // parquet alone
      "SELECT error('q173 query did not run before oracleSql was dumped')")

  /** q175's oracle: the vocab derives from the EVEN split ONLY; the
    * targets are the ODD split's distinct words; the tail is
    * OOV-TOLERANT — a word the DP cannot segment (a char the fit
    * split never saw) reports (1, −1, itself), the engine's
    * unsegmentable contract.
    */
  private def unigramDeltaOracleSql(maxW: Int, kGram: Int): String =
    "WITH RECURSIVE\n" +
      unigramWfSql("(SELECT * FROM documents WHERE doc_id % 2 = 0)") +
      ",\n" + unigramFreqVocabSql(kGram) + ",\n" +
      """tg AS MATERIALIZED (
        |  SELECT word, length(word) AS len FROM (
        |    SELECT DISTINCT unnest(string_split(text, ' ')) AS word
        |    FROM documents WHERE doc_id % 2 = 1) u
        |  WHERE word <> ''),
        |""".stripMargin +
      unigramDpWalkSql(maxW) + ",\n" +
      """segd AS (
        |  SELECT t.word, CAST(count(w.piece) AS BIGINT) AS n_pieces,
        |    dl.best AS cost_micro,
        |    string_agg(w.piece, '|' ORDER BY w.pos) AS seg
        |  FROM tg t
        |  JOIN dpall dl ON dl.word = t.word AND dl.pos = t.len
        |  JOIN walk w ON w.word = t.word
        |  GROUP BY t.word, dl.best)
        |SELECT word, n_pieces, cost_micro, seg FROM segd
        |UNION ALL
        |SELECT t.word, CAST(1 AS BIGINT), CAST(-1 AS BIGINT), t.word
        |FROM tg t LEFT JOIN segd s ON s.word = t.word
        |WHERE s.word IS NULL
        |ORDER BY word""".stripMargin

  /** q174's oracle: frequency vocab → DP → walk over every distinct
    * WORD, per-doc token counts through the word stream, then q92's
    * packing prefix sum (512-token examples, zero-token docs dropped
    * exactly as sequencePack drops them).
    */
  private def unigramPackOracleSql(maxW: Int, kGram: Int): String =
    "WITH RECURSIVE\n" + unigramWfSql() + ",\n" + unigramFreqVocabSql(kGram) +
      ",\ntg AS MATERIALIZED (SELECT word, length(word) AS len FROM wf),\n" +
      unigramDpWalkSql(maxW) + ",\n" +
      """wcount AS MATERIALIZED (
        |  SELECT t.word, CAST(count(w.piece) AS BIGINT) AS np
        |  FROM tg t JOIN walk w ON w.word = t.word GROUP BY t.word),
        |docw AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |dt AS (
        |  SELECT doc_id, CAST(sum(np) AS BIGINT) AS n_tokens
        |  FROM docw JOIN wcount USING (word) GROUP BY doc_id),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM dt WHERE n_tokens > 0)
        |SELECT doc_id, n_tokens,
        |  CAST(cum_before // 512 AS BIGINT) AS first_example,
        |  CAST((cum_before + n_tokens - 1) // 512 AS BIGINT) AS last_example,
        |  CAST((cum_before + n_tokens - 1) // 512
        |       - cum_before // 512 + 1 AS BIGINT) AS n_examples
        |FROM c ORDER BY doc_id""".stripMargin

  /** DSIR CTEs (q123/q125): hashed word uni+bigram features of
    * `candsRel` (doc_id, text) scored against `targetRel` (text) →
    * `dsw(doc_id, n_grams, log_weight)` — Xie-et-al importance weights
    * with add-one smoothing over 256 md5-conv buckets.
    */
  private def dsirCtesSql(candsRel: String, targetRel: String): String =
    s"""dst AS (SELECT string_split(lower(text), ' ') AS t FROM $targetRel AS dst_src),
        |dsc AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM $candsRel AS dsc_src),
        |dstg AS (
        |  SELECT CAST(CAST(concat('0x', substr(md5(g), 1, 8)) AS UBIGINT) % 256 AS BIGINT) AS bucket
        |  FROM (
        |    SELECT unnest(CASE WHEN len(t) >= 2
        |      THEN list_concat(t, list_transform(generate_series(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1]))
        |      ELSE t END) AS g
        |    FROM dst)),
        |dstcnt AS (SELECT bucket, count(*) AS ct FROM dstg GROUP BY bucket),
        |dsttot AS (SELECT sum(ct) AS nt FROM dstcnt),
        |dscg AS (
        |  SELECT doc_id, CAST(CAST(concat('0x', substr(md5(g), 1, 8)) AS UBIGINT) % 256 AS BIGINT) AS bucket
        |  FROM (
        |    SELECT doc_id, unnest(CASE WHEN len(t) >= 2
        |      THEN list_concat(t, list_transform(generate_series(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1]))
        |      ELSE t END) AS g
        |    FROM dsc)),
        |dsrcnt AS (SELECT bucket, count(*) AS cr FROM dscg GROUP BY bucket),
        |dsrtot AS (SELECT sum(cr) AS nr FROM dsrcnt),
        |dsdb AS (SELECT doc_id, bucket, count(*) AS n FROM dscg GROUP BY doc_id, bucket),
        |dsw AS (
        |  SELECT doc_id, sum(n) AS n_grams,
        |    round(sum(n * (ln((COALESCE(ct, 0) + 1.0) / (nt + 256))
        |                 - ln((COALESCE(cr, 0) + 1.0) / (nr + 256)))), 6) AS log_weight
        |  FROM dsdb LEFT JOIN dstcnt USING (bucket) LEFT JOIN dsrcnt USING (bucket), dsttot, dsrtot
        |  GROUP BY doc_id)""".stripMargin

  /** Near-dup LOSER CTEs (q55/q117): q43's transitive closure over
    * `srcRel`'s exact-Jaccard pairs -> losers(doc_id), every non-min-id
    * cluster member. RECURSIVE — a composition using this fragment must
    * open with `WITH RECURSIVE`.
    */
  private def nearDupLoserCtesSql(srcRel: String): String =
    s"""tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM $srcRel
        |  WHERE len(string_split(text, ' ')) >= 3),
        |sh0 AS (
        |  SELECT DISTINCT doc_id,
        |   unnest(list_transform(generate_series(1, len(t) - 2),
        |     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |  FROM tok),
        |ok AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 100),
        |sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN ok USING (s)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b
        |  FROM shared
        |  JOIN sizes na ON doc_a = na.doc_id
        |  JOIN sizes nb ON doc_b = nb.doc_id
        |  WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.1),
        |edges AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION SELECT doc_b AS a, doc_a AS b FROM pairs),
        |reach(node, peer) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.peer),
        |losers AS (
        |  SELECT node AS doc_id FROM reach GROUP BY node
        |  HAVING node <> min(peer))""".stripMargin

  /** One BPE training round (q118), stage `s`: pair counts weighted by
    * word frequency (overlapping occurrences all counted — Sennrich's
    * get_stats), deterministic argmax (count desc, then pair
    * ascending; a chr(1) sentinel with count −1 keeps the stage a
    * no-op once the vocabulary runs out of pairs), then the
    * LEFT-TO-RIGHT NON-OVERLAPPING rewrite: match flags per symbol
    * position, consecutive-match runs resolved by gaps-and-islands
    * alternation (only self-pairs can produce adjacent matches — for
    * a≠b a match at i forces a mismatch at i+1), and consumed
    * positions (those following a merge start) dropped in the rebuild.
    * Every stage CTE is MATERIALIZED: each references the previous
    * vocabulary ~3 times, and letting the optimizer inline the chain
    * re-plans v0 exponentially (~3^stages) — measured as a >300 s hang
    * vs 0.5 s materialized at sf0.01.
    */
  private def bpeStageCtesSql(s: Int): String =
    s"""p$s AS MATERIALIZED (
        |  SELECT syms[CAST(u.i AS INT)] AS a, syms[CAST(u.i AS INT) + 1] AS b,
        |         SUM(freq) AS cnt
        |  FROM v$s, unnest(generate_series(1, CAST(len(syms) AS BIGINT) - 1)) AS u(i)
        |  GROUP BY 1, 2),
        |b$s AS MATERIALIZED (
        |  SELECT a, b FROM (
        |    SELECT a, b, cnt FROM p$s
        |    UNION ALL SELECT chr(1), chr(1), -1)
        |  ORDER BY cnt DESC, a, b LIMIT 1),
        |x$s AS MATERIALIZED (
        |  SELECT v.word, v.freq, CAST(u.i AS INT) AS i,
        |         v.syms[CAST(u.i AS INT)] AS sym,
        |         COALESCE(v.syms[CAST(u.i AS INT)] = m.a AND
        |                  v.syms[CAST(u.i AS INT) + 1] = m.b, FALSE) AS mt
        |  FROM v$s v CROSS JOIN b$s m,
        |       unnest(generate_series(1, CAST(len(v.syms) AS BIGINT))) AS u(i)),
        |y$s AS MATERIALIZED (
        |  SELECT word, freq, i, sym, mt,
        |    CASE WHEN mt THEN i - row_number() OVER (PARTITION BY word, mt ORDER BY i) END AS isl
        |  FROM x$s),
        |z$s AS MATERIALIZED (
        |  SELECT word, freq, i, sym,
        |    mt AND (row_number() OVER (PARTITION BY word, isl ORDER BY i) % 2 = 1) AS strt
        |  FROM y$s),
        |w$s AS MATERIALIZED (
        |  SELECT word, freq, i, sym, strt,
        |    COALESCE(lag(strt) OVER (PARTITION BY word ORDER BY i), FALSE) AS consumed
        |  FROM z$s),
        |v${s + 1} AS MATERIALIZED (
        |  SELECT w.word, w.freq,
        |    list(CASE WHEN w.strt THEN m.a || m.b ELSE w.sym END ORDER BY w.i) AS syms
        |  FROM w$s w CROSS JOIN b$s m
        |  WHERE NOT w.consumed
        |  GROUP BY w.word, w.freq)""".stripMargin

  /** The full q118 oracle: word-frequency vocabulary with per-character
    * initial symbols, `nMerges` generated training stages, then
    * re-tokenize every document under the final vocabulary and pack
    * with q92's prefix-sum tail.
    */
  /** Shared head of the learned-BPE oracles (q118/q128): the word
    * vocabulary, `nMerges` generated training stages, and the per-doc
    * token counts `t(doc_id, n_tokens)` under the final vocabulary.
    */
  private def bpeTokenCountCtesSql(nMerges: Int): String =
    """WITH v0 AS MATERIALIZED (
        |  SELECT word, count(*) AS freq,
        |    list_transform(generate_series(1, length(word)), i -> word[i:i]) AS syms
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE length(word) > 0
        |  GROUP BY word)""".stripMargin + ",\n" +
      (0 until nMerges).map(bpeStageCtesSql).mkString(",\n") + ",\n" +
      s"""tc AS (SELECT word, CAST(len(syms) AS BIGINT) AS nt FROM v$nMerges),
        |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |t AS (
        |  SELECT d.doc_id, CAST(SUM(tc.nt) AS BIGINT) AS n_tokens
        |  FROM dw d JOIN tc ON d.word = tc.word
        |  GROUP BY d.doc_id)""".stripMargin

  private def bpeOracleSql(nMerges: Int): String =
    bpeTokenCountCtesSql(nMerges) + ",\n" +
      """cp AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM t WHERE n_tokens > 0)
        |SELECT doc_id, n_tokens,
        |  CAST(cum_before // 512 AS BIGINT) AS first_example,
        |  CAST((cum_before + n_tokens - 1) // 512 AS BIGINT) AS last_example,
        |  CAST((cum_before + n_tokens - 1) // 512
        |       - cum_before // 512 + 1 AS BIGINT) AS n_examples
        |FROM cp ORDER BY doc_id""".stripMargin

  /** Admitted-set CTE of the corpus capstones (q116/q117): exact-dup
    * survivor + token floor + LM cap, with `extraGate` appended for
    * q117's near-dup condition.
    */
  private def shippedKeptCteSql(extraGate: String): String =
    """surv AS (SELECT text, min(doc_id) AS survivor_id FROM tr GROUP BY text),
        |kept AS (
        |  SELECT d.doc_id, d.text FROM tr d
        |  JOIN surv s ON d.text = s.text
        |  LEFT JOIN lm l ON l.doc_id = d.doc_id
        |  WHERE d.doc_id = s.survivor_id
        |    AND len(string_split(d.text, ' ')) >= 5
        |    AND COALESCE(l.lm_bits, 0.0) <= 6.0""".stripMargin +
      extraGate + ")"

  /** Shared tail of the corpus capstones: surgical excision of
    * benchmark text from `kept` (grp comes from the containment head +
    * islands merge), then 512-token sequence packing of the cleaned
    * text — q116/q117's result shape.
    */
  private val cleanedTokensCtesSql: String =
    """spans AS (SELECT doc_id, min(pos) AS span_start, max(e) AS span_end
        |          FROM grp GROUP BY doc_id, gid),
        |seg AS (
        |  SELECT doc_id, span_start, span_end,
        |    COALESCE(lag(span_end) OVER (PARTITION BY doc_id ORDER BY span_start),
        |             0) AS prev_end
        |  FROM spans),
        |cleanedagg AS (
        |  SELECT s.doc_id,
        |    string_agg(substr(d.text, CAST(s.prev_end + 1 AS INT),
        |        CAST(s.span_start - s.prev_end - 1 AS INT)),
        |      '' ORDER BY s.span_start)
        |      || substr(d.text, CAST(m.max_end + 1 AS INT)) AS clean
        |  FROM seg s
        |  JOIN kept d ON d.doc_id = s.doc_id
        |  JOIN (SELECT doc_id, max(span_end) AS max_end FROM spans
        |        GROUP BY doc_id) m ON m.doc_id = s.doc_id
        |  GROUP BY s.doc_id, d.text, m.max_end),
        |cleaned AS (
        |  SELECT d.doc_id, COALESCE(c.clean, d.text) AS clean_text
        |  FROM kept d LEFT JOIN cleanedagg c ON c.doc_id = d.doc_id),
        |t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(clean_text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
        |  FROM cleaned)""".stripMargin

  private val shippedCorpusTailSql: String =
    cleanedTokensCtesSql + ",\n" +
      """cp AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM t WHERE n_tokens > 0)
        |SELECT doc_id, n_tokens,
        |  CAST(cum_before // 512 AS BIGINT) AS first_example,
        |  CAST((cum_before + n_tokens - 1) // 512 AS BIGINT) AS last_example,
        |  CAST((cum_before + n_tokens - 1) // 512
        |       - cum_before // 512 + 1 AS BIGINT) AS n_examples
        |FROM cp ORDER BY doc_id""".stripMargin

  /** q170's tail: the shared cleaned-tokens CTEs, then the q165
    * budget prune in (lm_bits, doc_id) order, then q92's pack over
    * ONLY the kept prefix — the gate→budget→pack loop closed.
    */
  private val budgetedCorpusTailSql: String =
    cleanedTokensCtesSql + ",\n" +
      """bp AS (
        |  SELECT t.doc_id, round(COALESCE(l.lm_bits, 0.0), 6) AS score,
        |    t.n_tokens,
        |    COALESCE(SUM(t.n_tokens) OVER (
        |      ORDER BY COALESCE(l.lm_bits, 0.0), t.doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM t LEFT JOIN lm l ON l.doc_id = t.doc_id
        |  WHERE t.n_tokens > 0),
        |kp AS (SELECT doc_id, score, n_tokens,
        |         cum_before + n_tokens <= 15000 AS kept FROM bp),
        |cp AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM t WHERE n_tokens > 0
        |    AND doc_id IN (SELECT doc_id FROM kp WHERE kept))
        |SELECT k.doc_id, k.score AS lm_bits, k.n_tokens, k.kept,
        |  CAST(c.cum_before // 512 AS BIGINT) AS first_example,
        |  CAST((c.cum_before + c.n_tokens - 1) // 512 AS BIGINT) AS last_example,
        |  CAST((c.cum_before + c.n_tokens - 1) // 512
        |       - c.cum_before // 512 + 1 AS BIGINT) AS n_examples,
        |  CAST(c.cum_before AS BIGINT) AS pack_tok_start
        |FROM kp k LEFT JOIN cp c USING (doc_id)
        |ORDER BY k.doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // exact substring dedup: the FULL pipeline re-derived relationally —
    // 24-char gram explode (1-based substr on both engines), >=2-distinct-
    // doc gate, gaps-and-islands interval merge — so every merged span
    // boundary is hash-checked
    "q100_substring_dedup" -> spanDedupOracleSql,
    // q107: SAME oracle — suffix-rank classes must reproduce the hash
    // path span-for-span
    "q107_suffix_dedup" -> spanDedupOracleSql,
    // bucketing is a layout decision — the join RESULT is layout-
    // independent, so the oracle is the plain join-aggregate; the
    // Exchange-free plan itself is asserted in BucketingSpec
    "q101_bucketed_join" ->
      """SELECT o_orderpriority,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |   (1 - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // span REMOVAL (the consuming half of q100): same span derivation,
    // then a lag-window segment walk rebuilds each cleaned document —
    // every byte of the cleaned corpus is hash-checked
    "q102_remove_spans" -> spanRemovalOracleSql,
    // q110: SAME oracle — the suffix-exact spans are q100's spans
    // (q107's shared oracle), so the cleaned corpus must be
    // byte-identical to q102's
    "q110_remove_exact" -> spanRemovalOracleSql,
    // bounds check for the MinHash candidate path (q76/q88 pattern):
    // recall vs the exact 5-shingle Jaccard pairs at sim >= 0.6 is
    // deterministic under the fixed seed; the oracle pins the contract
    "q103_minhash_recall" ->
      "SELECT 'minhash_lsh' AS method, true AS recall_ok",
    // winnowed span dedup: DuckDB re-derives the SAME winnowed
    // selection (base-131 poly hash mod 2^31-1 per 24-gram, leftmost
    // window-min of every 8-hash window — list_position returns the
    // first match, matching the kernel's strict-< scan); the dup GATE
    // then keys on the LITERAL gram at each selected position (Spark:
    // xxhash64 of the same substring — the q100 injective-hash idiom),
    // NOT the 31-bit selection fingerprint, whose ~n^2/2^32 collisions
    // would flag never-duplicated text; same islands merge, so every
    // winnowed span boundary is hash-checked
    "q104_winnowed_spans" ->
      s"$winnowedHitCtesSql\n$islandCtesSql\n$spanSelectSql",
    // q109: the winnowed spans CONSUMED — same winnowed derivation,
    // then the shared removal tail; every byte of the scale variant's
    // cleaned corpus is hash-checked like q102's
    "q109_remove_winnowed" ->
      s"$winnowedHitCtesSql\n$islandCtesSql,\n${spanRemovalTailSql()}",
    // benchmark decontamination: cross-corpus containment (every 97th
    // doc is the eval set), islands merge, per-doc rollup — the hit
    // head swaps the cross-doc dup gate for membership in the
    // benchmark gram set; islands CTEs shared with the q100 family
    "q112_decontaminate" ->
      (s"$trainBenchSplitSql,\n${containmentHitCtesSql("tr")},\n$islandCtesSql,\n" +
        """spans AS (SELECT doc_id, gid, min(pos) AS s, max(e) AS e2
        |          FROM grp GROUP BY doc_id, gid)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |  CAST(sum(e2 - s + 1) AS BIGINT) AS contaminated_chars
        |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    // surgical decontamination: q112's containment head + the shared
    // removal tail over the TRAINING split — the third head×tail
    // composition; every byte of every cleaned training document
    // hash-checked
    "q115_remove_contaminated" ->
      (s"$trainBenchSplitSql,\n${containmentHitCtesSql("tr")},\n" +
        s"$islandCtesSql,\n${spanRemovalTailSql("tr")}"),
    // the corpus that ships, end to end: survivor + token-floor + LM
    // gates (q114's, minus the contamination row-drop), surgical
    // excision of benchmark text from the admitted docs (q115), then
    // q92's packing of the CLEANED text — every token count and
    // example boundary of the final training corpus hash-checked
    "q116_shipped_corpus" ->
      (s"$trainBenchSplitSql,\n${lmCtesSql("tr")},\n$lmAggCteSql,\n" +
        s"${shippedKeptCteSql("")},\n${containmentHitCtesSql("kept")},\n" +
        s"$islandCtesSql,\n$shippedCorpusTailSql"),
    // q117: q116's pipeline with the NEAR-DUP gate folded in — q55's
    // recursive transitive closure (over the training split) supplies
    // `losers`, and the kept CTE adds the anti-membership condition;
    // every other fragment is q116's verbatim, so the two capstones
    // share one oracle text modulo the extra gate
    "q117_shipped_corpus_neardup" ->
      (s"WITH RECURSIVE $trainBenchSplitBodySql,\n" +
        s"${nearDupLoserCtesSql("tr")},\n${lmCtesSql("tr")},\n$lmAggCteSql,\n" +
        shippedKeptCteSql(
          "\n    AND d.doc_id NOT IN (SELECT doc_id FROM losers)") +
        s",\n${containmentHitCtesSql("kept")},\n" +
        s"$islandCtesSql,\n$shippedCorpusTailSql"),
    // shipped corpus under the FULL battery: q117's oracle with the
    // Gopher and DSIR gate CTEs added to the kept condition
    "q129_shipped_corpus_full" ->
      (s"WITH RECURSIVE $trainBenchSplitBodySql,\n" +
        s"${nearDupLoserCtesSql("tr")},\n${lmCtesSql("tr")},\n$lmAggCteSql,\n" +
        gopherCtesSql("tr", 30, 1) + ",\n" +
        dsirCtesSql("tr",
          "(SELECT text FROM documents WHERE source IN ('src0', 'src1'))") + ",\n" +
        shippedKeptCteSql(
          "\n    AND d.doc_id NOT IN (SELECT doc_id FROM losers)" +
          "\n    AND d.doc_id IN (SELECT doc_id FROM gob WHERE keep)" +
          "\n    AND COALESCE((SELECT log_weight FROM dsw WHERE dsw.doc_id = d.doc_id), 0.0) >= -8.0") +
        s",\n${containmentHitCtesSql("kept")},\n" +
        s"$islandCtesSql,\n$shippedCorpusTailSql"),
    // BUDGETED shipped corpus: q129's admission + excision, then the
    // q165 budget prune in (lm_bits, id) order, then q92's pack over
    // only the kept prefix — gate -> token budget -> training layout
    // in ONE oracled plan, every stage from shared green fragments
    "q170_budgeted_corpus" ->
      (s"WITH RECURSIVE $trainBenchSplitBodySql,\n" +
        s"${nearDupLoserCtesSql("tr")},\n${lmCtesSql("tr")},\n$lmAggCteSql,\n" +
        gopherCtesSql("tr", 30, 1) + ",\n" +
        dsirCtesSql("tr",
          "(SELECT text FROM documents WHERE source IN ('src0', 'src1'))") + ",\n" +
        shippedKeptCteSql(
          "\n    AND d.doc_id NOT IN (SELECT doc_id FROM losers)" +
          "\n    AND d.doc_id IN (SELECT doc_id FROM gob WHERE keep)" +
          "\n    AND COALESCE((SELECT log_weight FROM dsw WHERE dsw.doc_id = d.doc_id), 0.0) >= -8.0") +
        s",\n${containmentHitCtesSql("kept")},\n" +
        s"$islandCtesSql,\n$budgetedCorpusTailSql"),
    // learned-BPE packing: the ENTIRE training loop re-derived
    // relationally (10 generated stages — pair counts, deterministic
    // argmax, left-to-right rewrite via islands alternation), then
    // every document re-tokenized under the learned vocabulary and
    // packed with q92's tail — every merge perturbs every downstream
    // token count and boundary, all hash-checked
    "q118_bpe_pack" -> bpeOracleSql(10),
    // tokenizer fertility: q118's learned-merge stages verbatim, tail =
    // per-doc chars/token (micro-rounded) + the 1.5 gate
    "q128_bpe_fertility" -> (bpeTokenCountCtesSql(10) + ",\n" +
      """dl AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars FROM documents)
        |SELECT t.doc_id, t.n_tokens, dl.n_chars,
        |  floor(CAST(dl.n_chars AS DOUBLE) * 1e6 / t.n_tokens + 0.5) / 1e6 AS chars_per_token,
        |  (floor(CAST(dl.n_chars AS DOUBLE) * 1e6 / t.n_tokens + 0.5) / 1e6 >= 1.5) AS fertile
        |FROM t JOIN dl USING (doc_id)
        |WHERE t.n_tokens > 0 ORDER BY t.doc_id""".stripMargin),
    // GPT-3-style quality-classifier gate on a planted corpus (the q96
    // technique): the fit/score runs Spark-side (hash-derived data,
    // seeded HistGbt); the oracle pins the holdout size and the
    // accuracy/gate-behavior floor booleans
    "q119_quality_gate" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_test, TRUE AS acc_ok,
        |  TRUE AS gate_drops_garbled, TRUE AS gate_keeps_clean
        |FROM documents WHERE doc_id % 5 = 0""".stripMargin,
    // CCNet tercile bucketing: q113's LM CTEs -> micro-unit bits ->
    // quantile_cont cutoffs (interpolation over INTEGERS at thirds
    // never lands on a .5 boundary, so floor(x+0.5) is tie-proof on
    // both engines) -> head/middle/tail assignment, all hash-checked
    "q120_ccnet_buckets" ->
      (s"WITH ${lmCtesSql("(SELECT * FROM documents WHERE doc_id % 3 <> 0)")},\n$lmAggCteSql,\n" +
        """m AS (SELECT doc_id,
        |         CAST(floor(lm_bits * 1e6 + 0.5) AS BIGINT) AS bits_micro
        |       FROM lm),
        |c AS (SELECT
        |  CAST(floor(quantile_cont(bits_micro, CAST(1 AS DOUBLE)/3) + 0.5) AS BIGINT) AS c1,
        |  CAST(floor(quantile_cont(bits_micro, CAST(2 AS DOUBLE)/3) + 0.5) AS BIGINT) AS c2
        |  FROM m)
        |SELECT doc_id, bits_micro,
        |  CASE WHEN bits_micro <= c1 THEN 'head'
        |       WHEN bits_micro <= c2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM m, c ORDER BY doc_id""".stripMargin),
    // deterministic corpus mixture: DuckDB re-derives the parity
    // weights, the integer quota math (W, T*, per-source n), and the
    // md5 within-source ranks — every selected doc and rank
    // hash-checked
    "q121_corpus_mixture" ->
      """WITH w AS (
        |  SELECT source,
        |    CASE WHEN CAST(substr(source, 4, 10) AS INT) % 2 = 0
        |         THEN 3 ELSE 1 END AS wt,
        |    count(*) AS cnt
        |  FROM documents GROUP BY source),
        |tot AS (SELECT SUM(wt) AS W FROM w),
        |tstar AS (SELECT min(cnt * W // wt) AS T FROM w, tot),
        |quota AS (SELECT source, wt * T // W AS n_quota FROM w, tot, tstar),
        |r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT r.doc_id, r.source, CAST(rk AS BIGINT) AS sel_rank
        |FROM r JOIN quota USING (source)
        |WHERE rk <= n_quota ORDER BY r.doc_id""".stripMargin,
    // the FULL Gopher §A1.1 quality battery over the rule-breaching
    // planted corpus — DuckDB re-derives the plant (same CASE order),
    // the word/line stats, the micro-rounded fractions, every rule
    // boolean, and the keep decision
    "q122_gopher_gate" ->
      ("""WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN t2 || ' and of that' ELSE t2 END AS text
        |  FROM (
        |    SELECT doc_id,
        |      CASE
        |        WHEN doc_id % 11 = 0 THEN array_to_string(
        |          list_transform(string_split(text, ' ')[1:20], x -> '- ' || x), chr(10))
        |        WHEN doc_id % 13 = 0 THEN text || chr(10) || 'they said...' ||
        |          chr(10) || 'more soon...' || chr(10) || 'the end'
        |        WHEN doc_id % 7 = 0 THEN text || ' # ## ... # ### #'
        |        WHEN doc_id % 5 = 0 THEN array_to_string(string_split(text, ' ')[1:10], ' ')
        |        WHEN doc_id % 3 = 0 THEN text || ' 42 7 99 100 3 8 12 55 61 70 88 91'
        |        ELSE text END AS t2
        |    FROM documents))""".stripMargin + ",\n" +
        gopherCtesSql("planted", 50, 2) + "\n" +
        """SELECT doc_id, n_words, n_lines, mean_wlen, symbol_ratio, bullet_frac,
        |  ellipsis_frac, alpha_frac, n_stop, r_wordcount, r_meanlen, r_symbol,
        |  r_bullet, r_ellipsis, r_alpha, r_stop, keep
        |FROM gob ORDER BY doc_id""".stripMargin),
    // int8 per-tensor symmetric quantization: DuckDB re-derives the
    // scale, the codes, the INTEGER SDC ranking (exact arithmetic —
    // no FP sum in the approximate path), the exact double-dot top-k
    // (list_dot_product, the q22 parity precedent), and every probe's
    // recall
    "q124_sq_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT vec_id, v[s.d] AS x, CAST(s.d AS INT) AS d
        |      FROM e, unnest(generate_series(1, len(v))) AS s(d)),
        |sc AS (SELECT max(abs(x)) / 127 AS s FROM x),
        |codes AS (SELECT vec_id, d, CAST(floor(x / s + 0.5) AS BIGINT) AS code FROM x, sc),
        |pc AS (SELECT vec_id AS q_id, d, code AS qcode FROM codes WHERE vec_id % 50 = 0),
        |sdc AS (SELECT q_id, c.vec_id, sum(qcode * code) AS score
        |        FROM pc JOIN codes c USING (d) WHERE c.vec_id <> q_id
        |        GROUP BY q_id, c.vec_id),
        |ap AS (SELECT q_id, vec_id FROM (
        |         SELECT q_id, vec_id,
        |           row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rk
        |         FROM sdc) WHERE rk <= 10),
        |qv AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 50 = 0),
        |ex AS (SELECT q_id, vec_id FROM (
        |         SELECT q.q_id, e.vec_id,
        |           row_number() OVER (PARTITION BY q.q_id
        |             ORDER BY list_dot_product(e.v, q.qv) DESC, e.vec_id) AS rk
        |         FROM e, qv q WHERE e.vec_id <> q.q_id) WHERE rk <= 10),
        |h AS (SELECT ap.q_id, count(*) AS hits FROM ap JOIN ex USING (q_id, vec_id)
        |      GROUP BY ap.q_id)
        |SELECT p.q_id, CAST(COALESCE(hits, 0) AS BIGINT) AS hits,
        |  floor(CAST(COALESCE(hits, 0) AS DOUBLE) * 1e6 / 10 + 0.5) / 1e6 AS recall
        |FROM (SELECT q_id FROM qv) p LEFT JOIN h USING (q_id) ORDER BY p.q_id""".stripMargin,
    // DSIR importance weights: hashed word uni+bigram features (the
    // q93 md5-conv idiom), add-one-smoothed target/raw distributions,
    // per-doc ln-ratio sum rounded at 6 decimals (q113 precedent) —
    // DuckDB re-derives features, both distributions, and the weights
    "q123_dsir_weights" ->
      ("WITH " + dsirCtesSql(
        "(SELECT doc_id, text FROM documents WHERE source NOT IN ('src0', 'src1'))",
        "(SELECT text FROM documents WHERE source IN ('src0', 'src1'))") + "\n" +
        """SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, log_weight,
        |  (log_weight > 0.0) AS selected
        |FROM dsw ORDER BY doc_id""".stripMargin),
    // ADMISSION v2 capstone: q114's composed gates + the Gopher battery
    // (30/1 fixture thresholds) + the DSIR weight floor, all from the
    // component queries' own shared CTE fragments
    "q125_admission_v2" ->
      (s"$trainBenchSplitSql,\n${containmentHitCtesSql("tr")},\n$islandCtesSql,\n" +
        """cspans AS (SELECT doc_id, gid, min(pos) AS s, max(e) AS e2
        |           FROM grp GROUP BY doc_id, gid),
        |contam AS (SELECT doc_id, sum(e2 - s + 1) AS contaminated_chars
        |           FROM cspans GROUP BY doc_id)""".stripMargin +
        s",\n${lmCtesSql("tr")},\n$lmAggCteSql,\n" +
        gopherCtesSql("tr", 30, 1) + ",\n" +
        dsirCtesSql("tr",
          "(SELECT text FROM documents WHERE source IN ('src0', 'src1'))") + ",\n" +
        """surv AS (SELECT text, min(doc_id) AS survivor_id FROM tr GROUP BY text),
        |stats AS (SELECT doc_id, text,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM tr)
        |SELECT d.doc_id, d.n_tok,
        |  CAST(COALESCE(c.contaminated_chars, 0) AS BIGINT) AS contaminated_chars,
        |  COALESCE(l.lm_bits, 0.0) AS lm_bits,
        |  gb.keep AS gopher_keep,
        |  COALESCE(w.log_weight, 0.0) AS log_weight,
        |  (COALESCE(w.log_weight, 0.0) >= -8.0) AS dsir_ok,
        |  d.doc_id = sv.survivor_id AS is_survivor,
        |  (d.doc_id = sv.survivor_id AND d.n_tok >= 5 AND
        |   COALESCE(c.contaminated_chars, 0) = 0 AND
        |   COALESCE(l.lm_bits, 0.0) <= 6.0 AND gb.keep AND
        |   COALESCE(w.log_weight, 0.0) >= -8.0) AS keep
        |FROM stats d
        |JOIN surv sv ON d.text = sv.text
        |LEFT JOIN contam c USING (doc_id)
        |LEFT JOIN lm l USING (doc_id)
        |JOIN gob gb USING (doc_id)
        |LEFT JOIN dsw w USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin),
    // hard-negative mining, exact arm: brute-force cosine of the
    // 1-in-25 anchor batch against the corpus with the label-mismatch
    // filter BEFORE the per-anchor top-5 window (the q22 cosine CTE
    // shape; rank cast to INT to match Spark's row_number type)
    "q126_hard_negatives" ->
      """WITH emb AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |anch AS (
        |  SELECT vec_id AS a_id, label AS a_label, vec AS a_vec
        |  FROM emb WHERE vec_id % 25 = 0),
        |scored AS (
        |  SELECT a.a_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
        |    list_dot_product(a.a_vec, e.vec) /
        |      (sqrt(list_dot_product(a.a_vec, a.a_vec)) * sqrt(list_dot_product(e.vec, e.vec))) AS cos
        |  FROM emb e, anch a
        |  WHERE e.vec_id <> a.a_id AND e.label <> a.a_label),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY a_id ORDER BY cos DESC, neighbor_id) AS rnk
        |  FROM scored)
        |SELECT a_id AS anchor_id, neighbor_id, neighbor_label,
        |  round(cos, 6) AS cosine, CAST(rnk AS INT) AS rank
        |FROM rk WHERE rnk <= 5 ORDER BY anchor_id, rank""".stripMargin,
    // IVF hard-negative recall bound (q88 contract shape): the miner is
    // deterministic under its fixed seed, so recall@5 vs the exact arm
    // is a fixed number per dataset; the query states >= 0.5, the
    // oracle states true
    "q127_hard_negative_recall" ->
      "SELECT 'ivf_hard_negatives' AS method, true AS recall_ok",
    // CCNet-style LM scoring: add-one-smoothed char-bigram model from
    // every 3rd doc, bits-per-transition for the rest — DuckDB
    // re-derives counts, smoothing, and the per-doc mean; both engines
    // round the log2 score at 6 decimals (the cosine precedent)
    "q113_lm_perplexity" ->
      (s"WITH ${lmCtesSql("(SELECT * FROM documents WHERE doc_id % 3 <> 0)")}\n" +
        """SELECT doc_id, CAST(count(*) AS BIGINT) AS n_transitions,
        |  round(-avg(logp) / ln(2), 6) AS bits_per_transition
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    // batch admission capstone: q112's contamination CTEs + q113's LM
    // CTEs (candidates = the training split) + the q108 survivor /
    // token-stats fragments, composed into the per-doc keep/drop frame
    // the streaming admission arm computes per row
    "q114_admission" ->
      (s"$trainBenchSplitSql,\n${containmentHitCtesSql("tr")},\n$islandCtesSql,\n" +
        """cspans AS (SELECT doc_id, gid, min(pos) AS s, max(e) AS e2
        |           FROM grp GROUP BY doc_id, gid),
        |contam AS (SELECT doc_id, sum(e2 - s + 1) AS contaminated_chars
        |           FROM cspans GROUP BY doc_id)""".stripMargin +
        s",\n${lmCtesSql("tr")},\n$lmAggCteSql,\n" +
        """surv AS (SELECT text, min(doc_id) AS survivor_id FROM tr GROUP BY text),
        |stats AS (SELECT doc_id, text,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM tr)
        |SELECT d.doc_id, d.n_tok,
        |  CAST(COALESCE(c.contaminated_chars, 0) AS BIGINT) AS contaminated_chars,
        |  COALESCE(l.lm_bits, 0.0) AS lm_bits,
        |  d.doc_id = s.survivor_id AS is_survivor,
        |  (d.doc_id = s.survivor_id AND d.n_tok >= 5 AND
        |   COALESCE(c.contaminated_chars, 0) = 0 AND
        |   COALESCE(l.lm_bits, 0.0) <= 6.0) AS keep
        |FROM stats d
        |JOIN surv s ON d.text = s.text
        |LEFT JOIN contam c USING (doc_id)
        |LEFT JOIN lm l USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin),
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS sum_disc_price,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) * (1 + CAST(l_tax AS DECIMAL(3,2)))), 2) AS DOUBLE) AS sum_charge,
        | round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_price,
        | round(CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_projfilter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))), 2) AS DOUBLE) AS disc_price
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
        | AND l_discount BETWEEN 0.02 AND 0.08
        | AND l_quantity < 30
        | AND l_returnflag IN ('A', 'R')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_distinct" ->
      """SELECT
        | (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS n_orders,
        | (SELECT count(DISTINCT l_partkey) FROM lineitem) AS n_parts,
        | (SELECT count(*) FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)) AS n_supp_part_pairs""".stripMargin,
    "q4_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        | count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
        | CAST(grouping(o_orderstatus) AS INT) AS g_status,
        | CAST(grouping(o_orderpriority) AS INT) AS g_prio
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q5_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q6_topk" ->
      """WITH top10 AS (
        |  SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
        |SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        |FROM top10 ORDER BY o_orderkey""".stripMargin,
    "q7_setops" ->
      """WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |     b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
        |SELECT c_custkey, 'union' AS op FROM (SELECT c_custkey FROM a UNION SELECT c_custkey FROM b)
        |UNION ALL
        |SELECT c_custkey, 'intersect' AS op FROM (SELECT c_custkey FROM a INTERSECT SELECT c_custkey FROM b)
        |UNION ALL
        |SELECT c_custkey, 'except' AS op FROM (SELECT c_custkey FROM a EXCEPT SELECT c_custkey FROM b)
        |ORDER BY op, c_custkey""".stripMargin,
    "q8_string" ->
      """SELECT p_partkey,
        | lower(p_name) AS name_lower,
        | upper(p_brand) AS brand_upper,
        | length(p_name) AS name_len,
        | substring(p_type, 1, 4) AS type_pre,
        | split_part(p_name, ' ', 1) AS first_word,
        | concat_ws('-', p_brand, p_type) AS brand_type,
        | regexp_extract(p_brand, '(\d+)', 1) AS brand_num,
        | (p_name LIKE '%a%') AS has_a,
        | levenshtein(p_brand, 'Brand#10') AS lev_b10
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q9_date" ->
      """SELECT o_orderkey,
        | year(o_orderdate) AS yr,
        | month(o_orderdate) AS mo,
        | dayofmonth(o_orderdate) AS dom,
        | quarter(o_orderdate) AS qtr,
        | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        | datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q10_json" ->
      """SELECT event_type,
        | count(k) AS n_with_k,
        | round(avg(k), 6) AS avg_k,
        | min(k) AS min_k,
        | max(k) AS max_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q11_math" ->
      """SELECT l_orderkey, l_linenumber,
        | round(pow(l_quantity, 2.0), 2) AS qty_sq,
        | round(sqrt(l_extendedprice), 6) AS price_sqrt,
        | round(ln(l_extendedprice), 6) AS price_ln,
        | CASE WHEN l_quantity < 10 THEN 'low'
        |      WHEN l_quantity < 30 THEN 'mid'
        |      ELSE 'high' END AS qty_band,
        | CAST(fmod(l_quantity, 7.0) AS INT) AS qty_mod
        |FROM lineitem WHERE l_orderkey % 10 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // mean/std from exact decimal sums, double math mirrored verbatim
    // against q12Stats (see its scaladoc).
    "q12_stats" ->
      """SELECT count(*) AS cnt,
        | round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS qty_mean,
        | round(sqrt((CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |   - CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) * CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*))
        |   / (count(*) - 1)), 6) AS qty_std,
        | round(min(l_quantity), 2) AS qty_min,
        | round(max(l_quantity), 2) AS qty_max,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 4) AS price_mean,
        | round(sqrt((CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |   - CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) * CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*))
        |   / (count(*) - 1)), 4) AS price_std
        |FROM lineitem""".stripMargin,
    "q13_groupmin" ->
      """WITH counts AS (
        |  SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, n, (SELECT min(n) FROM counts) AS min_n
        |FROM counts ORDER BY o_orderpriority""".stripMargin,
    "q14_join_star" ->
      """SELECT n_name,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND l_shipdate >= TIMESTAMP '1995-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q15_outer" ->
      """SELECT c_custkey, c_mktsegment,
        | count(o_orderkey) AS n_orders,
        | CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_mktsegment
        |ORDER BY c_custkey""".stripMargin,
    "q16_semi_anti" ->
      """SELECT c_custkey, 'has_orders' AS tag FROM customer
        | WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT c_custkey, 'no_orders' AS tag FROM customer
        | WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY tag, c_custkey""".stripMargin,
    "q17_band_join" ->
      """SELECT band, count(*) AS n,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS band_total
        |FROM orders JOIN (VALUES
        |  ('1_low', 0.0, 50000.0), ('2_mid', 50000.0, 150000.0),
        |  ('3_high', 150000.0, 300000.0), ('4_top', 300000.0, 1000000000.0))
        |  AS bands(band, lo, hi)
        | ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    // views pre-deduped to the max-event_id row per (user_id, ts): with
    // tied view timestamps both engines would otherwise pick an
    // arbitrary row (see q18AsOf scaladoc)
    "q18_asof" ->
      """WITH views AS (
        |  SELECT user_id, ts, value AS v_value FROM (
        |    SELECT user_id, ts, value,
        |      row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'view')
        |  WHERE rn = 1),
        |clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, round(v.v_value, 6) AS last_view_value
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin,
    "q19_window" ->
      """SELECT event_id, user_id,
        | CAST(row_number() OVER w AS INT) AS rn,
        | CAST(ntile(4) OVER w AS INT) AS quartile,
        | round(lag(value, 1) OVER w, 6) AS prev_value,
        | round(lead(value, 1) OVER w, 6) AS next_value,
        | CAST(sum(CAST(value AS DECIMAL(14,6))) OVER (
        |   PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "q20_topk_group" ->
      """SELECT o_orderpriority, CAST(rn AS INT) AS rn, o_orderkey,
        | round(o_totalprice, 2) AS o_totalprice
        |FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_orderpriority
        |     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "q21_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS dup_count
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,
    "q22_cosine_topk" ->
      """WITH emb AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |q AS (SELECT vec FROM emb WHERE vec_id = 0),
        |scored AS (
        |  SELECT e.vec_id, e.label,
        |    list_dot_product(e.vec, q.vec) /
        |      (sqrt(list_dot_product(e.vec, e.vec)) * sqrt(list_dot_product(q.vec, q.vec))) AS cos
        |  FROM emb e, q WHERE e.vec_id <> 0),
        |top AS (SELECT * FROM scored ORDER BY cos DESC, vec_id LIMIT 10)
        |SELECT vec_id, label, round(cos, 6) AS cosine FROM top ORDER BY vec_id""".stripMargin,
    "q23_quality" ->
      """SELECT lang, source,
        | count(*) AS n_docs,
        | round(avg(length(text)), 6) AS avg_len,
        | CAST(min(len(string_split(text, ' '))) AS INT) AS min_tok,
        | CAST(max(len(string_split(text, ' '))) AS INT) AS max_tok,
        | round(CAST(sum(len(list_filter(string_split(text, ' '),
        |     t -> t IN ('the','a','of','and','to','in')))) AS DOUBLE)
        |   / sum(len(string_split(text, ' '))), 6) AS stop_ratio
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q24_terms" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |agg AS (
        |  SELECT token, count(DISTINCT doc_id) AS df, count(*) AS tf
        |  FROM tok WHERE token NOT IN ('the','a','of','and','to','in')
        |  GROUP BY token),
        |top AS (SELECT * FROM agg ORDER BY df DESC, token LIMIT 20)
        |SELECT token, df, tf FROM top ORDER BY token""".stripMargin,
    "q27_fingerprint" ->
      """SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex,
        | CAST(length(text) AS INT) AS len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q28_hof" ->
      """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)
        |SELECT vec_id,
        | CAST(len(vec) AS INT) AS n_dims,
        | CAST(len(list_filter(vec, x -> x < 0)) AS INT) AS n_neg,
        | round(list_sum(list_transform(vec, x -> abs(x))), 6) AS l1,
        | round(list_sum(vec[1:8]), 6) AS first8_sum
        |FROM emb ORDER BY vec_id""".stripMargin,
    "q29_timewindow" ->
      """SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))) AS hour_start_us,
        | event_type, count(*) AS n,
        | round(CAST(sum(CAST(value AS DECIMAL(14,6))) AS DOUBLE), 6) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q30_session" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM e)
        |SELECT user_id, epoch_us(min(ts)) AS sess_start_us,
        | count(*) AS n_events,
        | round(CAST(sum(CAST(value AS DECIMAL(14,6))) AS DOUBLE), 6) AS sum_value
        |FROM s GROUP BY user_id, sess_id ORDER BY user_id, sess_start_us""".stripMargin,
    "q31_sparsity" ->
      """SELECT
        | CAST(sum(len(list_filter(CAST(embedding AS DOUBLE[]), x -> abs(x) < 0.1))) AS BIGINT) AS n_small_total,
        | CAST(sum(len(embedding)) AS BIGINT) AS n_cells,
        | round(CAST(sum(len(list_filter(CAST(embedding AS DOUBLE[]), x -> abs(x) < 0.1))) AS DOUBLE)
        |   / sum(len(embedding)), 6) AS small_frac
        |FROM embeddings""".stripMargin,
    "q33_strat_sample" ->
      """SELECT o_orderpriority, least(count(*), 10) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // weighted per-group exact-k: WHICH docs are drawn is the engine's
    // IEEE pow rank (not bit-portable), but the exact-k contract —
    // least(|group with w>0|, k) rows per group — is oracle-checkable
    "q86_weighted_group_sample" ->
      """SELECT lang, least(count(*), 40) AS n
        |FROM documents WHERE n_chars > 0
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q34_meanvec" ->
      """WITH emb AS (SELECT label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)
        |SELECT label, count(*) AS n,
        | round(avg(vec[1]), 6) AS m0,
        | round(avg(vec[17]), 6) AS m16,
        | round(avg(vec[64]), 6) AS m63
        |FROM emb GROUP BY label ORDER BY label""".stripMargin,
    "q37_from_json" ->
      """WITH kv AS (
        |  SELECT unnest(json_keys(props)) AS key, props FROM events)
        |SELECT key, count(*) AS n,
        | round(avg(CAST(json_extract_string(props, '$.' || key) AS INT)), 6) AS avg_val,
        | min(CAST(json_extract_string(props, '$.' || key) AS INT)) AS min_val,
        | max(CAST(json_extract_string(props, '$.' || key) AS INT)) AS max_val
        |FROM kv GROUP BY key ORDER BY key""".stripMargin,
    // the stop-shingle df cap (<=100, mirroring ngramJaccardPairs'
    // default) is part of the operator's semantics, so the oracle
    // applies it too — parity must not silently depend on the corpus
    // max-df staying under the cap
    "q39_ngram_jaccard" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |sh0 AS (
        |  SELECT DISTINCT doc_id,
        |   unnest(list_transform(generate_series(1, len(t) - 2),
        |     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |  FROM tok),
        |ok AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 100),
        |sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN ok USING (s)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, round(jacc, 6) AS jaccard
        |FROM (
        |  SELECT doc_a, doc_b, CAST(c AS DOUBLE) / (na.n + nb.n - c) AS jacc
        |  FROM shared
        |  JOIN sizes na ON doc_a = na.doc_id
        |  JOIN sizes nb ON doc_b = nb.doc_id)
        |WHERE jacc >= 0.1
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q41_sliding" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |w AS (
        |  SELECT event_type,
        |   time_bucket(INTERVAL 15 MINUTE, ts) - to_minutes(15 * i) AS wstart
        |  FROM e, range(0, 4) AS r(i))
        |SELECT epoch_us(wstart) AS win_start_us, event_type, count(*) AS n
        |FROM w GROUP BY wstart, event_type
        |ORDER BY win_start_us, event_type""".stripMargin,
    "q42_percentiles" ->
      """SELECT
        | round(quantile_cont(l_quantity, 0.25), 6) AS qty_p25,
        | round(quantile_cont(l_quantity, 0.5), 6) AS qty_p50,
        | round(quantile_cont(l_quantity, 0.75), 6) AS qty_p75,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50
        |FROM lineitem""".stripMargin,
    // q39's pair list (incl. its df cap) -> undirected edges ->
    // transitive closure (recursive CTE) -> min reachable id per node
    // = cluster survivor.
    "q43_dedup_clusters" ->
      ("WITH RECURSIVE " + jaccardClusterBodySql + "\n" +
        """SELECT doc_id, cluster_id FROM cl ORDER BY doc_id""".stripMargin),
    "q44_interval_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'click'),
        |views AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'view')
        |SELECT c.event_id AS click_id, c.user_id,
        | epoch_us(c.ts) AS click_ts_us,
        | v.event_id AS view_id,
        | epoch_us(v.ts) AS view_ts_us,
        | round(v.value, 6) AS view_value
        |FROM clicks c JOIN views v
        |  ON c.user_id = v.user_id
        | AND v.ts >= c.ts - INTERVAL 10 MINUTE
        | AND v.ts <= c.ts
        |ORDER BY click_id, view_id""".stripMargin,
    // pattern uses only character classes so Java regex (Spark) and RE2
    // (DuckDB) segment identically
    "q46_token_counts" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INT) AS n_bpeish_tokens,
        | CAST(len(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'),
        |   p -> regexp_matches(p, '^[0-9]+$'))) AS INT) AS n_number_runs,
        | CAST(len(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'),
        |   p -> regexp_matches(p, '^[^A-Za-z0-9]$'))) AS INT) AS n_symbols
        |FROM documents ORDER BY doc_id""".stripMargin,
    // winnowing (MOSS) fingerprints from a base-131 poly rolling hash
    // mod 2^31-1 — integer math identical across engines; DuckDB's
    // list_reduce seeds with the first element, which equals Spark's
    // 0-seeded aggregate because (0*131 + c0) = c0.
    "q47_winnow_fingerprint" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, length(text)-7),
        |      i -> list_reduce(
        |             list_transform(generate_series(0,7),
        |               j -> CAST(ascii(text[i+j:i+j]) AS BIGINT)),
        |             (acc, c) -> (acc * 131 + c) % 2147483647)) AS gh
        |  FROM documents WHERE length(text) >= 11),
        |f AS (
        |  SELECT doc_id, gh,
        |    list_distinct(list_transform(generate_series(1, len(gh)-3),
        |      j -> list_min(gh[j:j+3]))) AS fps
        |  FROM g)
        |SELECT doc_id,
        | CAST(len(gh) AS INT) AS n_grams,
        | CAST(len(fps) AS INT) AS n_fps,
        | list_min(fps) AS fp_min,
        | list_max(fps) AS fp_max,
        | CAST(list_sum(fps) AS BIGINT) AS fp_sum
        |FROM f ORDER BY doc_id""".stripMargin,
    "q48_group_percentiles" ->
      """SELECT l_returnflag, count(*) AS n,
        | round(quantile_cont(l_quantity, 0.25), 6) AS qty_p25,
        | round(quantile_cont(l_quantity, 0.5), 6) AS qty_p50,
        | round(quantile_cont(l_quantity, 0.75), 6) AS qty_p75,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // profiles = top-50 bigrams per lang (ties lexicographic), classify
    // = argmax profile overlap (ties lexicographic) — mirrors
    // Text.langProfiles/classifyLang exactly
    "q49_langid" ->
      """WITH big AS (
        |  SELECT doc_id, lang, unnest(list_distinct(list_transform(
        |    generate_series(1, length(text) - 1),
        |    i -> lower(text)[i:i+1]))) AS bigram
        |  FROM documents WHERE length(text) >= 2),
        |prof AS (
        |  SELECT lang, bigram FROM (
        |    SELECT lang, bigram,
        |      row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, bigram) AS rk
        |    FROM big GROUP BY lang, bigram)
        |  WHERE rk <= 50),
        |hits AS (
        |  SELECT b.doc_id, p.lang, count(*) AS overlap
        |  FROM (SELECT DISTINCT doc_id, bigram FROM big) b
        |  JOIN prof p USING (bigram)
        |  GROUP BY b.doc_id, p.lang)
        |SELECT doc_id, lang AS predicted_lang, overlap FROM (
        |  SELECT doc_id, lang, overlap,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY overlap DESC, lang) AS rk
        |  FROM hits)
        |WHERE rk = 1 ORDER BY doc_id""".stripMargin,
    // the salt is internal to the two-phase aggregation; the result is
    // the plain GROUP BY
    "q50_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // salting replicates the dim and spreads the fact; the join RESULT
    // is the plain equi-join
    "q51_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // per-row norms as floor(x*1e6+0.5) micro-unit LONGS (integer-exact
    // sums; both engines round the identical IEEE double — round()
    // diverges on representational ties); avgs from the exact sums via
    // the same floor form — mirrors q52MultimodalJoin verbatim
    "q52_multimodal_join" ->
      """WITH j AS (
        |  SELECT d.lang, e.label,
        |    CAST(length(d.text) AS BIGINT) AS len,
        |    CAST(floor(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |      CAST(e.embedding AS DOUBLE[]))) * 1e6 + 0.5) AS BIGINT) AS nrm_micro
        |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id)
        |SELECT lang, label, count(*) AS n,
        | floor(CAST(sum(len) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS avg_len,
        | floor(CAST(sum(nrm_micro) AS DOUBLE) / count(*) + 0.5) / 1e6 AS avg_l2_norm
        |FROM j GROUP BY lang, label ORDER BY lang, label""".stripMargin,
    // q43's transitive closure re-derived, then survivors = docs minus
    // non-survivor cluster members (node != its component min)
    "q55_dedup_corpus" ->
      (s"WITH RECURSIVE ${nearDupLoserCtesSql("documents")}\n" +
        """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        |ORDER BY doc_id""".stripMargin),
    // Gopher-style repetition signals; ratios are the tie-proof
    // floor(x*1e6+0.5)/1e6 micro-unit form (q52 precedent) — both
    // engines floor the identical IEEE double
    "q56_repetition" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |bi AS (
        |  SELECT doc_id, CAST(len(t) AS INT) AS n_tok,
        |   unnest(list_transform(generate_series(1, len(t) - 1),
        |     i -> t[i] || ' ' || t[i+1])) AS g
        |  FROM tok),
        |bic AS (SELECT doc_id, n_tok, g, count(*) AS c FROM bi GROUP BY 1, 2, 3),
        |bstat AS (
        |  SELECT doc_id, n_tok, sum(c) AS n_2grams, max(c) AS top2_count
        |  FROM bic GROUP BY doc_id, n_tok),
        |tri AS (
        |  SELECT doc_id,
        |   unnest(list_transform(generate_series(1, len(t) - 2),
        |     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
        |  FROM tok),
        |tric AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY 1, 2),
        |tstat AS (
        |  SELECT doc_id, sum(c) AS n_3grams,
        |   sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS n_dup3
        |  FROM tric GROUP BY doc_id)
        |SELECT b.doc_id, b.n_tok,
        | CAST(b.n_2grams AS BIGINT) AS n_2grams,
        | CAST(b.top2_count AS BIGINT) AS top2_count,
        | floor(CAST(b.top2_count AS DOUBLE) * 1e6 / b.n_2grams + 0.5) / 1e6 AS top2_frac,
        | CAST(t.n_3grams AS BIGINT) AS n_3grams,
        | CAST(t.n_dup3 AS BIGINT) AS n_dup3,
        | floor(CAST(t.n_dup3 AS DOUBLE) * 1e6 / t.n_3grams + 0.5) / 1e6 AS dup3_frac
        |FROM bstat b JOIN tstat t ON b.doc_id = t.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    // declared pivot values (F/O/P); missing cells coalesce to 0 like
    // the conditional aggregation
    "q57_pivot" ->
      """SELECT o_orderpriority,
        | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        | CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS rev_f,
        | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        | CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS rev_o,
        | count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
        | CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS rev_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // melt = UNION ALL; metric names are the source column names,
    // matching Spark's unpivot variable column
    "q58_unpivot" ->
      """WITH m AS (
        |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT metric, count(*) AS n, min(value) AS vmin, max(value) AS vmax,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum
        |FROM m GROUP BY metric ORDER BY metric""".stripMargin,
    // distinct-shingle posting list -> shingle document frequency ->
    // per-doc shared fraction (no self-join anywhere)
    "q59_shared_shingles" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |   unnest(list_transform(generate_series(1, len(t) - 2),
        |     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |  FROM tok),
        |df AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
        |SELECT doc_id, count(*) AS n_shingles,
        | CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        | floor(CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) * 1e6
        |   / count(*) + 0.5) / 1e6 AS shared_frac
        |FROM sh JOIN df USING (s)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // bag-of-words canonical key: sorted distinct tokens (binary order
    // on ASCII — array_sort and list_sort agree); survivor = min id
    "q60_bow_dedup" ->
      """WITH k AS (
        |  SELECT doc_id,
        |   array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS bow_key
        |  FROM documents)
        |SELECT min(doc_id) AS doc_id, count(*) AS n_docs,
        | CAST(len(string_split(bow_key, ' ')) AS INT) AS n_uniq_tokens
        |FROM k GROUP BY bow_key ORDER BY doc_id""".stripMargin,
    // rank spec deliberately orders on a tied key (year) so dense_rank
    // collapses ties; nth_value spec orders uniquely (it reads a row)
    "q65_window_dist" ->
      """SELECT o_orderkey, o_orderpriority,
        | CAST(dense_rank() OVER w1 AS INT) AS drk,
        | percent_rank() OVER w1 AS prk,
        | cume_dist() OVER w1 AS cd,
        | nth_value(o_orderkey, 2) OVER (
        |   PARTITION BY o_orderpriority
        |   ORDER BY o_totalprice DESC, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
        |FROM orders
        |WINDOW w1 AS (PARTITION BY o_orderpriority ORDER BY year(o_orderdate))
        |ORDER BY o_orderkey""".stripMargin,
    // q39's pair list joined to each side's source label; unordered
    // (least/greatest) source pair counts
    "q64_source_overlap" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |sh0 AS (
        |  SELECT DISTINCT doc_id,
        |   unnest(list_transform(generate_series(1, len(t) - 2),
        |     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |  FROM tok),
        |ok AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 100),
        |sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN ok USING (s)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b
        |  FROM shared
        |  JOIN sizes na ON doc_a = na.doc_id
        |  JOIN sizes nb ON doc_b = nb.doc_id
        |  WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.1)
        |SELECT least(da.source, db.source) AS source_x,
        | greatest(da.source, db.source) AS source_y,
        | count(*) AS n_pairs
        |FROM pairs
        |JOIN documents da ON doc_a = da.doc_id
        |JOIN documents db ON doc_b = db.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // smoothed idf on integer-ratio inputs: both engines ln() the same
    // IEEE double; ties within a doc have identical (tf, df), hence
    // identical tfidf, and break deterministically on term
    "q62_tfidf_terms" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf, df,
        |    tf * ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)) AS tfidf
        |  FROM tf JOIN df USING (term), n),
        |ranked AS (
        |  SELECT doc_id, term, tf, df, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
        |  FROM scored)
        |SELECT doc_id, CAST(rk AS INT) AS rk, term,
        | CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        | floor(tfidf * 1e6 + 0.5) / 1e6 AS tfidf
        |FROM ranked WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,
    // character-class-only patterns: Java regex and RE2 agree; 'g' flag
    // mirrors Spark's replace-all default
    "q63_normalize_text" ->
      """SELECT p_partkey,
        | trim(regexp_replace(lower(p_name), '[^a-z0-9]+', ' ', 'g')) AS norm_name,
        | trim(regexp_replace(lower(p_brand), '[^a-z0-9]+', ' ', 'g')) AS norm_brand,
        | trim(regexp_replace(lower(p_type), '[^a-z0-9]+', ' ', 'g')) AS norm_type,
        | CAST(len(string_split(trim(regexp_replace(lower(p_name), '[^a-z0-9]+', ' ', 'g')), ' ')) AS INT) AS n_name_tokens
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q61_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
        | CAST(grouping(o_orderstatus) AS INT) AS g_status,
        | CAST(grouping(o_orderpriority) AS INT) AS g_prio
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    // PII planted deterministically from doc_id (the fixture has none);
    // patterns are character-class-only so Java regex and RE2 agree;
    // 'g' mirrors Spark's replace-all default
    "q66_pii_redact" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    text
        |    || CASE WHEN doc_id % 3 <> 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.com' ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0 THEN ' or admin' || CAST(doc_id % 100 AS VARCHAR) || '@example.org' ELSE '' END
        |    || CASE WHEN doc_id % 2 = 0 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS aug
        |  FROM documents),
        |red AS (
        |  SELECT doc_id, aug,
        |    regexp_replace(regexp_replace(aug, '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
        |      '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g') AS redacted
        |  FROM aug)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(aug, '[a-z0-9]+@[a-z0-9]+\.[a-z]+')) AS INT) AS n_emails,
        | CAST(len(regexp_extract_all(aug, '\+1-555-[0-9]{4}')) AS INT) AS n_phones,
        | CAST(length(redacted) AS INT) AS clean_len,
        | md5(redacted) AS redacted_md5
        |FROM red ORDER BY doc_id""".stripMargin,
    // the binning is internal execution strategy; the RESULT is the
    // plain inequality band join (bands disjoint, domain fully covered)
    "q67_binned_band_join" ->
      """SELECT band, count(*) AS n,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS band_total
        |FROM orders JOIN (VALUES
        |  ('b1_micro', 0.0, 40000.0), ('b2_small', 40000.0, 95000.0),
        |  ('b3_mid', 95000.0, 180000.0), ('b4_large', 180000.0, 320000.0),
        |  ('b5_jumbo', 320000.0, 2000000.0)) AS bands(band, lo, hi)
        | ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    // spine = distinct users x hourly generate_series over the observed
    // range; forward fill via last_value IGNORE NULLS (default running
    // RANGE frame matches Spark's last(ignoreNulls) default frame)
    "q68_gapfill" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |b AS (SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM e),
        |u AS (SELECT DISTINCT user_id FROM e),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        |  FROM u, b),
        |hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(14,6))) AS DOUBLE) AS sv
        |  FROM e GROUP BY 1, 2)
        |SELECT s.user_id, epoch_us(s.hour) AS hour_us,
        | coalesce(h.n, 0) AS n,
        | round(last_value(h.sv IGNORE NULLS) OVER (
        |   PARTITION BY s.user_id ORDER BY s.hour), 6) AS ffill_value
        |FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
        |ORDER BY s.user_id, hour_us""".stripMargin,
    // bin math is identical IEEE floor-division; cumulative ratios in
    // the tie-proof micro-unit form over integer inputs
    "q69_histogram" ->
      """WITH binned AS (
        |  SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin,
        |    count(*) AS n, sum(CAST(o_totalprice AS DECIMAL(12,2))) AS price_sum
        |  FROM orders GROUP BY 1)
        |SELECT bin, bin * 25000.0 AS bin_lo, n,
        | CAST(price_sum AS DOUBLE) AS price_sum,
        | CAST(sum(n) OVER w AS BIGINT) AS cum_n,
        | floor(CAST(sum(n) OVER w AS DOUBLE) * 1e6
        |   / CAST(sum(n) OVER () AS DOUBLE) + 0.5) / 1e6 AS cum_frac
        |FROM binned
        |WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY bin""".stripMargin,
    // RANGE frame on epoch-us longs: identical peer semantics under
    // tied timestamps; DECIMAL window sum is order-independent
    "q70_trailing_window" ->
      """SELECT event_id, user_id, ts_us,
        | count(*) OVER w AS n_1h,
        | round(CAST(sum(CAST(value AS DECIMAL(14,6))) OVER w AS DOUBLE), 6) AS sum_1h
        |FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // the binning is done by an optimizer RULE (BandJoinToBinned), not
    // the query text; the result is the plain inequality band join
    "q71_auto_band_join" ->
      """SELECT tier, count(*) AS n,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS tier_total
        |FROM lineitem JOIN (VALUES
        |  ('t1_budget', 0.0, 20000.0), ('t2_value', 20000.0, 45000.0),
        |  ('t3_core', 45000.0, 70000.0), ('t4_premium', 70000.0, 100000.0),
        |  ('t5_luxury', 100000.0, 200000.0)) AS tiers(tier, lo, hi)
        | ON l_extendedprice >= lo AND l_extendedprice < hi
        |GROUP BY tier ORDER BY tier""".stripMargin,
    // integral-domain variant of q71: the rule bins int bounds with
    // exact 64-bit div, never through a double
    "q72_int_band_join" ->
      """SELECT tier, count(*) AS n, CAST(sum(qty) AS BIGINT) AS tier_qty
        |FROM (SELECT CAST(l_quantity AS INTEGER) AS qty FROM lineitem) li
        |JOIN (VALUES
        |  ('s1_unit', 1, 5), ('s2_case', 6, 15),
        |  ('s3_bulk', 16, 30), ('s4_pallet', 31, 50)) AS tiers(tier, lo, hi)
        | ON qty >= lo AND qty <= hi
        |GROUP BY tier ORDER BY tier""".stripMargin,
    // the band side ships from parquet (non-literal); the rule
    // materializes it with a bounded plan-time read — the result is
    // still the plain inequality band join
    "q73_parquet_band_join" ->
      """SELECT band, count(*) AS n,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS band_total
        |FROM orders JOIN (
        |  SELECT n_name AS band, n_nationkey * 12000.0 AS lo,
        |    (n_nationkey + 1) * 12000.0 AS hi
        |  FROM nation) bands
        | ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    // time-domain variant of q71: timestamp bounds bin in the exact
    // internal micros domain (unix_micros), zero precision loss
    "q77_time_band_join" ->
      """SELECT band, count(*) AS n,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS band_total
        |FROM orders JOIN (
        |  SELECT r_name AS band,
        |    make_timestamp(CAST(1996 + r_regionkey AS BIGINT), 1, 1, 0, 0, 0) AS lo,
        |    make_timestamp(CAST(1997 + r_regionkey AS BIGINT), 1, 1, 0, 0, 0) AS hi
        |  FROM region) bands
        | ON o_orderdate >= lo AND o_orderdate < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    // bounds check for the rows-only HLL query (q36): the oracle
    // reproduces the exact counts and asserts the 3*rsd envelope HELD —
    // a sketch regression flips the boolean and hash-fails
    "q74_hll_bounds" ->
      """SELECT count(DISTINCT l_orderkey) AS exact_orders,
        | count(DISTINCT l_partkey) AS exact_parts,
        | count(DISTINCT l_suppkey) AS exact_supps,
        | true AS hll_within_3rsd
        |FROM lineitem""".stripMargin,
    // bounds check for the rows-only GK query (q54): exact group
    // medians (oracle-reproducible) plus GK's rank guarantee as a
    // boolean the oracle asserts to be true
    "q75_gk_bounds" ->
      """SELECT l_returnflag, count(*) AS n,
        | round(quantile_cont(l_quantity, 0.5), 6) AS qty_p50_exact,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50_exact,
        | true AS gk_within_rank_eps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // bounds check for the rows-only ANN queries (q26 LSH, q45 IVF):
    // recall@10 vs the exact top-k is deterministic under the fixed
    // seeds; the oracle asserts the thresholds held
    "q76_ann_recall" ->
      """SELECT 'ivf' AS method, true AS recall_ok
        |UNION ALL SELECT 'lsh', true ORDER BY method""".stripMargin,
    // bounds check for the IVF kNN JOIN: mean recall@10 against the
    // exact kNN of the deterministic 1-in-20 probe sample clears 0.5
    // (the engine computes both sides; the oracle pins the contract —
    // q76 pattern)
    "q88_knn_recall" ->
      "SELECT 'ivf_knn_join' AS method, true AS recall_ok",
    // semantic dedup against PLANTED duplicates: the engine builds the
    // duplicated corpus from the parquet deterministically (every 10th
    // vector gains a jittered copy at vec_id + 1e6, cosine >= 0.994 to
    // its base), dedups at minCos = 0.9, and the oracle states the
    // exact ground truth: every copy collapses onto its lower-id base
    // (planted_survivors = 0), no base row is lost (missing_base = 0),
    // and the survivor set is exactly the original corpus
    "q89_semantic_dedup" ->
      """SELECT count(*) AS survivors,
        | CAST(0 AS BIGINT) AS planted_survivors,
        | CAST(0 AS BIGINT) AS missing_base
        |FROM embeddings""".stripMargin,
    // parquet compaction maintenance: the engine splinters documents
    // into small files (flat + lang-partitioned), compacts both, and
    // re-reads; the oracle states the preservation invariants from the
    // source table (rows, distinct keys, nested-layout rows) plus the
    // file-count reduction contract
    "q90_compact" ->
      """SELECT count(*) AS n_rows, count(DISTINCT doc_id) AS n_docs,
        | true AS files_reduced, true AS nested_preserved
        |FROM documents""".stripMargin,
    // adaptive (TPE) hyperparameter search over a distributed
    // least-squares objective on lineitem: the surface is a smooth 2-D
    // bowl with a closed-form optimum (0, corr(qty, price)), so the
    // oracle pins the exact search invariants — full budget ran, every
    // proposal in its box, the adaptive phase beat the best startup
    // draw, and the best point landed near the analytic optimum
    // (q76 bounds pattern; the sampler itself is property-tested)
    "q91_tpe_search" ->
      """SELECT CAST(30 AS BIGINT) AS n_trials, true AS within_bounds,
        | true AS improved, true AS near_opt""".stripMargin,
    // concat-and-chunk sequence packing: the oracle is the single-node
    // formulation of the same global token prefix sum (one window over
    // doc_id order) that the engine computes as a two-pass distributed
    // scan; token counts reuse the q46 BPE-ish segmentation both
    // engines reproduce identically
    "q92_sequence_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM t WHERE n_tokens > 0)
        |SELECT doc_id, n_tokens,
        |  CAST(cum_before // 512 AS BIGINT) AS first_example,
        |  CAST((cum_before + n_tokens - 1) // 512 AS BIGINT) AS last_example,
        |  CAST((cum_before + n_tokens - 1) // 512
        |       - cum_before // 512 + 1 AS BIGINT) AS n_examples
        |FROM c ORDER BY doc_id""".stripMargin,
    // shard-level contamination blast radius: q112's containment hits ->
    // q92's packing over the training split -> q133's shard map; every
    // taint count and re-ship verdict hash-checked from shared fragments
    "q196_contamination_shards" ->
      (s"$trainBenchSplitSql,\n" + containmentHitCtesSql("tr") + ",\n" +
        """td AS (SELECT DISTINCT doc_id FROM hits),
        |t2 AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
        |  FROM tr),
        |c2 AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM t2 WHERE n_tokens > 0),
        |ms AS (
        |  SELECT doc_id,
        |    unnest(generate_series(CAST(cum_before // 512 AS BIGINT),
        |      CAST((cum_before + n_tokens - 1) // 512 AS BIGINT))) AS example_id
        |  FROM c2),
        |mt AS (SELECT doc_id, example_id, example_id % 8 AS shard_id,
        |         doc_id IN (SELECT doc_id FROM td) AS tainted
        |       FROM ms),
        |bye AS (
        |  SELECT shard_id, example_id, max(tainted) AS ex_tainted
        |  FROM mt GROUP BY shard_id, example_id),
        |pe AS (
        |  SELECT shard_id, CAST(count(*) AS BIGINT) AS n_examples,
        |    CAST(sum(CASE WHEN ex_tainted THEN 1 ELSE 0 END) AS BIGINT) AS n_tainted_examples
        |  FROM bye GROUP BY shard_id),
        |pd AS (
        |  SELECT shard_id, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_tainted_docs
        |  FROM mt WHERE tainted GROUP BY shard_id)
        |SELECT pe.shard_id, pe.n_examples,
        |  COALESCE(pd.n_tainted_docs, 0) AS n_tainted_docs,
        |  pe.n_tainted_examples,
        |  pe.n_tainted_examples > 0 AS must_reship
        |FROM pe LEFT JOIN pd USING (shard_id) ORDER BY pe.shard_id""".stripMargin),
    // accent-folded CCNet normalization -> buckets: the fold itself is
    // hash-checked byte-for-byte through DuckDB's strip_accents (probed
    // char-for-char equal to the NFD -> strip-Mn/Mc/Me -> NFC kernel)
    // over the 3-class accent plant, alongside the buckets it induces
    // (q182's LM tail verbatim over the folded relation)
    "q197_accent_fold_buckets" ->
      (s"""WITH pl AS (SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 0 THEN 'Caf'||chr(233)||' d'||chr(233)||'j'||chr(224)||' '
        |       WHEN doc_id % 4 = 1 THEN 'nai'||chr(776)||'ve fac'||chr(807)||'ade '
        |       WHEN doc_id % 4 = 2 THEN chr(321)||'ukasz '||chr(216)||'re '||chr(198)||'r'||chr(248)||' '
        |       ELSE '' END || text AS text FROM documents),
        |nrm AS (SELECT doc_id, ${ccnetNormSqlOver("strip_accents(text)")} AS text FROM pl),
        |""".stripMargin +
        lmCtesPrefixedSql("", "(SELECT * FROM nrm WHERE doc_id % 3 = 0)",
          "(SELECT * FROM nrm WHERE doc_id % 3 <> 0)") + ",\n" +
        lmAggCteSql + ",\n" +
        """m AS (SELECT doc_id,
        |         CAST(floor(lm_bits * 1e6 + 0.5) AS BIGINT) AS bits_micro
        |       FROM lm),
        |c AS (SELECT
        |  CAST(floor(quantile_cont(bits_micro, CAST(1 AS DOUBLE)/3) + 0.5) AS BIGINT) AS c1,
        |  CAST(floor(quantile_cont(bits_micro, CAST(2 AS DOUBLE)/3) + 0.5) AS BIGINT) AS c2
        |  FROM m)
        |SELECT m.doc_id, nrm.text AS norm_text, bits_micro,
        |  CASE WHEN bits_micro <= c1 THEN 'head'
        |       WHEN bits_micro <= c2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM m JOIN nrm USING (doc_id), c ORDER BY doc_id""".stripMargin),
    // deterministic hash split: DuckDB reproduces the md5-hex bucket
    // (first 8 hex chars as an integer, mod 1000) bit-for-bit, so the
    // FULL per-doc assignment is checked, not just the split sizes
    "q93_hash_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |         AS UBIGINT) % 1000 AS BIGINT) AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 800 THEN 'train'
        |       WHEN bucket < 900 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    // strided overlapping chunking: every chunk string checked exactly
    // (substr semantics agree: 1-based start, clamped final chunk)
    "q94_chunk_docs" ->
      """WITH p AS (
        |  SELECT doc_id, text,
        |    CAST(1 + (CASE WHEN len(text) <= 128 THEN 0
        |              ELSE (len(text) - 128 + 95) // 96 END) AS BIGINT) AS n_chunks
        |  FROM documents WHERE len(text) > 0)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
        |  substr(text, CAST(1 + i*96 AS BIGINT), 128) AS chunk_text,
        |  CAST(len(substr(text, CAST(1 + i*96 AS BIGINT), 128)) AS BIGINT) AS chunk_len
        |FROM p, unnest(generate_series(0, n_chunks - 1)) AS u(i)
        |ORDER BY doc_id, chunk_id""".stripMargin,
    // the CDC versioned-dim round trip re-derived relationally: batch 2's
    // intra-batch seq conflict resolves to the FRESH row before the merge,
    // so the oracle models only the winner; version/GC invariants are
    // Spark-side booleans the oracle pins to TRUE
    "q95_cdc_versioned" ->
      """WITH base AS (
        |  SELECT c_custkey, c_mktsegment AS segment,
        |         CAST(c_acctbal AS DECIMAL(12,2)) AS bal FROM customer),
        |upd AS (
        |  SELECT c_custkey, 'FRESH' AS segment,
        |         CAST(bal - 500.0 AS DECIMAL(12,2)) AS bal
        |  FROM base WHERE c_custkey % 13 = 0),
        |ins AS (
        |  SELECT c_custkey + 2000000 AS c_custkey, 'CLONED' AS segment, bal
        |  FROM base WHERE c_custkey % 89 = 0),
        |changes AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
        |merged AS (
        |  SELECT CASE WHEN c.c_custkey IS NOT NULL THEN c.segment
        |              ELSE b.segment END AS segment,
        |         CASE WHEN c.c_custkey IS NOT NULL THEN c.bal
        |              ELSE b.bal END AS bal
        |  FROM base b FULL OUTER JOIN changes c ON b.c_custkey = c.c_custkey)
        |SELECT segment, count(*) AS n,
        |  CAST(round(sum(bal), 2) AS DOUBLE) AS segment_bal,
        |  TRUE AS version_ok, TRUE AS gc_ok
        |FROM merged GROUP BY segment ORDER BY segment""".stripMargin,
    // the corpus generation/classification runs Spark-side against
    // planted labels; the oracle pins the holdout size (re-derivable
    // from documents) and the accuracy-floor booleans
    "q96_langid_accuracy" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_test, TRUE AS acc_ok,
        |  TRUE AS both_langs_predicted
        |FROM documents WHERE doc_id % 5 = 0""".stripMargin,
    // the planted-cluster generation/index/recall math runs Spark-side
    // (seeded KMeans, hash-derived data — deterministic); the oracle
    // pins the production-recall floor boolean
    "q98_clustered_recall" ->
      """SELECT 'ivf_knn_clustered' AS method, TRUE AS recall_ok""",
    // PQ codebooks/codes are engine-specific (seeded KMeans), so the
    // oracle pins the compression constant and the recall-floor boolean
    "q99_pq_recall" ->
      """SELECT 'pq_adc_refined' AS method,
        |  CAST(32.0 AS DOUBLE) AS compression_x, TRUE AS recall_ok""".stripMargin,
    // the boosting fit runs Spark-side (seeded, so the invariant
    // booleans are stable); the oracle pins the constants
    "q97_softmax_gbt" ->
      """SELECT 'softmax_gbt' AS model, CAST(10 AS INT) AS n_classes,
        |  TRUE AS acc_ok, TRUE AS beats_priors, TRUE AS deviance_monotone""".stripMargin,
    // LightGBM-mechanics histogram Newton boosting (quantile bins,
    // histogram splits, Newton leaves, leaf-wise growth) — fully seeded
    // Spark-side fit; the oracle pins the invariant booleans
    "q105_hist_gbt" ->
      """SELECT 'hist_gbt_newton' AS model, CAST(10 AS INT) AS n_classes,
        |  TRUE AS acc_ok, TRUE AS beats_priors, TRUE AS deviance_monotone""".stripMargin,
    // q111: the SIGNAL-BEARING accuracy datum — 18% label noise caps
    // any classifier at ~0.82 expected, and the band [0.78, 0.90] must
    // hold from BOTH sides (non_separable fails if the fixture ever
    // saturates); the reference's LightGBM anchor is its low-80s
    // holdout accuracy on its own non-separable corpus
    "q111_hist_gbt_noisy" ->
      """SELECT 'hist_gbt_noisy' AS model, CAST(10 AS INT) AS n_classes,
        |  TRUE AS acc_ok, TRUE AS non_separable, TRUE AS beats_priors,
        |  TRUE AS deviance_monotone""".stripMargin,
    // q198: q111 under GOSS(0.2, 0.1) + EFB(0.05) — the gate is that
    // one-side sampling REPRODUCES full-data quality (accuracy stays
    // inside the non-separable band), boosting still learns (deviance
    // falls end to end; per-round monotonicity deliberately not
    // asserted under a 30% sample), and EFB genuinely bundled the
    // fixture's structural zeros (fewer tree features than dims)
    "q198_goss_efb_gbt" ->
      """SELECT 'hist_gbt_goss_efb' AS model, CAST(10 AS INT) AS n_classes,
        |  TRUE AS acc_ok, TRUE AS non_separable, TRUE AS beats_priors,
        |  TRUE AS deviance_falls, TRUE AS efb_bundled""".stripMargin,
    // the per-document curation DECISION: q21 survivor + q100 span
    // coverage + q23 per-doc stats + q49 predicted language, stitched
    // from those queries' own already-green CTE fragments — the whole
    // decision frame hash-checked row-for-row
    "q108_curation" ->
      """WITH g AS (
        |  SELECT doc_id, u.i AS pos, substr(text, CAST(u.i AS INT), 24) AS gram
        |  FROM documents,
        |       unnest(generate_series(1, CAST(length(text) AS BIGINT) - 23)) AS u(i)),
        |dup AS (SELECT gram FROM g GROUP BY gram
        |        HAVING count(DISTINCT doc_id) >= 2),
        |hits AS (SELECT doc_id, pos, pos + 23 AS e FROM g
        |         WHERE gram IN (SELECT gram FROM dup)),
        |isl AS (
        |  SELECT doc_id, pos, e,
        |    CASE WHEN pos > COALESCE(max(e) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
        |    THEN 1 ELSE 0 END AS brk
        |  FROM hits),
        |grp AS (SELECT doc_id, pos, e,
        |          SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
        |        FROM isl),
        |spans AS (SELECT doc_id, max(e) - min(pos) + 1 AS span_len
        |          FROM grp GROUP BY doc_id, gid),
        |cov AS (SELECT doc_id, sum(span_len) AS dup_chars
        |        FROM spans GROUP BY doc_id),
        |big AS (
        |  SELECT doc_id, lang, unnest(list_distinct(list_transform(
        |    generate_series(1, length(text) - 1),
        |    i -> lower(text)[i:i+1]))) AS bigram
        |  FROM documents WHERE length(text) >= 2),
        |prof AS (
        |  SELECT lang, bigram FROM (
        |    SELECT lang, bigram,
        |      row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, bigram) AS rk
        |    FROM big GROUP BY lang, bigram)
        |  WHERE rk <= 50),
        |lhits AS (
        |  SELECT b.doc_id, p.lang, count(*) AS overlap
        |  FROM (SELECT DISTINCT doc_id, bigram FROM big) b
        |  JOIN prof p USING (bigram)
        |  GROUP BY b.doc_id, p.lang),
        |pred AS (SELECT doc_id, lang AS predicted_lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY overlap DESC, lang) AS rk
        |  FROM lhits) WHERE rk = 1),
        |surv AS (SELECT text, min(doc_id) AS survivor_id
        |         FROM documents GROUP BY text),
        |stats AS (SELECT doc_id, text, lang,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  floor(CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE) * 1e6
        |    / len(string_split(text, ' ')) + 0.5) / 1e6 AS stop_ratio
        |  FROM documents)
        |SELECT d.doc_id, d.n_tok, d.stop_ratio,
        |  floor(CAST(COALESCE(c.dup_chars, 0) AS DOUBLE) * 1e6
        |    / length(d.text) + 0.5) / 1e6 AS dup_coverage,
        |  d.doc_id = s.survivor_id AS is_survivor,
        |  COALESCE(p.predicted_lang = d.lang, FALSE) AS lang_agrees,
        |  (d.doc_id = s.survivor_id AND d.n_tok >= 5 AND
        |   floor(CAST(COALESCE(c.dup_chars, 0) AS DOUBLE) * 1e6
        |     / length(d.text) + 0.5) / 1e6 <= 0.5) AS keep
        |FROM stats d
        |JOIN surv s ON d.text = s.text
        |LEFT JOIN cov c USING (doc_id)
        |LEFT JOIN pred p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // bounds check for the Count-Min sketch (q78's contract shape): the
    // oracle reproduces the exact token totals and asserts the sketch
    // guarantees — est >= true for every token (deterministic), and the
    // per-item epsilon-overcount violation rate under 2*delta (the
    // realized rate is a constant for fixed data + fixed hash seeds)
    "q106_cms_bounds" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT token) AS BIGINT) AS n_distinct,
        |  TRUE AS est_ge_true, TRUE AS overcount_rate_ok
        |FROM tok""".stripMargin,
    // bounds check for the Misra-Gries heavy-hitters sketch: the oracle
    // reproduces the exact side (total tokens, true heavy-hitter count
    // at phi = 1/64 over the q24 space-split token space) and asserts
    // the sketch's deterministic guarantees held — estimate <= true,
    // undercount <= n/k, every true heavy hitter present
    "q78_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |agg AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
        |tot AS (SELECT count(*) AS n FROM tok)
        |SELECT (SELECT n FROM tot) AS n_tokens,
        | (SELECT count(*) FROM agg WHERE cnt * 64 > (SELECT n FROM tot)) AS n_heavy,
        | true AS all_heavy_present, true AS est_within_eps""".stripMargin,
    // the Morton interleave expanded as shift/mask arithmetic — DuckDB
    // reproduces the codegen'd kernel's 16-bit z key bit-for-bit
    "q79_zorder_cells" ->
      """WITH b AS (
        |  SELECT CAST(l_partkey % 256 AS BIGINT) AS x,
        |         CAST(l_suppkey % 256 AS BIGINT) AS y
        |  FROM lineitem),
        |z AS (SELECT
        |  (((x >> 0) & 1) << 0) | (((y >> 0) & 1) << 1) |
        |  (((x >> 1) & 1) << 2) | (((y >> 1) & 1) << 3) |
        |  (((x >> 2) & 1) << 4) | (((y >> 2) & 1) << 5) |
        |  (((x >> 3) & 1) << 6) | (((y >> 3) & 1) << 7) |
        |  (((x >> 4) & 1) << 8) | (((y >> 4) & 1) << 9) |
        |  (((x >> 5) & 1) << 10) | (((y >> 5) & 1) << 11) |
        |  (((x >> 6) & 1) << 12) | (((y >> 6) & 1) << 13) |
        |  (((x >> 7) & 1) << 14) | (((y >> 7) & 1) << 15) AS z_cell
        | FROM b)
        |SELECT z_cell, count(*) AS n FROM z
        |GROUP BY z_cell ORDER BY n DESC, z_cell LIMIT 20""".stripMargin,
    // per-group band join: equi key + band bounds; the optimizer rule
    // carries the equi conjunct into the binned rewrite (composite key)
    "q80_grouped_band_join" ->
      """WITH tiers(status, tier, lo, hi) AS (VALUES
        |  ('F','f_small',1,24), ('F','f_large',25,50),
        |  ('O','o_small',1,9), ('O','o_mid',10,34), ('O','o_large',35,50),
        |  ('P','p_all',1,50)),
        |li AS (SELECT l_linestatus, CAST(l_quantity AS INT) AS qty FROM lineitem)
        |SELECT status, tier, count(*) AS n, CAST(sum(qty) AS BIGINT) AS tier_qty
        |FROM li JOIN tiers ON l_linestatus = status AND qty >= lo AND qty <= hi
        |GROUP BY status, tier ORDER BY status, tier""".stripMargin,
    // MERGE/upsert reproduced as full-outer-join + presence-flag CASE:
    // rows of the update set replace matched base rows ROW-WISE,
    // unmatched updates insert, unmatched base rows persist
    "q81_upsert" ->
      """WITH upd AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |         c_acctbal + 1000.0 AS c_acctbal,
        |         'UPGRADED' AS c_mktsegment
        |  FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal, 'NEW'
        |  FROM customer WHERE c_custkey % 97 = 0),
        |merged AS (
        |  SELECT CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment
        |              ELSE b.c_mktsegment END AS c_mktsegment,
        |         CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal
        |              ELSE b.c_acctbal END AS c_acctbal
        |  FROM customer b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey)
        |SELECT c_mktsegment, count(*) AS n,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS segment_bal
        |FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // SCD-2 fold: new versions via lead() over the change feed, open
    // dim versions closed at the key's first change, untouched keys
    // persist — then the history rolled up per segment
    "q82_scd2" ->
      """WITH dim AS (
        |  SELECT c_custkey, c_mktsegment AS segment,
        |         DATE '1990-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
        |  FROM customer),
        |changes AS (
        |  SELECT o_custkey AS c_custkey,
        |         'Y' || CAST(year(o_orderdate) AS VARCHAR) AS segment,
        |         min(o_orderdate) AS ts
        |  FROM orders WHERE o_custkey % 7 = 0
        |  GROUP BY o_custkey, year(o_orderdate)),
        |new_versions AS (
        |  SELECT c_custkey, segment, ts AS valid_from,
        |         lead(ts) OVER (PARTITION BY c_custkey ORDER BY ts) AS valid_to
        |  FROM changes),
        |first_change AS (
        |  SELECT c_custkey, min(ts) AS first_ts FROM changes GROUP BY c_custkey),
        |closed AS (
        |  SELECT d.c_custkey, d.segment, d.valid_from,
        |         CASE WHEN f.first_ts IS NOT NULL AND d.valid_to IS NULL
        |              THEN f.first_ts ELSE d.valid_to END AS valid_to
        |  FROM dim d LEFT JOIN first_change f ON d.c_custkey = f.c_custkey),
        |hist AS (
        |  SELECT * FROM closed UNION ALL SELECT * FROM new_versions)
        |SELECT segment, count(*) AS n_versions,
        |  count(CASE WHEN valid_to IS NULL THEN 1 END) AS n_open,
        |  min(valid_from) AS first_from, max(valid_from) AS last_from
        |FROM hist GROUP BY segment ORDER BY segment""".stripMargin,
    // deterministic weighted Bernoulli sample: membership is the exact
    // integer comparison u*scale < weight*2^32 on an md5-derived u, so
    // any engine computing the same md5 reproduces the sample row set
    "q83_weighted_sample" ->
      """SELECT doc_id, n_chars, lang FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      * 2000 < n_chars * 4294967296
        |ORDER BY doc_id""".stripMargin,
    // fuzzy join: levenshtein <= 2 with the length-band lower bound as
    // a candidate prefilter (never drops a true match)
    "q84_fuzzy_join" ->
      """WITH dirty(dirty) AS (VALUES ('NATON_3'),('NATIION_7'),
        |  ('XATION_21'),('NATION_2Q'),('NTION_19'),('XQZV'))
        |SELECT dirty, n_name, CAST(levenshtein(dirty, n_name) AS BIGINT) AS dist
        |FROM nation JOIN dirty
        |  ON abs(length(dirty) - length(n_name)) <= 2
        | AND levenshtein(dirty, n_name) <= 2
        |ORDER BY dirty, n_name""".stripMargin,
    // large×large fuzzy join: the PassJoin segment blocking is an
    // exact pigeonhole, so the blocked join must equal DuckDB's full
    // quadratic levenshtein join over the same corrupted prefixes
    "q85_fuzzy_corpus_join" ->
      """WITH clean AS (
        |  SELECT doc_id AS cid, substr(text, 1, 16) AS cname FROM documents),
        |dirty AS (
        |  SELECT cid AS did,
        |    CASE CAST(cid % 4 AS INTEGER)
        |      WHEN 0 THEN substr(cname, 1, 3) || substr(cname, 5, 16)
        |      WHEN 1 THEN substr(cname, 1, 6) || '#' || substr(cname, 8, 16)
        |      WHEN 2 THEN substr(cname, 1, 1) || substr(cname, 3, 7) || '#' || substr(cname, 11, 16)
        |      ELSE substr(cname, 1, 4) || 'zz' || substr(cname, 5, 16)
        |    END AS dname
        |  FROM clean),
        |pairs AS (
        |  SELECT did, cid, CAST(levenshtein(dname, cname) AS BIGINT) AS dist
        |  FROM dirty, clean WHERE levenshtein(dname, cname) <= 2)
        |SELECT dist, count(*) AS n_pairs,
        |  count(CASE WHEN did = cid THEN 1 END) AS n_self
        |FROM pairs GROUP BY dist ORDER BY dist""".stripMargin,
    // oversized band side (15k order validity windows): the rule's
    // distributed fallback must equal DuckDB's plain range join (probe
    // sliced to one shipdate month; the band side stays full-width)
    "q87_large_band_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS INTEGER)) AS BIGINT) AS qty
        |FROM lineitem JOIN orders
        |  ON CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE)
        | AND CAST(l_shipdate AS DATE) < CAST(o_orderdate AS DATE) + INTERVAL 2 DAY
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1995-03-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1995-04-01'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // the bloom prefilter admits no false negatives and the exact
    // semi-join removes false positives, so the result is the plain
    // semi-join
    "q53_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n_items,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // semantic decontamination: full rescoring of every candidate
    // (naturals + the planted ×2 copies, exact in float AND double)
    // against every benchmark vector — cosine rounded at 6 BEFORE the
    // per-candidate argmax (q22's known-parity formula + ordering), so
    // the (cos DESC, bench_id ASC) winner matches the engine's
    // array_max(struct(cos, -bid)) tie-break bit-for-bit
    "q130_semantic_decontam" ->
      """WITH emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |bench AS (SELECT vec_id AS bench_id, vec FROM emb WHERE vec_id % 29 = 0),
        |planted AS (
        |  SELECT vec_id + 1000000 AS vec_id, list_transform(vec, x -> x * 2) AS vec
        |  FROM emb WHERE vec_id % 58 = 0),
        |cand AS (
        |  SELECT vec_id, vec FROM emb WHERE vec_id % 29 <> 0
        |  UNION ALL SELECT vec_id, vec FROM planted),
        |scored AS (
        |  SELECT c.vec_id, b.bench_id,
        |    round(list_dot_product(c.vec, b.vec) /
        |      (sqrt(list_dot_product(c.vec, c.vec)) * sqrt(list_dot_product(b.vec, b.vec))), 6) AS cos
        |  FROM cand c, bench b),
        |best AS (
        |  SELECT vec_id, bench_id, cos,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, bench_id) AS rn
        |  FROM scored)
        |SELECT vec_id, bench_id, cos AS cosine FROM best
        |WHERE rn = 1 AND cos >= 0.999 ORDER BY vec_id""".stripMargin,
    // temperature mixture at the sqrt point: micro-unit masses
    // round(1e6*sqrt(cnt)) are bit-identical cross-engine (sqrt is
    // correctly rounded IEEE-754 in both); everything downstream is
    // integer arithmetic + the q121 md5-rank selection
    "q131_temperature_mixture" ->
      """WITH sizes AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        |tot AS (SELECT sum(cnt) * 3 // 5 AS t FROM sizes),
        |mass AS (SELECT lang, cnt,
        |  CAST(round(1000000 * sqrt(cnt)) AS BIGINT) AS rw FROM sizes),
        |quota AS (
        |  SELECT lang,
        |    least(cnt, (SELECT t FROM tot) * rw // (SELECT sum(rw) FROM mass)) AS n_quota
        |  FROM mass),
        |ranked AS (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS sel_rank
        |  FROM documents)
        |SELECT r.doc_id, r.lang, r.sel_rank
        |FROM ranked r JOIN quota USING (lang)
        |WHERE sel_rank <= n_quota ORDER BY doc_id""".stripMargin,
    // TF-IDF semantic decontamination: DuckDB re-derives the hashed
    // buckets (the established md5-UBIGINT idiom), candidate-corpus
    // idf, both weight tables (bench buckets unseen in candidates keep
    // the no-df idf ln(N+1) — LEFT JOIN + coalesce, mirroring the
    // engine), norms, sparse dots, and the rounded-then-argmax winner
    "q132_tfidf_decontam" ->
      """WITH cand0 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 83 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 166 = 0),
        |bench0 AS (SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % 83 = 0),
        |ctf AS (
        |  SELECT doc_id, b, count(*) AS tf FROM (
        |    SELECT doc_id,
        |      CAST(CAST(concat('0x', substr(md5(u.tok), 1, 8)) AS UBIGINT) % 1024 AS BIGINT) AS b
        |    FROM cand0, unnest(string_split(lower(text), ' ')) AS u(tok))
        |  GROUP BY doc_id, b),
        |n AS (SELECT count(*) AS nd FROM cand0),
        |idf AS (
        |  SELECT b, ln(((SELECT nd FROM n) + 1.0) / (dfb + 1.0)) AS idf
        |  FROM (SELECT b, count(*) AS dfb FROM ctf GROUP BY b)),
        |cw AS (SELECT doc_id, t.b, tf * idf.idf AS w FROM ctf t JOIN idf USING (b)),
        |cn AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM cw GROUP BY doc_id),
        |btf AS (
        |  SELECT bench_id, b, count(*) AS tf FROM (
        |    SELECT bench_id,
        |      CAST(CAST(concat('0x', substr(md5(u.tok), 1, 8)) AS UBIGINT) % 1024 AS BIGINT) AS b
        |    FROM bench0, unnest(string_split(lower(text), ' ')) AS u(tok))
        |  GROUP BY bench_id, b),
        |bw AS (
        |  SELECT bench_id, t.b,
        |    tf * coalesce(idf.idf, ln(((SELECT nd FROM n) + 1.0))) AS w
        |  FROM btf t LEFT JOIN idf USING (b)),
        |bn AS (SELECT bench_id, sqrt(sum(w * w)) AS nrm FROM bw GROUP BY bench_id),
        |dots AS (
        |  SELECT c.doc_id, b.bench_id, sum(c.w * b.w) AS dot
        |  FROM cw c JOIN bw b USING (b) GROUP BY c.doc_id, b.bench_id),
        |coss AS (
        |  SELECT d.doc_id, d.bench_id,
        |    round(d.dot / (cn.nrm * bn.nrm), 6) AS cos,
        |    row_number() OVER (PARTITION BY d.doc_id
        |      ORDER BY round(d.dot / (cn.nrm * bn.nrm), 6) DESC, d.bench_id) AS rn
        |  FROM dots d JOIN cn USING (doc_id) JOIN bn USING (bench_id)
        |  WHERE cn.nrm > 0 AND bn.nrm > 0)
        |SELECT doc_id, bench_id, cos AS cosine FROM coss
        |WHERE rn = 1 AND cos >= 0.999 ORDER BY doc_id""".stripMargin,
    // shard manifest: q92's green cumulative-sum packing CTE + a
    // generate_series explode of each doc's example span + the same
    // mod-8 round-robin — every shard row fully re-derived
    "q133_shard_manifest" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM t WHERE n_tokens > 0),
        |ex AS (
        |  SELECT doc_id, u.e AS example_id,
        |    u.e % 8 AS shard_id
        |  FROM c, unnest(generate_series(CAST(cum_before // 512 AS BIGINT),
        |    CAST((cum_before + n_tokens - 1) // 512 AS BIGINT))) AS u(e))
        |SELECT shard_id,
        |  CAST(count(DISTINCT example_id) AS BIGINT) AS n_examples,
        |  count(*) AS n_doc_slices,
        |  min(example_id) AS first_example,
        |  max(example_id) AS last_example
        |FROM ex GROUP BY shard_id ORDER BY shard_id""".stripMargin,
    // epoched temperature mixture: q131's mass/quota math WITHOUT the
    // cap — T_g split div/mod into full passes + a ranked partial
    // epoch, exploded via generate_series; every (doc, epoch) row
    // integer-exact cross-engine
    "q134_temperature_epochs" ->
      """WITH sizes AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        |tot AS (SELECT sum(cnt) * 2 // 1 AS t FROM sizes),
        |mass AS (SELECT lang, cnt,
        |  CAST(round(1000000 * sqrt(cnt)) AS BIGINT) AS rw FROM sizes),
        |quota AS (
        |  SELECT lang,
        |    ((SELECT t FROM tot) * rw // (SELECT sum(rw) FROM mass)) // cnt AS n_full,
        |    ((SELECT t FROM tot) * rw // (SELECT sum(rw) FROM mass)) % cnt AS n_extra
        |  FROM mass),
        |ranked AS (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS sel_rank
        |  FROM documents),
        |sel AS (
        |  SELECT r.doc_id, r.lang, r.sel_rank,
        |    CAST(n_full + CASE WHEN sel_rank <= n_extra THEN 1 ELSE 0 END AS BIGINT) AS n_epochs
        |  FROM ranked r JOIN quota USING (lang))
        |SELECT doc_id, lang, sel_rank, u.e AS epoch
        |FROM sel, unnest(generate_series(0, CAST(n_epochs - 1 AS BIGINT))) AS u(e)
        |WHERE n_epochs > 0 ORDER BY doc_id, epoch""".stripMargin,
    // leakage report by benchmark item: literal-gram attribution
    // (min bench doc per gram), training-stream inner join, per-bench
    // rollup including the zero-leakage rows
    "q135_leakage_report" ->
      """WITH bg AS (
        |  SELECT gram, min(doc_id) AS bench_id FROM (
        |    SELECT doc_id, substr(text, CAST(u.i AS INT), 24) AS gram
        |    FROM documents,
        |         unnest(generate_series(1, CAST(length(text) AS BIGINT) - 23)) AS u(i)
        |    WHERE doc_id % 97 = 0)
        |  GROUP BY gram),
        |tg AS (
        |  SELECT doc_id, substr(text, CAST(u.i AS INT), 24) AS gram
        |  FROM documents,
        |       unnest(generate_series(1, CAST(length(text) AS BIGINT) - 23)) AS u(i)
        |  WHERE doc_id % 97 <> 0),
        |rep AS (
        |  SELECT b.bench_id,
        |    CAST(count(DISTINCT t.doc_id) AS BIGINT) AS n_train_docs,
        |    count(*) AS n_hits
        |  FROM tg t JOIN bg b USING (gram) GROUP BY b.bench_id)
        |SELECT b0.bench_id,
        |  coalesce(rep.n_train_docs, 0) AS n_train_docs,
        |  coalesce(rep.n_hits, 0) AS n_hits
        |FROM (SELECT doc_id AS bench_id FROM documents WHERE doc_id % 97 = 0) b0
        |LEFT JOIN rep USING (bench_id) ORDER BY bench_id""".stripMargin,
    // Stupid Backoff token LM (Brants et al.): tagged (n, gram) counts
    // from one reference pass, five left joins on literal gram keys,
    // the lambda-nested backoff chain association-matched to the
    // engine's expression, bits at 6 decimals (q113 precedent)
    "q136_stupid_backoff" ->
      """WITH ref AS (
        |  SELECT string_split(lower(text), ' ') AS t FROM documents WHERE doc_id % 3 = 0),
        |cnt AS (
        |  SELECT n, g, count(*) AS c FROM (
        |    SELECT 1 AS n, unnest(t) AS g FROM ref
        |    UNION ALL
        |    SELECT 2 AS n, t[i] || ' ' || t[i+1] AS g
        |    FROM ref, unnest(generate_series(1, len(t) - 1)) AS u(i)
        |    UNION ALL
        |    SELECT 3 AS n, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        |    FROM ref, unnest(generate_series(1, len(t) - 2)) AS u(i))
        |  GROUP BY n, g),
        |scal AS (SELECT sum(c) + count(*) AS nv FROM cnt WHERE n = 1),
        |cand AS (SELECT doc_id, string_split(lower(text), ' ') AS t
        |         FROM documents WHERE doc_id % 3 <> 0),
        |tri AS (
        |  SELECT doc_id,
        |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g3,
        |    t[i] || ' ' || t[i+1] AS ctx2,
        |    t[i+1] || ' ' || t[i+2] AS bo2,
        |    t[i+1] AS w2, t[i+2] AS w3
        |  FROM cand, unnest(generate_series(1, len(t) - 2)) AS u(i)
        |  WHERE len(t) >= 3),
        |s AS (
        |  SELECT doc_id,
        |    CASE WHEN coalesce(c3.c, 0) > 0 THEN c3.c / c22.c
        |         ELSE 0.4 * (CASE WHEN coalesce(c2b.c, 0) > 0 THEN c2b.c / c1w2.c
        |                          ELSE 0.4 * ((coalesce(c1w3.c, 0) + 1.0) /
        |                            (SELECT CAST(nv AS DOUBLE) FROM scal)) END)
        |    END AS sc
        |  FROM tri
        |  LEFT JOIN cnt c3 ON c3.n = 3 AND c3.g = tri.g3
        |  LEFT JOIN cnt c22 ON c22.n = 2 AND c22.g = tri.ctx2
        |  LEFT JOIN cnt c2b ON c2b.n = 2 AND c2b.g = tri.bo2
        |  LEFT JOIN cnt c1w2 ON c1w2.n = 1 AND c1w2.g = tri.w2
        |  LEFT JOIN cnt c1w3 ON c1w3.n = 1 AND c1w3.g = tri.w3)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_transitions,
        |  round(-avg(ln(sc)) / ln(2), 6) AS bits_per_transition
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // DoReMi domain reweighting: per-doc bits via q113's green LM CTEs,
    // DECIMAL-exact domain excess losses, then the EG recurrence as an
    // unrolled MATERIALIZED chain — micro-masses integer-exact, every
    // multiplicative step floor(·+0.5) of an identical IEEE double
    "q137_doremi_mixture" -> doremiOracleSql(8),
    // corpus datasheet: q21 survivorship + q112 containment + q113 LM
    // bits aggregated per (lang, source), then ROLLUP over the BOUNDED
    // group table (subtotals = sums of sums; DECIMAL bits re-aggregate
    // exactly); micro-ratio floors and grouping flags per q4/q52
    "q138_corpus_datasheet" ->
      (s"$trainBenchSplitSql,\n${containmentHitCtesSql("tr")},\n" +
        lmCtesSql("documents") + ",\n" + lmAggCteSql + ",\n" +
        """surv AS (SELECT text, min(doc_id) AS survivor_id
        |          FROM documents GROUP BY text),
        |cd AS (SELECT DISTINCT doc_id FROM hits),
        |pd AS (
        |  SELECT d.lang, d.source,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
        |    d.n_chars,
        |    CASE WHEN d.doc_id <> s.survivor_id THEN 1 ELSE 0 END AS is_dup,
        |    CASE WHEN cd.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_contam,
        |    lm.lm_bits
        |  FROM documents d
        |  JOIN surv s ON d.text = s.text
        |  LEFT JOIN cd ON cd.doc_id = d.doc_id
        |  LEFT JOIN lm ON lm.doc_id = d.doc_id),
        |b AS (
        |  SELECT lang, source, count(*) AS nd,
        |    CAST(sum(n_tok) AS BIGINT) AS nt,
        |    CAST(sum(n_chars) AS BIGINT) AS nc,
        |    CAST(sum(is_dup) AS BIGINT) AS dup,
        |    CAST(sum(is_contam) AS BIGINT) AS cont,
        |    count(lm_bits) AS scored,
        |    sum(CAST(lm_bits AS DECIMAL(18,6))) AS sb
        |  FROM pd GROUP BY lang, source)
        |SELECT lang, source,
        |  CAST(sum(nd) AS BIGINT) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS n_tokens,
        |  CAST(sum(nc) AS BIGINT) AS n_chars,
        |  CAST(sum(dup) AS BIGINT) AS dup_docs,
        |  CAST(sum(cont) AS BIGINT) AS contaminated_docs,
        |  CAST(sum(scored) AS BIGINT) AS scored_docs,
        |  CASE WHEN sum(scored) > 0 THEN
        |    round(CAST(sum(sb) AS DOUBLE) / sum(scored), 6) END AS mean_bits,
        |  floor(CAST(sum(dup) AS DOUBLE) * 1e6 / sum(nd) + 0.5) / 1e6
        |    AS dup_frac,
        |  floor(CAST(sum(cont) AS DOUBLE) * 1e6 / sum(nd) + 0.5) / 1e6
        |    AS contam_frac,
        |  CAST(grouping(lang) AS INT) AS g_lang,
        |  CAST(grouping(source) AS INT) AS g_source
        |FROM b GROUP BY ROLLUP(lang, source)
        |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin),
    // LSH S-curve planner: the banding collision curve on a 100-point
    // midpoint grid, probabilities pinned at 9 decimals and summed as
    // DECIMAL (order-free), argmin tie-broken (cost, b, r)
    "q139_lsh_plan" ->
      """WITH cand AS (
        |  SELECT CAST(u.r AS BIGINT) AS r, CAST(128 // u.r AS BIGINT) AS b
        |  FROM unnest(generate_series(1, 128)) AS u(r)),
        |g AS (SELECT (CAST(u.i AS DOUBLE) + 0.5) / 100 AS s
        |      FROM unnest(generate_series(0, 99)) AS u(i)),
        |p AS (SELECT b, r, s,
        |        CAST(round(1 - pow(1 - pow(s, r), b), 9) AS DECIMAL(12,9)) AS pc
        |      FROM cand, g),
        |ar AS (SELECT b, r,
        |    sum(CASE WHEN s < 0.5 THEN pc
        |             ELSE CAST(0 AS DECIMAL(12,9)) END) AS sfp,
        |    sum(CASE WHEN s >= 0.5 THEN 1 - pc
        |             ELSE CAST(0 AS DECIMAL(12,9)) END) AS sfn
        |  FROM p GROUP BY b, r),
        |c AS (SELECT b, r, b * r AS n_used,
        |    floor(CAST(sfp AS DOUBLE) * 1e6 / 100 + 0.5) / 1e6 AS fp_area,
        |    floor(CAST(sfn AS DOUBLE) * 1e6 / 100 + 0.5) / 1e6 AS fn_area
        |  FROM ar),
        |k AS (SELECT *,
        |    floor((0.5 * fp_area + 0.5 * fn_area) * 1e6 + 0.5) / 1e6 AS cost
        |  FROM c)
        |SELECT b, r, n_used, fp_area, fn_area, cost,
        |  row_number() OVER (ORDER BY cost, b, r) = 1 AS is_opt
        |FROM k ORDER BY r""".stripMargin,
    // leakage-free split: q43's green cluster components + q93's green
    // md5 buckets, keyed by cluster id — one split per duplicate family
    "q140_leakage_split" ->
      ("WITH RECURSIVE " + jaccardClusterBodySql + ",\n" +
        """full0 AS (
        |  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN cl USING (doc_id)),
        |b AS (
        |  SELECT doc_id, cluster_id,
        |    CAST(CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))
        |         AS UBIGINT) % 1000 AS BIGINT) AS bucket
        |  FROM full0)
        |SELECT doc_id, cluster_id, bucket,
        |  CASE WHEN bucket < 800 THEN 'train'
        |       WHEN bucket < 900 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin),
    // length-bucketed batching: bucket = n_tokens // 32, in-bucket rank
    // by (len DESC, id), batches of 8, padding stats + micro waste
    "q141_length_batches" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, n_tokens, n_tokens // 32 AS bucket
        |  FROM t WHERE n_tokens > 0),
        |rk AS (
        |  SELECT bucket, n_tokens,
        |    (row_number() OVER (PARTITION BY bucket
        |       ORDER BY n_tokens DESC, doc_id) - 1) // 8 AS batch_in_bucket
        |  FROM base),
        |m AS (
        |  SELECT bucket, batch_in_bucket, count(*) AS n_examples,
        |    max(n_tokens) AS max_len,
        |    CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |  FROM rk GROUP BY bucket, batch_in_bucket)
        |SELECT bucket, batch_in_bucket, n_examples, max_len, sum_tokens,
        |  n_examples * max_len AS padded_tokens,
        |  n_examples * max_len - sum_tokens AS waste_tokens,
        |  floor(CAST(n_examples * max_len - sum_tokens AS DOUBLE) * 1e6
        |    / (n_examples * max_len) + 0.5) / 1e6 AS waste_frac
        |FROM m ORDER BY bucket, batch_in_bucket""".stripMargin,
    // split-leakage audit: both split schemes (q93 doc-hash, q140
    // cluster-hash) over one shared 24-gram stream; cross-boundary
    // distinct grams and leaked test docs counted per scheme
    "q142_split_leakage" ->
      ("WITH RECURSIVE " + jaccardClusterBodySql + ",\n" +
        """full0 AS (
        |  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN cl USING (doc_id)),
        |asg AS (
        |  SELECT 'doc_hash' AS scheme, doc_id,
        |    CASE WHEN bkt < 800 THEN 'train'
        |         WHEN bkt < 900 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT doc_id,
        |          CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
        |            1, 8)) AS UBIGINT) % 1000 AS BIGINT) AS bkt
        |        FROM documents)
        |  UNION ALL
        |  SELECT 'cluster_hash' AS scheme, doc_id,
        |    CASE WHEN bkt < 800 THEN 'train'
        |         WHEN bkt < 900 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT doc_id,
        |          CAST(CAST(concat('0x',
        |            substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))
        |            AS UBIGINT) % 1000 AS BIGINT) AS bkt
        |        FROM full0)),
        |gr AS (
        |  SELECT doc_id, substr(text, CAST(u.i AS INT), 24) AS gram
        |  FROM documents,
        |       unnest(generate_series(1, CAST(length(text) AS BIGINT) - 23))
        |         AS u(i)),
        |ag AS (SELECT a.scheme, a.split, g.doc_id, g.gram
        |       FROM gr g JOIN asg a USING (doc_id)),
        |tg AS (SELECT DISTINCT scheme, gram FROM ag WHERE split = 'train'),
        |lk AS (SELECT ag.scheme, ag.doc_id, ag.gram
        |       FROM ag JOIN tg ON tg.scheme = ag.scheme AND tg.gram = ag.gram
        |       WHERE ag.split = 'test'),
        |sz AS (SELECT scheme,
        |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_train,
        |    CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_test
        |  FROM asg GROUP BY scheme),
        |st AS (SELECT scheme, count(DISTINCT gram) AS shared_grams,
        |         count(DISTINCT doc_id) AS leaked_test_docs
        |       FROM lk GROUP BY scheme)
        |SELECT s.scheme, s.n_train, s.n_test,
        |  COALESCE(shared_grams, 0) AS shared_grams,
        |  COALESCE(leaked_test_docs, 0) AS leaked_test_docs
        |FROM sz s LEFT JOIN st USING (scheme) ORDER BY s.scheme""".stripMargin),
    // interpolated Kneser–Ney bigram LM (q136's split): discounted
    // bigram mass + continuation-type interpolation, the +1/(B+V)
    // unseen-word floor; association mirrors kneserNeyScore exactly
    "q143_kneser_ney" ->
      """WITH ref AS (
        |  SELECT string_split(lower(text), ' ') AS t FROM documents WHERE doc_id % 3 = 0),
        |uni AS (
        |  SELECT g, count(*) AS c FROM (SELECT unnest(t) AS g FROM ref)
        |  GROUP BY g),
        |big AS (
        |  SELECT w1, w2, count(*) AS c FROM (
        |    SELECT t[i] AS w1, t[i+1] AS w2
        |    FROM ref, unnest(generate_series(1, len(t) - 1)) AS u(i))
        |  GROUP BY w1, w2),
        |fwd AS (SELECT w1, count(*) AS n1f FROM big GROUP BY w1),
        |bwd AS (SELECT w2, count(*) AS n1b FROM big GROUP BY w2),
        |scal AS (SELECT CAST((SELECT count(*) FROM big) +
        |                     (SELECT count(*) FROM uni) AS DOUBLE) AS bv),
        |cand AS (SELECT doc_id, string_split(lower(text), ' ') AS t
        |         FROM documents WHERE doc_id % 3 <> 0),
        |pairs AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |  FROM cand, unnest(generate_series(1, len(t) - 1)) AS u(i)
        |  WHERE len(t) >= 2),
        |s AS (
        |  SELECT doc_id,
        |    CASE WHEN coalesce(c1.c, 0) > 0 AND coalesce(fwd.n1f, 0) > 0
        |      THEN greatest(coalesce(b.c, 0) - CAST(0.75 AS DOUBLE), 0.0)
        |             / c1.c
        |           + (CAST(0.75 AS DOUBLE) * fwd.n1f / c1.c) *
        |             ((coalesce(bwd.n1b, 0) + 1.0) / (SELECT bv FROM scal))
        |      ELSE (coalesce(bwd.n1b, 0) + 1.0) / (SELECT bv FROM scal)
        |    END AS p
        |  FROM pairs
        |  LEFT JOIN big b ON b.w1 = pairs.w1 AND b.w2 = pairs.w2
        |  LEFT JOIN uni c1 ON c1.g = pairs.w1
        |  LEFT JOIN fwd ON fwd.w1 = pairs.w1
        |  LEFT JOIN bwd ON bwd.w2 = pairs.w2)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_transitions,
        |  round(-avg(ln(p)) / ln(2), 6) AS bits_per_transition
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // C4 line-level cleaning battery over the deterministic c4Plant:
    // 12-word lines, (doc_id+i)%4 bare-line decoration, the four
    // injected breach lines in fixed order, then the line filter
    // (terminal punct + >=5 words + no "javascript") and page rules
    // (lorem ipsum / curly brace / >=3 surviving lines)
    "q144_c4_clean" ->
      ("WITH " + c4PlantCtesSql + ",\n" + c4BatteryTailSql("pl")),
    // CLIP-score alignment gate (LAION 0.28 cut) over the planted pair
    // table: even/odd vec_ids pair up, even pair_ids mix the image
    // vector into the text side (0.8/0.2) as the aligned mode
    "q145_clip_gate" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |img AS (SELECT vec_id // 2 AS pair_id, label AS img_label, v AS iv
        |        FROM e WHERE vec_id % 2 = 0),
        |txt AS (SELECT (vec_id - 1) // 2 AS pair_id, label AS txt_label, v AS tv
        |        FROM e WHERE vec_id % 2 = 1),
        |p AS (
        |  SELECT pair_id, img_label, txt_label, iv,
        |    CASE WHEN pair_id % 2 = 0
        |      THEN list_transform(generate_series(1, len(iv)),
        |             i -> iv[i] * 0.8 + tv[i] * 0.2)
        |      ELSE tv END AS tv2
        |  FROM img JOIN txt USING (pair_id)),
        |c AS (
        |  SELECT pair_id, img_label, txt_label,
        |    round(list_dot_product(iv, tv2) /
        |      (sqrt(list_dot_product(iv, iv)) *
        |       sqrt(list_dot_product(tv2, tv2))), 6) AS clip_cos
        |  FROM p)
        |SELECT pair_id, img_label, txt_label, clip_cos,
        |  clip_cos >= 0.28 AS keep
        |FROM c ORDER BY pair_id""".stripMargin,
    // Feistel PRP epoch-shuffle keys: 4 unrolled rounds of the md5-conv
    // round function over 20-bit halves, xor() integer-exact; every
    // table reference qualified (lateral-alias shadowing gotcha)
    "q146_epoch_shuffle" -> feistelOracleSql(rounds = 4, halfBits = 20),
    // CCNet cross-document paragraph dedup over the c4Plant corpus:
    // min-(doc_id, idx) survivor per exact line via one window, docs
    // reassembled in original line order
    "q147_paragraph_dedup" ->
      ("WITH " + c4PlantCtesSql + ",\n" + c4PlantLinesCteSql + ",\n" +
      """k AS (
        |  SELECT doc_id, idx, line,
        |    row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) AS rn
        |  FROM ex),
        |ka AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(line, chr(10) ORDER BY idx) AS cleaned_text
        |  FROM k WHERE rn = 1 GROUP BY doc_id)
        |SELECT p.doc_id, CAST(len(p.lines) AS BIGINT) AS n_lines,
        |  coalesce(ka.n_kept, 0) AS n_kept, ka.cleaned_text
        |FROM pl p LEFT JOIN ka USING (doc_id) ORDER BY p.doc_id""".stripMargin),
    // Luhn-validated PAN audit over the planted corpus: 13-19 digit
    // candidates, per-candidate checksum via the identical CASE
    // algebra, masks keep only the last 4
    "q148_luhn_audit" ->
      """WITH aug AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 6 = 0 THEN ' card 4532015112830366' ELSE '' END
        |    || CASE WHEN doc_id % 6 = 3 THEN ' card 4532015112830367' ELSE '' END
        |    || CASE WHEN doc_id % 10 = 7 THEN ' amex 371449635398431' ELSE '' END
        |    || CASE WHEN doc_id % 9 = 4 THEN ' num 123456789012' ELSE '' END
        |    AS text
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    regexp_extract_all(text, '[0-9]{13,19}') AS cands
        |  FROM aug),
        |v AS (
        |  SELECT doc_id, cands,
        |    list_filter(cands, p ->
        |      list_sum(list_transform(generate_series(1, len(reverse(p))),
        |        i -> CASE WHEN i % 2 = 0
        |          THEN CASE WHEN CAST(substr(reverse(p), i, 1) AS INT) * 2 > 9
        |            THEN CAST(substr(reverse(p), i, 1) AS INT) * 2 - 9
        |            ELSE CAST(substr(reverse(p), i, 1) AS INT) * 2 END
        |          ELSE CAST(substr(reverse(p), i, 1) AS INT) END))
        |      % 10 = 0) AS valid
        |  FROM c)
        |SELECT doc_id,
        |  CAST(len(cands) AS BIGINT) AS n_candidates,
        |  CAST(len(valid) AS BIGINT) AS n_valid,
        |  len(valid) > 0 AS has_valid_pan,
        |  coalesce(array_to_string(list_transform(valid, p ->
        |    substr('*******************', 1, len(p) - 4)
        |      || substr(p, len(p) - 3, 4)), ','), '') AS masked_pans
        |FROM v ORDER BY doc_id""".stripMargin,
    // margin-based bitext mining over the q145 planted pairs: 6-decimal
    // cosines, DECIMAL-exact kNN density sums, ratio margin as the
    // identical IEEE division, argmax + 1.06 acceptance tie-broken on id
    "q149_bitext_mine" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |src AS (SELECT vec_id // 2 AS sid, v AS sv FROM e WHERE vec_id % 2 = 0),
        |tg0 AS (SELECT (vec_id - 1) // 2 AS tid, v AS tv0
        |        FROM e WHERE vec_id % 2 = 1),
        |tgt AS (
        |  SELECT t.tid,
        |    CASE WHEN t.tid % 2 = 0
        |      THEN list_transform(generate_series(1, len(s.sv)),
        |             i -> s.sv[i] * 0.8 + t.tv0[i] * 0.2)
        |      ELSE t.tv0 END AS tv
        |  FROM tg0 t JOIN src s ON s.sid = t.tid),
        |al AS (
        |  SELECT s.sid, t.tid,
        |    round(list_dot_product(s.sv, t.tv) /
        |      (sqrt(list_dot_product(s.sv, s.sv)) *
        |       sqrt(list_dot_product(t.tv, t.tv))), 6) AS cos6
        |  FROM src s, tgt t),
        |ka AS (
        |  SELECT sid, sum(CAST(cos6 AS DECIMAL(10,6))) AS s_sum FROM (
        |    SELECT sid, cos6,
        |      row_number() OVER (PARTITION BY sid ORDER BY cos6 DESC, tid) AS rn
        |    FROM al)
        |  WHERE rn <= 4 GROUP BY sid),
        |kb AS (
        |  SELECT tid, sum(CAST(cos6 AS DECIMAL(10,6))) AS t_sum FROM (
        |    SELECT tid, cos6,
        |      row_number() OVER (PARTITION BY tid ORDER BY cos6 DESC, sid) AS rn
        |    FROM al)
        |  WHERE rn <= 4 GROUP BY tid),
        |m AS (
        |  SELECT al.sid, al.tid, al.cos6,
        |    al.cos6 / (CAST(ka.s_sum + kb.t_sum AS DOUBLE) / 8.0) AS margin
        |  FROM al JOIN ka USING (sid) JOIN kb USING (tid)),
        |mm AS (
        |  SELECT sid, tid, cos6, round(margin, 6) AS margin6,
        |    row_number() OVER (PARTITION BY sid ORDER BY margin DESC, tid) AS rm
        |  FROM m)
        |SELECT sid AS pair_id, tid AS mined_tid, cos6 AS cosine,
        |  margin6 AS margin, margin6 >= 1.06 AS accepted,
        |  (margin6 >= 1.06 AND tid = sid AND sid % 2 = 0) AS recovered
        |FROM mm WHERE rm = 1 ORDER BY pair_id""".stripMargin,
    // composed CCNet->C4 cleaning: q147's paragraph-dedup CTEs feed
    // q144's line/page battery; empty-survivor docs coalesce to ''
    // before contains() (array_to_string([]) is NULL in DuckDB)
    "q150_ccnet_c4_clean" ->
      ("WITH " + c4PlantCtesSql + ",\n" + c4PlantLinesCteSql + ",\n" +
      """k AS (
        |  SELECT doc_id, idx, line,
        |    row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) AS rn
        |  FROM ex),
        |ka AS (
        |  SELECT doc_id, list(line ORDER BY idx) AS lk
        |  FROM k WHERE rn = 1 GROUP BY doc_id),
        |dd AS (
        |  SELECT p.doc_id, CAST(len(p.lines) AS BIGINT) AS n_raw,
        |    coalesce(ka.lk, CAST([] AS VARCHAR[])) AS lines
        |  FROM pl p LEFT JOIN ka USING (doc_id)),
        |f AS (
        |  SELECT doc_id, n_raw, lines,
        |    list_filter(lines, l ->
        |      (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?')
        |        OR ends_with(l, '"'))
        |      AND len(string_split(l, ' ')) >= 5
        |      AND NOT contains(l, 'javascript')) AS kept,
        |    coalesce(array_to_string(lines, chr(10)), '') AS full_text
        |  FROM dd),
        |g AS (
        |  SELECT doc_id, n_raw,
        |    CAST(len(lines) AS BIGINT) AS n_dedup,
        |    CAST(len(kept) AS BIGINT) AS n_kept,
        |    contains(full_text, 'lorem ipsum') AS has_lorem,
        |    contains(full_text, '{') AS has_brace,
        |    kept
        |  FROM f)
        |SELECT doc_id, n_raw, n_dedup, n_kept, has_lorem, has_brace,
        |  (NOT has_lorem) AND (NOT has_brace) AND n_kept >= 3 AS keep,
        |  CASE WHEN (NOT has_lorem) AND (NOT has_brace) AND n_kept >= 3
        |    THEN array_to_string(kept, chr(10)) END AS cleaned_text
        |FROM g ORDER BY doc_id""".stripMargin),
    // deletion blast radius over the q92 packing: per tainted example,
    // deleted/surviving token masses from pure interval algebra on the
    // global tape (prefix sums re-derived, %37==5 delete list)
    "q151_deletion_blast" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start
        |  FROM t WHERE n_tokens > 0),
        |p AS (
        |  SELECT doc_id, n_tokens, tok_start,
        |    CAST(tok_start // 512 AS BIGINT) AS fe,
        |    CAST((tok_start + n_tokens - 1) // 512 AS BIGINT) AS le,
        |    doc_id % 37 = 5 AS is_deleted
        |  FROM c),
        |s AS (
        |  SELECT is_deleted, CAST(u.e AS BIGINT) AS example_id,
        |    least(tok_start + n_tokens - 1, (u.e + 1) * 512 - 1)
        |      - greatest(tok_start, u.e * 512) + 1 AS tok_in_ex
        |  FROM p, unnest(generate_series(fe, le)) AS u(e)),
        |tn AS (SELECT DISTINCT example_id FROM s WHERE is_deleted)
        |SELECT s.example_id,
        |  CAST(sum(CASE WHEN is_deleted THEN tok_in_ex ELSE 0 END) AS BIGINT)
        |    AS deleted_tokens,
        |  CAST(sum(CASE WHEN NOT is_deleted THEN tok_in_ex ELSE 0 END) AS BIGINT)
        |    AS surviving_tokens,
        |  count(*) AS n_docs_touched,
        |  CAST(sum(CASE WHEN NOT is_deleted THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_surviving_docs
        |FROM s JOIN tn USING (example_id)
        |GROUP BY s.example_id ORDER BY s.example_id""".stripMargin,
    // cross-source vocabulary Jaccard via deterministic 128-perm
    // MinHash signatures: md5-conv permutation hashes, per-slot mins,
    // agreement counts, AND the exact set Jaccard — estimate and truth
    // both hash-checked (micro-unit ratios)
    "q152_source_minhash" ->
      """WITH words AS (
        |  SELECT DISTINCT source, w FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE len(w) > 0),
        |sigs AS (
        |  SELECT source, i,
        |    min(CAST(CAST(concat('0x',
        |      substr(md5(w || ':' || CAST(i AS VARCHAR)), 1, 8))
        |      AS UBIGINT) AS BIGINT)) AS mh
        |  FROM words, unnest(generate_series(1, 128)) AS u(i)
        |  GROUP BY source, i),
        |est AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT)
        |      AS matches
        |  FROM sigs a JOIN sigs b ON a.i = b.i AND a.source < b.source
        |  GROUP BY a.source, b.source),
        |sz AS (SELECT source, count(*) AS n FROM words GROUP BY source),
        |inter AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    count(*) AS n_inter
        |  FROM words a JOIN words b ON a.w = b.w AND a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT e.source_a, e.source_b, sa.n AS n_a, sb.n AS n_b,
        |  coalesce(i.n_inter, 0) AS n_inter, e.matches,
        |  floor(CAST(e.matches AS DOUBLE) * 1e6 / 128 + 0.5) / 1e6
        |    AS est_jaccard,
        |  floor(CAST(coalesce(i.n_inter, 0) AS DOUBLE) * 1e6
        |    / (sa.n + sb.n - coalesce(i.n_inter, 0)) + 0.5) / 1e6
        |    AS exact_jaccard
        |FROM est e
        |LEFT JOIN inter i USING (source_a, source_b)
        |JOIN sz sa ON sa.source = e.source_a
        |JOIN sz sb ON sb.source = e.source_b
        |ORDER BY source_a, source_b""".stripMargin,
    // post-deletion repack: both packing prefix sums re-derived (all
    // docs vs survivors), every old/new coordinate and the moved flag
    // hash-checked
    "q153_repack_deleted" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start
        |  FROM t WHERE n_tokens > 0),
        |old AS (
        |  SELECT doc_id, n_tokens, tok_start,
        |    CAST(tok_start // 512 AS BIGINT) AS old_first,
        |    CAST((tok_start + n_tokens - 1) // 512 AS BIGINT) AS old_last
        |  FROM c),
        |c2 AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ts2
        |  FROM t WHERE n_tokens > 0 AND doc_id % 37 <> 5),
        |fresh AS (
        |  SELECT doc_id,
        |    CAST(ts2 // 512 AS BIGINT) AS new_first,
        |    CAST((ts2 + n_tokens - 1) // 512 AS BIGINT) AS new_last
        |  FROM c2)
        |SELECT o.doc_id, o.n_tokens, CAST(o.tok_start AS BIGINT) AS tok_start,
        |  o.old_first, o.old_last, f.new_first, f.new_last,
        |  (o.old_first <> f.new_first OR o.old_last <> f.new_last) AS moved
        |FROM old o JOIN fresh f USING (doc_id)
        |ORDER BY o.doc_id""".stripMargin,
    // RETRO chunk-neighbor manifest: 96/96 chunking, hashed TF-IDF
    // over word-TRIGRAM shingles (65536 buckets, df-capped at 100),
    // posting-list dots, top-2 neighbors from OTHER docs ranked by
    // rounded cosine with id tie-breaks
    "q154_chunk_neighbors" ->
      """WITH ch AS (
        |  SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_id,
        |    substr(text, CAST(u.i * 96 + 1 AS INT), 96) AS chunk_text
        |  FROM documents, unnest(generate_series(0,
        |    CAST(CASE WHEN len(text) <= 96 THEN 0
        |      ELSE (len(text) - 96 + 95) // 96 END AS BIGINT))) AS u(i)
        |  WHERE len(text) > 0),
        |ct AS (
        |  SELECT doc_id, chunk_id,
        |    list_filter(string_split(lower(chunk_text), ' '),
        |      x -> len(x) > 0) AS t
        |  FROM ch),
        |tf AS (
        |  SELECT doc_id, chunk_id,
        |    CAST(CAST(concat('0x', substr(md5(g), 1, 8)) AS UBIGINT)
        |      % 65536 AS BIGINT) AS b,
        |    count(*) AS tf
        |  FROM (SELECT doc_id, chunk_id,
        |          t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        |        FROM ct, unnest(generate_series(1, len(t) - 2)) AS u(i)
        |        WHERE len(t) >= 3)
        |  GROUP BY 1, 2, 3),
        |nc AS (SELECT count(*) AS n FROM ch),
        |idf AS (
        |  SELECT b, ln(((SELECT n FROM nc) + 1.0) / (count(*) + 1.0)) AS idf
        |  FROM tf GROUP BY b HAVING count(*) <= 100),
        |w AS (
        |  SELECT doc_id, chunk_id, tf.b, tf.tf * idf.idf AS w
        |  FROM tf JOIN idf USING (b)),
        |nrm AS (
        |  SELECT doc_id, chunk_id, sqrt(sum(w * w)) AS nrm
        |  FROM w GROUP BY 1, 2),
        |dots AS (
        |  SELECT a.doc_id, a.chunk_id,
        |    b.doc_id AS nb_doc, b.chunk_id AS nb_chunk, sum(a.w * b.w) AS dot
        |  FROM w a JOIN w b ON a.b = b.b AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2, 3, 4),
        |cosd AS (
        |  SELECT d.doc_id, d.chunk_id, d.nb_doc, d.nb_chunk,
        |    round(d.dot / (na.nrm * nb.nrm), 6) AS cos
        |  FROM dots d
        |  JOIN nrm na ON na.doc_id = d.doc_id AND na.chunk_id = d.chunk_id
        |  JOIN nrm nb ON nb.doc_id = d.nb_doc AND nb.chunk_id = d.nb_chunk),
        |rk AS (
        |  SELECT doc_id, chunk_id, nb_doc, nb_chunk, cos,
        |    row_number() OVER (PARTITION BY doc_id, chunk_id
        |      ORDER BY cos DESC, nb_doc, nb_chunk) AS rank
        |  FROM cosd)
        |SELECT doc_id, chunk_id, CAST(rank AS BIGINT) AS rank,
        |  nb_doc, nb_chunk, cos
        |FROM rk WHERE rank <= 2
        |ORDER BY doc_id, chunk_id, rank""".stripMargin,
    // contrastive (anchor, positive, hard-negative) triples: q43's
    // recursive cluster body + the sub-threshold [0.02, 0.1) pair band
    // off the SAME shared/sizes CTEs; positives = min-id other member,
    // negatives = cross-cluster argmax jaccard (rounded, id tie-break)
    "q155_contrastive_pairs" ->
      ("WITH RECURSIVE " + jaccardClusterBodySql + ",\n" +
        """pn AS (
        |  SELECT doc_a, doc_b,
        |    round(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) AS j
        |  FROM shared
        |  JOIN sizes na ON doc_a = na.doc_id
        |  JOIN sizes nb ON doc_b = nb.doc_id
        |  WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.02),
        |dp AS (SELECT doc_a AS doc_id, doc_b AS cand, j FROM pn
        |       UNION ALL SELECT doc_b AS doc_id, doc_a AS cand, j FROM pn),
        |ft AS (SELECT cluster_id, min(doc_id) AS m1 FROM cl GROUP BY cluster_id),
        |ft2 AS (SELECT c2.cluster_id, min(c2.doc_id) AS m2
        |        FROM cl c2 JOIN ft USING (cluster_id)
        |        WHERE c2.doc_id > ft.m1 GROUP BY c2.cluster_id),
        |pos AS (
        |  SELECT m.doc_id, m.cluster_id,
        |    CASE WHEN m.doc_id = ft.m1 THEN ft2.m2 ELSE ft.m1 END AS positive_id
        |  FROM cl m JOIN ft USING (cluster_id) JOIN ft2 USING (cluster_id)),
        |nb2 AS (
        |  SELECT d.doc_id, d.cand, d.j,
        |    row_number() OVER (PARTITION BY d.doc_id
        |      ORDER BY d.j DESC, d.cand) AS rn
        |  FROM dp d
        |  JOIN cl ma ON ma.doc_id = d.doc_id
        |  LEFT JOIN cl mb ON mb.doc_id = d.cand
        |  WHERE mb.doc_id IS NULL OR mb.cluster_id <> ma.cluster_id)
        |SELECT p.doc_id AS anchor_id, p.cluster_id, p.positive_id,
        |  n.cand AS negative_id, n.j AS neg_jaccard
        |FROM pos p LEFT JOIN (SELECT * FROM nb2 WHERE rn = 1) n USING (doc_id)
        |ORDER BY anchor_id""".stripMargin),
    // quality-aware dedup survivor: q43's cluster body + q113's LM
    // CTEs; per cluster the lowest-bits member survives (NULLS LAST,
    // id tie-break)
    "q156_quality_survivors" ->
      ("WITH RECURSIVE " + jaccardClusterBodySql + ",\n" +
        lmCtesSql("documents") + ",\n" + lmAggCteSql + ",\n" +
        """mm AS (
        |  SELECT c.doc_id, c.cluster_id, lm.lm_bits,
        |    row_number() OVER (PARTITION BY c.cluster_id
        |      ORDER BY lm.lm_bits ASC NULLS LAST, c.doc_id) AS rn
        |  FROM cl c LEFT JOIN lm USING (doc_id))
        |SELECT doc_id, cluster_id, lm_bits, rn = 1 AS is_survivor
        |FROM mm ORDER BY doc_id""".stripMargin),
    // delta dedup: new batch (incl. planted byte-copies %7 and
    // first-word-mutated copies %11) against the %5<>0 corpus; exact
    // via text equality (min corpus id), near via cross-side trigram
    // Jaccard over union-df-capped posting lists (argmax, id tie-break)
    "q157_delta_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
        |fresh AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
        |  WHERE doc_id % 7 = 0 AND doc_id % 5 <> 0
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id,
        |    'mutated' || substr(text, instr(text, ' '), 1000000) AS text
        |  FROM documents WHERE doc_id % 11 = 0 AND doc_id % 5 <> 0),
        |ex AS (
        |  SELECT f.doc_id, min(c.doc_id) AS exact_id
        |  FROM fresh f LEFT JOIN corpus c ON c.text = f.text
        |  GROUP BY f.doc_id),
        |nf AS (
        |  SELECT f.doc_id, f.text FROM fresh f
        |  JOIN ex ON ex.doc_id = f.doc_id WHERE ex.exact_id IS NULL),
        |tn AS (SELECT doc_id, string_split(text, ' ') AS t FROM nf
        |       WHERE len(string_split(text, ' ')) >= 3),
        |tc AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus
        |       WHERE len(string_split(text, ' ')) >= 3),
        |shn AS (SELECT DISTINCT doc_id,
        |          t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        |        FROM tn, unnest(generate_series(1, len(t) - 2)) AS u(i)),
        |shc AS (SELECT DISTINCT doc_id,
        |          t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        |        FROM tc, unnest(generate_series(1, len(t) - 2)) AS u(i)),
        |sha AS (SELECT doc_id, 'n' AS side, s FROM shn
        |        UNION ALL SELECT doc_id, 'c' AS side, s FROM shc),
        |hot AS (SELECT s FROM sha GROUP BY s HAVING count(*) > 100),
        |shf AS (SELECT * FROM sha WHERE s NOT IN (SELECT s FROM hot)),
        |sizes AS (SELECT side, doc_id, count(*) AS n FROM shf
        |          GROUP BY side, doc_id),
        |shared AS (
        |  SELECT a.doc_id, b.doc_id AS c_id, count(*) AS c
        |  FROM shf a JOIN shf b ON a.s = b.s
        |  WHERE a.side = 'n' AND b.side = 'c'
        |  GROUP BY a.doc_id, b.doc_id),
        |near0 AS (
        |  SELECT sh2.doc_id, sh2.c_id,
        |    CAST(sh2.c AS DOUBLE) / (na.n + nb.n - sh2.c) AS jacc
        |  FROM shared sh2
        |  JOIN sizes na ON na.side = 'n' AND na.doc_id = sh2.doc_id
        |  JOIN sizes nb ON nb.side = 'c' AND nb.doc_id = sh2.c_id),
        |near AS (
        |  SELECT doc_id, c_id AS near_id, round(jacc, 6) AS near_jaccard,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY round(jacc, 6) DESC, c_id) AS rn
        |  FROM near0 WHERE jacc >= 0.1)
        |SELECT f.doc_id,
        |  CASE WHEN ex.exact_id IS NOT NULL THEN 'exact_dup'
        |       WHEN nr.near_id IS NOT NULL THEN 'near_dup'
        |       ELSE 'fresh' END AS verdict,
        |  coalesce(ex.exact_id, nr.near_id) AS match_id,
        |  CASE WHEN ex.exact_id IS NULL THEN nr.near_jaccard END AS near_jaccard
        |FROM fresh f
        |JOIN ex USING (doc_id)
        |LEFT JOIN (SELECT * FROM near WHERE rn = 1) nr USING (doc_id)
        |ORDER BY f.doc_id""".stripMargin,
    // per-line LM scoring over the c4Plant corpus: lines keyed
    // doc_id*10+idx, scored through the q113 LM CTEs, keys split back
    "q158_line_lm" ->
      ("WITH " + c4PlantCtesSql + ",\n" + c4PlantLinesCteSql + ",\n" +
        """lrel AS (
        |  SELECT doc_id * 1000000 + idx AS doc_id, line AS text FROM ex)""".stripMargin +
        ",\n" + lmCtesSql("lrel") + ",\n" + lmAggCteSql + "\n" +
        """SELECT CAST(lm.doc_id // 1000000 AS BIGINT) AS doc_id,
        |  CAST(lm.doc_id % 1000000 AS BIGINT) AS idx,
        |  lm.lm_bits, lm.lm_bits > 6.0 AS is_bad
        |FROM lm ORDER BY doc_id, idx""".stripMargin),
    // CCNet line removal: q158's chain at the 4.2 cut, bad lines
    // dropped, survivors reassembled in order (unscored lines kept)
    "q159_line_lm_clean" ->
      ("WITH " + c4PlantCtesSql + ",\n" + c4PlantLinesCteSql + ",\n" +
        """lrel AS (
        |  SELECT doc_id * 1000000 + idx AS doc_id, line AS text FROM ex)""".stripMargin +
        ",\n" + lmCtesSql("lrel") + ",\n" + lmAggCteSql + ",\n" +
        """fl AS (
        |  SELECT CAST(doc_id // 1000000 AS BIGINT) AS doc_id,
        |    CAST(doc_id % 1000000 AS BIGINT) AS idx,
        |    lm_bits > 4.2 AS is_bad
        |  FROM lm),
        |ka AS (
        |  SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(e.line, chr(10) ORDER BY e.idx) AS cleaned_text
        |  FROM ex e
        |  LEFT JOIN fl ON fl.doc_id = e.doc_id AND fl.idx = e.idx
        |  WHERE NOT coalesce(fl.is_bad, FALSE)
        |  GROUP BY e.doc_id)
        |SELECT p.doc_id, CAST(len(p.lines) AS BIGINT) AS n_lines,
        |  coalesce(ka.n_kept, 0) AS n_kept, ka.cleaned_text
        |FROM pl p LEFT JOIN ka USING (doc_id)
        |ORDER BY p.doc_id""".stripMargin),
    // curriculum manifest: q120's tercile CTEs -> stage, then the q146
    // Feistel rounds keyed by the STAGE (independent per-stage orders)
    "q160_curriculum" ->
      (s"WITH ${lmCtesSql("(SELECT * FROM documents WHERE doc_id % 3 <> 0)")},\n$lmAggCteSql,\n" +
        """m AS (SELECT doc_id,
        |         CAST(floor(lm_bits * 1e6 + 0.5) AS BIGINT) AS bits_micro
        |       FROM lm),
        |c AS (SELECT
        |  CAST(floor(quantile_cont(bits_micro, CAST(1 AS DOUBLE)/3) + 0.5) AS BIGINT) AS c1,
        |  CAST(floor(quantile_cont(bits_micro, CAST(2 AS DOUBLE)/3) + 0.5) AS BIGINT) AS c2
        |  FROM m),
        |st AS (
        |  SELECT doc_id,
        |    CASE WHEN bits_micro <= c1 THEN 'head'
        |         WHEN bits_micro <= c2 THEN 'middle'
        |         ELSE 'tail' END AS bucket,
        |    CASE WHEN bits_micro <= c1 THEN 0
        |         WHEN bits_micro <= c2 THEN 1 ELSE 2 END AS stage
        |  FROM m, c),
        |r0 AS (
        |  SELECT doc_id, bucket, stage,
        |    (doc_id // 1048576) % 1048576 AS l, doc_id % 1048576 AS r
        |  FROM st)""".stripMargin + ",\n" +
        feistelRoundsSql(4, 20, "stage", Seq("doc_id", "bucket", "stage")) +
        "\n" +
        """SELECT doc_id, bucket, CAST(stage AS BIGINT) AS stage,
        |  t.l * 1048576 + t.r AS order_key
        |FROM r4 t ORDER BY doc_id""".stripMargin),
    // blocked bitext-miner parity bound (q127's contract shape): both
    // arms are deterministic (fixed KMeans seed, id tie-breaks), so
    // planted-pair recovery parity vs the exact arm is a fixed boolean
    // per dataset; the query computes it, the oracle states true
    "q161_bitext_blocked" ->
      "SELECT 'margin_mine_blocked' AS method, true AS parity_ok",
    // SoftDedup reweighting: q43's green cluster CTEs -> 1/|cluster|
    // micro-weights (integer-exact) + q83's md5 Bernoulli membership
    "q162_soft_dedup" ->
      ("WITH RECURSIVE " + jaccardClusterBodySql + ",\n" +
        """sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
        |        FROM cl GROUP BY cluster_id),
        |t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |w AS (
        |  SELECT t.doc_id, t.n_tokens,
        |    COALESCE(cl.cluster_id, t.doc_id) AS cluster_id,
        |    CAST(COALESCE(sz.cluster_size, 1) AS BIGINT) AS cluster_size
        |  FROM t LEFT JOIN cl ON cl.doc_id = t.doc_id
        |         LEFT JOIN sz ON sz.cluster_id = cl.cluster_id)
        |SELECT doc_id, cluster_id, cluster_size,
        |  CAST(1000000 // cluster_size AS BIGINT) AS weight_micro,
        |  n_tokens,
        |  CAST(n_tokens * (1000000 // cluster_size) AS BIGINT) AS eff_tokens_micro,
        |  CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |       AS UBIGINT) AS BIGINT) * 1000000
        |    < (1000000 // cluster_size) * 4294967296 AS sampled
        |FROM w ORDER BY doc_id""".stripMargin),
    // Moore-Lewis cross-entropy difference: the prefixed LM chain
    // TWICE (in-domain src0/src1 vs the q113 general split), rounded
    // per-doc bits, rounded diff, threshold-0 selection
    "q163_moore_lewis" ->
      ("WITH " +
        lmCtesPrefixedSql("in_",
          "(SELECT * FROM documents WHERE source IN ('src0', 'src1'))",
          "documents") + ",\n" +
        lmCtesPrefixedSql("gn_",
          "(SELECT * FROM documents WHERE doc_id % 3 = 0)",
          "documents") + ",\n" +
        """ia AS (SELECT doc_id, round(-avg(logp) / ln(2), 6) AS bits_in
        |        FROM in_j GROUP BY doc_id),
        |ga AS (SELECT doc_id, round(-avg(logp) / ln(2), 6) AS bits_gen
        |       FROM gn_j GROUP BY doc_id)
        |SELECT doc_id, bits_in, bits_gen,
        |  round(bits_in - bits_gen, 6) AS xent_diff,
        |  round(bits_in - bits_gen, 6) < 0.0 AS selected
        |FROM ia JOIN ga USING (doc_id) ORDER BY doc_id""".stripMargin),
    // UniMax water-fill re-derived as a recursive CTE over the
    // size-ordered language list (languages ascending take
    // min(remaining // left, 2*c)); ranks/cumsums via the md5 idiom
    "q164_unimax" ->
      """WITH RECURSIVE
        |t AS (
        |  SELECT * FROM (
        |    SELECT doc_id, lang,
        |      CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
        |    FROM documents)
        |  WHERE n_tokens > 0),
        |sz AS (
        |  SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS c,
        |    CAST(row_number() OVER (ORDER BY sum(n_tokens), lang) AS BIGINT) AS i,
        |    CAST(count(*) OVER () AS BIGINT) AS nl
        |  FROM t GROUP BY lang),
        |wf(i, remaining, lang, b) AS (
        |  SELECT CAST(0 AS BIGINT), CAST(40000 AS BIGINT),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
        |  UNION ALL
        |  SELECT s.i,
        |    r.remaining - least(r.remaining // (s.nl - r.i), 2 * s.c),
        |    s.lang,
        |    least(r.remaining // (s.nl - r.i), 2 * s.c)
        |  FROM wf r JOIN sz s ON s.i = r.i + 1),
        |bl AS (SELECT lang, b AS lang_budget FROM wf WHERE lang IS NOT NULL),
        |rk AS (
        |  SELECT t.doc_id, t.lang, t.n_tokens, s.c AS lang_tokens, bl.lang_budget,
        |    CAST(row_number() OVER (PARTITION BY t.lang
        |      ORDER BY md5(CAST(t.doc_id AS VARCHAR)), t.doc_id) AS BIGINT) AS sel_rank,
        |    CAST(sum(t.n_tokens) OVER (PARTITION BY t.lang
        |      ORDER BY md5(CAST(t.doc_id AS VARCHAR)), t.doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_end
        |  FROM t JOIN sz s USING (lang) JOIN bl USING (lang))
        |SELECT doc_id, lang, n_tokens, lang_tokens, lang_budget, sel_rank,
        |  CAST(lang_budget // lang_tokens AS BIGINT) AS full_epochs,
        |  cum_end <= lang_budget % lang_tokens AS in_fractional,
        |  CAST(lang_budget // lang_tokens
        |    + CASE WHEN cum_end <= lang_budget % lang_tokens THEN 1 ELSE 0 END AS BIGINT) AS copies
        |FROM rk ORDER BY doc_id""".stripMargin,
    // quality-ordered token-budget pruning: q113's LM CTEs -> window
    // prefix sum over (bits, id) order, BIGINT-cast (the q153 lesson),
    // greedy-prefix keep at the 10k budget
    "q165_budget_prune" ->
      (s"WITH ${lmCtesSql("(SELECT * FROM documents WHERE doc_id % 3 <> 0)")},\n$lmAggCteSql,\n" +
        """tt AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
        |  FROM documents WHERE doc_id % 3 <> 0),
        |j2 AS (
        |  SELECT lm.doc_id, lm.lm_bits AS score, tt.n_tokens
        |  FROM lm JOIN tt USING (doc_id) WHERE tt.n_tokens > 0),
        |c AS (
        |  SELECT doc_id, score, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY score, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
        |  FROM j2)
        |SELECT doc_id, score, n_tokens, tok_start,
        |  tok_start + n_tokens <= 10000 AS kept
        |FROM c ORDER BY doc_id""".stripMargin),
    // Gopher duplicate-line battery over the replayable repPlant:
    // micro-unit integer fractions, integer threshold compares
    "q166_dup_lines" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |b0 AS (
        |  SELECT doc_id,
        |    list_transform(
        |      generate_series(0, CAST(ceil(least(len(w), 48) / 12.0) AS INT) - 1),
        |      i -> array_to_string(w[i*12+1 : i*12+12], ' ')) AS bl
        |  FROM base),
        |rpl AS (
        |  SELECT doc_id, bl
        |    || CASE WHEN doc_id % 3 = 0 THEN [bl[1], bl[1]]
        |         ELSE CAST([] AS VARCHAR[]) END
        |    || CASE WHEN doc_id % 4 = 0 THEN [bl[len(bl)]]
        |         ELSE CAST([] AS VARCHAR[]) END AS lines
        |  FROM b0),
        |ex AS (SELECT doc_id, unnest(lines) AS line FROM rpl),
        |g AS (SELECT doc_id, line, count(*) AS c FROM ex GROUP BY 1, 2),
        |a AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
        |    CAST(count(*) AS BIGINT) AS n_distinct_lines,
        |    CAST(sum(c * length(line)) AS BIGINT) AS n_chars,
        |    CAST(sum((c - 1) * length(line)) AS BIGINT) AS dup_chars
        |  FROM g GROUP BY doc_id)
        |SELECT doc_id, n_lines, n_distinct_lines,
        |  n_lines - n_distinct_lines AS dup_lines, n_chars, dup_chars,
        |  CAST(floor((n_lines - n_distinct_lines) * 1e6 / greatest(n_lines, 1) + 0.5) AS BIGINT) AS dup_line_micro,
        |  CAST(floor(dup_chars * 1e6 / greatest(n_chars, 1) + 0.5) AS BIGINT) AS dup_char_micro,
        |  CAST(floor((n_lines - n_distinct_lines) * 1e6 / greatest(n_lines, 1) + 0.5) AS BIGINT) <= 300000
        |    AND CAST(floor(dup_chars * 1e6 / greatest(n_chars, 1) + 0.5) AS BIGINT) <= 200000 AS keep
        |FROM a ORDER BY doc_id""".stripMargin,
    // Gopher n-gram repetition battery over the same repPlant: top
    // family = occurrence-sum chars of the most frequent gram
    // (n 2..4); dup family = span-union covered word chars (n 5..10)
    "q167_ngram_repetition" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |b0 AS (
        |  SELECT doc_id,
        |    list_transform(
        |      generate_series(0, CAST(ceil(least(len(w), 48) / 12.0) AS INT) - 1),
        |      i -> array_to_string(w[i*12+1 : i*12+12], ' ')) AS bl
        |  FROM base),
        |rpl AS (
        |  SELECT doc_id, bl
        |    || CASE WHEN doc_id % 3 = 0 THEN [bl[1], bl[1]]
        |         ELSE CAST([] AS VARCHAR[]) END
        |    || CASE WHEN doc_id % 4 = 0 THEN [bl[len(bl)]]
        |         ELSE CAST([] AS VARCHAR[]) END AS lines
        |  FROM b0),
        |tok AS (SELECT doc_id,
        |  string_split(array_to_string(lines, ' '), ' ') AS t FROM rpl),
        |wch AS (SELECT doc_id,
        |  CAST(list_sum(list_transform(t, w -> length(w))) AS BIGINT) AS w_chars
        |  FROM tok),
        |ns AS (SELECT unnest(generate_series(2, 10)) AS n),
        |gx AS (
        |  SELECT tok.doc_id, ns.n, u.i AS pos,
        |    array_to_string(t[u.i : u.i + ns.n - 1], ' ') AS gram
        |  FROM tok, ns, unnest(generate_series(1, len(t) - ns.n + 1)) AS u(i)
        |  WHERE len(t) >= ns.n),
        |gc AS (SELECT doc_id, n, gram, count(*) AS c FROM gx GROUP BY 1, 2, 3),
        |tops AS (
        |  SELECT doc_id, n,
        |    CAST(c * (length(gram) - (n - 1)) AS BIGINT) AS metric_chars
        |  FROM (SELECT doc_id, n, gram, c,
        |      row_number() OVER (PARTITION BY doc_id, n
        |        ORDER BY c DESC, length(gram) DESC, gram) AS rk
        |    FROM gc WHERE n <= 4) WHERE rk = 1),
        |dpos AS (
        |  SELECT DISTINCT g.doc_id, g.n, u.k AS idx
        |  FROM gx g JOIN gc ON gc.doc_id = g.doc_id AND gc.n = g.n
        |    AND gc.gram = g.gram,
        |    unnest(generate_series(g.pos, g.pos + g.n - 1)) AS u(k)
        |  WHERE gc.c > 1 AND g.n >= 5),
        |wlen AS (
        |  SELECT doc_id, u.i AS idx, CAST(length(t[u.i]) AS BIGINT) AS wl
        |  FROM tok, unnest(generate_series(1, len(t))) AS u(i)),
        |dups AS (
        |  SELECT d.doc_id, d.n, CAST(sum(w.wl) AS BIGINT) AS metric_chars
        |  FROM dpos d JOIN wlen w USING (doc_id, idx) GROUP BY 1, 2),
        |grid AS (SELECT DISTINCT doc_id, n FROM gx),
        |fam AS (
        |  SELECT doc_id, n, 'top' AS family, metric_chars FROM tops
        |  UNION ALL
        |  SELECT g.doc_id, g.n, 'dup' AS family,
        |    COALESCE(d.metric_chars, 0) AS metric_chars
        |  FROM grid g LEFT JOIN dups d USING (doc_id, n) WHERE g.n >= 5),
        |th AS (SELECT * FROM (VALUES (2, 200000), (3, 180000), (4, 160000),
        |  (5, 150000), (6, 140000), (7, 130000), (8, 120000), (9, 110000),
        |  (10, 100000)) v(n, thr))
        |SELECT f.doc_id, CAST(f.n AS BIGINT) AS n, f.family, w.w_chars,
        |  CAST(f.metric_chars AS BIGINT) AS metric_chars,
        |  CAST(floor(f.metric_chars * 1e6 / greatest(w.w_chars, 1) + 0.5) AS BIGINT) AS frac_micro,
        |  CAST(th.thr AS BIGINT) AS threshold_micro,
        |  CAST(floor(f.metric_chars * 1e6 / greatest(w.w_chars, 1) + 0.5) AS BIGINT) <= th.thr AS ok
        |FROM fam f JOIN wch w USING (doc_id) JOIN th ON th.n = f.n
        |ORDER BY f.doc_id, f.n""".stripMargin,
    // ADMISSION v3 capstone: q125's gates with the Gopher unit
    // upgraded to the FULL battery (doc rules + dup lines + n-gram
    // repetition as ONE filter), over repetition-planted candidates —
    // every fragment shared with q112/q113/q122/q123/q125/q166/q167
    "q168_admission_v3" -> {
      val okAnd = (2 to 10).map(n => s"gf.ok_n$n").mkString(" AND ")
      val okSel = (2 to 10).map(n => s"  gf.ok_n$n,").mkString("\n")
      s"$trainBenchSplitSql,\n" +
        """trp AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 17 = 0 THEN text || chr(10) || l8 || chr(10) || l8
        |         WHEN doc_id % 19 = 0 THEN text || ' ' || p6 || ' ' || p6 || ' ' || p6 || ' ' || p6
        |         ELSE text END AS text
        |  FROM (SELECT doc_id, text,
        |      array_to_string(string_split(text, ' ')[1:8], ' ') AS l8,
        |      array_to_string(string_split(text, ' ')[1:6], ' ') AS p6
        |    FROM tr))""".stripMargin + ",\n" +
        containmentHitCtesSql("trp") + ",\n" + islandCtesSql + ",\n" +
        """cspans AS (SELECT doc_id, gid, min(pos) AS s, max(e) AS e2
        |           FROM grp GROUP BY doc_id, gid),
        |contam AS (SELECT doc_id, sum(e2 - s + 1) AS contaminated_chars
        |           FROM cspans GROUP BY doc_id)""".stripMargin +
        s",\n${lmCtesSql("trp")},\n$lmAggCteSql,\n" +
        gopherCtesSql("trp", 30, 1) + ",\n" +
        dupLineCtesSql("trp") + ",\n" +
        ngramOkCtesSql("trp") + ",\n" +
        dsirCtesSql("trp",
          "(SELECT text FROM documents WHERE source IN ('src0', 'src1'))") + ",\n" +
        """gfull AS (
        |  SELECT gb.doc_id, gb.keep AS rules_keep,
        |    dl.dup_line_micro, dl.dup_char_micro,
        |    (dl.dup_line_micro <= 300000 AND dl.dup_char_micro <= 200000) AS lines_keep,
        |""".stripMargin +
        (2 to 10).map(n =>
          s"    COALESCE(nk.ok_n$n, TRUE) AS ok_n$n").mkString(",\n") + "\n" +
        """  FROM gob gb JOIN dlk dl USING (doc_id)
        |  LEFT JOIN ngk nk USING (doc_id)),
        |surv AS (SELECT text, min(doc_id) AS survivor_id FROM trp GROUP BY text),
        |stats AS (SELECT doc_id, text,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM trp)
        |SELECT d.doc_id, d.n_tok,
        |  CAST(COALESCE(c.contaminated_chars, 0) AS BIGINT) AS contaminated_chars,
        |  COALESCE(l.lm_bits, 0.0) AS lm_bits,
        |  gf.rules_keep, gf.dup_line_micro, gf.dup_char_micro, gf.lines_keep,
        |""".stripMargin + okSel + "\n" +
        s"  ($okAnd) AS ngrams_keep,\n" +
        s"  (gf.rules_keep AND gf.lines_keep AND $okAnd) AS gopher_keep,\n" +
        """  COALESCE(w.log_weight, 0.0) AS log_weight,
        |  (COALESCE(w.log_weight, 0.0) >= -8.0) AS dsir_ok,
        |  d.doc_id = sv.survivor_id AS is_survivor,
        |  (d.doc_id = sv.survivor_id AND d.n_tok >= 5 AND
        |   COALESCE(c.contaminated_chars, 0) = 0 AND
        |   COALESCE(l.lm_bits, 0.0) <= 6.0 AND
        |""".stripMargin +
        s"   gf.rules_keep AND gf.lines_keep AND $okAnd AND\n" +
        """   COALESCE(w.log_weight, 0.0) >= -8.0) AS keep
        |FROM stats d
        |JOIN surv sv ON d.text = sv.text
        |LEFT JOIN contam c USING (doc_id)
        |LEFT JOIN lm l USING (doc_id)
        |JOIN gfull gf USING (doc_id)
        |LEFT JOIN dsw w USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin
    },
    // perceptual image dedup: DuckDB re-derives the planted pixels,
    // the 8x8 block sums, all 56 dHash gradient bits, the 4x14-bit
    // banded candidate join INCLUDING the engine's bandDfCap=1000
    // boilerplate guard (hotb/kband — inert at the fixture SFs but
    // modeled so the oracle stays exact at ANY scale), the popcount
    // verify, and the q43-shape transitive closure — every hash and
    // survivor bit-checked
    "q169_phash_dedup" ->
      """WITH RECURSIVE imgs AS (
        |  SELECT doc_id * 4 AS img_id, doc_id, 0 AS shift, FALSE AS bump
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id * 4 + 1, doc_id, 40, FALSE FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id * 4 + 2, doc_id, 0, TRUE FROM documents WHERE doc_id % 11 = 0),
        |px AS (
        |  SELECT img_id, u.i AS i,
        |    ((doc_id * 31 + u.i) * (u.i + 7) % 4093) % 200 + shift
        |      + CASE WHEN bump AND u.i < 128 AND u.i % 32 < 4 THEN 55 ELSE 0 END AS p
        |  FROM imgs, unnest(generate_series(0, 1023)) AS u(i)),
        |bs AS (
        |  SELECT img_id, (i // 32) // 4 AS r, (i % 32) // 4 AS c,
        |    CAST(sum(p) AS BIGINT) AS s
        |  FROM px GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT a.img_id, a.r * 7 + a.c AS k,
        |    CASE WHEN a.s < b.s THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
        |  FROM bs a JOIN bs b ON a.img_id = b.img_id AND a.r = b.r AND b.c = a.c + 1
        |  WHERE a.c <= 6),
        |ph AS (SELECT img_id,
        |    CAST(sum(bit * (CAST(1 AS BIGINT) << CAST(k AS INT))) AS BIGINT) AS phash
        |  FROM bits GROUP BY img_id),
        |bands AS (
        |  SELECT img_id, phash, u.b AS band, (phash >> CAST(u.b * 14 AS INT)) & 16383 AS key
        |  FROM ph, unnest(generate_series(0, 3)) AS u(b)),
        |hotb AS (
        |  SELECT band, key FROM bands GROUP BY band, key HAVING count(*) > 1000),
        |kband AS (
        |  SELECT b.img_id, b.phash, b.band, b.key FROM bands b
        |  LEFT JOIN hotb h ON b.band = h.band AND b.key = h.key
        |  WHERE h.band IS NULL),
        |prs AS (
        |  SELECT DISTINCT x.img_id AS a, y.img_id AS b
        |  FROM kband x JOIN kband y
        |    ON x.band = y.band AND x.key = y.key AND x.img_id < y.img_id
        |  WHERE bit_count(xor(x.phash, y.phash)) <= 3),
        |edges AS (SELECT a, b FROM prs UNION SELECT b, a FROM prs),
        |reach(node, peer) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.peer),
        |cl AS (SELECT node AS img_id, min(peer) AS cluster_id
        |       FROM reach GROUP BY node)
        |SELECT p.img_id, p.phash,
        |  COALESCE(cl.cluster_id, p.img_id) AS cluster_id,
        |  p.img_id = COALESCE(cl.cluster_id, p.img_id) AS is_survivor
        |FROM ph p LEFT JOIN cl USING (img_id)
        |ORDER BY p.img_id""".stripMargin,
    // unigram-LM (SentencePiece-style) Viterbi tokenization under the
    // frequency-scored char-gram vocab: DuckDB re-derives the gram
    // counts, the micro-grid costs, the 16-stage INTEGER Viterbi DP,
    // and the longest-piece backward walk — every piece boundary
    // hash-checked (prototyped against a python reference, 947/947)
    "q171_unigram_tokenize" -> unigramOracleSql(16, 200),
    // EM-fit gate (the q97/q105 fit-invariant pattern): the char
    // inventory is REAL parity (DuckDB re-derives the distinct chars
    // of the word stream); the budget/compression booleans are
    // Spark-measured contracts the oracle states
    "q172_unigram_em_gate" ->
      """SELECT CAST(count(DISTINCT c) AS BIGINT) AS n_char_pieces,
        |  TRUE AS vocab_le_budget, TRUE AS compresses
        |FROM (
        |  SELECT substr(w.word, u.i, 1) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) w,
        |    unnest(generate_series(1, length(w.word))) AS u(i)
        |  WHERE w.word <> '')""".stripMargin,
    // EM arm END TO END: the cost table the run actually fit rides in
    // as literal CTEs (Verify dumps oracleSql AFTER the queries run),
    // and DuckDB re-derives every boundary under it — see
    // Unigram.lastEmVocab
    "q173_unigram_em_tokenize" -> unigramEmOracleSql(16),
    "q174_unigram_pack" -> unigramPackOracleSql(16, 200),
    // fit-once/apply-many: vocab from the even split, targets from the
    // odd split, OOV-tolerant tail — the persisted-vocab delta path
    "q175_unigram_delta_apply" -> unigramDeltaOracleSql(16, 200),
    // video near-dup over planted frames: DuckDB re-derives every
    // frame's pixels and dHash bits (the q169 algebra, one extra frame
    // dimension), the distinct postings, the dfCap drop of the shared
    // black title-card hash, the >= minShared pair gate, and the
    // transitive closure — brightness and TRIMMED twins collapse
    "q176_video_neardup" ->
      """WITH RECURSIVE
        |assets AS (
        |  SELECT doc_id * 4 AS asset_id, doc_id, 0 AS first_f, 0 AS shift FROM documents
        |  UNION ALL
        |  SELECT doc_id * 4 + 1, doc_id, 0, 40 FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id * 4 + 2, doc_id, 2, 0 FROM documents WHERE doc_id % 9 = 0),
        |px AS (
        |  SELECT asset_id, fr.f AS f, u.i AS i,
        |    CASE WHEN fr.f = 0 THEN 0
        |         ELSE ((doc_id * 131 + fr.f * 977 + u.i * 61 + 1) * (u.i + 7) % 1048573) % 200 + shift END AS p
        |  FROM assets, unnest(generate_series(0, 5)) AS fr(f),
        |    unnest(generate_series(0, 1023)) AS u(i)
        |  WHERE fr.f >= first_f),
        |bs AS (
        |  SELECT asset_id, f, (i // 32) // 4 AS r, (i % 32) // 4 AS c,
        |    CAST(sum(p) AS BIGINT) AS s
        |  FROM px GROUP BY 1, 2, 3, 4),
        |bits AS (
        |  SELECT a.asset_id, a.f, a.r * 7 + a.c AS k,
        |    CASE WHEN a.s < b.s THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
        |  FROM bs a JOIN bs b ON a.asset_id = b.asset_id AND a.f = b.f
        |    AND a.r = b.r AND b.c = a.c + 1
        |  WHERE a.c <= 6),
        |fh AS MATERIALIZED (
        |  SELECT DISTINCT asset_id, phash FROM (
        |    SELECT asset_id, f,
        |      CAST(sum(bit * (CAST(1 AS BIGINT) << CAST(k AS INT))) AS BIGINT) AS phash
        |    FROM bits GROUP BY asset_id, f)),
        |okh AS (SELECT phash FROM fh GROUP BY phash HAVING count(*) <= 100),
        |kept AS MATERIALIZED (
        |  SELECT fh.asset_id, fh.phash FROM fh JOIN okh USING (phash)),
        |prs AS (
        |  SELECT a.asset_id AS a, b.asset_id AS b
        |  FROM kept a JOIN kept b ON a.phash = b.phash AND a.asset_id < b.asset_id
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |edges AS (SELECT a, b FROM prs UNION SELECT b, a FROM prs),
        |reach(node, peer) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.peer),
        |cl AS (SELECT node AS asset_id, min(peer) AS cluster_id
        |       FROM reach GROUP BY node),
        |nfh AS (SELECT asset_id, CAST(count(*) AS BIGINT) AS n_frame_hashes
        |        FROM fh GROUP BY asset_id)
        |SELECT n.asset_id, n.n_frame_hashes,
        |  COALESCE(cl.cluster_id, n.asset_id) AS cluster_id,
        |  n.asset_id = COALESCE(cl.cluster_id, n.asset_id) AS is_survivor
        |FROM nfh n LEFT JOIN cl USING (asset_id)
        |ORDER BY n.asset_id""".stripMargin,
    // URL curation: DuckDB re-builds every planted URL byte and replays
    // the identical regexp chain (no lookaround/backreference — Java
    // and RE2 agree; each pattern matches at most once per URL, so
    // DuckDB's first-match regexp_replace equals Spark's replace-all),
    // the subdomain blocklist gate, and the canonical-URL survivor rule
    "q177_url_curation" ->
      """WITH u0 AS (
        |  SELECT doc_id,
        |    'sub' || CAST(doc_id % 3 AS VARCHAR) || '.' || source || '.com' AS host,
        |    '/docs/' || CAST(doc_id // 6 AS VARCHAR) AS path
        |  FROM documents),
        |raw AS (
        |  SELECT doc_id, CASE doc_id % 6
        |    WHEN 1 THEN 'HTTPS://' || upper(host) || ':443' || path
        |    WHEN 2 THEN 'https://' || host || path || '?utm_source=feed&utm_campaign=x'
        |    WHEN 3 THEN 'https://' || host || path || '/'
        |    WHEN 4 THEN 'https://' || host || path || '#section-2'
        |    WHEN 5 THEN 'https://' || host || path || '?page=2'
        |    ELSE 'https://' || host || path END AS url
        |  FROM u0),
        |c1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM raw),
        |c2 AS (SELECT doc_id,
        |    lower(regexp_extract(u, '^([^/]*//[^/]*)', 1)) ||
        |    regexp_extract(u, '^[^/]*//[^/]*(.*)', 1) AS u FROM c1),
        |c3 AS (SELECT doc_id, regexp_replace(u, ':(443|80)/', '/') AS u FROM c2),
        |c4 AS (SELECT doc_id,
        |    regexp_replace(u, '\?(utm_[a-z]+=[^&#]*)(&utm_[a-z]+=[^&#]*)*$', '') AS u
        |  FROM c3),
        |cu AS (SELECT doc_id, regexp_replace(u, '/$', '') AS canonical_url FROM c4),
        |bl AS (SELECT doc_id, canonical_url,
        |    regexp_extract(canonical_url, '^[a-z]+://([^/:?#]+)', 1) AS host FROM cu),
        |sv AS (SELECT canonical_url, min(doc_id) AS survivor_id FROM cu GROUP BY 1)
        |SELECT b.doc_id, b.canonical_url,
        |  (b.host = 'src1.com' OR b.host LIKE '%.src1.com') AS blocked,
        |  s.survivor_id, b.doc_id = s.survivor_id AS is_survivor
        |FROM bl b JOIN sv s USING (canonical_url)
        |ORDER BY b.doc_id""".stripMargin,
    // HTML extraction: DuckDB re-builds every planted page byte and
    // replays the identical linearization chain (DuckDB regexp_replace
    // needs the 'g' flag — Spark replaces all by default; entities use
    // plain replace(), which is all-occurrence in both engines)
    "q178_html_extract" ->
      ("""WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>' || substr(text, 1, 20) ||
        |    '</title><style>p { color: red; }</style></head><body><h1>' ||
        |    substr(text, 1, 20) || '</h1><p>' || substr(text, 21, 40) ||
        |    ' &amp; more</p><script>var x = 1;</script><p>' || substr(text, 61) ||
        |    '</p><br><div class="footer">footer text</div></body></html>' AS html
        |  FROM documents)""".stripMargin + ",\n" + htmlChainCtesSql("h") +
        "\nSELECT doc_id, extracted, CAST(length(extracted) AS BIGINT) AS n_chars" +
        "\nFROM s8 ORDER BY doc_id"),
    // crawl head composed: c4Plant pages wrapped in real HTML (style
    // body carries a '{' the extractor must discard before the brace
    // check), extracted through the q178 chain, then the q144 battery —
    // output equals q144's row for row (the extraction round-trip)
    "q179_extract_clean" ->
      ("WITH " + c4PlantCtesSql + ",\n" +
        """hw AS (
        |  SELECT doc_id,
        |    '<html><head><style>p { color: red; }</style></head><body><p>' ||
        |    array_to_string(lines, '</p><p>') ||
        |    '</p><script>var x = 1;</script></body></html>' AS html
        |  FROM pl)""".stripMargin + ",\n" + htmlChainCtesSql("hw") +
        ",\npl2 AS (SELECT doc_id, string_split(extracted, chr(10)) AS lines FROM s8),\n" +
        c4BatteryTailSql("pl2")),
    // per-language CCNet: the q120/q113 LM chain with `lang` added to
    // every model group/join key (one model per language), grouped
    // quantile_cont terciles, per-language bucket assignment — every
    // language's model counts, every doc's micro bits, and every
    // cutoff hash-checked. The lvoc INNER join drops candidates whose
    // language has no reference model (the batch arm's contract).
    "q180_ccnet_lang_buckets" -> ccnetLangOracleSql(
      "(SELECT * FROM documents WHERE doc_id % 3 = 0)",
      "(SELECT * FROM documents WHERE doc_id % 3 <> 0)",
      "(SELECT * FROM documents WHERE doc_id % 3 <> 0)"),
    // persisted per-language CCNet delta apply: models + cutoffs fit on
    // the EVEN split, the ODD docs bucketed under the loaded state —
    // DuckDB re-derives fit and apply directly, so the CurationIndex
    // round trip must be byte-invisible (the q175 pattern)
    "q186_ccnet_lang_delta" -> ccnetLangOracleSql(
      "(SELECT * FROM documents WHERE doc_id % 2 = 0 AND doc_id % 3 = 0)",
      "(SELECT * FROM documents WHERE doc_id % 2 = 0 AND doc_id % 3 <> 0)",
      "(SELECT * FROM documents WHERE doc_id % 2 = 1)"),
    // Okapi BM25 top-5: tf/dl/df/idf tables, exactly-representable
    // k1=1.25 b=0.75 constants, per-(query, doc, term) micro-unit
    // contributions summed as LONGS (no double-accumulation order),
    // rank ties on doc_id — every rank and score hash-checked
    "q187_bm25_topk" -> bm25OracleSql(53, 8),
    // the persisted-index delta query: a fresh probe set served off the
    // reloaded index — DuckDB re-derives index and ranks directly, so
    // the CurationIndex round trip must be byte-invisible
    "q188_bm25_delta_query" -> bm25OracleSql(71, 6),
    // incremental append: q187's oracle VERBATIM — the appended index
    // must serve the same probe set byte-identically to a fresh build
    "q189_bm25_append" -> bm25OracleSql(53, 8),
    // segment compaction is serve-invisible: build + append + compact,
    // then the same fresh-build oracle — layout maintenance can never
    // drift a score or a rank
    "q201_bm25_compact" -> bm25OracleSql(53, 8),
    // D4 (SemDeDup + de-prototyping): the KMeans centroids enter the
    // oracle as data (VALUES handoff); plant, assignments, epsilon-ball
    // verdicts, prototype ranks, and kept flags all re-derived
    "q202_d4_prune" -> d4OracleSql,
    // batch ANN serving off the persisted serve index: assignments,
    // probe rankings, candidate pruning, cosines, and ranks all
    // replayed from the run's own centroid VALUES (the q202 handoff)
    "q207_ivf_serve_batch" -> ivfServeOracleSql,
    // dedup-index append lifecycle: hot profile frozen at build (the
    // %4==0 quarter), postings span both generations minus that set —
    // append == frozen-profile rebuild lands in the hash
    "q209_dedup_index_append" ->
      """WITH pl AS (
        |  SELECT a.doc_id,
        |    CASE WHEN a.doc_id % 10 = 1 AND b.text IS NOT NULL
        |         THEN b.text || ' xq extra glue' ELSE a.text END AS text
        |  FROM documents a LEFT JOIN documents b ON b.doc_id = a.doc_id - 1),
        |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM pl
        |        WHERE len(string_split(text, ' ')) >= 3),
        |sh0 AS (
        |  SELECT DISTINCT doc_id,
        |   unnest(list_transform(generate_series(1, len(t) - 2),
        |     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |  FROM tok),
        |hot AS (SELECT s FROM sh0 WHERE doc_id % 4 = 0 GROUP BY s HAVING count(*) > 100),
        |post AS (SELECT doc_id AS old_id, s FROM sh0
        |         WHERE doc_id % 4 IN (0, 2) AND s NOT IN (SELECT s FROM hot)),
        |osz AS (SELECT old_id, count(*) AS n_old FROM post GROUP BY old_id),
        |shn AS (SELECT doc_id, s FROM sh0
        |        WHERE doc_id % 2 = 1 AND s NOT IN (SELECT s FROM hot)),
        |nsz AS (SELECT doc_id, count(*) AS n_new FROM shn GROUP BY doc_id),
        |shared AS (SELECT shn.doc_id, post.old_id, count(*) AS c
        |           FROM shn JOIN post USING (s) GROUP BY 1, 2),
        |scored AS (SELECT shared.doc_id, old_id,
        |    CAST(c AS DOUBLE) / (n_new + n_old - c) AS jacc
        |  FROM shared JOIN nsz USING (doc_id) JOIN osz USING (old_id)),
        |best AS (SELECT doc_id, old_id AS best_old_id,
        |    round(jacc, 6) AS jaccard, jacc >= 0.5 AS is_dup,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY round(jacc, 6) DESC, old_id) AS rk
        |  FROM scored)
        |SELECT b0.doc_id, b.best_old_id, b.jaccard,
        |  COALESCE(b.is_dup, false) AS is_dup
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) b0
        |LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (doc_id)
        |ORDER BY b0.doc_id""".stripMargin,
    // data-constrained repeat allocation: per-source token masses, the
    // literal decay-power table, greedy cumulative admission, boundary
    // fraction, and exact-decomposition token sums all re-derived
    "q208_data_constrained" ->
      """WITH ps AS (
        |  SELECT * FROM (
        |    SELECT source,
        |      CAST(sum(len(regexp_extract_all(text,
        |        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))) AS BIGINT) AS u
        |    FROM documents GROUP BY source) WHERE u > 0),
        |b AS (SELECT (sum(u) * 25) // 10 AS budget FROM ps),
        |ep AS (SELECT * FROM (VALUES (1, 1, 1), (2, 3, 4), (3, 9, 16),
        |  (4, 27, 64)) v(epoch, pn, pd)),
        |pr AS (SELECT source, u, epoch,
        |    (u * pn * 1000000) // pd AS marg FROM ps, ep),
        |rk AS (SELECT *, COALESCE(sum(u) OVER (
        |    ORDER BY marg DESC, source, epoch
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
        |  FROM pr),
        |fr AS (SELECT *,
        |    CASE WHEN cum_prev >= budget THEN 0
        |         WHEN cum_prev + u <= budget THEN 1000000
        |         ELSE ((budget - cum_prev) * 1000000) // u END AS frac
        |  FROM rk, b)
        |SELECT source,
        |  CAST(max(u) AS BIGINT) AS unique_tokens,
        |  CAST(sum(CASE WHEN frac = 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS full_epochs,
        |  CAST(COALESCE(max(CASE WHEN frac > 0 AND frac < 1000000 THEN frac END), 0) AS BIGINT) AS partial_micro,
        |  CAST(sum((u // 1000000) * frac + ((u % 1000000) * frac) // 1000000) AS BIGINT) AS alloc_tokens,
        |  CAST(sum((marg // 1000000) * frac + ((marg % 1000000) * frac) // 1000000) AS BIGINT) AS eff_micro
        |FROM fr GROUP BY source ORDER BY source""".stripMargin,
    // writing-system detection: every per-script codepoint-range count,
    // the priority-ordered dominant verdict, and the integer micro
    // fraction re-derived over the multi-script plant (ranges spelled
    // as literal codepoint classes in both engines — no property names)
    "q203_script_profile" ->
      ("""WITH pl AS (SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN repeat(chr(1084)||chr(1080)||chr(1088)||' ', 6)
        |       WHEN doc_id % 5 = 1 THEN repeat(chr(20013)||chr(25991)||chr(22788)||chr(29702), 6)
        |       WHEN doc_id % 5 = 2 THEN repeat(chr(1606)||chr(1589)||' ', 6)
        |       WHEN doc_id % 5 = 3 THEN repeat(chr(955)||chr(972)||chr(947)||chr(959)||chr(962)||' ', 6)
        |       ELSE '' END ||
        |  CASE WHEN doc_id % 5 = 4 THEN text ELSE substr(text, 1, 8) END AS t
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  CAST(length(t) - length(regexp_replace(t, '[A-Za-z\x{00C0}-\x{00D6}\x{00D8}-\x{00F6}\x{00F8}-\x{024F}]', '', 'g')) AS BIGINT) AS n_latin,
        |  CAST(length(t) - length(regexp_replace(t, '[\x{0400}-\x{04FF}]', '', 'g')) AS BIGINT) AS n_cyrillic,
        |  CAST(length(t) - length(regexp_replace(t, '[\x{0370}-\x{03FF}]', '', 'g')) AS BIGINT) AS n_greek,
        |  CAST(length(t) - length(regexp_replace(t, '[\x{4E00}-\x{9FFF}]', '', 'g')) AS BIGINT) AS n_cjk,
        |  CAST(length(t) - length(regexp_replace(t, '[\x{0600}-\x{06FF}]', '', 'g')) AS BIGINT) AS n_arabic,
        |  CAST(length(t) - length(regexp_replace(t, '[\x{0900}-\x{097F}]', '', 'g')) AS BIGINT) AS n_devanagari,
        |  CAST(length(t) - length(regexp_replace(t, '[\x{AC00}-\x{D7AF}]', '', 'g')) AS BIGINT) AS n_hangul
        |  FROM pl),
        |d AS (SELECT *,
        |  n_latin + n_cyrillic + n_greek + n_cjk + n_arabic + n_devanagari + n_hangul AS n_scripted,
        |  CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_greek AND n_latin >= n_cjk AND n_latin >= n_arabic AND n_latin >= n_devanagari AND n_latin >= n_hangul THEN 'latin'
        |       WHEN n_cyrillic >= n_greek AND n_cyrillic >= n_cjk AND n_cyrillic >= n_arabic AND n_cyrillic >= n_devanagari AND n_cyrillic >= n_hangul THEN 'cyrillic'
        |       WHEN n_greek >= n_cjk AND n_greek >= n_arabic AND n_greek >= n_devanagari AND n_greek >= n_hangul THEN 'greek'
        |       WHEN n_cjk >= n_arabic AND n_cjk >= n_devanagari AND n_cjk >= n_hangul THEN 'cjk'
        |       WHEN n_arabic >= n_devanagari AND n_arabic >= n_hangul THEN 'arabic'
        |       WHEN n_devanagari >= n_hangul THEN 'devanagari'
        |       ELSE 'hangul' END AS dominant_script
        |  FROM c)
        |SELECT doc_id, n_latin, n_cyrillic, n_greek, n_cjk, n_arabic, n_devanagari, n_hangul,
        |  dominant_script,
        |  CAST(CASE WHEN n_scripted = 0 THEN 0 ELSE
        |    (greatest(n_latin, n_cyrillic, n_greek, n_cjk, n_arabic, n_devanagari, n_hangul) * 1000000) // n_scripted END AS BIGINT) AS dominant_micro
        |FROM d ORDER BY doc_id""".stripMargin),
    // table-expressible NFKC subset: the engine's real NFKC fold vs an
    // EXPLICIT literal mapping (translate for 1:1 width/digit folds,
    // replace for 1:many ligatures) + strip_accents — agreement is
    // byte-for-byte because the plant controls every non-ASCII byte
    // (general NFKC stays spec-only: DuckDB has no NFKC transform)
    "q204_nfkc_fold" ->
      ("""WITH pl AS (SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN chr(65319)||chr(65362)||chr(65345)||chr(65350)||chr(65364)||chr(12288)||chr(65300)||chr(65298)||chr(65281)||' '
        |       WHEN doc_id % 5 = 1 THEN chr(64257)||'ne '||chr(64258)||'ow o'||chr(64256)||' '||chr(64259)||'x '||chr(64261)||'op '
        |       WHEN doc_id % 5 = 2 THEN chr(9312)||chr(9313)||chr(9320)||' x'||chr(178)||' H'||chr(8322)||'O '
        |       WHEN doc_id % 5 = 3 THEN chr(65313)||chr(769)||' '||chr(64257)||'anc'||chr(233)||' '
        |       ELSE '' END || text AS t
        |  FROM documents),
        |f AS (SELECT doc_id,
        |  strip_accents(replace(replace(replace(replace(replace(
        |    translate(t,
        |      chr(65319)||chr(65362)||chr(65345)||chr(65350)||chr(65364)||chr(12288)||chr(65300)||chr(65298)||chr(65281)||chr(9312)||chr(9313)||chr(9320)||chr(178)||chr(8322)||chr(65313),
        |      'Graft 42!12922A'),
        |    chr(64257),'fi'), chr(64258),'fl'), chr(64256),'ff'), chr(64259),'ffi'), chr(64261),'st')) AS folded
        |  FROM pl)
        |SELECT doc_id, folded, CAST(length(folded) AS BIGINT) AS n_chars
        |FROM f ORDER BY doc_id""".stripMargin),
    // session-window lifecycle audit: END-based strict acceptance,
    // gap-island merge, non-strict emission, and the stale/exactness
    // flags — all re-derived through the identical md5 arrival,
    // per-batch watermark, and island algebra (edges pinned by the
    // MemoryStream specs; see sessionAcceptanceFromArrival)
    "q205_session_audit" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |    epoch_us(ts) + CAST(CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 3600000000 AS BIGINT) - 1800000000 AS arrival_us
        |  FROM events),
        |m AS (SELECT min(arrival_us) AS a0 FROM e),
        |b AS (SELECT event_id, user_id, ts_us, (arrival_us - a0) // 3600000000 AS batch_id FROM e, m),
        |bm AS (SELECT batch_id, max(ts_us) AS b_max FROM b GROUP BY batch_id),
        |wm AS (SELECT batch_id,
        |    (max(b_max) OVER (ORDER BY batch_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) // 1000 - 600000) * 1000 AS watermark_us
        |  FROM bm),
        |fw AS (SELECT (max(ts_us) // 1000 - 600000) * 1000 AS final_wm_us FROM b),
        |ev AS (SELECT b.*, wm.watermark_us,
        |    (wm.watermark_us IS NULL OR b.ts_us + 1800000000 > wm.watermark_us) AS accepted,
        |    (wm.watermark_us IS NOT NULL AND b.ts_us + 1800000000 > wm.watermark_us AND b.ts_us <= wm.watermark_us) AS stale
        |  FROM b JOIN wm USING (batch_id)),
        |acc AS (SELECT *,
        |    CASE WHEN lag(ts_us) OVER w IS NULL OR ts_us - lag(ts_us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM ev WHERE accepted
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |si AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_seq FROM acc),
        |sess AS (SELECT user_id, sess_seq, min(ts_us) AS sess_start_us,
        |    max(ts_us) + 1800000000 AS sess_end_us,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    (sum(CASE WHEN stale THEN 1 ELSE 0 END) = 0) AS sess_exact
        |  FROM si GROUP BY user_id, sess_seq)
        |SELECT si.event_id, si.user_id, si.batch_id, si.ts_us, si.accepted, si.stale,
        |  s.sess_start_us, s.sess_end_us, s.n_events,
        |  (s.sess_end_us <= fw.final_wm_us) AS emitted, s.sess_exact
        |FROM si JOIN sess s USING (user_id, sess_seq), fw
        |UNION ALL
        |SELECT event_id, user_id, batch_id, ts_us, accepted, stale,
        |  NULL, NULL, NULL, NULL, NULL
        |FROM ev WHERE NOT accepted
        |ORDER BY event_id""".stripMargin,
    // dedup-at-ingest against the persisted shingle index: postings,
    // frozen hot profile, sizes, shared counts, tie-broken argmax and
    // raw-ratio verdicts all re-derived from literal shingles over the
    // same parity split (hashing changes no count — the q39 argument)
    "q206_delta_dedup" ->
      """WITH pl AS (
        |  SELECT a.doc_id,
        |    CASE WHEN a.doc_id % 10 = 1 AND b.text IS NOT NULL
        |         THEN b.text || ' xq extra glue' ELSE a.text END AS text
        |  FROM documents a LEFT JOIN documents b ON b.doc_id = a.doc_id - 1),
        |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM pl
        |        WHERE len(string_split(text, ' ')) >= 3),
        |sh0 AS (
        |  SELECT DISTINCT doc_id,
        |   unnest(list_transform(generate_series(1, len(t) - 2),
        |     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |  FROM tok),
        |hot AS (SELECT s FROM sh0 WHERE doc_id % 2 = 0 GROUP BY s HAVING count(*) > 100),
        |post AS (SELECT doc_id AS old_id, s FROM sh0
        |         WHERE doc_id % 2 = 0 AND s NOT IN (SELECT s FROM hot)),
        |osz AS (SELECT old_id, count(*) AS n_old FROM post GROUP BY old_id),
        |shn AS (SELECT doc_id, s FROM sh0
        |        WHERE doc_id % 2 = 1 AND s NOT IN (SELECT s FROM hot)),
        |nsz AS (SELECT doc_id, count(*) AS n_new FROM shn GROUP BY doc_id),
        |shared AS (SELECT shn.doc_id, post.old_id, count(*) AS c
        |           FROM shn JOIN post USING (s) GROUP BY 1, 2),
        |scored AS (SELECT shared.doc_id, old_id,
        |    CAST(c AS DOUBLE) / (n_new + n_old - c) AS jacc
        |  FROM shared JOIN nsz USING (doc_id) JOIN osz USING (old_id)),
        |best AS (SELECT doc_id, old_id AS best_old_id,
        |    round(jacc, 6) AS jaccard, jacc >= 0.5 AS is_dup,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY round(jacc, 6) DESC, old_id) AS rk
        |  FROM scored)
        |SELECT b0.doc_id, b.best_old_id, b.jaccard,
        |  COALESCE(b.is_dup, false) AS is_dup
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) b0
        |LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (doc_id)
        |ORDER BY b0.doc_id""".stripMargin,
    // hybrid RRF: the shared BM25 rank chain + the q22 cosine algebra,
    // full-outer fused as 1/(60+rank) micro terms — every fused rank
    // hash-checked; RRF needs no score calibration, only ranks
    "q190_hybrid_rrf" ->
      ("WITH " + bm25CtesSql(53, 8) + ",\n" + hybridFusionCtesSql + "\n" +
        """SELECT query_id, rank, doc_id, rrf_micro, lex_rank, sem_rank
        |FROM fr WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
    // retrieval eval: MRR@5 / recall@5 of lexical vs hybrid with the
    // probe's source doc as the relevance label; reciprocal ranks on
    // the micro grid, rollup sums longs — the hybrid lift itself is
    // the oracled contract (hybrid_no_worse)
    "q191_retrieval_eval" ->
      ("WITH " + bm25CtesSql(53, 8) + ",\n" + hybridFusionCtesSql + ",\n" +
        """lexself AS (SELECT query_id, CAST(floor(1e6 / rank + 0.5) AS BIGINT) AS rr
        |            FROM r WHERE rank <= 5 AND doc_id = query_id),
        |hybself AS (SELECT query_id, CAST(floor(1e6 / rank + 0.5) AS BIGINT) AS rr
        |            FROM fr WHERE rank <= 5 AND doc_id = query_id),
        |per AS (
        |  SELECT q.query_id,
        |    COALESCE(l.rr, 0) AS lex_rr, COALESCE(h.rr, 0) AS hyb_rr
        |  FROM (SELECT query_id FROM qsrc) q
        |  LEFT JOIN lexself l USING (query_id)
        |  LEFT JOIN hybself h USING (query_id))
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(sum(CASE WHEN lex_rr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS lex_hits5,
        |  CAST(sum(CASE WHEN hyb_rr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS hyb_hits5,
        |  CAST(sum(lex_rr) AS BIGINT) AS lex_mrr_sum_micro,
        |  CAST(sum(hyb_rr) AS BIGINT) AS hyb_mrr_sum_micro,
        |  sum(hyb_rr) >= sum(lex_rr) AS hybrid_no_worse
        |FROM per""".stripMargin),
    // IVF-hybrid recall bounds: the production semantic arm (q88's
    // IVF config) against the exact hybrid under identical lexical
    // ranks and fusion — IVF ranks are engine-specific, so the oracle
    // pins the probe count and the contract booleans (the q89/q119
    // bounds pattern; the exact arm is fully hash-checked by q190/q191)
    "q192_hybrid_ivf_recall" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  TRUE AS mean_overlap_ok, TRUE AS every_probe_overlaps
        |FROM documents WHERE doc_id % 53 = 0""".stripMargin,
    // the SHIPPED hybrid (IVF semantic arm, q88/q192's config) served
    // and hash-checked: the engine-specific IVF ranks enter the oracle
    // as data (VALUES handoff from the run itself); DuckDB re-derives
    // the lexical chain, the full-outer fusion, every micro RRF score,
    // and every fused rank on top of them
    "q199_hybrid_ivf_serve" -> ivfHybridOracleSql,
    // T4's late-data acceptance boundary, batch-oracled: md5 arrival
    // jitter, 1-hour micro-batches, the ms-truncated watermark rule and
    // the strict microsecond compare (both edges pinned to streaming
    // behavior by MemoryStream probes in StreamingSpec) — every batch
    // id, watermark, and accept/drop verdict re-derived
    "q200_watermark_audit" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts) AS ts_us,
        |    epoch_us(ts) + CAST(CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 3600000000 AS BIGINT) - 1800000000 AS arrival_us
        |  FROM events),
        |m AS (SELECT min(arrival_us) AS a0 FROM e),
        |b AS (SELECT event_id, ts_us, (arrival_us - a0) // 3600000000 AS batch_id FROM e, m),
        |bm AS (SELECT batch_id, max(ts_us) AS b_max FROM b GROUP BY batch_id),
        |wm AS (SELECT batch_id,
        |    (max(b_max) OVER (ORDER BY batch_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) // 1000 - 600000) * 1000 AS watermark_us
        |  FROM bm)
        |SELECT b.event_id, b.batch_id, b.ts_us, wm.watermark_us,
        |  (wm.watermark_us IS NULL OR b.ts_us > wm.watermark_us) AS accepted
        |FROM b JOIN wm USING (batch_id) ORDER BY b.event_id""".stripMargin,
    // typo-robust trigram BM25: the full fuzzy chain — gram stream,
    // df/idf, micro contributions, ranks — re-derived over the PLANTED
    // typo probe set (second char of every word >= 4 deleted); fully
    // hash-checked, no approximation anywhere
    "q193_trigram_bm25" ->
      """WITH gsrc AS (SELECT doc_id, lower(text) AS t FROM documents WHERE length(text) >= 3),
        |gw AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, length(t) - 2),
        |    i -> t[i:i+2])) AS term
        |  FROM gsrc),
        |gtf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM gw GROUP BY doc_id, term),
        |gdl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM gtf GROUP BY doc_id),
        |gst AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM gdl),
        |gdfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM gtf GROUP BY term),
        |qsrc AS (
        |  SELECT doc_id AS query_id,
        |    array_to_string(list_transform(string_split(text, ' ')[1:8],
        |      w -> CASE WHEN length(w) >= 4 THEN substr(w, 1, 1) || substr(w, 3) ELSE w END),
        |      ' ') AS text
        |  FROM documents WHERE doc_id % 53 = 0),
        |gq AS (SELECT query_id, lower(text) AS t FROM qsrc WHERE length(text) >= 3),
        |gqt AS (
        |  SELECT DISTINCT query_id, unnest(list_transform(generate_series(1, length(t) - 2),
        |    i -> t[i:i+2])) AS term
        |  FROM gq),
        |gsc AS (
        |  SELECT gqt.query_id, gtf.doc_id,
        |    CAST(floor(
        |      ln((gst.n_docs - gdfq.df + 0.5) / (gdfq.df + 0.5) + 1.0) *
        |      ((gtf.tf * 2.25) / (gtf.tf + 1.25 * (0.25 + (0.75 * gdl.dl) /
        |        (CAST(gst.sum_dl AS DOUBLE) / gst.n_docs))))
        |      * 1e6 + 0.5) AS BIGINT) AS c
        |  FROM gqt JOIN gtf USING (term)
        |  JOIN gdfq USING (term)
        |  JOIN gdl ON gdl.doc_id = gtf.doc_id
        |  CROSS JOIN gst),
        |gagg AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_micro
        |         FROM gsc GROUP BY query_id, doc_id),
        |gr AS (SELECT query_id, doc_id, score_micro,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |           ORDER BY score_micro DESC, doc_id) AS INT) AS rank
        |       FROM gagg)
        |SELECT query_id, rank, doc_id, score_micro FROM gr WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    // shard integrity: q92's packing, per-member md5-derived hashes,
    // order-independent bit_xor digests for sent vs received (doc 97's
    // slices lost in flight) — every digest and verdict hash-checked
    "q194_shard_integrity" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM t WHERE n_tokens > 0),
        |m AS (
        |  SELECT doc_id,
        |    unnest(generate_series(CAST(cum_before // 512 AS BIGINT),
        |      CAST((cum_before + n_tokens - 1) // 512 AS BIGINT))) AS example_id
        |  FROM c),
        |mh AS (
        |  SELECT doc_id, example_id, example_id % 8 AS shard_id,
        |    CAST(CAST(concat('0x', substr(md5(doc_id || ':' || example_id), 1, 15)) AS UBIGINT) AS BIGINT) AS h
        |  FROM m),
        |sent AS (
        |  SELECT shard_id, CAST(count(DISTINCT example_id) AS BIGINT) AS n_examples,
        |    CAST(count(*) AS BIGINT) AS n_doc_slices, bit_xor(h) AS digest
        |  FROM mh GROUP BY shard_id),
        |recv AS (
        |  SELECT shard_id, bit_xor(h) AS received_digest
        |  FROM mh WHERE doc_id <> 97 GROUP BY shard_id)
        |SELECT s.shard_id, s.n_examples, s.n_doc_slices, s.digest,
        |  r.received_digest, s.digest = r.received_digest AS ok
        |FROM sent s JOIN recv r USING (shard_id) ORDER BY s.shard_id""".stripMargin,
    // per-language packing: one independent tape per language — the
    // global-pass base-subtraction must equal DuckDB's lang-partitioned
    // window prefix sum on every boundary
    "q195_pack_by_lang" ->
      """WITH t AS (
        |  SELECT lang, doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT lang, doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS g_cum
        |  FROM t WHERE n_tokens > 0)
        |SELECT lang, doc_id, n_tokens,
        |  CAST(g_cum // 512 AS BIGINT) AS first_example,
        |  CAST((g_cum + n_tokens - 1) // 512 AS BIGINT) AS last_example,
        |  CAST((g_cum + n_tokens - 1) // 512 - g_cum // 512 + 1 AS BIGINT) AS n_examples
        |FROM c ORDER BY doc_id""".stripMargin,
    // per-example composition manifest: q92's prefix sum, each doc's
    // window range unnested (generate_series), window-local span
    // arithmetic — every (window, doc, span) boundary hash-checked
    "q181_example_spans" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM t WHERE n_tokens > 0),
        |e AS (
        |  SELECT doc_id, n_tokens, cum_before,
        |    unnest(generate_series(CAST(cum_before // 512 AS BIGINT),
        |      CAST((cum_before + n_tokens - 1) // 512 AS BIGINT))) AS example_id
        |  FROM c)
        |SELECT doc_id, example_id,
        |  CAST(GREATEST(cum_before - example_id * 512, 0) AS BIGINT) AS span_start,
        |  CAST(LEAST(cum_before + n_tokens - example_id * 512, 512) AS BIGINT) AS span_end,
        |  CAST(LEAST(cum_before + n_tokens - example_id * 512, 512)
        |     - GREATEST(cum_before - example_id * 512, 0) AS BIGINT) AS span_tokens
        |FROM e ORDER BY doc_id, example_id""".stripMargin,
    // CCNet normalization → buckets: the normalized BYTES ride in the
    // output (norm_text), so the translate/digit-fold/whitespace chain
    // is hash-checked byte-for-byte alongside the buckets it induces;
    // the LM chain is q120's verbatim over the normalized relation
    "q182_ccnet_norm_buckets" ->
      (s"WITH nrm AS (SELECT doc_id, $ccnetNormSql AS text FROM documents),\n" +
        lmCtesPrefixedSql("", "(SELECT * FROM nrm WHERE doc_id % 3 = 0)",
          "(SELECT * FROM nrm WHERE doc_id % 3 <> 0)") + ",\n" +
        lmAggCteSql + ",\n" +
        """m AS (SELECT doc_id,
        |         CAST(floor(lm_bits * 1e6 + 0.5) AS BIGINT) AS bits_micro
        |       FROM lm),
        |c AS (SELECT
        |  CAST(floor(quantile_cont(bits_micro, CAST(1 AS DOUBLE)/3) + 0.5) AS BIGINT) AS c1,
        |  CAST(floor(quantile_cont(bits_micro, CAST(2 AS DOUBLE)/3) + 0.5) AS BIGINT) AS c2
        |  FROM m)
        |SELECT m.doc_id, nrm.text AS norm_text, bits_micro,
        |  CASE WHEN bits_micro <= c1 THEN 'head'
        |       WHEN bits_micro <= c2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM m JOIN nrm USING (doc_id), c ORDER BY doc_id""".stripMargin),
    // meta-robots opt-out gate composed with extraction: the plant, both
    // attribute-order probes, the case-insensitive arm, and the
    // kept-pages-only stripHtml chain all re-derived; opted-out pages
    // carry NULL extraction in both engines
    "q183_robots_gate" ->
      (s"""WITH rp AS (
        |  SELECT doc_id,
        |    '<html><head>' || $robotsMetaCaseSql ||
        |    '<title>t</title></head><body><p>' || substr(text, 1, 40) || '</p></body></html>' AS html
        |  FROM documents),
        |og AS (
        |  SELECT doc_id, html, $robotsOptOutPredSql AS opted_out
        |  FROM rp)""".stripMargin + ",\n" + htmlChainCtesSql("og") + "\n" +
        """SELECT og.doc_id, og.opted_out,
        |  CASE WHEN og.opted_out THEN NULL ELSE s8.extracted END AS extracted
        |FROM og JOIN s8 USING (doc_id) ORDER BY doc_id""".stripMargin),
    // the crawl head END TO END: c4Plant + per-source template wrapped in
    // real HTML with the q183 meta classes -> robots gate -> q178
    // extraction -> q184 site-boilerplate fit+apply (over the compliant
    // extraction itself) -> q144 battery — five green fragments stitched;
    // boilerplate removal upstream RESCUES pages the battery would kill
    "q185_crawl_head" ->
      ("WITH " + c4PlantCtesSql + ",\n" +
        s"""sl AS (
        |  SELECT pl.doc_id, d.source,
        |    ['home | products | about ' || chr(8212) || ' ' || d.source]
        |    || pl.lines
        |    || ['copyright ' || d.source || ' all rights reserved'] AS lines
        |  FROM pl JOIN documents d USING (doc_id)),
        |hw AS (
        |  SELECT doc_id, source,
        |    '<html><head>' || $robotsMetaCaseSql ||
        |    '<style>p { color: red; }</style></head><body><p>' ||
        |    array_to_string(lines, '</p><p>') ||
        |    '</p><script>var x = 1;</script></body></html>' AS html
        |  FROM sl),
        |cg AS (
        |  SELECT doc_id, source, html FROM hw
        |  WHERE NOT ($robotsOptOutPredSql))""".stripMargin + ",\n" +
        htmlChainCtesSql("cg") + ",\n" +
        """ex2 AS (
        |  SELECT t.doc_id, cg.source, i AS idx, t.ln[i] AS line
        |  FROM (SELECT doc_id, string_split(extracted, chr(10)) AS ln FROM s8) t
        |  JOIN cg USING (doc_id), unnest(generate_series(1, len(t.ln))) AS u(i)),
        |bp2 AS (SELECT source, line FROM ex2 WHERE trim(line) <> ''
        |        GROUP BY source, line HAVING count(DISTINCT doc_id) >= 3),
        |kept2 AS (SELECT ex2.* FROM ex2 WHERE NOT EXISTS
        |          (SELECT 1 FROM bp2 WHERE bp2.source = ex2.source AND bp2.line = ex2.line)),
        |res2 AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS ct
        |         FROM kept2 GROUP BY doc_id),
        |pl3 AS (SELECT s8.doc_id, string_split(COALESCE(res2.ct, ''), chr(10)) AS lines
        |        FROM s8 LEFT JOIN res2 USING (doc_id))""".stripMargin + ",\n" +
        c4BatteryTailSql("pl3")),
    // site-boilerplate removal: the source-keyed plant, the per-(source,
    // line) distinct-doc frequency, the >= 3 threshold, the blank-line
    // exemption, and every reassembled document re-derived byte-for-byte
    "q184_site_boilerplate" ->
      """WITH b AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
        |sp AS (
        |  SELECT doc_id, source,
        |    ['home | products | about ' || chr(8212) || ' ' || source]
        |    || list_transform(generate_series(0, CAST(ceil(least(len(w), 24) / 12.0) AS INT) - 1),
        |         i -> array_to_string(w[i*12+1 : i*12+12], ' '))
        |    || ['']
        |    || CASE WHEN doc_id % 97 = 0 THEN ['subscribe to the ' || source || ' newsletter']
        |         ELSE CAST([] AS VARCHAR[]) END
        |    || ['copyright ' || source || ' all rights reserved'] AS lines
        |  FROM b),
        |ex AS (SELECT doc_id, source, i AS idx, lines[i] AS line
        |       FROM sp, unnest(generate_series(1, len(lines))) AS u(i)),
        |bp AS (SELECT source, line FROM ex WHERE trim(line) <> ''
        |       GROUP BY source, line HAVING count(DISTINCT doc_id) >= 3),
        |kept AS (SELECT ex.* FROM ex WHERE NOT EXISTS
        |         (SELECT 1 FROM bp WHERE bp.source = ex.source AND bp.line = ex.line)),
        |res AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |               string_agg(line, chr(10) ORDER BY idx) AS cleaned_text
        |        FROM kept GROUP BY doc_id)
        |SELECT sp.doc_id, CAST(len(sp.lines) AS BIGINT) AS n_raw,
        |  COALESCE(res.n_kept, 0) AS n_kept,
        |  COALESCE(res.cleaned_text, '') AS cleaned_text
        |FROM sp LEFT JOIN res USING (doc_id) ORDER BY sp.doc_id""".stripMargin,
  )

  /** The per-language CCNet chain, parameterized: models fit from
    * `refRel` (lang-keyed count/context/vocab tables), tercile cutoffs
    * from `fitRel` scored under those models, bucket assignment of
    * `applyRel` — ONE builder shared by q180 (fit == apply) and q186
    * (the persisted delta apply: fit even split, apply odd). When the
    * fit and apply relations coincide the apply scoring reuses the fit
    * scores instead of re-deriving them.
    */
  private def ccnetLangOracleSql(refRel: String, fitRel: String,
      applyRel: String): String = {
    def score(p: String, rel: String): String =
      s"""${p}cb AS (
        |  SELECT doc_id, lang, unnest(list_transform(generate_series(1, length(text) - 1),
        |    i -> lower(text)[i:i+1])) AS bigram
        |  FROM $rel ${p}cand_src
        |  WHERE length(text) >= 2),
        |${p}j AS (
        |  SELECT ${p}cb.doc_id, ${p}cb.lang,
        |    ln((COALESCE(c2, 0) + 1.0) / (COALESCE(c1, 0) + v)) AS logp
        |  FROM ${p}cb
        |  LEFT JOIN lcnt2 USING (lang, bigram)
        |  LEFT JOIN lcnt1 ON lcnt1.lang = ${p}cb.lang AND lcnt1.ctx = ${p}cb.bigram[1:1]
        |  JOIN lvoc ON lvoc.lang = ${p}cb.lang),
        |${p}lm AS (SELECT doc_id, lang, round(-avg(logp) / ln(2), 6) AS lm_bits
        |        FROM ${p}j GROUP BY doc_id, lang),
        |${p}m AS (SELECT doc_id, lang,
        |        CAST(floor(lm_bits * 1e6 + 0.5) AS BIGINT) AS bits_micro FROM ${p}lm)""".stripMargin
    val head =
      s"""WITH lrb AS (
        |  SELECT lang, unnest(list_transform(generate_series(1, length(text) - 1),
        |    i -> lower(text)[i:i+1])) AS bigram
        |  FROM $refRel lref_src
        |  WHERE length(text) >= 2),
        |lcnt2 AS (SELECT lang, bigram, count(*) AS c2 FROM lrb GROUP BY lang, bigram),
        |lcnt1 AS (SELECT lang, bigram[1:1] AS ctx, count(*) AS c1 FROM lrb GROUP BY lang, ctx),
        |lvoc AS (SELECT lang, count(DISTINCT bigram[2:2]) AS v FROM lrb GROUP BY lang)""".stripMargin
    val cuts =
      """c AS (SELECT lang,
        |  CAST(floor(quantile_cont(bits_micro, CAST(1 AS DOUBLE)/3) + 0.5) AS BIGINT) AS c1,
        |  CAST(floor(quantile_cont(bits_micro, CAST(2 AS DOUBLE)/3) + 0.5) AS BIGINT) AS c2
        |  FROM fm GROUP BY lang)""".stripMargin
    val apply =
      if (applyRel == fitRel) "am AS (SELECT * FROM fm)"
      else score("a", applyRel)
    val tail =
      """SELECT doc_id, am.lang, bits_micro,
        |  CASE WHEN bits_micro <= c.c1 THEN 'head'
        |       WHEN bits_micro <= c.c2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM am JOIN c USING (lang) ORDER BY doc_id""".stripMargin
    Seq(head, score("f", fitRel), cuts, apply).mkString(",\n") + "\n" + tail
  }

  /** The BM25 chain, parameterized by the probe-set rule (every
    * `qMod`-th doc's first `qWords` words): tf/dl/df/stats tables,
    * exactly-representable k1=1.25/b=0.75 constants, micro-unit
    * contributions summed as LONGS, rank ties on doc_id — shared by
    * q187 and q188 (the persisted delta query) so the two oracles
    * cannot desynchronize.
    */
  private def bm25OracleSql(qMod: Int, qWords: Int): String =
    "WITH " + bm25CtesSql(qMod, qWords) + "\n" +
      """SELECT query_id, rank, doc_id, score_micro FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin

  /** The q190 hybrid-fusion chain (cosine ranks + RRF full-outer
    * fusion) up to the fused ranked table `fr`, downstream of
    * [[bm25CtesSql]]'s `r` — shared by q190 and the q191 eval.
    */
  /** The RRF fusion tail over `lext(query_id, doc_id, lex_rank)` and
    * `semt(query_id, doc_id, sem_rank)` → fused ranked `fr` — the
    * source-agnostic half of the hybrid chain, shared by q190/q191
    * (brute-force semt) and q199 (IVF semt injected as VALUES).
    */
  private val rrfFusionTailSql: String =
    """fused AS (
      |  SELECT query_id, doc_id,
      |    CAST(floor((COALESCE(1.0 / (60 + lex_rank), 0) +
      |                COALESCE(1.0 / (60 + sem_rank), 0)) * 1e6 + 0.5) AS BIGINT) AS rrf_micro,
      |    lex_rank, sem_rank
      |  FROM lext FULL JOIN semt USING (query_id, doc_id)),
      |fr AS (SELECT query_id, doc_id, rrf_micro, lex_rank, sem_rank,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY rrf_micro DESC, doc_id) AS INT) AS rank
      |  FROM fused)""".stripMargin

  private val lextCteSql: String =
    "lext AS (SELECT query_id, doc_id, rank AS lex_rank FROM r WHERE rank <= 10)"

  private val hybridFusionCtesSql: String =
    lextCteSql + ",\n" +
    """emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
      |qv AS (SELECT vec_id AS query_id, vec AS qvec FROM emb WHERE vec_id % 53 = 0),
      |sem0 AS (
      |  SELECT qv.query_id, e.vec_id AS doc_id,
      |    list_dot_product(e.vec, qv.qvec) /
      |      (sqrt(list_dot_product(e.vec, e.vec)) * sqrt(list_dot_product(qv.qvec, qv.qvec))) AS cos
      |  FROM emb e, qv),
      |semr AS (SELECT query_id, doc_id,
      |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id) AS INT) AS sem_rank
      |  FROM sem0),
      |semt AS (SELECT * FROM semr WHERE sem_rank <= 10)""".stripMargin +
    ",\n" + rrfFusionTailSql

  /** q199's oracle: the q190 lexical chain + fusion tail, with the
    * PRODUCTION IVF arm's ranks injected as literal VALUES from the
    * run itself (the Unigram.lastEmVocab fitted-table handoff —
    * Verify dumps oracleSql AFTER queries run). Fail closed if the
    * query never ran: the dumped SQL must error loudly in DuckDB, not
    * succeed against a decoy.
    */
  private def ivfHybridOracleSql: String =
    graft.ops.Similarity.lastIvfSemRanks.map { rows =>
      val values = rows
        .map { case (q, d, r) => s"($q, $d, $r)" }
        .mkString(", ")
      "WITH " + bm25CtesSql(53, 8) + ",\n" + lextCteSql + ",\n" +
        "semt AS (SELECT CAST(c1 AS BIGINT) AS query_id, " +
        "CAST(c2 AS BIGINT) AS doc_id, CAST(c3 AS INT) AS sem_rank " +
        s"FROM (VALUES $values) AS v(c1, c2, c3)),\n" +
        rrfFusionTailSql + "\n" +
        """SELECT query_id, rank, doc_id, rrf_micro, lex_rank, sem_rank
        |FROM fr WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    }.getOrElse(
      "SELECT error('q199 query did not run before oracleSql was dumped')")

  /** q202's oracle: D4 selection replayed end to end under the run's
    * own KMeans centroids (VALUES handoff, the q199 technique) —
    * DuckDB re-derives the scalar-scaled plant, every micro-cosine
    * assignment, every epsilon-ball verdict, every prototype rank,
    * and every kept flag. Fail closed if the query never ran.
    */
  private def d4OracleSql: String =
    graft.ops.Similarity.lastD4Centroids.map { cents =>
      val centVals = cents.zipWithIndex.map { case (c, i) =>
        s"($i, CAST([${c.map(java.lang.Double.toString).mkString(",")}] AS DOUBLE[]))"
      }.mkString(",\n    ")
      s"""WITH cent AS (SELECT c1 AS cluster, c2 AS cvec FROM (VALUES
        |    $centVals) v(c1, c2)),
        |""".stripMargin +
        """pl AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id,
        |    CAST(CAST(list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(x * (1.0 + CAST(CAST(CAST(concat('0x', substr(md5(CAST(vec_id + 1000000 AS VARCHAR)), 1, 8)) AS UBIGINT) % 7 AS BIGINT) - 3 AS DOUBLE) * 0.001) AS REAL))
        |      AS REAL[]) AS DOUBLE[]) AS vec
        |  FROM embeddings WHERE vec_id % 10 = 0),
        |a0 AS (
        |  SELECT pl.vec_id, pl.vec, cent.cluster,
        |    CAST(floor(list_dot_product(pl.vec, cent.cvec) /
        |      (sqrt(list_dot_product(pl.vec, pl.vec)) * sqrt(list_dot_product(cent.cvec, cent.cvec))) * 1e6 + 0.5) AS BIGINT) AS cm
        |  FROM pl, cent),
        |asn AS (
        |  SELECT vec_id, vec, cluster, cm AS cent_cos_micro
        |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cm DESC, cluster) AS ark FROM a0)
        |  WHERE ark = 1),
        |dropped AS (
        |  SELECT DISTINCT a.vec_id FROM asn a JOIN asn b
        |    ON a.cluster = b.cluster AND a.vec_id > b.vec_id
        |  WHERE CAST(floor(list_dot_product(a.vec, b.vec) /
        |      (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))) * 1e6 + 0.5) AS BIGINT) >= 999000),
        |flagged AS (
        |  SELECT asn.vec_id, asn.cluster, asn.cent_cos_micro,
        |    (dropped.vec_id IS NOT NULL) AS semdedup_drop
        |  FROM asn LEFT JOIN dropped USING (vec_id)),
        |surv AS (SELECT * FROM flagged WHERE NOT semdedup_drop),
        |cnts AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n FROM surv GROUP BY cluster),
        |proto AS (
        |  SELECT vec_id, (prk <= (n * 1) // 4) AS proto_drop
        |  FROM (SELECT vec_id, cluster,
        |          row_number() OVER (PARTITION BY cluster ORDER BY cent_cos_micro DESC, vec_id) AS prk
        |        FROM surv) r JOIN cnts USING (cluster))
        |SELECT f.vec_id, f.cluster, f.cent_cos_micro, f.semdedup_drop,
        |  COALESCE(p.proto_drop, FALSE) AS proto_drop,
        |  (NOT f.semdedup_drop AND NOT COALESCE(p.proto_drop, FALSE)) AS kept
        |FROM flagged f LEFT JOIN proto p USING (vec_id) ORDER BY f.vec_id""".stripMargin
    }.getOrElse(
      "SELECT error('q202 query did not run before oracleSql was dumped')")

  /** q207's oracle — the serve-index batch top-k replayed from the
    * run's own centroids (VALUES handoff): assignments, probe
    * rankings, the pruned candidate set, exact cosines and ranks.
    */
  private def ivfServeOracleSql: String =
    graft.ops.Similarity.lastServeCentroids.map { cents =>
      val centVals = cents.zipWithIndex.map { case (c, i) =>
        s"($i, CAST([${c.map(java.lang.Double.toString).mkString(",")}] AS DOUBLE[]))"
      }.mkString(",\n    ")
      s"""WITH cent AS (SELECT c1 AS cell, c2 AS cvec FROM (VALUES
        |    $centVals) v(c1, c2)),
        |""".stripMargin +
        """emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |a0 AS (
        |  SELECT e.vec_id, e.vec, c.cell,
        |    CAST(floor(list_dot_product(e.vec, c.cvec) /
        |      (sqrt(list_dot_product(e.vec, e.vec)) * sqrt(list_dot_product(c.cvec, c.cvec))) * 1e6 + 0.5) AS BIGINT) AS cm
        |  FROM emb e, cent c),
        |asn AS (
        |  SELECT vec_id, vec, cell
        |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cm DESC, cell) AS ark FROM a0)
        |  WHERE ark = 1),
        |q AS (SELECT vec_id AS query_id, vec AS qvec FROM emb WHERE vec_id % 53 = 0),
        |p0 AS (
        |  SELECT q.query_id, q.qvec, c.cell,
        |    CAST(floor(list_dot_product(q.qvec, c.cvec) /
        |      (sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(c.cvec, c.cvec))) * 1e6 + 0.5) AS BIGINT) AS cm
        |  FROM q, cent c),
        |probes AS (
        |  SELECT query_id, qvec, cell
        |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cm DESC, cell) AS pk FROM p0)
        |  WHERE pk <= 2),
        |cand AS (
        |  SELECT p.query_id, a.vec_id,
        |    list_dot_product(p.qvec, a.vec) /
        |      (sqrt(list_dot_product(p.qvec, p.qvec)) * sqrt(list_dot_product(a.vec, a.vec))) AS cos
        |  FROM probes p JOIN asn a USING (cell)
        |  WHERE a.vec_id <> p.query_id),
        |top AS (
        |  SELECT query_id, vec_id, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
        |  FROM cand)
        |SELECT query_id, rank, vec_id, round(cos, 6) AS cosine
        |FROM top WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    }.getOrElse(
      "SELECT error('q207 query did not run before oracleSql was dumped')")

  /** The BM25 chain up to the unfiltered ranked table `r` — shared by
    * the q187/q188/q189 final selects and the q190 hybrid fusion.
    */
  private def bm25CtesSql(qMod: Int, qWords: Int): String =
    s"""w AS (
        |  SELECT doc_id, t.term FROM documents,
        |    unnest(string_split(lower(text), ' ')) AS t(term)
        |  WHERE t.term <> ''),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
        |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |qsrc AS (
        |  SELECT doc_id AS query_id,
        |    array_to_string(string_split(text, ' ')[1:$qWords], ' ') AS text
        |  FROM documents WHERE doc_id % $qMod = 0),
        |qt AS (
        |  SELECT DISTINCT query_id, t.term FROM qsrc,
        |    unnest(string_split(lower(text), ' ')) AS t(term)
        |  WHERE t.term <> ''),
        |sc AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    CAST(floor(
        |      ln((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0) *
        |      ((tf.tf * 2.25) / (tf.tf + 1.25 * (0.25 + (0.75 * dl.dl) /
        |        (CAST(st.sum_dl AS DOUBLE) / st.n_docs))))
        |      * 1e6 + 0.5) AS BIGINT) AS c
        |  FROM qt JOIN tf USING (term)
        |  JOIN dfq USING (term)
        |  JOIN dl ON dl.doc_id = tf.doc_id
        |  CROSS JOIN st),
        |agg AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_micro
        |        FROM sc GROUP BY query_id, doc_id),
        |r AS (SELECT query_id, doc_id, score_micro,
        |        CAST(row_number() OVER (PARTITION BY query_id
        |          ORDER BY score_micro DESC, doc_id) AS INT) AS rank
        |      FROM agg)""".stripMargin

  /** [[graft.ops.Text.robotsMetaExpr]]'s DuckDB mirror — the planted
    * meta tag by doc_id class, shared by q183 and q185 so the two
    * oracles cannot desynchronize.
    */
  private val robotsMetaCaseSql: String =
    """CASE WHEN doc_id % 8 = 0 THEN '<META NAME="ROBOTS" CONTENT="NOINDEX, FOLLOW">'
      |         WHEN doc_id % 8 = 4 THEN '<meta name=robots content=noindex>'
      |         WHEN doc_id % 8 = 1 THEN '<meta name=''robots'' content=''noindex, follow''>'
      |         WHEN doc_id % 4 = 1 THEN '<meta content="none" name="robots">'
      |         WHEN doc_id % 4 = 2 THEN '<meta name="robots" content="nofollow">'
      |         ELSE '<meta name="viewport" content="width=device-width">' END""".stripMargin

  /** [[graft.ops.Text.metaRobotsOptOut]]'s DuckDB mirror over an `html`
    * column — both attribute orders, (?i), RE2-safe (shared q183/q185).
    */
  private val robotsOptOutPredSql: String =
    """regexp_matches(html, '(?i)<meta[^>]*name\s*=\s*["'']?robots["''\s/>][^>]*content\s*=\s*("[^"]*(noindex|none)|''[^'']*(noindex|none)|[^\s"''>]*(noindex|none))')
      |    OR regexp_matches(html, '(?i)<meta[^>]*content\s*=\s*("[^"]*(noindex|none)[^"]*"|''[^'']*(noindex|none)[^'']*''|[^\s"''>]*(noindex|none)[^\s"''>]*)[^>]*name\s*=\s*["'']?robots["''\s/>]')""".stripMargin

  /** [[graft.ops.Quality.ccnetNormalize]]'s DuckDB mirror over a `text`
    * column — chr()-composed so no quote-escaping ambiguity; 'g' flags
    * per the cross-engine regexp_replace contract (q177/q178).
    */
  private val ccnetNormSql: String = ccnetNormSqlOver("text")

  /** [[ccnetNormSql]] over an arbitrary inner expression — q197 feeds
    * it `strip_accents(text)` (the accent-fold composes INSIDE the
    * chain, before `lower`, exactly like the Spark column).
    */
  private def ccnetNormSqlOver(inner: String): String =
    s"trim(regexp_replace(regexp_replace(translate(lower($inner), " +
      "chr(8216)||chr(8217)||chr(8220)||chr(8221)||chr(8211)||chr(8212)||chr(160), " +
      "chr(39)||chr(39)||'\"\"--'||' '), '[0-9]', '0', 'g'), '\\s+', ' ', 'g'))"

  /** q178's HTML-linearization chain over `srcRel` (doc_id, html) →
    * `s8(doc_id, extracted)` — the DuckDB mirror of
    * [[graft.ops.Text.stripHtml]], shared by q178 and q179.
    */
  private def htmlChainCtesSql(srcRel: String): String =
    s"""s1 AS (SELECT doc_id, regexp_replace(html, '<script>.*?</script>', ' ', 'g') AS t FROM $srcRel AS hc_src),
      |s2 AS (SELECT doc_id, regexp_replace(t, '<style>.*?</style>', ' ', 'g') AS t FROM s1),
      |s3 AS (SELECT doc_id, regexp_replace(t, '</p>|</h[1-6]>|</title>|</div>|</li>|<br>', chr(10), 'g') AS t FROM s2),
      |s4 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM s3),
      |s5 AS (SELECT doc_id,
      |    replace(replace(replace(replace(replace(replace(t,
      |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
      |      '&nbsp;', ' '), '&amp;', '&') AS t FROM s4),
      |s6 AS (SELECT doc_id, regexp_replace(t, '[ \t]+', ' ', 'g') AS t FROM s5),
      |s7 AS (SELECT doc_id, regexp_replace(t, ' *\n *', chr(10), 'g') AS t FROM s6),
      |s8 AS (SELECT doc_id,
      |    trim(regexp_replace(t, '\n+', chr(10), 'g'), ' ' || chr(10)) AS extracted FROM s7)""".stripMargin

  /** q144's C4 line/page battery over `plRel` (doc_id, lines) — the
    * final-select tail shared by q144 and q179.
    */
  private def c4BatteryTailSql(plRel: String): String =
    s"""f AS (
      |  SELECT doc_id, lines,
      |    list_filter(lines, l ->
      |      (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?')
      |        OR ends_with(l, '"'))
      |      AND len(string_split(l, ' ')) >= 5
      |      AND NOT contains(l, 'javascript')) AS kept,
      |    array_to_string(lines, chr(10)) AS full_text
      |  FROM $plRel AS c4b_src),
      |g AS (
      |  SELECT doc_id,
      |    CAST(len(lines) AS BIGINT) AS n_lines,
      |    CAST(len(kept) AS BIGINT) AS n_kept,
      |    contains(full_text, 'lorem ipsum') AS has_lorem,
      |    contains(full_text, '{') AS has_brace,
      |    kept
      |  FROM f)
      |SELECT doc_id, n_lines, n_kept, has_lorem, has_brace,
      |  (NOT has_lorem) AND (NOT has_brace) AND n_kept >= 3 AS keep,
      |  CASE WHEN (NOT has_lorem) AND (NOT has_brace) AND n_kept >= 3
      |    THEN array_to_string(kept, chr(10)) END AS cleaned_text
      |FROM g ORDER BY doc_id""".stripMargin

  /** The c4Plant CTEs (`base`, `pl`) shared VERBATIM by every oracle
    * over the planted multi-line corpus (q144/q147/q150/q158/q159) —
    * one copy, so an edit to the plant cannot desynchronize them.
    * Ends WITHOUT a trailing comma; compose with ",\n" outside any
    * stripMargin (the file-wide fragment rule).
    */
  private val c4PlantCtesSql: String =
    """base AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |pl AS (
        |  SELECT doc_id,
        |    list_transform(
        |      generate_series(0, CAST(ceil(least(len(w), 48) / 12.0) AS INT) - 1),
        |      i -> CASE WHEN (doc_id + i) % 4 = 0
        |        THEN array_to_string(w[i*12+1 : i*12+12], ' ')
        |        ELSE array_to_string(w[i*12+1 : i*12+12], ' ') || '.' END)
        |    || CASE WHEN doc_id % 5 = 0
        |         THEN ['please enable javascript and cookies to continue.']
        |         ELSE CAST([] AS VARCHAR[]) END
        |    || CASE WHEN doc_id % 7 = 0 THEN ['read more.']
        |         ELSE CAST([] AS VARCHAR[]) END
        |    || CASE WHEN doc_id % 11 = 0
        |         THEN ['lorem ipsum dolor sit amet consectetur adipiscing elit.']
        |         ELSE CAST([] AS VARCHAR[]) END
        |    || CASE WHEN doc_id % 13 = 0
        |         THEN ['var config = { mode: production };']
        |         ELSE CAST([] AS VARCHAR[]) END
        |    AS lines
        |  FROM base)""".stripMargin

  /** The plant's line explode (`ex(doc_id, idx, line)`) — the second
    * fragment q147/q150/q158/q159 share.
    */
  private val c4PlantLinesCteSql: String =
    """ex AS (
        |  SELECT doc_id, i - 1 AS idx, lines[i] AS line
        |  FROM pl, unnest(generate_series(1, len(lines))) AS u(i))""".stripMargin

  /** Unrolled Feistel-round CTE chain r1..rN over an existing
    * `r0(carry…, l, r)`: round i maps (l, r) → (r, l ⊕ F(r, i, key))
    * with F = the q93 md5-conv idiom mod 2^halfBits. ONE generator for
    * every Feistel oracle (q146 keys by epoch, q160 by stage) so the
    * round recipe cannot diverge from [[graft.ops.Packing
    * .epochShuffleKey]] in only one of them. Every reference is
    * table-qualified — a bare `xor(l, …)` after `t.r AS l` would bind
    * DuckDB's LATERAL alias (the new l = r), not the previous round's
    * column.
    */
  private def feistelRoundsSql(rounds: Int, halfBits: Int, keyCol: String,
      carry: Seq[String]): String = {
    val m = 1L << halfBits
    val cols = carry.map("t." + _).mkString(", ")
    (1 to rounds).map { i =>
      s"""r$i AS (
         |  SELECT $cols, t.r AS l,
         |    xor(t.l, CAST(CAST(concat('0x', substr(md5(
         |      CAST(t.r AS VARCHAR) || ':$i:' || CAST(t.$keyCol AS VARCHAR)),
         |      1, 8)) AS UBIGINT) % $m AS BIGINT)) AS r
         |  FROM r${i - 1} t)""".stripMargin
    }.mkString(",\n")
  }

  /** q146's full oracle: two epochs over `documents` through
    * [[feistelRoundsSql]].
    */
  private def feistelOracleSql(rounds: Int, halfBits: Int): String = {
    val m = 1L << halfBits
    s"""WITH ep AS (
       |  SELECT doc_id, CAST(e.epoch AS BIGINT) AS epoch
       |  FROM documents, (SELECT unnest([0, 1]) AS epoch) e),
       |r0 AS (
       |  SELECT doc_id, epoch, (doc_id // $m) % $m AS l, doc_id % $m AS r
       |  FROM ep),""".stripMargin + "\n" +
      feistelRoundsSql(rounds, halfBits, "epoch", Seq("doc_id", "epoch")) +
      "\n" +
      s"""SELECT epoch, doc_id, t.l * $m + t.r AS order_key
         |FROM r$rounds t ORDER BY epoch, doc_id""".stripMargin
  }

  /** Unrolled EG iteration chain for q137 (T iterations at η=1,
    * smoothing mass 1000 micro / uniform floor 1000//k): p_t holds the
    * pre-normalization masses α·exp(λ) on the micro grid, i_t the
    * smoothed renormalization; Z is an exact BIGINT sum so no step is
    * aggregation-order sensitive. MATERIALIZED per the q118 lesson
    * (each stage is referenced twice — once per mass row, once inside
    * the Z subquery).
    */
  private def doremiOracleSql(iterations: Int): String = {
    val iters = (1 to iterations).map { i =>
      val prev = if (i == 1) "it0" else s"it${i - 1}"
      s"""pm$i AS MATERIALIZED (
         |  SELECT source, CAST(floor(m * exp(1.0 * lam) + 0.5) AS BIGINT) AS mp
         |  FROM $prev JOIN lamt USING (source)),
         |it$i AS MATERIALIZED (
         |  SELECT source,
         |    CAST(floor(999000.0 * mp / (SELECT sum(mp) FROM pm$i) + 0.5) AS BIGINT)
         |      + (SELECT 1000 // count(*) FROM lamt) AS m
         |  FROM pm$i)""".stripMargin
    }.mkString(",\n")
    s"WITH ${lmCtesSql("(SELECT * FROM documents WHERE doc_id % 3 <> 0)")},\n" +
      lmAggCteSql + ",\n" +
      """sc AS (
        |  SELECT d.doc_id, d.source,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
        |    lm.lm_bits AS bits
        |  FROM documents d JOIN lm USING (doc_id)),
        |rf AS (SELECT round(CAST(sum(CAST(bits AS DECIMAL(18,6))) AS DOUBLE)
        |         / count(*), 6) AS ref_bits FROM sc),
        |dom AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |    round(CAST(sum(CAST(greatest(bits - (SELECT ref_bits FROM rf), 0.0)
        |      AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS lam
        |  FROM sc GROUP BY source),
        |lamt AS (SELECT source, lam FROM dom),
        |it0 AS (SELECT source, (SELECT 1000000 // count(*) FROM lamt) AS m
        |        FROM lamt)""".stripMargin + ",\n" + iters + "\n" +
      s"""SELECT d.source, d.n_docs, d.n_tokens, d.lam AS lambda_excess,
         |  m / 1000000.0 AS alpha,
         |  CAST((SELECT sum(n_tokens) FROM dom) * m // 1000000 AS BIGINT)
         |    AS token_quota
         |FROM it$iterations JOIN dom d USING (source)
         |ORDER BY d.source""".stripMargin
  }
}
