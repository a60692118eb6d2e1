package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Dedup, Multimodal, RangeJoin, Relational, Scale, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-inventory names (SURVEY.md §2.3) to Spark plans;
  * `oracleSql` holds the DuckDB-runnable equivalent for the hash-compare
  * correctness gate. Names and column aliases MUST match between the two
  * (the driver sorts columns by name before hashing values). Queries without
  * an oracle entry (hash-divergent or non-SQL-expressible ops) get a weaker
  * rows-only check. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way join + broadcast dim + hash agg (TPC-H Q5 shape). */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03JoinMultiway(spark, "/root/testdata/sf0.001")

  /** Driver contract: the DataFrame-API lane plus the SQL-text front door
    * (every oracle-gated query re-run as Spark SQL text — [[SqlFrontDoor]]). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ SqlFrontDoor.laneQueries

  /** DuckDB oracle for both lanes: the SQL-text twin of `qNN_x` is gated by
    * the same oracle under its `sNN_x` name. */
  def oracleSql: Map[String, String] =
    baseOracleSql ++ SqlFrontDoor.laneOracle

  /** The DataFrame-API (Scala) lane — also the bench set: the SQL-text lane
    * produces byte-identical optimized plans (RelationalConformanceSpec pins
    * lane-equality), so timing it would double bench wall-clock for zero
    * information. */
  def baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter_sort" -> (Relational.q01ScanFilterSort _),
    "q02_project_case"     -> (Relational.q02ProjectCase _),
    "q03_join_multiway"    -> (Relational.q03JoinMultiway _),
    "q04_join_left_agg"    -> (Relational.q04JoinLeftAgg _),
    "q05_join_semi"        -> (Relational.q05JoinSemi _),
    "q06_join_anti"        -> (Relational.q06JoinAnti _),
    "q07_join_theta"       -> (Relational.q07JoinTheta _),
    "q08_agg_tpch_q1"      -> (Relational.q08AggTpchQ1 _),
    "q09_count_distinct"   -> (Relational.q09CountDistinct _),
    "q10_rollup"           -> (Relational.q10Rollup _),
    "q11_cube"             -> (Relational.q11Cube _),
    "q12_grouping_sets"    -> (Relational.q12GroupingSets _),
    "q13_window_rank"      -> (Relational.q13WindowRank _),
    "q14_window_lag"       -> (Relational.q14WindowLag _),
    "q15_window_frame"     -> (Relational.q15WindowFrame _),
    "q16_topk"             -> (Relational.q16TopK _),
    "q17_intersect"        -> (Relational.q17Intersect _),
    "q18_except"           -> (Relational.q18Except _),
    "q19_string_funcs"     -> (Relational.q19StringFuncs _),
    "q20_date_funcs"       -> (Relational.q20DateFuncs _),
    "q21_math_funcs"       -> (Relational.q21MathFuncs _),
    "q22_array_groupby"    -> (Relational.q22ArrayGroupBy _),
    "q23_json_extract"     -> (Relational.q23JsonExtract _),
    "q24_event_tumbling"   -> (Relational.q24EventTumbling _),
    "q25_hash_bucket"      -> (Relational.q25HashBucket _),
    "q26_dedup_exact"      -> (Relational.q26DedupExact _),
    "q27_text_stats"       -> (Relational.q27TextStats _),
    // LLM-data-pipeline extensions (SURVEY §2.3.11 + builder brief)
    "q28_dedup_md5"        -> (Dedup.q28DedupMd5 _),
    "q29_token_count"      -> (TextAnalysis.q29TokenCount _),
    "q30_text_quality"     -> (TextAnalysis.q30TextQuality _),
    "q31_lang_id"          -> (TextAnalysis.q31LangId _),
    "q32_fingerprint_md5"  -> (TextAnalysis.q32FingerprintMd5 _),
    "q33_jaccard_pairs"    -> (Dedup.q33JaccardPairs _),
    "q34_minhash_bands"    -> (Dedup.q34MinhashBands _),
    "q35_simhash"          -> (Dedup.q35Simhash _),
    "q36_cosine_topk"      -> ((s, d) => Similarity.q36CosineTopK(s, d)),
    "q37_neardup_embedding" -> (Dedup.q37NeardupEmbedding _),
    "q38_multimodal_bytes" -> (Multimodal.q38MultimodalBytes _),
    "q39_lsh_buckets"      -> (Similarity.q39LshCosineBuckets _),
    "q40_winnow_fingerprint" -> (TextAnalysis.q40WinnowFingerprint _),
    "q41_asof_join"        -> (Relational.q41AsofJoin _),
    "q42_percentiles"      -> (Relational.q42Percentiles _),
    "q43_pivot"            -> (Relational.q43Pivot _),
    "q44_explode_tokens"   -> (Relational.q44ExplodeTokens _),
    "q45_window_analytics" -> (Relational.q45WindowAnalytics _),
    "q46_string_more"      -> (Relational.q46StringMore _),
    "q47_date_trunc"       -> (Relational.q47DateTrunc _),
    // q48: IVF-ANN cluster histogram (rows-only — float argmax engine-internal)
    "q48_ivf_clusters"     -> (Similarity.q48IvfClusters _),
    // q49: HLL++/t-digest sketches — exact companions + error bands on
    // the surface (computed oracle since r13; estimates audited in-band)
    "q49_approx_sketches"  -> (Relational.q49ApproxSketches _),
    // q50: LSH→exact-Jaccard near-dup pipeline (rows-only — hash-family internal)
    "q50_neardup_confirmed" -> (Dedup.q50NeardupConfirmed _),
    "q51_intersect_all"    -> (Relational.q51IntersectAll _),
    "q52_except_all"       -> (Relational.q52ExceptAll _),
    "q53_char_ngram_jaccard" -> (Dedup.q53CharNgramJaccard _),
    "q54_tpch_q3"          -> (Relational.q54TpchQ3 _),
    "q55_tpch_q10"         -> (Relational.q55TpchQ10 _),
    "q56_window_dist"      -> (Relational.q56WindowDist _),
    "q57_correlated_subquery" -> (Relational.q57CorrelatedSubquery _),
    "q58_scalar_subquery"  -> (Relational.q58ScalarSubquery _),
    "q59_join_right"       -> (Relational.q59JoinRight _),
    "q60_join_full"        -> (Relational.q60JoinFull _),
    "q61_string_agg"       -> (Relational.q61StringAgg _),
    "q62_mode"             -> (Relational.q62Mode _),
    "q63_stats_exact"      -> (Relational.q63StatsExact _),
    "q64_filter_agg"       -> (Relational.q64FilterAgg _),
    "q65_train_val_split"  -> (TextAnalysis.q65TrainValSplit _),
    "q66_chunk"            -> (TextAnalysis.q66Chunk _),
    "q67_pii_redact"       -> (TextAnalysis.q67PiiRedact _),
    "q68_sessionize"       -> (Relational.q68Sessionize _),
    "q69_union"            -> (Relational.q69Union _),
    "q70_having"           -> (Relational.q70Having _),
    "q71_cross"            -> (Relational.q71Cross _),
    "q72_limit_offset"     -> (Relational.q72LimitOffset _),
    "q73_sample_stratified" -> (TextAnalysis.q73SampleStratified _),
    "q74_top_bigrams"      -> (TextAnalysis.q74TopBigrams _),
    "q75_repetition"       -> (TextAnalysis.q75Repetition _),
    "q76_decontaminate"    -> (Dedup.q76Decontaminate _),
    "q77_embedding_norms"  -> (Similarity.q77EmbeddingNorms _),
    "q78_url_domains"      -> (TextAnalysis.q78UrlDomains _),
    "q79_dup_clusters"     -> (Dedup.q79DupClusters _),
    "q80_pack_bins"        -> (TextAnalysis.q80PackBins _),
    "q81_shuffle_order"    -> (TextAnalysis.q81ShuffleOrder _),
    "q82_scalar_funcs"     -> (Relational.q82ScalarFuncs _),
    "q83_posexplode"       -> (Relational.q83PosexplodeTokens _),
    "q84_length_buckets"   -> (TextAnalysis.q84LengthBuckets _),
    "q85_quality_gate"     -> (TextAnalysis.q85QualityGate _),
    "q86_map_funcs"        -> (Relational.q86MapFuncs _),
    // q87: ANN recall@10 metric (rows-only — approximate candidate sets are
    // engine-internal hash/argmax; SimilaritySpec pins the recall floor)
    "q87_ann_recall"       -> (Similarity.q87AnnRecall _),
    "q88_range_join_binned" -> (RangeJoin.q88RangeJoinBinned _),
    "q89_tfidf_top_terms"  -> ((s, dir) => TextAnalysis.q89TfIdfTopTerms(s, dir)),
    "q90_quota_cap"        -> (TextAnalysis.q90QuotaCap _),
    "q91_bloom_semi_join"  -> (Scale.q91BloomSemiJoin _),
    "q92_cdc_passages"     -> (Dedup.q92CdcPassageDedup _),
    "q93_inverted_index"   -> ((s, dir) => TextAnalysis.q93InvertedIndex(s, dir)),
    "q94_hopping_windows"  -> (Relational.q94HoppingWindows _),
    "q95_mixture_resample" -> (TextAnalysis.q95MixtureResample _),
    "q96_funnel"           -> (Relational.q96Funnel _),
    "q97_rolling_range"    -> (Relational.q97RollingRange _),
    "q98_bigram_lm"        -> ((s, dir) => TextAnalysis.q98BigramLm(s, dir)),
    "q99_winsorized"       -> (Relational.q99Winsorized _),
    "q100_salted_join"     -> (Scale.q100SaltedJoin _),
    "q101_gap_fill"        -> (Relational.q101GapFill _),
    // TPC-H decorrelation stress shapes (r4 directive #5): Q17/Q20/Q21
    "q102_tpch_q17"        -> (Relational.q102TpchQ17 _),
    "q103_tpch_q20"        -> (Relational.q103TpchQ20 _),
    "q104_tpch_q21"        -> (Relational.q104TpchQ21 _),
    "q105_session_window"  -> (Relational.q105SessionWindow _),
    "q106_grouping_meta"   -> (Relational.q106GroupingSets _),
    "q107_percentile_disc" -> (Relational.q107PercentileDisc _),
    "q108_forward_fill"    -> (Relational.q108ForwardFill _),
    "q109_unpivot"         -> (Relational.q109Unpivot _),
    "q110_explode_outer"   -> (Relational.q110ExplodeOuter _),
    // r6: composed curation funnel under the oracle gate (r5 verdict #6)
    "q111_curation_funnel" -> (graft.operators.Curation.q111CurationFunnel _),
    // r6: the declared 100 TB spelling of percentile_disc (r5 verdict #5)
    "q112_percentile_disc_sharded" -> (Relational.q112PercentileDiscSharded _),
    // r7: product-quantization codec + ADC search — recall@10 + compression
    // accounting (rows-only like q87; s113 replays the identical math and
    // the conformance loop pins row-for-row parity)
    "q113_pq_recall"       -> (Similarity.q113PqRecall _),
    // r7: IVF-PQ composed (prune WHICH × shrink WHAT) — rows-only like
    // q87/q113; s114 replays the identical index and math
    "q114_ivfpq_recall"    -> (Similarity.q114IvfPqRecall _),
    // q153 (r15): the q114 index + ADC-shortlist exact rerank (the FAISS
    // refine production pattern); rerank_ge_adc is a theorem, spec-pinned
    "q153_ivfpq_rerank"    -> (Similarity.q153IvfPqRerank _),
    // q154 (r15): hybrid search — inverted-index keyword channel + exact
    // vector channel, reciprocal-rank fusion (the production hybrid shape)
    "q154_hybrid_rrf"      -> (Similarity.q154HybridRrf _),
    // q155 (r16): hybrid AT SCALE — BM25 keyword channel + the q153
    // IVF-PQ+rerank vector channel under the same RRF (the composition
    // q154's scaladoc promises; r15 verdict "What's missing #2")
    "q155_hybrid_bm25_ann" -> (Similarity.q155HybridBm25Ann _),
    // q157 (r17): build→persist→load→search — the saved ANN index serve
    // lane (r16 verdict #2); saved-index results ≡ the inline q153
    // pipeline row-for-row, pinned by lane conformance + shared oracle
    "q157_ann_index_serve" -> (Similarity.q157AnnIndexServe _),
    // q158 (r17): sharded build + merge ≡ monolithic — quantizers trained
    // once, even/odd corpus halves encoded independently, artifacts merged
    // (the FAISS merge_into shape); same output contract and oracle as q157
    "q158_ann_index_merge" -> (Similarity.q158AnnIndexMerge _),
    // q159 (r18): online index append — base build over 90% of the corpus,
    // the rest arriving later via appendToIndex against the artifact's own
    // frozen quantizers (the FAISS-add shape); appended ≡ rebuilt, so the
    // lane gates on the q157 oracle (r17 verdict Next #3)
    "q159_ann_index_append" -> (Similarity.q159AnnIndexAppend _),
    // q160 (r18): append-then-compact ≡ rebuild — the segment-merge half
    // of the ingest lifecycle (streaming appends accrete per-batch files;
    // compaction re-lands them one file per cluster, search-identical)
    "q160_ann_index_compact" -> (Similarity.q160AnnIndexCompact _),
    // q161 (r18): ExactSubstr duplicate-span discovery (Lee et al. 2021) —
    // the span-level complement of the document-level dedup ladder: k-gram
    // occurrence relation, one corpus-wide multiplicity shuffle, per-doc
    // interval merge; emits trim-ready (doc_id, span_start, span_end)
    // q165 (r19): index deletion — tombstone markers, serve anti-join,
    // compaction applies them physically (FAISS remove_ids / the LSM
    // delete-marker shape); delete→serve ≡ rebuild-without-rows
    "q165_ann_index_delete" -> (Similarity.q165AnnIndexDelete _),
    // q166 (r19): filtered vector search — metadata predicate restricts
    // candidates BEFORE ranking (the Milvus/pgvector pre-filter shape)
    "q166_ann_filtered_search" -> (Similarity.q166AnnFilteredSearch _),
    "q161_exact_substr_spans" -> (Dedup.q161ExactSubstrSpans _),
    // q162 (r18): leakage-free train/val/test split — assignment is a pure
    // function of the content fingerprint (no membership table, no join,
    // re-crawl-stable), exact-dup clusters co-locate by construction and
    // the lane emits the audit proving it, plus the measured residual
    // prefix-level near-dup leakage a content-hash split cannot prevent
    "q162_leakage_free_split" -> (graft.operators.Curation.q162LeakageFreeSplit _),
    // q163 (r19): trim-and-keep — q161's spans APPLIED (Lee et al. train on
    // the TRIMMED corpus): discover → token-indexed cut → re-discover;
    // per-doc kept/trimmed accounting + the corpus fixpoint audit
    // (residual_spans = what a second pass still finds — 0 on the fixture)
    "q163_exact_substr_trim" -> (Dedup.q163TrimSpans _),
    // q164 (r19): near-dup-AWARE split — q162's own measured residual
    // closed: confirmed near-dup pairs (q50) → connected components (q79)
    // → split per cluster representative min-fp, so near-dup clusters
    // co-locate; emits the paired positive/negative audit (cluster
    // assignment leaks 0 pairs, the naive per-doc rule leaks > 0)
    "q164_neardup_aware_split" -> (graft.operators.Curation.q164NearDupAwareSplit _),
    // q167 (r19): the trim-FIRST curation funnel — q111's flow with the
    // ExactSubstr span-trim stage enabled; the oracle-gated ladder
    // integration (trim removes shared boilerplate BEFORE quality/dedup/
    // decon, so boilerplate-sharing docs survive decon instead of dying)
    "q167_curation_trimmed" -> (graft.operators.Curation.q167CurationTrimmed _),
    // q168 (r19): BPE tokenizer training (Sennrich et al. 2016) — ONE
    // corpus pass to the word-frequency table (the Zipf compression),
    // then NMerges pair-count → argmax → greedy-left fuse rounds over the
    // VOCAB table only; emits the merge table + the compression curve
    "q168_bpe_train" -> (graft.operators.Tokenizer.q168BpeTrain _),
    // q169 (r19): model-based quality filtering (the FineWeb/DCLM
    // classifier stage) as multinomial Naive Bayes — train on the 30%
    // weak-labeled sample in ONE aggregation pass, score the corpus with
    // ONE token-keyed join; integer micro-nat scores end to end
    "q169_quality_classifier" -> (graft.operators.Classifier.q169QualityClassifier _),
    // q170 (r19): BPE APPLY — per-doc token counts under the learned
    // vocabulary (train without apply can't budget a data mixture); one
    // corpus re-pass + one word-keyed join against the Zipf-bounded vocab
    "q170_bpe_tokenize" -> (graft.operators.Tokenizer.q170BpeTokenize _),
    // q171 (r19): adaptive-nprobe filtered ANN — closes q166's documented
    // recall caveat: under a selective metadata filter each query expands
    // probes until the probed clusters hold a shortlist's worth of
    // allowed candidates (closed-form prefix rule, no grow loop)
    "q171_ann_adaptive_search" -> (Similarity.q171AnnAdaptiveSearch _),
    // q172 (r19): tokenizer-as-artifact — train → persist → load →
    // tokenize FROM the loaded model; output ≡ q170 (the save/load
    // identity, the q157 artifact discipline applied to the tokenizer)
    "q172_bpe_artifact" -> (graft.operators.Tokenizer.q172BpeArtifactTokenize _),
    // q173 (r20): merge-replay encode of UNSEEN text — the persisted
    // tokenizer serving held-out docs (train on the even half, replay-
    // segment the odd half from the loaded artifact; OOV words tokenized,
    // not just counted — closes the r19 artifact gap)
    "q173_bpe_encode_unseen" -> (graft.operators.Tokenizer.q173BpeEncodeUnseen _),
    // q174 (r20): the NB quality model as a PERSISTED artifact — train →
    // write → load → score from the loaded tables (the q172/q157
    // discipline applied to the classifier; nbScoreStream deploys from
    // the same artifact via Classifier.loadModel)
    "q174_nb_model_artifact" -> (graft.operators.Classifier.q174NbModelArtifact _),
    // q175 (r20): curate → near-dup-aware split COMPOSED (the production
    // order: trim, quality, dedup, decontaminate, THEN component-split
    // the survivors; trim-proof canary clusters prove the split still
    // co-locates near-dups after the ladder)
    "q175_curated_split" -> (graft.operators.Curation.q175CuratedSplit _),
    // q176 (r20): quantizer refresh under churn — build, append (frozen-
    // quantizer drift), delete, RETRAIN on the live rows from the
    // artifact's own vectors, serve; retrain ≡ fresh build over the live
    // set (the oracle replays the whole pipeline with the corpus — and
    // therefore the quantizer training — filtered to live ids)
    "q176_ann_index_retrain" -> (Similarity.q176AnnIndexRetrain _),
    // r7: weighted sampling w/o replacement (Efraimidis–Spirakis, md5 stream)
    "q115_weighted_sample" -> ((s, d) => TextAnalysis.q115WeightedSample(s, d)),
    // r7: per-doc bigram-rarity quality score (integer LM-perplexity proxy)
    "q116_bigram_rarity"   -> ((s, d) => TextAnalysis.q116BigramRarity(s, d)),
    // r7: SCD type-2 validity intervals from the event stream (CDC → dim)
    "q117_scd2_intervals"  -> (Relational.q117Scd2Intervals _),
    // r7: robust outliers via sharded-median MAD (bounded-memory at 100 TB)
    "q118_mad_outliers"    -> (Relational.q118MadOutliers _),
    // r7: correlated LATERAL + ORDER BY/LIMIT — decorrelates to one window
    "q119_lateral_topk"    -> (Relational.q119LateralTopk _),
    // r7: WITH RECURSIVE order-chain walk — engine-planned iteration
    "q120_recursive_chain" -> (Relational.q120RecursiveChain _),
    // r7: blocked fuzzy join (edit-distance ER over blocking keys)
    "q121_fuzzy_pairs"     -> (graft.operators.Dedup.q121FuzzyPairs _),
    // r7: retention cohort matrix (first-day cohorts × day offsets)
    "q122_retention_cohorts" -> (Relational.q122RetentionCohorts _),
    // r7 batch 2: TPC-H Q15/Q18/Q22 decorrelation shapes
    "q123_tpch_q15"        -> (Relational.q123TpchQ15 _),
    "q124_tpch_q18"        -> (Relational.q124TpchQ18 _),
    "q125_tpch_q22"        -> (Relational.q125TpchQ22 _),
    // r7 batch 2: multi-DISTINCT Expand plan; CDC snapshot diff; latest-per-key
    "q126_multi_distinct"  -> (Relational.q126MultiDistinct _),
    "q127_snapshot_diff"   -> (Relational.q127SnapshotDiff _),
    "q128_latest_per_key"  -> (Relational.q128LatestPerKey _),
    // r7 batch 2: mergeable HLL sketch rollup — sketch once at the finest
    // grain, answer coarser rollups by merging (rows-only: DataSketches
    // HLL is engine-internal; s129 replays the identical statement and
    // RelationalOpsSpec pins the estimates inside lgK=12 error)
    "q129_hll_rollup"      -> (Relational.q129HllRollup _),
    // r9: temperature-scaled source mixing; graded contamination overlap
    "q130_source_mixing"   -> ((s, d) => TextAnalysis.q130SourceMixing(s, d)),
    "q131_contamination_score" ->
      ((s, d) => graft.operators.Dedup.q131ContaminationScore(s, d)),
    // r9: cross-source duplicate containment matrix (dedup diagnostics)
    "q132_cross_source_dups" ->
      (graft.operators.Dedup.q132CrossSourceDupMatrix _),
    // r9: TPC-H Q5/Q7 planner-stress shapes, DataFrame-API spelled
    "q133_tpch_q5"         -> (Relational.q133TpchQ5 _),
    "q134_tpch_q7"         -> (Relational.q134TpchQ7 _),
    // r11: TPC-H Q13/Q16/Q19 rewrite-path stress (r10 verdict #5) —
    // COUNT-bug decorrelation, null-aware anti join, disjunctive pushdown
    "q135_tpch_q13"        -> (Relational.q135TpchQ13 _),
    "q136_tpch_q16"        -> (Relational.q136TpchQ16 _),
    "q137_tpch_q19"        -> (Relational.q137TpchQ19 _),
    "q138_tpch_q2"         -> (Relational.q138TpchQ2 _),
    "q139_tpch_q11"        -> (Relational.q139TpchQ11 _),
    "q140_tpch_q8"         -> (Relational.q140TpchQ8 _),
    // r12: the two remaining TPC-H rewrite shapes (r11 verdict #5) —
    // Q9 join-order stress under a selective dim filter, Q12 fact-fact
    // CASE-conditional counts
    "q141_tpch_q9"         -> (Relational.q141TpchQ9 _),
    "q142_tpch_q12"        -> (Relational.q142TpchQ12 _),
    // r12 (2nd batch): Q4/Q6/Q14 — with these every one of TPC-H's 22
    // query classes has a covering rewrite shape in the registry
    "q143_tpch_q4"         -> (Relational.q143TpchQ4 _),
    "q144_tpch_q6"         -> (Relational.q144TpchQ6 _),
    "q145_tpch_q14"        -> (Relational.q145TpchQ14 _),
    // r13: the multimodal pillar's gated lanes (r12 verdict #1) — binary
    // payload dedup, frame-sample fingerprints, modality-mix accounting
    "q146_payload_dedup"   -> (Multimodal.q146PayloadDedup _),
    "q147_frame_fingerprints" -> (Multimodal.q147FrameFingerprints _),
    "q148_modality_mix"    -> (Multimodal.q148ModalityMix _),
    "q149_decode_features" -> (Multimodal.q149DecodeFeatures _),
    // r14: the multimodal pillar COMPOSED with the dedup/ANN stack (r13
    // verdict #6) — frame fingerprints → banding → confirmed keeper
    // clusters; batched-decode features → fused argmax-cosine assignment
    "q150_frame_neardup"   -> (Multimodal.q150FrameNeardup _),
    "q151_decode_ivf"      -> (Multimodal.q151DecodeIvf _),
    // r15: the dedup family's embedding leg gets its SCALING path —
    // SemDeDup (cluster-then-dedup-within): q48's IVF assignment prunes
    // the pair space, q37 stays the bounded all-pairs audit
    "q152_semdedup"        -> (Dedup.q152SemDedup _),
    // q156 (r16): the PRODUCTION dedup ladder composed into curation —
    // exact → MinHash near-dup (q50) → SemDeDup (q152) → decon → quota,
    // funnel-accounted (r15 verdict #5)
    "q156_curation_neardup" -> (graft.operators.Curation.q156CurationNearDup _),
  )

  /** DuckDB dialect. Dialect splits vs the Spark plans (FIXTURES.md §B/§C):
    * json_extract_string ≡ get_json_object; epoch_ns(ts) ≡ the bigint
    * epoch-nanos Spark reads under nanosAsLong; integer-ish outputs CAST to
    * BIGINT on both sides (DuckDB LENGTH/EXTRACT/ROW_NUMBER return BIGINT,
    * DuckDB SUM(BIGINT) returns HUGEINT). Every lane is COMPUTED-oracle
    * since r13: the last golden-VALUES snapshots (q49/q129 DataSketches)
    * left for driver-surface error bands — see the q34 block comment. */
  def baseOracleSql: Map[String, String] = computedOracleSql

  // ---- DuckDB replay of the universal-hash family (r10 verdict #3) ----
  // The q25 fold (Java String#hashCode mod 2³², BMP-only caveat there)
  // reduced mod p, then the tabulated (a, b) constants interpolated from
  // Dedup's arrays — the SAME literals the Spark operators compile in, so
  // the engines share values, not a reimplementation.
  private def duckFold(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length($s) + 1), j -> CAST(unicode(substr($s, CAST(j AS INT), 1)) AS BIGINT))), (x, y) -> (x * 31 + y) % 4294967296)"
  private def duckBaseHash(s: String): String =
    s"(${duckFold(s)} % ${Dedup.MinhashP})"

  /** q34: shingle → fold → 16 universal mins → lossless band pack →
    * bucket stats, re-derived from raw text entirely in DuckDB. */
  private def minhashBandsOracle: String = {
    import Dedup.{MinHashK, MinhashP, minhashA, minhashB}
    val mins = (0 until MinHashK)
      .map(i => s"MIN((${minhashA(i)} * x + ${minhashB(i)}) % $MinhashP) AS mh$i")
      .mkString(", ")
    val bandSel = (0 until 4).map { b =>
      def mh(r: Int) = s"mh${b * 4 + r}"
      s"SELECT doc_id, $b AS band, ${mh(0)} * 2147483648 + ${mh(1)} AS sig1, ${mh(2)} * 2147483648 + ${mh(3)} AS sig2 FROM sig"
    }.mkString(" UNION ALL ")
    "WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
      "f AS (SELECT doc_id, words FROM w WHERE len(words) >= 3), " +
      "sh AS (SELECT doc_id, unnest(list_transform(range(0, len(words) - 2), i -> array_to_string(list_slice(words, i + 1, i + 3), ' '))) AS sh FROM f), " +
      s"hx AS (SELECT doc_id, ${duckBaseHash("sh")} AS x FROM sh), " +
      s"sig AS (SELECT doc_id, $mins FROM hx GROUP BY doc_id), " +
      s"b AS ($bandSel), " +
      "g AS (SELECT band, sig1, sig2, COUNT(*) AS bucket_n FROM b GROUP BY 1, 2, 3) " +
      "SELECT band, CAST(COUNT(*) AS BIGINT) AS n_buckets, CAST(SUM(CASE WHEN bucket_n > 1 THEN bucket_n ELSE 0 END) AS BIGINT) AS docs_in_collisions, CAST(SUM((bucket_n * (bucket_n - 1)) // 2) AS BIGINT) AS candidate_pairs FROM g GROUP BY band ORDER BY band"
  }

  /** q50: the FULL LSH→exact-Jaccard pipeline re-derived from raw text in
    * DuckDB (r11 — q50 leaves the golden set): q34's shingle→fold→16
    * mins→lossless band pack, then the bucket cap as a window count, the
    * in-bucket candidate self-join, and the exact-Jaccard confirm at the
    * production threshold. Constants (family tabulation, cap, threshold)
    * interpolate from the same Scala values the operators compile in. */
  private def neardupConfirmedOracle: String = {
    import Dedup.{MinHashK, MinhashP, minhashA, minhashB}
    val mins = (0 until MinHashK)
      .map(i => s"MIN((${minhashA(i)} * x + ${minhashB(i)}) % $MinhashP) AS mh$i")
      .mkString(", ")
    val bandSel = (0 until 4).map { b =>
      def mh(r: Int) = s"mh${b * 4 + r}"
      s"SELECT doc_id, $b AS band, ${mh(0)} * 2147483648 + ${mh(1)} AS sig1, ${mh(2)} * 2147483648 + ${mh(3)} AS sig2 FROM sig"
    }.mkString(" UNION ALL ")
    "WITH d AS (SELECT doc_id, text FROM documents), " +
      "w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM d), " +
      "f AS (SELECT doc_id, words FROM w WHERE len(words) >= 3), " +
      "sh AS (SELECT doc_id, unnest(list_transform(range(0, len(words) - 2), i -> array_to_string(list_slice(words, i + 1, i + 3), ' '))) AS sh FROM f), " +
      s"hx AS (SELECT doc_id, ${duckBaseHash("sh")} AS x FROM sh), " +
      s"sig AS (SELECT doc_id, $mins FROM hx GROUP BY doc_id), " +
      s"b AS ($bandSel), " +
      "bc AS (SELECT doc_id, band, sig1, sig2, COUNT(*) OVER (PARTITION BY band, sig1, sig2) AS bn FROM b), " +
      s"bands AS (SELECT doc_id, band, sig1, sig2 FROM bc WHERE bn <= ${Dedup.MinhashBucketCap}), " +
      "cand AS (SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2 FROM bands a JOIN bands b2 ON a.band = b2.band AND a.sig1 = b2.sig1 AND a.sig2 = b2.sig2 AND a.doc_id < b2.doc_id), " +
      "tok AS (SELECT DISTINCT doc_id, word FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word FROM d) x), " +
      "sz AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1), " +
      "inter AS (SELECT id1, id2, COUNT(*) AS inter FROM cand JOIN tok wa ON id1 = wa.doc_id JOIN tok wb ON id2 = wb.doc_id AND wa.word = wb.word GROUP BY 1, 2), " +
      "sc AS (SELECT id1, id2, ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS jaccard FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2), " +
      "p AS (SELECT * FROM sc WHERE jaccard >= 0.6) " +
      "SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs, COALESCE(ROUND(AVG(jaccard), 4), 0.0) AS avg_jaccard, COALESCE(ROUND(MAX(jaccard), 4), 0.0) AS max_jaccard FROM p"
  }

  /** The q161 ExactSubstr span chain as DuckDB CTEs, parameterized by a
    * name prefix and a source CTE exposing (doc_id, t) — q163 runs the
    * chain TWICE (pre-trim discovery, post-trim fixpoint audit), so the
    * spelling lives once. Yields `${p}sp` = (doc_id, span_start,
    * span_end), half-open token ranges, k = 8. */
  private def duckSpanCtes(p: String, src: String): String =
    s"${p}w AS (SELECT doc_id, string_split_regex(trim(t), '\\s+') AS ws FROM $src), " +
      s"${p}u AS (SELECT doc_id, ws, generate_subscripts(ws, 1) AS i, unnest(ws) AS _w FROM ${p}w), " +
      s"${p}g AS (SELECT doc_id, i - 1 AS pos, md5(array_to_string(ws[i:i+7], ' ')) AS h FROM ${p}u WHERE i + 7 <= len(ws)), " +
      s"${p}d AS (SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY h) AS copies FROM ${p}g), " +
      s"${p}o AS (SELECT doc_id, pos FROM ${p}d WHERE copies >= 2), " +
      s"${p}m AS (SELECT doc_id, pos, CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8 THEN 1 ELSE 0 END AS fresh FROM ${p}o), " +
      s"${p}i2 AS (SELECT doc_id, pos, SUM(fresh) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id FROM ${p}m), " +
      s"${p}sp AS (SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 8 AS span_end FROM ${p}i2 GROUP BY doc_id, span_id)"

  /** The shared q161/q163 canaried corpus CTE (doc_id, t). */
  private val duckSpanBase: String =
    "base AS (SELECT doc_id, concat(CASE WHEN doc_id % 3 = 0 THEN 'shared license header text appears before many documents in the crawl corpus ' ELSE '' END, text, CASE WHEN doc_id % 5 = 0 THEN ' subscribe to our newsletter for updates and special offers' ELSE '' END) AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0)"

  /** q163: discover → trim → re-discover replayed in DuckDB — the span
    * chain over the canaried corpus, an equi ANTI JOIN token cut against
    * the exploded span positions (1-based i vs the chain's 0-based pos;
    * the earlier correlated-range NOT EXISTS spelling needed >48 GB in
    * DuckDB at sf1 scale — spans are few, so exploding their positions
    * turns the cut into a cheap hash anti-join), string_agg re-join, and the chain AGAIN
    * over the trimmed text for the fixpoint audit. */
  private def exactSubstrTrimOracle: String = materializeCtes(
    s"WITH $duckSpanBase, ${duckSpanCtes("", "base")}, " +
      "tok AS (SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w FROM (SELECT doc_id, string_split_regex(trim(t), '\\s+') AS ws FROM base) z), " +
      "cutpos AS (SELECT doc_id, unnest(generate_series(span_start, span_end - 1)) AS cpos FROM sp), " +
      "kept AS (SELECT t.doc_id, t.i, t.w FROM tok t ANTI JOIN cutpos c ON c.doc_id = t.doc_id AND c.cpos = t.i - 1), " +
      "trimmed AS (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS t, COUNT(*) AS kept FROM kept GROUP BY doc_id), " +
      "acct AS (SELECT b.doc_id, CAST(COALESCE(tr.kept, 0) AS BIGINT) AS kept_tokens, CAST(len(string_split_regex(trim(b.t), '\\s+')) - COALESCE(tr.kept, 0) AS BIGINT) AS trimmed_tokens FROM base b LEFT JOIN trimmed tr USING (doc_id)), " +
      duckSpanCtes("r", "trimmed") + ", " +
      "res AS (SELECT CAST(COUNT(*) AS BIGINT) AS residual_spans, CAST(COALESCE(SUM(span_end - span_start), 0) AS BIGINT) AS residual_tokens FROM rsp) " +
      "SELECT a.doc_id, kept_tokens, trimmed_tokens, residual_spans, residual_tokens FROM acct a, res ORDER BY a.doc_id",
    // multi-referenced backbone stages pinned: without MATERIALIZED the
    // final projection's references re-inline the whole chain and the
    // co-resident copies OOM'd DuckDB at sf1 scale (48 GB)
    Seq("base", "kept", "trimmed", "acct"))

  /** The q164 near-dup canary text (DuckDB dialect), group token g<div500>
    * interleaved every third word — see Curation.neardupCanaryText. */
  private def duckNeardupCanary(idExpr: String): String = {
    val g = s"CAST($idExpr // 500 AS VARCHAR)"
    s"concat('neardup canary cluster g', $g, ' alpha beta g', $g, ' gamma delta g', $g, " +
      s"' epsilon zeta g', $g, ' eta theta g', $g, ' iota kappa g', $g, ' lambda mu g', $g, " +
      s"' nu xi g', $g, ' omicron pi g', $g, ' rho sigma v', CAST($idExpr AS VARCHAR))"
  }

  /** q164: the near-dup-aware split replayed end to end — the q50
    * LSH→Jaccard pipeline over the canaried corpus, exact-group
    * contraction to min-id reps, a RECURSIVE transitive-closure min-label
    * (the q79 fixpoint in closed recursive form — clusters are small, the
    * closure is bounded by Σ|component|²), the per-component min-fp split
    * assignment, and the paired leak audits. */
  private def neardupAwareSplitOracle: String = {
    import Dedup.{MinHashK, MinhashP, minhashA, minhashB}
    val mins = (0 until MinHashK)
      .map(i => s"MIN((${minhashA(i)} * x + ${minhashB(i)}) % $MinhashP) AS mh$i")
      .mkString(", ")
    val bandSel = (0 until 4).map { b =>
      def mh(r: Int) = s"mh${b * 4 + r}"
      s"SELECT doc_id, $b AS band, ${mh(0)} * 2147483648 + ${mh(1)} AS sig1, ${mh(2)} * 2147483648 + ${mh(3)} AS sig2 FROM sig"
    }.mkString(" UNION ALL ")
    def splitCase(src: String): String =
      s"CASE WHEN CAST(concat('0x', substring(md5(concat('q164|', $src)), 1, 8)) AS BIGINT) % 10 < 8 THEN 'train' " +
        s"WHEN CAST(concat('0x', substring(md5(concat('q164|', $src)), 1, 8)) AS BIGINT) % 10 = 8 THEN 'val' ELSE 'test' END"
    s"WITH RECURSIVE d AS (SELECT doc_id, CASE WHEN doc_id % 50 = 3 THEN ${duckNeardupCanary("doc_id")} ELSE text END AS text FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), " +
      // ---- the q50 confirmed-pair replay over the canaried corpus
      "w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM d), " +
      "fw AS (SELECT doc_id, words FROM w WHERE len(words) >= 3), " +
      "sh AS (SELECT doc_id, unnest(list_transform(range(0, len(words) - 2), i -> array_to_string(list_slice(words, i + 1, i + 3), ' '))) AS sh FROM fw), " +
      s"hx AS (SELECT doc_id, ${duckBaseHash("sh")} AS x FROM sh), " +
      s"sig AS (SELECT doc_id, $mins FROM hx GROUP BY doc_id), " +
      s"b AS ($bandSel), " +
      "bc AS (SELECT doc_id, band, sig1, sig2, COUNT(*) OVER (PARTITION BY band, sig1, sig2) AS bn FROM b), " +
      s"bands AS (SELECT doc_id, band, sig1, sig2 FROM bc WHERE bn <= ${Dedup.MinhashBucketCap}), " +
      "cand AS (SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2 FROM bands a JOIN bands b2 ON a.band = b2.band AND a.sig1 = b2.sig1 AND a.sig2 = b2.sig2 AND a.doc_id < b2.doc_id), " +
      "tok AS (SELECT DISTINCT doc_id, word FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word FROM d) x), " +
      "sz AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1), " +
      "inter AS (SELECT id1, id2, COUNT(*) AS inter FROM cand JOIN tok wa ON id1 = wa.doc_id JOIN tok wb ON id2 = wb.doc_id AND wa.word = wb.word GROUP BY 1, 2), " +
      "prs AS (SELECT id1, id2 FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) >= 0.6), " +
      // ---- contract exact groups, close components, assign per min-fp
      "f2 AS (SELECT doc_id, md5(text) AS fp FROM d), " +
      "rep AS (SELECT doc_id, fp, MIN(doc_id) OVER (PARTITION BY fp) AS rep FROM f2), " +
      "redge AS (SELECT DISTINCT r1.rep AS src, r2.rep AS dst FROM prs JOIN rep r1 ON prs.id1 = r1.doc_id JOIN rep r2 ON prs.id2 = r2.doc_id WHERE r1.rep <> r2.rep), " +
      "sym AS (SELECT src, dst FROM redge UNION SELECT dst AS src, src AS dst FROM redge), " +
      "reach AS (SELECT src AS a, dst AS b FROM sym UNION SELECT reach.a, sym.dst AS b FROM reach JOIN sym ON reach.b = sym.src), " +
      "lbl AS (SELECT a, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a), " +
      "cmp AS (SELECT r.doc_id, r.fp, COALESCE(l.comp, r.rep) AS comp FROM rep r LEFT JOIN lbl l ON l.a = r.rep), " +
      "rfp AS (SELECT comp, MIN(fp) AS rep_fp FROM cmp GROUP BY comp), " +
      s"spl AS (SELECT c.doc_id, c.fp, c.comp, ${splitCase("rfp.rep_fp")} AS split FROM cmp c JOIN rfp USING (comp)), " +
      s"nspl AS (SELECT doc_id, ${splitCase("fp")} AS nsplit FROM cmp), " +
      // ---- audits
      "ps AS (SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT comp) AS n_components FROM spl GROUP BY split), " +
      "lk AS (SELECT CAST(COALESCE(SUM(CASE WHEN a1.split <> a2.split THEN 1 ELSE 0 END), 0) AS BIGINT) AS neardup_leak_pairs, CAST(COALESCE(SUM(CASE WHEN n1.nsplit <> n2.nsplit THEN 1 ELSE 0 END), 0) AS BIGINT) AS naive_leak_pairs FROM prs JOIN spl a1 ON prs.id1 = a1.doc_id JOIN spl a2 ON prs.id2 = a2.doc_id JOIN nspl n1 ON prs.id1 = n1.doc_id JOIN nspl n2 ON prs.id2 = n2.doc_id), " +
      "el AS (SELECT CAST(SUM(CASE WHEN nsp >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS exact_leak_groups FROM (SELECT fp, COUNT(DISTINCT split) AS nsp FROM spl GROUP BY fp) z), " +
      "mc AS (SELECT CAST(MAX(csz) AS BIGINT) AS max_component FROM (SELECT comp, COUNT(*) AS csz FROM spl GROUP BY comp) z) " +
      "SELECT split, n_docs, n_components, neardup_leak_pairs, naive_leak_pairs, exact_leak_groups, max_component FROM ps, lk, el, mc ORDER BY split"
  }

  /** q167: the trim-FIRST curation funnel's closed form — the q163 span
    * chain (prefix `z`, over the canaried SOURCE-carrying corpus), the
    * NOT EXISTS token cut + re-join, then the q111 funnel tail over the
    * TRIMMED text (quality/dedup/decon/quota/positions), with the
    * benchmark shingles built from the RAW canaried docs (the eval set is
    * not trimmed) and the trim accounting over post-trim non-empty docs —
    * exactly curate(exactSubstrTrim = true)'s narrow-projection read. */
  private def curationTrimmedOracle: String = materializeCtes(
    "WITH base AS (SELECT doc_id, source, concat(CASE WHEN doc_id % 3 = 0 THEN 'shared license header text appears before many documents in the crawl corpus ' ELSE '' END, text, CASE WHEN doc_id % 5 = 0 THEN ' subscribe to our newsletter for updates and special offers' ELSE '' END) AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), " +
      duckSpanCtes("z", "base") + ", " +
      "tok AS (SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w FROM (SELECT doc_id, string_split_regex(trim(t), '\\s+') AS ws FROM base) x), " +
      "cutpos AS (SELECT doc_id, unnest(generate_series(span_start, span_end - 1)) AS cpos FROM zsp), " +
      "kept AS (SELECT t.doc_id, t.i, t.w FROM tok t ANTI JOIN cutpos c ON c.doc_id = t.doc_id AND c.cpos = t.i - 1), " +
      "trimmed AS (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS t2, COUNT(*) AS kept FROM kept GROUP BY doc_id), " +
      "tc AS (SELECT b.doc_id, b.source, COALESCE(tr.t2, '') AS text, len(string_split_regex(trim(b.t), '\\s+')) - COALESCE(tr.kept, 0) AS tt FROM base b LEFT JOIN trimmed tr USING (doc_id)), " +
      "ne AS (SELECT doc_id, source, text, tt FROM tc WHERE length(trim(text)) > 0), " +
      "ta AS (SELECT CAST(COALESCE(SUM(CASE WHEN tt > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS trim_docs, CAST(COALESCE(SUM(tt), 0) AS BIGINT) AS trim_tokens FROM ne), " +
      "q AS (SELECT * FROM ne WHERE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) >= 0.45), " +
      "k AS (SELECT md5(text) AS fp, MIN(doc_id) AS keep FROM q GROUP BY 1), " +
      "d AS (SELECT q.* FROM q JOIN k ON md5(q.text) = fp AND q.doc_id = keep), " +
      "qw AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM q), " +
      "shc AS (SELECT doc_id, array_to_string(list_slice(words, CAST(i AS INT), CAST(i AS INT) + 4), ' ') AS sh FROM (SELECT doc_id, words, unnest(generate_series(1, len(words) - 4)) AS i FROM qw WHERE len(words) >= 5) t), " +
      "bw AS (SELECT string_split_regex(trim(t), '\\s+') AS words FROM base WHERE doc_id % 100 = 0), " +
      "bsh AS (SELECT DISTINCT array_to_string(list_slice(words, CAST(i AS INT), CAST(i AS INT) + 4), ' ') AS sh FROM (SELECT words, unnest(generate_series(1, len(words) - 4)) AS i FROM bw WHERE len(words) >= 5) t), " +
      "contam AS (SELECT DISTINCT doc_id FROM shc JOIN bsh USING (sh)), " +
      "c AS (SELECT * FROM d WHERE doc_id NOT IN (SELECT doc_id FROM contam)), " +
      "r AS (SELECT doc_id, source, ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(concat('curate|', CAST(doc_id AS VARCHAR))), doc_id) AS rnk FROM c), " +
      "cap AS (SELECT doc_id FROM r WHERE rnk <= 15), " +
      "p AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY md5(concat('curate|pos|', CAST(doc_id AS VARCHAR))), doc_id) AS pos FROM cap) " +
      "SELECT ta.trim_docs, ta.trim_tokens, (SELECT COUNT(*) FROM ne) AS n_non_empty, (SELECT COUNT(*) FROM q) AS n_quality, (SELECT COUNT(*) FROM d) AS n_dedup, (SELECT COUNT(*) FROM c) AS n_clean, (SELECT COUNT(*) FROM cap) AS n_capped, CAST((SELECT SUM(doc_id) FROM cap) AS BIGINT) AS kept_id_sum, CAST((SELECT SUM(doc_id * pos) FROM p) AS BIGINT) AS pos_checksum FROM ta",
    // every stage the final projection's scalar subqueries touch is
    // pinned: un-materialized, each subquery re-inlines its whole chain
    // and the concurrent copies OOM'd DuckDB at sf1 scale (48 GB)
    Seq("base", "kept", "trimmed", "ne", "q", "d", "contam", "c", "cap", "p"))

  /** q175: the curate→near-dup-aware-split COMPOSITION replayed end to
    * end — the q167 trim-funnel chain (span discovery, token cut,
    * quality/dedup/decon/quota over the TRIMMED corpus, with the q175
    * trim-proof canary replacing doc_id % 20 == 3 texts and the q167
    * header/footer canaries on everything else), then the q164 chain
    * (LSH → exact-Jaccard confirm → exact-group contraction → RECURSIVE
    * component closure → per-component min-fp split, seed "q175|") over
    * the SURVIVORS. Quota rank bound 1,000,000 (present, not binding —
    * the composition is under test; q90 owns binding). Backbones
    * hand-annotated MATERIALIZED (the sf1 OOM discipline; the regex
    * helper can't anchor past WITH RECURSIVE). */
  private def curatedSplitOracle: String = {
    import Dedup.{MinHashK, MinhashP, minhashA, minhashB}
    val mins = (0 until MinHashK)
      .map(i => s"MIN((${minhashA(i)} * x + ${minhashB(i)}) % $MinhashP) AS mh$i")
      .mkString(", ")
    val bandSel = (0 until 4).map { b =>
      def mh(r: Int) = s"mh${b * 4 + r}"
      s"SELECT doc_id, $b AS band, ${mh(0)} * 2147483648 + ${mh(1)} AS sig1, ${mh(2)} * 2147483648 + ${mh(3)} AS sig2 FROM sig"
    }.mkString(" UNION ALL ")
    def splitCase(src: String): String =
      s"CASE WHEN CAST(concat('0x', substring(md5(concat('q175|', $src)), 1, 8)) AS BIGINT) % 10 < 8 THEN 'train' " +
        s"WHEN CAST(concat('0x', substring(md5(concat('q175|', $src)), 1, 8)) AS BIGINT) % 10 = 8 THEN 'val' ELSE 'test' END"
    val g = "CAST(doc_id // 200 AS VARCHAR)"
    val dd = "CAST(doc_id AS VARCHAR)"
    val canary = s"concat('trimsafe neardup canary g', $g, ' alpha beta g', $g, " +
      s"' u', $dd, 'a gamma delta g', $g, ' epsilon zeta g', $g, ' canary u', $dd, " +
      s"'b eta theta g', $g, ' alpha iota g', $g, ' beta u', $dd, 'c kappa g', $g, " +
      s"' gamma delta g', $g, ' eta theta v', $dd)"
    s"WITH RECURSIVE base AS MATERIALIZED (SELECT doc_id, source, CASE WHEN doc_id % 10 = 3 THEN $canary ELSE " +
      "concat(CASE WHEN doc_id % 3 = 0 THEN 'shared license header text appears before many documents in the crawl corpus ' ELSE '' END, text, CASE WHEN doc_id % 5 = 0 THEN ' subscribe to our newsletter for updates and special offers' ELSE '' END) END AS t " +
      "FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), " +
      duckSpanCtes("z", "base") + ", " +
      "tok AS (SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w FROM (SELECT doc_id, string_split_regex(trim(t), '\\s+') AS ws FROM base) x), " +
      "cutpos AS (SELECT doc_id, unnest(generate_series(span_start, span_end - 1)) AS cpos FROM zsp), " +
      "kept AS MATERIALIZED (SELECT t.doc_id, t.i, t.w FROM tok t ANTI JOIN cutpos cp ON cp.doc_id = t.doc_id AND cp.cpos = t.i - 1), " +
      "trimmed AS MATERIALIZED (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS t2, COUNT(*) AS kept FROM kept GROUP BY doc_id), " +
      "tc AS MATERIALIZED (SELECT b.doc_id, b.source, COALESCE(tr.t2, '') AS text, len(string_split_regex(trim(b.t), '\\s+')) - COALESCE(tr.kept, 0) AS tt FROM base b LEFT JOIN trimmed tr USING (doc_id)), " +
      "ne AS MATERIALIZED (SELECT doc_id, source, text, tt FROM tc WHERE length(trim(text)) > 0), " +
      "ta AS MATERIALIZED (SELECT CAST(COALESCE(SUM(CASE WHEN tt > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS trim_docs, CAST(COALESCE(SUM(tt), 0) AS BIGINT) AS trim_tokens FROM ne), " +
      "q AS MATERIALIZED (SELECT * FROM ne WHERE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) >= 0.45), " +
      "k AS (SELECT md5(text) AS fp, MIN(doc_id) AS keep FROM q GROUP BY 1), " +
      "d AS MATERIALIZED (SELECT q.* FROM q JOIN k ON md5(q.text) = fp AND q.doc_id = keep), " +
      "qw AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM q), " +
      "shc AS (SELECT doc_id, array_to_string(list_slice(words, CAST(i AS INT), CAST(i AS INT) + 4), ' ') AS sh FROM (SELECT doc_id, words, unnest(generate_series(1, len(words) - 4)) AS i FROM qw WHERE len(words) >= 5) t), " +
      "bw AS (SELECT string_split_regex(trim(t), '\\s+') AS words FROM base WHERE doc_id % 100 = 0), " +
      "bsh AS (SELECT DISTINCT array_to_string(list_slice(words, CAST(i AS INT), CAST(i AS INT) + 4), ' ') AS sh FROM (SELECT words, unnest(generate_series(1, len(words) - 4)) AS i FROM bw WHERE len(words) >= 5) t), " +
      "contam AS MATERIALIZED (SELECT DISTINCT doc_id FROM shc JOIN bsh USING (sh)), " +
      "c0 AS MATERIALIZED (SELECT * FROM d WHERE doc_id NOT IN (SELECT doc_id FROM contam)), " +
      "r AS (SELECT doc_id, source, text, ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(concat('curate|', CAST(doc_id AS VARCHAR))), doc_id) AS rnk FROM c0), " +
      "c AS MATERIALIZED (SELECT doc_id, text FROM r WHERE rnk <= 1000000), " +
      // ---- the q164 chain over the cleaned survivors (trimmed text)
      "w2 AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM c), " +
      "fw AS (SELECT doc_id, words FROM w2 WHERE len(words) >= 3), " +
      "sh2 AS (SELECT doc_id, unnest(list_transform(range(0, len(words) - 2), i -> array_to_string(list_slice(words, i + 1, i + 3), ' '))) AS sh FROM fw), " +
      s"hx AS (SELECT doc_id, ${duckBaseHash("sh")} AS x FROM sh2), " +
      s"sig AS MATERIALIZED (SELECT doc_id, $mins FROM hx GROUP BY doc_id), " +
      s"b AS ($bandSel), " +
      "bc AS (SELECT doc_id, band, sig1, sig2, COUNT(*) OVER (PARTITION BY band, sig1, sig2) AS bn FROM b), " +
      s"bands AS (SELECT doc_id, band, sig1, sig2 FROM bc WHERE bn <= ${Dedup.MinhashBucketCap}), " +
      "cand AS (SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2 FROM bands a JOIN bands b2 ON a.band = b2.band AND a.sig1 = b2.sig1 AND a.sig2 = b2.sig2 AND a.doc_id < b2.doc_id), " +
      "tok2 AS MATERIALIZED (SELECT DISTINCT doc_id, word FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word FROM c) x), " +
      "sz AS (SELECT doc_id, COUNT(*) AS sz FROM tok2 GROUP BY 1), " +
      "inter AS (SELECT id1, id2, COUNT(*) AS inter FROM cand JOIN tok2 wa ON id1 = wa.doc_id JOIN tok2 wb ON id2 = wb.doc_id AND wa.word = wb.word GROUP BY 1, 2), " +
      "prs AS MATERIALIZED (SELECT id1, id2 FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) >= 0.6), " +
      "f2 AS MATERIALIZED (SELECT doc_id, md5(text) AS fp FROM c), " +
      "rep AS MATERIALIZED (SELECT doc_id, fp, MIN(doc_id) OVER (PARTITION BY fp) AS rep FROM f2), " +
      "redge AS (SELECT DISTINCT r1.rep AS src, r2.rep AS dst FROM prs JOIN rep r1 ON prs.id1 = r1.doc_id JOIN rep r2 ON prs.id2 = r2.doc_id WHERE r1.rep <> r2.rep), " +
      "sym AS MATERIALIZED (SELECT src, dst FROM redge UNION SELECT dst AS src, src AS dst FROM redge), " +
      "reach AS (SELECT src AS a, dst AS b FROM sym UNION SELECT reach.a, sym.dst AS b FROM reach JOIN sym ON reach.b = sym.src), " +
      "lbl AS (SELECT a, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a), " +
      "cmp AS (SELECT r2.doc_id, r2.fp, COALESCE(l.comp, r2.rep) AS comp FROM rep r2 LEFT JOIN lbl l ON l.a = r2.rep), " +
      "rfp AS (SELECT comp, MIN(fp) AS rep_fp FROM cmp GROUP BY comp), " +
      s"spl AS MATERIALIZED (SELECT cm.doc_id, cm.fp, cm.comp, ${splitCase("rfp.rep_fp")} AS split FROM cmp cm JOIN rfp USING (comp)), " +
      s"nspl AS MATERIALIZED (SELECT doc_id, ${splitCase("fp")} AS nsplit FROM cmp), " +
      "ps AS (SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT comp) AS n_components FROM spl GROUP BY split), " +
      "lk AS (SELECT CAST(COALESCE(SUM(CASE WHEN a1.split <> a2.split THEN 1 ELSE 0 END), 0) AS BIGINT) AS neardup_leak_pairs, CAST(COALESCE(SUM(CASE WHEN n1.nsplit <> n2.nsplit THEN 1 ELSE 0 END), 0) AS BIGINT) AS naive_leak_pairs FROM prs JOIN spl a1 ON prs.id1 = a1.doc_id JOIN spl a2 ON prs.id2 = a2.doc_id JOIN nspl n1 ON prs.id1 = n1.doc_id JOIN nspl n2 ON prs.id2 = n2.doc_id), " +
      "el AS (SELECT CAST(SUM(CASE WHEN nsp >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS exact_leak_groups FROM (SELECT fp, COUNT(DISTINCT split) AS nsp FROM spl GROUP BY fp) z), " +
      "mc AS (SELECT CAST(MAX(csz) AS BIGINT) AS max_component FROM (SELECT comp, COUNT(*) AS csz FROM spl GROUP BY comp) z) " +
      "SELECT split, n_docs, n_components, neardup_leak_pairs, naive_leak_pairs, exact_leak_groups, max_component, " +
      "ta.trim_docs, ta.trim_tokens, (SELECT COUNT(*) FROM ne) AS n_non_empty, (SELECT COUNT(*) FROM q) AS n_quality, (SELECT COUNT(*) FROM d) AS n_dedup, (SELECT COUNT(*) FROM c0) AS n_clean, (SELECT COUNT(*) FROM c) AS n_capped " +
      "FROM ps, lk, el, mc, ta ORDER BY split"
  }

  /** q168: BPE tokenizer training replayed exactly — word-frequency table,
    * char+</w> symbol decomposition, then NMerges chained CTE rounds: pair
    * counts (weighted by word freq, overlap-counting), best pair by
    * (count DESC, lhs, rhs), greedy-left fuse via list_reduce with the
    * unit-separator string fold (the SAME fold semantics as the lane's
    * aggregate() HOF — init = first symbol, a match appends the right
    * symbol without the separator). DuckDB materializes multiply-referenced
    * CTEs, so the chain is linear; all arithmetic is integer. */
  /** The shared BPE training chain (q168/q170): WITH-prefix CTE text up to
    * the final vocab table wt{NMerges}. Every CTE is AS MATERIALIZED —
    * DuckDB INLINES plain CTEs, and each round references its predecessor
    * twice (pair counts + apply), which would re-expand the base 2^N
    * times. */
  private def bpeChainCtes: String = bpeChainCtesWhere("")

  /** [[bpeChainCtes]] with an extra document predicate — q173 trains the
    * replayed model on the doc_id-even HALF of the corpus. */
  private def bpeChainCtesWhere(docAnd: String): String = {
    import graft.operators.Tokenizer.{MaxWordLen, NMerges}
    val sb = new StringBuilder
    sb ++= s"WITH wf AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word FROM documents WHERE text IS NOT NULL$docAnd) t " +
      s"WHERE regexp_full_match(word, '[a-z]+') AND length(word) <= $MaxWordLen GROUP BY word), "
    sb ++= "wt0 AS MATERIALIZED (SELECT word, freq, list_append(list_transform(range(1, length(word) + 1), i -> substr(word, CAST(i AS INT), 1)), '</w>') AS syms FROM wf), "
    sb ++= "t0 AS MATERIALIZED (SELECT SUM(freq * len(syms)) AS tot FROM wt0), "
    for (i <- 1 to NMerges) {
      val p = i - 1
      // pc is referenced exactly once (by b) — leaving it inlined lets the
      // pair explosion STREAM through the aggregation instead of pinning
      // vocab×len rows per round in the oracle engine's memory (the sf1
      // gate OOM'd with 12 of these materialized simultaneously)
      sb ++= s"pc$i AS (SELECT p.a AS a, p.b AS b, CAST(SUM(freq) AS BIGINT) AS cnt FROM (SELECT freq, unnest(list_transform(range(1, len(syms)), j -> {'a': syms[j], 'b': syms[j + 1]})) AS p FROM wt$p) e GROUP BY 1, 2), "
      sb ++= s"b$i AS MATERIALIZED (SELECT a AS ba, b AS bb, cnt FROM pc$i ORDER BY cnt DESC, a, b LIMIT 1), "
      sb ++= s"wt$i AS MATERIALIZED (SELECT word, freq, string_split(list_reduce(syms, (acc, x) -> CASE WHEN x = bb AND (acc = ba OR suffix(acc, chr(31) || ba)) THEN acc || x ELSE acc || chr(31) || x END), chr(31)) AS syms FROM wt$p, b$i), "
      sb ++= s"t$i AS MATERIALIZED (SELECT SUM(freq * len(syms)) AS tot FROM wt$i), "
    }
    sb.toString
  }

  private def bpeTrainOracle: String = {
    import graft.operators.Tokenizer.NMerges
    bpeChainCtes + "fin AS (" +
      (1 to NMerges).map { i =>
        val p = i - 1
        s"SELECT CAST($i AS BIGINT) AS merge_rank, ba AS lhs, bb AS rhs, ba || bb AS merged, cnt AS pair_count, CAST(t$p.tot - t$i.tot AS BIGINT) AS merges_applied, CAST(t$i.tot AS BIGINT) AS symbols_after FROM b$i, t$p, t$i"
      }.mkString(" UNION ALL ") +
      ") SELECT * FROM fin ORDER BY merge_rank"
  }

  /** q170: tokenize-under-the-learned-vocab replayed — the q168 chain to
    * wt{NMerges}, then one corpus re-pass LEFT-joined to the final vocab
    * (membership IS the pre-tokenizer conformance test; the vocab was
    * built from this corpus). */
  private def bpeTokenizeOracle: String = {
    import graft.operators.Tokenizer.NMerges
    bpeChainCtes +
      "dt AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), " +
      s"vz AS MATERIALIZED (SELECT word, CAST(len(syms) AS BIGINT) AS nsym FROM wt$NMerges) " +
      "SELECT dt.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words, CAST(SUM(CASE WHEN vz.nsym IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_conforming, CAST(COALESCE(SUM(vz.nsym), 0) AS BIGINT) AS bpe_tokens " +
      "FROM dt LEFT JOIN vz ON dt.word = vz.word GROUP BY dt.doc_id ORDER BY dt.doc_id"
  }

  /** q173: merge-replay encode of UNSEEN text replayed in DuckDB — the
    * q168 training chain restricted to the doc_id-even half, then a
    * SECOND fold chain (ht0..htN) that seeds every DISTINCT held-out
    * conforming word with chars + </w> and applies each round's
    * MATERIALIZED best pair (b$i) via the same list_reduce fold — rank-
    * ordered replay, exactly the lane's expression-literal fold. The
    * final per-doc aggregation left-joins occurrences to the replayed
    * lengths and to the train vocabulary (wt0's word set) for the OOV
    * audit. */
  private def bpeEncodeUnseenOracle: String = {
    import graft.operators.Tokenizer.{MaxWordLen, NMerges}
    val sb = new StringBuilder
    sb ++= bpeChainCtesWhere(" AND doc_id % 2 = 0")
    sb ++= "hc AS (SELECT doc_id, text || ' oovcanaryz' || substr('abcdefg', CAST(doc_id % 7 AS INT) + 1, 1) AS text FROM documents WHERE doc_id % 2 <> 0), "
    sb ++= "hd AS MATERIALIZED (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word FROM hc WHERE text IS NOT NULL AND length(trim(text)) > 0), "
    sb ++= s"ht0 AS MATERIALIZED (SELECT word, list_append(list_transform(range(1, length(word) + 1), i -> substr(word, CAST(i AS INT), 1)), '</w>') AS syms FROM (SELECT DISTINCT word FROM hd WHERE regexp_full_match(word, '[a-z]+') AND length(word) <= $MaxWordLen) t), "
    for (i <- 1 to NMerges) {
      val p = i - 1
      sb ++= s"ht$i AS MATERIALIZED (SELECT word, string_split(list_reduce(syms, (acc, x) -> CASE WHEN x = bb AND (acc = ba OR suffix(acc, chr(31) || ba)) THEN acc || x ELSE acc || chr(31) || x END), chr(31)) AS syms FROM ht$p, b$i), "
    }
    sb ++= s"hv AS MATERIALIZED (SELECT word, CAST(len(syms) AS BIGINT) AS nsym FROM ht$NMerges), "
    sb ++= "tv AS MATERIALIZED (SELECT word FROM wt0) "
    sb ++= "SELECT hd.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words, CAST(SUM(CASE WHEN hv.nsym IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_conforming, CAST(SUM(CASE WHEN hv.nsym IS NOT NULL AND tv.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov, CAST(COALESCE(SUM(hv.nsym), 0) AS BIGINT) AS bpe_tokens FROM hd LEFT JOIN hv ON hd.word = hv.word LEFT JOIN tv ON hd.word = tv.word GROUP BY hd.doc_id ORDER BY hd.doc_id"
    sb.toString
  }

  /** q169: the Naive-Bayes quality classifier RETRAINED in DuckDB — the
    * whole model (per-token class counts over the 30% labeled sample,
    * Laplace smoothing, integer micro-nat quantization of each log-odds,
    * +1-smoothed class priors) is one aggregation chain, so the oracle
    * replays training AND corpus scoring exactly; the ln-determinism
    * argument is q115's (< 1-ulp libm agreement; a flip needs the true
    * value within ~1e-10 of a .5 micro-nat grid point), and every SUM is
    * over BIGINTs, so the pred threshold is an integer compare. */
  private def qualityClassifierOracle: String = {
    import graft.operators.Classifier.{MinAlphaRatio, TrainKeep, TrainMod}
    "WITH base AS (SELECT doc_id, doc_id % " + TrainMod + " < " + TrainKeep + " AS is_train, " +
      s"CASE WHEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) >= $MinAlphaRatio THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS heur_label, text " +
      "FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), " +
      "toks AS (SELECT doc_id, is_train, heur_label, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok FROM base), " +
      "counts AS (SELECT tok, CAST(SUM(CASE WHEN heur_label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cp, CAST(SUM(CASE WHEN heur_label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cn FROM toks WHERE is_train GROUP BY tok), " +
      "sc AS (SELECT CAST(SUM(cp) AS BIGINT) AS np, CAST(SUM(cn) AS BIGINT) AS nn, CAST(COUNT(*) AS BIGINT) AS v FROM counts), " +
      "pr AS (SELECT CAST(SUM(CASE WHEN heur_label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS dpos, CAST(SUM(CASE WHEN heur_label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dneg FROM base WHERE is_train), " +
      "lo AS (SELECT tok, CAST(ROUND((ln(cp + 1.0) - ln(cn + 1.0) - ln(np + v) + ln(nn + v)) * 1000000) AS BIGINT) AS loq FROM counts, sc), " +
      "oov AS (SELECT CAST(ROUND((ln(0 + 1.0) - ln(0 + 1.0) - ln(np + v) + ln(nn + v)) * 1000000) AS BIGINT) AS loq FROM sc), " +
      "scored AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, CAST(SUM(COALESCE(lo.loq, oov.loq)) AS BIGINT) AS tok_score FROM toks t LEFT JOIN lo ON t.tok = lo.tok CROSS JOIN oov GROUP BY t.doc_id) " +
      "SELECT b.doc_id, b.is_train, b.heur_label, s.n_tokens, " +
      "s.tok_score + CAST(ROUND((ln(dpos + 1.0) - ln(dneg + 1.0)) * 1000000) AS BIGINT) AS score_micronats, " +
      "CASE WHEN s.tok_score + CAST(ROUND((ln(dpos + 1.0) - ln(dneg + 1.0)) * 1000000) AS BIGINT) > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS pred " +
      "FROM base b JOIN scored s USING (doc_id) CROSS JOIN pr ORDER BY doc_id"
  }

  /** q156: the q111 composed-curation closed form with the production
    * near-dup ladder inserted (r15 verdict #5) — q50's LSH→Jaccard victim
    * set (replayed over the quality passers, the same pure-text contract
    * the operator declares) and q152's SemDeDup victim set (the embedding
    * replay verbatim), each applied as an anti-join between exact dedup
    * and decontamination. Funnel counts for all seven stages + survivor
    * id-sum + Σ doc_id·pos. */
  private def curationNearDupOracle: String = {
    import Dedup.{MinHashK, MinhashP, minhashA, minhashB}
    val mins = (0 until MinHashK)
      .map(i => s"MIN((${minhashA(i)} * x + ${minhashB(i)}) % $MinhashP) AS mh$i")
      .mkString(", ")
    val bandSel = (0 until 4).map { b =>
      def mh(r: Int) = s"mh${b * 4 + r}"
      s"SELECT doc_id, $b AS band, ${mh(0)} * 2147483648 + ${mh(1)} AS sig1, ${mh(2)} * 2147483648 + ${mh(3)} AS sig2 FROM nsig"
    }.mkString(" UNION ALL ")
    "WITH ne AS (SELECT doc_id, source, text FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), " +
      "q AS (SELECT * FROM ne WHERE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) >= 0.45), " +
      "k AS (SELECT md5(text) AS fp, MIN(doc_id) AS keep FROM q GROUP BY 1), " +
      "d AS (SELECT q.* FROM q JOIN k ON md5(q.text) = fp AND q.doc_id = keep), " +
      // ---- MinHash near-dup victims: the q50 replay over quality passers
      "nw AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM q), " +
      "nf AS (SELECT doc_id, words FROM nw WHERE len(words) >= 3), " +
      "nsh AS (SELECT doc_id, unnest(list_transform(range(0, len(words) - 2), i -> array_to_string(list_slice(words, i + 1, i + 3), ' '))) AS sh FROM nf), " +
      s"nhx AS (SELECT doc_id, ${duckBaseHash("sh")} AS x FROM nsh), " +
      s"nsig AS (SELECT doc_id, $mins FROM nhx GROUP BY doc_id), " +
      s"nb AS ($bandSel), " +
      "nbc AS (SELECT doc_id, band, sig1, sig2, COUNT(*) OVER (PARTITION BY band, sig1, sig2) AS bn FROM nb), " +
      s"nbands AS (SELECT doc_id, band, sig1, sig2 FROM nbc WHERE bn <= ${Dedup.MinhashBucketCap}), " +
      "ncand AS (SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2 FROM nbands a JOIN nbands b2 ON a.band = b2.band AND a.sig1 = b2.sig1 AND a.sig2 = b2.sig2 AND a.doc_id < b2.doc_id), " +
      "ntok AS (SELECT DISTINCT doc_id, word FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word FROM q) x), " +
      "nsz AS (SELECT doc_id, COUNT(*) AS sz FROM ntok GROUP BY 1), " +
      "ninter AS (SELECT id1, id2, COUNT(*) AS inter FROM ncand JOIN ntok wa ON id1 = wa.doc_id JOIN ntok wb ON id2 = wb.doc_id AND wa.word = wb.word GROUP BY 1, 2), " +
      "ndv AS (SELECT DISTINCT id2 AS doc_id FROM ninter JOIN nsz sa ON sa.doc_id = id1 JOIN nsz sb ON sb.doc_id = id2 WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) >= 0.6), " +
      "nd AS (SELECT * FROM d WHERE doc_id NOT IN (SELECT doc_id FROM ndv)), " +
      // ---- SemDeDup victims: the q152 replay over the embeddings table
      s"$sqlEmb, $sqlCentroids, $sqlAssign, " +
      "mem AS (SELECT vid, cluster, ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY vid) AS mrk FROM asg), " +
      s"mv AS (SELECT vid, cluster, list_transform(v, x -> x / nrm) AS vn FROM (SELECT m.vid, m.cluster, e.v, SQRT(${sqlDot("e.v", "e.v", 64)}) AS nrm FROM mem m JOIN e ON e.vec_id = m.vid WHERE m.mrk <= ${Dedup.SemMemberCap}) t), " +
      s"sdv AS (SELECT DISTINCT b.vid AS doc_id FROM mv a JOIN mv b ON a.cluster = b.cluster AND a.vid < b.vid WHERE ROUND(${sqlDot("a.vn", "b.vn", 64)}, 4) >= ${Dedup.SemDupTau}), " +
      "sd AS (SELECT * FROM nd WHERE doc_id NOT IN (SELECT doc_id FROM sdv)), " +
      // ---- decontamination / quota / positions: the q111 tail over sd
      "qw AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM q), " +
      "shc AS (SELECT doc_id, array_to_string(list_slice(words, CAST(i AS INT), CAST(i AS INT) + 4), ' ') AS sh FROM (SELECT doc_id, words, unnest(generate_series(1, len(words) - 4)) AS i FROM qw WHERE len(words) >= 5) t), " +
      "bw AS (SELECT string_split_regex(trim(text), '\\s+') AS words FROM documents WHERE doc_id % 100 = 0), " +
      "bsh AS (SELECT DISTINCT array_to_string(list_slice(words, CAST(i AS INT), CAST(i AS INT) + 4), ' ') AS sh FROM (SELECT words, unnest(generate_series(1, len(words) - 4)) AS i FROM bw WHERE len(words) >= 5) t), " +
      "contam AS (SELECT DISTINCT doc_id FROM shc JOIN bsh USING (sh)), " +
      "cl AS (SELECT * FROM sd WHERE doc_id NOT IN (SELECT doc_id FROM contam)), " +
      "r AS (SELECT doc_id, source, ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(concat('curate|', CAST(doc_id AS VARCHAR))), doc_id) AS rnk FROM cl), " +
      "cap AS (SELECT doc_id FROM r WHERE rnk <= 15), " +
      "pp AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY md5(concat('curate|pos|', CAST(doc_id AS VARCHAR))), doc_id) AS pos FROM cap) " +
      "SELECT (SELECT COUNT(*) FROM ne) AS n_non_empty, (SELECT COUNT(*) FROM q) AS n_quality, (SELECT COUNT(*) FROM d) AS n_dedup, (SELECT COUNT(*) FROM nd) AS n_neardup, (SELECT COUNT(*) FROM sd) AS n_semdedup, (SELECT COUNT(*) FROM cl) AS n_clean, (SELECT COUNT(*) FROM cap) AS n_capped, CAST((SELECT SUM(doc_id) FROM cap) AS BIGINT) AS kept_id_sum, CAST((SELECT SUM(doc_id * pos) FROM pp) AS BIGINT) AS pos_checksum"
  }

  /** q35: 64 universal parity votes per word, packed as two unsigned-range
    * halves (Dedup.simhash scaladoc on why not one 64-bit long). */
  private def simhashOracle: String = {
    import Dedup.{MinhashP, simhashA, simhashB}
    val votes = (0 until 64).map(b =>
      s"SUM(CASE WHEN ((${simhashA(b)} * x + ${simhashB(b)}) % $MinhashP) % 2 = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(", ")
    def pack(bits: Range, base: Int) = bits.map(b =>
      s"(CASE WHEN v$b > 0 THEN CAST(${1L << (b - base)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    "WITH w AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS wd FROM documents), " +
      s"hx AS (SELECT doc_id, ${duckBaseHash("wd")} AS x FROM w), " +
      s"v AS (SELECT doc_id, $votes FROM hx GROUP BY doc_id) " +
      s"SELECT doc_id, ${pack(32 until 64, 32)} AS simhash_hi, ${pack(0 until 32, 0)} AS simhash_lo FROM v ORDER BY doc_id"
  }

  /** q40: k=4 gram hashes (one universal mix over the base fold), window-4
    * minima, distinct count — the winnowing kernel as list arithmetic. */
  private def winnowOracle: String = {
    import Dedup.{MinhashP, WinnowA, WinnowB}
    val gramHash =
      s"($WinnowA * ${duckBaseHash("array_to_string(list_slice(words, i + 1, i + 4), ' ')")} + $WinnowB) % $MinhashP"
    "WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
      "f AS (SELECT doc_id, words FROM d WHERE len(words) >= 7), " +
      s"g AS (SELECT doc_id, list_transform(range(0, len(words) - 3), i -> $gramHash) AS grams FROM f), " +
      "m AS (SELECT doc_id, list_distinct(list_transform(range(0, len(grams) - 3), i -> list_min(list_slice(grams, i + 1, i + 4)))) AS fps FROM g) " +
      "SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp FROM m ORDER BY doc_id"
  }

  // ---- DuckDB replay of the float ANN lanes (r11 — q39/q48/q113/q114
  // leave the golden set). The kernels (AnnKernels.scala) accumulate dot
  // products and norms as LEFT-ASSOCIATIVE index-order double sums; SQL's
  // `a + b + c` parses left-associative and both engines read the same
  // float32 parquet values cast exactly to double, so every intermediate is
  // bit-identical and sign/argmax decisions replay exactly — no rounding
  // tolerance needed anywhere before the final display ROUND. Plane/stride/
  // codebook constants interpolate from the same Scala values the operators
  // compile in (the q34 discipline). Data caveat (checked, like q25's BMP
  // note): exactness of the argmax replay assumes no all-zero vectors (a
  // zero norm makes Spark's x/0 a NaN the kernels skip, while DuckDB's
  // float division by zero yields NULL) — the embeddings fixture has none.

  /** Left-associative explicit dot `a[f+1]*b[f+1] + ... + a[f+len]*b[f+len]`
    * (1-based SQL indexing; `f` offsets into a subspace). */
  private def sqlDot(a: String, b: String, len: Int, from: Int = 0): String =
    (1 to len).map(t => s"$a[${from + t}]*$b[${from + t}]").mkString(" + ")

  /** The kernels' similarity spelling: dot / (SQRT(na) * SQRT(nb)). */
  private def sqlCosine(a: String, b: String, len: Int, from: Int = 0): String =
    s"(${sqlDot(a, b, len, from)}) / (SQRT(${sqlDot(a, a, len, from)}) * SQRT(${sqlDot(b, b, len, from)}))"

  /** Shared CTE prefix: embeddings cast to double lists (exact), plus the
    * √n stride and the stride-sampled centroid table q48/q114 assign to. */
  private val sqlEmb =
    "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"
  private val sqlCentroids =
    "st AS (SELECT GREATEST(2, CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS stride FROM e), " +
      "c AS (SELECT vec_id AS cent_id, v AS cv FROM e, st WHERE vec_id % stride = 0)"

  /** Argmax-cosine assignment (BestCentroid replay): strict `>` over a
    * cent_id-sorted table ≡ rank by (sim DESC, cent_id). */
  private val sqlAssign =
    s"sim AS (SELECT e.vec_id AS vid, c.cent_id, ${sqlCosine("e.v", "c.cv", 64)} AS sim FROM e CROSS JOIN c), " +
      "asg AS (SELECT vid, cent_id AS cluster FROM (SELECT vid, cent_id, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY sim DESC, cent_id) AS rk FROM sim) r WHERE rk = 1)"

  /** q39: 8-bit random-hyperplane signature histogram — the plane matrix
    * (a pure function of (table, bit, dim), [[Similarity.hyperplanes]])
    * interpolates as 512 double literals; bit b is the SIGN of a
    * left-associative 64-term dot, replayed term-for-term. */
  private def lshBucketsOracle: String = {
    val bits = Similarity.hyperplanes(nBits = 8, table = 0, dim = 64).zipWithIndex.map {
      case (p, b) =>
        val dot = p.zipWithIndex.map { case (c, i) => s"v[${i + 1}]*($c)" }.mkString(" + ")
        s"(CASE WHEN ($dot) > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    s"WITH $sqlEmb " +
      s"SELECT CAST($bits AS BIGINT) AS lsh_bucket, COUNT(*) AS n FROM e GROUP BY 1 ORDER BY 1"
  }

  /** q48: IVF inverted-list histogram — √n-stride centroids re-derived by
    * the oracle itself (stride = GREATEST(2, ROUND(SQRT(n))) replays
    * Similarity.sqrtStride's half-up rounding), assignment replayed as the
    * exact argmax-cosine. */
  private def ivfClustersOracle: String =
    s"WITH $sqlEmb, $sqlCentroids, $sqlAssign " +
      "SELECT CAST(cluster AS BIGINT) AS cluster, COUNT(*) AS n FROM asg GROUP BY 1 ORDER BY 1"

  /** Subspace-m (a SQL column, 0-based) 8-term dot over 64-dim lists. */
  private def sqlSubDot(a: String, b: String): String =
    (1 to 8).map(t => s"$a[m*8+$t]*$b[m*8+$t]").mkString(" + ")

  /** Shared PQ pipeline CTEs (q113/q114): the 20-query set, the k=16
    * lowest-id codebook, per-subspace codes (BestCentroid replay on 8-dim
    * slices), the flat ADC lookup tables (lut = dot(q_m, cb_m[j]),
    * nlut = |cb_m[j]|²), query norms, and the exact ROUND(sim,4) top-10
    * truth. Codes of -1 (all-NaN subspace, impossible without zero
    * subvectors — none in the fixture) would drop from the lut join where
    * Spark's adcFold contributes 0; the block comment above records the
    * assumption. */
  private val sqlPqCore: String =
    "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 20), " +
      "cbt AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cent_id, v AS cbv FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16) tb0), " +
      "ms AS (SELECT unnest(range(0, 8)) AS m), " +
      s"ss AS (SELECT e.vec_id AS scid, m, cent_id, (${sqlSubDot("e.v", "cbv")}) / (SQRT(${sqlSubDot("e.v", "e.v")}) * SQRT(${sqlSubDot("cbv", "cbv")})) AS ssim FROM e CROSS JOIN cbt CROSS JOIN ms), " +
      "codes AS (SELECT scid, m, cent_id AS code FROM (SELECT scid, m, cent_id, ROW_NUMBER() OVER (PARTITION BY scid, m ORDER BY ssim DESC, cent_id) AS rk FROM ss) r WHERE rk = 1), " +
      s"lut AS (SELECT qid, m, cent_id AS code, (${sqlSubDot("qv", "cbv")}) AS lv, (${sqlSubDot("cbv", "cbv")}) AS nv FROM q CROSS JOIN cbt CROSS JOIN ms), " +
      s"qn AS (SELECT qid, SQRT(${sqlDot("qv", "qv", 64)}) AS qn FROM q)"
  private val sqlPq: String = sqlPqCore + ", " +
      s"tr AS (SELECT qid, cid FROM (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY tsim DESC, cid) AS rk FROM (SELECT q.qid, e.vec_id AS cid, ROUND(${sqlCosine("qv", "v", 64)}, 4) AS tsim FROM q CROSS JOIN e WHERE qid <> vec_id) s) r WHERE rk <= 10), " +
      "d AS (SELECT COUNT(*) AS denom FROM tr)"

  /** ADC fold + rank: sum lut/nlut entries over subspaces in ASCENDING m
    * (list(... ORDER BY m) then a 0.0-seeded left fold — the adcFold
    * grouping order), sim = lsum/(qn·√nsum) with the NaN→-2 sentinel,
    * top-10 by (sim DESC, cid). `parts` must provide (qid, cid, m, lv, nv). */
  private val sqlAdcScore: String =
    "folds AS (SELECT qid, cid, list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(lv ORDER BY m)), (a, b) -> a + b) AS lsum, list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(nv ORDER BY m)), (a, b) -> a + b) AS nsum FROM parts GROUP BY qid, cid), " +
      "scored AS (SELECT f.qid, f.cid, CASE WHEN isnan(f.lsum / (qn.qn * SQRT(f.nsum))) THEN -2.0 ELSE f.lsum / (qn.qn * SQRT(f.nsum)) END AS sim FROM folds f JOIN qn USING (qid))"
  private val sqlAdcRank: String = sqlAdcScore + ", " +
      "approx AS (SELECT qid, cid FROM (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk FROM scored) r WHERE rk <= 10), " +
      "h AS (SELECT COUNT(*) AS hits FROM tr JOIN approx USING (qid, cid))"

  /** q113: the full PQ-ADC recall pipeline re-derived in DuckDB — codes,
    * LUT folds, approximate ranking, exact truth, and the recall/compression
    * accounting, every double bit-identical to the engine's. */
  private def pqRecallOracle: String =
    s"WITH $sqlEmb, $sqlPq, " +
      "parts AS (SELECT l.qid, c.scid AS cid, l.m, l.lv, l.nv FROM codes c JOIN lut l ON l.m = c.m AND l.code = c.code WHERE l.qid <> c.scid), " +
      s"$sqlAdcRank " +
      "SELECT 'pq_m8_k16_adc' AS method, ROUND(CAST(hits AS DOUBLE) / denom, 4) AS recall, CAST(hits AS BIGINT) AS hits, CAST(denom AS BIGINT) AS denom, CAST(4 AS BIGINT) AS bytes_per_vec, CAST(64 AS BIGINT) AS compression_x, CAST(1000 AS BIGINT) AS floor_bp, (hits * 10000 >= denom * 1000) AS floor_ok FROM h, d"

  /** q114: IVF-PQ composed — stride centroids + argmax assignment (the q48
    * replay), nprobe=4 probes ranked by full-dim cosine, ADC scoring
    * restricted to probed clusters, plus the scanned/full accounting. */
  private def ivfpqRecallOracle: String =
    s"WITH $sqlEmb, $sqlCentroids, $sqlAssign, $sqlPq, " +
      s"pr AS (SELECT qid, cluster FROM (SELECT qid, cent_id AS cluster, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY csim DESC, cent_id) AS rk FROM (SELECT q.qid, c.cent_id, ${sqlCosine("qv", "cv", 64)} AS csim FROM q CROSS JOIN c) s) r WHERE rk <= 4), " +
      "parts AS (SELECT l.qid, cd.scid AS cid, l.m, l.lv, l.nv FROM codes cd JOIN asg ON asg.vid = cd.scid JOIN pr ON pr.cluster = asg.cluster JOIN lut l ON l.qid = pr.qid AND l.m = cd.m AND l.code = cd.code WHERE l.qid <> cd.scid), " +
      s"$sqlAdcRank, " +
      "sc AS (SELECT COUNT(*) AS scanned FROM scored), " +
      "nn AS (SELECT (SELECT COUNT(*) FROM q) AS n_q, (SELECT COUNT(*) FROM e) AS n_corpus) " +
      "SELECT 'ivfpq_m8_k16_nprobe4' AS method, ROUND(CAST(hits AS DOUBLE) / denom, 4) AS recall, CAST(hits AS BIGINT) AS hits, CAST(denom AS BIGINT) AS denom, CAST(scanned AS BIGINT) AS scanned_pairs, CAST(n_q * (n_corpus - 1) AS BIGINT) AS full_scan_pairs, CAST(1000 AS BIGINT) AS floor_bp, (hits * 10000 >= denom * 1000) AS floor_ok, (scanned < n_q * (n_corpus - 1)) AS prune_ok FROM h, d, sc, nn"

  /** q153: the q114 index verbatim, then the refine stage — ADC top-R
    * shortlist per query, exact ROUND(cos,4) rerank of ONLY those rows
    * (`tr`'s spelling, so rerank and truth share the tie contract), top-10
    * by (rsim DESC, cid). `scored`/`tr` are materialized: each feeds two+
    * downstream CTEs and DuckDB would otherwise inline-recompute them
    * (the q87 oracle's measured 2.4× lesson). */
  private def ivfpqRerankOracle: String = materializeCtes(
    s"WITH $sqlEmb, $sqlCentroids, $sqlAssign, $sqlPq, " +
      s"pr AS (SELECT qid, cluster FROM (SELECT qid, cent_id AS cluster, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY csim DESC, cent_id) AS rk FROM (SELECT q.qid, c.cent_id, ${sqlCosine("qv", "cv", 64)} AS csim FROM q CROSS JOIN c) s) r WHERE rk <= 4), " +
      "parts AS (SELECT l.qid, cd.scid AS cid, l.m, l.lv, l.nv FROM codes cd JOIN asg ON asg.vid = cd.scid JOIN pr ON pr.cluster = asg.cluster JOIN lut l ON l.qid = pr.qid AND l.m = cd.m AND l.code = cd.code WHERE l.qid <> cd.scid), " +
      s"$sqlAdcRank, " +
      s"short AS (SELECT qid, cid FROM (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk FROM scored) r WHERE rk <= ${graft.operators.Similarity.RerankR}), " +
      s"rr AS (SELECT sh.qid, sh.cid, ROUND(${sqlCosine("q.qv", "e.v", 64)}, 4) AS rsim FROM short sh JOIN q ON q.qid = sh.qid JOIN e ON e.vec_id = sh.cid), " +
      "rtop AS (SELECT qid, cid FROM (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rsim DESC, cid) AS rk FROM rr) r WHERE rk <= 10), " +
      "rh AS (SELECT COUNT(*) AS rhits FROM tr JOIN rtop USING (qid, cid)), " +
      "rp AS (SELECT COUNT(*) AS reranked FROM rr), " +
      "sc AS (SELECT COUNT(*) AS scanned FROM scored), " +
      "nn AS (SELECT (SELECT COUNT(*) FROM q) AS n_q, (SELECT COUNT(*) FROM e) AS n_corpus) " +
      s"SELECT 'ivfpq_rerank_m8_k16_nprobe4_r${graft.operators.Similarity.RerankR}' AS method, ROUND(CAST(rhits AS DOUBLE) / denom, 4) AS recall, CAST(rhits AS BIGINT) AS hits, CAST(denom AS BIGINT) AS denom, ROUND(CAST(hits AS DOUBLE) / denom, 4) AS adc_recall, CAST(hits AS BIGINT) AS adc_hits, CAST(scanned AS BIGINT) AS scanned_pairs, CAST(reranked AS BIGINT) AS reranked_pairs, CAST(1000 AS BIGINT) AS floor_bp, (rhits * 10000 >= denom * 1000) AS floor_ok, (rhits >= hits) AS rerank_ge_adc, (scanned < n_q * (n_corpus - 1)) AS prune_ok FROM rh, h, d, rp, sc, nn",
    Seq("scored", "tr"))

  /** q157: the saved-index serve lane's oracle — the q153 index, shortlist
    * and exact rerank re-derived in DuckDB (identical math to
    * [[ivfpqRerankOracle]] minus the truth/recall accounting the serve
    * lane doesn't emit), output = the reranked top-10 rows themselves.
    * The Spark lane computes these FROM THE PERSISTED ARTIFACT — parquet
    * round-trips every double bit-exactly, so saved-index search hashing
    * equal to this inline replay IS the save/load identity proof. */
  private def annIndexServeOracle: String = annIndexServeOracleWhere("")

  /** [[annIndexServeOracle]] with an extra candidate-relation predicate —
    * q165 removes the deleted ids (`AND cd.scid % 10 <> 7`), q166 pushes
    * the metadata filter; the quantizer/query CTEs stay untouched, which
    * is precisely the "same frozen quantizers" contract both lanes gate.
    * `embWhere` (q176) instead filters the CORPUS relation itself, which
    * re-derives EVERYTHING — stride, centroids, codebook, codes, queries
    * — over the filtered set: the retrained-quantizer contract, the one
    * serve lane where the quantizers are deliberately NOT frozen. */
  private def annIndexServeOracleWhere(candFilter: String,
                                       embWhere: String = ""): String = materializeCtes(
    s"WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings$embWhere), " +
      s"$sqlCentroids, $sqlAssign, $sqlPqCore, " +
      s"pr AS (SELECT qid, cluster FROM (SELECT qid, cent_id AS cluster, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY csim DESC, cent_id) AS rk FROM (SELECT q.qid, c.cent_id, ${sqlCosine("qv", "cv", 64)} AS csim FROM q CROSS JOIN c) s) r WHERE rk <= 4), " +
      s"parts AS (SELECT l.qid, cd.scid AS cid, l.m, l.lv, l.nv FROM codes cd JOIN asg ON asg.vid = cd.scid JOIN pr ON pr.cluster = asg.cluster JOIN lut l ON l.qid = pr.qid AND l.m = cd.m AND l.code = cd.code WHERE l.qid <> cd.scid$candFilter), " +
      s"$sqlAdcScore, " +
      s"short AS (SELECT qid, cid FROM (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk FROM scored) r WHERE rk <= ${graft.operators.Similarity.RerankR}), " +
      s"rr AS (SELECT sh.qid, sh.cid, ROUND(${sqlCosine("q.qv", "e.v", 64)}, 4) AS rsim FROM short sh JOIN q ON q.qid = sh.qid JOIN e ON e.vec_id = sh.cid) " +
      "SELECT qid, cid, CAST(rk AS BIGINT) AS rnk, rsim FROM (SELECT qid, cid, rsim, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rsim DESC, cid) AS rk FROM rr) r WHERE rk <= 10 ORDER BY qid, rnk",
    Seq("scored"))

  /** q171: the q166 filtered-serve oracle with the ADAPTIVE probe prefix —
    * per-cluster allowed counts, the full centroid ranking, one cumulative
    * window, probes kept while the count before them is under the RerankR
    * floor (never fewer than the static 4); n_probes joined into the
    * projection. Quantizer/query CTEs untouched — the frozen-quantizer
    * contract all serve lanes share. */
  private def annAdaptiveServeOracle: String = materializeCtes(
    s"WITH $sqlEmb, $sqlCentroids, $sqlAssign, $sqlPqCore, " +
      "alw AS (SELECT vec_id FROM embeddings WHERE label % 10 = 7), " +
      "acnt AS (SELECT asg.cluster, CAST(COUNT(*) AS BIGINT) AS ac FROM asg JOIN alw ON alw.vec_id = asg.vid GROUP BY asg.cluster), " +
      s"prr AS (SELECT qid, cent_id AS cluster, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY csim DESC, cent_id) AS rk FROM (SELECT q.qid, c.cent_id, ${sqlCosine("qv", "cv", 64)} AS csim FROM q CROSS JOIN c) s), " +
      "prc AS (SELECT prr.qid, prr.cluster, prr.rk, COALESCE(acnt.ac, 0) AS ac FROM prr LEFT JOIN acnt ON acnt.cluster = prr.cluster), " +
      "prw AS (SELECT qid, cluster, rk, ac, SUM(ac) OVER (PARTITION BY qid ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM prc), " +
      s"pr AS (SELECT qid, cluster FROM prw WHERE rk <= 4 OR cum - ac < ${graft.operators.Similarity.RerankR}), " +
      "np AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_probes FROM pr GROUP BY qid), " +
      s"parts AS (SELECT l.qid, cd.scid AS cid, l.m, l.lv, l.nv FROM codes cd JOIN asg ON asg.vid = cd.scid JOIN pr ON pr.cluster = asg.cluster JOIN lut l ON l.qid = pr.qid AND l.m = cd.m AND l.code = cd.code WHERE l.qid <> cd.scid AND cd.scid IN (SELECT vec_id FROM alw)), " +
      s"$sqlAdcScore, " +
      s"short AS (SELECT qid, cid FROM (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk FROM scored) r WHERE rk <= ${graft.operators.Similarity.RerankR}), " +
      s"rr AS (SELECT sh.qid, sh.cid, ROUND(${sqlCosine("q.qv", "e.v", 64)}, 4) AS rsim FROM short sh JOIN q ON q.qid = sh.qid JOIN e ON e.vec_id = sh.cid) " +
      "SELECT r.qid, r.cid, CAST(r.rk AS BIGINT) AS rnk, r.rsim, np.n_probes FROM (SELECT qid, cid, rsim, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rsim DESC, cid) AS rk FROM rr) r JOIN np ON np.qid = r.qid WHERE r.rk <= 10 ORDER BY r.qid, rnk",
    Seq("scored", "pr"))

  /** q154: hybrid RRF replayed end to end — distinct-token overlap ranks
    * (the q33 tokenization spelling), exact ROUND(cos,4) vector ranks,
    * full-outer rank fusion with CAST(1.0 AS DOUBLE)/(k+rank) terms (a
    * two-term IEEE sum both engines compute identically; DuckDB's bare
    * 1.0 literal is DECIMAL, hence the CAST), top-10 by unrounded score
    * with cid ties. */
  private def hybridRrfOracle: String = materializeCtes(
    s"WITH $sqlEmb, " +
      "dd AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND length(text) > 0), " +
      "corp AS (SELECT dd.doc_id AS cid, dd.text, e.v FROM dd JOIN e ON e.vec_id = dd.doc_id), " +
      "tw AS (SELECT cid, unnest(string_split_regex(trim(text), '\\s+')) AS w FROM corp), " +
      "tok AS (SELECT DISTINCT cid, w FROM tw), " +
      "qt AS (SELECT cid AS qid, w FROM tok WHERE cid < 8), " +
      s"kw AS (SELECT qid, cid, kw_rank FROM (SELECT qt.qid, t.cid, ROW_NUMBER() OVER (PARTITION BY qt.qid ORDER BY COUNT(*) DESC, t.cid) AS kw_rank FROM tok t JOIN qt ON t.w = qt.w AND qt.qid <> t.cid GROUP BY qt.qid, t.cid) r WHERE kw_rank <= ${graft.operators.Similarity.HybridChan}), " +
      "qv AS (SELECT cid AS qid, v AS qv FROM corp WHERE cid < 8), " +
      s"vec AS (SELECT qid, cid, vec_rank FROM (SELECT qv.qid, c.cid, ROW_NUMBER() OVER (PARTITION BY qv.qid ORDER BY ROUND(${sqlCosine("qv.qv", "c.v", 64)}, 4) DESC, c.cid) AS vec_rank FROM qv CROSS JOIN corp c WHERE qv.qid <> c.cid) r WHERE vec_rank <= ${graft.operators.Similarity.HybridChan}), " +
      s"f AS (SELECT COALESCE(kw.qid, vec.qid) AS qid, COALESCE(kw.cid, vec.cid) AS cid, kw.kw_rank, vec.vec_rank, COALESCE(CAST(1.0 AS DOUBLE) / (${graft.operators.Similarity.RrfK} + kw.kw_rank), CAST(0.0 AS DOUBLE)) + COALESCE(CAST(1.0 AS DOUBLE) / (${graft.operators.Similarity.RrfK} + vec.vec_rank), CAST(0.0 AS DOUBLE)) AS score FROM kw FULL OUTER JOIN vec ON kw.qid = vec.qid AND kw.cid = vec.cid) " +
      "SELECT qid, cid, rrf_rank, ROUND(score, 6) AS score, COALESCE(kw_rank, -1) AS kw_rank, COALESCE(vec_rank, -1) AS vec_rank FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rrf_rank FROM f) z WHERE rrf_rank <= 10 ORDER BY qid, rrf_rank",
    Seq("corp", "tok"))

  /** q155: the at-scale hybrid — BM25 keyword channel + the q153
    * IVF-PQ+rerank vector channel, fused by RRF. The BM25 half is
    * ALL-INTEGER (the q89 IDF surrogate extended to the tf-saturation
    * term — see Similarity.bm25Ranks), so its ranks replay with no float
    * freedom; the vector half re-derives the q153 index/shortlist/rerank
    * verbatim with the query set swapped to the 8 corpus docs; the fusion
    * is the q154 RRF spelling. Constants (k1/b milli-units, RRF k,
    * channel depth, rerank R) interpolate from the Scala values. */
  private def hybridBm25AnnOracle: String = {
    val k = graft.operators.Similarity.RrfK
    val chan = graft.operators.Similarity.HybridChan
    val r = graft.operators.Similarity.RerankR
    val k1m = graft.operators.Similarity.Bm25K1m
    val bm = graft.operators.Similarity.Bm25Bm
    materializeCtes(
      s"WITH $sqlEmb, $sqlCentroids, $sqlAssign, " +
        // corpus: embedded, non-empty docs (the q154 corpus contract)
        "dd AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND length(text) > 0), " +
        "corp AS (SELECT dd.doc_id AS cid, dd.text, e.v FROM dd JOIN e ON e.vec_id = dd.doc_id), " +
        // ---- BM25 keyword channel (all-integer) ----
        "tw AS (SELECT cid, len(string_split_regex(trim(text), '\\s+')) AS dl, unnest(string_split_regex(trim(text), '\\s+')) AS w FROM corp), " +
        "qt AS (SELECT DISTINCT cid AS qid, w FROM tw WHERE cid < 8), " +
        "qw AS (SELECT DISTINCT w FROM qt), " +
        "tf AS (SELECT cid, w, COUNT(*) AS tf, MIN(dl) AS dl FROM tw JOIN qw USING (w) GROUP BY cid, w), " +
        "dfs AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w), " +
        "bst AS (SELECT COUNT(*) AS n_docs, (SUM(len(string_split_regex(trim(text), '\\s+'))) * 1000) // COUNT(*) AS avgdl_m FROM corp), " +
        s"con AS (SELECT qt.qid, tf.cid, ((bst.n_docs * 1000) // dfs.df) * ((tf.tf * ${1000 + k1m} * 1000) // (tf.tf * 1000 + ($k1m * ((1000 - $bm) + ($bm * tf.dl * 1000) // bst.avgdl_m)) // 1000)) AS contrib FROM tf JOIN dfs USING (w) JOIN qt USING (w) CROSS JOIN bst WHERE qt.qid <> tf.cid), " +
        "bm25 AS (SELECT qid, cid, SUM(contrib) AS bm25_s FROM con GROUP BY qid, cid), " +
        s"kw AS (SELECT qid, cid, kw_rank FROM (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY bm25_s DESC, cid) AS kw_rank FROM bm25) z WHERE kw_rank <= $chan), " +
        // ---- q153 IVF-PQ + exact-rerank vector channel, queries = corp cid < 8 ----
        "cbt AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cent_id, v AS cbv FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16) tb0), " +
        "ms AS (SELECT unnest(range(0, 8)) AS m), " +
        s"ss AS (SELECT e.vec_id AS scid, m, cent_id, (${sqlSubDot("e.v", "cbv")}) / (SQRT(${sqlSubDot("e.v", "e.v")}) * SQRT(${sqlSubDot("cbv", "cbv")})) AS ssim FROM e CROSS JOIN cbt CROSS JOIN ms), " +
        "codes AS (SELECT scid, m, cent_id AS code FROM (SELECT scid, m, cent_id, ROW_NUMBER() OVER (PARTITION BY scid, m ORDER BY ssim DESC, cent_id) AS rk FROM ss) r WHERE rk = 1), " +
        "q2 AS (SELECT cid AS qid, v AS qv FROM corp WHERE cid < 8), " +
        s"lut AS (SELECT qid, m, cent_id AS code, (${sqlSubDot("qv", "cbv")}) AS lv, (${sqlSubDot("cbv", "cbv")}) AS nv FROM q2 CROSS JOIN cbt CROSS JOIN ms), " +
        s"qn AS (SELECT qid, SQRT(${sqlDot("qv", "qv", 64)}) AS qn FROM q2), " +
        s"pr AS (SELECT qid, cluster FROM (SELECT qid, cent_id AS cluster, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY csim DESC, cent_id) AS rk FROM (SELECT q2.qid, c.cent_id, ${sqlCosine("qv", "cv", 64)} AS csim FROM q2 CROSS JOIN c) s) z WHERE rk <= 4), " +
        "parts AS (SELECT l.qid, cd.scid AS cid, l.m, l.lv, l.nv FROM codes cd JOIN asg ON asg.vid = cd.scid JOIN pr ON pr.cluster = asg.cluster JOIN lut l ON l.qid = pr.qid AND l.m = cd.m AND l.code = cd.code WHERE l.qid <> cd.scid), " +
        "folds AS (SELECT qid, cid, list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(lv ORDER BY m)), (a, b) -> a + b) AS lsum, list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(nv ORDER BY m)), (a, b) -> a + b) AS nsum FROM parts GROUP BY qid, cid), " +
        "scored AS (SELECT f.qid, f.cid, CASE WHEN isnan(f.lsum / (qn.qn * SQRT(f.nsum))) THEN -2.0 ELSE f.lsum / (qn.qn * SQRT(f.nsum)) END AS sim FROM folds f JOIN qn USING (qid)), " +
        s"short AS (SELECT qid, cid FROM (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk FROM scored) z WHERE rk <= $r), " +
        s"rr AS (SELECT sh.qid, sh.cid, ROUND(${sqlCosine("q2.qv", "e.v", 64)}, 4) AS rsim FROM short sh JOIN q2 ON q2.qid = sh.qid JOIN e ON e.vec_id = sh.cid), " +
        s"vec AS (SELECT qid, cid, vec_rank FROM (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rsim DESC, cid) AS vec_rank FROM rr) z WHERE vec_rank <= $chan), " +
        // ---- RRF fusion (the q154 spelling) ----
        s"f AS (SELECT COALESCE(kw.qid, vec.qid) AS qid, COALESCE(kw.cid, vec.cid) AS cid, kw.kw_rank, vec.vec_rank, COALESCE(CAST(1.0 AS DOUBLE) / ($k + kw.kw_rank), CAST(0.0 AS DOUBLE)) + COALESCE(CAST(1.0 AS DOUBLE) / ($k + vec.vec_rank), CAST(0.0 AS DOUBLE)) AS score FROM kw FULL OUTER JOIN vec ON kw.qid = vec.qid AND kw.cid = vec.cid) " +
        "SELECT qid, cid, rrf_rank, ROUND(score, 6) AS score, COALESCE(kw_rank, -1) AS kw_rank, COALESCE(vec_rank, -1) AS vec_rank FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rrf_rank FROM f) z WHERE rrf_rank <= 10 ORDER BY qid, rrf_rank",
      Seq("corp", "tf", "scored"))
  }

  /** Per-table `nBits`-bit LSH bucket over list column `v` — the plane
    * matrix ([[Similarity.hyperplanes]]) interpolated as double literals,
    * each bit the SIGN of a left-associative 64-term dot (the q39
    * technique, parametrized by table for OR-amplified multi-table q87). */
  private def sqlLshBucket(nBits: Int, table: Int): String =
    Similarity.hyperplanes(nBits, table, dim = 64).zipWithIndex.map {
      case (p, b) =>
        val dot = p.zipWithIndex.map { case (c, i) => s"v[${i + 1}]*($c)" }.mkString(" + ")
        s"(CASE WHEN ($dot) > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")

  /** Exact ROUND(cos,4) top-10 truth + the 20-query set — shared by the
    * two ANN-recall oracles. */
  private val sqlAnnTruth: String =
    "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 20), " +
      s"tr AS (SELECT qid, cid FROM (SELECT q.qid, e2.vec_id AS cid, ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY ROUND(${sqlCosine("qv", "e2.v", 64)}, 4) DESC, e2.vec_id) AS rk FROM q CROSS JOIN e e2 WHERE q.qid <> e2.vec_id) s WHERE rk <= 10), " +
      "d AS (SELECT COUNT(*) AS denom FROM tr)"

  /** Mark the named CTEs `AS MATERIALIZED` (DuckDB planner hint; the
    * oracle SQL never runs on Spark, so dialect-specific hints are safe).
    * The two ANN-recall oracles reference their expensive subtrees (truth,
    * refined centroids, signatures) from BOTH recall branches — without
    * the hint DuckDB inlines and recomputes each, doubling time AND
    * allocator pressure (measured 5.8 s → 2.4 s at sf0.01). */
  private def materializeCtes(sql: String, names: Seq[String]): String =
    names.foldLeft(sql) { (s, n) =>
      // anchor at a CTE-clause boundary: a raw substring match on
      // "<name> AS (" can land INSIDE a longer CTE name (`c AS (` inside
      // `rc AS (`) and silently materialize the wrong CTE (r12 ADVICE #2)
      val out = s.replaceFirst(
        "(?<=WITH |, )" + java.util.regex.Pattern.quote(s"$n AS ("),
        java.util.regex.Matcher.quoteReplacement(s"$n AS MATERIALIZED ("))
      require(out != s, s"materializeCtes: CTE '$n' not found at a clause boundary")
      out
    }

  /** The recall-row SELECT shared by both ANN oracles: one UNION ALL arm
    * per (method, hits-CTE, floor) triple, ordered by method. */
  private def sqlRecallRows(arms: Seq[(String, String, Long)]): String =
    arms.map { case (method, hitsCte, floorBp) =>
      s"SELECT '$method' AS method, ROUND(CAST(hits AS DOUBLE) / denom, 4) AS recall, " +
        "CAST(hits AS BIGINT) AS hits, CAST(denom AS BIGINT) AS denom, " +
        s"CAST($floorBp AS BIGINT) AS floor_bp, (hits * 10000 >= denom * $floorBp) AS floor_ok " +
        s"FROM $hitsCte, d"
    }.mkString("SELECT * FROM (", " UNION ALL ", ") u ORDER BY method")

  /** q87: the FULL ANN-recall pipeline re-derived in DuckDB — computed
    * oracle since r12 (r11 verdict #4). The one Lloyd refinement pass is
    * replayable now that [[Similarity.ivfCentroids]] sums each
    * per-(cluster, dim) mean in canonical vec_id order: the oracle folds
    * `list(x ORDER BY vid)` from 0.0 (the exact left-associative adds),
    * divides by the member count, re-assigns the corpus to the refined
    * centroids by the same strict-argmax rule, probes nprobe=4 by
    * UNROUNDED cosine, and reranks candidates by ROUND(sim,4) — every
    * double bit-identical to the engine's. The LSH branch replays 6
    * OR-amplified 5-bit tables with interpolated plane literals. */
  private def annRecallOracle: String = {
    val sigCols = (0 until 6).map(t => s"(${sqlLshBucket(5, t)}) AS b$t").mkString(", ")
    val orCond = (0 until 6).map(t => s"sq.b$t = s.b$t").mkString(" OR ")
    materializeCtes(
    s"WITH $sqlEmb, $sqlCentroids, $sqlAssign, $sqlAnnTruth, " +
      // one Lloyd pass over the seed assignment: canonical-order means
      "px AS (SELECT a.cluster, ms.i, e2.v[ms.i + 1] AS x, a.vid FROM asg a JOIN e e2 ON e2.vec_id = a.vid CROSS JOIN (SELECT unnest(range(0, 64)) AS i) ms), " +
      "rc AS (SELECT cluster, i, list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(x ORDER BY vid)), (acc, t) -> acc + t) / COUNT(*) AS m FROM px GROUP BY cluster, i), " +
      "rcent AS (SELECT cluster AS cent_id, list(m ORDER BY i) AS cv FROM rc GROUP BY cluster), " +
      // corpus re-assigned to the REFINED centroids (BestCentroid replay)
      s"sim1 AS (SELECT e.vec_id AS vid, r.cent_id, ${sqlCosine("e.v", "r.cv", 64)} AS sim FROM e CROSS JOIN rcent r), " +
      "asg1 AS (SELECT vid, cent_id AS cluster FROM (SELECT vid, cent_id, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY sim DESC, cent_id) AS rk FROM sim1) r WHERE rk = 1), " +
      // nprobe=4 probes ranked by UNROUNDED cosine vs refined centroids
      s"pr AS (SELECT qid, cluster FROM (SELECT q.qid, r.cent_id AS cluster, ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY ${sqlCosine("qv", "r.cv", 64)} DESC, r.cent_id) AS rk FROM q CROSS JOIN rcent r) z WHERE rk <= 4), " +
      s"ivfa AS (SELECT qid, cid FROM (SELECT pr.qid, a.vid AS cid, ROW_NUMBER() OVER (PARTITION BY pr.qid ORDER BY ROUND(${sqlCosine("q.qv", "e2.v", 64)}, 4) DESC, a.vid) AS rk FROM pr JOIN asg1 a ON a.cluster = pr.cluster JOIN q ON q.qid = pr.qid JOIN e e2 ON e2.vec_id = a.vid WHERE pr.qid <> a.vid) u2 WHERE rk <= 10), " +
      // 6 OR-amplified 5-bit LSH tables: per-vector signatures once, any-
      // table collision makes a candidate, exact ROUND(sim,4) rerank
      s"sigs AS (SELECT vec_id, v, $sigCols FROM e), " +
      "sq AS (SELECT * FROM sigs WHERE vec_id < 20), " +
      s"lc AS (SELECT DISTINCT sq.vec_id AS qid, s.vec_id AS cid FROM sq JOIN sigs s ON sq.vec_id <> s.vec_id AND ($orCond)), " +
      s"lsha AS (SELECT qid, cid FROM (SELECT lc.qid, lc.cid, ROW_NUMBER() OVER (PARTITION BY lc.qid ORDER BY ROUND(${sqlCosine("q.qv", "e2.v", 64)}, 4) DESC, lc.cid) AS rk FROM lc JOIN q ON q.qid = lc.qid JOIN e e2 ON e2.vec_id = lc.cid) w WHERE rk <= 10), " +
      "hi AS (SELECT COUNT(*) AS hits FROM tr JOIN ivfa USING (qid, cid)), " +
      "hl AS (SELECT COUNT(*) AS hits FROM tr JOIN lsha USING (qid, cid)) " +
      sqlRecallRows(Seq(
        ("ivf_sqrtn_nprobe4_r1", "hi", 4000L),
        ("lsh_5bit_x6", "hl", 2700L))),
      Seq("e", "c", "asg", "q", "tr", "rcent", "asg1", "sigs"))
  }

  /** s87: the SQL-text lane's LABELED divergence (IVF unrefined, LSH 2
    * tables — SqlFrontDoor's scaladoc) replayed as a computed oracle: with
    * no Lloyd pass the whole pipeline is stride seeds + strict argmax +
    * ROUND(sim,4) reranks, nothing engine-internal left. */
  private[graft] def s87AnnRecallOracle: String = {
    val sigCols = (0 until 2).map(t => s"(${sqlLshBucket(5, t)}) AS b$t").mkString(", ")
    val orCond = (0 until 2).map(t => s"sq.b$t = s.b$t").mkString(" OR ")
    materializeCtes(
    s"WITH $sqlEmb, $sqlCentroids, $sqlAssign, $sqlAnnTruth, " +
      s"pr AS (SELECT qid, cluster FROM (SELECT q.qid, c.cent_id AS cluster, ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY ${sqlCosine("qv", "c.cv", 64)} DESC, c.cent_id) AS rk FROM q CROSS JOIN c) z WHERE rk <= 4), " +
      s"ivfa AS (SELECT qid, cid FROM (SELECT pr.qid, a.vid AS cid, ROW_NUMBER() OVER (PARTITION BY pr.qid ORDER BY ROUND(${sqlCosine("q.qv", "e2.v", 64)}, 4) DESC, a.vid) AS rk FROM pr JOIN asg a ON a.cluster = pr.cluster JOIN q ON q.qid = pr.qid JOIN e e2 ON e2.vec_id = a.vid WHERE pr.qid <> a.vid) u2 WHERE rk <= 10), " +
      s"sigs AS (SELECT vec_id, v, $sigCols FROM e), " +
      "sq AS (SELECT * FROM sigs WHERE vec_id < 20), " +
      s"lc AS (SELECT DISTINCT sq.vec_id AS qid, s.vec_id AS cid FROM sq JOIN sigs s ON sq.vec_id <> s.vec_id AND ($orCond)), " +
      s"lsha AS (SELECT qid, cid FROM (SELECT lc.qid, lc.cid, ROW_NUMBER() OVER (PARTITION BY lc.qid ORDER BY ROUND(${sqlCosine("q.qv", "e2.v", 64)}, 4) DESC, lc.cid) AS rk FROM lc JOIN q ON q.qid = lc.qid JOIN e e2 ON e2.vec_id = lc.cid) w WHERE rk <= 10), " +
      "hi AS (SELECT COUNT(*) AS hits FROM tr JOIN ivfa USING (qid, cid)), " +
      "hl AS (SELECT COUNT(*) AS hits FROM tr JOIN lsha USING (qid, cid)) " +
      sqlRecallRows(Seq(
        ("ivf_sqrtn_nprobe4_r0", "hi", 3700L),
        ("lsh_5bit_x2", "hl", 700L))),
      Seq("e", "c", "asg", "q", "tr", "sigs"))
  }

  private def computedOracleSql: Map[String, String] = Map(
    "q87_ann_recall" -> annRecallOracle,
    "q01_scan_filter_sort" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber",
    // Money math runs in DECIMAL on BOTH sides (then CAST back to DOUBLE):
    // double ROUND/SUM diverge cross-engine on boundary cents and
    // accumulation order — CORRECTNESS_r01 q02/q54 hash-failed on this.
    "q02_project_case" ->
      "SELECT o_orderkey, CASE WHEN o_totalprice > 200000 THEN 'big' WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS bucket, CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)) * 0.9, 2) AS DOUBLE) AS discounted FROM orders WHERE o_orderstatus <> 'F' ORDER BY o_orderkey",
    "q03_join_multiway" ->
      "SELECT n_name, CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name",
    "q04_join_left_agg" ->
      "SELECT c.c_custkey, COUNT(o.o_orderkey) AS n FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey GROUP BY c.c_custkey ORDER BY c.c_custkey",
    "q05_join_semi" ->
      "SELECT c_custkey FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000) ORDER BY c_custkey",
    "q06_join_anti" ->
      "SELECT c_custkey FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000) ORDER BY c_custkey",
    "q07_join_theta" ->
      "SELECT p_partkey, s_suppkey FROM part JOIN supplier ON p_retailprice < s_acctbal WHERE p_partkey <= 20 AND s_suppkey <= 20 ORDER BY p_partkey, s_suppkey",
    "q08_agg_tpch_q1" ->
      "SELECT l_returnflag, l_linestatus, CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty, CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base, CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_disc, ROUND(AVG(l_quantity), 4) AS avg_qty, COUNT(*) AS cnt FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "q09_count_distinct" ->
      "SELECT COUNT(DISTINCT o_custkey) AS n FROM orders",
    "q10_rollup" ->
      "SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus) ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST",
    "q11_cube" ->
      "SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus) ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST",
    "q12_grouping_sets" ->
      "SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n FROM orders GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus)) ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST",
    "q13_window_rank" ->
      "SELECT o_custkey, o_orderkey, rnk FROM (SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk FROM orders) t WHERE rnk <= 2 ORDER BY o_custkey, rnk",
    "q14_window_lag" ->
      "SELECT o_orderkey, ROUND(o_totalprice - LAG(o_totalprice, 1, 0.0) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta FROM orders ORDER BY o_orderkey",
    "q15_window_frame" ->
      "SELECT o_orderkey, ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS run3 FROM orders ORDER BY o_orderkey",
    "q16_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q17_intersect" ->
      "SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey AS k FROM supplier ORDER BY k",
    "q18_except" ->
      "SELECT n_regionkey AS k FROM nation EXCEPT SELECT r_regionkey AS k FROM region WHERE r_name LIKE 'A%' ORDER BY k",
    "q19_string_funcs" ->
      "SELECT p_partkey, UPPER(SUBSTR(p_name, 1, 5)) AS u, CAST(LENGTH(p_name) AS BIGINT) AS l, CONCAT(p_brand, '#', p_type) AS b FROM part WHERE p_name LIKE '%ol%' ORDER BY p_partkey",
    "q20_date_funcs" ->
      "SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y, COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY 1",
    "q21_math_funcs" ->
      "SELECT l_orderkey, ROUND(ABS(l_extendedprice - FLOOR(l_extendedprice)), 2) AS frac, CAST(CEIL(l_quantity) AS BIGINT) AS cq FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey",
    "q22_array_groupby" ->
      "SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label ORDER BY label",
    "q23_json_extract" ->
      "SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS s FROM events GROUP BY event_type ORDER BY event_type",
    "q24_event_tumbling" ->
      "SELECT (epoch_ns(ts) - (epoch_ns(ts) % 3600000000000)) AS hour_bucket, event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sv FROM events GROUP BY 1, 2 ORDER BY 1, 2",
    "q25_hash_bucket" -> // Java String#hashCode replayed EXACTLY in DuckDB
      // (r10: the lane moved off Murmur3 to the reference's partitioner
      // hash — see q25HashBucket scaladoc): fold h = (31·h + code) mod 2³²
      // over the code points, convert to signed 32-bit, then the
      // abs-AFTER-mod partition rule (AvroProducer.java:82). Verified
      // char-for-char vs JVM String#hashCode (scalacheck in FunctionsSpec
      // + this cross-engine gate).
      // BMP-ONLY assumption (r10 ADVICE): DuckDB's unicode() yields CODE
      // POINTS while Java folds UTF-16 CODE UNITS — identical for BMP
      // text (all TPC-H c_name is ASCII) but divergent on supplementary
      // characters, where Java folds the surrogate pair as two units. If
      // testdata ever grows astral-plane names, spell the fold over
      // surrogate pairs here instead of blaming the engine.
      "SELECT c_custkey, CAST(abs(jh % 8) AS BIGINT) AS bucket FROM (SELECT c_custkey, CASE WHEN h >= 2147483648 THEN h - 4294967296 ELSE h END AS jh FROM (SELECT c_custkey, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(c_name) + 1), i -> CAST(unicode(substr(c_name, CAST(i AS INT), 1)) AS BIGINT))), (x, y) -> (x * 31 + y) % 4294967296) AS h FROM customer) t) u ORDER BY c_custkey",
    "q26_dedup_exact" ->
      "SELECT COUNT(*) AS n FROM (SELECT DISTINCT user_id, event_type FROM events) t",
    "q27_text_stats" ->
      "SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS c FROM documents GROUP BY lang ORDER BY lang",
    "q28_dedup_md5" ->
      "SELECT source, COUNT(DISTINCT md5(text)) AS n_unique, COUNT(*) AS n_total FROM documents GROUP BY source ORDER BY source",
    "q29_token_count" ->
      "SELECT lang, CAST(SUM(ws) AS BIGINT) AS total_ws, CAST(SUM(bpe) AS BIGINT) AS total_bpe, CAST(MAX(ws) AS BIGINT) AS max_ws, CAST(MIN(ws) AS BIGINT) AS min_ws FROM (SELECT lang, len(string_split_regex(trim(text), '\\s+')) AS ws, len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe FROM documents) t GROUP BY lang ORDER BY lang",
    "q30_text_quality" ->
      "SELECT lang, ROUND(AVG(ar), 4) AS alpha_ratio, ROUND(AVG(sr), 4) AS stopword_ratio, ROUND(AVG(len), 2) AS avg_len FROM (SELECT lang, CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / LENGTH(text) AS ar, CAST(len(regexp_extract_all(text, '\\b(the|a|of|and|to)\\b')) AS DOUBLE) / len(string_split_regex(trim(text), '\\s+')) AS sr, CAST(LENGTH(text) AS BIGINT) AS len FROM documents) t GROUP BY lang ORDER BY lang",
    "q31_lang_id" ->
      "SELECT CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en' WHEN s_de >= s_es AND s_de >= s_fr THEN 'de' WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pred_lang, COUNT(*) AS n FROM (SELECT len(regexp_extract_all(text, '\\b(the|of|and|to|in)\\b')) AS s_en, len(regexp_extract_all(text, '\\b(der|die|das|und|ist)\\b')) AS s_de, len(regexp_extract_all(text, '\\b(el|la|los|que|a)\\b')) AS s_es, len(regexp_extract_all(text, '\\b(le|les|et|des|du)\\b')) AS s_fr FROM documents) t GROUP BY 1 ORDER BY 1",
    "q32_fingerprint_md5" ->
      "SELECT doc_id, md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp FROM documents ORDER BY doc_id",
    "q33_jaccard_pairs" ->
      "WITH w AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word FROM documents WHERE doc_id < 40), d AS (SELECT DISTINCT doc_id, word FROM w), s AS (SELECT doc_id, COUNT(*) AS sz FROM d GROUP BY doc_id), c AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter FROM d a JOIN d b ON a.word = b.word AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT id1, id2, ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS jaccard FROM c JOIN s sa ON sa.doc_id = id1 JOIN s sb ON sb.doc_id = id2 ORDER BY id1, id2",
    // q39/q48/q49/q87/q113/q114/q129: engine-internal float argmax / float
    // reductions / sketches with no DuckDB twin (FIXTURES §C) — gated
    // through r12 by golden-VALUES snapshots of their (deterministic,
    // bit-stable-across-core-counts) outputs. The golden set is EMPTY
    // since r13: everything below is a computed oracle.
    // r11: q34/q35/q40/q50 LEFT this golden set — their operators moved to
    // the replayable universal-hash family (Dedup.scala scaladoc), so they
    // get INDEPENDENT computed oracles below: DuckDB re-derives minhash
    // bands / simhash parities / winnowing minima / the full LSH→Jaccard
    // near-dup pipeline from raw text with shared tabulated constants,
    // replaying the engine's integer math end-to-end.
    "q34_minhash_bands" -> minhashBandsOracle,
    "q35_simhash" -> simhashOracle,
    "q40_winnow_fingerprint" -> winnowOracle,
    "q50_neardup_confirmed" -> neardupConfirmedOracle,
    // r11 (2nd half): the float ANN lanes join them — the kernels' index-
    // order double folds replay exactly in DuckDB (see the sqlDot block
    // comment), so sign/argmax decisions carry no engine freedom either.
    "q39_lsh_buckets" -> lshBucketsOracle,
    "q48_ivf_clusters" -> ivfClustersOracle,
    "q113_pq_recall" -> pqRecallOracle,
    "q114_ivfpq_recall" -> ivfpqRecallOracle,
    "q153_ivfpq_rerank" -> ivfpqRerankOracle,
    "q157_ann_index_serve" -> annIndexServeOracle,
    // merged-shard search must equal the monolithic build exactly, so it
    // gates on the SAME inline replay
    "q158_ann_index_merge" -> annIndexServeOracle,
    // append ≡ rebuild under frozen quantizers: the appended index holds
    // exactly the monolithic build's rows, same oracle again
    "q159_ann_index_append" -> annIndexServeOracle,
    // compaction is a pure re-layout: same rows, same oracle
    "q160_ann_index_compact" -> annIndexServeOracle,
    // delete ≡ rebuild-without-rows under the SAME full-corpus quantizers:
    // the q157 replay with the tombstoned ids out of the candidate relation
    "q165_ann_index_delete" -> annIndexServeOracleWhere(" AND cd.scid % 10 <> 7"),
    // filtered search: the metadata predicate pushed into the candidates
    "q166_ann_filtered_search" -> annIndexServeOracleWhere(
      " AND cd.scid IN (SELECT vec_id FROM embeddings WHERE label % 3 = 0)"),
    // quantizer refresh: retrain ≡ fresh build over the live rows, so the
    // replay filters the CORPUS relation (training included) to live ids
    "q176_ann_index_retrain" -> annIndexServeOracleWhere("",
      embWhere = " WHERE vec_id % 10 <> 3"),
    "q161_exact_substr_spans" -> // ExactSubstr (Lee et al. 2021): k-gram
      // md5 occurrences -> corpus-wide multiplicity window -> per-doc
      // interval merge; the injected header/footer canaries (q92 rule)
      // guarantee cross-doc spans AND exercise the merge (5 overlapping
      // header windows -> one 12-token span; %15 docs carry two spans)
      "WITH base AS (SELECT doc_id, concat(CASE WHEN doc_id % 3 = 0 THEN 'shared license header text appears before many documents in the crawl corpus ' ELSE '' END, text, CASE WHEN doc_id % 5 = 0 THEN ' subscribe to our newsletter for updates and special offers' ELSE '' END) AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), w AS (SELECT doc_id, string_split_regex(trim(t), '\\s+') AS ws FROM base), u AS (SELECT doc_id, ws, generate_subscripts(ws, 1) AS i, unnest(ws) AS _w FROM w), g AS (SELECT doc_id, i - 1 AS pos, md5(array_to_string(ws[i:i+7], ' ')) AS h FROM u WHERE i + 7 <= len(ws)), d AS (SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY h) AS copies FROM g), o AS (SELECT doc_id, pos FROM d WHERE copies >= 2), m AS (SELECT doc_id, pos, CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8 THEN 1 ELSE 0 END AS fresh FROM o), i2 AS (SELECT doc_id, pos, SUM(fresh) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id FROM m), sp AS (SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 8 AS span_end FROM i2 GROUP BY doc_id, span_id) SELECT doc_id, CAST(span_start AS BIGINT) AS span_start, CAST(span_end AS BIGINT) AS span_end, CAST(span_end - span_start AS BIGINT) AS span_tokens FROM sp ORDER BY doc_id, span_start",
    "q154_hybrid_rrf" -> hybridRrfOracle,
    "q155_hybrid_bm25_ann" -> hybridBm25AnnOracle,
    "q156_curation_neardup" -> curationNearDupOracle,
    // trim ≡ replayed cut: the q161 chain, the NOT EXISTS token cut, and
    // the chain again over the trimmed text (the fixpoint audit)
    "q163_exact_substr_trim" -> exactSubstrTrimOracle,
    "q164_neardup_aware_split" -> neardupAwareSplitOracle,
    "q167_curation_trimmed" -> curationTrimmedOracle,
    "q168_bpe_train" -> bpeTrainOracle,
    "q169_quality_classifier" -> qualityClassifierOracle,
    "q170_bpe_tokenize" -> bpeTokenizeOracle,
    "q171_ann_adaptive_search" -> annAdaptiveServeOracle,
    // artifact-served tokenize gates on the SAME computed replay as the
    // inline q170 (parquet round-trips strings/longs bit-exactly; the
    // lane's value is the round trip, which the oracle math can't see)
    "q172_bpe_artifact" -> bpeTokenizeOracle,
    "q173_bpe_encode_unseen" -> bpeEncodeUnseenOracle,
    // q174 serves the loaded artifact; the retrain oracle is q169's (the
    // save/load identity — longs/strings round-trip parquet bit-exactly)
    "q174_nb_model_artifact" -> qualityClassifierOracle,
    "q175_curated_split" -> curatedSplitOracle,
    "q36_cosine_topk" ->
      "WITH f0 AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v FROM embeddings), f AS (SELECT vec_id, i, CAST(v AS DOUBLE) AS v FROM f0), d AS (SELECT q.vec_id AS qid, c.vec_id AS cid, SUM(q.v * c.v) AS dot, SUM(q.v * q.v) AS qq, SUM(c.v * c.v) AS cc FROM f q JOIN f c ON q.i = c.i AND q.vec_id < 5 AND q.vec_id <> c.vec_id GROUP BY 1, 2), r AS (SELECT qid, cid, ROUND(dot / (SQRT(qq) * SQRT(cc)), 4) AS sim FROM d), rk AS (SELECT qid, cid, sim, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM r) SELECT qid, cid, sim, rnk FROM rk WHERE rnk <= 5 ORDER BY qid, rnk",
    "q37_neardup_embedding" ->
      "WITH f0 AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v FROM embeddings WHERE vec_id < 300), f AS (SELECT vec_id, i, CAST(v AS DOUBLE) AS v FROM f0), d AS (SELECT a.vec_id AS id1, b.vec_id AS id2, SUM(a.v * b.v) AS dot, SUM(a.v * a.v) AS qq, SUM(b.v * b.v) AS cc FROM f a JOIN f b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY 1, 2) SELECT id1, id2, ROUND(dot / (SQRT(qq) * SQRT(cc)), 4) AS sim FROM d ORDER BY sim DESC, id1, id2 LIMIT 20",
    "q38_multimodal_bytes" ->
      "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents ORDER BY doc_id",
    "q41_asof_join" -> // microsecond resolution both sides: DuckDB reads the
      // nanos parquet column as a µs TIMESTAMP (epoch_ns % 1000 = 0 on every
      // row — verified), so epoch_us is its native exact value; Spark
      // truncates its nanos to match (ts div 1000). COALESCE(-1): NULL bigint
      // data columns hash-diverge cross-engine (r01).
      "WITH u AS (SELECT user_id, epoch_us(ts) AS ts, 1 AS is_click FROM events WHERE event_type = 'click' UNION ALL SELECT user_id, epoch_us(ts) AS ts, 0 AS is_click FROM events WHERE event_type = 'purchase') SELECT user_id, ts, COALESCE(last_purchase_ts, -1) AS last_purchase_ts FROM (SELECT user_id, ts, is_click, MAX(CASE WHEN is_click = 0 THEN ts END) OVER (PARTITION BY user_id ORDER BY ts, is_click ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_ts FROM u) w WHERE is_click = 1 ORDER BY user_id, ts",
    "q42_percentiles" ->
      "SELECT l_returnflag, ROUND(quantile_cont(l_quantity, 0.25), 2) AS p25, ROUND(quantile_cont(l_quantity, 0.5), 2) AS p50, ROUND(quantile_cont(l_quantity, 0.75), 2) AS p75, ROUND(quantile_cont(l_quantity, 0.99), 2) AS p99 FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q43_pivot" ->
      "SELECT lang, CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS src0, CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS src1, CAST(SUM(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS BIGINT) AS src2 FROM documents GROUP BY lang ORDER BY lang",
    "q44_explode_tokens" ->
      "SELECT doc_id, word, COUNT(*) AS n FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word FROM documents WHERE doc_id < 10) t GROUP BY doc_id, word ORDER BY doc_id, word",
    "q45_window_analytics" ->
      "SELECT o_orderkey, CAST(NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS nt, CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS dr, FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS fv FROM orders ORDER BY o_orderkey",
    "q46_string_more" ->
      "SELECT p_partkey, LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS pk8, REPLACE(p_type, ' ', '_') AS ty, SPLIT_PART(p_name, ' ', 1) AS w1, REGEXP_EXTRACT(p_name, '([aeiou]+)', 1) AS vow FROM part ORDER BY p_partkey",
    "q47_date_trunc" ->
      "SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS m, COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY 1",
    "q51_intersect_all" ->
      "SELECT c_nationkey AS k FROM customer INTERSECT ALL SELECT s_nationkey AS k FROM supplier ORDER BY k",
    "q52_except_all" ->
      "SELECT c_nationkey AS k FROM customer EXCEPT ALL SELECT s_nationkey AS k FROM supplier ORDER BY k",
    "q53_char_ngram_jaccard" -> // unnest(generate_series): DuckDB's binder
      // rejects range() with a lateral column parameter (r01 oracle err)
      "WITH w AS (SELECT doc_id, substr(text, CAST(i AS INT), 3) AS word FROM (SELECT doc_id, text, unnest(generate_series(1, length(text) - 2)) AS i FROM documents WHERE doc_id < 20) src), d AS (SELECT DISTINCT doc_id, word FROM w), s AS (SELECT doc_id, COUNT(*) AS sz FROM d GROUP BY doc_id), c AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter FROM d a JOIN d b ON a.word = b.word AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT id1, id2, ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS jaccard FROM c JOIN s sa ON sa.doc_id = id1 JOIN s sb ON sb.doc_id = id2 ORDER BY id1, id2",
    "q54_tpch_q3" ->
      "SELECT l_orderkey, CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00' GROUP BY l_orderkey, o_orderdate ORDER BY revenue DESC, l_orderkey LIMIT 10",
    "q55_tpch_q10" ->
      "SELECT c_custkey, CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue, COUNT(*) AS n FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey WHERE l_returnflag = 'R' GROUP BY c_custkey ORDER BY revenue DESC, c_custkey LIMIT 20",
    "q56_window_dist" ->
      "SELECT o_orderkey, ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice), 4) AS pr, ROUND(CUME_DIST() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice), 4) AS cd FROM orders ORDER BY o_orderkey",
    "q57_correlated_subquery" ->
      "SELECT c_custkey, (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n FROM customer c ORDER BY c_custkey",
    "q58_scalar_subquery" -> // price*n > sum ≡ price > avg, but exact in decimal
      "SELECT o_orderkey, ROUND(o_totalprice, 2) AS p FROM orders WHERE CAST(o_totalprice AS DECIMAL(12,2)) * (SELECT COUNT(*) FROM orders) > (SELECT SUM(CAST(o_totalprice AS DECIMAL(12,2))) FROM orders) ORDER BY o_orderkey",
    "q59_join_right" ->
      "SELECT c_custkey, COALESCE(o_orderkey, -1) AS o_key FROM (SELECT * FROM orders WHERE o_totalprice > 300000) o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey ORDER BY c_custkey, o_key",
    "q60_join_full" ->
      "SELECT COALESCE(c_custkey, -1) AS ck, COALESCE(o_orderkey, -1) AS ok FROM (SELECT * FROM customer WHERE c_custkey <= 50) c FULL JOIN (SELECT * FROM orders WHERE o_custkey BETWEEN 30 AND 80) o ON c.c_custkey = o.o_custkey ORDER BY ck, ok",
    "q61_string_agg" ->
      "WITH d AS (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders), s AS (SELECT o_orderstatus, string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS prios FROM d GROUP BY o_orderstatus), c AS (SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus) SELECT s.o_orderstatus, prios, n FROM s JOIN c USING (o_orderstatus) ORDER BY o_orderstatus",
    "q62_mode" ->
      "WITH c AS (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt FROM orders GROUP BY 1, 2), r AS (SELECT o_orderstatus, o_orderpriority, cnt, ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY cnt DESC, o_orderpriority) AS rk FROM c) SELECT o_orderstatus, o_orderpriority AS mode_prio, cnt FROM r WHERE rk = 1 ORDER BY o_orderstatus",
    "q63_stats_exact" -> // exact integer sums -> deterministic doubles (see q63 scaladoc)
      "WITH a AS (SELECT l_returnflag, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx, CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx, CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sy, CAST(SUM(CAST(l_linenumber AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS BIGINT) AS syy, CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sxy FROM lineitem GROUP BY l_returnflag) SELECT l_returnflag, n, ROUND(CAST(sx AS DOUBLE) / n, 4) AS mean_qty, ROUND(SQRT(CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)), 4) AS stddev_qty, ROUND(CAST(n * sxy - sx * sy AS DOUBLE) / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 4) AS corr_ql FROM a ORDER BY l_returnflag",
    "q64_filter_agg" ->
      "SELECT o_orderpriority, COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f, COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o, COALESCE(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))) FILTER (WHERE o_orderstatus = 'F'), 2) AS DOUBLE), 0.0) AS rev_f FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
    "q65_train_val_split" -> // md5 hex is identical in both engines
      "SELECT source, CASE WHEN substr(md5(text), 1, 1) <= '9' THEN 'train' WHEN substr(md5(text), 1, 1) <= 'c' THEN 'val' ELSE 'test' END AS split, COUNT(*) AS n FROM documents GROUP BY 1, 2 ORDER BY source, split",
    "q66_chunk" ->
      "SELECT doc_id, CAST((i - 1) // 80 AS BIGINT) AS chunk_id, CAST(length(substr(text, CAST(i AS INT), 100)) AS BIGINT) AS chunk_len, md5(substr(text, CAST(i AS INT), 100)) AS chunk_md5 FROM (SELECT doc_id, text, unnest(generate_series(1, length(text), 80)) AS i FROM documents WHERE length(text) >= 1) t ORDER BY doc_id, chunk_id",
    "q67_pii_redact" ->
      "WITH dirty AS (SELECT lang, concat(text, ' contact user', doc_id, '@example.com or call 55512340', doc_id) AS d FROM documents), r AS (SELECT lang, regexp_replace(regexp_replace(d, '[A-Za-z0-9_.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'), '[0-9]{7,}', '<NUM>', 'g') AS clean, len(regexp_extract_all(d, '[A-Za-z0-9_.]+@[A-Za-z0-9.]+')) AS n_email FROM dirty) SELECT lang, COUNT(*) AS n, CAST(SUM(n_email) AS BIGINT) AS emails_masked, CAST(SUM(len(regexp_extract_all(clean, '<EMAIL>'))) AS BIGINT) AS email_tags, CAST(SUM(len(regexp_extract_all(clean, '<NUM>'))) AS BIGINT) AS num_tags FROM r GROUP BY lang ORDER BY lang",
    "q68_sessionize" ->
      "WITH e AS (SELECT user_id, epoch_ns(ts) AS ts FROM events), m AS (SELECT user_id, ts, CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) > 1800000000000 THEN 1 ELSE 0 END AS brk FROM e), s AS (SELECT user_id, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m), g AS (SELECT user_id, sid, COUNT(*) AS n FROM s GROUP BY 1, 2) SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n) AS BIGINT) AS n_events, CAST(MAX(n) AS BIGINT) AS max_session FROM g GROUP BY user_id ORDER BY user_id",
    "q69_union" ->
      "SELECT (SELECT COUNT(*) FROM (SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey AS k FROM supplier) u) AS n_union, (SELECT COUNT(*) FROM (SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey AS k FROM supplier) ua) AS n_union_all",
    "q70_having" ->
      "SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 10 ORDER BY o_custkey",
    "q71_cross" ->
      "SELECT r1.r_regionkey AS a, r2.r_regionkey AS b FROM region r1 CROSS JOIN region r2 ORDER BY a, b",
    "q72_limit_offset" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 5",
    "q73_sample_stratified" -> // md5-seeded keep-decision, portable like q65
      "SELECT lang, source, COUNT(*) AS n FROM documents WHERE substr(md5(concat('s42|', coalesce(text, ''))), 1, 1) < (CASE WHEN lang = 'en' THEN '8' WHEN lang = 'de' THEN '4' ELSE '2' END) GROUP BY lang, source ORDER BY lang, source",
    "q74_top_bigrams" ->
      "WITH w AS (SELECT string_split_regex(trim(text), '\\s+') AS words FROM documents), e AS (SELECT words[CAST(i AS INT)] || ' ' || words[CAST(i AS INT) + 1] AS bigram FROM (SELECT words, unnest(generate_series(1, len(words) - 1)) AS i FROM w WHERE len(words) >= 2) t) SELECT bigram, COUNT(*) AS n FROM e GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20",
    "q75_repetition" ->
      "SELECT lang, ROUND(AVG(rep), 4) AS rep_ratio, ROUND(MAX(rep), 4) AS max_rep, COUNT(*) AS n FROM (SELECT lang, CAST(len(words) - len(list_distinct(words)) AS DOUBLE) / len(words) AS rep FROM (SELECT lang, string_split_regex(trim(text), '\\s+') AS words FROM documents) w) t GROUP BY lang ORDER BY lang",
    "q76_decontaminate" -> // canary injection keeps the row non-vacuous at
      // every scale; the canary text interpolates from Dedup.Canary (one
      // source of truth — r9 ADVICE)
      s"WITH base AS (SELECT doc_id, lang, concat(coalesce(text, ''), CASE WHEN doc_id % 7 = 0 OR doc_id % 100 = 0 THEN ' ${Dedup.Canary}' ELSE '' END) AS text FROM documents), w AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS words FROM base), shg AS (SELECT doc_id, lang, array_to_string(list_slice(words, CAST(i AS INT), CAST(i AS INT) + 4), ' ') AS sh FROM (SELECT doc_id, lang, words, unnest(generate_series(1, len(words) - 4)) AS i FROM w WHERE len(words) >= 5) t), b AS (SELECT DISTINCT sh FROM shg WHERE doc_id % 100 = 0), c AS (SELECT DISTINCT s.doc_id, s.lang FROM shg s JOIN b ON s.sh = b.sh WHERE s.doc_id % 100 <> 0) SELECT lang, COUNT(*) AS n_contaminated FROM c GROUP BY lang ORDER BY lang",
    "q77_embedding_norms" ->
      "SELECT label, ROUND(AVG(nrm), 4) AS avg_norm, ROUND(MIN(nrm), 4) AS min_norm, ROUND(MAX(nrm), 4) AS max_norm, COUNT(*) AS n FROM (SELECT label, SQRT(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm FROM embeddings) t GROUP BY label ORDER BY label",
    "q78_url_domains" ->
      "SELECT domain, COUNT(*) AS n FROM (SELECT regexp_extract(concat(coalesce(text, ''), ' see https://w', doc_id % 20, '.example.org/p/', doc_id), 'https://([a-z0-9.]+)/', 1) AS domain FROM documents) t GROUP BY domain ORDER BY domain",
    "q79_dup_clusters" -> // closed form of CC over shared-fingerprint edges:
      // the engine side runs generic iterative min-label propagation; this
      // window is the ground truth it must converge to
      "SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS cluster FROM documents WHERE text IS NOT NULL ORDER BY doc_id",
    "q80_pack_bins" ->
      "WITH t AS (SELECT source, doc_id % 8 AS shard, doc_id, len(string_split_regex(trim(text), '\\s+')) AS tokens FROM documents), p AS (SELECT source, shard, tokens, SUM(tokens) OVER (PARTITION BY source, shard ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens AS prefix FROM t), b AS (SELECT source, shard, tokens, (prefix // 2048) AS bin FROM p) SELECT source, shard, CAST(MAX(bin) + 1 AS BIGINT) AS n_bins, COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS total_tokens FROM b GROUP BY source, shard ORDER BY source, shard",
    "q81_shuffle_order" -> // monolithic ROW_NUMBER: the ground truth the
      // engine's bucketed decomposition must reproduce exactly
      // WHERE doc_id IS NOT NULL: the engine's deterministicShuffle declares
      // a null-id exclusion contract — encode it on the oracle side too
      // rather than relying on the fixture never producing NULL doc_ids
      "SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY md5(concat('e1|', CAST(doc_id AS VARCHAR))), doc_id) AS BIGINT) AS pos FROM documents WHERE doc_id IS NOT NULL ORDER BY doc_id",
    "q82_scalar_funcs" -> // portable scalar subset; POWER(2, int) exact both
      // engines; FLOOR before BIGINT cast (bare double→int CAST truncates in
      // Spark but rounds in DuckDB)
      "SELECT l_orderkey, l_linenumber, GREATEST(CAST(FLOOR(l_quantity) AS BIGINT), 10) AS g, LEAST(CAST(FLOOR(l_quantity) AS BIGINT), CAST(l_linenumber AS BIGINT)) AS l, COALESCE(NULLIF(CAST(l_linenumber AS BIGINT), 3), -1) AS nz, CAST(l_orderkey % 7 AS BIGINT) AS m, CAST(POWER(2, l_linenumber) AS BIGINT) AS p2 FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber",
    "q83_posexplode" -> // generate_subscripts is 1-based, posexplode 0-based
      "SELECT doc_id, CAST(generate_subscripts(words, 1) - 1 AS BIGINT) AS i, unnest(words) AS word FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents WHERE doc_id < 5) t ORDER BY doc_id, i",
    "q84_length_buckets" -> // integer CASE ladder (no float log bucketing);
      // avg from the exact integer sum, not engine AVG
      "WITH t AS (SELECT lang, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tokens FROM documents WHERE text IS NOT NULL), b AS (SELECT lang, tokens, CASE WHEN tokens < 16 THEN 'a_lt16' WHEN tokens < 32 THEN 'b_16_31' WHEN tokens < 64 THEN 'c_32_63' WHEN tokens < 128 THEN 'd_64_127' ELSE 'e_128_plus' END AS bucket FROM t) SELECT lang, bucket, COUNT(*) AS n, CAST(SUM(tokens) AS BIGINT) AS total_tokens, ROUND(CAST(SUM(tokens) AS DOUBLE) / COUNT(*), 2) AS avg_tokens FROM b GROUP BY lang, bucket ORDER BY lang, bucket",
    "q85_quality_gate" -> // discrete order statistic via integer 4*cum >= n:
      // both sides spell out the same algorithm — no engine quantile
      // function whose interpolation could differ in the last ulp
      "WITH s AS (SELECT lang, CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / LENGTH(text) AS score FROM documents WHERE text IS NOT NULL AND LENGTH(text) > 0), g AS (SELECT lang, score, COUNT(*) AS cnt FROM s GROUP BY 1, 2), c AS (SELECT lang, score, SUM(cnt) OVER (PARTITION BY lang ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM g), t AS (SELECT lang, COUNT(*) AS n FROM s GROUP BY lang), thr AS (SELECT c.lang, MIN(score) AS thr FROM c JOIN t ON c.lang = t.lang WHERE cum * 4 >= n GROUP BY c.lang) SELECT s.lang, COUNT(*) AS n_kept, ROUND(AVG(score), 4) AS avg_kept_score, ROUND(MIN(score), 4) AS min_kept_score FROM s JOIN thr ON s.lang = thr.lang WHERE score >= thr GROUP BY s.lang ORDER BY s.lang",
    "q86_map_funcs" -> // the Spark plan routes through a real MAP column
      // (from_json → map_concat → element_at/map_keys/size); the oracle
      // reads the same VALUES straight from the JSON — map representation
      // is Spark-side, values are the contract. keys/n_entries pin the map
      // shape ('k,u', 2 entries/row) so a parse regression can't hide.
      "SELECT event_type, 'k,u' AS keys, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, CAST(SUM(user_id) AS BIGINT) AS sum_u, CAST(2 * COUNT(*) AS BIGINT) AS n_entries, COUNT(*) AS n FROM events WHERE props IS NOT NULL GROUP BY event_type ORDER BY event_type, keys",
    "q88_range_join_binned" -> // busy-hour islands range-joined back to
      // events. The oracle states the range join DIRECTLY (ts >= start AND
      // ts < end); the engine side decomposes it into a binned equi-join
      // (RangeJoin.binnedPointInterval) — same rows, hash-joinable plan.
      // Exact integer arithmetic throughout (10·c·n_hours > 11·total, no
      // division); hour boundaries are multiples of 1000 ns so DuckDB's
      // µs-truncated read of events.ts never moves a row across a
      // boundary; value sums run in DECIMAL on both sides.
      "WITH hrs AS (SELECT epoch_ns(ts) - (epoch_ns(ts) % 3600000000000) AS hb, COUNT(*) AS c FROM events GROUP BY 1), st AS (SELECT SUM(c) AS total, COUNT(*) AS n_hours FROM hrs), busy AS (SELECT hb FROM hrs, st WHERE 10 * c * n_hours > 11 * total), isl AS (SELECT MIN(hb) AS start_ns, MAX(hb) + 3600000000000 AS end_ns, COUNT(*) AS island_hours FROM (SELECT hb, hb - ROW_NUMBER() OVER (ORDER BY hb) * 3600000000000 AS grp FROM busy) g GROUP BY grp) SELECT i.start_ns AS island_start, CAST(i.island_hours AS BIGINT) AS island_hours, COUNT(*) AS n_events, COUNT(DISTINCT e.user_id) AS n_users, CAST(ROUND(SUM(CAST(e.value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value FROM events e JOIN isl i ON epoch_ns(e.ts) >= i.start_ns AND epoch_ns(e.ts) < i.end_ns GROUP BY 1, 2 ORDER BY 1",
    "q89_tfidf_top_terms" -> // IDF surrogate (N*1000 // df) is exact integer
      // arithmetic: ln(N/df) would go through libm vs java.lang.Math and
      // diverge in the last ulp (the transcendental rule). Ties broken by
      // term — fully deterministic both sides.
      "WITH d AS (SELECT doc_id, lang, lower(text) AS text FROM documents WHERE text IS NOT NULL), tok AS (SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\\s+')) AS term FROM d), ft AS (SELECT doc_id, lang, term FROM tok WHERE length(term) >= 3), tf AS (SELECT lang, doc_id, term, COUNT(*) AS tf FROM ft GROUP BY 1, 2, 3), st AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), n AS (SELECT COUNT(*) AS n_docs FROM d), sc AS (SELECT lang, term, SUM(tf) AS ttf FROM tf GROUP BY 1, 2), w AS (SELECT sc.lang, sc.term, CAST(sc.ttf * ((n.n_docs * 1000) // st.df) AS BIGINT) AS score FROM sc JOIN st USING (term) CROSS JOIN n), r AS (SELECT lang, term, score, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, term) AS rnk FROM w) SELECT lang, term, score, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 10 ORDER BY lang, rnk",
    "q90_quota_cap" -> // md5-over-id ranking ≡ the Spark plan (the q81
      // portable-hash pattern); kept_sum pins WHICH rows survived the cap
      "WITH r AS (SELECT source, doc_id, ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(concat('q90|', CAST(doc_id AS VARCHAR))), doc_id) AS rnk FROM documents WHERE doc_id IS NOT NULL) SELECT source, COUNT(*) AS n_total, CAST(SUM(CASE WHEN rnk <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, CAST(SUM(CASE WHEN rnk <= 15 THEN doc_id END) AS BIGINT) AS kept_sum FROM r GROUP BY source ORDER BY source",
    "q91_bloom_semi_join" -> // the oracle states the plain IN-subquery; the
      // engine's bloom pre-filter + semi-join must be result-invisible
      "SELECT l_returnflag, COUNT(*) AS n, COUNT(DISTINCT l_orderkey) AS n_orders, CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 475000.0) GROUP BY l_returnflag ORDER BY l_returnflag",
    "q92_cdc_passages" -> // content-defined chunking: a word whose md5 hex
      // starts 0/1 begins a new passage — position-independent boundaries,
      // so the injected every-5th-doc boilerplate dedups across docs even
      // though it lands at different word offsets (what fixed-stride q66
      // cannot see). md5 is the portable boundary gate both engines share.
      "WITH base AS (SELECT doc_id, concat(text, CASE WHEN doc_id % 5 = 0 THEN ' the quick brown fox jumps over the lazy dog' ELSE '' END) AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), w AS (SELECT doc_id, string_split_regex(trim(t), '\\s+') AS words FROM base), tok AS (SELECT doc_id, generate_subscripts(words, 1) AS i, unnest(words) AS word FROM w), m AS (SELECT doc_id, i, word, CASE WHEN substring(md5(word), 1, 1) IN ('0', '1') THEN 1 ELSE 0 END AS b FROM tok), pw AS (SELECT doc_id, i, word, SUM(b) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pid FROM m), pas AS (SELECT doc_id, pid, md5(string_agg(word, ' ' ORDER BY i)) AS pmd5 FROM pw GROUP BY doc_id, pid), g AS (SELECT pmd5, COUNT(*) AS copies, COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS keeper FROM pas GROUP BY pmd5) SELECT COUNT(*) AS n_unique_passages, CAST(SUM(copies) AS BIGINT) AS n_passages, CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS cross_doc_groups, CAST(SUM(CASE WHEN n_docs >= 2 THEN copies END) AS BIGINT) AS cross_doc_copies, CAST(SUM(CASE WHEN n_docs >= 2 THEN keeper END) AS BIGINT) AS keeper_sum FROM g",
    "q93_inverted_index" -> // posting list capped to 5 BEFORE collection on
      // the engine side (WindowGroupLimit); the oracle spells the same
      // first-5-by-doc_id contract with a rank filter
      "WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term FROM documents WHERE text IS NOT NULL), ft AS (SELECT doc_id, term FROM tok WHERE length(term) >= 3), td AS (SELECT term, doc_id, COUNT(*) AS tf_d FROM ft GROUP BY 1, 2), st AS (SELECT term, COUNT(*) AS df, CAST(SUM(tf_d) AS BIGINT) AS tf FROM td GROUP BY term), r AS (SELECT term, doc_id, ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn FROM td), p AS (SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS posting FROM r WHERE rn <= 5 GROUP BY term) SELECT st.term, df, tf, posting FROM st JOIN p ON st.term = p.term ORDER BY df DESC, st.term LIMIT 50",
    "q94_hopping_windows" -> // 2h windows every 1h: each event explodes to
      // its 2 covering windows (k=0,1) — the sliding-window decomposition.
      // Hour-multiple starts keep the DuckDB µs read boundary-safe (q24).
      "WITH e AS (SELECT epoch_ns(ts) AS tns, event_type, user_id, value FROM events), x AS (SELECT tns - (tns % 3600000000000) - k * 3600000000000 AS wstart, event_type, user_id, value FROM e, (SELECT unnest([0, 1]) AS k) ks) SELECT wstart, event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users, CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sv FROM x GROUP BY 1, 2 ORDER BY 1, 2",
    "q95_mixture_resample" -> // sqrt-temperature quotas in exact integers:
      // w=floor(sqrt(n)*1000) (IEEE sqrt is correctly rounded — identical
      // doubles both engines), quota=(N/2)*w // sum(w); survivors by the
      // q90 md5-rank contract
      "WITH d AS (SELECT source, doc_id FROM documents WHERE doc_id IS NOT NULL), c AS (SELECT source, COUNT(*) AS n_total FROM d GROUP BY source), w AS (SELECT source, n_total, CAST(FLOOR(SQRT(CAST(n_total AS DOUBLE)) * 1000) AS BIGINT) AS w FROM c), t AS (SELECT SUM(w) AS sum_w, SUM(n_total) AS n_all FROM w), q AS (SELECT source, n_total, ((n_all // 2) * w) // sum_w AS quota FROM w, t), r AS (SELECT source, doc_id, ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(concat('q95|', CAST(doc_id AS VARCHAR))), doc_id) AS rnk FROM d) SELECT q.source, q.n_total, CAST(q.quota AS BIGINT) AS quota, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS kept_sum FROM r JOIN q ON r.source = q.source WHERE rnk <= quota GROUP BY 1, 2, 3 ORDER BY q.source",
    "q96_funnel" -> // strictly-ordered funnel: first view -> first click
      // after it -> first purchase after that. Timestamps truncated to µs
      // on both sides (epoch_us ≡ ts div 1000) — the q41 resolution
      // contract for raw-epoch outputs
      "WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events), v AS (SELECT user_id, MIN(t) AS vt FROM e WHERE event_type = 'view' GROUP BY user_id), c AS (SELECT e.user_id, MIN(t) AS ct FROM e JOIN v ON e.user_id = v.user_id WHERE event_type = 'click' AND t > vt GROUP BY e.user_id), p AS (SELECT e.user_id, MIN(t) AS pt FROM e JOIN c ON e.user_id = c.user_id WHERE event_type = 'purchase' AND t > ct GROUP BY e.user_id) SELECT v.user_id % 10 AS bucket, COUNT(*) AS n_view, COUNT(ct) AS n_click, COUNT(pt) AS n_purchase, CAST(SUM(ct - vt) AS BIGINT) AS total_lag_us FROM v LEFT JOIN c ON v.user_id = c.user_id LEFT JOIN p ON v.user_id = p.user_id GROUP BY 1 ORDER BY 1",
    "q97_rolling_range" -> // RANGE frame over µs-truncated event time (q41
      // resolution contract); DECIMAL frame sums make MAX exact
      "WITH e AS (SELECT user_id, epoch_us(ts) AS t, CAST(value AS DECIMAL(12,2)) AS v FROM events), r AS (SELECT user_id, COUNT(*) OVER win AS n_1h, SUM(v) OVER win AS v_1h FROM e WINDOW win AS (PARTITION BY user_id ORDER BY t RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)) SELECT user_id, MAX(n_1h) AS max_burst, CAST(MAX(v_1h) AS DOUBLE) AS max_value_1h FROM r GROUP BY user_id ORDER BY user_id",
    "q98_bigram_lm" -> // conditional probability as exact ppm: n2*10^6 // n1
      // (integer division — no float ratio in the hash gate)
      "WITH w AS (SELECT string_split_regex(trim(lower(text)), '\\s+') AS words FROM documents WHERE text IS NOT NULL), e AS (SELECT words[i] AS w1, words[i + 1] AS w2 FROM (SELECT words, unnest(generate_series(1, len(words) - 1)) AS i FROM w WHERE len(words) >= 2) t), c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM e GROUP BY 1, 2), c1 AS (SELECT w1, CAST(SUM(n2) AS BIGINT) AS n1 FROM c2 GROUP BY w1) SELECT c2.w1, c2.w2, c2.n2, c1.n1, CAST(c2.n2 * 1000000 // c1.n1 AS BIGINT) AS p_ppm FROM c2 JOIN c1 USING (w1) ORDER BY c2.n2 DESC, c2.w1, c2.w2 LIMIT 30",
    "q99_winsorized" -> // exact integer cents end-to-end; thresholds are the
      // q85 discrete order statistics (20·cum >= n / >= 19n) — no engine
      // quantile interpolation, no ROUND anywhere
      "WITH li AS (SELECT l_returnflag, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem), t AS (SELECT l_returnflag, COUNT(*) AS n FROM li GROUP BY 1), g AS (SELECT l_returnflag, c, COUNT(*) AS cnt FROM li GROUP BY 1, 2), cu AS (SELECT l_returnflag, c, SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM g), j AS (SELECT cu.l_returnflag, c, cum, n FROM cu JOIN t USING (l_returnflag)), lo AS (SELECT l_returnflag, MIN(c) AS p05_cents FROM j WHERE cum * 20 >= n GROUP BY 1), hi AS (SELECT l_returnflag, MIN(c) AS p95_cents FROM j WHERE cum * 20 >= n * 19 GROUP BY 1) SELECT li.l_returnflag, p05_cents, p95_cents, COUNT(*) AS n, CAST(SUM(GREATEST(p05_cents, LEAST(p95_cents, c))) AS BIGINT) AS winsorized_total_cents FROM li JOIN lo USING (l_returnflag) JOIN hi USING (l_returnflag) GROUP BY 1, 2, 3 ORDER BY li.l_returnflag",
    "q100_salted_join" -> // salting spreads the hot key across partitions but
      // may not change the join result: the plain-join oracle is the proof
      "SELECT o_orderpriority, COUNT(*) AS n, CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE o_totalprice > 400000.0 GROUP BY o_orderpriority ORDER BY o_orderpriority",
    "q102_tpch_q17" -> // correlated scalar agg vs same table; 5·qty·cnt < sum
      // in DECIMAL ≡ qty < 0.2·avg exactly (the q58 no-double-AVG rule)
      "SELECT COUNT(*) AS n_small, CAST(ROUND(COALESCE(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))), 0), 2) AS DOUBLE) AS revenue FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey WHERE p.p_name LIKE '%ol%' AND 5 * CAST(l.l_quantity AS DECIMAL(12,2)) * (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey) < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)",
    "q103_tpch_q20" -> // nested IN over a correlated agg (TPC-H Q20 shape)
      "SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (SELECT l1.l_suppkey FROM lineitem l1 WHERE l1.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%ol%') AND 2 * CAST(l1.l_quantity AS DECIMAL(12,2)) * (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey) > (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)) ORDER BY s_suppkey",
    "q104_tpch_q21" -> // EXISTS + NOT EXISTS with correlated <> (TPC-H Q21 shape)
      "SELECT s.s_name, COUNT(*) AS numwait FROM supplier s JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey JOIN orders o ON o.o_orderkey = l1.l_orderkey WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R' AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R') GROUP BY s.s_name ORDER BY numwait DESC, s.s_name",
    "q105_session_window" -> // the native operator's end-exclusive merge
      // rule (new session when diff >= gap) spelled as the island algorithm;
      // session end = last event + gap; µs-truncated ts (q41 contract)
      "WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events), m AS (SELECT user_id, t, CASE WHEN LAG(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL OR t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) >= 1800000000 THEN 1 ELSE 0 END AS brk FROM e), s AS (SELECT user_id, t, SUM(brk) OVER (PARTITION BY user_id ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m) SELECT user_id, MIN(t) AS session_start_us, MAX(t) + 1800000000 AS session_end_us, COUNT(*) AS n_events FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us",
    "q106_grouping_meta" -> // GROUPING() flag: data-NULL vs rollup-NULL
      "SELECT o_orderpriority, o_orderstatus, CAST(GROUPING(o_orderpriority) AS BIGINT) AS g1, CAST(GROUPING(o_orderstatus) AS BIGINT) AS g2, COUNT(*) AS n FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus) ORDER BY g1, g2, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST",
    "q107_percentile_disc" -> // discrete order statistic: actual data
      // element (cume_dist >= p rule) — hash-exact with no ROUND
      "SELECT l_returnflag, quantile_disc(l_extendedprice, 0.25) AS p25, quantile_disc(l_extendedprice, 0.5) AS p50, quantile_disc(l_extendedprice, 0.9) AS p90, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q108_forward_fill" -> // LOCF: last non-null per user carried forward;
      // deterministic null injection; exact integer cents; -1 sentinel
      "WITH e AS (SELECT user_id, epoch_us(ts) AS t, CAST(ROUND(value*100) AS BIGINT) AS cents FROM events), m AS (SELECT user_id, t, cents, CASE WHEN (user_id + cents) % 5 = 0 THEN NULL ELSE cents END AS v FROM e) SELECT user_id, t, COALESCE(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS filled_cents FROM m ORDER BY user_id, t, filled_cents",
    "q109_unpivot" -> // wide->long melt; wide spelled as CASE sums (values
      // identical to the engine's pivot with 0-fill)
      "WITH wide AS (SELECT lang, CAST(SUM(CASE WHEN source='src0' THEN 1 ELSE 0 END) AS BIGINT) AS src0, CAST(SUM(CASE WHEN source='src1' THEN 1 ELSE 0 END) AS BIGINT) AS src1, CAST(SUM(CASE WHEN source='src2' THEN 1 ELSE 0 END) AS BIGINT) AS src2 FROM documents GROUP BY lang) SELECT lang, src, n FROM (UNPIVOT wide ON src0, src1, src2 INTO NAME src VALUE n) ORDER BY lang, src",
    "q110_explode_outer" -> // outer generator semantics emulated as
      // unnest-or-NULL union (DuckDB's unnest drops empty-list rows)
      "WITH w AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> length(x) >= 7) AS ws FROM documents WHERE text IS NOT NULL), e AS (SELECT doc_id, unnest(ws) AS tok FROM w WHERE len(ws) > 0 UNION ALL SELECT doc_id, NULL AS tok FROM w WHERE len(ws) = 0) SELECT doc_id, tok FROM e ORDER BY doc_id, tok NULLS FIRST",
    "q111_curation_funnel" -> // the COMPOSED curation flow's closed form:
      // funnel counts per stage + survivor id-sum + Σ doc_id·pos position
      // checksum (pins the exact training order). Stages mirror
      // Curation.curate: non-empty → alpha-ratio ≥ 0.45 → min-id dedup per
      // md5(text) → 5-shingle decon vs the every-100th-doc benchmark →
      // md5-rank quota k=15 → md5-rank global positions.
      "WITH ne AS (SELECT doc_id, source, text FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), q AS (SELECT * FROM ne WHERE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) >= 0.45), k AS (SELECT md5(text) AS fp, MIN(doc_id) AS keep FROM q GROUP BY 1), d AS (SELECT q.* FROM q JOIN k ON md5(q.text) = fp AND q.doc_id = keep), qw AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM q), shc AS (SELECT doc_id, array_to_string(list_slice(words, CAST(i AS INT), CAST(i AS INT) + 4), ' ') AS sh FROM (SELECT doc_id, words, unnest(generate_series(1, len(words) - 4)) AS i FROM qw WHERE len(words) >= 5) t), bw AS (SELECT string_split_regex(trim(text), '\\s+') AS words FROM documents WHERE doc_id % 100 = 0), bsh AS (SELECT DISTINCT array_to_string(list_slice(words, CAST(i AS INT), CAST(i AS INT) + 4), ' ') AS sh FROM (SELECT words, unnest(generate_series(1, len(words) - 4)) AS i FROM bw WHERE len(words) >= 5) t), contam AS (SELECT DISTINCT doc_id FROM shc JOIN bsh USING (sh)), c AS (SELECT * FROM d WHERE doc_id NOT IN (SELECT doc_id FROM contam)), r AS (SELECT doc_id, source, ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(concat('curate|', CAST(doc_id AS VARCHAR))), doc_id) AS rnk FROM c), cap AS (SELECT doc_id FROM r WHERE rnk <= 15), p AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY md5(concat('curate|pos|', CAST(doc_id AS VARCHAR))), doc_id) AS pos FROM cap) SELECT (SELECT COUNT(*) FROM ne) AS n_non_empty, (SELECT COUNT(*) FROM q) AS n_quality, (SELECT COUNT(*) FROM d) AS n_dedup, (SELECT COUNT(*) FROM c) AS n_clean, (SELECT COUNT(*) FROM cap) AS n_capped, CAST((SELECT SUM(doc_id) FROM cap) AS BIGINT) AS kept_id_sum, CAST((SELECT SUM(doc_id * pos) FROM p) AS BIGINT) AS pos_checksum",
    "q162_leakage_free_split" -> // split = bucket(md5('q162|' || md5(text)))
      // — the q115 dyadic-hex spelling both engines compute identically;
      // canary replacement (every %100==7 doc) forms one multi-doc exact
      // cluster that must co-locate (max_cluster pins it, exact_leak 0)
      "WITH ne AS (SELECT doc_id, CASE WHEN doc_id % 100 = 7 THEN 'this exact passage appears verbatim in several crawl snapshots of the corpus' ELSE text END AS text FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), f AS (SELECT doc_id, text, md5(text) AS fp FROM ne), a AS (SELECT doc_id, text, fp, CAST(concat('0x', substring(md5(concat('q162|', fp)), 1, 8)) AS BIGINT) % 10 AS h FROM f), sp AS (SELECT doc_id, text, fp, CASE WHEN h < 8 THEN 'train' WHEN h = 8 THEN 'val' ELSE 'test' END AS split FROM a), ps AS (SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_clusters, CAST(SUM(length(text)) AS BIGINT) AS n_chars FROM sp GROUP BY split), bf AS (SELECT fp, COUNT(DISTINCT split) AS n_splits, COUNT(*) AS sz FROM sp GROUP BY fp), el AS (SELECT CAST(SUM(CASE WHEN n_splits >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS exact_leak_groups, CAST(MAX(sz) AS BIGINT) AS max_cluster FROM bf), pg AS (SELECT lower(substring(trim(text), 1, 24)) AS sig, COUNT(DISTINCT split) AS n_splits, COUNT(DISTINCT fp) AS n_fps FROM sp GROUP BY sig), pl AS (SELECT CAST(SUM(CASE WHEN n_splits >= 2 AND n_fps >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS prefix_leak_groups FROM pg) SELECT split, n_docs, n_clusters, n_chars, exact_leak_groups, max_cluster, prefix_leak_groups FROM ps, el, pl ORDER BY split",
    "q112_percentile_disc_sharded" -> // same oracle rule as q107: the
      // sharded decomposition must reproduce the built-in exactly
      "SELECT l_returnflag, quantile_disc(l_extendedprice, 0.25) AS p25, quantile_disc(l_extendedprice, 0.5) AS p50, quantile_disc(l_extendedprice, 0.9) AS p90, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q115_weighted_sample" -> // A-ES priority -ln(u)/w; u is the md5-derived
      // dyadic uniform both engines compute bit-identically, so the sampled
      // id set replays exactly (float note in the operator's scaladoc)
      "WITH d AS (SELECT doc_id, source, n_chars + 1 AS w FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL), u AS (SELECT doc_id, source, w, CAST(CAST(concat('0x', substring(md5(concat('q115|', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) + 1 AS DOUBLE) / 4294967297.0 AS u FROM d), p AS (SELECT doc_id, source, w, -ln(u) / w AS pri FROM u), r AS (SELECT source, doc_id, w, ROW_NUMBER() OVER (PARTITION BY source ORDER BY pri, doc_id) AS rnk FROM p) SELECT source, CAST(rnk AS BIGINT) AS rnk, doc_id, CAST(w AS BIGINT) AS w FROM r WHERE rnk <= 20 ORDER BY source, rnk",
    "q116_bigram_rarity" -> // corpus bigram counts joined back per doc;
      // bottom-20 by integer mean corpus frequency (ppm-style div)
      "WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS words FROM documents WHERE text IS NOT NULL), db AS (SELECT doc_id, array_to_string(list_slice(words, CAST(i AS INT), CAST(i AS INT) + 1), ' ') AS bg FROM (SELECT doc_id, words, unnest(generate_series(1, len(words) - 1)) AS i FROM w WHERE len(words) >= 2) t), c2 AS (SELECT bg, COUNT(*) AS c2 FROM db GROUP BY bg), pd AS (SELECT doc_id, COUNT(*) AS n_bigrams, MIN(c2) AS min_c2, SUM(c2) AS sum_c2 FROM db JOIN c2 USING (bg) GROUP BY doc_id) SELECT doc_id, n_bigrams, CAST(min_c2 AS BIGINT) AS min_c2, CAST(sum_c2 * 1000000 // n_bigrams AS BIGINT) AS mean_c2_ppm FROM pd ORDER BY mean_c2_ppm, doc_id LIMIT 20",
    "q117_scd2_intervals" -> // island compression of per-user event_type
      // runs; valid_to = next interval's valid_from (lead over interval_seq);
      // µs-truncated ts (q41 contract); -1 sentinel on the open interval
      "WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id, event_type FROM events), m AS (SELECT user_id, t, event_id, event_type, CASE WHEN LAG(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL OR LAG(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id) <> event_type THEN 1 ELSE 0 END AS chg FROM e), s AS (SELECT user_id, t, event_type, SUM(chg) OVER (PARTITION BY user_id ORDER BY t, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS interval_seq FROM m), g AS (SELECT user_id, interval_seq, MIN(event_type) AS event_type, MIN(t) AS valid_from_us, COUNT(*) AS n_events FROM s GROUP BY 1, 2) SELECT user_id, CAST(interval_seq AS BIGINT) AS interval_seq, event_type, valid_from_us, COALESCE(LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY interval_seq), -1) AS valid_to_us, n_events FROM g ORDER BY user_id, interval_seq",
    "q118_mad_outliers" -> // exact integer-cents median + MAD via
      // quantile_disc (= the engine's sharded min(2·cum ≥ n) rule)
      "WITH li AS (SELECT l_returnflag AS f, CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS c FROM lineitem), med AS (SELECT f, quantile_disc(c, 0.5) AS med_cents FROM li GROUP BY f), dev AS (SELECT li.f, c, med_cents, abs(c - med_cents) AS d FROM li JOIN med USING (f)), mad AS (SELECT f, quantile_disc(d, 0.5) AS mad_cents FROM dev GROUP BY f) SELECT f AS l_returnflag, MAX(med_cents) AS med_cents, MAX(mad_cents) AS mad_cents, COUNT(*) AS n, CAST(SUM(CASE WHEN d * 2 > 3 * mad_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers FROM dev JOIN mad USING (f) GROUP BY f ORDER BY f",
    "q119_lateral_topk" -> // identical text runs on both engines: lateral
      // derived table with correlated predicate + per-invocation sort/limit
      "SELECT c.c_custkey, o.o_orderkey, o.o_totalprice FROM customer c, LATERAL (SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey = c.c_custkey ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey",
    "q120_recursive_chain" -> // identical text on both engines: WITH
      // RECURSIVE over a precomputed successor edge table — the recursion
      // is a pure equi-join per level (see the operator's scale note)
      "WITH RECURSIVE succ AS (SELECT o_custkey AS ck, o_orderkey AS ok, LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS nxt FROM orders), chain AS (SELECT ck, MIN(ok) AS ok, 1 AS depth FROM succ GROUP BY ck UNION ALL SELECT s.ck, s.nxt AS ok, c.depth + 1 AS depth FROM chain c JOIN succ s ON s.ck = c.ck AND s.ok = c.ok WHERE s.nxt IS NOT NULL AND c.depth < 8) SELECT depth, COUNT(*) AS n, CAST(SUM(ok) AS BIGINT) AS key_sum FROM chain GROUP BY depth ORDER BY depth",
    "q121_fuzzy_pairs" -> // identical semantics on both engines: levenshtein
      // is the same classic DP; blocking key = (prefix-4, ⌊len/8⌋ band),
      // mega-blocks (>FuzzyBlockCap members) dropped — same guard both
      // sides, cap interpolated from the ONE constant (r9 ADVICE)
      s"WITH d AS (SELECT doc_id, lower(substring(trim(text), 1, 24)) AS sig FROM documents WHERE text IS NOT NULL), b0 AS (SELECT doc_id, sig, substring(sig, 1, 4) AS blk, CAST(length(sig) // 8 AS BIGINT) AS lb FROM d), b AS (SELECT doc_id, sig, blk, lb FROM (SELECT doc_id, sig, blk, lb, COUNT(*) OVER (PARTITION BY blk, lb) AS bn FROM b0) t WHERE bn <= ${Dedup.FuzzyBlockCap}) SELECT a.doc_id AS id1, c.doc_id AS id2, CAST(levenshtein(a.sig, c.sig) AS BIGINT) AS lev FROM b a JOIN b c ON a.blk = c.blk AND a.lb = c.lb AND a.doc_id < c.doc_id WHERE levenshtein(a.sig, c.sig) <= 6 ORDER BY id1, id2",
    "q130_source_mixing" -> // α=.5 temperature via sqrt (correctly-rounded
      // IEEE both engines); weights pinned at basis-point granularity
      // (float-sum-order note in the operator scaladoc); prop_ppm exact int
      "WITH per AS (SELECT source, COUNT(*) AS n_docs, CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tokens FROM documents WHERE text IS NOT NULL GROUP BY source), z AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens, SUM(sqrt(CAST(n_tokens AS DOUBLE))) AS z FROM per) SELECT source, n_docs, n_tokens, CAST(n_tokens * 1000000 // tot_tokens AS BIGINT) AS prop_ppm, CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE)) / z * 10000, 0) AS BIGINT) AS temp_bp FROM per, z ORDER BY source",
    "q131_contamination_score" -> // q76's canary + shingle spelling, graded:
      // per-doc shingle-occurrence overlap with the benchmark set, exact ppm
      s"WITH base AS (SELECT doc_id, concat(coalesce(text, ''), CASE WHEN doc_id % 7 = 0 OR doc_id % 100 = 0 THEN ' ${Dedup.Canary}' ELSE '' END) AS text FROM documents), w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM base), shg AS (SELECT doc_id, array_to_string(list_slice(words, CAST(i AS INT), CAST(i AS INT) + 4), ' ') AS sh FROM (SELECT doc_id, words, unnest(generate_series(1, len(words) - 4)) AS i FROM w WHERE len(words) >= 5) t), b AS (SELECT DISTINCT sh FROM shg WHERE doc_id % 100 = 0), c AS (SELECT s.doc_id, COUNT(*) AS n_shingles, CAST(SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contam FROM (SELECT * FROM shg WHERE doc_id % 100 <> 0) s LEFT JOIN b ON s.sh = b.sh GROUP BY s.doc_id) SELECT doc_id, n_shingles, n_contam, CAST(n_contam * 1000000 // n_shingles AS BIGINT) AS contam_ppm FROM c WHERE n_contam > 0 ORDER BY doc_id",
    "q132_cross_source_dups" -> // md5 is the same function both engines;
      // dup groups injected in a projection (operator scaladoc); injection
      // parameters interpolate from the Dedup constants (r9 ADVICE)
      s"WITH base AS (SELECT source, CASE WHEN doc_id % ${Dedup.DupFixMod} = 0 THEN concat('${Dedup.DupFixPrefix}', CAST(doc_id // ${Dedup.DupFixWindow} AS VARCHAR)) ELSE text END AS text FROM documents WHERE text IS NOT NULL), fp AS (SELECT DISTINCT md5(text) AS fp, source FROM base) SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared_fps FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source GROUP BY 1, 2 ORDER BY 1, 2",
    "q133_tpch_q5" -> // 6-way join + c_nationkey=s_nationkey twist;
      // DECIMAL-then-ROUND revenue (q123 discipline)
      "SELECT n_name, CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue FROM customer, orders, lineitem, supplier, nation, region WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' GROUP BY n_name ORDER BY revenue DESC, n_name",
    "q134_tpch_q7" -> // dual-role nation-region dim chain, symmetric OR on
      // REGION pairs (non-vacuous at every SF — operator scaladoc)
      "SELECT r1.r_name AS supp_region, r2.r_name AS cust_region, CAST(year(l_shipdate) AS BIGINT) AS l_year, CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS volume FROM supplier, lineitem, orders, customer, nation n1, nation n2, region r1, region r2 WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey AND n1.n_regionkey = r1.r_regionkey AND n2.n_regionkey = r2.r_regionkey AND ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE') OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA')) AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY 1, 2, 3 ORDER BY 1, 2, 3",
    "q122_retention_cohorts" -> // first-active-day cohorts × day offsets,
      // distinct-user counts; µs truncation then day bucketing
      "WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events), c AS (SELECT user_id, MIN(d) AS cohort_day FROM e GROUP BY user_id), a AS (SELECT DISTINCT user_id, d FROM e) SELECT cohort_day, d - cohort_day AS offset, COUNT(DISTINCT a.user_id) AS n_users FROM a JOIN c USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2",
    "q101_gap_fill" -> // dense hour axis min..max, zero-filled; gap runs via
      // the q88 island trick; single row out, gaps may be 0 at dense SFs
      "WITH hrs AS (SELECT epoch_ns(ts) - (epoch_ns(ts) % 3600000000000) AS hb, COUNT(*) AS n FROM events GROUP BY 1), b AS (SELECT MIN(hb) AS lo, MAX(hb) AS hi FROM hrs), dense AS (SELECT unnest(generate_series(lo, hi, 3600000000000)) AS hb FROM b), f AS (SELECT d.hb, COALESCE(n, 0) AS n FROM dense d LEFT JOIN hrs ON d.hb = hrs.hb), g AS (SELECT hb FROM f WHERE n = 0), r AS (SELECT hb - ROW_NUMBER() OVER (ORDER BY hb) * 3600000000000 AS grp FROM g), runs AS (SELECT grp, COUNT(*) AS run FROM r GROUP BY grp), gs AS (SELECT COUNT(*) AS n_gap_runs, COALESCE(MAX(run), 0) AS max_gap_run FROM runs) SELECT (SELECT COUNT(*) FROM f) AS n_hours, (SELECT COUNT(*) FROM f WHERE n > 0) AS n_data_hours, (SELECT COUNT(*) FROM f WHERE n = 0) AS n_gap_hours, CAST(n_gap_runs AS BIGINT) AS n_gap_runs, CAST(max_gap_run AS BIGINT) AS max_gap_run FROM gs",
    "q123_tpch_q15" -> // aggregated view probed by a scalar MAX over itself;
      // DECIMAL-then-ROUND makes the `=` compare two identical doubles
      "WITH revenue AS (SELECT l_suppkey AS supplier_no, CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS total_revenue FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' GROUP BY l_suppkey) SELECT supplier_no, total_revenue FROM revenue WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue) ORDER BY supplier_no",
    "q124_tpch_q18" -> // IN over a HAVING-filtered aggregate -> left-semi;
      // total ORDER BY (qty DESC then unique orderkey) under the LIMIT
      "SELECT c.c_custkey, o.o_orderkey, CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_qty FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey JOIN lineitem l ON o.o_orderkey = l.l_orderkey WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 280) GROUP BY c.c_custkey, o.o_orderkey ORDER BY total_qty DESC, o.o_orderkey LIMIT 50",
    "q125_tpch_q22" -> // scalar AVG bound + NOT EXISTS anti-join; code is
      // derived (no phone col in the fixture) — plan shape is the point
      "SELECT c_nationkey % 10 AS code, COUNT(*) AS numcust, CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal FROM customer c WHERE c_nationkey % 10 IN (0, 1, 2, 3, 4, 5, 6) AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0 AND c_nationkey % 10 IN (0, 1, 2, 3, 4, 5, 6)) AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00') GROUP BY c_nationkey % 10 ORDER BY code",
    "q126_multi_distinct" -> // three DISTINCT aggregates beside COUNT(*):
      // the Expand-rewrite plan; distinct-mod domain value-bounded (<1000)
      "SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(DISTINCT o_orderpriority) AS n_prio, CAST(SUM(DISTINCT CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)) * 100, 0) AS BIGINT) % 1000) AS BIGINT) AS dist_mod_sum, COUNT(*) AS n FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    "q127_snapshot_diff" -> // full-outer reconciliation of two deterministic
      // snapshot slices; drift injected on 11Z so 'changed' is non-empty
      "WITH a AS (SELECT o_orderkey AS k, CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)) * 100, 0) AS BIGINT) AS ca FROM orders WHERE o_orderkey % 7 <> 0), b AS (SELECT o_orderkey AS k, CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)) * 100, 0) AS BIGINT) + CASE WHEN o_orderkey % 11 = 0 THEN 1000 ELSE 0 END AS cb FROM orders WHERE o_orderkey % 5 <> 0), j AS (SELECT COALESCE(a.k, b.k) AS k, ca, cb FROM a FULL JOIN b ON a.k = b.k), c AS (SELECT k, CASE WHEN ca IS NULL THEN 'added' WHEN cb IS NULL THEN 'removed' WHEN ca <> cb THEN 'changed' ELSE 'same' END AS status FROM j) SELECT status, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum FROM c GROUP BY status ORDER BY status",
    "q135_tpch_q13" -> // identical text on both engines: the correlated
      // scalar COUNT is what's under test (COUNT-bug decorrelation) —
      // both engines must produce the zero-order class
      "SELECT c_count, COUNT(*) AS custdist FROM (SELECT c.c_custkey, (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT') AS c_count FROM customer c) t GROUP BY c_count ORDER BY custdist DESC, c_count DESC",
    "q136_tpch_q16" -> // identical text on both engines: NOT IN (null-aware
      // anti join) + COUNT(DISTINCT) over join output; the excluded set is
      // derived (s_suppkey % 7) — non-empty at every SF (operator scaladoc)
      "SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt FROM part JOIN lineitem ON p_partkey = l_partkey WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'MEDIUM%' AND p_size IN (1, 4, 9, 16, 25, 36, 49) AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0) GROUP BY p_brand, p_type, p_size ORDER BY supplier_cnt DESC, p_brand, p_type, p_size",
    "q137_tpch_q19" -> // OR-of-ANDs mixing both join sides per disjunct;
      // DECIMAL-then-ROUND revenue (q123 discipline)
      "SELECT COUNT(*) AS n_items, CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue FROM lineitem JOIN part ON l_partkey = p_partkey WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11) OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20) OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)",
    "q138_tpch_q2" -> // identical text on both engines: the correlated
      // scalar MIN in a WHERE equality is what's under test (the
      // aggregate-join decorrelation with no COUNT bug); MIN compares
      // stored doubles — no arithmetic, exact cross-engine
      "SELECT p_partkey, p_brand, s_name, n_name, CAST(l_extendedprice AS DOUBLE) AS min_price FROM lineitem JOIN part ON p_partkey = l_partkey JOIN supplier ON s_suppkey = l_suppkey JOIN nation ON s_nationkey = n_nationkey WHERE p_size <= 5 AND l_extendedprice = (SELECT MIN(l2.l_extendedprice) FROM lineitem l2 WHERE l2.l_partkey = p_partkey) ORDER BY p_partkey, s_name",
    "q139_tpch_q11" -> // identical text on both engines: GROUP BY + HAVING
      // vs GLOBAL scalar aggregate subqueries (computed once, never
      // decorrelated into a join); above-average threshold spelled
      // multiplicatively in exact integer cents (operator scaladoc on why
      // not TPC-H's SF-bound fraction or a decimal division)
      "SELECT l_partkey, CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS part_cents FROM lineitem GROUP BY l_partkey HAVING SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) * CAST(l_quantity AS BIGINT)) * (SELECT COUNT(DISTINCT l_partkey) FROM lineitem) > (SELECT SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) * CAST(l_quantity AS BIGINT)) FROM lineitem) ORDER BY part_cents DESC, l_partkey",
    "q140_tpch_q8" -> // the 8-table galaxy join + share-of-group CASE
      // ratio; TIMESTAMP literal is the one dialect split (sparkDialect
      // carries the TIMESTAMP_NTZ twin, the q08 pattern); cents exact,
      // share a ratio of identical integers on both engines
      "SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year, CAST(SUM(CASE WHEN ns.n_name = 'NATION_3' THEN vc ELSE 0 END) AS BIGINT) AS nation_cents, CAST(SUM(vc) AS BIGINT) AS total_cents, ROUND(CAST(SUM(CASE WHEN ns.n_name = 'NATION_3' THEN vc ELSE 0 END) AS DOUBLE) / SUM(vc), 4) AS share FROM (SELECT l_orderkey, l_suppkey, l_partkey, CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * 100, 0) AS BIGINT) AS vc FROM lineitem) l JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO' JOIN orders ON o_orderkey = l_orderkey JOIN customer ON c_custkey = o_custkey JOIN nation nc ON nc.n_nationkey = c_nationkey JOIN region ON r_regionkey = nc.n_regionkey AND r_name = 'ASIA' JOIN supplier ON s_suppkey = l_suppkey JOIN nation ns ON ns.n_nationkey = s_nationkey WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY 1 ORDER BY 1",
    "q141_tpch_q9" -> // identical text on both engines: profit in exact
      // integer cents (revenue ROUND·100 minus ROUND(retail·100)·qty —
      // integer products, no decimal division); no timestamp literal, so
      // no dialect split; the join-order stress is the plan, not the text
      "SELECT n_name AS nation, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year, CAST(SUM(amount_cents) AS BIGINT) AS profit_cents FROM (SELECT l_orderkey, l_suppkey, CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * 100, 0) AS BIGINT) - CAST(ROUND(CAST(p_retailprice AS DECIMAL(12,2)) * 100, 0) AS BIGINT) * CAST(l_quantity AS BIGINT) AS amount_cents FROM lineitem JOIN part ON p_partkey = l_partkey WHERE p_name LIKE '%ol%') l JOIN supplier ON s_suppkey = l_suppkey JOIN nation ON n_nationkey = s_nationkey JOIN orders ON o_orderkey = l_orderkey GROUP BY 1, 2 ORDER BY nation, o_year",
    "q142_tpch_q12" -> // fact-fact join + complementary CASE counts;
      // TIMESTAMP literal is the one dialect split (sparkDialect carries
      // the TIMESTAMP_NTZ twin, the q08/q140 pattern); pure counts
      "SELECT l_returnflag, CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count FROM lineitem JOIN orders ON o_orderkey = l_orderkey WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' GROUP BY 1 ORDER BY 1",
    "q143_tpch_q4" -> // EXISTS with a non-equi correlated date predicate;
      // TIMESTAMP literals are the dialect split (sparkDialect twin);
      // INTERVAL 60 DAY parses identically on both engines; pure counts
      "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders o WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00' AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY) GROUP BY 1 ORDER BY 1",
    "q144_tpch_q6" -> // scan-filter-agg to one row; per-row DECIMAL
      // ROUND cents; discount band compares identical stored doubles
      "SELECT CAST(SUM(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2)) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents, COUNT(*) AS n FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24",
    "q145_tpch_q14" -> // global CASE-share ratio in exact cents; the
      // percentage a double ratio of identical ints (q140 discipline)
      "SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vc ELSE 0 END) AS BIGINT) AS promo_cents, CAST(SUM(vc) AS BIGINT) AS total_cents, ROUND(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vc ELSE 0 END) AS DOUBLE) * 100 / SUM(vc), 4) AS promo_pct FROM (SELECT l_partkey, CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * 100, 0) AS BIGINT) AS vc FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00') l JOIN part ON p_partkey = l_partkey",
    "q128_latest_per_key" -> // the oracle spells ROW_NUMBER()=1; the engine
      // lane is max(struct) partial-agg — same semantics, fewer shuffled
      // bytes (see the operator's scale note); µs truncation contract
      "WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id, event_type FROM events), r AS (SELECT user_id, t, event_id, event_type, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t DESC, event_id DESC) AS rn FROM e) SELECT user_id, t AS last_t_us, event_id AS last_event_id, event_type AS last_event_type FROM r WHERE rn = 1 ORDER BY user_id",
    // q49/q129 (r13, r12 verdict #2 — the golden set is gone): the sketch
    // ESTIMATES stay engine-internal, so the surface carries exact
    // companions + integer band + in-band boolean; DuckDB recomputes the
    // exact half and asserts the literals — SF-independent full hash gate
    "q49_approx_sketches" ->
      "SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS exact_nd, ROUND(quantile_cont(o_totalprice, 0.5), 2) AS exact_p50, COUNT(*) AS n, CAST(500 AS BIGINT) AS nd_band_bp, TRUE AS nd_ok, CAST(500 AS BIGINT) AS p50_band_bp, TRUE AS p50_ok FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
    "q129_hll_rollup" ->
      "WITH l AS (SELECT o_orderstatus, o_orderpriority FROM orders GROUP BY 1, 2), nl AS (SELECT o_orderstatus, COUNT(*) AS n_leaves FROM l GROUP BY 1), e AS (SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS exact_nd FROM orders GROUP BY 1) SELECT e.o_orderstatus, n_leaves, exact_nd, CAST(500 AS BIGINT) AS band_bp, TRUE AS within_band FROM e JOIN nl USING (o_orderstatus) ORDER BY o_orderstatus",
    // q146–q148 (r13 multimodal pillar): md5/substring over the SAME BYTES
    // both engines — documents is pure ASCII at every SF (octet_length ==
    // length, verified r13), so DuckDB's varchar md5/substring replays
    // Spark's binary payload ops exactly; sparkDialect carries the
    // CAST(text AS BINARY) twins
    "q146_payload_dedup" ->
      "WITH fp AS (SELECT source, doc_id, md5(text) AS fp, octet_length(encode(text)) AS nb FROM documents WHERE text IS NOT NULL), g AS (SELECT source, fp, MIN(doc_id) AS keeper, COUNT(*) AS copies, MIN(nb) AS nb FROM fp GROUP BY 1, 2) SELECT source, COUNT(*) AS n_unique, CAST(SUM(copies) AS BIGINT) AS n_total, CAST(SUM(copies) - COUNT(*) AS BIGINT) AS n_dupes, CAST(SUM(nb) AS BIGINT) AS bytes_unique, CAST(SUM(keeper) AS BIGINT) AS keeper_sum FROM g GROUP BY source ORDER BY source",
    "q147_frame_fingerprints" -> // 4 evenly-spaced 32-byte frames; stride
      // clamped to >=1 so the negative-division semantics split (trunc vs
      // floor) can never surface
      "WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS total FROM documents WHERE text IS NOT NULL), f AS (SELECT doc_id, i, substring(text, CAST(i * GREATEST((total - 32) // 3, 1) + 1 AS BIGINT), 32) AS frame FROM d, (SELECT unnest(range(0, 4)) AS i) ii) SELECT doc_id, CAST(i AS BIGINT) AS frame_idx, md5(frame) AS frame_md5, CAST(length(frame) AS BIGINT) AS frame_len FROM f ORDER BY doc_id, frame_idx",
    "q148_modality_mix" ->
      "WITH p AS (SELECT source, doc_id, octet_length(encode(text)) AS nb, ['image/png','audio/wav','video/mp4','text/plain'][CAST(doc_id % 4 AS INT) + 1] AS mime FROM documents WHERE text IS NOT NULL), g AS (SELECT source, mime, COUNT(*) AS n_docs, SUM(nb) AS bytes FROM p GROUP BY 1, 2), t AS (SELECT source, SUM(bytes) AS src_bytes FROM g GROUP BY 1), a AS (SELECT SUM(bytes) AS all_bytes FROM g) SELECT g.source, mime, n_docs, CAST(bytes AS BIGINT) AS total_bytes, CAST(bytes * 1000000 // src_bytes AS BIGINT) AS share_ppm, CAST(src_bytes * 1000000 // all_bytes AS BIGINT) AS src_weight_ppm FROM g JOIN t USING (source) CROSS JOIN a ORDER BY source, mime",
    "q149_decode_features" -> // the batched-decode stub's per-dim byte fold
      // replayed as an ORDERED list_reduce (left fold, bit-identical
      // before the round); unicode(char) = the byte on the ASCII fixture
      "WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND length(text) > 0), f AS (SELECT doc_id, j, list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_filter(range(1, length(text) + 1), i -> (i - 1) % 8 = j), i -> CAST(unicode(substr(text, CAST(i AS INT), 1)) AS DOUBLE) / 255.0)), (a, x) -> a + x) AS v FROM d, (SELECT unnest(range(0, 8)) AS j) jj) SELECT doc_id, CAST(j AS BIGINT) AS dim, ROUND(v, 4) AS v FROM f ORDER BY doc_id, dim",
    // q150 (r14): head-anchored frame fingerprints → (frame_idx, md5)
    // bands with the capped-bucket discipline → pairs sharing ≥2 frames →
    // min-label keeper clusters (cliques — the operator scaladoc's
    // contract; equal-head-bytes is an equivalence relation)
    "q150_frame_neardup" ->
      s"WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND octet_length(encode(text)) >= 128), f AS (SELECT doc_id, i, md5(substring(text, i * 32 + 1, 32)) AS fp FROM d, (SELECT unnest(range(0, 4)) AS i) ii), c AS (SELECT doc_id, i, fp FROM (SELECT doc_id, i, fp, COUNT(*) OVER (PARTITION BY i, fp) AS bn FROM f) t WHERE bn <= ${graft.operators.Multimodal.FrameBucketCap}), p AS (SELECT a.doc_id AS id1, b.doc_id AS id2 FROM c a JOIN c b ON a.i = b.i AND a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2 HAVING COUNT(*) >= 2), u AS (SELECT id1 AS doc_id, id2 AS nb FROM p UNION ALL SELECT id2, id1 FROM p), m AS (SELECT doc_id, LEAST(doc_id, MIN(nb)) AS cluster FROM u GROUP BY doc_id) SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members, CAST(SUM(doc_id) AS BIGINT) AS id_sum FROM m GROUP BY 1 ORDER BY 1",
    // q151 (r14, cap lifted r15): decode-stub features (the q149 fold) for
    // the FULL non-empty corpus AND fixed-budget stride-sampled centroids
    // (stride = max(1, (max_id+1)//64) — derived from the corpus, so C≈64
    // at every SF), then the BestCentroid argmax replayed as rank by
    // (left-assoc cosine DESC, cent_id) — the q48 discipline on decoded
    // media features; doubles bit-identical end to end
    "q151_decode_ivf" ->
      s"WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND length(text) > 0), st AS (SELECT GREATEST((MAX(doc_id) + 1) // 64, 1) AS stride FROM d), fv AS (SELECT doc_id, j, list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_filter(range(1, length(text) + 1), i -> (i - 1) % 8 = j), i -> CAST(unicode(substr(text, CAST(i AS INT), 1)) AS DOUBLE) / 255.0)), (a, x) -> a + x) AS x FROM d, (SELECT unnest(range(0, 8)) AS j) jj), f AS (SELECT doc_id, list(x ORDER BY j) AS v FROM fv GROUP BY doc_id), c AS (SELECT doc_id AS cent_id, v AS cv FROM f, st WHERE doc_id % stride = 0), sim AS (SELECT f.doc_id, c.cent_id, (${sqlDot("v", "cv", 8)}) / (SQRT(${sqlDot("v", "v", 8)}) * SQRT(${sqlDot("cv", "cv", 8)})) AS sim FROM f CROSS JOIN c) SELECT doc_id, cent_id AS cluster FROM (SELECT doc_id, cent_id, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sim DESC, cent_id) AS rk FROM sim) r WHERE rk = 1 ORDER BY doc_id",
    // q152 (r15): SemDeDup — the q48 assignment CTEs verbatim, then a
    // rank-capped member table carrying UNIT-NORMALIZED vectors (norm =
    // left-assoc index-order sum, matching VectorOps.norm's 0.0-seeded
    // fold), within-cluster pairwise ROUND(dot,4) — cosine of unit
    // vectors — thresholded at SemDupTau, min-id survivor verdict per
    // vector (dup_of COALESCEd to -1: NULL bigints hash-diverge
    // cross-engine, r01)
    "q152_semdedup" ->
      (s"WITH $sqlEmb, $sqlCentroids, $sqlAssign, " +
        "mem AS (SELECT vid, cluster, ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY vid) AS mrk FROM asg), " +
        s"mv AS (SELECT vid, cluster, list_transform(v, x -> x / nrm) AS vn FROM (SELECT m.vid, m.cluster, e.v, SQRT(${sqlDot("e.v", "e.v", 64)}) AS nrm FROM mem m JOIN e ON e.vec_id = m.vid WHERE m.mrk <= ${graft.operators.Dedup.SemMemberCap}) t), " +
        s"p AS (SELECT b.vid AS id2, a.vid AS id1, ROUND(${sqlDot("a.vn", "b.vn", 64)}, 4) AS sim FROM mv a JOIN mv b ON a.cluster = b.cluster AND a.vid < b.vid), " +
        s"dup AS (SELECT id2 AS vec_id, MIN(id1) AS dup_of FROM p WHERE sim >= ${graft.operators.Dedup.SemDupTau} GROUP BY 1) " +
        "SELECT m.vid AS vec_id, m.cluster, COALESCE(d.dup_of, -1) AS dup_of, d.vec_id IS NOT NULL AS is_dup " +
        "FROM mem m LEFT JOIN dup d ON d.vec_id = m.vid ORDER BY vec_id"),
  )
}
