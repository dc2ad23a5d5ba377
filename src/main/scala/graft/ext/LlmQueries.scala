package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-facing registry for the LLM-training-data operator surface
  * (north-star set): text analysis, retrieval (TF-IDF / BM25 / postings /
  * MMR), dedup (exact / MinHash-LSH / SimHash / fingerprint / winnowing /
  * CDC), data selection (DSIR), recall audits (LSH and IVF vs their exact
  * arms, nprobe sweep), similarity search (brute-force / LSH / IVF / PQ
  * ANN), multimodal decode plumbing, sketched distincts. All
  * oracle-checked (the HLL entry checks exact two-phase counts plus a
  * tolerance flag; the raw sketch value is asserted in NewOpsSpec).
  */
object LlmQueries {
  val registry: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "q_doc_text_stats" -> ((TextOps.qDocTextStats _, TextOps.qDocTextStatsSql)),
    "q_doc_repetition" -> ((TextOps.qDocRepetition _, TextOps.qDocRepetitionSql)),
    "q_doc_lang_quality" -> ((TextOps.qDocLangQuality _, TextOps.qDocLangQualitySql)),
    "q_doc_sample_stratified" -> ((TextOps.qDocSampleStratified _, TextOps.qDocSampleStratifiedSql)),
    "q_doc_sample_weighted" -> ((TextOps.qDocSampleWeighted _, TextOps.qDocSampleWeightedSql)),
    "q_doc_vocab" -> ((TextOps.qDocVocab _, TextOps.qDocVocabSql)),
    "q_doc_vocab_coverage" -> ((TextOps.qDocVocabCoverage _, TextOps.qDocVocabCoverageSql)),
    "q_doc_heavy_hitters" -> ((TextOps.qDocHeavyHitters _, TextOps.qDocHeavyHittersSql)),
    "q_doc_sim_join_prefix" -> ((Dedup.qDocSimJoinPrefix _, Dedup.qDocSimJoinPrefixSql)),
    "q_doc_containment" -> ((Dedup.qDocContainment _, Dedup.qDocContainmentSql)),
    "q_doc_bigram_lm" -> ((TextOps.qDocBigramLm _, TextOps.qDocBigramLmSql)),
    "q_doc_tfidf" -> ((TextOps.qDocTfidf _, TextOps.qDocTfidfSql)),
    "q_doc_postings" -> ((TextOps.qDocPostings _, TextOps.qDocPostingsSql)),
    "q_doc_bm25" -> ((TextOps.qDocBm25 _, TextOps.qDocBm25Sql)),
    "q_doc_exact_dedup" -> ((Dedup.qDocExactDedup _, Dedup.qDocExactDedupSql)),
    "q_doc_fingerprint" -> ((Dedup.qDocFingerprint _, Dedup.qDocFingerprintSql)),
    "q_doc_winnow" -> ((Dedup.qDocWinnow _, Dedup.qDocWinnowSql)),
    "q_doc_simhash" -> ((Dedup.qDocSimhash _, Dedup.qDocSimhashSql)),
    "q_doc_minhash_pairs" -> ((Dedup.qDocMinhashPairs _, Dedup.qDocMinhashPairsSql)),
    "q_doc_minhash_eval" -> ((Dedup.qDocMinhashEval _, Dedup.qDocMinhashEvalSql)),
    "q_doc_dup_clusters" -> ((Dedup.qDocDupClusters _, Dedup.qDocDupClustersSql)),
    "q_doc_split_leakfree" -> ((Dedup.qDocSplitLeakfree _, Dedup.qDocSplitLeakfreeSql)),
    "q_doc_cluster_reps" -> ((Dedup.qDocClusterReps _, Dedup.qDocClusterRepsSql)),
    "q_doc_curate" -> ((Dedup.qDocCurate _, Dedup.qDocCurateSql)),
    "q_doc_decontam" -> ((Dedup.qDocDecontam _, Dedup.qDocDecontamSql)),
    "q_doc_pack" -> ((TextOps.qDocPack _, TextOps.qDocPackSql)),
    "q_doc_redact" -> ((TextOps.qDocRedact _, TextOps.qDocRedactSql)),
    "q_doc_passage_dedup" -> ((CorpusOps.qDocPassageDedup _, CorpusOps.qDocPassageDedupSql)),
    "q_doc_split" -> ((CorpusOps.qDocSplit _, CorpusOps.qDocSplitSql)),
    "q_doc_normalize" -> ((CorpusOps.qDocNormalize _, CorpusOps.qDocNormalizeSql)),
    "q_doc_source_mix" -> ((CorpusOps.qDocSourceMix _, CorpusOps.qDocSourceMixSql)),
    "q_doc_jsonl_roundtrip" -> ((CorpusOps.qDocJsonlRoundtrip _, CorpusOps.qDocJsonlRoundtripSql)),
    "q_doc_chunk" -> ((CorpusOps.qDocChunk _, CorpusOps.qDocChunkSql)),
    "q_doc_oov" -> ((CorpusOps.qDocOov _, CorpusOps.qDocOovSql)),
    "q_doc_length_buckets" -> ((CorpusOps.qDocLengthBuckets _, CorpusOps.qDocLengthBucketsSql)),
    "q_doc_lang_mix_temp" -> ((CorpusOps.qDocLangMixTemp _, CorpusOps.qDocLangMixTempSql)),
    "q_doc_source_cap" -> ((CorpusOps.qDocSourceCap _, CorpusOps.qDocSourceCapSql)),
    "q_doc_dsir_weights" -> ((CorpusOps.qDocDsirWeights _, CorpusOps.qDocDsirWeightsSql)),
    "q_doc_cdc_savings" -> ((CorpusOps.qDocCdcSavings _, CorpusOps.qDocCdcSavingsSql)),
    "q_emb_cosine_topk" -> ((Similarity.qEmbCosineTopk _, Similarity.qEmbCosineTopkSql)),
    "q_emb_hard_negatives" -> ((Similarity.qEmbHardNegatives _, Similarity.qEmbHardNegativesSql)),
    "q_emb_ann_lsh" -> ((Similarity.qEmbAnnLsh _, Similarity.qEmbAnnLshSql)),
    "q_emb_near_dup" -> ((Similarity.qEmbNearDup _, Similarity.qEmbNearDupSql)),
    "q_emb_label_centroids" -> ((Similarity.qEmbLabelCentroids _, Similarity.qEmbLabelCentroidsSql)),
    "q_emb_label_separation" -> ((Similarity.qEmbLabelSeparation _, Similarity.qEmbLabelSeparationSql)),
    "q_emb_ann_ivf" -> ((Similarity.qEmbAnnIvf _, Similarity.qEmbAnnIvfSql)),
    "q_emb_ann_recall" -> ((Similarity.qEmbAnnRecall _, Similarity.qEmbAnnRecallSql)),
    "q_emb_mmr" -> ((Similarity.qEmbMmr _, Similarity.qEmbMmrSql)),
    "q_emb_ann_nprobe_sweep" -> ((Similarity.qEmbAnnNprobeSweep _, Similarity.qEmbAnnNprobeSweepSql)),
    "q_emb_kmeans_iter" -> ((Similarity.qEmbKmeansIter _, Similarity.qEmbKmeansIterSql)),
    "q_emb_quantize" -> ((Similarity.qEmbQuantize _, Similarity.qEmbQuantizeSql)),
    "q_emb_pq_adc" -> ((Similarity.qEmbPqAdc _, Similarity.qEmbPqAdcSql)),
    "q_emb_semdedup" -> ((Similarity.qEmbSemDedup _, Similarity.qEmbSemDedupSql)),
    "q_emb_rproj" -> ((Similarity.qEmbRproj _, Similarity.qEmbRprojSql)),
    "q_emb_retrieval_eval" -> ((Similarity.qEmbRetrievalEval _, Similarity.qEmbRetrievalEvalSql)),
    "q_emb_dim_stats" -> ((Similarity.qEmbDimStats _, Similarity.qEmbDimStatsSql)),
    "q_doc_incr_dedup" -> ((Dedup.qDocIncrDedup _, Dedup.qDocIncrDedupSql)),
    "q_mm_decode" -> ((Multimodal.qMmDecode _, Multimodal.qMmDecodeSql)),
    "q_mm_resize_sample" -> ((Multimodal.qMmResizeSample _, Multimodal.qMmResizeSampleSql)),
    "q_mm_sample_assembly" -> ((Multimodal.qMmSampleAssembly _, Multimodal.qMmSampleAssemblySql)),
    "q_mm_phash_dedup" -> ((Multimodal.qMmPhashDedup _, Multimodal.qMmPhashDedupSql)),
    "q_approx_distinct" -> ((Similarity.qApproxDistinct _, Similarity.qApproxDistinctSql)),
    "q_doc_zipf" -> ((TextOps.qDocZipf _, TextOps.qDocZipfSql)),
    "q_doc_heaps" -> ((TextOps.qDocHeaps _, TextOps.qDocHeapsSql)),
    "q_doc_bpe_pairs" -> ((TextOps.qDocBpePairs _, TextOps.qDocBpePairsSql)),
    "q_doc_dupspans" -> ((Dedup.qDocDupSpans _, Dedup.qDocDupSpansSql)),
    "q_emb_matryoshka" -> ((Similarity.qEmbMatryoshka _, Similarity.qEmbMatryoshkaSql)),
    "q_doc_perplexity" -> ((TextOps.qDocPerplexity _, TextOps.qDocPerplexitySql)),
    "q_doc_ngram_novelty" -> ((TextOps.qDocNgramNovelty _, TextOps.qDocNgramNoveltySql)),
    "q_emb_knn_classify" -> ((Similarity.qEmbKnnClassify _, Similarity.qEmbKnnClassifySql)),
    "q_doc_loo_influence" -> ((TextOps.qDocLooInfluence _, TextOps.qDocLooInfluenceSql)),
    "q_doc_source_overlap" -> ((TextOps.qDocSourceOverlap _, TextOps.qDocSourceOverlapSql)),
    "q_doc_phrase_search" -> ((TextOps.qDocPhraseSearch _, TextOps.qDocPhraseSearchSql)),
    "q_emb_knn_confusion" -> ((Similarity.qEmbKnnConfusion _, Similarity.qEmbKnnConfusionSql)),
    "q_emb_gram" -> ((Similarity.qEmbGram _, Similarity.qEmbGramSql)),
    "q_doc_dedup_ensemble" -> ((Dedup.qDocDedupEnsemble _, Dedup.qDocDedupEnsembleSql)),
    "q_emb_power_iter" -> ((Similarity.qEmbPowerIter _, Similarity.qEmbPowerIterSql))
  )
}
