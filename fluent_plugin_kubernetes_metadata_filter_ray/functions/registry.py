"""Registry of the training-data operator queries (dedup, similarity, text
analysis, multimodal).  Keys without an oracle entry are approximate /
non-SQL-expressible ops (the driver records the weaker rows-only check; the
test suite asserts their semantics instead — e.g. LSH-ANN recall)."""

from __future__ import annotations

from . import curation, dedup, joins, multimodal, sampling, simsearch, textstats


def queries() -> dict:
    return {
        "q_doc_stats": textstats.q_doc_stats,
        "q_doc_fingerprint": textstats.q_doc_fingerprint,
        "q_token_freq": textstats.q_token_freq,
        "q_doc_normalize": textstats.q_doc_normalize,
        "q_doc_lm_score": textstats.q_doc_lm_score,
        "q_token_heavy": textstats.q_token_heavy,
        "q_corpus_summary": textstats.q_corpus_summary,
        "q_doc_sample": sampling.q_doc_sample,
        "q_top_docs_per_source": sampling.q_top_docs_per_source,
        "q_source_mix": sampling.q_source_mix,
        "q_doc_sample_stratified": sampling.q_doc_sample_stratified,
        "q_doc_quality_filter": sampling.q_doc_quality_filter,
        "q_dedup_exact": dedup.q_dedup_exact,
        "q_dedup_incremental": dedup.q_dedup_incremental,
        "q_dedup_incremental_fuzzy": dedup.q_dedup_incremental_fuzzy,
        "q_dedup_minhash": dedup.q_dedup_minhash,
        "q_dedup_simhash": dedup.q_dedup_simhash,
        "q_dedup_clusters": dedup.q_dedup_clusters,
        "q_ann_topk": simsearch.q_ann_topk,
        "q_embed_neardup": simsearch.q_embed_neardup,
        "q_embed_neardup_lsh": simsearch.q_embed_neardup_lsh,
        "q_embed_centroids": simsearch.q_embed_centroids,
        "q_ann_lsh": simsearch.q_ann_lsh,
        "q_ann_ivf": simsearch.q_ann_ivf,
        "q_media_decode": multimodal.q_media_decode,
        "q_media_dims": multimodal.q_media_dims,
        "q_doc_embed_join": joins.q_doc_embed_join,
        "q_turn_snapshot_asof": joins.q_turn_snapshot_asof,
        "q_doc_repetition": curation.q_doc_repetition,
        "q_decontaminate": curation.q_decontaminate,
        "q_doc_pack": curation.q_doc_pack,
        "q_doc_tfidf": curation.q_doc_tfidf,
        "q_doc_rank": curation.q_doc_rank,
        "q_doc_chunks": curation.q_doc_chunks,
        "q_source_overlap": curation.q_source_overlap,
        "q_embed_quantize": simsearch.q_embed_quantize,
        "q_ann_range": simsearch.q_ann_range,
        "q_chunk_dedup": curation.q_chunk_dedup,
        "q_embed_dedup_clusters": simsearch.q_embed_dedup_clusters,
        "q_doc_sample_weighted": sampling.q_doc_sample_weighted,
    }


def oracle_sql() -> dict:
    return {
        "q_doc_stats": textstats.doc_stats_oracle_sql(),
        "q_doc_fingerprint": textstats.doc_fingerprint_oracle_sql(),
        "q_token_freq": textstats.token_freq_oracle_sql(),
        "q_doc_normalize": textstats.doc_normalize_oracle_sql(),
        "q_doc_lm_score": textstats.doc_lm_score_oracle_sql(),
        "q_token_heavy": textstats.token_heavy_oracle_sql(),
        "q_corpus_summary": textstats.corpus_summary_oracle_sql(),
        "q_doc_sample": sampling.doc_sample_oracle_sql(),
        "q_top_docs_per_source": sampling.top_docs_per_source_oracle_sql(),
        "q_source_mix": sampling.source_mix_oracle_sql(),
        "q_doc_sample_stratified": sampling.doc_sample_stratified_oracle_sql(),
        "q_doc_quality_filter": sampling.doc_quality_filter_oracle_sql(),
        "q_dedup_exact": dedup.dedup_exact_oracle_sql(),
        "q_dedup_incremental": dedup.dedup_incremental_oracle_sql(),
        "q_dedup_incremental_fuzzy": dedup.dedup_incremental_fuzzy_oracle_sql(),
        "q_dedup_minhash": dedup.dedup_minhash_oracle_sql(),
        "q_dedup_simhash": dedup.dedup_simhash_oracle_sql(),
        "q_dedup_clusters": dedup.dedup_clusters_oracle_sql(),
        "q_ann_topk": simsearch.ann_topk_oracle_sql(),
        "q_embed_neardup": simsearch.embed_neardup_oracle_sql(),
        "q_embed_neardup_lsh": simsearch.embed_neardup_lsh_oracle_sql(),
        "q_embed_centroids": simsearch.embed_centroids_oracle_sql(),
        # approximate ANN, but fully deterministic (md5 grids + integer-
        # quantized bucket decisions) ⇒ exact twins since round 2
        "q_ann_lsh": simsearch.ann_lsh_oracle_sql(),
        "q_ann_ivf": simsearch.ann_ivf_oracle_sql(),
        "q_media_decode": multimodal.media_decode_oracle_sql(),
        "q_media_dims": multimodal.media_dims_oracle_sql(),
        "q_doc_embed_join": joins.doc_embed_join_oracle_sql(),
        "q_turn_snapshot_asof": joins.turn_snapshot_asof_oracle_sql(),
        "q_doc_repetition": curation.doc_repetition_oracle_sql(),
        "q_decontaminate": curation.decontaminate_oracle_sql(),
        "q_doc_pack": curation.doc_pack_oracle_sql(),
        "q_doc_tfidf": curation.doc_tfidf_oracle_sql(),
        "q_doc_rank": curation.doc_rank_oracle_sql(),
        "q_doc_chunks": curation.doc_chunks_oracle_sql(),
        "q_source_overlap": curation.source_overlap_oracle_sql(),
        "q_embed_quantize": simsearch.embed_quantize_oracle_sql(),
        "q_ann_range": simsearch.ann_range_oracle_sql(),
        "q_chunk_dedup": curation.chunk_dedup_oracle_sql(),
        "q_embed_dedup_clusters": simsearch.embed_dedup_clusters_oracle_sql(),
        "q_doc_sample_weighted": sampling.doc_sample_weighted_oracle_sql(),
    }
