"""Empty-corpus sweep: every round-3 operator must run to completion on a
zero-row documents/embeddings pair and produce a typed empty (or
identity-trivial) result — the degenerate input every 100 TB run
eventually feeds some shard of (a filtered-out partition, a new tenant).

Known platform trap this guards (CLAUDE.md): to_pandas() of a fully-empty
Dataset returns ZERO columns, and Ray 2.49's hash shuffle dies on an
empty-first-block race unless inputs carry sentinel rows — the ops under
test own those guards; the sweep proves them end-to-end.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("emptysf"))
    docs = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
        }
    )
    pq.write_table(docs, f"{d}/documents.parquet")
    emb = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
            "label": pa.array([], pa.int32()),
        }
    )
    pq.write_table(emb, f"{d}/embeddings.parquet")
    return d


NEW_QUERIES = [
    "q_doc_tokens_bpe",
    "q_media_dims",
    "q_media_dedup",
    "q_ann_range",
    "q_chunk_dedup",
    "q_embed_dedup_clusters",
    "q_doc_sample_weighted",
    "q_decontaminate",
    "q_dedup_minhash",
    "q_dedup_ngram",
    "q_dedup_ngram_clusters",
    "q_dedup_ngram_incremental",
    "q_dedup_ngram_incremental_resume",
    "q_dedup_cluster_sizes",
    "q_embed_ivf_balance",
    "q_embed_dedup_incremental",
    "q_doc_gopher_flags",
    "q_source_quality_report",
    "q_doc_rank",
    "q_ann_topk",
    "q_ann_lsh",
    "q_ann_ivf",
    "q_ann_ivfpq",
    "q_embed_outliers",
    "q_ann_ivfpq_incremental",
    "q_ann_recall",
    "q_embed_covariance",
    "q_token_fertility",
    "q_token_vocab_growth",
    "q_embed_neardup",
    "q_embed_neardup_lsh",
    "q_embed_quantize",
    "q_doc_tfidf",
    "q_token_heavy",
    "q_doc_lm_score",
    "q_para_dedup",
    "q_doc_split",
    "q_token_pmi",
    "q_dedup_bloom",
    "q_embed_kmeans",
    "q_token_cms",
    "q_doc_overlap",
    "q_source_divergence",
    "q_doc_importance",
    "q_source_diversity",
    "q_corpus_diff",
    "q_lang_confusion",
    "q_source_dup_matrix",
    "q_pii_density",
    "q_embed_dim_stats",
    "q_media_corrupt_report",
]


# report-shaped queries whose row universe is a CONSTANT (not the corpus):
# on an empty corpus they emit their full fixed report, matching their
# oracle's generate_series row set
CONSTANT_ROWS = {"q_embed_ivf_balance": 16}


@pytest.mark.parametrize("qname", NEW_QUERIES)
def test_empty_corpus_runs_clean(ray_session, empty_sf, qname):
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import registry

    import ray.data

    res = registry.queries()[qname](empty_sf)
    # Dataset or DataFrame/Table; count rows without assuming to_pandas
    # keeps columns on an all-empty Dataset
    n = res.count() if isinstance(res, ray.data.Dataset) else len(res)
    assert n == CONSTANT_ROWS.get(qname, 0)
