"""Training-data operators (dedup / similarity / text analysis / multimodal)
vs their DuckDB oracles at sf0.001 — same comparison shape as the driver's
correctness gate."""

import pandas as pd
import pytest


SORT_KEYS = {
    "q_doc_stats": ["doc_id"],
    "q_doc_tokens_bpe": ["doc_id"],
    "q_doc_fingerprint": ["doc_id"],
    "q_token_freq": ["token"],
    "q_token_heavy": ["token"],
    "q_corpus_summary": ["n_docs"],
    "q_doc_normalize": ["doc_id"],
    "q_doc_lm_score": ["doc_id"],
    "q_doc_sample": ["doc_id"],
    "q_doc_sample_stratified": ["source", "doc_id"],
    "q_doc_quality_filter": ["doc_id"],
    "q_doc_gopher_flags": ["doc_id"],
    "q_source_quality_report": ["source"],
    "q_dedup_exact": ["text_hash"],
    "q_dedup_incremental": ["doc_id"],
    "q_dedup_incremental_fuzzy": ["doc_id"],
    "q_dedup_minhash": ["doc_a", "doc_b"],
    "q_dedup_ngram": ["doc_a", "doc_b"],
    "q_dedup_ngram_clusters": ["doc_id"],
    "q_dedup_ngram_incremental": ["doc_id"],
    "q_dedup_ngram_incremental_resume": ["doc_id"],
    "q_dedup_cluster_sizes": ["cluster_size"],
    "q_embed_ivf_balance": ["bucket"],
    "q_embed_dedup_incremental": ["vec_id"],
    "q_dedup_simhash": ["doc_a", "doc_b"],
    "q_dedup_clusters": ["doc_id"],
    "q_ann_topk": ["query_id", "rank"],
    "q_ann_lsh": ["query_id", "rank"],
    "q_ann_ivf": ["query_id", "rank"],
    "q_ann_ivfpq": ["query_id", "rank"],
    "q_embed_outliers": ["rank"],
    "q_ann_ivfpq_incremental": ["query_id", "rank"],
    "q_ann_recall": ["query_id"],
    "q_embed_covariance": ["dim_i", "dim_j"],
    "q_token_fertility": ["lang"],
    "q_token_vocab_growth": ["bucket"],
    "q_embed_neardup": ["vec_a", "vec_b"],
    "q_embed_centroids": ["label", "dim"],
    "q_embed_neardup_lsh": ["vec_a", "vec_b"],
    "q_media_decode": ["doc_id"],
    "q_media_dims": ["doc_id"],
    "q_media_dedup": ["media_type", "payload_hash"],
    "q_ann_range": ["query_id", "vec_id"],
    "q_chunk_dedup": ["chunk_hash"],
    "q_embed_dedup_clusters": ["vec_id"],
    "q_doc_sample_weighted": ["doc_id"],
    "q_doc_embed_join": ["doc_id"],
    "q_turn_snapshot_asof": ["conv_id", "turn_idx"],
    "q_doc_repetition": ["doc_id"],
    "q_decontaminate": ["doc_id"],
    "q_doc_pack": ["doc_id"],
    "q_doc_tfidf": ["doc_id", "rnk"],
    "q_doc_rank": ["doc_rank"],
    "q_para_dedup": ["doc_id"],
    "q_doc_split": ["doc_id"],
    "q_token_pmi": ["bigram"],
    "q_dedup_bloom": ["doc_id"],
    "q_embed_kmeans": ["vec_id"],
    "q_token_cms": ["token"],
    "q_doc_overlap": ["doc_id"],
    "q_source_divergence": ["source"],
    "q_doc_importance": ["doc_id"],
    "q_source_diversity": ["source"],
    "q_corpus_diff": ["source"],
    "q_lang_confusion": ["lang", "lang_pred"],
    "q_source_dup_matrix": ["source_a", "source_b"],
    "q_pii_density": ["source", "pattern"],
    "q_embed_dim_stats": ["dim"],
    "q_media_corrupt_report": ["fmt"],
}


@pytest.mark.parametrize("qname", sorted(SORT_KEYS))
def test_function_matches_oracle(ray_session, sf_dir, duck, qname):
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import registry

    key = SORT_KEYS[qname]
    a = registry.queries()[qname](sf_dir)
    if not isinstance(a, pd.DataFrame):  # Dataset / pyarrow.Table
        a = a.to_pandas()
    a = a.sort_values(key, kind="mergesort").reset_index(drop=True)
    b = duck.execute(registry.oracle_sql()[qname]).fetchdf()
    b = b.sort_values(key, kind="mergesort").reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        am, bm = a[c].fillna("@").astype(str), b[c].fillna("@").astype(str)
        bad = am != bm
        assert not bad.any(), (
            f"{qname}.{c}: {bad.sum()} mismatches, "
            f"{a[c][bad].head(3).tolist()} vs {b[c][bad].head(3).tolist()}"
        )


def test_dedup_finds_planted_duplicates(ray_session, sf_dir, duck):
    """The augmented corpus plants near-dup copies (doc_id+1e6, first token
    dropped) and exact copies (doc_id+2e6): exact dedup must collapse the
    exact copies; minhash must pair each near-dup copy with its original."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import corpus as cp
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import dedup as dd

    n_docs = duck.execute("SELECT count(*), count(CASE WHEN doc_id % 5 = 0 THEN 1 END),"
                          " count(CASE WHEN doc_id % 7 = 0 THEN 1 END) FROM documents").fetchone()
    total, n_near, n_exact = n_docs

    ex = dd.q_dedup_exact(sf_dir).to_pandas()
    assert len(ex) == total + n_near  # exact copies collapsed into originals
    assert (ex["n_dups"] == 2).sum() == n_exact
    collapsed = ex[ex["n_dups"] == 2]
    assert (collapsed["doc_id"] < cp.AUG_OFFSET).all()  # min doc_id kept

    mh = dd.q_dedup_minhash(sf_dir).to_pandas()
    pairs = set(map(tuple, mh[["doc_a", "doc_b"]].values))
    planted = {(d, d + cp.AUG_OFFSET) for d in range(0, total, cp.AUG_MOD)}
    # LSH at jaccard≈0.95 catches essentially every planted (orig, copy) pair
    assert len(pairs & planted) >= int(0.9 * n_near)
    assert (mh["jaccard"] >= 0.5).all()


def test_ann_lsh_plumbing_and_recall(ray_session, sf_dir, duck):
    """LSH-ANN is approximate vs brute force (its EXACT behavior is oracle-
    checked above): assert output shape, determinism, and multi-probe
    recall of the brute-force top-k."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import simsearch as ss

    lsh = ss.q_ann_lsh(sf_dir).to_pandas()
    assert list(lsh.columns) == ["query_id", "vec_id", "rank", "cos_sim"]
    assert lsh["query_id"].nunique() <= ss.N_QUERIES
    assert lsh.groupby("query_id")["rank"].max().le(ss.TOPK_K).all()

    bf = duck.execute(ss.ann_topk_oracle_sql()).fetchdf()
    got = set(map(tuple, lsh[["query_id", "vec_id"]].values))
    want = set(map(tuple, bf[["query_id", "vec_id"]].values))
    recall = len(got & want) / len(want)
    assert recall >= 0.3  # Hamming<=1 multi-probe: measured 0.50 at sf0.001

    lsh2 = ss.q_ann_lsh(sf_dir).to_pandas()
    pd.testing.assert_frame_equal(
        lsh.sort_values(["query_id", "rank"]).reset_index(drop=True),
        lsh2.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_lsh_planes_size_driven_and_buckets_bounded(ray_session, sf_dir):
    """Round-1 VERDICT: plane count must grow with the corpus so no bucket
    materializes N/2^P >> target rows."""
    import numpy as np
    import pyarrow.parquet as pq

    from fluent_plugin_kubernetes_metadata_filter_ray.functions import simsearch as ss

    t = ss.LSH_TARGET_BUCKET_ROWS
    for n in (1, 100, 10_000, 1_000_000, 10**12):
        p = ss.n_planes_for(n)
        assert ss.LSH_MIN_PLANES <= p <= ss.LSH_MAX_PLANES
        # buckets hold <= target expected rows (until the P cap kicks in)
        if p < ss.LSH_MAX_PLANES:
            assert (1 << p) * t >= n
        if p > ss.LSH_MIN_PLANES:
            assert (1 << (p - 1)) * t < n  # and P is the smallest such

    # empirical bound on the actual corpus: no bucket more than 4x target
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids, m = ss._matrix(tbl)
    planes = ss._md5_grid(ss.n_planes_for(len(ids)), m.shape[1], "plane")
    q = ss._qdots(m, planes)
    buckets = ((q > 0).astype(np.int64) << np.arange(planes.shape[0])).sum(axis=1)
    assert np.bincount(buckets).max() <= 4 * t


def test_ann_ivf_trained_codebook(ray_session, sf_dir, duck):
    """The production IVF path: offline spherical-k-means codebook passed
    into q_ann_ivf.  Better recall than the hash codebook, deterministic."""
    import pyarrow.parquet as pq

    from fluent_plugin_kubernetes_metadata_filter_ray.functions import simsearch as ss

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    _, m = ss._matrix(t)
    cb = ss.train_centroids(m[:256])
    ivf = ss.q_ann_ivf(sf_dir, codebook=cb).to_pandas()
    assert list(ivf.columns) == ["query_id", "vec_id", "rank", "cos_sim"]
    bf = duck.execute(ss.ann_topk_oracle_sql()).fetchdf()
    got = set(map(tuple, ivf[["query_id", "vec_id"]].values))
    want = set(map(tuple, bf[["query_id", "vec_id"]].values))
    assert len(got & want) / len(want) >= 0.4  # measured 0.65

    ivf2 = ss.q_ann_ivf(sf_dir, codebook=ss.train_centroids(m[:256])).to_pandas()
    pd.testing.assert_frame_equal(
        ivf.sort_values(["query_id", "rank"]).reset_index(drop=True),
        ivf2.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_ann_ivf_recall(ray_session, sf_dir, duck):
    """IVF with nprobe=4/16 centroids on near-uniform vectors: assert
    plumbing + better-than-random recall and determinism."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import simsearch as ss

    ivf = ss.q_ann_ivf(sf_dir).to_pandas()
    assert list(ivf.columns) == ["query_id", "vec_id", "rank", "cos_sim"]
    bf = duck.execute(ss.ann_topk_oracle_sql()).fetchdf()
    got = set(map(tuple, ivf[["query_id", "vec_id"]].values))
    want = set(map(tuple, bf[["query_id", "vec_id"]].values))
    recall = len(got & want) / len(want)
    # nprobe/centroids = 1/4 of the space; measured 0.51 at sf0.001
    assert recall >= 0.25, recall

    ivf2 = ss.q_ann_ivf(sf_dir).to_pandas()
    pd.testing.assert_frame_equal(
        ivf.sort_values(["query_id", "rank"]).reset_index(drop=True),
        ivf2.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_media_real_codec_stub_raises(ray_session):
    from fluent_plugin_kubernetes_metadata_filter_ray.functions.multimodal import MediaDecoder

    with pytest.raises(NotImplementedError, match="codec"):
        MediaDecoder(use_real_codecs=True)


def test_curation_semantics(ray_session, sf_dir):
    """Beyond oracle equality: the curation ops' invariants hold — both
    repetition classes exist, eval docs are excluded from decontamination
    output, packing offsets are gapless per source, tfidf ranks are dense."""
    import numpy as np

    from fluent_plugin_kubernetes_metadata_filter_ray.functions import curation as cu

    rep = cu.q_doc_repetition(sf_dir).to_pandas()
    assert 0 < rep["is_repetitive"].sum() < len(rep)
    assert rep["top_bigram_frac"].between(0, 1).all()
    assert rep["dup_trigram_frac"].between(0, 1).all()

    dec = cu.q_decontaminate(sf_dir).to_pandas()
    assert (dec["doc_id"] % cu.EVAL_MOD != 0).all()  # eval rows excluded
    assert 0 < dec["contaminated"].sum() < len(dec)  # both classes
    assert (dec["n_eval_hits"] <= dec["n_shingles"]).all()

    pk = cu.q_doc_pack(sf_dir).to_pandas()
    for _, g in pk.groupby("source"):
        g = g.sort_values("doc_id")
        off = g["pack_offset"].to_numpy()
        n = g["n_tokens"].to_numpy()
        assert off[0] == 0 and (off[1:] == off[:-1] + n[:-1]).all()  # gapless
        assert (np.diff(g["pack_chunk"].to_numpy()) >= 0).all()  # monotone

    tfidf = cu.q_doc_tfidf(sf_dir).to_pandas()
    per_doc = tfidf.groupby("doc_id")["rnk"].agg(["min", "max", "count"])
    assert (per_doc["min"] == 1).all()
    assert (per_doc["max"] == per_doc["count"]).all()  # dense 1..k
    assert (per_doc["max"] <= cu.TFIDF_TOPK).all()


def test_embed_neardup_lsh_subset_and_recall(ray_session, sf_dir, duck):
    """The banded-LSH near-dup is a strict SUBSET of the exact all-pairs op
    (it can only miss pairs, never invent them) with useful recall."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import simsearch as ss

    lsh = ss.q_embed_neardup_lsh(sf_dir).to_pandas()
    exact = duck.execute(ss.embed_neardup_oracle_sql()).fetchdf()
    lsh_pairs = set(map(tuple, lsh[["vec_a", "vec_b"]].values))
    exact_pairs = set(map(tuple, exact[["vec_a", "vec_b"]].values))
    assert lsh_pairs <= exact_pairs
    assert len(lsh_pairs) / len(exact_pairs) >= 0.3  # measured 0.5 at sf0.001
    # scores agree with the exact op on the surfaced pairs
    merged = lsh.merge(exact, on=["vec_a", "vec_b"], suffixes=("_l", "_e"))
    assert (merged["cos_sim_l"].round(6) == merged["cos_sim_e"].round(6)).all()


def test_decontaminate_semijoin_matches_broadcast(ray_session, sf_dir, duck, monkeypatch):
    """VERDICT r2: the decontamination broadcast must be bounded.  Forcing
    the budget below the eval-hash count activates the distributed hash
    semi-join, which must be row/value-identical to both the broadcast
    path and the DuckDB oracle (no driver collect of hashes happens by
    construction on this path)."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import curation

    def run():
        return (
            curation.q_decontaminate(sf_dir)
            .to_pandas()
            .sort_values("doc_id", kind="mergesort")
            .reset_index(drop=True)
        )

    broadcast = run()
    monkeypatch.setenv("KMETA_DECON_BROADCAST_MAX", "-1")
    semijoin = run()
    pd.testing.assert_frame_equal(semijoin, broadcast, check_dtype=True)

    oracle = (
        duck.execute(curation.decontaminate_oracle_sql())
        .fetchdf()
        .sort_values("doc_id", kind="mergesort")
        .reset_index(drop=True)
    )
    assert list(semijoin.columns) == list(oracle.columns)
    for c in semijoin.columns:
        assert (
            semijoin[c].fillna("@").astype(str) == oracle[c].fillna("@").astype(str)
        ).all(), c


def test_para_dedup_removes_repeated_paragraphs(ray_session, tmp_path):
    """A doc whose text is an exact copy of an earlier doc keeps ZERO
    paragraphs (clean_hash NULL); the first occurrence keeps everything;
    an unrelated doc is untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fluent_plugin_kubernetes_metadata_filter_ray.functions import curation

    d = str(tmp_path)
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([text, text, "unrelated words only here"], pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["s"] * 3, pa.string()),
            "n_chars": pa.array([len(text), len(text), 25], pa.int64()),
        }
    )
    pq.write_table(docs, f"{d}/documents.parquet")
    out = (
        curation.q_para_dedup(d)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_kept"] == out.loc[1, "n_chunks"]
    assert out.loc[2, "n_kept"] == 0 and pd.isna(out.loc[2, "clean_hash"])
    assert out.loc[3, "n_kept"] == out.loc[3, "n_chunks"]
    assert out.loc[1, "n_chunks"] == out.loc[2, "n_chunks"]


def test_bloom_never_misses_true_duplicates(ray_session, sf_dir, duck):
    """Bloom membership has NO false negatives: every new-split doc whose
    exact text hash exists in the reference split must be bloom_hit; the
    false-positive rate of the 16 KiB filter stays small on this corpus."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import dedup as dd

    bloom = dd.q_dedup_bloom(sf_dir).to_pandas()
    exact = duck.execute(dd.dedup_incremental_oracle_sql()).fetchdf()
    merged = bloom.merge(exact[["doc_id", "is_novel"]], on="doc_id")
    assert len(merged) == len(bloom)
    true_dups = merged[~merged["is_novel"]]
    assert len(true_dups) > 0  # augmented corpus plants cross-split copies
    assert true_dups["bloom_hit"].all()
    novel = merged[merged["is_novel"]]
    assert novel["bloom_hit"].mean() < 0.05


def test_kmeans_lloyd_monotone_and_deterministic(ray_session, sf_dir):
    """Lloyd monotonicity: within-cluster sum of squares after the learned
    updates is no worse than under the md5-grid init; the final assignment
    is deterministic across runs and in range."""
    import numpy as np
    import pyarrow.parquet as pq

    from fluent_plugin_kubernetes_metadata_filter_ray.functions import simsearch as ss

    a1 = ss.q_embed_kmeans(sf_dir).to_pandas().sort_values("vec_id")
    a2 = ss.q_embed_kmeans(sf_dir).to_pandas().sort_values("vec_id")
    pd.testing.assert_frame_equal(a1.reset_index(drop=True), a2.reset_index(drop=True))
    assert a1["cluster"].between(0, ss.KM_K - 1).all()
    assert a1["cluster"].nunique() >= 2  # the grid init never collapses here

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    _, m = ss._matrix(t)
    init = ss._md5_grid(ss.KM_K, m.shape[1], "kmeans")

    def wcss(c, a):
        return float(((m - c[a]) ** 2).sum())

    c = init.copy()
    a0 = ss._km_assign(m, c)
    w0 = wcss(c, a0)
    for _ in range(ss.KM_UPDATES):  # reproduce the distributed updates
        a = ss._km_assign(m, c)
        q = np.floor(m * ss.CENTROID_Q)
        for k in np.unique(a):
            sel = q[a == k]
            c[k] = (sel.sum(axis=0) / len(sel)) / ss.CENTROID_Q
    af = ss._km_assign(m, c)
    assert wcss(c, af) <= w0 * (1 + 1e-9)
    # and the distributed pipeline produced exactly this assignment
    got = dict(zip(a1["vec_id"], a1["cluster"]))
    ids = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id"]).column("vec_id").to_pylist()
    assert all(got[i] == af[j] for j, i in enumerate(ids))


def test_cms_overestimates_one_sided(ray_session, sf_dir):
    """CMS invariant: est ≥ true for every probe token (the sketch only
    ever ADDS colliding mass), with equality for most tokens at this
    width (w=8192 ≫ sf vocab)."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import textstats as ts

    got = ts.q_token_cms(sf_dir).to_pandas()
    assert len(got) > 0
    assert (got["est_count"] >= got["true_count"]).all()
    # sketch width ≫ vocab at sf scale → the vast majority probe exact
    assert (got["est_count"] == got["true_count"]).mean() > 0.9


def test_doc_overlap_finds_planted_chain(ray_session, tmp_path):
    """A split page (doc A's last 5 tokens == docs B and C's first 5)
    reports n_continuations=2 on A; a doc whose own tail equals its own
    head does NOT count itself; short docs (<K tokens) get null keys."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fluent_plugin_kubernetes_metadata_filter_ray.functions import dedup as dd

    boundary = "alpha beta gamma delta epsilon"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "text": pa.array(
                [
                    "page one body text ends with " + boundary,   # A
                    boundary + " continues page two here",        # B
                    boundary + " another continuation branch",    # C
                    boundary,                                     # self head==tail
                    "too short",                                  # < K tokens
                    None,                                         # null text
                ],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 6, pa.string()),
            "source": pa.array(["s"] * 6, pa.string()),
            "n_chars": pa.array([1] * 6, pa.int64()),
        }
    )
    d = str(tmp_path / "ovl")
    os.makedirs(d, exist_ok=True)
    pq.write_table(docs, f"{d}/documents.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
                "label": pa.array([], pa.int32()),
            }
        ),
        f"{d}/embeddings.parquet",
    )
    got = dd.q_doc_overlap(d).to_pandas().set_index("doc_id").sort_index()
    # A's tail matches B, C, and doc 4's heads → 3 continuations
    assert got.loc[1, "n_continuations"] == 3
    # doc 4: head == tail == boundary; matches B, C and itself-excluded → 3-1... 
    # boundary heads: B, C, doc4 → count 3, minus self = 2
    assert got.loc[4, "n_continuations"] == 2
    assert got.loc[2, "n_continuations"] == 0
    assert pd.isna(got.loc[5, "head_key"]) and got.loc[5, "n_continuations"] == 0
    assert pd.isna(got.loc[6, "tail_key"]) and got.loc[6, "n_continuations"] == 0


def test_source_divergence_semantics(ray_session, sf_dir):
    """KL(P_s ‖ P) is ~non-negative (up to the 1e-9 floor quantization),
    one row per source, n_tokens sums to the corpus total."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import (
        curation as cu,
        textstats as ts,
    )

    got = cu.q_source_divergence(sf_dir).to_pandas()
    assert len(got) >= 1
    assert got["source"].is_unique
    # Gibbs' inequality, modulo per-term floor() (−1e-9 each)
    assert (got["kl"] >= -1e-3).all()
    assert (got["kl"] > 0).any()
    total = int(ts.q_token_freq(sf_dir).to_pandas()["n"].sum())
    assert int(got["n_tokens"].sum()) == total


def test_doc_importance_prefers_target_like_docs(ray_session, tmp_path):
    """DSIR: a raw doc written in the target split's vocabulary scores a
    positive mean log-ratio (kept); one written in raw-only vocabulary
    scores negative; empty/null docs get weight 0 and are dropped."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fluent_plugin_kubernetes_metadata_filter_ray.functions import sampling as sp

    tgt_text = "quantum flux capacitor resonance harmonics " * 5
    raw_text = "mundane boilerplate filler chatter noise " * 5
    rows = []
    # doc_ids divisible by 17 form the target split
    for i in range(4):
        rows.append((17 * (i + 1), tgt_text))          # target docs
    rows.append((1, tgt_text))                         # raw, target-like
    rows.append((2, raw_text))                         # raw, raw-like
    rows.append((3, raw_text))
    rows.append((4, ""))                               # raw, empty
    rows.append((5, None))                             # raw, null
    docs = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["s"] * len(rows), pa.string()),
            "n_chars": pa.array([1] * len(rows), pa.int64()),
        }
    )
    d = str(tmp_path / "dsir")
    os.makedirs(d, exist_ok=True)
    pq.write_table(docs, f"{d}/documents.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
                "label": pa.array([], pa.int32()),
            }
        ),
        f"{d}/embeddings.parquet",
    )
    got = sp.q_doc_importance(d).to_pandas().set_index("doc_id").sort_index()
    assert set(got.index) == {1, 2, 3, 4, 5}  # raw docs only
    assert got.loc[1, "logratio_avg"] > 0 and bool(got.loc[1, "dsir_keep"])
    assert got.loc[2, "logratio_avg"] < 0 and not bool(got.loc[2, "dsir_keep"])
    assert got.loc[4, "logratio_q"] == 0 and not bool(got.loc[4, "dsir_keep"])
    assert got.loc[5, "n_feats"] == 0 and not bool(got.loc[5, "dsir_keep"])
