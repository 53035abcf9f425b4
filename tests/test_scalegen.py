"""Derived BIG corpus (functions/scalegen.py): drop-in sf_dir layout,
deterministic derivation, and the replica-independence invariants that keep
bench pair counts linear in rep (permuted docs share no shingles across
replicas; rotated embeddings preserve intra-replica cosines)."""

import os
import shutil

import pyarrow.parquet as pq


def _fresh_big(sf_dir, d, v):
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import scalegen

    tag = os.path.basename(sf_dir)
    p = os.path.join(scalegen.CACHE_ROOT, f"bigsf2_{tag}_d{d}_v{v}")
    shutil.rmtree(p, ignore_errors=True)
    try:
        os.remove(p + ".done")
    except FileNotFoundError:
        pass
    return scalegen.big_sf_dir(sf_dir, d, v)


def test_big_sf_dir_deterministic_and_dropin(sf_dir):
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import scalegen

    a = _fresh_big(sf_dir, 2, 2)
    t1 = pq.read_table(f"{a}/documents.parquet")
    e1 = pq.read_table(f"{a}/embeddings.parquet")
    b = _fresh_big(sf_dir, 2, 2)
    t2 = pq.read_table(f"{b}/documents.parquet")
    e2 = pq.read_table(f"{b}/embeddings.parquet")
    assert t1.equals(t2) and e1.equals(e2)

    base = pq.read_table(f"{sf_dir}/documents.parquet")
    assert t1.num_rows == 2 * base.num_rows
    assert set(t1.schema.names) == set(base.schema.names)
    # replica 0 is the original corpus byte-for-byte
    ids = t1.column("doc_id").to_numpy()
    orig = t1.filter(
        __import__("pyarrow").array(ids < scalegen.REPLICA_STRIDE)
    ).sort_by("doc_id")
    assert orig.column("text").equals(base.sort_by("doc_id").column("text"))


def test_big_corpus_pairs_stay_intra_replica(ray_session, sf_dir):
    """MinHash near-dup on the 2× corpus: every verified pair is within one
    replica (token permutation destroys cross-replica shingle overlap), and
    each replica contributes its own planted-dup structure (count ≈ 2×)."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import dedup as dd
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import scalegen

    big = _fresh_big(sf_dir, 2, 2)
    base_pairs = dd.q_dedup_minhash(sf_dir).to_pandas()
    big_pairs = dd.q_dedup_minhash(big).to_pandas()
    stride = scalegen.REPLICA_STRIDE
    assert (big_pairs["doc_a"] // stride == big_pairs["doc_b"] // stride).all()
    assert len(big_pairs) >= 1.5 * len(base_pairs)
    assert len(big_pairs) <= 3.0 * len(base_pairs)  # linear, not quadratic
    # replica 0's pairs are exactly the base corpus's pairs
    r0 = big_pairs[big_pairs["doc_a"] < stride]
    assert len(r0) == len(base_pairs)


def test_big_embeddings_lsh_subset_of_exact(ray_session, sf_dir):
    """Rotated-replica embeddings: the banded-LSH near-dup remains a strict
    subset of the exact all-pairs op on the same big corpus."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import simsearch as ss

    big = _fresh_big(sf_dir, 2, 2)
    lsh = ss.q_embed_neardup_lsh(big).to_pandas()
    exact = ss.q_embed_neardup(big).to_pandas()
    lp = set(map(tuple, lsh[["vec_a", "vec_b"]].values))
    ep = set(map(tuple, exact[["vec_a", "vec_b"]].values))
    assert lp <= ep
    assert len(lp) > 0
