"""Derived BIG corpus for scale benchmarking (bench.py only — correctness
runs on the driver's own sf tables).

The driver testdata tops out at 5k documents / 2k embeddings, so the dedup
and ANN bench entries there mostly measure Ray stage-setup latency.  This
module derives a replicated corpus that is a drop-in ``sf_dir`` (single
``documents.parquet`` + ``embeddings.parquet``), cached under
``/tmp/kmeta_cache`` with the same atomic tmp-dir + ``.done``-marker
protocol as datagen.py (derive into ``.deriving``, rename, never mix stale
shards).

Replica semantics (everything deterministic, no external data):

- documents: replica ``k`` of doc ``d`` gets ``doc_id = d + k*REPLICA_STRIDE``
  and its tokens permuted by an md5-derived order that depends only on
  ``(k, n_tokens)``.  Word-shingle sets are order-sensitive, so replicas of
  the same doc share ~no 3-grams (cross-replica Jaccard ≈ 0) and the LSH
  pair count stays linear in ``rep`` — while each replica still contains
  the planted near/exact-dup structure that ``corpus.augment_batch`` adds
  downstream.  Replica 0 is the original corpus byte-for-byte.
- embeddings: replica ``k`` applies one seeded-PCG64 random ROTATION
  (QR of a gaussian matrix) to every vector.  A rotation preserves all
  intra-replica cosines bit-for-bit-ish (each replica contributes the
  same near-dup structure as the base corpus, so pair counts stay LINEAR
  in ``rep``) while cross-replica cosines are random — independent
  per-vector noise would instead make the ``rep`` copies of each vector
  near-dups of each other, a quadratic pair blowup the real operator
  never faces.  Query vectors stay the original ``vec_id < N_QUERIES``
  rows of replica 0.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import corpus as cp
from ..datagen import CACHE_ROOT

REPLICA_STRIDE = 10_000_000  # > doc_id + 2*AUG_OFFSET, so ids never collide


def _doc_perm(k: int, n: int) -> np.ndarray:
    """Deterministic token permutation for replica k of an n-token doc."""
    if k == 0 or n <= 1:
        return np.arange(n)
    keys = [cp.w64(f"perm|{k}|{n}|{i}") for i in range(n)]
    return np.argsort(np.array(keys, dtype=np.uint64), kind="stable")


def big_sf_dir(sf_dir: str, rep_docs: int, rep_vecs: int) -> str:
    """Derive-and-cache the replicated corpus; returns a drop-in sf_dir."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = os.path.join(CACHE_ROOT, f"bigsf2_{tag}_d{rep_docs}_v{rep_vecs}")
    done = out_dir + ".done"
    if os.path.exists(done):
        return out_dir

    work = out_dir + ".deriving"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    # --- documents ---------------------------------------------------------
    base = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    ids = base.column("doc_id").to_numpy(zero_copy_only=False)
    texts = base.column("text").to_pylist()
    tok_arrs = [np.array(t.split(), dtype=object) for t in texts]
    lens = sorted({len(t) for t in tok_arrs})

    reps = []
    for k in range(rep_docs):
        if k == 0:
            reps.append(base)
            continue
        perms = {n: _doc_perm(k, n) for n in lens}
        ptexts = [" ".join(a[perms[len(a)]]) for a in tok_arrs]
        reps.append(
            pa.table(
                {
                    "doc_id": pa.array(ids + k * REPLICA_STRIDE),
                    "text": pa.array(ptexts, pa.string()),
                    "lang": base.column("lang"),
                    "source": base.column("source"),
                    "n_chars": pa.array(
                        np.fromiter((len(s) for s in ptexts), np.int64, len(ptexts))
                    ).cast(base.column("n_chars").type),
                }
            )
        )
    # strip the pandas schema metadata: Ray's schema-dedup tries to hash it
    # and warns "unhashable type: 'dict'" on every read task otherwise
    pq.write_table(
        pa.concat_tables(reps).replace_schema_metadata(None),
        os.path.join(work, "documents.parquet"),
        row_group_size=16384,
    )

    # --- embeddings --------------------------------------------------------
    ebase = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    vids = ebase.column("vec_id").to_numpy(zero_copy_only=False)
    emb = np.stack(
        [np.asarray(x, dtype=np.float32) for x in ebase.column("embedding").to_pylist()]
    )
    ereps = []
    for k in range(rep_vecs):
        if k == 0:
            ereps.append(ebase)
            continue
        rng = np.random.Generator(np.random.PCG64(k))  # stable across platforms
        q, _ = np.linalg.qr(rng.normal(size=(emb.shape[1], emb.shape[1])))
        pert = (emb @ q.astype(np.float64)).astype(np.float32)
        ereps.append(
            pa.table(
                {
                    "vec_id": pa.array(vids + k * REPLICA_STRIDE),
                    "embedding": pa.array(list(pert), pa.list_(pa.float32())),
                    "label": ebase.column("label"),
                }
            )
        )
    pq.write_table(
        pa.concat_tables(ereps).replace_schema_metadata(None),
        os.path.join(work, "embeddings.parquet"),
        row_group_size=16384,
    )

    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(work, out_dir)
    with open(done, "w") as f:
        f.write(f"{len(ids) * rep_docs} {len(vids) * rep_vecs}")
    return out_dir
