"""Similarity search / embedding near-dup over the ``embeddings`` table
(vec_id:int64, embedding:list<float>, label:int32).

  - **brute-force cosine top-k** (the correctness baseline): the query matrix
    (small) is broadcast via ``ray.put`` once; each ``map_batches`` block
    computes a float64 matmul against it and emits only its block-local top-k
    partials; a tiny ``groupby(query_id).map_groups`` reduces to the global
    top-k.  The shuffle moves O(queries × k × blocks) short rows — never the
    embeddings.
  - **embedding cosine near-dup**: same broadcast-matmul shape, all-pairs
    above a threshold, emitted as (vec_a < vec_b) pairs.  The broadcast side
    is the whole (normalized) matrix — fine up to ~10^7 × dim floats; the
    documented scale path beyond that is the LSH variant below.
  - **hyperplane-LSH ANN** (the scale path): deterministic random-ish
    hyperplanes (hash-seeded, no RNG), bucket by sign pattern; queries only
    probe their own bucket.  Approximate ⇒ no SQL oracle (driver rows-only
    check); recall vs brute force asserted in tests.

Oracle twins use DuckDB ``list_cosine_similarity``; scores are rounded to 6
decimals on both sides (rank columns are float-free).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import corpus as cp

TOPK_K = 10
N_QUERIES = 8  # vec_id < 8 are the query vectors
NEARDUP_COS_THRESHOLD = 0.4
LSH_N_PLANES = 4  # 2^4 buckets: small-corpus-friendly; raise with corpus size
ROUND = 6


def _matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    emb = batch.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    # flatten() honors list-array slice offsets; .values would not
    m = np.asarray(emb.flatten().to_numpy(zero_copy_only=False), dtype=np.float64)
    return ids, m.reshape(len(ids), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _load_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Small side: read the query vectors once on the driver (pyarrow, no
    Ray) — broadcast to all map tasks via ray.put."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc_

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.filter(pc_.less(t.column("vec_id"), N_QUERIES))
    ids, m = _matrix(t)
    order = np.argsort(ids)
    return ids[order], m[order]


class TopKPartial:
    """Per-block top-k against the broadcast query matrix."""

    def __init__(self, queries_ref):
        import ray

        self.q_ids, qm = (
            ray.get(queries_ref) if type(queries_ref).__name__ == "ObjectRef" else queries_ref
        )
        self.qn = _normalize(qm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, m = _matrix(batch)
        sims = self.qn @ _normalize(m).T  # (Q, B)
        k = min(TOPK_K, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            top = np.argpartition(-row, k - 1)[:k] if k < len(row) else np.arange(len(row))
            for j in top:
                out_q.append(int(self.q_ids[qi]))
                out_v.append(int(ids[j]))
                out_s.append(float(row[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )


def _topk_reduce(group: pa.Table) -> pa.Table:
    qid = group.column("query_id").to_numpy(zero_copy_only=False)
    vid = group.column("vec_id").to_numpy(zero_copy_only=False)
    sim = group.column("cos_sim").to_numpy(zero_copy_only=False)
    order = np.lexsort((vid, -sim))[:TOPK_K]
    return pa.table(
        {
            "query_id": pa.array(qid[order], pa.int64()),
            "vec_id": pa.array(vid[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "cos_sim": pa.array(np.round(sim[order], ROUND), pa.float64()),
        }
    )


def q_ann_topk(sf_dir: str):
    """Global cosine top-k per query vector (brute force, distributed)."""
    import ray

    queries_ref = ray.put(_load_queries(sf_dir))
    ds = cp.read_embeddings(sf_dir)
    partials = ds.map_batches(
        TopKPartial,
        fn_constructor_kwargs={"queries_ref": queries_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
    )
    return partials.groupby("query_id").map_groups(_topk_reduce, batch_format="pyarrow")


def ann_topk_oracle_sql() -> str:
    # float64 on both sides: cast the FLOAT[] lists to DOUBLE before the
    # cosine, else DuckDB computes in float32 and diverges at ~1e-7
    return f"""
WITH ed AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, emb AS qe FROM ed WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id,
    list_cosine_similarity(q.qe, e.emb) AS c,
    row_number() OVER (PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qe, e.emb) DESC,
                                e.vec_id ASC) AS rank
  FROM q CROSS JOIN ed e
)
SELECT query_id, vec_id, rank::BIGINT AS rank, round(c, {ROUND}) AS cos_sim
FROM scored WHERE rank <= {TOPK_K}
""".strip()


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

class CosineNearDup:
    """Block × broadcast-matrix pairs above threshold (a < b)."""

    def __init__(self, all_ref):
        import ray

        self.all_ids, am = (
            ray.get(all_ref) if type(all_ref).__name__ == "ObjectRef" else all_ref
        )
        self.an = _normalize(am)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, m = _matrix(batch)
        sims = _normalize(m) @ self.an.T  # (B, N)
        bi, aj = np.nonzero(sims >= NEARDUP_COS_THRESHOLD)
        va = ids[bi]
        vb = self.all_ids[aj]
        keep = va < vb  # each unordered pair emitted once, by the block owning a
        return pa.table(
            {
                "vec_a": pa.array(va[keep], pa.int64()),
                "vec_b": pa.array(vb[keep], pa.int64()),
                "cos_sim": pa.array(np.round(sims[bi, aj][keep], ROUND), pa.float64()),
            }
        )


def _load_all(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return _matrix(t)


def q_embed_neardup(sf_dir: str):
    import ray

    all_ref = ray.put(_load_all(sf_dir))
    ds = cp.read_embeddings(sf_dir)
    return ds.map_batches(
        CosineNearDup,
        fn_constructor_kwargs={"all_ref": all_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
    )


def embed_neardup_oracle_sql() -> str:
    return f"""
WITH ed AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  round(list_cosine_similarity(a.emb, b.emb), {ROUND}) AS cos_sim
FROM ed a JOIN ed b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.emb, b.emb) >= {NEARDUP_COS_THRESHOLD}
""".strip()


# ---------------------------------------------------------------------------
# hyperplane-LSH bucketed ANN (scale path; approximate, tested not oracled)
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from md5 bytes (no RNG)."""
    vals = np.empty((LSH_N_PLANES, dim), dtype=np.float64)
    for p in range(LSH_N_PLANES):
        for d0 in range(0, dim, 4):
            h = int(cp.md5_hex(f"plane:{p}:{d0}"), 16)
            for j in range(min(4, dim - d0)):
                v = (h >> (32 * j)) & 0xFFFFFFFF
                vals[p, d0 + j] = (v / 2**32) * 2.0 - 1.0
    return vals


class LshBucketer:
    def __init__(self, planes):
        self.planes = planes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, m = _matrix(batch)
        signs = (_normalize(m) @ self.planes.T) > 0  # (B, P)
        bucket = (signs.astype(np.int64) << np.arange(LSH_N_PLANES, dtype=np.int64)).sum(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
                "embedding": batch.column("embedding"),
            }
        )


def _bucket_topk(group: pa.Table) -> pa.Table:
    """Within-bucket brute force: queries (vec_id < N_QUERIES) vs members."""
    ids, m = _matrix(group)
    mn = _normalize(m)
    qmask = ids < N_QUERIES
    if not qmask.any():
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "cos_sim": pa.array([], pa.float64()),
            }
        )
    sims = mn[qmask] @ mn.T
    out_q, out_v, out_r, out_s = [], [], [], []
    for qi, qid in enumerate(ids[qmask]):
        row = sims[qi]
        order = np.lexsort((ids, -row))[:TOPK_K]
        for r, j in enumerate(order, 1):
            out_q.append(int(qid))
            out_v.append(int(ids[j]))
            out_r.append(r)
            out_s.append(round(float(row[j]), ROUND))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "cos_sim": pa.array(out_s, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# IVF-bucketed ANN (scale path #2): coarse k-means centroids, nprobe search
# ---------------------------------------------------------------------------

IVF_N_CENTROIDS = 16
IVF_NPROBE = 4
IVF_KMEANS_ITERS = 10
IVF_TRAIN_SAMPLE = 2048


def _train_centroids(sf_dir: str) -> np.ndarray:
    """Coarse quantizer: deterministic k-means (fixed seed, fixed iters) on a
    driver-side sample.  At 10^9+ vectors the sample read stays tiny
    (head of the table) and training is seconds; the full corpus never
    touches the driver."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids, m = _matrix(t.slice(0, IVF_TRAIN_SAMPLE))
    x = _normalize(m)
    rng = np.random.RandomState(42)
    cent = x[rng.choice(len(x), size=min(IVF_N_CENTROIDS, len(x)), replace=False)]
    for _ in range(IVF_KMEANS_ITERS):
        assign = np.argmax(x @ cent.T, axis=1)  # cosine on unit vectors
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


class IvfAssigner:
    def __init__(self, centroids):
        self.cent = centroids

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, m = _matrix(batch)
        assign = np.argmax(_normalize(m) @ self.cent.T, axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "bucket": pa.array(assign.astype(np.int64)),
                "embedding": batch.column("embedding"),
            }
        )


def q_ann_ivf(sf_dir: str):
    """IVF ANN: assign vectors to their nearest coarse centroid
    (map_batches), queries probe their IVF_NPROBE closest centroids' buckets
    (groupby(bucket).map_groups exact search), global reduce per query.
    Approximate ⇒ rows-only driver check; recall asserted in tests.

    Scale shape: one shuffle of (vec_id, bucket, embedding) keyed by bucket;
    bucket sizes are data-dependent but bounded by the quantizer — salt
    (sub-split) oversized buckets if a cluster dominates."""
    queries_ids_m = _load_queries(sf_dir)
    cent = _train_centroids(sf_dir)
    q_assign = np.argsort(-(_normalize(queries_ids_m[1]) @ cent.T), axis=1)[:, :IVF_NPROBE]
    probe_map: dict[int, list[int]] = {}
    for qi, qid in enumerate(queries_ids_m[0]):
        for b in q_assign[qi]:
            probe_map.setdefault(int(b), []).append(int(qid))
    import ray

    q_ref = ray.put((queries_ids_m, probe_map))

    ds = cp.read_embeddings(sf_dir)
    bucketed = ds.map_batches(
        IvfAssigner,
        fn_constructor_kwargs={"centroids": cent},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
    )

    def bucket_search(group: pa.Table) -> pa.Table:
        (q_ids, qm), probes = ray.get(q_ref) if type(q_ref).__name__ == "ObjectRef" else q_ref
        bucket = group.column("bucket")[0].as_py()
        want = probes.get(bucket, [])
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cos_sim": pa.array([], pa.float64()),
            }
        )
        if not want:
            return empty
        ids, m = _matrix(group)
        mn = _normalize(m)
        qsel = np.isin(q_ids, want)
        sims = _normalize(qm[qsel]) @ mn.T
        out_q, out_v, out_s = [], [], []
        k = min(TOPK_K, sims.shape[1])
        for qi, qid in enumerate(q_ids[qsel]):
            top = np.argpartition(-sims[qi], k - 1)[:k] if k < sims.shape[1] else np.arange(sims.shape[1])
            for j in top:
                out_q.append(int(qid))
                out_v.append(int(ids[j]))
                out_s.append(round(float(sims[qi, j]), ROUND))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = bucketed.groupby("bucket").map_groups(bucket_search, batch_format="pyarrow")
    return partials.groupby("query_id").map_groups(_topk_reduce_scored, batch_format="pyarrow")


def _topk_reduce_scored(group: pa.Table) -> pa.Table:
    qid = group.column("query_id").to_numpy(zero_copy_only=False)
    vid = group.column("vec_id").to_numpy(zero_copy_only=False)
    sim = group.column("cos_sim").to_numpy(zero_copy_only=False)
    order = np.lexsort((vid, -sim))[:TOPK_K]
    return pa.table(
        {
            "query_id": pa.array(qid[order], pa.int64()),
            "vec_id": pa.array(vid[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "cos_sim": pa.array(sim[order], pa.float64()),
        }
    )


def q_ann_lsh(sf_dir: str):
    """Approximate top-k: hyperplane-LSH bucket, then within-bucket brute
    force.  At scale the groupby shuffles each vector once, keyed by its
    bucket (2^P buckets), instead of broadcasting the full matrix."""
    import pyarrow.parquet as pq

    dim = len(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"]).column(
            "embedding"
        )[0]
    )
    planes = _hyperplanes(dim)
    ds = cp.read_embeddings(sf_dir)
    bucketed = ds.map_batches(
        LshBucketer,
        fn_constructor_kwargs={"planes": planes},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
    )
    return bucketed.groupby("bucket").map_groups(_bucket_topk, batch_format="pyarrow")
