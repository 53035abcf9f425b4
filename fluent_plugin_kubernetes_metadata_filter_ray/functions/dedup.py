"""Deduplication operators over the (augmented) ``documents`` table.

Three families, each expressed Ray-Data-first with an exact DuckDB twin:

  - **exact**: md5(text) hash inside ``map_batches`` → ``groupby(hash)`` with
    Min/Count aggregates (hash-partition + per-group first).  The only
    shuffle moves one short row per distinct hash — partial aggregation
    happens per block inside Ray's hash aggregate.
  - **MinHash + LSH**: shingle → minhash signature → banded bucket keys, all
    inside one stateless ``map_batches``; candidate generation is a
    ``groupby(band)`` over *thin* band rows (doc_id, band_idx, band_val —
    the shingle sets do NOT ride the band shuffle); exact Jaccard
    verification is a second stage that attaches each doc's shingle set to
    its candidate pairs via one ``union`` + ``groupby(doc_id)`` (each doc's
    set crosses the wire once, not once per band), then reduces per pair.
    No all-pairs pass ever happens, and bucket skew is bounded by a
    deterministic cap (doc_id order, replicated in the oracle SQL and
    surfaced via a stats counter when it fires).
  - **SimHash**: 62-bit fingerprint per doc (token-hash bit majority) inside
    ``map_batches``; LSH over 4×16-bit bands; Hamming verification in
    ``map_groups``; same shuffle shape as MinHash.

The oracle SQL replicates the *same* LSH (same hash family, bands and
thresholds) in DuckDB, so the comparison is exact, not statistical.
"""

from __future__ import annotations

import logging
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Min

from ..state.stats import Stats, dump_counters

from . import corpus as cp
from ..datagen import CACHE_ROOT as _CACHE_ROOT

# Cap pathological LSH buckets (all-identical spam docs).  The cap is
# DETERMINISTIC — each bucket keeps its MAX_BUCKET smallest doc_ids — and
# replicated in the oracle SQL (row_number over doc_id), so a clipped bucket
# still hash-matches.  Clips are surfaced, never silent: a stats counter
# bumps per clip (dumped to $KMETA_STATS_DIR when set) and a warning logs.
MAX_BUCKET = 256
# doc_ids are non-negative (datagen + scalegen offsets); -1 marks the
# keep-the-schema-typed sentinel row threaded through the minhash joins
SENTINEL_ID = -1


def _drop_sentinel_pairs(batch):
    import pyarrow.compute as _pc

    return batch.filter(_pc.not_equal(batch.column("doc_a"), SENTINEL_ID))

_log = logging.getLogger(__name__)
_CLIP_STATS = Stats()  # per worker process; merged via collect_dumped_counters


def _note_bucket_clip(bucket_rows: int) -> None:
    _CLIP_STATS.bump("lsh_bucket_clipped")
    prev = _CLIP_STATS.counters.get("lsh_bucket_clip_max_rows", 0)
    _CLIP_STATS.set("lsh_bucket_clip_max_rows", max(prev, bucket_rows))
    # log-once-per-power-of-two per worker: a skew-heavy corpus can clip
    # thousands of buckets and one warning per clip floods the driver log;
    # exact totals live in the stats counters.  KMETA_QUIET_CLIPS silences
    # the log entirely (bench runs; counters still bump).
    n = _CLIP_STATS.counters["lsh_bucket_clipped"]
    if n & (n - 1) == 0 and not os.environ.get("KMETA_QUIET_CLIPS"):
        _log.warning(
            "LSH bucket of %d docs clipped to %d (kept: smallest doc_ids; "
            "%d buckets clipped so far in this worker)",
            bucket_rows, MAX_BUCKET, n,
        )
    dump_dir = os.environ.get("KMETA_STATS_DIR")
    if dump_dir:
        dump_counters(dump_dir, f"dedup_{os.getpid()}", _CLIP_STATS.to_dict())


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def _add_text_hash(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    # null text → null hash, like DuckDB md5(NULL) (hostile-input hardening)
    h = pa.array([None if t is None else cp.md5_hex(t) for t in texts], pa.string())
    return pa.table({"text_hash": h, "doc_id": batch.column("doc_id")})


def q_dedup_exact(sf_dir: str):
    """Keep the smallest doc_id per distinct text; report group sizes.
    Null-text rows are excluded (they have no content to dedup, and a null
    groupby key crashes Ray's sort-based aggregate)."""
    import pyarrow.compute as pc_

    ds = cp.read_augmented(sf_dir)
    ds = ds.map_batches(
        lambda t: (lambda h: h.filter(pc_.is_valid(h.column("text_hash"))))(
            _add_text_hash(t)
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return ds.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups")
    )


def dedup_exact_oracle_sql() -> str:
    return f"""
WITH {cp.AUG_DOCS_CTE}
SELECT md5(text) AS text_hash, min(doc_id) AS doc_id, count(*)::BIGINT AS n_dups
FROM docs_aug GROUP BY md5(text)
""".strip()


# ---------------------------------------------------------------------------
# incremental (cross-corpus) exact dedup
# ---------------------------------------------------------------------------

INCR_REF_MOD = 3  # deterministic split: doc_id % 3 == 0 is the "prior crawl"


def q_dedup_incremental(sf_dir: str):
    """Dedup a NEW batch of documents against a reference corpus (the
    crawl-N vs crawl-N-1 operation): every new doc is flagged novel unless
    its exact text hash already exists in the reference split.

    Shape: both sides hash inside ``map_batches``; the reference collapses
    to DISTINCT hashes via a groupby; the novelty flag is a hash-partition
    LEFT-OUTER join (anti-join + flag) — neither corpus is ever broadcast
    or driver-materialized, so this works when the reference is as big as
    the new crawl (unlike the broadcast-side joins, which assume a small
    side).  Runs on the augmented corpus so cross-split exact duplicates
    actually exist."""
    import pyarrow.compute as pc_

    from ray.data.aggregate import Count

    def hash_split(keep_ref: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            mask = (ids % INCR_REF_MOD == 0) if keep_ref else (ids % INCR_REF_MOD != 0)
            return _add_text_hash(batch.filter(pa.array(mask)))

        return fn

    import ray.data as rd

    ds = cp.read_augmented(sf_dir)
    # One sentinel row per join side keeps every stage schema-typed even
    # when a split is empty (same scheme as q_dedup_minhash; the raypatch
    # drops the schema-less empties the groupby can emit).  No driver
    # materialize: both corpus passes stream and overlap.  The left
    # sentinel joins nothing (novel) and is filtered in finalize; the
    # right one matches no new row, so left_outer drops it.
    new_side = ds.map_batches(
        hash_split(False), batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.from_arrow(pa.table(  # same column ORDER as _add_text_hash
        {"text_hash": pa.array(["\x00sentinel_new"], pa.string()),
         "doc_id": pa.array([SENTINEL_ID], pa.int64())}
    )))
    ref_hashes = (
        ds.map_batches(hash_split(True), batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_hash")
        .aggregate(Count(alias_name="n_ref"))
    ).union(rd.from_arrow(pa.table(
        {"text_hash": pa.array(["\x00sentinel_ref"], pa.string()),
         "n_ref": pa.array([1], pa.int64())}
    )))
    joined = new_side.join(
        ref_hashes, join_type="left_outer", num_partitions=_join_partitions(),
        on=("text_hash",),
    )

    def finalize(t: pa.Table) -> pa.Table:
        t = t.filter(pc_.not_equal(t.column("doc_id"), SENTINEL_ID))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text_hash": t.column("text_hash"),
                "is_novel": pc_.is_null(t.column("n_ref")),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def dedup_incremental_oracle_sql() -> str:
    return f"""
WITH {cp.AUG_DOCS_CTE},
newd AS (
  SELECT doc_id, md5(text) AS text_hash FROM docs_aug WHERE doc_id % {INCR_REF_MOD} <> 0
),
ref AS (
  SELECT DISTINCT md5(text) AS text_hash FROM docs_aug WHERE doc_id % {INCR_REF_MOD} = 0
)
SELECT n.doc_id, n.text_hash, (r.text_hash IS NULL) AS is_novel
FROM newd n LEFT JOIN ref r USING (text_hash)
""".strip()


def q_dedup_incremental_fuzzy(sf_dir: str):
    """FUZZY crawl-N vs crawl-N-1 dedup: flag new docs that NEAR-duplicate
    (Jaccard ≥ threshold) any reference-split doc — the production form of
    incremental dedup, where re-crawled pages differ by boilerplate.

    Composition: the banded-LSH pair pipeline (q_dedup_minhash) already
    finds all verified near-dup pairs across the whole corpus; this op
    keeps only cross-split pairs, combines them per new doc, and
    left-joins the flag onto the new split.  Everything streams — the
    extra stages beyond the pair pipeline shuffle only (doc_id, count)
    rows."""
    return _incremental_fuzzy_from_pairs(q_dedup_minhash(sf_dir), sf_dir)


def _incremental_fuzzy_from_pairs(pairs, sf_dir: str):
    """Doc-flavored wrapper over :func:`incremental_from_pairs` — the tail
    shared by the live, resume and exact-n-gram incremental ops."""
    new_docs = cp.read_augmented(sf_dir)
    return incremental_from_pairs(
        pairs, new_docs,
        id_col="doc_id", pair_cols=("doc_a", "doc_b"),
        ref_mod=INCR_REF_MOD, flag_name="is_fuzzy_dup",
    )


def incremental_from_pairs(pairs, universe, *, id_col, pair_cols, ref_mod,
                           flag_name):
    """Generic cross-crawl incremental tail over ANY verified near-dup
    pair stream: keep cross-split pairs, count partners per NEW id, and
    left-join the flag onto the new-split id universe.  Parameterized over
    the id space (documents vs embeddings) so the semantic-dedup twin
    (simsearch.q_embed_dedup_incremental) shares this implementation
    instead of a copy that could drift.  ``universe`` is a Dataset with an
    ``id_col`` column covering the WHOLE corpus; the new split is
    ``id % ref_mod != 0``."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ca, cb = pair_cols

    def cross_partial(t: pa.Table) -> pa.Table:
        a = t.column(ca).to_numpy(zero_copy_only=False)
        b = t.column(cb).to_numpy(zero_copy_only=False)
        a_ref = a % ref_mod == 0
        b_ref = b % ref_mod == 0
        new_ids = np.concatenate([b[a_ref & ~b_ref], a[~a_ref & b_ref]])
        ids_u, counts = np.unique(new_ids, return_counts=True)
        return pa.table(
            {
                id_col: pa.array(ids_u.astype(np.int64)),
                "n_ref_matches": pa.array(counts.astype(np.int64)),
            }
        )

    # sentinel keeps the aggregate/join side typed on a pair-free corpus
    # (same scheme as q_dedup_minhash); id=-1 never joins a real row
    matches = (
        pairs.map_batches(cross_partial, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(pa.table(
            {id_col: pa.array([SENTINEL_ID], pa.int64()),
             "n_ref_matches": pa.array([0], pa.int64())}
        )))
        .groupby(id_col)
        .aggregate(Sum("n_ref_matches", alias_name="n_ref_matches"))
    )

    def new_ids(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {id_col: pa.array(ids[ids % ref_mod != 0].astype(np.int64))}
        )

    # sentinel on the probe side too: a ref-only (or blank) corpus makes
    # newd empty end-to-end, and a fully-empty join side loses the one-shot
    # schema broadcast (the Ray 2.49 race raypatch can't fix for
    # empty-END-TO-END inputs).  It joins only the matches sentinel and is
    # dropped in finalize.
    newd = universe.map_batches(
        new_ids, batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.from_arrow(pa.table(
        {id_col: pa.array([SENTINEL_ID], pa.int64())}
    )))
    joined = newd.join(
        matches, join_type="left_outer", num_partitions=_join_partitions(),
        on=(id_col,),
    )

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        t = t.filter(pc_.not_equal(t.column(id_col), SENTINEL_ID))
        n = pc_.coalesce(t.column("n_ref_matches"), pa.scalar(0, pa.int64()))
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_ref_matches": n,
                flag_name: pc_.greater(n, 0),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def dedup_incremental_fuzzy_oracle_sql() -> str:
    return f"""
WITH {cp.AUG_DOCS_CTE},
pairs AS (SELECT doc_a, doc_b FROM ({dedup_minhash_oracle_sql()}) p),
crossm AS (
  SELECT CASE WHEN doc_a % {INCR_REF_MOD} = 0 THEN doc_b ELSE doc_a END AS doc_id
  FROM pairs
  WHERE (doc_a % {INCR_REF_MOD} = 0) <> (doc_b % {INCR_REF_MOD} = 0)
),
agg AS (SELECT doc_id, count(*)::BIGINT AS n FROM crossm GROUP BY doc_id),
newd AS (SELECT doc_id FROM docs_aug WHERE doc_id % {INCR_REF_MOD} <> 0)
SELECT n.doc_id,
  coalesce(a.n, 0) AS n_ref_matches,
  coalesce(a.n, 0) > 0 AS is_fuzzy_dup
FROM newd n LEFT JOIN agg a USING (doc_id)
""".strip()


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

# shared factorized shingle kernel (also used by the decontamination op)
_batch_shingles = cp.batch_shingles


def _minhash_band_rows(batch: pa.Table) -> pa.Table:
    """doc → LSH_BANDS *thin* rows (doc_id, band_idx, band_val).  The shingle
    sets stay out of the band shuffle (round-1 VERDICT: shipping them 4× per
    doc dominated the exchange); the verify stage re-derives them.

    Vectorized end-to-end: distinct-shingle md5 (C-speed hashlib over the
    factorized uniques), a (H × U) multiply-shift matrix for the hash
    family, and a segmented ``np.minimum.reduceat`` per doc for the
    signature — no per-doc Python in the hot loop."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    fs = _batch_shingles(batch)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "band_idx": pa.array([], pa.int32()),
            "band_val": pa.array([], pa.string()),
            "sig": pa.array([], pa.binary()),
        }
    )
    if fs is None:
        return empty
    rows, codes, uniques = fs
    hw_u = np.fromiter((cp.w32(u) for u in uniques), np.uint64, len(uniques))
    a = np.asarray(cp.MINHASH_A, dtype=np.uint64)[:, None]
    b = np.asarray(cp.MINHASH_B, dtype=np.uint64)[:, None]
    mh_u = (a * hw_u[None, :] + b) % np.uint64(2**32)  # (H, U)
    starts = np.r_[0, np.flatnonzero(np.diff(rows)) + 1]
    sig = np.minimum.reduceat(mh_u[:, codes], starts, axis=1)  # (H, n_docs)
    docs = ids[rows[starts]]
    n = len(docs)
    sig_s = sig.astype("U10")
    # full signature rides each band row (64 B: 16 × uint32 LE) so the pair
    # emitter can apply the estimated-Jaccard prefilter without any join
    sig32 = np.ascontiguousarray(sig.T.astype(np.uint32))  # (n_docs, H)
    sig_bytes = [sig32[i].tobytes() for i in range(n)]
    out_id, out_band, out_val = [], [], []
    for bi in range(cp.LSH_BANDS):
        val = sig_s[bi * cp.LSH_ROWS]
        for r in range(1, cp.LSH_ROWS):
            val = np.char.add(np.char.add(val, ","), sig_s[bi * cp.LSH_ROWS + r])
        out_id.append(docs)
        out_band.append(np.full(n, bi, dtype=np.int32))
        out_val.append(val)
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
            "band_idx": pa.array(np.concatenate(out_band), pa.int32()),
            "band_val": pa.array(np.concatenate(out_val), pa.string()),
            "sig": pa.array(sig_bytes * cp.LSH_BANDS, pa.binary()),
        }
    )


def _shingle_set_rows(batch: pa.Table) -> pa.Table:
    """doc → (doc_id, s63 shingle-hash set packed as little-endian int64
    bytes — Arrow's hash join rejects list-typed payload columns).  Same
    factorize-once hashing as :func:`_minhash_band_rows`; the per-doc tail
    (unique + tobytes over ~50 values) is cheap numpy."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    fs = _batch_shingles(batch)
    if fs is None:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "s63": pa.array([], pa.binary())}
        )
    rows, codes, uniques = fs
    w63_u = np.fromiter((cp.w63(u) for u in uniques), np.int64, len(uniques))
    starts = np.r_[0, np.flatnonzero(np.diff(rows)) + 1]
    docs = ids[rows[starts]]
    packed = [
        np.unique(chunk).tobytes()
        for chunk in np.split(w63_u[codes], starts[1:])
    ]
    return pa.table(
        {
            "doc_id": pa.array(docs, pa.int64()),
            "s63": pa.array(packed, pa.binary()),
        }
    )


def _emit_pairs_sorted_block(batch: pa.Table) -> pa.Table:
    """Candidate pairs from a block of band rows SORTED by (band_idx,
    band_val): group boundaries found vectorized, singleton buckets (the
    vast majority) skipped without any per-group Python — a
    groupby().map_groups here pays ~50 µs of per-group overhead × one group
    per distinct band value (measured 1.4 s/task on 28k buckets).  Same
    physical contract as map_groups itself: equal keys are contiguous
    within one sorted block.  Cap semantics identical to
    _emit_candidate_pairs (smallest doc_ids, clip counter).

    Estimated-Jaccard prefilter (oracle-replicated): each pair's full
    signatures are compared component-wise and pairs with fewer than
    MINHASH_PREFILTER_MIN of MINHASH_H equal components are dropped HERE,
    before anything leaves the task — a band collision alone guarantees
    LSH_ROWS matches, so random collisions (est ≈ LSH_ROWS/H) never reach
    the shingle-set joins.  On a skew-heavy corpus this cuts candidates by
    ~100× (the clipped-bucket pair floods are almost all random)."""
    n = len(batch)
    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    )
    if n == 0:
        return empty
    bi = batch.column("band_idx").to_numpy(zero_copy_only=False)
    bv = np.asarray(batch.column("band_val").to_pylist(), dtype=object)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    from .simsearch import _bin_matrix

    sigs = _bin_matrix(batch.column("sig")).view(np.uint32)  # (n, H)
    change = np.flatnonzero((bi[1:] != bi[:-1]) | (bv[1:] != bv[:-1])) + 1
    starts = np.r_[0, change]
    ends = np.r_[change, n]
    outs_a, outs_b = [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        order = np.argsort(ids[s:e], kind="stable")
        if len(order) > MAX_BUCKET:
            _note_bucket_clip(len(order))
            order = order[:MAX_BUCKET]
        g = ids[s:e][order]
        gs = sigs[s:e][order]
        a_idx, b_idx = np.triu_indices(len(g), k=1)
        est = (gs[a_idx] == gs[b_idx]).sum(axis=1)
        keep = est >= cp.MINHASH_PREFILTER_MIN
        outs_a.append(g[a_idx][keep])
        outs_b.append(g[b_idx][keep])
    if not outs_a:
        return empty
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate(outs_a), pa.int64()),
            "doc_b": pa.array(np.concatenate(outs_b), pa.int64()),
        }
    )


def _dedupe_pairs_batch(batch: pa.Table) -> pa.Table:
    """Per-batch candidate-pair dedup (cheap C++ group_by): pairs arrive
    possibly duplicated (a pair can surface from up to LSH_BANDS buckets);
    residual cross-batch repeats collapse in the final survivors
    aggregate — no dedicated all-to-all distinct barrier."""
    return batch.group_by(["doc_a", "doc_b"]).aggregate([])


def _pair_jaccard_batch(batch: pa.Table) -> pa.Table:
    """Vectorized-ish per-batch exact Jaccard over joined pair rows
    (s63_a/s63_b packed int64 sets, already distinct per doc): two sorted
    np arrays per pair, intersected in C.  No per-pair map_groups — the
    per-GROUP Python overhead of a tiny-group groupby dwarfs the actual
    set math (measured ~125 µs/group vs ~10 µs here).  MinHash-only: the
    exact n-gram join never reaches this kernel (its pair-dense buckets
    verify in-block by collision counting instead)."""
    n = len(batch)
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    if n == 0:
        return empty
    sa_list = batch.column("s63_a").to_pylist()
    sb_list = batch.column("s63_b").to_pylist()
    j = np.empty(n, dtype=np.float64)
    for i in range(n):
        a = np.frombuffer(sa_list[i], dtype=np.int64)
        b = np.frombuffer(sb_list[i], dtype=np.int64)
        inter = np.intersect1d(a, b, assume_unique=True).size
        union = a.size + b.size - inter
        j[i] = inter / union if union else 0.0
    da = batch.column("doc_a").to_numpy(zero_copy_only=False)
    # the -1 sentinel pair (see q_dedup_minhash) must survive verification
    # so the final aggregate always sees >=1 typed row; filtered after that
    keep_np = (j >= cp.MINHASH_JACCARD_THRESHOLD) | (da == SENTINEL_ID)
    keep = pa.array(keep_np)
    return pa.table(
        {
            "doc_a": batch.column("doc_a").filter(keep),
            "doc_b": batch.column("doc_b").filter(keep),
            "jaccard": pa.array(j[keep_np], pa.float64()),
        }
    )


def _join_partitions() -> int:
    """Hash-join partition count: each partition is an aggregator ACTOR
    (spawn cost ~worker fork + imports), so small inputs want few — the
    label-propagation loop spawns a fresh join per iteration.  Cap 8 here;
    at real scale override via KMETA_JOIN_PARTITIONS (cluster-sized)."""
    cap = int(os.environ.get("KMETA_JOIN_PARTITIONS", "8"))
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(cap, cpus // 2))


def q_dedup_minhash(sf_dir: str):
    """Near-dup pairs: share ≥1 of 4 minhash bands AND exact Jaccard ≥ 0.5.

    Scale shape (10^12 docs): the band ``groupby`` moves only thin
    (doc_id, band_idx, band_val) rows; each doc's shingle set then crosses
    the wire once per side — two hash joins stamp packed sets onto the
    candidate pairs — and a vectorized per-batch kernel verifies Jaccard.
    The pair-DISTINCT runs only over the SURVIVORS (duplicates, ≤LSH_BANDS
    per pair, ride the cheap joins instead of paying a tiny-group
    aggregate over every candidate)."""
    ds = cp.read_augmented(sf_dir)
    bands = ds.map_batches(
        _minhash_band_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    sets_ = ds.map_batches(
        _shingle_set_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return _pairs_pipeline(bands, sets_)


def _pairs_pipeline(bands, sets_):
    """Shared MinHash tail: band sort → sorted-block pair emission →
    sentinel threading → double set-stamp joins → vectorized Jaccard
    verify → survivor-only DISTINCT.  `bands`/`sets_` may come from a live
    shingle pass OR a parquet state checkpoint (fuzzy_state_write) — the
    pair result depends only on the row MULTISET, so a resume run that
    unions checkpointed prior-crawl rows with freshly-shingled new rows is
    value-identical to the full recompute."""
    cand = bands.sort(["band_idx", "band_val"]).map_batches(
        _emit_pairs_sorted_block, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(_dedupe_pairs_batch, batch_format="pyarrow", zero_copy_batch=True)
    return _stamp_and_verify(cand, sets_)


def _stamp_and_verify(cand, sets_):
    """Shared candidate-pair verification tail: sentinel threading → double
    set-stamp hash joins → vectorized exact-Jaccard verify at the MinHash
    threshold → survivor-only DISTINCT → sentinel drop.  The MinHash candidate shape
    (sparse buckets, duplicates <= LSH_BANDS per pair) is the one where
    verify-by-join wins; the exact n-gram join is pair-dense and verifies
    inside its bucket blocks instead (see q_dedup_ngram)."""
    from ray.data.aggregate import Max as AMax

    import ray.data as rd

    # Lazy empty-guard: an all-empty join side reaches the hash aggregator
    # as schema-less partitions and acero rejects the key refs.  A driver
    # materialize()+count() here fixes that but serializes the pipeline —
    # the corpus re-read feeding _shingle_set_rows then can't overlap the
    # band sort (measured ~1.5x wall on the 180k-doc scale corpus).  Instead
    # union ONE sentinel row into each join side: the sentinel pair joins
    # only the sentinel set row, survives verification and the final
    # aggregate (so every stage sees >=1 typed row end-to-end, even on a
    # pair-free corpus), and a tail filter drops it.
    cand = cand.union(rd.from_arrow(pa.table(
        {"doc_a": pa.array([SENTINEL_ID], pa.int64()),
         "doc_b": pa.array([SENTINEL_ID], pa.int64())}
    )))
    sets_ = sets_.union(rd.from_arrow(pa.table(
        {"doc_id": pa.array([SENTINEL_ID], pa.int64()),
         "s63": pa.array([b""], pa.binary())}
    )))
    nparts = _join_partitions()
    j1 = cand.join(
        sets_, join_type="inner", num_partitions=nparts,
        on=("doc_a",), right_on=("doc_id",),
    ).map_batches(
        lambda t: pa.table({"doc_a": t.column("doc_a"), "doc_b": t.column("doc_b"),
                            "s63_a": t.column("s63")}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    j2 = j1.join(
        sets_, join_type="inner", num_partitions=nparts,
        on=("doc_b",), right_on=("doc_id",), right_suffix="_b",
    ).map_batches(
        lambda t: pa.table({"doc_a": t.column("doc_a"), "doc_b": t.column("doc_b"),
                            "s63_a": t.column("s63_a"), "s63_b": t.column("s63")}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    verified = j2.map_batches(
        _pair_jaccard_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return verified.groupby(["doc_a", "doc_b"]).aggregate(
        AMax("jaccard", alias_name="jaccard")
    ).map_batches(_drop_sentinel_pairs, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# persisted prior-crawl LSH state (VERDICT r4 task 1): recurring-ingestion
# contract — crawl N+1 must not re-shingle crawl N's documents.  The
# reference meets it with in_tail pos_file (README.md:80-102); the Ray
# analog is a parquet checkpoint of the reference split's derived LSH
# state: band rows (doc_id, band_idx, band_val, sig) and packed shingle
# sets (doc_id, s63).  The resume pipeline unions these rows with the NEW
# split's freshly-shingled rows — the exact multiset the full recompute
# produces — so results are value-identical while the expensive pass
# (tokenize → shingle → md5 → minhash over the history's text) runs zero
# times on old documents.
# ---------------------------------------------------------------------------

_STATE_BAND_SENT = "\x00state_sentinel"  # own singleton bucket: emits no pair


def _split_augmented(sf_dir: str, keep_ref: bool):
    """Augmented corpus filtered to one side of the deterministic
    prior/new crawl split (doc_id % INCR_REF_MOD)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        mask = (ids % INCR_REF_MOD == 0) if keep_ref else (ids % INCR_REF_MOD != 0)
        return batch.filter(pa.array(mask))

    return cp.read_augmented(sf_dir).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def fuzzy_state_write(sf_dir: str, state_dir: str) -> str:
    """Checkpoint the prior-crawl split's LSH state under ``state_dir``
    (``bands/``, ``sets/`` parquet + a sibling ``.done`` marker; atomic
    tmp-dir swap like the transcripts cache).  One typed sentinel row per
    table keeps the checkpoint non-empty even for a ref-free corpus: the
    band sentinel sits in its own singleton bucket (never emits a pair)
    and the set sentinel only ever joins the sentinel pair, which the
    pipeline tail drops anyway."""
    import shutil

    done = state_dir + ".done"
    if os.path.exists(done):
        return state_dir
    work = state_dir + ".deriving"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(os.path.join(work, "bands"))
    os.makedirs(os.path.join(work, "sets"))
    import ray.data as rd

    ref = _split_augmented(sf_dir, keep_ref=True)
    band_sent = pa.table(
        {
            "doc_id": pa.array([SENTINEL_ID], pa.int64()),
            "band_idx": pa.array([-1], pa.int32()),
            "band_val": pa.array([_STATE_BAND_SENT], pa.string()),
            "sig": pa.array([b"\x00" * (4 * cp.MINHASH_H)], pa.binary()),
        }
    )
    set_sent = pa.table(
        {
            "doc_id": pa.array([SENTINEL_ID], pa.int64()),
            "s63": pa.array([b""], pa.binary()),
        }
    )
    # Coalesce before writing: a 32-task derivation writes 33 near-empty
    # files, and those read back as 66 tiny blocks that poison the band
    # sort's range sampling (measured: resume 30 s vs full 21 s on the
    # 180k-doc corpus purely from this).  8 right-sized shards keep the
    # read parallel while feeding the sort real blocks; at cluster scale
    # the writer would shard per key range instead of a fixed count.
    _STATE_SHARDS = 8
    ref.map_batches(
        _minhash_band_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.from_arrow(band_sent)).repartition(_STATE_SHARDS).write_parquet(
        os.path.join(work, "bands")
    )
    ref.map_batches(
        _shingle_set_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.from_arrow(set_sent)).repartition(_STATE_SHARDS).write_parquet(
        os.path.join(work, "sets")
    )
    shutil.rmtree(state_dir, ignore_errors=True)
    os.replace(work, state_dir)
    with open(done, "w"):
        pass
    return state_dir


def default_fuzzy_state_dir(sf_dir: str) -> str:
    import hashlib

    return os.path.join(
        _CACHE_ROOT,
        "fuzzy_state_"
        + hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12],
    )


def q_dedup_incremental_fuzzy_resume(sf_dir: str, state_dir: str | None = None):
    """Persisted-state variant of :func:`q_dedup_incremental_fuzzy`: reads
    the prior crawl's checkpointed band/set rows (writing the checkpoint
    first if absent), shingles ONLY the new split, and runs the identical
    pair pipeline + flag tail.  Value-identical to the full recompute —
    the sorted-block pair emission (incl. MAX_BUCKET clipping, which
    depends on whole buckets) sees the same band-row multiset either way."""
    import ray.data as rd

    state_dir = state_dir or default_fuzzy_state_dir(sf_dir)
    fuzzy_state_write(sf_dir, state_dir)
    new_ds = _split_augmented(sf_dir, keep_ref=False)
    bands = new_ds.map_batches(
        _minhash_band_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        rd.read_parquet(
            os.path.join(state_dir, "bands"),
            columns=["doc_id", "band_idx", "band_val", "sig"],
        )
    )
    sets_ = new_ds.map_batches(
        _shingle_set_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        rd.read_parquet(
            os.path.join(state_dir, "sets"), columns=["doc_id", "s63"]
        )
    )
    return _incremental_fuzzy_from_pairs(_pairs_pipeline(bands, sets_), sf_dir)


def _sql_shingle_cte() -> str:
    k = cp.SHINGLE_K
    return f"""
tok AS (
  SELECT doc_id, {cp.SQL_TOKS.format(t='text')} AS toks FROM docs_aug
),
shq AS (
  SELECT doc_id,
    list_distinct(list_transform(generate_series(1, len(toks) - {k - 1}),
      i -> list_aggregate(toks[i:i + {k - 1}], 'string_agg', ' '))) AS shingles
  FROM tok WHERE len(toks) >= {k}
),
hs AS (
  SELECT doc_id,
    list_transform(shingles, s -> {cp.SQL_W32.format(s='s')}) AS hw,
    list_distinct(list_transform(shingles, s -> {cp.SQL_W63.format(s='s')})) AS s63
  FROM shq
)""".strip()


def dedup_minhash_oracle_sql() -> str:
    mh = ", ".join(
        f"list_min(list_transform(hw, h -> {cp.sql_minhash(i, 'h')}))"
        for i in range(cp.MINHASH_H)
    )
    band_selects = []
    for b in range(cp.LSH_BANDS):
        parts = " || ',' || ".join(
            f"mh[{b * cp.LSH_ROWS + r + 1}]" for r in range(cp.LSH_ROWS)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band_idx, {parts} AS band_val, mh FROM sig"
        )
    bands_sql = "\nUNION ALL\n".join(band_selects)
    return f"""
WITH {cp.AUG_DOCS_CTE},
{_sql_shingle_cte()},
sig AS (SELECT doc_id, [{mh}] AS mh FROM hs),
bands AS ({bands_sql}),
bands_r AS (
  SELECT *, row_number() OVER (PARTITION BY band_idx, band_val ORDER BY doc_id) AS rn
  FROM bands
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands_r x JOIN bands_r y
    ON x.band_idx = y.band_idx AND x.band_val = y.band_val AND x.doc_id < y.doc_id
  WHERE x.rn <= {MAX_BUCKET} AND y.rn <= {MAX_BUCKET}
    AND len(list_filter(generate_series(1, {cp.MINHASH_H}),
                        i -> x.mh[i] = y.mh[i])) >= {cp.MINHASH_PREFILTER_MIN}
)
SELECT doc_a, doc_b,
  len(list_intersect(a.s63, b.s63))::DOUBLE / len(list_distinct(a.s63 || b.s63)) AS jaccard
FROM cand JOIN hs a ON a.doc_id = doc_a JOIN hs b ON b.doc_id = doc_b
WHERE len(list_intersect(a.s63, b.s63))::DOUBLE / len(list_distinct(a.s63 || b.s63))
      >= {cp.MINHASH_JACCARD_THRESHOLD}
""".strip()


# ---------------------------------------------------------------------------
# exact n-gram Jaccard similarity join (prefix filtering)
# ---------------------------------------------------------------------------
#
# The EXACT counterpart of the MinHash pipeline: every pair of documents
# whose word-3-gram shingle sets have Jaccard >= NGRAM_JACCARD_THRESHOLD,
# with NO probabilistic candidate loss.  Candidate generation is prefix
# filtering (Chaudhuri et al. ICDE'06 "primitive operator"; Bayardo et al.
# WWW'07 All-Pairs): order each doc's distinct shingle hashes by a fixed
# global total order and index only the first  sz - ceil(t*sz) + 1  of
# them — two sets with J >= t MUST collide on at least one indexed prefix
# hash under ANY shared total order, so joining on prefix hashes is a
# lossless candidate generator.  The order we use is ascending DOCUMENT
# FREQUENCY (ties by hash) — the canonical All-Pairs choice, and not
# optional at scale: hash-order prefixes put globally common shingles
# (boilerplate) into ~every containing doc's prefix, creating hot postings
# whose capped buckets still emit ~(docs·plen/df)·C(cap,2) junk pairs
# (measured: >10 min on the 181k-doc bench corpus vs ~15 s with DF order).
# All thresholds use integer arithmetic (see corpus.py) so the DuckDB twin
# is bit-exact, and hot prefix hashes are capped at MAX_BUCKET smallest
# doc_ids exactly like the LSH buckets — deterministic, counted,
# replicated in the oracle.  (The oracle's cand CTE additionally carries
# the size prefilter 5*min(sz) >= 3*max(sz) to keep the SQL self-join
# tractable; the engine doesn't need it — the exact J >= 3/5 test
# subsumes it, so the twins agree.)
#
# Scale shape: instance rows are THIN (doc_id, h); DF is a run-length
# stamp over an h-sorted block scan (never a distinct-shingle-cardinality
# groupby or join); prefix selection is a doc_id sort + in-kernel lexsort
# (sorted-block contract: sort by the GROUP KEY ALONE so groups stay
# whole) with the doc's packed set riding each posting row; verification
# happens INSIDE each h-bucket by collision counting, so the candidate
# multiset (~200M pairs on the bench corpus, duplicated up to plen per
# true pair vs <= LSH_BANDS for MinHash) never materializes and no join
# ever runs.


def _ngram_instance_rows(batch: pa.Table) -> pa.Table:
    """doc → distinct (doc_id, h) shingle-hash instance rows, fully
    vectorized: factorize-once hashing, then a per-doc distinct over the
    HASH values (lexsort + lag scan) — by hash, not by shingle string,
    mirroring _shingle_set_rows' np.unique-over-w63 so a within-doc w63
    collision collapses identically on both sides of the oracle
    (list_distinct over hashes)."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    fs = _batch_shingles(batch)
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "h": pa.array([], pa.int64())}
    )
    if fs is None:
        return empty
    rows, codes, uniques = fs
    w63_u = np.fromiter((cp.w63(u) for u in uniques), np.int64, len(uniques))
    hv = w63_u[codes]
    order = np.lexsort((hv, rows))
    r_s, h_s = rows[order], hv[order]
    keep = np.r_[True, (r_s[1:] != r_s[:-1]) | (h_s[1:] != h_s[:-1])]
    return pa.table(
        {
            "doc_id": pa.array(ids[r_s[keep]], pa.int64()),
            "h": pa.array(h_s[keep], pa.int64()),
        }
    )


def _stamp_df_sorted_block(batch: pa.Table) -> pa.Table:
    """Document frequency stamped onto instance rows by a run-length scan
    of a block SORTED by h: equal h is contiguous and never split across
    blocks (sorted-block contract), so the run length IS the global df.
    Replaces a groupby at distinct-shingle cardinality + an 8M-row join —
    the per-group-Python anti-pattern measured >10 min on the 181k-doc
    bench corpus; this shape is one thin sort + a C-speed scan."""
    n = len(batch)
    if n == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "h": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
            }
        )
    h = batch.column("h").to_numpy(zero_copy_only=False)
    change = np.flatnonzero(h[1:] != h[:-1]) + 1
    starts = np.r_[0, change]
    lens = np.diff(np.r_[starts, n])
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "h": batch.column("h"),
            "df": pa.array(np.repeat(lens, lens), pa.int64()),
        }
    )


def _emit_prefix_sorted_block(batch: pa.Table) -> pa.Table:
    """Prefix-posting rows (h, doc_id, sz, pos, s63) from a block of
    df-stamped instance rows SORTED by doc_id (group key alone — the
    sorted-block contract guarantees each doc arrives whole; (df, h) order
    is restored by an in-kernel lexsort, exactly like the conv-window
    kernels restore turn order).  Keeps the first  sz - ceil(t*sz) + 1
    rows per doc in (df, h) ascending order, each stamped with the doc's
    PACKED full hash set (same ascending-int64 packing as
    :func:`_shingle_set_rows`) — the pair-dense corpora this operator
    exists for make verify-by-join ship two payloads per PAIR, so the
    payload rides the posting row once per prefix slot and verification
    happens inside the bucket block (the cosine-LSH lesson,
    simsearch._nd_bucket_verify_sorted_block)."""
    n = len(batch)
    empty = pa.table(
        {
            "h": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "s63": pa.array([], pa.binary()),
        }
    )
    if n == 0:
        return empty
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    h = batch.column("h").to_numpy(zero_copy_only=False)
    df = batch.column("df").to_numpy(zero_copy_only=False)
    order = np.lexsort((h, df, ids))
    ids, h = ids[order], h[order]
    change = np.flatnonzero(ids[1:] != ids[:-1]) + 1
    starts = np.r_[0, change]
    lens = np.diff(np.r_[starts, n])
    plen = lens - (3 * lens + 4) // 5 + 1  # sz - ceil(0.6*sz) + 1, exact
    pos = np.arange(n) - np.repeat(starts, lens)
    keep = pos < np.repeat(plen, lens)
    # packed per-doc full set: instance h values are distinct per doc, so a
    # per-doc ascending sort IS the _shingle_set_rows packing
    packed = [np.sort(chunk).tobytes() for chunk in np.split(h, starts[1:])]
    doc_idx = np.repeat(np.arange(len(starts)), lens)[keep]
    return pa.table(
        {
            "h": pa.array(h[keep], pa.int64()),
            "doc_id": pa.array(ids[keep], pa.int64()),
            "s63": pa.array([packed[i] for i in doc_idx], pa.binary()),
        }
    )


def _expand_run_pairs(run_starts: np.ndarray, run_lens: np.ndarray):
    """All within-run index pairs (a < b, positions into the parent array)
    for runs of length >= 2, fully vectorized (no per-run Python): element
    at in-run position p of a k-run pairs with the k-1-p elements after
    it."""
    zero = np.array([], np.int64)
    if not len(run_lens):
        return zero, zero
    total = int(run_lens.sum())
    # parent-array position of every run element
    cl = np.cumsum(run_lens)
    elem = np.repeat(run_starts, run_lens) + (
        np.arange(total) - np.repeat(cl - run_lens, run_lens)
    )
    # fan-out per element: elements remaining after it in its run
    reps = np.repeat(run_starts + run_lens, run_lens) - elem - 1
    a_idx = np.repeat(elem, reps)
    if not a_idx.size:
        return zero, zero
    csum = np.cumsum(reps)
    off = np.arange(csum[-1]) - np.repeat(csum - reps, reps)
    return a_idx, a_idx + off + 1


def _ngram_bucket_verify_sorted_block(batch: pa.Table) -> pa.Table:
    """Exact-Jaccard survivors from a block of prefix postings SORTED by h:
    candidate pairs never leave the task — each bucket (equal-h run, capped
    at MAX_BUCKET smallest doc_ids with the clip counter) verifies ALL its
    member pairs at once by collision counting: concatenate the members'
    packed full sets, sort once, expand each equal-hash run into member
    pairs, and bincount into a g×g intersection matrix.  Cost is the
    bucket's COLLISION MASS (sum of pairwise intersections), not
    pairs × set-size × log — the per-pair np.intersect1d loop this
    replaces measured 65 s on the 181k-doc bench corpus (~200M candidate
    pairs, ~40k true); materializing candidates for verify-by-join
    measured >10 min.  The threshold test is integer-exact:
    J >= 3/5  ⟺  8*inter >= 3*(sz_a + sz_b)."""
    n = len(batch)
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    if n == 0:
        return empty
    h = batch.column("h").to_numpy(zero_copy_only=False)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    payload = batch.column("s63").to_pylist()
    change = np.flatnonzero(h[1:] != h[:-1]) + 1
    starts = np.r_[0, change]
    ends = np.r_[change, n]
    out_a, out_b, out_j = [], [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        order = np.argsort(ids[s:e], kind="stable")
        if len(order) > MAX_BUCKET:
            _note_bucket_clip(len(order))
            order = order[:MAX_BUCKET]
        gidx = (np.arange(s, e)[order]).tolist()
        g = ids[gidx]
        arrs = [np.frombuffer(payload[k], dtype=np.int64) for k in gidx]
        sizes = np.fromiter((a.size for a in arrs), np.int64, len(arrs))
        gN = len(arrs)
        hc = np.concatenate(arrs)
        member = np.repeat(np.arange(gN), sizes)
        o = np.argsort(hc, kind="stable")  # stable: member asc within ties
        hs, ms = hc[o], member[o]
        rch = np.flatnonzero(hs[1:] != hs[:-1]) + 1
        rst = np.r_[0, rch]
        rlen = np.diff(np.r_[rst, hs.size])
        multi = rlen >= 2
        ai, bi = _expand_run_pairs(rst[multi], rlen[multi])
        if not ai.size:
            continue
        # ms ascending within a run (stable sort) → ms[ai] < ms[bi]
        flat = ms[ai] * gN + ms[bi]
        inter = np.bincount(flat, minlength=gN * gN).reshape(gN, gN)
        szsum = sizes[:, None] + sizes[None, :]
        ii, jj = np.nonzero(8 * inter >= 3 * szsum)
        keep = ii < jj  # intersections only accumulate at i<j; guard anyway
        ii, jj = ii[keep], jj[keep]
        if not ii.size:
            continue
        iv = inter[ii, jj].astype(np.float64)
        out_a.append(g[ii])
        out_b.append(g[jj])
        out_j.append(iv / (szsum[ii, jj] - iv))
    if not out_a:
        return empty
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
            "jaccard": pa.array(np.concatenate(out_j), pa.float64()),
        }
    )


def q_dedup_ngram(sf_dir: str):
    """Exact n-gram Jaccard near-dup pairs: J(shingles_a, shingles_b) >= 0.6
    with lossless prefix-filter candidate generation (no LSH recall loss).

    Scale shape (10^12 docs): thin (doc_id, h) instance rows → h sort +
    run-length DF stamp → doc_id sort + in-kernel prefix selection (packed
    set rides the posting rows) → h sort + in-block collision-counting
    verification (candidates never materialize) → survivor-only DISTINCT.
    One corpus read, three thin-row sorts, zero joins."""
    inst = cp.read_augmented(sf_dir).map_batches(
        _ngram_instance_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return _ngram_pairs_from_instances(inst)


def _ngram_pairs_from_instances(inst):
    """Shared exact-join tail over a Dataset of distinct (doc_id, h)
    instance rows — used by the live pipeline and the persisted-state
    resume (whose instance rows come from a parquet checkpoint ∪ the new
    split; DF, prefixes and buckets depend only on the row multiset, so
    both paths are value-identical)."""
    from ray.data.aggregate import Max as AMax

    import ray.data as rd

    # sentinel instance row: keeps every sort/aggregate input typed even on
    # a shingle-free corpus (w63 >= 0, so h=-1 is its own singleton posting
    # bucket — never emits a pair)
    inst = inst.union(rd.from_arrow(pa.table(
        {"doc_id": pa.array([SENTINEL_ID], pa.int64()),
         "h": pa.array([-1], pa.int64())}
    )))
    stamped = inst.sort("h").map_batches(
        _stamp_df_sorted_block, batch_format="pyarrow", zero_copy_batch=True
    )
    posts = stamped.sort("doc_id").map_batches(
        _emit_prefix_sorted_block, batch_format="pyarrow", zero_copy_batch=True
    )
    verified = posts.sort("h").map_batches(
        _ngram_bucket_verify_sorted_block,
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # a true pair is verified once per shared prefix bucket that survives
    # the filters (>=1, <= plen) — collapse to one row; the sentinel pair
    # keeps the aggregate input typed on a pair-free corpus
    verified = verified.union(rd.from_arrow(pa.table(
        {"doc_a": pa.array([SENTINEL_ID], pa.int64()),
         "doc_b": pa.array([SENTINEL_ID], pa.int64()),
         "jaccard": pa.array([0.0], pa.float64())}
    )))
    return verified.groupby(["doc_a", "doc_b"]).aggregate(
        AMax("jaccard", alias_name="jaccard")
    ).map_batches(_drop_sentinel_pairs, batch_format="pyarrow", zero_copy_batch=True)


def dedup_ngram_oracle_sql() -> str:
    t = cp.NGRAM_JACCARD_THRESHOLD
    return f"""
WITH {cp.AUG_DOCS_CTE},
{_sql_shingle_cte()},
inst AS (SELECT doc_id, unnest(s63) AS h FROM hs),
dfreq AS (SELECT h, count(*)::BIGINT AS df FROM inst GROUP BY h),
ranked AS (
  SELECT i.doc_id, i.h,
    row_number() OVER (PARTITION BY i.doc_id ORDER BY d.df, i.h) AS rk,
    count(*) OVER (PARTITION BY i.doc_id) AS sz
  FROM inst i JOIN dfreq d USING (h)
),
pref AS (
  SELECT doc_id, sz, h FROM ranked WHERE rk <= sz - ((3*sz + 4) // 5) + 1
),
pref_r AS (
  SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM pref
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM pref_r x JOIN pref_r y ON x.h = y.h AND x.doc_id < y.doc_id
  WHERE x.rn <= {MAX_BUCKET} AND y.rn <= {MAX_BUCKET}
    AND 5 * least(x.sz, y.sz) >= 3 * greatest(x.sz, y.sz)
)
SELECT doc_a, doc_b,
  len(list_intersect(a.s63, b.s63))::DOUBLE / len(list_distinct(a.s63 || b.s63)) AS jaccard
FROM cand JOIN hs a ON a.doc_id = doc_a JOIN hs b ON b.doc_id = doc_b
WHERE len(list_intersect(a.s63, b.s63))::DOUBLE / len(list_distinct(a.s63 || b.s63)) >= {t}
""".strip()


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# near-dup clusters: connected components over MinHash pairs → dedup decision
# ---------------------------------------------------------------------------

CLUSTER_MAX_ITERS = 30


def _both_directions(t: pa.Table) -> pa.Table:
    a = t.column("doc_a").combine_chunks()
    b = t.column("doc_b").combine_chunks()
    return pa.table(
        {"src": pa.chunked_array([a, b]), "dst": pa.chunked_array([b, a])}
    )


def q_dedup_clusters(sf_dir: str):
    """Each doc → its cluster's canonical (minimum) doc_id + keep/drop flag,
    where clusters are connected components of the MinHash near-dup pairs.
    See :func:`cluster_assign` for the distributed shape."""
    return cluster_assign(q_dedup_minhash(sf_dir), cp.read_augmented_ids(sf_dir))


def q_dedup_ngram_incremental(sf_dir: str):
    """LOSSLESS incremental fuzzy dedup: flag new-split docs whose shingle
    set has exact Jaccard >= 0.6 with ANY reference-split doc — the
    q_dedup_incremental_fuzzy contract without LSH recall loss (a
    re-crawled page the MinHash bands happen to miss still gets flagged).
    Composes the exact n-gram pair pipeline with the shared cross-split
    tail; the extra stages shuffle only (doc_id, count) rows."""
    return _incremental_fuzzy_from_pairs(q_dedup_ngram(sf_dir), sf_dir)


def dedup_ngram_incremental_oracle_sql() -> str:
    return f"""
WITH {cp.AUG_DOCS_CTE},
pairs AS (SELECT doc_a, doc_b FROM ({dedup_ngram_oracle_sql()}) p),
crossm AS (
  SELECT CASE WHEN doc_a % {INCR_REF_MOD} = 0 THEN doc_b ELSE doc_a END AS doc_id
  FROM pairs
  WHERE (doc_a % {INCR_REF_MOD} = 0) <> (doc_b % {INCR_REF_MOD} = 0)
),
agg AS (SELECT doc_id, count(*)::BIGINT AS n FROM crossm GROUP BY doc_id),
newd AS (SELECT doc_id FROM docs_aug WHERE doc_id % {INCR_REF_MOD} <> 0)
SELECT n.doc_id,
  coalesce(a.n, 0) AS n_ref_matches,
  coalesce(a.n, 0) > 0 AS is_fuzzy_dup
FROM newd n LEFT JOIN agg a USING (doc_id)
""".strip()


def default_ngram_state_dir(sf_dir: str) -> str:
    import hashlib

    return os.path.join(
        _CACHE_ROOT,
        "ngram_state_"
        + hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12],
    )


def ngram_state_write(sf_dir: str, state_dir: str) -> str:
    """Checkpoint the prior-crawl split's (doc_id, h) instance rows under
    ``state_dir`` (``inst/`` parquet + ``.done`` marker; atomic tmp-dir
    swap).  The exact join's ENTIRE derived state is these thin rows — DF
    stamps, prefixes, packed sets and buckets are all recomputed from the
    instance multiset, so the checkpoint is one table (vs the LSH state's
    bands+sets pair).  Sentinel h=-2 keeps an empty-ref checkpoint typed
    (distinct from the pipeline's own h=-1 sentinel so doc -1 never forms
    a multi-row bucket)."""
    import shutil

    done = state_dir + ".done"
    if os.path.exists(done):
        return state_dir
    work = state_dir + ".deriving"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(os.path.join(work, "inst"))
    import ray.data as rd

    sent = pa.table(
        {"doc_id": pa.array([SENTINEL_ID], pa.int64()),
         "h": pa.array([-2], pa.int64())}
    )
    _split_augmented(sf_dir, keep_ref=True).map_batches(
        _ngram_instance_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.from_arrow(sent)).repartition(8).write_parquet(
        os.path.join(work, "inst")
    )
    shutil.rmtree(state_dir, ignore_errors=True)
    os.replace(work, state_dir)
    with open(done, "w") as f:
        f.write("ok")
    return state_dir


def q_dedup_ngram_incremental_resume(sf_dir: str, state_dir: str | None = None):
    """Persisted-state variant of :func:`q_dedup_ngram_incremental`: reads
    the prior crawl's checkpointed instance rows (writing the checkpoint
    first if absent), tokenizes/shingles/hashes ONLY the new split, and
    runs the identical exact-join + cross-split tail.  Value-identical to
    the full recompute — DF order, prefixes and bucket caps depend only on
    the instance-row multiset, which is the same either way."""
    import ray.data as rd

    state_dir = state_dir or default_ngram_state_dir(sf_dir)
    ngram_state_write(sf_dir, state_dir)
    # right-size the checkpoint read: without override_num_blocks Ray
    # re-splits each shard per row group (8 files → 64 tiny blocks), and
    # the inflated block count rides through every sort into the final
    # hash aggregate's partition count — ~97 aggregator actors at ~2 s
    # import each (measured: resume 30 s vs full 17.5 s from this alone)
    inst = _split_augmented(sf_dir, keep_ref=False).map_batches(
        _ngram_instance_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.read_parquet(os.path.join(state_dir, "inst"),
                            columns=["doc_id", "h"],
                            override_num_blocks=8))
    return _incremental_fuzzy_from_pairs(_ngram_pairs_from_instances(inst), sf_dir)


def q_dedup_ngram_clusters(sf_dir: str):
    """The LOSSLESS dedup decision: connected components over the exact
    n-gram Jaccard pairs (q_dedup_ngram) instead of the MinHash ones — no
    LSH-missed pair can under-merge a cluster, so the keep/drop flags are
    exactly the J >= 0.6 transitive closure.  Same distributed
    pointer-jumping label propagation (:func:`cluster_assign`)."""
    return cluster_assign(q_dedup_ngram(sf_dir), cp.read_augmented_ids(sf_dir))


def dedup_ngram_clusters_oracle_sql() -> str:
    return f"""
WITH RECURSIVE p AS ({dedup_ngram_oracle_sql()}),
edges AS (SELECT doc_a AS a, doc_b AS b FROM p UNION ALL SELECT doc_b, doc_a FROM p),
nodes AS ({cp.AUG_IDS_SQL}),
reach AS (
  SELECT doc_id AS doc, doc_id AS lbl FROM nodes
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.doc
)
SELECT doc AS doc_id, min(lbl) AS canonical_id,
  CAST(min(lbl) = doc AS BIGINT) AS is_kept
FROM reach GROUP BY doc
""".strip()


def q_dedup_cluster_sizes(sf_dir: str):
    """Near-dup cluster-size histogram: (cluster_size, n_clusters) over
    the MinHash connected components — the one-page dedup report
    (singleton mass vs heavy boilerplate clusters) behind the keep/drop
    decision.  Two counting aggregates over thin int columns; sentinel
    rows keep both typed on an empty corpus."""
    import ray.data as rd

    from ray.data.aggregate import Count

    cl = q_dedup_clusters(sf_dir)
    sizes = (
        cl.union(rd.from_arrow(pa.table(
            {"doc_id": pa.array([SENTINEL_ID], pa.int64()),
             "canonical_id": pa.array([SENTINEL_ID], pa.int64()),
             "is_kept": pa.array([0], pa.int64())}
        )))
        .groupby("canonical_id")
        .aggregate(Count(alias_name="cluster_size"))
    )

    def drop_sent(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        return pa.table(
            {"cluster_size": t.filter(
                pc_.not_equal(t.column("canonical_id"), SENTINEL_ID)
            ).column("cluster_size").cast(pa.int64())}
        )

    hist = (
        sizes.map_batches(drop_sent, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(pa.table(
            {"cluster_size": pa.array([SENTINEL_ID], pa.int64())}
        )))
        .groupby("cluster_size")
        .aggregate(Count(alias_name="n_clusters"))
    )

    def fin(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        return t.filter(pc_.not_equal(t.column("cluster_size"), SENTINEL_ID))

    return hist.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def dedup_cluster_sizes_oracle_sql() -> str:
    return f"""
WITH RECURSIVE cl AS ({dedup_clusters_oracle_sql()}),
sizes AS (SELECT canonical_id, count(*)::BIGINT AS cluster_size
          FROM cl GROUP BY canonical_id)
SELECT cluster_size, count(*)::BIGINT AS n_clusters
FROM sizes GROUP BY cluster_size
""".strip()


def cluster_assign(pairs, ids_ds):
    """Connected-components dedup decision over an arbitrary near-dup pair
    Dataset(doc_a, doc_b, …) and node universe Dataset(doc_id) — shared by
    the MinHash doc clusters and the embedding semantic-dedup clusters.

    Fully distributed (round-1 VERDICT: the driver union-find assumed the
    pair list fits driver memory — a dup-heavy crawl breaks that).  Min-
    label propagation over the edge list: labels live only for edge nodes
    (tiny vs the corpus); each round sends every node's label across its
    edges (hash join) and keeps the per-node minimum (groupby Min); the
    label sum is monotone decreasing, so equal consecutive sums == fixed
    point.  Rounds needed = component diameter (near-dup clusters are
    shallow; CLUSTER_MAX_ITERS bounds pathological chains).  The final
    corpus-wide assignment is a left join of doc_ids against the converged
    labels — nothing ever materializes on the driver."""
    from ray.data.aggregate import Min as AMin

    nparts = _join_partitions()
    edges = pairs.map_batches(
        _both_directions, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # init: each edge node's label = min(self, min neighbor)
    labels = edges.groupby("src").aggregate(AMin("dst", alias_name="nbr"))
    # repartition before every join use: aggregate outputs can contain
    # schema-less empty blocks (empty groupby partitions) that acero joins
    # reject — repartition rebuilds typed blocks (labels are tiny: edge
    # nodes only)
    labels = labels.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("src"),
                "lbl": pc.min_element_wise(t.column("src"), t.column("nbr")),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).repartition(nparts).materialize()

    if labels.count() == 0:  # no near-dup pairs at all: identity assignment
        return ids_ds.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "canonical_id": t.column("doc_id"),
                    "is_kept": pa.array(np.ones(len(t), dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    prev_sum = labels.sum("lbl") or 0
    for _ in range(CLUSTER_MAX_ITERS):
        # push labels across edges: (src, dst) ⋈ (node=src, lbl) → (dst, lbl)
        msgs = edges.join(
            labels, join_type="inner", num_partitions=nparts,
            on=("src",), right_on=("node",),
        ).select_columns(["dst", "lbl"]).map_batches(
            lambda t: pa.table({"node": t.column("dst"), "lbl": t.column("lbl")}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        labels = (
            labels.union(msgs)
            .groupby("node")
            .aggregate(AMin("lbl", alias_name="lbl"))
            .repartition(nparts)  # launder empty-partition blocks pre-join
            .materialize()
        )
        # pointer jumping (path halving): lbl ← label(lbl).  Each round the
        # edge push moves a label ONE hop and this self-join DOUBLES every
        # already-propagated path, so convergence takes O(log diameter)
        # rounds instead of O(diameter) — a 200-link chain closes in ~8
        # rounds (VERDICT r3 task 6; pinned by the chain property test).
        lbl_as_node = labels.map_batches(
            lambda t: pa.table({"jnode": t.column("node"), "jlbl": t.column("lbl")}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        labels = labels.join(
            lbl_as_node, join_type="left_outer", num_partitions=nparts,
            on=("lbl",), right_on=("jnode",),
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "lbl": pc.min_element_wise(
                        pc.coalesce(t.column("jlbl"), t.column("lbl")),
                        t.column("lbl"),
                    ),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        ).repartition(nparts).materialize()
        cur_sum = labels.sum("lbl") or 0
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        _log.warning(
            "label propagation hit CLUSTER_MAX_ITERS=%d before convergence",
            CLUSTER_MAX_ITERS,
        )

    # corpus-wide assignment: left join doc ids against converged labels
    joined = ids_ds.join(
        labels, join_type="left_outer", num_partitions=nparts,
        on=("doc_id",), right_on=("node",),
    )

    def finalize(t: pa.Table) -> pa.Table:
        canon = pc.coalesce(t.column("lbl"), t.column("doc_id"))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "canonical_id": canon,
                "is_kept": pc.cast(pc.equal(canon, t.column("doc_id")), pa.int64()),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def dedup_clusters_oracle_sql() -> str:
    """Connected components as a recursive min-label closure over the SAME
    MinHash pair SQL (reach = every label visible from a doc; component id =
    its minimum)."""
    return f"""
WITH RECURSIVE p AS ({dedup_minhash_oracle_sql()}),
edges AS (SELECT doc_a AS a, doc_b AS b FROM p UNION ALL SELECT doc_b, doc_a FROM p),
nodes AS ({cp.AUG_IDS_SQL}),
reach AS (
  SELECT doc_id AS doc, doc_id AS lbl FROM nodes
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.doc
)
SELECT doc AS doc_id, min(lbl) AS canonical_id,
  CAST(min(lbl) = doc AS BIGINT) AS is_kept
FROM reach GROUP BY doc
""".strip()


# simhash dense-matmul doc-chunk size: bounds the count-matrix allocation
# at DENSE_CHUNK_DOCS × U float64 per chunk regardless of block size
_SIMHASH_CHUNK_DOCS = 2048


def simhash_band_rows(batch: pa.Table) -> pa.Table:
    """doc → 4 band rows (doc_id, band_idx, band_val, simhash), vectorized:
    tokens factorized per batch (md5 once per DISTINCT token), a U×62 ±1
    bit matrix for the vocab, and the per-doc weighted bit sums as dense
    (chunk × U) @ (U × 62) float64 matmuls over doc CHUNKS — float64 keeps
    BLAS (int64 matmul is a generic loop) and is exact (counts × ±1 sums
    stay far below 2^53); chunking bounds the count-matrix allocation no
    matter how large the block is (map_batches passes whole blocks)."""
    import pandas as pd

    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "band_idx": pa.array([], pa.int32()),
            "band_val": pa.array([], pa.int64()),
            "simhash": pa.array([], pa.int64()),
        }
    )
    s = pd.Series(batch.column("text").to_pandas())
    ex = s.str.split().explode().dropna()
    if not len(ex):
        return empty
    codes, uniques = pd.factorize(ex.to_numpy())
    rows = ex.index.to_numpy(dtype=np.int64)
    h_u = np.fromiter((cp.w64(u) for u in uniques), np.uint64, len(uniques))
    bits_u = (
        (h_u[:, None] >> np.arange(cp.SIMHASH_BITS, dtype=np.uint64)[None, :])
        & np.uint64(1)
    ).astype(np.float64) * 2.0 - 1.0  # (U, 62) in ±1

    # doc universe: positions that HAVE tokens, in block order
    starts = np.r_[0, np.flatnonzero(np.diff(rows)) + 1]
    ends = np.r_[starts[1:], len(rows)]
    docs = ids[rows[starts]]
    u = len(uniques)
    n_docs = len(starts)
    drow = np.repeat(np.arange(n_docs), ends - starts)
    sums = np.empty((n_docs, cp.SIMHASH_BITS), dtype=np.float64)
    for c0 in range(0, n_docs, _SIMHASH_CHUNK_DOCS):
        c1 = min(c0 + _SIMHASH_CHUNK_DOCS, n_docs)
        lo, hi = starts[c0], ends[c1 - 1]
        cmat = np.zeros((c1 - c0, u), dtype=np.float64)
        np.add.at(cmat, (drow[lo:hi] - c0, codes[lo:hi]), 1.0)
        sums[c0:c1] = cmat @ bits_u
    sim = ((sums > 0).astype(np.uint64) << np.arange(cp.SIMHASH_BITS, dtype=np.uint64)).sum(
        axis=1
    ).astype(np.int64)

    n = len(docs)
    out_id, out_band, out_val, out_sim = [], [], [], []
    for b in range(cp.SIMHASH_N_BANDS):
        out_id.append(docs)
        out_band.append(np.full(n, b, dtype=np.int32))
        out_val.append((sim >> (cp.SIMHASH_BAND_BITS * b)) & 0xFFFF)
        out_sim.append(sim)
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
            "band_idx": pa.array(np.concatenate(out_band), pa.int32()),
            "band_val": pa.array(np.concatenate(out_val), pa.int64()),
            "simhash": pa.array(np.concatenate(out_sim), pa.int64()),
        }
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over an int64 array."""
    u = np.ascontiguousarray(x).view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(u, axis=1).sum(axis=1).astype(np.int64)


def _emit_hamming_sorted_block(batch: pa.Table) -> pa.Table:
    """Hamming-filtered pairs from a block of simhash band rows SORTED by
    (band_idx, band_val) — same vectorized boundary-scan shape as
    _emit_pairs_sorted_block (skips the per-group Python of map_groups over
    ~1 group per distinct band value), same deterministic doc_id cap."""
    n = len(batch)
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64()),
        }
    )
    if n == 0:
        return empty
    bi = batch.column("band_idx").to_numpy(zero_copy_only=False)
    bv = batch.column("band_val").to_numpy(zero_copy_only=False)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    sims = batch.column("simhash").to_numpy(zero_copy_only=False)
    change = np.flatnonzero((bi[1:] != bi[:-1]) | (bv[1:] != bv[:-1])) + 1
    starts = np.r_[0, change]
    ends = np.r_[change, n]
    outs_a, outs_b, outs_x = [], [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        order = np.argsort(ids[s:e], kind="stable")
        if len(order) > MAX_BUCKET:
            _note_bucket_clip(len(order))
            order = order[:MAX_BUCKET]  # smallest doc_ids; oracle-replicated
        g_ids = ids[s:e][order]
        g_sim = sims[s:e][order]
        a_idx, b_idx = np.triu_indices(len(g_ids), k=1)
        outs_a.append(g_ids[a_idx])
        outs_b.append(g_ids[b_idx])
        outs_x.append(g_sim[a_idx] ^ g_sim[b_idx])
    if not outs_a:
        return empty
    a = np.concatenate(outs_a)
    b = np.concatenate(outs_b)
    ham = _popcount64(np.concatenate(outs_x))
    keep = ham <= cp.SIMHASH_HAMMING_THRESHOLD
    return pa.table(
        {
            "doc_a": pa.array(a[keep], pa.int64()),
            "doc_b": pa.array(b[keep], pa.int64()),
            "hamming": pa.array(ham[keep], pa.int64()),
        }
    )


def q_dedup_simhash(sf_dir: str):
    """Near-dup pairs: share ≥1 of 4 16-bit simhash bands AND Hamming ≤ 3."""
    ds = cp.read_augmented(sf_dir)
    bands = ds.map_batches(
        simhash_band_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = bands.sort(["band_idx", "band_val"]).map_batches(
        _emit_hamming_sorted_block, batch_format="pyarrow", zero_copy_batch=True
    )
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


def dedup_simhash_oracle_sql() -> str:
    w64 = cp.SQL_W64.format(s="t")
    band_selects = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band_idx, (simhash >> {cp.SIMHASH_BAND_BITS * b}) & 65535 AS band_val, simhash FROM sim"
        for b in range(cp.SIMHASH_N_BANDS)
    )
    return f"""
WITH {cp.AUG_DOCS_CTE},
tok AS (
  SELECT doc_id, {cp.SQL_TOKS.format(t='text')} AS toks FROM docs_aug
),
th AS (
  SELECT doc_id, list_transform(toks, t -> {w64}) AS hs
  FROM tok WHERE len(toks) >= 1
),
sim AS (
  SELECT doc_id,
    list_sum(list_transform(generate_series(0, {cp.SIMHASH_BITS - 1}), j ->
      CASE WHEN list_sum(list_transform(hs, h ->
            CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END)) > 0
           THEN (1::BIGINT << j) ELSE 0 END))::BIGINT AS simhash
  FROM th
),
bands AS ({band_selects}),
bands_r AS (
  SELECT *, row_number() OVER (PARTITION BY band_idx, band_val ORDER BY doc_id) AS rn
  FROM bands
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         x.simhash AS sa, y.simhash AS sb
  FROM bands_r x JOIN bands_r y
    ON x.band_idx = y.band_idx AND x.band_val = y.band_val AND x.doc_id < y.doc_id
  WHERE x.rn <= {MAX_BUCKET} AND y.rn <= {MAX_BUCKET}
)
SELECT doc_a, doc_b, bit_count(xor(sa, sb))::BIGINT AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {cp.SIMHASH_HAMMING_THRESHOLD}
""".strip()


# ---------------------------------------------------------------------------
# Bloom-filter incremental dedup (sketch-based membership)
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 17  # filter bits: 16 KiB bitset broadcast once per worker
BLOOM_K = 4        # hash functions (double hashing: p_i = h1 + i·h2 mod M)


def _bloom_positions(h64: np.ndarray):
    """(n,) uint64 text hashes → (n, BLOOM_K) int64 bit positions via double
    hashing; h2 forced odd so the stride covers every residue mod the
    power-of-two BLOOM_M.  Twin: same arithmetic in dedup_bloom_oracle_sql."""
    m = np.uint64(BLOOM_M)
    h1 = (h64 % m).astype(np.int64)
    h2 = (((h64 // m) % m).astype(np.int64)) | 1
    i = np.arange(BLOOM_K, dtype=np.int64)[None, :]
    return (h1[:, None] + i * h2[:, None]) % BLOOM_M


def _batch_w64(batch: pa.Table):
    """(text column → uint64 md5-prefix hashes, null-text mask).  Per-doc
    md5 is the oracle-parity cost every hash op here pays (q_doc_fingerprint
    note); nulls map to 0 with the mask excluded by callers."""
    texts = batch.column("text").to_pylist()
    h = np.fromiter(
        (0 if t is None else cp.w64(t) for t in texts), dtype=np.uint64, count=len(texts)
    )
    valid = np.fromiter((t is not None for t in texts), dtype=bool, count=len(texts))
    return h, valid


def q_dedup_bloom(sf_dir: str):
    """Incremental dedup via a Bloom filter — the sketch that replaces the
    exact reference-hash join when even the DISTINCT-hash table is too big
    to shuffle per increment (crawl-N vs an all-prior-crawls filter).  A
    new doc is flagged ``bloom_hit`` when ALL of its BLOOM_K bit positions
    are set by the reference split; false positives are inherent to the
    sketch (rate ≈ (1-e^{-kn/m})^k) and the oracle twin replicates the
    exact same bit arithmetic, so the flag is deterministic and
    SQL-checkable, not fuzzy.

    Ray shape (10^12 docs): the reference split streams through a per-batch
    DISTINCT-positions combiner (≤ BLOOM_K rows per doc, ≤ BLOOM_M per
    batch) → ``groupby(pos)`` → a ≤BLOOM_M-row collect packed into a 16 KiB
    bitset and ``ray.put`` ONCE — driver memory is bounded by the
    configured filter size, never by corpus content (the capped-broadcast
    contract).  The new split then streams one stateless probe
    ``map_batches`` (task closure over the broadcast ref — no actor pool
    needed for read-only state).  Neither corpus ever shuffles."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    def ref_pos_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % INCR_REF_MOD == 0))
        h, valid = _batch_w64(sub)
        if not valid.any():
            return pa.table({"pos": pa.array([], pa.int64())})
        pos = np.unique(_bloom_positions(h[valid]))
        return pa.table({"pos": pa.array(pos, pa.int64())})

    ds = cp.read_augmented(sf_dir)
    pos_t = (
        ds.map_batches(ref_pos_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pos")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    bits = np.zeros(BLOOM_M, dtype=bool)
    if len(pos_t) and "pos" in pos_t.columns:  # empty-Dataset column guard
        bits[pos_t["pos"].to_numpy(dtype=np.int64)] = True
    bits_ref = ray.put(bits)

    def probe(batch: pa.Table) -> pa.Table:
        b = ray.get(bits_ref)  # local-store hit after first task on a node
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % INCR_REF_MOD != 0))
        h, valid = _batch_w64(sub)
        hit = np.zeros(len(h), dtype=bool)
        if valid.any():
            hit[valid] = b[_bloom_positions(h[valid])].all(axis=1)
        return pa.table(
            {
                "doc_id": sub.column("doc_id"),
                "bloom_hit": pa.array(hit),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def dedup_bloom_oracle_sql() -> str:
    m = BLOOM_M
    h = cp.SQL_W64.format(s="text")
    pos = (
        f"(((({h} % {m}::UBIGINT)::BIGINT) + "
        f"i * (((({h} // {m}::UBIGINT) % {m}::UBIGINT)::BIGINT) | 1)) % {m})"
    )
    return f"""
WITH {cp.AUG_DOCS_CTE},
ks AS (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS i),
refpos AS (
  SELECT DISTINCT {pos} AS pos
  FROM docs_aug CROSS JOIN ks
  WHERE doc_id % {INCR_REF_MOD} = 0 AND text IS NOT NULL
),
newdocs AS (
  SELECT doc_id, text FROM docs_aug WHERE doc_id % {INCR_REF_MOD} != 0
),
newpos AS (
  SELECT DISTINCT doc_id, {pos} AS pos
  FROM newdocs CROSS JOIN ks
  WHERE text IS NOT NULL
),
need AS (SELECT doc_id, count(*)::BIGINT AS n_need FROM newpos GROUP BY doc_id),
hits AS (
  SELECT p.doc_id, count(*)::BIGINT AS n_hit
  FROM newpos p JOIN refpos r USING (pos) GROUP BY p.doc_id
)
SELECT n.doc_id,
  CASE WHEN n.text IS NULL THEN FALSE
       ELSE coalesce(h.n_hit, 0) = nd.n_need END AS bloom_hit
FROM newdocs n
LEFT JOIN need nd USING (doc_id)
LEFT JOIN hits h USING (doc_id)
""".strip()


# ---------------------------------------------------------------------------
# Suffix→prefix overlap detection: flags documents whose LAST K tokens
# reappear as another document's FIRST K tokens — the crawl-boundary /
# pagination artifact (one logical page split across fetches, boilerplate
# "continued on..." chains) that near-dup LSH misses because the bodies
# share almost nothing.  Counts, not pairs: each doc reports how many
# OTHER docs continue it (n_continuations = head-key matches of its tail
# key), so a hot boilerplate key produces a big integer instead of a
# quadratic pair blowup — the shape that survives 100 TB skew with zero
# caps.  Shuffle: one combiner-pushed ≤|distinct-head-key| aggregate and
# one sentinel-threaded hash join of thin int64 keys.
# ---------------------------------------------------------------------------

OVERLAP_K = 5  # boundary n-gram width (word tokens)
_OV_NO_KEY = -2  # join-side fill for docs shorter than K (matches nothing)
_OV_SENT_KEY = -3  # sentinel head-count key (threads the empty corpus)


def _overlap_keys_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    hk = np.full(len(texts), -1, dtype=np.int64)
    tk = np.full(len(texts), -1, dtype=np.int64)
    valid = np.zeros(len(texts), dtype=bool)
    for i, t in enumerate(texts):
        toks = t.split() if t is not None else []
        if len(toks) >= OVERLAP_K:
            hk[i] = cp.w63(" ".join(toks[:OVERLAP_K]))
            tk[i] = cp.w63(" ".join(toks[-OVERLAP_K:]))
            valid[i] = True
    vmask = pa.array(valid)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "head_key": pc.if_else(vmask, pa.array(hk), pa.scalar(None, pa.int64())),
            "tail_key": pc.if_else(vmask, pa.array(tk), pa.scalar(None, pa.int64())),
        }
    )


def q_doc_overlap(sf_dir: str):
    """Per-doc boundary-overlap report: (doc_id, head_key, tail_key,
    n_continuations) where n_continuations counts the OTHER documents
    whose first K tokens equal this document's last K tokens."""
    import ray.data as rd

    from ray.data.aggregate import Count

    keys = cp.read_documents(sf_dir).map_batches(
        _overlap_keys_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def head_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("head_key")))
        return pa.table({"tail_key_j": t.column("head_key")})

    heads = (
        keys.map_batches(head_rows, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(pa.table(
            {"tail_key_j": pa.array([_OV_SENT_KEY], pa.int64())}
        )))
        .groupby("tail_key_j")
        .aggregate(Count(alias_name="n_heads"))
    )

    def join_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "head_key": t.column("head_key"),
                "tail_key": t.column("tail_key"),
                "tail_key_j": pc.fill_null(t.column("tail_key"), _OV_NO_KEY),
            }
        )

    left = keys.map_batches(
        join_side, batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.from_arrow(pa.table(
        {
            "doc_id": pa.array([SENTINEL_ID], pa.int64()),
            "head_key": pa.array([None], pa.int64()),
            "tail_key": pa.array([None], pa.int64()),
            "tail_key_j": pa.array([_OV_NO_KEY], pa.int64()),
        }
    )))
    joined = left.join(
        heads, join_type="left_outer", num_partitions=_join_partitions(),
        on=("tail_key_j",),
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("doc_id"), SENTINEL_ID))
        n = pc.fill_null(t.column("n_heads"), 0).to_numpy(zero_copy_only=False)
        hk = t.column("head_key")
        tk = t.column("tail_key")
        self_hit = pc.fill_null(pc.equal(hk, tk), False).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "head_key": hk,
                "tail_key": tk,
                "n_continuations": pa.array(
                    n.astype(np.int64) - self_hit.astype(np.int64)
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def doc_overlap_oracle_sql() -> str:
    k = OVERLAP_K
    head = cp.SQL_W63.format(
        s=f"list_aggregate(toks[1:{k}], 'string_agg', ' ')"
    )
    tail = cp.SQL_W63.format(
        s=f"list_aggregate(toks[len(toks) - {k - 1}:len(toks)], 'string_agg', ' ')"
    )
    return f"""
WITH t AS (
  SELECT doc_id, {cp.SQL_TOKS.format(t='text')} AS toks FROM documents
),
k AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= {k} THEN {head} END AS head_key,
    CASE WHEN len(toks) >= {k} THEN {tail} END AS tail_key
  FROM t
),
hc AS (
  SELECT head_key AS hk, count(*)::BIGINT AS n FROM k
  WHERE head_key IS NOT NULL GROUP BY 1
)
SELECT k.doc_id, k.head_key, k.tail_key,
  (coalesce(hc.n, 0)
   - CASE WHEN k.head_key = k.tail_key THEN 1 ELSE 0 END)::BIGINT
    AS n_continuations
FROM k LEFT JOIN hc ON hc.hk = k.tail_key
""".strip()


# ---------------------------------------------------------------------------
# Crawl-to-crawl diff report: per-source added / removed / kept DISTINCT
# documents between the prior crawl (doc_id % INCR_REF_MOD == 0, the
# incremental-dedup split) and the new one — the set-operation summary a
# recurring ingestion job publishes each cycle.  Shape: per-batch distinct
# (source-code, text-hash, side-flags) int rows → ONE sort → per-block
# segment-OR + category bincount (never a hash-cardinality groupby — the
# q_source_diversity lesson) → a ≤ blocks×sources×3-row driver sum.
# ---------------------------------------------------------------------------


def _augment_with_source(batch: pa.Table) -> pa.Table:
    """augment_batch twin that CARRIES source (copies inherit the
    original's source) — SQL twin inline in corpus_diff_oracle_sql."""
    doc_id = batch.column("doc_id").combine_chunks()
    text = batch.column("text").combine_chunks()
    src = batch.column("source").combine_chunks()
    ids = doc_id.to_numpy(zero_copy_only=False)
    mask = pa.array(ids % cp.AUG_MOD == 0)
    dup_ids = pc.add(doc_id.filter(mask), cp.AUG_OFFSET)
    dup_text = pc.replace_substring_regex(
        text.filter(mask), r"^\S+\s+", "", max_replacements=1
    )
    emask = pa.array(ids % cp.EXACT_MOD == 0)
    exact_ids = pc.add(doc_id.filter(emask), 2 * cp.AUG_OFFSET)
    return pa.table(
        {
            "doc_id": pa.chunked_array([doc_id, dup_ids, exact_ids]),
            "text": pa.chunked_array([text, dup_text, text.filter(emask)]),
            "source": pa.chunked_array([src, src.filter(mask), src.filter(emask)]),
        }
    )


def _diff_flags_batch(batch: pa.Table, code_of: dict) -> pa.Table:
    from ..stages.aggregate import _NULL_KEY

    empty = pa.table(
        {
            "sc": pa.array([], pa.int64()),
            "h": pa.array([], pa.int64()),
            "fl": pa.array([], pa.int64()),
        }
    )
    import pandas as pd

    texts = batch.column("text").to_pylist()
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    src = pd.Series(batch.column("source").to_pandas()).fillna(_NULL_KEY)
    keep = [i for i, t in enumerate(texts) if t is not None]
    if not keep:
        return empty
    h = np.fromiter((cp.w63(texts[i]) for i in keep), dtype=np.int64, count=len(keep))
    sc = np.fromiter(
        (code_of[src.iat[i]] for i in keep), dtype=np.int64, count=len(keep)
    )
    old = (ids[keep] % INCR_REF_MOD == 0).astype(np.int64)
    fl = old + 2 * (1 - old)  # bit 0 = old crawl, bit 1 = new crawl
    # fl is only ever 1 (old) or 2 (new): the per-group bitwise OR is just
    # max(fl & 1) | max(fl & 2) — two vectorized C-path aggregations instead
    # of a Python lambda per distinct text (ADVICE r4)
    g = (
        pd.DataFrame({"sc": sc, "h": h, "b0": fl & 1, "b1": fl & 2})
        .groupby(["sc", "h"], sort=False)
        .agg(b0=("b0", "max"), b1=("b1", "max"))
        .reset_index()
    )
    fl_out = g["b0"].to_numpy(dtype=np.int64) | g["b1"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "sc": pa.array(g["sc"].to_numpy(dtype=np.int64)),
            "h": pa.array(g["h"].to_numpy(dtype=np.int64)),
            "fl": pa.array(fl_out),
        }
    )


def q_corpus_diff(sf_dir: str):
    """Per-source crawl diff: (source, n_added, n_removed, n_kept) of
    DISTINCT document texts between the prior-crawl split and the rest."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..stages.aggregate import _NULL_KEY

    docs = cp.read_documents(sf_dir, columns=("doc_id", "text", "source")).map_batches(
        _augment_with_source, batch_format="pyarrow", zero_copy_batch=True
    )

    def _src_only(t: pa.Table) -> pa.Table:
        src = pc.fill_null(t.column("source"), _NULL_KEY)
        return pa.table({"source": pc.unique(src)})

    srcs_df = (
        docs.map_batches(_src_only, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(pa.table({"source": pa.array(["\x00\x00diff-sent"], pa.string())})))
        .groupby("source")
        .aggregate(Count(alias_name="_n"))
        .to_pandas()
    )
    names = [
        v for v in (srcs_df["source"] if "source" in srcs_df.columns else [])
        if v != "\x00\x00diff-sent"
    ]
    if not names:
        return rd.from_arrow(pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_added": pa.array([], pa.int64()),
                "n_removed": pa.array([], pa.int64()),
                "n_kept": pa.array([], pa.int64()),
            }
        ))
    code_of = {v: i for i, v in enumerate(sorted(names))}
    ref = ray.put(code_of)

    def flags(t: pa.Table) -> pa.Table:
        return _diff_flags_batch(t, ray.get(ref))

    def cat_block(t: pa.Table) -> pa.Table:
        e = pa.table(
            {
                "sc": pa.array([], pa.int64()),
                "cat": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if not len(t):
            return e
        sc_v = t.column("sc").to_numpy(zero_copy_only=False)
        h_v = t.column("h").to_numpy(zero_copy_only=False)
        fl_v = t.column("fl").to_numpy(zero_copy_only=False)
        first = np.r_[True, (sc_v[1:] != sc_v[:-1]) | (h_v[1:] != h_v[:-1])]
        starts = np.flatnonzero(first)
        seg_fl = np.bitwise_or.reduceat(fl_v, starts)
        seg_sc = sc_v[starts]
        ok = seg_sc >= 0  # sentinel out
        if not ok.any():
            return e
        key = seg_sc[ok] * 4 + seg_fl[ok]
        cnt = np.bincount(key, minlength=len(code_of) * 4)
        nz = np.flatnonzero(cnt)
        s_idx, cat = np.divmod(nz, 4)
        return pa.table(
            {
                "sc": pa.array(s_idx.astype(np.int64)),
                "cat": pa.array(cat.astype(np.int64)),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    parts = (
        docs.map_batches(flags, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(pa.table(
            {"sc": pa.array([-1], pa.int64()), "h": pa.array([-1], pa.int64()),
             "fl": pa.array([0], pa.int64())}
        )))
        .sort(["sc", "h"])
        .map_batches(cat_block, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()  # ≤ blocks × sources × 3 tiny rows
    )
    name_of = {i: v for v, i in code_of.items()}
    acc: dict = {}
    if len(parts) and "sc" in parts.columns:
        for _, r in parts.iterrows():
            k = (int(r["sc"]), int(r["cat"]))
            acc[k] = acc.get(k, 0) + int(r["n"])
    out_s, out_a, out_r, out_k = [], [], [], []
    for sc in sorted({k[0] for k in acc}):
        nm = name_of[sc]
        out_s.append(None if nm == _NULL_KEY else nm)
        out_a.append(acc.get((sc, 2), 0))
        out_r.append(acc.get((sc, 1), 0))
        out_k.append(acc.get((sc, 3), 0))
    return rd.from_arrow(pa.table(
        {
            "source": pa.array(out_s, pa.string()),
            "n_added": pa.array(np.array(out_a, dtype=np.int64)),
            "n_removed": pa.array(np.array(out_r, dtype=np.int64)),
            "n_kept": pa.array(np.array(out_k, dtype=np.int64)),
        }
    ))


def corpus_diff_oracle_sql() -> str:
    w63 = cp.SQL_W63.format(s="text")
    return f"""
WITH docs_aug_src AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + {cp.AUG_OFFSET} AS doc_id,
         regexp_replace(text, '^\\S+\\s+', '') AS text, source
  FROM documents WHERE doc_id % {cp.AUG_MOD} = 0
  UNION ALL
  SELECT doc_id + {2 * cp.AUG_OFFSET} AS doc_id, text, source
  FROM documents WHERE doc_id % {cp.EXACT_MOD} = 0
),
t AS (
  SELECT source, {w63} AS h, (doc_id % {INCR_REF_MOD} = 0) AS is_old
  FROM docs_aug_src WHERE text IS NOT NULL
),
f AS (
  SELECT source, h,
    max(CASE WHEN is_old THEN 1 ELSE 0 END) AS o,
    max(CASE WHEN is_old THEN 0 ELSE 1 END) AS n
  FROM t GROUP BY 1, 2
)
SELECT source,
  sum(CASE WHEN n = 1 AND o = 0 THEN 1 ELSE 0 END)::BIGINT AS n_added,
  sum(CASE WHEN o = 1 AND n = 0 THEN 1 ELSE 0 END)::BIGINT AS n_removed,
  sum(CASE WHEN o = 1 AND n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept
FROM f GROUP BY source
""".strip()


# ---------------------------------------------------------------------------
# Cross-source duplication matrix: where does near-duplicate content FLOW
# between sources?  Counts verified MinHash near-dup pairs per
# (source_a, source_b) — the mirror-site / syndication detector that tells
# a mixing pipeline which source pairs double-count each other.  Composes
# the full banded-LSH pair pipeline with two thin (doc_id, source) hash
# joins (sources ride per PAIR, never through the band shuffle); output is
# ≤ sources² rows.
# ---------------------------------------------------------------------------


def q_source_dup_matrix(sf_dir: str):
    """(source_a, source_b, n_pairs) over verified near-dup pairs; source
    order follows the pair's (doc_a < doc_b) order — deterministic on both
    sides.  Augmented copies inherit their original's source (base id =
    doc_id % AUG_OFFSET)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.aggregate import _NULL_KEY, _unmask_col

    pairs = q_dedup_minhash(sf_dir)

    def base_ids(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "base_a": pa.array(np.where(a == SENTINEL_ID, SENTINEL_ID,
                                            a % cp.AUG_OFFSET)),
                "base_b": pa.array(np.where(b == SENTINEL_ID, SENTINEL_ID,
                                            b % cp.AUG_OFFSET)),
            }
        )

    thin = pairs.map_batches(
        base_ids, batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.from_arrow(pa.table(
        {"base_a": pa.array([SENTINEL_ID], pa.int64()),
         "base_b": pa.array([SENTINEL_ID], pa.int64())}
    )))

    def src_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": pc.fill_null(t.column("source"), _NULL_KEY),
            }
        )

    src = cp.read_documents(sf_dir, columns=("doc_id", "source")).map_batches(
        src_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.from_arrow(pa.table(
        {"doc_id": pa.array([SENTINEL_ID], pa.int64()),
         "source": pa.array([_NULL_KEY], pa.string())}
    )))
    nparts = _join_partitions()
    j1 = thin.join(
        src, join_type="inner", num_partitions=nparts,
        on=("base_a",), right_on=("doc_id",),
    ).map_batches(
        lambda t: pa.table({"base_b": t.column("base_b"),
                            "source_a": t.column("source")}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    j2 = j1.join(
        src, join_type="inner", num_partitions=nparts,
        on=("base_b",), right_on=("doc_id",), right_suffix="_b",
    )

    def pair_counts(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("base_b"), SENTINEL_ID))
        if not len(t):
            return pa.table(
                {
                    "source_a": pa.array([], pa.string()),
                    "source_b": pa.array([], pa.string()),
                    "n_pairs": pa.array([], pa.int64()),
                }
            )
        import pandas as pd

        g = (
            pd.DataFrame(
                {
                    "source_a": t.column("source_a").to_pandas(),
                    "source_b": t.column("source").to_pandas(),
                }
            )
            .groupby(["source_a", "source_b"], sort=False).size()
            .rename("n_pairs").reset_index()
        )
        return pa.table(
            {
                "source_a": pa.array(g["source_a"].to_numpy(dtype=object), pa.string()),
                "source_b": pa.array(g["source_b"].to_numpy(dtype=object), pa.string()),
                "n_pairs": pa.array(g["n_pairs"].to_numpy(dtype=np.int64)),
            }
        )

    agg = (
        j2.map_batches(pair_counts, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(pa.table(
            {"source_a": pa.array(["\x00\x00sdm-sent"], pa.string()),
             "source_b": pa.array(["\x00\x00sdm-sent"], pa.string()),
             "n_pairs": pa.array([0], pa.int64())}
        )))
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("source_a"), "\x00\x00sdm-sent"))
        return pa.table(
            {
                "source_a": _unmask_col(t.column("source_a")),
                "source_b": _unmask_col(t.column("source_b")),
                "n_pairs": t.column("n_pairs").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def source_dup_matrix_oracle_sql() -> str:
    return f"""
WITH pairs AS (
  SELECT doc_a, doc_b FROM ({dedup_minhash_oracle_sql()}) q
),
src AS (SELECT doc_id, source FROM documents)
SELECT a.source AS source_a, b.source AS source_b, count(*)::BIGINT AS n_pairs
FROM pairs p
JOIN src a ON a.doc_id = p.doc_a % {cp.AUG_OFFSET}
JOIN src b ON b.doc_id = p.doc_b % {cp.AUG_OFFSET}
GROUP BY 1, 2
""".strip()
