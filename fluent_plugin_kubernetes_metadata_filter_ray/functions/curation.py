"""Corpus-curation operators: repetition-signal quality scoring,
benchmark decontamination, sequence packing, and TF-IDF top terms.

These are the operators a training-data pipeline runs after the basic
text stats (textstats.py) and before/alongside dedup (dedup.py):

- ``q_doc_repetition``  — Gopher-style repetition signals (top-bigram
  fraction, duplicate-trigram fraction, distinct-token ratio) and a
  boolean repetition gate.  Embarrassingly parallel: one stateless
  ``map_batches``, all-pandas C kernels (explode + shifted joins), no
  shuffle.
- ``q_decontaminate``   — flag documents sharing any word 3-gram with a
  deterministic "benchmark" subset (doc_id % EVAL_MOD == 0).  The eval
  shingle-hash set is tiny by nature (benchmarks are small), so it is
  collected once, sorted, and broadcast via ``ray.put``; the corpus side
  streams through ``map_batches`` doing a vectorized ``searchsorted``
  membership probe — zero shuffle of the big side at any scale.
- ``q_doc_pack``        — concat-and-chunk sequence packing: within each
  ``source``, documents ordered by doc_id are laid head-to-tail and cut
  every PACK_TARGET tokens (GPT-style pretraining packing); each doc is
  stamped with its global token offset and chunk id.  Shape: thin
  token-count ``map_batches`` → ``sort(source, doc_id)`` → per-block run
  sums → driver prefix-sum of the tiny run table → broadcast offsets
  (the distributed zipWithIndex pattern; no single source ever has to
  fit one worker).
- ``q_doc_tfidf``       — top-TFIDF_TOPK distinctive tokens per doc.
  Pass 1 computes document frequencies with a per-batch combiner (each
  batch emits ≤ |vocab| rows pre-shuffle) and collects the tiny vocab
  table to the driver; idf values are computed with ``math.log`` (libm —
  bit-identical to DuckDB ``ln``, unlike numpy's SIMD log which is 1 ulp
  off) and broadcast; pass 2 scores and ranks per doc with pandas
  kernels — no second shuffle.

Every output column has an exact DuckDB twin: float columns are either
divisions of int-derived values (correctly-rounded identically on both
sides) or products of bit-identical doubles, so the driver's value-hash
check is exact.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from . import corpus as cp

# deterministic "benchmark" subset for decontamination
EVAL_MOD = 17
# pack boundary: cut the concatenated token stream every PACK_TARGET tokens
PACK_TARGET = 512
# repetition gates (picked so the synthetic corpus has both classes)
TOP_BIGRAM_MAX = 0.125
DUP_TRIGRAM_MAX = 0.30
DISTINCT_TOKEN_MIN = 0.30
TFIDF_TOPK = 3


# ---------------------------------------------------------------------------
# repetition signals
# ---------------------------------------------------------------------------

def repetition_batch(batch: pa.Table) -> pa.Table:
    """Per-doc repetition signals, all C-level pandas kernels: the n-gram
    streams come from exploded tokens joined with group-wise shifts (no
    per-row Python), counts/nunique from hash groupbys."""
    s = pd.Series(batch.column("text").to_pandas())
    toks = s.str.strip().str.split()
    # null text → 0 tokens (pass-through hardening: never crash the job)
    n_tokens = toks.str.len().fillna(0).to_numpy(dtype=np.int64)
    idx = s.index

    ex = toks.explode()
    nxt = ex.groupby(level=0).shift(-1)
    nxt2 = ex.groupby(level=0).shift(-2)

    bg = (ex + " " + nxt).dropna()
    if len(bg):
        mx2 = (
            bg.groupby(level=0).value_counts().groupby(level=0).max()
            .reindex(idx, fill_value=0).to_numpy(dtype=np.int64)
        )
    else:
        mx2 = np.zeros(len(s), dtype=np.int64)

    tg = (ex + " " + nxt + " " + nxt2).dropna()
    if len(tg):
        g = tg.groupby(level=0)
        n3 = g.size().reindex(idx, fill_value=0).to_numpy(dtype=np.int64)
        d3 = g.nunique().reindex(idx, fill_value=0).to_numpy(dtype=np.int64)
    else:
        n3 = np.zeros(len(s), dtype=np.int64)
        d3 = np.zeros(len(s), dtype=np.int64)

    ndist = (
        ex.dropna().groupby(level=0).nunique()
        .reindex(idx, fill_value=0).to_numpy(dtype=np.int64)
    )

    # int-derived divisions: correctly-rounded identically in DuckDB
    nt = np.where(n_tokens > 0, n_tokens, 1)
    top_bigram_frac = np.where(n_tokens >= 2, (mx2 * 2) / nt, 0.0)
    dup_trigram_frac = np.where(n3 > 0, (n3 - d3) / np.where(n3 > 0, n3, 1), 0.0)
    distinct_token_ratio = np.where(n_tokens > 0, ndist / nt, 0.0)
    is_repetitive = (
        (top_bigram_frac > TOP_BIGRAM_MAX)
        | (dup_trigram_frac > DUP_TRIGRAM_MAX)
        | ((n_tokens > 0) & (distinct_token_ratio < DISTINCT_TOKEN_MIN))
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens),
            "top_bigram_frac": pa.array(top_bigram_frac),
            "dup_trigram_frac": pa.array(dup_trigram_frac),
            "distinct_token_ratio": pa.array(distinct_token_ratio),
            "is_repetitive": pa.array(is_repetitive),
        }
    )


def q_doc_repetition(sf_dir: str):
    return cp.read_documents(sf_dir).map_batches(
        repetition_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def doc_repetition_oracle_sql() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, {cp.SQL_TOKS.format(t='text')} AS toks FROM documents
),
base AS (SELECT doc_id, toks, len(toks)::BIGINT AS n_tokens FROM tok),
bg AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i + 1])) AS g
  FROM base WHERE n_tokens >= 2
),
bgm AS (
  SELECT doc_id, max(c) AS mx2
  FROM (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1
),
tg AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
                 i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS g
  FROM base WHERE n_tokens >= 3
),
tgm AS (
  SELECT doc_id, count(*)::BIGINT AS n3, count(DISTINCT g)::BIGINT AS d3
  FROM tg GROUP BY 1
),
dt AS (
  SELECT doc_id, count(DISTINCT t)::BIGINT AS ndist
  FROM (SELECT doc_id, unnest(toks) AS t FROM base) GROUP BY 1
),
fr AS (
  SELECT b.doc_id, b.n_tokens,
    CASE WHEN b.n_tokens >= 2 THEN (bgm.mx2 * 2)::DOUBLE / b.n_tokens ELSE 0.0 END
      AS top_bigram_frac,
    CASE WHEN coalesce(tgm.n3, 0) > 0 THEN (tgm.n3 - tgm.d3)::DOUBLE / tgm.n3 ELSE 0.0 END
      AS dup_trigram_frac,
    CASE WHEN b.n_tokens > 0 THEN dt.ndist::DOUBLE / b.n_tokens ELSE 0.0 END
      AS distinct_token_ratio
  FROM base b
  LEFT JOIN bgm ON b.doc_id = bgm.doc_id
  LEFT JOIN tgm ON b.doc_id = tgm.doc_id
  LEFT JOIN dt ON b.doc_id = dt.doc_id
)
SELECT doc_id, n_tokens, top_bigram_frac, dup_trigram_frac, distinct_token_ratio,
  (top_bigram_frac > {TOP_BIGRAM_MAX} OR dup_trigram_frac > {DUP_TRIGRAM_MAX}
   OR (n_tokens > 0 AND distinct_token_ratio < {DISTINCT_TOKEN_MIN})) AS is_repetitive
FROM fr
""".strip()


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def _shingle_hash_frame(batch: pa.Table) -> pd.DataFrame:
    """(row-index, w63 shingle hash) long frame for a batch — built on the
    SHARED factorized shingle kernel (corpus.batch_shingles, also used by
    the MinHash dedup ops) so shingle semantics can never silently diverge
    between the decontamination and dedup oracles; each DISTINCT shingle
    string is md5'd once."""
    fs = cp.batch_shingles(batch)
    if fs is None:
        return pd.DataFrame({"row": np.array([], dtype=np.int64),
                             "h": np.array([], dtype=np.int64)})
    rows, codes, uniques = fs
    uh = np.fromiter((cp.w63(u) for u in uniques), dtype=np.int64, count=len(uniques))
    return pd.DataFrame({"row": rows, "h": uh[codes]})


def _mod_filter(batch: pa.Table, keep_eval: bool) -> pa.Table:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    mask = (ids % EVAL_MOD == 0) if keep_eval else (ids % EVAL_MOD != 0)
    return batch.filter(pa.array(mask))


# Broadcast budget for the eval-hash table (distinct int64 hashes ≈ 8 B
# each → default 4M ≈ 32 MB, a safe ray.put + per-task local-store read).
# Past that, q_decontaminate switches to the distributed hash semi-join —
# with EVAL_MOD = 17 the "eval" split is ~6% of the corpus, so at real
# scale the broadcast would grow linearly with the input (VERDICT r2).
DECON_BROADCAST_MAX = 4_000_000


def _eval_hash_ds(sf_dir: str):
    """DISTINCT w63 hashes of the eval split's word 3-grams as a DATASET:
    per-batch unique → ``groupby(h)`` — the distinct aggregate runs
    distributed, so nothing corpus-scale touches the driver before the
    broadcast-vs-semi-join decision is made on its COUNT."""
    from ray.data.aggregate import Count

    def part(batch: pa.Table) -> pa.Table:
        f = _shingle_hash_frame(_mod_filter(batch, keep_eval=True))
        return pa.table(
            {"h": pa.array(np.unique(f["h"].to_numpy()).astype(np.int64), pa.int64())}
        )

    return (
        cp.read_documents(sf_dir)
        .map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Count(alias_name="x"))
        .drop_columns(["x"])
    )


def _collect_eval_hashes(ev_ds) -> np.ndarray:
    """Distinct sorted eval hashes collected for broadcast — only called
    once the count is known to fit DECON_BROADCAST_MAX."""
    df = ev_ds.to_pandas()  # empty blocks → column-less
    if "h" not in df.columns or not len(df):
        return np.empty(0, dtype=np.int64)
    return np.sort(df["h"].to_numpy(dtype=np.int64))


def contamination_stage(ds, eval_ref):
    """Corpus-side probe: vectorized searchsorted membership against the
    broadcast sorted eval-hash array.  Task closure, not an actor pool —
    the only state is the broadcast ref (a local object-store hit per
    task), and task stages keep small sessions from starving."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        ev = ray.get(eval_ref)
        batch = _mod_filter(batch, keep_eval=False)
        f = _shingle_hash_frame(batch)
        n = len(batch)
        n_shingles = np.zeros(n, dtype=np.int64)
        n_hits = np.zeros(n, dtype=np.int64)
        if len(f):
            rows = f["row"].to_numpy()
            n_shingles = np.bincount(rows, minlength=n).astype(np.int64)
            if len(ev):  # empty eval set (all-short eval docs) ⇒ zero hits
                h = f["h"].to_numpy()
                pos = np.searchsorted(ev, h)
                hit = (pos < len(ev)) & (ev[np.minimum(pos, len(ev) - 1)] == h)
                n_hits = np.bincount(rows, weights=hit, minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_shingles": pa.array(n_shingles),
                "n_eval_hits": pa.array(n_hits),
                "contaminated": pa.array(n_hits > 0),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _decontaminate_semijoin(sf_dir: str, ev_ds):
    """Scale path: contamination as a distributed hash SEMI-JOIN (the
    q_dedup_incremental shape) — used when the eval split's distinct-hash
    table exceeds the broadcast budget, so neither side is ever collected
    to the driver or re-shipped per task.

    - n_shingles needs NO hashing: it is ``max(0, n_tokens - (K-1))``, a
      per-batch token count (the totals pass re-reads text but never
      computes a hash — the md5 work happens exactly once, in the triples
      pass)
    - (doc_id, h, cnt) triples inner-join the distinct eval hashes on h;
      a per-batch partial Sum then a tiny ``groupby(doc_id)`` gives
      n_eval_hits with multiplicity (the oracle's ``sum(CASE WHEN h IN
      ev)``)
    - one sentinel row per join input guards the Ray 2.49 empty-first-
      block shuffle race end-to-end (state/raypatch.py note); w63 hashes
      are ≥ 0, so the int64 sentinel hash can't collide"""
    import pyarrow.compute as pc_
    import ray.data as rd

    from ray.data.aggregate import Sum

    from .dedup import SENTINEL_ID, _join_partitions

    k1 = cp.SHINGLE_K - 1
    sent_h = -(2**62)

    def totals(batch: pa.Table) -> pa.Table:
        batch = _mod_filter(batch, keep_eval=False)
        s = pd.Series(batch.column("text").to_pandas())
        ntok = s.str.split().str.len().fillna(0).to_numpy(dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_shingles": pa.array(np.maximum(0, ntok - k1)),
            }
        )

    def triples(batch: pa.Table) -> pa.Table:
        batch = _mod_filter(batch, keep_eval=False)
        f = _shingle_hash_frame(batch)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if not len(f):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "h": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        g = f.groupby(["row", "h"], sort=False).size().reset_index(name="cnt")
        return pa.table(
            {
                "doc_id": pa.array(ids[g["row"].to_numpy()], pa.int64()),
                "h": pa.array(g["h"].to_numpy(dtype=np.int64)),
                "cnt": pa.array(g["cnt"].to_numpy(dtype=np.int64)),
            }
        )

    nparts = _join_partitions()
    docs = cp.read_documents(sf_dir)
    tri = docs.map_batches(
        triples, batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.from_arrow(pa.table(
        {"doc_id": pa.array([SENTINEL_ID], pa.int64()),
         "h": pa.array([sent_h], pa.int64()),
         "cnt": pa.array([0], pa.int64())}
    )))
    ev = ev_ds.union(rd.from_arrow(pa.table({"h": pa.array([sent_h], pa.int64())})))
    joined = tri.join(ev, join_type="inner", num_partitions=nparts, on=("h",))

    def hit_partial(t: pa.Table) -> pa.Table:
        g = t.select(["doc_id", "cnt"]).group_by(["doc_id"]).aggregate([("cnt", "sum")])
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "n_eval_hits": g.column("cnt_sum").cast(pa.int64()),
            }
        )

    hits = (
        joined.map_batches(hit_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(Sum("n_eval_hits", alias_name="n_eval_hits"))
    )
    tot = docs.map_batches(
        totals, batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.from_arrow(pa.table(
        {"doc_id": pa.array([SENTINEL_ID], pa.int64()),
         "n_shingles": pa.array([0], pa.int64())}
    )))
    out = tot.join(hits, join_type="left_outer", num_partitions=nparts, on=("doc_id",))

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc_.not_equal(t.column("doc_id"), SENTINEL_ID))
        nh = pc_.fill_null(t.column("n_eval_hits"), 0)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_shingles": t.column("n_shingles"),
                "n_eval_hits": nh,
                "contaminated": pc_.greater(nh, 0),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def q_decontaminate(sf_dir: str):
    """Train-side rows (doc_id % EVAL_MOD != 0) flagged when any word
    3-gram also occurs in the eval subset.

    Adaptive shape: the distinct eval-hash table is built DISTRIBUTED and
    its count checked against the broadcast budget
    (KMETA_DECON_BROADCAST_MAX, default DECON_BROADCAST_MAX) — small eval
    sets broadcast + searchsorted-probe (zero shuffle of the corpus);
    larger ones switch to the hash semi-join, so driver memory stays flat
    no matter how the eval split scales (VERDICT r2)."""
    import os

    import ray

    max_bc = int(os.environ.get("KMETA_DECON_BROADCAST_MAX", str(DECON_BROADCAST_MAX)))
    ev = _eval_hash_ds(sf_dir).materialize()
    if ev.count() <= max_bc:
        hashes = _collect_eval_hashes(ev)  # ≤ max_bc rows by the check above
        return contamination_stage(cp.read_documents(sf_dir), ray.put(hashes))
    return _decontaminate_semijoin(sf_dir, ev)


def decontaminate_oracle_sql() -> str:
    w63 = cp.SQL_W63.format(s="s")
    return f"""
WITH tok AS (
  SELECT doc_id, {cp.SQL_TOKS.format(t='text')} AS toks FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
                 i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS s
  FROM tok
),
shh AS (SELECT doc_id, {w63} AS h FROM sh),
ev AS (SELECT DISTINCT h FROM shh WHERE doc_id % {EVAL_MOD} = 0),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_shingles,
         sum(CASE WHEN h IN (SELECT h FROM ev) THEN 1 ELSE 0 END)::BIGINT AS n_eval_hits
  FROM shh WHERE doc_id % {EVAL_MOD} <> 0 GROUP BY 1
)
SELECT d.doc_id, coalesce(a.n_shingles, 0) AS n_shingles,
       coalesce(a.n_eval_hits, 0) AS n_eval_hits,
       coalesce(a.n_eval_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
WHERE d.doc_id % {EVAL_MOD} <> 0
""".strip()


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def _token_count_batch(batch: pa.Table) -> pa.Table:
    s = pd.Series(batch.column("text").to_pandas())
    n = s.str.strip().str.split().str.len().fillna(0).to_numpy(dtype=np.int64)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "n_tokens": pa.array(n),
        }
    )


def _pack_group(df: pd.DataFrame) -> pd.DataFrame:
    from ..stages.aggregate import _NULL_KEY

    df = df.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    if len(df) and df["source"].iat[0] == _NULL_KEY:
        df["source"] = None  # restore the SQL-style null stratum
    n = df["n_tokens"].to_numpy(dtype=np.int64)
    off = np.concatenate(([0], np.cumsum(n)[:-1]))
    df["pack_offset"] = off
    df["pack_chunk"] = off // PACK_TARGET
    return df


def _pack_runs(t: pa.Table):
    """Source-run boundaries of a (source, doc_id)-sorted block: a block
    can hold several sources; each contiguous run is one prefix-sum unit
    keyed by (source, first doc_id) — unique because doc_ids are.
    Boundaries come from int32 dictionary codes (equal sources are
    adjacent in the sorted block), never per-row Python string compares;
    only the ≤ runs-per-block head strings are materialized."""
    src_col = t.column("source")
    if isinstance(src_col, pa.ChunkedArray):
        src_col = src_col.combine_chunks()
    codes = src_col.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    ntk = t.column("n_tokens").to_numpy(zero_copy_only=False)
    starts = np.r_[0, np.flatnonzero(codes[1:] != codes[:-1]) + 1]
    ends = np.r_[starts[1:], len(t)]
    src_at_starts = src_col.take(pa.array(starts)).to_pylist()
    return src_at_starts, ids, ntk, starts, ends


def q_doc_pack(sf_dir: str):
    """Concat-and-chunk packing per source: docs (ordered by doc_id) laid
    head-to-tail, cut every PACK_TARGET tokens; a doc belongs to the chunk
    its first token falls in.

    Shape — the distributed prefix-sum / zipWithIndex pattern (same as
    q_doc_rank): thin token counts → ``sort(source, doc_id)`` → STREAMING
    parquet checkpoint (write-task filenames tile the sort order; the
    object store never holds the full sorted table — see q_doc_rank for
    why a lazy sort cannot be consumed twice and why materialize() was the
    old, 2×-residency pin) → pass 1 reads the checkpoint one block per
    file and emits ONE (source, first_doc, sum_tokens) row per source-RUN
    per block; the driver prefix-sums that tiny table (≈ files + sources
    rows) in key order and broadcasts (source, run-first-doc) → base
    offset; pass 2 re-reads the same files (identical tiling by
    construction, guarded) and assigns base + the exclusive cumsum inside
    the run.  The earlier ``groupby(source).map_groups`` shape (kept below
    as q_doc_pack_mapgroups for the property tests) required one SOURCE's
    whole doc list to fit a worker — with a handful of sources each group
    is corpus/|sources|, which cannot hold at 10^12 docs."""
    import glob
    import hashlib
    import os
    import shutil

    import pyarrow.parquet as pq_
    import ray
    import ray.data

    from ..stages.aggregate import _mask_null_key, _unmask_col

    thin = cp.read_documents(sf_dir, columns=("doc_id", "text", "source")).map_batches(
        _token_count_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    ckpt = "/tmp/kmeta_cache/pack_sorted_{}".format(
        hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    )
    shutil.rmtree(ckpt, ignore_errors=True)
    os.makedirs(ckpt, exist_ok=True)
    _mask_null_key(thin, "source").sort(["source", "doc_id"]).write_parquet(ckpt)
    files = [
        f
        for f in sorted(glob.glob(f"{ckpt}/*.parquet"))
        if pq_.ParquetFile(f).metadata.num_rows > 0
    ]
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "source": pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64()),
            "pack_offset": pa.array([], pa.int64()),
            "pack_chunk": pa.array([], pa.int64()),
        }
    )
    if not files:  # empty corpus → typed empty result
        return ray.data.from_arrow(empty)
    def run_heads(t, _path) -> pa.Table:
        if t is None or not len(t):
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "first_doc": pa.array([], pa.int64()),
                    "sum_tokens": pa.array([], pa.int64()),
                }
            )
        src_heads, ids, ntk, starts, _ = _pack_runs(t)
        return pa.table(
            {
                "source": pa.array(src_heads, pa.string()),
                "first_doc": pa.array(ids[starts], pa.int64()),
                "sum_tokens": pa.array(np.add.reduceat(ntk, starts), pa.int64()),
            }
        )

    # per-file tasks, read fused into the kernel (cp.per_file_map): the
    # override_num_blocks=len(files) read is NOT one-block-per-file once a
    # file outgrows a row group — observed at 20M-pair bench scale
    heads = cp.per_file_map(files, run_heads).to_pandas()
    offsets: dict = {}
    if "source" in heads.columns and len(heads):
        heads = heads.sort_values(["source", "first_doc"], kind="mergesort")
        for srcv, grp in heads.groupby("source", sort=False):
            cums = np.r_[0, np.cumsum(grp["sum_tokens"].to_numpy(dtype=np.int64))[:-1]]
            for fd, off in zip(grp["first_doc"], cums):
                offsets[(srcv, int(fd))] = int(off)
    off_ref = ray.put(offsets)

    def assign(t, _path) -> pa.Table:
        if t is None or not len(t):
            return empty
        off = ray.get(off_ref)
        src_heads, ids, ntk, starts, ends = _pack_runs(t)
        out = np.empty(len(t), dtype=np.int64)
        for sh, s, e in zip(src_heads, starts, ends):
            c = np.cumsum(ntk[s:e])
            out[s:e] = off[(sh, int(ids[s]))] + np.r_[0, c[:-1]]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": _unmask_col(t.column("source")),
                "n_tokens": t.column("n_tokens"),
                "pack_offset": pa.array(out, pa.int64()),
                "pack_chunk": pa.array(out // PACK_TARGET, pa.int64()),
            }
        )

    return cp.per_file_map(files, assign)


def q_doc_pack_mapgroups(sf_dir: str):
    """Reference ``groupby(source).map_groups`` implementation — kept (not
    driver-wired) as the baseline the property tests compare the
    prefix-sum rewrite against on randomized multi-block layouts."""
    from ..stages.aggregate import _mask_null_key

    ds = cp.read_documents(sf_dir, columns=("doc_id", "text", "source")).map_batches(
        _token_count_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return _mask_null_key(ds, "source").groupby("source").map_groups(
        _pack_group, batch_format="pandas"
    )


def doc_pack_oracle_sql() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, source,
    coalesce(len({cp.SQL_TOKS.format(t='text')}), 0)::BIGINT AS n_tokens
  FROM documents
),
off AS (
  SELECT doc_id, source, n_tokens,
    coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS pack_offset
  FROM tok
)
SELECT doc_id, source, n_tokens, pack_offset,
       pack_offset // {PACK_TARGET} AS pack_chunk
FROM off
""".strip()


# ---------------------------------------------------------------------------
# TF-IDF top terms
# ---------------------------------------------------------------------------

def _df_partial(batch: pa.Table) -> pa.Table:
    """Per-batch document-frequency combiner: ≤ |vocab| rows pre-shuffle."""
    s = pd.Series(batch.column("text").to_pandas())
    ex = s.str.strip().str.split().explode().dropna()
    pairs = pd.DataFrame({"row": ex.index, "token": ex.to_numpy()})
    dfc = pairs.drop_duplicates().groupby("token", sort=False).size()
    return pa.table(
        {
            "token": pa.array(dfc.index.to_numpy(dtype=object), pa.string()),
            "df": pa.array(dfc.to_numpy(dtype=np.int64)),
        }
    )


# Vocab-broadcast budget (VERDICT r3): ≤ this many distinct tokens collect
# + ray.put; beyond it the df table stays distributed and scoring becomes a
# hash join (same switch as q_decontaminate / q_doc_lm_score).
TFIDF_BROADCAST_MAX = 4_000_000


def _df_ds(sf_dir: str):
    """Distributed document-frequency table (token, df).  Assumes each
    doc's text lives in one row (true of the documents table), so per-batch
    distinct (doc,token) pairs are globally distinct and Sum-combining is
    exact."""
    from ray.data.aggregate import Sum

    ds = cp.read_documents(sf_dir).map_batches(
        _df_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds.groupby("token").aggregate(Sum("df", alias_name="df")).materialize()


def _n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def _doc_frequencies(df_ds, n_docs: int) -> dict:
    """Broadcast-tier side table: token → df / idf.  Only called once the
    distinct-token count is known to fit the broadcast budget."""
    dfpd = df_ds.to_pandas()
    if "token" not in dfpd.columns:  # empty corpus: column-less to_pandas
        return {"df": {}, "idf": {}}
    # math.log (libm) is bit-identical to DuckDB ln(); numpy's SIMD log
    # differs by 1 ulp — compute idf per distinct df value in Python
    df_map = {t: int(d) for t, d in zip(dfpd["token"], dfpd["df"])}
    idf_map = {t: math.log((n_docs + 1) / (d + 1)) for t, d in df_map.items()}
    return {"df": df_map, "idf": idf_map}


def _idf_from_df(df: np.ndarray, n_docs: int) -> np.ndarray:
    """df → ln((N+1)/(df+1)) float64, libm-exact per DISTINCT df value."""
    ud, inv = np.unique(df, return_inverse=True)
    vals = np.array(
        [math.log((n_docs + 1) / (int(d) + 1)) for d in ud], dtype=np.float64
    )
    return vals[inv]


def tfidf_stage(ds, side_ref, topk: int = TFIDF_TOPK):
    """Score + rank per doc against the broadcast df table.  Task closure
    (state is just the broadcast ref).  tfidf = tf × idf is a product of
    an exact int and a bit-identical double — exact on both sides."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        s = pd.Series(batch.column("text").to_pandas())
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ex = s.str.strip().str.split().explode().dropna()
        if not len(ex):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "rnk": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "tfidf": pa.array([], pa.float64()),
                }
            )
        tf = (
            pd.DataFrame({"row": ex.index, "token": ex.to_numpy()})
            .groupby(["row", "token"], sort=False).size().rename("tf").reset_index()
        )
        tf["df"] = tf["token"].map(side["df"]).astype(np.int64)
        idf = tf["token"].map(side["idf"]).to_numpy(dtype=np.float64)
        tf["tfidf"] = tf["tf"].to_numpy(dtype=np.float64) * idf
        tf = tf.sort_values(
            ["row", "tfidf", "token"], ascending=[True, False, True], kind="mergesort"
        )
        tf["rnk"] = tf.groupby("row", sort=False).cumcount() + 1
        tf = tf[tf["rnk"] <= topk]
        return pa.table(
            {
                "doc_id": pa.array(ids[tf["row"].to_numpy()], pa.int64()),
                "rnk": pa.array(tf["rnk"].to_numpy(dtype=np.int64)),
                "token": pa.array(tf["token"].to_numpy(dtype=object), pa.string()),
                "tf": pa.array(tf["tf"].to_numpy(dtype=np.int64)),
                "df": pa.array(tf["df"].to_numpy(dtype=np.int64)),
                "tfidf": pa.array(tf["tfidf"].to_numpy(dtype=np.float64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _tfidf_join(sf_dir: str, df_ds, n_docs: int, topk: int = TFIDF_TOPK):
    """Scale path: TF-IDF as a distributed hash join — a web-scale vocab
    (10⁸–10⁹ hapax-heavy tokens) never visits the driver.

    Shape: (doc_id, token, tf) triples inner-join the distributed (token,
    df) table; each join output block scores tfidf = tf·idf (libm-exact
    idf per distinct df) and PRUNES to its per-doc top-k — a provable
    superset of the global top-k, since a globally-ranked row outranks
    every same-doc row of its own block too.  The thin pruned stream
    (≤ k rows per doc per block) then sorts by doc_id and one sorted-block
    kernel re-ranks exactly (the _sorted_by_conv physical contract: equal
    keys never split across blocks).  Sentinel rows guard the Ray 2.49
    empty-first-block shuffle race; the sentinel token contains a space,
    unreachable by whitespace tokenization."""
    import ray.data as rd

    from .dedup import SENTINEL_ID, _join_partitions

    _SENT_TOKEN = " "

    def tf_triples(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column("text").to_pandas())
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ex = s.str.strip().str.split().explode().dropna()
        if not len(ex):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        g = (
            pd.DataFrame({"row": ex.index, "token": ex.to_numpy()})
            .groupby(["row", "token"], sort=False).size().rename("tf").reset_index()
        )
        return pa.table(
            {
                "doc_id": pa.array(ids[g["row"].to_numpy()], pa.int64()),
                "token": pa.array(g["token"].to_numpy(dtype=object), pa.string()),
                "tf": pa.array(g["tf"].to_numpy(dtype=np.int64)),
            }
        )

    nparts = _join_partitions()
    tri = cp.read_documents(sf_dir).map_batches(
        tf_triples, batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.from_arrow(pa.table(
        {"doc_id": pa.array([SENTINEL_ID], pa.int64()),
         "token": pa.array([_SENT_TOKEN], pa.string()),
         "tf": pa.array([0], pa.int64())}
    )))
    dfd = df_ds.union(rd.from_arrow(pa.table(
        {"token": pa.array([_SENT_TOKEN], pa.string()),
         "df": pa.array([0], pa.int64())}
    )))
    joined = tri.join(dfd, join_type="inner", num_partitions=nparts, on=("token",))

    def score_prune(t: pa.Table) -> pa.Table:
        f = pd.DataFrame(
            {
                "doc_id": t.column("doc_id").to_numpy(zero_copy_only=False),
                "token": t.column("token").to_pandas(),
                "tf": t.column("tf").to_numpy(zero_copy_only=False),
                "df": t.column("df").to_numpy(zero_copy_only=False),
            }
        )
        idf = _idf_from_df(f["df"].to_numpy(dtype=np.int64), n_docs)
        f["tfidf"] = f["tf"].to_numpy(dtype=np.float64) * idf
        f = f.sort_values(
            ["doc_id", "tfidf", "token"], ascending=[True, False, True], kind="mergesort"
        )
        f = f[f.groupby("doc_id", sort=False).cumcount() < topk]
        return pa.table(
            {
                "doc_id": pa.array(f["doc_id"].to_numpy(dtype=np.int64)),
                "token": pa.array(f["token"].to_numpy(dtype=object), pa.string()),
                "tf": pa.array(f["tf"].to_numpy(dtype=np.int64)),
                "df": pa.array(f["df"].to_numpy(dtype=np.int64)),
                "tfidf": pa.array(f["tfidf"].to_numpy(dtype=np.float64)),
            }
        )

    pruned = joined.map_batches(
        score_prune, batch_format="pyarrow", zero_copy_batch=True
    )

    def rerank_block(t: pa.Table) -> pa.Table:
        f = t.to_pandas()
        f = f[f["doc_id"] != SENTINEL_ID]
        f = f.sort_values(
            ["doc_id", "tfidf", "token"], ascending=[True, False, True], kind="mergesort"
        )
        f["rnk"] = f.groupby("doc_id", sort=False).cumcount() + 1
        f = f[f["rnk"] <= topk]
        return pa.table(
            {
                "doc_id": pa.array(f["doc_id"].to_numpy(dtype=np.int64)),
                "rnk": pa.array(f["rnk"].to_numpy(dtype=np.int64)),
                "token": pa.array(f["token"].to_numpy(dtype=object), pa.string()),
                "tf": pa.array(f["tf"].to_numpy(dtype=np.int64)),
                "df": pa.array(f["df"].to_numpy(dtype=np.int64)),
                "tfidf": pa.array(f["tfidf"].to_numpy(dtype=np.float64)),
            }
        )

    return pruned.sort("doc_id").map_batches(
        rerank_block, batch_format="pyarrow", zero_copy_batch=True
    )


def q_doc_tfidf(sf_dir: str):
    """Top-TFIDF_TOPK distinctive tokens per doc (ties broken by token).

    Adaptive shape (VERDICT r3): distinct-token count vs the broadcast
    budget (KMETA_TFIDF_BROADCAST_MAX, default TFIDF_BROADCAST_MAX) — a
    bounded vocab broadcasts (zero corpus shuffle); a web-scale vocab
    scores via the distributed hash join, so driver memory never grows
    with corpus content."""
    import os

    import ray

    max_bc = int(
        os.environ.get("KMETA_TFIDF_BROADCAST_MAX", str(TFIDF_BROADCAST_MAX))
    )
    df_ds = _df_ds(sf_dir)
    n_docs = _n_docs(sf_dir)
    if df_ds.count() <= max_bc:
        side_ref = ray.put(_doc_frequencies(df_ds, n_docs))
        return tfidf_stage(cp.read_documents(sf_dir), side_ref)
    return _tfidf_join(sf_dir, df_ds, n_docs)


def doc_tfidf_oracle_sql() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({cp.SQL_TOKS.format(t='text')}) AS token FROM documents
),
tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dfv AS (SELECT token, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY 1),
n AS (SELECT count(*)::BIGINT AS n FROM documents),
sc AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfv.df,
         tf.tf * ln((n.n + 1)::DOUBLE / (dfv.df + 1)) AS tfidf
  FROM tf JOIN dfv USING (token) CROSS JOIN n
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rnk
  FROM sc
)
SELECT doc_id, rnk, token, tf, df, tfidf FROM rk WHERE rnk <= {TFIDF_TOPK}
""".strip()


# ---------------------------------------------------------------------------
# Global ranking (distributed zipWithIndex)


def q_doc_rank(sf_dir: str):
    """Global quality ranking — the distributed row_number/zipWithIndex
    primitive Ray Data lacks: rank every doc by (quality_score DESC,
    doc_id ASC) with contiguous 1-based ranks.

    Shape (VERDICT r3 task 4 — no full-corpus object-store materialize):
    thin (doc_id, score) columns → distributed sort → STREAMING
    ``write_parquet`` of the sorted payload (the object store only ever
    holds in-flight blocks; the checkpoint is the resumable-output layout
    this repo uses everywhere) → per-file offsets from parquet FOOTERS in
    filename order (write task indices tile the sort order — verified on
    2.49: ``{uuid}_{task_idx}_{block_idx}`` names; row counts come from
    metadata, no data read) → read back one block per file and assign
    offset + arange.

    Why not stamp block ids on the lazy sort output instead: a Dataset is
    re-executed per consumption and the sort's range boundaries come from
    a SAMPLE, so two passes over an unmaterialized sort can tile
    differently — pinning tiling requires either materialize() (the old
    shape, 2× residency of the sorted payload) or this disk checkpoint.

    Physical guard: each written file must come back as ONE batch (the
    write produces one row group per block, and the read is
    one-block-per-file); ``assign`` checks batch length against the
    file's footer count and fails loudly rather than mis-rank."""
    import glob
    import hashlib
    import os
    import shutil

    import pyarrow.parquet as pq_
    import ray
    import ray.data

    from .textstats import doc_stats_batch

    def thin(batch: pa.Table) -> pa.Table:
        st = doc_stats_batch(batch)
        return pa.table(
            {"doc_id": st.column("doc_id"), "quality_score": st.column("quality_score")}
        )

    out = "/tmp/kmeta_cache/rank_sorted_{}".format(
        hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    )
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    (
        cp.read_documents(sf_dir)
        .map_batches(thin, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["quality_score", "doc_id"], descending=[True, False])
        .write_parquet(out)
    )
    files = [
        f
        for f in sorted(glob.glob(f"{out}/*.parquet"))
        if pq_.ParquetFile(f).metadata.num_rows > 0
    ]
    if not files:  # empty corpus → typed empty result
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "quality_score": pa.array([], pa.float64()),
                    "doc_rank": pa.array([], pa.int64()),
                }
            )
        )
    counts = np.array([pq_.ParquetFile(f).metadata.num_rows for f in files])
    offs = np.r_[0, np.cumsum(counts)[:-1]]
    meta = {f: (int(o), int(c)) for f, o, c in zip(files, offs, counts)}
    meta_ref = ray.put(meta)

    def assign(t, path) -> pa.Table:
        if t is None or not len(t):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "quality_score": pa.array([], pa.float64()),
                    "doc_rank": pa.array([], pa.int64()),
                }
            )
        off, n_file = ray.get(meta_ref)[path]
        if len(t) != n_file:
            raise RuntimeError(
                f"doc_rank: file {path} read as {len(t)} rows, footer says "
                f"{n_file} — checkpoint mutated between passes"
            )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "quality_score": t.column("quality_score"),
                "doc_rank": pa.array(off + np.arange(1, len(t) + 1, dtype=np.int64)),
            }
        )

    # per-file tasks, read fused into the kernel (cp.per_file_map)
    return cp.per_file_map(files, assign)


def doc_rank_oracle_sql() -> str:
    from .textstats import doc_stats_oracle_sql

    return f"""
SELECT doc_id, quality_score,
  row_number() OVER (ORDER BY quality_score DESC, doc_id)::BIGINT AS doc_rank
FROM ({doc_stats_oracle_sql()}) st
""".strip()


# ---------------------------------------------------------------------------
# content-defined chunking

CDC_MOD = 8  # boundary after a token whose w32 ≡ 0 (mod 8) → mean chunk ~8 tokens


def chunk_batch(batch: pa.Table) -> pa.Table:
    """Content-defined chunking (rolling-hash split, rsync/CDC style): each
    doc's token stream is cut AFTER every token whose w32 hash ≡ 0
    (mod CDC_MOD), so chunk boundaries depend only on content — an
    insertion early in a doc shifts at most one chunk, which is what makes
    chunk-level dedup robust to edits (unlike fixed-width splits).

    Vectorized: exploded tokens, ``pd.factorize`` so each DISTINCT token is
    hashed once, boundary flags → per-doc shifted cumsum (C kernels); the
    per-chunk join + md5 fingerprint is Python per CHUNK (not per token) —
    the same bounded cost as the doc-fingerprint op, required for oracle
    parity.  Stateless map_batches: no shuffle at any scale."""
    s = pd.Series(batch.column("text").to_pandas())
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "chunk_hash": pa.array([], pa.int64()),
        }
    )
    ex = s.str.strip().str.split().explode().dropna()
    if not len(ex):
        return empty
    toks = ex.to_numpy(dtype=object)
    codes, uniques = pd.factorize(toks)
    uh = np.fromiter((cp.w32(u) for u in uniques), dtype=np.int64, count=len(uniques))
    bnd = pd.Series(uh[codes] % CDC_MOD == 0, index=ex.index)
    prev = bnd.groupby(level=0).shift(1, fill_value=False)
    chunk = prev.groupby(level=0).cumsum().to_numpy(dtype=np.int64)
    df = pd.DataFrame({"row": ex.index.to_numpy(dtype=np.int64), "chunk": chunk, "tok": toks})
    g = df.groupby(["row", "chunk"], sort=True)
    text = g["tok"].agg(" ".join)
    cnt = g.size().to_numpy(dtype=np.int64)
    rows = text.index.get_level_values(0).to_numpy(dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids[rows], pa.int64()),
            "chunk_idx": pa.array(text.index.get_level_values(1).to_numpy(dtype=np.int64)),
            "n_tokens": pa.array(cnt),
            "chunk_hash": pa.array(
                np.fromiter((cp.w63(t) for t in text), dtype=np.int64, count=len(text))
            ),
        }
    )


def q_doc_chunks(sf_dir: str):
    return cp.read_documents(sf_dir).map_batches(
        chunk_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def doc_chunks_oracle_sql() -> str:
    w32 = cp.SQL_W32.format(s="toks[i]")
    w63 = cp.SQL_W63.format(s="string_agg(token, ' ' ORDER BY i)")
    return f"""
WITH tok AS (
  SELECT doc_id, {cp.SQL_TOKS.format(t='text')} AS toks FROM documents
),
tk AS (
  SELECT doc_id, unnest(generate_series(1, len(toks))) AS i, toks FROM tok
),
tb AS (
  SELECT doc_id, i, toks[i] AS token,
    CASE WHEN {w32} % {CDC_MOD} = 0 THEN 1 ELSE 0 END AS bnd
  FROM tk
),
ch AS (
  SELECT doc_id, i, token,
    coalesce(sum(bnd) OVER (PARTITION BY doc_id ORDER BY i
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS chunk_idx
  FROM tb
)
SELECT doc_id, chunk_idx, count(*)::BIGINT AS n_tokens,
  {w63} AS chunk_hash
FROM ch GROUP BY doc_id, chunk_idx
""".strip()


# ---------------------------------------------------------------------------
# cross-source corpus overlap


_OVERLAP_SENTINEL = "\x00__overlap_sentinel__"


def q_source_overlap(sf_dir: str):
    """Corpus-overlap matrix: token-set Jaccard between every pair of
    (named) sources — the dataset-contamination / mixture diagnostic a
    curation pipeline publishes alongside its datasheet.  Pairs with zero
    shared tokens are omitted (SQL inner-join semantics).

    Ray shape: per-batch DISTINCT (token, source) pairs → ``groupby``
    (one row per distinct pair globally), materialized ONCE (it is the
    aggregated vocab×source table — far smaller than the corpus; three
    consumers read it) → per-source sizes from a tiny combiner aggregate,
    and a hash self-JOIN on token for the pair counts — the shuffle
    carries vocab-sized rows, never documents.  Jaccard =
    n_common / (|A| + |B| − n_common): one division of exact ints, so
    both sides are bit-identical."""
    import ray.data as rd

    from ray.data.aggregate import Count, Sum

    from .dedup import _join_partitions

    def tok_src_partial(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column("text").to_pandas())
        src = pd.Series(batch.column("source").to_pandas())
        ex = s.str.strip().str.split().explode().dropna()
        empty = pa.table(
            {"token": pa.array([], pa.string()), "source": pa.array([], pa.string())}
        )
        if not len(ex):
            return empty
        df = pd.DataFrame(
            {"token": ex.to_numpy(), "source": src.reindex(ex.index).to_numpy()}
        ).dropna(subset=["source"]).drop_duplicates()
        return pa.table(
            {
                "token": pa.array(df["token"].to_numpy(dtype=object), pa.string()),
                "source": pa.array(df["source"].to_numpy(dtype=object), pa.string()),
            }
        )

    ts = (
        cp.read_documents(sf_dir, columns=("doc_id", "text", "source"))
        .map_batches(tok_src_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["token", "source"])
        .aggregate(Count(alias_name="x"))
        .drop_columns(["x"])
        .materialize()
    )

    def size_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["source"]).aggregate([([], "count_all")])
        return pa.table(
            {"source": g.column("source"), "n": g.column("count_all").cast(pa.int64())}
        )

    sizes_df = (
        ts.map_batches(size_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    sizes = (
        {s: int(n) for s, n in zip(sizes_df["source"], sizes_df["n"])}
        if "source" in sizes_df.columns
        else {}
    )

    # sentinel rows keep the join schema-typed when the corpus is empty.
    # A real document COULD contain the sentinel token string (tokens are
    # user text — no string is out-of-domain), so sentinel-source rows are
    # explicitly filtered out again in pair_partial rather than assumed
    # unjoinable.
    left = ts.union(rd.from_arrow(pa.table(
        {"token": pa.array(["\x00sent_a"], pa.string()),
         "source": pa.array([_OVERLAP_SENTINEL], pa.string())}
    )))
    right = ts.map_batches(
        lambda t: pa.table({"token": t.column("token"), "source_b": t.column("source")}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).union(rd.from_arrow(pa.table(
        {"token": pa.array(["\x00sent_b"], pa.string()),
         "source_b": pa.array([_OVERLAP_SENTINEL], pa.string())}
    )))
    joined = left.join(
        right, join_type="inner", num_partitions=_join_partitions(), on=("token",)
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        t = t.filter(
            pc_.and_(
                pc_.and_(
                    pc_.not_equal(t.column("source"), _OVERLAP_SENTINEL),
                    pc_.not_equal(t.column("source_b"), _OVERLAP_SENTINEL),
                ),
                pc_.less(t.column("source"), t.column("source_b")),
            )
        )
        g = t.group_by(["source", "source_b"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "source_a": g.column("source"),
                "source_b": g.column("source_b"),
                "n_common": g.column("count_all").cast(pa.int64()),
            }
        )

    pairs = (
        joined.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("n_common", alias_name="n_common"))
    )

    def finish(t: pa.Table) -> pa.Table:
        a = t.column("source_a").to_pylist()
        b = t.column("source_b").to_pylist()
        n = t.column("n_common").to_pylist()
        jac = [
            float(c) / float(sizes[x] + sizes[y] - c) for x, y, c in zip(a, b, n)
        ]
        return pa.table(
            {
                "source_a": t.column("source_a"),
                "source_b": t.column("source_b"),
                "n_common": t.column("n_common"),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return pairs.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def source_overlap_oracle_sql() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, source, {cp.SQL_TOKS.format(t='text')} AS toks
  FROM documents WHERE source IS NOT NULL
),
ts0 AS (SELECT DISTINCT unnest(toks) AS token, source FROM tok),
sz AS (SELECT source, count(*)::BIGINT AS n FROM ts0 GROUP BY source),
pr AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*)::BIGINT AS n_common
  FROM ts0 a JOIN ts0 b ON a.token = b.token AND a.source < b.source
  GROUP BY 1, 2
)
SELECT pr.source_a, pr.source_b, pr.n_common,
  pr.n_common::DOUBLE / (sa.n + sb.n - pr.n_common)::DOUBLE AS jaccard
FROM pr
JOIN sz sa ON sa.source = pr.source_a
JOIN sz sb ON sb.source = pr.source_b
""".strip()


# ---------------------------------------------------------------------------
# chunk-level exact dedup (CDC chunks → hash groups)

# (doc_id, chunk_idx) packed into one int64 so the distributed Min picks the
# lexicographically-first keeper without an argmin aggregate; chunk_idx is
# bounded by tokens-per-doc ≪ 2^20 and doc_id ≪ 2^43 on every corpus here
_PACK_SHIFT = 20
_PACK_MOD = 1 << _PACK_SHIFT


def q_chunk_dedup(sf_dir: str):
    """Exact dedup at CHUNK granularity: content-defined chunks (T33 —
    boundaries survive edits, unlike fixed windows) hashed and grouped, one
    row per distinct chunk with its copy count and lexicographically-first
    keeper — the sub-document dedup pass (boilerplate headers, repeated
    license blocks) a crawl pipeline runs after doc-level dedup.

    Ray shape: per-batch chunker (T33's vectorized kernel) feeding a
    per-batch combiner (≤ distinct-chunks-per-batch rows cross the wire)
    → ``groupby(chunk_hash)`` Sum/Min.  The corpus text never shuffles —
    only thin (hash, count, packed-keeper) partials."""
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        ch = chunk_batch(batch)
        ids = ch.column("doc_id").to_numpy(zero_copy_only=False)
        idx = ch.column("chunk_idx").to_numpy(zero_copy_only=False)
        assert len(idx) == 0 or int(idx.max()) < _PACK_MOD  # packing bound
        packed = ids * _PACK_MOD + idx
        t = pa.table(
            {
                "chunk_hash": ch.column("chunk_hash"),
                "packed": pa.array(packed, pa.int64()),
            }
        )
        g = t.group_by(["chunk_hash"]).aggregate([("packed", "min"), ([], "count_all")])
        return pa.table(
            {
                "chunk_hash": g.column("chunk_hash"),
                "packed": g.column("packed_min"),
                "n_copies": g.column("count_all").cast(pa.int64()),
            }
        )

    agg = (
        cp.read_documents(sf_dir)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("chunk_hash")
        .aggregate(Min("packed", alias_name="packed"), Sum("n_copies", alias_name="n_copies"))
    )

    def finish(t: pa.Table) -> pa.Table:
        packed = t.column("packed").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "chunk_hash": t.column("chunk_hash"),
                "n_copies": t.column("n_copies"),
                "keeper_doc": pa.array(packed // _PACK_MOD, pa.int64()),
                "keeper_chunk_idx": pa.array(packed % _PACK_MOD, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def chunk_dedup_oracle_sql() -> str:
    return f"""
WITH chunks AS ({doc_chunks_oracle_sql()})
SELECT chunk_hash, count(*)::BIGINT AS n_copies,
  (min(doc_id * {_PACK_MOD} + chunk_idx) // {_PACK_MOD})::BIGINT AS keeper_doc,
  (min(doc_id * {_PACK_MOD} + chunk_idx) % {_PACK_MOD})::BIGINT AS keeper_chunk_idx
FROM chunks GROUP BY chunk_hash
""".strip()


# ---------------------------------------------------------------------------
# paragraph-level dedup with per-doc reconstruction (C4 / RefinedWeb style)


_PARA_EMPTY = pa.table(
    {
        "doc_id": pa.array([], pa.int64()),
        "n_chunks": pa.array([], pa.int64()),
        "n_kept": pa.array([], pa.int64()),
        "clean_hash": pa.array([], pa.int64()),
    }
)


def q_para_dedup(sf_dir: str):
    """Remove globally-duplicated paragraphs from every document and emit a
    per-doc reconstruction witness — the C4/RefinedWeb "deduplicate at the
    paragraph level" curation pass (only the FIRST occurrence of a repeated
    paragraph, in global (doc_id, chunk_idx) order, survives; boilerplate
    headers / license blocks vanish from every later doc).

    "Paragraph" = a content-defined chunk (T33's rolling-hash CDC split),
    so the pass is robust to edits — the synthetic corpus has no newline
    paragraphs, and CDC boundaries are the scale-honest generalisation.

    Output: one row per doc that has ≥1 chunk —
      (doc_id, n_chunks, n_kept, clean_hash) where clean_hash = w63 of the
      kept chunks' hashes joined by ' ' in chunk order (the md5 witness of
      the reconstructed document, same trick as conv_concat's doc_hash);
      NULL when every chunk of the doc was seen earlier elsewhere.

    Ray shape (10^12 docs): the corpus text never shuffles.  Thin
    (doc_id, chunk_idx, chunk_hash, packed) rows → per-batch Min combiner →
    ``groupby(chunk_hash)`` Min(packed) keeper table → hash join stamps the
    keeper back onto the thin chunk rows (both sides sentinel-threaded for
    the empty-corpus hash-shuffle race, dedup.py pattern) → ``sort(doc_id)``
    + whole-block kernel reassembles per-doc summaries (the sorted-block
    contract of stages/aggregate._sorted_by_conv: fixed-boundary range
    partitioning never splits equal keys across blocks).  Two thin-row
    shuffles total; per-chunk md5 is bounded by oracle parity exactly as in
    q_doc_chunks."""
    import ray.data as rd
    from ray.data.aggregate import Min

    from .dedup import SENTINEL_ID, _join_partitions

    def thin(batch: pa.Table) -> pa.Table:
        ch = chunk_batch(batch)
        ids = ch.column("doc_id").to_numpy(zero_copy_only=False)
        idx = ch.column("chunk_idx").to_numpy(zero_copy_only=False)
        assert len(idx) == 0 or int(idx.max()) < _PACK_MOD  # packing bound
        return pa.table(
            {
                "doc_id": ch.column("doc_id"),
                "chunk_idx": ch.column("chunk_idx"),
                "chunk_hash": ch.column("chunk_hash"),
                "packed": pa.array(ids * _PACK_MOD + idx, pa.int64()),
            }
        )

    chunks = cp.read_documents(sf_dir).map_batches(
        thin, batch_format="pyarrow", zero_copy_batch=True
    )

    def keeper_partial(t: pa.Table) -> pa.Table:
        g = t.select(["chunk_hash", "packed"]).group_by(["chunk_hash"]).aggregate(
            [("packed", "min")]
        )
        return pa.table(
            {"chunk_hash": g.column("chunk_hash"), "kp": g.column("packed_min")}
        )

    keeper = (
        chunks.map_batches(keeper_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("chunk_hash")
        .aggregate(Min("kp", alias_name="kp"))
    ).union(rd.from_arrow(pa.table(
        {"chunk_hash": pa.array([SENTINEL_ID], pa.int64()),
         "kp": pa.array([0], pa.int64())}
    )))

    left = chunks.union(rd.from_arrow(pa.table(
        {"doc_id": pa.array([SENTINEL_ID], pa.int64()),
         "chunk_idx": pa.array([0], pa.int64()),
         "chunk_hash": pa.array([SENTINEL_ID], pa.int64()),
         "packed": pa.array([0], pa.int64())}
    )))
    joined = left.join(
        keeper, join_type="inner", num_partitions=_join_partitions(),
        on=("chunk_hash",),
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _PARA_EMPTY
        df = pd.DataFrame(
            {
                "doc": t.column("doc_id").to_numpy(zero_copy_only=False),
                "idx": t.column("chunk_idx").to_numpy(zero_copy_only=False),
                "hs": t.column("chunk_hash").to_numpy(zero_copy_only=False).astype(str),
                "keep": (
                    t.column("packed").to_numpy(zero_copy_only=False)
                    == t.column("kp").to_numpy(zero_copy_only=False)
                ),
            }
        )
        df = df[df["doc"] != SENTINEL_ID]
        if not len(df):
            return _PARA_EMPTY
        df = df.sort_values(["doc", "idx"], kind="stable")
        g = df.groupby("doc", sort=True)
        n_chunks = g.size()
        n_kept = g["keep"].sum().astype(np.int64)
        joined_hs = df[df["keep"]].groupby("doc", sort=True)["hs"].agg(" ".join)
        clean = joined_hs.reindex(n_chunks.index)
        return pa.table(
            {
                "doc_id": pa.array(n_chunks.index.to_numpy(dtype=np.int64)),
                "n_chunks": pa.array(n_chunks.to_numpy(dtype=np.int64)),
                "n_kept": pa.array(n_kept.to_numpy()),
                "clean_hash": pa.array(
                    [cp.w63(x) if isinstance(x, str) else None for x in clean],
                    pa.int64(),
                ),
            }
        )

    return joined.sort("doc_id").map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def para_dedup_oracle_sql() -> str:
    w63 = cp.SQL_W63.format(
        s="string_agg(CASE WHEN keep THEN chunk_hash::VARCHAR END, ' ' ORDER BY chunk_idx)"
    )
    return f"""
WITH chunks AS ({doc_chunks_oracle_sql()}),
keeper AS (
  SELECT chunk_hash, min(doc_id * {_PACK_MOD} + chunk_idx) AS kp
  FROM chunks GROUP BY chunk_hash
),
fl AS (
  SELECT c.doc_id, c.chunk_idx, c.chunk_hash,
         (c.doc_id * {_PACK_MOD} + c.chunk_idx) = k.kp AS keep
  FROM chunks c JOIN keeper k USING (chunk_hash)
)
SELECT doc_id, count(*)::BIGINT AS n_chunks,
  sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
  {w63} AS clean_hash
FROM fl GROUP BY doc_id
""".strip()


# ---------------------------------------------------------------------------
# cross-document duplicated n-gram fraction (substring-dup diagnostic)
# ---------------------------------------------------------------------------

def _distinct_shingle_pairs(batch: pa.Table) -> pa.Table:
    """DISTINCT (doc_id, shingle-hash) pairs of one batch — docs are unique
    to one batch, so per-batch distinct IS the global distinct."""
    f = _shingle_hash_frame(batch)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    if not len(f):
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "h": pa.array([], pa.int64())}
        )
    g = f.drop_duplicates()
    return pa.table(
        {
            "doc_id": pa.array(ids[g["row"].to_numpy()], pa.int64()),
            "h": pa.array(g["h"].to_numpy(dtype=np.int64)),
        }
    )


def q_doc_dup_ngrams(sf_dir: str):
    """Per-document duplicated-n-gram fraction: of a doc's DISTINCT word
    3-grams, how many also occur in at least one OTHER document (the
    corpus-level boilerplate / near-dup diagnostic that substring-dedup
    pipelines threshold on).

    Ray shape (10^12 docs): nothing ever reaches the driver —
    1. distinct (doc_id, h) pairs per batch (shared factorized shingle
       kernel, each distinct shingle hashed once);
    2. shingle document-frequency as a combiner-pushed ``groupby(h)`` Sum
       (vocabulary-sized, stays distributed);
    3. pairs ⋈ df hash join (both sides partitioned on h, sentinel-
       threaded for the Ray 2.49 empty-first-block race), per-batch
       partial (n_distinct, n_dup) counts, tiny ``groupby(doc_id)`` Sum;
    4. left join back to the full doc_id list so shingle-less docs emit
       (0, 0, 0.0) like the oracle's LEFT JOIN."""
    import pyarrow.compute as pc_
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .dedup import SENTINEL_ID, _join_partitions

    sent_h = -(2**62)
    nparts = _join_partitions()
    docs = cp.read_documents(sf_dir)

    pairs = docs.map_batches(
        _distinct_shingle_pairs, batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.from_arrow(pa.table(
        {"doc_id": pa.array([SENTINEL_ID], pa.int64()),
         "h": pa.array([sent_h], pa.int64())}
    )))

    def df_partial(t: pa.Table) -> pa.Table:
        g = t.select(["h"]).group_by(["h"]).aggregate([("h", "count")])
        return pa.table(
            {"h": g.column("h"), "c": g.column("h_count").cast(pa.int64())}
        )

    dfs = (
        pairs.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Sum("c", alias_name="c"))
    )
    joined = pairs.join(dfs, join_type="inner", num_partitions=nparts, on=("h",))

    def per_doc_partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        # the sentinel pair joins the sentinel df row (c = 1+) — drop it
        keep = ids != SENTINEL_ID
        ids = ids[keep]
        c = t.column("c").to_numpy(zero_copy_only=False)[keep]
        if not len(ids):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "n_dup": pa.array([], pa.int64()),
                }
            )
        uids, inv = np.unique(ids, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        nd = np.bincount(inv, weights=(c >= 2)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(uids, pa.int64()),
                "n_distinct": pa.array(n),
                "n_dup": pa.array(nd),
            }
        )

    per = (
        joined.map_batches(per_doc_partial, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(pa.table(
            {"doc_id": pa.array([SENTINEL_ID], pa.int64()),
             "n_distinct": pa.array([0], pa.int64()),
             "n_dup": pa.array([0], pa.int64())}
        )))
        .groupby("doc_id")
        .aggregate(Sum("n_distinct", alias_name="n_distinct"),
                   Sum("n_dup", alias_name="n_dup"))
    )

    def id_only(t: pa.Table) -> pa.Table:
        return t.select(["doc_id"])

    all_ids = docs.map_batches(
        id_only, batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.from_arrow(pa.table({"doc_id": pa.array([SENTINEL_ID], pa.int64())})))
    out = all_ids.join(per, join_type="left_outer", num_partitions=nparts,
                       on=("doc_id",))

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc_.not_equal(t.column("doc_id"), SENTINEL_ID))
        n = pc_.fill_null(t.column("n_distinct"), 0).to_numpy(zero_copy_only=False)
        nd = pc_.fill_null(t.column("n_dup"), 0).to_numpy(zero_copy_only=False)
        frac = np.where(n > 0, nd.astype(np.float64) / np.where(n > 0, n, 1).astype(np.float64), 0.0)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_distinct": pa.array(n.astype(np.int64)),
                "n_dup": pa.array(nd.astype(np.int64)),
                "dup_frac": pa.array(frac, pa.float64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def doc_dup_ngrams_oracle_sql() -> str:
    w63 = cp.SQL_W63.format(s="s")
    return f"""
WITH tok AS (
  SELECT doc_id, {cp.SQL_TOKS.format(t='text')} AS toks FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
                 i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS s
  FROM tok
),
shh AS (SELECT DISTINCT doc_id, {w63} AS h FROM sh),
df AS (SELECT h, count(*)::BIGINT AS c FROM shh GROUP BY h),
per AS (
  SELECT s.doc_id, count(*)::BIGINT AS n_distinct,
         sum(CASE WHEN d.c >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup
  FROM shh s JOIN df d USING (h) GROUP BY 1
)
SELECT d.doc_id, coalesce(p.n_distinct, 0) AS n_distinct,
       coalesce(p.n_dup, 0) AS n_dup,
       CASE WHEN coalesce(p.n_distinct, 0) > 0
            THEN coalesce(p.n_dup, 0)::DOUBLE / p.n_distinct::DOUBLE
            ELSE 0.0 END AS dup_frac
FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
""".strip()


# ---------------------------------------------------------------------------
# Per-source distribution divergence: KL(P_source ‖ P_corpus) over unigram
# token distributions — the data-mixing diagnostic ("how far does each
# source's language drift from the blend?") that sits next to
# q_source_mix / q_source_overlap when weighting a 100-TB blend.
#
# Exactness: every per-(source, token) term is quantized to int64 —
# floor((c_st/N_s) · ((ln c_st − ln N_s − ln c_t + ln N) · 1e9)) — with
# libm logs of exactly-represented integers (math.log per DISTINCT count,
# never numpy's SIMD log; the simsearch._qdots rule), so the per-source
# SUM is order-free integer arithmetic and the DuckDB twin matches
# bit-for-bit.  Scale shape: the corpus collapses to a (source, token)
# combiner-pushed aggregate; token totals derive from THAT table (no
# second corpus pass); the only join is vocab-level; driver state is
# ≤ |sources| rows.
# ---------------------------------------------------------------------------

KL_Q = 1e9
_KL_SENT_SRC = "\x00\x00kl-sent"
_KL_SENT_TOKEN = " "  # whitespace split can never emit it


def _src_token_partial(batch: pa.Table) -> pa.Table:
    from ..stages.aggregate import _NULL_KEY

    s = pd.Series(batch.column("text").to_pandas())
    src = pd.Series(batch.column("source").to_pandas()).fillna(_NULL_KEY)
    ex = s.str.strip().str.split().explode().dropna()
    if not len(ex):
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
            }
        )
    g = (
        pd.DataFrame({"source": src[ex.index].to_numpy(), "token": ex.to_numpy()})
        .groupby(["source", "token"], sort=False).size().rename("c").reset_index()
    )
    return pa.table(
        {
            "source": pa.array(g["source"].to_numpy(dtype=object), pa.string()),
            "token": pa.array(g["token"].to_numpy(dtype=object), pa.string()),
            "c": pa.array(g["c"].to_numpy(dtype=np.int64)),
        }
    )


def _libm_log_per_distinct(c: np.ndarray) -> np.ndarray:
    """ln over int64 counts, libm-exact per DISTINCT value."""
    uc, inv = np.unique(c, return_inverse=True)
    ls = np.array([math.log(int(u)) for u in uc], dtype=np.float64)
    return ls[inv]


def q_source_divergence(sf_dir: str):
    """Per-source unigram KL divergence vs the corpus blend:
    (source, n_tokens, kl_q, kl) — kl_q is the exact int64 quantized sum,
    kl = kl_q / 1e9."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.aggregate import _NULL_KEY, _unmask_col
    from .dedup import _join_partitions

    st = (
        cp.read_documents(sf_dir, columns=("text", "source"))
        .map_batches(_src_token_partial, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(pa.table(
            {
                "source": pa.array([_KL_SENT_SRC], pa.string()),
                "token": pa.array([_KL_SENT_TOKEN], pa.string()),
                "c": pa.array([0], pa.int64()),
            }
        )))
        .groupby(["source", "token"])
        .aggregate(Sum("c", alias_name="c_st"))
        # one bounded materialize: |sources|·|vocab| rows (vocab-level, far
        # below corpus size) consumed three times below — a lazy Dataset
        # would re-run the corpus shuffle per consumer
        .materialize()
    )
    tok = st.groupby("token").aggregate(Sum("c_st", alias_name="c_t"))
    ns_df = st.groupby("source").aggregate(Sum("c_st", alias_name="n_s")).to_pandas()
    ns: dict = {}
    if len(ns_df) and "source" in ns_df.columns:
        ns_df = ns_df[ns_df["source"] != _KL_SENT_SRC]
        ns = {s_: int(v) for s_, v in zip(ns_df["source"], ns_df["n_s"])}
    n_total = sum(ns.values())
    ln_ns = {s_: math.log(v) for s_, v in ns.items() if v > 0}
    ln_n = math.log(n_total) if n_total > 0 else 0.0
    ns_ref = ray.put((ns, ln_ns, ln_n))

    joined = st.join(
        tok, join_type="inner", num_partitions=_join_partitions(), on=("token",)
    )

    import pyarrow.compute as pc_

    def terms(t: pa.Table) -> pa.Table:
        t = t.filter(pc_.not_equal(t.column("token"), _KL_SENT_TOKEN))
        if not len(t):
            return pa.table(
                {"source": pa.array([], pa.string()), "q": pa.array([], pa.int64())}
            )
        ns_, ln_ns_, ln_n_ = ray.get(ns_ref)
        src = t.column("source").to_pylist()
        c_st = t.column("c_st").to_numpy(zero_copy_only=False).astype(np.int64)
        c_t = t.column("c_t").to_numpy(zero_copy_only=False).astype(np.int64)
        n_s = np.array([ns_[s_] for s_ in src], dtype=np.int64)
        lns = np.array([ln_ns_[s_] for s_ in src], dtype=np.float64)
        lc_st = _libm_log_per_distinct(c_st)
        lc_t = _libm_log_per_distinct(c_t)
        q = np.floor(
            (c_st / n_s) * ((lc_st - lns - lc_t + ln_n_) * KL_Q)
        ).astype(np.int64)
        return pa.table(
            {"source": pa.array(src, pa.string()), "q": pa.array(q, pa.int64())}
        )

    agg = (
        joined.map_batches(terms, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(pa.table(
            {"source": pa.array([_KL_SENT_SRC], pa.string()),
             "q": pa.array([0], pa.int64())}
        )))
        .groupby("source")
        .aggregate(Sum("q", alias_name="kl_q"))
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc_.not_equal(t.column("source"), _KL_SENT_SRC))
        ns_, _, _ = ray.get(ns_ref)
        src = t.column("source").to_pylist()
        klq = t.column("kl_q").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source": _unmask_col(t.column("source")),
                "n_tokens": pa.array(
                    np.array([ns_[s_] for s_ in src], dtype=np.int64)
                ),
                "kl_q": pa.array(klq),
                "kl": pa.array(klq.astype(np.float64) / KL_Q),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def source_divergence_oracle_sql() -> str:
    toks = cp.SQL_TOKS.format(t="text")
    # null sources ride an internal chr(1) mask (SQL joins drop NULL keys);
    # it need not match the engine's internal sentinel — only the final
    # CASE-restored NULL is compared.
    return f"""
WITH occ AS (
  SELECT coalesce(source, chr(1)) AS source, unnest({toks}) AS token
  FROM documents
),
st AS (SELECT source, token, count(*)::BIGINT AS c_st FROM occ GROUP BY 1, 2),
tok AS (SELECT token, sum(c_st)::BIGINT AS c_t FROM st GROUP BY 1),
ns AS (SELECT source, sum(c_st)::BIGINT AS n_s FROM st GROUP BY 1),
nn AS (SELECT sum(c_t)::BIGINT AS n FROM tok),
terms AS (
  SELECT st.source,
    floor((st.c_st::DOUBLE / ns.n_s)
          * ((ln(st.c_st) - ln(ns.n_s) - ln(tok.c_t) + ln(nn.n)) * {KL_Q:.1f})
    )::BIGINT AS q
  FROM st
  JOIN tok USING (token)
  JOIN ns USING (source)
  CROSS JOIN nn
)
SELECT
  CASE WHEN t.source = chr(1) THEN NULL ELSE t.source END AS source,
  ns.n_s AS n_tokens,
  sum(t.q)::BIGINT AS kl_q,
  (sum(t.q)::BIGINT)::DOUBLE / {KL_Q:.1f} AS kl
FROM terms t JOIN ns USING (source)
GROUP BY 1, 2
""".strip()


# ---------------------------------------------------------------------------
# Per-source n-gram diversity: distinct-shingle ratio per source — the
# self-repetition diagnostic at SOURCE granularity (low ratio = template /
# boilerplate farms, high = diverse prose), next to doc-level repetition
# (T22) and cross-doc dup n-grams (T54).  One shuffle chain, no joins:
# per-batch (source, shingle-hash) combiner → vocab-level groupby →
# ≤|sources| aggregate.  Shingles come from the SHARED batch_shingles
# kernel so semantics can't diverge from the minhash/decontaminate twins.
# ---------------------------------------------------------------------------

_DIV_SENT_SRC = "\x00\x00div-sent"


def _src_shingle_pairs(batch: pa.Table, code_of: dict) -> pa.Table:
    """Distinct (source-code, shingle-hash) int pairs of one batch — the
    only rows that ride the big exchange (two int64 columns; totals never
    shuffle at all)."""
    from ..stages.aggregate import _NULL_KEY

    empty = pa.table(
        {"sc": pa.array([], pa.int64()), "h": pa.array([], pa.int64())}
    )
    t3 = cp.batch_shingles(batch)
    if t3 is None:
        return empty
    rows, codes, uniques = t3
    h_u = np.fromiter((cp.w63(x) for x in uniques), dtype=np.int64, count=len(uniques))
    src = pd.Series(batch.column("source").to_pandas()).fillna(_NULL_KEY).to_numpy(
        dtype=object
    )
    src_codes = np.fromiter(
        (code_of[v] for v in src), dtype=np.int64, count=len(src)
    )
    # fused int key + bincount: pure C per-batch dedup (a pandas groupby
    # over the exploded object keys cost seconds per 1.6M-row batch)
    key = src_codes[rows] * len(uniques) + codes
    cnt = np.bincount(key, minlength=len(code_of) * len(uniques))
    nz = np.flatnonzero(cnt)
    s_idx, h_idx = np.divmod(nz, len(uniques))
    return pa.table({"sc": pa.array(s_idx.astype(np.int64)), "h": pa.array(h_u[h_idx])})


def _src_shingle_totals(batch: pa.Table, code_of: dict) -> pa.Table:
    """Per-batch shingle totals per source: ≤ |sources| rows, no hashing."""
    from ..stages.aggregate import _NULL_KEY

    t3 = cp.batch_shingles(batch)
    if t3 is None:
        return pa.table(
            {"sc": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
        )
    rows, _, _ = t3
    src = pd.Series(batch.column("source").to_pandas()).fillna(_NULL_KEY).to_numpy(
        dtype=object
    )
    src_codes = np.fromiter(
        (code_of[v] for v in src), dtype=np.int64, count=len(src)
    )
    cnt = np.bincount(src_codes[rows], minlength=len(code_of))
    nz = np.flatnonzero(cnt)
    return pa.table(
        {"sc": pa.array(nz.astype(np.int64)), "c": pa.array(cnt[nz].astype(np.int64))}
    )


def q_source_diversity(sf_dir: str):
    """Per-source shingle diversity: (source, n_shingles, n_distinct,
    distinct_ratio) over word 3-grams.

    Shape: the distinct-source table is collected once (≤ |sources| rows,
    the source_mix bound) and broadcast as an int code map, so the big
    exchange carries exactly two int64 columns — per-batch-distinct
    (source-code, shingle-hash) pairs through a groupby whose second
    stage is a ≤ |sources| Count.  Totals never shuffle: a per-batch
    ≤ |sources|-row combiner sums driver-side.  String-keyed sorting of
    the 20M-pair exchange was the first version's cost (32.6 s at the
    180k-doc bench corpus); all-int keys + split totals cut it ~3×."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..stages.aggregate import _NULL_KEY

    docs = cp.read_documents(sf_dir, columns=("text", "source"))

    def _src_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        src = pc_.fill_null(t.column("source"), _NULL_KEY)
        return pa.table({"source": pc_.unique(src)})

    srcs_df = (
        docs.map_batches(_src_only, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(pa.table({"source": pa.array([_DIV_SENT_SRC], pa.string())})))
        .groupby("source")
        .aggregate(Count(alias_name="_n"))
        .to_pandas()
    )
    names = [
        v for v in (srcs_df["source"] if "source" in srcs_df.columns else [])
        if v != _DIV_SENT_SRC
    ]
    if not names:  # empty corpus → typed empty result
        return rd.from_arrow(pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_shingles": pa.array([], pa.int64()),
                "n_distinct": pa.array([], pa.int64()),
                "distinct_ratio": pa.array([], pa.float64()),
            }
        ))
    code_of = {v: i for i, v in enumerate(sorted(names))}
    ref = ray.put(code_of)

    def pairs(t: pa.Table) -> pa.Table:
        return _src_shingle_pairs(t, ray.get(ref))

    def totals(t: pa.Table) -> pa.Table:
        return _src_shingle_totals(t, ray.get(ref))

    # distinct pairs via sort + vectorized boundary scan, NOT a 20M-group
    # groupby: Ray's aggregate pays per-group overhead at pair-count
    # cardinality (the dedup._emit_pairs_sorted_block lesson) — the sorted-
    # block contract guarantees equal (sc, h) pairs never straddle blocks,
    # so per-block first-occurrence counts sum to the exact global distinct
    def nd_block(t: pa.Table) -> pa.Table:
        e = pa.table(
            {"sc": pa.array([], pa.int64()), "nd": pa.array([], pa.int64())}
        )
        if not len(t):
            return e
        sc_v = t.column("sc").to_numpy(zero_copy_only=False)
        h_v = t.column("h").to_numpy(zero_copy_only=False)
        first = np.r_[True, (sc_v[1:] != sc_v[:-1]) | (h_v[1:] != h_v[:-1])]
        keep = first & (sc_v >= 0)  # sentinel row out
        if not keep.any():
            return e
        cnt = np.bincount(sc_v[keep], minlength=len(code_of))
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"sc": pa.array(nz.astype(np.int64)),
             "nd": pa.array(cnt[nz].astype(np.int64))}
        )

    nd_df = (
        docs.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(pa.table(
            {"sc": pa.array([-1], pa.int64()), "h": pa.array([-1], pa.int64())}
        )))
        .sort(["sc", "h"])
        .map_batches(nd_block, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("sc")
        .aggregate(Sum("nd", alias_name="n_distinct"))
        .to_pandas()
    )
    ns_df = (
        docs.map_batches(totals, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(pa.table(
            {"sc": pa.array([-1], pa.int64()), "c": pa.array([0], pa.int64())}
        )))
        .groupby("sc")
        .aggregate(Sum("c", alias_name="n_shingles"))
        .to_pandas()
    )
    # bounded driver assembly: both tables are ≤ |sources|+1 rows
    nd = {int(r["sc"]): int(r["n_distinct"]) for _, r in nd_df.iterrows()
          if int(r["sc"]) >= 0}
    ns = {int(r["sc"]): int(r["n_shingles"]) for _, r in ns_df.iterrows()
          if int(r["sc"]) >= 0 and int(r["n_shingles"]) > 0}
    name_of = {i: v for v, i in code_of.items()}
    out_src, out_ns, out_nd = [], [], []
    for sc in sorted(ns):
        out_src.append(None if name_of[sc] == _NULL_KEY else name_of[sc])
        out_ns.append(ns[sc])
        out_nd.append(nd[sc])
    ns_a = np.array(out_ns, dtype=np.int64)
    nd_a = np.array(out_nd, dtype=np.int64)
    return rd.from_arrow(pa.table(
        {
            "source": pa.array(out_src, pa.string()),
            "n_shingles": pa.array(ns_a),
            "n_distinct": pa.array(nd_a),
            "distinct_ratio": pa.array(
                nd_a.astype(np.float64) / ns_a.astype(np.float64)
            ) if len(ns_a) else pa.array([], pa.float64()),
        }
    ))


def source_diversity_oracle_sql() -> str:
    w63 = cp.SQL_W63.format(s="s")
    return f"""
WITH tok AS (
  SELECT source, {cp.SQL_TOKS.format(t='text')} AS toks FROM documents
),
sh AS (
  SELECT source, unnest(list_transform(generate_series(1, len(toks) - 2),
                 i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS s
  FROM tok
),
occ AS (SELECT source, {w63} AS h FROM sh)
SELECT source, count(*)::BIGINT AS n_shingles,
  count(DISTINCT h)::BIGINT AS n_distinct,
  count(DISTINCT h)::DOUBLE / count(*)::DOUBLE AS distinct_ratio
FROM occ GROUP BY source
""".strip()


# ---------------------------------------------------------------------------
# PII density report: per-(source, pattern) hit counts over the documents
# corpus — the data-governance dashboard behind the transcript-side
# redaction stage (which sources leak emails / IPs / secrets, and how
# concentrated is it?).  Uses the SAME RE2 patterns as stages/redact.py so
# the report and the scrubber can never disagree.  Pure combiner: each
# batch collapses to ≤ sources×patterns rows.
# ---------------------------------------------------------------------------

_PII_SENT_SRC = "\x00\x00pii-sent"


def _pii_density_partial(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc_

    from ..stages.aggregate import _NULL_KEY
    from ..stages.redact import REDACT_PATTERNS

    src = pd.Series(batch.column("source").to_pandas()).fillna(_NULL_KEY)
    codes, uniq = pd.factorize(src.to_numpy(dtype=object), sort=False)
    text = batch.column("text")
    out_s, out_p, out_h, out_d = [], [], [], []
    for name, pat, _ in REDACT_PATTERNS:
        n = pc_.fill_null(
            pc_.count_substring_regex(text, pat), 0
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        hits = np.bincount(codes, weights=n.astype(np.float64),
                           minlength=len(uniq)).astype(np.int64)
        affected = np.bincount(codes, weights=(n > 0).astype(np.float64),
                               minlength=len(uniq)).astype(np.int64)
        out_s.append(uniq)
        out_p.extend([name] * len(uniq))
        out_h.append(hits)
        out_d.append(affected)
    if not out_s:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "pattern": pa.array([], pa.string()),
                "n_hits": pa.array([], pa.int64()),
                "n_docs_affected": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "source": pa.array(np.concatenate(out_s).astype(object), pa.string()),
            "pattern": pa.array(out_p, pa.string()),
            "n_hits": pa.array(np.concatenate(out_h)),
            "n_docs_affected": pa.array(np.concatenate(out_d)),
        }
    )


def q_pii_density(sf_dir: str):
    """Per-(source, pattern) PII hit report:
    (source, pattern, n_hits, n_docs_affected)."""
    import pyarrow.compute as pc_
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.aggregate import _unmask_col

    agg = (
        cp.read_documents(sf_dir, columns=("text", "source"))
        .map_batches(
            _pii_density_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .union(rd.from_arrow(pa.table(
            {
                "source": pa.array([_PII_SENT_SRC], pa.string()),
                "pattern": pa.array([_PII_SENT_SRC], pa.string()),
                "n_hits": pa.array([0], pa.int64()),
                "n_docs_affected": pa.array([0], pa.int64()),
            }
        )))
        .groupby(["source", "pattern"])
        .aggregate(
            Sum("n_hits", alias_name="n_hits"),
            Sum("n_docs_affected", alias_name="n_docs_affected"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc_.not_equal(t.column("source"), _PII_SENT_SRC))
        return pa.table(
            {
                "source": _unmask_col(t.column("source")),
                "pattern": t.column("pattern"),
                "n_hits": t.column("n_hits").cast(pa.int64()),
                "n_docs_affected": t.column("n_docs_affected").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def pii_density_oracle_sql() -> str:
    from ..stages.redact import REDACT_PATTERNS

    # SQL-escape embedded single quotes so a future pattern containing one
    # can't silently corrupt the VALUES literal
    def _q(s: str) -> str:
        return s.replace("'", "''")

    vals = ", ".join(
        f"('{_q(name)}', '{_q(pat)}')" for name, pat, _ in REDACT_PATTERNS
    )
    return f"""
WITH p AS (SELECT * FROM (VALUES {vals}) AS v(pattern, rx)),
h AS (
  SELECT d.source, p.pattern,
    coalesce(len(regexp_extract_all(d.text, p.rx)), 0)::BIGINT AS n
  FROM documents d CROSS JOIN p
)
SELECT source, pattern, sum(n)::BIGINT AS n_hits,
  sum(CASE WHEN n > 0 THEN 1 ELSE 0 END)::BIGINT AS n_docs_affected
FROM h GROUP BY 1, 2
""".strip()
