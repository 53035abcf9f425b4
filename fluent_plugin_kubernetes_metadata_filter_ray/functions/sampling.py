"""Sampling + quality filtering over the ``documents`` table — the
data-curation staples of a training pipeline, all deterministic (hash-based,
no RNG) with exact DuckDB twins.

  - **Bernoulli hash sample**: keep doc iff md5-hash(doc_id) mod 100 < pct.
    Stable across runs/engines — re-running the pipeline reproduces the
    exact sample (unlike ``ds.random_sample``), and membership can be
    audited in SQL.
  - **Stratified first-k per source**: k smallest doc_ids per ``source``
    group — `groupby(source).map_groups(head_k)`; the shuffle carries only
    (doc_id, source) pairs.
  - **Quality filter**: reuses the doc_stats kernels, then a vectorized
    predicate inside the same ``map_batches`` — filter-at-the-stage, no
    second pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import corpus as cp
from .textstats import doc_stats_batch

SAMPLE_PCT = 10
STRATA_K = 5
MIN_TOKENS = 40
MAX_STOPWORD_RATIO = 0.2


def _sample_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    keep = np.fromiter(
        ((cp.w32(f"sample:{i}") % 100) < SAMPLE_PCT for i in ids),
        dtype=bool,
        count=len(ids),
    )
    return batch.filter(pa.array(keep))


def q_doc_sample(sf_dir: str):
    """Deterministic ~10% Bernoulli sample by doc_id hash."""
    return cp.read_documents(sf_dir, columns=("doc_id", "text")).map_batches(
        _sample_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def doc_sample_oracle_sql() -> str:
    w32 = cp.SQL_W32.format(s="('sample:' || doc_id)")
    return f"""
SELECT doc_id, text FROM documents WHERE ({w32} % 100) < {SAMPLE_PCT}
""".strip()


def _head_k(group: pa.Table) -> pa.Table:
    from ..stages.aggregate import _unmask_null_key

    order = np.argsort(group.column("doc_id").to_numpy(zero_copy_only=False), kind="stable")
    out = group.take(pa.array(order[:STRATA_K]))
    return out.set_column(
        out.column_names.index("source"),
        "source",
        _unmask_null_key(out.column("source")),
    )


def _head_k_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: the k smallest doc_ids per source — any global
    first-k doc is in its own batch's first-k, so the shuffle carries
    ≤ sources × k thin rows per batch instead of the whole stratum (one
    SOURCE's rows cannot be required to fit a worker at 10^12 docs)."""
    from ..stages.aggregate import _NULL_KEY

    df = pd.DataFrame(
        {
            "doc_id": batch.column("doc_id").to_numpy(zero_copy_only=False),
            "source": pd.Series(batch.column("source").to_pandas()).fillna(_NULL_KEY),
        }
    )
    head = (
        df.sort_values(["source", "doc_id"], kind="mergesort")
        .groupby("source", sort=False)
        .head(STRATA_K)
    )
    return pa.table(
        {
            "doc_id": pa.array(head["doc_id"].to_numpy(dtype=np.int64)),
            "source": pa.array(head["source"].to_numpy(dtype=object), pa.string()),
        }
    )


def q_doc_sample_stratified(sf_dir: str):
    """First-k docs (by doc_id) per source stratum.  Combiner-pushed: each
    batch emits its own per-source first-k; the final ``map_groups`` sees
    ≤ k × batches short rows per source, never the stratum itself.  A null
    source is one SQL-style stratum (sentinel-masked through the shuffle:
    Ray's map_groups key sort rejects null keys)."""
    partials = cp.read_documents(sf_dir, columns=("doc_id", "source")).map_batches(
        _head_k_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("source").map_groups(_head_k, batch_format="pyarrow")


def doc_sample_stratified_oracle_sql() -> str:
    return f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn <= {STRATA_K}
""".strip()


def _quality_filter_batch(batch: pa.Table) -> pa.Table:
    stats = doc_stats_batch(batch)
    keep = pc.and_(
        pc.greater_equal(stats.column("n_tokens"), MIN_TOKENS),
        pc.less_equal(stats.column("stopword_ratio"), MAX_STOPWORD_RATIO),
    )
    return stats.select(
        ["doc_id", "n_tokens", "stopword_ratio", "quality_score"]
    ).filter(keep)


def q_doc_quality_filter(sf_dir: str):
    """Keep docs passing length + stopword-ratio gates (one pass)."""
    return cp.read_documents(sf_dir).map_batches(
        _quality_filter_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def doc_quality_filter_oracle_sql() -> str:
    from .textstats import doc_stats_oracle_sql

    return f"""
SELECT doc_id, n_tokens, stopword_ratio, quality_score
FROM ({doc_stats_oracle_sql()})
WHERE n_tokens >= {MIN_TOKENS} AND stopword_ratio <= {MAX_STOPWORD_RATIO}
""".strip()


TOPK_PER_SOURCE = 3


def _topk_partial(batch: pa.Table) -> pa.Table:
    """Per-batch top-k per source — the combiner: any global top-k doc is
    in its own batch's top-k for that source, so the shuffle carries
    ≤ sources × k thin rows per batch, never the corpus."""
    import pandas as pd

    from ..stages.aggregate import _NULL_KEY

    stats = doc_stats_batch(batch)
    df = pd.DataFrame(
        {
            "source": pd.Series(batch.column("source").to_pandas()).fillna(_NULL_KEY),
            "doc_id": stats.column("doc_id").to_numpy(zero_copy_only=False),
            "quality_score": stats.column("quality_score").to_numpy(zero_copy_only=False),
        }
    )
    df = df.sort_values(
        ["source", "quality_score", "doc_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    head = df.groupby("source", sort=False).head(TOPK_PER_SOURCE)
    return pa.table(
        {
            "source": pa.array(head["source"].to_numpy(dtype=object), pa.string()),
            "doc_id": pa.array(head["doc_id"].to_numpy(dtype=np.int64)),
            "quality_score": pa.array(head["quality_score"].to_numpy(dtype=np.float64)),
        }
    )


def _topk_final(group: pa.Table) -> pa.Table:
    from ..stages.aggregate import _unmask_null_key

    score = group.column("quality_score").to_numpy(zero_copy_only=False)
    did = group.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((did, -score))[:TOPK_PER_SOURCE]
    out = group.take(pa.array(order))
    return pa.table(
        {
            "source": _unmask_null_key(out.column("source")),
            "rnk": pa.array(np.arange(1, len(out) + 1, dtype=np.int64)),
            "doc_id": out.column("doc_id"),
            "quality_score": out.column("quality_score"),
        }
    )


def q_top_docs_per_source(sf_dir: str):
    """Distributed top-k per group: the k best docs per source by
    (quality_score DESC, doc_id ASC), with contiguous per-source ranks.
    Combiner-pushed partial top-k per batch → tiny ``groupby(source)``
    final top-k (each group holds ≤ k × batches short rows).  A null
    source is one SQL-style group (sentinel-masked through the shuffle)."""
    ds = cp.read_documents(sf_dir, columns=("doc_id", "text", "source"))
    partials = ds.map_batches(
        _topk_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("source").map_groups(_topk_final, batch_format="pyarrow")


def top_docs_per_source_oracle_sql() -> str:
    from .textstats import doc_stats_oracle_sql

    return f"""
SELECT source, rnk, doc_id, quality_score FROM (
  SELECT d.source, st.doc_id, st.quality_score,
    row_number() OVER (PARTITION BY d.source
                       ORDER BY st.quality_score DESC, st.doc_id) AS rnk
  FROM ({doc_stats_oracle_sql()}) st JOIN documents d USING (doc_id)
) WHERE rnk <= {TOPK_PER_SOURCE}
""".strip()


MIX_WEIGHT_Q = 1_000_000.0  # weight quantization: floor(sqrt(n)·1e6)


def q_source_mix(sf_dir: str):
    """Data-mixing weights per source — the temperature-sampling (α = 0.5)
    table a multi-source pretraining run draws from: each source's sampling
    weight ∝ sqrt(its doc count), which upweights small sources relative to
    proportional sampling.

    Ray shape: per-batch combiner (≤ sources rows per batch: doc counts +
    token sums) → tiny ``groupby(source)`` Sum → one stateless pass stamps
    weights and shares.  Exactness: sqrt is correctly-rounded IEEE on both
    sides (libm/DuckDB), its argument is an exact int64-derived double, and
    the quantized weight floor(sqrt(n)·1e6) plus the single final division
    weight/total are therefore bit-identical; the total is an exact int64
    sum over the tiny aggregated table (driver-side — rows ≤ #sources)."""
    import math

    import pandas as pd

    from ray.data.aggregate import Sum

    from ..stages.aggregate import _NULL_KEY

    def partial(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column("text").to_pandas())
        n_tok = s.str.strip().str.split().str.len().fillna(0).to_numpy(dtype=np.int64)
        df = pd.DataFrame(
            {
                "source": pd.Series(batch.column("source").to_pandas()).fillna(_NULL_KEY),
                "n_tokens": n_tok,
            }
        )
        g = df.groupby("source", sort=False).agg(
            n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum")
        ).reset_index()
        return pa.table(
            {
                "source": pa.array(g["source"].to_numpy(dtype=object), pa.string()),
                "n_docs": pa.array(g["n_docs"].to_numpy(dtype=np.int64)),
                "n_tokens": pa.array(g["n_tokens"].to_numpy(dtype=np.int64)),
            }
        )

    agg = (
        cp.read_documents(sf_dir, columns=("doc_id", "text", "source"))
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_tokens", alias_name="n_tokens"))
        .to_pandas()  # ≤ #sources rows: the aggregated result, not the corpus
    )
    if "source" not in agg.columns or not len(agg):
        # empty corpus: to_pandas of an all-empty Dataset is column-less
        return pd.DataFrame(
            {
                "source": pd.Series([], dtype=object),
                "n_docs": pd.Series([], dtype=np.int64),
                "n_tokens": pd.Series([], dtype=np.int64),
                "weight_q": pd.Series([], dtype=np.int64),
                "mix_share": pd.Series([], dtype=np.float64),
            }
        )
    w = np.array(
        [math.floor(math.sqrt(float(n)) * MIX_WEIGHT_Q) for n in agg["n_docs"]],
        dtype=np.int64,
    )
    tot = int(w.sum())
    src = agg["source"].where(agg["source"] != _NULL_KEY, None)
    return pd.DataFrame(
        {
            "source": src,
            "n_docs": agg["n_docs"].astype(np.int64),
            "n_tokens": agg["n_tokens"].astype(np.int64),
            "weight_q": w,
            "mix_share": w.astype(np.float64) / float(tot) if tot else np.zeros(len(w)),
        }
    )


def source_mix_oracle_sql() -> str:
    return f"""
WITH s AS (
  SELECT source, count(*)::BIGINT AS n_docs,
    coalesce(sum(len({cp.SQL_TOKS.format(t='text')})), 0)::BIGINT AS n_tokens
  FROM documents GROUP BY source
),
w AS (
  SELECT *, floor(sqrt(n_docs::DOUBLE) * {MIX_WEIGHT_Q})::BIGINT AS weight_q FROM s
),
t AS (SELECT sum(weight_q)::BIGINT AS tot FROM w)
SELECT source, n_docs, n_tokens, weight_q,
  weight_q::DOUBLE / t.tot::DOUBLE AS mix_share
FROM w CROSS JOIN t
""".strip()


# ---------------------------------------------------------------------------
# temperature-sampled corpus materialization (the op that APPLIES the
# q_source_mix weights): draw a ~budget-sized sample whose per-source
# composition follows the sqrt-temperature mix, deterministically.

MIX_SAMPLE_DENOM = 4  # budget = n_docs // 4
_MIX_RES = 1_000_000  # hash resolution for the inclusion threshold


def q_doc_sample_weighted(sf_dir: str):
    """Keep each doc with probability ∝ its source's mix weight per doc
    (θ_s = budget·weight_s·RES // (Σweights·n_docs_s), compared against a
    per-doc hash) — upweighting small sources exactly as q_source_mix
    prescribes, reproducible across runs/engines.

    Exactness: θ_s is computed ONCE per source in unbounded Python ints
    (HUGEINT on the oracle side) so no per-doc arithmetic can overflow;
    the per-doc test is one int compare against the broadcast θ of its
    source.  Ray shape: the mix table is the tiny q_source_mix aggregate
    (≤ #sources rows on the driver); the corpus streams through one
    stateless filter."""
    import ray

    from ..stages.aggregate import _NULL_KEY

    mix = q_source_mix(sf_dir)  # pandas, ≤ #sources rows
    n_total = int(mix["n_docs"].sum()) if len(mix) else 0
    tot_w = int(mix["weight_q"].sum()) if len(mix) else 0
    budget = n_total // MIX_SAMPLE_DENOM
    theta = {}
    for _, r in mix.iterrows():
        key = r["source"] if pd.notna(r["source"]) else _NULL_KEY
        if tot_w and int(r["n_docs"]):
            theta[key] = min(
                _MIX_RES,
                (budget * int(r["weight_q"]) * _MIX_RES) // (tot_w * int(r["n_docs"])),
            )
        else:
            theta[key] = 0
    theta_ref = ray.put(theta)

    def keep(batch: pa.Table) -> pa.Table:
        th = ray.get(theta_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        src = pd.Series(batch.column("source").to_pandas()).fillna(_NULL_KEY)
        cut = src.map(th).fillna(0).to_numpy(dtype=np.int64)
        h = np.fromiter(
            ((cp.w32(f"mix:{i}") % _MIX_RES) for i in ids), dtype=np.int64, count=len(ids)
        )
        return batch.select(["doc_id", "source"]).filter(pa.array(h < cut))

    return cp.read_documents(sf_dir, columns=("doc_id", "source")).map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )


def doc_sample_weighted_oracle_sql() -> str:
    w32 = cp.SQL_W32.format(s="('mix:' || d.doc_id)")
    return f"""
WITH mix AS ({source_mix_oracle_sql()}),
tot AS (SELECT sum(weight_q)::HUGEINT AS tw, sum(n_docs)::BIGINT AS nd FROM mix),
th AS (
  SELECT m.source,
    least({_MIX_RES},
          ((t.nd // {MIX_SAMPLE_DENOM})::HUGEINT * m.weight_q::HUGEINT * {_MIX_RES})
            // (t.tw * m.n_docs::HUGEINT)) AS theta
  FROM mix m CROSS JOIN tot t
)
SELECT d.doc_id, d.source
FROM documents d JOIN th ON th.source IS NOT DISTINCT FROM d.source
WHERE ({w32} % {_MIX_RES})::HUGEINT < th.theta
""".strip()


# ---------------------------------------------------------------------------
# deterministic train/valid/test split

SPLIT_TRAIN_PCT = 90  # [0, 90) train
SPLIT_VALID_PCT = 95  # [90, 95) valid, [95, 100) test


def _split_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    bucket = np.fromiter(
        (cp.w32(f"split:{i}") % 100 for i in ids), dtype=np.int64, count=len(ids)
    )
    split = np.where(
        bucket < SPLIT_TRAIN_PCT, "train",
        np.where(bucket < SPLIT_VALID_PCT, "valid", "test"),
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "bucket": pa.array(bucket),
            "split": pa.array(split, pa.string()),
        }
    )


def q_doc_split(sf_dir: str):
    """Deterministic train/valid/test assignment (90/5/5 by md5 bucket of
    doc_id) — the reproducible holdout split every training pipeline
    stamps before packing.  Hash-based, so membership is stable across
    runs, engines and corpus growth (a re-crawl never flips an existing
    doc between splits — unlike rank-quantile splits), and auditable in
    SQL.  Stateless ``map_batches``: no shuffle at any scale; the
    ``bucket`` column is emitted so downstream audits can re-check the
    threshold arithmetic."""
    return cp.read_documents(sf_dir, columns=("doc_id", "source")).map_batches(
        _split_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def doc_split_oracle_sql() -> str:
    w32 = cp.SQL_W32.format(s="('split:' || doc_id)")
    return f"""
SELECT doc_id, source, ({w32} % 100)::BIGINT AS bucket,
  CASE WHEN ({w32} % 100) < {SPLIT_TRAIN_PCT} THEN 'train'
       WHEN ({w32} % 100) < {SPLIT_VALID_PCT} THEN 'valid'
       ELSE 'test' END AS split
FROM documents
""".strip()


# ---------------------------------------------------------------------------
# adaptive quantile filter (threshold learned from the corpus, not fixed)
# ---------------------------------------------------------------------------

QUALITY_BUCKETS = 10_000   # quality_score ∈ [0,1] → ≤ 10_001 histogram rows
QUANTILE_KEEP = 0.25       # keep the top quarter by quality bucket


def _quality_hist_partial(batch: pa.Table) -> pa.Table:
    """Per-batch bucket histogram: the batch collapses to ≤ 10_001 rows
    before the shuffle, and the aggregated histogram is BOUNDED (bucket
    count, not corpus or vocab size) — the driver-side threshold scan can
    never grow with the data."""
    st = doc_stats_batch(batch)
    q = st.column("quality_score").to_numpy(zero_copy_only=False)
    qb = np.floor(q * QUALITY_BUCKETS).astype(np.int64)
    vals, counts = np.unique(qb, return_counts=True)
    return pa.table(
        {
            "qb": pa.array(vals.astype(np.int64)),
            "c": pa.array(counts.astype(np.int64)),
        }
    )


def q_doc_quality_quantile(sf_dir: str):
    """Keep the top QUANTILE_KEEP fraction of docs by quality score, with
    the threshold LEARNED from the corpus (the C4/CCNet-style adaptive
    cut, vs q_doc_quality_filter's fixed gates).

    Contract (exactly twinned in SQL): bucket = floor(score·10⁴); T = the
    largest bucket whose tail count (docs with bucket ≥ T) reaches
    max(1, floor(N·0.25)); keep every doc with bucket ≥ T (ties at the
    threshold bucket all survive — deterministic, no RNG).

    Ray shape (10^12 docs): pass 1 = per-batch bucket histogram partials →
    tiny groupby Sum → ≤ 10_001-row driver collect (bounded by the bucket
    count, NOT the corpus); pass 2 = one stateless filter against the
    broadcast threshold.  Same two-pass shape as q_embed_quantize."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "quality_score": pa.array([], pa.float64()),
            "qb": pa.array([], pa.int64()),
        }
    )
    hist = (
        cp.read_documents(sf_dir)
        .map_batches(_quality_hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qb")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # ≤ 10_001 rows by construction
    )
    if "qb" not in hist.columns or not len(hist):
        return rd.from_arrow(empty)
    hist = hist.sort_values("qb", ascending=False)
    n = int(hist["c"].sum())
    # floor(N·0.25) is exact in float64 for any feasible N (< 2^52):
    # identical to the SQL twin's floor(count(*) * 0.25)
    target = max(1, int(np.floor(n * QUANTILE_KEEP)))
    cum = hist["c"].cumsum().to_numpy()
    thr = int(hist["qb"].to_numpy()[np.argmax(cum >= target)])

    def keep(batch: pa.Table) -> pa.Table:
        st = doc_stats_batch(batch)
        q = st.column("quality_score").to_numpy(zero_copy_only=False)
        qb = np.floor(q * QUALITY_BUCKETS).astype(np.int64)
        mask = pa.array(qb >= thr)
        return pa.table(
            {
                "doc_id": st.column("doc_id"),
                "n_tokens": st.column("n_tokens"),
                "quality_score": st.column("quality_score"),
                "qb": pa.array(qb),
            }
        ).filter(mask)

    return cp.read_documents(sf_dir).map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )


def doc_quality_quantile_oracle_sql() -> str:
    from .textstats import doc_stats_oracle_sql

    return f"""
WITH st AS ({doc_stats_oracle_sql()}),
b AS (
  SELECT doc_id, n_tokens, quality_score,
         floor(quality_score * {QUALITY_BUCKETS})::BIGINT AS qb
  FROM st
),
hist AS (SELECT qb, count(*)::BIGINT AS c FROM b GROUP BY qb),
thr AS (
  -- first bucket (scanning downward) whose tail count reaches the target
  -- = the LARGEST qb among qualifying rows
  SELECT max(qb) AS t FROM (
    SELECT qb, sum(c) OVER (ORDER BY qb DESC) AS cum FROM hist
  ) WHERE cum >= greatest(1, floor((SELECT count(*) FROM b) * {QUANTILE_KEEP}))
)
SELECT doc_id, n_tokens, quality_score, qb
FROM b WHERE qb >= (SELECT t FROM thr)
""".strip()


# ---------------------------------------------------------------------------
# exact-k uniform sample (without replacement, deterministic)
# ---------------------------------------------------------------------------

EXACT_K = 200


def _ksample_partial(batch: pa.Table) -> pa.Table:
    """Per-batch top-k by hash rank — the combiner: any global top-k doc is
    in its own batch's top-k, so the shuffle carries ≤ k thin rows per
    batch, never the corpus."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    src = batch.column("source")
    rk = np.fromiter(
        (cp.w63(f"ksample:{i}") for i in ids), dtype=np.int64, count=len(ids)
    )
    order = np.lexsort((ids, rk))[:EXACT_K]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], pa.int64()),
            "source": src.take(pa.array(order)),
            "rk": pa.array(rk[order]),
        }
    )


def q_doc_sample_exact_k(sf_dir: str):
    """EXACTLY k docs, uniformly without replacement, deterministic: the k
    smallest md5-hash ranks (Bernoulli sampling can't hit an exact count;
    ORDER BY random() isn't reproducible).  Distributed reservoir
    equivalent: per-batch top-k combiner → ≤ k·batches thin rows →
    one-block final cut.  Corpus never shuffles; re-runs and engines agree
    bit-for-bit (auditable membership, like q_doc_sample)."""
    ds = cp.read_documents(sf_dir, columns=("doc_id", "source"))
    partials = ds.map_batches(
        _ksample_partial, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(1)

    def final_cut(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        rk = t.column("rk").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, rk))[:EXACT_K]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "source": t.column("source").take(pa.array(order)),
                "rk": pa.array(rk[order]),
            }
        )

    return partials.map_batches(
        final_cut, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def doc_sample_exact_k_oracle_sql() -> str:
    w63 = cp.SQL_W63.format(s="'ksample:' || doc_id")
    return f"""
SELECT doc_id, source, {w63} AS rk
FROM documents
ORDER BY rk, doc_id
LIMIT {EXACT_K}
""".strip()


# ---------------------------------------------------------------------------
# Hashed-feature importance weights (DSIR, Xie et al. 2023): score every
# raw document by how much more likely its hashed unigram features are
# under the TARGET distribution (the eval split here) than under the raw
# corpus — the data-selection weight used to resample web text toward a
# target domain.
#
# Scale shape is the op's whole point: both distributions are BOUNDED
# B-bucket histograms (B = 4096), so unlike the TF-IDF/LM vocab tables
# the driver/broadcast state is corpus-independent by construction — two
# int64[4096] vectors.  The corpus streams twice: one combiner-pushed
# histogram pass, one stateless scoring pass against the broadcast
# per-bucket quantized log-ratio table.
#
# Exactness: Laplace-smoothed ratios, one int64-quantized term per bucket
# — floor((ln(c_t+1) − ln(N_t+B) − ln(c_r+1) + ln(N_r+B)) · 1e9), libm
# logs of exactly-represented ints — then per-doc Σ count_f(doc)·term_q(f)
# in exact integer arithmetic, mirrored bit-for-bit by the DuckDB twin.
# ---------------------------------------------------------------------------

DSIR_B = 4096
DSIR_Q = 1e9
DSIR_TARGET_MOD = 17  # target domain = the eval split (decontaminate's)


def _dsir_bucket_py(tok: str) -> int:
    return cp.w64(tok) % DSIR_B


def _dsir_hist_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (bucket, split) partial counts: split 1 = target docs."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    tgt = ids % DSIR_TARGET_MOD == 0
    s = pd.Series(batch.column("text").to_pandas())
    out_b, out_t, out_c = [], [], []
    for is_tgt in (True, False):
        ex = s[tgt == is_tgt].str.strip().str.split().explode()
        vc = ex.value_counts()
        if not len(vc):
            continue
        vec = np.zeros(DSIR_B, dtype=np.int64)
        counts = vc.to_numpy(dtype=np.int64)
        for j, tok in enumerate(vc.index):
            vec[_dsir_bucket_py(tok)] += counts[j]
        nz = np.flatnonzero(vec)
        out_b.append(nz.astype(np.int64))
        out_t.append(np.full(len(nz), 1 if is_tgt else 0, dtype=np.int64))
        out_c.append(vec[nz])
    if not out_b:
        return pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "split": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "bucket": pa.array(np.concatenate(out_b)),
            "split": pa.array(np.concatenate(out_t)),
            "c": pa.array(np.concatenate(out_c)),
        }
    )


def q_doc_importance(sf_dir: str):
    """DSIR importance weights for every RAW (non-target) doc:
    (doc_id, n_feats, logratio_q, logratio_avg, dsir_keep) — keep when the
    doc's average per-feature log-ratio favors the target domain."""
    import math

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = cp.read_documents(sf_dir)

    hist = (
        ds.map_batches(_dsir_hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(pa.table(
            {
                "bucket": pa.array([-1], pa.int64()),
                "split": pa.array([0], pa.int64()),
                "c": pa.array([0], pa.int64()),
            }
        )))
        .groupby(["bucket", "split"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    c_t = np.zeros(DSIR_B, dtype=np.int64)
    c_r = np.zeros(DSIR_B, dtype=np.int64)
    if len(hist) and "bucket" in hist.columns:
        hist = hist[hist["bucket"] >= 0]
        b = hist["bucket"].to_numpy(dtype=np.int64)
        c = hist["c"].to_numpy(dtype=np.int64)
        tgt = hist["split"].to_numpy(dtype=np.int64) == 1
        c_t[b[tgt]] = c[tgt]
        c_r[b[~tgt]] = c[~tgt]
    n_t, n_r = int(c_t.sum()), int(c_r.sum())
    # per-bucket quantized log-ratio term, libm per distinct count value
    def _ln_per_distinct(v: np.ndarray, add: int) -> np.ndarray:
        uv, inv = np.unique(v, return_inverse=True)
        ls = np.array([math.log(int(u) + add) for u in uv], dtype=np.float64)
        return ls[inv]

    ln_t = _ln_per_distinct(c_t, 1)
    ln_r = _ln_per_distinct(c_r, 1)
    lnn_t = math.log(n_t + DSIR_B)
    lnn_r = math.log(n_r + DSIR_B)
    term_q = np.floor(((ln_t - lnn_t - ln_r) + lnn_r) * DSIR_Q).astype(np.int64)
    ref = ray.put(term_q)

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        raw = ids % DSIR_TARGET_MOD != 0
        t = batch.filter(pa.array(raw))
        tq = ray.get(ref)
        ids_r = t.column("doc_id").to_numpy(zero_copy_only=False)
        s = pd.Series(t.column("text").to_pandas()).reset_index(drop=True)
        sp = s.str.strip().str.split()
        n_feats = sp.str.len().fillna(0).to_numpy(dtype=np.int64)
        ex = sp.explode().dropna()
        lrq = np.zeros(len(t), dtype=np.int64)
        if len(ex):
            # one md5 per DISTINCT token per batch; per-doc sums via a
            # float64 bincount (|term_q| ≲ 2e10 × ~1e3 occurrences per doc
            # stays far below 2^53 — exact, same rule as the LM scorer)
            codes, uniq = pd.factorize(ex.to_numpy(), sort=False)
            w = tq[np.fromiter((_dsir_bucket_py(x) for x in uniq),
                               dtype=np.int64, count=len(uniq))]
            lrq = np.bincount(
                ex.index.to_numpy(dtype=np.int64), weights=w[codes].astype(np.float64),
                minlength=len(t),
            ).astype(np.int64)
        avg = np.where(n_feats > 0, (lrq.astype(np.float64) / np.where(
            n_feats > 0, n_feats, 1)) / DSIR_Q, 0.0)
        return pa.table(
            {
                "doc_id": pa.array(ids_r.astype(np.int64)),
                "n_feats": pa.array(n_feats),
                "logratio_q": pa.array(lrq),
                "logratio_avg": pa.array(avg),
                "dsir_keep": pa.array((n_feats > 0) & (avg > 0.0)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def doc_importance_oracle_sql() -> str:
    toks = cp.SQL_TOKS.format(t="text")
    bkt = f"({cp.SQL_W64.format(s='token')} % {DSIR_B})::BIGINT"
    return f"""
WITH occ AS (
  SELECT doc_id, (doc_id % {DSIR_TARGET_MOD} = 0) AS is_tgt,
         unnest({toks}) AS token
  FROM documents
),
bo AS (SELECT doc_id, is_tgt, {bkt} AS bucket FROM occ),
hist AS (
  SELECT bucket,
    sum(CASE WHEN is_tgt THEN 1 ELSE 0 END)::BIGINT AS c_t,
    sum(CASE WHEN is_tgt THEN 0 ELSE 1 END)::BIGINT AS c_r
  FROM bo GROUP BY bucket
),
tot AS (
  SELECT coalesce(sum(c_t), 0)::BIGINT AS n_t,
         coalesce(sum(c_r), 0)::BIGINT AS n_r
  FROM hist
),
term AS (
  SELECT b.bucket,
    floor(((ln(coalesce(h.c_t, 0) + 1) - ln(t.n_t + {DSIR_B})
            - ln(coalesce(h.c_r, 0) + 1)) + ln(t.n_r + {DSIR_B}))
          * {DSIR_Q:.1f})::BIGINT AS q
  FROM (SELECT DISTINCT bucket FROM bo) b
  LEFT JOIN hist h USING (bucket) CROSS JOIN tot t
),
per_doc AS (
  SELECT bo.doc_id, count(*)::BIGINT AS n_feats, sum(term.q)::BIGINT AS lrq
  FROM bo JOIN term USING (bucket)
  WHERE NOT bo.is_tgt
  GROUP BY bo.doc_id
)
SELECT d.doc_id,
  coalesce(p.n_feats, 0)::BIGINT AS n_feats,
  coalesce(p.lrq, 0)::BIGINT AS logratio_q,
  CASE WHEN coalesce(p.n_feats, 0) > 0
       THEN (p.lrq::DOUBLE / p.n_feats) / {DSIR_Q:.1f} ELSE 0.0 END
    AS logratio_avg,
  (coalesce(p.n_feats, 0) > 0 AND
   CASE WHEN coalesce(p.n_feats, 0) > 0
        THEN (p.lrq::DOUBLE / p.n_feats) / {DSIR_Q:.1f} ELSE 0.0 END > 0.0)
    AS dsir_keep
FROM documents d LEFT JOIN per_doc p USING (doc_id)
WHERE d.doc_id % {DSIR_TARGET_MOD} != 0
""".strip()


# ---------------------------------------------------------------------------
# T84: Gopher quality rules (Rae et al. 2021, appendix A1.1) — the published
# standard rule set, per-rule flags + overall pass, one stateless pass.
# Every ratio threshold is evaluated in INTEGERS (10*x <= 9*n style) so the
# DuckDB twin is bit-exact with no float division anywhere.
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000


def _gopher_batch(batch: pa.Table) -> pa.Table:
    import re

    ids = batch.column("doc_id")
    s = pd.Series(batch.column("text").to_pandas())
    idx = s.index

    def agg(series, how="sum"):
        if not len(series):
            return np.zeros(len(s), np.int64)
        g = series.groupby(level=0)
        out = (g.nunique() if how == "nunique" else g.sum())
        return out.reindex(idx, fill_value=0).to_numpy(dtype=np.int64)

    toks = s.str.split()
    ex = toks.explode().dropna()
    n_words = toks.str.len().fillna(0).to_numpy(dtype=np.int64)
    sum_len = agg(ex.str.len())
    n_alpha = agg(ex.str.contains(r"[a-zA-Z]", regex=True))
    low = ex.str.lower()
    n_stop = agg(low[low.isin(GOPHER_STOPWORDS)], how="nunique")
    # literal non-overlapping counts — same semantics as the SQL
    # replace()-based counting ('....' counts one ellipsis on both sides)
    n_hash = s.str.count("#").fillna(0).to_numpy(dtype=np.int64)
    n_ell = s.str.count(re.escape("...")).fillna(0).to_numpy(dtype=np.int64)
    lines = s.str.split("\n")
    lx = lines.explode().dropna()
    n_lines = lines.str.len().fillna(0).to_numpy(dtype=np.int64)
    n_bullet = agg(lx.str.startswith(("- ", "• ")))
    n_ell_lines = agg(lx.str.endswith("..."))

    r_wc = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    r_mwl = (n_words > 0) & (3 * n_words <= sum_len) & (sum_len <= 10 * n_words)
    r_sym = (n_words > 0) & (10 * (n_hash + n_ell) <= n_words)
    r_bul = (n_lines > 0) & (10 * n_bullet <= 9 * n_lines)
    r_ell = (n_lines > 0) & (10 * n_ell_lines <= 3 * n_lines)
    r_alp = (n_words > 0) & (5 * n_alpha >= 4 * n_words)
    r_stp = n_stop >= 2
    ok = r_wc & r_mwl & r_sym & r_bul & r_ell & r_alp & r_stp
    return pa.table(
        {
            "doc_id": ids,
            "n_words": pa.array(n_words, pa.int64()),
            "r_word_count": pa.array(r_wc),
            "r_mean_word_len": pa.array(r_mwl),
            "r_symbol_ratio": pa.array(r_sym),
            "r_bullet_lines": pa.array(r_bul),
            "r_ellipsis_lines": pa.array(r_ell),
            "r_alpha_words": pa.array(r_alp),
            "r_stopwords": pa.array(r_stp),
            "pass_gopher": pa.array(ok),
        }
    )


def q_doc_gopher_flags(sf_dir: str):
    """Gopher quality rules per doc: word count 50–100k, mean word length
    3–10, (# + ellipsis)/words ≤ 0.1, bullet-start lines ≤ 90%,
    ellipsis-end lines ≤ 30%, words-with-alpha ≥ 80%, ≥ 2 distinct
    required stopwords — per-rule flags + overall pass."""
    return cp.read_documents(sf_dir).map_batches(
        _gopher_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def doc_gopher_flags_oracle_sql() -> str:
    toks = cp.SQL_TOKS.format(t="text")
    stop = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id, text, {toks} AS toks,
    CASE WHEN text IS NULL THEN NULL ELSE string_split(text, chr(10)) END AS lines
  FROM documents
),
per AS (
  SELECT doc_id,
    coalesce(len(toks), 0)::BIGINT AS n_words,
    coalesce(list_sum(list_transform(toks, t -> len(t))), 0)::BIGINT AS sum_len,
    coalesce(len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))), 0)::BIGINT AS n_alpha,
    coalesce(len(list_distinct(list_filter(list_transform(toks, t -> lower(t)),
      t -> t IN ({stop})))), 0)::BIGINT AS n_stop,
    CASE WHEN text IS NULL THEN 0
         ELSE len(text) - len(replace(text, '#', '')) END::BIGINT AS n_hash,
    CASE WHEN text IS NULL THEN 0
         ELSE (len(text) - len(replace(text, '...', ''))) // 3 END::BIGINT AS n_ell,
    coalesce(len(lines), 0)::BIGINT AS n_lines,
    coalesce(len(list_filter(lines, l -> l LIKE '- %' OR l LIKE '• %')), 0)::BIGINT AS n_bullet,
    coalesce(len(list_filter(lines, l -> l LIKE '%...')), 0)::BIGINT AS n_ell_lines
  FROM base
)
SELECT doc_id, n_words,
  (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}) AS r_word_count,
  (n_words > 0 AND 3*n_words <= sum_len AND sum_len <= 10*n_words) AS r_mean_word_len,
  (n_words > 0 AND 10*(n_hash + n_ell) <= n_words) AS r_symbol_ratio,
  (n_lines > 0 AND 10*n_bullet <= 9*n_lines) AS r_bullet_lines,
  (n_lines > 0 AND 10*n_ell_lines <= 3*n_lines) AS r_ellipsis_lines,
  (n_words > 0 AND 5*n_alpha >= 4*n_words) AS r_alpha_words,
  (n_stop >= 2) AS r_stopwords,
  ((n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
   AND (n_words > 0 AND 3*n_words <= sum_len AND sum_len <= 10*n_words)
   AND (n_words > 0 AND 10*(n_hash + n_ell) <= n_words)
   AND (n_lines > 0 AND 10*n_bullet <= 9*n_lines)
   AND (n_lines > 0 AND 10*n_ell_lines <= 3*n_lines)
   AND (n_words > 0 AND 5*n_alpha >= 4*n_words)
   AND (n_stop >= 2)) AS pass_gopher
FROM per
""".strip()


# per-source curation dashboard over the Gopher rules: mixing decisions are
# made per SOURCE, so the pass rate has to be reported there too

_SQR_SENT = "\x00\x00sqr-sent"


def _source_quality_partial(batch: pa.Table) -> pa.Table:
    from ..stages.aggregate import _NULL_KEY

    flags = _gopher_batch(batch)  # row-aligned with the input batch
    ok = flags.column("pass_gopher").to_numpy(zero_copy_only=False)
    src = pd.Series(batch.column("source").to_pandas()).fillna(_NULL_KEY)
    codes, uniq = pd.factorize(src.to_numpy(dtype=object), sort=False)
    return pa.table(
        {
            "source": pa.array(uniq.astype(object), pa.string()),
            "n_docs": pa.array(np.bincount(codes, minlength=len(uniq))
                               .astype(np.int64), pa.int64()),
            "n_pass": pa.array(
                np.bincount(codes, weights=ok.astype(np.float64),
                            minlength=len(uniq)).astype(np.int64),
                pa.int64()),
        }
    )


def q_source_quality_report(sf_dir: str):
    """Per-source Gopher pass rates: (source, n_docs, n_pass, pass_rate) —
    the curation dashboard behind per-source mixing decisions.  Pure
    combiner (≤ |sources| rows per batch)."""
    import pyarrow.compute as pc_
    import ray.data as rd

    from ray.data.aggregate import Sum

    from ..stages.aggregate import _unmask_col

    agg = (
        cp.read_documents(sf_dir, columns=("doc_id", "text", "source"))
        .map_batches(
            _source_quality_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .union(rd.from_arrow(pa.table(
            {
                "source": pa.array([_SQR_SENT], pa.string()),
                "n_docs": pa.array([0], pa.int64()),
                "n_pass": pa.array([0], pa.int64()),
            }
        )))
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_pass", alias_name="n_pass"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc_.not_equal(t.column("source"), _SQR_SENT))
        nd = t.column("n_docs").to_numpy(zero_copy_only=False).astype(np.int64)
        np_ = t.column("n_pass").to_numpy(zero_copy_only=False).astype(np.int64)
        rate = np_ / np.where(nd == 0, 1, nd)  # int/int division, exact twin
        return pa.table(
            {
                "source": _unmask_col(t.column("source")),
                "n_docs": pa.array(nd, pa.int64()),
                "n_pass": pa.array(np_, pa.int64()),
                "pass_rate": pa.array(rate, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def source_quality_report_oracle_sql() -> str:
    return f"""
WITH g AS ({doc_gopher_flags_oracle_sql()})
SELECT d.source, count(*)::BIGINT AS n_docs,
  sum(CASE WHEN g.pass_gopher THEN 1 ELSE 0 END)::BIGINT AS n_pass,
  (sum(CASE WHEN g.pass_gopher THEN 1 ELSE 0 END)::BIGINT)::DOUBLE
    / (count(*)::BIGINT)::DOUBLE AS pass_rate
FROM documents d JOIN g USING (doc_id)
GROUP BY d.source
""".strip()
