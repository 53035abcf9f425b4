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


def q_doc_sample_stratified(sf_dir: str):
    """First-k docs (by doc_id) per source stratum.  A null source is one
    SQL-style stratum (sentinel-masked around the groupby: Ray's
    map_groups key sort rejects null keys)."""
    from ..stages.aggregate import _mask_null_key

    ds = cp.read_documents(sf_dir, columns=("doc_id", "source"))
    return _mask_null_key(ds, "source").groupby("source").map_groups(
        _head_k, batch_format="pyarrow"
    )


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
