"""Broadcast hash join: the explicit small-side join operator (the enrich
stage is its cached cousin — SURVEY.md §2.4 J1-J2).

``documents ⋈ embeddings ON doc_id = vec_id``: the smaller side loads once
on the driver, ships via ``ray.put`` (one object-store copy per node), and
every map task probes it — no shuffle of the big side, ever.  This is the
join strategy for any side table that fits a node's memory (≲10^8 keyed
rows); beyond that, co-partition both sides by key hash and stream
per-bucket merge joins (documented, not needed for these tables)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import corpus as cp


def _load_embedding_side(sf_dir: str) -> dict[int, int]:
    """Small side: vec_id → label (columns pruned at the read)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"])
    return dict(
        zip(
            t.column("vec_id").to_numpy(zero_copy_only=False).tolist(),
            t.column("label").to_numpy(zero_copy_only=False).tolist(),
        )
    )


class BroadcastJoiner:
    def __init__(self, side_ref):
        import ray

        self.side = (
            ray.get(side_ref) if type(side_ref).__name__ == "ObjectRef" else side_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        lab = np.fromiter(
            (self.side.get(int(i), -1) for i in ids), dtype=np.int64, count=len(ids)
        )
        keep = lab >= 0  # inner join
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "n_chars": batch.column("n_chars").filter(pa.array(keep)),
                "label": pa.array(lab[keep]),
            }
        )


def q_doc_embed_join(sf_dir: str):
    """Inner broadcast join documents↔embeddings on doc_id = vec_id."""
    import ray

    side_ref = ray.put(_load_embedding_side(sf_dir))
    ds = cp.read_documents(sf_dir, columns=("doc_id", "n_chars"))
    return ds.map_batches(
        BroadcastJoiner,
        fn_constructor_kwargs={"side_ref": side_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
    )


def doc_embed_join_oracle_sql() -> str:
    return """
SELECT d.doc_id, d.n_chars, CAST(e.label AS BIGINT) AS label
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
""".strip()


# ---------------------------------------------------------------------------
# broadcast AS-OF join: turn → latest metadata-snapshot version ≤ ts
# ---------------------------------------------------------------------------

# deterministic snapshot-version timeline (static on both sides): 8 versions,
# every 4 days from 2024-01-01 — the batch analog of the reference's watch
# updates (each MODIFIED event advances the store's resourceVersion;
# kubernetes_metadata_watch_pods.rb:160-204): a record is enriched against
# the newest snapshot that existed when it was logged.
SNAPSHOT_VERSIONS = [
    ("2024-01-01 00:00:00", 0), ("2024-01-05 00:00:00", 1),
    ("2024-01-09 00:00:00", 2), ("2024-01-13 00:00:00", 3),
    ("2024-01-17 00:00:00", 4), ("2024-01-21 00:00:00", 5),
    ("2024-01-25 00:00:00", 6), ("2024-01-29 00:00:00", 7),
]


def _version_ts_us() -> np.ndarray:
    import pandas as pd

    return np.array(
        [pd.Timestamp(t).value // 1000 for t, _ in SNAPSHOT_VERSIONS], dtype=np.int64
    )


def asof_snapshot_stage(ds):
    """AS-OF join as a broadcast + vectorized ``searchsorted`` (the custom
    operator Ray Data lacks natively): the version timeline is tiny and
    sorted, so each batch binary-searches its ``ts`` column against it —
    no shuffle, no per-row Python.  At 10^12 rows this is the only sane
    shape for a small sorted right side; a large right side would need
    ts-range co-partitioning of both sides + per-range merge."""
    vts = _version_ts_us()

    def fn(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vts, ts, side="right") - 1  # latest version ≤ ts
        ver = idx.astype(np.int64)
        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "snapshot_version": pa.array(ver, pa.int64(), mask=idx < 0),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_turn_snapshot_asof(sf_dir: str):
    """Each turn → the snapshot version in force at its timestamp."""
    from ..pipelines import flagship

    return asof_snapshot_stage(flagship.read_transcripts(sf_dir))


def turn_snapshot_asof_oracle_sql() -> str:
    from .. import datagen as dg

    vals = ", ".join(f"(TIMESTAMP '{t}', {v})" for t, v in SNAPSHOT_VERSIONS)
    return f"""
WITH {dg.TRANSCRIPTS_CTE},
versions(vts, ver) AS (VALUES {vals})
SELECT t.conv_id, t.turn_idx, v.ver AS snapshot_version
FROM transcripts_t t ASOF LEFT JOIN versions v ON t.ts >= v.vts
""".strip()
