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
