"""Skew-aware shuffle utilities.

Two tools for hot keys (BASELINE.json north_rule: "skewed conv_id
partitions via salted repartition before groupby"):

  - The *combiner pushdown* used throughout this repo (see
    ``aggregate.py``): collapse each batch to ≤1 row per key before the
    exchange.  Preferred whenever the aggregate is associative — the salt is
    implicitly the batch id and no extra pass exists.
  - The *explicit salt* below, for when per-group work cannot be pre-combined
    (e.g. ``map_groups`` running a non-associative computation): append
    ``salt = hash64(key) % k``, group by ``(key, salt)`` so a hot key's rows
    spread over k reducers, then merge the k partials per key in a second,
    tiny groupby.  Correct only when ``merge_fn`` is associative across the
    salted partials — the caller asserts that by choosing this path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def add_salt_column(ds, key: str, k: int, salt_col: str = "_salt"):
    """Append a deterministic salt in [0, k): multiply-shift hash of the
    key's bytes — stable across runs/processes (not Python's seeded hash)."""

    def _salt(batch: pa.Table) -> pa.Table:
        import zlib

        vals = batch.column(key).to_pylist()
        salt = np.fromiter(
            ((zlib.crc32(str(v).encode()) * 2654435761 >> 16) % k for v in vals),
            dtype=np.int32,
            count=len(vals),
        )
        return batch.append_column(salt_col, pa.array(salt))

    return ds.map_batches(_salt, batch_format="pyarrow", zero_copy_batch=True)


def salted_groupby_sum(ds, key: str, sum_cols: list[str], k: int = 16):
    """Sum per key with an explicit two-stage salted shuffle: hot keys fan
    out over k reducers in stage 1; stage 2 merges k short partials per key."""
    from ray.data.aggregate import Sum

    salted = add_salt_column(ds, key, k)
    stage1 = salted.groupby([key, "_salt"]).aggregate(
        *[Sum(c, alias_name=c) for c in sum_cols]
    )
    return stage1.groupby(key).aggregate(*[Sum(c, alias_name=c) for c in sum_cols])
