"""Fan-out routing to per-role Parquet sinks (S3 in SURVEY.md §2.1).

The reference's downstream ``<match **>`` fan-out becomes a single-scan
partitioned Parquet write: one directory per ``role`` value, so each sink is
an independently readable row set (routed-row equality per sink).  Low
cardinality (4 roles) → the hash exchange is cheap; rows are not reordered.
"""

from __future__ import annotations

import os
import shutil


def route_write(enriched_ds, out_dir: str):
    """Single-scan fan-out: write_parquet partitioned by role.

    The target dir is cleared first: Ray's ``write_parquet`` uses fresh
    UUID-based filenames per run, so writing into a populated dir (a second
    run with the same ``--out``, or files left by a crashed attempt) would
    silently mix old rows into the sink and inflate every downstream
    read-back count.  Clearing makes the write idempotent — the property the
    checkpoint layer's shard re-run relies on."""
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    try:
        enriched_ds.write_parquet(out_dir, partition_cols=["role"])
    except TypeError:
        # older Ray without partition_cols: K filtered passes over a shared scan
        import pyarrow.compute as pc
        for role in ("user", "assistant", "tool", "system"):
            sub = enriched_ds.map_batches(
                lambda t, r=role: t.filter(pc.equal(t.column("role"), r)),
                batch_format="pyarrow",
            )
            sub.write_parquet(os.path.join(out_dir, f"role={role}"))
    return out_dir
