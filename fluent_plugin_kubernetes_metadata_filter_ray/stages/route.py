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
    return _route_write_into(enriched_ds, out_dir)


def read_sink(out_dir: str, columns):
    """Column-pruned read-back of a routed sink with block count matched to
    the actual file count: Ray's default parallelism over-splits a small
    sink into empty ghost blocks, and every empty block entering a
    downstream sort/aggregate triggers a schema-less-RefBundle warning and
    a wasted task."""
    import ray
    import ray.data

    n_files = sum(
        1 for _, _, files in os.walk(out_dir) for f in files if f.endswith(".parquet")
    )
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    blocks = max(1, min(n_files, 2 * cpus))
    return ray.data.read_parquet(
        out_dir, columns=list(columns), override_num_blocks=blocks
    )


def _route_write_into(enriched_ds, out_dir: str):
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


ROLES = ("user", "assistant", "tool", "system")


def route_write_jsonl(enriched_ds, out_dir: str):
    """JSONL sink twin of :func:`route_write` — the reference's fan-out
    targets arbitrary fluentd outputs (files, forward, http), most of which
    speak line-delimited JSON; this closes the source/sink symmetry with
    sources/jsonl.py.  Same per-role layout (role=<v>/*.json, one JSON
    object per line) and the same clear-before-write idempotence contract
    the checkpoint layer relies on.

    ``write_json`` has no partition_cols (Ray 2.49), so the fan-out is K
    filtered passes over one shared scan — K = 4 known roles, and the
    filter is a vectorized Arrow kernel, so each pass prunes at the block
    level.  Dictionary-encoded enrich columns are decoded first (JSON has
    no dictionary type); timestamps serialize as epoch ms (orient=records
    default), round-tripped by read_jsonl_sink."""
    from .enrich import decode_stage

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    import pyarrow.compute as pc

    decoded = decode_stage(enriched_ds)
    for role in ROLES:
        sub = decoded.map_batches(
            lambda t, r=role: t.filter(pc.equal(t.column("role"), r)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        sub.write_json(os.path.join(out_dir, f"role={role}"))
    return out_dir


def read_jsonl_sink(out_dir: str, columns):
    """Read-back of a JSONL sink (hive-partitioned role dirs)."""
    import ray.data
    from ray.data.datasource.partitioning import Partitioning

    ds = ray.data.read_json(out_dir, partitioning=Partitioning("hive"))
    return ds.select_columns(list(columns))
