"""Resumable runs: per-partition lineage manifests + skip-completed logic
(BASELINE.json north_rule: "resumable from checkpoint with per-partition
lineage + metrics").

The unit of resumption is an *input shard* (one or more source Parquet
files).  Each shard writes:

  out_dir/shard=NNNNN/role=*/...parquet     (the routed sink rows)
  out_dir/_manifest_shard_NNNNN.json        (lineage + metrics, written LAST)

The manifest is the commit marker: it is written atomically (tmp + rename)
only after the shard's sink write completed, so a crashed run leaves no
manifest and the shard re-runs from scratch.  Re-running is idempotent
because ``route_write`` clears the shard output dir before writing —
Ray's ``write_parquet`` uses fresh UUID filenames per attempt, so without
the clear, partial files from a crashed mid-write attempt would survive
alongside the re-run's files and double-count rows.  A resumed run skips
every shard whose manifest exists.

Manifest fields: input files, rows_in/rows_out, per-role routed counts,
enrichment-class tallies, metadata snapshot id, wall seconds — the
per-partition lineage + metrics record.

Scale note: shards here run sequentially on one node (each internally
parallel); on a cluster you run many shards concurrently (e.g. one
``ray job submit`` per shard range) — the manifest protocol is what makes
that safe.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow.parquet as pq


def _manifest_path(out_dir: str, shard_idx: int) -> str:
    return os.path.join(out_dir, f"_manifest_shard_{shard_idx:05d}.json")


def list_shards(transcripts_dir: str, files_per_shard: int = 4) -> list[list[str]]:
    files = sorted(
        os.path.join(transcripts_dir, f)
        for f in os.listdir(transcripts_dir)
        if f.endswith(".parquet")
    )
    return [files[i : i + files_per_shard] for i in range(0, len(files), files_per_shard)]


def _input_stats(files: list[str]) -> list[list[int]]:
    """Per-file (size, mtime_ns) lineage fingerprint — cheap stat-level
    identity; any rewrite of a file (even one preserving its row count,
    e.g. a re-derived cache with changed text under the same name) bumps
    mtime and invalidates the commit."""
    stats = [os.stat(p) for p in files]
    return [[s.st_size, s.st_mtime_ns] for s in stats]


def _manifest_current(mpath: str, files: list[str]) -> bool:
    """A committed manifest is honored only if its lineage still matches
    the shard: same input file LIST, same ROW COUNT, and same per-file
    (size, mtime) fingerprints.  Appending new transcript files
    (incremental ingestion — the ``in_tail`` pos-file analog) can regroup
    shards when the old file count wasn't a multiple of files_per_shard,
    and a re-derived cache can change a file's CONTENT under the same
    name and row count; all of these must invalidate the commit, never
    silently skip."""
    try:
        with open(mpath) as f:
            man = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    if man.get("input_files") != files:
        return False
    if "input_stats" in man and man["input_stats"] != _input_stats(files):
        return False
    rows_now = sum(pq.ParquetFile(p).metadata.num_rows for p in files)
    return man.get("rows_in") == rows_now


def run_resumable(
    sf_dir: str,
    out_dir: str,
    cfg=None,
    rep: int = 1,
    files_per_shard: int = 4,
    fail_after: int | None = None,
    shard_rows: int | None = None,
    transcripts_dir: str | None = None,
) -> dict:
    """Run the flagship parse → enrich → route pipeline shard-by-shard with
    per-shard lineage manifests; skips shards already committed.

    Incremental ingestion: re-running after NEW transcript files arrive in
    the input directory processes only the new shards (committed manifests
    whose lineage still matches are skipped; see ``_manifest_current``) and
    the rollup counts stay additive — the batch analog of the reference's
    ``in_tail`` position file.

    ``transcripts_dir`` overrides the datagen-derived cache (point it at a
    live landing directory).  ``fail_after=k`` injects a crash after k
    shards (tests).  Returns a summary: shards run / skipped and merged
    per-role counts.
    """
    import ray.data

    from ..config import DEFAULT_CONFIG
    from ..stages.aggregate import route_counts
    from ..stages.enrich import enrich_stage
    from ..stages.parse import parse_stage
    from ..stages.route import route_write
    from .. import datagen

    cfg = cfg or DEFAULT_CONFIG
    tdir = transcripts_dir or datagen.transcripts_path(sf_dir, rep=rep, shard_rows=shard_rows)
    snapshot = datagen.metadata_snapshot_dir()
    shards = list_shards(tdir, files_per_shard)
    os.makedirs(out_dir, exist_ok=True)

    ran, skipped = [], []
    for idx, files in enumerate(shards):
        mpath = _manifest_path(out_dir, idx)
        if os.path.exists(mpath) and _manifest_current(mpath, files):
            skipped.append(idx)
            continue
        if fail_after is not None and len(ran) >= fail_after:
            raise RuntimeError(f"injected failure before shard {idx}")

        t0 = time.perf_counter()
        rows_in = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        stats_in = _input_stats(files)  # fingerprint BEFORE processing
        shard_out = os.path.join(out_dir, f"shard={idx:05d}")

        ds = ray.data.read_parquet(files)
        enriched = enrich_stage(parse_stage(ds, cfg), cfg, snapshot)
        route_write(enriched, shard_out)

        # metrics from a thin-column read-back of the freshly written sink
        from ..stages.route import read_sink

        cols = ["role", "k8s_namespace_name", "k8s_namespace_id", "k8s_pod_id", "k8s_pod_ip"]
        counts = route_counts(read_sink(shard_out, cols)).to_pandas()
        rows_out = int(counts["n_turns"].sum())

        manifest = {
            "shard": idx,
            "input_files": files,
            "input_stats": stats_in,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "route_counts": {
                r["role"]: {k: int(r[k]) for k in ("n_turns", "n_matched", "n_orphaned", "n_full")}
                for r in counts.to_dict("records")
            },
            "snapshot": os.path.basename(os.path.normpath(snapshot)),
            "wall_s": round(time.perf_counter() - t0, 3),
        }
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, mpath)  # commit marker: atomic, written last
        ran.append(idx)

    # merged per-role counts across all manifests (lineage rollup)
    merged: dict[str, dict[str, int]] = {}
    for idx in range(len(shards)):
        with open(_manifest_path(out_dir, idx)) as f:
            man = json.load(f)
        for role, c in man["route_counts"].items():
            dst = merged.setdefault(role, dict.fromkeys(c, 0))
            for k, v in c.items():
                dst[k] += v
    return {"n_shards": len(shards), "ran": ran, "skipped": skipped, "route_counts": merged}
