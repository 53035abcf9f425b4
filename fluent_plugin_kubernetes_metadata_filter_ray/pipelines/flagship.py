"""The flagship parse → enrich → route → aggregate pipeline (SURVEY.md §3.2,
§7.2 physical plan).

One lazy ``ray.data.Dataset`` chain end-to-end; the streaming executor
pipelines read / parse (stateless tasks) / enrich (actor pool) / write with
backpressure.  Nothing materializes the full dataset; the only shuffle is the
tiny per-role partial-count aggregate.
"""

from __future__ import annotations

import ray.data

from .. import datagen
from ..config import DEFAULT_CONFIG, PipelineConfig
from ..stages.aggregate import route_counts
from ..stages.enrich import enrich_stage
from ..stages.parse import parse_stage
from ..stages.route import route_write


def read_transcripts(sf_dir: str, rep: int = 1, parallelism: int = -1):
    """Source: the derived transcripts Parquet (cached under /tmp).  On a
    real deployment this is just ``read_parquet`` of the transcript table —
    no derivation step.

    Block sizing: ~2 blocks per CPU, bounded by 4×file-count so tiny inputs
    don't shatter into row-scraps.  Ray's default here over-splits (≈6k-row
    blocks), and per-task overhead then dominates the vectorized kernels."""
    import os

    path = datagen.transcripts_path(sf_dir, rep=rep)
    if parallelism == -1:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 4))
        except Exception:
            cpus = 4
        n_files = max(1, len([f for f in os.listdir(path) if f.endswith(".parquet")]))
        # ~2 blocks/CPU; small inputs capped at 4 blocks/file, many-file
        # inputs coalesce several files per read task
        parallelism = max(4, min(2 * cpus, 4 * n_files))
    return ray.data.read_parquet(path, override_num_blocks=parallelism)


def build_enriched(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG, rep: int = 1,
                   store_ref=None):
    """read → parse → enrich, lazy."""
    ds = read_transcripts(sf_dir, rep=rep)
    ds = parse_stage(ds, cfg)
    store = store_ref if store_ref is not None else datagen.metadata_snapshot_dir()
    return enrich_stage(ds, cfg, store)


def run_flagship(sf_dir: str, out_dir: str | None = None,
                 cfg: PipelineConfig = DEFAULT_CONFIG, rep: int = 1):
    """Full pipeline; returns the per-sink counts Dataset (small).  When
    ``out_dir`` is given, fan-out writes the enriched rows per role and the
    aggregate runs over a *column-pruned read-back of the sink* — one enrich
    pass total.  Re-reading 4 thin columns from Parquet is far cheaper than
    re-running enrichment (and is the resumable pattern: the sink is the
    checkpoint)."""
    if out_dir is not None:
        from ..stages.route import read_sink

        route_write(build_enriched(sf_dir, cfg, rep=rep), out_dir)
        cols = ["role", "k8s_namespace_name", "k8s_namespace_id", "k8s_pod_id", "k8s_pod_ip"]
        enriched = read_sink(out_dir, cols)  # hive partitioning is the default
    else:
        enriched = build_enriched(sf_dir, cfg, rep=rep)
    return route_counts(enriched)
