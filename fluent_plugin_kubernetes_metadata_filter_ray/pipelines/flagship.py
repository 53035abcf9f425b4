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
    no derivation step."""
    path = datagen.transcripts_path(sf_dir, rep=rep)
    return ray.data.read_parquet(path)


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
    ``out_dir`` is given, also fan-out writes the enriched rows per role."""
    enriched = build_enriched(sf_dir, cfg, rep=rep)
    if out_dir is not None:
        route_write(enriched, out_dir)
        enriched = build_enriched(sf_dir, cfg, rep=rep)  # fresh lazy chain for the aggregate
    return route_counts(enriched)
