"""Alternate transcript source: newline-delimited JSON.

The reference consumes events however fluentd feeds them — single events or
MessagePackEventStream batches through the same filter path
(test/plugin/test_filter_kubernetes_metadata.rb:727-777).  The engine analog:
any source format normalizes to the canonical transcript Arrow schema and
flows through the identical parse → enrich pipeline.  Parquet is the scale
format; JSONL covers log-shipper-style feeds."""

from __future__ import annotations

import pyarrow as pa


def _normalize(batch: pa.Table) -> pa.Table:
    from .. import datagen as dg

    cols = {}
    for f in dg.TRANSCRIPT_SCHEMA:
        c = batch.column(f.name)
        cols[f.name] = c.cast(f.type) if c.type != f.type else c
    return pa.table(cols)


def read_transcripts_jsonl(path: str):
    """JSONL → Dataset with the canonical transcript schema (conv_id,
    turn_idx:int32, role, text, tool, ts:timestamp[us])."""
    import ray.data

    ds = ray.data.read_json(path)
    return ds.map_batches(_normalize, batch_format="pyarrow", zero_copy_batch=True)
