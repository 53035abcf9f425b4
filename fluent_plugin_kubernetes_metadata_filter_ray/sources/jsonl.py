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


def write_transcripts_jsonl_gz(t: pa.Table, out_dir: str, shard_rows: int = 250_000) -> int:
    """Lay a transcript table out as gzip-compressed JSONL shards — the
    wire format log shippers actually archive (fluentd's ``out_file`` with
    ``compress gzip``).  Timestamps ride ISO-8601 at µs precision; null vs
    empty string is preserved exactly (JSON null vs \"\")."""
    import gzip
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for i, start in enumerate(range(0, max(t.num_rows, 1), shard_rows)):
        part = t.slice(start, shard_rows)
        with gzip.open(os.path.join(out_dir, f"part-{i:05d}.jsonl.gz"), "wt") as f:
            for row in part.to_pylist():
                if row.get("ts") is not None:
                    row["ts"] = row["ts"].isoformat()
                f.write(json.dumps(row) + "\n")
        n += part.num_rows
    return n


def read_transcripts_jsonl_gz(path: str):
    """Gzip JSONL → Dataset with the canonical transcript schema.  Ray's
    JSON datasource decompresses per file extension; decompression and
    parse both happen inside the read tasks (one task per shard), so the
    driver never touches compressed bytes."""
    import ray.data

    ds = ray.data.read_json(path, file_extensions=["jsonl.gz"])
    return ds.map_batches(_normalize, batch_format="pyarrow", zero_copy_batch=True)


def q_transcripts_jsonl_gz(sf_dir: str):
    """Driver-gated witness: the derived transcript table round-tripped
    through gzip JSONL shards must equal the parquet-path table
    bit-for-bit (same oracle as q_transcripts)."""
    import glob
    import hashlib
    import os
    import shutil

    import pyarrow.parquet as pq

    from .. import datagen as dg

    src = dg.transcripts_path(sf_dir)
    out = "/tmp/kmeta_cache/jsonlgz_{}".format(
        hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    )
    done = out + ".done"  # sibling, not inside: the reader scans the dir
    if not os.path.exists(done):
        shutil.rmtree(out, ignore_errors=True)
        if os.path.isdir(src):
            t = pa.concat_tables(pq.read_table(p) for p in sorted(glob.glob(f"{src}/*")))
        else:
            t = pq.read_table(src)
        write_transcripts_jsonl_gz(t, out)
        with open(done, "w") as f:
            f.write("ok")
    return read_transcripts_jsonl_gz(out)
