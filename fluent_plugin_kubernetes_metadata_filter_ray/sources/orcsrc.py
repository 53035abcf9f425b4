"""ORC transcript source — the Hive/Hadoop-ecosystem columnar feed.

Ray 2.49 has no native ``read_orc``, so this source composes one from
primitives the engine already trusts: ``read_binary_files`` fans the
shard files out (one task per file, streaming like any multi-file
source), and each task decodes its shard with ``pyarrow.orc`` into the
canonical transcript schema.  Arrow's ORC reader preserves null vs ''
and microsecond timestamps natively (none of the CSV round-trip traps),
so the only contract to pin is schema equality with the parquet path.

Reference analog: the S1/S2 event-input surface (SURVEY §2.1) — same
normalized transcript schema as the parquet/JSONL/msgpack/rawlog/CSV
feeds, so everything downstream (parse → enrich → route) is
source-agnostic.
"""

from __future__ import annotations

import os

import pyarrow as pa

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def write_transcripts_orc(t: pa.Table, out_dir: str, shard_rows: int = 250_000) -> int:
    """Lay a transcript table out as ORC shards (one file per shard_rows)."""
    import pyarrow.orc as po

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for i, start in enumerate(range(0, t.num_rows, shard_rows)):
        part = t.slice(start, shard_rows)
        po.write_table(part, os.path.join(out_dir, f"part-{i:05d}.orc"))
        n += part.num_rows
    if n == 0:  # keep an empty feed readable (typed zero-row shard)
        po.write_table(t, os.path.join(out_dir, "part-00000.orc"))
    return n


def read_transcripts_orc(orc_dir: str):
    """Ray Dataset over a directory of transcript ORC shards: binary fan-out
    + per-task Arrow ORC decode (zero-copy into the block)."""
    import io

    import ray.data

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.orc as po

        tables = []
        for buf in batch.column("bytes").to_pylist():
            t = po.ORCFile(io.BytesIO(buf)).read()
            tables.append(t.select(TRANSCRIPT_COLS))
        out = pa.concat_tables(tables) if tables else None
        if out is None or out.num_rows == 0:
            return _empty()
        # ORC stores timestamps as ns: restore the canonical µs unit
        ts = out.column("ts").cast(pa.timestamp("us"))
        return out.set_column(out.column_names.index("ts"), "ts", ts)

    return ray.data.read_binary_files(orc_dir, file_extensions=["orc"]).map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True
    )


def _empty() -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "role": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
            "tool": pa.array([], pa.string()),
            "ts": pa.array([], pa.timestamp("us")),
        }
    )


def q_transcripts_orc(sf_dir: str):
    """Driver-gated witness: the derived transcript table written as ORC
    shards and read back must equal the parquet-path table bit-for-bit
    (same oracle as q_transcripts)."""
    import glob
    import hashlib
    import shutil

    import pyarrow.parquet as pq

    from .. import datagen as dg

    src = dg.transcripts_path(sf_dir)
    out = "/tmp/kmeta_cache/orcsrc_{}".format(
        hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    )
    done = out + ".done"
    if not os.path.exists(done):
        shutil.rmtree(out, ignore_errors=True)
        if os.path.isdir(src):
            t = pa.concat_tables(pq.read_table(p) for p in sorted(glob.glob(f"{src}/*")))
        else:
            t = pq.read_table(src)
        write_transcripts_orc(t, out)
        with open(done, "w") as f:
            f.write("ok")
    return read_transcripts_orc(out)
