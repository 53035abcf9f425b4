"""CSV transcript source: the lowest-common-denominator feed (fluentd's
``in_tail`` + ``parser csv``, spreadsheet exports, legacy ETL drops).

Round-trip losslessness is the whole game for a CSV feed, so this source
pins the two classic traps explicitly:

- **null vs empty string**: pyarrow's CSV writer emits null as an UNQUOTED
  empty field and '' as a QUOTED ``""``; reading with
  ``strings_can_be_null=True, quoted_strings_can_be_null=False`` restores
  the distinction exactly (a naive reader folds both to null and the
  routed-row equality check catches it).
- **schema drift**: every column type is forced via ``column_types`` —
  CSV inference would happily read an all-digit conv_id shard as int64 and
  the union of shards would then be schema-inconsistent.

Embedded newlines/quotes/commas ride RFC-4180 quoting (``newlines_in_values``
on read); timestamps round-trip through Arrow's ISO-8601 writer/parser at
microsecond precision.

Reference analog: the S1/S2 event-input surface (SURVEY §2.1) — same
normalized transcript schema as the parquet/JSONL/msgpack/rawlog feeds, so
everything downstream (parse → enrich → route) is source-agnostic.
"""

from __future__ import annotations

import os

import pyarrow as pa

TRANSCRIPT_TYPES = {
    "conv_id": pa.string(),
    "turn_idx": pa.int32(),
    "role": pa.string(),
    "text": pa.string(),
    "tool": pa.string(),
    "ts": pa.timestamp("us"),
}


def write_transcripts_csv(t: pa.Table, out_dir: str, shard_rows: int = 250_000) -> int:
    """Lay a transcript table out as CSV shards (one file per shard_rows, so
    a read fans out like any multi-file source)."""
    import pyarrow.csv as pacsv

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for i, start in enumerate(range(0, t.num_rows, shard_rows)):
        part = t.slice(start, shard_rows)
        pacsv.write_csv(part, os.path.join(out_dir, f"part-{i:05d}.csv"))
        n += part.num_rows
    if n == 0:  # keep an empty feed readable (typed header-only shard)
        pacsv.write_csv(t, os.path.join(out_dir, "part-00000.csv"))
    return n


def read_transcripts_csv(csv_dir: str):
    """Ray Dataset over a directory of transcript CSV shards, schema-pinned
    and null-exact (see module docstring)."""
    import pyarrow.csv as pacsv
    import ray.data

    return ray.data.read_csv(
        csv_dir,
        file_extensions=["csv"],  # skip markers/sidecars dropped next to shards
        convert_options=pacsv.ConvertOptions(
            column_types=TRANSCRIPT_TYPES,
            strings_can_be_null=True,
            quoted_strings_can_be_null=False,
        ),
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
    )


def q_transcripts_csv(sf_dir: str):
    """Driver-gated witness: the derived transcript table written as CSV
    shards and read back must equal the parquet-path table bit-for-bit
    (same oracle as q_transcripts)."""
    import hashlib
    import shutil

    import pyarrow.parquet as pq

    from .. import datagen as dg

    src = dg.transcripts_path(sf_dir)
    out = "/tmp/kmeta_cache/csvsrc_{}".format(
        hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    )
    done = out + ".done"  # sibling, not inside: the reader scans the dir
    if not os.path.exists(done):
        shutil.rmtree(out, ignore_errors=True)
        if os.path.isdir(src):
            import glob

            t = pa.concat_tables(pq.read_table(p) for p in sorted(glob.glob(f"{src}/*")))
        else:
            t = pq.read_table(src)
        write_transcripts_csv(t, out)
        with open(done, "w") as f:
            f.write("ok")
    return read_transcripts_csv(out)
