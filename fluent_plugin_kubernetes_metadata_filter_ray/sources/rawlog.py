"""Container-log *tail* source: the reference's actual input shape.

fluentd's ``in_tail`` reads ``/var/log/containers/<pod>_<ns>_<container>-
<dockerid>.log`` and derives the event TAG from the file path (slashes →
dots) — the tag regex the filter parses (M1/U2) never arrives as a record
field.  The docker json-file driver writes one JSON object per line:
``{"log": ..., "stream": ..., "time": ...}``; fluentd pipelines commonly
merge additional record keys (record_transformer), which is how the
transcript fields (conv_id, turn_idx, role) ride along here.

This source mirrors that exactly on Ray Data: ``read_json`` over the
``.log`` files with ``include_paths=True``, the tag reconstructed from each
row's file name — so the tag comes from WHERE the row was read, not from a
column (unlike the parquet/JSONL/msgpack sources).  Everything downstream
(parse → enrich → route) is identical.

Reference: ``in_tail`` + ``filter_kubernetes_metadata.rb`` tag_to_kubernetes
_name_regexp (filter_kubernetes_metadata.rb:131-151); the e2e fixture tags
in test_filter_kubernetes_metadata.rb use the same path-derived spelling.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

TAG_PREFIX = "var.log.containers."
# Python and the SQL twin share these EXACT patterns (RE2 on both sides),
# so which rows are tail-mappable is bit-identical in both engines.
CONTAINERS_TAG_RE = r"^var\.log\.containers\.(.+\.log)$"
PODS_TAG_RE = r"^var\.log\.pods\.([^.]+)\.([^.]+)\.([0-9]+)\.log$"
_TAG_RES = None  # compiled lazily


def _tag_to_relpath(tool) -> str | None:
    """kube tag → tail file path (both reference grammars).  The tag is the
    path with '/' → '.', so the containers grammar maps to ONE file under
    var/log/containers/ and the pods grammar to the nested
    var/log/pods/<ns>_<pod>_<uid>/<container>/<n>.log layout."""
    import re

    global _TAG_RES
    if not isinstance(tool, str):
        return None
    if "/" in tool or "\\" in tool:  # path-hostile tag: never a tail path
        return None
    if _TAG_RES is None:
        _TAG_RES = (re.compile(CONTAINERS_TAG_RE), re.compile(PODS_TAG_RE))
    m = _TAG_RES[0].match(tool)
    if m:
        return os.path.join("var/log/containers", m.group(1))
    m = _TAG_RES[1].match(tool)
    if m:
        return os.path.join("var/log/pods", m.group(1), m.group(2), m.group(3) + ".log")
    return None


def write_container_logs(transcripts: pa.Table, out_dir: str) -> int:
    """Test/bench helper (driver-side): lay a transcript table out as
    docker-style container log files — one file per distinct tool tag at
    the tag's path spelling (both grammars), one JSON object per line with
    the docker keys (log/stream/time) plus the merged transcript record
    keys.  Rows whose ``tool`` maps to no tail path are skipped (returned
    count = rows written)."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    df = transcripts.to_pandas()
    rel = df["tool"].astype(object).map(_tag_to_relpath)
    df = df[rel.notna()]
    n = 0
    for tool, sub in df.groupby("tool", sort=False):
        path = os.path.join(out_dir, _tag_to_relpath(tool))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            for _, r in sub.iterrows():
                rec = {
                    "log": _none(r["text"]),
                    "stream": "stdout",
                    "time": None if _isna(r["ts"]) else r["ts"].isoformat() + "Z",
                    "conv_id": _none(r["conv_id"]),
                    "turn_idx": None if _isna(r["turn_idx"]) else int(r["turn_idx"]),
                    "role": _none(r["role"]),
                }
                f.write(json.dumps(rec) + "\n")
                n += 1
    return n


def _none(v):
    import pandas as pd

    return None if pd.isna(v) else v


def _isna(v) -> bool:
    import pandas as pd

    return bool(pd.isna(v))


def read_container_logs(log_dir: str):
    """Tail-source reader: docker-format ``.log`` files → canonical
    transcript schema, with the kube TAG reconstructed from each row's file
    path (relative path, '/' → '.') — in_tail semantics, covering both the
    containers and pods path grammars."""
    import ray.data

    from .. import datagen as dg

    root = os.path.abspath(log_dir)
    ds = ray.data.read_json(
        log_dir, file_extensions=["log"], include_paths=True
    )

    def normalize(t: pa.Table) -> pa.Table:
        # Path → tag derivation runs once per DISTINCT path (one file per
        # task in practice), never per row: dictionary-encode the path
        # column, map the handful of dictionary values through the os.path
        # logic, then gather through the index array (3392b96 pattern).
        penc = pc.dictionary_encode(t.column("path")).combine_chunks()
        dvals = [
            os.path.relpath(os.path.abspath(p), root).replace(os.sep, ".")
            for p in penc.dictionary.to_pylist()
        ]
        tool = pc.take(pa.array(dvals, pa.string()), penc.indices)

        def col(name, typ):
            """Bare docker lines carry only log/stream/time — any merged
            record key (conv_id, turn_idx, role) is OPTIONAL and nulls
            when absent, like a fluentd record with no such field."""
            if name not in t.column_names:
                return pa.nulls(len(t), typ)
            return t.column(name).cast(typ)

        if "time" not in t.column_names:
            ts = pa.nulls(len(t), pa.timestamp("us"))
        else:
            tm = t.column("time")
            if pa.types.is_timestamp(tm.type):
                ts = tm.cast(pa.timestamp("us"))
            else:
                # docker RFC3339 'Z' suffix: strip, then Arrow's native ISO
                # cast (Arrow strptime lacks %f — the cast handles fractions)
                ts = pc.replace_substring_regex(
                    tm.cast(pa.string()), "Z$", ""
                ).cast(pa.timestamp("us"))
        cols = {
            "conv_id": col("conv_id", pa.string()),
            "turn_idx": col("turn_idx", pa.int32()),
            "role": col("role", pa.string()),
            "text": col("log", pa.string()),
            "tool": tool,
            "ts": ts,
        }
        out = pa.table(cols)
        assert out.schema.equals(dg.TRANSCRIPT_SCHEMA), out.schema
        return out

    return ds.map_batches(normalize, batch_format="pyarrow", zero_copy_batch=True)


def q_transcripts_rawlog(sf_dir: str):
    """Driver-gated witness for the tail source: the derived transcript
    table laid out as container-log files and read back through the
    path-derived-tag reader must equal the transcripts rows whose tool is
    tail-mappable (the oracle filters with the same RE2 patterns)."""
    import hashlib
    import shutil

    import pyarrow.parquet as pq_

    from .. import datagen as dg

    t = pq_.read_table(dg.transcripts_path(sf_dir))
    out = "/tmp/kmeta_cache/rawlog_{}".format(
        hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    )
    shutil.rmtree(out, ignore_errors=True)
    write_container_logs(t, out)
    return read_container_logs(out)


def transcripts_rawlog_oracle_sql() -> str:
    from .. import datagen as dg

    return rf"""
WITH {dg.TRANSCRIPTS_CTE}
SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts_t
WHERE tool NOT LIKE '%/%' AND tool NOT LIKE '%\%'
  AND (regexp_matches(tool, '{CONTAINERS_TAG_RE}')
       OR regexp_matches(tool, '{PODS_TAG_RE}'))
""".strip()
