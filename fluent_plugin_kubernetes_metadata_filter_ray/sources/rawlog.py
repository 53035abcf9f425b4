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


def _docker_to_transcript(t: pa.Table, tool: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Docker json-file rows + a per-row tool (tag) array → the canonical
    transcript schema.  Bare docker lines carry only log/stream/time — any
    merged record key (conv_id, turn_idx, role) is OPTIONAL and nulls when
    absent, like a fluentd record with no such field."""
    from .. import datagen as dg

    def col(name, typ):
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
    out = pa.table(
        {
            "conv_id": col("conv_id", pa.string()),
            "turn_idx": col("turn_idx", pa.int32()),
            "role": col("role", pa.string()),
            "text": col("log", pa.string()),
            "tool": tool,
            "ts": ts,
        }
    )
    assert out.schema.equals(dg.TRANSCRIPT_SCHEMA), out.schema
    return out


def read_container_logs(log_dir: str):
    """Tail-source reader: docker-format ``.log`` files → canonical
    transcript schema, with the kube TAG reconstructed from each row's file
    path (relative path, '/' → '.') — in_tail semantics, covering both the
    containers and pods path grammars."""
    import ray.data

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
        return _docker_to_transcript(t, tool)

    return ds.map_batches(normalize, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# pos_file resume: fluentd in_tail's exactly-once tail contract
# (README.md:80-102 — every benchmark config sets `pos_file`; a restarted
# collector must not re-emit lines it already shipped).  The Ray analog is
# a manifest of (relative path → bytes, lines) written ATOMICALLY after a
# run is consumed: the next ingest SKIPS files whose size is unchanged
# (never opened, let alone read) and, for grown files, re-reads inside one
# task and slices off the first `lines` rows — each log line enters the
# pipeline exactly once across any number of runs.  The manifest is
# O(files) driver state, the same bound as in_tail's own pos_file.
# ---------------------------------------------------------------------------


def _load_pos(pos_path: str) -> dict:
    import json

    if not os.path.exists(pos_path):
        return {}
    with open(pos_path) as f:
        return json.load(f)


def _list_logs(log_dir: str) -> list[str]:
    out = []
    for base, _dirs, names in os.walk(log_dir):
        out.extend(os.path.join(base, n) for n in names if n.endswith(".log"))
    return sorted(out)


def _read_log_file(path: str) -> pa.Table:
    """Whole-file docker-json read INSIDE a task (pyarrow's JSON reader
    preserves line order, which the line-offset slice relies on)."""
    from pyarrow import json as pajson

    return pajson.read_json(path)


def ingest_container_logs(log_dir: str, pos_path: str):
    """New-lines-only tail ingest: files with an unchanged recorded size
    are skipped without being opened; changed/new files are read whole in
    one task each and sliced past their recorded line count.  Returns the
    normalized transcript Dataset of ONLY the unseen lines; call
    :func:`commit_pos` after consuming it."""
    import ray.data as rd

    from .. import datagen as dg

    root = os.path.abspath(log_dir)
    pos = _load_pos(pos_path)
    todo, skips = [], []
    for p in _list_logs(log_dir):
        rel = os.path.relpath(p, root)
        ent = pos.get(rel)
        if ent is not None and ent["bytes"] == os.path.getsize(p):
            continue  # unchanged: never opened
        todo.append(p)
        skips.append(0 if ent is None else int(ent["lines"]))
    if not todo:
        empty = pa.table(
            {f.name: pa.array([], f.type) for f in dg.TRANSCRIPT_SCHEMA}
        )
        return rd.from_arrow(empty)

    def run(b: pa.Table) -> pa.Table:
        from .. import datagen as dg_

        paths = b.column("path").to_pylist() if b.num_columns else []
        skip = b.column("skip").to_pylist() if b.num_columns else []
        outs = []
        for p, s in zip(paths, skip):
            t = _read_log_file(p).slice(s)
            tag = os.path.relpath(p, root).replace(os.sep, ".")
            outs.append(
                _docker_to_transcript(t, pa.array([tag] * len(t), pa.string()))
            )
        if outs:
            return pa.concat_tables(outs)
        return pa.table(
            {f.name: pa.array([], f.type) for f in dg_.TRANSCRIPT_SCHEMA}
        )

    paths_t = pa.table(
        {
            "path": pa.array(todo, pa.string()),
            "skip": pa.array(skips, pa.int64()),
        }
    )
    return (
        rd.from_arrow(paths_t)
        .repartition(len(todo))
        .map_batches(run, batch_format="pyarrow", batch_size=None)
    )


def commit_pos(log_dir: str, pos_path: str) -> dict:
    """Record every current log file's (bytes, lines) — the state the NEXT
    ingest resumes from.  Line counts run distributed (one task per
    changed file; unchanged files keep their recorded count); the manifest
    write is atomic (tmp + rename), like in_tail's pos_file updates."""
    import json

    import ray.data as rd

    root = os.path.abspath(log_dir)
    old = _load_pos(pos_path)
    entries: dict = {}
    count_paths = []
    for p in _list_logs(log_dir):
        rel = os.path.relpath(p, root)
        size = os.path.getsize(p)
        ent = old.get(rel)
        if ent is not None and ent["bytes"] == size:
            entries[rel] = ent
        else:
            count_paths.append((rel, p, size))
    if count_paths:
        def run(b: pa.Table) -> pa.Table:
            paths = b.column("path").to_pylist() if b.num_columns else []
            return pa.table(
                {
                    "path": pa.array(paths, pa.string()),
                    "lines": pa.array(
                        [len(_read_log_file(p)) for p in paths], pa.int64()
                    ),
                }
            )

        paths_t = pa.table(
            {"path": pa.array([p for _, p, _ in count_paths], pa.string())}
        )
        counted = (
            rd.from_arrow(paths_t)
            .repartition(len(count_paths))
            .map_batches(run, batch_format="pyarrow", batch_size=None)
            .to_pandas()
        )
        lines_of = dict(zip(counted["path"], counted["lines"]))
        for rel, p, size in count_paths:
            entries[rel] = {"bytes": size, "lines": int(lines_of[p])}
    tmp = pos_path + ".tmp"
    os.makedirs(os.path.dirname(pos_path) or ".", exist_ok=True)
    with open(tmp, "w") as f:
        json.dump(entries, f)
    os.replace(tmp, pos_path)
    return entries


def q_transcripts_rawlog_resume(sf_dir: str):
    """Driver-gated witness for the pos_file contract: run 1 ingests half
    the log files and commits the pos manifest; run 2 ingests the full
    directory resuming from it (run-1 files are size-unchanged → skipped).
    run1 ∪ run2 must equal the full tail read — the same oracle as
    q_transcripts_rawlog."""
    import hashlib
    import shutil

    import pyarrow.parquet as pq_

    from .. import datagen as dg

    t = pq_.read_table(dg.transcripts_path(sf_dir))
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out = f"/tmp/kmeta_cache/rawlog_pos_{key}"
    shutil.rmtree(out, ignore_errors=True)
    pos_path = os.path.join(out, "pos.json")
    log_dir = os.path.join(out, "logs")
    # run 1: the lexicographically first half of the tag universe
    tools = sorted({
        v for v in t.column("tool").to_pylist()
        if _tag_to_relpath(v) is not None
    })
    half = set(tools[: len(tools) // 2])
    import pyarrow.compute as pc_

    mask = pc_.is_in(t.column("tool"), value_set=pa.array(sorted(half), pa.string()))
    write_container_logs(t.filter(mask), log_dir)
    run1 = ingest_container_logs(log_dir, pos_path).materialize()
    commit_pos(log_dir, pos_path)
    # run 2: the remaining files appear; run-1 files are unchanged
    write_container_logs(t.filter(pc_.invert(mask)), log_dir)
    run2 = ingest_container_logs(log_dir, pos_path)
    return run1.union(run2)


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
