"""Fan-out routing to per-role Parquet sinks (S3 in SURVEY.md §2.1).

The reference's downstream ``<match **>`` fan-out becomes a single-scan
partitioned Parquet write: one directory per ``role`` value, so each sink is
an independently readable row set (routed-row equality per sink).  Low
cardinality (4 roles) → the hash exchange is cheap; rows are not reordered.
"""

from __future__ import annotations

import os
import shutil

import numpy as np


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


# marker dropped by the manual fan-out fallback: its role dirs are
# percent-ENCODED (_role_dir_name), unlike write_parquet's raw hive values,
# so read_sink must decode them back (ADVICE r3: 'a/b' came back 'a%2Fb'
# and the NULL sentinel came back as the literal '%00' on that path).
_ENCODED_MARKER = "_KMETA_ENCODED_ROLES"


def read_sink(out_dir: str, columns):
    """Column-pruned read-back of a routed sink with block count matched to
    the actual file count: Ray's default parallelism over-splits a small
    sink into empty ghost blocks, and every empty block entering a
    downstream sort/aggregate triggers a schema-less-RefBundle warning and
    a wasted task.  Sinks written by the manual fallback (marker file)
    get their hive role values percent-decoded like read_jsonl_sink."""
    import pyarrow as pa
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
    ds = ray.data.read_parquet(
        out_dir, columns=list(columns), override_num_blocks=blocks
    )
    if "role" in columns and os.path.exists(os.path.join(out_dir, _ENCODED_MARKER)):
        def decode(t: pa.Table) -> pa.Table:
            raw = t.column("role").to_pylist()
            dec = pa.array([_role_from_dir(r) for r in raw], pa.string())
            return t.set_column(t.column_names.index("role"), "role", dec)

        ds = ds.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)
    return ds


# dir name for the NULL-role sink in manual fan-outs.  Contains a literal
# '%', which _role_dir_name's quote() always escapes ('%' → '%25') — so no
# real role value, however adversarial, can ever encode to this sentinel.
NULL_ROLE_DIR = "%00"


def _role_dir_name(role) -> str:
    """Role value → safe sink dir component.  Roles come from DATA (the
    fan-out writes one sink per distinct value), so '/', '=', '%' etc.
    must never reach the filesystem raw — percent-encode everything
    (Ray's hive partitioning does NOT url-decode, verified on 2.49, so
    read_jsonl_sink decodes symmetrically)."""
    import urllib.parse

    return NULL_ROLE_DIR if role is None else urllib.parse.quote(role, safe="")


def _role_from_dir(name):
    import urllib.parse

    return None if name == NULL_ROLE_DIR else urllib.parse.unquote(name)


def _write_role_sinks(ds, out_dir: str, roles, write_fn) -> str:
    """Shared manual fan-out: one filtered pass per role value (NULL role
    included — a row must never vanish from every sink), each handed to
    ``write_fn(sub_dataset, sink_path)``.  Callers pass a MATERIALIZED
    dataset: a lazy Dataset re-executes per consumption, so filtering an
    unmaterialized input once per sink would re-run the upstream per-row
    parse/enrich kernels role-count times."""
    import pyarrow.compute as pc

    for role in roles:
        if role is None:
            flt = lambda t: t.filter(pc.is_null(t.column("role")))  # noqa: E731
        else:
            # Table.filter drops null-mask rows, which is exactly right
            # here: null-role rows belong to the None sink above
            flt = lambda t, r=role: t.filter(pc.equal(t.column("role"), r))  # noqa: E731
        # the partition DIR carries the role (exactly like write_parquet's
        # partition_cols); keeping it in-file too breaks hive read-back of
        # the NULL sink (Arrow infers null type, can't cast the dir string)
        sub = ds.map_batches(
            lambda t, f=flt: f(t).drop_columns(["role"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        write_fn(sub, os.path.join(out_dir, f"role={_role_dir_name(role)}"))
    return out_dir


def _route_write_into(enriched_ds, out_dir: str):
    try:
        enriched_ds.write_parquet(out_dir, partition_cols=["role"])
    except TypeError:
        # older Ray without partition_cols: K filtered passes over a
        # materialized scan (fallback only; unreached on Ray 2.49)
        m = enriched_ds.materialize()
        # unique() returns None (not []) on an empty stream — verified 2.49
        roles = sorted(m.unique("role") or [], key=lambda v: (v is None, v))
        _write_role_sinks(m, out_dir, roles, lambda ds, p: ds.write_parquet(p))
        # mark the encoded-dir layout so read_sink decodes symmetrically
        with open(os.path.join(out_dir, _ENCODED_MARKER), "w"):
            pass
    return out_dir


# Per-role filtered passes are linear in DISTINCT roles (fine for the
# reference's 4-ish routing keys, quadratic-ish if a deployment routes by a
# high-cardinality key).  Past this threshold the sink switches to ONE
# hash-bucketed pass (VERDICT r3 task 7).
JSONL_FANOUT_MAX_ROLES = 64
JSONL_N_BUCKETS = 64
_BUCKETED_MARKER = "_KMETA_BUCKETED_ROLES"


def _role_bucket(role) -> int:
    """Stable role → bucket id (md5, not Python hash(): deterministic
    across processes/runs so a role's rows always land in one dir)."""
    import hashlib

    if role is None or not isinstance(role, str):  # null / NaN → bucket 0
        return 0
    return int.from_bytes(
        hashlib.md5(role.encode("utf-8")).digest()[:4], "big"
    ) % JSONL_N_BUCKETS


def _write_bucketed_jsonl(ds, out_dir: str) -> str:
    """Single-pass fan-out for high-cardinality role sets: each batch
    groups its rows by role-hash bucket and appends one uniquely-named
    JSONL part per bucket (role stays IN-FILE — lossless, no dir
    encoding).  One role's rows all live under one ``bucket-NNN/`` dir, so
    reading a single sink is that dir + an in-file role filter; total
    passes over the data: exactly one, independent of role count.

    Part names are CONTENT-ADDRESSED (md5 of the serialized payload), so a
    Ray task retry that re-writes its batch overwrites the same file
    instead of duplicating rows — the idempotence Ray's own datasink commit
    protocol provides, without needing one.  (Two distinct batches cannot
    share a payload hash for transcript data: (conv_id, turn_idx) makes
    rows unique.)  Writes land in a temp name + atomic rename so a
    mid-write crash never leaves a torn part."""
    import hashlib

    import pyarrow as pa

    def write_batch(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64())})
        import pandas as pd

        df = t.to_pandas()
        # hash once per DISTINCT role, not per row: factorize then gather
        # (3392b96 pattern); factorize maps nulls to code -1 → bucket 0,
        # matching _role_bucket's null branch
        codes, uniq = pd.factorize(df["role"], sort=False)
        if len(uniq) == 0:  # all-null batch: every row → bucket 0
            buckets = np.zeros(len(df), dtype=np.int64)
        else:
            per_distinct = np.fromiter(
                (_role_bucket(r) for r in uniq), dtype=np.int64, count=len(uniq)
            )
            buckets = np.where(
                codes < 0, 0, per_distinct[np.clip(codes, 0, None)]
            )
        out_rows = []
        for b, sub in df.groupby(buckets, sort=False):
            d = os.path.join(out_dir, f"bucket-{int(b):03d}")
            os.makedirs(d, exist_ok=True)
            # same serialization Ray's write_json uses (pandas to_json,
            # records/lines) so both sink layouts round-trip identically
            payload = sub.to_json(orient="records", lines=True)
            digest = hashlib.md5(payload.encode("utf-8")).hexdigest()
            p = os.path.join(d, f"part-{digest}.json")
            tmp = p + ".tmp"
            with open(tmp, "w") as f:
                f.write(payload)
            os.replace(tmp, p)
            out_rows.append((int(b), len(sub)))
        bs, ns = zip(*out_rows)
        return pa.table({"bucket": pa.array(bs, pa.int32()),
                         "n": pa.array(ns, pa.int64())})

    # consuming the tiny (bucket, n) summary drives the single pass
    ds.map_batches(write_batch, batch_format="pyarrow", zero_copy_batch=True).count()
    with open(os.path.join(out_dir, _BUCKETED_MARKER), "w"):
        pass
    return out_dir


def route_write_jsonl(enriched_ds, out_dir: str):
    """JSONL sink twin of :func:`route_write` — the reference's fan-out
    targets arbitrary fluentd outputs (files, forward, http), most of which
    speak line-delimited JSON; this closes the source/sink symmetry with
    sources/jsonl.py.  Same per-role layout (role=<v>/*.json, one JSON
    object per line) and the same clear-before-write idempotence contract
    the checkpoint layer relies on.

    ``write_json`` has no partition_cols (Ray 2.49), so the low-cardinality
    fan-out is one filtered pass per DISTINCT role (computed from the data,
    so unmapped or NULL roles land in their own sink rather than silently
    vanishing) over a MATERIALIZED decode — the upstream parse/enrich
    kernels run once, not once per sink.  Past JSONL_FANOUT_MAX_ROLES
    distinct roles the sink switches to the hash-bucketed SINGLE pass
    (``bucket-NNN/`` subdirs, role in-file) so pass count never scales with
    role cardinality.  Dictionary-encoded enrich columns are decoded first
    (JSON has no dictionary type)."""
    from .enrich import decode_stage

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    decoded = decode_stage(enriched_ds).materialize()
    # unique() returns None (not []) on an empty stream — verified 2.49
    roles = sorted(decoded.unique("role") or [], key=lambda v: (v is None, v))
    if len(roles) > JSONL_FANOUT_MAX_ROLES:
        return _write_bucketed_jsonl(decoded, out_dir)
    return _write_role_sinks(
        decoded, out_dir, roles, lambda ds, p: ds.write_json(p)
    )


def read_jsonl_sink(out_dir: str, columns):
    """Read-back of a JSONL sink.  Hive layout (role=<enc> dirs): the role
    partition value is decoded back from its dir encoding (percent-decode;
    the NULL sentinel → SQL null).  Bucketed layout (marker file,
    bucket-NNN dirs): the role column is in-file and already lossless."""
    import pyarrow as pa
    import ray.data
    from ray.data.datasource.partitioning import Partitioning

    if os.path.exists(os.path.join(out_dir, _BUCKETED_MARKER)):
        files = [
            os.path.join(r, f)
            for r, _, fs in os.walk(out_dir)
            for f in fs
            if f.endswith(".json")
        ]
        return ray.data.read_json(files).select_columns(list(columns))

    ds = ray.data.read_json(out_dir, partitioning=Partitioning("hive"))
    ds = ds.select_columns(list(columns))
    if "role" in columns:
        def decode(t: pa.Table) -> pa.Table:
            raw = t.column("role").to_pylist()
            dec = pa.array([_role_from_dir(r) for r in raw], pa.string())
            return t.set_column(t.column_names.index("role"), "role", dec)

        ds = ds.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)
    return ds
