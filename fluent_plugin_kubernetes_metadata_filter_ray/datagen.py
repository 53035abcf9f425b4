"""Deterministic synthetic corpus: transcripts + metadata snapshot + DuckDB
oracle SQL twins.

The driver's testdata has no ``transcripts`` table, so we derive one
deterministically from ``events.parquet`` using only expressions that have
exact DuckDB twins (md5, lpad, modular arithmetic, string concat).  The Ray
pipeline consumes the Parquet written by :func:`transcripts_path`; the oracle
SQL in this module re-derives the same table (and the analytically expected
enrichment) inside DuckDB from the pre-registered ``events`` view.  If the
engine's regex parse / cached store lookups / routing disagree with the
reference semantics, the value-hash comparison fails.

Reference semantics being modeled (see SURVEY.md §2):
  - tag grammars: filter_kubernetes_metadata.rb:57-58
  - lookup_from_k8s_field: filter_kubernetes_metadata.rb:384-400
  - cache strategy incl. orphan / deleted-pod / recreated-namespace:
    kubernetes_metadata_cache_strategy.rb:24-102
  - pod/namespace projection: kubernetes_metadata_common.rb:40-110
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from . import constants as C

CACHE_ROOT = os.environ.get("KMETA_CACHE", "/tmp/kmeta_cache")

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


# ---------------------------------------------------------------------------
# Python-side derivation (the twin of TRANSCRIPTS_SQL below)
# ---------------------------------------------------------------------------

def _entity_grids():
    """Precompute md5-derived per-(ns_idx, pod_idx) strings as object arrays."""
    shape = (C.N_NS_TOTAL, C.N_POD_TOTAL)
    tagdid = np.empty(shape, dtype=object)
    uuid = np.empty(shape, dtype=object)
    for ni in range(C.N_NS_TOTAL):
        ns = C.ns_name(ni)
        for pi in range(C.N_POD_TOTAL):
            pod = C.pod_name(pi)
            tagdid[ni, pi] = C.tag_docker_id(ns, pod)
            uuid[ni, pi] = C.pod_uuid(ns, pod)
    return tagdid, uuid


def derive_transcripts(events_path: str, rep: int = 1, rep_range=None) -> pa.Table:
    """events.parquet → transcripts table (see FIXTURES.md §1).

    ``rep`` replicates each event ``rep`` times with fresh event ids
    (e' = e*rep + r) for benchmark-scale inputs; oracle checks use rep=1.
    ``rep_range=(r0, r1)`` derives only replicas r0 ≤ r < r1 — used by
    :func:`transcripts_path` to keep driver memory bounded at large rep.
    """
    ev = pq.read_table(events_path, columns=["event_id", "ts", "user_id", "event_type", "props"])
    df = ev.to_pandas().sort_values("event_id", kind="mergesort").reset_index(drop=True)

    if rep > 1:
        r0, r1 = rep_range if rep_range is not None else (0, rep)
        k = r1 - r0
        df = df.loc[df.index.repeat(k)].reset_index(drop=True)
        r = np.tile(np.arange(r0, r1, dtype=np.int64), len(df) // k)
        df["event_id"] = df["event_id"].to_numpy() * rep + r

    e = df["event_id"].to_numpy()
    u = df["user_id"].to_numpy()

    conv_id = "conv-" + df["user_id"].astype(str).str.zfill(6)
    turn_idx = df.groupby("user_id", sort=False).cumcount().astype("int32")
    role = df["event_type"].map(C.ROLE_MAP)

    ns_idx = (u % C.N_NS_TOTAL).astype(np.int64)
    pod_idx = (e % C.N_POD_TOTAL).astype(np.int64)
    tagdid, uuid = _entity_grids()
    did = pd.Series(tagdid[ns_idx, pod_idx], index=df.index)
    uid = pd.Series(uuid[ns_idx, pod_idx], index=df.index)
    ns_s = "ns-" + pd.Series(ns_idx, index=df.index).astype(str)
    pod_s = "pod-" + pd.Series(pod_idx, index=df.index).astype(str)

    tool_containers = "var.log.containers." + pod_s + "_" + ns_s + "_" + C.CONTAINER_NAME + "-" + did + ".log"
    tool_pods = "var.log.pods." + ns_s + "_" + pod_s + "_" + uid + "." + C.CONTAINER_NAME + ".0.log"
    tool = tool_pods.where(e % 2 != 0, tool_containers)
    tool = tool.mask(e % C.NONMATCH_MOD == C.NONMATCH_REM, "non-kubernetes")

    # lookup_from_k8s_field rows: JSON blob in text
    f_ns_idx = (e % (C.N_NS_WITH_PODS)).astype(np.int64)
    f_pod_idx = (e % C.N_POD_WITH_META).astype(np.int64)
    f_ns = "ns-" + pd.Series(f_ns_idx, index=df.index).astype(str)
    f_pod = "pod-" + pd.Series(f_pod_idx, index=df.index).astype(str)
    f_cid = pd.Series(tagdid[f_ns_idx, f_pod_idx], index=df.index)
    blob = (
        '{"kubernetes":{"namespace_name":"' + f_ns + '","pod_name":"' + f_pod
        + '","container_name":"' + C.CONTAINER_NAME + '"},"docker":{"container_id":"' + f_cid + '"}}'
    )
    text = ("turn-" + pd.Series(e, index=df.index).astype(str)
            + " type=" + df["event_type"] + " props=" + df["props"])
    text = text.mask(e % C.K8SFIELD_MOD == C.K8SFIELD_REM, blob)

    out = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": df["ts"],
        }
    )
    tbl = pa.Table.from_pandas(out, schema=TRANSCRIPT_SCHEMA, preserve_index=False)
    # drop the pandas metadata blob: Ray Data hashes schemas for dedup and a
    # dict-bearing schema defeats it (log spam + per-block schema reprocessing)
    return tbl.replace_schema_metadata(None)


SHARD_ROWS = 65536
MAX_SHARDS = 64


def transcripts_path(sf_dir: str, rep: int = 1, shard_rows: int | None = None) -> str:
    """Derive-and-cache the transcripts table for a given sf dir.  Written as
    a *directory of shard files* so readers parallelize the scan — a single
    file would serialize the read into one task (the real 10^12-turn table is
    thousands of files)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    sr = shard_rows or SHARD_ROWS
    suffix = f"_s{sr}" if shard_rows else ""
    out_dir = os.path.join(CACHE_ROOT, f"transcripts_{tag}_rep{rep}{suffix}")
    done = out_dir + ".done"  # marker outside the dir: readers glob *.parquet only
    if not os.path.exists(done):
        import shutil

        ev_path = os.path.join(sf_dir, "events.parquet")
        base_rows = pq.ParquetFile(ev_path).metadata.num_rows
        # bound driver memory: derive ≤ ~2M rows per chunk
        chunk_reps = max(1, min(rep, (2_000_000 + base_rows - 1) // base_rows))
        # derive into a scratch dir, then atomically swap it in: a
        # pre-existing out_dir (older cache layout, or a crashed derivation)
        # must never contribute stale *.parquet files that readers would
        # scan alongside the fresh shards (~2x duplicated rows)
        work_dir = out_dir + ".deriving"
        shutil.rmtree(work_dir, ignore_errors=True)
        os.makedirs(work_dir)
        total, fidx = 0, 0
        for r0 in range(0, rep, chunk_reps):
            r1 = min(rep, r0 + chunk_reps)
            tbl = derive_transcripts(ev_path, rep=rep, rep_range=(r0, r1))
            n_shards = max(1, (tbl.num_rows + sr - 1) // sr)
            per = (tbl.num_rows + n_shards - 1) // n_shards
            for i in range(n_shards):
                part = tbl.slice(i * per, per)
                if part.num_rows == 0:
                    continue
                pq.write_table(
                    part, os.path.join(work_dir, f"part-{fidx:05d}.parquet"),
                    row_group_size=sr,
                )
                fidx += 1
            total += tbl.num_rows
        shutil.rmtree(out_dir, ignore_errors=True)
        os.rename(work_dir, out_dir)
        with open(done, "w") as f:
            f.write(str(total))
    return out_dir


# ---------------------------------------------------------------------------
# Metadata snapshot tables (the "API server": FIXTURES.md §2-3)
# ---------------------------------------------------------------------------

PODS_SCHEMA = pa.schema(
    [
        ("namespace_name", pa.string()),
        ("pod_name", pa.string()),
        ("uid", pa.string()),
        ("creation_ts", pa.timestamp("us")),
        ("labels", pa.map_(pa.string(), pa.string())),
        ("annotations", pa.map_(pa.string(), pa.string())),
        ("node_name", pa.string()),
        ("pod_ip", pa.string()),
        ("owner_refs", pa.list_(pa.struct([("kind", pa.string()), ("name", pa.string())]))),
        (
            "container_statuses",
            pa.list_(
                pa.struct(
                    [
                        ("name", pa.string()),
                        ("image", pa.string()),
                        ("image_id", pa.string()),
                        ("container_id", pa.string()),
                    ]
                )
            ),
        ),
    ]
)

NAMESPACES_SCHEMA = pa.schema(
    [
        ("name", pa.string()),
        ("uid", pa.string()),
        ("creation_ts", pa.timestamp("us")),
        ("labels", pa.map_(pa.string(), pa.string())),
        ("annotations", pa.map_(pa.string(), pa.string())),
    ]
)


def build_pods_table() -> pa.Table:
    rows = []
    for ni in range(C.N_NS_WITH_PODS):
        ns = C.ns_name(ni)
        for pi in range(C.N_POD_WITH_META):
            pod = C.pod_name(pi)
            rows.append(
                {
                    "namespace_name": ns,
                    "pod_name": pod,
                    "uid": C.pod_id(ns, pod),
                    "creation_ts": pd.Timestamp(C.NS_CREATION_OLD),
                    "labels": [("app", pod), ("tier", "backend")],
                    "annotations": [("custom.field1", "cf-" + pod), ("other/ann", "x-" + pod)],
                    "node_name": f"node-{pi % 4}",
                    "pod_ip": f"10.0.{ni}.{pi}",
                    "owner_refs": (
                        [{"kind": "ReplicaSet", "name": pod + "-rs"}] if pi % 7 == 2 else []
                    ),
                    "container_statuses": [
                        {
                            "name": C.CONTAINER_NAME,
                            "image": C.container_image(pi),
                            "image_id": C.container_image_id(pod, pi),
                            # runtime prefix exercises the strip at common.rb:64
                            "container_id": (
                                "" if pi % 10 == C.EMPTY_CONTAINER_ID_REM
                                else "docker://" + C.store_container_id(ns, pod)
                            ),
                        }
                    ],
                }
            )
    return pa.Table.from_pylist(rows, schema=PODS_SCHEMA)


def build_namespaces_table() -> pa.Table:
    rows = []
    for ni in range(C.N_NS_WITH_META):
        ns = C.ns_name(ni)
        creation = C.NS_CREATION_RECREATED if ni == 6 else C.NS_CREATION_OLD
        rows.append(
            {
                "name": ns,
                "uid": C.namespace_id(ns),
                "creation_ts": pd.Timestamp(creation),
                "labels": [("tenant", "t-" + ns)],
                "annotations": [("workspaceId", "ws-" + ns), ("custom.ns", "cns-" + ns)],
            }
        )
    return pa.Table.from_pylist(rows, schema=NAMESPACES_SCHEMA)


def metadata_snapshot_dir() -> str:
    """Write-and-cache pods.parquet + namespaces.parquet; returns the dir."""
    out_dir = os.path.join(CACHE_ROOT, "meta_v1")
    pods = os.path.join(out_dir, "pods.parquet")
    nss = os.path.join(out_dir, "namespaces.parquet")
    if not (os.path.exists(pods) and os.path.exists(nss)):
        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(build_pods_table(), pods + ".tmp")
        os.replace(pods + ".tmp", pods)
        pq.write_table(build_namespaces_table(), nss + ".tmp")
        os.replace(nss + ".tmp", nss)
    return out_dir


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

def _sql_tagdid(ns_expr: str, pod_expr: str) -> str:
    return f"md5({ns_expr} || '/' || {pod_expr}) || md5({pod_expr} || '@' || {ns_expr})"


def _sql_uuid(ns_expr: str, pod_expr: str) -> str:
    return f"md5('uuid:' || {ns_expr} || '/' || {pod_expr})"


# transcripts derivation as a CTE over the pre-registered `events` view
TRANSCRIPTS_CTE = f"""
ev AS (
  SELECT event_id AS e, user_id AS u, event_type, props, ts FROM events
),
tns AS (
  SELECT *,
    'ns-' || (u % {C.N_NS_TOTAL}) AS t_ns,
    'pod-' || (e % {C.N_POD_TOTAL}) AS t_pod,
    'ns-' || (e % {C.N_NS_WITH_PODS}) AS f_ns,
    'pod-' || (e % {C.N_POD_WITH_META}) AS f_pod
  FROM ev
),
transcripts_t AS (
  SELECT
    'conv-' || lpad(CAST(u AS VARCHAR), 6, '0') AS conv_id,
    CAST(row_number() OVER (PARTITION BY u ORDER BY e) - 1 AS INTEGER) AS turn_idx,
    CASE event_type
      WHEN 'click' THEN 'user' WHEN 'view' THEN 'assistant'
      WHEN 'purchase' THEN 'tool' WHEN 'error' THEN 'tool'
      WHEN 'signup' THEN 'system' END AS role,
    CASE WHEN e % {C.K8SFIELD_MOD} = {C.K8SFIELD_REM} THEN
      '{{"kubernetes":{{"namespace_name":"' || f_ns || '","pod_name":"' || f_pod ||
      '","container_name":"{C.CONTAINER_NAME}"}},"docker":{{"container_id":"' ||
      {_sql_tagdid('f_ns', 'f_pod')} || '"}}}}'
    ELSE 'turn-' || e || ' type=' || event_type || ' props=' || props
    END AS text,
    CASE WHEN e % {C.NONMATCH_MOD} = {C.NONMATCH_REM} THEN 'non-kubernetes'
         WHEN e % 2 = 0 THEN
           'var.log.containers.' || t_pod || '_' || t_ns || '_{C.CONTAINER_NAME}-' ||
           {_sql_tagdid('t_ns', 't_pod')} || '.log'
         ELSE
           'var.log.pods.' || t_ns || '_' || t_pod || '_' ||
           {_sql_uuid('t_ns', 't_pod')} || '.{C.CONTAINER_NAME}.0.log'
    END AS tool,
    ts, e, u
  FROM tns
)
""".strip()


def transcripts_sql() -> str:
    return (
        "WITH " + TRANSCRIPTS_CTE
        + "\nSELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts_t"
    )


# classification CTE: the analytically-expected enrichment outcome per row
_NS_EXPR = "('ns-' || ns_i)"
_POD_EXPR = "('pod-' || pod_i)"
_TAGDID_EXPR = _sql_tagdid(_NS_EXPR, _POD_EXPR)
_UUID_EXPR = _sql_uuid(_NS_EXPR, _POD_EXPR)
_CLS_CTE = f"""
cls AS (
  SELECT conv_id, turn_idx, role, text, tool, ts, e, u,
    (e % {C.K8SFIELD_MOD} = {C.K8SFIELD_REM}) AS is_field,
    CASE WHEN e % {C.K8SFIELD_MOD} = {C.K8SFIELD_REM} THEN e % {C.N_NS_WITH_PODS}
         ELSE u % {C.N_NS_TOTAL} END AS ns_i,
    CASE WHEN e % {C.K8SFIELD_MOD} = {C.K8SFIELD_REM} THEN e % {C.N_POD_WITH_META}
         ELSE e % {C.N_POD_TOTAL} END AS pod_i,
    (e % {C.K8SFIELD_MOD} = {C.K8SFIELD_REM} OR e % {C.NONMATCH_MOD} <> {C.NONMATCH_REM}) AS matched
  FROM transcripts_t
),
cls2 AS (
  SELECT *,
    'ns-' || ns_i AS ns, 'pod-' || pod_i AS pod,
    (ns_i < {C.N_NS_WITH_PODS} AND pod_i < {C.N_POD_WITH_META}) AS pod_found,
    (ns_i < {C.N_NS_WITH_META}) AS ns_found,
    CASE WHEN ns_i = 6 THEN TIMESTAMP '{C.NS_CREATION_RECREATED}'
         ELSE TIMESTAMP '{C.NS_CREATION_OLD}' END AS ns_creation,
    -- docker_id as seen by get_metadata_for_record (nil for pods-form tags)
    CASE WHEN is_field OR e % 2 = 0 THEN {_TAGDID_EXPR}
         ELSE NULL END AS tag_did,
    CASE WHEN is_field OR e % 2 = 0 THEN {_TAGDID_EXPR}
         ELSE {_UUID_EXPR} END AS cache_key
  FROM cls
),
cls3 AS (
  SELECT *,
    CASE WHEN NOT matched THEN 'nomatch'
         WHEN pod_found THEN 'full'
         WHEN ns_found AND ns_creation <= ts THEN 'deleted_pod'
         WHEN ns_found THEN 'recreated_ns'
         ELSE 'orphan' END AS cls
  FROM cls2
)
""".strip()


ENRICH_COLUMNS = [
    "conv_id", "turn_idx", "role", "text", "tool", "ts",
    "container_id",
    "k8s_namespace_name", "k8s_namespace_id",
    "k8s_pod_name", "k8s_pod_id", "k8s_pod_ip", "k8s_host",
    "k8s_container_name", "k8s_container_image", "k8s_container_image_id",
    "k8s_master_url", "k8s_orphaned_namespace",
    "k8s_labels", "k8s_annotations", "k8s_namespace_labels", "k8s_namespace_annotations",
]


def enrich_oracle_sql(skip: bool = False, dedot: bool = False,
                      ownerrefs: bool = False) -> str:
    """Expected enrichment, default config (or the skip_labels +
    skip_container_metadata + skip_master_url variant, or the legacy de_dot
    key-mapping variant — annotation keys 'custom.field1'→'custom_field1' —
    or the include_ownerrefs_metadata variant: pods with pod_i % 7 == 2
    carry one ReplicaSet ownerReference, see build_pods_table)."""
    ann_sep = "_" if dedot else "."
    store_cid = "md5('cid:' || ns || '/' || pod) || md5('cid2:' || ns || '/' || pod)"
    if skip:
        # typed NULLs: a bare NULL column comes back float64/NaN from
        # DuckDB→pandas while the Ray side emits string nulls — same
        # values, different physical type on the driver's compare
        container_id = "CASE WHEN matched THEN tag_did END"
        image = "CAST(NULL AS VARCHAR)"
        image_id = "CAST(NULL AS VARCHAR)"
        labels = "CAST(NULL AS VARCHAR)"
        ns_labels = "CAST(NULL AS VARCHAR)"
        master_url = "CAST(NULL AS VARCHAR)"
    else:
        container_id = f"""CASE
          WHEN cls = 'full' AND pod_i % 10 <> {C.EMPTY_CONTAINER_ID_REM} THEN {store_cid}
          WHEN matched THEN tag_did END"""
        image = "CASE WHEN cls = 'full' THEN 'img/app:v' || (pod_i % 5) END"
        image_id = (
            f"CASE WHEN cls = 'full' AND pod_i % 10 <> {C.EMPTY_IMAGE_ID_REM} "
            "THEN 'sha256:' || md5('img:' || pod) END"
        )
        labels = (
            "CASE WHEN cls = 'full' THEN '{\"app\":\"' || pod || '\",\"tier\":\"backend\"}' END"
        )
        ns_labels = (
            "CASE WHEN cls IN ('full','deleted_pod','recreated_ns') "
            "THEN '{\"tenant\":\"t-' || ns || '\"}' END"
        )
        master_url = f"CASE WHEN cls = 'full' THEN '{C.MASTER_URL}' END"

    owner_col = ""
    if ownerrefs:
        owner_col = (
            ",\n  CASE WHEN cls = 'full' AND pod_i % 7 = 2 THEN"
            " '[{\"kind\":\"ReplicaSet\",\"name\":\"' || pod || '-rs\"}]'"
            " END AS k8s_ownerrefs"
        )

    return f"""
WITH {TRANSCRIPTS_CTE},
{_CLS_CTE}
SELECT
  conv_id, turn_idx, role, text, tool, ts,
  {container_id} AS container_id,
  CASE WHEN NOT matched THEN NULL
       WHEN cls = 'orphan' THEN '{C.ORPHANED_NAMESPACE_NAME}'
       ELSE ns END AS k8s_namespace_name,
  CASE WHEN cls = 'orphan' THEN '{C.ORPHANED_NAMESPACE_ID}'
       WHEN cls IN ('full','deleted_pod','recreated_ns') THEN md5('nsid:' || ns)
       END AS k8s_namespace_id,
  CASE WHEN matched THEN pod END AS k8s_pod_name,
  CASE WHEN cls = 'full' THEN md5('podid:' || ns || '/' || pod)
       WHEN cls = 'deleted_pod' THEN cache_key END AS k8s_pod_id,
  CASE WHEN cls = 'full' THEN '10.0.' || ns_i || '.' || pod_i END AS k8s_pod_ip,
  CASE WHEN cls = 'full' THEN 'node-' || (pod_i % 4) END AS k8s_host,
  CASE WHEN matched THEN '{C.CONTAINER_NAME}' END AS k8s_container_name,
  {image} AS k8s_container_image,
  {image_id} AS k8s_container_image_id,
  {master_url} AS k8s_master_url,
  CASE WHEN cls = 'orphan' THEN ns END AS k8s_orphaned_namespace,
  {labels} AS k8s_labels,
  CASE WHEN cls = 'full' THEN '{{"custom{ann_sep}field1":"cf-' || pod || '"}}' END AS k8s_annotations,
  {ns_labels} AS k8s_namespace_labels,
  CASE WHEN cls IN ('full','deleted_pod','recreated_ns')
       THEN '{{"custom{ann_sep}ns":"cns-' || ns || '"}}' END AS k8s_namespace_annotations{owner_col}
FROM cls3
""".strip()


PARSE_COLUMNS = [
    "conv_id", "turn_idx", "namespace", "pod_name", "container_name",
    "docker_id", "pod_uuid", "cache_key", "is_k8s_field", "matched",
]

# the reference tag grammars (filter_kubernetes_metadata.rb:57-58), RE2-safe
RE_CONTAINERS = (
    r"^var\.log\.containers\."
    r"(?P<pod_name>[a-z0-9](?:[-a-z0-9]*[a-z0-9])?(?:\.[a-z0-9](?:[-a-z0-9]*[a-z0-9])?)*)"
    r"_(?P<namespace>[^_]+)_(?P<container_name>.+)-(?P<docker_id>[a-z0-9]{64})\.log$"
)
RE_PODS = (
    r"^var\.log\.pods\.(?P<namespace>[^_]+)"
    r"_(?P<pod_name>[a-z0-9](?:[-a-z0-9]*[a-z0-9])?(?:\.[a-z0-9](?:[-a-z0-9]*[a-z0-9])?)*)"
    r"_(?P<pod_uuid>[a-z0-9-]*)\.(?P<container_name>.+)\..*\.log$"
)


def parse_oracle_sql() -> str:
    """Expected parse output via DuckDB's own regex engine + JSON extraction —
    an independent check of the pc.extract_regex parse stage."""
    return f"""
WITH {TRANSCRIPTS_CTE},
rx AS (
  SELECT conv_id, turn_idx, text, tool, ts,
    regexp_extract(tool, '{RE_CONTAINERS}',
      ['pod_name','namespace','container_name','docker_id']) AS mc,
    regexp_extract(tool, '{RE_PODS}',
      ['namespace','pod_name','pod_uuid','container_name']) AS mp,
    starts_with(text, '{{"kubernetes"') AS is_field
  FROM transcripts_t
),
px AS (
  SELECT conv_id, turn_idx, ts, is_field,
    CASE WHEN is_field THEN json_extract_string(text, '$.kubernetes.namespace_name')
         WHEN mc.docker_id <> '' THEN mc.namespace
         WHEN mp.pod_uuid <> '' THEN mp.namespace END AS namespace,
    CASE WHEN is_field THEN json_extract_string(text, '$.kubernetes.pod_name')
         WHEN mc.docker_id <> '' THEN mc.pod_name
         WHEN mp.pod_uuid <> '' THEN mp.pod_name END AS pod_name,
    CASE WHEN is_field THEN json_extract_string(text, '$.kubernetes.container_name')
         WHEN mc.docker_id <> '' THEN mc.container_name
         WHEN mp.pod_uuid <> '' THEN mp.container_name END AS container_name,
    CASE WHEN is_field THEN json_extract_string(text, '$.docker.container_id')
         WHEN mc.docker_id <> '' THEN mc.docker_id END AS docker_id,
    CASE WHEN NOT is_field AND mc.docker_id = '' AND mp.pod_uuid <> ''
         THEN mp.pod_uuid END AS pod_uuid
  FROM rx
)
SELECT conv_id, turn_idx, namespace, pod_name, container_name, docker_id, pod_uuid,
  coalesce(CASE WHEN is_field THEN docker_id END, pod_uuid, docker_id) AS cache_key,
  CAST(is_field AS INTEGER) AS is_k8s_field,
  CAST((namespace IS NOT NULL) AS INTEGER) AS matched
FROM px
""".strip()
