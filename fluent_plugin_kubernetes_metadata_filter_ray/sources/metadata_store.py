"""Metadata stores — the batch-engine analog of the K8s API server.

The reference fetches pod / namespace objects over HTTPS on cache miss
(filter_kubernetes_metadata.rb:101-129,146-171) and projects them with
``parse_pod_metadata`` / ``parse_namespace_metadata``
(kubernetes_metadata_common.rb:40-110).  Here the authoritative store is an
immutable *versioned snapshot*: two small Parquet tables (pods, namespaces)
projected ONCE at load into plain dicts — the projection (labels /
annotation-match / skip-flags / containerID prefix strip) runs over the tiny
side table, never per event row.

Scale note: the snapshot is small-side data.  It is broadcast — either via
``ray.put`` of the projected dicts (preferred on a cluster: one object-store
copy per node) or re-read from Parquet in each actor's ``__init__``.  Never
shuffled against the event stream.

The ``test_api_adapter`` seam (filter_kubernetes_metadata.rb:90-92,271-280)
maps to the pluggable store classes below: Table-backed (real), Empty
(API-unreachable → orphan tests), Failing (socket-error → orphan tests,
test_filter_kubernetes_metadata.rb:266-298).
"""

from __future__ import annotations

import json
import os
import re

import pyarrow.parquet as pq


def _canonical_json(d: dict) -> str | None:
    """Sorted-key, no-space JSON; None for empty (Ruby drops empty-label keys,
    kubernetes_metadata_common.rb:49-50,106-108)."""
    if not d:
        return None
    return json.dumps(d, separators=(",", ":"), sort_keys=True)


_RUNTIME_PREFIX = re.compile(r"^[-_a-zA-Z0-9]+://")


def _de_dot(d: dict, cfg) -> dict:
    """Legacy de_dot key mapping (deprecated in the reference 3.x,
    release_notes.md:4): '.' in label/annotation keys → cfg.de_dot_separator.
    Applied AFTER annotation_match (which sees the original keys)."""
    if not cfg.de_dot or not d:
        return d
    return {k.replace(".", cfg.de_dot_separator): v for k, v in d.items()}


def project_pod(row: dict, cfg) -> dict:
    """Pod snapshot row → flat metadata dict (parse_pod_metadata twin,
    kubernetes_metadata_common.rb:54-110)."""
    labels = dict(row.get("labels") or {})
    annotations = dict(row.get("annotations") or {})
    matched_ann = _match_annotations(annotations, cfg.annotation_match)

    containers = {}
    for cs in row.get("container_statuses") or []:
        cid = _RUNTIME_PREFIX.sub("", cs.get("container_id") or "")
        if cfg.skip_container_metadata:
            containers[cs["name"]] = {"name": cs["name"]}
        else:
            containers[cs["name"]] = {
                "name": cs["name"],
                "image": cs.get("image"),
                "image_id": cs.get("image_id"),
                "containerID": cid,
            }

    meta = {
        "namespace_name": row["namespace_name"],
        "pod_id": row["uid"],
        "pod_name": row["pod_name"],
        "pod_ip": row.get("pod_ip"),
        "containers": containers,
        "host": row.get("node_name"),
    }
    if cfg.include_ownerrefs_metadata:
        meta["ownerrefs_json"] = _canonical_json_list(
            [{"kind": o["kind"], "name": o["name"]} for o in row.get("owner_refs") or []]
        )
    if not (cfg.skip_labels or cfg.skip_pod_labels):
        meta["labels_json"] = _canonical_json(_de_dot(labels, cfg))
    meta["annotations_json"] = _canonical_json(_de_dot(matched_ann, cfg))
    if not cfg.skip_master_url:
        meta["master_url"] = cfg.kubernetes_url
    return {k: v for k, v in meta.items() if v is not None}


def project_namespace(row: dict, cfg) -> dict:
    """Namespace snapshot row → metadata dict (parse_namespace_metadata twin,
    kubernetes_metadata_common.rb:40-52).  ``creation_timestamp`` is kept for
    the age comparison and stripped from output by the enricher
    (kubernetes_metadata_cache_strategy.rb:99-100)."""
    annotations = _match_annotations(dict(row.get("annotations") or {}), cfg.annotation_match)
    meta = {
        "namespace_id": row["uid"],
        "creation_timestamp": row["creation_ts"],
    }
    if not (cfg.skip_labels or cfg.skip_namespace_labels):
        meta["namespace_labels_json"] = _canonical_json(_de_dot(dict(row.get("labels") or {}), cfg))
    meta["namespace_annotations_json"] = _canonical_json(_de_dot(annotations, cfg))
    return {k: v for k, v in meta.items() if v is not None}


def _match_annotations(annotations: dict, patterns) -> dict:
    """match_annotations twin (kubernetes_metadata_common.rb:30-38)."""
    if not patterns:
        return {}
    compiled = [re.compile(p) for p in patterns]
    return {k: v for k, v in annotations.items() if any(r.search(k) for r in compiled)}


def _canonical_json_list(lst: list) -> str | None:
    if not lst:
        return None
    return json.dumps(lst, separators=(",", ":"), sort_keys=True)


class MetadataStore:
    """Interface: point reads by key; raise → treated like an API error
    (degrades to orphan, never blocks the pipeline)."""

    version: str = "v0"

    def get_pod(self, namespace: str, pod: str) -> dict | None:
        raise NotImplementedError

    def get_namespace(self, namespace: str) -> dict | None:
        raise NotImplementedError


class ResourceVersionGone(Exception):
    """The 410 Gone analog (kubernetes_metadata_watch_pods.rb:133-134,
    187-196): a consumer asked for the diff stream since a resourceVersion
    the journal no longer retains — it must restart from a full LIST
    (reload + cache flush) instead of replaying events."""


# how many reload_diff generations the watch journal retains; a consumer
# further behind than this gets ResourceVersionGone (the 410 ladder)
WATCH_JOURNAL_RETAIN = 8


class TableMetadataStore(MetadataStore):
    """Snapshot-backed store: loads + projects the two Parquet side tables
    once (S4-S7 in SURVEY.md §2.1; watch semantics become snapshot versions,
    §2.8).  ``changed()`` / ``reload()`` support mtime-based refresh polling
    for long-running jobs (the batch analog of the watch threads' MODIFIED
    handling, kubernetes_metadata_watch_pods.rb:160-204)."""

    def __init__(self, snapshot_dir: str, cfg, version: str | None = None):
        self.snapshot_dir = snapshot_dir
        self.cfg = cfg
        self._version_override = version
        # watch-journal twin of @last_seen_resource_version
        # (watch_pods.rb:162-166): resource_version advances per observed
        # snapshot generation; _journal retains the last
        # WATCH_JOURNAL_RETAIN (base_rv, new_rv, pod_diff, ns_diff) entries
        # so lagging consumers replay diffs instead of re-LISTing.
        self._journal: list[tuple[int, int, dict, dict]] = []
        self._load()
        self.resource_version = max(self._mtimes)

    def _paths(self):
        return (
            os.path.join(self.snapshot_dir, "pods.parquet"),
            os.path.join(self.snapshot_dir, "namespaces.parquet"),
        )

    def _stat(self):
        return tuple(os.stat(p).st_mtime_ns for p in self._paths())

    def _load(self):
        pods_p, nss_p = self._paths()
        self._mtimes = self._stat()
        pods = pq.read_table(pods_p).to_pylist()
        nss = pq.read_table(nss_p).to_pylist()
        cfg = self.cfg
        self._pods = {(r["namespace_name"], r["pod_name"]): project_pod(r, cfg) for r in pods}
        self._namespaces = {r["name"]: project_namespace(r, cfg) for r in nss}
        base = os.path.basename(os.path.normpath(self.snapshot_dir))
        self.version = self._version_override or f"{base}@{max(self._mtimes)}"

    def changed(self) -> bool:
        try:
            return self._stat() != self._mtimes
        except OSError:
            return False

    def reload(self) -> None:
        self._load()

    def reload_diff(self) -> tuple[dict, dict]:
        """Reload and return the per-key snapshot diff — the batch analog of
        the watch threads' per-event granularity
        (kubernetes_metadata_watch_pods.rb:160-204: MODIFIED updates ONE
        cache entry, DELETED removes one).  Returns
        ``(pod_diff, ns_diff)`` where each maps a store key to
        ``(old_meta | None, new_meta | None)`` — (old, new) for modified,
        (None, new) for added, (old, None) for deleted keys.  The caller
        applies targeted cache upserts instead of a full flush."""
        old_pods, old_nss = self._pods, self._namespaces
        base_rv = self.resource_version
        self._load()
        self.resource_version = max(self._mtimes)

        def diff(old: dict, new: dict) -> dict:
            d = {}
            for k, v in new.items():
                ov = old.get(k)
                if ov != v:
                    d[k] = (ov, v)
            for k in old.keys() - new.keys():
                d[k] = (old[k], None)
            return d

        pod_diff = diff(old_pods, self._pods)
        ns_diff = diff(old_nss, self._namespaces)
        self._journal.append((base_rv, self.resource_version, pod_diff, ns_diff))
        del self._journal[:-WATCH_JOURNAL_RETAIN]
        return pod_diff, ns_diff

    def events_since(self, rv: int) -> tuple[dict, dict, int]:
        """Replay the retained diff journal from resourceVersion ``rv``:
        returns (pod_diff, ns_diff, current_rv) with per-key diffs COALESCED
        across generations (old side from the first entry touching a key,
        new side from the last — exactly what a consumer that missed
        intermediate events needs).  Raises :class:`ResourceVersionGone`
        when ``rv`` predates the retained window — the 410 signal telling
        the consumer to restart from a full LIST."""
        if rv == self.resource_version:
            return {}, {}, rv
        pod_acc: dict = {}
        ns_acc: dict = {}
        found_base = False
        for base_rv, new_rv, pod_diff, ns_diff in self._journal:
            if not found_base:
                if base_rv != rv:
                    continue
                found_base = True
            for acc, d in ((pod_acc, pod_diff), (ns_acc, ns_diff)):
                for k, (old, new) in d.items():
                    acc[k] = (acc[k][0] if k in acc else old, new)
        if not found_base:
            raise ResourceVersionGone(
                f"resourceVersion {rv} predates the retained journal "
                f"(oldest base: {self._journal[0][0] if self._journal else None})"
            )
        # drop keys that round-tripped back to their original value
        pod_acc = {k: v for k, v in pod_acc.items() if v[0] != v[1]}
        ns_acc = {k: v for k, v in ns_acc.items() if v[0] != v[1]}
        return pod_acc, ns_acc, self.resource_version

    def get_pod(self, namespace: str, pod: str) -> dict | None:
        return self._pods.get((namespace, pod))

    def get_namespace(self, namespace: str) -> dict | None:
        return self._namespaces.get(namespace)


class DictMetadataStore(MetadataStore):
    """In-memory store for unit tests (pre-projected dicts)."""

    def __init__(self, pods: dict, namespaces: dict, version: str = "test"):
        self._pods = pods
        self._namespaces = namespaces
        self.version = version
        self.pod_probes = 0
        self.namespace_probes = 0

    def get_pod(self, namespace: str, pod: str) -> dict | None:
        self.pod_probes += 1
        return self._pods.get((namespace, pod))

    def get_namespace(self, namespace: str) -> dict | None:
        self.namespace_probes += 1
        return self._namespaces.get(namespace)


class EmptyMetadataStore(MetadataStore):
    """API reachable but nothing found (404 path → orphans)."""

    def get_pod(self, namespace: str, pod: str) -> dict | None:
        return None

    def get_namespace(self, namespace: str) -> dict | None:
        return None


class TransientFailingStore(MetadataStore):
    """Fails the first ``fail_times`` probes, then delegates to ``inner`` —
    exercises the bounded store-probe retry/backoff ladder (the
    watch_retry_* analog, filter_kubernetes_metadata.rb:94-99) recovering
    mid-probe."""

    def __init__(self, inner: MetadataStore, fail_times: int = 2):
        self.inner = inner
        self.fail_times = fail_times
        self.calls = 0

    def _maybe_fail(self) -> None:
        self.calls += 1
        if self.calls <= self.fail_times:
            raise ConnectionError("transient store error")

    def get_pod(self, namespace: str, pod: str) -> dict | None:
        self._maybe_fail()
        return self.inner.get_pod(namespace, pod)

    def get_namespace(self, namespace: str) -> dict | None:
        self._maybe_fail()
        return self.inner.get_namespace(namespace)


class FailingMetadataStore(MetadataStore):
    """Socket-error analog: every probe raises; the enricher degrades to the
    orphan path without failing the batch
    (test_filter_kubernetes_metadata.rb:266-298)."""

    def get_pod(self, namespace: str, pod: str) -> dict | None:
        raise ConnectionError("metadata store unreachable")

    def get_namespace(self, namespace: str) -> dict | None:
        raise ConnectionError("metadata store unreachable")
