"""Pipeline configuration — mirrors the reference's ``config_param`` surface
(filter_kubernetes_metadata.rb:44-99) where meaningful for a batch engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import constants as C

# reference tag grammars (filter_kubernetes_metadata.rb:57-58), RE2-safe:
# inner groups made non-capturing; named groups kept identical.
REGEX_VAR_LOG_PODS = (
    r"^var\.log\.pods\.(?P<namespace>[^_]+)"
    r"_(?P<pod_name>[a-z0-9](?:[-a-z0-9]*[a-z0-9])?(?:\.[a-z0-9](?:[-a-z0-9]*[a-z0-9])?)*)"
    r"_(?P<pod_uuid>[a-z0-9-]*)\.(?P<container_name>.+)\..*\.log$"
)
REGEX_VAR_LOG_CONTAINERS = (
    r"^var\.log\.containers\."
    r"(?P<pod_name>[a-z0-9](?:[-a-z0-9]*[a-z0-9])?(?:\.[a-z0-9](?:[-a-z0-9]*[a-z0-9])?)*)"
    r"_(?P<namespace>[^_]+)_(?P<container_name>.+)-(?P<docker_id>[a-z0-9]{64})\.log$"
)


@dataclass
class PipelineConfig:
    # metadata store ("API server"); None → tag-only metadata
    # (test_filter_kubernetes_metadata.rb:519-533)
    kubernetes_url: str | None = C.MASTER_URL

    # caches (filter_kubernetes_metadata.rb:45-47)
    cache_size: int = 1000
    cache_ttl: float = 3600.0

    # tag grammars (overridable, U2)
    tag_regex_pods: str = REGEX_VAR_LOG_PODS
    tag_regex_containers: str = REGEX_VAR_LOG_CONTAINERS

    # enrichment behavior
    annotation_match: tuple[str, ...] = (r"^custom\..+",)
    allow_orphans: bool = True
    orphaned_namespace_name: str = C.ORPHANED_NAMESPACE_NAME
    orphaned_namespace_id: str = C.ORPHANED_NAMESPACE_ID
    lookup_from_k8s_field: bool = True
    skip_labels: bool = False
    skip_pod_labels: bool = False
    skip_namespace_labels: bool = False
    skip_container_metadata: bool = False
    skip_master_url: bool = False
    skip_namespace_metadata: bool = False
    include_ownerrefs_metadata: bool = False

    # de_dot: replace '.' in label/annotation keys (legacy option; the
    # reference deprecates it in 3.x — release_notes.md:4 — so default off.
    # annotation_match applies BEFORE de_dot, on the original keys)
    de_dot: bool = False
    de_dot_separator: str = "_"

    # snapshot refresh polling for long-running jobs: every N seconds each
    # enrich actor re-stats the snapshot files and reloads + clears caches
    # if they changed (batch analog of `watch` MODIFIED handling; None →
    # static snapshot, the correctness-test default)
    snapshot_poll_s: float | None = None

    # stats (stats_interval<=0 → NoOp, filter_kubernetes_metadata.rb:186-190);
    # stats_dump_dir → each enrich actor writes its counter snapshot there
    # every stats_interval seconds (dump_stats analog,
    # filter_kubernetes_metadata.rb:131-144); merge with
    # state.stats.collect_dumped_counters
    stats_enabled: bool = True
    stats_interval: float = 30.0
    stats_dump_dir: str | None = None

    # Ray execution knobs; enrich_concurrency=None → size the actor pool to
    # the cluster, leaving CPUs for the read/write stages.  batch_size=None →
    # block-native batches (zero re-batching copies); set explicitly only to
    # bound actor-call latency / memory for very large blocks
    enrich_batch_size: int | None = None
    enrich_concurrency: int | None = None
    parse_batch_size: int | None = None

    # Bounded retry/backoff on individual store probes — the
    # watch_retry_interval / watch_retry_exponential_backoff_base /
    # watch_retry_max_times analog (filter_kubernetes_metadata.rb:94-99):
    # a probe that raises is retried up to store_retry_max_times with
    # exponentially growing sleeps before degrading to the orphan path.
    # Default 0 retries = probe once (an immutable snapshot store can't
    # succeed on retry; raise for a flaky remote store).
    store_retry_max_times: int = 0
    store_retry_interval: float = 1.0
    store_retry_backoff_base: float = 2.0

    # Worker/task-level fault tolerance (beyond per-probe retries) comes
    # from Ray Data's built-in task retry (a restarted actor rebuilds
    # caches + snapshot in __init__) plus the checkpoint layer's shard
    # re-run.  Deliberately NOT exposed as per-stage
    # max_restarts/max_task_retries kwargs: setting either on the fused
    # actor operator serializes its task pipeline (measured 3× slowdown).

    def skip_variant(self) -> "PipelineConfig":
        """The skip_labels+skip_container_metadata+skip_master_url variant used
        by the q_enrich_skip oracle (test_filter_kubernetes_metadata.rb:779-889)."""
        from dataclasses import replace
        return replace(self, skip_labels=True, skip_container_metadata=True, skip_master_url=True)

    def dedot_variant(self) -> "PipelineConfig":
        """Legacy de_dot field mapping on: dots in label/annotation keys →
        separator."""
        from dataclasses import replace
        return replace(self, de_dot=True)

    def ownerrefs_variant(self) -> "PipelineConfig":
        """include_ownerrefs_metadata on: pods expose their ownerReferences
        as k8s_ownerrefs (test_filter_kubernetes_metadata.rb:891-933)."""
        from dataclasses import replace
        return replace(self, include_ownerrefs_metadata=True)


DEFAULT_CONFIG = PipelineConfig()
