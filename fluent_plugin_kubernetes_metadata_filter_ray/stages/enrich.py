"""Stateful enrich stage: cached metadata lookups as a Ray actor pool.

Re-implements the semantic core of the reference —
``get_pod_metadata`` (kubernetes_metadata_cache_strategy.rb:24-102) and
``get_metadata_for_record`` (filter_kubernetes_metadata.rb:325-362) — as a
callable class for ``map_batches(Enricher, concurrency=N)``:

  - ``__init__`` (once per actor): load + project the metadata snapshot,
    build the three TTL-LRU caches (id / pod / namespace,
    filter_kubernetes_metadata.rb:197-204).
  - ``__call__`` (per batch): resolve each *distinct* key once against the
    caches (the reference only gets this collapse via its caches; we make it
    explicit — SURVEY.md §2.5 A2), then scatter the resolved metadata back to
    rows with vectorized numpy gathers.  The per-call ``batch_miss_cache``
    dict reproduces the per-``filter``-invocation negative cache
    (filter_kubernetes_metadata.rb:366, cache_strategy.rb:29-31,78,81).

Order-independence note: the reference freezes the deleted-pod /
recreated-namespace branch (cache_strategy.rb:49-57) into ``id_cache`` based
on the FIRST record's event time per key, making output order-dependent.
Against an immutable snapshot we instead keep the namespace-age comparison
per-row (resolution returns both branches + the namespace creation time; a
vectorized ``ts`` comparison selects per row), which is order-free and equals
the reference for any single-time key — this is what the DuckDB oracle
asserts.

Scale notes: metadata snapshot is broadcast small-side state (never
shuffled); per-batch work is O(rows) gathers + O(distinct keys) dict lookups;
actor pool size × num_cpus must leave CPUs for read/parse/write stages.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources import metadata_store as ms
from ..state.stats import NoOpStats, Stats
from ..state.ttl_cache import TTLLRUCache

NEG_INF_US = -(2**62)

# flat output columns (string unless noted); see datagen.ENRICH_COLUMNS
K8S_OUTPUT_COLUMNS = [
    "container_id",
    "k8s_namespace_name", "k8s_namespace_id",
    "k8s_pod_name", "k8s_pod_id", "k8s_pod_ip", "k8s_host",
    "k8s_container_name", "k8s_container_image", "k8s_container_image_id",
    "k8s_master_url", "k8s_orphaned_namespace",
    "k8s_labels", "k8s_annotations", "k8s_namespace_labels", "k8s_namespace_annotations",
    "k8s_ownerrefs",
]

_META_TO_COL = {
    "namespace_name": "k8s_namespace_name",
    "namespace_id": "k8s_namespace_id",
    "pod_name": "k8s_pod_name",
    "pod_id": "k8s_pod_id",
    "pod_ip": "k8s_pod_ip",
    "host": "k8s_host",
    "master_url": "k8s_master_url",
    "orphaned_namespace": "k8s_orphaned_namespace",
    "labels_json": "k8s_labels",
    "annotations_json": "k8s_annotations",
    "namespace_labels_json": "k8s_namespace_labels",
    "namespace_annotations_json": "k8s_namespace_annotations",
    "ownerrefs_json": "k8s_ownerrefs",
}


class Enricher:
    """Callable actor class for ``ds.map_batches(Enricher, concurrency=N,
    batch_format='pyarrow', fn_constructor_kwargs=...)``.

    ``store`` may be a MetadataStore instance (unit tests), a snapshot dir
    path (each actor loads the small Parquet side tables once), or a Ray
    ObjectRef to a pre-built store (broadcast via ``ray.put``)."""

    def __init__(self, cfg, store=None, clock=None, sleep=None):
        import time as _time
        self.cfg = cfg
        self.clock = clock or _time.monotonic
        self.sleep = sleep or _time.sleep  # injectable for retry tests
        if isinstance(store, str):
            store = ms.TableMetadataStore(store, cfg)
        elif type(store).__name__ == "ObjectRef":
            import ray
            store = ray.get(store)
        self.store = store
        self._last_seen_rv = getattr(store, "resource_version", None)
        self.has_store = cfg.kubernetes_url is not None and store is not None
        self.stats = Stats() if cfg.stats_enabled else NoOpStats()
        self.id_cache = TTLLRUCache(cfg.cache_size, cfg.cache_ttl, self.clock)
        self.pod_cache = TTLLRUCache(cfg.cache_size, cfg.cache_ttl, self.clock)
        self.ns_cache = TTLLRUCache(cfg.cache_size, cfg.cache_ttl, self.clock)
        self._last_poll = self.clock()
        import os as _os
        self._actor_id = f"{_os.getpid()}"
        self._last_dump = self.clock()

    def _maybe_refresh_snapshot(self) -> None:
        """Between-batch snapshot refresh (watch-MODIFIED analog, SURVEY.md
        §2.8 W1/W2): if the snapshot files changed on disk, reload and apply
        PER-KEY cache upserts from the snapshot diff — the reference watch
        threads' granularity (watch_pods.rb:160-204: MODIFIED overwrites one
        @cache[uid], DELETED removes one), so a long-running job with
        frequent metadata churn keeps every untouched key's cache entry warm
        (VERDICT r3 task 3) instead of re-warming all caches per poll.
        Stores without ``reload_diff`` fall back to the conservative
        reload-plus-flush.

        Why upserts alone are sufficient: the id_cache holds only KEYS
        (pod_id/namespace_id); the hit path re-resolves metadata through
        pod_cache/ns_cache with a store fallback, so deleting a stale
        entry (id changed / key gone) forces a refetch from the reloaded
        authoritative store, and overwriting in place serves the new
        metadata directly.  Negative conclusions never outlive a batch
        (batch_miss_cache), so an ADDED key is observed at the next miss."""
        poll = self.cfg.snapshot_poll_s
        if poll is None or not hasattr(self.store, "changed"):
            return
        now = self.clock()
        if now - self._last_poll < poll:
            return
        self._last_poll = now
        if not self.store.changed():
            return
        if not hasattr(self.store, "reload_diff"):
            self.store.reload()
            self.id_cache.clear()
            self.pod_cache.clear()
            self.ns_cache.clear()
            self.stats.bump("snapshot_reloads")
            return
        self.store.reload_diff()  # advance the store + its watch journal
        try:
            # replay from OUR last seen resourceVersion — coalesced diffs if
            # this consumer missed generations (@last_seen_resource_version
            # twin, watch_pods.rb:162-166)
            pod_diff, ns_diff, rv = self.store.events_since(self._last_seen_rv)
        except ms.ResourceVersionGone:
            # 410 Gone ladder (watch_pods.rb:133-134,187-196): the journal
            # no longer reaches our version — restart from a full LIST
            # (store is already reloaded; flush every cache)
            self.id_cache.clear()
            self.pod_cache.clear()
            self.ns_cache.clear()
            self._last_seen_rv = self.store.resource_version
            self.stats.bump("watch_gone_restarts")
            self.stats.bump("snapshot_reloads")
            return
        self._last_seen_rv = rv
        for _key, (old, new) in pod_diff.items():
            old_id = old.get("pod_id") if old else None
            new_id = new.get("pod_id") if new else None
            if old_id is not None and old_id != new_id:
                self.pod_cache.delete(old_id)  # deleted / recreated uid
            if new_id is not None:
                self.pod_cache[new_id] = new  # watch ADDED/MODIFIED upsert
        for _key, (old, new) in ns_diff.items():
            old_id = old.get("namespace_id") if old else None
            new_id = new.get("namespace_id") if new else None
            if old_id is not None and old_id != new_id:
                self.ns_cache.delete(old_id)
            if new_id is not None:
                self.ns_cache[new_id] = new
        self.stats.bump("snapshot_reloads")
        self.stats.bump("snapshot_upserts", len(pod_diff) + len(ns_diff))

    # -- store probes with the reference's error degradation ---------------

    def _probe_with_retry(self, probe, counter_prefix: str):
        """Bounded retry/backoff around one store probe — the
        watch_retry_* ladder analog (filter_kubernetes_metadata.rb:94-99,
        kubernetes_metadata_watch_pods.rb:29-112): attempt, on exception
        sleep interval·base^attempt and retry up to store_retry_max_times,
        then give up (caller degrades to orphan; never blocks the batch).
        Raises nothing; returns (ok, value)."""
        cfg = self.cfg
        attempts = 1 + max(0, cfg.store_retry_max_times)
        for attempt in range(attempts):
            try:
                return True, probe()
            except Exception:
                if attempt + 1 < attempts:
                    self.stats.bump(f"{counter_prefix}_api_retries")
                    self.sleep(
                        cfg.store_retry_interval * cfg.store_retry_backoff_base ** attempt
                    )
        self.stats.bump(f"{counter_prefix}_api_nil_error")
        return False, None

    def _fetch_pod(self, ns: str, pod: str) -> dict:
        """fetch_pod_metadata twin (filter_kubernetes_metadata.rb:101-129):
        miss → {}, error → bounded retries, then stats bump + {} (degrade,
        never block)."""
        ok, meta = self._probe_with_retry(
            lambda: self.store.get_pod(ns, pod), "pod_cache"
        )
        if not ok:
            return {}
        if meta is None:
            self.stats.bump("pod_cache_api_nil_not_found")
            return {}
        self.stats.bump("pod_cache_api_updates")
        self.pod_cache[meta["pod_id"]] = meta
        return meta

    def _fetch_namespace(self, ns: str) -> dict:
        ok, meta = self._probe_with_retry(
            lambda: self.store.get_namespace(ns), "namespace_cache"
        )
        if not ok:
            return {}
        if meta is None:
            self.stats.bump("namespace_cache_api_nil_not_found")
            return {}
        self.stats.bump("namespace_cache_api_updates")
        self.ns_cache[meta["namespace_id"]] = meta
        return meta

    # -- cache strategy (get_pod_metadata twin) ----------------------------

    def get_pod_metadata_pair(self, key, ns, pod, batch_miss_cache):
        """Returns ``(meta_le, meta_gt, ns_creation_us)``:

        ``meta_le`` applies when namespace.creation_ts <= record ts
        (deleted-pod branch), ``meta_gt`` when newer (recreated-namespace
        branch); identical (creation=-inf) when the branch is irrelevant.
        Mirrors kubernetes_metadata_cache_strategy.rb:24-102 with the
        branch selection deferred to per-row time (see module docstring).
        """
        cfg = self.cfg
        ids = self.id_cache.get(key)
        if ids is None:
            self.stats.bump("id_cache_miss")
            bm_key = f"{ns}_{pod}"
            if bm_key in batch_miss_cache:
                return batch_miss_cache[bm_key]

            pod_meta = self._fetch_pod(ns, pod)
            if cfg.skip_namespace_metadata:
                ids = {"pod_id": pod_meta.get("pod_id")}
                self.id_cache[key] = ids
                return self._finalize(dict(pod_meta)), None, NEG_INF_US

            ns_meta = self._fetch_namespace(ns)
            ids = {"pod_id": pod_meta.get("pod_id"), "namespace_id": ns_meta.get("namespace_id")}
            if ids["pod_id"] is not None and ids["namespace_id"] is not None:
                merged = {**pod_meta, **ns_meta}
                self.id_cache[key] = ids
                return self._finalize(merged), None, NEG_INF_US
            if ids["pod_id"] is None and ids["namespace_id"] is not None:
                # pod not found, namespace found → namespace-age branch.
                # The reference stores the *cache key* as pod_id here
                # (cache_strategy.rb:51-58) so later id-cache hits find the
                # stub; we additionally mark the entry deferred so the hit
                # path re-evaluates the per-row time branch (order-free).
                self.stats.bump("id_cache_pod_not_found_namespace")
                creation = ns_meta["creation_timestamp"]
                creation_us = int(pd.Timestamp(creation).value // 1000)
                stub = self.pod_cache.fetch(key, lambda: {"pod_id": key})
                meta_le = self._finalize({**stub, **ns_meta})
                meta_gt = self._finalize(dict(ns_meta))
                self.id_cache[key] = {
                    "pod_id": key,
                    "namespace_id": ids["namespace_id"],
                    "deferred_ns_age": True,
                }
                return meta_le, meta_gt, creation_us
            if ids["pod_id"] is not None and ids["namespace_id"] is None:
                # "should NEVER be possible" (cache_strategy.rb:62-64)
                self.stats.bump("id_cache_namespace_not_found_pod")
            else:
                self.stats.bump("id_cache_orphaned_record")
            if cfg.allow_orphans:
                meta = {
                    "orphaned_namespace": ns,
                    "namespace_name": cfg.orphaned_namespace_name,
                    "namespace_id": cfg.orphaned_namespace_id,
                }
            else:
                meta = {}
            pair = (self._finalize(meta), None, NEG_INF_US)
            # negative result goes to the per-batch cache only, NOT id_cache
            # (cache_strategy.rb:78-81)
            batch_miss_cache[bm_key] = pair
            return pair

        # SLOW PATH (id_cache hit): refetch metadata via pod/ns caches with
        # store fallback (cache_strategy.rb:83-97)
        def pod_fallback():
            self.stats.bump("pod_cache_miss")
            m = self._fetch_pod(ns, pod)
            return m if m else {"pod_id": ids["pod_id"]}

        pod_part = dict(self.pod_cache.fetch(ids.get("pod_id"), pod_fallback))
        ns_part: dict = {}
        if "namespace_id" in ids:
            def ns_fallback():
                if not cfg.skip_namespace_metadata:
                    self.stats.bump("namespace_cache_miss")
                    m = self._fetch_namespace(ns)
                    if m:
                        return m
                return {"namespace_id": ids["namespace_id"]}

            ns_part = dict(self.ns_cache.fetch(ids.get("namespace_id"), ns_fallback))
        if ids.get("deferred_ns_age"):
            # deleted-pod vs recreated-namespace stays a per-row time branch
            creation = ns_part.get("creation_timestamp")
            creation_us = (
                int(pd.Timestamp(creation).value // 1000) if creation is not None else NEG_INF_US
            )
            meta_le = self._finalize({**pod_part, **ns_part})
            meta_gt = self._finalize(dict(ns_part))
            return meta_le, meta_gt, creation_us
        return self._finalize({**pod_part, **ns_part}), None, NEG_INF_US

    @staticmethod
    def _finalize(meta: dict) -> dict:
        """Strip comparison-only / nil entries
        (cache_strategy.rb:99-101)."""
        meta.pop("creation_timestamp", None)
        return {k: v for k, v in meta.items() if v is not None}

    # -- record-level metadata (get_metadata_for_record twin) --------------

    def metadata_for_key(self, ns, pod, container, cache_key, docker_id, batch_miss_cache):
        """filter_kubernetes_metadata.rb:325-362, producing flat output
        column dicts for both time branches."""
        meta_le, meta_gt, creation_us = (
            self.get_pod_metadata_pair(cache_key, ns, pod, batch_miss_cache)
            if self.has_store
            else ({}, None, NEG_INF_US)
        )
        out_le = self._build_output(ns, pod, container, docker_id, meta_le)
        out_gt = out_le if meta_gt is None else self._build_output(ns, pod, container, docker_id, meta_gt)
        return out_le, out_gt, creation_us

    def _build_output(self, ns, pod, container, docker_id, pod_meta: dict) -> dict:
        cfg = self.cfg
        out = dict.fromkeys(K8S_OUTPUT_COLUMNS)
        out["k8s_namespace_name"] = ns
        out["k8s_pod_name"] = pod
        out["k8s_container_name"] = container
        container_id = docker_id if docker_id is not None else ""

        if self.has_store:
            c = (pod_meta.get("containers") or {}).get(container)
            if c and not cfg.skip_container_metadata:
                out["k8s_container_image"] = c.get("image")
                if c.get("image_id"):
                    out["k8s_container_image_id"] = c["image_id"]
                if c.get("containerID"):
                    container_id = c["containerID"]
            for mk, col in _META_TO_COL.items():
                if mk in pod_meta:
                    out[col] = pod_meta[mk]

        out["container_id"] = container_id if container_id else None  # docker-drop (M11)
        return out

    # -- the per-batch entry point -----------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        self._maybe_refresh_snapshot()
        batch_miss_cache: dict = {}

        ns_a = batch.column("namespace").to_numpy(zero_copy_only=False)
        pod_a = batch.column("pod_name").to_numpy(zero_copy_only=False)
        cont_a = batch.column("container_name").to_numpy(zero_copy_only=False)
        did_a = batch.column("docker_id").to_numpy(zero_copy_only=False)
        key_a = batch.column("cache_key").to_numpy(zero_copy_only=False)
        ts_us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)

        matched = pd.notna(ns_a)
        # distinct-key resolution: one store/cache probe per unique key per batch
        tuples = pd.Series(list(zip(ns_a, pod_a, cont_a, did_a, key_a)), dtype=object)
        codes, uniques = pd.factorize(tuples[matched], sort=False)

        n_u = len(uniques)
        le_vals = {c: np.empty(n_u, dtype=object) for c in K8S_OUTPUT_COLUMNS}
        gt_vals = {c: np.empty(n_u, dtype=object) for c in K8S_OUTPUT_COLUMNS}
        creation = np.full(n_u, NEG_INF_US, dtype=np.int64)

        for ui, (ns, pod, cont, did, key) in enumerate(uniques):
            did_v = None if pd.isna(did) else did
            out_le, out_gt, cre = self.metadata_for_key(
                ns, pod, cont, key, did_v, batch_miss_cache
            )
            creation[ui] = cre
            for c in K8S_OUTPUT_COLUMNS:
                le_vals[c][ui] = out_le[c]
                gt_vals[c][ui] = out_gt[c]

        # Dictionary-encoded output: one shared int32 code vector (unique-key
        # index × time-branch), 17 small dictionaries of ≤2·n_u values.  At
        # ~640 distinct metadata tuples per 300k-row batch this shrinks the
        # output block ~5× (codes instead of repeated strings) — less object
        # store flux per stage boundary — and replaces 17 object-array
        # scatters with one integer add.
        #
        # The parse-stage key columns are consumed here and duplicated by the
        # k8s_* outputs — drop them so they never hit the object store (the
        # parse→enrich hop is fused in-process; only THIS output crosses).
        drop = [c for c in ("namespace", "pod_name", "container_name",
                            "docker_id", "pod_uuid", "cache_key")
                if c in batch.column_names]
        out = batch.drop_columns(drop)
        midx = np.flatnonzero(matched)
        row_ts = ts_us[midx]
        use_le = row_ts >= creation[codes]
        full_codes = np.full(n, -1, dtype=np.int32)
        if n_u:
            full_codes[midx] = (codes + n_u * (~use_le)).astype(np.int32)
        empty_codes = np.full(n, -1, dtype=np.int32)
        for c in K8S_OUTPUT_COLUMNS:
            if n_u:
                vals = np.concatenate([le_vals[c], gt_vals[c]])
                # pandas Categorical requires unique, null-free categories:
                # factorize dedupes and maps nulls to -1 in one pass
                vcodes, vuniq = pd.factorize(vals, sort=False)
                safe = np.clip(full_codes, 0, None)
                codes_c = np.where(full_codes >= 0, vcodes[safe], -1).astype(np.int32)
                dict_vals = pa.array(vuniq, pa.string())
            else:
                codes_c = empty_codes
                dict_vals = pa.array([], pa.string())
            codes_arr = pa.array(codes_c, pa.int32(), mask=codes_c < 0)
            out = out.append_column(
                c, pa.DictionaryArray.from_arrays(codes_arr, dict_vals)
            )

        self.stats.set("last_batch_rows", n)
        self._maybe_dump_stats()
        return out

    def _maybe_dump_stats(self) -> None:
        """Interval-gated counter snapshot (dump_stats analog,
        filter_kubernetes_metadata.rb:131-144)."""
        cfg = self.cfg
        if not cfg.stats_dump_dir:
            return
        now = self.clock()
        if now - self._last_dump >= cfg.stats_interval:
            self._last_dump = now
            from ..state.stats import dump_counters

            dump_counters(cfg.stats_dump_dir, self._actor_id, self.stats.to_dict())

    def counters(self) -> dict:
        return self.stats.to_dict()


def decode_dictionary_columns(batch: pa.Table) -> pa.Table:
    """Cast dictionary-encoded columns back to plain values.  Needed at
    boundaries where element-level null semantics matter (a dictionary VALUE
    may be null while its index is valid — ``pc.is_valid`` only sees the
    index) or where consumers expect plain string columns."""
    import pyarrow.compute as pc

    for i, f in enumerate(batch.schema):
        if pa.types.is_dictionary(f.type):
            batch = batch.set_column(
                i, f.name, pc.cast(batch.column(f.name), f.type.value_type)
            )
    return batch


def decode_stage(ds):
    """Dataset-level decode of dictionary columns (driver-facing outputs)."""
    return ds.map_batches(
        decode_dictionary_columns, batch_format="pyarrow", zero_copy_batch=True
    )


def _auto_concurrency() -> int:
    """Actor-pool size: ~3/4 of CPUs.  Ray fuses the upstream read+parse
    TASK stages into this actor pool (one fused operator does
    read→parse→enrich), so the pool performs ALL the per-row work and wants
    most of the machine (measured on quiet hardware: pool=30 of 32 → 1.2M
    rows/s, pool=16 → half that).  The 1/4 headroom serves the downstream
    write/aggregate operators AND keeps the job from collapsing when the
    hypervisor steals CPU — on this sandbox, fully loading 32 vCPUs draws
    ~50% steal and an oversized pool then runs 3× SLOWER than a modest one
    (measured: pool=14 → 106 s vs pool=30 → 347 s under contention)."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(1, min(cpus - 2, cpus * 3 // 4))


def enrich_stage(ds, cfg, store_ref):
    """parse → enrich: actor pool holding the caches + snapshot."""
    conc = cfg.enrich_concurrency or _auto_concurrency()
    return ds.map_batches(
        Enricher,
        fn_constructor_kwargs={"cfg": cfg, "store": store_ref},
        batch_format="pyarrow",
        batch_size=cfg.enrich_batch_size,
        # fixed-size pool: all actors spawn in parallel at stage start
        # (autoscaling ramps too slowly for sub-minute jobs)
        concurrency=conc,
        num_cpus=1,
        zero_copy_batch=True,
        # NOTE: do NOT pass max_restarts / max_task_retries here — setting
        # either on the fused actor operator makes Ray serialize its task
        # pipeline (measured 3×: 50 s → 152 s on the same job).  Worker
        # death is covered by Ray Data's built-in task retry + the
        # checkpoint layer's shard re-run (state/checkpoint.py); the
        # crash-restart cache rebuild still happens in __init__.
    )
