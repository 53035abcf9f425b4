"""Unit tests of the enrich resolver against a stubbed metadata store —
mirrors the reference's test/plugin/test_cache_strategy.rb (9 cases: hit,
miss+fetch, deleted-pod, recreated-namespace, orphan on/off, per-batch
negative cache, skip_namespace_metadata) plus TTL behavior with an injected
clock.  No Ray involved: the Enricher is a plain callable class."""

import pandas as pd
import pytest

from fluent_plugin_kubernetes_metadata_filter_ray.config import PipelineConfig
from fluent_plugin_kubernetes_metadata_filter_ray.sources.metadata_store import (
    DictMetadataStore,
    EmptyMetadataStore,
    FailingMetadataStore,
)
from fluent_plugin_kubernetes_metadata_filter_ray.stages.enrich import NEG_INF_US, Enricher

TS_2024 = int(pd.Timestamp("2024-01-20").value // 1000)

POD_META = {
    "namespace_name": "ns-a",
    "pod_id": "pod-uid-1",
    "pod_name": "pod-x",
    "pod_ip": "10.0.0.1",
    "containers": {"app": {"name": "app", "image": "img:1", "image_id": "sha256:aa",
                           "containerID": "c" * 64}},
    "host": "node-1",
    "labels_json": '{"app":"pod-x"}',
    "master_url": "https://k8s",
}
NS_META_OLD = {
    "namespace_id": "ns-uid-1",
    "creation_timestamp": pd.Timestamp("2023-01-01"),
    "namespace_labels_json": '{"tenant":"t"}',
}
NS_META_NEW = dict(NS_META_OLD, creation_timestamp=pd.Timestamp("2025-01-01"))


def mk(store, **cfg_kw):
    cfg = PipelineConfig(**cfg_kw)
    return Enricher(cfg, store=store)


def test_pod_and_namespace_found():
    store = DictMetadataStore({("ns-a", "pod-x"): POD_META}, {"ns-a": NS_META_OLD})
    e = mk(store)
    le, gt, cre = e.get_pod_metadata_pair("key1", "ns-a", "pod-x", {})
    assert gt is None and cre == NEG_INF_US
    assert le["pod_id"] == "pod-uid-1"
    assert le["namespace_id"] == "ns-uid-1"
    assert "creation_timestamp" not in le
    # second call: id_cache hit → slow path served from pod/ns caches, no new probes
    p0, n0 = store.pod_probes, store.namespace_probes
    le2, _, _ = e.get_pod_metadata_pair("key1", "ns-a", "pod-x", {})
    assert le2 == le
    assert (store.pod_probes, store.namespace_probes) == (p0, n0)


def test_deleted_pod_vs_recreated_namespace_branch():
    store = DictMetadataStore({}, {"ns-a": NS_META_NEW})
    e = mk(store)
    le, gt, cre = e.get_pod_metadata_pair("key1", "ns-a", "pod-gone", {})
    # namespace creation 2025 > record ts 2024 → recreated-namespace branch (gt)
    assert cre == int(pd.Timestamp("2025-01-01").value // 1000)
    assert le["pod_id"] == "key1"          # deleted-pod branch keeps cache key as pod_id
    assert "pod_id" not in gt              # recreated-namespace branch: ns meta only
    assert gt["namespace_id"] == "ns-uid-1"


def test_deleted_pod_branch_survives_id_cache_hit():
    """Regression: the id_cache entry for a pod-missing/namespace-found key
    stores the cache key as pod_id (cache_strategy.rb:51-58) and stays a
    deferred per-row time branch — a key first resolved in an earlier batch
    must yield identical deleted-pod / recreated-namespace metadata on the
    id-cache-hit path (bug found via multi-block reads)."""
    store = DictMetadataStore({}, {"ns-a": NS_META_NEW})
    e = mk(store)
    le1, gt1, cre1 = e.get_pod_metadata_pair("key1", "ns-a", "pod-gone", {})
    # second batch: id_cache hit path
    le2, gt2, cre2 = e.get_pod_metadata_pair("key1", "ns-a", "pod-gone", {})
    assert cre2 == cre1
    assert le2 == le1 and le2["pod_id"] == "key1"
    assert gt2 == gt1 and "pod_id" not in gt2


def test_orphan_when_nothing_found():
    store = EmptyMetadataStore()
    e = mk(store)
    le, gt, cre = e.get_pod_metadata_pair("k", "ns-zz", "pod-zz", {})
    assert le == {"orphaned_namespace": "ns-zz", "namespace_name": ".orphaned",
                  "namespace_id": "orphaned"}
    assert e.stats.to_dict()["id_cache_orphaned_record"] == 1


def test_orphan_disabled_returns_empty():
    e = mk(EmptyMetadataStore(), allow_orphans=False)
    le, _, _ = e.get_pod_metadata_pair("k", "ns-zz", "pod-zz", {})
    assert le == {}


def test_store_error_degrades_to_orphan():
    # socket-error analog (test_filter_kubernetes_metadata.rb:266-298)
    e = mk(FailingMetadataStore())
    le, _, _ = e.get_pod_metadata_pair("k", "ns-a", "pod-x", {})
    assert le["namespace_name"] == ".orphaned"
    assert e.stats.to_dict()["pod_cache_api_nil_error"] == 1


def test_batch_miss_cache_collapses_probes_and_skips_id_cache():
    store = DictMetadataStore({}, {})
    e = mk(store)
    bm = {}
    e.get_pod_metadata_pair("k1", "ns-m", "pod-m", bm)
    p1 = store.pod_probes
    # same (ns,pod), different key, same batch → served from batch_miss_cache
    e.get_pod_metadata_pair("k2", "ns-m", "pod-m", bm)
    assert store.pod_probes == p1
    # negative results must NOT land in id_cache (cache_strategy.rb:81)
    assert e.id_cache.get("k1") is None and e.id_cache.get("k2") is None
    # new batch (fresh dict) probes again
    e.get_pod_metadata_pair("k1", "ns-m", "pod-m", {})
    assert store.pod_probes == p1 + 1


def test_skip_namespace_metadata():
    store = DictMetadataStore({("ns-a", "pod-x"): POD_META}, {"ns-a": NS_META_OLD})
    e = mk(store, skip_namespace_metadata=True)
    le, gt, _ = e.get_pod_metadata_pair("key1", "ns-a", "pod-x", {})
    assert gt is None
    assert "namespace_id" not in le
    assert store.namespace_probes == 0


def test_ttl_expiry_refetches(monkeypatch):
    clock = [0.0]
    store = DictMetadataStore({("ns-a", "pod-x"): POD_META}, {"ns-a": NS_META_OLD})
    cfg = PipelineConfig(cache_ttl=10.0)
    e = Enricher(cfg, store=store, clock=lambda: clock[0])
    e.get_pod_metadata_pair("key1", "ns-a", "pod-x", {})
    probes = store.pod_probes
    clock[0] = 5.0
    e.get_pod_metadata_pair("key1", "ns-a", "pod-x", {})
    assert store.pod_probes == probes  # within TTL: cached
    clock[0] = 11.0
    e.get_pod_metadata_pair("key1", "ns-a", "pod-x", {})
    assert store.pod_probes == probes + 1  # expired: refetch


def test_snapshot_poll_refresh(tmp_path):
    """Long-running-job watch analog: with snapshot_poll_s set, an enrich
    actor re-stats the snapshot files between batches and reloads + clears
    caches when they change (SURVEY.md §2.8 W1/W2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from fluent_plugin_kubernetes_metadata_filter_ray import datagen as dg

    d = str(tmp_path)
    pods = dg.build_pods_table()
    pq.write_table(pods, d + "/pods.parquet")
    pq.write_table(dg.build_namespaces_table(), d + "/namespaces.parquet")

    clock = [0.0]
    cfg = PipelineConfig(snapshot_poll_s=5.0)
    e = Enricher(cfg, store=d, clock=lambda: clock[0])
    le, _, _ = e.metadata_for_key("ns-0", "pod-0", "app", "k1", None, {})
    assert le["k8s_pod_ip"] == "10.0.0.0"

    rows = pods.to_pylist()
    assert rows[0]["namespace_name"] == "ns-0" and rows[0]["pod_name"] == "pod-0"
    rows[0]["pod_ip"] = "9.9.9.9"
    pq.write_table(pa.Table.from_pylist(rows, schema=pods.schema), d + "/pods.parquet")

    clock[0] = 2.0  # within poll interval: stale snapshot still served
    e._maybe_refresh_snapshot()
    le2, _, _ = e.metadata_for_key("ns-0", "pod-0", "app", "k1", None, {})
    assert le2["k8s_pod_ip"] == "10.0.0.0"

    clock[0] = 6.0  # poll fires: reload + cache clear
    e._maybe_refresh_snapshot()
    le3, _, _ = e.metadata_for_key("ns-0", "pod-0", "app", "k1", None, {})
    assert le3["k8s_pod_ip"] == "9.9.9.9"
    assert e.stats.to_dict()["snapshot_reloads"] == 1


def test_snapshot_swap_models_watch_update():
    """Watch MODIFIED semantics (kubernetes_metadata_watch_pods.rb:160-204)
    become snapshot versions: swapping the store + clearing caches yields the
    new metadata (SURVEY.md §2.8 W1)."""
    store1 = DictMetadataStore({("ns-a", "pod-x"): POD_META}, {"ns-a": NS_META_OLD}, version="v1")
    e = mk(store1)
    le, _, _ = e.get_pod_metadata_pair("key1", "ns-a", "pod-x", {})
    assert le["pod_ip"] == "10.0.0.1"
    pod2 = dict(POD_META, pod_ip="10.9.9.9")
    e.store = DictMetadataStore({("ns-a", "pod-x"): pod2}, {"ns-a": NS_META_OLD}, version="v2")
    e.id_cache.clear(); e.pod_cache.clear(); e.ns_cache.clear()
    le2, _, _ = e.get_pod_metadata_pair("key1", "ns-a", "pod-x", {})
    assert le2["pod_ip"] == "10.9.9.9"
