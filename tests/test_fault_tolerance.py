"""Fault tolerance: a worker process dying mid-stage is retried and the
pipeline completes with full results — the Ray analog of the reference's
watch-thread crash-restart ladder (kubernetes_metadata_watch_pods.rb:29-112).
On actor restart the enrich-style state rebuilds in __init__."""

import os

from fluent_plugin_kubernetes_metadata_filter_ray.state.faults import CrashOnFirstCall


def test_pipeline_survives_worker_death(ray_session, tmp_path):
    import ray.data

    flag = str(tmp_path / "crash_flag")
    ds = ray.data.range(1000, override_num_blocks=4).map_batches(
        CrashOnFirstCall,
        fn_constructor_kwargs={"flag_path": flag},
        concurrency=1,
        batch_format="pyarrow",
        max_restarts=2,
        max_task_retries=2,
    )
    assert ds.count() == 1000
    assert os.path.exists(flag)


def test_store_probe_retry_backoff_then_degrade():
    """store_retry_max_times=N: a failing probe sleeps the exponential
    ladder interval*base^attempt between N retries, then degrades (orphan
    path) without raising — the watch_retry_* analog."""
    from dataclasses import replace

    from fluent_plugin_kubernetes_metadata_filter_ray.config import DEFAULT_CONFIG
    from fluent_plugin_kubernetes_metadata_filter_ray.sources.metadata_store import (
        FailingMetadataStore,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.enrich import Enricher

    cfg = replace(DEFAULT_CONFIG, store_retry_max_times=3)
    sleeps = []
    e = Enricher(cfg, store=FailingMetadataStore(), sleep=sleeps.append)
    assert e._fetch_pod("ns-1", "pod-1") == {}
    assert sleeps == [1.0, 2.0, 4.0]
    c = e.counters()
    assert c["pod_cache_api_retries"] == 3
    assert c["pod_cache_api_nil_error"] == 1

    # full record path still degrades to orphan, never raises
    out_le, _, _ = e.metadata_for_key("ns-1", "pod-1", "c", "key1", None, {})
    assert out_le["k8s_namespace_id"] == cfg.orphaned_namespace_id


def test_store_probe_transient_failure_recovers():
    """A store that fails twice then answers: the retry ladder recovers the
    probe instead of orphaning the record."""
    from dataclasses import replace

    from fluent_plugin_kubernetes_metadata_filter_ray.config import DEFAULT_CONFIG
    from fluent_plugin_kubernetes_metadata_filter_ray.sources.metadata_store import (
        DictMetadataStore,
        TransientFailingStore,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.enrich import Enricher

    inner = DictMetadataStore(
        pods={("ns-1", "pod-1"): {"pod_id": "uid-1", "pod_name": "pod-1",
                                  "namespace_name": "ns-1"}},
        namespaces={"ns-1": {"namespace_id": "nsid-1"}},
    )
    cfg = replace(DEFAULT_CONFIG, store_retry_max_times=3)
    e = Enricher(cfg, store=TransientFailingStore(inner, fail_times=2),
                 sleep=lambda s: None)
    meta = e._fetch_pod("ns-1", "pod-1")
    assert meta["pod_id"] == "uid-1"
    c = e.counters()
    assert c["pod_cache_api_retries"] == 2
    assert "pod_cache_api_nil_error" not in c


def test_store_probe_default_single_try():
    """Default config probes exactly once (immutable snapshot store —
    retrying cannot help); no sleeps happen."""
    from fluent_plugin_kubernetes_metadata_filter_ray.config import DEFAULT_CONFIG
    from fluent_plugin_kubernetes_metadata_filter_ray.sources.metadata_store import (
        FailingMetadataStore,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.enrich import Enricher

    sleeps = []
    e = Enricher(DEFAULT_CONFIG, store=FailingMetadataStore(), sleep=sleeps.append)
    assert e._fetch_pod("ns-1", "pod-1") == {}
    assert sleeps == []
    assert e.counters()["pod_cache_api_nil_error"] == 1
