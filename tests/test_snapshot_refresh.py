"""Mid-run snapshot refresh exercised in ONE flowing pipeline (VERDICT r2
task 4) — the batch analog of a live watch-MODIFIED event arriving while
records stream (/root/reference/lib/fluent/plugin/
kubernetes_metadata_watch_pods.rb:160-204).

Consistency contract (documented here, implemented in
stages/enrich.py Enricher._maybe_refresh_snapshot): snapshots are pinned
PER BATCH — every row of a batch is enriched against the snapshot version
current when the batch entered the actor; the poll runs between batches,
and a reload drops all TTL caches so no post-swap row can be served
pre-swap metadata from a cache.  Rows already enriched keep the metadata
that was authoritative when they flowed — exactly the reference's watch
behavior, where records enriched before the MODIFIED event keep the old
labels.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from fluent_plugin_kubernetes_metadata_filter_ray import datagen as dg
from fluent_plugin_kubernetes_metadata_filter_ray.config import PipelineConfig
from fluent_plugin_kubernetes_metadata_filter_ray.stages import enrich as en
from fluent_plugin_kubernetes_metadata_filter_ray.stages.parse import parse_stage


def test_midrun_snapshot_refresh_one_flowing_pipeline(ray_session, tmp_path):
    import ray.data

    new_ip = "9.9.9.9"
    swap_after = 3  # batches enriched against v1 before the actor swaps to v2

    snap = str(tmp_path / "snap")
    os.makedirs(snap)
    pq.write_table(dg.build_pods_table(), f"{snap}/pods.parquet")
    pq.write_table(dg.build_namespaces_table(), f"{snap}/namespaces.parquet")

    # 8 shards × 50 rows, every row tagged to (ns-0, pod-0)
    n_per, n_shards = 50, 8
    tool = "var.log.containers.pod-0_ns-0_app-" + "0" * 64 + ".log"
    base = pd.Timestamp("2024-01-02").value // 1000
    d = str(tmp_path / "turns")
    os.makedirs(d)
    for s in range(n_shards):
        t = pa.table(
            {
                "conv_id": pa.array([f"c{s}"] * n_per, pa.string()),
                "turn_idx": pa.array(np.arange(n_per, dtype=np.int32), pa.int32()),
                "role": pa.array(["user"] * n_per, pa.string()),
                "text": pa.array([f"turn {s}-{i}" for i in range(n_per)], pa.string()),
                "tool": pa.array([tool] * n_per, pa.string()),
                "ts": pa.array([base] * n_per, pa.int64()).cast(pa.timestamp("us")),
            }
        )
        pq.write_table(t, f"{d}/part-{s:02d}.parquet")

    # Defined INSIDE the test so cloudpickle ships the class BY VALUE —
    # Ray workers can't import the tests/ module (it's pytest-only
    # sys.path), and a by-reference actor class stays 'pending' forever.
    class SwappingEnricher(en.Enricher):
        """Enricher that REWRITES the snapshot (pod-0's IP → new_ip) after
        swap_after batches — a deterministic stand-in for an external
        writer publishing a new snapshot mid-run.  The swap happens inside
        the worker process, after a batch completes; the next batch's
        refresh poll must observe it."""

        def __init__(self, cfg, snapshot_dir: str):
            super().__init__(cfg, store=snapshot_dir)
            self._snapshot_dir = snapshot_dir
            self._batches = 0

        def __call__(self, batch):
            out = super().__call__(batch)
            self._batches += 1
            if self._batches == swap_after:
                rows = dg.build_pods_table().to_pylist()
                for r in rows:
                    if r["namespace_name"] == "ns-0" and r["pod_name"] == "pod-0":
                        r["pod_ip"] = new_ip
                p = os.path.join(self._snapshot_dir, "pods.parquet")
                pq.write_table(
                    pa.Table.from_pylist(rows, schema=dg.build_pods_table().schema), p
                )
                st = os.stat(p)
                os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 2_000_000_000))
            return out

    cfg = PipelineConfig(snapshot_poll_s=0.0)  # poll before every batch
    ds = ray.data.read_parquet(sorted(f"{d}/{f}" for f in os.listdir(d)))
    parsed = parse_stage(ds, cfg)
    enriched = parsed.map_batches(
        SwappingEnricher,
        fn_constructor_kwargs={"cfg": cfg, "snapshot_dir": snap},
        batch_size=n_per,
        concurrency=1,  # one actor → deterministic batch sequence
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = en.decode_stage(enriched).to_pandas()

    assert len(out) == n_per * n_shards
    assert out["k8s_pod_id"].notna().all()  # every row enriched, no drops
    ips = out["k8s_pod_ip"].value_counts()
    # pre-swap batches pinned to v1, post-swap batches carry v2 — both
    # versions present, nothing served from a stale cache after the reload
    assert set(ips.index) == {"10.0.0.0", new_ip}
    assert ips["10.0.0.0"] == swap_after * n_per
    assert ips[new_ip] == (n_shards - swap_after) * n_per


def test_incremental_upsert_preserves_untouched_cache_entries(tmp_path):
    """VERDICT r3 task 3: a snapshot change to ONE pod must re-resolve only
    that key; every other key's pod/ns cache entry survives (zero store
    probes on the id-cache-hit path), unlike the old reload-plus-flush-all.
    No Ray involved — the Enricher is a plain callable."""
    from fluent_plugin_kubernetes_metadata_filter_ray.sources import metadata_store as ms

    snap = str(tmp_path / "snap-upsert")
    os.makedirs(snap)
    pq.write_table(dg.build_pods_table(), f"{snap}/pods.parquet")
    pq.write_table(dg.build_namespaces_table(), f"{snap}/namespaces.parquet")

    class CountingStore(ms.TableMetadataStore):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.pod_probes = 0
            self.ns_probes = 0

        def get_pod(self, namespace, pod):
            self.pod_probes += 1
            return super().get_pod(namespace, pod)

        def get_namespace(self, namespace):
            self.ns_probes += 1
            return super().get_namespace(namespace)

    def _bump_mtime(p):
        st = os.stat(p)
        os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 2_000_000_000))

    cfg = PipelineConfig(snapshot_poll_s=0.0)
    store = CountingStore(snap, cfg)
    e = en.Enricher(cfg, store=store)

    # warm two keys (separate pods + namespaces)
    le0, _, _ = e.get_pod_metadata_pair("k0", "ns-0", "pod-0", {})
    le1, _, _ = e.get_pod_metadata_pair("k1", "ns-1", "pod-1", {})
    assert le0["pod_ip"] == "10.0.0.0"
    old_ns1_id = le1["namespace_id"]

    # --- snapshot v2: pod-0's IP changes (watch-MODIFIED analog) ---------
    rows = dg.build_pods_table().to_pylist()
    for r in rows:
        if r["namespace_name"] == "ns-0" and r["pod_name"] == "pod-0":
            r["pod_ip"] = "9.9.9.9"
    p = f"{snap}/pods.parquet"
    pq.write_table(pa.Table.from_pylist(rows, schema=dg.build_pods_table().schema), p)
    _bump_mtime(p)

    probes = (store.pod_probes, store.ns_probes)
    e._maybe_refresh_snapshot()
    assert e.stats.counters.get("snapshot_reloads") == 1
    assert e.stats.counters.get("snapshot_upserts") == 1  # exactly one key

    le0b, _, _ = e.get_pod_metadata_pair("k0", "ns-0", "pod-0", {})
    le1b, _, _ = e.get_pod_metadata_pair("k1", "ns-1", "pod-1", {})
    # BOTH keys served without a single new store probe: the changed key
    # was upserted in place, the untouched key's entries survived
    assert (store.pod_probes, store.ns_probes) == probes
    assert le0b["pod_ip"] == "9.9.9.9"  # changed key re-resolved
    assert le1b == le1                   # untouched key identical

    # --- snapshot v3: ns-1 RECREATED (new uid) → targeted refetch --------
    nrows = dg.build_namespaces_table().to_pylist()
    for r in nrows:
        if r["name"] == "ns-1":
            r["uid"] = "f" * 32
    np_ = f"{snap}/namespaces.parquet"
    pq.write_table(
        pa.Table.from_pylist(nrows, schema=dg.build_namespaces_table().schema), np_
    )
    _bump_mtime(np_)

    e._maybe_refresh_snapshot()
    probes = (store.pod_probes, store.ns_probes)
    le0c, _, _ = e.get_pod_metadata_pair("k0", "ns-0", "pod-0", {})
    assert (store.pod_probes, store.ns_probes) == probes  # ns-0 untouched
    le1c, _, _ = e.get_pod_metadata_pair("k1", "ns-1", "pod-1", {})
    # recreated namespace: old id invalidated → exactly one ns refetch
    assert store.ns_probes == probes[1] + 1
    assert store.pod_probes == probes[0]
    assert le1c["namespace_id"] == "f" * 32 != old_ns1_id


def _bump(p):
    st = os.stat(p)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 2_000_000_000))


def test_watch_journal_coalesces_and_410_gone(tmp_path):
    """resourceVersion semantics (VERDICT r3 'missing' #2): the store keeps
    a bounded diff journal keyed by resource versions; a consumer replays
    coalesced per-key events since ITS version, and one further behind than
    the retention gets ResourceVersionGone — the 410 → restart-from-LIST
    ladder (watch_pods.rb:133-134,162-166,187-196)."""
    import pytest

    from fluent_plugin_kubernetes_metadata_filter_ray.sources import metadata_store as ms

    snap = str(tmp_path / "snap-journal")
    os.makedirs(snap)
    pq.write_table(dg.build_pods_table(), f"{snap}/pods.parquet")
    pq.write_table(dg.build_namespaces_table(), f"{snap}/namespaces.parquet")
    cfg = PipelineConfig()
    store = ms.TableMetadataStore(snap, cfg)
    rv0 = store.resource_version

    def rewrite_pod0(ip):
        rows = dg.build_pods_table().to_pylist()
        for r in rows:
            if r["namespace_name"] == "ns-0" and r["pod_name"] == "pod-0":
                r["pod_ip"] = ip
        p = f"{snap}/pods.parquet"
        pq.write_table(pa.Table.from_pylist(rows, schema=dg.build_pods_table().schema), p)
        _bump(p)

    # two generations: pod-0 → ip A, then ip B; a consumer at rv0 sees ONE
    # coalesced event (original → B)
    rewrite_pod0("1.1.1.1")
    store.reload_diff()
    rv1 = store.resource_version
    rewrite_pod0("2.2.2.2")
    store.reload_diff()
    pod_ev, ns_ev, rv = store.events_since(rv0)
    assert rv == store.resource_version and ns_ev == {}
    assert list(pod_ev) == [("ns-0", "pod-0")]
    old, new = pod_ev[("ns-0", "pod-0")]
    assert old["pod_ip"] == "10.0.0.0" and new["pod_ip"] == "2.2.2.2"
    # a consumer at rv1 sees only the second hop
    pod_ev1, _, _ = store.events_since(rv1)
    assert pod_ev1[("ns-0", "pod-0")][0]["pod_ip"] == "1.1.1.1"
    # a round-trip back to rv0's ORIGINAL value coalesces to no event
    rewrite_pod0("10.0.0.0")
    store.reload_diff()
    rewrite_pod0("3.3.3.3")
    store.reload_diff()
    rewrite_pod0("10.0.0.0")
    store.reload_diff()
    pod_rt, ns_rt, _ = store.events_since(rv0)
    assert pod_rt == {} and ns_rt == {}
    # age the journal past retention → Gone for rv0
    for i in range(ms.WATCH_JOURNAL_RETAIN + 1):
        rewrite_pod0(f"9.9.9.{i}")
        store.reload_diff()
    with pytest.raises(ms.ResourceVersionGone):
        store.events_since(rv0)


def test_enricher_410_gone_restarts_from_list(tmp_path):
    """An enrich actor whose resourceVersion fell out of the journal takes
    the restart-from-LIST ladder: full cache flush + watch_gone_restarts
    counter, then serves the NEW metadata."""
    from fluent_plugin_kubernetes_metadata_filter_ray.sources import metadata_store as ms

    snap = str(tmp_path / "snap-gone")
    os.makedirs(snap)
    pq.write_table(dg.build_pods_table(), f"{snap}/pods.parquet")
    pq.write_table(dg.build_namespaces_table(), f"{snap}/namespaces.parquet")
    cfg = PipelineConfig(snapshot_poll_s=0.0)
    store = ms.TableMetadataStore(snap, cfg)
    e = en.Enricher(cfg, store=store)
    le0, _, _ = e.get_pod_metadata_pair("k0", "ns-0", "pod-0", {})
    assert le0["pod_ip"] == "10.0.0.0"

    def rewrite_pod0(ip):
        rows = dg.build_pods_table().to_pylist()
        for r in rows:
            if r["namespace_name"] == "ns-0" and r["pod_name"] == "pod-0":
                r["pod_ip"] = ip
        p = f"{snap}/pods.parquet"
        pq.write_table(pa.Table.from_pylist(rows, schema=dg.build_pods_table().schema), p)
        _bump(p)

    # the SHARED store advances past the retention window without this
    # consumer polling (other consumers drove reload_diff)
    for i in range(ms.WATCH_JOURNAL_RETAIN + 2):
        rewrite_pod0(f"8.8.8.{i}")
        store.reload_diff()
    # one more on-disk change so the poll sees changed() — the journal no
    # longer reaches the enricher's last_seen_rv → Gone → flush-all
    rewrite_pod0("7.7.7.7")
    e._maybe_refresh_snapshot()
    assert e.stats.counters.get("watch_gone_restarts") == 1
    assert len(e.pod_cache) == 0 and len(e.id_cache) == 0
    le0b, _, _ = e.get_pod_metadata_pair("k0", "ns-0", "pod-0", {})
    assert le0b["pod_ip"] == "7.7.7.7"
