"""Unit tests of the snapshot projections and parse grammars — the
reference filter-test scenarios that don't need Ray
(test_filter_kubernetes_metadata.rb: no-API-server :519-533, dot-in-pod-name
:560-584, ownerrefs :891-933, annotation_match no-match :602-725, skip flags
:779-889; parse_pod_metadata at kubernetes_metadata_common.rb:54-110)."""

import pyarrow as pa
import pytest

from fluent_plugin_kubernetes_metadata_filter_ray.config import PipelineConfig
from fluent_plugin_kubernetes_metadata_filter_ray.sources.metadata_store import (
    project_namespace,
    project_pod,
)
from fluent_plugin_kubernetes_metadata_filter_ray.stages.enrich import Enricher
from fluent_plugin_kubernetes_metadata_filter_ray.stages.parse import TagParser

POD_ROW = {
    "namespace_name": "default",
    "pod_name": "fabric8-console-controller-98rqc",
    "uid": "c76927af-f563-11e4-b32d-54ee7527188d",
    "creation_ts": None,
    "labels": {"component": "fabric8Console"},
    "annotations": {"custom.field1": "v1", "other/ann": "v2"},
    "node_name": "jimmi-redhat.localnet",
    "pod_ip": "172.17.0.8",
    "owner_refs": [{"kind": "ReplicaSet", "name": "rs-1"}],
    "container_statuses": [
        {
            "name": "fabric8-console-container",
            "image": "fabric8/hawtio-kubernetes:latest",
            "image_id": "docker://b2bd1a24a68356b2f30128e6e28e672c1ef92df0d9ec01ec0c7faea5d77d2303",
            "container_id": "docker://49095a2894da899d3b327c5fde1e056a81376cc9a8f8b09a195f2a92bceed459",
        }
    ],
}


def test_project_pod_strips_runtime_prefix_and_maps_fields():
    cfg = PipelineConfig()
    m = project_pod(POD_ROW, cfg)
    c = m["containers"]["fabric8-console-container"]
    # containerID prefix strip (kubernetes_metadata_common.rb:64)
    assert c["containerID"] == "49095a2894da899d3b327c5fde1e056a81376cc9a8f8b09a195f2a92bceed459"
    assert m["pod_id"] == POD_ROW["uid"]
    assert m["host"] == "jimmi-redhat.localnet"
    # annotation_match default '^custom\..+' keeps only custom.field1
    assert m["annotations_json"] == '{"custom.field1":"v1"}'
    assert "ownerrefs_json" not in m  # include_ownerrefs_metadata off by default


def test_project_pod_ownerrefs_and_skip_flags():
    m = project_pod(POD_ROW, PipelineConfig(include_ownerrefs_metadata=True))
    assert m["ownerrefs_json"] == '[{"kind":"ReplicaSet","name":"rs-1"}]'
    m2 = project_pod(POD_ROW, PipelineConfig(skip_labels=True, skip_container_metadata=True,
                                             skip_master_url=True))
    assert "labels_json" not in m2 and "master_url" not in m2
    assert m2["containers"]["fabric8-console-container"] == {"name": "fabric8-console-container"}


def test_project_pod_annotation_no_match_drops_key():
    m = project_pod(POD_ROW, PipelineConfig(annotation_match=(r"^nope\..+",)))
    assert "annotations_json" not in m  # empty → key absent (common.rb:106-108)


def test_project_namespace_dedot():
    row = {"name": "ns-a", "uid": "u1", "creation_ts": None,
           "labels": {"a.b/c": "x"}, "annotations": {"custom.k": "v"}}
    m = project_namespace(row, PipelineConfig(de_dot=True))
    assert m["namespace_labels_json"] == '{"a_b/c":"x"}'
    assert m["namespace_annotations_json"] == '{"custom_k":"v"}'


def _parse_one(tool, cfg=None):
    cfg = cfg or PipelineConfig()
    batch = pa.table({
        "tool": pa.array([tool], pa.string()),
        "text": pa.array(["x"], pa.string()),
    })
    out = TagParser(cfg)(batch)
    return {c: out.column(c)[0].as_py() for c in out.column_names}


def test_parse_dot_in_pod_name():
    # test_filter_kubernetes_metadata.rb:560-584
    r = _parse_one("var.log.containers.fabric8.console-controller-98rqc_default_"
                   "fabric8-console-container-" + "9" * 64 + ".log")
    assert r["pod_name"] == "fabric8.console-controller-98rqc"
    assert r["namespace"] == "default"
    assert r["container_name"] == "fabric8-console-container"
    assert r["docker_id"] == "9" * 64


def test_parse_pods_form_with_dotted_container_index():
    r = _parse_one("var.log.pods.default_pod-1_abcd-ef.app.0.log")
    assert r["namespace"] == "default" and r["pod_name"] == "pod-1"
    assert r["pod_uuid"] == "abcd-ef" and r["container_name"] == "app"
    assert r["cache_key"] == "abcd-ef"


def test_no_metadata_store_gives_tag_only_metadata():
    # kubernetes_url=None → no API server configured: tag-derived fields only
    # (test_filter_kubernetes_metadata.rb:519-533)
    cfg = PipelineConfig(kubernetes_url=None)
    e = Enricher(cfg, store=None)
    le, gt, _ = e.metadata_for_key("ns-a", "pod-x", "app", "key1", "d" * 64, {})
    assert gt is le or gt == le
    assert le["k8s_namespace_name"] == "ns-a"
    assert le["k8s_pod_name"] == "pod-x"
    assert le["k8s_container_name"] == "app"
    assert le["container_id"] == "d" * 64
    assert le["k8s_pod_id"] is None and le["k8s_namespace_id"] is None


def test_empty_container_id_drops_docker_block():
    # M11: pods-form tag (no docker_id) + no store → container_id null
    cfg = PipelineConfig(kubernetes_url=None)
    e = Enricher(cfg, store=None)
    le, _, _ = e.metadata_for_key("ns-a", "pod-x", "app", "uuid-1", None, {})
    assert le["container_id"] is None
