"""Property-based round-trip of the tag grammars: for any valid component
tuple, formatting a tag in either grammar and parsing it back recovers the
components exactly (the reference pins this only pointwise via fixtures;
hypothesis sweeps the component space)."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from fluent_plugin_kubernetes_metadata_filter_ray.config import PipelineConfig
from fluent_plugin_kubernetes_metadata_filter_ray.stages.parse import TagParser

# DNS-1123-ish label: lowercase alnum with inner dashes (no leading/trailing
# dash), as the reference grammar requires for pod names
_label = st.from_regex(r"[a-z0-9]([-a-z0-9]{0,10}[a-z0-9])?", fullmatch=True)
# pod names may be dot-joined labels (test_filter_kubernetes_metadata.rb:560-584)
_pod = st.lists(_label, min_size=1, max_size=3).map(".".join)
_ns = st.from_regex(r"[a-z0-9-]{1,12}", fullmatch=True)
_container = st.from_regex(r"[a-z0-9][a-z0-9-]{0,10}", fullmatch=True)
_hex64 = st.from_regex(r"[a-f0-9]{64}", fullmatch=True)
_uuid = st.from_regex(r"[a-z0-9-]{1,36}", fullmatch=True)

_parser = TagParser(PipelineConfig())


def _parse_one(tool: str) -> dict:
    out = _parser(
        pa.table({"tool": pa.array([tool], pa.string()),
                  "text": pa.array(["x"], pa.string())})
    )
    return {c: out.column(c)[0].as_py() for c in out.column_names}


@settings(max_examples=150, deadline=None)
@given(ns=_ns, pod=_pod, container=_container, did=_hex64)
def test_containers_grammar_roundtrip(ns, pod, container, did):
    r = _parse_one(f"var.log.containers.{pod}_{ns}_{container}-{did}.log")
    assert r["namespace"] == ns
    assert r["pod_name"] == pod
    # container_name is greedy up to the LAST '-<64hex>' — a container name
    # itself ending in -<64hex> would shift the split; excluded by length
    assert r["container_name"] == container
    assert r["docker_id"] == did
    assert r["cache_key"] == did
    assert r["matched"] == 1


@settings(max_examples=150, deadline=None)
@given(ns=_ns, pod=_pod, container=_container, uuid=_uuid, idx=st.integers(0, 9))
def test_pods_grammar_roundtrip(ns, pod, container, uuid, idx):
    # namespace must not contain '_' (grammar: [^_]+) — _ns already can't
    r = _parse_one(f"var.log.pods.{ns}_{pod}_{uuid}.{container}.{idx}.log")
    assert r["namespace"] == ns
    assert r["pod_name"] == pod
    assert r["container_name"] == container
    assert r["pod_uuid"] == uuid
    assert r["cache_key"] == uuid
    assert r["docker_id"] is None
    assert r["matched"] == 1
