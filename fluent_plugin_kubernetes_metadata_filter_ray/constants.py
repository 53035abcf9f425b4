"""Shared deterministic constants for the synthetic transcript corpus and
its metadata snapshot.

Everything here has an exact SQL twin in :mod:`..datagen` (the DuckDB oracle
builder) — change one side and you must change the other.  The corpus mirrors
the reference test fixtures of fluent-plugin-kubernetes_metadata_filter
(`test/plugin/test_filter_kubernetes_metadata.rb:27-28` tag grammars,
`test/cassettes/kubernetes_get_pod.yml` pod object shape) but is generated
from the driver's ``events.parquet`` — no external data.
"""

from __future__ import annotations

import hashlib

# ---------------------------------------------------------------------------
# Key space: which namespaces / pods exist in the metadata snapshot.
#
#   ns-0 .. ns-5   : exist, old creation ts, contain pods pod-0..pod-39
#   ns-6           : exists, *newer* creation ts (2024-01-15) — pods never
#                    found there → exercises the namespace-age comparison
#                    (deleted-pod vs recreated-namespace,
#                    kubernetes_metadata_cache_strategy.rb:49-57)
#   ns-7           : absent everywhere → orphan path
#                    (kubernetes_metadata_cache_strategy.rb:66-79)
# ---------------------------------------------------------------------------
N_NS_TOTAL = 8          # tags reference ns-0..ns-7
N_NS_WITH_META = 7      # ns-0..ns-6 in namespaces snapshot
N_NS_WITH_PODS = 6      # ns-0..ns-5 have pods
N_POD_TOTAL = 50        # tags reference pod-0..pod-49
N_POD_WITH_META = 40    # pod-0..pod-39 in pods snapshot

CONTAINER_NAME = "app"

NS_CREATION_OLD = "2023-12-01 00:00:00"     # ns-0..ns-5
NS_CREATION_RECREATED = "2024-01-15 00:00:00"  # ns-6 (mid event-ts range)

MASTER_URL = "https://kubernetes.default.svc"
ORPHANED_NAMESPACE_NAME = ".orphaned"
ORPHANED_NAMESPACE_ID = "orphaned"

# event_type → role routing key
ROLE_MAP = {
    "click": "user",
    "view": "assistant",
    "purchase": "tool",
    "error": "tool",
    "signup": "system",
}
ROLES = ("user", "assistant", "tool", "system")

# Row-mix rules, all functions of event_id `e` (and user_id `u`):
#   e % 10 == 9          → tool = 'non-kubernetes' (pass-through row)
#   e % 2  == 0          → /var/log/containers tag form, else /var/log/pods
#   e % 20 == 7          → text is a JSON blob with kubernetes/docker fields
#                          (lookup_from_k8s_field override path,
#                          filter_kubernetes_metadata.rb:384-400)
#   ns_idx = u % 8, pod_idx = e % 50        (tag-derived keys)
#   field ns_idx = e % 6, field pod_idx = e % 40   (JSON-field keys, always found)
NONMATCH_MOD = 10
NONMATCH_REM = 9
K8SFIELD_MOD = 20
K8SFIELD_REM = 7

# Store-content quirks (both exercised by reference cassettes):
#   pod_idx % 10 == 3 → container image_id is ''  → no container_image_id key
#                       (kubernetes_get_pod_container_init.yml:137)
#   pod_idx % 10 == 4 → containerID is ''         → docker.container_id not
#                       overridden; dropped entirely for pods-form tags
#                       (filter_kubernetes_metadata.rb:358-360)
EMPTY_IMAGE_ID_REM = 3
EMPTY_CONTAINER_ID_REM = 4


def md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# --- deterministic entity attributes (Python side; SQL twins in datagen) ---

def ns_name(ns_idx: int) -> str:
    return f"ns-{ns_idx}"


def pod_name(pod_idx: int) -> str:
    return f"pod-{pod_idx}"


def namespace_id(ns: str) -> str:
    return md5("nsid:" + ns)


def pod_id(ns: str, pod: str) -> str:
    return md5("podid:" + ns + "/" + pod)


def pod_uuid(ns: str, pod: str) -> str:
    return md5("uuid:" + ns + "/" + pod)


def tag_docker_id(ns: str, pod: str) -> str:
    """64-hex id embedded in the /var/log/containers tag."""
    return md5(ns + "/" + pod) + md5(pod + "@" + ns)


def store_container_id(ns: str, pod: str) -> str:
    """containerID held in the pod snapshot (differs from the tag id so the
    containers-lookup override at filter_kubernetes_metadata.rb:346-349 is
    observable)."""
    return md5("cid:" + ns + "/" + pod) + md5("cid2:" + ns + "/" + pod)


def container_image(pod_idx: int) -> str:
    return f"img/app:v{pod_idx % 5}"


def container_image_id(pod: str, pod_idx: int) -> str:
    return "" if pod_idx % 10 == EMPTY_IMAGE_ID_REM else "sha256:" + md5("img:" + pod)


def pod_labels_json(pod: str) -> str:
    return '{"app":"' + pod + '","tier":"backend"}'


def pod_annotations_matched_json(pod: str) -> str:
    """After the default annotation_match ['^custom\\..+'] filter."""
    return '{"custom.field1":"cf-' + pod + '"}'


def ns_labels_json(ns: str) -> str:
    return '{"tenant":"t-' + ns + '"}'


def ns_annotations_matched_json(ns: str) -> str:
    return '{"custom.ns":"cns-' + ns + '"}'
