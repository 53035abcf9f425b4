"""Per-actor metric counters, mirroring KubernetesMetadata::Stats
(kubernetes_metadata_stats.rb:24-59) and its NoOp variant
(filter_kubernetes_metadata.rb:187-190).

Counters are held per enrich actor and merged driver-side (SURVEY.md §2.5
A1): each actor emits its counter dict into partition manifests / the
metrics checkpoint; merging is a plain dict-sum.
"""

from __future__ import annotations

from collections import Counter


class Stats:
    def __init__(self) -> None:
        self.counters: Counter[str] = Counter()

    def bump(self, key: str, by: int = 1) -> None:
        self.counters[key] += by

    def set(self, key: str, value: int) -> None:
        self.counters[key] = value

    def to_dict(self) -> dict[str, int]:
        return dict(self.counters)

    def merge(self, other: "Stats | dict[str, int]") -> "Stats":
        self.counters.update(other.counters if isinstance(other, Stats) else other)
        return self


class NoOpStats(Stats):
    def bump(self, key: str, by: int = 1) -> None:
        pass

    def set(self, key: str, value: int) -> None:
        pass


def merge_counter_dicts(dicts) -> dict[str, int]:
    total: Counter[str] = Counter()
    for d in dicts:
        total.update(d)
    return dict(total)


def dump_counters(dump_dir: str, actor_id: str, counters: dict[str, int]) -> None:
    """Atomic per-actor counter snapshot (dump_stats analog,
    filter_kubernetes_metadata.rb:131-144 — the log line becomes a JSON
    file; last write wins per actor, so files hold totals, not deltas)."""
    import json
    import os

    os.makedirs(dump_dir, exist_ok=True)
    path = os.path.join(dump_dir, f"stats_{actor_id}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(counters, f)
    os.replace(tmp, path)


def collect_dumped_counters(dump_dir: str) -> dict[str, int]:
    """Merge every actor's last snapshot into cluster totals."""
    import json
    import os

    dicts = []
    if os.path.isdir(dump_dir):
        for name in sorted(os.listdir(dump_dir)):
            if name.startswith("stats_") and name.endswith(".json"):
                with open(os.path.join(dump_dir, name)) as f:
                    dicts.append(json.load(f))
    return merge_counter_dicts(dicts)
