"""Benchmark harness — prints ONE JSON line for the driver.

Headline: end-to-end parse → enrich → route throughput (turns/sec) over the
derived transcripts table at $GRAFT_SF_DIR (default sf0.1), replicated
KMETA_BENCH_REP× (default 10 → ~1M turns) to give the streaming executor
real work.  ``--scaling`` runs the identical job in fresh processes at
num_cpus=8 and num_cpus=32 and reports both throughputs + scaling
efficiency (the sandbox stand-in for the N vs 4N node criterion in
BASELINE.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REP = int(os.environ.get("KMETA_BENCH_REP", "10"))


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from fluent_plugin_kubernetes_metadata_filter_ray import datagen as dg
    from fluent_plugin_kubernetes_metadata_filter_ray.pipelines import flagship
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.aggregate import route_counts

    # warm: derive+cache transcripts and the metadata snapshot; prime OS page
    # cache so we measure compute, not first-touch disk reads
    tpath = dg.transcripts_path(SF_DIR, rep=REP)
    dg.metadata_snapshot_dir()
    for name in os.listdir(tpath):
        with open(os.path.join(tpath, name), "rb") as f:
            while f.read(1 << 24):
                pass
    # spin up the Ray worker pool so q1 doesn't pay process-fork latency
    import ray.data as rd

    rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        lambda b: b
    ).count()

    queries: dict[str, float] = {}

    # q1: parse-only throughput (count consumes the stream distributed)
    t0 = time.perf_counter()
    from fluent_plugin_kubernetes_metadata_filter_ray.config import DEFAULT_CONFIG
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.parse import parse_stage

    n_rows = parse_stage(flagship.read_transcripts(SF_DIR, rep=REP), DEFAULT_CONFIG).count()
    queries["parse_only"] = time.perf_counter() - t0

    # q2: parse+enrich
    t0 = time.perf_counter()
    flagship.build_enriched(SF_DIR, rep=REP).count()
    queries["parse_enrich"] = time.perf_counter() - t0

    # q3 (headline): parse+enrich+route write+per-sink counts
    out_dir = f"/tmp/kmeta_bench_out/cpus{NUM_CPUS}"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    counts = flagship.run_flagship(SF_DIR, out_dir=out_dir, rep=REP).to_pandas()
    headline = time.perf_counter() - t0
    queries["flagship_e2e"] = headline
    assert int(counts["n_turns"].sum()) == n_rows

    ray.shutdown()
    return {
        "metric": "flagship parse→enrich→route e2e",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": SF_DIR,
        "rep": REP,
        "rows": n_rows,
        "turns_per_sec": round(n_rows / headline, 1),
        "num_cpus": NUM_CPUS,
    }


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    return {
        "metric": "scaling efficiency (num_cpus 8 → 32)",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "turns_per_sec_8": lo["turns_per_sec"],
        "turns_per_sec_32": hi["turns_per_sec"],
        "rows": hi["rows"],
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    result = run_scaling() if "--scaling" in sys.argv else run_bench()
    print(json.dumps(result))
