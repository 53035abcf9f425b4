"""Resumable-run protocol: crash mid-run, resume, skip committed shards,
identical final counts vs a straight run (SURVEY.md §7.1 step 7)."""

import json
import os

import pytest


@pytest.fixture(scope="module")
def sharded_sf(sf_dir):
    """sf0.001 derived at rep=4 so the transcript cache has multiple shard
    files (4000 rows → 1 file at 65536 rows/shard... force small shards by
    using files_per_shard=1 over whatever exists)."""
    return sf_dir


def test_resume_skips_committed_shards(ray_session, sharded_sf, tmp_path, duck):
    from fluent_plugin_kubernetes_metadata_filter_ray.state import checkpoint as cpt
    from fluent_plugin_kubernetes_metadata_filter_ray import datagen as dg

    # ensure ≥2 shards: 8000 rows at 2048 rows/file → 4 shard files
    tdir = dg.transcripts_path(sharded_sf, rep=8, shard_rows=2048)
    n_files = len([f for f in os.listdir(tdir) if f.endswith(".parquet")])
    assert n_files >= 2

    out1 = str(tmp_path / "resumable")
    with pytest.raises(RuntimeError, match="injected failure"):
        cpt.run_resumable(sharded_sf, out1, rep=8, files_per_shard=1, fail_after=1,
                          shard_rows=2048)
    manifests = [f for f in os.listdir(out1) if f.startswith("_manifest")]
    assert len(manifests) == 1  # one committed shard, crash before the rest

    summary = cpt.run_resumable(sharded_sf, out1, rep=8, files_per_shard=1,
                                shard_rows=2048)
    assert summary["skipped"] == [0]
    assert len(summary["ran"]) == n_files - 1

    # straight run equals the resumed run's rollup
    out2 = str(tmp_path / "straight")
    straight = cpt.run_resumable(sharded_sf, out2, rep=8, files_per_shard=1,
                                 shard_rows=2048)
    assert straight["route_counts"] == summary["route_counts"]
    total = sum(c["n_turns"] for c in summary["route_counts"].values())
    with open(os.path.join(out1, "_manifest_shard_00000.json")) as f:
        man = json.load(f)
    assert set(man) >= {"shard", "input_files", "rows_in", "rows_out",
                        "route_counts", "snapshot", "wall_s"}
    assert man["rows_in"] == man["rows_out"]
    assert total == 8000  # rep=8 × 1000 rows at sf0.001
