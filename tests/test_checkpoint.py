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


def test_shard_rerun_after_mid_write_crash(ray_session, sharded_sf, tmp_path):
    """A crash mid-write leaves partial sink files but no manifest; the
    shard re-run must clear them (route_write clears the shard dir), not
    append fresh UUID-named files alongside — else counts inflate."""
    import glob
    import shutil

    from fluent_plugin_kubernetes_metadata_filter_ray.state import checkpoint as cpt

    out = str(tmp_path / "midwrite")
    straight = cpt.run_resumable(sharded_sf, out, rep=8, files_per_shard=1,
                                 shard_rows=2048)

    # simulate shard 0 having crashed mid-write on a previous attempt:
    # drop its commit marker and plant a leftover partial file (a duplicate
    # of a real sink file, under a name a fresh write would never reuse)
    os.remove(os.path.join(out, "_manifest_shard_00000.json"))
    sink_files = glob.glob(os.path.join(out, "shard=00000", "role=*", "*.parquet"))
    assert sink_files
    shutil.copy(sink_files[0], sink_files[0] + ".crashed_attempt.parquet")

    resumed = cpt.run_resumable(sharded_sf, out, rep=8, files_per_shard=1,
                                shard_rows=2048)
    assert resumed["ran"] == [0]
    assert resumed["route_counts"] == straight["route_counts"]
    leftovers = glob.glob(os.path.join(out, "shard=00000", "role=*",
                                       "*.crashed_attempt.parquet"))
    assert leftovers == []  # the re-run cleared the crashed attempt's files


def test_flagship_out_dir_rewrite_not_additive(ray_session, sf_dir):
    """Two runs into the same out_dir must not double-count (route_write
    clears the sink dir before writing)."""
    import shutil
    import tempfile

    from fluent_plugin_kubernetes_metadata_filter_ray.pipelines import flagship

    out = tempfile.mkdtemp(prefix="kmeta_sink_reuse_")
    try:
        c1 = flagship.run_flagship(sf_dir, out_dir=out).to_pandas()
        c2 = flagship.run_flagship(sf_dir, out_dir=out).to_pandas()
        key = lambda df: df.sort_values("role").reset_index(drop=True)
        assert key(c1).equals(key(c2))
        assert int(c2["n_turns"].sum()) == 1000  # sf0.001 row count, not 2000
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_transcripts_cache_migration_no_duplicates(sf_dir):
    """A pre-upgrade cache dir (single transcripts.parquet, no .done marker)
    must be replaced by the fresh derivation, not merged with it."""
    import shutil

    import pyarrow.parquet as pq

    from fluent_plugin_kubernetes_metadata_filter_ray import datagen as dg

    tag_dir = os.path.join(dg.CACHE_ROOT, "transcripts_sf0.001_rep2_s1999")
    shutil.rmtree(tag_dir, ignore_errors=True)
    for p in (tag_dir + ".done", tag_dir + ".deriving"):
        shutil.rmtree(p, ignore_errors=True) if os.path.isdir(p) else (
            os.remove(p) if os.path.exists(p) else None)
    # plant the old layout: a populated dir with no .done marker
    os.makedirs(tag_dir)
    stale = dg.derive_transcripts(os.path.join(sf_dir, "events.parquet"), rep=2)
    pq.write_table(stale, os.path.join(tag_dir, "transcripts.parquet"))

    out = dg.transcripts_path(sf_dir, rep=2, shard_rows=1999)
    n = sum(pq.ParquetFile(os.path.join(out, f)).metadata.num_rows
            for f in os.listdir(out) if f.endswith(".parquet"))
    assert n == 2000  # fresh shards only — the stale single file is gone
    shutil.rmtree(tag_dir, ignore_errors=True)
    os.remove(tag_dir + ".done")


def test_incremental_shard_ingestion(ray_session, sf_dir, tmp_path):
    """VERDICT r2 task 6 — the in_tail pos-file analog: appending transcript
    shards to a COMPLETED run processes ONLY the new shards (committed
    manifests skipped), the rollup stays additive, and a shard whose
    content changed under a committed manifest is re-run, never silently
    skipped."""
    import shutil

    import pyarrow.parquet as pq

    from fluent_plugin_kubernetes_metadata_filter_ray import datagen as dg
    from fluent_plugin_kubernetes_metadata_filter_ray.state import checkpoint as cpt

    src = dg.transcripts_path(sf_dir, rep=8, shard_rows=2048)
    files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    assert len(files) >= 4
    land = str(tmp_path / "landing")
    os.makedirs(land)
    for f in files[:3]:
        shutil.copy(os.path.join(src, f), os.path.join(land, f))

    out = str(tmp_path / "incr")
    s1 = cpt.run_resumable(sf_dir, out, files_per_shard=1, transcripts_dir=land)
    assert len(s1["ran"]) == 3 and s1["skipped"] == []
    rows3 = sum(
        pq.ParquetFile(os.path.join(land, f)).metadata.num_rows for f in files[:3]
    )
    assert sum(c["n_turns"] for c in s1["route_counts"].values()) == rows3

    # a new shard lands: only it runs; counts become the 4-file total
    shutil.copy(os.path.join(src, files[3]), os.path.join(land, files[3]))
    s2 = cpt.run_resumable(sf_dir, out, files_per_shard=1, transcripts_dir=land)
    assert s2["ran"] == [3]
    assert s2["skipped"] == [0, 1, 2]
    rows4 = rows3 + pq.ParquetFile(os.path.join(src, files[3])).metadata.num_rows
    assert sum(c["n_turns"] for c in s2["route_counts"].values()) == rows4

    # shard 0's content changes under its committed manifest (row count
    # differs): the stale manifest is invalidated and the shard re-runs
    f0 = os.path.join(land, files[0])
    t0 = pq.read_table(f0)
    pq.write_table(t0.slice(0, t0.num_rows // 2), f0)
    s3 = cpt.run_resumable(sf_dir, out, files_per_shard=1, transcripts_dir=land)
    assert s3["ran"] == [0]
    assert s3["skipped"] == [1, 2, 3]


def test_manifest_invalidated_by_content_change_same_rows(ray_session, sf_dir, tmp_path):
    """Code-review r3: a shard rewritten with the SAME row count (a
    re-derived cache changes text under the same name) must still
    invalidate its manifest — the per-file (size, mtime) fingerprint
    catches what the row-count check cannot."""
    import shutil

    import pyarrow.parquet as pq

    from fluent_plugin_kubernetes_metadata_filter_ray import datagen as dg
    from fluent_plugin_kubernetes_metadata_filter_ray.state import checkpoint as cpt

    src = dg.transcripts_path(sf_dir, rep=8, shard_rows=2048)
    files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))[:2]
    land = str(tmp_path / "landing2")
    os.makedirs(land)
    for f in files:
        shutil.copy(os.path.join(src, f), os.path.join(land, f))

    out = str(tmp_path / "fp")
    s1 = cpt.run_resumable(sf_dir, out, files_per_shard=1, transcripts_dir=land)
    assert len(s1["ran"]) == 2

    # rewrite shard 0 with identical rows but different content
    f0 = os.path.join(land, files[0])
    t0 = pq.read_table(f0)
    import pyarrow.compute as pc

    t0 = t0.set_column(
        t0.column_names.index("text"), "text",
        pc.binary_join_element_wise(t0.column("text"), "!", ""),
    )
    pq.write_table(t0, f0)
    assert pq.ParquetFile(f0).metadata.num_rows == t0.num_rows  # rows unchanged

    s2 = cpt.run_resumable(sf_dir, out, files_per_shard=1, transcripts_dir=land)
    assert s2["ran"] == [0]
    assert s2["skipped"] == [1]
