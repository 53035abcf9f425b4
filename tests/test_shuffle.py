"""Salted two-stage shuffle equals the unsalted result (skew handling)."""

import pandas as pd


def test_salted_groupby_sum_matches_unsalted(ray_session):
    import ray.data
    from ray.data.aggregate import Sum
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.shuffle import (
        salted_groupby_sum,
    )

    # skewed: one hot key holds ~50% of rows
    n = 20_000
    rows = {"k": ["hot" if i % 2 == 0 else f"k{i % 37}" for i in range(n)],
            "v": list(range(n))}
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(8)

    salted = salted_groupby_sum(ds, "k", ["v"], k=16).to_pandas()
    plain = (
        ray.data.from_pandas(pd.DataFrame(rows)).groupby("k")
        .aggregate(Sum("v", alias_name="v")).to_pandas()
    )
    s = salted.sort_values("k").reset_index(drop=True)
    u = plain.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(s, u)


def test_cli_run_smoke(ray_session, capsys):
    from fluent_plugin_kubernetes_metadata_filter_ray import cli

    # ray_session owns Ray; cli's guarded init must not re-init or shut down
    # another session — monkeypatch-free: call through main with counts-only
    rc = cli.main(["run", "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "role" in out and "n_turns" in out


def test_hash_shuffle_empty_block_patch(ray_session):
    """Joins whose inputs contain empty blocks must not lose the schema
    broadcast (Ray 2.49 race: an empty FIRST block burns the one-shot
    broadcast without typing the aggregators, and acero then rejects the
    key refs for any partition that stays empty — state/raypatch.py)."""
    import pyarrow as pa
    import ray.data as rd
    from fluent_plugin_kubernetes_metadata_filter_ray.state import raypatch

    assert raypatch._applied

    def keep_seven(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t.column("id"), 7))

    # 15 of 16 left blocks come out empty; whichever arrives first, the
    # join must still type every partition and produce the one match
    left = rd.range(16, override_num_blocks=16).map_batches(
        keep_seven, batch_format="pyarrow", zero_copy_batch=True
    )
    right = rd.from_arrow(pa.table({"id": pa.array([7, 9], pa.int64()),
                                    "v": pa.array([70, 90], pa.int64())}))
    out = left.join(right, join_type="inner", num_partitions=4,
                    on=("id",)).to_pandas()
    assert out.to_dict("records") == [{"id": 7, "v": 70}]


def test_cli_analyze_smoke(ray_session, capsys):
    from fluent_plugin_kubernetes_metadata_filter_ray import cli

    rc = cli.main(["analyze", "--list"])
    assert rc == 0
    names = capsys.readouterr().out.split()
    assert "q_log_templates" in names and "q_source_overlap" in names

    rc = cli.main(
        ["analyze", "q_route_counts", "--sf-dir", "/root/testdata/sf0.001"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "role" in out and "n_turns" in out

    assert cli.main(["analyze", "q_no_such"]) == 2
