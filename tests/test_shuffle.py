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
