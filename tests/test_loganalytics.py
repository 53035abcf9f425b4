"""Semantic + hostile-row tests for the log-analytics operator family
(stages/loganalytics.py): template mining, role transitions, hopping
windows, burst detection.  Oracle equality is covered by the driver gate
(.claude/skills/verify/scripts/driver_check.py); here we pin the semantics
on hand-built tables where the expected answer is computable by eye."""

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name, table):
    d = str(tmp_path / name)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    pq.write_table(table, f"{d}/part-0.parquet")
    return d


def _ts(s):
    return pd.Timestamp(s)


def test_log_templates_semantics(ray_session, tmp_path):
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
        log_templates,
    )

    t = pa.table(
        {
            "conv_id": pa.array(["c2", "c1", "c1", None, "c3"], pa.string()),
            "role": pa.array(["user", "user", "user", "user", None], pa.string()),
            "text": pa.array(
                [
                    "req 123 from 0123456789abcdef0123 done",
                    "req 77 from aaaaaaaaaaaaaaaaaaaa done",
                    "req 123 from 0123456789abcdef0123 done",
                    "req 9 from bbbbbbbbbbbbbbbbbbbb done",
                    None,
                ],
                pa.string(),
            ),
        }
    )
    d = _write(tmp_path, "tpl", t)
    out = (
        log_templates(ray.data.read_parquet(d))
        .to_pandas()
        .sort_values(["role", "template"], na_position="last")
        .reset_index(drop=True)
    )
    # all four texts collapse to one template; the null text/role row is its
    # own SQL-style group
    assert len(out) == 2
    main = out.iloc[0]
    assert main["template"] == "req <num> from <hex> done"
    assert main["n_turns"] == 4
    # distinct convs exclude the null conv_id (SQL count(DISTINCT ...))
    assert main["n_convs"] == 2
    assert main["example_conv"] == "c1"
    nullg = out.iloc[1]
    assert pd.isna(nullg["role"]) and pd.isna(nullg["template"])
    assert nullg["n_turns"] == 1 and nullg["n_convs"] == 1


def test_role_transitions_semantics(ray_session, tmp_path):
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
        role_transitions,
    )

    ts = pa.array([_ts("2024-01-01")] * 5, pa.timestamp("us"))
    t = pa.table(
        {
            "conv_id": pa.array(["a", "a", "a", "b", "b"], pa.string()),
            # conv a arrives out of order: sorted by turn_idx the roles are
            # user → tool → assistant
            "turn_idx": pa.array([2, 0, 1, 0, 1], pa.int32()),
            "role": pa.array(["assistant", "user", "tool", "user", None], pa.string()),
            "ts": ts,
        }
    )
    d = _write(tmp_path, "trans", t)
    out = role_transitions(ray.data.read_parquet(d)).to_pandas()
    got = {
        (r["from_role"] if pd.notna(r["from_role"]) else None,
         r["to_role"] if pd.notna(r["to_role"]) else None): r["n_pairs"]
        for _, r in out.iterrows()
    }
    assert got == {("user", "tool"): 1, ("tool", "assistant"): 1, ("user", None): 1}


def test_turn_hopping_semantics(ray_session, tmp_path):
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
        N_HOPS,
        turn_hopping,
    )

    t = pa.table(
        {
            "ts": pa.array(
                [_ts("2024-01-01 10:05"), _ts("2024-01-01 10:40"), None],
                pa.timestamp("us"),
            ),
        }
    )
    d = _write(tmp_path, "hop", t)
    out = turn_hopping(ray.data.read_parquet(d)).to_pandas()
    # every turn (incl. the null-ts one, under the null window) lands in
    # exactly N_HOPS windows
    assert out["n_turns"].sum() == 3 * N_HOPS
    nullw = out[out["w_start"].isna()]
    assert len(nullw) == 1 and nullw["n_turns"].iloc[0] == N_HOPS
    # the 90-min window at 10:00 covers both turns; 10:30's only the second
    w = out.dropna(subset=["w_start"]).set_index("w_start")["n_turns"]
    assert w[_ts("2024-01-01 10:00")] == 2
    assert w[_ts("2024-01-01 10:30")] == 1


def test_rate_anomaly_semantics(ray_session, tmp_path):
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
        rate_anomaly,
    )

    # role 'user': hours with counts 1, 1, 10 → mean = 4 → only the 10 bursts
    rows = (
        [("user", _ts("2024-01-01 00:10"))]
        + [("user", _ts("2024-01-01 01:10"))]
        + [("user", _ts("2024-01-01 02:10"))] * 10
        + [(None, None)]
    )
    t = pa.table(
        {
            "role": pa.array([r for r, _ in rows], pa.string()),
            "ts": pa.array([s for _, s in rows], pa.timestamp("us")),
        }
    )
    d = _write(tmp_path, "burst", t)
    out = rate_anomaly(ray.data.read_parquet(d)).to_pandas()
    assert len(out) == 4
    burst = out[out["is_burst"]]
    assert len(burst) == 1
    assert burst["hour_ts"].iloc[0] == _ts("2024-01-01 02:00")
    assert burst["n_turns"].iloc[0] == 10
    nullg = out[out["role"].isna()]
    # single-hour role is never a burst (n·H = S); null keys survive
    assert len(nullg) == 1 and not nullg["is_burst"].iloc[0]
    assert nullg["hour_ts"].isna().all()


def test_conv_concat_order_and_null_text(ray_session, tmp_path):
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.functions.corpus import w63
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.aggregate import (
        conv_concat,
    )

    ts = pa.array([_ts("2024-01-01")] * 4, pa.timestamp("us"))
    t = pa.table(
        {
            # conv a arrives out of order; one null text is skipped in the
            # join but counted in n_turns
            "conv_id": pa.array(["a", "a", "a", "b"], pa.string()),
            "turn_idx": pa.array([1, 0, 2, 0], pa.int32()),
            "text": pa.array(["world", "hello", None, None], pa.string()),
            "ts": ts,
        }
    )
    d = _write(tmp_path, "concat", t)
    out = conv_concat(ray.data.read_parquet(d)).to_pandas().set_index("conv_id")
    assert out.loc["a", "n_turns"] == 3
    assert out.loc["a", "doc_len"] == len("hello\nworld")
    assert out.loc["a", "doc_hash"] == w63("hello\nworld")
    # all-null conv: NULL document, like SQL string_agg
    assert out.loc["b", "n_turns"] == 1 and pd.isna(out.loc["b", "doc_len"])


def test_log_templates_sentinel_collision(ray_session, tmp_path):
    """ADVICE r2: a REAL text equal to the internal null-key sentinel must
    form its own (non-null) template group — templates are user text, so
    the NULL template unmasks by validity flag, never by value equality."""
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.aggregate import _NULL_KEY
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
        log_templates,
    )

    t = pa.table(
        {
            "conv_id": pa.array(["c1", "c2", "c3"], pa.string()),
            "role": pa.array(["user", "user", "user"], pa.string()),
            # row 0: adversarial text that IS the sentinel (no digits/hex →
            # template == text); row 1: a genuinely null text; row 2: normal
            "text": pa.array([_NULL_KEY, None, "hello world"], pa.string()),
        }
    )
    d = _write(tmp_path, "tplcol", t)
    out = log_templates(ray.data.read_parquet(d)).to_pandas()
    # three DISTINCT groups: the literal sentinel text, NULL, and 'hello world'
    assert len(out) == 3
    null_grp = out[out["template"].isna()]
    lit_grp = out[out["template"] == _NULL_KEY]
    assert len(null_grp) == 1 and null_grp["n_turns"].iloc[0] == 1
    assert null_grp["example_conv"].iloc[0] == "c2"
    assert len(lit_grp) == 1 and lit_grp["example_conv"].iloc[0] == "c1"


def test_turn_late_disorder_semantics(ray_session, tmp_path):
    """The gate corpus has monotone per-conv timestamps (zero late turns),
    so the actually-late branch is pinned here: a turn whose ts lags the
    conversation's event-time high-water mark by more than the allowed
    lateness is flagged; smaller disorder records its delay un-flagged."""
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
        _LATE_US,
        turn_late,
    )

    base = pd.Timestamp("2024-01-02").value // 1000
    h = 3_600_000_000
    t = pa.table(
        {
            "conv_id": pa.array(["c1"] * 4 + ["c2"], pa.string()),
            "turn_idx": pa.array([0, 1, 2, 3, 0], pa.int32()),
            "role": pa.array(["u"] * 5, pa.string()),
            "text": pa.array(["a"] * 5, pa.string()),
            "ts": pa.array(
                [
                    base,            # t0: watermark seeds here
                    base + 3 * h,    # t1: advances watermark to +3h
                    base + 1 * h,    # t2: 2h behind watermark → LATE (>1h)
                    base + 3 * h - 1_000_000,  # t3: 1s behind → delayed, not late
                    base,            # other conv: first turn, never late
                ],
                pa.int64(),
            ).cast(pa.timestamp("us")),
        }
    )
    d = _write(tmp_path, "late", t)
    out = (
        turn_late(ray.data.read_parquet(d))
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert out["delay_us"].tolist() == [0, 0, 2 * h, 1_000_000, 0]
    assert out["is_late"].tolist() == [False, False, True, False, False]
    assert 2 * h > _LATE_US >= 1_000_000


def test_role_transitions_tie_order_deterministic(ray_session, tmp_path):
    """Code-review r3: duplicate (turn_idx, ts) turns with DIFFERENT roles
    must pair in ONE deterministic order on both twins — role is the final
    tie-breaker (ASC, nulls last), mirroring the oracle's ORDER BY."""
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
        role_transitions,
    )

    ts = pd.Timestamp("2024-01-02")
    t = pa.table(
        {
            "conv_id": pa.array(["c1"] * 4, pa.string()),
            # rows 0-2 all tie on (turn_idx=1, ts): order must be
            # assistant < user < NULL (nulls last), then the tool turn
            "turn_idx": pa.array([1, 1, 1, 2], pa.int32()),
            "role": pa.array(["user", "assistant", None, "tool"], pa.string()),
            "text": pa.array(["a", "b", "c", "d"], pa.string()),
            "ts": pa.array([ts] * 4, pa.timestamp("us")),
        }
    )
    d = _write(tmp_path, "roletie", t)
    out = (
        role_transitions(ray.data.read_parquet(d))
        .to_pandas()
        .sort_values(["from_role", "to_role"], na_position="last")
        .reset_index(drop=True)
    )
    pairs = {
        (r["from_role"], r["to_role"]): r["n_pairs"] for _, r in out.iterrows()
    }
    assert pairs == {
        ("assistant", "user"): 1,
        ("user", None): 1,
        (None, "tool"): 1,
    }
