"""Null event-time hardening for the conv-window kernels (ADVICE r3).

A null ``ts`` used to reach the kernels as float NaN (``cast(int64)
.to_numpy``), which either crashed the Arrow int64 conversion
(sessions/rolling) or silently poisoned the watermark cummax into
INT64_MIN for every later row of the conversation (turn_late).  The
oracle twins define the required semantics: DuckDB orders NULLS LAST,
``max()``/``min()``/window aggregates skip NULLs, RANGE frames put all
NULL ordering keys in one peer group, and the lateness twin coalesces a
NULL lag to delay 0 / not-late.  These tests pin the engine to DuckDB on
a table that exercises every branch: null ts mid-conversation, all-null
conversations, null turn_idx tie keys, and a session whose tail is null.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from fluent_plugin_kubernetes_metadata_filter_ray.stages.aggregate import (
    ROLLING_WINDOW_S,
    SESSION_GAP_S,
)
from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
    ALLOWED_LATENESS_S,
)

_GAP_US = SESSION_GAP_S * 1_000_000
_WIN_S = ROLLING_WINDOW_S
_LATE_US = ALLOWED_LATENESS_S * 1_000_000


def _null_ts_dir(tmp_path) -> str:
    ts0 = pd.Timestamp("2024-01-01").value // 1000  # µs

    def t(h):
        return None if h is None else ts0 + int(h * 3600 * 1_000_000)

    rows = [
        # conv a: valid, null, valid (short gap), null, valid (big gap)
        ("a", 0, t(0)),
        ("a", 1, None),
        ("a", 2, t(0.5)),
        ("a", 3, None),
        ("a", 4, t(10)),
        # conv b: ALL null ts
        ("b", 0, None),
        ("b", 1, None),
        # conv c: null turn_idx tie key + out-of-order ts (late arrival)
        ("c", None, t(0.1)),
        ("c", 0, t(0.2)),
        ("c", 1, t(0.15)),
        # conv d: late beyond the allowed lateness, then a null
        ("d", 0, t(5)),
        ("d", 1, t(1)),
        ("d", 2, None),
        # null conv_id with a null ts
        (None, 0, None),
        (None, 1, t(2)),
    ]
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array(["x"] * len(rows), pa.string()),
            "ts": pa.array([r[2] for r in rows], pa.int64()).cast(pa.timestamp("us")),
        }
    )
    d = str(tmp_path / "nullts")
    os.makedirs(d, exist_ok=True)
    # two shards so convs straddle input blocks
    pq.write_table(tbl.slice(0, 8), f"{d}/part-0.parquet")
    pq.write_table(tbl.slice(8), f"{d}/part-1.parquet")
    return d


def _oracle(d: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW transcripts_t AS SELECT * FROM read_parquet('{d}/*.parquet')"
    )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _cmp(a: pd.DataFrame, b: pd.DataFrame, keys):
    a = a.sort_values(keys, kind="mergesort", na_position="last").reset_index(drop=True)
    b = b.sort_values(keys, kind="mergesort", na_position="last").reset_index(drop=True)
    assert sorted(a.columns) == sorted(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        am, bm = a[c].fillna("@").astype(str), b[c].fillna("@").astype(str)
        assert (am == bm).all(), f"{c}: {a[c].tolist()} vs {b[c].tolist()}"


def test_turn_late_null_ts_matches_duckdb(ray_session, tmp_path):
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import turn_late

    d = _null_ts_dir(tmp_path)
    got = turn_late(ray.data.read_parquet(d)).to_pandas()
    # no NaN→INT64_MIN poisoning anywhere
    assert (got["delay_us"] >= 0).all()
    want = _oracle(
        d,
        f"""
        WITH w AS (
          SELECT conv_id, turn_idx, ts,
            max(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
          FROM transcripts_t)
        SELECT conv_id, turn_idx, ts,
          coalesce(greatest(0, date_diff('microsecond', ts, prevmax)), 0)::BIGINT AS delay_us,
          coalesce(date_diff('microsecond', ts, prevmax) > {_LATE_US}, false) AS is_late
        FROM w
        """,
    )
    _cmp(got, want, ["conv_id", "turn_idx", "ts"])
    # the conv-d late arrival is flagged; null-ts rows never are
    late = got[got["is_late"]]
    assert set(late["conv_id"]) == {"d"} and late["turn_idx"].tolist() == [1]
    assert got.loc[got["ts"].isna(), "delay_us"].eq(0).all()


def test_conv_sessions_null_ts_matches_duckdb(ray_session, tmp_path):
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.aggregate import (
        conv_sessions,
        conv_sessions_mapgroups,
    )

    d = _null_ts_dir(tmp_path)
    got = conv_sessions(ray.data.read_parquet(d)).to_pandas()
    want = _oracle(
        d,
        f"""
        WITH b AS (
          SELECT conv_id, turn_idx, ts,
            CASE WHEN date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx), ts)
                 > {_GAP_US} THEN 1 ELSE 0 END AS brk
          FROM transcripts_t),
        s AS (
          SELECT conv_id, ts,
            sum(brk) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                           ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
          FROM b)
        SELECT conv_id, session_idx, count(*)::BIGINT AS n_turns,
          min(ts) AS t_start, max(ts) AS t_end
        FROM s GROUP BY conv_id, session_idx
        """,
    )
    _cmp(got, want, ["conv_id", "session_idx"])
    # the all-null conv collapses to one session with NULL bounds
    b = got[got["conv_id"] == "b"]
    assert len(b) == 1 and b["n_turns"].iloc[0] == 2
    assert b["t_start"].isna().all() and b["t_end"].isna().all()
    # baseline kernel agrees (property-test parity)
    mg = conv_sessions_mapgroups(ray.data.read_parquet(d)).to_pandas()
    _cmp(got, mg, ["conv_id", "session_idx"])


def test_turn_rolling_null_ts_matches_duckdb(ray_session, tmp_path):
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.aggregate import (
        turn_rolling,
        turn_rolling_mapgroups,
    )

    d = _null_ts_dir(tmp_path)
    got = turn_rolling(ray.data.read_parquet(d)).to_pandas()
    want = _oracle(
        d,
        f"""
        SELECT conv_id, turn_idx, ts,
          count(*) OVER (PARTITION BY conv_id ORDER BY ts
                         RANGE BETWEEN INTERVAL {_WIN_S} SECONDS PRECEDING
                         AND CURRENT ROW)::BIGINT AS n_last_hour
        FROM transcripts_t
        """,
    )
    _cmp(got, want, ["conv_id", "turn_idx", "ts"])
    # null peer group: conv a's two null rows see each other, not the valid rows
    a = got[(got["conv_id"] == "a") & got["ts"].isna()]
    assert a["n_last_hour"].tolist() == [2, 2]
    mg = turn_rolling_mapgroups(ray.data.read_parquet(d)).to_pandas()
    _cmp(got, mg, ["conv_id", "turn_idx", "ts"])


def test_random_null_ts_property(ray_session, tmp_path):
    """Randomized multi-shard layouts with ~25% null ts / null turn_idx:
    sorted-block vs map_groups row-exact (the multi-block regression class
    from CLAUDE.md), plus non-negative delays from turn_late."""
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.aggregate import (
        conv_sessions,
        conv_sessions_mapgroups,
        turn_rolling,
        turn_rolling_mapgroups,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import turn_late

    rng = np.random.default_rng(321)
    n = 160
    base = pd.Timestamp("2024-03-01").value // 1000
    convs = [f"c{i}" for i in range(12)] + [None]
    off = rng.choice([0, 1, 3600, 3601, 7 * 3600, 14 * 3600], n).astype(np.int64)
    ts_vals = base + off * 1_000_000
    ts_mask = rng.random(n) < 0.25
    ti_vals = rng.integers(0, 5, n)
    ti_mask = rng.random(n) < 0.15
    t = pa.table(
        {
            "conv_id": pa.array([convs[i] for i in rng.choice(len(convs), n)], pa.string()),
            "turn_idx": pa.array(ti_vals, mask=ti_mask).cast(pa.int32()),
            "ts": pa.array(ts_vals, mask=ts_mask).cast(pa.timestamp("us")),
        }
    )
    d = str(tmp_path / "randnull")
    os.makedirs(d)
    for s in range(0, n, 40):
        pq.write_table(t.slice(s, 40), f"{d}/part-{s:04d}.parquet")

    for impl, ref, keys in (
        (conv_sessions, conv_sessions_mapgroups, ["conv_id", "session_idx"]),
        (turn_rolling, turn_rolling_mapgroups, ["conv_id", "turn_idx", "ts"]),
    ):
        got = impl(ray.data.read_parquet(d)).to_pandas()
        want = ref(ray.data.read_parquet(d)).to_pandas()
        _cmp(got, want, keys)

    tl = turn_late(ray.data.read_parquet(d)).to_pandas()
    assert len(tl) == n and (tl["delay_us"] >= 0).all()
    assert tl.loc[tl["ts"].isna(), "delay_us"].eq(0).all()
    assert not tl.loc[tl["ts"].isna(), "is_late"].any()


def test_turn_dedup_window_null_matches_duckdb(ray_session, tmp_path):
    """Windowed dedup on hostile rows: null text (never suppressed), null
    ts (can't be lagged against), duplicate texts straddling shards, and
    identical (text, ts) pairs whose order only the int tie keys decide."""
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
        DEDUP_WINDOW_S,
        turn_dedup_window,
    )

    ts0 = pd.Timestamp("2024-01-01").value // 1000

    def t(s):
        return None if s is None else ts0 + int(s * 1_000_000)

    win = DEDUP_WINDOW_S
    rows = [
        # same text inside / outside the window, across conversations
        ("a", 0, "dup", t(0)),
        ("b", 0, "dup", t(win - 1)),      # suppressed (gap < window)
        ("c", 0, "dup", t(2 * win + 5)),  # kept (gap > window vs previous)
        # identical (text, ts) tie pair → exactly one suppressed
        ("x", 1, "tie", t(10)),
        ("y", 1, "tie", t(10)),
        # null text rows: never suppressed, even when adjacent
        ("a", 1, None, t(1)),
        ("a", 2, None, t(2)),
        # null ts rows of a duplicated text: kept with gap 0
        ("a", 3, "dup", None),
        (None, 0, "dup", None),
        # unique text
        ("a", 4, "solo", t(5)),
    ]
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.int64()).cast(pa.timestamp("us")),
        }
    )
    d = str(tmp_path / "wdedup")
    os.makedirs(d, exist_ok=True)
    pq.write_table(tbl.slice(0, 5), f"{d}/part-0.parquet")
    pq.write_table(tbl.slice(5), f"{d}/part-1.parquet")

    got = turn_dedup_window(ray.data.read_parquet(d)).to_pandas()
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
        turn_dedup_window_oracle_sql,
    )

    sql = turn_dedup_window_oracle_sql()
    # swap the derived-transcripts CTE for the hostile table (CTE name kept)
    head, tail = sql.split("),\nh AS", 1)
    sql = (
        f"WITH transcripts_t AS (SELECT * FROM read_parquet('{d}/*.parquet')),\n"
        "h AS" + tail
    )
    want = _oracle(d, sql)
    _cmp(got, want, ["conv_id", "turn_idx", "ts", "text_hash"])
    # semantic spot checks
    byconv = got.set_index(["conv_id", "turn_idx"], drop=False)
    assert bool(byconv.loc[("b", 0), "is_suppressed"]) is True
    assert bool(byconv.loc[("c", 0), "is_suppressed"]) is False
    assert not got.loc[got["text_hash"].isna(), "is_suppressed"].any()
    assert not got.loc[got["ts"].isna(), "is_suppressed"].any()
    tie = got[(got["turn_idx"] == 1) & got["conv_id"].isin(["x", "y"])]
    assert tie["is_suppressed"].sum() == 1


def test_conv_dedup_collapses_replayed_conversations(ray_session, tmp_path):
    """Two conversations with byte-identical reassembled documents collapse
    into one group (keeper = min conv_id); a third differing by one char
    stays separate; an all-null-text conv carries a null doc_hash."""
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.aggregate import (
        conv_dedup,
    )

    ts0 = pd.Timestamp("2024-01-01").value // 1000
    rows = []
    for conv in ("a", "b"):  # replayed session: identical turn content
        rows += [(conv, 0, "hello", ts0), (conv, 1, "world", ts0 + 1)]
    rows += [("c", 0, "hello", ts0), ("c", 1, "world!", ts0 + 1)]  # near miss
    rows += [("d", 0, None, ts0)]  # all-null text → null doc_hash
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.int64()).cast(pa.timestamp("us")),
        }
    )
    d = str(tmp_path / "convdedup")
    os.makedirs(d, exist_ok=True)
    pq.write_table(tbl.slice(0, 3), f"{d}/part-0.parquet")  # conv a straddles
    pq.write_table(tbl.slice(3), f"{d}/part-1.parquet")

    got = conv_dedup(ray.data.read_parquet(d)).to_pandas()
    assert len(got) == 3  # {a,b} merged, c separate, d (null hash) separate
    merged = got[got["n_convs"] == 2]
    assert len(merged) == 1 and merged["conv_id"].iloc[0] == "a"
    assert merged["n_turns"].iloc[0] == 2
    nullh = got[got["doc_hash"].isna()]
    assert len(nullh) == 1 and nullh["conv_id"].iloc[0] == "d"


def test_field_nulls_detects_drift_day(ray_session, tmp_path):
    """A day where the shipper stops sending `tool` reads back as
    null_frac=1.0 for that (day, tool) cell; null-ts rows form their own
    null-day group; totals are per-field identical."""
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
        field_nulls,
    )

    day0 = pd.Timestamp("2024-01-01").value // 1000
    day1 = pd.Timestamp("2024-01-02").value // 1000
    rows = [
        ("a", 0, "user", "x", "grep", day0),
        ("a", 1, "user", "y", "sed", day0 + 1),
        # day 1: tool pipeline broke
        ("b", 0, "user", "z", None, day1),
        ("b", 1, None, None, None, day1 + 5),
        # null ts bucket
        ("c", 0, "user", "w", "awk", None),
    ]
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.array([r[5] for r in rows], pa.int64()).cast(pa.timestamp("us")),
        }
    )
    d = str(tmp_path / "fieldnulls")
    os.makedirs(d, exist_ok=True)
    pq.write_table(tbl.slice(0, 3), f"{d}/part-0.parquet")
    pq.write_table(tbl.slice(3), f"{d}/part-1.parquet")

    got = field_nulls(ray.data.read_parquet(d)).to_pandas()
    assert len(got) == 9  # 3 day groups (day0, day1, null) × 3 fields
    assert (got.groupby("field")["n_rows"].sum() == 5).all()
    d1 = got[got["day_ts"] == pd.Timestamp("2024-01-02")].set_index("field")
    assert d1.loc["tool", "null_frac"] == 1.0
    assert d1.loc["role", "null_frac"] == 0.5
    nullday = got[got["day_ts"].isna()]
    assert len(nullday) == 3 and (nullday["n_rows"] == 1).all()
    assert (nullday["n_null"] == 0).all()


def test_turn_dedup_window_random_property(ray_session, tmp_path):
    """Randomized multi-shard layouts: a SMALL text alphabet (duplicates
    everywhere, within and across shards), ~25% null ts, ~10% null text,
    ties on (text, ts) — engine vs the window-function oracle row-exact."""
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
        turn_dedup_window,
        turn_dedup_window_oracle_sql,
    )

    rng = np.random.default_rng(99)
    n = 200
    base = pd.Timestamp("2024-05-01").value // 1000
    texts = ["alpha", "beta", "gamma", "", "alpha beta", None]
    convs = [f"c{i}" for i in range(8)] + [None]
    off = rng.choice([0, 1, 300, 599, 600, 601, 3600], n).astype(np.int64)
    ts_vals = base + off * 1_000_000
    ts_mask = rng.random(n) < 0.25
    t = pa.table(
        {
            "conv_id": pa.array(
                [convs[i] for i in rng.choice(len(convs), n)], pa.string()
            ),
            "turn_idx": pa.array(rng.integers(0, 6, n), pa.int64()).cast(pa.int32()),
            "text": pa.array([texts[i] for i in rng.choice(len(texts), n)], pa.string()),
            "ts": pa.array(ts_vals, mask=ts_mask).cast(pa.timestamp("us")),
        }
    )
    d = str(tmp_path / "wdwrand")
    os.makedirs(d)
    for s in range(0, n, 50):
        pq.write_table(t.slice(s, 50), f"{d}/part-{s:04d}.parquet")

    got = turn_dedup_window(ray.data.read_parquet(d)).to_pandas()
    sql = turn_dedup_window_oracle_sql()
    head, tail = sql.split("),\nh AS", 1)
    sql = (
        f"WITH transcripts_t AS (SELECT * FROM read_parquet('{d}/*.parquet')),\n"
        "h AS" + tail
    )
    want = _oracle(d, sql)
    _cmp(got, want, ["conv_id", "turn_idx", "ts", "text_hash", "gap_us"])
    # exercised both branches
    assert got["is_suppressed"].any() and (~got["is_suppressed"]).any()
    assert (got["gap_us"] >= 0).all()


def test_turn_conv_enrich_window_semantics(ray_session, tmp_path):
    """Turns annotated with conv aggregates match window-function
    semantics: null conv_ids form ONE partition (not dropped like a SQL
    join would), is_last_turn coalesces null turn_idx to false, and
    conversations straddling shards count all their turns."""
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.aggregate import (
        turn_conv_enrich,
    )

    rows = [
        ("a", 0, "user"), ("a", 1, "assistant"), ("a", 2, "user"),
        ("b", 0, "user"),
        (None, 0, "user"), (None, None, "tool"),
    ]
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array(["x"] * len(rows), pa.string()),
            "ts": pa.array([0] * len(rows), pa.int64()).cast(pa.timestamp("us")),
        }
    )
    d = str(tmp_path / "tce")
    os.makedirs(d)
    pq.write_table(tbl.slice(0, 2), f"{d}/part-0.parquet")  # conv a straddles
    pq.write_table(tbl.slice(2), f"{d}/part-1.parquet")

    got = turn_conv_enrich(ray.data.read_parquet(d)).to_pandas()
    assert len(got) == 6
    a = got[got["conv_id"] == "a"]
    assert (a["n_turns_conv"] == 3).all()
    assert a.set_index("turn_idx")["is_last_turn"].to_dict() == {
        0: False, 1: False, 2: True
    }
    nullconv = got[got["conv_id"].isna()]
    assert len(nullconv) == 2 and (nullconv["n_turns_conv"] == 2).all()
    # max over the null-conv partition is 0 → the turn_idx=0 row is last
    assert nullconv.set_index("role")["is_last_turn"].to_dict() == {
        "user": True, "tool": False
    }


def test_turn_session_assign_consistent_with_sessions(ray_session, tmp_path):
    """Per-turn session ids reconcile with conv_sessions on the hostile
    null-ts table: per-conv turn counts per session match, and null-ts
    turns inherit the running session instead of breaking one."""
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.aggregate import (
        conv_sessions,
        turn_session_assign,
    )

    d = _null_ts_dir(tmp_path)
    per_turn = turn_session_assign(ray.data.read_parquet(d)).to_pandas()
    sessions = conv_sessions(ray.data.read_parquet(d)).to_pandas()

    got = (
        per_turn.groupby(["conv_id", "session_idx"], dropna=False)
        .size().rename("n_turns").reset_index()
        .sort_values(["conv_id", "session_idx"], na_position="last")
        .reset_index(drop=True)
    )
    want = (
        sessions[["conv_id", "session_idx", "n_turns"]]
        .sort_values(["conv_id", "session_idx"], na_position="last")
        .reset_index(drop=True)
    )
    for c in want.columns:
        assert (
            got[c].fillna("@").astype(str) == want[c].fillna("@").astype(str)
        ).all(), c
    # conv a: t(0), null, t(0.5) are one session; t(10) starts the next;
    # the trailing null inherits session 1 (nulls order last in the conv)
    a = per_turn[per_turn["conv_id"] == "a"].sort_values("turn_idx")
    assert a["session_idx"].tolist() == [0, 1, 0, 1, 1]


def test_response_latency_percentiles_exact(ray_session, tmp_path):
    """Hand-built gap distribution: 100 user→assistant pairs with known
    ms gaps pin the type-1 quantile thresholds exactly; null-ts pairs and
    conv boundaries contribute nothing."""
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
        response_latency,
    )

    base = pd.Timestamp("2024-06-01").value // 1000
    rows = []
    # 100 convs, each user@t0 → assistant@t0+gap: gaps 1..100 ms
    for i in range(100):
        t0 = base + i * 10_000_000
        rows.append((f"c{i}", 0, "user", t0))
        rows.append((f"c{i}", 1, "assistant", t0 + (i + 1) * 1000))
    # a null-ts pair and a lone turn: no contribution
    rows += [("x", 0, "user", None), ("x", 1, "assistant", None), ("y", 0, "user", base)]
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array(["m"] * len(rows), pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.int64()).cast(pa.timestamp("us")),
        }
    )
    d = str(tmp_path / "latency")
    os.makedirs(d)
    for s in range(0, len(rows), 60):
        pq.write_table(tbl.slice(s, 60), f"{d}/part-{s:04d}.parquet")

    got = response_latency(ray.data.read_parquet(d)).to_pandas()
    ua = got[(got["from_role"] == "user") & (got["to_role"] == "assistant")]
    assert len(ua) == 1
    r = ua.iloc[0]
    # type-1 quantiles over gaps {1..100}: ceil(q·100)-th smallest
    assert r["n_pairs"] == 100
    assert r["p50_ms"] == 50 and r["p95_ms"] == 95 and r["p99_ms"] == 99
    # the only other transition present is assistant→user across convs? none:
    # pairs exist only within a conv, so no other (from, to) row has n>0
    assert set(map(tuple, got[["from_role", "to_role"]].values)) == {("user", "assistant")}


def test_turn_novelty_detects_looping_agent(ray_session, tmp_path):
    """A conversation that repeats the same message verbatim reads back
    repeat_frac=1.0 from the second occurrence on; fresh turns score 0;
    short/null texts carry zero shingles; repeats straddle shards."""
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
        turn_novelty,
    )

    ts0 = pd.Timestamp("2024-07-01").value // 1000
    loop_msg = "retrying the exact same tool call again now"
    rows = [
        ("loop", 0, loop_msg, ts0),
        ("loop", 1, loop_msg, ts0 + 1),
        ("loop", 2, loop_msg, ts0 + 2),
        ("loop", 3, "a genuinely new message appears here finally", ts0 + 3),
        # same text in a DIFFERENT conversation: not a repeat there
        ("other", 0, loop_msg, ts0),
        ("other", 1, "hi", ts0 + 1),   # < 3 tokens → no shingles
        ("other", 2, None, ts0 + 2),   # null text
    ]
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["assistant"] * len(rows), pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.int64()).cast(pa.timestamp("us")),
        }
    )
    d = str(tmp_path / "novelty")
    os.makedirs(d)
    pq.write_table(tbl.slice(0, 2), f"{d}/part-0.parquet")  # loop straddles
    pq.write_table(tbl.slice(2), f"{d}/part-1.parquet")

    got = turn_novelty(ray.data.read_parquet(d)).to_pandas()
    loop = got[got["conv_id"] == "loop"].set_index("turn_idx").sort_index()
    assert loop.loc[0, "repeat_frac"] == 0.0
    assert loop.loc[1, "repeat_frac"] == 1.0
    assert loop.loc[2, "repeat_frac"] == 1.0
    assert loop.loc[3, "repeat_frac"] == 0.0
    other = got[got["conv_id"] == "other"].set_index("turn_idx").sort_index()
    assert other.loc[0, "repeat_frac"] == 0.0  # fresh in ITS conversation
    assert other.loc[1, "n_shingles"] == 0 and other.loc[2, "n_shingles"] == 0


def test_field_nulls_negative_epoch_day_floor():
    """Pre-1970 timestamps must floor to the PREVIOUS day boundary (the
    oracle's date_trunc('day') semantics), not truncate toward zero: -1 µs
    belongs to 1969-12-31, not 1970-01-01 (ADVICE r4)."""
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
        _DAY_US,
        _field_nulls_partial,
    )

    tbl = pa.table(
        {
            "conv_id": pa.array(["a", "b", "c"], pa.string()),
            "turn_idx": pa.array([0, 0, 0], pa.int32()),
            "role": pa.array(["user", "user", None], pa.string()),
            "text": pa.array(["x", "y", "z"], pa.string()),
            "tool": pa.array(["t", None, "t"], pa.string()),
            "ts": pa.array([-1, 0, None], pa.int64()).cast(pa.timestamp("us")),
        }
    )
    part = _field_nulls_partial(tbl)
    days = sorted(set(part.column("day_us").to_pylist()))
    # -1 µs → day -86400000000 (1969-12-31); 0 → day 0; null ts → sentinel
    assert -_DAY_US in days and 0 in days
