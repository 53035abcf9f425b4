"""The sorted-block conv kernels vs the reference map_groups implementations
on randomized MULTI-BLOCK layouts (VERDICT r2 task 8).

CLAUDE.md's regression class: bugs that only surface with multi-block reads
(group straddling, per-block state, chunked arrays) never show in
single-batch tests — so every trial writes several parquet shards and
forces extra block splits, then requires row-exact equality between the
vectorized sorted-block kernels (stages/aggregate.py, stages/loganalytics.py)
and the semantically-obvious ``groupby(conv_id).map_groups`` baselines.
Trials are seeded (deterministic), heavy on ties: duplicate (turn_idx, ts)
pairs with DIFFERENT texts exercise the deterministic text tie-breaker
(ADVICE r2), plus null conv_id / role / text rows.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _random_transcripts_dir(tmp_path, seed: int, n_rows: int, n_shards: int) -> str:
    rng = np.random.default_rng(seed)
    convs = [f"conv-{i}" for i in range(max(2, n_rows // 6))] + [None]
    roles = ["user", "assistant", "tool", None]
    texts = ["alpha", "beta", "gamma gamma", "", None, "zz top"]
    base = pd.Timestamp("2024-03-01").value // 1000  # µs

    conv_id = rng.choice(len(convs), n_rows)
    # ts from a SMALL value set so (turn_idx, ts) ties are common; gaps of
    # 0s / 1h / 7h exercise the 6h session boundary; ~12% null ts and ~8%
    # null turn_idx exercise the NULLS-LAST / skip-null window semantics
    # (ADVICE r3) in every kernel pair
    ts_off = rng.choice([0, 1, 3600, 3601, 7 * 3600, 14 * 3600], n_rows)
    ts_mask = rng.random(n_rows) < 0.12
    ti_mask = rng.random(n_rows) < 0.08
    t = pa.table(
        {
            "conv_id": pa.array([convs[i] for i in conv_id], pa.string()),
            "turn_idx": pa.array(
                rng.integers(0, 4, n_rows), mask=ti_mask
            ).cast(pa.int32()),
            "role": pa.array([roles[i] for i in rng.choice(len(roles), n_rows)], pa.string()),
            "text": pa.array([texts[i] for i in rng.choice(len(texts), n_rows)], pa.string()),
            "ts": pa.array(
                base + ts_off.astype(np.int64) * 1_000_000, mask=ts_mask
            ).cast(pa.timestamp("us")),
        }
    )
    d = str(tmp_path / f"rt-{seed}")
    os.makedirs(d, exist_ok=True)
    per = max(1, n_rows // n_shards)
    for s in range(0, n_rows, per):
        pq.write_table(t.slice(s, per), f"{d}/part-{s:05d}.parquet")
    return d


def _read_multiblock(d: str):
    import ray.data

    files = sorted(f"{d}/{f}" for f in os.listdir(d))
    # more blocks than files: force group-vs-block interactions
    return ray.data.read_parquet(files, override_num_blocks=2 * len(files))


def _sorted_df(ds, keys):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)[
        sorted(df.columns)
    ]


PAIRS = [
    ("conv_sessions", ["conv_id", "session_idx"]),
    ("turn_rolling", ["conv_id", "turn_idx", "ts"]),
    ("conv_concat", ["conv_id"]),
    ("role_transitions", ["from_role", "to_role"]),
    ("turn_late", ["conv_id", "turn_idx", "ts"]),
]


@pytest.mark.parametrize("seed", [7, 23, 99])
@pytest.mark.parametrize("opname,keys", PAIRS)
def test_sorted_block_matches_mapgroups(ray_session, tmp_path, opname, keys, seed):
    from fluent_plugin_kubernetes_metadata_filter_ray.stages import aggregate as ag
    from fluent_plugin_kubernetes_metadata_filter_ray.stages import loganalytics as la

    impl = getattr(ag, opname, None) or getattr(la, opname)
    ref = getattr(ag, f"{opname}_mapgroups", None) or getattr(la, f"{opname}_mapgroups")

    d = _random_transcripts_dir(tmp_path, seed, n_rows=240, n_shards=5)
    got = _sorted_df(impl(_read_multiblock(d)), keys)
    want = _sorted_df(ref(_read_multiblock(d)), keys)
    pd.testing.assert_frame_equal(got, want, check_dtype=True)


def test_sorted_block_single_conv_many_blocks(ray_session, tmp_path):
    """One conversation spanning EVERY input shard: the sort must co-locate
    it into one kernel call (the straddle case the block contract rules
    out) — a miscount here means pairs/sessions were split."""
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages import aggregate as ag
    from fluent_plugin_kubernetes_metadata_filter_ray.stages import loganalytics as la

    n = 200
    base = pd.Timestamp("2024-03-01").value // 1000
    t = pa.table(
        {
            "conv_id": pa.array(["solo"] * n, pa.string()),
            "turn_idx": pa.array(np.arange(n, dtype=np.int32), pa.int32()),
            "role": pa.array(["user", "assistant"] * (n // 2), pa.string()),
            "text": pa.array([f"t{i}" for i in range(n)], pa.string()),
            "ts": pa.array(base + np.arange(n, dtype=np.int64) * 1_000_000, pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    d = str(tmp_path / "solo")
    os.makedirs(d)
    for s in range(0, n, 25):
        pq.write_table(t.slice(s, 25), f"{d}/part-{s:05d}.parquet")
    ds = ray.data.read_parquet(sorted(f"{d}/{f}" for f in os.listdir(d)))

    sess = ag.conv_sessions(ds).to_pandas()
    assert len(sess) == 1 and sess["n_turns"].iloc[0] == n

    trans = la.role_transitions(ds).to_pandas()
    assert trans["n_pairs"].sum() == n - 1  # every consecutive pair counted

    cc = ag.conv_concat(ds).to_pandas()
    assert cc["n_turns"].iloc[0] == n
    assert cc["doc_len"].iloc[0] == sum(len(f"t{i}") for i in range(n)) + n - 1


@pytest.mark.parametrize("seed", [11, 47])
def test_doc_pack_prefix_sum_matches_mapgroups(ray_session, tmp_path, seed):
    """q_doc_pack's distributed prefix-sum rewrite vs the map_groups
    baseline on a randomized multi-source multi-shard corpus (sources
    deliberately span shards so runs split across blocks), row-exact."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import curation

    rng = np.random.default_rng(seed)
    n = 300
    sources = ["web", "book", "code", None]
    words = ["a", "bb", "ccc", "dd ee", ""]
    t = pa.table(
        {
            "doc_id": pa.array(rng.permutation(n).astype(np.int64), pa.int64()),
            "text": pa.array(
                [" ".join(words[i] for i in rng.choice(len(words), rng.integers(0, 6)))
                 or None for _ in range(n)],
                pa.string(),
            ),
            "source": pa.array(
                [sources[i] for i in rng.choice(len(sources), n)], pa.string()
            ),
        }
    )
    d = str(tmp_path / "packdocs")
    os.makedirs(d)
    pq.write_table(t, f"{d}/documents.parquet")

    key = ["doc_id"]
    got = curation.q_doc_pack(d).to_pandas().sort_values(key).reset_index(drop=True)
    want = (
        curation.q_doc_pack_mapgroups(d).to_pandas().sort_values(key).reset_index(drop=True)
    )
    got["source"] = got["source"].astype(object).where(got["source"].notna(), None)
    want["source"] = want["source"].astype(object).where(want["source"].notna(), None)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)])
