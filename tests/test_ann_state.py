"""Persisted ANN index state (incremental IVFADC+R): the resume path must
(a) match its frozen-codebook DuckDB twin, (b) be idempotent across reuses
of the checkpoint, and (c) provably never re-read the prior crawl's
embedding floats (the fuzzy-dedup LSH checkpoint contract, embedding side)."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fluent_plugin_kubernetes_metadata_filter_ray.functions import simsearch as ss


def _mk_mat(n=120, dim=16):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((8, dim))
    # clustered corpus: each vector is a noisy copy of one of 8 anchors
    mat = base[np.arange(n) % 8] + 0.15 * rng.standard_normal((n, dim))
    return mat.astype(np.float32)


def _write_emb(path, mat):
    os.makedirs(path, exist_ok=True)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in mat], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(mat), pa.int32()),
        }
    )
    pq.write_table(t, os.path.join(path, "embeddings.parquet"))
    return path


def _frame(ds):
    df = ds.to_pandas()
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_ann_incremental_matches_oracle_and_idempotent(ray_session, tmp_path):
    sf = _write_emb(str(tmp_path / "sf"), _mk_mat())
    state = str(tmp_path / "state")
    got = _frame(ss.q_ann_ivfpq_incremental(sf, state_dir=state))
    assert len(got) == ss.N_QUERIES * ss.TOPK_K
    assert os.path.exists(state + ".done")
    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from"
        f" read_parquet('{sf}/embeddings.parquet')"
    )
    op = con.execute(ss.ann_ivfpq_incremental_oracle_sql()).df()
    op = op[sorted(op.columns)].sort_values(sorted(op.columns)).reset_index(drop=True)
    assert list(op.columns) == list(got.columns)
    for c in got.columns:
        assert (op[c].to_numpy() == got[c].to_numpy()).all(), c
    # second run reuses the checkpoint and is value-identical
    again = _frame(ss.q_ann_ivfpq_incremental(sf, state_dir=state))
    assert got.equals(again)


def test_ann_incremental_never_rereads_history(ray_session, tmp_path):
    """Corrupt every prior-crawl vector's floats on disk (except the
    query vectors, which any search legitimately re-reads) after the
    state checkpoint is written: a resume over the corrupted corpus must
    return the intact-corpus result — only possible if history floats
    are never re-read."""
    mat = _mk_mat()
    sf = _write_emb(str(tmp_path / "sf"), mat)
    state = str(tmp_path / "state")
    ss.ann_state_write(sf, state)
    intact = _frame(ss.q_ann_ivfpq_incremental(sf, state_dir=state))

    corrupt = mat.copy()
    ids = np.arange(len(mat))
    hist = (ids % ss.ANN_REF_MOD == 0) & (ids >= ss.N_QUERIES)
    assert hist.any()
    corrupt[hist] = 99.0  # wildly different direction and scale
    sf2 = _write_emb(str(tmp_path / "sf2"), corrupt)
    resumed = _frame(ss.q_ann_ivfpq_incremental(sf2, state_dir=state))
    assert intact.equals(resumed), "resume drifted — history floats re-read"
    # teeth: a full (state-free) run over the corrupted corpus disagrees
    full_corrupt = _frame(
        ss.q_ann_ivfpq_incremental(sf2, state_dir=str(tmp_path / "state2"))
    )
    assert not intact.equals(full_corrupt)


def test_ivfpq_ragged_dim_twin(ray_session, tmp_path):
    """dim % PQ_M != 0 exercises the remainder branch of the subspace
    split (_SQL_SUB_EXPR / _SQL_LDIM_EXPR CASE arithmetic) that the dim-64
    sf corpora never hit: engine and twin must stay cell-for-cell equal
    for BOTH the one-shot and the incremental op."""
    import duckdb

    rng = np.random.default_rng(11)
    dim = 13  # 13 % 8 = 5 → five (base+1)-wide subspaces, three base-wide
    mat = rng.standard_normal((60, dim)).astype(np.float32)
    d = str(tmp_path / "ragged")
    os.makedirs(d)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array([r.tolist() for r in mat], pa.list_(pa.float32())),
            "label": pa.array([0] * len(mat), pa.int32()),
        }
    )
    pq.write_table(t, f"{d}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from read_parquet('{d}/embeddings.parquet')"
    )
    for fn, sql in (
        (lambda: ss.q_ann_ivfpq(d), ss.ann_ivfpq_oracle_sql()),
        (
            lambda: ss.q_ann_ivfpq_incremental(d, state_dir=str(tmp_path / "rst")),
            ss.ann_ivfpq_incremental_oracle_sql(),
        ),
    ):
        got = _frame(fn())
        op = con.execute(sql).df()
        op = op[sorted(op.columns)].sort_values(sorted(op.columns)).reset_index(drop=True)
        assert list(op.columns) == list(got.columns)
        for c in got.columns:
            assert (op[c].to_numpy() == got[c].to_numpy()).all(), c
