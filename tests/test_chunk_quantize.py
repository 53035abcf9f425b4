"""Semantic tests for content-defined chunking (q_doc_chunks), per-source
top-k (q_top_docs_per_source), and int8 quantization (q_embed_quantize).
Oracle equality is covered by the driver gate; these pin the operator
PROPERTIES that make them useful (CDC edit-locality, rank contiguity,
quantizer range)."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _docs_dir(tmp_path, rows):
    d = str(tmp_path / "docs")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, f"{d}/documents.parquet")
    return d


def test_doc_chunks_partition_and_edit_locality(ray_session, tmp_path):
    """Chunks partition each doc's token stream, and prepending one token
    changes at most the FIRST chunk's hash — the CDC edit-locality property
    fixed-width splitting lacks."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions.curation import (
        q_doc_chunks,
    )

    base = " ".join(f"tok{i}" for i in range(120))
    rows = [
        (1, base, "a"),
        (2, "prefixtoken " + base, "a"),  # one-token edit at the front
        (3, None, "a"),  # null text → no chunks
        (4, "", "a"),  # empty text → no chunks
    ]
    d = _docs_dir(tmp_path, rows)
    out = q_doc_chunks(d).to_pandas()

    a = out[out["doc_id"] == 1].sort_values("chunk_idx")
    b = out[out["doc_id"] == 2].sort_values("chunk_idx")
    assert len(a) >= 3  # the fixture must actually exercise multiple chunks
    # partition property: chunk sizes sum to the token count, ids contiguous
    assert a["n_tokens"].sum() == 120
    assert list(a["chunk_idx"]) == list(range(len(a)))
    # edit locality: every chunk of A except possibly the first survives in B
    missing = set(a["chunk_hash"][1:]) - set(b["chunk_hash"])
    assert not missing
    assert not set(out["doc_id"]) & {3, 4}  # token-less docs emit nothing


def test_top_docs_per_source_ranks(ray_session, tmp_path):
    from fluent_plugin_kubernetes_metadata_filter_ray.functions.sampling import (
        TOPK_PER_SOURCE,
        q_top_docs_per_source,
    )

    # 6 docs in source a, 2 in source b, 2 with a null source
    rows = (
        [(i, f"alpha beta w{i} " + "filler " * i, "a") for i in range(6)]
        + [(10, "one two three", "b"), (11, "four five", "b")]
        + [(20, "null source doc", None), (21, "another", None)]
    )
    d = _docs_dir(tmp_path, rows)
    out = q_top_docs_per_source(d).to_pandas()

    per = out.groupby("source", dropna=False)
    assert per.size().le(TOPK_PER_SOURCE).all()
    for _, g in per:
        g = g.sort_values("rnk")
        assert list(g["rnk"]) == list(range(1, len(g) + 1))
        # scores non-increasing down the ranks
        assert (np.diff(g["quality_score"].to_numpy()) <= 0).all()
    # the null-source stratum is present as a SQL-style group
    assert out["source"].isna().sum() > 0


def test_embed_quantize_range_and_extremes(ray_session, tmp_path):
    from fluent_plugin_kubernetes_metadata_filter_ray.functions.simsearch import (
        q_embed_quantize,
    )

    d = str(tmp_path / "emb")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 8)).astype(np.float32)
    # row 0 = per-dim minimum, row 1 = per-dim maximum → quantize to all-0 / all-255
    vecs[0] = vecs.min(axis=0) - 1
    vecs[1] = vecs.max(axis=0) + 1
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(50, dtype=np.int64)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )
    pq.write_table(t, f"{d}/embeddings.parquet")

    out = q_embed_quantize(d).to_pandas().set_index("vec_id").sort_index()
    assert (out["n_dims"] == 8).all()
    assert out["q8_min"].min() >= 0 and out["q8_max"].max() <= 255
    assert out.loc[0, "q8_max"] == 0  # the min vector maps to all-zeros
    assert out.loc[1, "q8_min"] == 255  # the max vector maps to all-255
    # interior vectors use the interior of the range
    inner = out.drop(index=[0, 1])
    assert (inner["q8_min"] > 0).any() and (inner["q8_max"] < 255).any()


def test_source_mix_upweights_small_sources(ray_session, tmp_path):
    from fluent_plugin_kubernetes_metadata_filter_ray.functions.sampling import (
        q_source_mix,
    )

    # source a: 16 docs, source b: 4 docs, null source: 1 doc
    rows = (
        [(i, f"doc {i} words here", "a") for i in range(16)]
        + [(100 + i, "short doc", "b") for i in range(4)]
        + [(200, "orphan words", None)]
    )
    d = _docs_dir(tmp_path, rows)
    out = q_source_mix(d).set_index("source")

    assert out.loc["a", "n_docs"] == 16 and out.loc["b", "n_docs"] == 4
    assert abs(out["mix_share"].sum() - 1.0) < 1e-12
    # sqrt temperature: a has 4× b's docs but only 2× its weight
    assert out.loc["a", "weight_q"] == 2 * out.loc["b", "weight_q"]
    # proportional share would be 16/21 ≈ 0.76; sqrt sampling pulls it down
    assert out.loc["a", "mix_share"] < 16 / 21
    # the null-source stratum is a row of its own
    assert out.index.isna().sum() == 1


def test_new_ops_survive_empty_corpora(ray_session, tmp_path):
    """Empty documents/embeddings/transcripts must flow through every new
    operator without crashing (to_pandas of an all-empty Dataset is
    column-less — the driver-side tiny-collect paths need explicit guards)."""
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.functions.curation import (
        q_doc_chunks,
        q_source_overlap,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.functions.sampling import (
        q_source_mix,
        q_top_docs_per_source,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.functions.simsearch import (
        q_embed_quantize,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.stages import (
        loganalytics as la,
    )

    d = str(tmp_path / "empty")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
            }
        ),
        f"{d}/documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        ),
        f"{d}/embeddings.parquet",
    )
    tdir = str(tmp_path / "empty_t")
    shutil.rmtree(tdir, ignore_errors=True)
    os.makedirs(tdir)
    pq.write_table(
        pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "role": pa.array([], pa.string()),
                "text": pa.array([], pa.string()),
                "tool": pa.array([], pa.string()),
                "ts": pa.array([], pa.timestamp("us")),
            }
        ),
        f"{tdir}/part-0.parquet",
    )

    assert q_doc_chunks(d).count() == 0
    assert q_source_overlap(d).count() == 0
    assert q_top_docs_per_source(d).count() == 0
    assert q_embed_quantize(d).count() == 0
    mix = q_source_mix(d)
    assert len(mix) == 0 and list(mix.columns) == [
        "source", "n_docs", "n_tokens", "weight_q", "mix_share",
    ]
    rt = lambda: ray.data.read_parquet(tdir)  # noqa: E731
    assert la.log_templates(rt()).count() == 0
    assert la.role_transitions(rt()).count() == 0
    assert la.turn_hopping(rt()).count() == 0
    assert la.rate_anomaly(rt()).count() == 0


def test_source_overlap_jaccard(ray_session, tmp_path):
    from fluent_plugin_kubernetes_metadata_filter_ray.functions.curation import (
        q_source_overlap,
    )

    # a: {x,y,z}; b: {y,z,w}; c: {q}; null source excluded
    rows = [
        (1, "x y z", "a"),
        (2, "y z w", "b"),
        (3, "q", "c"),
        (4, "x y", None),
    ]
    d = _docs_dir(tmp_path, rows)
    out = q_source_overlap(d).to_pandas()
    out = out.set_index(["source_a", "source_b"]).sort_index()
    # only the overlapping pair appears
    assert list(out.index) == [("a", "b")]
    assert out.loc[("a", "b"), "n_common"] == 2  # {y, z}
    assert out.loc[("a", "b"), "jaccard"] == 2 / 4  # |union| = {x,y,z,w}


def test_source_overlap_survives_sentinel_token_and_mix_null_text(
    ray_session, tmp_path
):
    """Regression (code review): (a) a document containing the literal
    sentinel token string must not crash the overlap join or leak a
    sentinel pair; (b) a source whose docs all have null text gets
    n_tokens=0 in the mix table on BOTH sides (the oracle coalesces the
    all-NULL sum)."""
    import duckdb

    from fluent_plugin_kubernetes_metadata_filter_ray.functions.curation import (
        q_source_overlap,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.functions.sampling import (
        q_source_mix,
        source_mix_oracle_sql,
    )

    rows = [
        (1, "hello \x00sent_a world", "web"),  # sentinel token in real text
        (2, "hello there", "book"),
        (3, None, "nulls"),
        (4, None, "nulls"),
    ]
    d = _docs_dir(tmp_path, rows)
    out = q_source_overlap(d).to_pandas()
    # 'hello' is shared; no sentinel source appears anywhere
    assert not (out["source_a"].str.startswith("\x00")).any()
    assert not (out["source_b"].str.startswith("\x00")).any()
    assert set(zip(out["source_a"], out["source_b"])) == {("book", "web")}

    mix = q_source_mix(d).set_index("source")
    assert mix.loc["nulls", "n_tokens"] == 0
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{d}/documents.parquet')"
    )
    ora = con.execute(source_mix_oracle_sql()).df().set_index("source")
    assert ora.loc["nulls", "n_tokens"] == 0
    assert str(ora["n_tokens"].dtype).startswith("int")
