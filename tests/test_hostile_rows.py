"""Hostile-input hardening: rows with null/malformed fields must flow
through parse → enrich unenriched (matched=0), never crash the pipeline.
Mirrors the reference's defensive behavior (filter passes records through
untouched when the tag doesn't parse or the store misses —
filter_kubernetes_metadata.rb `filter_stream` rescue paths)."""

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _hostile_dir(tmp_path) -> str:
    d = str(tmp_path / "hostile")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    t = pa.table(
        {
            "conv_id": pa.array(["c1", "c1", "c2", None, "c3", "c4"], pa.string()),
            "turn_idx": pa.array([0, 1, 0, 0, 0, 0], pa.int32()),
            "role": pa.array(["user", None, "tool", "assistant", "user", "tool"], pa.string()),
            "text": pa.array(
                [
                    "ok",
                    None,
                    'turn-2 type=purchase props={"k": broken',  # malformed JSON
                    "",
                    "x" * 10000,  # oversized
                    "no props here",
                ],
                pa.string(),
            ),
            "tool": pa.array(
                [
                    "var.log.containers.POD-0_NS-5_APP-ABC.log",  # upper-case + bad hash
                    None,  # null tag
                    "var.log.pods.ns-4_pod-1_.app.0.log",  # empty pod uuid
                    "not.a.kube.tag",  # grammar miss
                    "var.log.containers.pod-0_ns-5_app-" + "0" * 64 + ".log",
                    "",
                ],
                pa.string(),
            ),
            "ts": pa.array([pd.Timestamp("2024-01-02")] * 6, pa.timestamp("us")),
        }
    )
    pq.write_table(t, f"{d}/part-0.parquet")
    return d


def test_hostile_rows_pass_through_unenriched(ray_session, tmp_path):
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray import datagen
    from fluent_plugin_kubernetes_metadata_filter_ray.config import DEFAULT_CONFIG
    from fluent_plugin_kubernetes_metadata_filter_ray.stages import enrich as en
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.parse import parse_stage

    ds = ray.data.read_parquet(_hostile_dir(tmp_path))
    parsed = parse_stage(ds, DEFAULT_CONFIG)
    out = en.decode_stage(
        en.enrich_stage(parsed, DEFAULT_CONFIG, datagen.metadata_snapshot_dir())
    ).to_pandas()

    assert len(out) == 6  # nothing dropped, nothing crashed
    matched = out["k8s_pod_id"].notna()
    # only the two grammatical kube tags enrich; hostile rows stay bare
    assert matched.sum() == 2
    assert set(out.loc[matched, "k8s_pod_name"]) == {"pod-0", "pod-1"}
    hostile = out[~matched]
    for col in ("k8s_pod_name", "k8s_namespace_name", "k8s_container_name"):
        assert hostile[col].isna().all()


def test_hostile_rows_window_and_redact(ray_session, tmp_path):
    """The windowed and scrubbing stages must survive the same hostile rows:
    null conv_id forms its own group, null text/tool stay null, nothing
    dropped."""
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.aggregate import (
        conv_sessions,
        turn_rolling,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.redact import redact_stage

    ds = ray.data.read_parquet(_hostile_dir(tmp_path))

    rolled = turn_rolling(ds).to_pandas()
    assert len(rolled) == 6
    # the null conv_id row survives the groupby (as one SQL-style group)
    assert rolled["conv_id"].isna().sum() == 1
    # all six rows share one ts → each conv's rows count only themselves
    assert rolled.groupby("conv_id", dropna=False)["n_last_hour"].max().le(2).all()
    assert rolled["n_last_hour"].ge(1).all()

    sessions = conv_sessions(ds).to_pandas()
    # one session per conv (all at one ts), incl. the null-conv group
    assert len(sessions) == 5 and sessions["conv_id"].isna().sum() == 1
    assert sessions["n_turns"].sum() == 6

    scrubbed = redact_stage(ds).to_pandas()
    assert len(scrubbed) == 6
    nulls = scrubbed["text"].isna()
    assert nulls.sum() == 1 and scrubbed.loc[~nulls, "text"].notna().all()
    # the 64-hex docker id in the tool tag is masked; null tool stays null
    assert scrubbed["tool"].str.contains("0" * 64).fillna(False).sum() == 0
    assert (scrubbed["n_redacted"] >= 0).all()


def test_hostile_docs_null_source_strata(ray_session, tmp_path):
    """Docs with a null source form one SQL-style stratum in the
    source-keyed map_groups operators instead of crashing the key sort."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import curation, sampling

    d = str(tmp_path / "nsdocs")
    os.makedirs(d)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a b", "c", "d e f", "g"], pa.string()),
            "source": pa.array(["web", None, None, "web"], pa.string()),
        }
    )
    pq.write_table(t, f"{d}/documents.parquet")

    strat = sampling.q_doc_sample_stratified(d).to_pandas()
    assert len(strat) == 4  # k ≥ group sizes → everything kept
    assert strat["source"].isna().sum() == 2

    packed = curation.q_doc_pack(d).to_pandas().sort_values("doc_id")
    assert len(packed) == 4
    assert packed["source"].isna().sum() == 2
    # null stratum packs independently: doc 2 at offset 0, doc 3 at 1
    assert packed.set_index("doc_id")["pack_offset"].loc[[2, 3]].tolist() == [0, 1]


def test_blank_corpus_lm_and_heavy(ray_session, tmp_path):
    """An all-blank corpus (no tokens anywhere) must produce an empty model
    (no ZeroDivision on ln(1/0)) and zero heavy hitters, not a crash."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import textstats

    d = str(tmp_path / "blankdocs")
    os.makedirs(d)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["", "   "], pa.string()),
        }
    )
    pq.write_table(t, f"{d}/documents.parquet")

    side = textstats._lm_side(textstats._lm_vocab_ds(d))
    assert side == {"lq": {}, "oov": 0}
    scored = textstats.q_doc_lm_score(d).to_pandas()
    assert scored["n_tokens"].tolist() == [0, 0]
    assert not scored["lm_keep"].any()

    heavy = textstats.q_token_heavy(d)
    assert heavy.count() == 0


def test_centroid_partial_empty_block():
    """Empty blocks reach map_batches kernels mid-stream; the centroid
    combiner must emit a typed empty partial, not die in reshape(0, -1)."""
    import pyarrow as pa
    from fluent_plugin_kubernetes_metadata_filter_ray.functions.simsearch import (
        _centroid_partial,
    )

    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
            "label": pa.array([], pa.int32()),
        }
    )
    out = _centroid_partial(empty)
    assert len(out) == 0
    assert out.schema.field("qsum").type == pa.int64()


def test_hostile_docs_lm_score(ray_session, tmp_path):
    """LM scoring over docs with null / empty / whitespace-only text: rows
    flow through with n_tokens 0, score 0, keep False."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import textstats

    d = str(tmp_path / "docs")
    os.makedirs(d)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a b a", None, "", "   "], pa.string()),
        }
    )
    pq.write_table(t, f"{d}/documents.parquet")
    side_ref = ray.put(textstats._lm_side(textstats._lm_vocab_ds(d)))
    import ray.data
    out = (
        textstats.lm_score_stage(ray.data.read_parquet(f"{d}/documents.parquet"), side_ref)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [3, 0, 0, 0]
    assert (out.loc[1:, "logprob_q"] == 0).all()
    assert out["lm_keep"].tolist()[1:] == [False, False, False]
    assert out["lm_keep"][0]  # p(a)=2/3, p(b)=1/3 → avg ln ≈ -0.5 > gate


def test_null_text_docs_rank_like_oracle(ray_session, tmp_path):
    """ADVICE r2 (medium): the null-text contract must be ONE definition
    mirrored in both twins.  Engine n_tokens fillna(0) + oracle
    coalesce(len(toks),0) → a null-text doc scores exactly 0.3 on BOTH
    sides and ranks identically (previously: engine cast NaN→INT64_MIN and
    ranked it last; the oracle's least()-skips-NULL scored 0.8 and ranked
    it first).  Exercises q_doc_stats, q_doc_rank and
    q_top_docs_per_source over a corpus the sf gate can't produce."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import (
        curation,
        sampling,
        textstats,
    )

    d = str(tmp_path / "nulltext")
    os.makedirs(d)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            # doc 2: null text — the advisor's exact divergence scenario
            "text": pa.array(["the quick fox", None, "zz zz zz zz"], pa.string()),
            "source": pa.array(["web", "web", "web"], pa.string()),
        }
    )
    pq.write_table(t, f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{d}/documents.parquet')"
    )

    for q, sql, key in (
        (textstats.q_doc_stats, textstats.doc_stats_oracle_sql(), ["doc_id"]),
        (curation.q_doc_rank, curation.doc_rank_oracle_sql(), ["doc_rank"]),
        (
            sampling.q_top_docs_per_source,
            sampling.top_docs_per_source_oracle_sql(),
            ["source", "rnk"],
        ),
    ):
        a = q(d).to_pandas().sort_values(key, kind="mergesort").reset_index(drop=True)
        b = con.execute(sql).fetchdf().sort_values(key, kind="mergesort").reset_index(drop=True)
        assert list(a.columns) == list(b.columns)
        assert len(a) == len(b) == 3
        for c in a.columns:
            am, bm = a[c].fillna("@").astype(str), b[c].fillna("@").astype(str)
            assert (am == bm).all(), f"{c}: {a[c].tolist()} vs {b[c].tolist()}"
    # the null-text doc itself: quality 0.3, 'und', zero token stats
    st = textstats.q_doc_stats(d).to_pandas().set_index("doc_id")
    assert st.loc[2, "n_tokens"] == 0
    assert st.loc[2, "quality_score"] == 0.3
    assert st.loc[2, "lang_pred"] == "und"
    con.close()


def test_hostile_docs_fertility_twin(ray_session, tmp_path):
    """Null lang, null/blank text and non-ASCII words must agree with the
    DuckDB twin row for row: null lang is its own group, zero-word langs
    report NULL fertility, and the BPE ladder sees the same unicode
    left-to-right replace semantics on both sides."""
    import duckdb
    import numpy as np
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import textstats

    d = str(tmp_path / "fertdocs")
    os.makedirs(d)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "text": pa.array(
                ["the theme of the another", None, "  ", "añejo über 東京 the",
                 "in inn inning", ""],
                pa.string(),
            ),
            "lang": pa.array(["en", None, "zz", None, "en", "zz"], pa.string()),
        }
    )
    pq.write_table(t, f"{d}/documents.parquet")

    got = textstats.q_token_fertility(d).to_pandas()
    got = got.sort_values("lang", na_position="first").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{d}/documents.parquet')"
    )
    op = con.execute(textstats.token_fertility_oracle_sql()).df()
    op = op.sort_values("lang", na_position="first").reset_index(drop=True)
    assert list(got["lang"].fillna("∅")) == list(op["lang"].fillna("∅"))
    for c in ("n_docs", "n_words", "n_bpe_tokens"):
        assert (got[c].to_numpy() == op[c].to_numpy()).all(), c
    ge, oe = got["fertility"].to_numpy(), op["fertility"].to_numpy()
    both_nan = np.isnan(ge) & np.isnan(oe)
    assert ((ge == oe) | both_nan).all()
    # the zz stratum is all-blank → NULL fertility on both sides
    assert np.isnan(got.loc[got["lang"] == "zz", "fertility"]).all()


def test_embed_outliers_planted_outlier(ray_session, tmp_path):
    """A single wildly-scaled vector must surface at rank 1 and the ranking
    must agree with the DuckDB twin exactly."""
    import duckdb
    import numpy as np
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import simsearch as ss

    d = str(tmp_path / "outemb")
    os.makedirs(d)
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((40, 8)).astype(np.float32)
    mat[17] = 50.0  # planted outlier
    t = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([r.tolist() for r in mat], pa.list_(pa.float32())),
            "label": pa.array([0] * 40, pa.int32()),
        }
    )
    pq.write_table(t, f"{d}/embeddings.parquet")

    got = ss.q_embed_outliers(d).to_pandas().sort_values("rank").reset_index(drop=True)
    assert got.loc[0, "vec_id"] == 17
    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from read_parquet('{d}/embeddings.parquet')"
    )
    op = con.execute(ss.embed_outliers_oracle_sql()).df()
    op = op.sort_values("rank").reset_index(drop=True)
    for c in ("vec_id", "dist_q", "rank"):
        assert (got[c].to_numpy() == op[c].to_numpy()).all(), c
