"""Bounded vocab broadcasts (VERDICT r3 task 1): q_doc_tfidf and
q_doc_lm_score must produce IDENTICAL results on the broadcast tier and on
the forced hash-join tier (cap=0), and both must match the DuckDB oracle —
so driver memory never grows with corpus content while the twins stay
bit-exact (libm idf/logprob per distinct count on both tiers)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _docs_dir(tmp_path, name, texts):
    d = str(tmp_path / name)
    os.makedirs(d, exist_ok=True)
    t = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(["web"] * len(texts), pa.string()),
        }
    )
    pq.write_table(t, f"{d}/documents.parquet")
    return d


_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the the the repeated token stream the",
    None,
    "",
    "   ",
    "singleton hapax legomenon vocabulary entries galore",
    "quick brown quick brown quick",
    "a b c d e f g h",
    "a a b b c c",
]


def _oracle(d, sql):
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{d}/documents.parquet')"
    )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _cmp_exact(a: pd.DataFrame, b: pd.DataFrame, keys):
    a = a.sort_values(keys, kind="mergesort").reset_index(drop=True)
    b = b.sort_values(keys, kind="mergesort").reset_index(drop=True)
    assert sorted(a.columns) == sorted(b.columns)
    assert len(a) == len(b)
    for c in sorted(a.columns):
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating):
            assert np.array_equal(
                av.to_numpy(), bv.to_numpy(np.float64), equal_nan=True
            ), c  # bit-exact, not allclose
        else:
            assert (av.fillna("@").astype(str) == bv.fillna("@").astype(str)).all(), c


@pytest.mark.parametrize("op", ["tfidf", "lm"])
def test_join_tier_matches_broadcast_and_oracle(ray_session, tmp_path, monkeypatch, op):
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import curation, textstats

    d = _docs_dir(tmp_path, f"bb-{op}", _TEXTS)
    if op == "tfidf":
        q, sql, keys = curation.q_doc_tfidf, curation.doc_tfidf_oracle_sql(), ["doc_id", "rnk"]
        env = "KMETA_TFIDF_BROADCAST_MAX"
    else:
        q, sql, keys = (
            textstats.q_doc_lm_score,
            textstats.doc_lm_score_oracle_sql(),
            ["doc_id"],
        )
        env = "KMETA_LM_BROADCAST_MAX"

    bc = q(d).to_pandas()
    monkeypatch.setenv(env, "0")  # force the hash-join tier
    jn = q(d).to_pandas()
    _cmp_exact(bc, jn, keys)
    _cmp_exact(jn, _oracle(d, sql), keys)


@pytest.mark.parametrize("op", ["tfidf", "lm"])
def test_join_tier_blank_corpus(ray_session, tmp_path, monkeypatch, op):
    """Forced join tier on an all-blank corpus: the sentinel threading must
    carry the empty token stream through the shuffle (Ray 2.49 empty-first-
    block race), not crash or hang."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import curation, textstats

    d = _docs_dir(tmp_path, f"blank-{op}", ["", "   ", None])
    if op == "tfidf":
        monkeypatch.setenv("KMETA_TFIDF_BROADCAST_MAX", "-1")
        out = curation.q_doc_tfidf(d).to_pandas()
        assert len(out) == 0
    else:
        monkeypatch.setenv("KMETA_LM_BROADCAST_MAX", "-1")
        out = textstats.q_doc_lm_score(d).to_pandas().sort_values("doc_id")
        assert out["n_tokens"].tolist() == [0, 0, 0]
        assert not out["lm_keep"].any()


@pytest.mark.parametrize("seed", [3, 41, 77])
def test_tiers_agree_on_random_corpora(ray_session, tmp_path, monkeypatch, seed):
    """Randomized corpora (unicode tokens, heavy duplication, blank/null
    rows, multi-shard): broadcast tier and forced-join tier must be
    bit-identical for BOTH ops — the cap must never change results."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import curation, textstats

    rng = np.random.default_rng(seed)
    vocab = ["the", "naïve", "Ω", "x1", "zz", "a-b", "répète", "q"]
    texts = []
    for _ in range(60):
        k = rng.integers(0, 12)
        texts.append(" ".join(rng.choice(vocab, k)) if k else rng.choice(["", "  ", None]))
    d = str(tmp_path / f"rand-{seed}")
    os.makedirs(d)
    t = pa.table(
        {
            "doc_id": pa.array(range(60), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(["w"] * 60, pa.string()),
        }
    )
    # one file (the corpus readers take documents.parquet); multi-block
    # comes from the reader's block splitting
    pq.write_table(t, f"{d}/documents.parquet")

    for q, env, keys in (
        (curation.q_doc_tfidf, "KMETA_TFIDF_BROADCAST_MAX", ["doc_id", "rnk"]),
        (textstats.q_doc_lm_score, "KMETA_LM_BROADCAST_MAX", ["doc_id"]),
    ):
        monkeypatch.delenv(env, raising=False)
        bc = q(d).to_pandas()
        monkeypatch.setenv(env, "0")
        jn = q(d).to_pandas()
        _cmp_exact(bc, jn, keys)
