"""Round-2 hardening: empty-text tokenization twins, deterministic
oracle-replicated LSH bucket cap + clip counter (ADVICE r1 low findings,
VERDICT r1 'What's wrong' #2)."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _mini_sf(tmp_path, texts):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, os.path.join(sf, "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf}/documents.parquet')"
    )
    return sf, con


def _compare(res_ds, con, sql):
    import pandas as pd

    rp = res_ds.to_pandas()
    op = con.execute(sql).df()
    cols = sorted(rp.columns)
    assert cols == sorted(op.columns)
    fmt = lambda df: df[cols].map(
        lambda v: None if pd.isna(v) else (f"{v:.6f}" if isinstance(v, float) else str(v))
    ).sort_values(cols).reset_index(drop=True)
    a, b = fmt(rp), fmt(op)
    assert a.equals(b), f"ray:\n{a}\noracle:\n{b}"


@pytest.mark.parametrize("qname", ["q_doc_stats", "q_doc_fingerprint",
                                   "q_token_freq", "q_doc_normalize",
                                   "q_doc_tokens_bpe", "q_token_vocab_growth"])
def test_empty_text_twins(ray_session, tmp_path, qname):
    """Python ''.split() yields 0 tokens; the SQL twins must agree (bare
    regexp_split_to_array(trim(''), ..) would yield [''])."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import textstats

    sf, con = _mini_sf(tmp_path, ["", "   ", "\t\n", "a b the a", "the a"])
    q = getattr(textstats, qname)
    sql = getattr(textstats, qname.replace("q_", "") + "_oracle_sql")()
    _compare(q(sf), con, sql)


def test_empty_text_dedup_twins(ray_session, tmp_path):
    """SimHash tokenizes per token (no shingle-length gate), so the empty
    guard matters there too."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import dedup

    sf, con = _mini_sf(
        tmp_path,
        ["", "  ", "x y z w v u", "y z w v u", "x y z w v u", "q r s t u v"],
    )
    _compare(dedup.q_dedup_simhash(sf), con, dedup.dedup_simhash_oracle_sql())
    _compare(dedup.q_dedup_minhash(sf), con, dedup.dedup_minhash_oracle_sql())
    _compare(dedup.q_dedup_ngram(sf), con, dedup.dedup_ngram_oracle_sql())


def test_bucket_clip_deterministic_and_oracle_replicated(ray_session, tmp_path):
    """A bucket bigger than MAX_BUCKET keeps its smallest doc_ids on BOTH
    sides, so the clipped result still matches the oracle exactly."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import dedup

    n = dedup.MAX_BUCKET + 60  # one all-identical bucket, guaranteed clipped
    sf, con = _mini_sf(tmp_path, ["spam ham eggs spam ham"] * n)
    res = dedup.q_dedup_minhash(sf).to_pandas()
    k = dedup.MAX_BUCKET
    # the all-identical original docs (plus their exact +2M copies) share one
    # bucket of >MAX_BUCKET rows; only the k smallest doc_ids survive the cap
    orig = res[(res["doc_a"] < 1_000_000) & (res["doc_b"] < 1_000_000)]
    assert len(orig) == k * (k - 1) // 2
    assert orig["doc_a"].max() < k and orig["doc_b"].max() < k
    _compare(dedup.q_dedup_minhash(sf), con, dedup.dedup_minhash_oracle_sql())


def test_clip_counter_and_dump(tmp_path, monkeypatch):
    """The clip is surfaced: counter bumps and (with KMETA_STATS_DIR set) a
    per-process stats dump appears — never a silent truncation."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import dedup
    from fluent_plugin_kubernetes_metadata_filter_ray.state.stats import (
        collect_dumped_counters,
    )

    dump_dir = str(tmp_path / "stats")
    monkeypatch.setenv("KMETA_STATS_DIR", dump_dir)
    before = dedup._CLIP_STATS.counters.get("lsh_bucket_clipped", 0)
    n = dedup.MAX_BUCKET + 10
    sig = np.arange(16, dtype=np.uint32).tobytes()  # identical → est 16/16
    group = pa.table(
        {
            "doc_id": pa.array(np.arange(n)[::-1], pa.int64()),  # reverse order in
            "band_idx": pa.array([0] * n, pa.int32()),
            "band_val": pa.array(["b"] * n, pa.string()),
            "sig": pa.array([sig] * n, pa.binary()),
        }
    )
    pairs = dedup._emit_pairs_sorted_block(group)
    k = dedup.MAX_BUCKET
    assert len(pairs) == k * (k - 1) // 2
    assert pairs.column("doc_a").to_pylist()[0] == 0  # smallest ids kept, sorted
    assert dedup._CLIP_STATS.counters["lsh_bucket_clipped"] == before + 1
    merged = collect_dumped_counters(dump_dir)
    assert merged["lsh_bucket_clipped"] >= 1
    assert merged["lsh_bucket_clip_max_rows"] == n


def test_minhash_zero_pairs_lazy_guard(ray_session, tmp_path):
    """A pair-free corpus must flow the whole lazy join pipeline (sentinel
    row keeps every stage schema-typed — no driver materialize barrier) and
    come out empty WITH the typed 3-column schema; clusters degrade to the
    identity assignment."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import dedup

    # every text is shorter than SHINGLE_K tokens -> no shingles anywhere
    # (augmented copies included) -> zero band rows, zero candidate pairs
    texts = [f"t{i} u{i}" for i in range(6)]
    sf, con = _mini_sf(tmp_path, texts)
    ds = dedup.q_dedup_minhash(sf)
    assert ds.count() == 0
    # (to_pandas of a fully-empty Dataset drops columns — a Ray quirk that
    # predates the lazy guard — so assert schema on the Dataset itself)
    assert sorted(ds.schema().names) == ["doc_a", "doc_b", "jaccard"]
    assert con.execute(dedup.dedup_minhash_oracle_sql()).df().empty
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import corpus as cp

    clusters = dedup.q_dedup_clusters(sf).to_pandas()
    assert len(clusters) == cp.read_augmented_ids(sf).count()
    assert (clusters["doc_id"] == clusters["canonical_id"]).all()
    assert (clusters["is_kept"] == 1).all()


def test_fuzzy_incremental_pair_free_and_oracle(ray_session, tmp_path):
    """Fuzzy incremental dedup on a pair-free corpus: every new-split doc
    comes back un-flagged (count 0), matching the oracle — the sentinel
    threading keeps the whole composed pipeline typed with zero pairs."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import dedup

    texts = [f"t{i} u{i}" for i in range(6)]  # < SHINGLE_K tokens → no pairs
    sf, con = _mini_sf(tmp_path, texts)
    ds = dedup.q_dedup_incremental_fuzzy(sf)
    _compare(ds, con, dedup.dedup_incremental_fuzzy_oracle_sql())
    df = ds.to_pandas()
    assert len(df) > 0 and not df["is_fuzzy_dup"].any()


def test_heavy_hitters_sentinel_collision_proof(ray_session, tmp_path):
    """A doc trying to spoof the heavy-hitter total sentinel can't: the
    sentinel contains a space, which no whitespace-split token can, so the
    hostile token is counted and reported like any other."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import textstats

    hostile = "\x00total"
    texts = [f"{hostile} {hostile} {hostile}", f"{hostile} x"]
    sf, con = _mini_sf(tmp_path, texts)
    out = textstats.q_token_heavy(sf).to_pandas()
    row = out[out["token"] == hostile]
    assert len(row) == 1 and int(row["n"].iloc[0]) == 4
    _compare(textstats.q_token_heavy(sf), con, textstats.token_heavy_oracle_sql())


def test_cluster_label_propagation_deep_chain(ray_session, tmp_path):
    """Sliding-window docs form a near-dup CHAIN (adjacent windows share
    most shingles, distant ones don't): min-label propagation must walk the
    whole diameter, not just one hop — and still match the recursive-SQL
    oracle exactly."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import dedup

    toks = [f"w{i}" for i in range(56)]
    texts = [" ".join(toks[i:i + 16]) for i in range(0, 40)]  # stride 1
    sf, con = _mini_sf(tmp_path, texts)
    res = dedup.q_dedup_clusters(sf).to_pandas()
    _compare(dedup.q_dedup_clusters(sf), con, dedup.dedup_clusters_oracle_sql())
    orig = res[res["doc_id"] < 1_000_000]
    # LSH may drop a few adjacent pairs (J≈0.87 ⇒ ~4% band-miss per pair —
    # the oracle predicts the exact same drops), but surviving chain
    # segments must be collapsed end-to-end: components span many hops
    # (each edge spans ≤4 positions), which needs iterated propagation.
    sizes = orig.groupby("canonical_id").size()
    assert sizes.max() >= 8
    assert orig["canonical_id"].nunique() <= 10
    # every canonical is its component's minimum and is flagged kept
    kept = orig[orig["is_kept"] == 1]
    assert set(kept["doc_id"]) == set(orig["canonical_id"].unique())


def test_cluster_assign_200_link_chain_converges(ray_session, caplog):
    """VERDICT r3 task 6: a pathological 200-link chain (diameter ≫
    CLUSTER_MAX_ITERS=30) must still converge — pointer jumping makes
    rounds O(log diameter), so the run finishes WITHOUT the max-iters
    warning and every node collapses to canonical 0."""
    import logging

    import pyarrow as pa
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.functions import dedup

    n = 201  # chain 0-1-2-…-200
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array(range(n - 1), pa.int64()),
                "doc_b": pa.array(range(1, n), pa.int64()),
            }
        )
    )
    ids = ray.data.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
    with caplog.at_level(
        logging.WARNING, logger="fluent_plugin_kubernetes_metadata_filter_ray.functions.dedup"
    ):
        out = dedup.cluster_assign(pairs, ids).to_pandas().sort_values("doc_id")
    assert "CLUSTER_MAX_ITERS" not in caplog.text  # converged, no warning
    assert (out["canonical_id"] == 0).all()
    assert out["is_kept"].tolist() == [1] + [0] * (n - 1)


def test_ngram_jaccard_prefix_filter_lossless(ray_session, tmp_path):
    """The prefix filter is an EXACT candidate generator: every pair with
    true shingle-set Jaccard >= 0.6 must appear (no LSH recall loss), with
    exactly the brute-force Jaccard values.  Brute force recomputed here
    independently of the oracle SQL."""
    import itertools

    from fluent_plugin_kubernetes_metadata_filter_ray.functions import corpus as cp
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import dedup

    # texts engineered across the threshold: near-identical, one-token edits,
    # disjoint, plus short docs near the shingle-length gate
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",   # 1-gram tail edit
        "alpha beta gamma delta epsilon zeta eta theta",  # exact dup of 0
        "one two three four five six",
        "one two three four five seven",
        "totally different words here entirely",
        "alpha beta gamma",                                # single shingle
        "alpha beta gamma",                                # its dup
        "", "tiny doc",                                    # no shingles
    ]
    sf, con = _mini_sf(tmp_path, texts)

    def sset(text):
        toks = text.split()
        return {cp.w63(s) for s in cp.shingles(toks)}

    # brute force over the AUGMENTED corpus (the query reads it augmented)
    docs = {}
    for i, t in enumerate(texts):
        docs[i] = t
        if i % cp.AUG_MOD == 0:
            docs[i + cp.AUG_OFFSET] = " ".join(t.split()[1:])
        if i % cp.EXACT_MOD == 0:
            docs[i + 2 * cp.AUG_OFFSET] = t
    sets = {i: sset(t) for i, t in docs.items() if sset(t)}
    expect = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        j = inter / union if union else 0.0
        if j >= cp.NGRAM_JACCARD_THRESHOLD:
            expect[(a, b)] = j

    got = dedup.q_dedup_ngram(sf).to_pandas()
    got_pairs = {
        (int(r.doc_a), int(r.doc_b)): float(r.jaccard) for r in got.itertuples()
    }
    assert got_pairs.keys() == expect.keys(), (
        f"missing={expect.keys() - got_pairs.keys()} "
        f"extra={got_pairs.keys() - expect.keys()}"
    )
    for k, v in expect.items():
        assert got_pairs[k] == v
    # and the DuckDB twin agrees bit-for-bit
    _compare(dedup.q_dedup_ngram(sf), con, dedup.dedup_ngram_oracle_sql())


def test_gopher_flags_hostile_twins(ray_session, tmp_path):
    """Gopher rule edges: null text, empty, unicode digits, bullet-only
    lines, ellipsis runs ('....' counts ONE on both sides), exact
    threshold boundaries (integer forms must agree with the SQL)."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import sampling

    texts = [
        None,
        "",
        "- bullet one\n- bullet two\n- bullet three",
        "trailing dots...\nand more....\nplain line",
        "the be to of and that have with " + "word " * 50,
        "#### #hash heavy # " + "a " * 20,
        "• unicode bullet\n•no-space bullet\nnormal",
        ("xx " * 50).strip(),          # mean word len 2 → fails r2
        ("abc " * 50).strip(),         # mean word len 3 → boundary pass
        "²³ ¼½ unicode digits only",
        "one\n\n\nthree",               # empty lines
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    pq.write_table(t, os.path.join(sf, "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf}/documents.parquet')"
    )
    _compare(
        sampling.q_doc_gopher_flags(sf), con,
        sampling.doc_gopher_flags_oracle_sql(),
    )


def test_ngram_bucket_clip_deterministic_and_oracle_replicated(ray_session, tmp_path):
    """A prefix bucket bigger than MAX_BUCKET keeps its smallest doc_ids on
    BOTH sides (engine argsort cap vs oracle row_number), so the clipped
    exact-join result still matches the oracle exactly — the one place the
    'lossless' guarantee is deliberately traded for a deterministic bound."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import dedup

    n = dedup.MAX_BUCKET + 60  # one all-identical corpus: every prefix bucket hot
    sf, con = _mini_sf(tmp_path, ["spam ham eggs spam ham"] * n)
    res = dedup.q_dedup_ngram(sf).to_pandas()
    k = dedup.MAX_BUCKET
    orig = res[(res["doc_a"] < 1_000_000) & (res["doc_b"] < 1_000_000)]
    assert len(orig) == k * (k - 1) // 2
    assert orig["doc_a"].max() < k and orig["doc_b"].max() < k
    assert (orig["jaccard"] == 1.0).all()
    _compare(dedup.q_dedup_ngram(sf), con, dedup.dedup_ngram_oracle_sql())
