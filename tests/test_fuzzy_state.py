"""Persisted prior-crawl LSH state for incremental fuzzy dedup (VERDICT r4
task 1): the resume path must (a) produce the exact full-recompute result
and (b) provably never re-shingle the prior crawl's documents."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def _texts(n=24):
    # long shared boilerplate → plenty of cross-split near-dup pairs
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    out = []
    for i in range(n):
        out.append(f"{base} family{i % 4} tail{i % 2} end of document {i % 3}")
    return out


def _write_sf(path, texts):
    os.makedirs(path, exist_ok=True)
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, os.path.join(path, "documents.parquet"))
    return path


def _frame(ds):
    df = ds.to_pandas()
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_fuzzy_resume_matches_full_and_oracle(ray_session, tmp_path):
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import dedup

    sf = _write_sf(str(tmp_path / "sf"), _texts())
    full = _frame(dedup.q_dedup_incremental_fuzzy(sf))
    assert full["is_fuzzy_dup"].any()  # corpus actually has cross-split dups
    resume = _frame(
        dedup.q_dedup_incremental_fuzzy_resume(sf, state_dir=str(tmp_path / "st"))
    )
    assert full.equals(resume), f"full:\n{full}\nresume:\n{resume}"
    # the checkpoint exists and is reusable (idempotent second write)
    assert os.path.exists(str(tmp_path / "st") + ".done")
    again = _frame(
        dedup.q_dedup_incremental_fuzzy_resume(sf, state_dir=str(tmp_path / "st"))
    )
    assert full.equals(again)
    # oracle twin unchanged by the resume machinery
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf}/documents.parquet')"
    )
    op = con.execute(dedup.dedup_incremental_fuzzy_oracle_sql()).df()
    op = op[sorted(op.columns)].sort_values(sorted(op.columns)).reset_index(drop=True)
    assert list(op.columns) == list(full.columns)
    assert (op["doc_id"].to_numpy() == full["doc_id"].to_numpy()).all()
    assert (op["is_fuzzy_dup"].to_numpy() == full["is_fuzzy_dup"].to_numpy()).all()


def test_fuzzy_resume_never_reshingles_history(ray_session, tmp_path):
    """Corrupt every PRIOR-CRAWL document's text on disk after the state
    checkpoint is written: a resume run reading the corrupted corpus must
    still return the intact-corpus result — the only way that holds is if
    the prior split's shingle/minhash pass never re-ran."""
    import numpy as np

    from fluent_plugin_kubernetes_metadata_filter_ray.functions import dedup
    from fluent_plugin_kubernetes_metadata_filter_ray.functions.corpus import (
        AUG_MOD,
        EXACT_MOD,
    )

    texts = _texts()
    sf = _write_sf(str(tmp_path / "sf"), texts)
    state = str(tmp_path / "state")
    dedup.fuzzy_state_write(sf, state)

    # Corrupt base docs whose ENTIRE augmented family lands in the ref
    # split (base, +AUG_OFFSET near-dup, +2*AUG_OFFSET exact dup) so no
    # corrupted text can reach the resume run through a new-split variant.
    ids = np.arange(len(texts))
    from fluent_plugin_kubernetes_metadata_filter_ray.functions.corpus import AUG_OFFSET

    def split_of(i):
        return i % dedup.INCR_REF_MOD == 0

    corrupt, n_corrupted = list(texts), 0
    for i in ids:
        fam = [i]
        if i % AUG_MOD == 0:
            fam.append(i + AUG_OFFSET)
        if i % EXACT_MOD == 0:
            fam.append(i + 2 * AUG_OFFSET)
        if all(split_of(j) for j in fam):
            corrupt[i] = f"corrupted corrupted corrupted {i} zzz qqq www"
            n_corrupted += 1
    assert n_corrupted > 0, "fixture must corrupt at least one ref-only family"

    sf2 = _write_sf(str(tmp_path / "sf2"), corrupt)
    full_intact = _frame(dedup.q_dedup_incremental_fuzzy(sf))
    resumed = _frame(dedup.q_dedup_incremental_fuzzy_resume(sf2, state_dir=state))
    assert full_intact.equals(resumed), (
        "resume result drifted — the prior-crawl text was re-read"
    )
    # sanity: the corruption is strong enough that a FULL recompute over
    # the corrupted corpus disagrees (i.e. the assertion above has teeth)
    full_corrupt = _frame(dedup.q_dedup_incremental_fuzzy(sf2))
    assert not full_intact.equals(full_corrupt)


def test_ngram_resume_matches_full_and_oracle(ray_session, tmp_path):
    """The exact-join resume tier: value-identical to the full recompute
    (DF order, prefixes and bucket caps depend only on the instance-row
    multiset) and to the shared oracle."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import dedup

    sf = _write_sf(str(tmp_path / "sf"), _texts())
    full = _frame(dedup.q_dedup_ngram_incremental(sf))
    assert full["is_fuzzy_dup"].any()
    resume = _frame(
        dedup.q_dedup_ngram_incremental_resume(sf, state_dir=str(tmp_path / "st"))
    )
    assert full.equals(resume), f"full:\n{full}\nresume:\n{resume}"
    assert os.path.exists(str(tmp_path / "st") + ".done")
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf}/documents.parquet')"
    )
    op = con.execute(dedup.dedup_ngram_incremental_oracle_sql()).df()
    cols = sorted(op.columns)
    op = op[cols].sort_values(cols).reset_index(drop=True)
    assert list(full.columns) == cols and len(full) == len(op)


def test_ngram_resume_never_reshingles_history(ray_session, tmp_path):
    """Corrupt every ref-only family's text after the instance checkpoint:
    the resume must still return the intact-corpus result — only possible
    if history text is never re-tokenized."""
    import numpy as np

    from fluent_plugin_kubernetes_metadata_filter_ray.functions import dedup
    from fluent_plugin_kubernetes_metadata_filter_ray.functions.corpus import (
        AUG_MOD,
        AUG_OFFSET,
        EXACT_MOD,
    )

    texts = _texts()
    sf = _write_sf(str(tmp_path / "sf"), texts)
    state = str(tmp_path / "state")
    dedup.ngram_state_write(sf, state)

    corrupt, n_corrupted = list(texts), 0
    for i in np.arange(len(texts)):
        fam = [i]
        if i % AUG_MOD == 0:
            fam.append(i + AUG_OFFSET)
        if i % EXACT_MOD == 0:
            fam.append(i + 2 * AUG_OFFSET)
        if all(j % dedup.INCR_REF_MOD == 0 for j in fam):
            corrupt[i] = f"corrupted corrupted corrupted {i} zzz qqq www"
            n_corrupted += 1
    assert n_corrupted > 0

    sf2 = _write_sf(str(tmp_path / "sf2"), corrupt)
    full_intact = _frame(dedup.q_dedup_ngram_incremental(sf))
    resumed = _frame(
        dedup.q_dedup_ngram_incremental_resume(sf2, state_dir=state)
    )
    assert full_intact.equals(resumed), (
        "resume result drifted — the prior-crawl text was re-read"
    )
