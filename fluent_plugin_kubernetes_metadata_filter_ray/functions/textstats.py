"""Text analysis over the ``documents`` table: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

One stateless ``map_batches`` stage each (or combined); hot loops are
pandas/pyarrow vectorized except the per-row md5 (C-speed hashlib).  Every
output column has an exact DuckDB twin (integer-derived float divisions are
IEEE-identical on both sides; the quality formula uses one fixed operation
order).

At 100 TB these stages are embarrassingly parallel: no shuffle, column-pruned
reads, ~O(bytes) regex/token kernels per block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import corpus as cp

_STOP_SET = set(cp.STOPWORDS)
_SQL_STOP = ", ".join(f"'{w}'" for w in cp.STOPWORDS)


def doc_stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id → token/char counts, ratios, quality score, language guess."""
    text = batch.column("text")
    n_chars_txt = pc.utf8_length(text).cast(pa.int64())
    n_tokens_bpe = pc.count_substring_regex(text, cp.BPE_PATTERN).cast(pa.int64())
    nospace = pc.replace_substring_regex(text, r"\s+", "")
    n_nospace = pc.utf8_length(nospace).cast(pa.int64()).to_numpy(zero_copy_only=False)

    s = pd.Series(text.to_pandas())
    toks = s.str.strip().str.split()
    # NULL-TEXT CONTRACT (mirrored in doc_stats_oracle_sql): a null text has
    # n_tokens = 0 / en_stop_hits = 0, so every ratio/score derives from 0
    # (quality_score = 0.3, lang_pred = 'und') on BOTH sides.  Without the
    # fillna the NaN count casts to INT64_MIN and silently poisons every
    # downstream ranking (q_doc_rank / q_top_docs_per_source ordered a
    # null-text doc LAST while the oracle's least()-skips-NULL scored it
    # 0.8 and ranked it FIRST).  Char/BPE counts stay NULL (SQL length(NULL)
    # semantics) — they are measurements of the text, not token statistics.
    n_tokens = toks.str.len().fillna(0).to_numpy(dtype=np.int64)
    ex = toks.explode()
    stop_hits = (
        ex.isin(_STOP_SET).groupby(level=0).sum().reindex(s.index, fill_value=0)
    ).to_numpy(dtype=np.int64)

    # float columns: same operand order as the SQL twin (IEEE-identical)
    nt = n_tokens.astype(np.float64)
    avg_token_len = np.where(n_tokens > 0, n_nospace / np.where(n_tokens > 0, nt, 1.0), 0.0)
    stopword_ratio = np.where(n_tokens > 0, stop_hits / np.where(n_tokens > 0, nt, 1.0), 0.0)
    quality_score = (
        np.minimum(1.0, n_tokens / 256.0) * 0.5
        + (1.0 - stopword_ratio) * 0.3
        + np.minimum(1.0, avg_token_len / 8.0) * 0.2
    )
    lang_pred = np.where(stop_hits >= 2, "en", "und")

    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars_txt": n_chars_txt,
            "n_tokens": pa.array(n_tokens),
            "n_tokens_bpe": n_tokens_bpe,
            "avg_token_len": pa.array(avg_token_len),
            "stopword_ratio": pa.array(stopword_ratio),
            "quality_score": pa.array(quality_score),
            "en_stop_hits": pa.array(stop_hits),
            "lang_pred": pa.array(lang_pred.astype(object), pa.string()),
        }
    )


def doc_stats_oracle_sql() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, text,
    {cp.SQL_TOKS.format(t='text')} AS toks,
    length(text)::BIGINT AS n_chars_txt,
    len(regexp_extract_all(text, '{cp.BPE_PATTERN}'))::BIGINT AS n_tokens_bpe,
    length(regexp_replace(text, '\\s+', '', 'g'))::BIGINT AS n_nospace
  FROM documents
),
st AS (
  SELECT *,
    coalesce(len(toks), 0)::BIGINT AS n_tokens,
    coalesce(len(list_filter(toks, t -> t IN ({_SQL_STOP}))), 0)::BIGINT AS en_stop_hits
  FROM tok
),
rt AS (
  SELECT *,
    CASE WHEN n_tokens > 0 THEN n_nospace::DOUBLE / n_tokens ELSE 0.0 END AS avg_token_len,
    CASE WHEN n_tokens > 0 THEN en_stop_hits::DOUBLE / n_tokens ELSE 0.0 END AS stopword_ratio
  FROM st
)
SELECT doc_id, n_chars_txt, n_tokens, n_tokens_bpe, avg_token_len, stopword_ratio,
  least(1.0, n_tokens / 256.0) * 0.5 + (1.0 - stopword_ratio) * 0.3
    + least(1.0, avg_token_len / 8.0) * 0.2 AS quality_score,
  en_stop_hits,
  CASE WHEN en_stop_hits >= 2 THEN 'en' ELSE 'und' END AS lang_pred
FROM rt
""".strip()


def doc_fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Fingerprints: full-text md5 + min word-shingle rolling hash
    (winnowing-style global min over w63 k-gram hashes)."""
    texts = batch.column("text").to_pylist()
    md5s = np.empty(len(texts), dtype=object)
    minsh = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if t is None:  # null text → null md5 / no shingles, like the SQL twin
            md5s[i] = None
            minsh[i] = -1
            continue
        md5s[i] = cp.md5_hex(t)
        sh = cp.shingles(t.split(), cp.SHINGLE_K)
        minsh[i] = min((cp.w63(x) for x in sh), default=-1)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fp_md5": pa.array(md5s, pa.string()),
            "fp_minshingle": pa.array(minsh),
        }
    )


def doc_fingerprint_oracle_sql() -> str:
    w63 = cp.SQL_W63.format(s="s")
    k = cp.SHINGLE_K
    return f"""
WITH tok AS (
  SELECT doc_id, text, {cp.SQL_TOKS.format(t='text')} AS toks FROM documents
)
SELECT doc_id, md5(text) AS fp_md5,
  coalesce(
    list_min(list_transform(
      list_transform(generate_series(1, len(toks) - {k - 1}),
                     i -> list_aggregate(toks[i:i + {k - 1}], 'string_agg', ' ')),
      s -> {w63})),
    -1) AS fp_minshingle
FROM tok
""".strip()


def token_freq_partial(batch: pa.Table) -> pa.Table:
    """Per-batch token frequency (explode + combine).  The classic
    vocabulary-count job: the batch collapses to ≤|vocab| rows BEFORE the
    shuffle, so the exchange moves O(batches × vocab) short rows — at
    10^12 tokens the groupby never sees raw tokens."""
    s = pd.Series(batch.column("text").to_pandas())
    ex = s.str.strip().str.split().explode()
    vc = ex.value_counts()
    return pa.table(
        {
            "token": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
            "n": pa.array(vc.to_numpy(dtype=np.int64)),
        }
    )


def q_token_freq(sf_dir: str):
    """Corpus token frequencies: partial counts per batch, Sum-combined."""
    from ray.data.aggregate import Sum

    ds = cp.read_documents(sf_dir).map_batches(
        token_freq_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds.groupby("token").aggregate(Sum("n", alias_name="n"))


def token_freq_oracle_sql() -> str:
    return f"""
SELECT token, count(*)::BIGINT AS n
FROM (SELECT unnest({cp.SQL_TOKS.format(t='text')}) AS token FROM documents)
GROUP BY token
""".strip()


LM_Q = 1e9  # logprob quantization: floor(ln(p)·1e9) summed as exact int64
LM_KEEP_MIN = -3.6  # avg-ln-prob gate (unigram; ≈ppl 36.6 cutoff)

# Vocab-broadcast budget (VERDICT r3: the unbounded collect was the last
# driver-memory term growing with corpus CONTENT).  ≤ this many distinct
# tokens: collect + ray.put (zero corpus shuffle).  Beyond it: the model
# stays a distributed table and scoring becomes a hash join — same switch
# as q_decontaminate (curation.KMETA_DECON_BROADCAST_MAX).
LM_BROADCAST_MAX = 4_000_000

# join-side sentinel token: whitespace split can never emit a token
# containing a space, so this value cannot collide with real vocab
_SENT_TOKEN = " "


def _lm_vocab_ds(sf_dir: str):
    """Distributed corpus unigram counts: (token, n), combiner-pushed."""
    from ray.data.aggregate import Sum

    ds = cp.read_documents(sf_dir).map_batches(
        token_freq_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds.groupby("token").aggregate(Sum("n", alias_name="n")).materialize()


def _lm_side(vocab_ds) -> dict:
    """Broadcast-tier model build: token → quantized logprob (int64), plus
    the OOV floor.  Only called once the distinct-token count is known to
    fit LM_BROADCAST_MAX, so the driver collect is bounded.

    Determinism: per-token lq = floor(ln(c/N)·1e9) with math.log (libm,
    bit-identical to DuckDB ``ln``) in the exact operand order the SQL twin
    uses; int64 sums are exact, so doc scores match the oracle bit-for-bit
    (the float-sum-order trap simsearch._qdots documents)."""
    import math

    vocab = vocab_ds.to_pandas()
    n_total = int(vocab["n"].sum()) if len(vocab) else 0
    if n_total == 0:  # empty / all-blank corpus: no model, nothing scores
        return {"lq": {}, "oov": 0}
    lq = {
        t: math.floor(math.log(int(c) / n_total) * LM_Q)
        for t, c in zip(vocab["token"], vocab["n"])
    }
    oov = math.floor(math.log(1.0 / n_total) * LM_Q)
    return {"lq": lq, "oov": oov}


def _lq_from_counts(c: np.ndarray, n_total: int) -> np.ndarray:
    """counts → floor(ln(c/N)·LM_Q) int64, libm-exact: math.log per DISTINCT
    count (Zipf: few), mapped back — never numpy's 1-ulp-off SIMD log."""
    import math

    uc, inv = np.unique(c, return_inverse=True)
    lqs = np.array(
        [math.floor(math.log(int(u) / n_total) * LM_Q) for u in uc], dtype=np.int64
    )
    return lqs[inv]


def _lm_score_join(sf_dir: str, vocab_ds):
    """Scale path: unigram scoring as a distributed hash join — the model
    never visits the driver (10⁸–10⁹-token web vocabs would make the
    broadcast dict multi-GB).  Same shape as curation._decontaminate_semijoin:

    - (doc_id, n_tokens) totals are a per-batch count, no hashing/joining
    - (doc_id, token, tf) triples inner-join the (token, lq) model table;
      per-batch partial Sum(tf·lq) then a thin groupby(doc_id) — exact
      int64, identical to the oracle's per-occurrence sum(lq)
    - one sentinel row per join input guards the Ray 2.49 empty-first-block
      shuffle race (state/raypatch.py note); the sentinel token contains a
      space, which whitespace tokenization can never produce"""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .dedup import SENTINEL_ID, _join_partitions

    n_total = int(vocab_ds.sum("n") or 0)

    def model_rows(t: pa.Table) -> pa.Table:
        c = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "token": t.column("token"),
                "lq": pa.array(_lq_from_counts(c, n_total), pa.int64()),
            }
        )

    lp = vocab_ds.map_batches(
        model_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.from_arrow(pa.table(
        {"token": pa.array([_SENT_TOKEN], pa.string()),
         "lq": pa.array([0], pa.int64())}
    )))

    def totals(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column("text").to_pandas())
        ntok = s.str.strip().str.split().str.len().fillna(0).to_numpy(dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(ntok),
            }
        )

    def triples(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column("text").to_pandas())
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ex = s.str.strip().str.split().explode().dropna()
        if not len(ex):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        g = (
            pd.DataFrame({"row": ex.index, "token": ex.to_numpy()})
            .groupby(["row", "token"], sort=False).size().rename("tf").reset_index()
        )
        return pa.table(
            {
                "doc_id": pa.array(ids[g["row"].to_numpy()], pa.int64()),
                "token": pa.array(g["token"].to_numpy(dtype=object), pa.string()),
                "tf": pa.array(g["tf"].to_numpy(dtype=np.int64)),
            }
        )

    nparts = _join_partitions()
    docs = cp.read_documents(sf_dir)
    tri = docs.map_batches(
        triples, batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.from_arrow(pa.table(
        {"doc_id": pa.array([SENTINEL_ID], pa.int64()),
         "token": pa.array([_SENT_TOKEN], pa.string()),
         "tf": pa.array([0], pa.int64())}
    )))
    joined = tri.join(lp, join_type="inner", num_partitions=nparts, on=("token",))

    def sum_partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        lq = t.column("lq").to_numpy(zero_copy_only=False).astype(np.int64)
        codes, uniq = pd.factorize(ids, sort=False)
        sums = np.bincount(codes, weights=tf * lq, minlength=len(uniq))
        return pa.table(
            {
                "doc_id": pa.array(uniq.astype(np.int64)),
                # tf·lq stays well under 2^53 per batch (lq ~ -2e10, tf·Σ
                # bounded by batch tokens), so the float64 bincount sum is
                # exact; cast back to int64
                "logprob_q": pa.array(sums.astype(np.int64)),
            }
        )

    sums = (
        joined.map_batches(sum_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(Sum("logprob_q", alias_name="logprob_q"))
    )
    tot = docs.map_batches(
        totals, batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.from_arrow(pa.table(
        {"doc_id": pa.array([SENTINEL_ID], pa.int64()),
         "n_tokens": pa.array([0], pa.int64())}
    )))
    out = tot.join(sums, join_type="left_outer", num_partitions=nparts, on=("doc_id",))

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("doc_id"), SENTINEL_ID))
        nt = t.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        sq = (
            pc.fill_null(t.column("logprob_q"), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        den = np.where(nt > 0, nt, 1).astype(np.float64)
        avg = np.where(nt > 0, (sq.astype(np.float64) / den) / LM_Q, 0.0)
        keep = (nt > 0) & (avg >= LM_KEEP_MIN)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(nt),
                "logprob_q": pa.array(sq),
                "avg_logprob": pa.array(avg),
                "lm_keep": pa.array(keep),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def lm_score_stage(ds, side_ref):
    """Pass 2: per-doc unigram log-likelihood against the broadcast model.
    Task closure (state is just the broadcast ref — per-task ray.get is a
    local object-store hit); vectorized map/groupby per batch, no shuffle."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        s = pd.Series(batch.column("text").to_pandas())
        toks = s.str.strip().str.split()
        n_tokens = toks.str.len().fillna(0).to_numpy(dtype=np.int64)
        ex = toks.explode().dropna()
        if len(ex):
            lqs = ex.map(side["lq"]).fillna(side["oov"]).astype(np.int64)
            sums = (
                lqs.groupby(level=0).sum().reindex(s.index, fill_value=0)
            ).to_numpy(dtype=np.int64)
        else:
            sums = np.zeros(len(s), dtype=np.int64)
        nt = np.where(n_tokens > 0, n_tokens, 1).astype(np.float64)
        avg = np.where(n_tokens > 0, (sums.astype(np.float64) / nt) / LM_Q, 0.0)
        keep = (n_tokens > 0) & (avg >= LM_KEEP_MIN)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tokens),
                "logprob_q": pa.array(sums),
                "avg_logprob": pa.array(avg),
                "lm_keep": pa.array(keep),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_doc_lm_score(sf_dir: str):
    """Unigram-LM quality scoring (KenLM-style perplexity filter): pass 1
    builds the corpus unigram model distributed, pass 2 scores every doc.

    Adaptive shape (VERDICT r3): the distinct-token count is checked
    against the broadcast budget (KMETA_LM_BROADCAST_MAX, default
    LM_BROADCAST_MAX) — a bounded vocab is collected + ``ray.put`` and
    scoring is a zero-shuffle map; a web-scale vocab stays distributed and
    scoring becomes the hash join, so driver memory never grows with
    corpus content."""
    import os

    import ray

    max_bc = int(os.environ.get("KMETA_LM_BROADCAST_MAX", str(LM_BROADCAST_MAX)))
    vocab = _lm_vocab_ds(sf_dir)
    if vocab.count() <= max_bc:
        side_ref = ray.put(_lm_side(vocab))
        return lm_score_stage(cp.read_documents(sf_dir), side_ref)
    return _lm_score_join(sf_dir, vocab)


def doc_lm_score_oracle_sql() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({cp.SQL_TOKS.format(t='text')}) AS token FROM documents
),
freq AS (SELECT token, count(*)::BIGINT AS c FROM tok GROUP BY token),
n AS (SELECT sum(c)::BIGINT AS n FROM freq),
lp AS (
  SELECT token, floor(ln(c::DOUBLE / n.n) * {LM_Q:.0f}.0)::BIGINT AS lq
  FROM freq CROSS JOIN n
),
doc_sums AS (
  SELECT tok.doc_id, count(*)::BIGINT AS n_tokens, sum(lp.lq)::BIGINT AS logprob_q
  FROM tok JOIN lp USING (token) GROUP BY tok.doc_id
),
alldocs AS (
  SELECT d.doc_id,
    coalesce(s.n_tokens, 0) AS n_tokens,
    coalesce(s.logprob_q, 0) AS logprob_q
  FROM documents d LEFT JOIN doc_sums s USING (doc_id)
)
SELECT doc_id, n_tokens, logprob_q,
  CASE WHEN n_tokens > 0
       THEN (logprob_q::DOUBLE / n_tokens::DOUBLE) / {LM_Q:.0f}.0
       ELSE 0.0 END AS avg_logprob,
  (n_tokens > 0 AND
   CASE WHEN n_tokens > 0
        THEN (logprob_q::DOUBLE / n_tokens::DOUBLE) / {LM_Q:.0f}.0
        ELSE 0.0 END >= {LM_KEEP_MIN}) AS lm_keep
FROM alldocs
""".strip()


def normalize_batch(batch: pa.Table) -> pa.Table:
    """Canonical text normalization: trim, lowercase, collapse internal
    whitespace — pure pyarrow kernels, zero Python per row."""
    t = batch.column("text")
    norm = pc.replace_substring_regex(pc.utf8_lower(pc.utf8_trim_whitespace(t)), r"\s+", " ")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "text_norm": norm,
            "n_chars_norm": pc.utf8_length(norm).cast(pa.int64()),
        }
    )


def q_doc_normalize(sf_dir: str):
    return cp.read_documents(sf_dir).map_batches(
        normalize_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def doc_normalize_oracle_sql() -> str:
    wtrim = cp.SQL_WTRIM.format(t="text")
    return f"""
SELECT doc_id,
  regexp_replace(lower({wtrim}), '\\s+', ' ', 'g') AS text_norm,
  length(regexp_replace(lower({wtrim}), '\\s+', ' ', 'g'))::BIGINT AS n_chars_norm
FROM documents
""".strip()


def q_doc_stats(sf_dir: str):
    return cp.read_documents(sf_dir).map_batches(
        doc_stats_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def q_doc_fingerprint(sf_dir: str):
    return cp.read_documents(sf_dir).map_batches(
        doc_fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Exact distributed heavy hitters (frequent tokens ≥ HH_FRAC of the corpus)

HH_FRAC = 0.03  # heavy = token frequency ≥ 3% of all tokens
# sentinel row carrying each batch's token total: contains a SPACE, which
# no whitespace-split token can — collision-free against adversarial text
# (a doc containing the literal sentinel token would otherwise corrupt the
# total and become silently unreportable)
_HH_TOTAL = " total "


def _hh_candidate_partial(batch: pa.Table) -> pa.Table:
    """Pass 1: per-batch candidate generation.  Pigeonhole: a token with
    global frequency ≥ s·N must be locally ≥ s·n_b in at least one batch,
    so emitting only locally-heavy tokens (plus a total-count sentinel)
    loses no true heavy hitter.  This bounds the shuffle to candidates —
    the whole point at 10^10-token vocabularies where token_freq's full
    |vocab| exchange stops being 'small'."""
    vc = token_freq_partial(batch)
    n = vc.column("n").to_numpy(zero_copy_only=False)
    total = int(n.sum())
    keep = n >= HH_FRAC * total
    return pa.table(
        {
            "token": pa.concat_arrays(
                [
                    vc.column("token").combine_chunks()
                    if isinstance(vc.column("token"), pa.ChunkedArray)
                    else vc.column("token"),
                    pa.array([_HH_TOTAL], pa.string()),
                ]
            ).filter(pa.array(np.r_[keep, True])),
            "n": pa.array(np.r_[n, total][np.r_[keep, True]].astype(np.int64)),
        }
    )


def q_token_heavy(sf_dir: str):
    """Exact heavy hitters: candidate pass (locally-heavy tokens only cross
    the wire) → driver collects the tiny candidate set + corpus token total
    → broadcast membership → exact-count pass over candidates → threshold.
    Both passes are combiner-pushed ``map_batches``; the corpus never
    shuffles raw tokens."""
    import math

    import ray
    from ray.data.aggregate import Sum

    cand = (
        cp.read_documents(sf_dir)
        .map_batches(_hh_candidate_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # candidates ≤ 1/s per batch — small by construction
    )
    if "token" not in cand.columns:  # empty corpus: column-less to_pandas
        cand = pd.DataFrame({"token": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    n_total = int(cand.loc[cand["token"] == _HH_TOTAL, "n"].sum())
    thresh = math.ceil(HH_FRAC * n_total)
    side_ref = ray.put(
        pa.array(sorted(cand.loc[cand["token"] != _HH_TOTAL, "token"]), pa.string())
    )

    def exact_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        side = ray.get(side_ref)  # local-store hit; typed even when empty
        vc = token_freq_partial(batch)
        return vc.filter(pc_.is_in(vc.column("token"), value_set=side))

    counts = (
        cp.read_documents(sf_dir)
        .map_batches(exact_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        keep = n >= thresh
        out = t.filter(pa.array(keep))
        frac = out.column("n").to_numpy(zero_copy_only=False).astype(np.float64) / n_total
        return pa.table(
            {"token": out.column("token"), "n": out.column("n"), "frac": pa.array(frac)}
        )

    return counts.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def token_heavy_oracle_sql() -> str:
    return f"""
WITH tok AS (
  SELECT unnest({cp.SQL_TOKS.format(t='text')}) AS token FROM documents
),
n AS (SELECT count(*)::BIGINT AS n FROM tok)
SELECT token, count(*)::BIGINT AS n,
  count(*)::DOUBLE / (SELECT n FROM n) AS frac
FROM tok GROUP BY token
HAVING count(*) >= ceil({HH_FRAC} * (SELECT n FROM n))
""".strip()


# ---------------------------------------------------------------------------
# Corpus report card (dataset-datasheet summary)


def q_corpus_summary(sf_dir: str):
    """One-row corpus summary — the datasheet numbers a training-data run
    publishes: doc/token/char totals, language mix, distinct-text count and
    duplicate rate.  Two streaming passes, each combiner-pushed: scalar
    totals collapse to one row per batch; the distinct count reuses the
    exact-dedup shape (hash in map_batches, groupby moves one row per
    distinct hash).  Only scalars reach the driver."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def part(batch: pa.Table) -> pa.Table:
        st = doc_stats_batch(batch)
        en = pc.cast(
            pc.greater_equal(st.column("en_stop_hits"), 2), pa.int64()
        )
        return pa.table(
            {
                "n_docs": pa.array([len(st)], pa.int64()),
                "n_tokens": pa.array(
                    [pc.sum(st.column("n_tokens")).as_py() or 0], pa.int64()
                ),
                "n_chars": pa.array(
                    [pc.sum(st.column("n_chars_txt")).as_py() or 0], pa.int64()
                ),
                "n_en_docs": pa.array([pc.sum(en).as_py() or 0], pa.int64()),
            }
        )

    ds = cp.read_documents(sf_dir)
    totals = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_tokens", alias_name="n_tokens"),
        Sum("n_chars", alias_name="n_chars"),
        Sum("n_en_docs", alias_name="n_en_docs"),
    )

    def hash_part(batch: pa.Table) -> pa.Table:
        import hashlib

        hs = [
            hashlib.md5(t.encode()).hexdigest() if t is not None else None
            for t in batch.column("text").to_pylist()
        ]
        return pa.table({"text_hash": pa.array(hs, pa.string())})

    n_distinct = (
        ds.map_batches(hash_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_hash")
        .count()
        .count()
    )

    n_docs = int(totals["n_docs"])
    dup_rate = (n_docs - n_distinct) / n_docs if n_docs else 0.0
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_tokens": pa.array([int(totals["n_tokens"])], pa.int64()),
            "n_chars": pa.array([int(totals["n_chars"])], pa.int64()),
            "n_en_docs": pa.array([int(totals["n_en_docs"])], pa.int64()),
            "n_distinct_texts": pa.array([int(n_distinct)], pa.int64()),
            "dup_rate": pa.array([dup_rate], pa.float64()),
        }
    )


def corpus_summary_oracle_sql() -> str:
    return f"""
WITH st AS (
  SELECT doc_id, text,
    len({cp.SQL_TOKS.format(t='text')})::BIGINT AS n_tokens,
    length(text)::BIGINT AS n_chars,
    len(list_filter({cp.SQL_TOKS.format(t='text')}, t -> t IN ({_SQL_STOP})))::BIGINT AS stop_hits
  FROM documents
)
SELECT
  count(*)::BIGINT AS n_docs,
  sum(n_tokens)::BIGINT AS n_tokens,
  sum(n_chars)::BIGINT AS n_chars,
  sum(CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_en_docs,
  count(DISTINCT md5(text))::BIGINT AS n_distinct_texts,
  (count(*)::BIGINT - count(DISTINCT md5(text))::BIGINT)::DOUBLE / count(*)::BIGINT AS dup_rate
FROM st
""".strip()


# ---------------------------------------------------------------------------
# PMI bigram collocations


PMI_TOPK = 20
PMI_Q = 1e9  # floor(pmi·1e9) — same quantization contract as LM_Q

_PMI_EMPTY = pa.table(
    {
        "bigram": pa.array([], pa.string()),
        "n": pa.array([], pa.int64()),
    }
)


def _bigram_freq_partial(batch: pa.Table) -> pa.Table:
    """Per-batch adjacent-bigram counts (explode + shifted join, C kernels);
    ≤ distinct-bigrams-per-batch rows cross the wire."""
    s = pd.Series(batch.column("text").to_pandas())
    ex = s.str.split().explode()
    if not len(ex):
        return _PMI_EMPTY
    bi = (ex + " " + ex.groupby(level=0).shift(-1)).dropna()
    if not len(bi):
        return _PMI_EMPTY
    vc = bi.value_counts()
    return pa.table(
        {
            "bigram": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
            "n": pa.array(vc.to_numpy(dtype=np.int64)),
        }
    )


def _pmi_topk_block(t: pa.Table) -> pa.Table:
    """Per-block top-PMI_TOPK by (n DESC, bigram ASC) — any global winner is
    its block's winner (pigeonhole), so the final one-block pass is exact."""
    if len(t) == 0:
        return _PMI_EMPTY
    df = t.to_pandas().sort_values(
        ["n", "bigram"], ascending=[False, True], kind="mergesort"
    ).head(PMI_TOPK)
    return pa.Table.from_pandas(df, preserve_index=False).cast(_PMI_EMPTY.schema)


def q_token_pmi(sf_dir: str):
    """Top-PMI_TOPK bigram collocations by corpus count, scored with
    pointwise mutual information — the phrase-mining / tokenizer-merge
    diagnostic (which adjacent pairs co-occur far above chance).

    pmi = ln( (c_xy/N_bi) / ((c_x/N_uni)·(c_y/N_uni)) ), emitted quantized
    as pmi_q = floor(pmi·1e9): every operation is a correctly-rounded IEEE
    double op in the same order on both sides (libm ln, exact int→double
    below 2^53), so the twin is bit-exact — the LM_Q contract.

    Ray shape (web-scale vocab): bigram + unigram tables stay distributed
    (combiner-pushed partials → groupby Sum); the top-k prune is a
    per-block partial (any global winner is its block's winner) so only
    ≤ PMI_TOPK rows per block reach the one-block final; the driver then
    touches exactly PMI_TOPK bigrams + ≤ 2·PMI_TOPK unigram count rows and
    two scalar totals — nothing corpus- or vocab-sized."""
    import math

    from ray.data.aggregate import Sum

    docs = cp.read_documents(sf_dir)
    bi_agg = (
        docs.map_batches(_bigram_freq_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # two consumers: total + top-k (vocab-sized, ≪ corpus)
    )
    uni_agg = (
        docs.map_batches(token_freq_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # two consumers: total + membership filter
    )

    empty = pd.DataFrame(
        {
            "bigram": pd.Series([], dtype=object),
            "n_pair": pd.Series([], dtype=np.int64),
            "n_left": pd.Series([], dtype=np.int64),
            "n_right": pd.Series([], dtype=np.int64),
            "pmi_q": pd.Series([], dtype=np.int64),
        }
    )
    n_bi = int(bi_agg.sum("n") or 0)
    n_uni = int(uni_agg.sum("n") or 0)
    if n_bi == 0 or n_uni == 0:
        return empty

    top = (
        bi_agg.map_batches(_pmi_topk_block, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(_pmi_topk_block, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    if not len(top) or "bigram" not in top.columns:  # empty-Dataset column guard
        return empty

    members = set()
    for b in top["bigram"]:
        left, right = b.split(" ", 1)
        members.update((left, right))

    def member_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        return t.filter(pc_.is_in(t.column("token"), pa.array(sorted(members), pa.string())))

    cnt = uni_agg.map_batches(
        member_filter, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    cmap = dict(zip(cnt["token"], cnt["n"])) if len(cnt) else {}

    rows = []
    for b, c_xy in zip(top["bigram"], top["n"]):
        left, right = b.split(" ", 1)
        c_x, c_y = int(cmap[left]), int(cmap[right])
        arg = (int(c_xy) / n_bi) / ((c_x / n_uni) * (c_y / n_uni))
        rows.append((b, int(c_xy), c_x, c_y, math.floor(math.log(arg) * PMI_Q)))
    return pd.DataFrame(
        rows, columns=["bigram", "n_pair", "n_left", "n_right", "pmi_q"]
    ).astype({"n_pair": np.int64, "n_left": np.int64, "n_right": np.int64, "pmi_q": np.int64})


def token_pmi_oracle_sql() -> str:
    toks = cp.SQL_TOKS.format(t="text")
    return f"""
WITH tok AS (SELECT doc_id, {toks} AS toks FROM documents),
tk AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS i, toks FROM tok),
uni AS (SELECT toks[i] AS token FROM tk),
unic AS (SELECT token, count(*)::BIGINT AS n FROM uni GROUP BY token),
bi AS (SELECT toks[i] || ' ' || toks[i + 1] AS bigram FROM tk WHERE i < len(toks)),
bic AS (SELECT bigram, count(*)::BIGINT AS n FROM bi GROUP BY bigram),
params AS (SELECT (SELECT sum(n) FROM unic)::BIGINT AS n_uni,
                  (SELECT sum(n) FROM bic)::BIGINT AS n_bi),
topk AS (SELECT bigram, n FROM bic ORDER BY n DESC, bigram LIMIT {PMI_TOPK})
SELECT t.bigram, t.n AS n_pair, lx.n AS n_left, rx.n AS n_right,
  floor(ln((t.n::DOUBLE / p.n_bi) /
           ((lx.n::DOUBLE / p.n_uni) * (rx.n::DOUBLE / p.n_uni))) * {PMI_Q:.0f}e0
  )::BIGINT AS pmi_q
FROM topk t
CROSS JOIN params p
JOIN unic lx ON lx.token = split_part(t.bigram, ' ', 1)
JOIN unic rx ON rx.token = split_part(t.bigram, ' ', 2)
""".strip()


# ---------------------------------------------------------------------------
# corpus rollup (OLAP GROUP BY ROLLUP(lang, source) in one distributed pass)
# ---------------------------------------------------------------------------

def _rollup_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (lang, source) partials: a batch collapses to ≤
    |langs × sources| rows before the shuffle (the token_freq combiner
    shape).  Null keys ride the _NULL_KEY sentinel through the groupby."""
    from ..stages.aggregate import _NULL_KEY

    s = pd.Series(batch.column("text").to_pandas())
    ntok = s.str.strip().str.split().str.len().fillna(0).to_numpy(dtype=np.int64)
    f = pd.DataFrame(
        {
            "lang": pd.Series(batch.column("lang").to_pandas()).fillna(_NULL_KEY),
            "source": pd.Series(batch.column("source").to_pandas()).fillna(_NULL_KEY),
            "n_docs": np.ones(len(batch), dtype=np.int64),
            "n_tokens": ntok,
            "n_chars": pd.Series(batch.column("n_chars").to_pandas())
            .fillna(0)
            .to_numpy(dtype=np.int64),
        }
    )
    g = f.groupby(["lang", "source"], sort=False, dropna=False).sum().reset_index()
    return pa.table(
        {
            "lang": pa.array(g["lang"].to_numpy(dtype=object), pa.string()),
            "source": pa.array(g["source"].to_numpy(dtype=object), pa.string()),
            "n_docs": pa.array(g["n_docs"].to_numpy(dtype=np.int64)),
            "n_tokens": pa.array(g["n_tokens"].to_numpy(dtype=np.int64)),
            "n_chars": pa.array(g["n_chars"].to_numpy(dtype=np.int64)),
        }
    )


def _rollup_expand(t: pa.Table) -> pa.Table:
    """Aggregated detail rows (≤ |langs × sources|, coalesced to one block)
    → the three ROLLUP levels.  lvl = GROUPING(lang)·2 + GROUPING(source)
    disambiguates rolled-up NULLs from genuinely-null key values."""
    from ..stages.aggregate import _NULL_KEY

    df = t.to_pandas()
    df["lang"] = df["lang"].map(lambda v: None if v == _NULL_KEY else v)
    df["source"] = df["source"].map(lambda v: None if v == _NULL_KEY else v)
    detail = df.assign(lvl=np.int64(0))
    by_lang = (
        df.groupby("lang", dropna=False, sort=False)[["n_docs", "n_tokens", "n_chars"]]
        .sum()
        .reset_index()
        .assign(source=None, lvl=np.int64(1))
    )
    total = pd.DataFrame(
        {
            "lang": [None],
            "source": [None],
            "n_docs": [df["n_docs"].sum()],
            "n_tokens": [df["n_tokens"].sum()],
            "n_chars": [df["n_chars"].sum()],
            "lvl": [np.int64(3)],
        }
    )
    out = pd.concat([detail, by_lang, total], ignore_index=True)
    out = out.astype({"n_docs": np.int64, "n_tokens": np.int64, "n_chars": np.int64})
    # int-derived double division, same operand order as the SQL twin;
    # empty-corpus total row (n_docs = 0) → NULL avg like the oracle's CASE
    nd = out["n_docs"].to_numpy(dtype=np.float64)
    out["avg_tokens"] = np.where(
        nd > 0,
        out["n_tokens"].to_numpy(dtype=np.float64) / np.where(nd > 0, nd, 1.0),
        np.nan,
    )
    # pandas groupby/concat turn None keys into float NaN in object
    # columns — restore real nulls before the Arrow build
    for kc in ("lang", "source"):
        out[kc] = out[kc].astype(object).where(pd.notna(out[kc]), None)
    return pa.table(
        {
            "lang": pa.array(out["lang"].to_numpy(dtype=object), pa.string()),
            "source": pa.array(out["source"].to_numpy(dtype=object), pa.string()),
            "lvl": pa.array(out["lvl"].to_numpy(dtype=np.int64)),
            "n_docs": pa.array(out["n_docs"].to_numpy(dtype=np.int64)),
            "n_tokens": pa.array(out["n_tokens"].to_numpy(dtype=np.int64)),
            "n_chars": pa.array(out["n_chars"].to_numpy(dtype=np.int64)),
            "avg_tokens": pa.array(out["avg_tokens"].to_numpy(dtype=np.float64)),
        }
    )


def q_corpus_rollup(sf_dir: str):
    """OLAP rollup report: (lang, source) detail + per-lang + grand total
    in ONE pass over the corpus.

    Ray shape (10^12 docs): the per-batch combiner collapses each batch to
    ≤ |langs × sources| partial rows, the groupby shuffles only those, and
    the rollup expansion runs over the aggregated table (≤ a few hundred
    rows) coalesced to one block — the route_counts repartition(1) pattern.
    All measures are int64 sums (exact under any order); avg_tokens is one
    double division per OUTPUT row, identical operand order both sides."""
    from ray.data.aggregate import Sum

    ds = cp.read_documents(sf_dir, columns=("doc_id", "text", "lang", "source", "n_chars"))
    agg = (
        ds.map_batches(_rollup_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "source"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_chars", alias_name="n_chars"),
        )
        .repartition(1)
    )
    return agg.map_batches(
        _rollup_expand, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def corpus_rollup_oracle_sql() -> str:
    return f"""
WITH base AS (
  SELECT lang, source,
    coalesce(len({cp.SQL_TOKS.format(t='text')}), 0)::BIGINT AS ntok,
    coalesce(n_chars, 0)::BIGINT AS nch
  FROM documents
)
SELECT lang, source,
  (GROUPING(lang) * 2 + GROUPING(source))::BIGINT AS lvl,
  count(*)::BIGINT AS n_docs,
  coalesce(sum(ntok), 0)::BIGINT AS n_tokens,
  coalesce(sum(nch), 0)::BIGINT AS n_chars,
  CASE WHEN count(*) = 0 THEN NULL
       ELSE (coalesce(sum(ntok), 0)::BIGINT)::DOUBLE / (count(*)::BIGINT)::DOUBLE
  END AS avg_tokens
FROM base
GROUP BY ROLLUP(lang, source)
""".strip()


# ---------------------------------------------------------------------------
# Count–min sketch token counts (Cormode & Muthukrishnan 2005) — the third
# sketch next to HLL (conv_cardinality) and Bloom (dedup_bloom).  The
# sketch is a FIXED d×w int64 matrix (256 KB here), so the only state that
# ever reaches the driver is corpus-size-independent: per-batch partial
# sketches collapse locally (np.add.at), cross the wire as nonzero
# (slot, c) rows, Sum-combine in a ≤ d·w-group aggregate, and broadcast
# once.  Estimates are probed for the eval split's vocabulary (the
# decontaminate-style doc_id % CMS_PROBE_MOD subset) and reported next to
# the exact counts so the one-sided overestimate is a measured, driver-
# checkable invariant: true ≤ est, exact integer arithmetic on both sides.
# All d bucket hashes come from ONE md5 per token (four 32-bit digest
# slices), twinned in SQL as substr(md5(token), 1+8i, 8).
# ---------------------------------------------------------------------------

CMS_D = 4
CMS_W = 8192
CMS_PROBE_MOD = 17


def _cms_buckets(tok: str) -> list[int]:
    h = cp.md5_hex(tok)
    return [int(h[8 * i : 8 * i + 8], 16) % CMS_W for i in range(CMS_D)]


def _cms_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial sketch → nonzero (slot, c) rows (slot = i·w + b)."""
    s = pd.Series(batch.column("text").to_pandas())
    ex = s.str.strip().str.split().explode()
    vc = ex.value_counts()  # drops the null-text NaNs
    vec = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    counts = vc.to_numpy(dtype=np.int64)
    for j, tok in enumerate(vc.index):
        for i, b in enumerate(_cms_buckets(tok)):
            vec[i * CMS_W + b] += counts[j]
    nz = np.flatnonzero(vec)
    return pa.table(
        {
            "slot": pa.array(nz.astype(np.int64)),
            "c": pa.array(vec[nz]),
        }
    )


def q_token_cms(sf_dir: str):
    """CMS estimates vs exact counts for the eval split's vocabulary:
    (token, est_count, true_count) with true ≤ est guaranteed.

    Scale shape: the sketch build is a combiner-pushed ≤ d·w-row
    aggregate + one bounded driver collect (fixed 256 KB, regardless of
    corpus size); the probe pass is a task closure over the broadcast
    sketch; exact counts ride the token_freq combiner and meet the probe
    vocabulary in a sentinel-threaded hash join (no unbounded broadcast)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .dedup import _join_partitions

    ds = cp.read_documents(sf_dir)

    # 1. distributed sketch build (sentinel slot keeps the aggregate's
    #    shuffle non-empty on an empty corpus; filtered on the driver)
    sk = (
        ds.map_batches(_cms_partial, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(pa.table(
            {"slot": pa.array([-1], pa.int64()), "c": pa.array([0], pa.int64())}
        )))
        .groupby("slot")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    vec = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    if len(sk) and "slot" in sk:
        sk = sk[sk["slot"] >= 0]
        vec[sk["slot"].to_numpy(dtype=np.int64)] = sk["c"].to_numpy(dtype=np.int64)
    ref = ray.put(vec)

    # 2. probe vocabulary: distinct tokens of the eval split
    def probe_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(ids % CMS_PROBE_MOD == 0))
        s = pd.Series(t.column("text").to_pandas())
        toks = s.str.strip().str.split().explode().dropna().unique()
        return pa.table({"token": pa.array(toks.astype(object), pa.string())})

    probe = (
        ds.map_batches(probe_partial, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(pa.table({"token": pa.array([_SENT_TOKEN], pa.string())})))
        .groupby("token")
        .aggregate(Count(alias_name="_drop"))
        .select_columns(["token"])
    )

    # 3. exact counts (token_freq combiner) ⋈ probe vocabulary
    cnt = (
        ds.map_batches(token_freq_partial, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(pa.table(
            {"token": pa.array([_SENT_TOKEN], pa.string()),
             "n": pa.array([0], pa.int64())}
        )))
        .groupby("token")
        .aggregate(Sum("n", alias_name="true_count"))
    )
    joined = probe.join(
        cnt, join_type="inner", num_partitions=_join_partitions(), on=("token",)
    )

    # 4. estimate from the broadcast sketch (task closure: per-task
    #    ray.get is a local-store hit — no actor pool needed)
    def estimate(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("token"), _SENT_TOKEN))
        v = ray.get(ref)
        toks = t.column("token").to_pylist()
        est = np.empty(len(toks), dtype=np.int64)
        for j, tok in enumerate(toks):
            est[j] = min(v[i * CMS_W + b] for i, b in enumerate(_cms_buckets(tok)))
        return pa.table(
            {
                "token": t.column("token"),
                "est_count": pa.array(est),
                "true_count": t.column("true_count").cast(pa.int64()),
            }
        )

    return joined.map_batches(estimate, batch_format="pyarrow", zero_copy_batch=True)


def token_cms_oracle_sql() -> str:
    def bucket(tok_expr: str) -> str:
        return (
            f"(('0x' || substr(md5({tok_expr}), 1 + 8 * r.i, 8))::UBIGINT"
            f" % {CMS_W})::BIGINT"
        )

    toks = cp.SQL_TOKS.format(t="text")
    return f"""
WITH occ AS (
  SELECT unnest({toks}) AS token FROM documents
),
cnt AS (SELECT token, count(*)::BIGINT AS n FROM occ GROUP BY token),
sums AS (
  SELECT r.i AS ri, {bucket('token')} AS bucket, sum(n)::BIGINT AS c
  FROM cnt CROSS JOIN range({CMS_D}) r(i)
  GROUP BY 1, 2
),
probe AS (
  SELECT DISTINCT unnest({toks}) AS token
  FROM documents WHERE doc_id % {CMS_PROBE_MOD} = 0
),
pb AS (
  SELECT p.token AS token, r.i AS ri, {bucket('p.token')} AS bucket
  FROM probe p CROSS JOIN range({CMS_D}) r(i)
),
est AS (
  SELECT pb.token AS token, min(s.c)::BIGINT AS est_count
  FROM pb JOIN sums s ON s.ri = pb.ri AND s.bucket = pb.bucket
  GROUP BY pb.token
)
SELECT e.token, e.est_count, c.n AS true_count
FROM est e JOIN cnt c ON c.token = e.token
""".strip()


# ---------------------------------------------------------------------------
# Language-label QA: declared ``lang`` vs the heuristic lang-ID prediction
# as a confusion matrix — the labeling-quality diagnostic run before
# trusting a crawl's metadata (a source whose declared 'en' rows predict
# 'und' in bulk has broken labels or broken text).  Pure combiner shape:
# each batch collapses to ≤ |langs × preds| rows; nothing else shuffles.
# ---------------------------------------------------------------------------


def _lang_confusion_partial(batch: pa.Table) -> pa.Table:
    from ..stages.aggregate import _NULL_KEY

    s = pd.Series(batch.column("text").to_pandas())
    toks = s.str.strip().str.split()
    ex = toks.explode()
    stop_hits = (
        ex.isin(_STOP_SET).groupby(level=0).sum().reindex(s.index, fill_value=0)
    ).to_numpy(dtype=np.int64)
    pred = np.where(stop_hits >= 2, "en", "und")
    lang = pd.Series(batch.column("lang").to_pandas()).fillna(_NULL_KEY).to_numpy(
        dtype=object
    )
    g = (
        pd.DataFrame({"lang": lang, "lang_pred": pred})
        .groupby(["lang", "lang_pred"], sort=False).size().rename("n").reset_index()
    )
    return pa.table(
        {
            "lang": pa.array(g["lang"].to_numpy(dtype=object), pa.string()),
            "lang_pred": pa.array(g["lang_pred"].to_numpy(dtype=object), pa.string()),
            "n_docs": pa.array(g["n"].to_numpy(dtype=np.int64)),
        }
    )


def q_lang_confusion(sf_dir: str):
    """Confusion matrix of declared vs predicted language:
    (lang, lang_pred, n_docs, is_match)."""
    import pyarrow.compute as pc_
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.aggregate import _NULL_KEY, _unmask_col

    sent = "\x00\x00lc-sent"
    agg = (
        cp.read_documents(sf_dir, columns=("text", "lang"))
        .map_batches(
            _lang_confusion_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .union(rd.from_arrow(pa.table(
            {
                "lang": pa.array([sent], pa.string()),
                "lang_pred": pa.array([sent], pa.string()),
                "n_docs": pa.array([0], pa.int64()),
            }
        )))
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc_.not_equal(t.column("lang"), sent))
        lang = _unmask_col(t.column("lang"))
        is_match = pc_.fill_null(pc_.equal(lang, t.column("lang_pred")), False)
        return pa.table(
            {
                "lang": lang,
                "lang_pred": t.column("lang_pred"),
                "n_docs": t.column("n_docs").cast(pa.int64()),
                "is_match": is_match,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def lang_confusion_oracle_sql() -> str:
    toks = cp.SQL_TOKS.format(t="text")
    return f"""
WITH p AS (
  SELECT lang,
    CASE WHEN coalesce(len(list_filter({toks}, t -> t IN ({_SQL_STOP}))), 0) >= 2
         THEN 'en' ELSE 'und' END AS lang_pred
  FROM documents
)
SELECT lang, lang_pred, count(*)::BIGINT AS n_docs,
  coalesce(lang = lang_pred, false) AS is_match
FROM p GROUP BY lang, lang_pred
""".strip()


# ---------------------------------------------------------------------------
# T1 upgrade (VERDICT r4 task 8): real greedy-BPE token counts.  Training-
# data token budgets are BPE tokens, not whitespace splits — this op applies
# a deterministic merge LADDER (classic Sennrich-style: each rule merges one
# adjacent symbol pair, later rules may reference symbols earlier rules
# created) and reports per-doc subword counts.  The merges table is the
# broadcast side (a fixed deterministic ladder here; a trained table drops in
# unchanged — it rides the task closure / ray.put, never a shuffle).
#
# Twin strategy: both sides run the IDENTICAL ladder.  A word becomes its
# space-separated character sequence; each rule is a literal replace-all of
# "a b" with "ab" (left-to-right non-overlapping in both Arrow and DuckDB);
# the surviving symbol count is spaces+1.  Engine side runs the ladder once
# per DISTINCT word (factorize + gather), so shared-vocabulary corpora pay
# ~50× less than per-instance application.
# ---------------------------------------------------------------------------

# ladder order matters: ("th","e") only fires because ("t","h") ran first
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "u"), ("e", "n"),
    ("a", "t"), ("e", "s"), ("o", "r"), ("s", "t"), ("a", "r"),
    ("a", "l"), ("i", "t"), ("in", "g"), ("o", "f"), ("t", "o"),
    ("i", "s"), ("e", "d"), ("the", "m"), ("l", "l"),
)


def _bpe_symbol_counts(words: np.ndarray) -> np.ndarray:
    """Greedy-BPE symbol count per word (vectorized Arrow kernels over the
    whole distinct-word array): chars → spaced sequence → merge ladder →
    spaces+1."""
    arr = pa.array(words, pa.string())
    spaced = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(arr, "(.)", r"\1 ")
    )
    for a, b in BPE_MERGES:
        spaced = pc.replace_substring(spaced, f"{a} {b}", f"{a}{b}")
    return pc.add(
        pc.count_substring(spaced, " "), 1
    ).cast(pa.int64()).to_numpy(zero_copy_only=False)


def bpe_row_counts(s: "pd.Series"):
    """Per-row (n_words, n_bpe_tokens) over a text Series — the BPE ladder
    runs once per DISTINCT word.  Null text → 0/0 (the token-statistics
    null contract of doc_stats_batch).  Shared by the doc-level counts and
    the per-conversation token budget so the twins can never diverge."""
    toks = s.str.strip().str.split()
    n_words = toks.str.len().fillna(0).to_numpy(dtype=np.int64)
    ex = toks.explode().dropna()
    if len(ex):
        codes, uniq = pd.factorize(ex.to_numpy(dtype=object), sort=False)
        per_word = _bpe_symbol_counts(uniq)
        n_bpe = (
            pd.Series(per_word[codes], index=ex.index)
            .groupby(level=0)
            .sum()
            .reindex(s.index, fill_value=0)
            .to_numpy(dtype=np.int64)
        )
    else:
        n_bpe = np.zeros(len(s), dtype=np.int64)
    return n_words, n_bpe


def bpe_sql_ladder(var: str = "s") -> str:
    """The SQL replace() merge ladder over a spaced-char expression —
    shared by every BPE oracle so the merge table is applied identically."""
    ladder = var
    for a, b in BPE_MERGES:
        ladder = f"replace({ladder}, '{a} {b}', '{a}{b}')"
    return ladder


def tokens_bpe_batch(batch: pa.Table) -> pa.Table:
    """doc_id → (n_words, n_bpe_tokens)."""
    n_words, n_bpe = bpe_row_counts(pd.Series(batch.column("text").to_pandas()))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words),
            "n_bpe_tokens": pa.array(n_bpe),
        }
    )


def q_doc_tokens_bpe(sf_dir: str):
    """Per-doc greedy-BPE subword counts — one stateless column-pruned
    ``map_batches`` pass, no shuffle; scales like every other textstat."""
    return cp.read_documents(sf_dir).map_batches(
        tokens_bpe_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def doc_tokens_bpe_oracle_sql() -> str:
    ladder = bpe_sql_ladder()
    toks = cp.SQL_TOKS.format(t="text")
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({toks}) AS w FROM documents
),
sp AS (
  SELECT doc_id, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS s FROM tok
),
cnt AS (
  SELECT doc_id, count(*)::BIGINT AS n_words,
    sum(len({ladder}) - len(replace({ladder}, ' ', '')) + 1)::BIGINT
      AS n_bpe_tokens
  FROM sp GROUP BY doc_id
)
SELECT d.doc_id,
  coalesce(c.n_words, 0)::BIGINT AS n_words,
  coalesce(c.n_bpe_tokens, 0)::BIGINT AS n_bpe_tokens
FROM documents d LEFT JOIN cnt c USING (doc_id)
""".strip()


# ---------------------------------------------------------------------------
# T76: per-language tokenizer fertility — BPE subwords per whitespace word.
# THE multilingual tokenizer-health metric: fertility ≈ 1 where the merge
# table fits the language, ≫ 1 where the tokenizer fragments, and a lang
# with runaway fertility silently pays proportionally more of the training
# token budget for the same text.  Run before fixing a token budget per
# language mix.
#
# Ray shape (10^12 docs): the BPE ladder runs once per DISTINCT word per
# batch (tokens_bpe_batch); each batch then collapses to ≤ |langs| partial
# rows (int64 sums), the groupby shuffles only those, and fertility is ONE
# double division per OUTPUT row — identical operand order in the twin, so
# the int-derived doubles match bit-exactly.
# ---------------------------------------------------------------------------


def _fertility_partial(batch: pa.Table) -> pa.Table:
    from ..stages.aggregate import _NULL_KEY

    bpe = tokens_bpe_batch(batch)
    f = pd.DataFrame(
        {
            "lang": pd.Series(batch.column("lang").to_pandas()).fillna(_NULL_KEY),
            "n_docs": np.ones(len(batch), dtype=np.int64),
            "n_words": bpe.column("n_words").to_numpy(zero_copy_only=False),
            "n_bpe_tokens": bpe.column("n_bpe_tokens").to_numpy(
                zero_copy_only=False
            ),
        }
    )
    g = f.groupby("lang", sort=False, dropna=False).sum().reset_index()
    return pa.table(
        {
            "lang": pa.array(g["lang"].to_numpy(dtype=object), pa.string()),
            "n_docs": pa.array(g["n_docs"].to_numpy(dtype=np.int64)),
            "n_words": pa.array(g["n_words"].to_numpy(dtype=np.int64)),
            "n_bpe_tokens": pa.array(g["n_bpe_tokens"].to_numpy(dtype=np.int64)),
        }
    )


def q_token_fertility(sf_dir: str):
    """Per-language BPE fertility report: (lang, n_docs, n_words,
    n_bpe_tokens, fertility = bpe/words).  Zero-word langs report NULL
    fertility; null lang is its own row (sentinel through the groupby)."""
    from ray.data.aggregate import Sum

    from ..stages.aggregate import _NULL_KEY

    agg = (
        cp.read_documents(sf_dir, columns=("doc_id", "text", "lang"))
        .map_batches(
            _fertility_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_words", alias_name="n_words"),
            Sum("n_bpe_tokens", alias_name="n_bpe_tokens"),
        )
    )

    def final(t: pa.Table) -> pa.Table:
        lang = [
            None if v == _NULL_KEY else v
            for v in t.column("lang").to_pylist()
        ]
        nw = t.column("n_words").to_numpy(zero_copy_only=False)
        nb = t.column("n_bpe_tokens").to_numpy(zero_copy_only=False)
        # int64/int64 true-divide upcasts both to float64 first — the same
        # (nb::DOUBLE / nw::DOUBLE) the twin computes; NULL when no words
        fert = np.where(nw == 0, np.nan, nb / np.where(nw == 0, 1, nw))
        return pa.table(
            {
                "lang": pa.array(lang, pa.string()),
                "n_docs": t.column("n_docs").cast(pa.int64()),
                "n_words": t.column("n_words").cast(pa.int64()),
                "n_bpe_tokens": t.column("n_bpe_tokens").cast(pa.int64()),
                "fertility": pa.array(fert, pa.float64()),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


def token_fertility_oracle_sql() -> str:
    ladder = bpe_sql_ladder()
    toks = cp.SQL_TOKS.format(t="text")
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({toks}) AS w FROM documents
),
sp AS (
  SELECT doc_id, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS s FROM tok
),
cnt AS (
  SELECT doc_id, count(*)::BIGINT AS n_words,
    sum(len({ladder}) - len(replace({ladder}, ' ', '')) + 1)::BIGINT
      AS n_bpe_tokens
  FROM sp GROUP BY doc_id
),
per AS (
  SELECT d.lang, coalesce(c.n_words, 0)::BIGINT AS nw,
    coalesce(c.n_bpe_tokens, 0)::BIGINT AS nb
  FROM documents d LEFT JOIN cnt c USING (doc_id)
)
SELECT lang, count(*)::BIGINT AS n_docs, sum(nw)::BIGINT AS n_words,
  sum(nb)::BIGINT AS n_bpe_tokens,
  CASE WHEN sum(nw) = 0 THEN NULL
       ELSE (sum(nb)::BIGINT)::DOUBLE / (sum(nw)::BIGINT)::DOUBLE
  END AS fertility
FROM per GROUP BY lang
""".strip()


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth curve (T80)
# ---------------------------------------------------------------------------
#
# Per doc-ordinal bucket (doc_id // VG_BUCKET_DOCS): docs, token instances,
# NEW distinct tokens (tokens whose first-occurrence doc falls in the
# bucket), plus cumulative vocabulary / token totals — the corpus-health
# curve that shows whether the vocabulary is still growing (Heaps' law
# V ~ n^beta) or the crawl has started re-collecting the same material.
#
# Scale shape: per-batch partial (token-hash, min doc_id) rows — the batch
# collapses to <= |batch vocab| rows before any exchange; a single h sort
# + run-min boundary scan finds exact global first occurrences (the
# q_source_diversity lesson: never a groupby at vocab cardinality); both
# aggregates move <= buckets-per-block rows; the cumulative sums run over
# the final <= max_doc/VG_BUCKET_DOCS-row curve in ONE block (the report
# is the output — tune VG_BUCKET_DOCS up at extreme scale).

VG_BUCKET_DOCS = 256


def _vg_combined_partial(batch: pa.Table) -> pa.Table:
    """ONE tokenize pass per batch emitting BOTH partial shapes (Ray
    Dataset plans are trees, so two consumers of the same read re-run the
    tokenize — the log_templates lesson): per-DISTINCT-token
    (h = w63(token), fd = min doc_id) rows, plus per-bucket totals rows
    encoded at h = -3 - bucket (real hashes are >= 0 and the pipeline
    sentinel is -1, so the key spaces can't collide; fd carries nothing
    for totals).  Empty/null-text docs count toward n_docs with zero
    tokens."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    s = pd.Series(batch.column("text").to_pandas())
    toks = s.str.split()
    # totals part
    ntok = toks.str.len().fillna(0).to_numpy(dtype=np.int64)
    bucket = ids // VG_BUCKET_DOCS
    ub, inv = np.unique(bucket, return_inverse=True)
    t_h = -3 - ub
    t_nd = np.bincount(inv).astype(np.int64)
    t_nt = np.bincount(inv, weights=ntok).astype(np.int64)
    # firsts part
    ex = toks.explode().dropna()
    if len(ex):
        codes, uniques = pd.factorize(ex.to_numpy())
        docids = ids[ex.index.to_numpy(dtype=np.int64)]
        order = np.argsort(codes, kind="stable")
        c_s, d_s = codes[order], docids[order]
        starts = np.r_[0, np.flatnonzero(np.diff(c_s)) + 1]
        fd = np.minimum.reduceat(d_s, starts)
        hw = np.fromiter((cp.w63(u) for u in uniques), np.int64, len(uniques))
        f_h, f_fd = hw[c_s[starts]], fd
    else:
        f_h = f_fd = np.array([], np.int64)
    zeros_f = np.zeros(len(f_h), np.int64)
    return pa.table(
        {
            "h": pa.array(np.concatenate([f_h, t_h]), pa.int64()),
            "fd": pa.array(np.concatenate([f_fd, np.zeros(len(ub), np.int64)]),
                           pa.int64()),
            "n_docs": pa.array(np.concatenate([zeros_f, t_nd]), pa.int64()),
            "n_tokens": pa.array(np.concatenate([zeros_f, t_nt]), pa.int64()),
        }
    )


def _vg_mixed_sorted_block(batch: pa.Table) -> pa.Table:
    """Block sorted by h: totals rows (h <= -3) decode their bucket and
    pass through; token rows take the global min(fd) per run (equal h
    never splits across blocks), bucketed and bincounted.  Output:
    <= buckets-per-block (bucket, n_docs, n_tokens, n_new_types) partial
    rows."""
    n = len(batch)
    empty = pa.table(
        {
            "bucket": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "n_new_types": pa.array([], pa.int64()),
        }
    )
    if n == 0:
        return empty
    h = batch.column("h").to_numpy(zero_copy_only=False)
    fd = batch.column("fd").to_numpy(zero_copy_only=False)
    tot = h <= -3
    parts = []
    if tot.any():
        parts.append(pa.table(
            {
                "bucket": pa.array(-3 - h[tot], pa.int64()),
                "n_docs": batch.column("n_docs").filter(pa.array(tot)),
                "n_tokens": batch.column("n_tokens").filter(pa.array(tot)),
                "n_new_types": pa.array(np.zeros(int(tot.sum()), np.int64),
                                        pa.int64()),
            }
        ))
    hh, ff = h[~tot], fd[~tot]  # sorted-order preserving slice
    if len(hh):
        starts = np.r_[0, np.flatnonzero(hh[1:] != hh[:-1]) + 1]
        bucket = np.minimum.reduceat(ff, starts) // VG_BUCKET_DOCS
        ub, cnt = np.unique(bucket, return_counts=True)
        z = np.zeros(len(ub), np.int64)
        parts.append(pa.table(
            {
                "bucket": pa.array(ub, pa.int64()),
                "n_docs": pa.array(z, pa.int64()),
                "n_tokens": pa.array(z, pa.int64()),
                "n_new_types": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        ))
    return pa.concat_tables(parts) if parts else empty


def _vg_final(t: pa.Table) -> pa.Table:
    """One-block finish: order by bucket, drop the sentinel, cumulative
    vocabulary / token sums."""
    b = t.column("bucket").to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="stable")
    keep = b[order] >= 0
    order = order[keep]
    nd = t.column("n_docs").to_numpy(zero_copy_only=False)[order]
    nt = t.column("n_tokens").to_numpy(zero_copy_only=False)[order]
    nn = t.column("n_new_types").to_numpy(zero_copy_only=False)[order]
    return pa.table(
        {
            "bucket": pa.array(b[order], pa.int64()),
            "n_docs": pa.array(nd, pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
            "n_new_types": pa.array(nn, pa.int64()),
            "vocab_cum": pa.array(np.cumsum(nn), pa.int64()),
            "tokens_cum": pa.array(np.cumsum(nt), pa.int64()),
        }
    )


def q_token_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary growth: per doc-ordinal bucket, new distinct
    tokens + cumulative vocabulary vs cumulative token instances."""
    import ray.data as rd

    from ray.data.aggregate import Sum

    comb = cp.read_documents(sf_dir).map_batches(
        _vg_combined_partial, batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.from_arrow(pa.table(
        # sentinel: own h run, bucket -VG_BUCKET_DOCS//VG_BUCKET_DOCS = -1,
        # dropped in the finish — keeps the sort/aggregate inputs typed on
        # an empty corpus
        {"h": pa.array([-1], pa.int64()),
         "fd": pa.array([-VG_BUCKET_DOCS], pa.int64()),
         "n_docs": pa.array([0], pa.int64()),
         "n_tokens": pa.array([0], pa.int64())}
    )))
    curve = comb.sort("h").map_batches(
        _vg_mixed_sorted_block, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("bucket").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_tokens", alias_name="n_tokens"),
        Sum("n_new_types", alias_name="n_new_types"),
    )
    return curve.repartition(1).map_batches(
        _vg_final, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def token_vocab_growth_oracle_sql() -> str:
    b = VG_BUCKET_DOCS
    h = cp.SQL_W63.format(s="token")
    toks = cp.SQL_TOKS.format(t="text")
    return f"""
WITH tok AS (
  SELECT doc_id, {h} AS h
  FROM (SELECT doc_id, unnest({toks}) AS token FROM documents)
),
firsts AS (SELECT h, min(doc_id) AS fd FROM tok GROUP BY h),
newb AS (
  SELECT fd // {b} AS bucket, count(*)::BIGINT AS n_new_types
  FROM firsts GROUP BY 1
),
docsb AS (
  SELECT doc_id // {b} AS bucket, count(*)::BIGINT AS n_docs
  FROM documents GROUP BY 1
),
tokb AS (
  SELECT doc_id // {b} AS bucket, count(*)::BIGINT AS n_tokens
  FROM tok GROUP BY 1
),
base AS (
  SELECT d.bucket, d.n_docs,
    coalesce(t.n_tokens, 0)::BIGINT AS n_tokens,
    coalesce(nb.n_new_types, 0)::BIGINT AS n_new_types
  FROM docsb d
  LEFT JOIN tokb t USING (bucket)
  LEFT JOIN newb nb USING (bucket)
)
SELECT bucket, n_docs, n_tokens, n_new_types,
  CAST(sum(n_new_types) OVER (ORDER BY bucket) AS BIGINT) AS vocab_cum,
  CAST(sum(n_tokens) OVER (ORDER BY bucket) AS BIGINT) AS tokens_cum
FROM base
""".strip()
