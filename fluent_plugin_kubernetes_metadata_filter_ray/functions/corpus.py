"""Shared helpers for the training-data operators over the ``documents`` /
``embeddings`` tables: tokenization + hashing primitives with exact DuckDB
twins, and the deterministically *augmented* corpus used by the near-dup
operators.

Hash primitives (identical on both sides):
  - ``w32(s)``  = first 8 hex chars of md5(s) as uint32
  - ``w63(s)``  = first 16 hex chars of md5(s) as uint64, masked to 63 bits
                  (kept in BIGINT range so Arrow int64 == DuckDB BIGINT)
  - minhash_i(s) = (A[i] * w32(s) + B[i]) mod 2^32  (multiply-shift family)

Augmented corpus: the driver's synthetic documents are all distinct, so the
near-dup operators would find nothing interesting.  Each doc with
``doc_id % 5 == 0`` gets a deterministic near-duplicate copy (first token
dropped, doc_id + 1_000_000) — SQL twin in :data:`AUG_DOCS_CTE`.  No external
data; everything derives from documents.parquet.
"""

from __future__ import annotations

import hashlib

import numpy as np

AUG_OFFSET = 1_000_000
AUG_MOD = 5

# stopword set for quality scoring / language-ID (tiny on purpose; the
# synthetic vocab only contains 'a' and 'the' of these)
STOPWORDS = ("a", "the", "and", "of", "in", "to", "is")

# BPE-ish token pattern (RE2-safe, identical semantics in pyarrow + DuckDB:
# leftmost non-overlapping scan)
BPE_PATTERN = r"[a-z]+|[A-Z][a-z]*|[0-9]+|\S"

# minhash family: H functions, banded b x r for LSH
MINHASH_H = 16
LSH_BANDS = 4
LSH_ROWS = 4  # MINHASH_H / LSH_BANDS
SHINGLE_K = 3  # word k-grams
MINHASH_JACCARD_THRESHOLD = 0.5
# signature-estimated-Jaccard prefilter at pair emission: a band collision
# guarantees LSH_ROWS equal components "for free", so requiring ≥ 5 of
# MINHASH_H kills ~all random band collisions (est ≈ 4/16) while dropping
# only P(Binom(12, j) = 0) ≈ 0.02% of true j ≥ 0.5 pairs.  Replicated in
# the oracle SQL — part of the operator's contract, not a silent heuristic.
MINHASH_PREFILTER_MIN = 5
# exact n-gram Jaccard similarity join (q_dedup_ngram): threshold 3/5.  All
# prefix/size math is kept in INTEGERS so both sides agree exactly:
#   ceil(0.6*sz)      == (3*sz + 4) // 5
#   min >= 0.6*max    == 5*min >= 3*max
NGRAM_JACCARD_THRESHOLD = 0.6

_GOLD = 2654435761
MINHASH_A = [(_GOLD * (2 * i + 1)) % 2**32 for i in range(MINHASH_H)]
MINHASH_B = [(40503 * (i + 7)) % 2**32 for i in range(MINHASH_H)]

SIMHASH_BITS = 62  # keep the fingerprint positive in int64 / BIGINT
SIMHASH_BAND_BITS = 16
SIMHASH_N_BANDS = 4
SIMHASH_HAMMING_THRESHOLD = 3

MASK63 = (1 << 63) - 1


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def w32(s: str) -> int:
    return int(md5_hex(s)[:8], 16)


def w63(s: str) -> int:
    return int(md5_hex(s)[:16], 16) & MASK63


def w64(s: str) -> int:
    return int(md5_hex(s)[:16], 16)


def shingles(tokens: list[str], k: int = SHINGLE_K) -> list[str]:
    """Word k-gram shingles (duplicates kept; callers distinct as needed).
    Twin: list_transform(generate_series(1, len-k+1), i ->
    list_aggregate(toks[i:i+k-1], 'string_agg', ' '))."""
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def minhash_signature(shingle_w32: np.ndarray) -> np.ndarray:
    """H minhash values over a uint64 array of w32 shingle hashes."""
    a = np.asarray(MINHASH_A, dtype=np.uint64)[:, None]
    b = np.asarray(MINHASH_B, dtype=np.uint64)[:, None]
    h = (a * shingle_w32[None, :] + b) % np.uint64(2**32)
    return h.min(axis=1)


# --- SQL twins ------------------------------------------------------------

# whitespace-class trim twin: DuckDB trim() strips SPACES only, while
# Python str.strip() / pyarrow utf8_trim_whitespace strip the whole \s
# class (tabs, newlines) — regex-trim so both sides agree
SQL_WTRIM = "regexp_replace({t}, '^\\s+|\\s+$', '', 'g')"

# whitespace tokenization twin WITH the empty-text guard: Python
# ''.split() yields 0 tokens, but bare regexp_split_to_array('', '\s+')
# yields [''] — so every SQL twin tokenizes through this template or
# n_tokens / token_freq / shingles diverge on empty/whitespace-only docs
SQL_TOKS = (
    f"CASE WHEN {SQL_WTRIM} = '' THEN []::VARCHAR[] "
    f"ELSE regexp_split_to_array({SQL_WTRIM}, '\\s+') END"
)

# w32 / w63 as SQL expression templates over a string expression {s}
SQL_W32 = "(('0x' || substr(md5({s}), 1, 8))::UBIGINT)"
SQL_W63 = "((('0x' || substr(md5({s}), 1, 16))::UBIGINT & 9223372036854775807)::BIGINT)"
SQL_W64 = "(('0x' || substr(md5({s}), 1, 16))::UBIGINT)"


def sql_minhash(i: int, w32_expr: str) -> str:
    return f"(({MINHASH_A[i]}::UBIGINT * {w32_expr} + {MINHASH_B[i]}) % 4294967296)"


# augmented documents CTE: original docs + near-dup copies (first token
# dropped, doc_id+AUG_OFFSET) + exact copies (doc_id+2*AUG_OFFSET), so the
# dedup operators have real work.  Python twin: augment_batch below.
EXACT_MOD = 7
AUG_DOCS_CTE = f"""
docs_aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {AUG_OFFSET} AS doc_id,
         regexp_replace(text, '^\\S+\\s+', '') AS text
  FROM documents WHERE doc_id % {AUG_MOD} = 0
  UNION ALL
  SELECT doc_id + {2 * AUG_OFFSET} AS doc_id, text
  FROM documents WHERE doc_id % {EXACT_MOD} = 0
)
""".strip()


# id-only twin of AUG_DOCS_CTE (for operators that need the doc universe
# without re-deriving texts)
AUG_IDS_SQL = f"""
SELECT doc_id FROM documents
UNION ALL SELECT doc_id + {AUG_OFFSET} FROM documents WHERE doc_id % {AUG_MOD} = 0
UNION ALL SELECT doc_id + {2 * AUG_OFFSET} FROM documents WHERE doc_id % {EXACT_MOD} = 0
""".strip()


def augment_batch(batch):
    """pyarrow twin of AUG_DOCS_CTE — one stateless map_batches stage."""
    import pyarrow as pa
    import pyarrow.compute as pc

    doc_id = batch.column("doc_id").combine_chunks()
    text = batch.column("text").combine_chunks()
    ids = doc_id.to_numpy(zero_copy_only=False)
    mask = pa.array(ids % AUG_MOD == 0)
    dup_ids = pc.add(doc_id.filter(mask), AUG_OFFSET)
    dup_text = pc.replace_substring_regex(
        text.filter(mask), r"^\S+\s+", "", max_replacements=1
    )
    emask = pa.array(ids % EXACT_MOD == 0)
    exact_ids = pc.add(doc_id.filter(emask), 2 * AUG_OFFSET)
    exact_text = text.filter(emask)
    return pa.table(
        {
            "doc_id": pa.chunked_array([doc_id, dup_ids, exact_ids]),
            "text": pa.chunked_array([text, dup_text, exact_text]),
        }
    )


def batch_shingles(batch):
    """Factorized word SHINGLE_K-gram shingles for a whole batch: shingle
    strings built by exploded-token shifted joins (C kernels, no per-row
    Python), then ``pd.factorize`` so each DISTINCT shingle is hashed
    exactly once by callers — on shared-vocabulary corpora (boilerplate-
    heavy crawls, our synthetic tables) this cuts the hashing 10-50× vs
    per-instance md5.  Shared by the MinHash dedup kernels and the
    decontamination op, so shingle semantics can never silently diverge
    between their oracles.

    Returns ``(rows, codes, uniques)`` with ``rows`` (block positions)
    monotonically nondecreasing, or ``None`` if the batch has no shingles.
    Null texts explode to NaN and drop out (no shingles), matching the
    pass-through hardening of the transcript path."""
    import pandas as pd

    s = pd.Series(batch.column("text").to_pandas())
    ex = s.str.split().explode()
    grp = ex.groupby(level=0)
    sh = (ex + " " + grp.shift(-1) + " " + grp.shift(-2)).dropna()
    if not len(sh):
        return None
    codes, uniques = pd.factorize(sh.to_numpy())
    return sh.index.to_numpy(dtype=np.int64), codes, uniques


def _right_sized_blocks(path: str, rows_per_block: int = 16384) -> int:
    """Block count for a small side table: Ray's default splits even a
    5k-row file into 64 blocks, and every downstream sort/groupby barrier
    then pays 64-task latency per stage.  ~rows/16k blocks, floored at 2
    and capped at 2×CPUs, keeps tiny corpora in a handful of blocks while
    big inputs (many files at real scale) still fan out."""
    import pyarrow.parquet as pq

    try:
        rows = pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return 0
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    by_rows = (rows + rows_per_block - 1) // rows_per_block
    # fan out to the session's CPUs whenever each block still holds ≥2k
    # rows: the pure rows/16k split gave the 100k-row scale corpus only 7
    # blocks, so every downstream map stage ran 7 tasks on 32 CPUs (4/5 of
    # the machine idle through the minhash/shingle kernels)
    par = min(cpus, rows // 2048)
    return max(2, min(2 * cpus, max(by_rows, par)))


def augment_ids_batch(batch):
    """Id-only twin of :func:`augment_batch` (AUG_IDS_SQL): the augmented
    doc-id universe without carrying text."""
    import pyarrow as pa
    import pyarrow.compute as pc

    doc_id = batch.column("doc_id").combine_chunks()
    ids = doc_id.to_numpy(zero_copy_only=False)
    dup_ids = pc.add(doc_id.filter(pa.array(ids % AUG_MOD == 0)), AUG_OFFSET)
    exact_ids = pc.add(doc_id.filter(pa.array(ids % EXACT_MOD == 0)), 2 * AUG_OFFSET)
    return pa.table({"doc_id": pa.chunked_array([doc_id, dup_ids, exact_ids])})


def read_augmented_ids(sf_dir: str):
    return read_documents(sf_dir, columns=("doc_id",)).map_batches(
        augment_ids_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def read_documents(sf_dir: str, columns=("doc_id", "text")):
    """Column-pruned, block-right-sized read of the documents table."""
    import ray.data

    path = f"{sf_dir}/documents.parquet"
    return ray.data.read_parquet(
        path, columns=list(columns),
        override_num_blocks=_right_sized_blocks(path) or None,
    )


def read_augmented(sf_dir: str):
    return read_documents(sf_dir).map_batches(
        augment_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def read_embeddings(sf_dir: str, columns=("vec_id", "embedding")):
    import ray.data

    path = f"{sf_dir}/embeddings.parquet"
    return ray.data.read_parquet(
        path, columns=list(columns),
        override_num_blocks=_right_sized_blocks(path, rows_per_block=8192) or None,
    )


def per_file_map(files, kernel):
    """One Ray task per checkpoint parquet file, with the file's COMPLETE
    table read INSIDE the task before the kernel runs.

    The sort-checkpoint pattern (doc_rank / doc_pack / token_postings)
    needs per-FILE kernels: offsets and run boundaries are keyed by file.
    ``read_parquet(files, override_num_blocks=len(files))`` does NOT
    guarantee that — Ray re-splits a file into row-group-sized blocks once
    it outgrows one (observed: a 58k-row checkpoint file arriving as
    10k-row batches at the 20M-pair bench scale, caught by the contract
    guards).  Fusing the read into the task is the only layout Ray cannot
    re-split.

    ``kernel(table, path) -> table`` must return a typed table; it is
    called once per file.  Empty path-blocks (repartition slack) yield the
    kernel's ``(None, None)`` response, which must be its typed empty."""
    import pyarrow as pa
    import ray.data as rd

    def run(b: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq_

        paths = b.column("path").to_pylist() if b.num_columns else []
        outs = [kernel(pq_.read_table(p), p) for p in paths]
        return pa.concat_tables(outs) if outs else kernel(None, None)

    paths_t = pa.table({"path": pa.array(list(files), pa.string())})
    return (
        rd.from_arrow(paths_t)
        .repartition(len(files))
        .map_batches(run, batch_format="pyarrow", batch_size=None)
    )
