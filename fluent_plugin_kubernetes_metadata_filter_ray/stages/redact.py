"""Record scrubbing (SURVEY.md §2.2): redact secret-bearing substrings from
log records before they reach a sink.

Reference analog: the plugin family's record-mutation filters — the
kubernetes_metadata filter rewrites records in place per event
(lib/fluent/plugin/filter_kubernetes_metadata.rb:244-281); sibling fluentd
deployments chain a de-identification filter (mask container ids, emails,
bearer tokens) before `<match>` fan-out.  Here that pass is one stateless
vectorized ``map_batches`` over zero-copy Arrow string columns: RE2 kernels
(``pc.replace_substring_regex`` / ``pc.count_substring_regex``), no Python
row loop, no shuffle — scale-safe at any corpus size by construction.

Determinism / oracle parity: every pattern is RE2 on BOTH sides (Arrow and
DuckDB both embed RE2), patterns are applied in the fixed REDACT_PATTERNS
order, and match counts are taken on the ORIGINAL value (so the count is
independent of replacement order).  The DuckDB twin nests
``regexp_replace(..., 'g')`` in the same order and counts with
``len(regexp_extract_all(...))``.
"""

from __future__ import annotations

import pyarrow as pa

# (name, RE2 pattern, replacement) — order matters and is mirrored in SQL.
# hex_id first: 32+-char hex runs (docker container ids, pod-uid log paths)
# can otherwise feed the email/ip patterns fragments of already-masked text.
REDACT_PATTERNS: list[tuple[str, str, str]] = [
    ("hex_id", "[0-9a-f]{32,}", "<hex>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<email>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<ip>"),
    ("bearer", "Bearer [A-Za-z0-9._~+/=-]+", "<secret>"),
]

_REDACT_COLUMNS = ("text", "tool")


def scrub_table(t: pa.Table, columns: tuple[str, ...] = _REDACT_COLUMNS) -> pa.Table:
    """Scrub ``columns`` in place and append an ``n_redacted`` audit count.

    Null values pass through as null (count 0), matching SQL semantics —
    the hostile-row guarantee the rest of the pipeline makes.  Counts are
    taken on the ORIGINAL value; replacements apply in REDACT_PATTERNS
    order (replacement tokens are chosen so no pattern matches them —
    scrubbing is idempotent on the text)."""
    import numpy as np
    import pyarrow.compute as pc

    total = pa.array(np.zeros(len(t), dtype=np.int64))
    out = {}
    for name in t.column_names:
        col = t.column(name)
        if name in columns:
            orig = col
            for _, pat, repl in REDACT_PATTERNS:
                cnt = pc.fill_null(
                    pc.count_substring_regex(orig, pat).cast(pa.int64()), 0
                )
                total = pc.add(total, cnt)
                col = pc.replace_substring_regex(col, pat, repl)
        out[name] = col
    out["n_redacted"] = total
    return pa.table(out)


def redact_stage(ds, columns: tuple[str, ...] = _REDACT_COLUMNS):
    def scrub(t: pa.Table) -> pa.Table:
        return scrub_table(t, columns)

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)


def redact_oracle_sql() -> str:
    from .. import datagen as dg

    def replaced(col: str) -> str:
        expr = col
        for _, pat, repl in REDACT_PATTERNS:
            expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
        return expr

    def counted(col: str) -> str:
        terms = [
            f"coalesce(len(regexp_extract_all({col}, '{pat}')), 0)"
            for _, pat, _ in REDACT_PATTERNS
        ]
        return "(" + " + ".join(terms) + ")"

    cols = " + ".join(counted(c) for c in _REDACT_COLUMNS)
    return f"""
WITH {dg.TRANSCRIPTS_CTE}
SELECT conv_id, turn_idx, role,
  {replaced('text')} AS text,
  {replaced('tool')} AS tool,
  ts,
  ({cols})::BIGINT AS n_redacted
FROM transcripts_t
""".strip()
