"""Log-analytics operators over the transcripts table (SURVEY.md §2.5/§2.9):
template mining, turn-sequence transitions, hopping-window rates, and burst
detection — the operator family a production log pipeline runs downstream of
parse → enrich → route (the reference's deployments feed exactly these
analyses from their `<match>` sinks; cf. the benchmark configs under
/root/reference/doc/benchmark/*/readme.md which count and rate the routed
stream).

Every operator follows the repo's scale pattern: collapse inside
``map_batches`` first (combiner pushdown), shuffle only tiny partials, and
mask null group keys with the shared sentinel (Ray's sort/hash shuffle
comparators reject null keys) — unmasked back to SQL-style NULL groups on
the aggregated result.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Min, Sum

from .aggregate import _NULL_KEY, _mask_null_key, per_key_counts

# int64 sentinel for null time-bucket keys (epoch µs is always far above it)
_NULL_US = -(2**62)

# --------------------------------------------------------------------------
# Log template mining (Drain-lite): mask the variable fragments of a log
# line (hex ids, numbers) and aggregate the surviving constant skeletons.
# Patterns are RE2 on BOTH sides (Arrow and DuckDB embed the same engine)
# and apply in fixed order; <hex> first so long ids don't leak digit runs
# into the <num> pass.
# --------------------------------------------------------------------------

TEMPLATE_PATTERNS: list[tuple[str, str, str]] = [
    ("hex_id", "[0-9a-f]{16,}", "<hex>"),
    ("number", "[0-9]+", "<num>"),
]


def template_column(col: pa.ChunkedArray) -> pa.ChunkedArray:
    for _, pat, repl in TEMPLATE_PATTERNS:
        col = pc.replace_substring_regex(col, pat, repl)
    return col


def log_templates(ds):
    """Mine log templates: one row per (role, template) with turn count,
    exact distinct-conversation count, and the lexically-first example
    conversation.

    Ray shape — ONE pass over the text (the regex mask is the expensive
    kernel, so it must run once), then the exact-count-distinct shape:

    - per-batch ``group_by(role, template, conv_id)`` with counts — the
      shuffle carries per-batch-distinct triples, not turns;
    - ``groupby`` over the triples Sums the counts (one row per distinct
      triple globally);
    - a per-batch re-group of the triple aggregate emits (role, template)
      partials — n_turns = Sum of triple counts, n_convs = count of
      non-null convs, example = min conv — merged by a final tiny
      Sum/Sum/Min.  Each global triple appears exactly once after the
      triple aggregate, so the per-batch re-group partials combine
      exactly.  Null conv_ids ride a sentinel through both shuffles and
      are excluded from the distinct/min measures (SQL
      ``count(DISTINCT ...)`` / ``min`` semantics) while still counting
      toward n_turns."""

    ds = ds.select_columns(["conv_id", "role", "text"])

    # Templates are arbitrary user text, so a NULL template key rides an
    # explicit validity FLAG through both shuffles (a real text whose masked
    # template happened to equal an in-band string sentinel would otherwise
    # be merged into the NULL group — the same user-string-collision class
    # the q_source_overlap join guards against).  role/conv_id keep the
    # shared sentinel: both are producer-controlled identifiers, not
    # free-form text, and the sentinel contains \x00 which the tag grammar
    # and datagen never emit — bound documented here.
    def partial_triples(t: pa.Table) -> pa.Table:
        tpl = template_column(t.column("text"))
        tt = pa.table(
            {
                "role": pc.fill_null(t.column("role"), _NULL_KEY),
                "template": pc.fill_null(tpl, ""),
                "tpl_null": pc.cast(pc.is_null(tpl), pa.int32()),
                "conv_id": pc.fill_null(t.column("conv_id"), _NULL_KEY),
            }
        )
        g = tt.group_by(["role", "template", "tpl_null", "conv_id"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "role": g.column("role"),
                "template": g.column("template"),
                "tpl_null": g.column("tpl_null"),
                "conv_id": g.column("conv_id"),
                "n_turns": g.column("count_all").cast(pa.int64()),
            }
        )

    def partial_rt(t: pa.Table) -> pa.Table:
        conv = t.column("conv_id")
        conv_or_null = pc.if_else(
            pc.equal(conv, _NULL_KEY), pa.scalar(None, pa.string()), conv
        )
        tt = pa.table(
            {
                "role": t.column("role"),
                "template": t.column("template"),
                "tpl_null": t.column("tpl_null"),
                "n_turns": t.column("n_turns"),
                "conv": conv_or_null,
            }
        )
        g = tt.group_by(["role", "template", "tpl_null"]).aggregate(
            [("n_turns", "sum"), ("conv", "count"), ("conv", "min")]
        )
        return pa.table(
            {
                "role": g.column("role"),
                "template": g.column("template"),
                "tpl_null": g.column("tpl_null"),
                "n_turns": g.column("n_turns_sum").cast(pa.int64()),
                "n_convs": g.column("conv_count").cast(pa.int64()),
                "example_conv": g.column("conv_min"),
            }
        )

    triples = (
        ds.map_batches(partial_triples, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["role", "template", "tpl_null", "conv_id"])
        .aggregate(Sum("n_turns", alias_name="n_turns"))
    )
    merged = triples.map_batches(
        partial_rt, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["role", "template", "tpl_null"]).aggregate(
        Sum("n_turns", alias_name="n_turns"),
        Sum("n_convs", alias_name="n_convs"),
        Min("example_conv", alias_name="example_conv"),
    )

    def unmask(t: pa.Table) -> pa.Table:
        def um(col):
            return pc.if_else(
                pc.equal(col, _NULL_KEY), pa.scalar(None, pa.string()), col
            )

        # template unmasks by PROVENANCE (the flag), never by value
        tpl = pc.if_else(
            pc.equal(t.column("tpl_null"), 1),
            pa.scalar(None, pa.string()),
            t.column("template"),
        )
        return pa.table(
            {
                "role": um(t.column("role")),
                "template": tpl,
                "n_turns": t.column("n_turns"),
                "n_convs": t.column("n_convs"),
                "example_conv": t.column("example_conv"),
            }
        )

    return merged.map_batches(unmask, batch_format="pyarrow", zero_copy_batch=True)


def log_templates_oracle_sql() -> str:
    from .. import datagen as dg

    tpl = "text"
    for _, pat, repl in TEMPLATE_PATTERNS:
        tpl = f"regexp_replace({tpl}, '{pat}', '{repl}', 'g')"
    return f"""
WITH {dg.TRANSCRIPTS_CTE},
tm AS (SELECT role, {tpl} AS template, conv_id FROM transcripts_t)
SELECT role, template, count(*)::BIGINT AS n_turns,
  count(DISTINCT conv_id)::BIGINT AS n_convs,
  min(conv_id) AS example_conv
FROM tm GROUP BY role, template
""".strip()


# --------------------------------------------------------------------------
# Role-transition counts: the turn-sequence bigram (who speaks after whom)
# — the Markov/funnel statistic over conversation order.
# --------------------------------------------------------------------------


_TRANSITIONS_EMPTY = pa.table(
    {
        "from_role": pa.array([], pa.string()),
        "to_role": pa.array([], pa.string()),
        "n_pairs": pa.array([], pa.int64()),
    }
)


# null-LAST sort key for the role tie-breaker: mirrors DuckDB's default
# ASC NULLS LAST.  Max-codepoint pair — roles are producer-controlled
# identifiers (same bound the \x00 sentinel documents), never user text.
_NULL_LAST_KEY = "\U0010ffff\U0010ffff"
# int64 NULLS-LAST fill for ts/turn_idx sort keys (epoch µs ≪ 2^62)
_KEY_NULL_LAST = 2**62


def _make_transitions_block(value_name: str, out_from: str, out_to: str):
    """Bigram partial counts over a conv-sorted block, parameterized by
    the VALUE column (role for role_transitions, tool for
    tool_transitions): ONE lexsort by (conv, turn_idx, ts, value), shifted
    pair with a same-conv mask, then a single C++ pyarrow group_by per
    BLOCK — zero per-conv Python (the map_groups shape paid ~50-125 µs/conv
    plus a pandas groupby per conv).  The value column is the FINAL
    tie-breaker on both twins (same determinism class as conv_concat's
    text tie-breaker, ADVICE r2): duplicate (turn_idx, ts) turns with
    different values otherwise pair up in shuffle-arrival order."""
    empty = pa.table(
        {
            out_from: pa.array([], pa.string()),
            out_to: pa.array([], pa.string()),
            "n_pairs": pa.array([], pa.int64()),
        }
    )

    def block(t: pa.Table) -> pa.Table:
        from ..stages.aggregate import _conv_codes

        n = len(t)
        if n < 2:
            return empty
        codes, _ = _conv_codes(t)
        # sort keys as FILLED int64 (nulls → +2^62 = SQL NULLS LAST): a null
        # ts/turn_idx would otherwise surface as float NaN, and NaN != NaN
        # breaks both the duplicate gate below and lexsort determinism
        ti = pc.fill_null(t.column("turn_idx").cast(pa.int64()), _KEY_NULL_LAST).to_numpy(
            zero_copy_only=False
        )
        ts = pc.fill_null(t.column("ts").cast(pa.int64()), _KEY_NULL_LAST).to_numpy(
            zero_copy_only=False
        )
        val = t.column(value_name)
        if isinstance(val, pa.ChunkedArray):
            val = val.combine_chunks()
        order = np.lexsort((ts, ti, codes))
        # pay the object-array value key only when (conv, ti, ts) DUPLICATES
        # exist — the sole case where the tie-break can matter (ties are
        # rare on real streams; the common path stays all-int)
        c0, t0, s0 = codes[order], ti[order], ts[order]
        if bool(((c0[1:] == c0[:-1]) & (t0[1:] == t0[:-1]) & (s0[1:] == s0[:-1])).any()):
            val_key = np.asarray(
                pc.fill_null(val, _NULL_LAST_KEY).to_pylist(), dtype=object
            )
            order = np.lexsort((val_key, ts, ti, codes))
        c_s = codes[order]
        same = c_s[1:] == c_s[:-1]
        if not same.any():
            return empty
        vals_s = pc.fill_null(val.take(pa.array(order)), _NULL_KEY)
        keep = pa.array(same)
        pairs = pa.table(
            {
                out_from: vals_s.slice(0, n - 1).filter(keep),
                out_to: vals_s.slice(1, n - 1).filter(keep),
            }
        )
        g = pairs.group_by([out_from, out_to]).aggregate([([], "count_all")])
        return pa.table(
            {
                out_from: g.column(out_from),
                out_to: g.column(out_to),
                "n_pairs": g.column("count_all").cast(pa.int64()),
            }
        )

    return block


_transitions_sorted_block = _make_transitions_block("role", "from_role", "to_role")


_TRANS_SENT = "\x00\x00trans-sent"


def _transitions_tail(partials, out_from: str, out_to: str):
    """Shared transitions tail: sentinel threading (a single-turn-only or
    empty transcripts stream yields ZERO partial rows end-to-end — the
    Ray 2.49 empty-shuffle schema race CLAUDE.md documents) → tiny
    groupby Sum → sentinel drop + null-key restore."""
    import ray.data as rd

    from .aggregate import _unmask_col

    partials = partials.union(rd.from_arrow(pa.table(
        {
            out_from: pa.array([_TRANS_SENT], pa.string()),
            out_to: pa.array([_TRANS_SENT], pa.string()),
            "n_pairs": pa.array([0], pa.int64()),
        }
    )))
    agg = partials.groupby([out_from, out_to]).aggregate(
        Sum("n_pairs", alias_name="n_pairs")
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column(out_from), _TRANS_SENT))
        return pa.table(
            {
                out_from: _unmask_col(t.column(out_from)),
                out_to: _unmask_col(t.column(out_to)),
                "n_pairs": t.column("n_pairs").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def role_transitions(ds):
    """Count role → next-role transitions across consecutive turns of each
    conversation (ordered by turn_idx, ties by ts), aggregated corpus-wide.

    Ray shape: sort by conv_id → vectorized per-block bigram partials
    (≤ roles² rows per block) → tiny ``groupby(from_role, to_role)`` Sum.
    Null roles form SQL-style groups (sentinel-masked through the
    shuffle); see aggregate._sorted_by_conv for the block contract."""
    from .aggregate import _sorted_by_conv

    partials = _sorted_by_conv(
        ds, ["conv_id", "turn_idx", "role", "ts"]
    ).map_batches(_transitions_sorted_block, batch_format="pyarrow", zero_copy_batch=True)
    return _transitions_tail(partials, "from_role", "to_role")


def role_transitions_mapgroups(ds):
    """Reference ``groupby(conv_id).map_groups`` implementation — kept (not
    driver-wired) as the baseline the property tests compare the
    sorted-block kernel against on randomized multi-block layouts."""
    from .aggregate import _mask_null_key

    ds = _mask_null_key(ds.select_columns(["conv_id", "turn_idx", "role", "ts"]), "conv_id")

    def per_conv(g: pa.Table) -> pa.Table:
        if len(g) < 2:
            return _TRANSITIONS_EMPTY
        ti = pc.fill_null(g.column("turn_idx").cast(pa.int64()), _KEY_NULL_LAST).to_numpy(
            zero_copy_only=False
        )
        ts = pc.fill_null(g.column("ts").cast(pa.int64()), _KEY_NULL_LAST).to_numpy(
            zero_copy_only=False
        )
        role_key = np.asarray(
            [r if r is not None else _NULL_LAST_KEY for r in g.column("role").to_pylist()],
            dtype=object,
        )
        order = np.lexsort((role_key, ts, ti))
        roles = np.asarray(
            [r if r is not None else _NULL_KEY for r in g.column("role").to_pylist()],
            dtype=object,
        )[order]
        import pandas as pd

        df = pd.DataFrame({"from_role": roles[:-1], "to_role": roles[1:]})
        cnt = df.groupby(["from_role", "to_role"], sort=False).size()
        out = cnt.reset_index(name="n_pairs")
        return pa.table(
            {
                "from_role": pa.array(out["from_role"], pa.string()),
                "to_role": pa.array(out["to_role"], pa.string()),
                "n_pairs": pa.array(out["n_pairs"].to_numpy(dtype=np.int64)),
            }
        )

    partials = ds.groupby("conv_id").map_groups(per_conv, batch_format="pyarrow")
    agg = partials.groupby(["from_role", "to_role"]).aggregate(
        Sum("n_pairs", alias_name="n_pairs")
    )

    def unmask(t: pa.Table) -> pa.Table:
        def um(col):
            return pc.if_else(
                pc.equal(col, _NULL_KEY), pa.scalar(None, pa.string()), col
            )

        return pa.table(
            {
                "from_role": um(t.column("from_role")),
                "to_role": um(t.column("to_role")),
                "n_pairs": t.column("n_pairs"),
            }
        )

    return agg.map_batches(unmask, batch_format="pyarrow", zero_copy_batch=True)


def role_transitions_oracle_sql() -> str:
    from .. import datagen as dg

    return f"""
WITH {dg.TRANSCRIPTS_CTE},
w AS (
  SELECT role AS from_role,
    lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts, role) AS to_role,
    row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx, ts, role) AS rn,
    count(*) OVER (PARTITION BY conv_id) AS nc
  FROM transcripts_t
)
SELECT from_role, to_role, count(*)::BIGINT AS n_pairs
FROM w WHERE rn < nc GROUP BY from_role, to_role
""".strip()


# --------------------------------------------------------------------------
# Hopping-window rates: overlapping sliding windows (Flink/KSQL HOP) — each
# turn contributes to N_HOPS windows; implemented as bucket-then-expand so
# the ×N_HOPS expansion happens on per-batch AGGREGATED rows, never on the
# turn stream (the interval-join collapses to an expansion because the
# windows form a regular grid).
# --------------------------------------------------------------------------

HOP_S = 1800  # window start every 30 min
N_HOPS = 3  # each window spans 3 hops = 90 min
_HOP_US = HOP_S * 1_000_000


def _hopping_partial(t: pa.Table) -> pa.Table:
    """Per-batch hopping combiner: bucket-group, then replicate the grouped
    rows once per shift.  Partition-independent (property-tested): summing
    partials over any batch split of the input gives the global counts."""
    us = t.column("ts").cast(pa.int64())
    b = pc.multiply(pc.divide(us, _HOP_US), _HOP_US)
    g = pa.table({"b": b}).group_by(["b"]).aggregate([([], "count_all")])
    bs = g.column("b").combine_chunks()
    ns = g.column("count_all").cast(pa.int64()).combine_chunks()
    ws, cs = [], []
    for s in range(N_HOPS):
        ws.append(pc.fill_null(pc.subtract(bs, s * _HOP_US), _NULL_US))
        cs.append(ns)
    return pa.table({"w_us": pa.chunked_array(ws), "n_turns": pa.chunked_array(cs)})


def turn_hopping(ds):
    """Turns per hopping window (length N_HOPS×HOP_S, stride HOP_S): the
    overlapping-window counterpart of ``turn_rates``.  A turn in hop-bucket
    b falls inside the windows starting at b, b-1·hop, …, b-(N_HOPS-1)·hop.

    Ray shape: per-batch group to (bucket, count) FIRST (tiny), replicate
    the grouped rows once per shift, then ``groupby(window)`` Sum — the
    shuffle carries ≤ N_HOPS × buckets-per-batch rows.  The window key
    stays int64 µs through the shuffle (timestamp keys get unit-normalized
    by Ray's hash aggregate) and turns into timestamp[us] at the end."""

    partials = ds.select_columns(["ts"]).map_batches(
        _hopping_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = partials.groupby("w_us").aggregate(Sum("n_turns", alias_name="n_turns"))

    def finish(t: pa.Table) -> pa.Table:
        w = t.column("w_us")
        w = pc.if_else(pc.equal(w, _NULL_US), pa.scalar(None, pa.int64()), w)
        return pa.table(
            {"w_start": w.cast(pa.timestamp("us")), "n_turns": t.column("n_turns")}
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def turn_hopping_oracle_sql() -> str:
    from .. import datagen as dg

    shifts = ", ".join(str(s) for s in range(N_HOPS))
    return f"""
WITH {dg.TRANSCRIPTS_CTE},
h AS (
  SELECT ((epoch_us(ts) // {_HOP_US}) * {_HOP_US}) - s.shift::BIGINT * {_HOP_US} AS w_us
  FROM transcripts_t CROSS JOIN (SELECT unnest([{shifts}]) AS shift) s
)
SELECT make_timestamp(w_us) AS w_start, count(*)::BIGINT AS n_turns
FROM h GROUP BY w_us
""".strip()


# --------------------------------------------------------------------------
# Burst detection: flag (role, hour) buckets whose rate exceeds
# BURST_FACTOR × the role's mean hourly rate — the anomaly tag a log
# pipeline attaches to its rate aggregates.  Pure integer comparison
# (n·H > F·S) so both sides are exact at any scale (the SQL twin computes
# the products in HUGEINT; the engine in unbounded Python ints over the
# tiny aggregated table).
# --------------------------------------------------------------------------

BURST_FACTOR = 2
_HOUR_US = 3_600_000_000


def rate_anomaly(ds):
    """Per (role, hour): turn count + is_burst flag (count > BURST_FACTOR ×
    the role's mean hourly count).

    Ray shape: the combiner-pushed (role, hour) counts (``per_key_counts``
    — the corpus collapses per batch before the shuffle), materialized once
    (it is the aggregated result: ≤ roles × hours rows at any input scale),
    then a per-role Sum/Count over it (a few rows) collected to the driver
    and applied as a broadcast closure — the conv_percentiles tiny-result
    pattern.  Nothing row-scale touches the driver."""

    def with_hour(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64())
        hr = pc.fill_null(pc.multiply(pc.divide(us, _HOUR_US), _HOUR_US), _NULL_US)
        return pa.table(
            {
                "role": pc.fill_null(t.column("role"), _NULL_KEY),
                "hour_us": hr,
            }
        )

    bucketed = ds.select_columns(["role", "ts"]).map_batches(
        with_hour, batch_format="pyarrow", zero_copy_batch=True
    )
    rates = per_key_counts(bucketed, ["role", "hour_us"]).materialize()
    stats = (
        rates.groupby("role")
        .aggregate(Sum("n_turns", alias_name="s"), Count(alias_name="h"))
        .to_pandas()
    )
    if "role" in stats.columns:
        role_stats = {
            r: (int(s), int(h)) for r, s, h in zip(stats["role"], stats["s"], stats["h"])
        }
    else:  # empty corpus: to_pandas of an all-empty Dataset is column-less
        role_stats = {}

    def flag(t: pa.Table) -> pa.Table:
        roles = t.column("role").to_pylist()
        ns = t.column("n_turns").to_pylist()
        burst = []
        for r, n in zip(roles, ns):
            s, h = role_stats[r]
            burst.append(n * h > BURST_FACTOR * s)  # exact: Python ints
        hour = t.column("hour_us")
        hour = pc.if_else(pc.equal(hour, _NULL_US), pa.scalar(None, pa.int64()), hour)
        role = t.column("role")
        role = pc.if_else(pc.equal(role, _NULL_KEY), pa.scalar(None, pa.string()), role)
        return pa.table(
            {
                "role": role,
                "hour_ts": hour.cast(pa.timestamp("us")),
                "n_turns": t.column("n_turns"),
                "is_burst": pa.array(burst, pa.bool_()),
            }
        )

    return rates.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def rate_anomaly_oracle_sql() -> str:
    from .. import datagen as dg

    return f"""
WITH {dg.TRANSCRIPTS_CTE},
r AS (
  SELECT role, date_trunc('hour', ts) AS hour_ts, count(*)::BIGINT AS n_turns
  FROM transcripts_t GROUP BY role, date_trunc('hour', ts)
),
s AS (
  SELECT role, sum(n_turns)::HUGEINT AS s, count(*)::HUGEINT AS h
  FROM r GROUP BY role
)
SELECT r.role, r.hour_ts, r.n_turns,
  (r.n_turns::HUGEINT * s.h > {BURST_FACTOR}::HUGEINT * s.s) AS is_burst
FROM r JOIN s ON r.role IS NOT DISTINCT FROM s.role
""".strip()


# --------------------------------------------------------------------------
# HyperLogLog distinct-conversation cardinality: the sketch aggregate a
# 10^12-turn pipeline uses where exact COUNT(DISTINCT) would shuffle every
# key.  Registers merge with max() — per-batch partials are ≤ HLL_M rows
# regardless of input size, and the estimate is computed from the collected
# ≤ HLL_M-row register table.  Fully deterministic (md5 hashing, integer
# register math, fixed float-operation order), so unlike most sketches it
# has an EXACT DuckDB twin — bit-length comes from a comparison ladder, not
# float log2 (log2(2^52 - 1) rounds UP to exactly 52.0, which would corrupt
# the floor).
# --------------------------------------------------------------------------

HLL_P = 12
HLL_M = 1 << HLL_P
_HLL_REM_BITS = 64 - HLL_P
_HLL_REM_MASK = (1 << _HLL_REM_BITS) - 1
_HLL_MAX_RHO = _HLL_REM_BITS + 1
_HLL_SCALE = float(1 << _HLL_MAX_RHO)  # 2^53, exact as a double


def _hll_partial(t: pa.Table) -> pa.Table:
    """Per-batch registers: (bucket, max rho) over the batch's distinct
    non-null conv_ids — md5 once per distinct key, like the fingerprint
    ops."""
    from ..functions import corpus as cp

    conv = t.column("conv_id").drop_null().unique().to_pylist()
    regs: dict[int, int] = {}
    for c in conv:
        h = cp.w64(c)
        b = h >> _HLL_REM_BITS
        rem = h & _HLL_REM_MASK
        rho = _HLL_MAX_RHO if rem == 0 else _HLL_REM_BITS - rem.bit_length() + 1
        if regs.get(b, 0) < rho:
            regs[b] = rho
    return pa.table(
        {
            "bucket": pa.array(list(regs.keys()), pa.int64()),
            "rho": pa.array(list(regs.values()), pa.int64()),
        }
    )


def _distinct_partial(t: pa.Table) -> pa.Table:
    return pa.table({"conv_id": t.column("conv_id").drop_null().unique()})


def conv_cardinality(ds):
    """One-row (hll_estimate, v_zero, n_convs_exact): the HLL estimate of
    distinct conversations next to the exact count (the exact pass uses
    the dedup shape — per-batch distinct then groupby — so the result
    also audits the sketch's error).  At true 10^12 scale a user would
    run the register pass alone; the twin pass here is what makes the
    estimate's accuracy a tested, driver-checked fact."""
    import math

    import pandas as pd

    from ray.data.aggregate import Max

    thin = ds.select_columns(["conv_id"])
    regdf = (
        thin.map_batches(_hll_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()  # ≤ HLL_M rows by construction
    )
    n_exact = (
        thin.map_batches(_distinct_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("conv_id")
        .count()
        .count()
    )
    rhos = regdf["rho"].to_numpy(dtype=np.int64) if "rho" in regdf.columns else []
    used = len(rhos)
    v_zero = HLL_M - used
    z_scaled = sum(1 << (_HLL_MAX_RHO - int(r)) for r in rhos) + (
        v_zero << _HLL_MAX_RHO
    )
    alpha = 0.7213 / (1.0 + 1.079 / float(HLL_M))
    raw = alpha * float(HLL_M) * float(HLL_M) * _HLL_SCALE / float(z_scaled)
    if raw <= 2.5 * HLL_M and v_zero > 0:
        est = float(HLL_M) * math.log(float(HLL_M) / v_zero)
    else:
        est = raw
    return pd.DataFrame(
        [
            {
                "hll_estimate": np.float64(est),
                "v_zero": np.int64(v_zero),
                "n_convs_exact": np.int64(n_exact),
            }
        ]
    )


def _sql_bitlen(expr: str) -> str:
    """Exact bit-length of a value in [0, 2^_HLL_REM_BITS) as a CASE
    comparison ladder (no float log2 — see module note)."""
    whens = " ".join(
        f"WHEN {expr} >= {1 << (k - 1)} THEN {k}"
        for k in range(_HLL_REM_BITS, 0, -1)
    )
    return f"(CASE {whens} ELSE 0 END)"


def conv_cardinality_oracle_sql() -> str:
    from .. import datagen as dg
    from ..functions import corpus as cp

    w64 = cp.SQL_W64.format(s="conv_id")
    rem = f"(h & {_HLL_REM_MASK})"
    bitlen = _sql_bitlen(rem)
    m = HLL_M
    return f"""
WITH {dg.TRANSCRIPTS_CTE},
hx AS (
  SELECT DISTINCT {w64} AS h FROM transcripts_t WHERE conv_id IS NOT NULL
),
br AS (
  SELECT (h >> {_HLL_REM_BITS})::BIGINT AS bucket,
    (CASE WHEN {rem} = 0 THEN {_HLL_MAX_RHO}
          ELSE {_HLL_REM_BITS} - {bitlen} + 1 END)::BIGINT AS rho
  FROM hx
),
reg AS (SELECT bucket, max(rho) AS rho FROM br GROUP BY bucket),
z AS (
  SELECT count(*)::BIGINT AS used,
    coalesce(sum((1::BIGINT << ({_HLL_MAX_RHO} - rho))::HUGEINT), 0::HUGEINT) AS zp
  FROM reg
),
c AS (
  SELECT ({m} - used) AS v,
    (zp + ({m} - used)::HUGEINT * {1 << _HLL_MAX_RHO}::HUGEINT) AS zs
  FROM z
),
e AS (
  SELECT v,
    (0.7213 / (1.0 + 1.079 / {m}.0)) * {m}.0 * {m}.0 * {float(1 << _HLL_MAX_RHO):.1f}
      / zs::DOUBLE AS raw
  FROM c
)
SELECT
  CASE WHEN raw <= 2.5 * {m} AND v > 0 THEN {m}.0 * ln({m}.0 / v) ELSE raw END
    AS hll_estimate,
  v::BIGINT AS v_zero,
  (SELECT count(DISTINCT conv_id)::BIGINT FROM transcripts_t) AS n_convs_exact
FROM e
""".strip()


# --------------------------------------------------------------------------
# Late-data / watermark flags: per-turn event-time disorder.  The reference
# is order-free (SURVEY W4), but a 10^12-turn TRAINING pipeline needs the
# Flink-style lateness signal: order turns by their sequence (turn_idx),
# track the per-conversation event-time high-water mark, and flag turns
# whose ts lags it beyond the allowed lateness (they'd miss their window
# and need side-output handling).
# --------------------------------------------------------------------------

ALLOWED_LATENESS_S = 3600
_LATE_US = ALLOWED_LATENESS_S * 1_000_000


def _late_sorted_block(t: pa.Table) -> pa.Table:
    """Per-conv watermark scan over a conv-sorted block: block-wide lexsort
    by (conv, turn_idx, ts), then one numpy cummax per conv SEGMENT —
    the same cost class as the rolling-window kernel (two numpy calls per
    conv, no per-group Python machinery)."""
    from .aggregate import _conv_codes, _unmask_col

    n = len(t)
    if n == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], t.schema.field("turn_idx").type),
                "ts": pa.array([], t.schema.field("ts").type),
                "delay_us": pa.array([], pa.int64()),
                "is_late": pa.array([], pa.bool_()),
            }
        )
    from .aggregate import _int_key

    codes, conv = _conv_codes(t)
    # null sort keys fill NULLS-LAST (ADVICE r3: raw to_numpy gives float
    # NaN, which poisons the cummax into INT64_MIN for every later row)
    ti, _ = _int_key(t.column("turn_idx"))
    ts, v = _int_key(t.column("ts"))
    order = np.lexsort((ts, ti, codes))
    c_s, ts_s, v_s = codes[order], ts[order], v[order]
    starts = np.r_[0, np.flatnonzero(c_s[1:] != c_s[:-1]) + 1]
    ends = np.r_[starts[1:], n]
    delay = np.zeros(n, dtype=np.int64)
    late = np.zeros(n, dtype=bool)
    _NO_PREV = np.int64(-(2**62))
    # watermark = running max over PRIOR NON-NULL ts (SQL max() skips
    # NULLs); rows with null ts, or with no prior valid ts, coalesce to
    # delay 0 / is_late false like the oracle twin.
    work = np.where(v_s, ts_s, _NO_PREV)
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        cm = np.maximum.accumulate(work[s : e - 1])
        ok = v_s[s + 1 : e] & (cm != _NO_PREV)
        lag = np.where(ok, cm - ts_s[s + 1 : e], 0)
        delay[s + 1 : e] = np.maximum(0, lag)
        late[s + 1 : e] = lag > _LATE_US
    take = pa.array(order)
    return pa.table(
        {
            "conv_id": _unmask_col(conv.take(take)),
            "turn_idx": t.column("turn_idx").take(take),
            "ts": t.column("ts").take(take),
            "delay_us": pa.array(delay, pa.int64()),
            "is_late": pa.array(late),
        }
    )


def turn_late(ds):
    """Per-turn lateness vs the conversation's event-time watermark:
    ``delay_us`` = how far this turn's ts lags the max ts of all PRIOR
    turns (sequence order: turn_idx, ties by ts); ``is_late`` when the lag
    exceeds ALLOWED_LATENESS_S.  Sorted-block shape; the shuffle carries 3
    thin columns."""
    from .aggregate import _sorted_by_conv

    return _sorted_by_conv(ds, ["conv_id", "turn_idx", "ts"]).map_batches(
        _late_sorted_block, batch_format="pyarrow", zero_copy_batch=True
    )


def turn_late_mapgroups(ds):
    """Reference ``groupby(conv_id).map_groups`` implementation (see
    conv_sessions_mapgroups) — kept as the semantic baseline the property
    tests compare the sorted-block kernel against on randomized
    multi-block layouts, including null ts/turn_idx rows."""
    from .aggregate import _int_key, _mask_null_key, _unmask_null_key

    need = ["conv_id", "turn_idx", "ts"]
    if set(need) < set(ds.schema().names):
        ds = ds.select_columns(need)

    def per_conv(g: pa.Table) -> pa.Table:
        ti, _ = _int_key(g.column("turn_idx"))
        ts, v = _int_key(g.column("ts"))
        order = np.lexsort((ts, ti))
        ts_s, v_s = ts[order], v[order]
        n = len(g)
        delay = np.zeros(n, dtype=np.int64)
        late = np.zeros(n, dtype=bool)
        no_prev = np.int64(-(2**62))
        if n > 1:
            work = np.where(v_s, ts_s, no_prev)
            cm = np.maximum.accumulate(work[:-1])
            ok = v_s[1:] & (cm != no_prev)
            lag = np.where(ok, cm - ts_s[1:], 0)
            delay[1:] = np.maximum(0, lag)
            late[1:] = lag > _LATE_US
        take = pa.array(order)
        return pa.table(
            {
                "conv_id": _unmask_null_key(g.column("conv_id")),
                "turn_idx": g.column("turn_idx").take(take),
                "ts": g.column("ts").take(take),
                "delay_us": pa.array(delay, pa.int64()),
                "is_late": pa.array(late),
            }
        )

    ds = _mask_null_key(ds, "conv_id")
    return ds.groupby("conv_id").map_groups(per_conv, batch_format="pyarrow")


def turn_late_oracle_sql() -> str:
    from .. import datagen as dg

    return f"""
WITH {dg.TRANSCRIPTS_CTE},
w AS (
  SELECT conv_id, turn_idx, ts,
    max(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
  FROM transcripts_t
)
SELECT conv_id, turn_idx, ts,
  coalesce(greatest(0, date_diff('microsecond', ts, prevmax)), 0)::BIGINT AS delay_us,
  coalesce(date_diff('microsecond', ts, prevmax) > {_LATE_US}, false) AS is_late
FROM w
""".strip()


# --------------------------------------------------------------------------
# Windowed exact dedup (log-throttle): suppress a turn when an IDENTICAL
# text was emitted ANYWHERE in the corpus within the preceding
# DEDUP_WINDOW_S seconds.  The reference's deployments run this class of
# suppression next to the metadata filter (fluentd's dedup/throttle
# filters); at 10^12 turns it is the "collapse repeated log storms"
# operator.  Lag semantics (vs the PREVIOUS occurrence, kept or not) so
# the op has an exact window-function twin.
#
# Shape: one stateless map_batches hashes text → md5 and drops the text
# payload, so only 4 thin columns ride the text_hash sort; the flags come
# from ONE vectorized lag scan per sorted block (the _sorted_by_conv
# physical contract: fixed-boundary range partitioning never splits equal
# hashes across blocks).  Total order within a hash is (ts NULLS LAST,
# w63(conv_id), turn_idx NULLS LAST) — int-only tie keys, replicated in
# the oracle, so ties never diverge.
# --------------------------------------------------------------------------

DEDUP_WINDOW_S = 600
_DW_US = DEDUP_WINDOW_S * 1_000_000
# tie-break hash input for a null conv_id (both sides coalesce before w63)
_TIE_NULL_CONV = "\x01"


def _window_hash_batch(t: pa.Table) -> pa.Table:
    """text → md5 content hash (null text → null, like DuckDB md5(NULL))
    + int64 conv tie-break hash; drops the text payload before the sort.
    One md5 per DISTINCT value per batch (batch_shingles' factorize
    trick): a replicated/bursty stream repeats texts heavily, and convs
    repeat by construction."""
    import pandas as pd

    from ..functions import corpus as cp_

    texts = np.asarray(t.column("text").to_pylist(), dtype=object)
    convs = np.asarray(t.column("conv_id").to_pylist(), dtype=object)
    tcodes, tuniq = pd.factorize(texts, sort=False)  # None → -1
    if len(tuniq):
        hu = np.asarray([cp_.md5_hex(x) for x in tuniq], dtype=object)
        h = pa.array(
            np.where(tcodes >= 0, hu[np.maximum(tcodes, 0)], None), pa.string()
        )
    else:  # every text in the batch is null
        h = pa.nulls(len(texts), pa.string())
    ccodes, cuniq = pd.factorize(convs, sort=False)
    null_ch = cp_.w63(_TIE_NULL_CONV)
    if len(cuniq):
        cu = np.fromiter(
            (cp_.w63(c) for c in cuniq), dtype=np.int64, count=len(cuniq)
        )
        ch_np = np.where(ccodes >= 0, cu[np.maximum(ccodes, 0)], null_ch)
    else:
        ch_np = np.full(len(convs), null_ch)
    ch = pa.array(ch_np.astype(np.int64), pa.int64())
    return pa.table(
        {
            "conv_id": t.column("conv_id"),
            "turn_idx": t.column("turn_idx"),
            "ts": t.column("ts"),
            "text_hash": h,
            "conv_h": ch,
        }
    )


def _window_dedup_sorted_block(t: pa.Table) -> pa.Table:
    """One lag scan over a text_hash-sorted block: consecutive rows of the
    same hash (in (ts, conv_h, turn_idx) order) are the lag pairs — fully
    vectorized, no per-group machinery (cf. _sorted_by_conv's rationale)."""
    from .aggregate import _int_key

    out_types = {
        "conv_id": pa.string(),
        "turn_idx": t.schema.field("turn_idx").type if t.num_columns else pa.int32(),
        "text_hash": pa.string(),
        "ts": t.schema.field("ts").type if t.num_columns else pa.timestamp("us"),
        "gap_us": pa.int64(),
        "is_suppressed": pa.bool_(),
    }
    n = len(t)
    if n == 0:
        return pa.table({k: pa.array([], v) for k, v in out_types.items()})
    th = t.column("text_hash")
    if isinstance(th, pa.ChunkedArray):
        th = th.combine_chunks()
    codes = th.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    ti, _ = _int_key(t.column("turn_idx"))
    ts_f, v = _int_key(t.column("ts"))
    ch = t.column("conv_h").cast(pa.int64()).to_numpy(zero_copy_only=False)
    order = np.lexsort((ti, ch, ts_f, codes))
    c_s, ts_s, v_s = codes[order], ts_f[order], v[order]
    # null-text rows ride the sort under the masked sentinel but never
    # participate in suppression (SQL twin coalesces them to false/0)
    sent = pc.equal(th, _NULL_KEY).to_numpy(zero_copy_only=False)[order]
    gap = np.zeros(n, dtype=np.int64)
    sup = np.zeros(n, dtype=bool)
    if n > 1:
        same = c_s[1:] == c_s[:-1]
        ok = same & v_s[1:] & v_s[:-1] & ~sent[1:]
        d = ts_s[1:] - ts_s[:-1]  # ≥ 0: ts ascends within a hash segment
        gap[1:] = np.where(ok, d, 0)
        sup[1:] = ok & (d <= _DW_US)
    take = pa.array(order)
    out_hash = pc.if_else(
        pc.equal(th, _NULL_KEY), pa.scalar(None, pa.string()), th
    ).take(take)
    return pa.table(
        {
            "conv_id": t.column("conv_id").take(take),
            "turn_idx": t.column("turn_idx").take(take),
            "text_hash": out_hash,
            "ts": t.column("ts").take(take),
            "gap_us": pa.array(gap, pa.int64()),
            "is_suppressed": pa.array(sup),
        }
    )


def turn_dedup_window(ds):
    """Per-turn windowed-dedup flags: ``is_suppressed`` when an identical
    text occurred within the preceding DEDUP_WINDOW_S seconds; ``gap_us``
    = distance to that previous occurrence (0 for firsts/nulls)."""
    need = ["conv_id", "turn_idx", "text", "ts"]
    if set(need) < set(ds.schema().names):
        ds = ds.select_columns(need)
    ds = ds.map_batches(
        _window_hash_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return _mask_null_key(ds, "text_hash").sort("text_hash").map_batches(
        _window_dedup_sorted_block, batch_format="pyarrow", zero_copy_batch=True
    )


def turn_dedup_window_oracle_sql() -> str:
    from .. import datagen as dg
    from ..functions import corpus as cp_

    conv_h = cp_.SQL_W63.format(s="coalesce(conv_id, chr(1))")
    return f"""
WITH {dg.TRANSCRIPTS_CTE},
h AS (
  SELECT conv_id, turn_idx, ts, md5(text) AS text_hash, {conv_h} AS conv_h
  FROM transcripts_t
),
l AS (
  SELECT conv_id, turn_idx, ts, text_hash,
    lag(ts) OVER (PARTITION BY text_hash ORDER BY ts, conv_h, turn_idx) AS prev_ts
  FROM h
)
SELECT conv_id, turn_idx, text_hash, ts,
  (CASE WHEN text_hash IS NOT NULL AND ts IS NOT NULL AND prev_ts IS NOT NULL
        THEN date_diff('microsecond', prev_ts, ts) ELSE 0 END)::BIGINT AS gap_us,
  coalesce(text_hash IS NOT NULL
           AND date_diff('microsecond', prev_ts, ts) <= {_DW_US}, false)
    AS is_suppressed
FROM l
""".strip()


# --------------------------------------------------------------------------
# Data-quality observability: per-day per-field null rates over the turn
# stream — the schema-drift / broken-shipper detector (a collector that
# stops sending `tool`, a parser change that nulls `role`, show up as a
# step in null_frac long before anything downstream crashes).  Combiner
# pushdown: each batch collapses to ≤ days×fields rows; the day key stays
# int64 µs through the groupby (the turn_rates timestamp-normalization
# rule) and becomes timestamp[us] in a final map over the tiny result.
# --------------------------------------------------------------------------

QUALITY_FIELDS = ("role", "text", "tool")
_DAY_US = 86_400_000_000
_FN_SENT_FIELD = " "  # field names never contain a space


def _field_nulls_partial(t: pa.Table) -> pa.Table:
    empty = pa.table(
        {
            "day_us": pa.array([], pa.int64()),
            "field": pa.array([], pa.string()),
            "n_rows": pa.array([], pa.int64()),
            "n_null": pa.array([], pa.int64()),
        }
    )
    if not len(t):
        return empty
    us = t.column("ts").cast(pa.int64())
    # FLOOR division, not truncation: pc.divide truncates toward zero, which
    # disagrees with the oracle's date_trunc('day') for pre-1970 (negative
    # epoch) timestamps by one day.  numpy floor_divide matches date_trunc
    # for any sign; nulls carry through as _NULL_US via the mask.
    us_np = pc.fill_null(us, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    null_mask = pc.is_null(us).to_numpy(zero_copy_only=False)
    day = (us_np // _DAY_US) * _DAY_US
    day[null_mask] = _NULL_US
    uniq, codes = np.unique(day, return_inverse=True)
    out_d, out_f, out_r, out_n = [], [], [], []
    n_rows = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
    for f in QUALITY_FIELDS:
        isnull = pc.is_null(t.column(f)).to_numpy(zero_copy_only=False)
        n_null = np.bincount(
            codes, weights=isnull.astype(np.float64), minlength=len(uniq)
        ).astype(np.int64)
        out_d.append(uniq)
        out_f.extend([f] * len(uniq))
        out_r.append(n_rows)
        out_n.append(n_null)
    return pa.table(
        {
            "day_us": pa.array(np.concatenate(out_d)),
            "field": pa.array(out_f, pa.string()),
            "n_rows": pa.array(np.concatenate(out_r)),
            "n_null": pa.array(np.concatenate(out_n)),
        }
    )


def field_nulls(ds):
    """Per-(day, field) null-rate report: (day_ts, field, n_rows, n_null,
    null_frac) for the role/text/tool columns."""
    import ray.data as rd

    need = ["role", "text", "tool", "ts"]
    if set(need) < set(ds.schema().names):
        ds = ds.select_columns(need)
    agg = (
        ds.map_batches(
            _field_nulls_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .union(rd.from_arrow(pa.table(
            {
                "day_us": pa.array([_NULL_US], pa.int64()),
                "field": pa.array([_FN_SENT_FIELD], pa.string()),
                "n_rows": pa.array([0], pa.int64()),
                "n_null": pa.array([0], pa.int64()),
            }
        )))
        .groupby(["field", "day_us"])
        .aggregate(Sum("n_rows", alias_name="n_rows"), Sum("n_null", alias_name="n_null"))
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("field"), _FN_SENT_FIELD))
        d = t.column("day_us")
        day_ts = pc.if_else(
            pc.equal(d, _NULL_US), pa.scalar(None, pa.int64()), d
        ).cast(pa.timestamp("us"))
        nr = t.column("n_rows").to_numpy(zero_copy_only=False).astype(np.int64)
        nn = t.column("n_null").to_numpy(zero_copy_only=False).astype(np.int64)
        frac = np.where(nr > 0, nn.astype(np.float64) / np.where(nr > 0, nr, 1), 0.0)
        return pa.table(
            {
                "day_ts": day_ts,
                "field": t.column("field"),
                "n_rows": pa.array(nr),
                "n_null": pa.array(nn),
                "null_frac": pa.array(frac),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def field_nulls_oracle_sql() -> str:
    from .. import datagen as dg

    return f"""
WITH {dg.TRANSCRIPTS_CTE},
f AS (SELECT unnest(['role', 'text', 'tool']) AS field),
occ AS (
  SELECT date_trunc('day', ts) AS day_ts, f.field,
    CASE f.field WHEN 'role' THEN (role IS NULL)
                 WHEN 'text' THEN (text IS NULL)
                 ELSE (tool IS NULL) END AS is_null
  FROM transcripts_t CROSS JOIN f
)
SELECT day_ts, field, count(*)::BIGINT AS n_rows,
  sum(CASE WHEN is_null THEN 1 ELSE 0 END)::BIGINT AS n_null,
  CASE WHEN count(*) > 0
       THEN sum(CASE WHEN is_null THEN 1 ELSE 0 END)::DOUBLE
            / count(*)::DOUBLE
       ELSE 0.0 END AS null_frac
FROM occ GROUP BY 1, 2
""".strip()


# --------------------------------------------------------------------------
# Response-latency percentiles: p50/p95/p99 of the inter-turn gap per role
# transition — the serving-ops latency metric (how long does the assistant
# take after a user turn?).  Exact type-1 quantiles with integer
# thresholds ((tot·q + 99) // 100), never a float percentile estimator, so
# the DuckDB twin matches bit-for-bit.  Shape: adjacent pairs collapse to
# (from, to, gap_ms) partial counts inside each sorted block; the
# distribution table (≤ role² × distinct-ms-gaps rows, far below corpus
# size) is the only thing shuffled; the final map_groups runs over ≤ role²
# groups — the one cardinality regime where map_groups' per-group cost is
# irrelevant.
# --------------------------------------------------------------------------

_LAT_SENT_ROLE = "\x00\x00lat-sent"
_LAT_EMPTY = pa.table(
    {
        "from_role": pa.array([], pa.string()),
        "to_role": pa.array([], pa.string()),
        "gap_ms": pa.array([], pa.int64()),
        "c": pa.array([], pa.int64()),
    }
)


def _latency_pairs_block(t: pa.Table) -> pa.Table:
    """(from_role, to_role, gap_ms) partial counts over a conv-sorted
    block — the _transitions_sorted_block ordering (turn_idx, ts, role
    tie-break on duplicates) with the ts gap attached."""
    import pandas as pd

    from ..stages.aggregate import _conv_codes

    n = len(t)
    if n < 2:
        return _LAT_EMPTY
    codes, _ = _conv_codes(t)
    ti = pc.fill_null(t.column("turn_idx").cast(pa.int64()), _KEY_NULL_LAST).to_numpy(
        zero_copy_only=False
    )
    ts_f = pc.fill_null(t.column("ts").cast(pa.int64()), _KEY_NULL_LAST).to_numpy(
        zero_copy_only=False
    )
    v = pc.is_valid(t.column("ts")).to_numpy(zero_copy_only=False)
    role = t.column("role")
    if isinstance(role, pa.ChunkedArray):
        role = role.combine_chunks()
    order = np.lexsort((ts_f, ti, codes))
    c0, t0, s0 = codes[order], ti[order], ts_f[order]
    if bool(((c0[1:] == c0[:-1]) & (t0[1:] == t0[:-1]) & (s0[1:] == s0[:-1])).any()):
        role_key = np.asarray(
            pc.fill_null(role, _NULL_LAST_KEY).to_pylist(), dtype=object
        )
        order = np.lexsort((role_key, ts_f, ti, codes))
    c_s, ts_s, v_s = codes[order], ts_f[order], v[order]
    ok = (c_s[1:] == c_s[:-1]) & v_s[1:] & v_s[:-1]
    if not ok.any():
        return _LAT_EMPTY
    gap_ms = np.floor((ts_s[1:] - ts_s[:-1]) / 1000.0).astype(np.int64)
    roles_s = pc.fill_null(role.take(pa.array(order)), _NULL_KEY)
    rcodes = roles_s.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    g = (
        pd.DataFrame(
            {
                "f": rcodes[:-1][ok],
                "t": rcodes[1:][ok],
                "gap_ms": gap_ms[ok],
            }
        )
        .groupby(["f", "t", "gap_ms"], sort=False).size().rename("c").reset_index()
    )
    rvals = roles_s.dictionary_encode().dictionary
    return pa.table(
        {
            "from_role": rvals.take(pa.array(g["f"].to_numpy())),
            "to_role": rvals.take(pa.array(g["t"].to_numpy())),
            "gap_ms": pa.array(g["gap_ms"].to_numpy(dtype=np.int64)),
            "c": pa.array(g["c"].to_numpy(dtype=np.int64)),
        }
    )


def _pctl_from_distribution(gap: np.ndarray, c: np.ndarray):
    """(p50, p95, p99, total) from a (gap_ms, count) distribution — the
    cumulative-count threshold ladder both latency ops and their SQL twins
    use: threshold = (tot*q + 99) // 100, value = first gap whose
    cumulative count reaches it.  Shared so the trickiest twin math exists
    once."""
    o = np.argsort(gap, kind="stable")
    gap, c = gap[o], c[o]
    cm = np.cumsum(c)
    tot = int(cm[-1])
    if tot == 0:
        return None
    ps = [int(gap[np.searchsorted(cm, (tot * q + 99) // 100)])
          for q in (50, 95, 99)]
    return ps[0], ps[1], ps[2], tot


def response_latency(ds):
    """Per-(from_role, to_role) inter-turn latency percentiles:
    (from_role, to_role, n_pairs, p50_ms, p95_ms, p99_ms)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .aggregate import _sorted_by_conv

    dist = (
        _sorted_by_conv(ds, ["conv_id", "turn_idx", "role", "ts"]).map_batches(
            _latency_pairs_block, batch_format="pyarrow", zero_copy_batch=True
        )
        .union(rd.from_arrow(pa.table(
            {
                "from_role": pa.array([_LAT_SENT_ROLE], pa.string()),
                "to_role": pa.array([_LAT_SENT_ROLE], pa.string()),
                "gap_ms": pa.array([0], pa.int64()),
                "c": pa.array([0], pa.int64()),
            }
        )))
        .groupby(["from_role", "to_role", "gap_ms"])
        .aggregate(Sum("c", alias_name="c"))
    )

    def pctl(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "from_role": pa.array([], pa.string()),
                "to_role": pa.array([], pa.string()),
                "n_pairs": pa.array([], pa.int64()),
                "p50_ms": pa.array([], pa.int64()),
                "p95_ms": pa.array([], pa.int64()),
                "p99_ms": pa.array([], pa.int64()),
            }
        )
        if not len(g) or g.column("from_role")[0].as_py() == _LAT_SENT_ROLE:
            return empty
        r = _pctl_from_distribution(
            g.column("gap_ms").to_numpy(zero_copy_only=False),
            g.column("c").to_numpy(zero_copy_only=False).astype(np.int64),
        )
        if r is None:
            return empty
        p50, p95, p99, tot = r
        ps = [p50, p95, p99]
        # rebuild the key scalars (kernels over the zero-copy group SLICE
        # hit pyarrow's sliced-offsets bug — see _unmask_null_key)
        fr = g.column("from_role")[0].as_py()
        to = g.column("to_role")[0].as_py()
        return pa.table(
            {
                "from_role": pa.array(
                    [None if fr == _NULL_KEY else fr], pa.string()
                ),
                "to_role": pa.array(
                    [None if to == _NULL_KEY else to], pa.string()
                ),
                "n_pairs": pa.array([tot], pa.int64()),
                "p50_ms": pa.array([ps[0]], pa.int64()),
                "p95_ms": pa.array([ps[1]], pa.int64()),
                "p99_ms": pa.array([ps[2]], pa.int64()),
            }
        )

    return dist.groupby(["from_role", "to_role"]).map_groups(
        pctl, batch_format="pyarrow"
    )


def response_latency_oracle_sql() -> str:
    from .. import datagen as dg

    def thr(q: int) -> str:
        return f"(tot * {q} + 99) // 100"

    return f"""
WITH {dg.TRANSCRIPTS_CTE},
w AS (
  SELECT role AS from_role,
    lead(role) OVER win AS to_role,
    ts AS from_ts, lead(ts) OVER win AS to_ts,
    row_number() OVER win AS rn, count(*) OVER (PARTITION BY conv_id) AS nc
  FROM transcripts_t
  WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx, ts, role)
),
g AS (
  SELECT from_role, to_role,
    CAST(floor((epoch_us(to_ts) - epoch_us(from_ts)) / 1000.0) AS BIGINT) AS gap_ms
  FROM w WHERE rn < nc AND from_ts IS NOT NULL AND to_ts IS NOT NULL
),
d AS (
  SELECT from_role, to_role, gap_ms, count(*)::BIGINT AS c FROM g GROUP BY 1, 2, 3
),
cum AS (
  SELECT from_role, to_role, gap_ms,
    sum(c) OVER (PARTITION BY from_role, to_role ORDER BY gap_ms)::BIGINT AS cm,
    sum(c) OVER (PARTITION BY from_role, to_role)::BIGINT AS tot
  FROM d
)
SELECT from_role, to_role,
  any_value(tot) AS n_pairs,
  min(CASE WHEN cm >= {thr(50)} THEN gap_ms END) AS p50_ms,
  min(CASE WHEN cm >= {thr(95)} THEN gap_ms END) AS p95_ms,
  min(CASE WHEN cm >= {thr(99)} THEN gap_ms END) AS p99_ms
FROM cum GROUP BY 1, 2
""".strip()


# --------------------------------------------------------------------------
# Tool-usage stats: turns and exact distinct conversations per (role,
# tool) — the agent-ops usage report (which tools does each role call,
# and how widely across sessions?).  The counted-triple shape
# (log_templates): per-batch (role, tool, conv) partial counts → one
# vocab-level groupby → per-(role, tool) Sum/Sum, with count(DISTINCT
# conv_id) falling out of a validity flag (SQL distinct skips NULLs).
# --------------------------------------------------------------------------

_TOOL_SENT = "\x00\x00tool-sent"


def _tool_triple_partial(t: pa.Table) -> pa.Table:
    import pandas as pd

    from .aggregate import _NULL_KEY

    role = pd.Series(t.column("role").to_pandas()).fillna(_NULL_KEY)
    tool = pd.Series(t.column("tool").to_pandas()).fillna(_NULL_KEY)
    conv = pd.Series(t.column("conv_id").to_pandas()).fillna(_NULL_KEY)
    g = (
        pd.DataFrame({"role": role, "tool": tool, "conv_id": conv})
        .groupby(["role", "tool", "conv_id"], sort=False).size()
        .rename("n").reset_index()
    )
    return pa.table(
        {
            "role": pa.array(g["role"].to_numpy(dtype=object), pa.string()),
            "tool": pa.array(g["tool"].to_numpy(dtype=object), pa.string()),
            "conv_id": pa.array(g["conv_id"].to_numpy(dtype=object), pa.string()),
            "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
        }
    )


def tool_stats(ds):
    """(role, tool, n_turns, n_convs) with n_convs = exact
    count(DISTINCT conv_id), null convs excluded like SQL."""
    import ray.data as rd

    from .aggregate import _NULL_KEY, _unmask_col

    need = ["conv_id", "role", "tool"]
    if set(need) < set(ds.schema().names):
        ds = ds.select_columns(need)
    triples = (
        ds.map_batches(
            _tool_triple_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .union(rd.from_arrow(pa.table(
            {
                "role": pa.array([_TOOL_SENT], pa.string()),
                "tool": pa.array([_TOOL_SENT], pa.string()),
                "conv_id": pa.array([_TOOL_SENT], pa.string()),
                "n": pa.array([0], pa.int64()),
            }
        )))
        .groupby(["role", "tool", "conv_id"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def flag(t: pa.Table) -> pa.Table:
        real = pc.cast(
            pc.not_equal(t.column("conv_id"), _NULL_KEY), pa.int64()
        )
        return pa.table(
            {
                "role": t.column("role"),
                "tool": t.column("tool"),
                "n": t.column("n"),
                "is_conv": real,
            }
        )

    agg = (
        triples.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["role", "tool"])
        .aggregate(Sum("n", alias_name="n_turns"), Sum("is_conv", alias_name="n_convs"))
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("role"), _TOOL_SENT))
        return pa.table(
            {
                "role": _unmask_col(t.column("role")),
                "tool": _unmask_col(t.column("tool")),
                "n_turns": t.column("n_turns").cast(pa.int64()),
                "n_convs": t.column("n_convs").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def tool_stats_oracle_sql() -> str:
    from .. import datagen as dg

    return f"""
WITH {dg.TRANSCRIPTS_CTE}
SELECT role, tool, count(*)::BIGINT AS n_turns,
  count(DISTINCT conv_id)::BIGINT AS n_convs
FROM transcripts_t GROUP BY role, tool
""".strip()


# --------------------------------------------------------------------------
# Turn novelty (agent-loop detector): per turn, what fraction of its word
# 3-grams already appeared in an EARLIER turn of the same conversation?
# A looping agent (retrying the same tool call, re-printing the same
# plan) shows up as repeat_frac → 1 long before a human reads the
# transcript.  Fully vectorized: per sorted block, (conv, shingle) pairs
# get a first-occurrence turn ordinal via sort + reduceat-min; each
# occurrence then compares its own ordinal against the group minimum —
# no per-turn Python sets.  Twin: min(ord) OVER (PARTITION BY conv, h).
# --------------------------------------------------------------------------


def _novelty_sorted_block(t: pa.Table) -> pa.Table:
    import pandas as pd

    from ..functions import corpus as cp
    from .aggregate import _conv_codes, _unmask_col

    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "n_shingles": pa.array([], pa.int64()),
            "n_repeated": pa.array([], pa.int64()),
            "repeat_frac": pa.array([], pa.float64()),
        }
    )
    n = len(t)
    if n == 0:
        return empty
    codes, conv = _conv_codes(t)
    ti = pc.fill_null(t.column("turn_idx").cast(pa.int64()), _KEY_NULL_LAST).to_numpy(
        zero_copy_only=False
    )
    ts_f = pc.fill_null(t.column("ts").cast(pa.int64()), _KEY_NULL_LAST).to_numpy(
        zero_copy_only=False
    )
    # deterministic total order incl. fully-duplicated rows: md5(text) as
    # the final tie key (both twins order by it)
    texts = t.column("text").to_pylist()
    th = np.asarray(
        ["" if x is None else cp.md5_hex(x) for x in texts], dtype=object
    )
    order = np.lexsort((th, ts_f, ti, codes))
    ordinal = np.empty(n, dtype=np.int64)
    ordinal[order] = np.arange(n)  # block-wide; conv-locality not needed

    # shingles per ROW (original block positions)
    s = pd.Series(texts)
    ex = s.str.split().explode()
    grp = ex.groupby(level=0)
    sh = (ex + " " + grp.shift(-1) + " " + grp.shift(-2)).dropna()
    n_shingles = np.zeros(n, dtype=np.int64)
    n_repeated = np.zeros(n, dtype=np.int64)
    if len(sh):
        rows = sh.index.to_numpy(dtype=np.int64)
        scodes, _ = pd.factorize(sh.to_numpy(), sort=False)
        # group key: (conv, shingle); first-occurrence ordinal per group
        key = codes[rows].astype(np.int64) * (scodes.max() + 1) + scodes
        occ_ord = ordinal[rows]
        o = np.lexsort((occ_ord, key))
        k_s, ord_s, rows_s = key[o], occ_ord[o], rows[o]
        starts = np.r_[0, np.flatnonzero(k_s[1:] != k_s[:-1]) + 1]
        firsts = np.minimum.reduceat(ord_s, starts)
        seg = np.cumsum(np.r_[True, k_s[1:] != k_s[:-1]]) - 1
        repeated = ord_s > firsts[seg]
        np.add.at(n_shingles, rows_s, 1)
        np.add.at(n_repeated, rows_s, repeated.astype(np.int64))
    frac = np.where(
        n_shingles > 0,
        n_repeated.astype(np.float64) / np.where(n_shingles > 0, n_shingles, 1),
        0.0,
    )
    return pa.table(
        {
            "conv_id": _unmask_col(t.column("conv_id")),
            "turn_idx": t.column("turn_idx"),
            "n_shingles": pa.array(n_shingles),
            "n_repeated": pa.array(n_repeated),
            "repeat_frac": pa.array(frac),
        }
    )


def turn_novelty(ds):
    """Per-turn within-conversation repetition: (conv_id, turn_idx,
    n_shingles, n_repeated, repeat_frac) over word 3-grams, where a
    shingle occurrence counts as repeated when an earlier turn (order:
    turn_idx, ts, md5(text)) of the SAME conversation contains it."""
    from .aggregate import _sorted_by_conv

    return _sorted_by_conv(ds, ["conv_id", "turn_idx", "text", "ts"]).map_batches(
        _novelty_sorted_block, batch_format="pyarrow", zero_copy_batch=True
    )


def turn_novelty_oracle_sql() -> str:
    from .. import datagen as dg
    from ..functions import corpus as cp_

    toks = cp_.SQL_TOKS.format(t="text")
    return f"""
WITH {dg.TRANSCRIPTS_CTE},
o AS (
  SELECT conv_id, turn_idx, text,
    row_number() OVER (ORDER BY conv_id, turn_idx, ts, md5(text)) AS ord,
    {toks} AS toks
  FROM transcripts_t
),
sh AS (
  SELECT conv_id, turn_idx, ord,
    unnest(list_transform(generate_series(1, len(toks) - 2),
           i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS s
  FROM o
),
f AS (
  SELECT conv_id, turn_idx, ord,
    min(ord) OVER (PARTITION BY conv_id, s) AS first_ord
  FROM sh
),
per AS (
  SELECT conv_id, ord, count(*)::BIGINT AS n_shingles,
    sum(CASE WHEN ord > first_ord THEN 1 ELSE 0 END)::BIGINT AS n_repeated
  FROM f GROUP BY conv_id, ord
)
SELECT o.conv_id, o.turn_idx,
  coalesce(p.n_shingles, 0) AS n_shingles,
  coalesce(p.n_repeated, 0) AS n_repeated,
  CASE WHEN coalesce(p.n_shingles, 0) > 0
       THEN p.n_repeated::DOUBLE / p.n_shingles ELSE 0.0 END AS repeat_frac
FROM o LEFT JOIN per p ON p.conv_id IS NOT DISTINCT FROM o.conv_id
                      AND p.ord = o.ord
""".strip()


# --------------------------------------------------------------------------
# Per-role PII density over TRANSCRIPTS (the conversational twin of the
# document-level q_pii_density): which ROLE leaks which PII class — user
# turns pasting emails vs tool outputs echoing bearer tokens are different
# governance problems.  Same RE2 patterns as the redaction stage, so the
# report and the scrubber can never disagree.  Pure combiner: each batch
# collapses to <= roles x patterns rows.
# --------------------------------------------------------------------------

_TPII_SENT = "\x00\x00tpii-sent"


def _turn_pii_partial(batch: pa.Table) -> pa.Table:
    import pandas as pd

    from .redact import REDACT_PATTERNS

    role = pd.Series(batch.column("role").to_pandas()).fillna(_NULL_KEY)
    codes, uniq = pd.factorize(role.to_numpy(dtype=object), sort=False)
    text = batch.column("text")
    out_r, out_p, out_h, out_t = [], [], [], []
    for name, pat, _ in REDACT_PATTERNS:
        n = pc.fill_null(
            pc.count_substring_regex(text, pat), 0
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        out_r.append(uniq)
        out_p.extend([name] * len(uniq))
        out_h.append(np.bincount(codes, weights=n.astype(np.float64),
                                 minlength=len(uniq)).astype(np.int64))
        out_t.append(np.bincount(codes, weights=(n > 0).astype(np.float64),
                                 minlength=len(uniq)).astype(np.int64))
    if not out_r:
        return pa.table(
            {
                "role": pa.array([], pa.string()),
                "pattern": pa.array([], pa.string()),
                "n_hits": pa.array([], pa.int64()),
                "n_turns_affected": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "role": pa.array(np.concatenate(out_r).astype(object), pa.string()),
            "pattern": pa.array(out_p, pa.string()),
            "n_hits": pa.array(np.concatenate(out_h)),
            "n_turns_affected": pa.array(np.concatenate(out_t)),
        }
    )


def turn_pii_density(ds):
    """Per-(role, pattern) PII report over transcripts:
    (role, pattern, n_hits, n_turns_affected)."""
    import ray.data as rd

    agg = (
        ds.map_batches(
            _turn_pii_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .union(rd.from_arrow(pa.table(
            {
                "role": pa.array([_TPII_SENT], pa.string()),
                "pattern": pa.array([_TPII_SENT], pa.string()),
                "n_hits": pa.array([0], pa.int64()),
                "n_turns_affected": pa.array([0], pa.int64()),
            }
        )))
        .groupby(["role", "pattern"])
        .aggregate(
            Sum("n_hits", alias_name="n_hits"),
            Sum("n_turns_affected", alias_name="n_turns_affected"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        from .aggregate import _unmask_col

        t = t.filter(pc.not_equal(t.column("role"), _TPII_SENT))
        return pa.table(
            {
                "role": _unmask_col(t.column("role")),
                "pattern": t.column("pattern"),
                "n_hits": t.column("n_hits").cast(pa.int64()),
                "n_turns_affected": t.column("n_turns_affected").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def turn_pii_density_oracle_sql() -> str:
    from .. import datagen as dg
    from .redact import REDACT_PATTERNS

    def _q(s: str) -> str:
        return s.replace("'", "''")

    vals = ", ".join(
        f"('{_q(name)}', '{_q(pat)}')" for name, pat, _ in REDACT_PATTERNS
    )
    return f"""
WITH {dg.TRANSCRIPTS_CTE},
p AS (SELECT * FROM (VALUES {vals}) AS v(pattern, rx)),
h AS (
  SELECT t.role, p.pattern,
    coalesce(len(regexp_extract_all(t.text, p.rx)), 0)::BIGINT AS n
  FROM transcripts_t t CROSS JOIN p
)
SELECT role, pattern, sum(n)::BIGINT AS n_hits,
  sum(CASE WHEN n > 0 THEN 1 ELSE 0 END)::BIGINT AS n_turns_affected
FROM h GROUP BY 1, 2
""".strip()


# --------------------------------------------------------------------------
# Tool-chain mining: tool → next-tool transitions per conversation — the
# agent-ops workflow graph (which tool follows which; a hot self-loop edge
# is the retry-storm signature q_turn_novelty flags from the text side).
# Same sorted-block bigram kernel as role_transitions, parameterized on
# the tool column.
# --------------------------------------------------------------------------

_tool_transitions_block = _make_transitions_block("tool", "from_tool", "to_tool")


def tool_transitions(ds):
    """Count tool → next-tool transitions across consecutive turns of each
    conversation (ordered by turn_idx, ties by ts then tool), aggregated
    corpus-wide.  Ray shape: sort by conv_id → vectorized per-block bigram
    partials (≤ tools² rows per block) → shared sentinel-threaded tail."""
    from .aggregate import _sorted_by_conv

    partials = _sorted_by_conv(
        ds, ["conv_id", "turn_idx", "tool", "ts"]
    ).map_batches(_tool_transitions_block, batch_format="pyarrow",
                  zero_copy_batch=True)
    return _transitions_tail(partials, "from_tool", "to_tool")


def tool_transitions_oracle_sql() -> str:
    from .. import datagen as dg

    return f"""
WITH {dg.TRANSCRIPTS_CTE},
w AS (
  SELECT tool AS from_tool,
    lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts, tool) AS to_tool,
    row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx, ts, tool) AS rn,
    count(*) OVER (PARTITION BY conv_id) AS nc
  FROM transcripts_t
)
SELECT from_tool, to_tool, count(*)::BIGINT AS n_pairs
FROM w WHERE rn < nc GROUP BY from_tool, to_tool
""".strip()


# --------------------------------------------------------------------------
# Per-tool downstream latency: after a turn that used tool X, how long
# until the conversation's next turn — the "which tool is slow" profile
# (the single-key sibling of response_latency's role-pair percentiles).
# --------------------------------------------------------------------------

_TLAT_SENT = "\x00\x00tlat-sent"

_TLAT_EMPTY = pa.table(
    {
        "tool": pa.array([], pa.string()),
        "gap_ms": pa.array([], pa.int64()),
        "c": pa.array([], pa.int64()),
    }
)


def _tool_latency_block(t: pa.Table) -> pa.Table:
    """(tool, gap_ms) partial counts over a conv-sorted block — the
    transitions ordering (turn_idx, ts, tool tie-break on duplicates) with
    the ts gap attached to the FROM turn's tool."""
    import pandas as pd

    from ..stages.aggregate import _conv_codes

    n = len(t)
    if n < 2:
        return _TLAT_EMPTY
    codes, _ = _conv_codes(t)
    ti = pc.fill_null(t.column("turn_idx").cast(pa.int64()), _KEY_NULL_LAST).to_numpy(
        zero_copy_only=False
    )
    ts_f = pc.fill_null(t.column("ts").cast(pa.int64()), _KEY_NULL_LAST).to_numpy(
        zero_copy_only=False
    )
    v = pc.is_valid(t.column("ts")).to_numpy(zero_copy_only=False)
    tool = t.column("tool")
    if isinstance(tool, pa.ChunkedArray):
        tool = tool.combine_chunks()
    order = np.lexsort((ts_f, ti, codes))
    c0, t0, s0 = codes[order], ti[order], ts_f[order]
    if bool(((c0[1:] == c0[:-1]) & (t0[1:] == t0[:-1]) & (s0[1:] == s0[:-1])).any()):
        tool_key = np.asarray(
            pc.fill_null(tool, _NULL_LAST_KEY).to_pylist(), dtype=object
        )
        order = np.lexsort((tool_key, ts_f, ti, codes))
    c_s, ts_s, v_s = codes[order], ts_f[order], v[order]
    ok = (c_s[1:] == c_s[:-1]) & v_s[1:] & v_s[:-1]
    if not ok.any():
        return _TLAT_EMPTY
    gap_ms = np.floor((ts_s[1:] - ts_s[:-1]) / 1000.0).astype(np.int64)
    tools_s = pc.fill_null(tool.take(pa.array(order)), _NULL_KEY)
    tenc = tools_s.dictionary_encode()
    tcodes = tenc.indices.to_numpy(zero_copy_only=False)
    g = (
        pd.DataFrame({"f": tcodes[:-1][ok], "gap_ms": gap_ms[ok]})
        .groupby(["f", "gap_ms"], sort=False).size().rename("c").reset_index()
    )
    return pa.table(
        {
            "tool": tenc.dictionary.take(pa.array(g["f"].to_numpy())),
            "gap_ms": pa.array(g["gap_ms"].to_numpy(dtype=np.int64)),
            "c": pa.array(g["c"].to_numpy(dtype=np.int64)),
        }
    )


def tool_latency(ds):
    """Per-tool downstream latency percentiles:
    (tool, n_pairs, p50_ms, p95_ms, p99_ms)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .aggregate import _sorted_by_conv, _unmask_col

    dist = (
        _sorted_by_conv(ds, ["conv_id", "turn_idx", "tool", "ts"]).map_batches(
            _tool_latency_block, batch_format="pyarrow", zero_copy_batch=True
        )
        .union(rd.from_arrow(pa.table(
            {
                "tool": pa.array([_TLAT_SENT], pa.string()),
                "gap_ms": pa.array([0], pa.int64()),
                "c": pa.array([0], pa.int64()),
            }
        )))
        .groupby(["tool", "gap_ms"])
        .aggregate(Sum("c", alias_name="c"))
    )

    def pctl(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tool": pa.array([], pa.string()),
                "n_pairs": pa.array([], pa.int64()),
                "p50_ms": pa.array([], pa.int64()),
                "p95_ms": pa.array([], pa.int64()),
                "p99_ms": pa.array([], pa.int64()),
            }
        )
        if not len(g) or g.column("tool")[0].as_py() == _TLAT_SENT:
            return empty
        r = _pctl_from_distribution(
            g.column("gap_ms").to_numpy(zero_copy_only=False),
            g.column("c").to_numpy(zero_copy_only=False).astype(np.int64),
        )
        if r is None:
            return empty
        ps = list(r[:3])
        key = pa.array([g.column("tool")[0].as_py()], pa.string())
        return pa.table(
            {
                "tool": _unmask_col(key),
                "n_pairs": pa.array([tot], pa.int64()),
                "p50_ms": pa.array([ps[0]], pa.int64()),
                "p95_ms": pa.array([ps[1]], pa.int64()),
                "p99_ms": pa.array([ps[2]], pa.int64()),
            }
        )

    return dist.groupby("tool").map_groups(pctl, batch_format="pyarrow")


def tool_latency_oracle_sql() -> str:
    from .. import datagen as dg

    def thr(q: int) -> str:
        return f"(tot * {q} + 99) // 100"

    return f"""
WITH {dg.TRANSCRIPTS_CTE},
w AS (
  SELECT tool,
    ts AS from_ts, lead(ts) OVER win AS to_ts,
    row_number() OVER win AS rn, count(*) OVER (PARTITION BY conv_id) AS nc
  FROM transcripts_t
  WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx, ts, tool)
),
g AS (
  SELECT tool,
    CAST(floor((epoch_us(to_ts) - epoch_us(from_ts)) / 1000.0) AS BIGINT) AS gap_ms
  FROM w WHERE rn < nc AND from_ts IS NOT NULL AND to_ts IS NOT NULL
),
d AS (SELECT tool, gap_ms, count(*)::BIGINT AS c FROM g GROUP BY 1, 2),
cum AS (
  SELECT tool, gap_ms,
    sum(c) OVER (PARTITION BY tool ORDER BY gap_ms)::BIGINT AS cm,
    sum(c) OVER (PARTITION BY tool)::BIGINT AS tot
  FROM d
)
SELECT tool,
  any_value(tot) AS n_pairs,
  min(CASE WHEN cm >= {thr(50)} THEN gap_ms END) AS p50_ms,
  min(CASE WHEN cm >= {thr(95)} THEN gap_ms END) AS p95_ms,
  min(CASE WHEN cm >= {thr(99)} THEN gap_ms END) AS p99_ms
FROM cum GROUP BY 1
""".strip()


# --------------------------------------------------------------------------
# Per-conversation BPE token budget: n_turns, whitespace words, greedy-BPE
# subword total, and a fits-context flag — the "will this conversation fit
# the training context window" report, run before packing transcripts into
# sequences.  Token budgets are BPE tokens, not whitespace splits (the T74
# rationale), so this reuses the same merge ladder.
# --------------------------------------------------------------------------

CTX_BUDGET_TOKENS = 4096


def _conv_bpe_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (conv_id, n_turns, n_words, n_bpe_tokens) partial sums —
    the BPE ladder runs once per DISTINCT word per batch."""
    import pandas as pd

    from ..functions.textstats import bpe_row_counts

    conv = pd.Series(batch.column("conv_id").to_pandas()).fillna(_NULL_KEY)
    ccodes, cuniq = pd.factorize(conv.to_numpy(dtype=object), sort=False)
    n_words, n_bpe = bpe_row_counts(
        pd.Series(batch.column("text").to_pandas())
    )
    return pa.table(
        {
            "conv_id": pa.array(cuniq.astype(object), pa.string()),
            "n_turns": pa.array(
                np.bincount(ccodes, minlength=len(cuniq)).astype(np.int64)),
            "n_words": pa.array(
                np.bincount(ccodes, weights=n_words.astype(np.float64),
                            minlength=len(cuniq)).astype(np.int64)),
            "n_bpe_tokens": pa.array(
                np.bincount(ccodes, weights=n_bpe.astype(np.float64),
                            minlength=len(cuniq)).astype(np.int64)),
        }
    )


def conv_token_budget(ds):
    """Per-conversation token budget:
    (conv_id, n_turns, n_words, n_bpe_tokens, fits_ctx)."""
    from .aggregate import _unmask_col

    agg = (
        ds.select_columns(["conv_id", "text"])
        .map_batches(_conv_bpe_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("conv_id")
        .aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Sum("n_words", alias_name="n_words"),
            Sum("n_bpe_tokens", alias_name="n_bpe_tokens"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        nb = t.column("n_bpe_tokens").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "conv_id": _unmask_col(t.column("conv_id")),
                "n_turns": t.column("n_turns").cast(pa.int64()),
                "n_words": t.column("n_words").cast(pa.int64()),
                "n_bpe_tokens": t.column("n_bpe_tokens").cast(pa.int64()),
                "fits_ctx": pa.array(nb <= CTX_BUDGET_TOKENS),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def conv_token_budget_oracle_sql() -> str:
    from .. import datagen as dg
    from ..functions import corpus as cp_
    from ..functions.textstats import bpe_sql_ladder

    ladder = bpe_sql_ladder()
    toks = cp_.SQL_TOKS.format(t="text")
    return f"""
WITH {dg.TRANSCRIPTS_CTE},
tok AS (SELECT conv_id, unnest({toks}) AS w FROM transcripts_t),
sp AS (
  SELECT conv_id, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS s FROM tok
),
per AS (
  SELECT conv_id, count(*)::BIGINT AS n_words,
    sum(len({ladder}) - len(replace({ladder}, ' ', '')) + 1)::BIGINT
      AS n_bpe_tokens
  FROM sp GROUP BY conv_id
),
base AS (SELECT conv_id, count(*)::BIGINT AS n_turns
         FROM transcripts_t GROUP BY conv_id)
SELECT b.conv_id, b.n_turns,
  coalesce(p.n_words, 0)::BIGINT AS n_words,
  coalesce(p.n_bpe_tokens, 0)::BIGINT AS n_bpe_tokens,
  coalesce(p.n_bpe_tokens, 0) <= {CTX_BUDGET_TOKENS} AS fits_ctx
FROM base b LEFT JOIN per p ON p.conv_id IS NOT DISTINCT FROM b.conv_id
""".strip()
