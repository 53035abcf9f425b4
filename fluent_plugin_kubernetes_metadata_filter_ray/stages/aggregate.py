"""Aggregations (SURVEY.md §2.5): per-sink turn counts and stats merges.

Scale pattern: never feed raw event rows into ``groupby`` — pre-aggregate
inside ``map_batches`` (one row per key per batch; pyarrow ``group_by`` per
batch), then shuffle only the tiny partials.  With B batches and K distinct
keys the exchange moves O(B·K) rows instead of O(rows).  Key skew (hot
``conv_id``/``role``) therefore can't create a hot reducer: partials are
already collapsed before the shuffle — this is the "salted repartition"
requirement from BASELINE.json north_rule, done one better (combiner
pushdown; the salt is implicitly the batch id).
"""

from __future__ import annotations

import pyarrow as pa

from ray.data.aggregate import Sum


def per_key_counts(ds, keys: list[str], count_col: str = "n_turns"):
    """Distributed count(*) by key with per-batch combining."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([([], "count_all")])
        cols = {k: g.column(k) for k in keys}
        cols[count_col] = g.column("count_all").cast(pa.int64())
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(keys).aggregate(Sum(count_col, alias_name=count_col))


def route_counts(enriched_ds):
    """Per-sink (role) turn counts + enrichment-class tallies — the
    pipeline's headline aggregate (BASELINE.json: 'matching per-sink
    aggregate counts')."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        from .enrich import decode_dictionary_columns

        t = decode_dictionary_columns(
            t.select([c for c in ("role", "k8s_namespace_name", "k8s_namespace_id",
                                  "k8s_pod_id", "k8s_pod_ip") if c in t.column_names])
        )
        ns = t.column("k8s_namespace_name")
        nsid = t.column("k8s_namespace_id")
        podid = t.column("k8s_pod_id")
        flags = {
            "n_turns": pa.array([1] * len(t), pa.int64()),
            "n_matched": pc.cast(pc.is_valid(ns), pa.int64()),
            "n_orphaned": pc.cast(
                pc.coalesce(pc.equal(nsid, "orphaned"), pa.scalar(False)), pa.int64()
            ),
            "n_full": pc.cast(
                pc.and_(pc.is_valid(podid), pc.is_valid(t.column("k8s_pod_ip"))), pa.int64()
            ),
        }
        tt = pa.table({"role": t.column("role"), **flags})
        g = tt.group_by(["role"]).aggregate([(c, "sum") for c in flags])
        return g.rename_columns(["role"] + list(flags)) if g.column_names[0] == "role" else pa.table(
            {"role": g.column("role"), **{c: g.column(f"{c}_sum") for c in flags}}
        )

    partials = enriched_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # coalesce the tiny partials (≤4 rows per input block) before the
    # groupby: with only 4 distinct roles, a wide aggregate leaves most of
    # its sort partitions EMPTY, and every empty partition surfaces as a
    # schema-less RefBundle (warning + wasted task).  One partition is
    # right-sized for a 4-row result at any input scale — the per-block
    # partial map has already collapsed the data.
    return partials.repartition(1).groupby("role").aggregate(
        Sum("n_turns", alias_name="n_turns"),
        Sum("n_matched", alias_name="n_matched"),
        Sum("n_orphaned", alias_name="n_orphaned"),
        Sum("n_full", alias_name="n_full"),
    )


def conv_stats(ds):
    """Per-conversation stats keyed by the (potentially hot) ``conv_id``.

    Skew pattern: a conversation with 10^6 turns would melt a naive
    ``groupby('conv_id')`` reducer.  The per-batch pyarrow ``group_by``
    collapses every batch to ≤1 row per conv_id BEFORE the shuffle (the
    combiner is the salt — each batch acts as one salt bucket), so the
    exchange carries O(batches × distinct-convs-per-batch) short rows and
    the final reduce per key merges ≤#batches partials."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["conv_id"]).aggregate([([], "count_all"), ("turn_idx", "max")])
        return pa.table(
            {
                "conv_id": g.column("conv_id"),
                "n_turns": g.column("count_all").cast(pa.int64()),
                "max_turn_idx": g.column("turn_idx_max").cast(pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    from ray.data.aggregate import Max

    return partials.groupby("conv_id").aggregate(
        Sum("n_turns", alias_name="n_turns"),
        Max("max_turn_idx", alias_name="max_turn_idx"),
    )


def conv_stats_oracle_sql() -> str:
    from .. import datagen as dg
    return f"""
WITH {dg.TRANSCRIPTS_CTE}
SELECT conv_id, count(*)::BIGINT AS n_turns, max(turn_idx)::BIGINT AS max_turn_idx
FROM transcripts_t GROUP BY conv_id
""".strip()


SESSION_GAP_S = 21600  # 6h inter-turn gap ⇒ new session


# Ray's map_groups SORTS the group keys, and a null key breaks the numpy
# object-dtype comparator (None < str TypeError).  SQL PARTITION BY puts
# all NULL keys in one group — mirror that by masking nulls to a sentinel
# before the groupby and unmasking in the kernel's output.
_NULL_KEY = "\x00\x00null-key"

# Null int64 sort keys (ts, turn_idx): ``cast(int64).to_numpy`` would yield
# float NaN, which poisons diffs/cummax into INT64_MIN (ADVICE r3).  Fill
# with a beyond-any-epoch sentinel instead — numerically NULLS LAST, the
# DuckDB ORDER BY default the oracles rely on — and carry the validity mask
# separately where the kernel's arithmetic must skip nulls.
_KEY_NULL_LAST = 2**62


def _int_key(col, sentinel: int = _KEY_NULL_LAST):
    """Nullable int-ish column → (int64 ndarray with nulls = sentinel,
    bool validity ndarray)."""
    import pyarrow.compute as pc

    c = col.cast(pa.int64())
    v = pc.is_valid(c).to_numpy(zero_copy_only=False)
    return pc.fill_null(c, sentinel).to_numpy(zero_copy_only=False), v


def _mask_null_key(ds, col: str):
    import pyarrow.compute as pc

    def fill(t: pa.Table) -> pa.Table:
        c = t.column(col)
        if c.null_count:
            t = t.set_column(
                t.column_names.index(col), col, pc.fill_null(c, _NULL_KEY)
            )
        return t

    return ds.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)


def _unmask_null_key(col):
    """Group-key column → output column with the sentinel restored to null.
    All rows in a map_groups block share one key, so rebuild from the
    scalar (compute kernels over the zero-copy group SLICE hit a pyarrow
    sliced-offsets bug: 'First or last binary offset out of bounds')."""
    key = col[0].as_py() if len(col) else None
    if key == _NULL_KEY:
        return pa.nulls(len(col), pa.string())
    return col  # untouched groups pay nothing


def _unmask_col(col):
    """Vectorized sentinel → null restore for MULTI-group columns (the
    sorted-block kernels see many convs per block).  Inputs here are
    freshly built take()/filter() outputs, never zero-copy block slices,
    so the sliced-offsets bug above doesn't apply."""
    import pyarrow.compute as pc

    return pc.if_else(pc.equal(col, _NULL_KEY), pa.scalar(None, pa.string()), col)


def _sorted_by_conv(ds, cols: list[str]):
    """Thin-select + null-mask + distributed sort by conv_id — the shared
    front half of every per-conversation windowed operator.

    Why this replaces ``groupby(conv_id).map_groups``: Ray's map_groups is
    the SAME ``sort(key)`` followed by a per-block map, but it then pays
    ~50-125 µs of Python per GROUP (slice + BlockAccessor + UDF call per
    conv).  At 10^12 turns / ~50 turns per conv that's ~2×10^10 groups —
    hours of pure overhead cluster-wide.  The kernels below process a whole
    sorted block in vectorized numpy with conv boundaries found by a single
    scan (the shape proven by dedup._emit_pairs_sorted_block).

    Physical contract (identical to what map_groups itself relies on):
    after ``sort``, range partitioning against FIXED boundary values sends
    every row of one conv_id to the same partition (equal keys compare
    identically against every boundary), and ``map_batches`` with the
    default ``batch_size=None`` maps whole blocks — so each kernel call
    sees every one of its conversations complete.  Partitioning assumption
    (shared with map_groups): one conversation's thin rows fit a worker
    block; a conv too large for that needs a pre-bucketed time-range
    split."""
    if set(cols) < set(ds.schema().names):
        ds = ds.select_columns(cols)
    return _mask_null_key(ds, "conv_id").sort("conv_id")


def _conv_codes(t: pa.Table):
    """conv_id column of a conv-sorted block → (int32 codes, string array).
    Equal conv_ids are adjacent (the block is sorted by conv_id), so code
    changes mark exactly the conv boundaries; dictionary codes make the
    in-kernel lexsort compare ints, not strings."""
    conv = t.column("conv_id")
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    enc = conv.dictionary_encode()
    return enc.indices.to_numpy(zero_copy_only=False), conv


_SESSIONS_EMPTY = pa.table(
    {
        "conv_id": pa.array([], pa.string()),
        "session_idx": pa.array([], pa.int64()),
        "n_turns": pa.array([], pa.int64()),
        "t_start": pa.array([], pa.timestamp("us")),
        "t_end": pa.array([], pa.timestamp("us")),
    }
)


def _sessions_sorted_block(t: pa.Table) -> pa.Table:
    """All conversations of a conv-sorted block sessionized in one
    vectorized pass: block-wide lexsort (ts, turn_idx within conv) →
    boundary masks → cumsum-with-reset session ids → per-session take.
    Zero per-conv Python."""
    import numpy as np

    n = len(t)
    if n == 0:
        return _SESSIONS_EMPTY
    codes, conv = _conv_codes(t)
    ts, v = _int_key(t.column("ts"))
    ti, _ = _int_key(t.column("turn_idx"))
    order = np.lexsort((ti, ts, codes))
    c_s, ts_s, v_s = codes[order], ts[order], v[order]
    nb = np.empty(n, dtype=bool)  # new-conv mask
    nb[0] = True
    nb[1:] = c_s[1:] != c_s[:-1]
    # A null ts never breaks (oracle: date_diff vs/from NULL → CASE → 0);
    # nulls sort LAST within the conv, so v_s[i] ⇒ v_s[i-1] — one mask term.
    brk = np.zeros(n, dtype=bool)  # same-conv session break
    brk[1:] = ~nb[1:] & v_s[1:] & (np.diff(ts_s) > SESSION_GAP_S * 1_000_000)
    starts = np.flatnonzero(nb | brk)
    ends = np.r_[starts[1:], n] - 1
    # session_idx = per-conv cumsum of breaks: global cumsum minus its
    # value at the row's conv start
    cum = np.cumsum(brk)
    conv_ord = np.cumsum(nb) - 1  # conv ordinal per row
    base = cum[np.flatnonzero(nb)]  # cum at each conv's first row (brk=False there)
    sess_idx = (cum - base[conv_ord])[starts]
    # t_start/t_end skip nulls (SQL min/max): valid rows are a session
    # PREFIX (nulls last), so t_start is row `start` iff valid and t_end is
    # row start + n_valid - 1; an all-null session gets NULL bounds.
    cv = np.cumsum(v_s)
    nv = cv[ends] - cv[starts] + v_s[starts]
    has = nv > 0
    end_idx = np.where(has, starts + nv - 1, starts)
    return pa.table(
        {
            "conv_id": _unmask_col(conv.take(pa.array(order[starts]))),
            "session_idx": pa.array(sess_idx, pa.int64()),
            "n_turns": pa.array(np.diff(np.r_[starts, n]), pa.int64()),
            "t_start": pa.array(ts_s[starts], mask=~has).cast(pa.timestamp("us")),
            "t_end": pa.array(ts_s[end_idx], mask=~has).cast(pa.timestamp("us")),
        }
    )


def conv_sessions(ds):
    """Windowed sessionization — the gap-based streaming-window operator a
    log pipeline needs (per north_star: custom windowed aggregate): within
    each conversation, a new session starts when the gap from the previous
    turn exceeds SESSION_GAP_S; emits one row per session with its turn
    count and time bounds.

    Ray shape: sort by conv_id + vectorized sorted-block kernel (see
    ``_sorted_by_conv`` for why this beats ``map_groups`` at scale); the
    sort shuffle carries 3 thin columns."""
    return _sorted_by_conv(ds, ["conv_id", "turn_idx", "ts"]).map_batches(
        _sessions_sorted_block, batch_format="pyarrow", zero_copy_batch=True
    )


def conv_sessions_mapgroups(ds):
    """Reference implementation on ``groupby(conv_id).map_groups`` — kept
    (not driver-wired) as the semantic baseline the property tests compare
    the sorted-block kernel against on randomized multi-block layouts."""
    import numpy as np

    need = ["conv_id", "turn_idx", "ts"]
    if set(need) < set(ds.schema().names):
        ds = ds.select_columns(need)

    def per_conv(g: pa.Table) -> pa.Table:
        ts, v = _int_key(g.column("ts"))
        ti, _ = _int_key(g.column("turn_idx"))
        order = np.lexsort((ti, ts))
        ts_s, v_s = ts[order], v[order]
        brk = np.zeros(len(ts_s), dtype=np.int64)
        if len(ts_s) > 1:
            brk[1:] = v_s[1:] & (np.diff(ts_s) > SESSION_GAP_S * 1_000_000)
        sess = np.cumsum(brk)
        starts = np.flatnonzero(np.r_[1, brk[1:]])
        n_turns = np.diff(np.r_[starts, len(ts_s)])
        ends = starts + n_turns - 1
        cv = np.cumsum(v_s)
        nv = cv[ends] - cv[starts] + v_s[starts]
        has = nv > 0
        end_idx = np.where(has, starts + nv - 1, starts)
        n = len(starts)
        cid = g.column("conv_id")[0].as_py()
        return pa.table(
            {
                "conv_id": pa.array(
                    [None if cid == _NULL_KEY else cid] * n, pa.string()
                ),
                "session_idx": pa.array(sess[starts], pa.int64()),
                "n_turns": pa.array(n_turns, pa.int64()),
                "t_start": pa.array(ts_s[starts], mask=~has).cast(pa.timestamp("us")),
                "t_end": pa.array(ts_s[end_idx], mask=~has).cast(pa.timestamp("us")),
            }
        )

    ds = _mask_null_key(ds, "conv_id")
    return ds.groupby("conv_id").map_groups(per_conv, batch_format="pyarrow")


def conv_sessions_oracle_sql() -> str:
    from .. import datagen as dg
    gap_us = SESSION_GAP_S * 1_000_000
    return f"""
WITH {dg.TRANSCRIPTS_CTE},
b AS (
  SELECT conv_id, turn_idx, ts,
    CASE WHEN date_diff('microsecond',
           lag(ts) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx), ts)
         > {gap_us} THEN 1 ELSE 0 END AS brk
  FROM transcripts_t
),
s AS (
  SELECT conv_id, ts,
    sum(brk) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
  FROM b
)
SELECT conv_id, session_idx, count(*)::BIGINT AS n_turns,
  min(ts) AS t_start, max(ts) AS t_end
FROM s GROUP BY conv_id, session_idx
""".strip()


def turn_rates(ds):
    """Time-bucketed ingest rates: turns per (role, hour) — the tumbling-
    window counterpart of the per-sink counts.  Same combiner pushdown:
    each batch collapses to ≤(roles × hours-in-batch) rows before the
    shuffle; hour truncation is integer µs division (bit-identical to
    DuckDB ``date_trunc`` for epoch-positive timestamps).

    The hour key stays int64 µs THROUGH the groupby and becomes
    timestamp[us] only in a final map over the tiny aggregated result:
    Ray's hash-aggregate normalizes timestamp keys to the coarsest
    lossless unit (timestamp[us] on hour boundaries comes back
    timestamp[s]), which would diverge from the oracle's
    ``date_trunc`` schema on the driver's value-hash compare."""
    import pyarrow.compute as pc

    hour_us = 3_600_000_000

    def with_hour(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64())
        hr = pc.multiply(pc.divide(us, hour_us), hour_us)  # floor to hour
        return pa.table({"role": t.column("role"), "hour_us": hr})

    bucketed = ds.select_columns(["role", "ts"]).map_batches(
        with_hour, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = per_key_counts(bucketed, ["role", "hour_us"])

    def to_ts(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "role": t.column("role"),
                "hour_ts": t.column("hour_us").cast(pa.timestamp("us")),
                "n_turns": t.column("n_turns"),
            }
        )

    return counts.map_batches(to_ts, batch_format="pyarrow", zero_copy_batch=True)


def turn_rates_oracle_sql() -> str:
    from .. import datagen as dg

    return f"""
WITH {dg.TRANSCRIPTS_CTE}
SELECT role, date_trunc('hour', ts) AS hour_ts, count(*)::BIGINT AS n_turns
FROM transcripts_t GROUP BY role, date_trunc('hour', ts)
""".strip()


ROLLING_WINDOW_S = 3600  # trailing 1h


def rolling_counts(ts, win_us: int, valid=None):
    """Per element of ``ts`` (int64 µs, any order): how many elements fall
    in [t - win_us, t] — SQL RANGE-frame semantics, current row and its
    ts-peers included.  Twin-searchsorted over one sort: O(n log n).

    ``valid`` marks non-null timestamps: SQL RANGE frames put all NULL
    ordering keys in one peer group, so a null row's count is the number
    of null rows in the partition and null rows never enter a valid row's
    window (DuckDB-verified)."""
    import numpy as np

    if valid is None:
        valid = np.ones(len(ts), dtype=bool)
    out = np.empty(len(ts), dtype=np.int64)
    vals = np.sort(ts[valid])
    tv = ts[valid]
    lo = np.searchsorted(vals, tv - win_us, side="left")
    hi = np.searchsorted(vals, tv, side="right")
    out[valid] = hi - lo
    out[~valid] = len(ts) - len(vals)
    return out


def _rolling_sorted_block(t: pa.Table) -> pa.Table:
    """Trailing-window counts for every conv of a conv-sorted block: one
    block-wide lexsort by (conv, ts), then per conv SEGMENT a twin
    ``searchsorted`` over its sorted timestamps.  The per-segment cost is
    two numpy calls (~2-4 µs), not map_groups' ~50-125 µs of slice/UDF
    machinery — the only remaining per-conv work is the O(log n) binary
    searches the semantics require."""
    import numpy as np

    n = len(t)
    if n == 0:  # typed empty, dtypes inherited from the input block
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], t.schema.field("turn_idx").type),
                "ts": pa.array([], t.schema.field("ts").type),
                "n_last_hour": pa.array([], pa.int64()),
            }
        )
    win_us = ROLLING_WINDOW_S * 1_000_000
    codes, conv = _conv_codes(t)
    ts, v = _int_key(t.column("ts"))
    order = np.lexsort((ts, codes))
    c_s, ts_s, v_s = codes[order], ts[order], v[order]
    starts = np.r_[0, np.flatnonzero(c_s[1:] != c_s[:-1]) + 1]
    ends = np.r_[starts[1:], n]
    counts = np.empty(n, dtype=np.int64)
    for s, e in zip(starts, ends):
        # nulls sort last: the valid rows are the segment's PREFIX
        k = s + int(v_s[s:e].sum())
        seg = ts_s[s:k]
        counts[s:k] = np.searchsorted(seg, seg, side="right") - np.searchsorted(
            seg, seg - win_us, side="left"
        )
        counts[k:e] = e - k  # null peer group (SQL RANGE over NULL keys)
    take = pa.array(order)
    return pa.table(
        {
            "conv_id": _unmask_col(conv.take(take)),
            "turn_idx": t.column("turn_idx").take(take),
            "ts": t.column("ts").take(take),
            "n_last_hour": pa.array(counts, pa.int64()),
        }
    )


def turn_rolling(ds):
    """Sliding-window rate per turn: for every turn, the count of turns in
    the same conversation whose ts falls in the trailing ROLLING_WINDOW_S
    seconds — SQL RANGE-frame semantics (current row and its ts-peers
    included), the per-record burst-rate signal a log pipeline tags events
    with (rate limiting, anomaly flags).

    Ray shape: sort by conv_id + per-block twin-``searchsorted`` segment
    kernel (see ``_sorted_by_conv``); the shuffle carries 3 thin columns."""
    return _sorted_by_conv(ds, ["conv_id", "turn_idx", "ts"]).map_batches(
        _rolling_sorted_block, batch_format="pyarrow", zero_copy_batch=True
    )


def turn_rolling_mapgroups(ds):
    """Reference ``map_groups`` implementation (see conv_sessions_mapgroups)."""
    import numpy as np

    need = ["conv_id", "turn_idx", "ts"]
    if set(need) < set(ds.schema().names):
        ds = ds.select_columns(need)
    win_us = ROLLING_WINDOW_S * 1_000_000

    def per_conv(g: pa.Table) -> pa.Table:
        ts, v = _int_key(g.column("ts"))
        return pa.table(
            {
                "conv_id": _unmask_null_key(g.column("conv_id")),
                "turn_idx": g.column("turn_idx"),
                "ts": g.column("ts"),
                "n_last_hour": pa.array(rolling_counts(ts, win_us, v), pa.int64()),
            }
        )

    ds = _mask_null_key(ds, "conv_id")
    return ds.groupby("conv_id").map_groups(per_conv, batch_format="pyarrow")


def turn_rolling_oracle_sql() -> str:
    from .. import datagen as dg

    return f"""
WITH {dg.TRANSCRIPTS_CTE}
SELECT conv_id, turn_idx, ts,
  count(*) OVER (PARTITION BY conv_id ORDER BY ts
                 RANGE BETWEEN INTERVAL {ROLLING_WINDOW_S} SECONDS PRECEDING
                 AND CURRENT ROW)::BIGINT AS n_last_hour
FROM transcripts_t
""".strip()


PCTL_QS = (50, 90, 99)


def conv_percentiles(ds):
    """Exact conversation-length percentiles via the HISTOGRAM pattern:
    per-conv lengths (combiner-aggregated) → ``groupby(n_turns).count()``
    — one row per DISTINCT length — then a driver-side cumulative scan
    over that tiny histogram.  Nothing sorts the corpus and the only
    materialized object is the length histogram (bounded by #distinct
    lengths, not #conversations), so this is exact at any scale.

    Percentile definition (replicated in the oracle): nearest-rank lower —
    the value at 0-based sorted index ``(q·(n-1)) // 100`` (integer math,
    no float interpolation to diverge on)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Count

    hist = (
        conv_stats(ds)
        .groupby("n_turns")
        .aggregate(Count(alias_name="n_convs"))
        .to_pandas()
        .sort_values("n_turns")
        .reset_index(drop=True)
    )
    n = int(hist["n_convs"].sum())
    cum = hist["n_convs"].cumsum().to_numpy(dtype=np.int64)
    lens = hist["n_turns"].to_numpy(dtype=np.int64)
    out = {"n_convs": np.int64(n)}
    for q in PCTL_QS:
        if n == 0:  # empty input: NULL percentiles, like the SQL twin
            out[f"p{q}"] = None
            continue
        idx = (q * (n - 1)) // 100
        out[f"p{q}"] = lens[np.searchsorted(cum, idx + 1)]
    return pd.DataFrame([out])


def conv_percentiles_oracle_sql() -> str:
    from .. import datagen as dg

    picks = ",\n  ".join(
        f"(SELECT min(n_turns) FROM hc WHERE cum >= ({q} * (n.n - 1)) // 100 + 1) AS p{q}"
        for q in PCTL_QS
    )
    return f"""
WITH {dg.TRANSCRIPTS_CTE},
cs AS (SELECT conv_id, count(*)::BIGINT AS n_turns FROM transcripts_t GROUP BY conv_id),
h AS (SELECT n_turns, count(*)::BIGINT AS c FROM cs GROUP BY n_turns),
hc AS (SELECT n_turns, sum(c) OVER (ORDER BY n_turns)::BIGINT AS cum FROM h),
n AS (SELECT count(*)::BIGINT AS n FROM cs)
SELECT n.n AS n_convs,
  {picks}
FROM n
""".strip()


TOP_CONVS_K = 20


def top_convs(ds):
    """Longest conversations: conv_stats → distributed sort → limit.

    ``sort`` is the one genuinely all-to-all range shuffle in the repertoire
    — but it runs over the already-aggregated per-conversation partials (one
    row per conv), never the raw turns, so the exchange is tiny even at
    10^12 turns."""
    stats = conv_stats(ds)
    return stats.sort(["n_turns", "conv_id"], descending=[True, False]).limit(TOP_CONVS_K)


def top_convs_oracle_sql() -> str:
    from .. import datagen as dg
    return f"""
WITH {dg.TRANSCRIPTS_CTE}
SELECT conv_id, count(*)::BIGINT AS n_turns, max(turn_idx)::BIGINT AS max_turn_idx
FROM transcripts_t GROUP BY conv_id
ORDER BY n_turns DESC, conv_id ASC LIMIT {TOP_CONVS_K}
""".strip()


def route_counts_oracle_sql() -> str:
    from .. import datagen as dg
    return f"""
WITH {dg.TRANSCRIPTS_CTE},
{dg._CLS_CTE}
SELECT role,
  count(*) AS n_turns,
  CAST(sum(CASE WHEN matched THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
  CAST(sum(CASE WHEN cls = 'orphan' THEN 1 ELSE 0 END) AS BIGINT) AS n_orphaned,
  CAST(sum(CASE WHEN cls = 'full' THEN 1 ELSE 0 END) AS BIGINT) AS n_full
FROM cls3 GROUP BY role
""".strip()


def _concat_sorted_block(t: pa.Table) -> pa.Table:
    """Conversation reassembly over a conv-sorted block: block-wide lexsort
    by (conv, turn_idx, ts, text) — text as the FINAL tie-breaker so
    duplicate (turn_idx, ts) turns concatenate in ONE deterministic order
    on both engine and oracle (ADVICE r2: np.lexsort was stable on
    shuffle-arrival order while the oracle's tie order was DuckDB-internal)
    — then one Python join per conv (string building is the operator's
    inherent work; the removed cost is map_groups' per-group machinery).

    Null texts sort via '' (their position is invisible: string_agg skips
    NULLs and the engine join drops them) and are excluded from the join
    but counted in n_turns — SQL string_agg/count(*) semantics."""
    import numpy as np

    from ..functions import corpus as cp

    n = len(t)
    if n == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "doc_len": pa.array([], pa.int64()),
                "doc_hash": pa.array([], pa.int64()),
            }
        )
    codes, conv = _conv_codes(t)
    ti = t.column("turn_idx").to_numpy(zero_copy_only=False)
    ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    texts = np.asarray(t.column("text").to_pylist(), dtype=object)
    txt_key = np.where(texts == None, "", texts)  # noqa: E711 — elementwise
    order = np.lexsort((txt_key, ts, ti, codes))
    c_s = codes[order]
    texts_s = texts[order]
    starts = np.r_[0, np.flatnonzero(c_s[1:] != c_s[:-1]) + 1]
    ends = np.r_[starts[1:], n]
    joined = []
    for s, e in zip(starts, ends):
        kept = [x for x in texts_s[s:e] if x is not None]
        joined.append("\n".join(kept) if kept else None)  # all-NULL conv → NULL
    return pa.table(
        {
            "conv_id": _unmask_col(conv.take(pa.array(order[starts]))),
            "n_turns": pa.array(np.diff(np.r_[starts, n]), pa.int64()),
            "doc_len": pa.array(
                [len(j) if j is not None else None for j in joined], pa.int64()
            ),
            "doc_hash": pa.array(
                [cp.w63(j) if j is not None else None for j in joined], pa.int64()
            ),
        }
    )


def conv_concat(ds):
    """Conversation reassembly — the transcripts → training-documents op: a
    conversation's turns (ordered by turn_idx, ts, text) concatenated into
    one document, summarized as (n_turns, doc_len, doc_hash) so the result
    stays thin (the real sink writes the concatenated text; the w63 hash
    uniquely witnesses it for the oracle, like the fingerprint op).

    Ray shape: sort by conv_id + sorted-block kernel (see
    ``_sorted_by_conv``); the shuffle carries 4 thin columns (text rides
    once)."""
    return _sorted_by_conv(ds, ["conv_id", "turn_idx", "text", "ts"]).map_batches(
        _concat_sorted_block, batch_format="pyarrow", zero_copy_batch=True
    )


def conv_concat_mapgroups(ds):
    """Reference ``map_groups`` implementation (see conv_sessions_mapgroups),
    including the deterministic text tie-breaker."""
    import numpy as np

    from ..functions import corpus as cp

    need = ["conv_id", "turn_idx", "text", "ts"]
    if set(need) < set(ds.schema().names):
        ds = ds.select_columns(need)

    def per_conv(g: pa.Table) -> pa.Table:
        ti = g.column("turn_idx").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        texts = np.asarray(g.column("text").to_pylist(), dtype=object)
        txt_key = np.where(texts == None, "", texts)  # noqa: E711
        order = np.lexsort((txt_key, ts, ti))
        kept = [x for x in texts[order] if x is not None]
        joined = "\n".join(kept) if kept else None
        cid = g.column("conv_id")[0].as_py()
        return pa.table(
            {
                "conv_id": pa.array(
                    [None if cid == _NULL_KEY else cid], pa.string()
                ),
                "n_turns": pa.array([len(g)], pa.int64()),
                "doc_len": pa.array(
                    [len(joined) if joined is not None else None], pa.int64()
                ),
                "doc_hash": pa.array(
                    [cp.w63(joined) if joined is not None else None], pa.int64()
                ),
            }
        )

    ds = _mask_null_key(ds, "conv_id")
    return ds.groupby("conv_id").map_groups(per_conv, batch_format="pyarrow")


def conv_concat_oracle_sql() -> str:
    from .. import datagen as dg
    from ..functions import corpus as cp

    # text is the final ORDER BY tie-breaker on BOTH sides (ADVICE r2)
    agg = "string_agg(text, chr(10) ORDER BY turn_idx, ts, text)"
    w63 = cp.SQL_W63.format(s=agg)
    return f"""
WITH {dg.TRANSCRIPTS_CTE}
SELECT conv_id, count(*)::BIGINT AS n_turns,
  length({agg})::BIGINT AS doc_len,
  {w63} AS doc_hash
FROM transcripts_t GROUP BY conv_id
""".strip()


_CONV_DEDUP_NULL_HASH = -1  # w63 is non-negative; masks a null doc_hash


def conv_dedup(ds):
    """Conversation-level exact dedup: conversations whose REASSEMBLED
    document (conv_concat's deterministic turn order) is byte-identical
    collapse to one group — the transcript twin of q_dedup_exact, catching
    whole-session replays (retried agent runs, double-shipped logs) that
    turn-level dedup can't see.  Output: one row per distinct document
    (doc_hash, keeper conv_id = min non-null, n_convs, n_turns of the
    keeper-size group).  Shape: composes the conv_concat sorted-block
    kernel with a thin ≤|distinct-doc| groupby — nothing new shuffles."""
    from ray.data.aggregate import Count, Max, Min

    cc = conv_concat(ds)

    import pyarrow.compute as pc

    def keyed(t: pa.Table) -> pa.Table:
        h = pc.fill_null(t.column("doc_hash"), _CONV_DEDUP_NULL_HASH)
        return t.set_column(t.column_names.index("doc_hash"), "doc_hash", h)

    agg = (
        cc.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_hash")
        .aggregate(
            Min("conv_id", alias_name="conv_id"),
            Count(alias_name="n_convs"),
            Max("n_turns", alias_name="n_turns"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        h = t.column("doc_hash")
        return pa.table(
            {
                "doc_hash": pc.if_else(
                    pc.equal(h, _CONV_DEDUP_NULL_HASH),
                    pa.scalar(None, pa.int64()),
                    h,
                ),
                "conv_id": t.column("conv_id"),
                "n_convs": t.column("n_convs"),
                "n_turns": t.column("n_turns").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def conv_dedup_oracle_sql() -> str:
    from .. import datagen as dg
    from ..functions import corpus as cp

    agg = "string_agg(text, chr(10) ORDER BY turn_idx, ts, text)"
    w63 = cp.SQL_W63.format(s=agg)
    return f"""
WITH {dg.TRANSCRIPTS_CTE},
cc AS (
  SELECT conv_id, count(*)::BIGINT AS n_turns, {w63} AS doc_hash
  FROM transcripts_t GROUP BY conv_id
)
SELECT doc_hash, min(conv_id) AS conv_id, count(*)::BIGINT AS n_convs,
  max(n_turns)::BIGINT AS n_turns
FROM cc GROUP BY doc_hash
""".strip()


_TCE_SENT_CONV = "\x00\x00join-sent"  # distinct from _NULL_KEY


def turn_conv_enrich(ds):
    """Feature join: every turn annotated with its conversation's
    aggregate stats (n_turns_conv, is_last_turn) — the self-aggregation
    join feature pipelines run before packing/sampling.  Unlike the
    broadcast joins (doc_embed, as-of), BOTH sides here are corpus-
    derived: the turn stream hash-joins the combiner-built conv-stats
    table on conv_id, so the op works when conversations outnumber what
    a broadcast could hold.  Null conv_ids form their own group (window-
    function semantics), riding the shared mask through the join."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.dedup import _join_partitions

    need = ["conv_id", "turn_idx", "role"]
    if set(need) < set(ds.schema().names):
        ds = ds.select_columns(need)
    masked = _mask_null_key(ds, "conv_id")
    stats = conv_stats(masked).union(rd.from_arrow(pa.table(
        {
            "conv_id": pa.array([_TCE_SENT_CONV], pa.string()),
            "n_turns": pa.array([0], pa.int64()),
            "max_turn_idx": pa.array([None], pa.int64()),
        }
    )))
    turns = masked.union(rd.from_arrow(pa.table(
        {
            "conv_id": pa.array([_TCE_SENT_CONV], pa.string()),
            "turn_idx": pa.array([None], pa.int32()),
            "role": pa.array([None], pa.string()),
        }
    )))
    joined = turns.join(
        stats, join_type="inner", num_partitions=_join_partitions(),
        on=("conv_id",),
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("conv_id"), _TCE_SENT_CONV))
        ti = t.column("turn_idx").cast(pa.int64())
        is_last = pc.fill_null(pc.equal(ti, t.column("max_turn_idx")), False)
        return pa.table(
            {
                "conv_id": _unmask_col(t.column("conv_id")),
                "turn_idx": t.column("turn_idx"),
                "role": t.column("role"),
                "n_turns_conv": t.column("n_turns").cast(pa.int64()),
                "is_last_turn": is_last,
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def turn_conv_enrich_oracle_sql() -> str:
    from .. import datagen as dg

    return f"""
WITH {dg.TRANSCRIPTS_CTE},
w AS (
  SELECT conv_id, turn_idx, role,
    count(*) OVER (PARTITION BY conv_id) AS n_turns_conv,
    max(turn_idx) OVER (PARTITION BY conv_id) AS mx
  FROM transcripts_t
)
SELECT conv_id, turn_idx, role, n_turns_conv::BIGINT AS n_turns_conv,
  coalesce(turn_idx = mx, false) AS is_last_turn
FROM w
""".strip()


def _session_assign_sorted_block(t: pa.Table) -> pa.Table:
    """Per-TURN session ids: the same boundary math as
    _sessions_sorted_block, but emitting every row with its cumulative
    break count instead of one row per session."""
    import numpy as np

    if len(t) == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "ts": pa.array([], pa.timestamp("us")),
                "session_idx": pa.array([], pa.int64()),
            }
        )
    n = len(t)
    codes, conv = _conv_codes(t)
    ts, v = _int_key(t.column("ts"))
    ti, _ = _int_key(t.column("turn_idx"))
    order = np.lexsort((ti, ts, codes))
    c_s, ts_s, v_s = codes[order], ts[order], v[order]
    nb = np.empty(n, dtype=bool)
    nb[0] = True
    nb[1:] = c_s[1:] != c_s[:-1]
    brk = np.zeros(n, dtype=bool)
    brk[1:] = ~nb[1:] & v_s[1:] & (np.diff(ts_s) > SESSION_GAP_S * 1_000_000)
    cum = np.cumsum(brk)
    conv_ord = np.cumsum(nb) - 1
    base = cum[np.flatnonzero(nb)]
    sess = cum - base[conv_ord]
    take = pa.array(order)
    return pa.table(
        {
            "conv_id": _unmask_col(conv.take(take)),
            "turn_idx": t.column("turn_idx").take(take),
            "ts": t.column("ts").take(take),
            "session_idx": pa.array(sess, pa.int64()),
        }
    )


def turn_session_assign(ds):
    """Sessionized turn stream: every turn stamped with the session_idx
    conv_sessions would assign it — the per-row side of the gap-window
    operator (downstream samplers/packers key on it).  Same sort + 3-thin-
    column shuffle as conv_sessions; null ts never breaks a session and
    inherits the running session id (nulls order last within the conv)."""
    return _sorted_by_conv(ds, ["conv_id", "turn_idx", "ts"]).map_batches(
        _session_assign_sorted_block, batch_format="pyarrow", zero_copy_batch=True
    )


def turn_session_assign_oracle_sql() -> str:
    from .. import datagen as dg

    gap_us = SESSION_GAP_S * 1_000_000
    return f"""
WITH {dg.TRANSCRIPTS_CTE},
b AS (
  SELECT conv_id, turn_idx, ts,
    CASE WHEN date_diff('microsecond',
           lag(ts) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx), ts)
         > {gap_us} THEN 1 ELSE 0 END AS brk
  FROM transcripts_t
)
SELECT conv_id, turn_idx, ts,
  sum(brk) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                 ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
FROM b
""".strip()
