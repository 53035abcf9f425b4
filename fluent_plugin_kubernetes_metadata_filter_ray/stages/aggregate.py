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


def conv_sessions(ds):
    """Windowed sessionization — the gap-based streaming-window operator a
    log pipeline needs (per north_star: custom windowed aggregate): within
    each conversation, a new session starts when the gap from the previous
    turn exceeds SESSION_GAP_S; emits one row per session with its turn
    count and time bounds.

    Ray shape: ``groupby(conv_id).map_groups`` with a vectorized in-group
    kernel (lexsort by (ts, turn_idx) → diff → cumsum → reduceat).
    Partitioning assumption (documented): one conversation's turns fit in a
    worker's memory — the same assumption the per-conv stats make; a
    conversation too large for that would need a pre-bucketed time-range
    split."""
    import numpy as np

    # prune before the groupby: the sort shuffle should carry 3 thin
    # columns, not the text/tool payloads
    need = ["conv_id", "turn_idx", "ts"]
    if set(need) < set(ds.schema().names):
        ds = ds.select_columns(need)

    def per_conv(g: pa.Table) -> pa.Table:
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        ti = g.column("turn_idx").to_numpy(zero_copy_only=False)
        order = np.lexsort((ti, ts))
        ts_s = ts[order]
        brk = np.zeros(len(ts_s), dtype=np.int64)
        if len(ts_s) > 1:
            brk[1:] = np.diff(ts_s) > SESSION_GAP_S * 1_000_000
        sess = np.cumsum(brk)
        starts = np.flatnonzero(np.r_[1, brk[1:]])
        n_turns = np.diff(np.r_[starts, len(ts_s)])
        ends = starts + n_turns - 1
        n = len(starts)
        cid = g.column("conv_id")[0].as_py()
        return pa.table(
            {
                "conv_id": pa.array(
                    [None if cid == _NULL_KEY else cid] * n, pa.string()
                ),
                "session_idx": pa.array(sess[starts], pa.int64()),
                "n_turns": pa.array(n_turns, pa.int64()),
                "t_start": pa.array(ts_s[starts], pa.int64()).cast(pa.timestamp("us")),
                "t_end": pa.array(ts_s[ends], pa.int64()).cast(pa.timestamp("us")),
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


def rolling_counts(ts, win_us: int):
    """Per element of ``ts`` (int64 µs, any order): how many elements fall
    in [t - win_us, t] — SQL RANGE-frame semantics, current row and its
    ts-peers included.  Twin-searchsorted over one sort: O(n log n)."""
    import numpy as np

    ts_sorted = np.sort(ts)
    lo = np.searchsorted(ts_sorted, ts - win_us, side="left")
    hi = np.searchsorted(ts_sorted, ts, side="right")
    return hi - lo


def turn_rolling(ds):
    """Sliding-window rate per turn: for every turn, the count of turns in
    the same conversation whose ts falls in the trailing ROLLING_WINDOW_S
    seconds — SQL RANGE-frame semantics (current row and its ts-peers
    included), the per-record burst-rate signal a log pipeline tags events
    with (rate limiting, anomaly flags).

    Ray shape: ``groupby(conv_id).map_groups`` with a vectorized
    twin-``searchsorted`` kernel over the group's sorted int64-µs
    timestamps — O(n log n) per conversation, no Python row loop.  Same
    partitioning assumption as the other per-conv windows (one conv fits a
    worker); the shuffle carries 3 thin columns."""
    import numpy as np

    need = ["conv_id", "turn_idx", "ts"]
    if set(need) < set(ds.schema().names):
        ds = ds.select_columns(need)
    win_us = ROLLING_WINDOW_S * 1_000_000

    def per_conv(g: pa.Table) -> pa.Table:
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "conv_id": _unmask_null_key(g.column("conv_id")),
                "turn_idx": g.column("turn_idx"),
                "ts": g.column("ts"),
                "n_last_hour": pa.array(rolling_counts(ts, win_us), pa.int64()),
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


def conv_concat(ds):
    """Conversation reassembly — the transcripts → training-documents op: a
    conversation's turns (ordered by turn_idx, ties by ts) concatenated
    into one document, summarized as (n_turns, doc_len, doc_hash) so the
    result stays thin (the real sink writes the concatenated text; the
    w63 hash uniquely witnesses it for the oracle, like the fingerprint
    op).  Null texts are skipped in the join but counted in n_turns —
    SQL string_agg/count(*) semantics.

    Ray shape: ``groupby(conv_id).map_groups`` with an in-group lexsort;
    the shuffle carries 4 thin columns (text rides once).  Same
    partitioning assumption as the other per-conv windows."""
    import numpy as np

    from ..functions import corpus as cp

    need = ["conv_id", "turn_idx", "text", "ts"]
    if set(need) < set(ds.schema().names):
        ds = ds.select_columns(need)

    def per_conv(g: pa.Table) -> pa.Table:
        ti = g.column("turn_idx").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, ti))
        texts = [t for t in (g.column("text").take(pa.array(order)).to_pylist()) if t is not None]
        joined = "\n".join(texts) if texts else None
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

    agg = "string_agg(text, chr(10) ORDER BY turn_idx, ts)"
    w63 = cp.SQL_W63.format(s=agg)
    return f"""
WITH {dg.TRANSCRIPTS_CTE}
SELECT conv_id, count(*)::BIGINT AS n_turns,
  length({agg})::BIGINT AS doc_len,
  {w63} AS doc_hash
FROM transcripts_t GROUP BY conv_id
""".strip()
