"""Vectorized tag/field parse stage (M1-M3 in SURVEY.md §2.2).

The reference matches each event's tag against an alternation of two anchored
named-group regexes (filter_kubernetes_metadata.rb:57-58,364-373) and may
override the result with kubernetes/docker fields already present on the
record (lookup_from_k8s_field, :384-400).  Here both paths run as one
stateless ``map_batches`` over zero-copy Arrow batches:

  - two ``pyarrow.compute.extract_regex`` calls (RE2) over the ``tool``
    column, coalesced per field — no Python row loop;
  - the JSON-field override only touches the small masked subset of rows
    whose ``text`` starts with ``{"kubernetes"`` (a cheap prefix test), so
    the per-row ``json.loads`` cost is bounded by that fraction.

Output adds the PARSE_COLUMNS key columns; non-matching rows get nulls and
later pass through enrichment untouched (test_filter_kubernetes_metadata.rb:586-600).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PARSE_FIELDS = ["namespace", "pod_name", "container_name", "docker_id", "pod_uuid"]
K8S_FIELD_PREFIX = '{"kubernetes"'


class TagParser:
    """Callable for ``map_batches`` — stateless, but kept as a class so the
    regexes compile once per worker (cheap either way; mirrors the reference's
    configure-time compile at filter_kubernetes_metadata.rb:206)."""

    def __init__(self, cfg):
        self.re_containers = cfg.tag_regex_containers
        self.re_pods = cfg.tag_regex_pods
        self.lookup_from_k8s_field = cfg.lookup_from_k8s_field

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        tool = batch.column("tool")
        if tool.num_chunks != 1:
            tool = tool.combine_chunks()
        tool_arr = tool.chunk(0) if isinstance(tool, pa.ChunkedArray) else tool

        mc = pc.extract_regex(tool_arr, self.re_containers)
        mp = pc.extract_regex(tool_arr, self.re_pods)
        # child arrays of a StructArray ignore the parent validity bitmap —
        # mask them explicitly or non-matches surface as '' instead of null
        mc_valid = mc.is_valid()
        mp_valid = mp.is_valid()
        nulls = pa.nulls(n, pa.string())

        def pick(name: str) -> pa.Array:
            c = (
                pc.if_else(mc_valid, mc.field(name), nulls)
                if name in [f.name for f in mc.type] else nulls
            )
            p = (
                pc.if_else(mp_valid, mp.field(name), nulls)
                if name in [f.name for f in mp.type] else nulls
            )
            return pc.coalesce(c, p)

        cols = {f: pick(f) for f in PARSE_FIELDS}

        # lookup_from_k8s_field override on the masked subset: per-row JSON
        # parse only where text carries the prefix; scattered back with
        # replace_with_mask (no full-column Python round-trip)
        is_field = np.zeros(n, dtype=bool)
        if self.lookup_from_k8s_field:
            text = batch.column("text")
            prefix = pc.starts_with(text, K8S_FIELD_PREFIX)
            idxs = np.flatnonzero(prefix.combine_chunks().to_numpy(zero_copy_only=False))
            if len(idxs):
                texts = text.take(pa.array(idxs)).to_pylist()
                over_rows = []  # (row_idx, ns, pod, cont, cid)
                for i, t in zip(idxs, texts):
                    try:
                        rec = json.loads(t)
                        k8s = rec["kubernetes"]
                        docker = rec["docker"]
                        over_rows.append((
                            i, k8s["namespace_name"], k8s["pod_name"],
                            k8s["container_name"], docker["container_id"],
                        ))
                    except (ValueError, KeyError, TypeError):
                        continue  # malformed → tag-derived keys stand
                if over_rows:
                    rows_idx = np.fromiter((r[0] for r in over_rows), dtype=np.int64)
                    is_field[rows_idx] = True
                    mask = pa.array(is_field)
                    for fi, f in enumerate(PARSE_FIELDS):
                        if f == "pod_uuid":
                            repl = pa.nulls(len(over_rows), pa.string())
                        else:
                            repl = pa.array([r[fi + 1] for r in over_rows], pa.string())
                        col = cols[f]
                        if isinstance(col, pa.ChunkedArray):
                            col = col.combine_chunks()
                        cols[f] = pc.replace_with_mask(col, mask, repl)

        # cache key: pod_uuid when present else docker_id
        # (filter_kubernetes_metadata.rb:368-373); field rows use container_id
        cache_key = pc.coalesce(cols["pod_uuid"], cols["docker_id"])
        matched = pc.cast(pc.is_valid(cols["namespace"]), pa.int32())

        out = batch
        for f in PARSE_FIELDS:
            out = out.append_column(f, cols[f])
        out = out.append_column("cache_key", cache_key)
        out = out.append_column("is_k8s_field", pa.array(is_field.astype(np.int32)))
        out = out.append_column("matched", matched)
        return out


def parse_batch(batch: pa.Table, cfg) -> pa.Table:
    """Function form of the parse: constructing TagParser is three attribute
    reads, so per-batch construction is free — and passing a *function* (not
    a class) to map_batches keeps this stage a TASK pool that fuses with the
    read at full cluster width.  A class here becomes an actor pool and the
    read gets fused into it, capping read parallelism at the pool's ramp-up
    (observed 3-5× slowdown)."""
    return TagParser(cfg)(batch)


def parse_stage(ds, cfg):
    """read → parse: stateless tasks, Arrow in / Arrow out."""
    import functools

    return ds.map_batches(
        functools.partial(parse_batch, cfg=cfg),
        batch_format="pyarrow",
        batch_size=cfg.parse_batch_size,
        zero_copy_batch=True,
    )
