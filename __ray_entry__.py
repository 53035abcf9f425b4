"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

The engine has no ``transcripts`` table in the driver testdata, so each
query derives one deterministically from ``events.parquet`` (cached in
/tmp) using expressions with exact DuckDB twins — see
``fluent_plugin_kubernetes_metadata_filter_ray/datagen.py``.  The oracle SQL
re-derives the same table (and the analytically-expected enrichment) from
the pre-registered ``events`` view, so the value-hash comparison checks the
real engine work: regex parse, cached store lookups, orphan / deleted-pod /
recreated-namespace classification, routing aggregates.

The actual wiring lives in the package
(``fluent_plugin_kubernetes_metadata_filter_ray/queries.py``), shared with
the CLI ``analyze`` command; this module is the thin driver-facing shim.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from fluent_plugin_kubernetes_metadata_filter_ray import queries as _q
from fluent_plugin_kubernetes_metadata_filter_ray.pipelines import flagship


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: parse → enrich → per-sink
    counts."""
    return flagship.run_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
