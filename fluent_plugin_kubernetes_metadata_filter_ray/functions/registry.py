"""Registry of the training-data operator queries (dedup, similarity, text
analysis, multimodal) — filled in as operators land.  Keys without an oracle
entry get the driver's weaker rows-only check (non-SQL-expressible ops)."""

from __future__ import annotations


def queries() -> dict:
    return {}


def oracle_sql() -> dict:
    return {}
