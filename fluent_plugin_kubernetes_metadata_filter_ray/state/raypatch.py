"""Driver-side workaround for a Ray 2.49 hash-shuffle schema-broadcast race.

``HashShufflingOperatorBase._do_add_input_inner`` broadcasts block schemas to
its aggregator pool exactly once per input sequence — on the FIRST block it
receives (hash_shuffle.py:548) — and marks the broadcast done unconditionally
(hash_shuffle.py:588-589).  But the remote ``_shuffle_block`` task returns
early on a zero-row block (hash_shuffle.py:223-225) WITHOUT fanning typed
empty shards to the aggregators.  So when the first block to arrive is empty
(an upstream map/sort stage emitted a typed-but-empty block), the one-shot
broadcast is burned, aggregator partitions that never receive a row stay
schema-less, and a downstream ``pyarrow`` acero join fails with::

    No match or multiple matches for key field reference FieldRef.Name(...)

Which block arrives first is a streaming-executor race, so any join/aggregate
whose inputs can contain empty blocks (sparse candidate-pair stages, filtered
streams) fails nondeterministically.

The fix: strip zero-row blocks from bundles before the operator sees them.
Empty blocks carry no data — their only effect on a hash shuffle is this
broadcast race — so dropping them is behavior-preserving (an empty block that
IS forwarded is discarded by ``_shuffle_block`` anyway).  Inputs that are
empty END-TO-END still need one real row to type the aggregators; query code
threads a sentinel row for that (see ``functions/dedup.py``).

Applied at package import; version-guarded and fail-open (a Ray refactor that
removes the symbol leaves stock behavior in place).
"""

from __future__ import annotations

import logging

_log = logging.getLogger(__name__)
_applied = False


def apply() -> bool:
    """Install the patch (idempotent). Returns True if active."""
    global _applied
    if _applied:
        return True
    try:
        from ray.data._internal.execution.interfaces import RefBundle
        from ray.data._internal.execution.operators.hash_shuffle import (
            HashShufflingOperatorBase,
        )

        orig = HashShufflingOperatorBase._do_add_input_inner

        def _do_add_input_inner(self, input_bundle, input_index):
            # num_rows may be None (unknown) — keep those; drop only known-empty
            kept = [
                (ref, md)
                for ref, md in input_bundle.blocks
                if md.num_rows is None or md.num_rows > 0
            ]
            if len(kept) != len(input_bundle.blocks):
                if not kept:
                    return
                input_bundle = RefBundle(
                    tuple(kept),
                    schema=input_bundle.schema,
                    owns_blocks=input_bundle.owns_blocks,
                )
            return orig(self, input_bundle, input_index)

        HashShufflingOperatorBase._do_add_input_inner = _do_add_input_inner
        _applied = True
        return True
    except Exception as exc:  # pragma: no cover - future Ray versions
        _log.warning("hash-shuffle empty-block patch not applied: %s", exc)
        return False
