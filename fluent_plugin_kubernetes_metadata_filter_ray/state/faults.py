"""Fault-injection helpers (test support).

Classes used by the fault-tolerance tests must live in the installed
package: Ray serializes actor classes by reference and a restarted worker
re-imports them — a class defined inside a pytest module is invisible to
fresh worker processes."""

from __future__ import annotations

import os

import pyarrow as pa


class CrashOnFirstCall:
    """Kills its worker process on the very first batch (once, flag-file
    gated), then behaves normally after Ray restarts the actor — models the
    reference's watch-thread crash-restart ladder
    (kubernetes_metadata_watch_pods.rb:29-112), where the supervisor restart
    rebuilds all caches from scratch."""

    def __init__(self, flag_path: str):
        self.flag_path = flag_path

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not os.path.exists(self.flag_path):
            with open(self.flag_path, "w") as f:
                f.write("crashed")
            os._exit(1)  # hard worker death, not an exception
        return batch
