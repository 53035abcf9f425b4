"""LRU + TTL cache with an injectable clock.

Stands in for the reference's ``LruRedux::TTL::ThreadSafeCache``
(filter_kubernetes_metadata.rb:197-204).  One instance per enrich actor —
never shared across actors (cache duplication is fine; correctness comes from
the immutable metadata snapshot, SURVEY.md §3.4).
"""

from __future__ import annotations

import time
from collections import OrderedDict
from typing import Any, Callable


class TTLLRUCache:
    __slots__ = ("maxsize", "ttl", "clock", "_d")

    def __init__(self, maxsize: int = 1000, ttl: float = 3600.0,
                 clock: Callable[[], float] = time.monotonic):
        self.maxsize = maxsize
        self.ttl = ttl
        self.clock = clock
        self._d: OrderedDict[Any, tuple[float, Any]] = OrderedDict()

    def get(self, key, default=None):
        item = self._d.get(key)
        if item is None:
            return default
        expiry, value = item
        if self.clock() >= expiry:
            del self._d[key]
            return default
        self._d.move_to_end(key)
        return value

    def __contains__(self, key) -> bool:
        sentinel = object()
        return self.get(key, sentinel) is not sentinel

    def __setitem__(self, key, value) -> None:
        if key in self._d:
            del self._d[key]
        elif len(self._d) >= self.maxsize:
            self._d.popitem(last=False)
        self._d[key] = (self.clock() + self.ttl, value)

    def fetch(self, key, fallback: Callable[[], Any]):
        """Ruby ``Hash#fetch``-with-block analog used by the cache strategy
        (kubernetes_metadata_cache_strategy.rb:53,84,89): on miss, call the
        fallback; the fallback's result is NOT inserted (matching LruRedux
        ``fetch``, which only reads)."""
        sentinel = object()
        value = self.get(key, sentinel)
        if value is sentinel:
            return fallback()
        return value

    def delete(self, key) -> None:
        """Targeted invalidation (watch-DELETED analog); absent keys no-op."""
        self._d.pop(key, None)

    def __len__(self) -> int:
        now = self.clock()
        return sum(1 for expiry, _ in self._d.values() if expiry > now)

    def clear(self) -> None:
        self._d.clear()
