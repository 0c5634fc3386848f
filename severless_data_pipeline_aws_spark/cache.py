"""Result cache with TTL expiry (SURVEY §2.1 S8).

The reference memoizes dashboard queries with ``st.cache_data(ttl=60)``
(iot_dashboard.py:45): a result served from cache until 60 s old, then
rebuilt. Spark's ``df.cache()`` has no expiry, so this module supplies
the missing half: a keyed registry of cached DataFrames stamped with
their build time. ``get_or_build`` returns the cached frame while it is
fresh, and on expiry unpersists the stale one and rebuilds — the
Streamlit semantics on Spark storage.

Scale notes: the cache holds *references* (persisted DataFrames whose
blocks live on executors), so the driver-side registry is metadata-
sized regardless of data volume. Eviction is explicit unpersist — lazy
Spark eviction (LRU under memory pressure) still applies underneath,
making TTL an upper bound on staleness, not a pin. The clock is
injectable for deterministic tests.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame


@dataclass
class _Entry:
    df: DataFrame
    built_at: float
    builds: int


class TTLCache:
    """Keyed DataFrame cache with time-to-live expiry (S8).

    >>> cache = TTLCache(ttl_s=60)
    >>> counts = cache.get_or_build("status_counts", lambda: expensive_df())
    """

    def __init__(self, ttl_s: float, clock: Callable[[], float] = time.monotonic):
        self.ttl_s = float(ttl_s)
        self._clock = clock
        self._entries: dict[str, _Entry] = {}

    def get_or_build(self, key: str, builder: Callable[[], DataFrame]) -> DataFrame:
        """Return the cached frame if younger than ttl_s, else rebuild.

        The rebuilt frame is persisted and eagerly materialized (a lazy
        cache() would defer the cost to the first consumer and make a
        second concurrent consumer race the same computation).
        """
        now = self._clock()
        entry = self._entries.get(key)
        if entry is not None and now - entry.built_at < self.ttl_s:
            return entry.df
        builds = entry.builds if entry is not None else 0
        if entry is not None:
            entry.df.unpersist()
        df = builder().cache()
        df.count()  # eager materialization pins the blocks now
        self._entries[key] = _Entry(df=df, built_at=now, builds=builds + 1)
        return df

    def build_count(self, key: str) -> int:
        """How many times ``key`` has been (re)built — test/metrics hook."""
        entry = self._entries.get(key)
        return entry.builds if entry is not None else 0

    def invalidate(self, key: str | None = None) -> None:
        """Drop one key (or all): unpersist + forget."""
        keys = [key] if key is not None else list(self._entries)
        for k in keys:
            e = self._entries.pop(k, None)
            if e is not None:
                e.df.unpersist()
