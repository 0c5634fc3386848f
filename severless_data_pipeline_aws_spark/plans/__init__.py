"""Plan-inspection helpers: assert the physical properties the 100 TB
design relies on (pushdown, pruning, broadcast, top-k, shuffle counts)."""

from .inspect import (  # noqa: F401
    broadcast_join_count,
    exchange_count,
    explain_str,
    has_take_ordered,
    pushed_filters,
    read_schema_columns,
    single_partition_window_count,
    sort_merge_join_count,
    table_scan_count,
)
