"""Physical-plan inspection (SURVEY layout: ``plans/``).

The scale contract of every operator in this engine is a property of
its PHYSICAL plan, not its output: filters must reach the parquet scan
(PushedFilters), projections must prune the read schema (ReadSchema),
small dimensions must broadcast, top-k must plan as
TakeOrderedAndProject, and shuffle (Exchange) counts must match the
operator's minimum. These helpers parse ``explain`` output so tests —
and users — can assert those properties instead of eyeballing plans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame) -> str:
    """Full physical plan string (post-AQE structure where available)."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _simple_plan(df: DataFrame) -> str:
    # keep only the current plan: after AQE finalizes, toString() appends
    # an "== Initial Plan ==" section that would double-count operators
    return df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        body = m.group(1).strip()
        if body:
            out.extend(f.strip() for f in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Column names read from disk (union over all scans)."""
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = _simple_plan(df)
    return len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan))


def broadcast_join_count(df: DataFrame) -> int:
    return _simple_plan(df).count("BroadcastHashJoin")


def sort_merge_join_count(df: DataFrame) -> int:
    return _simple_plan(df).count("SortMergeJoin")


def has_take_ordered(df: DataFrame) -> bool:
    """True when the sort+limit planned as top-k, not a global sort."""
    return "TakeOrderedAndProject" in _simple_plan(df)


def table_scan_count(df: DataFrame, table: str) -> int:
    """How many separate file scans read ``<table>.parquet``.

    DataFrame plans get no common-subplan reuse from Catalyst: a fact
    referenced from two branches is SCANNED twice. At 100 TB a second
    fact scan dwarfs most other costs, so single-scan is an assertable
    design property (decorrelate via window, not via self-join).
    """
    return len(re.findall(rf"Location:.*[/\\]{re.escape(table)}\.parquet", explain_str(df)))


def single_partition_window_count(df: DataFrame) -> int:
    """Window operators fed by a SinglePartition shuffle — the
    serialize-everything pattern Spark warns about ("No Partition
    Defined for Window operation"). Distinguished from the legitimate
    SinglePartition exchange under a final global aggregate by walking
    the plan tree: only Window ancestors count. A nonzero value is
    acceptable only when the window's input is provably metadata-scale
    (a per-bucket offsets table, a fixed grid).

    Parses the executed-plan tree string by indentation (the AQE
    wrapper hides children from the py4j node API): for each
    ``Exchange SinglePartition`` line, the nearest shaping ancestor
    (Window / Join / Aggregate / Union / TakeOrdered) decides whether
    this shuffle feeds a window."""
    lines = _simple_plan(df).splitlines()
    marker = re.compile(r"^[\s:+|-]*")
    depths = [len(marker.match(ln).group(0)) for ln in lines]
    n = 0
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        d = depths[i]
        for j in range(i - 1, -1, -1):
            if depths[j] >= d or not lines[j].strip():
                continue
            body = lines[j]
            if "Sort" in body and "Window" not in body:
                d = depths[j]  # pass through the window's sort
                continue
            if "Window" in body:
                n += 1
            break
    return n
