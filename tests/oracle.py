"""Local replica of the driver's DuckDB-oracle comparison.

Runs the Spark query and the oracle SQL over the same parquet tables,
then compares row count, column names, and values order-insensitively
(floats with tolerance; the driver hashes exact values, so queries
should round floating aggregates — this harness additionally flags
exact-string mismatches as warnings via ``strict`` mode).
"""

from __future__ import annotations

import math

import duckdb

from severless_data_pipeline_aws_spark.io import TABLES, table_path


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    _register_xxh64_udfs(con)
    return con


def _register_xxh64_udfs(con: duckdb.DuckDBPyConnection) -> None:
    """Bit-exact ``F.xxhash64`` twins as DuckDB Python UDFs.

    Available ONLY in this local harness (the driver's connection is
    vanilla DuckDB — driver-facing oracles use the pure-SQL emitters in
    ``functions/xxh64_sql.py`` instead); these exist so local tests can
    state hash-level expectations directly in SQL."""
    from severless_data_pipeline_aws_spark.functions import xxh64 as X

    con.create_function(
        "spark_xxhash64_str", lambda s: X.hash_str(s), ["VARCHAR"], "BIGINT"
    )
    con.create_function(
        "spark_xxhash64_long", lambda v: X.hash_long(v), ["BIGINT"], "BIGINT"
    )


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _sorted_rows(cols, rows):
    """Rows as tuples ordered by sorted column name, then sorted."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(spark_df, con, sql, rel_tol=0.0, abs_tol=0.0, require_rows=False) -> list[str]:
    """Return a list of mismatch descriptions (empty == match).

    ``require_rows=True`` additionally rejects a 0 == 0 row match: a
    query whose predicate never fires "passes" while verifying nothing
    (round-1's join_anti/join_asof lesson) — the gate should say so."""
    errs: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        errs.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return errs
    if len(s_rows) != len(d_rows):
        errs.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
        return errs
    if require_rows and not s_rows:
        errs.append("vacuous: both engines returned 0 rows — nothing verified")
        return errs

    s_sorted = _sorted_rows(s_cols, s_rows)
    d_sorted = _sorted_rows(d_cols, d_rows)
    ncols = len(s_cols)
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for j in range(ncols):
            sv, dv = sr[j], dr[j]
            if sv is None and dv is None:
                continue
            if isinstance(sv, float) and isinstance(dv, (float, int)):
                if not math.isclose(sv, float(dv), rel_tol=rel_tol, abs_tol=abs_tol):
                    errs.append(f"row {i} col {j}: spark={sv!r} duckdb={dv!r}")
            elif sv != dv:
                # timestamps etc: compare stringified
                if str(sv) != str(dv):
                    errs.append(f"row {i} col {j}: spark={sv!r} duckdb={dv!r}")
        if len(errs) > 8:
            errs.append("... (truncated)")
            break
    return errs
