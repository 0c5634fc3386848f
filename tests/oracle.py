"""Local replica of the driver's DuckDB-oracle comparison.

Runs the Spark query and the oracle SQL over the same parquet tables,
then compares row count, column names, and values order-insensitively.

DRIVER-FAITHFUL (round-5 verdict #2): the driver canonicalizes BOTH
results through pandas (``spark_df.toPandas()`` vs DuckDB ``res.df()``)
and hashes exact values — so dtype skew IS a mismatch there.  The
previous harness compared via ``fetchall()`` (DuckDB HUGEINT arrives as
a Python int) + ``math.isclose``, which masked the ``text_lang_stats``
bug for four rounds: DuckDB widens ``SUM(BIGINT)`` to HUGEINT, pandas
materializes HUGEINT as float64, and the driver saw ``19525.0`` vs
Spark's int64 ``19525``.  This harness therefore:

* reads the oracle through ``res.df()`` exactly like the driver;
* canonicalizes every cell to a ``(kind, value)`` pair where the kind
  distinguishes int from float — ``19525 == 19525.0`` in Python, but
  ``("int", 19525) != ("float", 19525.0)`` here;
* normalizes dates the way a pandas canon does: DuckDB DATE arrives as
  a midnight Timestamp while Spark DATE arrives as ``datetime.date`` —
  both canon to the same midnight ISO string;
* keeps ``require_rows`` (round-1's vacuous-pass lesson).

``tests/test_oracle_harness.py`` pins the contract: a deliberately
uncast integer SUM must FAIL this gate.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb
import numpy as np
import pandas as pd

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


def _canon_cell(v):
    """Canonical, hashable, dtype-tagged representation of one cell.

    The kind tag is the point: the driver's pandas value-hash treats
    int64 and float64 columns differently, so this canon must too.
    NULL and NaN collapse together (pandas puts NaN into float columns
    for SQL NULLs on both engines, so they are indistinguishable at the
    driver as well)."""
    if v is None or v is pd.NaT:
        return ("null", "")
    if isinstance(v, (np.bool_, bool)):
        return ("bool", bool(v))
    if isinstance(v, (np.integer, int)):
        return ("int", int(v))
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return ("null", "")
        return ("float", f)
    if isinstance(v, decimal.Decimal):
        return ("float", float(v))
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        return ("dt", v.isoformat())
    if isinstance(v, _dt.date):  # Spark DATE -> date; DuckDB DATE -> midnight ts
        return ("dt", v.isoformat() + "T00:00:00")
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v))
    if isinstance(v, str):
        return ("str", v)
    if isinstance(v, (np.ndarray, list, tuple, dict)):
        # r6 verdict #2: the driver's canonicalizer CRASHES on list/map
        # cells (pdf.sort_values -> factorize -> "unhashable type") —
        # canonicalizing them to hashable tuples here made this gate
        # lenient exactly where the driver is strict, hiding five
        # guaranteed driver red rows. Fail loudly instead: a registered
        # query's driver-facing output must be scalar-only (to_json or
        # explode at the wire; typed arrays stay in library APIs).
        raise TypeError(
            f"complex cell {type(v).__name__} reached the oracle canon — "
            "the driver's pandas canonicalizer would crash on this column; "
            "emit to_json(...) or explode to scalar rows at the wire"
        )
    return ("other", str(v))


def _canon_rows(pdf: pd.DataFrame) -> list[tuple]:
    """Rows as canonical tuples in sorted-column order, then sorted —
    the driver's order-insensitive canon (columns sorted by name, rows
    sorted by value)."""
    cols = sorted(pdf.columns)
    arr = pdf[cols].to_numpy(dtype=object)
    rows = [tuple(_canon_cell(c) for c in row) for row in arr]
    rows.sort(key=lambda t: tuple((k, repr(val)) for k, val in t))
    return rows


def compare(spark_df, con, sql, rel_tol=0.0, abs_tol=0.0, require_rows=False) -> list[str]:
    """Return a list of mismatch descriptions (empty == match).

    Exact by default (the driver hashes exact values).  ``rel_tol`` /
    ``abs_tol`` exist for exploratory use only — when nonzero, float
    pairs compare via ``math.isclose`` after the canonical sort.

    ``require_rows=True`` additionally rejects a 0 == 0 row match: a
    query whose predicate never fires "passes" while verifying nothing
    (round-1's join_anti/join_asof lesson) — the gate should say so."""
    errs: list[str] = []
    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(sql).df()

    s_cols, d_cols = sorted(s_pdf.columns), sorted(d_pdf.columns)
    if s_cols != d_cols:
        errs.append(f"columns differ: spark={s_cols} duckdb={d_cols}")
        return errs
    if len(s_pdf) != len(d_pdf):
        errs.append(f"row count differs: spark={len(s_pdf)} duckdb={len(d_pdf)}")
        return errs
    if require_rows and not len(s_pdf):
        errs.append("vacuous: both engines returned 0 rows — nothing verified")
        return errs

    s_rows = _canon_rows(s_pdf)
    d_rows = _canon_rows(d_pdf)
    loose = rel_tol > 0.0 or abs_tol > 0.0
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        if sr == dr:
            continue
        for j, (sc, dc) in enumerate(zip(sr, dr)):
            if sc == dc:
                continue
            if (
                loose
                and sc[0] in ("int", "float")
                and dc[0] in ("int", "float")
                and math.isclose(float(sc[1]), float(dc[1]), rel_tol=rel_tol, abs_tol=abs_tol)
            ):
                continue
            errs.append(f"row {i} col {s_cols[j]}: spark={sc!r} duckdb={dc!r}")
        if len(errs) > 8:
            errs.append("... (truncated)")
            break
    return errs
