"""Bit-exactness of the XXH64 twins (Python + pure-SQL) vs Spark.

Three layers, each anchoring the next:

1. the pure-Python twin (:mod:`functions.xxh64`) vs ``F.xxhash64``
   itself — longs, ints, strings (incl. multibyte UTF-8, every length
   class: empty / word / 4-byte / tail / stripes), NULL skip, chaining;
2. the lambda-free DuckDB SQL emitters (:mod:`functions.xxh64_sql`)
   vs the Python twin over randomized inputs — this is what the
   driver-facing oracles of the xxhash64-tier queries are built from;
3. the ``spark_xxhash64`` DuckDB Python UDF registered by
   ``tests.oracle.duckdb_connect`` vs the twin.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from severless_data_pipeline_aws_spark.functions import xxh64 as X
from severless_data_pipeline_aws_spark.functions import xxh64_sql as XS

_STRS = [
    "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
    "abcdefghi", "hello world!", "x" * 31, "y" * 32, "z" * 33, "q" * 40,
    "w" * 45, "t" * 63, "t" * 64, "u" * 65, "m" * 100, "n" * 129,
    "héllo wörld ünïcode", "日本語テキスト", "emoji 🎉 test", "s3",
]
_LONGS = [0, 1, -1, 42, 2**63 - 1, -(2**63), 123456789123456789, -987654321]


def _rand_strings(n: int, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    alpha = "abcdefghij klmnopé日"
    return ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 130))) for _ in range(n)]


def test_python_twin_matches_spark(spark):
    df = spark.createDataFrame([(v,) for v in _LONGS], "v long")
    for r in df.select("v", F.xxhash64("v").alias("h")).collect():
        assert r.h == X.hash_long(r.v)

    strs = _STRS + _rand_strings(40)
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    for r in df.select("s", F.xxhash64("s").alias("h")).collect():
        assert r.h == X.hash_str(r.s)

    ints = [0, 1, -1, 2**31 - 1, -(2**31), 777]
    df = spark.createDataFrame([(v,) for v in ints], "v int")
    for r in df.select("v", F.xxhash64("v").alias("h")).collect():
        assert r.h == X.hash_int(r.v)

    # chained columns + NULL pass-through + literal tags
    data = [("foo", 5, "bar"), ("", -7, None), (None, None, "tail")]
    df = spark.createDataFrame(data, "a string, b long, c string")
    for r in df.select("a", "b", "c", F.xxhash64("a", "b", "c").alias("h")).collect():
        assert r.h == X.xxhash64(r.a, r.b, r.c)
    row = spark.createDataFrame([("shingle text",)], "sh string").select(
        F.expr("xxhash64('s3', sh)").alias("h")
    ).collect()[0]
    assert row.h == X.xxhash64("s3", "shingle text")


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_sql_rec_hash_matches_python(con):
    strs = _STRS + _rand_strings(60)
    seeds = [42, X.hash_str("s3") % (1 << 64), 0, (1 << 64) - 1]
    rows = [(s, i, sd) for s in strs for i, sd in enumerate(seeds)]
    con.execute(
        "CREATE OR REPLACE TABLE xxh_t AS SELECT * FROM (VALUES "
        + ",".join("(?, ?, ?::HUGEINT)" for _ in rows)
        + ") t(s, tag, seed)",
        [x for r in rows for x in (r[0], r[1], str(r[2]))],
    )
    q = f"""WITH RECURSIVE
        px_src AS (SELECT s AS k, tag, seed, s FROM xxh_t),
        {XS.rec_hash_ctes('px')}
        SELECT k, tag, hsig FROM px_out"""
    got = {(r[0], r[1]): r[2] for r in con.execute(q).fetchall()}
    for s, i, sd in rows:
        assert got[(s, i)] == X.hash_bytes(s.encode(), sd), (s, i, sd)


def test_sql_long_chain_matches_python(con):
    rng = random.Random(11)
    vals = [tuple(rng.randint(-2**63, 2**63 - 1) for _ in range(4)) for _ in range(40)]
    con.execute(
        "CREATE OR REPLACE TABLE xxh_l AS SELECT * FROM (VALUES "
        + ",".join("(?,?,?,?)" for _ in vals) + ") t(a,b,c,d)",
        [x for v in vals for x in v],
    )
    sub = XS.hash_long_chain_subquery("xxh_l", ["a", "b", "c", "d"], ["a", "b", "c", "d"], out="hh")
    got = {tuple(r[:4]): r[4] for r in con.execute(f"SELECT * FROM {sub}").fetchall()}
    for v in vals:
        assert got[v] == X.xxhash64(*v)


def test_sql_int_chain_matches_python(con):
    rows = [(e, i) for e in ("click", "view", "purchase") for i in range(3)]
    con.execute(
        "CREATE OR REPLACE TABLE xxh_i AS SELECT * FROM (VALUES "
        + ",".join("(?,?)" for _ in rows) + ") t(et, sd)",
        [x for r in rows for x in r],
    )
    sub = XS.hash_int_chain_subquery("cm_out", ["k", "tag"], "tag", "h", out="hh")
    q = f"""WITH RECURSIVE
        cm_src AS (SELECT et AS k, sd AS tag, 42::HUGEINT AS seed, et AS s FROM xxh_i),
        {XS.rec_hash_ctes('cm')}
        SELECT k, tag, hh FROM {sub}"""
    got = {(r[0], r[1]): r[2] for r in con.execute(q).fetchall()}
    for e, i in rows:
        assert got[(e, i)] == X.xxhash64(e, ("int", i))


def test_duckdb_udf_matches_python():
    from tests.oracle import duckdb_connect

    con = duckdb_connect("/root/testdata/sf0.001")
    strs = _STRS + _rand_strings(20, seed=3)
    got = [
        con.execute("SELECT spark_xxhash64_str(?)", [s]).fetchone()[0] for s in strs
    ]
    assert got == [X.hash_str(s) for s in strs]
    longs = _LONGS
    got = [con.execute("SELECT spark_xxhash64_long(?)", [v]).fetchone()[0] for v in longs]
    assert got == [X.hash_long(v) for v in longs]


def test_murmur3_long_matches_spark_hash(spark):
    """The Murmur3 twin must equal F.hash (seed 42) — it replays
    HashPartitioning partition ids inside oracles (batch packer)."""
    from pyspark.sql import functions as F

    from severless_data_pipeline_aws_spark.functions.xxh64 import murmur3_long

    vals = [0, 1, 2, 7, -1, 42, 2**62, -(2**62), 123456789123456789]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    for r in df.select("v", F.hash("v").alias("h")).collect():
        assert r.h == murmur3_long(r.v)


def test_sql_rec_hash_raw_hex_mode(con):
    """raw_hex=True hashes arbitrary BYTES given their hex encoding —
    the path for binary fingerprints (CDC chunk hashes)."""
    import hashlib

    payloads = [hashlib.md5(f"blob{i}".encode()).digest() * (i % 5 + 1) for i in range(12)]
    payloads.append(b"")
    rows = [(p.hex().upper(), i) for i, p in enumerate(payloads)]
    con.execute(
        "CREATE OR REPLACE TABLE xxh_b AS SELECT * FROM (VALUES "
        + ",".join("(?, ?)" for _ in rows) + ") t(hx, tag)",
        [x for r in rows for x in r],
    )
    q = f"""WITH RECURSIVE
        rb_src AS (SELECT tag AS k, tag, 42::HUGEINT AS seed, hx AS s FROM xxh_b),
        {XS.rec_hash_ctes('rb', raw_hex=True)}
        SELECT k, hsig FROM rb_out"""
    got = {r[0]: r[1] for r in con.execute(q).fetchall()}
    for i, p in enumerate(payloads):
        assert got[i] == X.hash_bytes(p), (i, len(p))
