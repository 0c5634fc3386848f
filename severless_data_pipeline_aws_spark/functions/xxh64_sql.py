"""Emit Spark's ``xxhash64`` as pure single-statement DuckDB SQL.

The driver's oracle connection is vanilla DuckDB — no Python UDFs — so
the xxhash64-tier operators (MinHash-LSH, SimHash, hashed
decontamination, count-min) can only be DRIVER-oracled if XXH64 itself
is expressible as plain SQL.  It is, but the SHAPE matters enormously
on DuckDB 1.0 (all measured in this repo):

* nested-lambda "lets" (``list_transform([e], v -> ...)``): correct but
  the optimizer needs 40-90 s to PLAN a single hash expression;
* lateral aliases: the binder expands them by TEXTUAL SUBSTITUTION, so
  chained hash steps (each referencing the previous 2-6x) explode
  exponentially and never finish;
* HUGEINT ``%``/``//`` by powers of two: real int128 divisions, ~50x
  slower than ``&``/``>>`` (14 s vs 0.28 s on the same 4M-step probe).

What works: one NESTED-SUBQUERY PROJECTION per hash step (planning is
instant, every step evaluated once, fully vectorized), all mod-2^64
arithmetic as masks/shifts on u64-in-HUGEINT values, and the
variable-length word fold as a RECURSIVE CTE whose per-row state is
four u64 columns — seeds ride along as ROWS, so hashing N strings
under K seeds is one (N*K)-row pipeline, not K expressions.

Arithmetic: a 64x64->64 product splits into 32-bit limbs
(``_mm``); each partial stays under 2^65, exact in int128.
Bit-exactness against ``F.xxhash64`` is anchored by the pure-Python
twin :mod:`.xxh64` (itself validated against Spark) and re-checked in
``tests/test_xxh64.py`` by evaluating this SQL in DuckDB.
"""

from __future__ import annotations

from .xxh64 import P1, P2, P3, P4, P5, SPARK_SEED

_M64 = (1 << 64) - 1  # u64 mask
_L32 = (1 << 32) - 1  # low-limb mask


def _mm(a: str, b: str) -> str:
    """(a*b) & 2^64-1 for u64 HUGEINT tokens, via 32-bit limbs.

    Fully parenthesized: DuckDB's ``&`` binds LOOSER than ``+``, so an
    unwrapped ``x & M`` embedded in ``(... + P4)`` would parse as
    ``x & (M + P4)``."""
    return (
        f"((((((({a}) >> 32) * (({b}) & {_L32}) + (({a}) & {_L32}) * (({b}) >> 32)) & {_L32}) << 32)"
        f" + (({a}) & {_L32}) * (({b}) & {_L32})) & {_M64})"
    )


def _rotl(a: str, r: int) -> str:
    """rotate-left for a u64 HUGEINT token."""
    return f"(((({a}) << {r}) & {_M64}) | (({a}) >> {64 - r}))"


def u64(expr: str) -> str:
    """signed BIGINT SQL expr -> u64 HUGEINT two's-complement image."""
    return f"(CAST({expr} AS HUGEINT) & {_M64})"


def _layers(base: str, steps: list[tuple[str, str]]) -> str:
    """One nested-subquery projection per step over ``base`` (a table
    name or parenthesized subquery).  Each step's expression may
    reference any column below it BY NAME — evaluated once, vectorized,
    no substitution blowup (DuckDB prunes the unused carry columns)."""
    q = base
    for name, expr in steps:
        q = f"(SELECT *, {expr} AS {name} FROM {q})"
    return q


def _step8(h: str, k: str, pfx: str) -> tuple[list[tuple[str, str]], str]:
    """One 8-byte-word round: h' = rotl27(h ^ rotl31(k*P2)*P1)*P1 + P4."""
    return [
        (f"{pfx}m", _mm(k, str(P2))),
        (f"{pfx}r", _rotl(f"{pfx}m", 31)),
        (f"{pfx}p", _mm(f"{pfx}r", str(P1))),
        (f"{pfx}x", f"xor({h}, {pfx}p)"),
        (f"{pfx}q", _rotl(f"{pfx}x", 27)),
        (f"{pfx}h", f"({_mm(f'{pfx}q', str(P1))} + {P4}) & {_M64}"),
    ], f"{pfx}h"


def _fmix(h: str, pfx: str) -> tuple[list[tuple[str, str]], str]:
    return [
        (f"{pfx}fa", f"xor({h}, ({h}) >> 33)"),
        (f"{pfx}fb", _mm(f"{pfx}fa", str(P2))),
        (f"{pfx}fc", f"xor({pfx}fb, {pfx}fb >> 29)"),
        (f"{pfx}fd", _mm(f"{pfx}fc", str(P3))),
        (f"{pfx}fe", f"xor({pfx}fd, {pfx}fd >> 32)"),
    ], f"{pfx}fe"


def _signed(h: str) -> str:
    return f"CAST(CASE WHEN {h} >= {1 << 63} THEN {h} - {1 << 64} ELSE {h} END AS BIGINT)"


def _byte(off_expr: str, guarded: bool = False) -> str:
    """Byte at 0-based offset of the staged hex column ``hx``."""
    raw = f"CAST(CAST(('0x' || substr(hx, CAST(2*({off_expr})+1 AS INT), 2)) AS INT) AS HUGEINT)"
    if guarded:
        return f"(CASE WHEN ({off_expr}) + 1 <= n THEN {raw} ELSE 0::HUGEINT END)"
    return raw


def _w8(off_expr: str) -> str:
    """8-byte little-endian word at 0-based byte offset (in-range)."""
    return "(" + " + ".join(
        f"({_byte(f'({off_expr}) + {j}')} << {8 * j})" for j in range(8)
    ) + ")"


def rec_hash_ctes(p: str, raw_hex: bool = False) -> str:
    """CTE definitions (splice into a ``WITH RECURSIVE``) computing
    Spark ``xxhash64`` over UTF-8 bytes with PER-ROW seeds.

    Expects an existing CTE/table ``{p}_src(k, tag, seed, s)``:
    ``k`` the join-back key, ``tag`` a BIGINT label carried through
    (e.g. the hash-family index), ``seed`` the u64 HUGEINT seed, ``s``
    the string.  Emits ``{p}_out(k, tag, h, hsig)`` with ``h`` u64
    HUGEINT and ``hsig`` Spark's signed BIGINT.

    ``raw_hex=True`` hashes arbitrary BYTES instead: ``s`` is then the
    hex encoding of the payload (2 chars/byte, e.g. a substr of a
    staged digest chain) — the path for BINARY-column fingerprints
    whose bytes are not valid UTF-8."""
    if raw_hex:
        stage = """
               s AS hx,
               CAST(len(s) // 2 AS INT) AS n,
               CAST(len(s) // 2 AS INT) // 8 AS nw,
               CAST(len(s) // 2 AS INT) // 32 AS ns"""
    else:
        stage = """
               hex(encode(s)) AS hx,
               CAST(octet_length(encode(s)) AS INT) AS n,
               CAST(octet_length(encode(s)) AS INT) // 8 AS nw,
               CAST(octet_length(encode(s)) AS INT) // 32 AS ns"""
    inp = f"""{p}_inp AS (
        SELECT k, tag, seed,{stage}
        FROM {p}_src
    )"""

    # --- stripe recursion (len >= 32 path; 0 iterations otherwise) ---
    vsteps: list[tuple[str, str]] = []
    for j, f in enumerate("abcd"):
        vsteps += [
            (f"sw{j}", _w8(f"32*si + {8 * j}")),
            (f"sm{j}", _mm(f"sw{j}", str(P2))),
            (f"sb{j}", f"(v{f} + sm{j}) & {_M64}"),
            (f"sr{j}", _rotl(f"sb{j}", 31)),
            (f"nv{f}", _mm(f"sr{j}", str(P1))),
        ]
    stripe = f"""{p}_stripe AS (
        SELECT k, tag, seed, hx, n, nw, ns, 0 AS si,
               (seed + {(P1 + P2) & _M64}) & {_M64} AS va,
               (seed + {P2}) & {_M64} AS vb,
               seed AS vc,
               (seed + {((1 << 64) - P1) & _M64}) & {_M64} AS vd
        FROM {p}_inp
        UNION ALL
        SELECT k, tag, seed, hx, n, nw, ns, si + 1, nva, nvb, nvc, nvd
        FROM {_layers(f'(SELECT * FROM {p}_stripe WHERE si < ns)', vsteps)}
    )"""

    # --- merge v1..v4 into the core hash, add length ---
    msteps: list[tuple[str, str]] = [
        ("ra", _rotl("va", 1)),
        ("rb", _rotl("vb", 7)),
        ("rc", _rotl("vc", 12)),
        ("rd", _rotl("vd", 18)),
        ("h0m", f"(ra + rb + rc + rd) & {_M64}"),
    ]
    hprev = "h0m"
    for j, f in enumerate("abcd"):
        msteps += [
            (f"gm{j}", _mm(f"v{f}", str(P2))),
            (f"gr{j}", _rotl(f"gm{j}", 31)),
            (f"gp{j}", _mm(f"gr{j}", str(P1))),
            (f"gx{j}", f"xor({hprev}, gp{j})"),
            (f"gh{j}", f"({_mm(f'gx{j}', str(P1))} + {P4}) & {_M64}"),
        ]
        hprev = f"gh{j}"
    core = f"""{p}_core AS (
        SELECT k, tag, seed, hx, n, nw, ns,
               ((CASE WHEN n >= 32 THEN {hprev} ELSE (seed + {P5}) & {_M64} END) + n) & {_M64} AS hcore
        FROM {_layers(f'(SELECT * FROM {p}_stripe WHERE si = ns)', msteps)}
    )"""

    # --- full 8-byte words beyond the stripes ---
    wsteps, wout = _step8("h", _w8("8*wi"), "w")
    words = f"""{p}_words AS (
        SELECT k, tag, hx, n, nw, 4*ns AS wi, hcore AS h FROM {p}_core
        UNION ALL
        SELECT k, tag, hx, n, nw, wi + 1, {wout} AS h
        FROM {_layers(f'(SELECT * FROM {p}_words WHERE wi < nw)', wsteps)}
    )"""

    # --- optional 4-byte word, <=3 tail bytes, fmix, sign ---
    b4 = " + ".join(f"({_byte(f'8*nw + {j}', guarded=True)} << {8 * j})" for j in range(4))
    tsteps: list[tuple[str, str]] = [
        ("has4", f"(n - 8*nw >= 4)"),
        ("k4", f"(CASE WHEN has4 THEN {b4} ELSE 0::HUGEINT END)"),
        ("u1", f"xor(h, (k4 * {P1}) & {_M64})"),
        ("u2", _rotl("u1", 23)),
        ("th0", f"(CASE WHEN has4 THEN ({_mm('u2', str(P2))} + {P3}) & {_M64} ELSE h END)"),
        ("toff", "8*nw + CASE WHEN has4 THEN 4 ELSE 0 END"),
    ]
    hprev = "th0"
    for j in range(3):
        tsteps += [
            (f"tb{j}", _byte(f"toff + {j}", guarded=True)),
            (f"tc{j}", f"xor({hprev}, (tb{j} * {P5}) & {_M64})"),
            (f"td{j}", _rotl(f"tc{j}", 11)),
            (f"te{j}", _mm(f"td{j}", str(P1))),
            (f"th{j + 1}", f"(CASE WHEN toff + {j} < n THEN te{j} ELSE {hprev} END)"),
        ]
        hprev = f"th{j + 1}"
    fsteps, fout = _fmix(hprev, "t")
    tail = f"""{p}_out AS (
        SELECT k, tag, {fout} AS h, {_signed(fout)} AS hsig
        FROM {_layers(f'(SELECT * FROM {p}_words WHERE wi = nw)', tsteps + fsteps)}
    )"""
    return ",\n        ".join([inp, stripe, core, words, tail])


def hash_long_chain_subquery(
    base: str, passthrough: list[str], values: list[str], out: str = "hl_sig",
    seed: int = SPARK_SEED,
) -> str:
    """Subquery over ``base`` computing Spark ``xxhash64(v1,..,vn)``
    (all LONG columns, left-to-right seed chaining) as signed BIGINT
    ``out``; its schema is ``passthrough + [out]``."""
    steps: list[tuple[str, str]] = []
    hprev: str | None = None
    for i, v in enumerate(values):
        seed_expr = f"{seed & _M64}::HUGEINT" if hprev is None else hprev
        steps.append((f"c{i}h0", f"({seed_expr} + {P5} + 8) & {_M64}"))
        s8, s8out = _step8(f"c{i}h0", u64(v), f"c{i}")
        steps += s8
        fx, fout = _fmix(s8out, f"c{i}")
        steps += fx
        hprev = fout
    q = _layers(base, steps)
    return f"(SELECT {', '.join(passthrough)}, {_signed(hprev)} AS {out} FROM {q})"


def hash_int_chain_subquery(
    base: str, passthrough: list[str], int_expr: str, seed_u64_col: str,
    out: str = "hi_sig",
) -> str:
    """Subquery over ``base`` computing ``hash_int(int_expr, seed)``
    where the seed is an existing u64 HUGEINT column (the
    ``xxhash64(string_col, int_col)`` tail)."""
    steps: list[tuple[str, str]] = [
        ("iv", f"(CAST({int_expr} AS HUGEINT) & {_L32})"),
        ("ih0", f"({seed_u64_col} + {P5} + 4) & {_M64}"),
        ("ix", f"xor(ih0, (iv * {P1}) & {_M64})"),
        ("ir", _rotl("ix", 23)),
        ("it", f"({_mm('ir', str(P2))} + {P3}) & {_M64}"),
    ]
    fx, fout = _fmix("it", "i")
    steps += fx
    q = _layers(base, steps)
    return f"(SELECT {', '.join(passthrough)}, {_signed(fout)} AS {out} FROM {q})"


def hash_long_seeded_subquery(
    base: str, passthrough: list[str], long_expr: str, seed_u64_col: str,
    out: str = "hl_sig",
) -> str:
    """Subquery over ``base`` computing ``hash_long(long_expr, seed)``
    where the seed is an existing u64 HUGEINT column — the
    ``xxhash64(string_cols..., long_col)`` tail (the 8-byte companion
    of :func:`hash_int_chain_subquery`)."""
    steps: list[tuple[str, str]] = [("s0h0", f"({seed_u64_col} + {P5} + 8) & {_M64}")]
    s8, s8out = _step8("s0h0", u64(long_expr), "s0")
    steps += s8
    fx, fout = _fmix(s8out, "s0")
    steps += fx
    q = _layers(base, steps)
    return f"(SELECT {', '.join(passthrough)}, {_signed(fout)} AS {out}, {fout} AS {out}_u64 FROM {q})"
