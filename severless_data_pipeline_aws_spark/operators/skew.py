"""Skew mitigation: salted joins (100 TB survival kit).

AQE's skew-join splitting (on in session.py) handles most skew at
runtime, but a join whose SINGLE hot key exceeds an executor still
needs salting: explode the hot side's key into ``key × salt`` and
replicate the other side across all salts, turning one giant partition
into ``n_salts`` even ones. The trade is a ``n_salts×`` replication of
the (smaller) right side — worth it exactly when one key dominates.

Exposed as a library function (not a registered query — the test
verifies result-equivalence with a plain join, which is the whole
contract) so any fact-fact join in the engine can opt in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to a hot key in ``skewed``.

    ``skewed`` rows get a uniform salt in [0, n_salts); ``other`` rows
    are replicated once per salt. Joining on (key, salt) splits every
    key's rows across ``n_salts`` partitions, bounding the largest
    partition at ~1/n_salts of the hot key.

    Only ``inner`` and ``left`` are salt-safe: an unmatched ``other``
    row appears once per salt replica, so right/full-outer results
    would multiply null-extensions by ``n_salts``.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(f"salted_join supports inner/left/left_semi, not {how!r}")
    salted_l = skewed.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    salted_r = other.withColumn("_salt", salts)
    out = salted_l.join(salted_r, [key, "_salt"], how)
    return out.drop("_salt")
