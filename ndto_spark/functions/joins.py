"""Skew-safe joins: explicit hot-key salting.

AQE's skew-join split only rebalances SORT-MERGE partitions after a
shuffle materializes; when one key is hot enough (a null-ish sentinel, a
default user, a crawler domain) the classic fix is salting — scatter the
hot key's left rows across N sub-keys and replicate ONLY the hot right
rows N ways, so the hot key runs as N parallel tasks instead of one
straggler. This composes with table_rules.join_skew_report, whose fan-out
table is exactly the hot-key input this operator wants.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_ndto_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    hot_keys: Sequence,
    n_salts: int = 16,
    how: str = "inner",
    salt_src: Optional[Column] = None,
) -> DataFrame:
    """Equi-join ``left`` with ``right`` on ``key_col``, salting the given
    hot keys ``n_salts`` ways. Result rows are identical to the plain
    join — only the physical distribution changes.

    ``hot_keys`` is a small driver-side list (take it from
    join_skew_report's output); only those right rows are replicated, so
    the replication cost is |hot_keys| × n_salts rows, not |right| ×
    n_salts. ``salt_src`` is any roughly-uniform per-row INT expression
    over the left side (default: xxhash64 of all left columns); the join
    RESULT does not depend on it — a poor source only costs spread.

    ``how`` ∈ {inner, left, left_outer}: an unmatched left row appears
    once regardless of its salt. Right/full outer joins are refused —
    replicated unmatched right rows would duplicate.

    100 TB shape: the hot key's probe rows hash across n_salts shuffle
    partitions; every build-side replica is one row per salt. No
    broadcast needed, no AQE dependence, deterministic plan.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if n_salts < 2:
        raise ValueError(f"n_salts must be >= 2, got {n_salts}")
    if not hot_keys:
        return left.join(right, on=key_col, how=how)
    hot = list(hot_keys)
    if salt_src is None:
        salt_src = F.xxhash64(*[F.col(c) for c in left.columns])
    lk = F.col(key_col)
    l2 = left.withColumn(
        _SALT,
        F.when(lk.isin(hot), F.pmod(salt_src, F.lit(n_salts)))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    rk = F.col(key_col)
    salts = F.when(
        rk.isin(hot), F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).otherwise(F.array(F.lit(0)))
    r2 = right.withColumn(_SALT, F.explode(salts)).withColumn(
        _SALT, F.col(_SALT).cast("int")
    )
    return l2.join(r2, on=[key_col, _SALT], how=how).drop(_SALT)
