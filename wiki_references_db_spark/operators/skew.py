"""Skew-mitigation operators: salted two-phase aggregation and salted
replicate-join.

AQE's skew-join splitting (on in session.py) handles most runtime skew;
these explicit forms cover the two cases AQE cannot:

- aggregation onto a HANDFUL of hot keys (e.g. 5 event types over
  billions of rows): a plain groupBy reduces onto <=5 tasks no matter
  how many executors exist.  Salting fans the reduce out to
  keys x n_salts partial states, then combines the partials — the
  classic two-phase/partial-aggregate pattern made explicit.
- a non-broadcastable join with a skewed build side, where the small
  side is replicated per salt so the hot key's rows spread over
  n_salts tasks.

Both transformations are result-identical to their unsalted forms for
decomposable aggregates (count/sum/min/max), which is proven by the
oracle-checked ``salted_skew_aggregate`` query.  Salt assignment is
deterministic (``pmod(xxhash64(salt_on), n)``) so plans replay stably.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    salt_on: str | Column,
    n_salts: int = 16,
    **partials: tuple[Column, Column],
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys.

    ``partials`` maps output column name -> (phase1 aggregate over raw
    rows, phase2 aggregate over the phase-1 column of the same name).
    Example::

        salted_aggregate(
            events, ["event_type"], "event_id",
            n_events=(F.count(F.lit(1)), F.sum("n_events")),
            total=(F.sum("value"), F.sum("total")),
        )
    """
    salt = F.pmod(F.xxhash64(F.col(salt_on) if isinstance(salt_on, str) else salt_on), F.lit(n_salts))
    phase1 = (
        df.withColumn(_SALT, salt)
        .groupBy(*keys, _SALT)
        .agg(*[p1.alias(name) for name, (p1, _) in partials.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[p2.alias(name) for name, (_, p2) in partials.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_on: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed join keys and ``small`` cannot
    be broadcast: ``small`` is replicated once per salt value, ``big``
    rows get a deterministic salt, and the join runs on
    ``on + [salt]`` — the hot key's rows land in n_salts partitions
    instead of one.

    Only ``inner`` and ``left`` are supported: the small side is
    replicated once per salt, so a right/full join would emit every
    unmatched small-side row ``n_salts`` times — silent corruption, not a
    slow path.  (For outer semantics, salt the other way around or
    deduplicate unmatched replicas explicitly.)"""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "replicated small side would duplicate unmatched rows under "
            "right/full outer semantics"
        )
    salt = F.pmod(F.xxhash64(F.col(salt_on) if isinstance(salt_on, str) else salt_on), F.lit(n_salts))
    big_salted = big.withColumn(_SALT, salt)
    small_rep = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("bigint"))
    return big_salted.join(small_rep, on + [_SALT], how).drop(_SALT)
