"""Skew mitigation for hot-key joins: explicit salting.

AQE's skew-join split handles sort-merge skew when statistics surface
it, and ``broadcast()`` removes the shuffle when the dim fits in memory.
The remaining case — a dimension too large to broadcast joined on keys
hot enough that one reducer drowns (the Zipf head of a web corpus's
domains, a handful of event types over billions of events) — needs
salting: split each hot fact key across ``n_salts`` reducers and
replicate the matching dim rows to all of them.

The fact side gets a salt the dim side can reproduce without data
motion: ``pmod(md5(key), n) `` would collide all rows of one key onto
one salt again, so the salt must come from *row* identity, not key
identity — ``monotonically_increasing_id`` routes rows of the same key
round-robin-ish across salts (the join result is invariant to the
routing, so its nondeterminism is harmless). The dim side explodes
``n_salts`` copies. Shuffle volume: facts unchanged, dim ×n_salts —
the classic trade.

Salted two-phase *aggregation* (the same idea for group-bys) lives in
``plans/vector_pipe.py`` (salted burn); this is the join-shaped twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``facts`` to ``dim`` on ``key`` with each key's fact rows
    spread over ``n_salts`` shuffle partitionings. Result is identical
    to ``facts.join(dim, key, how)``; only the physical routing
    changes. Supported ``how``: inner / left (dim must be unique per
    key for left semantics to match the plain join)."""
    if how not in ("inner", "left"):
        raise NotImplementedError("salted_join supports inner/left")
    salted_facts = facts.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_facts.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")
