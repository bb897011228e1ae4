"""Salted joins for skewed keys.

The engine's first lines of skew defense are structural: aggregate-then-
join normalization (``functions/normalize.py``), hot-bucket caps on
candidate joins (``extensions/dedup.cap_hot_buckets``), and AQE's runtime
skew-join splitting (on by default in ``session.ENGINE_CONF``). Salting
is the remaining tool for the cases those can't reach:

- **stream-static joins** — AQE does not re-plan streaming queries, so a
  hot key in the static side funnels one task forever;
- **joins whose skewed side must stay row-granular** (no pre-aggregation
  possible) while the other side is small-but-not-broadcastable.

``salted_join`` splits every hot key's rows across ``salts`` sub-keys on
the skewed side and replicates the other side once per sub-key — turning
one straggler task into ``salts`` even ones at the cost of an
``salts``-times larger build side. Results are identical to the plain
join for any salt count (verified by test against the unsalted join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on column ``on``, with the skewed
    side's rows spread across ``salts`` sub-keys.

    The salt is derived from a hash of the row's key and Spark's
    monotonically-increasing id — any per-row assignment in
    ``[0, salts)`` yields the same join result, because ``other`` is
    replicated across every salt value; the hash just spreads rows
    evenly. ``how`` supports the join types where replicate-right is
    sound for a right side joined at most once per (key, salt):
    ``inner`` and ``left`` (outer/semi/anti would multiply or drop rows
    and are rejected).

    Cost model: the shuffled volume of the skewed side is unchanged (one
    extra tiny column); the other side shuffles ``salts``× — the
    standard trade of build-side duplication for even task sizes.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salts < 1:
        raise ValueError(f"salts must be >= 1, got {salts}")
    # The helper column would silently overwrite (and then drop) a caller
    # column of the same name, corrupting their data — fail loudly instead.
    for side, df in (("skewed", skewed), ("other", other)):
        if "_salt" in df.columns:
            raise ValueError(
                f"salted_join: {side} input already has a '_salt' column; "
                "rename it before joining"
            )
    salt = F.pmod(F.hash(F.col(on), F.monotonically_increasing_id()), F.lit(salts))
    left = skewed.withColumn("_salt", salt)
    right = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    out = left.join(right, [on, "_salt"], how)
    return out.drop("_salt")
