"""Binned band join — the scale path for range predicates WITHOUT an
equi anchor (SURVEY §2.3 join_theta_range covers the anchored case).

Problem: ``a JOIN b ON |a.x - b.x| <= band`` has no equi key, so a
naive plan is BroadcastNestedLoopJoin — O(|a|*|b|) comparisons and a
broadcast of a whole side. At 100 TB that is not a slow plan, it is a
non-plan.

Strategy (the classic "binning" / grid rewrite used by every
spatial/temporal range-join engine): quantize the join value into
fixed-width bins of exactly ``band`` units. For a matching pair
``|x - y| <= band``, the bin ids differ by at most 1, so:

  - the RIGHT side is assigned its single bin  floor(y / band);
  - the LEFT side is exploded to the 3 candidate bins
    {floor(x/band) - 1, floor(x/band), floor(x/band) + 1};
  - an ordinary shuffled hash equi-join on ``bin`` produces every
    matching pair EXACTLY once (left appears in 3 distinct bins,
    right in exactly 1, and the true bin distance is <= 1);
  - the band predicate is re-checked as a residual filter.

Cost: 3x the left rows shuffled on an integer key + candidate pairs
~ |a|*|b| * (3*band / value_range) instead of |a|*|b|. The join is a
plain Exchange+SortMergeJoin/HashJoin, so AQE skew-split applies to
hot bins for free. Works for any totally-ordered numeric; for
timestamps pass ``unix_micros(ts)`` and a band in microseconds.

Determinism: all arithmetic is integer (caller quantizes doubles to
scaled BIGINT first — see ``queries/relational_ext.py:join_band_binned``
which joins on exact cents), so results are bit-identical across
engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["binned_band_join"]


def binned_band_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    band: int,
) -> DataFrame:
    """All pairs with ``|left[left_on] - right[right_on]| <= band``.

    ``left_on`` / ``right_on`` must be integer-typed (quantize doubles
    upstream — exactness of the residual comparison depends on it).
    Returns left columns + right columns (caller projects). ``band``
    must be >= 1; it is both the predicate width and the bin width.
    """
    if band < 1:
        raise ValueError(f"band must be a positive integer, got {band}")
    lo = F.col(left_on).cast("long")
    ro = F.col(right_on).cast("long")

    # Floor-division bin, exact in int64 for the full long range (no
    # double division): subtract the positive mod, then integer-divide.
    def _bin(name: str) -> Column:
        c = f"CAST({name} AS BIGINT)"
        return F.expr(f"({c} - pmod({c}, {band})) div {band}")

    l3 = left.withColumn(
        "__bin", F.explode(F.array(*[_bin(left_on) + d for d in (-1, 0, 1)]))
    )
    r1 = right.withColumn("__bin", _bin(right_on))
    return (
        l3.join(r1, "__bin")
        .filter(F.abs(lo - ro) <= band)
        .drop("__bin")
    )
