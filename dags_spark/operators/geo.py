"""Geospatial primitives: geohash encoding and grid-bucketed spatial
joins — pure integer/trig expressions, no geo library.

Geohash = base32 over the bit-interleave (Morton order) of quantized
lon/lat. The interleave uses the classic magic-mask bit-spread, so
the whole encode is ~30 integer ops inside whole-stage codegen — no
UDF, no loop. The same spread feeds fn_zorder_key-style locality
bucketing; a geohash PREFIX is a spatial grid cell, which is what
makes distance joins blockable at scale (candidates = same-cell
pairs, verified by exact haversine — the dedup blocking pattern in
space).

Both a Spark Column builder and a DuckDB SQL text builder are
provided and mirror each other op-for-op: every intermediate is an
exact int64, so cross-engine equality is structural.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# magic masks spreading a 20-bit int onto even bit positions of 40
_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_col(x: Column) -> Column:
    for sh, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, sh))).bitwiseAND(F.lit(mask))
    return x


def _spread_sql(x: str) -> str:
    for sh, mask in _SPREAD:
        x = f"((({x}) | (({x}) << {sh})) & {mask})"
    return x


def geohash_col(lat: Column, lon: Column, precision: int = 8) -> Column:
    """Geohash of (lat, lon) as a Column — quantize each axis to 20
    bits, interleave (lon takes the MSB, per the geohash spec), emit
    `precision` base32 chars (<= 8 with 40 interleaved bits)."""
    # Clamp to 2^20-1: exactly lat=90 / lon=180 would quantize to
    # 2^20 (a 21st bit the spread masks silently drop, wrapping the
    # pole to -90/-180). Standard geohash pins the boundary to the
    # top cell instead.
    latb = F.least(
        F.floor((lat + 90.0) / 180.0 * 1048576.0).cast("bigint"), F.lit(1048575)
    )
    lonb = F.least(
        F.floor((lon + 180.0) / 360.0 * 1048576.0).cast("bigint"), F.lit(1048575)
    )
    v = F.shiftleft(_spread_col(lonb), 1).bitwiseOR(_spread_col(latb))
    alpha = F.array(*[F.lit(c) for c in BASE32])
    chars = [
        F.element_at(
            alpha,
            (F.shiftrightunsigned(v, 35 - 5 * i).bitwiseAND(F.lit(31)) + 1).cast(
                "int"
            ),
        )
        for i in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql(lat: str, lon: str, precision: int = 8) -> str:
    """The identical encode as DuckDB SQL text (same quantization,
    same masks, same char extraction)."""
    latb = f"LEAST(CAST(FLOOR((({lat}) + 90.0) / 180.0 * 1048576.0) AS BIGINT), 1048575)"
    lonb = f"LEAST(CAST(FLOOR((({lon}) + 180.0) / 360.0 * 1048576.0) AS BIGINT), 1048575)"
    v = f"(({_spread_sql(lonb)} << 1) | {_spread_sql(latb)})"
    chars = [
        f"substr('{BASE32}', CAST((({v} >> {35 - 5 * i}) & 31) + 1 AS INTEGER), 1)"
        for i in range(precision)
    ]
    return " || ".join(chars)


def haversine_km(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle km between two Column coordinate pairs (the
    asin-sqrt form — well-conditioned at small angles)."""
    a = (
        F.pow(F.sin(F.radians(lat2 - lat1) / 2), 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.pow(F.sin(F.radians(lon2 - lon1) / 2), 2)
    )
    return 2 * 6371.0088 * F.asin(F.sqrt(a))


HAVERSINE_SQL = (
    "2 * 6371.0088 * asin(sqrt("
    "pow(sin(radians(({lat2}) - ({lat1})) / 2), 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
)
