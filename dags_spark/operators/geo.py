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


# inverse of _SPREAD: gather the even bit positions of a 40-bit int
# back into a dense 20-bit int (Morton decode)
_COMPACT = [
    (1, 0x3333333333333333),
    (2, 0x0F0F0F0F0F0F0F0F),
    (4, 0x00FF00FF00FF00FF),
    (8, 0x0000FFFF0000FFFF),
    (16, 0x00000000FFFFFFFF),
]


def _compact_col(x: Column) -> Column:
    x = x.bitwiseAND(F.lit(0x5555555555555555))
    for sh, mask in _COMPACT:
        x = (x.bitwiseOR(F.shiftright(x, sh))).bitwiseAND(F.lit(mask))
    return x


def _compact_sql(x: str) -> str:
    x = f"(({x}) & {0x5555555555555555})"
    for sh, mask in _COMPACT:
        x = f"((({x}) | (({x}) >> {sh})) & {mask})"
    return x


LAT_ERR = 90.0 / 1048576.0  # half-cell height of a 20-bit lat axis
LON_ERR = 180.0 / 1048576.0  # half-cell width of a 20-bit lon axis


def with_geohash_decoded(df, gh: str, precision: int = 8):
    """Decode the geohash column `gh` back to its cell CENTER
    (lat/lon) plus half-cell error bounds — the exact inverse of
    geohash_col: base32 chars -> 40-bit Morton value (array_position
    against the literal alphabet, shifted into place), de-interleave
    via the compact masks (even bits = lat, odd = lon, since lon took
    the MSB), un-quantize to the cell midpoint. Built as STAGED
    withColumns so the expression tree stays linear (a nested
    single-expression form duplicates the subtree 2^5 times).
    Adds columns: lat, lon, lat_err, lon_err."""
    alpha = F.array(*[F.lit(c) for c in BASE32])
    v = F.lit(0).cast("bigint")
    for i in range(precision):
        d = (F.array_position(alpha, F.substring(F.col(gh), i + 1, 1)) - 1).cast(
            "bigint"
        )
        v = v + d * F.lit(1 << (35 - 5 * i))
    df = df.withColumn("_ghv", v)
    la = F.col("_ghv").bitwiseAND(F.lit(0x5555555555555555))
    lo = F.shiftright("_ghv", 1).bitwiseAND(F.lit(0x5555555555555555))
    df = df.withColumn("_la", la).withColumn("_lo", lo)
    for sh, mask in _COMPACT:
        df = df.withColumn(
            "_la",
            (F.col("_la").bitwiseOR(F.shiftright("_la", sh))).bitwiseAND(
                F.lit(mask)
            ),
        ).withColumn(
            "_lo",
            (F.col("_lo").bitwiseOR(F.shiftright("_lo", sh))).bitwiseAND(
                F.lit(mask)
            ),
        )
    return (
        df.withColumn(
            "lat", (F.col("_la").cast("double") + 0.5) / 1048576.0 * 180.0 - 90.0
        )
        .withColumn(
            "lon", (F.col("_lo").cast("double") + 0.5) / 1048576.0 * 360.0 - 180.0
        )
        .withColumn("lat_err", F.lit(LAT_ERR))
        .withColumn("lon_err", F.lit(LON_ERR))
        .drop("_ghv", "_la", "_lo")
    )


def geohash_decode_ctes_sql(src: str, gh: str, precision: int = 8) -> str:
    """DuckDB CTE chain mirroring with_geohash_decoded op-for-op
    (same alphabet lookup, same shifts, same compact masks, same
    un-quantization arithmetic order). `src` is the name of an
    existing CTE/table holding column `gh`; returns text of the form
    `d0 AS (...), ..., dec AS (SELECT *, lat, lon, lat_err, lon_err
    FROM d5)` for splicing after a WITH. Linear size, like the
    staged Spark plan."""
    terms = " + ".join(
        f"(CAST(strpos('{BASE32}', substr({gh}, {i + 1}, 1)) AS BIGINT) - 1)"
        f" * {1 << (35 - 5 * i)}"
        for i in range(precision)
    )
    m55 = 0x5555555555555555
    parts = [
        f"gd0 AS (SELECT *, ({terms}) AS _ghv FROM {src})",
        f"gd1 AS (SELECT *, (_ghv & {m55}) AS la0,"
        f" ((_ghv >> 1) & {m55}) AS lo0 FROM gd0)",
    ]
    for j, (sh, mask) in enumerate(_COMPACT):
        parts.append(
            f"gd{j + 2} AS (SELECT *,"
            f" ((la{j} | (la{j} >> {sh})) & {mask}) AS la{j + 1},"
            f" ((lo{j} | (lo{j} >> {sh})) & {mask}) AS lo{j + 1} FROM gd{j + 1})"
        )
    n = len(_COMPACT)
    parts.append(
        f"gdec AS (SELECT *,"
        f" (CAST(la{n} AS DOUBLE) + 0.5) / 1048576.0 * 180.0 - 90.0 AS lat_c,"
        f" (CAST(lo{n} AS DOUBLE) + 0.5) / 1048576.0 * 360.0 - 180.0 AS lon_c,"
        f" {LAT_ERR!r} AS lat_err, {LON_ERR!r} AS lon_err FROM gd{n + 1})"
    )
    return ", ".join(parts)
