"""Geospatial operators: geohash encoding + grid-bucketed distance
join. Coordinates are synthesized deterministically from event keys
(the fixtures carry no lat/lon — same derivation as fn_geo_haversine)
so every key stays hash-checked against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import table
from ..operators.geo import (
    HAVERSINE_SQL,
    geohash_col,
    geohash_sql,
    haversine_km,
)
from ..registry import register

# deterministic world-spread coordinates from the event key (exact
# integer modulus -> one double division; identical in both engines)
_LAT_SQL = "(CAST(event_id * 2654435761 % 1600001 AS DOUBLE) / 10000.0) - 80.0"
_LON_SQL = "(CAST(event_id * 40503 % 3600001 AS DOUBLE) / 10000.0) - 180.0"


def _points(spark: SparkSession, sf_dir: str, every: int) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % every == 0)
    lat = (
        (F.col("event_id") * 2654435761 % 1600001).cast("double") / 10000.0
    ) - 80.0
    lon = ((F.col("event_id") * 40503 % 3600001).cast("double") / 10000.0) - 180.0
    return ev.select("event_id", lat.alias("lat"), lon.alias("lon"))


@register(
    "fn_geohash_encode",
    oracle=f"""
WITH pts AS (
  SELECT event_id, {_LAT_SQL} AS lat, {_LON_SQL} AS lon
  FROM events WHERE event_id % 29 = 0
)
SELECT event_id,
       ROUND(lat, 4) AS lat, ROUND(lon, 4) AS lon,
       {geohash_sql("lat", "lon", 8)} AS geohash8,
       {geohash_sql("lat", "lon", 4)} AS geohash4
FROM pts
""",
    tags=("geo", "function"),
)
def fn_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOHASH encoding as ~30 integer ops in whole-stage codegen (no
    UDF, no geo library): quantize lat/lon to 20 bits each, Morton-
    interleave via magic-mask bit spread, emit base32. Both engines
    run the identical integer recurrence (operators/geo.py builds the
    Spark Column and the DuckDB SQL from ONE mask table), so the hash
    check pins every bit. The 4-char prefix IS the spatial index: a
    prefix is a grid cell, shared prefixes mean nearby points — the
    property join_geo_bucket turns into a blocked distance join. At
    100 TB the encode is scan-local and the geohash column is the
    partition/sort key that gives spatial locality to object-store
    layouts."""
    pts = _points(spark, sf_dir, 29)
    return pts.select(
        "event_id",
        F.round("lat", 4).alias("lat"),
        F.round("lon", 4).alias("lon"),
        geohash_col(F.col("lat"), F.col("lon"), 8).alias("geohash8"),
        geohash_col(F.col("lat"), F.col("lon"), 4).alias("geohash4"),
    )


@register(
    "join_geo_bucket",
    oracle=f"""
WITH pts AS (
  SELECT event_id, {_LAT_SQL} AS lat, {_LON_SQL} AS lon
  FROM events WHERE event_id % 3 = 0
),
cells AS (
  SELECT event_id, lat, lon, {geohash_sql("lat", "lon", 3)} AS cell
  FROM pts
),
cand AS (
  SELECT a.event_id AS id_a, b.event_id AS id_b,
         a.lat AS lat1, a.lon AS lon1, b.lat AS lat2, b.lon AS lon2
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.event_id < b.event_id
)
SELECT id_a, id_b,
       ROUND({HAVERSINE_SQL.format(lat1="lat1", lon1="lon1",
                                   lat2="lat2", lon2="lon2")}, 3) AS km
FROM cand
WHERE {HAVERSINE_SQL.format(lat1="lat1", lon1="lon1",
                            lat2="lat2", lon2="lon2")} < 100.0
""",
    tags=("geo", "join"),
)
def join_geo_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRID-BUCKETED spatial distance join — the dedup-blocking
    pattern in space: candidates are pairs sharing a 3-char geohash
    cell (~1.4 deg — an equi-join on the cell string, never an
    all-pairs cross), then exact haversine adjudicates < 100 km.
    This is THE scalable shape for 'find nearby X' at 100 TB: the
    cell key shuffles points once, hot cells stay bounded by real
    geography, and the expensive trig runs only on blocked
    candidates. Boundary caveat (documented contract): a pair
    straddling two cells is not a candidate — production variants
    also probe the 8 neighbor cells, tripling the candidate factor,
    same plan shape. Both engines compute the identical trig
    expression tree; ROUND(...,3) (~1 m) absorbs ulp drift."""
    cells = _points(spark, sf_dir, 3).select(
        "event_id",
        "lat",
        "lon",
        geohash_col(F.col("lat"), F.col("lon"), 3).alias("cell"),
    )
    a = cells.select(
        F.col("cell"),
        F.col("event_id").alias("id_a"),
        F.col("lat").alias("lat1"),
        F.col("lon").alias("lon1"),
    )
    b = cells.select(
        F.col("cell"),
        F.col("event_id").alias("id_b"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
    )
    cand = a.join(b, "cell").filter(F.col("id_a") < F.col("id_b"))
    km = haversine_km(
        F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
    )
    return (
        cand.filter(km < 100.0)
        .select("id_a", "id_b", F.round(km, 3).alias("km"))
    )


@register(
    "join_geo_neighbor_probe",
    oracle=f"""
WITH pts AS (
  SELECT event_id, {_LAT_SQL} AS lat, {_LON_SQL} AS lon
  FROM events WHERE event_id % 3 = 0
),
cells AS (
  SELECT event_id, lat, lon,
         CAST(FLOOR(lat) AS BIGINT) AS ci, CAST(FLOOR(lon) AS BIGINT) AS cj
  FROM pts
),
probes AS (
  SELECT c.event_id, c.lat, c.lon, c.ci + di.d AS pi, c.cj + dj.d AS pj
  FROM cells c
  CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS d) di
  CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS d) dj
),
cand AS (
  SELECT a.event_id AS id_a, b.event_id AS id_b,
         a.lat AS lat1, a.lon AS lon1, b.lat AS lat2, b.lon AS lon2
  FROM probes a JOIN cells b ON a.pi = b.ci AND a.pj = b.cj
                AND a.event_id < b.event_id
)
SELECT id_a, id_b,
       ROUND({HAVERSINE_SQL.format(lat1="lat1", lon1="lon1",
                                   lat2="lat2", lon2="lon2")}, 3) AS km
FROM cand
WHERE {HAVERSINE_SQL.format(lat1="lat1", lon1="lon1",
                            lat2="lat2", lon2="lon2")} < 100.0
""",
    tags=("geo", "join"),
)
def join_geo_neighbor_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNDARY-COMPLETE spatial join: the same grid-blocking as
    join_geo_bucket but each point also PROBES the 8 neighbor cells
    of a 1-degree integer grid, so a pair straddling a cell edge is
    never missed — the standard completeness fix whose price is a
    bounded 9x probe-side fan-out (an explode of constant offsets,
    still an equi-join on the cell key, still never all-pairs). Each
    qualifying pair matches EXACTLY once (the probe offset is the
    cell-coordinate difference, which is unique per pair), so no
    dedup pass is needed — the property that keeps the plan one join
    + one filter. Coverage contract: every pair within ONE cell step
    is found (1 degree of latitude is ~111 km); near the poles a
    <100 km pair can still span >1 longitude cell because lon
    degrees narrow — production variants use latitude-banded cell
    widths, same algebra. This key pins the 9-cell probe mechanics
    under the hash. The shuffle key is the integer cell pair; hot
    cells are bounded by geography."""
    cells = _points(spark, sf_dir, 3).select(
        "event_id",
        "lat",
        "lon",
        F.floor("lat").cast("bigint").alias("ci"),
        F.floor("lon").cast("bigint").alias("cj"),
    )
    offsets = F.explode(
        F.array(*[F.lit(d) for d in (-1, 0, 1)])
    )
    probes = (
        cells.select("event_id", "lat", "lon", "ci", "cj", offsets.alias("di"))
        .select(
            "event_id", "lat", "lon", "ci", "cj", "di",
            F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])).alias("dj"),
        )
        .select(
            F.col("event_id").alias("id_a"),
            F.col("lat").alias("lat1"),
            F.col("lon").alias("lon1"),
            (F.col("ci") + F.col("di")).alias("pi"),
            (F.col("cj") + F.col("dj")).alias("pj"),
        )
    )
    b = cells.select(
        F.col("event_id").alias("id_b"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
        F.col("ci").alias("pi"),
        F.col("cj").alias("pj"),
    )
    cand = probes.join(b, ["pi", "pj"]).filter(F.col("id_a") < F.col("id_b"))
    km = haversine_km(
        F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
    )
    return cand.filter(km < 100.0).select(
        "id_a", "id_b", F.round(km, 3).alias("km")
    )
