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


from ..operators.geo import (  # noqa: E402  (grouped with the geo family)
    geohash_decode_ctes_sql,
    with_geohash_decoded,
)


@register(
    "fn_geohash_decode",
    oracle=f"""
WITH pts AS (
  SELECT event_id, {_LAT_SQL} AS lat_orig, {_LON_SQL} AS lon_orig
  FROM events WHERE event_id % 31 = 0
),
ghx AS (
  SELECT event_id, lat_orig, lon_orig,
         {geohash_sql("lat_orig", "lon_orig", 8)} AS gh8
  FROM pts
),
{geohash_decode_ctes_sql("ghx", "gh8", 8)}
SELECT event_id, gh8,
       ROUND(lat_c, 6) AS lat_center, ROUND(lon_c, 6) AS lon_center,
       (ABS(lat_orig - lat_c) <= lat_err AND ABS(lon_orig - lon_c) <= lon_err)
         AS within_bounds
FROM gdec
""",
    tags=("geo", "function"),
)
def fn_geohash_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOHASH DECODE — the inverse twin of fn_geohash_encode: base32
    -> 40-bit Morton value -> de-interleaved 20-bit axes (the compact
    masks run the bit-spread backwards) -> cell CENTER plus half-cell
    error bounds. The key round-trips every sampled point through
    encode THEN decode and pins (a) the decoded center to 6dp and
    (b) the contract |original - center| <= error bound, per axis,
    for every row — the property that makes a geohash prefix usable
    as a bounding box at any precision. Both engines run the same
    staged mask algebra (operators/geo.py emits the Spark plan and
    the DuckDB CTE chain from ONE table — linear expression size;
    the naive nested form duplicates the subtree 2^5 times). Decode
    is scan-local integer work in whole-stage codegen: at 100 TB it
    runs where the data sits, no shuffle."""
    pts = _points(spark, sf_dir, 31).select(
        "event_id",
        F.col("lat").alias("lat_orig"),
        F.col("lon").alias("lon_orig"),
    )
    ghx = pts.withColumn(
        "gh8", geohash_col(F.col("lat_orig"), F.col("lon_orig"), 8)
    )
    dec = with_geohash_decoded(ghx, "gh8", 8)
    return dec.select(
        "event_id",
        "gh8",
        F.round("lat", 6).alias("lat_center"),
        F.round("lon", 6).alias("lon_center"),
        (
            (F.abs(F.col("lat_orig") - F.col("lat")) <= F.col("lat_err"))
            & (F.abs(F.col("lon_orig") - F.col("lon")) <= F.col("lon_err"))
        ).alias("within_bounds"),
    )


def _poly_edges() -> tuple[list, list]:
    """12 deterministic simple quads spread across the globe, as
    (edges, bboxes) literal rows shared by BOTH engines. Vertex
    coordinates carry 5th-decimal offsets so no synthesized point
    (1e-4 grid) ever lies exactly on a vertex y or an edge — the
    ray-cast comparisons never tie, so IEEE-identical expressions
    give identical booleans in Spark and DuckDB."""
    edges, bboxes = [], []
    for pid in range(12):
        cx = float(pid * 53 % 345) - 172.0 + 0.40003
        cy = float(pid * 37 % 130) - 65.0 + 0.30007
        verts = [
            (cx - 3.10003, cy - 2.20007),
            (cx + 4.20009, cy - 1.60001),
            (cx + 3.50007, cy + 2.70009),
            (cx - 2.40001, cy + 3.10003),
        ]
        xs = [v[0] for v in verts]
        ys = [v[1] for v in verts]
        bboxes.append((pid, min(xs), max(xs), min(ys), max(ys)))
        for i in range(4):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % 4]
            edges.append((pid, x1, y1, x2, y2))
    return edges, bboxes


_EDGES, _BBOXES = _poly_edges()
_EDGES_SQL = " UNION ALL ".join(
    f"SELECT {p} AS poly_id, {x1!r} AS x1, {y1!r} AS y1,"
    f" {x2!r} AS x2, {y2!r} AS y2"
    for p, x1, y1, x2, y2 in _EDGES
)
_BBOX_SQL = " UNION ALL ".join(
    f"SELECT {p} AS poly_id, {mnx!r} AS minx, {mxx!r} AS maxx,"
    f" {mny!r} AS miny, {mxy!r} AS maxy"
    for p, mnx, mxx, mny, mxy in _BBOXES
)


@register(
    "join_geo_point_in_polygon",
    oracle=f"""
WITH pts AS (
  SELECT event_id, {_LAT_SQL} AS lat, {_LON_SQL} AS lon
  FROM events WHERE event_id % 2 = 0
),
edges AS ({_EDGES_SQL}),
bbox AS ({_BBOX_SQL}),
cand AS (
  SELECT p.event_id, p.lat, p.lon, b.poly_id
  FROM pts p JOIN bbox b
    ON p.lon >= b.minx AND p.lon <= b.maxx
   AND p.lat >= b.miny AND p.lat <= b.maxy
),
crossings AS (
  SELECT c.event_id, c.poly_id, CAST(COUNT(*) AS BIGINT) AS n_crossings
  FROM cand c JOIN edges e ON c.poly_id = e.poly_id
  WHERE (e.y1 > c.lat) <> (e.y2 > c.lat)
    AND c.lon < (e.x2 - e.x1) * (c.lat - e.y1) / (e.y2 - e.y1) + e.x1
  GROUP BY c.event_id, c.poly_id
)
SELECT event_id, poly_id, n_crossings
FROM crossings WHERE n_crossings % 2 = 1
""",
    tags=("geo", "join"),
)
def join_geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-POLYGON join by ray casting against a BROADCAST
    polygon table: a point is inside iff a horizontal ray to +x
    crosses the polygon's edges an ODD number of times — computed
    relationally as points x bbox (broadcast range prefilter: the
    cheap rectangle test kills ~99% of pairs before any division)
    then points x edges (broadcast, 4 rows per surviving polygon)
    with the crossing predicate, a (point, polygon) count, and a
    parity filter. No UDF, no geometry library: the whole test is
    comparisons + one division in whole-stage codegen, and the
    polygon side is a handful of KB broadcast to every executor — at
    100 TB the points table streams through scan-local, shuffle-free
    until the tiny crossing-count agg. Vertex coordinates are offset
    to the 5th decimal so no 1e-4-grid point ties a vertex or edge
    (both engines' IEEE doubles then agree exactly). Concave and
    convex polygons work — parity is shape-agnostic."""
    pts = _points(spark, sf_dir, 2)
    edges = spark.createDataFrame(
        _EDGES, "poly_id INT, x1 DOUBLE, y1 DOUBLE, x2 DOUBLE, y2 DOUBLE"
    )
    bbox = spark.createDataFrame(
        _BBOXES, "poly_id INT, minx DOUBLE, maxx DOUBLE, miny DOUBLE, maxy DOUBLE"
    )
    cand = pts.join(
        F.broadcast(bbox),
        (pts.lon >= bbox.minx)
        & (pts.lon <= bbox.maxx)
        & (pts.lat >= bbox.miny)
        & (pts.lat <= bbox.maxy),
    ).select("event_id", "lat", "lon", "poly_id")
    crossed = cand.join(F.broadcast(edges), "poly_id").filter(
        ((F.col("y1") > F.col("lat")) != (F.col("y2") > F.col("lat")))
        & (
            F.col("lon")
            < (F.col("x2") - F.col("x1"))
            * (F.col("lat") - F.col("y1"))
            / (F.col("y2") - F.col("y1"))
            + F.col("x1")
        )
    )
    return (
        crossed.groupBy("event_id", "poly_id")
        .agg(F.count(F.lit(1)).alias("n_crossings"))
        .filter(F.col("n_crossings") % 2 == 1)
    )


@register(
    "fn_web_mercator_tile",
    oracle=f"""
WITH pts AS (
  SELECT event_id, {_LAT_SQL} AS lat, {_LON_SQL} AS lon
  FROM events WHERE event_id % 31 = 0
),
proj AS (
  SELECT event_id, lat, lon,
         FLOOR(ROUND((lon + 180.0) / 360.0 * 4096.0 * 1000000000.0, 0)
               / 1000000000.0) AS tx,
         FLOOR(ROUND((1.0 - LN(TAN(lat * 0.017453292519943295)
                               + 1.0 / COS(lat * 0.017453292519943295))
                          / 3.141592653589793) / 2.0 * 4096.0
                     * 1000000000.0, 0) / 1000000000.0) AS ty
  FROM pts
)
SELECT CAST(tx AS BIGINT) AS tile_x, CAST(ty AS BIGINT) AS tile_y,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(MIN(event_id) AS BIGINT) AS first_event
FROM proj GROUP BY tile_x, tile_y
""",
    tags=("geo", "function"),
)
def fn_web_mercator_tile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEB-MERCATOR TILE ASSIGNMENT (slippy z/x/y at zoom 12) — the
    map-industry standard cell id (what every tile server and
    geo-analytics rollup keys on), completing the spatial-key trio
    next to geohash (base32 Morton) and Hilbert: tile_x is linear in
    longitude; tile_y runs through the Mercator stretch
    ln(tan(lat) + sec(lat)). The stretch is transcendental, so the
    projection is QUANTIZED to a 1e-9 lane BEFORE the floor — the
    floor-at-a-boundary is the one place a last-ulp libm difference
    could flip a tile id, and the lane pin removes it (the same
    discipline every LN/EXP key in the repo follows). Half-degree
    latitudes from the fixture keep tan() well-conditioned
    (|lat| <= 80). Scan-local arithmetic -> one hash-agg per tile;
    the tile id is the shuffle key at any scale."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 31 == 0)
    lat = (
        (F.col("event_id") * 2654435761 % 1600001).cast("double") / 10000.0
    ) - 80.0
    lon = (
        (F.col("event_id") * 40503 % 3600001).cast("double") / 10000.0
    ) - 180.0
    rad = 0.017453292519943295  # pi/180: the standard mercator
    # stretch ln(tan(phi) + sec(phi)) takes phi in full radians.
    tx = F.floor(
        F.round((lon + 180.0) / 360.0 * 4096.0 * 1000000000.0, 0)
        / 1000000000.0
    )
    merc = F.log(
        F.tan(lat * rad) + 1.0 / F.cos(lat * rad)
    )
    ty = F.floor(
        F.round(
            (1.0 - merc / 3.141592653589793) / 2.0 * 4096.0 * 1000000000.0,
            0,
        )
        / 1000000000.0
    )
    proj = ev.select(tx.cast("bigint").alias("tile_x"), ty.cast("bigint").alias("tile_y"), "event_id")
    return proj.groupBy("tile_x", "tile_y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.min("event_id").cast("bigint").alias("first_event"),
    )


@register(
    "geo_tile_neighbor_smooth",
    oracle=f"""
WITH pts AS (
  SELECT event_id, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM events
),
proj AS (
  SELECT FLOOR(ROUND((lon + 180.0) / 360.0 * 16.0 * 1000000000.0, 0)
               / 1000000000.0) AS tx,
         FLOOR(ROUND((1.0 - LN(TAN(lat * 0.017453292519943295)
                               + 1.0 / COS(lat * 0.017453292519943295))
                          / 3.141592653589793) / 2.0 * 16.0
                     * 1000000000.0, 0) / 1000000000.0) AS ty
  FROM pts
),
tiles AS (
  SELECT CAST(tx AS BIGINT) AS tx, CAST(ty AS BIGINT) AS ty,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM proj GROUP BY tx, ty
),
offsets AS (
  SELECT dx.d AS dx, dy.d AS dy
  FROM (SELECT unnest(generate_series(-1, 1)) AS d) dx
  CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS d) dy
),
sm AS (
  SELECT t.tx, t.ty, t.n,
         CAST(SUM(COALESCE(nb.n, 0)) AS BIGINT) AS smooth_sum,
         CAST(SUM(CASE WHEN nb.n IS NULL THEN 0 ELSE 1 END) AS BIGINT)
           AS n_present
  FROM tiles t
  CROSS JOIN offsets o
  LEFT JOIN tiles nb
    ON nb.tx = (t.tx + o.dx + 16) % 16 AND nb.ty = t.ty + o.dy
  GROUP BY t.tx, t.ty, t.n
)
SELECT tx AS tile_x, ty AS tile_y, n AS n_points,
       smooth_sum, n_present,
       ROUND(smooth_sum / 9.0, 6) AS smoothed_density
FROM sm
""",
    tags=("geo",),
)
def geo_tile_neighbor_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPATIAL NEIGHBOR SMOOTHING on the web-mercator grid — the
    kernel-density-lite every geo heatmap ships: per zoom-4 tile,
    the 3x3 neighborhood sum/mean of point counts (x wraps around
    the antimeridian like longitude does; missing neighbors count
    zero, so ocean edges dilute honestly). The join geometry is the
    scalable pattern: tile counts first (ONE data-sized hash-agg),
    then a 9-offset literal spine replicates the GRID, not the
    points, and the neighbor lookup is an equi-join on tile keys —
    at 100 TB the smoothing costs 9x the tile-grid size, never 9x
    the data. Same quantized Mercator lane as fn_web_mercator_tile."""
    ev = table(spark, sf_dir, "events")
    lat = (
        (F.col("event_id") * 2654435761 % 1600001).cast("double") / 10000.0
    ) - 80.0
    lon = (
        (F.col("event_id") * 40503 % 3600001).cast("double") / 10000.0
    ) - 180.0
    rad = 0.017453292519943295
    tx = F.floor(
        F.round((lon + 180.0) / 360.0 * 16.0 * 1000000000.0, 0)
        / 1000000000.0
    ).cast("bigint")
    ty = F.floor(
        F.round(
            (
                1.0
                - F.log(F.tan(lat * rad) + 1.0 / F.cos(lat * rad))
                / 3.141592653589793
            )
            / 2.0
            * 16.0
            * 1000000000.0,
            0,
        )
        / 1000000000.0
    ).cast("bigint")
    tiles = (
        ev.select(tx.alias("tx"), ty.alias("ty"))
        .groupBy("tx", "ty")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    offsets = (
        spark.range(-1, 2)
        .select(F.col("id").cast("bigint").alias("dx"))
        .crossJoin(
            spark.range(-1, 2).select(F.col("id").cast("bigint").alias("dy"))
        )
    )
    nb = tiles.select(
        F.col("tx").alias("ntx"), F.col("ty").alias("nty"), F.col("n").alias("nn")
    )
    sm = (
        tiles.crossJoin(F.broadcast(offsets))
        .join(
            nb,
            (F.col("ntx") == (F.col("tx") + F.col("dx") + 16) % 16)
            & (F.col("nty") == F.col("ty") + F.col("dy")),
            "left",
        )
        .groupBy("tx", "ty", "n")
        .agg(
            F.sum(F.coalesce("nn", F.lit(0))).cast("bigint").alias("smooth_sum"),
            F.sum(F.when(F.col("nn").isNull(), 0).otherwise(1))
            .cast("bigint")
            .alias("n_present"),
        )
    )
    return sm.select(
        F.col("tx").alias("tile_x"),
        F.col("ty").alias("tile_y"),
        F.col("n").alias("n_points"),
        "smooth_sum",
        "n_present",
        F.round(F.col("smooth_sum") / 9.0, 6).alias("smoothed_density"),
    )
