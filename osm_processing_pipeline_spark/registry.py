"""Query registry: every implemented operator exposed as
(spark, sf_dir) -> DataFrame, plus its DuckDB oracle SQL twin.

This backs ``__spark_entry__.queries()`` / ``oracle_sql()``.  Column names and
types are aligned pairwise; all float-valued outputs are quantized to exact
integers (or derived from them deterministically) so value hashes match.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import worldspec as W
from .datagen import oracle, oracle_geom as og, world
from .operators import classify, knn, spatial_join

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# --------------------------------------------------------------------- q01
def _sql_road_type(r: str = "r") -> str:
    hw_list = ", ".join(f"'{h}'" for h in ("motorway", "trunk"))
    return (f"CASE WHEN {r}.ref IS NOT NULL AND upper({r}.ref) LIKE '%NH%' THEN 'NH' "
            f"WHEN {r}.ref IS NOT NULL AND upper({r}.ref) LIKE '%SH%' THEN 'SH' "
            f"WHEN {r}.ref IS NOT NULL AND upper({r}.ref) LIKE '%MDR%' THEN 'MDR' "
            f"WHEN {r}.highway IN ({hw_list}) THEN 'HW' "
            f"ELSE 'Other' END")


def _q01_sql() -> str:
    lenm = og.seg_len_m()
    piece = og.quantize_um(f"({og.seg_rect_frac()}) * ({lenm})")
    bik = ", ".join(f"'{h}'" for h in W.BIKABLE)
    rt = _sql_road_type("r")
    u, s, ru = ("COALESCE(p.urban_len_um, 0)", "COALESCE(p.semiurban_len_um, 0)",
                "COALESCE(p.rural_len_um, 0)")
    tot = f"({u} + {s} + {ru})"
    setting = (f"CASE WHEN {tot} = 0 THEN 'Rural' "
               f"WHEN {u} * 2 >= {tot} THEN 'Urban' "
               f"WHEN ({u} + {s}) * 2 >= {tot} THEN 'Semi_Urban' "
               f"ELSE 'Rural' END")
    return f"""{oracle.with_world('segs', 'grid')},
{og.cand_cells_ctes('segs')},
pieces AS (
  SELECT c.osm_id, c.grid_id, g.grid_class, {piece} AS piece_um
  FROM seg_cells c JOIN grid g USING (grid_id)
  WHERE {og.seg_rect_hit()}
),
per_road AS (
  SELECT osm_id,
         COUNT(DISTINCT grid_id) AS n_cells,
         SUM(CASE WHEN grid_class = 'Urban' THEN piece_um ELSE 0 END) AS urban_len_um,
         SUM(CASE WHEN grid_class = 'Semi_Urban' THEN piece_um ELSE 0 END) AS semiurban_len_um,
         SUM(CASE WHEN grid_class = 'Rural' THEN piece_um ELSE 0 END) AS rural_len_um
  FROM pieces GROUP BY osm_id
),
totals AS (
  SELECT osm_id, SUM({og.quantize_um(lenm)}) AS total_len_um FROM segs GROUP BY osm_id
)
SELECT r.osm_id, r.highway,
       {rt} AS road_type,
       r.highway IN ({bik}) AS bikable,
       CAST(COALESCE(p.n_cells, 0) AS BIGINT) AS n_cells,
       COALESCE(p.n_cells, 0) > 1 AS multi_grid,
       {setting} AS road_setting,
       {rt} || '_' || {setting} AS road_classification,
       CAST(COALESCE(t.total_len_um, 0) AS BIGINT) AS total_len_um,
       CAST({u} AS BIGINT) AS urban_len_um,
       CAST({s} AS BIGINT) AS semiurban_len_um,
       CAST({ru} AS BIGINT) AS rural_len_um
FROM roads_base r
LEFT JOIN totals t USING (osm_id)
LEFT JOIN per_road p USING (osm_id)"""


@register("q01_road_grid_classification", None)
def q01_road_grid_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship J1+A1+P6: road x grid cover join -> exact clip -> class rollup."""
    r = world.roads(spark, sf_dir)
    s = world.segments(spark, sf_dir, r)
    g = world.grids(spark)
    out = classify.classify_roads(r, s, g)
    longs = ["n_cells", "total_len_um", "urban_len_um", "semiurban_len_um",
             "rural_len_um"]
    for c in longs:
        out = out.withColumn(c, F.col(c).cast("long"))
    return out


ORACLES["q01_road_grid_classification"] = _q01_sql()


# --------------------------------------------------------------------- q02
def _q02_sql() -> str:
    cd = oracle.fl(W.CELL_DEG)
    rep = (f"GREATEST(0, LEAST({W.NY - 1}, CAST(floor(lat / {cd}) AS BIGINT))) * {W.NX} "
           f"+ GREATEST(0, LEAST({W.NX - 1}, CAST(floor(lon / {cd}) AS BIGINT)))")
    return f"""{oracle.with_world('segs', 'grid')},
{og.cand_cells_ctes('segs')},
pieces AS (
  SELECT c.osm_id, c.grid_id
  FROM seg_cells c JOIN grid g USING (grid_id)
  WHERE {og.seg_rect_hit()}
),
rep AS (
  SELECT osm_id, {rep} AS rep_cell FROM verts WHERE k = nv // 2
),
mins AS (SELECT osm_id, MIN(grid_id) AS min_cell FROM pieces GROUP BY osm_id)
SELECT rep.osm_id, rep.rep_cell, mins.min_cell
FROM rep LEFT JOIN mins USING (osm_id)"""


@register("q02_tile_assignment", None)
def q02_tile_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: deterministic tile assignment — representative-vertex cell (pure
    encode) + min intersecting cell (ORDER BY grid_id LIMIT 1 made associative,
    persona_v2_run.py:222-243)."""
    r = world.roads(spark, sf_dir)
    s = world.segments(spark, sf_dir, r)
    g = world.grids(spark)
    return classify.tile_assignment(r, s, g)


ORACLES["q02_tile_assignment"] = _q02_sql()


# --------------------------------------------------------------------- q03
def _q03_sql() -> str:
    cross = og.point_in_poly_crossing("v.lon", "v.lat", "e.x1", "e.y1", "e.x2", "e.y2")
    flag_cols = ",\n         ".join(
        f"MAX(CASE WHEN layer = '{l}' THEN 1 ELSE 0 END) = 1 AS in_{l}"
        for l in W.POLY_LAYERS
    )
    sel_flags = ",\n       ".join(
        f"COALESCE(h.in_{l}, FALSE) AS in_{l}" for l in W.POLY_LAYERS
    )
    return f"""{oracle.with_world('verts', 'feat_edges')},
pip_pairs AS (
  SELECT v.osm_id, f.feature_id, f.layer
  FROM verts v
  JOIN feats f ON f.is_poly
    AND v.lon >= f.cx - f.r AND v.lon <= f.cx + f.r
    AND v.lat >= f.cy - f.r AND v.lat <= f.cy + f.r
  JOIN feat_edges e ON e.feature_id = f.feature_id
  GROUP BY v.osm_id, v.k, v.lon, v.lat, f.feature_id, f.layer
  HAVING SUM({cross}) % 2 = 1
),
road_flags AS (
  SELECT osm_id,
         {flag_cols},
         COUNT(DISTINCT feature_id) AS n_poly_features
  FROM pip_pairs GROUP BY osm_id
)
SELECT r.osm_id,
       {sel_flags},
       CAST(COALESCE(h.n_poly_features, 0) AS BIGINT) AS n_poly_features
FROM roads_base r LEFT JOIN road_flags h USING (osm_id)"""


@register("q03_point_in_polygon_scenery", None)
def q03_point_in_polygon_scenery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/J11: vertex-in-polygon scenery flags via cell-cover PIP join;
    per-road max(exists) replaces the reference's iterative progressive
    filters (03_scenery_forest.sql:8-13 and friends)."""
    r = world.roads(spark, sf_dir)
    wn = world.way_nodes(spark, sf_dir, r).select(
        F.col("way_id").alias("osm_id"), "lon", "lat")
    polys = world.features(spark, sf_dir).filter(F.col("layer").isin(W.POLY_LAYERS))
    hits = spatial_join.point_in_polygon_join(wn, polys)
    aggs = [
        (F.max(F.when(F.col("layer") == l, 1).otherwise(0)) == 1).alias(f"in_{l}")
        for l in W.POLY_LAYERS
    ] + [F.countDistinct("feature_id").alias("n_poly_features")]
    flags = hits.groupBy("osm_id").agg(*aggs)
    out = r.select("osm_id").join(flags, "osm_id", "left")
    cols = [F.coalesce(F.col(f"in_{l}"), F.lit(False)).alias(f"in_{l}")
            for l in W.POLY_LAYERS]
    return out.select(
        "osm_id", *cols,
        F.coalesce(F.col("n_poly_features"), F.lit(0)).cast("long").alias("n_poly_features"))


ORACLES["q03_point_in_polygon_scenery"] = _q03_sql()


# --------------------------------------------------------------------- q04
def _q04_sql() -> str:
    def hits(layer: str, d: float, name: str) -> str:
        dd = oracle.fl(d)
        d2 = og.seg_point_dist2("s.ax", "s.ay", "s.bx", "s.by", "f.cx", "f.cy")
        return f"""{name} AS (
  SELECT s.osm_id, COUNT(DISTINCT f.feature_id) AS n
  FROM segs s JOIN feats f ON f.layer = '{layer}'
    AND f.cx >= LEAST(s.ax, s.bx) - {dd} AND f.cx <= GREATEST(s.ax, s.bx) + {dd}
    AND f.cy >= LEAST(s.ay, s.by) - {dd} AND f.cy <= GREATEST(s.ay, s.by) + {dd}
  WHERE {d2} <= {dd} * {dd}
  GROUP BY s.osm_id
)"""

    return f"""{oracle.with_world('segs', 'feats')},
{hits('hills_nodes', W.DIST_HILL_DEG, 'hill_hits')},
{hits('mountain_pass', W.DIST_PASS_DEG, 'pass_hits')}
SELECT r.osm_id,
       h.osm_id IS NOT NULL AS near_hill,
       p.osm_id IS NOT NULL AS near_pass,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hills
FROM roads_base r
LEFT JOIN hill_hits h USING (osm_id)
LEFT JOIN pass_hits p USING (osm_id)"""


@register("q04_distance_join_scenery", None)
def q04_distance_join_scenery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: ST_DWithin(road, point feature, d) scenery flags — degree-space
    thresholds exactly as the reference uses them (04_scenery_hill.sql:7-26,
    11_mountain_pass.sql:8-14)."""
    r = world.roads(spark, sf_dir)
    s = world.segments(spark, sf_dir, r)
    feats = world.features(spark, sf_dir)

    def flag(layer: str, d: float) -> DataFrame:
        pts = feats.filter(F.col("layer") == layer).select("feature_id", "cx", "cy")
        j = spatial_join.distance_join_segments_points(s, pts, d)
        return j.groupBy("osm_id").agg(F.countDistinct("feature_id").alias("n"))

    hills = flag("hills_nodes", W.DIST_HILL_DEG)
    passes = flag("mountain_pass", W.DIST_PASS_DEG).withColumnRenamed("n", "np")
    return (
        r.select("osm_id")
        .join(hills, "osm_id", "left")
        .join(passes, "osm_id", "left")
        .select(
            "osm_id",
            F.col("n").isNotNull().alias("near_hill"),
            F.col("np").isNotNull().alias("near_pass"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_hills"),
        )
    )


ORACLES["q04_distance_join_scenery"] = _q04_sql()


# --------------------------------------------------------------------- q05
def _q05_sql() -> str:
    d2 = og.point_dist2("q.qx", "q.qy", "n.lon", "n.lat")
    return f"""{oracle.with_world('verts', 'qpts')},
nodes AS (SELECT DISTINCT node_id, lon, lat FROM verts),
cand AS (
  SELECT q.query_id, n.node_id, {d2} AS d2
  FROM qpts q CROSS JOIN nodes n
),
ranked AS (
  SELECT query_id, node_id, d2,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, node_id) AS rank
  FROM cand
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, node_id, d2
FROM ranked WHERE rank <= {W.KNN_K}"""


@register("q05_knn", None)
def q05_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: exact kNN via escalating k-ring expansion with ring-sufficiency
    proof; brute-force residue fallback."""
    q = world.query_points(spark, sf_dir)
    nodes = world.way_nodes(spark, sf_dir).select("node_id", "lon", "lat").distinct()
    out = knn.knn_join(q, nodes, W.KNN_K)
    return out.select("query_id", F.col("rank").cast("long").alias("rank"),
                      "node_id", "d2")


ORACLES["q05_knn"] = _q05_sql()


# --------------------------------------------------------------------- q06
def _q06_sql() -> str:
    return f"""{oracle.with_world('segs', 'grid')},
{og.cand_cells_ctes('segs')},
pieces AS (
  SELECT c.osm_id, c.grid_id
  FROM seg_cells c JOIN grid g USING (grid_id)
  WHERE {og.seg_rect_hit()}
),
cellcnt AS (SELECT grid_id, COUNT(DISTINCT osm_id) AS cnt FROM pieces GROUP BY grid_id),
allcells AS (
  SELECT g.grid_id, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
  FROM grid g LEFT JOIN cellcnt c USING (grid_id)
),
ring_i AS (
  SELECT grid_id AS src, grid_id % {W.NX} AS i, grid_id // {W.NX} AS j, cnt,
         unnest(generate_series(-2, 2)) AS di
  FROM allcells
),
contrib AS (
  SELECT (j + dj) * {W.NX} + (i + di) AS grid_id, cnt
  FROM (SELECT *, unnest(generate_series(-2, 2)) AS dj FROM ring_i)
  WHERE i + di BETWEEN 0 AND {W.NX - 1} AND j + dj BETWEEN 0 AND {W.NY - 1}
),
smooth AS (
  SELECT grid_id, SUM(cnt) AS ring_sum, COUNT(*) AS ring_cells
  FROM contrib GROUP BY grid_id
)
SELECT a.grid_id, a.cnt,
       CAST(s.ring_sum AS BIGINT) AS ring_sum,
       CAST(s.ring_cells AS BIGINT) AS ring_cells,
       CAST((s.ring_sum * 1000) // s.ring_cells AS BIGINT) AS smoothed_permille
FROM allcells a JOIN smooth s USING (grid_id)"""


@register("q06_kring_smoothing", None)
def q06_kring_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: neighborhood-smoothed road density per cell — the reference's
    reinforced-pressure self-join (06_compute_reinforced_pressure_chunked.sql:4-16)
    re-expressed as a computable k-ring contribution join (no geometric
    self-join, no skew: contributions fan out 25x then hash-agg)."""
    from .functions import cells as C

    r = world.roads(spark, sf_dir)
    s = world.segments(spark, sf_dir, r)
    g = world.grids(spark)
    pieces = spatial_join.segment_cell_pieces(s, g)
    cellcnt = pieces.groupBy("grid_id").agg(F.countDistinct("osm_id").alias("cnt"))
    allcells = (
        g.select("grid_id").join(cellcnt, "grid_id", "left")
        .select("grid_id", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"))
    )
    contrib = allcells.select(
        F.explode(C.kring(F.col("grid_id"), 2)).alias("grid_id"),
        F.col("cnt"),
    )
    smooth = contrib.groupBy("grid_id").agg(
        F.sum("cnt").alias("ring_sum"), F.count("*").alias("ring_cells"))
    return (
        allcells.join(smooth, "grid_id")
        .select(
            "grid_id", "cnt",
            F.col("ring_sum").cast("long").alias("ring_sum"),
            F.col("ring_cells").cast("long").alias("ring_cells"),
            F.expr("CAST((ring_sum * 1000) DIV ring_cells AS BIGINT)").alias("smoothed_permille"),
        )
    )


ORACLES["q06_kring_smoothing"] = _q06_sql()


# --------------------------------------------------------------------- q07
def _q07_sql() -> str:
    return f"""{oracle.with_world('verts')},
node_stats AS (
  SELECT node_id,
         COUNT(DISTINCT osm_id) AS n_ways,
         COUNT(DISTINCT highway) AS n_types,
         MAX(CASE WHEN k > 0 AND k < nv - 1 THEN 1 ELSE 0 END) AS mid
  FROM verts GROUP BY node_id
)
SELECT node_id, CAST(n_ways AS BIGINT) AS n_ways, CAST(n_types AS BIGINT) AS n_types,
       mid = 1 AS has_mid,
       CASE WHEN n_ways >= 4 THEN 'major'
            WHEN n_ways = 3 THEN 'three_way'
            ELSE 'crossing' END AS category
FROM node_stats
WHERE n_ways >= 2 AND (n_ways >= 3 OR n_types >= 2 OR mid = 1)"""


@register("q07_intersection_detection", None)
def q07_intersection_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: shared-node intersection detection + categorization
    (01_find_and_categorize_intersections_v2.sql:52-73): >=2 distinct ways AND
    (>=3 ways OR >=2 road types OR a mid-way crossing)."""
    wn = world.way_nodes(spark, sf_dir)
    stats = wn.groupBy("node_id").agg(
        F.countDistinct("way_id").alias("n_ways"),
        F.countDistinct("highway").alias("n_types"),
        F.max(F.when((F.col("seq") > 0) & (F.col("seq") < F.col("nv") - 1), 1)
              .otherwise(0)).alias("mid"),
    )
    out = stats.filter(
        (F.col("n_ways") >= 2)
        & ((F.col("n_ways") >= 3) | (F.col("n_types") >= 2) | (F.col("mid") == 1))
    )
    return out.select(
        "node_id",
        F.col("n_ways").cast("long").alias("n_ways"),
        F.col("n_types").cast("long").alias("n_types"),
        (F.col("mid") == 1).alias("has_mid"),
        F.when(F.col("n_ways") >= 4, "major")
         .when(F.col("n_ways") == 3, "three_way")
         .otherwise("crossing").alias("category"),
    )


ORACLES["q07_intersection_detection"] = _q07_sql()


# --------------------------------------------------------------------- q08
def _q08_sql() -> str:
    from .datagen.oracle import fl
    M = fl(W.M_PER_DEG)
    Q = fl(W.LEN_Q)
    win = int(W.SUPPRESS_M * 1.0e6)
    nconf = len(W.CONFLICT_TYPES)
    cut_hi = int(W.TWIST_CUT_HI * 1000)
    cut_lo = int(W.TWIST_CUT_LO * 1000)
    return f"""{oracle.with_world('verts')},
segd AS (
  SELECT osm_id, k, nv, lon, lat, node_id,
         (LEAD(lon) OVER w - lon) * {M} AS sdx,
         (LEAD(lat) OVER w - lat) * {M} AS sdy,
         LAG(lon) OVER w AS plon, LAG(lat) OVER w AS plat,
         LEAD(lon) OVER w AS nlon, LEAD(lat) OVER w AS nlat
  FROM verts WINDOW w AS (PARTITION BY osm_id ORDER BY k)
),
segq AS (
  SELECT *,
         CASE WHEN sdx IS NULL THEN 0
              ELSE CAST(floor(sqrt(sdx*sdx + sdy*sdy) * {Q}) AS BIGINT) END AS seg_um
  FROM segd
),
cumv AS (
  SELECT *,
         COALESCE(SUM(seg_um) OVER (PARTITION BY osm_id ORDER BY k
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM segq
),
conf AS (SELECT osm_id, cum AS ccum FROM cumv WHERE node_id % 97 < {nconf}),
interior AS (
  SELECT v.osm_id,
         (v.lon - v.plon) * {M} AS ux, (v.lat - v.plat) * {M} AS uy,
         (v.nlon - v.lon) * {M} AS wx, (v.nlat - v.lat) * {M} AS wy,
         (v.nlon - v.plon) * {M} AS cx_, (v.nlat - v.plat) * {M} AS cy_,
         EXISTS (SELECT 1 FROM conf c
                 WHERE c.osm_id = v.osm_id AND abs(v.cum - c.ccum) <= {win}) AS sup
  FROM cumv v WHERE v.k >= 1 AND v.k <= v.nv - 2
),
vert_metrics AS (
  SELECT osm_id, sup,
         sqrt(ux*ux + uy*uy) AS a,
         sqrt(wx*wx + wy*wy) AS b,
         sqrt(cx_*cx_ + cy_*cy_) AS c,
         abs(ux*wy - uy*wx) AS area2,
         (ux*wx + uy*wy) AS dot
  FROM interior
),
judged AS (
  SELECT osm_id, sup,
         CAST(floor(((a + b) / 2.0e0) * {Q}) AS BIGINT) AS contrib_um,
         NOT (dot > 0 AND area2 < {fl(W.SIN5)} * (a * b)) AS significant,
         (a > 0 AND b > 0 AND area2 > 0) AS nonzero,
         CASE WHEN area2 > 0 THEN (a * b * c) / (2.0e0 * area2) ELSE NULL END AS radius
  FROM vert_metrics
),
flags AS (
  SELECT osm_id, sup, contrib_um,
         significant AND nonzero AND radius <= {fl(W.SHARP_RADIUS_M)} AS sharp,
         significant AND nonzero AND radius <= {fl(W.BROAD_RADIUS_M)} AS broad0
  FROM judged
),
roll AS (
  SELECT osm_id,
         SUM(CASE WHEN sharp AND NOT sup THEN contrib_um ELSE 0 END) AS sharp_len_um,
         SUM(CASE WHEN broad0 AND NOT sharp AND NOT sup THEN contrib_um ELSE 0 END) AS broad_len_um,
         SUM(CASE WHEN sharp AND NOT sup THEN 1 ELSE 0 END) AS n_sharp,
         SUM(CASE WHEN broad0 AND NOT sharp AND NOT sup THEN 1 ELSE 0 END) AS n_broad,
         SUM(CASE WHEN sup THEN 1 ELSE 0 END) AS n_suppressed
  FROM flags GROUP BY osm_id
),
tot AS (SELECT osm_id, SUM(seg_um) AS total_len_um FROM segq GROUP BY osm_id)
SELECT r.osm_id,
       CAST(COALESCE(t.total_len_um, 0) AS BIGINT) AS total_len_um,
       CAST(COALESCE(o.sharp_len_um, 0) AS BIGINT) AS sharp_len_um,
       CAST(COALESCE(o.broad_len_um, 0) AS BIGINT) AS broad_len_um,
       CAST(COALESCE(o.n_sharp, 0) AS BIGINT) AS n_sharp,
       CAST(COALESCE(o.n_broad, 0) AS BIGINT) AS n_broad,
       CAST(COALESCE(o.n_suppressed, 0) AS BIGINT) AS n_suppressed,
       CAST(CASE WHEN COALESCE(t.total_len_um, 0) > 0
            THEN ((COALESCE(o.sharp_len_um, 0) * 2 + COALESCE(o.broad_len_um, 0)) * 1000)
                 // GREATEST(t.total_len_um, 1)
            ELSE 0 END AS BIGINT) AS twist_permille,
       CASE WHEN (CASE WHEN COALESCE(t.total_len_um, 0) > 0
                  THEN ((COALESCE(o.sharp_len_um, 0) * 2 + COALESCE(o.broad_len_um, 0)) * 1000)
                       // GREATEST(t.total_len_um, 1) ELSE 0 END) >= {cut_hi} THEN 'twisty'
            WHEN (CASE WHEN COALESCE(t.total_len_um, 0) > 0
                  THEN ((COALESCE(o.sharp_len_um, 0) * 2 + COALESCE(o.broad_len_um, 0)) * 1000)
                       // GREATEST(t.total_len_um, 1) ELSE 0 END) >= {cut_lo} THEN 'curvy'
            ELSE 'straight' END AS curve_class
FROM roads_base r
LEFT JOIN roll o USING (osm_id)
LEFT JOIN tot t USING (osm_id)"""


@register("q08_curvature", None)
def q08_curvature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W1/W2 + conflict suppression: per-way curvature rollup through the
    vectorized Arrow kernel (mapInPandas over nested vertex arrays — no
    shuffle; flat-vectorized numpy, no per-row Python)."""
    from .functions.curvature_kernel import OUT_SCHEMA, curvature_map_batches

    r = world.roads(spark, sf_dir).select(
        "osm_id",
        F.expr("transform(vertices, v -> v.lon)").alias("lons"),
        F.expr("transform(vertices, v -> v.lat)").alias("lats"),
        F.expr("transform(vertices, v -> v.node_id)").alias("node_ids"),
    )
    return r.mapInPandas(curvature_map_batches, schema=OUT_SCHEMA)


ORACLES["q08_curvature"] = _q08_sql()


# --------------------------------------------------------------------- q09
def _q09_sql() -> str:
    d = oracle.fl(W.ENDPOINT_DIST_DEG)
    d2 = og.point_dist2("e.lon", "e.lat", "h.hlon", "h.hlat")
    return f"""{oracle.with_world('verts')},
htypes AS (
  SELECT osm_id AS h_osm FROM roads_base
  WHERE ref IS NOT NULL AND (upper(ref) LIKE '%NH%' OR upper(ref) LIKE '%SH%'
                             OR upper(ref) LIKE '%MDR%')
),
hnodes AS (
  SELECT v.osm_id AS h_osm, v.lon AS hlon, v.lat AS hlat
  FROM verts v JOIN htypes t ON v.osm_id = t.h_osm
),
eps AS (
  SELECT osm_id, CASE WHEN k = 0 THEN 0 ELSE 1 END AS ep, lon, lat
  FROM verts WHERE k = 0 OR k = nv - 1
),
matches AS (
  SELECT DISTINCT e.osm_id, e.ep
  FROM eps e JOIN hnodes h ON h.h_osm != e.osm_id
    AND h.hlon >= e.lon - {d} AND h.hlon <= e.lon + {d}
    AND h.hlat >= e.lat - {d} AND h.hlat <= e.lat + {d}
  WHERE {d2} <= {d} * {d}
),
per_road AS (
  SELECT osm_id,
         MAX(CASE WHEN ep = 0 THEN 1 ELSE 0 END) = 1 AS near0,
         MAX(CASE WHEN ep = 1 THEN 1 ELSE 0 END) = 1 AS near1
  FROM matches GROUP BY osm_id
)
SELECT r.osm_id,
       COALESCE(p.near0, FALSE) AS near0,
       COALESCE(p.near1, FALSE) AS near1,
       COALESCE(p.near0, FALSE) AND COALESCE(p.near1, FALSE) AS hadj_upgrade
FROM roads_base r LEFT JOIN per_road p USING (osm_id)"""


@register("q09_endpoint_proximity_upgrade", None)
def q09_endpoint_proximity_upgrade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: HAdj upgrade — both road endpoints within d of an NH/SH/MDR road's
    vertices (07_assign_final_road_classification.sql:63-97), via k-ring
    candidate join + exact d^2 refine."""
    from .functions import cells as C
    from .functions import geometry as G

    r = world.roads(spark, sf_dir)
    up = F.upper(F.col("ref"))
    hn = (
        r.filter(F.col("ref").isNotNull()
                 & (up.contains("NH") | up.contains("SH") | up.contains("MDR")))
        .select(F.col("osm_id").alias("h_osm"), F.explode("vertices").alias("v"))
        .select("h_osm", F.col("v.lon").alias("hlon"), F.col("v.lat").alias("hlat"))
    )
    d = W.ENDPOINT_DIST_DEG
    import math
    ring = int(math.ceil(d / W.CELL_DEG))
    hn_cov = hn.withColumn(
        "_cell", F.explode(C.disk_cover_of_point(F.col("hlon"), F.col("hlat"), d)))
    eps = r.select(
        "osm_id",
        F.explode(F.array(
            F.struct(F.lit(0).alias("ep"),
                     F.element_at("vertices", 1)["lon"].alias("lon"),
                     F.element_at("vertices", 1)["lat"].alias("lat")),
            F.struct(F.lit(1).alias("ep"),
                     F.element_at("vertices", -1)["lon"].alias("lon"),
                     F.element_at("vertices", -1)["lat"].alias("lat")),
        )).alias("e"),
    ).select("osm_id", "e.ep", "e.lon", "e.lat")
    eps = eps.withColumn("_cell", C.cell_of_point(F.col("lon"), F.col("lat")))
    cand = eps.join(hn_cov, "_cell").filter(F.col("h_osm") != F.col("osm_id"))
    d2 = G.point_dist2_deg(F.col("lon"), F.col("lat"), F.col("hlon"), F.col("hlat"))
    matches = cand.filter(d2 <= F.lit(d) * F.lit(d)).select("osm_id", "ep").distinct()
    per_road = matches.groupBy("osm_id").agg(
        (F.max(F.when(F.col("ep") == 0, 1).otherwise(0)) == 1).alias("near0"),
        (F.max(F.when(F.col("ep") == 1, 1).otherwise(0)) == 1).alias("near1"),
    )
    out = r.select("osm_id").join(per_road, "osm_id", "left")
    n0 = F.coalesce(F.col("near0"), F.lit(False))
    n1 = F.coalesce(F.col("near1"), F.lit(False))
    return out.select("osm_id", n0.alias("near0"), n1.alias("near1"),
                      (n0 & n1).alias("hadj_upgrade"))


ORACLES["q09_endpoint_proximity_upgrade"] = _q09_sql()


# --------------------------------------------------------------------- q10
def _pixels_cte() -> str:
    n = W.RASTER_PX
    lo, hi = W.URBAN_PX_LO, W.URBAN_PX_HI
    return f"""pixels AS (
  SELECT px, unnest(generate_series(0, {n - 1})) AS py,
         NULL AS _y
  FROM (SELECT unnest(generate_series(0, {n - 1})) AS px)
),
pixvals AS (
  SELECT px, py,
         (px*37 + py*73) % 100
           + CASE WHEN px >= {lo} AND px < {hi} AND py >= {lo} AND py < {hi}
                  THEN {W.URBAN_POP_BOOST} ELSE 0 END AS pop,
         (px*91 + py*17) % 50 AS built
  FROM pixels
)"""


def _q10_sql() -> str:
    ppc = W.PX_PER_CELL
    return f"""WITH {_pixels_cte()}
SELECT (py // {ppc}) * {W.NX} + (px // {ppc}) AS grid_id,
       CAST(SUM(pop) AS BIGINT) AS pop_sum,
       CAST(SUM(built) AS BIGINT) AS built_sum
FROM pixvals
GROUP BY 1"""


@register("q10_zonal_stats", None)
def q10_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6/A2: per-grid-cell zonal band sums decoded from real binary raster
    tiles (ST_Clip + ST_SummaryStats path, 03_zonal_pop_count_chunked.sql:4-12)."""
    from .operators import zonal
    from .sources.raster import raster_tiles

    return zonal.zonal_cell_sums(raster_tiles(spark))


ORACLES["q10_zonal_stats"] = _q10_sql()


# --------------------------------------------------------------------- q11
def _q11_sql() -> str:
    n = W.RASTER_PX
    lo, hi = W.URBAN_PX_LO, W.URBAN_PX_HI
    return f"""{oracle.with_world('verts')},
rep AS (
  SELECT osm_id,
         GREATEST(0, LEAST({n - 1}, CAST(floor(lon * {n}) AS BIGINT))) AS px,
         GREATEST(0, LEAST({n - 1}, CAST(floor(lat * {n}) AS BIGINT))) AS py
  FROM verts WHERE k = nv // 2
)
SELECT osm_id,
       CAST((px*37 + py*73) % 100
            + CASE WHEN px >= {lo} AND px < {hi} AND py >= {lo} AND py < {hi}
                   THEN {W.URBAN_POP_BOOST} ELSE 0 END AS BIGINT) AS pop_value
FROM rep"""


@register("q11_raster_point_sample", None)
def q11_raster_point_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: ST_Value(rast, pt) at each road's representative vertex — point ->
    tile equi-join + vectorized pixel gather from binary tiles
    (hill_v2/03_compute_relief_from_raster.sql:17-56)."""
    from .operators import zonal
    from .sources.raster import raster_tiles

    r = world.roads(spark, sf_dir)
    mid = (F.floor(F.size("vertices") / 2) + 1).cast("int")
    pts = r.select(
        "osm_id",
        F.element_at("vertices", mid)["lon"].alias("lon"),
        F.element_at("vertices", mid)["lat"].alias("lat"),
    )
    return zonal.sample_points(raster_tiles(spark), pts)


ORACLES["q11_raster_point_sample"] = _q11_sql()


# --------------------------------------------------------------------- q12
def _q12_sql() -> str:
    ppc = W.PX_PER_CELL
    fl = oracle.fl
    pdr = f"LEAST(pop_sum / {fl(W.POP_SAT_CELL)}, {fl(1.0)})"
    bur = f"LEAST(built_sum / {fl(W.BUILT_SAT_CELL)}, {fl(1.0)})"
    pressure = f"({fl(1.0)} - ({fl(1.0)} - {pdr}) * ({fl(1.0)} - {bur}))"
    return f"""WITH {_pixels_cte()},
cellsums AS (
  SELECT (py // {ppc}) * {W.NX} + (px // {ppc}) AS grid_id,
         CAST(SUM(pop) AS BIGINT) AS pop_sum,
         CAST(SUM(built) AS BIGINT) AS built_sum
  FROM pixvals GROUP BY 1
)
SELECT grid_id, pop_sum, built_sum,
       CAST(floor({pressure} * {fl(1.0e6)}) AS BIGINT) AS pressure_micro,
       CASE WHEN {pressure} >= {fl(W.PRESSURE_URBAN)} THEN 'urban'
            WHEN {pressure} >= {fl(W.PRESSURE_SEMI)} THEN 'semi_urban'
            ELSE 'rural' END AS pressure_class
FROM cellsums"""


@register("q12_urban_pressure", None)
def q12_urban_pressure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Urban pressure composition + classification over zonal sums
    (05_compute_urban_pressure.sql:12-16, 07_classify_urban_class.sql:8-15)."""
    from .operators import zonal
    from .sources.raster import raster_tiles

    return zonal.urban_pressure(zonal.zonal_cell_sums(raster_tiles(spark)))


ORACLES["q12_urban_pressure"] = _q12_sql()


# --------------------------------------------------------------------- q13
def _q13_sql() -> str:
    q = oracle.fl(W.COORD_Q)
    return f"""{oracle.with_world('verts')},
chk AS (
  SELECT osm_id,
         SUM(CAST(round(lon * {q}) AS BIGINT) + CAST(round(lat * {q}) AS BIGINT)) AS geom_checksum,
         MAX(CASE WHEN k = 0 THEN node_id END) AS first_node,
         MAX(CASE WHEN k = nv - 1 THEN node_id END) AS last_node
  FROM verts GROUP BY osm_id
)
SELECT 'way/' || CAST(r.osm_id AS VARCHAR) AS doc_id,
       r.osm_id, r.highway,
       CAST(2 + (CASE WHEN r.ref IS NOT NULL THEN 1 ELSE 0 END)
          + (CASE WHEN r.lanes IS NOT NULL THEN 1 ELSE 0 END)
          + r.nv + 1
          + (CASE WHEN r.a % 5 = 0 THEN 1 ELSE 0 END) AS INT) AS n_spans,
       CAST(r.nv AS INT) AS n_node_refs,
       r.a % 5 = 0 AS has_image,
       CAST(c.geom_checksum AS BIGINT) AS geom_checksum,
       c.first_node, c.last_node
FROM roads_base r JOIN chk c USING (osm_id)"""


@register("q13_interleaved_roundtrip", None)
def q13_interleaved_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S6 + span invariant: encode the world into interleaved text+media
    documents, parse back with pure array expressions, emit structural
    checksums the oracle recomputes relationally — proving the document codec
    end-to-end."""
    from .sources import documents as D

    r = world.roads(spark, sf_dir)
    docs = D.encode_road_documents(r)
    p = D.parse_road_documents(docs)
    chk = F.aggregate(
        F.col("vertices"), F.lit(0).cast("long"),
        lambda acc, v: acc + F.round(v["lon"] * float(W.COORD_Q)).cast("long")
        + F.round(v["lat"] * float(W.COORD_Q)).cast("long"))
    return p.select(
        "doc_id", "osm_id", "highway",
        F.col("n_spans").cast("int").alias("n_spans"),
        F.size("node_refs").cast("int").alias("n_node_refs"),
        "has_image",
        chk.alias("geom_checksum"),
        F.element_at("node_refs", 1).alias("first_node"),
        F.element_at("node_refs", -1).alias("last_node"),
    )


ORACLES["q13_interleaved_roundtrip"] = _q13_sql()
