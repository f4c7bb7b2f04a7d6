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
from .operators import classify

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
