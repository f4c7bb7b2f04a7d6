"""Two-phase spatial joins: cell-cover equi-join -> exact refinement.

This is the engine's replacement for the reference's GIST-indexed nested-loop
spatial joins.  The coarse phase explodes a geometry's cell cover and
equi-joins on cell id (hash join, partition-prunable at scale); the fine phase
evaluates the exact predicate as a pure Catalyst expression — mirroring the
reference's `&&` bbox prefilter + ST_Intersects structure
(sql/road_classification/06_handle_roads_intersecting_multiple_grids.sql:11-33).

Scale notes (100 TB / 10^12 docs):
  * the grid dimension is broadcast when small; at planetary cell counts the
    join keys are co-partitioned by cell id (Iceberg partition-by-cell), so
    the cover join is a local join after one shuffle of the exploded side.
  * explode fans out by the cover size (<=4 here); dense-urban skew lives in
    the *per-cell* row counts, which AQE skew-split handles for the join; the
    downstream per-road aggregation keys on osm_id (uniform, no skew).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import cells, geometry as G


def segment_cell_pieces(segs: DataFrame, grid: DataFrame,
                        broadcast_grid: bool = True) -> DataFrame:
    """Join road segments to grid cells they intersect.

    Returns one row per (segment, cell) candidate that passes the exact
    seg/rect test, with ``piece_um`` = clipped in-cell length quantized to
    int64 micrometres (ST_Length(ST_Intersection(...)) of
    06_handle_roads...sql:21) — touching pieces keep piece_um = 0 but still
    count for cell membership (ST_Intersects semantics).
    """
    cand = segs.withColumn(
        "grid_id",
        F.explode(cells.segment_cover(F.col("ax"), F.col("ay"),
                                      F.col("bx"), F.col("by"))),
    )
    g = F.broadcast(grid) if broadcast_grid else grid
    j = cand.join(g, "grid_id")
    args = (F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"),
            F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"))
    hit = G.seg_rect_intersects(*args)
    frac = G.seg_rect_clip_frac(*args)
    seg_len = G.seg_len_m(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"))
    return (
        j.withColumn("hit", hit)
        .filter(F.col("hit"))
        .withColumn("piece_um", G.quantize_len_um(frac * seg_len))
    )


def polygon_candidates(pts: DataFrame, polys: DataFrame,
                       px: str = "lon", py: str = "lat") -> DataFrame:
    """Coarse phase of point x polygon joins: points keyed by their cell,
    polygons exploded over their bbox cover, equi-join on cell."""
    p = pts.withColumn("_cell", cells.cell_of_point(F.col(px), F.col(py)))
    q = polys.withColumn(
        "_cell",
        F.explode(cells.bbox_cover(F.col("xmin"), F.col("ymin"),
                                   F.col("xmax"), F.col("ymax"))),
    )
    return p.join(q, "_cell")


def point_in_polygon_join(pts: DataFrame, polys: DataFrame,
                          px: str = "lon", py: str = "lat") -> DataFrame:
    """Exact point-in-polygon join (crossing number refine) — the north-rule
    PIP operator (ST_Intersects point/polygon path,
    sql/road_scenery/03_scenery_forest.sql:8-13)."""
    cand = polygon_candidates(pts, polys, px, py)
    return cand.filter(G.point_in_poly(F.col(px), F.col(py), F.col("edges"))) \
               .drop("_cell")


def distance_join_segments_points(segs: DataFrame, feature_pts: DataFrame,
                                  radius_deg: float,
                                  fx: str = "cx", fy: str = "cy") -> DataFrame:
    """ST_DWithin(road segment, point feature, d): segment cells x feature
    disk cover equi-join, exact clamped-projection d^2 refine
    (sql/road_scenery/04_scenery_hill.sql:7-26 semantics)."""
    scov = segs.withColumn(
        "_cell", F.explode(cells.segment_cover(F.col("ax"), F.col("ay"),
                                               F.col("bx"), F.col("by"))))
    fcov = feature_pts.withColumn(
        "_cell", F.explode(cells.disk_cover_of_point(F.col(fx), F.col(fy), radius_deg)))
    cand = scov.join(fcov, "_cell")
    d2 = G.seg_point_dist2_deg(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"),
                               F.col(fx), F.col(fy))
    return cand.filter(d2 <= F.lit(radius_deg) * F.lit(radius_deg)).drop("_cell")


def distance_join_points(pts: DataFrame, feature_pts: DataFrame,
                         radius_deg: float,
                         px: str = "lon", py: str = "lat",
                         fx: str = "cx", fy: str = "cy") -> DataFrame:
    """ST_DWithin(point, feature_point, d) via k-ring expansion + exact d^2
    compare (no sqrt).  Ring radius ceil(d/cell) guarantees completeness."""
    p = pts.withColumn("_cell", cells.cell_of_point(F.col(px), F.col(py)))
    fcov = feature_pts.withColumn(
        "_cell", F.explode(cells.disk_cover_of_point(F.col(fx), F.col(fy), radius_deg)))
    cand = p.join(fcov, "_cell")
    d2 = G.point_dist2_deg(F.col(px), F.col(py), F.col(fx), F.col(fy))
    return cand.filter(d2 <= F.lit(radius_deg) * F.lit(radius_deg)).drop("_cell")
