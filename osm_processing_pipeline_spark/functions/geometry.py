"""Exact geometric predicates as pure Catalyst expressions.

The engine's metric is a planar equirectangular projection (1 deg =
worldspec.M_PER_DEG m on both axes).  Every predicate below uses only IEEE
correctly-rounded operations (+, -, *, /, sqrt) so results are bit-identical
across engines (Spark JVM vs the DuckDB oracle) — the foundation of the exact
join-row parity requirement.

These are the refinement phase of the two-phase spatial joins:
  * seg_rect_* — ST_Intersects(line, grid cell) refine + ST_Length(ST_Intersection)
    (06_handle_roads_intersecting_multiple_grids.sql:16-33, :21)
  * point_in_poly / seg_seg_intersect — ST_Intersects(road, polygon layer)
    (03_scenery_forest.sql:8-13)
  * seg_point_dist2 — ST_DWithin(road, point feature, d)
    (04_scenery_hill.sql:7-26, 11_mountain_pass.sql:8-14)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..worldspec import M_PER_DEG

D = F.lit


def seg_rect_t_interval(ax: Column, ay: Column, bx: Column, by: Column,
                        x0: Column, y0: Column, x1: Column, y1: Column,
                        ) -> tuple[Column, Column]:
    """Liang-Barsky slab intersection of segment P+(Q-P)t with the closed
    rectangle [x0,x1]x[y0,y1]; returns (tmin, tmax) clamped to [0,1].
    Intersects iff tmin <= tmax.  Degenerate axes (dx==0) reduce to a
    containment test on that axis."""
    dx = bx - ax
    dy = by - ay

    def slab(a, d, lo, hi):
        ta = (lo - a) / d
        tb = (hi - a) / d
        inside = (a >= lo) & (a <= hi)
        tlo = F.when(d == 0, F.when(inside, D(0.0)).otherwise(D(2.0))) \
               .otherwise(F.least(ta, tb))
        thi = F.when(d == 0, F.when(inside, D(1.0)).otherwise(D(-2.0))) \
               .otherwise(F.greatest(ta, tb))
        return tlo, thi

    tx0, tx1 = slab(ax, dx, x0, x1)
    ty0, ty1 = slab(ay, dy, y0, y1)
    tmin = F.greatest(tx0, ty0, D(0.0))
    tmax = F.least(tx1, ty1, D(1.0))
    return tmin, tmax


def seg_rect_intersects(ax, ay, bx, by, x0, y0, x1, y1) -> Column:
    tmin, tmax = seg_rect_t_interval(ax, ay, bx, by, x0, y0, x1, y1)
    return tmin <= tmax


def seg_rect_clip_frac(ax, ay, bx, by, x0, y0, x1, y1) -> Column:
    """Fraction of the segment inside the rectangle (0 when disjoint) —
    the ST_Length(ST_Intersection(line, cell)) kernel."""
    tmin, tmax = seg_rect_t_interval(ax, ay, bx, by, x0, y0, x1, y1)
    return F.greatest(tmax - tmin, D(0.0))


def seg_len_m(ax: Column, ay: Column, bx: Column, by: Column) -> Column:
    """Planar segment length in metres (engine metric)."""
    dx = (bx - ax) * D(M_PER_DEG)
    dy = (by - ay) * D(M_PER_DEG)
    return F.sqrt(dx * dx + dy * dy)


def cos_lat(lat: Column) -> Column:
    """cos of (GEO_LAT0_DEG + lat) degrees via a 6th-order Taylor polynomial —
    NO library trig, so the value is the same correctly-rounded IEEE tree in
    every engine (truncation error < 5e-10 over the world window, irrelevant:
    exactness means engine-identical, not mathematically-exact).  This is the
    first step toward the reference's geography/3857 CRS semantics
    (06_handle_roads_with_geometry_collection.sql:21 computes lengths in
    geography; 0.0005-deg x cos(lat) is the metric scale it implies)."""
    from ..worldspec import GEO_LAT0_DEG, RAD_PER_DEG

    x = (D(GEO_LAT0_DEG) + lat) * D(RAD_PER_DEG)
    x2 = x * x
    return ((D(1.0) - x2 / D(2.0)) + (x2 * x2) / D(24.0)) \
        - ((x2 * x2) * x2 / D(720.0))


def seg_len_geo_m(ax: Column, ay: Column, bx: Column, by: Column) -> Column:
    """Latitude-aware equirectangular segment length in metres: the
    longitudinal span is scaled by cos(base latitude + segment mid-latitude).
    Same exactness treatment as seg_len_m — every operand in a fixed order,
    both engines evaluate the identical expression tree."""
    midlat = (ay + by) * D(0.5)
    dx = ((bx - ax) * D(M_PER_DEG)) * cos_lat(midlat)
    dy = (by - ay) * D(M_PER_DEG)
    return F.sqrt(dx * dx + dy * dy)


def quantize_len_um(len_m: Column) -> Column:
    """Quantize a length to int64 micrometres.  All length aggregation happens
    on these exact integers so sums are order-independent and engine-identical."""
    return F.floor(len_m * D(1.0e6)).cast("long")


def point_in_poly(px: Column, py: Column, edges: Column) -> Column:
    """Crossing-number point-in-polygon over an ``array<struct<x1,y1,x2,y2>>``
    edge list (half-open ray rule).  Division is guarded by the crossing test
    (y2 != y1 whenever the edge straddles py), so the expression is total.

    NEGATIVE RESULT (round 4, measured): unrolling the edge loop over the
    statically-known pentagon count (element_at(edges, k) x 5, plain
    codegen-able terms) is 8.5x SLOWER than this aggregate() HOF as the
    PIP join's post-join predicate (same-process A/B at sf0.1, both
    orders: unrolled 17.1-17.3 s vs HOF 1.9-2.4 s).  The unrolled
    predicate gets folded into the BroadcastHashJoin condition and its
    codegen'd form re-extracts the edge array per term; the HOF evaluates
    interpreted but walks the UnsafeArrayData once.  Keep the HOF."""
    crossings = F.aggregate(
        edges,
        F.lit(0),
        lambda acc, e: acc + F.when(
            ((e["y1"] > py) != (e["y2"] > py))
            & (px < e["x1"] + (py - e["y1"]) * (e["x2"] - e["x1"]) / (e["y2"] - e["y1"])),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return crossings % 2 == 1


def orient(ox, oy, ax, ay, bx, by) -> Column:
    """Sign of the cross product (OA x OB): exact for our binary-fraction
    coordinates at world scale (products are exact-roundable comparisons,
    identical in every IEEE engine)."""
    v = (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)
    return F.when(v > 0, F.lit(1)).when(v < 0, F.lit(-1)).otherwise(F.lit(0))


def seg_seg_intersect(ax, ay, bx, by, cx, cy, dx, dy) -> Column:
    """Proper-or-touching segment intersection via orientation signs
    (no division; collinear-overlap counts as intersecting only when an
    endpoint lies within the other segment's bbox)."""
    o1 = orient(ax, ay, bx, by, cx, cy)
    o2 = orient(ax, ay, bx, by, dx, dy)
    o3 = orient(cx, cy, dx, dy, ax, ay)
    o4 = orient(cx, cy, dx, dy, bx, by)
    general = (o1 != o2) & (o3 != o4)

    def on_seg(px, py, qx, qy, rx, ry, o):
        # r collinear with pq and inside pq's bbox
        return (o == 0) & (rx >= F.least(px, qx)) & (rx <= F.greatest(px, qx)) \
            & (ry >= F.least(py, qy)) & (ry <= F.greatest(py, qy))

    touch = (
        on_seg(ax, ay, bx, by, cx, cy, o1)
        | on_seg(ax, ay, bx, by, dx, dy, o2)
        | on_seg(cx, cy, dx, dy, ax, ay, o3)
        | on_seg(cx, cy, dx, dy, bx, by, o4)
    )
    return general | touch


def seg_point_dist2_deg(ax, ay, bx, by, px, py) -> Column:
    """Squared distance (deg^2) from point P to segment AB, via the clamped
    projection parameter.  No sqrt — distance joins compare against d^2, so
    the whole predicate is exact-roundable arithmetic."""
    dx = bx - ax
    dy = by - ay
    len2 = dx * dx + dy * dy
    t_raw = ((px - ax) * dx + (py - ay) * dy) / len2
    t = F.when(len2 == 0, D(0.0)).otherwise(F.greatest(D(0.0), F.least(D(1.0), t_raw)))
    ex = ax + t * dx - px
    ey = ay + t * dy - py
    return ex * ex + ey * ey


def seg_point_geo_dist2_m2(ax, ay, bx, by, px, py) -> Column:
    """Squared geography-mode distance (m^2) from feature point P to segment
    AB: the equirectangular metric anchored at the FEATURE latitude — x spans
    scale by M_PER_DEG * cos_lat(py), y spans by M_PER_DEG — then the same
    clamped-projection kernel as ``seg_point_dist2_deg`` on the scaled
    coordinates.  This is the metre-true ST_DWithin the reference gets by
    working in EPSG:3857 — the 50 m endpoint DWithin of
    sql/road_classification/07_assign_final_road_classification.sql:89-96 and
    the 25 m geom_3857 buffers of road_scenery_v2/02_worldcover_sampling.sql:9
    — extrapolated here to the hill proximity that 04_scenery_hill.sql states
    in degrees (a geography-mode variant, not a reference query).  Anchoring
    cos at the feature
    keeps the metric exact-twinnable: one scale per candidate pair, every
    operand in a fixed order, identical tree in both engines."""
    c = cos_lat(py)
    m = D(M_PER_DEG)
    return seg_point_dist2_deg((ax * m) * c, ay * m, (bx * m) * c, by * m,
                               (px * m) * c, py * m)


def point_dist2_deg(ax, ay, bx, by) -> Column:
    dx = bx - ax
    dy = by - ay
    return dx * dx + dy * dy
