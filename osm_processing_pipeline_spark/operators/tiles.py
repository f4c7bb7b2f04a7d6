"""Vector-tile materialization (S7) — per-zoom simplified road layers.

Mirrors the reference's materialized visualization views
(sql/visualization/vis_persona_v2_normalised_z10.sql:44-66,
vis_urban_grids.sql:32-48): per zoom level, every road is assigned to a tile
and its geometry simplified before being written out partitioned by tile.

Simplification is tolerance-DRIVEN deviation-bounded decimation — the
bit-exact twin of ``ST_SimplifyPreserveTopology(geom, tol_by_zoom)``'s
guarantee: per pass, an interior odd-indexed vertex is dropped iff its exact
point-to-segment distance to the chord of its two (always surviving, because
even-indexed) neighbors is below the per-pass tolerance.  No two consecutive
vertices can drop in a pass, so every dropped vertex provably lies within
tol of the final simplified line; endpoints are always preserved so topology
(connectivity at way ends) survives, as the PostGIS function guarantees.
Everything is array higher-order functions — no explode, no shuffle at all
(tile assignment is arithmetic).

At scale the output is written ``.write.partitionBy("zoom", "tile_id")`` to
Iceberg, giving tile-server point lookups partition pruning; here we return
the DataFrame and let the caller sink it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import worldspec as W
from ..functions import geometry as G
from .classify import road_type

L = F.lit


def _decimate_pass(arr, tol2: float):
    """One odd-parity deviation-decimation pass over array<struct<lon,lat>>:
    keep vertex i iff it is an endpoint, even-indexed, or deviates from the
    chord of its neighbors by >= sqrt(tol2).  The deviation uses the exact
    seg-point kernel; neighbor lookups are guarded inside the otherwise()
    branch so element_at never sees index 0 (ANSI-safe)."""
    n = F.size(arr)

    def keep(v, i):
        prev = F.element_at(arr, i)          # 1-based: 0-based index i-1
        nxt = F.element_at(arr, i + 2)       # 0-based index i+1
        dev2 = G.seg_point_dist2_deg(prev["lon"], prev["lat"],
                                     nxt["lon"], nxt["lat"],
                                     v["lon"], v["lat"])
        return F.when((i == 0) | (i == n - 1) | (i % 2 == 0), F.lit(True)) \
                .otherwise(dev2 >= F.lit(tol2))

    return F.filter(arr, keep)


def vector_tiles(roads: DataFrame) -> DataFrame:
    """One row per (zoom, road): tile id, simplified vertex count + length."""
    outs = []
    for zoom, t, tol, passes in W.ZOOMS:
        mid = (F.floor(F.size("vertices") / 2) + 1).cast("int")
        rep = F.element_at("vertices", mid)
        tx = F.greatest(L(0), F.least(L(t - 1), F.floor(rep["lon"] * t))).cast("long")
        ty = F.greatest(L(0), F.least(L(t - 1), F.floor(rep["lat"] * t))).cast("long")
        tol2 = (tol / passes) * (tol / passes)
        df = roads.withColumn("kept", F.col("vertices"))
        for _ in range(passes):
            df = df.withColumn("kept", _decimate_pass(F.col("kept"), tol2))
        # simplified length: consecutive kept-vertex segments, quantized sum
        seg_len = F.expr(
            "transform(slice(kept, 1, size(kept) - 1), "
            "(v, k) -> struct(v.lon as ax, v.lat as ay, "
            "kept[k + 1].lon as bx, kept[k + 1].lat as by))"
        )
        simp_um = F.aggregate(
            seg_len, L(0).cast("long"),
            lambda acc, s: acc + G.quantize_len_um(
                G.seg_len_m(s["ax"], s["ay"], s["bx"], s["by"])),
        )
        outs.append(df.select(
            L(zoom).cast("long").alias("zoom"),
            (ty * t + tx).alias("tile_id"),
            "osm_id", "highway",
            road_type(F.col("ref"), F.col("highway")).alias("road_type"),
            F.size("vertices").cast("long").alias("n_pts_full"),
            F.size("kept").cast("long").alias("n_pts"),
            simp_um.alias("simplified_len_um"),
        ))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
