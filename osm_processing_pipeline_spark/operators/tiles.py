"""Vector-tile materialization (S7) — per-zoom simplified road layers.

Mirrors the reference's materialized visualization views
(sql/visualization/vis_persona_v2_normalised_z10.sql:44-66,
vis_urban_grids.sql:32-48): per zoom level, every road is assigned to a tile
and its geometry simplified before being written out partitioned by tile.

Simplification here is deterministic vertex decimation (keep every stride-th
vertex plus the final one) — the bit-exact stand-in for
``ST_SimplifyPreserveTopology(geom, tol_by_zoom)``; endpoints are always
preserved so topology (connectivity at way ends) survives, as the PostGIS
function guarantees.  Everything is array higher-order functions — no
explode, no shuffle beyond none at all (tile assignment is arithmetic).

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


def vector_tiles(roads: DataFrame) -> DataFrame:
    """One row per (zoom, road): tile id, simplified vertex count + length."""
    outs = []
    for zoom, t, stride in W.ZOOMS:
        mid = (F.floor(F.size("vertices") / 2) + 1).cast("int")
        rep = F.element_at("vertices", mid)
        tx = F.greatest(L(0), F.least(L(t - 1), F.floor(rep["lon"] * t))).cast("long")
        ty = F.greatest(L(0), F.least(L(t - 1), F.floor(rep["lat"] * t))).cast("long")
        kept = F.filter(
            "vertices",
            lambda v, i: (i % L(stride) == 0) | (i == F.size("vertices") - 1),
        )
        df = roads.withColumn("kept", kept)
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
