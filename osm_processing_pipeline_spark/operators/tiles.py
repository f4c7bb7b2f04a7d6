"""Vector-tile materialization (S7) — per-zoom simplified road layers.

Mirrors the reference's materialized visualization views
(sql/visualization/vis_persona_v2_normalised_z10.sql:44-66,
vis_urban_grids.sql:32-48): per zoom level, every road is assigned to a tile
and its geometry simplified before being written out partitioned by tile.

Simplification is TRUE Douglas-Peucker with a single GLOBAL tolerance
measured against the ORIGINAL polyline — the guarantee
``ST_SimplifyPreserveTopology(geom, tol_by_zoom)`` makes: endpoints seed the
kept set, then every chord between consecutive kept vertices is split at its
maximum-deviation interior vertex while that deviation exceeds tol
(smallest-index tie-break), iterated to fixpoint.  Since ways carry at most
``worldspec.NV_MAX`` (= 8) vertices, ``NV_MAX - 2`` iterations provably
converge (each iteration either adds a kept vertex to some chord or the
whole fixpoint is reached) and extra iterations are idempotent, so both
engines run the identical fixed count.  Endpoints are always preserved so
topology (connectivity at way ends) survives, as the PostGIS function
guarantees.  Everything is array higher-order functions — no explode, no
shuffle at all (tile assignment is arithmetic); each iteration lands in its
own projection so Catalyst never inlines the multiply-referenced kept-index
array (CollapseProject keeps non-cheap multi-referenced aliases put).

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


def _dp_split_pass(arr, K, tol2: float):
    """One Douglas-Peucker split iteration.  ``K`` is the sorted array<int>
    of kept 0-based vertex indices (endpoints seeded by the caller); for
    every consecutive kept pair (p, q) with interior vertices, fold over the
    gap to find the max-deviation vertex (exact seg-point kernel against the
    ORIGINAL chord endpoints; strict ``>`` in the fold gives the
    smallest-index tie-break), and keep it iff its deviation exceeds the
    GLOBAL tolerance.  Gaps with q - p <= 1 contribute nothing (the And
    short-circuits before the fold runs)."""

    def per_pair(idx):
        p = F.element_at(K, idx + 1)
        q = F.element_at(K, idx + 2)
        vp = F.element_at(arr, p + 1)
        vq = F.element_at(arr, q + 1)
        devs = F.transform(
            F.sequence(p + 1, q - 1),
            lambda j: F.struct(
                G.seg_point_dist2_deg(
                    vp["lon"], vp["lat"], vq["lon"], vq["lat"],
                    F.element_at(arr, j + 1)["lon"],
                    F.element_at(arr, j + 1)["lat"]).alias("d2"),
                j.alias("i")))
        best = F.aggregate(
            devs,
            F.struct(L(-1.0).alias("d2"), L(-1).alias("i")),
            lambda acc, e: F.when(e["d2"] > acc["d2"], e).otherwise(acc))
        return F.when((q - p > L(1)) & (best["d2"] > F.lit(tol2)),
                      F.array(best["i"])) \
                .otherwise(F.array().cast("array<int>"))

    added = F.flatten(F.transform(F.sequence(L(0), F.size(K) - 2), per_pair))
    return F.array_sort(F.concat(K, added))


def vector_tiles(roads: DataFrame) -> DataFrame:
    """One row per (zoom, road): tile id, simplified vertex count + length."""
    outs = []
    for zoom, t, tol in W.ZOOMS:
        mid = (F.floor(F.size("vertices") / 2) + 1).cast("int")
        rep = F.element_at("vertices", mid)
        tx = F.greatest(L(0), F.least(L(t - 1), F.floor(rep["lon"] * t))).cast("long")
        ty = F.greatest(L(0), F.least(L(t - 1), F.floor(rep["lat"] * t))).cast("long")
        tol2 = tol * tol
        df = roads.withColumn(
            "K", F.array(L(0).cast("int"),
                         (F.size("vertices") - 1).cast("int")))
        for _ in range(W.NV_MAX - 2):
            df = df.withColumn(
                "K", _dp_split_pass(F.col("vertices"), F.col("K"), tol2))
        df = df.withColumn(
            "kept",
            F.filter("vertices",
                     lambda v, i: F.array_contains(F.col("K"), i.cast("int"))))
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
