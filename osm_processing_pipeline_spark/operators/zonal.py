"""Raster <-> vector operators: zonal statistics and point sampling.

Mirrors the reference's chunked zonal sums
(sql/urban_pressure/03_zonal_pop_count_chunked.sql:4-12,
04_zonal_built_up_chunked.sql:4-12 — ST_Clip + ST_SummaryStats per grid cell)
and raster point probes (ST_Value at sampled points,
sql/road_scenery/hill_v2/03_compute_relief_from_raster.sql:17-56).

The tile grid is cell-aligned (one tile = 2x2 grid cells), so zonal sums need
no geometric join at all: tiles are decoded (Arrow batch -> numpy) and block-
summed straight into per-cell rows — the raster->vector tiling path.  Point
sampling equi-joins points to their tile id, then gathers pixels vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import worldspec as W
from ..sources.raster import decode_band


def zonal_cell_sums(tiles: DataFrame, partitions: int | None = None,
                    n_tiles: int = W.N_TILES * W.N_TILES) -> DataFrame:
    """(grid_id, pop_sum, built_sum) — per-grid-cell band sums from binary
    tiles.  No shuffle: each tile maps to exactly its 4 cells."""
    cpt = W.TILE_PX // W.PX_PER_CELL       # cells per tile edge (2)
    ppc = W.PX_PER_CELL
    if partitions is None:
        # few fat Arrow batches beat many worker spin-ups, but the task count
        # must grow with the raster: one task per ~512 tiles, floored at 8,
        # capped at the cluster's parallelism
        dp = tiles.sparkSession.sparkContext.defaultParallelism
        partitions = max(8, min(dp, n_tiles // 512))

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n = len(pdf)
            tx = pdf["tx"].to_numpy(np.int64)
            ty = pdf["ty"].to_numpy(np.int64)
            pop = decode_band(pdf["pop_data"]).astype(np.int64)
            built = decode_band(pdf["built_data"]).astype(np.int64)
            # block-sum 16x16 -> cpt x cpt cells of ppc x ppc px
            def blocks(a):
                return a.reshape(n, cpt, ppc, cpt, ppc).sum(axis=(2, 4))
            pops = blocks(pop)      # (n, cj, ci) rows=py blocks
            builts = blocks(built)
            ci = (tx[:, None, None] * cpt + np.arange(cpt)[None, None, :])
            cj = (ty[:, None, None] * cpt + np.arange(cpt)[None, :, None])
            gid = (cj * W.NX + ci + np.zeros_like(pops)).reshape(-1)
            yield pd.DataFrame({
                "grid_id": gid,
                "pop_sum": pops.reshape(-1),
                "built_sum": builts.reshape(-1),
            })

    return tiles.coalesce(partitions).mapInPandas(
        kernel, schema="grid_id long, pop_sum long, built_sum long")


def sample_points(tiles: DataFrame, pts: DataFrame) -> DataFrame:
    """ST_Value(rast, point): pts(osm_id, lon, lat) -> (osm_id, pop_value).
    Points are keyed to their tile (pure arithmetic), equi-joined to the tile
    table (broadcast when small / co-partitioned by tile id at scale), pixels
    gathered vectorized."""
    px = F.greatest(F.lit(0), F.least(F.lit(W.RASTER_PX - 1),
                                      F.floor(F.col("lon") * W.RASTER_PX).cast("long")))
    py = F.greatest(F.lit(0), F.least(F.lit(W.RASTER_PX - 1),
                                      F.floor(F.col("lat") * W.RASTER_PX).cast("long")))
    keyed = pts.select(
        "osm_id", px.alias("px"), py.alias("py"),
        (F.floor(py / W.TILE_PX) * W.N_TILES + F.floor(px / W.TILE_PX))
        .cast("long").alias("tile_id"),
    )
    joined = keyed.join(tiles.select("tile_id", "pop_data"), "tile_id")

    def kernel(batches):
        tp = W.TILE_PX
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pop = decode_band(pdf["pop_data"])
            px_ = pdf["px"].to_numpy(np.int64) % tp
            py_ = pdf["py"].to_numpy(np.int64) % tp
            vals = pop[np.arange(len(pdf)), py_, px_]
            yield pd.DataFrame({
                "osm_id": pdf["osm_id"].to_numpy(np.int64),
                "pop_value": vals.astype(np.int64),
            })

    return joined.mapInPandas(kernel, schema="osm_id long, pop_value long")


def urban_pressure(cell_sums: DataFrame) -> DataFrame:
    """pd/bu saturation + pressure composition + class thresholds
    (05_compute_urban_pressure.sql:12-16, 07_classify_urban_class.sql:8-15).
    Pressure is emitted as exact int micro-units (floor(p * 1e6))."""
    pdr = F.least(F.col("pop_sum") / F.lit(W.POP_SAT_CELL), F.lit(1.0))
    bur = F.least(F.col("built_sum") / F.lit(W.BUILT_SAT_CELL), F.lit(1.0))
    pressure = F.lit(1.0) - (F.lit(1.0) - pdr) * (F.lit(1.0) - bur)
    micro = F.floor(pressure * F.lit(1.0e6)).cast("long")
    cls = (
        F.when(pressure >= W.PRESSURE_URBAN, "urban")
        .when(pressure >= W.PRESSURE_SEMI, "semi_urban")
        .otherwise("rural")
    )
    return cell_sums.select(
        "grid_id", "pop_sum", "built_sum",
        micro.alias("pressure_micro"), cls.alias("pressure_class"))
