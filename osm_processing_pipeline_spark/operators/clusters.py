"""Connected components over cell adjacency — urban cluster dissolve.

Mirrors the reference's ST_ClusterIntersecting / ST_ClusterDBSCAN windows
(sql/urban_clusters/01_clusters_opt1_test.sql:50-58) re-expressed on the
tiling index: cluster membership is 4-connectivity between qualifying cells,
and the cluster id is the component's minimum cell id (deterministic, no
window-over-everything).

Implementation: iterative min-label propagation (label <- min(label,
neighbors' labels)) to fixpoint — O(diameter) joins; each iteration is one
hash join + aggregation on (cell, label) pairs.  At planetary scale the same
loop runs on the cell table partitioned by cell id; diameters of urban blobs
are small, so few iterations are needed (large-star/small-star would cut the
worst case further).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import worldspec as W


def cell_neighbors(cells: DataFrame) -> DataFrame:
    """(grid_id, nbr) 4-neighbor edges among the given cells (both ends must
    qualify) — neighbors are computed, never joined geometrically."""
    i = F.col("grid_id") % W.NX
    j = F.floor(F.col("grid_id") / W.NX).cast("long")
    nbrs = F.array(
        F.when(i > 0, F.col("grid_id") - 1),
        F.when(i < W.NX - 1, F.col("grid_id") + 1),
        F.when(j > 0, F.col("grid_id") - W.NX),
        F.when(j < W.NY - 1, F.col("grid_id") + W.NX),
    )
    edges = cells.select(
        "grid_id",
        F.explode(F.filter(nbrs, lambda c: c.isNotNull())).alias("nbr"))
    # keep only edges whose far end is also a qualifying cell
    return edges.join(cells.select(F.col("grid_id").alias("nbr")), "nbr", "left_semi")


def connected_components(cells: DataFrame, max_iters: int = 64,
                         driver_threshold: int = 200_000) -> DataFrame:
    """cells(grid_id) -> (grid_id, component) with component = min cell id
    reachable; exact fixpoint.

    Small inputs (the common case after the urban filter — SURVEY.md W6:
    "small data: collect cell ids to driver, union-find") take the exact
    driver union-find path, mirroring the reference's driver-side global
    reductions (persona_v2_run.py:264-339); large inputs iterate
    distributed min-label propagation."""
    cells = cells.persist()
    n = cells.count()
    out = (_driver_union_find(cells) if n <= driver_threshold
           else _iterative_components(cells, max_iters))
    return out


def _driver_union_find(cells: DataFrame) -> DataFrame:
    ids = sorted(r[0] for r in cells.select("grid_id").collect())
    idset = set(ids)
    parent = {g: g for g in ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for g in ids:
        i, j = g % W.NX, g // W.NX
        for nb in (g - 1 if i > 0 else None, g + 1 if i < W.NX - 1 else None,
                   g - W.NX if j > 0 else None, g + W.NX if j < W.NY - 1 else None):
            if nb is not None and nb in idset:
                ra, rb = find(g), find(nb)
                if ra != rb:
                    # union by min id so the component label is the min cell
                    lo, hi = min(ra, rb), max(ra, rb)
                    parent[hi] = lo
    rows = [(g, find(g)) for g in ids]
    return cells.sparkSession.createDataFrame(rows, "grid_id long, component long")


def _iterative_components(cells: DataFrame, max_iters: int) -> DataFrame:
    edges = cell_neighbors(cells).localCheckpoint(eager=True)
    labels = cells.select("grid_id", F.col("grid_id").alias("component")) \
                  .localCheckpoint(eager=True)
    for _ in range(max_iters):
        lbl_n = labels.select(F.col("grid_id").alias("nbr"),
                              F.col("component").alias("nbr_component"))
        nbr_min = (
            edges.join(lbl_n, "nbr")
            .groupBy("grid_id").agg(F.min("nbr_component").alias("nbr_component"))
        )
        updated = (
            labels.join(nbr_min, "grid_id", "left")
            .select(
                "grid_id",
                F.least(F.col("component"),
                        F.coalesce(F.col("nbr_component"), F.col("component")))
                .alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.withColumnRenamed("component", "c2")
            .join(labels, "grid_id")
            .filter(F.col("c2") != F.col("component")).count()
        )
        labels = updated
        if changed == 0:
            break
    return labels
