"""Connected components over cell adjacency — urban cluster dissolve.

Mirrors the reference's ST_ClusterIntersecting / ST_ClusterDBSCAN windows
(sql/urban_clusters/01_clusters_opt1_test.sql:50-58) re-expressed on the
tiling index: cluster membership is 4-connectivity between qualifying cells,
and the cluster id is the component's minimum cell id (deterministic, no
window-over-everything).

Implementation: iterative min-label propagation (label <- min(label,
neighbors' labels)) plus POINTER JUMPING (label <- label's label) to
fixpoint — O(log diameter) iterations, each two hash joins + an aggregation
on (cell, label) pairs.  At planetary scale the same loop runs on the cell
table partitioned by cell id; the driver sees only the per-iteration
convergence count, a logarithmic number of times.

``dbscan`` adds the ST_ClusterDBSCAN option
(sql/urban_clusters/02_clusters_opt3_test.sql:52-60, eps=1500 m,
minpoints=3): eps-neighborhood join (k-ring candidates + exact Euclidean
center distance), core-point filter, CC over the core-core graph, border
cells attached to the min core-neighbor component, noise dropped.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import worldspec as W
from ..functions import cells as C


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
    """cells(grid_id) -> (grid_id, component) over 4-adjacency; component =
    min reachable cell id (exact fixpoint).

    The driver path derives 4-neighbors in pure Python from the collected
    ids (no Spark job for the edge list); the distributed path uses the
    computed ``cell_neighbors`` join.  Here the cell gate alone is sound:
    4-adjacency bounds the edge list at 4n (~800k pairs at the 200k cap),
    unlike the arbitrary graphs of ``connected_components_edges``."""
    cells = cells.persist()
    n = cells.count()
    if n <= driver_threshold:
        ids = sorted(r[0] for r in cells.select("grid_id").collect())
        idset = set(ids)
        edges = [(g, nb) for g in ids
                 for nb in (g - 1 if g % W.NX > 0 else None,
                            g + 1 if g % W.NX < W.NX - 1 else None,
                            g - W.NX if g // W.NX > 0 else None,
                            g + W.NX if g // W.NX < W.NY - 1 else None)
                 if nb is not None and nb in idset]
        return _union_find(cells, ids, edges)
    return _iterative_components(cells, cell_neighbors(cells), max_iters)


def connected_components_edges(cells: DataFrame, edges: DataFrame,
                               max_iters: int = 64,
                               driver_threshold: int = 200_000,
                               driver_edge_threshold: int = 1_000_000) -> DataFrame:
    """Generic CC: cells(grid_id) + symmetric edges(grid_id, nbr) ->
    (grid_id, component = min reachable id); exact fixpoint.

    Small inputs (the common case after the urban filter — SURVEY.md W6:
    "small data: collect cell ids to driver, union-find") take the exact
    driver union-find path, mirroring the reference's driver-side global
    reductions (persona_v2_run.py:264-339); large inputs iterate
    distributed min-label propagation over the given edge set.

    The gate is on BOTH collected lists: 200k cell ids are ~3 MB of Python
    longs, but an arbitrary edge set over 200k vertices can be dense — a
    DBSCAN eps-graph over a tight blob approaches n*k edges — so the edge
    list is counted (it is persisted first; the distributed path reuses the
    materialization) and anything past 1M pairs (~100 MB as Python tuples,
    the real driver cost) takes the distributed path."""
    cells = cells.persist()
    n = cells.count()
    if n <= driver_threshold:
        edges = edges.persist()
        if edges.count() <= driver_edge_threshold:
            return _driver_union_find(cells, edges)
    return _iterative_components(cells, edges, max_iters)


def _driver_union_find(cells: DataFrame, edges: DataFrame) -> DataFrame:
    ids = sorted(r[0] for r in cells.select("grid_id").collect())
    pairs = [(r[0], r[1]) for r in edges.select("grid_id", "nbr").collect()]
    return _union_find(cells, ids, pairs)


def _union_find(cells: DataFrame, ids: list[int],
                edges: list[tuple[int, int]]) -> DataFrame:
    parent = {g: g for g in ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for g, nb in edges:
        ra, rb = find(g), find(nb)
        if ra != rb:
            # union by min id so the component label is the min cell
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    rows = [(g, find(g)) for g in ids]
    return cells.sparkSession.createDataFrame(rows, "grid_id long, component long")


def _center(cid):
    """Cell-center coordinates derived from the id — the same expression
    tree as the oracle's grid CTE (x0 + CELL/2 with x0 = (id % NX) * CELL)."""
    cx = (cid % F.lit(W.NX)).cast("double") * F.lit(W.CELL_DEG) \
        + F.lit(W.CELL_DEG / 2.0)
    cy = F.floor(cid / F.lit(W.NX)).cast("double") * F.lit(W.CELL_DEG) \
        + F.lit(W.CELL_DEG / 2.0)
    return cx, cy


def eps_neighbors(cells: DataFrame, eps_deg_num: float,
                  eps_deg_den: float) -> DataFrame:
    """Directed (grid_id, nbr) pairs of qualifying cells whose centers are
    within eps = num/den degrees (Euclidean) — k-ring candidate join + exact
    d^2 refine, never a self cross-join.  eps is passed as a num/den pair so
    both engines evaluate the identical division."""
    eps = F.lit(eps_deg_num) / F.lit(eps_deg_den)
    r = int(math.ceil((eps_deg_num / eps_deg_den) / W.CELL_DEG))
    cand = (cells.select("grid_id")
            .withColumn("nbr", F.explode(C.kring(F.col("grid_id"), r)))
            .filter(F.col("nbr") != F.col("grid_id"))
            .join(cells.select(F.col("grid_id").alias("nbr")), "nbr",
                  "left_semi"))
    ax, ay = _center(F.col("grid_id"))
    bx, by = _center(F.col("nbr"))
    dx = ax - bx
    dy = ay - by
    return cand.filter(dx * dx + dy * dy <= eps * eps)


def dbscan(cells: DataFrame, eps_deg_num: float, eps_deg_den: float,
           minpts: int) -> DataFrame:
    """(grid_id, is_core, cluster) — ST_ClusterDBSCAN semantics with
    deterministic labels: cluster = min core-cell id of the component;
    border cells take the MIN component among their core neighbors; noise
    cells are dropped (the reference filters cluster_id IS NOT NULL)."""
    nbrs = eps_neighbors(cells, eps_deg_num, eps_deg_den)
    nn = nbrs.groupBy("grid_id").agg(F.count("*").alias("nn"))
    core = nn.filter(F.col("nn") + 1 >= minpts).select("grid_id")
    core_edges = (nbrs.join(core, "grid_id", "left_semi")
                  .join(core.select(F.col("grid_id").alias("nbr")), "nbr",
                        "left_semi"))
    comp = connected_components_edges(core, core_edges)
    core_out = comp.select("grid_id", F.lit(True).alias("is_core"),
                           F.col("component").alias("cluster"))
    border = (nbrs.join(core, "grid_id", "left_anti")
              .join(comp.select(F.col("grid_id").alias("nbr"), "component"),
                    "nbr")
              .groupBy("grid_id")
              .agg(F.min("component").alias("cluster"))
              .select("grid_id", F.lit(False).alias("is_core"), "cluster"))
    return core_out.unionByName(border)


def _iterative_components(cells: DataFrame, edges: DataFrame,
                          max_iters: int) -> DataFrame:
    """Min-label propagation WITH pointer jumping: each iteration first
    lowers every label to the min over its neighbors' labels, then replaces
    each label by its label's label (labels are always qualifying cell ids,
    so the jump is a self-join on the label table).  Jumping collapses label
    chains exponentially, so the fixpoint arrives in O(log diameter)
    iterations instead of O(diameter) — the per-iteration driver round-trip
    (one convergence count) happens only a logarithmic number of times, and
    each iteration is two hash joins on (cell, label)."""
    edges = edges.localCheckpoint(eager=True)
    labels = cells.select("grid_id", F.col("grid_id").alias("component")) \
                  .localCheckpoint(eager=True)
    for _ in range(max_iters):
        lbl_n = labels.select(F.col("grid_id").alias("nbr"),
                              F.col("component").alias("nbr_component"))
        nbr_min = (
            edges.join(lbl_n, "nbr")
            .groupBy("grid_id").agg(F.min("nbr_component").alias("nbr_component"))
        )
        lowered = (
            labels.join(nbr_min, "grid_id", "left")
            .select(
                "grid_id",
                F.least(F.col("component"),
                        F.coalesce(F.col("nbr_component"), F.col("component")))
                .alias("component"))
        )
        # pointer jump: component <- component's component (labels only ever
        # decrease, so this preserves the exact min-reachable fixpoint)
        jump = lowered.select(F.col("grid_id").alias("component"),
                              F.col("component").alias("jumped"))
        updated = (
            lowered.join(jump, "component", "left")
            .select("grid_id",
                    F.coalesce("jumped", "component").alias("component"))
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
