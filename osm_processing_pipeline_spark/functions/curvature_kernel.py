"""Vectorized per-way curvature kernel (numpy, Arrow-batched).

Re-expresses the reference's vertex-angle + way-rollup pipeline
(sql/road_curvature_v2/02_compute_vertex_angles.sql, 05_aggregate_to_way.sql)
with *trig-free* math so results are bit-identical to the SQL oracle:

  * turn significance: |cross| >= sin(5 deg) * a*b OR dot <= 0
    (angle >= 5 deg without calling atan2 — 02_compute_vertex_angles.sql:63-68)
  * circle radius via circumradius R = abc/4A (Heron/shoelace, :131-158);
    degenerate (collinear / duplicate-vertex) cases excluded exactly as the
    reference NULLs them out (:136-156)
  * conflict-zone suppression: vertices within 30 m along-way of a conflict
    node are excluded (04_conflict_zone_suppression.sql:74-83); along-way
    distances are exact int64 micrometres, so the window test is exact
  * rollup: bucket length sums + twistiness score + class cuts
    (05_aggregate_to_way.sql:58-86)

All lengths are quantized to int64 micrometres before summation; all float
comparisons use IEEE-exact operation trees mirrored in the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from .. import worldspec as W

OUT_SCHEMA = ("osm_id long, total_len_um long, sharp_len_um long, "
              "broad_len_um long, n_sharp long, n_broad long, "
              "n_suppressed long, twist_permille long, curve_class string")


def curvature_map_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: input columns (osm_id, lons, lats, node_ids) with
    the coordinate arrays nested per road — no shuffle, pure Arrow transport,
    flat-vectorized numpy inside (no per-row Python in the math)."""
    M = W.M_PER_DEG
    for pdf in it:
        if len(pdf) == 0:
            continue
        osm_id = pdf["osm_id"].to_numpy(np.int64)
        lon_lists = pdf["lons"].to_numpy(object)
        lat_lists = pdf["lats"].to_numpy(object)
        nid_lists = pdf["node_ids"].to_numpy(object)
        counts = np.fromiter((len(x) for x in lon_lists), np.int64, len(lon_lists))
        lon = np.concatenate(lon_lists).astype(np.float64)
        lat = np.concatenate(lat_lists).astype(np.float64)
        nid = np.concatenate(nid_lists).astype(np.int64)
        n = lon.size
        starts = np.zeros(len(counts), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        road_of = np.repeat(np.arange(len(counts)), counts)

        # --- segments (vertex p -> p+1), valid when both ends in same road
        dx = (lon[1:] - lon[:-1]) * M
        dy = (lat[1:] - lat[:-1]) * M
        seg_valid = road_of[1:] == road_of[:-1]
        seg_len = np.sqrt(dx * dx + dy * dy)
        seg_um = np.where(seg_valid,
                          np.floor(seg_len * 1.0e6), 0.0).astype(np.int64)

        # cumulative along-way position (um) at each vertex
        cum = np.zeros(n, np.int64)
        np.cumsum(seg_um, out=cum[1:])
        cum = cum - np.repeat(cum[starts], counts)

        # per-road totals
        total_um = np.add.reduceat(
            np.concatenate([seg_um, [0]]), starts)  # sums within [start, next)
        # reduceat over padded array: segment p belongs to road_of[p]; the
        # boundary segment (invalid) contributes 0, so plain reduceat works.

        # --- interior vertices p (1 .. n_r-2): prev seg p-1, next seg p
        interior = np.zeros(n, bool)
        interior[1:-1] = (road_of[1:-1] == road_of[:-2]) & (road_of[1:-1] == road_of[2:])
        p = np.nonzero(interior)[0]
        ux, uy = dx[p - 1], dy[p - 1]
        wx, wy = dx[p], dy[p]
        a = seg_len[p - 1]
        b = seg_len[p]
        cx_ = (lon[p + 1] - lon[p - 1]) * M
        cy_ = (lat[p + 1] - lat[p - 1]) * M
        c = np.sqrt(cx_ * cx_ + cy_ * cy_)
        cross = ux * wy - uy * wx
        dot = ux * wx + uy * wy
        area2 = np.abs(cross)
        significant = ~((dot > 0) & (area2 < W.SIN5 * (a * b)))
        with np.errstate(divide="ignore", invalid="ignore"):
            radius = (a * b * c) / (2.0 * area2)
        nonzero = (a > 0) & (b > 0) & (area2 > 0)
        sharp = significant & nonzero & (radius <= W.SHARP_RADIUS_M)
        broad = significant & nonzero & (radius <= W.BROAD_RADIUS_M) & ~sharp
        contrib_um = np.floor(((a + b) / 2.0) * 1.0e6).astype(np.int64)

        # --- conflict-zone suppression (exact integer window)
        is_conflict = (nid % 97) < len(W.CONFLICT_TYPES)
        win = int(W.SUPPRESS_M * 1.0e6)
        suppressed_v = np.zeros(n, bool)
        conf_idx = np.nonzero(is_conflict)[0]
        if conf_idx.size:
            # pairwise (vertex, conflict) within road, via repeat/offset trick
            conf_per_road = np.bincount(road_of[conf_idx], minlength=len(counts))
            reps = conf_per_road[road_of]           # conflicts in my road
            v_idx = np.repeat(np.arange(n), reps)   # each vertex x its road's conflicts
            conf_starts = np.zeros(len(counts), np.int64)
            np.cumsum(conf_per_road[:-1], out=conf_starts[1:])
            within = np.arange(reps.sum()) - np.repeat(
                np.cumsum(reps) - reps, reps)
            c_idx = conf_idx[conf_starts[road_of[v_idx]] + within]
            hit = np.abs(cum[v_idx] - cum[c_idx]) <= win
            np.logical_or.at(suppressed_v, v_idx[hit], True)
        sup = suppressed_v[p]

        sharp_eff = sharp & ~sup
        broad_eff = broad & ~sup

        def road_sum(vals: np.ndarray, mask: np.ndarray) -> np.ndarray:
            out = np.zeros(len(counts), np.int64)
            np.add.at(out, road_of[p[mask]], vals[mask])
            return out

        sharp_um = road_sum(contrib_um, sharp_eff)
        broad_um = road_sum(contrib_um, broad_eff)
        n_sharp = road_sum(np.ones(p.size, np.int64), sharp_eff)
        n_broad = road_sum(np.ones(p.size, np.int64), broad_eff)
        n_sup = road_sum(np.ones(p.size, np.int64), sup)

        score = (sharp_um * 2 + broad_um) * 1000
        twist = np.where(total_um > 0, score // np.maximum(total_um, 1), 0)
        cls = np.where(
            twist >= int(W.TWIST_CUT_HI * 1000), "twisty",
            np.where(twist >= int(W.TWIST_CUT_LO * 1000), "curvy", "straight"))
        yield pd.DataFrame({
            "osm_id": osm_id,
            "total_len_um": total_um,
            "sharp_len_um": sharp_um,
            "broad_len_um": broad_um,
            "n_sharp": n_sharp,
            "n_broad": n_broad,
            "n_suppressed": n_sup,
            "twist_permille": twist,
            "curve_class": cls,
        })
