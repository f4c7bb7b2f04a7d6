"""Randomized property tests for the exact geometry kernels.

500 seeded random segment/rect/point cases are evaluated in ONE Spark pass
through the engine's Catalyst expressions, then cross-checked against
independent pure-Python implementations and dense sampling:

  * no false negatives: if dense sampling finds the segment inside the rect,
    the kernel must report intersection;
  * no phantom hits: a kernel hit never strays more than one coordinate
    quantum from the rect;
  * clip fraction agrees with the sampled in-rect fraction to sampling error;
  * clamped-projection distance^2 matches an independent implementation.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_processing_pipeline_spark.functions import geometry as G

N = 500
SAMPLES = 2049
QD = 1.0 / 2048.0


@pytest.fixture(scope="module")
def cases(spark):
    rng = np.random.default_rng(7)

    def frac(n):  # exact binary fractions in [0, 1)
        return rng.integers(0, 2048, n) / 2048.0

    pdf = pd.DataFrame({
        "ax": frac(N), "ay": frac(N), "bx": frac(N), "by": frac(N),
        "px": frac(N), "py": frac(N),
    })
    x0, x1 = frac(N), frac(N)
    y0, y1 = frac(N), frac(N)
    pdf["x0"], pdf["x1"] = np.minimum(x0, x1), np.maximum(x0, x1)
    pdf["y0"], pdf["y1"] = np.minimum(y0, y1), np.maximum(y0, y1)
    # make a third of the rects small (hard cases near-touch)
    small = rng.integers(0, N, N // 3)
    pdf.loc[small, "x1"] = pdf.loc[small, "x0"] + QD
    pdf.loc[small, "y1"] = pdf.loc[small, "y0"] + QD

    df = spark.createDataFrame(pdf)
    out = df.select(
        "*",
        G.seg_rect_intersects(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"),
                              F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"))
        .alias("hit"),
        G.seg_rect_clip_frac(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"),
                             F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"))
        .alias("frac"),
        G.seg_point_dist2_deg(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"),
                              F.col("px"), F.col("py")).alias("d2"),
    ).toPandas()
    return out


def _sample_points(row):
    t = np.linspace(0.0, 1.0, SAMPLES)
    return (row.ax + (row.bx - row.ax) * t,
            row.ay + (row.by - row.ay) * t)


def test_no_false_negatives_and_frac(cases):
    for row in cases.itertuples():
        xs, ys = _sample_points(row)
        inside = ((xs >= row.x0) & (xs <= row.x1)
                  & (ys >= row.y0) & (ys <= row.y1))
        if inside.any():
            assert row.hit, f"sampled hit but kernel miss: {row}"
        got = inside.mean()
        assert abs(row.frac - got) <= 3.0 / SAMPLES + 1e-12, \
            f"clip frac {row.frac} vs sampled {got}: {row}"


def test_no_phantom_hits(cases):
    for row in cases.itertuples():
        if not row.hit:
            continue
        xs, ys = _sample_points(row)
        dx = np.maximum(np.maximum(row.x0 - xs, xs - row.x1), 0.0)
        dy = np.maximum(np.maximum(row.y0 - ys, ys - row.y1), 0.0)
        assert np.sqrt(dx * dx + dy * dy).min() <= 1.5 * QD, \
            f"kernel hit but segment never near rect: {row}"


def test_point_segment_distance_matches_reference(cases):
    for row in cases.itertuples():
        vx, vy = row.bx - row.ax, row.by - row.ay
        wx, wy = row.px - row.ax, row.py - row.ay
        vv = vx * vx + vy * vy
        t = 0.0 if vv == 0.0 else min(1.0, max(0.0, (wx * vx + wy * vy) / vv))
        cx, cy = row.ax + t * vx, row.ay + t * vy
        ref = (row.px - cx) ** 2 + (row.py - cy) ** 2
        assert row.d2 == pytest.approx(ref, rel=1e-9, abs=1e-15), str(row)


def test_douglas_peucker_matches_recursive_reference():
    """The fixed-iteration vectorized DP kernel in operators/tiles must
    equal a textbook RECURSIVE Douglas-Peucker (global tolerance, strict >,
    smallest-index tie-break) on random polylines of every length the world
    can produce (2..NV_MAX vertices)."""
    from osm_processing_pipeline_spark import worldspec as W
    from osm_processing_pipeline_spark.operators import tiles

    rng = np.random.default_rng(11)
    rows = []
    for rid in range(300):
        nv = int(rng.integers(2, W.NV_MAX + 1))
        pts = rng.random((nv, 2)) * 0.01
        rows.append((rid, [{"lon": float(x), "lat": float(y)} for x, y in pts]))
    # beyond this world's NV_MAX: the kernel pads to the batch max, so
    # longer ways (other scales / other worlds) must simplify correctly too
    for rid in range(300, 340):
        nv = int(rng.integers(W.NV_MAX + 1, 25))
        pts = rng.random((nv, 2)) * 0.01
        rows.append((rid, [{"lon": float(x), "lat": float(y)} for x, y in pts]))

    tol = 1.0 / 512.0
    N = len(rows)
    nvs = np.array([len(v) for _, v in rows], np.int64)
    width = max(W.NV_MAX, int(nvs.max()))
    X = np.zeros((N, width))
    Y = np.zeros((N, width))
    for i, (_rid, verts) in enumerate(rows):
        for j, v in enumerate(verts):
            X[i, j] = v["lon"]
            Y[i, j] = v["lat"]
    kept = tiles.dp_keep_mask(X, Y, nvs, tol * tol)
    got = {rows[i][0]: list(np.nonzero(kept[i])[0]) for i in range(N)}

    def seg_d2(a, b, p):
        vx, vy = b[0] - a[0], b[1] - a[1]
        vv = vx * vx + vy * vy
        t = 0.0 if vv == 0.0 else min(1.0, max(0.0, ((p[0] - a[0]) * vx + (p[1] - a[1]) * vy) / vv))
        cx, cy = a[0] + t * vx, a[1] + t * vy
        return (p[0] - cx) ** 2 + (p[1] - cy) ** 2

    def dp(pts, lo, hi, keep):
        if hi - lo <= 1:
            return
        best_d, best_i = -1.0, -1
        for i in range(lo + 1, hi):
            d = seg_d2(pts[lo], pts[hi], pts[i])
            if d > best_d:
                best_d, best_i = d, i
        if best_d > tol * tol:
            keep.add(best_i)
            dp(pts, lo, best_i, keep)
            dp(pts, best_i, hi, keep)

    for rid, verts in rows:
        pts = [(v["lon"], v["lat"]) for v in verts]
        keep = {0, len(pts) - 1}
        dp(pts, 0, len(pts) - 1, keep)
        assert got[rid] == sorted(keep), f"rid={rid}: {got[rid]} vs {sorted(keep)}"
