"""Mollweide kernel: dual-engine exactness is covered by the q56 oracle gate;
here we pin (a) accuracy against a library-trig reference and (b) the
level-grouping property that keeps both engines' plans linear."""

import math

from osm_processing_pipeline_spark import worldspec as W
from osm_processing_pipeline_spark.functions import projection as P


def _true_mollweide(lon: float, lat: float) -> tuple[float, float]:
    phi = math.radians(W.GEO_LAT0_DEG + lat)
    lam = math.radians(W.GEO_LON0_DEG + lon)
    t = phi
    for _ in range(60):
        t = t - (2 * t + math.sin(2 * t) - math.pi * math.sin(phi)) \
            / (2 + 2 * math.cos(2 * t))
    return (W.MOLL_R * 2 * math.sqrt(2) / math.pi * lam * math.cos(t),
            W.MOLL_R * math.sqrt(2) * math.sin(t))


def _eval_steps(steps, env):
    def ev(e):
        if e.kind == "lit":
            return e.args[0]
        if e.kind == "ref":
            return env[e.args[0]]
        a, b = ev(e.args[0]), ev(e.args[1])
        if e.kind == "add":
            return a + b
        if e.kind == "sub":
            return a - b
        if e.kind == "mul":
            return a * b
        return a / b

    for name, e in steps:
        env[name] = ev(e)
    return env


def test_mollweide_kernel_accuracy_sub_mm():
    """Taylor + 3-Newton must sit far inside the mm quantization across the
    whole world window (corners + center)."""
    for lon, lat in [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0),
                     (0.5, 0.5), (0.25, 0.75)]:
        env = _eval_steps(P.mollweide_steps("p", "lon", "lat"),
                          {"lon": lon, "lat": lat})
        tx, ty = _true_mollweide(lon, lat)
        assert abs(env["p_x"] - tx) < 1e-3, (lon, lat)
        assert abs(env["p_y"] - ty) < 1e-3, (lon, lat)


def test_step_levels_linear_not_exponential():
    """Every step lands on exactly one level, deps strictly earlier, and the
    rendered SQL stays linear in the step count (the lateral-alias form was
    measured exponential in the Newton depth)."""
    steps = P.mollweide_steps("p", "lon", "lat")
    levels = P.step_levels(steps)
    assert sum(len(lv) for lv in levels) == len(steps)
    seen = set()
    for lv in levels:
        for name, e in lv:
            deps = set()
            P._refs(e, deps)
            assert deps <= seen | {"lon", "lat"}, name
        seen |= {name for name, _ in lv}
    sql = P.steps_sql_from(steps, "base")
    assert len(sql) < 20_000
