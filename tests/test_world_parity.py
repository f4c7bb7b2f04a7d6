"""The synthetic world must be bit-identical between Spark and the DuckDB
oracle — this is the foundation of every exact join-row parity claim."""

import numpy as np
from pyspark.sql import functions as F

from osm_processing_pipeline_spark.datagen import oracle, world
from tests.conftest import SF_SMOKE, duck


def _sorted(df, keys):
    return df.sort_values(keys).reset_index(drop=True)


def test_vertices_bit_identical(spark, duck_smoke):
    sp = (
        world.way_nodes(spark, SF_SMOKE)
        .select("way_id", "seq", "lon", "lat", "node_id")
        .toPandas()
    )
    du = duck_smoke.execute(
        oracle.with_world("verts")
        + "\nSELECT osm_id AS way_id, k AS seq, lon, lat, node_id FROM verts"
    ).df()
    sp, du = _sorted(sp, ["way_id", "seq"]), _sorted(du, ["way_id", "seq"])
    assert len(sp) == len(du) and len(sp) > 0
    assert (sp.way_id.values == du.way_id.values).all()
    # bitwise float equality — no tolerance
    assert (sp.lon.values.view(np.int64) == du.lon.values.view(np.int64)).all()
    assert (sp.lat.values.view(np.int64) == du.lat.values.view(np.int64)).all()
    assert (sp.node_id.values == du.node_id.values).all()


def test_road_attrs_identical(spark, duck_smoke):
    sp = (
        world.roads(spark, SF_SMOKE)
        .select("osm_id", "highway", "ref", "lanes", "surface", "oneway", "urban", "nv")
        .toPandas()
    )
    du = duck_smoke.execute(
        oracle.with_world("roads_base")
        + "\nSELECT osm_id, highway, ref, lanes, surface, oneway, urb AS urban, nv FROM roads_base"
    ).df()
    sp, du = _sorted(sp, ["osm_id"]), _sorted(du, ["osm_id"])
    assert len(sp) == len(du)
    for c in ["highway", "ref", "lanes", "surface", "oneway"]:
        a = sp[c].fillna("<null>").values
        b = du[c].fillna("<null>").values
        assert (a == b).all(), c
    assert (sp.urban.values == du.urban.values).all()
    assert (sp.nv.values == du.nv.values).all()


def test_grid_and_features_identical(spark, duck_smoke):
    gs = world.grids(spark).toPandas()
    gd = duck_smoke.execute(
        oracle.with_world("grid") + "\nSELECT * FROM grid"
    ).df()
    gs, gd = _sorted(gs, ["grid_id"]), _sorted(gd, ["grid_id"])
    for c in ["x0", "y0", "x1", "y1"]:
        assert (gs[c].values.view(np.int64) == gd[c].values.view(np.int64)).all()
    assert (gs.grid_class.values == gd.grid_class.values).all()
    assert (gs.grid_class == "Urban").sum() == 64  # 8x8 urban core

    fs = (
        world.features(spark, SF_SMOKE)
        .select("feature_id", "layer", F.explode("edges").alias("e"))
        .select("feature_id", "layer", "e.x1", "e.y1", "e.x2", "e.y2")
        .toPandas()
    )
    fd = duck_smoke.execute(
        oracle.with_world("feat_edges")
        + "\nSELECT feature_id, layer, x1, y1, x2, y2 FROM feat_edges ORDER BY feature_id, e"
    ).df()
    fs = _sorted(fs, ["feature_id", "x1", "y1"])
    fd = _sorted(fd, ["feature_id", "x1", "y1"])
    assert len(fs) == len(fd) and len(fs) > 0
    for c in ["x1", "y1", "x2", "y2"]:
        assert (fs[c].values.view(np.int64) == fd[c].values.view(np.int64)).all()


def test_segments_bit_identical(spark, duck_smoke):
    sp = world.segments(spark, SF_SMOKE).select(
        "osm_id", "seg_idx", "ax", "ay", "bx", "by").toPandas()
    du = duck_smoke.execute(
        oracle.with_world("segs")
        + "\nSELECT osm_id, seg_idx, ax, ay, bx, by FROM segs"
    ).df()
    sp, du = _sorted(sp, ["osm_id", "seg_idx"]), _sorted(du, ["osm_id", "seg_idx"])
    assert len(sp) == len(du) and len(sp) > 0
    for c in ["ax", "ay", "bx", "by"]:
        assert (sp[c].values.view(np.int64) == du[c].values.view(np.int64)).all()
