"""Checkpoint/resume: completed ranges are skipped on restart; a changed
lineage invalidates them; resumed output is bit-identical."""

import shutil

from pyspark.sql import functions as F

from osm_processing_pipeline_spark.datagen import world
from osm_processing_pipeline_spark.operators import spatial_join
from osm_processing_pipeline_spark.plans import checkpoint as CP
from osm_processing_pipeline_spark.worldspec import NX, NY
from tests.conftest import SF_SMOKE

OUT = "/tmp/osm_ckpt_test"


def _pieces_fn(spark):
    def fn():
        r = world.roads_materialized(spark, SF_SMOKE)
        s = world.segments(spark, SF_SMOKE, r)
        g = world.grids(spark)
        return spatial_join.segment_cell_pieces(s, g) \
            .select("osm_id", "grid_id", "piece_um")
    return fn


def test_checkpoint_resume_and_invalidate(spark):
    shutil.rmtree(OUT, ignore_errors=True)
    ranges = CP.make_ranges(0, NX * NY, 8)
    lin = CP.lineage_hash("pieces", [SF_SMOKE], version="1")

    r1 = CP.run_stage(spark, "pieces", _pieces_fn(spark), "grid_id",
                      ranges, OUT, lin)
    assert len(r1["computed"]) == 8 and not r1["skipped"]
    first_pd = CP.load_stage(spark, OUT).toPandas() \
        .sort_values(["osm_id", "grid_id"]).reset_index(drop=True)
    n1 = len(first_pd)
    assert n1 == r1["rows"] > 0

    # resume: everything skipped, nothing recomputed, same data
    r2 = CP.run_stage(spark, "pieces", _pieces_fn(spark), "grid_id",
                      ranges, OUT, lin)
    assert len(r2["skipped"]) == 8 and not r2["computed"]
    assert r2["rows"] == n1

    # partial failure: wipe two ranges -> only those recompute
    shutil.rmtree(f"{OUT}/range=3")
    shutil.rmtree(f"{OUT}/range=5")
    r3 = CP.run_stage(spark, "pieces", _pieces_fn(spark), "grid_id",
                      ranges, OUT, lin)
    assert sorted(r3["computed"]) == [3, 5] and len(r3["skipped"]) == 6
    after_pd = CP.load_stage(spark, OUT).toPandas() \
        .sort_values(["osm_id", "grid_id"]).reset_index(drop=True)
    # bit-identical content after resume
    assert len(after_pd) == n1
    assert (after_pd.values == first_pd.values).all()

    # lineage change invalidates all checkpoints
    lin2 = CP.lineage_hash("pieces", [SF_SMOKE], version="2")
    r4 = CP.run_stage(spark, "pieces", _pieces_fn(spark), "grid_id",
                      ranges, OUT, lin2)
    assert len(r4["computed"]) == 8

    # manifest carries per-range metrics
    man = CP.read_manifest(OUT)
    assert all({"stage", "range_id", "output_rows", "wall_s", "lineage"}
               <= set(m) for m in man)
    shutil.rmtree(OUT, ignore_errors=True)


def test_load_stage_ignores_stale_ranges_of_shrunk_layout(spark):
    """A re-run under a new lineage with FEWER ranges must not silently read
    the old layout's leftover range=N directories back in."""
    shutil.rmtree(OUT, ignore_errors=True)
    wide = CP.make_ranges(0, NX * NY, 8)
    lin_a = CP.lineage_hash("pieces", [SF_SMOKE], version="A")
    CP.run_stage(spark, "pieces", _pieces_fn(spark), "grid_id",
                 wide, OUT, lin_a)
    total = CP.load_stage(spark, OUT, "pieces", lin_a).count()

    # new lineage, 2 ranges covering only the first half of the key space:
    # ranges 2..7 from layout A stay on disk but must NOT be read
    narrow = CP.make_ranges(0, (NX * NY) // 2, 2)
    lin_b = CP.lineage_hash("pieces", [SF_SMOKE], version="B")
    CP.run_stage(spark, "pieces", _pieces_fn(spark), "grid_id",
                 narrow, OUT, lin_b)
    got = CP.load_stage(spark, OUT, "pieces", lin_b)
    assert got.count() < total
    assert got.select(F.max("grid_id")).first()[0] < (NX * NY) // 2
    # the bare glob (legacy) would have over-read — prove the stale dirs exist
    assert CP.load_stage(spark, OUT).count() > got.count()
    shutil.rmtree(OUT, ignore_errors=True)
