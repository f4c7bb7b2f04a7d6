"""Span-sequence invariant: every surviving document must carry its spans
array byte-identical through the engine (the analogue of the reference's
tag-merging PBF writer forwarding all content unchanged,
scripts/write_tags_to_pbf_2.py:181-199)."""

from pyspark.sql import functions as F

from osm_processing_pipeline_spark.datagen import world
from osm_processing_pipeline_spark.operators import classify
from osm_processing_pipeline_spark.sources import documents as D
from tests.conftest import SF_SMOKE


def test_span_sequence_preserved_through_pipeline(spark):
    roads = world.roads(spark, SF_SMOKE)
    docs = D.encode_road_documents(roads)
    parsed = D.parse_road_documents(docs)

    # run a real computation on the parsed view and attach results as new
    # top-level columns; spans ride through untouched
    segs = world.segments(spark, SF_SMOKE, roads)
    grid = world.grids(spark)
    feats = classify.classify_roads(roads, segs, grid)
    out = parsed.join(feats, "osm_id", "left")

    bad = D.assert_span_equality(docs, out)
    assert bad.count() == 0

    # parsed geometry is an exact binary round-trip of the source vertices
    src = roads.select("osm_id", F.col("vertices.lon").alias("lons"))
    rt = parsed.select("osm_id", F.col("vertices.lon").alias("lons_rt"))
    diff = (src.join(rt, "osm_id")
            .filter(F.col("lons") != F.col("lons_rt")))
    assert diff.count() == 0


def test_span_mutation_detected(spark):
    roads = world.roads(spark, SF_SMOKE)
    docs = D.encode_road_documents(roads)
    mutated = docs.withColumn(
        "spans", F.expr("slice(spans, 1, size(spans) - 1)"))
    bad = D.assert_span_equality(docs, mutated)
    assert bad.count() == docs.count()
