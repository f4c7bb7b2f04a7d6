"""Hand-computed fixtures for the derived-scoring operators (q28-q31)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from osm_processing_pipeline_spark import worldspec as W
from osm_processing_pipeline_spark.operators import scoring


def test_parse_lanes_cases(spark):
    df = spark.createDataFrame(
        [("3",), ("12",), ("2-4",), ("two",), (None,)], "lanes string")
    got = [r[0] for r in
           df.select(scoring.parse_lanes(F.col("lanes"))).collect()]
    assert got == [3, W.LANES_CAP, 4, W.LANES_DEFAULT, W.LANES_DEFAULT]


def _mk_world(spark, n_shared_ways, way_len_deg):
    """n_shared_ways 2-vertex ways all meeting at node 1 (their first vertex),
    each of the same planar length; highways chosen non-top-hierarchy."""
    wn, segs = [], []
    for wid in range(n_shared_ways):
        # distinct second nodes, shared first node id=1
        wn.append(Row(way_id=wid, highway="residential", nv=2, seq=0,
                      node_id=1, lon=0.0, lat=0.0))
        wn.append(Row(way_id=wid, highway="residential", nv=2, seq=1,
                      node_id=100 + wid, lon=way_len_deg, lat=0.0))
        segs.append(Row(osm_id=wid, ax=0.0, ay=0.0, bx=way_len_deg, by=0.0))
    return spark.createDataFrame(wn), spark.createDataFrame(segs)


def test_degradation_stacked_branch(spark):
    # 3 ways meet at one node -> three_way (base 0.125), no top-hierarchy
    # doubling; each way is short (<500 m) -> multiplicative branch with a
    # single intersection: 1 - (1 - 0.125) = 0.125 -> 125000 ppm.
    wn, segs = _mk_world(spark, 3, 0.001)  # ~111 m
    out = {r["osm_id"]: r for r in
           scoring.intersection_degradation(wn, segs).collect()}
    assert len(out) == 3
    for r in out.values():
        assert r["n_int"] == 1
        assert r["max_red_ppm"] == 125000
        assert r["final_red_ppm"] == 125000


def _two_int_way(spark, seg_len_deg):
    """Way 0 passes two qualifying intersections: node 1 (with a primary ->
    crossing 0.0625 doubled = 0.125) and node 3 (with a secondary -> 0.0625)."""
    rows = [
        Row(way_id=0, highway="residential", nv=3, seq=0, node_id=1, lon=0.0, lat=0.0),
        Row(way_id=0, highway="residential", nv=3, seq=1, node_id=2, lon=seg_len_deg, lat=0.0),
        Row(way_id=0, highway="residential", nv=3, seq=2, node_id=3, lon=2 * seg_len_deg, lat=0.0),
        Row(way_id=10, highway="primary", nv=2, seq=0, node_id=1, lon=0.0, lat=0.0),
        Row(way_id=10, highway="primary", nv=2, seq=1, node_id=50, lon=0.0, lat=0.001),
        Row(way_id=20, highway="secondary", nv=2, seq=0, node_id=3, lon=2 * seg_len_deg, lat=0.0),
        Row(way_id=20, highway="secondary", nv=2, seq=1, node_id=60, lon=2 * seg_len_deg, lat=0.001),
    ]
    segs = [
        Row(osm_id=0, ax=0.0, ay=0.0, bx=seg_len_deg, by=0.0),
        Row(osm_id=0, ax=seg_len_deg, ay=0.0, bx=2 * seg_len_deg, by=0.0),
        Row(osm_id=10, ax=0.0, ay=0.0, bx=0.0, by=0.001),
        Row(osm_id=20, ax=2 * seg_len_deg, ay=0.0, bx=2 * seg_len_deg, by=0.001),
    ]
    return spark.createDataFrame(rows), spark.createDataFrame(segs)


def test_degradation_stacked_vs_weighted(spark):
    # short way (~222 m) -> multiplicative stack:
    #   1 - (1-0.125)(1-0.0625) = 0.1796875 -> round -> 179688 ppm
    wn, segs = _two_int_way(spark, 0.001)
    r = {x["osm_id"]: x for x in
         scoring.intersection_degradation(wn, segs).collect()}[0]
    assert r["n_int"] == 2
    assert r["sum_red_ppm"] == 187500
    assert r["final_red_ppm"] == 179688
    # long way (~557 m) -> integer-average branch: 187500 div 2 = 93750
    wn, segs = _two_int_way(spark, 0.0025)
    r = {x["osm_id"]: x for x in
         scoring.intersection_degradation(wn, segs).collect()}[0]
    assert r["final_red_ppm"] == 93750


def test_degradation_major_road_doubles(spark):
    # one trunk way through the node -> reduction doubled
    wn, segs = _mk_world(spark, 2, 0.001)
    extra_wn = spark.createDataFrame([
        Row(way_id=99, highway="trunk", nv=2, seq=0, node_id=1, lon=0.0, lat=0.0),
        Row(way_id=99, highway="trunk", nv=2, seq=1, node_id=999, lon=0.001, lat=0.0),
    ])
    extra_seg = spark.createDataFrame([Row(osm_id=99, ax=0.0, ay=0.0, bx=0.001, by=0.0)])
    out = {r["osm_id"]: r for r in scoring.intersection_degradation(
        wn.unionByName(extra_wn), segs.unionByName(extra_seg)).collect()}
    # 3 distinct ways, 2 highway types -> qualifies; three_way base 0.125,
    # doubled by trunk -> 0.25; short ways -> stacked = 250000
    assert out[99]["final_red_ppm"] == 250000
    assert out[0]["final_red_ppm"] == 250000


def test_persona_two_pass_bounds(spark):
    from osm_processing_pipeline_spark.datagen import world
    r = world.roads_materialized(spark, "/root/testdata/sf0.001")
    out = scoring.persona_scores(r)
    mn, mx = out.agg(F.min("norm_bp"), F.max("norm_bp")).first()
    assert mn == 0 and mx == 10000  # extremes always hit the bounds


def test_degradation_pivot_matches_window_reference(spark):
    """The sort_array(collect_set(struct(-rank, highway))) pivot must rank
    identically to the row_number window it replaced: hierarchy desc, then
    highway asc, over the distinct highways at the node."""
    import random

    from pyspark.sql import Window

    rng = random.Random(20260817)
    hws = list(W.HIERARCHY)
    rows = [Row(node_id=i % 37, way_id=i, highway=rng.choice(hws))
            for i in range(400)]
    pe = spark.createDataFrame(rows)
    nt = pe.select("node_id", "highway").distinct()
    rn = F.row_number().over(
        Window.partitionBy("node_id")
        .orderBy(scoring.hierarchy(F.col("highway")).desc(),
                 F.col("highway").asc()))
    want = (nt.withColumn("rn", rn).filter(F.col("rn") <= 2)
            .groupBy("node_id")
            .agg(F.max(F.when(F.col("rn") == 1, F.col("highway"))).alias("t1"),
                 F.max(F.when(F.col("rn") == 2, F.col("highway"))).alias("t2")))
    ranked = F.struct((-scoring.hierarchy(F.col("highway"))).alias("nh"),
                      F.col("highway").alias("hw"))
    got = (pe.groupBy("node_id")
           .agg(F.sort_array(F.collect_set(ranked)).alias("arr"))
           .select("node_id", F.col("arr")[0]["hw"].alias("t1"),
                   F.element_at("arr", 2)["hw"].alias("t2")))
    w = {r["node_id"]: (r["t1"], r["t2"]) for r in want.collect()}
    g = {r["node_id"]: (r["t1"], r["t2"]) for r in got.collect()}
    assert w == g
