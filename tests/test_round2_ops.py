"""Unit tests for round-2 operators: DBSCAN semantics, the hot-shingle
df-filter, and line-interpolated sampling edge cases."""

import pandas as pd
from pyspark.sql import functions as F

from osm_processing_pipeline_spark import worldspec as W
from osm_processing_pipeline_spark.operators import clusters, dedup, zonal


def test_dbscan_core_border_noise(spark):
    # horizontal 5-line at row 10 (cols 10..14): 3 cores + 2 border tips;
    # isolated cell far away: noise (dropped); pair of cells: noise (no core)
    line = [10 * W.NX + c for c in range(10, 15)]
    pair = [50 * W.NX + 50, 50 * W.NX + 51]
    iso = [100 * W.NX + 100]
    cells = spark.createDataFrame(
        [(g,) for g in line + pair + iso], "grid_id long")
    out = clusters.dbscan(cells, W.DBSCAN_EPS_M, W.M_PER_DEG,
                          W.DBSCAN_MINPTS).toPandas()
    rows = {r.grid_id: (r.is_core, r.cluster) for r in out.itertuples()}
    # noise dropped entirely
    assert iso[0] not in rows and pair[0] not in rows and pair[1] not in rows
    # line interior = core, tips = border; one cluster labeled min core id
    lbl = min(line[1:4])
    assert all(rows[g] == (True, lbl) for g in line[1:4])
    assert rows[line[0]] == (False, lbl)
    assert rows[line[4]] == (False, lbl)


def test_eps_neighbors_matches_chebyshev1_at_1500m(spark):
    # at eps=1500 m and ~870 m cells, the eps-disk is exactly the 8-ring:
    # (2,0) offset is 1739 m (out), diagonal (1,1) is 1230 m (in)
    ids = [64 * W.NX + 64, 64 * W.NX + 65, 65 * W.NX + 65, 64 * W.NX + 66]
    cells = spark.createDataFrame([(g,) for g in ids], "grid_id long")
    nbrs = clusters.eps_neighbors(cells, W.DBSCAN_EPS_M, W.M_PER_DEG)
    got = {(r.grid_id, r.nbr) for r in nbrs.collect()}
    assert (ids[0], ids[1]) in got and (ids[0], ids[2]) in got
    assert (ids[0], ids[3]) not in got          # 2 cells apart: 1739 m > eps
    assert (ids[1], ids[3]) in got


def test_df_filter_drops_hot_keys(spark):
    rows = [(f"d{i}", "hot") for i in range(5)] + [("d0", "rare"), ("d1", "rare")]
    sets = spark.createDataFrame(rows, "doc_id string, shingle string")
    kept = dedup.df_filter(sets, max_df=4).toPandas()
    assert set(kept["shingle"]) == {"rare"} and len(kept) == 2
    # pairs computed on the filtered sets: sizes are post-filter
    pairs = dedup.jaccard_pairs(dedup.df_filter(sets, max_df=4)).toPandas()
    assert len(pairs) == 1
    assert pairs.iloc[0]["jaccard_permille"] == 1000   # rare-only sets equal


def test_jaccard_pairs_candidate_mode_matches_self_join(spark):
    """pairs= mode (the LSH-verify scale path) must be row-identical to the
    all-pairs self-join when the candidate list covers every sharing pair —
    including dropping a candidate pair that shares zero keys."""
    rows = [("a", 1), ("a", 2), ("a", 3),
            ("b", 2), ("b", 3), ("b", 4),
            ("c", 9)]                      # c shares nothing with a or b
    sets = spark.createDataFrame(rows, "doc_id string, tok int")
    cand = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "doc_a string, doc_b string")
    full = {tuple(r) for r in
            dedup.jaccard_pairs(sets, key="tok").collect()}
    via = {tuple(r) for r in
           dedup.jaccard_pairs(sets, key="tok", pairs=cand).collect()}
    assert via == full == {("a", "b", 2, 4, 500)}
    # carry= threads per-pair constants through the verify (q16's
    # shared_bands shape) and keeps them between the keys and the counts
    candc = cand.withColumn("tag", F.length("doc_a") + F.length("doc_b"))
    got = dedup.jaccard_pairs(sets, key="tok", pairs=candc,
                              carry=("tag",)).collect()
    assert [tuple(r) for r in got] == [("a", "b", 2, 2, 4, 500)]
    assert got[0].__fields__ == ["doc_a", "doc_b", "tag", "inter_cnt",
                                 "union_cnt", "jaccard_permille"]


def test_line_samples_counts_and_midpoint(spark):
    # a straight 2-vertex way of length ~1087 m -> 3 samples at t=1/6,3/6,5/6
    verts = [{"seq": 0, "lon": 0.25, "lat": 0.25, "node_id": 1},
             {"seq": 1, "lon": 0.25 + 10.0 / 1024.0, "lat": 0.25, "node_id": 2}]
    roads = spark.createDataFrame(
        pd.DataFrame({"osm_id": [1], "vertices": [verts]}))
    out = zonal.line_interpolated_samples(roads).toPandas().sort_values("gs")
    assert list(out["n_samples"]) == [3, 3, 3]
    mid = out.iloc[1]
    assert abs(mid["lon"] - (0.25 + 5.0 / 1024.0)) < 1e-12
    assert (out["lat"] == 0.25).all()


def test_line_samples_zero_length_way(spark):
    verts = [{"seq": 0, "lon": 0.5, "lat": 0.5, "node_id": 1},
             {"seq": 1, "lon": 0.5, "lat": 0.5, "node_id": 2}]
    roads = spark.createDataFrame(
        pd.DataFrame({"osm_id": [7], "vertices": [verts]}))
    out = zonal.line_interpolated_samples(roads).toPandas()
    assert len(out) == 1 and out.iloc[0]["n_samples"] == 1
    assert out.iloc[0]["lon"] == 0.5 and out.iloc[0]["lat"] == 0.5


def test_simhash_first_block_filter_equals_distinct(spark):
    """The first-shared-block filter must emit exactly the distinct candidate
    pairs the old global distinct produced, over signatures engineered to
    share 0..4 blocks."""
    import random

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    rng = random.Random(99)
    sigs = [Row(doc_id=i, simhash=rng.getrandbits(32)) for i in range(80)]
    # force multi-block collisions: clones sharing all 4 / top 2 blocks
    sigs += [Row(doc_id=1000 + i, simhash=sigs[i].simhash) for i in range(10)]
    sigs += [Row(doc_id=2000 + i,
                 simhash=(sigs[i].simhash & 0xFFFF0000) | rng.getrandbits(16))
             for i in range(10)]
    df = spark.createDataFrame(sigs)
    blocks = df.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("blk"),
                     (F.floor(F.col("simhash") / F.lit(1 << (8 * k))).cast("long")
                      % 256).alias("bval"))
            for k in range(4)
        ])).alias("b"),
    ).select("doc_id", "simhash", "b.blk", "b.bval")
    a = blocks.select(F.col("doc_id").alias("doc_a"),
                      F.col("simhash").alias("sa"), "blk", "bval")
    b = blocks.select(F.col("doc_id").alias("doc_b"),
                      F.col("simhash").alias("sb"), "blk", "bval")
    naive = (a.join(b, ["blk", "bval"]).filter(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b").distinct())
    byte_eq = [((F.floor(F.col("sa") / F.lit(1 << (8 * k))) % 256)
                == (F.floor(F.col("sb") / F.lit(1 << (8 * k))) % 256))
               for k in range(4)]
    nmb, acc = [], F.lit(True)
    for k in range(4):
        nmb.append(acc)
        acc = acc & ~byte_eq[k]
    first = F.lit(False)
    for k in range(4):
        first = F.when(F.col("blk") == k, nmb[k]).otherwise(first)
    fast = (a.join(b, ["blk", "bval"]).filter(F.col("doc_a") < F.col("doc_b"))
            .filter(first).select("doc_a", "doc_b"))
    nv = {(r.doc_a, r.doc_b) for r in naive.collect()}
    fv = [(r.doc_a, r.doc_b) for r in fast.collect()]
    assert len(fv) == len(set(fv))      # exactly-once per pair
    assert set(fv) == nv
