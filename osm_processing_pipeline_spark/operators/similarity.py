"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, and a random-hyperplane
LSH-bucketed variant as the scale path (bucket equi-join instead of the
all-pairs product).  All dot products are computed as sums of per-dimension
int64-quantized terms (floor(x*y*1e9)) so results are deterministic,
order-independent, and bit-identical to the SQL oracle; final cosine is a
single deterministic division + sqrt.

Everything runs JVM-side via zip_with/aggregate higher-order functions —
no Python in the hot path.  (A Pandas-UDF/numpy matmul variant would win on
raw FLOPs for very wide vectors; at 64 dims the codegen'd fold is competitive
and keeps the plan fully fused.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import worldspec as W

Q = 1.0e9


def _load(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"))


def _qdot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.floor((x * y) * F.lit(Q)).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def norms(embeddings: DataFrame) -> DataFrame:
    e = _load(embeddings)
    return e.select("vec_id", "emb", _qdot(F.col("emb"), F.col("emb")).alias("nrm"))


def _cos_nano(dt, na, nb) -> F.Column:
    return F.floor(
        (dt.cast("double") / F.sqrt(na.cast("double") * nb.cast("double")))
        * F.lit(Q)).cast("long")


def brute_force_topk(embeddings: DataFrame, k: int) -> DataFrame:
    """(vec_id, rank, neighbor_id, cos_nano) — exact cosine top-k."""
    n = norms(embeddings)
    a = n.select(F.col("vec_id").alias("va"), F.col("emb").alias("ea"),
                 F.col("nrm").alias("na"))
    b = n.select(F.col("vec_id").alias("vb"), F.col("emb").alias("eb"),
                 F.col("nrm").alias("nb"))
    pairs = a.crossJoin(b).filter((F.col("va") != F.col("vb"))
                                  & (F.col("na") > 0) & (F.col("nb") > 0))
    cos = pairs.withColumn(
        "cos_nano", _cos_nano(_qdot(F.col("ea"), F.col("eb")),
                              F.col("na"), F.col("nb")))
    w = Window.partitionBy("va").orderBy(F.col("cos_nano").desc(),
                                         F.col("vb").asc())
    return (cos.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("va").alias("vec_id"),
                    F.col("rank").cast("long").alias("rank"),
                    F.col("vb").alias("neighbor_id"), "cos_nano"))


def plane_weight_expr(j: int) -> str:
    """Hyperplane weight w[j][i] for 0-based dim i (SQL/Catalyst shared form):
    ((j*131 + i*737) % 1001 - 500) / 500.0"""
    return (f"(CAST((({j} * 131) + (i * 737)) % 1001 - 500 AS DOUBLE) / 500.0D)")


def lsh_buckets(embeddings: DataFrame) -> DataFrame:
    """(vec_id, emb, nrm, bucket) — sign-of-projection bits packed into a
    16-bit bucket id.  Projections use the same int64-quantized terms."""
    n = norms(embeddings)
    bucket = F.lit(0).cast("long")
    for j in range(W.ANN_PLANES):
        s = F.expr(
            "aggregate(transform(emb, (x, i) -> "
            f"CAST(floor((x * {plane_weight_expr(j)}) * 1000000000.0D) AS BIGINT)), "
            "0L, (acc, v) -> acc + v)")
        bucket = bucket + F.when(s > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return n.withColumn("bucket", bucket)


def lsh_ann_top1(embeddings: DataFrame) -> DataFrame:
    """Approximate NN: candidates share a bucket; exact cosine re-rank; top-1.
    Vectors with no bucket-mates surface with NULL neighbor (deterministic
    recall profile, verified against the identical SQL oracle)."""
    bk = lsh_buckets(embeddings)
    a = bk.select(F.col("vec_id").alias("va"), F.col("emb").alias("ea"),
                  F.col("nrm").alias("na"), "bucket")
    b = bk.select(F.col("vec_id").alias("vb"), F.col("emb").alias("eb"),
                  F.col("nrm").alias("nb"), "bucket")
    cand = a.join(b, "bucket").filter((F.col("va") != F.col("vb"))
                                      & (F.col("na") > 0) & (F.col("nb") > 0))
    cos = cand.withColumn(
        "cos_nano", _cos_nano(_qdot(F.col("ea"), F.col("eb")),
                              F.col("na"), F.col("nb")))
    w = Window.partitionBy("va").orderBy(F.col("cos_nano").desc(), F.col("vb").asc())
    top = (cos.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") == 1)
           .select(F.col("va").alias("vec_id"), F.col("vb").alias("neighbor_id"),
                   "cos_nano"))
    return (bk.select("vec_id", "bucket").join(top, "vec_id", "left")
            .select("vec_id", "bucket", "neighbor_id", "cos_nano"))
