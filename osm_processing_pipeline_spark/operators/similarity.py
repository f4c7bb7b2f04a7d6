"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, and a random-hyperplane
LSH-bucketed variant as the scale path (bucket equi-join instead of the
all-pairs product).  All dot products quantize the INPUTS to int
(floor(x*2^20)) and sum exact integer products, so results are
deterministic, order-independent, and bit-identical to the SQL oracle —
and, because every partial sum stays below 2^53, the kernel side can
evaluate the identical sum as a float64 BLAS matmul.  Final cosine is a
single deterministic division + sqrt.

The LSH path runs JVM-side via zip_with/aggregate higher-order functions
(fully fused, no Python); the brute-force baseline is the Pandas-UDF-wins
case and uses the Arrow-batched GEMM kernel in ``brute_force_topk``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import worldspec as W

Q = 1.0e9          # cosine output quantum (nano-cosine)
QIN = 2.0 ** 20    # input quantum: floor(x*2^20) -> products stay < 2^53,
                   # so numpy float64 matmul computes the exact integer sum


def _load(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"))


def _qdot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (F.floor(x * F.lit(QIN)).cast("long")
                                       * F.floor(y * F.lit(QIN)).cast("long"))),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def norms(embeddings: DataFrame) -> DataFrame:
    e = _load(embeddings)
    return e.select("vec_id", "emb", _qdot(F.col("emb"), F.col("emb")).alias("nrm"))


def _cos_nano(dt, na, nb) -> F.Column:
    return F.floor(
        (dt.cast("double") / F.sqrt(na.cast("double") * nb.cast("double")))
        * F.lit(Q)).cast("long")


def brute_force_topk(embeddings: DataFrame, k: int) -> DataFrame:
    """(vec_id, rank, neighbor_id, cos_nano) — exact cosine top-k.

    The index side is broadcast as a dense quantized numpy matrix and each
    probe partition runs one BLAS matmul per block — exact, because inputs
    are pre-quantized to 2^20 so every product and partial sum is an integer
    below 2^53 (the identical value tree as the SQL oracle).  This is the
    Pandas-UDF-wins case: a zip_with fold allocates a 64-element array per
    pair, while the kernel amortizes the whole block into one GEMM.  At
    scale the broadcast side becomes a block-partitioned product over index
    shards."""
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    par = spark.sparkContext.defaultParallelism
    e = embeddings.select("vec_id", "embedding")
    b_pdf = e.toPandas()
    Bq = np.floor(np.stack(b_pdf["embedding"].to_numpy()).astype(np.float64)
                  * QIN)
    b_ids = b_pdf["vec_id"].to_numpy(np.int64)
    nb = (Bq * Bq).sum(axis=1)        # exact: terms < 2^40, 64-dim sum < 2^46
    bc = spark.sparkContext.broadcast((b_ids, Bq, nb))

    def kernel(batches):
        b_ids_, Bq_, nb_ = bc.value
        ok_b = nb_ > 0
        BT = Bq_.T
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Aq = np.floor(np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                          * QIN)
            a_ids = pdf["vec_id"].to_numpy(np.int64)
            na = (Aq * Aq).sum(axis=1)
            out_v, out_r, out_n, out_c = [], [], [], []
            # one BLAS matmul per block: every product and partial sum is an
            # exact float64 integer (inputs quantized to 2^20)
            for lo in range(0, len(Aq), 512):
                hi = min(lo + 512, len(Aq))
                dt = Aq[lo:hi] @ BT
                cos = np.floor(
                    (dt / np.sqrt(na[lo:hi, None] * nb_[None, :])) * 1.0e9)
                for r in range(hi - lo):
                    if na[lo + r] <= 0:
                        continue
                    mask = ok_b & (b_ids_ != a_ids[lo + r])
                    c = cos[r][mask]
                    ids = b_ids_[mask]
                    order = np.lexsort((ids, -c))[:k]
                    out_v.extend([a_ids[lo + r]] * len(order))
                    out_r.extend(range(1, len(order) + 1))
                    out_n.extend(ids[order])
                    out_c.extend(c[order].astype(np.int64))
            yield pd.DataFrame({"vec_id": out_v, "rank": out_r,
                                "neighbor_id": out_n, "cos_nano": out_c})

    return e.repartition(par).mapInPandas(
        kernel, schema="vec_id long, rank long, neighbor_id long, cos_nano long")


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


def embedding_neardup(embeddings: DataFrame, threshold_nano: int) -> DataFrame:
    """Embedding-cosine near-dup dedup decision (LSH-bucketed, the scale
    path): a vector is a duplicate iff some bucket-mate with a LOWER vec_id
    has cosine >= threshold; dup_of is the smallest such id.  Keep-lowest-id
    is the associative tie-break that makes the decision deterministic and
    distributable (same shape as the exact-dedup keep-first rule)."""
    bk = lsh_buckets(embeddings)
    a = bk.select(F.col("vec_id").alias("va"), F.col("emb").alias("ea"),
                  F.col("nrm").alias("na"), "bucket")
    b = bk.select(F.col("vec_id").alias("vb"), F.col("emb").alias("eb"),
                  F.col("nrm").alias("nb"), "bucket")
    cand = a.join(b, "bucket").filter((F.col("vb") < F.col("va"))
                                      & (F.col("na") > 0) & (F.col("nb") > 0))
    cos = cand.withColumn(
        "cos_nano", _cos_nano(_qdot(F.col("ea"), F.col("eb")),
                              F.col("na"), F.col("nb")))
    hits = (cos.filter(F.col("cos_nano") >= threshold_nano)
            .groupBy("va")
            .agg(F.min("vb").alias("dup_of"),
                 F.count("*").cast("long").alias("n_nearmatches"),
                 F.max("cos_nano").alias("best_cos_nano")))
    return (bk.select("vec_id").join(hits, bk.vec_id == hits.va, "left")
            .select("vec_id",
                    F.col("dup_of").isNotNull().alias("is_dup"),
                    "dup_of",
                    F.coalesce("n_nearmatches", F.lit(0)).alias("n_nearmatches"),
                    "best_cos_nano"))


IVF_LISTS = 16
IVF_NPROBE = 2


def _ivf_projs(emb_col: str = "emb"):
    """16 integer centroid projections per vector (centroid j = the fixed
    pseudo-random direction of plane_weight_expr(j); input-quantized dots,
    bit-identical to the SQL twin)."""
    outs = []
    for j in range(IVF_LISTS):
        outs.append(F.expr(
            f"aggregate(transform({emb_col}, (x, i) -> "
            f"CAST(floor(x * {plane_weight_expr(j)} * 1000000000.0D) AS BIGINT)), "
            "0L, (acc, v) -> acc + v)").alias(f"p{j}"))
    return outs


def _argmax2(cols):
    """(best_j, second_j) over 16 numeric columns, first-wins ties —
    the coarse quantizer assign + nprobe=2 probe set."""
    n = len(cols)
    best_v = F.greatest(*cols)
    best_j = F.lit(n - 1)
    for j in range(n - 2, -1, -1):
        best_j = F.when(cols[j] == best_v, F.lit(j)).otherwise(best_j)
    masked = [F.when(F.lit(j) == best_j, F.lit(-(1 << 62))).otherwise(cols[j])
              for j in range(n)]
    sec_v = F.greatest(*masked)
    sec_j = F.lit(n - 1)
    for j in range(n - 2, -1, -1):
        sec_j = F.when(masked[j] == sec_v, F.lit(j)).otherwise(sec_j)
    return best_j, sec_j


def ivf_ann_top1(embeddings: DataFrame) -> DataFrame:
    """IVF ANN: coarse-quantize every vector to its best of 16 fixed centroid
    directions (the inverted lists); a query probes its top-2 lists
    (nprobe=2) and exact-cosine re-ranks the candidates.  The scale shape of
    FAISS-style IVF — index side partitioned by list id, probe side exploded
    x nprobe — with the engine's deterministic integer dot machinery."""
    n = norms(embeddings)
    pr = n.select("vec_id", "emb", "nrm", *_ivf_projs())
    pcols = [F.col(f"p{j}") for j in range(IVF_LISTS)]
    best_j, sec_j = _argmax2(pcols)
    assigned = pr.select("vec_id", "emb", "nrm", best_j.alias("list_id"),
                         sec_j.alias("probe2"))
    index = assigned.select(F.col("vec_id").alias("vb"), F.col("emb").alias("eb"),
                            F.col("nrm").alias("nb"), "list_id")
    probes = assigned.select(
        "vec_id", "emb", "nrm",
        F.explode(F.array(F.col("list_id"), F.col("probe2"))).alias("list_id"))
    cand = (probes.join(index, "list_id")
            .filter((F.col("vb") != F.col("vec_id"))
                    & (F.col("nrm") > 0) & (F.col("nb") > 0)))
    cos = cand.withColumn(
        "cos_nano", _cos_nano(_qdot(F.col("emb"), F.col("eb")),
                              F.col("nrm"), F.col("nb")))
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_nano").desc(),
                                             F.col("vb").asc())
    top = (cos.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") == 1)
           .select("vec_id", F.col("vb").alias("neighbor_id"), "cos_nano"))
    return (assigned.select("vec_id", "list_id").join(top, "vec_id", "left")
            .select("vec_id", F.col("list_id").cast("long").alias("list_id"),
                    "neighbor_id", "cos_nano"))
