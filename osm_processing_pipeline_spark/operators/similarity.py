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


def brute_force_topk(embeddings: DataFrame, k: int,
                     n_shards: int = 16,
                     n_chunks: int | None = None) -> DataFrame:
    """(vec_id, rank, neighbor_id, cos_nano) — exact cosine top-k via a
    distributed block-matrix product (no driver collect anywhere).

    Both sides of the N x N product are packed into dense blocks: the probe
    side into ``n_chunks`` row-chunks, the index side into ``n_shards``
    column-shards (plain groupBy-collect_list — each block is one row holding
    a small dense matrix).  The chunk x shard grid is enumerated by exploding
    each probe chunk over the shard ids and SHUFFLE-joining on ``sh`` — no
    executor ever holds more than the shard blocks hashed to it, and nothing
    is broadcast (FAISS shards the index; it does not replicate it).  An
    Arrow kernel runs ONE BLAS matmul per grid cell, emitting only each
    probe's per-shard top-k.  A final window re-rank over the k*n_shards
    partial candidates per probe recovers the exact global top-k.

    Exact because inputs are pre-quantized to 2^20, so every product and
    partial sum is an integer below 2^53 — the identical value tree as the
    SQL oracle.  Data moved is O(N * n_chunks + N * n_shards) block bytes
    (each shard is shipped once per probe chunk), never O(N^2) pair rows,
    and the GEMM work is evenly spread over the chunk x shard task grid —
    this is the FAISS-style sharded-index brute-force layout."""
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    if n_chunks is None:
        # ~2-4 grid cells per core: fat enough for the GEMM to amortize the
        # Arrow/worker overhead, parallel enough to fill the cluster
        n_chunks = max(1, min(spark.sparkContext.defaultParallelism, 8))
    e = embeddings.select("vec_id", "embedding")
    packed = F.collect_list(F.struct("vec_id", "embedding")).alias("items")
    chunks = (e.groupBy(F.pmod("vec_id", F.lit(n_chunks)).alias("pc"))
              .agg(packed).withColumnRenamed("items", "probe_items"))
    shards = (e.groupBy(F.pmod("vec_id", F.lit(n_shards)).alias("sh"))
              .agg(packed).withColumnRenamed("items", "index_items"))
    shard_ids = F.array(*[F.lit(s).cast("long") for s in range(n_shards)])
    grid = (chunks.select("probe_items", F.explode(shard_ids).alias("sh"))
            .join(shards.hint("shuffle_hash"), "sh"))

    def _unpack(items):
        ids = np.asarray([d["vec_id"] for d in items], dtype=np.int64)
        M = np.floor(np.stack([np.asarray(d["embedding"], dtype=np.float64)
                               for d in items]) * QIN)
        order = np.argsort(ids, kind="stable")
        return ids[order], M[order]

    def kernel(batches):
        for pdf in batches:
            for pr_items, ix_items in zip(pdf["probe_items"],
                                          pdf["index_items"]):
                a_ids, Aq = _unpack(pr_items)
                b_ids, Bq = _unpack(ix_items)   # id-ascending: stable sort on
                #                                 -cos then yields id-asc ties
                na = (Aq * Aq).sum(axis=1)   # exact: terms < 2^40, sum < 2^46
                nb = (Bq * Bq).sum(axis=1)
                # one BLAS matmul per (chunk, shard) grid cell: every product
                # and partial sum is an exact float64 integer
                dt = Aq @ Bq.T
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.floor(
                        (dt / np.sqrt(na[:, None] * nb[None, :])) * 1.0e9)
                valid = ((na > 0)[:, None] & (nb > 0)[None, :]
                         & (b_ids[None, :] != a_ids[:, None]))
                cosm = np.where(valid, cos, -np.inf)
                kk = min(k, cosm.shape[1])
                top = np.argsort(-cosm, axis=1, kind="stable")[:, :kk]
                top_cos = np.take_along_axis(cosm, top, axis=1)
                keep = np.isfinite(top_cos).ravel()
                yield pd.DataFrame({
                    "vec_id": np.repeat(a_ids, kk)[keep],
                    "neighbor_id": b_ids[top].ravel()[keep],
                    "cos_nano": top_cos.ravel()[keep].astype(np.int64),
                })

    partial = grid.repartition(n_chunks * n_shards).mapInPandas(
        kernel, schema="vec_id long, neighbor_id long, cos_nano long")
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_nano").desc(),
                                             F.col("neighbor_id").asc())
    return (partial.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("vec_id", F.col("rank").cast("long").alias("rank"),
                    "neighbor_id", "cos_nano"))


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
IVF_KMEANS_ITERS = 2   # fixed-count Lloyd: both engines run the identical
                       # iteration sequence, so the trained centroids twin


def _quantized(embeddings: DataFrame) -> DataFrame:
    """norms() plus the int64-quantized vector qv = floor(emb * 2^20) —
    every k-means dot/score below is exact integer arithmetic on qv."""
    return norms(embeddings).withColumn(
        "qv", F.expr(f"transform(emb, x -> CAST(floor(x * {QIN}) AS BIGINT))"))


def _score_cols(cents: list[list[int]]):
    """L2 rank scores vs the trained centroid literals: score_j =
    |c_j|^2 - 2 * dot(qv, c_j) (the |x|^2 term is common to all j and
    dropped — the ranking is the exact L2 ranking).  All int64: |qv_i|,
    |c_i| < 2^20 so dots < 2^46 and scores < 2^47."""
    outs = []
    for j, c in enumerate(cents):
        c2 = sum(v * v for v in c)
        arr = "array(" + ", ".join(f"{v}L" for v in c) + ")"
        outs.append(F.expr(
            f"{c2}L - 2L * aggregate(zip_with(qv, {arr}, (x, y) -> x * y), "
            "0L, (acc, v) -> acc + v)").alias(f"s{j}"))
    return outs


def _argmin2(cols):
    """(best_j, second_j) over the score columns, smallest-j ties — the
    coarse quantizer assign + nprobe=2 probe set.  Mask value 2^62 exceeds
    every real score (< 2^47)."""
    n = len(cols)
    best_v = F.least(*cols)
    best_j = F.lit(n - 1)
    for j in range(n - 2, -1, -1):
        best_j = F.when(cols[j] == best_v, F.lit(j)).otherwise(best_j)
    masked = [F.when(F.lit(j) == best_j, F.lit(1 << 62)).otherwise(cols[j])
              for j in range(n)]
    sec_v = F.least(*masked)
    sec_j = F.lit(n - 1)
    for j in range(n - 2, -1, -1):
        sec_j = F.when(masked[j] == sec_v, F.lit(j)).otherwise(sec_j)
    return best_j, sec_j


def train_ivf_centroids(embeddings: DataFrame) -> list[list[int]]:
    """Fixed-count Lloyd k-means over the int64-quantized vectors,
    deterministic end-to-end: seeds are the IVF_LISTS lowest vec_ids with
    nrm > 0; each iteration assigns by exact integer L2 rank (smallest-j
    ties) and recenters to the elementwise floor(mean) (exact: sums stay
    below 2^53, so the one double division is correctly rounded and
    engine-identical); empty clusters keep their previous centroid.  Only
    O(K*D) bytes ever reach the driver (seed rows + 16x64 dim sums per
    iteration — the canonical distributed-k-means shape; the per-vector
    assign/sum passes stay on the executors)."""
    import math

    q = _quantized(embeddings).filter(F.col("nrm") > 0).select("vec_id", "qv")
    seeds = q.orderBy("vec_id").limit(IVF_LISTS).collect()
    cents = [list(r["qv"]) for r in seeds]
    for _ in range(IVF_KMEANS_ITERS):
        a = q.select("qv", *_score_cols(cents))
        best_j, _ = _argmin2([F.col(f"s{j}") for j in range(IVF_LISTS)])
        stats = (a.select(best_j.alias("j"), F.posexplode("qv").alias("i", "x"))
                 .groupBy("j", "i")
                 .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
                 .collect())
        nxt = [list(c) for c in cents]          # empty cluster keeps old
        for r in stats:
            nxt[r["j"]][r["i"]] = math.floor(r["s"] / r["n"])
        cents = nxt
    return cents


def ivf_ann_top1(embeddings: DataFrame) -> DataFrame:
    """IVF ANN with TRAINED centroids: fixed-count Lloyd over the corpus
    builds the 16 inverted lists (train_ivf_centroids); every vector is
    assigned to its nearest centroid, a query probes its top-2 lists
    (nprobe=2) and exact-cosine re-ranks the candidates.  The scale shape
    of FAISS-style IVF — index side partitioned by list id, probe side
    exploded x nprobe, training touches the driver only with O(K*D) bytes —
    with the engine's deterministic integer dot machinery."""
    cents = train_ivf_centroids(embeddings)
    pr = _quantized(embeddings).select("vec_id", "emb", "nrm", "qv",
                                       *_score_cols(cents))
    scols = [F.col(f"s{j}") for j in range(IVF_LISTS)]
    best_j, sec_j = _argmin2(scols)
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
