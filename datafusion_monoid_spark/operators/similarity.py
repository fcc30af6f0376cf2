"""Similarity search over embedding columns (ARRAY<FLOAT>).

Three tiers, all partial-aggregation-shaped for 100 TB:

* :func:`brute_force_topk` — exact cosine top-k, pure Catalyst
  expressions.  The oracle tier.
* :func:`brute_force_topk_np` — exact top-k, Arrow-batched NumPy matmul
  via ``mapInPandas``: corpus stays partitioned, the (small) query set is
  broadcast, each partition emits its LOCAL top-k and a window takes the
  global top-k — a monoid-style partial/final split (top-k is an
  associative, commutative reduction), so it scales with corpus size.
* :func:`lsh_bucket_topk` / :func:`ivf_topk` — approximate tiers:
  random-hyperplane LSH buckets (deterministic md5-derived planes,
  multi-probe on Hamming-1 neighbors) and IVF with deterministic
  centroids (lowest-id vectors), ``nprobe`` nearest partitions searched.
  Candidates only — never the full cross product.  Recall is measured
  against the brute-force tier in tests, not assumed.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datafusion_monoid_spark.functions.vector import cosine_similarity
from datafusion_monoid_spark.operators.dedup import md5_long


def _ranked_topk(pairs: DataFrame, k: int) -> DataFrame:
    """(query_id, cand_id, sim) -> top-k per query, deterministic
    tie-break on cand_id."""
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cand_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "cand_id", F.round("sim", 3).alias("sim"))
    )


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k, expression-level (JVM, codegen).

    The query side is broadcast; the corpus is never shuffled for the
    join.  Use for small query sets / oracle checks."""
    c = corpus.select(F.col(id_col).alias("cand_id"),
                      F.col(vec_col).cast("array<double>").alias("cvec"))
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   F.col(vec_col).cast("array<double>").alias("qvec")))
    pairs = c.crossJoin(q).where(F.col("query_id") != F.col("cand_id")).select(
        "query_id", "cand_id",
        cosine_similarity(F.col("qvec"), F.col("cvec")).alias("sim"))
    return _ranked_topk(pairs, k)


def brute_force_topk_np(corpus: DataFrame, queries: DataFrame, k: int = 5,
                        id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k at throughput: NumPy matmul per Arrow batch.

    Per-partition local top-k (bounded output: |queries| x k rows per
    partition) then a global window — the same partial/final discipline
    as the monoid core."""
    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows])
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    spark = corpus.sparkSession
    bq = spark.sparkContext.broadcast((qids, qmat))

    def part_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bq.value
        for pdf in batches:
            cids = pdf[id_col].to_numpy()
            cmat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
            sims = mat @ cmat.T                      # |Q| x |batch|
            kk = min(k + 1, sims.shape[1])           # +1: self-match removed later
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out = {
                "query_id": np.repeat(ids, kk),
                "cand_id": cids[idx].ravel(),
                "sim": np.take_along_axis(sims, idx, axis=1).ravel(),
            }
            yield pd.DataFrame(out)

    local = corpus.select(id_col, vec_col).mapInPandas(
        part_topk, schema="query_id long, cand_id long, sim double")
    return _ranked_topk(local.where(F.col("query_id") != F.col("cand_id")), k)


# ---------------------------------------------------------------------------
# Random-hyperplane LSH
# ---------------------------------------------------------------------------

def _plane_weight(plane: int, dim_col) -> F.Column:
    """Deterministic pseudo-random weight in [-1, 1) from md5(plane:dim)."""
    key = F.concat_ws(":", F.lit(plane), dim_col.cast("string"))
    return (md5_long(key) % 2001 - F.lit(1000)) / F.lit(1000.0)


def lsh_signatures(df: DataFrame, n_planes: int = 8,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, vec, bucket BIGINT): sign bits of projections onto n_planes
    deterministic hyperplanes."""
    v = F.col(vec_col).cast("array<double>")
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.transform(F.sequence(F.lit(0), F.size(v) - 1),
                            lambda i, _p=p: _plane_weight(_p, i)),
                lambda x, w: x * w,
            ),
            F.lit(0.0), lambda acc, t: acc + t)
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(0))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return df.select(F.col(id_col).alias("vec_id"), v.alias("vec"),
                     bucket.cast("bigint").alias("bucket"))


def lsh_bucket_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    n_planes: int = 8, multiprobe: bool = True,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: candidates share an LSH bucket (plus Hamming-1 probes
    from the query side), exact cosine re-rank within candidates."""
    csig = lsh_signatures(corpus, n_planes, id_col, vec_col) \
        .withColumnRenamed("vec_id", "cand_id").withColumnRenamed("vec", "cvec")
    qsig = lsh_signatures(queries, n_planes, id_col, vec_col) \
        .withColumnRenamed("vec_id", "query_id").withColumnRenamed("vec", "qvec")
    if multiprobe:
        probes = F.array(F.col("bucket"), *[
            F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)])
        qsig = qsig.select("query_id", "qvec", F.explode(probes).alias("bucket"))
    pairs = (
        F.broadcast(qsig).join(csig, "bucket")
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id",
                cosine_similarity(F.col("qvec"), F.col("cvec")).alias("sim"))
        .dropDuplicates(["query_id", "cand_id"])
    )
    return _ranked_topk(pairs, k)


# ---------------------------------------------------------------------------
# IVF with deterministic centroids
# ---------------------------------------------------------------------------

def ivf_assign(corpus: DataFrame, n_centroids: int = 32,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign every vector to its nearest centroid.

    Centroids are the ``n_centroids`` lowest-id vectors — deterministic,
    no iterative clustering (swap in k-means offline at scale; the search
    path below is unchanged)."""
    cent = F.broadcast(
        corpus.where(F.col(id_col) < n_centroids)
        .select(F.col(id_col).alias("cent_id"),
                F.col(vec_col).cast("array<double>").alias("cent")))
    v = corpus.select(F.col(id_col).alias("cand_id"),
                      F.col(vec_col).cast("array<double>").alias("cvec"))
    d = v.crossJoin(cent).select(
        "cand_id", "cvec", "cent_id",
        cosine_similarity(F.col("cvec"), F.col("cent")).alias("csim"))
    w = Window.partitionBy("cand_id").orderBy(F.col("csim").desc(), F.col("cent_id"))
    return d.withColumn("rn", F.row_number().over(w)).where("rn = 1") \
            .select("cand_id", "cvec", "cent_id")


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 32, nprobe: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF ANN: search only the nprobe nearest centroid partitions."""
    assigned = ivf_assign(corpus, n_centroids, id_col, vec_col)
    cent = F.broadcast(
        corpus.where(F.col(id_col) < n_centroids)
        .select(F.col(id_col).alias("cent_id"),
                F.col(vec_col).cast("array<double>").alias("cent")))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qvec"))
    qc = q.crossJoin(cent).select(
        "query_id", "qvec", "cent_id",
        cosine_similarity(F.col("qvec"), F.col("cent")).alias("csim"))
    w = Window.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("cent_id"))
    probes = qc.withColumn("rn", F.row_number().over(w)) \
               .where(F.col("rn") <= nprobe).select("query_id", "qvec", "cent_id")
    pairs = (
        F.broadcast(probes).join(assigned, "cent_id")
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id",
                cosine_similarity(F.col("qvec"), F.col("cvec")).alias("sim"))
    )
    return _ranked_topk(pairs, k)
