# -*- coding: utf-8 -*-
"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_bruteforce``: exact baseline — broadcast probe set, dot
  products as Column expressions (F.zip_with/F.aggregate, JVM-side).
- ``cosine_topk_lsh``: the 100 TB path — random-hyperplane LSH: 64-bit
  sign signature per vector (one matmul in a pandas UDF), banded into
  buckets, candidates from bucket equi-joins only, exact re-rank inside
  buckets. Probing multiple bands trades recall for candidate volume.
- ``cosine_near_dup_pairs``: embedding near-dup detection for the dedup
  family — same LSH buckets, pairs above a cosine threshold.

Hyperplanes are seeded-deterministic, so signatures are reproducible
across runs/executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import LongType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_sim_col(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk_bruteforce(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k per probe. probes: (probe_id, embedding). Broadcast the
    probe side; the corpus never shuffles until the final per-probe top-k."""
    p = F.broadcast(
        probes.select(F.col(probe_id_col), F.col(vec_col).alias("_pvec"))
    )
    j = vectors.select(F.col(id_col), F.col(vec_col)).crossJoin(p)
    scored = j.withColumn("cos_sim", cosine_sim_col(F.col(vec_col), F.col("_pvec")))
    w = Window.partitionBy(probe_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id_col, id_col, "rank", F.round(F.col("cos_sim") * 10000).cast("long").alias("cos_1e4"))
    )


def _hyperplanes(dim: int, bits: int = 64, seed: int = 7) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((dim, bits))


def lsh_signature_udf(dim: int, bits: int = 64, seed: int = 7):
    """int64 random-hyperplane signature (sign bits of one matmul)."""
    planes = _hyperplanes(dim, bits, seed)

    @pandas_udf(LongType())
    def _sig(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits_m = (m @ planes) > 0
        weights = (np.uint64(1) << np.arange(bits, dtype=np.uint64))
        sig = (bits_m.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        return pd.Series(sig.view(np.int64))

    return _sig


def _banded(df: DataFrame, sig_col: str, bands: int, bits: int = 64) -> DataFrame:
    """Explode a signature into (band, band_bits) rows — pure bit math."""
    per = bits // bands
    mask = (1 << per) - 1
    bands_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col(sig_col), b * per).bitwiseAND(F.lit(mask)).alias("bhash"),
            )
            for b in range(bands)
        ]
    )
    return df.withColumn("_bb", F.explode(bands_arr)).select(
        "*", F.col("_bb.band").alias("band"), F.col("_bb.bhash").alias("bhash")
    ).drop("_bb")


def cosine_topk_lsh(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    bands: int = 16,
    bits: int = 64,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH banded bucket join + exact re-rank
    of bucket candidates. With bands=16 (4 bits/band) recall on clustered
    data is near-1; at planet scale the bucket join replaces the cross
    join — candidates per probe ~ corpus/2^bits_per_band per band."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    sig = lsh_signature_udf(dim, bits)

    v = _banded(
        vectors.select(F.col(id_col), F.col(vec_col)).withColumn("_sig", sig(F.col(vec_col))),
        "_sig", bands, bits,
    )
    p = _banded(
        probes.select(
            F.col(probe_id_col), F.col(vec_col).alias("_pvec")
        ).withColumn("_sig", sig(F.col("_pvec"))),
        "_sig", bands, bits,
    )
    cand = (
        v.join(F.broadcast(p), on=["band", "bhash"], how="inner")
        .dropDuplicates([probe_id_col, id_col])
        .withColumn("cos_sim", cosine_sim_col(F.col(vec_col), F.col("_pvec")))
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id_col, id_col, "rank", F.round(F.col("cos_sim") * 10000).cast("long").alias("cos_1e4"))
    )


def train_ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 64,
    sample_rows: int = 20_000,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> np.ndarray:
    """Spherical k-means centroids from a deterministic corpus sample.

    The sample is a deterministic hash-ordered top-N (reproducible
    regardless of partitioning) and the Lloyd iterations run driver-side
    in numpy — at 100 TB the index BUILD stays O(sample) and costs
    EXACTLY ONE corpus job: orderBy(hash).limit(N) compiles to
    TakeOrderedAndProject (per-partition size-N heaps merged on the
    driver — a single pass, never a full sort and never a count()).
    Returns (n_centroids, dim) unit rows."""
    samp = (
        vectors.select(F.col(vec_col), F.xxhash64(F.col(id_col)).alias("_h"))
        .orderBy("_h")
        .limit(sample_rows)
        .toPandas()[vec_col]
    )
    m = np.stack([np.asarray(v, dtype=np.float64) for v in samp])
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(m))
    cent = m[rng.choice(len(m), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(k):
            members = m[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def _ivf_assign_udf(centroids: np.ndarray):
    """centroid id of each vector — one matmul per Arrow batch."""
    planes = centroids.T  # (dim, k)

    @pandas_udf(LongType())
    def _assign(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ planes, axis=1).astype(np.int64))

    return _assign


def cosine_topk_ivf(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_centroids: int = 64,
    nprobe: int = 4,
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    max_probes: int = 100_000,
) -> DataFrame:
    """IVF-flat approximate top-k — the second scale path next to
    ``cosine_topk_lsh``. Corpus rows get one centroid id (inverted list);
    each probe searches only its ``nprobe`` nearest lists, so candidate
    volume is ~ corpus * nprobe / n_centroids on balanced lists. The
    centroid-id equi-join is shuffle-free on the corpus side beyond the
    bucketing column itself; probes are broadcast."""
    if centroids is None:
        centroids = train_ivf_centroids(
            vectors, n_centroids, id_col=id_col, vec_col=vec_col
        )
    assign = _ivf_assign_udf(centroids)

    v = vectors.select(F.col(id_col), F.col(vec_col)).withColumn(
        "_cid", assign(F.col(vec_col))
    )

    # nprobe nearest centroids per probe: probes are the SMALL side —
    # compute driver-side in one matmul, explode to (probe, cid) pairs.
    # The collect is guarded: limit(max_probes+1) bounds the transfer
    # itself, so an unexpectedly large probe frame fails fast instead of
    # OOMing the driver (large probe sets belong in cosine_topk_lsh,
    # whose probe side stays distributed).
    ppd = (
        probes.select(F.col(probe_id_col), F.col(vec_col).alias("_pvec"))
        .limit(max_probes + 1)
        .toPandas()
    )
    if len(ppd) > max_probes:
        raise ValueError(
            f"cosine_topk_ivf: probe frame exceeds max_probes={max_probes}; "
            "use cosine_topk_lsh for large probe sets or raise max_probes"
        )
    pm = np.stack([np.asarray(x, dtype=np.float64) for x in ppd["_pvec"]])
    pm_n = pm / np.maximum(np.linalg.norm(pm, axis=1, keepdims=True), 1e-12)
    order = np.argsort(-(pm_n @ centroids.T), axis=1)[:, :nprobe]
    probe_cids = pd.DataFrame(
        {
            probe_id_col: ppd[probe_id_col].repeat(order.shape[1]).values,
            "_cid": order.reshape(-1).astype(np.int64),
            "_pvec": ppd["_pvec"].repeat(order.shape[1]).values,
        }
    )
    p = F.broadcast(vectors.sparkSession.createDataFrame(probe_cids))

    cand = (
        v.join(p, on="_cid", how="inner")
        .withColumn("cos_sim", cosine_sim_col(F.col(vec_col), F.col("_pvec")))
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id_col, id_col, "rank", F.round(F.col("cos_sim") * 10000).cast("long").alias("cos_1e4"))
    )


def cosine_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    bands: int = 16,
    bits: int = 64,
    max_bucket_size: int = 500,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cos >= threshold) via
    the same LSH buckets — the dedup-family member for embeddings. Buckets
    above ``max_bucket_size`` are dropped before the O(bucket^2) self-join
    (see dedup.cap_lsh_buckets / lsh_dropped_bucket_stats)."""
    from .dedup import cap_lsh_buckets

    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    sig = lsh_signature_udf(dim, bits)
    b = _banded(
        vectors.select(F.col(id_col), F.col(vec_col)).withColumn("_sig", sig(F.col(vec_col))),
        "_sig", bands, bits,
    )
    b = cap_lsh_buckets(b, max_bucket_size)
    l = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), "band", "bhash")
    r = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), "band", "bhash")
    pairs = (
        l.join(r, on=["band", "bhash"], how="inner")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cos_sim", cosine_sim_col(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cos_sim") >= threshold)
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("cos_sim") * 10000).cast("long").alias("cos_1e4")
    )
