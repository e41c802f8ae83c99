"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Scale pattern: queries are broadcast as one dense matrix; each task
  computes a (batch × queries) GEMM and emits only its local top-k per
  query, so the shuffle carries n_partitions × n_queries × k rows, not
  the corpus.
- ``lsh_topk``: random-hyperplane LSH bucketing — the 100TB path.
  Corpus vectors hash to sign-bit buckets; queries probe their bucket
  plus all Hamming-1 neighbors, then re-rank exactly inside the
  candidate set. Recall < 1 by design; tests measure it.
- ``embedding_near_pairs``: near-duplicate vector pairs (cos >= t) via
  bucketed self-join + exact verification.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, IntegerType, LongType,
                               StructField, StructType)

from ..kernels.keys import splitmix64


def _matrix(series: pd.Series) -> np.ndarray:
    return np.array([np.asarray(v, dtype=np.float64) for v in series])


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine → (query_id, neighbor_id, rank). Ranks are
    1-based; ties broken by neighbor id (deterministic). Self-matches
    (same id) are excluded."""
    spark = corpus.sparkSession
    qrows = queries.select(query_id_col, vec_col).collect()
    qids = np.array([r[query_id_col] for r in qrows])
    qmat = _normalize(np.array([np.asarray(r[vec_col], dtype=np.float64)
                                for r in qrows]))
    bc = spark.sparkContext.broadcast((qids, qmat))

    schema = StructType([
        StructField("query_id", corpus.schema[id_col].dataType),
        StructField("neighbor_id", corpus.schema[id_col].dataType),
        StructField("cosine", DoubleType()),
    ])

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qmat_ = bc.value
        best: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            m = _normalize(_matrix(pdf[vec_col]))
            sims = m @ qmat_.T                      # (batch, n_queries)
            for qi in range(len(qids_)):
                col = sims[:, qi]
                mask = ids != qids_[qi]
                cand_ids, cand_sims = ids[mask], col[mask]
                if len(cand_ids) == 0:
                    continue
                take = min(k, len(cand_ids))
                part = np.argpartition(-cand_sims, take - 1)[:take]
                prev = best.get(qi)
                merged_ids = cand_ids[part]
                merged_sims = cand_sims[part]
                if prev is not None:
                    merged_ids = np.concatenate([prev[0], merged_ids])
                    merged_sims = np.concatenate([prev[1], merged_sims])
                    take = min(k, len(merged_ids))
                    part2 = np.argpartition(-merged_sims, take - 1)[:take]
                    merged_ids, merged_sims = merged_ids[part2], \
                        merged_sims[part2]
                best[qi] = (merged_ids, merged_sims)
        rows = []
        for qi, (nids, sims) in best.items():
            for nid, s in zip(nids, sims):
                rows.append((qids_[qi], nid, float(s)))
        if rows:
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id",
                                              "cosine"])

    partial = corpus.select(id_col, vec_col).mapInPandas(local_topk,
                                                         schema=schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (partial.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


# --- LSH-bucketed ANN ------------------------------------------------------

def _hyperplanes(dim: int, n_bits: int, seed: int = 0x5EED) -> np.ndarray:
    """Deterministic pseudo-Gaussian hyperplanes from splitmix bits."""
    raw = splitmix64(dim * n_bits * 2, seed=seed).astype(np.float64)
    u1 = raw[: dim * n_bits] / 2.0**64
    u2 = raw[dim * n_bits:] / 2.0**64
    u1 = np.clip(u1, 1e-12, 1 - 1e-12)
    g = np.sqrt(-2 * np.log(u1)) * np.cos(2 * np.pi * u2)  # Box-Muller
    return g.reshape(n_bits, dim)


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0]))[None, :]
    return (bits * weights).sum(axis=1).astype(np.int64)


def lsh_buckets(df: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding", n_bits: int = 12,
                dim: int = 64, seed: int = 0x5EED) -> DataFrame:
    """→ (id, bucket) via random-hyperplane signs."""
    planes = _hyperplanes(dim, n_bits, seed)
    schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField("bucket", LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _normalize(_matrix(pdf[vec_col]))
            yield pd.DataFrame({id_col: pdf[id_col],
                                "bucket": _bucket_of(m, planes)})

    return df.select(id_col, vec_col).mapInPandas(gen, schema=schema)


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_bits: int = 10, dim: int = 64,
             probe_hamming: int = 1) -> DataFrame:
    """ANN: probe the query's bucket (+ Hamming-<=probe_hamming
    neighbors), exact re-rank inside candidates → (query_id,
    neighbor_id, rank). Approximate: recall measured in tests."""
    buckets = lsh_buckets(corpus, id_col, vec_col, n_bits, dim)
    corpus_b = corpus.join(buckets, on=id_col)
    qb = lsh_buckets(queries, id_col, vec_col, n_bits, dim)
    # expand each query to its probe set
    flips = [0] + [1 << i for i in range(n_bits)] if probe_hamming >= 1 \
        else [0]
    if probe_hamming >= 2:
        flips += [(1 << i) | (1 << j) for i in range(n_bits)
                  for j in range(i + 1, n_bits)]
    probe = (qb.withColumn("flip", F.explode(F.array(
        *[F.lit(x) for x in flips])))
        .select(F.col(id_col).alias("query_id"),
                F.col("bucket").bitwiseXOR(F.col("flip")).alias("bucket")))
    cands = (probe.join(corpus_b.select(F.col(id_col).alias("neighbor_id"),
                                        "bucket", F.col(vec_col)
                                        .alias("__nvec")), on="bucket")
             .where(F.col("query_id") != F.col("neighbor_id"))
             .dropDuplicates(["query_id", "neighbor_id"]))
    qvecs = queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("__qvec"))
    joined = cands.join(F.broadcast(qvecs), on="query_id")

    schema = StructType([
        StructField("query_id", corpus.schema[id_col].dataType),
        StructField("neighbor_id", corpus.schema[id_col].dataType),
        StructField("cosine", DoubleType()),
    ])

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = _normalize(_matrix(pdf["__qvec"]))
            nv = _normalize(_matrix(pdf["__nvec"]))
            cos = (q * nv).sum(axis=1)
            yield pd.DataFrame({"query_id": pdf["query_id"],
                                "neighbor_id": pdf["neighbor_id"],
                                "cosine": cos})

    scored = joined.mapInPandas(score, schema=schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


# --- IVF (inverted-file) ANN ------------------------------------------------

def train_centroids(df: DataFrame, n_centroids: int,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    sample: int = 8192, iters: int = 8) -> np.ndarray:
    """Deterministic spherical k-means-lite on a bounded sample.

    The sample is the `sample` lowest ids (deterministic, no RNG in
    the distributed path); init is a maxmin (k-means++-style, farthest
    point) sweep from the first vector; Lloyd iterations assign by
    cosine and re-normalize means; empty clusters re-seed to the
    currently worst-covered point. Driver-side by design — IVF training
    on a bounded sample is the standard pattern; assignment below is
    the distributed part."""
    rows = (df.select(id_col, vec_col).orderBy(id_col).limit(sample)
            .collect())
    m = _normalize(np.array([np.asarray(r[vec_col], dtype=np.float64)
                             for r in rows]))
    k = min(n_centroids, len(m))
    # maxmin init: deterministic k-means++ without the RNG
    cent_idx = [0]
    best = m @ m[0]
    for _ in range(1, k):
        nxt = int(np.argmin(best))
        cent_idx.append(nxt)
        best = np.maximum(best, m @ m[nxt])
    c = m[cent_idx].copy()
    for _ in range(iters):
        assign = np.argmax(m @ c.T, axis=1)
        for j in range(k):
            sel = assign == j
            if sel.any():
                c[j] = m[sel].mean(axis=0)
            else:
                cover = (m @ c.T).max(axis=1)
                c[j] = m[int(np.argmin(cover))]
        c = _normalize(c)
    return c


def ivf_assign(df: DataFrame, centroids: np.ndarray,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """→ (id, list_id): nearest centroid per vector — broadcast
    centroid matrix, per-batch GEMM argmax."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(centroids)
    schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField("list_id", IntegerType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _normalize(_matrix(pdf[vec_col]))
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "list_id": np.argmax(m @ c.T, axis=1).astype(np.int32)})

    return df.select(id_col, vec_col).mapInPandas(gen, schema=schema)


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_centroids: int = 16, nprobe: int = 4,
             sample: int = 8192) -> DataFrame:
    """IVF ANN: train centroids on a sample, assign the corpus to
    inverted lists, probe each query's nprobe nearest lists, exact
    re-rank inside the candidates → (query_id, neighbor_id, rank).

    Versus random-hyperplane LSH: recall scales predictably with
    nprobe/n_centroids because the partition adapts to the data
    (trained centroids) instead of being seed-lucky. The candidate
    join shuffles on list_id only; candidate volume is bounded by
    nprobe/n_centroids of the corpus per query."""
    cents = train_centroids(corpus, n_centroids, id_col, vec_col, sample)
    assigned = ivf_assign(corpus, cents, id_col, vec_col)
    corpus_b = corpus.select(F.col(id_col).alias("neighbor_id"),
                             F.col(vec_col).alias("__nvec")) \
        .join(assigned.select(F.col(id_col).alias("neighbor_id"),
                              "list_id"), on="neighbor_id")
    # per-query probe set: top-nprobe centroids (driver-side is fine:
    # queries are the small side by contract, like cosine_topk)
    spark = corpus.sparkSession
    qrows = queries.select(id_col, vec_col).collect()
    qids = [r[id_col] for r in qrows]
    qmat = _normalize(np.array([np.asarray(r[vec_col], dtype=np.float64)
                                for r in qrows]))
    order = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]
    probe = spark.createDataFrame(
        [(qids[i], int(order[i, j]))
         for i in range(len(qids)) for j in range(order.shape[1])],
        schema=f"query_id {queries.schema[id_col].dataType.simpleString()}"
               f", list_id int")
    cands = (probe.join(corpus_b, on="list_id")
             .where(F.col("query_id") != F.col("neighbor_id"))
             .dropDuplicates(["query_id", "neighbor_id"]))
    qvecs = queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("__qvec"))
    joined = cands.join(F.broadcast(qvecs), on="query_id")

    schema = StructType([
        StructField("query_id", corpus.schema[id_col].dataType),
        StructField("neighbor_id", corpus.schema[id_col].dataType),
        StructField("cosine", DoubleType()),
    ])

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = _normalize(_matrix(pdf["__qvec"]))
            nv = _normalize(_matrix(pdf["__nvec"]))
            yield pd.DataFrame({"query_id": pdf["query_id"],
                                "neighbor_id": pdf["neighbor_id"],
                                "cosine": (q * nv).sum(axis=1)})

    scored = joined.mapInPandas(score, schema=schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


def embedding_near_pairs(df: DataFrame, threshold: float = 0.9,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding", n_bits: int = 8,
                         dim: int = 64,
                         max_bucket: int = 4096) -> DataFrame:
    """Near-duplicate vectors: bucketed self-join candidates, exact
    cosine verification → (id_a, id_b, cosine >= threshold). Buckets
    with more than max_bucket members (zero vectors, constant
    embeddings) skip the quadratic self-join but emit hub STAR pairs
    (dedup.cap_buckets_star): an identical-embedding cluster bigger
    than the cap oversizes its bucket in every probe, so plain
    dropping would silently lose it — the exact cosine verifier keeps
    the true members, O(n) per oversized bucket. Pass max_bucket=None
    for the exhaustive small-n path (n_bits=0 oracle verification)."""
    from .dedup import cap_buckets_star
    b = lsh_buckets(df, id_col, vec_col, n_bits, dim)
    star = None
    if max_bucket is not None:
        b, star = cap_buckets_star(b, ["bucket"], id_col, max_bucket)
    withb = df.join(b, on=id_col).select(id_col, vec_col, "bucket")

    schema = StructType([
        StructField("id_a", df.schema[id_col].dataType),
        StructField("id_b", df.schema[id_col].dataType),
        StructField("cosine", DoubleType()),
    ])

    # per-bucket GEMM instead of a vector-carrying self-join (round 7,
    # guide §8): the old plan exploded O(n²) candidate ROWS each
    # carrying BOTH embeddings through the exchange (~1 KB/pair — at
    # sf0.1's exhaustive bucket that is ~500k pairs ≈ 500 MB moved to
    # score 64-float dot products). Here every vector crosses the
    # shuffle ONCE (grouped by bucket), the upper-triangle similarities
    # come out of a blocked matrix product inside the task, and only
    # pairs at/above threshold are ever materialized as rows. Per-task
    # memory: max_bucket × dim floats + a block × bucket similarity
    # tile. Each vector belongs to exactly one bucket, so no
    # cross-bucket duplicate pairs exist (same invariant the old
    # self-join relied on).
    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []},
                                ).astype({"cosine": "float64"})
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].to_numpy()
        m = _normalize(_matrix(pdf[vec_col]))
        out_a, out_b, out_c = [], [], []
        blk = max(1, (1 << 21) // max(n, 1))   # ~16 MB float64 tile
        for s in range(0, n, blk):
            sims = m[s:s + blk] @ m.T
            for bi in range(sims.shape[0]):
                i = s + bi
                row = sims[bi, i + 1:]
                hit = np.flatnonzero(row >= threshold)
                if hit.size:
                    out_a.append(np.repeat(ids[i], hit.size))
                    out_b.append(ids[i + 1:][hit])
                    out_c.append(row[hit])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []},
                                ).astype({"cosine": "float64"})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "cosine": np.concatenate(out_c)})

    scored = (withb.groupBy("bucket")
              .applyInPandas(lambda p: bucket_pairs(p.drop(
                  columns="bucket")), schema=schema))
    if star is not None:
        vecs = df.select(id_col, vec_col)
        star_v = (star
                  .join(vecs.select(F.col(id_col).alias("id_a"),
                                    F.col(vec_col).alias("__va")),
                        on="id_a")
                  .join(vecs.select(F.col(id_col).alias("id_b"),
                                    F.col(vec_col).alias("__vb")),
                        on="id_b")
                  .select("id_a", "id_b", "__va", "__vb"))

        def score(batches: Iterator[pd.DataFrame]) \
                -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                va = _normalize(_matrix(pdf["__va"]))
                vb = _normalize(_matrix(pdf["__vb"]))
                cos = (va * vb).sum(axis=1)
                yield pd.DataFrame({"id_a": pdf["id_a"],
                                    "id_b": pdf["id_b"],
                                    "cosine": cos})

        star_scored = star_v.mapInPandas(score, schema=schema)
        scored = scored.unionAll(star_scored) \
            .dropDuplicates(["id_a", "id_b"])
    return scored.where(F.col("cosine") >= threshold)
