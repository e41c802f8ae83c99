"""Near-duplicate detection for training-data pipelines.

Four detectors, all built on Arrow-vectorized kernels (numpy inside
``mapInPandas``/``applyInPandas``; no per-row Python in the hot path):

- exact: groupBy sha256 key (see __spark_entry__ dedup_exact_by_lang).
- MinHash + LSH: word-shingle → k-permutation minhash signature →
  banded bucket join → candidate pairs → exact-Jaccard verification.
  At scale the band shuffle carries (doc_id, band_hash) pairs only.
- SimHash: 64-bit sign-aggregated token hash; near-dups = small
  Hamming distance, candidate generation via 16-bit band buckets.
- n-gram Jaccard: the exact verifier, also exposed standalone.
- winnowing fingerprint: rolling-hash document fingerprint (MOSS
  style) for plagiarism-style containment detection.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, LongType, StringType,
                               StructField, StructType)

_M61 = (1 << 61) - 1


def _hash_tokens(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of tokens (FNV-1a, vectorized per doc)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = 0xCBF29CE484222325
        for b in t.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return out


def _shingle_hashes(text: str, width: int) -> np.ndarray:
    """Word w-shingle hashes: hash successive token windows by mixing
    token hashes with position multipliers (vectorized sliding dot)."""
    tokens = text.split()
    if len(tokens) < width:
        tokens = tokens + ["\x00"] * (width - len(tokens))
    th = _hash_tokens(tokens)
    n = len(th) - width + 1
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(width):
        acc = acc * np.uint64(1099511628211) + th[j:j + n]
    return np.unique(acc)


# minhash permutations: h_i(x) = (a_i * x + b_i) mod 2^61-1, seeded
def _minhash_params(k: int) -> tuple[np.ndarray, np.ndarray]:
    from ..kernels.keys import splitmix64
    a = splitmix64(k, seed=0xA11CE) % np.uint64(_M61 - 1) + np.uint64(1)
    b = splitmix64(k, seed=0xB0B) % np.uint64(_M61)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """(n_shingles,) × (k,) → (k,) signature. Multiply in python-object
    space is avoided by splitting the 61-bit modular multiply."""
    if len(shingles) == 0:
        return np.full(len(a), np.uint64(_M61), dtype=np.uint64)
    x = (shingles % np.uint64(_M61)).astype(np.uint64)
    # (a*x + b) mod M61 with 128-bit emulation: a,x < 2^61
    lo = a[None, :] * (x[:, None] & np.uint64(0x3FFFFFFF))
    hi = a[None, :] * (x[:, None] >> np.uint64(30))
    prod = (lo % np.uint64(_M61)
            + ((hi % np.uint64(_M61)) << np.uint64(30)) % np.uint64(_M61)
            + b[None, :]) % np.uint64(_M61)
    return prod.min(axis=0)


def minhash_signatures_df(df: DataFrame, id_col: str, text_col: str,
                          k: int = 64, shingle_width: int = 3) -> DataFrame:
    """→ (id, signature: array<long>) via mapInPandas."""
    a, b = _minhash_params(k)
    schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField("signature", ArrayType(LongType())),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = [minhash_signature(
                _shingle_hashes(t, shingle_width), a, b).view(np.int64)
                .tolist() for t in pdf[text_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "signature": sigs})

    return df.select(id_col, text_col).mapInPandas(gen, schema=schema)


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      k: int = 64, bands: int = 16,
                      shingle_width: int = 3,
                      threshold: float = 0.8) -> DataFrame:
    """Candidate generation + exact verification.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >=
    threshold. The only row-scale shuffle is (band_idx, band_hash,
    id) — candidates within a bucket pair up via a self-join, then an
    exact n-gram Jaccard verifies each candidate pair once.
    """
    rows_per_band = k // bands
    sigs = minhash_signatures_df(df, id_col, text_col, k, shingle_width)
    sigs = sigs.cache()
    band_cols = [
        F.struct(
            F.lit(i).alias("band"),
            F.xxhash64(*[F.col("signature")[j]
                         for j in range(i * rows_per_band,
                                        (i + 1) * rows_per_band)])
            .alias("bh")).alias(f"b{i}")
        for i in range(bands)]
    buckets = (sigs.select(id_col, F.explode(F.array(*band_cols))
                           .alias("band_bucket"))
               .select(id_col, "band_bucket.band", "band_bucket.bh"))
    left = buckets.select(F.col(id_col).alias("id_a"), "band", "bh")
    right = buckets.select(F.col(id_col).alias("id_b"), "band", "bh")
    cand = (left.join(right, on=["band", "bh"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    return verify_jaccard_pairs(cand, df, id_col, text_col,
                                shingle_width, threshold)


def verify_jaccard_pairs(pairs: DataFrame, docs: DataFrame, id_col: str,
                         text_col: str, shingle_width: int = 3,
                         threshold: float = 0.0) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs → (id_a, id_b, jaccard
    >= threshold). Texts are joined in (pairs are rare), then verified
    in one vectorized pass."""
    d = docs.select(F.col(id_col), F.col(text_col))
    joined = (pairs
              .join(d.select(F.col(id_col).alias("id_a"),
                             F.col(text_col).alias("text_a")), on="id_a")
              .join(d.select(F.col(id_col).alias("id_b"),
                             F.col(text_col).alias("text_b")), on="id_b"))
    schema = StructType([
        StructField("id_a", pairs.schema["id_a"].dataType),
        StructField("id_b", pairs.schema["id_b"].dataType),
        StructField("jaccard", DoubleType()),
    ])

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            jac = np.empty(len(pdf))
            for i, (ta, tb) in enumerate(zip(pdf["text_a"], pdf["text_b"])):
                sa = _shingle_hashes(ta, shingle_width)
                sb = _shingle_hashes(tb, shingle_width)
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                union = len(sa) + len(sb) - inter
                jac[i] = inter / union if union else 1.0
            out = pdf[["id_a", "id_b"]].copy()
            out["jaccard"] = jac
            yield out

    verified = joined.mapInPandas(verify, schema=schema)
    return verified.where(F.col("jaccard") >= threshold)


# --- SimHash -----------------------------------------------------------

def simhash_batch(texts) -> np.ndarray:
    """64-bit simhash per text: sign of per-bit sums of token hashes."""
    out = np.empty(len(texts), dtype=np.uint64)
    bitcols = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        th = _hash_tokens(t.split())
        if len(th) == 0:
            out[i] = 0
            continue
        bits = (th[:, None] & bitcols[None, :]) != 0
        score = bits.sum(axis=0) * 2 - len(th)   # (+1/-1 votes)
        out[i] = np.uint64((bitcols[score > 0]).sum())
    return out


def simhash_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField("simhash", LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "simhash": simhash_batch(list(pdf[text_col]))
                .view(np.int64)})

    return df.select(id_col, text_col).mapInPandas(gen, schema=schema)


def simhash_near_pairs(df: DataFrame, id_col: str, text_col: str,
                       max_hamming: int = 3) -> DataFrame:
    """Candidates via 4×16-bit band equality (any doc pair within
    Hamming distance 3 shares at least one of 4 bands), verified by
    exact popcount. → (id_a, id_b, hamming)."""
    sh = simhash_df(df, id_col, text_col).cache()
    bands = [(F.shiftright(F.col("simhash"), 16 * i)
              .bitwiseAND(F.lit(0xFFFF))).alias(f"band{i}")
             for i in range(4)]
    with_bands = sh.select(id_col, "simhash", *bands)
    cands = None
    for i in range(4):
        l = with_bands.select(F.col(id_col).alias("id_a"),
                              F.col("simhash").alias("sh_a"),
                              F.col(f"band{i}").alias("bk"))
        r = with_bands.select(F.col(id_col).alias("id_b"),
                              F.col("simhash").alias("sh_b"),
                              F.col(f"band{i}").alias("bk"))
        c = l.join(r, on="bk").where(F.col("id_a") < F.col("id_b")) \
            .select("id_a", "id_b", "sh_a", "sh_b")
        cands = c if cands is None else cands.unionAll(c)
    cands = cands.distinct()
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cands.withColumn("hamming", ham.cast("int"))
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


# --- winnowing fingerprint ----------------------------------------------

def winnow_fingerprints(text: str, k: int = 8, window: int = 4) -> np.ndarray:
    """MOSS-style winnowing: char k-gram rolling hashes, min per
    window (rightmost minimum), deduped — a compact document
    fingerprint for containment detection."""
    data = text.encode("utf-8")
    if len(data) < k:
        data = data + b"\x00" * (k - len(data))
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(arr) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        h = h * np.uint64(257) + arr[j:j + n]
    if n <= window:
        return np.unique(h.min(keepdims=True))
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    mins = sw.min(axis=1)
    return np.unique(mins)


def fingerprint_df(df: DataFrame, id_col: str, text_col: str,
                   k: int = 8, window: int = 4) -> DataFrame:
    """→ (id, fingerprint: array<long>, n_grams)."""
    schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField("fingerprint", ArrayType(LongType())),
        StructField("n_grams", LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = [winnow_fingerprints(t, k, window) for t in pdf[text_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "fingerprint": [f.view(np.int64).tolist() for f in fps],
                "n_grams": [len(f) for f in fps]})

    return df.select(id_col, text_col).mapInPandas(gen, schema=schema)
