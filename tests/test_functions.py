"""Training-data pipeline op tests: planted-duplicate recall for
MinHash-LSH and SimHash, exact ANN vs numpy oracle, LSH-ANN recall on
clustered vectors, winnowing stability, multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
import pyspark.sql.functions as F

from libfilter_spark.functions.dedup import (minhash_lsh_pairs,
                                             simhash_near_pairs,
                                             winnow_fingerprints)
from libfilter_spark.functions.similarity import (cosine_topk,
                                                  embedding_near_pairs,
                                                  lsh_topk)


@pytest.fixture(scope="module")
def planted_docs(spark):
    """120 docs; ids 100.. are near-copies of ids 0..19 (one token
    changed) — must be found by both MinHash-LSH and SimHash."""
    rng = np.random.default_rng(42)
    vocab = [f"tok{i}" for i in range(500)]
    rows = []
    base = []
    for i in range(100):
        words = list(rng.choice(vocab, size=60))
        base.append(words)
        rows.append((i, " ".join(words)))
    for j in range(20):
        words = list(base[j])
        words[30] = "MUTATED"
        rows.append((100 + j, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_minhash_lsh_finds_planted_near_dups(planted_docs):
    pairs = minhash_lsh_pairs(planted_docs, "doc_id", "text",
                              k=64, bands=16, threshold=0.7).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    expected = {(j, 100 + j) for j in range(20)}
    recall = len(found & expected) / len(expected)
    assert recall >= 0.95, (recall, sorted(expected - found))
    # precision: every returned pair genuinely has J >= 0.7
    assert all(r.jaccard >= 0.7 for r in pairs)


def test_simhash_finds_planted_near_dups(planted_docs):
    pairs = simhash_near_pairs(planted_docs, "doc_id", "text",
                               max_hamming=8).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    expected = {(j, 100 + j) for j in range(20)}
    recall = len(found & expected) / len(expected)
    assert recall >= 0.6, recall  # simhash is the coarser detector
    for r in pairs:
        assert 0 <= r.hamming <= 8


@pytest.fixture(scope="module")
def clustered_vectors(spark):
    """300 vectors in 10 tight clusters — the regime where LSH-ANN
    shines (unlike the uniform-random testdata embeddings)."""
    rng = np.random.default_rng(43)
    centers = rng.normal(size=(10, 64)) * 5
    rows = []
    for i in range(300):
        c = i % 10
        v = centers[c] + rng.normal(size=64) * 0.3
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows,
                                 "vec_id long, embedding array<float>") \
        .cache()


def test_cosine_topk_matches_numpy_oracle(clustered_vectors):
    rows = clustered_vectors.collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    got = cosine_topk(clustered_vectors,
                      clustered_vectors.where("vec_id < 5"), k=7).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    for q in range(5):
        sims = m @ m[ids == q].ravel()
        order = np.lexsort((ids, -sims))
        expect = [int(ids[i]) for i in order if ids[i] != q][:7]
        mine = [nid for _, nid in sorted(by_q[q])]
        assert mine == expect, (q, mine, expect)


def test_lsh_topk_high_recall_on_clusters(clustered_vectors):
    queries = clustered_vectors.where("vec_id < 10")
    exact = cosine_topk(clustered_vectors, queries, k=10).collect()
    approx = lsh_topk(clustered_vectors, queries, k=10, n_bits=8,
                      probe_hamming=2).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    ap = {}
    for r in approx:
        ap.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert np.mean(recalls) >= 0.9, recalls


def test_embedding_near_pairs_finds_cluster_twins(spark):
    rng = np.random.default_rng(44)
    base = rng.normal(size=(20, 64))
    rows = []
    for i in range(20):
        rows.append((i, [float(x) for x in base[i]]))
        rows.append((100 + i,
                     [float(x) for x in base[i] + rng.normal(size=64) * 0.01]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_near_pairs(df, threshold=0.99, n_bits=6).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    expected = {(i, 100 + i) for i in range(20)}
    assert len(found & expected) / len(expected) >= 0.9


def test_embedding_identical_cluster_survives_cap(spark):
    """An identical-embedding cluster larger than the bucket cap lands
    in ONE oversized bucket in every probe — plain capping would lose
    it. The star-pair path keeps it connected with O(n) pairs (hub =
    min id), verified at cosine 1.0."""
    rng = np.random.default_rng(7)
    rows = [(i, [1.0] * 64) for i in range(200)]           # the cluster
    for i in range(200, 260):                               # distractors
        rows.append((i, [float(x) for x in rng.normal(size=64)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_near_pairs(df, threshold=0.999, n_bits=6,
                                 max_bucket=64).collect()
    cluster = {(r.id_a, r.id_b) for r in pairs
               if r.id_a < 200 and r.id_b < 200}
    assert cluster == {(0, i) for i in range(1, 200)}  # star, not n^2


def test_winnowing_stable_and_local():
    t1 = "the quick brown fox jumps over the lazy dog " * 5
    f1 = winnow_fingerprints(t1)
    assert np.array_equal(f1, winnow_fingerprints(t1))  # deterministic
    # a local edit changes few fingerprints
    t2 = t1.replace("lazy", "hazy", 1)
    f2 = winnow_fingerprints(t2)
    overlap = len(np.intersect1d(f1, f2)) / max(len(f1), len(f2))
    assert overlap > 0.5
    # disjoint text shares almost nothing
    f3 = winnow_fingerprints("completely different content here xyz " * 6)
    assert len(np.intersect1d(f1, f3)) / max(len(f1), len(f3)) < 0.1


def test_multimodal_strict_mode_raises(spark):
    from libfilter_spark.functions.multimodal import (extract_features,
                                                      synthetic_media_table)
    media = synthetic_media_table(spark, 10)
    with pytest.raises(Exception):  # NotImplementedError inside executor
        extract_features(media, strict=True).collect()


def test_multimodal_features_deterministic(spark):
    from libfilter_spark.functions.multimodal import (extract_features,
                                                      synthetic_media_table)
    media = synthetic_media_table(spark, 50)
    a = extract_features(media).orderBy("media_id").collect()
    b = extract_features(media.repartition(5)).orderBy("media_id").collect()
    assert [r.feature for r in a] == [r.feature for r in b]
    assert all(len(r.feature) == 16 for r in a)


def test_shingle_batch_matches_single():
    """The batch shingle kernel is the single-doc kernel vectorized —
    identical hash sets either way."""
    from libfilter_spark.functions.dedup import (_shingle_hashes,
                                                 _shingle_hashes_batch)
    texts = ["a b c d e f", "", "one", "x " * 50, "a b c"]
    batch = _shingle_hashes_batch(texts, 3)
    for t, got in zip(texts, batch):
        assert np.array_equal(got, _shingle_hashes(t, 3)), t


def test_lsh_skewed_bucket_capped(spark):
    """Adversarial skew: 30% identical boilerplate docs form one
    degenerate LSH bucket per band. With the cap the self-join stays
    linear (no quadratic candidate blowup), the planted distinct
    near-dup is still found via its own buckets, and the audit stats
    report exactly what was dropped."""
    from libfilter_spark.functions.dedup import lsh_bucket_stats
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(400)]
    rows = []
    boiler = " ".join(["lorem ipsum dolor sit amet"] * 12)
    for i in range(300):
        rows.append((i, boiler))                     # degenerate mass
    for i in range(300, 1000):
        rows.append((i, " ".join(rng.choice(vocab, size=40))))
    # planted near-dup pair among the distinct docs
    twin = rows[500][1].split()
    twin[5] = "CHANGED"
    rows.append((2000, " ".join(twin)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.7,
                              max_bucket=64)
    got = {(a, b) for a, b in pairs.select("id_a", "id_b").collect()}
    assert (500, 2000) in got
    # the oversized boilerplate bucket emits O(n) HUB STAR pairs
    # (hub = min id 0), not the ~45k quadratic pairs — and not zero:
    # dropping them entirely would disconnect a near-identical cluster
    # larger than the cap (every band bucket oversizes at once)
    boiler = {(a, b) for a, b in got if a < 300 and b < 300}
    assert boiler == {(0, i) for i in range(1, 300)}
    # downstream keep-one-representative therefore keeps exactly one
    # boilerplate doc
    from libfilter_spark.functions.dedup import keep_representatives
    kept = keep_representatives(df, pairs, "doc_id")
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert kept_ids & set(range(300)) == {0}


def test_near_dup_clusters_long_chain(spark):
    """Pointer-jumping label propagation converges in O(log diameter):
    a 10k-node planted chain resolves to ONE cluster within the
    default iteration budget (plain one-hop propagation would need
    10k rounds) with bounded plan depth via periodic checkpoints."""
    from libfilter_spark.functions.dedup import near_dup_clusters
    n = 10_000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")  # tiny frames:
    # ~14 rounds x 3 jobs are pure scheduling overhead at 32 partitions
    try:
        # driver_max_edges=0 pins the DISTRIBUTED route (the default
        # would take the driver union-find fast path at this size)
        labels = near_dup_clusters(pairs, max_iters=20,
                                   driver_max_edges=0)
        got = labels.select("cluster_id").distinct().collect()
        assert len(got) == 1 and got[0][0] == 0
        assert labels.count() == n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_near_dup_clusters_routes_agree(spark):
    """The driver union-find fast path and the distributed
    pointer-jumping loop emit IDENTICAL labels (min member id per
    component) on a random graph with chains, triangles, hubs, and
    singleton-free ids, and on string ids."""
    import random

    from libfilter_spark.functions.dedup import near_dup_clusters
    rng = random.Random(7)
    edges = [(rng.randrange(500), rng.randrange(500)) for _ in range(300)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        fast = {r.id: r.cluster_id
                for r in near_dup_clusters(pairs).collect()}
        dist = {r.id: r.cluster_id
                for r in near_dup_clusters(
                    pairs, driver_max_edges=0).collect()}
        assert fast == dist and fast
        spairs = spark.createDataFrame(
            [(f"d{u:03d}", f"d{v:03d}") for u, v in edges[:50]],
            "id_a string, id_b string")
        sfast = {r.id: r.cluster_id
                 for r in near_dup_clusters(spairs).collect()}
        sdist = {r.id: r.cluster_id
                 for r in near_dup_clusters(
                     spairs, driver_max_edges=0).collect()}
        assert sfast == sdist and sfast
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_cap_buckets_stats(spark):
    from libfilter_spark.functions.dedup import (cap_buckets,
                                                 lsh_bucket_stats)
    rows = [(i, i % 3) for i in range(30)] + [(100 + i, 99) for i in
                                              range(50)]
    df = spark.createDataFrame(rows, "id long, bh long")
    stats = lsh_bucket_stats(df, ["bh"], max_bucket=20).collect()[0]
    assert stats.n_buckets == 4
    assert stats.n_oversized == 1
    assert stats.n_dropped_rows == 50
    assert stats.max_size == 50
    kept = cap_buckets(df, ["bh"], max_bucket=20)
    assert kept.count() == 30


def test_ivf_topk_high_recall_on_clusters(clustered_vectors):
    """IVF with trained centroids: recall@10 >= 0.9 at a bounded
    candidate budget (nprobe/n_centroids = 1/4 of the corpus scanned
    per query) — the predictable-recall alternative to seed-lucky
    random-hyperplane LSH."""
    from libfilter_spark.functions.similarity import ivf_topk
    queries = clustered_vectors.where("vec_id < 10")
    exact = cosine_topk(clustered_vectors, queries, k=10)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = ivf_topk(clustered_vectors, queries, k=10,
                      n_centroids=16, nprobe=4)
    ap = {}
    for r in approx.collect():
        ap.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert np.mean(recalls) >= 0.9, recalls


def test_ivf_centroids_deterministic(clustered_vectors):
    from libfilter_spark.functions.similarity import train_centroids
    a = train_centroids(clustered_vectors, 8, sample=200)
    b = train_centroids(clustered_vectors, 8, sample=200)
    assert np.array_equal(a, b)
    assert a.shape == (8, 64)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_near_dup_clusters_and_keep(spark):
    """Connected components over a pair list: chains collapse to one
    cluster labeled by the min id; keep-one drops all but the
    representative and keeps singletons."""
    from libfilter_spark.functions.dedup import (keep_representatives,
                                                 near_dup_clusters)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),            # chain -> cluster 1
         (10, 11),                          # pair  -> cluster 10
         (20, 21), (21, 22), (20, 22)],     # triangle -> cluster 20
        "id_a long, id_b long")
    got = {r.id: r.cluster_id for r in near_dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}
    docs = spark.createDataFrame([(i, f"d{i}") for i in
                                  [1, 2, 3, 4, 10, 11, 20, 21, 22, 99]],
                                 "doc_id long, text string")
    kept = keep_representatives(docs, pairs)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 10, 20, 99]
