"""Sketch property tests: error bounds, merge associativity
(byte-identical for HLL/CMS lattices; estimate-equivalent for
KLL/t-digest), serde round-trips, cross-checks against exact answers."""

import numpy as np
import pytest

from libfilter_spark.kernels.keys import splitmix64
from libfilter_spark.sketches import (CountMinSketch, HyperLogLog, KLLSketch,
                                      TDigest)


# --- HLL ---------------------------------------------------------------

def test_hll_accuracy():
    for true_n in (100, 10_000, 1_000_000):
        h = HyperLogLog(p=14)
        h.update_batch(splitmix64(true_n, seed=true_n))
        err = abs(h.estimate() - true_n) / true_n
        assert err < 3 * h.relative_error(), (true_n, err)


def test_hll_merge_byte_identical_any_order():
    keys = splitmix64(200_000, seed=50)
    parts = np.array_split(keys, 16)
    sketches = []
    for p in parts:
        h = HyperLogLog(p=12)
        h.update_batch(p)
        sketches.append(h)
    rng = np.random.default_rng(51)
    blobs = set()
    for _ in range(5):
        order = rng.permutation(16)
        acc = HyperLogLog.deserialize(sketches[order[0]].serialize())
        for i in order[1:]:
            acc.merge_inplace(sketches[i])
        blobs.add(acc.serialize())
    assert len(blobs) == 1
    merged = HyperLogLog.deserialize(next(iter(blobs)))
    direct = HyperLogLog(p=12)
    direct.update_batch(keys)
    assert merged == direct  # merge of parts == single-pass build


def test_hll_duplicates_dont_count():
    h = HyperLogLog(p=14)
    keys = splitmix64(1_000, seed=52)
    for _ in range(10):
        h.update_batch(keys)
    assert abs(h.estimate() - 1_000) / 1_000 < 3 * h.relative_error()


def test_hll_serde_and_validation():
    h = HyperLogLog(p=10)
    h.update_batch(splitmix64(5_000, seed=53))
    g = HyperLogLog.deserialize(h.serialize())
    assert g == h and g.estimate() == h.estimate()
    with pytest.raises(ValueError):
        HyperLogLog(p=3)
    with pytest.raises(ValueError):
        HyperLogLog(p=10).merge(HyperLogLog(p=12))


# --- CountMin ----------------------------------------------------------

def test_cms_never_underestimates_and_bounded():
    rng = np.random.default_rng(54)
    keys = rng.integers(0, 500, size=100_000).astype(np.uint64)
    cms = CountMinSketch(depth=5, width=2048)
    cms.update_batch(keys)
    uniq, true_counts = np.unique(keys, return_counts=True)
    est = cms.estimate(uniq)
    assert (est >= true_counts).all()
    # CM bound: overestimate ≤ eps*N whp
    assert (est - true_counts <= cms.epsilon * cms.total * 3).all()


def test_cms_merge_byte_identical():
    keys = splitmix64(50_000, seed=55) % np.uint64(1000)
    parts = np.array_split(keys, 8)
    sketches = []
    for p in parts:
        c = CountMinSketch(depth=4, width=512)
        c.update_batch(p)
        sketches.append(c)
    rng = np.random.default_rng(56)
    blobs = set()
    for _ in range(4):
        order = rng.permutation(8)
        acc = sketches[order[0]]
        for i in order[1:]:
            acc = acc.merge(sketches[i])
        blobs.add(acc.serialize())
    assert len(blobs) == 1
    direct = CountMinSketch(depth=4, width=512)
    direct.update_batch(keys)
    assert CountMinSketch.deserialize(next(iter(blobs))) == direct


def test_cms_weighted_updates_and_serde():
    c = CountMinSketch.create_for_error(epsilon=0.01, delta=0.01)
    keys = np.arange(100, dtype=np.uint64)
    c.update_batch(keys, counts=np.full(100, 7, dtype=np.int64))
    assert (c.estimate(keys) >= 7).all()
    assert c.total == 700
    g = CountMinSketch.deserialize(c.serialize())
    assert g == c


# --- KLL ---------------------------------------------------------------

def test_kll_quantile_accuracy():
    rng = np.random.default_rng(57)
    data = rng.normal(size=100_000)
    k = KLLSketch(k=200)
    for chunk in np.array_split(data, 10):
        k.update_batch(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = k.quantile(q)
        true_rank = (data <= est).mean()
        assert abs(true_rank - q) < 0.025, (q, true_rank)


def test_kll_merge_estimate_equivalent():
    rng = np.random.default_rng(58)
    data = rng.exponential(size=60_000)
    parts = np.array_split(data, 6)
    sketches = []
    for p in parts:
        s = KLLSketch(k=200)
        s.update_batch(p)
        sketches.append(s)
    ests = []
    for _ in range(3):
        order = rng.permutation(6)
        acc = sketches[order[0]]
        for i in order[1:]:
            acc = acc.merge(sketches[i])
        assert acc.n == len(data)
        ests.append(acc.quantiles([0.1, 0.5, 0.9]))
    # any merge order: every estimate has rank error within bound
    for e in ests:
        for q, v in zip([0.1, 0.5, 0.9], e):
            assert abs((data <= v).mean() - q) < 0.03


def test_kll_serde():
    s = KLLSketch(k=128)
    s.update_batch(np.arange(10_000, dtype=np.float64))
    g = KLLSketch.deserialize(s.serialize())
    assert g.n == s.n
    assert abs(g.quantile(0.5) - s.quantile(0.5)) <= 200


# --- t-digest ----------------------------------------------------------

def test_tdigest_quantile_accuracy_tails():
    rng = np.random.default_rng(59)
    data = rng.normal(size=100_000)
    t = TDigest(delta=100)
    for chunk in np.array_split(data, 20):
        t.update_batch(chunk)
    sorted_data = np.sort(data)
    for q in (0.001, 0.01, 0.5, 0.99, 0.999):
        est = t.quantile(q)
        true_rank = (data <= est).mean()
        tol = 0.005 if q in (0.5,) else max(0.002, 0.2 * min(q, 1 - q))
        assert abs(true_rank - q) < max(tol, 0.003), (q, true_rank)
    # extreme quantiles stay inside data range
    assert sorted_data[0] <= t.quantile(0.0) <= sorted_data[-1]


def test_tdigest_merge_estimate_equivalent():
    rng = np.random.default_rng(60)
    data = rng.uniform(0, 1000, size=50_000)
    parts = np.array_split(data, 5)
    digests = []
    for p in parts:
        d = TDigest(delta=100)
        d.update_batch(p)
        digests.append(d)
    for _ in range(3):
        order = rng.permutation(5)
        acc = digests[order[0]]
        for i in order[1:]:
            acc = acc.merge(digests[i])
        assert acc.n == len(data)
        for q in (0.05, 0.5, 0.95):
            est = acc.quantile(q)
            assert abs((data <= est).mean() - q) < 0.02


def test_tdigest_centroid_count_bounded():
    t = TDigest(delta=100)
    t.update_batch(np.random.default_rng(61).normal(size=200_000))
    t._flush()
    assert len(t.means) <= 2 * 100  # ~delta centroids after compression


def test_tdigest_serde():
    t = TDigest(delta=50)
    t.update_batch(np.linspace(0, 1, 10_000))
    g = TDigest.deserialize(t.serialize())
    assert g == t
    assert abs(g.quantile(0.25) - 0.25) < 0.01
