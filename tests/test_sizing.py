"""Sizing-model tests — anchors from BASELINE.md §C and reference
behavior (``c/lib/util.c``), validated offline against the compiled C
(integer outputs exactly identical; float fpp within 1e-12 relative)."""

import math

import pytest

from libfilter_spark.kernels import sizing


def test_fpp_model_anchor_readme():
    # README example: ndv=1e6, fpp goal 0.0065 (README.md:17-18)
    b = sizing.block_bytes_needed(1_000_000, 0.0065)
    assert b == 1_443_648  # exact value from the compiled C reference
    assert sizing.block_fpp(1_000_000, b) <= 0.0065


def test_fpp_model_c_reference_values():
    # spot values recorded from the compiled reference (ulp-tolerant)
    assert sizing.block_fpp(1_000_000, 1_210_000) == \
        pytest.approx(0.014637510625513538, rel=1e-12)
    assert sizing.block_bytes_needed(1_000_000, 0.01) == 1_316_160
    assert sizing.block_bytes_needed(12_345, 0.004) == 19_744
    assert sizing.block_capacity(1_048_576, 0.01) == 796_696


def test_fpp_edge_cases():
    assert sizing.block_fpp(0, 1024) == 0.0
    assert sizing.block_fpp(100, 0) == 1.0
    assert sizing.block_fpp(1000, 10) == 1.0  # > 3 keys per bit
    assert 0.0 < sizing.block_fpp(1000, 2000) < 1.0


def test_bytes_needed_monotone_and_bucket_aligned():
    prev = 0
    for fpp in (0.1, 0.01, 0.001):
        b = sizing.block_bytes_needed(10_000, fpp)
        assert b % sizing.BUCKET_BYTES == 0
        assert b > prev
        prev = b


def test_capacity_inverse_of_bytes_needed():
    for ndv in (1_000, 50_000):
        for fpp in (0.01, 0.004):
            b = sizing.block_bytes_needed(ndv, fpp)
            cap = sizing.block_capacity(b, fpp)
            assert cap >= ndv
            # capacity is the largest ndv below the fpp threshold
            assert sizing.block_fpp(cap, b) < fpp


def test_fpp_beats_naive_bloom_at_same_bits():
    # blocked bloom pays a modest fpp premium vs ideal bloom at c bits/key
    c = 8 / math.log(2)
    ideal = math.exp(-c * math.log(2) ** 2)
    blocked = sizing.block_fpp(1_000_000, 1_000_000 * c / 8)
    assert ideal < blocked < 10 * ideal
