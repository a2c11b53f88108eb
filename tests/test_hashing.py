"""Unit tests for the vectorized shingle hashing kernel."""

import numpy as np
import pytest

from metaprofi_ray.sketches import hashing


def test_window_starts_basic():
    # rows of lengths 5, 2, 3 with k=3 -> 3, 0, 1 windows
    offsets = np.array([0, 5, 7, 10])
    starts, rows = hashing.window_starts(offsets, k=3)
    assert starts.tolist() == [0, 1, 2, 7]
    assert rows.tolist() == [0, 0, 0, 2]


def test_window_starts_short_rows_dropped():
    # mirrors the reference's seq_len >= k filter (bloomfilter_cython.pyx:103)
    offsets = np.array([0, 2, 4])
    starts, rows = hashing.window_starts(offsets, k=8)
    assert starts.size == 0 and rows.size == 0


def test_window_starts_exact_k():
    offsets = np.array([0, 8])
    starts, rows = hashing.window_starts(offsets, k=8)
    assert starts.tolist() == [0] and rows.tolist() == [0]


def test_window_starts_nonzero_base():
    # Arrow slices keep offsets pointing into the unsliced child buffer
    offsets = np.array([10, 14])
    starts, _ = hashing.window_starts(offsets, k=2)
    assert starts.tolist() == [10, 11, 12]


def test_hash_windows_deterministic_and_content_dependent():
    vals = np.arange(100, dtype=np.int32)
    starts = np.array([0, 10, 20], dtype=np.int64)
    a = hashing.hash_windows(vals, starts, 8, hashing.SEED_H1)
    b = hashing.hash_windows(vals, starts, 8, hashing.SEED_H1)
    np.testing.assert_array_equal(a, b)
    # same window content at different offsets hashes identically
    vals2 = np.concatenate([np.full(5, -1, dtype=np.int32), vals[:8]])
    one = hashing.hash_windows(vals2, np.array([5]), 8, hashing.SEED_H1)
    assert one[0] == a[0]
    # different seed -> different hash
    c = hashing.hash_windows(vals, starts, 8, hashing.SEED_H2)
    assert not np.array_equal(a, c)


@pytest.mark.parametrize("k", [1, 2, 3, 7, 8, 31])
def test_hash_windows_odd_even_k(k):
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 2**31 - 1, size=200, dtype=np.int32)
    starts = np.arange(0, 100, dtype=np.int64)
    h = hashing.hash_windows(vals, starts, k, hashing.SEED_H1)
    assert len(np.unique(h)) == len(h)  # no trivial collisions


def test_hash_uniformity():
    """Bit positions from double hashing should be near-uniform over m."""
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 50_000, size=100_008, dtype=np.int32)
    starts = np.arange(0, 100_000, dtype=np.int64)
    h1 = hashing.hash_windows(vals, starts, 8, hashing.SEED_H1)
    h2 = hashing.hash_windows(vals, starts, 8, hashing.SEED_H2)
    m = 1 << 14
    bits = hashing.double_hash_bits(h1, h2, 2, m).ravel()
    counts = np.bincount(bits, minlength=m)
    # expected ~12.2 per cell; chi^2 per-dof should be close to 1
    exp = bits.size / m
    chi2_dof = float(((counts - exp) ** 2 / exp).mean())
    assert 0.8 < chi2_dof < 1.3


def test_double_hash_bits_range_and_shape():
    h1 = np.array([0, 2**63], dtype=np.uint64)
    h2 = np.array([0, 12345], dtype=np.uint64)
    bits = hashing.double_hash_bits(h1, h2, 4, 1000)
    assert bits.shape == (2, 4)
    assert bits.min() >= 0 and bits.max() < 1000


def test_hash_values_u64_matches_k1_windows():
    vals = np.array([5, 17, 99], dtype=np.int32)
    a = hashing.hash_values_u64(vals, hashing.SEED_H1)
    b = hashing.hash_windows(vals, np.arange(3, dtype=np.int64), 1, hashing.SEED_H1)
    np.testing.assert_array_equal(a, b)
