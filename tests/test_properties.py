"""Hypothesis property tests for the pure kernels (no Ray)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from metaprofi_ray.config import SketchConfig
from metaprofi_ray.sketches import bloom, hashing


@given(
    lengths=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=30),
    k=st.integers(min_value=1, max_value=12),
)
@settings(max_examples=200, deadline=None)
def test_window_starts_invariants(lengths, k):
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
    starts, rows = hashing.window_starts(offsets, k)
    # count matches the closed form
    expect = sum(max(n - k + 1, 0) for n in lengths)
    assert starts.size == rows.size == expect
    # every window lies fully inside its row
    for s, r in zip(starts, rows):
        assert offsets[r] <= s and s + k <= offsets[r + 1]
    # rows are emitted in order
    assert (np.diff(rows) >= 0).all()


@given(
    tokens=st.lists(
        st.integers(min_value=-(2**31), max_value=2**31 - 1), min_size=1, max_size=64
    ),
    k=st.integers(min_value=1, max_value=16),
    prefix=st.integers(min_value=0, max_value=8),
)
@settings(max_examples=200, deadline=None)
def test_hash_position_independent(tokens, k, prefix):
    """The window hash depends only on window CONTENT, not its offset."""
    if len(tokens) < k:
        return
    base = np.asarray(tokens, dtype=np.int32)
    shifted = np.concatenate([np.full(prefix, 7, dtype=np.int32), base])
    h1 = hashing.hash_windows(base, np.array([0]), k, hashing.SEED_H1)
    h2 = hashing.hash_windows(shifted, np.array([prefix]), k, hashing.SEED_H1)
    assert h1[0] == h2[0]


@given(
    bits=st.lists(st.integers(min_value=0, max_value=(1 << 16) - 1), max_size=200),
    data=st.data(),
)
@settings(max_examples=100, deadline=None)
def test_sharded_or_merge_order_invariant(bits, data):
    cfg = SketchConfig(k=4, h=1, m=1 << 16, shards=4)
    arr = np.asarray(bits, dtype=np.int64).reshape(-1, 1)
    # random 3-way split, any merge order -> identical packed shards
    if arr.size == 0:
        return
    idx = data.draw(
        st.lists(st.integers(0, 2), min_size=arr.size, max_size=arr.size)
    )
    idx = np.asarray(idx)
    parts = [arr[idx == j] for j in range(3)]
    whole = {
        sid: bloom.decode_dense(b, cfg.shard_bytes).tobytes()
        for sid, b in bloom.set_bits_sharded(arr, cfg).items()
    }
    for order in ([0, 1, 2], [2, 0, 1]):
        merged: dict[int, bytes] = {}
        for j in order:
            for sid, b in bloom.set_bits_sharded(parts[j], cfg).items():
                merged[sid] = (
                    bloom.or_merge([merged[sid], b], shard_bytes=cfg.shard_bytes)
                    if sid in merged else b
                )
        merged_dense = {
            sid: bloom.decode_dense(b, cfg.shard_bytes).tobytes()
            for sid, b in merged.items()
        }
        assert merged_dense == whole


@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1), min_size=1, max_size=500))
@settings(max_examples=50, deadline=None)
def test_hll_merge_equals_single_pass(values):
    from metaprofi_ray.sketches import hll

    p = 8
    vals = np.asarray(values, dtype=np.int32)
    h = hashing.hash_values_u64(vals, hashing.SEED_H1)
    single = hll.empty(p)
    hll.update(single, h, p)
    half = len(h) // 2
    a, b = hll.empty(p), hll.empty(p)
    hll.update(a, h[:half], p)
    hll.update(b, h[half:], p)
    np.testing.assert_array_equal(hll.merge(a, b), single)
