"""Vectorized shingle hashing: murmur3-style 64-bit hash + double hashing.

The reference hashes each k-mer's bytes once per hash seed with
MurmurHash2_x64_64 (/root/reference/metaprofi/lib/bloomfilter_cython.pyx:488-596,
seeds 0..h-1 at :93-94).  This engine's documented scheme (per BASELINE.json
north_star) instead computes TWO independent 64-bit murmur3-style hashes of the
shingle's little-endian 4*k-byte buffer and derives the h Bloom bit positions
by Kirsch–Mitzenmacher double hashing::

    g_i = (h1 + i * h2) mod m,   i in [0, h)

which preserves the Bloom FPR bound while needing a single pass over the data.
Everything here is pure NumPy, vectorized ACROSS windows (the per-lane loop runs
``ceil(k/2)`` times regardless of batch size).

Hash construction: murmur3 x64 body over 8-byte lanes (two int32 tokens per
lane, little-endian, odd-k tail zero-padded) with the exact murmur3 fmix64
finalizer.  All arithmetic is uint64 with silent wraparound.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_C1 = U64(0x87C37B91114253D5)
_C2 = U64(0x4CF5AD432745937F)
_FMIX1 = U64(0xFF51AFD7ED558CCD)
_FMIX2 = U64(0xC4CEB9FE1A85EC53)

SEED_H1 = U64(0x9747B28C)
SEED_H2 = U64(0x8EE2A7DD)


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    r = U64(r)
    return (x << r) | (x >> (U64(64) - r))


def _rotl64_inplace(x: np.ndarray, r: int) -> None:
    t = x >> U64(64 - r)
    x <<= U64(r)
    x |= t


def _fmix64(x: np.ndarray) -> np.ndarray:
    # in-place murmur3 finalizer (caller owns x)
    x ^= x >> U64(33)
    x *= _FMIX1
    x ^= x >> U64(33)
    x *= _FMIX2
    x ^= x >> U64(33)
    return x


def _pair64(values: np.ndarray) -> np.ndarray:
    """Precompute the 8-byte lane value starting at every token position:
    ``pair[i] = v[i] | v[i+1] << 32`` (last entry is the bare low half).
    One sequential pass; every lane of every window then needs a single
    gather from this buffer instead of two gathers + shift/or — sliding
    windows overlap, so the pair at each position is shared by up to
    ``ceil(k/2)`` windows."""
    v = (
        values.view(np.uint32)
        if values.dtype == np.int32
        else values.astype(np.uint32)
    )
    pair = v.astype(np.uint64)
    if pair.shape[0] > 1:
        pair[:-1] |= v[1:].astype(np.uint64) << U64(32)
    return pair


def _mix_lane(out: np.ndarray, lane: np.ndarray) -> None:
    """One murmur3 x64 body round, in place (lane is consumed)."""
    lane *= _C1
    _rotl64_inplace(lane, 31)
    lane *= _C2
    out ^= lane
    _rotl64_inplace(out, 27)
    out *= U64(5)
    out += U64(0x52DCE729)


def _acc_update(out: np.ndarray, k1: np.ndarray) -> None:
    """Accumulator half of the body round (k1 already lane-mixed)."""
    out ^= k1
    _rotl64_inplace(out, 27)
    out *= U64(5)
    out += U64(0x52DCE729)


def hash_windows(
    values: np.ndarray, starts: np.ndarray, k: int, seed: np.uint64
) -> np.ndarray:
    """64-bit hash of each k-token window ``values[s : s+k]`` for s in starts.

    values: flat int32 token buffer (an Arrow list<int32> child array).
    starts: int64 window start offsets into ``values`` (no window may cross a
            row boundary — the caller guarantees that, mirroring the
            reference's per-sequence window loop bloomfilter_cython.pyx:103-129).
    Returns uint64 array of len(starts).
    """
    return hash_windows_2(values, starts, k, seed, None)[0]


def hash_windows_2(
    values: np.ndarray,
    starts: np.ndarray,
    k: int,
    seed1: np.uint64,
    seed2: np.uint64 | None,
) -> tuple[np.ndarray, np.ndarray | None]:
    """Fused one- or two-seed window hashing.

    The build needs two independent hashes of every window (h1/h2 for
    Kirsch–Mitzenmacher); hashing them in one lane loop shares the lane
    gathers — the memory-bandwidth-bound part of the kernel — between both
    accumulators (plus the ``_pair64`` precompute shares lane assembly
    across overlapping windows).  Bit-identical to two ``hash_windows``
    calls (property-tested)."""
    n = starts.shape[0]
    out1 = np.full(n, seed1, dtype=np.uint64)
    out2 = np.full(n, seed2, dtype=np.uint64) if seed2 is not None else None
    if n == 0:
        return out1, out2
    pair = _pair64(values)
    n_lanes = (k + 1) // 2
    for j in range(n_lanes):
        lane = pair[starts + 2 * j]  # fancy indexing -> fresh array
        if 2 * j + 1 >= k:  # odd-k tail: zero-padded high half
            lane &= U64(0xFFFFFFFF)
        # the lane mixing (mul/rotl/mul) is seed-independent — compute it
        # once and share it between both accumulators
        lane *= _C1
        _rotl64_inplace(lane, 31)
        lane *= _C2
        _acc_update(out1, lane)
        if out2 is not None:
            _acc_update(out2, lane)
    out1 ^= U64(4 * k)
    _fmix64(out1)
    if out2 is not None:
        out2 ^= U64(4 * k)
        _fmix64(out2)
    return out1, out2


def hash_values_u64(values: np.ndarray, seed: np.uint64) -> np.ndarray:
    """64-bit hash of individual scalar values (one token per 'window').

    Used by the CMS / token-level sketches; same construction with k=1.
    """
    starts = np.arange(values.shape[0], dtype=np.int64)
    return hash_windows(np.ascontiguousarray(values, dtype=np.int32), starts, 1, seed)


def double_hash_bits(h1: np.ndarray, h2: np.ndarray, h: int, m: int) -> np.ndarray:
    """Kirsch–Mitzenmacher: bit positions ``(h1 + i*h2) % m`` for i in [0, h).

    h2 is forced odd, which guarantees a full cycle only when m is a power
    of two; m here is padded to a multiple of 8*shards, so gcd(h2, m) > 1
    is possible and a window's probes can land in a residue subgroup.  For
    the configured h (= 2) the FPR impact is negligible (measured by the
    bloom_fpr_report pipeline), so no power-of-two padding is imposed.
    Returns int64 array of shape (len(h1), h) of global Bloom bit indices.
    """
    h2 = h2 | U64(1)
    i = np.arange(h, dtype=np.uint64)
    # (n, h) = (n, 1) + (n, 1) * (h,)   — uint64 wraparound is fine pre-mod
    g = h1[:, None] + h2[:, None] * i[None, :]
    return (g % U64(m)).astype(np.int64)


def window_starts(offsets: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """All k-wide window start offsets for a batch of variable-length rows.

    offsets: int32/int64 Arrow list offsets, len n_rows+1, pointing into the
             flat child values buffer (offsets may start anywhere — sliced
             arrays are handled because Arrow offsets index the unsliced child).
    Returns (starts, row_of_window):
      starts:        int64 (n_windows,) start offsets into the child buffer
      row_of_window: int64 (n_windows,) owning row index within the batch

    Rows shorter than k produce no windows (reference length filter,
    bloomfilter_cython.pyx:103); stride is 1 so a row of length L yields
    L-k+1 windows INCLUDING duplicates — the reference's theta threshold
    counts every window (search_index.py:414-431), so never dedupe here.
    """
    offsets = offsets.astype(np.int64, copy=False)
    lengths = offsets[1:] - offsets[:-1]
    counts = np.maximum(lengths - k + 1, 0)
    total = int(counts.sum())
    row_of_window = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    if total == 0:
        return np.empty(0, dtype=np.int64), row_of_window
    csum = np.concatenate([[0], np.cumsum(counts)])
    intra = np.arange(total, dtype=np.int64) - np.repeat(csum[:-1], counts)
    starts = np.repeat(offsets[:-1], counts) + intra
    return starts, row_of_window
