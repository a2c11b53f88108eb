"""Sharded Bloom-filter bank kernel (pure NumPy, mergeable).

Semantics mirror the reference's per-sample Bloom filter
(/root/reference/metaprofi/lib/bloomfilter_cython.pyx:63-134): all shingles of
all rows of one ``source`` OR into one m-bit vector, bit-packed little-endian
into uint8 bytes (setbit layout pyx:47-59, packing math utilities.py:257-265).
Two deliberate departures, documented in SURVEY.md §2 (M5) and §7:

* hashing is murmur3-style double hashing (see ``hashing.py``) instead of
  h seeded MurmurHash2 passes — same FPR bound, one pass;
* the m-bit vector is split into ``shards`` contiguous bit ranges so the
  distributed merge key is ``(source, shard_id)`` and no aggregation buffer
  ever holds the full bank row (SURVEY.md §7.3 "wide aggregation state").

The OR merge is associative, commutative and idempotent, so shard partials
merge in any order / any tree shape to byte-identical results.
"""

from __future__ import annotations

import numpy as np

from ..config import SketchConfig
from . import hashing


def bits_for_windows(
    values: np.ndarray, starts: np.ndarray, cfg: SketchConfig
) -> np.ndarray:
    """Global Bloom bit indices, shape (n_windows, h) int64."""
    h1, h2 = hashing.hash_windows_2(
        values, starts, cfg.k, hashing.SEED_H1, hashing.SEED_H2
    )
    return hashing.double_hash_bits(h1, h2, cfg.h, cfg.m)


# Shard-partial encodings.  Partial rows are the build's dominant shuffle
# payload; when a block sets few bits of a shard, a sorted-unique uint32
# index list is much smaller than the dense packed bitmap.  One tag byte
# disambiguates:  b'D' + packed little-endian bytes  |  b'S' + uint32 LE ids.
TAG_DENSE = b"D"
TAG_SPARSE = b"S"


def encode_dense(packed: np.ndarray | bytes) -> bytes:
    b = packed.tobytes() if isinstance(packed, np.ndarray) else packed
    return TAG_DENSE + b


def decode_dense(buf: bytes, shard_bytes: int) -> np.ndarray:
    """Dense uint8 bitmap from either encoding (zero-copy view for dense)."""
    tag = buf[:1]
    if tag == TAG_DENSE:
        return np.frombuffer(buf, dtype=np.uint8, offset=1)
    if tag == TAG_SPARSE:
        idx = np.frombuffer(buf, dtype=np.uint32, offset=1)
        unpacked = np.zeros(shard_bytes * 8, dtype=bool)
        unpacked[idx] = True
        return np.packbits(unpacked, bitorder="little")
    raise ValueError(f"unknown shard encoding tag {tag!r}")


def set_bits_sharded(bits: np.ndarray, cfg: SketchConfig) -> dict[int, bytes]:
    """OR a flat array of global bit indices into per-shard partials.

    Returns {shard_id: encoded shard bytes} for only the shards touched;
    each shard independently picks the smaller encoding (sparse unique-id
    list vs dense bitmap).
    """
    if bits.size == 0:
        return {}
    flat = bits.reshape(-1)
    shard_ids = flat // cfg.shard_bits
    local = flat % cfg.shard_bits
    out: dict[int, bytes] = {}
    # shards is small: per-shard boolean masks beat an argsort of the bits
    for sid in range(cfg.shards):
        sel = shard_ids == sid
        n_raw = int(sel.sum())
        if n_raw == 0:
            continue
        if 4 * n_raw < cfg.shard_bytes:
            # sparse candidate: dedupe (sort of a small subset) and encode
            # as a unique-id list
            ids = np.unique(local[sel]).astype(np.uint32)
            out[int(sid)] = TAG_SPARSE + ids.tobytes()
        else:
            # dense: scatter raw indices directly — duplicate set-bits are
            # free, so the unique/sort is skipped entirely (the encoding
            # choice uses the RAW count; a pathologically duplicate-heavy
            # shard may pick dense where sparse would be smaller, which
            # costs bytes, never correctness)
            unpacked = np.zeros(cfg.shard_bits, dtype=bool)
            unpacked[local[sel]] = True
            out[int(sid)] = TAG_DENSE + np.packbits(
                unpacked, bitorder="little"
            ).tobytes()
    return out


def or_merge(parts: list[bytes], shard_bytes: int | None = None) -> bytes:
    """Associative OR of shard partials in any mix of encodings.  Output is
    always tagged dense (queries decode with ``decode_dense``)."""
    if shard_bytes is None:
        # infer from any dense part
        dense = [p for p in parts if p[:1] == TAG_DENSE]
        if not dense:
            raise ValueError("or_merge needs shard_bytes when all parts are sparse")
        shard_bytes = len(dense[0]) - 1
    acc = np.zeros(shard_bytes, dtype=np.uint8)
    sparse_ids: list[np.ndarray] = []
    for p in parts:
        if p[:1] == TAG_SPARSE:
            sparse_ids.append(np.frombuffer(p, dtype=np.uint32, offset=1))
        else:
            acc |= decode_dense(p, shard_bytes)
    if sparse_ids:
        ids = np.concatenate(sparse_ids)
        unpacked = np.zeros(shard_bytes * 8, dtype=bool)
        unpacked[ids] = True
        acc |= np.packbits(unpacked, bitorder="little")
    return TAG_DENSE + acc.tobytes()


def contains_counts(
    bank_matrix: np.ndarray, byte_idx: np.ndarray, bit_pos: np.ndarray
) -> np.ndarray:
    """Bit-test many (window, hash) probe entries against many sources at once.

    bank_matrix: (n_sources, shard_bytes) uint8 — one packed shard across all
                 sources (the transposed probe the reference does per bit-slice,
                 search_index.py:420-423, expressed as a matrix gather).
    byte_idx/bit_pos: (n_entries,) local byte index / bit position in byte.
    Returns (n_entries, n_sources) uint8 0/1 presence matrix.
    """
    gathered = bank_matrix[:, byte_idx]  # (n_sources, n_entries)
    return ((gathered >> bit_pos[None, :].astype(np.uint8)) & 1).T


def popcount_packed(packed: bytes) -> int:
    """Number of set bits in a packed bank (fill-rate / summary metric)."""
    arr = np.frombuffer(packed, dtype=np.uint8)
    return int(np.unpackbits(arr).sum())
