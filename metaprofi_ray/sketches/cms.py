"""Count-min sketch (mergeable, pure NumPy).

Not present in the reference (mandated sibling sketch per BASELINE.json
north_rule).  Tracks per-source token frequencies.  d rows of w uint64
counters; row i uses double hashing ``(h1 + (i+1)*h2) mod w`` over the token's
64-bit hash (same family as the Bloom bits, see ``hashing.py``).

Guarantees (Cormode–Muthukrishnan): estimate >= true count always, and
estimate <= true + eps*N with probability >= 1-delta where eps = e/w,
delta = e^-d, N = total updates.  Merge = elementwise sum: associative and
commutative → byte-identical under any merge tree (NOT idempotent — each
stream element must be folded exactly once, which the engine's per-batch
partial + single groupby merge guarantees).
"""

from __future__ import annotations

import numpy as np

from . import hashing

U64 = np.uint64


def empty(d: int, w: int) -> np.ndarray:
    return np.zeros((d, w), dtype=np.uint64)


def update(table: np.ndarray, values: np.ndarray) -> None:
    """Fold a batch of int32 token values into the sketch, in place."""
    if values.size == 0:
        return
    d, w = table.shape
    h1 = hashing.hash_values_u64(values, hashing.SEED_H1)
    h2 = hashing.hash_values_u64(values, hashing.SEED_H2) | U64(1)
    for i in range(d):
        idx = ((h1 + U64(i + 1) * h2) % U64(w)).astype(np.int64)
        table[i] += np.bincount(idx, minlength=w).astype(np.uint64)


def query(table: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Point estimates (min over rows) for a batch of token values."""
    d, w = table.shape
    h1 = hashing.hash_values_u64(values, hashing.SEED_H1)
    h2 = hashing.hash_values_u64(values, hashing.SEED_H2) | U64(1)
    est = np.full(values.shape[0], np.iinfo(np.uint64).max, dtype=np.uint64)
    for i in range(d):
        idx = ((h1 + U64(i + 1) * h2) % U64(w)).astype(np.int64)
        est = np.minimum(est, table[i, idx])
    return est


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def to_bytes(table: np.ndarray) -> bytes:
    return table.tobytes()


def from_bytes(buf: bytes, d: int, w: int) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.uint64).reshape(d, w).copy()
