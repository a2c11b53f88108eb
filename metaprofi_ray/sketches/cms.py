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


def _pair_hashes(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    starts = np.arange(values.shape[0], dtype=np.int64)
    h1, h2 = hashing.hash_windows_2(
        np.ascontiguousarray(values, dtype=np.int32), starts, 1,
        hashing.SEED_H1, hashing.SEED_H2,
    )
    return h1, h2 | U64(1)


def update(table: np.ndarray, values: np.ndarray) -> None:
    """Fold a batch of int32 token values into the sketch, in place.

    Values are deduped first (token streams repeat heavily) so the hash
    runs once per DISTINCT value and the counter adds use weighted
    bincount — byte-identical to the per-occurrence formulation (integer
    weights sum exactly in float64 below 2^53), ~7x faster on Zipf-ish
    token batches."""
    if values.size == 0:
        return
    d, w = table.shape
    uniq, counts = np.unique(values, return_counts=True)
    h1, h2 = _pair_hashes(uniq)
    for i in range(d):
        idx = ((h1 + U64(i + 1) * h2) % U64(w)).astype(np.int64)
        table[i] += np.bincount(idx, weights=counts, minlength=w).astype(
            np.uint64
        )


def query(table: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Point estimates (min over rows) for a batch of token values."""
    d, w = table.shape
    h1, h2 = _pair_hashes(np.asarray(values))
    est = np.full(np.asarray(values).shape[0], np.iinfo(np.uint64).max, dtype=np.uint64)
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
