"""HyperLogLog cardinality sketch (dense, mergeable, pure NumPy).

Not present in the reference (mandated sibling sketch per BASELINE.json
north_rule); used to estimate per-source distinct shingle counts so the
engine can report the achieved Bloom FPR bound ``(1-e^{-hn/m})^h`` with the
HLL ``n`` (SURVEY.md §7.3 "FPR accounting").

Standard Flajolet–Furic–Gandouet–Meunier HLL with 2**p uint8 registers,
max-merge, linear-counting small-range correction.  Register index = top p
bits of a 64-bit hash; rank = leading-zero count of the next 52 bits + 1
(52 so float64 frexp computes ranks EXACTLY — every int < 2**53 is exact).
Relative standard error ~= 1.04 / sqrt(2**p).  Merge = elementwise max:
associative, commutative, idempotent → byte-identical under any merge tree.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64


def empty(p: int) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def update(registers: np.ndarray, hashes: np.ndarray, p: int) -> None:
    """Fold a batch of 64-bit hashes into the registers, in place."""
    if hashes.size == 0:
        return
    idx = (hashes >> U64(64 - p)).astype(np.int64)
    # Rank window = top W bits of the 64-p bits after the index (W capped at
    # 52 so every w fits exactly in float64 and frexp gives bitlength exactly).
    w_bits = min(64 - p, 52)
    w = (hashes << U64(p)) >> U64(64 - w_bits)
    _, exp = np.frexp(w.astype(np.float64))  # bitlength(w); 0 for w == 0
    rank = (w_bits + 1 - exp).astype(np.uint8)  # leading zeros in window + 1
    np.maximum.at(registers, idx, rank)


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def estimate(registers: np.ndarray) -> float:
    m = registers.shape[0]
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.ldexp(1.0, -registers.astype(np.int64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(registers == 0))
        if zeros:
            return float(m * np.log(m / zeros))
    return float(est)


def to_bytes(registers: np.ndarray) -> bytes:
    return registers.tobytes()


def from_bytes(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.uint8).copy()
