"""t-digest quantile sketch (merging variant, pure NumPy, mergeable).

Not present in the reference (mandated sibling sketch per BASELINE.json
north_rule).  Dunning's merging t-digest with the k1 (arcsine) scale function:
centroid sizes are bounded so that rank error is tightest at the tails.
Merge = concatenate centroid lists + recompress; associative only up to the
published rank-error bound (NOT byte-deterministic under reordering — tests
compare quantiles within tolerance, per SURVEY.md §7.3 "merge determinism").

State = (means float64[n], weights float64[n]) sorted by mean after compress.
"""

from __future__ import annotations

import numpy as np


class TDigest:
    __slots__ = ("delta", "means", "weights", "_buf_m", "_buf_w")

    def __init__(self, delta: int = 100):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf_m: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []

    # ---- updates -------------------------------------------------------
    def update(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        values = np.asarray(values, dtype=np.float64).ravel()
        if values.size == 0:
            return
        self._buf_m.append(values)
        self._buf_w.append(
            np.ones_like(values) if weights is None else np.asarray(weights, np.float64)
        )
        if sum(a.size for a in self._buf_m) > 32 * self.delta:
            self.compress()

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.delta)
        self.compress()
        other.compress()
        out._buf_m = [self.means, other.means]
        out._buf_w = [self.weights, other.weights]
        out.compress()
        return out

    @staticmethod
    def _k1(q: np.ndarray | float, delta: int):
        return delta / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def compress(self) -> None:
        if not self._buf_m and self.means.size <= self.delta * 2:
            return
        m = np.concatenate([self.means] + self._buf_m) if self._buf_m else self.means
        w = np.concatenate([self.weights] + self._buf_w) if self._buf_w else self.weights
        self._buf_m, self._buf_w = [], []
        if m.size == 0:
            return
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        total = w.sum()
        # Vectorized k1 binning: cluster boundary wherever the scale function
        # k1(q) crosses an integer.  Equivalent size bound to the greedy
        # merge (each cluster spans < 1 unit of k), fully deterministic, and
        # O(n) numpy instead of a Python loop per centroid.
        q_mid = (np.cumsum(w) - w / 2.0) / total
        bins = np.floor(self._k1(q_mid, self.delta)).astype(np.int64)
        # segment boundaries where the bin changes
        seg = np.flatnonzero(np.diff(bins)) + 1
        starts = np.concatenate([[0], seg])
        wsum = np.add.reduceat(w, starts)
        msum = np.add.reduceat(m * w, starts)
        self.means = msum / wsum
        self.weights = wsum

    # ---- queries -------------------------------------------------------
    def quantile(self, q: float) -> float:
        self.compress()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    @property
    def n(self) -> float:
        self.compress()
        return float(self.weights.sum())

    # ---- serialization -------------------------------------------------
    def to_bytes(self) -> bytes:
        self.compress()
        header = np.array([self.delta, self.means.size], dtype=np.int64)
        return header.tobytes() + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "TDigest":
        delta, n = np.frombuffer(buf[:16], dtype=np.int64)
        td = cls(int(delta))
        td.means = np.frombuffer(buf[16 : 16 + 8 * n], dtype=np.float64).copy()
        td.weights = np.frombuffer(buf[16 + 8 * n : 16 + 16 * n], dtype=np.float64).copy()
        return td
