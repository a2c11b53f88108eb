"""KLL quantile sketch (Karnin–Lang–Liberty, pure NumPy, mergeable).

Not present in the reference (mandated sibling sketch per BASELINE.json
north_rule).  Compactor-array sketch: level h holds items of weight 2**h;
when a level overflows its capacity ``max(2, ceil(k * (2/3)**depth))`` it is
sorted and every other item is promoted to level h+1.  The even/odd choice
alternates deterministically per level (a deterministic variant of the
random coin; preserves the O(1/k) rank-error behavior in practice and makes
runs reproducible — SURVEY.md §7.3 asks for determinism-aware testing).

Merge = levelwise concatenation + compaction; associative within the rank
error bound (not byte-deterministic under reordering).
"""

from __future__ import annotations

import numpy as np

_C = 2.0 / 3.0


class KLL:
    __slots__ = ("k", "levels", "_coin", "n")

    def __init__(self, k: int = 200):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self._coin: list[int] = [0]
        self.n = 0

    def _capacity(self, level: int) -> int:
        depth = len(self.levels) - level - 1
        return max(2, int(np.ceil(self.k * (_C**depth))))

    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64).ravel()
        if values.size == 0:
            return
        self.n += values.size
        self.levels[0] = np.concatenate([self.levels[0], values])
        self._compact()

    def _compact(self) -> None:
        h = 0
        while h < len(self.levels):
            if self.levels[h].size > self._capacity(h):
                if h + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                    self._coin.append(0)
                items = np.sort(self.levels[h])
                offset = self._coin[h] & 1
                self._coin[h] += 1
                promoted = items[offset::2]
                self.levels[h] = np.empty(0, dtype=np.float64)
                self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
            h += 1

    def merge(self, other: "KLL") -> "KLL":
        out = KLL(self.k)
        out.n = self.n + other.n
        depth = max(len(self.levels), len(other.levels))
        out.levels = []
        out._coin = []
        for h in range(depth):
            a = self.levels[h] if h < len(self.levels) else np.empty(0)
            b = other.levels[h] if h < len(other.levels) else np.empty(0)
            out.levels.append(np.concatenate([a, b]).astype(np.float64))
            ca = self._coin[h] if h < len(self._coin) else 0
            cb = other._coin[h] if h < len(other._coin) else 0
            out._coin.append(ca + cb)
        out._compact()
        return out

    # ---- queries -------------------------------------------------------
    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, level in enumerate(self.levels):
            if level.size:
                vals.append(level)
                wts.append(np.full(level.size, float(1 << h)))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._weighted()
        if v.size == 0:
            return float("nan")
        cum = np.cumsum(w) - w / 2.0
        return float(np.interp(q * w.sum(), cum, v))

    def rank(self, x: float) -> float:
        """Approximate fraction of items <= x."""
        v, w = self._weighted()
        if v.size == 0:
            return float("nan")
        return float(w[v <= x].sum() / w.sum())

    # ---- serialization -------------------------------------------------
    def to_bytes(self) -> bytes:
        import io

        buf = io.BytesIO()
        sizes = np.array(
            [self.k, self.n, len(self.levels)] + [lv.size for lv in self.levels],
            dtype=np.int64,
        )
        buf.write(np.array([sizes.size], dtype=np.int64).tobytes())
        buf.write(sizes.tobytes())
        buf.write(np.array(self._coin, dtype=np.int64).tobytes())
        for lv in self.levels:
            buf.write(lv.tobytes())
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "KLL":
        hdr_n = int(np.frombuffer(buf[:8], dtype=np.int64)[0])
        sizes = np.frombuffer(buf[8 : 8 + 8 * hdr_n], dtype=np.int64)
        k, n, n_levels = int(sizes[0]), int(sizes[1]), int(sizes[2])
        level_sizes = sizes[3:]
        pos = 8 + 8 * hdr_n
        sk = cls(k)
        sk.n = n
        sk._coin = list(np.frombuffer(buf[pos : pos + 8 * n_levels], dtype=np.int64))
        pos += 8 * n_levels
        sk.levels = []
        for sz in level_sizes:
            sk.levels.append(np.frombuffer(buf[pos : pos + 8 * sz], dtype=np.float64).copy())
            pos += 8 * int(sz)
        return sk
