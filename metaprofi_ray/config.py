"""Sketch-engine configuration.

Mirrors the reference's frozen-at-build config discipline
(/root/reference/metaprofi/lib/utilities.py:215-382 computes derived sizes and
freezes ``(k, m, h, sequence_type)`` into store metadata;
/root/reference/metaprofi/lib/build_index_zarr.py:261-278 re-validates on every
update; /root/reference/metaprofi/lib/search_index.py:76-97 on every query).

Here the config is an immutable dataclass serialized to ``manifest.json`` next
to the bank Parquet and validated on open/update/query.  The payload is
pre-tokenized sequences, so ``k`` counts int32 tokens per shingle window (the
analogue of the reference's k-mer width) rather than characters.
"""

from __future__ import annotations

import json
import math
from dataclasses import asdict, dataclass, field, replace

FORMAT_VERSION = 2  # v2: tagged sparse/dense shard encodings in bank rows

# Bits are always packed little-endian within a byte, matching the reference's
# setbit layout (/root/reference/metaprofi/lib/bloomfilter_cython.pyx:47-59:
# ``bit_idx = hash % 8; row_idx = hash // 8``).  Fixing the layout removes the
# reference's runtime endianness gate (zarrstore.py:59-69).
BIT_ORDER = "little"


@dataclass(frozen=True)
class SketchConfig:
    """Parameters frozen into an index at build time.

    k:        shingle width in tokens (reference: k-mer size).
    h:        number of Bloom hash functions (double hashing g_i = h1 + i*h2).
    m:        Bloom filter size in bits per source; padded up so that
              ``m % (8 * shards) == 0`` (reference zero-pads m to a byte
              multiple, utilities.py:257-265).
    shards:   number of bit-range shards each source's bank is split into;
              the merge/shuffle key is (source, shard_id) so no single
              aggregation buffer ever holds the full m-bit row.
    hll_p:    HyperLogLog precision (2**p registers).
    cms_w/d:  count-min sketch width/depth (eps ~= e/w, delta ~= e^-d).
    tdigest_delta: t-digest compression (max centroids ~ delta).
    kll_k:    KLL sketch parameter (rank error ~ O(1/k)).
    """

    k: int = 8
    h: int = 2
    m: int = 1 << 17
    shards: int = 4
    hll_p: int = 12
    cms_w: int = 2048
    cms_d: int = 4
    tdigest_delta: int = 100
    kll_k: int = 200
    version: int = field(default=FORMAT_VERSION)

    def __post_init__(self) -> None:
        if self.k < 1:
            raise ValueError("k must be >= 1")
        if self.h < 1:
            raise ValueError("h must be >= 1")
        if self.shards < 1:
            raise ValueError("shards must be >= 1")
        # Pad m up so each shard is a whole number of bytes (the reference
        # pads m to a byte multiple, utilities.py:257-265; we additionally
        # pad to the shard grid).
        grid = 8 * self.shards
        padded = ((self.m + grid - 1) // grid) * grid
        object.__setattr__(self, "m", padded)

    # ---- derived sizes -------------------------------------------------
    @property
    def shard_bits(self) -> int:
        return self.m // self.shards

    @property
    def shard_bytes(self) -> int:
        return self.shard_bits // 8

    @property
    def packed_bytes(self) -> int:
        """Packed bytes per full per-source Bloom bank (reference
        ``packed_bytes_per_bloomfilter``, utilities.py:257-265)."""
        return self.m // 8

    def fpr_bound(self, n_distinct: int) -> float:
        """Theoretical Bloom FPR ``(1 - e^{-h n / m})^h``
        (reference README.md:274-335 sizing formulas)."""
        if n_distinct <= 0:
            return 0.0
        return (1.0 - math.exp(-self.h * n_distinct / self.m)) ** self.h

    @staticmethod
    def size_for(n: int, p: float) -> tuple[int, int]:
        """(m, h) for target capacity ``n`` and FPR ``p`` — the reference's
        published sizing formulas (README.md:274-335)."""
        m = math.ceil(-n * math.log(p) / (math.log(2) ** 2))
        h = max(1, round(m / n * math.log(2)))
        return m, h

    # ---- (de)serialization --------------------------------------------
    def to_json(self) -> str:
        return json.dumps({"bit_order": BIT_ORDER, **asdict(self)}, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "SketchConfig":
        d = json.loads(s)
        d.pop("bit_order", None)
        return cls(**d)

    def validate_compatible(self, other: "SketchConfig") -> None:
        """Update/query gate: every sketch-shape parameter must match
        (reference build_index_zarr.py:261-278, search_index.py:76-92)."""
        if replace(self) != replace(other):
            raise ValueError(
                f"incompatible sketch config: index built with {self}, got {other}"
            )
