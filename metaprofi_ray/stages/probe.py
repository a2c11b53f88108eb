"""Query-side probe stage: broadcast bank matrices, vectorized bit tests.

Replaces the reference's fork/LMDB query machinery
(/root/reference/metaprofi/lib/search_index.py:270-379: hash → bin → fetch
slices into LMDB → per-kmer AND) with a single stateful actor-pool
``map_batches`` stage: the loaded ``BankIndex`` is ``ray.put`` once and each
prober actor ``ray.get``s it in ``__init__`` (T3 analogue — state loaded once
per worker, probed for many batches).

Semantics parity (SURVEY.md §2.4 A3–A5):
  * per window: AND of its h probed bits per source (A3/A4);
  * theta: per-source count of matching windows over ALL windows including
    duplicates, hit iff ``count >= ceil(n_wins * theta / 100)``
    (exact search == theta=100).  DELIBERATE DIVERGENCE: the reference
    evaluates ``ceil((n_wins/100) * theta)`` (search_index.py:532), whose
    intermediate float rounding shifts the threshold on ~1.6% of
    (n_wins, theta) pairs (e.g. n_wins=14, theta=50 → reference demands 8
    windows, this engine 7; n_wins=7, theta=100 → reference demands an
    impossible 8).  The integer-exact form here is kept on purpose; parity
    tests must not chase the reference's float artifact;
  * queries with zero windows or zero hits produce no rows (F5,
    search_index.py:595-611).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray

from ..config import SketchConfig
from ..functions.tokenize import batch_windows
from ..sketches import bloom, hashing
from ..sources.io import BankIndex

def min_windows(nw, theta: int, compat: str = "exact"):
    """Window-count threshold for a theta-containment hit.

    ``compat="exact"`` (default): integer-exact ``ceil(nw·θ/100)``.
    ``compat="reference"``: the reference's float form
    ``ceil((nw/100)·θ)`` (search_index.py:532), whose intermediate
    rounding shifts the threshold on ~1.6% of (nw, θ) pairs — e.g.
    nw=7, θ=100 demands an impossible 8 windows.  Parity harnesses
    comparing against the reference should pass ``compat="reference"``
    so those boundary diffs are expected rather than flagged as bugs.
    Works on scalars and numpy arrays."""
    if compat == "reference":
        return np.maximum(1, np.ceil((np.asarray(nw) / 100.0) * theta)).astype(
            np.int64
        )
    if compat != "exact":
        raise ValueError(f"unknown theta compat mode {compat!r}")
    return np.maximum(
        1, -(-np.asarray(nw) * theta // 100)
    ).astype(np.int64)


HITS_SCHEMA = pa.schema(
    [
        ("query_id", pa.string()),
        ("source", pa.string()),
        ("wins_found", pa.int64()),
        ("n_wins", pa.int64()),
        ("fraction", pa.float64()),
    ]
)


def _win_presence(bits: np.ndarray, index: BankIndex) -> np.ndarray:
    """(n_windows, n_sources) bool: every probe bit of the window present."""
    cfg: SketchConfig = index.cfg
    n_sources = len(index.sources)
    flat = bits.reshape(-1)
    shard_ids = flat // cfg.shard_bits
    local = flat % cfg.shard_bits
    presence = np.zeros((flat.size, n_sources), dtype=np.uint8)
    for sid in np.unique(shard_ids):
        mat = index.matrices.get(int(sid))
        if mat is None:
            continue  # no source ever set a bit in this shard
        mask = shard_ids == sid
        loc = local[mask]
        presence[mask] = bloom.contains_counts(
            mat, loc // 8, (loc % 8).astype(np.uint8)
        )
    # AND across the h hash probes of each window (A3)
    return presence.reshape(bits.shape[0], cfg.h, n_sources).all(axis=1)


class SlicePresenceCache:
    """Per-actor memo of probed window slices — the engine's analogue of the
    reference's LMDB bit-slice cache (search_index.py:316-351,
    lmdb_kvstore.py:11-238): overlapping QUERY SETS reuse each window's
    (n_sources) presence row instead of re-testing bank bits.

    Keys are the exact 128-bit (h1, h2) double-hash pair (identical probes
    ⇔ identical presence — no collision risk at 64+64 bits); values are the
    presence row packed to ``ceil(n_sources/8)`` bytes.  Bounded FIFO.
    Valid only against one immutable index (the owner pins one)."""

    def __init__(self, max_entries: int = 1 << 20):
        self.max_entries = max_entries
        self.data: dict[int, bytes] = {}
        self.hits = 0
        self.misses = 0

    def stats(self) -> dict:
        return {
            "entries": len(self.data),
            "hits": self.hits,
            "misses": self.misses,
        }


def probe_batch(
    batch: pa.Table,
    index: BankIndex,
    theta: int,
    query_col: str = "query_id",
    cache: SlicePresenceCache | None = None,
    theta_compat: str = "exact",
) -> pa.Table:
    """Vectorized probe of one query batch against the full bank matrix.
    With ``cache``, windows already probed by ANY previous request on this
    actor reuse their cached presence rows (bit tests run only for cache
    misses)."""
    cfg: SketchConfig = index.cfg
    n_sources = len(index.sources)
    if batch.num_rows == 0 or n_sources == 0:
        return HITS_SCHEMA.empty_table()
    values, starts, row_of_window = batch_windows(batch, cfg.k)
    n_wins_total = starts.shape[0]
    if n_wins_total == 0:
        return HITS_SCHEMA.empty_table()
    h1, h2 = hashing.hash_windows_2(
        values, starts, cfg.k, hashing.SEED_H1, hashing.SEED_H2
    )
    if cache is None:
        bits = hashing.double_hash_bits(h1, h2, cfg.h, cfg.m)
        win_present = _win_presence(bits, index)
    else:
        keys = [
            (int(a) << 64) | int(b) for a, b in zip(h1.tolist(), h2.tolist())
        ]
        miss = [i for i, k in enumerate(keys) if k not in cache.data]
        cache.hits += n_wins_total - len(miss)
        cache.misses += len(miss)
        win_present = np.empty((n_wins_total, n_sources), dtype=bool)
        if miss:
            mi = np.asarray(miss, dtype=np.int64)
            bits = hashing.double_hash_bits(h1[mi], h2[mi], cfg.h, cfg.m)
            fresh = _win_presence(bits, index)
            win_present[mi] = fresh
            if len(cache.data) < cache.max_entries:
                packed = np.packbits(fresh, axis=1, bitorder="little")
                for j, i in enumerate(miss):
                    cache.data[keys[i]] = packed[j].tobytes()
        missset = set(miss)
        cached_rows = [i for i in range(n_wins_total) if i not in missset]
        if cached_rows:
            stacked = np.frombuffer(
                b"".join(cache.data[keys[i]] for i in cached_rows),
                dtype=np.uint8,
            ).reshape(len(cached_rows), -1)
            unpacked = np.unpackbits(
                stacked, axis=1, bitorder="little"
            )[:, :n_sources].astype(bool)
            win_present[np.asarray(cached_rows, dtype=np.int64)] = unpacked
    # per-query window counts via segment reduction (rows are in order)
    n_rows = batch.num_rows
    seg_starts = np.searchsorted(row_of_window, np.arange(n_rows))
    wins_per_row = np.diff(np.append(seg_starts, n_wins_total))
    # reduceat only over rows that HAVE windows: their segment starts are
    # strictly increasing and in-bounds, so no clamping (a clamp would
    # truncate the last windowed row's segment when trailing rows have
    # zero windows — regression-tested)
    rows_with = np.flatnonzero(wins_per_row > 0)
    counts = np.add.reduceat(win_present, seg_starts[rows_with], axis=0)
    q_ids: list[str] = []
    s_names: list[str] = []
    found: list[int] = []
    totals: list[int] = []
    fracs: list[float] = []
    qcol = batch.column(query_col).to_pylist()
    src_arr = np.asarray(index.sources)
    for ri, r in enumerate(rows_with):
        nw = int(wins_per_row[r])
        min_wins = int(min_windows(nw, theta, theta_compat))
        row_counts = counts[ri]
        hit = np.nonzero(row_counts >= min_wins)[0]
        if hit.size == 0:
            continue
        q_ids.extend([qcol[r]] * hit.size)
        s_names.extend(src_arr[hit].tolist())
        found.extend(row_counts[hit].astype(int).tolist())
        totals.extend([nw] * hit.size)
        fracs.extend((row_counts[hit] * 100.0 / nw).round(2).tolist())
    return pa.table(
        {
            "query_id": q_ids,
            "source": s_names,
            "wins_found": pa.array(found, pa.int64()),
            "n_wins": pa.array(totals, pa.int64()),
            "fraction": pa.array(fracs, pa.float64()),
        },
        schema=HITS_SCHEMA,
    )


# NOTE: the former actor-pool QueryProber wrapper was removed — the query
# Dataset path now runs probe_batch as a task pool (pipelines/query.py,
# zero-copy ray.get of the broadcast index per task beats actor spawn), and
# the persistent-state form lives in pipelines/query_service.QueryService.
