"""Streaming sharded query path — for bank indexes too large to broadcast.

The broadcast prober (``stages.probe``) ships the whole bank matrix to every
worker; at reference-scale configs (m = 4×10^10, thousands of sources) that
is terabytes.  This path inverts the data movement: the BANK Dataset streams
through ``map_batches`` one (source, shard) row at a time while the QUERY
probe set — the small side — is broadcast once via ``ray.put``
(SURVEY.md §7.1 step 3: "broadcast probe when it fits; shard-keyed
evaluation when it doesn't").

Protocol:
  1. Hash all query windows once on the driver; bucket probe entries by the
     shard their bit falls in (the analogue of the reference's hash binning,
     /root/reference/metaprofi/lib/search_index.py:578-592).
  2. Stream bank rows; for each (source, shard) row evaluate that shard's
     probe entries against the packed bits and emit ONE row per (query,
     source): a packed per-window "all probes of this window that fall in
     this shard are present" bitmask.  Windows with no probes in the shard
     stay 1 (vacuous AND).
  3. ``groupby(query_id, source)`` ANDs the shard masks; popcount of the
     final mask = windows found; threshold ``ceil(n_wins·θ/100)`` as always.

Shuffle volume: queries × sources_hit × shards_touched small mask rows —
independent of m and of corpus size.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray

from ..config import SketchConfig
from ..functions.tokenize import batch_windows
from ..sketches import bloom, hashing
from .probe import HITS_SCHEMA


class QueryProbeSet:
    """Driver-built broadcastable probe structure for one query table."""

    def __init__(self, queries: pa.Table, cfg: SketchConfig):
        values, starts, row_of_window = batch_windows(queries, cfg.k)
        self.query_ids: list[str] = queries["query_id"].to_pylist()
        self.n_queries = len(self.query_ids)
        n_wins_total = starts.shape[0]
        seg = np.searchsorted(row_of_window, np.arange(self.n_queries))
        self.wins_per_query = np.diff(np.append(seg, n_wins_total))
        self.win_offset = seg  # global window id base per query
        bits = bloom.bits_for_windows(values, starts, cfg)  # (n_wins, h)
        flat = bits.reshape(-1)
        entry_win = np.repeat(np.arange(n_wins_total, dtype=np.int64), cfg.h)
        entry_query = np.repeat(row_of_window, cfg.h)
        shard_ids = flat // cfg.shard_bits
        local = flat % cfg.shard_bits
        self.per_shard: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for sid in np.unique(shard_ids):
            m = shard_ids == sid
            self.per_shard[int(sid)] = (local[m], entry_win[m], entry_query[m])
        self.n_wins_total = n_wins_total
        self.query_index = {q: i for i, q in enumerate(self.query_ids)}
        # windows constrained by each shard (>= 1 probe there): needed to
        # CLEAR windows when a source has no bank row for a probed shard
        # (missing row == all bits absent, not vacuously present)
        self.shard_win_mask: dict[int, np.ndarray] = {}
        for sid, (_, ew, _) in self.per_shard.items():
            m = np.zeros(n_wins_total, dtype=bool)
            m[ew] = True
            self.shard_win_mask[sid] = m


def _masks_for_bank_row(
    probe: QueryProbeSet, bits_buf: bytes, shard_id: int
) -> np.ndarray | None:
    """Global window mask (bool, n_wins_total) for one bank row, or None
    if no probe bit falls in this shard.  Windows whose probes are all
    elsewhere stay True (vacuous AND)."""
    entries = probe.per_shard.get(shard_id)
    if entries is None:
        return None
    local, entry_win, _ = entries
    # merged bank rows are always tagged dense (or_merge output)
    bank = bloom.decode_dense(bits_buf, len(bits_buf) - 1)
    present = (bank[local // 8] >> (local % 8).astype(np.uint8)) & 1
    # window bit clears when ANY of its probes in this shard is absent
    mask_bits = np.ones(probe.n_wins_total, dtype=bool)
    np.logical_and.at(mask_bits, entry_win, present.astype(bool))
    return mask_bits


N_REDUCE_BUCKETS = 64


def _reduce_bucket(query_id: str, source: str, n_buckets: int = N_REDUCE_BUCKETS) -> int:
    """Cross-process-deterministic coarse bucket for the reduce groupby
    (Python ``hash`` is salted per process and would split keys)."""
    import zlib

    return zlib.crc32(f"{query_id}\x00{source}".encode()) % n_buckets


class ShardProber:
    """Actor-pool stage over the BANK dataset: emits per-(query, source)
    shard masks.  Probe set loaded once per actor (broadcast).  Each row
    carries ``kb``, a coarse bucket over (query, source), so the downstream
    reduce shuffles into ``N_REDUCE_BUCKETS`` groups instead of one Ray
    dispatch per (query, source) pair — millions of tiny groups at scale."""

    def __init__(self, probe_ref):
        self.probe: QueryProbeSet = ray.get(probe_ref)

    def __call__(self, bank_batch: pa.Table) -> pa.Table:
        probe = self.probe
        out = {"query_id": [], "source": [], "mask": [], "kb": []}
        sources = bank_batch["source"].to_pylist()
        shard_ids = bank_batch["shard_id"].to_pylist()
        bits_col = bank_batch["bits"]
        for row in range(bank_batch.num_rows):
            sid = shard_ids[row]
            if sid < 0:
                continue
            mask_bits = _masks_for_bank_row(probe, bits_col[row].as_py(), sid)
            if mask_bits is None:
                continue
            # only queries with >= 1 probe in this shard get a row; each
            # gets its own window-range slice (rows stay tiny regardless of
            # how many queries ride the batch)
            qset = np.unique(probe.per_shard[sid][2])
            src = sources[row]
            for q in qset:
                lo = int(probe.win_offset[q])
                nw = int(probe.wins_per_query[q])
                pb = np.packbits(
                    mask_bits[lo : lo + nw], bitorder="little"
                ).tobytes()
                qid = probe.query_ids[q]
                out["query_id"].append(qid)
                out["source"].append(src)
                out["mask"].append(pb)
                out["kb"].append(_reduce_bucket(qid, src))
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.string()),
                "source": pa.array(out["source"], pa.string()),
                "mask": pa.array(out["mask"], pa.large_binary()),
                "kb": pa.array(out["kb"], pa.int32()),
            }
        )


def make_reduce_masks(probe_ref, theta: int, source_shards_ref):
    """Build the groupby(kb) finalizer: within one coarse bucket, iterate the
    (query, source) pairs IN-PROCESS (no per-pair Ray dispatch), AND each
    pair's shard masks (clearing windows probed in shards the source has NO
    bank row for), count the query's windows, apply the theta threshold."""

    # ray.get once per WORKER (closure cache), not once per group
    cache: dict = {}

    def _finalize_pair(
        probe: QueryProbeSet,
        source_shards: dict[str, set[int]],
        qid: str,
        source: str,
        masks: list[bytes],
        out: dict,
    ) -> None:
        acc = np.frombuffer(masks[0], dtype=np.uint8).copy()
        for m in masks[1:]:
            acc &= np.frombuffer(m, dtype=np.uint8)
        q = probe.query_index[qid]
        lo = int(probe.win_offset[q])
        nw = int(probe.wins_per_query[q])
        if nw == 0:
            return
        bits = np.unpackbits(acc, bitorder="little")[:nw].astype(bool)
        have = source_shards.get(source, set())
        for sid in probe.per_shard:
            if sid not in have:
                bits &= ~probe.shard_win_mask[sid][lo : lo + nw]
        found = int(bits.sum())
        min_wins = max(1, math.ceil(nw * theta / 100))
        if found < min_wins:
            return
        out["query_id"].append(qid)
        out["source"].append(source)
        out["wins_found"].append(found)
        out["n_wins"].append(nw)
        out["fraction"].append(round(found * 100.0 / nw, 2))

    def reduce_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return HITS_SCHEMA.empty_table()
        if "probe" not in cache:
            cache["probe"] = ray.get(probe_ref)
            cache["source_shards"] = ray.get(source_shards_ref)
        probe: QueryProbeSet = cache["probe"]
        source_shards: dict[str, set[int]] = cache["source_shards"]
        qids = group["query_id"].to_pylist()
        srcs = group["source"].to_pylist()
        masks = group["mask"].to_pylist()
        by_pair: dict[tuple[str, str], list[bytes]] = {}
        for qid, src, m in zip(qids, srcs, masks):
            by_pair.setdefault((qid, src), []).append(m)
        out: dict[str, list] = {
            "query_id": [], "source": [], "wins_found": [],
            "n_wins": [], "fraction": [],
        }
        for (qid, src), ms in by_pair.items():
            _finalize_pair(probe, source_shards, qid, src, ms, out)
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.string()),
                "source": pa.array(out["source"], pa.string()),
                "wins_found": pa.array(out["wins_found"], pa.int64()),
                "n_wins": pa.array(out["n_wins"], pa.int64()),
                "fraction": pa.array(out["fraction"], pa.float64()),
            },
            schema=HITS_SCHEMA,
        )

    return reduce_bucket
