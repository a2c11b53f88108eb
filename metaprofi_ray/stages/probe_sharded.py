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
  2. Stream bank rows; COMBINE LOCALLY per source: every shard row of a
     source seen in the same batch ANDs its window bits into one
     per-(query, source) mask (windows with no probes in the seen shards
     stay 1 — vacuous AND), so the shuffle moves ONE mask row per
     (query, source) per batch, not one per shard.
  3. ``groupby(kb)`` (coarse bucket over (query, source)) ANDs the
     remaining per-batch masks; popcount of the final mask = windows
     found; threshold ``ceil(n_wins·θ/100)`` as always.

Shuffle volume: one mask row per (query, source) pair actually
CONSTRAINED by a shard in the batch (vacuous pairs are omitted — a pair
untouched by every batch can never be a hit because the reduce clears all
its windows via the missing-shard correction) — independent of m, of
shard count, and of corpus size, and never the S×Q cross product.

At ≥4096 queries the pipeline auto-selects LANE rows instead: one row
per (source, reduce bucket) carrying every bucket query's packed mask
(the kb-major layout makes each bucket's bytes contiguous — emission is
offset arithmetic, no gather).  Same payload bytes, ~Q/64 fewer rows;
measured on a 16-source 200k-doc index: 50k queries 5.5 → 4.8 s, 100k
6.6 → 4.7 s, identical hits.  The same protocol pair exists on the
probeset-as-Dataset tier (``stages.probe_distributed``).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray

from ..config import SketchConfig
from ..functions.tokenize import batch_windows
from ..sketches import bloom, hashing
from .probe import HITS_SCHEMA, min_windows


class QueryProbeSet:
    """Driver-built broadcastable probe structure for one query table.

    Besides the raw per-shard probe entries, precomputes everything the
    vectorized prober needs so the per-bank-row work is pure array math:
    for each shard, the probe entries sorted by window (``order``/``seg``),
    the distinct constrained windows (``win_ids``), each window's position
    in the CONCATENATED per-query output layout (``flat_pos``), and the
    byte-aligned layout itself (``qset``/``pair_nw``/``byte_off``/
    ``template``) — every query's window range padded to a byte boundary
    so ONE ``np.packbits`` per bank batch packs every (row, query) mask."""

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
        # ---- vectorized-prober precomputation ----
        # GLOBAL byte-aligned output layout over ALL queries: one packed
        # mask buffer per source covers every query, so shard rows of a
        # source combine locally (bit-AND in place) before any shuffle.
        # Layout SLOTS are kb-major (``kb = qhash % N_REDUCE_BUCKETS``,
        # query-index-ascending within) so each reduce bucket's mask bytes
        # are CONTIGUOUS — lane mode emits one row per (source, kb) by
        # pure offset arithmetic (see ``probe_distributed._emit_lanes``,
        # the same protocol at the probeset-as-Dataset scale tier).
        self.qid_arr = np.array(self.query_ids, dtype=object)
        self.qhash = np.array(
            [_str_hash64(q) for q in self.query_ids], dtype=np.uint64
        )
        kb_of_q = (self.qhash % np.uint64(N_REDUCE_BUCKETS)).astype(np.int64)
        qi_of_slot = np.lexsort(
            (np.arange(self.n_queries, dtype=np.int64), kb_of_q)
        )
        slot_of_qi = np.empty(self.n_queries, dtype=np.int64)
        slot_of_qi[qi_of_slot] = np.arange(self.n_queries, dtype=np.int64)
        self.qi_of_slot = qi_of_slot
        self.slot_of_qi = slot_of_qi
        self.kb_of_q = kb_of_q
        self.kb_bounds = np.searchsorted(
            kb_of_q[qi_of_slot], np.arange(N_REDUCE_BUCKETS + 1)
        )
        nw_layout = self.wins_per_query[qi_of_slot]
        pad_bits = ((nw_layout + 7) // 8) * 8
        bit_off = np.concatenate([[0], np.cumsum(pad_bits)])
        L = int(bit_off[-1])
        # vectorized: bit b is live iff its offset inside its slot's padded
        # region is below that query's window count (owner via repeat over
        # the padded run lengths — O(L), no searchsorted over every bit)
        pos = np.arange(L, dtype=np.int64)
        owner = np.repeat(
            np.arange(len(nw_layout), dtype=np.int64), pad_bits
        )
        template = (pos - bit_off[owner]) < nw_layout[owner]
        self.g_bit_off = bit_off  # indexed by SLOT, not query index
        self.g_byte_off = (bit_off // 8).astype(np.int64)
        self.g_template = template
        self.lane_bounds = self.g_byte_off[self.kb_bounds]
        self.shard_plan: dict[int, dict] = {}
        for sid, (loc, ew, eq) in self.per_shard.items():
            order = np.argsort(ew, kind="stable")
            ew_sorted = ew[order]
            win_ids, win_starts = np.unique(ew_sorted, return_index=True)
            # each constrained window -> its bit position in the global
            # layout (window's owning query SLOT range + in-query offset)
            w_query = row_of_window[win_ids]
            flat_pos = bit_off[slot_of_qi[w_query]] + (
                win_ids - self.win_offset[w_query]
            )
            self.shard_plan[int(sid)] = {
                "local_sorted": loc[order],
                "win_seg": win_starts,
                "flat_pos": flat_pos,
                # queries constrained by this shard: the prober emits mask
                # rows ONLY for these (unconstrained pairs are vacuous
                # all-ones under AND and would blow the reduce volume up to
                # S×Q per batch — ADVICE r2)
                "q_constrained": np.unique(w_query),
            }


N_REDUCE_BUCKETS = 64

MASKS_SCHEMA = pa.schema(
    [
        ("qi", pa.int32()),
        ("si", pa.uint64()),
        ("mask", pa.large_binary()),
        ("kb", pa.int32()),
    ]
)
_EMPTY_MASKS = MASKS_SCHEMA.empty_table()


def _str_hash64(s: str) -> int:
    """Cross-process-deterministic 64-bit string hash (Python ``hash`` is
    salted per process and would split groupby keys)."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(s.encode(), digest_size=8).digest(), "little"
    )


class ShardProber:
    """Actor-pool stage over the BANK dataset: emits per-(query, source)
    shard masks.  Probe set loaded once per actor (broadcast).

    Fully vectorized per shard: one gather+shift tests every probe bit of
    every bank row at once, one ``bitwise_and.reduceat`` ANDs probes into
    window bits, one ``np.packbits`` packs EVERY (row, query) mask (the
    per-query regions are byte-aligned in the precomputed layout), and the
    Arrow binary column is built directly from that packed buffer + offset
    arithmetic — no per-row or per-query Python.

    Each row carries ``kb``, a coarse bucket over (query, source), so the
    downstream reduce shuffles into ``N_REDUCE_BUCKETS`` groups instead of
    one Ray dispatch per (query, source) pair — millions of tiny groups at
    scale.

    ``lane_mode`` emits ONE row per (source, kb) carrying the packed masks
    of every query in that bucket (kb contiguous in the layout): the same
    payload bytes in ~n_queries/NKB fewer rows, which is what the mask
    shuffle's sort cost is proportional to — the large-query-set form
    (auto-selected by the pipeline at ≥4096 queries; identical results,
    property-tested).  In lane mode ``kb = qhash % NKB`` (query-only, so
    lanes are source-independent); pair mode keeps the (query ^ source)
    mix for balance when queries are few."""

    def __init__(self, probe_ref, lane_mode: bool = False):
        self.probe: QueryProbeSet = ray.get(probe_ref)
        self.lane_mode = lane_mode

    def __call__(self, bank_batch: pa.Table) -> pa.Table:
        probe = self.probe
        sources = np.asarray(bank_batch["source"].to_pylist(), dtype=object)
        shard_ids = np.asarray(
            bank_batch["shard_id"].to_numpy(zero_copy_only=False)
        )
        bits_col = bank_batch["bits"]
        valid = np.flatnonzero(
            np.array(
                [
                    sid >= 0 and int(sid) in probe.shard_plan
                    for sid in shard_ids
                ]
            )
        )
        if valid.size == 0:
            return _EMPTY_MASKS
        # one combined mask buffer per SOURCE: every shard row of the
        # source ANDs its constrained windows in place (local combine —
        # the shuffle then moves one row per (query, source), not per
        # (query, source, shard))
        src_names = sorted({str(s) for s in sources[valid]})
        src_slot = {s: i for i, s in enumerate(src_names)}
        S = len(src_names)
        Qn = probe.n_queries
        L = probe.g_template.size
        mat = np.broadcast_to(probe.g_template, (S, L)).copy()
        # which (source, query) pairs this batch actually constrains —
        # only those emit rows (a pair with no probes in the batch's
        # shards is vacuous under AND; a pair with no constrained shard
        # ANYWHERE is cleared to zero windows by the reduce's
        # missing-shard correction and can never be a hit)
        constrained = np.zeros((S, Qn), dtype=bool)
        for r in valid:
            plan = probe.shard_plan[int(shard_ids[r])]
            buf = bits_col[int(r)].as_py()
            bank = bloom.decode_dense(buf, len(buf) - 1)
            loc = plan["local_sorted"]
            present = (bank[loc // 8] >> (loc % 8).astype(np.uint8)) & 1
            win_ok = np.bitwise_and.reduceat(
                present, plan["win_seg"]
            ).astype(bool)
            row = src_slot[str(sources[r])]
            mat[row, plan["flat_pos"]] &= win_ok
            constrained[row, plan["q_constrained"]] = True
        packed = np.packbits(mat, axis=1, bitorder="little")
        shash = np.array([_str_hash64(s) for s in src_names], dtype=np.uint64)
        if self.lane_mode:
            return _emit_stream_lanes(probe, packed, constrained, shash)
        LB = packed.shape[1]
        byte_off = probe.g_byte_off
        Q = probe.n_queries
        # rows are emitted in SLOT order (the packed layout's byte order —
        # Arrow binary offsets must be monotone); ``qi`` carries the query
        # index so the reduce never sees slot numbering
        qperm = probe.qi_of_slot
        offsets = np.empty(S * Q + 1, dtype=np.int64)
        offsets[:-1] = (
            np.arange(S, dtype=np.int64)[:, None] * LB + byte_off[None, :-1]
        ).ravel()
        offsets[-1] = S * LB
        mask_arr = pa.Array.from_buffers(
            pa.large_binary(),
            S * Q,
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(packed.tobytes())],
        )
        # NUMERIC pair keys only — query index + 64-bit source hash — so
        # millions of mask rows shuffle as fixed-width columns; the reduce
        # maps back to names via the broadcast probe/source tables.  String
        # columns here were the round-2 throughput ceiling (building and
        # re-materializing S×Q Python strings per batch).
        kb = (
            (probe.qhash[qperm][None, :] ^ shash[:, None])
            % np.uint64(N_REDUCE_BUCKETS)
        ).astype(np.int32).ravel()
        full = pa.table(
            {
                "qi": pa.array(np.tile(qperm.astype(np.int32), S)),
                "si": pa.array(np.repeat(shash, Q)),
                "mask": mask_arr,
                "kb": pa.array(kb, pa.int32()),
            }
        )
        # drop vacuous (source, query) rows: Arrow filter copies only the
        # kept mask slices, so reduce-side volume is pairs-constrained,
        # not S×Q per batch
        return full.filter(pa.array(constrained[:, qperm].ravel()))


def _emit_stream_lanes(
    probe: QueryProbeSet, packed: np.ndarray, constrained: np.ndarray,
    shash: np.ndarray,
) -> pa.Table:
    """Lane rows for one probed batch: the kb-major layout makes each
    reduce bucket's bytes contiguous in ``packed``, so emission is offset
    arithmetic — no gather.  A (source, kb) cell none of whose queries is
    constrained by this batch is omitted (omitted lanes are AND-identity:
    the template leaves every valid window bit set).  ``qi = -1`` marks
    lane rows."""
    S = len(shash)
    nkb = N_REDUCE_BUCKETS
    if probe.n_queries == 0:
        return _EMPTY_MASKS
    cg = constrained[:, probe.qi_of_slot]
    nonempty = probe.kb_bounds[1:] > probe.kb_bounds[:-1]
    starts = np.minimum(probe.kb_bounds[:-1], cg.shape[1] - 1)
    emit = (
        np.logical_or.reduceat(cg, starts, axis=1) & nonempty[None, :]
    ).ravel()
    if not emit.any():
        return _EMPTY_MASKS
    LB = packed.shape[1]
    n = S * nkb
    offsets = np.empty(n + 1, dtype=np.int64)
    offsets[:-1] = (
        np.arange(S, dtype=np.int64)[:, None] * LB
        + probe.lane_bounds[None, :-1]
    ).ravel()
    offsets[-1] = S * LB
    mask_arr = pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(packed.tobytes())],
    )
    full = pa.table(
        {
            "qi": pa.array(np.full(n, -1, dtype=np.int32)),
            "si": pa.array(np.repeat(shash, nkb)),
            "mask": mask_arr,
            "kb": pa.array(np.tile(np.arange(nkb, dtype=np.int32), S)),
        }
    )
    return full.filter(pa.array(emit))


def make_reduce_masks(probe_ref, theta: int, source_shards_ref,
                      theta_compat: str = "exact",
                      lane_mode: bool = False):
    """Build the groupby(kb) finalizer: within one coarse bucket, iterate the
    (query, source) pairs IN-PROCESS (no per-pair Ray dispatch), AND each
    pair's shard masks (clearing windows probed in shards the source has NO
    bank row for), count the query's windows, apply the theta threshold.

    The mask rows carry numeric keys only (``qi`` query index, ``si``
    64-bit source hash); names are restored here from the broadcast
    tables.  Mask bytes are gathered straight out of the Arrow value
    buffer with offset arithmetic — no per-row Python objects.

    With ``lane_mode`` the rows are per-(source, kb) LANES covering every
    query in the bucket (``_emit_stream_lanes``) and the reduce is
    ``_reduce_stream_lanes`` — one AND + popcount-per-region pass per
    source, no per-pair segmentation."""

    # ray.get once per WORKER (closure cache), not once per group
    cache: dict = {}
    # per-source packed missing-shard correction (see get_corr), cached
    # per worker — the set of incomplete sources is a property of the
    # index, not of the bucket.  Byte-capped: each entry spans the FULL
    # query layout, so thousands of incomplete sources at a large query
    # count would otherwise hold GBs per worker
    corr_cache: dict[int, np.ndarray] = {}
    CORR_CACHE_BYTES_MAX = 1 << 29

    POP = np.array(
        [bin(i).count("1") for i in range(256)], dtype=np.int64
    )

    def _fill_cache() -> None:
        if "probe" in cache:
            return
        cache["probe"] = ray.get(probe_ref)
        src_shards: dict[str, set[int]] = ray.get(source_shards_ref)
        probed = set(cache["probe"].per_shard)
        cache["hash2src"] = {
            int(_str_hash64(s)): s for s in src_shards
        }
        # per source-hash: complete = has a bank row for every probed
        # shard (incomplete sources need the per-pair missing-shard
        # correction: a missing row means ABSENT bits, not vacuous)
        cache["complete"] = {
            int(_str_hash64(s)): not (probed - sh)
            for s, sh in src_shards.items()
        }
        cache["missing"] = {
            int(_str_hash64(s)): probed - sh
            for s, sh in src_shards.items()
        }
        p = cache["probe"]
        # global window id -> its bit position in the byte-aligned
        # packed layout (each query padded to a byte boundary; layout
        # slots are kb-major, hence the slot_of_qi hop)
        w_query = np.repeat(
            np.arange(p.n_queries, dtype=np.int64), p.wins_per_query
        )
        cache["win_bit"] = p.g_bit_off[p.slot_of_qi[w_query]] + (
            np.arange(p.n_wins_total, dtype=np.int64)
            - p.win_offset[w_query]
        )

    def get_corr(h: int) -> np.ndarray:
        """Packed missing-shard correction for an incomplete source:
        byte layout identical to the global mask pack, with every
        window constrained by a shard the source has NO bank row for
        cleared (a missing row means ABSENT bits, not vacuous)."""
        probe: QueryProbeSet = cache["probe"]
        c = corr_cache.pop(h, None)
        if c is None:
            bad = np.zeros(probe.n_wins_total, dtype=bool)
            for sid in cache["missing"][h]:
                bad |= probe.shard_win_mask[sid]
            corr_bits = np.ones(probe.g_template.size, dtype=bool)
            corr_bits[cache["win_bit"][bad]] = False
            c = np.packbits(corr_bits, bitorder="little")
        corr_cache[h] = c  # re-insert: dict order == LRU order
        total = sum(a.nbytes for a in corr_cache.values())
        while total > CORR_CACHE_BYTES_MAX and len(corr_cache) > 1:
            oldest = next(iter(corr_cache))
            total -= corr_cache.pop(oldest).nbytes
        return c

    if lane_mode:
        def reduce_lanes(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:
                return HITS_SCHEMA.empty_table()
            _fill_cache()
            return _reduce_stream_lanes(
                group, cache, get_corr, POP, theta, theta_compat
            )

        return reduce_lanes

    def reduce_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return HITS_SCHEMA.empty_table()
        _fill_cache()
        probe: QueryProbeSet = cache["probe"]
        hash2src = cache["hash2src"]
        complete = cache["complete"]

        qi = group["qi"].combine_chunks().to_numpy(zero_copy_only=False)
        si = group["si"].combine_chunks().to_numpy(zero_copy_only=False)
        mask_col = group["mask"].combine_chunks()
        o_buf = mask_col.buffers()[1]
        off = np.frombuffer(o_buf, dtype=np.int64)[
            mask_col.offset : mask_col.offset + len(mask_col) + 1
        ]
        data_buf = mask_col.buffers()[2]
        vals = (
            np.frombuffer(data_buf, dtype=np.uint8)
            if data_buf is not None
            else np.empty(0, dtype=np.uint8)
        )
        lens = off[1:] - off[:-1]

        # pair segmentation: lexsort on the numeric keys
        order = np.lexsort((qi, si))
        qi_s = qi[order]
        si_s = si[order]
        change = (np.diff(qi_s) != 0) | (np.diff(si_s) != 0)
        seg = np.concatenate([[0], np.flatnonzero(change) + 1])
        seg_end = np.concatenate([seg[1:], [len(order)]])
        first = order[seg]  # one representative row per pair

        arrays: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        src_complete = np.fromiter(
            (complete[int(s)] for s in si_s[seg]), dtype=bool, count=len(seg)
        )
        # process pairs grouped by mask byte length: stack + one
        # elementwise-AND reduceat + one popcount per group; incomplete
        # sources ride the same stacked reduce and get their correction
        # as one extra packed-byte AND per pair (sliced at the query's
        # byte offset out of the per-source packed correction)
        seg_lens = lens[first]
        byte_off = probe.g_byte_off
        for L in np.unique(seg_lens):
            sel_pairs = np.flatnonzero(seg_lens == L)
            counts = seg_end[sel_pairs] - seg[sel_pairs]
            row_idx = np.concatenate(
                [order[seg[p] : seg_end[p]] for p in sel_pairs]
            )
            # zero-copy gather out of the Arrow value buffer
            Li = int(L)
            gather = off[row_idx][:, None] + np.arange(Li)[None, :]
            stacked = vals[gather]
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            final = np.bitwise_and.reduceat(stacked, starts, axis=0)
            rep = first[sel_pairs]
            slow_loc = np.flatnonzero(~src_complete[sel_pairs])
            if slow_loc.size:
                q_slow = qi[rep[slow_loc]].astype(np.int64)
                b0 = byte_off[probe.slot_of_qi[q_slow]]
                corr = np.empty((slow_loc.size, Li), dtype=np.uint8)
                for j in range(slow_loc.size):
                    corr[j] = get_corr(int(si[rep[slow_loc[j]]]))[
                        b0[j] : b0[j] + Li
                    ]
                final[slow_loc] &= corr
            found = POP[final].sum(axis=1)
            nw = probe.wins_per_query[qi[rep].astype(np.int64)]
            min_wins = min_windows(nw, theta, theta_compat)
            hit = found >= min_wins
            arrays.append((rep[hit], found[hit], nw[hit]))

        qid_out: list = []
        src_out: list = []
        wins_out: list = []
        nw_out: list = []
        frac_out: list = []
        for rep, found, nw in arrays:
            qid_out.extend(probe.qid_arr[qi[rep].astype(np.int64)])
            src_out.extend(hash2src[int(s)] for s in si[rep])
            wins_out.extend(found.tolist())
            nw_out.extend(nw.tolist())
            frac_out.extend(
                np.round(found * 100.0 / nw, 2).tolist()
            )
        return pa.table(
            {
                "query_id": pa.array(qid_out, pa.string()),
                "source": pa.array(src_out, pa.string()),
                "wins_found": pa.array(wins_out, pa.int64()),
                "n_wins": pa.array(nw_out, pa.int64()),
                "fraction": pa.array(frac_out, pa.float64()),
            },
            schema=HITS_SCHEMA,
        )

    return reduce_bucket


def _reduce_stream_lanes(
    group: pa.Table, cache: dict, get_corr, POP: np.ndarray, theta: int,
    theta_compat: str,
) -> pa.Table:
    """Lane-mode reduce for ONE kb group: every row is a (source, kb)
    lane; the bucket's per-query regions come straight from the broadcast
    probe's kb-major layout (no meta rows needed — the probe IS broadcast
    on this path).  Per source: AND the lanes bytewise, AND in the
    missing-shard correction slice for incomplete sources, popcount per
    query region, threshold."""
    empty = HITS_SCHEMA.empty_table()
    probe: QueryProbeSet = cache["probe"]
    hash2src = cache["hash2src"]
    complete = cache["complete"]

    kb_col = group["kb"].combine_chunks().to_numpy(zero_copy_only=False)
    kb = int(kb_col[0])
    s0, s1 = int(probe.kb_bounds[kb]), int(probe.kb_bounds[kb + 1])
    if s1 == s0:
        return empty
    base = int(probe.lane_bounds[kb])
    Lk = int(probe.lane_bounds[kb + 1]) - base
    if Lk == 0:
        return empty
    qi_loc = probe.qi_of_slot[s0:s1]
    nw_loc = probe.wins_per_query[qi_loc].astype(np.int64)
    # zero-length regions (nw == 0) clip to a dummy start; their counts
    # are garbage and are masked below (nw_loc > 0)
    region_starts = np.minimum(probe.g_byte_off[s0:s1] - base, Lk - 1)
    thr = min_windows(nw_loc, theta, theta_compat)

    si_all = group["si"].combine_chunks().to_numpy(zero_copy_only=False)
    m_off, m_dat = _binary_views(group["mask"])
    order = np.argsort(si_all, kind="stable")
    si_s = si_all[order]
    seg_b = np.concatenate([[0], np.flatnonzero(np.diff(si_s)) + 1])
    seg_e = np.concatenate([seg_b[1:], [len(order)]])

    out_q: list = []
    out_s: list = []
    out_w: list = []
    out_n: list = []
    out_f: list = []
    span = np.arange(Lk, dtype=np.int64)[None, :]
    for p in range(len(seg_b)):
        rows = order[seg_b[p] : seg_e[p]]
        if int(m_off[rows[0] + 1] - m_off[rows[0]]) != Lk:
            raise ValueError("lane length mismatch: probe layout desync")
        stacked = m_dat[m_off[rows][:, None] + span]
        final = (
            np.bitwise_and.reduce(stacked, axis=0)
            if stacked.shape[0] > 1
            else stacked[0]
        )
        sh = int(si_s[seg_b[p]])
        name = hash2src.get(sh)
        if name is None:
            continue
        if not complete.get(sh, False):
            final = final & get_corr(sh)[base : base + Lk]
        counts = np.add.reduceat(POP[final], region_starts)
        hit = (counts >= thr) & (nw_loc > 0)
        if not hit.any():
            continue
        hq = qi_loc[hit]
        hw = counts[hit]
        hn = nw_loc[hit]
        out_q.extend(probe.qid_arr[hq])
        out_s.extend([name] * len(hq))
        out_w.extend(hw.tolist())
        out_n.extend(hn.tolist())
        out_f.extend(np.round(hw * 100.0 / hn, 2).tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.string()),
            "source": pa.array(out_s, pa.string()),
            "wins_found": pa.array(out_w, pa.int64()),
            "n_wins": pa.array(out_n, pa.int64()),
            "fraction": pa.array(out_f, pa.float64()),
        },
        schema=HITS_SCHEMA,
    )


def _binary_views(col: "pa.ChunkedArray"):
    """(offsets, data) numpy views over a combined large_binary column."""
    c = col.combine_chunks()
    off = np.frombuffer(c.buffers()[1], dtype=np.int64)[
        c.offset : c.offset + len(c) + 1
    ]
    buf = c.buffers()[2]
    dat = (
        np.frombuffer(buf, dtype=np.uint8)
        if buf is not None
        else np.empty(0, dtype=np.uint8)
    )
    return off, dat
